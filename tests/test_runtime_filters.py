"""Runtime row-level filtering (Bloom-filter join pruning).

At 100 TB the single biggest shuffle saver on selective fact-fact joins
is Spark's runtime Bloom filter (SPARK-32268): the selective side's
join keys are sketched into a Bloom filter that is pushed into the
large side's scan, dropping non-joining rows BEFORE the shuffle.

It is enabled by default but gated on size thresholds (creation side
<= 10 MB, application side >= 10 GB scanned) that local test data never
crosses — so these tests lower the thresholds to prove the plan shape
is available to our queries, exactly as it would fire at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsp_spark.session import read_table


@pytest.fixture()
def bloom_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # force the shuffle-join path: bloom filters don't apply to
        # broadcast joins (the broadcast already prunes at the probe)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bloom_filter_injected_on_selective_fact_fact_join(
    spark, sf_dir, bloom_conf
):
    """Selective orders filter -> lineitem scan gets a might_contain
    runtime filter on l_orderkey (the q3/q4/q12 join shape)."""
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    plan = _formatted(joined)
    assert "might_contain" in plan or "bloom_filter" in plan, plan

    # and the result is unchanged by the runtime filter
    n = joined.collect()
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        n_off = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert sorted(map(tuple, n)) == sorted(map(tuple, n_off))


def test_bloom_filter_absent_for_broadcast_join(spark, sf_dir):
    """With default thresholds a broadcastable dim join must NOT pay
    the bloom-filter build — the broadcast hash join already prunes."""
    customer = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    plan = _formatted(joined)
    assert "might_contain" not in plan
    assert "BroadcastHashJoin" in plan
