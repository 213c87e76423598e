"""AQE runtime skew-join splitting.

`operators/skew.py` covers MANUAL salting; this proves the AUTOMATIC
path: with adaptive execution on (the session default), a sort-merge
join whose left side is dominated by one hot key gets its skewed
shuffle partition split at runtime — the 100 TB hot-key safety net
that needs no query change. Thresholds are lowered so toy data
qualifies, exactly like the Bloom-filter test does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        # force the shuffle-join path so there IS a shuffle to split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # keep post-shuffle coalescing from merging the skew away
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
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


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    n = 400_000
    # 90% of rows share key 0 -> one shuffle partition dwarfs the rest
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    # assert on the bare join: AQE only splits a skewed partition when
    # the join's output partitioning isn't required downstream (an agg
    # right after would anchor the hash distribution and veto the
    # split — which is itself correct behavior)
    joined = left.join(right, "k").select("v", "pad")
    rows = [r["v"] for r in joined.collect()]
    assert rows.count(0) == sum(1 for i in range(n) if i % 10 < 9)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, plan


def test_aqe_leaves_balanced_join_unsplit(spark, skew_conf):
    # small enough that every balanced partition stays under the
    # lowered 64KB skew threshold
    left = spark.range(20_000).select(
        (F.col("id") % 100).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    joined = left.join(right, "k").select("v", "pad")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan
