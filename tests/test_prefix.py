"""Two-phase prefix ops (operators/prefix.py) must equal their
single-partition window twins bit-for-bit — on randomized data with
negative values, heavy proxy ties (the range-partitioner worst case),
and N < k ntile edges — while planning NO data-grain unpartitioned
window (the whole point of the rewrite)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dsp_spark import plans
from dsp_spark.operators import prefix

ORDER = lambda: [F.desc("qual"), F.asc("id")]  # noqa: E731


@pytest.fixture(scope="module")
def rnd_df(spark):
    random.seed(7)
    rows = [
        (i, random.randint(-50, 500), round(random.random(), 3))
        for i in range(4000)
    ]
    # heavy ties on the proxy: 400 rows sharing one quality value
    rows += [(i, 7, 0.25) for i in range(4000, 4400)]
    df = spark.createDataFrame(
        rows, "id bigint, v bigint, qual double"
    ).repartition(8)
    df.persist()
    df.count()
    yield df
    df.unpersist()


def test_global_cumsum_matches_window_twin(rnd_df):
    gw = W.orderBy(*ORDER()).rowsBetween(W.unboundedPreceding, 0)
    exp = {r.id: r.c for r in rnd_df.withColumn("c", F.sum("v").over(gw)).collect()}
    got = {
        r.id: r.c
        for r in prefix.global_cumsum(
            rnd_df, ORDER(), "v", "c", proxy=F.col("qual"), proxy_desc=True,
            buckets=16,
        ).collect()
    }
    assert got == exp


def test_global_row_number_matches_window_twin(rnd_df):
    exp = {
        r.id: r.r
        for r in rnd_df.withColumn(
            "r", F.row_number().over(W.orderBy(*ORDER()))
        ).collect()
    }
    got = {
        r.id: r.r
        for r in prefix.global_row_number(
            rnd_df, ORDER(), "r", proxy=F.col("qual"), proxy_desc=True,
            buckets=16,
        ).collect()
    }
    assert got == exp


@pytest.mark.parametrize("k", [4, 7, 10])
def test_global_ntile_matches_window_twin(rnd_df, k):
    order = [F.asc("v"), F.asc("id")]
    exp = {
        r.id: r.t
        for r in rnd_df.withColumn(
            "t", F.ntile(k).over(W.orderBy(*order))
        ).collect()
    }
    got = {
        r.id: r.t
        for r in prefix.global_ntile(
            rnd_df, order, k, "t", proxy=F.col("v"), buckets=16
        ).collect()
    }
    assert got == exp


def test_global_ntile_fewer_rows_than_tiles(spark):
    tiny = spark.createDataFrame(
        [(i, i * 10) for i in range(3)], "id bigint, v bigint"
    )
    order = [F.asc("v"), F.asc("id")]
    exp = {
        r.id: r.t
        for r in tiny.withColumn(
            "t", F.ntile(10).over(W.orderBy(*order))
        ).collect()
    }
    got = {
        r.id: r.t
        for r in prefix.global_ntile(
            tiny, order, 10, "t", proxy=F.col("v")
        ).collect()
    }
    assert got == exp


def test_global_ntile_multi_matches_three_window_twins(rnd_df):
    """One melted pass must equal three independent NTILE windows,
    including on a dimension with heavy ties."""
    w = lambda c: W.orderBy(F.asc(c), F.asc("id"))  # noqa: E731
    exp = {
        r.id: (r.a, r.b)
        for r in rnd_df.withColumn("a", F.ntile(4).over(w("v")))
        .withColumn("b", F.ntile(4).over(w("qual")))
        .collect()
    }
    got = {
        r.id: (r.a, r.b)
        for r in prefix.global_ntile_multi(
            rnd_df,
            "id",
            {"a": F.col("v"), "b": F.col("qual")},
            4,
            buckets=16,
        ).collect()
    }
    assert got == exp


def test_global_ntile_multi_plans_zero_unpartitioned_windows(rnd_df):
    """Every window in the melted plan is partitioned by dim — even the
    tiny offsets pass; the multi variant is fully single-task-free."""
    df = prefix.global_ntile_multi(
        rnd_df, "id", {"a": F.col("v")}, 4, buckets=16, checkpoint=False
    )
    assert plans.unpartitioned_windows(df) == []


def test_prefix_plan_has_no_data_grain_global_window(rnd_df):
    """The ONLY unpartitioned window allowed is the offsets cumsum over
    ≤ `buckets` rows; the data pass must be partitioned by bucket."""
    df = prefix.global_cumsum(
        rnd_df, ORDER(), "v", "c", proxy=F.col("qual"), proxy_desc=True,
        buckets=16,
    )
    wins = plans.unpartitioned_windows(df)
    assert len(wins) == 1 and "_tot" in wins[0], wins


def test_global_ntile_multi_payload_rides_the_melt(rnd_df):
    """payload columns must come back exactly (one copy per key, not
    per dim) and must not change any tile assignment."""
    base = {
        r.id: (r.a, r.b)
        for r in prefix.global_ntile_multi(
            rnd_df, "id", {"a": F.col("v"), "b": F.col("qual")}, 4,
            buckets=16,
        ).collect()
    }
    out = prefix.global_ntile_multi(
        rnd_df,
        "id",
        {"a": F.col("v"), "b": F.col("qual")},
        4,
        buckets=16,
        payload=["v", "qual"],
    ).collect()
    src = {r.id: (r.v, r.qual) for r in rnd_df.collect()}
    assert len(out) == len(src)  # one row per key, payload not fanned out
    for r in out:
        assert (r.a, r.b) == base[r.id]
        assert (r.v, r.qual) == src[r.id]


def test_global_ntile_multi_rejects_name_collisions(rnd_df):
    """payload/dims/key/internal name overlaps must raise, never emit
    two same-named output columns (advisor r5)."""
    with pytest.raises(ValueError, match="disjoint"):
        prefix.global_ntile_multi(
            rnd_df, "id", {"v": F.col("v")}, 4, buckets=16,
            payload=["v"], checkpoint=False,
        )
    with pytest.raises(ValueError, match="disjoint"):
        prefix.global_ntile_multi(
            rnd_df, "id", {"id": F.col("v")}, 4, buckets=16,
            checkpoint=False,
        )
    with pytest.raises(ValueError, match="internals"):
        prefix.global_ntile_multi(
            rnd_df.withColumnRenamed("v", "_val"), "id",
            {"_val": F.col("_val")}, 4, buckets=16, checkpoint=False,
        )
    # key itself colliding with an internal working column (advisor r6:
    # the guard covered dims/payload but let key='_dim' through)
    with pytest.raises(ValueError, match="internals"):
        prefix.global_ntile_multi(
            rnd_df.withColumnRenamed("id", "_dim"), "_dim",
            {"t": F.col("v")}, 4, buckets=16, checkpoint=False,
        )
