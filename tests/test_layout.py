"""Layout operator: range clustering must produce files whose min/max
ranges actually support data skipping — verified from parquet footers,
not just the plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dsp_spark import plans
from dsp_spark.operators.layout import optimize_layout
from dsp_spark.session import read_table


def test_layout_plan_is_range_exchange_plus_local_sort(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = optimize_layout(ev, range_cols=["ts"], target_partitions=8)
    plan = plans.formatted(out)
    assert "rangepartitioning" in plan.lower().replace(" ", "")
    # local sort only: the Sort node must sit above the exchange and be
    # non-global (no second global ordering pass)
    assert "Sort" in plan


def test_layout_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = str(tmp_path / "clustered")
    optimize_layout(ev, range_cols=["ts"], target_partitions=8).write.parquet(out)
    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 4
    # consecutive files may touch at a sampled boundary but never nest:
    # a time-range predicate prunes to a contiguous file run
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"


def _file_spans(path, col):
    """(min, max) per parquet file for `col`, from footers."""
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        spans.append((min(mins), max(maxs)))
    return spans


def _avg_span_fraction(spans):
    glo = max(hi for _, hi in spans) - min(lo for lo, _ in spans)
    return sum(hi - lo for lo, hi in spans) / (len(spans) * glo)


def test_zorder_skips_on_every_listed_column(spark, sf_dir, tmp_path):
    """Z-ordered files must cover narrow ranges of BOTH columns (little
    hypercubes), where single-column range clustering leaves the second
    column's per-file range at ~the full domain (slabs)."""
    from dsp_spark.operators.layout import zorder_layout

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zorder")
    zorder_layout(ev, ["user_id", "value"], bits=4, target_partitions=8).write.parquet(zpath)
    lpath = str(tmp_path / "linear")
    optimize_layout(ev, range_cols=["user_id"], target_partitions=8).write.parquet(lpath)

    # every listed dim skips under z-order...
    z_user = _avg_span_fraction(_file_spans(zpath, "user_id"))
    z_value = _avg_span_fraction(_file_spans(zpath, "value"))
    assert z_user < 0.7 and z_value < 0.7
    # ...while linear clustering skips only on its leading column: its
    # second-column spans stay near the full domain (only the value
    # column's heavy tail keeps the fraction below 1.0), and are
    # materially wider than z-order's on the same data
    l_value = _avg_span_fraction(_file_spans(lpath, "value"))
    assert _avg_span_fraction(_file_spans(lpath, "user_id")) < 0.3
    assert l_value > 0.5
    assert l_value > 1.3 * z_value
    # nothing lost or duplicated by the rewrite
    assert (
        spark.read.parquet(zpath).count()
        == ev.count()
        == spark.read.parquet(lpath).count()
    )


def test_zorder_rejects_bit_overflow(spark, sf_dir):
    from dsp_spark.operators.layout import zorder_layout
    import pytest

    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        zorder_layout(ev, ["user_id", "value"], bits=32)
    with pytest.raises(ValueError):
        zorder_layout(ev, [], bits=8)


def test_zorder_rejects_temp_column_collision(spark, sf_dir):
    from dsp_spark.operators.layout import zorder_layout
    import pytest
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").withColumn("__z", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        zorder_layout(ev, ["user_id", "value"], bits=4)


def test_zorder_interleave_matches_python_model(spark):
    """The generated shiftleft/or chain must equal the textbook Morton
    interleave: output bit (i*d + j) = bit i of dimension j — checked
    with a pure-Python model that derives bucket ids exactly as the
    operator does (#approxQuantile-cuts <= value), then asserts the
    output partitions cover disjoint contiguous ranges of the MODEL
    z-value, i.e. the range exchange really sorted by Morton order."""
    from pyspark.sql import functions as F

    from dsp_spark.operators.layout import zorder_layout

    rows = [(a, float(b)) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a int, b double")
    out = zorder_layout(df, ["a", "b"], bits=4, target_partitions=4)
    # model the bucket ids EXACTLY as the operator derives them:
    # cutpoints from the same approxQuantile call, bucket = #cuts <= v
    probs = [i / 16 for i in range(1, 16)]
    cuts_a, cuts_b = df.stat.approxQuantile(["a", "b"], probs, 1e-3)
    cuts_a, cuts_b = sorted(set(cuts_a)), sorted(set(cuts_b))

    def bucket(v, cuts):
        return sum(1 for c in cuts if c <= v)

    # Morton interleave: output bit (i*d + j) = bit i of dimension j
    def morton(xa, xb):
        z = 0
        for i in range(4):
            z |= ((xa >> i) & 1) << (2 * i)      # dim 0 -> even bits
            z |= ((xb >> i) & 1) << (2 * i + 1)  # dim 1 -> odd bits
        return z

    parts = out.withColumn("pid", F.spark_partition_id()).collect()
    spans = {}
    for r in parts:
        z = morton(bucket(r.a, cuts_a), bucket(r.b, cuts_b))
        lo, hi = spans.get(r.pid, (1 << 30, -1))
        spans[r.pid] = (min(lo, z), max(hi, z))
    ordered = sorted(spans.values())
    assert len(ordered) >= 3
    # partitions cover disjoint, contiguous Morton ranges: the operator
    # really range-partitioned on the modeled z-value
    for (_, hi1), (lo2, _) in zip(ordered, ordered[1:]):
        assert hi1 < lo2, (ordered,)


def test_z_sql_matches_morton_z(spark):
    """The DuckDB `_z_sql` mirror is hand-written; pin it to the shared
    `morton_z` bit layout by evaluating BOTH on the same (b0, b1)
    samples — Spark on literal columns, DuckDB on a literal table — so
    a future layout change desynchronizes here, not in a driver hash
    mismatch three stages later (ADVICE r6 #3)."""
    import duckdb
    from pyspark.sql import functions as F

    from dsp_spark.operators.layout import morton_z
    from dsp_spark.queries.layout import _BITS, _z_sql

    samples = [(a, b) for a in (0, 1, 5, 10, 15) for b in (0, 3, 7, 12, 15)]
    df = spark.createDataFrame(samples, "b0 int, b1 int")
    spark_z = {
        (r.b0, r.b1): r.z
        for r in df.select(
            "b0", "b1", morton_z([F.col("b0"), F.col("b1")], _BITS).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT b0, b1, {_z_sql('b0', 'b1')} AS z FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in samples)
        + ") AS t(b0, b1)"
    ).fetchall()
    duck_z = {(a, b): z for a, b, z in rows}
    assert spark_z == duck_z
