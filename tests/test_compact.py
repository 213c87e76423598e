"""Small-file compaction: data and partition pruning preserved, file
counts actually shrink, re-runs are no-ops, crash residue is cleared."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from dsp_spark import plans
from dsp_spark.session import read_table


def _fragmented(spark, sf_dir, out):
    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # 24 files per partition directory — the streaming-sink pathology
    ev.repartition(24).write.partitionBy("event_date").parquet(str(out))
    return ev


def _n_files(root):
    return sum(
        1
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def test_compaction_preserves_data_and_pruning(spark, sf_dir, tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.compact import compact

    out = tmp_path / "events_by_date"
    ev = _fragmented(spark, sf_dir, out)
    before_rows = spark.read.parquet(str(out)).count()
    before_files = _n_files(out)

    rep = compact(spark, str(out), target_mb=128)
    assert rep["files_after"] < rep["files_before"] == before_files

    back = spark.read.parquet(str(out))
    assert back.count() == before_rows
    # value-level: per-user event counts identical
    a = {
        (r.user_id, r.n)
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    b = {
        (r.user_id, r.n)
        for r in back.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert a == b
    # partition pruning still fires on the compacted layout
    one_day = back.where(F.col("event_date") == "1997-03-02")
    plan = plans.formatted(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]

    # idempotent: a second run touches nothing
    rep2 = compact(spark, str(out), target_mb=128)
    assert rep2["files_before"] == rep2["files_after"] == rep["files_after"]
    assert all(p.get("skipped") for p in rep2["partitions"])


def test_recovery_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """Kill between trash-move and new-move: originals sit in
    _compact_trash, a half set of c9- files is in the partition dir.
    The next run must restore the originals, drop the partial news,
    and re-compact without losing or duplicating a single row."""
    import shutil

    sys.path.insert(0, "/root/repo")
    from tools.compact import _data_files, compact

    out = tmp_path / "ev"
    _fragmented(spark, sf_dir, out)
    before_rows = spark.read.parquet(str(out)).count()
    part = next(
        os.path.join(out, d)
        for d in os.listdir(out)
        if d.startswith("event_date=")
    )
    part_rows = spark.read.parquet(part).count()
    # simulate the torn state by hand: ALL originals moved to trash,
    # one fake half-moved new file, a leftover tmp dir
    trash = os.path.join(part, "_compact_trash")
    os.makedirs(trash)
    for f in _data_files(part):
        shutil.move(f, os.path.join(trash, os.path.basename(f)))
    with open(os.path.join(part, "c9-part-half.parquet"), "wb") as f:
        f.write(b"torn")
    os.makedirs(os.path.join(part, "_compact_tmp"))

    compact(spark, str(out), target_mb=128)
    assert not os.path.exists(trash)
    assert spark.read.parquet(str(out)).count() == before_rows
    assert spark.read.parquet(part).count() == part_rows


def test_compaction_clears_crash_residue(spark, sf_dir, tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.compact import compact

    out = tmp_path / "ev"
    _fragmented(spark, sf_dir, out)
    # simulate an interrupted prior run: stale tmp dir with junk
    some_part = next(
        os.path.join(out, d)
        for d in os.listdir(out)
        if d.startswith("event_date=")
    )
    stale = os.path.join(some_part, "_compact_tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    before_rows = spark.read.parquet(str(out)).count()
    compact(spark, str(out), target_mb=128)
    assert not os.path.exists(stale)
    assert spark.read.parquet(str(out)).count() == before_rows
