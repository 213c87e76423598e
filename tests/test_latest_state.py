"""Streaming CDC apply: the latest-state snapshot must equal the batch
latest-per-key answer after replaying the events table through
micro-batches, and epoch replay must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.session import read_table
from dsp_spark.sinks.latest_state import LatestStateUpsert

KEYS = ["user_id"]
ORDER = ["ts", "event_id"]
VALUES = ["event_type", "value"]
COLS = [*KEYS, *ORDER, *VALUES]


def _batch_expected(events):
    payload = F.struct(*ORDER, *VALUES)
    return (
        events.groupBy(*KEYS)
        .agg(F.max(payload).alias("b"))
        .select(*KEYS, *[F.col(f"b.{c}").alias(c) for c in (*ORDER, *VALUES)])
    )


def _rows(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def test_streaming_latest_state_matches_batch(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events").select(*COLS)
    src = str(tmp_path / "in")
    # several input files -> several micro-batches with maxFilesPerTrigger
    events.repartition(4).write.parquet(src)

    sink = LatestStateUpsert(
        spark, str(tmp_path / "state"), KEYS, ORDER, VALUES
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(sink.applied) >= 2  # really exercised the incremental path
    assert _rows(sink.read()) == _rows(_batch_expected(events))


def test_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    # deterministic subset: LIMIT without ORDER BY may pick different
    # rows on each of the three actions below
    events = read_table(spark, sf_dir, "events").select(*COLS).where(
        F.col("event_id") < 500
    )
    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)

    sink = LatestStateUpsert(
        spark, str(tmp_path / "state"), KEYS, ORDER, VALUES
    )
    sink.apply(half1, 0)
    sink.apply(half2, 1)
    after_once = _rows(sink.read())

    # crash-replay of epoch 1: same batch again -> same snapshot
    sink.apply(half2, 1)
    assert _rows(sink.read()) == after_once
    assert after_once == _rows(_batch_expected(events))


def test_vacuum_keeps_newest_versions(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events").select(*COLS).where(
        F.col("event_id") < 300
    )
    sink = LatestStateUpsert(
        spark, str(tmp_path / "state"), KEYS, ORDER, VALUES
    )
    for epoch in range(4):
        sink.apply(events.where(F.col("event_id") % 4 == epoch), epoch)
    before = _rows(sink.read())
    dropped = sink.vacuum(keep_last=2)
    assert dropped == [0, 1]
    assert sink._versions() == [2, 3]
    assert _rows(sink.read()) == before
