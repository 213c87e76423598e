"""Streaming CUSUM monitor: parity contracts.

* the final streamed emission per key bit-equals the batch twin
  (cusum_batch) for every micro-batch split, including late arrivals
  into already-seen hours (state is the per-hour cent-sum map, so a
  late row lands in its true hour before the refold);
* cusum_batch with in-data floor-mean targets reproduces the catalog
  entry events_cusum_alarm's final row per key (same closed form);
* identical results under the RocksDB state provider.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import cusum_batch, cusum_stream
from tests._num import trunc_div

THRESH = 20000


def _testdata(seed=7, shuffle=False):
    rng = random.Random(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for ty, drift in (("click", 0), ("error", 900), ("view", -500)):
        for h in range(30):
            for _ in range(rng.randint(1, 5)):
                rows.append(
                    (
                        eid,
                        base
                        + pd.Timedelta(hours=h)
                        + pd.Timedelta(minutes=rng.randint(0, 59)),
                        ty,
                        round(max(0.0, rng.uniform(0, 40) + drift / 100), 2),
                    )
                )
                eid += 1
    if shuffle:
        rng.shuffle(rows)  # late arrivals: old hours in later files
    return pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])


TARGETS = {"click": 7000, "error": 7000, "view": 7000}


def _stream_final(spark, pdf, tmp_path, n_files):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir(parents=True)
    step = -(-len(pdf) // n_files)
    for i in range(n_files):
        part = pdf.iloc[i * step : (i + 1) * step]
        if len(part):
            part.to_parquet(src / f"f{i}.parquet", coerce_timestamps="us")
    batch_df = spark.createDataFrame(pdf)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    def _sink(df, epoch_id):
        df.withColumn("batch_id", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(str(out))

    q = (
        cusum_stream(stream, TARGETS, THRESH)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.read.parquet(str(out)).collect():
        cur = final.get(r.event_type)
        if cur is None or r.batch_id > cur[0]:
            final[r.event_type] = (
                r.batch_id,
                r.n_hours,
                r.cusum_cents,
                r.alarm,
            )
    return {k: v[1:] for k, v in final.items()}


def _batch_final(spark, pdf):
    return {
        r.event_type: (r.n_hours, r.cusum_cents, r.alarm)
        for r in cusum_batch(
            spark, spark.createDataFrame(pdf), TARGETS, THRESH
        ).collect()
    }


def test_cusum_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want and len(want) == 3
    # the planted +$9 drift must alarm; the flat/negative series not
    assert want["error"][2] is True
    assert want["view"][2] is False
    assert want["click"][2] is False


def test_cusum_stream_invariant_under_split_and_late_arrival(
    spark, tmp_path
):
    pdf_ordered = _testdata()
    pdf_late = _testdata(shuffle=True)  # same rows, scrambled arrival
    a = _stream_final(spark, pdf_ordered, tmp_path / "a", 1)
    b = _stream_final(spark, pdf_ordered, tmp_path / "b", 4)
    c = _stream_final(spark, pdf_late, tmp_path / "c", 4)
    assert a == b == c


def test_cusum_batch_pins_catalog_entry(spark):
    """With floor-mean targets and the entry's threshold, cusum_batch's
    final row per key equals the catalog entry's last hour row."""
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    entry = catalog.entries()["events_cusum_alarm"].fn(spark, sf).toPandas()
    last = (
        entry.sort_values("hour_start").groupby("event_type").tail(1)
    )
    ev = read_table(spark, sf, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(cents).alias("s"))
    targets = {
        r.event_type: trunc_div(int(r.total), int(r.n))
        for r in h.groupBy("event_type")
        .agg(F.sum("s").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        r.event_type: (r.cusum_cents, r.alarm)
        for r in cusum_batch(
            spark, ev, targets, 200000
        ).collect()
    }
    want = {
        r.event_type: (r.cusum_cents, r.alarm) for r in last.itertuples()
    }
    assert got == want and len(want) > 0


def test_cusum_stream_identical_under_rocksdb(spark, tmp_path):
    from tests.test_rocksdb_state import rocksdb_state

    pdf = _testdata()
    want = _stream_final(spark, pdf, tmp_path / "h", 3)
    with rocksdb_state(spark):
        got = _stream_final(spark, pdf, tmp_path / "r", 3)
    assert got == want
