"""Streaming Mann-Kendall twin (stateful.py:mann_kendall_stream):

* the final emission per key bit-matches mann_kendall_batch on the
  same rows for every micro-batch split,
* emissions are invariant under split count and late arrivals (counts
  are order-independent, the fold re-runs over completed days),
* mann_kendall_batch itself pins the catalog entry's formula.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    mann_kendall_batch,
    mann_kendall_stream,
)


def _testdata(shuffle: bool = False) -> pd.DataFrame:
    rng = random.Random(83)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-03-01")
    # planted trends: up-drift, flat, down-drift
    for ty, slope in (("grow", 2), ("flat", 0), ("shrink", -1)):
        for d in range(25):
            n = max(1, 10 + slope * d + rng.randint(-2, 2))
            for _ in range(n):
                rows.append(
                    (
                        eid,
                        base
                        + pd.Timedelta(days=d)
                        + pd.Timedelta(minutes=rng.randint(0, 1439)),
                        ty,
                    )
                )
                eid += 1
    if shuffle:
        rng.shuffle(rows)  # late arrivals: old days in later files
    return pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])


def _stream_final(spark, pdf, tmp_path, n_files):
    src, out, ck = tmp_path / "src", tmp_path / "out", tmp_path / "ck"
    src.mkdir(parents=True)
    step = -(-len(pdf) // n_files)
    for i in range(n_files):
        part = pdf.iloc[i * step : (i + 1) * step]
        if len(part):
            part.to_parquet(src / f"f{i}.parquet", coerce_timestamps="us")
    schema = spark.createDataFrame(pdf).schema

    def _sink(df, epoch_id):
        df.withColumn("batch_id", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(str(out))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        mann_kendall_stream(stream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final = {}
    for r in spark.read.parquet(str(out)).collect():
        cur = final.get(r.event_type)
        if cur is None or r.batch_id > cur[0]:
            final[r.event_type] = (
                r.batch_id, r.n_days, r.s_stat, r.var0, r.z_stat,
            )
    return {k: v[1:] for k, v in final.items()}


def _batch_final(spark, pdf):
    return {
        r.event_type: (r.n_days, r.s_stat, r.var0, r.z_stat)
        for r in mann_kendall_batch(spark.createDataFrame(pdf)).collect()
    }


def test_mk_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want and len(want) == 3
    # planted trends must carry the right sign
    assert want["grow"][1] > 0 and want["shrink"][1] < 0


def test_mk_stream_invariant_under_split_and_late_arrival(spark, tmp_path):
    pdf_ordered = _testdata()
    pdf_late = _testdata(shuffle=True)
    a = _stream_final(spark, pdf_ordered, tmp_path / "a", 1)
    b = _stream_final(spark, pdf_ordered, tmp_path / "b", 4)
    c = _stream_final(spark, pdf_late, tmp_path / "c", 4)
    assert a == b == c


def test_mk_batch_pins_catalog_entry(spark, sf_dir):
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    twin = {
        r.event_type: (r.n_days, r.s_stat, r.var0, r.z_stat)
        for r in mann_kendall_batch(ev).collect()
    }
    entry = {
        r.event_type: (r.n_days, r.s_stat, r.var0, r.z_stat)
        for r in catalog.entries()["events_mann_kendall_trend"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert twin == entry and len(entry) > 0
