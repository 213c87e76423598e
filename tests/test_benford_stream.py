"""Streaming Benford first-digit counters (stateful.py):

* final emissions bit-match benford_digit_batch for every split and
  arrival order (exact integer counts, no float anywhere),
* zero/negative values are excluded exactly like the batch entry,
* the keyed batch twin reduces to the dq_benford_totalprice digit
  rule on a single key.
"""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    _cents_decimal,
    benford_digit_batch,
    benford_digit_stream,
)


def _testdata(shuffle: bool = False) -> pd.DataFrame:
    rng = random.Random(103)
    rows = []
    # "organic" key: log-uniform magnitudes (Benford-ish); "fake" key:
    # uniform values (anti-Benford); plus zeros that must be dropped
    for _ in range(900):
        rows.append(("organic", round(10 ** rng.uniform(-1, 4), 2)))
    for _ in range(900):
        rows.append(("fake", round(rng.uniform(100, 999), 2)))
    for _ in range(50):
        rows.append((rng.choice(["organic", "fake"]), 0.0))
    if shuffle:
        rng.shuffle(rows)
    return pd.DataFrame(rows, columns=["k", "value"])


def _stream_final(spark, pdf, tmp_path, n_files):
    src, out, ck = tmp_path / "src", tmp_path / "out", tmp_path / "ck"
    src.mkdir(parents=True)
    step = -(-len(pdf) // n_files)
    for i in range(n_files):
        part = pdf.iloc[i * step : (i + 1) * step]
        if len(part):
            part.to_parquet(src / f"f{i}.parquet")
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
        benford_digit_stream(stream, key_col="k", value_col="value")
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    last = {}
    for r in rows:
        last[r.key] = max(last.get(r.key, -1), r.batch_id)
    return {
        (r.key, r.digit, r.n_digit, r.n_total)
        for r in rows
        if r.batch_id == last[r.key]
    }


def _batch_final(spark, pdf):
    return {
        (r.key, r.digit, r.n_digit, r.n_total)
        for r in benford_digit_batch(
            spark.createDataFrame(pdf), key_col="k", value_col="value"
        ).collect()
    }


def test_benford_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want and len(want) > 0
    # zeros excluded: totals count only positive-cent rows
    n_pos = Counter()
    for k, v in zip(pdf.k, pdf.value):
        if _cents_decimal(v) > 0:
            n_pos[k] += 1
    for k, _, _, n_total in want:
        assert n_total == n_pos[k]
    # the log-uniform key must lean on digit 1, the uniform key must
    # start at 1-3 only if in [100,999] -> digits spread 1..9 there
    organic = {d: nd for k, d, nd, _ in want if k == "organic"}
    assert organic[1] == max(organic.values())


def test_benford_stream_invariant_under_split_and_order(spark, tmp_path):
    a = _stream_final(spark, _testdata(), tmp_path / "a", 1)
    b = _stream_final(spark, _testdata(shuffle=True), tmp_path / "b", 4)
    assert a == b


def test_keyed_twin_reduces_to_catalog_digit_rule(spark, sf_dir):
    """On a single constant key over orders, the twin's digit counts
    equal dq_benford_totalprice's n_orders column."""
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    o = read_table(spark, sf_dir, "orders").select(
        F.lit("all").alias("k"), F.col("o_totalprice").alias("value")
    )
    twin = {
        r.digit: r.n_digit
        for r in benford_digit_batch(o, key_col="k", value_col="value").collect()
    }
    entry = {
        r.digit: r.n_orders
        for r in catalog.entries()["dq_benford_totalprice"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert twin == entry and len(entry) > 0
