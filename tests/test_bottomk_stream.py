"""Streaming bottom-k deterministic sampler (stateful.py):

* the final emission per key equals bottomk_sample_batch exactly for
  every micro-batch split and arrival order;
* duplicate delivery is a no-op (at-least-once safety);
* the python md5 rank matches Spark's F.md5 (the parity contract);
* mergeability: bottom-k of a union == bottom-k of per-part bottom-ks.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    BOTTOMK_K,
    _bk_rank,
    bottomk_sample_batch,
    bottomk_sample_stream,
)


def _testdata(shuffle: bool = False, dup: bool = False) -> pd.DataFrame:
    rng = random.Random(101)
    rows = [
        (f"k{rng.randrange(3)}", f"item_{rng.randrange(200)}")
        for _ in range(1200)
    ]
    if dup:
        rows = rows + rows[:400]  # duplicate delivery
    if shuffle:
        rng.shuffle(rows)
    return pd.DataFrame(rows, columns=["k", "item"])


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
        bottomk_sample_stream(stream, key_col="k", item_col="item")
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
        (r.key, r.item, r.rank_hex)
        for r in rows
        if r.batch_id == last[r.key]
    }


def _batch_final(spark, pdf):
    return {
        (r.key, r.item, r.rank_hex)
        for r in bottomk_sample_batch(
            spark.createDataFrame(pdf), key_col="k", item_col="item"
        ).collect()
    }


def test_bottomk_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want
    per_key = {}
    for k, _, _ in want:
        per_key[k] = per_key.get(k, 0) + 1
    assert all(v == BOTTOMK_K for v in per_key.values())


def test_bottomk_invariant_under_split_order_and_duplicates(spark, tmp_path):
    a = _stream_final(spark, _testdata(), tmp_path / "a", 1)
    b = _stream_final(spark, _testdata(shuffle=True), tmp_path / "b", 4)
    c = _stream_final(spark, _testdata(dup=True), tmp_path / "c", 4)
    assert a == b == c


def test_python_rank_matches_spark_md5(spark):
    items = [f"item_{j}" for j in range(30)] + ["", "a:b", "0"]
    got = (
        spark.createDataFrame([(i,) for i in items], "item string")
        .select("item", F.md5("item").alias("h"))
        .collect()
    )
    for r in got:
        assert _bk_rank(r.item) == r.h


def test_bottomk_mergeable():
    """The union's bottom-k equals the bottom-k of per-part bottom-ks
    — the property that lets per-shard samples roll up without
    reprocessing."""
    items = [f"x{j}" for j in range(300)]
    parts = [items[:100], items[100:180], items[180:]]

    def bk(xs):
        return sorted({(_bk_rank(x), x) for x in xs})[:BOTTOMK_K]

    merged_of_parts = bk([x for p in parts for _, x in bk(p)])
    assert merged_of_parts == bk(items)
