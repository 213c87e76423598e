"""Bloom first-seen admission: zero false negatives (every true repeat
flagged), false-positive rate within the analytic bound, and verdicts
stable across micro-batch splits."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from dsp_spark.streaming.stateful import (
    BLOOM_BITS_LOG2,
    _BLOOM_K,
    bloom_first_seen_stream,
)


@pytest.fixture(scope="module")
def dup_stream():
    rng = random.Random(41)
    rows, eid = [], 0
    # 3000 distinct items; ~30% of arrivals are repeats of an earlier item
    seen = []
    for _ in range(5000):
        if seen and rng.random() < 0.3:
            item = rng.choice(seen)
        else:
            item = f"doc_{len(seen)}"
            seen.append(item)
        rows.append((eid, item))
        eid += 1
    return rows


def _run(spark, tmp_path, rows, n_files):
    pdf = pd.DataFrame(rows, columns=["event_id", "item"])
    src = tmp_path / "src"
    src.mkdir(parents=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(src / f"f{i}.parquet")
    batch_df = spark.createDataFrame(pdf)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"bl_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        bloom_first_seen_stream(stream, item_col="item")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_no_false_negatives_and_bounded_false_positives(
    spark, tmp_path, dup_stream
):
    res = _run(spark, tmp_path, dup_stream, n_files=3)
    # one output row per input arrival
    assert len(res) == len(dup_stream)
    # per item: count of arrivals and of not-seen verdicts
    counts = res.groupby("item").size()
    news = res[~res["probably_seen"]].groupby("item").size()
    # NO false negatives: an item can be "new" at most once — a repeat
    # arrival can never slip through unflagged
    assert news.max() == 1
    # false positives: distinct items flagged seen on EVERY arrival
    # (never admitted as new) are Bloom collisions; their rate must be
    # within ~3x the analytic bound for n/shard items in m bits
    n_items = counts.size
    fp_items = n_items - news.size
    m, k = 1 << BLOOM_BITS_LOG2, _BLOOM_K
    per_shard = n_items / 8
    p = (1 - math.exp(-k * per_shard / m)) ** k
    assert fp_items <= max(3 * p * n_items, 3), (fp_items, p * n_items)


def test_verdicts_stable_across_splits(spark, tmp_path, dup_stream):
    a = _run(spark, tmp_path / "a", dup_stream, n_files=1)
    b = _run(spark, tmp_path / "b", dup_stream, n_files=4)
    # same bitset evolution regardless of batching: per-item first-new
    # position and total new-count agree
    na = a[~a["probably_seen"]]["item"].tolist()
    nb = b[~b["probably_seen"]]["item"].tolist()
    assert sorted(na) == sorted(nb)
