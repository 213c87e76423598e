"""Streaming per-key HLL distinct count: accuracy vs the exact batch
answer, replay idempotency, and micro-batch-boundary state equality."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import approx_distinct_stream


@pytest.fixture(scope="module")
def keyed_items():
    rng = random.Random(23)
    rows = []
    # three keys with very different true cardinalities
    for i in range(6000):
        rows.append(("clicks", f"u{rng.randrange(2000)}"))
    for i in range(2000):
        rows.append(("views", f"u{rng.randrange(150)}"))
    for i in range(200):
        rows.append(("buys", f"u{rng.randrange(12)}"))
    rng.shuffle(rows)
    return rows


def _run(spark, tmp_path, rows, n_files):
    pdf = pd.DataFrame(rows, columns=["key", "item"])
    pdf["event_id"] = range(len(pdf))
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
    name = f"hll_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        approx_distinct_stream(stream, key_col="key", item_col="item")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table(name).toPandas()
    # final estimate per key: registers only ever rise, so the final
    # emission has the fewest zero registers and, within that, the
    # LARGEST estimate
    final = {}
    for key, grp in res.groupby("key"):
        final[key] = float(
            grp.sort_values(
                ["n_zero_regs", "estimate"], ascending=[True, False]
            ).iloc[0]["estimate"]
        )
    return final, batch_df


def test_estimates_within_tolerance(spark, tmp_path, keyed_items):
    final, batch_df = _run(spark, tmp_path, keyed_items, n_files=3)
    exact = {
        r.key: r.n
        for r in batch_df.groupBy("key")
        .agg(F.countDistinct("item").alias("n"))
        .collect()
    }
    assert set(final) == set(exact)
    for key, n in exact.items():
        # 256 registers -> rsd ~6.5%; 3 sigma plus small-range slack
        assert abs(final[key] - n) <= max(0.25 * n, 4), (key, final[key], n)


def test_state_identical_across_microbatch_splits(spark, tmp_path, keyed_items):
    one, _ = _run(spark, tmp_path / "one", keyed_items, n_files=1)
    four, _ = _run(spark, tmp_path / "four", keyed_items, n_files=4)
    assert one == four


def test_replay_idempotent(spark, tmp_path, keyed_items):
    """Feeding every row TWICE must not change the estimate: register
    max() absorbs duplicates, the property that makes at-least-once
    delivery safe."""
    once, _ = _run(spark, tmp_path / "a", keyed_items, n_files=2)
    twice, _ = _run(spark, tmp_path / "b", keyed_items + keyed_items, n_files=2)
    assert once == twice
