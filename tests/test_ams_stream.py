"""AMS F2 second-moment sketch (stateful.py:ams_f2_stream):

* ±1 sign sums are order-independent integers, so the FINAL stream
  emission bit-matches ams_f2_batch on the same rows for every
  micro-batch split and under late arrivals;
* the python sign/estimate helpers bit-match the batch twin's JVM
  md5 expressions (the cross-implementation contract);
* the estimate lands within the AMS error band of the exact second
  moment on a skewed distribution (median-of-means, k=16).
"""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    AMS_K,
    _ams_estimate,
    _ams_sign,
    ams_f2_batch,
    ams_f2_stream,
)


def _testdata(shuffle: bool = False) -> pd.DataFrame:
    rng = random.Random(97)
    rows = []
    # skewed: one hot type + zipf-ish tail, two keys with different shapes
    for _ in range(1500):
        rows.append(("spam", "tpl" if rng.random() < 0.6 else f"t{rng.randrange(50)}"))
    for _ in range(1500):
        rows.append(("clean", f"w{rng.randrange(400)}"))
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
        ams_f2_stream(stream, key_col="k", item_col="item")
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final = {}
    for r in spark.read.parquet(str(out)).collect():
        cur = final.get(r.key)
        if cur is None or r.batch_id > cur[0]:
            final[r.key] = (r.batch_id, r.n_items, r.f2_est, r.simpson_est)
    return {k: v[1:] for k, v in final.items()}


def _batch_final(spark, pdf):
    return {
        r.key: (r.n_items, r.f2_est, r.simpson_est)
        for r in ams_f2_batch(
            spark.createDataFrame(pdf), key_col="k", item_col="item"
        ).collect()
    }


def test_ams_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want and len(want) == 2


def test_ams_stream_invariant_under_split_and_late_arrival(spark, tmp_path):
    pdf = _testdata()
    late = _testdata(shuffle=True)
    a = _stream_final(spark, pdf, tmp_path / "a", 1)
    b = _stream_final(spark, pdf, tmp_path / "b", 4)
    c = _stream_final(spark, late, tmp_path / "c", 4)
    assert a == b == c


def test_python_signs_match_jvm_expression(spark):
    """The stream's _ams_sign and the batch twin's md5 expression must
    be the same function — the whole parity contract hangs on it."""
    items = [f"t{j}" for j in range(40)] + ["tpl", "", "a:b", "0"]
    rows = [(i, it) for i in range(AMS_K) for it in items]
    df = spark.createDataFrame(rows, "i int, item string")
    got = df.select(
        "i",
        "item",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("i"), F.col("item"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("s"),
    ).collect()
    for r in got:
        assert _ams_sign(r.i, r.item) == r.s, (r.i, r.item)


def test_ams_estimate_within_error_band_of_exact():
    """Sketch accuracy: on the skewed key the lower-median-of-means
    estimate must land within 50% of the exact F2 (k=16 gives a loose
    but honest band), and Simpson-lambda must separate the template
    key from the clean key by an order of magnitude."""
    pdf = _testdata()
    res = {}
    for key, grp in pdf.groupby("k"):
        counts = Counter(grp["item"])
        n = sum(counts.values())
        exact_f2 = sum(v * v for v in counts.values())
        z = [0] * AMS_K
        for item, c in counts.items():
            for i in range(AMS_K):
                z[i] += _ams_sign(i, item) * c
        f2, simpson = _ams_estimate(z, n)
        assert 0.5 * exact_f2 <= f2 <= 1.5 * exact_f2, (key, f2, exact_f2)
        exact_simpson = (exact_f2 - n) / (n * (n - 1))
        res[key] = (simpson, exact_simpson)
    assert res["spam"][0] > 10 * res["clean"][0]
    assert res["spam"][1] > 10 * res["clean"][1]
