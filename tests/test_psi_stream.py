"""Streaming PSI drift monitor: parity contracts.

* every emission is a function of exact integer bucket counts, so the
  final streamed PSI per key bit-equals the batch twin for every
  micro-batch split and arrival order;
* a reference-free event type accumulates state but emits no verdict,
  matching the batch twin's reference-keyed grid;
* the batch twin's smoothing/quantization is pinned to the catalog
  entry dq_psi_price_drift's model (same +1 smoothing, same
  pico-quantized terms);
* identical under the RocksDB state provider.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    _PSI_BUCKET_CENTS,
    _PSI_BUCKETS,
    psi_batch,
    psi_stream,
)

REF = {
    # calibrated on a flat-ish historical window
    "click": [40, 40, 40, 40, 40, 40, 40, 40, 40, 40],
    "error": [100, 80, 60, 40, 20, 10, 5, 5, 5, 5],
}
THRESH = 0.2


def _testdata(seed=13, shuffle=False):
    rng = random.Random(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    # click stays flat (no drift); error shifts mass upward (drift);
    # view has NO reference entry
    for ty, lo, hi, n in (
        ("click", 0, 100, 300),
        ("error", 60, 100, 300),
        ("view", 0, 100, 50),
    ):
        for _ in range(n):
            rows.append(
                (
                    eid,
                    base + pd.Timedelta(minutes=eid),
                    ty,
                    round(rng.uniform(lo, hi), 2),
                )
            )
            eid += 1
    if shuffle:
        rng.shuffle(rows)
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "event_type", "value"]
    )


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
        psi_stream(stream, REF, THRESH)
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
            final[r.event_type] = (r.batch_id, r.n_seen, r.psi, r.drifted)
    return {k: v[1:] for k, v in final.items()}


def _batch_final(spark, pdf):
    return {
        r.event_type: (r.n_seen, r.psi, r.drifted)
        for r in psi_batch(
            spark.createDataFrame(pdf), REF, THRESH
        ).collect()
    }


def test_psi_stream_matches_batch_twin(spark, tmp_path):
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    got = _stream_final(spark, pdf, tmp_path, 3)
    assert got == want
    # reference-free type emits nothing on either side
    assert "view" not in got and len(want) == 2
    # the planted shift drifts, the flat series does not
    assert want["error"][2] is True
    assert want["click"][2] is False


def test_psi_stream_invariant_under_split_and_order(spark, tmp_path):
    a = _stream_final(spark, _testdata(), tmp_path / "a", 1)
    b = _stream_final(spark, _testdata(), tmp_path / "b", 5)
    c = _stream_final(spark, _testdata(shuffle=True), tmp_path / "c", 5)
    assert a == b == c


def test_psi_model_pins_to_catalog_smoothing(spark):
    """psi_batch must use the catalog entry's exact model: +1 Laplace
    over counts, pico-quantized (p-q)*ln(p/q) terms summed as ints."""
    pdf = _testdata()
    want = _batch_final(spark, pdf)
    cents = [
        int(round(v * 100)) for v in pdf[pdf.event_type == "error"].value
    ]
    live = Counter(
        min(c // _PSI_BUCKET_CENTS, _PSI_BUCKETS - 1) for c in cents
    )
    lvec = [live.get(i, 0) for i in range(_PSI_BUCKETS)]
    rvec = REF["error"]
    tl = sum(lvec) + _PSI_BUCKETS
    tr = sum(rvec) + _PSI_BUCKETS
    pico = 0
    for lc, rc in zip(lvec, rvec):
        p = float(lc + 1) / tl
        q = float(rc + 1) / tr
        pico += math.floor((p - q) * math.log(p / q) * 1e12 + 0.5)
    assert want["error"] == (sum(lvec), pico / 1e12, pico / 1e12 > THRESH)


def test_psi_stream_identical_under_rocksdb(spark, tmp_path):
    from tests.test_rocksdb_state import rocksdb_state

    pdf = _testdata()
    want = _stream_final(spark, pdf, tmp_path / "h", 3)
    with rocksdb_state(spark):
        got = _stream_final(spark, pdf, tmp_path / "r", 3)
    assert got == want
