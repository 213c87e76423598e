"""Round-9 advisor findings, each pinned by a test so it can't silently
regress:

1. k_anonymity_stream keyed state on concat_ws("|", ...) — NULL columns
   silently dropped and the delimiter unescaped, so distinct QI classes
   could merge and over-report k (hiding a below-threshold class from
   the privacy gate). Fixed: state keys on the RAW columns; the qi
   output string is a display-only injective encoding.
2. _ewma_fn / _net_fn converted value -> cents via Python
   round(float(v)*100) (HALF_EVEN on an inexact double product) while
   the batch twins use CAST(value AS DECIMAL(12,2))*100 (HALF_UP via
   BigDecimal.valueOf). Fixed: _cents_decimal replicates the Spark
   cast exactly; _cents_round replicates F.round(value*100) for the
   zscore path.
3. _ewma_stream_final inferred emission recency from (last_ts, n_used),
   which is ambiguous when a late arrival lands inside a full last-16
   buffer. Fixed: foreachBatch tags emissions with the micro-batch id
   and the highest id wins.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    _cents_decimal,
    _cents_round,
    _qi_display,
    k_anonymity_stream,
)

# values whose cents conversion is rounding-mode sensitive: >2 decimal
# places, exact .5 products, shortest-repr edge cases
TRICKY = [2.675, 0.005, 1.005, 0.125, 499.995, 2.665, 0.015, 3.0, 0.1,
          123.456, 0.994999, 86.285]


def test_cents_decimal_matches_spark_cast(spark):
    """_cents_decimal must bit-match CAST(v AS DECIMAL(12,2))*100 for
    every tricky double — the conversion the ewma/cdc batch twins use."""
    df = spark.createDataFrame([(v,) for v in TRICKY], "value double")
    got = df.select(
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("c")
    ).collect()
    for v, row in zip(TRICKY, got):
        assert _cents_decimal(v) == row.c, v


def test_cents_round_matches_spark_round(spark):
    """_cents_round must bit-match F.round(value*100) — the conversion
    the running-zscore batch twin uses."""
    df = spark.createDataFrame([(v,) for v in TRICKY], "value double")
    got = df.select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    ).collect()
    for v, row in zip(TRICKY, got):
        assert _cents_round(v) == row.c, v


def test_python_round_would_have_diverged():
    """The original bug, kept as documentation: banker's rounding on the
    double product disagrees with the Spark decimal cast on >2-decimal
    inputs, so the old code's bit-equality claim was false."""
    assert round(float(2.665) * 100) == 266  # HALF_EVEN on exact 266.5
    assert _cents_decimal(2.665) == 267      # DECIMAL(12,2) HALF_UP
    assert round(float(0.005) * 100) == 0    # HALF_EVEN on exact 0.5
    assert _cents_round(0.005) == 1          # F.round HALF_UP
    assert round(float(1.005) * 100) == 100  # double product 100.4999...
    assert _cents_decimal(1.005) == 101      # shortest repr '1.005' -> 1.01


def test_qi_display_injective_on_null_and_delimiter():
    """Distinct QI tuples must render to distinct strings — NULL vs
    'N', pipe-bearing values, trailing backslashes."""
    tuples = [
        ("A", None), (None, "A"), ("A", "N"), ("N", "A"),
        ("A|B", "C"), ("A", "B|C"), ("A|B|C",), ("A\\", "x"),
        ("A", "\\x"), ("\\N", "y"), (None, "y"), ("", ""), (None, None),
    ]
    rendered = [_qi_display(t) for t in tuples]
    assert len(set(rendered)) == len(tuples)


def _run_kanon(spark, tmp_path, pdf, qi_cols):
    src = tmp_path / "src"
    src.mkdir()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "f0.parquet")
    pdf.iloc[half:].to_parquet(src / "f1.parquet")
    schema = spark.createDataFrame(pdf).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "kanon_r9"
    q = (
        k_anonymity_stream(stream, qi_cols)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final: dict[str, int] = {}
    for r in spark.table(name).collect():
        final[r.qi] = max(final.get(r.qi, 0), r.k)
    return final


def test_k_anonymity_stream_null_and_delimiter_classes(spark, tmp_path):
    """('A', NULL), (NULL, 'A'), and pipe-bearing values are DISTINCT
    equivalence classes; the old concat_ws key merged them, inflating k
    and hiding below-threshold classes from the gate."""
    rows = (
        [("A", None)] * 3
        + [(None, "A")] * 5
        + [("A|B", "C")] * 2
        + [("A", "B|C")] * 7
        + [("A", "A")] * 1          # the singleton a gate must see
        + [(None, None)] * 4
    )
    pdf = pd.DataFrame(rows, columns=["nat", "seg"]).astype("object")
    final = _run_kanon(spark, tmp_path, pdf, ["nat", "seg"])
    want = {
        _qi_display((None if pd.isna(a) else a, None if pd.isna(b) else b)): k
        for (a, b), k in pdf.groupby(["nat", "seg"], dropna=False)
        .size()
        .items()
    }
    assert final == want
    # the old concat_ws key would have folded these 6 classes into 4
    assert len(final) == 6
    assert final[_qi_display(("A", "A"))] == 1  # singleton still visible


def test_ewma_stream_late_arrival_inside_full_buffer(spark, tmp_path):
    """A late event that lands inside a full last-16 buffer WITHOUT
    changing last_ts or n_used must still win: the final streamed state
    (selected by micro-batch id) bit-equals the batch twin over the
    full dataset. Under the old (last_ts, n_used) max-selection the
    stale pre-merge emission could win nondeterministically."""
    from dsp_spark.streaming.stateful import ewma_last16_batch, ewma_stream

    base = pd.Timestamp("2024-01-01")
    rows = [
        (eid, base + pd.Timedelta(minutes=eid), 0, 10.0 + eid)
        for eid in range(21)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    on_time = pdf[pdf.event_id != 10]
    late = pdf[pdf.event_id == 10]

    src = tmp_path / "src"
    src.mkdir()
    on_time.to_parquet(src / "f0.parquet", coerce_timestamps="us")
    late.to_parquet(src / "f1.parquet", coerce_timestamps="us")
    os.utime(src / "f0.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "f1.parquet", (1_700_000_100, 1_700_000_100))

    schema = spark.createDataFrame(pdf).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out, ck = tmp_path / "out", tmp_path / "ck"

    def _sink(df, epoch_id):
        df.withColumn("batch_id", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(str(out))

    q = (
        ewma_stream(stream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    emitted = spark.read.parquet(str(out)).collect()
    # the ambiguity the advisor flagged, reproduced: both emissions
    # share (last_ts, n_used) but differ in ewma_cents
    keys = {(r.last_ts, r.n_used) for r in emitted}
    assert len(keys) == 1 and len({r.ewma_cents for r in emitted}) == 2

    best = max(emitted, key=lambda r: r.batch_id)
    want = ewma_last16_batch(spark.createDataFrame(pdf)).collect()[0]
    assert (best.n_used, best.last_ts, best.ewma_cents) == (
        want.n_used,
        want.last_ts,
        want.ewma_cents,
    )
