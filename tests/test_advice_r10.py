"""Round-10 advisor findings, each pinned by a test so it can't
silently regress:

1. orders_interpurchase_km layers exp() on top of the quantized pico
   cumsum — a second transcendental between the exact integer state
   and the emitted value. ACCEPTED as the established absorb-by-
   quantize pattern (documented in queries/features.py); the pin here
   is the pattern's precondition: the survival value must be exactly
   half_up(exp(pico/1e12)*1e9)/1e9 of the exact integer cumsum, i.e.
   nothing but the one documented exp sits between state and output.
2. dq_psi_price_drift derived its bucket from a DUPLICATED cast-chain
   SQL string while an identical `cents` Column sat unused — the two
   could drift. Fixed: the bucket now derives from the single shared
   cents expression; pinned by an exact-value oracle compare.
3. psi_stream never emits for a reference type with no live events
   while psi_batch emits an n_seen=0 row for every calibrated type.
   Documented in the psi_stream docstring; pinned here as intentional.
4. Test models used python floor division / floor(x+0.5) as stand-ins
   for SQL div / HALF_UP — both wrong on negatives. Fixed with
   tests/_num.half_up / trunc_div; pinned against the real engines on
   NEGATIVE inputs (python's operators are pinned as diverging).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from tests._num import half_up, trunc_div

# negative-value edge cases where the naive stand-ins diverge
NEG_TIES = [-2.5, -0.5, -1.5, -3.5, -0.4999, -2.5000001, 2.5, 0.5]
NEG_DIVS = [(-7, 2), (7, -2), (-7, -2), (-1, 3), (1, -3), (-9, 3), (8, 3)]


def test_half_up_matches_spark_and_duckdb_on_negatives(spark):
    df = spark.createDataFrame([(v,) for v in NEG_TIES], "x double")
    got = df.select(F.round("x").cast("long").alias("r")).collect()
    duck = duckdb.connect()
    for v, row in zip(NEG_TIES, got):
        assert half_up(v) == row.r, v
        dd = duck.execute(
            "SELECT CAST(round(?) AS BIGINT)", [v]
        ).fetchone()[0]
        assert half_up(v) == dd, v
    # the old stand-in really diverges at negative ties
    assert math.floor(-2.5 + 0.5) != half_up(-2.5)


def test_trunc_div_matches_spark_div_and_duckdb_on_negatives(spark):
    df = spark.createDataFrame(NEG_DIVS, "a long, b long")
    got = df.select(F.expr("a div b").alias("q")).collect()
    duck = duckdb.connect()
    for (a, b), row in zip(NEG_DIVS, got):
        assert trunc_div(a, b) == row.q, (a, b)
        dd = duck.execute("SELECT ? // ?", [a, b]).fetchone()[0]
        assert trunc_div(a, b) == dd, (a, b)
    # python floor division really diverges on mixed signs
    assert (-7) // 2 != trunc_div(-7, 2)


def test_km_survival_is_pure_function_of_pico_cumsum(spark, sf_dir):
    """Advice #1 precondition: between the exact pico-int cumsum and
    the emitted survival there is EXACTLY the documented
    half_up(exp(.)*1e9)/1e9 — recomputing it from the emitted d/n_risk
    columns reproduces every row bit-exactly."""
    from dsp_spark.catalog import entries

    got = (
        entries()["orders_interpurchase_km"]
        .fn(spark, sf_dir)
        .orderBy("gap_days")
        .collect()
    )
    assert len(got) > 0
    pico = 0
    for r in got:
        if r.d < r.n_risk:
            pico += half_up(math.log(1.0 - float(r.d) / r.n_risk) * 1e12)
            want = half_up(math.exp(pico / 1e12) * 1e9) / 1e9
        else:
            want = 0.0
        assert r.survival == want, r.gap_days


def test_dq_psi_bucket_from_shared_cents_expression(spark, sf_dir, duck):
    """Advice #2: the de-duplicated bucket derivation must still match
    the oracle exactly (values, not just shape)."""
    from dsp_spark.catalog import entries
    from tests._compare import assert_results_equal

    e = entries()["dq_psi_price_drift"]
    s = e.fn(spark, sf_dir).toPandas()
    d = duck.execute(e.oracle).fetchdf()
    assert_results_equal(s, d)


def test_psi_stream_silent_reference_type_is_batch_only(spark, tmp_path):
    """Advice #3 pin: a calibrated type with NO live events yields an
    n_seen=0 row from psi_batch but (intentionally) nothing from
    psi_stream — stream groups exist only for arriving keys."""
    from dsp_spark.streaming.stateful import psi_batch, psi_stream

    ref = {"live": [5, 5, 5, 5, 5, 5, 5, 5, 5, 5],
           "silent": [10, 0, 0, 0, 0, 0, 0, 0, 0, 0]}
    pdf = pd.DataFrame(
        {"event_type": ["live"] * 20, "value": [float(i) for i in range(20)]}
    )

    batch = psi_batch(
        spark.createDataFrame(pdf), ref, threshold=0.2
    ).toPandas().set_index("event_type")
    assert int(batch.loc["silent", "n_seen"]) == 0
    assert int(batch.loc["live", "n_seen"]) == 20

    src = tmp_path / "src"
    src.mkdir()
    pdf.to_parquet(src / "f0.parquet")
    schema = spark.createDataFrame(pdf.head(2)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"psi_silent_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        psi_stream(stream, ref, threshold=0.2)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    res = spark.table(name).toPandas()
    assert set(res["event_type"]) == {"live"}  # no row for "silent"
