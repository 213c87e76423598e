"""The r14 in-row PQ encode/score must match the exploded join-based
formulation it replaced (operators/similarity.py pq_codes_col /
pq_adc_map_col / pq_est_col vs the old pq_parts shape): same codebook,
same argmax tie-break (lowest code), same DECIMAL(18,8) ADC grain,
same exact-sum estimate. The old shape is rebuilt inline here as the
reference model so a drift in any of the in-row folds fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.functions.vectors import dot
from dsp_spark.operators import similarity as sim

M, SUB, KSUB, NQ = 8, 8, 16, 5


def _explode_subs(df, out, id_col="vec_id", vec_col="embedding"):
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[F.slice(F.col(vec_col), i * SUB + 1, SUB) for i in range(M)]
            )
        ).alias("m", out),
    )


def _reference_parts(e):
    """The pre-r14 exploded formulation: enc via groupBy argmax, adc as
    a (query, m, code) relation."""
    subs = _explode_subs(e, "sv")
    cb = subs.where(F.col("vec_id") < KSUB).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    enc = (
        subs.join(F.broadcast(cb), "m")
        .select("vec_id", "m", F.round(dot("sv", "cv"), 6).alias("d6"), "code")
        .groupBy("vec_id", "m")
        .agg(F.max(F.struct("d6", (-F.col("code")).alias("nc"))).alias("b"))
        .select("vec_id", "m", (-F.col("b.nc")).cast("bigint").alias("code"))
    )
    q = _explode_subs(e.where(F.col("vec_id") < NQ), "qv").withColumnRenamed(
        "vec_id", "query_id"
    )
    adc = q.join(F.broadcast(cb), "m").select(
        "query_id",
        "m",
        "code",
        F.round(dot("qv", "cv"), 8).cast("decimal(18,8)").alias("pdot"),
    )
    return enc, adc


def test_inrow_codes_match_exploded_argmax(spark, sf_dir):
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    enc_ref, _ = _reference_parts(e)
    ref = enc_ref.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(m, code))), s -> s.code)"
        ).alias("codes")
    )
    cbp = sim.pq_codebook_packed(e)
    got = e.crossJoin(F.broadcast(cbp)).select(
        "vec_id", sim.pq_codes_col("embedding").alias("codes")
    )
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0


def test_inrow_est_matches_exploded_sum(spark, sf_dir):
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    enc_ref, adc_ref = _reference_parts(e)
    ref = (
        enc_ref.join(F.broadcast(adc_ref), ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").cast("double").alias("est"))
    )
    cbp = sim.pq_codebook_packed(e)
    adc = (
        e.where(F.col("vec_id") < NQ)
        .crossJoin(F.broadcast(cbp))
        .select(
            F.col("vec_id").alias("query_id"),
            sim.pq_adc_map_col("embedding").alias("_adc"),
        )
    )
    got = (
        e.crossJoin(F.broadcast(cbp))
        .select("vec_id", sim.pq_codes_col("embedding").alias("_codes"))
        .crossJoin(F.broadcast(adc))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.pq_est_col().alias("est"))
    )
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0
