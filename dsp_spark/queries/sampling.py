"""Sampling / dataset-mixture catalog entries over `documents`.

Content-addressed (md5-bucket) sampling — reproducible across engines,
partitionings, and reruns; see operators/sampling.py for the 100 TB
properties. All three entries are narrow scans (zero shuffle before
the final small aggregate, if any).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import sampling as smp
from dsp_spark.queries._util import t

_BUCKET = smp.hash_bucket_sql("doc_id")

# per-language mixture rates: downsample dominant en, keep rare zh
_MIX = {"en": 0.25, "de": 0.6, "fr": 0.6, "es": 0.8, "zh": 1.0}
_MIX_THRESH = smp.stratified_threshold_sql("lang", _MIX)


@register(
    "sample_hash_10pct",
    f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {_BUCKET} < 1000
    """,
    doc="Deterministic 10% sample: membership = md5(doc_id) bucket < "
    "rate. Narrow filter at scan speed; stable under repartition and "
    "nested within any larger-rate sample of the same hash.",
)
def sample_hash_10pct(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return smp.deterministic_sample(d, "doc_id", 0.10).select(
        "doc_id", "source", "lang"
    )


@register(
    "sample_stratified_by_lang",
    f"""
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE {_BUCKET} < {_MIX_THRESH}
    GROUP BY lang
    """,
    doc="Stratified sample with per-language rates (dataset-mixture "
    "primitive: downsample dominant languages, keep rare ones). The "
    "stratum threshold is a CASE on the stratum column — still one "
    "narrow filter, zero shuffle before the tiny verification agg.",
)
def sample_stratified_by_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s = smp.stratified_sample(d, "doc_id", "lang", _MIX)
    return s.groupBy("lang").agg(
        F.count("*").alias("n_sampled"), F.min("doc_id").alias("min_doc_id")
    )


@register(
    "dataset_mixture_audit",
    f"""
    SELECT lang,
           COUNT(*) AS n_orig,
           COUNT(CASE WHEN {_BUCKET} < {_MIX_THRESH} THEN 1 END) AS n_sampled,
           CAST(COUNT(CASE WHEN {_BUCKET} < {_MIX_THRESH} THEN 1 END) AS DOUBLE)
           / COUNT(*) AS realized_rate
    FROM documents
    GROUP BY lang
    """,
    doc="Mixture audit: original vs sampled counts and realized rate "
    "per language in ONE scan (conditional count), the report a "
    "curation run emits to confirm the mixture hit its targets.",
)
def dataset_mixture_audit(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    thresh = smp.stratified_threshold("lang", _MIX)
    in_sample = F.when(smp.hash_bucket("doc_id") < thresh, F.lit(1))
    n_sampled = F.count(in_sample)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_orig"),
        n_sampled.alias("n_sampled"),
        (n_sampled.cast("double") / F.count("*")).alias("realized_rate"),
    )


@register(
    "sample_weighted_systematic",
    """
    WITH w AS (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(cum // 2000 AS BIGINT) AS bucket
    FROM w
    WHERE cum // 2000 > (cum - n_chars) // 2000
    """,
    doc="Length-weighted systematic sample: walk each source's docs in "
    "id order accumulating characters and keep the doc that crosses "
    "each 2k-char boundary — selection probability proportional to "
    "doc length, all integer arithmetic (no RNG, no libm), stable "
    "under re-runs and engine-exact. One shuffle (per-source window "
    "cumsum); no global sort — shards are sources, the same trick "
    "doc_pack_sequences uses. The weighted analogue of the "
    "content-addressed uniform sampler (operators/sampling.py).",
)
def sample_weighted_systematic(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum("n_chars").over(w)
    x = d.select("doc_id", "source", "n_chars", cum.alias("cum"))
    return (
        x.withColumn("bucket", F.expr("cum div 2000"))
        .filter(F.expr("cum div 2000 > (cum - n_chars) div 2000"))
        .select("doc_id", "source", "n_chars", F.col("bucket").cast("long").alias("bucket"))
    )
