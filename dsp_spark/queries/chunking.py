"""Document chunking & sequence packing — the two reshaping steps between
a curated corpus and a training run.

Beyond-reference layer (the reference has no document model at all;
SURVEY.md §7 north star). Both operators are pure narrow-or-windowed
DataFrame transforms:

* ``doc_chunk_sliding`` — overlapping character windows per document.
  Narrow map with a 1->N fan-out (explode of a tiny offsets array); zero
  shuffle, scales linearly with corpus bytes. At 100 TB this runs at
  parquet-scan speed and the output is written partition-local.
* ``doc_pack_sequences`` — greedy token-budget packing into fixed-size
  training sequences. A global ORDER BY would serialize on one task, so
  packing is sharded by a content hash (md5 of doc_id): each shard packs
  independently with a window cumulative sum. Shard count is the
  parallelism knob — 32 here, thousands at 100 TB; bins never cross
  shards so the result is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import sampling as smp
from dsp_spark.operators import textops
from dsp_spark.queries._util import t

CHUNK_SIZE = 512  # chars per chunk
CHUNK_STRIDE = 384  # overlap = size - stride = 128
PACK_BUDGET = 2048  # tokens per packed sequence
PACK_SHARDS = 32


@register(
    "doc_chunk_sliding",
    f"""
    WITH c AS (
        SELECT doc_id, text,
               unnest(generate_series(0, greatest(length(text) - 1, 0),
                                      {CHUNK_STRIDE})) AS off
        FROM documents
    )
    SELECT doc_id,
           CAST(off // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(length(substring(text, off + 1, {CHUNK_SIZE})) AS INTEGER) AS chunk_len,
           md5(substring(text, off + 1, {CHUNK_SIZE})) AS chunk_hash
    FROM c
    """,
    doc="Sliding-window chunking (512-char chunks, 128-char overlap): the "
    "context-window prep step of a training pipeline. Explode of a "
    "per-row offsets sequence — narrow, zero shuffle, scan-speed.",
)
def doc_chunk_sliding(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    offs = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - F.lit(1), F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunk = f"substring(text, off + 1, {CHUNK_SIZE})"
    return d.select("doc_id", "text", F.explode(offs).alias("off")).select(
        "doc_id",
        (F.col("off") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.expr(f"length({chunk})").cast("int").alias("chunk_len"),
        F.expr(f"md5({chunk})").alias("chunk_hash"),
    )


_SHARD_DUCK = f"({smp.hash_bucket_sql('doc_id')}) % {PACK_SHARDS}"


@register(
    "doc_pack_sequences",
    f"""
    WITH x AS (
        SELECT doc_id,
               CAST({_SHARD_DUCK} AS INTEGER) AS shard,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
        FROM documents
    ), p AS (
        SELECT shard, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        FROM x
    )
    SELECT shard,
           CAST(prev // {PACK_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM p
    GROUP BY 1, 2
    """,
    doc="Token-budget sequence packing (concat-then-split, 2048-token "
    "sequences): docs are hash-sharded, each shard packs independently "
    "via a window cumulative sum, so there is no global sort bottleneck "
    "and shard count scales the parallelism.",
)
def doc_pack_sequences(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    x = d.select(
        "doc_id",
        (smp.hash_bucket("doc_id") % PACK_SHARDS).cast("int").alias("shard"),
        F.size(textops.tokens("text")).cast("long").alias("n_tok"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    p = x.select(
        "shard",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("prev"),
    )
    return p.groupBy(
        "shard", F.floor(F.col("prev") / PACK_BUDGET).alias("seq_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )


_FIM_H1 = smp.hash_int_sql("doc_id", salt="fim1|")
_FIM_H2 = smp.hash_int_sql("doc_id", salt="fim2|")
_FIM_H1_S = smp.hash_int_sql("doc_id", salt="fim1|", dialect="spark")
_FIM_H2_S = smp.hash_int_sql("doc_id", salt="fim2|", dialect="spark")


@register(
    "doc_fim_split",
    f"""
    WITH cuts AS (
        SELECT doc_id, text, length(text) AS n,
               {_FIM_H1} % (length(text) + 1) AS c1
        FROM documents
    ),
    cc AS (
        SELECT doc_id, text, n, c1,
               c1 + {_FIM_H2} % (n - c1 + 1) AS c2
        FROM cuts
    )
    SELECT doc_id,
           CAST(c1 AS BIGINT) AS prefix_len,
           CAST(c2 - c1 AS BIGINT) AS middle_len,
           CAST(n - c2 AS BIGINT) AS suffix_len,
           md5(substr(text, 1, CAST(c1 AS INTEGER))) AS prefix_md5,
           md5(substr(text, CAST(c1 + 1 AS INTEGER),
                      CAST(c2 - c1 AS INTEGER))) AS middle_md5,
           md5(substr(text, CAST(c2 + 1 AS INTEGER),
                      CAST(n - c2 AS INTEGER))) AS suffix_md5
    FROM cc
    """,
    doc="Fill-in-the-middle (FIM) training transform: split every doc "
    "into (prefix, middle, suffix) at two DETERMINISTIC cut points "
    "derived from salted content-addressed hashes (the same "
    "salted_md5/hash_int idiom every sampling/sharding key uses — no "
    "RNG state, reproducible across reruns and partitionings; c1 "
    "uniform in [0, n], c2 uniform in [c1, n], so empty segments are "
    "legitimate outcomes the trainer must handle). Emits segment "
    "lengths AND md5s of the actual segment bytes, so the oracle "
    "verifies the split CONTENT, not just arithmetic. Pure narrow map "
    "at scan speed — zero shuffle; the downstream PSM/SPM reassembly "
    "is string concat on these exact offsets.",
)
def doc_fim_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n = F.length("text")
    c1 = F.expr(_FIM_H1_S) % (n + 1)
    cc = d.select("doc_id", "text", n.alias("n"), c1.alias("c1")).withColumn(
        "c2", F.col("c1") + F.expr(_FIM_H2_S) % (F.col("n") - F.col("c1") + 1)
    )
    return cc.select(
        "doc_id",
        F.col("c1").cast("bigint").alias("prefix_len"),
        (F.col("c2") - F.col("c1")).cast("bigint").alias("middle_len"),
        (F.col("n") - F.col("c2")).cast("bigint").alias("suffix_len"),
        F.md5(F.expr("substring(text, 1, CAST(c1 AS INT))")).alias("prefix_md5"),
        F.md5(
            F.expr("substring(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))")
        ).alias("middle_md5"),
        F.md5(
            F.expr("substring(text, CAST(c2 + 1 AS INT), CAST(n - c2 AS INT))")
        ).alias("suffix_md5"),
    )


@register(
    "doc_truncation_loss",
    """
    WITH d AS (
      SELECT doc_id,
             len(string_split_regex(text, '\\s+')) AS n_tokens
      FROM documents
    ), caps AS (
      SELECT cap FROM (VALUES (64), (128), (256)) AS c(cap)
    )
    SELECT c.cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN d.n_tokens > c.cap THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_truncated,
           CAST(SUM(LEAST(d.n_tokens, c.cap)) AS BIGINT) AS tokens_kept,
           CAST(SUM(GREATEST(d.n_tokens - c.cap, 0)) AS BIGINT)
             AS tokens_lost,
           CAST(SUM(LEAST(d.n_tokens, c.cap)) AS DOUBLE)
             / CAST(SUM(d.n_tokens) AS BIGINT) AS kept_rate
    FROM d CROSS JOIN caps c
    GROUP BY c.cap
    """,
    doc="Context-length truncation loss: for each candidate sequence "
    "cap, how many documents overflow and what fraction of corpus "
    "tokens survives a hard truncate — the number that picks the "
    "packing length before doc_pack_sequences spends the compute. One "
    "narrow scan crossed with a 3-row literal cap table (broadcast), "
    "integer min/max algebra, a 3-row rollup; at 100 TB the doc-grain "
    "relation partial-aggregates map-side per cap.",
)
def doc_truncation_loss(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        F.expr("size(split(text, '\\\\s+'))").alias("n_tokens")
    )
    caps = spark.createDataFrame([(64,), (128,), (256,)], "cap int")
    j = d.crossJoin(F.broadcast(caps))
    kept = F.sum(F.least(F.col("n_tokens"), F.col("cap")))
    return j.groupBy("cap").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_tokens") > F.col("cap"), 1).otherwise(0))
        .cast("bigint")
        .alias("docs_truncated"),
        kept.cast("bigint").alias("tokens_kept"),
        F.sum(F.greatest(F.col("n_tokens") - F.col("cap"), F.lit(0)))
        .cast("bigint")
        .alias("tokens_lost"),
        (kept.cast("double") / F.sum("n_tokens").cast("bigint")).alias(
            "kept_rate"
        ),
    )
