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
