#!/usr/bin/env python
"""Export a corpus as packed training sequences (the last mile).

    python tools/export_packed.py [--in DIR|--sf-dir DIR] [--out DIR]

Composes the chunking + packing operators into the artifact a trainer
actually consumes: overlapping character chunks per document, greedy
token-budget packing of chunks into fixed-size sequences (hash-sharded
— no global sort, bins never cross shards), written as parquet
partitioned by shard with a JSON manifest of sequence counts and the
token fill rate (packed tokens / sequence capacity), the number that
says how much compute the packing layout wastes.

Determinism: chunk boundaries are pure arithmetic, shard assignment is
a content hash of doc_id, and packing order is (doc_id, chunk_idx)
within a shard — the same corpus exports byte-identical assignments
under any input partitioning, so a re-run after a crash overwrites
with the same data.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

CHUNK_SIZE = 512
CHUNK_STRIDE = 384
PACK_BUDGET = 2048
PACK_SHARDS = 32


def export_packed(spark, docs, out_dir: str, *, order_col: str | None = None) -> dict:
    """docs: DataFrame with (doc_id, text). Returns the manifest.

    By default, shard = content hash of doc_id and packing order is
    (doc_id, chunk_idx) within a shard. When ``order_col`` is given,
    docs must ALSO carry (shard, <order_col>) columns — e.g. the
    (shard, pos) address of a deterministic epoch shuffle
    (queries/sampling.py dataset_shuffle_order) — and chunks pack in
    (<order_col>, chunk_idx) order within the given shard: the
    composed curate -> shuffle -> pack -> export pipeline, where the
    trainer reads sequences in epoch order straight off the shard
    files. Either way assignments stay partitioning-invariant (the
    order key is content-derived, never zipWithIndex).

    NULL-text docs cannot be chunked (the transform would silently emit
    nothing while n_docs still counted them); they are excluded up
    front and REPORTED in the manifest so a consumer reconciling docs
    against chunks sees the drop instead of a mystery. Empty-string
    docs keep the engine-wide token convention (split('') is one empty
    token) — one chunk, one token, consistent with text_token_stats.
    """
    from dsp_spark.operators import sampling as smp

    n_null = docs.where(F.col("text").isNull()).count()
    docs = docs.where(F.col("text").isNotNull())
    n_docs = docs.count()
    carry = ["shard", order_col] if order_col else []
    chunks = docs.select(
        "doc_id",
        *carry,
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - 1, 1), {CHUNK_STRIDE}), "
                f"i -> substring(text, i, {CHUNK_SIZE}))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    tok = F.size(F.expr("split(chunk_text, '\\\\s+')"))
    x = chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        (
            F.col("shard").cast("int")
            if order_col
            else (smp.hash_bucket("doc_id") % PACK_SHARDS).cast("int")
        ).alias("shard"),
        *([order_col] if order_col else []),
        tok.cast("long").alias("n_tok"),
    )
    order = [order_col, "chunk_idx"] if order_col else ["doc_id", "chunk_idx"]
    w = (
        W.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = x.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / PACK_BUDGET
        ).cast("long"),
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    per_shard = (
        back.groupBy("shard")
        .agg(
            F.countDistinct("seq_id").alias("n_sequences"),
            F.sum("n_tok").alias("tokens"),
            F.count("*").alias("n_chunks"),
        )
        .collect()
    )
    shards = {
        str(r.shard): {  # string keys: JSON round-trips exactly
            "n_sequences": int(r.n_sequences),
            "n_chunks": int(r.n_chunks),
            "tokens": int(r.tokens),
            "fill_rate": round(
                r.tokens / (r.n_sequences * PACK_BUDGET), 4
            ),
        }
        for r in per_shard
    }
    total_seqs = sum(s["n_sequences"] for s in shards.values())
    total_toks = sum(s["tokens"] for s in shards.values())
    manifest = {
        "n_docs": n_docs,
        "n_docs_null_text": n_null,
        "n_chunks": sum(s["n_chunks"] for s in shards.values()),
        "n_sequences": total_seqs,
        "tokens": total_toks,
        "budget": PACK_BUDGET,
        "fill_rate": round(total_toks / (total_seqs * PACK_BUDGET), 4)
        if total_seqs
        else 0.0,
        "shards": shards,
        "out": out_dir,
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="packed-sequence export")
    p.add_argument("--in", dest="in_dir", default=None, help="curated parquet dir")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/dsp_packed")
    args = p.parse_args(argv)

    from dsp_spark.session import get_session, read_table

    spark = get_session("dsp-export-packed")
    docs = (
        spark.read.parquet(args.in_dir)
        if args.in_dir
        else read_table(spark, args.sf_dir, "documents")
    ).select("doc_id", "text")
    print(json.dumps(export_packed(spark, docs, args.out)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
