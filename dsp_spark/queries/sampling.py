"""Sampling / dataset-mixture catalog entries over `documents`.

Content-addressed (md5-bucket) sampling — reproducible across engines,
partitionings, and reruns; see operators/sampling.py for the 100 TB
properties. All three entries are narrow scans (zero shuffle before
the final small aggregate, if any).
"""

from __future__ import annotations

from pyspark.sql import Window as W
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


@register(
    "dataset_split_assign",
    f"""
    SELECT CASE WHEN {_BUCKET} < 100 THEN 'test'
                WHEN {_BUCKET} < 200 THEN 'val'
                ELSE 'train' END AS split,
           lang, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test split (98/1/1): membership is a "
    "CASE over the content-addressed md5 bucket, so the split is "
    "stable under repartition, re-runs, and corpus growth (a doc "
    "never migrates between splits when new data arrives). One scan, "
    "tiny verification aggregate; at 100 TB the assignment is a "
    "narrow projection written alongside the data.",
)
def dataset_split_assign(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    b = smp.hash_bucket("doc_id")
    split = (
        F.when(b < 100, "test").when(b < 200, "val").otherwise("train")
    )
    return (
        d.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_N_SHARDS = 32


@register(
    "corpus_shard_manifest",
    f"""
    SELECT {_BUCKET} % {_N_SHARDS} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="Training-shard manifest: every doc lands in one of N shards "
    "by content-addressed hash, and the manifest reports per-shard "
    "row/byte balance (the skew check before a shuffle-write). At "
    "scale this IS the plan for `df.repartition(N, shard).write` — "
    "hash sharding gives balanced shards regardless of source or "
    "time skew in the input order.",
)
def corpus_shard_manifest(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    shard = smp.hash_bucket("doc_id") % _N_SHARDS
    return (
        d.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "doc_length_histogram",
    """
    SELECT length(bin(n_chars)) AS log2_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Sequence-length histogram in power-of-2 buckets — the packing-"
    "efficiency / truncation-loss report before choosing a training "
    "context length. Bucket = bit-length of n_chars (length of the "
    "binary string), an exact integer op on both engines — no "
    "floating log2 whose last-ulp rounding could differ across libm "
    "implementations. One scan, ~20-row output.",
)
def doc_length_histogram(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            F.length(F.bin("n_chars")).alias("log2_bucket"), "n_chars"
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "mixture_temperature_weights",
    """
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, total_chars,
           sqrt(CAST(n_docs AS DOUBLE))
             / sqrt(CAST((SELECT MAX(n_docs) FROM counts) AS DOUBLE))
             AS rel_weight
    FROM counts
    """,
    doc="Temperature-based mixture reweighting (alpha = 0.5): each "
    "language's sampling weight relative to the largest one, "
    "sqrt(n_l)/sqrt(n_max) — upweights rare languages the way "
    "multilingual training mixtures do. sqrt and one division are "
    "IEEE-exact on both engines (no order-dependent double sum: the "
    "normalizer is a MAX, not a SUM). Scalar subquery = 1-row "
    "broadcast over a per-language aggregate.",
)
def mixture_temperature_weights(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    mx = counts.agg(F.max("n_docs").alias("max_n"))
    return (
        counts.crossJoin(F.broadcast(mx))
        .select(
            "lang",
            "n_docs",
            "total_chars",
            (
                F.sqrt(F.col("n_docs").cast("double"))
                / F.sqrt(F.col("max_n").cast("double"))
            ).alias("rel_weight"),
        )
    )


@register(
    "table_stats_documents",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT doc_id) AS ndv_doc_id,
           COUNT(DISTINCT lang) AS ndv_lang,
           COUNT(DISTINCT source) AS ndv_source,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_text,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
    doc="ANALYZE-style column statistics in one scan: row count, exact "
    "NDVs, null counts, min/max — what a catalog/CBO ingests and what a "
    "curation run sanity-checks first. Exact distincts partial-aggregate "
    "per column; swap in approx_count_distinct at 100 TB (the HLL "
    "sketch path, approx_distinct_docs_hll) when exactness isn't "
    "required.",
)
def table_stats_documents(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("ndv_doc_id"),
        F.countDistinct("lang").alias("ndv_lang"),
        F.countDistinct("source").alias("ndv_source"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "corpus_snapshot_diff",
    f"""
    WITH v1 AS (
        SELECT doc_id, md5(text) AS h FROM documents
        WHERE {_BUCKET} < 9000
    ), v2 AS (
        SELECT doc_id,
               CASE WHEN {_BUCKET} % 13 = 0 THEN md5(text || '!') 
                    ELSE md5(text) END AS h
        FROM documents
        WHERE {_BUCKET} >= 1000
    )
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n_docs,
           MIN(COALESCE(v1.doc_id, v2.doc_id)) AS min_doc_id
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1
    """,
    doc="Dataset-versioning diff: full outer join of two corpus "
    "snapshots on doc id, content compared by hash -> added / removed / "
    "changed / unchanged counts (the audit before retraining on a new "
    "crawl). Snapshots here are hash-bucket slices of the one documents "
    "table (v1 = first 90%, v2 = last 90% with every 13th doc's text "
    "perturbed); the join shuffles 8-byte ids + 32-byte hashes, never "
    "documents.",
)
def corpus_snapshot_diff(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    b = smp.hash_bucket("doc_id")
    v1 = d.filter(b < 9000).select("doc_id", F.md5("text").alias("h"))
    v2 = d.filter(b >= 1000).select(
        "doc_id",
        F.when(b % 13 == 0, F.md5(F.concat(F.col("text"), F.lit("!"))))
        .otherwise(F.md5("text"))
        .alias("h"),
    )
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("v1.doc_id").isNull(), "added")
        .when(F.col("v2.doc_id").isNull(), "removed")
        .when(F.col("v1.h") != F.col("v2.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce(F.col("v1.doc_id"), F.col("v2.doc_id")).alias("did"),
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"), F.min("did").alias("min_doc_id"))
    )


@register(
    "sample_source_cap",
    """
    WITH ranked AS (
        SELECT doc_id, source, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source, lang FROM ranked WHERE rn <= 40
    """,
    doc="Per-source frequency capping: keep at most N=40 documents per "
    "source, selected by content-addressed order (md5 of the id), the "
    "standard guard against one crawl domain dominating a training "
    "mixture. Deterministic under repartition — no RNG, no sort of the "
    "full corpus: one shuffle on source, a bounded per-group rank, and "
    "the md5 order means adding documents elsewhere never changes which "
    "of a source's documents survive. At 100 TB the rank never "
    "materializes more than each group's window state; a hot source "
    "(every web crawl has one) stays a single skewed group only until "
    "AQE splits the preceding exchange — and the output per group is "
    "capped at N regardless.",
)
def sample_source_cap(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "source", "lang")
    )


@register(
    "source_lang_mix",
    """
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT source, SUM(n) AS n_total, COUNT(*) AS n_langs,
               MAX(n) AS n_top
        FROM c GROUP BY source
    )
    SELECT c.source,
           CAST(tot.n_total AS BIGINT) AS n_docs,
           CAST(tot.n_langs AS BIGINT) AS n_langs,
           round(tot.n_top * 1.0 / tot.n_total, 6) AS top_lang_share,
           round(SUM(-1.0 * (c.n * 1.0 / tot.n_total)
                     * ln(c.n * 1.0 / tot.n_total)), 6) AS lang_entropy
    FROM c JOIN tot ON c.source = tot.source
    GROUP BY c.source, tot.n_total, tot.n_langs, tot.n_top
    """,
    doc="Language-mix audit per source: doc counts, distinct languages, "
    "dominant-language share, and Shannon entropy of the language "
    "distribution — the mixture diagnostic that decides whether a "
    "source needs language-stratified sampling before joining the "
    "training mix. Aggregates on (source, lang) first, so the entropy "
    "sum runs over a tiny table (|sources| x |langs|), never raw "
    "documents; entropy summands are per-language-exact and rounded "
    "once at the end.",
)
def source_lang_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = c.groupBy("source").agg(
        F.sum("n").alias("n_total"),
        F.count("*").alias("n_langs"),
        F.max("n").alias("n_top"),
    )
    p = F.col("n") / F.col("n_total")
    return (
        c.join(tot, "source")
        .groupBy("source", "n_total", "n_langs", "n_top")
        .agg(F.round(F.sum(-p * F.log(p)), 6).alias("lang_entropy"))
        .select(
            "source",
            F.col("n_total").cast("long").alias("n_docs"),
            F.col("n_langs").cast("long").alias("n_langs"),
            F.round(F.col("n_top") / F.col("n_total"), 6).alias("top_lang_share"),
            "lang_entropy",
        )
    )


@register(
    "sample_balanced_classes",
    """
    WITH ranked AS (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
    ), floor_n AS (
        SELECT MIN(cnt) AS n_per_class
        FROM (SELECT COUNT(*) AS cnt FROM embeddings GROUP BY label)
    )
    SELECT vec_id, label, CAST(rn AS BIGINT) AS rn
    FROM ranked CROSS JOIN floor_n
    WHERE rn <= n_per_class
    """,
    doc="Class-balanced downsample: every label keeps exactly "
    "min-class-count rows, chosen by md5-hash rank within the label — "
    "deterministic (no RNG, stable under repartition and retry), the "
    "classifier-training prep that stops a 100:1 label skew from "
    "dominating the loss. The rank window is PARTITIONED by label "
    "(never global), the class-count floor rides a 1-row broadcast, "
    "and the shuffle carries (id, label) only.",
)
def sample_balanced_classes(spark, sf_dir):
    em = t(spark, sf_dir, "embeddings")
    w = W.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = em.select(
        "vec_id", "label", F.row_number().over(w).cast("bigint").alias("rn")
    )
    floor_n = (
        em.groupBy("label")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").alias("n_per_class"))
    )
    return (
        ranked.crossJoin(F.broadcast(floor_n))
        .where(F.col("rn") <= F.col("n_per_class"))
        .select("vec_id", "label", "rn")
    )


@register(
    "doc_length_percentiles_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.50) AS p50,
           quantile_cont(n_chars, 0.90) AS p90,
           quantile_cont(n_chars, 0.99) AS p99,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
    doc="Document-length percentiles per source — what sets the "
    "context-length / packing-bin / maxPartitionBytes knobs before a "
    "training run. Exact interpolated percentiles over the stored "
    "int64 length column (midpoints of integers are exactly "
    "representable, so Spark percentile == DuckDB quantile_cont "
    "bit-for-bit); text is never scanned. At 100 TB swap to "
    "approx_percentile with a documented error bound — the group "
    "sort is per-source, not global, so even the exact form "
    "parallelizes by source.",
)
def doc_length_percentiles_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # one percentile buffer queried at all three points (array form)
    ps = F.percentile(
        "n_chars", F.array(*[F.lit(p) for p in (0.50, 0.90, 0.99)])
    )
    g = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        ps.alias("_ps"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    return g.select(
        "source",
        "n_docs",
        F.element_at("_ps", 1).alias("p50"),
        F.element_at("_ps", 2).alias("p90"),
        F.element_at("_ps", 3).alias("p99"),
        "max_chars",
    )


_SHUF_SHARDS = 8
_SHUF_KEY_DUCK = smp.salted_md5_sql("doc_id", salt="ep1|")
_SHUF_SHARD_DUCK = (
    f"{smp.hash_int_sql('doc_id', salt='ep1|')} % {_SHUF_SHARDS}"
)


@register(
    "dataset_shuffle_order",
    f"""
    WITH keyed AS (
        SELECT doc_id,
               {_SHUF_KEY_DUCK} AS skey,
               CAST({_SHUF_SHARD_DUCK} AS INTEGER) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY skey, doc_id) AS BIGINT) AS pos
    FROM keyed
    """,
    doc="Deterministic epoch shuffle for training: every doc gets a "
    "(shard, pos) address from a salted content hash — the global "
    "random permutation a dataloader needs, with NO global sort and "
    "no RNG state (epoch 2 is just a different salt; retries and "
    "repartitions can't change the order). shard = hash % N gives "
    "balanced shards; pos = md5-rank WITHIN the shard, so the only "
    "shuffle is the shard repartition and each shard sorts "
    "independently — exactly the physical plan of the shard-file "
    "write: repartition(N, shard) + sortWithinPartitions(skey). At "
    "100 TB, N scales with the corpus (1 shard ~ 1 output file); the "
    "per-shard sort is an external sort within one task, bounded by "
    "the chosen shard size, never by the corpus. Hash idiom shared "
    "with hash_bucket via operators/sampling.py salted_md5_sql / "
    "hash_int_sql — one definition per dialect.",
)
def dataset_shuffle_order(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    skey = F.expr(smp.salted_md5_sql("doc_id", salt="ep1|", dialect="spark"))
    shard = (
        F.expr(smp.hash_int_sql("doc_id", salt="ep1|", dialect="spark"))
        % _SHUF_SHARDS
    ).cast("int")
    keyed = d.select("doc_id", skey.alias("skey"), shard.alias("shard"))
    w = W.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "mixture_budget_allocation",
    """
    WITH counts AS (
        SELECT lang,
               CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> ''))) AS BIGINT) AS avail
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, avail,
               CAST(FLOOR(sqrt(CAST(avail AS DOUBLE)) * 1000) AS BIGINT) AS wq
        FROM counts
    ),
    tot AS (
        SELECT CAST(SUM(avail) // 2 AS BIGINT) AS budget,
               CAST(SUM(wq) AS BIGINT) AS wsum
        FROM w
    ),
    a1 AS (
        SELECT lang, avail, wq,
               LEAST(avail, budget * wq // NULLIF(wsum, 0)) AS alloc1,
               budget * wq // NULLIF(wsum, 0) AS target
        FROM w CROSS JOIN tot
    ),
    r AS (
        SELECT CAST((SELECT budget FROM tot) - SUM(alloc1) AS BIGINT)
                   AS leftover,
               CAST(SUM(avail - alloc1) AS BIGINT) AS cap
        FROM a1
    )
    SELECT lang,
           avail AS avail_tokens,
           wq AS weight_q,
           CAST(COALESCE(target, 0) AS BIGINT) AS target_tokens,
           CAST(LEAST(avail,
                      alloc1 + leftover * (avail - alloc1)
                                 // NULLIF(cap, 0)) AS BIGINT)
               AS alloc_tokens,
           round(CAST(LEAST(avail,
                            alloc1 + leftover * (avail - alloc1)
                                       // NULLIF(cap, 0)) AS DOUBLE)
                 / NULLIF(CAST(target AS DOUBLE), 0), 6) AS fill_ratio
    FROM a1 CROSS JOIN r
    """,
    doc="Mixture BUDGET allocator — the planning step between "
    "mixture_temperature_weights and an actual sampling run: split a "
    "fixed token budget (half the corpus, so capping really occurs) "
    "across languages by temperature weight (alpha=0.5 on token "
    "mass), cap each language at its available tokens, then "
    "redistribute the capped surplus proportional to remaining "
    "capacity — ONE unrolled waterfall round, the same "
    "oracle-checkable unrolling as embedding_kmeans_iterate. "
    "Determinism: weights are quantized to integers "
    "(floor(sqrt*1000)) BEFORE any sum, so every aggregate is an "
    "order-independent bigint sum and every division integer DIV — "
    "no order-dependent double accumulation anywhere; the only "
    "doubles are sqrt (IEEE-exact) and the final single-division "
    "fill_ratio at round(6). The *1000 quantization keeps "
    "budget*wq < 2^63 up to ~7e10 corpus tokens; at larger scales "
    "drop the multiplier (coarser weights, same algebra). Lang-grain "
    "tiny tables throughout — one corpus scan, two scalar broadcasts.",
)
def mixture_budget_allocation(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    )
    counts = d.groupBy("lang").agg(
        F.sum(ntok).cast("bigint").alias("avail")
    )
    # the lang table feeds BOTH the budget scalar and the allocation;
    # materialize the (≤langs)-row aggregate once so the corpus
    # tokenize+scan never runs twice
    w = counts.select(
        "lang",
        "avail",
        F.floor(F.sqrt(F.col("avail").cast("double")) * 1000)
        .cast("bigint")
        .alias("wq"),
    ).localCheckpoint(eager=True)
    tot = w.agg(
        F.expr("CAST(SUM(avail) DIV 2 AS BIGINT)").alias("budget"),
        F.sum("wq").cast("bigint").alias("wsum"),
    )
    a1 = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "avail",
        "wq",
        "budget",
        F.expr("budget * wq DIV NULLIF(wsum, 0)").alias("target"),
        F.least(
            F.col("avail"), F.expr("budget * wq DIV NULLIF(wsum, 0)")
        ).alias("alloc1"),
    )
    r = a1.agg(
        (F.first("budget") - F.sum("alloc1")).cast("bigint").alias("leftover"),
        F.sum(F.col("avail") - F.col("alloc1")).cast("bigint").alias("cap"),
    )
    final_alloc = F.least(
        F.col("avail"),
        F.col("alloc1")
        + F.expr("leftover * (avail - alloc1) DIV NULLIF(cap, 0)"),
    )
    return a1.crossJoin(F.broadcast(r)).select(
        "lang",
        F.col("avail").alias("avail_tokens"),
        F.col("wq").alias("weight_q"),
        F.coalesce("target", F.lit(0)).cast("bigint").alias("target_tokens"),
        final_alloc.cast("bigint").alias("alloc_tokens"),
        F.round(
            final_alloc.cast("double")
            / F.nullif(F.col("target").cast("double"), F.lit(0.0)),
            6,
        ).alias("fill_ratio"),
    )


@register(
    "corpus_curriculum_phases",
    """
    WITH scored AS (
      SELECT source, doc_id,
             len(string_split_regex(text, '\\s+')) AS n_tokens
      FROM documents
    ), phased AS (
      SELECT source, doc_id, n_tokens,
             NTILE(4) OVER (PARTITION BY source
                            ORDER BY n_tokens, doc_id) AS phase
      FROM scored
    )
    SELECT source, CAST(phase AS INTEGER) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM phased GROUP BY source, phase
    """,
    doc="Length-based curriculum scheduling (Bengio et al. curriculum "
    "learning: present short/easy examples first): within each source, "
    "docs rank into 4 phases by token count (doc_id tiebreak keeps the "
    "cut deterministic), and the phase manifest reports per-phase "
    "document and token budgets — what a trainer's data loader "
    "consumes phase by phase. NTILE runs PARTITIONED by source (never "
    "global); at 100 TB swap the exact within-source rank for the "
    "two-phase bounded-window helper the zorder entry uses, or bucket "
    "by fixed token thresholds — the manifest shape is unchanged.",
)
def corpus_curriculum_phases(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        "doc_id",
        F.expr("size(split(text, '\\\\s+'))").alias("n_tokens"),
    )
    wp = W.partitionBy("source").orderBy("n_tokens", "doc_id")
    phased = scored.withColumn("phase", F.ntile(4).over(wp).cast("int"))
    return phased.groupBy("source", "phase").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


_SHUF_SHARD2_DUCK = (
    f"{smp.hash_int_sql('doc_id', salt='ep2|')} % {_SHUF_SHARDS}"
)


@register(
    "shuffle_epoch_divergence",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST({_SHUF_SHARD_DUCK} AS INTEGER) AS shard_e1,
             CAST({_SHUF_SHARD2_DUCK} AS INTEGER) AS shard_e2
      FROM documents
    )
    SELECT shard_e1,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN shard_e1 = shard_e2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_shard,
           CAST(SUM(CASE WHEN shard_e1 = shard_e2 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS same_rate
    FROM keyed GROUP BY shard_e1
    """,
    doc="Epoch-shuffle decorrelation audit: compare each doc's shard "
    "address under the epoch-1 and epoch-2 salts (the "
    "dataset_shuffle_order mechanism — same salted_md5_sql home, so "
    "this audits exactly what the dataloader runs). A healthy "
    "re-shuffle leaves ~1/shards of each shard in place; a same_rate "
    "near 1.0 means the salt isn't reaching the hash and epochs would "
    "replay the same order — the silent-failure mode of deterministic "
    "shuffles. One narrow scan, one 8-row aggregate, zero shuffles "
    "beyond the rollup.",
)
def shuffle_epoch_divergence(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s1 = F.expr(
        f"{smp.hash_int_sql('doc_id', salt='ep1|', dialect='spark')}"
        f" % {_SHUF_SHARDS}"
    ).cast("int")
    s2 = F.expr(
        f"{smp.hash_int_sql('doc_id', salt='ep2|', dialect='spark')}"
        f" % {_SHUF_SHARDS}"
    ).cast("int")
    keyed = d.select(s1.alias("shard_e1"), s2.alias("shard_e2"))
    same = F.sum(
        F.when(F.col("shard_e1") == F.col("shard_e2"), 1).otherwise(0)
    )
    return keyed.groupBy("shard_e1").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        same.cast("bigint").alias("n_same_shard"),
        (same.cast("double") / F.count("*").cast("double")).alias(
            "same_rate"
        ),
    )


@register(
    "mixture_kl_divergence",
    """
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY source
    ), g AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
               CAST(SUM(sum_chars) AS BIGINT) AS tc
        FROM s
    ), p AS (
        SELECT source, n_docs, sum_chars,
               CAST(n_docs AS DOUBLE) / td AS p_docs,
               CAST(sum_chars AS DOUBLE) / tc AS p_chars,
               CAST(round(CAST(n_docs AS DOUBLE) / td
                          * ln((CAST(n_docs AS DOUBLE) / td)
                               / (CAST(sum_chars AS DOUBLE) / tc))
                          * 1000000000000.0) AS BIGINT) AS term_pico
        FROM s CROSS JOIN g
        WHERE sum_chars > 0
    ), tot AS (
        SELECT CAST(SUM(term_pico) AS BIGINT) AS kl_pico FROM p
    )
    SELECT source, n_docs, sum_chars, p_docs, p_chars, term_pico,
           CAST(kl_pico AS DOUBLE) / 1000000000000.0 AS kl_total
    FROM p CROSS JOIN tot
    """,
    doc="KL divergence between the DOC-COUNT mixture and the "
    "CHAR-MASS mixture across sources: KL(p_docs || p_chars) = sum "
    "p_docs ln(p_docs/p_chars) — how badly sampling documents "
    "uniformly misrepresents the token mass each source contributes "
    "(a long-doc source is under-sampled by doc count; the standard "
    "fix is the temperature reweighting mixture_temperature_weights "
    "computes, and this entry is the audit that says whether it is "
    "needed). Both shares come from exact bigint counts in ONE "
    "documents pass collapsed to source grain (dictionary-bounded); "
    "each source's KL term is quantized to exact pico-units BEFORE "
    "the total sum, so the scalar is order-independent and "
    "bit-equal across engines. Sources with zero chars are excluded "
    "(KL undefined there; documented).",
)
def mixture_kl_divergence(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # source-grain stats materialized once: totals, terms, and the KL
    # fold would otherwise each rescan documents
    s = (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .localCheckpoint(eager=True)
    )
    g = s.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("sum_chars").cast("bigint").alias("tc"),
    )
    p_docs = F.col("n_docs").cast("double") / F.col("td")
    p_chars = F.col("sum_chars").cast("double") / F.col("tc")
    term = F.round(
        p_docs * F.log(p_docs / p_chars) * 1000000000000.0
    ).cast("bigint")
    p = (
        s.crossJoin(F.broadcast(g))
        .where(F.col("sum_chars") > 0)
        .select(
            "source", "n_docs", "sum_chars",
            p_docs.alias("p_docs"),
            p_chars.alias("p_chars"),
            term.alias("term_pico"),
        )
        .localCheckpoint(eager=True)
    )
    tot = p.agg(F.sum("term_pico").cast("bigint").alias("kl_pico"))
    return p.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "sum_chars", "p_docs", "p_chars", "term_pico",
        (F.col("kl_pico").cast("double") / 1000000000000.0).alias(
            "kl_total"
        ),
    )
