"""Deduplication catalog entries over `documents`.

Every operator is oracle-checked: the md5-based hash families make
MinHash/SimHash fully reproducible in DuckDB SQL (generated from the
same templates as the Spark expressions — see operators/textops.py).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import dedup as dd
from dsp_spark.operators.textops import (
    minhash_from_hashes_sql,
    shingle_hashes_sql,
    simhash16_sql,
    token_gram_hashes_sql,
)
from dsp_spark.queries._util import t
from dsp_spark.queries.text import _EVAL_SPLIT

# --- exact ---------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy keeping the smallest id; shuffles "
    "(hash,id) only, never text.",
)
def dedup_exact(spark, sf_dir):
    return dd.exact_dedup(t(spark, sf_dir, "documents"), "doc_id", "text")


# --- MinHash -------------------------------------------------------------

_MH4 = ",\n           ".join(
    f"{minhash_from_hashes_sql(s)} AS mh{s}" for s in range(4)
)


@register(
    "dedup_minhash_signature",
    f"""
    SELECT doc_id,
           {_MH4}
    FROM (SELECT doc_id, {shingle_hashes_sql(5)} AS hs FROM documents)
    """,
    doc="4-hash MinHash signatures over char-5-gram shingles (md5 hash "
    "family, engine-independent). Narrow scan-side compute, no shuffle.",
)
def dedup_minhash_signature(spark, sf_dir):
    return dd.minhash_signatures(
        t(spark, sf_dir, "documents"), "doc_id", "text", n_hashes=4, k=5
    )


_MH8 = ",\n               ".join(
    f"{minhash_from_hashes_sql(s)} AS mh{s}" for s in range(8)
)


def _bands_sql(*, bands: int, rows: int, extra_cols: str = "") -> str:
    """The ONE DuckDB template for the LSH band layout (the oracle twin
    of operators/dedup.py:_bands_of) — band b hashes signature slots
    [b*rows, (b+1)*rows). `extra_cols` carries flag columns (e.g.
    is_eval) through the melt."""
    ec = f"{extra_cols}, " if extra_cols else ""
    return "\n        UNION ALL ".join(
        "SELECT doc_id, {ec}{b} AS band_idx, "
        "md5(concat_ws('|', {cols})) AS band_hash FROM sig".format(
            ec=ec,
            b=b,
            cols=", ".join(f"mh{rows * b + r}" for r in range(rows)),
        )
        for b in range(bands)
    )


_BANDS = _bands_sql(bands=2, rows=4)


@register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH sig AS (
        SELECT doc_id,
               {_MH8}
        FROM (SELECT doc_id, {shingle_hashes_sql(5)} AS hs FROM documents)
    ), bands AS (
        {_BANDS}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    """,
    doc="MinHash-LSH candidate pairs: 8 hashes, 2 bands x 4 rows "
    "(S-curve threshold ~0.84 — high-precision near-dup); the band "
    "self-join shuffles (band_hash, doc_id) only, with both sides "
    "sharing one exchange — the 100 TB-safe candidate generator.",
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", n_hashes=8, bands=2, k=5
    )


# --- SimHash -------------------------------------------------------------


@register(
    "dedup_simhash_fingerprints",
    f"""
    SELECT doc_id, {simhash16_sql()} AS fingerprint
    FROM documents
    """,
    doc="16-bit SimHash fingerprints (±1 bit votes from md5 of tokens), "
    "computed as a native SQL fold — no Python.",
)
def dedup_simhash_fingerprints(spark, sf_dir):
    return dd.simhash_fingerprints(t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_simhash_pairs",
    f"""
    WITH fp AS (
        SELECT doc_id, source, {simhash16_sql()} AS fp FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) <= 3
    """,
    doc="SimHash near-dup pairs at Hamming distance <= 3, blocked by "
    "source (at scale: block by fingerprint prefix bands instead).",
)
def dedup_simhash_pairs(spark, sf_dir):
    return dd.simhash_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_col="source",
        max_hamming=3,
    )


# --- n-gram Jaccard ------------------------------------------------------

_INTER = "len(list_filter(a.tk, x -> list_contains(b.tk, x)))"


@register(
    "dedup_jaccard_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split_regex(text, '\\s+')) AS tk
        FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round({_INTER} / (len(a.tk) + len(b.tk) - {_INTER}), 6) AS jaccard
        FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
    """,
    doc="Exact token-set Jaccard >= 0.5 over source-blocked pairs "
    "(verification stage for LSH candidates; never run unblocked).",
)
def dedup_jaccard_pairs(spark, sf_dir):
    return dd.jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_col="source",
        threshold=0.5,
    )


@register(
    "dedup_survivors",
    """
    WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d JOIN keep USING (doc_id)
    """,
    doc="The deduplicated corpus itself: keep the smallest doc_id per "
    "content hash and semi-join the survivors back — the shuffle carries "
    "(hash, id) and then ids only; document payloads never shuffle.",
)
def dedup_survivors(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    keep = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return d.join(keep, "doc_id", "left_semi").select("doc_id", "source", "lang")


@register(
    "approx_distinct_docs_hll",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_distinct,
           ABS(approx_count_distinct(md5(text))
               - COUNT(DISTINCT md5(text)))
             <= 0.05 * COUNT(DISTINCT md5(text)) AS within_tol
    FROM documents GROUP BY source
    """,
    doc="HyperLogLog++ distinct-content estimate per source — the sketch "
    "path for 100 TB cardinality (no exact shuffle of hashes). The raw "
    "estimate differs per HLL implementation, so the compared output is "
    "tolerance-banded: each engine runs its OWN sketch and reports "
    "whether it landed within 5%% of the exact NDV (plus the exact "
    "numbers, which must match bit-for-bit). The sketch stays in the "
    "compared plan — a broken HLL fails the within_tol column.",
)
def approx_distinct_docs_hll(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    exact = F.countDistinct(F.md5("text"))
    approx = F.approx_count_distinct(F.md5("text"), rsd=0.02)
    return (
        d.groupBy("source")
        .agg(
            approx.alias("approx"),
            exact.alias("exact_distinct"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "source",
            "n_docs",
            "exact_distinct",
            (
                F.abs(F.col("approx") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_tol"),
        )
    )


# --- connected components (duplicate clusters) ---------------------------

_LSH_CTES = f"""sig AS (
        SELECT doc_id,
               {_MH8}
        FROM (SELECT doc_id, {shingle_hashes_sql(5)} AS hs FROM documents)
    ), bands AS (
        {_BANDS}
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
    )"""


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(u, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.u
    )
    SELECT u AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY u
    """,
    doc="Duplicate-group clustering: connected components over the "
    "MinHash-LSH pair graph (min-label propagation — "
    "operators/dedup.py:connected_components). Turns pairwise near-dup "
    "hits into keep/drop groups: one cluster id per component, "
    "singletons keep their own id. Oracle is a recursive-CTE transitive "
    "closure — exponential tuple growth on big components, which is "
    "exactly why the distributed path iterates joins instead.",
)
def dedup_clusters(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=2, k=5)
    return dd.connected_components(docs, pairs, "doc_id").select(
        "doc_id", F.col("component").alias("cluster_id")
    )


# --- segment-level (C4-style) dedup --------------------------------------

_SEG_WORDS = 10


@register(
    "dedup_segments_corpus",
    f"""
    WITH tk AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    seg AS (
        SELECT doc_id, CAST(i AS INTEGER) AS seg_no,
               array_to_string(w[(i*{_SEG_WORDS}+1):(i*{_SEG_WORDS}+{_SEG_WORDS})], ' ') AS segment
        FROM tk, UNNEST(range(CAST(ceil(len(w) / {_SEG_WORDS}.0) AS BIGINT))) AS r(i)
    ),
    ranked AS (
        SELECT doc_id, seg_no,
               row_number() OVER (PARTITION BY segment ORDER BY doc_id, seg_no) AS rn
        FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_segments
    FROM ranked GROUP BY doc_id
    """,
    doc="C4-style sub-document dedup at fixed 10-word segment granularity "
    "(the corpus has no newlines, so segments stand in for lines — "
    "reference has no dedup at all; this is the training-data-pipeline "
    "layer). Each distinct segment is kept only at its first occurrence "
    "(smallest doc_id, seg_no); later copies are dropped. One shuffle on "
    "the segment key; at 100 TB, partition by xxhash64(segment) so only "
    "8-byte keys shuffle, and the first-occurrence rule stays a "
    "row_number over that key.",
)
def dedup_segments_corpus(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = F.split("text", r"\s+")
    n = _SEG_WORDS
    segs = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / F.lit(float(n))).cast("int") - 1),
        lambda i: F.array_join(F.slice(w, i * n + 1, n), " "),
    )
    e = d.select("doc_id", F.posexplode(segs).alias("seg_no", "segment"))
    win = W.partitionBy("segment").orderBy("doc_id", "seg_no")
    return (
        e.withColumn("rn", F.row_number().over(win))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept_segments"),
        )
    )


@register(
    "dedup_graph_triangles",
    f"""
    WITH {_LSH_CTES},
    tri AS (
        SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.id_a = e1.id_b
        JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ), members AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM members GROUP BY doc_id
    """,
    doc="Triangle participation counts on the MinHash-LSH near-dup "
    "graph — the graph-analytics step beyond connected components: "
    "triangle-dense nodes sit in tight dup cliques (template/boilerplate "
    "families), bridge-only nodes are borderline matches. Edges are "
    "id-oriented (a<b<c) so each triangle is enumerated exactly once by "
    "two equi-joins on 8-byte ids; the LSH banding already bounds "
    "degree, which is the classic orientation trick that keeps triangle "
    "counting shuffle-light at scale.",
)
def dedup_graph_triangles(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # materialize the pair list once: three join sides would otherwise
    # each replicate the whole LSH subplan (signatures + band self-join)
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    e = pairs.select("id_a", "id_b")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.id_a") == F.col("e1.id_b"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("a"),
            F.col("e1.id_b").alias("b"),
            F.col("e2.id_b").alias("c"),
        )
    )
    # one evaluation of tri, fanned out map-side — not a 3-way union
    # that re-runs the triangle joins per corner
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("doc_id")
    )
    return members.groupBy("doc_id").agg(F.count("*").alias("n_triangles"))


@register(
    "dedup_lsh_verified",
    f"""
    WITH {_LSH_CTES},
    toks AS (
        SELECT doc_id, list_distinct(string_split_regex(text, '\\s+')) AS tk
        FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT p.id_a, p.id_b,
               round({_INTER} / (len(a.tk) + len(b.tk) - {_INTER}), 6) AS jaccard
        FROM pairs p
        JOIN toks a ON p.id_a = a.doc_id
        JOIN toks b ON p.id_b = b.doc_id
    ) WHERE jaccard >= 0.5
    """,
    doc="The full MinHash near-dup pipeline composed end to end: LSH "
    "banding proposes candidates (recall), exact token-set Jaccard on "
    "those pairs filters them (precision). Token arrays are semi-join "
    "pruned to docs appearing in some candidate, so the verify join "
    "touches the near-dup fringe only — the decision list a curation "
    "run feeds to dedup_survivors/dedup_clusters.",
)
def dedup_lsh_verified(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # materialize candidates once: the verify stage consumes them three
    # times (two id prunes + the pair join) and would otherwise replicate
    # the whole LSH subplan per consumer
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    return dd.verify_pairs(docs, pairs, "doc_id", "text", threshold=0.5)


@register(
    "dedup_incremental_new_docs",
    """
    WITH base AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
    ), new_docs AS (
      SELECT doc_id, md5(text) AS h, source FROM documents
      WHERE doc_id % 2 = 1
    )
    SELECT n.doc_id, n.source,
           b.h IS NOT NULL AS dup_of_base
    FROM new_docs n LEFT JOIN base b ON n.h = b.h
    """,
    doc="Incremental dedup of a NEW snapshot against the previous "
    "release (halves by doc_id parity standing in for release N vs "
    "N+1): only the new docs hash and probe the base's distinct-hash "
    "set — the O(new) ingestion path that avoids re-deduping the "
    "whole corpus every release. The hash set join carries (hash) "
    "only, never text; at 100 TB the base side is a bucketed hash "
    "table reused across releases.",
)
def dedup_incremental_new_docs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    base = (
        d.where(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("in_base", F.lit(1))
    )
    new_docs = d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("h"), "source"
    )
    return new_docs.join(base, "h", "left").select(
        "doc_id", "source", F.col("in_base").isNotNull().alias("dup_of_base")
    )


@register(
    "dedup_clusters_incremental",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(u, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.u
    )
    SELECT u AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY u
    """,
    doc="Incremental dedup-cluster MAINTENANCE: the previous release's "
    "cluster assignment (base = even doc_ids, standing in for the "
    "persisted state table) is updated with ONLY the new snapshot's LSH "
    "edges (odd doc_ids = the ingest batch) — the cluster-level "
    "companion to dedup_incremental_new_docs. New-edge endpoints are "
    "contracted through the persisted labels, bounded union-find rounds "
    "run over that contracted O(new-edges) graph (a new doc bridging "
    "two base clusters merges them), and the resulting label mapping "
    "rewrites only the touched clusters — the base pair graph is never "
    "recontracted (operators/dedup.py:incremental_components). The "
    "oracle is a recursive-CTE transitive closure over the FULL unioned "
    "edge set: incremental maintenance must be bit-identical to a full "
    "recompute, which holds because deterministic banding makes "
    "base-base edges identical across releases, so every unseen edge "
    "touches a new doc (candidate gen: corpus bands map-side vs a "
    "BROADCAST of the batch's bands — the corpus never shuffles; "
    "operators/dedup.py:lsh_new_edges).",
)
def dedup_clusters_incremental(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    new_ids = docs.where(F.col("doc_id") % 2 == 1).select("doc_id")
    # ONE corpus signature pass: the checkpointed full band index is
    # both the base side's pair generator (filtered to even ids — band
    # rows are per-doc, so the filter IS the base band table) and the
    # probe index lsh_new_edges joins the batch against. This is the
    # persisted-band-index shape of the real pipeline; recomputing
    # base bands separately would re-hash half the corpus.
    sig = dd.minhash_signatures(docs, "doc_id", "text", n_hashes=8, k=5)
    all_bands = dd._bands_of(
        sig, "doc_id", n_hashes=8, bands=2
    ).localCheckpoint(eager=True)
    base_pairs = dd.lsh_pairs_from_bands(
        all_bands.where(F.col("doc_id") % 2 == 0), "doc_id"
    )
    # "persisted" state, rebuilt in-plan because a catalog entry is a
    # pure function of the tables; checkpointed so the two label-join
    # consumers in the fold don't re-run the base contraction
    state = dd.connected_components(base, base_pairs, "doc_id").localCheckpoint(
        eager=True
    )
    new_edges = dd.lsh_new_edges(
        docs, new_ids, "doc_id", "text", n_hashes=8, bands=2, k=5,
        band_index=all_bands,
    )
    out = dd.incremental_components(state, new_ids, new_edges, "doc_id")
    return out.select("doc_id", F.col("component").alias("cluster_id"))


# --- containment / winnowing / rate rollup (round 4) ---------------------

_CONT_INTER = (
    "len(list_filter(a.tk, x -> list_contains(b.tk, x)))"
)


@register(
    "dedup_containment_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split_regex(text, '\\s+')) AS tk
        FROM documents
    )
    SELECT id_a, id_b, n_common, size_a, containment FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST({_CONT_INTER} AS BIGINT) AS n_common,
               CAST(len(a.tk) AS BIGINT) AS size_a,
               CAST({_CONT_INTER} AS DOUBLE) / len(a.tk) AS containment
        FROM toks a JOIN toks b
          ON a.source = b.source AND a.doc_id <> b.doc_id
    ) WHERE containment >= 0.8
    """,
    doc="Directed token-set containment |A∩B|/|A| >= 0.8 over "
    "source-blocked pairs — catches a document subsumed by a longer "
    "one, which Jaccard scores near zero (the quote/boilerplate/"
    "scrape-of-a-scrape case corpus dedup must handle separately from "
    "resemblance). Inverted-index postings join, partial-agg counts, "
    "no per-pair set allocation; the score is one division of exact "
    "int64s so both engines emit the identical double.",
)
def dedup_containment_pairs(spark, sf_dir):
    return dd.containment_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_col="source",
        threshold=0.8,
    )


_WINNOW_K = 3  # token-gram length
_WINNOW_W = 4  # winnowing window (guarantee: any match >= k+w-1 tokens shares a fingerprint)


@register(
    "dedup_winnowing_fingerprints",
    f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform(
                   range(1, greatest(len(tk) - {_WINNOW_K - 1}, 1) + 1),
                   i -> ('0x' || substr(md5(array_to_string(
                            tk[i:i+{_WINNOW_K - 1}], ' ')), 1, 7))::BIGINT
               ) AS h
        FROM (SELECT doc_id,
                     string_split_regex(text, '\\s+') AS tk
              FROM documents)
    )
    SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(h) - {_WINNOW_W - 1}, 1) + 1),
                   j -> list_min(h[j:j+{_WINNOW_W - 1}]))) AS fp
        FROM hs
    )
    """,
    doc="Winnowing document fingerprints (the MOSS scheme): md5 hash "
    "per POSITIONAL token-3-gram (no distinct — winnowing needs "
    "sequence order), then the minimum hash of every sliding "
    "4-window, deduplicated per doc. Guarantees any shared run of "
    ">= k+w-1 = 6 tokens contributes at least one common "
    "fingerprint, with ~2/(w+1) selectivity — the local-fingerprint "
    "alternative to MinHash when partial overlap (not whole-doc "
    "resemblance) is the target. Token grams keep the digest count "
    "at ~n_tokens (char grams cost one md5 per character, ~6x more "
    "for the same guarantee expressed in characters). Pure scan-side "
    "array math, zero shuffle before the final distinct.",
)
def dedup_winnowing_fingerprints(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = F.expr(
        f"transform(sequence(1, greatest(size(tk) - {_WINNOW_K - 1}, 1)), "
        f"i -> CAST(conv(substring(md5(concat_ws(' ', slice(tk, i, {_WINNOW_K}))), 1, 7), 16, 10) AS BIGINT))"
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(h) - {_WINNOW_W - 1}, 1)), "
        f"j -> array_min(slice(h, j, {_WINNOW_W}))))"
    )
    return (
        d.select("doc_id", F.expr("split(text, '\\\\s+')").alias("tk"))
        .select("doc_id", h.alias("h"))
        .select("doc_id", F.explode(fps).alias("fp"))
    )


@register(
    "dedup_rate_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
             AS dup_rate
    FROM documents GROUP BY source
    """,
    doc="Duplication-rate rollup per source — the curation dashboard "
    "number deciding which scrape gets re-crawled vs dropped. One "
    "aggregate over (source, hash); the rate is 1 - exact/total from "
    "exact int64s (single division then subtraction, identical "
    "doubles on both engines).",
)
def dedup_rate_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct"),
        (
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double") / F.count("*")
        ).alias("dup_rate"),
    )


_SIG_EQ = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
)
_VS_INTER = "len(list_filter(ta.tk, x -> list_contains(tb.tk, x)))"


@register(
    "dedup_minhash_est_vs_exact",
    f"""
    WITH {_LSH_CTES},
    toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(text, '\\s+')) AS tk
        FROM documents
    )
    SELECT p.id_a, p.id_b,
           CAST({_SIG_EQ} AS BIGINT) AS est_matches,
           CAST({_SIG_EQ} AS DOUBLE) / 8 AS est_jaccard,
           CAST({_VS_INTER} AS DOUBLE)
             / (len(ta.tk) + len(tb.tk) - {_VS_INTER}) AS jaccard
    FROM pairs p
    JOIN sig sa ON p.id_a = sa.doc_id
    JOIN sig sb ON p.id_b = sb.doc_id
    JOIN toks ta ON p.id_a = ta.doc_id
    JOIN toks tb ON p.id_b = tb.doc_id
    """,
    doc="MinHash calibration: for every LSH candidate pair, the "
    "sketch's Jaccard estimate (matching signature positions / 8) "
    "next to the exact token-set Jaccard — the audit that tunes "
    "hash/band counts before trusting the sketch at corpus scale. "
    "Signatures and token arrays join only on the candidate fringe "
    "(semi-pruned by the pair list); both ratios are divisions of "
    "exact ints (/8 is exact binary) so the doubles match "
    "bit-for-bit.",
)
def dedup_minhash_est_vs_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    from dsp_spark.operators import textops as _to

    # one signature computation, materialized: the doc-grain (id + 8
    # bigints) table feeds the band generator AND both pair-join sides;
    # without the checkpoint each branch re-hashes every shingle (the
    # entry measured 2.6 s vs 1.2 s at sf0.1)
    sig = dd.minhash_signatures(
        d, "doc_id", "text", n_hashes=8, k=5
    ).localCheckpoint()
    # shared banding scheme — the pair generator and this entry can
    # never diverge on band layout. The candidate list is consumed
    # twice (the fringe prune AND the final join spine), so it is
    # materialized once — without this the band self-join runs twice
    # (measured: entry execute 2.01 -> 0.85 s at sf0.1). It is the
    # same O(near-dup fringe) table the other verified entries
    # checkpoint.
    pairs = dd.lsh_pairs_from_signatures(
        sig, "doc_id", n_hashes=8, bands=2
    ).localCheckpoint(eager=True)
    # tokenize ONLY the candidate fringe: the exact-Jaccard side must
    # not re-tokenize the whole corpus per join branch (same pruning
    # dedup_lsh_verified uses). Materialized once because ta and tb
    # hash-partition on different keys — no exchange reuse, so a lazy
    # toks would tokenize the fringe twice (0.85 -> 0.47 s).
    fringe = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    toks = (
        d.join(fringe, "doc_id", "left_semi")
        .select("doc_id", F.array_distinct(_to.tokens("text")).alias("tk"))
        .localCheckpoint(eager=True)
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)],
    )
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("tk").alias("tka"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("tk").alias("tkb"))
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    inter = F.size(F.array_intersect("tka", "tkb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            matches.cast("bigint").alias("est_matches"),
            (matches.cast("double") / 8).alias("est_jaccard"),
            (
                inter.cast("double")
                / (F.size("tka") + F.size("tkb") - inter)
            ).alias("jaccard"),
        )
    )


@register(
    "dedup_cluster_savings",
    """
    WITH keep AS (
        SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN keep_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN keep_id IS NOT NULL THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_surviving,
           1.0 - CAST(SUM(CASE WHEN keep_id IS NOT NULL THEN n_chars
                              ELSE 0 END) AS DOUBLE) / SUM(n_chars)
             AS savings
    FROM documents d LEFT JOIN keep ON d.doc_id = keep.keep_id
    GROUP BY source
    """,
    doc="Dedup storage-savings report per source: bytes before vs "
    "after exact dedup and the fraction reclaimed — the number that "
    "justifies (or kills) a dedup stage in the ingest budget. "
    "Survivor ids come from the (hash -> min id) agg; lengths ride "
    "the stored n_chars column so text never re-scans. The savings "
    "ratio is one division of exact int64 sums.",
)
def dedup_cluster_savings(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    keep = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    j = d.join(keep, d.doc_id == keep.keep_id, "left")
    surv = F.when(F.col("keep_id").isNotNull(), 1).otherwise(0)
    surv_chars = F.when(F.col("keep_id").isNotNull(), F.col("n_chars")).otherwise(0)
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(surv).cast("bigint").alias("n_survivors"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.sum(surv_chars).cast("bigint").alias("chars_surviving"),
        (
            F.lit(1.0)
            - F.sum(surv_chars).cast("double") / F.sum("n_chars")
        ).alias("savings"),
    )


# --- cross-split near-dup decontamination (round 5) -----------------------

_XMH24 = ",\n               ".join(
    f"{minhash_from_hashes_sql(s)} AS mh{s}" for s in range(24)
)
_XBANDS = _bands_sql(bands=12, rows=2, extra_cols="is_eval")
_XGRAM = 3


@register(
    "decontam_near_dup_eval",
    f"""
    WITH sig AS (
        SELECT doc_id, is_eval,
               {_XMH24}
        FROM (SELECT doc_id,
                     CAST(substr(source, 4) AS INTEGER) >= {_EVAL_SPLIT}
                       AS is_eval,
                     {token_gram_hashes_sql(_XGRAM)} AS hs
              FROM (SELECT doc_id, source,
                           string_split_regex(text, '\\s+') AS tk0
                    FROM documents))
        WHERE len(hs) > 0
    ), bands AS (
        {_XBANDS}
    ), pairs AS (
        SELECT DISTINCT tr.doc_id AS id_a, ev.doc_id AS id_b
        FROM bands tr JOIN bands ev
          ON tr.band_idx = ev.band_idx AND tr.band_hash = ev.band_hash
        WHERE NOT tr.is_eval AND ev.is_eval
    ), toks AS (
        SELECT doc_id, {token_gram_hashes_sql(_XGRAM)} AS tk
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tk0
              FROM documents)
    )
    SELECT id_b AS eval_doc_id, id_a AS train_doc_id, jaccard FROM (
        SELECT p.id_a, p.id_b,
               round({_INTER} / (len(a.tk) + len(b.tk) - {_INTER}), 6) AS jaccard
        FROM pairs p
        JOIN toks a ON p.id_a = a.doc_id
        JOIN toks b ON p.id_b = b.doc_id
    ) WHERE jaccard >= 0.5
    """,
    doc="Near-duplicate train/eval decontamination — the fuzzy sibling "
    "of decontam_eval_overlap's exact 8-gram check (same src10+ eval "
    "split, shared _EVAL_SPLIT constant): MinHash-LSH bands of the "
    "eval docs BROADCAST against the train corpus's bands "
    "(operators/dedup.py:lsh_cross_pairs — an eval suite is ~1e4-1e6 "
    "docs vs a ~1e10-doc corpus, so the corpus side is never shuffled, "
    "never self-joined), then exact Jaccard >= 0.5 on the candidate "
    "fringe for precision. Similarity is token-3-GRAM Jaccard on BOTH "
    "stages — the sketch (token_gram=3) estimates exactly what the "
    "verifier (gram=3) thresholds, the alignment recall depends on: "
    "unigram token sets are trivially similar on template corpora "
    "(~0.5 Jaccard between RANDOM docs here), and char shingles "
    "estimate a different similarity than any token verifier, so "
    "either mismatch silently drops true pairs. Banding is "
    "recall-oriented 12 bands x 2 rows: a true 0.5-Jaccard pair is a "
    "candidate with p = 1-(1-0.25)^12 = 96.8% (the dedup family's 2x4 "
    "sees ~12%), while the 2-row bands keep shared single template "
    "grams from colliding — measured 50x fewer junk candidates than "
    "1-row bands at identical verified output on this corpus. A "
    "missed contaminated doc costs more than a wasted verify, so "
    "recall wins every tie. Output: the (eval doc, "
    "contaminating train doc, jaccard) removal list a training run "
    "applies before measuring eval loss.",
)
def decontam_near_dup_eval(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    is_eval = F.substring("source", 4, 10).cast("int") >= _EVAL_SPLIT
    cands = dd.lsh_cross_pairs(
        d.filter(~is_eval),
        d.filter(is_eval),
        "doc_id",
        "text",
        n_hashes=24,
        bands=12,
        token_gram=_XGRAM,
    ).localCheckpoint(eager=True)  # verify consumes candidates 3x
    verified = dd.verify_pairs(
        d, cands, "doc_id", "text", threshold=0.5, gram=_XGRAM
    )
    return verified.select(
        F.col("id_b").alias("eval_doc_id"),
        F.col("id_a").alias("train_doc_id"),
        "jaccard",
    )


# --- cross-doc duplicated-span coverage ------------------------------------

_SPAN_G = 8  # gram anchor length (tokens); spans >= G tokens are caught


@register(
    "dedup_dup_span_fraction",
    f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    gpos AS (
        SELECT doc_id, CAST(z.pos AS INTEGER) AS pos, z.gram AS gram
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l) - {_SPAN_G} + 2),
                            i -> {{'pos': i,
                                   'gram': array_to_string(l[i:i+{_SPAN_G}-1], ' ')}})) AS z
              FROM tk WHERE len(l) >= {_SPAN_G})
    ),
    dupg AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM gpos GROUP BY gram)
        WHERE nd >= 2
    ),
    hits AS (
        SELECT DISTINCT doc_id, pos FROM gpos
        WHERE gram IN (SELECT gram FROM dupg)
    ),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(
                        MAX(pos + {_SPAN_G} - 1) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM hits
    ),
    spans AS (
        SELECT doc_id,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island,
               pos
        FROM isl
    ),
    cov AS (
        SELECT doc_id,
               CAST(SUM(span_len) AS BIGINT) AS n_dup_tokens
        FROM (SELECT doc_id, island,
                     MAX(pos) + {_SPAN_G} - 1 - MIN(pos) + 1 AS span_len
              FROM spans GROUP BY doc_id, island)
        GROUP BY doc_id
    )
    SELECT tk.doc_id,
           CAST(len(tk.l) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
           CASE WHEN len(tk.l) = 0 THEN 0.0
                ELSE COALESCE(c.n_dup_tokens, 0) / CAST(len(tk.l) AS DOUBLE)
           END AS dup_frac
    FROM tk LEFT JOIN cov c USING (doc_id)
    """,
    doc="Cross-document duplicated-SPAN coverage, the exact-substring "
    "dedup statistic of Lee et al. (Deduplicating Training Data Makes "
    "LMs Better) at token grain: any token run of >= G(=8) tokens "
    "appearing in two or more documents is flagged through its G-gram "
    "anchors (a duplicated run of length >= G contains a duplicated "
    "G-gram, so merged anchor spans cover exactly the maximal "
    "duplicated runs), anchor positions merge into spans per doc "
    "(gaps-and-islands over a doc-partitioned window), and each doc "
    "reports its covered-token count and fraction — the quantity a "
    "curation pipeline thresholds to strip boilerplate that survives "
    "whole-doc dedup (MinHash sees low whole-doc Jaccard; containment "
    "sees only near-total subsumption; this sees a 50-token license "
    "block in 10k documents). Two gram-keyed partial-agg exchanges "
    "(counts fold map-side; the corpus-token-sized explode never "
    "carries text, only 8-token grams) + per-doc bounded windows; "
    "cross-engine exact because every number is integer arithmetic "
    "until one final division.",
)
def dedup_dup_span_fraction(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # span machinery shared with the APPLY entry (dedup_span_strip):
    # operators/dedup.py dup_span_intervals — same anchors, same
    # gaps-and-islands merge, same checkpoint placement; the coverage
    # aggregation is the SAME shared scorer the persisted span state
    # (tools/dedup_state.py `spans`) is read through, so the in-plan
    # entry and the materialized path cannot drift
    iv = dd.dup_span_intervals(
        d.select("doc_id", "text"), "doc_id", "text", gram=_SPAN_G
    )
    return dd.span_coverage(d.select("doc_id", "text"), "doc_id", "text", iv)


@register(
    "dedup_span_strip",
    f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    gpos AS (
        SELECT doc_id, CAST(z.pos AS INTEGER) AS pos, z.gram AS gram
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l) - {_SPAN_G} + 2),
                            i -> {{'pos': i,
                                   'gram': array_to_string(l[i:i+{_SPAN_G}-1], ' ')}})) AS z
              FROM tk WHERE len(l) >= {_SPAN_G})
    ),
    dupg AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM gpos GROUP BY gram)
        WHERE nd >= 2
    ),
    hits AS (
        SELECT DISTINCT doc_id, pos FROM gpos
        WHERE gram IN (SELECT gram FROM dupg)
    ),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(
                        MAX(pos + {_SPAN_G} - 1) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM hits
    ),
    spans AS (
        SELECT doc_id,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island,
               pos
        FROM isl
    ),
    iv AS (
        SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_G} - 1 AS e
        FROM spans GROUP BY doc_id, island
    ),
    covpos AS (
        SELECT doc_id, CAST(unnest(range(s, e + 1)) AS INTEGER) AS pos FROM iv
    ),
    allpos AS (
        SELECT doc_id, pos, l[pos] AS tok FROM (
            SELECT doc_id, l,
                   CAST(unnest(range(1, len(l) + 1)) AS INTEGER) AS pos
            FROM tk)
    ),
    kept AS (
        SELECT a.doc_id, a.pos, a.tok
        FROM allpos a LEFT JOIN covpos c
          ON a.doc_id = c.doc_id AND a.pos = c.pos
        WHERE c.pos IS NULL
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS stripped_md5
        FROM kept GROUP BY doc_id
    )
    SELECT tk.doc_id,
           CAST(len(tk.l) AS BIGINT) AS n_tokens,
           CAST(len(tk.l) - COALESCE(a.n_kept, 0) AS BIGINT) AS tokens_removed,
           COALESCE(a.stripped_md5, md5('')) AS stripped_md5
    FROM tk LEFT JOIN agg a USING (doc_id)
    """,
    doc="APPLY the Lee-et-al exact-substring span removal that "
    "dedup_dup_span_fraction only measures (same G=8 anchors, same "
    "gaps-and-islands merge — both builders call "
    "operators/dedup.py dup_span_intervals, so the measure and the "
    "transform CANNOT disagree on what a duplicated span is): every "
    "cross-document duplicated token run of >= 8 tokens is removed "
    "from every document it occurs in — boilerplate semantics, what a "
    "curation pipeline runs on license blocks / navigation chrome "
    "that survive whole-doc dedup — and each doc emits its pre-strip "
    "token count, tokens removed, and the md5 of the exact stripped "
    "token stream (single-space joined; token-grain transform). The "
    "md5 is CONTENT verification the way doc_fim_split verifies "
    "segment bytes: the oracle rebuilds the kept token sequence "
    "per position and hashes it, so a one-token drift anywhere in "
    "any document fails the driver hash. The strip itself is one JVM "
    "higher-order-function pass (exists() over the doc's OWN interval "
    "list per token — intervals per doc are bounded by doc length, no "
    "Python, no shuffle beyond the interval build + one id-keyed join "
    "back); wired into tools/curate.py as the optional --strip-spans "
    "stage.",
)
def dedup_span_strip(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    out = dd.strip_dup_spans(
        d.select("doc_id", "text"), "doc_id", "text", gram=_SPAN_G
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("tokens_removed").cast("bigint").alias("tokens_removed"),
        F.md5(F.col("text")).alias("stripped_md5"),
    )


@register(
    "dup_span_rate_by_source",
    f"""
    WITH tk AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    gpos AS (
        SELECT doc_id, CAST(z.pos AS INTEGER) AS pos, z.gram AS gram
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l) - {_SPAN_G} + 2),
                            i -> {{'pos': i,
                                   'gram': array_to_string(l[i:i+{_SPAN_G}-1], ' ')}})) AS z
              FROM tk WHERE len(l) >= {_SPAN_G})
    ),
    dupg AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM gpos GROUP BY gram)
        WHERE nd >= 2
    ),
    hits AS (
        SELECT DISTINCT doc_id, pos FROM gpos
        WHERE gram IN (SELECT gram FROM dupg)
    ),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(
                        MAX(pos + {_SPAN_G} - 1) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM hits
    ),
    spans AS (
        SELECT doc_id,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island,
               pos
        FROM isl
    ),
    cov AS (
        SELECT doc_id,
               CAST(SUM(span_len) AS BIGINT) AS n_dup_tokens
        FROM (SELECT doc_id, island,
                     MAX(pos) + {_SPAN_G} - 1 - MIN(pos) + 1 AS span_len
              FROM spans GROUP BY doc_id, island)
        GROUP BY doc_id
    )
    SELECT tk.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN COALESCE(c.n_dup_tokens, 0) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dup_spans,
           CAST(SUM(len(tk.l)) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(c.n_dup_tokens, 0)) AS BIGINT) AS n_dup_tokens,
           round(SUM(COALESCE(c.n_dup_tokens, 0)) /
                 CAST(NULLIF(SUM(len(tk.l)), 0) AS DOUBLE), 6) AS dup_rate
    FROM tk LEFT JOIN cov c USING (doc_id)
    GROUP BY tk.source
    """,
    doc="Duplicated-span coverage rolled up to SOURCE grain — the "
    "dashboard that decides whether a source needs `--strip-spans` "
    "(tools/curate.py) before training: per source, how many docs "
    "carry any cross-document duplicated >=8-token run, and what "
    "fraction of the source's tokens sit inside such runs (a "
    "boilerplate-heavy crawl reads 30%+ here while whole-doc dedup "
    "sees nothing). Same dup_span_intervals core as the per-doc audit "
    "and the strip transform (all three CANNOT disagree on what a "
    "span is); one extra source-grain partial agg on the doc-grain "
    "coverage — the corpus shuffles exactly as often as the per-doc "
    "measure. The rate is one double division of exact bigint sums "
    "at round(6).",
)
def dup_span_rate_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # same shared rollup scorer the persisted span state is read
    # through (operators/dedup.py span_source_rollup) — one
    # implementation for the in-plan entry and the materialized path
    iv = dd.dup_span_intervals(
        d.select("doc_id", "text"), "doc_id", "text", gram=_SPAN_G
    )
    return dd.span_source_rollup(d, "doc_id", "text", "source", iv)


@register(
    "dup_span_top_boilerplate",
    f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    gpos AS (
        SELECT doc_id, CAST(z.pos AS INTEGER) AS pos, z.gram AS gram
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(l) - {_SPAN_G} + 2),
                            i -> {{'pos': i,
                                   'gram': array_to_string(l[i:i+{_SPAN_G}-1], ' ')}})) AS z
              FROM tk WHERE len(l) >= {_SPAN_G})
    ),
    dupg AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM gpos GROUP BY gram)
        WHERE nd >= 2
    ),
    hits AS (
        SELECT DISTINCT doc_id, pos FROM gpos
        WHERE gram IN (SELECT gram FROM dupg)
    ),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(
                        MAX(pos + {_SPAN_G} - 1) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM hits
    ),
    spans AS (
        SELECT doc_id,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island,
               pos
        FROM isl
    ),
    iv AS (
        SELECT doc_id, MIN(pos) AS s,
               CAST(MAX(pos) + {_SPAN_G} - 1 AS INTEGER) AS e
        FROM spans GROUP BY doc_id, island
    ),
    sp AS (
        SELECT array_to_string(tk.l[iv.s:iv.e], ' ') AS span_text,
               iv.e - iv.s + 1 AS span_tokens
        FROM iv JOIN tk USING (doc_id)
    ),
    agg AS (
        SELECT span_text,
               CAST(MAX(span_tokens) AS BIGINT) AS span_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM sp GROUP BY span_text
    )
    SELECT md5(span_text) AS span_md5,
           substr(span_text, 1, 60) AS preview,
           span_tokens, n_occurrences
    FROM agg WHERE n_occurrences >= 2
    ORDER BY n_occurrences DESC, md5(span_text)
    LIMIT 20
    """,
    doc="The boilerplate leaderboard: WHAT the Lee-et-al span strip "
    "would remove — the top-20 exact duplicated token runs by how "
    "many documents carry them verbatim (license blocks, navigation "
    "chrome, scraper banners), each with its token length, occurrence "
    "count, md5 (content verification — a one-token drift in the "
    "island merge anywhere fails the driver hash) and a 60-char "
    "preview for the curation engineer deciding whether to strip or "
    "blocklist. Completes the span family: measure "
    "(dedup_dup_span_fraction), rollup (dup_span_rate_by_source), "
    "transform (dedup_span_strip), and now inspection — all four on "
    "the SAME dup_span_intervals core, so the leaderboard can never "
    "name a span the strip wouldn't cut. Only maximal merged islands "
    "with an IDENTICAL token stream aggregate together (an occurrence "
    "fused into a longer island groups separately — exact-substring "
    "inspection semantics); n_occurrences >= 2 keeps boilerplate, "
    "not doc-unique fusions. Scale: span text shuffles once keyed by "
    "itself (span-dictionary grain, bounded by corpus span count), "
    "top-20 compiles to TakeOrderedAndProject (per-partition heaps, "
    "no global sort); deterministic total order via (count desc, md5).",
)
def dup_span_top_boilerplate(spark, sf_dir):
    return top_boilerplate(t(spark, sf_dir, "documents"))


def top_boilerplate(d, *, gram: int = _SPAN_G, k: int = 20):
    """The boilerplate-leaderboard core over a (doc_id, text) frame —
    extracted so tests can drive it on repartitioned input (the top-k
    LIMIT is only well-defined because the (count desc, md5) order is
    total; tests/test_span_state_tool.py pins partition-invariance)."""
    iv = dd.dup_span_intervals(
        d.select("doc_id", "text"), "doc_id", "text", gram=gram
    )
    tk = d.select(
        "doc_id",
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "").alias("l"),
    )
    sp = iv.join(tk, "doc_id").select(
        F.expr("array_join(slice(l, s, e - s + 1), ' ')").alias("span_text"),
        (F.col("e") - F.col("s") + 1).alias("span_tokens"),
    )
    agg = (
        sp.groupBy("span_text")
        .agg(
            F.max("span_tokens").cast("bigint").alias("span_tokens"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= 2)
    )
    return (
        agg.select(
            F.md5("span_text").alias("span_md5"),
            F.substring("span_text", 1, 60).alias("preview"),
            "span_tokens",
            "n_occurrences",
        )
        .orderBy(
            F.col("n_occurrences").desc(), F.col("span_md5").asc()
        )
        .limit(k)
    )


_BIT_EQ = " + ".join(
    f"(CASE WHEN sa.mh{i} % 2 = sb.mh{i} % 2 THEN 1 ELSE 0 END)"
    for i in range(8)
)


@register(
    "dedup_bbit_minhash_est",
    f"""
    WITH {_LSH_CTES}
    SELECT p.id_a, p.id_b,
           CAST({_SIG_EQ} AS BIGINT) AS full_matches,
           CAST({_SIG_EQ} AS DOUBLE) / 8 AS est_jaccard_full,
           CAST({_BIT_EQ} AS BIGINT) AS bit_matches,
           GREATEST(0.0, 2 * (CAST({_BIT_EQ} AS DOUBLE) / 8) - 1)
               AS est_jaccard_b1
    FROM pairs p
    JOIN sig sa ON p.id_a = sa.doc_id
    JOIN sig sb ON p.id_b = sb.doc_id
    """,
    doc="b-bit MinHash (Li & Koenig, 2010) at b=1: store only the "
    "LOWEST bit of each minhash — 64x less signature storage than the "
    "64-bit slots — and recover Jaccard with the unbiased estimator "
    "R = 2*P - 1 (for highly similar pairs; P = matching-bit fraction, "
    "clamped at 0): a random unrelated pair matches each bit with "
    "probability 1/2, so P concentrates at (1+R)/2. Emitted per LSH "
    "candidate pair NEXT TO the full-width estimate from the same 8 "
    "hashes — the storage-vs-accuracy audit a deployment runs before "
    "switching its billion-doc signature store to packed bits (at 100 "
    "TB the signature table is itself TB-scale at 64 bits/slot; 1-bit "
    "slots make it GB-scale and the bitwise compare XOR+popcount). "
    "Same banding/pair generator as the dedup family "
    "(lsh_pairs_from_signatures — layouts cannot diverge); signatures "
    "computed once and joined on the candidate fringe only. All "
    "doubles are exact-int divisions by 8 and exact *2-1 arithmetic — "
    "bit-for-bit cross-engine.",
)
def dedup_bbit_minhash_est(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sig = dd.minhash_signatures(
        d, "doc_id", "text", n_hashes=8, k=5
    ).localCheckpoint()
    pairs = dd.lsh_pairs_from_signatures(sig, "doc_id", n_hashes=8, bands=2)
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)],
    )
    full = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    bits = sum(
        (F.col(f"a{i}") % 2 == F.col(f"b{i}") % 2).cast("int")
        for i in range(8)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            full.cast("bigint").alias("full_matches"),
            (full.cast("double") / 8).alias("est_jaccard_full"),
            bits.cast("bigint").alias("bit_matches"),
            F.greatest(
                F.lit(0.0), 2 * (bits.cast("double") / 8) - 1
            ).alias("est_jaccard_b1"),
        )
    )


@register(
    "doc_self_repeat_strip",
    f"""
    WITH tk AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    seg AS (
        SELECT doc_id, CAST(i AS INTEGER) AS seg_no,
               array_to_string(w[(i*{_SEG_WORDS}+1):(i*{_SEG_WORDS}+{_SEG_WORDS})], ' ') AS segment
        FROM tk, UNNEST(range(CAST(ceil(len(w) / {_SEG_WORDS}.0) AS BIGINT))) AS r(i)
    ),
    ranked AS (
        SELECT doc_id, seg_no, segment,
               row_number() OVER (PARTITION BY doc_id, segment
                                  ORDER BY seg_no) AS rn
        FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_segments,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN segment END,
                                   ' ' ORDER BY seg_no), ''))
               AS stripped_md5
    FROM ranked GROUP BY doc_id
    """,
    doc="WITHIN-document repetition strip at the fixed 10-word segment "
    "grain of dedup_segments_corpus — the Gopher/C4 self-repetition "
    "step that text_repetition_stats only measures: a doc that "
    "repeats its own paragraph (retry artifacts, templated sections, "
    "scraper loops) keeps the FIRST occurrence of each distinct "
    "segment and drops the rest; cross-document occurrences are the "
    "span family's job, this is the per-doc complement (the two "
    "compose: self-strip first shrinks what the corpus-wide gram "
    "explode must hash). Emits per doc the segment count, surviving "
    "count, and the md5 of the kept segments in original order — the "
    "same content-verification contract as dedup_span_strip, so a "
    "one-segment drift anywhere fails the driver hash. Plan: one "
    "scan-side segment explode (never shuffles text beyond the "
    "doc-keyed agg), one (doc, segment)-partitioned window, one "
    "doc-grain agg.",
)
def doc_self_repeat_strip(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # shared core with the curate --strip-self-repeats stage
    # (operators/dedup.py strip_self_repeats — audit and transform
    # cannot disagree on segment layout or keep rule)
    out = dd.strip_self_repeats(
        d.select("doc_id", "text"), "doc_id", "text", seg_words=_SEG_WORDS
    )
    return out.select(
        "doc_id",
        F.col("n_segments").cast("bigint").alias("n_segments"),
        (F.col("n_segments") - F.col("segments_removed"))
        .cast("bigint")
        .alias("n_kept_segments"),
        F.md5(F.col("text")).alias("stripped_md5"),
    )


@register(
    "corpus_novelty_decay",
    """
    WITH dg AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, greatest(len(tk) - 2, 1) + 1),
               i -> md5(array_to_string(tk[i:i+2], ' ')))) AS gram
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tk
            FROM documents)
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id
    ), novel AS (
      SELECT first_doc AS doc_id, COUNT(*) AS n_novel
      FROM (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram)
      GROUP BY first_doc
    ), mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents)
    SELECT (p.doc_id * 10) // mx.m AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_grams) AS BIGINT) AS gram_occurrences,
           CAST(SUM(COALESCE(n.n_novel, 0)) AS BIGINT) AS novel_grams,
           CAST(SUM(COALESCE(n.n_novel, 0)) AS DOUBLE)
             / CAST(SUM(p.n_grams) AS BIGINT) AS novelty_rate
    FROM per_doc p LEFT JOIN novel n ON p.doc_id = n.doc_id, mx
    GROUP BY 1
    """,
    doc="Corpus novelty-decay curve: split the corpus into 10 "
    "arrival-order buckets (doc_id deciles via exact integer division "
    "against max+1 — no global NTILE) and measure, per bucket, what "
    "fraction of its distinct token-3-grams had never been seen in "
    "any earlier document. The declining curve is the scaling-laws "
    "signal for when additional scrape stops adding information and "
    "dedup/curation should tighten. Gram first-occurrence is a "
    "gram-grain MIN aggregate (map-side combining); novel counts "
    "re-aggregate at doc grain and join doc-grain totals, so nothing "
    "is quadratic and no window is global. At 100 TB the gram table "
    "is the big relation; it partial-aggregates before its one "
    "shuffle, and the bucket rollup is 10 rows.",
)
def corpus_novelty_decay(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr("split(text, '\\\\s+')").alias("tk"))
    grams = F.expr(
        "array_distinct(transform(sequence(1, greatest(size(tk) - 2, 1)), "
        "i -> md5(concat_ws(' ', slice(tk, i, 3)))))"
    )
    # per-doc distinct-gram COUNT is an in-row property — no explode,
    # no doc_id shuffle, and no md5 (distinctness of the raw gram
    # strings equals distinctness of their md5s, the oracle's grouping
    # key, up to md5 collisions). The old shape consumed the exploded
    # md5 gram subtree twice: once here and once for first-occurrence.
    # shuffle_hash on the doc-grain join, NOT broadcast: with a
    # broadcast the in-row gram count fuses into the post-broadcast
    # probe stage and runs strictly AFTER the md5 pass; as independent
    # shuffle leaves the two gram passes schedule concurrently
    # (measured: broadcast variant 2.3 s, this 1.98 vs old 2.52 —
    # paired same-session reps).
    gram_strs = F.expr(
        "array_distinct(transform(sequence(1, greatest(size(tk) - 2, 1)), "
        "i -> concat_ws(' ', slice(tk, i, 3))))"
    )
    per_doc = toks.select(
        "doc_id", F.size(gram_strs).alias("n_grams")
    ).hint("shuffle_hash")
    novel = (
        toks.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").alias("n_novel"))
        .hint("shuffle_hash")
    )
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    joined = (
        per_doc.join(novel, "doc_id", "left")
        .join(F.broadcast(mx))
        .withColumn("n_novel", F.coalesce("n_novel", F.lit(0)))
    )
    return joined.groupBy(
        F.expr("(doc_id * 10) DIV m").alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("gram_occurrences"),
        F.sum("n_novel").cast("bigint").alias("novel_grams"),
        (
            F.sum("n_novel").cast("double")
            / F.sum("n_grams").cast("bigint")
        ).alias("novelty_rate"),
    )


@register(
    "dedup_cross_source_matrix",
    """
    WITH fs AS (
      SELECT DISTINCT md5(text) AS h, source FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
    FROM fs a JOIN fs b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc="Cross-source duplicate-flow matrix: for every unordered "
    "source pair, how many exact content fingerprints they share — "
    "the 'who scraped whom' audit that decides which source to keep "
    "when dedup_survivors picks winners. The self-join runs on the "
    "DISTINCT (hash, source) relation (bounded by duplicate mass, "
    "not corpus size) and both sides hash-partition on the "
    "fingerprint, so the join is co-located; source < source keeps "
    "each pair once. Output is at most |sources|^2/2 rows.",
)
def dedup_cross_source_matrix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fs = d.select(F.md5("text").alias("h"), "source").distinct()
    a = fs.alias("a")
    b = fs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("shared_fingerprints"))
    )
