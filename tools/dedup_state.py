#!/usr/bin/env python
"""Persisted dedup-cluster state maintenance (the production workflow
behind the dedup_clusters_incremental catalog entry).

    python tools/dedup_state.py init    --docs PARQUET --state DIR
    python tools/dedup_state.py ingest  --docs PARQUET --state DIR
    python tools/dedup_state.py verify  --state DIR [--full PARQUET]
    python tools/dedup_state.py stats   --state DIR
    python tools/dedup_state.py compact --state DIR
    python tools/dedup_state.py spans   --docs PARQUET --state DIR [--span-gram 8]

``init`` builds the state directory from a first corpus snapshot:

* ``bands/ingest=N/``  — the persisted LSH band index (doc_id,
                  band_idx, band_hash), APPEND-ONLY: signatures are
                  per-doc and immutable, so each generation directory
                  is written once, ever, and never rewritten;
* ``edges/ingest=N/``  — the persisted near-dup adjacency (id_a <
                  id_b candidate pairs), APPEND-ONLY for the same
                  reason: base-base edges never change, so generation
                  N holds exactly the delta edges batch N contributed.
                  Graph consumers (pagerank / Adamic-Adar / clustering
                  coefficient) read this instead of re-banding the
                  corpus — the build-once pattern ann_index_persisted
                  uses for IVF cells;
* ``clusters/bucket=K/`` — the (doc_id, cluster_id) assignment
                  (cluster_id = min doc_id in the component), HASH-
                  SHARDED into ``n_buckets`` partitions by
                  ``pmod(xxhash64(doc_id), n_buckets)`` so an ingest
                  rewrites ONLY the buckets containing touched docs
                  (dynamic partition overwrite) — state I/O is
                  O(batch-adjacent), matching the O(batch) compute,
                  instead of a full ids-table rewrite per ingest;
* ``_meta.json``— banding parameters (n_hashes/bands/k) and the
                  bucket count, pinned so an ingest can never silently
                  band (or shard) differently than the index it probes
                  (a mismatch breaks the base-base-edges-never-change
                  soundness argument / would strand assignment rows in
                  wrong buckets).

``ingest`` folds a NEW batch of docs in with work proportional to the
batch (operators/dedup.py:lsh_new_edges + incremental_components):
the batch's bands broadcast against the persisted index (the corpus
side never shuffles), the resulting edges are contracted through the
persisted labels, bounded union-find runs on that contracted delta
only, and the state writes are all O(batch): touched cluster buckets
via dynamic partition overwrite, band/edge deltas as new generation
directories (full write into a tmp dir, then one atomic rename).
Batch doc_ids must be disjoint from the state (enforced). A crash
between the three writes leaves a torn state that ``verify`` detects
(clusters/bands/edges disagree on the doc set).

``spans`` materializes the cross-document duplicated-span interval
table (``spans/`` — one row per (doc_id, s, e) maximal duplicated
token run, operators/dedup.py:dup_span_intervals) so the three span
consumers — the per-doc coverage audit (dedup_dup_span_fraction), the
strip transform (dedup_span_strip) and the per-source rollup
(dup_span_rate_by_source) — read ONE materialization instead of each
re-deriving gram anchors, the same build-once pattern graph consumers
get from ``edges/``. Parity with the in-plan catalog entries is
pinned in tests/test_span_state_tool.py. Unlike bands/edges, span
intervals are NOT incremental: a new document can create duplicated
grams inside OLD documents, so the table is an O(corpus) rebuild
(atomic swap) — re-run after each ingest whose consumers need fresh
span state. The gram size is pinned in _meta.json.

``verify`` recomputes connected components from scratch over the
persisted band index's full self-join pair set and diffs against the
maintained assignment — the offline audit that the incremental path
never drifted. It also diffs the append-only edge store against the
same recomputed pair set. With ``--full`` it additionally checks the
assignment covers exactly the docs in a corpus parquet.

Reference parity note: the reference engine (ystre/dsp) has no dedup
surface at all — this is the LLM-training-pipeline layer the brief
adds; the algorithmic contract is the catalog entry's oracle
(recursive-CTE transitive closure == incremental assignment).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DEFAULTS = {"n_hashes": 8, "bands": 2, "k": 5, "n_buckets": 64}

# On-disk layout version, pinned in _meta.json by init. 2 = hash-
# sharded clusters/bucket=K + append-only bands|edges/ingest=N with
# dot-prefixed tmp dirs. A state dir written by an older tool version
# (flat clusters/, no n_buckets) must fail with an explicit message,
# not a KeyError or a parquet partition-discovery error mid-command
# (advisor r10).
LAYOUT_VERSION = 2

_BAND_COLS = ("doc_id", "band_idx", "band_hash")
_EDGE_COLS = ("id_a", "id_b")


def _write_meta(state_dir: str, meta: dict) -> None:
    """Atomic _meta.json replace (tmp file + rename): a crash mid-dump
    must never leave a truncated meta that bricks every later command."""
    path = os.path.join(state_dir, "_meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, path)


def _load_meta(state_dir: str) -> dict:
    """Read _meta.json and hard-fail on a pre-versioned/older layout."""
    path = os.path.join(state_dir, "_meta.json")
    try:
        with open(path) as f:
            meta = json.load(f)
    except OSError:
        raise SystemExit(
            f"no _meta.json in {state_dir} — not a dedup_state directory "
            "(run init first)"
        )
    except ValueError:
        raise SystemExit(
            f"corrupt _meta.json in {state_dir} (torn write from a crashed "
            "pre-r11 tool?) — restore it or re-run init from the source "
            "corpus"
        )
    if meta.get("layout") != LAYOUT_VERSION:
        raise SystemExit(
            f"state layout too old (layout={meta.get('layout')!r}, tool "
            f"expects {LAYOUT_VERSION}) — this state predates hash-sharded "
            "clusters; re-run init from the source corpus"
        )
    return meta


def _clean_stray_tmps(state_dir: str) -> None:
    """Recover from a crashed earlier command's leftovers.

    Inside the generation stores: remove half-written tmp dirs (current
    dot-prefixed names are invisible to Spark's partition discovery,
    legacy `*._tmp` names were VISIBLE) — they must not survive into
    the next command's reads or generation numbering.

    At the state root: finish or roll back an interrupted _write_swap /
    compact. The swap sequence is write(X._tmp) -> rename(X, X._old) ->
    rename(X._tmp, X) -> rm(X._old); a crash can leave (a) X and
    X._tmp (pre-swap: drop the tmp), (b) X._old and X._tmp but no X
    (mid-swap: ROLL BACK to the old complete copy — the tmp is complete
    too, but re-running the command is cheaper than guessing), or (c)
    X and X._old (post-swap: drop the old copy)."""
    for store in ("bands", "edges", "spans"):
        root = os.path.join(state_dir, store)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith(".tmp-") or d.endswith("._tmp"):
                shutil.rmtree(os.path.join(root, d))
    for name in ("clusters", "bands", "edges", "spans"):
        path = os.path.join(state_dir, name)
        old, tmp = path + "._old", path + "._tmp"
        if os.path.isdir(old):
            if os.path.isdir(path):
                shutil.rmtree(old)  # swap completed, cleanup did not
            else:
                os.rename(old, path)  # mid-swap crash: roll back
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)


def _bucket_col(n_buckets: int):
    """Deterministic shard of a doc_id: stable across runs/sessions
    (xxhash64 with the default seed), pinned in _meta.json."""
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")


def _bands_df(spark, docs, meta):
    from dsp_spark.operators.dedup import _bands_of, minhash_signatures

    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=meta["n_hashes"], k=meta["k"]
    )
    return _bands_of(
        sig, "doc_id", n_hashes=meta["n_hashes"], bands=meta["bands"]
    )


def _pairs_from_bands(bands_df):
    """Full band self-join (id_a < id_b) — used by init and verify;
    ingest never runs this on the corpus side."""
    a, b = bands_df.alias("a"), bands_df.alias("b")
    a = a.hint("shuffle_hash")
    b = b.hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def _write_swap(df, path: str, partition_by: str | None = None) -> None:
    """Write parquet to ``path`` atomically-enough: full write into a
    sibling tmp dir, then a directory swap (old moved aside, tmp
    renamed in, old removed) — a crash leaves either the old or the
    new complete directory, never a half-written one in place."""
    tmp, old = path + "._tmp", path + "._old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _append_generation(df, root: str, gen: int) -> None:
    """Append ``df`` as the ``ingest=gen`` partition directory of an
    append-only store: complete write into a tmp dir, one atomic
    rename into place. Existing generations are never touched."""
    os.makedirs(root, exist_ok=True)
    dest = os.path.join(root, f"ingest={gen}")
    if os.path.exists(dest):
        raise SystemExit(f"generation {dest} already exists — refusing to overwrite")
    # dot-prefixed tmp: Spark's partition discovery skips names starting
    # with '.' or '_', so a crash between write and rename can never
    # leak partial/duplicate rows into read_bands/read_edges (advisor
    # r10 — the old `ingest=N._tmp` name WAS discovered)
    tmp = os.path.join(root, f".tmp-ingest={gen}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, dest)


def _next_generation(root: str) -> int:
    gens = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("ingest=") and not d.endswith("._tmp")
    ]
    return max(gens) + 1 if gens else 0


def read_clusters(spark, state_dir: str):
    """The maintained (doc_id, cluster_id) assignment, shard column
    dropped."""
    df = spark.read.parquet(os.path.join(state_dir, "clusters"))
    return df.select("doc_id", "cluster_id")


def read_bands(spark, state_dir: str):
    """The full persisted band index across all generations."""
    df = spark.read.parquet(os.path.join(state_dir, "bands"))
    return df.select(*_BAND_COLS)


def read_edges(spark, state_dir: str):
    """The persisted near-dup adjacency (id_a < id_b) across all
    generations — the pair list graph consumers (pagerank, Adamic-
    Adar, clustering coefficient) share with the dedup fold, read
    without re-banding the corpus."""
    df = spark.read.parquet(os.path.join(state_dir, "edges"))
    return df.select(*_EDGE_COLS)


def read_spans(
    spark,
    state_dir: str,
    *,
    expect_gram: int | None = None,
    expect_corpus=None,
):
    """The materialized duplicated-span interval table (doc_id, s, e),
    1-based inclusive token positions — written by the ``spans``
    subcommand.

    Consumer-side validation (ADVICE r11: the bare read served a table
    whose gram and corpus snapshot the caller had to remember to
    ``verify``):

    * ``expect_gram`` — fail unless the table was materialized with
      exactly this token-run length (an 8-gram consumer silently
      reading a 4-gram table over-strips);
    * ``expect_corpus`` — a DataFrame with a ``doc_id`` column: fail
      unless the table's recorded snapshot fingerprint matches this
      doc set (after an ingest, spans/ still reflects the PRE-ingest
      corpus until ``spans`` is re-run — new docs can create
      duplicated runs inside old ones, so a stale table under-reports).
      Costs one count+sum aggregate over the ids; skip it (None) when
      the caller runs ``verify`` out-of-band."""
    spans_dir = os.path.join(state_dir, "spans")
    meta = _load_meta(state_dir)
    if "span_gram" not in meta or not os.path.isdir(spans_dir):
        raise SystemExit(
            f"no spans table in {state_dir} — run the `spans` subcommand "
            "first"
        )
    if expect_gram is not None and int(meta["span_gram"]) != int(expect_gram):
        raise SystemExit(
            f"span state was materialized with gram={meta['span_gram']} "
            f"but the consumer expects gram={expect_gram} — re-run "
            f"`spans --span-gram {expect_gram}`"
        )
    if expect_corpus is not None:
        current = _corpus_fingerprint(expect_corpus.select("doc_id"))
        if current != meta.get("span_corpus"):
            raise SystemExit(
                f"span state is STALE: built from snapshot "
                f"{meta.get('span_corpus')} but the consumer's corpus is "
                f"{current} — re-run `spans` against the current corpus"
            )
    df = spark.read.parquet(spans_dir)
    return df.select("doc_id", "s", "e")


def _corpus_fingerprint(ids_df) -> dict:
    """Order-independent fingerprint of a doc_id set: row count + the
    exact DECIMAL sum of per-id xxhash64 (a bigint SUM could wrap).
    Written by `spans` as the snapshot identity; `verify` recomputes it
    from the band index's doc set, so a spans table built from a
    different corpus snapshot than the state (e.g. before the last
    ingest) is detected as stale instead of silently served."""
    row = ids_df.select(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(F.col("doc_id")).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return {"n_docs": int(row.n), "id_hash": str(row.h)}


def cmd_spans(spark, docs_path: str, state_dir: str, gram: int) -> None:
    from dsp_spark.operators.dedup import dup_span_intervals

    meta = _load_meta(state_dir)
    _clean_stray_tmps(state_dir)
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    iv = dup_span_intervals(docs, "doc_id", "text", gram=gram)
    _write_swap(iv, os.path.join(state_dir, "spans"))
    meta["span_gram"] = int(gram)
    meta["span_corpus"] = _corpus_fingerprint(docs.select("doc_id"))
    _write_meta(state_dir, meta)
    n = read_spans(spark, state_dir).count()
    print(f"spans: {n} duplicated-span intervals (gram={gram}) -> {state_dir}")


def cmd_init(spark, docs_path: str, state_dir: str, meta: dict) -> None:
    from dsp_spark.operators.dedup import connected_components

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    os.makedirs(state_dir, exist_ok=True)
    _clean_stray_tmps(state_dir)
    meta = dict(meta, layout=LAYOUT_VERSION)
    bands = _bands_df(spark, docs, meta).localCheckpoint(eager=True)
    edges = _pairs_from_bands(bands).localCheckpoint(eager=True)
    clusters = connected_components(docs, edges, "doc_id").select(
        "doc_id", F.col("component").alias("cluster_id")
    )
    _write_swap(
        clusters.withColumn("bucket", _bucket_col(meta["n_buckets"])),
        os.path.join(state_dir, "clusters"),
        partition_by="bucket",
    )
    _append_generation(bands, os.path.join(state_dir, "bands"), 0)
    _append_generation(edges, os.path.join(state_dir, "edges"), 0)
    _write_meta(state_dir, meta)
    n = read_clusters(spark, state_dir).count()
    print(f"init: {n} docs clustered into state at {state_dir}")


def cmd_ingest(spark, docs_path: str, state_dir: str) -> None:
    from dsp_spark.operators.dedup import incremental_components

    meta = _load_meta(state_dir)
    _clean_stray_tmps(state_dir)
    n_buckets = int(meta["n_buckets"])
    new_docs = spark.read.parquet(docs_path).select("doc_id", "text")
    state = read_clusters(spark, state_dir).select(
        "doc_id", F.col("cluster_id").alias("component")
    )
    overlap = new_docs.join(state, "doc_id", "semi").count()
    if overlap:
        raise SystemExit(
            f"ingest batch overlaps state on {overlap} doc_ids — batches "
            "must be disjoint (re-ingesting a doc would double its edges)"
        )
    # batch bands: computed once, appended to the persisted index after
    # the fold succeeds. Candidate edges probe persisted + batch bands,
    # batch side broadcast — identical band layout is guaranteed by the
    # pinned meta.
    new_bands = _bands_df(spark, new_docs, meta).localCheckpoint(eager=True)
    old_bands = read_bands(spark, state_dir)
    all_bands = old_bands.unionByName(new_bands)
    new_ids = new_docs.select("doc_id")
    a, b = all_bands.alias("a"), new_bands.alias("b")
    edges = (
        a.join(
            F.broadcast(b),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    updated = incremental_components(state, new_ids, edges, "doc_id").select(
        "doc_id", F.col("component").alias("cluster_id")
    )
    # Touched buckets = shards holding a NEW doc or a base doc whose
    # cluster label changed (its old label was merged away). The
    # relabel map is O(batch-adjacent clusters), so this probe — and
    # the write below — stays O(batch) no matter the corpus size.
    changed_labels = (
        state.join(
            updated.withColumnRenamed("cluster_id", "component2"), "doc_id"
        )
        .where(F.col("component") != F.col("component2"))
        .select("doc_id")
    )
    bucket = _bucket_col(n_buckets)
    touched = sorted(
        r["b"]
        for r in changed_labels.unionByName(new_ids)
        .select(bucket.alias("b"))
        .distinct()
        .collect()
    )
    # Dynamic partition overwrite: only the bucket directories present
    # in the written frame are replaced; every other shard's files are
    # left byte-identical on disk (asserted in
    # tests/test_dedup_state_tool.py).
    (
        updated.withColumn("bucket", bucket)
        .where(F.col("bucket").isin([int(t) for t in touched]))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(os.path.join(state_dir, "clusters"))
    )
    gen = _next_generation(os.path.join(state_dir, "bands"))
    _append_generation(new_bands, os.path.join(state_dir, "bands"), gen)
    _append_generation(edges, os.path.join(state_dir, "edges"), gen)
    n_new = new_ids.count()
    print(
        f"ingest: {n_new} new docs, {n_edges} delta edges folded into "
        f"{state_dir} (gen {gen}, {len(touched)}/{n_buckets} cluster "
        "buckets rewritten)"
    )


def cmd_verify(spark, state_dir: str, full_docs: str | None) -> int:
    from dsp_spark.operators.dedup import connected_components

    meta = _load_meta(state_dir)
    _clean_stray_tmps(state_dir)
    clusters = read_clusters(spark, state_dir)
    bands = read_bands(spark, state_dir)
    recomputed_pairs = _pairs_from_bands(bands).localCheckpoint(eager=True)
    nodes = bands.select("doc_id").distinct()
    want = connected_components(nodes, recomputed_pairs, "doc_id").select(
        "doc_id", F.col("component").alias("cluster_id")
    )
    diff = (
        clusters.exceptAll(want).count() + want.exceptAll(clusters).count()
    )
    if diff:
        print(f"VERIFY FAIL: {diff} assignment rows differ from recompute")
        return 1
    # the append-only adjacency must be exactly the band self-join set
    stored_edges = read_edges(spark, state_dir).distinct()
    ediff = (
        stored_edges.exceptAll(recomputed_pairs).count()
        + recomputed_pairs.exceptAll(stored_edges).count()
    )
    if ediff:
        print(f"VERIFY FAIL: {ediff} edge rows differ from band recompute")
        return 1
    if full_docs:
        corpus_ids = spark.read.parquet(full_docs).select("doc_id")
        missing = corpus_ids.join(clusters, "doc_id", "anti").count()
        extra = clusters.join(corpus_ids, "doc_id", "anti").count()
        if missing or extra:
            print(f"VERIFY FAIL: coverage missing={missing} extra={extra}")
            return 1
    # spans staleness: the interval table is an O(corpus) materialized
    # view, NOT maintained by ingest — if its recorded corpus snapshot
    # no longer matches the band index's doc set, consumers would read
    # intervals for text that has since gained new cross-doc spans
    if "span_corpus" in meta:
        if not os.path.isdir(os.path.join(state_dir, "spans")):
            # meta advertises a spans table that is not on disk — a
            # torn refresh _clean_stray_tmps could not roll back
            print(
                "VERIFY FAIL: _meta.json records span_corpus but spans/ "
                "is missing — torn spans refresh; re-run `spans`"
            )
            return 1
        current = _corpus_fingerprint(bands.select("doc_id").distinct())
        if current != meta["span_corpus"]:
            print(
                "VERIFY FAIL: spans table is STALE — built from "
                f"{meta['span_corpus']} but the state now holds "
                f"{current}; re-run `spans` against the full corpus"
            )
            return 1
    print(
        f"verify: OK ({clusters.count()} docs, incremental == recompute, "
        "edge store == band self-join)"
    )
    return 0


def cmd_stats(spark, state_dir: str) -> None:
    """One-line state-shape report: docs, clusters, generations,
    edges, and cluster-shard balance (max/avg bucket row count) — the
    numbers an operator checks before/after an ingest."""
    _load_meta(state_dir)
    _clean_stray_tmps(state_dir)
    clusters = spark.read.parquet(os.path.join(state_dir, "clusters"))
    per_bucket = clusters.groupBy("bucket").count()
    row = per_bucket.agg(
        F.sum("count").alias("docs"),
        F.count("*").alias("buckets"),
        F.max("count").alias("max_b"),
        (F.sum("count") / F.count("*")).alias("avg_b"),
    ).collect()[0]
    n_clusters = clusters.select("cluster_id").distinct().count()
    gens = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(state_dir, "bands"))
        if d.startswith("ingest=") and not d.endswith("._tmp")
    )
    n_edges = read_edges(spark, state_dir).count()
    print(
        f"stats: {row.docs} docs in {n_clusters} clusters across "
        f"{row.buckets} buckets (max/avg bucket {row.max_b}/"
        f"{row.avg_b:.1f}); {len(gens)} generations "
        f"(0..{gens[-1] if gens else '-'}), {n_edges} edges"
    )


def cmd_compact(spark, state_dir: str) -> None:
    """Fold all band/edge ingest generations into a single ingest=0
    directory — the occasional maintenance pass that keeps the
    append-only stores from accumulating one directory (and its small
    files) per ingest. Content-preserving by construction (same rows,
    one generation); O(corpus) I/O, which is why it is a separate
    maintenance command and not part of ingest. Crash-safe: each
    store is rebuilt in a tmp dir and swapped in atomically."""
    _load_meta(state_dir)
    _clean_stray_tmps(state_dir)
    for store, reader in (("bands", read_bands), ("edges", read_edges)):
        root = os.path.join(state_dir, store)
        df = reader(spark, state_dir).localCheckpoint(eager=True)
        tmp = root + "._tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "ingest=0"))
        old = root + "._old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
        print(f"compact: {store} -> 1 generation ({df.count()} rows)")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="persisted dedup-cluster state")
    p.add_argument(
        "cmd",
        choices=["init", "ingest", "verify", "stats", "compact", "spans"],
    )
    p.add_argument("--docs", help="parquet of (doc_id, text)")
    p.add_argument("--state", required=True, help="state directory")
    p.add_argument("--full", help="verify coverage against this corpus parquet")
    p.add_argument(
        "--span-gram", type=int, default=8,
        help="token-run length for the spans subcommand",
    )
    for k, v in DEFAULTS.items():
        p.add_argument(f"--{k.replace('_', '-')}", type=int, default=v)
    args = p.parse_args(argv)
    if args.cmd == "spans" and args.span_gram < 2:
        p.error(f"--span-gram must be >= 2 (got {args.span_gram})")

    from dsp_spark.session import get_session

    spark = get_session("dsp-dedup-state")
    try:
        if args.cmd == "init":
            if not args.docs:
                p.error("init requires --docs")
            meta = {k: getattr(args, k) for k in DEFAULTS}
            cmd_init(spark, args.docs, args.state, meta)
            return 0
        if args.cmd == "ingest":
            if not args.docs:
                p.error("ingest requires --docs")
            cmd_ingest(spark, args.docs, args.state)
            return 0
        if args.cmd == "stats":
            cmd_stats(spark, args.state)
            return 0
        if args.cmd == "compact":
            cmd_compact(spark, args.state)
            return 0
        if args.cmd == "spans":
            if not args.docs:
                p.error("spans requires --docs")
            cmd_spans(spark, args.docs, args.state, args.span_gram)
            return 0
        return cmd_verify(spark, args.state, args.full)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
