"""Query catalog: named (Spark builder, DuckDB oracle SQL) pairs.

Every operator the engine claims is registered here with

* a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
* (where SQL-expressible) an equivalent ANSI-SQL string the DuckDB
  oracle runs on the same parquet tables.

The driver compares the two at sf=0.01 (row count + schema + value
hash, column-name sorted) — so Spark aliases and SQL aliases MUST
agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry: {name}")
        _REGISTRY[name] = CatalogEntry(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# The round driver checks AT MOST the first ~50 entries of queries(),
# in iteration order, against the DuckDB oracle. Registration order is
# import order, which froze the round-1 entries into the window and left
# everything added later unverified. Ordering is therefore rotated so
# every entry eventually gets a driver correctness row:
#
# 1. Entries with no row in any committed CORRECTNESS_r*.json come
#    first (auto-detected — adding a new entry automatically puts it in
#    the next round's window), ranked by the priority list below, then
#    registration order.
# 2. Already-checked entries follow, least-recently-checked first, so
#    old rows get re-verified over time.
#
# The static list below is the within-group priority: reference-core
# dataflow parity first (router/telemetry/relay — the engine's raison
# d'être, SURVEY §3.1-3.2), then the LLM-pipeline layers. Unknown names
# are ignored (a renamed entry must not break iteration).
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # reference-core parity (router.hpp, telemetry frames, k2k relay)
    "router_multicast_events",
    "router_drop_accounting",
    "telemetry_parse_heartbeats",
    "heartbeat_projection",
    "k2k_relay_identity",
    # dedup family
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_fingerprints",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_survivors",
    "approx_distinct_docs_hll",
    "dedup_clusters",
    "dedup_segments_corpus",
    "dedup_graph_triangles",
    "dedup_lsh_verified",
    # similarity / embeddings
    "embedding_block_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_int8_topk",
    "array_function_surface",
    "embedding_kmeans_assign",
    "embedding_label_centroids",
    "embedding_kmeans_iterate",
    "semantic_dedup_survivors",
    # text analysis
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_bpe_pretokens",
    "text_pii_scan",
    "decontam_eval_overlap",
    "text_vocab_topk",
    "text_repetition_stats",
    "text_quality_filter",
    "source_median_chars_udaf",
    "corpus_curation_pipeline",
    "text_tfidf_top_terms",
    # sampling / corpus management
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "dataset_mixture_audit",
    "sample_weighted_systematic",
    "dataset_split_assign",
    "corpus_shard_manifest",
    "mixture_temperature_weights",
    "table_stats_documents",
    "corpus_snapshot_diff",
    "corpus_dataset_card",
    # round-3 additions, ranked for the round-4 window: core new
    # families first (DQ, CDC, sketches, graph/linalg, PQ ANN), then
    # the long tail
    "dq_documents_audit",
    "dq_referential_integrity",
    "dq_key_uniqueness",
    "dq_events_freshness",
    "dq_volume_shift_daily",
    "scd2_user_state_intervals",
    "scd2_point_in_time_join",
    "merge_upsert_orders",
    "hll_user_rollup_merge",
    "quantile_sketch_prices",
    "embedding_dim_variance",
    "embedding_outlier_scores",
    "lineitem_numeric_corr",
    "graph_pagerank_dupgraph",
    "embedding_pca_power",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_pq_recall",
    "text_bigram_lm_score",
    "quality_classifier_score",
    "vocab_drift_snapshots",
    "lang_id_confusion",
    "corpus_token_budget_select",
    "dedup_incremental_new_docs",
    "events_ohlc_resample",
    "events_twap_per_user",
    "events_cumulative_distinct_users",
    "orders_abc_pareto",
    # round-5 window head: the two multimodal entries that spilled past
    # round 4's 50-slot window (2 rounds waiting), then round-4 additions
    "multimodal_frame_sample",
    "multimodal_resize_audit",
    "dedup_containment_pairs",
    "dedup_winnowing_fingerprints",
    "dedup_rate_by_source",
    "basket_brand_lift",
    "orders_cohort_revenue",
    "events_dau_wau_mau",
    "dedup_minhash_est_vs_exact",
    "dedup_cluster_savings",
    "embedding_centroid_drift",
    "sample_balanced_classes",
    "doc_length_percentiles_by_source",
    "customer_order_gap_stats",
    "events_funnel_time_to_convert",
    "events_hourly_seasonality",
    "text_ngram_topk_per_lang",
    # round-9 window: the r8 verdict's named oldest-r5 entries (ask #1)
    # — float-emitting/sketch-heavy families that benefit most from a
    # recheck — rank ahead of the module-order tail (which had been
    # filling the r5 slots with low-risk relational q-queries)
    "ann_index_persisted_topk",
    "ann_recall_at_k",
    "decontam_near_dup_eval",
    "dataset_shuffle_order",
    "events_funnel_conversion",
)

# Entries whose IMPLEMENTATION changed in a round AFTER their newest
# green driver row: until a driver check from >= that round lands in a
# committed CORRECTNESS artifact, treat them as never-checked so the
# changed code rotates to the front of the window instead of coasting
# on stale evidence. Once the re-check lands, the entry ages normally
# (the guard below is a no-op) — stale keys here cost nothing but
# should be pruned when touched. name -> round the change shipped in.
_CHANGED_IN_ROUND: dict[str, int] = {
    # r11: SOUND capped flag — pairs with an endpoint in a truncated
    # hub's dropped tail, replacing the contributing-centers OR that
    # could read capped=false on an undercounted pair (advisor r10)
    "graph_adamic_adar_pairs": 11,
}


def _driver_checked_rounds() -> dict[str, int]:
    """name -> latest round with a PASSING driver correctness row,
    parsed from the ON-DISK CORRECTNESS_r*.json artifacts next to the
    package (glob over the working tree — tracked or not, so the
    window rotates the moment the driver writes a round's file, before
    any commit). A failed row (error, or any explicit mismatch) does NOT
    count as checked — the entry must rotate back into the window so
    the fix gets re-verified, not buried at the end of the iteration.
    Empty on any problem — ordering then falls back to the static list."""
    import glob
    import json
    import os
    import re

    out: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            with open(path) as f:
                data = json.load(f)
            if not isinstance(data, dict):
                continue
            for name, rec in data.items():
                if isinstance(rec, dict):
                    failed = rec.get("err") is not None or any(
                        rec.get(k) is False
                        for k in ("rows_match", "schema_match", "hash_match")
                    )
                    if failed:
                        continue
                out[name] = max(out.get(name, 0), rnd)
    except Exception:
        return {}
    return out


def _ordered() -> dict[str, CatalogEntry]:
    _load_all()
    checked = dict(_driver_checked_rounds())  # copy: never mutate the source
    for n, rnd in _CHANGED_IN_ROUND.items():
        if checked.get(n, 0) < rnd:
            checked.pop(n, None)
    prio = {name: i for i, name in enumerate(_DRIVER_WINDOW_FIRST)}
    # Canonical registration order: (module rank in _MODULE_ORDER,
    # position within the module). Raw _REGISTRY insertion order is
    # IMPORT order, which a test importing one query module directly
    # (before queries()/entries() triggers _load_all) would reshuffle —
    # and with it the driver's 50-entry window. Per-module positions
    # are stable no matter how imports interleave.
    mod_rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    per_mod_count: dict[str, int] = {}
    reg: dict[str, tuple[int, int]] = {}
    for n, e in _REGISTRY.items():
        mod = e.fn.__module__.rsplit(".", 1)[-1]
        k = per_mod_count.get(mod, 0)
        per_mod_count[mod] = k + 1
        reg[n] = (mod_rank.get(mod, len(mod_rank)), k)
    names = sorted(
        _REGISTRY,
        key=lambda n: (
            checked.get(n, 0),  # never-checked (0) first, then oldest round
            prio.get(n, len(prio)),  # priority list within a group
            reg[n],  # canonical (module, position) order last
        ),
    )
    return {n: _REGISTRY[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in _ordered().items() if e.oracle is not None}


def entries() -> dict[str, CatalogEntry]:
    return _ordered()


_LOADED = False


# The canonical module order for registration-order tie-breaks in
# _ordered() — MUST match the import sequence below, and must not be
# reordered casually: it decides which never-checked entries occupy the
# tail of the driver's 50-entry window.
_MODULE_ORDER = (
    "relational",
    "tpch_extra",
    "windows",
    "dedup",
    "similarity",
    "sampling",
    "chunking",
    "text",
    "streaming_parity",
    "quality",
    "cdc",
    "sketches",
    "graph",
    "layout",
    "features",
)


def _load_all() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects.
    from dsp_spark.queries import (  # noqa: F401
        relational,
        tpch_extra,
        windows,
        dedup,
        similarity,
        sampling,
        chunking,
        text,
        streaming_parity,
        quality,
        cdc,
        sketches,
        graph,
        layout,
        features,
    )

    _LOADED = True


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """SQL entry point: register the synthetic tables as temp views and
    run an arbitrary query through ``spark.sql``.

    Every catalog oracle is written in portable ANSI SQL; the subset
    that avoids DuckDB-only functions runs unchanged here (parity-
    tested in tests/test_sql_surface.py), so users can drive the engine
    with SQL strings instead of the DataFrame builders.
    """
    from dsp_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(sql)


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m dsp_spark.catalog [name] [--sf-dir DIR] [-n N]``.

    Without a name, lists every registered entry with its doc line.
    With a name, runs the query and prints the first N rows.
    """
    import argparse

    p = argparse.ArgumentParser(description="dsp_spark query catalog")
    p.add_argument("name", nargs="?", help="catalog entry to run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("-n", "--rows", type=int, default=20)
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    p.add_argument("--sql", action="store_true", help="run the oracle SQL via spark.sql instead of the DataFrame builder")
    args = p.parse_args(argv)

    es = entries()
    if not args.name:
        for name, e in sorted(es.items()):
            doc = (e.doc or "").split(". ")[0][:90]
            mark = " " if e.oracle else "*"  # * = rows-only (no oracle)
            print(f"{mark} {name:42s} {doc}")
        return 0
    if args.name not in es:
        print(f"unknown entry {args.name!r}; run with no args to list")
        return 2

    from dsp_spark.session import get_session

    spark = get_session("dsp-catalog-cli")
    e = es[args.name]
    if args.sql:
        if e.oracle is None:
            print(f"{args.name} has no SQL oracle (rows-only entry)")
            return 2
        df = run_sql(spark, args.sf_dir, e.oracle)
    else:
        df = e.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    import sys

    # under `python -m dsp_spark.catalog` this file runs as __main__ with
    # its own (empty) registry; delegate to the canonical module object
    # that the query modules actually register into
    from dsp_spark.catalog import main as _canonical_main

    sys.exit(_canonical_main())
