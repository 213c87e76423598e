"""Plan-quality guardrails: assert the physical plans we designed for
100 TB actually materialize — pushdown, pruning, broadcast choice,
exchange reuse, codegen. A regression here is a scale bug even when
results stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark import catalog, plans
from dsp_spark.session import read_table

ENTRIES = catalog.entries()


def q(name, spark, sf_dir):
    return ENTRIES[name].fn(spark, sf_dir)


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    df = q("q6_forecast_revenue", spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    # scan must read only the 4 referenced columns, not all 11
    (cols,) = plans.read_schema_columns(df)
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = q("q5_regional_supplier_volume", spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_q7_prefilters_nation_dims_before_broadcast(spark, sf_dir):
    df = q("q7_nation_volume", spark, sf_dir)
    assert plans.has_broadcast_join(df)
    # the two-name filter must reach both nation scans, so the broadcast
    # sides (and the fact rows they keep) shrink ~2/25 BEFORE the
    # orderkey shuffle — the whole point of the q7 rewrite
    pushed = " ".join(plans.pushed_filters(df))
    assert "n_name" in pushed


def test_q14_broadcasts_part_dim(spark, sf_dir):
    df = q("q14_promo_revenue", spark, sf_dir)
    assert plans.has_broadcast_join(df)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed


def test_minhash_lsh_reuses_exchange(spark, sf_dir):
    """The band self-join must compute signatures once, not per side."""
    df = q("dedup_minhash_lsh_pairs", spark, sf_dir)
    assert plans.has_reused_exchange(df)


def test_embedding_pairs_reuses_exchange(spark, sf_dir):
    df = q("embedding_block_pairs", spark, sf_dir)
    assert plans.has_reused_exchange(df)


def test_column_pruning_on_projection(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (cols,) = plans.read_schema_columns(df)
    assert cols == {"l_orderkey", "l_quantity"}


def test_scan_stays_in_codegen(spark, sf_dir):
    df = q("q1_pricing_summary", spark, sf_dir)
    assert plans.whole_stage_codegen_ids(df), "aggregation fell out of codegen"


# Unpartitioned (single-partition) windows are the silent scale-killer:
# every entry is checked and must plan ZERO of them unless allowlisted
# here with the bounded cardinality that makes the single task safe.
# The two-phase prefix ops (operators/prefix.py) replaced the four
# data-grain offenders round 3's verdict flagged; what remains runs on
# aggregates whose row count is bounded by a dictionary or config
# constant, never by data volume.
ALLOWED_GLOBAL_WINDOWS = {
    # one offsets-cumsum per prefix-op call: ≤ `buckets` (64) rows each
    "corpus_token_budget_select": 1,
    "orders_abc_pareto": 3,  # offsets + 2 windows on the 10-row decile rollup
    # one 64-row offsets-cumsum per single-dim NTILE pipeline (r14:
    # the melted multi helper — whose offsets window was partitioned
    # by _dim — was replaced by two concurrent per-dim pipelines,
    # measured 2.90 -> 2.33 s; the window input stays `buckets`-bounded)
    "zorder_zvalue_audit": 2,
    "orders_yoy_growth": 1,  # year grain (~7 rows)
    "dq_events_freshness": 1,  # event_type grain (handful of streams)
    "dq_volume_shift_daily": 1,  # calendar-day spine
    "events_cumulative_distinct_users": 1,  # day grain
    "events_journey_paths": 1,  # path dictionary (≤ |event_types|^3)
    "orders_open_backlog_daily": 1,  # calendar-day spine (~2.4k rows)
    # risk-set + cumulative-hazard windows on DISTINCT gap days
    # (bounded by the calendar span in days, ~1k rows at any corpus)
    "orders_interpurchase_km": 2,
    # rank numbering on the top-k token table (<= _ZIPF_K = 128 rows;
    # the corpus-side top-k is TakeOrderedAndProject, not this window)
    "text_zipf_slope": 1,
}


def test_no_cartesian_or_unpartitioned_window_in_catalog(spark, sf_dir):
    """No registered query may plan a CartesianProduct — at 100 TB that's
    an outage. (Brute-force ANN is a deliberate BroadcastNestedLoop over
    a tiny query set, which is fine; Cartesian is not.) And no query may
    plan an unpartitioned Window beyond the audited bounded-cardinality
    allowlist above — new ones can't sneak in."""
    cartesian, windows = [], {}
    for name, entry in ENTRIES.items():
        plan = plans.formatted(entry.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            cartesian.append(name)
        n = len(plans.unpartitioned_windows(plan))
        if n != ALLOWED_GLOBAL_WINDOWS.get(name, 0):
            windows[name] = n
    assert not cartesian, f"cartesian joins in: {cartesian}"
    assert not windows, (
        "unpartitioned WindowExec count drifted from the audited "
        f"allowlist (entry -> found): {windows}"
    )


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """Hive-partitioned layout (the 100 TB table format): an equality
    filter on the partition column must prune at planning time —
    the scan lists only matching directories, it never reads others."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    ev.write.partitionBy("event_date").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("event_date") == "1997-03-02")
    plan = plans.formatted(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_exact_dedup_single_shuffle(spark, sf_dir):
    """Hash-groupBy dedup: one exchange (partial agg map-side first)."""
    df = q("dedup_exact", spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_topk_partial_ranking(spark, sf_dir):
    """Per-group top-k must sort within partitions only (window), never
    globally; a global Sort before the window is a scale bug."""
    plan = plans.formatted(q("topk_orders_per_segment", spark, sf_dir))
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_q21_no_lineitem_self_join(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS pair must decorrelate to one lineitem
    scan + two cascaded reducing aggs, never a lineitem-lineitem
    self-join (which would shuffle the fact table twice more at 100 TB)
    and no window (which would sort and carry fact-sized rows)."""
    df = q("q21_suppliers_who_kept_orders_waiting", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("lineitem.parquet") == 1
    assert "Window" not in plan


def test_decontam_split_filter_reaches_scan(spark, sf_dir):
    """Each decontam branch (train / eval) must compute n-grams only for
    its own split: the is_eval filter has to sit below the explode, so
    every documents scan carries a source-derived filter rather than
    fanning out 8-grams for the whole corpus twice."""
    df = q("decontam_eval_overlap", spark, sf_dir)
    plan = plans.formatted(df)
    # exactly two scans: one per split — a third scan means some branch
    # re-derives grams instead of reusing one grouping
    assert plan.count("documents.parquet") == 2
    # the substring(source) split predicate sits in Filter nodes below
    # each Generate (explode), so each branch fans out only its own split
    assert plan.count("substring(source") >= 2


def test_chunking_is_shuffle_free(spark, sf_dir):
    """doc_chunk_sliding is a narrow explode: zero exchanges."""
    df = q("doc_chunk_sliding", spark, sf_dir)
    assert plans.count_exchanges(df) == 0


def test_pii_scan_single_shuffle(spark, sf_dir):
    """Regex counting folds map-side; only the per-source agg shuffles."""
    df = q("text_pii_scan", spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_vocab_topk_no_global_sort(spark, sf_dir):
    """Global top-k must be TakeOrderedAndProject, not Sort+Limit."""
    plan = plans.formatted(q("text_vocab_topk", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_funnel_single_shuffle(spark, sf_dir):
    """Three chained window passes + the final per-user agg all share the
    user_id partitioning: the whole funnel is ONE exchange."""
    df = q("events_funnel_conversion", spark, sf_dir)
    assert plans.count_exchanges(df) == 1
    plan = plans.formatted(df)
    assert plan.count("events.parquet") == 1


def test_retention_two_shuffles(spark, sf_dir):
    """Cohort assignment rides the per-user day-set agg (array_min of the
    collected set), so only the user agg and the tiny rollup shuffle."""
    df = q("events_retention_cohorts", spark, sf_dir)
    assert plans.count_exchanges(df) == 2


def test_quality_filter_shuffle_free(spark, sf_dir):
    """The keep/drop filter is a narrow map over the scan: zero
    exchanges, whole plan in one codegen stage."""
    df = q("text_quality_filter", spark, sf_dir)
    assert plans.count_exchanges(df) == 0
    assert df.columns[0] == "doc_id"


def test_segment_dedup_two_shuffles(spark, sf_dir):
    """Segment dedup shuffles once on the segment key (first-occurrence
    window) and once to re-group per doc — never a third time."""
    df = q("dedup_segments_corpus", spark, sf_dir)
    assert plans.count_exchanges(df) == 2
    # the explode (Generate) must sit below the first exchange: segments
    # are produced map-side, not after a shuffle of whole documents
    plan = plans.formatted(df)
    assert "Generate" in plan


def test_kmeans_assign_no_corpus_shuffle(spark, sf_dir):
    """Assignment must be a map-side fold over broadcast centroids: no
    Window/Sort of scored pairs, and the only exchanges are the tiny
    seed-packing agg + its broadcast plus the r14 spread() round-robin
    (a partition-count no-op at real scan parallelism; the corpus is
    never shuffled BY KEY for the assignment itself)."""
    df = q("embedding_kmeans_assign", spark, sf_dir)
    plan = plans.formatted(df)
    assert "Window" not in plan and "Sort" not in plan
    assert plans.count_exchanges(df) == 3
    # the only non-broadcast, non-seed exchange is the round-robin
    # spread — never a key-partitioned shuffle of scored corpus rows
    assert "hashpartitioning(vec_id" not in plan


def test_label_centroids_single_shuffle(spark, sf_dir):
    """Centroid update: posexplode map-side, one partial-agg exchange on
    the (label, pos) keys."""
    df = q("embedding_label_centroids", spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_zscore_single_shuffle(spark, sf_dir):
    """Mean/std/z all ride one user_id window pass: one exchange."""
    df = q("events_anomaly_zscore", spark, sf_dir)
    assert plans.count_exchanges(df) == 1


def test_repetition_stats_shuffle_free(spark, sf_dir):
    """Per-doc repetition signals are row-local: zero exchanges."""
    df = q("text_repetition_stats", spark, sf_dir)
    assert plans.count_exchanges(df) == 0


def test_timeseries_similarity_topk_no_global_sort(spark, sf_dir):
    """Correlation top-k must be TakeOrderedAndProject over the per-user
    agg — a rangepartitioning global sort here is a scale bug."""
    df = q("timeseries_similar_users", spark, sf_dir)
    plan = plans.formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_curation_pipeline_two_shuffles(spark, sf_dir):
    """Quality rules are map-side; only the dup-survival window (md5 key)
    and the tiny per-source rollup exchange."""
    df = q("corpus_curation_pipeline", spark, sf_dir)
    assert plans.count_exchanges(df) == 2


def test_rolling_window_single_shuffle(spark, sf_dir):
    """RANGE-frame rolling sum: one user_id exchange, no self-join."""
    df = q("events_rolling_1h_sum", spark, sf_dir)
    assert plans.count_exchanges(df) == 1
    assert plans.formatted(df).count("events.parquet") == 1


def test_weighted_sample_single_shuffle_no_global_sort(spark, sf_dir):
    """Per-source cumsum: one exchange, never a rangepartitioning sort."""
    df = q("sample_weighted_systematic", spark, sf_dir)
    assert plans.count_exchanges(df) == 1
    assert "rangepartitioning" not in plans.formatted(df).lower().replace(" ", "")


def test_triangle_count_single_pair_derivation(spark, sf_dir):
    """Triangle enumeration must derive the LSH pair list ONCE: the
    pair list is materialized (localCheckpoint), so the triangle plan
    joins three scans of that RDD and never re-reads documents or
    recomputes signatures — zero parquet scans, few exchanges."""
    df = q("dedup_graph_triangles", spark, sf_dir)
    plan = plans.formatted(df)
    assert "documents.parquet" not in plan
    assert plans.count_exchanges(df) <= 6


def test_q2_part_filter_prunes_below_aggregate(spark, sf_dir):
    """The part semi-join must sit under the (pk, sk) aggregate so only
    qualifying parts reach the shuffle, and part filters must reach the
    part scan."""
    df = q("q2_min_cost_supplier", spark, sf_dir)
    assert plans.has_broadcast_join(df)
    pushed = " ".join(plans.pushed_filters(df))
    assert "p_type" in pushed and "p_size" in pushed


def test_q11_scalar_total_reuses_exchange(spark, sf_dir):
    """The national relation feeds both the per-part aggregate and the
    1-row total; the second read must be a ReusedExchange, not a
    recompute."""
    df = q("q11_important_parts", spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert plans.has_reused_exchange(df)


def test_q20_partial_aggs_share_scan(spark, sf_dir):
    """r14: the 1996 shipped total rides the (partkey, suppkey)
    aggregate as a conditional sum (folded to part grain by a window),
    so there is ONE fact scan and nothing left to reuse — stronger
    than the old shape's ReusedExchange of two parallel aggregates."""
    df = q("q20_dominant_part_suppliers", spark, sf_dir)
    plan = plans.formatted(df)
    assert plans.has_broadcast_join(df)
    assert plan.count("lineitem.parquet") == 1


def test_sampling_reports_single_shuffle(spark, sf_dir):
    """Split assignment, shard manifest, and the length histogram are
    scan + one partial-agg exchange — membership/bucketing is computed
    map-side, never shuffled raw."""
    for name in (
        "dataset_split_assign",
        "corpus_shard_manifest",
        "doc_length_histogram",
    ):
        assert plans.count_exchanges(q(name, spark, sf_dir)) == 1, name


def test_resize_is_narrow_map(spark, sf_dir):
    """bytes->bytes resize + audit hash: zero exchanges end to end."""
    assert plans.count_exchanges(q("multimodal_resize_audit", spark, sf_dir)) == 0


def test_plan_lock_catches_injected_regression():
    """The PLAN_LOCK.json diff must flag any per-entry increase in
    exchange or global-window count (a refactor silently adding a
    shuffle), and must NOT flag additions, removals, or improvements."""
    from tools.scale_report import compare_lock

    old = {
        "a": {"exchanges": 3, "bcast": True, "global_windows": 0},
        "b": {"exchanges": 1, "bcast": False, "global_windows": 1},
        "gone": {"exchanges": 2, "bcast": False, "global_windows": 0},
    }
    new = {
        "a": {"exchanges": 5, "bcast": True, "global_windows": 0},   # worse
        "b": {"exchanges": 1, "bcast": False, "global_windows": 2},  # worse
        "c": {"exchanges": 9, "bcast": False, "global_windows": 0},  # new
    }
    regs = compare_lock(old, new)
    assert any("a: exchanges 3 -> 5" in r for r in regs)
    assert any("b: global windows 1 -> 2" in r for r in regs)
    assert len(regs) == 2  # 'c' (new) and 'gone' (removed) are not regressions
    # improvements re-baseline silently
    assert compare_lock(new, old) == []


def test_committed_plan_lock_matches_catalog():
    """Every catalog entry appears in the committed lockfile and vice
    versa — a stale lock can't mask a regression on a renamed entry."""
    import json
    import os

    from dsp_spark import catalog

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_LOCK.json")
    with open(path) as f:
        lock = json.load(f)
    assert set(lock["entries"]) == set(catalog.entries())
