"""SQL entry point: the portable-ANSI subset of the catalog's oracle
strings must run UNCHANGED through spark.sql and match DuckDB — the
same text drives both engines, so a user can work in SQL instead of
the DataFrame builders (catalog.run_sql).

Entries absent from this list use DuckDB-only syntax (:: casts,
list_* functions, generate_series, integer //) in their oracles; their
Spark semantics are covered by the DataFrame-side parity suite.
"""

from __future__ import annotations

import pytest

from dsp_spark import catalog
from tests._compare import assert_results_equal

# discovered by running every oracle through spark.sql at sf0.01 and
# keeping exact matches; includes all 22 TPC-H shapes
PORTABLE = [
    "approx_distinct_docs_hll",
    "asof_join_forward_purchase",
    "basket_brand_affinity",
    "dedup_incremental_new_docs",
    "dq_documents_audit",
    "dq_key_uniqueness",
    "dq_referential_integrity",
    "events_audience_overlap",
    "events_cumulative_distinct_users",
    "events_journey_paths",
    "hll_user_rollup_merge",
    "lineitem_numeric_corr",
    "merge_upsert_orders",
    "orders_abc_pareto",
    "scd2_point_in_time_join",
    "scd2_user_state_intervals",
    "source_lang_mix",
    "table_stats_documents",
    "asof_join_event_order",
    "big_spender_segments",
    "conditional_bucketing",
    "cube_orders_priority",
    "customer_rfm_segments",
    "customers_without_orders",
    "dedup_exact",
    "dedup_survivors",
    "distinct_stats_orders",
    "doc_length_histogram",
    "event_transitions",
    "events_anomaly_zscore",
    "events_funnel_conversion",
    "events_hourly_rollup",
    "events_multigrain_rollup",
    "events_tumbling_window",
    "events_windowed_topk_types",
    "grouping_sets_orders",
    "intersect_active_building",
    "latest_event_per_user",
    "mixture_temperature_weights",
    "multimodal_resize_audit",
    "orders_yoy_growth",
    "outer_join_nation_customers",
    "pivot_qty_by_linestatus",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_regional_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q20_dominant_part_suppliers",
    "q21_suppliers_who_kept_orders_waiting",
    "q22_global_sales_opportunity",
    "rollup_lineitem_status",
    "router_drop_accounting",
    "router_multicast_events",
    "running_balance_by_nation",
    "scalar_surface_part",
    "set_ops_customer_keys",
    "source_median_chars_udaf",
    "timeseries_similar_users",
    "top100_orders_global",
    "top_part_per_brand",
    "topk_orders_per_segment",
    "window_function_surface",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from dsp_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(name, views, duck, sf_dir):
    oracle = catalog.entries()[name].oracle
    got = views.sql(oracle).toPandas()
    want = duck.execute(oracle).fetchdf()
    assert_results_equal(got, want, f"spark.sql:{name}")


def test_catalog_cli_lists_entries(capsys):
    assert catalog.main([]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "dedup_lsh_verified" in out
