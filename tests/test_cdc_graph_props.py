"""Invariant tests for the CDC and graph operators.

These check algebraic properties rather than oracle parity (which
tests/test_oracle_parity.py already covers): SCD2 intervals must
round-trip back to the per-event states they encode, MERGE must
conserve row counts, and PageRank must hit closed-form fixpoints on
regular graphs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.operators.graph import pagerank
from dsp_spark.queries.cdc import merge_upsert_orders, scd2_user_state_intervals


def test_scd2_intervals_round_trip_to_event_states(spark, sf_dir):
    """Joining every event back into its covering interval must recover
    the event's own state — intervals are a lossless run-length
    encoding of the change stream."""
    from dsp_spark.session import read_table

    events = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    iv = scd2_user_state_intervals(spark, sf_dir)
    covered = events.alias("e").join(
        iv.alias("i"),
        (F.col("e.user_id") == F.col("i.user_id"))
        & (F.col("e.ts") >= F.col("i.valid_from"))
        & (
            F.col("i.valid_to").isNull()
            | (F.col("e.ts") < F.col("i.valid_to"))
        ),
    )
    n_events = events.count()
    assert covered.count() == n_events  # every event in exactly one interval
    assert (
        covered.where(F.col("e.event_type") != F.col("i.state")).count() == 0
    )


def test_scd2_one_current_interval_per_user(spark, sf_dir):
    iv = scd2_user_state_intervals(spark, sf_dir)
    per_user = iv.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current")
    )
    assert per_user.where(F.col("n_current") != 1).count() == 0


def test_merge_upsert_conserves_rows(spark, sf_dir):
    from dsp_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    n_base = orders.count()
    n_inserts = orders.where(F.col("o_orderkey") % 13 == 0).count()
    n_updates = orders.where(F.col("o_orderkey") % 7 == 0).count()

    out = {
        (r["action"]): r["n_orders"]
        for r in merge_upsert_orders(spark, sf_dir)
        .groupBy("action")
        .agg(F.sum("n_orders").alias("n_orders"))
        .collect()
    }
    assert out.get("insert", 0) == n_inserts
    assert out.get("update", 0) == n_updates
    assert out.get("keep", 0) == n_base - n_updates
    assert sum(out.values()) == n_base + n_inserts


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_pagerank_uniform_on_regular_graph(spark):
    """On a cycle (2-regular) the uniform vector is the exact fixpoint:
    every node keeps rank 1.0 at every iteration."""
    n = 8
    cycle = _pairs(spark, [(i, (i + 1) % n) for i in range(n)])
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    got = pagerank(nodes, cycle, "doc_id", iters=3).collect()
    assert all(abs(r.pr - 1.0) < 1e-6 for r in got)


def test_pagerank_star_graph_hand_computed(spark):
    """Star with center 0 and 4 leaves, one iteration from all-ones:
    center gets 0.15 + 0.85 * 4 * (1/1) = 3.55, each leaf gets
    0.15 + 0.85 * (1/4) = 0.3625."""
    star = _pairs(spark, [(0, i) for i in range(1, 5)])
    nodes = spark.range(5).select(F.col("id").alias("doc_id"))
    got = {r.node: r.pr for r in pagerank(nodes, star, "doc_id", iters=1).collect()}
    assert abs(got[0] - 3.55) < 1e-6
    for leaf in range(1, 5):
        assert abs(got[leaf] - 0.3625) < 1e-6


def test_pagerank_isolated_node_settles_at_teleport(spark):
    pair = _pairs(spark, [(0, 1)])
    nodes = spark.range(3).select(F.col("id").alias("doc_id"))
    got = {r.node: r.pr for r in pagerank(nodes, pair, "doc_id", iters=2).collect()}
    assert abs(got[2] - 0.15) < 1e-9
