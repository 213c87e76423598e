"""Change-data-capture / dataset-versioning catalog entries.

SCD2 interval compaction and MERGE-style upsert are the batch halves of
a CDC pipeline: the first turns an append-only change stream into
validity intervals (the dimension-table shape), the second folds a
delta batch into a base snapshot (what `foreachBatch` + Delta MERGE
does on a lakehouse — here expressed as a co-partitioned full-outer
join so the semantics are engine-checkable).

The reference's closest analogue is the K2K relay's at-least-once
delivery plus downstream compaction (kafka.hpp:557-925); these entries
are the compaction. Related: `corpus_snapshot_diff` (two-snapshot diff)
and `latest_event_per_user` (CDC latest-state view).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.queries._util import cents as _cents_of, t


@register(
    "scd2_user_state_intervals",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM events
    ), runs AS (
      SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ), intervals AS (
      SELECT user_id, event_type AS state, run_id,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, run_id)
             AS valid_to,
           LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, run_id) IS NULL
             AS is_current,
           n_events
    FROM intervals
    """,
    doc="SCD type-2 build from an append-only change stream: collapse "
    "consecutive identical per-user states into [valid_from, valid_to) "
    "intervals with an is_current flag (gaps-and-islands run-length "
    "encoding). Every window and the run aggregate share the user_id "
    "hash key, so the whole dimension build is ONE shuffle; ties break "
    "on event_id for determinism.",
)
def scd2_user_state_intervals(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    runs = e.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    intervals = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    # run_id tie-break: two runs of one user can share a valid_from
    # when consecutive state changes carry an identical ts — ordering
    # by valid_from alone would make valid_to assignment partitioning-
    # dependent
    w2 = W.partitionBy("user_id").orderBy("valid_from", "run_id")
    nxt = F.lead("valid_from").over(w2)
    return intervals.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


@register(
    "merge_upsert_orders",
    """
    WITH base AS (
      SELECT o_orderkey,
             o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(FLOOR((cents * 11 + 5) / 10.0) AS BIGINT) AS cents
      FROM base WHERE o_orderkey % 7 = 0
    ), inserts AS (
      SELECT -o_orderkey - 1 AS o_orderkey,
             'N' AS o_orderstatus, cents
      FROM base WHERE o_orderkey % 13 = 0
    ), delta AS (
      SELECT * FROM updates UNION ALL SELECT * FROM inserts
    ), merged AS (
      SELECT COALESCE(d.o_orderstatus, b.o_orderstatus) AS status,
             COALESCE(d.cents, b.cents) AS cents,
             CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                  WHEN d.o_orderkey IS NULL THEN 'keep'
                  ELSE 'update' END AS action
      FROM base b FULL OUTER JOIN delta d
        ON b.o_orderkey = d.o_orderkey
    )
    SELECT status AS o_orderstatus, action,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 2) AS total_price
    FROM merged GROUP BY status, action
    """,
    doc="MERGE INTO semantics as a co-partitioned full-outer join: a "
    "deterministic delta batch (10%% price-bumped updates + key-shifted "
    "inserts) folds into the base snapshot; matched rows update, "
    "unmatched delta rows insert, the rest carry over — summarized per "
    "(status, action). Money flows as integer cents so the 10%% bump "
    "is half-up-rounded identically on both engines. On a lakehouse "
    "this is exactly the foreachBatch + MERGE upsert; the join keys "
    "co-partition, so the fold is one shuffle of each side.",
)
def merge_upsert_orders(spark, sf_dir):
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        _cents_of("o_totalprice").alias("cents"),
    )
    updates = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.floor((F.col("cents") * 11 + 5) / 10.0).cast("bigint").alias("cents"),
    )
    # negated keys are disjoint from every real (positive) orderkey at
    # ANY scale factor — a fixed additive offset would collide once
    # base keys outgrow it
    inserts = base.where(F.col("o_orderkey") % 13 == 0).select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "cents",
    )
    delta = updates.unionByName(inserts)
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.o_orderkey") == F.col("d.o_orderkey"), "full").select(
        F.coalesce("d.o_orderstatus", "b.o_orderstatus").alias("status"),
        F.coalesce("d.cents", "b.cents").alias("cents"),
        F.when(F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("d.o_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return merged.groupBy("status", "action").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("cents").cast("double") / 100, 2).alias("total_price"),
    ).select(
        F.col("status").alias("o_orderstatus"), "action", "n_orders",
        "total_price",
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH src AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    ), ordered AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM src
    ), runs AS (
      SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ), intervals AS (
      SELECT user_id, event_type AS state, run_id,
             MIN(ts) AS valid_from
      FROM runs GROUP BY user_id, event_type, run_id
    ), dim AS (
      SELECT user_id, state, valid_from,
             LEAD(valid_from) OVER
               (PARTITION BY user_id ORDER BY valid_from, run_id)
               AS valid_to
      FROM intervals
    )
    SELECT p.event_id, p.user_id, p.ts,
           d.state AS state_at_purchase,
           d.valid_from AS state_since
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
         AND p.ts >= d.valid_from
         AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
    doc="Point-in-time (bitemporal) lookup — the SCD2 CONSUMER side: "
    "each purchase joins the state interval that was current when it "
    "happened (user equi-key + validity-range predicate, so this is a "
    "keyed join with a range filter, never a cross product). "
    "Purchases before any observed state keep NULLs via the left "
    "join. Dimension build is the scd2_user_state_intervals plan (one "
    "user_id shuffle); the probe co-partitions on the same key.",
)
def scd2_point_in_time_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    src = e.where(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    runs = src.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    ).withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    intervals = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from")
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "run_id")
    dim = intervals.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    d = dim.alias("d")
    pp = p.alias("p")
    return pp.join(
        d,
        (F.col("p.user_id") == F.col("d.user_id"))
        & (F.col("p.ts") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("p.ts") < F.col("d.valid_to"))),
        "left",
    ).select(
        "p.event_id",
        "p.user_id",
        "p.ts",
        F.col("d.state").alias("state_at_purchase"),
        F.col("d.valid_from").alias("state_since"),
    )


@register(
    "cdc_changelog_net_effect",
    """
    WITH log AS (
      SELECT user_id,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             ts, event_id
      FROM events
    ), ordered AS (
      SELECT user_id, op, cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM log
    ), folded AS (
      SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN op END) AS first_op,
             MAX(CASE WHEN rn = n THEN op END) AS last_op,
             MAX(CASE WHEN rn = n THEN cents END) AS last_cents,
             MAX(n) AS n_changes
      FROM ordered GROUP BY user_id
    )
    SELECT user_id, first_op, last_op,
           CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
                WHEN first_op = 'I' THEN 'I'
                WHEN last_op = 'D' THEN 'D'
                ELSE 'U' END AS net_op,
           CASE WHEN last_op <> 'D' THEN last_cents END
             AS net_value_cents,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM folded
    """,
    doc="Changelog compaction (the Debezium -> lakehouse-MERGE "
    "pre-stage): fold each key's ordered I/U/D change sequence into "
    "ONE net operation — I..D cancels to NONE, I..U stays an insert "
    "carrying the last image, U/D-origin sequences net to update or "
    "delete. Events map deterministically (signup=I, error=D, "
    "else U; payload = exact cents). Applying the net row per key "
    "downstream is equivalent to replaying the whole log — this is "
    "what turns an O(changes) MERGE into an O(keys) one at 100 TB. "
    "One user-partitioned window pass + one per-key fold; no "
    "self-joins, no global windows.",
)
def cdc_changelog_net_effect(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    cents = _cents_of("value")
    w = W.partitionBy("user_id")
    ordered = ev.select(
        "user_id",
        op.alias("op"),
        cents.alias("cents"),
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    folded = ordered.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("op"))).alias(
            "last_op"
        ),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("cents"))).alias(
            "last_cents"
        ),
        F.max("n").alias("n_changes"),
    )
    net = (
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "NONE"
        )
        .when(F.col("first_op") == "I", "I")
        .when(F.col("last_op") == "D", "D")
        .otherwise("U")
    )
    return folded.select(
        "user_id",
        "first_op",
        "last_op",
        net.alias("net_op"),
        F.when(F.col("last_op") != "D", F.col("last_cents")).alias(
            "net_value_cents"
        ),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )
