"""Event-time analytics over the `events` stream table (batch parity).

The reference has no event-time semantics at all (SURVEY.md §1.4 — the
only timestamp is an uninterpreted field, no windows/watermarks). These
queries give the engine tumbling windows, sessionization, as-of joins
and key-dedup in batch form; dsp_spark.streaming wires the identical
transforms under readStream with watermarks.

Determinism: timestamps are µs precision on both engines (ns parquet is
truncated identically), interval logic is done in integer epoch-µs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators.asof import asof_join
from dsp_spark.queries._util import cents as _cents_of, dec, dsum, t

GAP_US = 30 * 60 * 1_000_000  # 30 min session gap


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1h rollup via date_trunc (hypertable-style continuous aggregate shape).",
)
def events_hourly_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        dsum(dec("value")).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "events_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS w_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="Native F.window tumbling aggregation (same operator drives the streaming path).",
)
def events_tumbling_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n")
    )


@register(
    "events_json_extract",
    """
    SELECT event_id, event_type, CAST(props ->> '$.k' AS INTEGER) AS k
    FROM events
    """,
    doc="JSON property extraction from the props column (semi-structured surface).",
)
def events_json_extract(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "events_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, event_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    doc="Sessionization: 30-min-gap split via lag + running sum, then per-session aggregate. "
    "One shuffle on user_id; session_window(ts, gap) is the streaming twin.",
)
def events_sessionize(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_s = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > GAP_US), 1
    ).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id", new_s.alias("new_s"))
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Keyed dedup keeping the newest record (dropDuplicates-with-order semantics).",
)
def latest_event_per_user(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "asof_join_event_order",
    """
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
    doc="As-of (backward) join: latest order at or before each event. Implemented with the "
    "union+last_value merge (one shuffle, no row explosion) — not the O(n*m) oracle form.",
)
def asof_join_event_order(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    joined = asof_join(
        ev,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
    )
    return joined.filter(F.col("o_orderkey").isNotNull()).select(
        "event_id", "user_id", "ts", "o_orderkey", "o_orderdate"
    )


def _asof_click_purchase(spark, sf_dir, direction):
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="user_id",
        right_on="p_user",
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_event_id", "p_ts"],
        tie_break="p_event_id",
        direction=direction,
    )
    return joined.filter(F.col("p_event_id").isNotNull()).select(
        "event_id", "user_id", "ts", "p_event_id", "p_ts"
    )


@register(
    "asof_join_forward_purchase",
    """
    SELECT event_id, user_id, ts, p_event_id, p_ts FROM (
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS p_event_id, p.ts AS p_ts,
               ROW_NUMBER() OVER (PARTITION BY c.event_id
                                  ORDER BY p.ts ASC, p.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ) WHERE rn = 1
    """,
    doc="As-of FORWARD join (kdb/merge_asof direction='forward'): the "
    "earliest purchase at or after each click per user — forward "
    "attribution. Same union+running-fill merge as backward over the "
    "reversed sort: one shuffle, no row explosion; the oracle's "
    "theta-join form is the O(n*m) shape this operator exists to "
    "avoid. Ties on ts resolve to the max event_id in every direction.",
)
def asof_join_forward_purchase(spark, sf_dir):
    return _asof_click_purchase(spark, sf_dir, "forward")


@register(
    "asof_join_nearest_purchase",
    """
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    b AS (
        SELECT event_id, p_event_id, p_ts FROM (
            SELECT c.event_id, p.event_id AS p_event_id, p.ts AS p_ts,
                   ROW_NUMBER() OVER (PARTITION BY c.event_id
                                      ORDER BY p.ts DESC, p.event_id DESC) AS rn
            FROM c JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
        ) WHERE rn = 1
    ), f AS (
        SELECT event_id, p_event_id, p_ts FROM (
            SELECT c.event_id, p.event_id AS p_event_id, p.ts AS p_ts,
                   ROW_NUMBER() OVER (PARTITION BY c.event_id
                                      ORDER BY p.ts ASC, p.event_id DESC) AS rn
            FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
        ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN f.p_event_id IS NULL THEN b.p_event_id
                WHEN b.p_event_id IS NULL THEN f.p_event_id
                WHEN epoch_us(c.ts) - epoch_us(b.p_ts)
                     <= epoch_us(f.p_ts) - epoch_us(c.ts)
                THEN b.p_event_id ELSE f.p_event_id END AS p_event_id,
           CASE WHEN f.p_event_id IS NULL THEN b.p_ts
                WHEN b.p_event_id IS NULL THEN f.p_ts
                WHEN epoch_us(c.ts) - epoch_us(b.p_ts)
                     <= epoch_us(f.p_ts) - epoch_us(c.ts)
                THEN b.p_ts ELSE f.p_ts END AS p_ts
    FROM c
    LEFT JOIN b ON b.event_id = c.event_id
    LEFT JOIN f ON f.event_id = c.event_id
    WHERE COALESCE(b.p_event_id, f.p_event_id) IS NOT NULL
    """,
    doc="As-of NEAREST join (merge_asof direction='nearest'): the "
    "purchase closest in time to each click, ties resolving backward. "
    "Both directional fills run over ONE union — Spark shuffles the "
    "click+purchase rows once and sorts the partition twice "
    "(plan-asserted single exchange in tests/test_asof_directions.py); distance "
    "compares exact integer microseconds, never float time.",
)
def asof_join_nearest_purchase(spark, sf_dir):
    return _asof_click_purchase(spark, sf_dir, "nearest")


@register(
    "event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    doc="Per-user event-type transition matrix via LAG: one shuffle on "
    "user_id for the window, then a tiny re-agg — the funnel/Markov "
    "building block.",
)
def event_transitions(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "window_function_surface",
    """
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Full ranking/analytic window surface (row_number/rank/dense_rank/"
    "ntile/percent_rank/cume_dist/lag/lead/first_value/running frame sum) "
    "in ONE window spec — a single shuffle+sort serves all ten functions.",
)
def window_function_surface(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("rn"),
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.sum(dec("o_totalprice")).over(wrun).cast("double").alias("running_total"),
    )


@register(
    "events_range_join_pairs",
    """
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_id <> b.event_id
    """,
    doc="Range join: same-user event pairs within a 5-minute follow "
    "window, via bucketed interval blocking (operators/rangejoin.py): "
    "join on (user, 300s time cell) with the left side exploded to its "
    "cell and the next, so candidates are bounded to adjacent cells and "
    "a hot user shards across cells instead of serializing one task. "
    "Each qualifying pair is found exactly once (cells differ by <= 1), "
    "so no dedup pass. 1.5x faster than the band-filter equi-join even "
    "at sf0.1; the gap widens with key skew.",
)
def events_range_join_pairs(spark, sf_dir):
    from dsp_spark.operators.rangejoin import bucketed_interval_pairs

    e = t(spark, sf_dir, "events")
    return bucketed_interval_pairs(
        e, key="user_id", ts="ts", id_col="event_id", window_seconds=300
    )


@register(
    "events_multigrain_rollup",
    """
    SELECT date_trunc('day', ts) AS day_bucket,
           CASE WHEN GROUPING(hour_bucket) = 0 THEN hour_bucket END AS hour_bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM (SELECT ts, date_trunc('hour', ts) AS hour_bucket, event_type, value
          FROM events)
    GROUP BY GROUPING SETS ((date_trunc('day', ts), hour_bucket, event_type),
                            (date_trunc('day', ts), event_type))
    """,
    doc="Hypertable-style multi-granularity rollup: hourly and daily "
    "aggregates for every event type in ONE pass (grouping sets => one "
    "Expand + one shuffle instead of two scans of a 100 TB table).",
)
def events_multigrain_rollup(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day_bucket"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        "event_type",
        "value",
    )
    e.createOrReplaceTempView("events_buckets")
    return spark.sql(
        """
        SELECT day_bucket,
               CASE WHEN GROUPING(hour_bucket) = 0 THEN hour_bucket END AS hour_bucket,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events_buckets
        GROUP BY GROUPING SETS ((day_bucket, hour_bucket, event_type),
                                (day_bucket, event_type))
        """
    )


_SLIDE_US = 5 * 60 * 1_000_000  # 5 min slide
_DUR_US = 10 * 60 * 1_000_000  # 10 min window


@register(
    "events_sliding_window",
    f"""
    SELECT make_timestamp((epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
                          - k * {_SLIDE_US}) AS w_start,
           make_timestamp((epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
                          - k * {_SLIDE_US} + {_DUR_US}) AS w_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events, generate_series(0, 1) AS g(k)
    GROUP BY 1, 2
    """,
    doc="Sliding windows (10 min window, 5 min slide) via native F.window "
    "— each event lands in duration/slide = 2 windows; Spark's Expand "
    "does the 2x fan-out before ONE shuffle on the window key. The same "
    "operator runs under readStream with a watermark "
    "(streaming/stateful.py).",
)
def events_sliding_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum(dec("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_funnel_conversion",
    """
    WITH s1 AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS vt
        FROM events
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > vt THEN ts END)
                      OVER (PARTITION BY user_id) AS ct
        FROM s1
    ), s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > ct THEN ts END)
                      OVER (PARTITION BY user_id) AS pt
        FROM s2
    )
    SELECT user_id,
           bool_or(vt IS NOT NULL) AS reached_view,
           bool_or(ct IS NOT NULL) AS reached_click,
           bool_or(pt IS NOT NULL) AS reached_purchase
    FROM s3 GROUP BY user_id
    """,
    doc="Ordered funnel (view -> click -> purchase) per user: each stage "
    "counts only if it happens strictly after the previous stage's first "
    "hit. Three chained window passes + final agg all share the user_id "
    "partitioning, so the whole funnel costs ONE shuffle (the plan shows "
    "a single Exchange; the agg's required distribution is already "
    "satisfied). At 100 TB: no joins, no driver state — just per-key "
    "window mins.",
)
def events_funnel_conversion(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "vt", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "ct",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("vt")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "pt",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("ct")), F.col("ts"))
        ).over(w),
    )
    return s3.groupBy("user_id").agg(
        F.max(F.col("vt").isNotNull()).alias("reached_view"),
        F.max(F.col("ct").isNotNull()).alias("reached_click"),
        F.max(F.col("pt").isNotNull()).alias("reached_purchase"),
    )


@register(
    "events_retention_cohorts",
    """
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), coh AS (
        SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM act
    )
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(day - cohort_day AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM coh
    WHERE day - cohort_day <= 7
    GROUP BY CAST(cohort_day AS TIMESTAMP), day_offset
    """,
    doc="Retention cohorts: users grouped by first-active day, counted on "
    "each of the next 7 days they return. One user_id-keyed agg builds "
    "the bounded per-user day set (<=31 elements, with map-side partial "
    "agg collapsing dup (user, day) pairs before the shuffle); cohort = "
    "array_min of that set, so cohort assignment costs no extra "
    "exchange. Only the tiny (cohort, offset) rollup reshuffles. Output "
    "is bounded by days^2 regardless of input scale - safe at 100 TB.",
)
def events_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.to_date("ts")).alias("days")
    )
    coh = per_user.select(
        "user_id",
        F.array_min("days").alias("cohort0"),
        F.explode("days").alias("day"),
    )
    return (
        coh.withColumn("day_offset", F.datediff("day", "cohort0").cast("int"))
        .where(F.col("day_offset") <= 7)
        .groupBy(
            F.col("cohort0").cast("timestamp").alias("cohort_day"), "day_offset"
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_anomaly_zscore",
    """
    WITH w AS (
        SELECT event_id, user_id, value,
               SUM(CAST(value AS DECIMAL(12,2)))
                   OVER (PARTITION BY user_id) AS s,
               SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
                   OVER (PARTITION BY user_id) AS s2,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ), z AS (
        SELECT event_id, user_id, value,
               round((value - CAST(s AS DOUBLE) / n) /
                     sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n),
                     6) AS zscore
        FROM w
    )
    SELECT event_id, user_id, value, zscore FROM z WHERE abs(zscore) >= 3
    """,
    doc="Per-user z-score outliers (|z| >= 3): population mean/stddev via "
    "DECIMAL window sums (sum and sum-of-squares are exact, so the "
    "double-math variance is bit-identical across engines), z computed "
    "per event in the same user_id window pass — ONE shuffle, no joins. "
    "The streaming twin keeps (n, s, s2) as per-key state.",
)
def events_anomaly_zscore(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    v = dec("value")
    s = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    n = F.count("*").over(w)
    zscore = F.round(
        (F.col("value") - s / n) / F.sqrt((s2 - s * s / n) / n), 6
    )
    return (
        ev.select("event_id", "user_id", "value", zscore.alias("zscore"))
        .filter(F.abs(F.col("zscore")) >= 3)
    )


@register(
    "timeseries_similar_users",
    """
    WITH hourly AS (
        SELECT user_id, date_trunc('day', ts) AS h,
               SUM(CAST(value AS DECIMAL(12,2))) AS v
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ), q AS (
        SELECT h, v AS qv FROM hourly WHERE user_id = 1
    ), g AS (
        SELECT e.user_id,
               COUNT(*) AS n,
               CAST(SUM(e.v) AS DOUBLE) AS sx,
               CAST(SUM(q.qv) AS DOUBLE) AS sy,
               CAST(SUM(e.v * q.qv) AS DOUBLE) AS sxy,
               CAST(SUM(e.v * e.v) AS DOUBLE) AS sxx,
               CAST(SUM(q.qv * q.qv) AS DOUBLE) AS syy
        FROM hourly e JOIN q ON e.h = q.h
        WHERE e.user_id <> 1
        GROUP BY e.user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS r
    FROM g
    WHERE n >= 14 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY r DESC, user_id LIMIT 10
    """,
    doc="Time-series similarity search (EDBT'19 shape): top-10 users "
    "whose daily activity series Pearson-correlates with user 1's, "
    "over co-active days (>= 14). Sums/products accumulate in DECIMAL (exact), "
    "so the correlation is one engine-identical double formula at the "
    "edge; zero-variance series are filtered BEFORE the division "
    "(engines disagree on x/0). One shuffle for the daily rollup; the "
    "query series broadcasts; top-k is TakeOrderedAndProject, never a "
    "global sort. At 100 TB the same plan ranks against any broadcast "
    "reference series.",
)
def timeseries_similar_users(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("h")
    ).agg(F.sum(dec("value")).alias("v"))
    q = hourly.filter(F.col("user_id") == 1).select("h", F.col("v").alias("qv"))
    j = hourly.filter(F.col("user_id") != 1).join(F.broadcast(q), "h")
    g = j.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum("qv").cast("double").alias("sy"),
        F.sum(F.col("v") * F.col("qv")).cast("double").alias("sxy"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("sxx"),
        F.sum(F.col("qv") * F.col("qv")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.round(
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(varx) * F.sqrt(vary)),
        6,
    )
    return (
        g.filter((F.col("n") >= 14) & (varx > 0) & (vary > 0))
        .select("user_id", F.col("n").alias("n_days"), r.alias("r"))
        .orderBy(F.desc("r"), "user_id")
        .limit(10)
    )


@register(
    "events_rolling_1h_sum",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_sum,
           CAST(COUNT(*) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_1h_n
    FROM events
    """,
    doc="Per-user rolling 1-hour aggregate via a RANGE frame over "
    "epoch-microseconds (the hypertable moving-window shape): every "
    "event carries the exact decimal sum/count of that user's trailing "
    "hour, ties included. One shuffle on user_id; the frame is a "
    "sliding pointer over the partition-sorted run, not a self-join — "
    "O(n) per partition at any scale.",
)
def events_rolling_1h_sum(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("rolling_1h_sum"),
        F.count("*").over(w).alias("rolling_1h_n"),
    )


@register(
    "events_windowed_topk_types",
    """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS w_start, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT w_start, event_type, n, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT w_start, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY w_start
                                  ORDER BY n DESC, event_type) AS rnk
        FROM c
    ) WHERE rnk <= 3
    """,
    doc="Windowed heavy hitters: top-3 event types per hourly window. "
    "The count agg reduces to (window, type) cardinality before the "
    "ranking window touches anything, so the rank sort runs on a "
    "bounded aggregate, never on raw events — the windowed top-k shape "
    "that stays cheap at any input scale.",
)
def events_windowed_topk_types(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("hour", "ts").alias("w_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("w_start").orderBy(F.desc("n"), "event_type")
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("w_start", "event_type", "n", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "events_journey_paths",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, n, rnk FROM (
        SELECT path, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INTEGER)
                 AS rnk
        FROM (
            SELECT event_type || '>' || e2 || '>' || e3 AS path,
                   COUNT(*) AS n
            FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
              AND event_type IS NOT NULL
            GROUP BY 1
        )
    ) WHERE rnk <= 10
    """,
    doc="Sequence mining: top-10 three-step user journeys. Per-user "
    "lead() windows build path trigrams with ONE shuffle on user_id "
    "(deterministic ts, event_id ordering) and the path count partial-"
    "aggregates map-side; the global rank runs on the tiny path-count "
    "table (at most |event_types|^3 rows), never on raw events, with a "
    "total tie-break for cross-engine determinism. The funnel/retention "
    "layer's exploratory sibling: which paths actually happen, before "
    "you pick one to funnel.",
)
def events_journey_paths(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counts = (
        seq.select(
            # F.concat (not concat_ws): NULL-propagating like the oracle's
            # `||`, so a NULL event_type drops the row in both engines
            # instead of concat_ws silently emitting a truncated "e2>e3"
            F.concat("event_type", F.lit(">"), "e2", F.lit(">"), "e3").alias(
                "path"
            )
        )
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    wr = W.orderBy(F.desc("n"), "path")
    return (
        counts.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("path", "n", "rnk")
    )


@register(
    "events_lateness_audit",
    """
    WITH m AS (
        SELECT user_id, ts,
               max(ts) OVER (PARTITION BY user_id
                             ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS high_water
        FROM events
    )
    SELECT CAST(length(bin(CAST(date_diff('second', ts, high_water) AS BIGINT) + 1))
                AS INTEGER) AS lateness_bucket,
           COUNT(*) AS n_events,
           CAST(MAX(date_diff('second', ts, high_water)) AS BIGINT) AS max_lag_s
    FROM m
    GROUP BY 1
    """,
    doc="Late-data audit: per-user high-watermark (running max ts in "
    "arrival order = event_id) vs event time, bucketed by power-of-2 "
    "lateness seconds — the histogram that tells you what watermark "
    "delay a streaming job needs before you deploy it. One shuffle "
    "(user window), integer bit-length buckets (no float log), tiny "
    "output.",
)
def events_lateness_audit(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    lag_s = (
        F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts")
    ).cast("long")
    return (
        e.select(lag_s.alias("lag_s"))
        .select(
            F.length(F.bin(F.col("lag_s") + 1)).cast("int").alias(
                "lateness_bucket"
            ),
            "lag_s",
        )
        .groupBy("lateness_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.max("lag_s").alias("max_lag_s"),
        )
    )


@register(
    "events_audience_overlap",
    """
    WITH tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
        SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1
    ), inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           round(CAST(n_both AS DOUBLE)
                 / (sa.n + sb.n - n_both), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
    """,
    doc="Audience overlap: Jaccard similarity of user sets per "
    "event-type pair. The (type, user) relation distinct-reduces "
    "before the self-join, the join shuffles on user_id, and the "
    "output is bounded by |types|^2 — audience-segmentation math whose "
    "quadratic term lands on the type dictionary, not the events. The "
    "same shape computes source or language overlap on documents.",
)
def events_audience_overlap(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.alias("a").hint("shuffle_hash")
    b = tu.alias("b").hint("shuffle_hash")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


_OHLC_US = 21_600_000_000  # 6-hour buckets in epoch-microseconds


@register(
    "events_ohlc_resample",
    f"""
    WITH b AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // {_OHLC_US}) * {_OHLC_US})
               AS w_start,
             ts, event_id, value
      FROM events
    ), o AS (
      SELECT event_type, w_start, value,
             row_number() OVER (PARTITION BY event_type, w_start
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, w_start
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, w_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close_v
    FROM o GROUP BY event_type, w_start
    """,
    doc="OHLC resampling (the financial/time-series downsample shape): "
    "per (event_type, 6 h bucket) first/last/min/max of value. "
    "Open/close are argmin/argmax by (ts, event_id) expressed as "
    "min/max over a (ts, event_id, value) struct — ONE hash aggregate "
    "with map-side partials, no window pass over raw events (the "
    "oracle's row_number formulation is the semantic spec, not the "
    "plan). Values pass through untouched, so parity is exact.",
)
def events_ohlc_resample(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    s = F.struct("ts", "event_id", "value")
    return (
        ev.groupBy("event_type", F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(s).getField("value").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(s).getField("value").alias("close_v"),
        )
        .select(
            "event_type", F.col("w.start").alias("w_start"), "n_events",
            "open_v", "high_v", "low_v", "close_v",
        )
    )


@register(
    "events_cumulative_distinct_users",
    """
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), d AS (
      SELECT first_day, COUNT(*) AS n_new FROM fs GROUP BY first_day
    )
    SELECT CAST(first_day AS TIMESTAMP) AS day,
           CAST(n_new AS BIGINT) AS new_users,
           CAST(SUM(n_new) OVER (ORDER BY first_day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM d
    """,
    doc="Cumulative distinct users per day — the growth-curve metric. "
    "COUNT(DISTINCT) over a growing window is quadratic; the scalable "
    "identity is first-seen-day per user (one user_id agg) then a "
    "running sum over the tiny daily table. Two bounded aggregates "
    "replace an unbounded distinct window — the required rewrite at "
    "100 TB.",
)
def events_cumulative_distinct_users(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = fs.groupBy("first_day").agg(F.count("*").alias("n_new"))
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, 0)
    return d.select(
        F.col("first_day").cast("timestamp").alias("day"),
        F.col("n_new").cast("bigint").alias("new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "events_twap_per_user",
    """
    WITH seg AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v100,
             (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_us(ts)) // 1000000 AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_s) AS BIGINT) AS covered_s,
           CAST(CAST(SUM(v100 * dur_s) AS BIGINT) AS DOUBLE)
             / CAST(SUM(dur_s) AS BIGINT) / 100 AS twap
    FROM seg WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """,
    doc="Time-weighted average value per user (the TWAP/duty-cycle "
    "metric): each event's value holds until the next event, weighted "
    "by its holding duration in whole seconds. cents x seconds "
    "products are exact int64s well under 2^53 (so every int->double "
    "conversion is correctly rounded on both engines), and the window "
    "+ aggregate share the user_id hash key — ONE shuffle end to end. "
    "The raw-double division replaces a ROUND that could land on a "
    "terminating rational.",
)
def events_twap_per_user(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        _cents_of("value").alias("v100"),
        F.floor(
            (
                F.unix_micros(F.lead("ts").over(w))
                - F.unix_micros(F.col("ts"))
            )
            / 1000000
        ).cast("bigint").alias("dur_s"),
    )
    return (
        seg.where(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dur_s").cast("bigint").alias("covered_s"),
            (
                F.sum(F.col("v100") * F.col("dur_s")).cast("double")
                / F.sum("dur_s").cast("bigint")
                / 100
            ).alias("twap"),
        )
    )


@register(
    "events_dau_wau_mau",
    """
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), exp AS (
        SELECT user_id, day + CAST(r.range AS INTEGER) AS report_day,
               CAST(r.range AS INTEGER) AS k
        FROM pairs CROSS JOIN range(0, 30) r
    ), days AS (
        SELECT DISTINCT day FROM pairs
    )
    SELECT CAST(report_day AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT CASE WHEN k = 0 THEN user_id END) AS BIGINT)
             AS dau,
           CAST(COUNT(DISTINCT CASE WHEN k <= 6 THEN user_id END) AS BIGINT)
             AS wau,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
    FROM exp JOIN days ON exp.report_day = days.day
    GROUP BY report_day
    """,
    doc="Rolling active users (DAU / trailing-7-day WAU / trailing-"
    "30-day MAU) per observed day — the growth dashboard triple. "
    "COUNT(DISTINCT) over a sliding window is the textbook "
    "non-scalable form; the scalable identity is: distinct "
    "(user, day) pairs once (one shuffle, <= users x days rows), "
    "fan each pair out to the <= 30 report days it supports "
    "(bounded 30x multiplier on the TINY pair table, never raw "
    "events), and one distinct-agg per report day. The day spine "
    "semi-join keeps only observed days, matching the SQL twin.",
)
def events_dau_wau_mau(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    pairs = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    exp = pairs.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("k"),
        "day",
    ).select(
        "user_id", "k", F.expr("date_add(day, k)").alias("report_day")
    )
    # (user, report_day) with the smallest supporting lag replaces the
    # triple filtered COUNT(DISTINCT): min(k) == 0 <=> active that day
    # (dau), min(k) <= 6 <=> active in the trailing week (wau), and the
    # group existing at all is the trailing-30-day membership (mau) —
    # one partial-agg exchange instead of a 3x Expand + two-phase
    # distinct over the same fan-out.
    mk = (
        exp.join(days.withColumnRenamed("day", "report_day"), "report_day")
        .groupBy("report_day", "user_id")
        .agg(F.min("k").alias("min_k"))
    )
    return mk.groupBy(
        F.col("report_day").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("min_k") == 0).cast("int")).cast("bigint").alias("dau"),
        F.sum((F.col("min_k") <= 6).cast("int")).cast("bigint").alias("wau"),
        F.count("*").cast("bigint").alias("mau"),
    )


@register(
    "events_funnel_time_to_convert",
    """
    WITH s1 AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS vt
        FROM events
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > vt THEN ts END)
                      OVER (PARTITION BY user_id) AS ct
        FROM s1
    ), s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > ct THEN ts END)
                      OVER (PARTITION BY user_id) AS pt
        FROM s2
    ), per_user AS (
        SELECT user_id,
               CAST((epoch_us(MAX(ct)) - epoch_us(MAX(vt))) // 1000000
                    AS BIGINT) AS s_view_click,
               CAST((epoch_us(MAX(pt)) - epoch_us(MAX(ct))) // 1000000
                    AS BIGINT) AS s_click_purchase
        FROM s3 GROUP BY user_id
    )
    SELECT CAST(COUNT(s_view_click) AS BIGINT) AS n_clicked,
           quantile_cont(s_view_click, 0.50) AS p50_view_click_s,
           quantile_cont(s_view_click, 0.90) AS p90_view_click_s,
           CAST(COUNT(s_click_purchase) AS BIGINT) AS n_purchased,
           quantile_cont(s_click_purchase, 0.50) AS p50_click_purchase_s,
           quantile_cont(s_click_purchase, 0.90) AS p90_click_purchase_s
    FROM per_user
    """,
    doc="Funnel latency: median/p90 seconds between the funnel's "
    "ordered first-hits (view->click, click->purchase) — the "
    "conversion-speed report next to events_funnel_conversion's "
    "reach counts. Same ONE-shuffle funnel shape (chained user_id "
    "window mins + per-user agg); stage gaps are exact integer "
    "second diffs of epoch-µs, and the exact interpolated "
    "percentiles run on the per-user (not per-event) table. The "
    "final 1-row percentile is a single-group agg (partial-agg "
    "reduced), not a window.",
)
def events_funnel_time_to_convert(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "vt", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "ct",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("vt")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "pt",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("ct")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        (
            (F.unix_micros(F.max("ct")) - F.unix_micros(F.max("vt")))
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("s_view_click"),
        (
            (F.unix_micros(F.max("pt")) - F.unix_micros(F.max("ct")))
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("s_click_purchase"),
    )
    # one percentile buffer per stage-gap column, each queried at both
    # points (array form) instead of two buffers per column
    both = F.array(F.lit(0.50), F.lit(0.90))
    g = per_user.agg(
        F.count("s_view_click").cast("bigint").alias("n_clicked"),
        F.percentile("s_view_click", both).alias("_vc"),
        F.count("s_click_purchase").cast("bigint").alias("n_purchased"),
        F.percentile("s_click_purchase", both).alias("_cp"),
    )
    return g.select(
        "n_clicked",
        F.element_at("_vc", 1).alias("p50_view_click_s"),
        F.element_at("_vc", 2).alias("p90_view_click_s"),
        "n_purchased",
        F.element_at("_cp", 1).alias("p50_click_purchase_s"),
        F.element_at("_cp", 2).alias("p90_click_purchase_s"),
    )


@register(
    "events_hourly_seasonality",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(dayofweek(ts) AS INTEGER) AS dow,
               CAST(hour(ts) AS INTEGER) AS hod,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT dow, hod,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / COUNT(*)
             AS avg_per_day
    FROM daily GROUP BY dow, hod
    """,
    doc="Traffic seasonality profile: average events per "
    "(day-of-week, hour-of-day) cell — what capacity planning and "
    "anomaly baselines key on. Two bounded aggregates (daily cells, "
    "then the 7x24 profile); the average is one int64 division so "
    "both engines emit identical doubles. DuckDB dayofweek is "
    "0=Sunday; Spark dayofweek is 1=Sunday — bridged by emitting "
    "Spark's value minus 1.",
)
def events_hourly_seasonality(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.col("ts").cast("date").alias("day"),
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(F.count("*").alias("n"))
    )
    return daily.groupBy("dow", "hod").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_days"),
        (F.sum("n").cast("double") / F.count("*")).alias("avg_per_day"),
    )


@register(
    "events_attribution_last_touch",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT COALESCE(touch, 'none') AS attributed_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch conversion attribution: each purchase credits the "
    "user's most recent preceding NON-purchase event (purchases with "
    "no prior touch credit 'none') — the marketing-analytics op every "
    "event pipeline ships, and the window-function shape (conditional "
    "last_value IGNORE NULLS over an unbounded-preceding frame) that "
    "separates engines with real window semantics from rollup-only "
    "ones. One user-partitioned window (bounded per-user cardinality, "
    "no global window) + one tiny attribute-grain agg; ties inside a "
    "microsecond break on event_id for cross-engine determinism.",
)
def events_attribution_last_touch(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    seq = e.select("event_type", touch.alias("touch"))
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("attributed_type"))
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
    )


@register(
    "orders_open_backlog_daily",
    """
    WITH closes AS (
        SELECT l_orderkey AS okey, MAX(l_shipdate) AS close_day
        FROM lineitem GROUP BY 1
    ),
    deltas AS (
        SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
        UNION ALL
        SELECT CAST(c.close_day AS DATE) AS day, -1 AS delta
        FROM orders o JOIN closes c ON o.o_orderkey = c.okey
    ),
    daily AS (
        SELECT day,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_opened,
               CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_closed,
               SUM(delta) AS net
        FROM deltas GROUP BY day
    )
    SELECT day, n_opened, n_closed,
           CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS backlog
    FROM daily
    """,
    doc="Open-order backlog curve (interval counting): every order "
    "contributes +1 at o_orderdate and -1 at its last lineitem "
    "ship date (the synthetic schema's completion timestamp); the running sum over the day spine is the number "
    "of orders in flight on each day — the WIP/backlog metric an "
    "operations dashboard tracks, and the scalable alternative to an "
    "interval point-in-time join (which would touch every (day, "
    "open-order) pair). One per-order partial agg + one fact-fact "
    "co-partitioned join on orderkey + one DAY-grain cumsum — the "
    "single-partition window runs over the ~2.4k-row calendar spine "
    "(audited in the bounded global-window allowlist), never over "
    "order rows.",
)
def orders_open_backlog_daily(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    closes = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("close_day")
    )
    opens = o.select(F.col("o_orderdate").cast("date").alias("day"), F.lit(1).alias("delta"))
    closed = (
        o.join(closes, o.o_orderkey == closes.okey)
        .select(F.col("close_day").cast("date").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = (
        opens.unionAll(closed)
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_opened"),
            F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_closed"),
            F.sum("delta").alias("net"),
        )
    )
    return daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("net").over(W.orderBy("day")).cast("bigint").alias("backlog"),
    )


@register(
    "events_ewma_last16",
    """
    WITH last16 AS (
      SELECT user_id, ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           MAX(ts) AS last_ts,
           CAST(SUM(cents * (CAST(1 AS BIGINT) << (16 - rn))) AS DOUBLE)
             / CAST(SUM(CAST(1 AS BIGINT) << (16 - rn)) AS DOUBLE)
             AS ewma_cents
    FROM last16 WHERE rn <= 16
    GROUP BY user_id
    """,
    doc="Per-user exponentially-weighted recency score (half-life = one "
    "event) over each user's last 16 events — the batch twin of a "
    "streaming decayed counter. Exact across engines by construction: "
    "weights are integer powers of two (shiftleft, no float pow), the "
    "numerator/denominator are BIGINT sums of cents x weight, and the "
    "single double division at the end is IEEE-identical on both "
    "engines. At 100 TB the row_number window is partitioned by "
    "user_id (never global) and the rn<=16 filter bounds per-user "
    "state before the one per-user reduce.",
)
def events_ewma_last16(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    cents = _cents_of("value")
    x = (
        ev.select("user_id", "ts", "event_id", cents.alias("cents"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 16)
    )
    # python-side F.shiftleft needs a literal bit count; the SQL form
    # takes a column expression
    wt = F.expr("shiftleft(CAST(1 AS BIGINT), 16 - rn)")
    return x.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_used"),
        F.max("ts").alias("last_ts"),
        (
            F.sum(F.col("cents") * wt).cast("double")
            / F.sum(wt).cast("double")
        ).alias("ewma_cents"),
    )


@register(
    "events_resample_locf_audit",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id,
             date_trunc('hour', ts) AS hour,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), hv AS (
      SELECT user_id, hour, cents AS obs_cents FROM (
        SELECT user_id, hour, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id, hour
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(MIN(hour), MAX(hour),
                                    INTERVAL 1 HOUR)) AS hour
      FROM ev GROUP BY user_id
    ), filled AS (
      SELECT g.user_id, g.hour, hv.obs_cents,
             LAST_VALUE(hv.obs_cents IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS fill_cents
      FROM grid g LEFT JOIN hv
        ON g.user_id = hv.user_id AND g.hour = hv.hour
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN obs_cents IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_observed,
           CAST(SUM(CASE WHEN obs_cents IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gap_filled,
           CAST(SUM(fill_cents) AS BIGINT) AS filled_cents_sum
    FROM filled GROUP BY user_id
    """,
    doc="Regular-grid resampling with last-observation-carried-forward "
    "(TimescaleDB locf / Pandas asfreq-ffill shape): per user, an "
    "hourly grid from the first to the last observed hour, each gap "
    "hour filled with the most recent hourly closing value, then "
    "audited per user (grid size, observed vs filled hours, checksum "
    "of the filled series in exact cents). The grid never has leading "
    "NULLs because it starts at an observed hour — so the filled "
    "series telescopes: each observation carries its value for "
    "exactly (next observed hour - its hour) grid hours (1 for the "
    "last), making every audit column a sum over OBSERVED rows only. "
    "The plan therefore never materializes the grid at all: one "
    "per-(user,hour) map-side reduce (max struct = last event of the "
    "hour), one user-partitioned lead window at observed-hour grain, "
    "one groupBy on the same key — grid rows = users x span-hours "
    "exist only arithmetically, and nothing is globally sorted.",
)
def events_resample_locf_audit(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.date_trunc("hour", "ts").alias("hour"),
        _cents_of("value").alias("cents"),
    )
    # last event of the hour == max (ts, event_id) struct (event_id is
    # the unique tiebreak, so the carried cents are deterministic) —
    # a partial aggregate instead of an event-grain window shuffle
    hv = ev.groupBy("user_id", "hour").agg(
        F.max(F.struct("ts", "event_id", "cents"))["cents"].alias("obs_cents")
    )
    wl = W.partitionBy("user_id").orderBy("hour")
    spans = hv.withColumn(
        "span",
        F.coalesce(
            (
                (
                    F.unix_timestamp(F.lead("hour").over(wl))
                    - F.unix_timestamp("hour")
                )
                / 3600
            ).cast("bigint"),
            F.lit(1).cast("bigint"),
        ),
    )
    return spans.groupBy("user_id").agg(
        F.sum("span").cast("bigint").alias("n_hours"),
        F.count("*").cast("bigint").alias("n_observed"),
        (F.sum("span") - F.count("*")).cast("bigint").alias("n_gap_filled"),
        F.sum(F.col("obs_cents") * F.col("span"))
        .cast("bigint")
        .alias("filled_cents_sum"),
    )


@register(
    "events_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
    doc="Consecutive-day activity streaks per user via the classic "
    "gaps-and-islands anchor (day minus per-user row_number is "
    "constant within a run of consecutive days): streak count, "
    "longest streak, total active days. All date/int arithmetic, "
    "bit-exact. Day-grain distinct collapses the event stream before "
    "any window, and every window is user-partitioned — at 100 TB the "
    "heavy relation shrinks to users x active-days in the first "
    "exchange and nothing touches event grain again.",
)
def events_activity_streaks(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    isl = days.withColumn(
        "anchor", F.expr("date_sub(day, CAST(row_number() OVER "
                         "(PARTITION BY user_id ORDER BY day) AS INT))")
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("n_active_days"),
    )


@register(
    "events_user_lifecycle_states",
    """
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ), seq AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM uw
    ), mx AS (SELECT MAX(wk) AS max_wk FROM uw),
    states AS (
      SELECT wk, CASE WHEN prev_wk IS NULL THEN 'new'
                      WHEN prev_wk = wk - 7 THEN 'retained'
                      ELSE 'resurrected' END AS state
      FROM seq
      UNION ALL
      SELECT wk + 7 AS wk, 'churned' AS state
      FROM seq, mx
      WHERE (next_wk IS NULL OR next_wk > wk + 7) AND wk + 7 <= mx.max_wk
    )
    SELECT wk, state, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM states GROUP BY 1, 2
    """,
    doc="Weekly growth accounting (the new / retained / resurrected / "
    "churned ledger): per user-week, classify by the gap to the "
    "previous active week; churn events are emitted into the week "
    "AFTER the last active one (capped at the corpus max week so no "
    "phantom future rows). Pure date arithmetic on the distinct "
    "(user, week) relation — one event-grain distinct, then "
    "user-partitioned lag/lead and a week x 4-state rollup. The "
    "week-grain output is bounded by calendar, not data.",
)
def events_user_lifecycle_states(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    mx = uw.agg(F.max("wk").alias("max_wk"))
    active = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), F.lit("new"))
        .when(F.col("prev_wk") == F.date_sub("wk", 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("state"),
    )
    churned = (
        seq.join(F.broadcast(mx))
        .where(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.date_add("wk", 7))
            )
            & (F.date_add("wk", 7) <= F.col("max_wk"))
        )
        .select(F.date_add("wk", 7).alias("wk"), F.lit("churned").alias("state"))
    )
    return (
        active.unionByName(churned)
        .groupBy("wk", "state")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


@register(
    "events_attribution_linear_milli",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS grp
      FROM events
    ), purchases AS (
      SELECT user_id, grp - 1 AS conv FROM seq WHERE event_type = 'purchase'
    ), touches AS (
      SELECT user_id, grp AS conv, event_type, ts, event_id
      FROM seq WHERE event_type <> 'purchase'
    ), paths AS (
      SELECT t.event_type,
             COUNT(*) OVER (PARTITION BY t.user_id, t.conv) AS k,
             ROW_NUMBER() OVER (PARTITION BY t.user_id, t.conv
                                ORDER BY t.ts DESC, t.event_id DESC)
               AS rdesc
      FROM purchases p
      JOIN touches t ON p.user_id = t.user_id AND p.conv = t.conv
    ), credits AS (
      SELECT event_type,
             (1000 // k)
               + CASE WHEN rdesc = 1 THEN 1000 % k ELSE 0 END AS credit
      FROM paths
      UNION ALL
      SELECT 'none' AS event_type, 1000 AS credit
      FROM purchases p
      LEFT JOIN (SELECT DISTINCT user_id, conv FROM touches) t
        ON p.user_id = t.user_id AND p.conv = t.conv
      WHERE t.user_id IS NULL
    )
    SELECT event_type AS attributed_type,
           CAST(COUNT(*) AS BIGINT) AS n_credited,
           CAST(SUM(credit) AS BIGINT) AS milli_credits
    FROM credits GROUP BY 1
    """,
    doc="Linear multi-touch attribution with integer-exact milli-credit "
    "apportionment: every purchase distributes exactly 1000 "
    "milli-credits equally across the non-purchase touches since the "
    "user's previous purchase (floor(1000/k) each, remainder to the "
    "most recent touch — the same largest-remainder discipline as "
    "mixture_budget_allocation, so credits always conserve to "
    "1000 x conversions with zero float ops). Touch-free purchases "
    "credit 'none'. Complements events_attribution_last_touch: path "
    "segmentation is a purchase-counting running sum, the path join is "
    "user-co-partitioned, and all windows are user-bounded.",
)
def events_attribution_linear_milli(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    grp = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    seq = e.select("user_id", "event_type", "ts", "event_id", grp.alias("grp"))
    purchases = seq.where(F.col("event_type") == "purchase").select(
        "user_id", (F.col("grp") - 1).alias("conv")
    )
    touches = seq.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("grp").alias("conv"), "event_type", "ts", "event_id"
    )
    joined = purchases.join(touches, ["user_id", "conv"])
    wk = W.partitionBy("user_id", "conv")
    paths = joined.select(
        "event_type",
        F.count("*").over(wk).alias("k"),
        F.row_number()
        .over(wk.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rdesc"),
    )
    credit = F.expr("1000 DIV k") + F.when(
        F.col("rdesc") == 1, F.expr("1000 % k")
    ).otherwise(0)
    credited = paths.select("event_type", credit.alias("credit"))
    unmatched = (
        purchases.join(
            touches.select("user_id", "conv").distinct(),
            ["user_id", "conv"],
            "left_anti",
        )
        .select(
            F.lit("none").alias("event_type"), F.lit(1000).alias("credit")
        )
    )
    return (
        credited.unionByName(unmatched)
        .groupBy(F.col("event_type").alias("attributed_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_credited"),
            F.sum("credit").cast("bigint").alias("milli_credits"),
        )
    )


@register(
    "events_bounce_rate_by_type",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), ordered AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM numbered
    ), sessions AS (
      SELECT user_id, session_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             COUNT(*) AS n_events
      FROM ordered GROUP BY user_id, session_id
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
    FROM sessions GROUP BY entry_type
    """,
    doc="Bounce rate by session entry type: 30-min-gap sessionization "
    "(identical segmentation to events_sessionize), each session "
    "keyed by its FIRST event's type (rank-1 row on the (ts, event_id) "
    "total order — deterministic under microsecond ties), then the "
    "share of single-event sessions per entry type. The "
    "product-analytics number that says which entry point loses "
    "users immediately. One user-partitioned window pass, one "
    "session-grain aggregate, one type-grain rollup.",
)
def events_bounce_rate_by_type(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_s = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > GAP_US), 1
    ).otherwise(0)
    sessions = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s")
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "session_id").orderBy(
                    "ts", "event_id"
                )
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.max(
                F.when(F.col("rn") == 1, F.col("event_type"))
            ).alias("entry_type"),
            F.count("*").alias("n_events"),
        )
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.groupBy("entry_type").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        bounces.cast("bigint").alias("n_bounces"),
        (bounces.cast("double") / F.count("*").cast("double")).alias(
            "bounce_rate"
        ),
    )


@register(
    "events_level_shift_detect",
    """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), d AS (
        SELECT event_type, hour_start, n,
               CAST(s_cents AS DOUBLE) / n AS mean_cents,
               LAG(CAST(s_cents AS DOUBLE) / n) OVER
                   (PARTITION BY event_type ORDER BY hour_start)
                   AS prev_mean_cents
        FROM h
    )
    SELECT event_type, hour_start, n, prev_mean_cents, mean_cents,
           abs(mean_cents - prev_mean_cents) AS shift_cents
    FROM d
    WHERE prev_mean_cents IS NOT NULL
      AND abs(mean_cents - prev_mean_cents) > 9000.0
    """,
    doc="Level-shift (changepoint) detection on the per-type hourly "
    "mean-value series: consecutive-hour mean deltas beyond a 90-dollar "
    "threshold flag regime changes (the streaming-monitor alarm shape). "
    "Means are exact-int cent sums over exact counts, so the double "
    "ratio and the threshold comparison are bit-identical on both "
    "engines. One (type,hour)-keyed partial agg — grain is hours x "
    "types, independent of event count — then a per-type lag window "
    "over that tiny series. At 100 TB the window input is still only "
    "24*365 rows per type per year.",
)
def events_level_shift_detect(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cents = _cents_of("value")
    h = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.sum(cents).cast("bigint").alias("s_cents"),
        F.count("*").cast("bigint").alias("n"),
    )
    mean = F.col("s_cents").cast("double") / F.col("n")
    w = W.partitionBy("event_type").orderBy("hour_start")
    d = h.select(
        "event_type",
        "hour_start",
        "n",
        F.lag(mean).over(w).alias("prev_mean_cents"),
        mean.alias("mean_cents"),
    )
    shift = F.abs(F.col("mean_cents") - F.col("prev_mean_cents"))
    return d.filter(
        F.col("prev_mean_cents").isNotNull() & (shift > 9000.0)
    ).select(
        "event_type", "hour_start", "n", "prev_mean_cents", "mean_cents",
        shift.alias("shift_cents"),
    )


@register(
    "events_acf_hourly",
    """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, x,
               LAG(x, 1) OVER w AS y1,
               LAG(x, 2) OVER w AS y2,
               LAG(x, 3) OVER w AS y3
        FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), pairs AS (
        SELECT event_type, 1 AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, x, y2 FROM lagged WHERE y2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, x, y3 FROM lagged WHERE y3 IS NOT NULL
    ), s AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS acf
    FROM s
    """,
    doc="Autocorrelation of the per-type hourly event-count series at "
    "lags 1-3 (seasonality/persistence diagnostic before forecasting). "
    "Counts are exact ints; all six sufficient statistics per "
    "(type,lag) accumulate as int64 in one pass over the tiny hourly "
    "series, and the Pearson expression is the identical double "
    "formula on both engines (same shape as lineitem_numeric_corr). "
    "The event-grain work is one (type,hour) partial-agg shuffle; the "
    "lag window and the stats run on hours x types rows.",
)
def events_acf_hourly(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("x"))
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = h.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("y1"),
        F.lag("x", 2).over(w).alias("y2"),
        F.lag("x", 3).over(w).alias("y3"),
    )
    # one explode, not a 3-arm union: a union would re-derive the
    # hourly series (and rescan events) once per lag
    arms = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"), F.col(f"y{k}").alias("y")
            )
            for k in (1, 2, 3)
        ]
    )
    pairs = (
        lagged.select("event_type", "x", F.explode(arms).alias("p"))
        .filter(F.col("p.y").isNotNull())
        .select(
            "event_type",
            F.col("p.lag").alias("lag"),
            "x",
            F.col("p.y").alias("y"),
        )
    )
    s = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(n * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return s.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        "n",
        (num / den).alias("acf"),
    )


@register(
    "events_interarrival_burstiness",
    """
    WITH g AS (
        SELECT user_id,
               CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    AS DECIMAL(19,0)) AS gap
        FROM events
    ), s AS (
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(CAST(SUM(gap) AS DECIMAL(38,0)) AS DOUBLE) AS sg,
               CAST(CAST(SUM(gap * gap) AS DECIMAL(38,0)) AS DOUBLE) AS sgg
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           sg / n_gaps / 1e6 AS mean_gap_s,
           sqrt(sgg / n_gaps - (sg / n_gaps) * (sg / n_gaps))
               / (sg / n_gaps) AS cv,
           (sqrt(sgg / n_gaps - (sg / n_gaps) * (sg / n_gaps))
                - sg / n_gaps)
           / (sqrt(sgg / n_gaps - (sg / n_gaps) * (sg / n_gaps))
                + sg / n_gaps) AS burstiness
    FROM s WHERE n_gaps >= 5
    """,
    doc="Per-user inter-arrival burstiness (Goh-Barabasi B = "
    "(sigma-mu)/(sigma+mu)) and coefficient of variation over epoch-us "
    "gaps: B near 0 = Poisson-like, near 1 = bursty bots, near -1 = "
    "metronome schedulers. Gap sums and sums-of-squares accumulate as "
    "exact DECIMAL(38,0) (a us gap squared overflows int64, decimal "
    "does not), then every double is the identical expression on both "
    "engines. One user-keyed window + one user-keyed agg that share a "
    "single exchange; state per user is two decimals and a count, so "
    "the profile scales to any event volume.",
)
def events_interarrival_burstiness(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = (us - F.lag(us).over(w)).cast("decimal(19,0)")
    g = ev.select("user_id", gap.alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    s = g.groupBy("user_id").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("decimal(38,0)").cast("double").alias("sg"),
        F.sum(F.col("gap") * F.col("gap"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sgg"),
    )
    mu = F.col("sg") / F.col("n_gaps")
    sigma = F.sqrt(F.col("sgg") / F.col("n_gaps") - mu * mu)
    return s.filter(F.col("n_gaps") >= 5).select(
        "user_id",
        "n_gaps",
        (mu / 1e6).alias("mean_gap_s"),
        (sigma / mu).alias("cv"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    )


@register(
    "events_cusum_alarm",
    """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s_cents
        FROM events GROUP BY 1, 2
    ), tgt AS (
        SELECT event_type,
               CAST(SUM(s_cents) AS BIGINT) // COUNT(*) AS target
        FROM h GROUP BY event_type
    ), p AS (
        SELECT h.event_type, h.hour_start, h.s_cents,
               CAST(SUM(h.s_cents - tgt.target) OVER w AS BIGINT) AS pre
        FROM h JOIN tgt ON h.event_type = tgt.event_type
        WINDOW w AS (PARTITION BY h.event_type ORDER BY h.hour_start
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, hour_start, s_cents,
           CAST(pre - least(0, MIN(pre) OVER w2) AS BIGINT) AS cusum_cents,
           pre - least(0, MIN(pre) OVER w2) > 200000 AS alarm
    FROM p
    WINDOW w2 AS (PARTITION BY event_type ORDER BY hour_start
                  ROWS UNBOUNDED PRECEDING)
    """,
    doc="One-sided CUSUM changepoint monitor on the per-type hourly "
    "revenue series, via the closed form: the recursive "
    "S_i = max(0, S_{i-1} + d_i) equals P_i - min(P_0..P_i) for the "
    "running sum P of deviations, so the 'iterative' control chart is "
    "two stacked windows over the SAME partition key — no recursion, "
    "no UDF, one exchange. Deviations are exact ints (hourly cent "
    "sums minus the integer-floor per-type mean), so CUSUM values and "
    "the alarm comparison are bit-equal across engines. Window input "
    "is hours x types, independent of event volume; the streaming "
    "twin (cusum_stream) folds the same recurrence with one (S, min) "
    "pair of bigints per key.",
)
def events_cusum_alarm(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cents = _cents_of("value")
    # materialize the tiny hourly table once: target derivation and
    # the join would otherwise each rescan events
    h = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.sum(cents).cast("bigint").alias("s_cents")).localCheckpoint(
        eager=True
    )
    tgt = h.groupBy("event_type").agg(
        F.expr("CAST(sum(s_cents) AS BIGINT) div count(*)").alias("target")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = h.join(F.broadcast(tgt), "event_type").select(
        "event_type",
        "hour_start",
        "s_cents",
        F.sum(F.col("s_cents") - F.col("target"))
        .over(w)
        .cast("bigint")
        .alias("pre"),
    )
    # S_i = P_i - min(0, min_{j<=i} P_j): the 0 is P_0, the empty
    # prefix the ROWS frame cannot see
    cusum = F.col("pre") - F.least(F.lit(0), F.min("pre").over(w))
    return p.select(
        "event_type",
        "hour_start",
        "s_cents",
        cusum.cast("bigint").alias("cusum_cents"),
        (cusum > 200000).alias("alarm"),
    )


@register(
    "events_user_type_entropy",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    ), u AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                                   * 1e9) AS BIGINT)) AS BIGINT) AS s_nano
        FROM c GROUP BY user_id
    )
    SELECT user_id, n AS n_events, n_types,
           CAST(round((log2(CAST(n AS DOUBLE))
                       - (CAST(s_nano AS DOUBLE) / 1e9) / n) * 1e9)
                AS BIGINT) / 1e9 AS entropy_bits
    FROM u
    """,
    doc="Per-user Shannon entropy of the event-type distribution — the "
    "behavioral-predictability feature (low entropy = single-purpose "
    "bots, high = diverse organic use). Each -p*log2(p) term is the "
    "identical double on both engines (exact int count ratios), "
    "computed via the sufficient-statistic identity "
    "H = log2(n) - (sum c*log2(c))/n with each c*log2(c) term "
    "quantized to exact nano-bits before the sum — order-independent, "
    "bit-equal across engines, and ONE pass: the (user,type) count "
    "folds map-side into the per-user fold with no join back. A "
    "single-type user contributes c*log2(c) = n*log2(n) so H = 0 "
    "exactly, no epsilon needed.",
)
def events_user_type_entropy(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    # sufficient-statistic identity: H = log2(n) - (sum c*log2(c))/n;
    # each c*log2(c) term quantizes to exact nano-bits before the sum,
    # so no join back and only ONE pass over events
    term = F.round(
        F.col("c").cast("double") * F.log2(F.col("c").cast("double")) * 1e9
    ).cast("bigint")
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(term).cast("bigint").alias("s_nano"),
    )
    return u.select(
        F.col("user_id"),
        F.col("n").alias("n_events"),
        F.col("n_types"),
        # log2 is 1-ulp libm-dependent; absorb it by quantizing to an
        # exact nano-bit INTEGER then dividing (round(x, 9) itself is
        # not cross-engine stable: decimal-expansion vs multiply paths
        # disagree on ~1/150 doubles)
        (
            F.round(
                (
                    F.log2(F.col("n").cast("double"))
                    - (F.col("s_nano").cast("double") / 1e9) / F.col("n")
                )
                * 1e9
            ).cast("bigint")
            / 1e9
        ).alias("entropy_bits"),
    )


@register(
    "events_transition_entropy",
    """
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ), pc AS (
        SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY user_id, cur, nxt
    ), cc AS (
        SELECT user_id, cur, CAST(SUM(c) AS BIGINT) AS c_cur,
               CAST(SUM(CAST(round(CAST(c AS DOUBLE)
                                   * log2(CAST(c AS DOUBLE)) * 1e9)
                             AS BIGINT)) AS BIGINT) AS s_nano
        FROM pc GROUP BY user_id, cur
    ), per_cur AS (
        SELECT user_id, c_cur,
               CAST(round(CAST(c_cur AS DOUBLE)
                          * log2(CAST(c_cur AS DOUBLE)) * 1e9) AS BIGINT)
                   - s_nano AS h_nano
        FROM cc
    )
    SELECT user_id,
           CAST(SUM(c_cur) AS BIGINT) AS n_transitions,
           CAST(CAST(SUM(h_nano) AS BIGINT) AS DOUBLE) / 1e9
               / SUM(c_cur) AS entropy_rate_bits
    FROM per_cur GROUP BY user_id
    """,
    doc="Per-user Markov transition entropy rate H(next|cur) over the "
    "event-type sequence — the sequence-structure complement of "
    "events_user_type_entropy: a user can have diverse types (high "
    "unigram entropy) yet perfectly predictable ORDER (rate ~ 0), the "
    "bot signature type entropy misses. Per conditioning state, "
    "c*log2(c) terms quantize to exact nano-bits (the same "
    "sufficient-statistic identity as the unigram entry), the "
    "per-state entropies sum exactly as ints, and only the final "
    "rate divides (IEEE-exact on identical inputs; no raw libm value "
    "reaches the output). One user-partitioned lead window then two stacked "
    "aggregates reusing the user_id exchange; no join back.",
)
def events_transition_entropy(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pc = seq.groupBy("user_id", "cur", "nxt").agg(
        F.count("*").cast("bigint").alias("c")
    )
    nano = lambda c: F.round(
        c.cast("double") * F.log2(c.cast("double")) * 1e9
    ).cast("bigint")
    cc = pc.groupBy("user_id", "cur").agg(
        F.sum("c").cast("bigint").alias("c_cur"),
        F.sum(nano(F.col("c"))).cast("bigint").alias("s_nano"),
    )
    per_cur = cc.select(
        "user_id",
        "c_cur",
        (nano(F.col("c_cur")) - F.col("s_nano")).alias("h_nano"),
    )
    return per_cur.groupBy("user_id").agg(
        F.sum("c_cur").cast("bigint").alias("n_transitions"),
        # no raw transcendental survives to this expression (log2 is
        # inside the quantized terms), so the ratio is bit-identical
        # unrounded — rounding would ADD a tie-boundary hazard
        (
            F.sum("h_nano").cast("bigint").cast("double")
            / 1e9
            / F.sum("c_cur")
        ).alias("entropy_rate_bits"),
    )


@register(
    "events_mann_kendall_trend",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ), pr AS (
        SELECT a.event_type,
               CAST(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END AS BIGINT) AS sgn
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
    ), agg AS (
        SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat
        FROM pr GROUP BY event_type
    ), nd AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    )
    SELECT nd.event_type, nd.n_days,
           COALESCE(agg.s_stat, 0) AS s_stat,
           CAST((nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)) // 6
                AS BIGINT) AS var0,
           CAST(COALESCE(agg.s_stat, 0) AS DOUBLE)
               / sqrt(CAST((nd.n_days * (nd.n_days - 1)
                            * (2 * nd.n_days + 5)) // 6 AS DOUBLE))
               AS z_stat
    FROM nd LEFT JOIN agg ON nd.event_type = agg.event_type
    WHERE nd.n_days >= 2
    """,
    doc="Mann-Kendall nonparametric trend test per event type: S = sum "
    "of sign(c_j - c_i) over all ordered day pairs of the daily count "
    "series (Mann 1945, Kendall 1975) — the is-this-metric-drifting "
    "monitor that needs no distributional assumption and no "
    "least-squares fit. The pairwise enumeration runs on the "
    "calendar-grain daily table (one fact pass collapses events to "
    "type x day, materialized once), so its cost is bounded by "
    "days^2 per type — independent of event volume at any corpus "
    "size. S and the no-ties variance n(n-1)(2n+5)/6 are exact "
    "integers (the product is always divisible by 6); z is one "
    "IEEE-exact division by sqrt, bit-equal across engines. The "
    "variance omits the tie correction (documented approximation).",
)
def events_mann_kendall_trend(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # calendar-grain series, materialized once: the self-join would
    # otherwise rescan events on both sides
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
        .cast("bigint")
    )
    agg = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(F.col("a.event_type").alias("event_type"), sgn.alias("sgn"))
        .groupBy("event_type")
        .agg(F.sum("sgn").cast("bigint").alias("s_stat"))
    )
    nd = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    var0 = F.expr("(n_days * (n_days - 1) * (2 * n_days + 5)) div 6").cast(
        "bigint"
    )
    return (
        nd.join(agg, "event_type", "left")
        .fillna(0, subset=["s_stat"])
        .where(F.col("n_days") >= 2)
        .select(
            "event_type",
            "n_days",
            F.col("s_stat").cast("bigint").alias("s_stat"),
            var0.alias("var0"),
            (
                F.col("s_stat").cast("double")
                / F.sqrt(var0.cast("double"))
            ).alias("z_stat"),
        )
    )
