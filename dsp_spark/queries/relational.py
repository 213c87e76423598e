"""Relational analytics layer: aggregations, joins, windows, set ops.

The reference has no relational algebra at all (SURVEY.md §2.4 — joins,
grouped aggregation, window functions, sorts, set ops are absent from
ystre/dsp; verified against libdsp/*). This module *exposes* Spark's
native relational surface over the synthetic star schema so the engine
reaches capability parity-plus. Everything is declarative DataFrame
API → Catalyst handles pushdown/pruning/join strategy; small dims are
explicitly broadcast where we know better than the stats.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import prefix
from dsp_spark.queries._util import (
    MONEY,
    PCT,
    cents,
    dec,
    dsum,
    hilo,
    hilo_out,
    hilo_sum,
    hilo_total,
    t,
    unscale,
)

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


def _rev_units():
    """price*(1-disc) in exact integer 1e-4 currency units — the int64
    form of the decimal revenue product (see _util.cents for the exact-
    equivalence argument; terms <= ~1.1e9, hilo partial sums overflow
    only past ~1.1e12 rows per group)."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship TPC-H-Q1-style pricing summary (map-side partial agg, 6-group output).",
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # Exact int64 cent accumulation instead of per-row BigDecimal
    # (guide §1.2 step 2; the r13 elasticity pattern generalized —
    # see _util.cents/hilo). Per-row terms: qty/disc cents are tiny;
    # price cents <= ~1.1e7; disc_price units (1e-4) <= ~1.1e9;
    # charge units (1e-6) <= ~1.2e11. The product sums and the price
    # sum split at 2^23 so every partial stays in int64 past ~1.1e12
    # rows PER GROUP (>3x the hottest group's 100 TB share); qty/disc
    # plain sums overflow only past 1.8e15 / 9.2e17 rows per group.
    # Exact DECIMAL reassembly + exact unscale at the 6-row output
    # grain keeps every double bit-identical to the oracle's
    # CAST(SUM(DECIMAL...) AS DOUBLE).
    qc, pc = cents("l_quantity"), cents("l_extendedprice")
    dc, tc = cents("l_discount"), cents("l_tax")
    disc_u = pc * (100 - dc)  # 1e-4 currency units
    charge_u = disc_u * (100 + tc)  # 1e-6 currency units
    ph, pl = hilo(pc)
    dh, dl = hilo(disc_u)
    ch, cl = hilo(charge_u)
    a = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qc).alias("_sq"),
            F.sum(ph).alias("_sph"),
            F.sum(pl).alias("_spl"),
            F.sum(dh).alias("_sdh"),
            F.sum(dl).alias("_sdl"),
            F.sum(ch).alias("_sch"),
            F.sum(cl).alias("_scl"),
            F.sum(dc).alias("_sd"),
            F.count("*").alias("count_order"),
        )
    )
    sum_qty = unscale(F.col("_sq").cast("decimal(38,0)"), 2)
    sum_base = unscale(hilo_total(F.col("_sph"), F.col("_spl")), 2)
    sum_disc_price = unscale(hilo_total(F.col("_sdh"), F.col("_sdl")), 4)
    sum_charge = unscale(hilo_total(F.col("_sch"), F.col("_scl")), 6)
    avg_disc = unscale(F.col("_sd").cast("decimal(38,0)"), 2)
    return a.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty.alias("sum_qty"),
        sum_base.alias("sum_base_price"),
        sum_disc_price.alias("sum_disc_price"),
        sum_charge.alias("sum_charge"),
        (sum_qty / F.col("count_order")).alias("avg_qty"),
        (sum_base / F.col("count_order")).alias("avg_price"),
        (avg_disc / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24
    """,
    doc="Selective filter + single aggregate; predicate fully pushed to the parquet scan.",
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(*hilo_sum(cents("l_extendedprice") * cents("l_discount"), "r")).select(
        hilo_out("r", 4).alias("revenue")
    )


@register(
    "distinct_stats_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="count / count-distinct / min / max per group (raw doubles safe: no reassociation).",
)
def distinct_stats_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "rollup_lineitem_status",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (grouping sets; single shuffle with expand).",
)
def rollup_lineitem_status(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # exact int64 qty cents (see q1): the ROLLUP expand tripled the
    # per-row BigDecimal work; grand-total bound 1.8e15 rows
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("l_quantity")).alias("_sq"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            unscale(F.col("_sq").cast("decimal(38,0)"), 2).alias("sum_qty"),
        )
    )


@register(
    "cube_orders_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="Full cube over two dimensions.",
)
def cube_orders_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # int64 price cents (see q1; grand-total overflow bound ~1.5e11
    # rows at <= ~6e7-cent order totals)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(cents("o_totalprice")).alias("_sp"))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n",
            unscale(F.col("_sp").cast("decimal(38,0)"), 2).alias("sum_price"),
        )
    )


@register(
    "pivot_qty_by_linestatus",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (wide aggregation) with explicit value list — no extra pass to discover values.",
)
def pivot_qty_by_linestatus(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # int64 qty cents (see q1); a value-absent pivot cell stays NULL
    # through unscale, matching the oracle's ELSE-less CASE sum
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(cents("l_quantity")))
    )
    return out.select(
        "l_returnflag",
        unscale(F.col("O").cast("decimal(38,0)"), 2).alias("qty_O"),
        unscale(F.col("F").cast("decimal(38,0)"), 2).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + deterministic top-10 (ties broken by key). Customer dim broadcast.",
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*hilo_sum(_rev_units(), "r"))
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            hilo_out("r", 4).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    doc="6-way star join; all dims broadcast, single shuffle for the final group-by.",
)
def q5_regional_supplier_volume(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(F.broadcast(n), (s.s_nationkey == n.n_nationkey) & (c.c_nationkey == n.n_nationkey))
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(*hilo_sum(_rev_units(), "r"))
        .select("n_name", hilo_out("r", 4).alias("revenue"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Returned-item revenue per customer, deterministic top-20.",
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*hilo_sum(_rev_units(), "r"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            hilo_out("r", 4).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "outer_join_nation_customers",
    """
    SELECT n_name, COUNT(c_custkey) AS n_customers,
           CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_balance
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Left outer join preserving empty nations (COUNT skips nulls; COALESCE for the sum).",
)
def outer_join_nation_customers(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(dec("c_acctbal")), F.lit(0).cast(MONEY))
            .cast("double")
            .alias("total_balance"),
        )
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Anti join (NOT EXISTS) — broadcast the distinct key set, no row explosion.",
)
def customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "big_spender_segments",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    doc="Semi join (EXISTS) feeding an aggregate.",
)
def big_spender_segments(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "topk_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON c_custkey = o_custkey
    ) WHERE rn <= 5
    """,
    doc="Top-K per group via ranked window; deterministic tie-break on the key.",
)
def topk_orders_per_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


@register(
    "running_balance_by_nation",
    """
    SELECT c_custkey, c_nationkey,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                OVER (PARTITION BY c_nationkey ORDER BY c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal,
           LAG(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS prev_custkey,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS BIGINT) AS rk
    FROM customer
    """,
    doc="Running decimal sum + lag + rank over one partitioning (single shuffle, shared window).",
)
def running_balance_by_nation(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.sum(dec("c_acctbal")).over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_bal"),
        F.lag("c_custkey").over(w).alias("prev_custkey"),
        F.rank().over(w).cast("long").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_ops_customer_keys",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
    doc="UNION / EXCEPT with set semantics (distinct); Catalyst plans a single agg on the key.",
)
def set_ops_customer_keys(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.union(auto).distinct().subtract(negative)


@register(
    "intersect_active_building",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="INTERSECT distinct of a dim filter with the orders key set.",
)
def intersect_active_building(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(o.select(F.col("o_custkey").alias("c_custkey")))
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@register(
    "scalar_surface_part",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(p_size % 7 AS INTEGER) AS size_mod,
           abs(p_retailprice) AS price_abs,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           round(p_retailprice, 1) AS price_round
    FROM part
    """,
    doc="String/math scalar functions — all JVM-side, whole-stage-codegen'd.",
)
def scalar_surface_part(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.abs("p_retailprice").alias("price_abs"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.round("p_retailprice", 1).alias("price_round"),
    )


@register(
    "scalar_surface_dates",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    doc="Date/time scalar functions incl. interval arithmetic and formatting.",
)
def scalar_surface_dates(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "conditional_bucketing",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderpriority,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    doc="CASE WHEN bucketing feeding an aggregate (reference router semantics are this shape, router.hpp:70-95).",
)
def conditional_bucketing(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return o.groupBy(bucket, F.col("o_orderpriority")).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Subqueries, grouping sets, percentiles
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H-Q4-style EXISTS: planned as a left-semi hash join (no "
    "row explosion however many lineitems match), then a 5-group agg.",
)
def q4_order_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q14_promo_revenue",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
    doc="TPC-H-Q14-style promo share: broadcast the part dim into the "
    "fact scan, conditional decimal sums, single scalar out.",
)
def q14_promo_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    disc_u = _rev_units()
    promo_u = F.when(F.col("p_type") == "PROMO", disc_u).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(*hilo_sum(promo_u, "p"), *hilo_sum(disc_u, "d"))
        .select(
            (F.lit(100.0) * hilo_out("p", 4) / hilo_out("d", 4)).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
    """,
    doc="TPC-H-Q18-style large orders: aggregate-then-filter (HAVING). "
    "At scale the groupBy pre-aggregates lineitem before the join would "
    "matter; here the join key equals the group key so one shuffle serves "
    "both.",
)
def q18_large_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # int64 qty cents; HAVING sum > 120 <=> cent sum > 12000 (both
    # sides scaled by the exact factor 100), and the 150k-group hash
    # agg buffers one long instead of a decimal per group
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum(cents("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 12000)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            unscale(F.col("_sq").cast("decimal(38,0)"), 2).alias("sum_qty"),
        )
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (beyond cube/rollup): one Expand + one "
    "shuffle for all three groupings, via the SQL entry point.",
)
def grouping_sets_orders(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "percentile_prices_by_status",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` == "
    "DuckDB quantile_cont bit-for-bit). At 100 TB swap to approx_percentile "
    "with a documented error bound; exact percentile needs a per-group sort.",
)
def percentile_prices_by_status(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # one percentile buffer queried at all four points (array form):
    # four scalar calls would each build their own per-group value
    # buffer over the same rows
    ps = F.percentile(
        "o_totalprice",
        F.array(*[F.lit(p) for p in (0.25, 0.50, 0.75, 0.90)]),
    )
    g = o.groupBy("o_orderstatus").agg(ps.alias("_ps"))
    return g.select(
        "o_orderstatus",
        F.element_at("_ps", 1).alias("p25"),
        F.element_at("_ps", 2).alias("p50"),
        F.element_at("_ps", 3).alias("p75"),
        F.element_at("_ps", 4).alias("p90"),
    )


@register(
    "top_part_per_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT MAX(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    """,
    doc="Correlated scalar subquery (max per brand), planned as a ranked "
    "window — one shuffle on p_brand, no self-join.",
)
def top_part_per_brand(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    return (
        p.withColumn("max_price", F.max("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("max_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "top100_orders_global",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Global top-k: planned as TakeOrderedAndProject — each partition "
    "keeps its local top 100, the driver merges k*partitions rows; no "
    "global sort ever materializes (the 100 TB-safe ORDER BY ... LIMIT).",
)
def top100_orders_global(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "orders_yoy_growth",
    """
    WITH yr AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY year(o_orderdate)
    )
    SELECT yr, revenue,
           round(revenue / lag(revenue) OVER (ORDER BY yr) - 1.0, 6) AS yoy_growth
    FROM yr
    """,
    doc="Year-over-year revenue growth: the yearly agg collapses to a "
    "handful of rows before the lag window, so the single-partition "
    "window is over ~7 rows, not the fact table — the safe version of "
    "a global window. Decimal-exact sums, growth rounded at the edge.",
)
def orders_yoy_growth(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    yr = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(cents("o_totalprice")).alias("_sp"))
        .select(
            "yr",
            unscale(F.col("_sp").cast("decimal(38,0)"), 2).alias("revenue"),
        )
    )
    w = W.orderBy("yr")
    return yr.select(
        "yr",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1.0, 6).alias(
            "yoy_growth"
        ),
    )


@register(
    "customer_rfm_segments",
    """
    WITH rfm AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_order, CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY last_order, custkey) AS INTEGER) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency, custkey) AS INTEGER) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary, custkey) AS INTEGER) AS m_quartile
    FROM rfm
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary from "
    "one orders agg, then quartile NTILEs with custkey tie-breaks so "
    "bucket edges are deterministic. Each quartile is the two-phase "
    "bucketed NTILE (operators/prefix.py) — quantile buckets, local "
    "row_number, broadcast offsets + exact SQL tile rule — joined "
    "back on custkey; no single-partition window anywhere, and the "
    "customer-grain agg is materialized once (localCheckpoint) so the "
    "orders scan+shuffle never reruns per rank branch.",
)
def customer_rfm_segments(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    rfm = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(cents("o_totalprice")).alias("_sp"),
        )
        .select(
            "custkey",
            "last_order",
            "frequency",
            unscale(F.col("_sp").cast("decimal(38,0)"), 2).alias("monetary"),
        )
    )
    rfm = rfm.localCheckpoint()  # one orders scan+shuffle, period
    # last_order melts to epoch seconds: the session runs in UTC so the
    # NTZ->double mapping is monotone and injective (µs resolution sits
    # well inside double's 2^53 integer range), preserving the
    # ORDER BY last_order tie-broken-by-custkey contract exactly.
    # The R/F/M measures ride the melt as payload — no join back onto
    # the grain table (its RDD-scan exchange is never reused).
    # A CHAINED multi-NTILE (every dim's bucket id on one row set,
    # successive bucket-keyed windows, offsets from pre-window counts,
    # no melt and no reunite join) was built and measured in r14 and
    # REJECTED at both call sites: here 4/4 interleaved pairs worse
    # (1.2-1.4 -> 1.7-3.9 s; 8 -> 21 jobs — at tiny custkey grain the
    # 3 serialized window barriers cost more than melting 3x rows),
    # and on event-grain zorder_zvalue_audit 6/8 pairs worse (median
    # 2.81 -> 2.97 s) — the serialized windows also lose to the two
    # CONCURRENT per-dim pipelines + reunite join there, despite
    # exchanging strictly fewer bytes. Both entries keep their shapes.
    tiles = prefix.global_ntile_multi(
        rfm,
        "custkey",
        {
            "r_quartile": F.col("last_order").cast("timestamp").cast("double"),
            "f_quartile": F.col("frequency"),
            "m_quartile": F.col("monetary"),
        },
        4,
        checkpoint=False,  # rfm is already materialized above
        payload=["last_order", "frequency", "monetary"],
    )
    return tiles.select(
        "custkey",
        "last_order",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


@register(
    "basket_brand_affinity",
    """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT brand_a, brand_b, n_orders FROM (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    ORDER BY n_orders DESC, brand_a, brand_b
    LIMIT 20
    """,
    doc="Market-basket affinity: top-20 brand pairs co-occurring in one "
    "order. No self-join at all: ONE orderkey shuffle groups each "
    "basket's distinct brands into a (small, dictionary-bounded) "
    "array, pairs explode MAP-SIDE within each basket row, and the "
    "pair count folds into a |brands|^2-grain aggregate — the "
    "quadratic term lands on per-basket arrays (bounded by order "
    "width), never on a fact-fact join. Total ORDER BY tie-break "
    "keeps the LIMIT deterministic across engines.",
)
def basket_brand_affinity(spark, sf_dir):
    pair = (
        _brand_baskets(spark, sf_dir)
        .select(F.explode("brands").alias("brand_a"), "brands")
        .select("brand_a", F.explode("brands").alias("brand_b"))
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
    )
    return pair.orderBy(F.desc("n_orders"), "brand_a", "brand_b").limit(20)


def _brand_baskets(spark, sf_dir):
    """(l_orderkey, sorted distinct brand array) — the grouped-basket
    relation both market-basket entries derive from. collect_set
    dedups within the basket, so this replaces the old
    DISTINCT-then-self-join shape with one orderkey shuffle; the
    array is bounded by the order's width (7 lineitems here, always
    small relative to the corpus), so downstream pair explosion is
    map-side work."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )


@register(
    "orders_abc_pareto",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM per_cust
    ), d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS cents_sum
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(cents_sum AS DOUBLE) / 100 AS revenue,
           CAST(SUM(cents_sum) OVER (ORDER BY decile
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / SUM(cents_sum) OVER () AS cum_share
    FROM d
    """,
    doc="ABC/Pareto analysis: customers ranked into revenue deciles, "
    "with each decile's cumulative share of total revenue — the "
    "80/20 concentration report. Revenue aggregates as exact integer "
    "cents; the decile is the two-phase bucketed NTILE "
    "(operators/prefix.py) on the customer-grain aggregate (never raw "
    "orders, never a single-partition window), and the final share is "
    "a ratio of exact int64s so both engines emit identical doubles. "
    "NTILE ties break on o_custkey for determinism; the two windows "
    "over the decile rollup cover 10 rows.",
)
def orders_abc_pareto(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast("bigint").alias("cents")
    )
    ranked = prefix.global_ntile(
        per_cust,
        [F.desc("cents"), F.asc("o_custkey")],
        10,
        "decile",
        proxy=F.col("cents"),
        proxy_desc=True,
        # materialize the customer-grain agg once instead of re-running
        # the orders scan+shuffle per prefix branch
        checkpoint=True,
    ).select("cents", "decile")
    d = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy()
    return d.select(
        "decile",
        "n_customers",
        (F.col("cents_sum").cast("double") / 100).alias("revenue"),
        (
            F.sum("cents_sum").over(wc).cast("double")
            / F.sum("cents_sum").over(wt)
        ).alias("cum_share"),
    )


@register(
    "basket_brand_lift",
    """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ), tot AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
    ), brand AS (
        SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY p_brand
    ), pair AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_ab
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab, lift, confidence FROM (
        SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
               CAST(n_ab * n_orders AS DOUBLE)
                 / CAST(ba.n * bb.n AS DOUBLE) AS lift,
               CAST(n_ab AS DOUBLE) / ba.n AS confidence
        FROM pair
        JOIN brand ba ON pair.brand_a = ba.p_brand
        JOIN brand bb ON pair.brand_b = bb.p_brand
        CROSS JOIN tot
    )
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
    doc="Association-rule mining over baskets: top-20 brand pairs by "
    "lift = P(a,b)/(P(a)P(b)), with support count and confidence — "
    "the recommender/affinity staple one step past raw co-occurrence "
    "(basket_brand_affinity). Pairs, per-brand counts, and the basket "
    "total all derive from ONE materialized basket-array relation "
    "(localCheckpoint — three consumers with different column prunings "
    "would otherwise each rerun the fact scan + orderkey shuffle, and "
    "exchange reuse cannot fire across them): the corpus shuffles "
    "exactly once, pairs explode map-side inside each basket row, and "
    "everything downstream is |brands|- or |brands|^2-grain. Per-brand "
    "counts are a dictionary-bounded broadcast, the basket total rides "
    "a 1-row broadcast, and both ratios are single divisions of exact "
    "int64 products (n*n_orders < 2^63 up to ~3e9 baskets x dictionary "
    "brands) so the doubles match bit-for-bit. Top-20 is a "
    "TakeOrderedAndProject with full tie-break.",
)
def basket_brand_lift(spark, sf_dir):
    baskets = _brand_baskets(spark, sf_dir).localCheckpoint(eager=True)
    tot = baskets.agg(F.count("*").alias("n_orders"))
    brand = baskets.select(F.explode("brands").alias("p_brand")).groupBy(
        "p_brand"
    ).agg(F.count("*").alias("n"))
    pair = (
        baskets.select(F.explode("brands").alias("brand_a"), "brands")
        .select("brand_a", F.explode("brands").alias("brand_b"))
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
    )
    ba = brand.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na"))
    bb = brand.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nb"))
    return (
        pair.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("lift"),
            (F.col("n_ab").cast("double") / F.col("na")).alias("confidence"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "orders_cohort_revenue",
    """
    WITH first_order AS (
        SELECT o_custkey,
               date_trunc('month', MIN(o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    GROUP BY cohort_month, date_trunc('month', o_orderdate)
    """,
    doc="Revenue retention matrix: customers grouped by first-order "
    "cohort month, revenue and active count per (cohort, order "
    "month) — the subscription-health triangle, orders-side twin of "
    "events_retention_cohorts. Cohort assignment is one custkey agg "
    "joined back on the already-custkey-shuffled relation; the "
    "matrix grain is months^2 (bounded by calendar, not data) and "
    "revenue sums exactly as DECIMAL before one cast to double.",
)
def orders_cohort_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.col("cohort_month").cast("timestamp").alias("cohort_month"),
            F.date_trunc("month", "o_orderdate")
            .cast("timestamp")
            .alias("order_month"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum(cents("o_totalprice")).alias("_sp"),
        )
        .select(
            "cohort_month",
            "order_month",
            "n_active",
            unscale(F.col("_sp").cast("decimal(38,0)"), 2).alias("revenue"),
        )
    )


@register(
    "customer_order_gap_stats",
    """
    WITH gaps AS (
        SELECT o_custkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           CAST(CAST(SUM(gap_days) AS BIGINT) AS DOUBLE) / COUNT(gap_days)
             AS avg_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    doc="Inter-order gap statistics per customer (days between "
    "consecutive orders via a lag window, then min/max/mean) — the "
    "churn-risk feature: a customer whose current silence dwarfs "
    "their historical max gap is gone. One custkey shuffle serves "
    "both the lag window and the aggregate; gaps are exact integer "
    "day diffs and the mean is one int64-sum division, so both "
    "engines emit identical doubles.",
)
def customer_order_gap_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return gaps.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("gap_days").cast("bigint").alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_gap"),
        F.max("gap_days").cast("bigint").alias("max_gap"),
        (
            F.sum("gap_days").cast("double") / F.count("gap_days")
        ).alias("avg_gap_days"),
    )


@register(
    "join_key_skew_audit",
    """
    WITH melted AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS keyv FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
    ), cnt AS (
      SELECT key_col, keyv, COUNT(*) AS c FROM melted GROUP BY 1, 2
    ), ranked AS (
      SELECT key_col, keyv, c,
             ROW_NUMBER() OVER (PARTITION BY key_col
                                ORDER BY c DESC, keyv ASC) AS rnk
      FROM cnt
    )
    SELECT key_col,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS total_rows,
           CAST(MAX(c) AS BIGINT) AS max_rows,
           CAST(SUM(CASE WHEN rnk <= 10 THEN c ELSE 0 END) AS BIGINT)
             AS top10_rows,
           CAST(MAX(c) * COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS skew_x_avg
    FROM ranked GROUP BY key_col
    """,
    doc="Join-key skew diagnostic — the audit you run BEFORE choosing a "
    "join strategy at 100 TB: per candidate join column of the fact "
    "table, the key cardinality, the hottest key's row count, the mass "
    "held by the top-10 keys, and max/avg skew (max_rows x n_keys / "
    "total, an exact integer product over one double division). "
    "skew_x_avg >> 1 is the signal to salt or let AQE split that join. "
    "Spark melts all three key columns in ONE scan via stack() (the "
    "oracle's UNION ALL shape, 3 scans, is semantically identical); "
    "counts collapse map-side so the only full-size exchange is the "
    "(key_col, key)-grain reduce.",
)
def join_key_skew_audit(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").selectExpr(
        "stack(3, 'l_orderkey', l_orderkey,"
        " 'l_partkey', l_partkey,"
        " 'l_suppkey', l_suppkey) AS (key_col, keyv)"
    )
    cnt = li.groupBy("key_col", "keyv").agg(F.count("*").alias("c"))
    wr = W.partitionBy("key_col").orderBy(F.desc("c"), F.asc("keyv"))
    ranked = cnt.withColumn("rnk", F.row_number().over(wr))
    return ranked.groupBy("key_col").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("total_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.sum(F.when(F.col("rnk") <= 10, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("top10_rows"),
        (
            (F.max("c") * F.count("*")).cast("double")
            / F.sum("c").cast("double")
        ).alias("skew_x_avg"),
    )


@register(
    "fuzzy_part_name_pairs",
    """
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part
    ), tg AS (
      SELECT name,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(name) - 2, 1) + 1),
               i -> substr(name, CAST(i AS INTEGER), 3)))) AS gram
      FROM names
    ), sizes AS (
      SELECT name, COUNT(*) AS n FROM tg GROUP BY name
    ), shared AS (
      SELECT a.name AS name_a, b.name AS name_b, COUNT(*) AS c
      FROM tg a JOIN tg b ON a.gram = b.gram AND a.name < b.name
      GROUP BY 1, 2
    )
    SELECT s.name_a, s.name_b,
           CAST(s.c AS BIGINT) AS shared_trigrams,
           CAST(s.c AS DOUBLE) / (sa.n + sb.n - s.c) AS jaccard
    FROM shared s
    JOIN sizes sa ON s.name_a = sa.name
    JOIN sizes sb ON s.name_b = sb.name
    WHERE CAST(s.c AS DOUBLE) / (sa.n + sb.n - s.c) >= 0.4
    """,
    doc="Fuzzy string matching via character-trigram Jaccard (the "
    "pg_trgm / entity-resolution blocking scheme): distinct part names "
    "explode to trigram sets, candidate pairs come from the "
    "gram-equality join (never all-pairs), and exact set Jaccard "
    "(integer intersection over integer union, one double division) "
    "keeps pairs >= 0.4. Runs entirely on the DISTINCT-name relation — "
    "at 100 TB that is the value dictionary, orders of magnitude "
    "smaller than the fact table; for hostile dictionaries add PPJoin "
    "prefix filtering (sort grams by global frequency, join only the "
    "first |s|-ceil(t*|s|)+1 grams) on the same plan shape.",
)
def fuzzy_part_name_pairs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct()
    tg = names.select(
        "name",
        F.explode(
            F.expr(
                "array_distinct(transform("
                "sequence(1, greatest(length(name) - 2, 1)),"
                " i -> substring(name, i, 3)))"
            )
        ).alias("gram"),
    )
    sizes = tg.groupBy("name").agg(F.count("*").alias("n"))
    a = tg.alias("a")
    b = tg.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .groupBy(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(
        F.col("name").alias("name_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("name").alias("name_b"), F.col("n").alias("nb")
    )
    jac = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    )
    return (
        shared.join(F.broadcast(sa), "name_a")
        .join(F.broadcast(sb), "name_b")
        .where(jac >= 0.4)
        .select(
            "name_a",
            "name_b",
            F.col("c").cast("bigint").alias("shared_trigrams"),
            jac.alias("jaccard"),
        )
    )


@register(
    "orders_seasonal_index",
    """
    WITH m AS (
        SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY month(o_orderdate)
    ), tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_months
        FROM m
    )
    SELECT m.mon, m.n_orders,
           CAST(m.cents AS DOUBLE) / 100 AS revenue,
           CAST(m.cents AS DOUBLE) * tot.n_months / tot.total
               AS seasonal_idx
    FROM m, tot
    """,
    doc="Month-of-year seasonal index of order revenue (ratio-to-"
    "overall-mean, the first step of classical seasonal "
    "decomposition): index > 1 months run hot. The fact scan "
    "collapses to <= 12 month rows in one partial-agg shuffle; the "
    "1-row total is annotated back via broadcast cross join, never a "
    "global window. Cent sums are exact ints, the index is the "
    "identical double expression on both engines.",
)
def orders_seasonal_index(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    price_c = cents("o_totalprice")
    # materialize the 12-row month table once: the total would
    # otherwise rescan orders
    m = o.groupBy(F.month("o_orderdate").cast("int").alias("mon")).agg(
        F.sum(price_c).cast("bigint").alias("cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    ).localCheckpoint(eager=True)
    tot = m.agg(
        F.sum("cents").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_months"),
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "mon",
        "n_orders",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (
            F.col("cents").cast("double")
            * F.col("n_months")
            / F.col("total")
        ).alias("seasonal_idx"),
    )
