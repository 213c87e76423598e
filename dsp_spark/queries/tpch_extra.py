"""Remaining TPC-H query *shapes*, adapted to the reduced synthetic
star schema (no partsupp table, no commit/receipt dates, no
phone/container/shipmode columns — TESTDATA.md).

What each entry preserves from the official query is the plan shape —
multi-way joins with dim broadcast, correlated aggregate subqueries
(decorrelated to joins), two-level aggregation, OR'd compound
predicates, scalar-subquery thresholds — not the exact predicate
constants. Cross-multiplied decimal comparisons replace
`x < frac * AVG(y)` so no engine-dependent double division ever
decides a filter (see queries/_util.py determinism contract).

The reference has no relational layer at all (SURVEY.md §2.4);
this module is part of the capability-parity-plus surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.queries._util import (
    MONEY,
    PCT,
    cents,
    dec,
    dsum,
    hilo_out,
    hilo_sum,
    t,
)

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev():
    one = F.lit(1).cast(PCT)
    return dec("l_extendedprice") * (one - dec("l_discount", PCT))


def _rev_u():
    """price*(1-disc) in exact integer 1e-4 currency units — the int64
    form of _rev() (guide §1.2 step 2; see _util.cents for the exact-
    equivalence argument and hilo_sum/hilo_out for the overflow-safe
    accumulation: terms <= ~1.1e9, lo partial sums overflow only past
    ~1.1e12 rows per group)."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


@register(
    "q7_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
    """,
    doc="TPC-H-Q7-style bilateral trade volume. Both nation dims are "
    "pre-filtered to the two relevant names BEFORE broadcast, and each "
    "fact input is reduced through its filtered dim (lineitem via "
    "supplier-nation, orders via customer-nation) ahead of the "
    "fact-fact join — so the one unavoidable orderkey shuffle moves "
    "~2/25ths of each table instead of all of it. The pair filter then "
    "only removes the (1,1)/(2,2) combinations.",
)
def q7_nation_volume(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    names = ("NATION_1", "NATION_2")
    sn = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    cn = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    # reduce each fact side through its (filtered) dims before the
    # fact-fact shuffle: only suppliers/customers in the two nations
    # survive, so the orderkey exchange carries ~8% of the rows
    s2 = s.join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")).select(
        "c_custkey", "cust_nation"
    )
    # no broadcast hint on s2/c2: under the size threshold Catalyst
    # broadcasts them anyway; at cluster scale (SF-proportional dims)
    # AQE picks shuffle join instead of forcing an OOM-sized broadcast
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey).select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount", "supp_nation"
    )
    o2 = o.join(c2, o.o_custkey == c2.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(*hilo_sum(_rev_u(), "v"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            hilo_out("v", 4).alias("volume"),
        )
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               {_REV_SQL} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H-Q8-style market share: 8-way star join (all dims "
    "broadcast), then conditional-sum / total-sum per year — both sums "
    "exact decimals cast to double before the one final division.",
)
def q8_market_share(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # int64 1e-4-unit volume terms (see _rev_u): the numerator rides the
    # same exact accumulation through a when() gate, and both sums
    # surface as the identical doubles the decimal path emitted before
    # the one final division
    vol = _rev_u().alias("volume")
    all_nations = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
    )
    num_term = F.when(
        F.col("supp_nation") == "NATION_5", F.col("volume")
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        all_nations.groupBy("o_year")
        .agg(*hilo_sum(num_term, "n"), *hilo_sum(F.col("volume"), "d"))
        .select(
            "o_year",
            (hilo_out("n", 4) / hilo_out("d", 4)).alias("mkt_share"),
        )
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    doc="TPC-H-Q9-style profit by supplier nation and year (supply-cost "
    "term dropped: no partsupp table in the schema). Part filter LIKE "
    "'%gear%' broadcast into the fact scan.",
)
def q9_product_type_profit(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(*hilo_sum(_rev_u(), "v"))
        .select("nation", "o_year", hilo_out("v", 4).alias("sum_profit"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H-Q13-style customer order-count distribution: left outer "
    "join with an extra join-side predicate, then two-level aggregation "
    "(per-customer count, then histogram). One shuffle per level; the "
    "second input is tiny (one row per customer).",
)
def q13_customer_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H-Q15-style top supplier: quarterly revenue per supplier, "
    "scalar-subquery MAX threshold (planned as a 1-row broadcast join "
    "against the reused revenue aggregate — double equality is safe "
    "because both sides derive from the same exact decimal sum).",
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(*hilo_sum(_rev_u(), "r"))
        .select("supplier_no", hilo_out("r", 4).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H-Q16-style supplier variety per part group (partsupp "
    "replaced by observed lineitem suppliers). Negated + IN-list dim "
    "predicates, distinct-count aggregation (two-phase: local distinct "
    "then merge).",
)
def q16_supplier_part_variety(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_partkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               COUNT(*) AS cnt_qty
        FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt_qty < sum_qty
    """,
    doc="TPC-H-Q17-style small-quantity revenue: correlated AVG subquery "
    "decorrelated to a per-part aggregate join (the standard rewrite), "
    "with the `qty < 0.2 * avg` threshold cross-multiplied into exact "
    "decimal arithmetic (5*qty*cnt < sum) so no double division decides "
    "the filter. The brand predicate is semi-joined into BOTH lineitem "
    "scans first (broadcast of ~1/25 of partkeys), so the per-part "
    "aggregate shuffles partials for brand parts only and comes back "
    "small enough that the optimizer broadcasts it locally (no hint: at "
    "extreme SF the same plan degrades gracefully to co-partitioned "
    "shuffle joins under AQE).",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pk = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li_b = li.join(pk, li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    # int64 qty cents: q*5*cnt < sum_q is scale-invariant (both sides
    # x100 exactly), and the final price sum accumulates hilo-safe
    part_agg = li_b.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.count("*").alias("cnt_qty"),
    )
    return (
        li_b.join(part_agg, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(cents("l_quantity") * 5 * F.col("cnt_qty") < F.col("sum_qty_c"))
        .agg(*hilo_sum(cents("l_extendedprice"), "p"))
        .select((hilo_out("p", 2) / 7.0).alias("avg_yearly"))
    )


@register(
    "q19_discounted_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H-Q19-style OR'd compound join predicates (three "
    "brand/size/quantity envelopes). The disjunction spans both sides, "
    "so it stays a post-join filter; the part side is broadcast and "
    "Catalyst pushes the derivable per-side bounds.",
)
def q19_discounted_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(*hilo_sum(_rev_u(), "r"))
        .select(hilo_out("r", 4).alias("revenue"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH pos AS (
        SELECT CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM pos)
          > (SELECT SUM(bal) FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="TPC-H-Q22-style sales opportunity: scalar AVG threshold "
    "cross-multiplied to exact decimals (bal*n > sum), NOT EXISTS "
    "anti-join against orders, grouped by nation (phone-prefix column "
    "doesn't exist in this schema).",
)
def q22_global_sales_opportunity(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0).select(
        dec("c_acctbal").alias("bal")
    )
    stats = pos.agg(F.count("*").alias("n_pos"), F.sum("bal").alias("sum_pos"))
    return (
        c.join(F.broadcast(stats))
        .filter(dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag AS ship_group,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
    doc="TPC-H-Q12-style late-shipment priority split (shipmode/"
    "commit/receipt dates don't exist in this schema: 'late' = shipped "
    ">90 days after order date, ship_group = l_returnflag). Shape "
    "preserved: fact-fact equi-join with a non-equi date predicate "
    "evaluated join-side, then conditional counting — the join shuffles "
    "on orderkey and the CASE sums fold map-side.",
)
def q12_late_shipment_priority(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q21_suppliers_who_kept_orders_waiting",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name, n_name
    """,
    doc="TPC-H-Q21-style suppliers who kept orders waiting ('late' = "
    "shipped >60 days after order date on a finished order). The "
    "correlated EXISTS / NOT EXISTS pair is decorrelated to per-order "
    "aggregates: an order qualifies iff it has >=2 distinct suppliers "
    "and exactly 1 distinct *late* supplier. Two cascaded partial-agg "
    "shuffles — (orderkey, suppkey) granularity, then orderkey — each "
    "strictly reducing (no window, so no per-partition sort and no "
    "fact-sized rows carried past the agg); when exactly one supplier "
    "is late, that supplier and the order's late-row count survive the "
    "rollup as max/sum. Broadcast dims, no lineitem self-join anywhere "
    "— the shape that survives a 100x scale-up. The EXISTS semi-join "
    "on the *full* lineitem is free because 'a supplier on the order' "
    "is exactly a (orderkey, suppkey) group.",
)
def q21_suppliers_who_kept_orders_waiting(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    late = (F.col("o_orderstatus") == "F") & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    # shuffle_hash, not broadcast: orders is a fact table. Locally it
    # would fit the auto-broadcast threshold, but the broadcast plan
    # leaves the join output unpartitioned, so BOTH downstream aggs
    # insert exchanges; the shuffle join partitions by orderkey once and
    # the (orderkey, suppkey) and (orderkey) aggs both elide theirs via
    # the subset-clustering rule (measured 1.5x faster even at sf0.1,
    # and it is the only plan that exists at 100 TB).
    per_supp = (
        li.hint("shuffle_hash")
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("n_late_rows"))
    )
    is_late = F.col("n_late_rows") > 0
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum(is_late.cast("int")).alias("n_late_supp"),
            F.max(F.when(is_late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(is_late, F.col("n_late_rows")).otherwise(0)).alias(
                "late_rows"
            ),
        )
        .filter((F.col("n_late_supp") == 1) & (F.col("n_supp") >= 2))
    )
    return (
        per_order.join(s, per_order.late_supp == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.sum("late_rows").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q2/q11/q20 need TPC-H's partsupp table, which the synthetic schema lacks
# (TESTDATA.md). Each is adapted over the same derived relation:
#     ps(partkey, suppkey, agg)  =  lineitem GROUP BY (l_partkey, l_suppkey)
# which preserves the queries' defining plan shapes — correlated-min
# subquery (q2), global-fraction HAVING with a scalar subquery (q11),
# nested semi-joins with a correlated per-part threshold (q20) — on a
# relation with partsupp's exact key structure.

_PS_COST_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_COST_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM ps
    JOIN part     ON ps_partkey = p_partkey
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO' AND p_size <= 10
      AND supplycost = (
          SELECT MIN(ps2.supplycost)
          FROM ps ps2
          JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H-Q2-style min-cost supplier per part (ref has no relational "
    "layer, SURVEY.md §2.4; partsupp derived from lineitem). The "
    "correlated MIN subquery is decorrelated to a window-min over the "
    "already-joined regional candidates: ONE extra shuffle (by partkey) "
    "instead of recomputing the 4-way subquery join. Part filter is "
    "broadcast so pruning reaches the ps aggregate; the tie-break ORDER "
    "BY is total, making LIMIT 100 deterministic across engines.",
)
def q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # broadcast semi-join BELOW the aggregate: only lineitem rows for
    # qualifying parts reach the (partkey, suppkey) shuffle. Legal
    # because supplycost is per-(pk, sk), independent of the part filter.
    ps = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice")).alias("supplycost"))
    )
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), national AS (
        SELECT ps_partkey, val
        FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey AS p_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM national
    GROUP BY ps_partkey
    HAVING CAST(SUM(val) AS DECIMAL(18,2)) * 10000 >
           (SELECT CAST(SUM(val) AS DECIMAL(18,2)) FROM national)
    """,
    doc="TPC-H-Q11-style important-stock list (partsupp derived from "
    "lineitem): per-part value within one nation, kept when it exceeds "
    "1/10000 of the national total. The scalar subquery total is a "
    "1-row broadcast cross-join; the fraction compare is "
    "cross-multiplied in exact decimals so no double division decides "
    "the filter. Two strictly-reducing partial-agg shuffles; the "
    "nation filter prunes at the supplier (broadcast) join before "
    "either shuffle.",
)
def q11_important_parts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    # nation selectivity (1/25 of suppliers) pushed BELOW the heavy
    # (partkey, suppkey) aggregate: semi-join the fact on the national
    # supplier list first, so the shuffle carries only qualifying rows.
    # Legal because ps rows of other suppliers are discarded later anyway.
    nat_supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi"
    ).select("s_suppkey")
    ps = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    national = ps.select(F.col("l_partkey").alias("ps_partkey"), "val")
    total = national.agg(
        F.sum("val").cast("decimal(18,2)").alias("total_val")
    )
    return (
        national.groupBy("ps_partkey")
        .agg(F.sum("val").alias("sum_val"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("sum_val").cast("decimal(18,2)") * 10000 > F.col("total_val")
        )
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("sum_val").cast("double").alias("part_value"),
        )
    )


@register(
    "q20_dominant_part_suppliers",
    """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
                 AS supp_qty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), shipped AS (
        SELECT l_partkey AS sh_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
                 AS year_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
      AND s_suppkey IN (
          SELECT ps_suppkey
          FROM ps JOIN shipped ON ps_partkey = sh_partkey
          WHERE ps_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')
            AND supp_qty * 2 > year_qty)
    """,
    doc="TPC-H-Q20-style nested semi-join chain (partsupp derived from "
    "lineitem): suppliers of 'small *' parts whose lifetime quantity "
    "for the part exceeds half the part's 1996 shipped volume. The "
    "name-filtered part list broadcasts into the ps aggregate; the "
    "correlated availqty threshold becomes an equi-join of two "
    "partial aggregates co-partitioned on partkey (AQE reuses the "
    "exchange); the IN on suppkey is a left-semi join, so supplier "
    "rows are never duplicated.",
)
def q20_dominant_part_suppliers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small %"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    from pyspark.sql import Window as W

    qty = dec("l_quantity")
    # r14 (guide §2.4 / §1.2 step 1): the oracle's `shipped` CTE is a
    # SECOND full lineitem scan + partkey-grain aggregate, but the 1996
    # per-part total is just the sum of per-(part, supplier) filtered
    # sums — a conditional sum riding the SAME (l_partkey, l_suppkey)
    # aggregate, folded to part grain by a window over the pair-grain
    # table (bounded by suppliers-per-part). One fact scan and one
    # fact-grain exchange instead of two; decimal sums are exact in any
    # grouping, so year_qty is value-identical to the oracle's.
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).cast("decimal(18,2)").alias("supp_qty"),
            F.sum(F.when(in96, qty)).alias("_yq_pair"),
        )
    )
    year_qty = (
        F.sum("_yq_pair")
        .over(W.partitionBy("l_partkey"))
        .cast("decimal(18,2)")
    )
    dominant = (
        ps.withColumn("_year_qty", year_qty)
        .filter(F.col("supp_qty") * 2 > F.col("_year_qty"))
        .select(F.col("l_suppkey").alias("dom_suppkey"))
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == dominant.dom_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "supplier_lead_time_stats",
    """
    WITH x AS (
        SELECT l.l_suppkey AS suppkey,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
        SELECT suppkey, d,
               ROW_NUMBER() OVER (PARTITION BY suppkey ORDER BY d) AS rn,
               COUNT(*) OVER (PARTITION BY suppkey) AS n,
               SUM(d) OVER (PARTITION BY suppkey) AS sd,
               MIN(d) OVER (PARTITION BY suppkey) AS mn,
               MAX(d) OVER (PARTITION BY suppkey) AS mx
        FROM x
    )
    SELECT suppkey, CAST(n AS BIGINT) AS n_shipments,
           CAST(mn AS BIGINT) AS min_days,
           CAST(mx AS BIGINT) AS max_days,
           CAST(sd AS DOUBLE) / n AS avg_days,
           CAST(d AS BIGINT) AS p90_days
    FROM r WHERE rn = (9 * n + 9) // 10
    """,
    doc="Per-supplier lead-time distribution (order date -> ship "
    "date): count, min/max, exact mean, and the DISCRETE p90 — the "
    "value at rank ceil(0.9n), computed with pure integer rank math "
    "((9n+9) div 10, never ceil(0.9*n): DuckDB's 0.9 literal is "
    "DECIMAL and Spark's is double, so their products straddle the "
    "ceil boundary on multiples of ten) — the supply-chain SLA "
    "dashboard per vendor. One fact-fact co-partitioned join on "
    "orderkey, one supplier-keyed exchange, bounded per-supplier "
    "windows; the mean is one int->double division. Lead times are "
    "SIGNED: the synthetic generator draws ship dates independent of "
    "order dates, so negative values are expected and kept (a real "
    "deployment would DQ-flag them via dq_events_freshness's "
    "pattern).",
)
def supplier_lead_time_stats(spark, sf_dir):
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    x = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff("l_shipdate", "o_orderdate").alias("d"),
    )
    pk = W.partitionBy("suppkey")
    r = x.select(
        "suppkey",
        "d",
        F.row_number().over(pk.orderBy("d")).alias("rn"),
        F.count("*").over(pk).alias("n"),
        F.sum("d").over(pk).alias("sd"),
        F.min("d").over(pk).alias("mn"),
        F.max("d").over(pk).alias("mx"),
    )
    return r.where(
        F.col("rn") == F.expr("(9 * n + 9) div 10")
    ).select(
        "suppkey",
        F.col("n").cast("bigint").alias("n_shipments"),
        F.col("mn").cast("bigint").alias("min_days"),
        F.col("mx").cast("bigint").alias("max_days"),
        (F.col("sd").cast("double") / F.col("n")).alias("avg_days"),
        F.col("d").cast("bigint").alias("p90_days"),
    )


@register(
    "part_type_unit_value_index",
    """
    WITH li AS (
      SELECT p.p_type,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS yr,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                  AS BIGINT) AS cents,
             CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100
                  AS BIGINT) AS qty100
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), agg AS (
      SELECT p_type, yr,
             COUNT(*) AS n_lines,
             SUM(cents) AS sum_cents,
             SUM(qty100) AS sum_qty100
      FROM li GROUP BY 1, 2
    ), base AS (
      SELECT p_type,
             SUM(cents) AS b_cents,
             SUM(qty100) AS b_qty100
      FROM li WHERE yr = 1995 GROUP BY p_type
    )
    SELECT a.p_type, a.yr,
           CAST(a.n_lines AS BIGINT) AS n_lines,
           CAST(a.sum_cents AS DOUBLE) / a.sum_qty100 AS unit_value,
           (CAST(a.sum_cents AS DOUBLE) / a.sum_qty100)
             / (CAST(b.b_cents AS DOUBLE) / b.b_qty100) AS uv_index
    FROM agg a JOIN base b ON a.p_type = b.p_type
    """,
    doc="Unit-value price index per part type (the trade-statistics "
    "index: revenue per unit, each year relative to the 1995 base — "
    "what a procurement dashboard tracks when true per-part price "
    "relatives are unavailable). Numerators/denominators are exact "
    "BIGINT cents and centi-units aggregated map-side to the "
    "(type, year) grain; the index is three IEEE divisions in a fixed "
    "tree. The part dimension broadcasts, so the only fact-side "
    "exchange is the ~type x year rollup.",
)
def part_type_unit_value_index(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(p.select("p_partkey", "p_type")),
        li["l_partkey"] == p["p_partkey"],
    ).select(
        "p_type",
        F.year("l_shipdate").cast("int").alias("yr"),
        cents("l_extendedprice").alias("cents"),
        cents("l_quantity").alias("qty100"),
    )
    agg = j.groupBy("p_type", "yr").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum("cents").alias("sum_cents"),
        F.sum("qty100").alias("sum_qty100"),
    )
    base = (
        j.where(F.col("yr") == 1995)
        .groupBy("p_type")
        .agg(
            F.sum("cents").alias("b_cents"),
            F.sum("qty100").alias("b_qty100"),
        )
    )
    uv = F.col("sum_cents").cast("double") / F.col("sum_qty100")
    buv = F.col("b_cents").cast("double") / F.col("b_qty100")
    return agg.join(F.broadcast(base), "p_type").select(
        "p_type",
        "yr",
        "n_lines",
        uv.alias("unit_value"),
        (uv / buv).alias("uv_index"),
    )
