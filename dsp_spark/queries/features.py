"""ML feature-engineering and record-linkage catalog entries.

The operations a feature store / entity-resolution pass runs next to
the curation pipeline: leakage-safe target encoding, in-engine
regression slopes, skyline (Pareto-front) extraction, and
sorted-neighborhood blocking for fuzzy record linkage. The reference
engine has none of these (no SQL/aggregation surface, SURVEY.md §2.4);
they exist here because a training-data platform needs them at the
same scale as the dedup/sampling layers.

Determinism contract (queries/_util.py): all statistics accumulate as
exact int64 cents or DECIMAL(38,0), and every emitted double is the
identical expression evaluated on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.queries._util import cents as _cents_of, dec, t


@register(
    "feature_target_encoding_loo",
    """
    WITH j AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), s AS (
        SELECT segment,
               CAST(SUM(cents) AS BIGINT) AS seg_sum,
               CAST(COUNT(*) AS BIGINT) AS seg_n
        FROM j GROUP BY segment
    )
    SELECT j.o_orderkey, j.segment,
           CAST(s.seg_sum - j.cents AS DOUBLE) / (s.seg_n - 1)
               AS loo_enc_cents
    FROM j JOIN s ON j.segment = s.segment
    WHERE s.seg_n > 1
    """,
    doc="Leakage-safe leave-one-out target encoding of the customer "
    "market segment against order value: each order's encoding is the "
    "segment mean computed WITHOUT its own row ((sum - own)/(n-1)), "
    "the standard trick that prevents the feature from memorizing its "
    "own target. Sums are exact int64 cents, so the LOO double is the "
    "identical division on both engines. Orders join the customer dim "
    "(broadcast), the per-segment statistics table is a handful of "
    "rows broadcast back — the fact table shuffles zero times.",
)
def feature_target_encoding_loo(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        _cents_of("o_totalprice").alias("cents"),
    )
    s = j.groupBy("segment").agg(
        F.sum("cents").cast("bigint").alias("seg_sum"),
        F.count("*").cast("bigint").alias("seg_n"),
    )
    return (
        j.join(F.broadcast(s), "segment")
        .filter(F.col("seg_n") > 1)
        .select(
            "o_orderkey",
            "segment",
            (
                (F.col("seg_sum") - F.col("cents")).cast("double")
                / (F.col("seg_n") - 1)
            ).alias("loo_enc_cents"),
        )
    )


@register(
    "part_price_qty_elasticity",
    """
    WITH j AS (
        SELECT p.p_brand,
               CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                    AS DECIMAL(19,0)) AS x,
               CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100
                    AS DECIMAL(19,0)) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), s AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(x) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
               CAST(CAST(SUM(y) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
               CAST(CAST(SUM(x * x) AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(x * y) AS DECIMAL(38,0)) AS DOUBLE) AS sxy
        FROM j GROUP BY p_brand
    )
    SELECT p_brand, n,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS qty_price_slope
    FROM s
    """,
    doc="Per-brand OLS slope of quantity against line price (a crude "
    "in-engine elasticity screen — negative slope means bigger-ticket "
    "lines move fewer units). All four sufficient statistics "
    "accumulate as exact DECIMAL(38,0) cents (a cent price squared "
    "overflows int64 at scale; decimal does not), then the closed-form "
    "slope is the identical double expression on both engines. One "
    "broadcast part-dim join + one brand-keyed partial agg: the "
    "lineitem scan never shuffles at data grain, output is 25 rows "
    "regardless of corpus size.",
)
def part_price_qty_elasticity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    # Exact int64 hi/lo accumulation instead of per-row BigDecimal
    # arithmetic: x, y are positive cent amounts < ~1.1e7, so the
    # cross products fit int64 exactly (xx, xy < ~1.2e14) and only
    # their SUMS can overflow. Splitting each product at 2^23
    # (hi = p >> 23 < 1.4e7, lo = p mod 2^23 < 8.4e6) keeps both
    # partial sums inside int64 up to ~7e11 rows PER BRAND (~30x the
    # 100 TB share of the hottest brand); the exact total is
    # reassembled as hi*2^23 + lo in DECIMAL at the 25-row brand
    # grain, so the emitted doubles are bit-identical to the oracle's
    # CAST(SUM(...) AS DECIMAL(38,0)) while every per-row op is a
    # codegen long multiply/shift. sxi/syi are PLAIN bigint sums of
    # the first-power cents (x <= ~1.1e7, y <= ~5e3): they wrap
    # SILENTLY (non-ANSI) only past ~8.4e11 / ~1.8e15 rows per brand —
    # ~30x / ~70000x the hottest brand's 100 TB share; split them at
    # 2^23 too if per-brand volume ever approaches that (r13 advisor).
    j = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        _cents_of("l_extendedprice").alias("x"),
        _cents_of("l_quantity").alias("y"),
    )
    sh = 23
    j = j.withColumn("xx", F.col("x") * F.col("x")).withColumn(
        "xy", F.col("x") * F.col("y")
    )
    hi = lambda c: F.shiftright(c, sh)
    lo = lambda c: F.col(c) - F.shiftleft(F.shiftright(c, sh), sh)
    a = j.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sxi"),
        F.sum("y").alias("syi"),
        F.sum(hi("xx")).alias("xxh"),
        F.sum(lo("xx")).alias("xxl"),
        F.sum(hi("xy")).alias("xyh"),
        F.sum(lo("xy")).alias("xyl"),
    )
    two = F.lit(1 << sh).cast("decimal(38,0)")
    s = a.select(
        "p_brand",
        "n",
        F.col("sxi").cast("decimal(38,0)").cast("double").alias("sx"),
        F.col("syi").cast("decimal(38,0)").cast("double").alias("sy"),
        (F.col("xxh").cast("decimal(38,0)") * two + F.col("xxl").cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        (F.col("xyh").cast("decimal(38,0)") * two + F.col("xyl").cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select("p_brand", "n", slope.alias("qty_price_slope"))


@register(
    "parts_skyline_per_brand",
    """
    WITH d AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS price_cents
        FROM part
    ), g AS (
        SELECT p_brand, price_cents, CAST(MAX(p_size) AS INTEGER) AS smax
        FROM d GROUP BY p_brand, price_cents
    ), r AS (
        SELECT p_brand, price_cents, smax,
               MAX(smax) OVER (PARTITION BY p_brand ORDER BY price_cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS run_prev
        FROM g
    )
    SELECT d.p_partkey, d.p_brand, d.price_cents, d.p_size
    FROM d
    JOIN r ON d.p_brand = r.p_brand AND d.price_cents = r.price_cents
    WHERE NOT (r.run_prev IS NOT NULL AND r.run_prev >= d.p_size)
      AND NOT (r.smax > d.p_size)
    """,
    doc="Per-brand skyline (Pareto front) of parts on (cheaper price, "
    "larger size): a part survives iff no same-brand part is <= its "
    "price AND >= its size with one strict. Computed with the "
    "O(n log n) sorted-sweep, not a self-join: collapse to per-(brand,"
    "price) max-size rows, one running-max window over strictly "
    "cheaper prices (rows are price-distinct so ROWS..1 PRECEDING is "
    "exactly the strict set), then dominance is two integer "
    "comparisons. groupBy, window, and join-back all share the brand "
    "partitioning — one exchange of dim-sized data, no pair "
    "enumeration anywhere, so the classic quadratic skyline blowup "
    "cannot happen at any scale.",
)
def parts_skyline_per_brand(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    d = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        _cents_of("p_retailprice").alias("price_cents"),
    )
    g = d.groupBy("p_brand", "price_cents").agg(
        F.max("p_size").cast("int").alias("smax")
    )
    w = (
        W.partitionBy("p_brand")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = g.select(
        "p_brand",
        "price_cents",
        "smax",
        F.max("smax").over(w).alias("run_prev"),
    )
    dominated = (
        F.col("run_prev").isNotNull() & (F.col("run_prev") >= F.col("p_size"))
    ) | (F.col("smax") > F.col("p_size"))
    return (
        d.join(r, ["p_brand", "price_cents"])
        .filter(~dominated)
        .select("p_partkey", "p_brand", "price_cents", "p_size")
    )


@register(
    "er_sorted_neighborhood_pairs",
    """
    WITH s AS (
        SELECT c_custkey, c_name, c_nationkey,
               LEAD(c_custkey, 1) OVER w AS k1,
               LEAD(c_name, 1) OVER w AS n1,
               LEAD(c_custkey, 2) OVER w AS k2,
               LEAD(c_name, 2) OVER w AS n2
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey)
    ), pairs AS (
        SELECT c_nationkey, c_custkey AS key_a, k1 AS key_b,
               CAST(levenshtein(c_name, n1) AS INTEGER) AS lev_dist
        FROM s WHERE k1 IS NOT NULL
        UNION ALL
        SELECT c_nationkey, c_custkey, k2,
               CAST(levenshtein(c_name, n2) AS INTEGER)
        FROM s WHERE k2 IS NOT NULL
    )
    SELECT c_nationkey, key_a, key_b, lev_dist
    FROM pairs WHERE lev_dist <= 2
    """,
    doc="Sorted-neighborhood blocking for entity resolution: within "
    "each nation block, sort customers by name and compare each row "
    "only to its 2 successors (window w=3), keeping pairs with "
    "Levenshtein distance <= 2 as merge candidates. The classic "
    "alternative to LSH blocking (fuzzy_part_name_pairs) when records "
    "have a sortable key: candidate count is w*n, never quadratic. "
    "One window per nation partition — the sort is bounded per block, "
    "never global — and edit distance is an exact integer on both "
    "engines. At 100 TB the blocking key just gets finer (nation -> "
    "name prefix) to bound partition width; the plan shape is "
    "unchanged.",
)
def er_sorted_neighborhood_pairs(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_name", "c_custkey")
    s = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.lead("c_custkey", 1).over(w).alias("k1"),
        F.lead("c_name", 1).over(w).alias("n1"),
        F.lead("c_custkey", 2).over(w).alias("k2"),
        F.lead("c_name", 2).over(w).alias("n2"),
    )

    # one explode, not a 2-arm union: a union would duplicate the
    # window subplan and rescan customer once per neighbor offset
    arms = F.array(
        *[
            F.struct(
                F.col(k).alias("key_b"),
                F.levenshtein("c_name", n).cast("int").alias("lev_dist"),
            )
            for k, n in (("k1", "n1"), ("k2", "n2"))
        ]
    )
    return (
        s.select(
            "c_nationkey",
            F.col("c_custkey").alias("key_a"),
            F.explode(arms).alias("p"),
        )
        .filter(F.col("p.key_b").isNotNull() & (F.col("p.lev_dist") <= 2))
        .select(
            "c_nationkey",
            "key_a",
            F.col("p.key_b").alias("key_b"),
            F.col("p.lev_dist").alias("lev_dist"),
        )
    )


@register(
    "orders_interpurchase_km",
    """
    WITH g AS (
        SELECT CAST(datediff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS gap_days
        FROM orders
    ), d AS (
        SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS d
        FROM g WHERE gap_days IS NOT NULL GROUP BY gap_days
    ), r AS (
        SELECT gap_days, d,
               CAST((SELECT SUM(d) FROM d) -
                    COALESCE(SUM(d) OVER (ORDER BY gap_days
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM d
    ), terms AS (
        SELECT gap_days, d, n_risk,
               CASE WHEN d < n_risk
                    THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                                    * 1e12) AS BIGINT)
                    ELSE NULL END AS term_pico
        FROM r
    )
    SELECT gap_days, d, n_risk,
           CASE WHEN d = n_risk THEN 0.0
                ELSE CAST(round(exp(CAST(CAST(SUM(term_pico) OVER
                         (ORDER BY gap_days ROWS UNBOUNDED PRECEDING)
                         AS BIGINT) AS DOUBLE) / 1e12) * 1e9) AS BIGINT)
                     / 1e9
           END AS survival
    FROM terms
    """,
    doc="Kaplan-Meier survival curve of customer inter-purchase gaps "
    "(days between consecutive orders) — the churn-model input: "
    "S(t) = prod(1 - d_i/n_i) over gap days <= t. The multiplicative "
    "recursion becomes a SUM of per-day ln(1-d/n) terms quantized to "
    "exact pico-units, cumulated by window, exponentiated once at the "
    "edge — order-independent and bit-equal across engines. The fact "
    "scan collapses through (customer-partitioned lag) -> per-day "
    "counts; the risk-set window runs over DISTINCT gap days (a few "
    "hundred rows at any corpus size — an audited bounded global "
    "window). The terminal day (d = n_risk) emits survival 0 exactly, "
    "dodging ln(0).",
)
def orders_interpurchase_km(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    wc = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wc))
        .cast("bigint")
        .alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    # materialize the ~1k-row distinct-day table once: the total and
    # the risk-set window would otherwise each rescan orders
    d = g.groupBy("gap_days").agg(
        F.count("*").cast("bigint").alias("d")
    ).localCheckpoint(eager=True)
    # total gaps via 1-row broadcast; running death counts via the
    # bounded distinct-day window
    tot = d.agg(F.sum("d").cast("bigint").alias("total"))
    wd = W.orderBy("gap_days").rowsBetween(W.unboundedPreceding, -1)
    r = d.crossJoin(F.broadcast(tot)).select(
        "gap_days",
        "d",
        (
            F.col("total")
            - F.coalesce(F.sum("d").over(wd), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    frac = F.col("d").cast("double") / F.col("n_risk")
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(F.log(1.0 - frac) * 1e12).cast("bigint"),
    )
    terms = r.select("gap_days", "d", "n_risk", term.alias("term_pico"))
    wcum = W.orderBy("gap_days").rowsBetween(W.unboundedPreceding, 0)
    # exp() is only 1-ulp-accurate and libm != JVM Math.exp; absorb
    # it by quantizing to an exact nano INTEGER then dividing
    # (round(x, 9) itself is not cross-engine stable).
    # Accepted residual hazard (ADVICE r9, accepted r10): this is the
    # one entry where a SECOND transcendental sits between the exact
    # pico-int cumsum and the emitted value, so a 1-ulp exp()
    # disagreement could still flip round(exp*1e9) at an exact .5-nano
    # boundary. Probabilistic, never observed at sf0.001/0.01/0.1;
    # consumers needing bit-stability can exponentiate the exact
    # term_pico cumsum themselves (it is derivable from the emitted
    # d/n_risk columns).
    surv = F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum("term_pico").over(wcum).cast("bigint").cast("double")
                / 1e12
            )
            * 1e9
        ).cast("bigint")
        / 1e9
    )
    return terms.select("gap_days", "d", "n_risk", surv.alias("survival"))


@register(
    "supplier_hhi_by_parttype",
    """
    WITH j AS (
        SELECT p.p_type, l.l_suppkey,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_type, l.l_suppkey
    ), tot AS (
        SELECT p_type, CAST(SUM(cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM j GROUP BY p_type
    ), terms AS (
        SELECT j.p_type, tot.n_suppliers,
               CAST(round((CAST(j.cents AS DOUBLE) / tot.total)
                          * (CAST(j.cents AS DOUBLE) / tot.total) * 1e12)
                    AS BIGINT) AS term_pico
        FROM j JOIN tot ON j.p_type = tot.p_type
    )
    SELECT p_type, CAST(MAX(n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(CAST(SUM(term_pico) AS BIGINT) AS DOUBLE) / 1e12 AS hhi
    FROM terms GROUP BY p_type
    """,
    doc="Herfindahl-Hirschman supplier-concentration index per part "
    "type (0..1; 1 = monopoly supplier) — the procurement-risk audit. "
    "Squared revenue shares are identical doubles from exact cent "
    "ratios, quantized to pico-units before the per-type sum. One "
    "broadcast dim join feeding a (type,supplier)-grain partial agg, "
    "then two type-keyed folds that reuse the same partitioning — the "
    "fact scan shuffles once at supplier grain, output is one row per "
    "type.",
)
def supplier_hhi_by_parttype(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cents = _cents_of("l_extendedprice")
    j = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
        # materialize the (type,supplier)-grain table (dictionary x dim
        # rows) once: totals and terms would otherwise rescan lineitem
        .localCheckpoint(eager=True)
    )
    tot = j.groupBy("p_type").agg(
        F.sum("cents").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    share = F.col("cents").cast("double") / F.col("total")
    term = F.round(share * share * 1e12).cast("bigint")
    terms = j.join(tot, "p_type").select(
        "p_type", "n_suppliers", term.alias("term_pico")
    )
    return terms.groupBy("p_type").agg(
        F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
        (F.sum("term_pico").cast("bigint").cast("double") / 1e12).alias(
            "hhi"
        ),
    )


@register(
    "orders_chi2_priority_by_segment",
    """
    WITH j AS (
        SELECT o.o_orderpriority AS priority, c.c_mktsegment AS segment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
        SELECT priority, segment, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM j GROUP BY priority, segment
    ), r AS (
        SELECT priority, CAST(SUM(n_obs) AS BIGINT) AS n_r
        FROM cells GROUP BY priority
    ), c AS (
        SELECT segment, CAST(SUM(n_obs) AS BIGINT) AS n_c
        FROM cells GROUP BY segment
    ), g AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
    e AS (
        SELECT cells.priority, cells.segment, n_obs,
               CAST(n_r AS DOUBLE) * n_c / n AS expected
        FROM cells
        JOIN r ON cells.priority = r.priority
        JOIN c ON cells.segment = c.segment
        CROSS JOIN g
    ), tt AS (
        SELECT priority, segment, n_obs, expected,
               (CAST(n_obs AS DOUBLE) - expected)
                   * (CAST(n_obs AS DOUBLE) - expected) / expected
                   AS chi2_cell
        FROM e
    ), tot AS (
        SELECT CAST(SUM(CAST(round(chi2_cell * 1000000.0) AS BIGINT))
                    AS BIGINT) AS chi2_micro
        FROM tt
    )
    SELECT priority, segment, n_obs, expected, chi2_cell,
           CAST(chi2_micro AS DOUBLE) / 1000000.0 AS chi2_total
    FROM tt CROSS JOIN tot
    """,
    doc="Chi-square test of independence between order priority and "
    "customer market segment — the categorical-association audit a "
    "feature store runs before one-hot-crossing two columns (a tiny "
    "chi2 means the cross adds no signal). One broadcast dim join + "
    "one (priority x segment)-keyed partial agg collapses the fact "
    "table to a dictionary-grain contingency table (<=25 rows, "
    "materialized once); expected counts and per-cell terms are "
    "identical double expressions over exact bigint marginals, and "
    "the 25-term total is quantized to exact micro-units per cell "
    "BEFORE summing, so the statistic is order-independent and "
    "bit-equal across engines. Output grain is the contingency cell "
    "with the total replicated — corpus-size-independent.",
)
def orders_chi2_priority_by_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(cu.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("c_mktsegment").alias("segment"),
    )
    # dictionary-grain contingency table, materialized once: marginals
    # and terms would otherwise rescan orders
    cells = (
        j.groupBy("priority", "segment")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    r = cells.groupBy("priority").agg(
        F.sum("n_obs").cast("bigint").alias("n_r")
    )
    c = cells.groupBy("segment").agg(
        F.sum("n_obs").cast("bigint").alias("n_c")
    )
    g = cells.agg(F.sum("n_obs").cast("bigint").alias("n"))
    e = (
        cells.join(F.broadcast(r), "priority")
        .join(F.broadcast(c), "segment")
        .crossJoin(F.broadcast(g))
        .select(
            "priority",
            "segment",
            "n_obs",
            (F.col("n_r").cast("double") * F.col("n_c") / F.col("n")).alias(
                "expected"
            ),
        )
    )
    chi2_cell = (
        (F.col("n_obs").cast("double") - F.col("expected"))
        * (F.col("n_obs").cast("double") - F.col("expected"))
        / F.col("expected")
    )
    tt = e.select(
        "priority", "segment", "n_obs", "expected",
        chi2_cell.alias("chi2_cell"),
    ).localCheckpoint(eager=True)
    tot = tt.agg(
        F.sum(F.round(F.col("chi2_cell") * 1000000.0).cast("bigint"))
        .cast("bigint")
        .alias("chi2_micro")
    )
    return tt.crossJoin(F.broadcast(tot)).select(
        "priority", "segment", "n_obs", "expected", "chi2_cell",
        (F.col("chi2_micro").cast("double") / 1000000.0).alias("chi2_total"),
    )


@register(
    "lineitem_anova_returnflag",
    """
    WITH s AS (
        SELECT l_returnflag AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(cents) AS DECIMAL(19,0)) AS sum_g,
               CAST(SUM(cents * cents) AS DECIMAL(38,0)) AS sumsq_g
        FROM (SELECT l_returnflag,
                     CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                          AS DECIMAL(19,0)) AS cents
              FROM lineitem)
        GROUP BY l_returnflag
    ), g AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sum_g) AS DECIMAL(19,0)) AS s_all,
               CAST(SUM(sumsq_g) AS DECIMAL(38,0)) AS ssq_all,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(CAST(sum_g * sum_g AS HUGEINT) // n_g
                             AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS grp_term
        FROM s
    ), f AS (
        SELECT n, k,
               CAST(grp_term
                    - CAST(CAST(s_all * s_all AS HUGEINT) // n
                           AS DECIMAL(38,0)) AS DOUBLE) AS ss_between,
               CAST(ssq_all - grp_term AS DOUBLE) AS ss_within
        FROM g
    )
    SELECT s.grp, s.n_g,
           CAST(s.sum_g AS DOUBLE) / s.n_g AS mean_cents,
           f.ss_between, f.ss_within,
           (f.ss_between / (f.k - 1)) / (f.ss_within / (f.n - f.k))
               AS f_stat
    FROM s CROSS JOIN f
    """,
    doc="One-way ANOVA of line price (cents) across return-flag groups "
    "— the does-this-category-move-the-metric screen run before "
    "treating a flag as a model feature. Per-group sufficient "
    "statistics (n, sum, sum-of-squares) accumulate as exact decimal "
    "cents in ONE fact-table pass; the cross-group sums-of-squares "
    "terms sum_g^2/n_g run as EXACT int128 integer division "
    "(DECIMAL(38,0) product, `div` / HUGEINT `//`) and fold as exact "
    "decimal adds, so SS_between / SS_within / F are "
    "order-independent and bit-equal across engines with no double "
    "op before the final cast. (An earlier double-based formulation "
    "diverged: Spark's round/cast rounds the shortest decimal string "
    "while DuckDB rounds the binary value — 1-ulp term flips at e18 "
    "magnitudes.) The sub-cent truncation of the integer division is "
    "statistically nil and engine-identical. Spark-side quotients "
    "stay int64-safe at ANY row count via the split "
    "floor(a^2/n) = (a div n)*a + ((a mod n)*a) div n — the only "
    "bound is a group's cent SUM fitting int64 ($9.2e16). Output is "
    "one row per group (<=3) with the shared statistics replicated; "
    "group grain is dictionary-bounded at any scale.",
)
def lineitem_anova_returnflag(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cents = _cents_of("l_extendedprice")
    # Exact int64 hi/lo accumulation of cents^2 (< 1.2e14, always an
    # exact long product): hi = sq >> 23 and lo = sq mod 2^23 keep both
    # partial sums inside int64 up to ~6.5e11 rows per returnflag
    # group (~3x the 100 TB share), and the exact DECIMAL(38,0) sumsq
    # reassembles as hi*2^23 + lo at the 3-row group grain — per-row
    # work is codegen long arithmetic, no BigDecimal.
    sh = 23
    sq = F.col("cents") * F.col("cents")
    s = (
        li.select(F.col("l_returnflag").alias("grp"), cents.alias("cents"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_g"),
            F.sum("cents").cast("decimal(19,0)").alias("sum_g"),
            F.sum(F.shiftright(sq, sh)).alias("_sqh"),
            F.sum(sq - F.shiftleft(F.shiftright(sq, sh), sh)).alias("_sql"),
        )
        .select(
            "grp",
            "n_g",
            "sum_g",
            (
                F.col("_sqh").cast("decimal(38,0)")
                * F.lit(1 << sh).cast("decimal(38,0)")
                + F.col("_sql").cast("decimal(38,0)")
            ).alias("sumsq_g"),
        )
        # 3-row group table materialized once: the grand fold and the
        # per-group output would otherwise rescan lineitem
        .localCheckpoint(eager=True)
    )
    # exact int128 quotient floor(a^2/n), int64-safe on the Spark side:
    # Spark `div` returns BIGINT, and a^2 div n can exceed it — but
    # with a = q*n + r, floor(a^2/n) = q*a + floor(r*a/n), where q (a
    # group mean in cents), the decimal product q*a, and the piece
    # quotient <= a all stay in range for any a up to 9.2e18 cents.
    # Bit-equal to DuckDB's HUGEINT // (validated both engines).
    def _sqdiv(a: str, n: str) -> str:
        return (
            f"CAST(CAST(({a} div {n}) AS DECIMAL(19,0)) * {a}"
            f" + CAST((({a} % {n}) * {a}) div {n} AS DECIMAL(38,0))"
            f" AS DECIMAL(38,0))"
        )

    grp_term = F.sum(F.expr(_sqdiv("sum_g", "n_g"))).cast("decimal(38,0)")
    g = s.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("sum_g").cast("decimal(19,0)").alias("s_all"),
        F.sum("sumsq_g").cast("decimal(38,0)").alias("ssq_all"),
        F.count("*").cast("bigint").alias("k"),
        grp_term.alias("grp_term"),
    )
    f = g.select(
        "n",
        "k",
        (F.col("grp_term") - F.expr(_sqdiv("s_all", "n")))
        .cast("double")
        .alias("ss_between"),
        (F.col("ssq_all") - F.col("grp_term")).cast("double").alias(
            "ss_within"
        ),
    )
    return s.crossJoin(F.broadcast(f)).select(
        "grp",
        "n_g",
        (F.col("sum_g").cast("double") / F.col("n_g")).alias("mean_cents"),
        "ss_between",
        "ss_within",
        (
            (F.col("ss_between") / (F.col("k") - 1))
            / (F.col("ss_within") / (F.col("n") - F.col("k")))
        ).alias("f_stat"),
    )
