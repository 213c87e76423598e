"""Data-quality / constraint-audit catalog entries (Deequ-style).

A 100 TB training-data pipeline runs these BEFORE training ever sees the
data: completeness, uniqueness, referential integrity, freshness, and
volume-shift monitors. Each is a one-or-two-scan aggregate whose output
is a small per-group report — the shape a scheduler alerts on.

The reference has no declarative DQ layer (its closest analogue is the
per-service drop/error accounting, svc/main.cpp:179-199 + router drop
counters); these generalize that "count what's wrong, cheaply, inline"
idea to batch corpus audits.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.queries._util import cents as _cents_of, t

# Allowed language codes for the documents table; anything else counts
# as a constraint violation (ISO-639-1 whitelist a curation run pins).
_LANGS = ("en", "de", "fr", "es", "zh")


@register(
    "dq_documents_audit",
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
           CAST(SUM(CASE WHEN lang IN {_LANGS!r} THEN 0 ELSE 1 END)
                AS BIGINT) AS lang_violations,
           CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_chars_mismatch,
           CAST(SUM(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS short_docs
    FROM documents
    GROUP BY source
    """,
    doc="Deequ-style completeness/validity audit in ONE scan: empty "
    "text, out-of-whitelist lang, n_chars/text disagreement, too-short "
    "docs — all as conditional sums inside a single per-source "
    "aggregate, so the 100 TB audit costs exactly one pass with "
    "map-side partial aggregation and a 20-row shuffle.",
)
def dq_documents_audit(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    c = lambda pred: F.sum(F.when(pred, 1).otherwise(0)).cast("bigint")
    return d.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        c(F.col("text").isNull() | (F.length("text") == 0)).alias("empty_text"),
        # CASE WHEN lang IN (...) THEN 0 ELSE 1 counts NULL as a
        # violation; ~isin() would map NULL -> 0 and diverge
        F.sum(F.when(F.col("lang").isin(*_LANGS), 0).otherwise(1))
        .cast("bigint")
        .alias("lang_violations"),
        c(F.col("n_chars") != F.length("text")).alias("n_chars_mismatch"),
        c(F.col("n_chars") < 50).alias("short_docs"),
    )


@register(
    "dq_referential_integrity",
    """
    SELECT 'orders.o_custkey->customer' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    doc="Foreign-key orphan audit: LEFT JOIN + conditional count per "
    "constraint. Dimension sides (customer/part/supplier) broadcast, so "
    "three of the four checks are shuffle-free map joins over the fact "
    "scan; lineitem->orders is the one genuine fact-fact shuffle. "
    "Partial aggregation collapses each branch to one row before the "
    "final union.",
)
def dq_referential_integrity(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")

    def check(fact, dim, fk, pk, name):
        d = dim.select(pk)
        j = fact.join(F.broadcast(d), fact[fk] == d[pk], "left")
        return j.agg(
            F.lit(name).alias("fk"),
            F.count("*").alias("n_checked"),
            F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
        ).select("fk", "n_checked", "n_orphans")

    # lineitem->orders: orders is fact-sized; do NOT broadcast — a real
    # shuffle join, with the count collapsing map-side after it.
    okeys = orders.select("o_orderkey")
    lo = lineitem.join(
        okeys, lineitem["l_orderkey"] == okeys["o_orderkey"], "left"
    ).agg(
        F.lit("lineitem.l_orderkey->orders").alias("fk"),
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphans"),
    ).select("fk", "n_checked", "n_orphans")

    return (
        check(orders, t(spark, sf_dir, "customer"), "o_custkey", "c_custkey",
              "orders.o_custkey->customer")
        .unionByName(lo)
        .unionByName(check(lineitem, t(spark, sf_dir, "part"), "l_partkey",
                           "p_partkey", "lineitem.l_partkey->part"))
        .unionByName(check(lineitem, t(spark, sf_dir, "supplier"), "l_suppkey",
                           "s_suppkey", "lineitem.l_suppkey->supplier"))
    )


@register(
    "dq_key_uniqueness",
    """
    SELECT 'orders' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_keys,
           CAST(MAX(c) AS BIGINT) AS max_multiplicity
    FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'events', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MAX(c) AS BIGINT)
    FROM (SELECT event_id, COUNT(*) AS c FROM events GROUP BY event_id)
    UNION ALL
    SELECT 'documents', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MAX(c) AS BIGINT)
    FROM (SELECT doc_id, COUNT(*) AS c FROM documents GROUP BY doc_id)
    UNION ALL
    SELECT 'lineitem', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MAX(c) AS BIGINT)
    FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS c
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
    """,
    doc="Primary-key uniqueness audit across four tables (composite key "
    "for lineitem): per-key count then a one-row fold per table. Each "
    "branch is a hash aggregate on the key only — payload columns are "
    "pruned at the scan, and the second-level fold is map-side.",
)
def dq_key_uniqueness(spark, sf_dir):
    def per_key(df, keys, name):
        g = df.groupBy(*keys).agg(F.count("*").alias("c"))
        return g.agg(
            F.lit(name).alias("table_name"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_keys"),
            F.max("c").cast("bigint").alias("max_multiplicity"),
        ).select("table_name", "n_rows", "n_keys", "n_dup_keys",
                 "max_multiplicity")

    return (
        per_key(t(spark, sf_dir, "orders"), ["o_orderkey"], "orders")
        .unionByName(per_key(t(spark, sf_dir, "events"), ["event_id"], "events"))
        .unionByName(per_key(t(spark, sf_dir, "documents"), ["doc_id"],
                             "documents"))
        .unionByName(per_key(t(spark, sf_dir, "lineitem"),
                             ["l_orderkey", "l_linenumber"], "lineitem"))
    )


@register(
    "dq_events_freshness",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((MAX(epoch_us(MAX(ts))) OVER () - epoch_us(MAX(ts)))
                // 60000000 AS BIGINT) AS minutes_behind
    FROM events
    GROUP BY event_type
    """,
    doc="Freshness monitor: per-stream high watermark vs the global "
    "high watermark, in whole minutes. One aggregate pass; the window "
    "max runs on the already-aggregated handful of rows. The lag is "
    "integer epoch-MICROsecond arithmetic with one floor division — "
    "second-granularity extraction would truncate on one engine and "
    "keep fractional seconds on the other, flipping the minute bucket "
    "when a watermark straddles a boundary. This is the batch twin of "
    "the streaming lateness audit (events_lateness_audit).",
)
def dq_events_freshness(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.max("ts")).alias("mx_us"),
    )
    # global watermark via an empty-partition window on the tiny
    # aggregated table (a handful of rows — not a scale concern)
    g = F.max("mx_us").over(W.partitionBy())
    return agg.select(
        "event_type",
        "n_events",
        F.floor((g - F.col("mx_us")) / 60000000)
        .cast("bigint")
        .alias("minutes_behind"),
    )


@register(
    "dq_volume_shift_daily",
    """
    WITH observed AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)
    ), spine AS (
      SELECT CAST(UNNEST(generate_series(MIN(day), MAX(day),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM observed
    ), daily AS (
      SELECT s.day, COALESCE(o.n, 0) AS n
      FROM spine s LEFT JOIN observed o ON s.day = o.day
    ), trail AS (
      SELECT day, n,
             SUM(n) OVER (ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS trail_sum,
             COUNT(n) OVER (ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS trail_days
      FROM daily
    )
    SELECT CAST(day AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n_events,
           CAST(n AS DOUBLE) * trail_days / trail_sum AS vs_trailing,
           CAST(n AS DOUBLE) * trail_days > 2.0 * trail_sum
             OR 2.0 * CAST(n AS DOUBLE) * trail_days < trail_sum
             AS shifted
    FROM trail
    WHERE trail_days > 0 AND trail_sum > 0
    """,
    doc="Volume-shift monitor: each day's event count vs its trailing "
    "7-day average; flags >2x swings in either direction (the pipeline-"
    "broke / upstream-double-published alarm). The daily counts are "
    "densified onto a calendar spine first, so a silent day shows up "
    "as an explicit zero (and flags as shifted) instead of vanishing — "
    "and the 7-ROW trailing window really means 7 calendar days even "
    "across gaps. Windows run on the ~30-row spine, never raw events; "
    "the ratio is computed from exact integer sums so both engines "
    "emit identical doubles.",
)
def dq_volume_shift_daily(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    observed = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    bounds = observed.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = spine.join(observed, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    trail = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("trail_sum"),
        F.count("n").over(w).alias("trail_days"),
    )
    nd = F.col("n").cast("double")
    return trail.where(
        (F.col("trail_days") > 0) & (F.col("trail_sum") > 0)
    ).select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        # raw double ratio of exact integers: identical operands on both
        # engines -> identical double. A ROUND here would be engine-
        # divergent whenever the rational terminates just past the
        # rounding position (Java rounds the shortest string, C the
        # binary value).
        (nd * F.col("trail_days") / F.col("trail_sum")).alias("vs_trailing"),
        (
            (nd * F.col("trail_days") > 2.0 * F.col("trail_sum"))
            | (2.0 * nd * F.col("trail_days") < F.col("trail_sum"))
        ).alias("shifted"),
    )


@register(
    "dq_schema_drift",
    """
    WITH m AS (
        SELECT
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0 THEN lang END) AS BIGINT) AS ndv_lang_a,
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT) AS ndv_lang_b,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 AND lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang_a,
          CAST(SUM(CASE WHEN doc_id % 2 = 1 AND lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang_b,
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0 THEN source END) AS BIGINT) AS ndv_source_a,
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END) AS BIGINT) AS ndv_source_b,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 AND source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source_a,
          CAST(SUM(CASE WHEN doc_id % 2 = 1 AND source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source_b,
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0 THEN n_chars END) AS BIGINT) AS ndv_n_chars_a,
          CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS ndv_n_chars_b,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 AND n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_n_chars_a,
          CAST(SUM(CASE WHEN doc_id % 2 = 1 AND n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_n_chars_b
        FROM documents
    )
    SELECT 'lang' AS col, ndv_lang_a AS ndv_a, ndv_lang_b AS ndv_b,
           null_lang_a AS nulls_a, null_lang_b AS nulls_b,
           ndv_lang_a <> ndv_lang_b OR null_lang_a <> null_lang_b AS drifted
    FROM m
    UNION ALL
    SELECT 'source', ndv_source_a, ndv_source_b,
           null_source_a, null_source_b,
           ndv_source_a <> ndv_source_b OR null_source_a <> null_source_b
    FROM m
    UNION ALL
    SELECT 'n_chars', ndv_n_chars_a, ndv_n_chars_b,
           null_n_chars_a, null_n_chars_b,
           ndv_n_chars_a <> ndv_n_chars_b OR null_n_chars_a <> null_n_chars_b
    FROM m
    """,
    doc="Schema/profile drift between corpus snapshots (halves by "
    "doc_id parity standing in for release N vs N+1): per column, the "
    "distinct-value and null counts of each side with a drift flag — "
    "the upstream-changed-its-export alarm that catches a source "
    "silently dropping a language or nulling a field. ONE scan "
    "computes every profile (conditional distinct/sum aggregates), "
    "then the 1-row result unpivots to column grain — bounded by the "
    "schema width, never the data.",
)
def dq_schema_drift(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    half_a = F.col("doc_id") % 2 == 0
    half_b = F.col("doc_id") % 2 == 1

    def prof(col):
        return [
            F.countDistinct(F.when(half_a, F.col(col)))
            .cast("bigint")
            .alias(f"ndv_{col}_a"),
            F.countDistinct(F.when(half_b, F.col(col)))
            .cast("bigint")
            .alias(f"ndv_{col}_b"),
            F.sum(F.when(half_a & F.col(col).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"null_{col}_a"),
            F.sum(F.when(half_b & F.col(col).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"null_{col}_b"),
        ]

    cols = ("lang", "source", "n_chars")
    m = d.agg(*[a for c in cols for a in prof(c)])
    stacked = m.selectExpr(
        "stack(3, "
        + ", ".join(
            f"'{c}', ndv_{c}_a, ndv_{c}_b, null_{c}_a, null_{c}_b"
            for c in cols
        )
        + ") as (col, ndv_a, ndv_b, nulls_a, nulls_b)"
    )
    return stacked.select(
        "col",
        "ndv_a",
        "ndv_b",
        "nulls_a",
        "nulls_b",
        (
            (F.col("ndv_a") != F.col("ndv_b"))
            | (F.col("nulls_a") != F.col("nulls_b"))
        ).alias("drifted"),
    )


@register(
    "text_encoding_audit",
    """
    WITH x AS (
        SELECT source,
               length(text) AS n_chars_m,
               length(text) - length(regexp_replace(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS ctrl,
               length(text) - length(regexp_replace(text,
                   '[^\\x00-\\x7F]', '', 'g')) AS non_ascii,
               length(text) - length(replace(text, chr(65533), '')) AS repl
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_control,
           CAST(SUM(CASE WHEN repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_replacement,
           CAST(SUM(non_ascii) AS BIGINT) AS non_ascii_chars,
           CAST(SUM(n_chars_m) AS BIGINT) AS total_chars,
           round(SUM(non_ascii) / CAST(NULLIF(SUM(n_chars_m), 0) AS DOUBLE), 6)
               AS non_ascii_ratio
    FROM x GROUP BY source
    """,
    doc="Encoding-health audit per source — the mojibake gate a crawl "
    "ingest runs before any text operator trusts the bytes: docs "
    "containing C0 control characters (tab/newline/CR excluded — "
    "legitimate whitespace), docs containing U+FFFD replacement "
    "characters (the scar a lossy transcode leaves), and the "
    "non-ASCII character ratio per source (a sudden jump on an "
    "ASCII-dominant source means the upstream changed encodings; on a "
    "CJK source it is the norm — which is why the ratio reports per "
    "source, never globally). One scan, three regex counts computed "
    "scan-side (JVM/RE2 — character classes chosen to behave "
    "identically on both engines, pinned by the driver hash), one "
    "source-grain partial agg; text never shuffles. The ratio is one "
    "double division of exact bigint sums at round(6).",
)
def text_encoding_audit(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n = F.length("text")
    ctrl = n - F.length(
        F.regexp_replace("text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    )
    non_ascii = n - F.length(F.regexp_replace("text", "[^\\x00-\\x7F]", ""))
    repl = n - F.length(F.regexp_replace("text", "�", ""))
    x = d.select(
        "source",
        n.alias("n_chars_m"),
        ctrl.alias("ctrl"),
        non_ascii.alias("non_ascii"),
        repl.alias("repl"),
    )
    total = F.sum("n_chars_m")
    na = F.sum("non_ascii")
    return x.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("ctrl") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_control"),
        F.sum(F.when(F.col("repl") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_replacement"),
        na.cast("bigint").alias("non_ascii_chars"),
        total.cast("bigint").alias("total_chars"),
        F.round(na / F.nullif(total.cast("double"), F.lit(0.0)), 6).alias(
            "non_ascii_ratio"
        ),
    )


@register(
    "privacy_k_anonymity_audit",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      FROM customer
    ), grp AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             COUNT(*) AS k
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_customers,
           CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
    FROM grp GROUP BY k
    """,
    doc="k-anonymity audit (Sweeney) over the quasi-identifier tuple "
    "(nation, market segment, $1000 account-balance band): group sizes "
    "k, how many equivalence classes and customers sit at each k, and "
    "which k values fall below the k=5 re-identification threshold — "
    "the privacy gate a curation pipeline runs before releasing "
    "user-derived training data. The banding uses floor(x/1000.0) on "
    "the raw double (1000 is a power-of-10 exactly representable; the "
    "single IEEE division then floor is bit-identical across engines). "
    "At 100 TB: one partial-aggregating scan to QI-group grain, then a "
    "k-grain re-aggregate whose cardinality is bounded by max group "
    "size, not data size.",
)
def privacy_k_anonymity_audit(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint").alias(
            "bal_band"
        ),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("k")
    )
    return grp.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_customers"),
        F.max(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("int")
        .alias("at_risk"),
    )


@register(
    "dq_benford_totalprice",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                               * 100 AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) > 0
    ), tot AS (SELECT COUNT(*) AS n FROM digits)
    SELECT d.digit,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS DOUBLE) / MAX(t.n) AS observed_p,
           round(ln(1.0 + 1.0 / d.digit) / ln(10.0), 8) AS benford_p
    FROM digits d CROSS JOIN tot t
    GROUP BY d.digit
    """,
    doc="Benford's-law first-significant-digit audit on order totals — "
    "the forensic-accounting DQ check for fabricated or truncated "
    "monetary data: observed first-digit shares vs the Benford "
    "expectation log10(1 + 1/d). The digit comes from the exact cents "
    "integer rendered as a string (no float log10 for digit "
    "extraction); the expectation's ln ratio is rounded to 8 decimals "
    "at the source per the house libm rule. One scan to a 9-row "
    "aggregate with a broadcast scalar total.",
)
def dq_benford_totalprice(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cents = _cents_of("o_totalprice")
    digits = o.select(cents.alias("c")).where(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    tot = digits.agg(F.count("*").alias("n"))
    return (
        digits.join(F.broadcast(tot))
        .groupBy("digit")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            (F.count("*").cast("double") / F.max("n")).alias("observed_p"),
            F.round(
                F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
                / F.log(F.lit(10.0)),
                8,
            ).alias("benford_p"),
        )
    )


@register(
    "dq_iqr_outlier_fences",
    """
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ), ranked AS (
      SELECT priority, cents,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY cents, cents) AS rn,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM c
    ), quart AS (
      SELECT priority,
             MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN cents END) AS q1c,
             MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN cents END) AS q3c,
             MAX(n) AS n
      FROM ranked GROUP BY priority
    )
    SELECT c.priority,
           CAST(MAX(q.n) AS BIGINT) AS n_orders,
           MAX(q.q1c) / 100.0 AS q1,
           MAX(q.q3c) / 100.0 AS q3,
           CAST(SUM(CASE WHEN 2 * c.cents < 5 * q.q1c - 3 * q.q3c
                           OR 2 * c.cents > 5 * q.q3c - 3 * q.q1c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM c JOIN quart q ON c.priority = q.priority
    GROUP BY c.priority
    """,
    doc="Tukey-fence outlier audit per order priority: rank-discrete "
    "quartiles (type-1, value at ceil(q*n) — no interpolation formula "
    "to diverge across engines) and 1.5-IQR fences evaluated entirely "
    "in doubled integer cents (2x < 5*q1 - 3*q3 IS x < q1 - 1.5*IQR "
    "cleared of fractions). The DQ staple that flags fat-finger "
    "monetary rows before they poison downstream aggregates. One "
    "priority-partitioned rank pass + one fence scan joined to a "
    "5-row quartile table.",
)
def dq_iqr_outlier_fences(spark, sf_dir):
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("priority"),
        _cents_of("o_totalprice").alias("cents"),
    )
    wp = W.partitionBy("priority")
    ranked = c.select(
        "priority",
        "cents",
        F.row_number().over(wp.orderBy("cents", "cents")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    quart = ranked.groupBy("priority").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("q1c"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("q3c"),
        F.max("n").alias("n"),
    )
    j = c.join(F.broadcast(quart), "priority")
    out_pred = (2 * F.col("cents") < 5 * F.col("q1c") - 3 * F.col("q3c")) | (
        2 * F.col("cents") > 5 * F.col("q3c") - 3 * F.col("q1c")
    )
    return j.groupBy("priority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        (F.max("q1c") / 100.0).alias("q1"),
        (F.max("q3c") / 100.0).alias("q3"),
        F.sum(F.when(out_pred, 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


@register(
    "source_lang_independence_cells",
    """
    WITH o AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ), rt AS (SELECT source, SUM(n) AS row_n FROM o GROUP BY source),
    ct AS (SELECT lang, SUM(n) AS col_n FROM o GROUP BY lang),
    tot AS (SELECT SUM(n) AS grand FROM o)
    SELECT o.source, o.lang,
           CAST(o.n AS BIGINT) AS n,
           CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.grand AS expected,
           (o.n - CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.grand)
             * (o.n - CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.grand)
             / (CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.grand)
             AS chi2_contrib
    FROM o
    JOIN rt ON o.source = rt.source
    JOIN ct ON o.lang = ct.lang
    CROSS JOIN tot
    """,
    doc="Chi-square independence cells for the source x language "
    "contingency table: observed counts, expected counts under "
    "independence (exact integer product over one division), and each "
    "cell's chi2 contribution — the audit that says whether language "
    "mix is a property of the corpus or of specific sources (a "
    "prerequisite for per-source language balancing). Per-cell "
    "emission keeps every float op a fixed per-row tree (no "
    "order-dependent global sum); the marginals are tiny broadcast "
    "rollups of the one (source, lang) aggregate.",
)
def source_lang_independence_cells(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    o = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    rt = o.groupBy("source").agg(F.sum("n").alias("row_n"))
    ct = o.groupBy("lang").agg(F.sum("n").alias("col_n"))
    tot = o.agg(F.sum("n").alias("grand"))
    j = (
        o.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .join(F.broadcast(tot))
    )
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("grand")
    return j.select(
        "source",
        "lang",
        F.col("n").cast("bigint").alias("n"),
        e.alias("expected"),
        ((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2_contrib"),
    )


@register(
    "privacy_l_diversity_audit",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      FROM customer
    ), grp AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS k,
             COUNT(DISTINCT bal_band) AS l
      FROM qi GROUP BY 1, 2
    )
    SELECT CAST(l AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_customers,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(CASE WHEN l < 3 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
    FROM grp GROUP BY l
    """,
    doc="l-diversity audit (Machanavajjhala et al.): with the balance "
    "band as the SENSITIVE attribute and (nation, segment) as the "
    "quasi-identifiers, how many distinct sensitive values each "
    "equivalence class contains — k-anonymity alone "
    "(privacy_k_anonymity_audit) cannot stop an attacker when every "
    "member of a class shares one sensitive value, which is exactly "
    "the l=1 row here. Classes histogram by l with the l<3 "
    "homogeneity flag. One QI-grain aggregate (distinct-count partial "
    "per class) and an l-grain rollup bounded by the sensitive "
    "domain, not data size.",
)
def privacy_l_diversity_audit(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("bigint")
        .alias("bal_band"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("k"),
        F.countDistinct("bal_band").alias("l"),
    )
    return grp.groupBy(F.col("l").cast("bigint").alias("l")).agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_customers"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("int")
        .alias("at_risk"),
    )


@register(
    "dq_psi_price_drift",
    """
    WITH b AS (
        SELECT CAST(least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT) // 6000000, 9) AS INTEGER)
                   AS bucket,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS before
        FROM orders
    ), c AS (
        SELECT bucket,
               CAST(SUM(before) AS BIGINT) AS n_before,
               CAST(COUNT(*) - SUM(before) AS BIGINT) AS n_after
        FROM b GROUP BY bucket
    ), tot AS (
        SELECT CAST(SUM(n_before) AS BIGINT) AS tb,
               CAST(SUM(n_after) AS BIGINT) AS ta
        FROM c
    ), shares AS (
        SELECT c.bucket, c.n_before, c.n_after,
               CAST(c.n_before + 1 AS DOUBLE) / (tot.tb + 10) AS p,
               CAST(c.n_after + 1 AS DOUBLE) / (tot.ta + 10) AS q
        FROM c, tot
    ), terms AS (
        SELECT bucket, n_before, n_after, p, q,
               CAST(round((p - q) * ln(p / q) * 1e12) AS BIGINT)
                   AS term_pico
        FROM shares
    )
    SELECT bucket, n_before, n_after, p, q, term_pico,
           CAST((SELECT CAST(SUM(term_pico) AS BIGINT) FROM terms)
                AS DOUBLE) / 1e12 AS psi
    FROM terms
    """,
    doc="Population Stability Index between pre- and post-1998 order "
    "values over 10 fixed $60k price buckets — the standard drift "
    "gate before a model retrain consumes a new snapshot (PSI > 0.2 "
    "= investigate). Laplace +1 smoothing keeps every fixed bucket "
    "defined; each bucket's PSI term is an identical double expression "
    "quantized to exact pico-units BEFORE the total sum, so the "
    "10-term aggregate is order-independent and bit-equal across "
    "engines (a raw double sum would not be). One scan, one "
    "bucket-keyed partial agg; the 10-row stats table cross-joins "
    "back broadcast. Bucket edges are FIXED constants, so the 100 TB "
    "run's schema and semantics match the test run's exactly.",
)
def dq_psi_price_drift(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # the cast chain exists ONCE; `div` has no Column-API form, so the
    # bucket derives from the named column via expr (o_totalprice > 0,
    # where div == floor division on both engines)
    cents = _cents_of("o_totalprice")
    b = o.withColumn("cents", cents).select(
        F.least(F.expr("cents div 6000000"), F.lit(9))
        .cast("int")
        .alias("bucket"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("before"),
    )
    # materialize the 10-row bucket table once: totals, terms and the
    # PSI sum would otherwise each rescan orders
    c = b.groupBy("bucket").agg(
        F.sum("before").cast("bigint").alias("n_before"),
        (F.count("*") - F.sum("before")).cast("bigint").alias("n_after"),
    ).localCheckpoint(eager=True)
    # per-bucket smoothed shares need the totals: annotate via a 1-row
    # broadcast cross join, never a global window over the fact
    tots = c.agg(
        F.sum("n_before").cast("bigint").alias("tb"),
        F.sum("n_after").cast("bigint").alias("ta"),
    )
    j = c.crossJoin(F.broadcast(tots))
    p = (F.col("n_before") + 1).cast("double") / (F.col("tb") + 10)
    q = (F.col("n_after") + 1).cast("double") / (F.col("ta") + 10)
    term = F.round((p - q) * F.log(p / q) * 1e12).cast("bigint")
    terms = j.select(
        "bucket", "n_before", "n_after",
        p.alias("p"), q.alias("q"), term.alias("term_pico"),
    )
    psi = terms.agg(
        F.sum("term_pico").cast("bigint").alias("psi_pico")
    )
    return terms.crossJoin(F.broadcast(psi)).select(
        "bucket", "n_before", "n_after", "p", "q", "term_pico",
        (F.col("psi_pico").cast("double") / 1e12).alias("psi"),
    )
