"""Mergeable-sketch and exact-moment statistics catalog entries.

The 100 TB pattern: aggregate once at fine grain into MERGEABLE
sketches (HLL, quantile digests), then answer coarser-grain questions
by sketch union — never re-scanning raw data. Spark ships Apache
DataSketches HLL (`hll_sketch_agg` / `hll_union_agg`, SPARK-16484 line)
and rank-error-bounded `percentile_approx`.

Sketch internals differ per implementation, so (like
`approx_distinct_docs_hll`) the compared output is tolerance-banded:
each engine runs its OWN sketch and reports whether it landed within
tolerance of the exact answer, which itself must match bit-for-bit.
A broken sketch path flips the boolean and fails the hash compare.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.queries._util import cents as _cents_of, t


@register(
    "hll_user_rollup_merge",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           ABS(approx_count_distinct(user_id)
               - COUNT(DISTINCT user_id))
             <= 0.05 * COUNT(DISTINCT user_id) AS merged_within_tol
    FROM events
    GROUP BY event_type
    """,
    doc="Hierarchical distinct-count rollup via MERGEABLE sketches: "
    "per-(event_type, day) HLL sketches of user_id are unioned up to "
    "event_type grain and estimated — the two-level shape that lets a "
    "100 TB pipeline keep daily sketches and answer monthly/all-time "
    "NDV by union instead of re-scanning raw events. The Spark side "
    "really does sketch->union->estimate (hll_sketch_agg + "
    "hll_union_agg); the oracle band compares each engine's own sketch "
    "to the bit-exact distinct counts.",
)
def hll_user_rollup_merge(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    # event_type cardinality is tiny — broadcast the sketch rollup onto
    # the exact aggregate
    return exact.join(F.broadcast(merged), "event_type").select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        "exact_users",
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_within_tol"),
    )


@register(
    "quantile_sketch_prices",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                   * 100 AS BIGINT), 0.5)
                AS DOUBLE) AS exact_p50_cents,
           ABS(approx_quantile(o_totalprice, 0.5)
               - quantile_cont(o_totalprice, 0.5))
             <= 0.05 * quantile_cont(o_totalprice, 0.5) AS p50_within_tol,
           ABS(approx_quantile(o_totalprice, 0.9)
               - quantile_cont(o_totalprice, 0.9))
             <= 0.05 * quantile_cont(o_totalprice, 0.9) AS p90_within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Quantile sketches per group: Spark percentile_approx (rank-"
    "error bounded, mergeable across partitions — the shuffle-light "
    "path for 100 TB percentile dashboards) banded at 5%% against the "
    "exact linear-interpolated median, which is computed over INTEGER "
    "cents — every midpoint (a+b)/2 is an exactly-representable "
    "double, so the interpolation is bit-identical on both engines "
    "with no rounding step to disagree on. DuckDB runs its own "
    "t-digest approx_quantile through the same band.",
)
def quantile_sketch_prices(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    cents = _cents_of(price)
    # one exact-percentile buffer and one approx sketch, each queried
    # at both points (array form), instead of five independent agg
    # buffers over the same rows — the per-row insert work is the agg's
    # whole cost here (measured 1.13 -> 0.87 s; values identical, the
    # array-form sketch sees the same inserts so it answers the same)
    ex = F.percentile(price, F.array(F.lit(0.5), F.lit(0.9)))
    ap = F.percentile_approx(
        price, F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    g = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.percentile(cents, F.lit(0.5))
        .cast("double")
        .alias("exact_p50_cents"),
        ex.alias("_ex"),
        ap.alias("_ap"),
    )
    band = lambda i: (
        F.abs(F.element_at("_ap", i) - F.element_at("_ex", i))
        <= 0.05 * F.element_at("_ex", i)
    )
    return g.select(
        "o_orderstatus",
        "n_orders",
        "exact_p50_cents",
        band(1).alias("p50_within_tol"),
        band(2).alias("p90_within_tol"),
    )


@register(
    "embedding_dim_variance",
    """
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(x6) AS BIGINT) AS DOUBLE)
             / COUNT(*) / 1000000 AS mean_val,
           (CAST(CAST(SUM(x6 * x6) AS BIGINT) AS DOUBLE)
            - CAST(CAST(SUM(x6) AS BIGINT) AS DOUBLE)
              * CAST(CAST(SUM(x6) AS BIGINT) AS DOUBLE) / COUNT(*))
             / COUNT(*) / 1e12 AS var_val
    FROM (
      SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS x6
      FROM embeddings
    )
    GROUP BY dim
    """,
    doc="Per-dimension feature moments over the embedding matrix "
    "(the normalize/whiten preflight): posexplode to (dim, value), one "
    "aggregate keyed by the 64 dims. Values are fixed-point-quantized "
    "to 1e-6 (floor of a double both engines share bit-for-bit); the "
    "sums and sums-of-squares are exact int64s that stay under 2^53 "
    "up to ~9M values/dim, so every int->double conversion is "
    "correctly rounded on both engines and the identical double "
    "expression yields identical moments with NO rounding step. "
    "(Bigger grains need DECIMAL sums on the Spark side — but NOT a "
    "single >2^53 cast in the oracle: DuckDB's HUGEINT->DOUBLE is off "
    "by 1 ulp. A double ROUND is likewise engine-divergent when the "
    "value's expansion terminates near the rounding position.) At "
    "100 TB the same plan holds: map-side partial agg reduces each "
    "partition to 64 rows.",
)
def embedding_dim_variance(spark, sf_dir):
    em = t(spark, sf_dir, "embeddings")
    ex = em.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000)
        .cast("bigint")
        .alias("x6"),
    )
    s6 = F.sum("x6").cast("double")
    ssq = F.sum(F.col("x6") * F.col("x6")).cast("double")
    n = F.count("*")
    return ex.groupBy("dim").agg(
        n.alias("n"),
        (s6 / n / 1000000).alias("mean_val"),
        ((ssq - s6 * s6 / n) / n / 1e12).alias("var_val"),
    )


def _pca_iter(i: int) -> str:
    """One unrolled power-iteration round: y = X v, w = X'y, norm."""
    return f"""y{i} AS (
      SELECT vid, CAST(SUM(CAST(round(xv * vv, 10) AS DECIMAL(28,10)))
                       AS DOUBLE) AS y
      FROM x JOIN v{i - 1} USING (pos) GROUP BY vid
    ), w{i} AS (
      SELECT pos, CAST(SUM(CAST(round(y * xv, 8) AS DECIMAL(28,8)))
                       AS DOUBLE) AS w
      FROM x JOIN y{i} USING (vid) GROUP BY pos
    ), n{i} AS (
      SELECT sqrt(CAST(SUM(CAST(round(w * w, 8) AS DECIMAL(28,8)))
                       AS DOUBLE)) AS nrm FROM w{i}
    ), v{i} AS (
      SELECT pos, round(w / (SELECT nrm FROM n{i}), 8) AS vv FROM w{i}
    )"""


@register(
    "embedding_pca_power",
    f"""
    WITH x AS (
      SELECT vec_id AS vid,
             CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS xv
      FROM embeddings
    ),
    v0 AS (SELECT DISTINCT pos, CAST(0.125 AS DOUBLE) AS vv FROM x),
    {_pca_iter(1)},
    {_pca_iter(2)}
    SELECT pos AS dim,
           round(w / (SELECT nrm FROM n2), 6) AS loading,
           round((SELECT nrm FROM n2), 4) AS sigma_est
    FROM w2
    """,
    doc="Top principal direction of the embedding matrix by "
    "distributed power iteration (2 unrolled rounds): y = Xv as a "
    "row-local dot under a broadcast 64-row v, w = X'y as a 64-key "
    "partial-agg exchange — the dim x dim Gram matrix is NEVER "
    "materialized, which is what makes PCA run at 100 TB. All "
    "cross-row sums accumulate rounded DECIMALs, so the iterative "
    "result is bit-exact against the unrolled-CTE oracle "
    "(operators/similarity.py:power_iteration).",
)
def embedding_pca_power(spark, sf_dir):
    from dsp_spark.operators.similarity import power_iteration

    return power_iteration(t(spark, sf_dir, "embeddings"), iters=2)


@register(
    "lineitem_numeric_corr",
    """
    WITH q AS (
      SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x_qty,
             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x_disc,
             CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS x_tax
      FROM lineitem
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x_qty) AS BIGINT) AS sq,
             CAST(SUM(x_disc) AS BIGINT) AS sd,
             CAST(SUM(x_tax) AS BIGINT) AS st,
             CAST(SUM(x_qty * x_qty) AS BIGINT) AS sqq,
             CAST(SUM(x_disc * x_disc) AS BIGINT) AS sdd,
             CAST(SUM(x_tax * x_tax) AS BIGINT) AS stt,
             CAST(SUM(x_qty * x_disc) AS BIGINT) AS sqd,
             CAST(SUM(x_qty * x_tax) AS BIGINT) AS sqt,
             CAST(SUM(x_disc * x_tax) AS BIGINT) AS sdt
      FROM q
    )
    SELECT pair, (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)) AS corr
    FROM (
      SELECT 'quantity~discount' AS pair,
             n, sqd AS sxy, sq AS sx, sd AS sy, sqq AS sxx, sdd AS syy
      FROM s
      UNION ALL
      SELECT 'quantity~tax', n, sqt, sq, st, sqq, stt FROM s
      UNION ALL
      SELECT 'discount~tax', n, sdt, sd, st, sdd, stt FROM s
    )
    """,
    doc="Pairwise Pearson correlation matrix over lineitem's numeric "
    "columns in ONE scan: all nine sufficient statistics (sums, "
    "squares, cross-products) accumulate as exact int64 cents in a "
    "single aggregate, then each pair's correlation is the identical "
    "double expression on both engines — no rounding step, sqrt is "
    "correctly rounded IEEE. Cent-quantized columns are small enough "
    "that every sum stays under 2^53 through sf10. The single-row "
    "statistics table then fans out to pair rows (zero extra scans) — "
    "the ANALYZE-style profile a feature store computes per snapshot.",
)
def lineitem_numeric_corr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    c = lambda col, p: (F.col(col).cast(f"decimal({p},2)") * 100).cast("bigint")
    q = li.select(
        c("l_quantity", 12).alias("x_qty"),
        c("l_discount", 4).alias("x_disc"),
        c("l_tax", 4).alias("x_tax"),
    )
    s = q.agg(
        F.count("*").alias("n"),
        F.sum("x_qty").alias("sq"),
        F.sum("x_disc").alias("sd"),
        F.sum("x_tax").alias("st"),
        F.sum(F.col("x_qty") * F.col("x_qty")).alias("sqq"),
        F.sum(F.col("x_disc") * F.col("x_disc")).alias("sdd"),
        F.sum(F.col("x_tax") * F.col("x_tax")).alias("stt"),
        F.sum(F.col("x_qty") * F.col("x_disc")).alias("sqd"),
        F.sum(F.col("x_qty") * F.col("x_tax")).alias("sqt"),
        F.sum(F.col("x_disc") * F.col("x_tax")).alias("sdt"),
    )

    def pair(name, sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        num = n * F.col(sxy) - F.col(sx).cast("double") * F.col(sy)
        den = F.sqrt(
            n * F.col(sxx) - F.col(sx).cast("double") * F.col(sx)
        ) * F.sqrt(n * F.col(syy) - F.col(sy).cast("double") * F.col(sy))
        return s.select(F.lit(name).alias("pair"), (num / den).alias("corr"))

    return (
        pair("quantity~discount", "sqd", "sq", "sd", "sqq", "sdd")
        .unionByName(pair("quantity~tax", "sqt", "sq", "st", "sqq", "stt"))
        .unionByName(pair("discount~tax", "sdt", "sd", "st", "sdd", "stt"))
    )


@register(
    "embedding_outlier_scores",
    """
    WITH x AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS x6
      FROM embeddings
    ), mom AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x6) AS BIGINT) AS DOUBLE) AS s6,
             CAST(CAST(SUM(x6 * x6) AS BIGINT) AS DOUBLE) AS ssq
      FROM x GROUP BY dim
    ), z AS (
      SELECT x.vec_id,
             CAST(round(
               (x.x6 - mom.s6 / mom.n) * (x.x6 - mom.s6 / mom.n)
               / ((mom.ssq - mom.s6 * mom.s6 / mom.n) / mom.n), 6)
               AS DECIMAL(20,6)) AS zsq
      FROM x JOIN mom USING (dim)
    )
    SELECT vec_id,
           CAST(SUM(zsq) AS DOUBLE) AS mahal_sq,
           CAST(SUM(zsq) AS DOUBLE) > 110.0 AS outlier
    FROM z GROUP BY vec_id
    """,
    doc="Embedding outlier audit: diagonal-Mahalanobis distance of "
    "every vector from the corpus moments (sum over dims of z^2) with "
    "a chi-square-ish flag at 110 for 64 dims — the drop-corrupt-"
    "vectors gate before ANN indexing or training. Moments come from "
    "the same 1e-6 fixed-point sums as embedding_dim_variance (every "
    "cast exact under 2^53); per-cell z^2 is an identical double "
    "expression on both engines, rounded once and summed as DECIMAL "
    "so the per-vector total is accumulation-order-independent. Two "
    "shuffles total: the 64-key moment aggregate (broadcast back) and "
    "the per-vector sum.",
)
def embedding_outlier_scores(spark, sf_dir):
    em = t(spark, sf_dir, "embeddings")
    x = em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xv")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.floor(F.col("xv").cast("double") * 1000000)
        .cast("bigint")
        .alias("x6"),
    )
    mom = x.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("x6").cast("bigint").cast("double").alias("s6"),
        F.sum(F.col("x6") * F.col("x6")).cast("bigint").cast("double").alias("ssq"),
    )
    mean = F.col("s6") / F.col("n")
    var = (F.col("ssq") - F.col("s6") * F.col("s6") / F.col("n")) / F.col("n")
    zsq = F.round(
        (F.col("x6") - mean) * (F.col("x6") - mean) / var, 6
    ).cast("decimal(20,6)")
    z = x.join(F.broadcast(mom), "dim").select("vec_id", zsq.alias("zsq"))
    s = F.sum("zsq").cast("double")
    return z.groupBy("vec_id").agg(
        s.alias("mahal_sq"), (s > 110.0).alias("outlier")
    )


@register(
    "embedding_centroid_drift",
    """
    SELECT label, dim,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(CAST(SUM(CASE WHEN half = 0 THEN x6 ELSE 0 END) AS BIGINT)
                AS DOUBLE)
             / SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) / 1000000
             AS mean_a,
           CAST(CAST(SUM(CASE WHEN half = 1 THEN x6 ELSE 0 END) AS BIGINT)
                AS DOUBLE)
             / SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) / 1000000
             AS mean_b,
           CAST(CAST(SUM(CASE WHEN half = 0 THEN x6 ELSE 0 END) AS BIGINT)
                AS DOUBLE)
             / SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) / 1000000
           - CAST(CAST(SUM(CASE WHEN half = 1 THEN x6 ELSE 0 END) AS BIGINT)
                  AS DOUBLE)
             / SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) / 1000000
             AS drift
    FROM (
      SELECT vec_id % 2 AS half, label,
             CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS x6
      FROM embeddings
    )
    GROUP BY label, dim
    HAVING SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) > 0
       AND SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) > 0
    """,
    doc="Embedding drift monitor: per (label, dimension), the centroid "
    "of snapshot half A vs half B (vec_id parity standing in for "
    "release N vs N+1) and their difference — the signal that an "
    "embedding model or upstream corpus changed under a deployed ANN "
    "index. One posexplode + one aggregate keyed by (label, dim) — "
    "bounded by labels x dims regardless of corpus size. Same 1e-6 "
    "fixed-point discipline as embedding_dim_variance: exact int64 "
    "sums, every int->double cast under 2^53, identical double "
    "expressions on both engines, no rounding step.",
)
def embedding_centroid_drift(spark, sf_dir):
    em = t(spark, sf_dir, "embeddings")
    ex = em.select(
        (F.col("vec_id") % 2).alias("half"),
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "half",
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000)
        .cast("bigint")
        .alias("x6"),
    )
    n_a = F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
    n_b = F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
    s_a = F.sum(F.when(F.col("half") == 0, F.col("x6")).otherwise(0)).cast(
        "double"
    )
    s_b = F.sum(F.when(F.col("half") == 1, F.col("x6")).otherwise(0)).cast(
        "double"
    )
    mean_a = s_a / n_a / 1000000
    mean_b = s_b / n_b / 1000000
    return (
        ex.groupBy("label", "dim")
        .agg(
            n_a.cast("bigint").alias("n_a"),
            n_b.cast("bigint").alias("n_b"),
            mean_a.alias("mean_a"),
            mean_b.alias("mean_b"),
            (mean_a - mean_b).alias("drift"),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )


# --- Misra-Gries heavy hitters, batch twin --------------------------------

from dsp_spark.operators.sampling import hash_int_sql as _hash_int_sql  # noqa: E402
from dsp_spark.streaming.stateful import HH_CAPACITY as _HH_CAP  # noqa: E402

_HH_SHARDS = 8
_MG_DUCK_SHARD = f"CAST({_hash_int_sql('user_id')} % {_HH_SHARDS} AS INTEGER)"


def _mg_fold(items_col):
    """Misra-Gries fold over an ordered item array -> state struct
    (it array<string>, ct array<bigint>, dec bigint): increment if
    tracked, insert if a slot is free, else decrement every counter
    and evict zeros. One JVM aggregate() — shared by the sharded-fold
    entry and the per-half folds the merge entry combines."""
    init = F.struct(
        F.array().cast("array<string>").alias("it"),
        F.array().cast("array<bigint>").alias("ct"),
        F.lit(0).cast("bigint").alias("dec"),
    )

    def step(s, x):
        it, ct, dec = s["it"], s["ct"], s["dec"]
        inc = F.struct(
            it.alias("it"),
            F.zip_with(
                it, ct, lambda v, c: c + F.when(v == x, 1).otherwise(0)
            ).alias("ct"),
            dec.alias("dec"),
        )
        ins = F.struct(
            F.concat(it, F.array(x)).alias("it"),
            F.concat(ct, F.array(F.lit(1).cast("bigint"))).alias("ct"),
            dec.alias("dec"),
        )
        kept = F.filter(
            F.zip_with(it, ct, lambda v, c: F.struct(v.alias("v"), c.alias("c"))),
            lambda p: p["c"] > 1,
        )
        evict = F.struct(
            F.transform(kept, lambda p: p["v"]).alias("it"),
            F.transform(kept, lambda p: p["c"] - 1).alias("ct"),
            (dec + 1).alias("dec"),
        )
        return F.when(F.array_contains(it, x), inc).otherwise(
            F.when(F.size(it) < _HH_CAP, ins).otherwise(evict)
        )

    return F.aggregate(items_col, init, step)


def _mg_reduce_sql(items_expr: str) -> str:
    """DuckDB mirror of _mg_fold as a list_reduce over singleton
    summaries; the sentinel first element carries the decrement tally
    (list_reduce in DuckDB 1.0 mis-accumulates struct-of-list states,
    list-of-struct works)."""
    return f"""list_reduce(
        list_transform({items_expr},
            x -> [{{'it': CAST(NULL AS VARCHAR), 'ct': CAST(0 AS BIGINT)}},
                  {{'it': x, 'ct': CAST(1 AS BIGINT)}}]),
        (acc, e) -> CASE
            WHEN len(list_filter(acc[2:], p -> p.it = e[2].it)) > 0 THEN
                [acc[1]] || list_transform(acc[2:],
                    p -> {{'it': p.it,
                           'ct': p.ct + CASE WHEN p.it = e[2].it
                                        THEN 1 ELSE 0 END}})
            WHEN len(acc) - 1 < {_HH_CAP} THEN
                list_append(acc, {{'it': e[2].it, 'ct': CAST(1 AS BIGINT)}})
            ELSE
                [{{'it': acc[1].it, 'ct': acc[1].ct + 1}}] ||
                list_transform(list_filter(acc[2:], p -> p.ct > 1),
                               p -> {{'it': p.it, 'ct': p.ct - 1}})
        END)"""


def _mg_state_rows(st, *group_cols):
    """(group..., s state-struct) -> (group..., item, est_count,
    decrements) rows — the sketch exploded into its emitted form."""
    return st.select(
        *group_cols,
        F.explode(
            F.zip_with(
                F.col("s.it"),
                F.col("s.ct"),
                lambda v, c: F.struct(v.alias("v"), c.alias("c")),
            )
        ).alias("p"),
        F.col("s.dec").alias("decrements"),
    ).select(
        *group_cols,
        F.col("p.v").alias("item"),
        F.col("p.c").alias("est_count"),
        "decrements",
    )


@register(
    "heavy_hitters_mg_sharded",
    f"""
    WITH seq AS (
        SELECT {_MG_DUCK_SHARD} AS shard, event_id, user_id::VARCHAR AS item
        FROM events
    ),
    arr AS (
        SELECT shard, list(item ORDER BY event_id) AS items
        FROM seq GROUP BY shard
    ),
    st AS (SELECT shard, {_mg_reduce_sql('items')} AS s FROM arr)
    SELECT shard, p.it AS item, CAST(p.ct AS BIGINT) AS est_count,
           CAST(s[1].ct AS BIGINT) AS decrements
    FROM (SELECT shard, s, unnest(s[2:]) AS p FROM st)
    """,
    doc="Misra-Gries heavy-hitters sketch as a deterministic BATCH "
    "computation — the oracle row for the bounded-state streaming "
    "family (streaming/stateful.py heavy_hitters_stream shares the "
    "algebra and HH_CAPACITY; tests pin the two to each other). Items "
    "hash-shard by md5(user_id) (the cross-engine salted-hash idiom), "
    "each shard folds its event_id-ordered items through the classic "
    "MG step — increment if tracked, insert if a slot is free, else "
    "decrement every counter and evict zeros — via one aggregate() "
    "higher-order fold, JVM-side, O(capacity) live state per shard. "
    "The DuckDB mirror runs the identical fold with list_reduce over "
    "singleton summaries (sentinel first element carries the "
    "decrement tally). Output is the sketch itself: per shard at most "
    "capacity (item, est_count) rows plus the decrement bound (true "
    "count is within [est, est+decrements]). One shuffle groups items "
    "to shards; the per-shard collect is the price of the sketch's "
    "DEFINITIONAL sequential order — at 100 TB you raise n_shards so "
    "each shard's slice fits an executor core, or run the streaming "
    "twin whose state is capacity-bounded regardless of input size.",
)
def heavy_hitters_mg_sharded(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    shard = F.expr(_hash_int_sql("user_id", dialect="spark")) % _HH_SHARDS
    keyed = e.select(
        shard.cast("int").alias("shard"),
        "event_id",
        F.col("user_id").cast("string").alias("item"),
    )
    arr = keyed.groupBy("shard").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(event_id, item))), "
            "p -> p.item)"
        ).alias("items")
    )
    st = arr.select("shard", _mg_fold(F.col("items")).alias("s"))
    return _mg_state_rows(st, "shard")


@register(
    "heavy_hitters_mg_merge",
    f"""
    WITH seq AS (
        SELECT {_MG_DUCK_SHARD} AS shard,
               CAST(event_id % 2 AS INTEGER) AS half,
               event_id, user_id::VARCHAR AS item
        FROM events
    ),
    arr AS (
        SELECT shard, half, list(item ORDER BY event_id) AS items
        FROM seq GROUP BY shard, half
    ),
    st AS (SELECT shard, half, {_mg_reduce_sql('items')} AS s FROM arr),
    halves AS (
        SELECT shard, half, p.it AS item, p.ct AS est, s[1].ct AS dec
        FROM (SELECT shard, half, s, unnest(s[2:]) AS p FROM st)
    ),
    decs AS (
        -- from the STATE rows, not the exploded counters: a half whose
        -- final counter set emptied (every item evicted on the last
        -- arrival) emits no counter rows but its decrements still bound
        -- the merged error
        SELECT shard, CAST(SUM(s[1].ct) AS BIGINT) AS dec_in
        FROM st GROUP BY shard
    ),
    summed AS (
        SELECT shard, item, CAST(SUM(est) AS BIGINT) AS est
        FROM halves GROUP BY shard, item
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                                     ORDER BY est DESC, item) AS rn
        FROM summed
    ),
    sub AS (
        SELECT shard,
               COALESCE(MAX(CASE WHEN rn = {_HH_CAP} + 1 THEN est END), 0) AS s
        FROM ranked GROUP BY shard
    )
    SELECT r.shard, r.item,
           CAST(r.est - b.s AS BIGINT) AS est_count,
           CAST(d.dec_in + b.s AS BIGINT) AS decrements
    FROM ranked r JOIN sub b USING (shard) JOIN decs d USING (shard)
    WHERE r.est - b.s > 0
    """,
    doc="Misra-Gries sketch UNION (Agarwal et al., Mergeable "
    "Summaries): build one MG summary per (shard, half) — halves split "
    "by event_id parity, each folded in event order exactly like "
    "heavy_hitters_mg_sharded — then merge the two summaries of every "
    "shard by summing counters and subtracting the (capacity+1)-th "
    "largest combined count (ties broken on the item), dropping "
    "non-positives; the merged error bound is the halves' decrement "
    "sum plus the subtracted value. This is the hierarchy step a "
    "100 TB deployment relies on — per-partition (or per-day) sketches "
    "union to any coarser grain WITHOUT re-scanning raw events, the "
    "same roll-up shape hll_user_rollup_merge shows for distinct "
    "counts. The merge itself is relational (one groupBy + one "
    "capacity-bounded window per shard over <= 2*capacity rows), so "
    "both engines compute it identically.",
)
def heavy_hitters_mg_merge(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    shard = F.expr(_hash_int_sql("user_id", dialect="spark")) % _HH_SHARDS
    keyed = e.select(
        shard.cast("int").alias("shard"),
        (F.col("event_id") % 2).cast("int").alias("half"),
        "event_id",
        F.col("user_id").cast("string").alias("item"),
    )
    arr = keyed.groupBy("shard", "half").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(event_id, item))), "
            "p -> p.item)"
        ).alias("items")
    )
    st = arr.select("shard", "half", _mg_fold(F.col("items")).alias("s"))
    halves = _mg_state_rows(st, "shard", "half").withColumnRenamed(
        "decrements", "dec"
    )
    # dec from the state rows, not the exploded counters: an
    # empty-counter half still contributes its decrement bound
    decs = st.groupBy("shard").agg(
        F.sum(F.col("s.dec")).cast("bigint").alias("dec_in")
    )
    summed = halves.groupBy("shard", "item").agg(
        F.sum("est_count").cast("bigint").alias("est")
    )
    from pyspark.sql import Window as W

    ranked = summed.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("shard").orderBy(F.desc("est"), "item")
        ),
    )
    sub = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _HH_CAP + 1, F.col("est"))), F.lit(0)
        ).alias("s")
    )
    return (
        ranked.join(sub, "shard")
        .join(decs, "shard")
        .where(F.col("est") - F.col("s") > 0)
        .select(
            "shard",
            "item",
            (F.col("est") - F.col("s")).cast("bigint").alias("est_count"),
            (F.col("dec_in") + F.col("s")).cast("bigint").alias("decrements"),
        )
    )


@register(
    "quantiles_loghist_by_key",
    """
    WITH x AS (
        SELECT key,
               CASE WHEN cents < 0 THEN CAST(error(
                        'quantiles_loghist_by_key requires non-negative values'
                    ) AS BIGINT)
                    ELSE cents END AS cents
        FROM (SELECT event_type AS key,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM events)
    ),
    h AS (
        SELECT key,
               CASE WHEN cents > 0 THEN LEAST(length(bin(cents)), 63)
                    ELSE 0 END AS bin,
               COUNT(*) AS c, MAX(cents) AS mx
        FROM x GROUP BY 1, 2
    ),
    w AS (
        SELECT key, bin, c,
               SUM(c) OVER (PARTITION BY key ORDER BY bin) AS cum,
               SUM(c) OVER (PARTITION BY key ORDER BY bin) - c AS prev,
               SUM(c) OVER (PARTITION BY key) AS n,
               MAX(mx) OVER (PARTITION BY key) AS mxx
        FROM h
    ),
    hit AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY key, q ORDER BY bin) AS rn
        FROM (SELECT w.*, q FROM w,
              UNNEST([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS t(q))
        WHERE cum >= q * n
    ),
    vals AS (
        SELECT key, q, n, mxx,
               (CASE WHEN bin = 0 THEN 0.0 ELSE POWER(2.0, bin - 1) END
                + (q * n - prev) / c *
                  (POWER(2.0, bin)
                   - CASE WHEN bin = 0 THEN 0.0
                          ELSE POWER(2.0, bin - 1) END)) / 100.0 AS v
        FROM hit WHERE rn = 1
    )
    SELECT key, CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN q = 0.5 THEN v END) AS p50,
           MAX(CASE WHEN q = 0.9 THEN v END) AS p90,
           MAX(CASE WHEN q = 0.99 THEN v END) AS p99,
           MAX(mxx) / 100.0 AS max_v
    FROM vals GROUP BY key
    """,
    doc="Per-key log2-histogram quantiles as a deterministic BATCH "
    "computation — the oracle row for the streaming "
    "quantile_histogram_stream sketch (same cents quantization, same "
    "min(bit_length, 63) binning, same inside-bin linear "
    "interpolation; a test pins the entry to the streaming "
    "_qh_quantile on identical input). Unlike percentile_approx this "
    "sketch is O(64 counters) per key FOREVER and merges by vector "
    "add, the property that lets a latency/price dashboard run on an "
    "unbounded stream; the factor-of-2 relative error is the "
    "documented trade. One partial-agg shuffle to (key, bin) grain "
    "(<=64 rows per key), per-key windows over those 64 rows, and "
    "every emitted double comes from the identical exact-int -> "
    "double op sequence on both engines (q*n, the bin edges as exact "
    "powers of two, one division) — no ROUND-on-double anywhere. "
    "Negative values raise on BOTH engines (raise_error / error()), "
    "mirroring the streaming _qh_bin ValueError: log histograms need "
    "a positive domain, and a silent bin-0 placement would break the "
    "pinned parity with wrong quantiles.",
)
def quantiles_loghist_by_key(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    cents = _cents_of("value")
    # mirror the streaming _qh_bin contract: a negative value must fail
    # LOUDLY on both engines, not silently land in bin 0 with the wrong
    # sign and magnitude (the claimed batch/stream parity would break
    # with wrong quantiles otherwise)
    guarded = F.when(cents >= 0, cents).otherwise(
        F.raise_error(
            F.lit("quantiles_loghist_by_key requires non-negative values")
        )
    )
    x = e.select(F.col("event_type").alias("key"), guarded.alias("cents"))
    b = (
        F.when(
            F.col("cents") > 0,
            F.least(F.length(F.bin("cents")), F.lit(63)),
        )
        .otherwise(0)
        .cast("int")
    )
    h = x.groupBy("key", b.alias("bin")).agg(
        F.count("*").alias("c"), F.max("cents").alias("mx")
    )
    pk = W.partitionBy("key")
    w = h.select(
        "key",
        "bin",
        "c",
        F.sum("c").over(pk.orderBy("bin")).alias("cum"),
        (F.sum("c").over(pk.orderBy("bin")) - F.col("c")).alias("prev"),
        F.sum("c").over(pk).alias("n"),
        F.max("mx").over(pk).alias("mxx"),
    )
    hit = (
        w.select(
            "*",
            F.explode(
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
            ).alias("q"),
        )
        .where(F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("key", "q").orderBy("bin")),
        )
        .where(F.col("rn") == 1)
    )
    lo = F.when(F.col("bin") == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("bin") - 1)
    )
    hi = F.pow(F.lit(2.0), F.col("bin"))
    v = (
        lo
        + (F.col("q") * F.col("n") - F.col("prev")) / F.col("c") * (hi - lo)
    ) / 100.0
    vals = hit.select("key", "q", "n", "mxx", v.alias("v"))
    return vals.groupBy("key").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("q") == 0.5, F.col("v"))).alias("p50"),
        F.max(F.when(F.col("q") == 0.9, F.col("v"))).alias("p90"),
        F.max(F.when(F.col("q") == 0.99, F.col("v"))).alias("p99"),
        (F.max("mxx") / 100.0).alias("max_v"),
    )


@register(
    "embedding_dim_median_mad",
    """
    WITH x AS (
      SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS x6
      FROM embeddings
    ),
    med AS (
      SELECT dim, CAST(quantile_cont(x6, 0.5) * 2 AS BIGINT) AS med2,
             COUNT(*) AS n
      FROM x GROUP BY dim
    )
    SELECT x.dim, CAST(MAX(m.n) AS BIGINT) AS n,
           MAX(m.med2) / 2000000.0 AS median_val,
           quantile_cont(ABS(2 * x.x6 - m.med2), 0.5) / 2000000.0 AS mad_val
    FROM x JOIN med m ON x.dim = m.dim
    GROUP BY x.dim
    """,
    doc="Robust per-dimension location/scale for the embedding matrix "
    "(median + median-absolute-deviation — the whitening preflight "
    "that outlier vectors can't poison, unlike embedding_dim_variance's "
    "moments): values fixed-point-quantize to 1e-6 ints, the median is "
    "carried DOUBLED (2*quantile is exactly the integer a+b for even "
    "counts, so |2x - med2| stays in exact int64 and the second median "
    "interpolates integer midpoints — zero engine-divergent float ops; "
    "dividing by 2e6 at the end is the single rounding-free emit). Two "
    "64-key aggregates over the posexploded cells with a broadcast "
    "median join between them; at 100 TB swap the exact medians for "
    "the log-histogram sketch twin (quantiles_loghist_by_key) — this "
    "entry is the calibration oracle for it.",
)
def embedding_dim_median_mad(spark, sf_dir):
    em = t(spark, sf_dir, "embeddings")
    x = em.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias("x6"),
    )
    med = x.groupBy("dim").agg(
        (F.percentile("x6", F.lit(0.5)) * 2).cast("bigint").alias("med2"),
        F.count("*").alias("n"),
    )
    j = x.join(F.broadcast(med), "dim")
    return j.groupBy("dim").agg(
        F.max("n").cast("bigint").alias("n"),
        (F.max("med2") / 2000000.0).alias("median_val"),
        (
            F.percentile(F.abs(2 * F.col("x6") - F.col("med2")), F.lit(0.5))
            / 2000000.0
        ).alias("mad_val"),
    )


@register(
    "embedding_int8_quant_error",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
               AS qv
      FROM embeddings
    ), m AS (
      SELECT vec_id, label, qv,
             list_max(list_transform(qv, x -> abs(x))) AS maxabs,
             len(qv) AS d
      FROM v
    ), errs AS (
      SELECT vec_id, label, maxabs, d,
             CASE WHEN maxabs = 0 THEN 0 ELSE
               list_sum(list_transform(qv, x ->
                 abs(127 * abs(x)
                     - ((2 * 127 * abs(x) + maxabs) // (2 * maxabs))
                       * maxabs)))
             END AS sum_e,
             CASE WHEN maxabs = 0 THEN 0 ELSE
               list_max(list_transform(qv, x ->
                 abs(127 * abs(x)
                     - ((2 * 127 * abs(x) + maxabs) // (2 * maxabs))
                       * maxabs)))
             END AS max_e,
             CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT) ELSE
               CAST(len(list_filter(qv, x ->
                 ((2 * 127 * abs(x) + maxabs) // (2 * maxabs)) = 127))
                 AS BIGINT)
             END AS n_full_scale
      FROM m
    ), per_vec AS (
      SELECT label, vec_id, max_e, n_full_scale, maxabs,
             CASE WHEN maxabs = 0 THEN 0.0 ELSE
               CAST(sum_e AS DOUBLE) / CAST(127 * maxabs * d AS DOUBLE)
             END AS mean_rel,
             CASE WHEN maxabs = 0 THEN 0.0 ELSE
               CAST(max_e AS DOUBLE) / CAST(127 * maxabs AS DOUBLE)
             END AS max_rel
      FROM errs
    ), ranked AS (
      SELECT label, mean_rel, max_rel, n_full_scale,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY mean_rel, vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM per_vec
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS n_vecs,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN mean_rel END)
             AS med_mean_rel_err,
           MAX(max_rel) AS max_rel_err,
           CAST(SUM(n_full_scale) AS BIGINT) AS saturated_codes
    FROM ranked GROUP BY label
    """,
    doc="Symmetric int8 quantization calibration audit (the error side "
    "of ann_int8_topk): per label, the median per-vector mean relative "
    "reconstruction error, the worst per-element relative error, and "
    "how many codes hit full scale. All-integer error algebra: values "
    "quantize to 1e-6 fixed point, the int8 code is round-to-nearest "
    "via (2*127*|q| + maxabs) DIV (2*maxabs) on non-negative ints "
    "(identical truncation on both engines), and the residual "
    "|127*q - code*maxabs| stays in exact int64; the only float ops "
    "are two final single divisions, and the median is rank-discrete "
    "(no interpolation to diverge). Array-fold arithmetic runs "
    "scan-side with zero element-grain shuffle; the label rollup and "
    "label-partitioned rank window are the only exchanges.",
)
def embedding_int8_quant_error(spark, sf_dir):
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    code = "((2 * 127 * abs(x) + maxabs) DIV (2 * maxabs))"
    e_term = f"abs(127 * abs(x) - {code} * maxabs)"
    errs = (
        em.selectExpr(
            "vec_id",
            "label",
            "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
            " * 1000000) AS BIGINT)) AS qv",
        )
        .selectExpr(
            "vec_id",
            "label",
            "qv",
            "array_max(transform(qv, x -> abs(x))) AS maxabs",
            "size(qv) AS d",
        )
        .selectExpr(
            "vec_id",
            "label",
            "maxabs",
            "d",
            f"CASE WHEN maxabs = 0 THEN 0L ELSE aggregate(qv, 0L,"
            f" (acc, x) -> acc + {e_term}) END AS sum_e",
            f"CASE WHEN maxabs = 0 THEN 0L ELSE array_max("
            f"transform(qv, x -> {e_term})) END AS max_e",
            f"CASE WHEN maxabs = 0 THEN 0L ELSE CAST(size("
            f"filter(qv, x -> {code} = 127)) AS BIGINT)"
            f" END AS n_full_scale",
        )
    )
    per_vec = errs.selectExpr(
        "label",
        "vec_id",
        "n_full_scale",
        "CASE WHEN maxabs = 0 THEN 0.0 ELSE CAST(sum_e AS DOUBLE)"
        " / CAST(127 * maxabs * d AS DOUBLE) END AS mean_rel",
        "CASE WHEN maxabs = 0 THEN 0.0 ELSE CAST(max_e AS DOUBLE)"
        " / CAST(127 * maxabs AS DOUBLE) END AS max_rel",
    )
    wl = W.partitionBy("label")
    ranked = per_vec.select(
        "label",
        "mean_rel",
        "max_rel",
        "n_full_scale",
        F.row_number().over(wl.orderBy("mean_rel", "vec_id")).alias("rn"),
        F.count("*").over(wl).alias("n"),
    )
    return ranked.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("mean_rel"))
        ).alias("med_mean_rel_err"),
        F.max("max_rel").alias("max_rel_err"),
        F.sum("n_full_scale").cast("bigint").alias("saturated_codes"),
    )


_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row


@register(
    "heavy_hitters_cms_audit",
    f"""
    WITH keyed AS (
      SELECT user_id FROM events
    ), rows_ AS (
      SELECT j FROM (VALUES (0), (1), (2), (3)) AS r(j)
    ), hashed AS (
      SELECT k.user_id, r.j,
             ('0x' || substr(md5(r.j || ':' || k.user_id), 1, 8))::BIGINT
               % {_CMS_W} AS bucket
      FROM keyed k CROSS JOIN rows_ r
    ), counters AS (
      SELECT j, bucket, COUNT(*) AS c FROM hashed GROUP BY j, bucket
    ), exact AS (
      SELECT user_id, COUNT(*) AS exact_n FROM keyed GROUP BY user_id
    ), probes AS (
      SELECT e.user_id, e.exact_n, MIN(c.c) AS est_n
      FROM exact e
      CROSS JOIN rows_ r
      JOIN counters c
        ON c.j = r.j
       AND c.bucket = ('0x' || substr(md5(r.j || ':' || e.user_id), 1, 8))
                        ::BIGINT % {_CMS_W}
      GROUP BY e.user_id, e.exact_n
    )
    SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(est_n - exact_n AS BIGINT) AS overestimate
    FROM probes
    ORDER BY exact_n DESC, user_id ASC LIMIT 20
    """,
    doc="Count-Min sketch audit (Cormode-Muthukrishnan, d=4 x w=256, "
    "md5-derived row hashes): build the counter matrix from the event "
    "stream, then for the top-20 hottest keys compare the CMS point "
    "estimate (min over rows of the key's bucket counters) against the "
    "exact count — CMS never underestimates, and the overestimate "
    "column is the collision-induced bias a capacity plan must absorb. "
    "Completes the sketch family next to Misra-Gries and the log "
    "histogram. The counter matrix is d*w = 1024 cells regardless of "
    "data size (map-side combining to cell grain); probes join the "
    "exact key counts to 4 broadcast-sized counter rows each, and the "
    "top-20 cut is a TakeOrdered (per-partition top-k then a 20-row "
    "merge — no global window even at billions of keys). Streaming "
    "twin shape: the counter matrix is trivially mergeable across "
    "micro-batches (cellwise sum).",
)
def heavy_hitters_cms_audit(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id")
    rows_ = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("j"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )
    # r14 (guide §1.2 step 1 / §2.3): the bucket hash depends only on
    # (j, user_id), so the counter matrix NEVER needs the event-grain
    # d-way explode the oracle spells out — COUNT(*) per (j, bucket)
    # over events == SUM(exact_n) over the users hashing there. Hash
    # the per-user aggregate instead: md5 work drops from
    # O(events x d) to O(users x d) (400k -> 12k calls at sf0.1, and
    # the same factor at 100 TB), and the only event-grain pass left
    # is the exact count's map-side partial agg.
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    hu = exact.crossJoin(F.broadcast(rows_)).select(
        "user_id", "exact_n", "j", bucket.alias("bucket")
    )
    counters = hu.groupBy("j", "bucket").agg(
        F.sum("exact_n").alias("c")
    )
    probes = (
        hu.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        probes.select(
            "user_id",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("exact_n"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(20)
    )
