"""Similarity search over embedding columns: brute-force and LSH ANN.

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set against the corpus; one narrow scan, no corpus shuffle; the
  per-query top-k is a ranked window over (query, sim).
* random-hyperplane LSH — 100 TB path: each vector gets a compact
  bucket id from the signs of `n_planes` fixed random projections;
  candidate generation is an equi-join on the bucket (shuffle of ids,
  not vectors squared). Hyperplane coefficients are derived from md5
  so they are deterministic and reproducible in the DuckDB oracle.

Scaling further (billions of vectors): increase planes (smaller
buckets), multi-probe neighboring buckets, or switch blocking to IVF
(k-means coarse cells) — same join shape, different bucket function.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from dsp_spark.functions.vectors import dot, dot_int8, norm, quantize_int8


def _hexfrac(s: str) -> float:
    """Deterministic pseudo-random in [-0.5, 0.5) from md5(s)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16) / 16**6 - 0.5


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [
        [_hexfrac(f"p{j}_{i}") for i in range(dim)] for j in range(n_planes)
    ]


def plane_dot_sql(plane: list[float], emb: str, dialect: str) -> str:
    """Literal-coefficient dot product; identical +-fold order in both
    engines (left-assoc addition) => bit-identical doubles."""
    idx = (
        (lambda i: f"CAST(element_at({emb}, {i}) AS DOUBLE)")
        if dialect == "spark"
        else (lambda i: f"CAST({emb}[{i}] AS DOUBLE)")
    )
    return " + ".join(f"{idx(i + 1)} * ({c!r})" for i, c in enumerate(plane))


def bucket_sql(planes: list[list[float]], emb: str, dialect: str) -> str:
    """LSH bucket id = sum of sign bits of the plane projections."""
    bits = [
        f"CASE WHEN ({plane_dot_sql(p, emb, dialect)}) > 0 THEN {1 << j} ELSE 0 END"
        for j, p in enumerate(planes)
    ]
    return "CAST(" + " + ".join(bits) + " AS INTEGER)"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row (self excluded).

    Norms are precomputed once per row (not per pair): per-pair work is
    a single dot product — at N corpus x Q queries that's the difference
    between NQ and 3NQ full vector folds.
    """
    # (spread() measured SLOWER here — r14, 3/3 interleaved pairs: the
    # nq-query cosine fold is too cheap to pay for the extra exchange,
    # unlike the int8/IVF/PQ corpus-side folds)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_nrm"),
    )
    c = corpus.select(F.col(id_col), F.col(vec_col), norm(vec_col).alias("nrm"))
    sim = F.round(dot("q_vec", vec_col) / (F.col("q_nrm") * F.col("nrm")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket(
    df: DataFrame,
    planes: list[list[float]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    return df.withColumn("bucket", F.expr(bucket_sql(planes, vec_col, "spark")))


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its `nprobe` nearest coarse centroids.

    Centroids are broadcast as ONE packed array-of-structs row (a
    codebook is small by construction — even 65k centroids x 1k dims
    is ~256 MB); assignment is a per-row sorted-slice fold over the
    candidates: ascending (-sim, cent_id) struct sort == the ranked
    window's (sim DESC, cent_id ASC), so the selection is identical —
    but the fold is pure map-side, where the window formulation
    shuffled corpus x K scored rows by id. Similarity is cosine
    rounded to 6 digits, ties broken by cent_id, so the assignment is
    deterministic and engine-independent. (Only divergence from the
    old window: a NaN similarity — possible solely for zero-norm
    vectors — sorts last here where the window ranked it first.)
    """
    packed = centroids.select(
        F.struct(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            norm(vec_col).alias("cnrm"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cands"))
    probed = F.expr(
        f"""
        transform(slice(array_sort(transform(cands, c -> struct(
            -round(aggregate(zip_with({vec_col}, c.cvec,
                                      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                             0D, (acc, v) -> acc + v) / (nrm * c.cnrm), 6) AS negsim,
            c.cid AS cid))), 1, {int(nprobe)}), s -> s.cid)
        """
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), norm(vec_col).alias("nrm"))
        .crossJoin(F.broadcast(packed))
        .select(id_col, vec_col, "nrm", F.explode(probed).alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF ANN: exact cosine only inside the query's `nprobe` cells.

    The 100 TB path for billions of vectors: corpus vectors are
    partitioned by cell (disjoint, so multi-probe never duplicates a
    candidate), queries probe a handful of cells, and the candidate
    join shuffles only the probed cells' ids — in production the
    centroids come from k-means; here any deterministic codebook works.
    """
    from dsp_spark.session import spread

    # spread(): the corpus-side assignment fold + candidate cosines are
    # heavy in-row work on a one-row-group test file's single partition
    # (no-op at real scan parallelism)
    cells = ivf_assign(
        spread(corpus), centroids, id_col=id_col, vec_col=vec_col, nprobe=1
    )
    probes = ivf_assign(
        queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
        "cell",
    )
    return score_probed_cells(cells, probes, id_col=id_col, vec_col=vec_col, k=k)


def score_probed_cells(
    cells: DataFrame,
    probes: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact-cosine top-k of probed cells — the ONE definition of IVF
    scoring (rounding, self-filter, tie-break), shared by the scan
    composition above and the persisted index (`operators/ann_index`)
    so their results can never drift apart."""
    sim = F.round(dot("q_vec", vec_col) / (F.col("q_nrm") * F.col("nrm")), 6)
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k by cosine over int8-quantized vectors.

    The billion-vector bandwidth path: 4x smaller than float32 in
    shuffle/cache, and scoring is integer multiply-adds. With symmetric
    per-vector quantization the scales cancel in cosine, so the score
    is round(dot8(q,c) / (sqrt(dot8(q,q)) * sqrt(dot8(c,c))), 6) —
    exact integer dots (sums < 2^53) make it bit-identical across
    engines. Compose with LSH/IVF blocking for candidate generation;
    here it scores a broadcast query set like brute_force_topk.
    """
    from dsp_spark.session import spread

    codes, _ = quantize_int8(vec_col)
    # spread(): quantization + integer-dot folds are heavy scan-side
    # work on a one-row-group test file's single partition (no-op at
    # real scan parallelism)
    c = spread(corpus).select(F.col(id_col), codes.alias("codes")).withColumn(
        "inorm", F.sqrt(dot_int8("codes", "codes").cast("double"))
    )
    q = queries.select(F.col(id_col), codes.alias("codes")).select(
        F.col(id_col).alias("query_id"),
        F.col("codes").alias("q_codes"),
        F.sqrt(dot_int8("codes", "codes").cast("double")).alias("q_inorm"),
    )
    sim = F.round(
        dot_int8("q_codes", "codes").cast("double")
        / (F.col("q_inorm") * F.col("inorm")),
        6,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sim.alias("qsim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's bucket."""
    cb = lsh_bucket(corpus, planes, vec_col=vec_col).select(
        id_col, vec_col, "bucket", norm(vec_col).alias("nrm")
    )
    qb = lsh_bucket(queries, planes, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
        norm(vec_col).alias("q_nrm"),
    )
    sim = F.round(dot("q_vec", vec_col) / (F.col("q_nrm") * F.col("nrm")), 6)
    scored = (
        cb.join(F.broadcast(qb), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_nearest_centroid(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "seed_id",
    keep_vec: bool = False,
) -> DataFrame:
    """K-means assignment step: nearest centroid by cosine, per corpus row.

    The centroid set is packed into ONE array-of-structs row and
    cross-joined broadcast, so assignment is a per-row fold over K
    candidates — zero shuffle of the corpus, the only viable shape when
    the corpus is 100 TB and K fits in memory (same broadcast-centroids
    pattern MLlib's KMeans uses per iteration). Ties break to the
    smallest centroid id via array_min over (-sim, id) structs.
    """
    packed = centroids.select(
        F.struct(
            F.col(centroid_id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            norm(vec_col).alias("cnrm"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cands"))
    scored = F.expr(
        """
        array_min(transform(cands, c -> struct(
            -round(aggregate(zip_with(embedding, c.cvec,
                                      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                             0D, (acc, v) -> acc + v) / (nrm * c.cnrm), 6) AS negsim,
            c.cid AS cid)))
        """
    )
    from dsp_spark.session import spread

    vec_cols = [vec_col] if keep_vec else []
    # spread(): the K-candidate assignment fold is heavy scan-side work
    # on a one-row-group test file's single partition (no-op at real
    # scan parallelism)
    return (
        spread(corpus).select(id_col, vec_col, norm(vec_col).alias("nrm"))
        .crossJoin(F.broadcast(packed))
        .select(
            id_col,
            *vec_cols,
            scored.alias("best"),
        )
        .select(
            id_col,
            *vec_cols,
            F.col("best.cid").alias("centroid_id"),
            (-F.col("best.negsim")).alias("sim"),
        )
    )


def kmeans(
    corpus: DataFrame,
    seeds: DataFrame,
    *,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "seed_id",
) -> DataFrame:
    """Lloyd's k-means over embedding rows: `iters` update rounds, then a
    final assignment.

    Per iteration: assignment is the zero-shuffle broadcast fold of
    assign_nearest_centroid; the update step posexplodes assigned
    vectors and means them per (centroid, dim) in DECIMAL(20,10) —
    one partial-agg exchange on k*dim keys, then the per-centroid
    array is rebuilt with array_sort(collect_list(struct(pos, v))) so
    element order never depends on shuffle arrival order. Means are
    rounded to 6 digits, making every iteration engine-deterministic
    (the DuckDB oracle unrolls the same rounds as CTEs). Empty clusters
    drop out, exactly as in the oracle. Driver never sees the data —
    centroids live in a k x dim DataFrame, corpus is touched only by
    narrow maps + one k*dim-key agg per round.
    """
    cents = seeds
    cid = centroid_id_col
    for _ in range(iters):
        assigned = assign_nearest_centroid(
            corpus, cents, id_col=id_col, vec_col=vec_col,
            centroid_id_col=cid, keep_vec=True,
        )
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.round(
                    F.sum(F.col("v").cast("decimal(20,10)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("cv")
            )
        )
        cents = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s["cv"],
                ).alias(vec_col)
            )
            .withColumnRenamed("centroid_id", cid)
        )
    return assign_nearest_centroid(
        corpus, cents, id_col=id_col, vec_col=vec_col, centroid_id_col=cid
    )


def power_iteration(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
):
    """Top principal direction of the (uncentered) Gram matrix X^T X by
    distributed power iteration — PCA's workhorse, without EVER
    materializing the dim x dim covariance: each round is two matvec
    passes, ``y = X v`` (row-local dot) then ``w = X^T y`` (dim-keyed
    partial agg), exactly how a 100 TB corpus computes it.

    Returns one row per dimension: (dim, loading, sigma_est) where
    loading is the unit top-singular-direction estimate and sigma_est
    approximates the top eigenvalue of X^T X.

    Determinism contract (mirrors the unrolled SQL oracle in
    queries/sketches.py): every cross-row sum accumulates
    rounded-to-fixed-scale DECIMALs, so results are independent of
    partitioning and accumulation order; divisions/sqrt run on
    identical doubles. Start vector is the constant unit vector
    (1/8, ..., 1/8) for dim=64.

    Plan shape per round: y = X v is a ROW-LOCAL dot — the rounded
    per-term decimals all live inside one row, and decimal addition is
    exact, so the fold runs in-row as an exact integer sum of
    1e-10-unit terms (k = round(round(x*v,10) * 1e10): |term| <= ~1e12
    keeps the double product within 1e-4 of the integer, and the
    64-term sum < 2^53, so CAST(sum AS DOUBLE)/1e10 is bit-equal to
    the oracle's CAST(decimal_sum AS DOUBLE)). That removes both
    id-keyed exchanges (the y groupBy and the X |><| y join) the
    exploded-matrix formulation paid per round; the only corpus-wide
    exchange left is the 64-key partial agg for w = X^T y, plus a
    single-row norm broadcast. v rides along as a broadcast 64-element
    array (1-row cross join), zip_with-sliced to each row's own
    length, so ragged rows keep join-on-pos semantics.
    """
    if iters < 1:
        raise ValueError(f"power_iteration needs iters >= 1, got {iters}")
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("xv"),
    )

    def y_col(terms: str) -> F.Column:
        return (
            F.expr(f"CAST(aggregate({terms}, 0L, (acc, t) -> acc + t) AS DOUBLE)")
            / F.lit(10000000000.0)
        ).alias("y")

    varr = None
    w = None
    nrm = None
    for i in range(iters):
        if i == 0:
            # constant start vector: every vv is the literal 0.125
            rows = e.select(
                "vid",
                "xv",
                y_col(
                    "transform(xv, x -> CAST(round(round("
                    "x * CAST(0.125 AS DOUBLE), 10) * 10000000000.0, 0)"
                    " AS BIGINT))"
                ),
            )
        else:
            rows = e.crossJoin(F.broadcast(varr)).select(
                "vid",
                "xv",
                y_col(
                    "zip_with(xv, slice(varr, 1, size(xv)), (x, v) -> "
                    "CAST(round(round(x * v, 10) * 10000000000.0, 0)"
                    " AS BIGINT))"
                ),
            )
        w = (
            rows.select(F.posexplode("xv").alias("p", "x"), "y")
            .groupBy((F.col("p") + 1).cast("int").alias("pos"))
            .agg(
                F.sum(
                    F.round(F.col("y") * F.col("x"), 8).cast("decimal(28,8)")
                )
                .cast("double")
                .alias("w")
            )
        )
        n1 = w.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("w") * F.col("w"), 8).cast("decimal(28,8)")
                ).cast("double")
            ).alias("nrm")
        )
        # materialize the 64-row (w, nrm) table: w is referenced by the
        # norm, the next v, and the output — without this each reference
        # replays the corpus-sized matvec subplan, doubling exchanges
        # per iteration
        wn = w.crossJoin(F.broadcast(n1)).localCheckpoint(eager=True)
        nrm = wn
        varr = (
            wn.select(
                "pos", F.round(F.col("w") / F.col("nrm"), 8).alias("vv")
            )
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, vv))),"
                    " s -> s.vv)"
                ).alias("varr")
            )
        )
    return nrm.select(
        F.col("pos").alias("dim"),
        F.round(F.col("w") / F.col("nrm"), 6).alias("loading"),
        F.round(F.col("nrm"), 4).alias("sigma_est"),
    )


# ---------------------------------------------------------------------------
# PQ building blocks — packed for IN-ROW encode/score (r14, guide §2.4:
# the r13 ivf_assign in-row-fold pattern applied to PQ). The old shape
# (pq_parts) materialized `enc` through a (id, m) argmax groupBy and
# summed ADC partial dots through a (query_id, id) groupBy — two
# corpus-sized exchanges per PQ query. Both decisions are per-row
# against broadcast-sized tables (the codebook is ksub rows by
# construction; the ADC table is queries x m x ksub), so they fold
# in-row and the only corpus exchange left in a PQ plan is the final
# per-query top-k window. Tie-breaks, rounding grains and defaults are
# single-sourced here so the PQ variants can never diverge.
# ---------------------------------------------------------------------------

# keys of the per-query ADC lookup map are m * _PQ_MKEY + code; any
# ksub <= _PQ_MKEY is collision-free
_PQ_MKEY = 1024


def _pq_subdot(vec_col: str, other: str, mi: int, sub: int) -> str:
    """Sub-vector dot for subspace `mi` — the SAME zip_with left-fold
    as functions.vectors.dot over the same slices, so doubles are
    bit-identical to the old exploded formulation."""
    a = f"slice({vec_col}, {mi * sub + 1}, {sub})"
    b = f"slice({other}, {mi * sub + 1}, {sub})"
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, v) -> acc + v)"
    )


def pq_codebook_packed(
    corpus,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ksub: int = 16,
):
    """ONE broadcastable row: ``_pq_cb`` = array<struct<code, cvec>>
    of the first ``ksub`` vectors, sorted by code (a trained codebook
    drops in identically — it is broadcast either way)."""
    return (
        corpus.where(F.col(id_col) < ksub)
        .select(
            F.struct(
                F.col(id_col).cast("bigint").alias("code"),
                F.col(vec_col).alias("cvec"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("_pq_cb"))
    )


def pq_codes_col(
    vec_col: str = "embedding", *, m: int = 8, sub: int = 8
) -> F.Column:
    """In-row PQ encode against a crossJoined ``_pq_cb``: per subspace,
    the max-dot code with ties to the LOWEST code — ascending
    (-round(dot, 6), code) struct sort == the old max(struct(d6,
    -code)) argmax exactly. Zero corpus shuffle (the old enc shuffled
    (id, m, code) through a groupBy)."""
    return F.array(
        *[
            F.expr(
                "element_at(array_sort(transform(_pq_cb, c -> struct("
                f"-round({_pq_subdot(vec_col, 'c.cvec', mi, sub)}, 6) AS negd, "
                "c.code AS code))), 1).code"
            )
            for mi in range(m)
        ]
    )


def pq_adc_map_col(
    vec_col: str = "embedding", *, m: int = 8, sub: int = 8
) -> F.Column:
    """Per-QUERY ADC lookup table as one in-row map (build against a
    crossJoined ``_pq_cb``): m*{_PQ_MKEY}+code -> DECIMAL(18,8)
    partial dot, rounded once so downstream sums are
    order-independent."""
    per_m = [
        F.expr(
            f"transform(_pq_cb, c -> struct("
            f"CAST({mi * _PQ_MKEY} AS BIGINT) + c.code AS k, "
            f"CAST(round({_pq_subdot(vec_col, 'c.cvec', mi, sub)}, 8) "
            "AS DECIMAL(18,8)) AS v))"
        )
        for mi in range(m)
    ]
    return F.map_from_entries(F.flatten(F.array(*per_m)))


def pq_est_col(
    codes_col: str = "_codes", adc_col: str = "_adc", *, m: int = 8
) -> F.Column:
    """ADC estimate for one (corpus row, query row) pair: m map
    lookups summed as exact DECIMAL (addition of identical
    DECIMAL(18,8) terms is exact in any order, so the double equals
    the old SUM(pdot) over the (query_id, id) groupBy exchange this
    replaces)."""
    terms = [
        F.expr(
            f"element_at({adc_col}, CAST({mi * _PQ_MKEY} AS BIGINT) "
            f"+ element_at({codes_col}, {mi + 1}))"
        )
        for mi in range(m)
    ]
    est = terms[0]
    for t_ in terms[1:]:
        est = est + t_
    return est.cast("double")


def pq_topk(
    corpus,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub: int = 8,
    ksub: int = 16,
    nq: int = 5,
    k: int = 10,
):
    """Product-quantization ANN (PQ + asymmetric distance computation):
    the billion-vector memory trick — each vector is stored as ``m``
    sub-codes (one byte each here), and query scoring is ``m`` table
    lookups instead of a d-dim dot product.

    Stages (all broadcast-bounded; the corpus never self-joins, and —
    r14 — the only corpus-sized exchange is the final top-k window):
      1. codebook: the first ``ksub`` vectors, packed into ONE
         broadcast row (a trained codebook drops in identically);
      2. encode: max-dot sub-centroid per (vector, subspace) as an
         IN-ROW argmax fold over the broadcast codebook (ties to
         lowest code) — zero shuffle (the old shape shuffled
         (id, m, code) through a groupBy);
      3. ADC: the nq x m x ksub partial-dot lookup maps, one broadcast
         row per query;
      4. score: m in-row map lookups summed as exact DECIMAL
         (order-independent), rank top-k per query.

    Determinism: sub-dots are fixed-order array folds rounded once,
    summed as DECIMAL(18,8); the estimate surfaces as the exact sum
    cast to double (value far below 2^53, so the cast is exact on any
    engine).
    """
    from pyspark.sql import Window as W

    from dsp_spark.session import spread

    e = corpus.select(id_col, vec_col)
    cbp = pq_codebook_packed(e, id_col=id_col, vec_col=vec_col, ksub=ksub)
    adc = (
        e.where(F.col(id_col) < nq)
        .crossJoin(F.broadcast(cbp))
        .select(
            F.col(id_col).alias("query_id"),
            pq_adc_map_col(vec_col, m=m, sub=sub).alias("_adc"),
        )
    )
    # spread(): the in-row encode is m x ksub interpreted sub-dot folds
    # per row — heavy scan-side work that a one-row-group test parquet
    # file would otherwise run on ONE core (partition-count no-op at
    # real scan parallelism)
    coded = spread(e).crossJoin(F.broadcast(cbp)).select(
        F.col(id_col), pq_codes_col(vec_col, m=m, sub=sub).alias("_codes")
    )
    scored = (
        coded.crossJoin(F.broadcast(adc))
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, pq_est_col(m=m).alias("est"))
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select("query_id", id_col, "est", "rnk")
    )


def ivfpq_topk(
    corpus,
    queries,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub: int = 8,
    ksub: int = 16,
    nprobe: int = 2,
    k: int = 10,
):
    """IVF-PQ: coarse cells bound the candidate set, PQ codes score it
    — the composition (FAISS's IVFPQ) that serves billion-vector ANN:
    the inverted index prunes >99% of the corpus per query AND each
    candidate costs m table lookups instead of a full-dim dot.

    Reuses :func:`ivf_assign` for cells/probes and the same packed
    in-row encode/ADC as :func:`pq_topk` (broadcast codebook, in-row
    argmax encode on the SAME projection as the cell assignment,
    DECIMAL-exact in-row ADC sums). The only corpus-sized exchange —
    r14 — is the final top-k window; the old shape additionally
    shuffled (id, m, code) for the encode, (id, cell) for the cell
    join and (query_id, id) for the score sum.
    """
    from pyspark.sql import Window as W

    # ADC subvectors come from the QUERIES argument — not from corpus
    # rows that happen to share ids — so probes and lookup tables always
    # describe the same query set
    cbp = pq_codebook_packed(
        corpus, id_col=id_col, vec_col=vec_col, ksub=ksub
    )
    probes = ivf_assign(
        queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    ).select(F.col(id_col).alias("query_id"), "cell")
    adc = (
        queries.crossJoin(F.broadcast(cbp))
        .select(
            F.col(id_col).alias("query_id"),
            pq_adc_map_col(vec_col, m=m, sub=sub).alias("_adc"),
        )
    )
    # one broadcast row per (query, probed cell), ADC map riding along
    probes_adc = probes.join(adc, "query_id")

    # spread(): cell assignment + encode are both heavy in-row folds on
    # what a one-row-group test file scans as ONE partition (no-op at
    # real scan parallelism)
    from dsp_spark.session import spread

    coded = (
        ivf_assign(
            spread(corpus), centroids, id_col=id_col, vec_col=vec_col, nprobe=1
        )
        .crossJoin(F.broadcast(cbp))
        .select(
            F.col(id_col),
            "cell",
            pq_codes_col(vec_col, m=m, sub=sub).alias("_codes"),
        )
    )
    scored = (
        coded.join(F.broadcast(probes_adc), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, pq_est_col(m=m).alias("est"))
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select("query_id", id_col, "est", "rnk")
    )
