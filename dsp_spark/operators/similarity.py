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
    cells = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col, nprobe=1)
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
    codes, _ = quantize_int8(vec_col)
    c = corpus.select(F.col(id_col), codes.alias("codes")).withColumn(
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
    vec_cols = [vec_col] if keep_vec else []
    return (
        corpus.select(id_col, vec_col, norm(vec_col).alias("nrm"))
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


def pq_parts(
    corpus,
    queries,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub: int = 8,
    ksub: int = 16,
):
    """Shared PQ building blocks for :func:`pq_topk` / :func:`ivfpq_topk`
    (ONE implementation of codebook/encode/ADC so tie-breaks, rounding
    grains and defaults can never diverge between the PQ variants):

    * ``cb``  — the broadcastable codebook: the first ``ksub`` vectors'
      subvectors per subspace (a trained codebook drops in identically);
    * ``enc`` — per-(vector, subspace) max-dot code via map-side
      struct-argmax (ties to the lowest code id); the only corpus-sized
      shuffle carries (id, m, code), never vectors;
    * ``adc`` — the queries x m x ksub partial-dot lookup table,
      DECIMAL(18,8)-rounded so downstream sums are order-independent.
    """
    from dsp_spark.functions.vectors import dot

    def explode_subs(df, out):
        return df.select(
            F.col(id_col),
            F.posexplode(
                F.array(
                    *[
                        F.slice(F.col(vec_col), i * sub + 1, sub)
                        for i in range(m)
                    ]
                )
            ).alias("m", out),
        )

    subs = explode_subs(corpus, "sv")
    cb = subs.where(F.col(id_col) < ksub).select(
        "m", F.col(id_col).alias("code"), F.col("sv").alias("cv")
    )
    d6 = F.round(dot("sv", "cv"), 6)
    enc = (
        subs.join(F.broadcast(cb), "m")
        .select(F.col(id_col), "m", d6.alias("d6"), "code")
        .groupBy(id_col, "m")
        .agg(F.max(F.struct("d6", (-F.col("code")).alias("nc"))).alias("b"))
        .select(id_col, "m", (-F.col("b.nc")).cast("bigint").alias("code"))
    )
    q = explode_subs(queries, "qv").withColumnRenamed(id_col, "query_id")
    adc = q.join(F.broadcast(cb), "m").select(
        "query_id",
        "m",
        "code",
        F.round(dot("qv", "cv"), 8).cast("decimal(18,8)").alias("pdot"),
    )
    return cb, enc, adc


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

    Stages (all broadcast-bounded; the corpus never self-joins):
      1. codebook: the first ``ksub`` vectors' subvectors, per subspace
         (a trained codebook drops in identically — it's broadcast
         either way);
      2. encode: max-dot sub-centroid per (vector, subspace) as a
         map-side partial-agg argmax (struct max, ties to lowest code)
         — the only corpus-sized shuffle carries (id, m, code), never
         vectors;
      3. ADC: the nq x m x ksub partial-dot lookup table, broadcast;
      4. score: codes join the broadcast table, partial-agg sum the m
         per-subspace dots (exact DECIMAL, order-independent), rank
         top-k per query.

    Determinism: sub-dots are fixed-order array folds rounded once,
    summed as DECIMAL(18,8); the estimate surfaces as the exact sum
    cast to double (value far below 2^53, so the cast is exact on any
    engine).
    """
    from pyspark.sql import Window as W

    e = corpus.select(id_col, vec_col)
    _, enc, adc = pq_parts(
        e,
        e.where(F.col(id_col) < nq),
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        sub=sub,
        ksub=ksub,
    )
    scored = (
        enc.join(F.broadcast(adc), ["m", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("pdot").cast("double").alias("est"))
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

    Reuses :func:`ivf_assign` for cells/probes and the same
    encode/ADC shapes as :func:`pq_topk` (broadcast codebook,
    map-side struct-argmax encode, DECIMAL-exact ADC sums). The only
    corpus-sized shuffles carry (id, cell) and (id, subspace, code) —
    never vectors.
    """
    from pyspark.sql import Window as W

    cells = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col, nprobe=1
    ).select(id_col, "cell")
    probes = ivf_assign(
        queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    ).select(F.col(id_col).alias("query_id"), "cell")

    # ADC subvectors come from the QUERIES argument — not from corpus
    # rows that happen to share ids — so probes and lookup tables always
    # describe the same query set
    _, enc, adc = pq_parts(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        sub=sub,
        ksub=ksub,
    )
    candidates = (
        enc.join(cells, id_col)
        .join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("query_id"))
    )
    scored = candidates.join(
        F.broadcast(adc), ["query_id", "m", "code"]
    ).groupBy("query_id", id_col).agg(
        F.sum("pdot").cast("double").alias("est")
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select("query_id", id_col, "est", "rnk")
    )
