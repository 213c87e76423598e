"""Similarity-search catalog entries over `embeddings`.

Cosine math is identical on both engines up to accumulation order;
similarities are rounded to 6 digits before any comparison/ordering so
results are engine-stable. LSH buckets are bit-identical (literal
hyperplane coefficients, left-assoc fold).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import similarity as sim
from dsp_spark.queries._util import t

DIM = 64
N_PLANES = 4
PLANES = sim.hyperplanes(N_PLANES, DIM)

_COS = (
    "round(list_dot_product(a.emb, b.emb) / "
    "(sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6)"
)


@register(
    "embedding_block_pairs",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb, vec_id // 100 AS block
        FROM embeddings
    )
    SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos_sim
        FROM e a JOIN e b ON a.block = b.block AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.1
    """,
    doc="Embedding near-dup pairs: blocked self-join (vec_id div 100) + "
    "exact cosine >= 0.1. Blocking bounds the quadratic term; at scale "
    "the block key becomes an LSH/IVF bucket.",
)
def embedding_block_pairs(spark, sf_dir):
    from dsp_spark.functions.vectors import dot, norm
    from dsp_spark.session import spread

    # norms once per row, not per pair; shuffle-hash self-join so both
    # sides share one exchange (ReuseExchange) instead of a broadcast
    # rebuild — also the only viable join at corpus scale
    e = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        F.expr("vec_id div 100").alias("block"),
        norm("embedding").alias("nrm"),
    )
    a = e.alias("a").hint("shuffle_hash")
    b = e.alias("b").hint("shuffle_hash")
    cos = F.round(
        dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.1)
    )


_COS_QC = (
    "round(list_dot_product(q.qv, e.emb) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.emb, e.emb))), 6)"
)


@register(
    "ann_bruteforce_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id, {_COS_QC} AS sim
        FROM e, q WHERE e.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 10
    """,
    doc="Exact cosine top-10 per query (queries broadcast against the "
    "corpus — one narrow scan, ranked window per query; the ANN recall "
    "baseline).",
)
def ann_bruteforce_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    out = sim.brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("int").alias("rnk")
    )


_BUCKET_DUCK = sim.bucket_sql(PLANES, "embedding", "duck")


@register(
    "ann_lsh_topk",
    f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               {_BUCKET_DUCK} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, emb AS qv, bucket AS qb
        FROM b WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               round(list_dot_product(q.qv, e.emb) /
                     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.emb, e.emb))), 6) AS sim
        FROM b e JOIN q ON e.bucket = q.qb
        WHERE e.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 10
    """,
    doc="LSH-bucketed ANN: 4 random-hyperplane sign bits -> bucket; exact "
    "cosine only within the query's bucket (equi-join on bucket, shuffle "
    "of ids not vector pairs — the scale path).",
)
def ann_lsh_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    out = sim.lsh_ann_topk(e, e.filter(F.col("vec_id") < 5), PLANES, k=10)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("int").alias("rnk")
    )


_COS_AC = (
    "round(list_dot_product(v.emb, c.cv) / "
    "(sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cv, c.cv))), 6)"
)


@register(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, emb AS cv FROM e WHERE vec_id % 100 = 0),
    asg AS (
        SELECT vec_id, emb, cell FROM (
            SELECT v.vec_id, v.emb, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c) WHERE rn = 1
    ), probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT v.vec_id AS query_id, v.emb AS qv, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c WHERE v.vec_id < 5) WHERE rn <= 2
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               round(list_dot_product(p.qv, a.emb) /
                     (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.emb, a.emb))), 6) AS sim
        FROM probes p JOIN asg a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 10
    """,
    doc="IVF ANN: deterministic coarse codebook (every 100th vector; "
    "k-means in production), corpus assigned to nearest cell, queries "
    "probe 2 cells, exact cosine only within probed cells. Disjoint "
    "cells => multi-probe never duplicates a candidate; corpus shuffles "
    "only by cell id.",
)
def ann_ivf_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") % 100 == 0)
    out = sim.ivf_topk(
        e, e.filter(F.col("vec_id") < 5), cent, nprobe=2, k=10
    )
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("int").alias("rnk")
    )


# one build per (corpus fingerprint): the persisted index exists to
# amortize assignment across query batches AND across processes — a
# fresh process trusts an on-disk index iff its commit-marker manifest
# matches the input's identity (path + size + mtime_ns + content
# digest of embeddings.parquet); any mismatch (testdata regenerated, crashed
# build with no marker, params drift) rebuilds. The per-process dict
# only avoids re-statting on every call.
_IVF_INDEX_BUILT: dict[str, str] = {}


def _ivf_fingerprint(full_sf_dir: str) -> str:
    """Identity of the index's input, content-aware: path + size +
    mtime_ns + a digest. Truncated-seconds mtime alone would trust a
    same-size regeneration within the same second, and a directory-
    shaped parquet whose part files are rewritten in place may not bump
    the DIRECTORY mtime at all — so files digest their parquet footer
    (row-group offsets + column stats live at the tail, so same-size
    different-data always differs there) and directories digest the
    per-file (relpath, size, mtime_ns) listing."""
    import hashlib
    import os

    src = os.path.join(full_sf_dir, "embeddings.parquet")
    st = os.stat(src)
    h = hashlib.md5()
    if os.path.isdir(src):
        for droot, _dirs, files in sorted(os.walk(src)):
            for fn in sorted(files):
                p = os.path.join(droot, fn)
                fst = os.stat(p)
                h.update(
                    f"{os.path.relpath(p, src)}|{fst.st_size}|{fst.st_mtime_ns};".encode()
                )
    else:
        with open(src, "rb") as f:
            f.seek(max(0, st.st_size - 65536))
            h.update(f.read())
    return f"{src}|{st.st_size}|{st.st_mtime_ns}|{h.hexdigest()}|cells=vec_id%100"


def _ivf_index_path(spark, sf_dir):
    import hashlib
    import json
    import os

    from dsp_spark.operators import ann_index

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # suffix with a hash of the FULL sf_dir: two corpora sharing a
    # basename (e.g. /root/testdata/sf0.01 vs /tmp/regen/sf0.01) must
    # never serve each other's cells; the cache key is the SAME
    # normalized path, so 'sf0.01' and 'sf0.01/' hit one build
    full = os.path.abspath(os.path.normpath(sf_dir))
    path = os.path.join(
        root,
        "spark-warehouse",
        "ann_index",
        os.path.basename(full)
        + "-"
        + hashlib.md5(full.encode()).hexdigest()[:8],
    )
    if _IVF_INDEX_BUILT.get(full) == path:
        return path
    fp = _ivf_fingerprint(full)
    marker = os.path.join(path, "_index_manifest.json")
    try:
        with open(marker) as f:
            if json.load(f).get("fingerprint") == fp:
                # a prior process built this index from the SAME input:
                # trust it (the marker travels inside the built dir
                # through the atomic rename — a crashed build removes
                # its tmp dir, so no matching marker can ever exist
                # without the data it describes)
                _IVF_INDEX_BUILT[full] = path
                return path
    except (OSError, ValueError):
        pass
    # reclaim pid-keyed garbage from EARLIER processes before
    # building: aside dirs are deliberately not deleted at swap
    # time (a concurrent reader that planned against the old index
    # opens its files lazily per task, so deleting immediately
    # after rename can still yield missing-file errors — Spark
    # lists at plan time, opens at execute time), and a tmp dir
    # survives only if its build crashed
    _reap_stale_dirs(path)
    e = t(spark, sf_dir, "embeddings")
    # build into a pid-unique temp dir and swap it in, so a
    # concurrent bench/driver_sim process never reads a
    # half-written index; readers of the OLD directory finish
    # against the renamed-aside copy (POSIX rename keeps open
    # handles valid), reaped on a later process's first build
    tmp = f"{path}.tmp-{os.getpid()}"
    try:
        ann_index.build_ivf_index(
            e, e.filter(F.col("vec_id") % 100 == 0), tmp
        )
        with open(os.path.join(tmp, "_index_manifest.json"), "w") as f:
            json.dump({"fingerprint": fp}, f)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _swap_dir(tmp, path)
    _IVF_INDEX_BUILT[full] = path
    return path


def _reap_stale_dirs(path: str) -> None:
    """Remove .tmp-PID / .old-PID siblings whose owning pid is dead.

    Bounded, pid-keyed garbage: each process leaves at most one aside
    dir per index path, and only if it rebuilt an existing index."""
    import glob
    import os
    import shutil

    for d in glob.glob(f"{path}.tmp-*") + glob.glob(f"{path}.old-*"):
        pid_s = d.rsplit("-", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        try:
            os.kill(int(pid_s), 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid: leave its dir alone


def _swap_dir(tmp: str, path: str) -> None:
    """Move a freshly built directory into place near-atomically.

    The displaced directory is renamed aside and LEFT ON DISK: a
    concurrent reader may have planned against the old index but not
    yet opened its files (Spark opens per task, lazily), so deleting
    here races with it. The aside dir is pid-keyed and reaped by the
    next process's build (_reap_stale_dirs)."""
    import os

    aside = f"{path}.old-{os.getpid()}"
    if os.path.exists(path):
        import shutil

        # this pid may rebuild the same path twice (testdata regenerated
        # mid-process): its previous aside is its own, safe to replace
        shutil.rmtree(aside, ignore_errors=True)
        os.rename(path, aside)
    try:
        os.rename(tmp, path)
    except OSError:
        # restore the previous index rather than leaving nothing
        if os.path.exists(aside) and not os.path.exists(path):
            os.rename(aside, path)
        raise


@register(
    "ann_index_persisted_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, emb AS cv FROM e WHERE vec_id % 100 = 0),
    asg AS (
        SELECT vec_id, emb, cell FROM (
            SELECT v.vec_id, v.emb, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c) WHERE rn = 1
    ), probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT v.vec_id AS query_id, v.emb AS qv, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c WHERE v.vec_id < 5) WHERE rn <= 2
    ), scored AS (
        SELECT p.query_id, a.vec_id,
               round(list_dot_product(p.qv, a.emb) /
                     (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.emb, a.emb))), 6) AS sim
        FROM probes p JOIN asg a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 10
    """,
    doc="The persisted-IVF index LIFECYCLE as a catalog entry: build "
    "writes the corpus cell-partitioned to parquet once per process "
    "(operators/ann_index.build_ivf_index — the ingest-time job), then "
    "the query reads ONLY the probed cells back through a partition "
    "filter (query_ivf_index; the scan lists nprobe/n_cells of the "
    "corpus, the IO shape that makes an index an index). Same "
    "deterministic codebook, nprobe and shared score_probed_cells as "
    "ann_ivf_topk, so the oracle — and the results — are identical to "
    "the scan-composed IVF by construction; what this entry adds to "
    "the driver check is the round-trip through the on-disk layout "
    "(write -> partition-pruned read -> score).",
)
def ann_index_persisted_topk(spark, sf_dir):
    from dsp_spark.operators import ann_index

    path = _ivf_index_path(spark, sf_dir)
    e = t(spark, sf_dir, "embeddings")
    out = ann_index.query_ivf_index(
        spark, path, e.filter(F.col("vec_id") < 5), nprobe=2, k=10
    )
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("int").alias("rnk")
    )


_Q8_CODES = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / "
    "(greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)"
    " / 127)) AS TINYINT))"
)


@register(
    "ann_int8_topk",
    f"""
    WITH e AS (
        SELECT vec_id, {_Q8_CODES} AS codes FROM embeddings
    ), n AS (
        SELECT vec_id, codes, sqrt(list_dot_product(codes, codes)) AS inorm FROM e
    ), q AS (
        SELECT vec_id AS query_id, codes AS q_codes, inorm AS q_inorm
        FROM n WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, n.vec_id,
               round(list_dot_product(q.q_codes, n.codes)
                     / (q.q_inorm * n.inorm), 6) AS qsim
        FROM n, q WHERE n.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, vec_id, qsim,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY qsim DESC, vec_id) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, qsim, rnk FROM ranked WHERE rnk <= 10
    """,
    doc="Int8-quantized cosine top-10: symmetric per-vector quantization "
    "(scales cancel in cosine), integer dot products — the 4x "
    "bandwidth/storage cut for billion-vector ANN; exact int math makes "
    "it engine-identical.",
)
def ann_int8_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    out = sim.int8_topk(e, e.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "vec_id", "qsim", F.col("rank").cast("int").alias("rnk")
    )


@register(
    "array_function_surface",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(list_sum(embedding::DOUBLE[]), 6) AS vec_sum,
           round(list_max(embedding::DOUBLE[]), 6) AS vec_max,
           round(list_min(embedding::DOUBLE[]), 6) AS vec_min,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 6) AS sq_sum,
           round((list_sort(embedding::DOUBLE[]))[1], 6) AS sorted_head,
           round((embedding::DOUBLE[])[1] + (embedding::DOUBLE[])[64], 6) AS ends_sum
    FROM embeddings
    """,
    doc="Higher-order array surface (transform/filter/aggregate/sort/"
    "element_at) over the embedding column — all JVM-side codegen, the "
    "vector feature-engineering toolkit with zero Python.",
)
def array_function_surface(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    emb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return e.selectExpr(
        "vec_id",
        "CAST(size(embedding) AS INT) AS dim",
        f"round(aggregate({emb}, 0D, (a, x) -> a + x), 6) AS vec_sum",
        f"round(array_max({emb}), 6) AS vec_max",
        f"round(array_min({emb}), 6) AS vec_min",
        f"CAST(size(filter({emb}, x -> x > 0)) AS INT) AS n_pos",
        f"round(aggregate({emb}, 0D, (a, x) -> a + x * x), 6) AS sq_sum",
        f"round(element_at(array_sort({emb}), 1), 6) AS sorted_head",
        f"round(element_at({emb}, 1) + element_at({emb}, 64), 6) AS ends_sum",
    )


@register(
    "embedding_kmeans_assign",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    s AS (SELECT vec_id AS seed_id, emb AS sv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT e.vec_id, s.seed_id,
               round(list_dot_product(e.emb, s.sv) /
                     (sqrt(list_dot_product(e.emb, e.emb)) *
                      sqrt(list_dot_product(s.sv, s.sv))), 6) AS sim
        FROM e, s
    ), ranked AS (
        SELECT vec_id, seed_id, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, seed_id) AS rn
        FROM scored
    )
    SELECT vec_id, seed_id AS centroid_id, sim FROM ranked WHERE rn = 1
    """,
    doc="K-means assignment step (the inner loop of distributed "
    "clustering): nearest of 10 seed centroids by cosine, ties to the "
    "lowest centroid id. Centroids are packed into one array-of-structs "
    "row and cross-joined broadcast; the argmin is a per-row array_min "
    "fold — ZERO shuffle of the corpus (vs. the window-rank shape, "
    "which would shuffle N*K scored rows). MLlib's KMeans broadcasts "
    "centroids the same way each iteration.",
)
def embedding_kmeans_assign(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("seed_id"), "embedding"
    )
    return sim.assign_nearest_centroid(
        e, seeds, centroid_id_col="seed_id"
    )


@register(
    "embedding_label_centroids",
    """
    WITH x AS (
        SELECT label, CAST(i AS INTEGER) AS pos,
               CAST(emb[CAST(i + 1 AS INTEGER)] AS DECIMAL(20,10)) AS v
        FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
             UNNEST(range(64)) AS r(i)
    )
    SELECT label, pos,
           round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS centroid_v,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM x GROUP BY label, pos
    """,
    doc="Per-label centroid vectors (the k-means update step / "
    "class-prototype embedding): posexplode to (label, dim) cells, one "
    "partial-agg shuffle on the 640 (label, pos) keys. Sums run in "
    "DECIMAL(20,10) so the mean is accumulation-order-independent and "
    "engine-exact. At 100 TB the map-side partial agg reduces each "
    "partition to at most labels*dims rows before the exchange.",
)
def embedding_label_centroids(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    x = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return x.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count("*"), 6
        ).alias("centroid_v"),
        F.count("*").alias("n_vectors"),
    )


_KM_SIM = (
    "round(list_dot_product(e.emb, c.cv) / "
    "(sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.cv, c.cv))), 6)"
)


@register(
    "embedding_kmeans_iterate",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    x AS (
        SELECT vec_id, CAST(i AS INTEGER) AS pos,
               CAST(emb[CAST(i + 1 AS INTEGER)] AS DECIMAL(20,10)) AS v
        FROM e, UNNEST(range(64)) AS r(i)
    ),
    c0 AS (SELECT vec_id AS cid, emb AS cv FROM e WHERE vec_id < 10),
    s1 AS (SELECT e.vec_id, c.cid, {_KM_SIM} AS sim FROM e, c0 c),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cid) AS rn
            FROM s1)
        WHERE rn = 1
    ),
    m1 AS (
        SELECT a1.cid, x.pos, round(CAST(SUM(x.v) AS DOUBLE) / COUNT(*), 6) AS cv
        FROM a1 JOIN x USING (vec_id) GROUP BY a1.cid, x.pos
    ),
    c1 AS (SELECT cid, list(cv ORDER BY pos) AS cv FROM m1 GROUP BY cid),
    s2 AS (SELECT e.vec_id, c.cid, {_KM_SIM} AS sim FROM e, c1 c)
    SELECT vec_id, cid AS centroid_id, sim FROM (
        SELECT vec_id, cid, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cid) AS rn
        FROM s2)
    WHERE rn = 1
    """,
    doc="Full Lloyd k-means round over embeddings (seed -> assign -> "
    "recompute means -> reassign): the iterative-algorithm pattern the "
    "SQL layer can't do without unrolling — the oracle IS the unrolled "
    "CTE chain, so even the iterative path is value-checked, not "
    "rows-only. Per round: one broadcast of k centroids (zero corpus "
    "shuffle for assignment) + one k*dim-key partial-agg exchange for "
    "the update; rounded decimal means keep every iteration "
    "engine-deterministic. operators/similarity.py:kmeans.",
)
def embedding_kmeans_iterate(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("seed_id"), "embedding"
    )
    return sim.kmeans(e, seeds, iters=1)


@register(
    "semantic_dedup_survivors",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    s AS (SELECT vec_id AS seed_id, emb AS sv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT e.vec_id, s.seed_id,
               round(list_dot_product(e.emb, s.sv) /
                     (sqrt(list_dot_product(e.emb, e.emb)) *
                      sqrt(list_dot_product(s.sv, s.sv))), 6) AS sim
        FROM e, s
    ), assign AS (
        SELECT vec_id, seed_id AS c FROM (
            SELECT vec_id, seed_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, seed_id) AS rn
            FROM scored) WHERE rn = 1
    ), ec AS (
        SELECT e.vec_id, e.emb, a.c
        FROM e JOIN assign a ON e.vec_id = a.vec_id
    ), dup AS (
        SELECT DISTINCT b.vec_id AS dup_id
        FROM ec a JOIN ec b ON a.c = b.c AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.emb, b.emb) /
                    (sqrt(list_dot_product(a.emb, a.emb)) *
                     sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.3
    )
    SELECT ec.vec_id, ec.c AS centroid_id FROM ec
    WHERE ec.vec_id NOT IN (SELECT dup_id FROM dup)
    """,
    doc="SemDeDup-style semantic dedup: k-means clusters bound the "
    "pairwise term (broadcast-centroid assignment, zero corpus "
    "shuffle), exact cosine within each cluster flags near-duplicate "
    "embeddings, and the earliest id in each flagged pair survives "
    "(later ids drop via anti-join). The embedding-space sibling of "
    "the text MinHash pipeline: cluster -> compare-inside-cluster -> "
    "survivors, the shape that scales to billions of vectors because "
    "no comparison ever crosses a cluster boundary.",
)
def semantic_dedup_survivors(spark, sf_dir):
    from dsp_spark.functions.vectors import dot, norm
    from dsp_spark.session import spread

    emb = t(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("seed_id"), "embedding"
    )
    # assignment is a per-row broadcast fold (assign_nearest_centroid,
    # the exact operator embedding_kmeans_assign wraps) — computing it
    # inline instead of joining that entry's output back on vec_id
    # removes one corpus scan and the vec_id exchange outright; the
    # eager checkpoint materializes the assigned rows once for their
    # three consumers (both pair-join sides + the anti-join left)
    e = (
        sim.assign_nearest_centroid(
            spread(emb), seeds, centroid_id_col="seed_id", keep_vec=True
        )
        .select("vec_id", "embedding", norm("embedding").alias("nrm"), "centroid_id")
        .localCheckpoint(eager=True)
    )
    # r14 (guide §2.5): the pair join is keyed on centroid_id — K=10
    # distinct values, so the in-cluster pairwise cosines ran on <= 10
    # tasks no matter the core count, and AQE's skew split never fires
    # on byte-tiny partitions. SALT the join: the b side lands in one
    # of _SD_SALT deterministic buckets (pmod(xxhash64(vec_id)), never
    # rand() — retry-safe per SPARK-38388), the a side replicates to
    # all of them, and the same pair set enumerates exactly once on
    # K x _SD_SALT keys. At a billion vectors the same salt is what
    # keeps one mega-cluster from pinning a single task.
    _SD_SALT = 8
    a = (
        e.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(_SD_SALT)]))
        )
        .alias("a")
        .hint("shuffle_hash")
    )
    b = (
        e.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(_SD_SALT)).cast("int")
        )
        .alias("b")
        .hint("shuffle_hash")
    )
    cos = F.round(
        dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.3)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return e.join(dup_ids, "vec_id", "left_anti").select(
        "vec_id", "centroid_id"
    )


@register(
    "ann_recall_at_k",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 5),
    bf AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                                      ORDER BY {_COS_QC} DESC, e.vec_id) AS rnk
            FROM e, q WHERE e.vec_id <> q.query_id
        ) WHERE rnk <= 10
    ),
    b AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               {_BUCKET_DUCK} AS bucket
        FROM embeddings
    ),
    qb AS (SELECT vec_id AS query_id, emb AS qv, bucket AS qbk
           FROM b WHERE vec_id < 5),
    ann AS (
        SELECT query_id, vec_id FROM (
            SELECT qb.query_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qb.query_id
                   ORDER BY round(list_dot_product(qb.qv, e.emb) /
                         (sqrt(list_dot_product(qb.qv, qb.qv)) *
                          sqrt(list_dot_product(e.emb, e.emb))), 6) DESC,
                         e.vec_id) AS rnk
            FROM b e JOIN qb ON e.bucket = qb.qbk
            WHERE e.vec_id <> qb.query_id
        ) WHERE rnk <= 10
    )
    SELECT bf.query_id,
           CAST(MAX(n_ann.n) AS BIGINT) AS n_ann,
           CAST(COUNT(ann.vec_id) AS BIGINT) AS n_hits,
           round(COUNT(ann.vec_id) / 10.0, 6) AS recall
    FROM bf
    LEFT JOIN ann ON ann.query_id = bf.query_id AND ann.vec_id = bf.vec_id
    JOIN (SELECT query_id, COUNT(*) AS n FROM ann GROUP BY query_id) n_ann
      ON n_ann.query_id = bf.query_id
    GROUP BY bf.query_id
    """,
    doc="ANN quality audit: recall@10 of the LSH index against the exact "
    "brute-force top-10, per query. The operator a production ANN "
    "deployment runs before trusting an index — recall is computed "
    "entirely from the two candidate sets (a join on (query, neighbor) "
    "ids), so at scale it costs two bounded top-k runs plus a tiny "
    "join, never a second full scan. Identical tiebreaks (sim DESC, "
    "vec_id) make the sets — and so the recall — engine-exact.",
)
def ann_recall_at_k(spark, sf_dir):
    from pyspark.sql import Window as W

    from dsp_spark.functions.vectors import dot, norm

    # one fused pass instead of two top-k runs joined back together:
    # the brute-force and in-bucket ranks are windows over the SAME
    # (query_id)-partitioned scored cross join (a pair is an ANN
    # candidate iff its buckets match), and the recall counts are one
    # groupBy on that same key — one corpus scan and one exchange where
    # the two-operator formulation paid two scans and re-shuffled each
    # top-k for the (query, neighbor) hit join. Ranks, tiebreaks and
    # the inner-join-on-n_ann semantics (queries with an empty bucket
    # emit no row) are unchanged.
    e = t(spark, sf_dir, "embeddings")
    bexpr = sim.bucket_sql(PLANES, "embedding", "spark")
    c = e.select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        F.expr(bexpr).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm("embedding").alias("q_nrm"),
        F.expr(bexpr).alias("q_bucket"),
    )
    simc = F.round(dot("q_vec", "embedding") / (F.col("q_nrm") * F.col("nrm")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            simc.alias("sim"),
            (F.col("bucket") == F.col("q_bucket")).alias("inb"),
        )
    )
    wb = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    wa = W.partitionBy("query_id", "inb").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    r = scored.select(
        "query_id",
        (F.row_number().over(wb) <= 10).alias("bf_top"),
        ((F.row_number().over(wa) <= 10) & F.col("inb")).alias("ann_top"),
    )
    return (
        r.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("ann_top"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_ann"),
            F.sum(F.when(F.col("ann_top") & F.col("bf_top"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
        )
        .where(F.col("n_ann") > 0)
        .select(
            "query_id",
            "n_ann",
            "n_hits",
            F.round(F.col("n_hits") / 10.0, 6).alias("recall"),
        )
    )


@register(
    "embedding_norm_audit",
    """
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(MIN(nrm), 6) AS min_norm,
           round(MAX(nrm), 6) AS max_norm,
           CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(SUM(CASE WHEN len <> 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_dim
    FROM (
        SELECT label,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               len(embedding) AS len
        FROM embeddings
    ) GROUP BY label
    """,
    doc="Embedding data-quality gate: per-label vector counts, norm "
    "range, zero vectors and wrong-dimension rows — the checks that run "
    "before any ANN/k-means job is allowed to index a corpus (a zero "
    "vector breaks cosine; a ragged dim breaks everything). Single "
    "narrow scan + one bounded group-by; min/max avoid cross-engine "
    "float-accumulation drift that avg would reintroduce.",
)
def embedding_norm_audit(spark, sf_dir):
    from dsp_spark.functions.vectors import norm

    e = t(spark, sf_dir, "embeddings").select(
        "label",
        norm("embedding").alias("nrm"),
        F.size("embedding").alias("len"),
    )
    return e.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.sum(F.when(F.col("len") != DIM, 1).otherwise(0))
        .cast("long")
        .alias("n_bad_dim"),
    )


# Shared PQ oracle building blocks (mirrors operators/similarity.py:
# pq_parts — ONE text for codebook/encode/ADC so the three PQ entries
# can't drift apart): requires a preceding CTE `e(vec_id, emb DOUBLE[])`.
_PQ_CTES = """sub AS (
        SELECT vec_id, CAST(i AS INTEGER) AS m,
               emb[(CAST(i AS INTEGER) * 8 + 1):(CAST(i AS INTEGER) * 8 + 8)]
                 AS sv
        FROM e, UNNEST(range(8)) AS r(i)
    ),
    cb AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < 16),
    enc AS (
        SELECT vec_id, m, code FROM (
            SELECT s.vec_id, s.m, c.code,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY round(list_dot_product(s.sv, c.cv), 6) DESC,
                                c.code) AS rn
            FROM sub s JOIN cb c USING (m))
        WHERE rn = 1
    ),
    qsub AS (SELECT vec_id AS query_id, m, sv AS qv FROM sub
             WHERE vec_id < 5),
    adc AS (
        SELECT qsub.query_id, qsub.m, c.code,
               CAST(round(list_dot_product(qsub.qv, c.cv), 8)
                    AS DECIMAL(18,8)) AS pdot
        FROM qsub JOIN cb c USING (m)
    )"""


@register(
    "ann_pq_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_PQ_CTES},
    scored AS (
        SELECT a.query_id, enc.vec_id, CAST(SUM(a.pdot) AS DOUBLE) AS est
        FROM enc JOIN adc a ON a.m = enc.m AND a.code = enc.code
        WHERE enc.vec_id <> a.query_id
        GROUP BY a.query_id, enc.vec_id
    )
    SELECT query_id, vec_id, est, rnk FROM (
        SELECT query_id, vec_id, est,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY est DESC, vec_id)
                    AS INTEGER) AS rnk
        FROM scored)
    WHERE rnk <= 10
    """,
    doc="Product-quantization ANN (PQ + ADC), the billion-vector "
    "memory/bandwidth path: vectors compress to 8 one-byte sub-codes "
    "(64x smaller than float64), and each query scores candidates with "
    "8 broadcast table lookups instead of a 64-dim dot product. "
    "Encoding is a map-side struct-argmax against the broadcast "
    "codebook (the only corpus shuffle carries (id, subspace, code)); "
    "the per-subspace partial dots sum as exact DECIMAL so the "
    "estimated scores are bit-identical across engines. "
    "operators/similarity.py:pq_topk.",
)
def ann_pq_topk(spark, sf_dir):
    return sim.pq_topk(t(spark, sf_dir, "embeddings"))


@register(
    "ann_ivfpq_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, emb AS cv FROM e WHERE vec_id % 100 = 0),
    asg AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c) WHERE rn = 1
    ), probes AS (
        SELECT query_id, cell FROM (
            SELECT v.vec_id AS query_id, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_COS_AC} DESC, c.cent_id) AS rn
            FROM e v, cent c WHERE v.vec_id < 5) WHERE rn <= 2
    ),
    {_PQ_CTES},
    scored AS (
        SELECT p.query_id, s.vec_id, CAST(SUM(ad.pdot) AS DOUBLE) AS est
        FROM enc s
        JOIN asg a USING (vec_id)
        JOIN probes p ON p.cell = a.cell
        JOIN adc ad ON ad.query_id = p.query_id
                   AND ad.m = s.m AND ad.code = s.code
        WHERE s.vec_id <> p.query_id
        GROUP BY p.query_id, s.vec_id
    )
    SELECT query_id, vec_id, est, rnk FROM (
        SELECT query_id, vec_id, est,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY est DESC, vec_id)
                    AS INTEGER) AS rnk
        FROM scored)
    WHERE rnk <= 10
    """,
    doc="IVF-PQ (the FAISS IVFPQ composition): coarse cells prune the "
    "candidate set per query, PQ codes + a broadcast ADC table score "
    "what's left — at a billion vectors the index reads a few cells' "
    "code lists (one byte per subspace per vector) instead of any "
    "float data. Same deterministic codebooks and DECIMAL-exact ADC "
    "sums as ann_pq_topk; candidate pruning shuffles only (id, cell). "
    "operators/similarity.py:ivfpq_topk.",
)
def ann_ivfpq_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return sim.ivfpq_topk(
        e,
        e.filter(F.col("vec_id") < 5),
        e.filter(F.col("vec_id") % 100 == 0),
        nprobe=2,
        k=10,
    )


@register(
    "ann_pq_recall",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 5),
    bf AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                                      ORDER BY {_COS_QC} DESC, e.vec_id) AS rnk
            FROM e, q WHERE e.vec_id <> q.query_id
        ) WHERE rnk <= 10
    ),
    {_PQ_CTES},
    pqs AS (
        SELECT a.query_id, enc.vec_id, CAST(SUM(a.pdot) AS DOUBLE) AS est
        FROM enc JOIN adc a ON a.m = enc.m AND a.code = enc.code
        WHERE enc.vec_id <> a.query_id
        GROUP BY a.query_id, enc.vec_id
    ),
    pq AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY est DESC, vec_id) AS rnk
            FROM pqs)
        WHERE rnk <= 10
    )
    SELECT bf.query_id,
           CAST(COUNT(pq.vec_id) AS BIGINT) AS n_hits,
           CAST(COUNT(pq.vec_id) AS DOUBLE) / 10 AS recall_at_10
    FROM bf LEFT JOIN pq
      ON pq.query_id = bf.query_id AND pq.vec_id = bf.vec_id
    GROUP BY bf.query_id
    """,
    doc="PQ recall audit: per query, how many of the exact cosine "
    "top-10 the PQ/ADC top-10 recovers — the compression-vs-recall "
    "dial every billion-vector deployment tunes (more subspaces / "
    "bigger codebooks buy recall). Brute force runs once over the "
    "small query set as ground truth; both rankings come from the "
    "same deterministic codebooks, and recall is a ratio of exact "
    "integers.",
)
def ann_pq_recall(spark, sf_dir):
    # Fused single-pass shape (r14, guide §2.4 — the ann_recall_at_k
    # pattern): the exact and PQ rankings run over the SAME candidate
    # domain (every corpus vector except self, per query), so one
    # corpus x queries pass computes BOTH scores per row — exact
    # cosine from the broadcast query vector, the ADC estimate from
    # the in-row PQ codes + the query's broadcast ADC map — and the
    # two row_number windows share ONE query_id exchange. The recall
    # join disappears: a bf row is a hit iff its PQ rank is <= 10 on
    # the same row (COUNT(pq.vec_id) over the old bf LEFT JOIN pq ==
    # count of rows in both top-10s). Scores, ranks, tie-breaks and
    # the self-exclusion are unchanged from brute_force_topk/pq_topk.
    from pyspark.sql import Window as W

    from dsp_spark.functions.vectors import dot, norm

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cbp = sim.pq_codebook_packed(e)
    qb = (
        e.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(cbp))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            norm("embedding").alias("q_nrm"),
            sim.pq_adc_map_col("embedding").alias("_adc"),
        )
    )
    from dsp_spark.session import spread

    # spread(): the in-row encode + per-query cosine folds are heavy
    # scan-side work on a one-row-group test file's single partition
    # (no-op at real scan parallelism)
    c = spread(e).crossJoin(F.broadcast(cbp)).select(
        "vec_id",
        "embedding",
        norm("embedding").alias("nrm"),
        sim.pq_codes_col("embedding").alias("_codes"),
    )
    rows = (
        c.crossJoin(F.broadcast(qb))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("q_vec", "embedding") / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("sim"),
            sim.pq_est_col().alias("est"),
        )
    )
    wbf = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    wpq = W.partitionBy("query_id").orderBy(F.desc("est"), F.asc("vec_id"))
    return (
        rows.select(
            "query_id",
            F.row_number().over(wbf).alias("_rbf"),
            F.row_number().over(wpq).alias("_rpq"),
        )
        .filter(F.col("_rbf") <= 10)
        .groupBy("query_id")
        .agg(
            F.count(F.when(F.col("_rpq") <= 10, F.lit(1))).alias("n_hits"),
            (
                F.count(F.when(F.col("_rpq") <= 10, F.lit(1))).cast("double")
                / 10
            ).alias("recall_at_10"),
        )
    )


@register(
    "embedding_cluster_purity",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
               FROM embeddings),
    s AS (SELECT vec_id AS seed_id, emb AS sv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT e.vec_id, e.label, s.seed_id,
               round(list_dot_product(e.emb, s.sv) /
                     (sqrt(list_dot_product(e.emb, e.emb)) *
                      sqrt(list_dot_product(s.sv, s.sv))), 6) AS sim
        FROM e, s
    ), assigned AS (
        SELECT vec_id, label, seed_id AS centroid_id FROM (
          SELECT vec_id, label, seed_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, seed_id) AS rn
          FROM scored
        ) WHERE rn = 1
    ), lc AS (
        SELECT centroid_id, label, COUNT(*) AS c
        FROM assigned GROUP BY 1, 2
    ), ranked AS (
        SELECT centroid_id, label, c,
               ROW_NUMBER() OVER (PARTITION BY centroid_id
                                  ORDER BY c DESC, label ASC) AS rn,
               SUM(c) OVER (PARTITION BY centroid_id) AS n
        FROM lc
    )
    SELECT centroid_id,
           CAST(MAX(n) AS BIGINT) AS n_vecs,
           CAST(MAX(CASE WHEN rn = 1 THEN label END) AS INTEGER)
             AS top_label,
           CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT)
             AS top_label_n,
           CAST(MAX(CASE WHEN rn = 1 THEN c END) AS DOUBLE) / MAX(n)
             AS purity
    FROM ranked GROUP BY centroid_id
    """,
    doc="Cluster-label purity audit: assign every vector to its nearest "
    "of the 10 deterministic seed centroids (identical assignment rule "
    "to embedding_kmeans_assign — broadcast centroids, zero corpus "
    "shuffle), then per cluster report size, majority label, and "
    "purity — the quick external-validity check that says whether "
    "embedding clusters track labels before anyone trusts "
    "semantic-dedup or topic-balance decisions built on them. The "
    "post-assignment windows run on the (centroid x label) relation, "
    "bounded by K x |labels|, never data grain.",
)
def embedding_cluster_purity(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("seed_id"), "embedding"
    )
    assigned = sim.assign_nearest_centroid(
        e, seeds, centroid_id_col="seed_id"
    ).select("vec_id", "centroid_id")
    labeled = assigned.join(e.select("vec_id", "label"), "vec_id")
    lc = labeled.groupBy("centroid_id", "label").agg(
        F.count("*").alias("c")
    )
    wc = W.partitionBy("centroid_id")
    ranked = lc.select(
        "centroid_id",
        "label",
        "c",
        F.row_number()
        .over(wc.orderBy(F.desc("c"), F.asc("label")))
        .alias("rn"),
        F.sum("c").over(wc).alias("n"),
    )
    return ranked.groupBy("centroid_id").agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.max(F.when(F.col("rn") == 1, F.col("label")))
        .cast("int")
        .alias("top_label"),
        F.max(F.when(F.col("rn") == 1, F.col("c")))
        .cast("bigint")
        .alias("top_label_n"),
        (
            F.max(F.when(F.col("rn") == 1, F.col("c"))).cast("double")
            / F.max("n")
        ).alias("purity"),
    )


@register(
    "embedding_label_margin",
    """
    WITH cells AS (
      SELECT vec_id, label, CAST(generate_subscripts(embedding, 1)
               AS INTEGER) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS v6
      FROM embeddings
    ), cent AS (
      SELECT label AS clabel, pos,
             CASE WHEN SUM(v6) < 0
                  THEN -(abs(SUM(v6)) // (COUNT(*) * 1000))
                  ELSE abs(SUM(v6)) // (COUNT(*) * 1000) END AS c3
      FROM cells GROUP BY label, pos
    ), cnorm AS (
      SELECT clabel, SUM(c3 * c3) AS cn2 FROM cent GROUP BY clabel
    ), vnorm AS (
      SELECT vec_id, SUM(v6 * v6) AS vn2 FROM cells GROUP BY vec_id
    ), dots AS (
      SELECT c.vec_id, c.label, ct.clabel, SUM(c.v6 * ct.c3) AS dot
      FROM cells c JOIN cent ct ON c.pos = ct.pos
      GROUP BY 1, 2, 3
    ), sims AS (
      SELECT d.label, d.clabel,
             CAST(round(CAST(d.dot AS DOUBLE)
                        / (sqrt(CAST(v.vn2 AS DOUBLE))
                           * sqrt(CAST(n.cn2 AS DOUBLE))), 6)
                  AS DECIMAL(12,6)) AS sim
      FROM dots d
      JOIN vnorm v ON d.vec_id = v.vec_id
      JOIN cnorm n ON d.clabel = n.clabel
    ), pairmeans AS (
      SELECT label, clabel, COUNT(*) AS n,
             CAST(SUM(sim) AS DOUBLE) / COUNT(*) AS mean_sim
      FROM sims GROUP BY label, clabel
    ), ranked AS (
      SELECT label, clabel, n, mean_sim,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY
               CASE WHEN clabel = label THEN 1 ELSE 0 END,
               mean_sim DESC, clabel ASC) AS rnk
      FROM pairmeans
    )
    SELECT label,
           CAST(MAX(CASE WHEN clabel = label THEN n END) AS BIGINT)
             AS n_vecs,
           MAX(CASE WHEN clabel = label THEN mean_sim END) AS intra_sim,
           CAST(MAX(CASE WHEN rnk = 1 THEN clabel END) AS INTEGER)
             AS rival_label,
           MAX(CASE WHEN rnk = 1 THEN mean_sim END) AS rival_sim,
           MAX(CASE WHEN clabel = label THEN mean_sim END)
             - MAX(CASE WHEN rnk = 1 THEN mean_sim END) AS margin
    FROM ranked GROUP BY label
    """,
    doc="Label-separation margin for the embedding space: mean cosine "
    "of each class to its own prototype vs its closest rival class — "
    "margin <= 0 means the space cannot separate those labels and any "
    "semantic-dedup or topic-balance decision built on it is noise. "
    "All-integer geometry: cells quantize to 1e-6 fixed point (FLOOR, "
    "no tie rule), prototypes live in 1e-3 units via an explicit "
    "sign-split truncating division (Spark DIV truncates, DuckDB // "
    "floors — the CASE makes both truncate), every dot/norm is an "
    "exact BIGINT sum, and cosines round to 6 decimals before the "
    "order-independent DECIMAL mean. The pos-join side broadcasts the "
    "640-row prototype table, so the corpus explodes once and never "
    "self-joins; rival ranking runs on the labels x labels relation.",
)
def embedding_label_margin(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "embeddings")
    cells = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.floor(F.col("v").cast("double") * 1000000)
        .cast("bigint")
        .alias("v6"),
    )
    cent = cells.groupBy(
        F.col("label").alias("clabel"), "pos"
    ).agg(
        F.expr(
            "CASE WHEN SUM(v6) < 0"
            " THEN -(abs(SUM(v6)) DIV (COUNT(*) * 1000))"
            " ELSE abs(SUM(v6)) DIV (COUNT(*) * 1000) END"
        ).alias("c3")
    )
    # r14 (guide §2.4, the PQ/ivf_assign in-row-fold pattern): the
    # vector-side quantization, norm, and the 10 prototype dots are all
    # per-row decisions against a broadcast 10-row prototype table, so
    # they fold in-row — the exploded pos-join, the (vec, label,
    # clabel) dot groupBy, and the vnorm groupBy + join all disappear;
    # the only corpus-grain exchange left is the tiny (label, clabel)
    # pairmeans partial agg. The explode survives solely to BUILD the
    # prototypes (cent), whose per-(label, pos) mean needs the corpus
    # aggregate either way. Same exact-BIGINT dot/norm sums (integer
    # addition is order-independent), same rounding grains.
    packed = (
        cent.groupBy("clabel")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, c3))),"
                " s -> s.c3)"
            ).alias("carr"),
            F.sum(F.col("c3") * F.col("c3")).alias("cn2"),
        )
    )
    from dsp_spark.session import spread

    v6arr = F.expr(
        "transform(embedding, v ->"
        " CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    # spread(): in-row quantize + 10 bigint dot folds per row are heavy
    # scan-side work on a one-row-group test file's single partition
    # (no-op at real scan parallelism)
    vecs = spread(e).select(
        "vec_id",
        "label",
        v6arr.alias("_v6"),
    ).select(
        "vec_id",
        "label",
        "_v6",
        F.expr(
            "aggregate(transform(_v6, v -> v * v), 0L, (acc, x) -> acc + x)"
        ).alias("vn2"),
    )
    dotf = F.expr(
        "aggregate(zip_with(_v6, carr, (v, c) -> v * c), 0L,"
        " (acc, x) -> acc + x)"
    )
    sims = (
        vecs.crossJoin(F.broadcast(packed))
        .select(
            "label",
            "clabel",
            F.round(
                dotf.cast("double")
                / (
                    F.sqrt(F.col("vn2").cast("double"))
                    * F.sqrt(F.col("cn2").cast("double"))
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias("sim"),
        )
    )
    pairmeans = sims.groupBy("label", "clabel").agg(
        F.count("*").alias("n"),
        (F.sum("sim").cast("double") / F.count("*")).alias("mean_sim"),
    )
    wr = W.partitionBy("label").orderBy(
        F.when(F.col("clabel") == F.col("label"), 1).otherwise(0),
        F.desc("mean_sim"),
        F.asc("clabel"),
    )
    ranked = pairmeans.withColumn("rnk", F.row_number().over(wr))
    intra = F.max(
        F.when(F.col("clabel") == F.col("label"), F.col("mean_sim"))
    )
    rival = F.max(F.when(F.col("rnk") == 1, F.col("mean_sim")))
    return ranked.groupBy("label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("n")))
        .cast("bigint")
        .alias("n_vecs"),
        intra.alias("intra_sim"),
        F.max(F.when(F.col("rnk") == 1, F.col("clabel")))
        .cast("int")
        .alias("rival_label"),
        rival.alias("rival_sim"),
        (intra - rival).alias("margin"),
    )
