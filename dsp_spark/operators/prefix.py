"""Distributed prefix aggregation: exact global cumsum / rank / ntile
WITHOUT a single-partition window.

An unpartitioned Spark window (``Window.orderBy(...)`` with no
``partitionBy``) moves EVERY row to ONE task — the planner emits
``Exchange SinglePartition`` and logs ``WindowExec: No Partition
Defined``. Correct at test scale, an outage at 100 TB. The reference
engine never hits this because it has no relational layer (SURVEY.md
§4.1); on Spark the fix is the classic two-phase scan:

1. **Bucket** every row by where its sort key falls among B
   ``percentile_approx`` cutpoints of a numeric proxy of the leading
   sort column (one tiny 1-row aggregate, broadcast to the scan — no
   driver-side collect, the plan stays lazy). The bucket id is
   monotone in the total sort order, so bucket i holds exactly the
   rows ranked before bucket i+1. Ties on the proxy stay in one
   bucket; worst-case skew is the largest tie group — the same bound
   a range partitioner gives.
2. **Local pass**: one ordinary window partitioned BY BUCKET computes
   the within-bucket running value. This is the only shuffle of the
   data (hash on bucket id, B-way parallel).
3. **Offsets**: per-bucket totals (map-side partial agg over the same
   exchange — AQE reuses it) are cumulated with a window over ≤ B
   rows (bounded by the bucket count, a config constant, NEVER by
   data size) and broadcast-joined back; global value = local value
   + offset of all earlier buckets.

The output is exact and engine-deterministic for any cutpoints —
bucket boundaries only decide WHERE work happens, never the result —
so ``percentile_approx``'s approximation and merge order are
irrelevant to correctness. Sort keys must be non-null and the
(order) list must be a total order (include a tiebreaker).

``global_ntile`` additionally needs the exact SQL NTILE bucket rule:
with N rows and k tiles, the first ``N mod k`` tiles get
``ceil(N/k)`` rows, the rest ``floor(N/k)`` — computed from the
two-phase rank and the (broadcast, 1-row) total. Tile arithmetic is
exact for N < 2^53 (double-precision integer range).

``checkpoint=True`` localCheckpoints the input first. The helpers
fan the input into several branches (cutpoints, local pass, offsets,
total); when the input is itself an aggregate, Catalyst's column
pruning specializes each branch's partial agg to different columns,
the canonicalized subtrees stop matching, and exchange reuse dies —
the upstream gets recomputed once per branch. Materializing the
(tiny, post-aggregate) grain table once is the scale-correct cure:
one upstream scan+shuffle, then every branch reads cached
partitions. Use it whenever the input is more than a bare scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _bucketed(
    df: DataFrame, proxy: Column, desc: bool, buckets: int
) -> DataFrame:
    """Add ``_bkt``: the row's position among B-1 percentile cutpoints
    of ``proxy`` (ascending or descending), computed fully lazily."""
    fracs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    cuts = df.agg(
        F.percentile_approx(proxy.cast("double"), fracs).alias("_cuts")
    )
    pxd = proxy.cast("double")
    pred = (lambda c: c > pxd) if desc else (lambda c: c < pxd)
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("_bkt", F.size(F.filter("_cuts", pred)))
        .drop("_cuts")
    )


def _offsets_window() -> W:
    # Runs over ≤ `buckets` rows — bounded by config, not data; the one
    # place a single-partition window is legitimate.
    return W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)


def global_cumsum(
    df: DataFrame,
    order: list[Column],
    value: Column | str,
    out: str,
    *,
    proxy: Column,
    proxy_desc: bool = False,
    buckets: int = 64,
    checkpoint: bool = False,
) -> DataFrame:
    """Exact running SUM(value) over the global `order`, two-phase.

    Equivalent to ``F.sum(value).over(W.orderBy(*order).rowsBetween(
    unboundedPreceding, currentRow))`` but shuffles once on the bucket
    id instead of once into a single task.
    """
    if checkpoint:
        df = df.localCheckpoint()
    b = _bucketed(df, proxy, proxy_desc, buckets)
    lw = (
        W.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    loc = b.withColumn("_loc", F.sum(value).over(lw)).withColumn(
        "_rn", F.row_number().over(lw)
    )
    offs = (
        loc.groupBy("_bkt")
        # bucket total = last running value in sort order (works for
        # negative values too, unlike max(_loc))
        .agg(F.max_by("_loc", "_rn").alias("_tot"))
        .withColumn(
            "_off", F.coalesce(F.sum("_tot").over(_offsets_window()), F.lit(0))
        )
    )
    return (
        loc.join(F.broadcast(offs.select("_bkt", "_off")), "_bkt")
        .withColumn(out, F.col("_loc") + F.col("_off"))
        .drop("_bkt", "_loc", "_rn", "_off")
    )


def _ranked(
    df: DataFrame, order: list[Column], proxy: Column, desc: bool, buckets: int
):
    b = _bucketed(df, proxy, desc, buckets)
    loc = b.withColumn(
        "_rn", F.row_number().over(W.partitionBy("_bkt").orderBy(*order))
    )
    offs = (
        loc.groupBy("_bkt")
        # count(*), NOT max(_rn): pruning drops the row_number Window
        # from this branch, so the count collapses to a map-side
        # partial agg and the offsets shuffle carries ~B tiny rows.
        # (max(_rn) would keep the Window hoping for exchange reuse —
        # but reuse NEVER fires over a localCheckpoint RDD scan, Spark
        # does not canonicalize RDD-scan subtrees as equal, so it would
        # just re-shuffle and re-sort the full data a second time.)
        .agg(F.count("*").cast("bigint").alias("_cnt"))
        .withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(_offsets_window()), F.lit(0))
        )
    )
    return loc, offs


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out: str,
    *,
    proxy: Column,
    proxy_desc: bool = False,
    buckets: int = 64,
    checkpoint: bool = False,
) -> DataFrame:
    """Exact 1-based ROW_NUMBER() over the global `order`, two-phase."""
    if checkpoint:
        df = df.localCheckpoint()
    loc, offs = _ranked(df, order, proxy, proxy_desc, buckets)
    return (
        loc.join(F.broadcast(offs.select("_bkt", "_off")), "_bkt")
        .withColumn(out, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_bkt", "_rn", "_off")
    )


def global_ntile(
    df: DataFrame,
    order: list[Column],
    n_tiles: int,
    out: str,
    *,
    proxy: Column,
    proxy_desc: bool = False,
    buckets: int = 64,
    checkpoint: bool = False,
) -> DataFrame:
    """Exact NTILE(n_tiles) over the global `order`, two-phase.

    Matches SQL NTILE bit-for-bit: with N rows, the first N mod k
    tiles hold ceil(N/k) rows, the remaining floor(N/k).
    """
    if checkpoint:
        df = df.localCheckpoint()
    loc, offs = _ranked(df, order, proxy, proxy_desc, buckets)
    tot = offs.agg(F.sum("_cnt").alias("_n"))
    r = F.col("_rn") + F.col("_off")
    k = F.lit(n_tiles).cast("bigint")
    q = F.floor(F.col("_n") / k)
    m = F.col("_n") % k
    big = m * (q + 1)
    tile = F.when(r <= big, F.ceil(r / (q + 1))).otherwise(
        m + F.ceil((r - big) / F.greatest(q, F.lit(1)))
    )
    return (
        loc.join(F.broadcast(offs.select("_bkt", "_off")), "_bkt")
        .crossJoin(F.broadcast(tot))
        .withColumn(out, tile.cast("int"))
        .drop("_bkt", "_rn", "_off", "_n")
    )


def global_ntile_multi(
    df: DataFrame,
    key: str,
    dims: dict[str, Column],
    n_tiles: int,
    *,
    buckets: int = 64,
    checkpoint: bool = True,
    payload: list[str] | None = None,
) -> DataFrame:
    """Exact ascending NTILE(n_tiles) over SEVERAL orderings at once.

    ``dims`` maps each output column to a double-castable expression
    that is monotone AND injective in that dimension's sort value
    (ties then break on ``key``) — e.g. epoch seconds for a
    timestamp, the value itself for numerics. Returns one row per
    ``key`` with all tile columns.

    Why not one :func:`global_ntile` per dimension: each call is its
    own cutpoint-aggregate + shuffle + window + offsets chain, so k
    dimensions cost k full pipelines plus k joins. Melting to
    (key, dim, value) instead runs ONE percentile aggregate (grouped
    by dim), ONE (dim, bucket) shuffle + window, ONE offsets table,
    and folds back with a single groupBy(key) — the per-dimension
    cost collapses to extra rows, which is what Spark scales with,
    not extra stages. All tiny windows here are partitioned by dim,
    so the plan contains NO unpartitioned window at all.

    ``payload`` names input columns to carry through and return with
    the tiles — the caller then needs NO join back onto the grain
    table (exchange reuse never fires over the checkpointed RDD scan,
    so that join re-shuffles both sides). Carried values ride only
    the FIRST dimension's melted rows, so shuffle bytes grow by one
    payload copy, not one per dimension.
    """
    names = list(dims)
    payload = payload or []
    # reject ambiguous outputs up front: payload columns that collide
    # with a dim output name, the key, or an internal working column
    # would silently produce duplicate-named columns that break
    # downstream by-name selection (mirrors zorder_layout's guard)
    reserved = {"_dim", "_val", "_x", "_bkt", "_rn", "_off", "_n", "_cnt", "_cuts"}
    for label, group in (
        ("dims", set(names)),
        ("payload", set(payload)),
        ("key", {key}),
    ):
        clash = group & reserved
        if clash:
            raise ValueError(f"{label} names collide with internals: {sorted(clash)}")
    overlap = (set(payload) & (set(names) | {key})) | (set(names) & {key})
    if overlap:
        raise ValueError(
            f"payload/dims/key names must be disjoint, got overlap: {sorted(overlap)}"
        )
    if checkpoint:
        df = df.localCheckpoint()
    melted = df.select(
        key,
        *payload,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_dim"),
                        expr.cast("double").alias("_val"),
                    )
                    for i, expr in enumerate(dims.values())
                ]
            )
        ).alias("_x"),
    ).select(
        key,
        F.col("_x._dim").alias("_dim"),
        F.col("_x._val").alias("_val"),
        # payload rides dim 0 only: rows for the other dims carry null
        *[
            F.when(F.col("_x._dim") == 0, F.col(p)).alias(p)
            for p in payload
        ],
    )

    fracs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    cuts = melted.groupBy("_dim").agg(
        F.percentile_approx("_val", fracs).alias("_cuts")
    )
    val = F.col("_val")
    b = (
        melted.join(F.broadcast(cuts), "_dim")
        .withColumn("_bkt", F.size(F.filter("_cuts", lambda c: c < val)))
        .drop("_cuts")
    )
    loc = b.withColumn(
        "_rn",
        F.row_number().over(
            W.partitionBy("_dim", "_bkt").orderBy("_val", key)
        ),
    )
    offs = (
        loc.groupBy("_dim", "_bkt")
        # count(*), NOT max(_rn): see _ranked — pruning collapses this
        # branch to a map-side partial count (tiny shuffle); keeping
        # the Window would re-shuffle the melted data hoping for an
        # exchange reuse that never fires over an RDD-scan input
        .agg(F.count("*").cast("bigint").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    W.partitionBy("_dim")
                    .orderBy("_bkt")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_cnt").over(W.partitionBy("_dim")))
    )
    r = F.col("_rn") + F.col("_off")
    k = F.lit(n_tiles).cast("bigint")
    q = F.floor(F.col("_n") / k)
    m = F.col("_n") % k
    big = m * (q + 1)
    tile = F.when(r <= big, F.ceil(r / (q + 1))).otherwise(
        m + F.ceil((r - big) / F.greatest(q, F.lit(1)))
    )
    tiled = loc.join(
        F.broadcast(offs.select("_dim", "_bkt", "_off", "_n")),
        ["_dim", "_bkt"],
    ).withColumn("_tile", tile.cast("int"))
    return tiled.groupBy(key).agg(
        # payload is null on every non-dim-0 row, so a bare max
        # recovers the single carried value
        *[F.max(F.col(p)).alias(p) for p in payload],
        *[
            F.max(F.when(F.col("_dim") == i, F.col("_tile"))).alias(name)
            for i, name in enumerate(names)
        ],
    )
