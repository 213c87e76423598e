"""Layout / maintenance catalog entries.

`zorder_layout` (operators/layout.py) is the physical write path —
its file-level effects (narrowed per-file min/max on every listed
column) are footer-verified in tests/test_layout.py, but a physical
write can't be a DuckDB-oracle entry: `repartitionByRange` samples
its boundaries, so file membership is not engine-deterministic.

`zorder_zvalue_audit` makes the LOGIC driver-checkable instead: it
re-expresses the same pipeline with exact, deterministic stages —
rank quantization via two concurrent two-phase exact NTILE pipelines
(no sampling, no approxQuantile merge-order dependence, no
unpartitioned window) and
the SHARED `morton_z` interleave (the audit and the writer call one
function, so those two can't drift from each other; the DuckDB `_z_sql`
mirror is hand-written and pinned to `morton_z` by a direct
literal-evaluation unit test, tests/test_layout.py::test_z_sql_matches_morton_z,
on top of the driver's hash check) — then groups rows
into 16 z-range "files" and reports each file's min/max on BOTH
dimensions plus its z range. A correct Z-order shows every file
covering a narrow hypercube (bounded min/max spans on both columns
at once), which is exactly the property the physical writer exists
to produce and the thing a slab-per-axis sort cannot do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import prefix
from dsp_spark.operators.layout import morton_z
from dsp_spark.queries._util import t

_BITS = 4  # 16 rank-buckets per dimension; z in [0, 255]; 16 files


def _z_sql(b0: str, b1: str) -> str:
    """DuckDB mirror of morton_z([b0, b1], _BITS): bit i of dim j
    lands at output bit i*2 + j."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({b0} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b1} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_zvalue_audit",
    f"""
    WITH tiles AS (
        SELECT event_id, value, user_id,
               NTILE(16) OVER (ORDER BY value, event_id) - 1 AS b0,
               NTILE(16) OVER (ORDER BY user_id, event_id) - 1 AS b1
        FROM events
    ), zed AS (
        SELECT value, user_id, {_z_sql('b0', 'b1')} AS z FROM tiles
    )
    SELECT CAST(z >> {_BITS} AS INTEGER) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(z) AS BIGINT) AS min_z,
           CAST(MAX(z) AS BIGINT) AS max_z,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           MIN(user_id) AS min_user,
           MAX(user_id) AS max_user
    FROM zed
    GROUP BY 1
    """,
    doc="Z-order audit, cross-engine deterministic: exact NTILE(16) "
    "rank-buckets per dimension (two independent two-phase "
    "global_ntile pipelines — bucketed cutpoints + one bucket shuffle "
    "each, scheduled concurrently, NO unpartitioned window, NO "
    "sampled boundaries — reunited on event_id), Morton interleave "
    "via the SAME "
    "morton_z used by the physical zorder_layout writer, rows grouped "
    "into 16 z-range files, per-file min/max on BOTH columns + the z "
    "span. Narrow two-sided ranges per file are the data-skipping "
    "property OPTIMIZE ZORDER exists for; the oracle recomputes the "
    "identical interleave with SQL bit ops, so a drifted bit layout "
    "or tile rule hash-mismatches immediately.",
)
def zorder_zvalue_audit(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("event_id", "value", "user_id")
    # Two INDEPENDENT single-dim exact-NTILE pipelines + an event_id
    # join, NOT the melted global_ntile_multi (r14, measured): the
    # melted form shares stages but serializes both dimensions through
    # ONE pipeline (melt -> one bucket shuffle of 2x rows -> fold-back
    # groupBy), while the per-dim pipelines are independent DAG
    # branches Spark schedules CONCURRENTLY, and the reunite join
    # replaces the fold-back exchange like-for-like. Interleaved A/B
    # at sf0.1 (identical output verified both ways): melted 2.90 s
    # median vs per-dim 2.33 (4 pairs); 3-way rerun on a loaded
    # window ranked the same (melted 4.74 / per-dim 3.83 / per-dim
    # over a checkpointed scan 3.31, 5 reps each). The OPPOSITE holds
    # on the tiny custkey-grain rfm table (melted 1.97 vs per-dim
    # 2.22 — 3 pipelines of barriers beat 10k rows), so
    # customer_rfm_segments deliberately keeps the melted helper; the
    # crossover is data grain, and at 100 TB event grain is the case
    # that matters.
    # The scan is checkpointed ONCE and both pipelines read the
    # materialized RDD: without it each un-reused prefix branch
    # re-plans the parquet scan (16 scans in the captured plan — at
    # 100 TB that is 16 corpus reads) and it also measures slower.
    e = e.localCheckpoint()
    t0 = prefix.global_ntile(
        e,
        [F.col("value"), F.col("event_id")],
        16,
        "b0",
        proxy=F.col("value"),
        checkpoint=False,
    )
    t1 = prefix.global_ntile(
        e.select("event_id", "user_id"),
        [F.col("user_id"), F.col("event_id")],
        16,
        "b1",
        proxy=F.col("user_id").cast("double"),
        checkpoint=False,
    )
    tiles = t0.join(t1.select("event_id", "b1"), "event_id")
    z = morton_z([F.col("b0") - 1, F.col("b1") - 1], _BITS)
    zed = tiles.select("value", "user_id", z.alias("z"))
    return zed.groupBy(
        F.shiftright("z", _BITS).cast("int").alias("file_id")
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("z").cast("bigint").alias("min_z"),
        F.max("z").cast("bigint").alias("max_z"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
