"""Write-path data layout: range clustering for min/max data skipping.

The reference has no storage layer at all (SURVEY.md §1.3); at 100 TB
the dominant read cost is scan pruning, which parquet gives for free
IF values are clustered: each file/row-group then covers a narrow
min/max range and a predicate skips everything else. This module is
the write-side half of the partition-pruning guardrail in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimize_layout(
    df: DataFrame,
    *,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    target_partitions: int | None = None,
) -> DataFrame:
    """Range-repartition on `range_cols`, then sort within partitions.

    Output files get disjoint (up to sampled range-boundary ties)
    min/max ranges on the leading column, so a point/range predicate
    prunes to O(1) files instead of scanning all of them. One range
    exchange (sampled boundaries, skew-resistant) + a local sort —
    never a global sort. `sort_cols` defaults to `range_cols`; append
    secondary columns for row-group-level clustering within files.
    """
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *range_cols)
    return out.sortWithinPartitions(*(sort_cols or range_cols))


def morton_z(bucket_cols: list, bits: int):
    """Morton (Z-curve) interleave of non-negative integer bucket ids.

    Output bit ``i*d + j`` = bit ``i`` of dimension ``j`` — the bit
    layout every Z-order consumer here shares (`zorder_layout` for the
    physical write path, the `zorder_zvalue_audit` catalog entry for
    the cross-engine check), so the interleave can never drift between
    the layout writer and its auditor. Pure column arithmetic
    (shift/or terms), whole-stage-codegen'd, no UDF.
    """
    d = len(bucket_cols)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    target_partitions: int | None = None,
) -> DataFrame:
    """Z-order (Morton-curve) clustering over SEVERAL columns at once.

    `optimize_layout` skips well on its leading column only; a filter on
    the second column still reads every file. Z-ordering interleaves the
    bits of rank-quantized column values so EVERY listed column gets
    narrow per-file min/max ranges — the Delta/Iceberg `OPTIMIZE ZORDER
    BY` technique, built from public Spark primitives:

    1. per column: 2^bits - 1 cutpoints via approxQuantile — a
       driver-side list whose size depends on `bits`, never on rows
       (rank quantization, so skewed distributions still fill all
       buckets);
    2. bucket id = count of cutpoints <= value (one vectorized
       higher-order filter over the literal cutpoint array — no UDF,
       no per-cut column);
    3. z-value = bitwise interleave of the bucket ids (bits*len(cols)
       shift-or terms, whole-stage-codegen'd);
    4. range-repartition + local sort on the z-value — same
       skew-resistant single exchange as `optimize_layout`.

    The z column is dropped before return; callers write the result
    as-is. Files then cover little hypercubes of the value space
    instead of slabs along one axis.

    NULL handling: a NULL value maps to bucket 0 (the higher-order
    filter's ``cut <= NULL`` predicate is null, so no cutpoint counts),
    co-clustering nulls with each column's minimum values; and
    approxQuantile ignores nulls, so cutpoints describe the non-null
    distribution only. For null-heavy columns this concentrates nulls
    in the low-z files — their min/max stats then span the full range
    on the OTHER dimensions. If null isolation matters, pre-split
    ``df.filter(col.isNull())`` and lay the two halves out separately.
    """
    if not cols or bits * len(cols) > 63:
        raise ValueError(
            f"zorder needs 1+ cols and bits*len(cols) <= 63, got "
            f"{bits} bits x {len(cols)} cols"
        )
    reserved = {"__z", *(f"__b_{c}" for c in cols)}
    clash = reserved & set(df.columns)
    if clash:
        # never silently overwrite-and-drop a user column that happens
        # to share a working-column name
        raise ValueError(f"input columns collide with zorder temps: {sorted(clash)}")
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    # one approxQuantile pass computes every column's cutpoints
    all_cuts = df.stat.approxQuantile(list(cols), probs, 1e-3)
    bucket_cols = []
    for c, cuts in zip(cols, all_cuts):
        arr = F.array(*[F.lit(float(x)) for x in sorted(set(cuts))])
        bucket_cols.append(
            F.size(
                F.filter(arr, lambda cut: cut <= F.col(c).cast("double"))
            ).alias(f"__b_{c}")
        )
    with_b = df.select("*", *bucket_cols)
    z = morton_z([F.col(f"__b_{c}") for c in cols], bits)
    with_z = with_b.withColumn("__z", z).drop(*[f"__b_{c}" for c in cols])
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        with_z.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
