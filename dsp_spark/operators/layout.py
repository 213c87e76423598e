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
