"""As-of join: for each left row, the latest right row at or before it.

Spark has no native as-of join. The naive form (range theta-join +
rank) explodes to O(|L|x|R|) per key before pruning — unusable at
100 TB. This implementation uses the union+last_value merge:

1. project both sides onto (key, ts, side, payload) and UNION them;
2. one hash shuffle on the key, sort within partition by
   (ts, side, tie_break);
3. `last(payload, ignorenulls=True)` over the running window fills each
   left row with the most recent right payload;
4. keep left rows.

Cost: a single shuffle of |L|+|R| rows and a per-key sort — the same
asymptotics as a sort-merge join, independent of match multiplicity.
Ties on the right timestamp resolve to the greatest `tie_break` value,
making results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward as-of join; unmatched left rows keep null payload."""
    if direction != "backward":
        raise NotImplementedError("only direction='backward' is implemented")

    lcols = list(left.columns)
    pay_type = T.StructType([right.schema[c] for c in right_payload])
    tb_type = right.schema[tie_break].dataType if tie_break else T.IntegerType()
    tb_col = F.col(tie_break) if tie_break else F.lit(0)

    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb_col.cast(tb_type).alias("__tb"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *lcols,
    )

    # At equal ts: right rows (side=0) sort before left rows, so "at or
    # before" is inclusive; among tied right rows the max tie_break is
    # the last one seen and wins.
    w = (
        W.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__side"), F.asc_nulls_last("__tb"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = r.unionByName(l).withColumn(
        "__filled", F.last("__pay", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__filled.{c}").alias(c) for c in right_payload]
    )
