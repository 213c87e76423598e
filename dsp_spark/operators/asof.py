"""As-of join: match each left row to the right row nearest in time.

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

Directions (the kdb/pandas.merge_asof trio):

* ``backward`` — latest right row at or before the left ts;
* ``forward``  — earliest right row at or after the left ts (the same
  running fill over the reversed sort; still one shuffle);
* ``nearest``  — closer of the two, ties resolve backward. Both fills
  run over ONE union with two window orderings: Spark shuffles once
  and sorts the partition twice — no second exchange (asserted in
  tests/test_asof_directions.py).

Ties on the right timestamp resolve to the greatest `tie_break` value
in every direction, making results deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIRECTIONS = ("backward", "forward", "nearest")


def _epoch(col: Column, dtype: T.DataType) -> Column:
    """Exact integer time position for distance comparison (nearest)."""
    if isinstance(dtype, T.DateType):
        return F.unix_date(col).cast("long")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    if isinstance(dtype, T.NumericType):
        return col.cast("long")
    raise TypeError(f"as-of nearest needs a date/timestamp/numeric ts, got {dtype}")


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
    """As-of join; unmatched left rows keep null payload."""
    if direction not in DIRECTIONS:
        raise ValueError(f"direction must be one of {DIRECTIONS}, got {direction!r}")

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
    both = r.unionByName(l)

    # At equal ts: right rows (side=0) sort before left rows in EITHER
    # time direction, so the match is inclusive; among tied right rows
    # the max tie_break is the last one seen and wins.
    def running(ts_order: Column) -> W:
        return (
            W.partitionBy("__k")
            .orderBy(ts_order, F.asc("__side"), F.asc_nulls_last("__tb"))
            .rowsBetween(W.unboundedPreceding, 0)
        )

    w_back = running(F.asc("__t"))
    w_fwd = running(F.desc("__t"))

    if direction == "backward":
        filled = both.withColumn("__filled", F.last("__pay", ignorenulls=True).over(w_back))
    elif direction == "forward":
        filled = both.withColumn("__filled", F.last("__pay", ignorenulls=True).over(w_fwd))
    else:  # nearest: both fills over one shuffle (two in-partition sorts)
        rt_dtype = right.schema[right_ts].dataType
        rt = F.when(F.col("__side") == 0, _epoch(F.col("__t"), rt_dtype))
        pos = _epoch(F.col("__t"), left.schema[left_ts].dataType)
        filled = (
            both.withColumn("__pb", F.last("__pay", ignorenulls=True).over(w_back))
            .withColumn("__tb_ts", F.last(rt, ignorenulls=True).over(w_back))
            .withColumn("__pf", F.last("__pay", ignorenulls=True).over(w_fwd))
            .withColumn("__tf_ts", F.last(rt, ignorenulls=True).over(w_fwd))
            .withColumn(
                "__filled",
                F.when(F.col("__pf").isNull(), F.col("__pb"))
                .when(F.col("__pb").isNull(), F.col("__pf"))
                .when(
                    (pos - F.col("__tb_ts")) <= (F.col("__tf_ts") - pos),
                    F.col("__pb"),
                )
                .otherwise(F.col("__pf")),
            )
        )

    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__filled.{c}").alias(c) for c in right_payload]
    )
