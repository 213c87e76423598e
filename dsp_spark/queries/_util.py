"""Shared helpers for catalog queries.

Determinism contract with the DuckDB oracle: every floating-point
output is produced by (a) exact decimal arithmetic followed by a cast
to double, or (b) the identical sequence of double ops on both engines.
Sums of raw doubles are order-dependent across engines — never emit
them directly.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from dsp_spark.session import read_table

# All money/qty values in the testdata are 2-decimal doubles < 1e6, so
# DECIMAL(12,2) recovers them exactly; discounts/taxes fit DECIMAL(4,2).
MONEY = "decimal(12,2)"
PCT = "decimal(4,2)"


def dec(c: str | Column, typ: str = MONEY) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def dsum(c: Column) -> Column:
    """Exact decimal sum surfaced as double (bit-identical to DuckDB)."""
    return F.sum(c).cast("double")


# --- exact int64 cent-grain accumulation -----------------------------------
# The 2-decimal non-negative data contract above means (x*100 + 0.5)
# truncated to long is the exact cent count the DECIMAL(12,2)/(4,2)
# casts recover (floor(y+0.5) == HALF_UP for y >= 0) — one codegen
# multiply+add+cast per row instead of a per-row BigDecimal. Products
# of cent counts are exact int64s; sums of large products split at
# 2^23 into hi/lo partial sums (the r13 elasticity pattern,
# features.py) so both partials stay in int64 far past the 100 TB
# per-group row share (lo < 2^23 -> lo-sum overflows only past ~1.1e12
# rows per group; hi-sums far later). The exact total reassembles in
# DECIMAL(38,0) at OUTPUT grain and `unscale` divides by the power of
# ten exactly (Spark's decimal division result scale >= the value's
# true scale, so HALF_UP never fires), making the emitted double
# bit-identical to the oracle's CAST(SUM(DECIMAL ...) AS DOUBLE).

HILO_SHIFT = 23


def cents(c: str | Column, scale: int = 2) -> Column:
    """Exact integer 10^-scale units of a non-negative <=scale-decimal
    double column (the dec() cast, 100x cheaper per row)."""
    col = F.col(c) if isinstance(c, str) else c
    return (col * (10**scale) + F.lit(0.5)).cast("bigint")


def hilo(term: Column) -> tuple[Column, Column]:
    """Split an int64 term at 2^23 for overflow-safe partial sums."""
    hi = F.shiftright(term, HILO_SHIFT)
    return hi, term - F.shiftleft(hi, HILO_SHIFT)


def hilo_total(hi_sum: Column, lo_sum: Column) -> Column:
    """Exact DECIMAL(38,0) total from hi/lo partial sums."""
    two = F.lit(1 << HILO_SHIFT).cast("decimal(38,0)")
    return hi_sum.cast("decimal(38,0)") * two + lo_sum.cast("decimal(38,0)")


def hilo_sum(term: Column, name: str) -> list[Column]:
    """The two agg columns of an overflow-safe int64 term sum."""
    h, l = hilo(term)
    return [F.sum(h).alias(f"_{name}_h"), F.sum(l).alias(f"_{name}_l")]


def hilo_out(name: str, scale: int) -> Column:
    """Exact double of a hilo_sum total at 10^-scale units."""
    return unscale(
        hilo_total(F.col(f"_{name}_h"), F.col(f"_{name}_l")), scale
    )


def unscale(total: Column, scale: int) -> Column:
    """Exact double of (decimal total) / 10^scale.

    The division's result scale is >= 6 > the value's true scale, so
    the quotient is exact and the final decimal->double cast is the
    single correct rounding — identical to casting the oracle's exact
    decimal sum."""
    div = F.lit(10**scale).cast(f"decimal({scale + 1},0)")
    return (total.cast("decimal(38,0)") / div).cast("double")


def t(spark: SparkSession, sf_dir: str, name: str):
    return read_table(spark, sf_dir, name)
