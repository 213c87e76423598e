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


def t(spark: SparkSession, sf_dir: str, name: str):
    return read_table(spark, sf_dir, name)
