"""Bucketed interval self-join: the scalable plan for time-range joins.

A plain equi-join on the entity key with a time-band post-filter
generates |events-per-key|^2 candidates per key — quadratic in key
hotness, and one hot key lands on one task. Bucketing time into
window-sized cells and joining on (key, cell) bounds candidates to
adjacent cells AND spreads a hot key over many shuffle partitions:
the standard interval-join blocking that engines with native range
joins implement internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_pairs(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    id_col: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (key, id_a, id_b, gap_s) with 0 < ts_b - ts_a <= window.

    The left side explodes each row into its own time cell and the
    next one; the right side sits in its cell. A qualifying pair's
    cells differ by at most 1, so every pair is found exactly once —
    no post-dedup. Shuffle key is (key, cell): hot keys shard across
    cells instead of serializing on one task.
    """
    cell = (F.unix_timestamp(F.col(ts)) / window_seconds).cast("long")
    left = df.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("__ts_a"),
        F.explode(F.array(cell, cell + 1)).alias("__cell"),
    )
    right = df.select(
        F.col(key).alias("__key_b"),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("__ts_b"),
        cell.alias("__cell"),
    )
    return (
        left.join(
            right,
            (F.col(key) == F.col("__key_b"))
            & (left["__cell"] == right["__cell"]),
        )
        .filter(
            (F.col("__ts_b") > F.col("__ts_a"))
            & (
                F.col("__ts_b")
                <= F.col("__ts_a")
                + F.expr(f"INTERVAL {window_seconds} SECONDS")
            )
            & (F.col("id_a") != F.col("id_b"))
        )
        .select(
            key,
            "id_a",
            "id_b",
            (
                F.unix_timestamp("__ts_b") - F.unix_timestamp("__ts_a")
            ).alias("gap_s"),
        )
    )
