"""Deterministic sampling operators for training-data curation.

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or re-runs with different splits; curation pipelines
need content-addressed sampling instead: a row is in the sample iff
hash(id) falls under the rate threshold. Properties that matter at
100 TB:

* narrow — no shuffle, no state, runs at scan speed alongside pushed
  filters;
* stable under repartition/backfill — membership depends only on the
  id, so incremental reruns select the same rows;
* composable — a 5% sample is a subset of the 10% sample (threshold
  on the same hash), enabling nested dev/test subsets.

The md5-based bucket is mirrored exactly in DuckDB (oracle-checkable).
The reference has no sampling at all; its load-shedding drop
(kafka.hpp:684-696) is the closest concept — non-deterministic
at-most-once delivery, whereas these are exact set selections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution: 0.01%


def hash_bucket(id_col: str, *, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5 of the id."""
    return F.expr(hash_bucket_sql(id_col, salt=salt, dialect="spark"))


def salted_md5_sql(id_col: str, *, salt: str = "", dialect: str = "duck") -> str:
    """md5(salt || id) as a hex-string expression — the ONE home of the
    cross-engine salted-hash idiom (both dialects), which every
    deterministic sampling/sharding/ordering key builds on."""
    s = f"'{salt}' || " if salt else ""
    if dialect == "spark":
        return f"md5({s}CAST({id_col} AS STRING))"
    return f"md5({s}{id_col}::VARCHAR)"


def hash_int_sql(id_col: str, *, salt: str = "", dialect: str = "duck") -> str:
    """First 32 bits of the salted md5 as a BIGINT (uniform in
    [0, 2^32)) — the numeric form bucket/shard assignments reduce."""
    h = salted_md5_sql(id_col, salt=salt, dialect=dialect)
    if dialect == "spark":
        return f"CAST(conv(substring({h}, 1, 8), 16, 10) AS BIGINT)"
    return f"('0x' || substr({h}, 1, 8))::BIGINT"


def hash_bucket_sql(id_col: str, *, salt: str = "", dialect: str = "duck") -> str:
    return f"{hash_int_sql(id_col, salt=salt, dialect=dialect)} % {BUCKETS}"


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Content-addressed `fraction` sample: hash(id) < fraction * BUCKETS."""
    return df.filter(hash_bucket(id_col, salt=salt) < int(fraction * BUCKETS))


def stratified_threshold(
    strata_col: str, rates: dict[str, float], default_rate: float = 0.0
) -> Column:
    """Per-stratum bucket threshold as a CASE on the stratum column."""
    thresh = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(thresh)
    return thresh


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample common languages, keep rare
    ones) — the dataset-mixture primitive. One narrow filter; the
    per-stratum threshold is a CASE on the stratum column."""
    thresh = stratified_threshold(strata_col, rates, default_rate)
    return df.filter(hash_bucket(id_col, salt=salt) < thresh)


def stratified_threshold_sql(
    strata_col: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """DuckDB mirror of the per-stratum threshold CASE (same fold order)."""
    expr = str(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        expr = (
            f"CASE WHEN {strata_col} = '{value}' "
            f"THEN {int(rate * BUCKETS)} ELSE {expr} END"
        )
    return expr
