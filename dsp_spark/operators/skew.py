"""Skew-handling join strategies: salting and bucketing.

AQE's skew-join splitting (on by default in the session factory)
handles most runtime skew; these operators are for the cases you plan
for up front:

* ``salted_join`` — when one join key is pathologically hot (a null-ish
  default id, a celebrity user), salt the fact side into `n_salts`
  sub-keys and explode the dimension side to match: the hot key's rows
  spread over `n_salts` tasks instead of one straggler. Deterministic
  (hash-based) salting keeps retries stable.
* ``write_bucketed`` / co-located joins — pre-shuffle both tables into
  the same bucket layout once at write time; every subsequent join on
  the bucket key runs with ZERO exchange (asserted in tests). At 100 TB
  this converts a per-query shuffle of the big table into a one-time
  layout cost — the standard warehouse trick for fact-to-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side salted across `n_salts` sub-keys.

    fact rows get salt = hash(all columns) % n_salts (deterministic, no
    rand() — safe under task retry); dim rows are replicated once per
    salt via explode. Result equals ``fact.join(dim, on, how)`` exactly;
    only the physical key distribution changes.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) table.

    Joins/aggregations on `bucket_col` between tables written with the
    same layout need no exchange — Spark trusts the bucket spec the way
    it would a shuffle's hash partitioning.

    Idempotent even after an interrupted prior run: `overwrite` alone
    fails with LOCATION_ALREADY_EXISTS when the warehouse directory has
    residue but the table never made it into the catalog. The write is
    attempted FIRST; only when Spark itself refuses on a blocked
    location is the stale directory reclaimed and the write retried —
    so a healthy external directory is never deleted preemptively.
    Handles db-qualified names (``db.tbl`` → ``<warehouse>/db.db/tbl``).
    """
    spark = df.sparkSession

    def write() -> None:
        w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
        if sort_col:
            w = w.sortBy(sort_col)
        w.saveAsTable(table)

    try:
        write()
        return
    except Exception as e:  # reclaim only what Spark refused to reuse
        if "LOCATION_ALREADY_EXISTS" not in str(e):
            raise
        blocked = e  # keep for the 3-part-name path below, where the
        # bare `raise` would have no active exception to re-raise
    parts = table.split(".")
    if len(parts) > 2:
        # catalog-qualified (catalog.db.tbl): the default-location
        # guess below would be wrong and could delete an unrelated
        # directory — surface the original error instead
        raise blocked
    quoted = ".".join(f"`{p}`" for p in parts)
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse:
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(warehouse)
        if loc.scheme in ("", "file"):
            db = (
                parts[0] if len(parts) == 2 else spark.catalog.currentDatabase()
            ).lower()
            tbl = parts[-1].lower()
            # managed-table default layout: default db tables sit at
            # the warehouse root, others under <db>.db/
            rel = tbl if db == "default" else f"{db}.db/{tbl}"
            shutil.rmtree(f"{loc.path}/{rel}", ignore_errors=True)
    write()
