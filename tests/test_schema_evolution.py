"""Schema evolution on file datasets.

A 100 TB corpus is written over months by evolving jobs: late shards
gain columns, early shards lack them. The engine's contract is the
standard parquet one — `mergeSchema` unions schemas across shards and
backfills missing columns with NULL, while genuine type conflicts fail
loudly instead of silently coercing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def test_merge_schema_unions_columns_and_backfills_null(spark, tmp_path):
    base = str(tmp_path / "docs")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    v2 = spark.createDataFrame(
        [(3, "gamma", "en"), (4, "delta", "de")], ["doc_id", "text", "lang"]
    )
    _write(v1, base + "/shard=0")
    _write(v2, base + "/shard=1")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"doc_id", "text", "lang", "shard"}
    rows = {r.doc_id: r for r in merged.collect()}
    assert rows[1].lang is None and rows[3].lang == "en"
    # per-shard provenance comes along as a partition column
    assert rows[1].shard == 0 and rows[4].shard == 1


def test_merge_schema_column_order_is_stable(spark, tmp_path):
    """Reordered writer columns must not permute reader output: the
    merged schema follows schema-merge order, not file order."""
    base = str(tmp_path / "docs2")
    _write(
        spark.createDataFrame([(1, "a")], ["doc_id", "text"]),
        base + "/shard=0",
    )
    _write(
        spark.createDataFrame([("b", 2)], ["text", "doc_id"]),
        base + "/shard=1",
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    got = {(r.doc_id, r.text) for r in merged.select("doc_id", "text").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_type_conflict_fails_loudly(spark, tmp_path):
    base = str(tmp_path / "docs3")
    _write(spark.createDataFrame([(1, 10)], ["doc_id", "v"]), base + "/shard=0")
    _write(
        spark.createDataFrame([(2, "not a number")], ["doc_id", "v"]),
        base + "/shard=1",
    )
    with pytest.raises(Exception) as ei:
        spark.read.option("mergeSchema", "true").parquet(base).collect()
    msg = str(ei.value).lower()
    assert "merge" in msg or "incompatible" in msg or "failed" in msg


def test_reader_schema_projection_tolerates_missing_columns(spark, tmp_path):
    """Pinning an explicit read schema (the production pattern for a
    stable contract) backfills missing columns without mergeSchema's
    footer-union cost — at 100 TB you pin the schema instead of paying
    a footer read per file."""
    base = str(tmp_path / "docs4")
    _write(spark.createDataFrame([(1, "a")], ["doc_id", "text"]), base + "/shard=0")
    pinned = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    got = spark.read.schema(pinned).parquet(base + "/shard=0")
    assert got.columns == ["doc_id", "text", "lang"]
    row = got.collect()[0]
    assert row.doc_id == 1 and row.lang is None
