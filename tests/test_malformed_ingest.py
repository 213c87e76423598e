"""Malformed-record handling on file ingestion.

The reference treats undecodable telemetry frames as first-class
outcomes (bad records -> error column + drop counters,
telemetry.hpp type dispatch); the file-ingestion twin is Spark's
PERMISSIVE/_corrupt_record/FAILFAST contract. At 100 TB you always
ingest PERMISSIVE with a corrupt-record audit — one bad line must
never kill a 10-hour job, and silently dropping it is worse.
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

CSV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt_record", StringType()),
    ]
)

JSON_SCHEMA = CSV_SCHEMA


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("1,100\n2,not_a_number\n3,300\n")
    return str(p)


@pytest.fixture()
def bad_json(tmp_path):
    p = tmp_path / "docs.json"
    p.write_text(
        '{"doc_id": 1, "n_chars": 100}\n'
        "{this is not json}\n"
        '{"doc_id": 3, "n_chars": 300}\n'
    )
    return str(p)


def test_csv_permissive_audits_corrupt_records(spark, bad_csv):
    df = spark.read.schema(CSV_SCHEMA).option("mode", "PERMISSIVE").csv(bad_csv)
    rows = df.cache().collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in good} == {1, 3}
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
    # the audit aggregate a production ingest alerts on
    n_bad = df.where(F.col("_corrupt_record").isNotNull()).count()
    assert n_bad == 1
    df.unpersist()


def test_csv_failfast_raises(spark, bad_csv):
    strict = StructType(CSV_SCHEMA.fields[:2])
    with pytest.raises(Exception):
        spark.read.schema(strict).option("mode", "FAILFAST").csv(
            bad_csv
        ).collect()


def test_json_permissive_audits_corrupt_records(spark, bad_json):
    df = (
        spark.read.schema(JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(bad_json)
    )
    rows = df.cache().collect()
    assert {r.doc_id for r in rows if r._corrupt_record is None} == {1, 3}
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
    df.unpersist()


def test_csv_dropmalformed_keeps_only_good_rows(spark, bad_csv):
    strict = StructType(CSV_SCHEMA.fields[:2])
    df = (
        spark.read.schema(strict)
        .option("mode", "DROPMALFORMED")
        .csv(bad_csv)
    )
    assert sorted(r.doc_id for r in df.collect()) == [1, 3]
