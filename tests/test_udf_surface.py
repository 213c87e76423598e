"""The UDF extension surface (SURVEY.md §2.5): scalar pandas UDF,
grouped-agg UDAF, Python UDTF (one-in/N-out handler shape), all
Arrow-batched. The production uses live in operators/multimodal.py and
streaming/stateful.py; these tests pin the plugin contracts."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dsp_spark.functions.udx import median_udaf, register_udtfs
from dsp_spark.session import read_table


def test_udaf_matches_builtin_median(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    got = dict(
        d.groupBy("source").agg(median_udaf("n_chars").alias("m")).collect()
    )
    want = dict(
        d.groupBy("source").agg(F.median("n_chars").alias("m")).collect()
    )
    assert got == want and len(got) > 1


def test_udtf_lateral_matches_builtin_gram_count(spark, sf_dir):
    """The UDTF's per-doc row count must equal the HOF pipeline's
    n_2grams — same semantics, different extension mechanism."""
    register_udtfs(spark)
    d = read_table(spark, sf_dir, "documents").limit(50)
    d.createOrReplaceTempView("docs_u")
    got = dict(
        spark.sql(
            "SELECT d.doc_id, COUNT(*) AS n FROM docs_u d, "
            "LATERAL bigrams(d.text) GROUP BY d.doc_id"
        ).collect()
    )
    want = dict(
        d.select(
            "doc_id", (F.size(F.split("text", r"\s+")) - 1).alias("n")
        ).collect()
    )
    assert got == want and len(got) == 50


def test_scalar_pandas_udf_batches(spark, sf_dir):
    """Scalar Arrow-batched UDF: whole pd.Series in, Series out."""

    @F.pandas_udf("int")
    def charlen(s: pd.Series) -> pd.Series:
        return s.str.len().astype("int32")

    d = read_table(spark, sf_dir, "documents").limit(100)
    bad = d.filter(charlen("text") != F.length("text")).count()
    assert bad == 0
