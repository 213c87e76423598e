"""Deterministic-sampling invariants: nesting, stability, stratum rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.operators import sampling as smp
from dsp_spark.session import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_sample_is_nested_and_stable(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s5 = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.05).collect()}
    s10 = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.10).collect()}
    assert s5 <= s10  # smaller rate is a subset of larger (same hash)
    # stable under repartition: membership depends only on the id
    s10b = {
        r.doc_id
        for r in smp.deterministic_sample(d.repartition(7), "doc_id", 0.10).collect()
    }
    assert s10 == s10b
    n = d.count()
    assert 0.05 * n * 0.5 <= len(s10) <= 0.15 * n  # coarse rate check


def test_salt_changes_membership(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in smp.deterministic_sample(d, "doc_id", 0.2, salt="v2").collect()
    }
    assert a != b  # different salt -> independent sample


def test_stratified_rates(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = {"en": 0.2, "zh": 1.0}
    s = smp.stratified_sample(d, "doc_id", "lang", rates)
    got = {r.lang: r.n for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {
        r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got.get("zh", 0) == totals["zh"]  # rate 1.0 keeps everything
    assert got.get("de", 0) == 0  # default rate 0 drops unlisted strata
    assert 0 < got["en"] < totals["en"]
