"""The correctness driver runs queries on ITS OWN bare SparkSession —
no UTC timezone, no tuned confs. `spark.newSession()` drops our
session-level SQLConf the same way, so these tests catch any query
that silently depends on get_session defaults (the round-1 events
failure mode)."""

from __future__ import annotations

import pytest

from dsp_spark import catalog
from tests._compare import assert_results_equal

# representative slice: every table family + the session-sensitive shapes
# (timestamps, UDFs, md5 bucketing, window funcs, pandas-UDF aggregation)
REPRESENTATIVE = [
    "q1_pricing_summary",
    "events_hourly_rollup",
    "events_sessionize",
    "asof_join_event_order",
    "dataset_split_assign",
    "text_token_stats",
    "multimodal_resize_audit",
    "source_median_chars_udaf",
]


@pytest.fixture(scope="module")
def bare(spark):
    # fresh SQLConf: get_session's tuned confs (UTC zone, Arrow, AQE
    # floors, broadcast threshold) are all back at Spark defaults here
    return spark.newSession()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_on_bare_session(name, bare, duck, sf_dir):
    e = catalog.entries()[name]
    got = e.fn(bare, sf_dir).toPandas()
    want = duck.execute(e.oracle).fetchdf()
    assert_results_equal(got, want, f"bare:{name}")
