"""Every catalog query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from dsp_spark import catalog
from tests._compare import assert_results_equal

ENTRIES = catalog.entries()
WITH_ORACLE = [name for name, e in ENTRIES.items() if e.oracle is not None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    entry = ENTRIES[name]
    spark_pdf = entry.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(entry.oracle).fetchdf()
    assert_results_equal(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_fn():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert qs
