"""Every catalog entry must expose the SAME schema at every scale
factor — a data-dependent schema (unpinned pivot values, inferred
types) would make the 100 TB run's contract differ from the test run's.
Schema derivation only analyzes the plan (no execution), so this
sweeps all entries cheaply.
"""

from __future__ import annotations

import pytest

from dsp_spark import catalog

ENTRIES = catalog.entries()


@pytest.mark.parametrize("name", sorted(ENTRIES))
def test_schema_is_scale_invariant(name, spark):
    e = ENTRIES[name]
    small = e.fn(spark, "/root/testdata/sf0.001").schema
    big = e.fn(spark, "/root/testdata/sf0.01").schema
    assert small == big, (
        f"{name}: schema differs between sf0.001 and sf0.01\n"
        f"  sf0.001: {small.simpleString()}\n"
        f"  sf0.01:  {big.simpleString()}"
    )
