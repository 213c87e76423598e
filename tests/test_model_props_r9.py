"""Randomized model tests for the round-9 feature entries whose edge
semantics are easy to get wrong: skyline dominance under price/size
ties, and Kaplan-Meier risk sets under same-day repeat orders and
single-order customers. The Spark expression trees live in
tests/_fold_entries.py and are pinned to the catalog entries below so
test-side logic cannot drift from what ships."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import tests._fold_entries as fe

# heavy tie probability: prices from a 4-value set, sizes from 3
PART = st.tuples(
    st.sampled_from(["A", "B"]),        # brand
    st.sampled_from([100, 200, 200, 300]),  # price_cents (ties likely)
    st.sampled_from([1, 2, 3]),         # size
)


def _parts_df(spark, rows):
    data = [(i, b, p, s) for i, (b, p, s) in enumerate(rows)]
    return spark.createDataFrame(
        data, "p_partkey long, p_brand string, price_cents long, p_size int"
    )


def _skyline_model(rows):
    items = [(i, b, p, s) for i, (b, p, s) in enumerate(rows)]
    out = set()
    for k, b, p, s in items:
        dominated = any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for _, b2, p2, s2 in items
        )
        if not dominated:
            out.add((k, b, p, s))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(PART, min_size=1, max_size=25))
def test_skyline_matches_bruteforce_under_ties(spark, rows):
    got = {
        (r.p_partkey, r.p_brand, r.price_cents, r.p_size)
        for r in fe.skyline(_parts_df(spark, rows)).collect()
    }
    assert got == _skyline_model(rows)


# customers with 1..4 orders; days from a tiny set so same-day repeat
# orders (gap 0) and duplicate gaps across customers are common
ORDER_DAYS = st.lists(
    st.integers(0, 6), min_size=1, max_size=4
)


def _orders_df(spark, custs):
    base = dt.datetime(2024, 1, 1)
    data = []
    okey = 0
    for cid, days in enumerate(custs):
        for d in days:
            data.append((okey, cid, base + dt.timedelta(days=d)))
            okey += 1
    return spark.createDataFrame(
        data, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )


def _km_model(custs):
    gaps = []
    for days in custs:
        ds = sorted(days)
        gaps.extend(b - a for a, b in zip(ds, ds[1:]))
    if not gaps:
        return []
    ctr = Counter(gaps)
    total = len(gaps)
    seen = 0
    pico = 0
    rows = []
    for day in sorted(ctr):
        d = ctr[day]
        n_risk = total - seen
        if d < n_risk:
            pico += math.floor(
                math.log(1.0 - float(d) / n_risk) * 1e12 + 0.5
            )
            surv = math.floor(math.exp(pico / 1e12) * 1e9 + 0.5) / 1e9
        else:
            surv = 0.0
        rows.append((day, d, n_risk, surv))
        seen += d
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(ORDER_DAYS, min_size=1, max_size=8))
def test_km_matches_model_under_ties_and_singletons(spark, custs):
    got = sorted(
        (r.gap_days, r.d, r.n_risk, r.survival)
        for r in fe.km_survival(_orders_df(spark, custs)).collect()
    )
    assert got == _km_model(custs)


def test_r9_fold_helpers_pin_to_catalog_entries(spark, sf_dir):
    """fe.skyline / fe.km_survival re-express the catalog logic; this
    pin guarantees the pair cannot drift."""
    from pyspark.sql import functions as F

    from dsp_spark import catalog
    from dsp_spark.session import read_table

    ent = catalog.entries()

    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    a = {
        (r.p_partkey, r.p_brand, r.price_cents, r.p_size)
        for r in fe.skyline(part).collect()
    }
    b = {
        (r.p_partkey, r.p_brand, r.price_cents, r.p_size)
        for r in ent["parts_skyline_per_brand"].fn(spark, sf_dir).collect()
    }
    assert a == b and a

    orders = read_table(spark, sf_dir, "orders")
    c = sorted(
        (r.gap_days, r.d, r.n_risk, r.survival)
        for r in fe.km_survival(orders).collect()
    )
    d = sorted(
        (r.gap_days, r.d, r.n_risk, r.survival)
        for r in ent["orders_interpurchase_km"].fn(spark, sf_dir).collect()
    )
    assert c == d and c
