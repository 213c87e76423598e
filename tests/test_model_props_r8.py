"""Randomized model tests for the round-8 fold operators: the Spark
entries must agree with a trivially-correct pure-python fold on
arbitrary generated inputs (not just the fixed testdata)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _events_df(spark, rows):
    """rows: list[(user, minute, type, cents)] -> events-shaped df."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (
            i,
            base + dt.timedelta(minutes=m),
            u,
            ty,
            c / 100.0,
        )
        for i, (u, m, ty, c) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


EVENT = st.tuples(
    st.integers(0, 3),                      # user
    st.integers(0, 50),                     # minute
    st.sampled_from(["signup", "error", "click", "purchase", "view"]),
    st.integers(0, 30000),                  # cents
)


def _net_model(rows):
    """Pure-python changelog fold, ordered by (ts_minute, event_id)."""
    per = {}
    for eid, (u, m, ty, c) in enumerate(rows):
        op = {"signup": "I", "error": "D"}.get(ty, "U")
        per.setdefault(u, []).append((m, eid, op, c))
    out = {}
    for u, evs in per.items():
        evs.sort()
        first = evs[0][2]
        last = evs[-1][2]
        last_c = evs[-1][3]
        if first == "I" and last == "D":
            net = "NONE"
        elif first == "I":
            net = "I"
        elif last == "D":
            net = "D"
        else:
            net = "U"
        out[u] = (first, last, net,
                  None if last == "D" else last_c, len(evs))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(EVENT, min_size=1, max_size=40))
def test_cdc_net_effect_matches_model(spark, rows):
    import tests._fold_entries as fe

    df = _events_df(spark, rows)
    got = {
        r.user_id: (r.first_op, r.last_op, r.net_op,
                    r.net_value_cents, r.n_changes)
        for r in fe.cdc_net_effect(df).collect()
    }
    assert got == _net_model(rows)


def _attr_model(rows):
    """Pure-python linear milli-credit attribution."""
    per = {}
    for eid, (u, m, ty, c) in enumerate(rows):
        per.setdefault(u, []).append((m, eid, ty))
    credits = {}
    for u, evs in per.items():
        evs.sort()
        path = []
        for m, eid, ty in evs:
            if ty == "purchase":
                if not path:
                    credits["none"] = credits.get("none", 0) + 1000
                else:
                    k = len(path)
                    share = 1000 // k
                    for i, pty in enumerate(path):
                        credits[pty] = credits.get(pty, 0) + share
                    # remainder to the most recent touch
                    credits[path[-1]] += 1000 % k
                path = []
            else:
                path.append(ty)
    return credits


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(EVENT, min_size=1, max_size=40))
def test_attribution_matches_model(spark, rows):
    import tests._fold_entries as fe

    df = _events_df(spark, rows)
    got = {
        r.attributed_type: r.milli_credits
        for r in fe.attribution_linear(df).collect()
    }
    assert got == _attr_model(rows)


def test_fold_helpers_pin_to_catalog_entries(spark, sf_dir):
    """tests/_fold_entries re-expresses the catalog logic over arbitrary
    frames; this pin guarantees the two cannot drift."""
    import tests._fold_entries as fe
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    ent = catalog.entries()

    a = {
        r.user_id: (r.first_op, r.last_op, r.net_op,
                    r.net_value_cents, r.n_changes)
        for r in fe.cdc_net_effect(ev).collect()
    }
    b = {
        r.user_id: (r.first_op, r.last_op, r.net_op,
                    r.net_value_cents, r.n_changes)
        for r in ent["cdc_changelog_net_effect"].fn(spark, sf_dir).collect()
    }
    assert a == b and a

    c = {
        r.attributed_type: r.milli_credits
        for r in fe.attribution_linear(ev).collect()
    }
    d = {
        r.attributed_type: r.milli_credits
        for r in ent["events_attribution_linear_milli"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert c == d and c


WEEKSET = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 6)),  # (user, week index)
    min_size=1,
    max_size=25,
    unique=True,
)


def _lifecycle_model(pairs):
    """Growth-accounting ledger over distinct (user, week) actives."""
    per = {}
    for u, w in pairs:
        per.setdefault(u, set()).add(w)
    max_w = max(w for _, w in pairs)
    ledger = {}

    def add(w, state):
        ledger[(w, state)] = ledger.get((w, state), 0) + 1

    for u, weeks in per.items():
        ws = sorted(weeks)
        for i, w in enumerate(ws):
            if i == 0:
                add(w, "new")
            elif ws[i - 1] == w - 1:
                add(w, "retained")
            else:
                add(w, "resurrected")
            nxt = ws[i + 1] if i + 1 < len(ws) else None
            if (nxt is None or nxt > w + 1) and w + 1 <= max_w:
                add(w + 1, "churned")
    return ledger


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(WEEKSET)
def test_lifecycle_states_match_model(spark, pairs):
    import tests._fold_entries as fe

    # one event per active (user, week): Monday noon of week w
    base = dt.datetime(2024, 1, 1, 12, 0)  # a Monday
    rows = [
        (i, base + dt.timedelta(weeks=w), u, "click", 1.0)
        for i, (u, w) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {}
    week0 = dt.date(2024, 1, 1)
    for r in fe.lifecycle_states(df).collect():
        wk_idx = (r.wk - week0).days // 7
        got[(wk_idx, r.state)] = r.n_users
    assert got == _lifecycle_model(pairs)


def test_lifecycle_fold_pins_to_catalog_entry(spark, sf_dir):
    import tests._fold_entries as fe
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    a = {
        (r.wk, r.state): r.n_users
        for r in fe.lifecycle_states(ev).collect()
    }
    b = {
        (r.wk, r.state): r.n_users
        for r in catalog.entries()["events_user_lifecycle_states"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert a == b and a
