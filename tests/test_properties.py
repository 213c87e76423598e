"""Property-based tests (hypothesis): the router's rule semantics, the
frame reassembler, and the as-of join hold against independent
reference models under randomized inputs — generalizing the
reference's single golden test (router.test.cpp:8-22)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dsp_spark.config import RouterRule
from dsp_spark.operators.router import route
from dsp_spark.operators.telemetry import (
    make_dyn_message,
    make_heartbeat,
    parse_telemetry,
    split_frames,
)

# --- frame reassembly: pure python, cheap to hammer -----------------------

frames_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.integers(0, 2**63 - 1),
            st.integers(0, 2**63 - 1),
            st.integers(0, 2**63 - 1),
        ).map(lambda t: make_heartbeat(*t)),
        st.binary(min_size=0, max_size=300).map(make_dyn_message),
    ),
    min_size=0,
    max_size=20,
)


@given(frames=frames_strategy, data=st.data())
@settings(max_examples=200, deadline=None)
def test_split_frames_under_any_chunking(frames, data):
    """Any chunking of a concatenated frame stream reassembles to
    exactly the original frames (the 'return 0 waits for more data'
    protocol, svc/handler.cpp:99-102 / tcp.cpp:129-139)."""
    stream = b"".join(frames)
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(stream)), max_size=8), label="cuts"
        )
    )
    chunks, prev = [], 0
    for c in cuts + [len(stream)]:
        chunks.append(stream[prev:c])
        prev = c

    buf = b""
    got = []
    for ch in chunks:
        buf += ch
        done, buf, errors = split_frames(buf)
        got.extend(done)
        assert not errors
    assert got == frames
    assert buf == b""


# --- router: spark vs a python model of router.hpp semantics --------------


def _route_model(messages, rules):
    out = []
    for mid, props in messages:
        for r in sorted(rules, key=lambda r: r.priority):
            if r.is_wildcard:
                hit = True
            elif r.action == "include":
                hit = props.get(r.key) == r.value
            else:
                hit = props.get(r.key) != r.value  # missing key matches
            if hit:
                out.append((mid, r.name, r.subject))
    return sorted(out)


keys = st.sampled_from(["a", "b", "c"])
vals = st.sampled_from(["x", "y", "z"])
rule_strategy = st.builds(
    lambda i, k, v, act, wild: RouterRule(
        name=f"r{i}",
        priority=i,
        key="*" if wild else k,
        value="*" if wild else v,
        action=act,
        destination="nb",
        subject=f"s{i}",
    ),
    i=st.integers(0, 9),
    k=keys,
    v=vals,
    act=st.sampled_from(["include", "exclude"]),
    wild=st.booleans(),
)
messages_strategy = st.lists(
    st.dictionaries(keys, vals, max_size=3), min_size=0, max_size=15
).map(lambda dicts: [(i, d) for i, d in enumerate(dicts)])


@pytest.fixture(scope="module")
def spark_mod(spark):
    return spark


@given(
    msgs=messages_strategy,
    rules=st.lists(rule_strategy, min_size=0, max_size=4, unique_by=lambda r: r.priority),
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_router_matches_python_model(spark_mod, msgs, rules):
    spark = spark_mod
    df = spark.createDataFrame(
        [(mid, props, "t", bytearray(b"")) for mid, props in msgs],
        "event_id int, properties map<string,string>, topic string, value binary",
    )
    got = sorted(
        (r["event_id"], r["rule"], r["topic"])
        for r in route(df, rules).select("event_id", "rule", "topic").collect()
    )
    assert got == _route_model(msgs, rules)


# --- telemetry roundtrip ---------------------------------------------------


@given(
    recs=st.lists(
        st.tuples(
            st.integers(0, 2**62),
            st.integers(0, 2**62),
            st.integers(0, 2**62),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_heartbeat_roundtrip_spark(spark_mod, recs):
    spark = spark_mod
    df = spark.createDataFrame(
        [(bytearray(make_heartbeat(*r)),) for r in recs], "value binary"
    )
    parsed = parse_telemetry(df).select("client_id", "sequence", "ts", "error")
    rows = parsed.collect()
    assert all(r["error"] is None for r in rows)
    assert sorted((r["client_id"], r["sequence"], r["ts"]) for r in rows) == sorted(
        recs
    )


# --- as-of join vs pandas.merge_asof ---------------------------------------


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=1,
        max_size=25,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_pandas(spark_mod, left, right):
    from dsp_spark.operators.asof import asof_join

    spark = spark_mod
    # dedupe right on (key, ts): among exact ties merge_asof and the
    # window form both need a deterministic winner — uniqueness removes
    # the ambiguity (production callers pass tie_break)
    right = list({(k, ts): (k, ts, v) for k, ts, v in right}.values())
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "lid int, k int, lts int"
    )
    rdf = spark.createDataFrame(right, "k int, rts int, v int")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            ldf, rdf, left_on="k", right_on="k", left_ts="lts", right_ts="rts",
            right_payload=["v"],
        ).collect()
    }
    lp = pd.DataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], columns=["lid", "k", "ts"]
    ).sort_values(["ts", "lid"], kind="mergesort")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values(
        ["ts"], kind="mergesort"
    )
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expected = {
        int(r.lid): (None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples()
    }
    assert got == expected


# --- connected components vs python union-find ----------------------------


def _cc_model(n_nodes, edge_list):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min id per component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return sorted((x, min(members)) for members in comp.values() for x in members)


@given(data=st.data())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark_mod, data):
    """Distributed contraction CC == sequential union-find on random
    graphs, including path graphs (worst-case diameter), isolated
    nodes, self loops, and duplicate/reversed edges."""
    from dsp_spark.operators.dedup import connected_components

    spark = spark_mod
    n = data.draw(st.integers(1, 60), label="n_nodes")
    edges = data.draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            max_size=120,
        ),
        label="edges",
    )
    if data.draw(st.booleans(), label="add_path"):
        # adversarial long chain across the id space
        edges += [(i, i + 1) for i in range(n - 1)]
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "id_a bigint, id_b bigint"
    )
    got = sorted(
        (r["id"], r["component"])
        for r in connected_components(nodes_df, edges_df, "id").collect()
    )
    assert got == _cc_model(n, edges)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=1,
        max_size=25,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_directions_match_model(spark_mod, direction, left, right):
    """All three directions against a brute-force python model:
    backward = max ts' <= ts, forward = min ts' >= ts, nearest = closer
    of the two with ties resolving backward (right deduped on (k, ts)
    so there is a unique winner without tie_break)."""
    from dsp_spark.operators.asof import asof_join

    spark = spark_mod
    right = list({(k, ts): (k, ts, v) for k, ts, v in right}.values())
    by_k: dict = {}
    for k, ts, v in right:
        by_k.setdefault(k, []).append((ts, v))

    def model(k, ts):
        cands = by_k.get(k, [])
        back = max(((t, v) for t, v in cands if t <= ts), default=None)
        fwd = min(((t, v) for t, v in cands if t >= ts), default=None)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        else:
            if back is None or fwd is None:
                pick = back or fwd
            else:
                pick = back if (ts - back[0]) <= (fwd[0] - ts) else fwd
        return None if pick is None else pick[1]

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "lid int, k int, lts int"
    )
    rdf = spark.createDataFrame(right, "k int, rts int, v int")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            ldf, rdf, left_on="k", right_on="k", left_ts="lts", right_ts="rts",
            right_payload=["v"], direction=direction,
        ).collect()
    }
    expected = {i: model(k, ts) for i, (k, ts) in enumerate(left)}
    assert got == expected
