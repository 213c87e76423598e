"""Property tests for the round-10 numeric/graph machinery.

* the int64-safe split floor(a^2/n) = (a div n)*a + ((a mod n)*a) div n
  used by lineitem_anova_returnflag is an exact identity for every
  non-negative a and positive n (pure algebra, then a Spark spot check
  at the magnitudes that broke the naive double formulation);
* tests/_num.py half_up / trunc_div agree with exact Fraction-based
  references on arbitrary inputs;
* capped wedge enumeration: with cap >= max degree the capped scorers
  equal the classic uncapped formulas on random graphs; with any cap
  the per-center wedge count is bounded by C(cap, 2).
"""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

from hypothesis import given, settings, strategies as st

from tests._num import half_up, trunc_div


@given(
    a=st.integers(min_value=0, max_value=9_200_000_000_000_000_000),
    n=st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=300, deadline=None)
def test_sqdiv_split_identity(a, n):
    q, r = a // n, a % n
    assert q * a + (r * a) // n == a * a // n
    # every Spark-side intermediate stays in range: the bigint pieces
    assert q * a < 10**38 and (r * a) // n <= a


@given(st.fractions(max_denominator=4))
@settings(max_examples=300, deadline=None)
def test_half_up_matches_fraction_reference(x):
    # reference over the DOUBLE the helper actually sees (x itself may
    # be unrepresentable, e.g. 2^53+1): HALF_UP = ties away from zero
    v = float(Fraction(x))
    if math.isinf(v):
        return
    f = Fraction(v)  # exact rational value of the double
    want = (abs(f.numerator) * 2 + f.denominator) // (2 * f.denominator)
    want = want if f >= 0 else -want
    assert half_up(v) == want


@given(
    a=st.integers(min_value=-(10**15), max_value=10**15),
    b=st.integers(min_value=-(10**6), max_value=10**6).filter(lambda v: v),
)
@settings(max_examples=300, deadline=None)
def test_trunc_div_matches_fraction_reference(a, b):
    assert trunc_div(a, b) == math.trunc(Fraction(a, b))


def _model_aa(pairs, cap):
    """Pure-python capped Adamic-Adar."""
    adj = defaultdict(set)
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    out = defaultdict(lambda: [0, 0, False])  # (cn, aa_micro, capped)
    for w, ns in adj.items():
        deg = len(ns)
        kept = sorted(ns)[:cap]
        was_capped = deg > cap
        term = half_up(1e6 / math.log(deg)) if deg >= 2 else None
        for i, x in enumerate(kept):
            for y in kept[i + 1 :]:
                rec = out[(x, y)]
                rec[0] += 1
                rec[1] += term
                rec[2] = rec[2] or was_capped
    return {k: tuple(v) for k, v in out.items()}


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        )
        .map(lambda p: (min(p), max(p)))
        .filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=25, deadline=None)
def test_capped_aa_model_properties(pairs, cap):
    """Model-level invariants the Spark scorer mirrors (Spark parity
    for fixed cases is in tests/test_graph_cap.py; hypothesis runs on
    the python model to keep the search loop off the JVM):
    with cap >= max degree, capped == uncapped; per-center wedges are
    bounded by C(cap,2)."""
    deg = defaultdict(int)
    for x, y in pairs:
        deg[x] += 1
        deg[y] += 1
    max_deg = max(deg.values())
    capped = _model_aa(pairs, cap)
    uncapped = _model_aa(pairs, max_deg)
    if cap >= max_deg:
        assert capped == uncapped
        assert not any(c for _, _, c in capped.values())
    # bound: total wedge contributions per center <= C(cap, 2)
    # (every pair's common_neighbors sums center contributions, so the
    # global wedge count is bounded by n_centers * C(cap,2))
    total_wedges = sum(cn for cn, _, _ in capped.values())
    assert total_wedges <= len(deg) * cap * (cap - 1) // 2
    # flags only appear when some center actually exceeds the cap
    if max_deg <= cap:
        assert not any(c for _, _, c in capped.values())


def test_sqdiv_split_matches_spark_at_breaking_magnitudes(spark):
    """The exact a values whose naive double form diverged between
    engines (r10): the split expression must equal python's exact
    floor on the JVM too."""
    cases = [
        (1061366851829, 200125),
        (3177120212360, 600000),
        (9_199_999_999_999_999_999 // 10**6, 7),
        (1, 1),
        (0, 5),
    ]
    rows = spark.createDataFrame(
        [(str(a), str(n)) for a, n in cases], "a_s string, n_s string"
    ).selectExpr(
        "CAST(a_s AS DECIMAL(19,0)) AS a", "CAST(n_s AS BIGINT) AS n"
    )
    got = rows.selectExpr(
        "a",
        "n",
        "CAST(CAST((a div n) AS DECIMAL(19,0)) * a"
        " + CAST(((a % n) * a) div n AS DECIMAL(38,0))"
        " AS DECIMAL(38,0)) AS q",
    ).collect()
    for r in got:
        assert int(r.q) == int(r.a) * int(r.a) // int(r.n)
