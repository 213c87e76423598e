"""Round-10 catalog entries, each checked against a pure-python model
recomputed straight from the parquet (the oracle gate checks Spark ==
DuckDB; these pin Spark == the textbook formula)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from dsp_spark import catalog
from tests._num import half_up

SF = "/root/testdata/sf0.001"
ENTRIES = catalog.entries()


def _run(spark, name):
    return ENTRIES[name].fn(spark, SF).toPandas()


def _cents(v) -> int:
    return int(round(float(v) * 100))


def test_chi2_matches_model(spark):
    got = _run(spark, "orders_chi2_priority_by_segment")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    cells = Counter(zip(j.o_orderpriority, j.c_mktsegment))
    n_r = Counter()
    n_c = Counter()
    for (p, s), n in cells.items():
        n_r[p] += n
        n_c[s] += n
    n = sum(cells.values())
    chi2_micro = 0
    exp_cells = {}
    for (p, s), obs in cells.items():
        e = float(n_r[p]) * n_c[s] / n
        cell = (float(obs) - e) * (float(obs) - e) / e
        chi2_micro += half_up(cell * 1e6)
        exp_cells[(p, s)] = (obs, e, cell)
    assert len(got) == len(cells) > 0
    for r in got.itertuples():
        obs, e, cell = exp_cells[(r.priority, r.segment)]
        assert (r.n_obs, r.expected, r.chi2_cell) == (obs, e, cell)
        assert r.chi2_total == chi2_micro / 1e6


def test_anova_matches_model(spark):
    got = _run(spark, "lineitem_anova_returnflag").set_index("grp")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    g = defaultdict(lambda: [0, 0, 0])  # n, sum, sumsq
    for flag, price in zip(li.l_returnflag, li.l_extendedprice):
        c = _cents(price)
        g[flag][0] += 1
        g[flag][1] += c
        g[flag][2] += c * c
    n = sum(v[0] for v in g.values())
    s_all = sum(v[1] for v in g.values())
    ssq_all = sum(v[2] for v in g.values())
    k = len(g)
    grp_term = sum(v[1] * v[1] // v[0] for v in g.values())  # exact int
    ss_b = float(grp_term - s_all * s_all // n)
    ss_w = float(ssq_all - grp_term)
    f_stat = (ss_b / (k - 1)) / (ss_w / (n - k))
    assert set(got.index) == set(g)
    for flag, (n_g, sum_g, _) in g.items():
        row = got.loc[flag]
        assert row.n_g == n_g
        assert row.mean_cents == float(sum_g) / n_g
        assert row.ss_between == ss_b and row.ss_within == ss_w
        assert row.f_stat == f_stat


def test_mann_kendall_matches_model(spark):
    got = _run(spark, "events_mann_kendall_trend").set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(d=ev.ts.dt.floor("D"))
        .groupby(["event_type", "d"])
        .size()
        .reset_index(name="c")
    )
    for ty, grp in daily.groupby("event_type"):
        cs = [int(c) for _, c in sorted(zip(grp.d, grp.c))]
        nd = len(cs)
        if nd < 2:
            assert ty not in got.index
            continue
        s = sum(
            (1 if cs[j] > cs[i] else -1 if cs[j] < cs[i] else 0)
            for i in range(nd)
            for j in range(i + 1, nd)
        )
        var0 = nd * (nd - 1) * (2 * nd + 5) // 6
        row = got.loc[ty]
        assert (row.n_days, row.s_stat, row.var0) == (nd, s, var0)
        assert row.z_stat == float(s) / math.sqrt(float(var0))
    assert len(got) > 0


def test_source_jaccard_matches_model(spark):
    got = _run(spark, "source_ngram_jaccard")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    grams = defaultdict(set)  # source -> set of 5-gram strings
    for src, text in zip(docs.source, docs.text):
        n = len(text)
        if n <= 5:
            grams[src].add(text[:5])  # greatest(len-4, 1) keeps 1 window
        else:
            for i in range(n - 4):
                grams[src].add(text[i : i + 5])
    srcs = sorted(grams)
    exp = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(grams[a] & grams[b])
            if common:
                exp[(a, b)] = (
                    common,
                    len(grams[a]),
                    len(grams[b]),
                    float(common) / (len(grams[a]) + len(grams[b]) - common),
                )
    gm = {
        (r.source_a, r.source_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in got.itertuples()
    }
    assert gm == exp and len(exp) > 0


def test_mixture_kl_matches_model(spark):
    got = _run(spark, "mixture_kl_divergence").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    s = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
    )
    td, tc = int(s.n_docs.sum()), int(s.sum_chars.sum())
    kl_pico = 0
    exp = {}
    for src, r in s.iterrows():
        if r.sum_chars <= 0:
            continue
        p = float(r.n_docs) / td
        q = float(r.sum_chars) / tc
        term = half_up(p * math.log(p / q) * 1e12)
        kl_pico += term
        exp[src] = (int(r.n_docs), int(r.sum_chars), p, q, term)
    assert set(got.index) == set(exp)
    for src, (nd, nc, p, q, term) in exp.items():
        row = got.loc[src]
        assert (row.n_docs, row.sum_chars, row.term_pico) == (nd, nc, term)
        assert (row.p_docs, row.p_chars) == (p, q)
        assert row.kl_total == kl_pico / 1e12
    # KL is non-negative by Gibbs' inequality (up to pico rounding)
    assert kl_pico >= -len(exp)


def test_simpson_diversity_matches_model(spark):
    import re

    got = _run(spark, "text_simpson_diversity_by_lang").set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = defaultdict(Counter)
    for lang, text in zip(docs.lang, docs.text):
        for tok in re.split(r"\s+", text):
            if tok:
                cnt[lang][tok] += 1
    for lang, c in cnt.items():
        n = sum(c.values())
        if n < 2:
            assert lang not in got.index
            continue
        coll = sum(v * (v - 1) for v in c.values())
        lam = float(coll) / (float(n) * (n - 1))
        row = got.loc[lang]
        assert (row.n_tokens, row.n_types) == (n, len(c))
        assert row.simpson_lambda == lam
        assert row.simpson_diversity == 1.0 - lam
    assert len(got) > 0
