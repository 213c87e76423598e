"""Independent model tests for the round-9 feature/analytics entries.

Each catalog entry is recomputed by a trivially-correct pure-python /
pandas model over the same parquet input, and must match exactly
(the entries emit only exact ints and identical-expression doubles, so
equality is bitwise, not approximate).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from dsp_spark import catalog
from tests._num import half_up, trunc_div

SF = "/root/testdata/sf0.001"
ENTRIES = catalog.entries()


def _run(spark, name):
    return ENTRIES[name].fn(spark, SF).toPandas()


def _cents(v) -> int:
    # mirror of CAST(x AS DECIMAL(12,2))*100: exact for 2-dec doubles
    return int(round(float(v) * 100))


def test_skyline_matches_bruteforce(spark):
    got = _run(spark, "parts_skyline_per_brand")
    part = pd.read_parquet(f"{SF}/part.parquet")
    rows = [
        (r.p_partkey, r.p_brand, _cents(r.p_retailprice), r.p_size)
        for r in part.itertuples()
    ]
    by_brand = defaultdict(list)
    for k, b, p, s in rows:
        by_brand[b].append((k, p, s))
    expect = set()
    for b, items in by_brand.items():
        for k, p, s in items:
            dominated = any(
                (p2 <= p and s2 >= s and (p2 < p or s2 > s))
                for _, p2, s2 in items
            )
            if not dominated:
                expect.add((k, b, p, s))
    assert expect == {
        (r.p_partkey, r.p_brand, r.price_cents, r.p_size)
        for r in got.itertuples()
    }
    assert len(expect) > 0


def test_loo_encoding_matches_pandas(spark):
    got = _run(spark, "feature_target_encoding_loo")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    j = orders.merge(
        cust[["c_custkey", "c_mktsegment"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    j["cents"] = [_cents(v) for v in j.o_totalprice]
    stats = j.groupby("c_mktsegment")["cents"].agg(["sum", "count"])
    exp = {}
    for r in j.itertuples():
        ssum, n = stats.loc[r.c_mktsegment]
        if n > 1:
            exp[r.o_orderkey] = (int(ssum) - r.cents) / (int(n) - 1)
    gm = dict(zip(got.o_orderkey, got.loo_enc_cents))
    assert gm == exp  # exact double equality: identical expression


def test_elasticity_matches_sufficient_stats(spark):
    got = _run(spark, "part_price_qty_elasticity").set_index("p_brand")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey",
                 right_on="p_partkey")
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxx, sxy
    for r in j.itertuples():
        x, y = _cents(r.l_extendedprice), _cents(r.l_quantity)
        a = acc[r.p_brand]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += x * y
    for b, (n, sx, sy, sxx, sxy) in acc.items():
        slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
            float(n) * float(sxx) - float(sx) * float(sx)
        )
        assert got.loc[b, "qty_price_slope"] == slope
        assert got.loc[b, "n"] == n


def test_acf_matches_python_fold(spark):
    got = _run(spark, "events_acf_hourly")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = ev.ts.dt.floor("h")
    counts = (
        ev.groupby(["event_type", "hr"]).size().rename("x").reset_index()
    )
    exp = {}
    for ty, grp in counts.groupby("event_type"):
        xs = [int(v) for v in grp.sort_values("hr").x]
        for lag in (1, 2, 3):
            pairs = [(xs[i], xs[i - lag]) for i in range(lag, len(xs))]
            if not pairs:
                continue
            n = len(pairs)
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxx = sum(p[0] * p[0] for p in pairs)
            syy = sum(p[1] * p[1] for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            acf = (float(n) * float(sxy) - float(sx) * float(sy)) / (
                math.sqrt(float(n) * float(sxx) - float(sx) * float(sx))
                * math.sqrt(float(n) * float(syy) - float(sy) * float(sy))
            )
            exp[(ty, lag)] = (n, acf)
    gm = {(r.event_type, r.lag): (r.n, r.acf) for r in got.itertuples()}
    assert gm == exp
    # persistence sanity: hourly traffic autocorrelation decays with lag
    assert all(k in gm for k in exp)


def test_burstiness_matches_python_fold(spark):
    got = _run(spark, "events_interarrival_burstiness").set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # parquet µs timestamps arrive as datetime64[us]: int64 IS epoch-µs
    assert str(ev.ts.dtype) == "datetime64[us]"
    ev["us"] = ev.ts.astype("int64")
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        us = [int(v) for v in g.us]
        gaps = [b - a for a, b in zip(us, us[1:])]
        if len(gaps) < 5:
            assert uid not in got.index
            continue
        n = len(gaps)
        sg = float(sum(gaps))
        sgg = float(sum(x * x for x in gaps))
        mu = sg / n
        sigma = math.sqrt(sgg / n - mu * mu)
        row = got.loc[uid]
        assert row.n_gaps == n
        assert row.mean_gap_s == mu / 1e6
        assert row.cv == sigma / mu
        assert row.burstiness == (sigma - mu) / (sigma + mu)
        # Goh-Barabasi bound: B in (-1, 1)
        assert -1.0 < row.burstiness < 1.0


def test_level_shift_matches_pandas(spark):
    got = _run(spark, "events_level_shift_detect")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = ev.ts.dt.floor("h")
    ev["cents"] = [_cents(v) for v in ev.value]
    h = (
        ev.groupby(["event_type", "hr"])
        .agg(s=("cents", "sum"), n=("cents", "size"))
        .reset_index()
    )
    exp = set()
    for ty, grp in h.groupby("event_type"):
        grp = grp.sort_values("hr")
        prev = None
        for r in grp.itertuples():
            mean = float(r.s) / r.n
            if prev is not None and abs(mean - prev) > 9000.0:
                exp.add((ty, r.hr, r.n, prev, mean, abs(mean - prev)))
            prev = mean
    gm = {
        (
            r.event_type,
            r.hour_start,
            r.n,
            r.prev_mean_cents,
            r.mean_cents,
            r.shift_cents,
        )
        for r in got.itertuples()
    }
    assert gm == exp


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_model(spark):
    got = _run(spark, "er_sorted_neighborhood_pairs")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    exp = set()
    for nk, grp in cust.groupby("c_nationkey"):
        rows = sorted(
            (r.c_name, r.c_custkey) for r in grp.itertuples()
        )
        for i, (name, key) in enumerate(rows):
            for off in (1, 2):
                if i + off < len(rows):
                    n2, k2 = rows[i + off]
                    d = _lev(name, n2)
                    if d <= 2:
                        exp.add((nk, key, k2, d))
    gm = {
        (r.c_nationkey, r.key_a, r.key_b, r.lev_dist)
        for r in got.itertuples()
    }
    assert gm == exp
    assert len(exp) > 0


def test_adamic_adar_matches_model(spark):
    from dsp_spark.operators import dedup as dd
    from dsp_spark.queries._util import t as _t

    got = _run(spark, "graph_adamic_adar_pairs")
    pairs = (
        dd.minhash_lsh_pairs(
            _t(spark, SF, "documents"), "doc_id", "text",
            n_hashes=8, bands=2, k=5,
        )
        .toPandas()
    )
    nbrs = defaultdict(set)
    for r in pairs.itertuples():
        nbrs[r.id_a].add(r.id_b)
        nbrs[r.id_b].add(r.id_a)
    deg = {u: len(v) for u, v in nbrs.items()}
    exp = {}
    for w, ns in nbrs.items():
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                cn, aa = exp.get((a, b), (0, 0))
                # HALF_UP round, matching F.round / duckdb round
                term = half_up(1000000.0 / math.log(deg[w]))
                exp[(a, b)] = (cn + 1, aa + int(term))
    gm = {
        (r.id_a, r.id_b): (r.common_neighbors, r.aa_micro)
        for r in got.itertuples()
    }
    assert gm == exp
    assert len(exp) > 0


def test_hapax_matches_counter(spark):
    got = _run(spark, "text_hapax_rate_by_source").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_source = defaultdict(Counter)
    for r in docs.itertuples():
        toks = [t.lower() for t in re.split(r"\s+", r.text) if t != ""]
        per_source[r.source].update(toks)
    for src, ctr in per_source.items():
        n_tokens = sum(ctr.values())
        n_types = len(ctr)
        n_hapax = sum(1 for v in ctr.values() if v == 1)
        row = got.loc[src]
        assert row.n_tokens == n_tokens
        assert row.n_types == n_types
        assert row.n_hapax == n_hapax
        assert row.ttr == float(n_types) / n_tokens
        assert row.hapax_rate == float(n_hapax) / n_types


def test_cusum_closed_form_matches_recurrence(spark):
    got = _run(spark, "events_cusum_alarm")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = ev.ts.dt.floor("h")
    ev["cents"] = [_cents(v) for v in ev.value]
    h = (
        ev.groupby(["event_type", "hr"])["cents"].sum().reset_index()
    )
    exp = {}
    for ty, grp in h.groupby("event_type"):
        grp = grp.sort_values("hr")
        vals = [int(v) for v in grp.cents]
        target = trunc_div(sum(vals), len(vals))  # SQL div truncates toward zero
        s = 0
        for hr, v in zip(grp.hr, vals):
            # the literal CUSUM recurrence the closed form must equal
            s = max(0, s + (v - target))
            exp[(ty, hr)] = (v, s, s > 200000)
    gm = {
        (r.event_type, r.hour_start): (r.s_cents, r.cusum_cents, r.alarm)
        for r in got.itertuples()
    }
    assert gm == exp
    assert len(exp) > 0


def test_psi_matches_python_model(spark):
    got = _run(spark, "dq_psi_price_drift").set_index("bucket")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    nb, na = Counter(), Counter()
    cutoff = pd.Timestamp("1998-01-01")
    for r in orders.itertuples():
        bucket = min(_cents(r.o_totalprice) // 6000000, 9)
        (nb if r.o_orderdate < cutoff else na)[bucket] += 1
    tb, ta = sum(nb.values()), sum(na.values())
    psi_pico = 0
    exp = {}
    for b in sorted(set(nb) | set(na)):
        p = float(nb[b] + 1) / (tb + 10)
        q = float(na[b] + 1) / (ta + 10)
        term = half_up((p - q) * math.log(p / q) * 1e12)
        psi_pico += term
        exp[b] = (nb[b], na[b], p, q, term)
    for b, (cb, ca, p, q, term) in exp.items():
        row = got.loc[b]
        assert (row.n_before, row.n_after) == (cb, ca)
        assert row.p == p and row.q == q
        assert row.term_pico == term
        assert row.psi == psi_pico / 1e12
    # PSI is non-negative by construction
    assert psi_pico >= 0


def test_seasonal_index_matches_pandas(spark):
    got = _run(spark, "orders_seasonal_index").set_index("mon")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = defaultdict(int)
    n = Counter()
    for r in orders.itertuples():
        m = r.o_orderdate.month
        cents[m] += _cents(r.o_totalprice)
        n[m] += 1
    total = sum(cents.values())
    months = len(cents)
    for m in cents:
        row = got.loc[m]
        assert row.n_orders == n[m]
        assert row.revenue == float(cents[m]) / 100
        assert row.seasonal_idx == float(cents[m]) * months / total
    # indices average to 1 across months by construction
    assert abs(sum(got.seasonal_idx) / months - 1.0) < 1e-9


def test_user_type_entropy_matches_counter(spark):
    got = _run(spark, "events_user_type_entropy").set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for uid, grp in ev.groupby("user_id"):
        ctr = Counter(grp.event_type)
        n = sum(ctr.values())
        nano = 0
        for c in ctr.values():
            nano += half_up(float(c) * math.log2(float(c)) * 1e9)
        h = half_up(
            (math.log2(float(n)) - (float(nano) / 1e9) / n) * 1e9
        ) / 1e9
        row = got.loc[uid]
        assert row.n_events == n
        assert row.n_types == len(ctr)
        assert row.entropy_bits == h
        # entropy bounded by log2(#types)
        assert -1e-9 <= row.entropy_bits <= math.log2(len(ctr)) + 1e-9


def test_km_matches_python_model(spark):
    got = _run(spark, "orders_interpurchase_km").sort_values(
        "gap_days"
    ).reset_index(drop=True)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    gaps = []
    for _, grp in orders.groupby("o_custkey"):
        ds = sorted(
            (r.o_orderdate, r.o_orderkey) for r in grp.itertuples()
        )
        for a, b in zip(ds, ds[1:]):
            gaps.append((b[0].normalize() - a[0].normalize()).days)
    ctr = Counter(gaps)
    total = len(gaps)
    seen = 0
    pico = 0
    exp_rows = []
    for day in sorted(ctr):
        d = ctr[day]
        n_risk = total - seen
        if d < n_risk:
            pico += half_up(math.log(1.0 - float(d) / n_risk) * 1e12)
            surv = half_up(math.exp(pico / 1e12) * 1e9) / 1e9
        else:
            surv = 0.0
        exp_rows.append((day, d, n_risk, surv))
        seen += d
    gm = [
        (r.gap_days, r.d, r.n_risk, r.survival) for r in got.itertuples()
    ]
    assert gm == exp_rows
    # survival is non-increasing and terminates at exactly 0
    ss = [r[3] for r in exp_rows]
    assert all(a >= b for a, b in zip(ss, ss[1:]))
    assert ss[-1] == 0.0


def test_hhi_matches_python_model(spark):
    got = _run(spark, "supplier_hhi_by_parttype").set_index("p_type")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(part[["p_partkey", "p_type"]], left_on="l_partkey",
                 right_on="p_partkey")
    cents = defaultdict(lambda: defaultdict(int))
    for r in j.itertuples():
        cents[r.p_type][r.l_suppkey] += _cents(r.l_extendedprice)
    for ty, per_supp in cents.items():
        total = sum(per_supp.values())
        pico = 0
        for c in per_supp.values():
            sh = float(c) / total
            pico += half_up(sh * sh * 1e12)
        row = got.loc[ty]
        assert row.n_suppliers == len(per_supp)
        assert row.hhi == pico / 1e12
        # HHI floor: 1/n at perfect equality
        assert row.hhi >= 1.0 / len(per_supp) - 1e-9


def test_transition_entropy_matches_model(spark):
    got = _run(spark, "events_transition_entropy").set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        seq = list(g.event_type)
        trans = Counter(zip(seq, seq[1:]))
        if not trans:
            assert uid not in got.index
            continue
        cur_tot = Counter()
        for (a, _b), c in trans.items():
            cur_tot[a] += c
        nano = lambda c: half_up(float(c) * math.log2(float(c)) * 1e9)
        h_nano = sum(
            nano(ct)
            - sum(nano(c) for (a, _b), c in trans.items() if a == cur)
            for cur, ct in cur_tot.items()
        )
        n = sum(trans.values())
        row = got.loc[uid]
        assert row.n_transitions == n
        assert row.entropy_rate_bits == (float(h_nano) / 1e9) / n
        # conditional entropy can't exceed the unconditional bound
        assert -1e-9 <= row.entropy_rate_bits <= math.log2(
            len(set(seq))
        ) + 1e-9


def test_zipf_slope_matches_model(spark):
    got = _run(spark, "text_zipf_slope")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ctr = Counter()
    for text in docs.text:
        ctr.update(
            t.lower() for t in re.split(r"\s+", text) if t != ""
        )
    top = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:128]
    q = lambda v: half_up(math.log(float(v)) * 1e6)
    pts = [(q(r), q(c)) for r, (_tok, c) in enumerate(top, start=1)]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        float(n) * float(sxx) - float(sx) * float(sx)
    )
    assert len(got) == 1
    assert got.k_terms[0] == n
    assert got.zipf_slope[0] == slope
    # natural-ish text: negative slope in a sane band
    assert -2.5 < slope < -0.1


def test_clustering_coeff_matches_model(spark):
    from dsp_spark.operators import dedup as dd
    from dsp_spark.queries._util import t as _t

    got = _run(spark, "graph_node_clustering_coeff").set_index("doc_id")
    pairs = dd.minhash_lsh_pairs(
        _t(spark, SF, "documents"), "doc_id", "text",
        n_hashes=8, bands=2, k=5,
    ).toPandas()
    nbrs = defaultdict(set)
    pset = set()
    for r in pairs.itertuples():
        nbrs[r.id_a].add(r.id_b)
        nbrs[r.id_b].add(r.id_a)
        pset.add((r.id_a, r.id_b))
    n_checked = 0
    for v, ns in nbrs.items():
        deg = len(ns)
        if deg < 2:
            assert v not in got.index
            continue
        ns = sorted(ns)
        tri = sum(
            1
            for i, a in enumerate(ns)
            for b in ns[i + 1 :]
            if (a, b) in pset
        )
        row = got.loc[v]
        assert row.degree == deg
        assert row.triangles == tri
        assert row.clustering_coeff == float(2 * tri) / (deg * (deg - 1))
        assert 0.0 <= row.clustering_coeff <= 1.0
        n_checked += 1
    assert n_checked == len(got)
