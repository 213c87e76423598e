"""Brute-force Python models for the OHLC resample and TWAP operators
on randomized small inputs — the distributed struct-argmax / weighted
aggregates must match a sequential spec independent of partitioning.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dsp_spark.queries.windows import _OHLC_US


def _mk_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf_dir = str(tmp_path / "synth")
    df.write.mode("overwrite").parquet(sf_dir + "/events.parquet")
    return sf_dir


def _rand_rows(seed, n):
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(n):
        ts = base + timedelta(
            seconds=rng.randint(0, 3 * 86400), microseconds=rng.randint(0, 999) * 1000
        )
        rows.append(
            (
                eid,
                ts,
                rng.randint(0, 4),
                rng.choice(["click", "view", "purchase"]),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    return rows


def test_ohlc_matches_model(spark, tmp_path):
    from dsp_spark.queries.windows import events_ohlc_resample

    rows = _rand_rows(20260814, 300)
    sf_dir = _mk_events(spark, tmp_path, rows)

    buckets = {}
    epoch = datetime(1970, 1, 1)
    for eid, ts, _, etype, value, _ in rows:
        us = int((ts - epoch).total_seconds() * 1_000_000)
        w = (us // _OHLC_US) * _OHLC_US
        buckets.setdefault((etype, w), []).append((ts, eid, value))
    expected = {}
    for key, evs in buckets.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        expected[key] = (
            len(evs), evs[0][2], max(vals), min(vals), evs[-1][2]
        )

    got = events_ohlc_resample(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        w = int((r["w_start"] - epoch).total_seconds() * 1_000_000)
        n, o, h, l, c = expected[(r["event_type"], w)]
        assert (r["n_events"], r["open_v"], r["high_v"], r["low_v"],
                r["close_v"]) == (n, o, h, l, c)


def test_twap_matches_model(spark, tmp_path):
    from dsp_spark.queries.windows import events_twap_per_user

    rows = _rand_rows(4, 200)
    sf_dir = _mk_events(spark, tmp_path, rows)

    per_user = {}
    for eid, ts, uid, _, value, _ in rows:
        per_user.setdefault(uid, []).append((ts, eid, value))
    expected = {}
    for uid, evs in per_user.items():
        evs.sort()
        num = den = segs = 0
        for (ts, _, v), (nts, _, _) in zip(evs, evs[1:]):
            dur_s = int((nts - ts).total_seconds())  # floor of whole seconds
            if dur_s > 0:
                v100 = round(v * 100)  # 2-decimal doubles -> exact cents
                num += v100 * dur_s
                den += dur_s
                segs += 1
        if den:
            expected[uid] = (segs, den, num / den / 100)

    got = {r["user_id"]: r for r in events_twap_per_user(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for uid, (segs, den, twap) in expected.items():
        r = got[uid]
        assert (r["n_segments"], r["covered_s"]) == (segs, den)
        assert abs(r["twap"] - twap) < 1e-9


def test_last_touch_attribution_matches_model(spark, sf_dir):
    """Attribution credit vs a direct Python walk over each user's
    (ts, event_id)-ordered events: every purchase credits the most
    recent preceding non-purchase; purchases with no prior touch
    credit 'none'."""
    from collections import Counter, defaultdict

    from dsp_spark.queries.windows import events_attribution_last_touch
    from dsp_spark.session import read_table

    rows = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = Counter()
    for evs in by_user.values():
        touch = None
        for _, _, typ in sorted(evs):
            if typ == "purchase":
                want[touch or "none"] += 1
            else:
                touch = typ
    got = {
        r.attributed_type: r.n_conversions
        for r in events_attribution_last_touch(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == sum(1 for r in rows if r.event_type == "purchase")


def test_open_backlog_matches_model(spark, sf_dir):
    """Backlog curve vs direct interval counting: on every day in the
    spine, backlog = #orders opened on-or-before minus #orders whose
    last ship date is on-or-before."""
    from collections import Counter

    from dsp_spark.queries.windows import orders_open_backlog_daily
    from dsp_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    ).collect()
    closes = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").cast("date").alias("cd"))
        .collect()
    )
    close_of = {r.l_orderkey: r.cd for r in closes}
    opened, closed = Counter(), Counter()
    for r in orders:
        opened[r.od] += 1
        if r.o_orderkey in close_of:
            closed[close_of[r.o_orderkey]] += 1
    got = {
        r.day: (r.n_opened, r.n_closed, r.backlog)
        for r in orders_open_backlog_daily(spark, sf_dir).collect()
    }
    assert set(got) == set(opened) | set(closed)
    run = 0
    for day in sorted(got):
        run += opened.get(day, 0) - closed.get(day, 0)
        assert got[day] == (opened.get(day, 0), closed.get(day, 0), run), day
    # non-vacuous: the curve rises, and it ends at exactly the count of
    # never-closing orders (orders with no lineitems)
    backs = [got[d][2] for d in sorted(got)]
    never_close = sum(1 for r in orders if r.o_orderkey not in close_of)
    assert max(backs) > never_close
    assert backs[-1] == never_close
