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
