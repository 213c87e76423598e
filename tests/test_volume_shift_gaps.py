"""Targeted tests for dq_volume_shift_daily's calendar densification.

The synthetic fixture has events every day, so oracle parity never
exercises the gap path — these build a corpus WITH a silent outage and
assert the monitor (a) surfaces the missing day as an explicit zero,
(b) flags it as shifted, and (c) keeps the trailing window on calendar
days across the gap.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dsp_spark.queries.quality import dq_volume_shift_daily


def _write_events(spark, tmp_path, day_counts):
    """day_counts: {day_of_month: n_events} in Jan 2024."""
    rows = []
    eid = 0
    for dom, n in day_counts.items():
        for i in range(n):
            rows.append(
                (
                    eid,
                    datetime(2024, 1, dom, 12, 0, i % 60, 500),
                    eid % 7,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf_dir = str(tmp_path / "synth")
    df.write.parquet(sf_dir + "/events.parquet")
    return sf_dir


def test_missing_day_appears_as_flagged_zero(spark, tmp_path):
    # steady 10/day for a week, then day 8 is silently absent
    sf_dir = _write_events(
        spark, tmp_path, {**{d: 10 for d in range(1, 8)}, 9: 10}
    )
    out = {
        r["day"].day: r
        for r in dq_volume_shift_daily(spark, sf_dir).collect()
    }
    assert out[8]["n_events"] == 0
    assert out[8]["shifted"] is True
    assert out[8]["vs_trailing"] == 0.0


def test_trailing_window_counts_calendar_days_across_gap(spark, tmp_path):
    # days 1-3 at 10/day, days 4-8 missing, day 9 at 10: day 9's
    # trailing window is days 2-8 = 20 events over 7 calendar days;
    # a ROWS-over-observed-days window would instead see 30 over 3
    sf_dir = _write_events(
        spark, tmp_path, {1: 10, 2: 10, 3: 10, 9: 10}
    )
    out = {
        r["day"].day: r
        for r in dq_volume_shift_daily(spark, sf_dir).collect()
    }
    r9 = out[9]
    # n * trail_days / trail_sum = 10 * 7 / 20
    assert abs(r9["vs_trailing"] - 10 * 7 / 20) < 1e-12
    assert r9["shifted"] is True  # 3.5x the trailing average
    # the zero days inside the gap flag too
    assert out[5]["n_events"] == 0 and out[5]["shifted"] is True
