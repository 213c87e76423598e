"""Event-time-timeout session closing: sessions emit exactly when the
watermark passes their idle gap, with exact aggregates, and state for
closed sessions is gone (a later same-user event opens a FRESH one)."""

from __future__ import annotations

import pandas as pd
import pytest

from dsp_spark.streaming.stateful import SESSION_GAP_S, session_close_stream


def _run(spark, tmp_path, frames):
    """frames: list of row-lists; each becomes one micro-batch file."""
    src = tmp_path / "src"
    src.mkdir(parents=True)
    schema = None
    for i, rows in enumerate(frames):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf.to_parquet(src / f"f{i}.parquet", coerce_timestamps="us")
        schema = spark.createDataFrame(pdf).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    name = f"sc_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        session_close_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_sessions_close_on_watermark_and_state_is_removed(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(seconds=SESSION_GAP_S)
    # the watermark lags one micro-batch (it advances to batch N's max
    # event time only when batch N+1 is planned), and a key receiving
    # input in a batch is served by handleInput, not its pending
    # timeout — so closes need a quiet batch after the watermark passes
    frames = [
        [
            (t0, 1, 10.00),
            (t0 + pd.Timedelta(minutes=5), 1, 2.50),
            (t0 + pd.Timedelta(minutes=1), 2, 7.00),
        ],
        [(t0 + gap * 3, 3, 1.00)],
        # wm is now t0+3*gap: user 1 and 2 close while processing this
        [(t0 + gap * 6, 4, 0.50)],
        # user 1 RETURNS long after its close: a brand-new session
        [(t0 + gap * 7, 1, 99.00)],
        [(t0 + gap * 9, 5, 0.25)],
        # wm t0+9*gap: closes user 1's second session (and user 4)
        [(t0 + gap * 13, 6, 0.10)],
    ]
    res = _run(spark, tmp_path, frames)
    by_user = {
        (r.user_id, r.first_us): r for _, r in res.iterrows()
    }
    # user 1's FIRST session: both events, exact cents, correct bounds
    first1 = by_user[(1, int(t0.value // 1000))]
    assert first1.n_events == 2 and first1.total_cents == 1250
    assert first1.last_us == int((t0 + pd.Timedelta(minutes=5)).value // 1000)
    # user 2 closed with its single event
    u2 = [r for (u, _), r in by_user.items() if u == 2]
    assert len(u2) == 1 and u2[0].n_events == 1 and u2[0].total_cents == 700
    # user 1's SECOND session is separate — state really was removed
    second1 = by_user[(1, int((t0 + gap * 7).value // 1000))]
    assert second1.n_events == 1 and second1.total_cents == 9900
    # availableNow ends with a watermark-advancing empty batch at
    # t0+13*gap, which also closes user 5 (close time t0+10*gap) — but
    # user 6's own event IS the high watermark, so its close time sits
    # beyond it and the session must still be open
    assert not any(u == 6 for (u, _) in by_user)
    # closed: u1 x2, u2, u3, u4, u5
    assert len(res) == 6
