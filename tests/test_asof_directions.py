"""as-of join direction semantics on a hand-built frame: inclusivity
at equal timestamps, tie-breaks, unmatched nulls, nearest tie→backward."""

from __future__ import annotations

import pytest

from dsp_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("k1", 10, "L10"),
            ("k1", 25, "L25"),
            ("k1", 40, "L40"),
            ("k2", 5, "L5"),  # k2 has no right rows at all
            ("k3", 30, "L30"),  # equidistant between right 20 and 40
        ],
        "k string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [
            ("k1", 10, 1, "R10a"),
            ("k1", 10, 2, "R10b"),  # tie on ts: max tb must win
            ("k1", 30, 3, "R30"),
            ("k3", 20, 4, "R20"),
            ("k3", 40, 5, "R40"),
        ],
        "k string, rt long, tb int, pay string",
    )
    return left, right


def _run(left, right, direction):
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="t",
        right_ts="rt",
        right_payload=["pay"],
        tie_break="tb",
        direction=direction,
    )
    return {(r["k"], r["t"]): r["pay"] for r in out.collect()}


def test_backward(frames):
    got = _run(*frames, "backward")
    assert got[("k1", 10)] == "R10b"  # inclusive + max tie_break
    assert got[("k1", 25)] == "R10b"
    assert got[("k1", 40)] == "R30"
    assert got[("k2", 5)] is None
    assert got[("k3", 30)] == "R20"


def test_forward(frames):
    got = _run(*frames, "forward")
    assert got[("k1", 10)] == "R10b"  # inclusive at equal ts, max tb
    assert got[("k1", 25)] == "R30"
    assert got[("k1", 40)] is None  # nothing at or after 40 for k1
    assert got[("k2", 5)] is None
    assert got[("k3", 30)] == "R40"


def test_nearest(frames):
    got = _run(*frames, "nearest")
    assert got[("k1", 10)] == "R10b"  # distance 0
    assert got[("k1", 25)] == "R30"  # |25-10|=15 > |30-25|=5
    assert got[("k1", 40)] == "R30"  # only backward exists
    assert got[("k2", 5)] is None
    assert got[("k3", 30)] == "R20"  # equidistant: backward wins


def test_bad_direction_rejected(frames):
    with pytest.raises(ValueError, match="direction"):
        _run(*frames, "sideways")


def test_nearest_single_exchange(frames):
    """Both directional fills must share one shuffle (two in-partition
    sorts), never a second exchange."""
    from dsp_spark import plans

    left, right = frames
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="t",
        right_ts="rt",
        right_payload=["pay"],
        tie_break="tb",
        direction="nearest",
    )
    plan = plans.formatted(out)
    assert plan.count("+- Exchange") == 1, plan
