"""PLAN_LOCK gate semantics (tools/scale_report.compare_lock).

The lock is the machine check that a refactor can't silently add a
shuffle, a data-grain global window, or — new in r9 — an extra file
scan ("fewer corpus passes wins" made enforceable)."""

from __future__ import annotations

from tools.scale_report import compare_lock


def _e(exchanges=1, global_windows=0, scans=1, **kw):
    return {"exchanges": exchanges, "global_windows": global_windows,
            "scans": scans, "bcast": False, **kw}


def test_scan_increase_is_a_regression():
    old = {"q": _e(scans=1)}
    new = {"q": _e(scans=2)}
    assert compare_lock(old, new) == ["q: scans 1 -> 2"]


def test_scan_decrease_and_equal_pass():
    old = {"q": _e(scans=3)}
    assert compare_lock(old, {"q": _e(scans=2)}) == []
    assert compare_lock(old, {"q": _e(scans=3)}) == []


def test_pre_r9_lock_without_scans_key_baselines():
    """Locks written before the scans column exist must not crash or
    flag — the first regenerate baselines the new counter."""
    old = {"q": {"exchanges": 1, "global_windows": 0, "bcast": False}}
    assert compare_lock(old, {"q": _e(scans=7)}) == []


def test_exchange_and_window_increases_still_flagged():
    old = {"q": _e(exchanges=2, global_windows=0)}
    new = {"q": _e(exchanges=3, global_windows=1)}
    regs = compare_lock(old, new)
    assert "q: exchanges 2 -> 3" in regs
    assert any("global windows 0 -> 1" in r for r in regs)


def test_new_entry_baselines_itself():
    assert compare_lock({}, {"new_q": _e(scans=9, exchanges=9)}) == []
