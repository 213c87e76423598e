"""Regression pins for the round-12 ADVICE findings (fixed in r13).

Two findings, two pins:

1. bench.py — ``isolated_set_rule`` (including the recorded round that
   _snapshot_bench keys its mint on) only reached disk via the
   _write_full at the END of the try block, so a phase-level failure
   or a driver kill mid-isolated-phase left the pre-try bench_full on
   disk with no recorded round and gen_round then refused to mint the
   round's gate snapshot. The rule is now written BEFORE
   _isolated_phase runs (test_isolated_set_rule_persisted_before_phase
   pins the source ordering — the write sits between the rule
   assignment and the phase call inside main()).
2. tools/gen_round.py — _snapshot_bench treated an
   exists-but-unparseable target like an absent one and fell through
   to the unconditional write, silently overwriting a committed file
   (test_snapshot_bench_refuses_unparseable_target).
"""

from __future__ import annotations

import json
import os
import sys

# derive the repo root from this file, like the rest of the suite —
# a hardcoded absolute path breaks if the checkout moves (r13 advisor)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_isolated_set_rule_persisted_before_phase(monkeypatch):
    """The recorded round must hit disk before the isolated phase can
    fail: behavioral pin (r13 advisor — the old source-text substring
    pin broke on unrelated edits and could pass vacuously). The block
    is now the real function main() calls (_run_isolated_block);
    inject a phase failure and assert the last _write_full BEFORE the
    failure already carried isolated_set_rule."""
    import bench

    written: list[dict] = []

    def capture(full):
        written.append(json.loads(json.dumps(full)))

    def boom(*a, **k):
        raise RuntimeError("phase failure injected by test")

    monkeypatch.setattr(bench, "_write_full", capture)
    monkeypatch.setattr(bench, "_isolated_phase", boom)
    monkeypatch.setattr(bench, "_current_round", lambda: 7)
    timings = {"q": 0.1}
    full = {"queries": dict(timings)}
    try:
        bench._run_isolated_block(
            None, {}, full, timings, {"probe_spark_sec": 0.6}, "x", 0.0
        )
    except RuntimeError:
        pass
    assert written and "isolated_set_rule" in written[-1], (
        "isolated_set_rule must be persisted before _isolated_phase "
        "runs, or a phase failure strands bench_full.json without a "
        "recorded round"
    )
    assert written[-1]["isolated_set_rule"]["round"] == 7


def test_snapshot_bench_refuses_unparseable_target(tmp_path, monkeypatch):
    """An existing-but-corrupt BENCH_FULL_r{n}.json is NOT absent: the
    mint must refuse instead of silently overwriting a committed file."""
    import tools.gen_round as gr

    monkeypatch.setattr(gr, "ROOT", str(tmp_path))
    (tmp_path / "bench_full.json").write_text(
        json.dumps({"value": 9, "isolated_set_rule": {"round": 7}})
    )
    target = tmp_path / "BENCH_FULL_r07.json"
    target.write_text("{ not json !!!")
    gr._snapshot_bench(7)
    assert target.read_text() == "{ not json !!!", (
        "unparseable snapshot target was overwritten — it must be "
        "inspected/deleted deliberately"
    )
