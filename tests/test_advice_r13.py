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
import sys

sys.path.insert(0, "/root/repo")


def test_isolated_set_rule_persisted_before_phase():
    """The recorded round must hit disk before the isolated phase can
    fail: in main()'s source, a _write_full call sits after the
    isolated_set_rule assignment and before the _isolated_phase call."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    i_rule = src.index('full["isolated_set_rule"]')
    i_phase = src.index("_isolated_phase(")
    between = src[i_rule:i_phase]
    assert "_write_full(full)" in between, (
        "isolated_set_rule must be persisted before _isolated_phase "
        "runs, or a phase failure strands bench_full.json without a "
        "recorded round"
    )


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
