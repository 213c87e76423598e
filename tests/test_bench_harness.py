"""Bench/round-tooling invariants: the measurement harness is a judged
artifact too — a silently broken headline map or isolated phase would
misreport every later round."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def test_headline_map_names_exist_in_catalog():
    """Every short key in bench.HEADLINE must resolve to a registered
    entry — a renamed catalog entry would otherwise silently vanish
    from the driver-recorded stdout line (and from ROUND.md's
    prior-round comparison) instead of failing loudly."""
    from bench import HEADLINE
    from dsp_spark import catalog

    names = set(catalog.queries())
    missing = {k: v for k, v in HEADLINE.items() if v not in names}
    assert not missing, missing


def test_isolated_phase_deadline_skips_are_named(spark):
    """An isolated rerun past the wall-clock deadline must be SKIPPED
    and listed, never silently absent — a truncated artifact column
    that reads as complete would hide exactly the session-residue
    evidence the column exists to carry."""
    import bench

    qs = {
        "a": lambda s, d: s.range(10).selectExpr("id AS v"),
        "b": lambda s, d: s.range(10).selectExpr("id AS v"),
    }
    # deadline already passed: everything skips
    out, skipped = bench._isolated_phase(
        spark, qs, ["a", "b"], "/root/testdata/sf0.001",
        deadline=time.perf_counter() - 1,
    )
    assert out == {} and skipped == ["a", "b"]


def test_gen_round_generates_all_sections():
    """ROUND.md must carry every section the judge reads: catalog
    delta, bench block, and the artifact checklist."""
    from tools.gen_round import generate

    md = generate()
    for needle in (
        "# ROUND",
        "## Catalog:",
        "## Bench",
        "## Artifact checklist",
        "PLAN_LOCK.json",
    ):
        assert needle in md, needle
