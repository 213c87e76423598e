#!/usr/bin/env python
"""Generate SCALE.md: plan-derived scale metrics for every catalog entry.

For each query: number of exchanges (shuffles + broadcasts), whether
dimension joins broadcast, whether self-join sides reuse one exchange,
and whether any Cartesian product appears (must never). Run:

    python tools/scale_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dsp_spark import catalog, plans
    from dsp_spark.session import get_session
    from tests.test_plans import ALLOWED_GLOBAL_WINDOWS

    spark = get_session("scale-report")
    rows = []
    stale_allowlist: dict[str, tuple[int, int]] = {}
    # an allowlist key for a deleted/renamed entry is the canonical
    # stale case — the loop below never visits it, so flag it up front
    for name in ALLOWED_GLOBAL_WINDOWS:
        if name not in catalog.entries():
            stale_allowlist[name] = (-1, ALLOWED_GLOBAL_WINDOWS[name])
    for name, e in sorted(catalog.entries().items()):
        df = e.fn(spark, sf_dir)
        plan = plans.formatted(df)
        n_global = len(plans.unpartitioned_windows(plan))
        allowed = ALLOWED_GLOBAL_WINDOWS.get(name, 0)
        if name in ALLOWED_GLOBAL_WINDOWS and n_global != allowed:
            # the allowlist must stay EXACT: a lower count means a stale
            # entry that would mask a future regression up to `allowed`
            stale_allowlist[name] = (n_global, allowed)
        if n_global == 0:
            gw = ""
        elif n_global <= allowed:
            gw = f"{n_global} (bounded)"
        else:
            gw = f"{n_global} UNBOUNDED"
        rows.append(
            (
                name,
                plans.count_exchanges(df),
                "y" if "BroadcastHashJoin" in plan else "",
                "y" if "ReusedExchange" in plan else "",
                "CARTESIAN" if "CartesianProduct" in plan else "",
                gw,
                len(plans.whole_stage_codegen_ids(df)),
            )
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md")
    with open(out, "w") as f:
        f.write(
            "# SCALE — plan-derived shuffle inventory (auto-generated)\n\n"
            f"`python tools/scale_report.py` at `{sf_dir}`. Exchanges count\n"
            "every Exchange node (shuffle or broadcast) in the final plan;\n"
            "`reuse` marks self-join sides sharing one exchange; a Cartesian\n"
            "product would be listed by name (none may appear — also asserted\n"
            "in tests/test_plans.py). `global window` lists unpartitioned\n"
            "(single-partition) Window nodes: `(bounded)` means every one is\n"
            "on the audited bounded-cardinality allowlist\n"
            "(tests/test_plans.py ALLOWED_GLOBAL_WINDOWS — year/day/dictionary\n"
            "grain or the ≤64-row bucket-offset table of the two-phase prefix\n"
            "ops); `UNBOUNDED` would be a data-grain single-task window, a\n"
            "scale bug the same test fails on. Shuffle counts are the\n"
            "invariant that survives a 1000x scale-up; row counts are not.\n\n"
            "| entry | exchanges | bcast join | reuse | cartesian | global window | codegen stages |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]} | {r[6]} |\n"
            )
        total = sum(r[1] for r in rows)
        n_cartesian = sum(1 for r in rows if r[4])
        n_unbounded = sum(1 for r in rows if "UNBOUNDED" in r[5])
        f.write(
            f"\n{len(rows)} entries, {total} exchanges total; "
            f"{n_cartesian} Cartesian products; "
            f"{n_unbounded} unbounded global windows.\n"
        )
    if n_cartesian or n_unbounded or stale_allowlist:
        print(
            f"ERROR: {n_cartesian} Cartesian products, "
            f"{n_unbounded} unbounded global windows in plans"
            + (
                f", stale allowlist entries (found != allowed): {stale_allowlist}"
                if stale_allowlist
                else ""
            ),
            file=sys.stderr,
        )
        spark.stop()
        return 1
    print(f"wrote {out}: {len(rows)} entries")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
