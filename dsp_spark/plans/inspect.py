"""Physical-plan inspection helpers — the engine's scale guardrails.

The reference has no optimizer to audit (SURVEY.md §4.1); on Spark the
optimizer IS the engine, so these helpers make plan quality testable:
tests assert that filters reach the parquet scan, small dims broadcast,
self-joins reuse one exchange, and hot paths stay inside whole-stage
codegen. A plan regression (e.g. a new column defeating pushdown, a
broadcast silently turning into a 100 TB shuffle) then fails CI instead
of surfacing as a cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    """The `.explain("formatted")` text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted(df)):
        cols = {
            f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()
        }
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted(df) or "BroadcastNestedLoopJoin" in formatted(df)


def has_reused_exchange(df: DataFrame) -> bool:
    """True when a self-join's two sides share one shuffle (computed once)."""
    return "ReusedExchange" in _final_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT exchanges (shuffles/broadcasts) in the plan;
    reused exchanges are not double-counted."""
    plan = formatted(df)
    return len(re.findall(r"\(\d+\) (?:Exchange|BroadcastExchange)\b", plan))


def count_scans(df: DataFrame) -> int:
    """Number of FILE-scan nodes (parquet/csv/json/orc/text, v1 `Scan`
    or v2 `BatchScan`) in the plan — a reused subtree behind a
    ReusedExchange counts once, matching what actually reads bytes.

    This is the machine check for the "fewer corpus passes wins"
    criterion BENCH_NOTES adjudicates plan trades by: at 100 TB a
    second scan of the corpus costs more than an extra exchange of an
    aggregated intermediate, so an unexplained scan-count increase is
    a plan regression (enforced via PLAN_LOCK.json in
    tools/scale_report.py)."""
    plan = formatted(df)
    return len(
        re.findall(
            r"\(\d+\) (?:Scan|BatchScan) (?:parquet|csv|json|orc|text)\b",
            plan,
        )
    )


def unpartitioned_windows(plan_or_df: DataFrame | str) -> list[str]:
    """Argument strings of Window nodes with an EMPTY partition spec.

    An unpartitioned window executes as `Exchange SinglePartition` +
    one task holding every row — the classic silent scale-killer
    (Spark logs `WindowExec: No Partition Defined`). A formatted-plan
    Window node prints `Arguments: [exprs], [partitionSpec],
    [orderSpec]` with empty specs omitted, so two top-level bracket
    groups mean either "partitioned, no order" (fine — e.g.
    min-over-partition) or "ordered, no partition" (the scale bug);
    they're told apart by the `ASC NULLS`/`DESC NULLS` sort markers
    only an order spec carries. One group means no partition and no
    order — also single-partition. Bracket-depth scanning keeps
    brackets nested inside expressions from miscounting. Bounded
    cases (year-grain aggregates, bucket-count offset tables) must be
    explicitly allowlisted in tests."""
    text = (
        plan_or_df if isinstance(plan_or_df, str) else formatted(plan_or_df)
    )
    out = []
    for m in re.finditer(r"\(\d+\) Window\s*\n[^\n]*\nArguments: ([^\n]*)", text):
        args = m.group(1)
        groups: list[str] = []
        depth = start = 0
        for i, ch in enumerate(args):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(args[start + 1 : i])
        if len(groups) >= 3:
            continue  # [exprs], [partition], [order]
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC) NULLS", groups[1]
        ):
            continue  # [exprs], [partition] — partitioned, unordered
        out.append(args)
    return out


def whole_stage_codegen_ids(df: DataFrame) -> set[str]:
    """Codegen stage ids present — wider spans mean more of the plan is
    compiled into one JVM loop. Executes the plan (AQE only annotates
    codegen in the final plan) — call on small-SF inputs."""
    text = _final_plan(df)
    return set(re.findall(r"\*\((\d+)\)", text))


def _final_plan(df: DataFrame) -> str:
    """Execute the plan so AQE finalizes it, then return the live text
    (ReusedExchange often only appears in the adaptive final plan).
    Runs a collect on this exact Dataset — call on small-SF inputs."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()
