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
