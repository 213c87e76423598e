"""Invariants for corpus_token_budget_select: admission rule, ordering,
and prefix-closure (the selection is exactly the best-quality prefix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.queries.text import corpus_token_budget_select, text_quality_score

BUDGET = 10_000


def test_budget_selection_is_best_quality_prefix(spark, sf_dir):
    sel = corpus_token_budget_select(spark, sf_dir).collect()
    assert sel, "selection must be non-empty"

    # admission rule: every kept doc STARTS within budget
    for r in sel:
        assert r["cum_tokens"] - r["n_tokens"] < BUDGET

    # the selection is a prefix of the (quality desc, doc_id) order:
    # cum_tokens increases by exactly n_tokens along that order
    ordered = sorted(sel, key=lambda r: (-r["quality"], r["doc_id"]))
    run = 0
    for r in ordered:
        run += r["n_tokens"]
        assert r["cum_tokens"] == run

    # nothing better-ranked was skipped: the worst kept row outranks
    # (or ties) every excluded doc under the same quality definition
    kept_ids = {r["doc_id"] for r in sel}
    worst = min((r["quality"], -r["doc_id"]) for r in sel)
    excluded = [
        r
        for r in text_quality_score(spark, sf_dir)
        .select("doc_id", "quality")
        .collect()
        if r["doc_id"] not in kept_ids
    ]
    for r in excluded:
        assert (r["quality"], -r["doc_id"]) <= worst
