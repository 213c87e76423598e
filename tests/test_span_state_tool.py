"""Persisted span-interval state (tools/dedup_state.py `spans`): the
materialize-once-read-many path for the span family. The catalog
entries (dedup_dup_span_fraction / dedup_span_strip /
dup_span_rate_by_source) stay pure functions of the input tables and
re-derive gram anchors in-plan; a release pipeline runs `spans` once
and every consumer reads the stored interval table through the SHARED
scorers (operators/dedup.py span_coverage / span_source_rollup /
strip_dup_spans(intervals=...)). This file pins that both
constructions are row-identical — the same guarantee
test_graph_cap.py pins for the persisted edge store."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_state import DEFAULTS, cmd_init, cmd_spans, read_spans

GRAM = 8  # == dsp_spark.queries.dedup._SPAN_G, the catalog pin


@pytest.fixture()
def span_state(spark, sf_dir, tmp_path):
    """An init'd state with the spans table materialized over the FULL
    documents table (span consumers need corpus-wide anchors)."""
    from dsp_spark.session import read_table

    docs_path = str(tmp_path / "docs")
    read_table(spark, sf_dir, "documents").write.parquet(docs_path)
    state = str(tmp_path / "state")
    cmd_init(spark, docs_path, state, dict(DEFAULTS))
    cmd_spans(spark, docs_path, state, GRAM)
    return state


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spans_store_matches_inplan_intervals(spark, sf_dir, span_state):
    from dsp_spark.operators import dedup as dd
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    want = dd.dup_span_intervals(docs, "doc_id", "text", gram=GRAM)
    got = read_spans(spark, span_state)
    assert _rows(got) == _rows(want)
    assert len(got.collect()) > 0  # sf0.001 documents DO share spans

    with open(os.path.join(span_state, "_meta.json")) as f:
        assert json.load(f)["span_gram"] == GRAM


def test_shared_scorers_match_catalog_entries(spark, sf_dir, span_state):
    """All three span consumers, computed FROM the persisted interval
    table through the shared scorers, equal the in-plan catalog
    entries row-for-row — measure, strip, and rollup cannot disagree
    with the persisted state."""
    from dsp_spark import catalog
    from dsp_spark.operators import dedup as dd
    from dsp_spark.session import read_table

    entries = catalog.entries()
    docs = read_table(spark, sf_dir, "documents")
    iv = read_spans(spark, span_state).localCheckpoint(eager=True)

    # measure: per-doc coverage
    got = dd.span_coverage(
        docs.select("doc_id", "text"), "doc_id", "text", iv
    )
    want = entries["dedup_dup_span_fraction"].fn(spark, sf_dir)
    assert _rows(got) == _rows(want)

    # transform: span strip off persisted intervals (same output shape
    # as the catalog entry: counts + md5 of the stripped stream)
    stripped = dd.strip_dup_spans(
        docs.select("doc_id", "text"), "doc_id", "text", intervals=iv
    ).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("tokens_removed").cast("bigint").alias("tokens_removed"),
        F.md5(F.col("text")).alias("stripped_md5"),
    )
    want = entries["dedup_span_strip"].fn(spark, sf_dir)
    assert _rows(stripped) == _rows(want)

    # rollup: per-source dashboard
    got = dd.span_source_rollup(docs, "doc_id", "text", "source", iv)
    want = entries["dup_span_rate_by_source"].fn(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_top_boilerplate_deterministic_under_partitioning(spark, sf_dir):
    """dup_span_top_boilerplate ends in a top-20 LIMIT: its row SET is
    only well-defined because the order is total (count desc, md5).
    Repartitioning the input must not change a single row."""
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    fn = catalog.entries()["dup_span_top_boilerplate"].fn
    base = _rows(fn(spark, sf_dir))
    assert base  # sf0.001 documents do share boilerplate spans

    from dsp_spark.queries.dedup import top_boilerplate

    docs = read_table(spark, sf_dir, "documents")
    for parts in (1, 17):
        got = _rows(top_boilerplate(docs.repartition(parts, "lang")))
        assert got == base, f"partitioning {parts} changed the top-20"


def test_verify_detects_stale_spans(spark, sf_dir, span_state, tmp_path):
    """An ingest after `spans` leaves the interval table built from a
    smaller corpus snapshot than the band index — verify must name it
    (new docs can create duplicated runs inside OLD docs, so stale
    intervals under-report), and re-running `spans` on the full corpus
    must clear it."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from dsp_spark.session import read_table
    from tools.dedup_state import cmd_ingest, cmd_verify

    assert cmd_verify(spark, span_state, None) == 0

    docs = read_table(spark, sf_dir, "documents")
    batch = str(tmp_path / "batch")
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]
    docs.limit(20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base_max + 1)
    ).select("doc_id", "text").write.parquet(batch)
    cmd_ingest(spark, batch, span_state)

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cmd_verify(spark, span_state, None)
    assert rc == 1 and "spans table is STALE" in buf.getvalue()

    # refresh over the full post-ingest corpus -> verify green again
    full = str(tmp_path / "full")
    read_table(spark, sf_dir, "documents").select("doc_id", "text").unionByName(
        spark.read.parquet(batch)
    ).write.parquet(full)
    from tools.dedup_state import cmd_spans

    cmd_spans(spark, full, span_state, GRAM)
    assert cmd_verify(spark, span_state, None) == 0


def test_mid_swap_crash_rolls_back_and_torn_spans_detected(
    spark, sf_dir, span_state
):
    """Crash-recovery holes the r11 review found, pinned:

    1. mid-swap crash (spans/ renamed aside, tmp not yet renamed in):
       the next command's stray sweep must ROLL BACK to the complete
       old copy, not leave the store missing;
    2. spans/ gone entirely while _meta.json still records span_corpus
       (torn refresh nothing can roll back): verify must FAIL with a
       named reason, not print OK."""
    import io
    import shutil
    from contextlib import redirect_stdout

    from tools.dedup_state import _clean_stray_tmps, cmd_verify

    spans = os.path.join(span_state, "spans")
    before = _rows(read_spans(spark, span_state))

    # 1. simulate the crash window between _write_swap's two renames
    os.rename(spans, spans + "._old")
    os.makedirs(spans + "._tmp")
    _clean_stray_tmps(span_state)
    assert os.path.isdir(spans) and not os.path.isdir(spans + "._old")
    assert not os.path.isdir(spans + "._tmp")
    assert _rows(read_spans(spark, span_state)) == before
    assert cmd_verify(spark, span_state, None) == 0

    # 2. spans store lost entirely, meta still advertises it
    shutil.rmtree(spans)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cmd_verify(spark, span_state, None)
    assert rc == 1 and "spans/ is missing" in buf.getvalue()


def test_read_spans_consumer_guards(spark, sf_dir, span_state):
    """ADVICE r11: read_spans must validate at READ time instead of
    relying on operators remembering to run `verify` — a gram mismatch
    or a stale corpus snapshot silently serves wrong coverage numbers
    to span_coverage/strip_dup_spans consumers."""
    import shutil

    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    # fresh state + matching expectations: served
    got = read_spans(
        spark, span_state, expect_gram=GRAM, expect_corpus=docs
    )
    assert got.count() > 0

    # wrong gram: refused by name
    with pytest.raises(SystemExit, match="gram"):
        read_spans(spark, span_state, expect_gram=GRAM - 4)

    # corpus mismatch (consumer holds a different doc set): refused
    with pytest.raises(SystemExit, match="STALE"):
        read_spans(spark, span_state, expect_corpus=docs.limit(5))

    # spans table gone while meta still advertises it: refused
    shutil.rmtree(os.path.join(span_state, "spans"))
    with pytest.raises(SystemExit, match="no spans table"):
        read_spans(spark, span_state)


def test_spans_rebuild_is_atomic_swap(spark, sf_dir, span_state, tmp_path):
    """Re-running `spans` (the post-ingest refresh) swaps the table in
    place — same contents for same corpus, no stray tmp/old dirs."""
    from dsp_spark.session import read_table

    before = _rows(read_spans(spark, span_state))
    docs_path = str(tmp_path / "docs2")
    read_table(spark, sf_dir, "documents").write.parquet(docs_path)
    cmd_spans(spark, docs_path, span_state, GRAM)
    assert _rows(read_spans(spark, span_state)) == before
    strays = [
        d for d in os.listdir(span_state)
        if d.startswith("spans._") or d.startswith(".tmp")
    ]
    assert strays == []
