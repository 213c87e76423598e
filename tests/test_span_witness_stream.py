"""Streaming gram-witness span dedup (r7 verdict ask #7): sub-document
dedup on the ingest path. Contracts pinned here:

* no false negatives vs the exact batch twin (every truly-duplicated
  anchor is flagged), false positives only ADD coverage and stay
  within the Bloom bound;
* verdicts identical across micro-batch splits (the cross-micro-batch
  state contract);
* the merged witnessed spans reproduce the batch span family: for a
  doc-id-ordered corpus, stripping stream-witnessed spans equals the
  batch dedup_span_strip of the later-arrival side.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import (
    span_witness_batch,
    span_witness_stream,
)

_G = 8


@pytest.fixture(scope="module")
def span_docs():
    """Synthetic corpus with planted cross-doc spans: a shared license
    block, a shared navigation header, and unique filler."""
    block = " ".join(f"lic{i}" for i in range(12))     # 12-token license
    nav = " ".join(f"nav{i}" for i in range(_G))       # exactly G tokens
    rows = []
    for d in range(40):
        filler = " ".join(f"w{d}_{j}" for j in range(20))
        parts = [filler]
        if d % 2 == 0:
            parts.insert(0, block)
        if d % 3 == 0:
            parts.append(nav)
        rows.append((d, " ".join(parts)))
    return rows


def _run_stream(spark, tmp_path, rows, n_files):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = tmp_path / "src"
    src.mkdir(parents=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(src / f"f{i}.parquet")
    batch_df = spark.createDataFrame(pdf)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"sw_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        span_witness_stream(stream, id_col="doc_id", text_col="text", gram=_G)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def _verdict_map(res: pd.DataFrame) -> dict:
    return {
        (int(r.doc_id), int(r.pos)): bool(r.witnessed)
        for r in res.itertuples()
    }


def test_stream_vs_exact_batch_twin(spark, tmp_path, span_docs):
    got = _verdict_map(_run_stream(spark, tmp_path, span_docs, n_files=4))
    df = spark.createDataFrame(span_docs, "doc_id long, text string")
    want = _verdict_map(
        span_witness_batch(df, id_col="doc_id", text_col="text", gram=_G).toPandas()
    )
    assert set(got) == set(want)
    # no false negatives: every batch-witnessed anchor is stream-witnessed
    missed = [k for k, v in want.items() if v and not got[k]]
    assert missed == []
    # false positives bounded: extra stream flags are Bloom collisions
    extra = [k for k, v in got.items() if v and not want[k]]
    assert len(extra) <= max(2, len(got) // 1000), extra
    # non-vacuous: the planted blocks were actually flagged
    assert sum(want.values()) > 0


def test_stream_verdicts_invariant_under_microbatch_split(
    spark, tmp_path, span_docs
):
    """1 file vs 5 files: identical verdicts — replaying the same
    arrivals through different micro-batch boundaries must not change
    any doc's span coverage (state round-trips through the store)."""
    a = _verdict_map(_run_stream(spark, tmp_path / "a", span_docs, n_files=1))
    b = _verdict_map(_run_stream(spark, tmp_path / "b", span_docs, n_files=5))
    assert a == b


def test_witness_model_matches_batch_strip_on_later_docs(spark, span_docs):
    """Close the loop to the batch span family: merging witnessed
    anchors with the SAME coverage rule the batch strip uses (anchor
    at pos covers [pos, pos+G-1]) and dropping covered tokens must
    reproduce batch strip_dup_spans EXACTLY for every doc that is not
    a first carrier of any duplicated gram; for first carriers the
    witness model keeps their copy (keep-one-witness semantics), so
    its coverage is a strict subset of the batch's boilerplate-strip
    coverage. Uses the exact batch twin's verdicts (test 1 already
    pins the stream to it), so this is deterministic — no Bloom term."""
    from dsp_spark.operators.dedup import dup_span_intervals, strip_dup_spans

    df = spark.createDataFrame(span_docs, "doc_id long, text string")
    toks = {d: [w for w in t.split() if w] for d, t in span_docs}

    verd = span_witness_batch(
        df, id_col="doc_id", text_col="text", gram=_G
    ).toPandas()
    wit_cov: dict[int, set] = {d: set() for d, _ in span_docs}
    for r in verd.itertuples():
        if r.witnessed:
            wit_cov[int(r.doc_id)].update(range(int(r.pos), int(r.pos) + _G))

    batch_cov: dict[int, set] = {d: set() for d, _ in span_docs}
    for r in dup_span_intervals(df, "doc_id", "text", gram=_G).collect():
        batch_cov[r.doc_id].update(range(r.s, r.e + 1))

    batch_text = {
        r.doc_id: r.text
        for r in strip_dup_spans(df, "doc_id", "text", gram=_G).collect()
    }

    n_equal = n_first = 0
    for d, _t in span_docs:
        # witness coverage never exceeds the batch audit's coverage
        assert wit_cov[d] <= batch_cov[d], d
        wit_text = " ".join(
            t for i, t in enumerate(toks[d], start=1) if i not in wit_cov[d]
        )
        if wit_cov[d] == batch_cov[d]:
            # pure later-arrival: the two strips agree byte-for-byte
            assert wit_text == batch_text[d], d
            n_equal += 1
        else:
            # first carrier: it keeps tokens the batch strip removes
            assert len(wit_text.split()) > len(batch_text[d].split()), d
            n_first += 1
    # the planted corpus exercises BOTH classes
    assert n_equal > 0 and n_first > 0
