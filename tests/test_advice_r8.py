"""Round-8 advisor findings, each pinned by a test so it can't silently
regress: negative-value rejection parity in quantiles_loghist_by_key,
the BPE oracle's empty-merge-round passthrough, content-aware IVF index
fingerprints, and pre-gate rename classification."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from dsp_spark import catalog


def _write_events(tmp_path, values):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(values)),
            "event_type": ["pay"] * len(values),
            "value": values,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_loghist_negative_raises_on_spark(spark, tmp_path):
    """A negative value must raise loudly (mirroring the streaming
    _qh_bin ValueError), never silently land in bin 0 — silent
    placement would break the pinned batch/stream parity with wrong
    quantiles instead of a visible failure."""
    sf = _write_events(tmp_path, [10.0, -3.5, 2.0])
    fn = catalog.queries()["quantiles_loghist_by_key"]
    with pytest.raises(Exception, match="non-negative"):
        fn(spark, sf).collect()


def test_loghist_negative_raises_on_oracle(tmp_path):
    """The DuckDB oracle carries the SAME contract via error() — the
    two engines must agree on rejection, not just on results."""
    sf = _write_events(tmp_path, [10.0, -3.5, 2.0])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    sql = catalog.oracle_sql()["quantiles_loghist_by_key"]
    with pytest.raises(Exception, match="non-negative"):
        con.execute(sql).fetchall()
    con.close()


def test_loghist_nonnegative_still_matches(spark, tmp_path):
    """The guard must be free on the valid domain: Spark and DuckDB
    still agree exactly on an all-non-negative corpus."""
    from tests._compare import assert_results_equal

    sf = _write_events(tmp_path, [10.0, 0.0, 2.0, 700.25, 3.17, 2.0])
    got = catalog.queries()["quantiles_loghist_by_key"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(
        catalog.oracle_sql()["quantiles_loghist_by_key"]
    ).fetchdf()
    con.close()
    assert_results_equal(got, want, "quantiles_loghist_by_key")


def _write_docs(tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "source": ["s0"] * len(texts),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_oracle_empty_round_passes_through(spark, tmp_path):
    """Degenerate corpus with ONE learnable merge: the Spark trainer
    breaks out of the loop after round 1; the oracle's LEFT JOIN ON
    TRUE must pass s1 through rounds 2..K unchanged. The old CROSS
    JOIN emptied every later s{r}, reporting tokens_after=0 for every
    doc — a latent oracle divergence this corpus now pins."""
    from tests._compare import assert_results_equal

    # every doc is exactly "a b": one merge (a,b) is learnable, after
    # which each doc is a single token and no further pair exists
    sf = _write_docs(tmp_path, ["a b", "a b", "a b"])
    for name in ("bpe_train_merges", "bpe_encode_stats"):
        got = catalog.queries()[name](spark, sf).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.execute(catalog.oracle_sql()[name]).fetchdf()
        con.close()
        assert_results_equal(got, want, name)
        if name == "bpe_encode_stats":
            # the regression signature: tokens_after must NOT be 0
            assert (got["tokens_after"] > 0).all()


def test_ivf_fingerprint_is_content_aware(tmp_path):
    """Same path, same size, same truncated-seconds mtime, different
    bytes => DIFFERENT fingerprint (the parquet footer digest): a
    same-second same-size regeneration must not serve a stale index."""
    from dsp_spark.queries.similarity import _ivf_fingerprint

    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"A" * 4096)
    st = os.stat(p)
    fp1 = _ivf_fingerprint(str(tmp_path))
    p.write_bytes(b"A" * 4095 + b"B")  # same size, different content
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # freeze mtime
    fp2 = _ivf_fingerprint(str(tmp_path))
    assert fp1 != fp2

    # directory-shaped parquet: an in-place part-file rewrite that
    # does not bump the DIRECTORY mtime still changes the fingerprint
    d = tmp_path / "dir_sf" / "embeddings.parquet"
    d.mkdir(parents=True)
    part = d / "part-0.parquet"
    part.write_bytes(b"X" * 128)
    dst = os.stat(d)
    fp3 = _ivf_fingerprint(str(tmp_path / "dir_sf"))
    part.write_bytes(b"Y" * 128)
    os.utime(d, ns=(dst.st_atime_ns, dst.st_mtime_ns))
    fp4 = _ivf_fingerprint(str(tmp_path / "dir_sf"))
    assert fp3 != fp4


def test_pre_gate_classifies_renamed_artifacts():
    """'R  old -> new' porcelain lines must match the artifact globs on
    BOTH sides — a renamed round artifact escaping to a warning would
    bypass the hard hygiene failure the judge relies on."""
    from tools.pre_gate import classify_porcelain

    dirty, arts = classify_porcelain(
        [
            "R  BENCH_r07.json -> attic/BENCH_r07.json",
            "R  notes.txt -> docs/notes.txt",
            " M BENCH_FULL_r11.json",
            "?? CORRECTNESS_r08.json",
            " M SCALE.md",
            " M dsp_spark/catalog.py",
        ]
    )
    assert "BENCH_r07.json" in arts
    assert "BENCH_FULL_r11.json" in arts
    assert "CORRECTNESS_r08.json" in arts
    # SCALE.md is handled by its own check; source dirt and the
    # non-artifact rename stay warnings
    assert any("notes.txt" in l for l in dirty)
    assert any("catalog.py" in l for l in dirty)
    assert not any("SCALE.md" in l for l in dirty)
