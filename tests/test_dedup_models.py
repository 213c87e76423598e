"""Model checks for the round-4 dedup operators: containment and
winnowing must match brute-force Python references on adversarial
small inputs (tiny alphabet → forced collisions, texts shorter than
the gram/window sizes, exact duplicates)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dsp_spark.operators import dedup as dd
from dsp_spark.queries.dedup import _WINNOW_K, _WINNOW_W

TEXT = st.text(alphabet="ab ", min_size=0, max_size=24)


def _model_winnow(text: str, k: int = _WINNOW_K, w: int = _WINNOW_W) -> set[int]:
    """Pure-Python winnowing twin of the catalog entry's expressions.

    Mirrors Spark's clamping semantics exactly: token `slice` returns a
    short gram near the end of the list, `sequence(1, greatest(n,1))`
    always yields at least one position, and the window slice truncates
    at the array end. Tokenization is the same regex split Spark uses
    (leading whitespace produces an empty first token; empty text is a
    single empty token).
    """
    import re

    tk = re.split(r"\s+", text)
    n_pos = max(len(tk) - (k - 1), 1)
    hs = [
        int(
            hashlib.md5(" ".join(tk[i : i + k]).encode()).hexdigest()[:7], 16
        )
        for i in range(n_pos)
    ]
    n_win = max(len(hs) - (w - 1), 1)
    return {min(hs[j : j + w]) for j in range(n_win)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_winnowing_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t_) for i, t_ in enumerate(texts)], "doc_id bigint, text string"
    )
    # drive the catalog entry's expressions directly on the tiny frame
    from pyspark.sql import functions as F

    h = F.expr(
        f"transform(sequence(1, greatest(size(tk) - {_WINNOW_K - 1}, 1)), "
        f"i -> CAST(conv(substring(md5(concat_ws(' ', slice(tk, i, {_WINNOW_K}))), 1, 7), 16, 10) AS BIGINT))"
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(h) - {_WINNOW_W - 1}, 1)), "
        f"j -> array_min(slice(h, j, {_WINNOW_W}))))"
    )
    got = {}
    for r in (
        df.select("doc_id", F.expr("split(text, '\\\\s+')").alias("tk"))
        .select("doc_id", h.alias("h"))
        .select("doc_id", F.explode(fps).alias("fp"))
        .collect()
    ):
        got.setdefault(r.doc_id, set()).add(r.fp)
    exp = {i: _model_winnow(t_) for i, t_ in enumerate(texts)}
    assert got == exp


def test_containment_gram3_matches_python_model(spark):
    """3-gram mode: containment must key on shared token RUNS. A doc
    sharing all its vocabulary but no 3-token run must NOT pair."""
    rows = [
        (0, "s", "a b c d e f g h"),       # base
        (1, "s", "a b c d e x y z"),        # shares the run "a b c d e"
        (2, "s", "h g f e d c b a"),        # same vocab, reversed: no run
        (3, "s", "a b c d e f g h i j"),    # superset run
        (4, "s", "a b"),                    # shorter than gram: no runs
        (5, "s", "a b"),                    # identical short doc
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, text string")
    got = {
        (r.id_a, r.id_b): (r.n_common, r.size_a)
        for r in dd.containment_pairs(
            df, "doc_id", "text", block_col="src", threshold=0.5, gram=3
        ).collect()
    }

    def grams(s, k=3):
        tk = s.split()
        if len(tk) < k:
            # no fingerprintable run exists — the doc participates in
            # no containment pair (collapsing to one gram made every
            # trivially short doc "contain" every other one)
            return set()
        return {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}

    exp = {}
    gs = {i: grams(txt) for i, _, txt in rows}
    for ida, sa in gs.items():
        for idb, sb in gs.items():
            if ida == idb or not sa:
                continue
            inter = len(sa & sb)
            if inter / len(sa) >= 0.5:
                exp[(ida, idb)] = (inter, len(sa))
    assert got == exp
    # the reversed-vocab doc pairs with nobody in either direction
    assert not any(2 in pair for pair in got)
    # the sub-gram docs pair with nobody, not even each other
    assert not any(4 in pair or 5 in pair for pair in got)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]), st.text(alphabet="ab ", min_size=1, max_size=16)),
        min_size=2,
        max_size=6,
    )
)
def test_containment_matches_python_model(spark, rows):
    data = [(i, blk, txt) for i, (blk, txt) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id bigint, src string, text string")
    got = {
        (r.id_a, r.id_b): (r.n_common, r.size_a)
        for r in dd.containment_pairs(
            df, "doc_id", "text", block_col="src", threshold=0.8
        ).collect()
    }
    # the operator tokenizes via the shared regex split; empty-string
    # tokens from leading whitespace are part of its contract, so the
    # model mirrors Spark's split here
    from pyspark.sql import functions as F
    from dsp_spark.operators import textops

    toks = {
        r.doc_id: set(r.tk)
        for r in df.select(
            "doc_id", F.array_distinct(textops.tokens("text")).alias("tk")
        ).collect()
    }
    blocks = {d[0]: d[1] for d in data}
    exp = {}
    for ida, sa in toks.items():
        for idb, sb in toks.items():
            if ida == idb or blocks[ida] != blocks[idb] or not sa:
                continue
            inter = len(sa & sb)
            if inter / len(sa) >= 0.8:
                exp[(ida, idb)] = (inter, len(sa))
    assert got == exp


def test_lsh_cross_pairs_consistent_with_self_join(spark, sf_dir):
    """The asymmetric (broadcast-probe) candidate generator must find
    exactly the self-join generator's candidates restricted to
    cross-split pairs — same signatures, same band layout, different
    join strategy only."""
    from pyspark.sql import functions as F

    from dsp_spark.session import read_table

    d = read_table(spark, sf_dir, "documents")
    is_eval = F.substring("source", 4, 10).cast("int") >= 10
    split = {
        r.doc_id: r.ev
        for r in d.select("doc_id", is_eval.alias("ev")).collect()
    }
    self_pairs = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            d, "doc_id", "text", n_hashes=8, bands=2, k=5
        ).collect()
    }
    want = {
        # orient as (train, eval) regardless of id order
        (a, b) if split[b] else (b, a)
        for a, b in self_pairs
        if split[a] != split[b]
    }
    got = {
        (r.id_a, r.id_b)
        for r in dd.lsh_cross_pairs(
            d.filter(~is_eval),
            d.filter(is_eval),
            "doc_id",
            "text",
            n_hashes=8,
            bands=2,
            k=5,
        ).collect()
    }
    assert got == want
    assert got  # non-vacuous: the corpus does contain cross-split dups


def test_token_gram_hashes_cross_engine_identical(spark):
    """The Spark and DuckDB token-3-gram hash expressions must produce
    IDENTICAL hash sets — the decontam entry's cross-engine candidate
    parity rides on minhash identity, which needs identical base
    hashes (a stringified-list join like DuckDB's concat_ws-on-list
    silently breaks this while keeping within-engine Jaccard green)."""
    import duckdb
    from pyspark.sql import functions as F

    from dsp_spark.operators import textops

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",  # shorter than the gram: empty set on both engines
        "a  b\tc\nd a  b\tc",  # runs of mixed whitespace + repeats
        "x y z x y z x y z",
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r.i: sorted(r.hs)
        for r in sdf.select("i", textops.tokens("text").alias("__tk"))
        .select("i", textops.token_gram_hashes("__tk", 3).alias("hs"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts)) +
                ") v(i, text)")
    want = {
        row[0]: sorted(row[1])
        for row in con.execute(
            "SELECT i, "
            + textops.token_gram_hashes_sql(3)
            + " FROM (SELECT i, string_split_regex(text, '\\s+') AS tk0 FROM t)"
        ).fetchall()
    }
    assert got == want


def test_shingle_and_minhash_sql_mirrors_cross_engine_identical(spark):
    """Direct identity check of the char-shingle base hashes AND the
    affine minhash permutations across engines — the dedup family's
    entry oracles exercise these only transitively, and the concat_ws
    incident proved transitive coverage can stay green while the
    underlying hash values silently diverge."""
    import duckdb
    from pyspark.sql import functions as F

    from dsp_spark.operators import textops

    texts = [
        "the quick brown fox",
        "abc",          # shorter than the 5-gram: single clamped shingle
        "",             # empty text
        "aaaaaaaaaa",   # one distinct shingle from many positions
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r.i: (sorted(r.hs), r.mh0, r.mh1, r.mh2)
        for r in sdf.select(
            "i", textops.shingle_hashes("text", 5).alias("_hs")
        )
        .select(
            "i",
            F.col("_hs").alias("hs"),
            *[
                textops.minhash_from_hashes("_hs", s).alias(f"mh{s}")
                for s in range(3)
            ],
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") v(i, text)"
    )
    want = {
        row[0]: (sorted(row[1]), row[2], row[3], row[4])
        for row in con.execute(
            "SELECT i, hs, "
            + ", ".join(
                textops.minhash_from_hashes_sql(s) for s in range(3)
            )
            + f" FROM (SELECT i, {textops.shingle_hashes_sql(5)} AS hs FROM t)"
        ).fetchall()
    }
    assert got == want


def test_dup_span_fraction_matches_python_model(spark, sf_dir):
    """dedup_dup_span_fraction vs a brute-force model: collect every
    8-token gram, keep grams seen in >=2 distinct docs, mark the 8
    positions each occurrence covers, and count marked positions per
    doc — the merged-interval window math must equal direct marking."""
    from collections import defaultdict

    from dsp_spark.queries.dedup import _SPAN_G, dedup_dup_span_fraction
    from dsp_spark.session import read_table

    G = _SPAN_G
    rows = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [w for w in r.text.split() if w] for r in rows}
    gram_docs = defaultdict(set)
    for d, l in toks.items():
        for i in range(len(l) - G + 1):
            gram_docs[" ".join(l[i : i + G])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, l in toks.items():
        covered = set()
        for i in range(len(l) - G + 1):
            if " ".join(l[i : i + G]) in dup:
                covered.update(range(i, i + G))
        n = len(l)
        want[d] = (n, len(covered), 0.0 if n == 0 else len(covered) / n)

    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_frac)
        for r in dedup_dup_span_fraction(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert got[d][1] == want[d][1], (d, got[d], want[d])
        assert abs(got[d][2] - want[d][2]) < 1e-12, (d, got[d], want[d])
    # non-vacuous: the synthetic corpus must actually contain dup spans
    assert any(v[1] > 0 for v in want.values())


def test_span_strip_matches_python_model(spark, sf_dir):
    """dedup_span_strip vs brute force: mark every position covered by
    a cross-doc duplicated 8-gram, drop marked tokens, and the md5 of
    the kept token stream (space-joined) must match per doc — a
    one-token drift anywhere fails. Also: stripping removes EXACTLY
    the tokens dedup_dup_span_fraction counts (measure == apply)."""
    import hashlib
    from collections import defaultdict

    from dsp_spark.queries.dedup import (
        _SPAN_G,
        dedup_dup_span_fraction,
        dedup_span_strip,
    )
    from dsp_spark.session import read_table

    G = _SPAN_G
    rows = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [w for w in r.text.split() if w] for r in rows}
    gram_docs = defaultdict(set)
    for d, l in toks.items():
        for i in range(len(l) - G + 1):
            gram_docs[" ".join(l[i : i + G])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, l in toks.items():
        covered = set()
        for i in range(len(l) - G + 1):
            if " ".join(l[i : i + G]) in dup:
                covered.update(range(i, i + G))
        kept = [t for i, t in enumerate(l) if i not in covered]
        want[d] = (
            len(l),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.n_tokens, r.tokens_removed, r.stripped_md5)
        for r in dedup_span_strip(spark, sf_dir).collect()
    }
    assert got == want
    # measure == apply: tokens_removed equals the audit's n_dup_tokens
    frac = {
        r.doc_id: r.n_dup_tokens
        for r in dedup_dup_span_fraction(spark, sf_dir).collect()
    }
    assert {d: v[1] for d, v in got.items()} == frac
    # non-vacuous: something was actually stripped
    assert any(v[1] > 0 for v in want.values())


def test_strip_dup_spans_preserves_other_columns(spark):
    """The operator form must pass non-text columns through unchanged
    and replace the text column in place (token-grain: single-space
    joined) — the contract the curate --strip-spans stage relies on."""
    from dsp_spark.operators.dedup import strip_dup_spans

    span = "a b c d e f g h"  # exactly G=8 tokens, shared by two docs
    df = spark.createDataFrame(
        [
            (1, f"intro {span} tail1", "s0"),
            (2, f"{span} tail2 x y", "s1"),
            (3, "unique words only here now", "s2"),
        ],
        "doc_id int, text string, source string",
    )
    out = strip_dup_spans(df, "doc_id", "text", gram=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].source == "s0" and rows[1].text == "intro tail1"
    assert rows[2].text == "tail2 x y" and rows[2].tokens_removed == 8
    assert rows[3].text == "unique words only here now"
    assert rows[3].tokens_removed == 0 and rows[3].n_tokens == 5


import pytest as _pytest


@_pytest.mark.parametrize("seed", [7, 19, 83])
def test_span_strip_randomized_vs_python_model(spark, seed):
    """strip_dup_spans vs the brute-force model on randomized corpora
    (seeded): small vocab + short docs force heavy anchor overlap,
    island merging across interleaved spans, docs below G, and
    within-doc repeats — the geometry the sf corpus doesn't reach."""
    import random
    from collections import defaultdict

    from dsp_spark.operators.dedup import strip_dup_spans

    G = 8
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab => dense collisions
    docs = []
    for d in range(25):
        n = rng.randrange(0, 30)  # includes len < G and empty docs
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))

    toks = {d: [w for w in t.split() if w] for d, t in docs}
    gram_docs = defaultdict(set)
    for d, l in toks.items():
        for i in range(len(l) - G + 1):
            gram_docs[" ".join(l[i : i + G])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, l in toks.items():
        covered = set()
        for i in range(len(l) - G + 1):
            if " ".join(l[i : i + G]) in dup:
                covered.update(range(i, i + G))
        kept = [t for i, t in enumerate(l) if i not in covered]
        want[d] = (len(l), len(covered), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.tokens_removed, r.text)
        for r in strip_dup_spans(df, "doc_id", "text", gram=G).collect()
    }
    assert got == want


def test_doc_self_repeat_strip_planted(spark):
    """Planted self-repetition: a doc repeating its own 10-word segment
    keeps exactly the first occurrence; the md5 content-verifies the
    kept byte stream; a doc with no repeats round-trips unchanged."""
    import hashlib

    from dsp_spark.queries.dedup import doc_self_repeat_strip

    seg = " ".join(f"s{i}" for i in range(10))     # exactly one segment
    other = " ".join(f"o{i}" for i in range(10))
    docs = [
        (1, f"{seg} {other} {seg} {seg}"),          # segs: A B A A -> A B
        (2, f"{other} {seg}"),                      # no self-repeat
        (3, "short tail"),                          # sub-segment doc
    ]
    got = {
        r.doc_id: (r.n_segments, r.n_kept_segments, r.stripped_md5)
        for r in doc_self_repeat_strip_df(spark, docs).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1] == (4, 2, md5(f"{seg} {other}"))
    assert got[2] == (2, 2, md5(f"{other} {seg}"))
    assert got[3] == (1, 1, md5("short tail"))


def doc_self_repeat_strip_df(spark, docs):
    """Run the catalog builder against an in-memory documents table via
    a temp parquet dir (the builder reads `documents.parquet`)."""
    import tempfile

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="selfrep-")
    pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s0"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).to_parquet(f"{tmp}/documents.parquet")
    from dsp_spark.queries.dedup import doc_self_repeat_strip

    return doc_self_repeat_strip(spark, tmp)
