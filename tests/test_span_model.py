"""dup_span_intervals vs a sequential Python reference on seeded
random corpora: the distributed gram-anchor + gaps-and-islands
construction (corpus-wide explode, two gram-keyed exchanges, per-doc
windows) must equal the sequential definition — anchors are G-gram
start positions whose gram occurs in >= min_docs docs; anchor coverage
intervals [a, a+G-1] merge while OVERLAPPING (next start <= current
end). Note the deliberate subtlety pinned here: two duplicated runs
that are merely ADJACENT in coverage (run A ends at p, run B starts at
p+1) stay separate intervals — they only merge if the combined
sequence is itself duplicated, in which case the bridging gram is a
dup anchor and the islands connect. The DuckDB oracle checks a
same-shaped SQL twin; this checks the merge semantics against a
sequential reference."""

from __future__ import annotations

import random

from dsp_spark.operators.dedup import dup_span_intervals

G = 4


def _ref_intervals(docs: dict[int, list[str]], g: int, min_docs: int):
    """Sequential reference: per doc, merge overlapping dup-gram anchor
    coverage [a, a+g-1] (1-based inclusive)."""
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for did, toks in docs.items():
        for i in range(len(toks) - g + 1):
            gram_docs[tuple(toks[i : i + g])].add(did)
    dup = {k for k, v in gram_docs.items() if len(v) >= min_docs}
    out = set()
    for did, toks in docs.items():
        anchors = [
            i + 1
            for i in range(len(toks) - g + 1)
            if tuple(toks[i : i + g]) in dup
        ]
        s = e = None
        for a in anchors:
            if s is None:
                s, e = a, a + g - 1
            elif a <= e:  # overlap: same island
                e = max(e, a + g - 1)
            else:  # gap OR mere adjacency: new island
                out.add((did, s, e))
                s, e = a, a + g - 1
        if s is not None:
            out.add((did, s, e))
    return out


def _check(spark, docs: dict[int, list[str]], label: str):
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs.items()],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.s, r.e)
        for r in dup_span_intervals(df, "doc_id", "text", gram=G).collect()
    }
    want = _ref_intervals(docs, G, 2)
    assert got == want, f"{label}: {got ^ want}"
    return want


def test_span_intervals_match_sequential_reference(spark):
    for seed in (3, 19, 57):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> collisions
        docs = {
            did: [rng.choice(vocab) for _ in range(rng.randint(2, 40))]
            for did in range(12)
        }
        # plant one exact boilerplate block in several docs so maximal
        # multi-anchor islands are guaranteed, not left to chance
        block = [rng.choice(vocab) for _ in range(G + 3)]
        for did in (1, 4, 7):
            ins = rng.randint(0, len(docs[did]))
            docs[did] = docs[did][:ins] + block + docs[did][ins:]
        want = _check(spark, docs, f"seed {seed}")
        assert want, f"seed {seed}: degenerate case (no spans planted)"


def test_adjacent_distinct_runs_stay_separate(spark):
    """Doc 0 carries run A immediately followed by run B; A is shared
    with doc 1, B with doc 2, but A+B as one sequence exists nowhere
    else — the two intervals must NOT merge (the bridging grams are
    unique to doc 0). A third doc pair sharing the CONCATENATION must
    merge into one interval."""
    a = ["a1", "a2", "a3", "a4"]
    b = ["b1", "b2", "b3", "b4"]
    docs = {
        0: a + b,  # adjacent distinct runs
        1: ["x1", "x2"] + a + ["x3"],
        2: ["y1"] + b + ["y2", "y3"],
        # the concatenation shared verbatim -> one merged island
        3: ["z1"] + a + b + ["z2"],
        4: ["q1", "q2"] + a + b,
    }
    want = _check(spark, docs, "adjacency")
    doc0 = sorted((s, e) for d, s, e in want if d == 0)
    # doc 0 shares a+b with docs 3/4, so its grams bridge: one island
    assert doc0 == [(1, 8)]
    # but doc 1 and doc 2 carry only their own half
    assert sorted((s, e) for d, s, e in want if d == 1) == [(3, 6)]
    assert sorted((s, e) for d, s, e in want if d == 2) == [(2, 5)]

    # now remove the concatenation witnesses: doc 0's halves split
    docs2 = {k: v for k, v in docs.items() if k in (0, 1, 2)}
    want2 = _check(spark, docs2, "adjacency-split")
    assert sorted((s, e) for d, s, e in want2 if d == 0) == [(1, 4), (5, 8)]
