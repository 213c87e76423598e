"""Unit tests for LLM-pipeline operators beyond what the oracle covers:
stub behavior, plan shape, recall sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsp_spark.operators import multimodal, similarity
from dsp_spark.session import read_table


def test_multimodal_unknown_type_fails_fast(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, media binary")
    with pytest.raises(ValueError, match="unknown media_type"):
        multimodal.extract_features(df, id_col="id", media_col="media", media_type="gif")


def test_multimodal_image_stub_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, media binary")
    out = multimodal.extract_features(
        df, id_col="id", media_col="media", media_type="image"
    )
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        out.collect()


def test_multimodal_fake_features_deterministic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b"hello"))], "id long, media binary"
    )
    rows = (
        multimodal.extract_features(df, id_col="id", media_col="media")
        .orderBy("id")
        .collect()
    )
    assert rows[0]["n_bytes"] == 5
    # identical blobs -> identical features
    assert [rows[0][f"f{i}"] for i in range(4)] == [rows[1][f"f{i}"] for i in range(4)]
    assert all(0.0 <= rows[0][f"f{i}"] <= 1.0 for i in range(4))


def test_lsh_ann_is_subset_of_bruteforce_universe(spark, sf_dir):
    """LSH results must be genuine neighbors: every (query, hit) pair the
    LSH path returns appears in the brute-force scored universe with the
    same rounded similarity."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    planes = similarity.hyperplanes(8, 64)
    lsh = similarity.lsh_ann_topk(e, q, planes, k=5)
    brute = similarity.brute_force_topk(e, q, k=10**9)  # unlimited = all sims
    j = lsh.alias("l").join(
        brute.alias("b"),
        (F.col("l.query_id") == F.col("b.query_id"))
        & (F.col("l.vec_id") == F.col("b.vec_id")),
    )
    mismatches = j.filter(F.col("l.sim") != F.col("b.sim")).count()
    assert mismatches == 0
    assert j.count() == lsh.count()  # every LSH hit exists in the universe


def test_bruteforce_topk_excludes_self(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(e, e.filter(F.col("vec_id") < 3), k=5)
    assert out.filter(F.col("query_id") == F.col("vec_id")).count() == 0
    # exactly 5 per query, ranks 1..5
    per_q = out.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    for r in per_q.collect():
        assert (r["n"], r["mx"]) == (5, 5)


def test_hll_within_rsd_of_exact(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=2%) must track exact counts.

    The catalog entry now carries the band itself: within_tol compares
    the sketch to the exact NDV inside the compared output, and the
    exact columns must agree with an independent recount here."""
    from dsp_spark import catalog

    rows = catalog.entries()["approx_distinct_docs_hll"].fn(spark, sf_dir).collect()
    from dsp_spark.session import read_table
    from pyspark.sql import functions as F

    exact = {
        r["source"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["exact_distinct"] == exact[r["source"]]
        assert r["within_tol"], (r["source"], r["exact_distinct"])


# --- PII scan / redaction -------------------------------------------------

_PII_DOC = (
    "contact jane.doe+spam@example.co.uk or +14155551234 "
    "from 10.0.255.7; ssn 123-45-6789 ends"
)


def test_pii_counts_and_redaction(spark):
    from dsp_spark.operators import pii

    df = spark.createDataFrame(
        [(1, _PII_DOC), (2, "no pii here at all"), (3, "x@y.io x@y.io")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[pii.pii_count("text", k).alias(k) for k in pii.PII_PATTERNS],
            pii.redact("text").alias("red"),
        ).collect()
    }
    assert (got[1]["email"], got[1]["ipv4"], got[1]["phone"], got[1]["ssn"]) == (
        1, 1, 1, 1,
    )
    assert got[1]["red"] == "contact [EMAIL] or [PHONE] from [IP]; ssn [SSN] ends"
    assert (got[2]["email"], got[2]["red"]) == (0, "no pii here at all")
    assert got[3]["email"] == 2 and got[3]["red"] == "[EMAIL] [EMAIL]"


def test_pii_sql_mirror_matches_spark(spark):
    """The DuckDB-side templates count/redact identically to the Spark
    expressions on PII-bearing text (the corpus parity test only sees
    zeros — this pins the non-zero path)."""
    import duckdb

    from dsp_spark.operators import pii

    rows = [(1, _PII_DOC), (2, "a +123456789 b"), (3, "plain")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    s = (
        df.select(
            "doc_id",
            *[pii.pii_count("text", k).alias(k) for k in pii.PII_PATTERNS],
            pii.redact("text").alias("red"),
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    cols = ", ".join(
        f"{pii.pii_count_sql('text', k)} AS {k}" for k in pii.PII_PATTERNS
    )
    d = con.execute(
        f"SELECT doc_id, {cols}, {pii.redact_sql('text')} AS red "
        "FROM t ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in s] == d


# --- decontamination ------------------------------------------------------


def test_decontam_flags_planted_overlap(spark, tmp_path):
    """An eval doc sharing an 8-gram run with a train doc is flagged;
    a disjoint eval doc is not."""
    import pyspark.sql.functions as F

    from dsp_spark.catalog import queries

    words = lambda s: " ".join(s)
    train = words("abcdefghij")          # grams over a..j
    clean = words("qrstuvwxyz")          # disjoint vocabulary
    dirty = words("zzabcdefgh")          # contains the a..h 8-gram
    rows = [
        (1, train, "en", "src0", len(train)),
        (2, clean, "en", "src10", len(clean)),
        (3, dirty, "en", "src11", len(dirty)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in queries()["decontam_eval_overlap"](spark, str(tmp_path)).collect()
    }
    assert out[2] == (0, False)
    assert out[3][0] == 1 and out[3][1] is True
    assert 1 not in out  # train docs aren't scored


def test_multimodal_binaryfile_ingestion(spark, tmp_path):
    """End-to-end media ingestion: opaque blobs land as files, the
    binaryFile source reads (path, content) without decoding, and the
    Arrow-batched feature extractor runs over the content column — the
    exact shape a 100 TB image/audio lake uses (manifests + blob
    columns, decode only inside mapInPandas)."""
    blobs = {f"m{i}.bin": bytes([i]) * (50 + i) for i in range(8)}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .selectExpr("reverse(split(path, '/'))[0] AS fname", "content")
    )
    feats = multimodal.extract_features(
        df, id_col="fname", media_col="content"
    ).collect()
    assert len(feats) == 8
    by_name = {r.fname: r for r in feats}
    for name, data in blobs.items():
        assert by_name[name].n_bytes == len(data)


def _bpe_merge_py(tk, l, r):
    """Reference greedy-leftmost non-overlapping merge (the rule a BPE
    trainer's replace pass uses)."""
    out = []
    i = 0
    while i < len(tk):
        if i + 1 < len(tk) and tk[i] == l and tk[i + 1] == r:
            out.append(l + " " + r)
            i += 2
        else:
            out.append(tk[i])
            i += 1
    return out


def test_bpe_apply_merge_greedy_nonoverlap(spark):
    """The regex replace pass in bpe_train_merges must implement greedy
    leftmost NON-overlapping replacement — [a,a,a,a] with merge (a,a)
    yields two pairs, [a,a,a] yields one pair plus a bare a — merged
    symbols (display form contains spaces) must participate in later
    rounds, and regex metacharacters in tokens must stay literal."""
    from dsp_spark.queries.text import _BPE_SEP, _bpe_apply_merge

    cases = [
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["x", "a", "b", "b", "a"], "a", "b"),
        (["a"], "a", "a"),
        ([], "a", "a"),
        # round >= 2 shape: left symbol is itself a prior merge
        (["a b", "c", "a b", "c", "a b"], "a b", "c"),
        (["a a", "a a", "a a"], "a a", "a a"),
        # regex metacharacters and Java quoting edge (\E inside a token)
        (["a.c", "x(", "a.c", "x("], "a.c", "x("),
        (["q\\E+", "z", "q\\E+", "z"], "q\\E+", "z"),
        # near-miss boundaries: token CONTAINING the pair as substring
        (["aa", "a", "a", "aa"], "a", "a"),
    ]
    for tk, l, r in cases:
        s = " " + " ".join(x.replace(" ", _BPE_SEP) for x in tk) + " "
        docs = spark.createDataFrame([(s,)], "s string")
        out = _bpe_apply_merge(docs, l, r).collect()[0].s
        got = [
            x.replace(_BPE_SEP, " ") for x in out.strip().split(" ") if x != ""
        ]
        assert got == _bpe_merge_py(tk, l, r), (tk, l, r, got)


def test_bpe_train_merges_matches_python_model(spark, sf_dir):
    """End-to-end train loop vs a pure-Python BPE trainer on the real
    corpus slice — validates the argmax tie-break AND the replace pass
    composition, independent of the DuckDB oracle."""
    from collections import Counter

    from dsp_spark.queries.text import bpe_train_merges

    texts = [
        r.text
        for r in read_table(spark, sf_dir, "documents").select("text").collect()
    ]
    docs = [[w for w in t.split() if w] for t in texts]
    expect = []
    for rank in range(1, 4):
        pairs = Counter()
        for d in docs:
            for a, b in zip(d, d[1:]):
                pairs[(a, b)] += 1
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rank, l, r, cnt))
        docs = [_bpe_merge_py(d, l, r) for d in docs]
    got = [
        (x.merge_rank, x.left_tok, x.right_tok, x.cnt)
        for x in bpe_train_merges(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    assert got == expect


def test_fim_split_reassembles_byte_exact(spark, sf_dir):
    """The FIM segments must partition each document exactly: lengths
    sum to the doc length and each segment's md5 matches the md5 of
    the corresponding python slice — the transform is a split, never
    a re-synthesis."""
    import hashlib

    from dsp_spark.queries.chunking import doc_fim_split

    out = {r.doc_id: r for r in doc_fim_split(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    assert set(out) == set(docs)
    n_empty_mid = 0
    for d, text in docs.items():
        r = out[d]
        assert r.prefix_len + r.middle_len + r.suffix_len == len(text), d
        p = text[: r.prefix_len]
        m = text[r.prefix_len : r.prefix_len + r.middle_len]
        s = text[r.prefix_len + r.middle_len :]
        for seg, h in ((p, r.prefix_md5), (m, r.middle_md5), (s, r.suffix_md5)):
            assert hashlib.md5(seg.encode()).hexdigest() == h, d
        n_empty_mid += r.middle_len == 0
    # empty middles are legitimate (c2 == c1) but must not dominate
    assert n_empty_mid < len(docs) / 2
