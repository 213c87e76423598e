"""Text-analysis catalog entries over `documents`: token stats, quality
scoring, language-ID, fingerprinting, multimodal feature plumbing."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import prefix, textops
from dsp_spark.operators.multimodal import N_FAKE_FEATURES, extract_features
from dsp_spark.queries._util import t
from dsp_spark.session import spread


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS INTEGER) AS n_uniq_tokens,
           CAST(list_max(list_transform(string_split_regex(text, '\\s+'),
                                        w -> length(w))) AS INTEGER) AS max_token_len
    FROM documents
    """,
    doc="Whitespace+regex token counting (the BPE-ish pre-tokenizer shape): "
    "totals, uniques, longest token. Narrow map, no shuffle.",
)
def text_token_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = textops.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_uniq_tokens"),
        F.array_max(F.transform(toks, F.length)).cast("int").alias("max_token_len"),
    )


_STOPS = "'the','a','of','and','to','in','is','for','on','it'"


@register(
    "text_quality_score",
    f"""
    WITH x AS (
        SELECT doc_id, text,
               string_split_regex(text, '\\s+') AS tk,
               length(text) AS n_char
        FROM documents
    ), m AS (
        SELECT doc_id,
               (n_char - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / n_char AS punct_raw,
               len(list_filter(tk, w -> w IN ({_STOPS}))) / len(tk) AS stop_raw,
               list_sum(list_transform(tk, w -> length(w))) / len(tk) AS mean_raw
        FROM x
    )
    SELECT doc_id,
           round(punct_raw, 6) AS punct_ratio,
           round(stop_raw, 6) AS stop_ratio,
           round(mean_raw, 6) AS mean_token_len,
           round((10 * stop_raw + least(mean_raw, 10.0)) / 20, 6) AS quality
    FROM m
    """,
    doc="Heuristic document quality: punctuation ratio, stopword ratio, "
    "mean token length, combined score — the cheap pre-filter stage of a "
    "training-data pipeline.",
)
def text_quality_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = textops.tokens("text")
    n_char = F.length("text")
    # raw full-precision ratios; round only at the output edge (rounding a
    # composite of already-rounded values lands on .5 boundaries where
    # engines' rounding paths diverge)
    punct_raw = (n_char - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))) / n_char
    stop_raw = (
        F.size(F.expr(f"filter(split(text, '\\\\s+'), w -> w IN ({_STOPS}))"))
        / F.size(toks)
    )
    mean_raw = (
        F.expr("aggregate(split(text, '\\\\s+'), 0, (acc, w) -> acc + length(w))")
        / F.size(toks)
    )
    return d.select(
        "doc_id",
        F.round(punct_raw, 6).alias("punct_ratio"),
        F.round(stop_raw, 6).alias("stop_ratio"),
        F.round(mean_raw, 6).alias("mean_token_len"),
        F.round((10 * stop_raw + F.least(mean_raw, F.lit(10.0))) / 20, 6).alias(
            "quality"
        ),
    )


_SPARK_TOKS = "split(text, '\\\\s+')"
_DUCK_TOKS = "string_split_regex(text, '\\s+')"
_SCORES_SPARK = {
    lang: textops.lang_score_expr(lang, _SPARK_TOKS, "spark")
    for lang in textops.LANG_PROFILES
}
_SCORES_DUCK = {
    lang: textops.lang_score_expr(lang, _DUCK_TOKS, "duck")
    for lang in textops.LANG_PROFILES
}
_SCORE_SELECT_DUCK = ",\n           ".join(
    f"CAST({_SCORES_DUCK[lang]} AS INTEGER) AS s_{lang}"
    for lang in sorted(textops.LANG_PROFILES)
)
_PRED_DUCK = textops.lang_pred_expr(_SCORES_DUCK)
_PRED_SPARK = textops.lang_pred_expr(_SCORES_SPARK)


@register(
    "text_lang_id",
    f"""
    SELECT doc_id,
           {_SCORE_SELECT_DUCK},
           {_PRED_DUCK} AS lang_pred
    FROM documents
    """,
    doc="Stopword-profile language ID: per-language hit counts + argmax "
    "with deterministic alphabetical tie-break. Profile lists are "
    "pluggable; the operator shape (n scores + fold) is the point.",
)
def text_lang_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *[
            F.expr(_SCORES_SPARK[lang]).cast("int").alias(f"s_{lang}")
            for lang in sorted(textops.LANG_PROFILES)
        ],
        F.expr(_PRED_SPARK).alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_hex,
           ('0x' || substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 15))::BIGINT AS fp64
    FROM documents
    """,
    doc="Canonical-form document fingerprint (lowercase, collapsed "
    "whitespace -> md5) plus a 60-bit numeric form for compact joins.",
)
def text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = F.md5(canon)
    return d.select(
        "doc_id",
        fp.alias("fp_hex"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp64"),
    )


_FAKE_FEATS_DUCK = ",\n           ".join(
    f"round(('0x' || substr(md5('{i}|' || md5(text)), 1, 6))::BIGINT / 16777216.0, 6) AS f{i}"
    for i in range(N_FAKE_FEATURES)
)


@register(
    "multimodal_fake_features",
    f"""
    SELECT doc_id, 'fake' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           {_FAKE_FEATS_DUCK}
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary media column -> Arrow-batched "
    "mapInPandas decode/feature-extract. Real codecs are stubbed (not in "
    "container); the deterministic fake decoder proves the schema, batch "
    "shape and partitioning — and is oracle-checked end to end.",
)
def multimodal_fake_features(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )
    return extract_features(d, id_col="doc_id", media_col="media", media_type="fake")


@register(
    "text_bpe_pretokens",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')) AS INTEGER) AS n_pretokens,
           CAST(len(regexp_extract_all(text, '[0-9]{1,3}')) AS INTEGER) AS n_number_chunks,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INTEGER) AS n_punct
    FROM documents
    """,
    doc="BPE-style pre-tokenizer counts (letter runs / <=3-digit number "
    "chunks / punctuation, the GPT-2 pre-tokenizer shape). regexp runs "
    "JVM-side inside codegen; narrow map, no shuffle.",
)
def text_bpe_pretokens(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        r'CAST(size(regexp_extract_all(text, "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]", 0)) AS INT) AS n_pretokens',
        r'CAST(size(regexp_extract_all(text, "[0-9]{1,3}", 0)) AS INT) AS n_number_chunks',
        r'CAST(size(regexp_extract_all(text, "[^A-Za-z0-9\\s]", 0)) AS INT) AS n_punct',
    )


@register(
    "multimodal_frame_sample",
    """
    WITH f AS (
        SELECT doc_id, md5(text) AS h, i AS frame_idx
        FROM documents, generate_series(0, 2) AS t(i)
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           md5('frame' || frame_idx || '|' || h) AS frame_hash,
           round(('0x' || substr(md5('frame' || frame_idx || '|' || h), 1, 6))::BIGINT
                 / 16777216.0, 6) AS frame_score
    FROM f
    """,
    doc="1->N frame sampling plumbing (video path stubbed; deterministic "
    "fake frames prove the blob-in/frame-table-out mapInPandas shape). "
    "Narrow map, output fan-out 3x, no shuffle.",
)
def multimodal_frame_sample(spark, sf_dir):
    from dsp_spark.operators.multimodal import sample_frames

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )
    return sample_frames(
        d, id_col="doc_id", media_col="media", n_frames=3, media_type="fake"
    )


@register(
    "multimodal_resize_audit",
    """
    SELECT doc_id, 16 AS out_w, 16 AS out_h,
           CAST(256 AS BIGINT) AS out_bytes,
           md5(substr(repeat(md5(text), 8), 1, 256)) AS out_md5
    FROM documents
    """,
    doc="bytes->bytes media resize plumbing (image path stubbed; the "
    "deterministic fake resizer proves the blob-in/blob-out mapInPandas "
    "shape and fixed output geometry). The audit hashes every resized "
    "blob JVM-side so the oracle checks the actual bytes produced, not "
    "just row counts. Narrow map, no shuffle.",
)
def multimodal_resize_audit(spark, sf_dir):
    from dsp_spark.operators.multimodal import resize_media

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )
    r = resize_media(d, id_col="doc_id", media_col="media", width=16, height=16)
    return r.select(
        "doc_id",
        "out_w",
        "out_h",
        F.length("media").cast("long").alias("out_bytes"),
        F.md5("media").alias("out_md5"),
    )


# --- PII scan / redaction -------------------------------------------------

from dsp_spark.operators import pii as _pii  # noqa: E402

_PII_SQL_COLS = ",\n           ".join(
    f"CAST(SUM({_pii.pii_count_sql('text', k)}) AS BIGINT) AS n_{k}"
    for k in _pii.PII_PATTERNS
)


@register(
    "text_pii_scan",
    f"""
    SELECT source,
           {_PII_SQL_COLS},
           CAST(SUM(CASE WHEN md5({_pii.redact_sql('text')}) <> md5(text)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
    doc="PII audit per source: regex counts for email/IPv4/phone/SSN and "
    "how many docs a redaction pass would touch (md5(redacted) vs "
    "md5(original), so full texts never leave the scan stage). All "
    "JVM-side regexp_count/regexp_replace — narrow scan-speed pass, one "
    "tiny shuffle on source. The synthetic corpus is PII-free (all "
    "zeros here); injected-PII behavior is pinned by unit tests "
    "(tests/test_llm_ops.py).",
)
def text_pii_scan(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    counts = [
        F.sum(_pii.pii_count("text", k)).cast("long").alias(f"n_{k}")
        for k in _pii.PII_PATTERNS
    ]
    touched = F.sum(
        F.when(F.md5(_pii.redact("text")) != F.md5(F.col("text")), 1).otherwise(0)
    ).cast("long")
    return d.groupBy("source").agg(
        *counts,
        touched.alias("n_docs_redacted"),
        F.count("*").alias("n_docs"),
    )


# --- train/eval decontamination ------------------------------------------

_NGRAM = 8
_EVAL_SPLIT = 10  # sources srcN with N >= 10 form the eval split


@register(
    "decontam_eval_overlap",
    f"""
    WITH tk AS (
        SELECT doc_id,
               CAST(substr(source, 4) AS INTEGER) >= {_EVAL_SPLIT} AS is_eval,
               string_split_regex(text, '\\s+') AS tk
        FROM documents
    ), g AS (
        SELECT doc_id, is_eval,
               unnest(list_transform(range(1, len(tk) - {_NGRAM - 2}),
                      i -> md5(concat_ws(' ', tk[i:i+{_NGRAM - 1}])))) AS gram
        FROM tk WHERE len(tk) >= {_NGRAM}
    ), train_g AS (
        SELECT DISTINCT gram FROM g WHERE NOT is_eval
    ), eval_g AS (
        SELECT DISTINCT doc_id, gram FROM g WHERE is_eval
    ), hits AS (
        SELECT doc_id, COUNT(*) AS n_overlap
        FROM eval_g JOIN train_g USING (gram) GROUP BY doc_id
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COALESCE(ANY_VALUE(h.n_overlap), 0) AS BIGINT) AS n_overlap,
           COALESCE(ANY_VALUE(h.n_overlap), 0) > 0 AS contaminated
    FROM eval_g e LEFT JOIN hits h USING (doc_id)
    GROUP BY e.doc_id
    """,
    doc="Train/eval decontamination (GPT-3/Dolma style): word 8-grams of "
    "each eval doc checked against the distinct 8-gram set of the train "
    "split (sources src10+ are 'eval'). Grams are hashed scan-side so "
    "the shuffle carries 8-byte keys, distinct() folds map-side, and "
    "the gram-gram equi-join is uniform-hash — no broadcast needed, no "
    "skew: the shape that holds when the train set is 100 TB. The gram "
    "hash only ever meets itself within one engine (the join and the "
    "counts are per-engine), so Spark uses cheap xxhash64 while the "
    "oracle uses md5 — counts agree as long as neither collides.",
)
def decontam_eval_overlap(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        (F.substring("source", 4, 10).cast("int") >= _EVAL_SPLIT).alias("is_eval"),
        textops.tokens("text").alias("tk"),
    ).filter(F.size("tk") >= _NGRAM)
    grams = tk.select(
        "doc_id",
        "is_eval",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (_NGRAM - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("tk", i, _NGRAM))),
            )
        ).alias("gram"),
    )
    train_g = grams.filter(~F.col("is_eval")).select("gram").distinct()
    eval_g = grams.filter(F.col("is_eval")).select("doc_id", "gram").distinct()
    # mark matches at gram level, then ONE grouping gives both the gram
    # count and the overlap count — eval grams are computed and shuffled
    # once, not re-derived per output column
    marked = eval_g.join(train_g.withColumn("m", F.lit(1)), "gram", "left")
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce("m", F.lit(0))).cast("long").alias("n_overlap"),
        (F.sum(F.coalesce("m", F.lit(0))) > 0).alias("contaminated"),
    )


_VOCAB_K = 256


@register(
    "text_vocab_topk",
    f"""
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT {_VOCAB_K}
    """,
    doc="Corpus vocabulary top-k by frequency (the counting pass of "
    "BPE/WordPiece vocab building). groupBy folds map-side so the "
    "shuffle carries (token, partial count); the global top-k is "
    "TakeOrderedAndProject — per-partition heaps merged on the driver, "
    "never a single-partition global sort. Ties broken by token for "
    "determinism.",
)
def text_vocab_topk(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(textops.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(_VOCAB_K)
    )


_MERGE_K = 64


@register(
    "bpe_merge_pairs",
    f"""
    WITH tk AS (SELECT string_split_regex(text, '\\s+') AS l FROM documents),
    pairs AS (
        SELECT z[1] AS left_tok, z[2] AS right_tok
        FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
              FROM tk WHERE len(l) >= 2)
    )
    SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs WHERE left_tok <> '' AND right_tok <> ''
    GROUP BY 1, 2 ORDER BY cnt DESC, left_tok, right_tok LIMIT {_MERGE_K}
    """,
    doc="BPE merge-candidate scoring: adjacent-token-PAIR counts, the "
    "statistic each BPE/WordPiece merge iteration maximizes — the "
    "sibling of text_vocab_topk's unigram pass (one full such pass "
    "per merge in a tokenizer build; production fits on a "
    "deterministic corpus sample, sample_hash_10pct composes). "
    "Pairs come from one zip-with-next transform per doc (no "
    "self-join, no window over the token stream); the explode is "
    "corpus-token-sized but hash aggregation folds map-side, so the "
    "shuffle carries only distinct (pair, partial count) rows — "
    "vocab^2-bounded, corpus-independent; global top-k is "
    "TakeOrderedAndProject (per-partition heaps merged on the "
    "driver), never a single-partition sort. Ties break on the pair "
    "for cross-engine determinism.",
)
def bpe_merge_pairs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # size >= 2 BEFORE the explode: sequence(1, 0) would DESCEND in
    # Spark and index tk[-1]/tk[1] out of bounds on 1-token docs.
    # NO spread (measured r14: 0.38 -> 0.63 s — the pair projection is
    # too light to pay for the extra exchange at this corpus size)
    tk = d.select(textops.tokens("text").alias("tk")).filter(F.size("tk") >= 2)
    # int-sequence explode + row-level indexing (the _bpe_pair_counts /
    # source_ngram_jaccard codegen shape — no interpreted per-doc
    # struct-array build)
    pairs = tk.select(
        "tk",
        F.explode(F.expr("sequence(1, size(tk) - 1)")).alias("i"),
    ).select(
        F.expr("tk[i-1]").alias("left_tok"), F.expr("tk[i]").alias("right_tok")
    )
    return (
        pairs.filter((F.col("left_tok") != "") & (F.col("right_tok") != ""))
        .groupBy("left_tok", "right_tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "left_tok", "right_tok")
        .limit(_MERGE_K)
    )


# --- BPE train loop --------------------------------------------------------

_TRAIN_K = 3  # unrolled merge rounds; frozen into the oracle CTE chain

# Internal representation: each doc is its space-joined token string,
# padded with one leading/trailing space; a MERGED symbol joins its
# parts with \x01 (never space), so symbols stay whitespace-free and
# the string stays splittable on ' '. Display form (what the entries
# output and the oracle computes) replaces \x01 with ' ' — a bijection
# as long as raw tokens never contain \x01, which whitespace-split
# tokens of the text corpus do not.
_BPE_SEP = "\x01"


def _bpe_doc_string(text_col):
    """text -> padded single-space-joined token string (drops empty
    tokens by construction: runs of whitespace collapse to one space)."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(text_col, r"\s+", " ")),
        F.lit(" "),
    )


def _bpe_tokens(s):
    """Padded internal string -> array of internal tokens."""
    return F.filter(F.split(F.trim(s), " "), lambda x: x != "")


def _bpe_pair_counts(docs):
    """Adjacent-pair counts over (s string) rows, keys in DISPLAY form
    — the statistic one BPE merge round maximizes. Map-side partial agg
    bounds the shuffle at distinct-pair (vocab^2) rows; the translate
    to display happens on the aggregated pair table, not the corpus."""
    tk = docs.select(_bpe_tokens(F.col("s")).alias("tk")).filter(
        F.size("tk") >= 2
    )
    # int-sequence explode + row-level array indexing, not a
    # transform() building a per-doc struct array: the struct-array
    # HOF ran interpreted per position, while this shape keeps
    # generate -> index -> partial agg fused in whole-stage codegen
    # (same rewrite as source_ngram_jaccard's postings, measured
    # there at -32% for the scan stage)
    pairs = tk.select(
        "tk",
        F.explode(F.expr("sequence(1, size(tk) - 1)")).alias("i"),
    ).select(F.expr("tk[i-1]").alias("l"), F.expr("tk[i]").alias("r"))
    return (
        pairs.groupBy("l", "r")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            F.translate("l", _BPE_SEP, " ").alias("left_tok"),
            F.translate("r", _BPE_SEP, " ").alias("right_tok"),
            "cnt",
        )
    )


def _java_quote(s: str) -> str:
    """java.util.regex.Pattern.quote: literal-quote s, handling any
    embedded \\E the way the JDK does."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _java_repl(s: str) -> str:
    """Escape a literal for Java Matcher.replaceAll's replacement slot
    (backslash and $ are special there)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _bpe_apply_merge(docs, left: str, right: str):
    """Replace every greedy-leftmost non-overlapping (left, right)
    adjacency with the merged symbol — one JVM regexp_replace pass,
    O(tokens) per doc, zero Python, zero shuffle.

    Java replaceAll scans left-to-right and resumes AFTER each match,
    which IS the BPE trainer's greedy non-overlap rule; the pattern
    consumes the leading separator space and asserts the trailing one
    with a lookahead, so back-to-back occurrences (left=right runs)
    merge at alternating positions exactly like the sequential pass."""
    li = left.replace(" ", _BPE_SEP)
    ri = right.replace(" ", _BPE_SEP)
    pat = " " + _java_quote(li) + " " + _java_quote(ri) + "(?= )"
    repl = " " + _java_repl(li + _BPE_SEP + ri)
    return docs.withColumn("s", F.regexp_replace("s", pat, repl))


def _bpe_learn_merges(docs) -> list[tuple[str, str, int]]:
    """K merge rounds, each one pair-count job whose 1-row argmax is
    collected to the driver (the same small-ints collect the probed-
    cell-id list uses) and applied to the next round's plan as a
    literal regex. Linearizing the rounds keeps round r's job at one
    corpus scan + r narrow regex passes + one vocab^2-bounded agg; the
    fully-lazy nested alternative (1-row broadcast cross joins)
    re-evaluates the merge inside join conditions and recomputes the
    agg subtrees — measured 3-4x slower at sf0.1."""
    # materialize the tokenized strings once: every round re-reads them
    # (round r additionally applies r regex passes), so without this the
    # parquet scan + whitespace collapse runs K times (~20% of the
    # trainer's cost at sf0.1); at 100 TB the equivalent is persisting
    # the tokenized corpus before the merge loop. NO spread (measured
    # r14: 1.49 -> 1.79 s — each round is argmax-barrier bound, and 32
    # tiny tasks per round cost more than the one-core map work saved)
    base = docs.localCheckpoint(eager=True)
    try:
        docs = base
        merges: list[tuple[str, str, int]] = []
        for _ in range(_TRAIN_K):
            row = (
                _bpe_pair_counts(docs)
                .orderBy(F.desc("cnt"), "left_tok", "right_tok")
                .limit(1)
                .collect()
            )
            if not row:
                break
            l, r, cnt = row[0]
            merges.append((l, r, int(cnt)))
            docs = _bpe_apply_merge(docs, l, r)
        return merges
    finally:
        base.unpersist()


def _bpe_round_sql(r: int) -> str:
    """One unrolled BPE merge round as DuckDB CTEs: count pairs on
    s{r-1}, pick the winner, apply it greedy-leftmost (gaps-and-islands:
    runs of consecutive candidates — only possible when left=right —
    apply at odd offsets, and a row is dropped iff its predecessor
    applied), emit s{r} re-numbered. The winner joins in via LEFT JOIN
    ON TRUE, not CROSS JOIN: on a degenerate corpus with fewer than
    _TRAIN_K learnable merges t{r} is EMPTY, and a cross join would
    empty every later s{r} (tokens_after=0 for all docs) while the
    Spark trainer just breaks out of the loop — the left join passes
    s{r-1} through unchanged (cand coalesces to FALSE on NULL lt/rt),
    matching the break."""
    s = f"s{r - 1}"
    return f"""
    p{r} AS (
        SELECT sym AS lt, nxt AS rt, COUNT(*) AS cnt FROM (
            SELECT sym, LEAD(sym) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
            FROM {s})
        WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t{r} AS (SELECT lt, rt, cnt FROM p{r} ORDER BY cnt DESC, lt, rt LIMIT 1),
    c{r} AS (
        SELECT s.doc_id, s.pos, s.sym, t.lt, t.rt,
               COALESCE(s.sym = t.lt AND
                        LEAD(s.sym) OVER (PARTITION BY s.doc_id ORDER BY s.pos) = t.rt,
                        FALSE) AS cand
        FROM {s} s LEFT JOIN t{r} t ON TRUE
    ),
    g{r} AS (
        SELECT *, SUM(CASE WHEN cand THEN 0 ELSE 1 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM c{r}
    ),
    a{r} AS (
        SELECT *, cand AND (ROW_NUMBER() OVER (PARTITION BY doc_id, grp, cand
                                               ORDER BY pos) % 2 = 1) AS applied
        FROM g{r}
    ),
    d{r} AS (
        SELECT doc_id, pos,
               CASE WHEN applied THEN lt || ' ' || rt ELSE sym END AS sym,
               COALESCE(LAG(applied) OVER (PARTITION BY doc_id ORDER BY pos),
                        FALSE) AS dropped
        FROM a{r}
    ),
    s{r} AS (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
               sym
        FROM d{r} WHERE NOT dropped
    )"""


@register(
    "bpe_train_merges",
    """
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    s0 AS (
        SELECT doc_id, CAST(z[1] AS INTEGER) AS pos, z[2] AS sym
        FROM (SELECT doc_id, unnest(list_zip(range(1, len(l) + 1), l)) AS z
              FROM tk WHERE len(l) >= 1)
    ),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, _TRAIN_K + 1))
    + """
    SELECT CAST(1 AS INTEGER) AS merge_rank, lt AS left_tok, rt AS right_tok,
           CAST(cnt AS BIGINT) AS cnt FROM t1
    UNION ALL SELECT 2, lt, rt, CAST(cnt AS BIGINT) FROM t2
    UNION ALL SELECT 3, lt, rt, CAST(cnt AS BIGINT) FROM t3
    """,
    doc="BPE tokenizer TRAINING, 3 unrolled merge rounds (count adjacent "
    "pairs -> take the argmax pair, ties on the pair -> replace every "
    "greedy-leftmost non-overlapping occurrence with the merged symbol "
    "-> recount): the iterative step bpe_merge_pairs only scored once, "
    "made oracle-checkable the same way embedding_kmeans_iterate unrolls "
    "Lloyd rounds into a CTE chain. Per round ONE job: a corpus scan "
    "with the previous merges applied as narrow aggregate() folds (JVM "
    "higher-order function, no Python row UDF, tokens never shuffle), a "
    "map-side-combined pair agg (shuffle bounded by distinct pairs, "
    "vocab^2, corpus-independent), TakeOrderedAndProject for the argmax "
    "(per-partition heaps, no global sort) whose single row is "
    "collected and folded into the next round as literals — the "
    "iterative-algorithm pattern, K jobs run at build time like "
    "ann_index_persisted_topk's index build. The oracle applies each "
    "merge with gaps-and-islands windows (candidate runs, odd offsets "
    "apply — provably the fold's greedy-leftmost rule) partitioned by "
    "doc_id. At 100 TB a trainer persists the tokenized corpus once "
    "and pays one scan + one vocab-bounded exchange per merge; fits "
    "run on a deterministic sample (sample_hash_10pct composes).",
)
def bpe_train_merges(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    docs = d.select(_bpe_doc_string(F.col("text")).alias("s"))
    merges = _bpe_learn_merges(docs)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, left_tok string, right_tok string, cnt bigint",
    )


@register(
    "bpe_encode_stats",
    """
    WITH tk AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    s0 AS (
        SELECT doc_id, CAST(z[1] AS INTEGER) AS pos, z[2] AS sym
        FROM (SELECT doc_id, unnest(list_zip(range(1, len(l) + 1), l)) AS z
              FROM tk WHERE len(l) >= 1)
    ),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, _TRAIN_K + 1))
    + """,
    after AS (SELECT doc_id, COUNT(*) AS n_after FROM s3 GROUP BY doc_id)
    SELECT tk.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(tk.l)) AS BIGINT) AS tokens_before,
           CAST(SUM(COALESCE(a.n_after, 0)) AS BIGINT) AS tokens_after,
           round(1.0 - SUM(COALESCE(a.n_after, 0)) /
                 CAST(NULLIF(SUM(len(tk.l)), 0) AS DOUBLE), 6) AS merge_gain
    FROM tk LEFT JOIN after a USING (doc_id)
    GROUP BY tk.source
    """,
    doc="The tokenizer APPLY path: encode the corpus with the 3 merges "
    "bpe_train_merges learns (train and apply share _bpe_pair_counts / "
    "_bpe_apply_merge, so the two entries cross-check each other) and "
    "report per-source compression — docs, tokens before/after, and "
    "the merge gain (fraction of tokens eliminated), the number a "
    "tokenizer build watches to decide how many merges to keep. The "
    "returned plan is ONE corpus scan applying the 3 folds narrowly "
    "plus one per-source partial agg; the merged token arrays never "
    "shuffle (groupBy ships only the two size sums). Training jobs run "
    "at build time and the learned merges cache per (process, corpus "
    "path) — the IVF-index amortization pattern: train once, encode "
    "many. The gain ratio is one double division of two exact bigint "
    "sums, so it is engine-deterministic at round(6).",
)
def bpe_encode_stats(spark, sf_dir):
    import os

    d = t(spark, sf_dir, "documents")
    docs = d.select(
        "source", _bpe_doc_string(F.col("text")).alias("s")
    ).withColumn("n0", F.size(_bpe_tokens(F.col("s"))).cast("bigint"))
    full = os.path.abspath(os.path.normpath(sf_dir))
    merges = _BPE_MERGES_CACHE.get(full)
    if merges is None:
        merges = _bpe_learn_merges(docs.select("s"))
        _BPE_MERGES_CACHE[full] = merges
    for l, r, _ in merges:
        docs = _bpe_apply_merge(docs, l, r)
    after = F.sum(F.size(_bpe_tokens(F.col("s"))).cast("bigint"))
    before = F.sum("n0")
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        before.cast("bigint").alias("tokens_before"),
        after.cast("bigint").alias("tokens_after"),
        F.round(
            F.lit(1.0) - after / F.nullif(before.cast("double"), F.lit(0.0)), 6
        ).alias("merge_gain"),
    )


# learned merges per (process, corpus path) — same amortization rule as
# the persisted IVF index (_IVF_INDEX_BUILT): a fresh process always
# retrains, within a process the encode path reuses the fit
_BPE_MERGES_CACHE: dict[str, list[tuple[str, str, int]]] = {}


@register(
    "bpe_fertility_by_lang",
    """
    WITH tk AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
        FROM documents
    ),
    s0 AS (
        SELECT doc_id, CAST(z[1] AS INTEGER) AS pos, z[2] AS sym
        FROM (SELECT doc_id, unnest(list_zip(range(1, len(l) + 1), l)) AS z
              FROM tk WHERE len(l) >= 1)
    ),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, _TRAIN_K + 1))
    + """,
    after AS (SELECT doc_id, COUNT(*) AS n_after FROM s3 GROUP BY doc_id)
    SELECT tk.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(tk.l)) AS BIGINT) AS n_words,
           CAST(SUM(COALESCE(a.n_after, 0)) AS BIGINT) AS n_tokens,
           round(SUM(COALESCE(a.n_after, 0)) /
                 CAST(NULLIF(SUM(len(tk.l)), 0) AS DOUBLE), 6) AS fertility,
           round(SUM(strlen(array_to_string(tk.l, ' '))) /
                 CAST(NULLIF(SUM(COALESCE(a.n_after, 0)), 0) AS DOUBLE), 6)
               AS bytes_per_token
    FROM tk LEFT JOIN after a USING (doc_id)
    GROUP BY tk.lang
    """,
    doc="Tokenizer fertility per LANGUAGE — the number that decides "
    "whether a tokenizer is fair across languages in a multilingual "
    "mix (r7 verdict ask #6): encode the corpus with the merges "
    "bpe_train_merges learns (the encode path of bpe_encode_stats, "
    "same _BPE_MERGES_CACHE fit, same _bpe_apply_merge folds) and "
    "report per-lang tokens-per-word (n_tokens/n_words — a language "
    "whose frequent adjacencies made the merge table encodes cheaper; "
    "disparities here mean unequal effective context budget) and "
    "bytes-per-token (normalized-text bytes / n_tokens — the cost-"
    "per-token asymmetry, measured on the PRE-merge byte length so "
    "the internal \\x01 separator never leaks into the metric). Plan: "
    "one corpus scan applying the merges as narrow JVM regex folds + "
    "one lang-grain partial agg — token arrays never shuffle, the "
    "groupBy ships three bigint sums per doc. Both ratios are one "
    "double division of exact bigint sums at round(6), engine-"
    "deterministic per the merge_gain precedent.",
)
def bpe_fertility_by_lang(spark, sf_dir):
    import os

    d = t(spark, sf_dir, "documents")
    docs = (
        d.select("lang", _bpe_doc_string(F.col("text")).alias("s"))
        .withColumn("n0", F.size(_bpe_tokens(F.col("s"))).cast("bigint"))
        # byte length of the UNPADDED normalized string, bound to the
        # pre-merge projection (later withColumn("s", ...) layers do
        # not rewrite this expression)
        .withColumn("nb", F.octet_length(F.trim(F.col("s"))).cast("bigint"))
    )
    full = os.path.abspath(os.path.normpath(sf_dir))
    merges = _BPE_MERGES_CACHE.get(full)
    if merges is None:
        merges = _bpe_learn_merges(docs.select("s"))
        _BPE_MERGES_CACHE[full] = merges
    for ml, mr, _ in merges:
        docs = _bpe_apply_merge(docs, ml, mr)
    after = F.sum(F.size(_bpe_tokens(F.col("s"))).cast("bigint"))
    words = F.sum("n0")
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        words.cast("bigint").alias("n_words"),
        after.cast("bigint").alias("n_tokens"),
        F.round(
            after / F.nullif(words.cast("double"), F.lit(0.0)), 6
        ).alias("fertility"),
        F.round(
            F.sum("nb") / F.nullif(after.cast("double"), F.lit(0.0)), 6
        ).alias("bytes_per_token"),
    )


@register(
    "corpus_dataset_card",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
    FROM documents
    GROUP BY lang
    """,
    doc="Per-language dataset card: docs, chars, tokens, sources, "
    "distinct contents — the summary block of a training-data release. "
    "Multiple count-distincts expand via a single Expand + two-phase "
    "agg (one shuffle per distinct column, partials map-side); token "
    "counts are computed scan-side, so text never shuffles.",
)
def corpus_dataset_card(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.size(textops.tokens("text"))).cast("long").alias("total_tokens"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.count_distinct(F.md5("text")).cast("long").alias("n_distinct_texts"),
    )


@register(
    "text_repetition_stats",
    """
    WITH tk AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS tk
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS gram
        FROM tk WHERE len(tk) >= 2
    ), c AS (
        SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_2grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_2grams,
           round(1.0 - COUNT(*) / CAST(SUM(n) AS DOUBLE), 6) AS dup_2gram_frac,
           round(MAX(n) / CAST(SUM(n) AS DOUBLE), 6) AS top_2gram_frac
    FROM c GROUP BY doc_id
    """,
    doc="Gopher/MassiveText repetition signals per document: duplicate "
    "word-2-gram fraction and most-common-2-gram fraction — the "
    "filters that catch boilerplate and degenerate repetition. Every "
    "stat is per-document, so nothing ever shuffles: grams are sorted "
    "per row and distinct/max-run counts fall out of one O(n log n) "
    "aggregate fold, all inside whole-stage codegen. (The earlier "
    "explode + (doc_id, gram) groupBy moved every gram string through "
    "an exchange for what is row-local arithmetic.)",
)
def text_repetition_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = d.select("doc_id", textops.tokens("text").alias("tk")).filter(
        F.size("tk") >= 2
    )
    g = F.expr(
        "transform(sequence(1, size(tk) - 1), i -> concat_ws(' ', tk[i-1], tk[i]))"
    )
    # sorted-run fold: one pass over the sorted grams yields the distinct
    # count (nd) and the longest run (mx = count of the most common gram)
    runs = F.expr(
        """
        aggregate(
            array_sort(grams),
            struct(CAST('' AS STRING) AS prev, 0 AS cur, 0 AS mx, 0 AS nd),
            (acc, x) -> struct(
                x AS prev,
                IF(x = acc.prev, acc.cur + 1, 1) AS cur,
                IF(x = acc.prev, acc.mx, greatest(acc.mx, acc.cur)) AS mx,
                IF(x = acc.prev, acc.nd, acc.nd + 1) AS nd),
            acc -> struct(greatest(acc.mx, acc.cur) AS mx, acc.nd AS nd))
        """
    )
    x = tk.select("doc_id", g.alias("grams")).select(
        "doc_id", F.size("grams").alias("n_2grams_i"), runs.alias("r")
    )
    total = F.col("n_2grams_i").cast("double")
    return x.select(
        "doc_id",
        F.col("n_2grams_i").cast("long").alias("n_2grams"),
        F.col("r.nd").cast("long").alias("n_distinct_2grams"),
        F.round(1.0 - F.col("r.nd") / total, 6).alias("dup_2gram_frac"),
        F.round(F.col("r.mx") / total, 6).alias("top_2gram_frac"),
    )


@register(
    "text_quality_filter",
    """
    WITH x AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM documents
    ), m AS (
        SELECT doc_id,
               len(tk) AS n_words,
               list_sum(list_transform(tk, w -> length(w))) / len(tk) AS mean_len,
               len(list_filter(tk, w -> length(w) <= 2)) / len(tk) AS short_frac,
               len(list_distinct(tk)) / len(tk) AS distinct_ratio
        FROM x
    )
    SELECT doc_id,
           n_words >= 30 AS r_min_words,
           mean_len >= 3.0 AND mean_len <= 10.0 AS r_mean_word_len,
           short_frac <= 0.08 AS r_short_words,
           distinct_ratio >= 0.45 AS r_distinct_ratio,
           (n_words >= 30 AND mean_len >= 3.0 AND mean_len <= 10.0
            AND short_frac <= 0.08 AND distinct_ratio >= 0.45) AS keep
    FROM m
    """,
    doc="Gopher-style document keep/drop filter: per-rule booleans "
    "(min word count, mean word length band, short-word fraction cap, "
    "distinct-token floor) plus the combined keep flag — the decision "
    "stage downstream of text_quality_score. Pure narrow map over the "
    "scan (no shuffle); at 100 TB this is the first pass that prunes "
    "the corpus before any shuffle-bearing dedup runs.",
)
def text_quality_filter(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = textops.tokens("text")
    n_words = F.size(tk)
    mean_len = (
        F.expr("aggregate(split(text, '\\\\s+'), 0, (acc, w) -> acc + length(w))")
        / n_words
    )
    short_frac = (
        F.size(F.expr("filter(split(text, '\\\\s+'), w -> length(w) <= 2)")) / n_words
    )
    distinct_ratio = F.size(F.array_distinct(tk)) / n_words
    r1 = (n_words >= 30).alias("r_min_words")
    r2 = ((mean_len >= 3.0) & (mean_len <= 10.0)).alias("r_mean_word_len")
    r3 = (short_frac <= 0.08).alias("r_short_words")
    r4 = (distinct_ratio >= 0.45).alias("r_distinct_ratio")
    keep = (
        (n_words >= 30)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (short_frac <= 0.08)
        & (distinct_ratio >= 0.45)
    ).alias("keep")
    return d.select("doc_id", r1, r2, r3, r4, keep)


@register(
    "source_median_chars_udaf",
    """
    SELECT source, median(n_chars) AS median_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
    """,
    doc="Per-source exact median document length computed by a "
    "grouped-agg pandas UDF (functions/udx.py:median_udaf) — the UDAF "
    "extension point exercised as a first-class catalog entry with a "
    "full value check (integer medians are engine-exact). One shuffle "
    "on source; the group's values stream to the executor as Arrow "
    "batches, so this is the pattern for bounded-group custom "
    "aggregates that pyspark.sql.functions can't express.",
)
def source_median_chars_udaf(spark, sf_dir):
    from dsp_spark.functions.udx import median_udaf, nrows_udaf

    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        median_udaf("n_chars").alias("median_chars"),
        nrows_udaf("n_chars").alias("n_docs"),
    )


@register(
    "corpus_curation_pipeline",
    """
    WITH x AS (
        SELECT doc_id, source, string_split_regex(text, '\\s+') AS tk
        FROM documents
    ), m AS (
        SELECT doc_id, source,
               len(tk) >= 30
               AND list_sum(list_transform(tk, w -> length(w))) / len(tk)
                   BETWEEN 3.0 AND 10.0
               AND len(list_filter(tk, w -> length(w) <= 2)) / len(tk) <= 0.08
               AND len(list_distinct(tk)) / len(tk) >= 0.45 AS keep_quality
        FROM x
    ), firsts AS (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_doc
        FROM documents
    ), survivors AS (
        SELECT m.doc_id, m.source,
               m.keep_quality AND f.doc_id = f.keep_doc AS keep
        FROM m JOIN firsts f ON m.doc_id = f.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(SUM(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
               AS keep_rate
    FROM survivors GROUP BY source
    """,
    doc="End-to-end curation pass as ONE query: Gopher-style quality "
    "rules AND exact-dup first-occurrence survival, rolled up to a "
    "per-source keep-rate report — the number a dataset release tracks "
    "per ingest. The quality leg is shuffle-free; dedup survival "
    "shuffles (md5, doc_id) only; the rollup output is bounded by "
    "source cardinality. Composes text_quality_filter + dedup_exact "
    "semantics without rescanning between stages.",
)
def corpus_curation_pipeline(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = textops.tokens("text")
    n_words = F.size(tk)
    mean_len = (
        F.expr("aggregate(split(text, '\\\\s+'), 0, (acc, w) -> acc + length(w))")
        / n_words
    )
    short_frac = (
        F.size(F.expr("filter(split(text, '\\\\s+'), w -> length(w) <= 2)")) / n_words
    )
    distinct_ratio = F.size(F.array_distinct(tk)) / n_words
    keep_quality = (
        (n_words >= 30)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (short_frac <= 0.08)
        & (distinct_ratio >= 0.45)
    )
    from pyspark.sql import Window as W

    keep_doc = F.min("doc_id").over(W.partitionBy(F.md5("text")))
    keep = keep_quality & (F.col("doc_id") == keep_doc)
    return (
        d.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(F.col("keep"), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("keep_rate"),
        )
    )


@register(
    "text_tfidf_top_terms",
    r"""
    WITH tok AS (
        SELECT source, lower(tk) AS term
        FROM documents, UNNEST(string_split_regex(text, '\s+')) AS u(tk)
        WHERE length(tk) >= 4
    ), tf AS (
        SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
        SELECT term, COUNT(*) AS n_sources FROM tf GROUP BY 1
    ), n AS (
        SELECT COUNT(DISTINCT source) AS total_sources FROM documents
    )
    SELECT source, term, tf, rnk FROM (
        SELECT tf.source, tf.term, tf.tf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf.source
                   ORDER BY round(tf.tf * CAST((SELECT total_sources FROM n) AS DOUBLE)
                                  / df.n_sources, 6) DESC,
                            tf.term) AS INTEGER) AS rnk
        FROM tf JOIN df ON tf.term = df.term
    ) WHERE rnk <= 5
    """,
    doc="Distinctive vocabulary per source: TF-IDF-shaped score "
    "tf * total_sources / doc_frequency (a ratio, not log-idf — "
    "log()'s last-ulp varies across libm builds, a single double "
    "division does not), top-5 terms per source with a total "
    "tie-break. Two partial-agg shuffles (term counts, doc "
    "frequency), a term-keyed join, and the rank runs per source on "
    "the aggregated term table — raw tokens never pass a window.",
)
def text_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", r"\s+")).alias("tk")
    ).filter(F.length("tk") >= 4)
    tf = (
        tok.select("source", F.lower("tk").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("n_sources"))
    total = d.agg(
        F.countDistinct("source").alias("total_sources")
    )
    score = F.round(
        F.col("tf") * F.col("total_sources").cast("double") / F.col("n_sources"),
        6,
    )
    w = W.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("source", "term", "tf", "rnk")
    )


@register(
    "text_bigram_lm_score",
    r"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents
    ), bg AS (
      SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
             ws[CAST(i + 1 AS INTEGER)] AS w2
      FROM tk, UNNEST(range(1, len(ws))) AS r(i)
    ), cbg AS (
      SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
    ), cw1 AS (
      SELECT w1, SUM(c) AS c1 FROM cbg GROUP BY w1
    ), scored AS (
      SELECT b.doc_id,
             CAST(round(ln(CAST(cbg.c AS DOUBLE) / c1.c1), 8)
                  AS DECIMAL(12,8)) AS lp
      FROM bg b JOIN cbg USING (w1, w2) JOIN cw1 c1 USING (w1)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
    doc="CCNet-style LM quality score: train a bigram model on the "
    "corpus itself (two hash aggregates bounded by vocab^2), then "
    "score every document by its mean log P(w2|w1) — the perplexity "
    "proxy used to rank web text before training. Per-bigram log "
    "probs are rounded then summed as DECIMAL, so the corpus-sized "
    "score join stays engine-exact; at 100 TB the model table is the "
    "aggregated bigram dictionary (prunable to top-K with smoothing), "
    "never raw text.",
)
def text_bigram_lm_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # NO spread here (measured r14): the bigram projection is light
    # enough that the added exchange+barrier cost more than the
    # single-partition map work it parallelized (1.09 -> 1.37 s A/B)
    tk = d.select(
        "doc_id", textops.tokens("text").alias("ws")
    ).where(F.size("ws") >= 2)
    # int-sequence explode + row-level indexing (the codegen shape of
    # _bpe_pair_counts / source_ngram_jaccard): no interpreted per-doc
    # struct-array build, and BOTH consumers of bg (the model agg and
    # the corpus-sized score join) re-derive it inside codegen
    bg = tk.select(
        "doc_id",
        "ws",
        F.explode(F.expr("sequence(1, size(ws) - 1)")).alias("i"),
    ).select(
        "doc_id",
        F.expr("element_at(ws, i)").alias("w1"),
        F.expr("element_at(ws, i + 1)").alias("w2"),
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    cw1 = cbg.groupBy("w1").agg(F.sum("c").alias("c1"))
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cw1, ["w1"])
        .select(
            "doc_id",
            F.round(F.log(F.col("c").cast("double") / F.col("c1")), 8)
            .cast("decimal(12,8)")
            .alias("lp"),
        )
    )
    # raw double division of the exact DECIMAL sum: identical operands
    # on both engines -> identical double; a ROUND at a position the
    # rational can terminate at would be engine-divergent
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("lp").cast("double") / F.count("*")).alias("avg_logp"),
    )


@register(
    "quality_classifier_score",
    f"""
    WITH x AS (
        SELECT doc_id, text,
               string_split_regex(text, '\\s+') AS tk,
               length(text) AS n_char
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(tk) AS n_tok,
               (n_char - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 / n_char AS punct_raw,
               len(list_filter(tk, w -> w IN ({{stops}})))
                 / len(tk) AS stop_raw,
               list_sum(list_transform(tk, w -> length(w)))
                 / len(tk) AS mean_raw
        FROM x
    ), z AS (
        SELECT doc_id,
               -1.2 + 0.6 * ln(CAST(n_tok AS DOUBLE)) - 6.0 * punct_raw
                    + 2.5 * stop_raw + 0.15 * least(mean_raw, 10.0) AS z
        FROM m
    )
    SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
           1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
    FROM z
    """.replace("{stops}", _STOPS),
    doc="Model-based quality filtering: a fixed-weight logistic "
    "classifier head over the heuristic features (log token count, "
    "punctuation ratio, stopword ratio, capped mean token length) — "
    "the fastText-classifier stage of a pretraining pipeline, "
    "expressed as pure scan-side arithmetic. Zero shuffles, zero "
    "UDFs; at 100 TB this runs at parquet-scan speed. Swap the "
    "hardcoded weights for trained ones without changing the plan.",
)
def quality_classifier_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = textops.tokens("text")
    n_char = F.length("text")
    punct_raw = (
        n_char - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    ) / n_char
    stop_raw = (
        F.size(F.expr(f"filter(split(text, '\\\\s+'), w -> w IN ({_STOPS}))"))
        / F.size(toks)
    )
    mean_raw = (
        F.expr("aggregate(split(text, '\\\\s+'), 0, (acc, w) -> acc + length(w))")
        / F.size(toks)
    )
    z = (
        F.lit(-1.2)
        + 0.6 * F.log(F.size(toks).cast("double"))
        - 6.0 * punct_raw
        + 2.5 * stop_raw
        + 0.15 * F.least(mean_raw, F.lit(10.0))
    )
    score = 1.0 / (1.0 + F.exp(-z))
    return d.select(
        "doc_id",
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("keep"),
    )


@register(
    "vocab_drift_snapshots",
    r"""
    WITH tk AS (
      SELECT doc_id % 2 AS half, unnest(string_split_regex(text, '\s+')) AS w
      FROM documents
    ), counts AS (
      SELECT w,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM tk GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(n0) AS BIGINT) AS t0, CAST(SUM(n1) AS BIGINT) AS t1
      FROM counts
    ), scored AS (
      SELECT w, n0, n1,
             (CAST(n1 + 1 AS DOUBLE) * (t0 + 1))
               / ((t1 + 1) * CAST(n0 + 1 AS DOUBLE)) AS drift_ratio
      FROM counts, tot
      WHERE n0 + n1 >= 20
    )
    SELECT w, n0, n1, drift_ratio FROM (
      SELECT w, n0, n1, drift_ratio,
             ROW_NUMBER() OVER (
               ORDER BY GREATEST(drift_ratio, 1.0 / drift_ratio) DESC, w)
               AS rn
      FROM scored)
    WHERE rn <= 20
    """,
    doc="Vocabulary drift between two corpus snapshots (halves by "
    "doc_id parity standing in for release N vs N+1): add-one-smoothed "
    "relative term-rate ratio, top-20 most-drifted terms in either "
    "direction — the dataset-drift monitor that catches a scraped "
    "source changing under you. Counting is one token aggregate "
    "(vocab-bounded), totals ride a single-row broadcast, and the "
    "top-20 is a TakeOrderedAndProject (per-partition heaps, no "
    "global sort or window) on the filtered term table, never raw "
    "tokens. The ratio is "
    "an identical double expression over exact integers on both "
    "engines — no rounding step.",
)
def vocab_drift_snapshots(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(textops.tokens("text")).alias("w"),
    )
    counts = tk.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    tot = counts.agg(
        F.sum("n0").cast("bigint").alias("t0"),
        F.sum("n1").cast("bigint").alias("t1"),
    )
    scored = (
        counts.where(F.col("n0") + F.col("n1") >= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "n0",
            "n1",
            (
                (F.col("n1") + 1).cast("double") * (F.col("t0") + 1)
                / ((F.col("t1") + 1) * (F.col("n0") + 1).cast("double"))
            ).alias("drift_ratio"),
        )
    )
    # global top-20 as orderBy().limit() — compiles to
    # TakeOrderedAndProject (per-partition heaps + driver merge of 20
    # rows), never a single-partition row_number window
    return (
        scored.orderBy(
            F.desc(
                F.greatest(F.col("drift_ratio"), 1.0 / F.col("drift_ratio"))
            ),
            F.asc("w"),
        )
        .limit(20)
        .select("w", "n0", "n1", "drift_ratio")
    )


@register(
    "lang_id_confusion",
    f"""
    SELECT lang AS lang_true, {_PRED_DUCK} AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, {_PRED_DUCK}
    """,
    doc="Language-ID confusion matrix: the classifier-eval shape — "
    "predicted vs labeled language counts in one aggregate over the "
    "scan-side argmax scores. This is how a curation run validates its "
    "lang-ID stage against a labeled sample before trusting it at "
    "100 TB; the matrix is bounded by langs^2 regardless of corpus "
    "size.",
)
def lang_id_confusion(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # spread: the argmax CASE fold re-evaluates per-language stopword
    # filters over every doc's token array scan-side; on the
    # single-partition test scan that work would pin to one core
    # (no-op at real scan parallelism)
    return (
        spread(d).select(
            F.col("lang").alias("lang_true"),
            F.expr(_PRED_SPARK).alias("lang_pred"),
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "corpus_token_budget_select",
    f"""
    WITH x AS (
        SELECT doc_id, text,
               string_split_regex(text, '\\s+') AS tk,
               length(text) AS n_char
        FROM documents
    ), scored AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               round((10 * (len(list_filter(tk, w -> w IN ({_STOPS})))
                            / len(tk))
                      + least(list_sum(list_transform(tk, w -> length(w)))
                              / len(tk), 10.0)) / 20, 6) AS quality
        FROM x
    ), ranked AS (
        SELECT doc_id, n_tokens, quality,
               SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked
    WHERE cum_tokens - n_tokens < 10000
    """,
    doc="Token-budget curriculum selection: rank documents by quality "
    "and keep the best until a 10k-token training budget is exhausted "
    "(a doc is admitted if it STARTS within budget) — how a curation "
    "run fills a fixed compute budget with the best data first. The "
    "sort and cumulative sum run on the doc-grain (id, tokens, "
    "quality) triple — never text — and the cumsum is exact integer "
    "tokens, so the cut line is engine-deterministic; ties break on "
    "doc_id. The running sum is the two-phase bucketed prefix sum "
    "(operators/prefix.py) — quantile-bucketed local cumsums plus "
    "broadcast bucket offsets — NOT a global window, so no row ever "
    "funnels through a single task at 100 TB.",
)
def corpus_token_budget_select(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = textops.tokens("text")
    stop_raw = (
        F.size(F.expr(f"filter(split(text, '\\\\s+'), w -> w IN ({_STOPS}))"))
        / F.size(toks)
    )
    mean_raw = (
        F.expr("aggregate(split(text, '\\\\s+'), 0, (acc, w) -> acc + length(w))")
        / F.size(toks)
    )
    scored = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            (10 * stop_raw + F.least(mean_raw, F.lit(10.0))) / 20, 6
        ).alias("quality"),
    )
    ranked = prefix.global_cumsum(
        scored,
        [F.desc("quality"), F.asc("doc_id")],
        "n_tokens",
        "cum_tokens",
        proxy=F.col("quality"),
        proxy_desc=True,
        # materialize the doc-grain triple once: tokenization is the
        # expensive part and must not rerun per prefix branch
        checkpoint=True,
    )
    return ranked.where(
        F.col("cum_tokens") - F.col("n_tokens") < 10000
    ).select(
        "doc_id", "n_tokens", "quality",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


@register(
    "text_ngram_topk_per_lang",
    """
    WITH tk AS (
        SELECT lang, string_split_regex(text, '\\s+') AS tk FROM documents
    ), bg AS (
        SELECT lang,
               unnest(list_transform(
                   range(1, greatest(len(tk) - 1, 0) + 1),
                   i -> tk[i] || ' ' || tk[i + 1])) AS bigram
        FROM tk
    ), counts AS (
        SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2
    )
    SELECT lang, bigram, CAST(n AS BIGINT) AS n, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT lang, bigram, n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n DESC, bigram) AS rnk
        FROM counts
    ) WHERE rnk <= 10
    """,
    doc="Top-10 token bigrams per language — the per-language "
    "tokenizer/vocab audit next to the global text_vocab_topk "
    "(a multilingual corpus hides each language's hot collocations "
    "under the dominant language's). Bigrams fan out map-side, the "
    "count is one (lang, bigram) partial-agg shuffle, and the rank "
    "window is PARTITIONED by lang over the aggregated term table — "
    "never raw tokens, never a global sort.",
)
def text_ngram_topk_per_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # tokenize ONCE into a column; building bigrams from split(text)
    # inline re-splits the text per lambda reference (Catalyst does not
    # CSE inside higher-order functions) — 3x the regex work, measured
    # 4.9 s vs 1.0 s at sf0.1
    # int-sequence explode + row-level concat (the codegen shape of
    # _bpe_pair_counts / source_ngram_jaccard); size(tk) >= 2 guard via
    # the where, since sequence(1, 0) would descend
    counts = (
        d.select("lang", F.expr("split(text, '\\\\s+')").alias("tk"))
        .where(F.size("tk") >= 2)
        .select(
            "lang",
            "tk",
            F.explode(F.expr("sequence(1, size(tk) - 1)")).alias("i"),
        )
        .select(
            "lang",
            F.expr(
                "concat(element_at(tk, i), ' ', element_at(tk, i + 1))"
            ).alias("bigram"),
        )
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 10)
        .select("lang", "bigram", F.col("n").cast("bigint").alias("n"), "rnk")
    )


@register(
    "vocab_oov_by_source",
    f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        ORDER BY c DESC, tok ASC LIMIT 16
      )
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source
    """,
    doc="Vocabulary-coverage / OOV-rate audit per source: build the "
    "top-16 word vocabulary from corpus frequency (ties broken "
    "alphabetically, so the cut is deterministic), then measure what "
    "fraction of each source's token occurrences falls outside it — "
    "the fixed-vocab analogue of tokenizer fertility, and the number "
    "that tells you which sources a frozen vocab under-serves. At "
    "100 TB: token counts collapse map-side to word grain (vocab-sized, "
    "not corpus-sized), the vocab is a 16-row broadcast, and the "
    "corpus side is one scan + explode feeding a broadcast hash join "
    "— no token-grain shuffle anywhere.",
)
def vocab_oov_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.expr(_SPARK_TOKS)).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(16)
        .select(F.col("tok").alias("vtok"))
    )
    j = toks.join(F.broadcast(vocab), toks["tok"] == vocab["vtok"], "left")
    oov = F.sum(F.when(F.col("vtok").isNull(), 1).otherwise(0))
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total_tokens"),
        oov.cast("bigint").alias("oov_tokens"),
        (oov.cast("double") / F.count("*").cast("double")).alias("oov_rate"),
    )


@register(
    "text_bm25_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(ln((CAST(s.n_docs - df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0), 8)
               * (CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (0.25 + (0.75 * CAST(dl.dl AS DOUBLE)) / s.avgdl))
               AS bm25
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
      JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, bm25, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT doc_id, term, bm25,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY bm25 DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="Okapi BM25 (k1=1.2, b=0.75, the Lucene-default +1 idf floor): "
    "top-3 scoring terms per document — the retrieval scorer behind "
    "search-based decontamination and RAG corpus indexing. "
    "Determinism: the one transcendental (ln of the idf ratio) is "
    "rounded to 8 decimals the moment it is computed (same pattern as "
    "text_bigram_lm_score); every other op is IEEE double arithmetic "
    "on identical expression trees, so ranks and scores hash-match "
    "across engines. At 100 TB the df and corpus-stats tables are "
    "vocabulary-sized broadcasts, tf/dl collapse map-side at "
    "(doc, term) / doc grain, and the top-3 window is doc-partitioned.",
)
def text_bm25_top_terms(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # doc length from the tf relation (vocab-bounded), not a second
    # corpus-scale explode — and as a doc-partitioned window rather
    # than a groupBy + join back, so the doc_id exchange it forces is
    # the SAME one the final top-3 window needs (one barrier instead
    # of an aggregate job + a join)
    wd = W.partitionBy("doc_id")
    tfd = tf.withColumn("dl", F.sum("tf").over(wd))
    stats = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.round(
        F.log(
            ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        8,
    )
    scored = (
        tfd.join(F.broadcast(stats))
        .join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            (
                idf
                * (F.col("tf").cast("double") * F.lit(2.2))
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + (F.lit(0.75) * F.col("dl").cast("double"))
                        / F.col("avgdl")
                    )
                )
            ).alias("bm25"),
        )
    )
    wr = W.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "bm25", "rnk")
    )


@register(
    "text_unigram_entropy_by_lang",
    f"""
    WITH tok AS (
      SELECT lang, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), tc AS (
      SELECT lang, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), lt AS (
      SELECT lang, SUM(c) AS n, COUNT(*) AS vocab FROM tc GROUP BY lang
    )
    SELECT t.lang,
           CAST(MAX(l.n) AS BIGINT) AS n_tokens,
           CAST(MAX(l.vocab) AS BIGINT) AS vocab_size,
           -(CAST(SUM(CAST(t.c AS DECIMAL(20,0))
                      * CAST(round(ln(CAST(t.c AS DOUBLE) / l.n), 8)
                             AS DECIMAL(12,8))) AS DOUBLE)
             / MAX(l.n)) AS entropy_nats
    FROM tc t JOIN lt l ON t.lang = l.lang
    GROUP BY t.lang
    """,
    doc="Unigram entropy per language, H = -sum p ln p — the lexical-"
    "diversity number behind language-mix and tokenizer-budget "
    "decisions (a language whose corpus entropy is far below its "
    "peers is repetitive scrape, not coverage). Engine-exact via the "
    "house rounded-log DECIMAL-sum rule: each ln(p) rounds to 8 "
    "decimals at the source, is multiplied by the exact integer count "
    "in DECIMAL, and the order-independent DECIMAL sum is divided by "
    "n once at emit. Token counts collapse map-side to (lang, word) "
    "grain — vocabulary-sized, not corpus-sized — before any join.",
)
def text_unigram_entropy_by_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.expr(_SPARK_TOKS)).alias("tok"))
    tc = tok.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    lt = tc.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count("*").alias("vocab")
    )
    j = tc.join(F.broadcast(lt), "lang")
    lp = F.round(F.log(F.col("c").cast("double") / F.col("n")), 8).cast(
        "decimal(12,8)"
    )
    return j.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_tokens"),
        F.max("vocab").cast("bigint").alias("vocab_size"),
        (
            -(
                F.sum(F.col("c").cast("decimal(20,0)") * lp).cast("double")
                / F.max("n")
            )
        ).alias("entropy_nats"),
    )


@register(
    "tokens_per_doc_gini",
    f"""
    WITH d AS (
      SELECT source, doc_id,
             len({_DUCK_TOKS}) AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT source, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_tokens, doc_id) AS i,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM d
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(2 * SUM(i * n_tokens) - (MAX(n) + 1) * SUM(n_tokens)
                AS DOUBLE)
             / (MAX(n) * SUM(n_tokens)) AS gini
    FROM ranked GROUP BY source
    """,
    doc="Token-mass Gini coefficient per source (G = (2*sum(i*x_i) - "
    "(n+1)*sum(x)) / (n*sum(x)) over length-ranked docs): how "
    "concentrated a source's token budget is in its longest documents "
    "— a high-Gini source's 'coverage' is really a few giants, which "
    "changes both sampling and packing strategy. The rank runs "
    "PARTITIONED by source (doc_id tiebreak), every sum is exact "
    "BIGINT, and the single division happens at emit. At 100 TB the "
    "within-source rank is the usual two-phase bounded-window shape; "
    "the formula needs only (rank x value) products, no pairwise "
    "|x_i - x_j| expansion.",
)
def tokens_per_doc_gini(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr("size(split(text, '\\\\s+'))").alias("n_tokens"),
    )
    wp = W.partitionBy("source")
    ranked = d.select(
        "source",
        "n_tokens",
        F.row_number().over(wp.orderBy("n_tokens", "doc_id")).alias("i"),
        F.count("*").over(wp).alias("n"),
    )
    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (
            (
                2 * F.sum(F.col("i") * F.col("n_tokens"))
                - (F.max("n") + 1) * F.sum("n_tokens")
            ).cast("double")
            / (F.max("n") * F.sum("n_tokens"))
        ).alias("gini"),
    )


@register(
    "text_hapax_rate_by_source",
    """
    WITH toks AS (
        SELECT source, lower(tok) AS tok
        FROM (SELECT source,
                     unnest(string_split_regex(text, '\\s+')) AS tok
              FROM documents)
        WHERE tok <> ''
    ), tc AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS ttr,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS hapax_rate
    FROM tc GROUP BY source
    """,
    doc="Type-token ratio and hapax-legomena rate per source — the "
    "lexical-richness screen next to unigram entropy: sources with "
    "abnormally LOW hapax rate are template/boilerplate mills, "
    "abnormally HIGH suggests OCR noise or ID-heavy spam; both get "
    "routed to the quality filters. Same whitespace tokenizer as the "
    "vocab/BPE entries (textops.tokens). Two-level integer aggregate: "
    "the (source,token)-keyed count folds map-side so the shuffle "
    "carries partial counts, the per-source reduce is type-grain; "
    "ratios are exact-int divisions, identical on both engines.",
)
def text_hapax_rate_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "source", F.explode(textops.tokens("text")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select("source", F.lower("tok").alias("tok"))
    )
    tc = toks.groupBy("source", "tok").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return tc.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        hapax.cast("bigint").alias("n_hapax"),
        (F.count("*").cast("double") / F.sum("cnt")).alias("ttr"),
        (hapax.cast("double") / F.count("*")).alias("hapax_rate"),
    )


_ZIPF_K = 128


@register(
    "text_zipf_slope",
    f"""
    WITH tc AS (
        SELECT lower(tok) AS tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY lower(tok)
    ), ranked AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
        FROM tc ORDER BY cnt DESC, tok LIMIT {_ZIPF_K}
    ), pts AS (
        SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
               CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
        FROM ranked
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS k_terms,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS zipf_slope
    FROM s
    """,
    doc="Zipf-law slope of the corpus: OLS fit of log-frequency against "
    "log-rank over the top-128 tokens (natural text tracks ~-1; "
    "template/boilerplate corpora flatten, ID/spam corpora steepen — "
    "a one-number corpus-health prior next to the hapax and entropy "
    "screens). The corpus-scale work is one (token)-keyed partial-agg "
    "shuffle and a TakeOrderedAndProject top-k — never a global sort; "
    "the regression runs on 128 rows. log points quantize to exact "
    "micro-units before the integer sufficient-statistic sums (their "
    "squares stay well inside int64, where nano-grain would overflow; "
    "log is 1-ulp libm-dependent); the closed-form slope over exact "
    "ints is then emitted unrounded — identical on both engines.",
)
def text_zipf_slope(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(textops.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(F.lower("tok").alias("tok"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    ranked = (
        tc.orderBy(F.col("cnt").desc(), "tok")
        .limit(_ZIPF_K)
        .select(
            "cnt",
            F.row_number()
            .over(W.orderBy(F.col("cnt").desc(), "tok"))
            .alias("rnk"),
        )
    )
    q = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("bigint")
    pts = ranked.select(
        q(F.col("rnk")).alias("x"), q(F.col("cnt")).alias("y")
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    # inputs are exact ints, so the slope double is bit-identical
    # unrounded; round(x, 9) itself is NOT cross-engine stable
    return s.select(F.col("n").alias("k_terms"), slope.alias("zipf_slope"))


@register(
    "source_ngram_jaccard",
    f"""
    WITH post AS (
        SELECT DISTINCT source, g
        FROM (SELECT source,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(length(text) - 4, 1) + 1),
                         i -> substr(text, i, 5)))) AS g
              FROM documents)
    ), sz AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM post GROUP BY source
    ), inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM post a
        JOIN post b ON a.g = b.g AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_common,
           sa.n_grams AS n_a, sb.n_grams AS n_b,
           CAST(i.n_common AS DOUBLE)
               / (sa.n_grams + sb.n_grams - i.n_common) AS jaccard
    FROM inter i
    JOIN sz sa ON i.source_a = sa.source
    JOIN sz sb ON i.source_b = sb.source
    """,
    doc="Cross-SOURCE 5-gram Jaccard overlap matrix: per source the "
    "distinct char-5-gram hash set, per source pair |A intersect B| / "
    "|A union B| — the corpus-level contamination screen that catches "
    "one feed republishing another (mirrors, scrapes of scrapes) "
    "before per-doc dedup even runs; the per-doc entries "
    "(dedup_rate_by_source) see the trees, this sees the forest. The "
    "postings table (source, gram-hash, distinct) is materialized "
    "once; the intersection is NOT a postings self-join — one "
    "gram-keyed groupBy collects each gram's source set (bounded by "
    "the source dictionary) and pairs explode MAP-SIDE from the "
    "sorted array (the basket_brand_affinity shape), so total cost "
    "is O(grams x sources-per-gram^2) with a single exchange, never "
    "doc-pair-quadratic. Counts are exact bigints; Jaccard is one "
    "IEEE-exact division. Pairs sharing zero grams are absent "
    "(inner-join grain, documented). The oracle keeps the textbook "
    "self-join formulation — same values, plan-independent.",
)
def source_ngram_jaccard(spark, sf_dir):
    return source_ngram_pairs(t(spark, sf_dir, "documents"))


def source_ngram_pairs(d):
    """Cross-source 5-gram Jaccard core over a (source, text) frame —
    extracted so tests/test_scale_stress.py can drive it on unioned
    input (the pair explode is quadratic in sources sharing a gram).
    See the catalog entry's doc for the plan rationale."""
    # distinct (source, gram) postings, materialized once
    # (MEMORY_AND_DISK — spills, never recomputes): sizes and the
    # intersection fold would otherwise rescan + re-hash documents
    # raw gram STRINGS, not md5 hashes: set intersection only needs
    # distinct identity, and skipping the digest halves the scan cost
    # (md5 exists in the LSH family for fixed-width SIGNATURES; here
    # it bought nothing — measured 5.6 s -> 2.6 s for the postings
    # materialization at sf0.1)
    # int-sequence explode + ROW-level substring, NOT a per-doc
    # array_distinct of a shingle array: the higher-order-function
    # array build allocated a ~2000-string array + dedup set per doc
    # outside whole-stage codegen, while this shape pipelines
    # generate -> substring -> partial distinct entirely in codegen
    # and lets the distinct's map-side partial agg do the dedup
    # (measured at sf0.1: postings stage 3.12 s -> 2.11 s, identical
    # rows; guide §4 "keep work inside codegen" applied to a
    # JVM-internal boundary)
    # spread the single-partition corpus scan first: the explode +
    # substring + partial-distinct chain below is ~300 gram rows per
    # doc and would otherwise run entirely on one core (one-row-group
    # parquet input); at 100 TB the scan is already thousands of
    # splits and spread() no-ops (guide §2.5 input skew)
    post = (
        spread(d)
        .select(
            "source",
            "text",
            F.explode(
                F.expr("sequence(1, greatest(length(text) - 4, 1))")
            ).alias("i"),
        )
        .select("source", F.expr("substring(text, i, 5)").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = post.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    # NO postings self-join (the basket_brand_affinity trick): one
    # gram-keyed groupBy collects each gram's source set (bounded by
    # the source dictionary), pairs explode MAP-SIDE from the sorted
    # array, and the pair counts aggregate on source-pair grain —
    # one exchange where the join shape paid two plus the join
    per_gram = (
        post.groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .where(F.size("srcs") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(srcs, (x, i) -> "
            "transform(slice(srcs, i + 2, size(srcs)), "
            "y -> struct(x AS source_a, y AS source_b))))"
        )
    ).alias("p")
    inter = (
        per_gram.select(pair)
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sz.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("n_a")
    )
    sb = sz.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@register(
    "text_simpson_diversity_by_lang",
    """
    WITH tc AS (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM (SELECT lang, unnest(string_split_regex(text, '\\s+')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY lang, tok
    ), s AS (
        SELECT lang,
               CAST(SUM(n_t) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CAST(n_t AS DECIMAL(19,0))
                        * CAST(n_t - 1 AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS coll
        FROM tc GROUP BY lang
    )
    SELECT lang, n_tokens, n_types,
           CAST(coll AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1))
               AS simpson_lambda,
           1.0 - CAST(coll AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1))
               AS simpson_diversity
    FROM s WHERE n_tokens >= 2
    """,
    doc="Simpson lexical concentration per language: lambda = sum "
    "n_t(n_t-1) / N(N-1), the probability two random tokens are the "
    "same type (Simpson 1949) — the repetitiveness twin of "
    "text_unigram_entropy_by_lang (entropy weights the long tail, "
    "Simpson the head: a template-spam source spikes lambda first). "
    "All sufficient statistics are exact integers — term counts fold "
    "map-side into (lang, type)-grain rows, the collision sum "
    "accumulates as DECIMAL(38,0) (n_t^2 overflows int64 once a "
    "term's count passes ~3e9 at corpus scale) — and both emitted "
    "doubles are the identical IEEE division, so the entry is "
    "bit-equal across engines with NO transcendental and NO "
    "rounding at all. Language grain output.",
)
def text_simpson_diversity_by_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("lang", F.explode(textops.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("bigint").alias("n_t"))
    )
    coll = F.sum(
        F.col("n_t").cast("decimal(19,0)")
        * (F.col("n_t") - 1).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    s = tc.groupBy("lang").agg(
        F.sum("n_t").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        coll.alias("coll"),
    )
    lam = F.col("coll").cast("double") / (
        F.col("n_tokens").cast("double") * (F.col("n_tokens") - 1)
    )
    return s.where(F.col("n_tokens") >= 2).select(
        "lang",
        "n_tokens",
        "n_types",
        lam.alias("simpson_lambda"),
        (F.lit(1.0) - lam).alias("simpson_diversity"),
    )
