"""Deduplication operators for large-scale corpus curation.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup as pure
DataFrame transforms over a (id, text) corpus. The reference system
has no dedup at all; these are the training-data-pipeline operators
the engine adds (BASELINE.json north star).

100 TB design notes
-------------------
* exact_dedup: shuffles only (hash, id) — never the payload.
* MinHash: signatures are computed scan-side (no shuffle), the LSH
  band self-join shuffles (band_hash, id) pairs only; md5 is uniform
  so bucket skew is bounded; candidate pairs are verified without
  re-reading documents.
* Pairwise operators take a blocking column — at scale you NEVER do
  an unblocked self-join; LSH buckets, sources, or length buckets
  bound the quadratic term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dsp_spark.operators import textops
from dsp_spark.session import spread


def exact_dedup(df: DataFrame, id_col: str, *content_cols: str) -> DataFrame:
    """Group identical content by hash; keep the smallest id as survivor."""
    h = F.md5(F.concat_ws("\x1f", *content_cols)).alias("content_hash")
    return df.groupBy(h).agg(
        F.min(id_col).alias(f"keep_{id_col}"), F.count("*").alias("n_copies")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    k: int = 5,
    token_gram: int | None = None,
) -> DataFrame:
    """n_hashes MinHash values per doc: one md5 per distinct base unit,
    then affine permutations — the base-hash array is materialized once
    so hash work is O(len), not O(len * n_hashes).

    Default base units are char-k-gram shingles (the dedup family's
    order-sensitive similarity). ``token_gram=n`` switches to distinct
    token n-grams: the sketch then estimates the token-run Jaccard a
    decontamination verify thresholds (see textops.token_gram_hashes
    for why neither unigram tokens nor char shingles work there).
    Docs with no fingerprintable n-gram run are DROPPED in that mode —
    they have nothing to band on (their null minhash would otherwise
    collide with every other gramless doc via md5(''))."""
    if token_gram is not None:
        base = (
            spread(df)
            .select(F.col(id_col), textops.tokens(text_col).alias("__tk"))
            .select(
                F.col(id_col),
                textops.token_gram_hashes("__tk", token_gram).alias("_hs"),
            )
            .filter(F.size("_hs") > 0)
        )
    else:
        base = spread(df).select(
            F.col(id_col), textops.shingle_hashes(text_col, k).alias("_hs")
        )
    return base.select(
        F.col(id_col),
        *[
            textops.minhash_from_hashes("_hs", s).alias(f"mh{s}")
            for s in range(n_hashes)
        ],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band.

    rows-per-band = n_hashes // bands; a pair collides in a band iff
    that slice of the signature is identical, so P(candidate) rises
    sharply with Jaccard similarity (the standard banding S-curve).
    """
    sig = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, k=k)
    return lsh_pairs_from_signatures(
        sig, id_col, n_hashes=n_hashes, bands=bands
    )


def lsh_pairs_from_signatures(
    sig: DataFrame, id_col: str, *, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band self-join over an EXISTING signature frame (mh0..mhN-1).

    The single source of truth for the banding scheme — callers that
    already hold (and perhaps checkpointed) signatures reuse it here
    instead of re-deriving bands, so the layout can never diverge
    between the pair generator and signature-sharing entries.
    """
    bands_df = _bands_of(sig, id_col, n_hashes=n_hashes, bands=bands)
    return lsh_pairs_from_bands(bands_df, id_col)


def lsh_pairs_from_bands(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Band self-join over an EXISTING (id, band_idx, band_hash) table
    (e.g. a checkpointed/persisted band index shared with an
    asymmetric probe join)."""
    # shuffle-hash, not broadcast: both sides then shuffle on the same
    # (band_idx, band_hash) key with identical child plans, so Spark's
    # ReuseExchange computes the signatures ONCE (2x saving) — and at
    # corpus scale broadcasting the full band table is impossible anyway
    a = bands_df.alias("a").hint("shuffle_hash")
    b = bands_df.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _bands_of(
    sig: DataFrame, id_col: str, *, n_hashes: int, bands: int
) -> DataFrame:
    """(id, band_idx, band_hash) rows from a signature frame — the one
    definition of the band layout, shared by the self-join and the
    asymmetric cross-join candidate generators."""
    rows = n_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
            )
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )


def lsh_cross_pairs(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    bands: int = 2,
    k: int = 5,
    token_gram: int | None = None,
) -> DataFrame:
    """Asymmetric LSH banding: candidate near-dup pairs between a large
    corpus and a SMALL probe set (eval/benchmark docs, a blocklist, a
    takedown batch). Returns (id_a = corpus doc, id_b = probe doc).

    The scale shape decontamination needs: the corpus side never
    self-joins — its bands stream map-side against a BROADCAST of the
    probe bands (an eval suite is ~1e4-1e6 docs against a ~1e10-doc
    corpus), so the corpus is never shuffled at all. Contrast
    `lsh_pairs_from_signatures`, whose shuffle-hash self-join is the
    right plan when both sides are the full corpus.
    """
    c_bands = _bands_of(
        minhash_signatures(
            corpus, id_col, text_col, n_hashes=n_hashes, k=k,
            token_gram=token_gram,
        ),
        id_col,
        n_hashes=n_hashes,
        bands=bands,
    )
    p_bands = _bands_of(
        minhash_signatures(
            probes, id_col, text_col, n_hashes=n_hashes, k=k,
            token_gram=token_gram,
        ),
        id_col,
        n_hashes=n_hashes,
        bands=bands,
    )
    return (
        c_bands.alias("a")
        .join(
            F.broadcast(p_bands.alias("b")),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (native SQL fold)."""
    tokens_expr = f"split({text_col}, '\\\\s+')"
    return (
        spread(df)
        .select(F.col(id_col), textops.token_hashes(tokens_expr).alias("hs"))
        .select(
            F.col(id_col), textops.simhash16_from_hashes("hs").alias("fingerprint")
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs within a blocking key at Hamming distance <= N."""
    fp = (
        spread(df, block_col)
        .select(
            F.col(id_col),
            F.col(block_col).alias("block"),
            textops.token_hashes(f"split({text_col}, '\\\\s+')").alias("hs"),
        )
        .select(
            F.col(id_col), "block", textops.simhash16_from_hashes("hs").alias("fp")
        )
    )
    a, b = fp.alias("a").hint("shuffle_hash"), fp.alias("b").hint("shuffle_hash")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over blocked pairs, via an inverted index.

    Explode distinct tokens to (block, token, id) posting lists, equi-join
    on (block, token), and count matches per (id_a, id_b): the count IS
    |A∩B|; |union| = |A| + |B| - |A∩B|. All hash joins + partial
    aggregation — no per-pair set allocations, so it beats the
    array_intersect self-join ~3x and is the shape that scales: the
    shuffle carries (block, token, id) postings, never documents, and
    hot-token skew is AQE-splittable. Pairs with an empty intersection
    never materialize, which is correct here because threshold > 0.
    """
    toks = spread(df, block_col).select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        F.array_distinct(textops.tokens(text_col)).alias("toks"),
    )
    tk = toks.select(id_col, "block", F.explode("toks").alias("tok"))
    sizes = toks.select(F.col(id_col), F.size("toks").alias("sz"))
    a, b = tk.alias("a"), tk.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("szb"))
    jac = F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6)
    # no broadcast hint: `sizes` is one row per doc, so at scale AQE must
    # be free to pick a shuffle join; locally it broadcasts on its own
    return (
        co.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_col: str,
    threshold: float = 0.8,
    gram: int = 1,
) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| over blocked pairs.

    Jaccard misses subsumption: a paragraph fully embedded in a 100x
    longer page scores near zero, yet it is exactly the
    quote/boilerplate/scrape-of-a-scrape duplication a corpus cleaner
    must catch (the reason dedup papers track containment separately
    from resemblance). Same inverted-index shape as
    :func:`jaccard_pairs` — postings equi-join on (block, element),
    partial-agg counts, never per-pair set allocation — but DIRECTED:
    both (a,b) and (b,a) emit, each normalized by its own left size.
    The score is a single division of exact int64s, so both engines
    emit the identical double (no rounding step).

    ``gram=1`` compares distinct-TOKEN sets — cheap, but trivially
    high on template/boilerplate-heavy corpora where documents share
    vocabulary without sharing content. ``gram=n`` compares distinct
    token n-GRAM sets: containment then requires shared token RUNS,
    the sequence-aware signal real subsumption detection needs (use
    3 for curation passes).
    """
    if gram > 1:
        # tokenize ONCE into a column first: Catalyst does not CSE
        # inside higher-order-function lambdas, so an inline
        # split(text) would re-run the regex split per gram position
        # a doc shorter than `gram` tokens has NO fingerprintable run:
        # emit an empty gram set (it can neither contain nor be
        # contained), not one collapsed gram — a collapsed gram makes
        # every trivially short/empty doc in a block "contain" every
        # other one at containment = 1.0
        grams = F.expr(
            f"CASE WHEN size(__tk) < {gram} "
            f"THEN CAST(array() AS array<string>) "
            f"ELSE transform(sequence(1, size(__tk) - {gram - 1}), "
            f"i -> concat_ws(' ', slice(__tk, i, {gram}))) END"
        )
        toks = (
            spread(df, block_col)
            .select(
                F.col(id_col),
                F.col(block_col).alias("block"),
                textops.tokens(text_col).alias("__tk"),
            )
            .select(
                id_col, "block", F.array_distinct(grams).alias("toks")
            )
        )
    else:
        toks = spread(df, block_col).select(
            F.col(id_col),
            F.col(block_col).alias("block"),
            F.array_distinct(textops.tokens(text_col)).alias("toks"),
        )
    tk = toks.select(id_col, "block", F.explode("toks").alias("tok"))
    sizes = toks.select(F.col(id_col), F.size("toks").alias("sz"))
    a, b = tk.alias("a"), tk.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a"))
    return (
        co.join(sa, "id_a")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("size_a"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a", "id_b", "n_common", F.col("size_a").cast("bigint").alias("size_a"), "containment"
        )
    )


def connected_components(
    nodes: DataFrame | None,
    edges: DataFrame,
    id_col: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    edges_per_partition: int = 4_000_000,
) -> DataFrame:
    """(id, component) where component = the min node id in the component.

    ``nodes=None`` labels EDGE-INCIDENT nodes only (no singleton
    re-attach): when the caller's node set is exactly the edges'
    endpoint set (incremental_components' contracted graph), the
    singleton anti-join is empty by construction and skipping it saves
    a corpus-grain join + union.

    The clustering step of near-dedup: LSH/Jaccard pairs are edges, each
    connected component is one duplicate group (keep min id, drop the
    rest). Algorithm: partition-local contraction. Every round runs
    union-find inside each edge partition (one Arrow-batched pass, no
    per-pair Python in the driver), folds the resulting (node -> local
    min root) mappings into the label table, and rewrites the edge list
    through the new labels, dropping self-loops. Each round contracts
    every partition-induced subgraph completely, so the surviving edge
    count falls by roughly the partition count per round: O(log_P n)
    rounds, independent of graph diameter.

    Plain min-label propagation needs diameter rounds (26 on the sf0.1
    chain-shaped near-dup graph vs 3 for this), and pointer-jumping
    variants barely help because the min id within a radius is usually
    *near* the node, so the jump target isn't far. Local union-find
    contracts a whole partition in one step instead.

    Scale notes: the shuffled state is (node, label) pairs for
    edge-incident nodes only (singletons — most of the corpus — never
    enter the loop) and the shrinking edge list — never payloads;
    labels/edges are
    localCheckpoint'ed per round so lineage stays flat; the per-round
    fixpoint test is an isEmpty on the checkpointed edges. Residual
    label chains (a -> b -> c from mappings discovered in different
    partitions the same round) are resolved by a final pointer-halving
    loop whose depth is bounded by the round count.
    """
    from pyspark.sql.types import StructField, StructType

    id_type = (nodes if nodes is not None else edges).schema[
        id_col if nodes is not None else src
    ].dataType
    uf_schema = StructType(
        [StructField("node", id_type), StructField("root", id_type)]
    )

    def local_uf(batches):
        import pandas as pd

        parent: dict = {}
        seen: set = set()

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                seen.add(u)
                seen.add(v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        # Emit EVERY endpoint (roots label themselves): the fast path
        # below consumes this as the complete label table, so no
        # distinct-endpoints join is needed to re-attach root nodes.
        # The multi-round loop's fold treats the extra identity rows
        # as no-ops (coalesce keeps the unchanged label).
        if seen:
            ns = list(seen)
            yield pd.DataFrame({"node": ns, "root": [find(n) for n in ns]})

    E = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )

    # Fast path: when the whole edge set fits ONE contraction partition
    # (always true once the residual graph has shrunk; at catalog scale
    # true immediately), a single union-find pass already returns FINAL
    # roots — no label fold, no edge rewrite, no second fixpoint count,
    # no chain resolution, no multi-round loop. Root nodes are absent
    # from the union-find output (only non-roots carry a parent), so
    # coalesce(root, own id) completes the labeling. Cuts the blocking
    # job count per call in half; the general loop below is untouched
    # and takes over past `edges_per_partition`.
    def _out(labels: DataFrame) -> DataFrame:
        if nodes is None:
            return labels.select(
                F.col("node").alias(id_col), F.col("label").alias("component")
            )
        singletons = (
            nodes.select(F.col(id_col).alias("node"))
            .join(labels.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("label"))
        )
        return labels.unionByName(singletons).select(
            F.col("node").alias(id_col), F.col("label").alias("component")
        )

    n_edges_first = E.count()
    if n_edges_first == 0:
        empty = E.select(
            F.col("u").alias("node"), F.col("u").alias("label")
        )
        return _out(empty)
    if n_edges_first <= edges_per_partition:
        # local_uf emits one (node, final root) row per distinct
        # endpoint, so its output IS the complete label table: no
        # distinct-endpoints union, no re-attach join, and no eager
        # checkpoint — E is already checkpointed, so a consumer that
        # replays this branch re-runs only one single-task union-find
        # pass, which is cheaper than materializing the labels as a
        # separate blocking job.
        labels = E.coalesce(1).mapInPandas(local_uf, schema=uf_schema).select(
            F.col("node"), F.col("root").alias("label")
        )
        return _out(labels)

    # Only edge-incident nodes can ever change label; iterating over the
    # full node set would drag every singleton (the vast majority of a
    # near-dup corpus) through each round's joins. Singletons re-attach
    # after the fixpoint with label = own id.
    labels = (
        E.select("u")
        .union(E.select("v"))
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    single_partition_rounds = True
    n_edges = n_edges_first
    for _ in range(max_iter):
        # count() on the checkpointed edges doubles as the fixpoint test
        # and sizes the contraction (the first round reuses the count
        # the fast-path check above already paid for): coalescing to
        # ~edges_per_partition per task means the whole residual graph
        # lands in one partition as soon as it fits, so the next local
        # union-find finishes it in a single round. At full scale this
        # is a no-op until the edge list has already shrunk by the
        # partition count.
        if n_edges == 0:
            break
        target = max(1, -(-n_edges // edges_per_partition))
        if E.rdd.getNumPartitions() > target:
            E = E.coalesce(target)
        if E.rdd.getNumPartitions() > 1:
            single_partition_rounds = False
        rounds += 1
        delta = (
            E.mapInPandas(local_uf, schema=uf_schema)
            .groupBy("node")
            .agg(F.min("root").alias("root"))
        )
        # root <= any node in its local tree, so coalesce (not least) is
        # enough: a mapped label only ever decreases
        labels = (
            labels.join(delta, labels.label == delta.node, "left")
            .select(labels.node, F.coalesce("root", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
        lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
        E = (
            E.join(lu, "u")
            .join(lv, "v")
            .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_edges = E.count()
    # resolve residual mapping chains (a -> b -> c when partitions
    # discover overlapping unions in one round): pointer halving,
    # label := label(label), converges in log(chain depth) passes.
    # When every contraction ran in ONE partition, its union-find already
    # returned final roots — no chains can exist, skip the halving jobs.
    for _ in range(0 if single_partition_rounds else max_iter):
        hop = labels.select(
            F.col("node").alias("label"), F.col("label").alias("hop")
        )
        labels = (
            labels.join(hop, "label", "left")
            .select("node", F.coalesce("hop", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        hop = labels.select(
            F.col("node").alias("label"), F.col("label").alias("hop")
        )
        if (
            labels.join(hop, "label")
            .filter(F.col("hop") < F.col("label"))
            .isEmpty()
        ):
            break
    return _out(labels)


def lsh_new_edges(
    docs: DataFrame,
    new_nodes: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    bands: int = 2,
    k: int = 5,
    band_index: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs involving >= 1 NEW doc — the edge delta an
    ingest batch contributes to the near-dup graph.

    ``band_index``: an already-materialized (id, band_idx, band_hash)
    table for the FULL corpus under the same banding scheme (the
    persisted band index of a real pipeline). When given, ``docs``/
    ``text_col`` are not re-hashed at all — callers that also need the
    base side's pairs (cluster maintenance) share ONE signature pass.

    ``new_nodes`` (one ``id_col`` column) is the ingest batch's ids.
    Its band rows BROADCAST against the full band table (the
    lsh_cross_pairs shape): the corpus side is map-side only — never
    shuffled, never self-joined — so candidate generation is O(new-side
    bucket membership), not O(corpus). New-new pairs fall out of the
    same join because the new docs are part of the corpus band table;
    base-base pairs can never appear (one side is always new), which is
    what makes incremental folding sound: a deterministic banding
    scheme yields identical base-base pairs every release, so the only
    edges the base run hasn't already seen all touch a new doc.

    At production scale the corpus band table is the PERSISTED index
    (signatures are per-doc and immutable); here it is derived in-plan
    because a catalog entry must be a pure function of the tables.
    Returns (id_a < id_b) distinct pairs.
    """
    if band_index is not None:
        all_bands = band_index
    else:
        sig = minhash_signatures(
            docs, id_col, text_col, n_hashes=n_hashes, k=k
        )
        # materialized once: this IS the persisted band index of the real
        # pipeline — without it the probe side and the batch-filter side
        # would each re-scan the corpus text and recompute signatures
        all_bands = _bands_of(
            sig, id_col, n_hashes=n_hashes, bands=bands
        ).localCheckpoint(eager=True)
    new_bands = all_bands.join(
        F.broadcast(new_nodes.select(id_col)), id_col, "semi"
    )
    a, b = all_bands.alias("a"), new_bands.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                "id_b"
            ),
        )
        .distinct()
    )


def incremental_components(
    state: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    id_col: str,
) -> DataFrame:
    """Fold an ingest batch's near-dup edges into a PERSISTED cluster
    assignment without recontracting the base graph.

    ``state`` is the previous release's (id, component) table, where
    component = min id in the component (connected_components'
    invariant). ``new_nodes`` are the batch's ids (disjoint from
    state). ``new_edges`` are candidate pairs each touching >= 1 new
    doc (lsh_new_edges). Work is proportional to the NEW edge set:

    1. Contract — map each new edge's endpoints through the persisted
       labels (base doc -> its cluster label, new doc -> itself). Base
       clusters become super-nodes; edges internal to one base cluster
       vanish as self-loops.
    2. Union — connected components over the contracted edges ONLY
       (bounded union-find rounds on O(new edges) input). A new doc
       bridging two base clusters merges their super-nodes here.
    3. Rewrite — the resulting (old label -> new label) mapping
       touches only clusters adjacent to the batch; every other row's
       assignment is carried through unchanged.

    Labels stay = min id over the merged component (min over mins), so
    the result is bit-identical to a full recompute over base + new —
    the equivalence the catalog oracle checks with a recursive-CTE
    transitive closure on the unioned edge set.
    """
    lab_a = state.select(
        F.col(id_col).alias("id_a"), F.col("component").alias("la")
    )
    lab_b = state.select(
        F.col(id_col).alias("id_b"), F.col("component").alias("lb")
    )
    contracted = (
        new_edges.join(lab_a, "id_a", "left")
        .join(lab_b, "id_b", "left")
        .select(
            F.coalesce("la", F.col("id_a")).alias("u"),
            F.coalesce("lb", F.col("id_b")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("id_a"),
            F.greatest("u", "v").alias("id_b"),
        )
        .distinct()
    )
    # nodes=None: the node set of interest is exactly the contracted
    # edges' endpoints, so the singleton re-attach (and the separate
    # `touched` node-set computation plus its consumer join) would be
    # dead weight — components' labels table IS the touched mapping.
    # No eager checkpoints here either: connected_components checkpoints
    # its own edge list and label table, and `upd` below is a filter
    # over that checkpointed frame, so both consumers replay only a
    # trivial local filter, not the contraction.
    upd = (
        connected_components(None, contracted, "node")
        .where(F.col("node") != F.col("component"))  # identity rows are no-ops
        .select(F.col("node").alias("old"), F.col("component").alias("new"))
    )
    base_out = (
        state.join(upd, state["component"] == upd["old"], "left")
        .select(
            F.col(id_col),
            F.coalesce("new", "component").alias("component"),
        )
    )
    new_out = (
        new_nodes.select(id_col)
        .join(upd, new_nodes[id_col] == upd["old"], "left")
        .select(
            F.col(id_col),
            F.coalesce("new", F.col(id_col)).alias("component"),
        )
    )
    return base_out.unionByName(new_out)


def verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    gram: int | None = None,
) -> DataFrame:
    """Verification stage of the MinHash pipeline: exact set Jaccard on
    CANDIDATE pairs only (LSH gives recall, this gives precision) —
    over distinct tokens by default, or distinct token n-gram hashes
    with ``gram=n`` (pair with token_gram candidates so the sketch and
    the verifier threshold the SAME similarity). Element arrays are
    semi-join-pruned to docs that appear in some candidate before the
    pair join, so the shuffle carries sets for the near-dup fringe of
    the corpus, never all of it; per-pair array_intersect is fine
    because banding already bounded the pair count.
    """
    from dsp_spark.operators import textops

    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select("id_b"))
        .distinct()
    )
    if gram is not None:
        elems = textops.token_gram_hashes("__tk", gram)
    else:
        elems = F.array_distinct(F.col("__tk"))
    toks = (
        docs.join(ids, id_col, "left_semi")
        .select(F.col(id_col), textops.tokens(text_col).alias("__tk"))
        .select(F.col(id_col), elems.alias("tk"))
    )
    ta = toks.select(F.col(id_col).alias("id_a"), F.col("tk").alias("tka"))
    tb = toks.select(F.col(id_col).alias("id_b"), F.col("tk").alias("tkb"))
    inter = F.size(F.array_intersect("tka", "tkb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("tka") + F.size("tkb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_span_intervals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gram: int = 8,
    min_docs: int = 2,
    checkpoint: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document.

    The span machinery of the Lee-et-al exact-substring pipeline
    (Deduplicating Training Data Makes Language Models Better) at token
    grain: any token run of >= ``gram`` tokens appearing in
    ``min_docs``+ documents is flagged through its gram anchors (a
    duplicated run of length >= G contains a duplicated G-gram, so the
    merged anchor spans cover exactly the maximal duplicated runs);
    anchor positions merge into islands per doc. Returns one row per
    (doc, span): ``(id_col, s, e)`` with 1-based inclusive token
    positions.

    Scale: two gram-keyed partial-agg exchanges (the corpus-token-sized
    explode carries G-token grams, never documents) + per-doc bounded
    windows — the same plan dedup_dup_span_fraction audits.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    # NO spread() here, decided by measurement (r14): an earlier r14
    # session added spread before the tokenize+hash+explode pass
    # (single-file parquet scans as one partition), but since the r13
    # hash-narrowing (xxhash64 token-tuple keys, no 60 B gram strings)
    # the single-core gram build is cheap enough that the added
    # round-robin exchange + stage barrier LOSES: interleaved
    # spread-on/off A/B at sf0.1 across two sessions, 14 pairs —
    # dup_span_top_boilerplate 2.54 vs 1.51 s median,
    # dedup_span_strip 1.99 vs 1.69, dup_span_rate_by_source 2.28 vs
    # 1.83 and 1.50 vs 1.26, dedup_dup_span_fraction 1.77 vs 1.71
    # (flat). The heavy-map-side spreads that DID survive measurement
    # live in source_ngram_pairs and lang_id_confusion (queries/
    # text.py), where per-row work is ~an order of magnitude higher.
    base = df.select(F.col(id_col).alias("_sid"), toks.alias("_l"))
    g = gram
    # gram identity = xxhash64 over the g token hashes, NOT the joined
    # gram string: tokens are whitespace-split (never contain ' '), so
    # the join string is injective in the token tuple and the tuple
    # hash keys the identical grouping up to 64-bit collisions
    # (~n_grams^2 / 2^65 — ~1e-7 at sf0.1, and the anchors are
    # internal, never surfaced, so the oracle needs no mirror).
    # Measured at sf0.1: the per-position array_join allocated a ~60 B
    # string per corpus gram and the checkpoint + both gram-keyed
    # exchanges carried it; hashing tokens once and mixing 8 int64s
    # per position cut the full interval pipeline 1.67 s -> 1.04 s
    # with bit-identical spans (guide §2.3: shuffle fewer bytes,
    # narrower types — applied to the checkpoint too).
    mix = ", ".join(f"element_at(_th, i + {j})" for j in range(g))
    gpos = (
        base.where(F.size("_l") >= g)
        .withColumn("_th", F.expr("transform(_l, t -> xxhash64(t))"))
        .select(
            "_sid",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_th) - {g} + 1), "
                    f"i -> struct(i AS pos, xxhash64({mix}) AS gram))"
                )
            ).alias("z"),
        )
        .select("_sid", F.col("z.pos").cast("int").alias("pos"), "z.gram")
    )
    if checkpoint:
        # the gram relation feeds BOTH the dup-gram aggregate and the
        # position join-back; the tokenize + per-position hash mix
        # dominates the scan, so compute it once (and the checkpoint
        # now stores 8-byte gram hashes, not ~60 B gram strings)
        gpos = gpos.localCheckpoint(eager=True)
    if min_docs == 2:
        # "appears in >= 2 distinct docs" == "min doc != max doc": a
        # plain min/max partial agg folds map-side into two bigints per
        # gram — measured ~2x cheaper than the COUNT(DISTINCT) rewrite,
        # which expands to a two-phase distinct aggregation (every
        # (gram, doc) pair shuffles). Same skew behavior (both shuffle
        # on gram with map-side reduction), identical selected set.
        dupg = (
            gpos.groupBy("gram")
            .agg(F.min("_sid").alias("_a"), F.max("_sid").alias("_b"))
            .where(F.col("_a") != F.col("_b"))
            .select("gram")
        )
    else:
        dupg = (
            gpos.groupBy("gram")
            .agg(F.count_distinct("_sid").alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("gram")
        )
    # no distinct: gpos is one row per (doc, pos) by construction (a
    # posexplode of the position sequence), and the semi-join preserves
    # that — a distinct here would be a pure extra exchange
    hits = gpos.join(dupg, "gram", "left_semi").select("_sid", "pos")
    from pyspark.sql import Window as W

    w = W.partitionBy("_sid").orderBy("pos")
    prev_end = F.max(F.col("pos") + g - 1).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "new_island",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    spans = isl.withColumn("island", F.sum("new_island").over(w))
    return (
        spans.groupBy("_sid", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + g - 1).cast("int").alias("e"))
        .select(F.col("_sid").alias(id_col), "s", "e")
    )


def span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    intervals: DataFrame,
) -> DataFrame:
    """Per-doc duplicated-span coverage from a PRECOMPUTED interval
    table (``(id_col, s, e)``, 1-based inclusive — dup_span_intervals
    output or tools/dedup_state.py ``read_spans``): ``(id_col,
    n_tokens, n_dup_tokens, dup_frac)``, the dedup_dup_span_fraction
    statistic. Shared-scorer core so the persisted span state and the
    in-plan catalog entry cannot disagree (parity pinned in
    tests/test_span_state_tool.py). One interval agg + one id-keyed
    join; exact integer arithmetic until the final division."""
    tk = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "").alias(
            "_l"
        ),
    )
    cov = (
        intervals.select(
            id_col, (F.col("e") - F.col("s") + 1).alias("_span_len")
        )
        .groupBy(id_col)
        .agg(F.sum("_span_len").cast("bigint").alias("n_dup_tokens"))
    )
    return tk.join(cov, id_col, "left").select(
        id_col,
        F.size("_l").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0))
        .cast("bigint")
        .alias("n_dup_tokens"),
        F.when(F.size("_l") == 0, F.lit(0.0))
        .otherwise(
            F.coalesce(F.col("n_dup_tokens"), F.lit(0))
            / F.size("_l").cast("double")
        )
        .alias("dup_frac"),
    )


def span_source_rollup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    intervals: DataFrame,
) -> DataFrame:
    """Duplicated-span coverage rolled up to source grain from a
    PRECOMPUTED interval table — the dup_span_rate_by_source dashboard
    (``(source_col, n_docs, docs_with_dup_spans, n_tokens,
    n_dup_tokens, dup_rate)``) computed off persisted span state
    instead of re-deriving gram anchors. One extra source-grain
    partial agg on the per-doc coverage. Deliberately NOT composed
    from span_coverage: carrying ``source_col`` through the one
    tokenize pass costs nothing, while joining coverage back to a
    (id, source) projection would add a corpus-grain id-keyed join;
    the shared-scorer parity test pins both against the same oracle."""
    tk = df.select(
        F.col(id_col),
        F.col(source_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "").alias(
            "_l"
        ),
    )
    cov = (
        intervals.select(
            id_col, (F.col("e") - F.col("s") + 1).alias("_span_len")
        )
        .groupBy(id_col)
        .agg(F.sum("_span_len").cast("bigint").alias("n_dup_tokens"))
    )
    j = tk.join(cov, id_col, "left").select(
        source_col,
        F.size("_l").cast("bigint").alias("n_tok"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0))
        .cast("bigint")
        .alias("n_dup"),
    )
    ntok = F.sum("n_tok")
    ndup = F.sum("n_dup")
    return j.groupBy(source_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_dup_spans"),
        ntok.cast("bigint").alias("n_tokens"),
        ndup.cast("bigint").alias("n_dup_tokens"),
        F.round(ndup / F.nullif(ntok.cast("double"), F.lit(0.0)), 6).alias(
            "dup_rate"
        ),
    )


def strip_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gram: int = 8,
    min_docs: int = 2,
    checkpoint: bool = True,
    intervals: DataFrame | None = None,
) -> DataFrame:
    """APPLY the Lee-et-al span removal that dup_span_intervals (and the
    dedup_dup_span_fraction audit) only measures: every cross-document
    duplicated token run of >= ``gram`` tokens is removed from EVERY
    document it occurs in — boilerplate semantics, the transform a
    curation pipeline runs on license blocks / navigation chrome that
    survive whole-doc dedup (MinHash sees low whole-doc Jaccard;
    containment sees only near-total subsumption). For keep-one-witness
    semantics compose with a min-id witness rule upstream.

    Returns ``df`` with ``text_col`` REPLACED by the stripped token
    stream — single-space joined: this is a TOKEN-grain transform,
    original whitespace is not preserved — plus ``n_tokens`` (pre-strip)
    and ``tokens_removed`` columns; all other columns pass through.

    Scale: the interval set per doc is bounded by doc length, and the
    strip itself is one JVM higher-order-function pass (exists() over
    the doc's own intervals per token — no Python, no extra shuffle
    beyond the interval build + one id-keyed join back). Pass a
    precomputed ``intervals`` frame (``(id_col, s, e)`` — e.g.
    tools/dedup_state.py ``read_spans``) to strip off persisted span
    state instead of re-deriving gram anchors; ``gram``/``min_docs``/
    ``checkpoint`` are ignored then (the interval table pins them).
    """
    iv = (
        intervals
        if intervals is not None
        else dup_span_intervals(
            df,
            id_col,
            text_col,
            gram=gram,
            min_docs=min_docs,
            checkpoint=checkpoint,
        )
    )
    ivs = iv.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("_iv")
    )
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = df.select(F.col(id_col).alias("_sid"), toks.alias("_l"))
    enriched = base.join(
        ivs.withColumnRenamed(id_col, "_sid"), "_sid", "left"
    ).select(
        "_sid",
        "_l",
        F.coalesce(
            F.col("_iv"), F.expr("CAST(array() AS array<struct<s:int,e:int>>)")
        ).alias("_iv"),
    )
    stripped = enriched.select(
        "_sid",
        F.size("_l").alias("n_tokens"),
        F.expr(
            "transform(filter(transform(_l, (x, i) -> struct(x AS tok, i + 1 AS pos)), "
            "p -> NOT exists(_iv, v -> p.pos >= v.s AND p.pos <= v.e)), p -> p.tok)"
        ).alias("_kept"),
    ).select(
        "_sid",
        "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).cast("int").alias("tokens_removed"),
        F.array_join("_kept", " ").alias("_stripped"),
    )
    if set(df.columns) <= {id_col, text_col}:
        # nothing else to carry: skip the corpus-sized join back
        return stripped.select(
            F.col("_sid").alias(id_col),
            "n_tokens",
            "tokens_removed",
            F.col("_stripped").alias(text_col),
        )
    return (
        df.drop(text_col)
        .join(stripped.withColumnRenamed("_sid", id_col), id_col, "inner")
        .withColumnRenamed("_stripped", text_col)
    )


def strip_self_repeats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    seg_words: int = 10,
) -> DataFrame:
    """WITHIN-document repetition strip at fixed ``seg_words``-word
    segment grain (the Gopher/C4 self-repetition step): each document
    keeps the FIRST occurrence of each of its distinct segments and
    drops the rest — retry artifacts, templated sections, scraper
    loops. Cross-document repeats are strip_dup_spans' job; running
    this FIRST shrinks what the corpus-wide gram explode must hash.

    Returns ``df`` with ``text_col`` REPLACED by the kept segments in
    original order (single-space joined — segment-grain transform,
    original whitespace is not preserved) plus ``n_segments`` and
    ``segments_removed`` columns; all other columns pass through.

    Scale: ZERO shuffles — "first occurrence of each distinct segment"
    is a per-row property (a segment is kept iff its position is the
    array's first occurrence of its value, ``array_position(segs, s)
    == pos``), so the whole strip is one in-row projection: no segment
    explode, no (doc, segment) window exchange carrying segment text,
    and no corpus-sized join back for the extra columns. Per-row cost
    is O(segments²) string compares, bounded by document width; if
    document length ever becomes unbounded, cap via a length guard or
    fall back to the windowed form above a segment-count threshold.

    Null ``text_col`` rows are DROPPED (r13 advisor): the oracle's
    ``range(NULL)`` is empty, as was the pre-r13 explode/agg path —
    the in-row projection would otherwise emit a null-metrics row.
    The corpus has no null text today, so the guard is free.
    """
    df = df.where(F.col(text_col).isNotNull())
    w = F.split(F.col(text_col), r"\s+")
    n = seg_words
    segs = F.transform(
        F.sequence(
            F.lit(0), F.ceil(F.size(w) / F.lit(float(n))).cast("int") - 1
        ),
        lambda i: F.array_join(F.slice(w, i * n + 1, n), " "),
    )
    tmp = df.withColumn("_segs", segs)
    kept = F.filter(
        F.col("_segs"),
        lambda s, i: F.array_position(F.col("_segs"), s) == i + F.lit(1),
    )
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return tmp.select(
        id_col,
        *others,
        F.size("_segs").cast("int").alias("n_segments"),
        (F.size("_segs") - F.size(kept)).cast("int").alias("segments_removed"),
        F.array_join(kept, " ").alias(text_col),
    )
