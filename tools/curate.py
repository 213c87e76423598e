#!/usr/bin/env python
"""End-to-end corpus curation run: the engine doing its real job.

    python tools/curate.py [--sf-dir DIR] [--out DIR]

Stages (each a cataloged operator, composed):
  0. DQ pre-flight    - report-only constraint audit (empty text, lang
                        whitelist, n_chars consistency) in the manifest
  1. quality filter   - Gopher-style keep rules (narrow map, no shuffle)
  2. exact dedup      - md5 groupBy, keep min doc_id
  3. near-dup         - MinHash-LSH candidates -> exact-Jaccard verify
                        -> connected components -> keep min id per family,
                        then drop docs whose token 3-grams are >=80%
                        contained in a longer survivor (subsumption
                        Jaccard can't see; grams, not unigrams, so
                        shared vocabulary alone never fires it)
  3c. decontam        - train docs near-dup of a held-out val/test doc
                        are dropped (token-3-GRAM Jaccard >= 0.35 on
                        both the sketch and the verify — stricter than
                        the 0.5 dedup): held-out bands BROADCAST
                        against train bands, the corpus never
                        self-joins
  4. split + shard    - stable hash-bucket train/val/test + 32 shards
  5. write            - parquet partitioned by split, rows range-
                        clustered by n_chars inside each partition
  6. epoch shuffle    - every surviving TRAIN doc gets a deterministic
                        (shard, pos) address from a salted content
                        hash (the dataset_shuffle_order operator):
                        no global sort, no RNG state, --epoch N is
                        just a different salt
  7. pack + export    - chunks packed into fixed token-budget
                        sequences IN EPOCH ORDER within each shuffle
                        shard (tools/export_packed.py), written
                        parquet-per-shard with fill-rate manifest
Prints a one-line JSON manifest with per-stage survivor counts, shard
balance, and an order checksum (same corpus + same epoch => identical
checksum on any rerun/partitioning; different epoch => different
order over the same docs).

Restartability (the 100 TB property): the two durable stages (curated
write; packed export) each write a manifest AFTER their parquet — the
manifest is the commit marker. `--resume` skips a stage iff its marker
exists and matches the input fingerprint (documents.parquet identity)
and stage params (epoch); a run killed mid-write left no marker and
recomputes exactly that stage. `--stats-only` runs the funnel and
prints counts without writing anything.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _input_fingerprint(sf_dir: str) -> str:
    """Identity of the curation INPUT: absolute path + size + mtime of
    the documents table. A resumed run whose input changed must
    recompute, never serve stale survivors."""
    path = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(path)
    return f"{path}|{st.st_size}|{int(st.st_mtime)}"


def _load_stage_manifest(path: str, fp: str, extra: dict | None = None):
    """Stored per-stage manifest iff it exists, parses, and matches the
    input fingerprint + stage params — else None (stage recomputes).
    The manifest is written AFTER the stage's parquet, so its presence
    is the stage's commit marker: a run killed mid-write leaves data
    without a manifest and the resume recomputes it."""
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, ValueError):
        return None
    if m.get("fingerprint") != fp or m.get("params") != (extra or {}):
        return None
    return m["manifest"]


def _write_stage_manifest(path: str, fp: str, manifest: dict, extra: dict | None = None) -> None:
    with open(path, "w") as f:
        json.dump(
            {"fingerprint": fp, "params": extra or {}, "manifest": manifest}, f
        )


def _spans_state_params(spans_state: str | None) -> dict | None:
    """Resume-identity of a persisted span state: its gram + corpus
    snapshot fingerprint from _meta.json (NOT the path — the same
    directory re-materialized over a different corpus must not serve a
    stale resumed output)."""
    if not spans_state:
        return None
    from tools.dedup_state import _load_meta

    meta = _load_meta(spans_state)
    return {
        "gram": meta.get("span_gram"),
        "corpus": meta.get("span_corpus"),
    }


def curate(
    spark,
    sf_dir: str,
    out_dir: str,
    *,
    epoch: int = 1,
    pack: bool = True,
    resume: bool = False,
    stats_only: bool = False,
    strip_spans: bool = False,
    spans_state: str | None = None,
) -> dict:
    fp = _input_fingerprint(sf_dir)
    stage_a = os.path.join(out_dir, "_curate_manifest.json")
    stage_params = {
        "strip_spans": strip_spans,
        "spans_state": _spans_state_params(spans_state),
    }
    if resume and not stats_only:
        # strip_spans changes the curated TEXT itself, so it is part of
        # the stage's identity — a resume must never serve unstripped
        # output to a --strip-spans run (or vice versa); likewise the
        # span SOURCE (in-run recompute vs a persisted snapshot)
        manifest = _load_stage_manifest(stage_a, fp, stage_params)
        if manifest is not None:
            print(f"resume: curated write up to date at {out_dir}", file=sys.stderr)
            final = spark.read.parquet(out_dir)
            return _maybe_pack(
                spark, final, manifest, out_dir, fp,
                epoch=epoch, pack=pack, resume=True,
            )

    from dsp_spark.operators import dedup as dd
    from dsp_spark.operators import sampling as smp
    from dsp_spark.operators.layout import optimize_layout
    from dsp_spark import catalog
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")

    # Fail-fast span-state validation (r12 review): read_spans' gram +
    # corpus-fingerprint guards used to fire only at stage 3d, AFTER
    # the whole quality->dedup->containment->decontam funnel had run —
    # at target scale a stale state aborted the run with hours of
    # compute already spent. The meta read is free and the fingerprint
    # check is one cheap doc_id scan, so refuse BEFORE stage 0 and
    # carry the validated interval table into stage 3d.
    span_iv = None
    if strip_spans and spans_state:
        from tools.dedup_state import read_spans

        span_iv = read_spans(
            spark,
            spans_state,
            expect_gram=8,
            expect_corpus=docs.select("doc_id"),
        )

    n_input = docs.count()

    # 0. pre-flight DQ audit (report-only): a real run refuses to curate
    # a corpus whose constraint violations spike vs the previous drop
    audit = (
        catalog.entries()["dq_documents_audit"]
        .fn(spark, sf_dir)
        .agg(
            F.sum("empty_text").alias("empty_text"),
            F.sum("lang_violations").alias("lang_violations"),
            F.sum("n_chars_mismatch").alias("n_chars_mismatch"),
        )
        .collect()[0]
        .asDict()
    )
    # an empty corpus aggregates to NULL sums — report zeros, don't die
    audit = {k: int(v or 0) for k, v in audit.items()}

    # 1. quality: reuse the cataloged rule set, keep only passing docs
    flags = catalog.entries()["text_quality_filter"].fn(spark, sf_dir)
    kept_q = docs.join(
        flags.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    n_quality = kept_q.count()

    # 2. exact dedup: survivors carry the smallest id per content hash
    survivors = dd.exact_dedup(kept_q, "doc_id", "text").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept_e = kept_q.join(survivors, "doc_id", "left_semi")
    n_exact = kept_e.count()

    # 3. near-dup: LSH -> verify -> components; keep one doc per family
    pairs = dd.minhash_lsh_pairs(
        kept_e, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    verified = dd.verify_pairs(kept_e, pairs, "doc_id", "text", threshold=0.5)
    comp = dd.connected_components(kept_e, verified, "doc_id")
    keepers = comp.filter(F.col("doc_id") == F.col("component")).select("doc_id")
    kept_n = kept_e.join(keepers, "doc_id", "left_semi")
    n_neardup = kept_n.count()

    # 3b. containment: a doc whose token 3-GRAMS are >=80% contained
    # in a LONGER surviving doc is boilerplate/quoting the Jaccard-0.5
    # verify can't see (the asymmetric score is near zero for it).
    # 3-grams, not unigrams: template corpora share VOCABULARY without
    # sharing content, so set-containment over-fires (it would drop
    # ~3/4 of this corpus); requiring shared token RUNS is the real
    # subsumption signal. Drop the shorter side only — ties keep the
    # smaller id — so mutually-contained pairs never annihilate.
    cont = dd.containment_pairs(
        kept_n, "doc_id", "text", block_col="source", threshold=0.8,
        gram=3,
    ).where(F.col("size_a") >= 10)
    sizes = kept_n.select(
        F.col("doc_id").alias("id_b"), F.col("n_chars").alias("chars_b")
    )
    sizes_a = kept_n.select(
        F.col("doc_id").alias("id_a"), F.col("n_chars").alias("chars_a")
    )
    drops = (
        cont.join(sizes_a, "id_a")
        .join(sizes, "id_b")
        .where(
            (F.col("chars_a") < F.col("chars_b"))
            | (
                (F.col("chars_a") == F.col("chars_b"))
                & (F.col("id_a") > F.col("id_b"))
            )
        )
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    kept_c = kept_n.join(drops, "doc_id", "left_anti")
    n_contain = kept_c.count()
    kept_n = kept_c

    # 3c. eval decontamination: split membership is a stable hash, so
    # the held-out (val/test) docs are known BEFORE the write — train
    # docs still fuzzily matching one must go, or eval loss measures
    # memorization. Stage 3 already collapsed near-dups at 0.5, so
    # decontam runs STRICTER (0.35): real pipelines decontaminate more
    # aggressively than they dedup, because a half-overlapping eval doc
    # still leaks. The held-out side is 2% by construction, so its LSH
    # bands broadcast against the train bands (lsh_cross_pairs) — the
    # train corpus is never shuffled, never self-joined.
    # Materialize the survivor set once: everything below (two split
    # filters, the verify prune, the anti-join, the write) would
    # otherwise re-run the whole quality->dedup->containment lineage.
    kept_n = kept_n.localCheckpoint(eager=True)
    # Recall-oriented sketch, twice over: token_gram=3 makes MinHash
    # estimate the SAME token-3-gram Jaccard the verify (gram=3)
    # thresholds — unigram tokens are trivially similar on template
    # corpora and char shingles estimate a different similarity, so
    # either mismatch silently drops true pairs — and bands=8 x 1 row
    # gives candidate recall 1-(1-0.35)^8 = 97% at the decontam
    # threshold (the dedup family's 2x4 would see ~3%). The verify can
    # only FILTER candidates, never recover ones the banding missed.
    # 1-row bands over-generate on shared template grams, but here —
    # unlike the catalog entry's 50%-eval split, which uses 12x2 — the
    # held-out side is 2% by construction, so the junk candidate set
    # stays small and the 97%-recall config is the right trade.
    b = smp.hash_bucket("doc_id")
    xc = dd.lsh_cross_pairs(
        kept_n.where(b >= 200),
        kept_n.where(b < 200),
        "doc_id",
        "text",
        n_hashes=8,
        bands=8,
        token_gram=3,
    ).localCheckpoint(eager=True)
    contaminated = (
        dd.verify_pairs(kept_n, xc, "doc_id", "text", threshold=0.35, gram=3)
        .select(F.col("id_a").alias("doc_id"))  # drop the TRAIN side only
        .distinct()
    )
    kept_d = kept_n.join(contaminated, "doc_id", "left_anti")
    n_decontam = kept_d.count()
    kept_n = kept_d

    # 3d. span strip (optional, --strip-spans): the Lee-et-al APPLY
    # step after the measure — every cross-document duplicated token
    # run of >= 8 tokens is removed from the SURVIVORS (running it
    # post-dedup means one family representative can't re-flag spans
    # against its own dropped near-dups; what remains flagged is true
    # cross-family boilerplate). Same operator the dedup_span_strip
    # catalog entry drives, so the stage is driver-evidenced. n_chars
    # is recomputed because the text changed. The WITHIN-doc
    # self-repeat strip runs FIRST (its segments_removed shrink what
    # the corpus-wide gram explode must hash — and a doc repeating its
    # own boilerplate should not count as a cross-doc witness twice).
    span_tokens_removed = None
    self_segments_removed = None

    def _strip_stage(df, strip_fn, removed_col, drop_cols, last):
        """One strip pass shared by both span modes (the two branches
        below differ only in strip ORDER and span source — keeping the
        checkpoint/count/drop mechanics in one place stops the
        copy-paste drift a future counter edit would cause). The
        checkpoint is load-bearing: the result feeds both the
        removed-counter agg and the downstream funnel, and without it
        the strip recomputes. `last` recomputes n_chars on the final
        strip of the pair (the text changed)."""
        out = strip_fn(df)
        if last:
            out = out.withColumn("n_chars", F.length("text").cast("long"))
        out = out.localCheckpoint(eager=True)
        removed = int(
            out.agg(F.coalesce(F.sum(removed_col), F.lit(0))).collect()[0][0]
        )
        return out.drop(*drop_cols), removed

    if strip_spans and spans_state:
        # --spans-state: use the persisted interval table that
        # tools/dedup_state.py `spans` materialized (validated against
        # this corpus BEFORE stage 0, see span_iv above), instead of
        # re-deriving gram anchors in-plan. SNAPSHOT SEMANTICS: the
        # persisted spans reflect the STATE-BUILD corpus's witnesses,
        # not the post-filter kept set — a span whose only other
        # witnesses were filtered out upstream is still stripped (the
        # in-run recompute below stays the default for exact
        # kept-set-grain spans). Stage ORDER flips vs the default: the
        # persisted intervals are token-position-keyed against the
        # snapshot text, so the cross-doc strip must run BEFORE the
        # self-repeat strip rewrites token positions (the default
        # order's motivation — shrinking the in-run gram explode —
        # doesn't apply when no explode runs). When a doc has no
        # within-doc repeats the two orders produce identical text
        # (parity-pinned in tests/test_curate.py).
        kept_n, span_tokens_removed = _strip_stage(
            kept_n,
            lambda df: dd.strip_dup_spans(
                df, "doc_id", "text", intervals=span_iv
            ),
            "tokens_removed", ("n_tokens", "tokens_removed"), last=False,
        )
        kept_n, self_segments_removed = _strip_stage(
            kept_n,
            lambda df: dd.strip_self_repeats(
                df, "doc_id", "text", seg_words=10
            ),
            "segments_removed", ("n_segments", "segments_removed"),
            last=True,
        )
    elif strip_spans:
        kept_n, self_segments_removed = _strip_stage(
            kept_n,
            lambda df: dd.strip_self_repeats(
                df, "doc_id", "text", seg_words=10
            ),
            "segments_removed", ("n_segments", "segments_removed"),
            last=False,
        )
        kept_n, span_tokens_removed = _strip_stage(
            kept_n,
            lambda df: dd.strip_dup_spans(df, "doc_id", "text", gram=8),
            "tokens_removed", ("n_tokens", "tokens_removed"), last=True,
        )

    # 4. stable split + shard assignment
    final = kept_n.withColumn(
        "split",
        F.when(b < 100, "test").when(b < 200, "val").otherwise("train"),
    ).withColumn("shard", (b % 32).cast("int"))

    by_split = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "input_docs": n_input,
        "audit": audit,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_neardup,
        "after_containment": n_contain,
        "after_decontam": n_decontam,
        "span_tokens_removed": span_tokens_removed,
        "self_segments_removed": self_segments_removed,
        "splits": by_split,
        "out": out_dir,
    }

    if stats_only:
        # dry run: the full survivor funnel, zero writes
        manifest["out"] = None
        return manifest

    # 5. clustered write: one file run per split, length-clustered rows
    shutil.rmtree(out_dir, ignore_errors=True)
    optimize_layout(
        final, range_cols=["n_chars"], target_partitions=8
    ).write.partitionBy("split").parquet(out_dir)
    # manifest AFTER the write = stage commit marker for --resume
    _write_stage_manifest(stage_a, fp, manifest, stage_params)

    return _maybe_pack(
        spark, final, manifest, out_dir, fp,
        epoch=epoch, pack=pack, resume=resume,
    )


def _maybe_pack(
    spark, final, manifest: dict, out_dir: str, fp: str, *,
    epoch: int, pack: bool, resume: bool,
) -> dict:
    """Stages 6+7 behind their own commit marker: a resumed run whose
    packed output matches (input fingerprint, epoch) reuses it; any
    mismatch — different epoch, regenerated input, killed mid-export —
    recomputes from the curated parquet."""
    if not pack:
        return manifest
    pack_out = out_dir + "_packed"
    stage_b = os.path.join(pack_out, "_pack_manifest.json")
    if resume:
        stored = _load_stage_manifest(stage_b, fp, {"epoch": epoch})
        if stored is not None:
            print(f"resume: packed export up to date at {pack_out}", file=sys.stderr)
            manifest["packed"] = stored
            return manifest
    manifest["packed"] = _shuffle_and_pack(spark, final, pack_out, epoch=epoch)
    _write_stage_manifest(stage_b, fp, manifest["packed"], {"epoch": epoch})
    return manifest


def _shuffle_and_pack(spark, final, pack_out: str, *, epoch: int) -> dict:
    """Stages 6+7: deterministic epoch shuffle of the TRAIN split, then
    packed-sequence export in shuffle order.

    The (shard, pos) address is the dataset_shuffle_order operator
    inlined with an epoch-salted hash (same salted_md5/hash_int idiom,
    one definition per dialect in operators/sampling.py): shard = hash
    % N balances by the law of large numbers, pos = md5-rank within
    the shard. The ONLY shuffle is the shard repartition the pack
    write needs anyway; each shard sorts independently (external sort
    bounded by shard size at 100 TB). The order checksum is a
    commutative sum of per-row hashes — partitioning-invariant, so a
    rerun proves epoch determinism by equality and a different epoch
    shows up as a different checksum over the identical doc set.
    """
    from pyspark.sql import Window as W

    from dsp_spark.operators import sampling as smp
    from tools.export_packed import PACK_SHARDS, export_packed

    salt = f"ep{epoch}|"
    skey = F.expr(smp.salted_md5_sql("doc_id", salt=salt, dialect="spark"))
    shard = (
        F.expr(smp.hash_int_sql("doc_id", salt=salt, dialect="spark"))
        % PACK_SHARDS
    ).cast("int")
    train = final.where(F.col("split") == "train").select(
        "doc_id", "text", skey.alias("skey"), shard.alias("shard")
    )
    shuffled = train.withColumn(
        "pos",
        F.row_number()
        .over(W.partitionBy("shard").orderBy("skey", "doc_id"))
        .cast("bigint"),
    ).drop("skey")

    order_ck, n_train = (
        shuffled.agg(
            # XOR fold, not SUM: summing 64-bit hashes overflows int64
            # under ANSI mode; XOR is commutative (partitioning-
            # invariant) and closed over bigint
            F.bit_xor(
                F.xxhash64(F.concat_ws("|", "doc_id", "shard", "pos"))
            ).alias("ck"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    per_shard = [
        r.n
        for r in shuffled.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]

    pack_manifest = export_packed(
        spark, shuffled.select("doc_id", "text", "shard", "pos"), pack_out,
        order_col="pos",
    )
    pack_manifest.update(
        {
            "epoch": epoch,
            "order_checksum": int(order_ck or 0),
            "train_docs": int(n_train),
            "shard_balance": {
                "n_shards": len(per_shard),
                "min_docs": min(per_shard) if per_shard else 0,
                "max_docs": max(per_shard) if per_shard else 0,
            },
        }
    )
    return pack_manifest


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="corpus curation run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/dsp_curate")
    p.add_argument("--epoch", type=int, default=1, help="epoch shuffle salt")
    p.add_argument(
        "--no-pack", action="store_true",
        help="stop after the curated write (skip shuffle+pack+export)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="skip stages whose committed output matches the input "
        "fingerprint + params (restartability: each durable stage "
        "writes its manifest AFTER its parquet, so a killed run "
        "resumes from the last completed stage)",
    )
    p.add_argument(
        "--stats-only", action="store_true",
        help="dry run: print the per-stage survivor funnel, write nothing",
    )
    p.add_argument(
        "--strip-spans", action="store_true",
        help="after dedup/decontam, strip WITHIN-doc repeated segments "
        "(doc_self_repeat_strip) then cross-document duplicated token "
        "spans (>= 8 tokens) from the surviving text — the Lee-et-al "
        "exact-substring APPLY step (dedup_span_strip)",
    )
    p.add_argument(
        "--spans-state",
        help="with --strip-spans: read the cross-document span intervals "
        "from this persisted dedup_state directory (tools/dedup_state.py "
        "`spans`) instead of re-deriving gram anchors in-plan. The state "
        "must be FRESH for this input corpus (snapshot fingerprint "
        "checked) and built with gram=8; persisted spans reflect the "
        "state-build corpus's witnesses, not the post-filter kept set",
    )
    args = p.parse_args(argv)
    if args.spans_state and not args.strip_spans:
        p.error("--spans-state requires --strip-spans")

    from dsp_spark.session import get_session

    spark = get_session("dsp-curate")
    manifest = curate(
        spark, args.sf_dir, args.out, epoch=args.epoch,
        pack=not args.no_pack, resume=args.resume,
        stats_only=args.stats_only, strip_spans=args.strip_spans,
        spans_state=args.spans_state,
    )
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
