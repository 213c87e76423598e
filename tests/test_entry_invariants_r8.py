"""Model-level invariants for the round-8 session entries — properties
the DuckDB oracle can't express as equality (conservation laws,
one-sided error bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark import catalog
from dsp_spark.session import read_table

ENTRIES = catalog.entries()


def test_linear_attribution_conserves_credits(spark, sf_dir):
    """Every purchase hands out exactly 1000 milli-credits, no matter
    how the integer apportionment splits them."""
    out = ENTRIES["events_attribution_linear_milli"].fn(spark, sf_dir)
    total = out.agg(F.sum("milli_credits")).collect()[0][0]
    n_purchases = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert total == 1000 * n_purchases


def test_cms_never_underestimates_any_key(spark, sf_dir):
    """CMS one-sided error: est >= exact for EVERY key, not just the
    emitted top-20 (rebuild the probe relation without the limit)."""
    from dsp_spark.queries.sketches import _CMS_D, _CMS_W

    ev = read_table(spark, sf_dir, "events").select("user_id")
    rows_ = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("j"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )
    counters = (
        ev.crossJoin(F.broadcast(rows_))
        .select("user_id", "j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    probes = (
        exact.crossJoin(F.broadcast(rows_))
        .select("user_id", "exact_n", "j", bucket.alias("bucket"))
        .join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    bad = probes.where(F.col("est_n") < F.col("exact_n")).count()
    assert bad == 0


def test_locf_grid_identities(spark, sf_dir):
    """Grid accounting: hours = observed + filled, and the grid always
    starts at an observed hour (no leading NULL -> sum covers all)."""
    out = ENTRIES["events_resample_locf_audit"].fn(spark, sf_dir)
    bad = out.where(
        (F.col("n_hours") != F.col("n_observed") + F.col("n_gap_filled"))
        | (F.col("n_observed") < 1)
    ).count()
    assert bad == 0


def test_changelog_net_effect_classes(spark, sf_dir):
    """NONE only for I..D; deletes carry no payload; every user of the
    events table is accounted for exactly once."""
    out = ENTRIES["cdc_changelog_net_effect"].fn(spark, sf_dir)
    rows = out.collect()
    users = read_table(spark, sf_dir, "events").select(
        "user_id"
    ).distinct().count()
    assert len(rows) == users
    for r in rows:
        if r.net_op == "NONE":
            assert r.first_op == "I" and r.last_op == "D"
        if r.last_op == "D":
            assert r.net_value_cents is None
            assert r.net_op in ("D", "NONE")
        else:
            assert r.net_value_cents is not None


def test_ewma_bounds(spark, sf_dir):
    """EWMA is a convex combination of the last-16 cents values, so it
    lies within the per-user min/max of those values."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    last16 = (
        ev.select("user_id", cents.alias("cents"), "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 16)
        .groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    out = ENTRIES["events_ewma_last16"].fn(spark, sf_dir)
    bad = (
        out.join(last16, "user_id")
        .where(
            (F.col("ewma_cents") < F.col("lo"))
            | (F.col("ewma_cents") > F.col("hi"))
        )
        .count()
    )
    assert bad == 0


def test_novelty_first_bucket_is_all_novel(spark, sf_dir):
    """Bucket ordering sanity: grams seen in bucket 0 docs are novel at
    their first carrier, so bucket 0's novelty rate is the maximum."""
    out = ENTRIES["corpus_novelty_decay"].fn(spark, sf_dir).collect()
    rates = {r.bucket: r.novelty_rate for r in out}
    assert rates[0] == max(rates.values())
    for r in out:
        assert 0.0 <= r.novelty_rate <= 1.0
        assert r.novel_grams <= r.gram_occurrences
