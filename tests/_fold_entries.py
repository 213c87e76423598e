"""The round-8 fold entries re-expressed over an arbitrary events
DataFrame (the catalog entries bind to a sf_dir; model tests need the
same expression trees on generated frames). Kept in one place so the
tests and the catalog cannot drift: the catalog functions are these,
applied to read_table(...)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def cdc_net_effect(ev):
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    w = W.partitionBy("user_id")
    ordered = ev.select(
        "user_id",
        op.alias("op"),
        cents.alias("cents"),
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    folded = ordered.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("op"))).alias("last_op"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("cents"))).alias(
            "last_cents"
        ),
        F.max("n").alias("n_changes"),
    )
    net = (
        F.when((F.col("first_op") == "I") & (F.col("last_op") == "D"), "NONE")
        .when(F.col("first_op") == "I", "I")
        .when(F.col("last_op") == "D", "D")
        .otherwise("U")
    )
    return folded.select(
        "user_id",
        "first_op",
        "last_op",
        net.alias("net_op"),
        F.when(F.col("last_op") != "D", F.col("last_cents")).alias(
            "net_value_cents"
        ),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


def attribution_linear(ev):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    grp = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    seq = ev.select(
        "user_id", "event_type", "ts", "event_id", grp.alias("grp")
    )
    purchases = seq.where(F.col("event_type") == "purchase").select(
        "user_id", (F.col("grp") - 1).alias("conv")
    )
    touches = seq.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("grp").alias("conv"), "event_type", "ts", "event_id"
    )
    joined = purchases.join(touches, ["user_id", "conv"])
    wk = W.partitionBy("user_id", "conv")
    paths = joined.select(
        "event_type",
        F.count("*").over(wk).alias("k"),
        F.row_number()
        .over(wk.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rdesc"),
    )
    credit = F.expr("1000 DIV k") + F.when(
        F.col("rdesc") == 1, F.expr("1000 % k")
    ).otherwise(0)
    credited = paths.select("event_type", credit.alias("credit"))
    unmatched = purchases.join(
        touches.select("user_id", "conv").distinct(),
        ["user_id", "conv"],
        "left_anti",
    ).select(F.lit("none").alias("event_type"), F.lit(1000).alias("credit"))
    return (
        credited.unionByName(unmatched)
        .groupBy(F.col("event_type").alias("attributed_type"))
        .agg(F.sum("credit").cast("long").alias("milli_credits"))
    )


def lifecycle_states(ev):
    uw = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    mx = uw.agg(F.max("wk").alias("max_wk"))
    active = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), F.lit("new"))
        .when(F.col("prev_wk") == F.date_sub("wk", 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("state"),
    )
    churned = (
        seq.join(F.broadcast(mx))
        .where(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.date_add("wk", 7))
            )
            & (F.date_add("wk", 7) <= F.col("max_wk"))
        )
        .select(
            F.date_add("wk", 7).alias("wk"), F.lit("churned").alias("state")
        )
    )
    return (
        active.unionByName(churned)
        .groupBy("wk", "state")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def skyline(parts):
    """parts_skyline_per_brand's sorted-sweep over an arbitrary frame
    with columns (p_partkey, p_brand, price_cents, p_size)."""
    g = parts.groupBy("p_brand", "price_cents").agg(
        F.max("p_size").cast("int").alias("smax")
    )
    w = (
        W.partitionBy("p_brand")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = g.select(
        "p_brand",
        "price_cents",
        "smax",
        F.max("smax").over(w).alias("run_prev"),
    )
    dominated = (
        F.col("run_prev").isNotNull() & (F.col("run_prev") >= F.col("p_size"))
    ) | (F.col("smax") > F.col("p_size"))
    return (
        parts.join(r, ["p_brand", "price_cents"])
        .filter(~dominated)
        .select("p_partkey", "p_brand", "price_cents", "p_size")
    )


def km_survival(orders):
    """orders_interpurchase_km's quantized-log KM curve over an
    arbitrary frame with columns (o_custkey, o_orderkey, o_orderdate)."""
    wc = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wc))
        .cast("bigint")
        .alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    d = g.groupBy("gap_days").agg(F.count("*").cast("bigint").alias("d"))
    tot = d.agg(F.sum("d").cast("bigint").alias("total"))
    wd = W.orderBy("gap_days").rowsBetween(W.unboundedPreceding, -1)
    r = d.crossJoin(F.broadcast(tot)).select(
        "gap_days",
        "d",
        (F.col("total") - F.coalesce(F.sum("d").over(wd), F.lit(0)))
        .cast("bigint")
        .alias("n_risk"),
    )
    frac = F.col("d").cast("double") / F.col("n_risk")
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(F.log(1.0 - frac) * 1e12).cast("bigint"),
    )
    terms = r.select("gap_days", "d", "n_risk", term.alias("term_pico"))
    wcum = W.orderBy("gap_days").rowsBetween(W.unboundedPreceding, 0)
    surv = F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum("term_pico").over(wcum).cast("bigint").cast("double")
                / 1e12
            )
            * 1e9
        ).cast("bigint")
        / 1e9
    )
    return terms.select("gap_days", "d", "n_risk", surv.alias("survival"))
