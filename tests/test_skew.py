"""Skew strategies: salted join correctness, bucketed join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark import plans
from dsp_spark.operators.skew import salted_join, write_bucketed
from dsp_spark.session import read_table


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows hit key 0
    fact = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "label")
    assert salted.count() == plain.count() == 10000
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_deterministic(spark):
    fact = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 3).select(F.col("id").alias("k"))
    a = salted_join(fact, dim, "k").collect()
    b = salted_join(fact, dim, "k").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """The co-located join: both sides bucketed on the key => no shuffle."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        write_bucketed(orders, "orders_b", bucket_col="o_orderkey", n_buckets=8)
        write_bucketed(lineitem, "lineitem_b", bucket_col="l_orderkey", n_buckets=8)
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = o.join(
            li.hint("merge"), o.o_orderkey == li.l_orderkey
        ).select("o_orderkey", "l_quantity")
        n_ex = plans.count_exchanges(joined)
        assert n_ex == 0, f"bucketed join should shuffle nothing, saw {n_ex} exchanges"
        # and it still returns the right rows
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
