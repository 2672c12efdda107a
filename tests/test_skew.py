"""Skew primitives must be result-identical to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.operators.skew import (
    salted_broadcast_join,
    two_phase_aggregate,
)
from amazon_fresh_sql_data_engineering_spark.registry import dec
from amazon_fresh_sql_data_engineering_spark.sources import load_table


def test_two_phase_aggregate_equals_plain_groupby(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        (r.o_custkey): (r.total, r.n)
        for r in orders.groupBy("o_custkey")
        .agg(
            F.sum(dec("o_totalprice")).alias("total"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    }
    salted = {
        (r.o_custkey): (r.total, r.n)
        for r in two_phase_aggregate(
            orders,
            ["o_custkey"],
            {
                "total": ("sum", F.sum(dec("o_totalprice"))),
                "n": ("sum", F.count(F.lit(1))),
            },
            salts=8,
        ).collect()
    }
    assert plain == salted


def test_two_phase_min_max(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderstatus: (r.lo, r.hi)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    salted = {
        r.o_orderstatus: (r.lo, r.hi)
        for r in two_phase_aggregate(
            orders,
            ["o_orderstatus"],
            {
                "lo": ("min", F.min("o_totalprice")),
                "hi": ("max", F.max("o_totalprice")),
            },
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    plain = sorted(
        (r.c_custkey, r.n_name)
        for r in customer.join(nation, on="c_nationkey").select("c_custkey", "n_name").collect()
    )
    salted = sorted(
        (r.c_custkey, r.n_name)
        for r in salted_broadcast_join(customer, nation, "c_nationkey", salts=8)
        .select("c_custkey", "n_name")
        .collect()
    )
    assert plain == salted
