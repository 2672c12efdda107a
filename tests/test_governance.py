"""Unit tests for operators/governance.py — mask semantics, referential
integrity of pseudonyms, RLS before-masking order."""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_fresh_sql_data_engineering_spark.operators import governance as G


def test_partial_mask_keeps_short_strings_and_tail(spark):
    df = spark.createDataFrame([("abc",), ("credit1234",)], "v string")
    out = [
        r["m"] for r in df.select(G.partial_mask("v", keep=4).alias("m")).collect()
    ]
    assert out == ["abc", "******1234"]


def test_hash_mask_preserves_referential_integrity(spark):
    a = spark.createDataFrame([(1, "alice"), (2, "bob")], "id bigint, name string")
    b = spark.createDataFrame([("alice", 10), ("carol", 20)], "name string, x int")
    ma = a.select("id", G.hash_mask("name", "s").alias("token"))
    mb = b.select(G.hash_mask("name", "s").alias("token"), "x")
    joined = ma.join(mb, "token").collect()
    assert len(joined) == 1 and joined[0]["id"] == 1 and joined[0]["x"] == 10
    # different salt -> different token space (no cross-salt linkage)
    mc = b.select(G.hash_mask("name", "other").alias("token"), "x")
    assert ma.join(mc, "token").count() == 0


def test_apply_policy_drops_nulls_and_filters_before_masking(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0)], "id bigint, name string, bal double"
    )
    out = G.apply_policy(
        df,
        masks={"name": G.null_mask("name"), "bal": G.bucket_mask("bal", 10.0)},
        row_policy=F.col("bal") >= 0,  # judged on the RAW value
        drop=["id"],
    )
    rows = out.collect()
    assert out.columns == ["name", "bal"]
    assert len(rows) == 1 and rows[0]["name"] is None and rows[0]["bal"] == 0.0
