"""Unit tests for operators/expectations.py (the declarative data-quality
rule engine) plus invariants for the queries_ml additions the catalog
parity sweep can't express (sampling bias direction, SQL CHECK NULL
semantics, warm-up exclusion)."""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
from amazon_fresh_sql_data_engineering_spark.operators import expectations as X


def _report_map(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


def test_row_rules_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A"), (None, 2.0, "Z")],
        "id bigint, amount double, code string",
    )
    rep = _report_map(
        X.finalize(
            X.run_expectations(
                df,
                "t",
                [
                    X.not_null("id"),
                    X.in_range("amount", 0, 100),
                    X.in_set("code", ["A", "B"]),
                ],
            )
        )
    )
    assert rep["not_null(id)"]["n_violations"] == 1
    # CHECK semantics: NULL amount is UNKNOWN, not a violation
    assert rep["in_range(amount)"]["n_violations"] == 1
    assert rep["in_set(code)"]["n_violations"] == 1
    assert all(r["n_checked"] == 4 for r in rep.values())
    assert not rep["not_null(id)"]["pass"]


def test_unique_rule_counts_duplicates_not_groups(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], "k bigint"
    )
    rep = _report_map(X.finalize(X.run_expectations(df, "t", [X.unique("k")])))
    # 6 rows, 3 distinct -> 3 surplus rows
    assert rep["unique(k)"]["n_violations"] == 3


def test_foreign_key_null_is_not_orphan(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id bigint, fk bigint"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    rep = _report_map(
        X.finalize(X.check_foreign_key(child, "child", "fk", parent, "pk"))
    )
    row = rep["foreign_key(child.fk)"]
    assert row["n_checked"] == 3
    assert row["n_violations"] == 1  # only fk=99; NULL fk passes


def test_matches_rule_anchored(spark):
    df = spark.createDataFrame([("1-URGENT",), ("x1-LOW",)], "p string")
    rep = _report_map(
        X.finalize(X.run_expectations(df, "t", [X.matches("p", "^[1-5]-")]))
    )
    assert rep["matches(p)"]["n_violations"] == 1


def test_weighted_sample_is_deterministic_and_price_biased(spark, sf_dir):
    q = CATALOG["op_weighted_sample"].fn
    a = {r["o_orderkey"] for r in q(spark, sf_dir).collect()}
    b = {r["o_orderkey"] for r in q(spark, sf_dir).collect()}
    assert a == b and len(a) == 100
    sampled_mean = (
        q(spark, sf_dir).agg(F.avg("o_totalprice")).collect()[0][0]
    )
    pop_mean = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    # priority = u/weight selects high-weight rows preferentially
    assert sampled_mean > pop_mean


def test_events_anomaly_warmup_and_flag_consistency(spark, sf_dir):
    df = CATALOG["events_anomaly"].fn(spark, sf_dir)
    assert df.filter(F.col("n_prev") < 12).count() == 0
    bad = df.filter(
        F.col("is_anomaly") != F.coalesce(F.abs("z") >= 2.5, F.lit(False))
    )
    assert bad.count() == 0
    assert df.filter(F.col("is_anomaly")).count() > 0


def test_char_lm_junk_scores_strictly_above_clean(spark, sf_dir):
    df = CATALOG["text_char_lm_score"].fn(spark, sf_dir)
    clean_max = (
        df.filter(F.col("doc_id") < 4000000)
        .agg(F.max("bits_per_gram"))
        .collect()[0][0]
    )
    junk_min = (
        df.filter(F.col("doc_id") >= 4000000)
        .agg(F.min("bits_per_gram"))
        .collect()[0][0]
    )
    # vowel-struck docs are far outside the clean model's distribution
    assert junk_min > clean_max + 1.0
    assert df.filter(F.col("doc_id") >= 4000000).filter(F.col("keep")).count() == 0
