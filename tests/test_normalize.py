"""Tests for PIPE-NORMALIZE (3NF extraction, ref A:319-527)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.pipelines.normalize import (
    GENERAL,
    UNCATEGORIZED,
    normalize_products,
)


def _products(spark):
    return spark.createDataFrame(
        [
            (1, "Fruits", "Citrus"),
            (2, "fruits", "citrus"),  # case-insensitive: same category/subcat
            (3, "Dairy", None),  # NULL subcategory -> General
            (4, None, None),  # NULL category -> Uncategorized/General
            (5, "  ", "Berries"),  # blank category -> Uncategorized
        ],
        "pid int, category string, subcategory string",
    )


def test_lookup_tables_deduped_case_insensitively(spark):
    cats, subs, _ = normalize_products(_products(spark))
    names = sorted(r.category for r in cats.collect())
    assert names == ["Dairy", "Fruits", UNCATEGORIZED]
    assert cats.select("categoryid").distinct().count() == 3
    assert subs.count() == 4  # (fruits,citrus) (dairy,general) (uncat,general) (uncat,berries)


def test_backfill_and_fallbacks(spark):
    cats, subs, p3 = normalize_products(_products(spark))
    assert set(p3.columns) == {"pid", "subcategoryid"}
    assert p3.filter(F.col("subcategoryid").isNull()).count() == 0
    # case variants share one subcategoryid
    ids = [r.subcategoryid for r in p3.filter(F.col("pid").isin(1, 2)).collect()]
    assert ids[0] == ids[1]
    # NULL category/subcategory rows land on Uncategorized/General
    lut = {(r.category, r.subcategory): r.subcategoryid for r in
           subs.join(cats, "categoryid").select("category", "subcategory", "subcategoryid").collect()}
    p4 = p3.filter(F.col("pid") == 4).collect()[0]
    assert p4.subcategoryid == lut[(UNCATEGORIZED, GENERAL)]


def test_deterministic_ids_stable_across_runs(spark):
    _, subs1, _ = normalize_products(_products(spark))
    _, subs2, _ = normalize_products(_products(spark))
    assert sorted(map(str, subs1.collect())) == sorted(map(str, subs2.collect()))
