"""Unit tests for the §2.9 scalar cleaning kit — every semantic trap from
SURVEY.md §4 (date patterns, cast-to-NULL, uuid case, bool vocabulary)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.functions import cleaning as K


def _one(spark, expr, value: str | None):
    df = spark.createDataFrame([(value,)], "x string")
    return df.select(expr.alias("y")).collect()[0].y


def test_clean_text_trims_and_nulls_blank(spark):
    assert _one(spark, K.clean_text("x"), "  hi  ") == "hi"
    assert _one(spark, K.clean_text("x"), "   ") is None
    assert _one(spark, K.clean_text("x"), "") is None
    assert _one(spark, K.clean_text("x"), None) is None


def test_parse_date_mdy_tolerates_one_digit_parts(spark):
    # PG 'MM/DD/YYYY' accepts 1-2 digit parts; Spark must use M/d/yyyy (T:174)
    assert _one(spark, K.parse_date_mdy("x"), "1/5/2024") == datetime.date(2024, 1, 5)
    assert _one(spark, K.parse_date_mdy("x"), "01/05/2024") == datetime.date(2024, 1, 5)
    assert _one(spark, K.parse_date_mdy("x"), " 12/31/1999 ") == datetime.date(1999, 12, 31)


def test_parse_date_mdy_rejects_wrong_shapes(spark):
    for bad in ["2024-01-05", "13/45/2024", "not a date", "", None, "1/5/24"]:
        assert _one(spark, K.parse_date_mdy("x"), bad) is None, bad


def test_parse_bool_vocabulary(spark):
    # exact vocabulary, '' -> false not NULL (T:175, T:497-501)
    for v in ["yes", "Y", "TRUE", "1", " yes "]:
        assert _one(spark, K.parse_bool("x"), v) is True, v
    for v in ["no", "N", "False", "0", "", "   "]:
        assert _one(spark, K.parse_bool("x"), v) is False, v
    for v in ["junk", "2", "truthy"]:
        assert _one(spark, K.parse_bool("x"), v) is None, v
    assert _one(spark, K.parse_bool("x"), None) is None


def test_uuid_normalization_case_insensitive(spark):
    up = "AAAAAAAA-BBBB-CCCC-DDDD-EEEEFFFF0000"
    assert _one(spark, K.norm_uuid("x"), up) == up.lower()
    assert _one(spark, K.norm_uuid("x"), f"  {up}  ") == up.lower()
    assert _one(spark, K.norm_uuid("x"), "not-a-uuid") is None
    assert _one(spark, K.norm_uuid("x"), None) is None


def test_parse_int_guarded(spark):
    assert _one(spark, K.parse_int("x"), " 42 ") == 42
    assert _one(spark, K.parse_int("x"), "-7") == -7
    for bad in ["", "abc", "4.5", None, "1e3"]:
        assert _one(spark, K.parse_int("x"), bad) is None, bad


def test_parse_decimal_guarded_and_rounded(spark):
    import decimal

    assert _one(spark, K.parse_decimal("x"), "3.999") == decimal.Decimal("4.00")
    assert _one(spark, K.parse_decimal("x"), "10") == decimal.Decimal("10.00")
    for bad in ["", "abc", "$5", None]:
        assert _one(spark, K.parse_decimal("x"), bad) is None, bad


def test_gen_uuid_deterministic_and_shaped(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "x string")
    out = df.select(K.gen_uuid(F.col("x")).alias("u")).collect()
    assert out[0].u == out[1].u != out[2].u
    for r in out:
        assert _one(spark, K.is_valid_uuid("x"), r.u) is True
