"""Tests for the §1.3 constraint-validation library (= PIPE-AUDIT)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.operators import constraints as C


def test_check_primary_key_flags_dups_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "id int, v string"
    )
    bad = C.check_primary_key(df, "id")
    got = sorted(((r.id, r.v) for r in bad.collect()), key=str)
    assert got == sorted([(1, "a"), (1, "b"), (None, "d")], key=str)
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert C.check_primary_key(clean, "id").count() == 0


def test_check_foreign_key_orphans(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    child = spark.createDataFrame([(10, 1), (11, 3), (12, None)], "cid int, pid int")
    orphans = C.check_foreign_key(child, "pid", parent, "pid")
    # NULL FK is allowed (optional FK, ref T:1075); only pid=3 is an orphan
    assert [r.cid for r in orphans.collect()] == [11]


def test_check_unique(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "name string")
    dups = C.check_unique(df, ["name"]).collect()
    assert [(r.name, r.dup_count) for r in dups] == [("a", 2)]


def test_check_condition_null_passes(spark):
    # CHECK (age > 18): NULL age passes (UNKNOWN != FALSE), 17 violates
    df = spark.createDataFrame([(1, 17), (2, 30), (3, None)], "id int, age int")
    bad = C.check_condition(df, F.col("age") > 18)
    assert [r.id for r in bad.collect()] == [1]


def test_check_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, v string")
    assert [r.id for r in C.check_not_null(df, ["v"]).collect()] == [2]


def test_audit_report_and_assert_clean(spark):
    customers = spark.createDataFrame([(1, "ann"), (2, "bob")], "cid int, name string")
    orders = spark.createDataFrame([(10, 1), (11, 9)], "oid int, cid int")
    report = C.audit_report(
        {"customers": customers, "orders": orders},
        {"customers": "cid", "orders": "oid"},
        [("orders", "cid", "customers", "cid")],
    ).collect()[0]
    assert report.customers_rows == 2
    assert report.orders_cid_orphans == 1
    ok_orders = spark.createDataFrame([(10, 1)], "oid int, cid int")
    C.assert_clean(
        {"customers": customers, "orders": ok_orders},
        {"customers": "cid", "orders": "oid"},
        [("orders", "cid", "customers", "cid")],
    )


def test_constraint_catalog_lists_declared_metadata(spark):
    """Introspection surface (ref A:33-36): every declared PK/FK/CHECK/
    UNIQUE appears with pg_constraint-style contype codes."""
    from amazon_fresh_sql_data_engineering_spark.pipelines.entities import (
        DECLARED_CHECKS,
        DECLARED_UNIQUES,
        SPEC_FACTORIES,
    )

    specs = {n: f() for n, f in SPEC_FACTORIES.items()}
    cat = C.constraint_catalog(spark, specs, DECLARED_CHECKS, DECLARED_UNIQUES)
    rows = {r.conname: r for r in cat.collect()}
    assert len(rows) == 15
    assert rows["pk_customers"].contype == "p"
    assert rows["pk_customers"].columns == "customerid"
    assert rows["fk_order_details_productid"].contype == "f"
    assert "REFERENCES products" in rows["fk_order_details_productid"].definition
    assert rows["chk_age"].definition == "CHECK (age > 18)"
    assert rows["uq_customer_name"].contype == "u"
    # one pk per table, fk edges match the spec graph
    assert sum(1 for r in rows.values() if r.contype == "p") == len(specs)
