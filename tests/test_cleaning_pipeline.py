"""End-to-end PIPE-CLEAN-* tests on dirty staging fixtures (FIXTURES.md §2).

Covers every dirt pattern the reference's pipeline survives: garbage PK
uuids, malformed FK text (quarantine -> id-remap), missing parents
(placeholder synthesis), whitespace, blank numerics, M/D/YYYY dates, boolean
vocabulary, blank PKs, duplicate PKs, and the conservation invariant."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.operators import constraints as C
from amazon_fresh_sql_data_engineering_spark.pipelines import entities as E
from amazon_fresh_sql_data_engineering_spark.pipelines.cleaning import (
    build_id_mapping,
    remap_quarantined,
)
from amazon_fresh_sql_data_engineering_spark.schemas import (
    FOREIGN_KEYS,
    PRIMARY_KEYS,
    STAGING_COLUMNS,
)
from amazon_fresh_sql_data_engineering_spark.sources.loaders import all_string_schema

U = [f"{i:08d}-0000-0000-0000-000000000000" for i in range(10)]  # valid uuids
UP = "AAAAAAAA-BBBB-CCCC-DDDD-EEEEFFFF0000"  # valid, mixed case


def _staging(spark, table, rows):
    cols = STAGING_COLUMNS[table]
    return spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], all_string_schema(cols)
    )


@pytest.fixture(scope="module")
def dirty(spark):
    suppliers = _staging(
        spark,
        "suppliers",
        [
            {"supplierid": U[0], "suppliername": "  Acme  ", "city": "Springfield"},
            {"supplierid": UP, "suppliername": "Upper Co", "city": ""},
            {"supplierid": "garbage-pk", "suppliername": "Garbage Id Co"},  # PK repaired
            {"supplierid": "   ", "suppliername": "Blank PK Co"},  # dropped
        ],
    )
    customers = _staging(
        spark,
        "customers",
        [
            {
                "customerid": U[1],
                "name": " Ann ",
                "age": "34",
                "signupdate": "1/5/2024",
                "primemember": "yes",
            },
            {
                "customerid": U[2],
                "name": "Bob",
                "age": "",
                "signupdate": "12/31/1999",
                "primemember": "",
            },
            {
                "customerid": U[3],
                "name": "Cat",
                "age": "abc",
                "signupdate": "2024-01-05",
                "primemember": "junk",
            },
            {"customerid": U[3], "name": "Cat-dup", "age": "20"},  # dup PK: collapsed
        ],
    )
    products = _staging(
        spark,
        "products",
        [
            {
                "productid": U[4],
                "productname": "Widget",
                "priceperunit": "9.99",
                "stockquantity": "5",
                "supplierid": U[0],  # existing parent
            },
            {
                "productid": U[5],
                "productname": "Gadget",
                "priceperunit": "",
                "stockquantity": "",
                "supplierid": U[9],  # valid shape, missing parent -> placeholder
            },
            {
                "productid": U[6],
                "productname": "Doohickey",
                "priceperunit": "3.999",
                "supplierid": "SUP-123",  # malformed FK -> quarantine
            },
            {"productid": U[7], "productname": "Thing", "supplierid": ""},  # optional FK blank
        ],
    )
    orders = _staging(
        spark,
        "orders",
        [
            {
                "orderid": U[8],
                "customerid": U[1],
                "orderdate": "2/3/2024",
                "shipdate": "13/45/2024",  # impossible -> NULL
                "shipmode": "Air",
                "totalamount": "100.50",
            },
        ],
    )
    return {
        "suppliers": suppliers,
        "customers": customers,
        "products": products,
        "orders": orders,
    }


@pytest.fixture(scope="module")
def pipeline_run(dirty):
    return E.run_full_pipeline(dirty)


def test_conservation_invariant(dirty, pipeline_run):
    finals, results = pipeline_run
    # suppliers: 4 staged = 3 final + 0 quarantined + 1 dropped
    r = results["suppliers"]
    assert (r.dropped.count(), r.quarantined.count()) == (1, 0)
    assert finals["suppliers"].filter(
        F.col("suppliername") != "UNKNOWN SUPPLIER"
    ).count() == 3
    # products: 4 staged = 3 final + 1 quarantined + 0 dropped
    r = results["products"]
    assert (r.dropped.count(), r.quarantined.count()) == (0, 1)
    assert finals["products"].filter(
        F.col("productname") != "UNKNOWN PRODUCT"
    ).count() == 3


def test_pk_repair_and_normalization(pipeline_run):
    finals, _ = pipeline_run
    sup = {r.suppliername: r.supplierid for r in finals["suppliers"].collect()}
    assert sup["Upper Co"] == UP.lower()  # mixed-case uuid normalized
    repaired = sup["Garbage Id Co"]
    assert repaired != "garbage-pk" and len(repaired) == 36  # fresh uuid, row kept


def test_type_casts(pipeline_run):
    finals, _ = pipeline_run
    ann = finals["customers"].filter(F.col("name") == "Ann").collect()[0]
    assert ann.age == 34
    assert ann.signupdate == datetime.date(2024, 1, 5)
    assert ann.primemember is True
    bob = finals["customers"].filter(F.col("name") == "Bob").collect()[0]
    assert bob.age is None and bob.primemember is False  # '' -> false, not NULL
    cat = finals["customers"].filter(F.col("name").startswith("Cat")).collect()
    assert len(cat) == 1  # dup PK collapsed
    widget = finals["products"].filter(F.col("productname") == "Widget").collect()[0]
    assert widget.priceperunit == decimal.Decimal("9.99")
    order = finals["orders"].collect()[0]
    assert order.orderdate == datetime.date(2024, 2, 3)
    assert order.shipdate is None  # 13/45/2024 impossible
    assert order.totalamount == decimal.Decimal("100.50")


def test_placeholder_parent_synthesized(pipeline_run):
    finals, _ = pipeline_run
    ph = finals["suppliers"].filter(F.col("suppliername") == "UNKNOWN SUPPLIER").collect()
    assert len(ph) == 1 and ph[0].supplierid == U[9]


def test_integrity_after_pipeline(pipeline_run):
    finals, _ = pipeline_run
    fks = [e for e in FOREIGN_KEYS if e[0] in finals and e[2] in finals]
    C.assert_clean(finals, PRIMARY_KEYS, fks)


def test_idremap_repairs_quarantine(spark, dirty, pipeline_run):
    finals, results = pipeline_run
    q = results["products"].quarantined
    mapping = build_id_mapping(q, ["supplierid"], salt="products.fk")
    m = mapping.collect()
    assert len(m) == 1 and m[0].old_text == "SUP-123" and len(m[0].new_uuid) == 36
    res = remap_quarantined(
        q,
        E.spec_products(),
        mapping,
        parents=finals,
        existing=finals["products"],
    )
    # repaired row now in final with remapped FK; placeholder parent created
    doo = res.final.filter(F.col("productname") == "Doohickey").collect()[0]
    assert doo.supplierid == m[0].new_uuid
    assert doo.priceperunit == decimal.Decimal("4.00")  # 3.999 rounded HALF_UP
    ph = res.placeholders["suppliers"].collect()
    assert [p.supplierid for p in ph] == [m[0].new_uuid]
    # conservation closes: 4 staged = 4 final + 0 outstanding
    assert res.final.filter(F.col("productname") != "UNKNOWN PRODUCT").count() == 4


def test_pipeline_idempotent_rerun(dirty, pipeline_run):
    finals, _ = pipeline_run
    finals2, _ = E.run_full_pipeline(dirty)
    for name in finals:
        assert finals[name].count() == finals2[name].count()
    # re-upserting the same staging over existing finals is a no-op
    from amazon_fresh_sql_data_engineering_spark.pipelines.cleaning import clean_entity

    res = clean_entity(
        dirty["suppliers"], E.spec_suppliers(), existing=finals["suppliers"]
    )
    assert res.final.count() == finals["suppliers"].count()


def test_idremap_roundtrip_catalog_conservation(spark, sf_dir):
    """The driver-facing q_idremap_roundtrip shape: every FK-quarantined
    order from the cleaning pass must land in the remapped final (no row
    lost, no row invented) and every remapped FK must be uuid-shaped."""
    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
    from amazon_fresh_sql_data_engineering_spark.pipelines.cleaning import clean_entity
    from amazon_fresh_sql_data_engineering_spark.pipelines.entities import spec_orders
    from amazon_fresh_sql_data_engineering_spark.queries_etl import _staged_orders

    res = clean_entity(_staged_orders(spark, sf_dir), spec_orders())
    out = CATALOG["q_idremap_roundtrip"].fn(spark, sf_dir)
    assert out.count() == res.quarantined.count()
    from amazon_fresh_sql_data_engineering_spark.functions.cleaning import is_valid_uuid

    assert out.filter(~is_valid_uuid("customerid")).count() == 0


def test_fk_fastpath_equals_norm_uuid_on_survivors(spark):
    """r12: FK clean exprs use norm_uuid_prevalidated (blank->NULL else
    lowercase-trim, no second uuid regex). Prove it equals norm_uuid on
    every row clean_entity's quarantine lets through, across every dirt
    class: valid lower/upper/mixed uuids, blanks, NULLs, whitespace-padded
    uuids — and that garbage FK text never reaches the cleaned frame."""
    from amazon_fresh_sql_data_engineering_spark.functions.cleaning import (
        norm_uuid,
        norm_uuid_prevalidated,
    )
    from amazon_fresh_sql_data_engineering_spark.pipelines.cleaning import (
        clean_entity,
    )

    rows = [
        {"productid": U[0], "supplierid": U[1]},
        {"productid": U[2], "supplierid": UP},  # mixed-case uuid
        {"productid": U[3], "supplierid": f"  {U[4]}  "},  # padded uuid
        {"productid": U[5], "supplierid": ""},  # blank -> NULL
        {"productid": U[6], "supplierid": None},  # NULL stays NULL
        {"productid": U[7], "supplierid": "   "},  # whitespace -> NULL
        {"productid": U[8], "supplierid": "not-a-uuid"},  # quarantined
    ]
    staging = _staging(spark, "products", rows)
    res = clean_entity(staging, E.spec_products())
    got = {
        r["productid"]: r["supplierid"]
        for r in res.final.select("productid", "supplierid").collect()
    }
    want = {
        r["productid"]: r["supplierid"]
        for r in staging.select(
            F.lower(F.trim("productid")).alias("productid"),
            norm_uuid("supplierid").alias("supplierid"),
        ).collect()
        if r["productid"] in got
    }
    assert got == want
    assert U[8] not in got  # garbage FK row quarantined, not cleaned
    assert res.quarantined.count() == 1
    # the two expressions agree verbatim on any blank-or-valid input
    probe = _staging(
        spark,
        "products",
        [{"productid": U[9], "supplierid": v} for v in [U[0], UP, "", None, "  "]],
    )
    both = probe.select(
        norm_uuid("supplierid").alias("a"),
        norm_uuid_prevalidated("supplierid").alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in both)
