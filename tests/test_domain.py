"""Domain-schema parity: the reference's task list (domain.py) vs the
reference's SQL replayed in DuckDB over the SAME fixture tables
(registered via Arrow). Fixture satisfies FIXTURES.md §1 distribution
requirements (zero-order customer, zero-product supplier, spending ties,
NULL dates, mixed prime cities, dup names, boundary ratings)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal as D

import duckdb
import pytest

from amazon_fresh_sql_data_engineering_spark import domain
from amazon_fresh_sql_data_engineering_spark.pipelines.normalize import normalize_products
from amazon_fresh_sql_data_engineering_spark.schemas import FINAL_SCHEMAS
from tests.oracle_compare import compare


def u(i: int) -> str:
    return f"{i:08d}-0000-0000-0000-000000000000"


@pytest.fixture(scope="module")
def tables(spark):
    customers = spark.createDataFrame(
        [
            (u(1), "Ann", 30, "F", "Springfield", "IL", "US", dt.date(2024, 1, 5), True),
            (u(2), "Bob", 40, "M", "Springfield", "IL", "US", dt.date(2023, 6, 1), False),
            (u(3), "Cat", 25, "F", "Shelbyville", "IL", "US", dt.date(2024, 3, 1), True),
            (u(4), "Dan", 17, "M", "Shelbyville", "IL", "US", None, None),
            (u(5), "Eve", None, "F", "Springfield", "IL", "US", dt.date(2024, 7, 1), True),
            (u(6), "NoOrders", 50, "M", "Ogdenville", "IL", "US", dt.date(2024, 2, 2), False),
            (u(7), "Dup Name", 33, "F", "Ogdenville", "IL", "US", None, True),
            (u(8), "Dup Name", 44, "M", "Ogdenville", "IL", "US", None, False),
        ],
        FINAL_SCHEMAS["customers"],
    )
    suppliers = spark.createDataFrame(
        [
            (u(11), "Acme", "Jo", "555", "Springfield", "IL"),
            (u(12), "Globex", "Al", "556", "Shelbyville", "IL"),
            (u(13), "Initech", "Sy", "557", "Springfield", "IL"),
            (u(14), "NoProducts", "Zz", "558", "Ogdenville", "IL"),
        ],
        FINAL_SCHEMAS["suppliers"],
    )
    products_raw = spark.createDataFrame(
        [
            (u(21), "Apples", "Fruits", "Fresh", D("3.00"), 10, u(11)),
            (u(22), "Pears", "fruits", "fresh", D("4.00"), 20, u(11)),
            (u(23), "Milk", "Dairy", None, D("2.50"), 30, u(12)),
            (u(24), "Cheese", "Dairy", "Aged", D("8.00"), 5, u(12)),
            (u(25), "Soap", None, None, D("1.50"), 40, u(13)),
            (u(26), "Bread", "Bakery", "Loaves", D("2.00"), 15, None),
        ],
        FINAL_SCHEMAS["products"],
    )
    orders = spark.createDataFrame(
        [
            # c1: 5200 total (straddles the 5000 cut)
            (u(31), u(1), dt.date(2024, 1, 10), dt.date(2024, 1, 12), "Air", D("5200.00")),
            # c2 and c3: tied totals (4000 each), inside the 2024 window
            (u(32), u(2), dt.date(2024, 2, 1), None, "Ground", D("2500.00")),
            (u(33), u(2), dt.date(2024, 2, 15), None, "Ground", D("1500.00")),
            (u(34), u(3), dt.date(2024, 3, 1), None, "Air", D("4000.00")),
            # c4: outside window (2023) + NULL orderdate row
            (u(35), u(4), dt.date(2023, 5, 5), None, "Sea", D("800.00")),
            (u(36), u(4), None, None, "Sea", D("200.00")),
            # c5: big spender, two in-window orders
            (u(37), u(5), dt.date(2024, 6, 1), dt.date(2024, 6, 3), "Air", D("6000.00")),
            (u(38), u(5), dt.date(2024, 6, 2), None, "Air", D("100.00")),
            # c7/c8 small orders
            (u(39), u(7), dt.date(2024, 8, 1), None, "Ground", D("50.00")),
            (u(40), u(8), dt.date(2025, 1, 1), None, "Ground", D("70.00")),  # outside
        ],
        FINAL_SCHEMAS["orders"],
    )
    order_details = spark.createDataFrame(
        [
            (u(51), u(31), u(21), 10, D("3.00"), D("0.00")),
            (u(52), u(31), u(23), 4, D("2.50"), D("0.00")),
            (u(53), u(32), u(21), 2, D("3.00"), D("0.10")),
            (u(54), u(33), u(22), 5, D("4.00"), D("0.00")),
            (u(55), u(34), u(23), 8, D("2.50"), D("0.05")),
            (u(56), u(34), u(24), 1, D("8.00"), D("0.00")),
            (u(57), u(35), u(25), 3, D("1.50"), D("0.00")),
            (u(58), u(37), u(24), 20, D("8.00"), D("0.00")),
            (u(59), u(37), u(21), 7, D("3.00"), D("0.00")),
            (u(60), u(38), u(26), 2, D("2.00"), D("0.00")),
            (u(61), u(39), u(26), 1, D("2.00"), D("0.00")),
            (u(62), u(40), u(25), 4, D("1.50"), D("0.00")),
        ],
        FINAL_SCHEMAS["order_details"],
    )
    reviews = spark.createDataFrame(
        [
            (u(71), u(21), u(1), 5, "great"),
            (u(72), u(21), u(2), 4, "good"),
            (u(73), u(23), u(3), 1, "bad"),
            (u(74), u(23), u(5), 2, "meh"),
            (u(75), u(24), u(1), 5, "excellent"),
            (u(76), u(24), None, 5, "anon praise"),
            (u(77), u(25), u(7), 3, "ok"),
        ],
        FINAL_SCHEMAS["reviews"],
    )
    categories, subcategories, products_3nf = normalize_products(products_raw)
    return {
        "customers": customers,
        "suppliers": suppliers,
        "products": products_3nf,
        "products_raw": products_raw,
        "orders": orders,
        "order_details": order_details,
        "reviews": reviews,
        "categories": categories,
        "subcategories": subcategories,
    }


@pytest.fixture(scope="module")
def duck(tables):
    con = duckdb.connect()
    for name, df in tables.items():
        con.register(name, df.toArrow())
    yield con
    con.close()


def test_high_value_customers(tables, duck):
    out = domain.high_value_customers(tables, threshold=4000)
    sql = """
        SELECT customerid, name, total_spending, spending_rank FROM (
            SELECT c.customerid, c.name,
                   CAST(SUM(o.totalamount) AS DECIMAL(38,2)) AS total_spending,
                   RANK() OVER (ORDER BY SUM(o.totalamount) DESC) AS spending_rank
            FROM customers c JOIN orders o ON c.customerid = o.customerid
            GROUP BY c.customerid, c.name
        ) t WHERE total_spending > 4000
    """
    assert not compare(out, duck, sql)
    # distribution check: ties rank equally
    rows = {r.customerid: r.spending_rank for r in out.collect()}
    assert rows[u(1)] == 2  # 5200 between 6100 (c5) and the 4000 ties


def test_order_revenue(tables, duck):
    out = domain.order_revenue(tables)
    sql = """
        SELECT o.orderid, o.customerid, o.orderdate,
               COUNT(od.orderdetailid) AS line_count,
               CAST(SUM(CAST(od.quantity * od.unitprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS revenue
        FROM orders o JOIN order_details od ON od.orderid = o.orderid
        GROUP BY o.orderid, o.customerid, o.orderdate
    """
    assert not compare(out, duck, sql)


def test_top_customers_period_and_ties(tables, duck):
    out = domain.top_customers_period(tables, "2024-01-01", "2025-01-01", limit=20)
    sql = """
        SELECT customerid, num_orders,
               RANK() OVER (ORDER BY num_orders DESC) AS order_rank
        FROM (
            SELECT customerid, COUNT(*) AS num_orders FROM orders
            WHERE orderdate >= DATE '2024-01-01' AND orderdate < DATE '2025-01-01'
            GROUP BY customerid
        ) ORDER BY num_orders DESC, customerid LIMIT 20
    """
    assert not compare(out, duck, sql)
    ties = domain.top_customers_ties(tables, "2024-01-01", "2025-01-01")
    got = sorted(r.customerid for r in ties.collect())
    assert got == [u(2), u(5)]  # both have 2 in-window orders


def test_supplier_stock(tables, duck):
    out = domain.supplier_stock(tables)
    sql = """
        SELECT s.supplierid, s.suppliername,
               CAST(SUM(COALESCE(p.stockquantity, 0)) AS BIGINT) AS total_stock
        FROM suppliers s LEFT JOIN products p ON p.supplierid = s.supplierid
        GROUP BY s.supplierid, s.suppliername
        ORDER BY total_stock DESC, s.supplierid LIMIT 1
    """
    assert not compare(out, duck, sql)
    # zero-product supplier present with stock 0 in the ties universe
    allrows = domain.supplier_stock(tables, ties=True)
    assert allrows.count() >= 1


def test_top3_products_and_sales_rank(tables, duck):
    out = domain.top3_products_by_revenue(tables)
    sql = """
        SELECT t.productid,
               (SELECT p.productname FROM products_raw p WHERE p.productid = t.productid) AS productname,
               t.total_revenue
        FROM (
            SELECT productid,
                   CAST(SUM(CAST(quantity * unitprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS total_revenue
            FROM order_details GROUP BY productid
            ORDER BY total_revenue DESC, productid LIMIT 3
        ) t
    """
    assert not compare(out, duck, sql)
    rank = domain.product_sales_rank(
        {**tables, "products": tables["products_raw"]}
    )
    sql2 = """
        SELECT p.productid, p.productname,
               CAST(SUM(CAST(od.quantity * od.unitprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS total_sales,
               RANK() OVER (ORDER BY SUM(CAST(od.quantity * od.unitprice AS DECIMAL(38,4))) DESC) AS sales_rank
        FROM order_details od JOIN products_raw p ON p.productid = od.productid
        GROUP BY p.productid, p.productname
    """
    assert not compare(rank, duck, sql2)


def test_customers_no_orders(tables, duck):
    out = domain.customers_no_orders(tables)
    sql = """
        SELECT c.customerid, c.name FROM customers c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.customerid = c.customerid)
    """
    assert not compare(out, duck, sql)
    assert {r.customerid for r in out.collect()} == {u(6)}


def test_prime_cities(tables, duck):
    out = domain.prime_cities(tables)
    sql = """
        SELECT city, COUNT(*) AS total_customers,
               COUNT(*) FILTER (WHERE primemember = true) AS prime_customers,
               round(COUNT(*) FILTER (WHERE primemember = true) * 100.0
                     / nullif(COUNT(*), 0), 2) AS prime_percentage
        FROM customers GROUP BY city
    """
    assert not compare(out, duck, sql)


def test_top_categories_through_3nf(tables, duck):
    out = domain.top_categories(tables)
    sql = """
        SELECT c.category, COUNT(*) AS line_count
        FROM order_details od
        JOIN products p ON od.productid = p.productid
        JOIN subcategories s ON p.subcategoryid = s.subcategoryid
        JOIN categories c ON s.categoryid = c.categoryid
        GROUP BY c.category
        ORDER BY line_count DESC, c.category LIMIT 3
    """
    assert not compare(out, duck, sql)
    # case-insensitive 3NF: 'Fruits' and 'fruits' products roll up together
    cats = {r.category: r.line_count for r in out.collect()}
    assert cats.get("Fruits", 0) == 4  # apples x3 + pears x1


def test_products_avg_rating(tables, duck):
    out = domain.products_avg_rating(
        {**tables, "products": tables["products_raw"]}, min_rating=4.0
    )
    sql = """
        SELECT r.productid, p.productname,
               COUNT(r.reviewid) AS review_count,
               round(SUM(r.rating) / COUNT(r.rating), 4) AS avg_rating
        FROM reviews r JOIN products_raw p ON p.productid = r.productid
        GROUP BY r.productid, p.productname
        HAVING round(SUM(r.rating) / COUNT(r.rating), 4) > 4.0
    """
    assert not compare(out, duck, sql)


def test_dml_tasks(tables):
    repaired = domain.repair_underage(tables)
    ages = {r.customerid: r.age for r in repaired.collect()}
    assert ages[u(4)] == 19 and ages[u(5)] == 19 and ages[u(1)] == 30
    deduped = domain.dedup_customers_by_name(tables)
    assert deduped.filter(deduped.name == "Dup Name").count() == 1
    updated = domain.update_stock(tables, u(21), 99)
    assert updated.filter(updated.productid == u(21)).collect()[0].stockquantity == 99
    new_sup, new_prod = domain.delete_suppliers_by_city(
        {**tables, "products": tables["products_raw"]}, "springfield"
    )
    assert new_sup.count() == 2  # Acme + Initech gone (city match, ci)
    nulled = new_prod.filter(new_prod.supplierid.isNull())
    assert nulled.count() == 4  # apples/pears/soap FKs nulled + bread already null
    defaulted = domain.apply_prime_default(tables)
    assert defaulted.filter(defaulted.primemember.isNull()).count() == 0
