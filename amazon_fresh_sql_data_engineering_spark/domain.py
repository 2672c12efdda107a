"""The reference's analytics tasks over the reference's own schema.

Every public function takes ``tables: dict[str, DataFrame]`` keyed by the
final table names (suppliers, products, customers, orders, order_details,
reviews, categories, subcategories — schemas.py §1) and returns a
DataFrame, so a user of the reference can point this at their cleaned data
and run the exact task list from ``All-Tasks-of-SQL.sql``. Each function
cites the task block it reproduces; tests/test_domain.py replays the
reference SQL through DuckDB on shared fixtures and asserts equality.

These are the domain-schema twins of the TPC-H-shaped catalog queries
(queries.py) — same operator spine, reference column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators import dml
from .operators.ranking import global_rank

Tables = dict[str, DataFrame]


def high_value_customers(t: Tables, threshold: float = 5000) -> DataFrame:
    """Task 10 (ref A:189-215): total spend per customer, global rank,
    spend > threshold."""
    spend = (
        t["orders"]
        .join(t["customers"], on="customerid")
        .groupBy("customerid", "name")
        .agg(F.sum("totalamount").cast("decimal(38,2)").alias("total_spending"))
    )
    return (
        global_rank(spend, "total_spending", "spending_rank")
        .filter(F.col("total_spending") > threshold)
        .select("customerid", "name", "total_spending", "spending_rank")
    )


def order_revenue(t: Tables) -> DataFrame:
    """Task 11.1 (ref A:230-239): revenue + line count per order."""
    od = t["order_details"]
    line_total = (F.col("quantity") * F.col("unitprice")).cast("decimal(38,4)")
    return (
        t["orders"]
        .join(od, on="orderid")
        .groupBy("orderid", "customerid", "orderdate")
        .agg(
            F.count("orderdetailid").alias("line_count"),
            F.sum(line_total).cast("decimal(38,4)").alias("revenue"),
        )
    )


def top_customers_period(
    t: Tables, start: str, end: str, limit: int = 20
) -> DataFrame:
    """Task 11.2 (ref A:246-264): order counts in [start, end), rank,
    top-N with deterministic tiebreak."""
    counts = (
        t["orders"]
        .filter(
            (F.col("orderdate") >= F.lit(start).cast("date"))
            & (F.col("orderdate") < F.lit(end).cast("date"))
        )
        .groupBy("customerid")
        .agg(F.count(F.lit(1)).alias("num_orders"))
    )
    return (
        global_rank(counts, "num_orders", "order_rank")
        .orderBy(F.col("num_orders").desc(), "customerid")
        .limit(limit)
    )


def top_customers_ties(t: Tables, start: str, end: str) -> DataFrame:
    """Task 11.2 ties variant (ref A:271-280): all customers tied for the
    max order count — scalar-max filter, not LIMIT."""
    counts = (
        t["orders"]
        .filter(
            (F.col("orderdate") >= F.lit(start).cast("date"))
            & (F.col("orderdate") < F.lit(end).cast("date"))
        )
        .groupBy("customerid")
        .agg(F.count(F.lit(1)).alias("num_orders"))
    )
    mx = counts.agg(F.max("num_orders").alias("mx"))
    return counts.join(F.broadcast(mx), counts.num_orders == mx.mx).select(
        "customerid", "num_orders"
    )


def supplier_stock(t: Tables, ties: bool = False) -> DataFrame:
    """Task 11.3 (ref A:288-309): supplier with most stock; LIMIT-1 or
    all-ties variant. Left join keeps zero-product suppliers (A:293)."""
    totals = (
        t["suppliers"]
        .join(t["products"], on="supplierid", how="left")
        .groupBy("supplierid", "suppliername")
        .agg(F.sum(F.coalesce("stockquantity", F.lit(0))).alias("total_stock"))
    )
    if ties:
        mx = totals.agg(F.max("total_stock").alias("mx"))
        return totals.join(F.broadcast(mx), totals.total_stock == mx.mx).select(
            "supplierid", "suppliername", "total_stock"
        )
    return totals.orderBy(F.col("total_stock").desc(), "supplierid").limit(1)


def top3_products_by_revenue(t: Tables) -> DataFrame:
    """Task 13.1 (ref A:536-544): top-3 products by revenue with
    correlated name lookup (decorrelated to a broadcast join)."""
    od = t["order_details"]
    rev = (F.col("quantity") * F.col("unitprice")).cast("decimal(38,4)")
    top3 = (
        od.groupBy("productid")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), "productid")
        .limit(3)
    )
    return top3.join(
        F.broadcast(t["products"].select("productid", "productname")),
        on="productid",
        how="left",
    ).select("productid", "productname", "total_revenue")


def customers_no_orders(t: Tables) -> DataFrame:
    """Task 13.2 (ref A:549-555): NOT EXISTS -> anti-join."""
    return t["customers"].join(
        t["orders"].select("customerid"), on="customerid", how="left_anti"
    ).select("customerid", "name")


def prime_cities(t: Tables) -> DataFrame:
    """Task 14.1 (ref A:566-576): prime-member concentration per city —
    conditional agg + NULLIF-guarded percentage, multi-key sort upstream."""
    total = F.count(F.lit(1))
    prime = F.count(F.when(F.col("primemember") == True, 1))  # noqa: E712
    return (
        t["customers"]
        .groupBy("city")
        .agg(
            total.alias("total_customers"),
            prime.alias("prime_customers"),
            F.round(prime * 100.0 / F.when(total != 0, total), 2).alias("prime_percentage"),
        )
    )


def top_categories(t: Tables, limit: int = 3) -> DataFrame:
    """Task 14.2 (ref A:579-588): top categories by order-line count
    through the 3NF chain od -> products -> subcategories -> categories."""
    return (
        t["order_details"]
        .join(t["products"].select("productid", "subcategoryid"), on="productid")
        .join(F.broadcast(t["subcategories"]), on="subcategoryid")
        .join(F.broadcast(t["categories"]), on="categoryid")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .orderBy(F.col("line_count").desc(), "category")
        .limit(limit)
    )


def products_avg_rating(t: Tables, min_rating: float = 4.0) -> DataFrame:
    """Task 9 (ref A:161-167): products with avg review rating > threshold."""
    return (
        t["reviews"]
        .groupBy("productid")
        .agg(
            F.count("reviewid").alias("review_count"),
            F.round(F.sum("rating") / F.count("rating"), 4).alias("avg_rating"),
        )
        .filter(F.col("avg_rating") > min_rating)
        .join(F.broadcast(t["products"].select("productid", "productname")), on="productid")
        .select("productid", "productname", "review_count", "avg_rating")
    )


def product_sales_rank(t: Tables) -> DataFrame:
    """Task 9 (ref A:169-176): products ranked by total sales."""
    od = t["order_details"]
    sales = (F.col("quantity") * F.col("unitprice")).cast("decimal(38,4)")
    agg = (
        od.join(F.broadcast(t["products"].select("productid", "productname")), on="productid")
        .groupBy("productid", "productname")
        .agg(F.sum(sales).cast("decimal(38,4)").alias("total_sales"))
    )
    return global_rank(agg, "total_sales", "sales_rank")


# --- DML tasks (ref A Tasks 3-8) -------------------------------------------


def repair_underage(t: Tables) -> DataFrame:
    """Task 3 (ref A:44-53): CHECK(age > 18) repair — NULL/<=18 -> 19."""
    return dml.update_where(
        t["customers"],
        F.col("age").isNull() | (F.col("age") <= 18),
        {"age": F.lit(19)},
    )


def dedup_customers_by_name(t: Tables) -> DataFrame:
    """Task 4 (ref A:60-77): UNIQUE(name) — keep first by customerid."""
    return dml.dedup_keep_first(t["customers"], ["name"], [F.col("customerid")])


def update_stock(t: Tables, productid: str, new_stock: int) -> DataFrame:
    """Task 5 (ref A:110-112): stock update by PK."""
    return dml.update_where(
        t["products"], F.col("productid") == productid, {"stockquantity": F.lit(new_stock)}
    )


def delete_suppliers_by_city(t: Tables, city: str) -> tuple[DataFrame, DataFrame]:
    """Task 6 (ref A:123-124) + FK ON DELETE SET NULL (T:36): delete
    suppliers in city, null out product FKs."""
    return dml.set_null_on_delete(
        t["suppliers"],
        t["products"],
        F.lower(F.col("city")) == city.lower(),
        "supplierid",
        "supplierid",
    )


def apply_prime_default(t: Tables) -> DataFrame:
    """Task 8 (ref A:143-144): DEFAULT false for primemember."""
    return t["customers"].withColumn(
        "primemember", F.coalesce("primemember", F.lit(False))
    )
