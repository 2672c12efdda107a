"""Explicit StructTypes for the reference data model (SURVEY.md §1).

Two tiers, mirroring the reference's staging/final split:
- ``*_STAGING``: all-StringType ("stringly typed" TEXT staging,
  ref T:80-103) — CSV lands here untyped, cleaning casts later.
- final typed schemas (ref T:20-75): uuid keys are lowercase 36-char hex
  strings (StringType; PG uuid equality is case-insensitive so we normalize
  at ingest, SURVEY §1.2), money is DecimalType for exactness.

At 100 TB these schemas matter because explicit types keep parquet scans
vectorized and pushdown-eligible; schema inference is banned.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


_S = T.StringType()
_I = T.IntegerType()
_D = T.DateType()
_B = T.BooleanType()
_MONEY = T.DecimalType(12, 2)
_DISCOUNT = T.DecimalType(5, 2)

# --- final typed tables (ref T:20-75) --------------------------------------

SUPPLIERS = _struct(
    ("supplierid", _S, False),
    ("suppliername", _S, False),
    ("contactperson", _S, True),
    ("phone", _S, True),
    ("city", _S, True),
    ("state", _S, True),
)

PRODUCTS = _struct(
    ("productid", _S, False),
    ("productname", _S, False),
    ("category", _S, True),
    ("subcategory", _S, True),
    ("priceperunit", _MONEY, True),
    ("stockquantity", _I, True),
    ("supplierid", _S, True),  # FK→suppliers, ON DELETE SET NULL
)

CUSTOMERS = _struct(
    ("customerid", _S, False),
    ("name", _S, False),
    ("age", _I, True),
    ("gender", _S, True),
    ("city", _S, True),
    ("state", _S, True),
    ("country", _S, True),
    ("signupdate", _D, True),
    ("primemember", _B, True),
)

ORDERS = _struct(
    ("orderid", _S, False),
    ("customerid", _S, True),  # nullable: placeholder orders (ref T:760)
    ("orderdate", _D, True),
    ("shipdate", _D, True),
    ("shipmode", _S, True),
    ("totalamount", _MONEY, True),
)

ORDER_DETAILS = _struct(
    ("orderdetailid", _S, False),
    ("orderid", _S, True),
    ("productid", _S, True),
    ("quantity", _I, True),
    ("unitprice", _MONEY, True),
    ("discount", _DISCOUNT, True),
)

REVIEWS = _struct(
    ("reviewid", _S, False),
    ("productid", _S, True),
    ("customerid", _S, True),  # optional FK (ref T:1075)
    ("rating", _I, True),
    ("reviewtext", _S, True),
)

# post-3NF lookup tables (ref A:329-341)
CATEGORIES = _struct(("categoryid", _S, False), ("category", _S, False))
SUBCATEGORIES = _struct(
    ("subcategoryid", _S, False), ("categoryid", _S, False), ("subcategory", _S, True)
)

# --- staging column lists (ref T:81-103) -----------------------------------

STAGING_COLUMNS: dict[str, list[str]] = {
    "suppliers": ["supplierid", "suppliername", "contactperson", "phone", "city", "state"],
    "products": [
        "productid",
        "productname",
        "category",
        "subcategory",
        "priceperunit",
        "stockquantity",
        "supplierid",
    ],
    "customers": [
        "customerid",
        "name",
        "age",
        "gender",
        "city",
        "state",
        "country",
        "signupdate",
        "primemember",
    ],
    "orders": ["orderid", "customerid", "orderdate", "shipdate", "shipmode", "totalamount"],
    "order_details": [
        "orderdetailid",
        "orderid",
        "productid",
        "quantity",
        "unitprice",
        "discount",
    ],
    "reviews": ["reviewid", "productid", "customerid", "rating", "reviewtext"],
}

FINAL_SCHEMAS: dict[str, T.StructType] = {
    "suppliers": SUPPLIERS,
    "products": PRODUCTS,
    "customers": CUSTOMERS,
    "orders": ORDERS,
    "order_details": ORDER_DETAILS,
    "reviews": REVIEWS,
    "categories": CATEGORIES,
    "subcategories": SUBCATEGORIES,
}

PRIMARY_KEYS: dict[str, str] = {
    "suppliers": "supplierid",
    "products": "productid",
    "customers": "customerid",
    "orders": "orderid",
    "order_details": "orderdetailid",
    "reviews": "reviewid",
    "categories": "categoryid",
    "subcategories": "subcategoryid",
}

# FK edges: (child_table, fk_col, parent_table, pk_col)  (ref T:36,53,62-63,71-72)
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("products", "supplierid", "suppliers", "supplierid"),
    ("orders", "customerid", "customers", "customerid"),
    ("order_details", "orderid", "orders", "orderid"),
    ("order_details", "productid", "products", "productid"),
    ("reviews", "productid", "products", "productid"),
    ("reviews", "customerid", "customers", "customerid"),
]
