"""PIPE-NORMALIZE: 3NF extraction of categories/subcategories
(SURVEY.md §2.12, ref A:319-527).

The reference pulls ``category``/``subcategory`` text out of ``products``
into two lookup tables, adds ``products.subcategoryid``, and backfills it by
case-insensitive text join (A:358 ``LOWER(c.category) = LOWER(p.category)``),
with 'Uncategorized'/'General' fallbacks for NULL/blank text (A:388-402,
A:474-500). IDs come from ``gen_random_uuid()`` (A:330) — here they are
content-addressed (sha2-derived) by default, so the normalization is
deterministic and re-runnable.

Scale: the lookup tables are tiny by construction (distinct category text),
so the backfill join is a broadcast; the products rewrite is one narrow
pass. That holds at any fact-table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_text, gen_uuid

UNCATEGORIZED = "Uncategorized"  # ref A:388-402
GENERAL = "General"  # ref A:474-500


def _norm_cat(c):
    return F.coalesce(clean_text(c), F.lit(UNCATEGORIZED))


def _norm_subcat(c):
    return F.coalesce(clean_text(c), F.lit(GENERAL))


def normalize_products(
    products: DataFrame,
    category_col: str = "category",
    subcategory_col: str = "subcategory",
    deterministic_ids: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Extract (categories, subcategories) lookups and return the rewritten
    products with ``subcategoryid`` replacing the two text columns.

    Returns ``(categories, subcategories, products_3nf)``:
      - categories(categoryid, category)                   (ref A:329-332)
      - subcategories(subcategoryid, categoryid, subcategory) (ref A:336-341)
      - products_3nf: original columns minus category/subcategory text,
        plus subcategoryid NOT NULL                         (ref A:362-363)
    """

    def _id(col, salt):
        if deterministic_ids:
            return gen_uuid(F.concat_ws("\x1f", F.lit(salt), F.lower(col)))
        return gen_uuid()

    cat = _norm_cat(category_col)
    sub = _norm_subcat(subcategory_col)

    # case-insensitive dedup with a deterministic canonical representative
    # (min text per lowered key) — mirrors the reference's LOWER() equality
    # treating 'Fruits'/'fruits' as one category (ref A:358)
    categories = (
        products.select(cat.alias("category"))
        .groupBy(F.lower(F.col("category")).alias("__k"))
        .agg(F.min("category").alias("category"))
        .select(_id(F.col("category"), "category").alias("categoryid"), "category")
    )
    subcategories = (
        products.select(cat.alias("category"), sub.alias("subcategory"))
        .groupBy(
            F.lower(F.col("category")).alias("__kc"),
            F.lower(F.col("subcategory")).alias("__ks"),
        )
        .agg(F.min("category").alias("category"), F.min("subcategory").alias("subcategory"))
        .select(
            _id(
                F.concat_ws("\x1f", F.lower("category"), F.lower("subcategory")),
                "subcategory",
            ).alias("subcategoryid"),
            _id(F.col("category"), "category").alias("categoryid"),
            "subcategory",
        )
    )

    # backfill by case-insensitive text join (ref A:358, A:455-462); the
    # lookup side is tiny -> broadcast, no shuffle of the fact table
    keyed = products.withColumn("__cat", F.lower(cat)).withColumn("__sub", F.lower(sub))
    lut = subcategories.join(
        categories, on="categoryid"
    ).select(
        F.lower("category").alias("__cat"),
        F.lower("subcategory").alias("__sub"),
        "subcategoryid",
    )
    products_3nf = (
        keyed.join(F.broadcast(lut), on=["__cat", "__sub"], how="left")
        .drop("__cat", "__sub", category_col, subcategory_col)
    )
    return categories, subcategories, products_3nf
