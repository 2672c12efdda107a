"""Vector expression kit for embedding-similarity operators.

Dot products / norms / cosine as native Column expressions over
``array<float|double>`` columns: ``F.zip_with`` + ``F.aggregate`` stay
JVM-side (no Python round-trip), and the left-to-right accumulation order is
deterministic — the same order DuckDB's ``list_dot_product`` uses, so
cosines are bit-identical to the oracle's.

For 100 TB-scale ANN, exact cosine is the *rerank* step; candidate
generation is LSH bucketing (operators/similarity.py) so the crossJoin
never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(v: Column | str) -> Column:
    col = F.col(v) if isinstance(v, str) else v
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def with_const_matrix(df, col_name: str, matrix) -> "DataFrame":  # noqa: F821
    """Attach a small constant matrix (list of float rows) to every row as
    one ``array<array<double>>`` column via a broadcast one-row crossJoin.

    Embedding a k x dim matrix as per-cell ``F.lit`` nodes puts k*dim
    literals into the expression tree; Catalyst analysis + codegen is
    O(tree size) and measurably dominates small-data ANN queries (seconds
    of planning for 16x64). A one-row broadcast join keeps the tree tiny
    and the matrix rides to every executor once — the same pattern that
    ships centroid/plane state at 100 TB."""
    spark = df.sparkSession
    data = [([[float(x) for x in row] for row in matrix],)]
    row_df = spark.createDataFrame(data, f"{col_name} array<array<double>>")
    return df.crossJoin(F.broadcast(row_df))


def sign_bits(v: Column, planes: Column) -> Column:
    """``array<int>`` of sign bits of v . p for each plane row (JVM-side;
    identical accumulation order to the per-plane literal form)."""
    return F.transform(
        planes, lambda p: F.when(dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0))
    )
