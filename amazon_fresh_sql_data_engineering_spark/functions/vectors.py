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
