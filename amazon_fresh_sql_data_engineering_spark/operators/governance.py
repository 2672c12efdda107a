"""Column masking and row-level security as plan rewrites.

The governance layer every multi-tenant warehouse bolts on (Postgres has
column grants + RLS policies; Snowflake/Databricks have masking policies)
expressed the Spark way: a policy is a LIST OF COLUMN EXPRESSIONS applied
in one narrow ``select`` — zero shuffles, zero UDFs, fully
codegen-friendly, and composable in front of ANY query because the result
is just a DataFrame.

Mask kinds:

- ``hash_mask``  — salted SHA-256 pseudonymization. Deterministic, so
  referential integrity survives (the same value tokenizes identically on
  every table — masked joins still work); the salt keeps rainbow tables
  off the tokens.
- ``partial_mask`` — redact all but the trailing ``keep`` characters
  (the credit-card / account-number display form).
- ``null_mask``  — column-level deny: the value is simply gone.
- ``bucket_mask`` — numeric generalization to ``width``-sized bins
  (the k-anonymity coarsening for quasi-identifiers).

``row_policy`` is RLS: a boolean predicate pushed in front of the masked
projection — because it is an ordinary ``filter``, Catalyst pushes it into
the parquet scan like any other predicate (no "security tax" at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_mask(column: str, salt: str) -> Column:
    return F.sha2(F.concat(F.lit(salt), F.col(column).cast("string")), 256)


def partial_mask(column: str, keep: int = 4, char: str = "*") -> Column:
    col = F.col(column)
    # explicit positive start index: negative-start substring semantics
    # differ between engines (Spark counts from the end, PG/DuckDB from a
    # virtual position left of the string)
    visible = F.substring(col, F.length(col) - keep + 1, F.lit(keep))
    return F.when(
        F.length(col) <= keep, col
    ).otherwise(
        F.concat(F.repeat(F.lit(char), F.length(col) - keep), visible)
    )


def null_mask(column: str) -> Column:
    return F.lit(None)


def bucket_mask(column: str, width: float) -> Column:
    return F.floor(F.col(column) / F.lit(width)) * F.lit(width)


def apply_policy(
    df: DataFrame,
    masks: dict[str, Column],
    row_policy: Column | None = None,
    drop: list[str] | None = None,
) -> DataFrame:
    """Masked + row-filtered view of ``df``.

    ``masks`` maps column name -> replacement expression (built from the
    helpers above or any Column); unmentioned columns pass through;
    ``drop`` removes columns entirely. The row policy is applied BEFORE
    masking, on the raw values — RLS decisions see the truth, readers of
    the result never do.
    """
    out = df if row_policy is None else df.filter(row_policy)
    cols = []
    dropped = set(drop or [])
    for name in df.columns:
        if name in dropped:
            continue
        cols.append(masks[name].alias(name) if name in masks else F.col(name))
    return out.select(*cols)
