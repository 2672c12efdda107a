"""As-of (merge) join: for each left row, the most recent right row at or
before the left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB and pandas do; the reference's SQL
surface has none either — this is part of the training-data extension
scope). The 100 TB-safe plan is NOT a per-key range join (left x right
then filter picks O(pairs) intermediate rows), but the classic
union-merge:

1. tag right rows priority 1 carrying a payload struct, left rows
   priority 0 carrying the left row struct;
2. ONE shuffle + sort of |L| + |R| rows by (key, ts, priority desc,
   tiebreak);
3. running ``last(payload, ignorenulls=True)`` over rows-unbounded-
   preceding — each left row picks up the latest right payload at or
   before its timestamp.

Cost is one Exchange + one sort — the plan a hand-written merge join
would produce. Determinism: ties on (key, ts) resolve right-before-left
(inclusive match) and multiple right rows at the same ts resolve to the
greatest ``tiebreak`` value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: str,
    how: str = "inner",
) -> DataFrame:
    """As-of backward join (inclusive): left columns + ``payload`` columns
    (``{out_name: right_col}``) from the most recent right row with
    ``right_ts <= left_ts`` per ``on`` key.

    ``tiebreak`` (a unique right column) makes the winner among equal
    timestamps deterministic: the greatest tiebreak value wins.
    ``how="left"`` keeps unmatched left rows with NULL payload.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    r = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__pri"),
        F.col(tiebreak).alias("__tb"),
        F.struct(*[F.col(c).alias(a) for a, c in payload.items()]).alias("__rp"),
    )
    tb_type = right.schema[tiebreak].dataType
    rp_type = r.schema["__rp"].dataType
    l = left.filter(F.col(left_ts).isNotNull()).select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__pri"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(rp_type).alias("__rp"),
        F.struct(*left.columns).alias("__lrow"),
    )
    lrow_type = l.schema["__lrow"].dataType
    merged = r.withColumn("__lrow", F.lit(None).cast(lrow_type)).unionByName(l)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__pri").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        merged.withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__pri") == 0)
    )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    return matched.select("__lrow.*", *[F.col(f"__match.{a}").alias(a) for a in payload])
