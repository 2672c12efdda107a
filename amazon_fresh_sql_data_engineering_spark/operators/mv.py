"""Incremental materialized-view maintenance (delta apply).

A warehouse MV over an append-heavy fact table must not be rebuilt from
scratch per batch: at 100 TB the base scan dwarfs any delta. For
DISTRIBUTIVE aggregates (COUNT, SUM — and anything derivable from them:
AVG = SUM/COUNT, ratios, rates) the view state is a partial-aggregate
table, and applying a change batch is pure aggregate algebra:

    MV' = re-agg( MV  UNION ALL  signed-partial-agg(delta) )

where deletes contribute with weight -1 and inserts with +1 (the classic
"delta rule" of incremental view maintenance — inserts/deletes as signed
multiset changes; see Gupta & Mumick, "Maintenance of Materialized Views:
Problems, Techniques, and Applications", IEEE DE Bulletin 1995 — public
literature, re-expressed on the DataFrame API).

Scale shape: ONE shuffle keyed on the view grain, sized |MV| + |delta
partials| — never the base table. Store the MV bucketed by the grain keys
and the union re-agg co-partitions with zero extra exchange on the MV
side; the delta side map-side pre-aggregates to one partial row per
touched group. Groups whose count reaches zero are dropped (the view
never carries tombstones). MIN/MAX are NOT maintainable this way under
deletes (not invertible) — reject them at the API instead of silently
recomputing.

Reference semantics twin: the reference keeps summary tables current with
INSERT ... ON CONFLICT DO UPDATE accumulation (TablesCreated-Imported.sql
upsert idiom); this is the same contract expressed as distributed
aggregate algebra instead of row-at-a-time conflict handlers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-state column suffixes: every measure m is carried as m (the sum)
#: plus the shared group row count __mv_cnt
_CNT = "__mv_cnt"


def mv_build(base: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """Materialize the partial-aggregate state of a SUM/COUNT view.

    ``sums`` maps output column name -> source column; the state carries
    each as SUM(source) plus one shared COUNT(*) per group (``__mv_cnt``),
    from which AVG-style readouts derive at query time.
    """
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[F.sum(src).alias(dst) for dst, src in sums.items()],
    )


def mv_apply_delta(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    op_col: str = "__op",
) -> DataFrame:
    """Apply a signed change batch to a ``mv_build`` state table.

    ``delta`` rows are BASE-table rows plus ``op_col`` = +1 (insert) or
    -1 (delete of a previously-inserted row); the caller guarantees
    deletes match rows actually present (the usual CDC contract). Returns
    the new state table with empty groups dropped — exactly
    ``mv_build(base_after_changes)`` (asserted by the oracle and pytest).
    """
    if op_col in (set(keys) | set(sums)):
        raise ValueError(f"mv: op column {op_col!r} collides with a view column")
    signed = delta.groupBy(*keys).agg(
        F.sum(F.col(op_col)).cast("long").alias(_CNT),
        *[
            F.sum(F.col(src) * F.col(op_col)).alias(dst)
            for dst, src in sums.items()
        ],
    )
    # align the delta partials to the MV state dtypes (decimal widening from
    # the signed product would otherwise make the union ambiguous); a delta
    # partial is bounded by the group's base-side aggregate, so the narrow
    # cast cannot overflow under the CDC contract above
    mv_types = dict(mv.dtypes)
    signed = signed.select(
        *keys, _CNT, *[F.col(d).cast(mv_types[d]).alias(d) for d in sums]
    )
    merged = (
        mv.unionByName(signed)
        .groupBy(*keys)
        .agg(
            F.sum(_CNT).cast("long").alias(_CNT),
            *[F.sum(dst).alias(dst) for dst in sums],
        )
    )
    return merged.filter(F.col(_CNT) > 0)
