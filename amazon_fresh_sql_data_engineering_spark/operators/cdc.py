"""Change-data-capture primitives: changelog → snapshot and snapshot →
changelog.

Together with ``sources/versioned.py`` (snapshot storage) these close the
incremental-pipeline loop a lakehouse DML layer needs:

- ``changelog_apply`` — materialize the latest state from an I/U/D event
  log (log compaction, the MERGE-free way to consume a CDC feed);
- ``snapshot_diff`` — recover the minimal I/U/D changelog between two
  published snapshots (what changed between ``v=N`` and ``v=N+1``), the
  input an incremental consumer wants when the writer didn't emit a log.

Scale shape: ``changelog_apply`` is ONE map-side-combinable keyed
aggregation (max_by latest-row — each scan task pre-collapses to one
candidate per key before the shuffle); ``snapshot_diff`` is ONE full-outer key join with column-wise
null-safe comparison — both AQE-skew-splittable, neither collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def changelog_apply(
    log: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact an insert/update/delete event log to current state.

    The row with the highest ``seq_col`` per key wins; keys whose latest
    event is a delete disappear. ``seq_col`` must be unique per key (a
    log offset / commit LSN — true for any ordered CDC feed); ties would
    be nondeterministic, so the latest-per-key pick relies on that
    contract.
    """
    return (
        compact_log(log, keys, seq_col)
        .filter(F.col(op_col) != F.lit(delete_op))
        .drop(op_col)
    )


def compact_log(log: DataFrame, keys: list[str], seq_col: str) -> DataFrame:
    """Latest event per key, TOMBSTONES RETAINED (op column kept).

    This is the storage form of log compaction (what Kafka compacted
    topics / LSM stores keep): deletes survive as tombstones so that
    merging an older log segment can never resurrect a deleted key.
    ``changelog_apply`` is this plus the reader-side tombstone filter;
    the streaming apply (streaming/cdc.py) persists THIS form in its
    sink and filters on read.

    Realized as ``max_by(struct(<row>), seq)`` per key rather than the
    dedup-keep-latest ``row_number`` window: the aggregate is map-side
    combinable, so each scan task collapses to ONE candidate row per key
    BEFORE the shuffle — a year-long changelog shuffles ~|live keys|
    rows, where the window form shuffles and sorts the entire log.
    ``max_by`` only needs ``seq_col`` orderable (the payload may contain
    maps or other unorderable types); its tie behavior is unreachable
    under the seq-unique-per-key contract above.
    """
    latest = F.max_by(
        F.struct(*[F.col(c) for c in log.columns]), F.col(seq_col)
    ).alias("__b")
    return log.groupBy(*keys).agg(latest).select("__b.*")


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Minimal I/U/D changelog turning ``old`` into ``new``.

    Full-outer join on ``keys`` (assumed non-NULL — they are the table's
    primary key), then null-safe column-wise comparison of every shared
    non-key column: rows only in ``new`` → I, only in ``old`` → D, in
    both but differing → U; identical rows are dropped. Output carries
    ``op``, the key, and ``old_<col>`` / ``new_<col>`` for each compared
    column.
    """
    payload = [c for c in new.columns if c in set(old.columns) and c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in payload],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in payload],
    )
    j = o.join(n, keys, "full")
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), "I")
        .when(F.col("__in_new").isNull(), "D")
        .when(changed, "U")
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *keys,
            *[F.col(f"old_{c}") for c in payload],
            *[F.col(f"new_{c}") for c in payload],
        )
    )
