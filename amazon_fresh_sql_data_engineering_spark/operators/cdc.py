"""Change-data-capture primitives: changelog → snapshot and snapshot →
changelog.

Together with ``sources/versioned.py`` (snapshot storage) these close the
incremental-pipeline loop a lakehouse DML layer needs:

- ``changelog_apply`` — materialize the latest state from an I/U/D event
  log (log compaction, the MERGE-free way to consume a CDC feed);
- ``snapshot_diff`` — recover the minimal I/U/D changelog between two
  published snapshots (what changed between ``v=N`` and ``v=N+1``), the
  input an incremental consumer wants when the writer didn't emit a log.

Scale shape: ``changelog_apply`` is ONE key-partitioned window pass (the
dedup-keep-latest idiom — row_number over (key, seq desc), no global
sort); ``snapshot_diff`` is ONE full-outer key join with column-wise
null-safe comparison — both AQE-skew-splittable, neither collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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
    be nondeterministic, so the window orders by (seq desc) only after
    that contract.
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
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


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
