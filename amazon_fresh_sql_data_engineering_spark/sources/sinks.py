"""Sinks: CTAS, partitioned and bucketed parquet writes (SURVEY §2.1
OP-CTAS / OP-DROP; storage layout is the engine's main 100 TB lever).

Layout guidance encoded here:
- **date-partition** fact tables on their query predicate column
  (orders by order month, events by day): partition pruning turns
  half-open date-range scans (ref A:253-254) into directory pruning.
- **bucket** the biggest join pairs on the join key (orders ⋈ lineitem on
  the order key): both sides pre-shuffled at write time means the join
  runs shuffle-free forever after.
- **atomic swap**: write to a temp path then rename — the idempotency
  contract replacing the reference's BEGIN/COMMIT (OP-TXN, SURVEY §2.3).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def ctas(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CREATE TABLE AS SELECT -> parquet directory (ref T:242-247 CTAS
    quarantine/mapping tables)."""
    df.write.mode(mode).parquet(path)


def ctas_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Date/key-partitioned CTAS: one directory per partition value; range
    predicates on the partition column prune at the driver."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def ctas_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table (saveAsTable — bucketing needs the catalog).
    Joining two tables bucketed on the same key with the same bucket count
    is shuffle-free (checked in tests/test_sinks.py)."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")  # OP-DROP, idempotent setup
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table_name)


def ctas_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered CTAS: multi-dimensional data
    skipping for parquet min/max pruning.

    Sorting a table by one column gives perfect file-level pruning on that
    column and none on any other; interleaving the bits of per-column
    quantile buckets gives every listed column *partial* locality, so a
    filter on ANY of them skips most files (the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER — at 100 TB, file skipping is the
    difference between scanning terabytes and gigabytes).

    Mechanics (r8 rewrite, delegating to :mod:`..sources.layout`): each
    column's quantile boundaries come from ONE driver-side
    ``approxQuantile`` pass (equi-depth, so skewed columns still spread)
    baked into a balanced literal comparison tree; the rank bits
    interleave into one z-key and the write range-partitions + sorts on
    it. The r1-r7 implementation quantile-bucketed with k chained
    two-phase ``global_ntile`` calls — k FULL-DATA SHUFFLES plus k probe
    jobs before the clustering shuffle even starts; the literal-tree form
    needs exactly ONE data shuffle (the clustering itself) regardless of
    k, with identical file-level locality (the same footer-stats and
    read-path-skipping tests pass unchanged). At 100 TB the difference is
    k extra full passes over the table per OPTIMIZE."""
    from .layout import zorder_frame

    zorder_frame(df, cols, bits=bits, num_files=num_files).write.mode(mode).parquet(
        path
    )


def atomic_swap_write(
    df: DataFrame, final_path: str, partition_by: list[str] | None = None
) -> None:
    """Rewrite-and-swap: materialize to a temp sibling, then atomically
    replace ``final_path``. This is how OP-UPDATE/DELETE rewrites persist
    without torn reads (SURVEY §2.3 OP-TXN non-goal note).

    POSIX rename cannot atomically replace a non-empty directory, so the
    swap is TWO renames (final -> __old__ sibling, then __tmp__ -> final)
    and a crash between them leaves ``final_path`` missing with the only
    published state in the ``__old__`` sibling. Stateful consumers that
    treat a missing directory as "empty initial state" (the streaming MV
    sinks) MUST call :func:`recover_swap` before reading, or a torn swap
    silently re-folds from empty (self-review r9)."""
    tmp = f"{final_path}.__tmp__{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{final_path}.__old__{uuid.uuid4().hex[:8]}"
    if os.path.exists(final_path):
        os.rename(final_path, old)
    os.rename(tmp, final_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_swap(final_path: str) -> bool:
    """Heal :func:`atomic_swap_write`'s two-rename crash window. Run by
    stateful consumers BEFORE reading ``final_path``:

    - ``__tmp__`` siblings are incomplete or unpublished writes — never
      the only copy of anything — and are dropped.
    - ``final_path`` present: any ``__old__`` sibling is an obsolete
      backup whose cleanup died mid-swap — dropped.
    - ``final_path`` MISSING with an ``__old__`` sibling: the crash hit
      between the two renames; the sibling is the only published state —
      restored (the interrupted operation then simply replays).

    Returns True when a restore happened. Single-writer contract (the
    same one the swap itself needs): no concurrent swapper."""
    import glob as _glob

    for t in _glob.glob(f"{final_path}.__tmp__*"):
        shutil.rmtree(t, ignore_errors=True)
    olds = sorted(_glob.glob(f"{final_path}.__old__*"))
    if os.path.exists(final_path):
        for o in olds:
            shutil.rmtree(o, ignore_errors=True)
        return False
    if not olds:
        return False
    os.rename(olds[-1], final_path)
    for o in olds[:-1]:
        shutil.rmtree(o, ignore_errors=True)
    return True


def drop_table_path(path: str) -> None:
    """DROP TABLE IF EXISTS for path-based tables (ref T:3-15)."""
    if os.path.exists(path):
        shutil.rmtree(path)


def analyze_table(spark: SparkSession, table_name: str, columns: list[str] | None = None) -> None:
    """OP-VACUUM analog: ``VACUUM ANALYZE`` (ref T:1122) -> ``ANALYZE TABLE
    ... COMPUTE STATISTICS`` so the cost-based optimizer has row counts /
    NDVs for join reordering. Mostly subsumed by AQE's runtime stats, but
    kept for parity and for static plan quality on managed tables."""
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table_name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    else:
        spark.sql(f"ANALYZE TABLE {table_name} COMPUTE STATISTICS")


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction (the OPTIMIZE of a path-based lakehouse).

    Streaming sinks and incremental upserts accrete many small files;
    at 100 TB that means millions of parquet footers per scan, task
    launch overhead per file, and NameNode/object-store listing pain.
    Compaction rewrites the table into files sized to ``target_file_bytes``
    (computed from the CURRENT on-disk size, so compression ratio is
    respected) and swaps atomically via :func:`atomic_swap_write` — readers
    never see a torn table.

    ``sort_within_by`` optionally re-sorts rows within output files so
    min/max stats stay tight after compaction; ``zorder_by`` is the
    multi-column variant (OPTIMIZE ... ZORDER BY): the rewrite clusters
    on the Morton curve of the listed columns (:mod:`.layout`), so the
    compacted files bound EVERY listed column's footer stats, not just a
    leading one. Mutually exclusive with ``sort_within_by``.

    Returns ``(files_before, files_after)``.
    """
    import glob as _glob

    if sort_within_by and zorder_by:
        raise ValueError("compact_files: sort_within_by and zorder_by are exclusive")
    # a prior compaction may have crashed between its swap's two renames,
    # leaving the table in a __old__ sibling — heal before reading
    # (self-review r9; without this the re-run reads a missing path)
    recover_swap(path)
    parts = _glob.glob(os.path.join(path, "part-*"))
    files_before = len(parts)
    total_bytes = sum(os.path.getsize(p) for p in parts)
    n_out = max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(path)
    if zorder_by:
        from .layout import zorder_frame

        out = zorder_frame(df, zorder_by, num_files=int(n_out))
    elif sort_within_by:
        out = df.repartitionByRange(n_out, *sort_within_by).sortWithinPartitions(
            *sort_within_by
        )
    else:
        out = df.coalesce(n_out) if n_out < files_before else df.repartition(n_out)
    atomic_swap_write(out, path)
    files_after = len(_glob.glob(os.path.join(path, "part-*")))
    return files_before, files_after
