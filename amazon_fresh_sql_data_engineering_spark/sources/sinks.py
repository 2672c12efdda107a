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
import time
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
    file_split: str = "sampled",
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
    k extra full passes over the table per OPTIMIZE.

    ``file_split`` (r11): ``"sampled"`` (default) range-partitions on the
    z-key — robust to inter-column dependence, but ``repartitionByRange``'s
    bounds-sampling job re-executes the scan + rank trees, a full extra
    pass over the table. ``"fixed"`` splits the z-key space at fixed
    equal-width boundaries instead (``layout.zorder_write_fixed``) — one
    pass cheaper, same contiguous-range-per-file layout; choose it when
    the clustering columns are (near-)independent, where equi-depth ranks
    make fixed chunks equi-mass."""
    from .layout import zorder_frame, zorder_write_fixed

    if file_split == "fixed":
        zorder_write_fixed(df, path, cols, bits=bits, num_files=num_files, mode=mode)
        return
    if file_split != "sampled":
        raise ValueError(f"ctas_zordered: unknown file_split {file_split!r}")
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
    # suffixes are MONOTONIC (ns timestamp, zero-padded hex) so that if
    # multiple __old__ siblings ever coexist, lexicographic order IS age
    # order — recover_swap additionally falls back to directory mtime for
    # pre-r10 uuid-suffixed backups (ADVICE r9)
    stamp = f"{time.time_ns():016x}.{uuid.uuid4().hex[:6]}"
    tmp = f"{final_path}.__tmp__{stamp}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{final_path}.__old__{stamp}"
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
    olds = _glob.glob(f"{final_path}.__old__*")
    if os.path.exists(final_path):
        for o in olds:
            shutil.rmtree(o, ignore_errors=True)
        return False
    if not olds:
        return False
    # NEWEST backup is the published state. Suffixes are monotonic
    # ns-stamps since r10 (16 hex digits, zero-padded: lexicographic
    # order IS age order), so when every backup carries one, order by the
    # SUFFIX — exact regardless of filesystem timestamp granularity
    # (ADVICE r10: two backups materialized within one coarse-mtime tick
    # tie under max(mtime) and the pick becomes arbitrary). Pre-r10
    # backups carry random uuid suffixes where lexicographic order means
    # nothing — fall back to directory mtime for a mixed/legacy set
    # (rename preserves mtime, and the single-writer contract strictly
    # orders materialization times at normal granularity).
    import re as _re

    _stamped = _re.compile(r"\.__old__[0-9a-f]{16}\.[0-9a-f]{6}$")
    if all(_stamped.search(o) for o in olds):
        newest = max(olds)
    else:
        newest = max(olds, key=os.path.getmtime)
    os.rename(newest, final_path)
    for o in olds:
        if o != newest:
            shutil.rmtree(o, ignore_errors=True)
    return True


class SwapPublish:
    """POSIX-rename publish primitive: :func:`atomic_swap_write` +
    :func:`recover_swap`. The state IS the directory at ``final_path``;
    replacement is two renames with a healable crash window. Correct on
    any filesystem with atomic directory rename (HDFS, POSIX) — NOT on
    S3-semantics object stores, where rename is copy+delete."""

    name = "swap"

    def write(self, df: DataFrame, final_path: str, partition_by=None) -> None:
        atomic_swap_write(df, final_path, partition_by)

    def heal(self, final_path: str) -> bool:
        return recover_swap(final_path)

    def read_or_none(self, spark: SparkSession, final_path: str):
        from pyspark.errors import AnalysisException

        # cross-primitive guard: a pointer-published sink has no parquet
        # at its root, so a direct read would come back None/empty and a
        # stateful consumer would silently refold from scratch — the same
        # failure mode the torn-swap heal exists for, caused by operator
        # error instead of a crash. Fail loudly.
        if os.path.exists(os.path.join(final_path, "_LATEST")):
            raise ValueError(
                f"swap publish: {final_path} is a POINTER-published sink "
                "(_LATEST present) — read it with POINTER_PUBLISH"
            )
        try:
            return spark.read.parquet(final_path)
        except AnalysisException:
            return None


class PointerPublish:
    """Object-store-safe publish primitive (VERDICT r9 item 3): immutable
    ``data/v=N`` snapshot directories plus one atomically-replaced
    ``_LATEST`` pointer file — :mod:`.versioned`'s mechanism lifted into
    the sink publish seam. NOTHING is ever renamed into or out of the
    live path: a snapshot is fully materialized under a fresh version
    directory first, then the pointer flips (``os.replace`` locally; a
    conditional PUT on object stores). There is therefore no torn-swap
    window at all — a crash anywhere before the flip leaves the OLD
    snapshot published and only an orphan directory to prune, which is
    exactly why the two-rename swap's heal logic doesn't (and needn't)
    transfer to S3 semantics. After a successful flip, superseded
    snapshots are pruned (same retention the swap primitive has).

    NOT for :mod:`.versioned` time-travel tables, despite sharing their
    on-disk mechanism: ``write`` vacuums to latest-only and ``heal``
    prunes every snapshot the pointer doesn't name — a rolled-back table
    with newer snapshots on disk would lose them. Streaming sink state
    is single-version by contract; use versioned.py directly when you
    want history."""

    name = "pointer"

    def write(self, df: DataFrame, final_path: str, partition_by=None) -> None:
        from . import versioned as V

        os.makedirs(os.path.join(final_path, V._DATA), exist_ok=True)
        versions = V.list_versions(final_path)
        version = (versions[-1] + 1) if versions else 1
        w = df.write.mode("errorifexists")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(V._data_dir(final_path, version))
        V._publish(final_path, version)
        V.vacuum(final_path, keep_last=1)

    def heal(self, final_path: str) -> bool:
        """Prune orphan snapshots NEWER than the pointer (torn writes that
        never published — the analog of dropping ``__tmp__`` siblings).
        Never restores anything: the previous publish is still live."""
        from . import versioned as V

        cur = V.current_version(final_path)
        pruned = False
        for v in V.list_versions(final_path):
            if cur is None or v > cur:
                shutil.rmtree(V._data_dir(final_path, v), ignore_errors=True)
                pruned = True
        return pruned

    def read_or_none(self, spark: SparkSession, final_path: str):
        from . import versioned as V

        if V.current_version(final_path) is None:
            # cross-primitive guard (mirror of SwapPublish's): root
            # parquet files (flat swap layout) or hive partition
            # directories (partitioned swap layout) mean this sink was
            # published by the SWAP primitive — returning None here would
            # silently discard it. Partition-dir detection follows Spark's
            # InMemoryFileIndex rule (ADVICE r10): any 'name=value' entry
            # counts EVEN with a leading underscore — Spark itself admits
            # underscore-prefixed partition dirs (the rename-swap
            # partitioned MV sink writes '__mv_bucket=N'), so excluding
            # them here reopened the silent-refold-from-empty path this
            # guard exists to close. Only dot-prefixed entries stay
            # hidden (Spark never discovers those as partitions).
            if os.path.isdir(final_path) and any(
                e.startswith("part-")
                or ("=" in e and e != V._DATA and not e.startswith("."))
                for e in os.listdir(final_path)
            ):
                raise ValueError(
                    f"pointer publish: {final_path} is a SWAP-published "
                    "sink (root parquet files or partition directories, "
                    "no _LATEST) — read it with SWAP_PUBLISH"
                )
            return None
        return V.read_snapshot(spark, final_path)


#: the default (rename-based) publish primitive
SWAP_PUBLISH = SwapPublish()
#: the object-store-safe (pointer-based) publish primitive
POINTER_PUBLISH = PointerPublish()


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


def compact_partitions(
    spark: SparkSession,
    path: str,
    min_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Partition-subset OPTIMIZE for a hive-partitioned parquet table:
    compact ONLY the leaf partition directories whose file count exceeds
    ``min_files``, leaving every other partition's files byte-identical.

    :func:`compact_files` rewrites the WHOLE table — correct but O(table)
    per invocation, which at 100 TB means a full-table pass to fix the
    handful of partitions a streaming sink or incremental upsert has been
    peppering with small files. Real lakehouse OPTIMIZE is incremental:
    the hot (usually most-recent) partitions get compacted, cold history
    is not even read. Cost here is O(bytes in hot partitions).

    Mechanics: walk to the leaf directories (dirs that directly hold
    ``part-*`` files, any partition depth), heal each candidate's prior
    torn compaction (:func:`_recover_leaf`), and for each leaf past the
    threshold read THAT DIRECTORY alone, size output files from its
    current on-disk bytes, and republish via a per-leaf swap whose tmp and
    backup siblings are DOT-PREFIXED: a leaf dir is ``col=value``, and a
    visible ``col=value.__old__x`` sibling would be read by partition
    discovery as a bogus partition VALUE (found by the round-trip test) —
    hidden dirs are ignored, the same trick as the MV sink's ``.mvold-``
    backups. Partition column values live in the directory names, so a
    leaf-local rewrite never touches them; readers of the whole table see
    each leaf either fully old or fully new (per-directory swap atomicity
    — the same granularity the bucketed MV sink and the minhash-store
    compaction already use).

    ``sort_within_by`` optionally re-sorts rows within each compacted
    leaf so footer min/max stats stay tight. Returns ``{"compacted":
    [leaf, ...], "skipped": n, "files_before": i, "files_after": j}``
    (file counts over the compacted leaves only)."""
    import glob as _glob

    # heal torn leaf swaps FIRST: a fully torn leaf is MISSING from the
    # leaf walk below — only its hidden .compact-old- backup exists
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.startswith(".compact-old-"):
                _recover_leaf(os.path.join(root, d[len(".compact-old-"):]))
            elif d.startswith(".compact-tmp-"):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]

    leaves = []
    for root, dirs, files in os.walk(path):
        # hidden/backup/tmp dirs are not table data. The dot/underscore
        # prefix rule is the WHOLE filter (parquet's own convention, and
        # every swap sibling this package creates under a table root is
        # dot-prefixed: _swap_leaf's .compact-*, the MV sink's .mvold-*).
        # A substring test on '__tmp__'/'__old__' would wrongly exclude a
        # legitimate partition VALUE containing those tokens, e.g.
        # col=a__old__b (ADVICE r9); atomic_swap_write's visible siblings
        # live BESIDE the table path, never inside the walk.
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        if any(f.startswith("part-") for f in files):
            leaves.append(root)
    if not leaves:
        raise ValueError(
            f"compact_partitions: no parquet leaf directories under {path} "
            "(expected a hive-partitioned table; for a flat table use "
            "compact_files)"
        )
    root_leaf = [l for l in leaves if os.path.abspath(l) == os.path.abspath(path)]
    if root_leaf and len(leaves) == 1:
        raise ValueError(
            f"compact_partitions: {path} is a FLAT table (files at the "
            "root) — use compact_files; a root-level swap here would "
            "momentarily hide the whole table instead of one partition"
        )
    # a mixed layout (root files AND partition dirs) never swaps the root
    leaves = [l for l in leaves if l not in root_leaf]
    compacted, skipped, before, after = [], 0, 0, 0
    for leaf in sorted(leaves):
        _recover_leaf(leaf)
        parts = _glob.glob(os.path.join(leaf, "part-*"))
        if len(parts) <= min_files:
            skipped += 1
            continue
        before += len(parts)
        total_bytes = sum(os.path.getsize(p) for p in parts)
        n_out = max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)
        df = spark.read.parquet(leaf)
        if sort_within_by:
            out = df.repartitionByRange(int(n_out), *sort_within_by)
            out = out.sortWithinPartitions(*sort_within_by)
        else:
            out = df.coalesce(int(n_out))
        _swap_leaf(out, leaf)
        after += len(_glob.glob(os.path.join(leaf, "part-*")))
        compacted.append(os.path.relpath(leaf, path))
    return {
        "compacted": compacted,
        "skipped": skipped,
        "files_before": before,
        "files_after": after,
    }


def _swap_leaf(df: DataFrame, leaf: str) -> None:
    """Rewrite-and-swap ONE hive leaf directory with HIDDEN siblings:
    ``.compact-tmp-<name>`` and ``.compact-old-<name>`` are dot-prefixed
    so partition discovery never reads them as partition values (an
    ``atomic_swap_write``-style visible ``col=value.__old__x`` sibling IS
    read as the bogus value ``value.__old__x``). Single writer; a crash
    anywhere is healed by :func:`_recover_leaf` on the next pass."""
    parent, name = os.path.split(leaf)
    tmp = os.path.join(parent, f".compact-tmp-{name}")
    old = os.path.join(parent, f".compact-old-{name}")
    df.write.mode("overwrite").parquet(tmp)
    os.rename(leaf, old)
    os.rename(tmp, leaf)
    shutil.rmtree(old)


def _recover_leaf(leaf: str) -> bool:
    """Heal :func:`_swap_leaf`'s crash windows for one leaf: drop an
    orphaned hidden tmp (never the only copy), restore the hidden backup
    iff the leaf itself is missing, drop it when the leaf is live."""
    parent, name = os.path.split(leaf)
    tmp = os.path.join(parent, f".compact-tmp-{name}")
    old = os.path.join(parent, f".compact-old-{name}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(leaf):
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        return False
    if os.path.exists(old):
        os.rename(old, leaf)
        return True
    return False
