"""Snapshot-versioned parquet tables: MVCC for a path-based lakehouse.

``atomic_swap_write`` (sinks.py) gives torn-read-free REPLACEMENT; this
module adds what the DML/ETL layer actually wants at 100 TB — snapshot
isolation, time travel, and O(1) rollback — with the mechanism every table
format (Iceberg/Delta/Hudi) boils down to, minus their spec baggage:

- each write lands in an immutable ``data/v=N`` directory;
- a tiny ``_LATEST`` pointer file names the current snapshot and is
  published with ``os.replace`` (atomic on POSIX), so readers see the old
  snapshot or the new one, never a mix;
- rollback republishes the pointer (no data movement);
- ``vacuum`` deletes unpointed snapshots older than ``keep_last``.

Readers that hold a DataFrame onto ``data/v=N`` are unaffected by later
publishes — immutability IS the isolation. Single-writer per table is
assumed (as with any lakehouse on a filesystem without a lock/commit
service); writers on object stores would swap ``os.replace`` for a
conditional PUT.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_DATA = "data"


def _data_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _DATA, f"v={version}")


def current_version(table_dir: str) -> int | None:
    """Version the pointer currently names, or None for an empty table."""
    try:
        with open(os.path.join(table_dir, _POINTER)) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        return None


def list_versions(table_dir: str) -> list[int]:
    """All snapshot versions present on disk (ascending)."""
    root = os.path.join(table_dir, _DATA)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("v=")
    )


def _publish(table_dir: str, version: int) -> None:
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp.{version}")
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Materialize ``df`` as the next snapshot and publish it. Returns the
    new version number. The data write is the long, restartable part; the
    publish is one atomic pointer rename at the very end — a crash before
    it leaves the table on the previous snapshot with only an orphan
    ``v=N`` directory to vacuum."""
    os.makedirs(os.path.join(table_dir, _DATA), exist_ok=True)
    versions = list_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(_data_dir(table_dir, version))
    _publish(table_dir, version)
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``."""
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"versioned table {table_dir} has no snapshot")
    path = _data_dir(table_dir, v)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot v={v} not on disk (vacuumed?)")
    return spark.read.parquet(path)


def rollback(table_dir: str, version: int) -> None:
    """Point the table back at an existing snapshot — O(1), no data moves.
    The abandoned snapshot stays on disk for inspection until vacuumed."""
    if not os.path.isdir(_data_dir(table_dir, version)):
        raise FileNotFoundError(f"cannot roll back to missing snapshot v={version}")
    _publish(table_dir, version)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete snapshots beyond the newest ``keep_last``, never the one the
    pointer names. Returns the versions removed. Run only when no reader
    can still hold a plan onto the doomed directories (the retention-window
    contract every lakehouse vacuum has)."""
    cur = current_version(table_dir)
    versions = list_versions(table_dir)
    keep = set(versions[-keep_last:]) | ({cur} if cur is not None else set())
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(_data_dir(table_dir, v))
            removed.append(v)
    # orphaned pointer tmp files (a crash between _publish's write and
    # its os.replace leaves one) are never read — pure litter; vacuum is
    # the writer's own GC point, so the single-writer contract makes
    # this race-free (r11)
    import glob

    for t in glob.glob(os.path.join(table_dir, f"{_POINTER}.tmp.*")):
        try:
            os.remove(t)
        except OSError:
            pass
    return removed
