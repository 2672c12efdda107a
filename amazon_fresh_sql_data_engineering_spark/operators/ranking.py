"""Two-phase distributed global window ranks (rank / row_number / ntile).

``RANK() OVER (ORDER BY k)`` with an empty PARTITION BY clause (reference
``All-Tasks-of-SQL.sql:201`` Task 10, ``:169-176`` Task 9, ``:246-264``
Task 11.2) is the classic single-node trap: Spark plans it as ``Exchange
SinglePartition`` followed by one ``Window`` task, so even a
post-aggregation table of one row per customer funnels through a single
core. At driver-test scale that is invisible; at a billion customers it is
the whole job.

These operators keep exact SQL window semantics with no single-partition
pass over the data:

1. **Boundary phase** — a bounded, deterministic sample of the ordering
   key is collected to the driver (metadata-sized: ~64 keys per target
   partition, capped at 1M), sorted with the exact sort semantics Spark
   uses (per-column direction, NULLS FIRST/LAST, NaN-largest), and P-1
   evenly spaced split keys are baked into the plan **as literals**.
2. **Assignment phase** — every row's partition id ``pid`` is computed
   map-side by a generated balanced binary decision tree over the literal
   boundaries (O(log P) lexicographic key comparisons per row, expression
   size O(P·ncols)). ``pid`` is therefore a **pure deterministic function
   of the row's key**: equal keys always get equal pids, pids are monotone
   in the sort order, and — critically — every consumer branch of the
   stamped frame computes the *same* mapping under any configuration,
   because the mapping lives in the data, not in a runtime partitioner.
3. **Local phase** — the window function over ``PARTITION BY pid``: a
   parallel hash exchange over pid, never a single-partition one. This is
   the ONLY full-data shuffle in the plan (the old design paid a range
   exchange *plus* this hash exchange).
4. **Offset phase** — per-pid row counts (one row per pid,
   metadata-sized) become cumulative offsets via a triangular broadcast
   self-join instead of an ORDER BY window, so the rank/row_number plans
   are *entirely* free of ``Exchange SinglePartition`` (asserted in
   tests/test_plans.py). ``global = local + rows in earlier pids``.

``global_ntile`` additionally needs the total row count; it arrives as a
pid-keyed column built by crossing the <= P-row counts frame with its own
broadcast and re-aggregating on pid — so even the global scalar costs no
single-partition exchange (the plan gate bans the node form outright).

The offsets side is at most P rows, so the triangular join is O(P^2) on
P <= a few thousand — noise — and every join of a tiny side is explicitly
broadcast.

Why literal boundaries instead of ``repartitionByRange`` +
``spark_partition_id()`` (the round-1..4 design): range-exchange boundary
sampling is seeded by the RDD *instance* id, so independent
materializations of the same logical exchange can pick different
boundaries; and ``spark_partition_id()`` is a nondeterministic expression,
so consumer plans are never canonically equal — ``CacheManager`` lookups
miss (a ``persist()`` pin is silently bypassed) and ``ReuseExchange``
cannot fire. Round 4 measured the composed cumsum wrong on 12k of 15k rows
under AQE-off, and pinned it with an eager ``localCheckpoint`` — correct,
but the checkpoint blocks are non-evictable and non-recomputable, so an
executor loss mid-job was unrecoverable and long-running callers could not
release the blocks. With literal boundaries the row->pid mapping cannot
drift between branches *by construction*, every expression in the plan is
deterministic (caches hit, exchanges reuse), and the operators are
fault-tolerant: an executor loss simply recomputes through lineage.

Skew note: a single key value that dominates the table still lands in one
pid (any rank implementation must co-locate ties); for rank over
low-cardinality keys aggregate to the key grain first, which every catalog
user of these operators already does. Boundary balance degrades gracefully:
a stale or unlucky sample only skews partition sizes, never correctness.

Pinning (the ``pin`` parameter on every operator):

- ``"persist"`` (default) — MEMORY_AND_DISK-persist the input before the
  boundary job, so the boundary pass plus each consumer branch reads one
  materialization instead of recomputing upstream. Persist blocks are
  evictable under memory pressure and recomputable after executor loss,
  so a leaked pin degrades to recompute, never to wrong results or OOM.
  Long-running jobs should still ``spark.catalog.clearCache()`` between
  independent jobs (bench.py's between-query discipline).
- ``"checkpoint"`` — eager ``localCheckpoint``: truncates lineage, for
  callers stacking many operators whose lineage would otherwise grow
  unboundedly (iterative algorithms). Not fault-tolerant to executor
  loss; not evictable.
- ``None`` — no pin: zero cache footprint; the boundary count/sample jobs
  and each consumer branch recompute the input through lineage. Correct
  under every configuration (the literal boundaries make branch agreement
  unconditional); choose it when the input is a cheap scan.

NONDETERMINISTIC INPUTS REQUIRE ``pin="checkpoint"``: literal boundaries
pin the key->pid *mapping*, not the rows. If the input plan itself is
nondeterministic (``sample``/``rand``/un-ordered ``limit`` upstream), a
recompute — ``pin=None`` always, ``pin="persist"`` after cache eviction or
executor loss — can materialize a *different row set* in the count /
boundary / window / offset branches, composing wrong offsets exactly like
the hazard round 4's unconditional checkpoint covered. ``localCheckpoint``
is the only pin that freezes the rows themselves. Deterministic inputs
(any pure scan->filter->join->agg lineage, i.e. every catalog consumer)
are safe under all three modes.
"""

from __future__ import annotations

import functools
import math
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__gr_pid"
_CNT = "__gr_cnt"
_OFF = "__gr_off"
_LOCAL = "__gr_local"
_TOT = "__gr_total"

# bounded driver-side sample for boundary estimation: ~this many keys per
# target partition (the JVM RangePartitioner uses ~100/partition), capped
# so a 20k-partition cluster job still collects ~1M keys, not more
_SAMPLE_PER_PID = 64
_SAMPLE_CAP = 1_000_000
_SAMPLE_SEED = 0x5EED
# below this many rows per pid, a partition-parallel global window buys
# nothing — the adaptive pid count in _prepare floors on it
_MIN_ROWS_PER_PID = 65_536
# probe-first cutoff: up to this many key rows are collected exhaustively
# in ONE job (replacing the count+sample job pair); a few MB of driver
# traffic at worst, and any input this small gets the 2-pid shallow tree
_PROBE_CAP = 65_536


@dataclass(frozen=True)
class _Key:
    """One column of the ordering spec: value expression + sort semantics."""

    col: Column
    desc: bool
    nulls_first: bool

    def sort_col(self) -> Column:
        if self.desc:
            return (
                self.col.desc_nulls_first() if self.nulls_first else self.col.desc_nulls_last()
            )
        return self.col.asc_nulls_first() if self.nulls_first else self.col.asc_nulls_last()


_SORT_REPR_RE = re.compile(r" (ASC|DESC)( NULLS (FIRST|LAST))?'>$")


def _column_node(c: Column):
    """The one touch of pyspark classic-mode internals: the expression node
    behind a Column. Isolated so tests can simulate its absence (Connect
    mode / future pyspark) and the fallback paths stay honest."""
    return c._jc.node()  # noqa: SLF001


def _decompose(c: Column, descending: bool) -> _Key:
    """Split a caller-passed Column into (value expr, direction, null order).

    A plain Column sorts ascending-nulls-first (Spark's default) unless the
    operator-level ``descending`` flag says otherwise; an explicit SortOrder
    (``F.col("v").desc()`` …) carries its own direction, which wins. Uses the
    classic-mode ``Column.node`` ColumnNode (pyspark>=4); sort specs built
    by :func:`_parse_spec` from strings never take this path, and when the
    internal probe is unavailable (Connect-mode Column, a pyspark internals
    change) plain Columns FALL BACK to the public path — only an explicit
    SortOrder, whose child cannot be extracted through public API, is
    rejected with guidance (VERDICT r5 item 3).
    """
    try:
        node = _column_node(c)
        is_sort = node.getClass().getSimpleName() == "SortOrder"
        if not is_sort:
            # plain value expression: operator-level flag decides direction
            return _Key(c, descending, nulls_first=not descending)
        desc = node.sortDirection().getClass().getSimpleName().startswith("Descending")
        nulls_first = node.nullOrdering().getClass().getSimpleName().startswith(
            "NullsFirst"
        )
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm  # noqa: SLF001
        child = type(c)(jvm.org.apache.spark.sql.Column(node.child()))
        return _Key(child, desc, nulls_first)
    except Exception:  # noqa: BLE001 — py4j raises Py4JError, not AttributeError,
        # on a JVM Column without node(); catch everything the seam can throw
        # (ADVICE r5) and decide from the Column's public string form instead.
        if _SORT_REPR_RE.search(str(c)):
            raise ValueError(
                "ranking: cannot decompose an explicit SortOrder Column "
                f"({c}) on this pyspark build — pass plain columns or "
                "column names with descending=... instead"
            ) from None
        return _Key(c, descending, nulls_first=not descending)


def _parse_spec(order_cols, descending: bool) -> list[_Key]:
    cols = [order_cols] if isinstance(order_cols, (str, Column)) else list(order_cols)
    keys: list[_Key] = []
    for c in cols:
        if isinstance(c, str):
            keys.append(_Key(F.col(c), descending, nulls_first=not descending))
        else:
            keys.append(_decompose(c, descending))
    return keys


_NTZ_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _comparison_keys(df: DataFrame, keys: list[_Key]) -> list[_Key]:
    """Rewrite timestamp ordering keys into timezone-free comparables before
    sampling/boundary literals (ADVICE r5).

    ``collect()`` round-trips TimestampType through naive driver-local
    datetimes, and the two literal renderers disagree on what a naive
    datetime means: the SQL tree's ``TIMESTAMP '...'`` is interpreted in
    ``spark.sql.session.timeZone`` while the Column tree's ``F.lit()``
    converts via the driver OS timezone. When those differ, a boundary
    literal denotes a different instant than the sampled row — and a DST
    fold can make the boundary list non-monotone under Spark ordering. So:

    - TimestampType   -> ``unix_micros`` (BIGINT, exact, no timezone
      anywhere in sample, literal, or comparison);
    - TimestampNTZType -> fixed-width ``date_format`` string (a pure
      wall-clock rendering — verified bit-exact vs strftime under a hostile
      session timezone; zero-padded so string order == datetime order).
      NTZ has no instant semantics, so epoch conversion would itself need a
      timezone; the string never does. (Years outside 1..9999 would break
      the fixed width — out of scope for date data.)

    Both rewrites are strictly monotone in the original key with identical
    NULL placement, so the pid assignment they induce is a valid monotone
    pid for the original ordering; the window ``spec`` keeps the original
    columns. Only comparison semantics move to long/string — types whose
    driver-side ``_cmp_one`` and executor-side comparisons trivially agree.
    """
    from pyspark.sql.types import (
        ArrayType,
        MapType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    fields = df.select(
        *[k.col.alias(f"__k_{i}") for i, k in enumerate(keys)]
    ).schema.fields
    out: list[_Key] = []
    for k, f in zip(keys, fields):
        if isinstance(f.dataType, (ArrayType, StructType, MapType)):
            # pid monotonicity — and therefore rank/offset composition —
            # requires the DRIVER-side boundary sort to agree with Spark's
            # ordering. _cmp_one mirrors Spark exactly for atomic types
            # (NULL placement, NaN-largest, unsigned bytes: unit-tested),
            # but Python's list/Row comparison diverges on composites
            # (None elements raise TypeError; map ordering is undefined) —
            # a silent disagreement here would compose WRONG ranks, so the
            # contract rejects it loudly instead.
            raise ValueError(
                f"ranking: composite ordering key {f.name!r} ({f.dataType.simpleString()}) "
                "is not supported — project the array/struct to atomic "
                "column(s) and order by those"
            )
        if isinstance(f.dataType, TimestampType):
            out.append(_Key(F.unix_micros(k.col), k.desc, k.nulls_first))
        elif isinstance(f.dataType, TimestampNTZType):
            out.append(_Key(F.date_format(k.col, _NTZ_FMT), k.desc, k.nulls_first))
        else:
            out.append(k)
    return out


def _cmp_one(x, y, desc: bool, nulls_first: bool) -> int:
    """Compare two sampled key values with Spark's sort semantics.

    NULL placement is positional (unaffected by direction); NaN is larger
    than every other double and equal to itself — both exactly as Spark
    orders them, so the driver-side boundary sort can never disagree with
    the executor-side comparisons in :func:`_pid_expr`.
    """
    if x is None and y is None:
        return 0
    if x is None:
        return -1 if nulls_first else 1
    if y is None:
        return 1 if nulls_first else -1
    xn = isinstance(x, float) and math.isnan(x)
    yn = isinstance(y, float) and math.isnan(y)
    if xn or yn:
        base = 0 if (xn and yn) else (1 if xn else -1)
    else:
        base = -1 if x < y else (1 if x > y else 0)
    return -base if desc else base


def _make_cmp(keys: list[_Key]):
    flags = [(k.desc, k.nulls_first) for k in keys]

    def cmp(a, b):
        for (desc, nf), x, y in zip(flags, a, b):
            c = _cmp_one(x, y, desc, nf)
            if c:
                return c
        return 0

    return cmp


def _gt_lit(k: _Key, bv) -> Column:
    """Boolean (never NULL) Column: row key column strictly AFTER literal bv
    in this column's sort order."""
    if bv is None:
        # after NULL: everything non-null iff nulls sort first; nothing if last
        return k.col.isNotNull() if k.nulls_first else F.lit(False)
    base = (k.col < F.lit(bv)) if k.desc else (k.col > F.lit(bv))
    # a NULL row value sorts before everything (nulls_first) or after
    # everything (nulls_last), regardless of direction
    return F.when(k.col.isNull(), F.lit(not k.nulls_first)).otherwise(base)


def _eq_lit(k: _Key, bv) -> Column:
    if bv is None:
        return k.col.isNull()
    return k.col.eqNullSafe(F.lit(bv))


def _after(keys: list[_Key], b: tuple) -> Column:
    """Lexicographic 'row key > boundary tuple b' under the full sort spec."""
    out = None
    prefix = None
    for k, bv in zip(keys, b):
        term = _gt_lit(k, bv) if prefix is None else (prefix & _gt_lit(k, bv))
        out = term if out is None else (out | term)
        eq = _eq_lit(k, bv)
        prefix = eq if prefix is None else (prefix & eq)
    return out


def _pid_expr(keys: list[_Key], boundaries: list[tuple]) -> Column:
    """Balanced binary decision tree assigning pid in [0, len(boundaries)]
    by O(log P) literal comparisons; pure, deterministic, monotone.

    Above ``_SQL_TREE_MIN`` boundaries the tree is rendered as ONE SQL
    string and parsed JVM-side: Column-API construction costs a py4j round
    trip per node (~8 ms), which is ~16 s of driver time at 2048 pids,
    versus one `F.expr` call. The SQL renderer only engages when every key
    is a plain identifier-safe column and every literal type is in the
    whitelist (`_sql_lit`); anything else falls back to the Column tree —
    same expression either way (equivalence is unit-tested)."""
    if not boundaries:
        return F.lit(0)
    if len(boundaries) >= _SQL_TREE_MIN:
        sql = _pid_expr_sql(keys, boundaries)
        if sql is not None:
            return F.expr(sql)

    def tree(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(_after(keys, boundaries[mid]), tree(mid + 1, hi)).otherwise(
            tree(lo, mid)
        )

    return tree(0, len(boundaries))


_SQL_TREE_MIN = 65  # boundary count where JVM-side parse beats py4j-per-node
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
# the _comparison_keys timestamp rewrites, as rendered by node().sql() — the
# only non-bare-identifier keys the SQL tree accepts (group 1/2 = func parts,
# the identifier is backtick-quoted on re-render)
_WRAPPED_RE = re.compile(
    r"^(unix_micros\()([A-Za-z_][A-Za-z0-9_]*)(\))$|"
    r"^(date_format\()([A-Za-z_][A-Za-z0-9_]*)(, 'yyyy-MM-dd HH:mm:ss\.SSSSSS'\))$"
)


def _sql_lit(v) -> str | None:
    """Render a sampled boundary value as a Spark SQL literal; None if the
    type is outside the whitelist (caller falls back to the Column tree)."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v) if -(2**63) <= v < 2**63 else None
    if isinstance(v, float):
        if math.isnan(v):
            return "double('NaN')"
        if v == float("inf"):
            return "double('Infinity')"
        if v == float("-inf"):
            return "double('-Infinity')"
        # repr round-trips the exact double; CAST from string avoids the
        # parser's default DECIMAL typing of bare numeric literals
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, decimal.Decimal):
        if not v.is_finite():
            return None
        s = format(v, "f")
        digits = len(s.replace("-", "").replace(".", "").lstrip("0")) or 1
        scale = len(s.split(".")[1]) if "." in s else 0
        return f"CAST('{s}' AS DECIMAL({max(digits, scale, 1)},{scale}))"
    if isinstance(v, datetime.datetime):
        # unreachable via the operators — _comparison_keys rewrites
        # timestamp keys to epoch micros / date_format strings precisely
        # because a naive-datetime literal is timezone-ambiguous (ADVICE
        # r5); kept for direct _pid_expr_sql callers and the cross-type
        # equivalence test
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    return None


def _pid_expr_sql(keys: list[_Key], boundaries: list[tuple]) -> str | None:
    """One-string SQL form of the decision tree, or None if any key column
    is not a plain identifier or any literal is outside the whitelist."""
    names: list[str] = []
    for k in keys:
        try:
            name = _column_node(k.col).sql()
        except Exception:
            return None
        if _IDENT_RE.match(name):
            names.append(f"`{name}`")
            continue
        m = _WRAPPED_RE.match(name)
        if not m:
            return None
        pre, ident, post = (m.group(1), m.group(2), m.group(3)) if m.group(1) else (
            m.group(4), m.group(5), m.group(6)
        )
        names.append(f"{pre}`{ident}`{post}")

    def gt(i: int, bv) -> str | None:
        col, k = names[i], keys[i]
        if bv is None:
            return f"({col} IS NOT NULL)" if k.nulls_first else "false"
        lit = _sql_lit(bv)
        if lit is None:
            return None
        op = "<" if k.desc else ">"
        null_case = "false" if k.nulls_first else "true"
        return f"(CASE WHEN {col} IS NULL THEN {null_case} ELSE {col} {op} {lit} END)"

    def eq(i: int, bv) -> str | None:
        col = names[i]
        if bv is None:
            return f"({col} IS NULL)"
        lit = _sql_lit(bv)
        return None if lit is None else f"({col} <=> {lit})"

    def after(b: tuple) -> str | None:
        terms: list[str] = []
        prefix: list[str] = []
        for i, bv in enumerate(b):
            g = gt(i, bv)
            if g is None:
                return None
            terms.append("(" + " AND ".join(prefix + [g]) + ")" if prefix else g)
            e = eq(i, bv)
            if e is None:
                return None
            prefix.append(e)
        return "(" + " OR ".join(terms) + ")"

    conds = [after(b) for b in boundaries]
    if any(c is None for c in conds):
        return None

    def tree(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"CASE WHEN {conds[mid]} THEN {tree(mid + 1, hi)}"
            f" ELSE {tree(lo, mid)} END"
        )

    return tree(0, len(boundaries))


def _sel_keys(df: DataFrame, keys: list[_Key]) -> DataFrame:
    return df.select(*[k.col.alias(f"__k_{i}") for i, k in enumerate(keys)])


def _pick_boundaries(rows, keys: list[_Key], num_pids: int) -> list[tuple]:
    """Sort collected key rows with Spark's exact sort semantics and pick
    <= num_pids-1 strictly increasing, prefix-truncated split tuples."""
    if num_pids <= 1 or not rows:
        return []
    cmp = _make_cmp(keys)
    tuples = sorted((tuple(r) for r in rows), key=functools.cmp_to_key(cmp))
    step = len(tuples) / num_pids
    out: list[tuple] = []
    for i in range(1, num_pids):
        t = tuples[min(len(tuples) - 1, int(i * step))]
        if not out or cmp(out[-1], t) < 0:  # strictly increasing: no empty-pid dups
            out.append(t)
    return _truncate_prefix(out, keys)


def _boundaries(df: DataFrame, keys: list[_Key], num_pids: int, n: int) -> list[tuple]:
    """Collect a bounded deterministic key sample and pick <= num_pids-1
    strictly increasing split tuples (metadata-sized driver traffic)."""
    if num_pids <= 1 or n == 0:
        return []
    sel = _sel_keys(df, keys)
    target = min(max(num_pids * _SAMPLE_PER_PID, 1024), _SAMPLE_CAP)
    if n <= target:
        rows = sel.collect()
    else:
        # no DataFrame-side limit: limit pulls from the earliest partitions,
        # so key-clustered data would sample only a key-range prefix and pile
        # most rows into the last pid (ADVICE r5). The fraction already
        # bounds expected rows to 1.3*target; the binomial tail above 2x
        # that is negligible, and boundary count is capped below anyway.
        frac = min(1.0, 1.3 * target / n)
        rows = sel.sample(False, frac, seed=_SAMPLE_SEED).collect()
        if not rows:  # pathological under-sample on tiny n
            rows = sel.limit(target).collect()
    return _pick_boundaries(rows, keys, num_pids)


def _truncate_prefix(bnds: list[tuple], keys: list[_Key]) -> list[tuple]:
    """Shorten every boundary to the smallest shared column-prefix that keeps
    the list strictly increasing.

    Any strictly increasing boundary list yields a correct monotone pid
    assignment — a shorter tuple just splits at a coarser point — so when
    the first ordering column is (near-)unique, the whole decision tree
    degenerates to single-column comparisons. That matters at volume: the
    pid expression runs per row in every consumer branch, and a multi-column
    lexicographic node costs O(ncols) predicates (string eqNullSafe chains
    included) versus one comparison after truncation, and big CASE trees
    risk falling out of whole-stage codegen entirely."""
    if not bnds or len(bnds[0]) == 1:
        return bnds
    for length in range(1, len(keys)):
        sub = [(k.desc, k.nulls_first) for k in keys[:length]]

        def cmp_l(a, b, _sub=sub):
            for (desc, nf), x, y in zip(_sub, a, b):
                c = _cmp_one(x, y, desc, nf)
                if c:
                    return c
            return 0

        cut = [t[:length] for t in bnds]
        if all(cmp_l(cut[i], cut[i + 1]) < 0 for i in range(len(cut) - 1)):
            return cut
    return bnds


def _target_pids(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions:
        return num_partitions
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def _guard(df: DataFrame, names) -> None:
    for c in names:
        if c in df.columns:
            raise ValueError(f"ranking scratch column {c!r} already present")


#: session-lifetime boundary cache (VERDICT r6 item 5): k chained two-phase
#: ops — or k bench/driver re-executions of the same query — fire k
#: build-time probe jobs over identical (plan, keys) pairs. Key =
#: (application id, analyzed-plan semantic hash, comparison-key signature,
#: explicit num_partitions, target pid count); value = (boundaries,
#: num_pids). SAFETY: a pid expression is correct for ANY boundary literal
#: set (the decision tree is monotone in the sort order by construction),
#: so a stale hit — e.g. the underlying parquet directory rewritten in
#: place under an unchanged plan — can only degrade partition BALANCE,
#: never results. Entries are evicted FIFO past the cap; clear_probe_cache()
#: empties it (tests, or after a known in-place data rewrite).
_PROBE_CACHE: dict = {}
_PROBE_CACHE_CAP = 256
_PROBE_CACHE_HITS = 0
_PROBE_CACHE_MISSES = 0


def clear_probe_cache() -> None:
    """Empty the boundary cache (see ``_PROBE_CACHE``) and zero its
    hit/miss counters.

    Call after a known IN-PLACE data rewrite (same path, same plan, new
    rows): a stale hit is still CORRECT — the pid expression is monotone
    for any boundary set — but the partition balance was picked for the
    old data. This is the public invalidation hook (ADVICE r7); pair with
    ``probe_cache_stats()`` to observe hit rates instead of reaching for
    the module globals.
    """
    global _PROBE_CACHE_HITS, _PROBE_CACHE_MISSES
    _PROBE_CACHE.clear()
    _PROBE_CACHE_HITS = 0
    _PROBE_CACHE_MISSES = 0


def probe_cache_stats() -> dict[str, int]:
    """Boundary-cache observability: ``{"entries", "hits", "misses"}``
    for the current process (ADVICE r7 — the supported way to see whether
    chained two-phase ops are re-probing; counters zero on
    ``clear_probe_cache()``)."""
    return {
        "entries": len(_PROBE_CACHE),
        "hits": _PROBE_CACHE_HITS,
        "misses": _PROBE_CACHE_MISSES,
    }


def _plan_fingerprint(df: DataFrame):
    """Semantic hash of the analyzed plan, or None when unavailable (then
    the caller skips caching — correct, just re-probes)."""
    try:
        return df.semanticHash()
    except Exception:  # noqa: BLE001 — Connect/classic seam, like _decompose
        try:
            return df._jdf.queryExecution().analyzed().semanticHash()  # noqa: SLF001
        except Exception:  # noqa: BLE001
            return None


def _prepare(
    df: DataFrame,
    keys: list[_Key],
    num_partitions: int | None,
    pin: str | None,
    cache_key: str | None = None,
) -> DataFrame:
    """Pin the input per ``pin`` and stamp the deterministic pid column.

    The pid count adapts to the data: below ``_MIN_ROWS_PER_PID`` rows per
    pid a partition-parallel window buys nothing (the single-task hazard
    these operators exist to avoid only bites at millions of rows), so
    small inputs get a shallow decision tree — fewer boundary literals to
    codegen in every consumer branch and fewer window partitions to merge.
    At cluster scale ``n / _MIN_ROWS_PER_PID`` dwarfs the configured
    parallelism, so the cap is the shuffle-partition count, exactly as
    before. An explicit ``num_partitions`` is honored verbatim (tests use
    it to force many boundaries over small data). Inputs at or under
    ``_PROBE_CAP`` rows pay ONE probe job total (exhaustive key collect =
    exact n + exact boundaries); larger inputs pay the probe overflow plus
    the classic count + sample pair, where the count also eagerly
    materializes the ``pin='persist'`` cache.

    Boundary results are memoized in ``_PROBE_CACHE`` keyed on the
    analyzed plan's semantic hash + the key signature, so re-building the
    same operator over the same input (or composing several ranking ops
    on one frame with the same ordering) pays the probe job once per
    session. The semantic hash CANNOT bridge ``localCheckpoint`` fences
    (every checkpoint is a fresh plan identity), so a pipeline that
    fences between chained two-phase ops re-probes per execution — at
    sf0.1 one overflow-path probe measured ~2.6 s (VERDICT r7 item 8).
    ``cache_key`` is the opt-in bridge: a caller-supplied CONTENT name
    (e.g. pipeline stage + input path) replaces the plan hash in the key
    (the key signature, partition params, and app id still apply). This
    is correctness-safe BY THE SAME ARGUMENT AS ANY STALE HIT — a pid
    expression is monotone for any boundary literal set, so even a
    colliding or outdated user key can only cost partition balance —
    but balance ownership moves to the caller: key on something that
    changes when the data distribution does. NOTE the pin interaction: on a cache hit (and on the probe
    path for inputs under ``_PROBE_CAP``) no full-scan job runs at build
    time, so ``pin='persist'`` registers the cache lazily — it fills on
    the first consumer action rather than eagerly at build. For
    deterministic inputs the result is identical; for borderline-
    nondeterministic inputs wanting the eager-pin guarantee, use
    ``pin='checkpoint'`` (always eager) instead (ADVICE r6).
    """
    global _PROBE_CACHE_HITS, _PROBE_CACHE_MISSES
    if pin == "persist":
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    elif pin == "checkpoint":
        df = df.localCheckpoint(eager=True)
    elif pin is not None:
        raise ValueError(f"ranking: pin must be 'persist', 'checkpoint' or None, got {pin!r}")
    ckeys = _comparison_keys(df, keys)
    target = _target_pids(df, None)

    fp = ("user", cache_key) if cache_key is not None else _plan_fingerprint(df)
    memo_key = None
    if fp is not None:
        ksig = tuple((str(k.col), k.desc, k.nulls_first) for k in ckeys)
        app_id = df.sparkSession.sparkContext.applicationId
        memo_key = (app_id, fp, ksig, num_partitions, target)
        cached = _PROBE_CACHE.get(memo_key)
        if cached is not None:
            _PROBE_CACHE_HITS += 1
            bnds, num_pids = cached
            return df.withColumn(_PID, _pid_expr(ckeys, bnds))
    _PROBE_CACHE_MISSES += 1

    def adaptive(n: int) -> int:
        # floor of 2: a constant pid would fold and re-plan the window
        # exchange as SinglePartition — the exact node these operators ban
        return min(target, max(2, -(-n // _MIN_ROWS_PER_PID)))

    # Probe-first: ONE limit-collect job answers both questions for small
    # inputs — the exact row count AND the exhaustive key set — replacing
    # the count job + sample job pair (2x the input-scan constant on every
    # small two-phase call; the r5 op_seq_gaps flag was exactly this).
    # len(probe) <= cap means the collect was exhaustive, so boundary picks
    # are exact and the limit's earliest-partitions bias is irrelevant.
    # Overflow costs one probe job before the classic count+sample path —
    # cheap even when the input ends in a shuffle: probe/count/sample all
    # derive from the SAME DataFrame object, so its shuffle map stages are
    # computed once and reused across the three jobs (RDD shuffle reuse);
    # the probe's own work is one short-circuited reduce side.
    probe = _sel_keys(df, ckeys).limit(_PROBE_CAP + 1).collect()
    if len(probe) <= _PROBE_CAP:
        num_pids = num_partitions or adaptive(len(probe))
        bnds = _pick_boundaries(probe, ckeys, num_pids)
    else:
        n = df.count()
        num_pids = num_partitions or adaptive(n)
        bnds = _boundaries(df, ckeys, num_pids, n)
    if memo_key is not None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_CAP:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[memo_key] = (bnds, num_pids)
    return df.withColumn(_PID, _pid_expr(ckeys, bnds))


def _two_phase(
    df: DataFrame,
    keys: list[_Key],
    num_partitions: int | None,
    pin: str | None,
    cache_key: str | None = None,
):
    """Stamp pid and return (pid_df, counts, offsets)."""
    _guard(df, (_PID, _CNT, _OFF, _LOCAL, _TOT))
    pid_df = _prepare(df, keys, num_partitions, pin, cache_key=cache_key)
    counts = pid_df.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    earlier = counts.select(
        F.col(_PID).alias("__gr_pid_b"), F.col(_CNT).alias("__gr_cnt_b")
    )
    offsets = (
        counts.join(F.broadcast(earlier), F.col("__gr_pid_b") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(F.coalesce(F.sum("__gr_cnt_b"), F.lit(0)).alias(_OFF))
    )
    return pid_df, counts, offsets


def _offset_window(df, pid_df, offsets, spec, fn, name: str) -> DataFrame:
    w = Window.partitionBy(_PID).orderBy(*spec)
    return (
        pid_df.withColumn(_LOCAL, fn().over(w))
        .join(F.broadcast(offsets), _PID)
        .withColumn(name, (F.col(_LOCAL) + F.col(_OFF)).cast("bigint"))
        .select(*df.columns, name)
    )


def global_rank(
    df: DataFrame,
    order_cols,
    rank_name: str,
    *,
    descending: bool = True,
    num_partitions: int | None = None,
    pin: str | None = "persist",
    cache_key: str | None = None,
) -> DataFrame:
    """Append ``rank_name`` = RANK() OVER (ORDER BY order_cols [DESC]).

    Output rank is BIGINT (an int32 rank overflows past ~2.1B rows — real
    at corpus scale). Column order: original columns, then the rank.
    """
    keys = _parse_spec(order_cols, descending)
    spec = [k.sort_col() for k in keys]
    pid_df, _, offsets = _two_phase(df, keys, num_partitions, pin, cache_key)
    return _offset_window(df, pid_df, offsets, spec, F.rank, rank_name)


def global_row_number(
    df: DataFrame,
    order_cols,
    name: str,
    *,
    descending: bool = False,
    num_partitions: int | None = None,
    pin: str | None = "persist",
    cache_key: str | None = None,
) -> DataFrame:
    """Append ``name`` = ROW_NUMBER() OVER (ORDER BY order_cols).

    The ordering should be total (include a unique tiebreaker) or the
    numbering is nondeterministic — same contract as the SQL form.
    """
    keys = _parse_spec(order_cols, descending)
    spec = [k.sort_col() for k in keys]
    pid_df, _, offsets = _two_phase(df, keys, num_partitions, pin, cache_key)
    return _offset_window(df, pid_df, offsets, spec, F.row_number, name)


def global_lead(
    df: DataFrame,
    order_cols,
    leads: dict[str, str],
    *,
    descending: bool = False,
    num_partitions: int | None = None,
    pin: str | None = "persist",
    cache_key: str | None = None,
) -> DataFrame:
    """Append LEAD(col, 1) OVER (ORDER BY order_cols) for each ``leads``
    entry (source column -> output name) with no single-partition stage.

    Two-phase like :func:`global_rank`: deterministic pid assignment, then
    one per-pid window pass computes both the local lead and the pid's
    first row ("head"). The only rows a local lead gets wrong are each
    pid's last — their successor lives in the next non-empty pid, whose
    head is found with a triangular broadcast join over the metadata-sized
    head set (every non-empty pid contributes exactly one head row, so
    |heads| <= P) and patched in via a broadcast hash join. The globally
    last row keeps NULL, matching the SQL form.

    The ordering should be total (include a unique tiebreaker): same
    determinism contract as LEAD over a non-unique ORDER BY.
    """
    keys = _parse_spec(order_cols, descending)
    spec = [k.sort_col() for k in keys]
    _guard(df, (_PID, _LOCAL, "__gl_rn", "__gl_head", "__gl_patch", "__gl_hpid"))
    pid_df = _prepare(df, keys, num_partitions, pin, cache_key=cache_key)
    w = Window.partitionBy(_PID).orderBy(*spec)
    payload = F.struct(*[F.col(src) for src in leads])
    stamped = pid_df.withColumn(_LOCAL, F.lead(payload).over(w)).withColumn(
        "__gl_rn", F.row_number().over(w)
    )
    heads = stamped.filter(F.col("__gl_rn") == 1).select(
        F.col(_PID).alias("__gl_hpid"), payload.alias("__gl_head")
    )
    later = heads.select(
        F.col("__gl_hpid").alias("__gl_hpid_b"), F.col("__gl_head").alias("__gl_head_b")
    )
    # next non-empty pid's head per pid: min-pid head strictly after it
    # (triangular join over <= P rows)
    patch = (
        heads.join(F.broadcast(later), F.col("__gl_hpid_b") > F.col("__gl_hpid"))
        .groupBy("__gl_hpid")
        .agg(F.min_by("__gl_head_b", "__gl_hpid_b").alias("__gl_patch"))
    )
    fixed = stamped.join(
        F.broadcast(patch), F.col(_PID) == F.col("__gl_hpid"), "left"
    ).withColumn(_LOCAL, F.coalesce(F.col(_LOCAL), F.col("__gl_patch")))
    out_cols = [F.col(_LOCAL)[src].alias(dst) for src, dst in leads.items()]
    return fixed.select(*df.columns, *out_cols)


def global_cumsum(
    df: DataFrame,
    order_cols,
    value_col,
    name,
    *,
    descending: bool = False,
    rows_frame: bool = True,
    num_partitions: int | None = None,
    pin: str | None = "persist",
    cache_key: str | None = None,
) -> DataFrame:
    """Append SUM(value_col) OVER (ORDER BY order_cols <frame>) — the
    global running total — with no single-partition stage.

    ``value_col`` / ``name`` may each be a list of equal length: every
    listed column gets its running total over the SAME ordering in ONE
    two-phase pass (one data shuffle, one per-pid window, one
    metadata-sized offset table carrying a column per value) — chaining
    two single-column calls would shuffle and window the data twice for
    no reason.

    ``rows_frame=True`` is ROWS UNBOUNDED PRECEDING..CURRENT ROW (give a
    total order or the result is as nondeterministic as the SQL form);
    ``False`` is the SQL-default RANGE frame (peers share the value, so
    any order works). Two-phase: local cumulative sum per pid plus
    broadcast offsets of earlier pids' totals (ties co-located by the
    deterministic pid function, so RANGE peer groups never split)."""
    vals = [value_col] if isinstance(value_col, str) else list(value_col)
    names = [name] if isinstance(name, str) else list(name)
    if not vals:
        raise ValueError("global_cumsum: at least one value column required")
    if len(vals) != len(names):
        raise ValueError("global_cumsum: value_col and name length mismatch")
    scratch = [f"__gr_{p}_{i}" for i in range(len(vals)) for p in ("s", "sb", "off", "l")]
    _guard(df, scratch)
    keys = _parse_spec(order_cols, descending)
    spec = [k.sort_col() for k in keys]
    pid_df, _, _ = _two_phase(df, keys, num_partitions, pin, cache_key)
    sums = pid_df.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__gr_s_{i}") for i, v in enumerate(vals)]
    )
    earlier = sums.select(
        F.col(_PID).alias("__gr_pid_b"),
        *[F.col(f"__gr_s_{i}").alias(f"__gr_sb_{i}") for i in range(len(vals))],
    )
    offsets = (
        sums.join(F.broadcast(earlier), F.col("__gr_pid_b") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(
            *[
                F.coalesce(F.sum(f"__gr_sb_{i}"), F.lit(0)).alias(f"__gr_off_{i}")
                for i in range(len(vals))
            ]
        )
    )
    w = Window.partitionBy(_PID).orderBy(*spec)
    if rows_frame:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = pid_df
    for i, v in enumerate(vals):
        out = out.withColumn(f"__gr_l_{i}", F.sum(v).over(w))
    out = out.join(F.broadcast(offsets), _PID)
    for i, nm in enumerate(names):
        out = out.withColumn(nm, F.col(f"__gr_l_{i}") + F.col(f"__gr_off_{i}"))
    return out.select(*df.columns, *names)


def global_ntile(
    df: DataFrame,
    n: int,
    order_cols,
    name: str,
    *,
    descending: bool = False,
    num_partitions: int | None = None,
    pin: str | None = "persist",
    cache_key: str | None = None,
) -> DataFrame:
    """Append ``name`` = NTILE(n) OVER (ORDER BY order_cols) as INT.

    SQL NTILE semantics: with N rows the first ``N % n`` tiles get
    ``N // n + 1`` rows, the rest get ``N // n``. Computed from the
    two-phase global row_number plus the total count, which arrives as a
    pid-keyed broadcast column (counts x broadcast(counts) re-agg on pid)
    so the plan — like the rest of the family — contains no
    single-partition exchange at all. Ordering should be total for
    deterministic tile assignment.
    """
    keys = _parse_spec(order_cols, descending)
    spec = [k.sort_col() for k in keys]
    pid_df, counts, offsets = _two_phase(df, keys, num_partitions, pin, cache_key)
    g, t = _LOCAL + "_rn", _TOT
    w = Window.partitionBy(_PID).orderBy(*spec)
    rn = (
        pid_df.withColumn(_LOCAL, F.row_number().over(w))
        .join(F.broadcast(offsets), _PID)
        .withColumn(g, (F.col(_LOCAL) + F.col(_OFF)).cast("bigint"))
    )
    # per-pid total via the same broadcast idiom as the offsets (cross of
    # the <= P-row counts with itself, re-agg on pid): the global scalar
    # arrives as a pid-keyed column with ZERO single-partition exchange —
    # a plain .agg() would plan Exchange SinglePartition over the P count
    # rows (metadata-sized, but the family's plan gate bans the node form)
    all_cnt = counts.select(F.col(_CNT).alias("__gr_cnt_all"))
    totals = (
        counts.crossJoin(F.broadcast(all_cnt))
        .groupBy(_PID)
        .agg(F.sum("__gr_cnt_all").alias(_TOT))
    )
    rn = rn.join(F.broadcast(totals), _PID)
    # integer `div` throughout: double division could mis-round at huge N
    tile = F.expr(
        f"CASE WHEN {g} <= ({t} % {n}) * ({t} div {n} + 1)"
        f" THEN ({g} - 1) div ({t} div {n} + 1) + 1"
        f" ELSE ({t} % {n}) + ({g} - ({t} % {n}) * ({t} div {n} + 1) - 1)"
        f" div greatest({t} div {n}, 1) + 1 END"
    )
    return rn.withColumn(name, tile.cast("int")).select(*df.columns, name)
