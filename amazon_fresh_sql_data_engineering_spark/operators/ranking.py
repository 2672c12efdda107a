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

1. **Range phase** — ``repartitionByRange`` on the full ordering spec.
   Spark's range partitioner puts *equal keys in the same partition*
   (partition choice is a binary search of the key against sampled
   boundaries, so equal keys always land on the same side), which is what
   makes per-partition ranks composable: a tie group never spans
   partitions, and partition order equals sort order.
2. **Local phase** — the window function over ``PARTITION BY
   spark_partition_id()``. This is a parallel hash exchange over the
   range-partition ids, never a single-partition one.
3. **Offset phase** — per-partition row counts (one row per shuffle
   partition, metadata-sized) become cumulative offsets via a triangular
   broadcast self-join instead of an ORDER BY window, so the rank/
   row_number plans are *entirely* free of ``Exchange SinglePartition``
   (asserted in tests/test_plans.py). ``global = local + rows in earlier
   partitions``.

``global_ntile`` additionally needs the total row count; that scalar is
aggregated from the per-partition counts, so the one single-partition
exchange it contains sees at most ``spark.sql.shuffle.partitions`` rows —
metadata, not data.

The offsets side is at most ``spark.sql.shuffle.partitions`` rows, so the
triangular join is O(P^2) on P <= a few thousand — noise — and every join
of a tiny side is explicitly broadcast.

Skew note: a single key value that dominates the table still lands in one
range partition (any rank implementation must co-locate ties); for rank
over low-cardinality keys aggregate to the key grain first, which every
catalog user of these operators already does.

Determinism: the stamped ``spark_partition_id()`` frame is **eagerly
localCheckpoint-ed** before any branch consumes it. Two stacked hazards
force a materialized pin:

1. Range-exchange boundary sampling is seeded by the *RDD instance id*
   (``byteswap32(-rdd.id - 1)`` in ``RangePartitioner.sketch``), so two
   physical materializations of the same logical ``repartitionByRange``
   can pick DIFFERENT boundaries; the local-window branch, the counts
   branch, and the offsets branch then see inconsistent row->pid mappings
   and the composed rank silently drifts (observed on Spark 4.1: ranks
   off by a partition's tie count at 300k rows).
2. ``spark_partition_id()`` is a **nondeterministic expression**, so no
   two consumer plans of the stamped frame are ever canonically equal:
   ``CacheManager`` lookups miss (a ``persist()`` pin is silently
   BYPASSED — measured: persist + eager count still composes wrong) and
   ``ReuseExchange`` cannot fire above the stamp. Under AQE the
   *exchange below the stamp* is deduplicated by runtime stage-level
   reuse (its subtree is deterministic), which masks the bug — with
   ``spark.sql.adaptive.enabled=false`` every branch plans its own
   exchange, samples its own boundaries, and the composed cumsum was
   measured wrong on 12k of 15k rows (found by an AQE-off
   odd-partition-count perturbation sweep, round 4).

``localCheckpoint(eager=True)`` freezes the pid values IN THE DATA —
every branch reads the one materialized assignment under any config, and
the checkpoint also truncates lineage. The pinned frame is the operator's
input at its (usually aggregate) grain; the one materialized pass
replaces up to three independent shuffles of the same data.

Caller discipline for long-running jobs: localCheckpoint blocks are not
evictable and not recomputable — unpersist them between logically
independent jobs (bench.py's between-query discipline), and on clusters
with preemptible executors prefer reliable ``checkpoint()`` semantics if
mid-query executor loss must be survivable (same tradeoff as every other
eager fence in this engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_CNT = "__gr_cnt"
_OFF = "__gr_off"
_LOCAL = "__gr_local"
_TOT = "__gr_total"


def _order_spec(order_cols, descending: bool) -> list[Column]:
    cols = [order_cols] if isinstance(order_cols, (str, Column)) else list(order_cols)
    out = []
    for c in cols:
        if isinstance(c, str):
            out.append(F.col(c).desc() if descending else F.col(c).asc())
        else:  # caller passed an explicit sort expression
            out.append(c)
    return out


def _two_phase(df: DataFrame, spec: list[Column], num_partitions: int | None):
    """Range-partition on ``spec`` and return (pid_df, counts, offsets)."""
    for c in (_PID, _CNT, _OFF, _LOCAL, _TOT):
        if c in df.columns:
            raise ValueError(f"ranking scratch column {c!r} already present")
    ranged = (
        df.repartitionByRange(num_partitions, *spec)
        if num_partitions
        else df.repartitionByRange(*spec)
    )
    # eager localCheckpoint = the consistency pin for every downstream
    # branch (see module docstring: spark_partition_id() is nondeterministic,
    # so consumer plans never canonically match — cache lookups and
    # ReuseExchange both miss, and each branch would sample its own range
    # boundaries)
    pid_df = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
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
) -> DataFrame:
    """Append ``rank_name`` = RANK() OVER (ORDER BY order_cols [DESC]).

    Output rank is BIGINT (an int32 rank overflows past ~2.1B rows — real
    at corpus scale). Column order: original columns, then the rank.
    """
    spec = _order_spec(order_cols, descending)
    pid_df, _, offsets = _two_phase(df, spec, num_partitions)
    return _offset_window(df, pid_df, offsets, spec, F.rank, rank_name)


def global_row_number(
    df: DataFrame,
    order_cols,
    name: str,
    *,
    descending: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``name`` = ROW_NUMBER() OVER (ORDER BY order_cols).

    The ordering should be total (include a unique tiebreaker) or the
    numbering is nondeterministic — same contract as the SQL form.
    """
    spec = _order_spec(order_cols, descending)
    pid_df, _, offsets = _two_phase(df, spec, num_partitions)
    return _offset_window(df, pid_df, offsets, spec, F.row_number, name)


def global_lead(
    df: DataFrame,
    order_cols,
    leads: dict[str, str],
    *,
    descending: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append LEAD(col, 1) OVER (ORDER BY order_cols) for each ``leads``
    entry (source column -> output name) with no single-partition stage.

    Two-phase like :func:`global_rank`: range-partition on the ordering
    spec, then one per-partition window pass computes both the local lead
    and the partition's first row ("head"). The only rows a local lead
    gets wrong are each partition's last — their successor lives in the
    next non-empty partition, whose head is found with a triangular
    broadcast join over the metadata-sized head set (every non-empty
    partition contributes exactly one head row, so |heads| <= shuffle
    partitions) and patched in via a broadcast hash join. The globally
    last row keeps NULL, matching the SQL form.

    The ordering should be total (include a unique tiebreaker): same
    determinism contract as LEAD over a non-unique ORDER BY.
    """
    spec = _order_spec(order_cols, descending)
    for c in (_PID, _LOCAL, "__gl_rn", "__gl_head", "__gl_patch", "__gl_hpid"):
        if c in df.columns:
            raise ValueError(f"ranking scratch column {c!r} already present")
    ranged = (
        df.repartitionByRange(num_partitions, *spec)
        if num_partitions
        else df.repartitionByRange(*spec)
    )
    # same consistency pin as _two_phase: heads/patch branches must see the
    # exact row->pid mapping the stamped window branch saw
    pid_df = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
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
    # next non-empty partition's head per partition: min-pid head strictly
    # after it (triangular join over <= shuffle-partition-count rows)
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
) -> DataFrame:
    """Append SUM(value_col) OVER (ORDER BY order_cols <frame>) — the
    global running total — with no single-partition stage.

    ``value_col`` / ``name`` may each be a list of equal length: every
    listed column gets its running total over the SAME ordering in ONE
    two-phase pass (one range exchange, one per-partition window, one
    metadata-sized offset table carrying a column per value) — chaining
    two single-column calls would range-partition and window the data
    twice for no reason.

    ``rows_frame=True`` is ROWS UNBOUNDED PRECEDING..CURRENT ROW (give a
    total order or the result is as nondeterministic as the SQL form);
    ``False`` is the SQL-default RANGE frame (peers share the value, so
    any order works). Two-phase: local cumulative sum per range partition
    plus broadcast offsets of earlier partitions' totals (ties co-located,
    so RANGE peer groups never split)."""
    vals = [value_col] if isinstance(value_col, str) else list(value_col)
    names = [name] if isinstance(name, str) else list(name)
    if len(vals) != len(names):
        raise ValueError("global_cumsum: value_col and name length mismatch")
    spec = _order_spec(order_cols, descending)
    pid_df, _, _ = _two_phase(df, spec, num_partitions)
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
) -> DataFrame:
    """Append ``name`` = NTILE(n) OVER (ORDER BY order_cols) as INT.

    SQL NTILE semantics: with N rows the first ``N % n`` tiles get
    ``N // n + 1`` rows, the rest get ``N // n``. Computed from the
    two-phase global row_number plus the total count (a scalar aggregated
    from the per-partition counts — the only single-partition exchange in
    the plan runs over <= shuffle-partition-count rows). Ordering should be
    total for deterministic tile assignment.
    """
    spec = _order_spec(order_cols, descending)
    pid_df, counts, offsets = _two_phase(df, spec, num_partitions)
    rn = _offset_window(df, pid_df, offsets, spec, F.row_number, _LOCAL + "_rn")
    total = counts.agg(F.sum(_CNT).alias(_TOT))
    rn = rn.join(F.broadcast(total))  # 1-row cross: BroadcastNestedLoop, no shuffle
    g, t = _LOCAL + "_rn", _TOT
    # integer `div` throughout: double division could mis-round at huge N
    tile = F.expr(
        f"CASE WHEN {g} <= ({t} % {n}) * ({t} div {n} + 1)"
        f" THEN ({g} - 1) div ({t} div {n} + 1) + 1"
        f" ELSE ({t} % {n}) + ({g} - ({t} % {n}) * ({t} div {n} + 1) - 1)"
        f" div greatest({t} div {n}, 1) + 1 END"
    )
    return rn.withColumn(name, tile.cast("int")).select(*df.columns, name)
