"""Multi-dimensional clustering for data skipping: Z-ORDER writes.

A 100 TB fact table is usually filtered on more than one column (ship
date AND part, customer AND month). Sorting the write by one column gives
perfect file-level min/max locality on it and DESTROYS locality on every
other; partitioning by both explodes directories. The lakehouse answer
(Delta/Iceberg OPTIMIZE ZORDER BY — public technique, Morton 1966) is to
sort by an interleaved-bit space-filling curve over quantile ranks of the
clustering columns: every file then covers a small hyper-rectangle of the
value space, so ANY conjunctive range filter prunes most files via
parquet footer min/max stats — the reader's row-group skipping and an
external catalog's file skipping both feed on the same stats.

Mechanics here (all write-time; the read path is untouched):

1. Per column, ``approxQuantile`` (driver-side, one pass, bounded error)
   picks ``2^bits - 1`` boundaries; a balanced literal comparison tree
   (depth = bits, the ranking module's literal-boundary idea re-applied)
   maps each value to its quantile rank — equi-POPULATED, so skew cannot
   collapse the curve the way equi-width bucketing would.
2. Ranks interleave bit-by-bit into one long (Morton/Z key). The
   interleave is FUSED into the comparison tree's leaf literals
   (r9: a rank expression referenced once per bit re-inlines the whole
   literal tree bits x cols times — measured 4x the write cost), so each
   column's tree evaluates once per row; ``zorder_key`` remains the
   reference form the fusion is tested against.
3. ``repartitionByRange(num_files, z)`` + ``sortWithinPartitions(z)``
   clusters the write: consecutive z-ranges per file, one writer per
   range → num_files files, each a tight hyper-rectangle.

Scale shape: one range shuffle of the data (any clustering write pays
it), driver work bounded by ncols x 2^bits boundary literals (bits=8 →
255 literals/col, codegen-friendly), no UDFs. NULLs rank 0 (cluster
together at the curve origin). Evidence: ``file_column_ranges`` reads the
parquet footers (pyarrow) and tests assert the z-ordered layout bounds
EVERY clustering column's per-file range where a linear sort bounds only
its leading column (tests/test_sinks.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z = "__z_key"


def _rank_expr(
    col: Column, boundaries: list[float], leaf=None, dtype: str = "int"
) -> Column:
    """Quantile rank of ``col`` against sorted ``boundaries`` as a balanced
    comparison tree: rank = count of boundaries <= value, NULLs rank 0.
    Depth log2(len+1), literal-only — whole-stage-codegen friendly.

    ``leaf`` optionally maps each leaf's rank to a different LITERAL (the
    r9 Morton fusion below): any pure int->int function folds into the
    tree at build time for free, because the leaves are Python-side
    constants — the expression still evaluates in one tree descent."""
    lv = leaf or (lambda r: r)

    def build(lo: int, hi: int) -> Column:
        # leaf invariant: exactly the boundaries with index < lo are <= value
        if lo > hi:
            return F.lit(lv(lo)).cast(dtype)
        mid = (lo + hi) // 2
        return F.when(col < F.lit(boundaries[mid]), build(lo, mid - 1)).otherwise(
            build(mid + 1, hi)
        )

    if not boundaries:
        return F.lit(lv(0)).cast(dtype)
    return F.when(col.isNull(), F.lit(lv(0)).cast(dtype)).otherwise(
        build(0, len(boundaries) - 1)
    )


def _morton_spread(rank: int, bits: int, ncols: int, col_idx: int) -> int:
    """Python-side Morton spread of an integer rank: bit b of ``rank``
    lands at output bit (b * ncols + col_idx) — the per-column half of
    :func:`zorder_key`, evaluated at EXPRESSION BUILD TIME on leaf
    literals rather than per row on rank columns."""
    out = 0
    for b in range(bits):
        out |= ((rank >> b) & 1) << (b * ncols + col_idx)
    return out


def zorder_key(ranks: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide integer ranks into one long:
    output bit (b * ncols + i) = bit b of ranks[i]."""
    n = len(ranks)
    if n * bits > 63:
        raise ValueError(f"zorder: {n} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Return ``df`` clustered on the z-curve of ``cols`` (numeric, date or
    timestamp), ready to write: range-partitioned into ``num_files`` and
    sorted within each. The scratch key column is dropped; row content is
    unchanged (pure reordering — tests assert multiset equality)."""
    n_files = num_files or df.sparkSession.sparkContext.defaultParallelism
    keyed = _zorder_keyed(df, cols, bits, relative_error)
    clustered = (
        keyed.repartitionByRange(n_files, F.col(_Z))
        .sortWithinPartitions(_Z)
        .select(*df.columns)  # narrow projection: per-partition order kept
    )
    return clustered


def _zorder_keyed(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 0.001,
) -> DataFrame:
    """``df`` plus the Morton key column ``_Z`` (and the ``__zq_*`` cast
    scratch columns): the shared quantile-ranks + fused-interleave front
    half of every z-order write form (module doc, mechanics 1-2)."""
    if _Z in df.columns:
        raise ValueError(f"zorder: scratch column {_Z!r} already present")
    if not cols:
        raise ValueError("zorder: at least one clustering column required")
    # the quantile scratch names are scratch too (ADVICE r8): a caller
    # column named __zq_<i> would duplicate in `casted` and approxQuantile /
    # _rank_expr could bind to the caller's values, silently corrupting the
    # clustering — same class as the _Z guard above
    clash = [f"__zq_{i}" for i in range(len(cols)) if f"__zq_{i}" in df.columns]
    if clash:
        raise ValueError(f"zorder: scratch column(s) {clash} already present")
    if len(cols) * bits > 63:
        # fail before the quantile job, not after it (self-review r9)
        raise ValueError(f"zorder: {len(cols)} cols x {bits} bits exceeds a long")
    nq = (1 << bits) - 1
    # one approxQuantile call handles all columns in a single pass;
    # date/timestamp go through the epoch (a DATE cannot cast to double);
    # strings go through an order-preserving 3-codepoint prefix proxy —
    # a plain cast would be NULL for every row, silently ranking the
    # whole column 0 and dropping it from the curve (self-review r8).
    # Unsupported types are rejected for the same reason.
    dtypes = dict(df.dtypes)
    _numeric = ("tinyint", "smallint", "int", "bigint", "float", "double", "boolean")

    def as_double(c: str) -> Column:
        t = dtypes.get(c, "")
        if t == "date" or t.startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        if t == "string":
            # base-65536 value of the first 3 codepoints: monotone in the
            # string for BMP text, 48 bits = exact in a double. Prefix
            # granularity is the standard clustering trade (Delta's
            # string z-values truncate the same way): ties within a
            # 3-char prefix share a rank, which only coarsens file
            # boundaries, never correctness (it is a write-time layout).
            parts = [
                F.coalesce(
                    F.ascii(F.substring(F.col(c), i + 1, 1)), F.lit(0)
                ).cast("double")
                * F.lit(float(65536 ** (2 - i)))
                for i in range(3)
            ]
            expr = parts[0]
            for p in parts[1:]:
                expr = expr + p
            return F.when(F.col(c).isNull(), F.lit(None)).otherwise(expr)
        if t in _numeric or t.startswith("decimal"):
            return F.col(c).cast("double")
        raise ValueError(
            f"zorder: column {c!r} has unsupported type {t!r} (numeric, "
            "decimal, boolean, date, timestamp, or string required)"
        )

    casted = df.select(
        *df.columns,
        *[as_double(c).alias(f"__zq_{i}") for i, c in enumerate(cols)],
    )
    qs = [float(j + 1) / (nq + 1) for j in range(nq)]
    all_bnds = casted.stat.approxQuantile(
        [f"__zq_{i}" for i in range(len(cols))], qs, relative_error
    )
    # boundaries are kept WITH duplicates: rank(v) = #quantile points <= v
    # is then mass-proportional (exact equi-depth) even when one heavy
    # value swallows many quantile points — deduping would compress a
    # low-cardinality column's ranks into the low bits and the interleave
    # would under-weight it (its per-file locality collapses; caught by
    # the read-path skipping test at sf0.001)
    #
    # MORTON FUSION (r9 perf fix, measured 10.5 s -> ~2.6 s on a 600k-row
    # write at bits=8): building the z-key as zorder_key(rank_exprs, bits)
    # references each rank COLUMN EXPRESSION once per bit, and Catalyst
    # inlines the whole 2^bits-literal comparison tree at every reference
    # — bits x ncols expanded trees per row (4080 comparisons at
    # bits=8 x 2 cols) and a codegen blob to match. Instead the Morton
    # spread is applied to the LEAF LITERALS at build time
    # (_morton_spread is a pure int map, free on constants), so each
    # column's tree is evaluated exactly ONCE per row (depth-log2 descent)
    # and the z-key is just the OR of the per-column spread trees.
    # Identical key values (pytest-asserted against zorder_key).
    n = len(cols)
    key = None
    for i, b in enumerate(all_bnds):
        tree = _rank_expr(
            F.col(f"__zq_{i}"),
            sorted(b),
            leaf=lambda r, i=i: _morton_spread(r, bits, n, i),
            dtype="long",
        )
        key = tree if key is None else key.bitwiseOR(tree)
    return casted.withColumn(_Z, key)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    relative_error: float = 0.001,
) -> None:
    """Cluster ``df`` on the z-curve of ``cols`` and write parquet files
    whose footer min/max stats bound every clustering column (module doc)."""
    zorder_frame(df, cols, bits, num_files, relative_error).write.mode(
        "overwrite"
    ).parquet(path)


def zorder_write_fixed(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    relative_error: float = 0.001,
) -> None:
    """Z-order write with FIXED file boundaries instead of a sampled range
    partition (r11 optimization, guide §2.4 "remove shuffles/passes
    outright").

    ``repartitionByRange`` runs a hidden extra job that re-executes the
    whole child (scan + both rank trees) just to sample range bounds —
    measured as ~2x the entire write at sf0.1 (A/B in OPTIMIZATION_r11.md)
    and one extra full pass over the table at 100 TB. But the z-key is
    built from equi-depth quantile ranks, so its value space is already
    mass-calibrated: splitting it into ``num_files`` EQUAL-WIDTH contiguous
    chunks (file = z * num_files / 2^(bits*ncols)) is the same contiguous-
    range layout without the sampling pass. Each chunk is routed through a
    plain hash shuffle on the file id and written via ``partitionBy`` so
    hash collisions can never merge two chunks into one file (two ids in
    one task still split into separate leaf directories); the leaf dirs
    are then flattened to plain top-level part files, restoring the exact
    directory contract of the sampled form.

    Trade vs the sampled form, stated honestly: equal-width z-chunks are
    equal-MASS only as far as the clustering columns are independent —
    ranks are marginally equi-depth, so any skew comes solely from
    inter-column dependence (worst case, perfectly rank-correlated columns
    concentrate the mass in the diagonal cells: ~num_files^(1/ncols)
    effective files). Callers clustering dependent columns should keep the
    sampled form (:func:`zorder_write`); for independent columns this form
    writes the identical layout one full pass cheaper. Per-file locality
    (the point of z-ordering) is unchanged either way: files still cover
    disjoint contiguous z-ranges.

    Path contract (ADVICE r11): the leaf flatten is driver-local
    ``os.rename``/``shutil`` — correct on the POSIX/HDFS publish seam this
    repo targets (the same seam as versioned.py); on an object store a
    "rename" is a copy and the glob below would silently no-op, so the
    flatten REQUIRES a locally-visible path and raises otherwise. Only
    ``mode="overwrite"`` is supported: an append over an already-flattened
    directory would collide with the prior run's fixed part names.
    """
    import glob
    import os
    import shutil

    n = len(cols)
    n_files = num_files or df.sparkSession.sparkContext.defaultParallelism
    if mode != "overwrite":
        raise ValueError(
            f"zorder_write_fixed: mode={mode!r} unsupported — the flatten "
            "step writes fixed part-<chunk> names, so anything but "
            "'overwrite' would silently clobber a prior run's files"
        )
    if "__z_file" in df.columns:
        raise ValueError("zorder: scratch column '__z_file' already present")
    if n * bits + max(n_files - 1, 1).bit_length() >= 63:
        raise ValueError(
            f"zorder_write_fixed: bits={bits} x {n} cols with "
            f"num_files={n_files} overflows the int64 chunk arithmetic — "
            "lower bits or use the sampled zorder_write"
        )
    keyed = _zorder_keyed(df, cols, bits, relative_error)
    k_span = 1 << (n * bits)
    # pure integer chunk id (ADVICE r11): the double division lost exactness
    # past 2^53 and the multiply could overflow at high bits x cols; integer
    # `div` keeps the identical boundaries for every reachable config (the
    # overflow guard above bounds the product below 2^63)
    keyed = keyed.withColumn(
        "__z_file",
        F.expr(f"CAST(({_Z} * {n_files}L) div {k_span}L AS INT)"),
    )
    (
        # 4x more buckets than chunk ids (ADVICE r11): hashing n ids into
        # exactly n buckets leaves ~1/e of write tasks empty by
        # balls-in-bins; 4n cuts the collision odds so chunks spread to
        # distinct tasks (correctness never depends on it — partitionBy
        # splits colliding chunks into their own leaf dirs either way)
        keyed.repartition(4 * n_files, F.col("__z_file"))
        .sortWithinPartitions("__z_file", _Z)
        .select(*df.columns, "__z_file")
        .write.mode(mode)
        .partitionBy("__z_file")
        .parquet(path)
    )
    if not os.path.isdir(path):
        raise ValueError(
            f"zorder_write_fixed: {path!r} is not visible as a local "
            "directory after the write — the leaf flatten needs a "
            "POSIX-visible path (object stores: use zorder_write)"
        )
    # flatten: one leaf dir per non-empty chunk, each holding exactly one
    # part file (a chunk lives wholly in one task); renumber to plain
    # part-<chunk>-<i> names so readers and footer tooling see the same
    # flat directory the sampled form produces, in z-range order
    for d in sorted(glob.glob(os.path.join(path, "__z_file=*"))):
        g = int(d.rsplit("=", 1)[1])
        for i, f in enumerate(sorted(glob.glob(os.path.join(d, "*.parquet")))):
            os.rename(
                f, os.path.join(path, f"part-{g:05d}-{i}.snappy.parquet")
            )
        shutil.rmtree(d)


def file_column_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-data-file footer stats for ``cols``: [{file, col: (min, max)}].
    The evidence reader for clustering quality — what an external catalog
    or the parquet reader's row-group skipping would consult."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        rec: dict = {"file": os.path.basename(f)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        s = col.statistics
                        if s.has_min_max:
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
            rec[c] = (lo, hi)
        out.append(rec)
    return out


def avg_normalized_range(path: str, col: str) -> float:
    """Mean per-file (max-min)/(global max-min) for ``col`` — 1.0 means
    every file spans the whole domain (no skipping possible), 1/num_files
    is the linear-sort optimum for the leading column."""
    stats = [r[col] for r in file_column_ranges(path, [col]) if r[col][0] is not None]
    if not stats:
        return float("nan")
    glo = min(s[0] for s in stats)
    ghi = max(s[1] for s in stats)
    span = float(ghi - glo) or 1.0
    return sum(float(s[1] - s[0]) for s in stats) / len(stats) / span
