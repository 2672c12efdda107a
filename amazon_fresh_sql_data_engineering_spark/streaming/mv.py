"""Streaming materialized-view maintenance: keep a SUM/COUNT partial-
aggregate view continuously folded from an arriving signed-delta
changelog — the streaming twin of ``operators/mv.mv_apply_delta`` (same
delta rule, same results, asserted in tests/test_streaming.py).

State lives in the SINK, not the engine (the streaming/cdc.py pattern):
each micro-batch reads the published view state, folds its signed delta
in with ``mv_apply_delta`` (one |MV|+|delta partials| shuffle, never a
base rescan), and republishes via atomic swap. Engine state is zero and
the sink parquet is the recoverable state.

Restart idempotency needs one more move than CDC: a (key, seq) merge is
naturally idempotent under micro-batch replay, but aggregate FOLDING is
not — re-applying a delta double-counts. foreachBatch is at-least-once,
so the published state carries the last folded batch id as a stamp
column inside the SAME atomically-swapped directory (stamp and data can
never tear apart), and a replayed batch id is skipped. The one unstamped
corner — a batch whose fold empties the view entirely — is idempotent by
algebra: an empty post-state means every group's folded count reached
<= 0, so replaying that same delta against the empty state drops every
group again (pytest-asserted).

Scale notes: per micro-batch this rewrites the full view state — fine,
the state is GROUP-grain (|groups| rows, not base rows). For a view too
big to rewrite per batch, partition the sink by a stable hash of the
grain keys and rewrite only partitions the batch touches (dynamic
partition overwrite) — the delta side already collapses to one partial
row per touched group, so touched partitions are few.

OPERATIONAL CONTRACT: the checkpoint directory and the sink move
TOGETHER. Micro-batch ids are checkpoint-scoped and restart at 0 under
a fresh checkpoint, so pairing an existing stamped sink with a new
checkpoint makes the replay guard skip the first batches (correct when
re-draining the same files — folding them again would double-count;
WRONG for a genuinely new delta source, whose batches would be
swallowed). To re-point a new stream at an existing sink, keep the
checkpoint, or re-seed the sink stamp below the new stream's ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mv import mv_apply_delta, mv_build
from ..sources.sinks import atomic_swap_write

#: stamp column: last folded micro-batch id, riding inside the swapped dir
_STAMP = "__mv_last_batch"


def run_mv_maintain_stream(
    delta_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    keys: list[str],
    sums: dict[str, str],
    op_col: str = "__op",
) -> None:
    """Drain an availableNow signed-delta stream into a view-state sink."""
    from pyspark.errors import AnalysisException

    if _STAMP in (set(keys) | set(sums) | {op_col}):
        raise ValueError(f"mv stream: {_STAMP!r} collides with a view column")

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            published = spark.read.parquet(out_path)
        except AnalysisException:
            published = None  # sink does not exist yet: first-ever batch
        if published is not None:
            # a sink that exists but lacks the stamp is NOT an empty
            # state — treating it as one would silently discard published
            # aggregates, so fail loudly instead (seeders must stamp; the
            # narrow try above is only for sink-absent)
            if _STAMP not in published.columns:
                raise ValueError(
                    f"mv stream: sink {out_path} exists without {_STAMP!r} — "
                    "refusing to fold into what may be unstamped state"
                )
            last = published.select(F.max(_STAMP)).first()[0]
            cur = published.drop(_STAMP)
        else:
            cur, last = None, None
        if last is not None and batch_id <= last:
            return  # replay of an already-folded batch (see module doc)
        if cur is None:
            # first batch: an empty state frame with the view's dtypes
            # (mv_build on a filtered-empty delta establishes the same
            # widened aggregate types every later fold casts back to)
            cur = mv_build(batch_df.filter(F.lit(False)).drop(op_col), keys, sums)
        new = mv_apply_delta(cur, batch_df, keys, sums, op_col)
        atomic_swap_write(new.withColumn(_STAMP, F.lit(batch_id)), out_path)

    q = (
        delta_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_mv_state(spark: SparkSession, out_path: str) -> DataFrame:
    """The current view state (stamp column stripped)."""
    return spark.read.parquet(out_path).drop(_STAMP)
