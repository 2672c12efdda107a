"""Streaming CDC apply: keep a queryable table continuously materialized
from an arriving I/U/D changelog — the streaming twin of
``operators/cdc.changelog_apply`` (same merge logic, same results,
asserted in tests/test_streaming.py).

State lives in the SINK, not the engine (the streaming/corpus.py
pattern): each micro-batch merges into the published compacted log
(tombstones retained — see ``operators/cdc.compact_log``) and republishes
via atomic swap. Engine state is zero, restarts are idempotent
(checkpoint tracks consumed files; a replayed batch re-merges rows whose
(key, seq) already won or lost — content is unchanged either way), and
the sink parquet is the recoverable state.

Scale notes: per micro-batch this is one key-partitioned window over
(published ∪ batch). For a 100 TB table that full rewrite is the naive
tier — partition the sink by a stable key hash and rewrite ONLY the
partitions a batch touches (dynamic partition overwrite), exactly how
Hudi copy-on-write tables apply upserts; the merge logic is unchanged, so
this module keeps the simple form and documents the lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import compact_log
from ..sources.sinks import atomic_swap_write, recover_swap


def run_cdc_apply_stream(
    log_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    keys: list[str],
    seq_col: str,
) -> None:
    """Drain an availableNow changelog stream into a compacted sink."""
    from pyspark.errors import AnalysisException

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a crash between atomic_swap_write's two renames leaves the sink
        # missing with the state in a __old__ sibling — heal it, or the
        # fallback below silently rebuilds from this batch alone
        # (self-review r9)
        recover_swap(out_path)
        try:
            cur = spark.read.parquet(out_path)
            merged = cur.unionByName(batch_df)
        except AnalysisException:
            merged = batch_df
        atomic_swap_write(compact_log(merged, keys, seq_col), out_path)

    q = (
        log_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_current_state(
    spark: SparkSession,
    out_path: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Reader view of the compacted sink: tombstones filtered out."""
    return (
        spark.read.parquet(out_path)
        .filter(F.col(op_col) != F.lit(delete_op))
        .drop(op_col)
    )
