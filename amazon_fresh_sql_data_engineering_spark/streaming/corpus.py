"""Streaming corpus ingest: exact dedup as continuous arrival.

The batch exact-dedup (operators/dedup.exact_dedup) groups the corpus by
content fingerprint once; a training-data pipeline at 100 TB/day instead
sees documents *arrive* and must emit each distinct content exactly once.
Two forms, by where the seen-set state lives:

- :func:`corpus_dedup_stream` — engine-state ``dropDuplicates`` on the
  fingerprint. Simple, but state grows with distinct-content count for
  the stream's lifetime (documents carry no event time, so no watermark
  can bound it) — use only for bounded backfills.
- :func:`run_corpus_dedup_upsert` — state lives in the SINK: each
  micro-batch anti-joins its fingerprints against the already-published
  table (events.upsert_sink_foreach_batch, first-writer-wins). Engine
  state is zero, restarts are idempotent (checkpoint + anti-join), and
  the "state" is the output table itself — the form that survives an
  unbounded corpus.

Which document of a duplicate group survives is arrival-order dependent
(same as any streaming dedup); the dedup GROUPS are deterministic, which
is what tests/test_streaming.py asserts against the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import upsert_sink_foreach_batch


def fingerprint(text_col: str = "text") -> "F.Column":
    """Content fingerprint matching operators/dedup.exact_dedup's encoding
    for the single-column case (md5 of the md5-per-column concat reduces
    to md5 of one hash — equality semantics identical)."""
    return F.md5(F.coalesce(F.col(text_col).cast("string"), F.lit("\x00")))


def stream_documents_from_parquet(spark: SparkSession, docs_dir: str) -> DataFrame:
    """readStream over a documents parquet directory (file-source
    streaming; schema taken from a static read, never inferred)."""
    static = spark.read.parquet(docs_dir)
    return spark.readStream.schema(static.schema).parquet(docs_dir)


def corpus_dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Engine-state streaming exact dedup (bounded backfills only — see
    module docstring for the state-growth caveat)."""
    return docs.withColumn("fp", fingerprint(text_col)).dropDuplicates(["fp"])


def run_corpus_dedup_upsert(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> None:
    """Drain an availableNow documents stream through the sink-state dedup:
    per micro-batch, fingerprints anti-join the published table so each
    distinct content is written exactly once across batches AND restarts."""
    fp = docs_stream.withColumn("fp", fingerprint(text_col))
    q = (
        fp.writeStream.foreachBatch(upsert_sink_foreach_batch(out_path, ["fp"]))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
