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


def run_corpus_neardup_upsert(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
) -> None:
    """Streaming NEAR-duplicate dedup (MinHash-LSH), sink-held state.

    Online semantics: a document is published iff it is not a near-dup
    of anything already *published* — within a micro-batch the full batch
    operator runs (banded candidates -> exact-Jaccard verify -> connected
    components, keep min id per component), then the surviving
    representatives are screened against the published table through the
    same banded-LSH candidate join + verify. Each published row carries
    its MinHash signature and shingle-hash set, so screening later
    batches never re-shingles history — the sink table IS the LSH index.

    Differences from the batch operator, stated honestly: transitive
    closure never spans batches (an arrival matching only never-published
    dropped docs is itself published), which is inherent to any online
    dedup — you can only compare arrivals against survivors. The
    invariant that DOES hold, and that tests assert, is that no two
    published documents verify as near-dups.

    At 100 TB the published-side band join is the cost to watch: write
    the sink bucketed/partitioned by band prefix so each batch's
    candidate probe prunes to matching buckets instead of scanning the
    full index (the same lever as every LSH family here).
    """
    from pyspark.errors import AnalysisException

    from ..operators.dedup import (
        _candidates_from_sig,
        dedup_corpus,
        jaccard,
        minhash_dedup_pairs,
        minhash_features,
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col])
        # within-batch: full batch semantics (components, min-id reps)
        pairs = minhash_dedup_pairs(
            batch, id_col, text_col, threshold, num_hashes, bands, k, seed
        )
        reps = dedup_corpus(batch, pairs, id_col)
        feats = minhash_features(reps, id_col, text_col, num_hashes, k, seed)
        sig_t = feats.schema["__sig"].dataType
        h_t = feats.schema["__h"].dataType
        # left join + empty-array fill: docs under the shingle width have
        # no features but are still unique content (batch semantics keeps
        # them); their empty sets can never verify >= threshold
        out = (
            reps.join(feats.withColumnRenamed("__id", id_col), on=id_col, how="left")
            .withColumn("__sig", F.coalesce("__sig", F.array().cast(sig_t)))
            .withColumn("__h", F.coalesce("__h", F.array().cast(h_t)))
        )
        try:
            published = spark.read.parquet(out_path).select(id_col, "__sig", "__h")
        except AnalysisException:
            published = None  # first batch: nothing published yet
        if published is not None:
            # ids on the published side are negated so the a<b dedup in the
            # banded self-join can't collapse a (batch, published) pair with
            # a same-id batch row, and side membership stays decodable
            pub_sig = published.select(
                (-F.col(id_col) - 1).alias("__id"), "__sig"
            )
            both = out.select(F.col(id_col).alias("__id"), "__sig").unionByName(
                pub_sig
            )
            cands = _candidates_from_sig(both, num_hashes, bands).filter(
                # exactly one side published (negative id)
                (F.col("id_a") < 0) != (F.col("id_b") < 0)
            )
            cross = cands.select(
                F.greatest("id_a", "id_b").alias("__bid"),
                (-F.least("id_a", "id_b") - 1).alias("__pid"),
            )
            ph = published.select(F.col(id_col).alias("__pid"), F.col("__h").alias("__ph"))
            bh = out.select(F.col(id_col).alias("__bid"), F.col("__h").alias("__bh"))
            dupe_ids = (
                cross.join(bh, "__bid")
                .join(ph, "__pid")
                .filter(jaccard(F.col("__bh"), F.col("__ph")) >= threshold)
                .select(F.col("__bid").alias(id_col))
                .distinct()
            )
            out = out.join(dupe_ids, on=id_col, how="left_anti")
        out.write.mode("append").parquet(out_path)

    q = (
        docs_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
