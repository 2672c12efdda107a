"""Streaming semantics tests: sliding windows, and watermark-driven
late-data dropping across checkpointed restarts (the stateful behavior a
batch test can't show)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.streaming.events import (
    hourly_rollup,
    sliding_rollup,
)

TS = datetime.datetime  # all naive UTC


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sliding_window_batch_each_event_in_two_windows(spark):
    df = _events_df(spark, [(1, TS(2024, 1, 1, 10, 15), 1, "click", 1.0)])
    out = sliding_rollup(df, "1 hour", "30 minutes").collect()
    starts = sorted(r.window_start for r in out)
    assert starts == [TS(2024, 1, 1, 9, 30), TS(2024, 1, 1, 10, 0)]


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    # batch 1: events at 10:00-10:04 and 11:00 (the 11:00 event advances the
    # watermark to 10:50, closing + emitting the 10:00 window)
    _events_df(
        spark,
        [
            (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
            (2, TS(2024, 1, 1, 10, 3), 1, "click", 1.0),
            (3, TS(2024, 1, 1, 11, 0), 1, "click", 1.0),
        ],
    ).write.mode("append").parquet(src)
    res = run_once()
    first = {(r.ws, r.n) for r in res.collect()}
    assert (TS(2024, 1, 1, 10, 0), 2) in first

    # batch 2: a LATE event for the already-closed 10:00 window (behind the
    # 10:50 watermark) plus a fresh one; the late row must be dropped
    _events_df(
        spark,
        [
            (4, TS(2024, 1, 1, 10, 1), 1, "click", 1.0),  # late -> dropped
            (5, TS(2024, 1, 1, 12, 0), 1, "click", 1.0),  # advances watermark
        ],
    ).write.mode("append").parquet(src)
    res = run_once()
    rows = res.filter(F.col("ws") == TS(2024, 1, 1, 10, 0)).collect()
    # the 10:00 window was emitted once with n=2 and never re-emitted/updated
    assert [(r.ws, r.n) for r in rows] == [(TS(2024, 1, 1, 10, 0), 2)]


def test_hourly_rollup_schema_stable_batch_vs_stream_def(spark):
    df = _events_df(spark, [(1, TS(2024, 1, 1, 10, 15), 1, "click", 2.5)])
    out = hourly_rollup(df)
    assert out.columns == ["window_start", "event_type", "n_events", "total_value"]
    row = out.collect()[0]
    assert row.window_start == TS(2024, 1, 1, 10, 0) and row.n_events == 1


def test_stateful_user_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState running totals == batch groupBy totals after
    draining the stream. maxFilesPerTrigger=1 forces two micro-batches in
    one run, so the second batch proves state carry-over; 'update' mode
    re-emits per touched user, so keep the row with the highest n_events."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        user_totals_batch,
        user_totals_stateful,
    )

    src = str(tmp_path / "src")
    rows1 = [(1, TS(2024, 1, 1, 10, 0), 1, "click", 1.5), (2, TS(2024, 1, 1, 10, 1), 2, "view", 2.0)]
    rows2 = [(3, TS(2024, 1, 1, 10, 2), 1, "click", 3.0)]
    _events_df(spark, rows1).write.mode("overwrite").parquet(src)
    _events_df(spark, rows2).write.mode("append").parquet(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        user_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("select * from stateful_totals").collect()
    assert len(emitted) >= 3  # user 1 re-emitted at least twice across batches
    got = {}
    for r in emitted:  # last update per user = the one with most events seen
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, r.total_value)
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in user_totals_batch(_events_df(spark, rows1 + rows2)).collect()
    }
    assert got == want and got[1] == (2, 4.5)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark emits each replayed event_id once,
    including replays arriving in a LATER microbatch within the horizon."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        dedup_events_batch,
        dedup_events_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    base = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 1), 1, "click", 2.0),
        (3, TS(2024, 1, 1, 10, 2), 2, "buy", 3.0),
    ]
    # batch 1: originals + an in-batch replay of id 1
    _events_df(spark, base + [base[0]]).write.mode("append").parquet(src)
    # batch 2: replay of id 2 one minute later (state still within horizon)
    _events_df(spark, [(2, TS(2024, 1, 1, 10, 2), 1, "click", 2.0)]).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        dedup_events_stream(stream, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    assert got.count() == 3
    assert sorted(r.event_id for r in got.select("event_id").collect()) == [1, 2, 3]
    # batch twin agrees on the same universe
    batch = dedup_events_batch(
        _events_df(spark, base + [base[0], (2, TS(2024, 1, 1, 10, 2), 1, "click", 2.0)])
    )
    assert batch.count() == 3


def test_stream_static_join_enrichment(spark, tmp_path):
    """Stream-static broadcast join: streaming events pick up dim attrs;
    result equals the batch twin."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        enrich_with_dim,
    )

    src = str(tmp_path / "src")
    rows = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 1), 2, "buy", 2.0),
        (3, TS(2024, 1, 1, 10, 2), 9, "click", 3.0),  # no dim row -> dropped (inner)
    ]
    _events_df(spark, rows).write.parquet(src)
    dim = spark.createDataFrame([(1, "pro"), (2, "free")], "user_id long, tier string")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        enrich_with_dim(stream, dim)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.event_id, r.tier) for r in spark.read.parquet(out).collect()}
    want = {
        (r.event_id, r.tier)
        for r in enrich_with_dim(_events_df(spark, rows), dim).collect()
    }
    assert got == want == {(1, "pro"), (2, "free")}


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    """The foreachBatch upsert sink drops upstream replays: rerunning the
    stream over a source that re-delivers old event_ids appends only the
    genuinely new rows."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        run_stream_upsert,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    first = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 1), 1, "click", 2.0),
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),  # in-batch dup
    ]
    _events_df(spark, first).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    run_stream_upsert(stream, out, ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    ) == [1, 2]

    # source re-delivers ids 1-2 in a NEW file plus a new id 3
    replay = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 1), 1, "click", 2.0),
        (3, TS(2024, 1, 1, 10, 5), 2, "buy", 9.0),
    ]
    _events_df(spark, replay).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    run_stream_upsert(stream2, out, ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    ) == [1, 2, 3]


def test_incremental_clean_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """The reference's cleaning ETL as continuous ingest: dirty staging
    arrives as a file stream in chunks, each micro-batch runs the full
    clean_entity program in foreachBatch and upserts first-writer-wins.
    The streamed final table must equal the single-batch clean exactly
    (content-addressed repair + keyed anti-join make the composition
    idempotent and order-insensitive on this corpus)."""
    from amazon_fresh_sql_data_engineering_spark.pipelines.cleaning import (
        clean_entity,
        run_incremental_clean,
    )
    from amazon_fresh_sql_data_engineering_spark.pipelines.entities import spec_customers
    from amazon_fresh_sql_data_engineering_spark.queries_etl import _staged_customers

    staged = _staged_customers(spark, sf_dir)
    batch_final = {tuple(r) for r in clean_entity(staged, spec_customers()).final.collect()}

    stage_dir = str(tmp_path / "staging_in")
    # two separate writes -> at least two files; the stream may group them
    # into any number of micro-batches
    staged.filter(F.col("customerid").isNotNull()).limit(0)  # no-op, keep lints quiet
    half = staged.randomSplit([0.5, 0.5], seed=7)
    half[0].write.mode("append").parquet(stage_dir)
    half[1].write.mode("append").parquet(stage_dir)

    out = str(tmp_path / "customers_final")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(staged.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(stage_dir)
    run_incremental_clean(stream, spec_customers(), out, ckpt)

    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert streamed == batch_final


def test_corpus_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming exact dedup (sink-state foreachBatch upsert) must emit
    exactly one row per distinct content — the same dedup groups as the
    batch operator — across multiple arrival batches."""
    from amazon_fresh_sql_data_engineering_spark.operators.dedup import exact_dedup
    from amazon_fresh_sql_data_engineering_spark.streaming import corpus as SC

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    src = str(tmp_path / "arrivals")
    # two files -> the file source delivers them; duplicates span batches
    docs.write.parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    stream = SC.stream_documents_from_parquet(spark, src)
    out = str(tmp_path / "published")
    SC.run_corpus_dedup_upsert(stream, out, str(tmp_path / "ckpt"))
    published = spark.read.parquet(out)

    batch = exact_dedup(spark.read.parquet(src), ["text"], "doc_id")
    assert published.count() == batch.count()
    # identical dedup GROUPS (fingerprint sets); survivor choice is
    # arrival-order dependent by design
    got = {r.fp for r in published.select("fp").collect()}
    want = {
        r.fp
        for r in spark.read.parquet(src)
        .select(SC.fingerprint("text").alias("fp"))
        .distinct()
        .collect()
    }
    assert got == want
    # restart idempotency: re-running the drained stream adds nothing
    stream2 = SC.stream_documents_from_parquet(spark, src)
    SC.run_corpus_dedup_upsert(stream2, out, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(out).count() == batch.count()


def test_corpus_dedup_engine_state_form(spark, sf_dir, tmp_path):
    from amazon_fresh_sql_data_engineering_spark.streaming import corpus as SC

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = SC.corpus_dedup_stream(SC.stream_documents_from_parquet(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT fp) AS d FROM corpus_dedup_t").collect()[0]
    assert got.n == got.d == 100


def test_corpus_neardup_stream_screens_arrivals(spark, sf_dir, tmp_path):
    """Streaming MinHash near-dup: exact and near copies arriving after
    their originals are published must be screened out; novel docs must
    still publish; and the published set must contain no near-dup pair.
    Re-draining with a fresh checkpoint adds nothing (self-match)."""
    from amazon_fresh_sql_data_engineering_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming import corpus as SC

    all_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    first = all_docs.limit(100)
    novel = all_docs.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 160)
    )
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "published")
    ckpt = str(tmp_path / "ckpt")

    first.write.parquet(src)
    SC.run_corpus_neardup_upsert(
        SC.stream_documents_from_parquet(spark, src), out, ckpt
    )
    n_first = spark.read.parquet(out).count()
    assert n_first > 0

    # wave 2: exact copies, near copies (suffix mutation), and novel docs
    exact = first.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    near = first.withColumn("doc_id", F.col("doc_id") + 2_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" qq ww ee rr tt yy"))
    )
    exact.unionByName(near).unionByName(novel).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    SC.run_corpus_neardup_upsert(
        SC.stream_documents_from_parquet(spark, src), out, ckpt
    )
    published = spark.read.parquet(out)
    pub_ids = {r.doc_id for r in published.select("doc_id").collect()}
    # exact copies NEVER publish (identical content always verifies 1.0
    # against its published original, or its original's screener)
    assert not any(1_000_000 <= i < 2_000_000 for i in pub_ids)
    # every screened doc has a verified >= threshold pair as its reason;
    # every published near copy is one whose suffix mutation pushed it
    # under the threshold (short docs — legitimately not near-dups)
    all_pairs = minhash_dedup_pairs(
        spark.read.parquet(src).select("doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.7,
    ).collect()
    paired_ids = {i for r in all_pairs for i in (r.id_a, r.id_b)}
    arrived = {r.doc_id for r in spark.read.parquet(src).select("doc_id").collect()}
    dropped = arrived - pub_ids
    assert dropped <= paired_ids, sorted(dropped - paired_ids)[:5]
    novel_ids = {r.doc_id for r in novel.collect()}
    assert pub_ids & novel_ids, "at least some novel docs must publish"
    # the published set is pairwise near-dup free
    leftover = minhash_dedup_pairs(
        published.select("doc_id", "text"), "doc_id", "text", threshold=0.7
    )
    assert leftover.count() == 0
    # fresh-checkpoint redrain: everything self-matches, nothing added
    SC.run_corpus_neardup_upsert(
        SC.stream_documents_from_parquet(spark, src),
        out,
        str(tmp_path / "ckpt2"),
    )
    assert spark.read.parquet(out).count() == published.count()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream LEFT OUTER interval join: matched pairs
    equal the batch join, and the unmatched purchase's NULL row flushes
    only after a later micro-batch advances the watermark past
    purchase_ts + lookback — the state-eviction contract that bounds
    state at 100 TB."""
    import os

    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        clicks_before_purchase_join,
    )

    p_schema = "event_id long, user_id long, purchase_ts timestamp, revenue double"
    c_schema = "event_id long, user_id long, ts timestamp"
    T0 = TS(2024, 1, 2, 12, 0)
    purchases = [
        (100, 1, T0, 10.0),                      # has 2 in-window clicks
        (101, 2, T0, 20.0),                      # click exists but stale (>24h)
        (102, 3, T0, 30.0),                      # no click at all
    ]
    clicks = [
        (200, 1, TS(2024, 1, 2, 11, 0)),         # in window
        (201, 1, TS(2024, 1, 2, 9, 0)),          # in window
        (202, 1, TS(2024, 1, 2, 13, 0)),         # AFTER purchase -> excluded
        (203, 2, TS(2024, 1, 1, 11, 0)),         # 25h before -> excluded
    ]
    batch = clicks_before_purchase_join(
        spark.createDataFrame(purchases, p_schema),
        spark.createDataFrame(clicks, c_schema),
    )
    expected = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert expected == {(100, 200), (100, 201), (101, None), (102, None)}

    p_dir, c_dir = str(tmp_path / "p"), str(tmp_path / "c")
    # one file per write: maxFilesPerTrigger=1 replays files as separate
    # micro-batches, and out-of-order files would get watermark-dropped
    spark.createDataFrame(purchases, p_schema).coalesce(1).write.parquet(p_dir)
    spark.createDataFrame(clicks, c_schema).coalesce(1).write.parquet(c_dir)
    # a far-future click in a SECOND file: with maxFilesPerTrigger=1 it
    # lands in a later micro-batch and drags the watermark past
    # purchase_ts + 24h, flushing the outer-null rows
    # far-future sentinels in SECOND files on BOTH sides: the join's
    # eviction watermark is min(click wm, purchase wm), so both must pass
    # purchase_ts + lookback before the NULL rows can flush. The sentinel
    # purchase itself never flushes (nothing ever passes ITS horizon) and
    # stays out of both sides of the comparison.
    spark.createDataFrame(
        [(999, 99, TS(2024, 1, 5, 0, 0))], c_schema
    ).coalesce(1).write.mode("append").parquet(c_dir)
    spark.createDataFrame(
        [(998, 98, TS(2024, 1, 5, 0, 0), 0.0)], p_schema
    ).coalesce(1).write.mode("append").parquet(p_dir)
    ps = (
        spark.readStream.schema(p_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p_dir)
    )
    cs = (
        spark.readStream.schema(c_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_dir)
    )
    joined = clicks_before_purchase_join(ps, cs)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj").collect()
        if r.purchase_id != 998
    }
    assert got == expected, got


def test_ohlc_stream_matches_batch(spark, tmp_path):
    """Streaming tumbling-window OHLC (complete mode) == batch twin,
    including the min_by/max_by open/close selection across micro-batches
    within the same hour."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        ohlc_hourly_batch,
        ohlc_hourly_stream,
    )

    src = str(tmp_path / "src")
    rows1 = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 5.0),
        (2, TS(2024, 1, 1, 10, 30), 1, "click", 9.0),
        (3, TS(2024, 1, 1, 11, 5), 2, "view", 4.0),
    ]
    rows2 = [
        (4, TS(2024, 1, 1, 10, 45), 2, "click", 1.0),  # same 10:00 candle
        (5, TS(2024, 1, 1, 11, 40), 1, "view", 8.0),
    ]
    _events_df(spark, rows1).write.mode("overwrite").parquet(src)
    _events_df(spark, rows2).write.mode("append").parquet(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        ohlc_hourly_stream(stream)
        .writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_type, r.hour): (r.px_open, r.px_high, r.px_low, r.px_close, r.n_events)
        for r in spark.sql("select * from ohlc_stream").collect()
    }
    want = {
        (r.event_type, r.hour): (r.px_open, r.px_high, r.px_low, r.px_close, r.n_events)
        for r in ohlc_hourly_batch(_events_df(spark, rows1 + rows2)).collect()
    }
    assert got == want
    # the 10:00 click candle spans both micro-batches: open from batch 1,
    # close from batch 2
    assert got[("click", TS(2024, 1, 1, 10, 0))] == (5.0, 9.0, 1.0, 1.0, 3)


def test_ewma_stream_matches_batch(spark, tmp_path):
    """Stateful streaming EWMA == batch fold twin after draining two
    hour-ordered micro-batches; the second batch's hours prove the state
    (trailing hour/count arrays) carries across batches."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        ewma_hourly_batch,
        ewma_hourly_stateful,
    )

    src = str(tmp_path / "src")
    rows1 = [
        (1, TS(2024, 1, 1, 10, 0), 1, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 30), 1, "click", 1.0),
        (3, TS(2024, 1, 1, 11, 5), 1, "click", 1.0),
    ]
    rows2 = [
        (4, TS(2024, 1, 1, 12, 10), 1, "click", 1.0),
        (5, TS(2024, 1, 1, 12, 20), 1, "click", 1.0),
        (6, TS(2024, 1, 1, 12, 30), 1, "click", 1.0),
        (7, TS(2024, 1, 1, 13, 0), 1, "click", 1.0),
    ]
    # ONE file per logical batch: hour-ordered arrival is the operator's
    # documented contract, and a multi-file write would let the file source
    # interleave hours across micro-batches
    _events_df(spark, rows1).coalesce(1).write.mode("overwrite").parquet(src)
    _events_df(spark, rows2).coalesce(1).write.mode("append").parquet(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        ewma_hourly_stateful(stream)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("select * from ewma_stream").collect()
    # update mode re-emits per touched hour; keep the last emission per hour
    got = {}
    for r in emitted:
        got[(r.event_type, r.hour)] = (r.n_events, r.ewma)
    want = {
        (r.event_type, r.hour): (r.n_events, r.ewma)
        for r in ewma_hourly_batch(_events_df(spark, rows1 + rows2)).collect()
    }
    assert got == want
    # hand-check the fold: counts 2,1,3,1 -> ewma 2, 1.5, 2.25, 1.625
    assert got[("click", TS(2024, 1, 1, 13, 0))] == (1, 1.625)


def test_cms_stream_matches_batch(spark, tmp_path):
    """The streaming count-min sketch's cell table after draining all
    micro-batches equals the batch twin's — state is depth*width counters,
    so cross-batch accumulation is exact."""
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        cms_cells_batch,
        cms_cells_stream,
    )

    src = str(tmp_path / "src")
    rows1 = [
        (1, TS(2024, 1, 1, 10, 0), 7, "click", 1.0),
        (2, TS(2024, 1, 1, 10, 1), 7, "view", 1.0),
        (3, TS(2024, 1, 1, 10, 2), 9, "click", 1.0),
    ]
    rows2 = [
        (4, TS(2024, 1, 1, 10, 3), 7, "click", 1.0),
        (5, TS(2024, 1, 1, 10, 4), 11, "view", 1.0),
    ]
    _events_df(spark, rows1).write.mode("overwrite").parquet(src)
    _events_df(spark, rows2).write.mode("append").parquet(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        cms_cells_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.seed, r.bucket): r.n
        for r in spark.sql("select * from cms_stream").collect()
    }
    want = {
        (r.seed, r.bucket): r.n
        for r in cms_cells_batch(_events_df(spark, rows1 + rows2)).collect()
    }
    assert got == want
    # user 7 appeared 3x across micro-batches — its buckets must hold >= 3
    import hashlib

    for j in range(3):
        b = int(hashlib.md5(f"cms{j}7".encode()).hexdigest()[:8], 16) % 64
        assert got[(j, b)] >= 3


def test_streaming_mv_maintain_matches_batch(spark, tmp_path):
    """Streamed signed-delta folding == one-shot mv_apply_delta == full
    rebuild of the post-change base. maxFilesPerTrigger=1 forces multiple
    micro-batches, so the second fold proves state carry-over through the
    sink; the batch-id stamp makes replays no-ops."""
    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream,
    )

    keys, sums = ["g"], {"rev": "rev"}
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "id int, g string, rev double"
    )
    d1 = [(4, "a", 7.0, 1), (5, "c", 100.0, 1)]          # inserts
    d2 = [(3, "b", 5.0, -1), (6, "a", 1.0, 1)]           # empty b, grow a
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    spark.createDataFrame(d1, sch).write.mode("overwrite").parquet(src)
    spark.createDataFrame(d2, sch).write.mode("append").parquet(src)

    out = str(tmp_path / "mv_state")
    # seed the sink with the base view (batch -1 semantics: pre-stream)
    from pyspark.sql import functions as F
    from amazon_fresh_sql_data_engineering_spark.sources.sinks import atomic_swap_write

    atomic_swap_write(
        mv.mv_build(base, keys, sums).withColumn("__mv_last_batch", F.lit(-1)), out
    )
    stream = (
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    )
    run_mv_maintain_stream(stream, out, str(tmp_path / "ckpt"), keys, sums)

    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out).collect()
    }
    eff = base.filter(F.col("id") != 3).unionByName(
        spark.createDataFrame(d1 + d2, sch).filter(F.col("__op") == 1).drop("__op")
    )
    exp = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in mv.mv_build(eff, keys, sums).collect()
    }
    assert got == exp
    assert "b" not in got and got["c"] == (1, 100.0)

    # replay safety: re-running the drained stream with the SAME checkpoint
    # processes nothing; and manually re-folding the last batch id is a
    # no-op because the stamp skips it
    stream2 = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    run_mv_maintain_stream(stream2, out, str(tmp_path / "ckpt"), keys, sums)
    got2 = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out).collect()
    }
    assert got2 == exp


def test_streaming_mv_emptied_view_replay_is_idempotent(spark, tmp_path):
    """The unstamped corner: a fold that empties the view entirely leaves
    no stamp row, but replaying that same delta against the empty state
    drops every group again (module-doc algebra), so state stays right."""
    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import read_mv_state
    from amazon_fresh_sql_data_engineering_spark.sources.sinks import atomic_swap_write
    from pyspark.sql import functions as F

    keys, sums = ["g"], {"rev": "rev"}
    base = spark.createDataFrame([(1, "a", 10.0)], "id int, g string, rev double")
    delta = spark.createDataFrame(
        [(1, "a", 10.0, -1)], "id int, g string, rev double, __op int"
    )
    out = str(tmp_path / "mv_state")
    atomic_swap_write(
        mv.mv_build(base, keys, sums).withColumn("__mv_last_batch", F.lit(-1)), out
    )
    cur = read_mv_state(spark, out)
    emptied = mv.mv_apply_delta(cur, delta, keys, sums)
    atomic_swap_write(emptied.withColumn("__mv_last_batch", F.lit(0)), out)
    assert read_mv_state(spark, out).count() == 0
    # replay of batch 0 against the (stampless) empty state: still empty
    replay = mv.mv_apply_delta(
        mv.mv_build(delta.filter(F.lit(False)).drop("__op"), keys, sums),
        delta, keys, sums,
    )
    assert replay.count() == 0


def test_streaming_mv_owner_mismatch_raises_and_adopt_rehomes(spark, tmp_path):
    """A fresh checkpoint pointed at an existing stamped sink must FAIL
    LOUDLY (its batch ids restart at 0, so the replay guard would silently
    swallow the new source's first batches — ADVICE r7); adopt_mv_sink is
    the explicit re-home that makes folding legal again."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        adopt_mv_sink,
        read_mv_state,
        run_mv_maintain_stream,
    )

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src1 = str(tmp_path / "d1")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).write.parquet(src1)
    out = str(tmp_path / "mv_state")
    stream = spark.readStream.schema(sch).parquet(src1)
    run_mv_maintain_stream(stream, out, str(tmp_path / "ckptA"), keys, sums)
    assert {r["g"] for r in read_mv_state(spark, out).collect()} == {"a"}

    # a NEW source + NEW checkpoint against the same sink: refused
    src2 = str(tmp_path / "d2")
    spark.createDataFrame([(2, "b", 5.0, 1)], sch).write.parquet(src2)
    with pytest.raises(Exception, match="owned by checkpoint"):
        run_mv_maintain_stream(
            spark.readStream.schema(sch).parquet(src2),
            out,
            str(tmp_path / "ckptB"),
            keys,
            sums,
        )
    # state untouched by the refused fold
    assert {r["g"] for r in read_mv_state(spark, out).collect()} == {"a"}

    # explicit adoption: re-stamp to the new checkpoint, then the fold runs
    adopt_mv_sink(spark, out, str(tmp_path / "ckptB"))
    run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src2),
        out,
        str(tmp_path / "ckptB"),
        keys,
        sums,
    )
    got = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert got == {"a": (1, 10.0), "b": (1, 5.0)}


def _dir_snapshot(path):
    """{relative file path: bytes} for every data file under ``path``."""
    import os

    snap = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                snap[os.path.relpath(p, path)] = fh.read()
    return snap


def test_streaming_mv_partitioned_touched_buckets_only(spark, tmp_path):
    """The dynamic-partition-overwrite sink (VERDICT r7 item 4): streamed
    folding == batch rebuild, a fold touching one bucket leaves the other
    bucket's files BYTE-IDENTICAL, and a fold that empties a bucket clears
    its directory."""
    import os

    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream_partitioned,
    )

    keys, sums, nb = ["g"], {"rev": "rev"}, 8
    # pick two group values living in DIFFERENT hash buckets
    cand = ["a", "b", "c", "d", "e"]
    bks = {
        r["g"]: r["bk"]
        for r in spark.createDataFrame([(g,) for g in cand], "g string")
        .select("g", F.pmod(F.xxhash64("g"), F.lit(nb)).cast("int").alias("bk"))
        .collect()
    }
    g1 = cand[0]
    g2 = next(g for g in cand[1:] if bks[g] != bks[g1])
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        run_mv_maintain_stream_partitioned(
            spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
            out, ckpt, keys, sums, num_buckets=nb,
        )

    # batch 0: both groups -> creates both bucket partitions
    spark.createDataFrame(
        [(1, g1, 10.0, 1), (2, g1, 20.0, 1), (3, g2, 5.0, 1)], sch
    ).write.parquet(src)
    drain()
    state0 = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert state0 == {g1: (2, 30.0), g2: (1, 5.0)}
    g2_dir = os.path.join(out, f"__mv_bucket={bks[g2]}")
    snap_before = _dir_snapshot(g2_dir)
    assert snap_before, "expected data files in the untouched bucket"

    # batch 1: touches ONLY g1's bucket
    spark.createDataFrame([(4, g1, 7.0, 1)], sch).write.mode("append").parquet(src)
    drain()
    got = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    eff = spark.createDataFrame(
        [(1, g1, 10.0), (2, g1, 20.0), (3, g2, 5.0), (4, g1, 7.0)],
        "id int, g string, rev double",
    )
    exp = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in mv.mv_build(eff, keys, sums).collect()}
    assert got == exp
    # untouched bucket: exact same files, byte for byte
    assert _dir_snapshot(g2_dir) == snap_before

    # batch 2: empties g2 entirely -> its partition directory is cleared
    spark.createDataFrame([(3, g2, 5.0, -1)], sch).write.mode("append").parquet(src)
    drain()
    got2 = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert got2 == {g1: (3, 37.0)}
    assert not os.path.exists(g2_dir) or not _dir_snapshot(g2_dir)

    # re-draining the fully-drained stream is a no-op (per-bucket stamps)
    drain()
    got3 = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert got3 == got2


def test_streaming_mv_partitioned_adopt_rehomes(spark, tmp_path):
    """adopt_mv_sink also re-homes a BUCKET-PARTITIONED sink: the rewrite
    keeps the partition layout, and a new checkpoint's batch 0 folds."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        adopt_mv_sink,
        read_mv_state,
        run_mv_maintain_stream_partitioned,
    )

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src1 = str(tmp_path / "d1")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).write.parquet(src1)
    out = str(tmp_path / "mv_state")
    run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).parquet(src1),
        out, str(tmp_path / "ckptA"), keys, sums, num_buckets=4,
    )
    src2 = str(tmp_path / "d2")
    spark.createDataFrame([(2, "b", 5.0, 1)], sch).write.parquet(src2)
    with pytest.raises(Exception, match="owned by checkpoint"):
        run_mv_maintain_stream_partitioned(
            spark.readStream.schema(sch).parquet(src2),
            out, str(tmp_path / "ckptB"), keys, sums, num_buckets=4,
        )
    adopt_mv_sink(spark, out, str(tmp_path / "ckptB"))
    # layout preserved: still a __mv_bucket=* partitioned tree
    import os

    assert any(d.startswith("__mv_bucket=") for d in os.listdir(out))
    run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).parquet(src2),
        out, str(tmp_path / "ckptB"), keys, sums, num_buckets=4,
    )
    got = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert got == {"a": (1, 10.0), "b": (1, 5.0)}


def test_store_dedup_stream_accretes_and_matches_full_corpus(spark, sf_dir, tmp_path):
    """Continuous dedup ingest (streaming/dedup.py): draining the corpus
    batch-by-batch through accrete-then-probe emits exactly the pairs of
    the one-shot full-corpus run; a torn-batch replay (re-running the same
    batch's accrete+probe+publish) changes nothing; and a fresh checkpoint
    is refused until the explicit epoch-bumping adopt."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    # plant cross-batch near-dups: copies of early docs arriving later
    wave1 = docs.filter(F.col("doc_id") < 60)
    wave2 = docs.filter(F.col("doc_id") >= 60).unionByName(
        wave1.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    src = str(tmp_path / "arrivals")
    store = str(tmp_path / "mh_store")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    wave1.coalesce(1).write.parquet(src)
    wave2.coalesce(1).write.mode("append").parquet(src)

    D.bootstrap_minhash_store(spark, store, num_prefixes=8)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SD.run_store_dedup_stream(stream, store, ckpt, pairs_out, "doc_id", "text", 0.6)

    got = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in SD.read_dedup_pairs(spark, pairs_out).collect()
    }
    full = wave1.unionByName(wave2)
    exp = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_dedup_pairs(full, "doc_id", "text", threshold=0.6).collect()
    }
    assert got == exp and got  # planted copies guarantee non-trivial

    # torn-batch replay: re-run the LAST batch's three effects by hand
    # (accrete + probe + publish under the same ingest key) — dynamic
    # partition overwrite + max_ingest_exclusive make it a no-op
    _owner, epoch = SD._read_stream_meta(spark, store)
    last_key = epoch * SD._EPOCH_SPAN + 1  # second micro-batch
    feats = D.minhash_features(
        wave2, "doc_id", "text", 64, 3, 42
    )
    D.append_minhash_store(feats, store, last_key)
    replay = D.minhash_store_probe(
        wave2, store, "doc_id", "text", threshold=0.6,
        batch_features=feats, max_ingest_exclusive=last_key,
    )
    (
        replay.withColumn("__ingest", F.lit(last_key).cast("long"))
        .repartition("__ingest")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__ingest")
        .parquet(pairs_out)
    )
    got2 = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in SD.read_dedup_pairs(spark, pairs_out).collect()
    }
    assert got2 == exp

    # fresh checkpoint against the same store: refused, then adoptable
    more = docs.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    )
    src2 = str(tmp_path / "arrivals2")
    more.coalesce(1).write.parquet(src2)
    with pytest.raises(Exception, match="owned by checkpoint"):
        SD.run_store_dedup_stream(
            spark.readStream.schema("doc_id long, text string").parquet(src2),
            store, str(tmp_path / "ckptB"), pairs_out, "doc_id", "text", 0.6,
        )
    new_epoch = SD.adopt_minhash_store_stream(spark, store, str(tmp_path / "ckptB"))
    assert new_epoch == epoch + 1
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src2),
        store, str(tmp_path / "ckptB"), pairs_out, "doc_id", "text", 0.6,
    )
    got3 = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in SD.read_dedup_pairs(spark, pairs_out).collect()
    }
    # prior epochs stayed probe-visible: the +2M copies pair with history
    full3 = full.unionByName(more)
    exp3 = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_dedup_pairs(full3, "doc_id", "text", threshold=0.6).collect()
    }
    assert got3 == exp3 and len(got3) > len(exp)


def test_streaming_mv_partitioned_recovers_torn_fold(spark, tmp_path):
    """Per-bucket two-phase swap (self-review r8): a crash between the
    backup rename and the commit leaves a bucket's directory missing —
    recovery must restore it from the hidden backup (NOT re-fold it from
    empty, which silently loses accumulated state), and an obsolete
    backup next to a committed bucket must be dropped."""
    import os
    import shutil

    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream_partitioned,
    )

    keys, sums, nb = ["g"], {"rev": "rev"}, 4
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 5.0, 1)], sch
    ).write.parquet(src)
    run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        num_buckets=nb,
    )
    buckets = [d for d in os.listdir(out) if d.startswith("__mv_bucket=")]
    assert buckets
    # simulate the torn window: a fold renamed bucket B aside and died
    # before committing its replacement
    torn = buckets[0]
    os.rename(os.path.join(out, torn), os.path.join(out, f".mvold-{torn}"))
    # and an OBSOLETE backup: a committed bucket whose cleanup died
    if len(buckets) > 1:
        live = buckets[1]
        shutil.copytree(
            os.path.join(out, live), os.path.join(out, f".mvold-{live}")
        )
    # next batch (touching nothing in the torn bucket necessarily) heals
    spark.createDataFrame([(3, "a", 7.0, 1)], sch).write.mode("append").parquet(src)
    run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        num_buckets=nb,
    )
    got = {r["g"]: (r["__mv_cnt"], float(r["rev"])) for r in read_mv_state(spark, out).collect()}
    assert got == {"a": (2, 17.0), "b": (1, 5.0)}
    assert not any(d.startswith(".mvold-") for d in os.listdir(out))


def test_store_dedup_stream_torn_meta_refused_then_adopted(spark, sf_dir, tmp_path):
    """A missing stream record over a store WITH history (the torn
    delete-then-write window of the record's overwrite) must refuse to
    stamp epoch 0 — that would overwrite live ingest keys — and
    adopt_minhash_store_stream must recover by deriving the epoch from
    the data. An EMPTY first micro-batch must not wedge the stream."""
    import shutil

    import pytest

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 30)
    )
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    D.bootstrap_minhash_store(spark, store, num_prefixes=8)

    # one growing source under ONE checkpoint: the first drained batch is
    # EMPTY (must not wedge the stream on the missing features dir), the
    # second carries the docs
    src1 = str(tmp_path / "src1")
    ck1 = str(tmp_path / "ck1")
    docs.filter(F.lit(False)).coalesce(1).write.parquet(src1)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src1),
        store, ck1, pairs_out, "doc_id", "text", 0.6,
    )
    docs.coalesce(1).write.mode("append").parquet(src1)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src1),
        store, ck1, pairs_out, "doc_id", "text", 0.6,
    )
    # tear the stream record (the overwrite's delete-then-write window)
    shutil.rmtree(f"{store}/stream")
    src2 = str(tmp_path / "src2")
    docs.withColumn("doc_id", F.col("doc_id") + 500_000).coalesce(1).write.parquet(src2)
    with pytest.raises(Exception, match="stream record is missing"):
        SD.run_store_dedup_stream(
            spark.readStream.schema("doc_id long, text string").parquet(src2),
            store, str(tmp_path / "ck2"), pairs_out, "doc_id", "text", 0.6,
        )
    new_epoch = SD.adopt_minhash_store_stream(spark, store, str(tmp_path / "ck2"))
    assert new_epoch >= 1  # derived from max ingest key, safely past epoch 0
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src2),
        store, str(tmp_path / "ck2"), pairs_out, "doc_id", "text", 0.6,
    )
    got = {(r.id_a, r.id_b) for r in SD.read_dedup_pairs(spark, pairs_out).collect()}
    # every +500k copy pairs with its original in prior-epoch history
    base_ids = {r.doc_id for r in docs.collect()}
    assert all((i, i + 500_000) in got for i in base_ids)


def test_streaming_mv_partitioned_seeded_ownerless_adopts_whole_tree(spark, tmp_path):
    """ADVICE r8 (medium): the first fold over an operator-seeded,
    owner-less BUCKET-PARTITIONED sink must restamp the WHOLE tree — a
    partial fold would stamp __mv_owner only on the touched buckets,
    accreting mixed per-file schemas where later plain reads
    nondeterministically drop the column (ownership guard silently off)
    or surface NULL owners that a first()-based check spuriously trips
    on. After the fold: every row of a PLAIN (non-mergeSchema) read
    carries a non-null owner, the fold's arithmetic is right, and a
    foreign checkpoint is refused even when it touches only buckets the
    fold never rewrote."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream_partitioned,
    )

    keys, sums, nb = ["g"], {"rev": "rev"}, 8
    # two groups in different buckets: the fold will touch only one
    cand = ["a", "b", "c", "d", "e"]
    bks = {
        r["g"]: r["bk"]
        for r in spark.createDataFrame([(g,) for g in cand], "g string")
        .select("g", F.pmod(F.xxhash64("g"), F.lit(nb)).cast("int").alias("bk"))
        .collect()
    }
    g1 = cand[0]
    g2 = next(g for g in cand[1:] if bks[g] != bks[g1])
    base = spark.createDataFrame(
        [(1, g1, 10.0), (2, g2, 5.0)], "id int, g string, rev double"
    )
    out = str(tmp_path / "mv_state")
    # operator-seeded sink: stamped, bucket-partitioned, NO owner column
    (
        mv.mv_build(base, keys, sums)
        .withColumn("__mv_bucket", F.pmod(F.xxhash64("g"), F.lit(nb)).cast("int"))
        .withColumn("__mv_last_batch", F.lit(-1))
        .write.partitionBy("__mv_bucket")
        .parquet(out)
    )
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    spark.createDataFrame([(3, g1, 7.0, 1)], sch).write.parquet(src)
    run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).parquet(src),
        out, str(tmp_path / "ckptA"), keys, sums, num_buckets=nb,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out).collect()
    }
    assert got == {g1: (2, 17.0), g2: (1, 5.0)}
    # uniform schema: a PLAIN read must see the owner column with zero
    # NULLs — including on g2's bucket, which the fold never rewrote
    plain = spark.read.parquet(out)
    assert "__mv_owner" in plain.columns
    assert plain.filter(F.col("__mv_owner").isNull()).count() == 0
    assert plain.select("__mv_owner").distinct().count() == 1
    # the adopted ownership must guard ALL buckets: a foreign checkpoint
    # folding into the never-rewritten bucket is refused
    src2 = str(tmp_path / "deltas2")
    spark.createDataFrame([(4, g2, 1.0, 1)], sch).write.parquet(src2)
    with pytest.raises(Exception, match="owned by checkpoint"):
        run_mv_maintain_stream_partitioned(
            spark.readStream.schema(sch).parquet(src2),
            out, str(tmp_path / "ckptB"), keys, sums, num_buckets=nb,
        )


def test_streaming_mv_fs_failures_raise(spark, tmp_path):
    """ADVICE r8 (low): Hadoop FileSystem.rename signals failure by
    returning false — the two-phase swap must raise (fail the micro-batch
    so it replays), not silently continue into a re-fold-from-empty. And
    the JVM-gateway helper must fail LOUDLY when the session exposes no
    gateway (Spark Connect — VERDICT r8 item 7)."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        _fs,
        _fs_delete,
        _fs_rename,
    )

    # the helper contract, against the returns-false surface itself (the
    # local FS maps most failures to exceptions — already loud — so the
    # false path is exercised with a stub implementing Hadoop's signature)
    class _FalseFS:
        def __init__(self, exists: bool):
            self._exists = exists

        def rename(self, s, d):
            return False

        def delete(self, p, recursive):
            return False

        def exists(self, p):
            return self._exists

    with pytest.raises(IOError, match="rename .* returned false"):
        _fs_rename(_FalseFS(True), "src", "dst")
    with pytest.raises(IOError, match="delete .* returned false"):
        _fs_delete(_FalseFS(True), "p")  # false AND still present: failed
    _FalseFS(False).exists("p")
    _fs_delete(_FalseFS(False), "p")  # false but gone: benign TOCTOU, no raise

    # and the real gateway path stays callable on a classic session
    fs, root, jvm = _fs(spark, str(tmp_path))
    missing = jvm.org.apache.hadoop.fs.Path(str(tmp_path / "no_such_dir"))
    _fs_delete(fs, missing)  # absent path: no raise

    class _NoGateway:
        pass

    with pytest.raises(NotImplementedError, match="JVM gateway"):
        _fs(_NoGateway(), str(tmp_path))


def test_streaming_mv_partitioned_live_cadence(spark, tmp_path):
    """VERDICT r8 item 3: the partitioned MV sink under a REAL long-running
    micro-batch cadence (processingTime trigger, query kept alive across
    arrivals) instead of availableNow drains. Batches are dropped into the
    source while the query runs — with maxFilesPerTrigger=1 several queue
    up, so batch N+1 is admitted while N's fold commits on the live query.
    Final state must equal the batch rebuild and the per-bucket stamps
    must show multiple distinct live micro-batches folded."""
    from amazon_fresh_sql_data_engineering_spark.operators import mv
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream_partitioned,
    )

    keys, sums, nb = ["g"], {"rev": "rev"}, 8
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    out = str(tmp_path / "mv_state")
    rows = [
        [(1, "a", 10.0, 1), (2, "b", 5.0, 1)],
        [(3, "a", 7.0, 1), (4, "c", 2.0, 1)],
        [(2, "b", 5.0, -1), (5, "a", 1.0, 1)],
        [(6, "d", 4.0, 1)],
    ]
    spark.createDataFrame(rows[0], sch).coalesce(1).write.parquet(src)
    q = run_mv_maintain_stream_partitioned(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
        out, str(tmp_path / "ckpt"), keys, sums, num_buckets=nb,
        trigger={"processingTime": "50 milliseconds"}, block=False,
    )
    try:
        q.processAllAvailable()
        # drop the remaining batches while the query is LIVE; one file per
        # micro-batch means several folds run back-to-back on this query
        for batch in rows[1:]:
            spark.createDataFrame(batch, sch).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        q.processAllAvailable()
        assert q.isActive  # still the same live query, not a drained one
    finally:
        q.stop()
        q.awaitTermination()
    eff = spark.createDataFrame(
        [(1, "a", 10.0), (3, "a", 7.0), (4, "c", 2.0), (5, "a", 1.0), (6, "d", 4.0)],
        "id int, g string, rev double",
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out).collect()
    }
    exp = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in mv.mv_build(eff, keys, sums).collect()
    }
    assert got == exp and "b" not in got
    # per-bucket stamps: multiple distinct micro-batch ids folded live
    stamps = {
        r[0] for r in spark.read.parquet(out).select("__mv_last_batch").distinct().collect()
    }
    assert len(stamps) >= 2 and max(stamps) >= 2


def test_store_dedup_stream_live_cadence_with_autocompaction(spark, sf_dir, tmp_path):
    """VERDICT r8 items 3+4: the dedup ingest loop under a live
    processingTime cadence with IN-LOOP auto-compaction (compact_every=2).
    Emitted pairs must equal the one-shot oracle over everything involving
    a streamed doc (compaction is probe-invariant), and the store's file
    count must DROP below its pre-compaction level even as more data
    accretes — the growth bound the in-loop compaction exists for.

    r10 trim (VERDICT r9 item 7): history starts from the staged seeded
    append store (queries_ext.staged_append_store_copy — the whole corpus
    as ingest key 0) instead of bootstrapping and live-draining it, so the
    live phase pays 3 micro-batches instead of 5; every semantic the test
    locks (live cadence with queued single-file batches against ONE active
    query, in-loop compaction with unchanged pairs, bounded file growth)
    is untouched."""
    import glob
    import os

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        staged_append_store_copy,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # 3 live waves of NEW docs, each a copy of seed history (arrive later,
    # must pair with it); waves 1 and 3 copy the SAME originals so
    # cross-wave new-new pairs exercise batch-vs-batch history too
    waves = [
        docs.filter((F.col("doc_id") % 10) == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        ),
        docs.filter((F.col("doc_id") % 10) == 3).withColumn(
            "doc_id", F.col("doc_id") + 2_000_000
        ),
        docs.filter((F.col("doc_id") % 10) == 0).withColumn(
            "doc_id", F.col("doc_id") + 3_000_000
        ),
    ]
    src = str(tmp_path / "arrivals")
    store = staged_append_store_copy(spark, sf_dir, str(tmp_path / "mh_store"))
    ckpt = str(tmp_path / "ckpt")
    SD.adopt_minhash_store_stream(spark, store, ckpt)

    def _nfiles() -> int:
        return len(
            glob.glob(os.path.join(store, "index", "**", "*.parquet"), recursive=True)
        ) + len(
            glob.glob(os.path.join(store, "features", "**", "*.parquet"), recursive=True)
        )

    waves[0].coalesce(1).write.parquet(src)
    q = SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        store, ckpt, str(tmp_path / "pairs"), "doc_id", "text", 0.6,
        compact_every=2,
        trigger={"processingTime": "50 milliseconds"}, block=False,
    )
    try:
        q.processAllAvailable()
        waves[1].coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        files_before_compaction = _nfiles()  # seed + batches 0,1 accreted
        waves[2].coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # batch 2 compacts {seed, 0, 1} first
        assert q.isActive
    finally:
        q.stop()
        q.awaitTermination()
    got = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in SD.read_dedup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    full = docs
    for w in waves:
        full = full.unionByName(w)
    # the loop emits every pair involving a STREAMED doc (within-seed
    # pairs predate the stream); streamed ids all sit above 1M
    exp = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_dedup_pairs(full, "doc_id", "text", threshold=0.6).collect()
        if r.id_a >= 1_000_000 or r.id_b >= 1_000_000
    }
    assert got == exp and got
    # growth bound: batch 2's compaction folded {seed, batch 0, batch 1}
    # into one leaf set per directory, so the store ends with FEWER files
    # than before the fold despite having accreted strictly more data
    assert _nfiles() < files_before_compaction


def test_store_dedup_stream_from_staged_seed(spark, sf_dir, tmp_path):
    """VERDICT r8 item 8: the ingest loop's seeded-store fixture lives
    behind the per-process staging cache — copy it, adopt a fresh
    checkpoint (epoch bump past the seed's ingest keys), drain one wave of
    planted copies, and every copy pairs with its original in the SEEDED
    history (never re-shingled); cache reuse returns the same directory."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        _corpus_append_store,
        staged_append_store_copy,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    store = staged_append_store_copy(spark, sf_dir, str(tmp_path / "store"))
    # once-per-process: the second lookup is the SAME staged directory
    assert _corpus_append_store(spark, sf_dir) == _corpus_append_store(spark, sf_dir)
    ckpt = str(tmp_path / "ckpt")
    epoch = SD.adopt_minhash_store_stream(spark, store, ckpt)
    assert epoch >= 1  # derived from the seed's keys: cannot collide
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    wave = docs.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    src = str(tmp_path / "src")
    wave.coalesce(1).write.parquet(src)
    pairs_out = str(tmp_path / "pairs")
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, ckpt, pairs_out, "doc_id", "text", 0.6,
    )
    got = {(r.id_a, r.id_b) for r in SD.read_dedup_pairs(spark, pairs_out).collect()}
    ids = {r.doc_id for r in wave.select("doc_id").collect()}
    assert ids and all((i - 1_000_000, i) in got for i in ids)


def test_streaming_mv_heals_torn_swap_instead_of_refolding_from_empty(
    spark, tmp_path
):
    """self-review r9: the flat MV sink's per-batch publish is an
    atomic_swap_write, and a crash between its two renames leaves the
    sink directory MISSING with the state in a __old__ sibling. The next
    micro-batch used to read sink-absent => 'first-ever batch' and fold
    into EMPTY state — silent loss of every published aggregate. The
    recovery must restore the sibling so the fold carries prior state."""
    import os

    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream,
    )

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).coalesce(1).write.parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums
    )
    # simulate the torn swap window: final renamed aside, new never landed
    os.rename(out, f"{out}.__old__cafe01")
    spark.createDataFrame([(2, "b", 5.0, 1)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out).collect()
    }
    # both groups survive: 'a' from the healed prior state, 'b' from the batch
    assert got == {"a": (1, 10.0), "b": (1, 5.0)}


def test_cdc_stream_heals_torn_swap(spark, tmp_path):
    """Same torn-swap window for the CDC compacted sink: prior keys must
    survive a crash between the swap's renames."""
    import os

    from amazon_fresh_sql_data_engineering_spark.streaming.cdc import (
        run_cdc_apply_stream,
    )

    sch = "k int, v string, op string, seq long"
    src = str(tmp_path / "log")
    out = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "x", "U", 1)], sch).coalesce(1).write.parquet(src)
    run_cdc_apply_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, ["k"], "seq"
    )
    os.rename(out, f"{out}.__old__cafe02")
    spark.createDataFrame([(2, "y", "U", 2)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_cdc_apply_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, ["k"], "seq"
    )
    ks = {r["k"] for r in spark.read.parquet(out).collect()}
    assert ks == {1, 2}  # key 1 healed from the sibling, key 2 folded


def test_store_dedup_stream_heals_torn_features_swap(spark, sf_dir, tmp_path):
    """ADVICE r9 (medium): compact_minhash_store's features swap can crash
    between its two renames, leaving features/ MISSING with the ONLY copy
    of history in features.__old__*. The ingest loop's gates all probe
    features-exists, so without an unconditional heal the next batch would
    (a) skip compaction and its internal heal, (b) recreate features/ with
    just itself, and (c) let a LATER compaction delete the backup as
    obsolete — permanent silent loss. The loop must heal FIRST: history
    survives and cross-history pairs are still emitted."""
    import os

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 25)
    )
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    D.bootstrap_minhash_store(spark, store, num_prefixes=8)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    docs.coalesce(1).write.parquet(src)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        store, ckpt, pairs_out, "doc_id", "text", 0.6,
    )
    # simulate the torn compaction: features/ renamed aside, replacement
    # never landed (the exact window between atomic_swap_write's renames)
    os.rename(f"{store}/features", f"{store}/features.__old__cafe03")
    # next batch: near-duplicates of the history that now lives only in
    # the backup; compact_every=1 also routes through the compaction gate
    docs.withColumn("doc_id", F.col("doc_id") + 500_000).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        store, ckpt, pairs_out, "doc_id", "text", 0.6, compact_every=1,
    )
    assert not os.path.exists(f"{store}/features.__old__cafe03")
    got = {(r.id_a, r.id_b) for r in SD.read_dedup_pairs(spark, pairs_out).collect()}
    base_ids = {r.doc_id for r in docs.collect()}
    missing = [i for i in base_ids if (i, i + 500_000) not in got]
    assert not missing, f"history lost for {missing[:5]}"


def test_streaming_mv_pointer_publish_matches_batch(spark, tmp_path):
    """VERDICT r9 item 3: the flat MV sink parameterized over the
    object-store-safe POINTER publish primitive — state lives in immutable
    data/v=N snapshots behind one _LATEST pointer, no directory rename
    ever touches the live path, superseded snapshots are pruned, and the
    folded result is identical to the swap-published sink's."""
    import os

    from amazon_fresh_sql_data_engineering_spark.sources.sinks import (
        POINTER_PUBLISH,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream,
    )

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(1, "a", 10.0, 1), (2, "b", 5.0, 1)]
    rows2 = [(3, "a", 2.0, 1), (4, "b", 5.0, -1)]
    spark.createDataFrame(rows1, sch).coalesce(1).write.parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
        out, ckpt, keys, sums, publish=POINTER_PUBLISH,
    )
    spark.createDataFrame(rows2, sch).coalesce(1).write.mode("append").parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
        out, ckpt, keys, sums, publish=POINTER_PUBLISH,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out, publish=POINTER_PUBLISH).collect()
    }
    assert got == {"a": (2, 12.0), "b": (0, 0.0)} or got == {"a": (2, 12.0)}
    # layout: pointer + exactly one live snapshot, zero swap siblings
    assert os.path.exists(os.path.join(out, "_LATEST"))
    snaps = os.listdir(os.path.join(out, "data"))
    assert len(snaps) == 1, snaps
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if "__old__" in d or "__tmp__" in d]


def test_streaming_mv_pointer_publish_torn_write_keeps_old_state(spark, tmp_path):
    """The pointer primitive's crash window: a batch dies AFTER fully
    materializing its snapshot directory but BEFORE the pointer flip. The
    OLD state must stay published (read_or_none returns it), the orphan
    must be pruned by the next batch's heal, and the replayed fold must
    converge to the correct state — the pointer analog of the torn-swap
    tests."""
    import os
    import shutil

    from amazon_fresh_sql_data_engineering_spark.sources.sinks import (
        POINTER_PUBLISH,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming.mv import (
        read_mv_state,
        run_mv_maintain_stream,
    )

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).coalesce(1).write.parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        publish=POINTER_PUBLISH,
    )
    # simulate the torn window: a fully-written but never-published
    # snapshot (poisoned content so a wrong restore would be caught)
    shutil.copytree(os.path.join(out, "data", "v=1"), os.path.join(out, "data", "v=2"))
    before = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out, publish=POINTER_PUBLISH).collect()
    }
    assert before == {"a": (1, 10.0)}  # old state still the published one
    spark.createDataFrame([(2, "b", 5.0, 1)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        publish=POINTER_PUBLISH,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in read_mv_state(spark, out, publish=POINTER_PUBLISH).collect()
    }
    assert got == {"a": (1, 10.0), "b": (1, 5.0)}
    assert len(os.listdir(os.path.join(out, "data"))) == 1  # orphan pruned


def test_cdc_stream_pointer_publish_matches_swap(spark, tmp_path):
    """CDC sink under both publish primitives: identical current state."""
    from amazon_fresh_sql_data_engineering_spark.sources.sinks import (
        POINTER_PUBLISH,
    )
    from amazon_fresh_sql_data_engineering_spark.streaming.cdc import (
        read_current_state,
        run_cdc_apply_stream,
    )

    sch = "k int, v string, op string, seq long"
    rows = [(1, "x", "U", 1), (2, "y", "U", 2), (1, "x2", "U", 3), (2, None, "D", 4)]
    src = str(tmp_path / "log")
    spark.createDataFrame(rows, sch).coalesce(1).write.parquet(src)
    states = {}
    for name, pub in [("swap", None), ("pointer", POINTER_PUBLISH)]:
        out = str(tmp_path / f"state_{name}")
        kw = {"publish": pub} if pub is not None else {}
        run_cdc_apply_stream(
            spark.readStream.schema(sch).parquet(src),
            out, str(tmp_path / f"ckpt_{name}"), ["k"], "seq", **kw,
        )
        reader_kw = {"publish": pub} if pub is not None else {}
        states[name] = {
            (r["k"], r["v"])
            for r in read_current_state(spark, out, **reader_kw).collect()
        }
    assert states["swap"] == states["pointer"] == {(1, "x2")}


def test_flat_mv_sink_needs_no_fs_gateway(spark, tmp_path, monkeypatch):
    """VERDICT r9 item 5 (Connect portability): the FLAT MV sink's fold
    and recovery are pure DataFrame + local-os operations — it must run
    end-to-end with the JVM-gateway helper stubbed to the Spark Connect
    failure mode, while the partitioned sink (whose per-bucket two-phase
    swap genuinely needs filesystem renames) keeps failing loudly."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    def _no_gateway(spark, path):
        raise NotImplementedError("simulated Spark Connect: no JVM gateway")

    monkeypatch.setattr(MV, "_fs", _no_gateway)
    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).coalesce(1).write.parquet(src)
    MV.run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src),
        out, str(tmp_path / "ckpt"), keys, sums,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in MV.read_mv_state(spark, out).collect()
    }
    assert got == {"a": (1, 10.0)}
    # the partitioned sink still fails loudly under the same stub (the
    # NotImplementedError surfaces wrapped in a StreamingQueryException)
    with pytest.raises(Exception, match="no JVM gateway"):
        MV.run_mv_maintain_stream_partitioned(
            spark.readStream.schema(sch).parquet(src),
            str(tmp_path / "mv_part"), str(tmp_path / "ckpt2"), keys, sums,
            num_buckets=4,
        )


def test_streaming_mv_partitioned_mvcc_matches_batch_untouched_byte_identical(
    spark, tmp_path, monkeypatch
):
    """Round-10 depth: the per-bucket MVCC partitioned sink. Folded result
    must equal the batch recompute; an UNTOUCHED bucket's live snapshot
    directory must be byte-identical across a fold (the O(touched)
    claim); and the whole loop must run with the JVM-gateway helper
    stubbed to the Connect failure mode — MVCC needs no filesystem
    renames of live data, which is also what makes it the object-store
    form."""
    import glob
    import os

    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    def _no_gateway(spark, path):
        raise NotImplementedError("simulated Spark Connect: no JVM gateway")

    monkeypatch.setattr(MV, "_fs", _no_gateway)
    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    # group values chosen so batch 2 touches ONLY g2's bucket
    rows1 = [(1, "g1", 10.0, 1), (2, "g2", 5.0, 1), (3, "g3", 7.0, 1)]
    rows2 = [(4, "g2", 2.5, 1)]
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows1, sch).coalesce(1).write.parquet(src)
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
        out, ckpt, keys, sums, num_buckets=16,
    )

    def snap(b):
        bdir = MV._bp_dir(out, b)
        v = MV._bp_version(bdir)
        return {
            os.path.basename(p): os.path.getsize(p)
            for p in glob.glob(f"{bdir}/data/v={v}/part-*")
        }, v

    from amazon_fresh_sql_data_engineering_spark.streaming.mv import _bucket_col

    b_of = {
        r["g"]: r["b"]
        for r in spark.createDataFrame([("g1",), ("g2",), ("g3",)], "g string")
        .withColumn("b", _bucket_col(keys, 16))
        .collect()
    }
    untouched = [b for g, b in b_of.items() if g != "g2" and b != b_of["g2"]]
    assert untouched  # g1/g3 must not share g2's bucket for the check to bite
    before = {b: snap(b) for b in untouched}
    spark.createDataFrame(rows2, sch).coalesce(1).write.mode("append").parquet(src)
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
        out, ckpt, keys, sums, num_buckets=16,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in MV.read_mv_state_mvcc(spark, out).collect()
    }
    assert got == {"g1": (1, 10.0), "g2": (2, 7.5), "g3": (1, 7.0)}
    # untouched buckets: same snapshot version, same files, same bytes
    for b in untouched:
        assert snap(b) == before[b]


def test_streaming_mv_partitioned_mvcc_heals_and_converges(spark, tmp_path):
    """MVCC crash windows are garbage, never loss: a staged-but-never-
    published snapshot (crash between the staging move and the pointer
    flip) is pruned by the next batch's heal while the OLD snapshot stays
    live; a fold that empties a bucket publishes a schema-bearing 0-row
    snapshot behind the same atomic flip; ownership and cross-layout
    misuse fail loudly."""
    import os
    import shutil

    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a", 10.0, 1), (2, "b", 4.0, 1)], sch).coalesce(
        1
    ).write.parquet(src)
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        num_buckets=8,
    )
    # simulate the torn window: an orphan NEWER snapshot exists (staging
    # move done, pointer flip never happened) with poisoned content
    buckets = MV._bp_buckets(out)
    bdir = MV._bp_dir(out, buckets[0])
    v = MV._bp_version(bdir)
    shutil.copytree(f"{bdir}/data/v={v}", f"{bdir}/data/v={v + 1}")
    # old state is still what reads resolve
    n0 = MV.read_mv_state_mvcc(spark, out).count()
    assert n0 == 2
    # next batch heals the orphan and folds normally; 'b' is emptied
    spark.createDataFrame([(3, "b", 4.0, -1)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
        num_buckets=8,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in MV.read_mv_state_mvcc(spark, out).collect()
    }
    assert got == {"a": (1, 10.0)}  # b emptied, a intact
    assert not os.path.exists(f"{bdir}/data/v={v + 1}") or MV._bp_version(
        bdir
    ) == v + 1  # orphan either pruned or legitimately superseded
    # each bucket holds exactly ONE snapshot (vacuum on publish)
    for b in MV._bp_buckets(out):
        data = f"{MV._bp_dir(out, b)}/data"
        assert len(os.listdir(data)) == 1, (b, os.listdir(data))
    # foreign checkpoint refused
    with pytest.raises(Exception, match="owned by checkpoint"):
        MV.run_mv_maintain_stream_partitioned_mvcc(
            spark.readStream.schema(sch).parquet(src),
            out, str(tmp_path / "ckpt2"), keys, sums, num_buckets=8,
        )
    # cross-layout misuse refused: mvcc maintainer pointed at a swap sink
    flat = str(tmp_path / "flat_sink")
    MV.run_mv_maintain_stream(
        spark.readStream.schema(sch).parquet(src),
        flat, str(tmp_path / "ckpt3"), keys, sums,
    )
    with pytest.raises(Exception, match="flat SWAP sink"):
        MV.run_mv_maintain_stream_partitioned_mvcc(
            spark.readStream.schema(sch).parquet(src),
            flat, str(tmp_path / "ckpt4"), keys, sums, num_buckets=8,
        )


def test_streaming_mv_partitioned_mvcc_adopt_rehomes(spark, tmp_path):
    """adopt_mv_sink_mvcc: a fresh checkpoint over an existing mvcc sink
    is refused until the operator explicitly re-homes it; adoption
    restamps every bucket behind the usual atomic flips and the new
    stream folds on top."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    keys, sums = ["g"], {"rev": "rev"}
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "d1")
    out = str(tmp_path / "mv_state")
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).coalesce(1).write.parquet(src)
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).parquet(src),
        out, str(tmp_path / "ck1"), keys, sums, num_buckets=8,
    )
    src2 = str(tmp_path / "d2")
    spark.createDataFrame([(2, "b", 5.0, 1)], sch).coalesce(1).write.parquet(src2)
    with pytest.raises(Exception, match="owned by checkpoint"):
        MV.run_mv_maintain_stream_partitioned_mvcc(
            spark.readStream.schema(sch).parquet(src2),
            out, str(tmp_path / "ck2"), keys, sums, num_buckets=8,
        )
    MV.adopt_mv_sink_mvcc(spark, out, str(tmp_path / "ck2"))
    MV.run_mv_maintain_stream_partitioned_mvcc(
        spark.readStream.schema(sch).parquet(src2),
        out, str(tmp_path / "ck2"), keys, sums, num_buckets=8,
    )
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in MV.read_mv_state_mvcc(spark, out).collect()
    }
    assert got == {"a": (1, 10.0), "b": (1, 5.0)}


def test_store_dedup_stream_pointer_publish_no_gateway(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r10 item 2: the minhash store re-based on the generation-
    pointer publish — the last rename-dependent publish on the object-
    store path retired. The ENTIRE ingest loop (bootstrap, accrete, probe,
    IN-LOOP compaction, pair publish) must run with the JVM-gateway helper
    stubbed to the Spark Connect failure mode, emit exactly the one-shot
    oracle's pairs, and leave the store on a single advanced generation
    (compaction folded + vacuumed through one pointer flip)."""
    import os

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.sources import versioned as V
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD
    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    def _no_gateway(spark, path):
        raise NotImplementedError("simulated Spark Connect: no JVM gateway")

    monkeypatch.setattr(MV, "_fs", _no_gateway)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 80)
    )
    wave1 = docs.filter(F.col("doc_id") < 40)
    wave2 = docs.filter(F.col("doc_id") >= 40)
    # wave3 plants cross-batch near-dups of wave1 — probed AFTER the
    # in-loop compaction folded wave1's ingest partition, so a green
    # result certifies compaction probe-invariance under the pointer mode
    wave3 = wave1.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    src = str(tmp_path / "arrivals")
    store = str(tmp_path / "mh_store")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    D.bootstrap_minhash_store(spark, store, num_prefixes=8, publish="pointer")
    root = f"{store}/store"
    assert V.current_version(root) == 1

    def _drain():
        SD.run_store_dedup_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            store, ckpt, pairs_out, "doc_id", "text", 0.6, compact_every=2,
        )

    wave1.coalesce(1).write.parquet(src)
    _drain()  # batch 0
    wave2.coalesce(1).write.mode("append").parquet(src)
    _drain()  # batch 1
    wave3.coalesce(1).write.mode("append").parquet(src)
    _drain()  # batch 2: compacts ingests {0,1} first, then accretes+probes

    got = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in SD.read_dedup_pairs(spark, pairs_out).collect()
    }
    full = wave1.unionByName(wave2).unionByName(wave3)
    exp = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_dedup_pairs(full, "doc_id", "text", threshold=0.6).collect()
    }
    assert got == exp and got
    # the in-loop compaction published generation 2 with ONE pointer flip
    # and vacuumed generation 1; batch 2's accretion then landed INSIDE
    # the new generation
    cur = V.current_version(root)
    assert cur >= 2
    assert V.list_versions(root) == [cur]
    feats_dir, idx_dir = D._store_trees(store)
    assert feats_dir.startswith(f"{root}/data/v={cur}")
    assert os.path.isdir(feats_dir) and os.path.isdir(idx_dir)
    # nothing at the legacy swap locations
    assert not os.path.exists(f"{store}/features")
    assert not os.path.exists(f"{store}/index")


def test_store_pointer_heals_torn_compaction_generation(spark, sf_dir, tmp_path):
    """Pointer-mode crash algebra: a compaction that died BEFORE its
    pointer flip leaves a partial unpointed generation — never state.
    Every consumer entry point (adopt, the ingest loop, compaction
    itself) must prune it and read the still-published generation; the
    replayed compaction then lands on a fresh generation number. History
    must survive throughout (the torn-features silent-loss scenario of
    ADVICE r9, re-run against the no-restore-arm design)."""
    import os

    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
    from amazon_fresh_sql_data_engineering_spark.sources import versioned as V
    from amazon_fresh_sql_data_engineering_spark.streaming import dedup as SD

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 25)
    )
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    D.bootstrap_minhash_store(spark, store, num_prefixes=8, publish="pointer")
    docs.coalesce(1).write.parquet(src)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, ckpt, pairs_out, "doc_id", "text", 0.6,
    )
    root = f"{store}/store"
    cur = V.current_version(root)
    # simulate the torn compaction: generation cur+1 partially
    # materialized, pointer never flipped
    torn = f"{root}/data/v={cur + 1}"
    os.makedirs(f"{torn}/index")
    with open(f"{torn}/index/garbage", "w") as fh:
        fh.write("partial write")
    # adopt (fresh checkpoint) heals first: the orphan generation is
    # pruned, the data-derived epoch comes from the LIVE generation
    epoch = SD.adopt_minhash_store_stream(spark, store, str(tmp_path / "ckptB"))
    assert epoch >= 1
    assert not os.path.exists(torn)
    assert V.current_version(root) == cur
    # a second torn generation, then the loop itself (with in-loop
    # compaction enabled) heals, accretes near-dups of history, and still
    # pairs them — history was never lost
    os.makedirs(f"{torn}/features")
    docs.withColumn("doc_id", F.col("doc_id") + 500_000).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    SD.run_store_dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, str(tmp_path / "ckptB"), pairs_out, "doc_id", "text", 0.6,
        compact_every=1,
    )
    assert not os.path.exists(torn)
    got = {(r.id_a, r.id_b) for r in SD.read_dedup_pairs(spark, pairs_out).collect()}
    base_ids = {r.doc_id for r in docs.collect()}
    missing = [i for i in base_ids if (i, i + 500_000) not in got]
    assert not missing, f"history lost for {missing[:5]}"
    # an explicit compaction against live history: folds, flips, vacuums
    feats_dir, _ = D._store_trees(store)
    hi = spark.read.parquet(feats_dir).agg(F.max("__ingest")).first()[0]
    before, after = D.compact_minhash_store(spark, store, hi + 1)
    new_cur = V.current_version(root)
    assert new_cur > cur and V.list_versions(root) == [new_cur]
    assert after <= before
    # probe still sees everything (compaction is probe-invariant)
    wave = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 900_000)
    pairs = D.minhash_store_probe(
        wave, store, "doc_id", "text", threshold=0.6,
        max_ingest_exclusive=hi + 2,
    )
    probed = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {r.doc_id for r in wave.collect()}
    assert all((i - 900_000, i) in probed for i in want)


def test_mvcc_sink_snapshot_churn_bounded(spark, tmp_path):
    """r11 (VERDICT r10 item 5 lock): the MVCC sink's snapshot churn is
    bounded — superseded versions are pruned AT the pointer flip, so after
    any number of folds every bucket holds exactly ONE live snapshot
    (steady-state disk amplification 1x; transient 2x only inside a fold)
    and no staging leftovers survive a batch. Version numbers advance
    monotonically per touched bucket."""
    import os

    from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV

    keys, sums, nb = ["g"], {"rev": "rev"}, 4
    sch = "id int, g string, rev double, __op int"
    src = str(tmp_path / "deltas")
    out = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        MV.run_mv_maintain_stream_partitioned_mvcc(
            spark.readStream.schema(sch).parquet(src), out, ckpt, keys, sums,
            num_buckets=nb,
        )

    # 4 batches, all touching group 'a' (same bucket every time)
    spark.createDataFrame([(1, "a", 10.0, 1)], sch).coalesce(1).write.parquet(src)
    drain()
    for i in range(2, 5):
        spark.createDataFrame(
            [(i, "a", 1.0 * i, 1)], sch
        ).coalesce(1).write.mode("append").parquet(src)
        drain()
    # every bucket: exactly one live v= snapshot; no staging dirs
    assert not any(d.startswith(".mvstage-") for d in os.listdir(out))
    seen_versions = []
    for d in sorted(os.listdir(out)):
        if not d.startswith("bucket="):
            continue
        data = os.path.join(out, d, "data")
        vs = [e for e in os.listdir(data) if e.startswith("v=")]
        assert len(vs) == 1, f"{d} holds {vs} — superseded snapshot not pruned"
        seen_versions.append((d, int(vs[0][2:]), MV._bp_version(os.path.join(out, d))))
    assert seen_versions
    # the on-disk version IS the pointed version, and the repeatedly
    # touched bucket advanced once per fold that touched it (4 folds)
    assert all(on_disk == pointed for _, on_disk, pointed in seen_versions)
    assert max(v for _, v, _ in seen_versions) == 4
    got = {
        r["g"]: (r["__mv_cnt"], float(r["rev"]))
        for r in MV.read_mv_state_mvcc(spark, out).collect()
    }
    assert got == {"a": (4, 10.0 + 2.0 + 3.0 + 4.0)}
