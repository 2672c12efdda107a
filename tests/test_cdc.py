"""Unit + law tests for operators/cdc.py: log compaction semantics,
diff minimality, and the round-trip law (old + diff == new)."""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
from amazon_fresh_sql_data_engineering_spark.operators.cdc import (
    changelog_apply,
    snapshot_diff,
)


def test_changelog_apply_latest_wins_and_delete_removes(spark):
    log = spark.createDataFrame(
        [
            ("I", 1, "a", 1),
            ("U", 1, "b", 2),
            ("I", 2, "x", 1),
            ("D", 2, None, 2),
            ("I", 3, "z", 5),
        ],
        "op string, k bigint, v string, seq int",
    )
    state = {r["k"]: r["v"] for r in changelog_apply(log, ["k"], "seq").collect()}
    assert state == {1: "b", 3: "z"}


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k bigint, v string"
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(rows) == {2, 3, 4}  # k=1 unchanged -> absent
    assert rows[2]["op"] == "U" and rows[2]["new_v"] == "B"
    assert rows[3]["op"] == "D"
    assert rows[4]["op"] == "I" and rows[4]["old_v"] is None


def test_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "b")], "k bigint, v string")
    new = spark.createDataFrame([(1, "a"), (2, None)], "k bigint, v string")
    ops = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL -> value and value -> NULL must both register as changes
    assert ops == {1: "U", 2: "U"}


def test_diff_then_apply_round_trips(spark, sf_dir):
    """old + snapshot_diff(old, new) replayed as a changelog == new."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = old.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(old, new, ["o_orderkey"])
    log = old.select(
        F.lit("I").alias("op"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).alias("seq"),
    ).unionByName(
        diff.select(
            "op",
            "o_orderkey",
            F.col("new_o_orderstatus").alias("o_orderstatus"),
            F.col("new_o_totalprice").alias("o_totalprice"),
            F.lit(1).alias("seq"),
        )
    )
    rebuilt = changelog_apply(log, ["o_orderkey"], "seq").drop("seq")
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_cdc_catalog_queries_consistent(spark, sf_dir):
    state = CATALOG["op_cdc_apply"].fn(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    deleted = orders.filter(F.col("o_orderkey") % 100 == 0).count()
    assert state.count() == n - deleted
    # every surviving %10 key carries the updated price (seq 2)
    assert (
        state.filter((F.col("o_orderkey") % 10 == 0) & (F.col("seq") != 2)).count()
        == 0
    )


def test_streaming_cdc_apply_matches_batch_and_restarts_idempotent(
    spark, sf_dir, tmp_path
):
    """The changelog arrives as three files (inserts, updates, deletes)
    in separate micro-batches; the sink-state streaming apply must land
    on exactly the batch op_cdc_apply state, and a restart over the same
    checkpoint must change nothing."""
    from amazon_fresh_sql_data_engineering_spark.streaming.cdc import (
        read_current_state,
        run_cdc_apply_stream,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.lit("I").alias("op"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("seq"),
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.lit("U").alias("op"),
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        F.lit(2).alias("seq"),
    )
    dele = o.filter(F.col("o_orderkey") % 100 == 0).select(
        F.lit("D").alias("op"),
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(3).alias("seq"),
    )
    src = str(tmp_path / "log")
    for i, part in enumerate([base, upd, dele]):
        part.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    run_cdc_apply_stream(stream, out, ckpt, ["o_orderkey"], "seq")

    batch = CATALOG["op_cdc_apply"].fn(spark, sf_dir)
    streamed = read_current_state(spark, out)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # restart over the same checkpoint: nothing new to consume, state
    # identical (idempotence under re-run)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_cdc_apply_stream(stream2, out, ckpt, ["o_orderkey"], "seq")
    again = read_current_state(spark, out)
    assert again.exceptAll(batch).count() == 0
    assert batch.exceptAll(again).count() == 0


def test_compact_log_long_changelog_forced_scale(spark):
    """Forced-scale compaction stress: a 300k-event changelog over 3k keys
    (100 versions per key, deletes interleaved) must collapse to exactly one
    latest row per key with tombstones retained — the map-side-combinable
    max_by path, exercised well past the toy-changelog grain of the unit
    tests. Expectation is computed by expression (latest seq per key is
    closed-form), compared with a distributed anti-count, no driver-side
    materialization of the log."""
    from amazon_fresh_sql_data_engineering_spark.operators.cdc import compact_log

    n_keys, n_versions = 3_000, 100
    log = (
        spark.range(n_keys * n_versions)
        .repartition(32)
        .select(
            (F.col("id") % n_keys).alias("k"),
            F.col("id").alias("seq"),
            # every 7th event is a delete; payload derives from seq
            F.when(F.col("id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            (F.col("id") * 2).alias("v"),
        )
    )
    got = compact_log(log, ["k"], "seq")
    assert got.count() == n_keys
    # latest event for key k is id = n_keys*(n_versions-1) + k
    exp = spark.range(n_keys).select(
        F.col("id").alias("k"),
        (F.lit(n_keys * (n_versions - 1)) + F.col("id")).alias("seq"),
        F.when((F.lit(n_keys * (n_versions - 1)) + F.col("id")) % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        ((F.lit(n_keys * (n_versions - 1)) + F.col("id")) * 2).alias("v"),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # tombstones retained in the compacted form (storage semantics)
    assert got.filter(F.col("op") == "D").count() > 0
