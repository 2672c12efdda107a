"""Ground-truth validation for extension operators without SQL oracles:
MinHash/SimHash/embedding-LSH against brute force, multimodal stub
behavior, and the streaming twin of the batch rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.operators import dedup as D
from amazon_fresh_sql_data_engineering_spark.operators import multimodal as MM
from amazon_fresh_sql_data_engineering_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " with a tiny suffix added"),  # near dup of 1
        (4, "completely different words about spark shuffles and parquet files here"),
        (5, "another unrelated document mentioning windows aggregates and joins etc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_incremental_replays_batch_union(spark, sf_dir):
    """The incremental operator's defining property (VERDICT r5 item 5):
    applying it batch-by-batch against an accreting feature store finds
    exactly the batch-touching pairs of the full-union run — so a pipeline
    that never recomputes history still converges to the batch answer.
    Two sequential batches over real documents; the store grows between
    them exactly as a production sink would."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 3 == 0)
    batch1 = docs.filter(F.col("doc_id") % 3 == 1).unionByName(
        # guaranteed hits: exact copies of store docs under fresh ids
        store_docs.filter(F.col("doc_id") % 12 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
    )
    batch2 = docs.filter(F.col("doc_id") % 3 == 2).unionByName(
        batch1.filter(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 20_000_000
        )
    )
    feats = lambda d: D.minhash_features(d, "doc_id", "text", 64, 3, 42)  # noqa: E731

    store = feats(store_docs).persist()
    got1 = D.minhash_incremental_pairs(store, batch1, "doc_id", "text", threshold=0.5)
    store2 = store.unionByName(feats(batch1)).persist()
    got2 = D.minhash_incremental_pairs(store2, batch2, "doc_id", "text", threshold=0.5)
    got = {
        (r.id_a, r.id_b): (round(r.jaccard_sim, 6), r.vs)
        for r in got1.unionByName(got2).collect()
    }

    union = store_docs.unionByName(batch1).unionByName(batch2)
    full = D.minhash_dedup_pairs(union, "doc_id", "text", threshold=0.5)
    b1 = {r.doc_id for r in batch1.select("doc_id").collect()}
    b2 = {r.doc_id for r in batch2.select("doc_id").collect()}
    exp = {}
    for r in full.collect():
        in_b1 = r.id_a in b1 or r.id_b in b1
        in_b2 = r.id_a in b2 or r.id_b in b2
        if not (in_b1 or in_b2):
            continue  # store-store: found when the store was built
        # classification mirrors the per-batch runs: a pair is 'batch' iff
        # both sides arrived in the SAME batch (the later one sees earlier
        # batches as store)
        if r.id_a in b2 and r.id_b in b2:
            vs = "batch"
        elif in_b2:
            vs = "store"
        elif r.id_a in b1 and r.id_b in b1:
            vs = "batch"
        else:
            vs = "store"
        exp[(r.id_a, r.id_b)] = (round(r.jaccard_sim, 6), vs)
    assert got == exp
    assert any(v == "batch" for _, v in got.values())  # fixture exercised both
    assert any(v == "store" for _, v in got.values())
    spark.catalog.clearCache()


def test_minhash_store_probe_prunes_and_matches_inmemory(spark, sf_dir, tmp_path):
    """On-disk feature store: probing a batch against write_minhash_store's
    partitioned layout returns exactly the in-memory incremental result,
    and the partition filters actually prune the index scan."""
    from pyspark.sql import functions as F  # noqa: F811

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 10 == 1).unionByName(
        store_docs.filter(F.col("doc_id") % 20 == 0).withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
    )
    store_feats = D.minhash_features(store_docs, "doc_id", "text", 64, 3, 42).persist()
    path = str(tmp_path / "mh_store")
    D.write_minhash_store(store_feats, path, num_prefixes=8)

    pins = []
    probe = D.minhash_store_probe(batch, path, "doc_id", "text", threshold=0.5, pins=pins)
    got = {
        (r.id_a, r.id_b): (round(r.jaccard_sim, 6), r.vs) for r in probe.collect()
    }
    exp = {
        (r.id_a, r.id_b): (round(r.jaccard_sim, 6), r.vs)
        for r in D.minhash_incremental_pairs(
            store_feats, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == exp and got  # non-trivial: the planted copies must hit

    # exchange-free store side (VERDICT r6 item 8): with broadcast_batch
    # (the default) every join in the probe is a broadcast hash join — the
    # index and feature scans stream with no store-side shuffle
    from amazon_fresh_sql_data_engineering_spark.plans import explain as X

    probe_plan = X.physical_plan(probe)
    assert "SortMergeJoin" not in probe_plan and "ShuffledHashJoin" not in probe_plan, (
        probe_plan[:1500]
    )
    # the pins out-param surfaced the batch-side caches: features, bands,
    # and (ADVICE r7) the counted candidate-pair frame behind the guarded
    # broadcast hint
    assert len(pins) == 3
    for p in pins:
        p.unpersist()

    # hot-bucket guard (ADVICE r7): the candidate-PAIR frame's broadcast
    # hint is count-guarded because pair count is store-occupancy-driven,
    # not batch-bounded. Forcing the cap to 0 must drop ONLY that hint —
    # the verify join shuffles — while results stay identical.
    guarded = D.minhash_store_probe(
        batch, path, "doc_id", "text", threshold=0.5, max_broadcast_candidates=0
    )
    got_guarded = {
        (r.id_a, r.id_b): (round(r.jaccard_sim, 6), r.vs) for r in guarded.collect()
    }
    assert got_guarded == exp
    # the hint (not optimizer smallness) must be what's gone: under
    # autoBroadcastJoinThreshold=-1 a HINTED join still broadcasts, an
    # unhinted one cannot — so the guarded probe must show a shuffle join
    # where the default probe stays hint-broadcast throughout
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        gplan = X.physical_plan(
            D.minhash_store_probe(
                batch, path, "doc_id", "text", threshold=0.5,
                max_broadcast_candidates=0,
            )
        )
        assert "SortMergeJoin" in gplan or "ShuffledHashJoin" in gplan
        hplan = X.physical_plan(
            D.minhash_store_probe(batch, path, "doc_id", "text", threshold=0.5)
        )
        assert "SortMergeJoin" not in hplan and "ShuffledHashJoin" not in hplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # pruning evidence with a realistically small probe batch (a 500-doc
    # batch x 16 bands touches all 128 partitions of this toy store; real
    # stores use num_prefixes >> batch band-rows): 3 docs -> <= 48 of 128
    # (band, pfx) combos. The predicate must land in the index scan's
    # PartitionFilters (directory pruning), not the post-scan data filter
    # — inputFiles() can't show this (it reports the unfiltered
    # relation), the plan does. Asserted on the PROBE's own plan: the
    # flat In/InSet encoding over (band * P + __pfx) must prune (a
    # reduce-built Or chain here overflowed the analyzer stack at ~650
    # terms — the regression this assertion also guards).
    tiny = batch.orderBy("doc_id").limit(3)
    from amazon_fresh_sql_data_engineering_spark.plans import explain as X

    tiny_probe = D.minhash_store_probe(tiny, path, "doc_id", "text", threshold=0.5)
    plan = X.physical_plan(tiny_probe)
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "PartitionFilters: []" not in ln
    ]
    assert pf and any("band" in ln for ln in pf), plan[:1500]
    # and the pruned probe still returns exactly the tiny batch's pairs
    tiny_got = {
        (r.id_a, r.id_b)
        for r in D.minhash_store_probe(
            tiny, path, "doc_id", "text", threshold=0.5
        ).collect()
    }
    tiny_exp = {
        (r.id_a, r.id_b)
        for r in D.minhash_incremental_pairs(
            store_feats, tiny, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert tiny_got == tiny_exp
    spark.catalog.clearCache()


def test_minhash_finds_known_dups_and_matches_bruteforce(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any({4, 5} & set(p) for p in pairs)
    # verified jaccard must equal brute-force jaccard for reported pairs
    sh = docs.select("doc_id", D.shingles("text").alias("sh"))
    brute = {
        (r.id_a, r.id_b): r.j
        for r in sh.alias("a")
        .crossJoin(sh.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            D.jaccard(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .collect()
    }
    for p, j in pairs.items():
        assert abs(brute[p] - j) < 1e-12


def test_exact_dedup_injective_encoding(spark):
    # values containing the old '\x1f' separator (or a literal matching the
    # NULL sentinel) must NOT merge across column boundaries
    rows = [
        (1, "a\x1fb", "c"),
        (2, "a", "b\x1fc"),  # concat_ws('\x1f') would give row 1's pre-image
        (3, "\x00", "x"),
        (4, None, "x"),  # NULL vs literal sentinel stay distinct
        (5, "a", "b\x1fc"),  # true duplicate of 2 -> dropped
        (6, None, "x"),  # true duplicate of 4 (NULLs group) -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, c1 string, c2 string")
    kept = sorted(r.id for r in D.exact_dedup(df, ["c1", "c2"], "id").collect())
    assert kept == [1, 2, 3, 4]


def test_exact_dedup_fp_column_collision(spark):
    # a pre-existing __fp column must survive untouched
    df = spark.createDataFrame(
        [(1, "x", "z"), (2, "x", "z")], "id long, __fp string, t string"
    )
    out = D.exact_dedup(df, ["__fp", "t"], "id")
    assert sorted(out.columns) == ["__fp", "id", "t"]
    assert [r.id for r in out.collect()] == [1]


def test_simhash_deterministic_and_finds_dups(spark, docs):
    sig1 = {r.doc_id: r.s for r in docs.select("doc_id", D.simhash64("text").alias("s")).collect()}
    sig2 = {r.doc_id: r.s for r in docs.select("doc_id", D.simhash64("text").alias("s")).collect()}
    assert sig1 == sig2  # deterministic across runs
    assert sig1[1] == sig1[2]  # identical text -> identical signature
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             D.simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_embedding_lsh_recall_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(20)]
    rows += [(100 + i, base[i].tolist()) for i in range(5)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in D.embedding_dedup_pairs(df, "vec_id", "embedding", threshold=0.999).collect()
    }
    expected = {(i, 100 + i) for i in range(5)}
    # identical vectors always share every LSH bucket -> full recall on exact dups
    assert expected <= got


def test_lsh_topk_recall(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    brute = S.cosine_topk_bruteforce(q, e, "vec_id", "vec_id", "embedding", k=5)
    approx = S.lsh_topk(q, e, "vec_id", "vec_id", "embedding", k=5)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.4, f"LSH recall collapsed: {recall}"  # sanity floor


def test_connected_components_and_dedup_corpus(spark):
    # components: {1,2,3} via chain 1-2, 2-3; {10,11}; 99 isolated (no pair)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = {r.id: r.cluster_id for r in D.connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    df = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    kept = sorted(r.doc_id for r in D.dedup_corpus(df, pairs, "doc_id").collect())
    assert kept == [1, 10, 99]


def test_ivf_topk_recall(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    brute = S.cosine_topk_bruteforce(q, e, "vec_id", "vec_id", "embedding", k=5)
    ivf = S.ivf_topk(q, e, "vec_id", "vec_id", "embedding", k=5, n_clusters=16, n_probe=8)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"


def test_multimodal_stub_paths(spark, docs):
    media = MM.attach_fake_media(docs, "doc_id", "text")
    out = MM.decode_media(media, fake=True).collect()
    assert len(out) == 5
    row = {r.doc_id: r for r in out}[1]
    n = len("the quick brown fox jumps over the lazy dog and runs far away today")
    assert row.n_bytes == n and row.width == n % 640 + 1
    assert row.checksum == sum(b"the quick brown fox jumps over the lazy dog and runs far away today"[:64])
    # text-as-media bytes are no supported container: real-decode tier
    # QUARANTINES them (job completes), strict tier raises
    q = MM.decode_media(media, fake=False).collect()
    assert len(q) == 5 and all(not r.ok and "container" in r.error for r in q)
    assert all(r.width is None and r.media_type is None for r in q)
    with pytest.raises(Exception, match="NotImplementedError|container"):
        MM.decode_media(media, fake=False, strict=True).collect()


def test_streaming_hourly_matches_batch(spark, sf_dir, tmp_path):
    """The same hourly_rollup transformation over readStream(availableNow)
    must equal the batch result — the unified-engine invariant."""
    from amazon_fresh_sql_data_engineering_spark.sources import load_table
    from amazon_fresh_sql_data_engineering_spark.streaming.events import hourly_rollup

    events = load_table(spark, sf_dir, "events")
    # park a clean copy (micros ts) for the file stream source
    stream_dir = str(tmp_path / "events_stream")
    events.write.parquet(stream_dir)
    batch = {tuple(r) for r in hourly_rollup(events).collect()}

    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    q = (
        hourly_rollup(stream.withWatermark("ts", "2 hours"))
        .writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM hourly_test").collect()}
    assert streamed == batch


def test_sessionize_stream_runs(spark, sf_dir, tmp_path):
    from amazon_fresh_sql_data_engineering_spark.sources import load_table
    from amazon_fresh_sql_data_engineering_spark.streaming.events import (
        sessionize_stream,
    )

    events = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_sessions")
    events.write.parquet(stream_dir)
    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    q = (
        sessionize_stream(stream, gap_minutes=5)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.sql("SELECT count(*) c FROM sessions_test").collect()[0].c
    assert n > 0


def test_connected_components_distributed_path_matches_unionfind(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (5, 6)],
        "id_a long, id_b long",
    )
    fast = {(r.id, r.cluster_id) for r in D.connected_components(pairs).collect()}
    dist = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist


def test_connected_components_distributed_long_chain(spark):
    """The distributed branch must converge on a graph whose diameter far
    exceeds the iteration budget: a 300-node chain needs 300 naive
    propagation rounds but ~9 with pointer doubling (budget is 20). Labels
    must match union-find exactly, and every node must collapse to the
    chain head."""
    chain = [(i, i + 1) for i in range(1000, 1300)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    dist = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    fast = {(r.id, r.cluster_id) for r in D.connected_components(pairs).collect()}
    assert dist == fast
    assert {c for _, c in dist} == {1000}


def test_connected_components_distributed_stress(spark):
    """100 TB-shape gate for the distributed branch: a random graph with
    1.5M edges over 400k nodes (mean degree ~7.5 -> one giant component)
    PLUS a 3,000-hop chain (diameter 3,000 — naive propagation would need
    3,000 rounds). Asserts (a) exact label parity with an independent
    numpy union-find over the same edge list, (b) the pointer-doubling
    iteration bound <= log2(diameter) + c, and (c) no persisted
    RDD/cache blocks leak once the result is released."""
    import math

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_rand, n_edges, chain_len = 400_000, 1_500_000, 3_000
    a = rng.integers(0, n_rand, n_edges, dtype=np.int64)
    b = rng.integers(0, n_rand, n_edges, dtype=np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    chain_a = np.arange(n_rand, n_rand + chain_len, dtype=np.int64)
    src = np.concatenate([np.minimum(a, b), chain_a])
    dst = np.concatenate([np.maximum(a, b), chain_a + 1])

    # independent ground truth: union-find with path halving
    n_nodes = n_rand + chain_len + 1
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(src.tolist(), dst.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    touched = np.unique(np.concatenate([src, dst]))
    expected = {int(x): find(int(x)) for x in touched.tolist()}

    sc = spark.sparkContext
    baseline_blocks = len(sc._jsc.getPersistentRDDs())
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": src, "id_b": dst}))
    labels = D.connected_components(pairs, driver_threshold=0)
    got = {r.id: r.cluster_id for r in labels.collect()}
    assert got == expected
    bound = math.ceil(math.log2(chain_len)) + 3
    assert 0 < D.LAST_CC_ITERS <= bound, (D.LAST_CC_ITERS, bound)
    # release the returned checkpoint; everything else must already be freed
    # (<= not ==: the async ContextCleaner may also reap blocks predating
    # this test, so the count can legitimately DROP below the baseline)
    D._free_local_checkpoint(labels)
    assert len(sc._jsc.getPersistentRDDs()) <= baseline_blocks


def test_connected_components_distributed_on_real_pairs(spark, sf_dir):
    """Scale-shape gate: the REAL minhash pair set (not a toy graph) through
    the distributed branch, compared label-for-label with union-find."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import _docs_with_dups

    docs = _docs_with_dups(spark, sf_dir)
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.6).persist()
    dist = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    fast = {(r.id, r.cluster_id) for r in D.connected_components(pairs).collect()}
    assert dist == fast and len(dist) > 0


def test_approx_count_distinct_error_bounded(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    row = CATALOG["op_approx_count_distinct"].fn(spark, sf_dir).collect()[0]
    l = load_table(spark, sf_dir, "lineitem")
    exact = l.agg(
        F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o")
    ).collect()[0]
    assert row.exact_parts == exact.p
    assert row.exact_orders == exact.o
    assert row.parts_within_10pct and row.orders_within_10pct


def test_frame_sampling_layout_and_checksums(spark):
    long_text = "x" * 100 + "yz" * 500  # 1100 bytes -> 4 frames (stride 256)
    df = spark.createDataFrame([(1, long_text), (2, "tiny")], "doc_id long, text string")
    media = MM.attach_fake_media(df, "doc_id", "text")
    rows = {(r.doc_id, r.frame_idx): r for r in MM.sample_frames(media).collect()}
    b = long_text.encode()
    assert {(d, i) for d, i in rows} == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)}
    for i in range(4):
        r = rows[(1, i)]
        assert r.byte_offset == i * 256
        assert bytes(r.frame_bytes) == b[i * 256 : i * 256 + 64]
        assert r.frame_checksum == sum(b[i * 256 : i * 256 + 64])
    assert bytes(rows[(2, 0)].frame_bytes) == b"tiny"  # short doc: 1 partial frame
    # the stub mode errors eagerly at plan time, not from inside the task
    with pytest.raises(NotImplementedError, match="frame sampling"):
        MM.sample_frames(media, fake=False)


def test_embed_media_deterministic_and_bounded(spark, docs):
    media = MM.attach_fake_media(docs, "doc_id", "text")
    e1 = {r.doc_id: r.embedding for r in MM.embed_media(media).collect()}
    e2 = {r.doc_id: r.embedding for r in MM.embed_media(media).collect()}
    assert e1 == e2  # deterministic
    assert e1[1] == e1[2]  # identical text -> identical embedding
    assert all(len(v) == 16 and all(-1 <= x <= 1 for x in v) for v in e1.values())


def test_real_image_header_decode(spark):
    """decode_media(fake=False) is a REAL decoder for header-parsable
    formats: handcrafted PNG/GIF/BMP/JPEG byte containers round-trip their
    dimensions through the Spark mapInPandas path."""
    import struct

    from amazon_fresh_sql_data_engineering_spark.operators import multimodal as MM

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 360) + b"\x08\x06" + b"\x00" * 40
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 40
    bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 100, -50) + b"\x00" * 30
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9   # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 720) + b"\x03" + b"\x00" * 9  # SOF0
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [(1, bytearray(png), ("x", len(png))),
         (2, bytearray(gif), ("x", len(gif))),
         (3, bytearray(bmp), ("x", len(bmp))),
         (4, bytearray(jpg), ("x", len(jpg)))],
        "doc_id long, media_bytes binary, media_meta struct<content_type string, n_bytes int>",
    )
    out = {r.doc_id: (r.media_type, r.width, r.height) for r in MM.decode_media(df, fake=False).collect()}
    assert out[1] == ("image/png", 640, 360)
    assert out[2] == ("image/gif", 320, 200)
    assert out[3] == ("image/bmp", 100, 50)
    assert out[4] == ("image/jpeg", 720, 480)

    # unsupported container or corrupt dims -> quarantine rows; good rows in
    # the same batch still decode (the 100 TB one-bad-blob contract)
    zero_png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", 0, 100) + b"\x08\x06" + b"\x00" * 40
    )
    huge_png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", 1 << 31, 100) + b"\x08\x06" + b"\x00" * 40
    )
    mixed = spark.createDataFrame(
        [(9, bytearray(b"not an image"), ("x", 12)),
         (10, bytearray(zero_png), ("x", len(zero_png))),
         (11, bytearray(huge_png), ("x", len(huge_png))),
         (12, bytearray(png), ("x", len(png)))],
        "doc_id long, media_bytes binary, media_meta struct<content_type string, n_bytes int>",
    )
    q = {r.doc_id: r for r in MM.decode_media(mixed, fake=False).collect()}
    assert not q[9].ok and "container" in q[9].error
    assert not q[10].ok and "non-positive" in q[10].error
    assert not q[11].ok and "int32" in q[11].error
    assert q[12].ok and q[12].error is None and q[12].width == 640  # survivor
    import pytest as _pytest
    with _pytest.raises(Exception, match="(?i)container|NotImplemented"):
        MM.decode_media(mixed, fake=False, strict=True).collect()


def test_ngram_jaccard_stop_shingle_cut(spark, docs):
    """max_df drops boilerplate shingles from both the inverted index and
    the set sizes: known near-dups survive (their overlap is informative
    shingles) while the hot inverted lists are bounded — the 100 TB lever
    for exact-Jaccard dedup."""
    base = D.ngram_jaccard_pairs(
        docs.withColumn("blk", F.lit(0)), "doc_id", "text",
        block_cols=["blk"], threshold=0.5,
    )
    cut = D.ngram_jaccard_pairs(
        docs.withColumn("blk", F.lit(0)), "doc_id", "text",
        block_cols=["blk"], threshold=0.5, max_df=3,
    )
    b = {(r.id_a, r.id_b) for r in base.collect()}
    c = {(r.id_a, r.id_b) for r in cut.collect()}
    # dup pairs (1,2),(1,3),(2,3) overlap on informative shingles -> kept
    assert {(1, 2), (1, 3), (2, 3)} <= c
    assert c <= b | {(1, 2), (1, 3), (2, 3)}


def test_ngram_inverted_list_length_bounded(spark):
    """Adversarial boilerplate corpus: 200 docs sharing a fixed preamble.
    Without max_df the preamble shingles' inverted lists are corpus-length
    (the self-join would materialize O(200²) rows per hot shingle); with
    max_df every kept list is <= max_df, and duplicate pairs still come out
    because their overlap lives in the informative (unique-tail) shingles."""
    boiler = "terms of service apply all rights reserved contact us for details " * 3
    rows = [(i, boiler + f"unique tail {i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(200)]
    # two exact dup pairs on the unique tails
    rows += [(1000, rows[5][1]), (1001, rows[17][1])]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "blk", F.lit(0)
    )
    raw = D.ngram_inverted_index(docs, "doc_id", "text", ["blk"], k=3)
    raw_max = raw.groupBy("blk", "__s").count().agg(F.max("count")).collect()[0][0]
    assert raw_max >= 200  # the hazard is real on this corpus
    cut = D.ngram_inverted_index(docs, "doc_id", "text", ["blk"], k=3, max_df=5)
    cut_max = cut.groupBy("blk", "__s").count().agg(F.max("count")).collect()[0][0]
    assert cut_max <= 5, cut_max
    pairs = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", ["blk"], threshold=0.5, max_df=5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # exactly the true dup pairs: boilerplate-only overlap is cut, so
    # unrelated docs share zero kept shingles and are never materialized
    assert got == {(5, 1000), (17, 1001)}, got


def test_text_feature_tiers_agree(spark, sf_dir):
    """The Arrow-batched text scorer (throughput tier) must produce
    bit-identical values to the Column-expression tier (oracle-parity
    tier) — both are used in production paths."""
    from amazon_fresh_sql_data_engineering_spark.functions import text as TXT
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    expr = {
        r.doc_id: (r.lp, r.nt, r.q)
        for r in d.select(
            "doc_id",
            TXT.lang_id("text").alias("lp"),
            TXT.token_count("text").cast("bigint").alias("nt"),
            TXT.quality_score(F.trim(F.col("text"))).alias("q"),
        ).collect()
    }
    feat = TXT.text_features_udf()
    arrow = {
        r.doc_id: (r.f.lang_pred, r.f.n_tokens, r.f.quality)
        for r in d.select("doc_id", feat(F.col("text")).alias("f")).collect()
    }
    assert expr == arrow


def test_pipe_training_corpus_invariants(spark, sf_dir):
    """Structural invariants of the composed corpus-prep pipeline (the
    oracle checks exact values; this pins the contract a downstream
    trainer relies on): only 'en' survivors, quality floor respected, no
    duplicate texts survive, split labels are the md5 buckets."""
    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG

    out = CATALOG["pipe_training_corpus"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert {r.lang_pred for r in rows} == {"en"}
    assert all(r.quality >= 0.5 for r in rows)
    assert all(r.split in ("train", "valid", "test") for r in rows)
    # majority split must be train (80% of md5 buckets)
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert c["train"] > c["valid"] and c["train"] > c["test"]
    # survivors are unique doc ids
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_resize_media_geometry(spark):
    """Aspect-preserving fit: never upscale, floor dims, byte payload
    shrinks by ~the area ratio; invalid/NULL dims quarantine instead of
    ZeroDivisionError; fake=False raises eagerly at the codec boundary."""
    rows = [
        (1, bytearray(b"x" * 1000), 448, 224),
        (2, bytearray(b"y" * 100), 100, 50),
        (3, bytearray(b"z" * 10), 0, 50),  # malformed-but-parsable header
        (4, bytearray(b"w" * 10), None, None),  # upstream quarantined decode
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_bytes binary, width int, height int"
    )
    out = {r.doc_id: r for r in MM.resize_media(df, 224, 224).collect()}
    assert (out[1].dst_width, out[1].dst_height) == (224, 112)  # scale 0.5
    assert out[1].scale == 0.5 and len(out[1].resized_bytes) == 250  # stride 4
    assert out[1].ok and out[1].error is None
    assert (out[2].dst_width, out[2].dst_height) == (100, 50)  # never upscale
    assert out[2].scale == 1.0 and len(out[2].resized_bytes) == 100
    assert not out[3].ok and "non-positive" in out[3].error
    assert out[3].dst_width is None and out[3].resized_bytes is None
    assert not out[4].ok and "NULL source" in out[4].error
    with pytest.raises(Exception, match="non-positive|NULL source"):
        MM.resize_media(df, 224, 224, strict=True).collect()
    with pytest.raises(NotImplementedError, match="resampling"):
        MM.resize_media(df, fake=False)


def test_minhash_recall_vs_ground_truth_corpus(spark, sf_dir):
    """Recall evidence: at the driver's scale factors the LSH output equals
    the ground-truth all-pairs exact-Jaccard set (recall 1.0). The query
    ORACLE no longer assumes this (it replays the algorithm, exact at any
    sf); this test is where the recall claim lives, at the sf where it is
    measured. At sf0.1 measured recall is 99.5% (7/1349 borderline pairs
    missed) — the honest ANN tradeoff."""
    import duckdb

    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        _DOCS_DUPS_SQL,
        _JACCARD_PAIRS_SQL,
        _SHF_SQL,
        _docs_with_dups,
    )

    docs = _docs_with_dups(spark, sf_dir)
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exact = {
        (a, b)
        for a, b, _ in con.execute(
            f"WITH all_docs AS ({_DOCS_DUPS_SQL}), shf AS ({_SHF_SQL})"
            + _JACCARD_PAIRS_SQL.format(t=0.6)
        ).fetchall()
    }
    # 31-bit-hash Jaccard vs string Jaccard can disagree only via hash
    # collisions (~1e-6); recall gate allows none at this sf
    assert got == exact


def test_corpus_mixture_hits_targets_and_is_deterministic(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        _MIX_WEIGHTS,
        op_corpus_mixture,
    )

    rows = {r.lang: r for r in op_corpus_mixture(spark, sf_dir).collect()}
    assert set(rows) == set(_MIX_WEIGHTS)
    total_w = sum(_MIX_WEIGHTS.values())
    total_sampled = sum(r.n_sampled for r in rows.values())
    for lang, r in rows.items():
        # hash-threshold acceptance is binomial around the target ppm:
        # achieved fraction within 4 sigma of the target mixture share
        target = _MIX_WEIGHTS[lang] / total_w
        achieved = r.n_sampled / total_sampled
        sigma = (target * (1 - target) / max(total_sampled, 1)) ** 0.5
        assert abs(achieved - target) < 4 * sigma + 0.02, (lang, achieved, target)
        assert r.n_sampled <= r.n_total
    # md5 acceptance — bit-identical on rerun
    again = {r.lang: r for r in op_corpus_mixture(spark, sf_dir).collect()}
    assert {k: v.sum_ids for k, v in rows.items()} == {
        k: v.sum_ids for k, v in again.items()
    }


def test_vocab_coverage_rates_well_formed(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        text_vocab_coverage,
    )

    rows = text_vocab_coverage(spark, sf_dir).collect()
    assert rows, "expected one row per language"
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # a 32-word vocab over a small closed vocabulary corpus must cover
    # a nontrivial share: every language's OOV rate strictly below 1
    assert all(r.oov_rate < 1.0 for r in rows)


def test_containment_finds_embedded_docs_jaccard_misses(spark, sf_dir):
    """The operator's reason to exist: every synthetic host doc (component
    || ' ' || successor) is flagged against its first component with
    containment ~1.0 while the pair's Jaccard sits far below the 0.5
    near-dup threshold used by the symmetric dedup family."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        dedup_containment,
    )

    rows = dedup_containment(spark, sf_dir).collect()
    assert rows
    host_pairs = [r for r in rows if r.id_b >= 3000000 and r.id_a == r.id_b - 3000000]
    assert host_pairs, "every host must pair with its first component"
    for r in host_pairs:
        assert r.containment >= 0.9
    # the asymmetric gap: most hosts are flagged precisely because
    # min-normalization ignores the size mismatch that caps Jaccard near
    # |A|/|B| ~ 0.5 (a few pairs score high on both when the successor
    # shares much of the closed vocabulary — that's fine)
    below = [r for r in host_pairs if r.jaccard_sim < 0.75]
    assert len(below) >= len(host_pairs) // 2, (len(below), len(host_pairs))
    assert any(r.jaccard_sim < 0.6 for r in host_pairs)


def test_line_dedup_exact_copy_loses_every_segment(spark, sf_dir):
    """Segment-level first-occurrence semantics: an exact-copy doc
    (id + 1_000_000 in the dup universe) shares every 10-word segment with
    its original, so the copy keeps zero segments and reassembles to the
    empty string, while the original keeps all of its own."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        text_line_dedup,
    )

    out = {r.doc_id: r for r in text_line_dedup(spark, sf_dir).collect()}
    originals = [i for i in out if i < 1000000 and i % 10 == 0 and i + 1000000 in out]
    assert originals
    for i in originals[:20]:
        orig, copy = out[i], out[i + 1000000]
        assert orig.n_segs == copy.n_segs
        assert copy.n_kept == 0 and copy.kept_text == ""
        # the original is the globally-first occurrence of its segments
        # unless an earlier doc happens to share one
        assert orig.n_kept >= 0 and orig.n_segs >= 1
    # reassembly preserves order: some doc with all segments kept must
    # round-trip to its own text modulo the final short segment
    full_keep = [r for r in out.values() if r.n_kept == r.n_segs and r.n_segs > 1]
    assert full_keep


def test_entropy_filter_bounds_and_degenerate_doc(spark, sf_dir):
    """0 <= H <= log2(|alphabet|); a one-char doc scores exactly 0."""
    import math

    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        text_entropy_filter,
    )

    rows = text_entropy_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy <= math.log2(128) + 1e-9
        assert r.keep == (r.entropy >= 4.10)
    # degenerate input through the same expression chain
    from pyspark.sql import functions as F

    one = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit("aaaaaaaa").alias("text")
    )
    chars = one.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ent = counts.groupBy("doc_id").agg(
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 4
        ).alias("entropy")
    )
    assert ent.collect()[0].entropy == 0.0


def test_containment_dominates_jaccard(spark, sf_dir):
    """Invariant: C = i/min(na,nb) >= J = i/(na+nb-i) for every pair."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        dedup_containment,
    )

    for r in dedup_containment(spark, sf_dir).collect():
        assert r.containment >= r.jaccard_sim - 1e-9, r


def test_kmeans_refine_partitions_all_vectors(spark, sf_dir):
    """Cluster sizes sum to the corpus size (every vector assigned exactly
    once), every surviving cluster is nonempty, and reruns are
    bit-deterministic (no rand() anywhere in the path)."""
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        op_kmeans_refine,
    )
    from amazon_fresh_sql_data_engineering_spark.registry import tables

    n_vec = tables(spark, sf_dir, "embeddings").count()
    rows = {r.cid: r for r in op_kmeans_refine(spark, sf_dir).collect()}
    assert sum(r.n_members for r in rows.values()) == n_vec
    assert all(r.n_members > 0 for r in rows.values())
    assert all(r.centroid_norm > 0 for r in rows.values())
    again = {r.cid: r for r in op_kmeans_refine(spark, sf_dir).collect()}
    assert {k: (v.n_members, v.centroid_norm) for k, v in rows.items()} == {
        k: (v.n_members, v.centroid_norm) for k, v in again.items()
    }


def test_char_entropy_tiers_agree(spark, sf_dir):
    """The Arrow entropy kernel (no-shuffle throughput tier) must produce
    the same rounded values as the explode/aggregate oracle-parity tier
    registered as text_entropy_filter."""
    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
    from amazon_fresh_sql_data_engineering_spark.functions import text as TXT
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    expr = {
        (r.doc_id): (r.n_chars_counted, r.entropy)
        for r in CATALOG["text_entropy_filter"].fn(spark, sf_dir).collect()
    }
    ent = TXT.char_entropy_udf()
    d = load_table(spark, sf_dir, "documents")
    arrow = {
        r.doc_id: (r.e.n_chars_counted, r.e.entropy)
        for r in d.select("doc_id", ent(F.col("text")).alias("e")).collect()
    }
    assert expr == arrow


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem: two documents sharing a run of >= w+k-1
    words share at least one fingerprint; selection keeps well under all
    grams (expected density 2/(w+1))."""
    from amazon_fresh_sql_data_engineering_spark.functions.text import (
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot"  # 6 words = w+k-1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six seven eight nine"),
            (2, f"red green blue {shared} cyan magenta yellow black white"),
            (3, "totally different words with no overlap at all here now"),
            (4, "ab cd"),  # shorter than k -> no fingerprints
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"][:32])  # hash part
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    assert not (by_doc[3] & by_doc[1])
    assert 4 not in by_doc
    # density: far fewer fingerprints than grams (13 grams per long doc)
    assert all(len(v) <= 8 for v in by_doc.values())
    # determinism
    again = {
        (r["doc_id"], r["fp"]) for r in winnow_fingerprints(
            docs, "doc_id", "text", k=3, w=4
        ).collect()
    }
    assert again == {(r["doc_id"], r["fp"]) for r in rows}


def test_pq_rerank_recall_beats_pure_adc(spark, sf_dir):
    """PQ contract: exact re-rank over the ADC shortlist can only improve
    recall; on this (deterministic) corpus the measured means are 1.3/5
    pure-ADC vs 3.5/5 reranked — gate well inside both."""
    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG

    emb = {
        r["vec_id"]: r["v"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    exact = {
        q: {
            i
            for _, i in sorted(
                (l2(emb[q], v), i) for i, v in emb.items() if i != q
            )[:5]
        }
        for q in range(10)
    }

    def overlaps(name):
        got = {}
        for r in CATALOG[name].fn(spark, sf_dir).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert set(got) == set(range(10))
        assert all(len(v) == 5 for v in got.values())
        return sum(len(exact[q] & got[q]) for q in range(10)) / 10.0

    adc = overlaps("sim_ann_pq")
    rr = overlaps("sim_ann_pq_rerank")
    assert rr >= adc
    assert rr >= 3.0


def test_append_store_probe_prunes_ingest_and_stays_exchange_free(spark, docs, tmp_path):
    """Append-layout store (bootstrap + per-batch accretion): the probe's
    ``max_ingest_exclusive`` filter must land in PartitionFilters alongside
    the (band, pfx) prune — directory pruning, not a post-scan filter —
    and the store side stays exchange-free with precomputed batch
    features. Manifest mismatches on the batch_features bypass raise."""
    import pytest

    from amazon_fresh_sql_data_engineering_spark.plans import explain as X

    path = str(tmp_path / "append_store")
    D.bootstrap_minhash_store(spark, path, num_prefixes=8)
    f0 = D.minhash_features(docs.filter(F.col("doc_id") <= 3), "doc_id", "text", 64, 3, 42)
    D.append_minhash_store(f0, path, 0)
    batch = docs.filter(F.col("doc_id") > 3).unionByName(
        docs.filter(F.col("doc_id") == 1).withColumn("doc_id", F.col("doc_id") + 100)
    )
    f1 = D.minhash_features(batch, "doc_id", "text", 64, 3, 42)
    D.append_minhash_store(f1, path, 1)
    probe = D.minhash_store_probe(
        batch, path, "doc_id", "text", threshold=0.5,
        batch_features=f1, max_ingest_exclusive=1,
    )
    got = {(r.id_a, r.id_b) for r in probe.collect()}
    # 101 is a copy of 1; the ingest<1 store holds 1 plus its exact/near
    # dups 2 and 3, so all three pair with 101; 4/5 match nothing
    assert got == {(1, 101), (2, 101), (3, 101)}
    plan = X.physical_plan(probe)
    pf = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "PartitionFilters: []" not in ln
    ]
    assert pf and any("__ingest" in ln for ln in pf), plan[:1500]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    # the batch_features bypass must not reopen the manifest hole
    f_bad = D.minhash_features(batch, "doc_id", "text", 32, 3, 42)
    with pytest.raises(ValueError, match="32-hash"):
        D.minhash_store_probe(
            batch, path, "doc_id", "text", batch_features=f_bad,
            max_ingest_exclusive=1,
        )
    with pytest.raises(ValueError, match="32-hash"):
        D.append_minhash_store(f_bad, path, 2)


def test_compact_minhash_store_preserves_probe_results(spark, docs, tmp_path):
    """Store compaction (the log-structured store's OPTIMIZE): folding
    accumulated ingest partitions into one per directory must change NO
    probe result — same candidates, same pairs, same max_ingest_exclusive
    semantics for future batches — while collapsing the file count; only
    batch-layout stores are rejected."""
    import pytest

    path = str(tmp_path / "append_store")
    D.bootstrap_minhash_store(spark, path, num_prefixes=8)
    # accrete 4 single-doc ingests (4 leaf-file generations per dir)
    for i, did in enumerate([1, 2, 3, 4]):
        f = D.minhash_features(
            docs.filter(F.col("doc_id") == did), "doc_id", "text", 64, 3, 42
        )
        D.append_minhash_store(f, path, i)
    batch = docs.filter(F.col("doc_id") == 5).unionByName(
        docs.filter(F.col("doc_id") == 1).withColumn("doc_id", F.col("doc_id") + 100)
    )
    probe_kw = dict(threshold=0.5, max_ingest_exclusive=4)
    before = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_store_probe(batch, path, "doc_id", "text", **probe_kw).collect()
    }
    assert before  # 101 is a copy of 1: must pair with 1/2/3

    nf_before, nf_after = D.compact_minhash_store(spark, path, upto_exclusive=4)
    assert nf_after < nf_before, (nf_before, nf_after)
    after = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 6)
        for r in D.minhash_store_probe(batch, path, "doc_id", "text", **probe_kw).collect()
    }
    assert after == before

    # the loop continues on the compacted store: append the batch as
    # ingest 4, then probe a later batch against everything
    f4 = D.minhash_features(batch, "doc_id", "text", 64, 3, 42)
    D.append_minhash_store(f4, path, 4)
    nxt = docs.filter(F.col("doc_id") == 2).withColumn(
        "doc_id", F.col("doc_id") + 200
    )
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_store_probe(
            nxt, path, "doc_id", "text", threshold=0.5, max_ingest_exclusive=5
        ).collect()
    }
    # 202 is a copy of 2 (exact dup family of 1): pairs with 1, 2, 3, 101
    assert got == {(1, 202), (2, 202), (3, 202), (101, 202)}

    bpath = str(tmp_path / "batch_store")
    D.write_minhash_store(
        D.minhash_features(docs, "doc_id", "text", 64, 3, 42), bpath, num_prefixes=8
    )
    with pytest.raises(ValueError, match="batch-layout"):
        D.compact_minhash_store(spark, bpath, 1)
