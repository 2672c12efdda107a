"""Similarity search over embedding columns (BASELINE.json scope).

Two tiers, as any production vector path:
- :func:`cosine_topk_bruteforce` — exact top-k: queries x corpus join with
  JVM-side cosine, per-query top-k via a window. Correctness baseline; the
  join is queries-broadcast x corpus-scan, so it scales linearly in corpus
  size but only for small query sets.
- :func:`lsh_topk` — sign-LSH bucketed candidates + exact rerank: the scale
  path. Candidates come from equi-joining on any of ``n_bands`` bucket keys
  (multi-probe by banding), so the corpus is never crossJoined; recall is
  tunable via bands/planes and measured in tests against brute force.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    cosine,
    cosine_pairs,
    matrix_cosine_top_udf,
    matrix_dots_udf,
    to_double,
)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k,
    deterministic tiebreak on (rounded cosine desc, neighbor id).
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), to_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), to_double(F.col(vec_col)).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _band_keys(bits, n_planes: int, bands: int):
    """Band an ``array<int>`` of sign bits into ``bands`` bucket keys
    (band index folded into the key so buckets never collide across
    bands)."""
    per_band = n_planes // bands
    keys = []
    for b in range(bands):
        key = F.lit(b * (1 << (per_band + 1)))
        for i in range(per_band):
            key = key + F.element_at(bits, b * per_band + i + 1) * F.lit(1 << i)
        keys.append(key.cast("long"))
    return F.array(*keys)


def _band_keys_from_dots(dots, n_planes: int, bands: int):
    """Same band keys, but straight from an ``array<double>`` of plane
    dot products (sign >= 0 -> bit 1): keeps banding as flat codegen-able
    element_at/CASE expressions over the UDF output column."""
    per_band = n_planes // bands
    keys = []
    for b in range(bands):
        key = F.lit(b * (1 << (per_band + 1)))
        for i in range(per_band):
            bit = F.when(F.element_at(dots, b * per_band + i + 1) >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            key = key + bit
        keys.append(key.cast("long"))
    return F.array(*keys)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into inverted
    lists by nearest centroid, search only ``n_probe`` lists per query.

    Centroids are sampled deterministically (first ``n_clusters`` corpus
    vectors by id) — no Lloyd iterations, so assignment is reproducible
    and training-free; recall is tuned by n_probe (measured in tests).
    Centroids are collected to the driver (k x dim floats — metadata-sized)
    and ship inside the assign/probe pandas UDF (one BLAS matmul + argsort
    per Arrow batch — the interpreted per-centroid cosine HOF was the
    hottest path of this query); assignment stays one narrow pass over the
    corpus, no shuffle. At 100 TB the corpus would be *written* partitioned
    by cluster id, making each probe a partition-pruned scan.
    """
    cent_rows = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy("cid")
        .limit(n_clusters)
        .collect()
    )
    labels = [int(r.cid) for r in cent_rows]
    matrix = [[float(x) for x in r.v] for r in cent_rows]
    assign1 = matrix_cosine_top_udf(matrix, labels, 1)
    probe_n = matrix_cosine_top_udf(matrix, labels, n_probe)

    corpus_assigned = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("__cluster"),
    )
    query_probes = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_n(F.col(vec_col))).alias("__cluster"),
    )

    # no distinct needed: each corpus row lands in exactly one inverted list
    # and a query's probe clusters are distinct, so a (query, neighbor) pair
    # can surface at most once — skipping it saves a full shuffle of the
    # embedding arrays.
    cand = (
        query_probes.join(corpus_assigned, on="__cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_pairs(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH band bucket,
    then exact cosine reranks. Same output schema as brute force."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    plane_dots = matrix_dots_udf(planes)

    def banded(df, id_alias):
        # plane dot products come from one numpy matmul per Arrow batch
        # (the interpreted per-plane HOF dot was the hot path); they land
        # in their own projection so CollapseProject won't duplicate the
        # UDF per element_at in the band keys.
        with_dots = df.select(
            F.col(id_alias[0]).alias(id_alias[1]),
            plane_dots(F.col(vec_col)).alias("__dots"),
        )
        return with_dots.select(
            id_alias[1],
            F.explode(_band_keys_from_dots(F.col("__dots"), n_planes, bands)).alias("__bucket"),
        )

    # candidates dedup on (query, neighbor) IDS ONLY — a pair colliding in
    # several bands must rerank once, but shuffling the embedding arrays
    # xbands through the join and distinct is the wrong plan at scale; the
    # vectors re-attach afterwards via two equi-joins (AQE broadcasts the
    # small sides).
    q = banded(queries, (query_id, "query_id"))
    c = banded(corpus, (corpus_id, "neighbor_id"))
    cand = (
        q.join(c, on="__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cand.join(qv, on="query_id")
        .join(cv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_pairs(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str,
    query_pred,
    k: int = 5,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jegou/Douze/Schmid 2011): third index tier
    next to :func:`lsh_topk` (hash buckets) and :func:`ivf_topk` (coarse
    clusters) — PQ is the *memory* lever: each vector is stored as
    ``n_subspaces`` one-byte codes (here 4 B vs 256 B of raw float64), which
    is what lets a 100 TB corpus keep its whole index in executor memory.

    Engine-portable training discipline (op_kmeans_refine family):
    codebooks are per-subspace k-means with init = the ``n_codes`` lowest
    corpus ids, ONE Lloyd refinement, means ROUNDED to 6 dp; assignment
    distance is the sequential-fold squared L2 (both engines add in array
    order), ties to the lowest code id. Search is asymmetric distance
    (ADC): per query one ``n_subspaces x n_codes`` lookup table against the
    REAL query subvectors, summed over subspaces via an s-ordered fold,
    ROUNDED, then rank with (dist, id) tiebreak.

    Scale shape: codebook and ADC tables are (queries x m x k) metadata —
    always broadcast; the corpus is scanned once to encode (no shuffle) and
    the search join is code-keyed, so nothing all-pairs ever forms.

    ``rerank > 0`` adds the production second stage (IVFADC + rerank):
    the ADC pass keeps a shortlist of ``rerank`` candidates per query, the
    raw vectors of ONLY those candidates are fetched by an id-equi-join,
    and the final top-k is exact squared-L2 on the shortlist — quantization
    error then only costs recall when a true neighbor misses the whole
    shortlist. ``dist`` in the output is the exact distance in that mode.

    Returns (query_id, neighbor_id, approx_dist, rank), self excluded.
    """
    e = corpus.select(
        F.col(corpus_id).alias("__id"), to_double(F.col(vec_col)).alias("__v")
    )
    sub = e.select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.lit(n_subspaces - 1))).alias("s"),
        F.expr(f"slice(__v, s * {sub_dim} + 1, {sub_dim})").alias("u"),
    )

    def dist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def assign(cents):
        d = sub.join(F.broadcast(cents), "s")
        return (
            d.select("__id", "s", "cid", "u", dist("u", "c").alias("d"))
            .groupBy("__id", "s")
            .agg(F.min(F.struct("d", "cid", "u")).alias("b"))
            .select("__id", "s", F.col("b.cid").alias("cid"), F.col("b.u").alias("u"))
        )

    c0 = sub.where(F.col("__id") < n_codes).select(
        "s", F.col("__id").alias("cid"), F.col("u").alias("c")
    )
    c1 = (
        assign(c0)
        .select("s", "cid", F.posexplode("u").alias("pos", "x"))
        .groupBy("s", "cid", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("s", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda st: st["m"],
            ).alias("c")
        )
        # feeds both the encode pass and every ADC table; m*k rows of
        # metadata — fence with AQE-sized partitions (see graph.py note)
        .localCheckpoint(eager=True)
    )
    codes = assign(c1).select("__id", "s", "cid")
    qs = sub.where(query_pred(F.col("__id"))).select(
        F.col("__id").alias("query_id"), "s", F.col("u").alias("qu")
    )
    dt = qs.join(F.broadcast(c1), "s").select(
        "query_id", "s", "cid", dist("qu", "c").alias("d")
    )
    tot = (
        codes.join(F.broadcast(dt), ["s", "cid"])
        .groupBy("query_id", F.col("__id").alias("neighbor_id"))
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("s", "d"))),
                        lambda st: st["d"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("approx_dist")
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
    adc = (
        tot.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= (rerank if rerank > 0 else k))
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )
    if rerank <= 0:
        return adc
    qv = e.where(query_pred(F.col("__id"))).select(
        F.col("__id").alias("query_id"), F.col("__v").alias("__qv")
    )
    cand = (
        adc.select("query_id", "neighbor_id")
        .join(e, F.col("neighbor_id") == F.col("__id"))
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dist("__qv", "__v"), 6).alias("exact_dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy("exact_dist", "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "exact_dist", "rank")
    )
