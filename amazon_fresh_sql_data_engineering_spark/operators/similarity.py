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

from ..functions.vectors import cosine, to_double


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


def _sign_buckets(vec_col, planes: np.ndarray, bands: int) -> list:
    """Band the sign bits of plane projections into ``bands`` bucket keys."""
    n_planes = planes.shape[0]
    per_band = n_planes // bands
    v = to_double(vec_col)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    keys = []
    for b in range(bands):
        key = F.lit(b * (1 << (per_band + 1)))
        for i in range(per_band):
            key = key + bits[b * per_band + i] * F.lit(1 << i)
        keys.append(key)
    return keys


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
    and broadcast back as literals, so assignment is one narrow pass over
    the corpus; at 100 TB the corpus would be *written* partitioned by
    cluster id, making each probe a partition-pruned scan.
    """
    cent_rows = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy("cid")
        .limit(n_clusters)
        .collect()
    )
    centroids = [(int(r.cid), [float(x) for x in r.v]) for r in cent_rows]

    def nearest_clusters(df, id_cols, n_take):
        v = to_double(F.col(vec_col))
        dots = F.array(
            *[
                F.struct(
                    cosine(v, F.array(*[F.lit(x) for x in cvec])).alias("sim"),
                    F.lit(ci).alias("cluster"),
                )
                for ci, cvec in centroids
            ]
        )
        top = F.slice(F.reverse(F.array_sort(dots)), 1, n_take)
        return df.select(
            *id_cols, F.explode(F.transform(top, lambda s: s["cluster"])).alias("__cluster")
        )

    corpus_assigned = nearest_clusters(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), vec_col), ["neighbor_id", vec_col], 1
    ).withColumnRenamed(vec_col, "__cv")
    query_probes = nearest_clusters(
        queries.select(F.col(query_id).alias("query_id"), vec_col), ["query_id", vec_col], n_probe
    ).withColumnRenamed(vec_col, "__qv")

    cand = (
        query_probes.join(corpus_assigned, on="__cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(to_double(F.col("__qv")), to_double(F.col("__cv"))), 6).alias(
            "cosine_sim"
        ),
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

    def banded(df, id_alias):
        keys = _sign_buckets(F.col(vec_col), planes, bands)
        return df.select(
            F.col(id_alias[0]).alias(id_alias[1]),
            F.col(vec_col).alias(id_alias[2]),
            F.explode(F.array(*[key.cast("long") for key in keys])).alias("__bucket"),
        )

    q = banded(queries, (query_id, "query_id", "__qv"))
    c = banded(corpus, (corpus_id, "neighbor_id", "__cv"))
    cand = (
        q.join(c, on="__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(to_double(F.col("__qv")), to_double(F.col("__cv"))), 6).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
