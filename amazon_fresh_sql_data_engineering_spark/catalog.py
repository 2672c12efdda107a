"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``.

The external driver samples the FIRST ~50 catalog entries (registration
order) for its per-round correctness gate, so ``_PRIORITY`` front-loads the
queries that most need driver-side evidence this round. CORRECTNESS_r06 was
50/50 green; cumulatively all 228 catalog queries have green driver rows
(r01 ∪ … ∪ r06) and no query's latest row is red. Round 7 front-loads
(a) the three NEW entries (dedup_store_probe — the on-disk minhash store,
VERDICT r6 item 2; op_mv_minmax — MIN/MAX view maintenance under deletes,
VERDICT r6 item 6; op_mv_join_agg — JOIN-view maintenance, session
addition), then (b) the VERDICT r6 item-1 rotation: the oldest remaining
evidence, by latest-driver-row round ascending — the 4 rows last sampled
in r1 (op_distinct_projection, op_asof_join, op_range_join,
op_percentiles), all 36 rows last sampled in r2 (CORRECTNESS_r02 order:
the q_pipe_clean_* family, DML queries, the dedup/similarity/multimodal/
text-extension cores), and the 7 oldest r3 rows (events_funnel yielded
its slot to the third new entry). 3+4+36+7 = 50; after this round no
driver row anywhere in the union is older than r3.

STANDING RULE (VERDICT r4 item 7): when the catalog grows after
convergence, new entries go to the FRONT of _PRIORITY in the same round
they land — never the back — so a never-sampled tail can't re-accumulate
(the r3 failure mode). Previously-green queries rotate to the back; the
full catalog is still oracle-checked locally every round
(scripts_parity_sweep.py / tests/test_oracle_parity.py), so rotation trades
no coverage — it converts local parity into driver-recorded evidence.
"""

from __future__ import annotations

from . import queries as _queries  # noqa: F401  (core relational operators)
from . import queries_analytics as _queries_analytics  # noqa: F401  (windows/rollup/pivot)
from . import queries_etl as _queries_etl  # noqa: F401  (DML/cleaning/audit)
from .registry import CATALOG, QuerySpec

try:  # extensions land in a later milestone
    from . import queries_ext as _queries_ext  # noqa: F401

    _EXT_LOADED = True
except ImportError:
    _EXT_LOADED = False

try:  # round-3 session additions (expectations/sampling/anomaly/char-LM)
    from . import queries_ml as _queries_ml  # noqa: F401
except ImportError:
    pass

try:  # round-3 session additions, batch 4 (stats/sequence analytics)
    from . import queries_stats as _queries_stats  # noqa: F401
except ImportError:
    pass

try:  # round-3 session additions, batch 11 (nonparametric inference/survival)
    from . import queries_sci as _queries_sci  # noqa: F401
except ImportError:
    pass

_PRIORITY = [
    # --- round-7 block A: NEW entries (standing rule: new goes FRONT) ---
    "dedup_store_probe",  # on-disk pruned minhash feature store probe
    "op_mv_minmax",  # MIN/MAX MV maintenance via targeted recompute
    "op_mv_join_agg",  # JOIN-view maintenance (fact delta x broadcast dim)
    # --- round-7 block B: the 4 rows whose latest driver evidence is r1 ---
    "op_distinct_projection",
    "op_asof_join",
    "op_range_join",
    "op_percentiles",
    # --- round-7 block C: all 36 rows whose latest driver evidence is r2
    # (CORRECTNESS_r02 order) ---
    "op_win_share_of_total",
    "op_approx_count_distinct",
    "op_approx_percentile",
    "op_zscore_outliers",
    "q_clean_scalars",
    "q_pipe_clean_customers",
    "q_pipe_clean_orders",
    "q_pipe_clean_products",
    "q_pipe_clean_order_details",
    "q_pipe_clean_reviews",
    "q_pipe_placeholder_parents",
    "q_normalize_3nf",
    "q_audit_report",
    "q_update_set",
    "q_update_from",
    "q_delete",
    "q_upsert",
    "q_cascade_delete",
    "q_insert_values",
    "q_scd2_merge",
    "pipe_training_corpus",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "dedup_cluster_corpus",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "text_stats",
    "text_quality_langid",
    "text_tfidf_top_terms",
    "mm_decode",
    "mm_frame_sample",
    "mm_embed_ann",
    # --- round-7 block D: the oldest r3 rows (CORRECTNESS_r03 order;
    # events_funnel yields its slot to the third new entry — it stays
    # green-r3 and rotates next round) ---
    "q_pipe_clean_suppliers",
    "mm_decode_quarantine",
    "dedup_ngram_jaccard_maxdf",
    "q_constraint_catalog",
    "events_hourly",
    "events_sessionize",
    "events_dedup",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in CATALOG]
    if missing and _EXT_LOADED:
        # fail loudly: a typo here would silently demote a query
        raise RuntimeError(f"catalog priority references unknown queries: {missing}")
    # extensions module absent (degraded install): order what did register
    ordered = {n: CATALOG[n] for n in _PRIORITY if n in CATALOG}
    ordered.update((n, s) for n, s in CATALOG.items() if n not in ordered)
    CATALOG.clear()
    CATALOG.update(ordered)


_reorder()

__all__ = ["CATALOG", "QuerySpec"]
