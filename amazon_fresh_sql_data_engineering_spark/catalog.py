"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``.

The external driver samples the FIRST ~50 catalog entries (registration
order) for its per-round correctness gate, so ``_PRIORITY`` front-loads the
queries that most need driver-side evidence this round. CORRECTNESS_r08 was
50/50 green; cumulatively all 233 pre-r9 catalog queries have green driver
rows (r01 ∪ … ∪ r08), no query's latest row is red, and no latest row is
older than r4 (latest-round histogram r4:37, r5:46, r6:50, r7:50, r8:50).
Round 9 front-loads (a) the ONE new entry (q_zorder_roundtrip — the
driver-checked z-order storage round-trip, VERDICT r8 item 2), then (b)
the VERDICT r8 item-1 rotation: all 37 rows whose latest driver evidence
is r4 (CORRECTNESS_r04 order — q_profile_columns, which yielded its r8
slot, and the r4 tail), topped up with the 12 oldest r5 rows
(CORRECTNESS_r05 order). 1+37+12 = 50; after this round no driver row
anywhere in the union is older than r5.

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
    # --- round-9 block A: NEW entries (standing rule: new goes FRONT) ---
    "q_zorder_roundtrip",  # z-order storage round-trip (VERDICT r8 item 2)
    # --- round-9 block B: all 37 rows whose latest driver evidence is r4
    # (CORRECTNESS_r04 order; q_profile_columns yielded its r8 slot) ---
    "q_profile_columns",
    "text_repetition_filter",
    "text_decontaminate",
    "text_url_dedup",
    "events_cohort_retention",
    "op_set_ops_all",
    "op_outlier_zscore",
    "op_incremental_agg",
    "op_bloom_prune_join",
    "events_attribution",
    "op_skew_salted_join",
    "op_corpus_mixture",
    "text_vocab_coverage",
    "text_normalize",
    "text_line_dedup",
    "text_entropy_filter",
    "dedup_containment",
    "op_kmeans_refine",
    "text_winnow_fingerprint",
    "sim_ann_pq",
    "sim_ann_pq_rerank",
    "text_hashing_vectorizer",
    "q_expectations",
    "events_anomaly",
    "text_char_lm_score",
    "op_pagerank",
    "dedup_semantic",
    "op_bm25_search",
    "op_time_weighted_avg",
    "events_sliding_distinct",
    "op_cdc_apply",
    "op_snapshot_diff",
    "q_masked_view",
    "events_sliding_distinct_hll",
    "op_triangle_count",
    "op_interpolate_gaps",
    "events_markov_transitions",
    # --- round-9 block C: the 12 oldest r5 rows (CORRECTNESS_r05 order) ---
    "q_idremap_roundtrip",
    "events_ohlc",
    "op_chi_square",
    "op_ab_test_welch",
    "op_rfm_segmentation",
    "op_word_pmi",
    "events_time_to_convert",
    "events_ewma",
    "op_gini_concentration",
    "events_top_paths",
    "op_basket_lift",
    "op_abc_analysis",
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
