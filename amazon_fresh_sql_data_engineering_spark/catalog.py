"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``.

The external driver samples the FIRST ~50 catalog entries (registration
order) for its per-round correctness gate, so ``_PRIORITY`` front-loads the
queries that most need driver-side evidence this round. CORRECTNESS_r07 was
50/50 green; cumulatively all 231 catalog queries have green driver rows
(r01 ∪ … ∪ r07), no query's latest row is red, and no latest row is older
than r3. Round 8 front-loads (a) the TWO new entries (op_mv_dim_update —
dim-side JOIN-view maintenance, VERDICT r7 item 3; op_mv_var — variance
views via the existing delta rule), then (b) the VERDICT r7 item-1
rotation: all 38 rows whose latest driver evidence is r3
(CORRECTNESS_r03 order — events_funnel and the r3 tail), topped up with
the 10 oldest r4 rows (CORRECTNESS_r04 order; q_profile_columns yielded
its slot to the second new entry). 2+38+10 = 50; after this round no
driver row anywhere in the union is older than r4.

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
    # --- round-8 block A: NEW entries (standing rule: new goes FRONT) ---
    "op_mv_dim_update",  # dim-side JOIN-view maintenance (VERDICT r7 item 3)
    "op_mv_var",  # variance MV via the delta rule (sums-derivable evidence)
    # --- round-8 block B: all 38 rows whose latest driver evidence is r3
    # (CORRECTNESS_r03 order) ---
    "events_funnel",
    "events_props_json",
    "events_props_struct",
    "events_time_rollup",
    "events_enriched",
    "text_fingerprint",
    "text_chunk_sliding",
    "text_pii_redact",
    "text_ngram_counts",
    "text_bpe_tokens",
    "mm_resize",
    "op_hash_split",
    "op_stratified_sample",
    "op_histogram",
    "op_skew_two_phase_agg",
    "op_grouping_sets",
    "op_win_distinct_count",
    "op_fuzzy_match",
    "op_forward_fill",
    "op_posexplode",
    "op_join_full",
    "op_unpivot",
    "op_datetime_funcs",
    "op_string_funcs",
    "op_win_range_frame",
    "op_mode_per_group",
    "op_win_navigation",
    "op_agg_corr",
    "op_min_by_max_by",
    "op_string_agg",
    "op_try_funcs",
    "op_cross_join_grid",
    "op_topn_per_group",
    "op_date_spine",
    "op_percent_rank",
    "op_market_basket",
    "op_bitwise_aggs",
    "q_sql_interface",
    # --- round-8 block C: the 10 oldest r4 rows (CORRECTNESS_r04 order) ---
    "op_vector_centroids",
    "op_collect_agg",
    "op_regexp_extract_all",
    "op_bool_aggs",
    "op_seasonal_decompose",
    "op_skew_report",
    "op_label_propagation",
    "op_weighted_sample",
    "q_csv_staging_roundtrip",
    "q_ctas_roundtrip",
    # (q_profile_columns yielded its slot to the second new entry — it
    # stays green-r4 and rotates next round)
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
