"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``.

The external driver samples the FIRST ~50 catalog entries (registration
order) for its per-round correctness gate, so ``_PRIORITY`` front-loads the
queries that most need driver-side evidence this round. CORRECTNESS_r05 was
50/50 green, converging cumulative driver evidence to all 226 catalog
queries (r01 ∪ … ∪ r05); every query's latest driver row is green. Round 6
front-loads (a) the two NEW entries (dedup_incremental — VERDICT r5 item 5;
op_mv_incremental — the incremental-MV shape from the r5 queue), (b) the
three two-phase consumers whose green rows predate the r5 ranking rewrite
(VERDICT r5 item 1: q_product_sales_rank, q_top_customers_period,
op_histogram_equidepth), (c) one re-evidence query per two-phase family
member because round 6's probe-first boundary build (ranking.py _prepare)
again touched every consumer, (d) op_item_cf_jaccard, whose basket fence
moved from localCheckpoint to a persist pin, then (e) a back-rotation of
the 40 oldest-evidence (r1) core-operator rows — scans/filters/joins/aggs/
windows whose evidence is five rounds stale. 2+3+4+1+40 = 50.

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
    # --- round-6 block A: NEW entries (standing rule: new goes FRONT) ---
    "dedup_incremental",  # incremental near-dedup vs a feature store
    "op_mv_incremental",  # incremental materialized-view maintenance
    # --- round-6 block B: two-phase consumers whose green rows predate the
    # r5 ranking rewrite (VERDICT r5 item 1) ---
    "q_product_sales_rank",
    "q_top_customers_period",
    "op_histogram_equidepth",
    # --- round-6 block C: re-evidence per two-phase family member after
    # the probe-first boundary build (one limit-collect replaces the
    # count+sample job pair; op_seq_gaps additionally moved to pin=None) ---
    "q_high_value",  # global_rank
    "op_win_ntile",  # global_ntile
    "op_seq_gaps",  # global_lead
    "op_pack_sequences",  # global_cumsum
    # --- round-6 block D: fence change (localCheckpoint -> persist pin) ---
    "op_item_cf_jaccard",
    # --- round-6 block E: back-rotation of the 40 oldest-evidence rows
    # (r1, CORRECTNESS_r01 order) — core relational surface refreshed on
    # the current engine ---
    "op_scan",
    "op_project",
    "op_filter_eq",
    "op_filter_ci",
    "op_filter_date",
    "op_filter_range",
    "op_filter_null",
    "op_filter_regex",
    "op_filter_in_list",
    "op_filter_complement",
    "op_join_inner",
    "op_join_inner_expr",
    "op_join_left",
    "op_join_multi",
    "op_join_semi",
    "q_no_orders",
    "op_corr_scalar_subquery",
    "op_agg_counts",
    "q1_pricing_summary",
    "op_agg_having",
    "op_agg_sum_coalesce",
    "q_prime_cities",
    "op_agg_scalars_report",
    "op_win_rownum_dedup",
    "op_topk",
    "op_topk_ties",
    "op_sort_nulls",
    "op_set_union",
    "op_set_intersect_except",
    "q_order_revenue",
    "q_supplier_stock",
    "q_top3_products",
    "q_top_categories",
    "op_win_lead_lag",
    "op_win_running_total",
    "op_win_moving_avg",
    "op_rollup",
    "op_cube",
    "op_pivot",
    "op_agg_stats",
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
