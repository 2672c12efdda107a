"""Aggregated query catalog: importing this module registers every query
family into ``registry.CATALOG``.

The external driver samples the FIRST ~50 catalog entries (registration
order) for its per-round correctness gate, so ``_PRIORITY`` front-loads the
queries that most need driver-side evidence this round. Rounds 1-4 put 180
distinct queries on green driver rows (CORRECTNESS_r01 ∪ … ∪ r04); round 5
front-loads (a) the new PIPE-IDREMAP driver shape (VERDICT r4 item 5), (b)
one re-evidence query per two-phase window family member — rank / ntile /
lead / cumsum — because the round-5 deterministic-boundary rewrite of
operators/ranking.py changed every consumer's plan, then (c) ALL 45
remaining never-driver-sampled queries (the queries_stats/queries_sci tail,
registration order) — 1+4+45 = 50, so this round converges driver evidence
to the full catalog (VERDICT r4 item 1). Catalog growth stays frozen until
the convergence lands.

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
    # --- round-5 block 1: the new PIPE-IDREMAP driver shape (new catalog
    # entries always go FRONT — see the standing rule above) ---
    "q_idremap_roundtrip",
    # --- round-5 block 2: plan-changed re-evidence — the deterministic
    # literal-boundary pid rewrite of operators/ranking.py touched every
    # two-phase consumer; one representative per family member ---
    "q_high_value",  # global_rank
    "op_win_ntile",  # global_ntile
    "op_seq_gaps",  # global_lead
    "op_pack_sequences",  # global_cumsum
    # --- round-5 block 3: the 45 never-driver-sampled names (registration
    # order) — with blocks 1-2 exactly the driver's ~50 sample, converging
    # driver evidence to all 226 catalog queries ---
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
    "op_benford",
    "events_inter_arrival",
    "op_seasonality",
    "op_mad_outliers",
    "op_xcorr_lagged",
    "text_zipf_fit",
    "events_dau_wau_mau",
    "op_embedding_norm_stats",
    "events_bot_detection",
    "events_window_funnel",
    "events_error_budget",
    "op_mann_whitney",
    "op_ks_test",
    "op_survival_km",
    "events_heavy_hitters_cms",
    "op_pca_power",
    "op_holt_linear",
    "op_cohort_ltv",
    "events_concurrency_peak",
    "q_dp_release",
    "op_metric_decomposition",
    "op_bootstrap_ci",
    "events_forecast_backtest",
    "op_neyman_allocation",
    "op_join_size_estimate",
    "q_gdpr_erasure",
    "op_gains_chart",
    "op_shard_plan",
    "events_shapley_attribution",
    "op_diff_in_diff",
    "op_cuped",
    "op_kmv_distinct",
    "op_winsorized_mean",
    "op_price_elasticity",
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
