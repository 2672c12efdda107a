"""Plan-quality gates (SURVEY.md §4): these tests pin the physical-plan
properties that make the engine viable at 100 TB — filter pushdown to the
parquet scan, column pruning, broadcast of small dimensions, distributed
top-k, and no shuffle explosions. A regression here is a performance bug
even when results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
from amazon_fresh_sql_data_engineering_spark.plans import explain as X
from amazon_fresh_sql_data_engineering_spark.sources import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = CATALOG["op_filter_eq"].fn(spark, sf_dir)
    pf = X.pushed_filters(df)
    assert "c_mktsegment" in pf and ("EqualTo" in pf or "=" in pf), pf


def test_range_filter_pushdown(spark, sf_dir):
    df = CATALOG["op_filter_range"].fn(spark, sf_dir)
    pf = X.pushed_filters(df)
    assert "l_quantity" in pf and "l_shipdate" in pf, pf


def test_column_pruning(spark, sf_dir):
    # 2-column projection from the 11-column lineitem must scan <= 4 cols
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    rs = X.read_schema(df)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs, rs


def test_small_dim_broadcasts(spark, sf_dir):
    df = CATALOG["op_join_multi"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df), X.physical_plan(df)[:2000]


def test_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    df = CATALOG["op_topk"].fn(spark, sf_dir)
    assert X.has_take_ordered(df), X.physical_plan(df)[:2000]


def test_q1_single_shuffle(spark, sf_dir):
    # partial+final hash agg -> exactly one exchange
    df = CATALOG["q1_pricing_summary"].fn(spark, sf_dir)
    assert X.shuffle_count(df) <= 1, X.physical_plan(df)[:3000]


def test_semi_anti_join_planned(spark, sf_dir):
    plan = X.physical_plan(CATALOG["q_no_orders"].fn(spark, sf_dir))
    assert "LeftAnti" in plan or "left_anti" in plan.lower()
    plan = X.physical_plan(CATALOG["op_join_semi"].fn(spark, sf_dir))
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE wraps the plan pre-execution, hiding codegen subtrees; build the
    # same plan with AQE off to introspect codegen, then restore.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = CATALOG["q1_pricing_summary"].fn(spark, sf_dir)
        assert X.codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_vectorized_scan_and_partial_agg(spark, sf_dir):
    df = CATALOG["q1_pricing_summary"].fn(spark, sf_dir)
    assert X.vectorized_scan(df), "parquet scan fell out of the vectorized reader"
    assert X.partial_aggregation_present(df), "no map-side partial aggregation"


def test_events_scan_prunes_columns(spark, sf_dir):
    df = CATALOG["events_hourly"].fn(spark, sf_dir)
    rs = X.read_schema(df)
    assert "props" not in rs, rs  # unused wide column must not be read


@pytest.mark.parametrize(
    "name", ["q_high_value", "q_order_revenue", "q_top_categories", "op_join_multi"]
)
def test_no_cartesian_in_catalog_joins(spark, sf_dir, name):
    plan = X.physical_plan(CATALOG[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"


def test_broadcast_hint_respected_in_corr_subquery(spark, sf_dir):
    df = CATALOG["op_corr_scalar_subquery"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_asof_join_is_single_shuffle_merge(spark, sf_dir):
    """asof_join must be the union-merge plan: exactly one Exchange, one
    Sort, one Window — never a per-key range join (O(pairs))."""
    import re

    plan = X.physical_plan(CATALOG["op_asof_join"].fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_broadcasts_promo_side(spark, sf_dir):
    """Interval join must broadcast the window side: BroadcastNestedLoopJoin
    with zero pre-join shuffles of the fact table."""
    plan = X.physical_plan(CATALOG["op_range_join"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["q_high_value", "q_product_sales_rank", "q_top_customers_period", "op_seq_gaps"],
)
def test_global_rank_has_no_single_partition_stage(spark, sf_dir, name):
    """Two-phase global rank (operators/ranking.py): the whole plan must be
    free of Exchange SinglePartition — the classic global-window bottleneck
    (VERDICT r2 flagged the old single-window form as the #1 scale hazard)."""
    plan = X.physical_plan(CATALOG[name].fn(spark, sf_dir))
    assert "SinglePartition" not in plan, f"{name}: single-partition stage in plan"
    assert "Window" in plan  # local rank still runs as a window


def test_global_ntile_single_partition_is_metadata_only(spark, sf_dir):
    """global_ntile needs one scalar (total count) aggregated from the
    per-partition counts; that is the ONLY single-partition exchange allowed
    and it sees <= shuffle-partition-count rows."""
    plan = X.physical_plan(CATALOG["op_win_ntile"].fn(spark, sf_dir))
    assert plan.count("SinglePartition") <= 1, plan[:3000]


def test_approx_percentile_error_bounded(spark, sf_dir):
    ex = {r.o_orderpriority: (r.p50, r.p90) for r in CATALOG["op_percentiles"].fn(spark, sf_dir).collect()}
    ap = {
        r.o_orderpriority: (r.exact_p50, r.exact_p90, r.p50_in_bounds, r.p90_in_bounds)
        for r in CATALOG["op_approx_percentile"].fn(spark, sf_dir).collect()
    }
    for k in ex:
        # exact percentile_disc tracks the interpolated percentile closely
        assert abs(ap[k][0] - ex[k][0]) / ex[k][0] < 0.02
        assert abs(ap[k][1] - ex[k][1]) / ex[k][1] < 0.02
        # and the GK sketch landed inside the exact [p45,p55]/[p85,p95] envelope
        assert ap[k][2] and ap[k][3]


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """Order sampling must plan as TakeOrderedAndProject (per-partition
    top-k + k-row driver merge), never a global sort of the table."""
    df = CATALOG["op_weighted_sample"].fn(spark, sf_dir)
    assert X.has_take_ordered(df), X.physical_plan(df)[:2000]


def test_bm25_broadcasts_model_sides(spark, sf_dir):
    """df (|terms| rows) and corpus stats (1 row) must broadcast — the
    doc-sized side may not shuffle for them."""
    df = CATALOG["op_bm25_search"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df)
    assert X.has_take_ordered(df), X.physical_plan(df)[:2000]


def test_char_lm_model_broadcasts(spark, sf_dir):
    df = CATALOG["text_char_lm_score"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df), X.physical_plan(df)[:2000]


def test_pagerank_no_cartesian_and_bounded_shuffles(spark, sf_dir):
    """Two PageRank iterations = edges⋈ranks + dst-agg + node join per
    iteration. Shuffle count must stay linear in iterations (no plan
    blowup), and there must be no cartesian product."""
    plan = X.physical_plan(CATALOG["op_pagerank"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    df = CATALOG["op_pagerank"].fn(spark, sf_dir)
    assert X.shuffle_count(df) <= 14, X.shuffle_count(df)


def test_semantic_dedup_pairs_stay_cluster_keyed(spark, sf_dir):
    """The pairwise stage must join on cid (cluster-bounded quadratic),
    never cross-cluster: no cartesian in the plan; centroid side
    broadcasts."""
    plan = X.physical_plan(CATALOG["dedup_semantic"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    )
    assert "BroadcastExchange" in plan


def test_rls_predicate_pushes_into_scan(spark, sf_dir):
    """Row-level security is an ordinary filter — it must reach the
    parquet scan, not run post-masking."""
    df = CATALOG["q_masked_view"].fn(spark, sf_dir)
    pf = X.pushed_filters(df)
    assert "c_acctbal" in pf, pf


def test_triangle_count_single_wedge_pass_no_cartesian(spark, sf_dir):
    """Wedge enumeration and the closing probe are equi-joins on node
    ids, run EXACTLY ONCE (the per-corner counting is one explode, not a
    3-way union that would replay the joins); the degree broadcast lives
    inside the checkpointed orientation segment, so the final plan reads
    the oriented edges as a single fenced scan."""
    df = CATALOG["op_triangle_count"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "CartesianProduct" not in plan
    import re

    # formatted explain shows each operator in the tree AND its detail
    # section — count the numbered detail headers only
    wedge_joins = len(
        re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin)", plan)
    )
    assert wedge_joins <= 2, plan[:2000]


def test_pq_adc_is_rowlocal_arrow_pass(spark, sf_dir):
    """PQ search (r12 form): codebook + ADC tables are metadata collected
    to the driver and applied row-locally — the ADC pass is ONE Arrow UDF
    over the corpus with NO join of any kind, and the only shuffle left is
    the per-query top-k window. The rerank variant's shortlist fetch must
    stream the corpus through broadcast joins (never an SMJ/cartesian on
    the raw vectors)."""
    import re

    plan = X.physical_plan(CATALOG["sim_ann_pq"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan[:2000]
    assert "ArrowEvalPython" in plan, plan[:2000]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan[:2000]

    rplan = X.physical_plan(CATALOG["sim_ann_pq_rerank"].fn(spark, sf_dir))
    assert "CartesianProduct" not in rplan
    assert "SortMergeJoin" not in rplan, rplan[:2000]
    assert "BroadcastExchange" in rplan, rplan[:2000]


def test_winnowing_is_window_over_single_doc_shuffle(spark, sf_dir):
    """Winnowing = gram explode consumed by ONE doc-keyed window pass +
    distinct + final agg; no joins at all."""
    df = CATALOG["text_winnow_fingerprint"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert X.shuffle_count(df) <= 3, X.shuffle_count(df)


def test_interpolate_gaps_no_single_partition_windows(spark, sf_dir):
    """Both interpolation window passes partition by event_type — no
    global single-partition window; spine generation is an explode, not
    a join against a calendar table."""
    df = CATALOG["op_interpolate_gaps"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_cms_sketch_tables_broadcast(spark, sf_dir):
    """events_heavy_hitters_cms: the 64-cell sketch tables must join back
    to candidates as broadcasts, and the top-20 must be distributed
    TakeOrderedAndProject, not a global sort."""
    df = CATALOG["events_heavy_hitters_cms"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df), X.physical_plan(df)[:2000]
    assert X.has_take_ordered(df), X.physical_plan(df)[:2000]


def test_mann_whitney_and_ks_windows_never_global(spark, sf_dir):
    """The rank/ECDF cumulative passes must be the two-phase form: every
    Window partitions by the range-pid."""
    for name in ("op_mann_whitney", "op_ks_test", "op_survival_km"):
        plan = X.physical_plan(CATALOG[name].fn(spark, sf_dir))
        bad = [
            ln
            for ln in plan.splitlines()
            if "Window" in ln and "__gr_pid" not in ln and "windowspec" not in ln.lower()
            and ln.strip().startswith(("Window", "+- Window", ":- Window"))
            and "partitionBy" not in ln  # formatting guard
        ]
        for ln in bad:
            assert "__gr_pid" in ln, (name, ln)


def test_gains_chart_decile_window_metadata_only(spark, sf_dir):
    """op_gains_chart's only unpartitioned window runs over the 10 decile
    rows (documented metadata-grain exception); the customer-grain NTILE
    must be pid-partitioned."""
    plan = X.physical_plan(CATALOG["op_gains_chart"].fn(spark, sf_dir))
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or ln.strip().startswith("Window")]
    unpartitioned = [ln for ln in windows if "__gr_pid" not in ln]
    # at most the decile cumulative (over <= 10 rows) may be global
    assert len(unpartitioned) <= 1, plan[:3000]


def test_dp_release_adds_no_shuffle_beyond_aggregate(spark, sf_dir):
    """The DP layer is a pure map over the aggregate — the whole release
    must plan with a single exchange (broadcast joins excluded)."""
    df = CATALOG["q_dp_release"].fn(spark, sf_dir)
    assert X.shuffle_count(df) <= 1, X.physical_plan(df)[:3000]


def test_diff_in_diff_year_filter_pushes_down(spark, sf_dir):
    """The two-year restriction must reach the parquet scan."""
    df = CATALOG["op_diff_in_diff"].fn(spark, sf_dir)
    pf = X.pushed_filters(df)
    assert "o_orderdate" in pf, pf


def test_shapley_lattice_joins_are_broadcasts(spark, sf_dir):
    """The 16-row coalition lattice must never shuffle the mask counts —
    containment and marginal joins broadcast."""
    df = CATALOG["events_shapley_attribution"].fn(spark, sf_dir)
    assert X.has_broadcast_join(df), X.physical_plan(df)[:2000]


def test_bootstrap_fanout_is_broadcast_nested_loop_free(spark, sf_dir):
    """The 32-replica fan-out crossJoin must plan as a broadcast of the
    replica list, never a shuffled cartesian."""
    plan = X.physical_plan(CATALOG["op_bootstrap_ci"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:3000]


def test_skew_report_hottest_key_is_argmax_not_window(spark, sf_dir):
    """op_skew_report's hottest key must come from the min_by argmax folded
    into the stats aggregate — the r3 form ran row_number over
    PARTITION BY key_col, i.e. every distinct key of a fact column sorted
    through 3 data-sized partitions (the exact hazard the report warns
    about). No Window may appear anywhere in the plan."""
    plan = X.physical_plan(CATALOG["op_skew_report"].fn(spark, sf_dir))
    assert "Window" not in plan, plan[:3000]


def test_item_cf_basket_cap_window_is_user_partitioned(spark, sf_dir):
    """op_item_cf_jaccard's only windows are user/item-partitioned
    (the basket-cap row_number and the neighbour rank) — never global."""
    plan = X.physical_plan(CATALOG["op_item_cf_jaccard"].fn(spark, sf_dir))
    assert "SinglePartition" not in plan, plan[:3000]


# Frozen per-query SinglePartition budgets (round-4 catalog-wide audit).
# Every entry was inspected: all are metadata-grain — final single-partition
# aggregates of partial (per-partition) rows, scalar subqueries, or windows
# over <= |deciles|/|cells| rows (the op_gains_chart / global_ntile class).
# A query NOT listed here must plan with ZERO single-partition exchanges;
# growing any budget requires re-auditing the query (this is the gate that
# would have caught op_skew_report's data-sized window before round 3
# shipped it).
_SINGLE_PARTITION_BUDGET = {
    "q_profile_columns": 1,
    "op_histogram_equidepth": 1,
    "op_corpus_mixture": 1,
    "sim_ann_pq_rerank": 1,
    "q_expectations": 3,
    "text_char_lm_score": 1,
    "op_bm25_search": 1,
    "op_chi_square": 1,
    "op_rfm_segmentation": 1,
    "op_word_pmi": 1,
    "events_time_to_convert": 1,
    "op_gini_concentration": 3,
    "op_basket_lift": 1,
    "op_abc_analysis": 1,
    "op_benford": 1,
    "op_xcorr_lagged": 2,
    "text_zipf_fit": 1,
    "events_window_funnel": 1,
    "events_error_budget": 1,
    "op_mann_whitney": 1,
    "op_ks_test": 1,
    "op_pca_power": 3,
    "events_concurrency_peak": 4,
    "op_bootstrap_ci": 2,
    "op_neyman_allocation": 1,
    "op_join_size_estimate": 3,
    "q_gdpr_erasure": 3,
    "op_gains_chart": 4,
    "op_diff_in_diff": 1,
    "op_cuped": 1,
    "op_agg_counts": 1,
    "op_agg_scalars_report": 3,
    "op_topk_ties": 1,
    "op_set_intersect_except": 2,
    "op_win_ntile": 1,
    "op_win_share_of_total": 1,
    "op_approx_count_distinct": 1,
    "op_date_spine": 1,
    "q_cascade_delete": 2,
    "q_audit_report": 5,
    "events_funnel": 1,
    "text_tfidf_top_terms": 1,
}


def test_catalog_plan_linter(spark, sf_dir):
    """Catalog-wide single-pass plan linter, three rules:

    1. Serial-stage budget: no query may plan MORE Exchange
       SinglePartition stages than its audited budget (default 0).
       Metadata-grain exchanges (scalar finals, decile windows) are
       budgeted; anything new is presumed a data-sized serial stage until
       audited. (This is the gate that would have caught op_skew_report's
       data-sized window before round 3 shipped it.)
    2. No BatchEvalPython anywhere: every Python crossing must be
       Arrow-batched (ArrowEvalPython / mapInPandas / applyInPandas) —
       a row-at-a-time UDF in any catalog plan is a 10-100x hot-path bug.
    3. Column pruning: no parquet scan may read 10+ columns (the widest
       table, lineitem, has 11 — a 10+-col ReadSchema means a full-width
       read that defeats columnar pruning at 100 TB).
    """
    import re

    over, py_rows, wide = {}, [], {}
    for name, spec in CATALOG.items():
        plan = X.physical_plan(spec.fn(spark, sf_dir))
        sp = plan.count("SinglePartition")
        if sp > _SINGLE_PARTITION_BUDGET.get(name, 0):
            over[name] = (sp, _SINGLE_PARTITION_BUDGET.get(name, 0))
        if "BatchEvalPython" in plan:
            py_rows.append(name)
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        w = [s for s in scans if s.count(",") >= 9]
        if w:
            wide[name] = w[0][:90]
    assert not over, (
        f"single-partition stages over audited budget (got, budget): {over}"
    )
    assert not py_rows, f"row-at-a-time Python UDFs in plans: {py_rows}"
    assert not wide, f"full-width scans (pruning defeated): {wide}"


def test_winnow_fingerprint_is_shuffle_free(spark, sf_dir):
    """Winnowing is row-local; the whole query (selection + count +
    digest) must plan as a pure map — zero exchanges (r4 rewrite: was a
    gram explode + doc-keyed window sort + distinct + groupBy)."""
    df = CATALOG["text_winnow_fingerprint"].fn(spark, sf_dir)
    assert X.shuffle_count(df) == 0, X.physical_plan(df)[:2000]


def test_stratified_sample_partial_group_limit_before_stratum_shuffle(spark, sf_dir):
    """op_stratified_sample windows over lang — a handful of data-sized
    strata. It is only viable because InferWindowGroupLimit plants a
    PARTIAL WindowGroupLimit before the stratum exchange (k rows per
    stratum per input partition survive the map side), so the per-stratum
    sort never sees the stratum's data. Gate the optimizer property: a
    Spark upgrade or expression change that defeats the inference should
    fail here, not on the cluster."""
    plan = X.physical_plan(CATALOG["op_stratified_sample"].fn(spark, sf_dir))
    tree = [
        l
        for l in plan.splitlines()
        if "WindowGroupLimit (" in l or "Exchange (" in l
    ]
    # tree prints top-down: Final limit, the stratum Exchange, then the
    # Partial limit on the map side
    kinds = ["WindowGroupLimit" if "WindowGroupLimit" in l else "Exchange" for l in tree]
    assert kinds == ["WindowGroupLimit", "Exchange", "WindowGroupLimit"], plan[:3000]


def test_cdc_compaction_is_aggregate_not_window(spark, sf_dir):
    """compact_log picks the latest row per key with max_by — map-side
    combinable (each scan task collapses to one candidate per key before
    the shuffle). The row_number-window form would shuffle AND sort the
    whole changelog; no Window may appear in op_cdc_apply's plan, and the
    aggregate must have a partial phase."""
    plan = X.physical_plan(CATALOG["op_cdc_apply"].fn(spark, sf_dir))
    assert "Window" not in plan, plan[:3000]
    assert "partial_max_by" in plan or "HashAggregate" in plan, plan[:3000]
