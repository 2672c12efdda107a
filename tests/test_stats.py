"""Invariant tests for the stats/sequence-analytics batch (queries_stats.py).

Oracle parity is covered by tests/test_oracle_parity.py's full-catalog sweep;
these tests pin the *mathematical* invariants each operator must satisfy so a
future refactor that keeps parity-by-accident (both engines wrong the same
way) still gets caught.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG


def _rows(spark, sf_dir, name):
    return CATALOG[name].fn(spark, sf_dir).collect()


class TestMarkovTransitions:
    def test_probabilities_normalize_per_source(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "events_markov_transitions")
        by_src: dict[str, float] = {}
        for r in rows:
            by_src[r.src] = by_src.get(r.src, 0.0) + r.p
        assert by_src, "no transitions found"
        for src, total in by_src.items():
            # per-row round(6) => drift bounded by 0.5e-6 * fan-out
            assert abs(total - 1.0) < 1e-4, (src, total)

    def test_transition_count_conservation(self, spark, sf_dir):
        """Every user with k events contributes exactly k-1 transitions."""
        df = CATALOG["events_markov_transitions"].fn(spark, sf_dir)
        got = df.agg(F.sum("n_trans")).collect()[0][0]
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        per_user = e.groupBy("user_id").count()
        expected = per_user.agg(F.sum(F.col("count") - 1)).collect()[0][0]
        assert got == expected


class TestOhlc:
    def test_ohlc_bounds_and_conservation(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "events_ohlc")
        assert rows
        for r in rows:
            assert r.px_low <= min(r.px_open, r.px_close)
            assert r.px_high >= max(r.px_open, r.px_close)
            assert r.n_events >= 1
        total = sum(r.n_events for r in rows)
        n_raw = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert total == n_raw

    def test_single_event_hour_degenerates(self, spark, sf_dir):
        """Where n_events == 1 all four prices are the same observation."""
        singles = [r for r in _rows(spark, sf_dir, "events_ohlc") if r.n_events == 1]
        for r in singles:
            assert r.px_open == r.px_high == r.px_low == r.px_close


class TestChiSquare:
    def test_marginals_and_statistic(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_chi_square")
        grand_obs = sum(r.obs for r in rows)
        n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert grand_obs == n_orders  # every order has a valid customer+nation
        # expected counts reproduce the observed marginals
        exp_total = sum(r.expected for r in rows)
        assert abs(exp_total - grand_obs) < 1e-2
        for r in rows:
            assert r.expected > 0
            assert r.contrib >= 0
            # contrib recomputable from (obs, expected) to rounding precision
            recomputed = (r.obs - r.expected) ** 2 / r.expected
            assert abs(recomputed - r.contrib) < 1e-3


class TestWelch:
    def test_counts_and_sign(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_ab_test_welch")
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        totals = {r.event_type: r.n for r in e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert {r.event_type for r in rows} == set(totals)
        for r in rows:
            assert r.n_a + r.n_b == totals[r.event_type]
            if r.t_stat is not None:
                assert (r.t_stat >= 0) == (r.mean_a >= r.mean_b)
            if r.df is not None:
                # Welch df is bounded by min(n-1) below and n_a+n_b-2 above
                assert min(r.n_a, r.n_b) - 1 <= r.df <= r.n_a + r.n_b - 2 + 1e-9

    def test_null_split_is_insignificant(self, spark, sf_dir):
        """user_id %% 2 is independent of value by construction — the t
        statistic should not scream (|t| < 6 leaves vast headroom while
        still catching a broken formula that returns, say, raw sums)."""
        for r in _rows(spark, sf_dir, "op_ab_test_welch"):
            if r.t_stat is not None:
                assert abs(r.t_stat) < 6.0, r


class TestRfm:
    def test_scores_are_balanced_quartiles(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_rfm_segmentation")
        n = len(rows)
        assert n > 0
        for col in ["r_score", "f_score", "m_score"]:
            sizes = [0, 0, 0, 0]
            for r in rows:
                v = getattr(r, col)
                assert 1 <= v <= 4, (col, v)
                sizes[v - 1] += 1
            # SQL NTILE: first n%4 tiles get one extra row
            base = n // 4
            expected = [base + (1 if i < n % 4 else 0) for i in range(4)]
            assert sizes == expected, (col, sizes, expected)

    def test_segment_rule_consistency(self, spark, sf_dir):
        for r in _rows(spark, sf_dir, "op_rfm_segmentation"):
            if r.r_score == 1 and r.f_score == 1:
                assert r.segment == "champion"
            elif r.f_score <= 2:
                assert r.segment == "loyal"
            elif r.r_score >= 3:
                assert r.segment == "at_risk"
            else:
                assert r.segment == "regular"
            assert r.recency_days >= 0
            assert r.frequency >= 1
            assert r.monetary > 0

    def test_monetary_ordering_matches_score(self, spark, sf_dir):
        """Higher monetary must never get a worse (higher) m_score than a
        strictly lower one — monotonicity of ntile over the sort key."""
        rows = sorted(
            _rows(spark, sf_dir, "op_rfm_segmentation"),
            key=lambda r: (-r.monetary, r.o_custkey),
        )
        scores = [r.m_score for r in rows]
        assert scores == sorted(scores)


class TestWordPmi:
    def test_pmi_symmetric_definition_and_bounds(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_word_pmi")
        assert rows
        n_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.trim("text") != "")
            .count()
        )
        for r in rows:
            assert r.w1 < r.w2  # canonical pair orientation, no mirrored dupes
            assert 1 <= r.n_co <= n_docs
            # PMI upper bound: co <= min(df1, df2) => pmi <= log(N/max_df)
            # <= log(N); lower bound with co >= 1: pmi >= log(N / df1*df2)
            # >= -log(N) given df <= N
            assert abs(r.pmi) <= math.log(n_docs) + 1e-6

    def test_cooccurrence_against_direct_count(self, spark, sf_dir):
        """Spot-check one pair's n_co against a direct Spark recount."""
        rows = _rows(spark, sf_dir, "op_word_pmi")
        r = max(rows, key=lambda r: r.n_co)
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        both = (
            d.filter(
                F.array_contains(
                    F.split(F.lower(F.trim("text")), r"\s+"), r.w1
                )
                & F.array_contains(
                    F.split(F.lower(F.trim("text")), r"\s+"), r.w2
                )
            ).count()
        )
        assert both == r.n_co


class TestTimeToConvert:
    def test_funnel_counts_and_percentile_order(self, spark, sf_dir):
        (r,) = _rows(spark, sf_dir, "events_time_to_convert")
        assert 0 <= r.n_converted <= r.n_signups
        assert r.conv_rate == r.n_converted / r.n_signups  # unrounded, bit-exact
        if r.n_converted:
            assert 0 <= r.p50_minutes <= r.p90_minutes


class TestEwma:
    def test_ewma_is_convex_and_seeds_exact(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "events_ewma")
        by_type: dict[str, list] = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for series in by_type.values():
            series.sort(key=lambda r: r.hour)
            # first hour: the fold seed is the value itself
            assert series[0].ewma == float(series[0].n_events)
            for r in series:
                assert r.ewma >= 0

    def test_ewma_matches_recursion_on_window(self, spark, sf_dir):
        """Replay the alpha=0.5 recursion in Python over the trailing-12
        frame and compare (round 6 both sides)."""
        rows = _rows(spark, sf_dir, "events_ewma")
        by_type: dict[str, list] = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for series in by_type.values():
            series.sort(key=lambda r: r.hour)
            vals = [float(r.n_events) for r in series]
            for i, r in enumerate(series):
                xs = vals[max(0, i - 11) : i + 1]
                acc = xs[0]
                for x in xs[1:]:
                    acc = 0.5 * acc + 0.5 * x
                # engine rounds HALF_UP to 6; Python round() is banker's —
                # compare unrounded with the rounding grain as tolerance
                assert abs(acc - r.ewma) <= 5.000001e-7, (r.event_type, r.hour)


class TestGini:
    def test_gini_bounds_and_share_ordering(self, spark, sf_dir):
        (r,) = _rows(spark, sf_dir, "op_gini_concentration")
        assert 0 <= r.gini < 1
        assert 0 < r.top1_share <= r.top10_share <= 1
        # top 10% of customers must hold at least 10% of revenue
        assert r.top10_share >= 0.1 - 1e-9
        assert r.n_customers > 0 and r.total_spend > 0

    def test_gini_matches_numpy_replica(self, spark, sf_dir):
        """Recompute the Gini from raw per-customer spend in Python."""
        import numpy as np

        (r,) = _rows(spark, sf_dir, "op_gini_concentration")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        spend = sorted(
            row.s
            for row in o.groupBy("o_custkey")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
            )
            .collect()
        )
        x = np.array([float(s) for s in spend])
        n = len(x)
        i = np.arange(1, n + 1)
        gini = 2 * (i * x).sum() / (n * x.sum()) - (n + 1) / n
        assert abs(gini - r.gini) < 1e-4


    def test_gini_windows_never_global(self, spark, sf_dir):
        """The ascending numbering must be the two-phase form: every Window
        in the plan partitions by the range-pid — a naive ROW_NUMBER()
        OVER (ORDER BY ...) would plan an unpartitioned Window."""
        plan = CATALOG["op_gini_concentration"].fn(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        windows = [
            line
            for line in plan.splitlines()
            if "Window " in line and "windowspecdefinition" in line
        ]
        assert windows, plan
        for line in windows:
            assert "__gr_pid" in line, line


class TestTopPaths:
    def test_paths_well_formed_and_ranked(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "events_top_paths")
        assert 0 < len(rows) <= 20
        types = {
            r.event_type
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type")
            .distinct()
            .collect()
        }
        ns = [r.n for r in rows]
        assert ns == sorted(ns, reverse=True)
        for r in rows:
            steps = r.path.split(">")
            assert len(steps) == 3
            assert set(steps) <= types

    def test_path_total_conservation(self, spark, sf_dir):
        """If every path fits in the top-20 (small sf), totals must equal
        sum over users of max(k_u - 2, 0)."""
        rows = _rows(spark, sf_dir, "events_top_paths")
        if len(rows) == 20:
            return  # truncated — conservation not checkable
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        expected = (
            e.groupBy("user_id")
            .count()
            .agg(F.sum(F.greatest(F.col("count") - 2, F.lit(0))))
            .collect()[0][0]
        )
        assert sum(r.n for r in rows) == expected


class TestBasketLift:
    def test_lift_identities(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_basket_lift")
        assert rows
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n = l.select("l_orderkey").distinct().count()
        for r in rows:
            assert r.p1 < r.p2
            assert 1 <= r.n_co <= min(r.s1, r.s2)
            assert max(r.s1, r.s2) <= n
            # identity: lift = confidence / P(p2)
            lift_rec = (r.n_co * n) / (r.s1 * r.s2)
            assert abs(lift_rec - r.lift) < 1e-3
            assert abs(r.n_co / n - r.support) < 1e-3
            assert abs(r.n_co / r.s1 - r.confidence) < 1e-3
        lifts = [r.lift for r in rows]
        assert lifts == sorted(lifts, reverse=True)


class TestAbc:
    def test_abc_partition_and_monotone_shares(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_abc_analysis")
        assert rows
        rows.sort(key=lambda r: (-r.revenue, r.l_partkey))
        shares = [r.cum_share for r in rows]
        assert shares == sorted(shares)  # cumulative share is monotone
        assert abs(shares[-1] - 1.0) < 1e-6  # last row reaches 100%
        seen = []
        for r in rows:
            assert r.abc_class in ("A", "B", "C")
            seen.append(r.abc_class)
        # classes appear in A..C order along the ranking
        assert seen == sorted(seen)
        # the A block really is the <=80% prefix
        for r in rows:
            if r.cum_share <= 0.80:
                assert r.abc_class == "A"
            elif r.cum_share <= 0.95:
                assert r.abc_class == "B"
            else:
                assert r.abc_class == "C"

    def test_abc_windows_never_global(self, spark, sf_dir):
        plan = CATALOG["op_abc_analysis"].fn(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        windows = [
            line
            for line in plan.splitlines()
            if "Window " in line and "windowspecdefinition" in line
        ]
        assert windows, plan
        for line in windows:
            assert "__gr_pid" in line, line


class TestBenford:
    def test_benford_shares_and_law(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_benford")
        digits = {r.digit for r in rows}
        assert digits <= set(range(1, 10))
        assert abs(sum(r.observed for r in rows) - 1.0) < 1e-4
        law = sum(math.log10(1 + 1 / d) for d in range(1, 10))
        assert abs(law - 1.0) < 1e-12  # sanity of the law itself
        for r in rows:
            assert abs(r.expected - round(math.log10(1 + 1 / r.digit), 6)) < 1e-6
            assert abs(r.deviation - (r.observed - r.expected)) < 2e-6


class TestInterArrival:
    def test_gap_stats_consistency(self, spark, sf_dir):
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        rows = _rows(spark, sf_dir, "events_inter_arrival")
        e = load_table(spark, sf_dir, "events")  # raw read gives bigint nanos ts
        counts = {
            r.event_type: r.n
            for r in e.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert {r.event_type for r in rows} == set(counts)
        for r in rows:
            assert r.n_gaps == counts[r.event_type] - 1
            assert 0 <= r.p50_s <= r.p90_s <= r.p99_s
            # mean of gaps telescopes to (last-first)/(n-1)
            span = (
                e.filter(F.col("event_type") == r.event_type)
                .agg(
                    (
                        F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
                    ).alias("span")
                )
                .collect()[0].span
            )
            assert abs(r.mean_gap_s - span / r.n_gaps / 1e6) < 1e-6


class TestSeasonality:
    def test_shares_normalize_and_cells_bounded(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_seasonality")
        by_type: dict[str, float] = {}
        for r in rows:
            assert 1 <= r.dow <= 7
            assert 0 <= r.hod <= 23
            assert r.n >= 1
            # index is share scaled to a uniform week
            assert abs(r.seasonality_index - r.share * 168) < 1e-9
            by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.share
        for t, s in by_type.items():
            assert abs(s - 1.0) < 1e-3, (t, s)


class TestMadOutliers:
    def test_mad_summary_consistency(self, spark, sf_dir):
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        rows = _rows(spark, sf_dir, "op_mad_outliers")
        e = load_table(spark, sf_dir, "events")
        counts = {
            r.event_type: r.n
            for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for r in rows:
            assert r.n == counts[r.event_type]
            assert r.mad >= 0
            assert 0 <= r.n_outliers < r.n  # robust stats can't flag everything

    def test_mad_is_robust_to_injected_spike(self, spark, sf_dir):
        """Replacing 1% of values with a huge constant must barely move the
        median (vs the mean, which it drags) — the reason MAD exists."""
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        e = load_table(spark, sf_dir, "events")
        base_med = {
            r.event_type: r.m
            for r in e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("m")).collect()
        }
        spiked = e.withColumn(
            "value",
            F.when(F.col("event_id") % 100 == 0, F.lit(1e9)).otherwise(F.col("value")),
        )
        spiked_med = {
            r.event_type: r.m
            for r in spiked.groupBy("event_type").agg(F.percentile("value", 0.5).alias("m")).collect()
        }
        spiked_mean = {
            r.event_type: r.m
            for r in spiked.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
        }
        for t in base_med:
            assert abs(spiked_med[t] - base_med[t]) < 0.1 * base_med[t] + 5
            assert spiked_mean[t] > 100 * base_med[t]  # mean blew up


class TestXcorr:
    def test_xcorr_lags_and_bounds(self, spark, sf_dir):
        rows = _rows(spark, sf_dir, "op_xcorr_lagged")
        assert {r.lag_hours for r in rows} == {0, 1, 2, 3}
        ns = {r.lag_hours: r.n for r in rows}
        # each extra lag hour shortens the overlap by exactly one row
        assert ns[0] - 1 == ns[1] == ns[2] + 1 == ns[3] + 2
        for r in rows:
            assert r.r is None or -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9

    def test_lag0_matches_numpy_pearson(self, spark, sf_dir):
        import numpy as np

        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        (r0,) = [r for r in _rows(spark, sf_dir, "op_xcorr_lagged") if r.lag_hours == 0]
        e = load_table(spark, sf_dir, "events")
        hourly = (
            e.groupBy((F.unix_micros(F.date_trunc("hour", F.col("ts"))) / F.lit(3600000000)).cast("bigint").alias("h"))
            .agg(
                F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
                F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"),
            )
            .collect()
        )
        hmap = {r.h: (r.a, r.b) for r in hourly}
        h0, h1 = min(hmap), max(hmap)
        a = np.array([hmap.get(h, (0, 0))[0] for h in range(h0, h1 + 1)], dtype=float)
        b = np.array([hmap.get(h, (0, 0))[1] for h in range(h0, h1 + 1)], dtype=float)
        want = np.corrcoef(a, b)[0, 1]
        assert abs(want - r0.r) < 1e-3


class TestZipf:
    def test_fit_against_numpy_polyfit(self, spark, sf_dir):
        import numpy as np

        (r,) = _rows(spark, sf_dir, "text_zipf_fit")
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        freqs = (
            d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .count()
            .collect()
        )
        f = np.array(sorted((row["count"] for row in freqs), reverse=True), dtype=float)
        assert r.n_words == len(f)
        x = np.log10(np.arange(1, len(f) + 1))
        y = np.log10(f)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(slope - r.zipf_slope) < 1e-3
        assert abs(intercept - r.intercept) < 1e-3
        assert 0 <= r.r2 <= 1
        assert r.zipf_slope < 0  # frequency falls with rank


class TestDauWauMau:
    def test_active_user_identities(self, spark, sf_dir):
        rows = sorted(_rows(spark, sf_dir, "events_dau_wau_mau"), key=lambda r: r.day)
        assert rows
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        e = load_table(spark, sf_dir, "events")
        total_users = e.select("user_id").distinct().count()
        for r in rows:
            assert 1 <= r.dau <= r.wau <= r.mau <= total_users
            assert r.stickiness == r.dau / r.mau  # unrounded, bit-exact
        # the event fixture spans ~30 days: by the last day MAU must see
        # (nearly) the whole population
        assert rows[-1].mau >= 0.9 * total_users

    def test_wau_direct_recount_one_day(self, spark, sf_dir):
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        rows = sorted(_rows(spark, sf_dir, "events_dau_wau_mau"), key=lambda r: r.day)
        r = rows[len(rows) // 2]
        e = load_table(spark, sf_dir, "events")
        import datetime as dt

        lo = dt.datetime.combine(r.day - dt.timedelta(days=6), dt.time())
        hi = dt.datetime.combine(r.day + dt.timedelta(days=1), dt.time())
        want = (
            e.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
            .select("user_id")
            .distinct()
            .count()
        )
        assert want == r.wau


class TestWindowFunnel:
    def test_depth_distribution_consistency(self, spark, sf_dir):
        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        rows = _rows(spark, sf_dir, "events_window_funnel")
        depths = {r.funnel_depth for r in rows}
        assert depths <= {1, 2, 3}
        e = load_table(spark, sf_dir, "events")
        n_signup_users = (
            e.filter(F.col("event_type") == "signup")
            .select("user_id")
            .distinct()
            .count()
        )
        assert sum(r.n_users for r in rows) == n_signup_users
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-9

    def test_depth3_user_has_ordered_chain(self, spark, sf_dir):
        """Replay one depth-3 user's chain in Python; skip if none at this sf."""
        import datetime as dt

        from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

        rows = _rows(spark, sf_dir, "events_window_funnel")
        if not any(r.funnel_depth == 3 for r in rows):
            return
        e = load_table(spark, sf_dir, "events")
        evs = [
            (r.ts, r.event_type, r.user_id)
            for r in e.select("ts", "event_type", "user_id").collect()
        ]
        by_user: dict[int, list] = {}
        for ts, et, uid in evs:
            by_user.setdefault(uid, []).append((ts, et))
        n3 = 0
        for uid, lst in by_user.items():
            lst.sort()
            t1 = min((ts for ts, et in lst if et == "signup"), default=None)
            if t1 is None:
                continue
            lim = t1 + dt.timedelta(hours=24)
            t2 = min((ts for ts, et in lst if et == "click" and t1 < ts <= lim), default=None)
            if t2 is None:
                continue
            t3 = min((ts for ts, et in lst if et == "purchase" and t2 < ts <= lim), default=None)
            if t3 is not None:
                n3 += 1
        got3 = next(r.n_users for r in rows if r.funnel_depth == 3)
        assert n3 == got3


class TestErrorBudget:
    def test_burn_down_identities(self, spark, sf_dir):
        rows = sorted(_rows(spark, sf_dir, "events_error_budget"), key=lambda r: r.day)
        assert rows
        cum_t = cum_e = 0
        for r in rows:
            cum_t += r.n_total
            cum_e += r.n_error
            assert 0 <= r.n_error <= r.n_total
            assert r.error_rate == r.n_error / r.n_total
            assert r.cum_error_rate == cum_e / cum_t
            assert r.budget_burn == cum_e / (0.25 * cum_t)
            assert r.budget_exhausted == (r.budget_burn > 1)
        # the fixture's error mix (~20%) stays inside a 25% budget overall
        assert rows[-1].budget_exhausted is False


class TestRfmPlan:
    def test_windows_never_global(self, spark, sf_dir):
        """The global ntiles must not plan a global (unpartitioned) Window
        over the customer table: every Window in the executed plan must
        partition by the two-phase range-partition id. (The plan is fenced
        by localCheckpoint, so the visible plan is the final ntile — the
        exact operator a naive NTILE() OVER (ORDER BY ...) regression
        would turn into a SinglePartition sort.)"""
        plan = CATALOG["op_rfm_segmentation"].fn(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        windows = [
            line
            for line in plan.splitlines()
            if "Window " in line and "windowspecdefinition" in line
        ]
        assert windows, plan
        for line in windows:
            assert "__gr_pid" in line, line
