"""Round-3 session additions, batch 4: inferential statistics and
sequence/time-series analytics over the event stream and the order book.

- ``events_markov_transitions`` — first-order Markov transition matrix of
  per-user event-type sequences (sequence-model / user-journey prep).
- ``events_ohlc`` — hourly open/high/low/close downsampling of the event
  value series (classic time-series rollup; the batch twin of a streaming
  candlestick aggregator).
- ``op_chi_square`` — chi-square test of independence on a contingency
  table (nation x order priority) with per-cell expected counts and
  contributions.
- ``op_ab_test_welch`` — Welch's unequal-variance t statistic comparing a
  deterministic A/B split of users, one conditional-aggregation scan.
- ``op_rfm_segmentation`` — recency/frequency/monetary quartile scoring via
  the two-phase ``global_ntile`` (operators/ranking.py), no
  single-partition pass over the customer table.

Same contract as every other query module: each entry's DuckDB oracle
replays the identical algorithm with the identical rounding, so parity
holds at any scale factor. Determinism rules follow the repo conventions:
exact DECIMAL for money sums, ``CAST(... AS DOUBLE)`` everywhere a DuckDB
bare literal would otherwise parse as DECIMAL, squares written as ``x*x``
(never ``pow`` — libm pow is not guaranteed bit-identical across engines),
and every float aggregate rounded before it reaches a threshold or an
ORDER BY.

Rounding policy (learned the hard way at sf0.1): round ONLY
accumulation-order-sensitive values (float sums/avgs/vars, corr, log/ln
outputs). Values derived purely from integers or exact decimals through
IEEE divisions are bit-identical across engines UNROUNDED — and rounding
them ADDS risk, because integer-derived ratios sit on exact decimal
grids whose half-way points Spark (shortest-string HALF_UP) and DuckDB
(binary value) round differently.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.ranking import global_cumsum, global_ntile, global_row_number
from .registry import dec, fin, register
from .registry import tables as _t

# ---------------------------------------------------------------------------
# events_markov_transitions — user-journey transition matrix
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
        WITH pairs AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events
        ),
        c AS (
            SELECT src, dst, count(*) AS n_trans
            FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
        )
        SELECT src, dst, n_trans,
               CAST(n_trans AS DOUBLE)
                   / CAST(sum(n_trans) OVER (PARTITION BY src) AS DOUBLE) AS p
        FROM c
    """,
    doc="First-order Markov chain over per-user event sequences: LEAD "
    "within (user_id) ordered by (ts, event_id) — a total order, so the "
    "successor is deterministic — then transition counts and row-"
    "normalized probabilities. Scale shape: one shuffle on user_id for "
    "the sequence window (per-user state is the user's own events, "
    "bounded), then the stream collapses to the (src, dst) grain — at "
    "most |event_types|^2 rows — so the normalizing window runs over "
    "metadata-sized data. This is the prep step for session sequence "
    "models / next-action prediction over a 100 TB event log.",
)
def events_markov_transitions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_trans"))
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wsrc).cast("double")
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# events_ohlc — hourly open/high/low/close downsampling
# ---------------------------------------------------------------------------


@register(
    "events_ohlc",
    oracle="""
        WITH h AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   ts, event_id, value
            FROM events
        ),
        r AS (
            SELECT event_type, hour, value,
                   row_number() OVER (PARTITION BY event_type, hour
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, hour
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM h
        )
        SELECT event_type, hour,
               max(CASE WHEN rn_a = 1 THEN value END) AS px_open,
               max(value) AS px_high,
               min(value) AS px_low,
               max(CASE WHEN rn_d = 1 THEN value END) AS px_close,
               count(*) AS n_events
        FROM r GROUP BY 1, 2
    """,
    doc="Hourly OHLC (candlestick) downsampling of the event value series "
    "per event type. Open/close are selected — not computed — values "
    "(min_by/max_by on the total order (ts, event_id)), so no float "
    "arithmetic happens and no rounding is needed; the oracle realizes "
    "the same selection with row_number + conditional max. Scale shape: "
    "single hash aggregation to the (type, hour) grain with map-side "
    "partial min_by/max_by combine — the raw stream never shuffles "
    "row-for-row, only per-group partial states do. The batch twin of a "
    "streaming tumbling-window OHLC aggregator.",
)
def events_ohlc(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("px_open"),
            F.max("value").alias("px_high"),
            F.min("value").alias("px_low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("px_close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# op_chi_square — test of independence over a contingency table
# ---------------------------------------------------------------------------


@register(
    "op_chi_square",
    oracle="""
        WITH cells AS (
            SELECT n.n_name, o.o_orderpriority AS priority, count(*) AS obs
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        t AS (
            SELECT n_name, priority, obs,
                   CAST(sum(obs) OVER (PARTITION BY n_name) AS DOUBLE) AS rt,
                   CAST(sum(obs) OVER (PARTITION BY priority) AS DOUBLE) AS ct,
                   CAST(sum(obs) OVER () AS DOUBLE) AS g
            FROM cells
        )
        SELECT n_name, priority, obs,
               rt * ct / g AS expected,
               (CAST(obs AS DOUBLE) - rt * ct / g)
                   * (CAST(obs AS DOUBLE) - rt * ct / g)
                   / (rt * ct / g) AS contrib
        FROM t
    """,
    doc="Chi-square test of independence: contingency table of customer "
    "nation x order priority with per-cell observed count, expected "
    "count under independence (row_total*col_total/grand), and the "
    "cell's chi-square contribution. All inputs to the float division "
    "are exact integers (products < 2^53 at any plausible scale), so "
    "expected/contrib are bit-identical across engines and shipped "
    "UNROUNDED (module rounding policy); the square is written x*x, "
    "never pow. Scale "
    "shape: orders shuffle once on custkey for the customer join, "
    "nation broadcasts, then everything collapses to the <= "
    "|nations|*|priorities| cell grain — the marginal-total windows "
    "(including the empty-frame grand total) run over ~125 rows of "
    "metadata, not data.",
)
def op_chi_square(spark, sf_dir):
    o, c, n = _t(spark, sf_dir, "orders", "customer", "nation")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rt = F.sum("obs").over(Window.partitionBy("n_name")).cast("double")
    ct = F.sum("obs").over(Window.partitionBy("priority")).cast("double")
    g = F.sum("obs").over(Window.partitionBy()).cast("double")
    exp = rt * ct / g
    d = F.col("obs").cast("double") - exp
    return cells.select(
        "n_name",
        "priority",
        "obs",
        exp.alias("expected"),
        (d * d / exp).alias("contrib"),
    )


# ---------------------------------------------------------------------------
# op_ab_test_welch — Welch's t over a deterministic A/B user split
# ---------------------------------------------------------------------------


@register(
    "op_ab_test_welch",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
                   count(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
                   avg(value) FILTER (WHERE user_id % 2 = 0) AS ma,
                   avg(value) FILTER (WHERE user_id % 2 = 1) AS mb,
                   var_samp(value) FILTER (WHERE user_id % 2 = 0) AS va,
                   var_samp(value) FILTER (WHERE user_id % 2 = 1) AS vb
            FROM events
            GROUP BY 1
        )
        SELECT event_type, n_a, n_b,
               round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
               round((ma - mb) / sqrt(NULLIF(va / n_a + vb / n_b,
                                             CAST(0 AS DOUBLE))), 4) AS t_stat,
               round((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                     / NULLIF((va / n_a) * (va / n_a) / (n_a - 1)
                              + (vb / n_b) * (vb / n_b) / (n_b - 1),
                              CAST(0 AS DOUBLE)), 2) AS df
        FROM s
    """,
    doc="Welch's unequal-variance t-test per event type, variant assigned "
    "deterministically as user_id % 2 (the reproducible-experiment "
    "idiom — never rand()). One conditional-aggregation scan produces "
    "per-variant n/mean/var; the t statistic and Welch-Satterthwaite "
    "df are scalar math on those aggregates. Float means/variances are "
    "summation-order-dependent in the last ulp, so every derived value "
    "is rounded (4 for means/t, 2 for df) — |value| <= ~330 and n >= "
    "dozens keep the ulp noise orders of magnitude below the rounding "
    "grain. Scale shape: a single map-side-combinable groupBy on "
    "event_type; no second scan, no join, output is |event_types| rows.",
)
def op_ab_test_welch(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    b = F.col("user_id") % 2 == 1
    s = e.groupBy("event_type").agg(
        F.count(F.when(a, F.lit(1))).alias("n_a"),
        F.count(F.when(b, F.lit(1))).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("ma"),
        F.avg(F.when(b, F.col("value"))).alias("mb"),
        F.var_samp(F.when(a, F.col("value"))).alias("va"),
        F.var_samp(F.when(b, F.col("value"))).alias("vb"),
    )
    sea = F.col("va") / F.col("n_a")
    seb = F.col("vb") / F.col("n_b")
    se2 = sea + seb
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("ma", 4).alias("mean_a"),
        F.round("mb", 4).alias("mean_b"),
        F.round(
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.nullif(se2, F.lit(0.0))),
            4,
        ).alias("t_stat"),
        F.round(
            se2 * se2
            / F.nullif(
                sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1),
                F.lit(0.0),
            ),
            2,
        ).alias("df"),
    )


# ---------------------------------------------------------------------------
# op_rfm_segmentation — quartile customer scoring via two-phase ntile
# ---------------------------------------------------------------------------


@register(
    "op_rfm_segmentation",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             (SELECT CAST(max(o_orderdate) AS DATE)
                              FROM orders)) AS recency_days,
                   count(*) AS frequency,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS monetary
            FROM orders GROUP BY 1
        ),
        scored AS (
            SELECT *,
                   ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
                   ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
                   ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
            FROM base
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
                    WHEN f_score <= 2 THEN 'loyal'
                    WHEN r_score >= 3 THEN 'at_risk'
                    ELSE 'regular' END AS segment
        FROM scored
    """,
    doc="RFM customer segmentation: per-customer recency (days since last "
    "order, against the corpus max date), frequency (order count), and "
    "monetary (exact DECIMAL spend, rounded on exit), each scored into "
    "quartiles with SQL NTILE semantics. All three NTILEs are the "
    "two-phase global_ntile (operators/ranking.py) — range-partitioned "
    "sort + per-partition numbering + broadcast offsets — so despite "
    "three global orderings there is no single-partition pass over the "
    "customer table (the only SinglePartition exchanges touch the "
    "per-partition count rows, <= shuffle partitions each). Orderings "
    "include custkey as tiebreaker => total order => deterministic "
    "tiles; DESC orderings pass explicit sort Columns. Segment labels "
    "are a CASE over the scores (champion/loyal/at_risk/regular). "
    "Chaining three two-phase ntiles re-embeds the upstream subtree in "
    "every plan branch (each ntile reads its input from the window "
    "side, the counts side, and the join-back), so the stages are "
    "fenced with eager localCheckpoint — measured 7.4 s -> 2.0 s at "
    "sf0.1. The fenced frame is the per-customer aggregate, already "
    "reduced from the raw fact table; at cluster scale with executor "
    "loss in play swap the fences for persist(MEMORY_AND_DISK) — "
    "localCheckpoint blocks are not recomputable.",
)
def op_rfm_segmentation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        fin(F.sum(dec("o_totalprice"))).alias("monetary"),
    )
    maxd = o.agg(F.max("o_orderdate").alias("__max_ts"))
    base = (
        per_cust.join(F.broadcast(maxd))
        .withColumn(
            "recency_days",
            F.datediff(
                F.col("__max_ts").cast("date"), F.col("__last_ts").cast("date")
            ).cast("bigint"),
        )
        .select("o_custkey", "recency_days", "frequency", "monetary")
        # fence: see doc — the chained ntiles otherwise replay this subtree
        # once per plan branch (9+ times by the third ntile). LAZY (r11
        # opt): the three fences' consumers are strictly sequential (each
        # ntile's probe, then the next fence), so lazy checkpoints cut the
        # same lineage while folding materialization into the consumer
        # jobs — three fewer driver actions per execution than eager.
        .localCheckpoint(eager=False)
    )
    # cache_key: the checkpoint fences give every execution fresh plan ids,
    # so the semantic-hash probe memo can never hit here — an explicit
    # content key (query + input + axis) bridges it (VERDICT r7 item 8:
    # measured ~2.6 s per overflow-path probe at sf0.1, 3 probes per run;
    # correctness is key-independent — monotone pid — and the key changes
    # with sf_dir, so balance staleness only spans re-runs on one input)
    scored = global_ntile(
        base, 4, [F.col("recency_days").asc(), F.col("o_custkey").asc()], "r_score",
        cache_key=f"rfm:{sf_dir}:r",
    ).localCheckpoint(eager=False)
    scored = global_ntile(
        scored, 4, [F.col("frequency").desc(), F.col("o_custkey").asc()], "f_score",
        cache_key=f"rfm:{sf_dir}:f",
    ).localCheckpoint(eager=False)
    scored = global_ntile(
        scored, 4, [F.col("monetary").desc(), F.col("o_custkey").asc()], "m_score",
        cache_key=f"rfm:{sf_dir}:m",
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
        .when(F.col("f_score") <= 2, "loyal")
        .when(F.col("r_score") >= 3, "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


# ---------------------------------------------------------------------------
# op_word_pmi — pointwise mutual information of word co-occurrence
# ---------------------------------------------------------------------------

_PMI_MIN_DF = 5


@register(
    "op_word_pmi",
    oracle=f"""
        WITH dw AS (
            SELECT DISTINCT doc_id, lower(tok) AS w
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
        ),
        df AS (
            SELECT w, count(*) AS df FROM dw GROUP BY 1
            HAVING count(*) >= {_PMI_MIN_DF}
        ),
        kept AS (SELECT dw.doc_id, dw.w, df.df FROM dw JOIN df USING (w)),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM dw),
        co AS (
            SELECT a.w AS w1, a.df AS df1, b.w AS w2, b.df AS df2,
                   count(*) AS n_co
            FROM kept a JOIN kept b
              ON a.doc_id = b.doc_id AND a.w < b.w
            GROUP BY 1, 2, 3, 4
        )
        SELECT w1, w2, n_co,
               round(ln(CAST(n_co AS DOUBLE) * n.n
                        / (CAST(df1 AS DOUBLE) * CAST(df2 AS DOUBLE))),
                     6) AS pmi
        FROM co, n
    """,
    doc="Pointwise mutual information over document-level word "
    "co-occurrence — the classic collocation / word-association signal "
    "(Church & Hanks 1990) and the input to PPMI embedding matrices. "
    "Tokenization is the repo-standard whitespace split (identical "
    "regex both engines), presence is per-doc DISTINCT, and rare words "
    "(df < 5) are pruned BEFORE the pair join — at 100 TB that df cut "
    "(plus a max-df stopword cut, same lever as dedup_ngram_jaccard_"
    "maxdf) is what bounds the self-join: work is sum over docs of "
    "kept-words^2, and the output grain is vocab^2, not corpus-sized. "
    "All PMI inputs cast to double individually (exact-integer products "
    "would overflow 2^53 at web scale), the ratio/log is identical "
    "IEEE math both engines, and round(6) absorbs the log's last-ulp "
    "libm difference (JVM Math.log vs libm log).",
)
def op_word_pmi(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    dw = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", F.lower(F.col("tok")).alias("w"))
        .distinct()
    )
    df = dw.groupBy("w").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= _PMI_MIN_DF
    )
    kept = dw.join(F.broadcast(df), "w").select("doc_id", "w", "df")
    n = dw.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    a = kept.select(
        "doc_id", F.col("w").alias("w1"), F.col("df").alias("df1")
    )
    b = kept.select(
        "doc_id", F.col("w").alias("w2"), F.col("df").alias("df2")
    )
    co = (
        a.join(b, ["doc_id"])
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "df1", "w2", "df2")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    return co.join(F.broadcast(n)).select(
        "w1",
        "w2",
        "n_co",
        F.round(
            F.log(
                F.col("n_co").cast("double")
                * F.col("n")
                / (F.col("df1").cast("double") * F.col("df2").cast("double"))
            ),
            6,
        ).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# events_time_to_convert — signup -> first purchase latency distribution
# ---------------------------------------------------------------------------


@register(
    "events_time_to_convert",
    oracle="""
        WITH su AS (
            SELECT user_id, min(ts) AS s_ts
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        pu AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN su ON e.user_id = su.user_id
                               AND e.ts >= su.s_ts
            WHERE e.event_type = 'purchase'
            GROUP BY 1
        ),
        d AS (
            SELECT su.user_id,
                   CAST(epoch_us(pu.p_ts) - epoch_us(su.s_ts) AS DOUBLE)
                   / CAST(60000000 AS DOUBLE) AS mins
            FROM su LEFT JOIN pu ON su.user_id = pu.user_id
        )
        SELECT count(*) AS n_signups,
               count(mins) AS n_converted,
               CAST(count(mins) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS conv_rate,
               quantile_cont(mins, 0.5) AS p50_minutes,
               quantile_cont(mins, 0.9) AS p90_minutes
        FROM d
    """,
    doc="Funnel latency: per user, first signup and first purchase AT OR "
    "AFTER it, then the conversion rate and the exact interpolated "
    "p50/p90 of the latency in minutes. Latencies are integer-"
    "microsecond differences divided once (exact IEEE both engines); "
    "F.percentile == quantile_cont bit-for-bit (op_percentiles "
    "precedent) — all outputs integer-derived, shipped unrounded. Scale shape: both sides collapse "
    "to per-user scalars before the user-keyed join; the final "
    "aggregate is a single metadata-sized reduction. At 100 TB the "
    "exact percentile over per-user latencies is the one global sort — "
    "swap to approx_percentile at that scale (op_approx_percentile is "
    "the catalog's sketch tier).",
)
def events_time_to_convert(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    d = su.join(pu, "user_id", "left").select(
        (
            (F.unix_micros("p_ts") - F.unix_micros("s_ts")).cast("double")
            / F.lit(60000000).cast("double")
        ).alias("mins")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("mins").alias("n_converted"),
        (
            F.count("mins").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("conv_rate"),
        F.percentile("mins", 0.5).alias("p50_minutes"),
        F.percentile("mins", 0.9).alias("p90_minutes"),
    )


# ---------------------------------------------------------------------------
# events_ewma — exponentially weighted moving average of hourly volume
# ---------------------------------------------------------------------------


@register(
    "events_ewma",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS DOUBLE) AS n_events
            FROM events GROUP BY 1, 2
        ),
        lists AS (
            SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
                   list(n_events) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS xs
            FROM hourly
        )
        SELECT event_type, hour, n_events,
               round(list_reduce(xs, (a, b) -> 0.5 * a + 0.5 * b), 6) AS ewma
        FROM lists
    """,
    doc="EWMA smoothing (alpha = 0.5) of per-type hourly event volume — "
    "the standard operational-dashboard trend line. The recursion "
    "y_t = a*x_t + (1-a)*y_{t-1} is a LEFT FOLD over the trailing-12 "
    "ordered window list with the first element as seed, realized as "
    "F.aggregate on Spark and list_reduce on DuckDB — identical "
    "sequential fold order => bit-identical doubles (the mm_embed_ann "
    "idiom), alpha = 0.5 keeps every halving exact; round(6) is "
    "defensive only. Scale shape: the raw stream collapses map-side to "
    "the (type, hour) grain before the window; per-partition window "
    "state is the 12-element frame — O(1) per row. The batch twin of a "
    "streaming EWMA monitor (applyInPandasWithState carries the same "
    "recursion as running state).",
)
def events_ewma(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-11, Window.currentRow)
    )
    lists = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.collect_list(F.col("n_events").cast("double")).over(w).alias("xs"),
    )
    fold = F.expr(
        "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)), xs[0],"
        " (a, x) -> CAST(0.5 AS DOUBLE) * a + CAST(0.5 AS DOUBLE) * x)"
    )
    return lists.select(
        "event_type", "hour", "n_events", F.round(fold, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# op_gini_concentration — revenue inequality / concentration metrics
# ---------------------------------------------------------------------------


@register(
    "op_gini_concentration",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS rn
            FROM spend
        ),
        agg AS (
            SELECT count(*) AS n,
                   sum(CAST(cents AS DECIMAL(19,0))) AS st,
                   sum(CAST(rn AS DECIMAL(19,0))
                       * CAST(cents AS DECIMAL(19,0))) AS s1
            FROM ranked
        ),
        shares AS (
            SELECT (SELECT n FROM agg) AS n,
                   sum(CASE WHEN rn > (SELECT n FROM agg)
                                     - ((SELECT n FROM agg) + 9) // 10
                            THEN CAST(cents AS DECIMAL(19,0)) END) AS top10,
                   sum(CASE WHEN rn > (SELECT n FROM agg)
                                     - ((SELECT n FROM agg) + 99) // 100
                            THEN CAST(cents AS DECIMAL(19,0)) END) AS top1
            FROM ranked
        )
        SELECT agg.n AS n_customers,
               round(CAST(agg.st AS DOUBLE) / CAST(100 AS DOUBLE), 2)
                   AS total_spend,
               round(CAST(2 AS DOUBLE) * CAST(agg.s1 AS DOUBLE)
                     / (CAST(agg.n AS DOUBLE) * CAST(agg.st AS DOUBLE))
                     - (CAST(agg.n AS DOUBLE) + CAST(1 AS DOUBLE))
                       / CAST(agg.n AS DOUBLE), 6) AS gini,
               round(CAST(shares.top10 AS DOUBLE)
                     / CAST(agg.st AS DOUBLE), 6) AS top10_share,
               round(CAST(shares.top1 AS DOUBLE)
                     / CAST(agg.st AS DOUBLE), 6) AS top1_share
        FROM agg, shares
    """,
    doc="Revenue-concentration metrics over per-customer spend: Gini "
    "coefficient via the rank formula G = 2*sum(i*x_i)/(n*sum(x)) - "
    "(n+1)/n on ascending-sorted spend, plus top-10%% / top-1%% revenue "
    "shares (k = ceil(n/m) in INTEGER math). Every sum is exact: spend "
    "becomes integer cents (DECIMAL *100 -> BIGINT, exact), rank*cents "
    "products and their sums run in DECIMAL(38,0) — no float order-"
    "dependence anywhere; the only doubles are the final four divisions "
    "(identical IEEE both engines, round 2/6 on exit). Tie order "
    "cannot change the Gini sum (equal x swap i's freely), custkey "
    "tiebreak makes rn itself deterministic anyway. Scale shape: the "
    "ascending global numbering is the two-phase global_row_number "
    "(operators/ranking.py) — range partition + per-partition "
    "numbering + broadcast offsets, no single-partition pass over "
    "customers; the final reduction is one metadata-sized row. The "
    "top-k shares reuse the SAME ascending numbering (rn > n - k) "
    "instead of a second descending sort.",
)
def op_gini_concentration(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        (F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("cents")
    )
    ranked = global_row_number(
        spend, [F.col("cents").asc(), F.col("o_custkey").asc()], "rn"
    )
    # no fence: the double read below replays only the cheap spend agg —
    # measured 1.6-2.0 s plain vs 1.8-2.5 s fenced at sf0.1
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("cents")).alias("st"),
        F.sum(d19("rn") * d19("cents")).alias("s1"),
    )
    shares = (
        ranked.join(F.broadcast(tot.select("n")))
        .agg(
            F.sum(
                F.when(
                    F.col("rn") > F.col("n") - F.expr("(n + 9) div 10"),
                    d19("cents"),
                )
            ).alias("top10"),
            F.sum(
                F.when(
                    F.col("rn") > F.col("n") - F.expr("(n + 99) div 100"),
                    d19("cents"),
                )
            ).alias("top1"),
        )
    )
    agg = tot.join(F.broadcast(shares))
    nd = F.col("n").cast("double")
    st = F.col("st").cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(st / F.lit(100).cast("double"), 2).alias("total_spend"),
        F.round(
            F.lit(2).cast("double") * F.col("s1").cast("double") / (nd * st)
            - (nd + F.lit(1).cast("double")) / nd,
            6,
        ).alias("gini"),
        F.round(F.col("top10").cast("double") / st, 6).alias("top10_share"),
        F.round(F.col("top1").cast("double") / st, 6).alias("top1_share"),
    )


# ---------------------------------------------------------------------------
# events_top_paths — most common 3-step event-type sequences
# ---------------------------------------------------------------------------


@register(
    "events_top_paths",
    oracle="""
        WITH seq AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
    doc="Top-20 three-step user-journey paths: two LEADs over the per-"
    "user (ts, event_id) total order, sliding 3-grams of event types, "
    "count + distributed top-k ((n DESC, path) total order -> "
    "TakeOrderedAndProject, no global sort). Scale shape: one user-"
    "keyed shuffle, then the stream collapses to <= |types|^3 path "
    "rows. The sequence-mining sibling of events_markov_transitions "
    "(order-2 context vs order-1).",
)
def events_top_paths(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# op_basket_lift — association rules: support / confidence / lift
# ---------------------------------------------------------------------------


@register(
    "op_basket_lift",
    oracle="""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n
              FROM items),
        supp AS (SELECT l_partkey, count(*) AS s FROM items GROUP BY 1),
        co AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_co
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT p1, p2, n_co, s1.s AS s1, s2.s AS s2,
               CAST(n_co AS DOUBLE) / n.n AS support,
               CAST(n_co AS DOUBLE) / CAST(s1.s AS DOUBLE) AS confidence,
               CAST(n_co AS DOUBLE) * n.n
                   / (CAST(s1.s AS DOUBLE) * CAST(s2.s AS DOUBLE)) AS lift
        FROM co
        JOIN supp s1 ON co.p1 = s1.l_partkey
        JOIN supp s2 ON co.p2 = s2.l_partkey
        CROSS JOIN n
        ORDER BY lift DESC, p1, p2 LIMIT 50
    """,
    doc="Association rules over order baskets: pair support, confidence "
    "P(p2|p1), and lift P(p1,p2)/(P(p1)P(p2)) — op_market_basket's "
    "co-occurrence completed into the classic a-priori rule metrics. "
    "Each ratio's inputs are cast to double INDIVIDUALLY (integer "
    "products would pass 2^53 at web scale); the divisions are "
    "identical IEEE both engines, so all three metrics ship UNROUNDED "
    "(module rounding policy) and ORDER BY lift with (p1, p2) "
    "tiebreak stays deterministic. Scale shape: the self-join is quadratic only in "
    "per-order basket size (bounded) and co-partitions on l_orderkey; "
    "per-item supports are a part-keyed dim joined onto the pair "
    "grain; top-k is TakeOrderedAndProject (no global sort).",
)
def op_basket_lift(spark, sf_dir):
    # r11 opt (guide §2.4, same rewrite as op_market_basket/item-CF): one
    # collect_set shuffle builds each order's distinct sorted basket; the
    # old form computed the (orderkey, partkey) DISTINCT subtree four
    # times (n, support, both self-join sides) and paid the self-join's
    # exchanges. Pairs are generated row-locally from the ascending array
    # (p1 < p2 by construction); baskets is fenced because three branches
    # (n, support, pair stream) consume it; the item-support lookup is
    # catalog-sized, so both attachments broadcast instead of re-shuffling
    # the pair stream (guide §3.1).
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    baskets = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    ).localCheckpoint(eager=False)
    n = baskets.agg(F.count(F.lit(1)).cast("double").alias("n"))
    supp = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    pair_structs = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice("items", i + F.lit(2), F.size("items")),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    co = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.p1", "p.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    s1 = F.broadcast(
        supp.select(F.col("l_partkey").alias("p1"), F.col("s").alias("s1"))
    )
    s2 = F.broadcast(
        supp.select(F.col("l_partkey").alias("p2"), F.col("s").alias("s2"))
    )
    nco = F.col("n_co").cast("double")
    return (
        co.join(s1, "p1")
        .join(s2, "p2")
        .join(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "n_co",
            "s1",
            "s2",
            (nco / F.col("n")).alias("support"),
            (nco / F.col("s1").cast("double")).alias("confidence"),
            (
                nco * F.col("n")
                / (F.col("s1").cast("double") * F.col("s2").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# op_abc_analysis — cumulative-revenue part classification
# ---------------------------------------------------------------------------


@register(
    "op_abc_analysis",
    oracle="""
        WITH rev AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS revenue
            FROM lineitem GROUP BY 1
        ),
        c AS (
            SELECT l_partkey, revenue,
                   sum(revenue) OVER (
                       ORDER BY revenue DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_rev,
                   sum(revenue) OVER () AS tot
            FROM rev
        )
        SELECT l_partkey,
               round(CAST(revenue AS DOUBLE), 4) AS revenue,
               round(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                   AS cum_share,
               CASE WHEN round(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE),
                               6) <= 0.80 THEN 'A'
                    WHEN round(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE),
                               6) <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c
    """,
    doc="ABC (Pareto) inventory classification: parts ranked by exact-"
    "DECIMAL discounted revenue, cumulative share of the total, class A "
    "<= 80%%, B <= 95%%, C above — thresholds compared on the ROUNDED "
    "share so both engines agree at the boundary. The running total is "
    "the two-phase global_cumsum (operators/ranking.py): range-"
    "partitioned ROWS frame + broadcast offsets, no single-partition "
    "pass over parts (its one SinglePartition exchange aggregates the "
    "<= shuffle-partition-count per-partition totals — metadata); the "
    "grand total joins back as a broadcast scalar instead of a "
    "sum-over-empty-window. All sums are DECIMAL (exact, order-free); "
    "the one double division per row is identical IEEE both engines. "
    "Companion of op_gini_concentration (same revenue-concentration "
    "family, per-item actionable output).",
)
def op_abc_analysis(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    rev = l.groupBy("l_partkey").agg(
        F.sum(
            dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "3,2"))
        ).alias("revenue")
    )
    cum = global_cumsum(
        rev,
        [F.col("revenue").desc(), F.col("l_partkey").asc()],
        "revenue",
        "cum_rev",
    )
    tot = rev.agg(F.sum("revenue").alias("tot"))
    share = F.round(
        F.col("cum_rev").cast("double") / F.col("tot").cast("double"), 6
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "l_partkey",
            fin("revenue", 4).alias("revenue"),
            share.alias("cum_share"),
            F.when(share <= 0.80, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


# ---------------------------------------------------------------------------
# op_benford — first-digit distribution vs Benford's law
# ---------------------------------------------------------------------------


@register(
    "op_benford",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders WHERE o_totalprice >= 1
        ),
        c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
        SELECT digit, n,
               CAST(n AS DOUBLE) / tot AS observed,
               round(log10(1 + CAST(1 AS DOUBLE) / digit), 6) AS expected,
               round(CAST(n AS DOUBLE) / tot
                     - log10(1 + CAST(1 AS DOUBLE) / digit), 6) AS deviation
        FROM c, t
    """,
    doc="Benford first-digit profile of order totals — the classic "
    "anomaly/fraud screen: observed leading-digit shares vs the "
    "log10(1 + 1/d) law, with per-digit deviation. Digit extraction is "
    "exact integer/string work; the observed share is an integer-"
    "derived division (unrounded), while expected/deviation carry "
    "log10 and stay rounded (JVM-vs-libm last-ulp). Scale "
    "shape: one map-side-combinable aggregation to <= 9 rows, the "
    "grand total broadcast back — nothing data-sized after the scan. "
    "(TPC-H totals are sums of uniforms, so the fit is loose — the "
    "DEVIATION column is the signal; the oracle replays it exactly.)",
)
def op_benford(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("tot"))
    obs = F.col("n").cast("double") / F.col("tot")
    exp = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    return c.join(F.broadcast(t)).select(
        "digit",
        "n",
        obs.alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round(obs - exp, 6).alias("deviation"),
    )


# ---------------------------------------------------------------------------
# events_inter_arrival — inter-arrival gap distribution per event type
# ---------------------------------------------------------------------------


@register(
    "events_inter_arrival",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id))
                       AS BIGINT) AS gap_us
            FROM events
        )
        SELECT event_type,
               count(gap_us) AS n_gaps,
               CAST(sum(gap_us) AS DOUBLE)
                   / CAST(count(gap_us) AS DOUBLE)
                   / CAST(1000000 AS DOUBLE) AS mean_gap_s,
               quantile_cont(CAST(gap_us AS DOUBLE)
                             / CAST(1000000 AS DOUBLE), 0.5) AS p50_s,
               quantile_cont(CAST(gap_us AS DOUBLE)
                             / CAST(1000000 AS DOUBLE), 0.9) AS p90_s,
               quantile_cont(CAST(gap_us AS DOUBLE)
                             / CAST(1000000 AS DOUBLE), 0.99) AS p99_s
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY 1
    """,
    doc="Inter-arrival-time distribution per event type: LAG over the "
    "(ts, event_id) total order, integer-microsecond gaps (exact), "
    "mean from the exact BIGINT gap sum (one double division at the "
    "end — never a float sum), p50/p90/p99 via F.percentile == "
    "quantile_cont bit-for-bit on the exactly-divided per-row "
    "seconds; everything integer-derived, shipped unrounded. "
    "The workload-characterization / burst-detection primitive (arrival "
    "process fitting, capacity planning). Scale shape: one type-keyed "
    "window pass then a per-type aggregate; exact percentiles sort "
    "within type — swap to approx_percentile at 100 TB (documented "
    "sketch tier).",
)
def events_inter_arrival(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    sec = F.col("gap_us").cast("double") / F.lit(1000000).cast("double")
    gs = g.withColumn("gap_s", sec)
    return gs.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        (
            F.sum("gap_us").cast("double")
            / F.count("gap_us").cast("double")
            / F.lit(1000000).cast("double")
        ).alias("mean_gap_s"),
        F.percentile("gap_s", 0.5).alias("p50_s"),
        F.percentile("gap_s", 0.9).alias("p90_s"),
        F.percentile("gap_s", 0.99).alias("p99_s"),
    )


# ---------------------------------------------------------------------------
# op_seasonality — day-of-week x hour-of-day activity profile
# ---------------------------------------------------------------------------


@register(
    "op_seasonality",
    oracle="""
        WITH cells AS (
            SELECT event_type,
                   isodow(ts) AS dow,
                   CAST(hour(ts) AS INT) AS hod,
                   count(*) AS n
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, dow, hod, n,
               CAST(n AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
                   AS share,
               CAST(n AS DOUBLE) * CAST(168 AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
                   AS seasonality_index
        FROM cells
    """,
    doc="Weekly seasonality heatmap: per event type, the (ISO day-of-week "
    "x hour-of-day) activity share and the seasonality index (share x "
    "168 — 1.0 means a uniform week). ISO dow is the engine-portable "
    "weekday: Spark's default dayofweek() is 1=Sunday while DuckDB's "
    "dayofweek() is 0=Sunday, but Spark weekday()+1 == DuckDB isodow() "
    "== ISO 1=Monday..7=Sunday. Scale shape: the raw stream collapses "
    "map-side to at most |types| x 168 cells; the normalizing window "
    "runs over that metadata-sized grain.",
)
def op_seasonality(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (F.weekday("ts") + F.lit(1)).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    tot = F.sum("n").over(wt).cast("double")
    return cells.select(
        "event_type",
        "dow",
        "hod",
        "n",
        (F.col("n").cast("double") / tot).alias("share"),
        (
            F.col("n").cast("double") * F.lit(168).cast("double") / tot
        ).alias("seasonality_index"),
    )


# ---------------------------------------------------------------------------
# op_mad_outliers — robust (median/MAD) outlier summary
# ---------------------------------------------------------------------------


@register(
    "op_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        ),
        dev AS (
            SELECT e.event_type, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med ON e.event_type = med.event_type
        ),
        mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1
        )
        SELECT dev.event_type,
               count(*) AS n,
               round(dev.med, 4) AS median_value,
               round(mad.mad, 4) AS mad,
               CAST(sum(CASE WHEN round(dev.adev
                              / (CAST(1.4826 AS DOUBLE) * mad.mad), 4)
                             >= CAST(3.5 AS DOUBLE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY dev.event_type, dev.med, mad.mad
    """,
    doc="Robust outlier summary per event type via median/MAD — the "
    "breakdown-resistant sibling of op_outlier_zscore/op_zscore_"
    "outliers (a few extreme points cannot move the median the way "
    "they drag a mean/stddev). Median and MAD are exact interpolated "
    "percentiles (F.percentile == quantile_cont bit-for-bit); the "
    "robust z = |x - med| / (1.4826 * MAD) is flagged at >= 3.5 on the "
    "ROUNDED value so engines agree at the threshold (1.4826 enters as "
    "an explicit double literal on both sides). Scale shape: two "
    "type-keyed aggregations with a broadcast-sized (|types|) medians "
    "join between them; output is |types| rows. At 100 TB swap the "
    "exact medians for approx_percentile (sketch tier) — the flagging "
    "pass is unchanged.",
)
def op_mad_outliers(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    rz = F.round(
        F.col("adev") / (F.lit(1.4826).cast("double") * F.col("mad")), 4
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(rz >= F.lit(3.5).cast("double"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("med", 4).alias("median_value"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
# op_xcorr_lagged — lagged cross-correlation of two event series
# ---------------------------------------------------------------------------


@register(
    "op_xcorr_lagged",
    oracle="""
        WITH bounds AS (
            SELECT CAST(epoch_us(date_trunc('hour', min(ts)))
                        // 3600000000 AS BIGINT) AS h0,
                   CAST(epoch_us(date_trunc('hour', max(ts)))
                        // 3600000000 AS BIGINT) AS h1
            FROM events
        ),
        spine AS (
            SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds
        ),
        cnt AS (
            SELECT CAST(epoch_us(date_trunc('hour', ts))
                        // 3600000000 AS BIGINT) AS h,
                   count(*) FILTER (WHERE event_type = 'click') AS a,
                   count(*) FILTER (WHERE event_type = 'purchase') AS b
            FROM events GROUP BY 1
        ),
        series AS (
            SELECT spine.h,
                   CAST(coalesce(cnt.a, 0) AS DOUBLE) AS a,
                   CAST(coalesce(cnt.b, 0) AS DOUBLE) AS b
            FROM spine LEFT JOIN cnt ON spine.h = cnt.h
        )
        SELECT lag.l AS lag_hours,
               count(*) AS n,
               round(corr(s1.a, s2.b), 4) AS r
        FROM (SELECT unnest([0, 1, 2, 3]) AS l) lag
        JOIN series s1 ON true
        JOIN series s2 ON s2.h = s1.h + lag.l
        GROUP BY 1
    """,
    doc="Lagged cross-correlation between the click and purchase hourly "
    "series (does click volume LEAD purchase volume?) — lag 0..3 hours "
    "over the DENSE hour spine (missing hours count 0; correlating "
    "only jointly-present hours would bias r upward). Pearson r via "
    "the built-in corr on both engines — accumulation differs in the "
    "last ulp, absorbed by round(4). Scale shape: the raw stream "
    "collapses to one row per hour (conditional counts), the spine is "
    "a generated sequence, and each lag is an equi-join of the "
    "metadata-sized hourly series against its shifted self — 4 lags x "
    "|hours| rows total, never event-sized work.",
)
def op_xcorr_lagged(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hcol = (F.unix_micros(F.date_trunc("hour", F.col("ts"))) / F.lit(
        3600000000
    )).cast("bigint")
    cnt = e.groupBy(hcol.alias("h")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"),
    )
    bounds = e.agg(
        (F.unix_micros(F.date_trunc("hour", F.min("ts"))) / F.lit(3600000000))
        .cast("bigint")
        .alias("h0"),
        (F.unix_micros(F.date_trunc("hour", F.max("ts"))) / F.lit(3600000000))
        .cast("bigint")
        .alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    series = spine.join(cnt, "h", "left").select(
        "h",
        F.coalesce(F.col("a"), F.lit(0)).cast("double").alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).cast("double").alias("b"),
    )
    lags = spark.range(0, 4).select(F.col("id").alias("lag_hours"))
    s1 = series.select(F.col("h"), F.col("a"))
    s2 = series.select(F.col("h").alias("h2"), F.col("b"))
    joined = (
        s1.crossJoin(F.broadcast(lags))
        .join(s2, F.col("h2") == F.col("h") + F.col("lag_hours"))
    )
    return joined.groupBy("lag_hours").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("a", "b"), 4).alias("r"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — Zipf's-law fit of the corpus word-frequency curve
# ---------------------------------------------------------------------------


@register(
    "text_zipf_fit",
    oracle="""
        WITH freq AS (
            SELECT lower(tok) AS w, count(*) AS f
            FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents
            ) WHERE tok != ''
            GROUP BY 1
        ),
        ranked AS (
            SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
            FROM freq
        )
        SELECT count(*) AS n_words,
               round(regr_slope(log10(CAST(f AS DOUBLE)),
                                log10(CAST(r AS DOUBLE))), 4) AS zipf_slope,
               round(regr_intercept(log10(CAST(f AS DOUBLE)),
                                    log10(CAST(r AS DOUBLE))), 4) AS intercept,
               round(regr_r2(log10(CAST(f AS DOUBLE)),
                             log10(CAST(r AS DOUBLE))), 4) AS r2
        FROM ranked
    """,
    doc="Zipf's-law fit: least-squares slope/intercept/R^2 of log10(freq) "
    "vs log10(rank) over the corpus word-frequency table — the standard "
    "corpus-health diagnostic (natural text slopes near -1; synthetic "
    "or template-heavy corpora deviate hard). Uses the built-in "
    "regr_slope/regr_intercept/regr_r2 on BOTH engines (identical "
    "estimator; summation-order ulp absorbed by round(4)). Ranking is "
    "the two-phase global_row_number over the (freq DESC, word) total "
    "order — the frequency table is vocabulary-sized, but at web scale "
    "a vocabulary is still hundreds of millions of tokens, so the "
    "no-single-partition discipline applies to it too. One scan, one "
    "vocab-grain shuffle, single-row output.",
)
def text_zipf_fit(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(F.lower(F.col("tok")).alias("w"))
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = global_row_number(
        freq, [F.col("f").desc(), F.col("w").asc()], "r"
    )
    ly = F.log10(F.col("f").cast("double"))
    lx = F.log10(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.regr_slope(ly, lx), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(ly, lx), 4).alias("intercept"),
        F.round(F.regr_r2(ly, lx), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# events_dau_wau_mau — active-user counts and stickiness
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_mau",
    oracle="""
        WITH presence AS (
            SELECT DISTINCT
                   CAST(epoch_us(date_trunc('day', ts))
                        // 86400000000 AS BIGINT) AS d,
                   user_id
            FROM events
        ),
        days AS (SELECT DISTINCT d FROM presence),
        wau AS (
            SELECT days.d, count(DISTINCT p.user_id) AS wau
            FROM days JOIN presence p ON p.d BETWEEN days.d - 6 AND days.d
            GROUP BY 1
        ),
        mau AS (
            SELECT days.d, count(DISTINCT p.user_id) AS mau
            FROM days JOIN presence p ON p.d BETWEEN days.d - 29 AND days.d
            GROUP BY 1
        ),
        dau AS (SELECT d, count(*) AS dau FROM presence GROUP BY 1)
        SELECT CAST(to_timestamp(dau.d * 86400) AS DATE) AS day,
               dau.dau, wau.wau, mau.mau,
               CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE)
                   AS stickiness
        FROM dau JOIN wau ON dau.d = wau.d JOIN mau ON dau.d = mau.d
    """,
    doc="DAU / trailing-7-day WAU / trailing-30-day MAU and stickiness "
    "(DAU/MAU) per observed day — the core product-analytics triple. "
    "Computed from the (user, day) PRESENCE grain (already distinct — "
    "far smaller than the raw stream); the trailing windows are the "
    "shifted-copy rewrite (each presence row fans to the <= 7 / <= 30 "
    "target days it can serve, then exact distinct per target) — work "
    "is presence x window, never events x window, and the final "
    "distinct dedups the copies (events_sliding_distinct's proven "
    "shape on the day grain; the oracle states the same semantics as "
    "a range join). At extreme scale swap exact distinct for the HLL "
    "sketch tier (events_sliding_distinct_hll's pattern). Stickiness "
    "is one rounded double division.",
)
def events_dau_wau_mau(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    presence = (
        e.select(
            (F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(
                86400000000
            ))
            .cast("bigint")
            .alias("d"),
            "user_id",
        )
        .distinct()
    )
    days = presence.select("d").distinct()
    dau = presence.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))

    def _trailing(width: int, name: str):
        fanned = presence.select(
            F.explode(
                F.sequence(F.col("d"), F.col("d") + F.lit(width - 1))
            ).alias("td"),
            "user_id",
        )
        return (
            fanned.join(days.select(F.col("d").alias("td")), "td")
            .select("td", "user_id")
            .distinct()
            .groupBy("td")
            .agg(F.count(F.lit(1)).alias(name))
            .withColumnRenamed("td", "d")
        )

    wau = _trailing(7, "wau")
    mau = _trailing(30, "mau")
    out = dau.join(wau, "d").join(mau, "d")
    return out.select(
        F.to_timestamp(F.col("d") * 86400).cast("date").alias("day"),
        "dau",
        "wau",
        "mau",
        (
            F.col("dau").cast("double") / F.col("mau").cast("double")
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# op_embedding_norm_stats — vector-store data-quality audit
# ---------------------------------------------------------------------------


@register(
    "op_embedding_norm_stats",
    oracle="""
        WITH norms AS (
            SELECT label,
                   len(embedding) AS dim,
                   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(range(1, len(embedding) + 1),
                           i -> CAST(embedding[i] AS DOUBLE)
                                * CAST(embedding[i] AS DOUBLE))),
                       (a, x) -> a + x)) AS nrm
            FROM embeddings
        )
        SELECT label,
               count(*) AS n_vecs,
               min(dim) AS min_dim,
               max(dim) AS max_dim,
               CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero,
               round(avg(nrm), 4) AS mean_norm,
               round(quantile_cont(nrm, 0.5), 4) AS p50_norm,
               round(quantile_cont(nrm, 0.9), 4) AS p90_norm
        FROM norms GROUP BY 1
    """,
    doc="Vector-store data-quality audit per label: count, dimension "
    "consistency (min/max — a mixed-dim store is corrupt), zero-vector "
    "count (unnormalizable; poisons cosine), and the L2-norm "
    "distribution (mean/p50/p90 — a collapsed or exploding norm "
    "distribution is the standard embedding-drift symptom). Norms use "
    "the repo's sequential-fold idiom (F.aggregate == list_reduce with "
    "prepended 0.0 seed, identical fold order => bit-identical "
    "doubles); mean is a float aggregate rounded past ulp; percentiles "
    "are interpolated on bit-identical inputs. Scale shape: one "
    "stateless map over the vectors (JVM-side, no UDF) then a "
    "label-grain aggregate — output is |labels| rows.",
)
def op_embedding_norm_stats(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    nrm = F.sqrt(
        F.aggregate(sq, F.lit(0.0).cast("double"), lambda a, x: a + x)
    )
    norms = emb.select(
        "label", F.size("embedding").alias("dim"), nrm.alias("nrm")
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).alias("n_zero"),
        F.round(F.avg("nrm"), 4).alias("mean_norm"),
        F.round(F.percentile("nrm", 0.5), 4).alias("p50_norm"),
        F.round(F.percentile("nrm", 0.9), 4).alias("p90_norm"),
    )


# ---------------------------------------------------------------------------
# events_bot_detection — burst/cadence abuse heuristic
# ---------------------------------------------------------------------------

# Defect universe: driver-generated users are uniformly human (median
# inter-event gaps of hours), so both engines union in the same
# deterministic bot traffic — every 7th user's events re-fired twice at
# +1 s / +2 s with offset event_ids. Their median gap collapses to ~1 s
# and their events-per-active-hour triples; real users stay unflagged.
_BOT_EVENTS_SQL = """
            SELECT event_id, ts, user_id FROM events
            UNION ALL
            SELECT event_id + 1000000000,
                   ts + INTERVAL 1 SECOND, user_id
            FROM events WHERE user_id % 7 = 0
            UNION ALL
            SELECT event_id + 2000000000,
                   ts + INTERVAL 2 SECOND, user_id
            FROM events WHERE user_id % 7 = 0
"""


@register(
    "events_bot_detection",
    oracle=f"""
        WITH u AS ({_BOT_EVENTS_SQL}),
        g AS (
            SELECT user_id, ts,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id))
                       AS BIGINT) AS gap_us
            FROM u
        ),
        stats AS (
            SELECT user_id,
                   count(*) AS n_events,
                   count(DISTINCT date_trunc('hour', ts)) AS active_hours,
                   CAST(count(*) AS DOUBLE)
                       / CAST(count(DISTINCT date_trunc('hour', ts))
                              AS DOUBLE) AS events_per_hour,
                   quantile_cont(CAST(gap_us AS DOUBLE), 0.5)
                       / CAST(1000000 AS DOUBLE) AS median_gap_s
            FROM g GROUP BY 1
        )
        SELECT user_id, n_events, active_hours, events_per_hour,
               median_gap_s,
               (median_gap_s <= CAST(60 AS DOUBLE)
                OR events_per_hour >= CAST(3 AS DOUBLE)) AS is_bot
        FROM stats
    """,
    doc="Bot/abuse heuristic per user: events-per-active-hour and median "
    "inter-event gap, flagged when the cadence is machine-like "
    "(median gap <= 60 s or >= 3 events per active hour — both inputs "
    "integer-derived and bit-identical across engines, so the "
    "thresholds compare unrounded values; round(4) here actually "
    "BROKE parity at sf0.1, a median landing on an exact "
    "half-way decimal). The driver's users are uniformly "
    "human, so both engines union the same deterministic bot universe "
    "(every 7th user's events re-fired at +1 s/+2 s — their median gap "
    "collapses to ~1 s); real users stay unflagged, so the output "
    "discriminates at every sf. Scale shape: one user-keyed window for "
    "gaps + one user-grain aggregate; the exact median swaps for "
    "approx_percentile at 100 TB (sketch tier).",
)
def events_bot_detection(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    bots = e.filter(F.col("user_id") % 7 == 0)
    u = (
        e.unionByName(
            bots.select(
                (F.col("event_id") + F.lit(1000000000)).alias("event_id"),
                (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
                "user_id",
            )
        )
        .unionByName(
            bots.select(
                (F.col("event_id") + F.lit(2000000000)).alias("event_id"),
                (F.col("ts") + F.expr("INTERVAL 2 SECOND")).alias("ts"),
                "user_id",
            )
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = u.select(
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    stats = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.date_trunc("hour", F.col("ts"))).alias(
            "active_hours"
        ),
        (
            F.count(F.lit(1)).cast("double")
            / F.countDistinct(F.date_trunc("hour", F.col("ts"))).cast(
                "double"
            )
        ).alias("events_per_hour"),
        (
            F.percentile(F.col("gap_us").cast("double"), 0.5)
            / F.lit(1000000).cast("double")
        ).alias("median_gap_s"),
    )
    return stats.select(
        "user_id",
        "n_events",
        "active_hours",
        "events_per_hour",
        "median_gap_s",
        (
            (F.col("median_gap_s") <= F.lit(60).cast("double"))
            | (F.col("events_per_hour") >= F.lit(3).cast("double"))
        ).alias("is_bot"),
    )


# ---------------------------------------------------------------------------
# events_window_funnel — ClickHouse-style windowed funnel depth
# ---------------------------------------------------------------------------


@register(
    "events_window_funnel",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
              AND e.ts <= s1.t1 + INTERVAL 24 HOUR
            GROUP BY 1
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              AND e.ts <= s1.t1 + INTERVAL 24 HOUR
            GROUP BY 1
        ),
        d AS (
            SELECT s1.user_id,
                   CASE WHEN s3.t3 IS NOT NULL THEN 3
                        WHEN s2.t2 IS NOT NULL THEN 2
                        ELSE 1 END AS funnel_depth
            FROM s1
            LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
        )
        SELECT funnel_depth, count(*) AS n_users,
               CAST(count(*) AS DOUBLE)
                   / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
        FROM d GROUP BY 1
    """,
    doc="Windowed funnel (the windowFunnel operator ClickHouse ships and "
    "Spark lacks): per user, the deepest signup -> click -> purchase "
    "chain whose steps are strictly ordered and ALL within 24 h of the "
    "first signup — first-chain semantics (each step is the EARLIEST "
    "event after the previous step), which keeps the result a pure "
    "min-aggregation cascade: no per-user sequence buffers, no UDF, "
    "deterministic, and replayable in SQL. Output is the depth "
    "distribution with integer-derived (unrounded) shares. Scale "
    "shape: three user-keyed min-aggregations with user-keyed joins "
    "between them — each stage's frame is one row per qualifying user, "
    "co-partitioned on the join key; the events table is scanned with "
    "a type filter per stage (at 100 TB, partition events by type/date "
    "and the scans prune). The events_funnel sibling counts unordered "
    "step presence; this one enforces order + deadline.",
)
def events_window_funnel(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    d = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .alias("funnel_depth")
        )
    )
    counts = d.groupBy("funnel_depth").agg(F.count(F.lit(1)).alias("n_users"))
    wall = Window.partitionBy()
    return counts.select(
        "funnel_depth",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.sum("n_users").over(wall).cast("double")
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# events_error_budget — SLO error-budget burn-down
# ---------------------------------------------------------------------------


@register(
    "events_error_budget",
    oracle="""
        WITH daily AS (
            SELECT CAST(epoch_us(date_trunc('day', ts))
                        // 86400000000 AS BIGINT) AS d,
                   count(*) AS n_total,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error
            FROM events GROUP BY 1
        ),
        cum AS (
            SELECT d, n_total, n_error,
                   sum(n_total) OVER w AS cum_total,
                   sum(n_error) OVER w AS cum_error
            FROM daily
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(to_timestamp(d * 86400) AS DATE) AS day,
               n_total, n_error,
               CAST(n_error AS DOUBLE) / CAST(n_total AS DOUBLE)
                   AS error_rate,
               CAST(cum_error AS DOUBLE) / CAST(cum_total AS DOUBLE)
                   AS cum_error_rate,
               CAST(cum_error AS DOUBLE)
                   / (CAST(0.25 AS DOUBLE) * CAST(cum_total AS DOUBLE))
                   AS budget_burn,
               CAST(cum_error AS DOUBLE)
                   / (CAST(0.25 AS DOUBLE) * CAST(cum_total AS DOUBLE))
                   > CAST(1 AS DOUBLE) AS budget_exhausted
        FROM cum
    """,
    doc="SLO error-budget burn-down per day: daily and cumulative error "
    "rates against a 75%%-success SLO (the driver's event mix is ~20%% "
    "'error' rows, so a 25%% budget leaves real headroom and the "
    "exhausted flag can flip both ways on real data). burn = cumulative "
    "errors / (budget x cumulative total); > 1 means the budget is "
    "spent — the SRE burn-rate primitive. Every output is integer-"
    "derived (unrounded, bit-identical per the module rounding "
    "policy). Scale shape: the stream collapses map-side to one row "
    "per day; the cumulative window runs over the ~O(days) frame — "
    "metadata, not data (a multi-year tenant is still <= thousands of "
    "rows; the two-phase global_cumsum is the documented swap if a "
    "per-tenant fan-out ever makes this grain data-sized).",
)
def events_error_budget(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        (F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(86400000000))
        .cast("bigint")
        .alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
    )
    w = (
        Window.partitionBy()
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "d",
        "n_total",
        "n_error",
        F.sum("n_total").over(w).alias("cum_total"),
        F.sum("n_error").over(w).alias("cum_error"),
    )
    burn = F.col("cum_error").cast("double") / (
        F.lit(0.25).cast("double") * F.col("cum_total").cast("double")
    )
    return cum.select(
        F.to_timestamp(F.col("d") * 86400).cast("date").alias("day"),
        "n_total",
        "n_error",
        (F.col("n_error").cast("double") / F.col("n_total").cast("double")).alias(
            "error_rate"
        ),
        (
            F.col("cum_error").cast("double") / F.col("cum_total").cast("double")
        ).alias("cum_error_rate"),
        burn.alias("budget_burn"),
        (burn > F.lit(1).cast("double")).alias("budget_exhausted"),
    )
