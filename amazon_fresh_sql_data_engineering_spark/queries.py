"""Q-*/OP-* query catalog: every operator from SURVEY.md §2 as a named query.

Each entry is a pair:
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` written with the
    DataFrame API (declarative; Catalyst picks the physical plan), and
  - an equivalent ANSI-SQL ``oracle`` string the driver runs through DuckDB on
    the same parquet tables (views: region nation customer supplier part
    orders lineitem events documents embeddings).

Determinism rules (the driver hash-compares values order-insensitively):
  - Money/double aggregation: cast to DECIMAL(18,2) *before* summing on BOTH
    sides, so sums are exact and engine-order-independent. Raw double sums
    are banned — float addition is not associative and Spark/DuckDB would
    disagree in the last bits.
  - Ratios/averages: exact decimal numerator, then one double division and a
    ``round(x, k)`` with identical association on both sides.
  - Every LIMIT carries a total deterministic ORDER BY (unique tiebreaker).
  - Every computed column is aliased identically in Spark and SQL.

Reference citations (``T`` = TablesCreated-Imported.sql, ``A`` =
All-Tasks-of-SQL.sql under /root/reference) mark which reference construct
each query reproduces; the data is the driver's TPC-H-ish schema
(FIXTURES.md §3 maps customers→customer, orders→orders,
order_details→lineitem, products→part, suppliers→supplier).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.ranking import global_rank
from .registry import CATALOG, QuerySpec, dec, fin, register
from .registry import tables as _t

__all__ = ["CATALOG", "QuerySpec", "dec", "fin", "register"]


# ---------------------------------------------------------------------------
# §2.1 scans / §2.2 projections & filters
# ---------------------------------------------------------------------------


@register(
    "op_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="OP-SCAN: bare table scan (ref A:11-12).",
)
def op_scan(spark, sf_dir):
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "op_project",
    oracle="""
        SELECT p_partkey,
               p_name,
               round(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS retail,
               round(CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(2,1)) AS DECIMAL(20,3)) AS DOUBLE), 3) AS discounted
        FROM part
    """,
    doc="OP-PROJECT: projection + computed cols + aliases (ref A:230-236).",
)
def op_project(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        fin(dec("p_retailprice")).alias("retail"),
        fin(
            (dec("p_retailprice") * F.lit(0.9).cast("decimal(2,1)")).cast("decimal(20,3)"),
            3,
        ).alias("discounted"),
    )


@register(
    "op_filter_eq",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
    doc="OP-FILTER-EQ: equality filter (ref A:11-12 city = 'Adamville').",
)
def op_filter_eq(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "op_filter_ci",
    oracle="SELECT p_partkey, p_type FROM part WHERE lower(p_type) = 'promo'",
    doc="OP-FILTER-CI: case-insensitive match (ref A:20 ILIKE, A:22-23 LOWER()=).",
)
def op_filter_ci(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.lower("p_type") == "promo").select("p_partkey", "p_type")


@register(
    "op_filter_date",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate
        FROM orders WHERE o_orderdate > TIMESTAMP '2000-06-01 00:00:00'
    """,
    doc="OP-FILTER-DATE: date comparison (ref A:158-159).",
)
def op_filter_date(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") > F.lit("2000-06-01 00:00:00").cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )


@register(
    "op_filter_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    doc="OP-FILTER-RANGE: BETWEEN inclusive + half-open range (ref A:275, A:253-254).",
)
def op_filter_range(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_quantity").between(10, 20))
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", F.col("l_quantity").cast("bigint").alias("qty"))
    )


@register(
    "op_filter_null",
    oracle="""
        SELECT event_id, user_id FROM events
        WHERE value IS NOT NULL AND props IS NOT NULL AND trim(event_type) <> ''
    """,
    doc="OP-FILTER-NULL: IS [NOT] NULL + blank-text guard (ref T:118, T:135).",
)
def op_filter_null(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.filter(
        F.col("value").isNotNull() & F.col("props").isNotNull() & (F.trim("event_type") != "")
    ).select("event_id", "user_id")


@register(
    "op_filter_regex",
    oracle=r"SELECT p_partkey, p_brand FROM part WHERE regexp_matches(p_brand, '^Brand#1[0-9]$')",
    doc="OP-FILTER-REGEX: regex predicate ~ (ref T:245-247 uuid shape, T:174 date shape).",
)
def op_filter_regex(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_brand").rlike(r"^Brand#1[0-9]$")).select("p_partkey", "p_brand")


@register(
    "op_filter_in_list",
    oracle="""
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE lower(o_orderpriority) IN ('1-urgent', '2-high')
    """,
    doc="OP-FILTER-IN-LIST: lower(x) IN (...) (ref T:175 boolean vocabulary).",
)
def op_filter_in_list(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.lower("o_orderpriority").isin("1-urgent", "2-high")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "op_filter_complement",
    oracle="""
        SELECT event_id, event_type,
               round(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 2) AS value
        FROM events
        WHERE NOT (value IS NOT NULL AND value >= 0 AND value <= 300
                   AND regexp_matches(event_type, '^[a-z]+$'))
    """,
    doc="OP-FILTER-COMPLEMENT: quarantine rows failing validation (ref T:243-247, T:518-528).",
)
def op_filter_complement(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    valid = (
        F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & (F.col("value") <= 300)
        & F.col("event_type").rlike(r"^[a-z]+$")
    )
    return e.filter(~valid).select("event_id", "event_type", fin(dec("value")).alias("value"))


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------


@register(
    "op_join_inner",
    oracle="""
        SELECT o.o_orderkey, c.c_custkey, c.c_name,
               round(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 400000
    """,
    doc="OP-JOIN-INNER: FK equi-join (ref A:194, A:174, A:237).",
)
def op_join_inner(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders", "customer")
    return (
        o.filter(F.col("o_totalprice") > 400000)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_name", fin(dec("o_totalprice")).alias("totalprice"))
    )


@register(
    "op_join_inner_expr",
    oracle="""
        SELECT a.n_nationkey, a.n_name, b.un AS upper_name
        FROM nation a
        JOIN (SELECT n_nationkey AS k, upper(n_name) AS un FROM nation) b
          ON lower(a.n_name) = lower(b.un)
    """,
    doc="OP-JOIN-INNER-EXPR: join on LOWER(x)=LOWER(y) (ref A:358, A:370-371).",
)
def op_join_inner_expr(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    b = n.select(F.col("n_nationkey").alias("k"), F.upper("n_name").alias("un"))
    return n.join(b, F.lower(n.n_name) == F.lower(b.un)).select(
        "n_nationkey", "n_name", F.col("un").alias("upper_name")
    )


@register(
    "op_join_left",
    oracle="""
        SELECT n.n_nationkey, n.n_name, count(c.c_custkey) AS customer_cnt
        FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_nationkey, n.n_name
    """,
    doc="OP-JOIN-LEFT: left outer join keeping empty parents (ref A:293, A:304).",
)
def op_join_left(spark, sf_dir):
    n, c = _t(spark, sf_dir, "nation", "customer")
    per_nation = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("__cnt"))
    return (
        n.join(F.broadcast(per_nation), per_nation.c_nationkey == n.n_nationkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("__cnt"), F.lit(0)).alias("customer_cnt"),
        )
    )


@register(
    "op_join_multi",
    oracle="""
        SELECT n.n_name,
               round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1998-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n.n_name
    """,
    doc="OP-JOIN-MULTI: 4-table join chain + agg (ref A:582-585).",
)
def op_join_multi(spark, sf_dir):
    l, o, c, n = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "3,2"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(fin(F.sum(rev), 4).alias("revenue"))
    )


@register(
    "op_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
    doc="OP-JOIN-SEMI: IN (SELECT pk ...) parent-exists guard (ref T:290-291, T:328-329).",
)
def op_join_semi(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer", "orders")
    big = o.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_no_orders",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Q-NO-ORDERS / OP-JOIN-ANTI: customers with no orders (ref A:549-555, T:133-135).",
)
def q_no_orders(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer", "orders")
    return c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "op_corr_scalar_subquery",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               (SELECT p.p_name FROM part p WHERE p.p_partkey = l.l_partkey) AS part_name
        FROM lineitem l
        WHERE l.l_orderkey <= 200
    """,
    doc="OP-SELF-SUBQ: correlated scalar subquery as projection, decorrelated "
    "to a broadcast left join (ref A:537-539).",
)
def op_corr_scalar_subquery(spark, sf_dir):
    l, p = _t(spark, sf_dir, "lineitem", "part")
    return (
        l.filter(F.col("l_orderkey") <= 200)
        .join(F.broadcast(p.select("p_partkey", "p_name")), l.l_partkey == p.p_partkey, "left")
        .select("l_orderkey", "l_linenumber", F.col("p_name").alias("part_name"))
    )


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


@register(
    "op_agg_counts",
    oracle="""
        SELECT count(*) AS n_rows,
               count(o_custkey) AS n_custkey,
               count(DISTINCT o_custkey) AS n_distinct_cust,
               count(DISTINCT o_orderstatus) AS n_status
        FROM orders
    """,
    doc="OP-AGG-COUNT / COUNT-COL / COUNT-DISTINCT (ref A:7-8, A:164, T:1139-1145).",
)
def op_agg_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_custkey").alias("n_distinct_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS sum_disc_price,
               round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="OP-GROUPBY + OP-AGG-SUM over derived expressions (ref A:172, A:234, A:540); "
    "shaped after TPC-H Q1 as the pricing-summary stress agg.",
)
def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "3,2"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fin(F.sum(dec("l_quantity"))).alias("sum_qty"),
            fin(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            fin(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "op_agg_having",
    oracle="""
        SELECT event_type,
               round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 4) AS avg_value
        FROM events
        GROUP BY event_type
        HAVING round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 4) > 49
    """,
    doc="OP-HAVING + OP-AGG-AVG: avg per group, post-agg filter (ref A:161-167 Q-AVG-RATING).",
)
def op_agg_having(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    avg_value = F.round(F.sum(dec("value")).cast("double") / F.count("value"), 4)
    return (
        e.groupBy("event_type")
        .agg(avg_value.alias("avg_value"))
        .filter(F.col("avg_value") > 49)
    )


@register(
    "op_agg_sum_coalesce",
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               round(CAST(SUM(COALESCE(CAST(l.l_quantity AS DECIMAL(18,2)), 0)) AS DOUBLE), 2) AS total_qty
        FROM supplier s LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_suppkey, s.s_name
    """,
    doc="OP-AGG-SUM-COALESCE: null-safe sum over left join (ref A:291, A:302).",
)
def op_agg_sum_coalesce(spark, sf_dir):
    s, l = _t(spark, sf_dir, "supplier", "lineitem")
    # aggregate-before-join: a left join with the FACT table on the right
    # can't broadcast and would SMJ the whole fact; pre-aggregating turns
    # it into suppliers LEFT JOIN |suppliers|-sized totals (broadcast)
    per_supp = l.groupBy("l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("__qty")
    )
    return (
        s.join(F.broadcast(per_supp), per_supp.l_suppkey == s.s_suppkey, "left")
        .select(
            "s_suppkey",
            "s_name",
            fin(F.coalesce(F.col("__qty"), F.lit(0))).alias("total_qty"),
        )
    )


@register(
    "q_prime_cities",
    oracle="""
        SELECT n.n_name,
               count(*) AS total_customers,
               count(*) FILTER (WHERE c.c_mktsegment = 'BUILDING') AS building_customers,
               round((count(*) FILTER (WHERE c.c_mktsegment = 'BUILDING')) * 100.0
                     / nullif(count(*), 0), 2) AS building_pct
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="Q-PRIME-CITIES: conditional agg + NULLIF-guarded percentage "
    "(ref A:566-576 prime-member concentration per city).",
)
def q_prime_cities(spark, sf_dir):
    c, n = _t(spark, sf_dir, "customer", "nation")
    is_building = F.when(F.col("c_mktsegment") == "BUILDING", 1)
    total = F.count(F.lit(1))
    bcount = F.count(is_building)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            total.alias("total_customers"),
            bcount.alias("building_customers"),
            F.round(
                bcount * 100.0 / F.when(total != 0, total), 2
            ).alias("building_pct"),
        )
    )


@register(
    "op_agg_scalars_report",
    oracle="""
        SELECT (SELECT count(*) FROM customer) AS customers,
               (SELECT count(*) FROM orders) AS orders,
               (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS dup_order_pks,
               (SELECT count(*) FROM orders o LEFT JOIN customer c
                  ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS orphan_orders,
               (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS null_order_pks
    """,
    doc="OP-AGG-SCALARS / PIPE-AUDIT: one-row multi-scalar integrity report "
    "(ref T:405-408, T:1130-1176).",
)
def op_agg_scalars_report(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer", "orders")
    customers = c.agg(F.count(F.lit(1)).alias("customers"))
    orders_agg = o.agg(
        F.count(F.lit(1)).alias("orders"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_order_pks"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("null_order_pks"),
    )
    orphans = (
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return (
        customers.crossJoin(orders_agg)
        .crossJoin(orphans)
        .select("customers", "orders", "dup_order_pks", "orphan_orders", "null_order_pks")
    )


# ---------------------------------------------------------------------------
# §2.6 windows, §2.7 sort/top-k
# ---------------------------------------------------------------------------


@register(
    "op_win_rownum_dedup",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey FROM (
            SELECT l_orderkey, l_linenumber, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey) AS rn
            FROM lineitem
        ) t WHERE rn = 1
    """,
    doc="OP-WIN-ROWNUM / OP-DELETE-DEDUP: keep-first-per-key via row_number (ref A:68-77).",
)
def op_win_rownum_dedup(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@register(
    "q_high_value",
    oracle="""
        SELECT c_custkey, c_name,
               round(CAST(total_spending AS DOUBLE), 2) AS total_spending,
               spending_rank
        FROM (
            SELECT c.c_custkey, c.c_name,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_spending,
                   rank() OVER (ORDER BY SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) DESC) AS spending_rank
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
        ) t WHERE total_spending > 4000000
    """,
    doc="Q-HIGH-VALUE: spend per customer, global rank, threshold filter "
    "(ref A:189-215 Task 10). Global rank runs post-aggregation on "
    "|customers| rows — never on the fact table (SURVEY §7.4) — and uses "
    "the two-phase operators/ranking.py plan: no single-partition stage.",
)
def q_high_value(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders", "customer")
    # aggregate-before-join: shuffle carries (custkey, partial sum), not the
    # fact table's width; the name join then runs on |customers| rows
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(38,2)").alias("total_spending")
    )
    spend = per_cust.join(
        c.select("c_custkey", "c_name"), per_cust.o_custkey == c.c_custkey
    ).select("c_custkey", "c_name", "total_spending")
    return (
        global_rank(spend, "total_spending", "spending_rank")
        .filter(F.col("total_spending") > 4000000)
        .select(
            "c_custkey",
            "c_name",
            fin("total_spending").alias("total_spending"),
            "spending_rank",
        )
    )


@register(
    "q_product_sales_rank",
    oracle="""
        SELECT p_partkey, p_name,
               round(CAST(total_sales AS DOUBLE), 2) AS total_sales,
               sales_rank
        FROM (
            SELECT p.p_partkey, p.p_name,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_sales,
                   rank() OVER (ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) DESC) AS sales_rank
            FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
            GROUP BY p.p_partkey, p.p_name
        ) t
    """,
    doc="Q-PRODUCT-SALES-RANK: join + agg + global rank (ref A:169-176 "
    "Task 9); two-phase rank via operators/ranking.py.",
)
def q_product_sales_rank(spark, sf_dir):
    p, l = _t(spark, sf_dir, "part", "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("total_sales")
    )
    agg = per_part.join(
        F.broadcast(p.select("p_partkey", "p_name")), per_part.l_partkey == p.p_partkey
    ).select("p_partkey", "p_name", "total_sales")
    return global_rank(agg, "total_sales", "sales_rank").select(
        "p_partkey",
        "p_name",
        fin("total_sales").alias("total_sales"),
        "sales_rank",
    )


@register(
    "op_topk",
    oracle="""
        SELECT o_orderkey, round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="OP-TOPK: ORDER BY + LIMIT -> TakeOrderedAndProject, distributed top-k "
    "without a full sort (ref A:543-544, A:263-264).",
)
def op_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", fin(dec("o_totalprice")).alias("totalprice"))
    )


@register(
    "op_topk_ties",
    oracle="""
        WITH counts AS (
            SELECT o_custkey, count(*) AS num_orders FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, num_orders FROM counts
        WHERE num_orders = (SELECT max(num_orders) FROM counts)
    """,
    doc="OP-TOPK-TIES + OP-SUBQ-SCALAR-UNCORR: all rows tied for the max, "
    "scalar-max filter not LIMIT (ref A:271-280, A:301-309).",
)
def op_topk_ties(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("num_orders"))
    mx = counts.agg(F.max("num_orders").alias("mx"))
    return (
        counts.join(F.broadcast(mx), counts.num_orders == mx.mx)
        .select("o_custkey", "num_orders")
    )


@register(
    "op_sort_nulls",
    oracle="""
        SELECT o_orderkey, o_orderdate FROM orders
        ORDER BY o_orderdate DESC NULLS LAST, o_orderkey LIMIT 50
    """,
    doc="OP-SORT-NULLS + OP-TOPK: explicit null placement (ref T:1180).",
)
def op_sort_nulls(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").desc_nulls_last(), "o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# §2.8 set operations (engine surface beyond reference; SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "op_set_union",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        UNION
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
    doc="OP-SET: UNION (distinct) — not used by the reference (SURVEY §2.8) "
    "but part of the engine surface.",
)
def op_set_union(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer", "orders")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 450000).select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


@register(
    "op_set_intersect_except",
    oracle="""
        SELECT 'intersect' AS op, count(*) AS n FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        )
        UNION ALL
        SELECT 'except' AS op, count(*) AS n FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        )
    """,
    doc="OP-SET: INTERSECT / EXCEPT counts (engine surface; SURVEY §2.8).",
)
def op_set_intersect_except(spark, sf_dir):
    c, o = _t(spark, sf_dir, "customer", "orders")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("c_custkey"))
    inter = a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    exc = a.exceptAll(b.distinct()).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return inter.unionAll(exc)


# ---------------------------------------------------------------------------
# §2.10 CTEs / named pipelines
# ---------------------------------------------------------------------------


@register(
    "q_top_customers_period",
    oracle="""
        WITH order_counts AS (
            SELECT o_custkey, count(*) AS num_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_custkey
        )
        SELECT o_custkey, num_orders,
               rank() OVER (ORDER BY num_orders DESC) AS order_rank
        FROM order_counts
        ORDER BY num_orders DESC, o_custkey
        LIMIT 20
    """,
    doc="Q-TOP-CUSTOMERS-PERIOD / OP-CTE: order counts in a half-open date "
    "range, rank, top-20 (ref A:246-280 Task 11.2).",
)
def q_top_customers_period(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    counts = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("num_orders"))
    )
    return (
        global_rank(counts, "num_orders", "order_rank")
        .orderBy(F.col("num_orders").desc(), "o_custkey")
        .limit(20)
    )


@register(
    "q_order_revenue",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey,
               count(l.l_linenumber) AS line_count,
               round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '2001-01-01'
        GROUP BY o.o_orderkey, o.o_custkey
    """,
    doc="Q-ORDER-REVENUE: revenue + line count per order (ref A:230-239 Task 11.1).",
)
def q_order_revenue(spark, sf_dir):
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "3,2"))
    return (
        o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.count("l_linenumber").alias("line_count"),
            fin(F.sum(rev), 4).alias("revenue"),
        )
    )


@register(
    "q_supplier_stock",
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               round(CAST(SUM(COALESCE(CAST(l.l_quantity AS DECIMAL(18,2)), 0)) AS DOUBLE), 2) AS total_qty
        FROM supplier s LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY total_qty DESC, s.s_suppkey
        LIMIT 1
    """,
    doc="Q-SUPPLIER-STOCK: supplier with most volume, LIMIT-1 variant with "
    "deterministic tiebreak (ref A:288-309 Task 11.3).",
)
def q_supplier_stock(spark, sf_dir):
    s, l = _t(spark, sf_dir, "supplier", "lineitem")
    per_supp = l.groupBy("l_suppkey").agg(F.sum(dec("l_quantity")).alias("__qty"))
    return (
        s.join(F.broadcast(per_supp), per_supp.l_suppkey == s.s_suppkey, "left")
        .select(
            "s_suppkey",
            "s_name",
            fin(F.coalesce(F.col("__qty"), F.lit(0))).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "s_suppkey")
        .limit(1)
    )


@register(
    "q_top3_products",
    oracle="""
        SELECT t.l_partkey,
               (SELECT p.p_name FROM part p WHERE p.p_partkey = t.l_partkey) AS part_name,
               round(CAST(t.total_revenue AS DOUBLE), 2) AS total_revenue
        FROM (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_revenue
            FROM lineitem GROUP BY l_partkey
            ORDER BY total_revenue DESC, l_partkey LIMIT 3
        ) t
    """,
    doc="Q-TOP3-PRODUCTS: top-3 by revenue with correlated name lookup "
    "(ref A:536-544 Task 13.1).",
)
def q_top3_products(spark, sf_dir):
    l, p = _t(spark, sf_dir, "lineitem", "part")
    top3 = (
        l.groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), "l_partkey")
        .limit(3)
    )
    return top3.join(
        F.broadcast(p.select("p_partkey", F.col("p_name").alias("part_name"))),
        top3.l_partkey == F.col("p_partkey"),
        "left",
    ).select("l_partkey", "part_name", fin("total_revenue").alias("total_revenue"))


@register(
    "q_top_categories",
    oracle="""
        SELECT r.r_name, count(*) AS line_count
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY line_count DESC, r.r_name
        LIMIT 3
    """,
    doc="Q-TOP-CATEGORIES: top-3 through a long join chain "
    "(ref A:579-588 Task 14.2's od→products→subcategories→categories).",
)
def q_top_categories(spark, sf_dir):
    l, o, c, n, r = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        l.select("l_orderkey")
        .join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .orderBy(F.col("line_count").desc(), "r_name")
        .limit(3)
    )


@register(
    "op_set_ops_all",
    oracle="""
        SELECT 'intersect_all' AS op, o_orderpriority AS val, count(*) AS n
        FROM (
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
            INTERSECT ALL
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        ) GROUP BY 2
        UNION ALL
        SELECT 'except_all' AS op, o_orderpriority AS val, count(*) AS n
        FROM (
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
            EXCEPT ALL
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        ) GROUP BY 2
    """,
    doc="OP-SET multiset variants (SURVEY §2.8 completion): INTERSECT ALL "
    "keeps min(countA, countB) copies per value, EXCEPT ALL keeps "
    "countA - countB — bag semantics the DISTINCT set ops in "
    "op_set_intersect_except cannot express (duplicate *degrees* "
    "survive). Result is folded to (value, multiplicity) so the output "
    "is deterministic. Spark's intersectAll/exceptAll lower to a single "
    "count-based aggregation + generate, not a join — one shuffle each.",
)
def op_set_ops_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    inter = (
        a.intersectAll(b)
        .groupBy(F.col("o_orderpriority").alias("val"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "val", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy(F.col("o_orderpriority").alias("val"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "val", "n")
    )
    return inter.unionAll(exc)
