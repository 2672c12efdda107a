"""Property-based tests (hypothesis) for the cleaning kit: the Spark
expressions must agree with an independent Python reference on arbitrary
inputs — catching edge cases the fixture tables miss (SURVEY §5 layer 1)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.functions import cleaning as K

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=30,
)
_SETTINGS = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _batch(spark, expr, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.y for r in df.select(expr.alias("y")).collect()]


def _py_clean_text(v):
    if v is None:
        return None
    t = v.strip()
    return t or None


def _py_parse_int(v):
    if v is None:
        return None
    t = v.strip()
    if re.fullmatch(r"-?\d+", t):
        n = int(t)
        if -(2**31) <= n < 2**31:
            return n
        return None  # overflow -> NULL under non-ANSI cast
    return None


def _py_parse_bool(v):
    if v is None:
        return None
    t = v.strip().lower()
    if t in ("yes", "y", "true", "1"):
        return True
    if t in ("no", "n", "false", "0", ""):
        return False
    return None


@given(st.lists(st.one_of(st.none(), TEXT), min_size=1, max_size=20))
@_SETTINGS
def test_clean_text_matches_reference(spark, values):
    got = _batch(spark, K.clean_text("x"), values)
    want = [_py_clean_text(v) for v in values]
    # Spark trim strips ASCII space only; python strip() strips more — feed
    # both through the comparison only when they agree on the definition
    for g, w, v in zip(got, want, values):
        if v is not None and v.strip() != v.strip(" "):
            continue  # non-space whitespace: definitions diverge by design
        assert g == w, (v, g, w)


@given(st.lists(st.one_of(st.none(), TEXT, st.integers(-(10**12), 10**12).map(str)), min_size=1, max_size=20))
@_SETTINGS
def test_parse_int_matches_reference(spark, values):
    got = _batch(spark, K.parse_int("x"), values)
    for g, v in zip(got, values):
        if v is not None and v.strip() != v.strip(" "):
            continue
        assert g == _py_parse_int(v), (v, g)


@given(st.lists(st.one_of(st.none(), TEXT, st.sampled_from(["yes", "Y", "no", "0", "1", "", " TRUE "])), min_size=1, max_size=20))
@_SETTINGS
def test_parse_bool_matches_reference(spark, values):
    got = _batch(spark, K.parse_bool("x"), values)
    for g, v in zip(got, values):
        if v is not None and v.strip() != v.strip(" "):
            continue
        assert g == _py_parse_bool(v), (v, g)


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 31), st.integers(1000, 9999)),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_parse_date_mdy_matches_reference(spark, mdy):
    import datetime

    values = [f"{m}/{d}/{y}" for m, d, y in mdy]
    got = _batch(spark, K.parse_date_mdy("x"), values)
    for g, (m, d, y) in zip(got, mdy):
        try:
            want = datetime.date(y, m, d)
        except ValueError:
            want = None  # impossible calendar date -> NULL
        assert g == want, ((m, d, y), g)


@given(st.lists(st.one_of(TEXT, st.uuids().map(str), st.uuids().map(lambda u: str(u).upper())), min_size=1, max_size=20))
@_SETTINGS
def test_norm_uuid_matches_reference(spark, values):
    got = _batch(spark, K.norm_uuid("x"), values)
    pat = re.compile(K.UUID_RE)
    for g, v in zip(got, values):
        if v.strip() != v.strip(" "):
            continue
        t = v.strip()
        want = t.lower() if pat.fullmatch(t) else None
        assert g == want, (v, g, want)


@pytest.mark.parametrize("n", [0, 1, 2**31 - 1, 2**31, -(2**31) - 1])
def test_parse_int_boundaries(spark, n):
    got = _batch(spark, K.parse_int("x"), [str(n)])[0]
    assert got == (n if -(2**31) <= n < 2**31 else None)


def _unionfind(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=80,
    )
)
def test_distributed_components_match_unionfind_on_random_graphs(spark, edges):
    """Property: on ANY random edge set, the distributed pointer-doubling
    propagation produces the identical (node -> min-id) labels as a
    reference union-find."""
    from amazon_fresh_sql_data_engineering_spark.operators import dedup as D

    norm = [(min(a, b), max(a, b)) for a, b in edges]
    pairs = spark.createDataFrame(norm, "id_a long, id_b long")
    got = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    assert got == set(_unionfind(norm).items())


def test_minhash_features_stable_under_repartition(spark, sf_dir):
    """Determinism claim: signatures and shingle hashes are identical for
    any physical partitioning (no partition-dependent state leaks into the
    feature UDF)."""
    from amazon_fresh_sql_data_engineering_spark.operators.dedup import minhash_features
    from amazon_fresh_sql_data_engineering_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").limit(200)
    a = {
        r["__id"]: (tuple(r["__sig"]), tuple(r["__h"]))
        for r in minhash_features(d.repartition(1), "doc_id", "text").collect()
    }
    b = {
        r["__id"]: (tuple(r["__sig"]), tuple(r["__h"]))
        for r in minhash_features(d.repartition(17), "doc_id", "text").collect()
    }
    assert a == b


@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=120),
    st.booleans(),
)
@_SETTINGS
def test_global_rank_matches_window_on_random_data(spark, values, descending):
    """Two-phase global rank == single-window rank on arbitrary data with
    arbitrary tie structure, both sort directions (operators/ranking.py)."""
    from pyspark.sql import Window

    from amazon_fresh_sql_data_engineering_spark.operators.ranking import global_rank

    df = spark.createDataFrame(list(enumerate(values)), "id int, v int")
    key = F.col("v").desc() if descending else F.col("v").asc()
    exp = {(r.id, r.r) for r in df.withColumn("r", F.rank().over(Window.orderBy(key))).collect()}
    got = {(r.id, r.r) for r in global_rank(df, "v", "r", descending=descending).collect()}
    assert got == exp


@given(st.lists(st.integers(0, 50), min_size=1, max_size=120))
@_SETTINGS
def test_global_cumsum_matches_window_on_random_data(spark, values):
    from pyspark.sql import Window

    from amazon_fresh_sql_data_engineering_spark.operators.ranking import global_cumsum

    df = spark.createDataFrame(list(enumerate(values)), "id int, v int")
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    exp = {(r.id, r.cs) for r in df.withColumn("cs", F.sum("v").over(w)).collect()}
    got = {
        (r.id, r.cs)
        for r in global_cumsum(
            df, [F.col("v").asc(), F.col("id").asc()], "v", "cs"
        ).collect()
    }
    assert got == exp


# ---- incremental-MV delta rule (operators/mv.py): delta-apply must be
# indistinguishable from rebuild for ARBITRARY base tables, delete subsets
# and insert batches — the algebraic law the oracle spot-checks on orders,
# proven here over adversarial shapes (negative/zero revenues, all-deleted
# groups, inserts creating brand-new groups, duplicate rows).

_MV_ROW = st.tuples(
    st.integers(min_value=0, max_value=3),   # group key g (few groups -> collisions)
    st.integers(min_value=0, max_value=1),   # subkey s
    st.integers(min_value=-100, max_value=100),  # integer revenue (exact)
)


@given(
    base=st.lists(_MV_ROW, min_size=0, max_size=12),
    inserts=st.lists(_MV_ROW, min_size=0, max_size=6),
    del_mask=st.lists(st.booleans(), min_size=12, max_size=12),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mv_delta_apply_equals_rebuild_property(spark, base, inserts, del_mask):
    from amazon_fresh_sql_data_engineering_spark.operators import mv

    schema = "g int, s int, rev long"
    base_df = spark.createDataFrame([(g, s, r) for g, s, r in base] or [], schema)
    deletes = [row for row, d in zip(base, del_mask) if d]
    keys, sums = ["g", "s"], {"rev": "rev"}
    mv0 = mv.mv_build(base_df, keys, sums)
    delta_rows = [(g, s, r, 1) for g, s, r in inserts] + [
        (g, s, r, -1) for g, s, r in deletes
    ]
    delta = spark.createDataFrame(delta_rows or [], schema + ", __op int")
    got = {
        (r.g, r.s): (r["__mv_cnt"], r.rev)
        for r in mv.mv_apply_delta(mv0, delta, keys, sums).collect()
    }
    # independent Python reference: multiset semantics
    from collections import Counter

    eff = Counter()
    tot = Counter()
    for g, s, r in base + inserts:
        eff[(g, s)] += 1
        tot[(g, s)] += r
    for g, s, r in deletes:
        eff[(g, s)] -= 1
        tot[(g, s)] -= r
    exp = {k: (n, tot[k]) for k, n in eff.items() if n > 0}
    assert got == exp
