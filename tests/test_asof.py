"""Unit semantics for the as-of (merge) join operator: inclusivity,
deterministic tiebreak, key isolation, and left-vs-inner behavior.
(The catalog query op_asof_join is additionally oracle-checked end-to-end
in test_oracle_parity.)"""

from __future__ import annotations

import datetime as dt

from amazon_fresh_sql_data_engineering_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after r2, ties r2's ts
            (2, 10, _ts("2024-01-01T09:30:00")),  # between r1 and r2
            (3, 10, _ts("2024-01-01T08:00:00")),  # before all rights
            (4, 20, _ts("2024-01-01T12:00:00")),  # other key
        ],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T09:00:00"), 1.0),
            (101, 10, _ts("2024-01-01T10:00:00"), 2.0),
            (102, 10, _ts("2024-01-01T10:00:00"), 3.0),  # same ts as 101
            (103, 20, _ts("2024-01-01T11:00:00"), 4.0),
        ],
        "rid long, k long, rts timestamp, v double",
    )
    return left, right


def test_asof_inclusive_tiebreak_and_keys(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid, r.v)
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            payload={"rid": "rid", "v": "v"}, tiebreak="rid",
        ).collect()
    }
    # equal timestamps match (inclusive), greatest tiebreak rid wins
    assert out[1] == (102, 3.0)
    assert out[2] == (100, 1.0)
    assert 3 not in out  # no right row at-or-before -> dropped (inner)
    assert out[4] == (103, 4.0)  # key 20 never sees key 10's rows


def test_asof_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            payload={"rid": "rid"}, tiebreak="rid", how="left",
        ).collect()
    }
    assert out[3] is None and len(out) == 4


def test_asof_preserves_left_columns(spark):
    left, right = _frames(spark)
    cols = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload={"rid": "rid"}, tiebreak="rid",
    ).columns
    assert cols == ["lid", "k", "lts", "rid"]


def test_asof_forced_scale_stress(spark):
    """Forced-scale adversarial stress, same hazard class as the two-phase
    family stress: 120k left x 120k right rows over ~100 keys with one
    mega key holding a third of each side (one window task sorts ~80k
    rows), timestamps drawn from a coarse grid so exact left==right ties
    and duplicate right timestamps are everywhere, plus NULL-timestamp
    slices on both sides. Parity oracle is pandas ``merge_asof`` — an
    independent merge-join implementation, not a re-plan of the same
    union-merge: right sorted stably by (ts, tiebreak) makes backward
    inclusive matching pick the greatest rid among the most recent
    timestamps, which is exactly asof_join's contract."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 120_000
    mega = F.col("id") % 3 == 0  # ~40k rows on key 7
    left = spark.range(n).repartition(16).select(
        F.col("id").alias("lid"),
        F.when(mega, F.lit(7)).otherwise(F.pmod(F.hash("id"), F.lit(97))).alias("k"),
        F.when(
            F.col("id") % 101 == 0, F.lit(None)
        ).otherwise(F.pmod(F.hash(F.col("id") + 1), F.lit(1000)) * 7).alias("lts"),
    )
    right = spark.range(n).repartition(16).select(
        F.col("id").alias("rid"),
        F.when(mega, F.lit(7)).otherwise(F.pmod(F.hash("id"), F.lit(97))).alias("k"),
        F.when(
            F.col("id") % 103 == 0, F.lit(None)
        ).otherwise(F.pmod(F.hash(F.col("id") + 2), F.lit(1000)) * 7).alias("rts"),
        (F.pmod(F.hash(F.col("id") + 3), F.lit(10_000)) / 100.0).alias("v"),
    )

    got = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload={"rid": "rid", "v": "v"}, tiebreak="rid", how="left",
    ).toPandas()

    pl = left.toPandas()
    pr = right.toPandas()
    pl = pl[pl.lts.notna()].sort_values("lts", kind="mergesort")
    pr = pr[pr.rts.notna()].sort_values(["rts", "rid"], kind="mergesort")
    exp = pd.merge_asof(
        pl, pr, left_on="lts", right_on="rts", by="k",
        direction="backward", allow_exact_matches=True,
    ).set_index("lid")

    assert len(got) == len(exp)  # how="left": every non-null-lts left row
    got = got.set_index("lid")
    merged = exp[["rid", "v"]].join(got[["rid", "v"]], lsuffix="_e", rsuffix="_g")
    both_null = merged.rid_e.isna() & merged.rid_g.isna()
    same = (merged.rid_e == merged.rid_g) & (merged.v_e == merged.v_g)
    assert (both_null | same).all()
    # the unmatched slice is real (early left rows before any right row)
    assert both_null.sum() > 0 and same.sum() > 100_000
