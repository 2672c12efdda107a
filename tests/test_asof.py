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
