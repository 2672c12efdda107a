#!/usr/bin/env python
"""A/B: rename-swap partitioned MV sink vs per-bucket MVCC sink (r11,
VERDICT r10 item 5 — make the POSIX-default recommendation measured, not
argued).

Protocol (the r8 partitioned-sink A/B pattern, SCALE.md "Round-8:
partitioned streaming-MV sink A/B"): one seed drain builds a
``AB_GROUPS``-group view state (both modes pay the same streaming fixed
cost), then ``AB_REPS`` timed drains each fold one delta batch; we report
the MINIMUM timed fold (noise floor) per case. Matrix: sink mode x
num_buckets {16, 64} x delta shape {narrow: 2 groups -> <=2 touched
buckets; wide: 4*num_buckets groups spread across the key range -> every
bucket touched}. The narrow case isolates per-fold FIXED overhead
(pointer flips + snapshot churn vs two renames per bucket); the wide case
scales both modes' rewrite to the whole view, where staging-copy overhead
(mvcc writes to a staging tree then MOVES leaves into version slots)
would surface if it mattered.

Run ALONE on the machine (bench-noise protocol). Results land in
SCALE.md; the pytest lock derived from them is
tests/test_streaming.py::test_mvcc_sink_snapshot_churn_bounded.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from amazon_fresh_sql_data_engineering_spark.session import build_session  # noqa: E402
from amazon_fresh_sql_data_engineering_spark.streaming import mv as MV  # noqa: E402

SCH = "g long, rev double, __op int"
GROUPS = int(os.environ.get("AB_GROUPS", "1600000"))
REPS = int(os.environ.get("AB_REPS", "3"))


def _delta(spark, n: int, spread: bool):
    step = max(GROUPS // n, 1) if spread else 1
    return spark.range(n).select(
        (F.col("id") * step).alias("g"),
        F.lit(2.0).alias("rev"),
        F.lit(1).alias("__op"),
    )


def run_case(spark, mode: str, nb: int, delta_n: int, spread: bool, tmp: str):
    fn = (
        MV.run_mv_maintain_stream_partitioned
        if mode == "swap"
        else MV.run_mv_maintain_stream_partitioned_mvcc
    )
    tag = f"{mode}_{nb}_{delta_n}"
    src = f"{tmp}/src_{tag}"
    out = f"{tmp}/out_{tag}"
    ckpt = f"{tmp}/ckpt_{tag}"

    def drain():
        fn(
            spark.readStream.schema(SCH).parquet(src),
            out, ckpt, ["g"], {"rev": "rev"}, num_buckets=nb,
        )

    seed = spark.range(GROUPS).select(
        F.col("id").alias("g"), F.lit(1.0).alias("rev"), F.lit(1).alias("__op")
    )
    seed.coalesce(8).write.parquet(src)
    drain()  # batch 0: builds the full state (untimed)
    times = []
    for _ in range(REPS):
        _delta(spark, delta_n, spread).coalesce(1).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        drain()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3), [round(t, 3) for t in times]


def main() -> None:
    spark = build_session(app_name="mvcc_ab")
    tmp = tempfile.mkdtemp(prefix="sparkgraft_mvcc_ab_")
    print(f"groups={GROUPS} reps={REPS} tmp={tmp}", flush=True)
    try:
        for nb in (16, 64):
            for delta_n, spread, shape in ((2, False, "narrow"), (4 * nb, True, "wide")):
                row = {}
                for mode in ("swap", "mvcc"):
                    best, all_t = run_case(spark, mode, nb, delta_n, spread, tmp)
                    row[mode] = best
                    print(
                        f"  nb={nb} delta={delta_n}({shape}) {mode}: "
                        f"min={best} all={all_t}",
                        flush=True,
                    )
                print(
                    f"CASE nb={nb} shape={shape} swap={row['swap']} "
                    f"mvcc={row['mvcc']} ratio={round(row['mvcc']/row['swap'], 3)}",
                    flush=True,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
