#!/usr/bin/env python
"""Round-12 optimization probe: time a subset of catalog queries in isolation
(fresh session, bench-identical warm-up + timed() protocol) and optionally
dump .explain("formatted") to plans/r12/<name>_<tag>.txt.

Usage:
    python scripts_opt_probe.py q1 q2 ...            # time only
    python scripts_opt_probe.py --plans TAG q1 ...   # also dump plans
    python scripts_opt_probe.py --warm N q1 ...      # warm reps (default 3)

Timing protocol is bench.py's `timed()` verbatim (count + clearCache +
explicit unpersist of leaked localCheckpoint blocks) so numbers are
comparable with BENCH_full_* per-query entries, modulo catalog position.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
from amazon_fresh_sql_data_engineering_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    tag = None
    warm_reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--warm" in args:
        i = args.index("--warm")
        warm_reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="opt-probe")

    # bench.py warm-up, abbreviated: flagship + python-worker spin-up
    CATALOG["q_high_value"].fn(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    spark.range(10000).select(_warm(F.col("id").cast("double"))).count()

    from amazon_fresh_sql_data_engineering_spark.queries_etl import prestage_fixtures

    prestage_fixtures(spark, sf_dir)
    from amazon_fresh_sql_data_engineering_spark.queries_ext import (
        prestage_fixtures as prestage_ext,
    )

    prestage_ext(spark, sf_dir)

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist()
        return dt

    out = {}
    for name in names:
        spec = CATALOG[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        cold = round(timed(spec.fn), 4)
        warms = sorted(round(timed(spec.fn), 4) for _ in range(warm_reps))
        out[name] = {
            "cold": cold,
            "warm_med": warms[len(warms) // 2] if warms else None,
            "warms": warms,
        }
        if tag is not None:
            from amazon_fresh_sql_data_engineering_spark.plans import physical_plan

            os.makedirs("plans/r12", exist_ok=True)
            df = spec.fn(spark, sf_dir)
            with open(f"plans/r12/{name}_{tag}.txt", "w") as fh:
                fh.write(physical_plan(df))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
