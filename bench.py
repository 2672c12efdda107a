#!/usr/bin/env python
"""Benchmark harness: run the query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing = wall-clock of a full materialization (count of the result;
the driver collects separately). One warm-up pass (JVM + parquet footer cache)
precedes timing, matching BASELINE.md's protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG
from amazon_fresh_sql_data_engineering_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = build_session(app_name="bench")

    # Warm-up: touch every table + run the flagship once (JIT, codegen,
    # parquet footers), and spin up the Python UDF workers + Arrow codepath
    # with a synthetic one-column UDF (shares no plan/cache with any catalog
    # query, so nothing timed below gets pre-computed). Not timed.
    CATALOG["q_high_value"].fn(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    @pandas_udf("array<long>")
    def _warm_arr(s: pd.Series) -> pd.Series:
        return pd.Series([[v] for v in s])

    df = spark.range(10000)
    df.select(_warm(F.col("id").cast("double"))).count()
    df.select(F.explode(_warm_arr(F.col("id")))).count()

    timings: dict[str, float] = {}
    for name, spec in CATALOG.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        # drop caches an operator persisted internally (LSH signatures,
        # iterative labels) so no query's memory footprint leaks into the next
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "spark_version": spark.version,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
