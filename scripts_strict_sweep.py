"""Strict driver-simulation sweep: exact pandas dtype + repr comparison.

The local parity gate (tests/oracle_compare.compare) reads DuckDB results
via ``fetchall()``, which converts HUGEINT to Python int and so masks
dtype divergences the external driver's pandas path exposes (its
canonicalizer hashes ``.toPandas()`` vs ``.df()`` frames — int64 216 and
float64 216.0 hash differently, list cells raise on sort). This script
replicates the driver's path bit-for-bit: both engines through pandas,
columns sorted by name, rows sorted by all columns, then per-column dtype
and per-cell ``repr`` compared with NO normalization.

It intentionally over-flags relative to the driver: int-width
(int8/int32-vs-int64), datetime64[ns]-vs-[us], date-vs-datetime and
None-vs-NaN deltas are measured driver-BENIGN (green rows exist with each
— see registry.fin's rules), so treat those classes as noise and
everything else as a future red row. Used in round 4 to find 21 real
divergences (3 array `err`s, 17 HUGEINT float64s, 1 signed zero) of which
the r3 driver sample had only surfaced 4.

Usage: python scripts_strict_sweep.py [sf_dir] [name,name,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_BENIGN_HINT = (
    "int-width / datetime-precision / date-vs-datetime / None-vs-NaN "
    "deltas are driver-benign (registry.fin rules); anything else will "
    "be a red driver row"
)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from amazon_fresh_sql_data_engineering_spark.catalog import CATALOG

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    def canon(df):
        df = df[sorted(df.columns)]
        try:
            return df.sort_values(list(df.columns)).reset_index(drop=True)
        except TypeError as e:  # unsortable cells — a driver `err` row
            raise RuntimeError(f"CANON-UNSORTABLE: {e}") from e

    n_bad = 0
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            print(f"no-oracle {name}", flush=True)
            continue
        try:
            s = canon(spec.fn(spark, sf).toPandas())
            o = canon(con.execute(spec.oracle).df())
            probs = []
            if list(s.columns) != list(o.columns):
                probs.append(f"cols {list(s.columns)} vs {list(o.columns)}")
            elif len(s) != len(o):
                probs.append(f"rows {len(s)} vs {len(o)}")
            else:
                for c in s.columns:
                    if str(s[c].dtype) != str(o[c].dtype):
                        probs.append(f"dtype[{c}] {s[c].dtype} vs {o[c].dtype}")
                    sv, ov = s[c].values, o[c].values
                    neq = [i for i in range(len(s)) if repr(sv[i]) != repr(ov[i])]
                    if neq:
                        i = neq[0]
                        probs.append(
                            f"val[{c}] {len(neq)} diffs e.g. row {i}: "
                            f"{sv[i]!r} vs {ov[i]!r}"
                        )
            msg = "; ".join(probs)
        except Exception as e:
            msg = f"ERR: {str(e).splitlines()[-1][:200]}"
        if msg:
            n_bad += 1
            print(f"!! {name}: {msg}", flush=True)
        else:
            print(f"ok {name}", flush=True)

    print(f"\nDONE flagged={n_bad}  ({_BENIGN_HINT})")
    return 0  # advisory: benign classes flag too; gate lives in tests


if __name__ == "__main__":
    raise SystemExit(main())
