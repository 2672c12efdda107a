"""Sources: parquet table registry + CSV staging ingest.

Mirrors the reference's two ingest tiers (SURVEY.md §1.1):
- typed tables      -> ``spark.read.parquet`` (columnar, pushdown-friendly)
- staging tables    -> ``spark.read.csv`` with an all-StringType schema and
  NO inference, matching the reference's all-TEXT staging DDL
  (ref TablesCreated-Imported.sql:80-103).

At scale, the parquet reader is the workhorse: column pruning and predicate
pushdown reach the scan automatically as long as callers express filters and
projections declaratively (checked in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """OP-SCAN: one parquet table -> DataFrame (lazy; scan-level pruning).

    ``events.parquet`` carries TIMESTAMP(NANOS) which the vectorized Spark
    reader rejects; read nanos as long and convert to a microsecond
    timestamp (lossless here — the data has microsecond resolution).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Some Spark builds surface parquet TIMESTAMP(NANOS) as NTZ
            # directly; watermarks/windows need the LTZ TIMESTAMP type.
            # Session tz is pinned to UTC (registry.ensure_engine_confs),
            # so the cast is a no-op on the stored instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so ``spark.sql`` queries see the same tables the
    DuckDB oracle sees (driver contract)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def all_string_schema(columns: list[str]) -> T.StructType:
    """Schema for a staging table: every column StringType (TEXT tier)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def load_staging_csv(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """OP-CSV-LOAD: CSV -> all-text staging DataFrame, no type inference.

    Matches the reference's CSV landing zone semantics: everything arrives as
    nullable text and is validated/cast later by the cleaning pipeline
    (ref TablesCreated-Imported.sql:80-103).
    """
    return spark.read.csv(path, header=True, schema=all_string_schema(columns))


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """JSONL (newline-delimited JSON) ingest — the interchange format of
    crawl / training-data pipelines (one document object per line).

    With ``schema`` given (ALWAYS do this in production) the reader skips
    the inference pass entirely: inference is a full extra scan of the
    data, which at 100 TB doubles ingest cost and — worse — samples types
    that can drift between files. Corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job,
    mirroring the quarantine-not-crash contract of the cleaning pipeline
    and multimodal decode. Pass a DDL string or StructType.
    """
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        # make room for quarantined lines alongside the declared fields
        if "_corrupt_record" not in [f.name for f in schema.fields]:
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField("_corrupt_record", T.StringType(), True)]
            )
        reader = reader.schema(schema)
    return reader.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """JSONL export (one object per line, parallel part files). At scale,
    size partitions so each part file lands in the 100 MB - 1 GB band the
    downstream consumers want; gzip via .option('compression','gzip') costs
    splittability — prefer many uncompressed parts or zstd parquet."""
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").json(path)
