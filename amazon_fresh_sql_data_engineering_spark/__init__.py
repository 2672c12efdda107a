"""amazon_fresh_sql_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine reproducing the query and data-processing
capabilities of the reference project
``KousalyaShanmugamSundari/amazon-fresh-sql-data-engineering`` (a pure-SQL
PostgreSQL ETL + analytics pipeline; see SURVEY.md), re-expressed with the
PySpark DataFrame / Spark SQL API so Catalyst + Tungsten own physical
execution, and extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Layout:
    session.py    configured SparkSession builder (AQE, UTC, Arrow)
    schemas.py    explicit StructTypes for the reference data model
    sources/      parquet/csv loaders + table registry
    functions/    scalar expression kits (cleaning, text, vectors)
    operators/    relational + extension operators (dml, constraints,
                  dedup, similarity)
    pipelines/    composite pipelines (PIPE-CLEAN-*, audit, normalize)
    queries.py    the Q-*/OP-* catalog: name -> (spark fn, oracle SQL)
    streaming/    Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
