"""retail_sales_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (Airflow + pandas + PostgreSQL
star-schema warehouse), plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, streaming) designed for
100 TB-scale partitioned-Parquet execution.

Layout
------
- ``session``    — SparkSession factory (AQE on, UTC, decimal-friendly).
- ``schemas``    — explicit StructType declarations (never infer in prod).
- ``sources``    — scans/sinks: CSV with coercions, Parquet tables, testdata.
- ``functions``  — scalar helpers (Postgres-DOW, money decimals, poly-hash).
- ``operators``  — relational + LLM-pipeline operators (clean, dims, fact,
                   dedup, similarity, text).
- ``plans``      — end-to-end pipeline drivers + the query registry used by
                   ``__spark_entry__``.
- ``streaming``  — Structured Streaming counterparts over the events table.
"""

__version__ = "0.1.0"
