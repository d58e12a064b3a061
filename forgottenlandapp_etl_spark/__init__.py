"""forgottenlandapp_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Dart ETL service (natanrauber/forgottenlandapp-etl, surveyed in
SURVEY.md), re-expressed idiomatically on the Spark DataFrame / Spark SQL
stack: declarative logical plans optimized by Catalyst, columnar parquet
scans with predicate pushdown and partition pruning, hash/broadcast joins
instead of nested-loop probes, window functions instead of in-place rank
mutation, and Structured Streaming for the polling pipeline — plus
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session     SparkSession factory + per-query session tuning
    catalog     table registry over the driver's parquet test tables
    functions/  pure Column-expression scalar functions (no Python UDFs)
    operators/  the operator library (SURVEY.md §2 inventory + extensions)
    sources/    scans and sinks (partitioned writes, retention, upsert)
    plans/      named query registry: queries() + DuckDB oracle_sql() pairs
    pipelines/  the 10 reference route-equivalents composed from operators
    streaming/  Structured Streaming variant of the online-time pipeline
"""

__version__ = "0.1.0"
