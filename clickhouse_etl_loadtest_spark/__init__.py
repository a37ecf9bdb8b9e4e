"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of glassflow/clickhouse-etl-loadtest, rebuilt Spark-first.

Reference behavior (NOT code) is derived from the public repo snapshot at
/root/reference; docstrings cite ``file:line`` there for parity checking.

Layout:
    config/     pipeline-spec models (the reference's JSON config is the API)
    plans/      spec -> DataFrame DAG compiler (Catalyst is the optimizer)
    sources/    synthetic generator, parquet/kafka/clickhouse IO
    operators/  dedup, mapping, joins, similarity, text analysis, multimodal
    functions/  cross-engine deterministic hashing + generator column funcs
    streaming/  Structured Streaming runner (watermark dedup, foreachBatch sink)
    harness/    grid search, variant hashing, metrics CSV, executor loop
"""

__version__ = "0.1.0"
