"""trace_parquet_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``imoil/trace-parquet`` (a reactive Oracle→Parquet batch-ETL export
service), re-expressed Spark-first, plus the large-scale
training-data-pipeline operator surface (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB-scale runs.

Layout:
  session      SparkSession builder tuned for local test + cluster scale
  schemas      the trace-param input/output StructTypes (SURVEY §1.4)
  errors/api   request validation + error semantics (SURVEY §2.11 E1-E5)
  sources/     table registry over the test parquet, JDBC, file formats
  functions/   gzip codec UDF, cross-engine stable hashing, text, vectors
  operators/   trace export core + dedup/similarity/text/asof/sessionize
  plans/       headline relational queries (TPC-H-style)
  streaming/   Structured Streaming pipelines (windows, watermark, state)
"""

__version__ = "0.1.0"
