"""task_hive_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
system (angelapytao/task-hive, a Go/etcd distributed task scheduler — see
SURVEY.md) as an idiomatic Spark SQL / DataFrame / Structured Streaming
engine, extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
    session     SparkSession factory tuned for local[N] and cluster scale
    schemas     StructTypes for the task-hive data model (SURVEY §1.4)
    sources     fixture loaders, spider ingestion (xlsx gated), JSON codecs
    functions   scalar function library (SURVEY §2.8) + text/vector funcs
    operators   batch query surface, assignment, processors (X1-X4),
                dedup, similarity, multimodal, text analysis,
                relational-completeness suite
    streaming   task lifecycle as Structured Streaming (SURVEY §2.9)
    plans       DuckDB-parity oracle harness + persistent Hive catalog
"""

__version__ = "0.1.0"
