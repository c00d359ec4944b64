"""kafka_streaming_polymarket_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Theamazingdp/kafka-streaming-polymarket-pipeline):
a Kafka -> Postgres-JSONB -> dbt medallion pipeline for Polymarket
prediction-market analytics. The reference is procedural row-at-a-time
Python; this engine is declarative DataFrame/SQL + Structured Streaming,
designed for 100 TB scale:

- ``schemas``    : typed StructTypes for every message family on the wire
- ``silver``     : JSON envelope -> typed silver tables (the dbt layer)
- ``operators/`` : book summarization, positions analytics, market logic,
                   dedup, similarity search, text analysis, multimodal
- ``streaming/`` : bronze/silver streaming jobs, downsampling, sessionization
- ``plans/``     : the query registry (each query + its DuckDB oracle SQL)

Everything here uses built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) wherever semantics allow; Pandas UDFs only where
built-ins genuinely cannot express the operator (documented per use).
"""

__version__ = "0.1.0"
