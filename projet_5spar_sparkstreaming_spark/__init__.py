"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo Mr10Wick/Projet-5SPAR-SparkStreaming (Mastodon -> Kafka ->
Spark Structured Streaming -> PostgreSQL social-analytics pipeline), plus
the relational and LLM-data-pipeline operators a 100 TB training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
columns).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst/Tungsten do the physical planning.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs
  only where built-ins cannot express the semantics.
- One shared operator library used by both batch and streaming
  (SURVEY.md section 2.10 T8: stream/batch consistency).
"""

from projet_5spar_sparkstreaming_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
