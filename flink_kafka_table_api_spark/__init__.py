"""PySpark-native analytics engine with the capability surface of the
reference Flink Table API application (MartijnVisser/flink-kafka-table-api)
plus LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis), designed for 100 TB scale.

The reference (see /root/reference, SURVEY.md) is a Flink Table API client:
Kafka source -> filter -> project/derive -> Kafka sink. This package
re-expresses that capability surface Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, Structured Streaming for unbounded inputs, and
Arrow-batched Pandas UDFs only where built-ins cannot express the semantics.
"""

from flink_kafka_table_api_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
