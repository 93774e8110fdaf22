"""File sources: batch parquet (the testdata contract) and file-streaming
mode so streaming operators are testable without Kafka brokers — the same
role the reference's Testcontainers play, minus the infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, *, header: bool = True
) -> DataFrame:
    """CSV scan with a DECLARED schema (never inferSchema — inference costs
    an extra full pass and produces SF-dependent types)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with a declared schema (same stance as CSV)."""
    return spark.read.schema(schema).json(path)


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded file-source scan of a directory of parquet files. Streaming
    file sources require a declared schema (same 'declared, not inferred'
    stance as the engine's tables — SURVEY.md §1.1)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def write_parquet(
    df: DataFrame, path: str, *, partition_by: tuple[str, ...] = (), mode: str = "overwrite"
) -> None:
    """Batch parquet sink. ``partition_by`` is the scale lever: partition by
    the dominant filter/join key so downstream scans prune directories."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
