"""Parallelism guard for compute-heavy operators.

Spark sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is right for IO-bound plans but wrong for operators whose cost per
byte is huge (shingling, hashing, per-row vector math, Pandas decode): a
5 MB documents file arrives as ONE partition and the whole operator runs on
one core. At 100 TB the same mismatch appears as a handful of partitions
feeding thousands of idle cores after a selective filter.

``ensure_parallelism`` repartitions up to the session default parallelism
when (and only when) the input has fewer partitions — a no-op on inputs
that are already well-partitioned, one cheap round-robin shuffle otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
