"""Parallelism guard for compute-heavy operators.

Spark sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is right for IO-bound plans but wrong for operators whose cost per
byte is huge (shingling, hashing, per-row vector math, Pandas decode): a
5 MB documents file arrives as ONE partition and the whole operator runs on
one core. At 100 TB the same mismatch appears as a handful of partitions
feeding thousands of idle cores after a selective filter.

``ensure_parallelism`` repartitions up to the session default parallelism
when the optimizer's size estimate says the input is too small to have been
split into that many scan partitions — a plan-stat lookup, NOT an
``df.rdd`` probe (touching ``.rdd`` forces RDD-lineage materialization per
call, and its pre-AQE partition count is stale anyway)."""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _max_partition_bytes(spark) -> int:
    raw = str(
        spark.conf.get(
            "spark.sql.files.maxPartitionBytes",
            str(_DEFAULT_MAX_PARTITION_BYTES),
        )
    ).lower().rstrip("b")
    try:
        return int(raw)
    except ValueError:
        return _DEFAULT_MAX_PARTITION_BYTES


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a CPU-bound input out to >= min_partitions when the optimizer's
    sizeInBytes estimate implies the scan produced fewer (bytes-sized)
    partitions than that. Cheap round-robin shuffle on small inputs; a
    no-op on inputs big enough to already be well-partitioned."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        est_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df.repartition(target)
    if est_bytes < target * _max_partition_bytes(spark):
        return df.repartition(target)
    return df
