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


_SIZE_UNITS = {
    "": 1, "b": 1,
    "k": 1024, "kb": 1024,
    "m": 1024 ** 2, "mb": 1024 ** 2,
    "g": 1024 ** 3, "gb": 1024 ** 3,
    "t": 1024 ** 4, "tb": 1024 ** 4,
}


def _parse_size(raw: str) -> int | None:
    s = str(raw).strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i], s[i:].strip()
    if not num or unit not in _SIZE_UNITS:
        return None
    return int(num) * _SIZE_UNITS[unit]


def _max_partition_bytes(spark) -> int:
    # The conf accepts size strings ('64m', '1g'): ask Spark's own parser
    # for the resolved byte value first; a python unit-aware parse is the
    # fallback so '64m' never silently degrades to the 128 MB default.
    try:
        return int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:
        pass
    parsed = _parse_size(
        spark.conf.get(
            "spark.sql.files.maxPartitionBytes",
            str(_DEFAULT_MAX_PARTITION_BYTES),
        )
    )
    return parsed if parsed is not None else _DEFAULT_MAX_PARTITION_BYTES


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
    # Size estimates are only trustworthy near the scan: joins multiply
    # child estimates and stat-less relations report
    # spark.sql.defaultSizeInBytes (Long.MaxValue by default), so a huge
    # estimate means "unknown", not "big". Treat it as unknown and fan out
    # — otherwise the guard silently no-ops on exactly the small
    # post-join/post-filter inputs it exists for.
    try:
        unknown_floor = int(
            spark._jsparkSession.sessionState().conf().defaultSizeInBytes()
        )
    except Exception:
        unknown_floor = 2 ** 63 - 1
    if est_bytes >= unknown_floor:
        return df.repartition(target)
    if est_bytes < target * _max_partition_bytes(spark):
        return df.repartition(target)
    return df
