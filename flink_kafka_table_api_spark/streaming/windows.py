"""Event-time windowed aggregation over streams (EXT scope — the reference
declares a watermark but never consumes it; SURVEY.md §2.2 'Streaming:
windows').

All three window shapes are built-in Structured Streaming operators —
watermark state eviction, late-data dropping and incremental aggregation are
the engine's (Spark's) job, exactly as the reference delegates them to
Flink. The watermark default (5 seconds) matches the reference's
bounded-out-of-orderness declaration (reference TransactionProcessor.java:106).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REFERENCE_WATERMARK_DELAY = "5 seconds"  # reference TransactionProcessor.java:106


def with_watermark(
    df: DataFrame, ts_col: str, delay: str = REFERENCE_WATERMARK_DELAY
) -> DataFrame:
    """O3: declare event-time + bounded out-of-orderness."""
    return df.withWatermark(ts_col, delay)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling event-time window aggregation; emits window start/end."""
    return (
        df.groupBy(F.window(ts_col, duration), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    return (
        df.groupBy(F.window(ts_col, duration, slide), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session windows with a static gap (F.session_window, Spark 3.2+).
    Dynamic per-row gaps: pass a Column as ``gap`` — still built-in. The
    batch analog (lag + running-sum sessionization) lives in
    operators/relational.py:sessionize for oracle-checkable semantics."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *group_by)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def streaming_dedup(
    df: DataFrame, keys: Sequence[str], ts_col: str | None = None,
    delay: str = REFERENCE_WATERMARK_DELAY,
) -> DataFrame:
    """Streaming exact dedup. With a watermark the state store evicts keys
    older than the delay (bounded state — mandatory at 100 TB/day);
    without one, state grows unboundedly (only for tests)."""
    if ts_col is not None:
        df = df.withWatermark(ts_col, delay)
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
