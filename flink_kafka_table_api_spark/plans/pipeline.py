"""The reference's end-to-end pipeline, re-expressed as a pure DataFrame plan.

Reference semantics (SURVEY.md §2.1 O4-O8):

- filter: drop rows whose status equals 'CANCELLED'
  (reference TransactionProcessor.java:174)
- project: keep id, amount, currency, timestamp, merchant, userId
  (reference TransactionProcessor.java:176-183)
- derive amountInUsd = IF(currency='EUR', amount*1.1,
                          IF(currency='GBP', amount*1.3, amount))
  (reference TransactionProcessor.java:184-187)
- derive processingTimestamp = CURRENT_TIMESTAMP
  (reference TransactionProcessor.java:188-189)

Everything is a narrow transformation: on any cluster size this plan is a
single whole-stage-codegen stage with zero shuffles — the 100 TB cost is
exactly one scan plus one write, identical to the fused Flink operator chain
(SURVEY.md §4 "operator chaining").
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CANCELLED = "CANCELLED"  # reference TransactionStatus.java:9


def amount_in_usd(amount: Column, currency: Column) -> Column:
    """Static currency conversion (reference TransactionProcessor.java:184-187).

    Note per-branch double literals (1.1, 1.3) multiply IEEE-exactly like the
    reference's Flink DOUBLE arithmetic; the reference's own tests allow 1e-3
    (reference TransactionFlinkTest.java:127-136) but we match bit-for-bit.
    """
    return (
        F.when(currency == "EUR", amount * 1.1)
        .when(currency == "GBP", amount * 1.3)
        .otherwise(amount)
    )


def approved_transactions(
    tx: DataFrame,
    *,
    status_col: str = "status",
    cancelled: str = CANCELLED,
    with_processing_ts: bool = True,
) -> DataFrame:
    """Filter + project + derive, exactly the reference pipeline shape.

    ``with_processing_ts=False`` yields the deterministic projection used by
    oracle comparisons (CURRENT_TIMESTAMP is nondeterministic in the
    reference too — its tests only assert non-null,
    reference TransactionConsumerTest.java:126).

    Semantic note (SURVEY.md §7.4): in streaming mode Spark evaluates
    current_timestamp() once per micro-batch while Flink evaluates it per
    record; at micro-batch granularity this is the same observable guarantee
    (a wall-clock time at-or-before the record was emitted).
    """
    out = tx.filter(F.col(status_col) != cancelled).select(
        "id",
        "amount",
        "currency",
        "timestamp",
        "merchant",
        "userId",
        amount_in_usd(F.col("amount"), F.col("currency")).alias("amountInUsd"),
    )
    if with_processing_ts:
        out = out.withColumn("processingTimestamp", F.current_timestamp())
    return out


def per_record_processing_ts() -> Column:
    """Opt-in TRUE per-record wall-clock timestamp (SURVEY.md §7.4 trap #2):
    Flink streaming evaluates CURRENT_TIMESTAMP per record; Spark's
    current_timestamp() is frozen per micro-batch. Where exact per-record
    semantics matter (latency attribution inside a batch), this Pandas UDF
    stamps each Arrow batch at evaluation time — vectorized, so the cost is
    per-batch, not per-row. Nondeterministic by design: keep it out of
    oracle-compared columns (the reference's own tests only assert non-null,
    reference TransactionConsumerTest.java:126)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def _now(batch: pd.Series) -> pd.Series:
        t = pd.Timestamp.utcnow().tz_localize(None)
        return pd.Series([t] * len(batch))

    return _now(F.lit(0))
