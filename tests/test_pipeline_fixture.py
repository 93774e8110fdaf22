"""Reference-parity unit test: the canonical 5-row fixture from the
reference's test harness (reference BaseTransactionTest.java:145-156,
oracle assertions from reference TransactionFlinkTest.java:86-136 —
see FIXTURES.md)."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from flink_kafka_table_api_spark.catalog import TRANSACTION_SCHEMA
from flink_kafka_table_api_spark.plans.pipeline import approved_transactions

NOW = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tx(amount, currency, status):
    return (
        str(uuid.uuid5(uuid.NAMESPACE_DNS, f"{amount}{currency}{status}")),
        float(amount),
        currency,
        NOW,
        "Test transaction",
        "Test Merchant",
        "Test",
        status,
        str(uuid.uuid5(uuid.NAMESPACE_DNS, "user")),
        {},
    )


FIXTURE = [
    _tx(100.0, "USD", "APPROVED"),
    _tx(200.0, "EUR", "APPROVED"),
    _tx(150.0, "GBP", "APPROVED"),
    _tx(300.0, "USD", "CANCELLED"),
    _tx(250.0, "EUR", "PENDING"),
]


@pytest.fixture(scope="module")
def result_rows(spark):
    df = spark.createDataFrame(FIXTURE, schema=TRANSACTION_SCHEMA)
    return approved_transactions(df).collect()


def test_cancelled_filtered(result_rows):
    # reference TransactionFlinkTest.java:93 — count == inputs minus CANCELLED
    assert len(result_rows) == 4
    assert all(r.amount != 300.0 for r in result_rows)


def test_conversion_formula(result_rows):
    # reference TransactionFlinkTest.java:127-136 (tolerance 1e-3; we match
    # exactly since both engines do IEEE double arithmetic)
    expected = {100.0: 100.0, 200.0: 220.0, 150.0: 195.0, 250.0: 275.0}
    for r in result_rows:
        assert r.amountInUsd == pytest.approx(expected[r.amount], abs=1e-3)


def test_identity_fields_copied(result_rows):
    # reference TransactionFlinkTest.java:122-124
    for r in result_rows:
        assert r.merchant == "Test Merchant"
        assert r.timestamp == NOW
        assert r.currency in {"USD", "EUR", "GBP"}


def test_processing_timestamp_not_null(result_rows):
    # reference TransactionConsumerTest.java:126
    assert all(r.processingTimestamp is not None for r in result_rows)


def test_output_schema(result_rows):
    assert set(result_rows[0].asDict()) == {
        "id", "amount", "currency", "timestamp", "merchant", "userId",
        "amountInUsd", "processingTimestamp",
    }


def test_dropped_columns_pruned(spark):
    df = spark.createDataFrame(FIXTURE, schema=TRANSACTION_SCHEMA)
    out = approved_transactions(df, with_processing_ts=False)
    assert "description" not in out.columns
    assert "metadata" not in out.columns


def test_per_record_processing_ts_is_wallclock(spark):
    """Opt-in per-record timestamp (SURVEY §7.4 #2): non-null and current."""
    from datetime import datetime, timedelta

    from flink_kafka_table_api_spark.plans.pipeline import (
        per_record_processing_ts,
    )

    rows = spark.range(5).withColumn("pts", per_record_processing_ts()).collect()
    now = datetime.utcnow()
    for r in rows:
        assert r.pts is not None
        assert abs(now - r.pts) < timedelta(minutes=2)
