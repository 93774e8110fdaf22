"""Pin late_data.ts_shift / interval_micros against Spark's own
INTERVAL arithmetic and timestampToString format.

The streaming operators' per-batch watermark arithmetic
(`CAST(TIMESTAMP '{x}' - INTERVAL {d} AS STRING)`) moved driver-side in
round 10 (each spark.sql round trip measured ~160 ms); these tests are
the equivalence proof: for a grid of timestamps (whole seconds, every
fractional-precision shape, T- and space-separated) and day-time delays
(every supported unit, compound, plural/singular, add and subtract) the
Python result must be byte-identical to what spark.sql returns.
"""

from __future__ import annotations

import pytest

from flink_kafka_table_api_spark.streaming.late_data import (
    interval_micros,
    ts_shift,
)

TS_GRID = [
    "2024-01-02 03:04:05",
    "2024-01-02T03:04:05",
    "2024-03-01 00:00:00",
    "2024-02-29 23:59:59.999999",
    "2023-12-31 12:00:00.5",
    "2023-06-15 07:08:09.123",
    "2023-06-15 07:08:09.100",
    "2023-06-15 07:08:09.000123",
    "2024-01-01 00:00:00.000001",
]

DELAY_GRID = [
    "2 days",
    "1 day",
    "3 days",
    "12 hours",
    "90 minutes",
    "5 seconds",
    "1 week",
    "250 milliseconds",
    "7 microseconds",
    "1 day 6 hours",
    "86400 seconds",
]


@pytest.mark.parametrize("delay", DELAY_GRID)
@pytest.mark.parametrize("ts", TS_GRID)
def test_ts_shift_matches_spark(spark, ts, delay):
    for sign, op in ((-1, "-"), (1, "+")):
        want = spark.sql(
            f"SELECT CAST(TIMESTAMP '{ts}' {op} INTERVAL {delay} "
            "AS STRING)"
        ).first()[0]
        assert ts_shift(ts, delay, sign=sign) == want


@pytest.mark.parametrize("delay", DELAY_GRID)
def test_interval_micros_matches_spark(spark, delay):
    want = int(spark.sql(
        f"SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00' "
        f"+ INTERVAL {delay})"
    ).first()[0])
    assert interval_micros(delay) == want


def test_calendar_units_rejected():
    with pytest.raises(ValueError):
        interval_micros("1 month")
    with pytest.raises(ValueError):
        interval_micros("2 years")
    with pytest.raises(ValueError):
        interval_micros("days")
