"""Smoke tests of the driver contract surface (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert "converted_price" in df.columns
    assert "processingTimestamp" in df.columns


def test_registry_shape(spark):
    qs = e.queries()
    os_ = e.oracle_sql()
    assert len(qs) >= 30
    # every oracle key has a query
    assert set(os_) <= set(qs)
    # the vast majority of queries are oracle-checked
    assert len(os_) >= 0.85 * len(qs)
