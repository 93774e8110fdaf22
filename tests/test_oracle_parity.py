"""Local replica of the driver's correctness gate: run every registered
query on sf0.001 via Spark AND its oracle SQL via DuckDB, compare row
count, column names, and (order-insensitively) values. Catching a mismatch
here is 100x cheaper than in the driver's sf0.01 run.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from flink_kafka_table_api_spark.catalog import TABLES
from flink_kafka_table_api_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value canonicalization: exact doubles expected, but
        # repr differences (e.g. -0.0) are normalized
        if v == 0:
            return 0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(str(_canon(r[i])) for i in idx) for r in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _rows_to_multiset(spark_cols, [tuple(r) for r in spark_rows])
    d = _rows_to_multiset(duck_cols, duck_rows)
    mism = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"


def test_all_queries_have_callables():
    assert QUERIES, "query registry is empty"
    for name in ORACLES:
        assert name in QUERIES
