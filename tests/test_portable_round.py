"""spark_round6_sql (functions/portable.py): the DuckDB replay of
Spark's F.round(x, 6) SHORTEST-REPR semantics, added in round 8 after
the gate replica caught holt_forecast diverging on one cell at sf0.01.

The trap: 66.1600125's nearest double is 66.16001249999999345... —
BELOW the .5 boundary — but Java's BigDecimal.valueOf (what Spark's
round uses) rounds the SHORTEST decimal repr ("66.1600125"), which ends
in ...5 and goes UP. DuckDB's round(DOUBLE, 6) uses the exact binary
value and goes DOWN. The helper routes DuckDB through
VARCHAR-shortest-repr -> DECIMAL -> exact HALF_UP, matching Spark on
every finite double."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.functions.portable import spark_round6_sql

CASES = [
    66.1600125,       # the holt_forecast sf0.01 cell: repr-boundary, up
    -66.1600125,      # negative twin: HALF_UP is away-from-zero
    66.16001249,      # just below the repr boundary: down
    1e-07,            # scientific-notation repr round-trips
    0.0,
    123456789.123456789,
    2.5e-06,          # repr boundary at the last kept decimal
    -2.5e-06,
]


def test_matches_spark_round_on_boundary_cases(spark):
    df = spark.createDataFrame([(x,) for x in CASES], "x double")
    want = [r[0] for r in df.select(F.round("x", 6)).collect()]
    con = duckdb.connect()
    got = [
        con.execute(
            f"SELECT {spark_round6_sql(f'CAST({x!r} AS DOUBLE)')}"
        ).fetchone()[0]
        for x in CASES
    ]
    assert got == want
    # and the plain DuckDB round() genuinely disagrees on the trap cell
    # (otherwise this helper would be dead weight)
    plain = con.execute("SELECT round(CAST(66.1600125 AS DOUBLE), 6)").fetchone()[0]
    assert plain != want[0]


def test_null_propagates():
    con = duckdb.connect()
    assert con.execute(
        f"SELECT {spark_round6_sql('CAST(NULL AS DOUBLE)')}"
    ).fetchone()[0] is None


def test_result_type_is_double():
    con = duckdb.connect()
    res = con.execute(f"SELECT {spark_round6_sql('1.5')} AS v")
    assert res.description[0][1] in ("NUMBER",)  # duckdb double typecode
    assert isinstance(res.fetchone()[0], float)
