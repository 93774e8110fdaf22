"""RESERVE operators: pre-validated spares that future rounds can swap
into a gate slot if a committed registration hits trouble (listed in
the reserve-lever note in queries.py). Same bar as the staged rounds:
DuckDB oracle parity over real testdata + behavior fixtures + empty
input."""

from __future__ import annotations

import duckdb
import pytest

from flink_kafka_table_api_spark.operators.graph import (
    bfs_hops,
    bfs_hops_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'"
    )
    return c


def test_bfs_hops_oracle_parity_on_testdata(spark, con):
    from flink_kafka_table_api_spark.queries import (
        _HITS_EDGES_SQL,
        _hits_edges,
    )

    edges = _hits_edges(spark, SF)
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    got = sorted(
        tuple(r) for r in bfs_hops(edges, seeds, max_hops=8).collect()
    )
    exp = sorted(
        con.execute(
            bfs_hops_sql(
                _HITS_EDGES_SQL,
                "SELECT * FROM (VALUES (0), (1), (2)) s(node)",
                max_hops=8,
            )
        ).fetchall()
    )
    assert got == exp
    # live multi-hop signal: several distinct hop levels reached
    assert len({h for _, h in got}) >= 4
    assert [h for n, h in got if n in (0, 1, 2)] == [0, 0, 0]


def test_bfs_hops_semantics_on_fixture(spark, con):
    """Chain + branch + cycle + unreachable island: min-hop labels,
    direction respected, island absent."""
    edges = [(0, 1), (1, 2), (2, 3), (1, 10), (3, 0), (99, 98)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = sorted(map(tuple, bfs_hops(e, seeds, max_hops=5).collect()))
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (10, 2)]
    # multi-source: a second seed at 99 reaches the island
    seeds2 = spark.createDataFrame([(0,), (99,)], "node long")
    got2 = dict(
        (r.node, r.hop) for r in bfs_hops(e, seeds2, max_hops=5).collect()
    )
    assert got2[98] == 1 and got2[99] == 0 and got2[3] == 3


def test_bfs_hops_bounded_rounds_and_empty_inputs(spark):
    # hop bound truncates, doesn't throw
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = bfs_hops(chain, seeds, max_hops=3).collect()
    assert max(r.hop for r in got) == 3 and len(got) == 4
    # empties
    assert bfs_hops(
        chain, spark.createDataFrame([], "node long")
    ).count() == 0
    empty_e = spark.createDataFrame([], "src long, dst long")
    assert sorted(
        map(tuple, bfs_hops(empty_e, seeds).collect())
    ) == [(0, 0)]
