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
    # derive seeds exactly the way the bench twin (q_bfs_hops) does —
    # the three LOWEST customer keys from the parquet — and feed the
    # SAME values to the oracle, so a seed-dependent regression (e.g.
    # customer keys starting at 1, not 0) cannot slip past this parity
    # check (round-7 ADVICE).
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.catalog import read_table

    seeds = (
        read_table(spark, SF, "customer")
        .select(F.col("c_custkey").cast("long").alias("node"))
        .orderBy("node")
        .limit(3)
    )
    seed_vals = [r.node for r in seeds.collect()]
    got = sorted(
        tuple(r) for r in bfs_hops(edges, seeds, max_hops=8).collect()
    )
    values = ", ".join(f"({v})" for v in seed_vals)
    exp = sorted(
        con.execute(
            bfs_hops_sql(
                _HITS_EDGES_SQL,
                f"SELECT * FROM (VALUES {values}) s(node)",
                max_hops=8,
            )
        ).fetchall()
    )
    assert got == exp
    # live multi-hop signal: several distinct hop levels reached
    assert len({h for _, h in got}) >= 4
    assert [h for n, h in got if n in seed_vals] == [0, 0, 0]


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


# ---------------------------------------------------------------------------
# mann_kendall (reserve #2)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def events_con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    return c


def test_mann_kendall_oracle_parity_on_testdata(spark, events_con):
    from flink_kafka_table_api_spark.catalog import read_table
    from flink_kafka_table_api_spark.operators.timeseries import (
        mann_kendall,
        mann_kendall_sql,
    )

    ev = read_table(spark, SF, "events")
    got = sorted(tuple(r) for r in mann_kendall(ev).collect())
    exp = sorted(
        tuple(r) for r in events_con.execute(mann_kendall_sql()).fetchall()
    )
    assert len(got) == len(exp) == 5
    assert got == exp
    # the corpus has a live verdict (the error stream trends down)
    assert {r[5] for r in got} >= {"no_trend", "decreasing"}


def test_mann_kendall_exact_s_on_fixture(spark):
    """Hand-computable series 1,2,3,2 (one day each): pairs
    (1,2)+ (1,3)+ (1,2)+ (2,3)+ (2,2)0 (3,2)- -> S = 3;
    ties: the two 2s -> tie_sum = 2*1*9 = 18; n=4 ->
    var18 = 4*3*13 - 18 = 138. Sen's slope = median of the sorted
    slopes [-1, 0, 1/3, 1, 1, 1] = (1/3 + 1)/2 = 2/3."""
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.operators.timeseries import (
        mann_kendall,
    )

    rows = []
    eid = 0
    for d, n in enumerate([1, 2, 3, 2], start=1):
        for _ in range(n):
            rows.append((eid, f"2024-03-{d:02d} 09:00:00", "a"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    r = mann_kendall(df).collect()[0]
    assert (r.n_days, r.s_stat, r.var_s_x18) == (4, 3, 138)
    assert r.sens_slope == pytest.approx(round(2 / 3, 9), abs=1e-12)
    assert r.trend == "no_trend"  # z = 2/sqrt(138/18) ~ 0.72


def test_mann_kendall_constant_series_and_empty(spark):
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.operators.timeseries import (
        mann_kendall,
    )

    rows = [
        (d * 10 + i, f"2024-03-{d:02d} 00:00:00", "flat")
        for d in range(1, 6)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    r = mann_kendall(df).collect()[0]
    # all values tied: S=0, var18 = n(n-1)(2n+5) - n(n-1)(2n+5) = 0
    assert r.s_stat == 0 and r.var_s_x18 == 0
    assert r.z is None and r.trend is None
    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string"
    )
    assert mann_kendall(empty).count() == 0
