"""pagerank (operators/graph.py): pinned against an independent Python
replay of the documented rule (same ordered fold, same IEEE ops, same
HALF_UP rounding), plus conservation and partitioning-invariance."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from flink_kafka_table_api_spark.operators.graph import pagerank


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


# a triangle with a two-node tail and one high-degree hub
EDGES = _sym([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (3, 6), (3, 7)])


def _py_pagerank(edges, damping=0.85, iterations=5):
    from collections import defaultdict

    outdeg = defaultdict(int)
    incoming = defaultdict(list)
    for s, d in edges:
        outdeg[s] += 1
        incoming[d].append(s)
    n = len(outdeg)
    rank = {v: 1.0 / n for v in outdeg}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        nxt = {}
        for v, srcs in incoming.items():
            acc = 0.0
            for s in sorted(srcs):  # the pinned ascending-src fold
                acc += rank[s] / outdeg[s]
            nxt[v] = base + damping * acc
        rank = nxt
    return {
        v: float(
            Decimal(r).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        )
        for v, r in rank.items()
    }


def test_matches_independent_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert got == _py_pagerank(EDGES)


def test_rank_mass_is_conserved(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    total = sum(r.rank for r in pagerank(df, iterations=3).collect())
    # symmetric graph => no dangling mass leaks; only rounding residue
    assert abs(total - 1.0) < 1e-6


def test_hub_outranks_leaves(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert got[3] == max(got.values())  # the degree-5 hub
    assert got[5] < got[3] and got[6] < got[3]


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(df).collect()}
    b = {r.node: r.rank for r in pagerank(df.repartition(5)).collect()}
    assert a == b


def test_empty_edges_raise_clearly(spark):
    import pytest

    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge"):
        pagerank(df)


def test_oracle_sql_replays_operator_exactly(spark):
    """The committed round-6 oracle: DuckDB runs pagerank_sql over the
    same symmetric edges and must match the operator bit-for-bit."""
    import duckdb
    import pandas as pd

    from flink_kafka_table_api_spark.operators.graph import pagerank_sql

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r.node, r.rank) for r in pagerank(df, iterations=5).collect()}
    con = duckdb.connect()
    con.register("edges_tbl", pd.DataFrame(EDGES, columns=["src", "dst"]))
    want = set(
        con.execute(
            pagerank_sql("SELECT src, dst FROM edges_tbl", iterations=5)
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# triangle_count (operators/graph.py): pinned against a brute-force
# Python enumeration, plus structural cases (triangle-free ring, K4).
# ---------------------------------------------------------------------------


def _py_triangles(edges):
    """Brute-force reference: count per-node triangle membership."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    counts = defaultdict(int)
    nodes = sorted(adj)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return dict(counts)


def test_triangle_count_matches_bruteforce(spark):
    from flink_kafka_table_api_spark.operators.graph import triangle_count

    # two triangles sharing an edge + a pendant: (1,2,3), (2,3,4), 4-5
    edges = _sym([(1, 2), (2, 3), (3, 1), (2, 4), (3, 4), (4, 5)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == _py_triangles(edges)
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}  # node 5 in no triangle


def test_triangle_count_ring_is_triangle_free(spark):
    from flink_kafka_table_api_spark.operators.graph import triangle_count

    ring = _sym([(i, (i + 1) % 6) for i in range(6)])
    df = spark.createDataFrame(ring, "src long, dst long")
    assert triangle_count(df).count() == 0


def test_triangle_count_complete_graph(spark):
    from flink_kafka_table_api_spark.operators.graph import triangle_count

    from itertools import combinations

    k4 = _sym(list(combinations(range(4), 2)))
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    # K4 has C(4,3)=4 triangles; every node is in exactly 3
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_oracle_sql_matches(spark):
    import duckdb
    import pandas as pd

    from flink_kafka_table_api_spark.operators.graph import (
        triangle_count,
        triangle_count_sql,
    )

    edges = _sym([(1, 2), (2, 3), (3, 1), (2, 4), (3, 4), (7, 8)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.node, r.n_triangles) for r in triangle_count(df).collect()}
    con = duckdb.connect()
    con.register("edges_tbl", pd.DataFrame(edges, columns=["src", "dst"]))
    want = set(
        con.execute(
            triangle_count_sql("SELECT src, dst FROM edges_tbl")
        ).fetchall()
    )
    assert got == want


def test_pagerank_checkpoint_period_never_changes_results(spark):
    """checkpointing is pure materialization — any period must yield the
    bit-identical ranks (the arithmetic and fold order are untouched)."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    want = {(r.node, r.rank) for r in
            pagerank(df, iterations=5, checkpoint_every=1).collect()}
    for period in (2, 3, 5):
        got = {(r.node, r.rank) for r in
               pagerank(df, iterations=5, checkpoint_every=period).collect()}
        assert got == want, period
