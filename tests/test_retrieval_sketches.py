"""Unit tests for the round-5 operators: BM25/RRF retrieval
(operators/retrieval.py), Count-Min heavy hitters (operators/sketches.py),
and pointer-jumping hierarchy resolution
(operators/relational.py:hierarchy_levels) — tiny in-memory data where the
expected values come from independent pure-Python references. Full-corpus
oracle comparison lives in test_oracle_parity.py / the driver gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators import retrieval as rt
from flink_kafka_table_api_spark.operators.relational import hierarchy_levels
from flink_kafka_table_api_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
)

CORPUS = [
    (1, "spark engine shuffles data fast"),
    (2, "spark spark spark everywhere spark"),
    (3, "a slow engine moves data"),
    (4, "completely unrelated words here"),
    (5, "fast data fast engine fast"),
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        dl = len(v)
        s = 0.0
        for t in terms:
            tf = float(v.count(t))
            idf = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
        out[i] = s
    return out


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    terms = ["spark", "fast"]
    got = {
        r.doc_id: r.bm25
        for r in rt.bm25_scores(df, terms).collect()
    }
    want = _py_bm25(CORPUS, terms)
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-12), i
    # doc 1 matches BOTH terms and beats doc 2's single stuffed term —
    # BM25's tf saturation working as designed; docs 3/4 match neither
    assert got[1] == max(got.values())
    assert got[1] > got[2] > 0.0
    assert got[3] == 0.0 and got[4] == 0.0


def test_rrf_fusion_order_and_scores(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], ["doc_id", "bm25"]
    )
    vec = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5)], ["doc_id", "cosine_sim"]
    )
    rows = rt.rrf_fuse(lex, vec, topk=3).collect()
    # lex ranks: 1->1, 2->2, 3->3; vec ranks: 2->1, 3->2, 1->3
    expect = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63 + 1 / 62,
    }
    got = {r.doc_id: r.rrf for r in rows}
    for i, v in expect.items():
        assert got[i] == pytest.approx(round(v, 9), abs=1e-12)
    # fused order: doc 2 (ranks 2+1) ties doc 1 (1+3)? no: compare exact
    order = [r.doc_id for r in rows]
    assert order == sorted(expect, key=lambda i: (-expect[i], i))


def test_cms_never_undercounts_and_sketch_is_bounded(spark):
    rows = [(k,) for k in ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 1]
    df = spark.createDataFrame(rows, ["k"])
    depth, width = 4, 64
    sk = cms_sketch(df, "k", depth=depth, width=width)
    cells = sk.collect()
    assert len(cells) <= depth * width
    # each seed row sums to the stream length
    per_seed = {
        r["seed"]: r["s"]
        for r in sk.groupBy("seed").agg(F.sum("cell_count").alias("s")).collect()
    }
    assert all(v == 86 for v in per_seed.values())
    keys = df.groupBy("k").count().withColumnRenamed("count", "n")
    est = cms_estimate(keys, sk, "k", depth=depth, width=width).collect()
    true = {"a": 50, "b": 30, "c": 5, "d": 1}
    for r in est:
        assert r.cms_est >= true[r.k]  # the CMS guarantee


def test_cms_heavy_hitters_output(spark):
    rows = [(k,) for k in ["x"] * 40 + ["y"] * 25 + ["z"] * 3 + ["w"] * 2]
    df = spark.createDataFrame(rows, ["k"])
    out = cms_heavy_hitters(df, "k", k=2, depth=4, width=256).collect()
    assert [(r.k, r.n) for r in out] == [("x", 40), ("y", 25)]
    assert all(r.est_ge_true for r in out)
    assert all(r.est_within_eps for r in out)


def test_hierarchy_levels_matches_python_walk(spark):
    # forest: 1 and 2 are roots; parent(k) = k // 2 otherwise
    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["id"])
    parent = F.when(F.col("id") <= 2, F.col("id")).otherwise(
        (F.col("id") / 2).cast("long")
    )
    got = {
        r.id: (r.root, r.depth)
        for r in hierarchy_levels(nodes, "id", parent).collect()
    }

    def walk(k):
        d = 0
        while k > 2:
            k //= 2
            d += 1
        return k, d

    for i in range(1, n + 1):
        assert got[i] == walk(i), i
    # depth of node 200 is log2-ish: 200->100->50->25->12->6->3->1
    assert got[200] == (1, 7)


def test_hierarchy_levels_deep_chain_converges_in_log_rounds(spark):
    # a single path graph of length 300: parent(k) = k-1, root = 1.
    # pointer jumping must resolve it well inside 16 rounds (2^9 > 300);
    # a per-edge walk would need 300.
    n = 300
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["id"])
    parent = F.greatest(F.col("id") - 1, F.lit(1).cast("long"))
    out = hierarchy_levels(nodes, "id", parent, max_iterations=16)
    got = {r.id: (r.root, r.depth) for r in out.collect()}
    assert got[1] == (1, 0)
    assert got[n] == (1, n - 1)


def test_hierarchy_levels_raises_on_cycle(spark):
    # 2-cycle: 1->2, 2->1 (no roots) must not loop forever
    nodes = spark.createDataFrame([(1,), (2,)], ["id"])
    parent = F.when(F.col("id") == 1, F.lit(2).cast("long")).otherwise(
        F.lit(1).cast("long")
    )
    with pytest.raises(RuntimeError, match="not converged"):
        hierarchy_levels(nodes, "id", parent, max_iterations=4)


def test_bm25_sql_twin_matches_spark(spark):
    """The DuckDB rendering of BM25 must produce the same doubles as the
    Spark side on the same corpus (bit-exactness is the design claim)."""
    import duckdb

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    terms = ["spark", "engine", "data"]
    got = {
        r.doc_id: r.bm25 for r in rt.bm25_scores(df, terms).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in CORPUS)
        + ") t(doc_id, text)"
    )
    want = dict(con.execute(rt.bm25_scores_sql(terms)).fetchall())
    assert got.keys() == want.keys()
    for i in got:
        assert math.isclose(got[i], want[i], rel_tol=0.0, abs_tol=0.0), (
            i, got[i], want[i],
        )
