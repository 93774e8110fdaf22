"""Round-7 pre-validated operators (the temperature_mix/pagerank pattern:
operator + oracle SQL + local parity BEFORE the registry has a free gate
slot): weighted_sample (PPS Bernoulli) and frequent_pairs (A-priori
2-itemsets). Each is pinned against an independent Python replay AND its
DuckDB oracle over the real sf0.001 documents table."""

from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations

import duckdb
import pytest

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def _py_weighted_sample(rows, target_n, salt="fkta-wsample"):
    w_total = sum(w for _, w in rows)
    out = {}
    for i, w in rows:
        h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)
        u = (h % (1 << 30)) / float(1 << 30)
        p = min(1.0, (w * float(target_n)) / w_total)
        if u < p:
            out[i] = (w, round(p, 6))
    return out


def test_weighted_sample_matches_python_replay(spark):
    rows = [(i, (i * 7) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.n_tok, r.p)
        for r in cu.weighted_sample(
            df, weight_col="n_tok", target_n=80
        ).collect()
    }
    assert got == _py_weighted_sample(rows, 80)
    # realized size tracks the target (Poisson-PPS expectation)
    assert 50 <= len(got) <= 110


def test_weighted_sample_favors_heavy_rows(spark):
    rows = [(i, 1) for i in range(300)] + [(i, 100) for i in range(300, 320)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    kept = {
        r.doc_id for r in cu.weighted_sample(
            df, weight_col="n_tok", target_n=40
        ).collect()
    }
    heavy = sum(1 for i in kept if i >= 300)
    light = len(kept) - heavy
    assert heavy >= 15        # w=100 rows: p = min(1, 100*40/2300) = 1
    assert light < heavy      # 300 light rows contribute fewer picks


def test_weighted_sample_oracle_parity_on_testdata(spark, docs_con):
    got = {
        (r.doc_id, r.n_chars, r.p)
        for r in cu.weighted_sample(
            spark.read.parquet(f"{SF}/documents.parquet"),
            weight_col="n_chars", target_n=100,
        ).collect()
    }
    want = set(
        docs_con.execute(
            cu.weighted_sample_sql(weight_expr="n_chars", target_n=100)
        ).fetchall()
    )
    assert got == want and len(got) > 20


def _py_frequent_pairs(docs, min_support):
    df_counter: Counter = Counter()
    doc_sets = []
    for text in docs:
        s = set(text.lower().split())
        doc_sets.append(s)
        df_counter.update(s)
    frequent = {w for w, c in df_counter.items() if c >= min_support}
    pairs: Counter = Counter()
    for s in doc_sets:
        fs = sorted(s & frequent)
        pairs.update(combinations(fs, 2))
    return {
        (a, b): c for (a, b), c in pairs.items() if c >= min_support
    }


def test_frequent_pairs_matches_python_replay(spark):
    docs = [
        "spark shuffle join spark",
        "spark shuffle exchange",
        "spark shuffle",
        "join exchange broadcast",
        "spark broadcast",
        "completely unrelated words here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.token_a, r.token_b): r.n_docs
        for r in tx.frequent_pairs(df, min_support=2).collect()
    }
    assert got == _py_frequent_pairs(docs, 2)
    assert got[("shuffle", "spark")] == 3


def test_frequent_pairs_oracle_parity_on_testdata(spark, docs_con):
    got = {
        (r.token_a, r.token_b, r.n_docs)
        for r in tx.frequent_pairs(
            spark.read.parquet(f"{SF}/documents.parquet"), min_support=25
        ).collect()
    }
    want = set(
        docs_con.execute(tx.frequent_pairs_sql(min_support=25)).fetchall()
    )
    assert got == want and len(got) > 5
