"""Round-11 pre-validated operators (the staging pattern, two rounds
ahead): winnow_matches (the MOSS pair-matching step over winnowing
fingerprints), adamic_adar_scores (degree-weighted link prediction),
lsh_recall_audit (measured LSH recall vs the exact self-join — the
"measure, don't guess" primitive), and equi_depth_bins (quantile
binning with per-bin stats). Each pinned against its DuckDB oracle over
the real sf0.001 tables plus targeted fixtures."""

from __future__ import annotations

import duckdb
import pytest

import flink_kafka_table_api_spark.operators.dedup as dd
import flink_kafka_table_api_spark.operators.graph as gr
import flink_kafka_table_api_spark.operators.relational as rel
import flink_kafka_table_api_spark.operators.text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


# ---------------------------------------------------------------------------
# winnow_matches
# ---------------------------------------------------------------------------

def test_winnow_matches_oracle_parity_on_testdata(spark, docs_con):
    """The CAPPED configuration (max_hash_df=20) — the only one a
    gate/bench query may use: this corpus carries enough cross-doc
    boilerplate that the uncapped pair set is 50,519 pairs from 500
    docs (~40% of the pair space), i.e. quadratic fan-out at larger
    scale — the exact failure mode the stop-fingerprint cap exists
    for. The oracle replays the cap via HAVING COUNT(DISTINCT)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in tx.winnow_matches(
            docs, k=8, w=4, min_shared=3, max_hash_df=20
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in docs_con.execute(
            tx.winnow_matches_sql(k=8, w=4, min_shared=3, max_hash_df=20)
        ).fetchall()
    )
    assert len(got) > 5, "no matched pairs: dead signal"
    assert got == exp


def test_winnow_matches_localizes_overlap(spark):
    """The span columns bracket the shared region: a doc pair sharing
    only a MIDDLE segment reports positions inside that segment, and
    the stop-fingerprint cap removes ubiquitous boilerplate hashes."""
    shared = "zqxjkvbwpfmgzqxjkvbwpfmgzqxjkvbwpfmg"
    rows = [
        (1, "aa" * 30 + shared + "bb" * 30),
        (2, "cc" * 40 + shared + "dd" * 20),
        (3, "ee" * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.a, r.b): r
        for r in tx.winnow_matches(df, k=8, w=4, min_shared=1).collect()
    }
    assert (1, 2) in out and (1, 3) not in out and (2, 3) not in out
    m = out[(1, 2)]
    # doc 1's shared block starts at normalized position 60; doc 2's at 80
    assert m.a_min_pos >= 55 and m.b_min_pos >= 75
    # every hash present in all 3 docs would be dropped by a df cap of 2;
    # here the pair survives a cap of 2 because only docs 1+2 share it
    capped = tx.winnow_matches(
        df, k=8, w=4, min_shared=1, max_hash_df=1
    ).count()
    assert capped == 0  # cap 1 drops every shared hash by definition


# ---------------------------------------------------------------------------
# adamic_adar_scores
# ---------------------------------------------------------------------------

def test_adamic_adar_oracle_parity_on_testdata(spark):
    from flink_kafka_table_api_spark.queries import (
        _two_gen_edges,
        _two_gen_edges_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'"
    )
    got = [
        tuple(r)
        for r in gr.adamic_adar_scores(
            _two_gen_edges(spark, SF), top_k=100
        ).collect()
    ]
    exp = [
        tuple(r)
        for r in con.execute(
            gr.adamic_adar_scores_sql(_two_gen_edges_sql(), top_k=100)
        ).fetchall()
    ]
    assert len(got) == 100
    assert got == exp


def test_adamic_adar_prefers_rare_neighbors(spark):
    """Two candidate pairs with ONE common neighbor each: the pair
    sharing the rare (degree-2) neighbor must outscore the pair sharing
    the hub (degree-5), though common-neighbor counts tie."""
    und = [
        (1, 9), (2, 9),                     # rare apex 9 (degree 2)
        (3, 10), (4, 10), (10, 5), (10, 6), (10, 7),  # hub apex 10
    ]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src long, dst long",
    )
    rows = {
        (r.node_u, r.node_v): r.aa_score
        for r in gr.adamic_adar_scores(edges, top_k=100).collect()
    }
    assert rows[(1, 2)] > rows[(3, 4)]
    import math

    assert rows[(1, 2)] == round(1 / math.log(2), 6)
    assert rows[(3, 4)] == round(1 / math.log(5), 6)


# ---------------------------------------------------------------------------
# lsh_recall_audit
# ---------------------------------------------------------------------------

def test_lsh_recall_audit_oracle_parity_on_testdata(spark, docs_con):
    from flink_kafka_table_api_spark.catalog import read_table
    from flink_kafka_table_api_spark.queries import (
        _lsh_pairs_oracle,
        ORACLES,
    )

    docs = read_table(spark, SF, "documents")
    got = sorted(
        tuple(r)
        for r in dd.lsh_recall_audit(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    )
    jacc = (
        "CAST(len(list_filter(x.sh, t -> list_contains(y.sh, t))) AS "
        "DOUBLE) / (len(x.sh) + len(y.sh) - "
        "len(list_filter(x.sh, t -> list_contains(y.sh, t))))"
    )
    oracle = f"""
    WITH shsets AS (
      SELECT doc_id, {dd.shingles_sql('text', 3)} AS sh FROM documents
    ),
    truth AS (
      SELECT x.doc_id AS a, y.doc_id AS b, round({jacc}, 6) AS jaccard
      FROM shsets x JOIN shsets y ON x.doc_id < y.doc_id
      WHERE round({jacc}, 6) >= 0.5
    ),
    cand AS ({_lsh_pairs_oracle()}),
    found AS (
      SELECT t.a, t.b FROM truth t
      JOIN cand c ON t.a = c.a AND t.b = c.b
    ),
    j AS (
      SELECT t.a, t.b, t.jaccard,
             EXISTS (SELECT 1 FROM found f
                     WHERE f.a = t.a AND f.b = t.b) AS hit
      FROM truth t
    )
    SELECT floor(jaccard * 10) / 10 AS band_lo,
           CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           CAST(COUNT(*) FILTER (WHERE hit) AS BIGINT) AS n_lsh_found,
           round(CAST(COUNT(*) FILTER (WHERE hit) AS DOUBLE)
                 / COUNT(*), 6) AS recall
    FROM j GROUP BY floor(jaccard * 10) / 10
    """
    exp = sorted(tuple(r) for r in docs_con.execute(oracle).fetchall())
    assert len(got) >= 2, "audit produced <2 bands: dead signal"
    assert got == exp
    # sanity of the S-curve: the top band must not recall WORSE than
    # the bottom band on this corpus
    by_band = {r[0]: r[3] for r in got}
    assert by_band[max(by_band)] >= by_band[min(by_band)]


# ---------------------------------------------------------------------------
# equi_depth_bins
# ---------------------------------------------------------------------------

def test_equi_depth_bins_oracle_parity_on_testdata(spark):
    from flink_kafka_table_api_spark.catalog import read_table

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'"
    )
    orders = read_table(spark, SF, "orders")
    got = sorted(
        tuple(r)
        for r in rel.equi_depth_bins(
            orders.select("o_totalprice"), "o_totalprice", n_bins=10
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            rel.equi_depth_bins_sql("orders", "o_totalprice", n_bins=10)
        ).fetchall()
    )
    assert len(got) == 10
    assert got == exp
    # equi-depth contract: no bin holds more than ~2x its fair share
    counts = [r[3] for r in got]
    assert max(counts) <= 2 * (sum(counts) / len(counts))


def test_r11_operators_tolerate_empty_input(spark):
    """Empty frames must yield empty results, never throw (the
    hardening bar the later rounds set, applied backward)."""
    from flink_kafka_table_api_spark.operators.dedup import (
        lsh_recall_audit,
    )
    from flink_kafka_table_api_spark.operators.graph import (
        adamic_adar_scores,
    )
    from flink_kafka_table_api_spark.operators.relational import (
        equi_depth_bins,
    )
    from flink_kafka_table_api_spark.operators.text import winnow_matches

    docs = spark.createDataFrame([], "doc_id long, text string")
    edges = spark.createDataFrame([], "src long, dst long")
    vals = spark.createDataFrame([], "o_totalprice double")
    assert winnow_matches(docs).count() == 0
    assert adamic_adar_scores(edges).count() == 0
    assert lsh_recall_audit(docs, "doc_id", "text").count() == 0
    assert equi_depth_bins(vals, "o_totalprice").count() == 0
