"""Round-14 pre-validated operators (the staging pattern, rounds
ahead): burst_detection (Kleinberg two-state Viterbi over daily event
shares, integer-quantized), cluster_silhouette (centroid-based
simplified silhouette over the IVF coarse clustering),
source_lang_mi (mutual information / NMI between document attributes),
and tokenizer_fertility (per-language pieces-per-word under the
corpus-trained BPE merges). Each pinned against its DuckDB oracle over
the real sf0.001 tables plus targeted behavior fixtures."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.similarity as sim
import flink_kafka_table_api_spark.operators.text as tx
import flink_kafka_table_api_spark.operators.timeseries as tsops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# burst_detection
# ---------------------------------------------------------------------------

def test_burst_detection_oracle_parity_on_testdata(spark, con):
    from flink_kafka_table_api_spark.catalog import read_table

    ev = read_table(spark, SF, "events")
    got = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in tsops.burst_detection(ev).collect()
    )
    exp = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in con.execute(tsops.burst_detection_sql()).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp


def test_burst_detection_finds_injected_interval(spark):
    """A type whose share quadruples for 5 days flags exactly a
    coherent interval there; steady background types never flag. The
    Viterbi path property (vs per-day thresholds): a 1-day dip inside
    the burst stays marked because switching out and back costs two
    transitions."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for day in range(30):
        ts = base + dt.timedelta(days=day)
        n_hot = 20 if (10 <= day < 15 and day != 12) else (
            12 if day == 12 else 5
        )
        for _ in range(n_hot):
            rows.append((eid, ts, "hot")); eid += 1
        for k in range(8):
            for _ in range(7):
                rows.append((eid, ts, f"cold{k}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = tsops.burst_detection(df).collect()
    hot = sorted(
        (str(r.day), r.burst) for r in out if r.event_type == "hot"
    )
    burst_days = [d for d, b in hot if b]
    assert burst_days == [
        "2024-03-11", "2024-03-12", "2024-03-13", "2024-03-14",
        "2024-03-15",
    ]  # contiguous interval including the day-12 dip
    assert not any(
        r.burst for r in out if r.event_type.startswith("cold")
    )


def test_burst_detection_matches_duckdb_on_synthetic(spark, con):
    """Bit-parity on a corpus WITH bursts (the testdata is mostly
    burst-free, so this pins the interesting branch of both folds)."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for day in range(30):
        ts = base + dt.timedelta(days=day)
        for _ in range(20 if 10 <= day < 15 else 5):
            rows.append((eid, ts, "hot")); eid += 1
        for k in range(8):
            for _ in range(7):
                rows.append((eid, ts, f"cold{k}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in tsops.burst_detection(df).collect()
    )
    c2 = duckdb.connect()
    c2.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR)"
    )
    c2.executemany("INSERT INTO events VALUES (?,?,?)", rows)
    exp = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in c2.execute(tsops.burst_detection_sql()).fetchall()
    )
    assert got == exp
    assert sum(1 for r in got if r[4]) == 5


# ---------------------------------------------------------------------------
# cluster_silhouette
# ---------------------------------------------------------------------------

def _centroids(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_embedding"),
    )


def _silhouette_oracle() -> str:
    from flink_kafka_table_api_spark.functions.vector import cosine_sql

    cos = cosine_sql("v.embedding", "c.c_emb")
    return f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_emb
      FROM embeddings WHERE vec_id < 8
    ),
    sc AS (
      SELECT v.vec_id, c.c_id, round(1.0 - {cos}, 6) AS dist
      FROM embeddings v CROSS JOIN centroids c
    ),
    two AS (
      SELECT vec_id,
             (list({{'dist': dist, 'cid': c_id}}
                   ORDER BY dist, c_id))[1] AS n1,
             (list({{'dist': dist, 'cid': c_id}}
                   ORDER BY dist, c_id))[2] AS n2
      FROM sc GROUP BY vec_id
    ),
    pv AS (
      SELECT vec_id, n1.cid AS cluster,
             round(CASE WHEN greatest(n1.dist, n2.dist) > 0
                        THEN (n2.dist - n1.dist)
                             / greatest(n1.dist, n2.dist)
                        ELSE 0.0 END, 6) AS s
      FROM two
    )
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           round(list_reduce(list(s ORDER BY vec_id), (x, y) -> x + y)
                 / COUNT(*), 6) AS mean_silhouette,
           MIN(s) AS min_silhouette, MAX(s) AS max_silhouette
    FROM pv GROUP BY cluster
    """


def test_cluster_silhouette_oracle_parity_on_testdata(spark, con):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in sim.cluster_silhouette(emb, _centroids(emb)).collect()
    )
    exp = sorted(
        tuple(r) for r in con.execute(_silhouette_oracle()).fetchall()
    )
    assert len(got) == 8
    assert got == exp
    # silhouettes live in [-1, 1]
    assert all(-1.0 <= r[2] <= 1.0 for r in got)


def test_cluster_silhouette_separates_tight_from_mixed(spark):
    """Two well-separated centroids with points hugging each: mean
    silhouette near 1; a point equidistant from both scores ~0."""
    rows = [
        (100, [1.0, 0.0]), (101, [0.99, 0.01]),   # cluster of c0
        (200, [0.0, 1.0]), (201, [0.01, 0.99]),   # cluster of c1
        (300, [0.7071, 0.7071]),                  # between both
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_id long, c_embedding array<float>",
    )
    out = {r.cluster: r for r in
           sim.cluster_silhouette(emb, cent).collect()}
    assert out[0].n_vectors == 3 or out[1].n_vectors == 3
    # the hugging points score near 1; the between-point near 0 drags
    # the min of its assigned cluster down
    assert max(out[0].max_silhouette, out[1].max_silhouette) > 0.9
    assert min(out[0].min_silhouette, out[1].min_silhouette) < 0.1


# ---------------------------------------------------------------------------
# source_lang_mi
# ---------------------------------------------------------------------------

def test_source_lang_mi_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in cu.source_lang_mi(docs).collect()]
    exp = [
        tuple(r) for r in con.execute(cu.source_lang_mi_sql()).fetchall()
    ]
    assert len(got) == 1
    assert got == exp
    n_docs, n_a, n_b, mi, h_a, h_b, nmi = got[0]
    assert n_docs == 500
    assert 0.0 <= nmi <= 1.0
    assert mi <= min(h_a, h_b) + 1e-9  # information bound


def test_source_lang_mi_extremes(spark):
    """Independent attributes -> MI 0; deterministic mapping ->
    NMI 1 (when both marginals have equal entropy)."""
    indep = spark.createDataFrame(
        [(i, f"s{i % 2}", f"l{(i // 2) % 2}") for i in range(40)],
        "doc_id long, source string, lang string",
    )
    r = cu.source_lang_mi(indep).collect()[0]
    assert r.mi == 0.0 and r.nmi == 0.0
    dep = spark.createDataFrame(
        [(i, f"s{i % 2}", f"l{i % 2}") for i in range(40)],
        "doc_id long, source string, lang string",
    )
    r2 = cu.source_lang_mi(dep).collect()[0]
    assert r2.nmi == 1.0
    assert r2.mi == r2.h_a == r2.h_b


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def _fertility_oracle() -> str:
    from flink_kafka_table_api_spark.queries import _bpe_oracle

    toks = tx.tokens_sql("text")
    return _bpe_oracle(12, final_select=f"""
    SELECT lw.lang,
           CAST(SUM(lw.f) AS BIGINT) AS n_words,
           CAST(SUM(lw.f * len(p.syms)) AS BIGINT) AS n_pieces,
           CAST(SUM(lw.f * length(p.w)) AS BIGINT) AS n_chars,
           round(CAST(SUM(lw.f * len(p.syms)) AS DOUBLE)
                 / CAST(SUM(lw.f) AS DOUBLE), 6) AS fertility,
           round(CAST(SUM(lw.f * length(p.w)) AS DOUBLE)
                 / CAST(SUM(lw.f * len(p.syms)) AS DOUBLE), 6)
             AS chars_per_piece
    FROM (
      SELECT lang, t AS w, COUNT(*) AS f
      FROM (SELECT lang, unnest({toks}) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z0-9]+$')
      GROUP BY lang, t
    ) lw JOIN {{w}} p ON lw.w = p.w
    GROUP BY lw.lang
    """)


def test_tokenizer_fertility_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in tx.tokenizer_fertility(docs).collect()
    )
    exp = sorted(
        tuple(r) for r in con.execute(_fertility_oracle()).fetchall()
    )
    assert len(got) == 5  # the 5 testdata languages
    assert got == exp
    # fertility >= 1 by construction (a word is at least one piece)
    assert all(r[4] >= 1.0 for r in got)


def test_tokenizer_fertility_flags_unmerged_language(spark):
    """Merges learned on the majority language leave the minority
    language's words unmerged: its fertility stays at character level
    while the majority's drops below it."""
    rows = (
        [(i, "en", "banana banana bandana") for i in range(20)]
        + [(100 + i, "xx", "zq wv qz vw") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.lang: r for r in
           tx.tokenizer_fertility(df, n_merges=4).collect()}
    # with 4 merges every winning pair is a majority-language pair
    # (freq >= 20 vs the minority's 2), so minority 2-char words stay
    # at character level: 2 pieces of 1 char each
    assert out["xx"].fertility == 2.0
    assert out["xx"].chars_per_piece == 1.0
    # the majority language's pieces grew past single characters
    assert out["en"].chars_per_piece > 1.3


def test_bpe_piece_counts_unchanged_by_refactor(spark, con):
    """The _bpe_encoded_words extraction must keep the registered
    bpe_encode_counts bit-exact (island-parity oracle replay)."""
    from flink_kafka_table_api_spark.queries import _bpe_oracle

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in tx.bpe_piece_counts(docs).collect())
    exp = sorted(
        tuple(r)
        for r in con.execute(_bpe_oracle(12, final_select=(
            "SELECT piece, CAST(SUM(freq) AS BIGINT) AS n_occurrences "
            "FROM (SELECT unnest(syms) AS piece, freq FROM {w}) "
            "GROUP BY piece"
        ))).fetchall()
    )
    assert got == exp
