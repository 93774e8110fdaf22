"""Edge-behavior hardening for the round-12..15 staged operators:
empty inputs, single-group/degenerate shapes, and division guards.
Each test pins the behavior (row counts / guard values), so a future
refactor cannot silently change an edge contract."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.dedup as dd
import flink_kafka_table_api_spark.operators.similarity as sim
import flink_kafka_table_api_spark.operators.text as tx
import flink_kafka_table_api_spark.operators.timeseries as tsops


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long"
    )


def test_edit_similarity_join_degenerate_inputs(spark):
    # single name: no pairs, no crash
    one = spark.createDataFrame([(1, "solo")], "pk long, name string")
    assert dd.edit_similarity_join(one, name_col="name").count() == 0
    # all-short names route entirely through the broadcast block
    shorts = spark.createDataFrame(
        [(1, "ab"), (2, "ac"), (3, "zz")], "pk long, name string"
    )
    got = {
        (r.a_name, r.b_name): r.dist
        for r in dd.edit_similarity_join(shorts, name_col="name").collect()
    }
    assert got[("ab", "ac")] == 1
    # NULL names are excluded from both blocks (length(NULL) is NULL)
    nulls = spark.createDataFrame(
        [(1, None), (2, None), (3, "abcdef"), (4, "abcdeg")],
        "pk long, name string",
    )
    out = dd.edit_similarity_join(nulls, name_col="name").collect()
    assert {(r.a_name, r.b_name) for r in out} == {("abcdef", "abcdeg")}


def test_ngram_novelty_and_zipf_empty_corpus(spark, empty_docs):
    assert dd.ngram_novelty(empty_docs).count() == 0
    # zipf_gini_audit on an empty corpus: histogram is empty -> the
    # single aggregate row carries NULL counts; assert it does not
    # crash and reports no tokens
    row = tx.zipf_gini_audit(empty_docs).collect()[0]
    assert (row.n_tokens or 0) == 0


def test_cusum_and_burst_single_group_single_day(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "only")],
        "event_id long, ts timestamp, event_type string",
    )
    c = tsops.cusum_drift(df).collect()
    assert len(c) == 1 and c[0].z == 0.0 and not c[0].drift
    b = tsops.burst_detection(df).collect()
    assert len(b) == 1 and not b[0].burst  # start-in-q0 convention


def test_readability_and_rake_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, "!!! ??? ..."), (2, "the of and"), (3, "")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in tx.readability_scores(df).collect()}
    # punctuation-only tokens still count >= 1 syllable each
    assert r[1].n_words == 3 and r[1].n_syllables == 3
    assert r[1].n_sentences == 0  # no alphanumeric sentence content
    assert r[3].flesch_reading_ease == 0.0
    # all-stopword corpus: RAKE yields no phrases, empty top-k
    assert tx.rake_keywords(df).count() == 0


def test_er_clusters_all_unique_names(spark):
    df = spark.createDataFrame(
        [(1, "alphabet"), (2, "bricklayer"), (3, "cormorant")],
        "pk long, name string",
    )
    out = {r.name: r for r in dd.er_clusters(df, name_col="name").collect()}
    assert len(out) == 3
    assert all(r.cluster == r.name == r.canonical_name
               for r in out.values())


def test_cluster_silhouette_single_centroid_guard(spark):
    """With one centroid there is no second-nearest: the silhouette is
    undefined. Pin the current behavior (b is NULL -> s NULL rows are
    not silently fabricated as zeros)."""
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0])], "c_id long, c_embedding array<float>"
    )
    rows = sim.cluster_silhouette(emb, cent).collect()
    assert len(rows) == 1
    # mean over NULL silhouettes stays NULL — surfaced, not masked
    assert rows[0].mean_silhouette is None


def test_source_lang_mi_single_category(spark):
    """One source: H_a = 0, MI = 0, and the NMI guard returns 0.0
    instead of dividing by zero."""
    df = spark.createDataFrame(
        [(i, "only", f"l{i % 3}") for i in range(30)],
        "doc_id long, source string, lang string",
    )
    r = cu.source_lang_mi(df).collect()[0]
    assert r.mi == 0.0 and r.h_a == 0.0 and r.nmi == 0.0


def test_chi2_independence_single_category_guard(spark):
    """dof = 0 when an attribute has one level; Cramer's V would
    divide by zero — pin that chi2 is 0 and v is not a crash."""
    df = spark.createDataFrame(
        [(i, "only", f"l{i % 3}") for i in range(30)],
        "doc_id long, source string, lang string",
    )
    r = cu.chi2_independence(df).collect()[0]
    assert r.dof == 0 and r.chi2 == 0.0
    # 0/0 -> NULL or NaN surfaced; must not be a silent wrong number
    assert r.cramers_v is None or r.cramers_v != r.cramers_v \
        or r.cramers_v == 0.0


def test_ks_source_drift_single_source_guard(spark):
    """A lone source has an empty 'rest': n_r = 0 makes the ECDF
    undefined. Pin the behavior: the row surfaces with a NULL/NaN
    statistic rather than a fabricated 0."""
    df = spark.createDataFrame(
        [(i, "only", 100 + i) for i in range(10)],
        "doc_id long, source string, n_chars long",
    )
    rows = cu.ks_source_drift(df).collect()
    assert len(rows) == 1
    ks = rows[0].ks_stat
    assert ks is None or ks != ks  # NULL or NaN, never a silent 0


def test_shingle_overlap_matrix_single_group(spark):
    df = spark.createDataFrame(
        [(1, "src0", "a b c d e")], "doc_id long, source string, text string"
    )
    assert dd.shingle_overlap_matrix(df).count() == 0


def test_tokenizer_fertility_lang_without_alnum_words(spark):
    """A language contributing no alnum words has no fertility row
    (absent, not zero) — the inner join against the piece table is the
    contract."""
    rows = [(1, "en", "hello world hello"), (2, "zz", "!!! ???")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.lang for r in tx.tokenizer_fertility(df, n_merges=2).collect()}
    assert out == {"en"}
