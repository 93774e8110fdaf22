"""Round-15 pre-validated operators (the staging pattern, rounds
ahead): ks_source_drift (exact two-sample Kolmogorov-Smirnov per
source vs rest), chi2_independence (Pearson chi-square + Cramer's V
over the full contingency grid), and shingle_overlap_matrix (pairwise
source content overlap via top-N shingle Jaccard). Each pinned against
its DuckDB oracle over the real sf0.001 tables plus targeted behavior
fixtures."""

from __future__ import annotations

import duckdb
import pytest

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.dedup as dd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return c


# ---------------------------------------------------------------------------
# ks_source_drift
# ---------------------------------------------------------------------------

def test_ks_source_drift_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in cu.ks_source_drift(docs).collect())
    exp = sorted(
        tuple(r) for r in con.execute(cu.ks_source_drift_sql()).fetchall()
    )
    assert len(got) == 20  # one row per source
    assert got == exp
    # KS statistic lives in [0, 1]
    assert all(0.0 <= r[3] <= 1.0 for r in got)


def test_ks_source_drift_flags_shifted_distribution(spark):
    """A source whose lengths sit entirely above the rest's support
    has D = 1 and must flag; an identically-distributed source must
    not. Also pins the step-function evaluation: ECDF compared at
    EVERY global value, not just the source's own values."""
    rows = (
        [(i, "same", 100 + (i % 10)) for i in range(200)]
        + [(1000 + i, "alike", 100 + (i % 10)) for i in range(200)]
        + [(2000 + i, "shifted", 500 + (i % 10)) for i in range(200)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    out = {r.source: r for r in cu.ks_source_drift(df).collect()}
    assert out["shifted"].ks_stat == 1.0 and out["shifted"].drift
    # 'same' vs rest = 'alike' (identical) + 'shifted' (disjoint):
    # its D against the pooled rest is 0.5, driven by the shifted mass
    assert out["same"].ks_stat == 0.5
    assert not out["alike"].drift or out["alike"].ks_stat <= 0.5


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------

def test_chi2_independence_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in cu.chi2_independence(docs).collect()]
    exp = [
        tuple(r)
        for r in con.execute(cu.chi2_independence_sql()).fetchall()
    ]
    assert len(got) == 1
    assert got == exp
    n_docs, dof, chi2, v = got[0]
    assert dof == (20 - 1) * (5 - 1)
    assert 0.0 <= v <= 1.0


def test_chi2_independence_extremes_and_absent_cells(spark):
    """Independent uniform attributes -> chi2 0; a deterministic
    mapping -> Cramer's V 1. The absent-cell expectation terms are the
    point: a deterministic 2x2 mapping's chi2 comes HALF from the two
    o=0 cells a sparse groupBy would drop."""
    indep = spark.createDataFrame(
        [(i, f"s{i % 2}", f"l{(i // 2) % 2}") for i in range(40)],
        "doc_id long, source string, lang string",
    )
    r = cu.chi2_independence(indep).collect()[0]
    assert r.chi2 == 0.0 and r.cramers_v == 0.0

    dep = spark.createDataFrame(
        [(i, f"s{i % 2}", f"l{i % 2}") for i in range(40)],
        "doc_id long, source string, lang string",
    )
    r2 = cu.chi2_independence(dep).collect()[0]
    assert r2.cramers_v == 1.0
    assert r2.chi2 == float(r2.n_docs)  # phi^2 = 1 for a perfect 2x2


# ---------------------------------------------------------------------------
# shingle_overlap_matrix
# ---------------------------------------------------------------------------

def test_shingle_overlap_matrix_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in dd.shingle_overlap_matrix(docs).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(dd.shingle_overlap_matrix_sql()).fetchall()
    )
    assert len(got) == len(exp) > 100  # most of the 190 source pairs
    assert got == exp
    # the shingle heads genuinely differ across sources: no saturated
    # all-1.0 matrix (the token-level version's failure mode)
    assert all(r[5] < 1.0 for r in got)


def test_shingle_overlap_matrix_detects_shared_upstream(spark):
    """Two groups drawing from the same text pool show near-total
    head overlap; a disjoint group shows zero. Head sets smaller than
    top_n report their true size."""
    pool = "alpha beta gamma delta epsilon zeta eta theta " * 3
    other = "omega psi chi phi upsilon tau sigma rho " * 3
    rows = (
        [(i, "crawl_a", pool) for i in range(10)]
        + [(100 + i, "crawl_b", pool) for i in range(10)]
        + [(200 + i, "fresh", other) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r.group_a, r.group_b): r
        for r in dd.shingle_overlap_matrix(df, top_n=50).collect()
    }
    ab = out[("crawl_a", "crawl_b")]
    assert ab.jaccard == 1.0 and ab.n_a == ab.n_b == ab.n_common
    assert ab.n_a < 50  # true head size, not padded to top_n
    assert ("crawl_a", "fresh") not in out or \
        out[("crawl_a", "fresh")].n_common == 0
