"""Round-20 pre-validated operators (the staging pattern, rounds
ahead): ewma_control (Roberts EWMA control chart with exact
time-varying limits), heaps_law (vocabulary-growth checkpoints with
the log-log OLS fit), and grid_density_clusters (STING/CLIQUE grid
density clustering over embedding space). Each pinned against its
DuckDB oracle over the real sf0.001 tables plus targeted behavior
fixtures."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.operators.similarity import (
    grid_density_clusters,
    grid_density_clusters_sql,
)
from flink_kafka_table_api_spark.operators.text import (
    heaps_law,
    heaps_law_sql,
)
from flink_kafka_table_api_spark.operators.timeseries import (
    ewma_control,
    ewma_control_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# ewma_control
# ---------------------------------------------------------------------------

def test_ewma_oracle_parity_on_testdata(spark, con):
    ev = read_table(spark, SF, "events")
    got = sorted(tuple(r) for r in ewma_control(ev).collect())
    exp = sorted(
        tuple(r) for r in con.execute(ewma_control_sql()).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp


def test_ewma_oracle_parity_with_planted_shift(spark, con):
    """The gate form: drop 3/4 of every type's rows after day 20 — a
    Phase-II level shift (Phase I = first 15 of 30 days stays clean)
    the chart MUST flag, and both engines must agree on, via the
    src-parametrized oracle."""
    ev = read_table(spark, SF, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    shifted = (
        ev.crossJoin(F.broadcast(d0))
        .filter(
            ~(
                (F.to_date("ts") > F.date_add(F.col("d0"), 20))
                & (F.col("event_id") % 4 != 0)
            )
        )
        .select("event_id", "ts", "event_type")
    )
    got = sorted(tuple(r) for r in ewma_control(shifted).collect())
    src = """(
      SELECT event_id, ts, event_type FROM events,
        (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events)
      WHERE NOT (CAST(ts AS DATE) > d0 + INTERVAL 20 DAY
                 AND event_id % 4 <> 0)
    )"""
    exp = sorted(
        tuple(r) for r in con.execute(ewma_control_sql(src)).fetchall()
    )
    assert got == exp
    viol = [r for r in got if r[6]]
    assert viol, "planted level shift must produce violations"
    # every violation sits under the LCL side (the shift DROPS counts)
    assert all(r[3] < r[5] for r in viol)  # ewma < lcl


def test_ewma_chart_math_on_fixture(spark):
    """9/11-alternating Phase I (mu=10, sigma=1) then a terminal spike:
    z recursion and the widening limits are hand-checkable; the spike
    day must flag and Phase I stats must exclude it."""
    rows = []
    for day in range(1, 11):
        n = 40 if day == 10 else (9 if day % 2 else 11)
        for i in range(n):
            rows.append((day * 1000 + i, f"2024-03-{day:02d} 12:00:00", "a"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    out = {r.day.isoformat(): r for r in ewma_control(df).collect()}
    assert len(out) == 10
    # Phase I = days 1-5 (9,11,9,11,9): mu = 9.8, var = 1.2
    mu, var = 9.8, 1.2
    # day 1: z = 0.2*9 + 0.8*mu
    assert out["2024-03-01"].ewma == pytest.approx(
        0.2 * 9 + 0.8 * mu, abs=1e-6
    )
    # limits at t=1: mu +- 3*sigma*sqrt(lam/(2-lam)*(1-(1-lam)^2))
    hw1 = 3 * var**0.5 * (0.2 / 1.8 * (1 - 0.8**2)) ** 0.5
    assert out["2024-03-01"].ucl == pytest.approx(mu + hw1, abs=1e-6)
    # the spike day's smoothed stat escapes the upper limit
    assert out["2024-03-10"].violation is True
    assert not any(
        out[d].violation for d in out if d != "2024-03-10"
    )
    # limits widen monotonically toward the asymptote
    hw = [
        out[d].ucl - out[d].lcl for d in sorted(out)
    ]
    assert all(b >= a - 1e-9 for a, b in zip(hw, hw[1:]))


def test_ewma_zero_variance_group_never_flags(spark):
    rows = [
        (d * 10 + i, f"2024-03-{d:02d} 00:00:00", "flat")
        for d in range(1, 6)
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    out = ewma_control(df).collect()
    assert all(r.ucl is None and r.violation is None for r in out)
    assert all(r.ewma == pytest.approx(7.0, abs=1e-6) for r in out)


# ---------------------------------------------------------------------------
# heaps_law
# ---------------------------------------------------------------------------

def test_heaps_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in heaps_law(docs).collect())
    exp = sorted(tuple(r) for r in con.execute(heaps_law_sql()).fetchall())
    assert len(got) == len(exp) == 20
    # -0.0 vs 0.0 both stringify differently but compare equal in Python
    assert got == exp
    # the synthetic corpus reuses a tiny vocabulary: the audit must
    # read saturation (all types in bucket 1, beta ~ 0) — that IS the
    # corpus-health signal on this data
    assert got[0][5] == got[-1][5]  # cum_types flat after bucket 1
    assert abs(got[0][6]) < 0.05


def test_heaps_counts_and_fit_on_growing_vocab_fixture(spark):
    """Doc i introduces exactly one new type and repeats one old one:
    V(n) grows linearly in docs -> beta near ln-linear slope, counts
    exact."""
    rows = [(i, f"t{i} " + ("t0" if i else "t0")) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r.bucket, r.n_docs, r.bucket_tokens, r.new_types,
         r.cum_tokens, r.cum_types, r.beta)
        for r in heaps_law(df, n_buckets=4).collect()
    )
    assert len(out) == 4
    # width = ceil(40/4) = 10 docs per bucket, 2 tokens per doc
    assert all(r[1] == 10 and r[2] == 20 for r in out)
    # bucket 1 adds t0..t9 = 10 types +... t0 repeats: 10 new types
    assert out[0][3] == 10 and out[0][5] == 10
    assert out[3][4] == 80 and out[3][5] == 40
    # V ~ n/2: log-log slope is exactly 1 on this construction
    assert out[0][6] == pytest.approx(1.0, abs=1e-9)


def test_heaps_degenerate_single_bucket_yields_null_fit(spark):
    """One document = one checkpoint: the OLS denominator is 0; the fit
    must be NULL, never an ANSI divide-by-zero (hypothesis-found class
    during pre-validation)."""
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    rows = heaps_law(df, n_buckets=4).collect()
    assert len(rows) == 1
    assert rows[0].beta is None and rows[0].k_coef is None
    assert rows[0].cum_tokens == 3 and rows[0].cum_types == 3


def test_heaps_buckets_partition_every_doc(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = heaps_law(docs).collect()
    assert sum(r.n_docs for r in out) == 500
    assert sum(r.new_types for r in out) == max(r.cum_types for r in out)


# ---------------------------------------------------------------------------
# grid_density_clusters
# ---------------------------------------------------------------------------

def test_grid_clusters_oracle_parity_on_testdata(spark, con):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in grid_density_clusters(
            emb, cell=0.04, min_pts=4
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            grid_density_clusters_sql(cell=0.04, min_pts=4)
        ).fetchall()
    )
    assert len(got) == len(exp) == 500
    assert got == exp
    clusters = {r[5] for r in got if r[5] is not None}
    noise = sum(1 for r in got if r[5] is None)
    # live multi-cluster signal at these params on this corpus
    assert len(clusters) >= 2 and noise > 0


def test_grid_clusters_semantics_on_fixture(spark):
    """Two 4-point blobs two cells apart plus one stray point: two
    distinct clusters, stray is noise; 8-adjacency merges diagonal
    neighbors."""
    rows = (
        # blob A: cells (0,0) and the diagonal (1,1) — must merge
        [(i, [0.05, 0.05]) for i in range(4)]
        + [(10 + i, [0.15, 0.15]) for i in range(4)]
        # blob B: cell (5,5), isolated from A
        + [(20 + i, [0.55, 0.55]) for i in range(4)]
        # stray
        + [(99, [0.95, 0.95])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in grid_density_clusters(
        df, cell=0.1, min_pts=4
    ).collect()}
    assert out[99].cluster is None and not out[99].is_core
    a1, a2, b = out[0].cluster, out[10].cluster, out[20].cluster
    assert a1 == a2 is not None  # diagonal cells merged
    assert b is not None and b != a1
    assert out[0].cell_n == 4 and out[0].is_core


def test_grid_clusters_min_pts_boundary(spark):
    """Exactly min_pts points is dense; one fewer is noise."""
    rows = [(i, [0.01, 0.01]) for i in range(3)]
    rows += [(10 + i, [0.91, 0.91]) for i in range(2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in grid_density_clusters(
        df, cell=0.1, min_pts=3
    ).collect()}
    assert out[0].is_core and out[0].cluster is not None
    assert not out[10].is_core and out[10].cluster is None
