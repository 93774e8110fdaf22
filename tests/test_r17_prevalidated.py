"""Round-17 pre-validated operators (the staging pattern, rounds
ahead): hits_scores (Kleinberg HITS hub/authority as exact integer
path counts), markov_transitions (first-order event-type transition
matrix with MLE probabilities), and benford_audit (Benford first-digit
conformance over a positive numeric column). Each pinned against its
DuckDB oracle over the real sf0.001 tables plus targeted behavior
fixtures."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.graph import (
    hits_scores,
    hits_scores_sql,
)
from flink_kafka_table_api_spark.operators.timeseries import (
    markov_transitions,
    markov_transitions_sql,
)
from flink_kafka_table_api_spark.operators.validate import (
    benford_audit,
    benford_audit_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "events", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# hits_scores
# ---------------------------------------------------------------------------

# The gate-twin graph: quadratic + linear generators on customer keys,
# DIRECTED (no symmetrization — HITS is about directed structure). The
# quadratic map k -> 1 + k^2 mod N is many-to-one (<= 16 preimages for
# the shipped N's by CRT square-root counting), which is exactly what
# gives authorities a LIVE in-degree signal; the linear bijection keeps
# every node a hub. Out-degree <= 2, so 4 integer rounds stay far from
# BIGINT overflow.
_HITS_EDGES_SQL = """
    SELECT DISTINCT src, dst FROM (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(1 + (c_custkey * c_custkey) % nn0.n AS BIGINT) AS dst
      FROM customer, (SELECT COUNT(*) AS n FROM customer) nn0
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(1 + (c_custkey * 13) % nn0.n AS BIGINT) AS dst
      FROM customer, (SELECT COUNT(*) AS n FROM customer) nn0
    ) WHERE src <> dst
"""


def _hits_edges(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    n = cust.count()
    base = None
    for expr in (
        (F.col("c_custkey") * F.col("c_custkey")) % F.lit(n),
        (F.col("c_custkey") * 13) % F.lit(n),
    ):
        b = cust.select(
            F.col("c_custkey").cast("long").alias("src"),
            (F.lit(1) + expr).cast("long").alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        base = b if base is None else base.unionAll(b)
    return base.distinct()


def test_hits_oracle_parity_on_testdata(spark, con):
    got = sorted(tuple(r) for r in hits_scores(_hits_edges(spark)).collect())
    exp = sorted(
        tuple(r)
        for r in con.execute(hits_scores_sql(_HITS_EDGES_SQL)).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # live signal: the quadratic generator's in-degree variation must
    # produce a non-flat authority distribution
    assert len({r[2] for r in got}) > 5


def test_hits_integer_semantics_on_fixture(spark):
    """Classic hub/authority shape: 1,2,3 all point at 10; only 1 also
    points at 11. Exact unnormalized integer path counts are checkable
    by hand for one round and the 4-round ranking must keep 10 the top
    authority and 1 the top hub."""
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11)], "src long, dst long"
    )
    one = {r.node: r for r in hits_scores(edges, iterations=1).collect()}
    # a_1 = in-degree (h_0 = 1 everywhere); h_1 = sum of a_1 over dsts
    assert one[10].auth_score == 3 and one[11].auth_score == 1
    assert one[1].hub_score == 4
    assert one[2].hub_score == 3 and one[3].hub_score == 3
    # pure authorities have hub 0; pure hubs have authority 0
    assert one[10].hub_score == 0 and one[1].auth_score == 0
    four = {r.node: r for r in hits_scores(edges, iterations=4).collect()}
    assert max(four.values(), key=lambda r: r.auth_score).node == 10
    assert max(four.values(), key=lambda r: r.hub_score).node == 1


# ---------------------------------------------------------------------------
# markov_transitions
# ---------------------------------------------------------------------------

def test_markov_oracle_parity_on_testdata(spark, con):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(tuple(r) for r in markov_transitions(ev).collect())
    exp = sorted(
        tuple(r) for r in con.execute(markov_transitions_sql()).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # MLE rows sum to ~1 within each from-state and ranks are 1..k
    from collections import defaultdict

    by_from = defaultdict(list)
    for r in got:
        by_from[r[0]].append(r)
    for rows in by_from.values():
        assert abs(sum(r[4] for r in rows) - 1.0) < 1e-6
        assert sorted(r[5] for r in rows) == list(range(1, len(rows) + 1))
        assert all(r[3] == rows[0][3] for r in rows)  # shared from_total


def test_markov_lag_order_and_counts_on_fixture(spark):
    """Known chain a->b->a->c for one user plus a timestamp TIE broken
    by event_id (the contract's (ts, id) order), and a second user whose
    single event contributes no transition."""
    t0 = dt.datetime(2024, 4, 1)
    rows = [
        (1, 100, t0, "a"),
        (2, 100, t0 + dt.timedelta(minutes=1), "b"),
        # tie at +2min: event_id order makes the sequence ...b, a, c
        (3, 100, t0 + dt.timedelta(minutes=2), "a"),
        (4, 100, t0 + dt.timedelta(minutes=2), "c"),
        (5, 200, t0, "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r.from_type, r.to_type): r for r in markov_transitions(df).collect()}
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert out[("a", "b")].n_transitions == 1
    assert out[("a", "b")].from_total == 2
    assert out[("a", "b")].p_mle == 0.5
    # rank ties break on to_type ASC: within from 'a', b before c
    assert out[("a", "b")].rank_in_state == 1
    assert out[("a", "c")].rank_in_state == 2


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

def test_benford_oracle_parity_on_testdata(spark, con):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = sorted(
        tuple(r) for r in benford_audit(li, "l_extendedprice").collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            benford_audit_sql("lineitem", "l_extendedprice")
        ).fetchall()
    )
    assert len(got) == len(exp) == 9
    assert got == exp
    # TPC-H prices are ~uniform, NOT Benford: the audit must say so
    assert not all(r[5] for r in got)
    assert abs(sum(r[2] for r in got) - 1.0) < 1e-5  # shares sum to 1


def test_benford_quantization_and_filter_semantics(spark):
    """Leading digit comes from the integer CENT string: 0.0999 rounds
    to 10 cents (digit 1 — the documented boundary carry), zeros and
    negatives are excluded, and a digit with no observations still gets
    its spine row with n_obs=0."""
    vals = [(0.0999,), (1.23,), (0.05,), (-4.0,), (0.0,), (92.0,)]
    df = spark.createDataFrame(vals, "amount double")
    out = {r.digit: r for r in benford_audit(df, "amount").collect()}
    assert len(out) == 9
    assert out[1].n_obs == 2  # 10 cents and 123 cents
    assert out[5].n_obs == 1  # 5 cents
    assert out[9].n_obs == 1  # 9200c
    assert sum(r.n_obs for r in out.values()) == 4  # 0 and -4 excluded
    assert out[2].n_obs == 0 and out[2].p_obs == 0.0
    assert out[1].p_benford == 0.30103


def test_benford_conformant_series_passes(spark):
    """A geometric series 1.05^k is the textbook Benford-conformant
    sequence — every digit must land inside the 2% tolerance band.
    A non-finite and a beyond-BIGINT outlier ride along: the try_cast
    contract excludes them instead of crashing the audit (ANSI mode)."""
    df = spark.range(0, 700).select(
        F.pow(F.lit(1.05), F.col("id").cast("double")).alias("amount")
    ).unionAll(
        spark.createDataFrame(
            [(1e30,), (float("inf",),)], "amount double"
        )
    )
    out = benford_audit(df, "amount", unit=10000).collect()
    assert sum(r.n_obs for r in out) == 700
    assert all(r.within_tolerance for r in out)


def test_r17_operators_empty_input_and_partitioning_invariance(spark):
    """Empty frames yield empty results (benford: 9 all-zero digit
    rows — its spine is constant by design), never throw; results are
    invariant to input partitioning (the r8/r19-20 hardening bar)."""
    from flink_kafka_table_api_spark.catalog import read_table

    empty_edges = spark.createDataFrame([], "src long, dst long")
    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    empty_li = spark.createDataFrame([], "l_extendedprice double")
    assert hits_scores(empty_edges).count() == 0
    assert markov_transitions(empty_ev).count() == 0
    bf = benford_audit(empty_li, "l_extendedprice").collect()
    assert len(bf) == 9 and all(r.n_obs == 0 for r in bf)
    assert all(r.p_obs is None and r.chi2_term is None for r in bf)

    ev = read_table(spark, SF, "events")
    edges = _hits_edges(spark)
    a = sorted(map(tuple, hits_scores(edges).collect()))
    b = sorted(map(tuple, hits_scores(edges.repartition(7)).collect()))
    assert a == b
    a = sorted(map(tuple, markov_transitions(ev).collect()))
    b = sorted(map(tuple, markov_transitions(ev.repartition(7)).collect()))
    assert a == b
