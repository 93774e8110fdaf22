"""Round-19 pre-validated operators (the staging pattern, rounds
ahead): rfm_segments (Hughes RFM customer segmentation with quantile
scores), mann_whitney_u (exact rank-sum location-shift test per source
vs rest), and assoc_rules (directional association rules with
confidence/lift over the A-priori frequent-pair stage). Each pinned
against its DuckDB oracle over the real sf0.001 tables plus targeted
behavior fixtures."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.curation import (
    mann_whitney_u,
    mann_whitney_u_sql,
)
from flink_kafka_table_api_spark.operators.relational import (
    rfm_segments,
    rfm_segments_sql,
)
from flink_kafka_table_api_spark.operators.text import (
    assoc_rules,
    assoc_rules_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------

def test_rfm_oracle_parity_on_testdata(spark, con):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = sorted(tuple(r) for r in rfm_segments(orders).collect())
    exp = sorted(tuple(r) for r in con.execute(rfm_segments_sql()).fetchall())
    assert len(got) == len(exp) == 150
    assert got == exp


def test_rfm_scores_and_segments_on_fixture(spark):
    """Five customers engineered so every quintile is a singleton:
    scores must be a permutation of 1..5 on each axis, R reversed."""
    rows = []
    # customer i: last order (i+1) days before the corpus max,
    # i+1 orders of 100*(i+1) dollars each
    for i in range(5):
        for j in range(i + 1):
            rows.append((i, f"2024-01-{20 - i:02d} 00:00:00",
                         100.0 * (i + 1)))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_custkey",
        F.to_timestamp("o_orderdate").alias("o_orderdate"),
        "o_totalprice",
    )
    out = {r.customer: r for r in rfm_segments(df).collect()}
    assert len(out) == 5
    # recency ascends with i (older last order) -> r_score descends
    assert [out[i].r_score for i in range(5)] == [5, 4, 3, 2, 1]
    # frequency and monetary ascend with i
    assert [out[i].f_score for i in range(5)] == [1, 2, 3, 4, 5]
    assert [out[i].m_score for i in range(5)] == [1, 2, 3, 4, 5]
    assert out[0].rfm_cell == 511 and out[4].rfm_cell == 155
    # integer-cent quantization: 3 orders x $300 = 90000 cents
    assert out[2].monetary_cents == 90_000
    # CASE ladder: f>=4 wins 'loyal' before m>=4 'big_spender'
    assert out[4].segment == "loyal"
    assert out[0].segment == "regular"


def test_rfm_segment_ladder_covers_champion_and_at_risk(spark, con):
    """On the real table every named segment in the ladder appears,
    and the ladder is exclusive-first-match (champion rows also satisfy
    the loyal predicate but must be labeled champion)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = rfm_segments(orders).collect()
    segs = {r.segment for r in out}
    assert "champion" in segs and "hibernating" in segs
    for r in out:
        if r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4:
            assert r.segment == "champion"


# ---------------------------------------------------------------------------
# mann_whitney_u
# ---------------------------------------------------------------------------

def test_mwu_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in mann_whitney_u(docs).collect())
    exp = sorted(
        tuple(r) for r in con.execute(mann_whitney_u_sql()).fetchall()
    )
    assert len(got) == len(exp) == 20
    assert got == exp


def test_mwu_exact_u_on_textbook_fixture(spark):
    """Hand-computable two-group case with a tie ACROSS groups:
    group a = {1, 3, 5}, group b = {3, 4}. Midranks: 1->1, 3->2.5,
    4->4, 5->5. R_a = 1 + 2.5 + 5 = 8.5 -> rank_sum_x2 = 17;
    U_a = 8.5 - 3*4/2 = 2.5."""
    rows = [("a", 1), ("a", 3), ("a", 5), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.source: r for r in mann_whitney_u(df).collect()}
    assert out["a"].rank_sum_x2 == 17
    assert out["a"].u1_x2 == 5  # 17 - 3*4
    assert out["a"].u_stat == 2.5
    # U_a + U_b = n1*n2 (the defining identity, tie-safe)
    assert out["a"].u_stat + out["b"].u_stat == 3 * 2
    # z columns are antisymmetric-ish only for equal sizes; here just
    # check both z are finite and neither rejects on 5 points
    assert not out["a"].reject_95 and not out["b"].reject_95


def test_mwu_detects_planted_location_shift(spark):
    """One source systematically longer than the rest must reject at
    95% with positive z (U counts 'source wins' pairs)."""
    rows = [("shifted", 1000 + i) for i in range(40)]
    rows += [(f"s{i % 4}", 100 + (i * 7) % 50) for i in range(160)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.source: r for r in mann_whitney_u(df).collect()}
    assert out["shifted"].reject_95 and out["shifted"].z > 3
    # every 'shifted' value beats every other: U must be exactly n1*n2
    assert out["shifted"].u_stat == 40 * 160


def test_mwu_degenerate_all_tied_corpus_yields_null_z(spark):
    """Every value identical -> one giant tie group -> sigma = 0: z,
    effect_r and reject_95 must be NULL, never an ANSI divide-by-zero
    (hypothesis-found class during pre-validation); the integer rank
    algebra still holds."""
    rows = [("a", 7)] * 4 + [("b", 7)] * 3
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.source: r for r in mann_whitney_u(df).collect()}
    # midrank of the single value: (2*0 + 7 + 1)/2 = 4 -> rank2 = 8
    assert out["a"].rank_sum_x2 == 4 * 8
    assert out["a"].z is None and out["a"].reject_95 is None
    assert out["b"].effect_r is None


def test_mwu_tie_cube_survives_bigint_overflow_scale(spark):
    """2.2M rows sharing one value: t^3 ~ 1.06e19 > 2^63-1, which a
    BIGINT tie-term sum would abort on under ANSI — the DECIMAL(38,0)
    path must complete (review finding, fixed); with a second distinct
    value sigma is positive and z finite."""
    from pyspark.sql import functions as F

    df = spark.range(2_200_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
        F.when(F.col("id") < 100, F.col("id") + 100)
        .otherwise(F.lit(7)).cast("long").alias("n_chars"),
    )
    out = {r.source: r for r in mann_whitney_u(df).collect()}
    assert out["a"].n_group + out["b"].n_group == 2_200_000
    assert out["a"].z is not None and math.isfinite(out["a"].z)


def test_mwu_tie_term_zero_without_ties(spark):
    rows = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.source: r for r in mann_whitney_u(df).collect()}
    # complete separation: U_b = 100 (all wins), U_a = 0
    assert out["b"].u_stat == 100.0 and out["a"].u_stat == 0.0
    # no-ties sigma: sqrt(n1*n2*(N+1)/12) = sqrt(100*21/12)
    sigma = math.sqrt(100 * 21 / 12)
    assert out["b"].z == pytest.approx((100 - 50) / sigma, abs=1e-9)


# ---------------------------------------------------------------------------
# assoc_rules
# ---------------------------------------------------------------------------

def test_assoc_rules_oracle_parity_on_testdata(spark, con):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in assoc_rules(docs).collect()]
    exp = [tuple(r) for r in con.execute(assoc_rules_sql()).fetchall()]
    assert len(got) == len(exp) == 50
    # deterministic cutoff: the ORDERED lists agree, not just the sets
    assert got == exp


def test_assoc_rules_confidence_and_lift_on_fixture(spark):
    """10 docs: 'x y' in 6, 'x' alone in 2, 'y' alone in 1, 'z' in 1.
    df(x)=8, df(y)=7, supp(x,y)=6, N=10: conf(x=>y)=6/8,
    conf(y=>x)=6/7, lift=60/56 both directions."""
    rows = (
        [(i, "x y") for i in range(6)]
        + [(6, "x"), (7, "x"), (8, "y"), (9, "z")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.antecedent, r.consequent): r
        for r in assoc_rules(df, min_support=2, k=10).collect()
    }
    xy, yx = out[("x", "y")], out[("y", "x")]
    assert xy.pair_support == yx.pair_support == 6
    assert xy.antecedent_df == 8 and xy.consequent_df == 7
    assert xy.confidence == pytest.approx(0.75, abs=1e-9)
    assert yx.confidence == pytest.approx(round(6 / 7, 9), abs=1e-12)
    assert xy.lift == yx.lift == pytest.approx(round(60 / 56, 9), abs=1e-12)
    # both directions of a pair always co-present
    assert set(out) == {("x", "y"), ("y", "x")}


def test_assoc_rules_lift_below_one_for_anticorrelated(spark):
    """Tokens that co-occur LESS than independence land lift < 1."""
    rows = [(i, "a b") for i in range(3)]
    rows += [(10 + i, "a c") for i in range(7)]
    rows += [(20 + i, "b c") for i in range(7)]
    rows += [(30 + i, "d e") for i in range(3)]  # exclusive pair
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.antecedent, r.consequent): r.lift
        for r in assoc_rules(df, min_support=2, k=20).collect()
    }
    # df(a)=10, df(b)=10, supp=3, N=20 -> lift = 60/100 < 1
    assert out[("a", "b")] == pytest.approx(0.6, abs=1e-9)
    # df(d)=df(e)=supp=3 -> lift = 3*20/9 > 1 (perfectly co-occurring)
    assert out[("a", "b")] < 1 < out[("d", "e")]
    assert out[("d", "e")] == pytest.approx(round(60 / 9, 9), abs=1e-12)
