"""Round-18 pre-validated operators (the staging pattern, rounds
ahead): k_anonymity_audit (Sweeney k-anonymity / l-diversity release
gate), kaplan_meier (product-limit survival of subject lifetimes with
right-censoring), and psi_drift (Population Stability Index between
two snapshots over old-snapshot quantile bins). Each pinned against
its DuckDB oracle over the real sf0.001 tables plus targeted behavior
fixtures."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.curation import (
    psi_drift,
    psi_drift_sql,
)
from flink_kafka_table_api_spark.operators.timeseries import (
    kaplan_meier,
    kaplan_meier_sql,
)
from flink_kafka_table_api_spark.operators.validate import (
    k_anonymity_audit,
    k_anonymity_audit_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# k_anonymity_audit
# ---------------------------------------------------------------------------

def test_k_anonymity_oracle_parity_on_testdata(spark, con):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    got = sorted(
        tuple(r)
        for r in k_anonymity_audit(
            cust, ["c_nationkey", "c_mktsegment"], "c_acctbal"
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            k_anonymity_audit_sql(
                "customer", ["c_nationkey", "c_mktsegment"], "c_acctbal"
            )
        ).fetchall()
    )
    assert len(got) == len(exp) == 4
    assert got == exp
    # monotone: higher k can only flag more classes/rows
    assert [r[1] for r in got] == sorted(r[1] for r in got)
    # the shipped QI grid has singleton classes -> actual k-anonymity is 1
    assert got[0][6] == 1


def test_k_anonymity_class_semantics_on_fixture(spark):
    """Hand-checkable classes incl. a NULL QI class and an l-diversity=1
    class (uniform sensitive value — disclosure even at large k)."""
    rows = [
        ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "x"),  # class of 3, l=1
        ("b", 2, "p"), ("b", 2, "q"),                 # class of 2, l=2
        (None, 3, "r"),                               # NULL QI class of 1
    ]
    df = spark.createDataFrame(rows, "seg string, nat long, sens string")
    out = {
        r.k: r
        for r in k_anonymity_audit(
            df, ["seg", "nat"], "sens", thresholds=(2, 3, 4)
        ).collect()
    }
    assert out[2].n_classes == 3 and out[2].n_rows == 6
    assert out[2].min_class_size == 1       # the NULL class
    assert out[2].min_l_diversity == 1      # the uniform 'x' class
    assert out[2].n_classes_below == 1 and out[2].rows_below == 1
    assert out[3].n_classes_below == 2 and out[3].rows_below == 3
    assert out[4].n_classes_below == 3 and out[4].rows_below == 6
    assert out[4].pct_rows_below == 1.0


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_oracle_parity_on_testdata(spark, con):
    from flink_kafka_table_api_spark.catalog import read_table

    ev = read_table(spark, SF, "events")
    subj = ("user_id", "event_type")
    got = sorted(
        tuple(r) for r in kaplan_meier(ev, subject_cols=subj).collect()
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            kaplan_meier_sql(subject_cols=subj)
        ).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # survival is a monotone non-increasing step function in (0, 1]
    surv = [r[4] for r in got]
    assert surv == sorted(surv, reverse=True)
    assert all(0.0 < s <= 1.0 for s in surv)


def test_kaplan_meier_censoring_semantics_on_fixture(spark):
    """Textbook KM: 5 subjects, lifetimes 2, 2, 4(censored), 5, 7 with
    corpus max day 10 and window 3 (so last-event day >= 8 censors).
    S(2) = 1 - 2/5 = 0.6; the censored-at-4 subject leaves the risk set
    without a death row; S(5) = 0.6 * (1 - 1/2) = 0.3; the lifetime-7
    subject (last day 9) is censored, so t=7 has no row."""
    base = dt.datetime(2024, 5, 1)  # day 0

    def ev(eid, uid, day):
        return (eid, uid, base + dt.timedelta(days=day))

    rows = [
        ev(1, 1, 0), ev(2, 1, 2),    # lt 2, gap 8  -> death at 2
        ev(3, 2, 0), ev(4, 2, 2),    # lt 2, gap 8  -> death at 2
        ev(5, 3, 5), ev(6, 3, 9),    # lt 4, gap 1  -> censored at 4
        ev(7, 4, 0), ev(8, 4, 5),    # lt 5, gap 5  -> death at 5
        ev(9, 5, 2), ev(10, 5, 9),   # lt 7, gap 1  -> censored at 7
        ev(11, 6, 10),  # pins corpus max day; lifetime-0 censored subject
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r.t_days: r
        for r in kaplan_meier(df, censor_window_days=3).collect()
    }
    assert set(out) == {2, 5}
    assert out[2].n_at_risk == 5 and out[2].n_deaths == 2
    assert out[2].survival == 0.6
    # risk set at 5: subjects with lifetime >= 5 -> users 4 and 5
    assert out[5].n_at_risk == 2 and out[5].n_deaths == 1
    assert out[5].survival == 0.3


def test_kaplan_meier_all_censored_is_empty(spark):
    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 5, 1)), (2, 1, dt.datetime(2024, 5, 3))],
        "event_id long, user_id long, ts timestamp",
    )
    assert kaplan_meier(df, censor_window_days=7).count() == 0


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

_OLD_SQL = "SELECT n_chars FROM documents WHERE doc_id % 2 = 0"
_NEW_SQL = (
    "SELECT n_chars + CASE WHEN doc_id % 4 = 1 THEN 300 ELSE 0 END "
    "AS n_chars FROM documents WHERE doc_id % 2 = 1"
)


def _snapshots(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") % 2 == 0).select("n_chars")
    new = docs.where(F.col("doc_id") % 2 == 1).select(
        (
            F.col("n_chars")
            + F.when(F.col("doc_id") % 4 == 1, 300).otherwise(0)
        ).alias("n_chars")
    )
    return old, new


def test_psi_drift_oracle_parity_on_testdata(spark, con):
    old, new = _snapshots(spark)
    got = sorted(tuple(r) for r in psi_drift(old, new, "n_chars").collect())
    exp = sorted(
        tuple(r)
        for r in con.execute(
            psi_drift_sql(_OLD_SQL, _NEW_SQL, "n_chars")
        ).fetchall()
    )
    assert len(got) == len(exp) == 10
    assert got == exp
    # the +300 shift on half the new snapshot is a real drift: PSI > 0.25
    assert got[0][6] > 0.25
    # terms sum to the total (within the two rounding boundaries)
    assert abs(sum(r[5] for r in got) - got[0][6]) < 1e-5


def test_psi_drift_stable_and_shifted_fixtures(spark):
    """Identical snapshots -> PSI ~ 0 (stable); a disjoint-range shift
    -> all new mass lands in the top bin and PSI blows past 0.25.
    Empty bins stay finite via add-one smoothing."""
    base = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    same = psi_drift(base, base, "v").collect()
    assert all(r.psi_total < 0.001 for r in same)
    shifted = spark.range(0, 1000).select(
        (F.lit(1000.0) + F.col("id") % 7).alias("v")
    )
    out = psi_drift(base, shifted, "v").collect()
    assert out[0].psi_total > 0.25
    by_bin = {r.bin_id: r for r in out}
    assert by_bin[10].n_new == 1000  # everything above the old 90% cut
    assert all(r.n_new == 0 for r in out if r.bin_id < 10)
    assert all(abs(r.psi_term) < float("inf") for r in out)
