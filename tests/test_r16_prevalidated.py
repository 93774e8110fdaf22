"""Round-16 pre-validated operators (the staging pattern, rounds
ahead): holt_forecast (Holt's linear-trend smoothing with one-step
backtest), acf_audit (Box-Jenkins sample autocorrelation with the
white-noise band), and snapshot_diff (corpus version CDC by portable
fingerprint under a full-outer id join). Each pinned against its
DuckDB oracle over the real sf0.001 tables plus targeted behavior
fixtures."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.timeseries as tsops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


# ---------------------------------------------------------------------------
# holt_forecast
# ---------------------------------------------------------------------------

def test_holt_forecast_oracle_parity_on_testdata(spark, con):
    from flink_kafka_table_api_spark.catalog import read_table

    ev = read_table(spark, SF, "events")
    got = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in tsops.holt_forecast(ev).collect()
    )
    exp = sorted(
        (r[0], str(r[1]), *r[2:])
        for r in con.execute(tsops.holt_forecast_sql()).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # first day per group: no forecast yet (NULL, not fabricated)
    firsts = [r for r in got if r[5] is None]
    assert len(firsts) == len({r[0] for r in got})


def test_holt_forecast_tracks_linear_trend(spark):
    """On a clean linear ramp the trend component converges toward the
    slope and the one-step error shrinks — the property a level-only
    smoother (or a mean model) cannot have."""
    rows, eid = [], 0
    base = dt.datetime(2024, 4, 1)
    for day in range(30):
        for _ in range(10 + 2 * day):  # slope 2/day
            rows.append((eid, base + dt.timedelta(days=day), "ramp"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = sorted(
        (str(r.day), r.trend, r.abs_err)
        for r in tsops.holt_forecast(df).collect()
    )
    # late trend estimate close to the true slope 2
    assert abs(out[-1][1] - 2.0) < 0.3
    # late one-step errors much smaller than early ones
    early = [e for _, _, e in out[1:6] if e is not None]
    late = [e for _, _, e in out[-5:] if e is not None]
    assert sum(late) / len(late) < sum(early) / len(early)


# ---------------------------------------------------------------------------
# acf_audit
# ---------------------------------------------------------------------------

def test_acf_audit_oracle_parity_on_testdata(spark, con):
    from flink_kafka_table_api_spark.catalog import read_table

    ev = read_table(spark, SF, "events")
    got = sorted(tuple(r) for r in tsops.acf_audit(ev).collect())
    exp = sorted(
        tuple(r) for r in con.execute(tsops.acf_audit_sql()).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    assert all(-1.0 <= r[3] <= 1.0 for r in got if r[3] is not None)


def test_acf_audit_detects_weekly_cycle_and_guards_constant(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 4, 1)
    for day in range(28):
        # 'weekly': strong period-7 cycle; 'flat': constant
        for _ in range(20 if day % 7 == 0 else 5):
            rows.append((eid, base + dt.timedelta(days=day), "weekly"))
            eid += 1
        for _ in range(6):
            rows.append((eid, base + dt.timedelta(days=day), "flat"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {(r.event_type, r.lag): r for r in tsops.acf_audit(df).collect()}
    assert out[("weekly", 7)].acf > 0.5 and out[("weekly", 7)].significant
    assert out[("weekly", 1)].acf < 0.5
    # constant series: variance 0 -> NULL acf, surfaced not fabricated
    assert out[("flat", 1)].acf is None
    assert out[("flat", 1)].significant is None


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def _snapshots(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 != 5).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 3,
            F.concat(F.col("text"), F.lit(" v2")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return old, new


_OLD_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 7"
_NEW_SQL = (
    "SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN text || ' v2' "
    "ELSE text END AS text FROM documents WHERE doc_id % 10 != 5"
)


def test_snapshot_diff_oracle_parity_on_testdata(spark, con):
    old, new = _snapshots(spark)
    got = sorted(tuple(r) for r in cu.snapshot_diff(old, new).collect())
    exp = sorted(
        tuple(r)
        for r in con.execute(
            cu.snapshot_diff_sql(_OLD_SQL, _NEW_SQL)
        ).fetchall()
    )
    assert len(got) == 500
    assert got == exp
    from collections import Counter

    by = Counter(r[1] for r in got)
    assert by == {
        "unchanged": 350, "changed": 50, "removed": 50, "added": 50
    }


def test_snapshot_diff_fingerprint_semantics(spark):
    """Same text => unchanged even if other columns move; any text
    byte change => changed; ids only on one side classify by side."""
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta!"), (4, "delta")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in cu.snapshot_diff(old, new).collect()}
    assert out[1].status == "unchanged" and out[1].old_fp == out[1].new_fp
    assert out[2].status == "changed" and out[2].old_fp != out[2].new_fp
    assert out[3].status == "removed" and out[3].new_fp is None
    assert out[4].status == "added" and out[4].old_fp is None


def test_r16_operators_empty_input_and_partitioning_invariance(spark):
    """Empty frames yield empty results, never throw; fold-carrying
    operators are invariant to input partitioning (the r8/r19-20
    hardening bar)."""
    from flink_kafka_table_api_spark.catalog import read_table
    from flink_kafka_table_api_spark.operators.curation import (
        snapshot_diff,
    )

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string"
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert tsops.holt_forecast(empty_ev).count() == 0
    assert tsops.acf_audit(empty_ev).count() == 0
    assert snapshot_diff(empty_docs, empty_docs).count() == 0

    ev = read_table(spark, SF, "events")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, tsops.holt_forecast(ev).collect()))
    b = sorted(map(tuple, tsops.holt_forecast(ev.repartition(7)).collect()))
    assert a == b
    a = sorted(map(tuple, tsops.acf_audit(ev).collect()))
    b = sorted(map(tuple, tsops.acf_audit(ev.repartition(7)).collect()))
    assert a == b
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 3 != 1")
    a = sorted(map(tuple, snapshot_diff(old, new).collect()))
    b = sorted(map(tuple, snapshot_diff(
        old.repartition(5), new.repartition(7)).collect()))
    assert a == b
