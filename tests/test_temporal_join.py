"""Processing-time temporal join against the CDC-maintained dimension
(`streaming/temporal_join.py`, built round 8, registration-bound for
round 9/10): probe drops enriched FOR SYSTEM_TIME AS OF their own batch
against the changelog-applied snapshot. Pre-validated against a DuckDB
replay (admission + per-probe argmax over aligned drops) and hand-built
fixtures for the joins that matter: same-drop visibility, tombstone ->
NULL, late-but-admitted ops that must NOT shadow newer state, too-late
ops never visible, re-insert, crash replay, committed-replay no-op."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.queries import stream_temporal_join_sql
from flink_kafka_table_api_spark.streaming.temporal_join import (
    stream_temporal_join,
)

SF = "/root/testdata/sf0.001"


def _ops(spark, rows):
    """rows: (chunk, op_id, 'ts string', key, op, value)"""
    return spark.createDataFrame(
        rows, "c int, op_id long, op_ts string, key long, op string, "
              "value double",
    ).select(
        "op_id", F.to_timestamp("op_ts").alias("op_ts"), "key", "op",
        "value", F.col("c").alias("__chunk"),
    )


def _probes(spark, rows):
    """rows: (chunk, probe_id, 'ts string', key)"""
    return spark.createDataFrame(
        rows, "c int, probe_id long, probe_ts string, key long",
    ).select(
        "probe_id", F.to_timestamp("probe_ts").alias("probe_ts"), "key",
        F.col("c").alias("__chunk"),
    )


def test_temporal_visibility_semantics(spark, tmp_path):
    """One probe per contract clause:
      101: same-drop op IS visible (ops drop k applies before probes k);
      102: never-seen key -> NULL;
      103: tombstoned key -> NULL;
      104: late-but-admitted OLDER op must not shadow newer state
           (probe still sees op 12's value);
      105: too-late op (below the lagged watermark) never visible;
      106: re-inserted key -> new value."""
    ops = [
        (0, 10, "2024-01-09 10:00:00", 1, "U", 1.0),
        (0, 12, "2024-01-09 11:00:00", 2, "U", 2.0),
        (1, 13, "2024-01-09 12:00:00", 1, "D", 0.0),
        (1, 14, "2024-01-09 09:00:00", 2, "U", 9.9),   # admitted, older
        (1, 15, "2024-01-05 00:00:00", 4, "U", 7.0),   # too late: dropped
        (2, 16, "2024-01-09 13:00:00", 1, "U", 5.0),   # re-insert
    ]
    probes = [
        (0, 101, "2024-01-09 10:30:00", 1),
        (0, 102, "2024-01-09 10:30:00", 3),
        (1, 103, "2024-01-09 12:30:00", 1),
        (1, 104, "2024-01-09 12:30:00", 2),
        (1, 105, "2024-01-09 12:30:00", 4),
        (2, 106, "2024-01-09 13:30:00", 1),
    ]
    out = stream_temporal_join(
        spark, _ops(spark, ops), _probes(spark, probes),
        str(tmp_path / "tj"), n_chunks=3, delay="2 days",
    )
    got = {r.probe_id: (r.dim_value, r.dim_op_id) for r in out.collect()}
    assert got == {
        101: (1.0, 10), 102: (None, None), 103: (None, None),
        104: (2.0, 12), 105: (None, None), 106: (5.0, 16),
    }


def _events_fixture(spark):
    """Testdata construction the round-9/10 registration will use: the
    events changelog (the cdc_apply rule: key=user_id, 'error'=delete,
    day-tercile chunks with %37/%61 late shifts) probed by the events
    themselves in NATURAL day terciles."""
    ev = read_table(spark, SF, "events")
    d0 = ev.agg(F.min(F.to_date("ts"))).first()[0]
    d_idx = F.datediff(F.to_date("ts"), F.lit(d0))
    natural = F.least(F.floor(d_idx / F.lit(10)).cast("long"), F.lit(2))
    shift = (
        F.when(F.col("event_id") % 61 == 0, F.lit(2))
        .when(F.col("event_id") % 37 == 0, F.lit(1))
        .otherwise(F.lit(0))
    )
    ops = ev.select(
        F.col("event_id").alias("op_id"),
        F.col("ts").cast("timestamp").alias("op_ts"),
        F.col("user_id").alias("key"),
        F.when(F.col("event_type") == "error", "D").otherwise("U")
        .alias("op"),
        "value",
        F.least(natural + shift, F.lit(2)).alias("__chunk"),
    )
    probes = ev.select(
        F.col("event_id").alias("probe_id"),
        F.col("ts").cast("timestamp").alias("probe_ts"),
        F.col("user_id").alias("key"),
        natural.alias("__chunk"),
    )
    return ops, probes


# The processing-time replay moved to queries.py for the round-9
# registration; ORACLE_SQL_EVENT below stays test-only (the
# semantics='event' variant is not a registered gate form).
ORACLE_SQL = stream_temporal_join_sql()


def test_oracle_parity_on_testdata(spark, tmp_path):
    ops, probes = _events_fixture(spark)
    out = stream_temporal_join(
        spark, ops, probes, str(tmp_path / "tjdata"),
        n_chunks=3, delay="2 days",
    )
    got = sorted(tuple(str(x) for x in r) for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    exp = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(ORACLE_SQL).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # live signals: some probes enriched, some NULL (tombstones/unseen),
    # and at least one NULL comes from a real 'error' tombstone
    n_null = sum(1 for r in got if r[3] == "None")
    assert 0 < n_null < len(got)


def test_event_time_visibility_semantics(spark, tmp_path):
    """EVENT-TIME mode: each probe sees the dimension AS OF its own
    probe_ts, not its batch:
      201: probe_ts BEFORE the same-drop op -> NULL (proc-time mode
           would see it);
      202: probe_ts after the op -> enriched;
      203: later-drop probe with probe_ts before the delete -> still
           sees the PRE-delete version (time travel into the history);
      204: probe_ts after the delete -> NULL;
      205: late-but-ADMITTED op (older op_ts, later drop) IS visible to
           a same-or-later-drop probe with probe_ts >= its op_ts."""
    ops = [
        (0, 10, "2024-01-09 10:00:00", 1, "U", 1.0),
        (1, 11, "2024-01-09 11:00:00", 1, "D", 0.0),
        (1, 14, "2024-01-09 09:00:00", 2, "U", 9.9),   # late, admitted
        (2, 15, "2024-01-09 12:00:00", 9, "U", 3.0),   # keeps wm moving
    ]
    probes = [
        (0, 201, "2024-01-09 09:30:00", 1),
        (0, 202, "2024-01-09 10:30:00", 1),
        (1, 203, "2024-01-09 10:30:00", 1),
        (1, 204, "2024-01-09 11:30:00", 1),
        (1, 205, "2024-01-09 09:30:00", 2),
        (2, 206, "2024-01-09 12:30:00", 9),
    ]
    out = stream_temporal_join(
        spark, _ops(spark, ops), _probes(spark, probes),
        str(tmp_path / "tje"), n_chunks=3, delay="2 days",
        semantics="event",
    )
    got = {r.probe_id: (r.dim_value, r.dim_op_id) for r in out.collect()}
    assert got == {
        201: (None, None), 202: (1.0, 10), 203: (1.0, 10),
        204: (None, None), 205: (9.9, 14), 206: (3.0, 15),
    }


ORACLE_SQL_EVENT = """
WITH base AS (
  SELECT event_id, ts, user_id, event_type, value,
         datediff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events),
                  CAST(ts AS DATE)) AS d_idx
  FROM events
),
ops AS (
  SELECT event_id AS op_id, ts AS op_ts, user_id AS key,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value,
         LEAST(LEAST(CAST(d_idx // 10 AS BIGINT), 2)
           + (CASE WHEN event_id % 61 = 0 THEN 2
                   WHEN event_id % 37 = 0 THEN 1 ELSE 0 END), 2) AS chunk
  FROM base
),
mx AS (SELECT chunk, MAX(op_ts) AS mts FROM ops GROUP BY chunk),
adm AS (
  SELECT o.* FROM ops o
  WHERE o.op_ts > COALESCE(
    (SELECT MAX(m.mts) FROM mx m WHERE m.chunk < o.chunk)
      - INTERVAL 2 DAY,
    TIMESTAMP '1970-01-01')
),
probes AS (
  SELECT event_id AS probe_id, ts AS probe_ts, user_id AS key,
         LEAST(CAST(d_idx // 10 AS BIGINT), 2) AS pk
  FROM base
),
cand AS (
  SELECT p.probe_id, a.op, a.value, a.op_id,
         row_number() OVER (PARTITION BY p.probe_id
                            ORDER BY a.op_ts DESC, a.op_id DESC) AS rn
  FROM probes p JOIN adm a
    ON a.key = p.key AND a.chunk <= p.pk AND a.op_ts <= p.probe_ts
),
win AS (
  SELECT probe_id,
         CASE WHEN op <> 'D' THEN value END AS dim_value,
         CASE WHEN op <> 'D' THEN op_id END AS dim_op_id
  FROM cand WHERE rn = 1
)
SELECT p.probe_id, p.probe_ts, p.key, w.dim_value, w.dim_op_id,
       CAST(p.pk AS BIGINT) AS batch_id
FROM probes p LEFT JOIN win w ON w.probe_id = p.probe_id
"""


def test_event_time_oracle_parity_on_testdata(spark, tmp_path):
    ops, probes = _events_fixture(spark)
    out = stream_temporal_join(
        spark, ops, probes, str(tmp_path / "tjedata"),
        n_chunks=3, delay="2 days", semantics="event",
    )
    got = sorted(tuple(str(x) for x in r) for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    exp = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(ORACLE_SQL_EVENT).fetchall()
    )
    assert len(got) == len(exp) > 0
    assert got == exp
    # the two semantics genuinely differ on this corpus: a probe whose
    # ts precedes a same-drop op enriches differently
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    proc = sorted(
        tuple(str(x) for x in r)
        for r in con2.execute(ORACLE_SQL).fetchall()
    )
    assert proc != exp


@pytest.mark.parametrize("semantics", ["processing", "event"])
def test_crash_mid_batch_replays_clean(spark, tmp_path, semantics):
    ops, probes = _events_fixture(spark)
    state = str(tmp_path / f"tjcrash_{semantics}")
    out = stream_temporal_join(
        spark, ops, probes, state, n_chunks=3, delay="2 days",
        semantics=semantics,
    )
    want = sorted(tuple(r) for r in out.collect())
    # crash between the output publish and the marker of the last batch
    os.remove(os.path.join(state, "commits", "batch-2"))
    os.remove(os.path.join(state, "offsets", "batch-2.json"))
    shutil.rmtree(os.path.join(state, "ckpt"))
    out2 = stream_temporal_join(
        spark, ops, probes, state, n_chunks=3, delay="2 days",
        semantics=semantics,
    )
    assert sorted(tuple(r) for r in out2.collect()) == want


def test_replay_of_committed_batches_is_a_noop(spark, tmp_path):
    ops, probes = _events_fixture(spark)
    state = str(tmp_path / "tjreplay")
    out = stream_temporal_join(
        spark, ops, probes, state, n_chunks=3, delay="2 days",
    )
    want = sorted(tuple(r) for r in out.collect())
    shutil.rmtree(os.path.join(state, "ckpt"))
    out2 = stream_temporal_join(
        spark, ops, probes, state, n_chunks=3, delay="2 days",
    )
    got = sorted(tuple(r) for r in out2.collect())
    assert got == want  # not double-published


def test_asof_enrich_plan_is_one_keyed_window_no_join(spark):
    """The event-time lookup must plan as UNION + ONE keyed window
    (the asof_join_last shape) with NO join node at all: the previous
    keyed-join + argmax shape paid |probes_hot| x |ops_hot| candidate
    pairs on a zipf-hot key before the aggregate — quadratic in key
    hotness. The window shape is O(P + V) per key outright."""
    from flink_kafka_table_api_spark.streaming.temporal_join import (
        asof_enrich,
    )

    ops, probes = _events_fixture(spark)
    history = ops.select("op_id", "op_ts", "key", "op", "value")
    plan = (
        asof_enrich(probes.drop("__chunk"), history)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan
    # the union collapses BELOW the shuffle: ONE key exchange total
    assert plan.count("Exchange") == 1


def test_changelog_winners_is_partial_aggregate(spark):
    """The per-batch ops reduce must be a partial-final hash aggregate
    (map-side combine before the key shuffle), never a window sort."""
    from flink_kafka_table_api_spark.streaming.cdc_apply import (
        changelog_winners,
    )

    ops, _ = _events_fixture(spark)
    plan = (
        changelog_winners(ops.withColumn("__n", F.lit(1)), "__n")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial" in plan.lower()
