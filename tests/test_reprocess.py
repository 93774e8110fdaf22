"""Selective reprocessing (`streaming/reprocess.py`, round 8): reset a
marker-protocol pipeline to drop K and re-run — batches < K no-op via
their markers (their published files are untouched, byte-for-byte),
batches >= K recompute against the surviving prefix state, and the final
result is identical to the original run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.streaming.reprocess import reset_from
from flink_kafka_table_api_spark.streaming.temporal_join import (
    stream_temporal_join,
)

SF = "/root/testdata/sf0.001"


def _fixture(spark):
    ev = read_table(spark, SF, "events")
    d0 = ev.agg(F.min(F.to_date("ts"))).first()[0]
    natural = F.least(
        F.floor(F.datediff(F.to_date("ts"), F.lit(d0)) / F.lit(10))
        .cast("long"), F.lit(2),
    )
    ops = ev.select(
        F.col("event_id").alias("op_id"),
        F.col("ts").cast("timestamp").alias("op_ts"),
        F.col("user_id").alias("key"),
        F.when(F.col("event_type") == "error", "D").otherwise("U")
        .alias("op"),
        "value", natural.alias("__chunk"),
    )
    probes = ev.select(
        F.col("event_id").alias("probe_id"),
        F.col("ts").cast("timestamp").alias("probe_ts"),
        F.col("user_id").alias("key"),
        natural.alias("__chunk"),
    )
    return ops, probes


def _run(spark, state):
    ops, probes = _fixture(spark)
    return stream_temporal_join(
        spark, ops, probes, state, n_chunks=3, delay="2 days",
    )


def _file_state(d):
    return sorted(
        (os.path.relpath(os.path.join(r, f), d),
         os.path.getmtime(os.path.join(r, f)))
        for r, _, fs in os.walk(d) for f in fs
    )


def test_reset_from_recomputes_only_the_tail(spark, tmp_path):
    state = str(tmp_path / "reproc")
    want = sorted(tuple(r) for r in _run(spark, state).collect())

    before_b0 = _file_state(os.path.join(state, "out", "batch_id=0"))
    removed = reset_from(state, 1)
    # markers 1,2; offsets 1,2; state versions 1,2; out partitions 1,2
    assert removed["markers"] == 2 and removed["offsets"] == 2
    assert removed["partitions"] == 2 and removed["checkpoint"] == 1
    assert not os.path.exists(os.path.join(state, "out", "batch_id=2"))
    assert os.path.isdir(os.path.join(state, "out", "batch_id=0"))

    got = sorted(tuple(r) for r in _run(spark, state).collect())
    assert got == want
    # batch 0 was NOT recomputed: its published files are untouched
    assert _file_state(os.path.join(state, "out", "batch_id=0")) == before_b0
    # batches 1,2 exist again
    assert os.path.isdir(os.path.join(state, "out", "batch_id=2"))


def test_reset_from_zero_is_full_rebuild(spark, tmp_path):
    state = str(tmp_path / "reproc0")
    want = sorted(tuple(r) for r in _run(spark, state).collect())
    removed = reset_from(state, 0)
    assert removed["markers"] == 3
    got = sorted(tuple(r) for r in _run(spark, state).collect())
    assert got == want
