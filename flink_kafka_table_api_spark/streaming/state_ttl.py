"""Per-key state TTL for the update-mode aggregate family (built
round 10, staged for a round-11 gate slot — VERDICT r9 item 7's
"bounded-state guarantees for the update-mode operators").

`streaming/agg_retract.py` materializes a GROUP BY over an upsert
changelog by carrying ONE row per live key forever: correct, but its
state grows with the all-time key universe — the exact failure mode
Flink's `table.exec.state.ttl` / `StateTtlConfig` exists to bound. This
module adds that missing knob: keys whose state has not been touched
within `ttl` are EVICTED from the carried state, the group aggregates
shrink accordingly (emitting the ordinary -U/+U/-D changelog rows), and
a key that returns after eviction restarts from its new row alone —
Flink's documented idle-state-retention semantics (a query "needs a
previously 'forgotten' key -> it is treated as a fresh arrival").

Determinism: Flink's StateTtlConfig clock is processing time, which no
oracle can replay. The deterministic variant implemented here is
EVENT-TIME TTL against the delivered high-watermark — the same
proc-time -> delivered-maximum proxy the repo's proc-time temporal join
uses (`streaming/temporal_join.py`):

    clock_k  = max op_ts delivered through batch k   (monotone)
    cutoff_k = clock_k - ttl
    state_k  = { per-key argmax by (op_ts, op_id) over ops <= k
                 : winner.op_ts > cutoff_k }

Eviction ORDER is merge-then-evict, and that choice is provably
equivalent to the oracle's filter formulation even for late ops
arriving AFTER their key was evicted: cutoffs are monotone
nondecreasing, so the true per-key argmax W either has
W.op_ts > cutoff_k (then W survived every earlier cutoff too, is still
in carried state, and wins the merge) or W.op_ts <= cutoff_k (then any
late-op stand-in the engine carries has op_ts <= W.op_ts <= cutoff_k
and is evicted identically). The invariant is pinned by the
late-op-to-evicted-key fixture in tests/test_state_ttl.py.

The Spark-first state machine is the agg_retract recipe with one extra
stage (foreachBatch, marker-committed, batch-scoped writes published
before the marker — replay is a no-op, a mid-crash batch is scrubbed
and recomputed):

  per micro-batch k:
    1. MERGE:  winners over carried state ∪ batch ops (max_by hash
               aggregate — map-side combine absorbs celebrity keys);
    2. CLOCK:  clock_k = max(clock_{k-1}, batch max op_ts), persisted
               as meta (state alone cannot recover it: eviction
               deletes the very rows that carried the maximum);
    3. EVICT:  drop winners with op_ts <= clock_k - ttl — THE
               bounded-state step: carried state is one row per key
               active within the TTL horizon, not per key ever seen;
    4. AGG+DIFF+PUBLISH: exactly agg_retract stages 2-4.

At 100 TB: the merge shuffles O(batch + horizon-active keys) on the
key, and — unlike the TTL-less sibling — the carried state is bounded
by the churn horizon, so a year-old pipeline pays for its active
window, not its history. This is the guarantee Flink ships as
`table.exec.state.ttl` (idle state retention); the eviction itself is
a filter on the already-shuffled merge output: zero extra shuffles.

Reference anchor: the reference pipeline keeps no cross-record state
(TransactionProcessor.java:134-199, a stateless filter/project chain),
so TTL has no reference twin; the semantics implemented here are
Flink's public StateTtlConfig / table.exec.state.ttl surface
(docs: state backends / idle state retention), expressed Spark-first.

DuckDB oracle: `stream_state_ttl_sql` (queries.py) — per-batch
snapshots under the same cutoff predicate, diffed into the RowKind
changelog (the stream_agg_retract oracle shape plus one WHERE clause).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.agg_retract import (
    OPS_COLUMNS,
    _AGG_SCHEMA,
    _changelog,
    _group_agg,
    _OUT_SCHEMA,
    _STATE_SCHEMA,
    _winners,
)
from flink_kafka_table_api_spark.streaming.chunk_stats import (
    ChunkStats,
    stat_max,
)
from flink_kafka_table_api_spark.streaming.late_data import (
    interval_micros,
    run_concurrently,
    stage_chunked_by,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans


def stream_agg_state_ttl(
    spark: SparkSession,
    ops_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    ttl: str = "12 days",
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """GROUP BY (grp) COUNT/SUM over an upsert/delete changelog with
    event-time state TTL: identical contract to
    :func:`~flink_kafka_table_api_spark.streaming.agg_retract.stream_agg_retract`
    (ops columns op_id, op_ts, key, grp, op in {'U','D'}, value,
    `chunk_col`; returns op/grp/n_keys/total/batch_id), except keys
    idle beyond `ttl` of the delivered high-watermark leave the state
    — and therefore the aggregates. Deterministic given the drop
    boundaries."""
    src = stage_chunked_by(
        ops_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks, columns=OPS_COLUMNS,
    )
    # ttl in exact microseconds (driver-side day-time interval parse,
    # pinned against the SQL interval parser by tests/test_ts_shift.py)
    ttl_us = interval_micros(ttl)
    ckpt = os.path.join(state_dir, "ckpt")
    # per-chunk clock maxima ride ONE staging-time job instead of one
    # agg job per micro-batch (chunk_stats.py; guide §1.2)
    stats = ChunkStats(
        spark, src,
        "op_id long, op_ts timestamp, key long, grp string, "
        "op string, value double",
        {"mx": F.max(F.unix_micros("op_ts"))},
    )
    out_dir = os.path.join(state_dir, "out")
    state_dir_v = os.path.join(state_dir, "state")
    agg_dir = os.path.join(state_dir, "agg")
    meta_dir = os.path.join(state_dir, "meta")
    marker_dir = os.path.join(state_dir, "commits")

    def _read(base: str, batch_id: int, schema: str) -> DataFrame:
        p = os.path.join(base, f"batch-{batch_id}")
        if batch_id < 0 or not os.path.isdir(p):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(p)

    def _clock_after(batch_id: int):
        p = os.path.join(meta_dir, f"batch-{batch_id}.json")
        if batch_id < 0 or not os.path.exists(p):
            return None
        v = json.load(open(p))["clock_us"]
        return None if v is None else int(v)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(meta_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of a committed batch: no-op
        for d in (out_dir, state_dir_v, agg_dir):
            shutil.rmtree(
                os.path.join(d, f"batch-{batch_id}"), ignore_errors=True
            )
        merged = _winners(
            _read(state_dir_v, batch_id - 1, _STATE_SCHEMA)
            .unionByName(batch.select(
                "key", "op_id", "op_ts", "grp", "op", "value"
            ))
        )
        # CLOCK: delivered high-watermark in exact microseconds (one
        # scalar — a documented bounded collect, the idle_watermark.py
        # precedent). The max over THIS batch alone is enough: prev
        # clock already dominates every prior row's op_ts (it is the
        # monotone max over all delivered rows, and carried state is a
        # subset of those), so max(prev_clock, max(batch)) equals the
        # max over the whole merge — the batch-only scan replaces a
        # state+batch scan and lets `merged` flow straight into the
        # eviction filter without its own persist pass. The meta file
        # is load-bearing: eviction removes the rows that carried old
        # maxima, so the clock must be carried OUTSIDE the state.
        # sidecar; in-batch aggregate only if the files don't resolve
        srows = stats.for_batch(ckpt, batch_id)
        mx = (
            batch.agg(F.max(F.unix_micros("op_ts")).alias("m"))
            .first()["m"]
            if srows is None else stat_max(srows, "mx")
        )
        prev_clock = _clock_after(batch_id - 1)
        clock = max(
            (c for c in (prev_clock, mx) if c is not None), default=None
        )
        # EVICT: strict op_ts > clock - ttl (a key exactly AT the
        # cutoff is evicted — Flink clears state whose retention timer
        # has fired). Pure integer-microsecond comparison, exact in
        # both engines (the repo's timestamp-portability rule).
        if clock is None:
            kept = merged
        else:
            kept = merged.filter(
                F.unix_micros("op_ts") > F.lit(clock - ttl_us)
            )
        kept = kept.persist()
        agg = _group_agg(kept).persist()
        prev_agg = _read(agg_dir, batch_id - 1, _AGG_SCHEMA)
        # three independent DAGs over the two persisted frames to
        # DISTINCT paths — overlapped so the batch pays the slowest
        # write, not the sum (guide §2.6; marker still follows all)
        run_concurrently(
            lambda: _changelog(prev_agg, agg, batch_id).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"batch-{batch_id}")),
            lambda: kept.write.mode("overwrite").parquet(
                os.path.join(state_dir_v, f"batch-{batch_id}")
            ),
            lambda: agg.write.mode("overwrite").parquet(
                os.path.join(agg_dir, f"batch-{batch_id}")
            ),
        )
        json.dump(
            {"clock_us": clock},
            open(os.path.join(meta_dir, f"batch-{batch_id}.json"), "w"),
        )
        kept.unpersist()
        agg.unpersist()
        open(marker, "w").close()
        old = batch_id - keep_versions
        if old >= 0:
            for d in (state_dir_v, agg_dir):
                shutil.rmtree(os.path.join(d, f"batch-{old}"),
                              ignore_errors=True)

    stream = (
        spark.readStream
        .schema("op_id long, op_ts timestamp, key long, grp string, "
                "op string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with replan_cached_plans(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _OUT_SCHEMA)
    return (
        spark.read.schema(_OUT_SCHEMA)
        .option("recursiveFileLookup", "true").parquet(out_dir)
        .select("op", "grp", "n_keys", "total", "batch_id")
    )
