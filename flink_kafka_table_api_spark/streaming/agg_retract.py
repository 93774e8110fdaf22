"""Retract-mode GROUP BY aggregation over an UPDATE stream (built
round 9, staged for a round-10 gate slot — with `streaming/retract.py`
this completes Flink's update-mode query class).

`streaming/retract.py` ranks an APPEND stream's running sums;
`streaming/cdc_apply.py` materializes an update stream's current rows.
The class still missing between them is Flink's

    SELECT grp, COUNT(*), SUM(value) FROM upsert_stream GROUP BY grp

— a GROUP BY whose INPUT is itself an update stream (RowKind changelog
/ upsert-kafka source), so arriving rows do not just add: a key's new
version must RETRACT its old contribution from its old group's
aggregate and add to the new one, and a delete must subtract. Flink
routes this through retraction handling in the aggregate operator
(public Table API semantics: updating sources make downstream
aggregates update-mode); append-style folding is simply wrong here —
pinned by the regroup fixture below. The output is again a RowKind
changelog (+I / -U / +U / -D), since group rows appear, change, and
disappear as keys move between groups.

The Spark-first state machine (foreachBatch, marker-committed — the
sibling recipe):

  per micro-batch k:
    1. MERGE:  winners_k = per-key argmax by (op_ts, op_id) over
               carried winners_{k-1} ∪ the batch's ops — delete
               tombstones RIDE ALONG (the cdc_apply seed rule: a late
               op older than a tombstone must lose to it);
    2. AGG:    agg_k = per-grp (n_keys, DECIMAL(25,6) sum of value)
               over LIVE winners (op <> 'D') — each key contributes
               exactly its CURRENT version to exactly its CURRENT
               group: retraction is implicit in aggregating state
               instead of deltas, costing one hash aggregate of
               O(live keys) state (Flink pays the same state, held in
               the aggregate operator's accumulators);
    3. DIFF:   changelog(agg_{k-1} -> agg_k): groups appearing emit
               +I, disappearing emit -D (old row), changing emit -U
               (old) then +U (new) — |groups|-sized full-outer join;
    4. PUBLISH state/batch-k + agg/batch-k + out/batch_id=k, marker
               LAST (replay no-op, mid-crash scrub + recompute).

A consumer applying the changelog in (batch_id, op) order materializes
exactly the batch GROUP BY of the current state (pinned by replay in
tests). Determinism: no watermark here — admission/lateness is proved
separately (cdc_apply, stream_late_events); given drop boundaries the
ops are a pure function of per-batch cumulative argmax state, so the
DuckDB oracle rebuilds per-batch snapshots and diffs them.

At 100 TB: state is one row per live key (Flink's ValueState), the
per-batch merge shuffles O(batch + touched state) rows on the key, the
aggregate is map-side-combined per grp, and the diff is |groups| rows.
Nothing re-reads the stream; nothing is O(stream age).

Reference anchor: the reference pipeline's insert-only aggregation is
the degenerate case of this operator (TransactionProcessor.java:192 —
append stream, no retraction); the update-mode semantics generalized
here are Flink's public toChangelogStream/toRetractStream surface.

DuckDB oracle: `stream_agg_retract_sql` (queries.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.late_data import (
    run_concurrently,
    stage_chunked_by,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

OPS_COLUMNS = ["op_id", "op_ts", "key", "grp", "op", "value"]
_STATE_SCHEMA = (
    "key long, op_id long, op_ts timestamp, grp string, op string, "
    "value double"
)
_AGG_SCHEMA = "grp string, n_keys long, total decimal(25,6)"
_OUT_SCHEMA = (
    "op string, grp string, n_keys long, total double, batch_id long"
)


def _winners(ops: DataFrame) -> DataFrame:
    """Per-key argmax by (op_ts, op_id) as a max_by HASH aggregate (the
    cdc_apply recipe) — partial-agg friendly, so a celebrity key
    combines map-side instead of sorting its whole history in one task
    (a row_number window would be sort-based)."""
    pick = F.max_by(
        F.struct("op_id", "op_ts", "grp", "op", "value"),
        F.struct("op_ts", "op_id"),
    ).alias("__w")
    return ops.groupBy("key").agg(pick).select(
        "key", "__w.op_id", "__w.op_ts", "__w.grp", "__w.op",
        "__w.value",
    )


def _group_agg(winners: DataFrame) -> DataFrame:
    return (
        winners.filter(F.col("op") != "D")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("decimal(25,6)").alias("total"),
        )
    )


def _changelog(prev: DataFrame, cur: DataFrame, batch_id: int) -> DataFrame:
    o = prev.select(
        F.col("grp"), F.col("n_keys").alias("__on"),
        F.col("total").alias("__ot"),
    )
    n = cur.select(
        F.col("grp"), F.col("n_keys").alias("__nn"),
        F.col("total").alias("__nt"),
    )
    j = o.join(n, "grp", "full_outer")
    ins = j.filter(F.col("__on").isNull()).select(
        F.lit("+I").alias("op"), "grp",
        F.col("__nn").alias("n_keys"),
        F.col("__nt").cast("double").alias("total"),
    )
    dels = j.filter(F.col("__nn").isNull()).select(
        F.lit("-D").alias("op"), "grp",
        F.col("__on").alias("n_keys"),
        F.col("__ot").cast("double").alias("total"),
    )
    chg = j.filter(
        F.col("__on").isNotNull() & F.col("__nn").isNotNull()
        & ((F.col("__on") != F.col("__nn"))
           | (F.col("__ot") != F.col("__nt")))
    )
    ret = chg.select(
        F.lit("-U").alias("op"), "grp",
        F.col("__on").alias("n_keys"),
        F.col("__ot").cast("double").alias("total"),
    )
    upd = chg.select(
        F.lit("+U").alias("op"), "grp",
        F.col("__nn").alias("n_keys"),
        F.col("__nt").cast("double").alias("total"),
    )
    return (
        ins.unionByName(ret).unionByName(upd).unionByName(dels)
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
    )


def stream_agg_retract(
    spark: SparkSession,
    ops_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """GROUP BY (grp) COUNT/SUM over an upsert/delete changelog
    (`ops_chunked`: op_id, op_ts, key, grp, op in {'U','D'}, value,
    `chunk_col`) delivered as `n_chunks` drops; returns the RowKind
    changelog (op, grp, n_keys, total, batch_id) whose application in
    (batch_id, op) order materializes each batch's group aggregates of
    the CURRENT key state. Deterministic given the drop boundaries."""
    src = stage_chunked_by(
        ops_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks, columns=OPS_COLUMNS,
    )
    out_dir = os.path.join(state_dir, "out")
    state_dir_v = os.path.join(state_dir, "state")
    agg_dir = os.path.join(state_dir, "agg")
    marker_dir = os.path.join(state_dir, "commits")

    def _read(base: str, batch_id: int, schema: str) -> DataFrame:
        p = os.path.join(base, f"batch-{batch_id}")
        if batch_id < 0 or not os.path.isdir(p):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(p)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
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
        ).persist()
        agg = _group_agg(merged).persist()
        prev_agg = _read(agg_dir, batch_id - 1, _AGG_SCHEMA)
        # three independent DAGs over the two persisted frames to
        # DISTINCT paths — overlapped so the batch pays the slowest
        # write, not the sum (guide §2.6; marker still follows all)
        run_concurrently(
            lambda: _changelog(prev_agg, agg, batch_id).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"batch-{batch_id}")),
            lambda: merged.write.mode("overwrite").parquet(
                os.path.join(state_dir_v, f"batch-{batch_id}")
            ),
            lambda: agg.write.mode("overwrite").parquet(
                os.path.join(agg_dir, f"batch-{batch_id}")
            ),
        )
        merged.unpersist()
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
            .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
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


def apply_changelog(log: DataFrame) -> DataFrame:
    """Materialize the changelog a consumer would: the last +I/+U row
    per group not followed by -D — used by tests to pin that applying
    the log reproduces the final GROUP BY exactly."""
    w = Window.partitionBy("grp").orderBy(
        F.col("batch_id").desc(),
        # within a batch: -U precedes +U; apply order +I/+U last
        F.when(F.col("op").isin("+I", "+U"), 1).otherwise(0).desc(),
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("op").isin("+I", "+U"))
        .select("grp", "n_keys", "total")
    )
