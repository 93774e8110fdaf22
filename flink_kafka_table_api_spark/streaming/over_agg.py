"""Event-time OVER aggregation on a stream (built round 8,
registration-bound for a round-9/10 gate slot).

Flink's third aggregation class (after GROUP BY windows and windowing
TVFs) is the OVER window: one output row PER INPUT ROW carrying an
aggregate over the key's preceding event-time range —

    SELECT ..., SUM(value) OVER (PARTITION BY key ORDER BY ts
                                 RANGE BETWEEN INTERVAL '1' DAY
                                 PRECEDING AND CURRENT ROW)

(public Flink SQL surface, "Over Aggregation"; the reference delegates
exactly this class of planning to Flink, TransactionProcessor.java:106).
Spark Structured Streaming has no streaming window functions at all —
`Window.partitionBy(...).orderBy(...)` is batch-only — so this module
implements the operator with the round-8 foreachBatch state machine:

  per micro-batch k (foreachBatch):
    1. ADMIT:   rows with ts > W_{k-1} (the stored watermark); rows at
                or below it are too late — their emission horizon has
                passed — and drop DETERMINISTICALLY (dropped rows still
                advance the watermark: stats upstream of the filter,
                the same contract every sibling module pins);
    2. ADVANCE: W_k = max(ts SEEN through batch k) - delay;
    3. EMIT:    live rows (carried pending + admitted) with ts <= W_k
                are FINAL: any row that could still arrive and land in
                their preceding range would need ts > W_k >= their ts,
                i.e. it could only be in THEIR future. Compute the
                range aggregate over (emitted rows + the carried
                context tail) with ONE batch window function and emit;
    4. CARRY:   context_k = rows already emitted with ts > W_k - range
                (the only history a future row's preceding range can
                reach); pending_k = live rows with ts > W_k (their own
                emission horizon is still open).

Why emitted aggregates are complete: a row e emits at batch k with
e.ts <= W_k. Every admitted row in e's range has ts <= e.ts; it was
admitted at some batch <= k (admission later would require
ts > W_k >= e.ts), so it is in the emit set, the context tail, or the
carried pending of batch k — all three feed the window scan. Rows the
watermark dropped are absent from BOTH the output and other rows'
aggregates, exactly Flink's late-row semantics.

This is Flink's own state shape for OVER windows: per key, the rows
inside the preceding range of the stream head (context) plus the
out-of-orderness buffer (pending). State is bounded by range + lateness
horizon width — never by stream age. Per-batch cost: ONE keyed window
over O(batch + context) rows.

Crash safety: the sibling-module recipe verbatim — every side effect is
a batch-scoped write (emitted/batch-k, context/batch-k, pending/batch-k,
offsets/batch-k.json) published before a last-written marker; replays
of committed batches are no-ops, mid-batch crashes scrub and recompute.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.functions.portable import DEC
from flink_kafka_table_api_spark.streaming.late_data import stage_chunked_by

ROW_COLUMNS = ["row_id", "ts", "key", "value"]
_SCHEMA = "row_id long, ts timestamp, key long, value double"


def over_range_agg(rows: DataFrame, range_seconds: int) -> DataFrame:
    """The batch form of the OVER aggregate both paths share: per row,
    COUNT and DECIMAL-exact SUM over the key's preceding event-time
    range [ts - range, ts] (inclusive both ends, peers included —
    RANGE frame semantics in Spark, DuckDB and Flink alike)."""
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-range_seconds, 0)
    )
    return rows.select(
        *ROW_COLUMNS,
        F.count("*").over(w).cast("long").alias("n_win"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double")
        .alias("sum_win"),
    )


def stream_over_agg(
    spark: SparkSession,
    rows_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    delay: str,
    range_seconds: int,
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """Run the event-time OVER aggregation over `rows_chunked`
    (row_id, ts, key, value, `chunk_col`) staged as `n_chunks`
    micro-batch drops; return every row finalized by the terminal
    watermark with its preceding-range aggregates — bit-identical to
    the batch window function over the watermark-admitted subset
    (the DuckDB oracle in queries.py replays exactly that)."""
    src = stage_chunked_by(
        rows_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks, columns=ROW_COLUMNS,
    )
    emitted_dir = os.path.join(state_dir, "emitted")
    context_dir = os.path.join(state_dir, "context")
    pending_dir = os.path.join(state_dir, "pending")
    marker_dir = os.path.join(state_dir, "commits")
    offsets_dir = os.path.join(state_dir, "offsets")

    def meta_after(batch_id: int) -> dict:
        if batch_id < 0:
            return {"watermark": None, "max_seen": None}
        return json.load(
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"))
        )

    def _read_or_empty(path: str) -> DataFrame:
        if os.path.isdir(path):
            return spark.read.parquet(path)
        return spark.createDataFrame([], _SCHEMA)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(offsets_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed after recovery: already emitted
        for d in (emitted_dir, context_dir, pending_dir):
            shutil.rmtree(
                os.path.join(d, f"batch-{batch_id}"), ignore_errors=True
            )
        prev = meta_after(batch_id - 1)
        batch = batch.select(*ROW_COLUMNS).persist()
        admitted = (
            batch if prev["watermark"] is None
            else batch.filter(F.col("ts") > prev["watermark"])
        )
        live = _read_or_empty(
            os.path.join(pending_dir, f"batch-{batch_id - 1}")
        ).unionByName(admitted)
        # advance the watermark from everything SEEN
        batch_max = batch.agg(F.max("ts")).first()[0]
        candidates = [
            m for m in (prev["max_seen"], None if batch_max is None
                        else batch_max.isoformat()) if m is not None
        ]
        max_seen = max(candidates) if candidates else None
        new_wm = None
        if max_seen is not None:
            new_wm = spark.sql(
                f"SELECT CAST(TIMESTAMP '{max_seen}' - INTERVAL {delay} "
                "AS STRING)"
            ).first()[0]
        live = live.persist()
        emit = (
            live if new_wm is None
            else live.filter(F.col("ts") <= new_wm)
        )
        pending = (
            live.limit(0) if new_wm is None
            else live.filter(F.col("ts") > new_wm)
        )
        context = _read_or_empty(
            os.path.join(context_dir, f"batch-{batch_id - 1}")
        )
        # ONE keyed window over emit + context; only emit rows leave
        scope = emit.withColumn("__ctx", F.lit(False)).unionByName(
            context.withColumn("__ctx", F.lit(True))
        )
        w = (
            Window.partitionBy("key")
            .orderBy(F.col("ts").cast("long"))
            .rangeBetween(-range_seconds, 0)
        )
        out = (
            scope.select(
                *ROW_COLUMNS, "__ctx",
                F.count("*").over(w).cast("long").alias("n_win"),
                F.sum(F.col("value").cast(DEC)).over(w).cast("double")
                .alias("sum_win"),
            )
            .filter(~F.col("__ctx"))
            .drop("__ctx")
        )
        out.write.mode("overwrite").parquet(
            os.path.join(emitted_dir, f"batch-{batch_id}")
        )
        # context tail: emitted rows a future row's range can still reach
        new_context = context.unionByName(emit)
        if new_wm is not None:
            horizon = spark.sql(
                f"SELECT CAST(TIMESTAMP '{new_wm}' - INTERVAL "
                f"{range_seconds} SECONDS AS STRING)"
            ).first()[0]
            new_context = new_context.filter(F.col("ts") > horizon)
        new_context.write.mode("overwrite").parquet(
            os.path.join(context_dir, f"batch-{batch_id}")
        )
        pending.write.mode("overwrite").parquet(
            os.path.join(pending_dir, f"batch-{batch_id}")
        )
        json.dump(
            {"watermark": new_wm, "max_seen": max_seen},
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"), "w"),
        )
        live.unpersist()
        batch.unpersist()
        open(marker, "w").close()
        # bounded state tails (emitted batch dirs are the result sink
        # and stay)
        old = batch_id - keep_versions
        if old >= 0:
            for d in (context_dir, pending_dir):
                shutil.rmtree(
                    os.path.join(d, f"batch-{old}"), ignore_errors=True
                )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(emitted_dir):
        return spark.createDataFrame(
            [], _SCHEMA + ", n_win long, sum_win double"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(
        emitted_dir
    )
