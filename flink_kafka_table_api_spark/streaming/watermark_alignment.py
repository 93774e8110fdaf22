"""Watermark ALIGNMENT across sources (built round 9, staged for a
round-10 gate slot — the throttling complement of
`streaming/idle_watermark.py`'s idleness handling; together they cover
Flink's multi-source watermark toolbox).

Flink's watermark alignment (public docs / FLIP-182,
`withWatermarkAlignment(group, maxAllowedWatermarkDrift, ...)`) solves
the opposite problem from idleness: a source that runs AHEAD of the
group forces every watermark-bounded operator to buffer its rows until
the stragglers catch up — unbounded state growth from a fast source.
Aligned sources PAUSE consuming when their local watermark exceeds the
group's minimum by more than the allowed drift, and resume as the group
advances. Nothing is dropped; rows are deferred.

The deterministic micro-batch twin, on the repo's foreachBatch
state-machine recipe (throttling is made replayable at drop
boundaries, the same determinism trade every sibling module makes):

  per micro-batch k (foreachBatch):
    1. AVAIL:   this drop's rows — minus FRESH arrivals already behind
                the aligned watermark (ts <= W_{k-1}: the standard
                lateness contract, which is what makes every emitted
                window FINAL; alignment by itself only throttles and
                says nothing about finality) — plus the carried
                DEFERRED backlog (deferred rows were accepted when they
                arrived and are never re-judged: their ts exceeded an
                admission ceiling, so they cannot be late);
    2. GATE:    admission ceiling A_k = min over seen sources of
                M_{s,k-1} + drift, where M_{s,k-1} = max ts of s's rows
                ADMITTED through batch k-1 (batch 0 is unthrottled:
                alignment activates once watermarks exist, and the
                first drop IS the first watermark report — Flink's
                first records likewise flow before alignment kicks in);
                sources never seen do not constrain the min (the
                idle_watermark rule — a source that has not spoken
                cannot hold the group);
    3. TAKE:    each source admits its available rows with ts <= A_k;
                the rest carry to batch k+1 (DEFERRED, never dropped —
                alignment throttles, lateness policy is a different
                operator);
    4. MERGE:   admitted rows fold into per-(source, window) DECIMAL
                partials (the idle_watermark pending-store shape);
    5. EMIT:    aligned watermark W_k = min over seen sources of
                M_{s,k} - delay; a pending window leaves the store
                tagged batch_id = k when W_k >= window_end AND none of
                its rows are still deferred (max admit batch <= k —
                both conditions replayed by the oracle as
                max(first k with W_k >= end, last admit batch));
                everything else flushes as batch_id = n_chunks;
    6. PUBLISH: out/batch-k + deferred/batch-k + wm/batch-k.json,
                marker LAST (the sibling crash contract).

What the gate form observes: the 'click' source delivers its ENTIRE
30-day range in drop 0 (a firehose source); with drift = 3 days its
far-future rows defer across batches until the other sources' maxima
advance — the per-window batch_id shifts relative to an unthrottled
run, and the deferred-backlog row counts per batch are the throttle
trace (`load_deferred_counts`).

At 100 TB: the deferred store materializes exactly the backlog Flink
would leave sitting IN the paused source partition (the batch-twin
trade `event_temporal_join` makes for buffered probes); its size is
bounded by how far ahead a source runs within one drop, and the
per-batch work is one keyed partial aggregate + a union-fold merge —
never O(stream age).

Reference anchor: same lifecycle generalization as idle_watermark
(TransactionProcessor.java:192,215-223); the alignment rule itself is
Flink's public FLIP-182 / withWatermarkAlignment surface.

DuckDB oracle: `stream_watermark_alignment_sql` (queries.py) unrolls
the three batch layers (A_1 from batch-0 maxima, A_2 from batch-1
maxima) so each row's admit batch is a CASE over its ts against the
A-ceilings, then replays windowing and the two-condition emission rule
relationally.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.idle_watermark import (
    _PENDING_SCHEMA,
    merge_pending,
    window_partials,
)
from flink_kafka_table_api_spark.streaming.late_data import (
    run_concurrently,
    stage_chunked_by,
    ts_shift,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

_ROWS_SCHEMA = "source string, ts timestamp, value double"


def stream_watermark_alignment(
    spark: SparkSession,
    rows_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    delay: str,
    drift: str,
    window: str = "1 day",
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """Tumbling per-(source, window) aggregation of a multi-source
    stream under watermark ALIGNMENT: a source's rows admit only while
    its event time is within `drift` of the group's minimum admitted
    maximum; rows beyond defer to later batches (never dropped).
    Returns (source, window_start, window_end, n_events, sum_value,
    batch_id) with batch_id = the batch that could finally emit the
    window (aligned watermark passed AND no row still deferred);
    n_chunks = terminal flush. Deterministic given the drop
    boundaries."""
    src = stage_chunked_by(
        rows_chunked.select(
            F.col(source_col).alias("source"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(value_col).cast("double").alias("value"),
            F.col(chunk_col).alias("__chunk"),
        ),
        os.path.join(state_dir, "src"),
        chunk_col="__chunk", n_chunks=n_chunks,
        columns=["source", "ts", "value"],
    )
    out_dir = os.path.join(state_dir, "out")
    pend_dir = os.path.join(state_dir, "pending")
    defer_dir = os.path.join(state_dir, "deferred")
    wm_dir = os.path.join(state_dir, "wm")
    marker_dir = os.path.join(state_dir, "commits")

    def _meta_after(batch_id: int) -> dict:
        p = os.path.join(wm_dir, f"batch-{batch_id}.json")
        if batch_id < 0 or not os.path.exists(p):
            return {"max_admitted": {}}
        return json.load(open(p))

    def _read_store(base: str, batch_id: int, schema: str) -> DataFrame:
        p = os.path.join(base, f"batch-{batch_id}")
        if batch_id < 0 or not os.path.isdir(p):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(p)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(wm_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of a committed batch: no-op
        for d in (out_dir, pend_dir, defer_dir):
            shutil.rmtree(
                os.path.join(d, f"batch-{batch_id}"), ignore_errors=True
            )
        prev = _meta_after(batch_id - 1)
        # lateness contract for FRESH arrivals (emitted windows stay
        # final); W_{k-1} = min over seen sources of admitted max - delay
        fresh = batch
        if prev["max_admitted"]:
            w_prev = ts_shift(min(prev["max_admitted"].values()), delay)
            fresh = batch.filter(
                F.col("ts") > F.lit(w_prev).cast("timestamp")
            )
        avail = fresh.unionByName(
            _read_store(defer_dir, batch_id - 1, _ROWS_SCHEMA)
        ).persist()
        # 2. GATE — the admission ceiling from carried per-source maxima
        # (|sources| scalars in the offsets json, the quota.py bounded-
        # metadata precedent; batch 0 is unthrottled)
        if prev["max_admitted"]:
            floor_iso = min(prev["max_admitted"].values())
            a_k = ts_shift(floor_iso, drift, sign=1)
            admitted = avail.filter(
                F.col("ts") <= F.lit(a_k).cast("timestamp")
            )
            deferred = avail.filter(
                F.col("ts") > F.lit(a_k).cast("timestamp")
            )
        else:
            admitted, deferred = avail, avail.filter(F.lit(False))
        # 3. TAKE — update per-source admitted maxima
        batch_max = {
            r["source"]: r["mx"].isoformat()
            for r in admitted.groupBy("source")
            .agg(F.max("ts").alias("mx")).collect()
        }
        max_admitted = dict(prev["max_admitted"])
        for s, mx in batch_max.items():
            max_admitted[s] = max(max_admitted.get(s, mx), mx)
        # aligned watermark over SEEN sources
        wm = None
        if max_admitted:
            wm = ts_shift(min(max_admitted.values()), delay)
        # 4. MERGE
        merged = merge_pending(
            _read_store(pend_dir, batch_id - 1, _PENDING_SCHEMA),
            window_partials(admitted, window),
        ).persist()
        # 5. EMIT — watermark passed AND no row of the window deferred.
        # A deferred row's window cannot emit yet: defer the WINDOW by
        # anti-joining pending against the deferred rows' window keys.
        defer_windows = deferred.select(
            "source", F.window("ts", window).alias("__w")
        ).select(
            "source",
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
        ).distinct()
        ready = (
            merged.filter(F.col("window_end") <= F.lit(wm)
                          .cast("timestamp"))
            if wm is not None else merged.filter(F.lit(False))
        ).join(
            F.broadcast(defer_windows),
            ["source", "window_start", "window_end"], "left_anti",
        )
        carry = merged.join(
            ready.select("source", "window_start", "window_end"),
            ["source", "window_start", "window_end"], "left_anti",
        )
        # three independent DAGs over the persisted frames to DISTINCT
        # paths — overlapped (guide §2.6; marker still follows all). The
        # deferred count rides its write as an observed metric instead
        # of a separate count job.
        obs = Observation()
        run_concurrently(
            lambda: ready
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch-{batch_id}")),
            lambda: carry.write.mode("overwrite").parquet(
                os.path.join(pend_dir, f"batch-{batch_id}")
            ),
            lambda: deferred.select("source", "ts", "value")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(os.path.join(defer_dir, f"batch-{batch_id}")),
        )
        # 6. PUBLISH — meta, then the marker as the commit point
        json.dump(
            {"max_admitted": max_admitted,
             "n_deferred": int(obs.get["n"])},
            open(os.path.join(wm_dir, f"batch-{batch_id}.json"), "w"),
        )
        merged.unpersist()
        avail.unpersist()
        open(marker, "w").close()
        old = batch_id - keep_versions
        if old >= 0:
            for d in (pend_dir, defer_dir):
                shutil.rmtree(os.path.join(d, f"batch-{old}"),
                              ignore_errors=True)

    stream = (
        spark.readStream
        .schema(_ROWS_SCHEMA)
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
    last = max(
        (int(e.name[len("batch-"):])
         for e in os.scandir(marker_dir)),
        default=-1,
    )
    # terminal flush: deferred backlog joins the pending store, then
    # everything unemitted leaves as batch_id = n_chunks
    leftover = merge_pending(
        _read_store(pend_dir, last, _PENDING_SCHEMA),
        window_partials(
            _read_store(defer_dir, last, _ROWS_SCHEMA), window
        ),
    ).withColumn("batch_id", F.lit(n_chunks).cast("long"))
    emitted = (
        spark.read.schema(_PENDING_SCHEMA + ", batch_id long")
        .option("recursiveFileLookup", "true").parquet(out_dir)
        if os.path.isdir(out_dir) else
        spark.createDataFrame([], _PENDING_SCHEMA + ", batch_id long")
    )
    return emitted.unionByName(leftover).select(
        "source", "window_start", "window_end", "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "batch_id",
    )


def load_deferred_counts(spark: SparkSession, state_dir: str) -> list[int]:
    """The throttle trace: rows deferred at each committed batch — the
    operational metric an alignment dashboard plots."""
    wm_dir = os.path.join(state_dir, "wm")
    out = []
    for k in sorted(
        int(e.name[len("batch-"):-len(".json")])
        for e in os.scandir(wm_dir) if e.name.endswith(".json")
    ):
        out.append(
            json.load(open(os.path.join(wm_dir, f"batch-{k}.json")))
            .get("n_deferred", 0)
        )
    return out
