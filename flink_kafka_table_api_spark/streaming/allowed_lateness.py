"""Allowed lateness with a late-data side output (built round 9, staged
for a round-10 gate slot — Flink's `allowedLateness()` +
`sideOutputLateData()`, the DataStream windowing surface that completes
the repo's lateness-policy toolbox: DROP at the watermark
(streaming/windows.py), don't let an idle source stall the watermark
(idle_watermark), throttle a fast source (watermark_alignment), and now
CORRECT-AND-QUARANTINE).

Flink's three-zone lateness model (public docs, "Window Lifecycle /
Allowed Lateness"): a row arriving behind the watermark but within
`allowed` of it still updates its window — the window RE-FIRES with the
corrected aggregate (update-mode output); a row later than
watermark − allowed goes to the side output and the window's state is
eligible for cleanup at end + allowed. Plain watermark semantics
(allowed = 0) silently drops exactly the rows a data-quality team most
wants to see.

The deterministic micro-batch twin (foreachBatch, marker-committed —
the sibling recipe; single watermark source, the multi-source rules are
idle_watermark / watermark_alignment's job):

  per micro-batch k:
    1. CLASSIFY: against W_{k-1} = max(delivered ts through k-1) − delay:
         on-time    ts >  W_{k-1}            (or batch 0)
         allowed    W_{k-1} − allowed < ts <= W_{k-1}
         quarantine ts <= W_{k-1} − allowed  -> the side output, emitted
                    as 'LATE' rows tagged with their arrival batch
                    (aggregated per window — the audit a pager reads);
    2. MERGE:    admitted rows (on-time + allowed) fold into per-window
                 DECIMAL partials; each window carries a FIRED flag;
    3. FIRE:     W_k advances (monotone, from DELIVERED maxima — the
                 generator-before-filtering rule); windows with
                 window_end <= W_k that never fired emit '+I'; windows
                 already fired that RECEIVED admitted rows this batch
                 re-fire as a correction: '-U' (previous aggregate)
                 then '+U' (corrected) — Flink's update-mode output;
    4. EVICT:    fired windows with window_end <= W_k − allowed can
                 never be corrected again (any further row of theirs
                 classifies as quarantine BY THE SAME RULE — eviction
                 is emergent from classification, not a second policy)
                 and leave the state;
    5. PUBLISH:  out/batch-k + state/batch-k + wm json, marker LAST.
    Terminal flush: never-fired windows emit '+I' tagged n_chunks.

Completeness/finality: '+I' fires are complete w.r.t. admitted rows
(the windows.py argument); corrections are exactly one '-U'/'+U' pair
per batch that delivered an admitted late row to a fired window, so a
consumer folding the changelog in (batch_id, op) order holds the
corrected aggregate at every point — and rows beyond the allowance are
VISIBLE in the side output instead of silently absent.

At 100 TB: state is windows inside the lateness horizon (width
delay + allowed — eviction is emergent), per-batch work one map-side-
partial keyed aggregate + a union-fold merge. The side output is the
production late-data audit table every ingest pipeline wants.

Reference anchor: generalizes the reference pipeline's single-source
continuous-insert lifecycle (TransactionProcessor.java:192,215-223)
with the public DataStream windowing lateness controls.

DuckDB oracle: `stream_allowed_lateness_sql` (queries.py) replays
classification per arrival chunk, first-fire schedule, per-batch
correction pairs, quarantine rows, and the terminal flush.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.functions.portable import DEC
from flink_kafka_table_api_spark.streaming.chunk_stats import (
    ChunkStats,
    stat_max,
)
from flink_kafka_table_api_spark.streaming.late_data import (
    run_concurrently,
    stage_chunked_by,
    ts_shift,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

_STATE_SCHEMA = (
    "window_start timestamp, window_end timestamp, n_events long, "
    "sum_value decimal(25,6), fired boolean"
)
_OUT_SCHEMA = (
    "op string, window_start timestamp, window_end timestamp, "
    "n_events long, sum_value double, batch_id long"
)


def _partials(rows: DataFrame, window: str) -> DataFrame:
    return rows.select(
        F.window("ts", window).alias("__w"),
        F.col("value").cast(DEC).alias("__v"),
    ).groupBy(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("__v").cast("decimal(25,6)").alias("sum_value"),
    )


def stream_allowed_lateness(
    spark: SparkSession,
    rows_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    delay: str,
    allowed: str,
    window: str = "1 day",
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """Tumbling windowed aggregation with allowed lateness: returns the
    changelog (op, window_start, window_end, n_events, sum_value,
    batch_id) where op is '+I' (first fire), '-U'/'+U' (correction pair
    for a late-but-allowed arrival after the fire), or 'LATE' (the side
    output: quarantined rows aggregated per window, tagged with their
    arrival batch). Deterministic given the drop boundaries."""
    src = stage_chunked_by(
        rows_chunked.select(
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(value_col).cast("double").alias("value"),
            F.col(chunk_col).alias("__chunk"),
        ),
        os.path.join(state_dir, "src"),
        chunk_col="__chunk", n_chunks=n_chunks, columns=["ts", "value"],
    )
    ckpt = os.path.join(state_dir, "ckpt")
    # watermark-advance maxima ride ONE staging-time job instead of one
    # agg job per micro-batch (chunk_stats.py; guide §1.2)
    stats = ChunkStats(
        spark, src, "ts timestamp, value double", {"mx": F.max("ts")}
    )
    out_dir = os.path.join(state_dir, "out")
    st_dir = os.path.join(state_dir, "state")
    wm_dir = os.path.join(state_dir, "wm")
    marker_dir = os.path.join(state_dir, "commits")

    def _meta_after(batch_id: int) -> dict:
        p = os.path.join(wm_dir, f"batch-{batch_id}.json")
        if batch_id < 0 or not os.path.exists(p):
            return {"max_seen": None}
        return json.load(open(p))

    def _state_after(batch_id: int) -> DataFrame:
        p = os.path.join(st_dir, f"batch-{batch_id}")
        if batch_id < 0 or not os.path.isdir(p):
            return spark.createDataFrame([], _STATE_SCHEMA)
        return spark.read.schema(_STATE_SCHEMA).parquet(p)

    def _ts_minus(iso: str, interval: str) -> str:
        return ts_shift(iso, interval)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(wm_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of a committed batch: no-op
        for d in (out_dir, st_dir):
            shutil.rmtree(
                os.path.join(d, f"batch-{batch_id}"), ignore_errors=True
            )
        batch = batch.persist()
        prev = _meta_after(batch_id - 1)
        # 1. CLASSIFY against W_{k-1}
        if prev["max_seen"] is None:
            admitted, quarantined = batch, batch.filter(F.lit(False))
        else:
            w_prev = _ts_minus(prev["max_seen"], delay)
            q_line = _ts_minus(w_prev.replace(" ", "T"), allowed)
            admitted = batch.filter(
                F.col("ts") > F.lit(q_line).cast("timestamp")
            )
            quarantined = batch.filter(
                F.col("ts") <= F.lit(q_line).cast("timestamp")
            )
        late_rows = _partials(quarantined, window).select(
            F.lit("LATE").alias("op"), "window_start", "window_end",
            "n_events", F.col("sum_value").cast("double"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        # 2. MERGE admitted partials into carried state
        prior = _state_after(batch_id - 1).persist()
        part = _partials(admitted, window)
        merged = (
            prior.select("window_start", "window_end", "n_events",
                         "sum_value",
                         F.col("fired").alias("__pf"))
            .join(part.select(
                "window_start", "window_end",
                F.col("n_events").alias("__dn"),
                F.col("sum_value").alias("__dv"),
            ), ["window_start", "window_end"], "full_outer")
            .select(
                "window_start", "window_end",
                (F.coalesce("n_events", F.lit(0))
                 + F.coalesce("__dn", F.lit(0))).cast("long")
                .alias("n_events"),
                (F.coalesce(F.col("sum_value"),
                            F.lit(0).cast("decimal(25,6)"))
                 + F.coalesce(F.col("__dv"),
                              F.lit(0).cast("decimal(25,6)")))
                .cast("decimal(25,6)").alias("sum_value"),
                F.coalesce("__pf", F.lit(False)).alias("fired"),
                F.col("__dn").isNotNull().alias("__touched"),
                F.col("n_events").alias("__old_n"),
                F.col("sum_value").alias("__old_sv"),
            )
        ).persist()
        # 3. FIRE — advance W from DELIVERED maxima, monotone
        # (sidecar; in-batch aggregate only if the files don't resolve)
        srows = stats.for_batch(ckpt, batch_id)
        mx = (
            batch.agg(F.max("ts")).first()[0] if srows is None
            else stat_max(srows, "mx")
        )
        max_seen = prev["max_seen"]
        if mx is not None:
            cand = mx.isoformat()
            max_seen = cand if max_seen is None else max(max_seen, cand)
        wm = None if max_seen is None else _ts_minus(
            max_seen.replace(" ", "T"), delay
        )
        passed = (
            merged.filter(F.col("window_end") <= F.lit(wm)
                          .cast("timestamp"))
            if wm is not None else merged.filter(F.lit(False))
        )
        first_fires = passed.filter(~F.col("fired")).select(
            F.lit("+I").alias("op"), "window_start", "window_end",
            "n_events", F.col("sum_value").cast("double"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        corr = passed.filter(F.col("fired") & F.col("__touched"))
        retracts = corr.select(
            F.lit("-U").alias("op"), "window_start", "window_end",
            F.col("__old_n").cast("long").alias("n_events"),
            F.col("__old_sv").cast("double").alias("sum_value"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        updates = corr.select(
            F.lit("+U").alias("op"), "window_start", "window_end",
            "n_events", F.col("sum_value").cast("double"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        out = late_rows.unionByName(first_fires).unionByName(
            retracts
        ).unionByName(updates)
        write_out = lambda: out.write.mode("overwrite").parquet(  # noqa: E731
            os.path.join(out_dir, f"batch-{batch_id}")
        )
        # 4. EVICT — windows past end + allowed can never be corrected
        # again (further rows of theirs quarantine by the same rule)
        new_state = merged.select(
            "window_start", "window_end", "n_events", "sum_value",
            (F.col("fired")
             | (F.col("window_end") <= F.lit(wm).cast("timestamp"))
             if wm is not None else F.col("fired")).alias("fired"),
        )
        if wm is not None:
            evict_line = _ts_minus(wm.replace(" ", "T"), allowed)
            new_state = new_state.filter(
                ~(F.col("fired")
                  & (F.col("window_end")
                     <= F.lit(evict_line).cast("timestamp")))
            )
        # emission + state are independent DAGs over the persisted
        # frames to DISTINCT paths — overlapped (guide §2.6; the marker
        # still follows both)
        run_concurrently(
            write_out,
            lambda: new_state.write.mode("overwrite").parquet(
                os.path.join(st_dir, f"batch-{batch_id}")
            ),
        )
        json.dump({"max_seen": max_seen}, open(
            os.path.join(wm_dir, f"batch-{batch_id}.json"), "w"
        ))
        merged.unpersist()
        prior.unpersist()
        batch.unpersist()
        open(marker, "w").close()
        old = batch_id - keep_versions
        if old >= 0:
            shutil.rmtree(os.path.join(st_dir, f"batch-{old}"),
                          ignore_errors=True)

    stream = (
        spark.readStream
        .schema("ts timestamp, value double")
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
    last = max(
        (int(e.name[len("batch-"):])
         for e in os.scandir(marker_dir)),
        default=-1,
    )
    flush = _state_after(last).filter(~F.col("fired")).select(
        F.lit("+I").alias("op"), "window_start", "window_end",
        "n_events", F.col("sum_value").cast("double"),
        F.lit(n_chunks).cast("long").alias("batch_id"),
    )
    emitted = (
        spark.read.schema(_OUT_SCHEMA)
        .option("recursiveFileLookup", "true").parquet(out_dir)
        if os.path.isdir(out_dir) else
        spark.createDataFrame([], _OUT_SCHEMA)
    )
    return emitted.unionByName(flush).select(
        "op", "window_start", "window_end", "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "batch_id",
    )
