#!/usr/bin/env python
"""Per-query job-level profiler (guide §1: measure first).

Runs each named query once (same call shape as bench.py: fn(spark,
SF).count()) with the Spark event log enabled, then attributes every
Spark job to the query that was running (setJobDescription) and prints,
per query:

  wall      total wall-clock of the query
  n_jobs    how many Spark jobs it launched
  job_sec   sum of job durations (executor-side work incl. scheduling)
  gap_sec   wall - job_sec = driver-only time (planning, py4j, state
            file I/O, checkpoint WAL, os.rename/utime, json dumps)
  n_tasks   total tasks across its jobs

The gap/job split is the first fork in the optimization decision tree:
a query dominated by gap_sec needs fewer actions / less driver work; a
query dominated by job_sec with many tiny jobs needs fused jobs; one
with few jobs and big job_sec needs a better distributed plan.

Run: python scripts/profile_queries.py [name ...]   (default: slowest set)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_table_api_spark.queries import BENCH_ONLY, QUERIES  # noqa: E402
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

RUNNABLE = {**QUERIES, **BENCH_ONLY}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_SET = [
    "stream_curation_ooo", "stream_curation", "stream_event_temporal_join",
    "stream_match_recognize", "stream_ann_ingest", "stream_over_agg",
    "stream_allowed_lateness", "stream_agg_retract", "stream_over_rows",
    "stream_watermark_alignment", "stream_scd2", "stream_cdc_apply",
    "stream_window_join", "stream_temporal_join", "stream_idle_watermark",
    "stream_profile", "stream_late_events", "stream_cumulate",
    "zorder_write", "simjoin_prefix", "leakage_safe_split", "hits_scores",
    "stream_topn_retract", "stream_window_dedup", "winnow_matches",
    "dedup_clusters", "stream_source_quota", "assoc_rules",
    "stream_quantile_monitor", "neardup_verified", "bfs_hops",
    "containment_pairs", "label_propagation", "tokenizer_fertility",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_SET
    log_dir = tempfile.mkdtemp(prefix="fkta_evlog_")
    spark = get_spark(
        app_name="fkta-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmup, abridged: JVM/codegen/scan + python workers +
    # streaming machinery
    from pyspark.sql import functions as F
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(CPUS * 10).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    with tempfile.TemporaryDirectory() as d:
        spark.range(10).select(
            F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
            F.col("id").alias("v"),
        ).write.mode("overwrite").parquet(f"{d}/src")
        wq = (
            spark.readStream.schema("ts timestamp, v long").parquet(f"{d}/src")
            .withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "1 hour")).agg(F.sum("v").alias("s"))
            .writeStream.format("memory").queryName("profile_warm_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        wq.awaitTermination()

    from flink_kafka_table_api_spark.caching import release_cached

    walls: dict[str, float] = {}
    windows: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = RUNNABLE[name]
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        release_cached()
        walls[name] = t1 - t0
        windows[name] = (t0 * 1000, t1 * 1000)
        print(f"# ran {name}: {t1-t0:.2f}s ({n} rows)", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: attribute jobs to query wall-clock windows
    # (job descriptions are lost inside foreachBatch threads, so window
    # attribution is the robust rule)
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(log_dir) if app_id in p]
        path = os.path.join(log_dir, cands[0])
    if os.path.isdir(path):  # eventlog_v2 rolling layout
        lines: list[str] = []
        for f in sorted(os.listdir(path)):
            if f.startswith("events_"):
                lines.extend(open(os.path.join(path, f)))
    else:
        lines = list(open(path))
    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, int] = {}
    job_stages: dict[int, list[int]] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {"t0": ev["Submission Time"], "t1": None}
                job_stages[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
                for s in ev.get("Stage Infos", []):
                    stage_tasks[s["Stage ID"]] = s.get("Number of Tasks", 0)
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]

    print(f"{'query':34s} {'wall':>7s} {'n_jobs':>6s} {'job_sec':>8s} "
          f"{'gap_sec':>8s} {'n_tasks':>7s}")
    rows = []
    for name in names:
        w0, w1 = windows[name]
        sel = [
            (jid, j) for jid, j in jobs.items()
            if j["t1"] is not None and j["t0"] >= w0 and j["t1"] <= w1
        ]
        job_sec = sum((j["t1"] - j["t0"]) for _, j in sel) / 1000
        n_tasks = sum(
            stage_tasks.get(s, 0) for jid, _ in sel for s in job_stages[jid]
        )
        wall = walls[name]
        rows.append({
            "query": name, "wall": round(wall, 2), "n_jobs": len(sel),
            "job_sec": round(job_sec, 2),
            "gap_sec": round(wall - job_sec, 2), "n_tasks": n_tasks,
        })
        print(f"{name:34s} {wall:7.2f} {len(sel):6d} {job_sec:8.2f} "
              f"{wall - job_sec:8.2f} {n_tasks:7d}")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r10", "profile.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
