#!/usr/bin/env python
"""One-off: run a single query with the event log on and print EVERY
Spark job chronologically: job id, duration, n_tasks, and the first line
of its call site / description. The structure view behind guide §1.2 —
which actions exist per micro-batch and what each costs."""

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
QUERY = sys.argv[1] if len(sys.argv) > 1 else "stream_curation_ooo"

evdir = tempfile.mkdtemp(prefix="fkta_ev_")
spark = get_spark(
    app_name="fkta-jobtrace", master=f"local[{CPUS}]",
    shuffle_partitions=CPUS,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM so codegen constants don't pollute the trace
spark.range(1_000_000).selectExpr("sum(id)").collect()

t0 = time.time()
df = RUNNABLE[QUERY](spark, SF_DIR)
n = df.count()
wall = time.time() - t0
print(f"# {QUERY}: {wall:.2f}s wall, {n} rows", file=sys.stderr)

spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
app_id = spark.sparkContext.applicationId
spark.stop()
time.sleep(1)

cands = [os.path.join(evdir, p) for p in os.listdir(evdir)]
path = max(cands, key=os.path.getmtime)
if os.path.isdir(path):
    lines = []
    for p in sorted(os.listdir(path)):
        if p.startswith("events_"):
            lines.extend(open(os.path.join(path, p)))
else:
    lines = list(open(path))
jobs = {}
stage_tasks = {}
stage_names = {}
if True:
    for line in lines:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "callsite": props.get("callSite.short", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "ntasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in ev.get("Stage Infos", [])
                ),
            }
            for s in ev.get("Stage Infos", []):
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]

prev_end = None
for jid in sorted(jobs):
    j = jobs[jid]
    dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
    gap = 0.0 if prev_end is None else (j["start"] - prev_end) / 1000.0
    prev_end = j.get("end", j["start"])
    site = j["callsite"] or (stage_names.get(j["stages"][0], "") if j["stages"] else "")
    print(f"job {jid:4d}  {dur:6.3f}s  gap {gap:6.3f}s  tasks {j['ntasks']:4d}  {site[:90]}")
print(f"# total jobs {len(jobs)}, wall {wall:.2f}s")
