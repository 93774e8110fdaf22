#!/usr/bin/env python
"""One-off: time every Spark action inside stream_curation_ooo's batches
by monkeypatching the action entry points (count/first/collect/save).
Prints a chronological action trace with durations and stack hints."""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERY = sys.argv[1] if len(sys.argv) > 1 else "stream_curation_ooo"

spark = get_spark(app_name="fkta-instr", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F  # noqa: E402
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(f"{SF_DIR}/region.parquet").count()
import tempfile  # noqa: E402
with tempfile.TemporaryDirectory() as d:
    spark.range(10).select(
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
        F.col("id").alias("v"),
    ).write.mode("overwrite").parquet(f"{d}/src")
    wq = (
        spark.readStream.schema("ts timestamp, v long").parquet(f"{d}/src")
        .withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "1 hour")).agg(F.sum("v").alias("s"))
        .writeStream.format("memory").queryName("warm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    wq.awaitTermination()

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

TRACE: list[tuple[float, float, str, str]] = []


def _where() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "flink_kafka_table_api_spark" in fn:
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        t1 = time.perf_counter()
        TRACE.append((t0, t1 - t0, name, _where()))
        return out

    setattr(cls, name, timed)


for m in ("count", "collect", "first", "head", "take"):
    wrap(DataFrame, m)
wrap(DataFrameWriter, "save")
wrap(DataFrameWriter, "parquet")

from flink_kafka_table_api_spark.queries import BENCH_ONLY, QUERIES  # noqa: E402

fn = {**QUERIES, **BENCH_ONLY}[QUERY]
t0 = time.perf_counter()
n = fn(spark, SF_DIR).count()
wall = time.perf_counter() - t0
print(f"== {QUERY}: wall {wall:.2f}s, {n} rows")
base = TRACE[0][0] if TRACE else t0
tot = 0.0
for ts, dur, name, where in TRACE:
    tot += dur
    print(f"  t+{ts - t0:7.2f}  {dur:6.2f}s  {name:8s} {where}")
print(f"== sum of timed actions: {tot:.2f}s of {wall:.2f}s wall")
spark.stop()
