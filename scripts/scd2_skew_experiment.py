#!/usr/bin/env python
"""Hot-KEY skew experiment for the round-8 streaming state machines that
missed the round-8 sweep (VERDICT r8 item 6): SCD2 history maintenance
and CDC apply under a celebrity key.

Construction: the sf0.1 events changelog (100k ops, ~1.5k keys at that
SF) delivered as 3 natural day-tercile drops, twice:
  - uniform: key = user_id (the gate shape);
  - hot:     60% of ops (op_id % 5 != 0 -> ~4/5? no: op_id % 5 < 3)
             redrawn onto ONE celebrity key, rest keep user_id — the
             zipf-1 "one key receives most ops" shape the VERDICT
             flagged for the `_chain` LEAD-window rebuild
             (streaming/scd2_stream.py:86): the celebrity's whole chain
             lands in one task, and because every batch rebuilds the
             FULL history of touched keys, the hot chain is rebuilt
             per-batch (O(|hot history|) work each time).

Output rows are IDENTICAL between variants for cdc_apply-per-key counts
(same admitted ops; the snapshot shrinks to the distinct keys) and the
SCD2 history keeps one row per admitted upsert either way — so a
wall-clock ratio here is genuine skew cost, not output growth (the
window-join honesty lesson from SCALE.md).

NEEDS FIX bar (memory/SCALE.md convention): ratio > 3x.

Usage: python scripts/scd2_skew_experiment.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_kafka_table_api_spark.session import get_spark  # noqa: E402
from flink_kafka_table_api_spark.streaming.cdc_apply import (  # noqa: E402
    stream_cdc_apply,
)
from flink_kafka_table_api_spark.streaming.scd2_stream import (  # noqa: E402
    stream_scd2,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HOT_SHARE_MOD = 5  # op_id % 5 < 3 -> 60% of ops hit the celebrity


def _ops(spark, hot: bool):
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    d0 = ev.agg(F.min(F.to_date("ts"))).first()[0]
    d_idx = F.datediff(F.to_date("ts"), F.lit(d0))
    natural = F.least(F.floor(d_idx / F.lit(10)).cast("long"), F.lit(2))
    key = F.col("user_id")
    if hot:
        key = F.when(
            F.col("event_id") % HOT_SHARE_MOD < 3, F.lit(0)
        ).otherwise(F.col("user_id"))
    return ev.select(
        F.col("event_id").alias("op_id"),
        F.col("ts").cast("timestamp").alias("op_ts"),
        key.cast("long").alias("key"),
        F.when(F.col("event_type") == "error", "D").otherwise("U")
        .alias("op"),
        "value",
        natural.alias("__chunk"),
    )


def timed(spark, fn, ops, tag: str, runs: int) -> tuple[float, int]:
    times, n = [], 0
    for _ in range(runs):
        state = tempfile.mkdtemp(prefix=f"fkta_scd2skew_{tag}_")
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        out = fn(spark, ops, state, n_chunks=3, delay="2 days")
        n = out.count()
        times.append(time.perf_counter() - t0)
        shutil.rmtree(state, ignore_errors=True)
    return min(times), n


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="fkta-scd2-skew",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the streaming machinery once
    timed(spark, stream_cdc_apply, _ops(spark, False).limit(200), "warm", 1)
    for name, fn in (("cdc_apply", stream_cdc_apply),
                     ("scd2", stream_scd2)):
        t_u, n_u = timed(spark, fn, _ops(spark, False), f"{name}_uni", runs)
        t_h, n_h = timed(spark, fn, _ops(spark, True), f"{name}_hot", runs)
        print(f"{name}: uniform {t_u:.2f}s ({n_u} rows) | "
              f"hot-key {t_h:.2f}s ({n_h} rows) | "
              f"ratio {t_h / t_u:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
