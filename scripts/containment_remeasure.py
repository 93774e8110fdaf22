#!/usr/bin/env python
"""Quiet-boot re-measure of `containment_pairs` (VERDICT r8 item 3):
its r8 bench reading was 14.7 s median (min 5.8 s, spread [5.8, 18.4])
vs the 1.83 s r6 operative baseline — >2x even noise-normalized, with
no code change since r6. This script isolates the question: calibration
probes before/after, N GC-separated cold runs, medians and mins, so a
BASELINE.md row can either record host noise or flag a real regression.

Usage: python scripts/containment_remeasure.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import CALIBRATION_REF_SEC, calibration_probe  # noqa: E402

from flink_kafka_table_api_spark.queries import QUERIES, BENCH_ONLY  # noqa: E402
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNNABLE = {**QUERIES, **BENCH_ONLY}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        app_name="fkta-containment-remeasure",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the bench.py warm-ups that matter for this query: JVM + codegen +
    # the shingle/md5/minhash path
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from flink_kafka_table_api_spark.operators.dedup import (
        minhash_signatures,
    )
    minhash_signatures(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text",
    ).count()

    cal_before = calibration_probe(spark)
    times = []
    for i in range(runs):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        n = RUNNABLE["containment_pairs"](spark, SF_DIR).count()
        times.append(time.perf_counter() - t0)
        print(f"run {i}: {times[-1]:.2f}s ({n} rows)", flush=True)
    cal_after = calibration_probe(spark)
    nf = statistics.median([cal_before, cal_after]) / CALIBRATION_REF_SEC
    med = statistics.median(times)
    print(f"calibration: before {cal_before:.3f}s after {cal_after:.3f}s "
          f"noise_factor {nf:.3f}")
    print(f"containment_pairs @ {SF_DIR}: median {med:.2f}s "
          f"min {min(times):.2f}s max {max(times):.2f}s | "
          f"normalized median {med / nf:.2f}s (r6 baseline 1.83s)")
    spark.stop()


if __name__ == "__main__":
    main()
