#!/usr/bin/env python
"""Re-measure a subset of bench queries with bench.py's exact methodology
(median of N runs, System.gc between runs, release_cached after each,
count() materialization) plus the calibration probe, without paying for
the full 113-query sweep. Usage:

    python scripts/bench_subset.py name [name ...]

Prints one JSON line {"queries": {...}, "noise_factor": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_table_api_spark.queries import BENCH_ONLY, QUERIES  # noqa: E402
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

RUNNABLE = {**QUERIES, **BENCH_ONLY}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    names = sys.argv[1:]
    assert names, "pass query names"
    spark = get_spark(
        app_name="fkta-bench-subset",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(CPUS * 10).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.range(10).select(
            F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
            F.col("id").alias("v"),
        ).write.mode("overwrite").parquet(f"{d}/src")
        wq = (
            spark.readStream.schema("ts timestamp, v long").parquet(f"{d}/src")
            .withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "1 hour")).agg(F.sum("v").alias("s"))
            .writeStream.format("memory").queryName("subset_warm_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        wq.awaitTermination()
    from flink_kafka_table_api_spark.operators.dedup import minhash_signatures

    minhash_signatures(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text",
    ).count()

    from flink_kafka_table_api_spark.caching import release_cached

    def probe() -> float:
        runs = []
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            spark.range(10_000_000).selectExpr(
                "bit_xor(xxhash64(cast(id AS string), id)) AS s"
            ).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        return runs[1]

    cal0 = round(probe(), 3)
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        fn = RUNNABLE[name]
        runs: list[float] = []
        for _ in range(N_RUNS):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
            release_cached()
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = [round(runs[0], 3), round(runs[-1], 3)]
        print(f"# {name}: {timings[name]:.3f}s {spreads[name]}",
              file=sys.stderr)
    cal1 = round(probe(), 3)
    print(json.dumps({
        "queries": timings, "spread": spreads,
        "calibration_sec": [cal0, cal1],
        "noise_factor": round(max(1.0, (cal0 + cal1) / 2 / 0.25), 3),
        "total": round(sum(timings.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
