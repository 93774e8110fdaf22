"""Custom stateful streaming operator test: state must persist across
micro-batches (the property that distinguishes applyInPandasWithState from
a per-batch groupBy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.files import stream_parquet_dir
from flink_kafka_table_api_spark.streaming.stateful import running_totals


def _write(spark, rows, path):
    spark.createDataFrame(rows, "user_id long, value double").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_state_survives_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, [(1, 10.0), (1, 5.0), (2, 1.0)], src)
    stream = stream_parquet_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory").queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # second batch: user 1 adds more -> totals must ACCUMULATE, not reset
    _write(spark, [(1, 100.0), (3, 7.0)], src)
    q.processAllAvailable()
    q.stop()
    rows = spark.table("state_test").collect()
    # update mode appends one row per key per batch; latest row per key wins
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 115.0)   # 2 events batch1 + 1 event batch2
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)
