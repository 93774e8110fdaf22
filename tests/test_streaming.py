"""Streaming semantics tests: file sources + memory sink +
processAllAvailable/availableNow — the deterministic replacement for the
reference's sleep-based verification (reference TransactionConsumerTest.java:60
sleeps 30s; SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.queries import _stream_table
from flink_kafka_table_api_spark.streaming import windows as sw
from flink_kafka_table_api_spark.streaming.lifecycle import (
    cancel,
    collect_stream,
    start_memory_sink,
)

SF = "/root/testdata/sf0.001"


def test_stream_filter_project_collect_cancel(spark):
    """O1-ish source -> O4 filter -> O5 project -> O12 collect -> O13 cancel."""
    stream = _stream_table(spark, SF, "events")
    assert stream.isStreaming
    out = stream.filter(F.col("event_type") != "error").select("event_id", "value")
    q = start_memory_sink(out, "t_filter_project")
    try:
        rows = collect_stream(spark, q, "t_filter_project")
        batch = read_table(spark, SF, "events")
        expected = batch.filter(F.col("event_type") != "error").count()
        assert len(rows) == expected
    finally:
        cancel(q)
    assert not q.isActive  # O13 cancel parity


def test_stream_tumbling_window_matches_batch(spark):
    stream = _stream_table(spark, SF, "events")
    windowed = sw.tumbling(
        sw.with_watermark(stream, "ts", "5 seconds"),
        "ts", "1 hour",
        aggs=(F.count("*").alias("n"),),
    )
    q = (
        windowed.writeStream.format("memory").queryName("t_tumbling")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.n)
        for r in spark.table("t_tumbling").collect()
    }
    batch = (
        read_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    expected = {(r.h, r.n) for r in batch.collect()}
    assert got == expected


def test_streaming_dedup_bounded_state(spark):
    stream = _stream_table(spark, SF, "events")
    deduped = sw.streaming_dedup(stream, ["user_id", "event_type"], ts_col="ts")
    q = (
        deduped.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup")
    batch_distinct = (
        read_table(spark, SF, "events")
        .select("user_id", "event_type").distinct().count()
    )
    # watermark-scoped dedup can keep more than the global distinct count
    # (keys recur across watermark horizons) but never less
    assert got.count() >= batch_distinct
    assert got.select("user_id", "event_type").distinct().count() == batch_distinct


def test_session_window_dynamic_gap(spark):
    """Session windows with a per-row gap column (SURVEY §7.4 #7): purchase
    events extend sessions longer than clicks — still fully built-in."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "click", t0),
        (1, "click", t0 + dt.timedelta(minutes=4)),     # within 5m -> same
        (1, "click", t0 + dt.timedelta(minutes=20)),    # gap>5m -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    # gap expression must be CalendarIntervalType: string literals cast
    # implicitly; DayTimeInterval (INTERVAL literals) are rejected
    gap = F.when(F.col("event_type") == "purchase", F.lit("30 minutes")) \
        .otherwise(F.lit("5 minutes"))
    out = (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(r.n for r in out) == [1, 2]


def test_sql_entry_point_over_catalog(spark):
    """The reference's executeSql surface (O11): register catalog views,
    query them with textual SQL (reference TransactionFlinkTest.java:144-146
    uses SQL for its verification read — same entry point here)."""
    from flink_kafka_table_api_spark.catalog import register_all

    register_all(spark, SF)
    out = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    ).collect()
    assert [r.o_orderstatus for r in out] == ["F", "O", "P"]
    assert sum(r.n for r in out) == spark.table("orders").count()


def test_update_mode_windowed_agg(spark, tmp_path):
    """Update output mode: only changed window groups are re-emitted each
    micro-batch (vs complete re-emitting everything)."""
    import datetime as dt

    src = str(tmp_path / "upd_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(minutes=1))], "id long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = _stream_table_raw(spark, src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("upd_agg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "upd_ck"))
        .start()
    )
    q.processAllAvailable()
    first = [(r.ws, r.n) for r in spark.table("upd_agg").collect()]
    assert first == [(t0, 2)]
    # same window gets a third event -> update emits the NEW count row
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=2))], "id long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = [(r.ws, r.n) for r in spark.table("upd_agg").collect()]
    assert (t0, 3) in rows  # updated emission for the same window


def _stream_table_raw(spark, path):
    from flink_kafka_table_api_spark.sources.files import stream_parquet_dir

    return stream_parquet_dir(spark, path, spark.read.parquet(path).schema)


def test_rate_source_smoke(spark):
    """Built-in rate source: the broker-free unbounded-source smoke test
    (closest offline analog to the Kafka source's continuous scan)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    )
    assert stream.isStreaming
    q = (
        stream.select("timestamp", "value")
        .writeStream.format("memory").queryName("t_rate")
        .outputMode("append").start()
    )
    try:
        import time
        deadline = time.time() + 20
        while time.time() < deadline and spark.table("t_rate").count() == 0:
            time.sleep(0.5)
        assert spark.table("t_rate").count() > 0
    finally:
        q.stop()


def test_watermark_declaration_preserved(spark):
    """O3: watermark is declarative; verify it lands in the plan."""
    stream = _stream_table(spark, SF, "events")
    wm = sw.with_watermark(stream, "ts", "5 seconds")
    assert "watermark" in wm._jdf.queryExecution().analyzed().toString().lower()


def test_stream_table_stages_multi_file_table_dirs(spark, tmp_path):
    """A table that is a DIRECTORY of part files (any Spark-written
    table, the Nx scale builds) must stream its part files — the
    file-stream source does not recurse into a symlinked subdirectory
    and silently lists ZERO files (the bug behind the bogus
    stream_window_topk 8x row in BASELINE.md). The staging must link
    part files individually and fail loudly if nothing was staged."""
    from flink_kafka_table_api_spark.queries import (
        _run_stream_to_table,
        _stream_table,
    )

    src = spark.range(100).selectExpr(
        "id AS event_id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)"
        " AS ts",
        "id % 7 AS user_id", "'click' AS event_type",
        "CAST(id AS DOUBLE) AS value",
    )
    table_dir = str(tmp_path / "events.parquet")
    src.repartition(4).write.parquet(table_dir)
    stream = _stream_table(spark, str(tmp_path), "events")
    got = _run_stream_to_table(stream, spark, "append")
    assert got.count() == 100
    # a REWRITTEN table has new unique part names; stale staged links
    # must be reconciled away, not accumulated (accumulation silently
    # multiplies the streamed rows — this exact test caught it)
    src.repartition(2).write.mode("overwrite").parquet(table_dir)
    stream2 = _stream_table(spark, str(tmp_path), "events")
    got2 = _run_stream_to_table(stream2, spark, "append")
    assert got2.count() == 100
