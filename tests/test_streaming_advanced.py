"""Advanced streaming semantics: stream-stream join, late-data drop via
watermark, foreachBatch sink — all with staged file sources so behavior is
deterministic (no sleeps, no brokers)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.files import stream_parquet_dir


def _write_parquet(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return TS0 + dt.timedelta(minutes=minutes)


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-range condition —
    the streaming analog of the batch range join."""
    left_dir, right_dir = str(tmp_path / "l"), str(tmp_path / "r")
    # stream-stream joins REQUIRE an equality predicate (state is keyed by
    # it) — the time-range condition bounds state retention on top of it
    _write_parquet(
        spark,
        [(1, 100, _ts(0)), (2, 200, _ts(10)), (3, 300, _ts(20))],
        "l_id long, l_user long, l_ts timestamp",
        left_dir,
    )
    _write_parquet(
        spark,
        [(10, 100, _ts(1)), (20, 200, _ts(11)), (30, 300, _ts(40))],
        "r_id long, r_user long, r_ts timestamp",
        right_dir,
    )
    left = stream_parquet_dir(
        spark, left_dir, spark.read.parquet(left_dir).schema
    ).withWatermark("l_ts", "5 minutes")
    right = stream_parquet_dir(
        spark, right_dir, spark.read.parquet(right_dir).schema
    ).withWatermark("r_ts", "5 minutes")
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 2 MINUTES")),
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.l_id, r.r_id) for r in spark.table("ss_join").collect()}
    assert got == {(1, 10), (2, 20)}  # r 30 is 20 min after l 3 -> no match


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics: rows older than watermark - delay are dropped
    from a windowed aggregation in append mode (the behavior the reference
    declares with its 5s bound — reference TransactionProcessor.java:106)."""
    src = str(tmp_path / "late_src")
    # batch 1: events up to minute 60 -> watermark advances to ~59:00
    _write_parquet(
        spark,
        [(1, _ts(0)), (2, _ts(5)), (3, _ts(60))],
        "id long, ts timestamp",
        src,
    )
    stream = stream_parquet_dir(spark, src, spark.read.parquet(src).schema)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("late_agg")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE row at minute 2 (far behind watermark) + a fresh row
    _write_parquet(spark, [(4, _ts(2)), (5, _ts(70))], "id long, ts timestamp", src)
    q.processAllAvailable()
    # batch 3: advance watermark past minute 70 so its window closes
    _write_parquet(spark, [(6, _ts(90))], "id long, ts timestamp", src)
    q.processAllAvailable()
    q.stop()
    counts = {r.ws: r.n for r in spark.table("late_agg").collect()}
    first_window = counts.get(TS0)
    # the late id=4 (minute 2) must NOT be added to the already-closed first
    # window: it stays at 2 (ids 1,2)
    assert first_window == 2


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """O10 durability: restarting a query from its checkpoint processes
    only NEW input — offsets committed in the checkpoint are not replayed
    (the at-least-once boundary the reference also relies on)."""
    src, ck, out = (str(tmp_path / "ckr_src"), str(tmp_path / "ckr_ck"),
                    str(tmp_path / "ckr_out"))
    _write_parquet(spark, [(1, _ts(0)), (2, _ts(1))], "id long, ts timestamp", src)
    schema = spark.read.parquet(src).schema

    def run_once():
        # memory sink is not fault-tolerant; the parquet sink is the
        # checkpoint-recoverable one
        from flink_kafka_table_api_spark.sources.files import stream_parquet_dir

        stream = stream_parquet_dir(spark, src, schema)
        q = (
            stream.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert run_once() == 2
    # restart with the SAME checkpoint: nothing new -> no growth (offsets
    # already committed are not replayed)
    assert run_once() == 2
    # add one file -> only the delta is processed
    _write_parquet(spark, [(3, _ts(2))], "id long, ts timestamp", src)
    assert run_once() == 3


def test_foreachbatch_sink(spark, tmp_path):
    """foreachBatch: the escape hatch for sinks Spark lacks natively
    (SURVEY §2.2 sinks row) — here appending each micro-batch to parquet."""
    src, out = str(tmp_path / "fb_src"), str(tmp_path / "fb_out")
    _write_parquet(spark, [(1, "a"), (2, "b")], "id long, v string", src)
    stream = stream_parquet_dir(spark, src, spark.read.parquet(src).schema)

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "fb_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out)
    assert result.count() == 2
    assert set(result.columns) == {"id", "v", "batch_id"}


def test_upsert_foreachbatch_materialized_view(spark, tmp_path):
    """Keyed UPSERT sink: per-user running totals maintained in parquet
    across micro-batches; latest value per key wins; replay-safe."""
    from flink_kafka_table_api_spark.sources.files import stream_parquet_dir
    from flink_kafka_table_api_spark.streaming.upsert import upsert_to_parquet

    src = str(tmp_path / "upsert_src")
    table = str(tmp_path / "user_totals")

    def write(rows):
        spark.createDataFrame(rows, "user_id long, value double").coalesce(
            1
        ).write.mode("append").parquet(src)

    write([(1, 10.0), (2, 5.0)])
    stream = stream_parquet_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    from pyspark.sql import functions as F

    totals = stream.groupBy("user_id").agg(
        F.sum("value").alias("total"), F.count("*").alias("n")
    )
    q = upsert_to_parquet(
        totals, table, ("user_id",),
        checkpoint_dir=str(tmp_path / "upsert_ck"),
    )
    q.processAllAvailable()
    write([(1, 90.0), (3, 1.0)])
    q.processAllAvailable()
    q.stop()
    got = {r.user_id: (r.total, r.n) for r in spark.read.parquet(table).collect()}
    assert got == {1: (100.0, 2), 2: (5.0, 1), 3: (1.0, 1)}


def test_upsert_order_col_tie_is_deterministic(spark):
    """CDC batches can carry two updates for one key with EQUAL order_col
    values; the winner must not depend on partition/arrival order. The
    content-hash tiebreaker pins one — same pick regardless of row order."""
    from flink_kafka_table_api_spark.streaming.upsert import latest_per_key

    schema = "k long, ts long, v string"
    fwd = spark.createDataFrame([(1, 5, "alpha"), (1, 5, "beta")], schema)
    rev = spark.createDataFrame(
        [(1, 5, "beta"), (1, 5, "alpha")], schema
    ).repartition(7)
    pick_fwd = latest_per_key(fwd, ("k",), "ts").collect()
    pick_rev = latest_per_key(rev, ("k",), "ts").collect()
    assert len(pick_fwd) == 1 and len(pick_rev) == 1
    assert pick_fwd[0].v == pick_rev[0].v
    # greater order_col still beats any hash: ts wins first
    later = spark.createDataFrame([(1, 5, "alpha"), (1, 9, "zzz")], schema)
    assert latest_per_key(later, ("k",), "ts").collect()[0].v == "zzz"


def test_ensure_parallelism_guard(spark):
    """The fan-out guard must (a) resolve size-string conf values like
    '64m' exactly, and (b) treat the optimizer's unknown/overestimated
    sizeInBytes as 'unknown' and still fan out."""
    from flink_kafka_table_api_spark.parallelism import (
        _max_partition_bytes,
        _parse_size,
        ensure_parallelism,
    )

    assert _parse_size("64m") == 64 * 1024 * 1024
    assert _parse_size("128kb") == 128 * 1024
    assert _parse_size("134217728") == 134217728
    assert _parse_size("garbage") is None
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64m")
        assert _max_partition_bytes(spark) == 64 * 1024 * 1024
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # a small in-memory relation joined to itself gets a multiplied (or
    # unknown) size estimate; the guard must still fan it out rather than
    # silently no-op on a tiny CPU-bound input
    small = spark.range(100).withColumnRenamed("id", "k")
    joined = small.join(small.withColumnRenamed("k", "k2"), small.k == 99)
    fanned = ensure_parallelism(joined, 8)
    assert "Repartition" in fanned._jdf.queryExecution().logical().toString() \
        or fanned.rdd.getNumPartitions() >= 8
