"""Custom Python DataSource connector (Spark 4 API): batch + streaming
reads of the deterministic transactions generator, and the reference
pipeline running end-to-end on top of it."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.transactions_source import register


def test_batch_read_deterministic(spark):
    register(spark)
    df = spark.read.format("fkta_transactions").option("rows", 100).load()
    assert df.count() == 100
    assert df.schema.simpleString().startswith("struct<id:string,amount:double")
    # executor-parallel: rows arrive from several input partitions
    assert df.rdd.getNumPartitions() > 1
    # pure function of (i, seed): two reads agree bit-for-bit (set ops
    # can't compare map columns -> drop metadata for the comparison)
    cmp = df.drop("metadata")
    again = spark.read.format("fkta_transactions").option("rows", 100).load()
    assert cmp.exceptAll(again.drop("metadata")).count() == 0
    # different seed -> different data
    other = (
        spark.read.format("fkta_transactions")
        .option("rows", 100).option("seed", 7).load()
    )
    assert other.drop("metadata").exceptAll(cmp).count() > 0


def test_reference_pipeline_over_connector(spark):
    """The flagship filter/project/IF pipeline runs unchanged on the
    connector — connector and pipeline compose like the reference's
    tableEnv.from("transactions") flow."""
    from flink_kafka_table_api_spark.plans.pipeline import approved_transactions

    register(spark)
    tx = spark.read.format("fkta_transactions").option("rows", 500).load()
    out = approved_transactions(tx, with_processing_ts=False)
    n_cancelled = tx.filter(F.col("status") == "CANCELLED").count()
    assert out.count() == 500 - n_cancelled
    eur = out.filter(F.col("currency") == "EUR").first()
    assert abs(eur.amountInUsd - eur.amount * 1.1) < 1e-9


def test_streaming_read_advances_offsets(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("fkta_transactions")
        .option("rows_per_batch", 20).load()
    )
    q = (
        stream.writeStream.format("memory").queryName("tx_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.table("tx_stream").count()
    assert n >= 20 and n % 20 == 0
