"""Streaming incremental near-dup detection: later batches must be checked
against everything already indexed, without rescanning it."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.files import stream_parquet_dir
from flink_kafka_table_api_spark.streaming.incremental_dedup import (
    streaming_neardup,
)

DOC = ("the quick brown fox jumps over the lazy dog again and again "
       "while the cat watches quietly from the warm windowsill nearby")


def test_streaming_neardup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    schema = "doc_id long, text string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1: two distinct docs
    write([(1, DOC), (2, "completely different text about spark engines "
                         "and distributed shuffles at massive scale")])
    stream = stream_parquet_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = streaming_neardup(
        stream, str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ck"),
        threshold=0.4,
    )
    q.processAllAvailable()
    # batch 2: a near-dup of doc 1 (one word changed) + a fresh doc
    write([(3, DOC.replace("quietly", "loudly")),
           (4, "yet another unrelated document with its own vocabulary "
               "entirely disjoint from previous content")])
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(str(tmp_path / "state/matches"))
    pairs = {(r.a, r.b): (r.jaccard, r.batch_id) for r in got.collect()}
    # cross-batch detection: doc 3 (batch 1 index lookup) matched doc 1
    assert (3, 1) in pairs
    jac, batch_id = pairs[(3, 1)]
    assert jac >= 0.4 and batch_id == 1
    # no false positives among the unrelated docs
    assert all(a == 3 and b == 1 for (a, b) in pairs)


def test_streaming_neardup_within_batch(spark, tmp_path):
    """New-vs-new collisions inside one batch are caught too."""
    src = str(tmp_path / "docs_src2")
    spark.createDataFrame(
        [(10, DOC), (11, DOC)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = stream_parquet_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = streaming_neardup(
        stream, str(tmp_path / "state2"),
        checkpoint_dir=str(tmp_path / "ck2"),
        threshold=0.9,
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(tmp_path / "state2/matches")).collect()
    assert {(r.a, r.b) for r in got} == {(11, 10)}
    assert got[0].jaccard == 1.0
