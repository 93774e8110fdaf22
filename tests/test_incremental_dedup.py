"""Streaming incremental near-dup detection: later batches must be checked
against everything already indexed, without rescanning it."""

from __future__ import annotations

import os

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

    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    got = IncrementalDedup(str(tmp_path / "state")).matches(spark)
    pairs = {(r.a, r.b): (r.jaccard, r.batch_id) for r in got.collect()}
    # cross-batch detection: doc 3 (batch 1 index lookup) matched doc 1
    assert (3, 1) in pairs
    jac, batch_id = pairs[(3, 1)]
    assert jac >= 0.4 and batch_id == 1
    # no false positives among the unrelated docs
    assert all(a == 3 and b == 1 for (a, b) in pairs)


def test_incremental_arbitrary_ids(spark, tmp_path):
    """Regression: a new doc whose id sorts BELOW an indexed near-dup's id
    must still be flagged. (The round-1 candidate filter `a > b` silently
    dropped every such pair — correctness depended on ids arriving in
    monotonically increasing order.)"""
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    dd = IncrementalDedup(str(tmp_path / "state_arb"), threshold=0.4)
    # batch 0 indexes a HIGH id; batch 1 brings a LOW-id near-dup of it
    dd.process_batch(
        spark.createDataFrame([(100, DOC)], "doc_id long, text string"), 0
    )
    dd.process_batch(
        spark.createDataFrame(
            [(5, DOC.replace("quietly", "loudly"))], "doc_id long, text string"
        ),
        1,
    )
    got = {(r.a, r.b): r.batch_id for r in dd.matches(spark).collect()}
    # orientation is (new doc, indexed doc) for cross-batch pairs
    assert (5, 100) in got and got[(5, 100)] == 1


def test_incremental_state_is_o_corpus(spark, tmp_path):
    """Bounded-state contract: the band index holds exactly bands rows per
    indexed doc — O(corpus), never O(batches x corpus). Re-processing more
    batches must grow state only by the NEW docs they carry."""
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    dd = IncrementalDedup(str(tmp_path / "state_sz"), threshold=0.9)
    docs_per_batch, n_batches = 3, 4
    for b in range(n_batches):
        rows = [
            (b * docs_per_batch + i, f"unique text {b}-{i} " + DOC[: 30 + i])
            for i in range(docs_per_batch)
        ]
        dd.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), b
        )
    n_docs = docs_per_batch * n_batches

    def read_state(path):
        return spark.read.option("recursiveFileLookup", "true").parquet(path)

    band_rows = read_state(dd.bands_path).count()
    assert band_rows == n_docs * dd.bands  # one row per (doc, band)
    doc_rows = read_state(dd.docs_path).count()
    assert doc_rows == n_docs
    # batch-scoped layout: one published directory per batch (the replay
    # idempotence unit)
    import glob

    assert len(glob.glob(dd.bands_path + "/batch-*")) == n_batches

    # compaction rewrites per-batch file litter without changing state
    # content (or the batch layout): later batches still dedup against
    # everything. AQE's cached-plan coalescing now publishes each batch
    # as a single file already, so fragment one batch directory by hand
    # to give compaction actual litter to rewrite.
    frag = dd.bands_path + "/batch-0"
    read_state(frag).repartition(4).write.mode("overwrite").parquet(frag + "__tmp")
    import shutil

    shutil.rmtree(frag)
    os.rename(frag + "__tmp", frag)
    files_before = len(glob.glob(dd.bands_path + "/batch-*/*.parquet"))
    assert len(glob.glob(frag + "/*.parquet")) > 1
    dd.compact_state(spark)
    files_after = len(glob.glob(dd.bands_path + "/batch-*/*.parquet"))
    assert files_after < files_before
    assert read_state(dd.bands_path).count() == band_rows
    dd.process_batch(
        spark.createDataFrame(
            [(999, f"unique text 0-0 " + DOC[:30])],  # near-dup of doc 0
            "doc_id long, text string",
        ),
        n_batches,
    )
    got = {(r.a, r.b) for r in dd.matches(spark).collect()}
    assert (999, 0) in got  # the compacted index still serves lookups


def test_verify_stage_is_candidate_bounded(spark, tmp_path):
    """Scale contract for step 3: the exact-Jaccard verify stage shingles
    ONLY docs named in a candidate pair — a batch with zero candidates must
    shingle zero docs no matter how large the accumulated doc store is, and
    the plan must prune via a LeftSemi join BELOW the shingle projection."""
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    dd = IncrementalDedup(str(tmp_path / "state_vb"), threshold=0.4)
    # index 20 docs so the store is visibly larger than any candidate set
    dd.process_batch(
        spark.createDataFrame(
            [(i, f"stored document number {i} " + DOC) for i in range(20)],
            "doc_id long, text string",
        ),
        0,
    )
    doc_store = spark.read.option(
        "recursiveFileLookup", "true"
    ).parquet(dd.docs_path)
    batch = spark.createDataFrame(
        [(900, "vocabulary entirely disjoint zebra quartz fjord")],
        "doc_id long, text string",
    )
    empty_cand = spark.createDataFrame([], "a long, b long")
    # zero candidates -> zero shingled rows, despite 21 docs of input
    assert dd._verify_shingles(doc_store, batch, empty_cand).count() == 0
    # one candidate pair -> exactly its two member docs get shingled
    one_cand = spark.createDataFrame([(900, 3)], "a long, b long")
    sh = dd._verify_shingles(doc_store, batch, one_cand)
    assert {r.doc_id for r in sh.collect()} == {900, 3}
    # the prune is a semi-join in the plan, i.e. it happens on the scan
    # side rather than after shingling
    assert "LeftSemi" in sh._jdf.queryExecution().optimizedPlan().toString()


def test_streaming_band_bucket_cap_engages_under_skew(spark, tmp_path):
    """Boilerplate-skew defusal INSIDE the streaming index join (round-7
    VERDICT item 4): a hot template flooding one band bucket must stop
    producing candidates once the ACCUMULATED occupancy (index + batch)
    crosses max_bucket_size, via a broadcast anti-join — never a
    re-shuffle of the bands — while genuinely near-dup docs with their
    own vocabulary are still caught in the same batch."""
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    dd = IncrementalDedup(
        str(tmp_path / "state_skew"), threshold=0.4, max_bucket_size=8,
        capture_plans=True,
    )
    hot = "hot boilerplate template " + DOC
    # batch 0: 6 hot copies — bucket occupancy 6 <= 8, pairs still emitted
    dd.process_batch(
        spark.createDataFrame(
            [(i, hot) for i in range(6)], "doc_id long, text string"
        ),
        0,
    )
    m0 = {(r.a, r.b) for r in dd.matches(spark).collect()}
    assert len(m0) == 15  # C(6,2): below the cap the pairs flow
    # batch 1: 6 more hot copies (occupancy 12 > 8 in EVERY band — the
    # cap must drop them all) + one real near-dup pair of fresh docs
    fresh = ("fresh vocabulary entirely disjoint zebra quartz fjord "
             "glyph vex jumbo wharf sphinx quack")
    dd.process_batch(
        spark.createDataFrame(
            [(100 + i, hot) for i in range(6)]
            + [(200, fresh), (201, fresh.replace("jumbo", "mighty"))],
            "doc_id long, text string",
        ),
        1,
    )
    m1 = {
        (r.a, r.b)
        for r in dd.matches(spark).filter(F.col("batch_id") == 1).collect()
    }
    # the capped mega-bucket produced nothing; the real pair survived
    assert m1 == {(201, 200)}
    # recall semantics: pairs detected while the bucket was small remain
    # (incremental recall is a superset of the capped single-pass run)
    assert m0 <= {(r.a, r.b) for r in dd.matches(spark).collect()}
    # the cap reached the physical plan as a broadcast anti-join — the
    # bands tables were not re-shuffled for it
    plan = dd.last_candidate_plan
    assert "LeftAnti" in plan and "Broadcast" in plan


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
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    got = IncrementalDedup(str(tmp_path / "state2")).matches(spark).collect()
    assert {(r.a, r.b) for r in got} == {(11, 10)}
    assert got[0].jaccard == 1.0
