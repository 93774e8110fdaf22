"""`stream_curation` (staged for the round-8 gate, VERDICT r6 item 6):
the end-to-end incremental curation pipeline — file-stream source ->
incremental near-dup -> quality gate -> packed sink via replay-safe
foreachBatch merge — must equal its single-pass batch oracle AND must be
demonstrably incremental (per-batch state appends, replays are no-ops,
the packing offset carries across batches)."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.queries import stream_curation_sql
from flink_kafka_table_api_spark.streaming.curation_pipeline import (
    stream_curate_pack,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("streamcur"))
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    out = stream_curate_pack(
        spark, docs, state, threshold=0.5, quality_threshold=0.5,
        budget=256, chunks=2, portable=True,
    )
    return state, sorted(tuple(r) for r in out.collect())


def test_matches_single_pass_batch_oracle(result):
    """The streamed two-batch run reproduces the full-corpus replay
    bit-for-bit: same kept set, same n_tokens, same seq layout."""
    state, got = result
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = sorted(tuple(r) for r in con.execute(stream_curation_sql()).fetchall())
    assert len(got) == len(exp) > 0
    assert got == exp


def test_state_is_incremental_per_batch(result, spark):
    """Both micro-batches published their own BATCH-SCOPED state
    directories (band index + matches tagged by batch) — batch 1's
    processing added its own directory, never rewriting batch 0's."""
    state, _ = result
    bands_dir = os.path.join(state, "dedup", "band_index")
    assert sorted(os.listdir(bands_dir)) == ["batch-0", "batch-1"]
    from flink_kafka_table_api_spark.streaming.incremental_dedup import (
        IncrementalDedup,
    )

    matches = IncrementalDedup(os.path.join(state, "dedup")).matches(spark)
    assert {r.batch_id for r in matches.select("batch_id").distinct().collect()} <= {0, 1}
    # the packed sink accumulated across batches (one batch-scoped
    # publish per batch with kept rows), each guarded by its marker
    assert sorted(os.listdir(os.path.join(state, "commits"))) == [
        "batch-0", "batch-1",
    ]
    assert sorted(os.listdir(os.path.join(state, "packed"))) == [
        "batch-0", "batch-1",
    ]


def test_offset_carries_the_running_token_total(result, spark):
    state, got = result
    meta = json.load(
        open(os.path.join(state, "offsets", "batch-1.json"))
    )
    assert meta["token_total"] == sum(r[1] for r in got)
    # batch 0's published snapshot is the exclusive prefix batch 1 read
    meta0 = json.load(
        open(os.path.join(state, "offsets", "batch-0.json"))
    )
    assert 0 < meta0["token_total"] < meta["token_total"]
    # seq ids are the pure floor(cum_exclusive/budget) of that axis
    cum = 0
    for doc_id, n_tokens, seq_id in got:  # rows sorted by doc_id
        assert seq_id == cum // 256
        cum += n_tokens


def test_replay_is_a_no_op(result, spark):
    """Re-running the stream over the same state dir re-delivers the
    files, but the commit markers make every batch a no-op: the sink is
    unchanged (the recovery contract of the foreachBatch merge)."""
    state, got = result
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    import shutil

    shutil.rmtree(os.path.join(state, "ckpt"))  # force full re-delivery
    out = stream_curate_pack(
        spark, docs, state, threshold=0.5, quality_threshold=0.5,
        budget=256, chunks=2, portable=True,
    )
    assert sorted(tuple(r) for r in out.collect()) == got


def _rerun(spark, state):
    """Re-deliver every file through a fresh checkpoint over the SAME
    state dir — the recovery path."""
    import shutil

    shutil.rmtree(os.path.join(state, "ckpt"), ignore_errors=True)
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    return stream_curate_pack(
        spark, docs, state, threshold=0.5, quality_threshold=0.5,
        budget=256, chunks=2, portable=True,
    )


def test_crash_after_dedup_before_sink_replays_clean(spark, tmp_path):
    """Kill the job between the dedup-state publish and the sink publish
    of batch 1 (marker absent, dedup state present): the replay must
    treat the dedup work as done (its indexed marker exists), recompute
    the pack from batch 0's published offset, and converge to the exact
    single-pass result — no duplicated sink rows, no double-counted
    offset (round-7 ADVICE: pre-marker side effects must not corrupt
    later seq_ids)."""
    import shutil

    state = str(tmp_path / "crash1")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    full = stream_curate_pack(
        spark, docs, state, threshold=0.5, quality_threshold=0.5,
        budget=256, chunks=2, portable=True,
    )
    want = sorted(tuple(r) for r in full.collect())
    # simulate the crash point: batch 1's pipeline-level side effects
    # (sink rows, offset snapshot, marker) vanish; its dedup state stays
    os.remove(os.path.join(state, "commits", "batch-1"))
    os.remove(os.path.join(state, "offsets", "batch-1.json"))
    shutil.rmtree(os.path.join(state, "packed", "batch-1"))
    out = _rerun(spark, state)
    got = sorted(tuple(r) for r in out.collect())
    assert got == want
    # no duplicated doc ever reaches the sink
    assert len({r[0] for r in got}) == len(got)


def test_crash_mid_dedup_publish_replays_clean(spark, tmp_path):
    """Kill the job mid-way through IncrementalDedup's own publish of
    batch 1 (its indexed marker absent, some batch-scoped state dirs
    already on disk): the replay must scrub the partial directories and
    recompute them against an index that does NOT contain the batch's
    own half-written output."""
    import shutil

    state = str(tmp_path / "crash2")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    full = stream_curate_pack(
        spark, docs, state, threshold=0.5, quality_threshold=0.5,
        budget=256, chunks=2, portable=True,
    )
    want = sorted(tuple(r) for r in full.collect())
    # crash point: dedup batch 1 published bands+matches but not its
    # marker; nothing downstream of the dedup ran
    dedup = os.path.join(state, "dedup")
    os.remove(os.path.join(dedup, "indexed", "batch-1"))
    shutil.rmtree(os.path.join(dedup, "doc_store", "batch-1"))
    os.remove(os.path.join(state, "commits", "batch-1"))
    os.remove(os.path.join(state, "offsets", "batch-1.json"))
    shutil.rmtree(os.path.join(state, "packed", "batch-1"))
    out = _rerun(spark, state)
    got = sorted(tuple(r) for r in out.collect())
    assert got == want
    assert len({r[0] for r in got}) == len(got)
    # the scrub+recompute left exactly one published directory per batch
    assert sorted(os.listdir(os.path.join(dedup, "band_index"))) == [
        "batch-0", "batch-1",
    ]


def test_pack_sequences_empty_input_yields_empty_layout(spark):
    """An all-dropped batch must pack to an empty frame (schema intact),
    not crash on a None id span — the pipeline feeds pack_sequences
    whatever survives the gates, including nothing."""
    from flink_kafka_table_api_spark.operators.curation import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = pack_sequences(empty, budget=256, start_offset=123)
    assert out.columns == ["doc_id", "n_tokens", "seq_id"]
    assert out.count() == 0
