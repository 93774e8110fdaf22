"""Streaming ANN index ingest (`streaming/ann_ingest.py`, built round 8,
registration-bound for round 9): embedding drops arrive as micro-batches
and are published exactly-once into a cluster-partitioned IVF index that
stays queryable with partition pruning. Pre-validated here against a
full-value DuckDB replay (fixed vec_id<8 centroids make assignment +
routing + re-rank SQL-expressible, no contract booleans needed), a
one-shot batch index build (incremental == batch, bit-for-bit), crash
replay, committed-replay idempotence, and the pruned-scan plan shape."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.queries import stream_ann_ingest_sql
from flink_kafka_table_api_spark.operators import similarity as sim
from flink_kafka_table_api_spark.streaming.ann_ingest import stream_ann_ingest

SF = "/root/testdata/sf0.001"
N_CHUNKS = 3

# The full-value replay moved to queries.py for the round-9
# registration (assignment + routing + re-rank + conservation).
ORACLE_SQL = stream_ann_ingest_sql(n_chunks=N_CHUNKS)


def _chunked(spark):
    return read_table(spark, SF, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") % N_CHUNKS).alias("__chunk")
    )


def _centroids(spark):
    return read_table(spark, SF, "embeddings").filter(
        F.col("vec_id") < 8
    ).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_embedding")
    )


def _run(spark, state_dir):
    return stream_ann_ingest(
        spark, _chunked(spark), str(state_dir),
        n_chunks=N_CHUNKS, centroids=_centroids(spark), nprobe=1, k=10,
    )


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    state = tmp_path_factory.mktemp("ann_ingest")
    out = _run(spark, state)
    rows = sorted(tuple(r) for r in out.collect())
    return {"rows": rows, "state": str(state)}


def test_matches_duckdb_full_value_replay(result):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    exp = sorted(tuple(r) for r in con.execute(ORACLE_SQL).fetchall())
    # 10 topk + 1 conservation + N_CHUNKS centroid-drift rows
    assert len(result["rows"]) == len(exp) == 11 + N_CHUNKS
    assert result["rows"] == exp


def test_incremental_index_equals_one_shot_batch_build(result, spark,
                                                       tmp_path):
    """The defining claim: the accumulated streaming index is the SAME
    rowset as `ivf_build_index` over the union of all drops — assignment
    is stateless, so batching cannot change it."""
    batch_path = str(tmp_path / "batch_index")
    emb = read_table(spark, SF, "embeddings")
    sim.ivf_build_index(emb, _centroids(spark), batch_path)
    got = sorted(
        tuple(r) for r in spark.read.parquet(
            os.path.join(result["state"], "index")
        ).select("vec_id", "cluster").collect()
    )
    want = sorted(
        tuple(r) for r in spark.read.parquet(batch_path)
        .select("vec_id", "cluster").collect()
    )
    assert got == want and len(got) > 0


def test_publishes_are_batch_scoped_and_append_only(result, spark):
    """Each drop lands in its own batch_id partition; per-batch rowcounts
    equal the chunk sizes, so no batch rewrote another's files."""
    index = os.path.join(result["state"], "index")
    dirs = sorted(
        d for d in os.listdir(index) if d.startswith("batch_id=")
    )
    assert dirs == [f"batch_id={i}" for i in range(N_CHUNKS)]
    per_batch = {
        int(r.batch_id): r.n for r in spark.read.parquet(index)
        .groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    chunk_sizes = {
        int(r.c): r.n for r in _chunked(spark)
        .groupBy(F.col("__chunk").alias("c"))
        .agg(F.count("*").alias("n")).collect()
    }
    assert per_batch == chunk_sizes


def test_crash_mid_batch_replays_clean(spark, tmp_path):
    """A crash between the index publish and the marker: the replay must
    scrub the orphaned batch partition and republish — identical final
    rows, no duplicates."""
    state = tmp_path / "crash"
    want = sorted(tuple(r) for r in _run(spark, state).collect())
    last = N_CHUNKS - 1
    os.remove(os.path.join(str(state), "commits", f"batch-{last}"))
    shutil.rmtree(os.path.join(str(state), "ckpt"))
    got = sorted(tuple(r) for r in _run(spark, state).collect())
    assert got == want


def test_replay_of_committed_batches_is_a_noop(spark, tmp_path):
    """Checkpoint loss with all markers intact: every batch replays and
    skips; the index is not double-published (n_indexed unchanged)."""
    state = tmp_path / "replay"
    want = sorted(tuple(r) for r in _run(spark, state).collect())
    shutil.rmtree(os.path.join(str(state), "ckpt"))
    got = sorted(tuple(r) for r in _run(spark, state).collect())
    assert got == want


def test_query_scan_is_partition_pruned(result, spark):
    """The query path must prune to the probed cluster at the SCAN across
    all batch_id partitions — PartitionFilters on `cluster`, never a full
    index read."""
    index = os.path.join(result["state"], "index")
    emb = read_table(spark, SF, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    qclusters = sim.ivf_route(_centroids(spark), query, nprobe=1)
    plan = (
        sim.ivf_topk_indexed(spark, index, qclusters, query, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:")[1][:300]
    assert "cluster" in seg


def test_empty_source_yields_empty_result(spark, tmp_path):
    empty = _chunked(spark).filter(F.lit(False))
    out = stream_ann_ingest(
        spark, empty, str(tmp_path / "empty"),
        n_chunks=1, centroids=_centroids(spark),
        query=_chunked(spark).limit(1).select(
            F.col("embedding").alias("q_embedding")
        ),
    )
    assert out.count() == 0 or [
        r.block for r in out.collect()
    ] == ["n_indexed"]
