"""End-to-end INCREMENTAL curation pipeline (round-6 VERDICT item 6):

    file-stream source -> incremental near-dup -> quality gate
        -> packed sink via replay-safe foreachBatch merge

the streaming generalization of the batch `llm_curation` flow and of the
reference's continuous-insert lifecycle (TransactionProcessor.java:192,
215-223 — a long-lived job that keeps folding newly arriving records into
maintained output state).

Per micro-batch, NOTHING already processed is rescanned:

- near-dup state is the `IncrementalDedup` band index — the new batch's
  band signatures bucket-join against the ACCUMULATED index (signatures,
  never documents), and only candidate pairs pull shingles from the doc
  store;
- the quality gate is a stateless narrow pass over the batch;
- sequence packing continues from a persisted running token total, so
  `seq_id` (a pure function of the global exclusive cumulative token sum)
  comes out IDENTICAL to a single full-corpus packing run;
- the sink merge is idempotent via per-batch commit markers (a replayed
  batch after recovery is a no-op), the streaming/upsert.py recipe —
  and every side effect of a batch (the dedup state, the packed sink
  rows, the carried token total) is a BATCH-SCOPED overwrite published
  BEFORE the marker, so a crash mid-batch replays into a scrub +
  deterministic recompute instead of duplicated appends: the offset
  chain reads batch N-1's published total, never a mutable global file,
  so a half-committed batch can neither double-count tokens nor corrupt
  any later seq_id.

At 100 TB this is the shape that matters: a daily crawl drop of X GB costs
O(X) work against the standing index — index size affects only the
bucket-join's build side (signatures: k longs per indexed doc), never a
re-shuffle of the accumulated corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Observation

from flink_kafka_table_api_spark.operators.curation import pack_sequences
from flink_kafka_table_api_spark.operators.text import quality_score_col
from flink_kafka_table_api_spark.streaming.chunk_stats import (
    ChunkStats,
    stat_max,
    stat_min,
)
from flink_kafka_table_api_spark.streaming.incremental_dedup import (
    IncrementalDedup,
)
from flink_kafka_table_api_spark.streaming.late_data import stage_chunked_by
from flink_kafka_table_api_spark.caching import replan_cached_plans


def stage_ordered_chunks(
    docs: DataFrame, out_dir: str, *, id_col: str = "doc_id",
    chunks: int = 2, id_bounds: tuple[int, int] | None = None,
) -> str:
    """Stage a bounded corpus as `chunks` parquet files split by id range
    (chunk 0 = lowest ids), with strictly increasing mtimes so Spark's
    file-stream source replays them as deterministic micro-batches in id
    order — the bounded twin of a dated crawl-drop directory.

    `id_bounds` lets a caller that already knows the EXACT (min, max) of
    `id_col` (e.g. from parquet footer statistics over the raw input —
    queries._documents_id_bounds) skip this function's min/max scan job;
    unlike pack_sequences' cover semantics these bounds must be exact,
    because the chunk-0 floor anchors the id terciles the oracle replays."""
    lo, hi = (
        id_bounds if id_bounds is not None
        else docs.agg(F.min(id_col), F.max(id_col)).first()
    )
    span = max((hi - lo + 1 + chunks - 1) // chunks, 1)
    # (id - lo) div span reproduces the range filter [lo+i*span,
    # lo+(i+1)*span) exactly; the shared one-pass stager replaces the
    # per-chunk filter+coalesce jobs (one input scan instead of `chunks`)
    chunked = docs.withColumn(
        "__chunk", F.expr(f"(`{id_col}` - {lo}) div {span}")
    )
    return stage_chunked_by(
        chunked, out_dir, chunk_col="__chunk", n_chunks=chunks,
        columns=list(docs.columns),
    )


def stream_curate_pack(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    *,
    threshold: float = 0.5,
    quality_threshold: float = 0.5,
    budget: int = 256,
    chunks: int = 2,
    portable: bool = True,
    id_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Run the incremental curation pipeline over `docs` staged as a
    file stream of `chunks` micro-batches; return the packed sink
    (doc_id, n_tokens, seq_id) — bit-identical to quality-filtering +
    keep-first-near-dup + packing the whole corpus in one batch run,
    which is exactly what the DuckDB oracle replays."""
    src_dir = stage_ordered_chunks(
        docs.select("doc_id", "text"), os.path.join(state_dir, "src"),
        chunks=chunks, id_bounds=id_bounds,
    )
    ckpt = os.path.join(state_dir, "ckpt")
    # per-chunk id min/max ride ONE staging-time job (chunk_stats.py):
    # kept ⊆ batch, so each batch's file bounds are a valid COVER for
    # pack_sequences' bucketing (bounds never reach the output), letting
    # it skip its per-batch min/max aggregate job
    stats = ChunkStats(
        spark, src_dir, "doc_id long, text string",
        {"mn": F.min("doc_id"), "mx": F.max("doc_id")},
    )
    sink = os.path.join(state_dir, "packed")
    marker_dir = os.path.join(state_dir, "commits")
    offsets_dir = os.path.join(state_dir, "offsets")
    inc = IncrementalDedup(
        os.path.join(state_dir, "dedup"),
        threshold=threshold, portable=portable,
    )

    def offset_after(batch_id: int) -> int:
        """Published running token total after `batch_id` (0 before the
        first batch). Reading the PREVIOUS batch's immutable snapshot —
        not a mutable global file — is what makes a replayed
        half-committed batch recompute the same offset it saw the first
        time instead of double-counting its own tokens."""
        if batch_id < 0:
            return 0
        return json.load(
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"))
        )["token_total"]

    def process(batch: DataFrame, batch_id: int) -> None:
        import shutil

        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(offsets_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed after recovery: already merged
        # crash-replay scrub: without a marker, any batch-scoped output
        # on disk is partial — remove it so the recompute publishes clean
        shutil.rmtree(
            os.path.join(sink, f"batch-{batch_id}"), ignore_errors=True
        )
        batch = batch.persist()
        # 1) incremental near-dup: batch signatures vs accumulated index
        #    (process_batch is itself idempotent: marker-guarded,
        #    batch-scoped state, scrub-on-replay)
        inc.process_batch(batch, batch_id)
        # matches involving THIS batch's docs, newer side (`a`) dropped —
        # the keep-first-copy rule; a batch doc matching an indexed doc OR
        # a smaller-id doc in the same batch is the newer side
        dropped = (
            inc.matches(spark)
            .filter(F.col("batch_id") == batch_id)
            .select(F.col("a").alias("doc_id"))
            # no .distinct(): only ever the anti-join's build side, whose
            # hash relation dedups keys — the exchange was a wasted stage
        )
        # 2) quality gate: the score as ONE filter column over the
        #    anti-join output — the earlier feature-frame + self-join
        #    shape re-executed the kept pipeline twice per batch for the
        #    same rows (identical score expression, identical rounding)
        kept = batch.join(dropped, "doc_id", "left_anti").filter(
            quality_score_col("text") >= quality_threshold
        )
        # persist: kept feeds pack_sequences' id-bounds aggregate AND the
        # packed layout below — without it the dedup anti-join re-runs
        # once per consumer (measured ~0.5 s/batch at sf0.1)
        kept = kept.persist()
        # 3) packing continues from the PREVIOUS batch's published token
        # total (pack_sequences handles an all-dropped batch: empty
        # layout, zero new tokens — no extra emptiness probe job needed)
        offset = offset_after(batch_id - 1)
        srows = stats.for_batch(ckpt, batch_id)
        mn = stat_min(srows, "mn") if srows is not None else None
        bounds = (
            (int(mn), int(stat_max(srows, "mx")))
            if srows is not None and mn is not None
            else None
        )
        packed = pack_sequences(
            kept, budget=budget, start_offset=offset, id_bounds=bounds
        )
        # 4) publish: batch-scoped sink overwrite + this batch's offset
        #    snapshot, marker LAST — the commit point (doc_ids are unique
        #    across batches, so the sink union is an append of new keys;
        #    the marker makes replays no-ops, and the scrub above makes
        #    mid-batch-crash replays clean recomputes). The token total
        #    rides the write as an observed metric — same value the
        #    separate agg job computed, one less job per batch.
        obs = Observation()
        packed.observe(obs, F.sum("n_tokens").alias("t")).write.mode(
            "overwrite"
        ).parquet(os.path.join(sink, f"batch-{batch_id}"))
        new_tokens = obs.get["t"] or 0
        json.dump(
            {"token_total": int(offset + new_tokens)},
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"), "w"),
        )
        kept.unpersist()
        batch.unpersist()
        open(marker, "w").close()

    schema = docs.select("doc_id", "text").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    with replan_cached_plans(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not IncrementalDedup._has_parts(sink):
        # every batch was filtered to nothing: typed empty sink
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, seq_id long"
        )
    return (
        spark.read.schema("doc_id long, n_tokens long, seq_id long")
        .option("recursiveFileLookup", "true").parquet(sink)
        .select("doc_id", "n_tokens", "seq_id")
    )
