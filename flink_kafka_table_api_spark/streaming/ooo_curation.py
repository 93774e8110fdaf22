"""Out-of-order incremental curation (round 8): the `stream_curation`
pipeline generalized to crawl drops whose contents are NOT in doc-id
order — the shape VERDICT r7 item 7 asked for ("real crawl drops
aren't" in order).

`stream_curate_pack` (curation_pipeline.py) assumes drops arrive in id
order, so keep-FIRST-ARRIVAL equals keep-SMALLEST-ID and packing can
emit every batch immediately. Out of order, both break: a smaller-id
near-dup arriving later should have won, and packing (seq_id = pure
function of the id-ordered cumulative token sum) cannot emit a doc
while a smaller id can still arrive. This module fixes both with a
WATERMARK over doc_id (the event-time proxy: smaller id = older doc):

  per micro-batch k (foreachBatch):
    1. ADMIT:    rows with doc_id >  W_{k-1} (the stored watermark);
                 rows at or below it are too-late — their finalization
                 horizon has passed — and are dropped DETERMINISTICALLY
                 (an auditable function of drop boundaries, exactly the
                 Spark windowed-agg contract stream_late_events pins);
    2. DEDUP:    IncrementalDedup over the admitted rows (bucket-join vs
                 the accumulated index, capped, batch-scoped state);
    3. ADVANCE:  W_k = max(doc_id SEEN through batch k) - delay — seen,
                 not admitted: dropped rows still advance the watermark,
                 matching Spark (stats upstream of the filter);
    4. FINALIZE: the admitted docs with W_{k-1} < doc_id <= W_k. No
                 future admitted doc can have a smaller id than any of
                 these (future admission requires id > W_k), so their
                 keep/drop status is now immutable. The buffer IS the
                 dedup doc store — no second mutable state table;
    5. KEEP:     drop every finalized doc that is the LARGER side of any
                 verified near-dup pair accumulated so far (keep-
                 smallest-id, not keep-first-arrival — the single-pass
                 semantics restored under reordering);
    6. PACK:     quality-gate the kept docs and pack them in id order
                 from the carried token offset. Finalization intervals
                 (W_{k-1}, W_k] are disjoint and increasing, so the
                 global pack order IS doc-id order: seq_id comes out
                 identical to one full pass over the final kept set.

Why step 5 is sound: a pair (x, y), y < x, can only drop x. For x
finalized at batch k, y must have been admitted at some batch <= k
(admission after k would require y > W_k >= x > y); IncrementalDedup
runs on admission, so the pair is in the accumulated matches when x
finalizes. Docs above the terminal watermark stay buffered (in state,
unpacked) — exactly like unemitted streaming windows; a longer-running
stream finalizes them on the next drop.

Crash safety: the curation_pipeline.py recipe verbatim — every batch
side effect is a batch-scoped overwrite (packed/batch-N,
offsets/batch-N.json carrying {token_total, watermark, max_seen}, the
dedup state) published before a last-written marker; replays of
committed batches are no-ops, mid-batch crashes scrub and recompute.

At 100 TB: admission/finalization are O(batch) id comparisons against
two scalars; the only joins are the dedup bucket-join (capped) and the
finalize-ids x matches anti-join (matches restricted to the finalize
window). State is the dedup index + the buffered tail (docs inside the
lateness horizon) — bounded by horizon width, not corpus age.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Observation

from flink_kafka_table_api_spark.operators.curation import pack_sequences
from flink_kafka_table_api_spark.operators.text import quality_score_col
from flink_kafka_table_api_spark.streaming.incremental_dedup import (
    IncrementalDedup,
)
from flink_kafka_table_api_spark.streaming.chunk_stats import (
    ChunkStats,
    stat_max,
    stat_min,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans
from flink_kafka_table_api_spark.streaming.late_data import stage_chunked_by


def stream_curate_pack_ooo(
    spark: SparkSession,
    docs_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    delay: int,
    chunk_col: str = "__chunk",
    threshold: float = 0.5,
    quality_threshold: float = 0.5,
    budget: int = 256,
    portable: bool = True,
) -> DataFrame:
    """Run the watermarked out-of-order curation pipeline over
    `docs_chunked` (doc_id, text, `chunk_col`) staged as `n_chunks`
    micro-batch drops; return the packed sink (doc_id, n_tokens,
    seq_id) for every doc finalized by the terminal watermark —
    bit-identical to one batch pass over the watermark-admitted subset
    (the DuckDB oracle in queries.py replays exactly that)."""
    src = stage_chunked_by(
        docs_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks,
        columns=["doc_id", "text"],
    )
    ckpt = os.path.join(state_dir, "ckpt")
    # watermark-advance maxima AND pack-bounds minima ride ONE
    # staging-time job instead of per-micro-batch agg jobs
    # (chunk_stats.py; guide §1.2)
    stats = ChunkStats(
        spark, src, "doc_id long, text string",
        {"mn": F.min("doc_id"), "mx": F.max("doc_id")},
    )
    # smallest id across the whole staged drop set: a valid lower COVER
    # for any finalized interval (used when no previous watermark exists)
    all_rows = [r for rows in stats.by_file.values() for r in rows]
    global_min = stat_min(all_rows, "mn")
    sink = os.path.join(state_dir, "packed")
    marker_dir = os.path.join(state_dir, "commits")
    offsets_dir = os.path.join(state_dir, "offsets")
    inc = IncrementalDedup(
        os.path.join(state_dir, "dedup"),
        threshold=threshold, portable=portable,
    )

    def meta_after(batch_id: int) -> dict:
        if batch_id < 0:
            return {"token_total": 0, "watermark": None, "max_seen": None}
        return json.load(
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"))
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(offsets_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed after recovery: already merged
        shutil.rmtree(
            os.path.join(sink, f"batch-{batch_id}"), ignore_errors=True
        )
        prev = meta_after(batch_id - 1)
        wm_prev = prev["watermark"]
        batch = batch.select("doc_id", "text")
        # 1) admit: too-late rows (id at/below the watermark) drop here,
        #    but still advance max_seen below — the Spark contract
        admitted = (
            batch if wm_prev is None
            else batch.filter(F.col("doc_id") > wm_prev)
        )
        # 2) dedup the admitted rows against the accumulated index
        inc.process_batch(admitted, batch_id)
        # 3) advance the watermark from everything SEEN (sidecar;
        #    in-batch aggregate only if the files don't resolve)
        srows = stats.for_batch(ckpt, batch_id)
        batch_max = (
            batch.agg(F.max("doc_id")).first()[0] if srows is None
            else stat_max(srows, "mx")
        )
        seen = [m for m in (prev["max_seen"], batch_max) if m is not None]
        max_seen = max(seen) if seen else None
        new_wm = None if max_seen is None else int(max_seen) - delay
        # 4) finalize the id interval this watermark advance closed; the
        #    buffer is the dedup doc store (admitted docs, batch-scoped)
        store = inc._read_parts(spark, inc.docs_path, batch)
        fin = store.filter(F.col("doc_id") <= new_wm)
        if wm_prev is not None:
            fin = fin.filter(F.col("doc_id") > wm_prev)
        # 5) keep-smallest-id: drop finalized docs that are the LARGER
        #    side of any verified pair accumulated so far. Restricting
        #    the matches side to the finalize interval FIRST keeps the
        #    anti-join's build side O(finalized-window pairs) — without
        #    it the side grows with corpus age, the one cost a
        #    long-running stream cannot pay
        dropped = (
            inc.matches(spark)
            .select(F.greatest("a", "b").alias("doc_id"))
            .filter(F.col("doc_id") <= new_wm)
        )
        if wm_prev is not None:
            dropped = dropped.filter(F.col("doc_id") > wm_prev)
        # no forced broadcast: one interval's drop side is usually tiny
        # (AQE broadcasts it), but a pathological drop could be large —
        # let the optimizer pick
        # quality gate as ONE filter column over the anti-join output —
        # the earlier feature-frame + self-join shape re-executed the
        # kept pipeline twice per batch for the same rows (identical
        # score expression, identical rounding); persist: kept feeds
        # pack_sequences' id-bounds aggregate AND the packed layout
        # no .distinct() on the anti-join's right side: the anti-join's
        # build relation dedups keys anyway — the explicit exchange was
        # one more per-batch stage for nothing
        kept = (
            fin.join(dropped, "doc_id", "left_anti")
            .filter(quality_score_col("text") >= quality_threshold)
            .persist()
        )
        # 6) pack from the carried offset; intervals are disjoint and
        #    increasing, so the global layout is id-ordered. The token
        #    total rides the write as an observed metric — same value
        #    the separate agg job computed, one less job per batch.
        # pack bounds: kept lives in the finalized interval
        # (wm_prev, new_wm] — a known COVER, so pack_sequences skips its
        # per-batch min/max aggregate job (bucket bounds never reach the
        # output; see pack_sequences). With no previous watermark the
        # interval's floor is the drop set's global minimum id.
        lo_cover = (
            int(wm_prev) + 1 if wm_prev is not None else global_min
        )
        bounds = (
            (int(lo_cover), int(new_wm))
            if new_wm is not None and lo_cover is not None
            else None
        )
        packed = pack_sequences(
            kept, budget=budget, start_offset=prev["token_total"],
            id_bounds=bounds,
        )
        obs = Observation()
        packed.observe(obs, F.sum("n_tokens").alias("t")).write.mode(
            "overwrite"
        ).parquet(os.path.join(sink, f"batch-{batch_id}"))
        new_tokens = obs.get["t"] or 0
        json.dump(
            {
                "token_total": int(prev["token_total"] + new_tokens),
                "watermark": new_wm,
                "max_seen": None if max_seen is None else int(max_seen),
            },
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"), "w"),
        )
        kept.unpersist()
        open(marker, "w").close()

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
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
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, seq_id long"
        )
    return (
        spark.read.schema("doc_id long, n_tokens long, seq_id long")
        .option("recursiveFileLookup", "true").parquet(sink)
        .select("doc_id", "n_tokens", "seq_id")
    )
