"""Streaming SCD2 history maintenance over a CDC changelog (built
round 8, registration-bound for round 9/10).

`streaming/cdc_apply.py` materializes the changelog's CURRENT-state
snapshot — the upsert-stream shape whose insert-only special case is
the reference pipeline (TransactionProcessor.java:192). This module
maintains the full TYPE-2 HISTORY of the same changelog: one row per
admitted upsert with [effective_from, effective_to) validity and an
is_current flag, deletes closing the interval they land on. It is the
versioned "temporal table" that `streaming/temporal_join.py`'s
event-time mode conceptually reads (Flink `FOR SYSTEM_TIME AS OF`
against a versioned table — public Table API surface), maintained
incrementally instead of being derived per probe.

Why not reuse the cdc_apply state shape? Its per-batch state rewrite is
O(live keys) — fine for a snapshot, wrong for history, which is O(all
admitted ops) and would make every micro-batch cost O(stream age).
Instead the history store is a chain of per-batch DELTAS with
last-writer-wins reads:

  state/hist/batch_id=K/__kb=N/...   full REBUILT history of exactly
                              the keys touched in batch K (and nothing
                              else), hash-bucketed by key into
                              n_buckets dirs (batch_id=N dirs are the
                              shared reprocess.py convention)

  per micro-batch k (foreachBatch):
    1. ADMIT:   ops with op_ts > W_{k-1}; too-late ops are dropped
                deterministically (the cdc_apply/stream_late_events
                contract — same watermark rule, same offsets files);
    2. PRIOR:   the affected keys' current history rows = rows of the
                LATEST delta per key, read with the scan pruned to the
                batch's key-buckets (partition pruning on __kb, so a
                batch touching 3 of 64 buckets reads 3/64ths of the
                store) and semi-joined to the batch's keys;
    3. REBUILD: window over (prior ops ∪ admitted ops) per key ordered
                by (op_ts, op_id): effective_from = op_ts,
                effective_to = lead(op_ts), is_current = last row is an
                upsert. Every stored row keeps its op verbatim
                (op_id, op_ts, op, value) — including delete tombstone
                rows — so a key's ops are always recoverable from its
                latest delta alone and late-but-admitted ops splice
                into the middle of the chain correctly;
    4. PUBLISH: hist/batch_id=k + offsets/batch-k.json, marker LAST (replays
                of committed batches no-op; a mid-batch crash scrubs
                and recomputes — the curation_pipeline.py contract);
    5. COMPACT (every `compact_every` batches): fold the untouched
                keys' latest rows into batch_id=k too, making it a full
                snapshot; older deltas are then shadowed duplicates
                (last-writer-wins reads never pick them) and are
                deleted AFTER the marker — a crash mid-cleanup leaves
                harmless shadowed dirs, never a torn store.

The maintained history equals one batch pass over the admitted ops by
construction (pinned by tests/test_scd2_stream.py), so the gate oracle
is a full-value DuckDB replay of admission + LEAD-window chaining.

At 100 TB: per-batch write cost is O(history of the batch's keys), not
O(corpus); the PRIOR read is partition-pruned to the batch's buckets;
the final read's latest-delta-per-key argmax is one window over the
store (or cheap max(batch_id) join), the same cost as reading any LSM/merge-
on-read table; compaction bounds the delta-chain length exactly like
an LSM level merge, and its shadow-then-delete order makes it
crash-safe without a lock.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.cdc_apply import OPS_COLUMNS
from flink_kafka_table_api_spark.streaming.chunk_stats import (
    ChunkStats,
    stat_max,
)
from flink_kafka_table_api_spark.streaming.late_data import (
    stage_chunked_by,
    ts_shift,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

HIST_SCHEMA = (
    "key long, op_id long, op_ts timestamp, op string, value double, "
    "effective_from timestamp, effective_to timestamp, "
    "is_current boolean, __kb int"
)


def _chain(ops: DataFrame) -> DataFrame:
    """Rebuild the SCD2 interval chain for every key present in `ops`
    (columns: key, op_id, op_ts, op, value, __kb). One window shuffle,
    keyed by the same column every other stage uses."""
    w = Window.partitionBy("key").orderBy("op_ts", "op_id")
    nxt = F.lead(F.struct("op_ts", "op")).over(w)
    return ops.select(
        "key", "op_id", "op_ts", "op", "value", "__kb",
        F.col("op_ts").alias("effective_from"),
        F.coalesce(nxt["op_ts"], F.lit(None).cast("timestamp"))
        .alias("effective_to"),
        (nxt.isNull() & (F.col("op") == "U")).alias("is_current"),
    ).select(
        "key", "op_id", "op_ts", "op", "value", "effective_from",
        "effective_to", "is_current", "__kb",
    )


def _latest_per_key(hist: DataFrame) -> DataFrame:
    """Last-writer-wins read of the delta chain: each key's rows from
    the highest delta `batch_id` that contains it."""
    w = Window.partitionBy("key")
    return (
        hist.withColumn("__mb", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("__mb"))
        .drop("__mb", "batch_id")
    )


def read_history(spark: SparkSession, hist: str) -> DataFrame | None:
    """Read the raw delta chain (all surviving batch_id= dirs) with an
    explicit schema: no per-batch inference job, and an all-empty delta
    dir (admitted-nothing batch) reads as zero rows."""
    versions = [
        e.name for e in os.scandir(hist) if e.name.startswith("batch_id=")
    ] if os.path.isdir(hist) else []
    if not versions:
        return None
    return (
        spark.read.schema(HIST_SCHEMA + ", batch_id int")
        .option("basePath", hist)
        .parquet(*(os.path.join(hist, v) for v in versions))
    )


def apply_history_delta(
    spark: SparkSession,
    hist: str,
    admitted: DataFrame,
    *,
    batch_id: int,
    n_buckets: int,
    compact: bool = False,
    kbs: list[int] | None = None,
) -> None:
    """One SCD2 maintenance step, shared by stream_scd2 and the
    event-time temporal join (streaming/event_temporal_join.py): fold a
    batch of ADMITTED ops (key, op_id, op_ts, op, value, __kb) into the
    delta-chain store at `hist` as batch_id=`batch_id`. The caller owns
    admission, scrubbing, offsets, and markers; this owns the
    prior-read (pruned to the batch's key-buckets), the LEAD-window
    chain rebuild, and the delta publish (plus the full-snapshot fold
    when `compact`)."""
    prior = read_history(spark, hist)
    if prior is None:
        out = _chain(admitted)
    else:
        # driver-side list of touched buckets (≤ n_buckets ints), used
        # ONLY to prune the hist scan — the exact-key semi-join below
        # does the real restriction, so any SUPERSET of admitted's
        # buckets is output-identical. Callers with staging-time file
        # statistics pass that superset and skip this per-batch collect.
        if kbs is None:
            kbs = [
                r[0] for r in admitted.select("__kb").distinct().collect()
            ]
        latest_aff = (
            _latest_per_key(prior.filter(F.col("__kb").isin(kbs)))
            .join(admitted.select("key").distinct(), "key", "left_semi")
            if kbs else None
        )
        prior_ops = (
            latest_aff.select("key", "op_id", "op_ts", "op",
                              "value", "__kb")
            if latest_aff is not None else None
        )
        rebuilt = (
            _chain(prior_ops.unionByName(
                admitted.select("key", "op_id", "op_ts", "op",
                                "value", "__kb")))
            if prior_ops is not None else _chain(admitted)
        )
        if compact:
            untouched = _latest_per_key(prior).join(
                admitted.select("key").distinct(), "key", "left_anti"
            )
            out = rebuilt.unionByName(untouched)
        else:
            out = rebuilt
    out.write.partitionBy("__kb").mode("overwrite").parquet(
        os.path.join(hist, f"batch_id={batch_id}")
    )


def stream_scd2(
    spark: SparkSession,
    ops_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    delay: str,
    chunk_col: str = "__chunk",
    n_buckets: int = 16,
    compact_every: int | None = None,
) -> DataFrame:
    """Maintain the SCD2 history of a keyed changelog (`ops_chunked`:
    op_id, op_ts, key, op in {'U','D'}, value, `chunk_col`) delivered
    as `n_chunks` micro-batch drops, under an event-time watermark of
    `delay` (INTERVAL literal). Returns the history of every admitted
    UPSERT: (key, op_id, value, effective_from, effective_to,
    is_current) — a delete closes the interval it lands on and emits no
    row of its own. Deterministic given the drop boundaries."""
    src = stage_chunked_by(
        ops_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks, columns=OPS_COLUMNS,
    )
    ckpt = os.path.join(state_dir, "ckpt")
    # watermark-advance maxima AND per-file key-bucket sets ride ONE
    # staging-time job instead of per-micro-batch agg/collect jobs
    # (chunk_stats.py; guide §1.2). A file's bucket set is a SUPERSET of
    # its admitted subset's — valid for the hist-scan prune because the
    # exact-key semi-join inside apply_history_delta does the real
    # restriction.
    stats = ChunkStats(
        spark, src,
        "op_id long, op_ts timestamp, key long, op string, value double",
        {
            "mx": F.max("op_ts"),
            "kbs": F.collect_set(
                F.pmod(F.xxhash64("key"), F.lit(n_buckets)).cast("int")
            ),
        },
    )
    hist = os.path.join(state_dir, "hist")
    marker_dir = os.path.join(state_dir, "commits")
    offsets_dir = os.path.join(state_dir, "offsets")

    def meta_after(batch_id: int) -> dict:
        if batch_id < 0:
            return {"watermark": None, "max_seen": None}
        return json.load(
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"))
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        os.makedirs(offsets_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of a committed batch: no-op
        # crash-replay scrub: an unmarked delta is torn output
        shutil.rmtree(os.path.join(hist, f"batch_id={batch_id}"),
                      ignore_errors=True)
        prev = meta_after(batch_id - 1)
        admitted = (
            batch if prev["watermark"] is None
            else batch.filter(F.col("op_ts") > prev["watermark"])
        ).withColumn(
            "__kb", F.pmod(F.xxhash64("key"), F.lit(n_buckets)).cast("int")
        ).persist()
        compact = (
            compact_every is not None
            and (batch_id + 1) % compact_every == 0
        )
        # sidecar; in-batch aggregate/collect only if files don't resolve
        srows = stats.for_batch(ckpt, batch_id)
        file_kbs = (
            sorted({b for r in srows for b in r["kbs"]})
            if srows is not None else None
        )
        apply_history_delta(
            spark, hist, admitted,
            batch_id=batch_id, n_buckets=n_buckets, compact=compact,
            kbs=file_kbs,
        )
        batch_max = (
            batch.agg(F.max("op_ts")).first()[0] if srows is None
            else stat_max(srows, "mx")
        )
        candidates = [
            m for m in (prev["max_seen"], None if batch_max is None
                        else batch_max.isoformat()) if m is not None
        ]
        max_seen = max(candidates) if candidates else None
        new_wm = None
        if max_seen is not None:
            new_wm = ts_shift(max_seen, delay)
        json.dump(
            {"watermark": new_wm, "max_seen": max_seen},
            open(os.path.join(offsets_dir, f"batch-{batch_id}.json"), "w"),
        )
        admitted.unpersist()
        open(marker, "w").close()
        if compact:
            # b=batch_id is now a full snapshot; older deltas are
            # shadowed duplicates — deleting them AFTER the marker is
            # idempotent cleanup, crash-safe by construction
            for e in os.scandir(hist):
                if e.name.startswith("batch_id=") and \
                        int(e.name.split("=")[1]) < batch_id:
                    shutil.rmtree(e.path, ignore_errors=True)

    stream = (
        spark.readStream
        .schema("op_id long, op_ts timestamp, key long, op string, "
                "value double")
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
    full = read_history(spark, hist)
    if full is None:
        return spark.createDataFrame(
            [], "key long, op_id long, value double, "
            "effective_from timestamp, effective_to timestamp, "
            "is_current boolean",
        )
    return (
        _latest_per_key(full)
        .filter(F.col("op") == "U")
        .select("key", "op_id", "value", "effective_from",
                "effective_to", "is_current")
    )


def scd2_lookup(
    hist: DataFrame,
    probes: DataFrame,
    *,
    probe_ts: str = "probe_ts",
    bin_seconds: int | None = None,
) -> DataFrame:
    """Point-in-time enrichment against a TYPE-2 history (the payoff of
    maintaining it): each probe row joins the single version whose
    [effective_from, effective_to) interval contains its timestamp —
    `FOR SYSTEM_TIME AS OF probe_ts` against the versioned table. LEFT
    join: probes before the key's first version, after its delete, or
    for unseen keys enrich to NULL.

    One keyed equi-join with a range residual — never a window over the
    history, never a cross join. Intervals are disjoint per key by
    construction (stream_scd2's LEAD chaining), so each probe matches
    at most one row.

    `bin_seconds` adds TIME BINNING to the equi-key (the bin-based
    range-join optimization): versions explode into the time bins their
    interval overlaps (open intervals capped at max(probe_ts)), probes
    map to their own bin, and the join key becomes (key, bin). Without
    it, a zipf-hot key pays |probes_hot| x |versions_hot| candidate
    pairs before the range residual filters — measured 1.88x
    degradation at 8x zipf skew, and quadratic in key hotness at
    100 TB. With binning, a hot key's candidates are
    sum_bins(P_bin x V_bin), i.e. only versions ALIVE in the probe's
    bin — the celebrity-dimension-key join stays linear. The trade is
    the explode: a version alive for D bins stores D copies in the
    join input; pick the bin near the median version lifetime."""
    h = hist.select(
        F.col("key").alias("__hkey"),
        F.col("value").alias("dim_value"),
        F.col("op_id").alias("version_op_id"),
        "effective_from", "effective_to",
    )
    residual = (
        (h["effective_from"] <= probes[probe_ts])
        & (h["effective_to"].isNull()
           | (probes[probe_ts] < h["effective_to"]))
    )
    if bin_seconds is None:
        on = (probes["key"] == h["__hkey"]) & residual
        return probes.join(h, on, "left").drop("__hkey")
    # cap for open intervals: one bounded scalar (a 1-row aggregate)
    cap = probes.agg(F.max(probe_ts)).first()[0]
    if cap is None:
        return probes.join(h, F.lit(False), "left").drop("__hkey")
    lob = F.floor(F.unix_timestamp("effective_from") / bin_seconds)
    hib = F.floor(
        F.unix_timestamp(
            F.coalesce("effective_to", F.lit(cap).cast("timestamp"))
        ) / bin_seconds
    )
    hx = h.withColumn(
        "__bin",
        F.explode(F.sequence(
            lob.cast("long"), F.greatest(hib, lob).cast("long")
        )),
    )
    px = probes.withColumn(
        "__pbin",
        F.floor(F.unix_timestamp(F.col(probe_ts)) / bin_seconds)
        .cast("long"),
    )
    on = (
        (px["key"] == hx["__hkey"]) & (px["__pbin"] == hx["__bin"])
        & (hx["effective_from"] <= px[probe_ts])
        & (hx["effective_to"].isNull()
           | (px[probe_ts] < hx["effective_to"]))
    )
    return px.join(hx, on, "left").drop("__hkey", "__bin", "__pbin")


def reset_scd2_from(state_dir: str, batch_id: int) -> dict:
    """Selective reprocessing (streaming/reprocess.py) with the one
    extra invariant compaction introduces: a compaction snapshot is the
    ONLY surviving basis for the batches it shadowed-then-deleted, so a
    reset targeting a batch at or before the oldest surviving delta
    would delete that basis while the earlier batches' markers still
    make them no-op — silently losing their history. Valid targets are
    batch_id == 0 (full recompute: every marker goes too) or
    batch_id > the oldest surviving delta index; anything between is
    rejected loudly."""
    from flink_kafka_table_api_spark.streaming.reprocess import reset_from

    hist = os.path.join(state_dir, "hist")
    surviving = sorted(
        int(e.name.split("=")[1]) for e in os.scandir(hist)
        if e.name.startswith("batch_id=")
    ) if os.path.isdir(hist) else []
    floor = surviving[0] if surviving else 0
    if 0 < batch_id <= floor:
        raise ValueError(
            f"reset_from({batch_id}) would delete the compaction "
            f"snapshot at batch {floor} that batches < {floor} were "
            f"folded into; reset from > {floor}, or from 0 for a full "
            "recompute"
        )
    return reset_from(state_dir, batch_id)


__all__ = [
    "stream_scd2", "scd2_lookup", "reset_scd2_from",
    "apply_history_delta", "read_history",
]
