"""Watermarked LATE-data handling (round-8; VERDICT r7 item 7).

The other `stream_*` gate queries replay testdata through the streaming
engine in event-time order, so their watermark never actually drops
anything. Real crawl/event drops are NOT in order: a fraction of every
drop belongs to an earlier period (delayed collectors, retried uploads).
This module stages a bounded corpus as micro-batch files where a
deterministic slice of rows arrives one or two drops LATE, so the
watermark's admit-vs-drop behavior is exercised for real and checked
bit-for-bit against a DuckDB replay (`stream_late_events` in
queries.py).

The Spark semantics the oracle replays — pinned empirically against
Spark 4.1 (tests/test_stream_late_data.py::test_watermark_semantics_pin)
because the docs only say "late data will be dropped":

  - the watermark REPORTED for micro-batch k (and applied to state
    eviction/emission at the END of batch k) is
        W_k = max(event time over batches 0..k-1) - delay,
    i.e. watermark advancement lags arrival by ONE batch;
  - an APPEND-mode windowed aggregate emits+evicts a window in the
    first batch whose W_k >= window_end (comparator: <=, matching the
    registered stream_tumbling oracle);
  - a late row in batch k is dropped iff its window was ALREADY evicted
    (window_end <= W_{k-1}); a late row whose window is still in state
    MERGES into it — arriving one drop late is therefore harmless by
    construction (W_{k-1} lags the row's own drop), arriving two+ drops
    late crosses the eviction horizon and is dropped;
  - at availableNow termination Spark runs a final empty batch, so the
    emitted set is every window with window_end <= max(ALL event time)
    - delay (watermark stats are collected upstream of the late-row
    filter, so even dropped rows advance the watermark).

At 100 TB this is the state contract that matters: the watermark bounds
the aggregation state to O(windows inside the lateness horizon)
regardless of corpus age, and the drop rule is deterministic — an
auditable function of drop boundaries, never of scheduler timing.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timedelta

from pyspark.sql import DataFrame

_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def interval_micros(delay: str) -> int:
    """Exact microsecond width of a day-time INTERVAL literal body
    ('2 days', '90 minutes', '1 day 6 hours'). Raises on calendar units
    (month/year): the streaming operators only use day-time delays, and
    only day-time arithmetic is a fixed shift of the UTC wall clock."""
    toks = delay.strip().lower().split()
    if not toks or len(toks) % 2:
        raise ValueError(f"not a '<n> <unit>' interval: {delay!r}")
    us = 0
    for i in range(0, len(toks), 2):
        unit = toks[i + 1].rstrip("s")
        if unit not in _UNIT_US:
            raise ValueError(f"unsupported interval unit in: {delay!r}")
        us += int(toks[i]) * _UNIT_US[unit]
    return us


def ts_shift(ts: str, delay: str, *, sign: int = -1) -> str:
    """`CAST(TIMESTAMP '{ts}' ± INTERVAL {delay} AS STRING)` computed
    driver-side. The streaming operators call this shape once or twice
    per micro-batch for watermark arithmetic, and the spark.sql round
    trip it replaces measured ~160 ms each — pure driver gap (guide
    §1.2/§5.4). Exact equivalence: the session timezone is pinned UTC
    (session.py) and every delay is a day-time interval, so naive
    datetime arithmetic computes the same function; the output format
    replicates Spark's timestampToString (space separator, fractional
    seconds trimmed of trailing zeros, omitted when zero) — pinned
    against spark.sql itself by tests/test_ts_shift.py."""
    dt = datetime.fromisoformat(ts) + sign * timedelta(
        microseconds=interval_micros(delay)
    )
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    if dt.microsecond:
        s += ("." + f"{dt.microsecond:06d}").rstrip("0")
    return s


def run_concurrently(*thunks) -> None:
    """Run independent Spark actions (typically a micro-batch's 2-3
    batch-scoped state/sink writes to DISTINCT paths) from a small
    thread pool so their tasks back-fill each other's stragglers
    (guide §2.6: actions are only sequential because driver code calls
    them sequentially). Wall cost drops from the sum of the jobs to the
    slowest one. Raises the first failure AFTER every thunk finished —
    the caller's marker-after-all-writes crash contract is preserved
    (no marker is written when any write failed)."""
    if len(thunks) == 1:
        thunks[0]()
        return
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        errs = []
        for f in futures:
            try:
                f.result()
            except BaseException as e:  # noqa: BLE001 - re-raised below
                errs.append(e)
        if errs:
            raise errs[0]


def stage_chunked_by(
    df: DataFrame, out_dir: str, *, chunk_col: str = "__chunk",
    n_chunks: int, columns: list[str],
) -> str:
    """Stage `df` as one parquet file per `chunk_col` value (0..n-1) with
    strictly increasing mtimes, so Spark's file-stream source replays
    them as deterministic micro-batches in chunk order — the bounded
    twin of a sequence of dated crawl drops whose contents are NOT in
    event-time order."""
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    paths = [
        os.path.join(out_dir, f"chunk{i:04d}.parquet") for i in range(n_chunks)
    ]
    missing = [i for i in range(n_chunks) if not os.path.exists(paths[i])]
    if not missing:
        return out_dir
    # ONE pass over df staging every chunk (a dynamic-partition write with
    # the chunk id as the partition key, one shuffle), instead of one
    # filter+coalesce job per chunk — n_chunks full input scans collapse
    # into one. repartition by the chunk value puts each chunk in exactly
    # one task, so each partition directory holds exactly one part file.
    tmp = os.path.join(out_dir, "__stage_tmp")
    (
        df.select(
            *columns, F.col(chunk_col).cast("int").alias("__stage_chunk")
        )
        .repartition(n_chunks, "__stage_chunk")
        .write.mode("overwrite").partitionBy("__stage_chunk").parquet(tmp)
    )
    empty = [
        i for i in missing
        if not os.path.isdir(os.path.join(tmp, f"__stage_chunk={i}"))
    ]
    if empty:
        # chunks with zero rows produce no partition directory; stage an
        # empty file with the data schema so the micro-batch sequence
        # still replays n_chunks batches (the pre-one-pass behavior)
        e = df.select(*columns).limit(0).coalesce(1)
        for i in empty:
            e.write.mode("overwrite").parquet(
                os.path.join(tmp, f"__stage_chunk={i}")
            )
    for i in missing:
        d = os.path.join(tmp, f"__stage_chunk={i}")
        part = next(
            f for f in os.listdir(d)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(os.path.join(d, part), paths[i])
        t = 1_600_000_000 + i * 60
        os.utime(paths[i], (t, t))
    shutil.rmtree(tmp)
    return out_dir
