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

from pyspark.sql import DataFrame


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

    for i in range(n_chunks):
        path = os.path.join(out_dir, f"chunk{i:04d}.parquet")
        if os.path.exists(path):
            continue
        chunk = df.filter(F.col(chunk_col) == i).select(*columns)
        tmp = path + "__tmp"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(os.path.join(tmp, part), path)
        shutil.rmtree(tmp)
        t = 1_600_000_000 + i * 60
        os.utime(path, (t, t))
    return out_dir
