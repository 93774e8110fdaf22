"""Incremental materialized view: keyed UPSERT sink via foreachBatch.

The pattern every streaming pipeline without a transactional table format
(Delta/Iceberg) needs: maintain a keyed result table in plain parquet,
merging each micro-batch's updates, idempotently across batch replays.

Semantics:
- state table = one row per key, latest values win;
- each batch: read current table, anti-join out the updated keys, union the
  batch's rows, atomic swap (write tmp -> rename);
- idempotence: a replayed batch (same batchId after checkpoint recovery)
  is skipped via a committed-batch marker file — the manual version of the
  transaction log Delta would provide.

Scale note: rewrite cost is O(table) per batch, which is right for
aggregate/materialized-view sized outputs (the common case: the HEAVY data
stays in the stream; the view is compact). For 100 TB mutable tables use a
partitioned rewrite (only partitions containing updated keys) or a real
table format — the foreachBatch hook is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def upsert_to_parquet(
    updates: DataFrame,
    table_path: str,
    key_cols: tuple[str, ...],
    *,
    checkpoint_dir: str,
    query_name: str = "upsert_view",
) -> StreamingQuery:
    """Start a foreachBatch UPSERT of a (possibly update-mode) streaming
    DataFrame into a parquet state table keyed by ``key_cols``."""
    spark = updates.sparkSession
    marker_dir = table_path + "__commits"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch after recovery: already merged
        batch = batch_df.dropDuplicates(list(key_cols))  # latest per key wins
        if os.path.exists(table_path):
            current = spark.read.parquet(table_path)
            keys = batch.select(*key_cols)
            kept = current.join(keys, list(key_cols), "left_anti")
            merged = kept.unionByName(batch)
        else:
            merged = batch
        tmp = table_path + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # atomic swap: the reader never sees a half-written table
        jvm = spark._jvm
        dst = jvm.org.apache.hadoop.fs.Path(table_path)
        fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(dst, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)
        open(marker, "w").close()

    return (
        updates.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
