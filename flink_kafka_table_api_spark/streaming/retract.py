"""Retract-stream Top-N: Flink's Rank operator over an UPDATE stream,
emitting a RowKind changelog (built round 8, registration-bound for a
round-9/10 gate slot).

The Flink Table API's other signature abstraction (beside the temporal
join) is the UPDATE-mode query: a continuous aggregation whose result
table changes as input arrives, exposed to consumers as a CHANGELOG of
RowKind-tagged rows — +I insert, -U retract-before-update, +U
update-after, -D delete (`tableEnv.toChangelogStream` /
`toRetractStream`, public API surface; RowKind is
org.apache.flink.types.RowKind). The canonical update-mode query is
Top-N over a running aggregate:

    SELECT * FROM (
      SELECT key, SUM(value) AS total,
             ROW_NUMBER() OVER (ORDER BY total DESC) AS rnk
      FROM stream GROUP BY key) WHERE rnk <= N

whose result set both grows and SHRINKS (a key updated elsewhere can
push another key out of the Top-N), so append-mode output cannot
express it — this is exactly the query class Spark's built-in
Structured Streaming refuses (update/complete mode cannot feed a
downstream file sink transactionally). The Spark-first equivalent:

  per micro-batch k (foreachBatch, marker-committed):
    1. FOLD:  state_k = state_{k-1} ⊎ per-key batch sums — one hash
              aggregate + one keyed merge, DECIMAL(25,6) accumulation
              so totals are order-free exact (the repo-wide rule for
              double aggregates);
    2. RANK:  top_k = state_k ORDER BY (total DESC, key) LIMIT N —
              Catalyst plans TakeOrderedAndProject: per-partition
              heaps, no global sort shuffle;
    3. DIFF:  ops_k = changelog(top_{k-1} -> top_k): keys entering
              emit +I; keys leaving emit -D (with their OLD row); keys
              staying whose (total, rank) changed emit -U (old row)
              then +U (new row). N x N full-outer join of two tiny
              snapshots;
    4. PUBLISH out/batch_id=k + state/batch-k + top/batch-k,
       marker LAST (replay no-op, crash scrub+recompute).

A downstream consumer that applies the changelog in (batch_id, op)
order materializes exactly the batch Top-N — pinned by replaying the
log in tests. Determinism: given the drop boundaries, ops are a pure
function of per-batch cumulative sums, so the DuckDB oracle rebuilds
per-batch ranked snapshots and diffs consecutive ones with no
streaming machinery.

At 100 TB: the fold shuffles one row per distinct key in the batch and
merges against O(live keys) state; the rank is a TakeOrdered scan of
the state (no shuffle); the diff is O(N). What this deliberately does
NOT do is keep the full sorted history or re-read the input stream —
state is (key, total), exactly Flink's ValueState per key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.late_data import (
    run_concurrently,
    stage_chunked_by,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

ROWS_COLUMNS = ["row_id", "key", "value"]
STATE_SCHEMA = "key long, total decimal(25,6)"
TOP_SCHEMA = "key long, total decimal(25,6), rnk int"
OUT_SCHEMA = "op string, key long, total double, rnk int"


def _batch_sums(batch: DataFrame) -> DataFrame:
    return batch.groupBy("key").agg(
        F.sum(F.col("value").cast("decimal(25,6)")).alias("total")
    )


def _fold(spark: SparkSession, prev_path: str, sums: DataFrame) -> DataFrame:
    if not os.path.isdir(prev_path):
        return sums.select(
            "key", F.col("total").cast("decimal(25,6)").alias("total")
        )
    prev = spark.read.schema(STATE_SCHEMA).parquet(prev_path)
    return (
        prev.unionByName(sums)
        .groupBy("key")
        .agg(F.sum("total").cast("decimal(25,6)").alias("total"))
    )


def _topn(state: DataFrame, n: int) -> DataFrame:
    # orderBy().limit() -> TakeOrderedAndProject: per-partition heaps,
    # no global sort; ties broken by key for determinism
    ranked = state.orderBy(F.col("total").desc(), F.col("key")).limit(n)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("total").desc(), F.col("key"))
    # the window runs over <= n pre-limited rows — single tiny partition
    return ranked.select(
        "key", "total", F.row_number().over(w).cast("int").alias("rnk")
    )


def _diff(old: DataFrame | None, new: DataFrame) -> DataFrame:
    """RowKind changelog from snapshot `old` to snapshot `new` (each
    <= N rows): +I for entering keys, -D for leaving keys (old row),
    -U/+U pairs for staying keys whose (total, rnk) changed."""
    n = new.select(
        F.col("key").alias("__k"),
        F.col("total").alias("__nt"), F.col("rnk").alias("__nr"),
    )
    if old is None:
        return n.select(
            F.lit("+I").alias("op"), F.col("__k").alias("key"),
            F.col("__nt").cast("double").alias("total"),
            F.col("__nr").alias("rnk"),
        )
    o = old.select(
        F.col("key").alias("__k"),
        F.col("total").alias("__ot"), F.col("rnk").alias("__or"),
    )
    j = o.join(n, "__k", "full_outer")
    ins = j.filter(F.col("__or").isNull()).select(
        F.lit("+I").alias("op"), F.col("__k").alias("key"),
        F.col("__nt").cast("double").alias("total"),
        F.col("__nr").alias("rnk"),
    )
    dels = j.filter(F.col("__nr").isNull()).select(
        F.lit("-D").alias("op"), F.col("__k").alias("key"),
        F.col("__ot").cast("double").alias("total"),
        F.col("__or").alias("rnk"),
    )
    changed = j.filter(
        F.col("__or").isNotNull() & F.col("__nr").isNotNull()
        & ((F.col("__ot") != F.col("__nt"))
           | (F.col("__or") != F.col("__nr")))
    )
    retr = changed.select(
        F.lit("-U").alias("op"), F.col("__k").alias("key"),
        F.col("__ot").cast("double").alias("total"),
        F.col("__or").alias("rnk"),
    )
    upd = changed.select(
        F.lit("+U").alias("op"), F.col("__k").alias("key"),
        F.col("__nt").cast("double").alias("total"),
        F.col("__nr").alias("rnk"),
    )
    return ins.unionByName(dels).unionByName(retr).unionByName(upd)


def stream_topn_retract(
    spark: SparkSession,
    rows_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    n: int,
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """Maintain `SELECT key, SUM(value) GROUP BY key ORDER BY total
    DESC LIMIT n` over `rows_chunked` (row_id, key, value,
    `chunk_col`) delivered as `n_chunks` micro-batch drops, emitting
    the RowKind changelog of the Top-N result per batch. Returns the
    full retract log (batch_id, op in {+I,-U,+U,-D}, key, total, rnk);
    applying it in (batch_id, op) order materializes the final batch
    Top-N exactly."""
    src = stage_chunked_by(
        rows_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks, columns=ROWS_COLUMNS,
    )
    state = os.path.join(state_dir, "state")
    top = os.path.join(state_dir, "top")
    out = os.path.join(state_dir, "out")
    marker_dir = os.path.join(state_dir, "commits")

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed after recovery: already published
        for d in (
            os.path.join(state, f"batch-{batch_id}"),
            os.path.join(top, f"batch-{batch_id}"),
            os.path.join(out, f"batch_id={batch_id}"),
        ):
            shutil.rmtree(d, ignore_errors=True)
        # the old shape wrote state, read it back, wrote top, read THAT
        # back, then wrote the diff — three serialized jobs with two
        # parquet round-trips. The persisted frames carry the identical
        # rows (a parquet round-trip is value-preserving), so all three
        # publishes are independent DAGs to DISTINCT paths — overlapped,
        # the batch pays the slowest write (guide §2.6; marker last).
        merged = _fold(
            spark, os.path.join(state, f"batch-{batch_id - 1}"),
            _batch_sums(batch),
        ).persist()
        new_top = _topn(merged, n).persist()
        prev_top_path = os.path.join(top, f"batch-{batch_id - 1}")
        prev_top = (
            spark.read.schema(TOP_SCHEMA).parquet(prev_top_path)
            if os.path.isdir(prev_top_path) else None
        )
        run_concurrently(
            lambda: merged.write.mode("overwrite").parquet(
                os.path.join(state, f"batch-{batch_id}")
            ),
            lambda: new_top.write.mode("overwrite").parquet(
                os.path.join(top, f"batch-{batch_id}")
            ),
            lambda: _diff(prev_top, new_top)
            .write.mode("overwrite").parquet(
                os.path.join(out, f"batch_id={batch_id}")
            ),
        )
        merged.unpersist()
        new_top.unpersist()
        open(marker, "w").close()
        old = batch_id - keep_versions
        if old >= 0:
            shutil.rmtree(
                os.path.join(state, f"batch-{old}"), ignore_errors=True
            )
            shutil.rmtree(
                os.path.join(top, f"batch-{old}"), ignore_errors=True
            )

    stream = (
        spark.readStream
        .schema("row_id long, key long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with replan_cached_plans(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    parts = [
        e.name for e in os.scandir(out)
        if e.name.startswith("batch_id=")
    ] if os.path.isdir(out) else []
    if not parts:
        return spark.createDataFrame([], OUT_SCHEMA + ", batch_id long")
    return (
        spark.read.schema(OUT_SCHEMA + ", batch_id int")
        .option("basePath", out)
        .parquet(*(os.path.join(out, p) for p in parts))
        .select(
            "op", "key", "total", "rnk",
            F.col("batch_id").cast("long").alias("batch_id"),
        )
    )


def apply_changelog(log: DataFrame) -> DataFrame:
    """Materialize the changelog a CONSUMER would: the last +I/+U row
    per key not later deleted — one argmax per key over (batch_id,
    op-kind ordinal), no replay loop. Used by tests to pin that the
    log reconstructs the final Top-N exactly."""
    ordinal = (
        F.when(F.col("op") == "-U", 0)
        .when(F.col("op") == "-D", 1)
        .otherwise(2)  # +I / +U after retractions within a batch
    )
    last = log.groupBy("key").agg(
        F.max_by(
            F.struct("op", "total", "rnk"),
            F.struct(F.col("batch_id"), ordinal),
        ).alias("w")
    )
    return (
        last.filter(F.col("w.op").isin("+I", "+U"))
        .select("key", "w.total", "w.rnk")
    )


__all__ = ["stream_topn_retract", "apply_changelog"]
