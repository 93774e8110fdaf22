"""Streaming per-source token-budget quota enforcement (built round 8,
registration-bound for a round-9/10 gate slot).

The registered `source_token_cap` (operators/curation.py) downsamples an
over-represented source to its token allocation by re-ranking documents
in hash-of-id order — a BATCH privilege: it sees the whole corpus before
choosing. An ingest gate cannot re-rank the future. The streaming form
of the same control is FIRST-COME-FIRST-SERVED admission: documents are
admitted in delivery order until the source's consumed-token counter
reaches the budget; a document is kept iff the tokens seen before it
are under budget (the boundary document spills over, exactly the batch
twin's rule). Flink expresses this as keyed state + a value counter;
Spark-first it is the round-8 foreachBatch state machine:

  per micro-batch k (foreachBatch):
    1. ORDER:  the batch's documents per source by doc_id (drops are
               id-ordered, so (batch, doc_id) IS global id order);
    2. PREFIX: per-source running token sums BEFORE each doc (one
               window per source partition, never a global window);
    3. ADMIT:  keep iff carried_consumed + prefix_before < budget;
    4. CARRY:  consumed_k(source) = carried + sum(ALL batch tokens of
               the source) — seen, not kept: once a source crosses its
               budget every later doc drops anyway, and counting seen
               tokens is exactly the batch twin's prefix semantics;
    5. PUBLISH: kept/batch-k + consumed/batch-k, marker LAST (the
               sibling-module crash contract: replays no-op, mid-batch
               crashes scrub and recompute).

Because drops arrive in id order, the incremental run is BIT-EQUAL to
one batch pass over the whole corpus in id order — which is the DuckDB
oracle (`stream_source_quota_sql` in queries.py). State is one row per
source (a counter), per-batch cost one keyed window over the batch.

At 100 TB: this is the shape of every ingest-side quota (per-domain
crawl budgets, per-tenant token allocations) — the counter table is
|sources| rows, the shuffle carries the batch, and admission is a
broadcast-joinable lookup.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.text import token_count
from flink_kafka_table_api_spark.streaming.late_data import (
    run_concurrently,
    stage_chunked_by,
)
from flink_kafka_table_api_spark.caching import replan_cached_plans

_CONSUMED_SCHEMA = "source string, consumed long"


def stream_source_quota(
    spark: SparkSession,
    docs_chunked: DataFrame,
    state_dir: str,
    *,
    n_chunks: int,
    budget: int,
    chunk_col: str = "__chunk",
    keep_versions: int = 3,
) -> DataFrame:
    """Enforce a per-source token budget over `docs_chunked`
    (doc_id, source, text, `chunk_col`) staged as `n_chunks` id-ordered
    micro-batch drops; return the admitted documents
    (source, doc_id, n_tokens) — bit-identical to the batch
    prefix-sum cap in doc_id order."""
    src = stage_chunked_by(
        docs_chunked, os.path.join(state_dir, "src"),
        chunk_col=chunk_col, n_chunks=n_chunks,
        columns=["doc_id", "source", "text"],
    )
    kept_dir = os.path.join(state_dir, "kept")
    consumed_dir = os.path.join(state_dir, "consumed")
    marker_dir = os.path.join(state_dir, "commits")

    def _consumed_after(batch_id: int) -> DataFrame:
        p = os.path.join(consumed_dir, f"batch-{batch_id}")
        if batch_id < 0 or not os.path.isdir(p):
            return spark.createDataFrame([], _CONSUMED_SCHEMA)
        return spark.read.parquet(p)

    def process(batch: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replayed after recovery: already admitted
        for d in (kept_dir, consumed_dir):
            shutil.rmtree(
                os.path.join(d, f"batch-{batch_id}"), ignore_errors=True
            )
        sized = batch.select(
            "source", "doc_id",
            token_count("text").cast("long").alias("n_tokens"),
        ).persist()
        carried = _consumed_after(batch_id - 1)
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prefixed = sized.withColumn(
            "__before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).join(F.broadcast(carried), "source", "left").withColumn(
            "__carried", F.coalesce(F.col("consumed"), F.lit(0))
        )
        kept = prefixed.filter(
            F.col("__carried") + F.col("__before") < budget
        ).select("source", "doc_id", "n_tokens")
        # counter advances by tokens SEEN (the batch twin's prefix
        # semantics), not just kept
        batch_totals = sized.groupBy("source").agg(
            F.sum("n_tokens").alias("__t")
        )
        new_consumed = (
            carried.join(batch_totals, "source", "full")
            .select(
                "source",
                (F.coalesce(F.col("consumed"), F.lit(0))
                 + F.coalesce(F.col("__t"), F.lit(0))).alias("consumed"),
            )
        )
        # both publishes are independent DAGs over the persisted sized
        # frame to DISTINCT paths — overlapped (guide §2.6; the marker
        # still follows both)
        run_concurrently(
            lambda: kept.write.mode("overwrite").parquet(
                os.path.join(kept_dir, f"batch-{batch_id}")
            ),
            lambda: new_consumed.write.mode("overwrite").parquet(
                os.path.join(consumed_dir, f"batch-{batch_id}")
            ),
        )
        sized.unpersist()
        open(marker, "w").close()
        old = batch_id - keep_versions
        if old >= 0:
            shutil.rmtree(
                os.path.join(consumed_dir, f"batch-{old}"),
                ignore_errors=True,
            )

    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string")
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
    if not os.path.isdir(kept_dir):
        return spark.createDataFrame(
            [], "source string, doc_id long, n_tokens long"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(kept_dir)


def load_consumed(spark: SparkSession, state_dir: str) -> DataFrame:
    """The per-source consumed-token counters after the last committed
    batch — the operational read an ingest dashboard does."""
    consumed_dir = os.path.join(state_dir, "consumed")
    versions = sorted(
        (e for e in os.scandir(consumed_dir)
         if e.name.startswith("batch-")),
        key=lambda e: int(e.name[len("batch-"):]),
    ) if os.path.isdir(consumed_dir) else []
    if not versions:
        raise FileNotFoundError(f"no consumed versions under {state_dir}")
    return spark.read.parquet(versions[-1].path)
