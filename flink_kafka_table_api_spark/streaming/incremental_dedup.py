"""Streaming incremental near-dup detection: every incoming micro-batch of
documents is checked against an accumulating MinHash-LSH signature index.

The streaming twin of operators/dedup.py's batch pipeline — the shape a
continuous ingestion pipeline needs (new crawl data arriving hourly, each
delta deduped against everything already ingested WITHOUT rescanning it):

  per micro-batch (foreachBatch):
    1. signatures + band hashes for the NEW docs only (O(delta));
    2. bucket-join those bands against the persisted band index
       (O(delta x bucket density), never O(corpus)), with the SAME
       oversized-bucket cap as the batch pipeline, applied to the
       ACCUMULATED occupancy (index + this batch) — a hot boilerplate
       template flooding one band bucket is defused in-stream, not just
       in batch replays;
    3. exact-Jaccard verify candidate pairs (new doc text vs indexed doc
       text, via the doc store);
    4. publish flagged pairs / the new docs' bands + texts into
       BATCH-SCOPED state directories, then mark the batch indexed.

Crash safety / exactly-once: every side effect of a batch is an overwrite
of a `batch-N` directory (or the `indexed/batch-N` marker, written LAST).
A replay of a fully-indexed batch is a no-op (marker check); a replay
after a mid-batch crash first scrubs the batch's partial directories and
recomputes them from identical inputs — the accumulated index it reads
contains only fully or partially published EARLIER batches, never its own
partial output.

Cap semantics vs the single-pass batch oracle: the cap engages on the
occupancy a bucket has reached AT DETECTION TIME. A bucket that crosses
the cap mid-stream stops producing candidates from then on, but pairs it
produced while small are kept — so incremental recall is a superset of
the capped single-pass run and a subset of the uncapped one. At every
shipped sf the largest bucket is far below the cap, so the gate parity
with the capped batch oracle is exact (pinned in tests).

At 100 TB the band index is the only long-lived state: ~bands x 8 bytes
per doc, bucket-keyed so step 2 prunes. Batches also self-dedup
(new-vs-new collisions) in the same join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_kafka_table_api_spark.operators.dedup import (
    jaccard,
    lsh_bands,
    minhash_signatures,
    shingles,
)
from flink_kafka_table_api_spark.streaming.late_data import run_concurrently


class IncrementalDedup:
    """State paths + per-batch merge logic (exposed separately from the
    streaming query so batch backfills can call process_batch directly)."""

    def __init__(
        self,
        state_dir: str,
        *,
        num_hashes: int = 8,
        bands: int = 4,
        rows_per_band: int = 2,
        shingle_k: int = 3,
        threshold: float = 0.5,
        portable: bool = False,
        max_bucket_size: int | None = 256,
        capture_plans: bool = False,
    ) -> None:
        self.state_dir = state_dir
        self.bands_path = os.path.join(state_dir, "band_index")
        self.docs_path = os.path.join(state_dir, "doc_store")
        self.matches_path = os.path.join(state_dir, "matches")
        self.marker_dir = os.path.join(state_dir, "indexed")
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.shingle_k = shingle_k
        self.threshold = threshold
        self.portable = portable
        self.max_bucket_size = max_bucket_size
        self.capture_plans = capture_plans
        self.last_candidate_plan: str | None = None

    # -- batch-scoped state layout -------------------------------------
    @staticmethod
    def _part(table_path: str, batch_id: int) -> str:
        return os.path.join(table_path, f"batch-{batch_id}")

    @staticmethod
    def _has_parts(table_path: str) -> bool:
        """True iff any batch directory holds an actual parquet data
        file — an all-empty batch (e.g. zero matches) writes a directory
        with only a _SUCCESS marker, which parquet schema inference
        cannot read."""
        if not os.path.isdir(table_path):
            return False
        for root, _dirs, files in os.walk(table_path):
            if any(
                f.endswith(".parquet") and not f.startswith(("_", "."))
                for f in files
            ):
                return True
        return False

    @staticmethod
    def _read_parts(
        spark: SparkSession, table_path: str, template: DataFrame
    ) -> DataFrame:
        """Union of all published batch-N directories (empty template
        frame when none hold data yet). recursiveFileLookup keeps the
        state schema identical to what each batch wrote — no
        partition-column surprises for downstream unions."""
        if not IncrementalDedup._has_parts(table_path):
            return template.limit(0)
        # explicit schema (the template's own): skips the per-call footer
        # schema inference — a driver-side file read per micro-batch that
        # grows with the number of published state files
        return (
            spark.read.schema(template.schema)
            .option("recursiveFileLookup", "true")
            .parquet(table_path)
            .select(*template.columns)
        )

    def is_indexed(self, batch_id: int) -> bool:
        """True iff process_batch fully published this batch (marker is
        the LAST write of a batch — the replay no-op signal)."""
        return os.path.exists(
            os.path.join(self.marker_dir, f"batch-{batch_id}")
        )

    def _scrub(self, batch_id: int) -> None:
        """Remove this batch's (necessarily partial — its marker is
        absent) state directories so a post-crash replay recomputes them
        from a clean slate and never reads its own half-written output."""
        for t in (self.bands_path, self.docs_path, self.matches_path):
            shutil.rmtree(self._part(t, batch_id), ignore_errors=True)

    def _new_bands(self, batch: DataFrame) -> DataFrame:
        sigs = minhash_signatures(
            batch, "doc_id", "text",
            num_hashes=self.num_hashes, shingle_k=self.shingle_k,
            portable=self.portable,
        )
        return lsh_bands(
            sigs, "doc_id", bands=self.bands, rows_per_band=self.rows_per_band
        )

    def _verify_shingles(
        self, doc_store: DataFrame, batch: DataFrame, cand: DataFrame
    ) -> DataFrame:
        """Shingle sets for the verify join — computed ONLY for docs named
        in a candidate pair. Semi-join the doc store down to those ids
        BEFORE shingling — the same prune as the batch pipeline
        (operators/dedup.py lsh_verified_pairs) — so step 3 is
        O(candidates) per batch, never O(corpus): without it, every
        micro-batch would re-shingle every document ever ingested, the one
        cost that grows without bound in a long-running stream."""
        cand_ids = (
            cand.select(F.col("a").alias("doc_id"))
            .unionByName(cand.select(F.col("b").alias("doc_id")))
            # no .distinct(): this is only ever the BUILD side of a
            # left-semi join, whose hash relation dedups keys anyway — the
            # explicit exchange was one more per-batch stage for nothing
        )
        texts = doc_store.unionByName(batch).join(
            cand_ids, "doc_id", "left_semi"
        )
        return texts.select(
            "doc_id", shingles("text", self.shingle_k).alias("__sh")
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.is_indexed(batch_id):
            return  # replayed after recovery: already fully published
        self._scrub(batch_id)
        spark = batch.sparkSession
        batch = batch.select("doc_id", "text").persist()
        # lazy persist: the concurrent publishes below materialize both
        # caches on first use (per-partition cache locks serialize the
        # compute) — the old eager count() was one more fixed-cost job
        # per micro-batch for the same materialization
        new_bands = self._new_bands(batch).persist()
        index = self._read_parts(spark, self.bands_path, new_bands)
        # One tagged union of (index, this batch) feeds BOTH the cap
        # aggregate and the candidate join below — the pre-r10 shape ran
        # two separate probe joins (new-vs-indexed, new-vs-new) plus a
        # union: one exchange + one broadcast build more per micro-batch
        # for the identical candidate set (guide §2.4).
        tagged = (
            index.select(
                "doc_id", "band_id", "band_hash",
                F.lit(False).alias("__new"),
            ).unionByName(
                new_bands.select(
                    "doc_id", "band_id", "band_hash",
                    F.lit(True).alias("__new"),
                )
            )
        )
        # Oversized-bucket cap on the ACCUMULATED occupancy (index + this
        # batch) — the operators/dedup.py lsh_candidate_pairs recipe: the
        # oversized set is the pathology, therefore tiny, and broadcasts
        # into an anti-join; the bands tables are never re-shuffled for it.
        capped = tagged
        if self.max_bucket_size is not None:
            big = (
                tagged.select("band_id", "band_hash")
                .groupBy("band_id", "band_hash")
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > self.max_bucket_size)
                .select("band_id", "band_hash")
            )
            capped = tagged.join(
                F.broadcast(big), ["band_id", "band_hash"], "left_anti"
            )
        # candidates, ONE bucket join with per-side pair-uniqueness rules
        # (the left side is always a NEW doc):
        # - new-vs-INDEXED (right row __new=false): the id sets are
        #   disjoint (an id is indexed at most once), so each cross pair
        #   appears in exactly one orientation (a=new, b=indexed) and
        #   `a != b` keeps it — an `a > b` filter here would silently
        #   drop every pair whose new id sorts below the indexed id
        #   (arbitrary-id streams);
        # - new-vs-NEW (right row __new=true, a self join): both
        #   orientations appear, `a > b` dedups them and drops self-pairs.
        # Output orientation is therefore (a=new doc, b=indexed doc) for
        # cross pairs and (a=larger id, b=smaller id) within a batch.
        new_a = capped.filter("__new").select(
            F.col("doc_id").alias("a"), "band_id", "band_hash"
        )
        # cand feeds THREE consumers below (the id prune plus both sides of
        # the verify join); persist so the band bucket-join runs once.
        cand = (
            new_a.join(
                capped.select(
                    F.col("doc_id").alias("b"), "band_id", "band_hash",
                    "__new",
                ),
                ["band_id", "band_hash"],
            )
            .filter(
                F.when(F.col("__new"), F.col("a") > F.col("b"))
                .otherwise(F.col("a") != F.col("b"))
            )
            .select("a", "b")
            .distinct()
            .persist()
        )
        doc_store = self._read_parts(spark, self.docs_path, batch)
        # persist: BOTH sides of the verify join below read this frame,
        # and without the cache each side re-evaluates the whole
        # semi-join + shingle expression DAG (no ReusedExchange fires —
        # the branches differ by alias); sh is O(candidate docs), so the
        # cache is bounded by the pair budget, never the corpus
        sh = self._verify_shingles(doc_store, batch, cand).persist()
        a = sh.select(F.col("doc_id").alias("a"), F.col("__sh").alias("__sa"))
        b = sh.select(F.col("doc_id").alias("b"), F.col("__sh").alias("__sb"))
        matches = (
            cand.join(a, "a").join(b, "b")
            .withColumn("jaccard", F.round(jaccard(F.col("__sa"), F.col("__sb")), 6))
            .filter(F.col("jaccard") >= self.threshold)
            .select("a", "b", "jaccard")
            .withColumn("batch_id", F.lit(batch_id))
        )
        # plan pin for the skew posture (read by tests and the skew
        # experiment, never by the pipeline): the cap must reach the
        # physical plan as a broadcast anti-join. Opt-in: forcing
        # executedPlan() here pays full driver-side planning of the
        # candidate DAG once per micro-batch (~0.3-1 s at sf0.1), so
        # only the callers that read the pin ask for it.
        if self.capture_plans:
            self.last_candidate_plan = (
                cand._jdf.queryExecution().executedPlan().toString()
            )
        # publish: batch-scoped overwrites, marker LAST (the commit
        # point). The three writes are independent DAGs over the two
        # persisted frames and DISTINCT paths — overlapped so the batch
        # pays the slowest write, not the sum (guide §2.6; the marker
        # still follows ALL of them)
        run_concurrently(
            lambda: matches.write.mode("overwrite").parquet(
                self._part(self.matches_path, batch_id)
            ),
            lambda: new_bands.write.mode("overwrite").parquet(
                self._part(self.bands_path, batch_id)
            ),
            lambda: batch.write.mode("overwrite").parquet(
                self._part(self.docs_path, batch_id)
            ),
        )
        cand.unpersist()
        sh.unpersist()
        new_bands.unpersist()
        batch.unpersist()
        os.makedirs(self.marker_dir, exist_ok=True)
        open(os.path.join(self.marker_dir, f"batch-{batch_id}"), "w").close()

    def matches(self, spark) -> DataFrame:
        if not os.path.isdir(self.matches_path):
            raise FileNotFoundError("no batches processed yet")
        if not self._has_parts(self.matches_path):
            # batches ran but every one was match-free: typed empty frame
            return spark.createDataFrame(
                [], "a long, b long, jaccard double, batch_id int"
            )
        # explicit schema: the published match rows' exact types (pinned
        # by process_batch's select + lit), skipping per-call footer
        # schema inference over every published batch file
        return (
            spark.read
            .schema("a long, b long, jaccard double, batch_id int")
            .option("recursiveFileLookup", "true")
            .parquet(self.matches_path)
            .select("a", "b", "jaccard", "batch_id")
        )

    def compact_state(
        self, spark, *, target_file_bytes: int = 256 * 1024 * 1024
    ) -> None:
        """Housekeeping for long-running streams: every micro-batch
        publishes one directory of per-partition files to the band index /
        doc store / matches, so after thousands of batches the scans in
        step 2/3 go metadata-bound. Rewrites each published batch
        directory to ~target-sized files (atomic swap via
        sources.files.compact), preserving the batch-scoped layout the
        replay idempotence depends on. Run it between batches on whatever
        cadence the batch rate dictates — state CONTENT is untouched, so
        detection results are identical before and after."""
        from flink_kafka_table_api_spark.sources.files import compact

        for p in (self.bands_path, self.docs_path, self.matches_path):
            if not os.path.isdir(p):
                continue
            for e in os.scandir(p):
                if e.is_dir() and e.name.startswith("batch-"):
                    compact(spark, e.path, target_file_bytes=target_file_bytes)


def streaming_neardup(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    checkpoint_dir: str,
    threshold: float = 0.5,
    **kwargs,
) -> StreamingQuery:
    """Start the incremental near-dup pipeline over a streaming document
    source. Matches accumulate in ``<state_dir>/matches`` with the batch id
    that detected them."""
    dedup = IncrementalDedup(state_dir, threshold=threshold, **kwargs)
    return (
        doc_stream.writeStream.foreachBatch(dedup.process_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental_neardup")
        .start()
    )
