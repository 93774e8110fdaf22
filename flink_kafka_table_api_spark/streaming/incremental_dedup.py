"""Streaming incremental near-dup detection: every incoming micro-batch of
documents is checked against an accumulating MinHash-LSH signature index.

The streaming twin of operators/dedup.py's batch pipeline — the shape a
continuous ingestion pipeline needs (new crawl data arriving hourly, each
delta deduped against everything already ingested WITHOUT rescanning it):

  per micro-batch (foreachBatch):
    1. signatures + band hashes for the NEW docs only (O(delta));
    2. bucket-join those bands against the persisted band index
       (O(delta x bucket density), never O(corpus));
    3. exact-Jaccard verify candidate pairs (new doc text vs indexed doc
       text, via the doc store);
    4. append flagged pairs to the matches table, and the new docs'
       bands + texts to the index (so later batches dedup against them).

At 100 TB the band index is the only long-lived state: ~bands x 8 bytes per
doc, partitioned by band_hash so step 2 prunes. Batches also self-dedup
(new-vs-new collisions) in the same join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_kafka_table_api_spark.operators.dedup import (
    jaccard,
    lsh_bands,
    minhash_signatures,
    shingles,
)


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
    ) -> None:
        self.bands_path = os.path.join(state_dir, "band_index")
        self.docs_path = os.path.join(state_dir, "doc_store")
        self.matches_path = os.path.join(state_dir, "matches")
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.shingle_k = shingle_k
        self.threshold = threshold
        self.portable = portable

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
            .distinct()
        )
        texts = doc_store.unionByName(batch).join(
            cand_ids, "doc_id", "left_semi"
        )
        return texts.select(
            "doc_id", shingles("text", self.shingle_k).alias("__sh")
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select("doc_id", "text").persist()
        new_bands = self._new_bands(batch).persist()
        new_bands.count()
        have_index = os.path.exists(self.bands_path)
        index = (
            spark.read.parquet(self.bands_path)
            if have_index
            else new_bands.limit(0)
        )
        # candidates, two joins with different pair-uniqueness rules:
        # - new-vs-INDEXED: the id sets are disjoint (an id is indexed at
        #   most once), so each cross pair appears in exactly one
        #   orientation (a=new, b=indexed) and `a != b` keeps it — an
        #   `a > b` filter here would silently drop every pair whose new
        #   id sorts below the indexed id (arbitrary-id streams);
        # - new-vs-NEW (self join): both orientations appear, `a > b`
        #   dedups them and drops self-pairs.
        # Output orientation is therefore (a=new doc, b=indexed doc) for
        # cross pairs and (a=larger id, b=smaller id) within a batch.
        new_a = new_bands.select(
            F.col("doc_id").alias("a"), "band_id", "band_hash"
        )
        cross = new_a.join(
            index.select(F.col("doc_id").alias("b"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        ).filter(F.col("a") != F.col("b"))
        within = new_a.join(
            new_bands.select(F.col("doc_id").alias("b"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        ).filter(F.col("a") > F.col("b"))
        # cand feeds THREE consumers below (the id prune plus both sides of
        # the verify join); persist so the band bucket-join runs once.
        cand = (
            cross.select("a", "b")
            .unionByName(within.select("a", "b"))
            .distinct()
            .persist()
        )
        doc_store = (
            spark.read.parquet(self.docs_path)
            if os.path.exists(self.docs_path)
            else batch.limit(0)
        )
        sh = self._verify_shingles(doc_store, batch, cand)
        a = sh.select(F.col("doc_id").alias("a"), F.col("__sh").alias("__sa"))
        b = sh.select(F.col("doc_id").alias("b"), F.col("__sh").alias("__sb"))
        matches = (
            cand.join(a, "a").join(b, "b")
            .withColumn("jaccard", F.round(jaccard(F.col("__sa"), F.col("__sb")), 6))
            .filter(F.col("jaccard") >= self.threshold)
            .select("a", "b", "jaccard")
            .withColumn("batch_id", F.lit(batch_id))
        )
        matches.write.mode("append").parquet(self.matches_path)
        new_bands.write.mode("append").parquet(self.bands_path)
        batch.write.mode("append").parquet(self.docs_path)
        cand.unpersist()
        new_bands.unpersist()
        batch.unpersist()

    def matches(self, spark) -> DataFrame:
        if not os.path.exists(self.matches_path):
            raise FileNotFoundError("no batches processed yet")
        return spark.read.parquet(self.matches_path)

    def compact_state(
        self, spark, *, target_file_bytes: int = 256 * 1024 * 1024
    ) -> None:
        """Housekeeping for long-running streams: every micro-batch APPENDS
        one file per partition to the band index / doc store / matches, so
        after thousands of batches the scans in step 2/3 go metadata-bound.
        Rewrites each state table to ~target-sized files (atomic swap via
        sources.files.compact). Run it between batches on whatever cadence
        the batch rate dictates — state CONTENT is untouched, so detection
        results are identical before and after."""
        from flink_kafka_table_api_spark.sources.files import compact

        for p in (self.bands_path, self.docs_path, self.matches_path):
            if os.path.exists(p):
                compact(spark, p, target_file_bytes=target_file_bytes)


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
