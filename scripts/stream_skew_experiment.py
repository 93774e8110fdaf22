#!/usr/bin/env python
"""Streaming skew experiment (round-8, VERDICT r7 item 4): the round-7
zipf-64x table measured the BATCH operators under boilerplate skew; this
measures the STREAMING incremental pipeline under the same corpus shape.

Construction: the sf0.1 documents table with the scale_experiment.py
zipf(s~=1.1) boilerplate injection — ~24% of docs get one of 16 shared
template paragraphs appended; the rank-1 template lands on ~6.7% of the
corpus, far above the 256-doc band-bucket cap — run through
stream_curate_pack as 2 availableNow micro-batches, vs the uniform
corpus.

Reports:
  - wall time uniform vs skewed (min of N runs) and the degradation
    ratio — the number BASELINE.md records;
  - direct evidence the cap engaged INSIDE the streaming index join:
    per-batch verified-match counts, the max accumulated bucket
    occupancy, and whether the per-batch candidate plan kept the cap as
    a broadcast anti-join (IncrementalDedup.last_candidate_plan).

Usage: python scripts/stream_skew_experiment.py [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from scale_experiment import _BOILER, _zipf_rank_expr  # noqa: E402

from flink_kafka_table_api_spark.session import get_spark  # noqa: E402
from flink_kafka_table_api_spark.streaming.curation_pipeline import (  # noqa: E402
    stream_curate_pack,
)
from flink_kafka_table_api_spark.streaming.incremental_dedup import (  # noqa: E402
    IncrementalDedup,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def uniform_docs(spark):
    return spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )


def skewed_docs(spark):
    """The scale_experiment.py documents skew at 1x: zipf-hot boilerplate
    appended to the ~24% of docs whose rank lands within the 16
    templates (rank 1 ~ 6.7% of the corpus — one band-bucket family far
    above the 256 cap)."""
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    rank = F.expr(_zipf_rank_expr("doc_id", 10**6))
    boiler = F.array(*[F.lit(b) for b in _BOILER])
    return docs.withColumn(
        "text",
        F.when(
            rank <= 16,
            F.concat_ws(
                " ", F.col("text"), F.element_at(boiler, rank.cast("int"))
            ),
        ).otherwise(F.col("text")),
    ).select("doc_id", "text")


def flooded_docs(spark):
    """The mega-bucket shape the cap exists for: the zipf rank-1 docs
    (~6.7% of the corpus, ~335 docs at sf0.1 — above the 256 cap)
    REPLACED by the shared template plus a per-doc suffix — boilerplate-
    only pages, where the template dominates every minhash and the
    whole group lands in one band-bucket family. The append-style skew
    above dilutes the template among each doc's own shingles (max
    bucket ~76 at sf0.1), so it stresses verify volume but not the cap;
    this variant is the cap's trigger shape."""
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    rank = F.expr(_zipf_rank_expr("doc_id", 10**6))
    return docs.withColumn(
        "text",
        F.when(
            rank == 1,
            F.concat_ws(
                " ", F.lit(_BOILER[0]), F.lit(_BOILER[1]),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("text")),
    ).select("doc_id", "text")


def timed_pipeline(spark, docs, tag: str, runs: int) -> tuple[float, int]:
    times, n = [], 0
    for _ in range(runs):
        state = tempfile.mkdtemp(prefix=f"fkta_skewexp_{tag}_")
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        out = stream_curate_pack(
            spark, docs, state, threshold=0.5, quality_threshold=0.5,
            budget=256, chunks=2, portable=True,
        )
        n = out.count()
        times.append(time.perf_counter() - t0)
        shutil.rmtree(state, ignore_errors=True)
    return min(times), n


def cap_evidence(spark, docs, tag: str) -> None:
    """Replay the corpus through IncrementalDedup directly (the same
    two id-range batches the file stream delivers) to read the plan pin
    and the per-batch match volumes."""
    state = tempfile.mkdtemp(prefix="fkta_skewexp_evidence_")
    inc = IncrementalDedup(
        state, threshold=0.5, portable=True, capture_plans=True
    )
    mid = docs.agg((F.max("doc_id") / 2).cast("long")).first()[0]
    inc.process_batch(docs.filter(F.col("doc_id") <= mid), 0)
    inc.process_batch(docs.filter(F.col("doc_id") > mid), 1)
    m = inc.matches(spark)
    per_batch = {
        r.batch_id: r.n
        for r in m.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    occ = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(inc.bands_path)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"), F.sum(F.when(F.col("n") > 256, 1).otherwise(0)))
        .first()
    )
    plan = inc.last_candidate_plan
    print(f"[{tag}] verified matches per batch: {per_batch}")
    print(f"[{tag}] max accumulated bucket occupancy: {occ[0]} "
          f"(buckets over the 256 cap: {occ[1]})")
    print(f"[{tag}] cap in the streaming candidate plan: "
          f"LeftAnti={'LeftAnti' in plan} Broadcast={'Broadcast' in plan}")
    shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(
        app_name="fkta-stream-skew",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the streaming machinery once (same rationale as bench.py)
    timed_pipeline(spark, uniform_docs(spark).limit(50), "warm", 1)
    t_u, n_u = timed_pipeline(spark, uniform_docs(spark), "uniform", runs)
    t_s, n_s = timed_pipeline(spark, skewed_docs(spark), "skew", runs)
    t_f, n_f = timed_pipeline(spark, flooded_docs(spark), "flood", runs)
    print(f"uniform: {t_u:.2f}s ({n_u} packed rows)")
    print(f"zipf-boilerplate-append: {t_s:.2f}s ({n_s} packed rows), "
          f"ratio {t_s / t_u:.2f}x")
    print(f"template-flood (mega-bucket): {t_f:.2f}s ({n_f} packed rows), "
          f"ratio {t_f / t_u:.2f}x")
    cap_evidence(spark, skewed_docs(spark), "append-skew")
    cap_evidence(spark, flooded_docs(spark), "flood")
    spark.stop()


if __name__ == "__main__":
    main()
