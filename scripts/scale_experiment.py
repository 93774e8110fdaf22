#!/usr/bin/env python
"""Scaling experiment: measure headline operators at 1x and Nx the sf0.1
data volume (Nx built by replicating the driver testdata with remapped ids
— same distributions, N times the rows) and report scaling efficiency
(time_Nx / (N * time_1x); 1.0 = perfectly linear, lower is better).

This is the evidence behind the 100 TB claims: an operator whose cost is
linear in input (and whose shuffles carry aggregates, not rows) should show
efficiency <= ~1 once fixed per-query overhead amortizes. Quadratic or
driver-bound operators blow up instead.

Run: python scripts/scale_experiment.py [N] [query ...]
     (default N=8; with query names given, measures ONLY those instead of
     the standing MEASURE list — used per round to add 8x rows for new
     operators without re-running the whole table)

Skew mode (round-7 VERDICT item 3 — uniform replication keeps every key
distribution intact, but real 100 TB corpora are zipf-skewed on their
join/group keys):

    python scripts/scale_experiment.py N --skew [query ...]

builds the SAME Nx volume with two zipf(s~=1.1) hot-key injections —
`events.user_id` redrawn from the zipf rank distribution (top user ~6.7%
of ALL events: the window/sessionization straggler shape) and a zipf-hot
boilerplate paragraph appended to ~25% of documents (shared web-template
text: the hot-shingle / hot-LSH-bucket shape) — then measures each query
at Nx uniform AND Nx skewed and reports the degradation ratio. It also
runs an explicit AQE probe (skewed events x customer sort-merge join)
and reports whether AQE's skew-split engaged (the
test_aqe_splits_skewed_join_partitions pin, exercised at scale).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_kafka_table_api_spark.queries import (  # noqa: E402
    BENCH_ONLY,
    QUERIES,
)

RUNNABLE = {**QUERIES, **BENCH_ONLY}
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
# table -> (id column to remap, other columns referencing it stay internal)
SCALED = {"documents": "doc_id", "lineitem": "l_orderkey",
          "events": "event_id", "customer": "c_custkey",
          "embeddings": "vec_id"}
MEASURE = [
    "dedup_minhash_fast",   # CPU-bound narrow + tiny shuffle
    "lang_id",              # narrow text pass
    "tfidf",                # explode + window + broadcast join
    "pricing_summary",      # hash agg
    "token_count",          # narrow regex pass
    # round-4 additions
    "pii_redact",           # codegen'd regexp chain, zero exchange
    "doc_chunks",           # bounded explode, zero exchange
    "chunk_dedup",          # hash-co-partitioned self stats
    "importance_weights",   # fit (2 scans) + broadcast-ratio scoring
    "tpch_q9_product_profit",  # 6-way join over derived partsupp
    # round-4: the LSH family — the most expensive headline queries, whose
    # 8x efficiency was unmeasured (VERDICT r3 item 6). Sub-linear is the
    # expectation: band-bucket joins shuffle signatures (k longs/doc), and
    # the pair space only grows with real duplicate density, not n^2.
    "lsh_candidate_pairs",   # banding + bucket self-join
    "neardup_verified_fast", # candidates + semi-join-pruned Jaccard verify
    "dedup_clusters",        # pairs -> connected components -> canonical
    # round-4 additions: new operator families
    "bloom_decontaminate",   # broadcast bitmap + candidate-only verify join
    "cdc_chunk_dedup",       # content-defined chunking + hash-keyed stats
    "bigram_lm_score",       # 2 count aggs + gram-keyed join + ordered fold
    "top_ngram_fraction",    # explode + partial-agg argmax
    # round-6 staged-operator additions (BENCH_ONLY twins)
    "dup_ngram_coverage",    # zero-shuffle Gopher coverage projection
    "label_propagation",     # iterative vote join+agg rounds
    "nb_scores",             # counting shuffles + broadcast-grid fold
    "source_kl_divergence",  # vocab join + per-source ordered fold
    # round-10 staged-operator additions (BENCH_ONLY twins)
    "winnowing",             # zero-shuffle per-row window-min folds
    "seasonal_anomaly",      # tiny-key aggs + broadcast joins
    "link_prediction",       # adjacency wedge self-join + top-k
    "containment_pairs",     # LSH bucket join + directional verify
    # round-11 staged-operator additions (BENCH_ONLY twins)
    "winnow_matches",        # fingerprint hash self-join + pair spans
    "adamic_adar",           # wedge join + apex-ordered 1/ln(d) folds
    "equi_depth_bins",       # 1 percentile agg + broadcast-cut fold
    # lsh_recall_audit is deliberately absent: its ground-truth side IS
    # prefix_filter_pairs (already measured via simjoin_prefix), and the
    # operator's contract is sample-scale auditing, not corpus-scale.
    # round-12 staged-operator additions (BENCH_ONLY twins)
    "ngram_novelty",         # 3 corpus-shingle keyed shuffles
    "cusum_drift",           # 1 daily-count agg + calendar windows
    "zipf_gini_audit",       # 1 token-count agg + histogram folds
    # edit_similarity_join is deliberately absent: its input is the
    # DISTINCT-name set of a dimension table (part stays symlinked, not
    # replicated — the harness's 8x leaves it bit-identical), and its
    # corpus-facing stage is the same groupBy-count shape dedup_exact
    # already measures. er_clusters shares the exemption (same input).
    # round-13 staged-operator additions (BENCH_ONLY twins)
    "readability",           # zero-shuffle integer-count projection
    "rake_keywords",         # doc-window segmentation + keyed stats
    # round-14 staged-operator additions (BENCH_ONLY twins)
    "burst_detection",       # 1 daily agg + calendar Viterbi folds
    "source_lang_mi",        # 1 contingency agg + tiny-table folds
    "tokenizer_fertility",   # vocab merge chain + (lang, word) agg
    "cluster_silhouette",    # O(n*k) crossJoin + two keyed aggs
    # (replicated embeddings keep vec_id < 8 selecting the ORIGINAL 8
    # centroids — replicas' ids are shifted up — so the 8x run audits
    # 8x vectors against the same coarse clustering: the honest shape)
    # round-15 staged-operator additions (BENCH_ONLY twins)
    "ks_source_drift",       # 1 (group, value) agg + tiny ECDF grids
    "chi2_independence",     # 1 contingency agg + full-grid fold
    "shingle_overlap_matrix",  # corpus-shingle agg + ranked heads
    # round-16 staged-operator additions (BENCH_ONLY twins)
    "holt_forecast",         # 1 daily agg + sequential fold
    "acf_audit",             # 1 daily agg + lag-slice folds
    "snapshot_diff",         # 2 narrow scans + keyed full-outer join
    # round-17 staged-operator additions (BENCH_ONLY twins)
    "hits_scores",           # 8 co-partitioned joins + integer aggs
    "markov_transitions",    # 1 user-keyed lag window + tiny agg
    "benford_audit",         # 1 corpus pass + 9-row broadcast spine
    # round-18 staged-operator additions (BENCH_ONLY twins)
    "k_anonymity",           # 1 QI-keyed agg + tiny-class algebra
    "kaplan_meier",          # 1 subject agg + death-frame folds
    "psi_drift",             # 1 percentile agg + 2 bin-count aggs
    # round-19 staged-operator additions (BENCH_ONLY twins)
    "rfm_segments",          # 1 customer agg + 1-row cut broadcast
    "mann_whitney",          # 1 (grp, value) agg + midrank grid
    "assoc_rules",           # A-priori prune + broadcast df joins
    # round-20 staged-operator additions (BENCH_ONLY twins)
    "ewma_control",          # 1 daily agg + groups-x-days chart fold
    "heaps_law",             # 1 token scan -> 2 aggs + 20-row fit
    "grid_density",          # 1 cell agg + dense-cell CC + label join
    # reserve operators
    "bfs_hops",              # per-round frontier join + settle anti-join
    "mann_kendall",          # daily agg + bounded pair join + median
]


# zipf(s=1.1) rank draw from a deterministic md5 uniform: with
# u ~ U(0,1], K = floor(u^(-1/(s-1))) = floor(u^-10) has the zipf tail
# P(K > k) = k^-0.1 — rank 1 gets ~6.7% of ALL rows, rank 2 ~3.7%, ...
# Deterministic (md5 of the row id), so both engines / reruns agree.
def _zipf_rank_expr(id_expr: str, cap: int) -> str:
    u = (f"((CAST(CONV(SUBSTRING(MD5(CAST({id_expr} AS STRING)), 1, 8), "
         f"16, 10) AS DOUBLE) + 1.0) / 4294967296.0)")
    # the s=1.1 tail is heavy (P(K>k) = k^-0.1): ranks past `cap` WRAP
    # (modulo) instead of truncating onto the cap — truncation would pile
    # ~half the mass onto one artificial mega-key; wrapping spreads the
    # recycled tail as ~uniform noise while rank 1 keeps its ~6.7% share
    # LEAST(..., 9e15) keeps the double finite-and-castable (u near 2^-32
    # makes u^-10 overflow BIGINT) before the modulo wrap
    return (f"(1 + (CAST(FLOOR(LEAST(POW({u}, -10.0), 9.0e15)) AS BIGINT) "
            f"- 1) % CAST({cap} AS BIGINT))")


# 16 boilerplate paragraphs (~15 words each): the shared web-template
# text that makes shingle/minhash-band keys hot in real crawls. Appended
# AFTER alphabet rotation so the SAME paragraph spans all replicas —
# hot keys must cross the whole corpus to stress the shuffle.
_BOILER = [
    " ".join(f"tmpl{k}tok{j}" for j in range(15)) for k in range(1, 17)
]


def build_scaled(spark, n: int, out_dir: str, *, skew: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t in SCALED:
            df = spark.read.parquet(f"{BASE}/{t}.parquet")
            idc = SCALED[t]
            span = df.agg(F.max(idc)).first()[0] + 1
            alpha = "abcdefghijklmnopqrstuvwxyz"
            parts = []
            for i in range(n):
                p = df.withColumn(idc, F.col(idc) + F.lit(i * span))
                if t == "documents" and i:
                    # rotate the alphabet per replica: a bijection on chars
                    # preserves every intra-replica Jaccard EXACTLY (so
                    # duplicate density per row stays constant — the right
                    # scaling model) while making replicas textually
                    # disjoint (so the near-dup pair space grows linearly
                    # with n, not quadratically from replica==replica dups)
                    rot = alpha[i:] + alpha[:i]
                    p = p.withColumn(
                        "text",
                        F.translate(
                            "text", alpha + alpha.upper(),
                            rot + rot.upper(),
                        ),
                    )
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if skew and t == "events":
                # redraw user_id from the zipf rank distribution: the top
                # user owns ~6.7% of ALL events across replicas — the
                # sessionization / per-user-window straggler shape
                out = out.withColumn(
                    "user_id",
                    F.expr(_zipf_rank_expr("event_id", 1499)) - F.lit(1),
                )
            if skew and t == "documents":
                # append a zipf-hot boilerplate paragraph to the ~24% of
                # docs whose rank lands within the 16 templates: hot
                # shingles -> hot minhash bands -> hot bucket-join keys
                rank = F.expr(_zipf_rank_expr("doc_id", 10**6))
                boiler = F.array(*[F.lit(b) for b in _BOILER])
                out = out.withColumn(
                    "text",
                    F.when(
                        rank <= 16,
                        F.concat_ws(
                            " ", F.col("text"),
                            F.element_at(boiler, rank.cast("int")),
                        ),
                    ).otherwise(F.col("text")),
                ).withColumn("n_chars", F.length("text").cast("long"))
            out.repartition(32).write.parquet(dst)
        else:
            os.symlink(f"{BASE}/{t}.parquet", dst)


def aqe_skew_probe(spark, skew_dir: str) -> None:
    """Exercise the test_aqe_splits_skewed_join_partitions pin AT SCALE:
    sort-merge-join the zipf-skewed events against a synthetic per-user
    dimension wide enough to defeat broadcast, then report whether AQE's
    OptimizeSkewedJoin split the hot partition (the executed plan's
    shuffle read shows 'skewed')."""
    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    dim = (
        spark.range(0, 1500)
        .select(
            F.col("id").alias("user_id"),
            # pad varies with id so constant-folding can't strip it from
            # the shuffle (the pin test's lesson)
            F.expr("repeat(uuid(), CAST(48 + id % 16 AS INT))").alias("pad"),
        )
    )
    # Local-scale proxy thresholds: production defaults detect skew at
    # 256 MB partitions / 5x median — sizes a 100 TB corpus trivially
    # produces but a 64x-sf0.1 local run cannot. Scale the DETECTION
    # threshold to this run's partition sizes (the mechanism under test
    # is identical); restore afterwards.
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    # engaging point measured at 64x (compressed shuffle partitions run
    # ~1.5-3 MB here; production defaults engage at 256 MB): hot partition
    # ~3x median
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    # the test_aqe_splits_skewed_join_partitions recipe: partition
    # coalescing masks the skew marker at proxy scale (it fuses the small
    # partitions the split would be measured against), and the dim side
    # must not broadcast for a sort-merge join to exist at all
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # global agg, NOT groupBy(user_id): AQE declines to split a skewed
        # join whose output partitioning is reused downstream (the split
        # would force a re-shuffle) — measured while building this probe
        def run() -> tuple[float, str]:
            joined = ev.select("user_id", "event_id", "value").join(
                dim, "user_id"
            ).agg(F.sum(F.length("pad")).alias("bytes_out"))
            t0 = time.perf_counter()
            joined.collect()
            dt = time.perf_counter() - t0
            return dt, joined._jdf.queryExecution().executedPlan().toString()

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_off, _ = run()
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_on, plan = run()
        # the executed-plan markers: "AQEShuffleRead skewed" +
        # "SortMergeJoin(skew=true)"
        engaged = "skewed" in plan
        print(f"AQE skew probe (zipf user_id SMJ + agg): split OFF "
              f"{t_off:.2f}s -> split ON {t_on:.2f}s; engaged: {engaged}")
        if not engaged:
            # surface the shuffle-read lines for the record
            for line in plan.splitlines():
                if "AQEShuffleRead" in line or "ShuffleQueryStage" in line:
                    print("  ", line.strip()[:120])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# the 10 shuffle-heaviest operators over the two skewed tables — the set
# the round-7 VERDICT ordered measured under zipf skew. (The graph family
# is exempt by construction: its gate graphs are degree-bounded
# permutation generators over customer KEYS, so no input skew can create
# a celebrity vertex; zorder_write is a lineitem write, not a
# documents/events shuffle.)
SKEW_MEASURE = [
    "lsh_candidate_pairs",    # hot minhash-band bucket self-join
    "neardup_verified_fast",  # hot candidates + verify join
    "dedup_clusters",         # hot pair graph -> connected components
    "simjoin_prefix",         # hot prefix-token postings join
    "winnow_matches",         # hot fingerprint self-join (max_hash_df cap)
    "containment_pairs",      # hot LSH buckets + directional verify
    "ngram_novelty",          # hot corpus-shingle keyed shuffles
    "cdc_chunk_dedup",        # hot content-chunk hash keys
    "sessionize",             # zipf user_id per-user window straggler
    "markov_transitions",     # zipf user_id lag window + agg
    # round-8 session 5: the banded (key, time-bin) OVER window — the
    # fix for the 4.52x per-key-sort straggler; keep it measured so a
    # regression back to the naive shape re-flags (>3x trips NEEDS FIX)
    "stream_over_agg",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    skew = "--skew" in args
    if skew:
        args.remove("--skew")
    n = int(args[0]) if args else 8
    measure = args[1:] or (SKEW_MEASURE if skew else MEASURE)
    unknown = [q for q in measure if q not in RUNNABLE]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # v2: documents replicas are alphabet-rotated (see build_scaled) — the
    # dir name versions the construction so stale caches never mix
    out_dir = f"/tmp/fkta_scale_x{n}_v2"
    spark = get_spark(app_name="fkta-scale", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, n, out_dir)
    if skew:
        skew_dir = f"/tmp/fkta_scale_x{n}_skew_v1"
        build_scaled(spark, n, skew_dir, skew=True)
        # warm once (same as below), then measure Nx-uniform vs Nx-skewed
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        from flink_kafka_table_api_spark.operators.dedup import (
            minhash_signatures,
        )
        minhash_signatures(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
            "doc_id", "text").count()
        from flink_kafka_table_api_spark.caching import release_cached
        runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "1"))

        def best(fn_name: str, d: str) -> float:
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                RUNNABLE[fn_name](spark, d).count()
                ts.append(time.perf_counter() - t0)
                release_cached()
            return min(ts)

        print(f"| query | {n}x uniform s | {n}x zipf-skew s | skew/uniform |")
        print("|---|---|---|---|")
        for name in measure:
            tu = best(name, out_dir)
            tk = best(name, skew_dir)
            flag = "  <-- >3x, NEEDS FIX" if tk > 3 * tu else ""
            print(f"| {name} | {tu:.2f} | {tk:.2f} | {tk / tu:.2f} |{flag}")
        aqe_skew_probe(spark, skew_dir)
        spark.stop()
        return
    # warm codegen/workers once, as bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from flink_kafka_table_api_spark.operators.dedup import minhash_signatures
    minhash_signatures(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text").count()
    print(f"| query | 1x s | {n}x s | efficiency ({n}x/{n}*1x) |")
    print("|---|---|---|---|")
    from flink_kafka_table_api_spark.caching import release_cached

    # SPARK_GRAFT_SCALE_RUNS>1 measures each (query, scale) that many
    # times and reports the MIN — removes the first-run JIT/streaming-
    # machinery setup that otherwise inflates the 1x column (the 1x run
    # always executes first and coldest; see the dedup_clusters note in
    # BASELINE.md). Single-run (default) matches the r3/r4 tables.
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "1"))

    def best(fn_name: str, d: str) -> float:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            RUNNABLE[fn_name](spark, d).count()
            ts.append(time.perf_counter() - t0)
            release_cached()
        return min(ts)

    for name in measure:
        t1x = best(name, BASE)
        tnx = best(name, out_dir)
        print(f"| {name} | {t1x:.2f} | {tnx:.2f} | {tnx / (n * t1x):.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
