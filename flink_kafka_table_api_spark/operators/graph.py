"""PageRank over an edge relation — the canonical iterative
message-passing computation (Page et al. 1999; the Pregel/GraphX
workload) the engine's other iterative operators (pointer-jumping
hierarchy, label-propagation connected components, k-means) don't
cover: per-round FAN-IN aggregation of neighbor state rather than
pointer rewriting or centroid assignment. Reference repo has no graph
surface (Kafka pipeline only); EXT scope.

Scale shape per iteration: ONE equi-join of the rank vector against the
edge list on src (both sides hash-partitioned on the join key; the edge
list is the big side and never changes, so a production run pre-
partitions and persists it once), then one groupBy(dst) aggregate.
State between rounds is the O(nodes) rank vector, localCheckpoint'ed to
truncate lineage (the connected_components/hierarchy_levels lesson:
a self-referential iterative plan doubles per round and the driver
chokes on the plan string long before data is a problem).

Cross-engine exactness (the oracle contract, proven recipe from
bigram_lm_score/time_decay): every per-node sum is a SRC-ORDERED left
fold over collect_list'ed contributions, so the float accumulation
order is pinned — Spark's F.aggregate and DuckDB's list_reduce over a
src-sorted list perform the identical IEEE add sequence, and each
contribution rank/outdeg is a single exactly-rounded division. The
operator requires the edge set to be SYMMETRIC (every edge present in
both directions, i.e. an undirected graph walked both ways) which
guarantees no dangling nodes — the dangling-mass correction term is a
GLOBAL float sum whose order cannot be pinned scalably, so excluding it
by construction is what keeps the operator oracle-exact. Directed
graphs with dangling nodes: pre-symmetrize, or accept engine-internal
results.

Skew note: a celebrity node's in-degree bounds its collect_list; at
extreme skew swap the ordered fold for decimal-accumulated F.sum
(order-free exact) at the cost of the cross-engine bit guarantee —
the top-k answer is unaffected either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Ranks after ``iterations`` synchronous PageRank rounds over a
    symmetric edge relation. Returns (node, rank) with rank rounded to
    9 decimals (the repo's cross-engine float-boundary recipe).

    rank_0 = 1/N; rank_{k+1}(v) = (1-d)/N + d * fold_{u->v}(rank_k(u)/outdeg(u))
    with the fold in ascending-u order (see module docstring).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    # symmetric edges => node set == src set; N is an exact integer
    n = outdeg.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty edge relation (an upstream filter removed "
            "every edge?) — rank is undefined over zero nodes"
        )
    base = float(1.0 - damping) / n
    ranks = outdeg.select(
        F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
    ).localCheckpoint()
    # the edge+degree side is iteration-invariant: persist it once, keyed
    # by src, so every round reuses the same co-partitioned build
    esd = e.join(outdeg, "src").persist()
    for _ in range(iterations):
        contribs = (
            esd.join(ranks, esd["src"] == ranks["node"])
            .select(
                "dst",
                "src",
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
        )
        folded = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "__c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["__c"],
            ).alias("__s")
        )
        nxt = folded.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("__s")).alias("rank"),
        ).localCheckpoint()
        ranks = nxt
        # NOTE: a localCheckpoint'ed DataFrame's blocks are NOT freed by
        # DataFrame.unpersist (no cacheManager entry) — they are released
        # when the JVM RDD is GC'd via the py4j finalizer after the
        # Python reference drops. Peak retained state is therefore
        # bounded by O(iterations * nodes) longs/doubles, tiny relative
        # to the edge list; the rebinding above is the whole cleanup.
    esd.unpersist()
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def pagerank_sql(
    edges_sql: str,
    *,
    damping: float = 0.85,
    iterations: int = 5,
) -> str:
    """DuckDB replay of :func:`pagerank` — the committed round-6 oracle.
    ``edges_sql`` is a query producing the symmetric (src, dst) relation.
    Iterations unroll as a WITH chain; each per-node sum is
    list_reduce over a src-ORDERED list of contributions (DuckDB's
    no-init fold seeds acc with the first element — identical to Spark's
    0.0-seeded F.aggregate fold since 0.0 + x == x), so the float
    accumulation sequence matches the operator's bit-for-bit. Validated
    against the operator by tests/test_graph.py."""
    # decimal-point literals are DECIMAL-typed in DuckDB, and decimal
    # arithmetic does NOT reproduce IEEE double ops — cast every float
    # constant to DOUBLE explicitly (1.0 - 0.85 as decimals is exactly
    # 0.15; as doubles it is 0.15000000000000002, which is what Spark
    # computes)
    d = f"CAST({damping!r} AS DOUBLE)"
    parts = [
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS c FROM deg)",
        "r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / c AS rank "
        "FROM deg, nn)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS ("
            f"SELECT e.dst AS node, "
            f"((CAST(1.0 AS DOUBLE) - {d}) / nn.c) + {d} * "
            f"list_reduce(list(r.rank / deg.d ORDER BY e.src), "
            f"(a, b) -> a + b) AS rank "
            f"FROM e JOIN deg ON e.src = deg.src "
            f"JOIN r{i} r ON e.src = r.node, nn "
            f"GROUP BY e.dst, nn.c)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node, round(rank, 9) AS rank FROM r{iterations}"
    )
