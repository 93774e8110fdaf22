"""Count-Min sketch frequency estimation (Cormode & Muthukrishnan, 2005)
— the mergeable fixed-size counter structure behind streaming heavy-hitter
detection. EXT scope: the reference has no aggregation surface at all; the
repo's other sketches (HLL approx_count_distinct, approx_percentile) are
Spark built-ins, while CMS is composed here from plain groupBy algebra.

Why this shape survives 100 TB: the sketch is a (depth x width) counter
grid — ``depth * width`` INT64 cells TOTAL, independent of row count or
key cardinality. Each partition's rows hash into (row, bucket) cells that
partially aggregate map-side, so the shuffle carries at most
depth*width rows per partition, and two sketches over disjoint data merge
by cell-wise addition (the same property that makes it a streaming/
windowed-state structure). Estimation probes are a broadcast join against
the tiny sketch table.

The driver-gate query pairs the sketch with the exact top-k (the
approx_distinct tolerance-oracle pattern): emit exact counts plus
booleans asserting the CMS guarantees — est >= true (never undercounts:
every occurrence of a key lands in all of its cells) and
est <= true + eps_mult * N / width (overcount is bounded by colliding
mass; with near-uniform keys and width >> k the bound holds
deterministically for this data)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.parallelism import ensure_parallelism


def cms_sketch(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Build the Count-Min counter grid: one row per occupied (seed,
    bucket) cell. Single scan; the explode fans each input row into
    ``depth`` (seed, bucket) pairs that hash-aggregate map-side, so the
    shuffle is bounded by depth*width per partition regardless of input
    volume. xxhash64 (native, codegen) seeds the row hashes — the sketch
    is engine-internal state, so no portable-hash tax."""
    base = ensure_parallelism(df).select(
        F.col(key_col).cast("string").alias("__k")
    )
    pairs = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            F.xxhash64(F.lit(s), F.col("__k")), F.lit(width)
                        ).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("e")
    )
    return pairs.groupBy("e.seed", "e.bucket").agg(
        F.count("*").alias("cell_count")
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """CMS point estimate for each DISTINCT key in ``keys``: min over the
    depth rows of the key's cell counters. ONE broadcast join: each probe
    fans out into its ``depth`` (seed, bucket) cell addresses, joins the
    fixed-size sketch once, and a groupBy(key)-min folds the depth
    counters back to the estimate — O(probes * depth) join rows against a
    broadcast-sized build side, and a single join stage regardless of
    depth (the previous shape chained ``depth`` sequential broadcast
    joins, i.e. depth broadcast builds and depth plan nodes).

    Contract: probe keys must be unique per row (they are a top-k / probe
    SET by construction); duplicate key rows would collapse to one output
    row here. Grouping is by ``key_col`` alone — carried columns ride
    through F.first (well-defined under the uniqueness contract, and it
    keeps non-groupable types like maps usable as carried columns)."""
    clash = {"seed", "bucket", "cell_count", "__ks"} & set(keys.columns)
    if clash:
        raise ValueError(
            f"cms_estimate: probe columns {sorted(clash)} collide with the "
            "sketch side's internal names — alias them before probing"
        )
    probe_cells = keys.withColumn(
        "__ks", F.col(key_col).cast("string")
    ).select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            F.xxhash64(F.lit(s), F.col("__ks")), F.lit(width)
                        ).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("__cell"),
    )
    joined = probe_cells.join(
        F.broadcast(sketch),
        (F.col("__cell.seed") == F.col("seed"))
        & (F.col("__cell.bucket") == F.col("bucket")),
        "left",
    )
    other_cols = [c for c in keys.columns if c != key_col]
    return joined.groupBy(key_col).agg(
        *[F.first(c).alias(c) for c in other_cols],
        # an unoccupied cell means the true count is 0 for that row
        F.min(F.coalesce(F.col("cell_count"), F.lit(0))).alias("cms_est"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    eps_mult: float = 3.0,
) -> DataFrame:
    """Top-``k`` keys by exact frequency, annotated with the CMS estimate
    checks. Exact side: one keyed count + TakeOrdered(k). Sketch side:
    :func:`cms_sketch` + :func:`cms_estimate` over the k winners. Emits
    ``key_col``, exact ``n``, ``est_ge_true`` and ``est_within_eps`` —
    the two CMS accuracy guarantees as oracle-checkable booleans (the
    estimate itself depends on xxhash64 cell placement, engine-internal
    by design)."""
    from flink_kafka_table_api_spark.caching import tracked_persist

    # the sketch feeds depth estimate-joins plus the N probe — persist the
    # (<= depth*width)-row grid so the input is scanned exactly once for it
    sketch = tracked_persist(
        cms_sketch(df, key_col, depth=depth, width=width)
    )
    totals = ensure_parallelism(df).groupBy(key_col).agg(
        F.count("*").alias("n")
    )
    topk = (
        totals.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(k)
    )
    est = cms_estimate(topk, sketch, key_col, depth=depth, width=width)
    # N from the sketch itself (any seed row sums to the stream length) —
    # no second scan of the input
    n_total = sketch.filter(F.col("seed") == 0).agg(
        F.sum("cell_count").alias("__N")
    )
    est = est.crossJoin(F.broadcast(n_total))
    bound = F.lit(float(eps_mult)) * F.col("__N").cast("double") / F.lit(width)
    return est.select(
        key_col,
        "n",
        (F.col("cms_est") >= F.col("n")).alias("est_ge_true"),
        ((F.col("cms_est") - F.col("n")).cast("double") <= bound).alias(
            "est_within_eps"
        ),
    ).orderBy(F.col("n").desc(), F.col(key_col).asc())
