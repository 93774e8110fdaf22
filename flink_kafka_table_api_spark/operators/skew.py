"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (one celebrity user, one dominant language)
can pin an aggregation's wall time to a single reducer. Salting splits each
hot key across ``salt`` sub-keys for the partial phase, then merges the
partials — the shuffle after phase 1 carries at most ``salt`` rows per key
regardless of skew. AQE's skewedJoin handles *join* skew automatically;
aggregation skew still wants this explicit shape when map-side partials
don't collapse enough (high-cardinality secondary dimensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.functions.portable import DEC


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the (large, skewed) left side gets a random
    salt in [0, salt); the (smaller) right side is replicated once per salt
    value; the join key becomes (key, salt), splitting each hot key's rows
    across ``salt`` reducers. Semantically identical to the unsalted join
    for inner/left joins (each left row matches exactly its salt replica).

    Use when AQE's skew-join splitting can't kick in (e.g. the skewed side
    is freshly shuffled by an upstream wide op, or the optimizer
    underestimates the hot key). Cost: right side inflated salt-fold — keep
    ``salt`` near the reducer-count you need, not higher."""
    if how not in ("inner", "left", "left_outer"):
        # full/right outer would emit each unmatched right row once PER
        # SALT REPLICA (salt-fold duplication) — refuse instead of
        # silently returning wrong results.
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}"
        )
    l_ = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_ = right.withColumn(
        "__rsalt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l_.join(
        r_,
        (l_[left_key] == r_[right_key]) & (l_["__salt"] == r_["__rsalt"]),
        how,
    )
    return joined.drop("__salt", "__rsalt")


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    salt: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n_rows",
) -> DataFrame:
    """SUM + COUNT per key, skew-proof. Decimal accumulation keeps the
    two-phase result bit-identical to a one-phase aggregate (float sums
    would differ by accumulation order — the same trick the oracle layer
    uses, here load-bearing for internal consistency)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(F.col(value_col).cast(DEC)).alias("__psum"),
        F.count(value_col).alias("__pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias(sum_alias),
        F.sum("__pcnt").alias(count_alias),
    )
