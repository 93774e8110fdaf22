"""temperature_mix (operators/curation.py): deterministic temperature-
scaled source rebalancing. Pinned against an independent Python replay of
the whole rule (md5 hash included), plus the T=1 identity, rebalancing
direction, partitioning-invariance, and the power-of-two guard."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from flink_kafka_table_api_spark.operators.curation import temperature_mix


def _corpus(spark, sizes):
    rows = []
    i = 0
    for src, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _py_replay(sizes, temperature, scale, salt="fkta-tmix"):
    """Independent reference implementation of the documented rule."""
    k = int(math.log2(temperature))
    counts = sorted(sizes.items())
    n_total = sum(n for _, n in counts)

    def rootk(x):
        for _ in range(k):
            x = math.sqrt(x)
        return x

    w = [(s, rootk(float(n))) for s, n in counts]
    w_sum = 0.0
    for _, x in w:
        w_sum += x
    rates = {
        s: round(x / w_sum * scale * n_total / n, 9)
        for (s, x), (_, n) in zip(w, counts)
    }
    out = set()
    i = 0
    for src, n in counts:
        for _ in range(n):
            h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)
            u = (h % (1 << 30)) / float(1 << 30)
            c = rates[src]
            nc = math.floor(c) + (1 if u < round(c - math.floor(c), 9) else 0)
            for copy in range(1, int(nc) + 1):
                out.add((i, src, copy))
            i += 1
    return out


SIZES = {"web": 400, "wiki": 40, "code": 8}


def test_matches_independent_python_replay(spark):
    df = _corpus(spark, SIZES)
    got = {
        (r.doc_id, r.source, r.copy)
        for r in temperature_mix(df, temperature=4.0, scale=1.0).collect()
    }
    assert got == _py_replay(SIZES, 4.0, 1.0)


def test_temperature_one_is_identity(spark):
    df = _corpus(spark, SIZES)
    got = temperature_mix(df, temperature=1.0, scale=1.0)
    assert got.filter(F.col("copy") != 1).count() == 0
    assert got.count() == sum(SIZES.values())


def test_rebalances_toward_small_sources(spark):
    df = _corpus(spark, SIZES)
    out = temperature_mix(df, temperature=4.0).groupBy("source").count()
    shares = {r.source: r["count"] for r in out.collect()}
    n = sum(shares.values())
    in_n = sum(SIZES.values())
    # low-resource sources gain share, the dominant source loses it
    assert shares["code"] / n > SIZES["code"] / in_n
    assert shares["wiki"] / n > SIZES["wiki"] / in_n
    assert shares["web"] / n < SIZES["web"] / in_n
    # total stays within 5% of scale * N (deterministic rounding residue)
    assert abs(n - in_n) / in_n < 0.05
    # upsampling happened by repetition
    assert (
        temperature_mix(df, temperature=4.0)
        .filter((F.col("source") == "code") & (F.col("copy") >= 2))
        .count()
        > 0
    )


def test_partitioning_invariant(spark):
    df = _corpus(spark, SIZES)
    a = {
        tuple(r)
        for r in temperature_mix(df, temperature=2.0).collect()
    }
    b = {
        tuple(r)
        for r in temperature_mix(df.repartition(7), temperature=2.0).collect()
    }
    assert a == b


def test_rejects_non_power_of_two_temperature(spark):
    df = _corpus(spark, {"a": 4})
    with pytest.raises(ValueError):
        temperature_mix(df, temperature=3.0)


def test_scale_shrinks_output_proportionally(spark):
    df = _corpus(spark, SIZES)
    n_full = temperature_mix(df, temperature=2.0, scale=1.0).count()
    n_half = temperature_mix(df, temperature=2.0, scale=0.5).count()
    assert abs(n_half - n_full / 2) / n_full < 0.05
    # and it still matches the Python replay at scale 0.5
    got = {
        tuple(r)
        for r in temperature_mix(df, temperature=2.0, scale=0.5).collect()
    }
    assert got == _py_replay(SIZES, 2.0, 0.5)


def test_null_source_raises_clearly(spark):
    df = spark.createDataFrame(
        [(1, "web"), (2, None)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_mix(df, temperature=2.0)


def test_oracle_sql_replays_operator_exactly(spark):
    """The committed round-6 oracle: DuckDB runs temperature_mix_sql on
    the same rows and must match the operator value-for-value."""
    import duckdb
    import pandas as pd

    from flink_kafka_table_api_spark.operators.curation import (
        temperature_mix_sql,
    )

    rows = []
    i = 0
    for src, n in sorted(SIZES.items()):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for t, s in ((4.0, 1.0), (2.0, 0.5), (1.0, 1.0)):
        got = {
            tuple(r)
            for r in temperature_mix(df, temperature=t, scale=s).collect()
        }
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "source"])
        )
        want = {
            tuple(r)
            for r in con.execute(
                temperature_mix_sql(temperature=t, scale=s)
            ).fetchall()
        }
        assert got == want, (t, s)


def test_oracle_replays_operator_on_random_corpora(spark):
    """The round-6 ADVICE flagged that cross-engine parity was only
    proven on the fixed SIZES corpus; this drives the operator vs the
    DuckDB oracle over a sweep of adversarial source-size mixes
    (prime sizes, near-equal weights, singleton sources, heavy skew) —
    the shapes most likely to land a rate near a 9-decimal rounding
    boundary."""
    import duckdb
    import pandas as pd

    from flink_kafka_table_api_spark.operators.curation import (
        temperature_mix_sql,
    )

    corpora = [
        {"a": 7, "b": 11, "c": 13},            # small primes
        {"a": 97, "b": 101},                   # near-equal
        {"only": 50},                          # single source
        {"big": 997, "mid": 89, "tiny": 1},    # heavy skew + singleton
        {"x": 256, "y": 128, "z": 64, "w": 32},  # powers of two
        {"s1": 333, "s2": 334, "s3": 333},     # three-way near-tie
    ]
    for sizes in corpora:
        for temp in (2.0, 4.0, 8.0):
            df = _corpus(spark, sizes)
            got = {
                (r.doc_id, r.source, r.copy)
                for r in temperature_mix(df, temperature=temp).collect()
            }
            rows = []
            i = 0
            for src, n in sorted(sizes.items()):
                for _ in range(n):
                    rows.append((i, src))
                    i += 1
            con = duckdb.connect()
            con.register(
                "documents", pd.DataFrame(rows, columns=["doc_id", "source"])
            )
            want = set(
                con.execute(
                    temperature_mix_sql(temperature=temp)
                ).fetchall()
            )
            assert got == want, (sizes, temp)
