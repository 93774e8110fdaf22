"""Z-order layout clustering (sources/layout.py): interleave correctness
against a Python reference, row preservation through the rewrite, and the
actual point of the exercise — multi-dimensional file pruning measured
from parquet file statistics, z-ordered vs round-robin layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_kafka_table_api_spark.sources.layout import (
    files_overlapping_box,
    interleave_bits,
    zorder_key,
    zorder_write,
)

SF001 = "/root/testdata/sf0.01"


def _py_interleave(vals: list[int], bits: int) -> int:
    z = 0
    d = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * d + j)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [
        (0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (85, 170),
        (1, 128), (128, 1), (200, 3), (3, 200),
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_interleave([r.a, r.b], 8), (r.a, r.b)


def test_interleave_rejects_long_overflow(spark):
    with pytest.raises(ValueError):
        interleave_bits([F.col("a")] * 8, 8)


def test_zorder_write_preserves_rows(spark, tmp_path):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    out = str(tmp_path / "li_z")
    zorder_write(li, out, ["l_partkey", "l_suppkey"], num_files=8)
    back = spark.read.parquet(out)
    a = li.agg(
        F.count("*"), F.sum("l_partkey"), F.sum("l_suppkey"),
        F.sum("l_quantity"),
    ).first()
    b = back.agg(
        F.count("*"), F.sum("l_partkey"), F.sum("l_suppkey"),
        F.sum("l_quantity"),
    ).first()
    assert a == b
    assert sorted(back.columns) == sorted(li.columns)  # __z dropped


def test_zorder_prunes_multidim_box_where_roundrobin_cannot(spark, tmp_path):
    """The judged claim: after z-ordering on (l_partkey, l_suppkey), a
    conjunctive box predicate on BOTH columns overlaps far fewer files
    than under the natural round-robin layout, by parquet min/max file
    stats — the exact skipping decision a stats-aware reader makes."""
    # determinism, both sources: coalesce(1) pins percentile_approx's
    # sketch merge order (the bucket bounds), and exact_bounds=True pins
    # the range-partition boundaries — repartitionByRange's reservoir
    # sample is seeded from the RDD id, so even a single-partition input
    # lands different file boundaries run to run (observed: 3-5/16 hit
    # files on a quiet run, 9/16 under full-suite load). A pruning
    # assertion needs the layout to be a pure function of the data.
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").coalesce(1)
    n_files = 16
    natural = str(tmp_path / "li_natural")
    li.repartition(n_files).write.parquet(natural)
    zed = str(tmp_path / "li_zorder")
    zorder_write(li, zed, ["l_partkey", "l_suppkey"], num_files=n_files,
                 exact_bounds=True)

    # a ~10% x ~10% box in the middle of both domains
    pk = li.agg(F.expr("percentile_approx(l_partkey, array(0.45, 0.55))")).first()[0]
    sk = li.agg(F.expr("percentile_approx(l_suppkey, array(0.45, 0.55))")).first()[0]
    box = {
        "l_partkey": (float(pk[0]), float(pk[1])),
        "l_suppkey": (float(sk[0]), float(sk[1])),
    }
    hit_nat, tot_nat = files_overlapping_box(natural, box)
    hit_z, tot_z = files_overlapping_box(zed, box)
    assert tot_nat == n_files and tot_z == n_files
    # round-robin spreads both keys across every file -> no pruning
    assert hit_nat == n_files
    # z-order must prune to at most half the files (measured: ~3-5/16)
    assert hit_z <= n_files // 2, (hit_z, n_files)

    # and the pruned layout returns the same answer for the box query
    pred = (
        (F.col("l_partkey") >= box["l_partkey"][0])
        & (F.col("l_partkey") <= box["l_partkey"][1])
        & (F.col("l_suppkey") >= box["l_suppkey"][0])
        & (F.col("l_suppkey") <= box["l_suppkey"][1])
    )
    a = spark.read.parquet(natural).filter(pred).agg(
        F.count("*"), F.sum("l_quantity")
    ).first()
    b = spark.read.parquet(zed).filter(pred).agg(
        F.count("*"), F.sum("l_quantity")
    ).first()
    assert a == b


def test_zorder_key_constant_column_is_safe(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(100)], "a long, c long"
    )
    keyed, _ = zorder_key(df, ["a", "c"], bits=4)
    assert keyed.select("__z").distinct().count() > 1


def test_zorder_write_empty_input_writes_empty_dataset(spark, tmp_path):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").filter("l_partkey < 0")
    out = str(tmp_path / "li_empty")
    zorder_write(li, out, ["l_partkey", "l_suppkey"], num_files=4)
    assert spark.read.parquet(out).count() == 0


def test_zorder_key_rejects_reserved_column(spark):
    df = spark.createDataFrame([(1, 2)], "a long, __z long")
    with pytest.raises(ValueError):
        zorder_key(df, ["a"])


def test_zorder_gate_probe_matches_duckdb_oracle(spark, tmp_path):
    """The committed round-6 gate query + oracle, validated now: the
    box aggregate over the REWRITTEN files must equal DuckDB's over the
    original table, and both guarantee booleans must be TRUE."""
    import duckdb

    from flink_kafka_table_api_spark.sources.layout import zorder_gate_probe

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    box = {"l_partkey": (400.0, 600.0), "l_suppkey": (40.0, 60.0)}
    got = zorder_gate_probe(
        spark, li, str(tmp_path / "li_gate"), ["l_partkey", "l_suppkey"],
        box, num_files=16,
    ).collect()[0]
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT COUNT(*) AS n_box_rows,
               CAST(SUM(l_partkey) AS BIGINT) AS sum_l_partkey,
               CAST(SUM(l_suppkey) AS BIGINT) AS sum_l_suppkey,
               TRUE AS rows_preserved, TRUE AS pruned_to_half_or_less
        FROM '{SF001}/lineitem.parquet'
        WHERE l_partkey BETWEEN 400.0 AND 600.0
          AND l_suppkey BETWEEN 40.0 AND 60.0
        """
    ).fetchone()
    assert tuple(got) == tuple(want)
