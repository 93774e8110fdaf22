"""Footer-statistics min/max (sources/footer_stats.py) vs the real Spark
aggregate — the round-10 optimization that removes the per-bench-run
preamble scan jobs (queries._events_min_date / _documents_id_bounds)
must be EXACTLY the value the scan computed, at every shipped SF, and
must refuse (return None) whenever exactness is not guaranteed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.catalog import read_table
from flink_kafka_table_api_spark.sources.footer_stats import (
    parquet_column_minmax,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SFS)
def test_events_ts_minmax_matches_aggregate(spark, sf):
    mm = parquet_column_minmax(os.path.join(sf, "events.parquet"), "ts")
    assert mm is not None
    got = read_table(spark, sf, "events").agg(
        F.min("ts"), F.max("ts"), F.min(F.to_date("ts"))
    ).first()
    assert mm[0] == got[0] and mm[1] == got[1]
    # the derived chunk anchor: date-of-min == min-of-date (monotone)
    assert mm[0].date() == got[2]


@pytest.mark.parametrize("sf", SFS)
def test_documents_doc_id_minmax_matches_aggregate(spark, sf):
    mm = parquet_column_minmax(
        os.path.join(sf, "documents.parquet"), "doc_id"
    )
    assert mm is not None
    got = read_table(spark, sf, "documents").agg(
        F.min("doc_id"), F.max("doc_id")
    ).first()
    assert (int(mm[0]), int(mm[1])) == (got[0], got[1])


def test_query_helpers_match_scan(spark):
    from flink_kafka_table_api_spark.queries import (
        _documents_id_bounds,
        _events_min_date,
    )

    sf = SFS[0]
    assert _events_min_date(spark, sf) == read_table(
        spark, sf, "events"
    ).agg(F.min(F.to_date("ts"))).first()[0]
    assert _documents_id_bounds(spark, sf) == tuple(
        read_table(spark, sf, "documents")
        .agg(F.min("doc_id"), F.max("doc_id"))
        .first()
    )


def test_string_column_refused():
    # BYTE_ARRAY statistics may be truncated by the writer: never trusted
    sf = SFS[0]
    assert parquet_column_minmax(
        os.path.join(sf, "documents.parquet"), "text"
    ) is None


def test_missing_column_and_path_refused(tmp_path):
    sf = SFS[0]
    assert parquet_column_minmax(
        os.path.join(sf, "documents.parquet"), "no_such_col"
    ) is None
    assert parquet_column_minmax(str(tmp_path / "nope.parquet"), "x") is None


def test_all_null_column_refused(spark, tmp_path):
    p = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(None,), (None,)], "v: long"
    ).coalesce(1).write.parquet(p)
    # a column with no non-null value anywhere has no bound: fallback
    assert parquet_column_minmax(p, "v") is None


def test_directory_of_parts(spark, tmp_path):
    p = str(tmp_path / "parts")
    spark.range(0, 1000).select(
        (F.col("id") * 3 + 7).alias("k")
    ).repartition(4).write.parquet(p)
    mm = parquet_column_minmax(p, "k")
    assert mm == (7, 999 * 3 + 7)
