"""Committed two-SF oracle parity for the round-9 registrations
(ADVICE r8 item 1): the per-capability test files pin
SF=/root/testdata/sf0.001, and the sf0.01 validations used to live only
in session-run check_gate replicas recorded in comments —
burst_detection proved local-replica green is necessary but not
sufficient, and an UNCOMMITTED sf0.01 run is not evidence at all. This
file makes the claim reproducible: every round-9-registered
(query, oracle) pair runs at sf0.001 AND sf0.01 through the SAME
registry surface the driver reads, compared with the driver harness's
normalizations (columns sorted by name, rows sorted, floats %.6g,
timestamps to milliseconds).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pytest

from flink_kafka_table_api_spark.queries import ORACLES, QUERIES

R9_REGISTRATIONS = [
    "stream_scd2", "stream_cdc_apply", "stream_temporal_join",
    "stream_event_temporal_join", "stream_topn_retract",
    "match_recognize", "stream_match_recognize", "stream_ann_ingest",
    "stream_profile", "data_expectations", "cumulate_windows",
    "stream_cumulate", "stream_over_agg", "stream_over_rows",
    "stream_window_dedup", "stream_session_dynamic",
    "stream_window_join", "stream_source_quota", "pii_scrub",
    # the round-9 stretch capability (VERDICT r8 item 7), registered
    # straight into the round-9 gate after the same two-SF validation
    "stream_idle_watermark",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        from decimal import Decimal

        if isinstance(v, Decimal):
            return f"{float(v):.6g}"
    except Exception:
        pass
    return str(v)


def _normalized(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", R9_REGISTRATIONS)
def test_r9_registration_matches_oracle(spark, name, sf):
    assert name in QUERIES and name in ORACLES, (
        f"{name} lost its registration"
    )
    sdf = QUERIES[name](spark, sf)
    scols = sdf.columns
    srows = sdf.collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}@{sf}: columns {sorted(scols)} != {sorted(dcols)}"
    )
    assert len(srows) == len(drows) > 0, (
        f"{name}@{sf}: {len(srows)} spark rows vs {len(drows)} oracle rows"
    )
    assert _normalized(srows, scols) == _normalized(drows, dcols), (
        f"{name}@{sf}: value mismatch"
    )
