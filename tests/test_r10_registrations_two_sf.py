"""Committed two-SF oracle parity for the round-10 registrations
(the ADVICE r8 item 1 convention, continued): every name that enters
the driver contract this round — the rewritten burst_detection (quantum
1e3 + scalar-walk Viterbi), its two driver-environment bisection
probes, and the four round-9-built streaming capabilities flipping from
BENCH twins to @query — runs at sf0.001 AND sf0.01 through the SAME
registry surface the driver reads (QUERIES/ORACLES), compared with the
driver harness's normalizations (columns sorted by name, rows sorted,
floats %.6g, timestamps to milliseconds).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pytest

from flink_kafka_table_api_spark.queries import ORACLES, QUERIES

R10_REGISTRATIONS = [
    # the 2-round never-green name, rewritten this round (VERDICT r9
    # items 1a/1b: quantum 1e6 -> 1e3, Viterbi -> scalar integer walk)
    "burst_detection",
    # its stage-level bisection probes (VERDICT r9 item 2)
    "burst_costs_probe", "burst_walk_probe",
    # the four round-9 capabilities (first registrations)
    "stream_watermark_alignment", "stream_agg_retract",
    "stream_quantile_monitor", "stream_allowed_lateness",
    # the two suites EXTENDED by round-10 retirements (their composed
    # oracles changed, so prior green evidence covers the old SQL):
    # graph_suite absorbs link_prediction + adamic_adar,
    # text_stats_suite absorbs dup_ngram_coverage + readability +
    # gazetteer_tag
    "graph_suite", "text_stats_suite",
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
@pytest.mark.parametrize("name", R10_REGISTRATIONS)
def test_r10_registration_matches_oracle(spark, name, sf):
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
