"""Rotation-discipline guard (VERDICT r3 item 5): the driver's correctness
gate only checks the first 50 entries of queries() per round, so a
hand-ordered rotation can silently starve queries of driver-grade evidence
— r3's audit found 25 registered names that had NEVER been gated. This test
makes that state unrepresentable going forward:

  every registered query must appear in the union of
    (a) the two most recent CORRECTNESS_r*.json driver artifacts, and
    (b) the first 50 entries of the CURRENT rotation (= next round's gate),

and every query without an oracle must carry an explicit rows-only reason.
Adding a new query therefore forces it into the upcoming gate (or the test
fails), and renaming a query breaks the link to its old evidence loudly
instead of silently.
"""

from __future__ import annotations

import glob
import json
import os

from flink_kafka_table_api_spark.queries import (
    ORACLES,
    QUERIES,
    ROWS_ONLY_REASONS,
    queries,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_WIDTH = 50


def _recent_driver_entries() -> set[str]:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))[-2:]
    names: set[str] = set()
    for f in files:
        names |= set(json.load(open(f)))
    return names


def test_every_query_has_recent_or_scheduled_driver_evidence():
    recent = _recent_driver_entries()
    scheduled = set(list(queries())[:GATE_WIDTH])
    uncovered = sorted(set(QUERIES) - recent - scheduled)
    assert not uncovered, (
        f"{len(uncovered)} queries have no driver CORRECTNESS entry in the "
        f"last two rounds and are not in the upcoming 50-slot gate: "
        f"{uncovered}. Rotate _PRIORITY (queries.py) so they are checked."
    )


def test_every_query_is_oracle_bearing_or_explained():
    for name in QUERIES:
        assert name in ORACLES or name in ROWS_ONLY_REASONS, (
            f"{name} has neither an oracle nor a rows_only_reason"
        )
    # and never both — a rows-only reason on an oracle-bearing query is
    # stale documentation
    both = set(ORACLES) & set(ROWS_ONLY_REASONS)
    assert not both, f"queries with BOTH oracle and rows-only tag: {both}"


def test_gate_is_exactly_50_distinct_registered_names():
    gate = list(queries())[:GATE_WIDTH]
    assert len(set(gate)) == GATE_WIDTH
    for name in gate:
        assert name in QUERIES


def test_bench_contract_names_resolve():
    """bench.py's headline set must stay runnable: every name resolves in
    the combined registry, and the calibration reference is a sane
    positive constant (the driver parses the JSON payload per round)."""
    import bench

    for name in bench.HEADLINE:
        assert name in bench.RUNNABLE, f"bench headline {name} unregistered"
    assert 0.01 < bench.CALIBRATION_REF_SEC < 10
