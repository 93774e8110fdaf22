"""Property-based tests (hypothesis) for the pure-Python layers: the Avro
binary codec and the zigzag varint encoding. These run without Spark, so
hypothesis can afford hundreds of examples."""

from __future__ import annotations

import datetime as dt
import io
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_kafka_table_api_spark.sources.avro_codec import (
    _read_long,
    _write_long,
    decode_record,
    encode_record,
)

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
@settings(max_examples=300)
def test_varint_roundtrip_any_int64(n):
    buf = io.BytesIO()
    _write_long(buf, n)
    buf.seek(0)
    assert _read_long(buf) == n


RECORD_SCHEMA = json.dumps({
    "type": "record", "name": "P", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "string"}],
         "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
})

record_strategy = st.fixed_dictionaries({
    "s": st.text(max_size=50),
    "n": INT64,
    "d": st.floats(allow_nan=False, allow_infinity=False),
    "opt": st.one_of(st.none(), st.text(max_size=20)),
    "m": st.one_of(
        st.none(),
        st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
    ),
    "arr": st.lists(INT64, max_size=8),
    "ts": st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
})


@given(record_strategy)
@settings(max_examples=200)
def test_avro_record_roundtrip(rec):
    back = decode_record(RECORD_SCHEMA, encode_record(RECORD_SCHEMA, rec))
    assert back == rec


_DUCK = None


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_portable_hash_contract_matches_duckdb(s):
    """The portable-hash contract underlying every oracle-checked dedup
    query: Python's reference rendering and DuckDB's SQL rendering agree on
    arbitrary unicode input. (The Spark rendering is pinned against the
    Python reference in test_operators.py::test_portable_hash_matches_python.)"""
    import hashlib

    import duckdb

    global _DUCK
    if _DUCK is None:
        _DUCK = duckdb.connect()
    expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = _DUCK.execute(
        "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
    ).fetchone()[0]
    assert got == expected
