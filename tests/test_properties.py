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
