"""Minimal pure-Python Avro binary codec (encode + decode).

Why this exists: the reference's wire format is Confluent-framed Avro
(SURVEY.md §2.1 O2). Spark's native path is `from_avro`/`to_avro`, which
needs the external spark-avro package; this container has neither that jar
nor any Python Avro library. Rather than leave O2 gated on infrastructure,
this module implements the Avro binary encoding for the subset of the spec
the engine's schemas use — primitives, nullable unions, maps, arrays,
records, and timestamp logical types — per the public Avro 1.11 spec:

- int/long: zigzag -> unsigned LEB128 varint
- float/double: 4/8 bytes little-endian IEEE
- string/bytes: long(length) + payload
- union: long(branch index) + value
- array/map: blocks of long(count) + items, 0-count terminator
  (negative count = block-size follows; we emit the simple positive form
  and accept both on read)
- record: fields in declared order
- timestamp-millis/micros: long

The Spark integration (`sources/kafka.py`) prefers the JVM `from_avro` when
the jar is present and falls back to this codec via an Arrow-batched
mapInPandas — slower per byte, but correct and dependency-free. At 100 TB
you install spark-avro; the fallback keeps tests and small jobs honest.
"""

from __future__ import annotations

import datetime as dt
import io
import json
import struct
from typing import Any


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc)
        shift += 7


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------

_EPOCH = dt.datetime(1970, 1, 1)


def _ts_to_units(v: Any, per_second: int) -> int:
    if isinstance(v, dt.datetime):
        # exact integer arithmetic: float total_seconds() loses microsecond
        # precision past ~2100 (2^52 mantissa vs 4e15 micros)
        delta = v.replace(tzinfo=None) - _EPOCH
        total_micros = (
            (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        )
        if per_second == 1_000_000:
            return total_micros
        return total_micros // (1_000_000 // per_second)
    return int(v)


def _encode(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(buf, i)
                _encode(buf, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")

    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        t = schema["type"]
        if lt in ("timestamp-millis", "local-timestamp-millis"):
            _write_long(buf, _ts_to_units(value, 1000))
            return
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            _write_long(buf, _ts_to_units(value, 1_000_000))
            return
        if t == "record":
            for f in schema["fields"]:
                _encode(buf, f["type"], value[f["name"]])
            return
        if t == "map":
            if value:
                _write_long(buf, len(value))
                for k, v in value.items():
                    _encode(buf, "string", k)
                    _encode(buf, schema["values"], v)
            _write_long(buf, 0)
            return
        if t == "array":
            if value:
                _write_long(buf, len(value))
                for item in value:
                    _encode(buf, schema["items"], item)
            _write_long(buf, 0)
            return
        if t == "enum":
            _write_long(buf, schema["symbols"].index(value))
            return
        if t == "fixed":
            buf.write(bytes(value))
            return
        _encode(buf, t, value)  # wrapped primitive
        return

    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(buf, int(value))
        return
    if schema == "float":
        buf.write(struct.pack("<f", float(value)))
        return
    if schema == "double":
        buf.write(struct.pack("<d", float(value)))
        return
    if schema == "string":
        raw = value.encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
        return
    if schema == "bytes":
        raw = bytes(value)
        _write_long(buf, len(raw))
        buf.write(raw)
        return
    raise ValueError(f"unsupported schema {schema!r}")


def _matches(schema: Any, value: Any) -> bool:
    if schema == "null":
        return value is None
    if value is None:
        return False
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "map":
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, (list, tuple))
        return True
    if schema == "string":
        return isinstance(value, str)
    if schema in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if schema in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if schema == "boolean":
        return isinstance(value, bool)
    if schema == "bytes":
        return isinstance(value, (bytes, bytearray))
    return True


def _decode(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(buf, schema[idx])

    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        t = schema["type"]
        if lt in ("timestamp-millis", "local-timestamp-millis"):
            return _EPOCH + dt.timedelta(milliseconds=_read_long(buf))
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            return _EPOCH + dt.timedelta(microseconds=_read_long(buf))
        if t == "record":
            return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
        if t == "map":
            out: dict[str, Any] = {}
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out
                if count < 0:
                    _read_long(buf)  # block byte-size, unused
                    count = -count
                for _ in range(count):
                    k = _decode(buf, "string")
                    out[k] = _decode(buf, schema["values"])
        if t == "array":
            items: list[Any] = []
            while True:
                count = _read_long(buf)
                if count == 0:
                    return items
                if count < 0:
                    _read_long(buf)
                    count = -count
                for _ in range(count):
                    items.append(_decode(buf, schema["items"]))
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(buf, t)

    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "string":
        n = _read_long(buf)
        return buf.read(n).decode("utf-8")
    if schema == "bytes":
        n = _read_long(buf)
        return buf.read(n)
    raise ValueError(f"unsupported schema {schema!r}")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def encode_record(schema: str | dict[str, Any], record: dict[str, Any]) -> bytes:
    """Encode one record dict to Avro binary (no framing)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    buf = io.BytesIO()
    _encode(buf, schema, record)
    return buf.getvalue()


def decode_record(schema: str | dict[str, Any], payload: bytes) -> dict[str, Any]:
    """Decode one Avro-binary record (no framing) to a dict."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _decode(io.BytesIO(payload), schema)
