"""Avro Object Container File (.avro) source/sink tests: byte-level OCF
round trip (both codecs), distributed read through binaryFile+mapInPandas,
schema evolution via the embedded writer schema, and the write path's
one-file-per-partition layout."""

from __future__ import annotations

import json

import pytest

from flink_kafka_table_api_spark.sources.avro_file import (
    read_avro,
    read_ocf_bytes,
    read_ocf_schema,
    write_avro,
    write_ocf_bytes,
)

SCHEMA = json.dumps({
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
    ],
})
SCHEMA_V2 = json.dumps({
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": "string", "default": "en"},
    ],
})
ROWS = [{"doc_id": i, "text": f"doc number {i}" if i % 3 else None}
        for i in range(250)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_bytes_roundtrip(codec):
    blob = write_ocf_bytes(SCHEMA, ROWS, codec=codec, block_records=64)
    assert read_ocf_schema(blob) == SCHEMA
    writer, records = read_ocf_bytes(blob)
    assert json.loads(writer) == json.loads(SCHEMA)
    assert records == ROWS


def test_ocf_corrupt_sync_fails_loudly():
    blob = bytearray(write_ocf_bytes(SCHEMA, ROWS[:10]))
    blob[-3] ^= 0xFF  # flip a bit inside the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf_bytes(bytes(blob))


def test_spark_write_then_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in ROWS], "doc_id long, text string"
    ).repartition(4)
    out = str(tmp_path / "docs_avro")
    n_files = write_avro(df, out, SCHEMA)
    assert n_files == 4  # one OCF per partition
    back = read_avro(spark, out)  # schema from the embedded header
    got = {(r.doc_id, r.text) for r in back.collect()}
    assert got == {(r["doc_id"], r["text"]) for r in ROWS}


def test_spark_read_resolves_old_files_to_new_schema(spark, tmp_path):
    """A directory with v1-written files read under the v2 reader schema:
    the added `lang` field fills from its default — OCF self-description
    + the spec's resolution rules, distributed."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).coalesce(1)
    out = str(tmp_path / "evolving")
    write_avro(df, out, SCHEMA)
    back = read_avro(spark, out, reader_schema_json=SCHEMA_V2)
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == {(1, "a", "en"), (2, "b", "en")}
