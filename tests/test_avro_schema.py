"""avsc -> StructType converter tests. The schema JSON here mirrors the
shape of the reference's Transaction.avsc (string/double/timestamp-millis/
nullable-union/map fields — reference src/main/avro/Transaction.avsc) without
copying the file."""

from __future__ import annotations

import json

import pytest

from flink_kafka_table_api_spark.avro_schema import avro_to_struct, struct_to_avro
from flink_kafka_table_api_spark.catalog import TRANSACTION_SCHEMA

TX_AVSC = {
    "type": "record",
    "name": "Transaction",
    "namespace": "t",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "currency", "type": "string"},
        {"name": "timestamp",
         "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "description", "type": ["null", "string"], "default": None},
        {"name": "merchant", "type": "string"},
        {"name": "category", "type": ["null", "string"], "default": None},
        {"name": "status", "type": "string"},
        {"name": "userId", "type": "string"},
        {"name": "metadata",
         "type": ["null", {"type": "map", "values": "string"}],
         "default": None},
    ],
}


def test_transaction_schema_matches_catalog():
    assert avro_to_struct(TX_AVSC) == TRANSACTION_SCHEMA


def test_accepts_json_string():
    assert avro_to_struct(json.dumps(TX_AVSC)) == TRANSACTION_SCHEMA


def test_union_order_irrelevant():
    s = avro_to_struct({
        "type": "record", "name": "R",
        "fields": [{"name": "x", "type": ["string", "null"]}],
    })
    assert s.fields[0].nullable


def test_nested_record_array_enum():
    s = avro_to_struct({
        "type": "record", "name": "R",
        "fields": [
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kind",
             "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
            {"name": "inner", "type": {
                "type": "record", "name": "I",
                "fields": [{"name": "v", "type": "long"}]}},
        ],
    })
    assert s.fields[0].dataType.typeName() == "array"
    assert s.fields[1].dataType.typeName() == "string"
    assert s.fields[2].dataType.typeName() == "struct"


def test_rejects_multi_type_union():
    with pytest.raises(ValueError):
        avro_to_struct({
            "type": "record", "name": "R",
            "fields": [{"name": "x", "type": ["string", "long"]}],
        })


def test_roundtrip_struct_to_avro():
    avsc = struct_to_avro(TRANSACTION_SCHEMA, name="Transaction")
    assert avro_to_struct(avsc) == TRANSACTION_SCHEMA
