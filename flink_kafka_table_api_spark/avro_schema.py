"""Avro schema (.avsc JSON) -> Spark StructType converter.

The reference keeps THREE hand-synchronized copies of each table schema:
the Avro .avsc file, a Flink Schema.newBuilder() DDL
(reference TransactionProcessor.java:92-107, 133-143), and generated Java
model classes (reference model/Transaction.java). Per SURVEY.md §1.3 we keep
ONE source of truth — the Avro JSON — and derive the Spark StructType
programmatically, so source DDL, sink DDL and codecs can never drift.

Supported: all Avro primitives, nullable unions (["null", T] in either
order), records, arrays, maps, enums (-> string, mirroring how the reference
models TransactionStatus as a plain string — reference Transaction.avsc:39-42),
fixed/bytes (-> binary), and the logical types the reference uses
(timestamp-millis — reference Transaction.avsc:20-23) plus the common ones
(timestamp-micros, date, decimal, uuid).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}


def _logical(avro_type: dict[str, Any]) -> DataType | None:
    lt = avro_type.get("logicalType")
    if lt is None:
        return None
    if lt in ("timestamp-millis", "timestamp-micros", "local-timestamp-millis",
              "local-timestamp-micros"):
        # Flink TIMESTAMP(3) == avro timestamp-millis; Spark TimestampType is
        # micros — a strict superset of the reference's precision (SURVEY §1.2).
        return TimestampType()
    if lt == "date":
        return DateType()
    if lt == "decimal":
        return DecimalType(avro_type.get("precision", 10), avro_type.get("scale", 0))
    if lt == "uuid":
        return StringType()
    return None


def _convert(avro_type: Any) -> tuple[DataType, bool]:
    """Return (spark_type, nullable) for one Avro type node."""
    if isinstance(avro_type, str):
        if avro_type == "null":
            return StringType(), True  # bare null only appears inside unions
        if avro_type in _PRIMITIVES:
            return _PRIMITIVES[avro_type], False
        raise ValueError(f"unsupported avro type: {avro_type!r}")

    if isinstance(avro_type, list):  # union
        branches = [b for b in avro_type if b != "null"]
        nullable = len(branches) != len(avro_type)
        if len(branches) != 1:
            raise ValueError(f"only unions of null + one type supported: {avro_type!r}")
        dt, _ = _convert(branches[0])
        return dt, nullable

    if isinstance(avro_type, dict):
        logical = _logical(avro_type)
        if logical is not None:
            return logical, False
        t = avro_type["type"]
        if t == "record":
            return _record_to_struct(avro_type), False
        if t == "array":
            item_dt, item_null = _convert(avro_type["items"])
            return ArrayType(item_dt, containsNull=item_null), False
        if t == "map":
            # avro map keys are always strings; reference Transaction.avsc:48-51
            val_dt, val_null = _convert(avro_type["values"])
            return MapType(StringType(), val_dt, valueContainsNull=val_null), False
        if t == "enum":
            return StringType(), False
        if t == "fixed":
            return BinaryType(), False
        if isinstance(t, (str, list, dict)):  # wrapped primitive/union
            return _convert(t)
    raise ValueError(f"unsupported avro type: {avro_type!r}")


def _record_to_struct(record: dict[str, Any]) -> StructType:
    fields = []
    for f in record["fields"]:
        dt, nullable = _convert(f["type"])
        fields.append(StructField(f["name"], dt, nullable))
    return StructType(fields)


def avro_to_struct(schema: str | dict[str, Any]) -> StructType:
    """Convert an Avro record schema (JSON string or parsed dict) to StructType."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return _record_to_struct(schema)


def struct_to_avro(struct: StructType, name: str = "Record",
                   namespace: str = "engine") -> str:
    """Inverse mapping, used when writing Avro (sink DDL parity, SURVEY O9)."""
    def field_type(dt: DataType, nullable: bool) -> Any:
        base: Any
        if isinstance(dt, BooleanType):
            base = "boolean"
        elif isinstance(dt, IntegerType):
            base = "int"
        elif isinstance(dt, LongType):
            base = "long"
        elif isinstance(dt, FloatType):
            base = "float"
        elif isinstance(dt, DoubleType):
            base = "double"
        elif isinstance(dt, StringType):
            base = "string"
        elif isinstance(dt, BinaryType):
            base = "bytes"
        elif isinstance(dt, TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, DateType):
            base = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, DecimalType):
            base = {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        elif isinstance(dt, ArrayType):
            base = {"type": "array",
                    "items": field_type(dt.elementType, dt.containsNull)}
        elif isinstance(dt, MapType):
            base = {"type": "map",
                    "values": field_type(dt.valueType, dt.valueContainsNull)}
        elif isinstance(dt, StructType):
            base = json.loads(struct_to_avro(dt, name=f"{name}_nested"))
        else:
            raise ValueError(f"unsupported spark type: {dt}")
        return ["null", base] if nullable else base

    return json.dumps({
        "type": "record",
        "name": name,
        "namespace": namespace,
        "fields": [
            {"name": f.name, "type": field_type(f.dataType, f.nullable),
             **({"default": None} if f.nullable else {})}
            for f in struct.fields
        ],
    })
