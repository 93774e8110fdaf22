"""Confluent wire-format codec tests (SURVEY.md §2.1 O2) — the framing is
pure expression logic, testable without brokers (the from_avro/to_avro body
decode needs the spark-avro jar + a broker and is exercised only in real
deployments, same trade-off the reference makes with Testcontainers)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.kafka import (
    CONFLUENT_HEADER_LEN,
    extract_schema_id,
    frame_header,
    strip_confluent_header,
)


def test_frame_header_layout():
    h = frame_header(42)
    assert len(h) == CONFLUENT_HEADER_LEN
    assert h[0] == 0x00                       # magic byte
    assert struct.unpack(">I", h[1:])[0] == 42  # big-endian schema id


def test_strip_and_extract_roundtrip(spark):
    body = b"avro-payload-bytes"
    framed = frame_header(7) + body
    df = spark.createDataFrame([(bytearray(framed),)], "value binary")
    out = df.select(
        strip_confluent_header(F.col("value")).alias("body"),
        extract_schema_id(F.col("value")).alias("schema_id"),
    ).collect()[0]
    assert bytes(out.body) == body
    assert out.schema_id == 7


def test_extract_large_schema_id(spark):
    framed = frame_header(100_000) + b"x"
    df = spark.createDataFrame([(bytearray(framed),)], "value binary")
    got = df.select(extract_schema_id(F.col("value")).alias("i")).collect()[0].i
    assert got == 100_000


def test_config_defaults_and_precedence(tmp_path):
    from flink_kafka_table_api_spark.config import load_config

    # defaults (reference TransactionProcessor.java:203-210)
    cfg = load_config([])
    assert cfg.bootstrap_servers == "localhost:9092"
    assert cfg.input_topic == "transactions"
    assert cfg.output_topic == "approved_transactions"

    # properties file < CLI (reference ConfigUtils.java:30-36)
    props = tmp_path / "app.properties"
    props.write_text(
        "bootstrap-servers=file:9092\n"
        "input-topic=file_topic\n"
        "kafka.security.protocol=SSL\n"
    )
    cfg = load_config(
        ["--input-topic", "cli_topic", "--kafka-option", "max.poll.records=10"],
        properties_file=str(props),
    )
    assert cfg.bootstrap_servers == "file:9092"   # from file
    assert cfg.input_topic == "cli_topic"         # CLI wins
    # kafka.* passthrough (reference ConfigUtils.java:46-60)
    assert cfg.kafka_options == {
        "security.protocol": "SSL", "max.poll.records": "10",
    }


def test_require_not_null(spark):
    from flink_kafka_table_api_spark.operators.validate import (
        ConstraintViolation,
        require_not_null,
        violations,
    )
    import pytest

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "id long, name string"
    )
    assert violations(df, ["id", "name"]).count() == 2
    assert require_not_null(df, ["id", "name"], mode="drop").count() == 1
    with pytest.raises(ConstraintViolation):
        require_not_null(df, ["id"], mode="fail")
    clean = df.filter("id IS NOT NULL AND name IS NOT NULL")
    assert require_not_null(clean, ["id", "name"], mode="fail").count() == 1
