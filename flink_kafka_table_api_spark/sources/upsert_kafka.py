"""upsert-kafka framing: a RowKind changelog as a compacted Kafka
topic (built round 8; sandbox-local like every Kafka surface here — no
broker socket, the framing and materialization are the testable parts,
exactly the registered_payload precedent in sources/kafka.py).

Flink's upsert-kafka connector (public connector docs) is how an
UPDATE-mode table (e.g. the Rank changelog streaming/retract.py emits)
lands in Kafka: messages are keyed by the PRIMARY KEY, +I/+U rows write
the encoded row as the message value, DELETE writes a NULL value (the
log-compaction tombstone), and -U (retract-before-update) rows are NOT
written at all — the upsert contract makes them redundant, because a
reader materializes the table as "latest message per key, tombstones
remove". This module implements both directions:

  upsert_kafka_payload      changelog -> (key bytes, value bytes|NULL,
                            offset) — Avro-encoded, Confluent-framed
                            when a schema id is given, ready for the
                            kafka writer's key/value columns;
  materialize_upsert_topic  frames -> the current table: latest offset
                            per key bytes (one max_by hash aggregate —
                            the same fold Kafka log compaction itself
                            performs), tombstones dropped, values
                            decoded through the shared 3-path ladder
                            (spark-avro > in-repo Java UDF > pure-
                            Python Arrow codec).

Round-trip contract, pinned by tests/test_upsert_kafka.py: framing the
Top-N retract log and materializing the topic equals applying the
changelog directly (streaming/retract.py:apply_changelog) — i.e. a
Kafka reader of the compacted topic sees exactly the maintained Top-N.

At 100 TB: encoding is one projection (codegen'd via spark-avro when
present, Arrow-batched otherwise); materialization is one keyed hash
aggregate over the topic — the read cost any compacted-topic consumer
pays. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.sources.kafka import (
    _jvm_avro_usable,
    _require_avro_functions,
    decode_avro_column,
    frame_header,
)


def upsert_kafka_payload(
    log: DataFrame,
    *,
    key_cols: list[str],
    key_schema_json: str,
    value_schema_json: str,
    offset_col: str,
    op_col: str = "op",
    schema_id: int | None = None,
    key_schema_id: int | None = None,
) -> DataFrame:
    """Frame a RowKind changelog for an upsert-kafka topic: drop -U
    rows, encode `key_cols` as the message key, encode the value-schema
    fields as the message value — NULL for -D tombstones — and carry
    `offset_col` through (the per-key total order; a real broker
    assigns it, the bounded twin derives it from batch_id). Returns
    (key binary, value binary, offset long)."""
    import json as _json

    value_fields = [
        f["name"] for f in _json.loads(value_schema_json)["fields"]
    ]
    keep = log.filter(F.col(op_col) != "-U")
    tomb = F.col(op_col) == "-D"
    if _jvm_avro_usable(log, F.lit(b""), value_schema_json):
        _, to_avro = _require_avro_functions()
        key = to_avro(F.struct(*key_cols), key_schema_json)
        if key_schema_id is not None:
            key = F.concat(F.lit(frame_header(key_schema_id)), key)
        val = to_avro(F.struct(*value_fields), value_schema_json)
        if schema_id is not None:
            val = F.concat(F.lit(frame_header(schema_id)), val)
        return keep.select(
            key.alias("key"),
            F.when(tomb, F.lit(None).cast("binary")).otherwise(val)
            .alias("value"),
            F.col(offset_col).cast("long").alias("offset"),
        )

    key_header = (
        frame_header(key_schema_id) if key_schema_id is not None else b""
    )
    val_header = frame_header(schema_id) if schema_id is not None else b""
    cols = keep.columns

    def encode_batches(batches):
        import pandas as pd  # noqa: PLC0415

        from flink_kafka_table_api_spark.sources.avro_codec import (  # noqa: PLC0415
            encode_record,
        )

        for pdf in batches:
            keys, vals, offs = [], [], []
            for row in pdf.itertuples(index=False):
                rec = {}
                for name, v in zip(cols, row):
                    if isinstance(v, pd.Timestamp):
                        v = v.to_pydatetime()
                    rec[name] = v
                keys.append(
                    key_header + encode_record(
                        key_schema_json, {c: rec[c] for c in key_cols}
                    )
                )
                if rec[op_col] == "-D":
                    vals.append(None)
                else:
                    vals.append(
                        val_header + encode_record(
                            value_schema_json,
                            {c: rec[c] for c in value_fields},
                        )
                    )
                offs.append(rec[offset_col])
            yield pd.DataFrame(
                {"key": keys, "value": vals, "offset": offs}
            )

    return keep.mapInPandas(
        encode_batches, schema="key binary, value binary, offset long"
    )


def materialize_upsert_topic(
    frames: DataFrame,
    value_schema_json: str,
    *,
    confluent_framed: bool = False,
) -> DataFrame:
    """Read a (bounded) upsert-kafka topic back into the table it
    encodes: latest message per key bytes (ONE max_by hash aggregate —
    the fold Kafka log compaction performs), tombstones removed, values
    decoded. The result has the value schema's columns."""
    latest = (
        frames.groupBy("key")
        .agg(F.max_by(F.struct("value"), F.col("offset")).alias("w"))
        .select(F.col("w.value").alias("value"))
        .filter(F.col("value").isNotNull())
    )
    return decode_avro_column(
        latest, value_schema_json, confluent_framed=confluent_framed
    )


__all__ = ["upsert_kafka_payload", "materialize_upsert_topic"]
