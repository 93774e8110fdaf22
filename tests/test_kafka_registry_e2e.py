"""Broker-less end-to-end test of the Kafka sink's value path: schema
registration against the in-repo SchemaRegistryClient talking to a REAL
(stub) HTTP registry, Confluent wire framing, and the full
encode -> frame -> extract-id -> strip -> decode chain through Spark.

The reference proves this path with Testcontainers brokers
(BaseTransactionTest.java:56-75); no broker exists in this sandbox, so the
test drives everything except the final Kafka socket write — the framing
bytes themselves are asserted against the wire format the reference
produces (TransactionProcessor.java:112-115: magic 0x0 + int32 schema id +
Avro body)."""

from __future__ import annotations

import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from flink_kafka_table_api_spark.sources.kafka import (
    SchemaRegistryClient,
    decode_avro_column,
    extract_schema_id,
    registered_payload,
)

SCHEMA = json.dumps({
    "type": "record",
    "name": "Transaction",
    "fields": [
        {"name": "transactionId", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "status", "type": "string"},
    ],
})


class _StubRegistry(BaseHTTPRequestHandler):
    """Minimal Confluent Schema Registry: POST /subjects/<s>/versions
    registers (dedup by schema text), GET .../versions/latest fetches."""

    store: dict[str, tuple[int, str]] = {}
    next_id = [1]
    requests: list[tuple[str, str]] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        subject = self.path.split("/")[2]
        type(self).requests.append(("POST", self.path))
        if subject in self.store and self.store[subject][1] == body["schema"]:
            sid = self.store[subject][0]
        else:
            sid = self.next_id[0]
            self.next_id[0] += 1
            self.store[subject] = (sid, body["schema"])
        payload = json.dumps({"id": sid}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802
        subject = self.path.split("/")[2]
        type(self).requests.append(("GET", self.path))
        sid, schema = self.store[subject]
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps({
            "id": sid, "version": 1, "subject": subject, "schema": schema,
        }).encode())

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def registry_url():
    _StubRegistry.store = {}
    _StubRegistry.next_id = [1]
    _StubRegistry.requests = []
    server = HTTPServer(("127.0.0.1", 0), _StubRegistry)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    t.join(timeout=5)


def test_registered_payload_end_to_end(spark, registry_url):
    rows = [("t1", 10.5, "APPROVED"), ("t2", 99.0, "PENDING")]
    df = spark.createDataFrame(
        rows, "transactionId string, amount double, status string"
    )
    framed = registered_payload(
        df, SCHEMA, topic="transactions", schema_registry_url=registry_url
    )
    values = [bytes(r.value) for r in framed.collect()]

    # the registry really got the registration, under the reference's
    # '<topic>-value' subject naming
    assert ("POST", "/subjects/transactions-value/versions") in _StubRegistry.requests
    sid, stored_schema = _StubRegistry.store["transactions-value"]
    assert json.loads(stored_schema) == json.loads(SCHEMA)

    # exact Confluent framing: magic 0x0 + big-endian int32 id
    for v in values:
        assert v[0] == 0
        assert struct.unpack(">I", v[1:5])[0] == sid

    # read-back chain through Spark: id extraction + strip + Avro decode
    raw = spark.createDataFrame([(v,) for v in values], "value binary")
    ids = {r.sid for r in raw.select(extract_schema_id(None).alias("sid")).collect()}
    assert ids == {sid}
    decoded = decode_avro_column(raw, SCHEMA, confluent_framed=True)
    got = {(r.transactionId, r.amount, r.status) for r in decoded.collect()}
    assert got == set(rows)


def test_register_is_idempotent_and_fetchable(registry_url):
    client = SchemaRegistryClient(registry_url)
    id1 = client.register("orders-value", SCHEMA)
    id2 = client.register("orders-value", SCHEMA)
    assert id1 == id2  # same schema text -> same id, no re-registration
    got_id, got_schema = client.get_latest("orders-value")
    assert got_id == id1
    assert json.loads(got_schema) == json.loads(SCHEMA)
