"""Config/parameter loading (SURVEY.md §2.1 O14).

Reference behavior being reproduced (reference ConfigUtils.java:19-37,
46-60; defaults at reference TransactionProcessor.java:200-211):

- merge CLI args over an optional properties file (CLI wins),
- defaults for broker/registry/topics,
- ``kafka.``-prefixed keys pass through to the Kafka client untouched —
  which is also Spark's native option convention, so the passthrough is a
  straight filter.
"""

from __future__ import annotations

import argparse
import configparser
from dataclasses import dataclass, field

DEFAULTS = {
    # reference TransactionProcessor.java:203-210
    "bootstrap_servers": "localhost:9092",
    "schema_registry_url": "http://localhost:8081",
    "input_topic": "transactions",
    "output_topic": "approved_transactions",
}


@dataclass
class EngineConfig:
    bootstrap_servers: str = DEFAULTS["bootstrap_servers"]
    schema_registry_url: str = DEFAULTS["schema_registry_url"]
    input_topic: str = DEFAULTS["input_topic"]
    output_topic: str = DEFAULTS["output_topic"]
    kafka_options: dict[str, str] = field(default_factory=dict)


def load_config(
    args: list[str] | None = None, properties_file: str | None = None
) -> EngineConfig:
    """Properties file < CLI args (CLI wins — reference ConfigUtils.java:30-36)."""
    merged: dict[str, str] = dict(DEFAULTS)
    kafka_options: dict[str, str] = {}

    if properties_file:
        cp = configparser.ConfigParser()
        with open(properties_file) as f:
            cp.read_string("[DEFAULT]\n" + f.read())
        for k, v in cp.defaults().items():
            if k.startswith("kafka."):
                kafka_options[k[len("kafka."):]] = v
            else:
                merged[k.replace("-", "_").replace(".", "_")] = v

    parser = argparse.ArgumentParser(prog="flink-kafka-table-api-spark")
    parser.add_argument("--bootstrap-servers")
    parser.add_argument("--schema-registry-url")
    parser.add_argument("--input-topic")
    parser.add_argument("--output-topic")
    parser.add_argument(
        "--kafka-option", action="append", default=[],
        help="key=value passed through to the Kafka client (repeatable)",
    )
    ns = parser.parse_args(args or [])
    for key in ("bootstrap_servers", "schema_registry_url", "input_topic", "output_topic"):
        val = getattr(ns, key)
        if val is not None:
            merged[key] = val
    for kv in ns.kafka_option:
        k, _, v = kv.partition("=")
        kafka_options[k.removeprefix("kafka.")] = v

    return EngineConfig(
        bootstrap_servers=merged["bootstrap_servers"],
        schema_registry_url=merged["schema_registry_url"],
        input_topic=merged["input_topic"],
        output_topic=merged["output_topic"],
        kafka_options=kafka_options,
    )
