from __future__ import annotations

import pytest

from flink_kafka_table_api_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "spark_avro: needs the spark-avro jar (set SPARK_AVRO_JAR)",
    )
    config.addinivalue_line(
        "markers",
        "kafka: needs a live broker+registry (set KAFKA_BOOTSTRAP and "
        "SCHEMA_REGISTRY_URL)",
    )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="fkta-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: needed by the bucketed-table test
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
