"""Custom Python DataSource (Spark 4 API): a deterministic `transactions`
generator — the engine's own CONNECTOR, playing the role the reference's
Kafka TableDescriptor plays (`TableDescriptor.forConnector("kafka")`,
reference TransactionProcessor.java:89-116) without external infrastructure.

Registers as format ``fkta_transactions`` with the reference's declared
transaction schema (FIXTURES.md §1). Batch mode generates ``rows`` rows
split over ``partitions`` input partitions (executor-parallel, driver never
materializes data); streaming mode emits ``rows_per_batch`` per micro-batch
with monotonically increasing offsets — enough to drive every streaming
operator in tests and demos with zero brokers.

Determinism: row *i* is a pure function of (i, seed) — the same contract
the driver's seed=42 parquet testdata follows — so any query over this
source is reproducible and oracle-checkable after a bounded read.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA_DDL = (
    "id string, amount double, currency string, `timestamp` timestamp, "
    "description string, merchant string, category string, status string, "
    "userId string, metadata map<string,string>"
)

_CURRENCIES = ("USD", "EUR", "GBP")
_STATUSES = ("PENDING", "APPROVED", "CANCELLED", "REJECTED")
_BASE_TS = 1_700_000_000  # 2023-11-14T22:13:20Z; rows step 1s each


def _row(i: int, seed: int):
    import datetime as dt
    import hashlib

    h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
    return (
        f"tx-{seed}-{i:08d}",
        round(10.0 + (h % 99_000) / 100.0, 2),
        _CURRENCIES[h % 3],
        dt.datetime.fromtimestamp(_BASE_TS + i, dt.timezone.utc).replace(
            tzinfo=None
        ),
        None if h % 5 == 0 else f"purchase {i}",
        f"merchant-{h % 50}",
        None if h % 7 == 0 else f"cat-{h % 10}",
        _STATUSES[h % 4],
        f"user-{h % 1000}",
        {"channel": "web" if h % 2 == 0 else "pos"},
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, -(-self.rows // self.num_parts))
        return [
            _Range(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.per_batch = int(options.get("rows_per_batch", 10))
        self.seed = int(options.get("seed", 42))
        self._offset = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._offset += self.per_batch
        return {"index": self._offset}

    def partitions(self, start, end):
        return [_Range(start["index"], end["index"], self.seed)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)

    def commit(self, end):
        pass


class TransactionsDataSource(DataSource):
    """format("fkta_transactions") — deterministic transactions connector."""

    @classmethod
    def name(cls) -> str:
        return "fkta_transactions"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector in this session."""
    spark.dataSource.register(TransactionsDataSource)
