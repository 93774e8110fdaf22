"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.2 'Streaming: stateful ops'; the escape hatch BASELINE.json
points at for operators Spark lacks natively).

The example operator — per-key running totals that survive across
micro-batches — is the minimal shape every custom stateful op shares:
read state, fold the batch, write state, emit. Arrow-batched like all
Pandas interop, state store-backed like built-in streaming aggs (RocksDB
provider on a real cluster keeps state off-heap and checkpointed).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, total double"


def _running_totals_fn(key, pdf_iter: Iterator, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cumulative per-key (count, sum) emitted every micro-batch — state
    persists across batches in the state store, exactly the semantics a
    Flink KeyedProcessFunction with ValueState would give."""
    return (
        stream.select(key_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
