"""Constraint validation (SURVEY.md §7.4 #4).

Flink sinks REJECT rows violating NOT NULL columns declared in the sink DDL
(reference TransactionProcessor.java:135-142 declares every output column
NOT NULL); Spark writes them silently. This operator closes the parity gap
explicitly: route rows through ``require_not_null`` before a sink to get
fail-fast (reference behavior) or quarantine semantics.

Both modes are single narrow passes — no shuffle, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    pass


def violations(df: DataFrame, not_null: Sequence[str]) -> DataFrame:
    """Rows violating the NOT NULL constraints (empty when data is clean)."""
    cond = None
    for c in not_null:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return df.filter(cond) if cond is not None else df.limit(0)


def require_not_null(
    df: DataFrame, not_null: Sequence[str], *, mode: str = "fail"
) -> DataFrame:
    """``mode='fail'``: raise on the first violating row (Flink sink parity).
    ``mode='drop'``: filter violations out (quarantine pattern — pair with
    ``violations()`` to route them to a dead-letter sink)."""
    if mode == "drop":
        out = df
        for c in not_null:
            out = out.filter(F.col(c).isNotNull())
        return out
    if mode == "fail":
        bad = violations(df, not_null).limit(1).collect()
        if bad:
            raise ConstraintViolation(
                f"NOT NULL violation in columns {list(not_null)}: {bad[0]}"
            )
        return df
    raise ValueError(f"unknown mode {mode!r}")
