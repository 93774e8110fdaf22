"""Tracked persist: bounded cache lifetime in long-lived sessions.

Operators that persist() intermediates (the LSH pipeline, the curation
plan) return LAZY DataFrames — the consuming action happens in the caller,
so the operator itself has no correct place to unpersist. Bare persist()
calls therefore accumulate cached RDDs for the session's lifetime (a soft
leak: MEMORY_AND_DISK evicts under pressure, but storage-memory churn is
real at scale).

``tracked_persist`` registers every such cache; ``release_cached`` frees
them all. Call sites with a natural query boundary (bench.py per query,
the driver between correctness checks, a notebook between jobs) call
``release_cached()`` after the consuming action."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later release_cached()."""
    df.persist()
    _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for release_cached()."""
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked cache; returns how many were released."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
        n += 1
    return n
