"""Exact column min/max from parquet FOOTER statistics (guide §1.2/§6).

Roughly twenty streaming-query preambles need one or two scalars that are
pure functions of a raw input table — min(ts) to anchor day-tercile chunk
boundaries, min/max(doc_id) to split id terciles — and each paid a full
Spark scan job (plan + schedule + read every row group) per bench run for
a value the parquet footer already stores. DuckDB answers these queries
from the footer natively, and Spark's own aggregate pushdown
(spark.sql.parquet.aggregatePushdown) does the same rewrite when the
DSv2 reader is enabled; this helper is that rewrite done driver-side for
the v1 reader this engine uses.

Exactness contract: parquet min/max statistics are EXACT for physical
INT32/INT64/FLOAT/DOUBLE columns (truncation is only permitted for
BYTE_ARRAY, where writers may store shortened bounds) — so this helper
REFUSES strings/binary and anything else, and returns None whenever any
row group lacks statistics, so callers always fall back to the real
Spark aggregate. Row groups whose column is entirely NULL carry no
min/max and are skipped, matching the aggregate's null-ignoring
semantics; a column with no non-null value anywhere returns None (the
fallback aggregate then returns NULL, exactly as before).

This is a per-invocation read of the input file's metadata — nothing is
memoized across runs; every bench/oracle invocation still computes from
the parquet inputs alone.
"""

from __future__ import annotations

import os

# physical types whose parquet statistics are exact by format rule
_EXACT_PHYSICAL = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}


def _parquet_files(path: str) -> list[str] | None:
    """The data file(s) at `path`: itself when it is a file, else its
    *.parquet members (non-recursive — the testdata tables are single
    files; anything fancier falls back to the Spark aggregate)."""
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        return files or None
    return None


def parquet_column_minmax(path: str, col: str):
    """(min, max) of `col` across every row of the parquet data at
    `path`, read from footer statistics only. Returns None — caller MUST
    fall back to the real aggregate — when the file/column doesn't
    resolve, the physical type's statistics are not exactness-guaranteed
    (strings/binary), any row group lacks min/max, or no row group holds
    a non-null value."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    files = _parquet_files(path)
    if not files:
        return None
    mins: list = []
    maxs: list = []
    try:
        for f in files:
            pf = pq.ParquetFile(f)
            names = pf.schema_arrow.names
            if col not in names:
                return None
            i = names.index(col)
            md = pf.metadata
            for rg in range(md.num_row_groups):
                c = md.row_group(rg).column(i)
                if c.physical_type not in _EXACT_PHYSICAL:
                    return None
                st = c.statistics
                if st is None:
                    return None
                if st.num_values == 0:
                    continue  # all-null row group: no bound to contribute
                if not st.has_min_max:
                    return None
                mins.append(st.min)
                maxs.append(st.max)
    except Exception:
        return None
    if not mins:
        return None
    return min(mins), max(maxs)


__all__ = ["parquet_column_minmax"]
