#!/usr/bin/env python
"""Local simulation of the driver's correctness gate: for each query name,
run the registered Spark query at sf0.01 AND its DuckDB oracle SQL, then
compare row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded, timestamps
truncated to milliseconds — the same normalizations the driver's harness
applies). Catch gate regressions BEFORE the driver does.

Run: python scripts/check_gate.py [--gate N | name ...]
     (default: the first 50 registry entries = this round's gate)
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_kafka_table_api_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    ROWS_ONLY_REASONS,
    queries,
)
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())
            )
            + "}"
        )
    return str(v)


def _hash_rows(cols: list[str], rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--gate":
        names = list(queries())[: int(argv[1])]
    elif argv:
        names = argv
    else:
        names = list(queries())[:50]

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {e}"}
            n_bad += 1
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in ORACLES:
            reason = ROWS_ONLY_REASONS.get(name, "MISSING REASON")
            results[name] = {"rows_only": len(srows), "reason": reason}
            print(f"rows-only {name}: {len(srows)} rows ({reason[:60]})")
            continue
        try:
            cur = con.execute(ORACLES[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            n_bad += 1
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok
            and schema_ok
            and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        )
        results[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": hash_ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "sec": round(time.time() - t0, 2),
        }
        if not (rows_ok and schema_ok and hash_ok):
            n_bad += 1
            print(
                f"FAIL {name}: rows {len(srows)}/{len(orows)} "
                f"schema_ok={schema_ok} hash_ok={hash_ok} "
                f"cols spark={sorted(scols)} oracle={sorted(ocols)}"
            )
        else:
            print(f"ok   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GATECHECK_local.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(names) - n_bad}/{len(names)} ok -> {out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
