#!/usr/bin/env python
"""Driver-replica oracle check (the /verify recipe, parameterized).

Runs the public contract exactly as the round driver does: entry smoke,
then every named query (default: ALL declared queries) against its
DuckDB oracle at SF (default sf0.01), comparing schema + canonicalized
row multisets. Usage:

    python scripts/oracle_replica.py [name ...]
    SPARK_GRAFT_REPLICA_SF=/root/testdata/sf0.001 python scripts/oracle_replica.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from flink_kafka_table_api_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_REPLICA_SF", "/root/testdata/sf0.01")


def canon(v):
    if isinstance(v, float):
        return 0.0 if v == 0 else ("NaN" if math.isnan(v) else v)
    return v


def main() -> None:
    spark = get_spark(app_name="fkta-oracle-replica")
    spark.sparkContext.setLogLevel("ERROR")
    assert e.entry(spark).count() > 0
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(os_)
    unknown = [n for n in names if n not in os_]
    assert not unknown, f"no oracle for: {unknown}"
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            srows, scols = sdf.collect(), sdf.columns
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            i_s = sorted(range(len(scols)), key=lambda i: scols[i])
            i_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ms = sorted(tuple(str(canon(r[i])) for i in i_s) for r in srows)
            md = sorted(tuple(str(canon(r[i])) for i in i_d) for r in drows)
            ok = sorted(scols) == sorted(dcols) and ms == md
        except Exception as ex:  # noqa: BLE001 - report, keep going
            print(f"ERROR {name}: {ex!r}", flush=True)
            failed.append(name)
            continue
        print(f"{'ok  ' if ok else 'FAIL'} {name} ({time.time()-t0:.1f}s)",
              flush=True)
        if not ok:
            failed.append(name)
    print(f"# {len(names) - len(failed)}/{len(names)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
