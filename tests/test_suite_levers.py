"""Pre-built slot-funding consolidation suites (the rounds-11..18
registration ledger in queries.py's cap note): every suite is a
NULL-padded typed-block union of registered component queries, and
must be value-identical to its composed oracle — the same compare the
driver runs (column-name sort + float canonicalization + string
values). A suite failing here means the padding/alignment broke, since
the components themselves are driver-green."""

from __future__ import annotations

import math

import duckdb
import pytest

from flink_kafka_table_api_spark.queries import (
    _SUITE_SPECS,
    _suite_df,
    _suite_sql,
)

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, float):
        return 0.0 if v == 0 else ("NaN" if math.isnan(v) else v)
    return v


@pytest.mark.parametrize("suite", sorted(_SUITE_SPECS))
def test_suite_matches_composed_oracle(spark, con, suite):
    sdf = _suite_df(spark, SF, suite)
    srows, scols = sdf.collect(), sdf.columns
    res = con.execute(_suite_sql(suite))
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    i_s = sorted(range(len(scols)), key=lambda i: scols[i])
    i_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = sorted(tuple(str(_canon(r[i])) for i in i_s) for r in srows)
    md = sorted(tuple(str(_canon(r[i])) for i in i_d) for r in drows)
    assert len(ms) == len(md) > 0
    assert ms == md
    # every component contributed a block
    blocks = {r["block"] for r in srows}
    assert blocks == {name for name, _ in _SUITE_SPECS[suite]}
