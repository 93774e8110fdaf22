"""Property tests for the round-19/20 staged operators: each operator
replayed against an independent pure-Python reference on
hypothesis-generated inputs, batched into ONE DataFrame per example
(the established test_r12_r15_properties.py trade-off: few Spark
round-trips, wide input coverage)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_kafka_table_api_spark.operators.curation import mann_whitney_u
from flink_kafka_table_api_spark.operators.relational import rfm_segments
from flink_kafka_table_api_spark.operators.similarity import (
    grid_density_clusters,
)
from flink_kafka_table_api_spark.operators.timeseries import ewma_control

BASE_DAY = dt.date(2024, 3, 1)


# ---------------------------------------------------------------------------
# mann_whitney_u: integer midrank algebra vs a pure-Python replay
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=0, max_value=12)),
        min_size=4, max_size=60,
    ).filter(lambda rows: len({g for g, _ in rows}) >= 2)
)
@settings(max_examples=12, deadline=None)
def test_mwu_matches_python_replay(spark, rows):
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r for r in mann_whitney_u(df).collect()}

    values = sorted(v for _, v in rows)
    n_total = len(values)
    tot = Counter(values)
    # 2x midrank per value
    rank2, cum = {}, 0
    for v in sorted(tot):
        rank2[v] = 2 * cum + tot[v] + 1
        cum += tot[v]
    tie_term = sum(t**3 - t for t in tot.values())
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    for g, vs in groups.items():
        n1 = len(vs)
        n2 = n_total - n1
        r2 = sum(rank2[v] for v in vs)
        u1x2 = r2 - n1 * (n1 + 1)
        assert got[g].rank_sum_x2 == r2
        assert got[g].u1_x2 == u1x2
        assert got[g].n_group == n1 and got[g].n_rest == n2
        sigma2 = (n1 * n2 / 12) * (
            (n_total + 1) - tie_term / (n_total * (n_total - 1))
        )
        if sigma2 > 0:
            z = (u1x2 - n1 * n2) / (2 * math.sqrt(sigma2))
            assert got[g].z == round(z, 9) or abs(got[g].z - z) < 1e-8
    # pairwise identity: sum over groups of U1 equals the total number
    # of cross-group comparisons (each ordered pair counted once, ties
    # contributing 1/2 + 1/2) -> doubled: sum(u1x2) = 2 * C(pairs)
    cross = n_total * (n_total - 1) - sum(
        len(vs) * (len(vs) - 1) for vs in groups.values()
    )
    assert sum(got[g].u1_x2 for g in groups) == cross


# ---------------------------------------------------------------------------
# rfm_segments: quantile tiles vs a numpy-free Python replay
# ---------------------------------------------------------------------------

def _percentile_linear(sorted_vals, q):
    """Spark percentile / DuckDB quantile_cont: linear interpolation at
    index q*(n-1) over the sorted values."""
    n = len(sorted_vals)
    idx = q * (n - 1)
    lo = int(math.floor(idx))
    hi = min(lo + 1, n - 1)
    frac = idx - lo
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=0, max_value=27),
                  st.integers(min_value=1, max_value=40000)),
        min_size=3, max_size=50,
    )
)
@settings(max_examples=12, deadline=None)
def test_rfm_scores_match_python_replay(spark, rows):
    """(cust, day_offset, cents) orders: recency/frequency/monetary and
    the tile assignment replayed exactly (integer-cent amounts keep the
    float sum exact)."""
    data = [
        (c, f"2024-01-{d + 1:02d} 09:00:00", cents / 100.0)
        for c, d, cents in rows
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        data, "o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_custkey",
        F.to_timestamp("o_orderdate").alias("o_orderdate"),
        "o_totalprice",
    )
    got = {r.customer: r for r in rfm_segments(df).collect()}

    per = defaultdict(lambda: [None, 0, 0])  # last_day, freq, cents
    for c, d, cents in rows:
        rec = per[c]
        rec[0] = d if rec[0] is None else max(rec[0], d)
        rec[1] += 1
        rec[2] += cents
    dmax = max(r[0] for r in per.values())
    rfm = {
        c: (dmax - r[0], r[1], r[2]) for c, r in per.items()
    }
    for axis, rev in ((0, True), (1, False), (2, False)):
        vals = sorted(v[axis] for v in rfm.values())
        cuts = [
            round(_percentile_linear(vals, q / 5), 6)
            for q in range(1, 5)
        ]
        for c, v in rfm.items():
            tile = 1 + sum(1 for cut in cuts if v[axis] > cut)
            expect = 6 - tile if rev else tile
            gotscore = (got[c].r_score, got[c].f_score, got[c].m_score)[axis]
            assert gotscore == expect, (axis, c, v, cuts)
    for c, v in rfm.items():
        assert got[c].recency_days == v[0]
        assert got[c].frequency == v[1]
        assert got[c].monetary_cents == v[2]


# ---------------------------------------------------------------------------
# ewma_control: chart fold vs a pure-Python replay
# ---------------------------------------------------------------------------

@given(
    st.dictionaries(
        st.sampled_from(["g1", "g2"]),
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=9),
                      st.integers(min_value=1, max_value=6)),
            min_size=1, max_size=10,
        ),
        min_size=1, max_size=2,
    )
)
@settings(max_examples=10, deadline=None)
def test_ewma_matches_python_replay(spark, per_group):
    rows = []
    eid = 0
    for g, day_counts in per_group.items():
        for d, c in day_counts:
            for _ in range(c):
                rows.append(
                    (eid, (BASE_DAY + dt.timedelta(days=d)).isoformat()
                     + " 08:00:00", g)
                )
                eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type")
    got = {(r.event_type, r.day): r for r in ewma_control(df).collect()}

    # python replay: GLOBAL calendar span, per-group zero fill
    daily = defaultdict(Counter)
    for g, day_counts in per_group.items():
        for d, c in day_counts:
            daily[g][d] += c
    lo = min(d for g in daily for d in daily[g])
    hi = max(d for g in daily for d in daily[g])
    lam, L = 0.2, 3.0
    for g in daily:
        days = list(range(lo, hi + 1))
        xs = [daily[g].get(d, 0) for d in days]
        ph1 = xs[: math.ceil(len(xs) / 2)]
        n = len(ph1)
        mu = sum(ph1) / n
        var = (
            (sum(v * v for v in ph1) - sum(ph1) ** 2 / n) / (n - 1)
            if n > 1 else None
        )
        sigma = math.sqrt(var) if var and var > 0 else None
        z, pw = mu, 1.0
        for d, x in zip(days, xs):
            z = lam * x + (1 - lam) * z
            pw *= (1 - lam) ** 2
            key = (g, BASE_DAY + dt.timedelta(days=d))
            assert got[key].n_events == x
            assert got[key].ewma == round(z, 6) or (
                abs(got[key].ewma - z) < 1e-5
            )
            if sigma is None:
                assert got[key].ucl is None and got[key].violation is None
            else:
                hw = L * sigma * math.sqrt(lam / (2 - lam) * (1 - pw))
                assert abs(got[key].ucl - (mu + hw)) < 1e-5
                assert got[key].violation == (
                    got[key].ewma > got[key].ucl
                    or got[key].ewma < got[key].lcl
                )


# ---------------------------------------------------------------------------
# grid_density_clusters: dense-cell CC vs a union-find replay
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(st.integers(min_value=-5, max_value=5),
                  st.integers(min_value=-5, max_value=5)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=12, deadline=None)
def test_grid_density_matches_union_find_replay(spark, cells_of_points):
    """Points placed at cell centers (no boundary ambiguity): dense
    cells, 8-adjacency components and noise labels replayed with a
    plain union-find."""
    rows = [
        (i, [cx * 0.1 + 0.05, cy * 0.1 + 0.05])
        for i, (cx, cy) in enumerate(cells_of_points)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in grid_density_clusters(
        df, cell=0.1, min_pts=3
    ).collect()}

    OFF, STRIDE = 1 << 20, 1 << 21
    cnt = Counter(cells_of_points)
    dense = {c for c, n in cnt.items() if n >= 3}
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb != (cx, cy) and nb in dense:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    def cid(c):
        return (c[0] + OFF) * STRIDE + c[1] + OFF

    for i, c in enumerate(cells_of_points):
        assert got[i].cell_n == cnt[c]
        assert got[i].is_core == (c in dense)
        if c in dense:
            root = find(c)
            expect = min(cid(m) for m in dense if find(m) == root)
            assert got[i].cluster == expect
        else:
            assert got[i].cluster is None


# ---------------------------------------------------------------------------
# Partitioning invariance + empty-input hardening (the r8/r12-15 bar)
# ---------------------------------------------------------------------------

def test_staged_operators_are_partitioning_invariant(spark):
    """The ordered-fold / integer-algebra recipes must make results
    independent of input partitioning; pin it empirically for every
    fold- or quantile-carrying r19/r20 operator."""
    from flink_kafka_table_api_spark.operators.text import (
        assoc_rules as ar,
        heaps_law as hl,
    )

    SF = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs7 = docs.repartition(7)
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    a = sorted(map(tuple, rfm_segments(orders).collect()))
    b = sorted(map(tuple, rfm_segments(orders.repartition(7)).collect()))
    assert a == b

    a = sorted(map(tuple, mann_whitney_u(docs).collect()))
    b = sorted(map(tuple, mann_whitney_u(docs7).collect()))
    assert a == b

    a = [tuple(r) for r in ar(docs).collect()]
    b = [tuple(r) for r in ar(docs7).collect()]
    assert a == b  # ordered: the top-k cutoff itself must not move

    a = sorted(map(tuple, hl(docs).collect()))
    b = sorted(map(tuple, hl(docs7).collect()))
    assert a == b

    from flink_kafka_table_api_spark.catalog import read_table

    ev = read_table(spark, SF, "events")
    a = sorted(map(tuple, ewma_control(ev).collect()))
    b = sorted(map(tuple, ewma_control(ev.repartition(7)).collect()))
    assert a == b

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(map(tuple, grid_density_clusters(
        emb, cell=0.04, min_pts=4).collect()))
    b = sorted(map(tuple, grid_density_clusters(
        emb.repartition(7), cell=0.04, min_pts=4).collect()))
    assert a == b


def test_staged_operators_tolerate_empty_input(spark):
    """Empty frames must yield empty results, never throw (the
    hardening bar the r12-15 pass set)."""
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.operators.text import (
        assoc_rules as ar,
        heaps_law as hl,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    orders = spark.createDataFrame(
        [], "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    events = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")

    assert rfm_segments(orders).count() == 0
    assert mann_whitney_u(
        docs.select(F.col("text").alias("source"),
                    F.col("doc_id").alias("n_chars"))
    ).count() == 0
    assert ar(docs).count() == 0
    assert hl(docs).count() == 0
    assert ewma_control(events).count() == 0
    assert grid_density_clusters(emb).count() == 0
