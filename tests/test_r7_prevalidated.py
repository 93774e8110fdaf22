"""Round-7 pre-validated operators (the temperature_mix/pagerank pattern:
operator + oracle SQL + local parity BEFORE the registry has a free gate
slot): weighted_sample (PPS Bernoulli) and frequent_pairs (A-priori
2-itemsets). Each is pinned against an independent Python replay AND its
DuckDB oracle over the real sf0.001 documents table."""

from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations

import duckdb
import pytest

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def _py_weighted_sample(rows, target_n, salt="fkta-wsample"):
    w_total = sum(w for _, w in rows)
    out = {}
    for i, w in rows:
        h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)
        u = (h % (1 << 30)) / float(1 << 30)
        p = min(1.0, (w * float(target_n)) / w_total)
        if u < p:
            out[i] = (w, round(p, 6))
    return out


def test_weighted_sample_matches_python_replay(spark):
    rows = [(i, (i * 7) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.n_tok, r.p)
        for r in cu.weighted_sample(
            df, weight_col="n_tok", target_n=80
        ).collect()
    }
    assert got == _py_weighted_sample(rows, 80)
    # realized size tracks the target (Poisson-PPS expectation)
    assert 50 <= len(got) <= 110


def test_weighted_sample_favors_heavy_rows(spark):
    rows = [(i, 1) for i in range(300)] + [(i, 100) for i in range(300, 320)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    kept = {
        r.doc_id for r in cu.weighted_sample(
            df, weight_col="n_tok", target_n=40
        ).collect()
    }
    heavy = sum(1 for i in kept if i >= 300)
    light = len(kept) - heavy
    assert heavy >= 15        # w=100 rows: p = min(1, 100*40/2300) = 1
    assert light < heavy      # 300 light rows contribute fewer picks


def test_weighted_sample_oracle_parity_on_testdata(spark, docs_con):
    got = {
        (r.doc_id, r.n_chars, r.p)
        for r in cu.weighted_sample(
            spark.read.parquet(f"{SF}/documents.parquet"),
            weight_col="n_chars", target_n=100,
        ).collect()
    }
    want = set(
        docs_con.execute(
            cu.weighted_sample_sql(weight_expr="n_chars", target_n=100)
        ).fetchall()
    )
    assert got == want and len(got) > 20


def _py_frequent_pairs(docs, min_support):
    df_counter: Counter = Counter()
    doc_sets = []
    for text in docs:
        s = set(text.lower().split())
        doc_sets.append(s)
        df_counter.update(s)
    frequent = {w for w, c in df_counter.items() if c >= min_support}
    pairs: Counter = Counter()
    for s in doc_sets:
        fs = sorted(s & frequent)
        pairs.update(combinations(fs, 2))
    return {
        (a, b): c for (a, b), c in pairs.items() if c >= min_support
    }


def test_frequent_pairs_matches_python_replay(spark):
    docs = [
        "spark shuffle join spark",
        "spark shuffle exchange",
        "spark shuffle",
        "join exchange broadcast",
        "spark broadcast",
        "completely unrelated words here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.token_a, r.token_b): r.n_docs
        for r in tx.frequent_pairs(df, min_support=2).collect()
    }
    assert got == _py_frequent_pairs(docs, 2)
    assert got[("shuffle", "spark")] == 3


def test_frequent_pairs_oracle_parity_on_testdata(spark, docs_con):
    got = {
        (r.token_a, r.token_b, r.n_docs)
        for r in tx.frequent_pairs(
            spark.read.parquet(f"{SF}/documents.parquet"), min_support=25
        ).collect()
    }
    want = set(
        docs_con.execute(tx.frequent_pairs_sql(min_support=25)).fetchall()
    )
    assert got == want and len(got) > 5


# ---------------------------------------------------------------------------
# Product quantization (operators/similarity.py pq_*): the third
# pre-validated round-7 candidate. Pinned against an independent numpy
# replay of train/encode/ADC, plus the defining ADC property (LUT-sum ==
# distance-to-reconstruction) and the exact-reconstruction-query top-1.
# ---------------------------------------------------------------------------


def _np_pq(vectors_by_id, m, k, n_iter):
    """Independent PQ replay: same deterministic hash-min seeding, same
    L2 Lloyd with empty-cell carry-over, same lower-code tie-break."""
    import numpy as np

    ids = sorted(vectors_by_id)
    d = len(next(iter(vectors_by_id.values())))
    sub = d // m
    seeds = sorted(
        ids,
        key=lambda i: (
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i
        ),
    )[:k]
    cbs = [
        [list(vectors_by_id[s][j * sub:(j + 1) * sub]) for s in seeds]
        for j in range(m)
    ]

    def codes_of(v):
        out = []
        for j in range(m):
            sl = np.array(v[j * sub:(j + 1) * sub])
            dists = [
                float(((sl - np.array(c)) ** 2).sum()) for c in cbs[j]
            ]
            out.append(min(range(k), key=lambda c: (dists[c], c)))
        return out

    for _ in range(n_iter):
        sums = {}
        counts = {}
        for i in ids:
            v = vectors_by_id[i]
            for j, c in enumerate(codes_of(v)):
                key = (j, c)
                sl = np.array(v[j * sub:(j + 1) * sub])
                sums[key] = sums.get(key, 0) + sl
                counts[key] = counts.get(key, 0) + 1
        for (j, c), s in sums.items():
            cbs[j][c] = list(s / counts[(j, c)])
    return cbs, codes_of


def test_pq_train_and_encode_match_numpy_replay(spark):
    import random

    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(16)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    import flink_kafka_table_api_spark.operators.similarity as sim

    cbs = sim.pq_train(df, m=4, k=8, n_iter=2)
    ref_cbs, ref_codes = _np_pq(vecs, 4, 8, 2)
    for j in range(4):
        for c in range(8):
            for a, b in zip(cbs[j][c], ref_cbs[j][c]):
                assert abs(a - b) < 1e-9
    got = {
        r.vec_id: list(r.codes)
        for r in sim.pq_encode(df, cbs).collect()
    }
    assert got == {i: ref_codes(v) for i, v in vecs.items()}


def test_pq_adc_equals_distance_to_reconstruction(spark):
    """The DEFINING ADC property: the LUT-sum distance must equal the
    plain L2 distance from the query to the reconstructed vector (up to
    per-subspace summation-order float dust)."""
    import random

    import pyspark.sql.functions as F

    import flink_kafka_table_api_spark.operators.similarity as sim

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(16)] for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    cbs = sim.pq_train(df, m=4, k=8, n_iter=1)
    enc = sim.pq_encode(df, cbs)
    q = vecs[0]
    both = enc.select(
        "vec_id",
        sim.pq_adc_distance(F.col("codes"), cbs, q).alias("adc"),
        sim._l2sq_lit(
            sim.pq_reconstruct(F.col("codes"), cbs), q
        ).alias("direct"),
    ).collect()
    assert len(both) == 50
    for r in both:
        assert abs(r.adc - r.direct) < 1e-9, (r.vec_id, r.adc, r.direct)


def test_pq_search_reconstruction_query_is_top1(spark):
    """Querying with vector 0's OWN reconstruction makes its ADC distance
    exactly 0 — it must rank first (ties broken by id; 0 is minimal)."""
    import random

    import flink_kafka_table_api_spark.operators.similarity as sim

    rng = random.Random(13)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(16)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    cbs = sim.pq_train(df, m=4, k=8, n_iter=2)
    enc = sim.pq_encode(df, cbs)
    codes0 = enc.filter("vec_id = 0").first().codes
    sub = len(cbs[0][0])
    recon0 = []
    for j, c in enumerate(codes0):
        recon0.extend(cbs[j][c])
    top = sim.pq_search(enc, cbs, recon0, 5).collect()
    assert top[0].vec_id == 0 and top[0].adc_dist == 0.0
    assert all(
        top[i].adc_dist <= top[i + 1].adc_dist for i in range(len(top) - 1)
    )


def test_pq_rejects_indivisible_dims(spark):
    import pytest as _pytest

    import flink_kafka_table_api_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="not divisible"):
        sim.pq_train(df, m=2, k=1, n_iter=1)


# ---------------------------------------------------------------------------
# IVFPQ (operators/similarity.py ivf_pq_*): the composed index. Pinned
# against a numpy ADC replay over residuals, the zero-distance
# reconstruction-query top-1, and the plan contract (partition-pruned
# scan that reads codes, never vectors).
# ---------------------------------------------------------------------------


def _ivfpq_fixture(spark):
    import flink_kafka_table_api_spark.operators.similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = emb.filter("vec_id < 4").selectExpr(
        "vec_id AS c_id", "embedding AS c_embedding"
    )
    cbs = sim.ivf_pq_train(emb, cents, m=8, k=16, n_iter=1)
    cmap = {
        int(r.c_id): [float(x) for x in r.c_embedding]
        for r in cents.collect()
    }
    return sim, emb, cents, cbs, cmap


def test_ivf_pq_search_matches_numpy_adc_replay(spark, tmp_path):
    import numpy as np

    sim, emb, cents, cbs, cmap = _ivfpq_fixture(spark)
    path = str(tmp_path / "ivfpq")
    sim.ivf_pq_build_index(emb, cents, cbs, path)

    q_row = emb.filter("vec_id = 0").first()
    q = [float(x) for x in q_row.embedding]
    probed = sim.ivf_route(cents, emb.filter("vec_id = 0").selectExpr(
        "embedding AS q_embedding"), nprobe=2)
    got = [
        (r.vec_id, r.adc_dist)
        for r in sim.ivf_pq_topk(
            spark, path, cmap, cbs, probed, q, 10
        ).collect()
    ]

    # numpy replay: recompute assignment, residual codes, ADC per cluster
    idx = spark.read.parquet(path).collect()
    sub = len(cbs[0][0])
    m = len(cbs)
    want = []
    for r in idx:
        if int(r.cluster) not in [int(c) for c in probed]:
            continue
        qres = np.array(q) - np.array(cmap[int(r.cluster)])
        dist = 0.0
        for j in range(m):
            cj = int(r.pq[j])
            qs = qres[j * sub:(j + 1) * sub]
            dist += float(((qs - np.array(cbs[j][cj])) ** 2).sum())
        want.append((r.vec_id, round(dist, 6)))
    want.sort(key=lambda t: (t[1], t[0]))
    assert got == want[:10]


def test_ivf_pq_reconstruction_query_is_top1(spark, tmp_path):
    sim, emb, cents, cbs, cmap = _ivfpq_fixture(spark)
    path = str(tmp_path / "ivfpq2")
    sim.ivf_pq_build_index(emb, cents, cbs, path)
    row0 = spark.read.parquet(path).filter("vec_id = 0").first()
    c0 = int(row0.cluster)
    recon = list(cmap[c0])
    sub = len(cbs[0][0])
    for j, code in enumerate(row0.pq):
        for p in range(sub):
            recon[j * sub + p] += cbs[j][int(code)][p]
    top = sim.ivf_pq_topk(spark, path, cmap, cbs, [c0], recon, 5).collect()
    assert top[0].vec_id == 0 and top[0].adc_dist == 0.0


def test_ivf_pq_scan_is_pruned_and_never_reads_vectors(spark, tmp_path):
    sim, emb, cents, cbs, cmap = _ivfpq_fixture(spark)
    path = str(tmp_path / "ivfpq3")
    sim.ivf_pq_build_index(emb, cents, cbs, path)
    q = [0.0] * 64
    df = sim.ivf_pq_topk(spark, path, cmap, cbs, [1], q, 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cluster" in part
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "pq" in read_schema and "embedding" not in read_schema
