"""Unit tests for the LLM-pipeline operator internals (dedup, similarity,
text, multimodal) on tiny in-memory data where expected values are
hand-checkable. The full-scale oracle comparison lives in
test_oracle_parity.py."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.functions.portable import portable_hash64
from flink_kafka_table_api_spark.operators import dedup as dd
from flink_kafka_table_api_spark.operators import multimodal as mm
from flink_kafka_table_api_spark.operators import similarity as sim
from flink_kafka_table_api_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_portable_hash_matches_python(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    got = df.select(portable_hash64("s").alias("h")).collect()[0].h
    expected = int(hashlib.md5(b"abc").hexdigest()[:15], 16)
    assert got == expected


def test_shingles(spark, docs):
    out = docs.filter("doc_id = 1").select(
        dd.shingles("text", 3).alias("sh")
    ).collect()[0].sh
    assert "the quick brown" in out
    assert "over the lazy" in out
    assert len(out) == 7  # 9 tokens -> 7 trigrams, all distinct


def test_minhash_identical_docs_share_signature(spark, docs):
    sigs = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3)
            for r in dd.minhash_signatures(docs, "doc_id", "text",
                                           num_hashes=4).collect()}
    assert sigs[1] == sigs[4]          # exact dup -> identical signature
    assert sigs[1] != sigs[3]          # unrelated -> different


def test_lsh_finds_exact_dup_pair(spark, docs):
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    bands = dd.lsh_bands(sigs, "doc_id", bands=4, rows_per_band=2)
    pairs = {(r.a, r.b) for r in dd.lsh_candidate_pairs(bands, "doc_id").collect()}
    assert (1, 4) in pairs


def test_jaccard_verification(spark, docs):
    out = dd.ngram_jaccard_pairs(
        docs.withColumn("blk", F.lit(1)), "doc_id", "text",
        block_cols=("blk",), threshold=0.5, shingle_k=1,
    )
    got = {(r.a, r.b): r.jaccard for r in out.collect()}
    assert got[(1, 4)] == 1.0          # exact dup
    assert 0.5 <= got[(1, 2)] < 1.0    # near dup (8 of 9 distinct tokens... )
    assert (1, 3) not in got


def test_simhash_hamming(spark, docs):
    sigs = dd.simhash(docs, "doc_id", "text", bits=32)
    vals = {r.doc_id: r.simhash for r in sigs.collect()}
    assert vals[1] == vals[4]
    pairs = (
        sigs.alias("x").crossJoin(sigs.alias("y"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"),
            dd.hamming_distance(F.col("x.simhash"), F.col("y.simhash")).alias("d"),
        )
    )
    d = {(r.a, r.b): r.d for r in pairs.collect()}
    assert d[(1, 4)] == 0
    assert d[(1, 2)] < d[(1, 3)]  # near-dup closer than unrelated


def test_dedup_exact_deterministic(spark, docs):
    out = dd.dedup_exact(docs, keys=("text",), tie_breaker="doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 2, 3]  # doc 4 deduped, min doc_id kept


def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qdf = emb.filter("vec_id = 0").select(F.col("embedding").alias("q_embedding"))
    got = sim.brute_force_topk(emb, qdf, k=3).collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    assert got[0].cosine_sim == 1.0
    assert got[2].cosine_sim == 0.0


def test_lsh_bucket_groups_similar(spark):
    planes = sim.hyperplanes(num_planes=4, dim=3)
    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-5.0, 1.0, -9.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    b = emb.select("vec_id", sim.lsh_bucket(F.col("embedding"), planes).alias("b"))
    vals = {r.vec_id: r.b for r in b.collect()}
    assert vals[0] == vals[1]   # identical vectors share a bucket


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([(1, "  Hello   WORLD hello ")], ["doc_id", "text"])
    out = df.select(tx.tokens("text").alias("t")).collect()[0].t
    assert out == ["hello", "world", "hello"]


def test_lang_id_obvious_cases(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and it is big", "en"),
         (2, "el gato es grande y la casa es de madera", "es")],
        ["doc_id", "text", "lang"],
    )
    got = {r.doc_id: r.predicted_lang for r in tx.with_lang_id(df).collect()}
    assert got == {1: "en", 2: "es"}


def test_multimodal_decode_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG123456")), (2, bytearray(b"plain bytes"))],
        ["doc_id", "payload"],
    )
    out = {r.doc_id: r for r in mm.decode_image_meta(df, fake=True).collect()}
    assert out[1].format == "png"
    assert out[2].format is None
    assert out[1].byte_len == 10
    assert out[1].width == 1 + (10 % 512)
    assert out[1].content_md5 == hashlib.md5(b"\x89PNG123456").hexdigest()


def test_multimodal_real_decode_is_stubbed(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], ["doc_id", "payload"])
    with pytest.raises(Exception, match="NotImplementedError|fake=True"):
        mm.decode_image_meta(df, fake=False).collect()


def test_kmeans_lloyd_separates_blobs(spark):
    """Two well-separated blobs must resolve into pure clusters, and every
    vector must be accounted for."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [5.0, 5.0, 0.0] if i % 2 == 0 else [-5.0, 0.0, 5.0]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = sim.kmeans_lloyd(df, k=2, n_iter=4)
    got = cents.collect()
    assert len(got) == 2
    assert sorted(r.n_members for r in got) == [20, 20]
    # final assignment with trained centroids is pure: each blob maps
    # entirely to one cluster
    assign = sim.ivf_assign(df, cents.select("c_id", "c_embedding")).collect()
    by_parity = {0: set(), 1: set()}
    for r in assign:
        by_parity[r.vec_id % 2].add(r.cluster)
    assert len(by_parity[0]) == 1 and len(by_parity[1]) == 1
    assert by_parity[0] != by_parity[1]


def test_audio_features_matches_python_reference(spark):
    """Windowed RMS/zero-crossings pinned against a pure-Python model."""
    import math

    payload = bytes(range(256)) * 2 + b"\x00\x7f\xff"
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    got = {
        r.window_idx: (r.rms, r.zero_crossings)
        for r in mm.audio_features(df, window_bytes=256, fake=True).collect()
    }
    samples = [b - 128.0 for b in payload]
    for w in range(0, len(samples), 256):
        win = samples[w:w + 256] or [0.0]
        rms = f"{math.sqrt(sum(x * x for x in win) / len(win)):.6f}"
        zc = sum(
            1 for a, b in zip(win, win[1:])
            if (a < 0 or (a == 0 and math.copysign(1, a) < 0)) != (b < 0 or (b == 0 and math.copysign(1, b) < 0))
        )
        assert got[w // 256][0] == rms
    assert len(got) == 3


def test_multimodal_arrow_decode_matches_pandas_decode(spark):
    """mapInArrow twin must produce the identical metadata table as the
    mapInPandas path (zero-copy buffers vs pandas objects is an execution
    detail, not a semantic one)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    payloads = mm.documents_as_binary(docs)
    a = mm.decode_image_meta(payloads, fake=True)
    b = mm.decode_image_meta_arrow(payloads, fake=True)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_connected_components_distributed_branch(spark):
    """driver_edge_threshold=0 forces the label-propagation path; it must
    produce exactly the same components as the driver union-find."""
    from flink_kafka_table_api_spark.operators.dedup import (
        connected_components,
    )

    # two chains (1-2-3-4, 10-11) + a self-contained pair (20-21),
    # orientations mixed so both paths must normalize edges
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (11, 10), (20, 21)], "a long, b long"
    )
    dist = {
        (r.id, r.cluster, r.is_canonical)
        for r in connected_components(
            edges, driver_edge_threshold=0
        ).collect()
    }
    drv = {
        (r.id, r.cluster, r.is_canonical)
        for r in connected_components(
            edges, driver_edge_threshold=10**6
        ).collect()
    }
    assert dist == drv
    assert (1, 1, True) in dist and (4, 1, False) in dist
    assert (10, 10, True) in dist and (21, 20, False) in dist


def test_curate_documents_distributed_cc(spark, docs):
    """The composed curation pipeline with the union-find threshold tuned
    to 0 (distributed CC branch) returns the same curated corpus as the
    default driver-side branch — the knob is surfaced end-to-end."""
    from flink_kafka_table_api_spark.plans.llm_curation import (
        curate_documents,
    )

    base = docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("src0")
    )
    default = {
        r.doc_id
        for r in curate_documents(base, quality_threshold=0.0).collect()
    }
    distributed = {
        r.doc_id
        for r in curate_documents(
            base, quality_threshold=0.0, cc_driver_edge_threshold=0
        ).collect()
    }
    assert default == distributed and default
