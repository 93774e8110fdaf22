"""Training-data curation operators: semantics pinned on tiny fixtures
(the oracle parity test covers the registered queries; these pin the
properties the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators import curation as cu

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_decontaminate_partitions_train(spark):
    """keep + contaminated must partition the train corpus exactly."""
    docs = _docs(spark)
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    kept = cu.decontaminate(train, bench, ngram_n=2)
    flagged = cu.decontaminate(train, bench, ngram_n=2, keep_contaminated=True)
    n_train, n_kept, n_flagged = train.count(), kept.count(), flagged.count()
    assert n_kept + n_flagged == n_train
    assert flagged.filter(F.col("overlap_ngrams") <= 0).count() == 0
    # a benchmark doc inserted into train must always be flagged
    leaked = train.limit(0).unionByName(bench.limit(1))
    assert cu.decontaminate(leaked, bench, ngram_n=2).count() == 0


def test_pack_sequences_bucket_count_invariant(spark):
    """The distributed prefix sum must give identical packing regardless of
    how many range buckets the id space is split into."""
    docs = _docs(spark)
    a = cu.pack_sequences(docs, budget=128, num_buckets=1)
    b = cu.pack_sequences(docs, budget=128, num_buckets=32)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every doc is assigned, seq ids start at 0 and are dense enough that
    # no sequence exceeds the budget by more than one straddling doc
    rows = a.orderBy("doc_id").collect()
    assert len(rows) == docs.count()
    assert rows[0].seq_id == 0
    cum = 0
    for r in rows:
        assert r.seq_id == cum // 128
        cum += r.n_tokens


def test_stratified_sample_is_deterministic_and_stratified(spark):
    docs = _docs(spark)
    s1 = cu.stratified_sample(
        docs, stratum_col="lang", rates={"en": 100, "de": 0}, default_rate=0
    )
    # rate 100 keeps every en doc, rate 0 drops every de doc
    assert s1.filter(F.col("lang") == "de").count() == 0
    assert s1.count() == docs.filter(F.col("lang") == "en").count()
    # repeated runs produce the identical sample (hash, not RNG)
    s2 = cu.stratified_sample(
        docs.repartition(7), stratum_col="lang",
        rates={"en": 100, "de": 0}, default_rate=0,
    )
    assert s1.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0


def test_corpus_mix_shares_sum_to_one(spark):
    mix = cu.corpus_mix(_docs(spark)).collect()
    assert abs(sum(r.token_share for r in mix) - 1.0) < 1e-4
    assert all(r.n_docs > 0 and r.n_tokens > 0 for r in mix)


def test_pack_sequences_matches_python_model(spark):
    """pack_sequences against a driver-side reference model on adversarial
    token-size patterns (zeros, giants, budget-exact runs)."""
    cases = [
        [1] * 50,
        [300, 1, 1, 300, 5],            # docs larger than the budget
        [128] * 7,                       # exactly budget/2 each
        [0, 0, 5, 0, 256, 256, 1],       # empty docs
        list(range(0, 40)),
    ]
    budget = 256
    for sizes in cases:
        rows = [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.seq_id)
            for r in cu.pack_sequences(
                df, budget=budget, num_buckets=3
            ).collect()
        }
        cum = 0
        for i, s in enumerate(sizes):
            assert got[i] == (s, cum // budget), (sizes, i, got[i])
            cum += s


def test_pii_redact_each_pattern_fires_and_counts(spark):
    rows = [
        (0, "mail me at jo.doe+x@sub.example.org today"),
        (1, "ssn 123-45-6789 phone +1 555-0142 done"),
        (2, "server at 192.168.254.3 rebooted"),
        (3, "no pii here at all"),
        (4, "two mails a@b.io and c@d.co plus 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_pii)
           for r in cu.pii_redact(df).collect()}
    assert got[0] == ("mail me at <EMAIL> today", 1)
    assert got[1] == ("ssn <SSN> phone <PHONE> done", 2)
    assert got[2] == ("server at <IP> rebooted", 1)
    assert got[3] == ("no pii here at all", 0)
    assert got[4] == ("two mails <EMAIL> and <EMAIL> plus <IP>", 3)


def test_doc_chunks_overlap_and_tail(spark):
    # 50 tokens, window 32, stride 24 -> chunks at 0 and 24; the second
    # chunk carries the 26-token tail (never dropped, shorter than window)
    toks = [f"t{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(7, " ".join(toks)), (8, "only three tokens")],
        "doc_id long, text string",
    )
    got = {}
    for r in cu.doc_chunks(df, window=32, stride=24).collect():
        got.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split(" ")
    assert sorted(got[7]) == [0, 1]
    assert got[7][0] == toks[0:32]
    assert got[7][1] == toks[24:50]          # tail chunk, 26 tokens
    assert got[7][0][24:] == got[7][1][:8]   # 8-token overlap
    assert got[8] == {0: ["only", "three", "tokens"]}


def test_importance_weights_prefer_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),     # pure target vocabulary
         (1, "zeta eta theta iota"),        # disjoint vocabulary
         (2, "alpha beta theta iota")],     # half/half
        "doc_id long, text string",
    )
    w = {r.doc_id: r.importance
         for r in cu.importance_weights(raw, target).collect()}
    assert w[0] > w[2] > w[1]


def test_doc_chunks_cover_and_reconstruct(spark):
    """Coverage/reconstruction contract over edge sizes: with
    stride == window the chunks concatenate back to the exact token
    sequence; with overlap every chunk equals toks[i*stride : i*stride+W]
    and the union covers every token."""
    W, S = 8, 5
    sizes = [1, 7, 8, 9, 16, 17, 40, 53]
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(s)))
            for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for window, stride in [(W, W), (W, S)]:
        out = {}
        for r in cu.doc_chunks(df, window=window, stride=stride).collect():
            out.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split(" ")
        for i, s in enumerate(sizes):
            toks = [f"w{i}x{j}" for j in range(s)]
            chunks = [out[i][k] for k in sorted(out[i])]
            for k, ch in enumerate(chunks):
                assert ch == toks[k * stride: k * stride + window], (
                    window, stride, i, k)
            if stride == window:
                assert sum(chunks, []) == toks  # exact reconstruction
            else:
                assert {t for c in chunks for t in c} == set(toks)


def test_bloom_decontaminate_matches_exact(spark):
    from flink_kafka_table_api_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    exact = {r.doc_id for r in decontaminate(
        train, bench, ngram_n=4).select("doc_id").collect()}
    # tiny bitmap (2^12 bits) forces a real false-positive rate so the
    # verify stage is actually exercised, not vacuously true
    bloom = {r.doc_id for r in bloom_decontaminate(
        train, bench, ngram_n=4, m_bits=1 << 12
    ).select("doc_id").collect()}
    assert bloom == exact and exact


def test_bloom_decontaminate_audit_counts_match_exact(spark):
    from flink_kafka_table_api_spark.operators.curation import (
        bloom_decontaminate,
        decontaminate,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    exact = {(r.doc_id, r.overlap_ngrams) for r in decontaminate(
        train, bench, ngram_n=4, keep_contaminated=True).collect()}
    bloom = {(r.doc_id, r.overlap_ngrams) for r in bloom_decontaminate(
        train, bench, ngram_n=4, m_bits=1 << 12, keep_contaminated=True
    ).collect()}
    assert bloom == exact and exact


def test_length_band_filter_hand_example(spark):
    from flink_kafka_table_api_spark.operators.curation import (
        length_band_filter,
    )
    rows = [(i, "a", i * 10) for i in range(1, 12)]  # 10..110 in group a
    rows += [(100 + i, "b", 1000 + i) for i in range(5)]  # tight group b
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = {r.doc_id for r in length_band_filter(
        df, group_col="source", value_col="n_chars", lo=0.1, hi=0.9
    ).collect()}
    # group a: p10 of 10..110 = 20, p90 = 100 -> keeps ids 2..10
    assert {r for r in kept if r < 100} == set(range(2, 11))
    # group b: 5 values 1000..1004 -> p10=1000.4, p90=1003.6 -> ids 101..103
    assert {r for r in kept if r >= 100} == {101, 102, 103}


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """Near-dup cluster members always share a split; singletons are
    their own cluster; weights are validated; assignment is a pure
    function of the cluster label (re-running yields identical rows)."""
    import pytest as _pytest

    from flink_kafka_table_api_spark.operators.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 101)], ["doc_id"])
    # pair graph: chains {1-2-3}, {10-11}, everything else singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a", "b"])
    out = leakage_safe_split(docs, "doc_id", pairs).collect()
    assert len(out) == 100
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].split == by_id[2].split == by_id[3].split
    assert by_id[1].cluster == by_id[2].cluster == by_id[3].cluster == 1
    assert by_id[10].split == by_id[11].split
    assert by_id[50].cluster == 50  # singleton clusters as itself
    # all three splits are populated at this size and roughly weighted
    from collections import Counter
    c = Counter(r.split for r in out)
    assert set(c) == {"train", "val", "test"} and c["train"] > c["val"]
    # deterministic: a second run is identical
    again = {r.doc_id: (r.cluster, r.split)
             for r in leakage_safe_split(docs, "doc_id", pairs).collect()}
    assert again == {r.doc_id: (r.cluster, r.split) for r in out}
    with _pytest.raises(ValueError, match="sum to 100"):
        leakage_safe_split(docs, "doc_id", pairs, weights=(70, 10, 10))
