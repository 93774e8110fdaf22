"""pmi_collocations and char_entropy (operators/text.py): pinned against
independent Python references (math.log / collections.Counter), plus
edge cases (empty docs, uniform strings, min_count threshold)."""

from __future__ import annotations

import math
from collections import Counter

import flink_kafka_table_api_spark.operators.text as tx

DOCS = [
    (1, "new york new york new york city"),
    (2, "the big apple is new york and new york is big"),
    (3, "machine learning on new york data"),
    (4, ""),
    (5, "aaaa aaaa aaaa"),
]


def _py_pmi(docs, min_count):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for _, text in docs:
        toks = text.lower().split()
        uni.update(toks)
        pairs.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    n = float(sum(uni.values()))
    out = {}
    for bg, nab in pairs.items():
        if nab < min_count:
            continue
        w1, w2 = bg.split(" ")
        out[bg] = (
            nab,
            round(math.log((nab * n) / (uni[w1] * float(uni[w2]))), 6),
        )
    return out


def test_pmi_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.bigram: (r.n_ab, r.pmi)
        for r in tx.pmi_collocations(df, min_count=2).collect()
    }
    assert got == _py_pmi(DOCS, 2)
    # the collocation outranks the frequent-but-independent pair
    assert got["new york"][1] > got["is new"][1] if "is new" in got else True
    assert "new york" in got


def test_pmi_min_count_is_integer_exact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for mc in (2, 3, 5):
        got = {
            r.bigram for r in tx.pmi_collocations(df, min_count=mc).collect()
        }
        assert got == set(_py_pmi(DOCS, mc))


def _py_entropy(text):
    n = len(text)
    if n == 0:
        return 0, 0, 0.0
    counts = Counter(text)
    s = 0.0
    for ch in sorted(counts):  # the pinned ascending-char fold order
        c = counts[ch]
        s += c * math.log(c)
    return n, len(counts), round(math.log(n) - s / n, 6)


def test_char_entropy_matches_python_reference(spark):
    rows = [
        (1, "abcabcabc"),
        (2, "aaaaaaaa"),          # zero entropy
        (3, ""),                  # empty -> 0 by convention
        (4, "abcdefgh"),          # uniform: ln(8)
        (5, "hello, world! 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.distinct_chars, r.entropy)
        for r in tx.char_entropy(df).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_entropy(text), (doc_id, text)
    assert got[2][2] == 0.0
    assert got[3] == (0, 0, 0.0)
    assert got[4][2] == round(math.log(8), 6)


def test_char_entropy_is_partitioning_invariant(spark):
    rows = [(i, f"doc {i} text " * (i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in tx.char_entropy(df).collect()}
    b = {tuple(r) for r in tx.char_entropy(df.repartition(7)).collect()}
    assert a == b
