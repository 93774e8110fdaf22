"""Property-based tests (hypothesis). The pure-Python layers (Avro binary
codec, zigzag varints, portable hash, prefix-filter bounds) afford
hundreds of examples; the Spark-backed merge_upsert property runs few
examples with the deadline off (each example is a full Spark job)."""

from __future__ import annotations

import datetime as dt
import io
import json

import replays
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_kafka_table_api_spark.sources.avro_codec import (
    _read_long,
    _write_long,
    decode_record,
    encode_record,
)

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
@settings(max_examples=300)
def test_varint_roundtrip_any_int64(n):
    buf = io.BytesIO()
    _write_long(buf, n)
    buf.seek(0)
    assert _read_long(buf) == n


RECORD_SCHEMA = json.dumps({
    "type": "record", "name": "P", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "string"}],
         "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
})

record_strategy = st.fixed_dictionaries({
    "s": st.text(max_size=50),
    "n": INT64,
    "d": st.floats(allow_nan=False, allow_infinity=False),
    "opt": st.one_of(st.none(), st.text(max_size=20)),
    "m": st.one_of(
        st.none(),
        st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
    ),
    "arr": st.lists(INT64, max_size=8),
    "ts": st.datetimes(
        min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
})


@given(record_strategy)
@settings(max_examples=200)
def test_avro_record_roundtrip(rec):
    back = decode_record(RECORD_SCHEMA, encode_record(RECORD_SCHEMA, rec))
    assert back == rec


_DUCK = None


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_portable_hash_contract_matches_duckdb(s):
    """The portable-hash contract underlying every oracle-checked dedup
    query: Python's reference rendering and DuckDB's SQL rendering agree on
    arbitrary unicode input. (The Spark rendering is pinned against the
    Python reference in test_operators.py::test_portable_hash_matches_python.)"""
    import hashlib

    import duckdb

    global _DUCK
    if _DUCK is None:
        _DUCK = duckdb.connect()
    expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = _DUCK.execute(
        "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
    ).fetchone()[0]
    assert got == expected


# ---------------------------------------------------------------------------
# OCF container format (sources/avro_file.py)
# ---------------------------------------------------------------------------

@given(
    st.lists(record_strategy, max_size=40),
    st.sampled_from(["null", "deflate"]),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=60, deadline=None)
def test_ocf_roundtrip_any_records(records, codec, block_records):
    from flink_kafka_table_api_spark.sources.avro_file import (
        read_ocf_bytes,
        write_ocf_bytes,
    )
    blob = write_ocf_bytes(
        RECORD_SCHEMA, records, codec=codec, block_records=block_records
    )
    writer, got = read_ocf_bytes(blob)
    assert json.loads(writer) == json.loads(RECORD_SCHEMA)
    assert len(got) == len(records)
    for a, b in zip(got, records):
        for k in ("s", "n", "opt", "m", "arr", "ts"):
            assert a[k] == b[k]
        assert a["d"] == b["d"] or (a["d"] != a["d"] and b["d"] != b["d"])


# ---------------------------------------------------------------------------
# writer -> reader schema resolution (avro_codec.decode_record_resolved)
# ---------------------------------------------------------------------------

@given(record_strategy)
@settings(max_examples=100)
def test_resolution_identity_matches_plain_decode(rec):
    from flink_kafka_table_api_spark.sources.avro_codec import (
        decode_record_resolved,
    )
    payload = encode_record(RECORD_SCHEMA, rec)
    assert decode_record_resolved(RECORD_SCHEMA, RECORD_SCHEMA, payload) == \
        decode_record(RECORD_SCHEMA, payload)


@given(record_strategy)
@settings(max_examples=100)
def test_resolution_added_default_and_dropped_field(rec):
    from flink_kafka_table_api_spark.sources.avro_codec import (
        decode_record_resolved,
    )
    reader = json.loads(RECORD_SCHEMA)
    reader["fields"] = [f for f in reader["fields"] if f["name"] != "m"]
    reader["fields"].append(
        {"name": "extra", "type": ["null", "long"], "default": None}
    )
    payload = encode_record(RECORD_SCHEMA, rec)
    got = decode_record_resolved(RECORD_SCHEMA, json.dumps(reader), payload)
    assert "m" not in got and got["extra"] is None
    assert got["s"] == rec["s"] and got["arr"] == rec["arr"]


# ---------------------------------------------------------------------------
# prefix-filter float-safe bounds (operators/dedup.py:prefix_filter_pairs)
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=99),   # threshold = t100/100
    st.integers(min_value=1, max_value=5000),  # set size n
)
@settings(max_examples=400)
def test_prefix_bound_round9_recovers_exact_ceiling(t100, n):
    """The operator computes ceil(round(t*n, 9)) in Spark (round is
    HALF_UP on doubles). For any 2-decimal threshold this must equal the
    EXACT rational ceiling ceil(t100*n/100) — the property the raw
    float ceil violated (e.g. ceil(0.55*20) = 12)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    t = t100 / 100.0
    # Spark's round(double, 9) is decimal HALF_UP on the double's value
    rounded = float(
        Decimal(t * n).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
    )
    exact = math.ceil(Fraction(t100 * n, 100))
    assert math.ceil(rounded) == exact


# ---------------------------------------------------------------------------
# merge_upsert semantics (operators/relational.py:merge_upsert) — VERDICT r4
# item 7: equivalence to a reference Python merge over random key/null
# patterns, plus the duplicate-update-key raise. Spark-backed, so examples
# are few and the deadline is off (each example is a full Spark job).
# ---------------------------------------------------------------------------

_KEYS = st.integers(min_value=0, max_value=7)
_ROW = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
)


def _ref_merge(base, updates):
    """Reference Python merge: matched keys take the update's NON-NULL
    values, unmatched update keys insert, untouched base rows pass."""
    out = {k: list(v) for k, v in base.items()}
    for k, (a, b) in updates.items():
        if k in out:
            if a is not None:
                out[k][0] = a
            if b is not None:
                out[k][1] = b
        else:
            out[k] = [a, b]
    return {(k, v[0], v[1]) for k, v in out.items()}


@given(
    st.dictionaries(_KEYS, _ROW, max_size=8),
    st.dictionaries(_KEYS, _ROW, max_size=8),
)
@settings(max_examples=25, deadline=None)
def test_merge_upsert_matches_reference_merge(spark, base, updates):
    from flink_kafka_table_api_spark.operators.relational import merge_upsert

    schema = "k long, a int, b string"
    base_df = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in base.items()], schema)
    upd_df = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in updates.items()], schema)
    got = {(r.k, r.a, r.b) for r in
           merge_upsert(base_df, upd_df, key_cols=("k",)).collect()}
    assert got == _ref_merge(base, updates)


def test_merge_upsert_duplicate_update_key_raises(spark):
    import pytest as _pytest

    from flink_kafka_table_api_spark.operators.relational import merge_upsert

    schema = "k long, a int, b string"
    base_df = spark.createDataFrame([(1, 10, "x")], schema)
    upd_df = spark.createDataFrame([(1, 11, "y"), (1, 12, "z")], schema)
    with _pytest.raises(Exception, match="multiple update rows"):
        merge_upsert(base_df, upd_df, key_cols=("k",)).collect()


# ---------------------------------------------------------------------------
# Round-5 operators: BM25 equivalence to a reference Python scorer over
# random corpora, CMS no-undercount over random streams, and hierarchy
# pointer-jumping equivalence to a reference Python walk over random
# forests. Spark-backed: few examples, deadline off.
# ---------------------------------------------------------------------------

_WORDS = ["spark", "fast", "data", "engine", "slow", "table", "row"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12)


def _ref_bm25(corpus, terms, k1=1.2, b=0.75):
    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    dfs = {t: sum(1 for d in corpus if t in d) for t in terms}
    out = {}
    for i, d in enumerate(corpus):
        s = 0.0
        for t in terms:
            tf = float(d.count(t))
            idf = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(d) / avgdl))
            )
        out[i] = s
    return out


@given(st.lists(_DOC, min_size=1, max_size=10))
@settings(max_examples=15, deadline=None)
def test_bm25_matches_reference_on_random_corpora(spark, corpus):
    from flink_kafka_table_api_spark.operators.retrieval import bm25_scores

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25
           for r in bm25_scores(df, ["spark", "data"]).collect()}
    want = _ref_bm25(corpus, ["spark", "data"])
    assert got.keys() == want.keys()
    for i in got:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])


@given(st.lists(st.integers(min_value=0, max_value=20),
                min_size=1, max_size=300))
@settings(max_examples=10, deadline=None)
def test_cms_estimate_never_undercounts_random_streams(spark, stream):
    from collections import Counter

    from flink_kafka_table_api_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(k,) for k in stream], "k long")
    sk = cms_sketch(df, "k", depth=3, width=16)  # narrow grid: collisions
    keys = spark.createDataFrame(
        [(k,) for k in set(stream)], "k long"
    )
    true = Counter(stream)
    for r in cms_estimate(keys, sk, "k", depth=3, width=16).collect():
        assert r.cms_est >= true[r.k], (r.k, r.cms_est, true[r.k])


@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=2,
                max_size=60, unique=True))
@settings(max_examples=10, deadline=None)
def test_hierarchy_levels_matches_walk_on_random_forests(spark, ids):
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.operators.relational import (
        hierarchy_levels,
    )

    # deterministic random-ish forest over arbitrary ids: parent = some
    # STRICTLY SMALLER member id (guarantees acyclicity), chosen by index
    # arithmetic; the smallest id is the lone root
    ordered = sorted(ids)
    parent_map = {ordered[0]: ordered[0]}
    for i, k in enumerate(ordered[1:], start=1):
        parent_map[k] = ordered[(i * 7919) % i]  # any index < i

    def walk(k):
        d = 0
        while parent_map[k] != k:
            k = parent_map[k]
            d += 1
        return k, d

    nodes = spark.createDataFrame([(k,) for k in ids], "id long")
    pm = F.create_map(
        *[F.lit(x) for kv in parent_map.items() for x in kv]
    )
    got = {
        r.id: (r.root, r.depth)
        for r in hierarchy_levels(
            nodes, "id", pm[F.col("id")].cast("long")
        ).collect()
    }
    assert got == {k: walk(k) for k in ids}


# ---------------------------------------------------------------------------
# prefix_filter_pairs two-stage verify (operators/dedup.py): the hashed
# fingerprint prescreen + exact re-check must be INVISIBLE — the operator's
# output over random corpora equals the brute-force all-pairs Jaccard,
# pair-for-pair and value-for-value. Spark-backed: few examples, no deadline.
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12)


def _brute_pairs(texts, threshold, k=3):
    def sh(text):
        toks = text.split()
        if len(toks) >= k:
            return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    sets = {i: sh(t) for i, t in texts.items()}
    out = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union if union else 0.0
            if round(j, 6) >= threshold:
                out[(a, b)] = round(j, 6)
    return out


@given(
    st.lists(_DOC, min_size=2, max_size=7),
    st.sampled_from([0.5, 0.6, 0.75]),
)
@settings(max_examples=12, deadline=None)
def test_prefix_filter_two_stage_verify_matches_bruteforce(spark, docs, threshold):
    from flink_kafka_table_api_spark.operators import dedup as dd

    texts = {i: " ".join(words) for i, words in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.a, r.b): r.jaccard
        for r in dd.prefix_filter_pairs(
            df, "doc_id", "text", threshold=threshold, shingle_k=3
        ).collect()
    }
    assert got == _brute_pairs(texts, threshold)


# ---------------------------------------------------------------------------
# z-order bit interleaving (sources/layout.py) — random pairs against the
# Python reference, batched into one Spark job per example
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=8, deadline=None)
def test_interleave_bits_matches_python_reference(spark, triples):
    from pyspark.sql import functions as F

    from flink_kafka_table_api_spark.sources.layout import interleave_bits

    def py(vals, bits=8):
        z = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * len(vals) + j)
        return z

    df = spark.createDataFrame(triples, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 8).alias("z"),
    ).collect()
    for r in got:
        assert r.z == py([r.a, r.b, r.c]), (r.a, r.b, r.c)


# ---------------------------------------------------------------------------
# triangle_count (operators/graph.py) — equivalence to the brute-force
# O(n^3) enumeration over random small symmetric graphs: the degree-
# ordered orientation must never lose or double-count a triangle,
# whatever the degree distribution. Spark-backed: few examples,
# deadline off.
# ---------------------------------------------------------------------------

_EDGE = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=9),
).filter(lambda e: e[0] != e[1])


@given(st.sets(_EDGE, min_size=1, max_size=25))
@settings(max_examples=15, deadline=None)
def test_triangle_count_matches_bruteforce_on_random_graphs(spark, pairs):
    from itertools import combinations

    from flink_kafka_table_api_spark.operators.graph import triangle_count

    sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    adj: dict[int, set[int]] = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# char_entropy (operators/text.py) — the run-length fold must equal the
# Counter-based definition on arbitrary ASCII strings (sorted-order
# accumulation makes the float sequence deterministic, so equality is
# exact, not approximate).
# ---------------------------------------------------------------------------


@given(st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60),
    min_size=1, max_size=8,
))
@settings(max_examples=15, deadline=None)
def test_char_entropy_matches_counter_reference(spark, texts):
    import math
    from collections import Counter

    import flink_kafka_table_api_spark.operators.text as tx

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.distinct_chars, r.entropy)
        for r in tx.char_entropy(df).collect()
    }
    for i, t in rows:
        n = len(t)
        if n == 0:
            assert got[i] == (0, 0, 0.0)
            continue
        counts = Counter(t)
        s = 0.0
        for ch in sorted(counts):
            s += counts[ch] * math.log(counts[ch])
        assert got[i] == (n, len(counts), round(math.log(n) - s / n, 6)), t


# ---------------------------------------------------------------------------
# round-6 item: the round-8 staged operators over random inputs —
# dup_ngram_coverage / nb_scores / source_kl_divergence vs reference
# Python replays on random corpora, label_propagation vs reference LPA
# on random symmetric graphs. Spark-backed: few examples, deadline off.
# ---------------------------------------------------------------------------


@given(st.lists(_DOC, min_size=1, max_size=8),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=10, deadline=None)
def test_dup_ngram_coverage_matches_reference_on_random_corpora(
    spark, corpus, n
):
    from flink_kafka_table_api_spark.operators.text import dup_ngram_coverage

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {r.doc_id: tuple(r)[1:]
           for r in dup_ngram_coverage(df, n=n).collect()}
    for i, d in enumerate(corpus):
        want = replays.py_dup_coverage(" ".join(d), n)
        assert got[i] == want, (i, n, got[i], want)
        # structural invariants the replay equality implies but worth
        # naming: coverage never exceeds the token count, fractions in [0,1]
        assert got[i][4] <= got[i][0]
        assert 0.0 <= got[i][5] <= 1.0 and 0.0 <= got[i][6] <= 1.0


@given(st.sets(
    st.tuples(st.integers(min_value=0, max_value=12),
              st.integers(min_value=0, max_value=12)),
    min_size=1, max_size=40,
))
@settings(max_examples=10, deadline=None)
def test_label_propagation_matches_reference_on_random_graphs(spark, raw):
    from hypothesis import assume

    from flink_kafka_table_api_spark.operators.graph import label_propagation

    base = {(a, b) for a, b in raw if a != b}
    assume(base)
    edges = sorted(base | {(b, a) for a, b in base})  # symmetrize
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.node, r.label)
        for r in label_propagation(df, iterations=3).collect()
    )
    assert got == replays.py_lpa(edges, 3)


_LABEL = st.sampled_from(["en", "de"])


@given(st.lists(st.tuples(_DOC, _LABEL), min_size=2, max_size=8))
@settings(max_examples=10, deadline=None)
def test_nb_scores_matches_reference_on_random_corpora(spark, corpus):
    from flink_kafka_table_api_spark.operators.classify import nb_scores

    rows = [(i, " ".join(d), y) for i, (d, y) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {(r.doc_id, r.label): (r.n_tokens, r.score)
           for r in nb_scores(df).collect()}
    assert got == replays.py_nb_scores(rows)


@given(st.lists(st.tuples(_DOC, st.sampled_from(["s1", "s2", "s3"])),
                min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_source_kl_matches_reference_on_random_corpora(spark, corpus):
    from flink_kafka_table_api_spark.operators.curation import (
        source_kl_divergence,
    )

    rows = [(i, " ".join(d), src) for i, (d, src) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: (r.n_tokens, r.distinct_tokens, r.kl_divergence)
           for r in source_kl_divergence(df).collect()}
    assert got == replays.py_source_kl(rows)
    # KL >= 0 with equality iff the source IS the corpus distribution
    assert all(v[2] >= 0.0 for v in got.values())
