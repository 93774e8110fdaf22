"""Property tests for the round-12..15 staged operators: each operator
replayed against an independent pure-Python reference on
hypothesis-generated inputs. Spark sessions are expensive per example,
so each property batches MANY generated cases into ONE DataFrame and
asserts on the whole batch (the established test_properties.py
trade-off: few Spark round-trips, wide input coverage)."""

from __future__ import annotations

import datetime as dt
import itertools
import math

from hypothesis import given, settings
from hypothesis import strategies as st

import flink_kafka_table_api_spark.operators.curation as cu
import flink_kafka_table_api_spark.operators.dedup as dd
import flink_kafka_table_api_spark.operators.text as tx
import flink_kafka_table_api_spark.operators.timeseries as tsops

NAMES = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=8),
    min_size=1, max_size=12,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[len(b)]


@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=8),
                min_size=1, max_size=25))
@settings(max_examples=15, deadline=None)
def test_edit_similarity_join_matches_bruteforce(spark, names):
    """The q-gram-filtered join finds EXACTLY the brute-force distance
    <= 2 distinct-name pairs over a narrow alphabet (dense tie/repeat
    structure — the hard case for the multiset q-gram filter) — the
    count filter may only prune, never lose."""
    rows, expected = [], set()
    for pk, t in enumerate(names):
        rows.append((pk, t))
    for x, y in itertools.combinations(sorted(set(names)), 2):
        d = _lev(x, y)
        if d <= 2:
            expected.add((x, y, d))
    df = spark.createDataFrame(rows, "pk long, name string")
    got = {
        (r.a_name, r.b_name, r.dist)
        for r in dd.edit_similarity_join(df, name_col="name", k=2).collect()
    }
    assert got == expected


SERIES = st.lists(
    st.lists(st.integers(min_value=0, max_value=30),
             min_size=2, max_size=12),
    min_size=1, max_size=4,
)


def _cusum_ref(series: list[int], kappa6=500000, h6=4000000):
    n = len(series)
    s1, s2 = sum(series), sum(c * c for c in series)
    mean = s1 / n
    var = max(s2 / n - mean * mean, 0.0)
    sd = math.sqrt(var)
    out, p, q, minp, minq = [], 0, 0, 0, 0
    for c in series:
        z6 = round((c - mean) / sd * 1e6) if sd > 0 else 0
        p += z6 - kappa6
        q += -z6 - kappa6
        minp, minq = min(minp, p), min(minq, q)
        sp, sn = p - min(0, minp), q - min(0, minq)
        out.append((c, z6 / 1e6, sp / 1e6, sn / 1e6,
                    sp > h6 or sn > h6))
    return out


@given(SERIES)
@settings(max_examples=8, deadline=None)
def test_cusum_drift_matches_python_replay(spark, series_set):
    base = dt.datetime(2024, 5, 1)
    rows, eid = [], 0
    # independent groups share one calendar: pad all to the max length
    n_days = max(len(s) for s in series_set)
    padded = [s + [0] * (n_days - len(s)) for s in series_set]
    # day 0 gets one sentinel event per group so min/max span is fixed
    for gi, s in enumerate(padded):
        for day, c in enumerate(s):
            for _ in range(c):
                rows.append((eid, base + dt.timedelta(days=day),
                             f"g{gi}")); eid += 1
    if not rows:
        return
    # groups with zero total events have no rows at all: drop them
    # from the expectation (they never appear in the source)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {
        (r.event_type, str(r.day)): (
            r.n_events, r.z, r.cusum_pos, r.cusum_neg, r.drift
        )
        for r in tsops.cusum_drift(df).collect()
    }
    # the operator's calendar spans [min day with events, max day with
    # events] across ALL groups
    active_days = sorted({
        (base + dt.timedelta(days=d)).date()
        for gi, s in enumerate(padded) for d, c in enumerate(s) if c > 0
    })
    if not active_days:
        return
    d0, d1 = active_days[0], active_days[-1]
    span = [(d0 + dt.timedelta(days=i))
            for i in range((d1 - d0).days + 1)]
    for gi, s in enumerate(padded):
        if sum(s) == 0:
            continue
        counts = []
        for day in span:
            idx = (day - base.date()).days
            counts.append(s[idx] if 0 <= idx < len(s) else 0)
        ref = _cusum_ref(counts)
        for day, (c, z, sp, sn, drift) in zip(span, ref):
            row = got[(f"g{gi}", str(day))]
            assert row[0] == c
            assert abs(row[1] - round(z, 6)) < 1e-9
            assert abs(row[2] - round(sp, 6)) < 1e-9
            assert abs(row[3] - round(sn, 6)) < 1e-9
            assert row[4] == drift


DOCS = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1, max_size=10,
)


@given(DOCS)
@settings(max_examples=8, deadline=None)
def test_zipf_gini_audit_matches_python_replay(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tx.zipf_gini_audit(df).collect()[0]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().strip().split():
            freqs[w] = freqs.get(w, 0) + 1
    if not freqs:
        assert (got.n_tokens or 0) == 0
        return
    n, t_ = len(freqs), sum(freqs.values())
    asc = sorted(freqs.items(), key=lambda kv: (kv[1], kv[0]))
    s1 = sum((i + 1) * f for i, (_, f) in enumerate(asc))
    gini = 2.0 * s1 / (n * t_) - (n + 1.0) / n
    desc = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(r + 1) for r in range(len(desc))]
    ys = [math.log(f) for _, f in desc]
    m = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = m * sxx - sx * sx
    slope = (m * sxy - sx * sy) / den if den > 0 else 0.0
    assert got.n_tokens == t_ and got.vocab == n
    assert abs(got.gini - round(gini, 6)) < 1e-9
    assert abs(got.zipf_slope - round(slope, 6)) < 2e-6  # fold-order ulp


@given(DOCS)
@settings(max_examples=8, deadline=None)
def test_readability_matches_python_replay(spark, texts):
    import re

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.readability_scores(df).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().strip().split()]
        syll = sum(
            max(1, len(re.findall(r"[aeiouy]+", w))) for w in words
        )
        sents = len([
            s for s in re.split(r"[.!?]+", t.lower())
            if re.search(r"[a-z0-9]", s)
        ])
        r = got[i]
        assert (r.n_words, r.n_syllables, r.n_sentences) == (
            len(words), syll if words else 0, sents
        )


@given(st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]),
              st.sampled_from(["x", "y"])),
    min_size=1, max_size=60,
))
@settings(max_examples=8, deadline=None)
def test_source_lang_mi_matches_python_replay(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    got = cu.source_lang_mi(df).collect()[0]
    from collections import Counter

    cells = Counter(pairs)
    am = Counter(a for a, _ in pairs)
    bm = Counter(b for _, b in pairs)
    n = len(pairs)
    mi = sum(
        (c / n) * math.log(c * n / (am[a] * bm[b]))
        for (a, b), c in sorted(cells.items())
    )
    ha = -sum((c / n) * math.log(c / n) for _, c in sorted(am.items()))
    hb = -sum((c / n) * math.log(c / n) for _, c in sorted(bm.items()))
    assert got.n_docs == n
    assert abs(got.mi - round(mi, 6)) < 2e-6
    assert abs(got.h_a - round(ha, 6)) < 2e-6
    assert abs(got.h_b - round(hb, 6)) < 2e-6
