"""Property tests for the round-9 staged changelog operators: each
streaming state machine replayed against an independent pure-Python
reference on hypothesis-generated drop schedules. Few examples with the
deadline off (each example is a full availableNow streaming run — the
established streaming-test trade-off), but every example exercises the
full classification / fire / correction / flush surface with
adversarial timestamps the fixtures cannot anticipate."""

from __future__ import annotations

import datetime as dt
import tempfile
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.streaming.agg_retract import (
    stream_agg_retract,
)
from flink_kafka_table_api_spark.streaming.allowed_lateness import (
    stream_allowed_lateness,
)

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)
DAY = dt.timedelta(days=1)


# ---------------------------------------------------------------------------
# allowed lateness: three-zone classification + fire/correction schedule
# ---------------------------------------------------------------------------

def _al_reference(rows):
    """Pure-Python replay of stream_allowed_lateness semantics
    (delay = allowed = 1 day, 1-day windows, 3 chunks)."""
    wk = []
    seen = []
    for k in range(3):
        seen += [ts for c, ts, v in rows if c == k]
        wk.append(max(seen) - DAY if seen else None)
    adm, late = [], []
    for c, ts, v in rows:
        if c == 0 or wk[c - 1] is None:
            adm.append((c, ts, v))
        elif ts > wk[c - 1] - DAY:
            adm.append((c, ts, v))
        else:
            late.append((c, ts, v))
    # group LATE per (window, batch) with aggregates
    lateagg = defaultdict(lambda: [0, 0.0])
    for c, ts, v in late:
        a = lateagg[(ts.date(), c)]
        a[0] += 1
        a[1] += v
    emissions = []
    for (d, c), (n, sv) in lateagg.items():
        emissions.append(("LATE", str(d), n, sv, c))
    windows = defaultdict(list)
    for c, ts, v in adm:
        windows[ts.date()].append((c, ts, v))
    for d, wrows in windows.items():
        w_end = dt.datetime.combine(d, dt.time()) + DAY
        passed = [k for k in range(3)
                  if wk[k] is not None and wk[k] >= w_end]
        c0 = min(c for c, _, _ in wrows)
        ff = 3 if not passed else max(min(passed), c0)
        def agg(j):
            sel = [(c, v) for c, _, v in [(c, ts, v) for c, ts, v in wrows]
                   if c <= j]
            return len(sel), sum(v for _, v in sel)
        if ff == 3:
            n, sv = agg(2)
            emissions.append(("+I", str(d), n, sv, 3))
        else:
            n, sv = agg(ff)
            emissions.append(("+I", str(d), n, sv, ff))
            for j in range(ff + 1, 3):
                if any(c == j for c, _, _ in wrows):
                    pn, psv = agg(j - 1)
                    cn, csv = agg(j)
                    emissions.append(("-U", str(d), pn, psv, j))
                    emissions.append(("+U", str(d), cn, csv, j))
    return sorted(emissions)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # chunk
            st.integers(min_value=0, max_value=120),   # hour offset
            st.integers(min_value=0, max_value=9),     # value
        ),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=5, deadline=None)
def test_allowed_lateness_matches_python_replay(spark, raw):
    rows = [(c, BASE + dt.timedelta(hours=h), float(v))
            for c, h, v in raw]
    df = spark.createDataFrame(
        [(c, ts, v) for c, ts, v in rows],
        "c int, ts timestamp, value double",
    ).select("ts", "value", F.col("c").alias("__chunk"))
    out = stream_allowed_lateness(
        spark, df, tempfile.mkdtemp(prefix="fkta_alprop_"),
        n_chunks=3, delay="1 day", allowed="1 day",
    )
    got = sorted(
        (r.op, str(r.window_start)[:10], r.n_events, r.sum_value,
         r.batch_id)
        for r in out.collect()
    )
    assert got == _al_reference(rows)


# ---------------------------------------------------------------------------
# agg_retract: cumulative argmax snapshots + RowKind diff
# ---------------------------------------------------------------------------

def _ar_reference(ops):
    """Pure-Python replay of stream_agg_retract semantics (3 chunks).
    ops: (chunk, op_id, ts, key, grp, op, value)."""
    emissions = []
    prev = {}
    for k in range(3):
        win = {}
        for c, op_id, ts, key, grp, op, v in ops:
            if c > k:
                continue
            cur = win.get(key)
            if cur is None or (ts, op_id) > (cur[0], cur[1]):
                win[key] = (ts, op_id, grp, op, v)
        snap = defaultdict(lambda: [0, 0.0])
        for key, (ts, op_id, grp, op, v) in win.items():
            if op != "D":
                a = snap[grp]
                a[0] += 1
                a[1] += v
        snap = {g: (n, sv) for g, (n, sv) in snap.items()}
        for g in snap.keys() - prev.keys():
            emissions.append(("+I", g, *snap[g], k))
        for g in prev.keys() - snap.keys():
            emissions.append(("-D", g, *prev[g], k))
        for g in snap.keys() & prev.keys():
            if snap[g] != prev[g]:
                emissions.append(("-U", g, *prev[g], k))
                emissions.append(("+U", g, *snap[g], k))
        prev = snap
    return sorted(emissions)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # chunk
            st.integers(min_value=0, max_value=72),   # hour offset
            st.integers(min_value=1, max_value=5),    # key
            st.sampled_from(["a", "b"]),              # grp
            st.sampled_from(["U", "U", "U", "D"]),    # op (D rarer)
            st.integers(min_value=0, max_value=9),    # value
        ),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=5, deadline=None)
def test_agg_retract_matches_python_replay(spark, raw):
    ops = [
        (c, i, BASE + dt.timedelta(hours=h), key, grp, op, float(v))
        for i, (c, h, key, grp, op, v) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        [(op_id, ts, key, grp, op, v)
         for c, op_id, ts, key, grp, op, v in ops],
        "op_id long, op_ts timestamp, key long, grp string, op string, "
        "value double",
    )
    chunks = spark.createDataFrame(
        [(op_id, c) for c, op_id, *_ in ops], "op_id long, __chunk int"
    )
    out = stream_agg_retract(
        spark, df.join(chunks, "op_id"),
        tempfile.mkdtemp(prefix="fkta_arprop_"), n_chunks=3,
    )
    got = sorted(
        (r.op, r.grp, r.n_keys, r.total, r.batch_id)
        for r in out.collect()
    )
    assert got == _ar_reference(ops)


# ---------------------------------------------------------------------------
# idle watermark: active-set min-combine + admission/emission schedule
# ---------------------------------------------------------------------------

def _iw_reference(rows):
    """Pure-Python replay of stream_idle_watermark (delay 1 day, 1-day
    windows, idleness on, 3 chunks). rows: (chunk, source, ts, value)."""
    max_seen, w_list, wprev = {}, [], None
    admitted = []
    for k in range(3):
        batch = [(s, ts, v) for c, s, ts, v in rows if c == k]
        admitted += [
            (k, s, ts, v) for s, ts, v in batch
            if wprev is None or ts > wprev
        ]
        active = set()
        for s, ts, v in batch:
            active.add(s)
            if s not in max_seen or ts > max_seen[s]:
                max_seen[s] = ts
        wk = wprev
        if active:
            cand = min(max_seen[s] for s in active) - DAY
            wk = cand if wk is None else max(wk, cand)
        w_list.append(wk)
        wprev = wk
    windows = defaultdict(list)
    for k, s, ts, v in admitted:
        windows[(s, ts.date())].append((k, v))
    emissions = []
    for (s, d), wrows in windows.items():
        w_end = dt.datetime.combine(d, dt.time()) + DAY
        passed = [k for k in range(3)
                  if w_list[k] is not None and w_list[k] >= w_end]
        b = min(passed) if passed else 3
        emissions.append((
            s, str(d), len(wrows), sum(v for _, v in wrows), b,
        ))
    return sorted(emissions)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # chunk
            st.sampled_from(["A", "B"]),               # source
            st.integers(min_value=0, max_value=120),   # hour offset
            st.integers(min_value=0, max_value=9),     # value
        ),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=5, deadline=None)
def test_idle_watermark_matches_python_replay(spark, raw):
    rows = [(c, s, BASE + dt.timedelta(hours=h), float(v))
            for c, s, h, v in raw]
    df = spark.createDataFrame(
        rows, "c int, source string, ts timestamp, value double",
    ).select("source", "ts", "value", F.col("c").alias("__chunk"))
    from flink_kafka_table_api_spark.streaming.idle_watermark import (
        stream_idle_watermark,
    )
    out = stream_idle_watermark(
        spark, df, tempfile.mkdtemp(prefix="fkta_iwprop_"),
        n_chunks=3, delay="1 day",
    )
    got = sorted(
        (r.source, str(r.window_start)[:10], r.n_events, r.sum_value,
         r.batch_id)
        for r in out.collect()
    )
    assert got == _iw_reference(rows)


# ---------------------------------------------------------------------------
# watermark alignment: lateness + gating + deferral + two-condition emission
# ---------------------------------------------------------------------------

def _wa_reference(rows):
    """Pure-Python SIMULATION of stream_watermark_alignment (delay 1
    day, drift 1 day, 1-day windows, 3 chunks) — an independent
    implementation of the same state machine."""
    max_adm = {}
    deferred = []
    pending = {}
    fired = set()
    emissions = []
    for k in range(3):
        batch = [(s, ts, v) for c, s, ts, v in rows if c == k]
        if max_adm:
            wprev = min(max_adm.values()) - DAY
            batch = [(s, ts, v) for s, ts, v in batch if ts > wprev]
        avail = batch + deferred
        if max_adm:
            a_k = min(max_adm.values()) + DAY
            admitted = [(s, ts, v) for s, ts, v in avail if ts <= a_k]
            deferred = [(s, ts, v) for s, ts, v in avail if ts > a_k]
        else:
            admitted, deferred = avail, []
        for s, ts, v in admitted:
            if s not in max_adm or ts > max_adm[s]:
                max_adm[s] = ts
        for s, ts, v in admitted:
            key = (s, ts.date())
            n, sv = pending.get(key, (0, 0.0))
            pending[key] = (n + 1, sv + v)
        wk = min(max_adm.values()) - DAY if max_adm else None
        blocked = {(s, ts.date()) for s, ts, v in deferred}
        if wk is not None:
            for key in sorted(pending):
                s, d = key
                w_end = dt.datetime.combine(d, dt.time()) + DAY
                if w_end <= wk and key not in blocked:
                    n, sv = pending.pop(key)
                    emissions.append((s, str(d), n, sv, k))
    for s, ts, v in deferred:
        key = (s, ts.date())
        n, sv = pending.get(key, (0, 0.0))
        pending[key] = (n + 1, sv + v)
    for (s, d), (n, sv) in pending.items():
        emissions.append((s, str(d), n, sv, 3))
    return sorted(emissions)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # chunk
            st.sampled_from(["A", "B"]),               # source
            st.integers(min_value=0, max_value=120),   # hour offset
            st.integers(min_value=0, max_value=9),     # value
        ),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=5, deadline=None)
def test_watermark_alignment_matches_python_replay(spark, raw):
    rows = [(c, s, BASE + dt.timedelta(hours=h), float(v))
            for c, s, h, v in raw]
    df = spark.createDataFrame(
        rows, "c int, source string, ts timestamp, value double",
    ).select("source", "ts", "value", F.col("c").alias("__chunk"))
    from flink_kafka_table_api_spark.streaming.watermark_alignment import (
        stream_watermark_alignment,
    )
    out = stream_watermark_alignment(
        spark, df, tempfile.mkdtemp(prefix="fkta_waprop_"),
        n_chunks=3, delay="1 day", drift="1 day",
    )
    got = sorted(
        (r.source, str(r.window_start)[:10], r.n_events, r.sum_value,
         r.batch_id)
        for r in out.collect()
    )
    assert got == _wa_reference(rows)
