"""Shared pure-Python reference replays for the staged round-8 operators.

Single source of truth for the semantics the Spark operators and DuckDB
oracles are pinned against — imported by BOTH tests/test_r8_prevalidated.py
(fixed fixtures + testdata parity) and tests/test_properties.py
(hypothesis-randomized inputs), so a future semantic tweak cannot leave one
suite pinning stale behavior (review finding)."""

from __future__ import annotations

import math
import re
from collections import Counter


def tokenize(text: str) -> list[str]:
    """The repo's portable tokenization: lowercase, split on whitespace
    runs, empties removed."""
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def py_dup_coverage(text: str, n: int):
    """Reference for operators/text.py dup_ngram_coverage: returns
    (n_tokens, n_grams, dup_grams, dup_gram_occurrences, covered_tokens,
    dup_token_frac, dup_char_frac)."""
    toks = tokenize(text)
    grams = (
        [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n else []
    )
    c = Counter(grams)
    dup = {g for g, k in c.items() if k > 1}
    flags = [g in dup for g in grams]
    cov: set[int] = set()
    for i, f in enumerate(flags):
        if f:
            cov.update(range(i, i + n))
    cc = sum(len(toks[i]) for i in cov)
    tc = sum(len(t) for t in toks)
    return (
        len(toks), len(grams), len(dup), sum(flags), len(cov),
        round(len(cov) / len(toks), 6) if toks else 0.0,
        round(cc / tc, 6) if tc else 0.0,
    )


def py_lpa(edges, iterations: int):
    """Reference for operators/graph.py label_propagation over a
    symmetric edge list: sorted (node, label) pairs after ``iterations``
    synchronous rounds with the min-label tie-break."""
    nodes = sorted({s for s, _ in edges})
    lab = {v: v for v in nodes}
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(d, []).append(s)
    for _ in range(iterations):
        new = {}
        for v in nodes:
            c = Counter(lab[u] for u in adj[v])
            m = max(c.values())
            new[v] = min(lb for lb, k in c.items() if k == m)
        lab = new
    return sorted(lab.items())


def py_source_kl(rows):
    """Reference for operators/curation.py source_kl_divergence:
    ``rows`` = [(doc_id, text, source)]; returns
    {source: (n_tokens, distinct_tokens, kl_divergence)} for sources
    with >= 1 token, accumulated in ascending-token order (the
    operator's pinned fold)."""
    cs: Counter = Counter()
    for _, t, s in rows:
        for w in tokenize(t):
            cs[(s, w)] += 1
    ct: Counter = Counter()
    ns: Counter = Counter()
    for (s, w), c in cs.items():
        ct[w] += c
        ns[s] += c
    n = sum(cs.values())
    out = {}
    for s in ns:
        toks = sorted(w for (s2, w) in cs if s2 == s)
        kl = 0.0
        for w in toks:  # ascending-token order, the operator's fold
            kl += (cs[(s, w)] / ns[s]) * math.log(
                (cs[(s, w)] * n) / (ct[w] * ns[s])
            )
        out[s] = (ns[s], len(toks), round(kl, 6))
    return out


def py_nb_scores(rows):
    """Reference for operators/classify.py nb_scores (in-corpus):
    ``rows`` = [(doc_id, text, label)]; returns
    {(doc_id, label): (n_tokens, score)} over every observed label, the
    per-document sum in token-position order (the operator's pinned
    fold)."""
    ct: Counter = Counter()
    tot: Counter = Counter()
    nd: Counter = Counter()
    docs = []
    for i, t, y in rows:
        toks = tokenize(t)
        docs.append((i, toks))
        nd[y] += 1
        for w in toks:
            ct[(y, w)] += 1
            tot[y] += 1
    vocab = {w for (_, w) in ct}
    v = len(vocab)
    n = len(rows)
    out = {}
    for i, toks in docs:
        for y in nd:
            s = math.log(nd[y] / n)
            for w in toks:  # position order == document order
                s += math.log((ct.get((y, w), 0) + 1) / (tot[y] + v))
            out[(i, y)] = (len(toks), round(s, 6))
    return out
