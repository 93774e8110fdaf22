"""Row-pattern matching over ordered event sequences — SQL:2016
MATCH_RECOGNIZE, the Flink SQL / FlinkCEP surface (built round 8,
registration-bound for a round-9/10 gate slot).

Flink SQL ships MATCH_RECOGNIZE as its complex-event-processing
surface (public Table API/SQL docs; the reference repo's pipeline has
no CEP, so this is EXT scope like the rest of the capability matrix):
PARTITION BY key ORDER BY time, PATTERN (A B+ C) with regex
quantifiers, DEFINE per-variable predicates, ONE ROW PER MATCH with
aggregated MEASURES, AFTER MATCH SKIP PAST LAST ROW. Spark has no
equivalent operator; this is the (b)-tier custom operator the build
plan prescribes — a composition of DataFrame algebra plus ONE
Arrow-batched pandas UDF for the part Spark genuinely lacks (the
regex-NFA scan), never row-at-a-time Python.

The classify -> per-key string -> regex plan:

  1. CLASSIFY every row to a pattern variable (CASE chain over the
     DEFINE predicates, first match wins, '.' otherwise) — JVM-side;
  2. SEQUENCE per key: row_number over (key, order), then ONE keyed
     shuffle builds each key's ordered symbol string
     (array_sort(collect_list(struct(rn, char))) -> concat — all
     JVM-side; a key's history must fit an executor, the same
     contract sessionize / event_paths already carry);
  3. SCAN: the PATTERN clause compiles to a char regex ("A B+ C" ->
     /AB+C/); ONE pandas UDF runs re.finditer per key-string — greedy
     quantifiers + a non-overlapping left-to-right scan are EXACTLY
     the SQL:2016 defaults (greedy, AFTER MATCH SKIP PAST LAST ROW);
  4. MEASURES: match spans explode to (key, match_seq, rn-range), a
     keyed range join pulls the matched rows back, one hash aggregate
     evaluates the measures (with `__symbol` available per row).

Restriction vs the full standard (stated, not hidden): DEFINE
predicates are row-local (no LAST(A.price)-style references to other
matched rows) and a row belongs to ONE variable (first predicate
wins). That covers the funnel/alert/journey patterns MATCH_RECOGNIZE
is used for; correlated defines would need a true NFA with
backtracking state per partial match.

At 100 TB: one keyed shuffle (the string build), one Arrow batch pass
over O(distinct keys) strings, one keyed equi-join with an rn-range
residual, one aggregate. Nothing driver-side, nothing O(corpus^2);
skewed keys cost what their history costs, same as any sessionizer.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_TOKEN = re.compile(r"^([A-Za-z_]\w*)([?+*]|\{\d+(,\d*)?\})?$")


def compile_pattern(pattern: str, names: list[str]) -> str:
    """Translate a PATTERN clause ("A B+ C?") into a char regex over
    the classification alphabet. Quantifiers: ? + * {m} {m,} {m,n}."""
    out = []
    for tok in pattern.split():
        m = _TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad pattern token: {tok!r}")
        name, quant = m.group(1), m.group(2) or ""
        if name not in names:
            raise ValueError(
                f"pattern variable {name!r} not in DEFINE list {names}"
            )
        out.append(_CHARS[names.index(name)] + quant)
    rx = "".join(out)
    if re.fullmatch(rx, ""):
        raise ValueError(f"pattern {pattern!r} can match zero rows")
    return rx


def tail_extensible(pattern: str) -> bool:
    """True iff a COMPLETE match of `pattern` could still absorb more
    rows (the last token carries an open quantifier: ? + * or {m,}).
    The streaming scanner uses this to decide whether a match ending
    exactly at the frozen boundary is final (fixed tail — the match
    cannot grow) or must stay pending (open tail — a future row could
    extend it)."""
    last = pattern.split()[-1]
    m = _TOKEN.match(last)
    if not m:
        raise ValueError(f"bad pattern token: {last!r}")
    quant = m.group(2) or ""
    return quant in ("?", "+", "*") or quant.endswith(",}")


def match_recognize(
    df: DataFrame,
    *,
    key_col: str,
    order_cols: Iterable[str],
    define: list[tuple[str, Column]],
    pattern: str,
    measures: dict[str, Column],
) -> DataFrame:
    """MATCH_RECOGNIZE over `df`: PARTITION BY `key_col` ORDER BY
    `order_cols`, DEFINE = [(variable, row-local predicate)] evaluated
    first-match-wins, PATTERN = `pattern` (variables with ?/+/*/{m,n}
    quantifiers, greedy, non-overlapping — the SQL:2016 defaults),
    ONE ROW PER MATCH with `measures` = {out_col: aggregate Column}
    evaluated over the matched rows (every input column plus
    `__symbol`, the matched variable name, is in scope). Returns
    (key_col, match_seq, *measures) — match_seq numbers a key's
    matches in sequence order."""
    import pandas as pd  # noqa: F401  (pandas_udf return type)

    names = [n for n, _ in define]
    if len(names) > len(_CHARS):
        raise ValueError(f"at most {len(_CHARS)} pattern variables")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate pattern variables in {names}")
    regex = compile_pattern(pattern, names)

    expr_sym, expr_ch = None, None
    for i, (name, pred) in enumerate(define):
        expr_sym = (
            F.when(pred, name) if expr_sym is None
            else expr_sym.when(pred, name)
        )
        expr_ch = (
            F.when(pred, _CHARS[i]) if expr_ch is None
            else expr_ch.when(pred, _CHARS[i])
        )
    sym = expr_sym.otherwise(F.lit(None))
    ch = expr_ch.otherwise(".")

    order = list(order_cols)
    w = Window.partitionBy(key_col).orderBy(*order)
    rows = df.select(
        "*", sym.alias("__symbol"), ch.alias("__ch"),
        F.row_number().over(w).alias("__rn"),
    )

    seqs = rows.groupBy(key_col).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__ch"))),
                lambda x: x["__ch"],
            ),
        ).alias("__seq")
    )

    @F.pandas_udf("array<struct<s: int, e: int>>")
    def find_spans(seq):
        rx = re.compile(regex)
        return seq.map(
            lambda s: [
                {"s": m.start(), "e": m.end()} for m in rx.finditer(s or "")
            ]
        )

    spans = (
        seqs.select(key_col, F.posexplode(find_spans("__seq")))
        .select(
            F.col(key_col).alias("__mk"),
            (F.col("pos") + 1).cast("int").alias("match_seq"),
            (F.col("col.s") + 1).alias("__lo"),  # rn is 1-based
            F.col("col.e").alias("__hi"),
        )
    )

    matched = rows.join(
        spans,
        (rows[key_col] == spans["__mk"])
        & (rows["__rn"] >= spans["__lo"])
        & (rows["__rn"] <= spans["__hi"]),
        "inner",
    )
    return (
        matched.groupBy(key_col, "match_seq")
        .agg(*[c.alias(n) for n, c in measures.items()])
    )


__all__ = ["match_recognize", "compile_pattern"]
