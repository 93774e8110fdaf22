"""Corpus retrieval operators: BM25 lexical ranking and reciprocal-rank
hybrid fusion with embedding cosine — the retrieval side of an LLM data
pipeline (hard-example mining, decontamination probes, RAG indexing all
rank documents against a query; the reference has no retrieval surface, so
this is EXT scope like the rest of the text/similarity family).

Scale shape: BM25 is one narrow scoring pass over the corpus — the corpus
statistics it needs (N, avgdl, per-term document frequencies) aggregate to
a SINGLE row that joins back by broadcast, so nothing shuffles except that
one-row exchange, and the top-k compiles to TakeOrderedAndProject. RRF
fusion ranks two score columns with window functions over the already-tiny
candidate union. At 100 TB: scoring streams over the scan partitions;
only k rows ever reach the driver.

Cross-engine exactness: the textbook BM25 idf = ln((N-df+0.5)/(df+0.5)+1)
would hinge on the engines' libm ``ln`` agreeing to the last ulp under
later multiplication; instead the idf here is the RATIONAL variant
(N - df + 0.5) / (df + 0.5) — the same monotone document-rarity weight
without a transcendental, so every operation in the score is IEEE
add/mul/div in pinned order and the doubles match DuckDB bit-for-bit
(the time_decay_score/bigram_lm_score precedent)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.text import tokens, tokens_sql
from flink_kafka_table_api_spark.parallelism import ensure_parallelism

BM25_K1 = 1.2
BM25_B = 0.75


def _term_tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == term))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    score(d) = sum over terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = (N - df_t + 0.5) / (df_t + 0.5)   (rational variant, see
    module doc). The sum runs in the fixed order of ``query_terms`` as one
    literal expression tree — no aggregation-order nondeterminism.

    Returns ``id_col`` + ``bm25`` (unrounded double; round at the edge).
    """
    df = ensure_parallelism(df)
    toked = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    per_doc = toked.select(
        F.col(id_col),
        F.size("__t").alias("__dl"),
        *[
            _term_tf(F.col("__t"), t).alias(f"__tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("__dl").cast("double") / avgdl)
    )
    total = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = (
            F.col("__n").cast("double") - F.col(f"__df{i}") + F.lit(0.5)
        ) / (F.col(f"__df{i}").cast("double") + F.lit(0.5))
        total = total + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    return scored.select(F.col(id_col), total.alias("bm25"))


def bm25_scores_sql(
    query_terms: list[str],
    *,
    src: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_scores`: same rational idf, same pinned
    term order, same left-to-right double accumulation."""
    toks = tokens_sql(text_expr)
    tf_cols = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    norm = f"({k1!r} * ((1.0 - {b!r}) + {b!r} * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n))))"
    total = "CAST(0.0 AS DOUBLE)"
    for i in range(len(query_terms)):
        idf = (
            f"((CAST(n AS DOUBLE) - df{i} + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        )
        total = (
            f"({total} + {idf} * (CAST(tf{i} AS DOUBLE) * {k1 + 1.0!r})"
            f" / (CAST(tf{i} AS DOUBLE) + {norm}))"
        )
    return f"""
    WITH toked AS (
      SELECT {id_col}, {toks} AS t FROM {src}
    ), per_doc AS (
      SELECT {id_col}, len(t) AS dl, {tf_cols} FROM toked
    ), stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sumdl, {df_cols} FROM per_doc
    )
    SELECT {id_col}, {total} AS bm25
    FROM per_doc CROSS JOIN stats
    """


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    *,
    id_col: str = "doc_id",
    lex_score: str = "bm25",
    vec_score: str = "cosine_sim",
    k: int = 60,
    topk: int = 10,
    depth: int = 100,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of a lexical and
    a vector ranking: rrf = 1/(k + rank_lex) + 1/(k + rank_vec) over the
    docs present in BOTH top-``depth`` candidate lists (inner join — the
    standard candidate-intersection form). Ranks are INTEGERS, so the
    fused score is two exact divisions and one add — deterministic across
    engines with no rounding escape hatch needed.

    Scale: each candidate list is ``orderBy().limit(depth)`` — Spark
    compiles that to TakeOrderedAndProject, a distributed per-partition
    top-``depth`` + driver merge, NEVER a global sort. The row_number
    window then runs over ``depth`` rows, not the corpus, so the
    single-partition window stage is O(depth) regardless of corpus size.
    """
    wl = Window.orderBy(F.col(lex_score).desc(), F.col(id_col).asc())
    wv = Window.orderBy(F.col(vec_score).desc(), F.col(id_col).asc())
    lr = (
        lexical.orderBy(F.col(lex_score).desc(), F.col(id_col).asc())
        .limit(depth)
        .select(F.col(id_col), F.row_number().over(wl).alias("lex_rank"))
    )
    vr = (
        vector.orderBy(F.col(vec_score).desc(), F.col(id_col).asc())
        .limit(depth)
        .select(F.col(id_col), F.row_number().over(wv).alias("vec_rank"))
    )
    fused = lr.join(vr, id_col).select(
        F.col(id_col),
        "lex_rank",
        "vec_rank",
        (
            F.lit(1.0) / (F.lit(k) + F.col("lex_rank"))
            + F.lit(1.0) / (F.lit(k) + F.col("vec_rank"))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(topk)
        .select(id_col, "lex_rank", "vec_rank", F.round("rrf", 9).alias("rrf"))
    )
