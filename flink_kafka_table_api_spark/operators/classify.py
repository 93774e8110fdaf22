"""Supervised text classification: multinomial Naive Bayes trained and
scored entirely in DataFrame algebra (EXT scope; the reference repo has no
classifier surface). This is the engine's model-based-filtering primitive —
the role fasttext-style linear classifiers play in CCNet/RedPajama-class
curation stacks (language routing, quality scoring against a labeled seed
corpus) — expressed as the one classical model whose training is PURE
COUNTING and therefore integer-exact and embarrassingly distributable:

    logp(t | l) = ln( (count(t, l) + 1) / (total_tokens(l) + V) )
    score(d, l) = ln(docs(l) / n_docs) + sum over token positions of
                  logp(token_pos | l)

with add-one (Laplace) smoothing fixed at 1 so every ln argument is a
single division of exact integers (correctly rounded in both engines — the
tf_idf/pmi recipe). The per-document sum is an ascending-POSITION ordered
fold (the bigram_lm_score recipe), so Spark's F.aggregate over a sorted
collect_list and DuckDB's ORDER BY pos list_reduce perform the identical
IEEE add sequence, and the driver hash-compare holds bit-for-bit.

Scale shape: training is two keyed partial-agg shuffles (token counts per
(label, token); label totals) plus two tiny aggregates (vocab size, doc
priors). The (label x vocab) log-probability grid — the model — is
vocab-sized times a handful of labels, broadcast to the scoring join.
Scoring is one explode + one broadcast join + one (doc, label)-keyed fold
aggregate; the corpus is never shuffled on anything but its own id. At
100 TB the model grid is the only globally-shared state and it is
O(vocab x labels), exactly what you'd ship to executors.

Two entry points: :func:`nb_scores` trains and scores the SAME frame
(the in-corpus log-likelihood audit: "which label does each document's
text actually support" — the disagreement rows are the
mislabel/contamination candidates; the dense in-corpus contract keeps
its DuckDB oracle exact), and :func:`nb_score_heldout` scores a second
frame against the trained model with an explicit OOV contract (the
production train/serve split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kafka_table_api_spark.operators.text import tokens, tokens_sql
from flink_kafka_table_api_spark.parallelism import ensure_parallelism


def nb_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    *,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-(document, label) Naive Bayes log-posterior over every label
    observed in ``label_col``. Returns (doc_id, label, n_tokens, score)
    with score rounded to 6 decimals; one row per document per label
    (the row SET is integer-decided — float values never move
    membership, the pmi_collocations rule). Empty documents score the
    bare class prior.

    NULL-label caveat: a NULL in ``label_col`` is carried as a class row
    (its prior counts its documents), but the null-rejecting equi-joins
    on label zero its token model in BOTH engines identically — every
    document scores exactly the NULL class's bare prior, and NULL-labeled
    documents' tokens train nothing. That is the engine-pinned behavior
    (tests/test_r8_prevalidated.py), NOT a statistically meaningful
    class; filter or impute NULL labels upstream if they should
    participate.

    ``broadcast_model`` forces the (label x vocab) grid to the scoring
    join's build side — right for the usual quality/language-classifier
    vocabularies (<= a few million hashed features). At extreme
    vocabularies (grid too big for executor memory) pass False: the
    scoring join becomes a token-keyed shuffle join and AQE picks the
    strategy from actual sizes. Results identical either way."""
    from flink_kafka_table_api_spark.caching import tracked_persist

    df = ensure_parallelism(df)
    base = tracked_persist(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("__y"),
            tokens(text_col).alias("__toks"),
        )
    )
    # feeds the count model AND the scoring join (plus two .count()
    # actions) — persist, or the tokenization replays per consumer
    pos = tracked_persist(
        base.select(
            "doc_id", "__y", F.posexplode("__toks").alias("__p", "__t")
        )
    )
    # --- model: counts only ---------------------------------------------
    ct = pos.groupBy("__y", "__t").agg(F.count("*").alias("__c"))
    tot = ct.groupBy("__y").agg(F.sum("__c").alias("__tot"))
    vocab = ct.select("__t").distinct()
    v_size = vocab.count()  # exact int; the model is driver-visible anyway
    n_docs = base.count()
    priors = (
        base.groupBy("__y")
        .agg(F.count("*").alias("__nd"))
        .select(
            "__y",
            F.log(
                F.col("__nd").cast("double") / F.lit(float(n_docs))
            ).alias("__prior"),
        )
    )
    # dense (label x vocab) grid so in-corpus scoring never misses a key
    grid = (
        vocab.crossJoin(tot)
        .join(ct, ["__y", "__t"], "left")
        .select(
            "__y",
            "__t",
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(1)).cast(
                    "double"
                )
                / (F.col("__tot") + F.lit(v_size)).cast("double")
            ).alias("__lp"),
        )
    )
    # --- scoring: explode + broadcast model join + ordered fold ----------
    if broadcast_model:
        grid = F.broadcast(grid)
    terms = pos.join(grid, "__t").select(
        "doc_id",
        grid["__y"].alias("label"),
        "__p",
        "__lp",
    )
    folded = terms.groupBy("doc_id", "label").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("__p", "__lp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__lp"],
        ).alias("__s")
    )
    every = base.select(
        "doc_id", F.size("__toks").cast("long").alias("__nt")
    ).crossJoin(F.broadcast(priors.select(F.col("__y").alias("label"), "__prior")))
    return (
        every.join(folded, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            F.col("__nt").alias("n_tokens"),
            F.round(
                F.col("__prior") + F.coalesce(F.col("__s"), F.lit(0.0)), 6
            ).alias("score"),
        )
    )


def nb_scores_sql(
    id_expr: str = "doc_id",
    text_expr: str = "text",
    label_expr: str = "lang",
) -> str:
    """DuckDB replay of :func:`nb_scores` over `documents`: identical
    counts, identical ln arguments (single divisions of exact integers),
    identical ascending-position fold (list_reduce's first-element seed
    equals the 0.0-seeded fold since 0.0 + x == x)."""
    toks = tokens_sql(text_expr)
    return f"""
    WITH base AS (
      SELECT {id_expr} AS doc_id, {label_expr} AS y, {toks} AS toks
      FROM documents
    ),
    pos AS (
      SELECT b.doc_id, b.y, u.i - 1 AS p, b.toks[u.i] AS t
      FROM base b, unnest(generate_series(1, len(b.toks))) AS u(i)
    ),
    ct AS (SELECT y, t, COUNT(*) AS c FROM pos GROUP BY y, t),
    tot AS (SELECT y, SUM(c) AS tot FROM ct GROUP BY y),
    vocab AS (SELECT DISTINCT t FROM ct),
    vs AS (SELECT COUNT(*) AS v FROM vocab),
    nd AS (SELECT COUNT(*) AS n FROM base),
    priors AS (
      SELECT y, ln(CAST(COUNT(*) AS DOUBLE) / nd.n) AS prior
      FROM base, nd GROUP BY y, nd.n
    ),
    grid AS (
      SELECT tot.y, vocab.t,
             ln(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                / CAST(tot.tot + vs.v AS DOUBLE)) AS lp
      FROM vocab CROSS JOIN tot CROSS JOIN vs
      LEFT JOIN ct ON ct.y = tot.y AND ct.t = vocab.t
    ),
    folded AS (
      SELECT pos.doc_id, grid.y AS label,
             list_reduce(list(grid.lp ORDER BY pos.p), (a, b) -> a + b)
               AS s
      FROM pos JOIN grid ON pos.t = grid.t
      GROUP BY pos.doc_id, grid.y
    ),
    every AS (
      SELECT b.doc_id, len(b.toks) AS nt, p.y AS label, p.prior
      FROM base b CROSS JOIN priors p
    )
    SELECT e.doc_id, e.label,
           CAST(e.nt AS BIGINT) AS n_tokens,
           round(e.prior + COALESCE(f.s, 0.0), 6) AS score
    FROM every e
    LEFT JOIN folded f ON e.doc_id = f.doc_id AND e.label = f.label
    """


def nb_score_heldout(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    *,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score a HELD-OUT frame against a model trained on ``train`` —
    the production train/serve split.
    Returns (doc_id, label, n_tokens, oov_tokens, score) with one row
    per score-side document per TRAINING label; score rounded to 6.
    ``broadcast_model``: see :func:`nb_scores`.

    OOV contract (the part in-corpus scoring never exercises): a token
    absent from the training vocabulary contributes the standard Laplace
    unseen-token term ln(1 / (total_tokens(l) + V)) — exactly the
    smoothed probability a count-0 in-vocabulary token gets, with V
    frozen at the TRAINING vocabulary size (extending V per query
    document would make scores incomparable across documents).
    ``oov_tokens`` rides along so callers can threshold confidence on
    how much of a document the model had never seen.

    Scale shape: the model grid and the per-label fallback row both
    broadcast; the score corpus is exploded once, fanned by n_labels,
    and folded keyed by (doc, label) in ascending position order — the
    same exchanges as in-corpus scoring, with the train side read only
    to build the O(vocab x labels) model."""
    from flink_kafka_table_api_spark.caching import tracked_persist

    train = ensure_parallelism(train)
    score = ensure_parallelism(score)
    tb = train.select(
        F.col(label_col).alias("__y"), tokens(text_col).alias("__toks")
    )
    tpos = tracked_persist(
        tb.select("__y", F.explode("__toks").alias("__t"))
    )
    ct = tpos.groupBy("__y", "__t").agg(F.count("*").alias("__c"))
    vocab = ct.select("__t").distinct()
    v_size = vocab.count()
    n_docs = tb.count()
    priors = (
        tb.groupBy("__y")
        .agg(F.count("*").alias("__nd"))
        .select(
            "__y",
            F.log(
                F.col("__nd").cast("double") / F.lit(float(n_docs))
            ).alias("__prior"),
        )
    )
    # label totals over the FULL label set (priors' labels), zero-token
    # labels coalesced to 0 — deriving totals from ct alone drops a label
    # whose every training document is empty, which would silently zero
    # its whole token model (the review-found fallback gap)
    tot = priors.select("__y").join(
        ct.groupBy("__y").agg(F.sum("__c").alias("__tot")), "__y", "left"
    ).select("__y", F.coalesce(F.col("__tot"), F.lit(0)).alias("__tot"))
    grid = (
        vocab.crossJoin(tot)
        .join(ct, ["__y", "__t"], "left")
        .select(
            "__y",
            "__t",
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(1)).cast(
                    "double"
                )
                / (F.col("__tot") + F.lit(v_size)).cast("double")
            ).alias("__lp"),
        )
    )
    # per-label OOV fallback: ln(1 / (tot_l + V)) as a broadcast row set
    fallback = tot.select(
        "__y",
        F.log(
            F.lit(1.0) / (F.col("__tot") + F.lit(v_size)).cast("double")
        ).alias("__oov_lp"),
    )
    sb = tracked_persist(
        score.select(F.col(id_col).alias("doc_id"),
                     tokens(text_col).alias("__toks"))
    )
    spos = sb.select(
        "doc_id", F.posexplode("__toks").alias("__p", "__t")
    )
    # fan by label FIRST (so an OOV token still yields one row per
    # label), then resolve each (label, token) against the broadcast
    # grid with the fallback as the miss value
    fanned = spos.crossJoin(
        F.broadcast(fallback.select(F.col("__y").alias("label"), "__oov_lp"))
    )
    resolved = grid.withColumnsRenamed({"__y": "label"})
    if broadcast_model:
        resolved = F.broadcast(resolved)
    terms = fanned.join(
        resolved,
        ["label", "__t"],
        "left",
    ).select(
        "doc_id",
        "label",
        "__p",
        F.coalesce(F.col("__lp"), F.col("__oov_lp")).alias("__term"),
        F.col("__lp").isNull().cast("long").alias("__oov"),
    )
    folded = terms.groupBy("doc_id", "label").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("__p", "__term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__term"],
        ).alias("__s"),
        F.sum("__oov").alias("__noov"),
    )
    every = sb.select(
        "doc_id", F.size("__toks").cast("long").alias("__nt")
    ).crossJoin(
        F.broadcast(priors.select(F.col("__y").alias("label"), "__prior"))
    )
    return every.join(folded, ["doc_id", "label"], "left").select(
        "doc_id",
        "label",
        F.col("__nt").alias("n_tokens"),
        F.coalesce(F.col("__noov"), F.lit(0)).cast("long").alias(
            "oov_tokens"
        ),
        F.round(
            F.col("__prior") + F.coalesce(F.col("__s"), F.lit(0.0)), 6
        ).alias("score"),
    )
