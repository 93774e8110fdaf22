"""Python UDTFs (user-defined TABLE functions, Spark 4.x API) — the
row-to-rows escape hatch the reference's runtime exposes as Flink
TableFunctions but its pipeline never uses (SURVEY.md §2.2 'UDF/UDAF/UDTF').

UDTFs run row-at-a-time in Python — the SLOW path. Use only when the
fan-out logic genuinely needs imperative Python (stateful parsers,
third-party libraries); for anything expressible as array algebra, prefer
explode/posexplode over built-in expressions (see queries.posexplode_tokens
for the fast twin of exactly this operation)."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string")
class SplitSentences:
    """One output row per '. '-delimited sentence, with its ordinal among
    the non-empty sentences."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        parts = [p for p in text.split(". ") if p]
        for i, p in enumerate(parts):
            yield i, p


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs in the session catalog."""
    spark.udtf.register("split_sentences", SplitSentences)
