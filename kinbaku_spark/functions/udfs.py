"""User code extension points: Arrow-vectorized Pandas UDF and Python UDTF.

The reference's only code-extension hook is a pluggable scalar hash
(graph.py:82-90) plus dataclass schemas. Here the engine exposes Spark's
real extension surface — and the rest of this repo deliberately AVOIDS
Python in hot paths (built-in functions are 10-100x faster); these exist to
prove the path and to carry genuinely-custom logic.

Both emit integer/string outputs only, so the DuckDB oracle matches exactly
(no float accumulation to drift).

Pickle note: the function/class bodies are defined INSIDE factories, never
at module level. cloudpickle serializes module-level callables by reference
(module + qualname), which makes Spark python workers try to import
`kinbaku_spark` — and fail when the driver process isn't rooted in this
repo (the driver harness runs from its own cwd). Factory-local definitions
have non-resolvable qualnames and are serialized by value.
"""

from __future__ import annotations


def make_ws_token_count():
    """Arrow-batched whitespace token counter (one Python call per Arrow
    batch, not per row). Python str.split() drops empty pieces, so the SQL
    twin is len(list_filter(string_split_regex(x, '\\s+'), p -> p <> ''))."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    # DataType object (not a DDL string): string return types are parsed
    # against an active session, and callers may build this before one exists
    @pandas_udf(IntegerType())
    def ws_token_count(texts):
        return texts.map(
            lambda t: 0 if t is None else len(t.split()), na_action=None
        ).astype("int32")

    return ws_token_count


def make_sentence_split_udtf():
    """Python UDTF (PySpark 4): explode text into (sent_idx, sentence,
    n_tokens) rows — a 1->N generator with per-document state, shown through
    the UDTF surface so user row-generators have a first-class path."""
    from pyspark.sql.functions import udtf

    class SentenceSplit:
        def eval(self, doc_id: int, text: str):  # noqa: A002
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                # explicit charset: DuckDB trim(x, chars) strips exactly
                # these, while Python's bare strip() also eats unicode ws
                s = raw.strip(" \t\n\r")
                if s:
                    yield doc_id, idx, s, len(s.split())
                    idx += 1

    return udtf(
        SentenceSplit,
        returnType="doc_id bigint, sent_idx int, sentence string, n_tokens int",
    )


def register_udfs(spark) -> None:
    """Register both under stable SQL names (idempotent)."""
    spark.udf.register("ws_token_count", make_ws_token_count())
    spark.udtf.register("sentence_split", make_sentence_split_udtf())


__all__ = ["make_ws_token_count", "make_sentence_split_udtf", "register_udfs"]
