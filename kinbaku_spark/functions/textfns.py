"""Word n-gram shingling, defined once for both engines.

Tokenization is `\\s+` split of the trimmed text — Java regex (Spark) and
RE2 (DuckDB) agree on this class. Shingles are distinct word n-grams joined
with single spaces.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def gram_array(col: Column | str, n: int) -> Column:
    """POSITIONAL (non-distinct) word n-grams as an array column — element
    i is the gram starting at token i. The single tokenization + gram
    construction both engines' n-gram operators build on: shingle_array
    wraps it with array_distinct; span_postings (operators/dedup.py)
    posexplodes it for offsets. One definition so a tokenization change
    cannot desynchronize the pair-detection and removal halves.

    Built by zipping n shifted slices of the word array (n slice calls
    total) instead of transform(sequence, slice) (one slice per gram) —
    measured ~3x faster at sf0.1 with identical output.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    length = F.size(words)
    m = length - (n - 1)
    grams = F.slice(words, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(words, j + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    # guard: texts shorter than n words produce an empty array
    return F.when(length >= n, grams).otherwise(F.array().cast("array<string>"))


def shingle_array(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as an array column (Spark side)."""
    return F.array_distinct(gram_array(col, n))


SQL_WORDS = "string_split_regex(trim({expr}), '\\s+')"


def sql_shingle_array(words_col: str = "words", n: int = 3) -> str:
    """The same distinct word n-grams in DuckDB SQL, over a pre-split list
    column (1-based list indexing). Pair with a CTE like
    ``SELECT doc_id, string_split_regex(trim(text),'\\s+') AS words ...``.
    """
    parts = " || ' ' || ".join(f"{words_col}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({words_col}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({words_col}) - {n - 1}), "
        f"i -> {parts})) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )
