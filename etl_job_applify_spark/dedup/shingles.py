"""Tokenization + word-shingle construction, all JVM-side.

Everything here is built-in array/higher-order functions — no Python UDFs —
so shingling stays inside whole-stage codegen and scales linearly with the
corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens (the corpus is space-separated; swap the pattern
    for a unicode-aware one on real text)."""
    return F.split(F.col(text_col), " ")


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_col(text_col))


def shingles_expr(tokens_col_name: str = "tokens", n: int = 3) -> Column:
    """Distinct word n-grams via transform over an index sequence —
    executes in codegen, no UDF. Documents shorter than ``n`` tokens yield
    an empty array (not null)."""
    idx = f"sequence(0, size({tokens_col_name}) - {n})"
    gram = " , ".join(f"{tokens_col_name}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_col_name}) >= {n} THEN "
        f"array_distinct(transform({idx}, i -> concat_ws(' ', {gram}))) "
        f"ELSE array() END"
    )


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out: str = "shingles",
) -> DataFrame:
    """Add a distinct word-``n``-gram array column derived from
    ``text_col``.

    The token array is bound as a LAMBDA VARIABLE (``transform(array(...),
    tok -> ...)``), not a projected alias: Catalyst's projection collapse
    inlines aliases into every reference, which would re-tokenize the
    document once per shingle position (O(n²) retokenization — measured
    ~10× slowdown on the shingle pipeline). A lambda binding evaluates
    split() exactly once per row and cannot be inlined away.
    """
    gram = " , ".join(f"tok[i + {j}]" for j in range(n))
    expr = (
        f"flatten(transform(array(split({text_col}, ' ')), tok -> "
        f"CASE WHEN size(tok) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(tok) - {n}),"
        f" i -> concat_ws(' ', {gram}))) "
        f"ELSE array() END))"
    )
    return df.withColumn(out, F.expr(expr))


def with_hashed_shingles(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out: str = "shingles",
) -> DataFrame:
    """Distinct word-``n``-gram KEYS as 64-bit hashes, without ever
    materializing the n-gram strings: each token is xxhash64'd once,
    then every window of ``n`` consecutive token hashes is combined
    with one variadic ``xxhash64(h_i, …, h_{i+n-1})``.

    Key equivalence with hashing the ``concat_ws(' ', …)`` string
    (``with_shingles`` + ``xxhash64``): tokens come from
    ``split(text, ' ')`` so they cannot contain the separator, hence
    two windows concat-equal iff they are token-wise equal iff their
    token-hash tuples are equal — the same equivalence classes, up to
    64-bit collisions, which is exactly the approximation the
    string-hash join already makes (jaccard.py round-1 note). What it
    saves, per window: the n-gram string allocation, hashing each
    token's bytes n times instead of once, and ``array_distinct`` over
    strings instead of longs — the compute that dominated the q31/q147
    shingle stage (round-16 profile: 8.3 s / 6.5 s of task time in one
    map stage each).

    Use where the shingle is only ever a JOIN/GROUP key. Callers that
    need the shingle TEXT (inspection, index payloads) keep
    ``with_shingles``. Same lambda-binding idiom as ``with_shingles``
    (see its docstring) so tokenization+token-hashing run once per row.
    Documents shorter than ``n`` tokens yield an empty array."""
    gram = ", ".join(f"hs[i + {j}]" for j in range(n))
    expr = (
        f"flatten(transform(array(transform(split({text_col}, ' '),"
        f" t -> xxhash64(t))), hs -> "
        f"CASE WHEN size(hs) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(hs) - {n}),"
        f" i -> xxhash64({gram}))) "
        f"ELSE array() END))"
    )
    return df.withColumn(out, F.expr(expr))
