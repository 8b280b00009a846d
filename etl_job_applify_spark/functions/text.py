"""Text-analysis expressions: token stats, quality scoring, language ID,
document fingerprinting — all built-in functions (codegen'd), no UDFs.

Every expression here has an exact SQL twin runnable by the DuckDB oracle
(see queries/textops.py), which is why e.g. the fingerprint is a plain
polynomial rolling hash in modular arithmetic rather than xxhash64 —
engine-specific hashes can't be cross-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the heuristic n-gram/stopword
#: language identifier. Order matters: ties break toward the earlier key.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ein"),
    "es": ("el", "los", "de", "y", "una"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def n_tokens_expr(text_col: str) -> Column:
    return F.size(tokens(text_col))


def distinct_ratio_expr(text_col: str) -> Column:
    """|distinct tokens| / |tokens| — low values flag repetitive/spammy
    docs (a standard LLM-corpus quality signal)."""
    t = f"split({text_col}, ' ')"
    return F.expr(f"size(array_distinct({t})) / size({t})")


def avg_token_len_expr(text_col: str) -> Column:
    """Mean token length = (chars − spaces) / tokens, computed without
    exploding (pure length arithmetic)."""
    t = f"split({text_col}, ' ')"
    return F.expr(
        f"(length({text_col}) - size({t}) + 1) / size({t})"
    ).cast("double")


def stopword_hits_expr(text_col: str, words: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split({text_col}, ' '), t -> t IN ({in_list})))"
    )


def lang_id_expr(text_col: str) -> Column:
    """Heuristic language ID: argmax of stopword hits, 'und' when no list
    scores a hit. Deterministic tiebreak = dict order of STOPWORDS."""
    langs = list(STOPWORDS)
    hits = {l: stopword_hits_expr(text_col, STOPWORDS[l]) for l in langs}
    best = F.greatest(*[hits[l] for l in langs])
    out = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties → apply last
        out = F.when((hits[l] > 0) & (hits[l] == best), F.lit(l)).otherwise(out)
    return out


def quality_score_expr(text_col: str) -> Column:
    """Composite quality in [0,1]: length factor × lexical diversity.
    Division/least are exact-deterministic across engines."""
    nt = n_tokens_expr(text_col).cast("double")
    return F.least(nt / F.lit(100.0), F.lit(1.0)) * distinct_ratio_expr(text_col)


def rolling_hash_expr(text_col: str, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash of the whole text: fold acc→acc·base+code
    (mod p) over the character codes. Pure integer arithmetic → identical
    in any engine; used as the cross-checkable document fingerprint.

    Folds over ``split(text, '')`` (the char array) — O(n), unlike a
    substring-per-position fold which is O(n²) in string traversal.
    """
    return F.expr(
        f"aggregate(split({text_col}, ''), 0L,"
        f" (acc, ch) -> (acc * {base} + ascii(ch)) % {mod})"
    )


def min_shingle_fingerprint_expr(text_col: str, n: int = 3, mod: int = 1_000_000_007) -> Column:
    """Content-defined fingerprint: min rolling-hash over word n-grams —
    stable under small edits away from the minimizing shingle (the
    winnowing idea reduced to one fingerprint). Both the token array and
    each shingle string bind to lambda variables so tokenization happens
    once per row and each shingle is built once (projection collapse would
    otherwise inline the split per reference — O(n²))."""
    gram = ", ".join(f"tok[i + {j}]" for j in range(n))
    # documents shorter than n tokens have NO n-gram → NULL fingerprint
    # (matching with_shingles' empty-array convention and the SQL oracle);
    # without the guard the sequence(0, greatest(...)) fallback would hash
    # a partial shingle built from out-of-bounds NULL tokens
    return F.expr(
        f"transform(array(split({text_col}, ' ')), tok -> "
        f"CASE WHEN size(tok) >= {n} THEN "
        f"array_min(transform("
        f" transform(sequence(0, size(tok) - {n}),"
        f"           i -> concat_ws(' ', {gram})),"
        f" g -> aggregate(split(g, ''), 0L,"
        f"      (acc, ch) -> (acc * 31 + ascii(ch)) % {mod})))"
        f" END)[0]"
    )


def bpe_token_count_expr(text_col: str) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, and single
    other non-space characters — the shape GPT-style pre-tokenizers
    produce. `regexp_extract_all` with a char-class-only pattern behaves
    identically across regex engines (Java, RE2, PCRE)."""
    return F.expr(
        f"size(regexp_extract_all({text_col}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
    )


def normalize_text_expr(text_col: str) -> Column:
    """Canonical preprocessing: lowercase, collapse whitespace runs, trim.
    Applied before fingerprinting/shingling so formatting-only variants
    dedup together."""
    return F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    )


#: engine-portable PII patterns (valid in Java regex AND RE2/DuckDB —
#: character classes and bounded quantifiers only)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii_expr(text_col: str) -> Column:
    """Scrub emails and phone numbers (replaced with typed placeholders).
    Per-row regexp_replace — codegen'd, embarrassingly parallel."""
    return F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )


def repeated_ngram_shingles_expr(text_col: str, n: int = 5) -> str:
    """SQL text for the NON-distinct word-n-gram list of ``text_col``
    (token array bound as a lambda variable — see dedup/shingles.py on
    why an alias would re-tokenize per position). String, not Column, so
    callers can reuse it inside larger expressions."""
    gram = ", ".join(f"tok[i + {j}]" for j in range(n))
    return (
        f"flatten(transform(array(split({text_col}, ' ')), tok -> "
        f"CASE WHEN size(tok) >= {n} THEN "
        f"transform(sequence(0, size(tok) - {n}), i -> concat_ws(' ', {gram})) "
        "ELSE array() END))"
    )


def repetition_ratio_expr(text_col: str, n: int = 5) -> Column:
    """Share of repeated word-n-grams in the document (0 = no repetition,
    NULL for docs shorter than ``n`` tokens) — the Gopher/C4-style
    boilerplate signal. Pure array expressions: no explode, no shuffle."""
    sh = repeated_ngram_shingles_expr(text_col, n)
    return F.expr(
        f"CASE WHEN size({sh}) > 0 THEN "
        f"1.0D - CAST(size(array_distinct({sh})) AS DOUBLE)"
        f" / CAST(size({sh}) AS DOUBLE) END"
    )
