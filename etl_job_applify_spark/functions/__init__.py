from .vectors import cosine_expr, dot_expr, norm_expr, with_norm
from .text import (
    STOPWORDS,
    avg_token_len_expr,
    lang_id_expr,
    n_tokens_expr,
    distinct_ratio_expr,
    quality_score_expr,
    rolling_hash_expr,
)

__all__ = [
    "cosine_expr",
    "dot_expr",
    "norm_expr",
    "with_norm",
    "STOPWORDS",
    "avg_token_len_expr",
    "lang_id_expr",
    "n_tokens_expr",
    "distinct_ratio_expr",
    "quality_score_expr",
    "rolling_hash_expr",
]
