"""Distributed subword tokenizer training (q203).

q203 learns a byte-pair-encoding merge table (Sennrich et al., ACL'16 —
the tokenizer-training step of every modern LLM data pipeline) as pure
dataflow: the corpus folds to a (word, freq) vocabulary once, each word
explodes to a (wid, pos, sym) character sequence, and every merge round
is (a) one weighted pair count, (b) one O(1) argmax for the best pair,
(c) a RELATIONAL merge application. No regex replacement is involved —
cross-engine regex semantics (lookarounds, overlap handling) are not
portable, so left-to-right greedy pair merging is expressed with window
functions only:

- ``match``   — (sym, next_sym) equals the round's best pair;
- overlapping matches can occur ONLY when the pair is a doubled symbol
  (match at i and i+1 both require sym_{i+1} = s1 = s2), and greedy
  left-to-right semantics merge the 1st, 3rd, 5th... match of each
  consecutive run: runs are identified gaps-and-islands style
  (``pos - running_match_count`` is constant within a run, increases on
  every non-match) and parity within the run picks the winners;
- a merged position keeps ``s1 || s2``; the consumed follower drops via
  ``lag(do_merge)``; positions renumber with ``row_number``.

Iteration count (6 merge rounds) IS the contract, mirrored by the
unrolled MATERIALIZED-CTE oracle — the q126/q193/q197 discipline.
Output = the learned merge table plus the weighted corpus token count
after each merge (exact integers end to end, so the gate pins every
round's decision, not just the final state).

Scale: this is the VOCABULARY-level BPE formulation — all per-round
work is over distinct words weighted by frequency, orders of magnitude
smaller than the corpus (the corpus is touched exactly once, by the
word count). Window chains partition by word (millions of tiny
independent partitions — embarrassingly parallel), the pair count is
one shuffle on the pair key, and the argmax is TakeOrderedAndProject.
Each round's sequence relation is localCheckpoint-materialized: it
feeds the next round's windows AND the token-count audit, and peeling
lineage per round keeps the 6-round chain from re-deriving prefixes
(the q60 components discipline).

Reference scope: the reference has no analytics surface
(services/post_processing.py:5-8 is a stub); this extends the
north-star text-analysis category (token counting existed as q42/q62;
q203 adds learning the tokenizer itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import tbl
from ..transform.subword import bpe_merge_round as _merge_round  # noqa: F401 (kernel home: transform/subword.py)

_ROUNDS = 6


def _learn_merges(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Run the 6 merge rounds on the documents fixture; the kernel lives
    in transform/subword.py (learn_bpe) so pipelines can train
    tokenizers on arbitrary corpora — this wrapper just binds the
    fixture table and the round contract."""
    from ..transform.subword import learn_bpe

    return learn_bpe(
        tbl(spark, sf_dir, "documents"), rounds=_ROUNDS, min_word_len=2
    )


def q203_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _learn_merges(spark, sf_dir)
    return local_relation(spark, 
        merges,
        "merge_round int, s1 string, s2 string, pair_count bigint,"
        " corpus_tokens_after bigint",
    )


def _bpe_sql(rounds: int = _ROUNDS) -> str:
    base = """
WITH w0 AS MATERIALIZED (
  SELECT word AS wid, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2
  GROUP BY 1
),
s1 AS MATERIALIZED (
  SELECT wid, f, CAST(i AS BIGINT) AS pos, substr(wid, CAST(i AS INT), 1) AS sym
  FROM w0, unnest(range(1, length(wid) + 1)) AS u(i)
)"""
    parts = []
    for r in range(1, rounds + 1):
        parts.append(f"""
p{r} AS MATERIALIZED (
  SELECT sym, nxt, CAST(SUM(f) AS BIGINT) AS cnt
  FROM (SELECT f, sym,
               lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt
        FROM s{r})
  WHERE nxt IS NOT NULL GROUP BY 1, 2
),
t{r} AS MATERIALIZED (
  SELECT sym AS s1, nxt AS s2, cnt FROM p{r}
  ORDER BY cnt DESC, sym, nxt LIMIT 1
),
m{r} AS MATERIALIZED (
  SELECT wid, f, pos, sym,
         match AND ((mseq - MIN(CASE WHEN match THEN mseq END)
             OVER (PARTITION BY wid, pos - mseq)) % 2 = 0) AS do_merge
  FROM (
    SELECT wid, f, pos, sym, match,
           SUM(CASE WHEN match THEN 1 ELSE 0 END)
             OVER (PARTITION BY wid ORDER BY pos) AS mseq
    FROM (
      SELECT wid, f, pos, sym,
             COALESCE(sym = (SELECT s1 FROM t{r})
               AND lead(sym) OVER (PARTITION BY wid ORDER BY pos)
                   = (SELECT s2 FROM t{r}), FALSE) AS match
      FROM s{r})
  )
),
s{r + 1} AS MATERIALIZED (
  SELECT wid, f,
         ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS pos,
         CASE WHEN do_merge THEN sym || (SELECT s2 FROM t{r})
              ELSE sym END AS sym
  FROM (
    SELECT *, COALESCE(lag(do_merge) OVER (PARTITION BY wid ORDER BY pos),
                       FALSE) AS prev_merge
    FROM m{r})
  WHERE NOT prev_merge
)""")
    selects = [
        f"""SELECT {r} AS merge_round, s1, s2, cnt AS pair_count,
       (SELECT CAST(SUM(f) AS BIGINT) FROM s{r + 1})
         AS corpus_tokens_after
FROM t{r}"""
        for r in range(1, rounds + 1)
    ]
    return (
        base + "," + ",".join(parts) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


_Q203_SQL = _bpe_sql()


# --- q208: tokenize the corpus with the learned merges (BPE encode) -------
# The encode half of the tokenizer lifecycle (train -> apply — the same
# two-phase story as the dedup and retrieval indexes): the post-merge
# sequence relation IS the trained tokenizer applied to the vocabulary,
# so encoding the corpus is one join from corpus tokens to per-word
# subword counts. Words excluded from training (length < 2) tokenize
# trivially as themselves (1 subword, the COALESCE). Output is the
# per-language compression readout — words, subwords, exact
# avg-subwords-per-word ratio — the number a tokenizer-fertility audit
# of a multilingual corpus actually reports.
# Scale: training cost is the q203 vocabulary loop; the apply side is
# one corpus explode + a join against the vocabulary-sized subword-count
# relation (broadcast in practice, AQE decides) + one aggregation.

def q208_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.subword import bpe_word_subwords

    _, seq = _learn_merges(spark, sf_dir)
    word_sub = bpe_word_subwords(seq)
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("wid")
    )
    return (
        toks.join(word_sub, "wid", "left")
        .withColumn("n_sub", F.coalesce(F.col("n_sub"), F.lit(1)))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double")
            ).alias("avg_subwords_per_word"),
        )
    )


def _bpe_encode_sql(rounds: int = _ROUNDS) -> str:
    # reuse the q203 CTE chain up to the final sequence s{rounds+1}
    chain = _bpe_sql(rounds)
    chain = chain[: chain.index("\nSELECT 1 AS merge_round")] if (
        "\nSELECT 1 AS merge_round" in chain
    ) else chain.split("\nSELECT ")[0]
    return (
        chain
        + f""",
word_sub AS (
  SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_sub
  FROM s{rounds + 1} GROUP BY wid
),
toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS wid FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(COALESCE(n_sub, 1)) AS BIGINT) AS n_subwords,
       CAST(SUM(COALESCE(n_sub, 1)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_subwords_per_word
FROM toks LEFT JOIN word_sub USING (wid)
GROUP BY lang
"""
    )


_Q208_SQL = _bpe_encode_sql()

QUERIES = {
    "q203_bpe_merges": q203_bpe_merges,
    "q208_bpe_encode": q208_bpe_encode,
}
ORACLE = {
    "q203_bpe_merges": _Q203_SQL,
    "q208_bpe_encode": _Q208_SQL,
}
