"""End-to-end LLM training-corpus curation pipeline.

The engine's north-star use case composed from its operators — every
stage is the library call a 100 TB curation job would make, in the order
production pipelines run them (cheap filters first, pairwise ops last,
on the smallest surviving set):

1. ingest        parquet scan (explicit schema at scale)
2. quality gate  expression-only scoring + repetition filter — no
                 UDFs, full pushdown
3. language gate keep target languages (heuristic lang-ID available)
4. PII scrub     regex redaction of emails/phones (codegen, per-row)
5. exact dedup   deterministic keep-first on content fingerprint
6. near dedup    MinHash LSH candidates → exact Jaccard verify →
                 connected components → keep canonical docs
6b. semantic     SemDeDup over the embedding column — paraphrase
                 dups invisible to every lexical stage above
7. decontaminate drop docs sharing 4-grams with the benchmark set
                 (broadcast probe — zero corpus-side shuffle)
7b. selection    bigram-LM target-likeness score (Moore-Lewis shape:
                 an add-one-smoothed model trained on the English
                 slice scores every survivor — the per-language mean
                 lands in the report; a real job thresholds on it)
8. sampling      deterministic stratified downsample per language,
                 then content-hash train/val/test split (dup-safe,
                 reproducible — never random())
9. accounting    token budget + packed-chunk count per language
                 (per-shard concat-then-chunk, the pretraining layout)
9b. tokenizer    BPE merge table trained on the TRAIN split
                 (vocabulary-level relational rounds) + per-language
                 fertility (avg subwords/word) in the report
10. land         parquet partitioned by (split, lang) — the tokenizer
                 reads train/ via partition pruning

Run: python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    from etl_job_applify_spark.dedup import minhash_lsh_pairs
    from etl_job_applify_spark.dedup.shingles import with_shingles
    from etl_job_applify_spark.functions.text import (
        n_tokens_expr,
        normalize_text_expr,
        quality_score_expr,
        redact_pii_expr,
        repetition_ratio_expr,
        rolling_hash_expr,
    )
    from etl_job_applify_spark.operators.components import connected_components
    from etl_job_applify_spark.sinks.writers import write_parquet
    from etl_job_applify_spark.sources.readers import load_table
    from etl_job_applify_spark.transform.dedup import dedup_keep_first
    from etl_job_applify_spark.transform.sampling import (
        systematic_stratified_sample,
    )

    # 1-3: ingest + cheap row-local gates (pushed into the scan where
    # possible; nothing shuffles yet)
    docs = load_table(spark, sf_dir, "documents")
    gated = (
        docs.withColumn("quality", quality_score_expr("text"))
        .withColumn("n_tokens", n_tokens_expr("text"))
        .withColumn("rep_ratio", repetition_ratio_expr("text", n=5))
        .filter((F.col("quality") >= 0.05) & (F.col("n_tokens") >= 10))
        .filter(F.coalesce(F.col("rep_ratio"), F.lit(0.0)) <= 0.5)
        .filter(F.col("lang").isin("en", "fr", "de", "es", "zh"))
    )

    # 4: PII scrub — per-row regexp, before anything is persisted
    gated = gated.withColumn("text", redact_pii_expr("text"))

    # 5: exact dedup by NORMALIZED content fingerprint (case/whitespace
    # variants hash together — that's what makes this stage catch
    # formatting-identical copies before any pairwise work)
    fingerprinted = gated.withColumn(
        "__norm", normalize_text_expr("text")
    ).withColumn("content_hash", rolling_hash_expr("__norm")).drop("__norm")
    exact_unique = dedup_keep_first(
        fingerprinted, keys=["content_hash"], order_by=["doc_id"]
    )

    # 6: near dedup on the survivors — LSH candidates, exact verification,
    # clusters, keep the canonical (min doc_id) member of each cluster
    pairs = minhash_lsh_pairs(
        exact_unique, num_hashes=64, bands=16, threshold=0.5, verify=True
    )
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canonical = exact_unique.join(losers, "doc_id", "left_anti")

    # 6b: semantic dedup — high-cosine paraphrase groups collapse to
    # their lowest id; runs AFTER the lexical stages so the quadratic
    # within-cluster scoring sees only already-canonical docs
    from etl_job_applify_spark.dedup import semantic_dedup_kept

    emb = load_table(spark, sf_dir, "embeddings")
    sem_kept = semantic_dedup_kept(
        emb.join(
            canonical.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        ),
        num_anchors=16,
        threshold=0.45,
    )
    canonical = canonical.join(
        sem_kept.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )

    # 7: decontamination — drop docs overlapping the held-out benchmark
    # set on any 4-gram (stand-in: every 17th doc). The benchmark gram
    # set broadcasts; the corpus probes it map-side.
    grams = with_shingles(canonical, n=4, out="__grams").select(
        "doc_id", F.explode("__grams").alias("gram")
    )
    bench_grams = (
        grams.filter(F.col("doc_id") % 17 == 0).select("gram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % 17 != 0)
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    canonical = canonical.filter(F.col("doc_id") % 17 != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    # 7b: target-likeness selection score — bigram LM trained on the
    # English survivors scores everything; attach per-doc, report
    # per-language means (a production job filters the bottom tail)
    from etl_job_applify_spark.transform.langmodel import bigram_lm_scores

    sel = bigram_lm_scores(
        canonical, canonical.filter(F.col("lang") == "en")
    ).select("doc_id", F.col("avg_cond_prob").alias("sel_score"))
    canonical = canonical.join(sel, "doc_id", "left")

    # 8: deterministic stratified downsample (reproducible across reruns
    # and cluster sizes — no RNG state)
    sampled = systematic_stratified_sample(
        canonical, strata=["lang"], order_by=["doc_id"], every_k=2
    )

    # 8b: deterministic content-hash train/val/test split — content-
    # addressed (md5 of text, not doc_id) so any dup pair that survived
    # dedup still lands in ONE split; reproducible on any cluster size
    from etl_job_applify_spark.transform.sampling import content_hash_split

    sampled = content_hash_split(sampled)

    # 9: corpus accounting — token budget plus how many packed
    # context-window chunks each language yields (concat-then-chunk
    # per shard = language, 512-token windows)
    # 9b: train the tokenizer ON the curated train split and measure
    # per-language fertility — the audit that catches a vocabulary
    # skewed against a language before any GPU time is spent
    from etl_job_applify_spark.transform.subword import (
        bpe_word_subwords,
        learn_bpe,
    )

    train = sampled.filter(F.col("split") == "train")
    merges, seq = learn_bpe(train, rounds=6)
    word_sub = bpe_word_subwords(seq)
    fertility = (
        sampled.select("lang", F.explode(F.split("text", " ")).alias("wid"))
        .join(word_sub, "wid", "left")
        .withColumn("n_sub", F.coalesce(F.col("n_sub"), F.lit(1)))
        .groupBy("lang")
        .agg(
            (
                F.sum("n_sub").cast("double")
                / F.count("*").cast("double")
            ).alias("bpe_fertility")
        )
    )

    report = (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.avg("sel_score").alias("mean_sel_score"),
        )
        .withColumn(
            "n_chunks_512",
            F.ceil(F.col("total_tokens") / F.lit(512.0)).cast("bigint"),
        )
        .join(fertility, "lang", "left")
        .orderBy("lang")
    )

    # 10: land the curated corpus partitioned by split then language —
    # the tokenizer job reads train/ only, and partition pruning makes
    # that selection free
    if out_dir:
        write_parquet(
            sampled.select(
                "doc_id", "split", "lang", "source", "text", "n_tokens"
            ),
            out_dir,
            partition_by=["split", "lang"],
        )
    return report


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session("llm_corpus_pipeline")
    curate(spark, sf).show()
    spark.stop()
