"""End-to-end LLM training-corpus curation pipeline.

The engine's north-star use case composed from its operators — every
stage is the library call a 100 TB curation job would make, in the order
production pipelines run them (cheap filters first, pairwise ops last,
on the smallest surviving set):

1. ingest        parquet scan (explicit schema at scale)
2. quality gate  expression-only scoring — no UDFs, full pushdown
3. language gate keep target languages (heuristic lang-ID available)
4. exact dedup   deterministic keep-first on content fingerprint
5. near dedup    MinHash LSH candidates → exact Jaccard verify →
                 connected components → keep canonical docs
6. sampling      deterministic stratified downsample per language
7. accounting    token/char budget report per language
8. land          partitioned parquet, ready for tokenization

Run: python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    from etl_job_applify_spark.dedup import minhash_lsh_pairs
    from etl_job_applify_spark.functions.text import (
        n_tokens_expr,
        normalize_text_expr,
        quality_score_expr,
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
        .filter((F.col("quality") >= 0.05) & (F.col("n_tokens") >= 10))
        .filter(F.col("lang").isin("en", "fr", "de", "es", "zh"))
    )

    # 4: exact dedup by NORMALIZED content fingerprint (case/whitespace
    # variants hash together — that's what makes this stage catch
    # formatting-identical copies before any pairwise work)
    fingerprinted = gated.withColumn(
        "__norm", normalize_text_expr("text")
    ).withColumn("content_hash", rolling_hash_expr("__norm")).drop("__norm")
    exact_unique = dedup_keep_first(
        fingerprinted, keys=["content_hash"], order_by=["doc_id"]
    )

    # 5: near dedup on the survivors — LSH candidates, exact verification,
    # clusters, keep the canonical (min doc_id) member of each cluster
    pairs = minhash_lsh_pairs(
        exact_unique, num_hashes=64, bands=16, threshold=0.5, verify=True
    )
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canonical = exact_unique.join(losers, "doc_id", "left_anti")

    # 6: deterministic stratified downsample (reproducible across reruns
    # and cluster sizes — no RNG state)
    sampled = systematic_stratified_sample(
        canonical, strata=["lang"], order_by=["doc_id"], every_k=2
    )

    # 7: corpus accounting (what the tokenizer team gets told)
    report = (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )

    # 8: land the curated corpus partitioned by language
    if out_dir:
        write_parquet(
            sampled.select("doc_id", "lang", "source", "text", "n_tokens"),
            out_dir,
            partition_by=["lang"],
        )
    return report


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session("llm_corpus_pipeline")
    curate(spark, sf).show()
    spark.stop()
