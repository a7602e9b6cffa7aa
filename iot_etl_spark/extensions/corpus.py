"""End-to-end corpus deduplication: the composition a training-data
pipeline actually runs.

Stage 1 removes exact duplicates (one shuffle on the md5 digest);
stage 2 removes near-duplicates among the exact-canonical survivors
(MinHash-LSH candidates -> exact Jaccard rescore -> connected
components -> keep the min-id doc per cluster). Every stage reuses the
oracle-checked operators from plans/queries_text.py; this module only
composes them into "corpus in, deduplicated corpus out".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def dedupe_corpus(
    spark: SparkSession,
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    max_cc_iters: int = 20,
) -> DataFrame:
    """Return the deduplicated corpus: exact dups dropped, then one
    canonical doc per near-dup (Jaccard >= threshold) cluster. Keeps
    every original column. The kept doc is always the minimum doc_id
    of its duplicate group (deterministic, replayable)."""
    from pyspark.sql import Window

    from iot_etl_spark.plans.queries_text import (
        _band_candidate_pairs,
        _minhash_band_sigs,
        _shingles_expr,
        _words,
    )

    # stage 1: exact — keep the min doc_id per content digest
    w = Window.partitionBy(F.md5(F.col("text")))
    exact_canonical = (
        docs.withColumn("_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )

    # stage 2: near-dup edges among survivors
    sh = exact_canonical.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    cand = _band_candidate_pairs(_minhash_band_sigs(spark, sh))
    jac = (
        cand.join(sh.select(F.col("doc_id").alias("doc_id_a"), F.col("s").alias("sa")), "doc_id_a")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), F.col("s").alias("sb")), "doc_id_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .filter(
            F.col("inter") / (F.size("sa") + F.size("sb") - F.col("inter"))
            >= jaccard_threshold
        )
        .select("doc_id_a", "doc_id_b")
    )
    edges = jac.select(F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")).unionAll(
        jac.select(F.col("doc_id_b").alias("a"), F.col("doc_id_a").alias("b"))
    ).cache()

    # connected components over edge-endpoint nodes only (isolated
    # survivors are trivially canonical); see queries_text.py
    from iot_etl_spark.plans.queries_text import _min_label_components

    labels = _min_label_components(edges, max_iters=max_cc_iters)
    # non-canonical = edge nodes whose component label is a smaller id
    drop = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    out = exact_canonical.join(drop, "doc_id", "left_anti")
    edges.unpersist()
    return out
