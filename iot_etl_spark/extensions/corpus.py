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


def build_dedup_index(spark: SparkSession, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The persisted state of incremental dedup: (digests, band sigs).
    At scale these are tables partitioned by digest prefix / band —
    an arriving batch joins against them instead of re-scanning the
    corpus."""
    from iot_etl_spark.plans.queries_text import (
        _minhash_band_sigs,
        _shingles_expr,
        _words,
    )

    digests = docs.select("doc_id", F.md5(F.col("text")).alias("digest"))
    sh = docs.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    return digests, _minhash_band_sigs(spark, sh)


def dedupe_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Incremental dedup — the pattern a production ingest actually
    runs: an arriving batch is checked against the EXISTING corpus
    index (never against all historic pairs) and against itself.
    Returns every new doc with ``keep`` plus a drop ``reason`` in
    {exact_dup_corpus, near_dup_corpus, exact_dup_increment,
    near_dup_increment} and ``dup_of`` (the id it duplicates).

    Scale: the corpus side contributes ONLY its digest and (band, sig)
    index tables (built once, appended per batch); near-dup rescoring
    re-reads corpus text for candidate ids alone (a semi-join prune —
    proportional to true duplication, not corpus size). The increment
    is small by definition, so every join against it broadcasts."""
    from iot_etl_spark.plans.queries_text import (
        _band_candidate_pairs,
        _minhash_band_sigs,
        _min_label_components,
        _shingles_expr,
        _words,
    )

    digests, corpus_sigs = build_dedup_index(spark, corpus_docs)

    new_dig = new_docs.select("doc_id", F.md5(F.col("text")).alias("digest"))
    # 1) exact vs corpus: earliest corpus doc with the same digest
    exact_old = (
        new_dig.join(
            digests.select(F.col("digest"), F.col("doc_id").alias("old_id")), "digest"
        )
        .groupBy("doc_id")
        .agg(F.min("old_id").alias("dup_of"))
        .withColumn("reason", F.lit("exact_dup_corpus"))
    )
    # 2) exact within the increment: keep the min doc_id per digest
    from pyspark.sql import Window

    wd = Window.partitionBy("digest")
    exact_inc = (
        new_dig.withColumn("canon", F.min("doc_id").over(wd))
        .filter(F.col("doc_id") != F.col("canon"))
        .select("doc_id", F.col("canon").alias("dup_of"))
        .withColumn("reason", F.lit("exact_dup_increment"))
    )

    new_sh = new_docs.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    new_sigs = _minhash_band_sigs(spark, new_sh)

    def _jaccard_ok(pairs, sh_a, sh_b):
        return (
            pairs.join(
                sh_a.select(F.col("doc_id").alias("doc_id_a"), F.col("s").alias("sa")),
                "doc_id_a",
            )
            .join(
                sh_b.select(F.col("doc_id").alias("doc_id_b"), F.col("s").alias("sb")),
                "doc_id_b",
            )
            .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
            .filter(
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter"))
                >= jaccard_threshold
            )
            .select("doc_id_a", "doc_id_b")
        )

    # 3) near-dup vs corpus: LSH bucket join against the corpus index,
    #    then exact rescore over shingles of the TOUCHED corpus docs only
    cand_old = (
        new_sigs.join(
            corpus_sigs.select("band", "sig", F.col("doc_id").alias("old_id")),
            ["band", "sig"],
        )
        .select(F.col("doc_id").alias("doc_id_a"), F.col("old_id").alias("doc_id_b"))
        .distinct()
    )
    touched = cand_old.select(F.col("doc_id_b").alias("doc_id")).distinct()
    old_sh = (
        corpus_docs.join(touched, "doc_id")
        .select("doc_id", _words().alias("ws"))
        .select("doc_id", F.expr(_shingles_expr()).alias("s"))
    )
    near_old = (
        _jaccard_ok(cand_old, new_sh, old_sh)
        .groupBy(F.col("doc_id_a").alias("doc_id"))
        .agg(F.min("doc_id_b").alias("dup_of"))
        .withColumn("reason", F.lit("near_dup_corpus"))
    )

    # 4) near-dup within the increment: components over the verified
    #    edge set; non-minimal members point at their component label
    pairs_inc = _band_candidate_pairs(new_sigs)
    jac_inc = _jaccard_ok(pairs_inc, new_sh, new_sh)
    edges = jac_inc.select(F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")).unionAll(
        jac_inc.select(F.col("doc_id_b").alias("a"), F.col("doc_id_a").alias("b"))
    )
    near_inc = (
        _min_label_components(edges, max_iters=20)
        .filter(F.col("doc_id") != F.col("label"))
        .select("doc_id", F.col("label").alias("dup_of"))
        .withColumn("reason", F.lit("near_dup_increment"))
    )

    # precedence: exact_corpus > exact_increment > near_corpus > near_inc
    verdicts = None
    for i, v in enumerate([exact_old, exact_inc, near_old, near_inc]):
        v = v.withColumn("prio", F.lit(i))
        verdicts = v if verdicts is None else verdicts.unionByName(v)
    wv = Window.partitionBy("doc_id").orderBy("prio")
    first = (
        verdicts.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("doc_id", "dup_of", "reason")
    )
    return (
        new_docs.join(first, "doc_id", "left")
        .withColumn("keep", F.col("reason").isNull())
    )
