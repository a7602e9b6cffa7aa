"""Embedding similarity-search operators over ``embeddings``
(``vec_id, embedding: array<float>(64), label``) — driver north star
(SURVEY.md §7.1 M7).

All dot products run as higher-order functions (``zip_with`` +
``aggregate``) on doubles — JVM-side, codegen, no Python on the hot
path. Oracles use DuckDB's ``list_inner_product`` on ``DOUBLE[]``;
cosines are ROUND(x, 6) on both sides (accumulation-order noise is
~1e-14, far from the rounding boundary).

Scale notes (100 TB of vectors): brute-force top-k is a single
broadcast-join + TakeOrderedAndProject — linear scan, no shuffle; the
IVF variant prunes the scan to the nearest centroid partitions, which
is the standard ANN layout (cluster-partitioned parquet so partition
pruning does the candidate selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iot_etl_spark.plans.registry import query
from iot_etl_spark.sources.tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10
SIM_THRESHOLD = 0.35


def _as_double(col: str = "embedding"):
    return F.expr(f"transform({col}, x -> cast(x AS DOUBLE))")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


_COSINE_TOPK_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT emb FROM v WHERE vec_id = {QUERY_VEC_ID})
SELECT v.vec_id, v.label,
       ROUND(list_inner_product(v.emb, q.emb)
             / (sqrt(list_inner_product(v.emb, v.emb))
                * sqrt(list_inner_product(q.emb, q.emb))), 6) AS cosine
FROM v, q
WHERE v.vec_id <> {QUERY_VEC_ID}
ORDER BY cosine DESC, v.vec_id
LIMIT {TOP_K}
"""


@query("embedding_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a fixed query vector (vec_id=0):
    broadcast the 1-row query side, scan-and-score, TakeOrderedAndProject.
    The baseline ANN path; no driver-side collect."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("qemb"))
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "label",
            F.round(
                _dot(F.col("emb"), F.col("qemb"))
                / (_norm(F.col("emb")) * _norm(F.col("qemb"))), 6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), "vec_id").limit(TOP_K)


_SIMILAR_PAIRS_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.label,
           list_inner_product(a.emb, b.emb)
           / (sqrt(list_inner_product(a.emb, a.emb))
              * sqrt(list_inner_product(b.emb, b.emb))) AS cos
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, vec_id_a, vec_id_b, ROUND(cos, 6) AS cosine
FROM p WHERE cos >= {SIM_THRESHOLD}
ORDER BY label, vec_id_a, vec_id_b
"""


@query("embedding_similar_pairs", oracle=_SIMILAR_PAIRS_ORACLE)
def embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection: same-label blocked pair scan with
    cosine >= threshold. Label blocking is the LSH-bucket stand-in —
    at scale the block key is a coarse quantization (IVF cell / LSH
    band), bounding the quadratic term to within-block pairs."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        _norm(F.col("a.emb")) * _norm(F.col("b.emb"))
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= SIM_THRESHOLD)
        .select("label", "vec_id_a", "vec_id_b", F.round("cos", 6).alias("cosine"))
        .orderBy("label", "vec_id_a", "vec_id_b")
    )


_CENTROID_ORACLE = """
WITH v AS (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings)
SELECT label, COUNT(DISTINCT vec_id) AS n_vectors,
       ROUND(AVG(x), 6) AS avg_component,
       ROUND(SUM(x * x) / COUNT(DISTINCT vec_id), 6) AS avg_sq_norm
FROM v
GROUP BY label
ORDER BY label
"""


@query("embedding_label_centroids", oracle=_CENTROID_ORACLE)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label (cluster) centroid statistics —
    vector count, mean component, mean squared norm. The full centroid
    vectors power ivf_topk below; this query exposes the trainable
    summary in oracle-checkable scalar form."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.posexplode(_as_double()).alias("i", "x")
    )
    return (
        emb.groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vectors"),
            F.round(F.avg("x"), 6).alias("avg_component"),
            F.round(F.sum(F.col("x") * F.col("x")) / F.countDistinct("vec_id"), 6).alias(
                "avg_sq_norm"
            ),
        )
        .orderBy("label")
    )


@query("embedding_ivf_topk")  # no oracle: multi-stage plan, rows-only check
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: (1) per-label centroids, (2) rank centroids by
    cosine to the query vector, keep the 3 nearest cells, (3) exact
    top-k only within those cells. At 100 TB the fact table is
    partitioned by cell id, so stage 3 is partition-pruned to ~3/N of
    the data. Not SQL-expressible as one statement -> rows-only check."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    long = emb.select("vec_id", "label", F.posexplode("emb").alias("i", "x"))
    centroids = long.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("vec_id", F.posexplode("emb").alias("i", "qx"))
        .drop("vec_id")
    )
    cent_score = (
        centroids.join(F.broadcast(qv), "i")
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("cx") * F.col("qx"))
                / (F.sqrt(F.sum(F.col("cx") * F.col("cx"))) * F.sqrt(F.sum(F.col("qx") * F.col("qx"))))
            ).alias("centroid_cos")
        )
        .orderBy(F.col("centroid_cos").desc(), "label")
        .limit(3)
    )
    qfull = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("qemb"))
    pruned = emb.join(F.broadcast(cent_score.select("label")), "label")
    scored = (
        pruned.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qfull))
        .select(
            "vec_id", "label",
            F.round(
                _dot(F.col("emb"), F.col("qemb"))
                / (_norm(F.col("emb")) * _norm(F.col("qemb"))), 6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), "vec_id").limit(TOP_K)
