"""ANN index construction: KMeans-clustered IVF cells as DataFrame ops.

`embedding_ivf_topk` (plans/queries_embed.py) demonstrates the IVF
query path with the given `label` as the cell id; this module LEARNS
the cells — Lloyd's k-means expressed entirely in DataFrame operators
(broadcast centroids, argmin assignment, per-component mean update),
no MLlib dependency and nothing driver-side except the tiny k x dim
centroid table.

Scale shape (100 TB of vectors): train on a sample, then one
assignment pass over the corpus; write vectors partitioned by
`cell` so an n-probe query is partition-pruned to n/k of the data.
Deliberately pytest-verified (recall vs brute force) rather than
DuckDB-oracle-gated: cross-engine float argmin near-ties would make a
hash check flaky without changing real behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over an array<double> column. Deterministic
    init (the k lowest-id vectors seed the centroids). Returns
    (assignments: id, cell, vector; centroids: cell, centroid).

    Per iteration: one broadcast join of the k-row centroid table
    against the vectors (argmin by squared distance, min_by — narrow,
    no shuffle of the vector side beyond the final groupBy), one
    per-component mean. Empty cells keep their previous centroid."""
    centroids = (
        emb.orderBy(id_col).limit(k)
        .select(id_col, F.col(vec_col).alias("centroid"))
        .withColumn("cell", F.row_number().over(Window.orderBy(id_col)) - 1)
        .select("cell", "centroid")
    )
    assignments = None
    for _ in range(iters):
        scored = emb.crossJoin(F.broadcast(centroids)).select(
            id_col, vec_col,
            F.struct(_sqdist(F.col(vec_col), F.col("centroid")).alias("d"),
                     F.col("cell").alias("cell")).alias("dc"),
        )
        assignments = (
            scored.groupBy(id_col, vec_col)
            .agg(F.min("dc").alias("best"))
            .select(id_col, F.col("best.cell").alias("cell"), vec_col)
        )
        new_centroids = (
            assignments.select("cell", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("cx"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cx"))), lambda s: s["cx"]
                ).alias("centroid")
            )
        )
        # empty cells fall back to their previous centroid
        centroids = (
            centroids.withColumnRenamed("centroid", "old")
            .join(new_centroids, "cell", "left")
            .select("cell", F.coalesce("centroid", "old").alias("centroid"))
        )
    return assignments, centroids


def ivf_topk(
    assignments: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    n_probe: int = 3,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """n-probe IVF query: rank cells by centroid distance to the query,
    exact-rescore only vectors in the n_probe nearest cells. With the
    corpus partitioned by `cell`, the rescore scan is partition-pruned
    to n_probe/k of the data."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.withColumn("d", _sqdist(F.col("centroid"), q))
        .orderBy("d", "cell")
        .limit(n_probe)
        .select("cell")
    )
    cand = assignments.join(F.broadcast(probe), "cell")
    qn = F.sqrt(F.aggregate(F.transform(q, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    vn = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    return (
        cand.select(id_col, "cell", (_dot(F.col(vec_col), q) / (vn * qn)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(top_k)
    )
