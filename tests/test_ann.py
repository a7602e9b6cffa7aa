"""KMeans-IVF ANN tests: learned cells, partition-pruned probe,
recall vs exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_etl_spark.extensions.ann import kmeans_cells, ivf_topk, _dot
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS DOUBLE))").alias("emb")
    ).cache()


def test_kmeans_partitions_all_vectors(spark, emb):
    assignments, centroids = kmeans_cells(emb, k=8, iters=3)
    n = emb.count()
    assert assignments.count() == n  # every vector assigned exactly once
    assert assignments.select("vec_id").distinct().count() == n
    cells = {r.cell for r in centroids.select("cell").collect()}
    assert cells == set(range(8))
    used = {r.cell for r in assignments.select("cell").distinct().collect()}
    assert used <= cells and len(used) >= 2  # clustering actually split the data
    # centroid == mean of member vectors (one spot-checked cell)
    some_cell = sorted(used)[0]
    member_mean = (
        assignments.filter(F.col("cell") == some_cell)
        .select(F.posexplode("emb").alias("i", "x"))
        .groupBy("i").agg(F.avg("x").alias("m")).orderBy("i").collect()
    )
    cent = centroids.filter(F.col("cell") == some_cell).first()["centroid"]
    for r in member_mean:
        assert abs(cent[r.i] - r.m) < 1e-9


def test_kmeans_objective_decreases(spark, emb):
    """Lloyd's algorithm property: total within-cell squared distance
    is non-increasing across iterations."""
    from iot_etl_spark.extensions.ann import _sqdist

    costs = []
    for iters in (1, 3):
        assignments, centroids = kmeans_cells(emb, k=8, iters=iters)
        j = assignments.join(centroids, "cell").select(
            _sqdist(F.col("emb"), F.col("centroid")).alias("d")
        )
        costs.append(j.agg(F.sum("d")).first()[0])
    assert costs[1] <= costs[0] + 1e-9


def test_ivf_recall_vs_brute_force(spark, emb):
    """n-probe IVF must recover most of the exact top-10 (and exactly
    the brute-force order for the vectors it does scan)."""
    qvec = emb.filter(F.col("vec_id") == 0).first()["emb"]
    assignments, centroids = kmeans_cells(emb, k=8, iters=3)
    approx = [
        r.vec_id
        for r in ivf_topk(
            assignments.filter(F.col("vec_id") != 0), centroids, qvec,
            n_probe=3, top_k=10,
        ).collect()
    ]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    qn = sum(x * x for x in qvec) ** 0.5
    exact = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (_dot(F.col("emb"), q)
             / (F.sqrt(_dot(F.col("emb"), F.col("emb"))) * F.lit(qn))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    recall = len(set(approx) & set(exact)) / 10
    assert recall >= 0.5, f"IVF recall {recall} too low; approx={approx} exact={exact}"
    assert len(approx) == 10
