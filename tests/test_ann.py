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


def test_pq_exact_on_prototype_corpus(spark):
    """Product quantization on a corpus CONSTRUCTED from per-subspace
    prototypes: the first k vectors seed every prototype in every
    subspace, so training recovers the prototypes exactly, every
    vector's quantization error is zero, and ADC retrieval of any
    corpus vector returns itself at distance ~0."""
    from iot_etl_spark.extensions.ann import pq_train, pq_encode, pq_adc_topk

    m, k, dsub = 4, 4, 2
    protos = [[[10.0 * c + s, 5.0 * c - 2.0 * s] for c in range(k)] for s in range(m)]

    def vec(combo):
        out = []
        for s, c in enumerate(combo):
            out.extend(protos[s][c])
        return out

    combos = [(c, c, c, c) for c in range(k)]  # seeds: all prototypes
    seen = set(combos)
    i = 0
    while len(combos) < 30:  # unique mixed-radix combos
        combo = (i % k, (i // k) % k, (i // k**2) % k, (i // k**3) % k)
        if combo not in seen:
            combos.append(combo)
            seen.add(combo)
        i += 1
    rows = [(vid, vec(c)) for vid, c in enumerate(combos)]
    emb = spark.createDataFrame(rows, "vec_id LONG, emb ARRAY<DOUBLE>")

    books = pq_train(emb, m=m, k=k, iters=2)
    assert books.count() == m * k
    codes = pq_encode(emb, books, m=m)
    got = {r.vec_id: r.codes for r in codes.collect()}
    assert len(got) == len(combos)
    assert all(len(c) == m and all(0 <= x < k for x in c) for c in got.values())
    # codes are a permutation-relabelled copy of the combos: equal
    # combos <=> equal codes
    for vid, combo in enumerate(combos):
        for vid2, combo2 in enumerate(combos):
            if combo == combo2:
                assert got[vid] == got[vid2]

    target = 17
    top = pq_adc_topk(codes, books, rows[target][1], top_k=1, m=m, k=k).collect()
    assert top[0].vec_id == target
    assert abs(top[0].adc_dist) < 1e-9
