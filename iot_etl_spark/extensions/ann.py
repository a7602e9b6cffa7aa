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


# ---------------------------------------------------------------- PQ

def _subvectors(df: DataFrame, m: int, id_col: str, vec_col: str) -> DataFrame:
    """(id, sub, subvec): each vector split into m contiguous
    subvectors (dim must be divisible by m) — pure map-side."""
    slices = (
        f"transform(sequence(0, {m - 1}), "
        f"j -> slice({vec_col}, j * (size({vec_col}) div {m}) + 1, "
        f"size({vec_col}) div {m}))"
    )
    return df.select(
        id_col, F.posexplode(F.expr(slices)).alias("sub", "subvec")
    )


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """Product-quantization codebooks (Jegou, Douze, Schmid 2011:
    "Product Quantization for Nearest Neighbor Search"): an
    independent k-means codebook per subspace, trained with the same
    DataFrame-native Lloyd's iteration as `kmeans_cells`. Returns
    (sub, cell, centroid) — m*k rows total.

    Scale: PQ is the memory path of ANN at 100 TB — a d-dim float
    vector (4d bytes) compresses to m bytes of codes; training runs
    on a sample, and the m loops are over a constant (each iteration
    is the broadcast-join/argmin/mean pattern of `kmeans_cells`)."""
    subs = _subvectors(emb, m, id_col, vec_col)
    books = []
    for s in range(m):
        sub_emb = subs.filter(F.col("sub") == s).select(id_col, F.col("subvec").alias("emb"))
        _, cents = kmeans_cells(sub_emb, k=k, iters=iters, id_col=id_col, vec_col="emb")
        books.append(cents.withColumn("sub", F.lit(s)))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out.select("sub", "cell", "centroid")


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    m: int = 4,
) -> DataFrame:
    """Assign each subvector to its nearest codebook centroid:
    (id, codes array<int>, one code per subspace). One broadcast join
    of the m*k codebook against the exploded subvectors, argmin via
    min-struct, then a per-id re-pack — the only shuffle is the
    groupBy on id, proportional to m * corpus, never to k."""
    subs = _subvectors(emb, m, id_col, vec_col)
    scored = subs.join(F.broadcast(codebooks), "sub").select(
        id_col, "sub",
        F.struct(
            _sqdist(F.col("subvec"), F.col("centroid")).alias("d"),
            F.col("cell").alias("cell"),
        ).alias("dc"),
    )
    return (
        scored.groupBy(id_col, "sub")
        .agg(F.min("dc").alias("best"))
        .select(id_col, "sub", F.col("best.cell").alias("code"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    top_k: int = 10,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact, every
    corpus vector is its m codes. The per-(sub, cell) distance table
    (m*k floats) collapses into a ONE-ROW broadcast map, and scoring
    is a pure expression over the codes array — zero shuffles on the
    corpus side; the final top-k is TakeOrderedAndProject.

    At 100 TB this is the design point: the scan reads m bytes per
    vector instead of 4d, no join, no exchange."""
    d = len(query_vec)
    dsub = d // m
    parts = []
    for s in range(m):
        q_s = F.array(*[F.lit(float(x)) for x in query_vec[s * dsub:(s + 1) * dsub]])
        parts.append(
            codebooks.filter(F.col("sub") == s)
            .withColumn("qd", _sqdist(F.col("centroid"), q_s))
        )
    dist = parts[0]
    for p in parts[1:]:
        dist = dist.unionByName(p)
    lut = (
        dist.select((F.col("sub") * k + F.col("cell") + 1).alias("key"), "qd")
        .groupBy()
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "qd"))).alias("lut"))
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        id_col,
        F.aggregate(
            F.expr(f"transform(codes, (c, j) -> element_at(lut, j * {k} + c + 1))"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("adc_dist"),
    )
    return scored.orderBy("adc_dist", id_col).limit(top_k)
