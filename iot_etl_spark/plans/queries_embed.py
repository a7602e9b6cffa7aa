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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iot_etl_spark.plans.registry import query, spread_scan
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


# Sign-bit (bit-sampling) LSH for the pair scan: band b's signature is
# the sign pattern of components [b*LSH_BITS, (b+1)*LSH_BITS). Axis-
# aligned hyperplanes through the origin — the classic random-hyperplane
# cosine-LSH family with h = e_i, deterministic and exactly expressible
# in both engines (no RNG to keep in sync). 4 bands x 6 bits gives a
# ~16x candidate cut at sf0.01 and bounds bucket sizes to ~N/2^6 per
# band at scale; recall for a pair at cosine s is
# 1-(1-p^6)^4, p = 1 - arccos(s)/pi (p=0.89 at s=0.9 -> recall 0.92).
LSH_BANDS = 4
LSH_BITS = 6

_DUCK_LSH_SIGS = " UNION ALL ".join(
    "SELECT vec_id, {b} AS band, {bits} AS sig FROM v".format(
        b=b,
        bits=" + ".join(
            f"(CASE WHEN emb[{b * LSH_BITS + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(LSH_BITS)
        ),
    )
    for b in range(LSH_BANDS)
)

_SIMILAR_PAIRS_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
s AS ({_DUCK_LSH_SIGS}),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
    FROM s a JOIN s b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
),
sc AS (
    SELECT vec_id_a, vec_id_b,
           list_inner_product(x.emb, y.emb)
           / (sqrt(list_inner_product(x.emb, x.emb))
              * sqrt(list_inner_product(y.emb, y.emb))) AS cos
    FROM cand JOIN v x ON x.vec_id = vec_id_a JOIN v y ON y.vec_id = vec_id_b
)
SELECT vec_id_a, vec_id_b, ROUND(cos, 6) AS cosine
FROM sc WHERE cos >= {SIM_THRESHOLD}
"""


def _similar_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine >= threshold via sign-bit LSH
    blocking + exact rescore. The only pair join is on (band, sign-
    signature) — bucket sizes are ~N/2^LSH_BITS per band, so the
    quadratic term is bounded by the band width (tune LSH_BITS up as N
    grows), unlike the round-1 plan that blocked on the 10-value given
    `label`. Candidates sharing any band are rescored with the exact
    JVM-side cosine; the oracle replicates the identical pipeline, so
    hash-equality covers both the banding and the rescore."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            sum(
                F.when(F.col("emb")[b * LSH_BITS + i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(LSH_BITS)
            ).alias("sig"),
        )
        for b in range(LSH_BANDS)
    ]
    sigs = emb.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    # Bucket + expand, not a self-join: one scan of the vectors, one
    # shuffle on (band, sig) (see queries_text._band_candidate_pairs).
    buckets = (
        sigs.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ids) - 2), i -> "
                    "transform(sequence(i + 1, size(ids) - 1), j -> "
                    "struct(ids[i] AS vec_id_a, ids[j] AS vec_id_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    # norms are precomputed per VECTOR (below the join), not per pair:
    # the join materializes them into each candidate row, so the sqrt-
    # aggregate runs N times instead of 2x|candidates| — identical
    # doubles (same expression, same data), ~3x less pair-side work.
    x = emb.select(
        F.col("vec_id").alias("vec_id_a"), F.col("emb").alias("ea"),
        _norm(F.col("emb")).alias("na"),
    )
    y = emb.select(
        F.col("vec_id").alias("vec_id_b"), F.col("emb").alias("eb"),
        _norm(F.col("emb")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(x, "vec_id_a")
        .join(y, "vec_id_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= SIM_THRESHOLD)
        .select("vec_id_a", "vec_id_b", F.round("cos", 6).alias("cosine"))
    )


def _similar_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair set, materialized once per
    (embeddings parquet, stage code) and shared by
    embedding_similar_pairs (the report surface) and
    semantic_dedup_verdict (the keep/drop surface) — the banding +
    rescore pipeline is the family's dominant cost and its output is
    a few hundred rows."""
    from iot_etl_spark.plans.stagecache import cached_stage

    return cached_stage(
        spark, "embed_lsh_pairs", sf_dir, ("embeddings",),
        lambda: _similar_pairs_build(spark, sf_dir),
        code_deps=(_similar_pairs_build, _as_double, _norm, _dot),
    )


@query("embedding_similar_pairs", oracle=_SIMILAR_PAIRS_ORACLE)
def embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _similar_pairs_build (the algorithm) — served from the
    materialized stage shared with semantic_dedup_verdict."""
    return _similar_pairs_cached(spark, sf_dir)


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


_IVF_TOPK_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
long AS (SELECT vec_id, label, generate_subscripts(emb, 1) AS i, unnest(emb) AS x FROM v),
cent AS (SELECT label, i, AVG(x) AS cx FROM long GROUP BY 1, 2),
q AS (SELECT i, x AS qx FROM long WHERE vec_id = {QUERY_VEC_ID}),
cells AS (
    SELECT label,
           SUM(cx * qx) / (sqrt(SUM(cx * cx)) * sqrt(SUM(qx * qx))) AS centroid_cos
    FROM cent JOIN q USING (i)
    GROUP BY label
    ORDER BY centroid_cos DESC, label
    LIMIT 3
),
qf AS (SELECT emb AS qemb FROM v WHERE vec_id = {QUERY_VEC_ID})
SELECT v.vec_id, v.label,
       ROUND(list_inner_product(v.emb, qemb)
             / (sqrt(list_inner_product(v.emb, v.emb))
                * sqrt(list_inner_product(qemb, qemb))), 6) AS cosine
FROM v JOIN cells USING (label), qf
WHERE v.vec_id <> {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""


@query("embedding_ivf_topk", oracle=_IVF_TOPK_ORACLE)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: (1) per-label centroids, (2) rank centroids by
    cosine to the query vector, keep the 3 nearest cells, (3) exact
    top-k only within those cells. At 100 TB the fact table is
    partitioned by cell id, so stage 3 is partition-pruned to ~3/N of
    the data. Oracle: the same centroids -> top-3 cells -> exact
    rescore pipeline as chained DuckDB CTEs."""
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


# ------------------------------------------------ int8 scalar quantization
_INT8_ORACLE = """
WITH s AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
    FROM embeddings
),
e AS (
    SELECT label, maxabs,
           list_sum(list_transform(v, x ->
               abs(x - LEAST(127.0, GREATEST(-127.0,
                       FLOOR(x * 127.0 / maxabs + 0.5))) * maxabs / 127.0)))
               / len(v) AS mae
    FROM s WHERE maxabs > 0
)
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(AVG(maxabs), 6) AS avg_scale,
       ROUND(AVG(mae), 6) AS avg_mae
FROM e GROUP BY label
"""


@query("embedding_int8_quant", oracle=_INT8_ORACLE)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization audit — the storage-scale
    path for embedding columns (4 bytes/dim -> 1, the standard
    vector-DB compression next to PQ's m-bytes-per-vector): each
    vector's scale is its max |component|, codes are
    floor(x * 127 / scale + 0.5) clamped to [-127, 127], and the
    report is per-label reconstruction MAE.

    The per-vector scale is referenced by every element's quantize
    AND dequantize, so it is bound once via the expression-level let
    (transform over a singleton array) — inlined, Catalyst would
    recompute the array_max per element, O(d^2) per vector. All math
    is identical-expression IEEE on both engines; only the per-label
    AVG carries accumulation noise, absorbed by ROUND 6.

    Scale: pure map-side column math (no shuffle until the |labels|-row
    rollup); at 100 TB this runs at scan speed and writes 1 byte/dim."""
    body = (
        "transform(array(array_max(transform(embedding, x -> abs(cast(x as double))))), m -> "
        "struct(m AS maxabs, "
        "aggregate(transform(embedding, x -> "
        "abs(cast(x as double) - least(127.0d, greatest(-127.0d, "
        "floor(cast(x as double) * 127.0d / m + 0.5d))) * m / 127.0d)), "
        "cast(0.0 as double), (a, e) -> a + e) / size(embedding) AS mae))[0]"
    )
    q = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.expr(body).alias("s"))
        .filter(F.col("s.maxabs") > 0)
    )
    return q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("s.maxabs"), 6).alias("avg_scale"),
        F.round(F.avg("s.mae"), 6).alias("avg_mae"),
    )


# ------------------------------------------- per-dimension statistics
_DIM_STATS_ORACLE = """
WITH x AS (
    SELECT generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
)
SELECT dim,
       COUNT(*) AS n,
       ROUND(AVG(v), 6) AS mean_v,
       ROUND(STDDEV(v), 6) AS stddev_v,
       ROUND(MIN(v), 6) AS min_v,
       ROUND(MAX(v), 6) AS max_v
FROM x GROUP BY dim ORDER BY dim
"""


@query("embedding_dim_stats", oracle=_DIM_STATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics (mean/std/min/max over each of
    the 64 coordinates) — the profiling pass before feature scaling,
    PCA whitening, or quantizer training (the int8 path in
    embedding_int8_quant assumes symmetric ranges; this query is how
    you check that).

    Scale: posexplode fans each vector into 64 (dim, value) rows
    map-side, then ONE hash aggregate on a 64-value key — partial
    aggregation collapses the fan-out before the shuffle, so network
    traffic is O(partitions x 64), independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
        .alias("dim", "v")
    ).select(F.col("dim").cast("long").alias("dim"), "v")
    return (
        x.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.stddev("v"), 6).alias("stddev_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
        .orderBy("dim")
    )


# --------------------------------------------- semantic dedup verdict
_SEMDEDUP_ORACLE = f"""
WITH pr AS ({_SIMILAR_PAIRS_ORACLE})
SELECT e.vec_id, e.label,
       CAST(COALESCE(d.cnt, 0) AS BIGINT) AS n_smaller_dups,
       d.cnt IS NULL AS kept
FROM embeddings e
LEFT JOIN (SELECT vec_id_b, COUNT(*) AS cnt FROM pr GROUP BY vec_id_b) d
       ON e.vec_id = d.vec_id_b
"""


@query("semantic_dedup_verdict", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup FILTER: per vector, keep it iff no
    lower-id vector sits within the cosine threshold — the verdict
    surface of embedding_similar_pairs (pairs are a report; training-
    data pipelines consume a keep/drop column). Min-id dominance is
    deterministic and needs no iteration: within any near-dup clique
    exactly the smallest id survives, and chains degrade gracefully
    (each drop names a smaller kept-or-dropped witness).

    Scale: inherits the sign-bit LSH blocking (no all-pairs scan); the
    verdict adds one aggregate on the pair set plus a left join back
    to the corpus — both keyed shuffles, no new quadratic term."""
    pairs = _similar_pairs_cached(spark, sf_dir)
    drops = pairs.groupBy("vec_id_b").agg(F.count(F.lit(1)).alias("cnt"))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        emb.join(drops, emb.vec_id == drops.vec_id_b, "left")
        .select(
            "vec_id", "label",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_smaller_dups"),
            F.col("cnt").isNull().alias("kept"),
        )
    )


# --------------------------------- truncated-dimension fidelity audit
TRUNC_DIMS = (8, 16, 32, 64)
TRUNC_SAMPLE_MOD = 10   # audit sample: every 10th vector id ...
TRUNC_SAMPLE_MAX = 512  # ... capped at 512 vectors ABSOLUTELY — a
# mod-only sample grows linearly with the corpus and its pair set
# quadratically; the cap keeps the audit O(1) at any scale

_TRUNC_ORACLE = f"""
WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings
    WHERE vec_id % {TRUNC_SAMPLE_MOD} = 0
      AND vec_id < {TRUNC_SAMPLE_MOD} * {TRUNC_SAMPLE_MAX}
),
p AS (
    SELECT a.emb AS ea, b.emb AS eb
    FROM v a JOIN v b ON a.vec_id < b.vec_id
),
c AS (
    SELECT d.dim,
           list_inner_product(ea[1:d.dim], eb[1:d.dim])
             / (sqrt(list_inner_product(ea[1:d.dim], ea[1:d.dim]))
                * sqrt(list_inner_product(eb[1:d.dim], eb[1:d.dim]))) AS cd,
           list_inner_product(ea, eb)
             / (sqrt(list_inner_product(ea, ea))
                * sqrt(list_inner_product(eb, eb))) AS cf
    FROM p, (VALUES {", ".join(f"({d})" for d in TRUNC_DIMS)}) d(dim)
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(CAST(ROUND(ABS(cd - cf) * 1000000) AS BIGINT))
             / COUNT(*) / 1000000.0, 6) AS mean_abs_err,
       ROUND(MAX(ABS(cd - cf)), 6) AS max_abs_err
FROM c GROUP BY 1
"""


@query("embedding_truncation_audit", oracle=_TRUNC_ORACLE)
def embedding_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation fidelity audit: how much does
    cosine similarity drift when vectors are cut to their first
    8/16/32/64 dimensions? Mean and max absolute deviation from the
    full-dimension cosine over a deterministic id-sampled pair set —
    the measurement that decides whether a truncated (cheaper) index
    tier is usable, the same role the recall pytest plays for IVF.

    Exactness: cosines are sequential left-to-right folds on both
    engines (the embedding_similar_pairs convention); the MEAN
    quantizes each |Δcosine| to BIGINT micro-units before summing
    (the changepoint_cusum convention) so no distributed float
    accumulation order can flip the 6th decimal; MAX is order-free.

    Scale: an audit over an ABSOLUTELY BOUNDED sample (every
    {TRUNC_SAMPLE_MOD}th id, capped at {TRUNC_SAMPLE_MAX} vectors —
    a mod-only sample would grow with the corpus and pair-expand
    quadratically), so the pair expansion is O(cap²) at any scale and
    rides a broadcast of the sample; the full corpus is never
    pair-expanded."""
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") % TRUNC_SAMPLE_MOD == 0)
            & (F.col("vec_id") < TRUNC_SAMPLE_MOD * TRUNC_SAMPLE_MAX)
        )
        .select("vec_id", F.expr("transform(embedding, x -> cast(x AS DOUBLE))").alias("emb"))
    )
    # SPREAD THE PAIR EXPANSION (registry.spread_scan, guide §2.5):
    # embeddings.parquet is one scan split, so the O(cap²) pair
    # fan-out and every cosine fold ran in a single task
    # (1.7 -> 0.66-0.74 s spread); gated no-op at production splits.
    v = spread_scan(v, "vec_id")
    b = v.select(F.col("vec_id").alias("vec_id_b"), F.col("emb").alias("eb"))
    pairs = v.join(F.broadcast(b), F.col("vec_id") < F.col("vec_id_b")).select(
        F.col("emb").alias("ea"), "eb"
    )
    def cos(a, bcol):
        return _dot(a, bcol) / (_norm(a) * _norm(bcol))

    # full-dim cosine computed ONCE per pair, before the dim explode —
    # it is as expensive as the widest truncated cosine, so computing
    # it per (pair, dim) row would redo 64-dim folds |dims| times
    dims = F.explode(F.array(*[F.lit(d) for d in TRUNC_DIMS])).alias("dim")
    expanded = pairs.withColumn("cf", cos(F.col("ea"), F.col("eb"))).select(
        "ea", "eb", "cf", dims
    )
    ta = F.slice("ea", 1, F.col("dim"))
    tb = F.slice("eb", 1, F.col("dim"))
    scored = expanded.select("dim", cos(ta, tb).alias("cd"), "cf")
    err_units = F.round(F.abs(F.col("cd") - F.col("cf")) * 1000000).cast("long")
    return scored.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(err_units) / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("mean_abs_err"),
        F.round(F.max(F.abs(F.col("cd") - F.col("cf"))), 6).alias("max_abs_err"),
    )


# --------------- signed-random-projection (SRP) sketch fidelity audit
SRP_PLANES = 16
SRP_DIM = 64

_SRP_ORACLE = f"""
WITH sg AS (
    SELECT d.d, p.p,
           CASE WHEN ('0x' || substr(md5(d.d || ':' || p.p), 1, 8))::BIGINT
                     % 2 = 0
                THEN 1 ELSE -1 END AS sgn
    FROM (SELECT unnest(range({SRP_DIM})) AS d) d,
         (SELECT unnest(range({SRP_PLANES})) AS p) p
),
comp AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS d,
           CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
               AS vq
    FROM embeddings
),
bits AS (
    SELECT c.vec_id, sg.p,
           CASE WHEN SUM(sg.sgn * c.vq) > 0 THEN 1 ELSE 0 END AS bit
    FROM comp c JOIN sg ON sg.d = c.d
    GROUP BY 1, 2
),
pr AS ({_SIMILAR_PAIRS_ORACLE}),
ham AS (
    SELECT pr.vec_id_a, pr.vec_id_b, pr.cosine,
           CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT)
               AS hamming
    FROM pr
    JOIN bits ba ON ba.vec_id = pr.vec_id_a
    JOIN bits bb ON bb.vec_id = pr.vec_id_b AND bb.p = ba.p
    GROUP BY 1, 2, 3
)
SELECT vec_id_a, vec_id_b, cosine, hamming,
       ROUND(COS(PI() * hamming / {SRP_PLANES}), 6) AS srp_cosine,
       ROUND(COS(PI() * hamming / {SRP_PLANES}) - cosine, 6) AS srp_err
FROM ham
"""


@query("srp_sketch_audit", oracle=_SRP_ORACLE)
def srp_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGNED-RANDOM-PROJECTION (Charikar hyperplane) sketch fidelity
    audit: every vector gets a {SRP_PLANES}-bit signature, bit p =
    sign(<r_p, v>) for a pseudo-random +-1 hyperplane r_p; for each
    verified near-dup pair the sketch-estimated cosine
    cos(pi * hamming / {SRP_PLANES}) is compared against the exact
    cosine. This is the rotation-mixing cousin of the axis-aligned
    sign-bit LSH in embedding_similar_pairs — the estimator a 100 TB
    pipeline uses BEFORE any exact rescore (one packed BIGINT per
    vector, popcount(xor) Hamming), audited here the same way
    minhash_estimate_audit audits the Jaccard sketch.

    Engine-exact by construction: hyperplane entries are md5-parity
    +-1 (no RNG to sync), components quantize to BIGINT micro-units so
    every projection <r_p, v> is exact integer arithmetic — the sign
    bit can never flip on accumulation order. The only doubles are
    cos() of one of {SRP_PLANES}+1 lattice angles and the exact
    cosine carried in from the shared pair stage, both ROUND(x, 6)
    with verified margin to the rounding ties.

    Scale shape: signature build is a linear pass — posexplode to
    (vector, dim), broadcast-join the {SRP_DIM}x{SRP_PLANES} sign
    matrix, one partial-agg groupBy(vec_id, plane); the audit join
    touches only the near-dup pairs (broadcast) x {SRP_PLANES}
    bit rows per side. In production the bits pack into one BIGINT
    column beside the vector (bit_or of bit<<p) and the hamming
    pre-filter replaces the candidate join entirely."""
    d = spark.range(SRP_DIM).select(F.col("id").alias("d"))
    p = spark.range(SRP_PLANES).select(F.col("id").alias("p"))
    signs = d.crossJoin(p).select(
        "d", "p",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("d").cast("string"), F.col("p").cast("string")
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % 2
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    comp = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode(_as_double()).alias("d", "x"))
        .select(
            "vec_id", "d",
            F.expr("CAST(ROUND(x * 1000000) AS BIGINT)").alias("vq"),
        )
    )
    # localCheckpoint (r14, guide §1.2): bits feeds BOTH pair sides —
    # without the cut each side replayed the posexplode + sign-matrix
    # join + projection aggregate over the full embeddings table
    # (plan audit: 10 broadcasts / 6 scans, two SortMergeJoins of the
    # duplicated subtree). |V| x {planes} bounded rows; in production
    # this materialization IS the packed-signature column the
    # docstring describes.
    bits = (
        comp.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("sgn") * F.col("vq")).alias("s"))
        .select("vec_id", "p", (F.col("s") > 0).cast("int").alias("bit"))
        .localCheckpoint()
    )
    pr = _similar_pairs_cached(spark, sf_dir)
    ba = bits.select(F.col("vec_id").alias("vec_id_a"), "p", F.col("bit").alias("bit_a"))
    bb = bits.select(F.col("vec_id").alias("vec_id_b"), "p", F.col("bit").alias("bit_b"))
    ham = (
        F.broadcast(pr)
        .join(ba, "vec_id_a")
        .join(bb, ["vec_id_b", "p"])
        .groupBy("vec_id_a", "vec_id_b", "cosine")
        .agg(
            F.sum((F.col("bit_a") != F.col("bit_b")).cast("int"))
            .cast("long")
            .alias("hamming")
        )
    )
    est = F.expr(f"cos(pi() * hamming / {SRP_PLANES})")
    return ham.select(
        "vec_id_a", "vec_id_b", "cosine", "hamming",
        F.round(est, 6).alias("srp_cosine"),
        F.round(est - F.col("cosine"), 6).alias("srp_err"),
    )


# ----------------- reciprocal-rank-fusion hybrid retrieval (RAG shape)
RRF_K = 60
RRF_LIST_K = 20
RRF_TOP = 10
RRF_QUERY_IDS = (0, 7, 42)

_RRF_QIDS_SQL = ", ".join(str(q) for q in RRF_QUERY_IDS)

_RRF_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM v WHERE vec_id IN ({_RRF_QIDS_SQL})),
dense AS (
    SELECT qid, vec_id AS id, rnk AS dr FROM (
        SELECT q.qid, v.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_inner_product(v.emb, q.qemb)
                                  / (sqrt(list_inner_product(v.emb, v.emb))
                                     * sqrt(list_inner_product(q.qemb, q.qemb))),
                            6) DESC, v.vec_id) AS rnk
        FROM v JOIN q ON v.vec_id <> q.qid
    ) WHERE rnk <= {RRF_LIST_K}
),
tok AS (
    SELECT doc_id, tok FROM (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        FROM documents
    ) WHERE tok <> ''
),
qt AS (SELECT doc_id AS qid, tok FROM tok WHERE doc_id IN ({_RRF_QIDS_SQL})),
ov AS (
    SELECT qt.qid, tok.doc_id AS id, COUNT(*) AS overlap
    FROM qt JOIN tok ON tok.tok = qt.tok AND tok.doc_id <> qt.qid
    GROUP BY 1, 2
),
lex AS (
    SELECT qid, id, rnk AS lr FROM (
        SELECT qid, id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY overlap DESC, id) AS rnk
        FROM ov
    ) WHERE rnk <= {RRF_LIST_K}
),
fused AS (
    SELECT COALESCE(dense.qid, lex.qid) AS query_id,
           COALESCE(dense.id, lex.id) AS doc_id,
           dense.dr AS dense_rank, lex.lr AS lex_rank,
           COALESCE(1.0 / ({RRF_K} + dense.dr), 0)
               + COALESCE(1.0 / ({RRF_K} + lex.lr), 0) AS score
    FROM dense FULL OUTER JOIN lex
      ON dense.qid = lex.qid AND dense.id = lex.id
)
SELECT query_id, doc_id, dense_rank, lex_rank,
       ROUND(score, 6) AS rrf_score
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY ROUND(score, 6) DESC, doc_id) AS rnk
    FROM fused
) WHERE rnk <= {RRF_TOP}
"""


@query("rrf_hybrid_retrieval", oracle=_RRF_ORACLE)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID dense+lexical retrieval fused with RECIPROCAL RANK FUSION
    (Cormack et al.) — the standard RAG retrieval shape: for each query
    document, a dense candidate list (exact cosine over the aligned
    embedding, top {RRF_LIST_K} by rounded cosine, id tie-break) and a
    lexical list (distinct-token overlap with the query text — integer
    score, engine-exact), fused by RRF(d) = sum_lists 1/({RRF_K}+rank)
    over the union, top {RRF_TOP} per query.

    The two retrievers exercise the 1:1 vec_id/doc_id alignment of the
    embeddings and documents tables. Rank determinism: the lexical
    ranks order an INTEGER overlap; the dense ranks order the SAME
    rounded cosine contract embedding_cosine_topk has held green since
    round 3; the RRF score is a sum of at most two exact reciprocals
    of small integers, identical IEEE arithmetic on both engines.

    100 TB shape: queries are a broadcast 3-row dim;
    the dense pass is scan-and-score + per-query top-k (production
    swaps in the IVF path of embedding_ivf_topk to prune the scan);
    the lexical pass is one token-keyed shuffle whose candidate set is
    bounded by documents sharing a query token. The fusion join
    touches only 2x{RRF_LIST_K} rows per query. Reference parity: the
    reference has no retrieval layer; LLM-pipeline extension."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("emb")
    )
    qv = emb.filter(F.col("vec_id").isin(*RRF_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("id"),
            F.round(
                _dot(F.col("emb"), F.col("qemb"))
                / (_norm(F.col("emb")) * _norm(F.col("qemb"))), 6,
            ).alias("cos"),
        )
    )
    wd = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    dense = (
        scored.withColumn("dr", F.row_number().over(wd))
        .filter(F.col("dr") <= RRF_LIST_K)
        .select("qid", "id", "dr")
    )

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    qt = tok.filter(F.col("doc_id").isin(*RRF_QUERY_IDS)).select(
        F.col("doc_id").alias("qid"), "tok"
    )
    ov = (
        tok.join(F.broadcast(qt), "tok")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", F.col("doc_id").alias("id"))
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    wl = Window.partitionBy("qid").orderBy(F.col("overlap").desc(), F.col("id"))
    lex = (
        ov.withColumn("lr", F.row_number().over(wl))
        .filter(F.col("lr") <= RRF_LIST_K)
        .select("qid", "id", "lr")
    )

    fused = dense.join(lex, ["qid", "id"], "full_outer").select(
        F.col("qid").alias("query_id"),
        F.col("id").alias("doc_id"),
        F.col("dr").alias("dense_rank"),
        F.col("lr").alias("lex_rank"),
        (
            F.coalesce(1.0 / (RRF_K + F.col("dr")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("lr")), F.lit(0.0))
        ).alias("score"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= RRF_TOP)
        .select(
            "query_id", "doc_id", "dense_rank", "lex_rank",
            F.round("score", 6).alias("rrf_score"),
        )
    )


# --------------------- retrieval quality eval (NDCG@k, label-judged)
# The eval leg the retrieval family was missing: embedding_cosine_topk
# / rrf_hybrid_retrieval RUN retrieval; this query GRADES it. Binary
# relevance = label agreement between query and hit (the standard
# proxy when no human judgments ship with the corpus), metric =
# NDCG@K with the 1/log2(rank+1) discount, per query.
NDCG_K = 10
NDCG_QUERY_IDS = (0, 3, 7, 11, 19, 23, 42, 57)
_NDCG_QIDS_SQL = ", ".join(str(q) for q in NDCG_QUERY_IDS)
# nano-quantized discount: BIGINT per rank so DCG/IDCG are exact
# integer sums; one double division at the end. No 1e9/log2(r+1) for
# r in 1..10 lands on a .5 rounding tie (verified), so Spark HALF_UP
# and DuckDB rounding agree.
_NDCG_DISC_SQL = "CAST(round(1000000000 / log2({r} + 1)) AS BIGINT)"

_NDCG_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlabel, emb AS qemb FROM v
      WHERE vec_id IN ({_NDCG_QIDS_SQL})),
hits AS (
    SELECT qid, qlabel, rel, rnk FROM (
        SELECT q.qid, q.qlabel,
               CASE WHEN v.label = q.qlabel THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_inner_product(v.emb, q.qemb)
                                  / (sqrt(list_inner_product(v.emb, v.emb))
                                     * sqrt(list_inner_product(q.qemb, q.qemb))),
                            6) DESC, v.vec_id) AS rnk
        FROM v JOIN q ON v.vec_id <> q.qid
    ) WHERE rnk <= {NDCG_K}
),
ideal AS (
    SELECT qid, qlabel, rel, rnk,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, rnk) AS irnk
    FROM hits
),
agg AS (
    SELECT qid, qlabel,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           CAST(SUM(rel * {_NDCG_DISC_SQL.format(r="rnk")}) AS BIGINT)
               AS dcg_nano,
           CAST(SUM(rel * {_NDCG_DISC_SQL.format(r="irnk")}) AS BIGINT)
               AS idcg_nano
    FROM ideal GROUP BY 1, 2
)
SELECT qid AS query_id, qlabel AS label, n_rel,
       CASE WHEN idcg_nano > 0
            THEN ROUND(CAST(dcg_nano AS DOUBLE) / idcg_nano, 6)
            ELSE 0.0 END AS ndcg
FROM agg
"""


@query("ndcg_label_retrieval", oracle=_NDCG_ORACLE)
def ndcg_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} RETRIEVAL EVALUATION over the cosine retriever:
    for each of the {len(NDCG_QUERY_IDS)} query vectors, rank all
    other vectors by rounded cosine (vec_id tiebreak — the exact
    contract embedding_cosine_topk pins), judge each top-{NDCG_K} hit
    relevant iff its label matches the query's, and score the list
    with the log2 position discount. IDCG re-ranks the SAME retrieved
    list ideally (rel DESC, retrieved-rank tiebreak), so ndcg=1 means
    "every relevant hit ranked above every irrelevant one".

    Determinism: relevance is an integer; per-rank discounts are
    nano-unit BIGINTs (shared-verbatim round/log2 expression — no tie
    sits on a .5 boundary for ranks 1..{NDCG_K}); DCG and IDCG are
    exact integer sums with ONE double division at the end.

    100 TB shape: the query side is a broadcast {len(NDCG_QUERY_IDS)}-row
    dim; scoring is scan-and-score; the per-query ranking window and
    everything after it runs on per-query candidate sets (production
    prunes the scan with the IVF path first — same plan shape as
    rrf_hybrid_retrieval, which this query grades). Reference parity:
    none — retrieval-evaluation extension of the LLM-pipeline family."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    qv = emb.filter(F.col("vec_id").isin(*NDCG_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qemb"),
    )
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "qlabel",
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
            F.round(
                _dot(F.col("emb"), F.col("qemb"))
                / (_norm(F.col("emb")) * _norm(F.col("qemb"))), 6,
            ).alias("cos"),
            "vec_id",
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    hits = (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NDCG_K)
        .select("qid", "qlabel", "rel", "rnk")
    )
    wi = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "rnk")
    ideal = hits.withColumn("irnk", F.row_number().over(wi))
    agg = ideal.groupBy("qid", "qlabel").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum(
            F.col("rel") * F.expr(_NDCG_DISC_SQL.format(r="rnk"))
        ).cast("long").alias("dcg_nano"),
        F.sum(
            F.col("rel") * F.expr(_NDCG_DISC_SQL.format(r="irnk"))
        ).cast("long").alias("idcg_nano"),
    )
    return agg.select(
        F.col("qid").alias("query_id"),
        F.col("qlabel").alias("label"),
        "n_rel",
        F.when(
            F.col("idcg_nano") > 0,
            F.round(F.col("dcg_nano").cast("double") / F.col("idcg_nano"), 6),
        ).otherwise(F.lit(0.0)).alias("ndcg"),
    )


# ---------------------- hard-negative mining (contrastive training)
# The training-data leg of the retrieval family: contrastive losses
# (InfoNCE/triplet) need, per anchor, negatives that are HARD —
# maximally similar vectors with a different label. Random negatives
# converge slowly; the standard pipeline mines the top-similar
# cross-label vectors offline, exactly this query.
HARDNEG_K = 5
HARDNEG_QUERY_IDS = (0, 3, 7, 11, 19, 23, 42, 57)
_HARDNEG_QIDS_SQL = ", ".join(str(q) for q in HARDNEG_QUERY_IDS)

_HARDNEG_ORACLE = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlabel, emb AS qemb FROM v
      WHERE vec_id IN ({_HARDNEG_QIDS_SQL}))
SELECT query_id, neg_id, neg_label, rank, cosine FROM (
    SELECT q.qid AS query_id, v.vec_id AS neg_id, v.label AS neg_label,
           ROUND(list_inner_product(v.emb, q.qemb)
                 / (sqrt(list_inner_product(v.emb, v.emb))
                    * sqrt(list_inner_product(q.qemb, q.qemb))), 6) AS cosine,
           ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY ROUND(list_inner_product(v.emb, q.qemb)
                              / (sqrt(list_inner_product(v.emb, v.emb))
                                 * sqrt(list_inner_product(q.qemb, q.qemb))),
                        6) DESC, v.vec_id) AS rank
    FROM v JOIN q ON v.vec_id <> q.qid AND v.label <> q.qlabel
) WHERE rank <= {HARDNEG_K}
"""


@query("hard_negative_mining", oracle=_HARDNEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training (see note above):
    for each anchor vector, the top-{HARDNEG_K} most-cosine-similar
    vectors whose label DIFFERS — the cross-label filter runs before
    scoring, so the rank is over true negatives only. Rank contract is
    the registry's usual rounded-cosine + vec_id tiebreak (the same
    determinism embedding_cosine_topk pins).

    100 TB shape: anchors broadcast as a tiny dim; scoring is
    scan-and-score with the label inequality pushed into the join
    condition (no post-filter over a bigger candidate set); per-anchor
    top-k via the bounded ranking window. Production swaps the scan
    for the IVF-pruned path and re-mines periodically as the model
    trains (negatives harden as epochs progress). Reference parity:
    none — embedding-training-pipeline extension."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    qv = emb.filter(F.col("vec_id").isin(*HARDNEG_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qemb"),
    )
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .filter((F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("qlabel")))
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(
                _dot(F.col("emb"), F.col("qemb"))
                / (_norm(F.col("emb")) * _norm(F.col("qemb"))), 6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARDNEG_K)
        .select("query_id", "neg_id", "neg_label", "rank", "cosine")
    )


# ------------------------------- label-centroid separation audit
_CENTROID_SEP_ORACLE = """
WITH v AS (
    SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
cent AS (
    SELECT label, i, ROUND(SUM(x) / COUNT(*), 6) AS c
    FROM v GROUP BY label, i
),
counts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors
           FROM embeddings GROUP BY label),
norms AS (SELECT label, ROUND(SUM(c * c), 6) AS centroid_norm2
          FROM cent GROUP BY label),
pairs AS (
    SELECT a.label AS la, b.label AS lb,
           ROUND(SUM((a.c - b.c) * (a.c - b.c)), 6) AS d2
    FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
    GROUP BY 1, 2
),
nearest AS (
    SELECT la AS label, lb AS nearest_label, d2 AS nearest_dist2
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY la
                                       ORDER BY d2, lb) AS rk
          FROM pairs)
    WHERE rk = 1
)
SELECT c.label, c.n_vectors, n.centroid_norm2,
       ne.nearest_label, ne.nearest_dist2
FROM counts c JOIN norms n USING (label) JOIN nearest ne USING (label)
"""


@query("centroid_separation_audit", oracle=_CENTROID_SEP_ORACLE)
def centroid_separation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-GEOMETRY audit of the embedding space: per label, its
    centroid's squared norm and the nearest OTHER label's centroid
    (identity + squared distance) — collapsing centroids (tiny
    nearest_dist2 relative to norms) are the classic symptom of
    label leakage, dead features, or an encoder that never separated
    the classes; the pairwise view is the confusion-matrix prior you
    get before training any probe. Complements
    embedding_label_centroids (marginal moments) with the
    BETWEEN-label structure.

    Determinism: per-dimension centroid components are ROUND(6)
    quantized in BOTH engines before any distance math, so the
    pairwise sums run over identical inputs; nearest selection
    tie-breaks on (distance, label).

    100 TB shape: one explode + (label, dim) hash aggregate over the
    vectors (map-side combinable), then every later step runs on the
    |labels| x dims centroid frame (~640 rows) — self-join, norms and
    the nearest-pick window all operate on post-aggregate data, never
    the vector table. Reference parity: none — embedding-diagnostics
    extension."""
    from pyspark.sql import Window

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
    )
    cent = (
        v.groupBy("label", (F.col("i0") + 1).alias("i"))
        .agg(F.round(F.sum("x") / F.count(F.lit(1)), 6).alias("c"))
    )
    counts = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )
    norms = cent.groupBy("label").agg(
        F.round(F.sum(F.col("c") * F.col("c")), 6).alias("centroid_norm2")
    )
    a = cent.select(
        F.col("label").alias("la"), "i", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("lb"), "i", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, (a.i == b.i) & (F.col("la") != F.col("lb")))
        .groupBy("la", "lb")
        .agg(
            F.round(
                F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))),
                6,
            ).alias("d2")
        )
    )
    nearest = (
        pairs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("la").orderBy(F.col("d2"), F.col("lb"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("la").alias("label"),
            F.col("lb").alias("nearest_label"),
            F.col("d2").alias("nearest_dist2"),
        )
    )
    return counts.join(norms, "label").join(nearest, "label")


# ----------------------------------- simplified silhouette by label
# Per-POINT clustering quality against ROUND(6)-quantized label
# centroids (the centroid_separation_audit determinism convention):
# a(i) = distance to own centroid, b(i) = distance to the nearest
# OTHER centroid, s(i) = (b-a)/max(a,b) — the "simplified silhouette"
# (centroid-based; Hruschka et al. 2004), O(n*k) where the classic
# pairwise silhouette is O(n^2).
_SILHOUETTE_ORACLE = """
WITH v AS (
    SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
cent AS (
    SELECT label AS l2, i, ROUND(SUM(x) / COUNT(*), 6) AS c
    FROM v GROUP BY label, i
),
d AS (
    SELECT v.vec_id, v.label, cent.l2,
           sqrt(SUM((v.x - cent.c) * (v.x - cent.c))) AS dist
    FROM v JOIN cent ON v.i = cent.i
    GROUP BY 1, 2, 3
),
ab AS (
    SELECT vec_id, label,
           MAX(CASE WHEN l2 = label THEN dist END) AS a,
           MIN(CASE WHEN l2 <> label THEN dist END) AS b
    FROM d GROUP BY 1, 2
),
s AS (
    SELECT vec_id, label, a, b,
           CASE WHEN a > b THEN (b - a) / a
                WHEN b > a THEN (b - a) / b
                ELSE 0.0 END AS sil
    FROM ab
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(SUM(sil) / COUNT(*), 6) AS mean_silhouette,
       ROUND(SUM(CASE WHEN sil < 0 THEN 1.0 ELSE 0 END) / COUNT(*), 6)
           AS frac_negative,
       ROUND(SUM(a) / COUNT(*), 6) AS mean_intra_dist,
       ROUND(SUM(b) / COUNT(*), 6) AS mean_nearest_dist
FROM s GROUP BY label
"""


@query("silhouette_by_label", oracle=_SILHOUETTE_ORACLE)
def silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPLIFIED SILHOUETTE score per label: for every vector,
    a = distance to its own label centroid, b = distance to the
    nearest other centroid, s = (b-a)/max(a,b); the per-label mean and
    the fraction of NEGATIVE scores (points sitting closer to a
    foreign centroid — the individually-misassigned rows that
    centroid_separation_audit's cluster-level geometry cannot see).
    The centroid-based formulation (Hruschka et al. 2004) is O(n*k)
    against the classic silhouette's O(n^2) pairwise distances — the
    only silhouette a 100 TB corpus can afford, and the standard
    eval for IVF cell quality (embedding_ivf_topk trains on the same
    label partition).

    Determinism: centroids are ROUND(6)-quantized on BOTH engines
    before any distance (the centroid_separation_audit convention);
    per-point distance sums over 64 dims carry ~1e-16 relative
    accumulation noise, far from the ROUND 6 readout boundary; the
    s<0 comparison flips only if a point is equidistant to two
    centroids within ~1e-14 relative (measure-zero; same risk class
    as every argmin in the registry). The (b-a)/max(a,b) branch is
    written as an explicit CASE shared by both engines.

    100 TB shape: one explode + (label, dim) aggregate builds the
    k x dims centroid frame (broadcastable); the distance pass is one
    map-side join of exploded vectors against ALL centroids —
    n*k*dims rows but zero extra scans — then (vec, label) and label
    rollups. Nothing is quadratic in corpus size."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
    ).withColumn("i", F.col("i0") + 1).drop("i0")
    cent = (
        v.groupBy(F.col("label").alias("l2"), "i")
        .agg(F.round(F.sum("x") / F.count(F.lit(1)), 6).alias("c"))
    )
    d = (
        v.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "l2")
        .agg(
            F.sqrt(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            ).alias("dist")
        )
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("l2") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("l2") != F.col("label"), F.col("dist"))).alias("b"),
    )
    s = ab.withColumn(
        "sil",
        F.when(F.col("a") > F.col("b"), (F.col("b") - F.col("a")) / F.col("a"))
        .when(F.col("b") > F.col("a"), (F.col("b") - F.col("a")) / F.col("b"))
        .otherwise(F.lit(0.0)),
    )
    return s.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.sum("sil") / F.count(F.lit(1)), 6).alias("mean_silhouette"),
        F.round(
            F.sum(F.when(F.col("sil") < 0, F.lit(1.0)).otherwise(F.lit(0.0)))
            / F.count(F.lit(1)),
            6,
        ).alias("frac_negative"),
        F.round(F.sum("a") / F.count(F.lit(1)), 6).alias("mean_intra_dist"),
        F.round(F.sum("b") / F.count(F.lit(1)), 6).alias("mean_nearest_dist"),
    )


# ------------------------------- int8 quantization recall audit
# Does the 4x storage cut (embedding_int8_quant) cost retrieval
# quality? For each query vector: exact float inner-product top-K vs
# top-K under symmetric int8 codes (integer dot x the two per-vector
# scales). Both rankings order ROUND(score, 6) with a vec_id tiebreak
# (the knn_join determinism convention: rounding makes near-ties exact
# ties, broken by id on both engines).
INT8_RECALL_K = 10
INT8_RECALL_BATCH = 10  # query vectors: vec_id 0..9

_INT8_CODES_DUCK = """
SELECT vec_id,
       list_transform(emb, x -> least(127.0, greatest(-127.0,
           floor(x * 127.0 / m + 0.5)))) AS codes,
       m / 127.0 AS scale
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings)
WHERE m > 0
"""

_INT8_RECALL_ORACLE = f"""
WITH c AS ({_INT8_CODES_DUCK}),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS q_id, emb AS qemb FROM v WHERE vec_id < {INT8_RECALL_BATCH}),
qc AS (SELECT vec_id AS q_id, codes AS qcodes, scale AS qscale
       FROM c WHERE vec_id < {INT8_RECALL_BATCH}),
ex AS (
    SELECT q.q_id, v.vec_id
    FROM v, q
    WHERE v.vec_id <> q.q_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY q.q_id
        ORDER BY ROUND(list_inner_product(v.emb, q.qemb), 6) DESC, v.vec_id)
        <= {INT8_RECALL_K}
),
qu AS (
    SELECT qc.q_id, c.vec_id
    FROM c, qc
    WHERE c.vec_id <> qc.q_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qc.q_id
        ORDER BY ROUND(list_inner_product(c.codes, qc.qcodes)
                       * c.scale * qc.qscale, 6) DESC, c.vec_id)
        <= {INT8_RECALL_K}
)
SELECT ex.q_id, CAST(COUNT(qu.vec_id) AS BIGINT) AS n_kept,
       ROUND(CAST(COUNT(qu.vec_id) AS DOUBLE) / {INT8_RECALL_K}, 6)
           AS recall_at_k
FROM ex LEFT JOIN qu ON ex.q_id = qu.q_id AND ex.vec_id = qu.vec_id
GROUP BY ex.q_id
"""


@query("int8_recall_audit", oracle=_INT8_RECALL_ORACLE)
def int8_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@{INT8_RECALL_K} of int8-quantized inner-product retrieval
    against the exact float ranking, per query vector — the eval that
    closes embedding_int8_quant's loop: that query reports
    reconstruction MAE (a proxy); this one measures the thing the
    vector store actually sells, whether the top-K under 1-byte codes
    still contains the float top-K. The quantization axis of the same
    audit family as ivf_probe_recall_curve (probe axis) and
    lsh_recall_audit (banding axis).

    Scoring: integer code dot x the two per-vector scales
    (codes = floor(x*127/m + 0.5) clamped, m = max |component| — the
    embedding_int8_quant formula verbatim, so the audit measures the
    SHIPPED quantizer). Both rankings order ROUND(score, 6) with a
    vec_id tiebreak — the knn_join convention that turns cross-engine
    near-ties into exact ties.

    100 TB shape: the query batch broadcasts; each corpus partition
    scores locally (integer dot = aggregate over zipped arrays inside
    codegen); per-query top-K is a q_id-bounded window. Two passes
    (float + int8) over one scan each; the recall join touches
    2 x batch x K rows."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb")
    )
    # codes bound via the expression-level let (embedding_int8_quant
    # convention): the per-vector scale feeds every element's quantize
    codes = emb.select(
        "vec_id",
        F.expr(
            "transform(array(array_max(transform(emb, x -> abs(x)))), m -> "
            "struct(transform(emb, x -> least(127.0d, greatest(-127.0d, "
            "floor(x * 127.0d / m + 0.5d)))) AS codes, "
            "m / 127.0d AS scale))[0]"
        ).alias("s"),
    ).filter(F.col("s.scale") > 0).select(
        "vec_id", F.col("s.codes").alias("codes"), F.col("s.scale").alias("scale")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    qf = emb.filter(F.col("vec_id") < INT8_RECALL_BATCH).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("qemb")
    )
    qc = codes.filter(F.col("vec_id") < INT8_RECALL_BATCH).select(
        F.col("vec_id").alias("q_id"),
        F.col("codes").alias("qcodes"),
        F.col("scale").alias("qscale"),
    )
    wex = Window.partitionBy("q_id").orderBy(F.col("score").desc(), "vec_id")
    ex = (
        emb.crossJoin(F.broadcast(qf))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(dot(F.col("emb"), F.col("qemb")), 6).alias("score"))
        .withColumn("rk", F.row_number().over(wex))
        .filter(F.col("rk") <= INT8_RECALL_K)
        .select("q_id", "vec_id")
    )
    qu = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(
                dot(F.col("codes"), F.col("qcodes")) * F.col("scale") * F.col("qscale"),
                6,
            ).alias("score"),
        )
        .withColumn("rk", F.row_number().over(wex))
        .filter(F.col("rk") <= INT8_RECALL_K)
        .select(F.col("q_id").alias("uq"), F.col("vec_id").alias("uv"))
    )
    return (
        ex.join(
            qu, (ex.q_id == qu.uq) & (ex.vec_id == qu.uv), "left"
        )
        .groupBy("q_id")
        .agg(
            F.count("uv").cast("long").alias("n_kept"),
            F.round(F.count("uv").cast("double") / INT8_RECALL_K, 6).alias(
                "recall_at_k"
            ),
        )
    )
