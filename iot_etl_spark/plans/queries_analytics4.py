"""Fourth analytics batch (round 7): the remaining first-class legs —

- **Exact distinct at scale**: `bitmap_exact_distinct` — roaring-style
  bitmap aggregation (Spark 4 `bitmap_construct_agg`/`bitmap_count`),
  the EXACT mergeable distinct-count the warehouse family (Doris /
  ClickHouse bitmap engines) maintains where HLL's ±2% is not
  acceptable; the oracle runs COUNT(DISTINCT) so two independent
  algorithms must agree bit-for-bit.
- **Privacy risk**: `k_anonymity_audit` — k-anonymity group sizes and
  l-diversity of the sensitive column over a quasi-identifier tuple,
  the release-gate audit a training-data pipeline runs beside
  pii_redaction_stats before publishing a corpus slice.
- **Closed-form distributed ML**: `ridge_normal_equations` — ridge
  regression fit as ONE scan of exact DECIMAL moment aggregates
  (X'X, X'y) + a Cramer's-rule solve on the 1-row moments frame; the
  canonical "training as aggregation" shape (normal equations) that
  needs no iteration and no driver-side data.
- **Uncertainty quantification**: `conformal_prediction_interval` —
  Mondrian (per-group) split-conformal intervals: hash-split
  train/calibration/test, exact order-statistic radius on the
  calibration scores via the cumulative-count-over-value-cells
  device (same pattern as weighted_median_price — never a global
  row window), empirical coverage on the held-out split.
- **Graph reachability**: `bfs_hop_distance` — min-hop BFS from the
  lowest active user over the capped co-activity graph, unrolled as
  k frontier joins (the iterative-join sibling of PageRank); the
  oracle is a DuckDB recursive CTE, an independent algorithm.

Registry conventions apply (registry.py): exact DECIMAL/BIGINT
accumulation with micro/nano-unit quantization before any double sum,
ROUND(x, 6) on computed doubles both sides, deterministic tiebreaks
on every ORDER BY feeding a LIMIT, shared-verbatim double expressions
with EXPLICIT double casts on every literal (SCALE.md Catalyst trap
#7: bare decimal literals truncate under decimal division).

Reference parity: none of these exist in the reference
(kaonasty/iot-etl) — they extend the dedup/audit/ML-prep families the
brief names as first-class engine components beyond the reference's
19 analytical queries (warehouse/analytical_queries.sql:1-296).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iot_etl_spark.plans.graphedges import (
    COACT_BUCKET_CAP,
    capped_coactivity_edges,
    capped_minute_activity,
    duck_capped_activity,
)
from iot_etl_spark.plans.registry import query
from iot_etl_spark.sources.tables import load_table


# ------------------------------------------------ bitmap exact distinct
_BITMAP_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""


@query("bitmap_exact_distinct", oracle=_BITMAP_ORACLE)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via bitmap aggregation —
    the mergeable exact-distinct structure (Doris/ClickHouse bitmap
    columns, roaring bitmaps) for when HLL's error bound
    (hll_distinct_audit) is not acceptable: ids map to (bucket, bit)
    with `bitmap_bucket_number`/`bitmap_bit_position`, each bucket
    folds to a fixed 4 KB bitmap via `bitmap_construct_agg`
    (map-side partial merge — the whole point), and the final count
    is a SUM of per-bucket popcounts.

    Two independent algorithms must agree: the oracle runs
    COUNT(DISTINCT user_id).

    100 TB shape: state per (type, bucket) is a constant 4 KB
    regardless of row count, buckets shard the id space so no single
    reducer holds the whole id universe (unlike COUNT(DISTINCT)'s
    per-group hash set), and bitmap partials merge associatively —
    this is the continuous-aggregate-friendly exact distinct."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(
            F.expr("bitmap_construct_agg(pos)").alias("bm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("distinct_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


# ------------------------------------------------ k-anonymity / l-diversity
KANON_K = 5
KANON_L = 3
_KANON_BAND = 100  # n_chars quasi-identifier band width

_KANON_ORACLE = f"""
WITH g AS (
    SELECT source, n_chars // {_KANON_BAND} AS band,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS l
    FROM documents
    GROUP BY 1, 2
)
SELECT CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN k < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_k_violating,
       CAST(SUM(CASE WHEN k < {KANON_K} THEN k ELSE 0 END) AS BIGINT)
           AS rows_at_risk,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_k,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l < {KANON_L} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_l_violating,
       ROUND(CAST(SUM(l) AS DOUBLE) / COUNT(*), 6) AS avg_l
FROM g
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit over the documents
    table: quasi-identifier = (source, length band); sensitive
    attribute = lang. A row is re-identifiable when its QI group has
    k < 5 members (Sweeney's k-anonymity); a group leaks the
    sensitive value when it carries l < 3 distinct languages
    (Machanavajjhala's l-diversity). The corpus-release sibling of
    pii_redaction_stats: that one scrubs values, this one measures
    whether the released SCHEMA still identifies people.

    100 TB shape: one groupBy on the QI tuple (map-side combine;
    distinct-lang per group is a tiny exact set — bounded by the
    language universe, not row count) then a single-row rollup.
    Nothing scales with data but the scan."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy(
            "source",
            (F.col("n_chars") / _KANON_BAND).cast("long").alias("band"),
        )
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("lang").alias("l"),
        )
    )
    return g.agg(
        F.sum("k").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.sum(F.when(F.col("k") < KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("groups_k_violating"),
        F.sum(F.when(F.col("k") < KANON_K, F.col("k")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < KANON_L, 1).otherwise(0))
        .cast("long")
        .alias("groups_l_violating"),
        F.round(F.sum("l").cast("double") / F.count(F.lit(1)), 6).alias("avg_l"),
    )


# ------------------------------------------------ ridge via normal equations
RIDGE_LAMBDA = "CAST(1.0 AS DOUBLE)"

# Shared-verbatim Cramer's-rule solve of (X'X + lambda*I) beta = X'y
# over the 1-row moments frame (columns n s1 s2 s11 s12 s22 sy s1y
# s2y syy, all already DOUBLE). Only * + - / on doubles with an
# identical expression tree on both engines -> bit-identical betas.
_A11 = f"(n + {RIDGE_LAMBDA})"
_A22 = f"(s11 + {RIDGE_LAMBDA})"
_A33 = f"(s22 + {RIDGE_LAMBDA})"
_DET = (
    f"({_A11} * ({_A22} * {_A33} - s12 * s12)"
    f" - s1 * (s1 * {_A33} - s12 * s2)"
    f" + s2 * (s1 * s12 - {_A22} * s2))"
)
_B0 = (
    f"((sy * ({_A22} * {_A33} - s12 * s12)"
    f" - s1 * (s1y * {_A33} - s12 * s2y)"
    f" + s2 * (s1y * s12 - {_A22} * s2y)) / {_DET})"
)
_B1 = (
    f"(({_A11} * (s1y * {_A33} - s12 * s2y)"
    f" - sy * (s1 * {_A33} - s12 * s2)"
    f" + s2 * (s1 * s2y - s1y * s2)) / {_DET})"
)
_B2 = (
    f"(({_A11} * ({_A22} * s2y - s1y * s12)"
    f" - s1 * (s1 * s2y - s1y * s2)"
    f" + sy * (s1 * s12 - {_A22} * s2)) / {_DET})"
)
# Training MSE from the same moments: (y'y - 2 b.X'y + b.X'X b) / n
# (raw X'X here, not the ridge-augmented matrix).
_MSE = (
    "((syy - CAST(2.0 AS DOUBLE) * (b0 * sy + b1 * s1y + b2 * s2y)"
    " + (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22"
    " + CAST(2.0 AS DOUBLE) * (b0 * b1 * s1 + b0 * b2 * s2 + b1 * b2 * s12)))"
    " / n)"
)

_RIDGE_MOMENTS_DUCK = """
    SELECT CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS n,
           CAST(SUM(q) AS DOUBLE) AS s1,
           CAST(SUM(d) AS DOUBLE) AS s2,
           CAST(SUM(q * q) AS DOUBLE) AS s11,
           CAST(SUM(q * d) AS DOUBLE) AS s12,
           CAST(SUM(d * d) AS DOUBLE) AS s22,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(q * y) AS DOUBLE) AS s1y,
           CAST(SUM(d * y) AS DOUBLE) AS s2y,
           CAST(SUM(y * y) AS DOUBLE) AS syy,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM (
        SELECT CAST(l_quantity AS DECIMAL(18,2)) AS q,
               CAST(l_discount AS DECIMAL(18,2)) AS d,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem
    )
"""

_RIDGE_ORACLE = f"""
WITH m AS ({_RIDGE_MOMENTS_DUCK}),
b AS (
    SELECT n_rows, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
           {_B0} AS b0, {_B1} AS b1, {_B2} AS b2
    FROM m
)
SELECT n_rows,
       ROUND(b0, 6) AS beta_intercept,
       ROUND(b1, 6) AS beta_quantity,
       ROUND(b2, 6) AS beta_discount,
       ROUND({_MSE}, 6) AS train_mse
FROM b
"""


@query("ridge_normal_equations", oracle=_RIDGE_ORACLE)
def ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (l_extendedprice ~ l_quantity + l_discount,
    lambda=1) fit by normal equations: the ENTIRE training pass is one
    scan producing ten moment aggregates (X'X upper triangle, X'y,
    y'y) — exact DECIMAL sums since quantity/discount/price are 2-dp
    decimals — then Cramer's rule solves the 3x3 system on the 1-row
    moments frame. Training MSE falls out of the same moments with no
    second data pass. "Distributed model training as aggregation":
    no iteration, no driver-side data, no UDF.

    Two independent implementations agree because the solve
    expression tree is shared VERBATIM with the oracle (doubles from
    identical exact decimals -> bit-identical arithmetic).

    100 TB shape: map-side partial aggregation all the way — the
    shuffle carries 32 partial rows of 10 decimals; the solve is O(1).
    Adding features grows the moment count quadratically but the
    pattern holds through d~100 (then you'd switch to L-BFGS over the
    same scan)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        F.col("l_discount").cast("decimal(18,2)").alias("d"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("q").alias("rs1"),
        F.sum("d").alias("rs2"),
        F.sum(F.col("q") * F.col("q")).alias("rs11"),
        F.sum(F.col("q") * F.col("d")).alias("rs12"),
        F.sum(F.col("d") * F.col("d")).alias("rs22"),
        F.sum("y").alias("rsy"),
        F.sum(F.col("q") * F.col("y")).alias("rs1y"),
        F.sum(F.col("d") * F.col("y")).alias("rs2y"),
        F.sum(F.col("y") * F.col("y")).alias("rsyy"),
    ).select(
        "n_rows",
        F.col("n_rows").cast("double").alias("n"),
        F.col("rs1").cast("double").alias("s1"),
        F.col("rs2").cast("double").alias("s2"),
        F.col("rs11").cast("double").alias("s11"),
        F.col("rs12").cast("double").alias("s12"),
        F.col("rs22").cast("double").alias("s22"),
        F.col("rsy").cast("double").alias("sy"),
        F.col("rs1y").cast("double").alias("s1y"),
        F.col("rs2y").cast("double").alias("s2y"),
        F.col("rsyy").cast("double").alias("syy"),
    )
    b = m.select(
        "*",
        F.expr(_B0).alias("b0"),
        F.expr(_B1).alias("b1"),
        F.expr(_B2).alias("b2"),
    )
    return b.select(
        "n_rows",
        F.round(F.col("b0"), 6).alias("beta_intercept"),
        F.round(F.col("b1"), 6).alias("beta_quantity"),
        F.round(F.col("b2"), 6).alias("beta_discount"),
        F.round(F.expr(_MSE), 6).alias("train_mse"),
    )


# ------------------------------------------------ split-conformal intervals
CONFORMAL_ALPHA_COMPL = "CAST(0.9 AS DOUBLE)"  # 1 - alpha
CONFORMAL_FOLDS = 5  # folds 0-2 train, 3 calibration, 4 test

_CONF_FOLD_SPARK = (
    "cast(conv(substr(md5(cast(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    f" % {CONFORMAL_FOLDS}"
)
_CONF_FOLD_DUCK = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {CONFORMAL_FOLDS}"
)

_CONF_ORACLE = f"""
WITH ev AS (
    SELECT event_type, {_CONF_FOLD_DUCK} AS fold,
           CAST(ROUND(value * 1e6) AS BIGINT) AS vq
    FROM events
),
pred AS (
    SELECT event_type,
           CAST(SUM(vq) AS DOUBLE) / CAST(COUNT(*) AS BIGINT) AS pred_micro
    FROM ev WHERE fold <= 2 GROUP BY 1
),
calib AS (
    SELECT e.event_type,
           CAST(ROUND(ABS(CAST(vq AS DOUBLE) - pred_micro)) AS BIGINT) AS cell
    FROM ev e JOIN pred p ON p.event_type = e.event_type
    WHERE fold = 3
),
nc AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_calib,
           CAST(CEIL((COUNT(*) + 1) * {CONFORMAL_ALPHA_COMPL}) AS BIGINT) AS k
    FROM calib GROUP BY 1
),
cells AS (
    SELECT event_type, cell, COUNT(*) AS cnt FROM calib GROUP BY 1, 2
),
cum AS (
    SELECT event_type, cell,
           SUM(cnt) OVER (
               PARTITION BY event_type ORDER BY cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM cells
),
q AS (
    SELECT c.event_type, MIN(cell) AS q_cell
    FROM cum c JOIN nc ON nc.event_type = c.event_type
    WHERE cum >= k GROUP BY 1
),
test AS (
    SELECT e.event_type,
           CASE WHEN CAST(ROUND(ABS(CAST(vq AS DOUBLE) - pred_micro))
                     AS BIGINT) <= q_cell
                THEN 1 ELSE 0 END AS covered
    FROM ev e
    JOIN pred p ON p.event_type = e.event_type
    JOIN q ON q.event_type = e.event_type
    WHERE fold = 4
)
SELECT t.event_type,
       nc.n_calib,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(CAST(q.q_cell AS DOUBLE) / 1e6, 6) AS interval_radius,
       ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 6) AS coverage
FROM test t
JOIN nc ON nc.event_type = t.event_type
JOIN q ON q.event_type = t.event_type
GROUP BY t.event_type, nc.n_calib, q.q_cell
"""


@query("conformal_prediction_interval", oracle=_CONF_ORACLE)
def conformal_prediction_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian (per-event-type) split-conformal prediction intervals
    (Vovk; Papadopoulos et al.) — the distribution-free uncertainty
    wrapper every forecast family member (holt_forecast_*,
    seasonal_naive_backtest) should ship with: hash-split users into
    train/calibration/test (the leakage-free group split device of
    group_kfold_assign), fit the per-type mean on train, take the
    ceil((n+1)(1-alpha)) order statistic of |y - pred| on calibration
    as the radius, report empirical coverage on test (guaranteed
    >= 90% in expectation).

    The order statistic uses the cumulative-count-over-value-cells
    device (micro-unit quantized scores, same pattern as
    weighted_median_price): a window over the per-(type, cell)
    PRE-AGGREGATE partitioned by type — never a global row-level
    window (contrast rfm_segments' global-NTILE exact/approx pair).

    100 TB shape: two scans of events (moments + scoring), shuffles
    keyed by event_type or (type, cell); per-type cell counts are
    bounded by score resolution, not row count; the k-threshold
    frame is group-cardinality and broadcast back."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(_CONF_FOLD_SPARK).alias("fold"),
        F.expr("CAST(ROUND(value * 1e6) AS BIGINT)").alias("vq"),
    )
    pred = (
        ev.filter(F.col("fold") <= 2)
        .groupBy("event_type")
        .agg(
            (F.sum("vq").cast("double") / F.count(F.lit(1)))
            .alias("pred_micro")
        )
    )
    scored = ev.join(F.broadcast(pred), "event_type").withColumn(
        "cell",
        F.expr("CAST(ROUND(ABS(CAST(vq AS DOUBLE) - pred_micro)) AS BIGINT)"),
    )
    calib = scored.filter(F.col("fold") == 3)
    nc = calib.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_calib"),
        F.expr(
            f"CAST(CEIL((COUNT(*) + 1) * {CONFORMAL_ALPHA_COMPL}) AS BIGINT)"
        ).alias("k"),
    )
    cells = calib.groupBy("event_type", "cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("cum", F.sum("cnt").over(w))
    q = (
        cum.join(F.broadcast(nc), "event_type")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("event_type")
        .agg(F.min("cell").alias("q_cell"))
    )
    test = (
        scored.filter(F.col("fold") == 4)
        .join(F.broadcast(q), "event_type")
        .withColumn(
            "covered",
            F.when(F.col("cell") <= F.col("q_cell"), 1).otherwise(0),
        )
    )
    return (
        test.groupBy("event_type", "q_cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("covered").alias("n_covered"),
        )
        .join(F.broadcast(nc.select("event_type", "n_calib")), "event_type")
        .select(
            "event_type",
            "n_calib",
            "n_test",
            F.round(F.col("q_cell").cast("double") / F.lit(1e6), 6).alias(
                "interval_radius"
            ),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


# ------------------------------------------------ BFS min-hop distance
BFS_MAX_HOPS = 4

_BFS_ORACLE = f"""
WITH RECURSIVE a AS (
    SELECT b, user_id FROM {duck_capped_activity(
        "epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) // 1000000",
        COACT_BUCKET_CAP,
    )}
),
e AS (
    SELECT DISTINCT x.user_id AS ua, y.user_id AS ub
    FROM a x JOIN a y ON x.b = y.b AND x.user_id < y.user_id
),
und AS (
    SELECT ua AS u, ub AS v FROM e
    UNION ALL
    SELECT ub AS u, ua AS v FROM e
),
seed AS (SELECT MIN(user_id) AS s FROM a),
walk(u, d) AS (
    SELECT s, 0 FROM seed
    UNION
    SELECT und.v, walk.d + 1
    FROM walk JOIN und ON und.u = walk.u
    WHERE walk.d < {BFS_MAX_HOPS}
),
dist AS (SELECT u, MIN(d) AS hop FROM walk GROUP BY 1)
SELECT hop,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(u) AS BIGINT) AS min_user,
       CAST(MAX(u) AS BIGINT) AS max_user
FROM dist
GROUP BY hop
"""


@query("bfs_hop_distance", oracle=_BFS_ORACLE)
def bfs_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS from the lowest active user over the capped
    co-activity graph, unrolled to {BFS_MAX_HOPS} frontier-join
    iterations — the reachability sibling of pagerank_device_graph's
    iterative-join pattern and the primitive behind "blast radius" /
    influence-propagation questions. The oracle computes the same
    distances with a DuckDB recursive CTE (UNION-dedup per step), an
    independent algorithm that must agree.

    Frontier discipline: each hop joins ONLY the previous frontier
    against the adjacency list, anti-joins the visited set, and
    dedups — work per hop is O(frontier x avg-degree), the textbook
    distributed BFS. Edges come from the shared stage-cached capped
    adjacency artifact (graphedges.capped_coactivity_edges), so the
    pair expansion never re-runs per hop.

    100 TB shape: adjacency is a materialized artifact partitioned by
    source vertex; each hop is one shuffle keyed by vertex; the
    visited set grows monotonically but stays (vertex, hop) — columnar
    and compact. Hop count is fixed, so the plan is static (no
    driver-side convergence loop)."""
    edges = capped_coactivity_edges(spark, sf_dir)
    und = edges.select(
        F.col("ua").alias("u"), F.col("ub").alias("v")
    ).unionAll(edges.select(F.col("ub").alias("u"), F.col("ua").alias("v")))

    act = capped_minute_activity(spark, sf_dir)
    seed = act.agg(F.min("user_id").alias("u")).withColumn("hop", F.lit(0))

    visited = seed  # (u, hop)
    frontier = seed.select("u")
    for h in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, "u")
            .select(F.col("v").alias("u"))
            .distinct()
            .join(visited.select("u"), "u", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        visited = visited.unionAll(nxt)
        frontier = nxt.select("u")
    return visited.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("u").cast("long").alias("min_user"),
        F.max("u").cast("long").alias("max_user"),
    )
