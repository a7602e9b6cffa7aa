"""Round-10 analytics batch: distribution-free group comparison
(Kruskal-Wallis via tie-group prefix sums), variance-homogeneity
testing (Brown-Forsythe), residual autocorrelation (Durbin-Watson),
out-of-sample forecast scaling (MASE), intermittent-demand forecasting
(Croston), dose-response trend in proportions (Cochran-Armitage), and
weighted priority sampling (Duffield-Lund-Thorup) for training-data
mixing.

Reference parity: none of these exist in the reference (its analytics
surface is ~327 lines of TimescaleDB SQL, `analytical_queries.sql`);
they deepen the established lanes — the nonparametric statistics
battery (next to mannwhitney/kruskal gap, anova_oneway, levene gap),
forecast eval (next to theil_u, pinball, seasonal_naive_backtest), and
the sampling/mixing toolkit (next to pps_sample_estimate,
reservoir_sample_per_type) — each with a DuckDB oracle and an explicit
100 TB shape note.

Determinism: integer micro/milli-unit quantization before any sum;
rank math from tie-group prefix sums over distinct-value cells (never
a global per-row sort); wide accumulators in DECIMAL(38,0) (oracle
HUGEINT) so ANSI throws instead of wrapping; every computed double is
ROUND(x, 6); the priority-sampling sort key is ONE IEEE division of
exact inputs (hash integer, quantized weight) — deliberately the
Duffield-Lund-Thorup priority scheme rather than Efraimidis-Spirakis,
whose pow/ln key could differ by an ulp across engines and reorder
near-ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iot_etl_spark.plans.registry import query, DUCK_TS, duck_bucket_epoch
from iot_etl_spark.sources.tables import load_table

# --------------------------------------------- Kruskal-Wallis H test
# Tie-aware rank math WITHOUT a global per-row sort (the gini
# tie-group pattern, queries_analytics6.py): quantize value to milli
# units, build (value, type) count cells, then the average rank of the
# tie group at value v is prev_v + (c_v + 1)/2 where prev_v is the
# cumulative count of smaller values. Everything stays integer by
# carrying 2*rank: 2*avgrank = 2*prev + c + 1. Rank sums are
# DECIMAL(38,0) (R2_j <= 2N * n_j ~ N^2 at worst).
_KW_Q = 1000  # milli-unit quantization caps the distinct-value cells

_KW_ORACLE = f"""
WITH ev AS (
    SELECT event_type, CAST(ROUND(value * {_KW_Q}, 0) AS BIGINT) AS vq
    FROM events WHERE value IS NOT NULL
),
cells AS (
    SELECT vq, event_type, CAST(COUNT(*) AS BIGINT) AS cvj
    FROM ev GROUP BY 1, 2
),
vals AS (
    SELECT vq, CAST(SUM(cvj) AS BIGINT) AS cv FROM cells GROUP BY 1
),
w AS (
    SELECT vq, cv,
           CAST(COALESCE(SUM(cv) OVER (ORDER BY vq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prev
    FROM vals
),
grp AS (
    SELECT c.event_type,
           CAST(SUM(c.cvj) AS BIGINT) AS nj,
           CAST(SUM(CAST(c.cvj AS HUGEINT)
                    * (2 * CAST(w.prev AS HUGEINT) + w.cv + 1)) AS HUGEINT)
               AS r2j
    FROM cells c JOIN w ON c.vq = w.vq
    GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(cv) AS BIGINT) AS n,
           CAST(SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS HUGEINT) AS tsum
    FROM w
),
h AS (
    SELECT CAST(SUM(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)
                    / CAST(nj AS DOUBLE)) AS DOUBLE) AS sr
    FROM grp
)
SELECT g.event_type, g.nj AS n_group,
       ROUND(CAST(g.r2j AS DOUBLE) / (2.0 * CAST(g.nj AS DOUBLE)), 6)
           AS mean_rank,
       t.n AS n_total,
       ROUND(3.0 * h.sr / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1))
             - 3.0 * (CAST(t.n AS DOUBLE) + 1), 6) AS h_stat,
       ROUND((3.0 * h.sr / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1))
              - 3.0 * (CAST(t.n AS DOUBLE) + 1))
             / (1.0 - CAST(t.tsum AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                         * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE))), 6)
           AS h_tie_corrected
FROM grp g, tot t, h
"""


@query("kruskal_wallis_value_by_type", oracle=_KW_ORACLE)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H test of `value` across the five event types —
    the distribution-free one-way ANOVA (the k-group generalization of
    mannwhitney_weekend_value, and the rank twin of anova_oneway_value,
    which assumes normality). Tie-corrected: H / (1 - sum(t^3-t)/(N^3-N))
    over tie-group sizes t.

    Rank construction is SORT-FREE (the gini tie-group identity):
    values quantize to milli-unit BIGINT cells; the average rank of a
    tie group is prev + (c+1)/2, carried as the INTEGER 2*rank so the
    per-group rank sums R2_j = sum(c_vj * (2*prev + c_v + 1)) stay
    exact in DECIMAL(38,0) (oracle HUGEINT). Doubles appear only in
    the final shared-verbatim readout, H = (3/ (N(N+1))) * sum(R2_j^2
    / n_j) - 3(N+1) (the factor 3 instead of 12 absorbs the carried
    factor-2 of the ranks). sum over 5 groups -> accumulation-order
    noise ~1e-15 relative, far from the ROUND 6 boundary.

    100 TB shape: one (value, type) cell aggregate (map-side combine;
    cell count bounded by value range * quantization, not row count),
    a cumulative window over the bounded distinct-value frame, one
    per-type rollup. No global per-row sort anywhere."""
    dec = "decimal(38,0)"
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * _KW_Q, 0).cast("long").alias("vq"),
        )
    )
    cells = ev.groupBy("vq", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cvj")
    )
    vals = cells.groupBy("vq").agg(F.sum("cvj").cast("long").alias("cv"))
    wprev = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    w = vals.select(
        "vq", "cv",
        F.coalesce(F.sum("cv").over(wprev), F.lit(0)).cast("long").alias("prev"),
    )
    grp = (
        cells.join(w, "vq")
        .groupBy("event_type")
        .agg(
            F.sum("cvj").cast("long").alias("nj"),
            F.sum(
                F.col("cvj").cast(dec)
                * (2 * F.col("prev") + F.col("cv") + 1).cast(dec)
            ).alias("r2j"),
        )
    )
    tot = w.agg(
        F.sum("cv").cast("long").alias("n"),
        F.sum(
            F.col("cv").cast(dec) * F.col("cv").cast(dec) * F.col("cv").cast(dec)
            - F.col("cv").cast(dec)
        ).alias("tsum"),
    )
    h = grp.agg(
        F.sum(
            F.col("r2j").cast("double") * F.col("r2j").cast("double")
            / F.col("nj").cast("double")
        ).alias("sr")
    )
    nd = F.col("n").cast("double")
    h_raw = 3.0 * F.col("sr") / (nd * (nd + 1)) - 3.0 * (nd + 1)
    tie = 1.0 - F.col("tsum").cast("double") / (nd * nd * nd - nd)
    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(h))
        .select(
            "event_type",
            F.col("nj").alias("n_group"),
            F.round(
                F.col("r2j").cast("double") / (2.0 * F.col("nj").cast("double")), 6
            ).alias("mean_rank"),
            F.col("n").alias("n_total"),
            F.round(h_raw, 6).alias("h_stat"),
            F.round(h_raw / tie, 6).alias("h_tie_corrected"),
        )
    )


# ------------------------------------------ Brown-Forsythe variance test
# Levene's test with the group MEDIAN center (Brown-Forsythe 1974) —
# robust to non-normality. Both engines compute the exact interpolated
# median (Spark F.median == DuckDB median = quantile_cont(0.5): same
# order statistics, same lo + (hi-lo)*0.5 interpolation), then the
# one-way ANOVA runs on z = |x - med_g| from per-group moment sums
# with the final W assembled from a shared-verbatim expression.
_BF_W_SQL = (
    "((CAST(n AS DOUBLE) - k) / (k - 1))"
    " * (ssb_t - CAST(s1t AS DOUBLE) * s1t / n)"
    " / (s2t - ssb_t)"
)

_BF_ORACLE = f"""
WITH med AS (
    SELECT event_type, median(value) AS med
    FROM events WHERE value IS NOT NULL GROUP BY 1
),
z AS (
    SELECT e.event_type, abs(e.value - m.med) AS z
    FROM events e JOIN med m ON e.event_type = m.event_type
    WHERE e.value IS NOT NULL
),
g AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
           SUM(z) AS s1, SUM(z * z) AS s2
    FROM z GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(nj) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) AS k,
           SUM(s1) AS s1t, SUM(s2) AS s2t,
           SUM(s1 * s1 / nj) AS ssb_t
    FROM g
)
SELECT g.event_type, g.nj AS n_group,
       ROUND(m.med, 6) AS median_value,
       ROUND(g.s1 / g.nj, 6) AS mean_absdev,
       ROUND({_BF_W_SQL}, 6) AS bf_w_stat
FROM g JOIN med m ON g.event_type = m.event_type, tot
"""


@query("brown_forsythe_variance_by_type", oracle=_BF_ORACLE)
def brown_forsythe_variance_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE test of variance homogeneity across event types:
    one-way ANOVA on z = |value - group median|. The variance sibling
    of anova_oneway_value (which compares MEANS and silently assumes
    equal variances — this query is the check that assumption gets),
    median-centered so heavy tails don't inflate the statistic (the
    robustness fix over Levene's mean-centered original).

    W = ((N-k)/(k-1)) * sum_j n_j (zbar_j - zbar)^2 / sum_ij (z_ij -
    zbar_j)^2, assembled from per-group moment sums (n, sum z, sum z^2)
    via the SHARED-VERBATIM expression _BF_W_SQL — both engines run
    the identical IEEE tree on identical group sums, and the group
    sums' accumulation-order noise (~1e-16 relative) sits far from the
    ROUND 6 boundary.

    100 TB shape: the exact median is one sort-based per-group
    aggregate (k groups; at extreme scale swap F.median for
    approx_percentile(0.5) — the established approx-twin convention);
    z-moments are one map-side-combined aggregate over the fact after
    a k-row broadcast join; the readout is k rows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    tot = g.agg(
        F.sum("nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("s1").alias("s1t"),
        F.sum("s2").alias("s2t"),
        F.sum(F.col("s1") * F.col("s1") / F.col("nj")).alias("ssb_t"),
    )
    return (
        g.join(F.broadcast(med), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("nj").alias("n_group"),
            F.round("med", 6).alias("median_value"),
            F.round(F.col("s1") / F.col("nj"), 6).alias("mean_absdev"),
            F.round(F.expr(_BF_W_SQL), 6).alias("bf_w_stat"),
        )
    )


# --------------------------------------------- Durbin-Watson statistic
# Numerator: sum of squared first differences of micro-quantized
# values — EXACT integers via LAG over (ts, event_id). Denominator:
# sum of squared deviations from the device mean, assembled from exact
# moments (S1, S2, n) in a shared-verbatim double expression. The
# classic DW identity: ~2 means no lag-1 autocorrelation, <2 positive,
# >2 negative.
_DW_MIN_N = 8

_DW_ORACLE = f"""
WITH o AS (
    SELECT user_id,
           CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vmic,
           LAG(CAST(ROUND(value * 1e6, 0) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS pv
    FROM events WHERE value IS NOT NULL
),
g AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vmic) AS HUGEINT) AS s1,
           CAST(SUM(CAST(vmic AS HUGEINT) * vmic) AS HUGEINT) AS s2,
           CAST(SUM(CASE WHEN pv IS NULL THEN 0
                    ELSE CAST(vmic - pv AS HUGEINT) * (vmic - pv) END)
               AS HUGEINT) AS num
    FROM o GROUP BY 1
)
SELECT user_id, n AS n_events,
       ROUND(CAST(num AS DOUBLE)
             / (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n), 6) AS dw_stat
FROM g
WHERE n >= {_DW_MIN_N}
  AND CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n > 0
"""


@query("durbin_watson_per_device", oracle=_DW_ORACLE)
def durbin_watson_per_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON lag-1 autocorrelation statistic of each device's
    value series: DW = sum_t (v_t - v_{t-1})^2 / sum_t (v_t - vbar)^2
    over (ts, event_id)-ordered readings. The residual-whiteness
    screen next to ljung_box_whitenoise (which tests many lags
    globally) and value_autocorr (the raw ACF) — DW is THE regression
    diagnostic the downstream trend fits (regr_value_trend,
    theilsen_trend_recent) assume quietly; ~2 = white, <2 = positive
    autocorrelation (trend fits underestimate their errors).

    Determinism: values quantize to micro-unit BIGINT once; the
    numerator's first differences and their squares are EXACT integers
    accumulated in DECIMAL(38,0) (oracle HUGEINT — (v_t - v_{{t-1}})^2
    is ~1e17 per term, so BIGINT would wrap on big devices); the
    denominator comes from exact moments (S1, S2, n) combined in one
    shared-verbatim double expression. Mean-centering cancels in the
    differences, so the numerator needs no mean at all.

    100 TB shape: one per-device LAG window (partition-bounded sort —
    the W3 lag-features pattern) feeding one map-side-combined
    aggregate; readout is one row per device. Devices with n <
    {_DW_MIN_N} or zero variance are excluded on both engines."""
    dec = "decimal(38,0)"
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 1e6, 0).cast("long").alias("vmic"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("pv", F.lag("vmic").over(w))
    diff = (F.col("vmic") - F.col("pv")).cast(dec)
    g = o.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vmic").cast(dec)).alias("s1"),
        F.sum(F.col("vmic").cast(dec) * F.col("vmic").cast(dec)).alias("s2"),
        F.sum(
            F.when(F.col("pv").isNull(), F.lit(0).cast(dec)).otherwise(diff * diff)
        ).alias("num"),
    )
    den = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    )
    return (
        g.filter((F.col("n") >= _DW_MIN_N) & (den > 0))
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round(F.col("num").cast("double") / den, 6).alias("dw_stat"),
        )
    )


# ----------------------------------------------------- MASE forecast eval
# Out-of-sample seasonal-naive MASE per device over DAILY TOTALS: the
# last 7 observed calendar days are the holdout; the scale is the
# in-sample MAE of the same lag-7 naive on the training days. All
# errors are exact integers (micro-quantized daily sums); only the
# final ratio is double.
_MASE_LAG_DAYS = 7

_MASE_ORACLE = f"""
WITH d AS (
    SELECT user_id,
           epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
               // 86400000000 AS day,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS y
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
mx AS (SELECT MAX(day) AS dmax FROM d),
p AS (
    SELECT a.user_id, a.day, abs(a.y - b.y) AS ae,
           CASE WHEN a.day > mx.dmax - {_MASE_LAG_DAYS} THEN 1 ELSE 0 END AS is_test
    FROM d a JOIN d b ON a.user_id = b.user_id
                     AND b.day = a.day - {_MASE_LAG_DAYS}, mx
),
g AS (
    SELECT user_id,
           CAST(SUM(1 - is_test) AS BIGINT) AS n_train,
           CAST(SUM(is_test) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN is_test = 0 THEN ae ELSE 0 END) AS HUGEINT)
               AS sae_train,
           CAST(SUM(CASE WHEN is_test = 1 THEN ae ELSE 0 END) AS HUGEINT)
               AS sae_test
    FROM p GROUP BY 1
)
SELECT user_id, n_train, n_test,
       ROUND((CAST(sae_test AS DOUBLE) / n_test)
             / (CAST(sae_train AS DOUBLE) / n_train), 6) AS mase
FROM g
WHERE n_train > 0 AND n_test > 0 AND sae_train > 0
"""


@query("mase_daily_per_device", oracle=_MASE_ORACLE)
def mase_daily_per_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute SCALED error, Hyndman-Koehler 2006) of the
    lag-7 seasonal-naive forecast on each device's daily value totals,
    with the LAST {_MASE_LAG_DAYS} observed days as a true temporal
    holdout. The out-of-sample, per-device complement of
    seasonal_naive_backtest (in-sample, per-type skill score): MASE <
    1 means the naive beats its own in-sample scale on unseen days —
    the unit-free yardstick every fancier forecaster (holt_forecast_*,
    harmonic_regression_daily) has to clear.

    Determinism: daily totals are micro-quantized BIGINT sums;
    absolute errors |y_d - y_(d-7)| are exact integers accumulated in
    DECIMAL(38,0)/HUGEINT; only the final MASE ratio is double (one
    shared-verbatim expression). Forecastable days are those whose
    lag-7 day was OBSERVED (self-join on (user, day-7)) — calendar
    gaps drop out identically on both engines.

    100 TB shape: one (user, day) aggregate (map-side combine), one
    keyed self-join on the day grid (at most one row per device-day —
    calendar-bounded, the kendall day-grid argument), one per-device
    rollup. The holdout boundary is a broadcast scalar."""
    dec = "decimal(38,0)"
    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "user_id",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
            .cast("long")
            .alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 1e6, 0).cast("long")).cast("long").alias("y"))
    )
    mx = d.agg(F.max("day").alias("dmax"))
    b = d.select(
        F.col("user_id").alias("b_user"),
        F.col("day").alias("b_day"),
        F.col("y").alias("b_y"),
    )
    p = (
        d.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_day") == F.col("day") - _MASE_LAG_DAYS),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.abs(F.col("y") - F.col("b_y")).alias("ae"),
            (F.col("day") > F.col("dmax") - _MASE_LAG_DAYS)
            .cast("int")
            .alias("is_test"),
        )
    )
    g = p.groupBy("user_id").agg(
        F.sum(1 - F.col("is_test")).cast("long").alias("n_train"),
        F.sum("is_test").cast("long").alias("n_test"),
        F.sum(F.when(F.col("is_test") == 0, F.col("ae")).otherwise(0).cast(dec)).alias(
            "sae_train"
        ),
        F.sum(F.when(F.col("is_test") == 1, F.col("ae")).otherwise(0).cast(dec)).alias(
            "sae_test"
        ),
    )
    return (
        g.filter(
            (F.col("n_train") > 0) & (F.col("n_test") > 0) & (F.col("sae_train") > 0)
        )
        .select(
            "user_id", "n_train", "n_test",
            F.round(
                (F.col("sae_test").cast("double") / F.col("n_test"))
                / (F.col("sae_train").cast("double") / F.col("n_train")),
                6,
            ).alias("mase"),
        )
    )


# ------------------------------------------- Croston intermittent demand
# Croston (1972) decomposes a zero-inflated demand series into demand
# SIZES on the days demand occurs and the INTERVALS between them, each
# smoothed by its own EWMA; forecast = size_ewma / interval_ewma.
# Closed-form geometric expansion on both engines (the
# stream_ewma_by_device oracle pattern): EWMA_m = (1-a)^(m-1) x_1 +
# sum_{{k>=2}} a (1-a)^(m-k) x_k over the day-ordered series.
CROSTON_ALPHA = 0.2

_CROSTON_ORACLE = f"""
WITH dem AS (
    SELECT user_id,
           epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
               // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS q
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
o AS (
    SELECT user_id, q,
           day - LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS gap,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS k,
           COUNT(*) OVER (PARTITION BY user_id) AS m
    FROM dem
),
z AS (
    SELECT user_id, MAX(m) AS m,
           SUM(CASE WHEN k = 1 THEN power({1 - CROSTON_ALPHA}, m - 1) * q
                    ELSE {CROSTON_ALPHA} * power({1 - CROSTON_ALPHA}, m - k) * q
               END) AS z_hat,
           SUM(CASE WHEN k = 2 THEN power({1 - CROSTON_ALPHA}, m - 2) * gap
                    WHEN k > 2 THEN {CROSTON_ALPHA}
                                    * power({1 - CROSTON_ALPHA}, m - k) * gap
                    ELSE 0 END) AS p_hat
    FROM o GROUP BY user_id
)
SELECT user_id, CAST(m AS BIGINT) AS n_demand_days,
       ROUND(z_hat, 6) AS size_ewma,
       ROUND(p_hat, 6) AS interval_ewma,
       ROUND(z_hat / p_hat, 6) AS croston_forecast
FROM z WHERE m >= 2
"""


@query("croston_intermittent_demand", oracle=_CROSTON_ORACLE)
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON'S METHOD for intermittent demand, per device: daily
    purchase counts are a zero-inflated series (most days no demand),
    where ordinary exponential smoothing (holt_forecast_per_device)
    biases toward zero — Croston instead smooths the nonzero demand
    SIZES and the INTERVALS between demand days separately
    (alpha={CROSTON_ALPHA} each, init = first observation) and
    forecasts size_ewma / interval_ewma demand per day. The
    intermittent-series leg of the forecasting lane.

    Both engines evaluate the same CLOSED-FORM geometric expansion of
    the sequential fold (the stream_ewma_by_device oracle identity):
    EWMA_m = (1-a)^(m-1) x_1 + sum_(k>=2) a (1-a)^(m-k) x_k, over the
    deterministic day order (one row per device-day, ties impossible).
    Interval smoothing starts at the FIRST interval (k=2; a device
    needs >= 2 demand days to have one). power() last-ulp skew between
    engines is ~1e-15 relative on these magnitudes — far from the
    ROUND 6 boundary.

    100 TB shape: one (user, day) demand aggregate (map-side combine),
    one per-device LAG + row_number window over the calendar-bounded
    day grid, one per-device rollup. Nothing holds a per-row state
    fold — the closed form IS the distributed formulation."""
    a = CROSTON_ALPHA
    dem = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
            .cast("long")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("q"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    wp = Window.partitionBy("user_id")
    o = dem.select(
        "user_id", "q",
        (F.col("day") - F.lag("day").over(w)).alias("gap"),
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(wp).alias("m"),
    )
    z = o.groupBy("user_id").agg(
        F.max("m").alias("m"),
        F.sum(
            F.when(F.col("k") == 1, F.pow(F.lit(1 - a), F.col("m") - 1) * F.col("q"))
            .otherwise(a * F.pow(F.lit(1 - a), F.col("m") - F.col("k")) * F.col("q"))
        ).alias("z_hat"),
        F.sum(
            F.when(
                F.col("k") == 2, F.pow(F.lit(1 - a), F.col("m") - 2) * F.col("gap")
            )
            .when(
                F.col("k") > 2,
                a * F.pow(F.lit(1 - a), F.col("m") - F.col("k")) * F.col("gap"),
            )
            .otherwise(F.lit(0.0))
        ).alias("p_hat"),
    )
    return z.filter(F.col("m") >= 2).select(
        "user_id",
        F.col("m").cast("long").alias("n_demand_days"),
        F.round("z_hat", 6).alias("size_ewma"),
        F.round("p_hat", 6).alias("interval_ewma"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("croston_forecast"),
    )


# --------------------------------------- Cochran-Armitage trend test
# Trend in the purchase PROPORTION across the 24 ordered hour-of-day
# exposure groups (scores s_j = hour). Exact integer moments A = sum
# s_j r_j, B = sum s_j n_j, C = sum s_j^2 n_j; the z statistic is one
# shared-verbatim double expression of (N, R, A, B, C):
# z = (N*A - R*B) * sqrt(N) / sqrt(R * (N-R) * (N*C - B*B)).
_CA_Z_SQL = (
    "(CAST(n AS DOUBLE) * a - CAST(r AS DOUBLE) * b) * SQRT(CAST(n AS DOUBLE))"
    " / SQRT(CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - r)"
    "        * (CAST(n AS DOUBLE) * c - CAST(b AS DOUBLE) * b))"
)

_CA_ORACLE = f"""
WITH cells AS (
    SELECT hour({DUCK_TS}) AS hr,
           CAST(COUNT(*) AS BIGINT) AS nj,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS rj
    FROM events GROUP BY 1
),
m AS (
    SELECT CAST(SUM(nj) AS BIGINT) AS n,
           CAST(SUM(rj) AS BIGINT) AS r,
           CAST(SUM(CAST(hr AS HUGEINT) * rj) AS HUGEINT) AS a,
           CAST(SUM(CAST(hr AS HUGEINT) * nj) AS HUGEINT) AS b,
           CAST(SUM(CAST(hr AS HUGEINT) * hr * nj) AS HUGEINT) AS c
    FROM cells
)
SELECT n AS n_total, r AS n_purchase,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS purchase_rate,
       ROUND({_CA_Z_SQL}, 6) AS ca_z_trend
FROM m
"""


@query("cochran_armitage_hour_trend", oracle=_CA_ORACLE)
def cochran_armitage_hour_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE trend test: is the purchase PROPORTION rising
    or falling monotonically across the 24 ordered hour-of-day groups?
    The dose-response statistic chi2_type_dow cannot see — chi-square
    detects ANY deviation from independence; Cochran-Armitage spends
    its single degree of freedom on the ORDERED trend (scores s_j =
    hour), so a clean morning-to-evening drift that chi-square dilutes
    across 23 df shows up at full strength.

    z = (N*A - R*B) * sqrt(N) / sqrt(R*(N-R)*(N*C - B^2)) from exact
    integer moments (A = sum s_j r_j, B = sum s_j n_j, C = sum s_j^2
    n_j, accumulated in DECIMAL(38,0)/HUGEINT), evaluated by the
    SHARED-VERBATIM expression _CA_Z_SQL — cross-engine the entire
    IEEE tree is identical, not just the value. Hour extraction
    agrees on both engines (UTC sessions; no dayofweek-style encoding
    skew for hour()).

    100 TB shape: ONE map-side-combined aggregate to 24 cells, then a
    1-row readout — nothing scales with data but the scan."""
    dec = "decimal(38,0)"
    cells = load_table(spark, sf_dir, "events").groupBy(
        F.hour("ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("rj"),
    )
    m = cells.agg(
        F.sum("nj").cast("long").alias("n"),
        F.sum("rj").cast("long").alias("r"),
        F.sum(F.col("hr").cast(dec) * F.col("rj").cast(dec)).alias("a"),
        F.sum(F.col("hr").cast(dec) * F.col("nj").cast(dec)).alias("b"),
        F.sum(
            F.col("hr").cast(dec) * F.col("hr").cast(dec) * F.col("nj").cast(dec)
        ).alias("c"),
    )
    return m.select(
        F.col("n").alias("n_total"),
        F.col("r").alias("n_purchase"),
        F.round(F.col("r").cast("double") / F.col("n"), 6).alias("purchase_rate"),
        F.round(F.expr(_CA_Z_SQL), 6).alias("ca_z_trend"),
    )


# ------------------------------------- weighted priority sampling (DLT)
# Duffield-Lund-Thorup priority sampling: priority = w / u with u a
# uniform from the row's md5 (the registry's cross-engine hash
# identity); the top-K priorities per stratum are the sample, and
# sum(max(w, tau)) over the sample with tau = the (K+1)-th priority is
# an unbiased estimator of the stratum's total weight. Chosen over
# Efraimidis-Spirakis exactly because the key is ONE IEEE division of
# exact inputs — pow/ln keys could differ by an ulp across engines and
# reorder near-ties.
PRIORITY_K = 20

# Explicit DOUBLE casts everywhere: a bare `0.5` parses as DECIMAL(1,1)
# on BOTH engines, and Spark then runs the whole quotient in decimal
# arithmetic (observed live: u came back as DECIMAL and every priority
# drifted ~1e-13 relative from DuckDB's double path).
_PRIO_U = (
    "((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT"
    " + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE))"
)

_PRIO_ORACLE = f"""
WITH w AS (
    SELECT event_type, event_id, value,
           value / {_PRIO_U} AS priority
    FROM events WHERE value IS NOT NULL AND value > 0
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY priority DESC, event_id) AS rn
    FROM w
),
tau AS (
    SELECT event_type,
           COALESCE(MAX(CASE WHEN rn = {PRIORITY_K + 1} THEN priority END), 0)
               AS tau
    FROM r WHERE rn <= {PRIORITY_K + 1} GROUP BY 1
)
SELECT r.event_type, r.rn, r.event_id, r.value,
       r.priority,
       ROUND(SUM(CASE WHEN r.value > t.tau THEN r.value ELSE t.tau END)
                 OVER (PARTITION BY r.event_type), 6) AS ht_total_estimate
FROM r JOIN tau t ON r.event_type = t.event_type
WHERE r.rn <= {PRIORITY_K}
"""


@query("priority_sample_per_type", oracle=_PRIO_ORACLE)
def priority_sample_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sample of {PRIORITY_K} events per type via
    Duffield-Lund-Thorup PRIORITY SAMPLING: priority = value / u with
    u = (md5(event_id)_32 + 0.5) / 2^32, top-K priorities win, and
    sum(max(w_i, tau)) over the sample (tau = the (K+1)-th priority)
    estimates the stratum's total weight unbiasedly — the
    weight-proportional companion to reservoir_sample_per_type
    (uniform) and pps_sample_estimate (threshold PPS): priority
    sampling delivers an EXACT sample size per stratum where
    hash-threshold PPS only hits it in expectation.

    Determinism: u is exact (integer hash + one add + one divide);
    the sort key is ONE further IEEE division of exact doubles —
    bit-identical across engines, so the selected set, the ranks, and
    tau all agree exactly (deliberately NOT Efraimidis-Spirakis, whose
    u^(1/w) key needs pow/ln where engines can differ by an ulp and
    reorder near-ties). Rank ties carry the event_id tiebreak anyway.

    100 TB shape: per-stratum top-(K+1) is a TakeOrderedAndProject-
    style partial top-k (map-side heaps, no global sort); the sample
    and its threshold then fit in one broadcastable frame. This is the
    training-data mixing primitive: weight = quality/importance score,
    sample + Horvitz-Thompson estimate per source stratum."""
    spark_u = (
        "((cast(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        " + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE))"
    )
    w = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .select(
            "event_type", "event_id", "value",
            (F.col("value") / F.expr(spark_u)).alias("priority"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("priority").desc(), "event_id"
    )
    r = w.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= PRIORITY_K + 1
    )
    tau = r.groupBy("event_type").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == PRIORITY_K + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    wt = Window.partitionBy("event_type")
    return (
        r.filter(F.col("rn") <= PRIORITY_K)
        .join(F.broadcast(tau), "event_type")
        .select(
            "event_type", "rn", "event_id", "value",
            # emitted UNROUNDED (the stream_sliding_agg precedent):
            # the quotient of exact inputs is bit-identical across
            # engines, while ROUND(x, 6) of a quotient can land on a
            # decimal tie where Spark's HALF_UP and DuckDB's binary
            # rounding disagree — observed live at sf0.001
            "priority",
            F.round(
                F.sum(
                    F.when(F.col("value") > F.col("tau"), F.col("value")).otherwise(
                        F.col("tau")
                    )
                ).over(wt),
                6,
            ).alias("ht_total_estimate"),
        )
    )
