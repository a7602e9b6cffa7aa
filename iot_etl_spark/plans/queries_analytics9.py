"""Round-12 analytics batch: distribution-free two-sample testing on
the value-cell device (energy distance, Cramér–von Mises, the
Ansari–Bradley scale test), distribution-shape testing from exact
anchored moments (Jarque–Bera), the classical variance-homogeneity /
unequal-variance ANOVA pair (Bartlett, Welch), rank post-hocs
(Dunn after Kruskal–Wallis, Kendall's W after Friedman), level
stationarity (KPSS), bivariate outlier analytics from exact integer
moment matrices (Mahalanobis top-k, Hotelling's T²), inequality
decomposition (Theil T/L by nation), survival-curve summarization
(restricted mean survival time), and a held-out bigram-perplexity
eval for the LM-filter lane.

Reference parity: none exist in the reference (its analytics surface
is TimescaleDB SQL, ``analytical_queries.sql``); they close the
remaining textbook gaps of the established lanes — the two-sample
family (ks/mannwhitney -> energy/CvM/AB), the ANOVA family
(anova/brown_forsythe/tukey -> bartlett/welch/dunn), the concordance
family (friedman -> Kendall W), the stationarity family
(mann_kendall/kpss), the multivariate family (zscore/grubbs ->
mahalanobis/hotelling), the inequality family (gini -> theil), the
survival family (KM/NA/logrank -> RMST), and the LM ladder
(unigram/bigram self-scored -> held-out perplexity).

Determinism (the SCALE.md conventions): 2-dp values quantize EXACTLY
to centi-unit BIGINT (vq = ROUND(value*100)); rank/score math runs on
bounded (value-cell) frames via the cumulative-cell device, never a
global per-row sort; any ``Σx² − (Σx)²/n`` shape subtracts AS
INTEGERS in DECIMAL(38,0)/HUGEINT; per-term libm products quantize to
BIGINT grids before distributed sums; every computed double is
ROUND(x, 6) and shared-verbatim across engines where an expression
tree decides the value.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iot_etl_spark.plans.registry import query, DUCK_TS, spread_scan
from iot_etl_spark.sources.tables import load_table

_DEC = "decimal(38,0)"

# --------------------------------------------------------------------
# Shared two-sample device: (vq, weekday-count, weekend-count) cells
# with strictly-preceding cumulative counts / value-sums per side.
# vq = ROUND(value*100) is EXACT (the generator writes 2-dp values),
# so the cell frame is bounded by the value DOMAIN (~33k cells), not
# by row count — every statistic below is integer math over it.

_WE_CELLS_DUCK = f"""
cells AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS vq,
           CAST(SUM(CASE WHEN dayofweek({DUCK_TS}) IN (0, 6)
                         THEN 0 ELSE 1 END) AS BIGINT) AS cw,
           CAST(SUM(CASE WHEN dayofweek({DUCK_TS}) IN (0, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS ce
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
)
"""


def _we_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vq, cw, ce) weekend/weekday value cells — one map-side-combined
    aggregate bounded by the value domain. Spark dayofweek is 1=Sunday
    (registry.py convention; DuckDB is 0=Sunday)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    we = F.dayofweek("ts").isin(1, 7).cast("int")
    return ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("vq")
    ).agg(
        F.sum(1 - we).cast("long").alias("cw"),
        F.sum(we).cast("long").alias("ce"),
    )


# ------------------------------------------- Energy distance (weekend)
# Szekely-Rizzo E-statistic between the weekday and weekend value
# distributions: D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|, the two-sample test
# that is consistent against ALL alternatives (KS tests location-ish
# shifts, AB tests scale; energy tests everything). Every pairwise
# E|A−B| collapses onto the sorted cell frame: with strictly-below
# cumulative counts C and value-sums S, the pairs where cell j holds
# the LARGER value contribute count_j * (vq_j * C_j − S_j) — one
# window pass, all integer (HUGEINT / DECIMAL(38,0)), so the O(n²)
# pair sums are EXACT with zero pair expansion.

_ENERGY_ORACLE = f"""
WITH {_WE_CELLS_DUCK},
cum AS (
    SELECT vq, cw, ce,
           CAST(COALESCE(SUM(cw) OVER w, 0) AS HUGEINT) AS pw,
           CAST(COALESCE(SUM(ce) OVER w, 0) AS HUGEINT) AS pe,
           CAST(COALESCE(SUM(vq * cw) OVER w, 0) AS HUGEINT) AS sw,
           CAST(COALESCE(SUM(vq * ce) OVER w, 0) AS HUGEINT) AS se
    FROM cells
    WINDOW w AS (ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING)
),
sums AS (
    SELECT CAST(SUM(cw) AS BIGINT) AS n, CAST(SUM(ce) AS BIGINT) AS m,
           CAST(SUM(ce * (vq * pw - sw) + cw * (vq * pe - se))
                AS HUGEINT) AS sxy,
           CAST(SUM(cw * (vq * pw - sw)) AS HUGEINT) AS sxx,
           CAST(SUM(ce * (vq * pe - se)) AS HUGEINT) AS syy
    FROM cum
)
SELECT n AS n_weekday, m AS n_weekend,
       ROUND(CAST(sxy AS DOUBLE) / n / m / 100, 6) AS mean_cross_absdiff,
       ROUND((2.0 * CAST(sxy AS DOUBLE) / n / m
              - 2.0 * CAST(sxx AS DOUBLE) / n / n
              - 2.0 * CAST(syy AS DOUBLE) / m / m) / 100, 6)
           AS energy_distance,
       ROUND(CAST(n AS DOUBLE) * m / (n + m)
             * (2.0 * CAST(sxy AS DOUBLE) / n / m
                - 2.0 * CAST(sxx AS DOUBLE) / n / n
                - 2.0 * CAST(syy AS DOUBLE) / m / m) / 100, 6)
           AS energy_stat
FROM sums
"""


@query("energy_distance_weekend", oracle=_ENERGY_ORACLE)
def energy_distance_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szekely-Rizzo ENERGY DISTANCE between the weekend and weekday
    value distributions, with the test statistic nm/N * D² — the
    omnibus two-sample test consistent against every alternative
    (ks_weekend_value sees CDF gaps, ansari_bradley_scale sees
    dispersion; energy sees anything, at the cost of power per watt).

    Determinism: ALL THREE O(n²) pairwise |x−y| sums are EXACT
    integers — sorted value cells + strictly-below cumulative (count,
    value-sum) turn Σ|x−y| into Σ count_j*(vq_j*C_j − S_j) in
    DECIMAL(38,0)/HUGEINT; doubles appear only in the final
    shared-verbatim readout.

    100 TB shape: one map-side cell aggregate bounded by the value
    domain; one single-partition window over the bounded cell frame
    (the cumulative-cell device, the KW/gini pattern); no pair
    expansion anywhere at any scale."""
    cells = _we_cells(spark, sf_dir)
    wlt = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    z = F.lit(0).cast("long")
    cum = cells.select(
        "vq", "cw", "ce",
        F.coalesce(F.sum("cw").over(wlt), z).cast(_DEC).alias("pw"),
        F.coalesce(F.sum("ce").over(wlt), z).cast(_DEC).alias("pe"),
        F.coalesce(F.sum(F.col("vq") * F.col("cw")).over(wlt), z)
        .cast(_DEC).alias("sw"),
        F.coalesce(F.sum(F.col("vq") * F.col("ce")).over(wlt), z)
        .cast(_DEC).alias("se"),
    )
    sums = cum.agg(
        F.sum("cw").cast("long").alias("n"),
        F.sum("ce").cast("long").alias("m"),
        F.sum(
            F.col("ce").cast(_DEC) * (F.col("vq").cast(_DEC) * F.col("pw") - F.col("sw"))
            + F.col("cw").cast(_DEC) * (F.col("vq").cast(_DEC) * F.col("pe") - F.col("se"))
        ).alias("sxy"),
        F.sum(
            F.col("cw").cast(_DEC) * (F.col("vq").cast(_DEC) * F.col("pw") - F.col("sw"))
        ).alias("sxx"),
        F.sum(
            F.col("ce").cast(_DEC) * (F.col("vq").cast(_DEC) * F.col("pe") - F.col("se"))
        ).alias("syy"),
    )
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    d2 = (
        2.0 * F.col("sxy").cast("double") / nd / md
        - 2.0 * F.col("sxx").cast("double") / nd / nd
        - 2.0 * F.col("syy").cast("double") / md / md
    )
    return sums.select(
        F.col("n").alias("n_weekday"),
        F.col("m").alias("n_weekend"),
        F.round(F.col("sxy").cast("double") / nd / md / 100, 6).alias(
            "mean_cross_absdiff"
        ),
        F.round(d2 / 100, 6).alias("energy_distance"),
        F.round(nd * md / (nd + md) * d2 / 100, 6).alias("energy_stat"),
    )

# ------------------------------- Cramér–von Mises two-sample (weekend)
# Anderson's rank form with midrank ties (what scipy's
# cramervonmises_2samp computes): U = n·Σ(r_i − i)² + m·Σ(s_j − j)²
# over pooled midranks r/s and within-sample positions i/j, then
# T = U/(nmN) − (4nm−1)/(6N). Everything collapses onto value cells:
# the members of sample X in cell j share one midrank R (2R = 2P+c+1,
# P = pooled strictly-below count) and occupy positions pw+1..pw+cw,
# so Σ(R−i)² over the cell is a closed-form integer — carried ×4 as
# Σ(2R−2i)² = cw·(2a)² − 4·(2a)·T(cw) + 4·Q(cw) with 2a = 2P+c+1−2pw,
# T(c)=c(c+1)/2, Q(c)=c(c+1)(2c+1)/6. U is EXACT (HUGEINT /
# DECIMAL(38,0)); T is one shared-verbatim double readout.

_CVM_U4_SIDE = """
SUM({cx} * (2 * p + c + 1 - 2 * {px}) * (2 * p + c + 1 - 2 * {px})
    - 4 * (2 * p + c + 1 - 2 * {px}) * ({cx} * ({cx} + 1) / 2)
    + 4 * ({cx} * ({cx} + 1) * (2 * {cx} + 1) / 6))
"""

_CVM_ORACLE = f"""
WITH {_WE_CELLS_DUCK},
cum AS (
    SELECT vq, cw, ce, cw + ce AS c,
           CAST(COALESCE(SUM(cw + ce) OVER w, 0) AS HUGEINT) AS p,
           CAST(COALESCE(SUM(cw) OVER w, 0) AS HUGEINT) AS pw,
           CAST(COALESCE(SUM(ce) OVER w, 0) AS HUGEINT) AS pe
    FROM cells
    WINDOW w AS (ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING)
),
sums AS (
    SELECT CAST(SUM(cw) AS BIGINT) AS n, CAST(SUM(ce) AS BIGINT) AS m,
           CAST({_CVM_U4_SIDE.format(cx="cw", px="pw")} AS HUGEINT) AS u4x,
           CAST({_CVM_U4_SIDE.format(cx="ce", px="pe")} AS HUGEINT) AS u4y
    FROM cum
)
SELECT n AS n_weekday, m AS n_weekend,
       CAST((n * u4x + m * u4y) / 4 AS DOUBLE) AS u_stat,
       ROUND(CAST((n * u4x + m * u4y) / 4 AS DOUBLE)
             / (CAST(n AS DOUBLE) * m * (n + m))
             - (4.0 * n * m - 1) / (6.0 * (n + m)), 6) AS cvm_t
FROM sums
"""


@query("cramer_von_mises_weekend", oracle=_CVM_ORACLE)
def cramer_von_mises_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR–VON MISES two-sample test of the weekend vs weekday
    value distributions (Anderson's rank form with midrank ties — the
    integrated-squared-CDF-gap companion to ks_weekend_value's
    supremum gap: KS keys on the single worst point, CvM accumulates
    the whole curve, so many small distributed gaps that KS misses
    move CvM).

    Determinism: U is an EXACT integer — per value cell, the sample's
    Σ(midrank − within-sample-position)² has a closed form in the
    strictly-below cumulative counts, carried ×4 so midrank halves
    stay integral; DECIMAL(38,0)/HUGEINT accumulation; the statistic
    is one shared-verbatim double readout.

    100 TB shape: one map-side cell aggregate bounded by the value
    domain + one single-partition window over the bounded cell frame
    (the cumulative-cell device); no per-row rank, no sort."""
    cells = _we_cells(spark, sf_dir)
    wlt = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    z = F.lit(0).cast("long")
    cum = cells.select(
        "cw", "ce", (F.col("cw") + F.col("ce")).alias("c"),
        F.coalesce(F.sum(F.col("cw") + F.col("ce")).over(wlt), z)
        .cast(_DEC).alias("p"),
        F.coalesce(F.sum("cw").over(wlt), z).cast(_DEC).alias("pw"),
        F.coalesce(F.sum("ce").over(wlt), z).cast(_DEC).alias("pe"),
    )

    def u4(cx: str, px: str):
        a2 = 2 * F.col("p") + F.col("c") + 1 - 2 * F.col(px)  # 2a, integer
        cxc = F.col(cx).cast(_DEC)
        return F.sum(
            cxc * a2 * a2
            - 4 * a2 * (cxc * (cxc + 1) / 2)
            + 4 * (cxc * (cxc + 1) * (2 * cxc + 1) / 6)
        )

    sums = cum.agg(
        F.sum("cw").cast("long").alias("n"),
        F.sum("ce").cast("long").alias("m"),
        u4("cw", "pw").alias("u4x"),
        u4("ce", "pe").alias("u4y"),
    )
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    u = (
        (F.col("n").cast(_DEC) * F.col("u4x") + F.col("m").cast(_DEC) * F.col("u4y"))
        / 4
    ).cast("double")
    return sums.select(
        F.col("n").alias("n_weekday"),
        F.col("m").alias("n_weekend"),
        u.alias("u_stat"),
        F.round(
            u / (nd * md * (nd + md)) - (4.0 * nd * md - 1) / (6.0 * (nd + md)),
            6,
        ).alias("cvm_t"),
    )


# ------------------------------------ Ansari–Bradley scale test (weekend)
# Rank-based DISPERSION test: pooled scores a_i = min(i, N+1−i) peak at
# the center, so a sample concentrated in the middle (smaller spread)
# collects a LARGER score sum. Midrank ties give every member of a
# value cell the cell's average score f_j/c_j, where f_j — the sum of
# min(i, N+1−i) over the cell's rank interval — has a closed integer
# form (two triangular-number segments split at h = (N+1) div 2). The
# normal approximation uses the EXACT finite-population moments of a
# without-replacement score sample, so ties need no special casing.

_AB_F_CLOSED = """
(CASE WHEN {L} <= h
      THEN (least({U}, h) * (least({U}, h) + 1) / 2
            - ({L} - 1) * {L} / 2) ELSE 0 END
 + CASE WHEN {U} > h
        THEN (nn + 1) * ({U} - greatest({L}, h + 1) + 1)
             - ({U} * ({U} + 1) / 2
                - (greatest({L}, h + 1) - 1) * greatest({L}, h + 1) / 2)
        ELSE 0 END)
"""

_AB_ORACLE = f"""
WITH {_WE_CELLS_DUCK},
tot AS (
    SELECT CAST(SUM(cw) AS BIGINT) AS n, CAST(SUM(ce) AS BIGINT) AS m,
           CAST(SUM(cw + ce) AS BIGINT) AS nn,
           CAST((SUM(cw + ce) + 1) // 2 AS BIGINT) AS h
    FROM cells
),
cum AS (
    SELECT vq, cw, ce, cw + ce AS c,
           CAST(COALESCE(SUM(cw + ce) OVER (ORDER BY vq
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS p
    FROM cells
),
scored AS (
    SELECT ce, c,
           {_AB_F_CLOSED.format(L="(p + 1)", U="(p + c)")} AS f
    FROM cum, tot
),
agg AS (
    SELECT CAST(SUM(f) AS HUGEINT) AS ftot,
           CAST(SUM(CAST(ROUND(ce * (CAST(f AS DOUBLE) / c) * 1e6)
                         AS BIGINT)) AS HUGEINT) AS t_micro,
           CAST(SUM(CAST(ROUND((CAST(f AS DOUBLE) * f / c) * 1e3)
                         AS BIGINT)) AS HUGEINT) AS ssq_milli
    FROM scored
)
SELECT t.m AS n_weekend, t.n AS n_weekday,
       ROUND(CAST(a.t_micro AS DOUBLE) / 1e6, 6) AS ab_t_weekend,
       ROUND(CAST(t.m AS DOUBLE) * a.ftot / t.nn, 6) AS ab_expected,
       ROUND((CAST(a.t_micro AS DOUBLE) / 1e6
              - CAST(t.m AS DOUBLE) * a.ftot / t.nn)
             / SQRT(CAST(t.m AS DOUBLE) * t.n / (CAST(t.nn AS DOUBLE)
                    * (t.nn - 1))
                    * (CAST(a.ssq_milli AS DOUBLE) / 1e3
                       - CAST(a.ftot AS DOUBLE) * a.ftot / t.nn)), 6)
           AS z_approx
FROM tot t, agg a
"""


@query("ansari_bradley_scale", oracle=_AB_ORACLE)
def ansari_bradley_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSARI–BRADLEY rank test of SCALE: do weekend values disperse
    differently than weekday values around a common center? The rank
    companion to brown_forsythe_variance_by_type (which needs moments)
    — AB only needs ranks, so heavy tails can't inflate it; it
    completes the two-sample corner of the battery (location:
    mannwhitney; shape: ks/CvM/energy; scale: this).

    Determinism: every cell's score sum f_j (min(i, N+1−i) over the
    cell's rank interval) is a closed-form INTEGER — two triangular
    segments split at h = (N+1) div 2; the weekend score sum and the
    score second moment quantize per-cell exact-integer divisions to
    1e-6/1e-3 grids before the distributed sum; mean and variance use
    the exact finite-population formulas, so the z is one
    shared-verbatim double readout.

    100 TB shape: the same bounded cell device as energy/CvM — one
    map-side aggregate, one window over cells; rescale note: the
    quantized grids carry ~100x headroom over the sf0.1 magnitudes
    (cw·f/c ≤ N²/2), drop to 1e-3/1 at 1e9+ pooled rows."""
    cells = _we_cells(spark, sf_dir).localCheckpoint()  # bounded by
    # the value domain; tot + the score walk both read it
    tot = cells.agg(
        F.sum("cw").cast("long").alias("n"),
        F.sum("ce").cast("long").alias("m"),
        F.sum(F.col("cw") + F.col("ce")).cast("long").alias("nn"),
        ((F.sum(F.col("cw") + F.col("ce")) + 1) / 2)
        .cast("long").alias("h"),
    )
    wlt = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.select(
        "ce", (F.col("cw") + F.col("ce")).alias("c"),
        F.coalesce(F.sum(F.col("cw") + F.col("ce")).over(wlt), F.lit(0))
        .cast("long").alias("p"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).withColumn(
        "f",
        F.expr(
            _AB_F_CLOSED.format(L="(p + 1)", U="(p + c)")
        ).cast("long"),
    )
    agg = scored.agg(
        F.sum(F.col("f").cast(_DEC)).alias("ftot"),
        F.sum(
            F.round(F.col("ce") * (F.col("f").cast("double") / F.col("c")) * 1e6)
            .cast("long").cast(_DEC)
        ).alias("t_micro"),
        F.sum(
            F.round((F.col("f").cast("double") * F.col("f") / F.col("c")) * 1e3)
            .cast("long").cast(_DEC)
        ).alias("ssq_milli"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    nnd = F.col("nn").cast("double")
    t_ab = F.col("t_micro").cast("double") / 1e6
    exp_t = md * F.col("ftot").cast("double") / F.col("nn")
    var_t = (
        md * F.col("n") / (nnd * (F.col("nn") - 1))
        * (
            F.col("ssq_milli").cast("double") / 1e3
            - F.col("ftot").cast("double") * F.col("ftot") / F.col("nn")
        )
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("m").alias("n_weekend"),
        F.col("n").alias("n_weekday"),
        F.round(t_ab, 6).alias("ab_t_weekend"),
        F.round(exp_t, 6).alias("ab_expected"),
        F.round((t_ab - exp_t) / F.sqrt(var_t), 6).alias("z_approx"),
    )

# --------------------------------------------------------------------
# Shared k-group moment device: (event_type, vq, c) cells. Group
# moments come off the bounded cell frame, so every statistic below
# reads the fact table exactly once per query.

_TYPE_CELLS_DUCK = f"""
cells AS (
    SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vq,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
)
"""


def _type_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vq"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


# ---------------------------------------------- Jarque–Bera normality
# Skewness / excess kurtosis / JB per event type from ANCHORED exact
# moments: center the integer values on the per-type integer mean
# floor a = Σvq div n BEFORE the power sums, so d = vq − a is bounded
# by the value RANGE and Σd^k stays exact in DECIMAL(38,0)/HUGEINT at
# any row count (the un-anchored Σx⁴-moment form overflows 38 digits
# once n·mean⁴ passes 1e38 — the Chow lesson applied to 4th powers).
# The residual mean Σd/n lies in [0, 1), so the central-moment
# corrections are small same-magnitude terms — no catastrophic
# cancellation — and the whole readout is one shared-verbatim double
# expression per statistic.

_JB_M1 = "(CAST(sd AS DOUBLE) / n)"
_JB_M2 = f"(CAST(sd2 AS DOUBLE) / n - {_JB_M1} * {_JB_M1})"
_JB_M3 = (
    f"(CAST(sd3 AS DOUBLE) / n - 3 * {_JB_M1} * (CAST(sd2 AS DOUBLE) / n)"
    f" + 2 * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
_JB_M4 = (
    f"(CAST(sd4 AS DOUBLE) / n - 4 * {_JB_M1} * (CAST(sd3 AS DOUBLE) / n)"
    f" + 6 * {_JB_M1} * {_JB_M1} * (CAST(sd2 AS DOUBLE) / n)"
    f" - 3 * {_JB_M1} * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
# x^1.5 as x*SQRT(x), NOT POWER(x, 1.5): sqrt is IEEE
# correctly-rounded on both engines, libm pow is not (last-ulp
# divergence observed live on jb_stat at sf0.001).
_JB_SKEW = f"({_JB_M3} / NULLIF({_JB_M2} * SQRT({_JB_M2}), 0))"
_JB_EXK = f"({_JB_M4} / NULLIF({_JB_M2} * {_JB_M2}, 0) - 3)"
# CAST(n AS DOUBLE): bare `n / 6.0` is BIGINT/DECIMAL in Spark and
# runs as decimal division (the SCALE.md bare-literal trap — observed
# live as a 1e-8-relative jb_stat drift).
_JB_STAT = (
    f"(CAST(n AS DOUBLE) / 6.0 * ({_JB_SKEW} * {_JB_SKEW}"
    f" + {_JB_EXK} * {_JB_EXK} / 4.0))"
)

_JB_ORACLE = f"""
WITH {_TYPE_CELLS_DUCK},
anchor AS (
    SELECT event_type,
           CAST(SUM(c * vq) // SUM(c) AS BIGINT) AS a
    FROM cells GROUP BY 1
),
m AS (
    SELECT c.event_type,
           CAST(SUM(c.c) AS BIGINT) AS n,
           CAST(SUM(c.c * (c.vq - a.a)) AS HUGEINT) AS sd,
           CAST(SUM(c.c * (c.vq - a.a) * (c.vq - a.a)) AS HUGEINT) AS sd2,
           CAST(SUM(CAST(c.c AS HUGEINT) * (c.vq - a.a) * (c.vq - a.a)
                    * (c.vq - a.a)) AS HUGEINT) AS sd3,
           CAST(SUM(CAST(c.c AS HUGEINT) * ((c.vq - a.a) * (c.vq - a.a))
                    * ((c.vq - a.a) * (c.vq - a.a))) AS HUGEINT) AS sd4
    FROM cells c JOIN anchor a ON c.event_type = a.event_type
    GROUP BY 1
)
SELECT event_type, n AS n_group,
       ROUND((a.a + {_JB_M1}) / 100, 6) AS mean_value,
       ROUND({_JB_SKEW}, 6) AS skewness,
       ROUND({_JB_EXK}, 6) AS ex_kurtosis,
       ROUND({_JB_STAT}, 6) AS jb_stat
FROM m JOIN anchor a USING (event_type)
"""


@query("jarque_bera_by_type", oracle=_JB_ORACLE)
def jarque_bera_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE–BERA normality test per event type — skewness g1 and
    excess kurtosis g2 from exact central moments, JB = n/6 (g1² +
    g2²/4). The formal gate on every normality-assuming member of the
    battery (anova_oneway, tukey_hsd, the z-flaggers): a large JB says
    "use the rank twins instead" (kruskal_wallis, mood, dunn).

    Determinism: moments are ANCHORED — values center on the integer
    per-type mean floor before the power sums, so Σd^k is exact
    integer at any scale (d is bounded by the value RANGE; the
    unanchored Σx⁴ form would pass 1e38 at ~1e12 rows) and the
    residual mean Σd/n ∈ [0,1) makes the central-moment corrections
    cancellation-free; skew/kurtosis/JB are shared-verbatim double
    readouts (scale-invariant, so centi-units drop out).

    100 TB shape: one map-side cell aggregate bounded by the value
    domain per type; anchor + moments are two aggregates OVER CELLS
    (the fact table is read once); NULLIF guards the degenerate
    zero-variance group."""
    cells = _type_cells(spark, sf_dir).localCheckpoint()
    anchor = cells.groupBy("event_type").agg(
        F.expr("CAST(sum(c * vq) div sum(c) AS BIGINT)").alias("a")
    )
    d = F.col("vq") - F.col("a")
    d2 = (d * d).cast(_DEC)
    m = (
        cells.join(F.broadcast(anchor), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c").cast(_DEC) * d.cast(_DEC)).alias("sd"),
            F.sum(F.col("c").cast(_DEC) * d2).alias("sd2"),
            F.sum(F.col("c").cast(_DEC) * d2 * d.cast(_DEC)).alias("sd3"),
            F.sum(F.col("c").cast(_DEC) * d2 * d2).alias("sd4"),
        )
    )
    return m.join(F.broadcast(anchor), "event_type").select(
        "event_type",
        F.col("n").alias("n_group"),
        F.round((F.col("a") + F.expr(_JB_M1)) / 100, 6).alias("mean_value"),
        F.round(F.expr(_JB_SKEW), 6).alias("skewness"),
        F.round(F.expr(_JB_EXK), 6).alias("ex_kurtosis"),
        F.round(F.expr(_JB_STAT), 6).alias("jb_stat"),
    )

# ------------------------------------- Bartlett variance homogeneity
# k-group equal-variance test from exact integer moments: the
# Σx²−(Σx)²/n shape subtracts AS INTEGERS (a_i = n·s2 − s1², the
# SCALE.md Chow rule), so each group variance is one exact-integer /
# exact-integer double. ln appears only in the final k-row readout.

_BARTLETT_ORACLE = f"""
WITH {_TYPE_CELLS_DUCK},
grp AS (
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(c) * SUM(CAST(c AS HUGEINT) * vq * vq)
                - SUM(CAST(c AS HUGEINT) * vq) * SUM(CAST(c AS HUGEINT) * vq)
               AS HUGEINT) AS a
    FROM cells GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn,
           CAST(COUNT(*) AS BIGINT) AS k,
           SUM(CAST(a AS DOUBLE) / n) AS sp2num,
           SUM((n - 1) * LN(CAST(a AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)))) AS lsum,
           SUM(1.0 / (n - 1)) AS csum
    FROM grp
)
SELECT g.event_type, g.n AS n_group,
       ROUND(CAST(g.a AS DOUBLE) / (CAST(g.n AS DOUBLE) * (g.n - 1))
             / 1e4, 6) AS var_value,
       ROUND(((t.nn - t.k) * LN(t.sp2num / (t.nn - t.k)) - t.lsum)
             / (1 + (t.csum - 1.0 / (t.nn - t.k))
                    / (3.0 * (t.k - 1))), 6) AS bartlett_stat
FROM grp g, tot t
"""


@query("bartlett_variance_test", oracle=_BARTLETT_ORACLE)
def bartlett_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARTLETT'S TEST of variance homogeneity across event types —
    the classical (normality-assuming, maximally powerful) member of
    the scale battery: brown_forsythe is the robust screen,
    ansari_bradley the rank fallback, Bartlett the sharp instrument
    when jarque_bera_by_type clears the normality gate.

    Determinism: per-group a_i = n·Σx² − (Σx)² subtracts AS INTEGERS
    in DECIMAL(38,0)/HUGEINT (the SCALE.md cancellation rule); each
    variance is one exact-integer ratio; ln and the k-term sums run
    over the 5-row group frame (the KW 5-term-double convention —
    last-ulp accumulation noise sits ~9 orders below the ROUND 6
    boundary). ln(centi² units) cancels exactly in M because
    Σ(n_i−1) = N−k. NULLIF-free: every n_i ≥ 2 here; a one-row group
    would make a_i/0 NULL and propagate NULL, not a wrong number.

    100 TB shape: one map-side cell aggregate bounded by the value
    domain; the group frame is k rows; nothing else exists."""
    cells = _type_cells(spark, sf_dir).localCheckpoint()  # bounded;
    # the k-row group frame is consumed by tot AND the final readout
    grp = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        (
            F.sum("c").cast(_DEC)
            * F.sum(F.col("c").cast(_DEC) * F.col("vq") * F.col("vq"))
            - F.sum(F.col("c").cast(_DEC) * F.col("vq"))
            * F.sum(F.col("c").cast(_DEC) * F.col("vq"))
        ).alias("a"),
    )
    var_d = F.col("a").cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1)
    )
    tot = grp.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("a").cast("double") / F.col("n")).alias("sp2num"),
        F.sum((F.col("n") - 1) * F.log(var_d)).alias("lsum"),
        F.sum(1.0 / (F.col("n") - 1)).alias("csum"),
    )
    stat = (
        (F.col("nn") - F.col("k")) * F.log(F.col("sp2num") / (F.col("nn") - F.col("k")))
        - F.col("lsum")
    ) / (
        1
        + (F.col("csum") - 1.0 / (F.col("nn") - F.col("k")))
        / (3.0 * (F.col("k") - 1))
    )
    return grp.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("n").alias("n_group"),
        F.round(var_d / 1e4, 6).alias("var_value"),
        F.round(stat, 6).alias("bartlett_stat"),
    )


# ------------------------------------------------ Welch's ANOVA
# k-group mean comparison WITHOUT the equal-variance assumption —
# what anova_oneway_value should have been wherever
# brown_forsythe/bartlett reject homogeneity. Weights w_i = n_i/s_i²
# from the same exact integer moments.

_WELCH_ANOVA_ORACLE = f"""
WITH {_TYPE_CELLS_DUCK},
grp AS (
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CAST(c AS HUGEINT) * vq) AS HUGEINT) AS s1,
           CAST(SUM(c) * SUM(CAST(c AS HUGEINT) * vq * vq)
                - SUM(CAST(c AS HUGEINT) * vq) * SUM(CAST(c AS HUGEINT) * vq)
               AS HUGEINT) AS a
    FROM cells GROUP BY 1
),
wg AS (
    SELECT event_type, n,
           CAST(s1 AS DOUBLE) / n AS mean_c,
           CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * (n - 1))
               / CAST(a AS DOUBLE) AS w
    FROM grp
),
t1 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
           SUM(w) AS wsum, SUM(w * mean_c) AS wmsum
    FROM wg
),
t2 AS (
    SELECT SUM(g.w * (g.mean_c - t.wmsum / t.wsum)
               * (g.mean_c - t.wmsum / t.wsum)) / (t.k - 1) AS anum,
           SUM((1 - g.w / t.wsum) * (1 - g.w / t.wsum)
               / (g.n - 1)) AS bden,
           ANY_VALUE(t.k) AS k, ANY_VALUE(t.nn) AS nn
    FROM wg g, t1 t
    GROUP BY t.k, t.nn, t.wsum
)
SELECT k, nn AS n_total,
       ROUND(anum / (1 + 2.0 * (k - 2)
                     * (3.0 * bden / (CAST(k AS DOUBLE) * k - 1))
                     / 3.0), 6) AS welch_f,
       ROUND((CAST(k AS DOUBLE) * k - 1) / (3.0 * bden), 6) AS df2
FROM t2
"""


@query("welch_anova_value", oracle=_WELCH_ANOVA_ORACLE)
def welch_anova_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S HETEROSCEDASTIC ANOVA of value across event types —
    the k-group mean test that drops one-way ANOVA's equal-variance
    assumption (the k-group generalization of welch_ttest, and the
    parametric escape hatch when bartlett_variance_test rejects).
    F* = Σw_i(x̄_i − x̄_w)²/(k−1) over 1 + 2(k−2)Λ/3, Λ =
    3Σ(1−w_i/W)²/((n_i−1)(k²−1)), df2 = 1/Λ.

    Determinism: group means and variances come from exact integer
    moments (s1, and the integer-subtracted a = n·Σx² − (Σx)²);
    weights w = n(n(n−1))/a are one double division each;
    the k-term combination sums follow the KW 5-term-double
    convention. Centi-units cancel in F (w·mean² is unit-free).

    100 TB shape: identical to bartlett — one bounded cell aggregate,
    then k-row algebra."""
    cells = _type_cells(spark, sf_dir).localCheckpoint()  # bounded;
    # wg feeds t1 AND the t2 combination
    grp = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(_DEC) * F.col("vq")).alias("s1"),
        (
            F.sum("c").cast(_DEC)
            * F.sum(F.col("c").cast(_DEC) * F.col("vq") * F.col("vq"))
            - F.sum(F.col("c").cast(_DEC) * F.col("vq"))
            * F.sum(F.col("c").cast(_DEC) * F.col("vq"))
        ).alias("a"),
    )
    wg = grp.select(
        "event_type", "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean_c"),
        (
            F.col("n").cast("double")
            * (F.col("n").cast("double") * (F.col("n") - 1))
            / F.col("a").cast("double")
        ).alias("w"),
    )
    t1 = wg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("w").alias("wsum"),
        F.sum(F.col("w") * F.col("mean_c")).alias("wmsum"),
    )
    j = wg.crossJoin(F.broadcast(t1))
    dev = F.col("mean_c") - F.col("wmsum") / F.col("wsum")
    t2 = j.groupBy("k", "nn", "wsum").agg(
        (F.sum(F.col("w") * dev * dev) / (F.col("k") - 1)).alias("anum"),
        F.sum(
            (1 - F.col("w") / F.col("wsum"))
            * (1 - F.col("w") / F.col("wsum"))
            / (F.col("n") - 1)
        ).alias("bden"),
    )
    kd = F.col("k").cast("double")
    lam = 3.0 * F.col("bden") / (kd * kd - 1)
    return t2.select(
        "k",
        F.col("nn").alias("n_total"),
        F.round(
            F.col("anum") / (1 + 2.0 * (F.col("k") - 2) * lam / 3.0), 6
        ).alias("welch_f"),
        F.round((kd * kd - 1) / (3.0 * F.col("bden")), 6).alias("df2"),
    )

# -------------------------------------------- Dunn post-hoc pairwise
# The follow-up kruskal_wallis_value_by_type lacks: WHICH type pairs
# differ. Dunn's z on the same sort-free tie-group rank device (mean
# midranks from integer 2*rank sums, pooled tie correction).

_DUNN_ORACLE = f"""
WITH {_TYPE_CELLS_DUCK},
vals AS (
    SELECT vq, CAST(SUM(c) AS BIGINT) AS cv FROM cells GROUP BY 1
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
           CAST(SUM(c.c) AS BIGINT) AS nj,
           CAST(SUM(CAST(c.c AS HUGEINT)
                    * (2 * CAST(w.prev AS HUGEINT) + w.cv + 1)) AS HUGEINT)
               AS r2j
    FROM cells c JOIN w ON c.vq = w.vq
    GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(cv) AS BIGINT) AS n,
           CAST(SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS HUGEINT) AS tsum
    FROM w
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       ROUND(CAST(a.r2j AS DOUBLE) / (2.0 * a.nj), 6) AS mean_rank_a,
       ROUND(CAST(b.r2j AS DOUBLE) / (2.0 * b.nj), 6) AS mean_rank_b,
       ROUND((CAST(a.r2j AS DOUBLE) / (2.0 * a.nj)
              - CAST(b.r2j AS DOUBLE) / (2.0 * b.nj))
             / SQRT((CAST(t.n AS DOUBLE) * (t.n + 1) / 12.0
                     - CAST(t.tsum AS DOUBLE) / (12.0 * (t.n - 1)))
                    * (1.0 / a.nj + 1.0 / b.nj)), 6) AS dunn_z
FROM grp a JOIN grp b ON a.event_type < b.event_type, tot t
"""


@query("dunn_posthoc_pairwise", oracle=_DUNN_ORACLE)
def dunn_posthoc_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUNN'S POST-HOC test for every event-type pair — the step after
    kruskal_wallis_value_by_type rejects: z_ab = (R̄_a − R̄_b) / sqrt(
    (N(N+1)/12 − Σ(t³−t)/(12(N−1))) (1/n_a + 1/n_b)) on the POOLED
    midranks (not pairwise re-ranks — that would be pairwise
    Mann-Whitneys, a different test). The rank twin of
    tukey_hsd_pairwise.

    Determinism: the same sort-free tie-group device as KW — integer
    2*rank sums in DECIMAL(38,0)/HUGEINT off bounded value cells; the
    z is one shared-verbatim double readout per pair; pairs ordered
    type_a < type_b.

    100 TB shape: one bounded cell aggregate, one window over cells,
    then a k-row self-join (k=5 -> 10 pairs). Nothing scales with
    rows."""
    cells = _type_cells(spark, sf_dir).localCheckpoint()  # bounded;
    # vals, both pair sides, and tot all derive from it
    vals = cells.groupBy("vq").agg(F.sum("c").cast("long").alias("cv"))
    wprev = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    w = vals.select(
        "vq", "cv",
        F.coalesce(F.sum("cv").over(wprev), F.lit(0)).cast("long").alias("prev"),
    )
    grp = (
        cells.join(w, "vq")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("nj"),
            F.sum(
                F.col("c").cast(_DEC)
                * (2 * F.col("prev") + F.col("cv") + 1).cast(_DEC)
            ).alias("r2j"),
        )
    )
    tot = w.agg(
        F.sum("cv").cast("long").alias("n"),
        F.sum(
            F.col("cv").cast(_DEC) * F.col("cv").cast(_DEC) * F.col("cv").cast(_DEC)
            - F.col("cv").cast(_DEC)
        ).alias("tsum"),
    )
    a = grp.select(
        F.col("event_type").alias("type_a"),
        F.col("nj").alias("na"), F.col("r2j").alias("r2a"),
    )
    b = grp.select(
        F.col("event_type").alias("type_b"),
        F.col("nj").alias("nb"), F.col("r2j").alias("r2b"),
    )
    ra = F.col("r2a").cast("double") / (2.0 * F.col("na"))
    rb = F.col("r2b").cast("double") / (2.0 * F.col("nb"))
    nd = F.col("n").cast("double")
    sig2 = nd * (F.col("n") + 1) / 12.0 - F.col("tsum").cast("double") / (
        12.0 * (F.col("n") - 1)
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a", "type_b",
            F.round(ra, 6).alias("mean_rank_a"),
            F.round(rb, 6).alias("mean_rank_b"),
            F.round(
                (ra - rb)
                / F.sqrt(sig2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
                6,
            ).alias("dunn_z"),
        )
    )


# ------------------------------------------- Kendall's W concordance
# Effect size for friedman_test_day_blocks: how CONSISTENTLY do the
# calendar days rank the event types? W = 3·S4/(b²k(k²−1)) with
# S4 = Σ_j (R2_j − b(k+1))² — the ×2-carried version of
# 12·Σ(R_j − b(k+1)/2)²/(b²k(k²−1)), so S4 is an exact integer.

_KENDALL_W_ORACLE = f"""
WITH k AS (
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM events
    WHERE value IS NOT NULL
),
cells AS (
    SELECT date_trunc('day', {DUCK_TS}) AS day, event_type,
           CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
full_blocks AS (
    SELECT day FROM cells, k GROUP BY day, k.k
    HAVING COUNT(*) = ANY_VALUE(k.k)
),
ranked AS (
    SELECT c.day, c.event_type,
           2 * RANK() OVER (PARTITION BY c.day ORDER BY c.mq)
             + CAST(COUNT(*) OVER (PARTITION BY c.day, c.mq) AS BIGINT) - 1
               AS r2
    FROM cells c JOIN full_blocks f ON c.day = f.day
),
sums AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS b,
           CAST(SUM(CAST(r2 AS HUGEINT)) AS HUGEINT) AS r2sum
    FROM ranked GROUP BY 1
),
s AS (
    SELECT CAST(SUM(dev * dev) AS HUGEINT) AS s4,
           MAX(b) AS b, CAST(COUNT(*) AS BIGINT) AS k
    FROM (
        SELECT b,
               r2sum - MAX(b) OVER () * (COUNT(*) OVER () + 1) AS dev
        FROM sums
    )
)
SELECT b AS n_blocks, k,
       ROUND(3.0 * CAST(s4 AS DOUBLE)
             / (CAST(b AS DOUBLE) * b * k
                * (CAST(k AS DOUBLE) * k - 1)), 6) AS kendall_w,
       ROUND(CAST(b AS DOUBLE) * (k - 1)
             * (3.0 * CAST(s4 AS DOUBLE)
                / (CAST(b AS DOUBLE) * b * k
                   * (CAST(k AS DOUBLE) * k - 1))), 6) AS friedman_q_implied
FROM s
"""


@query("kendall_w_concordance", oracle=_KENDALL_W_ORACLE)
def kendall_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S COEFFICIENT OF CONCORDANCE W over the Friedman rank
    frame: b complete calendar days each rank the k event types by
    daily mean value; W ∈ [0,1] is the effect size
    friedman_test_day_blocks's Q lacks (Q grows with b even at fixed
    agreement; W = Q/(b(k−1)) normalizes it — the implied Q is
    reported as the cross-check against the Friedman query).

    Determinism: same integer rank device as Friedman (1e-6 cell
    means, ×2-carried within-block average ranks); the sum of squared
    deviations is the ×2-carried S4 = Σ(R2_j − b(k+1))², an EXACT
    integer in DECIMAL(38,0)/HUGEINT; W is one shared-verbatim double.

    100 TB shape: one bounded (day × type) cell aggregate; rank
    windows over ≤ k rows per day; k-row algebra after."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    k = ev.agg(F.countDistinct("event_type").cast("long").alias("k"))
    cells = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(
            F.round(
                F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"))
                / F.count(F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("mq")
        )
        .localCheckpoint()  # bounded days x types frame (the friedman
        # convention): completeness filter + rank join read it once
    )
    full = (
        cells.crossJoin(F.broadcast(k))
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == F.col("k"))
        .select("day")
    )
    wday = Window.partitionBy("day").orderBy("mq")
    wtie = Window.partitionBy("day", "mq")
    ranked = cells.join(full, "day").select(
        "event_type",
        (
            2 * F.rank().over(wday)
            + F.count(F.lit(1)).over(wtie).cast("long")
            - 1
        ).alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.sum(F.col("r2").cast(_DEC)).alias("r2sum"),
    )
    wall = Window.partitionBy()
    dev = F.col("r2sum") - (
        F.max("b").over(wall) * (F.count(F.lit(1)).over(wall) + 1)
    ).cast(_DEC)
    s = sums.select(
        dev.alias("dev"), F.col("b"),
    ).agg(
        F.sum(F.col("dev") * F.col("dev")).alias("s4"),
        F.max("b").alias("b"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    bd = F.col("b").cast("double")
    kd = F.col("k").cast("double")
    wstat = 3.0 * F.col("s4").cast("double") / (bd * bd * F.col("k") * (kd * kd - 1))
    return s.select(
        F.col("b").alias("n_blocks"),
        "k",
        F.round(wstat, 6).alias("kendall_w"),
        F.round(bd * (F.col("k") - 1) * wstat, 6).alias("friedman_q_implied"),
    )

# --------------------------------------------- KPSS level stationarity
# The null-reversed companion to mann_kendall_trend: KPSS's H0 is
# "level-stationary" (Mann-Kendall's H0 is "no trend"), so running
# both separates trend-stationary from unit-root behavior. Partial
# sums and autocovariances of the hourly mean series stay EXACT by
# working on d_t = n*mq_t - sum(mq) (the n-scaled residual, integer);
# the n-scales cancel in the ratio: eta = sum(S_d^2) / (n * (g0 +
# 2*sum(w_l*g_l))). The Bartlett bandwidth floor(4*(n/100)^0.25) is
# chosen by PURE-INTEGER comparison (b^4 * 100 <= 256 * n), never
# libm pow at a floor boundary.

_KPSS_SERIES = f"""
series AS (
    SELECT ROW_NUMBER() OVER (ORDER BY bucket) - 1 AS idx, mq
    FROM (
        SELECT date_trunc('hour', {DUCK_TS}) AS bucket,
               CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT))
                          / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    )
)
"""

_KPSS_ORACLE = f"""
WITH {_KPSS_SERIES},
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(mq AS HUGEINT)) AS HUGEINT) AS sm
    FROM series
),
d AS (
    SELECT idx, CAST(t.n * mq - t.sm AS HUGEINT) AS d
    FROM series, tot t
),
ssq AS (
    SELECT CAST(SUM(s * s) AS HUGEINT) AS ssq
    FROM (
        SELECT CAST(SUM(d) OVER (ORDER BY idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS HUGEINT) AS s
        FROM d
    )
),
bw AS (
    SELECT CAST(MAX(b) AS BIGINT) AS b
    FROM (SELECT unnest(generate_series(0, 20)) AS b), tot
    WHERE b * b * b * b * 100 <= 256 * n
),
gam AS (
    SELECT l, CAST(SUM(d1.d * d2.d) AS HUGEINT) AS g
    FROM (SELECT unnest(generate_series(0, (SELECT b FROM bw))) AS l),
         d d1 JOIN d d2 ON d2.idx = d1.idx + l
    GROUP BY 1
),
sig AS (
    SELECT SUM(CASE WHEN l = 0 THEN CAST(g AS DOUBLE)
                    ELSE 2 * (1 - CAST(l AS DOUBLE) / (b + 1))
                         * CAST(g AS DOUBLE) END) AS lrv
    FROM gam, bw
)
SELECT t.n AS n_hours, bw.b AS bandwidth,
       ROUND(CAST(ssq.ssq AS DOUBLE) / (CAST(t.n AS DOUBLE) * sig.lrv), 6)
           AS kpss_eta
FROM tot t, bw, ssq, sig
"""


@query("kpss_level_stationarity", oracle=_KPSS_ORACLE)
def kpss_level_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS LEVEL-STATIONARITY test of the hourly mean-value series —
    the reversed-null companion to mann_kendall_trend (KPSS rejects
    when the level WANDERS; Mann-Kendall rejects when it TRENDS;
    together they classify trend-stationary vs unit-root vs
    stationary, the check every forecaster in the registry implicitly
    assumes). eta = Σ_t S_t² / (n² σ̂²_lr) with a Bartlett-window
    long-run variance at bandwidth floor(4 (n/100)^0.25).

    Determinism: the series sits on the 1e-6 integer grid (the
    friedman/fisher cell-mean convention); residuals are carried
    n-SCALED (d_t = n·mq_t − Σmq, exact integer), so partial sums,
    their squares, and every autocovariance Σ d_t d_{t+l} are exact
    DECIMAL(38,0)/HUGEINT — the n-scales cancel in the final ratio.
    The bandwidth comes from an integer inequality (b⁴·100 ≤ 256n),
    not libm pow, so a 1-ulp pow flip can't move the floor.

    100 TB shape: ONE map-side aggregate to the hourly series
    (bounded by the time span); the lag frame is hours × bandwidth
    (~13 lags) — everything downstream is time-bounded, row-count
    independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.round(
            F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"))
            / F.count(F.lit(1)).cast("double")
        ).cast("long").alias("mq")
    )
    series = hourly.select(
        (F.row_number().over(Window.orderBy("bucket")) - 1).alias("idx"), "mq"
    ).localCheckpoint()  # time-bounded; residual frame + lag self-join
    # + totals all read it without replaying the fact scan
    tot = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("mq").cast(_DEC)).alias("sm"),
    )
    d = series.crossJoin(F.broadcast(tot)).select(
        "idx",
        (F.col("n").cast(_DEC) * F.col("mq").cast(_DEC) - F.col("sm")).alias("d"),
        "n",
    ).localCheckpoint()  # reused by the cumulative window AND the lag join
    wc = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    ssq = d.select(F.sum("d").over(wc).alias("s")).agg(
        F.sum(F.col("s") * F.col("s")).alias("ssq")
    )
    bw = (
        tot.select(F.explode(F.sequence(F.lit(0), F.lit(20))).alias("b"), "n")
        .filter(
            F.col("b") * F.col("b") * F.col("b") * F.col("b") * 100
            <= 256 * F.col("n")
        )
        .agg(F.max("b").cast("long").alias("b"))
    )
    lags = bw.select(F.explode(F.sequence(F.lit(0), F.col("b").cast("int"))).alias("l"))
    d1 = d.select(F.col("idx").alias("i1"), F.col("d").alias("v1"))
    d2 = d.select(F.col("idx").alias("i2"), F.col("d").alias("v2"))
    gam = (
        lags.join(d1)
        .join(d2, F.col("i2") == F.col("i1") + F.col("l"))
        .groupBy("l")
        .agg(F.sum(F.col("v1") * F.col("v2")).alias("g"))
    )
    sig = gam.crossJoin(F.broadcast(bw)).agg(
        F.sum(
            F.when(F.col("l") == 0, F.col("g").cast("double")).otherwise(
                2 * (1 - F.col("l").cast("double") / (F.col("b") + 1))
                * F.col("g").cast("double")
            )
        ).alias("lrv")
    )
    return (
        tot.crossJoin(F.broadcast(bw))
        .crossJoin(F.broadcast(ssq))
        .crossJoin(F.broadcast(sig))
        .select(
            F.col("n").alias("n_hours"),
            F.col("b").alias("bandwidth"),
            F.round(
                F.col("ssq").cast("double")
                / (F.col("n").cast("double") * F.col("lrv")),
                6,
            ).alias("kpss_eta"),
        )
    )

# -------------------------------------- Mahalanobis bivariate top-k
# Covariance-aware outlier scan over (value, props.k): the quadratic
# form Q = C·u² − 2B·u·v + A·v² is EXACT integer (u = n·x − Σx,
# v = n·y − Σy, and A/B/C the integer-subtracted central moments), so
# the top-k ORDERING is integer-decided; the reported distance
# d² = (n−1)·Q/(n·det) is one shared-verbatim double.

MAHA_TOP = 25

_MAHA_BASE_DUCK = f"""
base AS (
    SELECT event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS x,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS y,
           value
    FROM events
    WHERE value IS NOT NULL
      AND json_extract_string(props, '$.k') IS NOT NULL
)
"""

_MAHA_ORACLE = f"""
WITH {_MAHA_BASE_DUCK},
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
               AS HUGEINT) AS a,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS b,
           CAST(COUNT(*) * SUM(CAST(y AS HUGEINT) * y)
                - SUM(CAST(y AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS c
    FROM base
),
scored AS (
    SELECT base.event_id, base.event_type, base.value, base.y AS k_prop,
           m.c * (m.n * base.x - m.sx) * (m.n * base.x - m.sx)
             - 2 * m.b * (m.n * base.x - m.sx) * (m.n * base.y - m.sy)
             + m.a * (m.n * base.y - m.sy) * (m.n * base.y - m.sy) AS q,
           m.n, m.a * m.c - m.b * m.b AS det
    FROM base, mom m
)
SELECT event_id, event_type, value, k_prop,
       ROUND(SQRT(CAST(q AS DOUBLE) / CAST(det AS DOUBLE)
                  * (CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE)), 6)
           AS mahalanobis_d
FROM scored
ORDER BY q DESC, event_id
LIMIT {MAHA_TOP}
"""


@query("mahalanobis_outlier_topk", oracle=_MAHA_ORACLE)
def mahalanobis_outlier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{MAHA_TOP} MAHALANOBIS outliers in the bivariate (value,
    props.k) cloud — the covariance-aware generalization of
    zscore_anomaly and grubbs_outlier_scan: a point can be
    unremarkable on each axis yet extreme against the joint
    correlation structure, which per-axis z-scores cannot see.

    Determinism: the quadratic form Q = C·u² − 2B·u·v + A·v² is EXACT
    integer in DECIMAL(38,0)/HUGEINT (u = n·x − Σx clears the double
    mean; A/B/C are the integer-subtracted central moments — the
    SCALE.md Chow rule in matrix form), so the top-k ORDER is decided
    by integer comparison with an event_id tiebreak; the reported
    d² = (n−1)Q/(n·det) via the Cramer 2×2 inverse is one
    shared-verbatim double.

    100 TB shape: one moment aggregate (6 sums), one broadcast
    join-back, one TakeOrderedAndProject — no shuffle of the fact
    beyond the aggregate's partials. Rescale note: Q ~ n³·x²·y²
    passes DECIMAL(38,0) around ~1e9 rows; there, anchor x/y on
    integer mean floors first (the jarque_bera device) — ranks and
    distances are translation-invariant."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "event_type", "value",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
    ).filter(F.col("value").isNotNull() & F.col("y").isNotNull())
    # SPREAD THE PER-ROW WORK (registry.spread_scan, guide §2.5):
    # events.parquet is one scan split, so the JSON prop parse, the
    # DECIMAL(38) moment partials and the per-row quadratic-form
    # scoring all ran in a single task (1.8-2.1 -> 1.07-1.47 s
    # spread); gated no-op at production split counts.
    base = spread_scan(base, "event_id")
    xd, yd = F.col("x").cast(_DEC), F.col("y").cast(_DEC)
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        (F.count(F.lit(1)) * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).alias("a"),
        (F.count(F.lit(1)) * F.sum(xd * yd) - F.sum(xd) * F.sum(yd)).alias("b"),
        (F.count(F.lit(1)) * F.sum(yd * yd) - F.sum(yd) * F.sum(yd)).alias("c"),
    )
    j = base.crossJoin(F.broadcast(mom))
    u = F.col("n").cast(_DEC) * F.col("x") - F.col("sx")
    v = F.col("n").cast(_DEC) * F.col("y") - F.col("sy")
    scored = j.select(
        "event_id", "event_type", "value",
        F.col("y").alias("k_prop"),
        (F.col("c") * u * u - 2 * F.col("b") * u * v + F.col("a") * v * v)
        .alias("q"),
        "n",
        (F.col("a") * F.col("c") - F.col("b") * F.col("b")).alias("det"),
    )
    return (
        scored.orderBy(F.col("q").desc(), "event_id")
        .limit(MAHA_TOP)
        .select(
            "event_id", "event_type", "value", "k_prop",
            F.round(
                F.sqrt(
                    F.col("q").cast("double") / F.col("det").cast("double")
                    * (F.col("n").cast("double") - 1) / F.col("n").cast("double")
                ),
                6,
            ).alias("mahalanobis_d"),
        )
    )


# ------------------------------------------ Hotelling's T² (weekend)
# Two-sample multivariate mean test on (value, props.k): does the
# weekend JOINT centroid differ from the weekday one? The
# multivariate mannwhitney/welch_ttest companion — two univariate
# t-tests miss a shift along the correlation axis.

_HOTELLING_ORACLE = f"""
WITH grp AS (
    SELECT CASE WHEN dayofweek({DUCK_TS}) IN (0, 6) THEN 1 ELSE 0 END AS we,
           CAST(ROUND(value * 100) AS BIGINT) AS x,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
    FROM events
    WHERE value IS NOT NULL
      AND json_extract_string(props, '$.k') IS NOT NULL
),
mom AS (
    SELECT we,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
               AS HUGEINT) AS a,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS b,
           CAST(COUNT(*) * SUM(CAST(y AS HUGEINT) * y)
                - SUM(CAST(y AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS c
    FROM grp GROUP BY 1
),
piv AS (
    SELECT MAX(CASE WHEN we = 0 THEN n END) AS n1,
           MAX(CASE WHEN we = 1 THEN n END) AS n2,
           MAX(CASE WHEN we = 0 THEN CAST(sx AS DOUBLE) / n END) AS mx1,
           MAX(CASE WHEN we = 1 THEN CAST(sx AS DOUBLE) / n END) AS mx2,
           MAX(CASE WHEN we = 0 THEN CAST(sy AS DOUBLE) / n END) AS my1,
           MAX(CASE WHEN we = 1 THEN CAST(sy AS DOUBLE) / n END) AS my2,
           SUM(CAST(a AS DOUBLE) / n) AS wxx,
           SUM(CAST(b AS DOUBLE) / n) AS wxy,
           SUM(CAST(c AS DOUBLE) / n) AS wyy
    FROM mom
)
SELECT n1 AS n_weekday, n2 AS n_weekend,
       ROUND((mx1 - mx2) / 100, 6) AS dx_value,
       ROUND(my1 - my2, 6) AS dy_k,
       ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2) * (n1 + n2 - 2)
             * ((wyy * (mx1 - mx2) * (mx1 - mx2)
                 - 2 * wxy * (mx1 - mx2) * (my1 - my2)
                 + wxx * (my1 - my2) * (my1 - my2))
                / NULLIF(wxx * wyy - wxy * wxy, 0)), 6) AS t2_stat,
       ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2) * (n1 + n2 - 3) / 2.0
             * ((wyy * (mx1 - mx2) * (mx1 - mx2)
                 - 2 * wxy * (mx1 - mx2) * (my1 - my2)
                 + wxx * (my1 - my2) * (my1 - my2))
                / NULLIF(wxx * wyy - wxy * wxy, 0)), 6) AS f_stat
FROM piv
"""


@query("hotelling_t2_weekend", oracle=_HOTELLING_ORACLE)
def hotelling_t2_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOTELLING'S T² two-sample test of the joint (value, props.k)
    mean vector, weekend vs weekday — the multivariate companion to
    welch_ttest/mannwhitney: a centroid shift along the correlation
    axis is invisible to two marginal t-tests but loads fully here.
    T² = (n1n2/N)(N−2) dᵀW⁻¹d over the pooled within-group scatter W;
    F = (N−3)/(2(N−2))·T² ~ F(2, N−3).

    Determinism: per-group scatters come from the integer-subtracted
    moment forms (exact DECIMAL(38,0)/HUGEINT); W entries are exact-
    integer / n ratios; the quadratic form and the Cramer 2×2 solve
    are one shared-verbatim double readout; NULLIF guards the
    degenerate collinear case.

    100 TB shape: ONE 2-group moment aggregate (map-side combine, 12
    cells) then scalar algebra — nothing else touches the fact."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.dayofweek("ts").isin(1, 7).cast("int").alias("we"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.get_json_object("props", "$.k").cast("long").alias("y"),
        "value",
    ).filter(F.col("value").isNotNull() & F.col("y").isNotNull())
    xd, yd = F.col("x").cast(_DEC), F.col("y").cast(_DEC)
    mom = base.groupBy("we").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        (F.count(F.lit(1)) * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).alias("a"),
        (F.count(F.lit(1)) * F.sum(xd * yd) - F.sum(xd) * F.sum(yd)).alias("b"),
        (F.count(F.lit(1)) * F.sum(yd * yd) - F.sum(yd) * F.sum(yd)).alias("c"),
    )
    piv = mom.agg(
        F.max(F.when(F.col("we") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("we") == 1, F.col("n"))).alias("n2"),
        F.max(
            F.when(F.col("we") == 0, F.col("sx").cast("double") / F.col("n"))
        ).alias("mx1"),
        F.max(
            F.when(F.col("we") == 1, F.col("sx").cast("double") / F.col("n"))
        ).alias("mx2"),
        F.max(
            F.when(F.col("we") == 0, F.col("sy").cast("double") / F.col("n"))
        ).alias("my1"),
        F.max(
            F.when(F.col("we") == 1, F.col("sy").cast("double") / F.col("n"))
        ).alias("my2"),
        F.sum(F.col("a").cast("double") / F.col("n")).alias("wxx"),
        F.sum(F.col("b").cast("double") / F.col("n")).alias("wxy"),
        F.sum(F.col("c").cast("double") / F.col("n")).alias("wyy"),
    )
    dx, dy = F.col("mx1") - F.col("mx2"), F.col("my1") - F.col("my2")
    qform = (
        F.col("wyy") * dx * dx - 2 * F.col("wxy") * dx * dy + F.col("wxx") * dy * dy
    ) / F.nullif(
        F.col("wxx") * F.col("wyy") - F.col("wxy") * F.col("wxy"), F.lit(0.0)
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = F.col("n1") + F.col("n2")
    return piv.select(
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        F.round(dx / 100, 6).alias("dx_value"),
        F.round(dy, 6).alias("dy_k"),
        F.round(n1d * n2d / nn * (nn - 2) * qform, 6).alias("t2_stat"),
        F.round(n1d * n2d / nn * (nn - 3) / 2.0 * qform, 6).alias("f_stat"),
    )

# ---------------------------------- Theil inequality decomposition
# Theil T of customer revenue, decomposed by nation: T = Σ_g s_g T_g
# (within) + Σ_g s_g ln(x̄_g/μ) (between) — the property Gini lacks
# (gini_customer_revenue reports the level; Theil says WHERE the
# inequality lives). Revenue is exact cents; per-customer entropy
# terms quantize to 1e-9 before the distributed sum.

_THEIL_ORACLE = """
WITH cust AS (
    SELECT c.c_custkey, n.n_name,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rq
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
),
grp AS (
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS ng,
           CAST(SUM(CAST(rq AS HUGEINT)) AS HUGEINT) AS rg
    FROM cust GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(rg) AS HUGEINT) AS r
    FROM grp
),
within AS (
    SELECT c.n_name,
           CAST(SUM(CAST(ROUND(
               (CAST(c.rq * g.ng AS DOUBLE) / g.rg)
               * LN(CAST(c.rq * g.ng AS DOUBLE) / g.rg) * 1e9)
               AS BIGINT)) AS HUGEINT) AS tsum_nano
    FROM cust c JOIN grp g USING (n_name)
    GROUP BY 1
)
SELECT g.n_name, g.ng AS n_customers,
       ROUND(CAST(g.rg AS DOUBLE) / t.r, 6) AS revenue_share,
       ROUND(CAST(w.tsum_nano AS DOUBLE) / 1e9 / g.ng, 6) AS theil_within,
       ROUND(CAST(g.rg AS DOUBLE) / t.r
             * LN((CAST(g.rg AS DOUBLE) * t.n)
                  / (CAST(t.r AS DOUBLE) * g.ng)), 6) AS between_term
FROM grp g JOIN within w USING (n_name), tot t
"""


@query("theil_inequality_decomposition", oracle=_THEIL_ORACLE)
def theil_inequality_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T INEQUALITY of customer revenue DECOMPOSED BY NATION —
    the additive between/within split the Gini family cannot do
    (gini_customer_revenue and the per-nation Gini report levels;
    Theil T = Σ_g s_g·T_g + Σ_g s_g·ln(x̄_g/μ) says how much
    inequality lives inside nations vs between them — the standard
    market-concentration decomposition).

    Determinism: revenue in exact cents (BIGINT); the per-customer
    ratio x_i/x̄_g forms as the exact integer product rq·n_g cast to
    double over the exact integer R_g (one division, shared
    verbatim); each entropy term quantizes to 1e-9 BIGINT before the
    distributed per-nation sum; between-terms are 25-row algebra.

    100 TB shape: one customer-keyed revenue aggregate (the only fact
    shuffle), one broadcast of the 25-row nation frame back onto it,
    per-nation sums — entropy terms never leave the map side."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "n_name")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("rq")
        )
        # customer-bounded frame consumed by grp, within, and the
        # readout — checkpoint so the orders join runs once
        .localCheckpoint()
    )
    grp = cust.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("rq").cast(_DEC)).alias("rg"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("rg").alias("r")
    )
    ratio = F.expr("CAST(rq * ng AS DOUBLE) / rg")
    within = (
        cust.join(F.broadcast(grp), "n_name")
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(ratio * F.log(ratio) * 1e9).cast("long").cast(_DEC)
            ).alias("tsum_nano")
        )
    )
    return (
        grp.join(F.broadcast(within), "n_name")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            F.col("ng").alias("n_customers"),
            F.round(F.col("rg").cast("double") / F.col("r"), 6).alias(
                "revenue_share"
            ),
            F.round(
                F.col("tsum_nano").cast("double") / 1e9 / F.col("ng"), 6
            ).alias("theil_within"),
            F.round(
                F.col("rg").cast("double") / F.col("r")
                * F.log(
                    (F.col("rg").cast("double") * F.col("n"))
                    / (F.col("r").cast("double") * F.col("ng"))
                ),
                6,
            ).alias("between_term"),
        )
    )

# --------------------------------- Restricted mean survival time
# RMST(tau) = area under the Kaplan-Meier curve up to tau — the
# scalar summary that turns the KM curve into a decision number
# ("expected activity-gap minutes within the next tau"), robust where
# the median is undefined because S never crosses 0.5. Reuses the
# exact kaplan_meier_waits construction (queries_analytics2.py):
# integer log-sum hazards; survival quantized to nano BEFORE the
# width-weighted sum, so the area is an exact integer per tau.

RMST_TAUS = (60, 240, 480)  # minutes

_RMST_ORACLE = f"""
WITH ts_ AS (
    SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
    FROM events
),
obs AS (SELECT CAST(max(us) AS BIGINT) AS obs_end FROM ts_),
spells AS (
    SELECT CAST((COALESCE(next_us, obs_end) - us) // 60000000 AS BIGINT)
               AS t_min,
           CASE WHEN next_us IS NULL THEN 0 ELSE 1 END AS observed
    FROM (
        SELECT user_id, us,
               LEAD(us) OVER (PARTITION BY user_id ORDER BY us) AS next_us
        FROM ts_
    ), obs
),
cells AS (
    SELECT t_min, CAST(SUM(observed) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM spells GROUP BY 1
),
risk AS (
    SELECT *, CAST(SUM(c) OVER (ORDER BY t_min DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
    FROM cells
),
terms AS (
    SELECT t_min, d, n,
           CASE WHEN d = n THEN NULL
                WHEN d = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(ROUND(LN(1 - CAST(d AS DOUBLE) / n) * 1e9) AS BIGINT)
           END AS nano
    FROM risk
),
cum AS (
    SELECT t_min,
           CAST(COALESCE(SUM(nano) OVER wa, 0) AS BIGINT) AS cum_nano,
           CAST(COUNT(*) FILTER (nano IS NULL) OVER wa AS BIGINT) AS died_out,
           LEAD(t_min) OVER (ORDER BY t_min) AS next_t
    FROM terms
    WINDOW wa AS (ORDER BY t_min ROWS UNBOUNDED PRECEDING)
),
snano AS (
    SELECT t_min, next_t,
           CASE WHEN died_out > 0 THEN 0
                ELSE CAST(ROUND(EXP(CAST(cum_nano AS DOUBLE) / 1e9) * 1e9)
                          AS BIGINT) END AS s_nano
    FROM cum
),
first_t AS (SELECT CAST(MIN(t_min) AS BIGINT) AS t0 FROM snano),
taus AS (SELECT unnest(ARRAY{list(RMST_TAUS)}) AS tau),
area AS (
    SELECT tau,
           CAST(SUM(s_nano * GREATEST(0, LEAST(COALESCE(next_t, tau), tau)
                                         - LEAST(t_min, tau)))
               AS HUGEINT) AS a_nano
    FROM snano, taus
    GROUP BY 1
)
SELECT a.tau AS tau_min,
       ROUND((LEAST(f.t0, a.tau) * CAST(1e9 AS BIGINT)
              + CAST(a.a_nano AS DOUBLE)) / 1e9, 6) AS rmst_min
FROM area a, first_t f
ORDER BY 1
"""


@query("rmst_restricted_mean_survival", oracle=_RMST_ORACLE)
def rmst_restricted_mean_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTRICTED MEAN SURVIVAL TIME of the inter-event waiting
    process at tau = {RMST_TAUS} minutes — the area under
    kaplan_meier_waits' curve up to each horizon: "of the next tau
    minutes, how many does the typical wait survive?" The scalar the
    survival lane lacked (KM/Nelson-Aalen report curves, logrank a
    comparison; RMST is THE reportable effect size, defined even when
    S(t) never reaches 0.5 and a median wait does not exist).

    Determinism: identical exact construction as kaplan_meier_waits
    (integer cells, descending-cumsum risk sets, nano-quantized
    integer log-sum hazards); the step survival S(t) additionally
    quantizes to nano BEFORE the width-weighted area sum, so each
    RMST is an exact integer in nano-minute units; the [0, first
    step) segment contributes width * 1.0 exactly.

    100 TB shape: one user-keyed LEAD shuffle for spells, then
    everything runs over duration-bounded cells crossed with 3 taus;
    same cost envelope as the KM query it summarizes."""
    ev = load_table(spark, sf_dir, "events")
    ts_ = ev.select("user_id", F.unix_micros("ts").cast("long").alias("us"))
    obs = ts_.agg(F.max("us").cast("long").alias("obs_end"))
    w_u = Window.partitionBy("user_id").orderBy("us")
    spells = (
        ts_.withColumn("next_us", F.lead("us").over(w_u))
        .crossJoin(F.broadcast(obs))
        .select(
            F.expr("(coalesce(next_us, obs_end) - us) div 60000000")
            .cast("long").alias("t_min"),
            F.col("next_us").isNotNull().cast("int").alias("observed"),
        )
    )
    cells = spells.groupBy("t_min").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w_desc = (
        Window.partitionBy().orderBy(F.col("t_min").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = cells.withColumn("n", F.sum("c").over(w_desc).cast("long"))
    terms = risk.withColumn(
        "nano",
        F.when(F.col("d") == F.col("n"), F.lit(None))
        .when(F.col("d") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.log(1 - F.col("d").cast("double") / F.col("n")) * F.lit(1e9)
            ).cast("long")
        ),
    )
    w_asc = (
        Window.partitionBy().orderBy("t_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = terms.select(
        "t_min",
        F.coalesce(F.sum("nano").over(w_asc), F.lit(0)).cast("long")
        .alias("cum_nano"),
        F.count(F.when(F.col("nano").isNull(), 1)).over(w_asc).cast("long")
        .alias("died_out"),
        F.lead("t_min").over(Window.orderBy("t_min")).alias("next_t"),
    )
    snano = cum.select(
        "t_min", "next_t",
        F.when(F.col("died_out") > 0, F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.exp(F.col("cum_nano").cast("double") / 1e9) * 1e9
            ).cast("long")
        ).alias("s_nano"),
    ).localCheckpoint()  # duration-bounded step frame: the 3-tau area
    # cross and the first-step probe both read it
    first_t = snano.agg(F.min("t_min").cast("long").alias("t0"))
    taus = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in RMST_TAUS])).alias("tau")
    )
    area = (
        snano.crossJoin(F.broadcast(taus))
        .groupBy("tau")
        .agg(
            F.sum(
                F.col("s_nano").cast(_DEC)
                * F.greatest(
                    F.lit(0).cast("long"),
                    F.least(F.coalesce("next_t", "tau"), F.col("tau"))
                    - F.least("t_min", "tau"),
                ).cast(_DEC)
            ).alias("a_nano")
        )
    )
    return (
        area.crossJoin(F.broadcast(first_t))
        .select(
            F.col("tau").alias("tau_min"),
            F.round(
                (
                    F.least("t0", "tau").cast(_DEC)
                    * F.lit(1_000_000_000).cast(_DEC)
                    + F.col("a_nano")
                ).cast("double")
                / 1e9,
                6,
            ).alias("rmst_min"),
        )
    )

# ----------------------------------- Held-out bigram perplexity eval
# The eval the LM-filter lane lacked: bigram_lm_score trains and
# scores on the SAME corpus (useful as a filter signal, useless as a
# model eval). Here a 90/10 md5 hash split trains add-1-smoothed
# bigram counts on train and reports HELD-OUT perplexity per
# language — unseen contexts/words fall through to the uniform
# 1/(V+1) floor exactly (the implicit <unk>), so OOV handling is
# part of the measured number.

_PPL_HELD_DUCK_WS = """
w AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10
               < 9 AS is_train,
           string_split(text, ' ') AS ws
    FROM documents
),
bg AS (
    SELECT doc_id, lang, is_train, ws[i-1] AS prev, ws[i] AS cur
    FROM (
        SELECT doc_id, lang, is_train, ws,
               unnest(generate_series(2, len(ws))) AS i
        FROM w
    )
)
"""

_PPL_ORACLE = f"""
WITH {_PPL_HELD_DUCK_WS},
big AS (
    SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2
    FROM bg WHERE is_train GROUP BY 1, 2
),
ctx AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM big GROUP BY 1),
voc AS (
    SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
    FROM (SELECT unnest(ws) AS t FROM w WHERE is_train)
),
sc AS (
    SELECT h.lang, h.doc_id,
           CAST(ROUND(LN((COALESCE(b.c2, 0) + 1.0)
                         / (COALESCE(x.c1, 0) + v.v + 1)) * 1e9) AS BIGINT)
               AS lp_nano
    FROM bg h
    LEFT JOIN big b ON b.prev = h.prev AND b.cur = h.cur
    LEFT JOIN ctx x ON x.prev = h.prev
    CROSS JOIN voc v
    WHERE NOT h.is_train
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(lp_nano) AS DOUBLE) / 1e9 / COUNT(*), 6)
           AS avg_logprob,
       ROUND(EXP(-(CAST(SUM(lp_nano) AS DOUBLE) / 1e9 / COUNT(*))), 6)
           AS perplexity
FROM sc GROUP BY 1
"""


@query("bigram_perplexity_heldout", oracle=_PPL_ORACLE)
def bigram_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT BIGRAM PERPLEXITY per language: train add-1-smoothed
    bigram counts on the md5-90% split, score the held-out 10%,
    report exp(−mean log P(cur|prev)) — the top rung of the LM ladder
    (unigram_logprob_score -> bigram_lm_score -> a real train/test
    eval), and the CCNet-style quality signal measured the honest
    way: a model scored on its own training text cannot detect
    memorized boilerplate; a held-out perplexity can. Unseen contexts
    and OOV words hit the uniform 1/(V+1) floor exactly — the
    implicit <unk> class.

    Determinism: the split is the registry's md5-hash convention
    (conv/substr == '0x'||substr identity); every log-probability is
    one double from three exact integers (c2, c1, V), quantized to
    1e-9 BEFORE the per-language sum.

    100 TB shape: the LM tables (bigram types, contexts, vocab size)
    are sublinear in corpus size and broadcast; the held-out bigram
    stream never shuffles for scoring (map-side joins), and the
    per-language rollup is the only stream-keyed aggregate — the
    bigram_lm_score scaling story with the same top-K-prune caveat
    for a full 100 TB vocabulary."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.expr(
            "cast(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10 < 9"
        ).alias("is_train"),
    )
    bg = docs.select(
        "doc_id", "lang", "is_train",
        F.explode(
            F.expr(
                "transform(array(split(text, ' ')), ws -> "
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(2, size(ws)), i -> "
                "struct(ws[i-2] AS prev, ws[i-1] AS cur)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<prev: STRING, cur: STRING>>) END)[0]"
            )
        ).alias("p"),
    ).select(
        "doc_id", "lang", "is_train",
        F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"),
    )
    big = (
        bg.filter("is_train")
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    ctx = big.groupBy("prev").agg(F.sum("c2").cast("long").alias("c1"))
    voc = (
        docs.filter("is_train")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .agg(F.countDistinct("t").cast("long").alias("v"))
    )
    lp_nano = F.round(
        F.log(
            (F.coalesce("c2", F.lit(0)) + 1.0)
            / (F.coalesce("c1", F.lit(0)) + F.col("v") + 1)
        )
        * 1e9
    ).cast("long")
    sc = (
        bg.filter(~F.col("is_train"))
        .join(F.broadcast(big), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .crossJoin(F.broadcast(voc))
        .select("lang", "doc_id", lp_nano.alias("lp_nano"))
    )
    mean_lp = F.sum(F.col("lp_nano").cast(_DEC)).cast("double") / 1e9 / F.count(
        F.lit(1)
    )
    return sc.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(mean_lp, 6).alias("avg_logprob"),
        F.round(F.exp(-mean_lp), 6).alias("perplexity"),
    )

# --------------------------- Anderson-Darling k-sample (midrank form)
# Scholz-Stephens A2akN across the k event types — the tail-weighted
# omnibus companion to kruskal_wallis (location) and the two-sample
# lane: the 1/(B(N−B)) weight loads the DISTRIBUTION TAILS, where KW's
# linear ranks are flattest. Midrank tie handling on the ×2-carried
# integer device: 2B_j = 2H_j − h_j, 2M_ij = 2F_ij − f_ij over the
# DENSE (type × distinct-value) grid, numerator X = N·2M − n_i·2B and
# denominator D4 = 2B(2N−2B) − N·h_j both exact integers (the /4s
# cancel); each term quantizes to 1e-9 before the distributed sum.

_AD_ORACLE = f"""
WITH {_TYPE_CELLS_DUCK},
vals AS (
    SELECT vq, CAST(SUM(c) AS BIGINT) AS h,
           CAST(SUM(SUM(c)) OVER (ORDER BY vq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hh
    FROM cells GROUP BY vq
),
grp AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS ni FROM cells GROUP BY 1
),
tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS n FROM grp),
dense AS (
    SELECT g.event_type, g.ni, v.vq, v.h,
           2 * v.hh - v.h AS b2,
           2 * CAST(SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.event_type
                    ORDER BY v.vq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) - COALESCE(c.c, 0) AS m2
    FROM grp g CROSS JOIN vals v
    LEFT JOIN cells c ON c.event_type = g.event_type AND c.vq = v.vq
),
terms AS (
    SELECT event_type, ni,
           CAST(SUM(CAST(ROUND(
               CAST((t.n * CAST(m2 AS HUGEINT) - ni * CAST(b2 AS HUGEINT))
                    * (t.n * CAST(m2 AS HUGEINT) - ni * CAST(b2 AS HUGEINT))
                   AS DOUBLE)
               * h
               / NULLIF(CAST(b2 AS DOUBLE) * (2 * t.n - b2) - t.n * h, 0)
               / t.n / ni * 1e9) AS BIGINT)) AS HUGEINT) AS contrib_nano
    FROM dense, tot t
    GROUP BY 1, 2
)
SELECT t1.event_type, t1.ni AS n_group,
       ROUND(CAST(t1.contrib_nano AS DOUBLE) / 1e9, 6) AS ad_contrib,
       ROUND((CAST(t.n AS DOUBLE) - 1) / t.n
             * (SELECT SUM(CAST(contrib_nano AS DOUBLE) / 1e9) FROM terms),
             6) AS a2_akn
FROM terms t1, tot t
"""


@query("anderson_darling_ksample", oracle=_AD_ORACLE)
def anderson_darling_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANDERSON-DARLING k-SAMPLE test (Scholz-Stephens A2akN, midrank
    tie form — what scipy's anderson_ksamp computes) of value across
    event types: the ECDF-gap integral weighted by 1/(B(N−B)), which
    loads the distribution TAILS where kruskal_wallis's linear ranks
    and mood's median split are blindest — the k-sample member of the
    two-sample lane (ks/CvM/energy) this round completes.

    Determinism: the ×2-carried midrank device keeps every piece
    integer — 2B = 2H − h pooled, 2M = 2F − f per type over the DENSE
    type × value grid (absent cells still carry their cumulative
    mass, which a sparse groupBy would drop — the chi2_type_dow
    densification lesson); numerator and denominator integers cancel
    their /4s exactly; each (type, cell) term is one double quantized
    to 1e-9 before the per-type sum; NULLIF guards the
    single-distinct-value degenerate.

    100 TB shape: one bounded cell aggregate; the dense grid is
    k × |value domain| (~165k rows at any data size); two windows
    over bounded frames; no per-row rank anywhere."""
    cells = _type_cells(spark, sf_dir).localCheckpoint()  # bounded
    # (type, vq) frame: pooled cum, dense grid, and group sizes all
    # read it without replaying the fact scan
    winc = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0)
    vals = (
        cells.groupBy("vq")
        .agg(F.sum("c").cast("long").alias("h"))
        .withColumn("hh", F.sum("h").over(winc).cast("long"))
    )
    grp = cells.groupBy("event_type").agg(F.sum("c").cast("long").alias("ni"))
    tot = grp.agg(F.sum("ni").cast("long").alias("n"))
    wtyp = Window.partitionBy("event_type").orderBy("vq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dense = (
        grp.crossJoin(vals)
        .join(cells, ["event_type", "vq"], "left")
        .select(
            "event_type", "ni", "vq", "h",
            (2 * F.col("hh") - F.col("h")).alias("b2"),
            F.coalesce("c", F.lit(0)).alias("f"),
        )
        .withColumn(
            "m2",
            2 * F.sum("f").over(wtyp).cast("long") - F.col("f"),
        )
    )
    x = (
        F.col("n").cast(_DEC) * F.col("m2").cast(_DEC)
        - F.col("ni").cast(_DEC) * F.col("b2").cast(_DEC)
    )
    den4 = F.col("b2").cast("double") * (2 * F.col("n") - F.col("b2")) - F.col(
        "n"
    ) * F.col("h")
    t_nano = F.round(
        (x * x).cast("double")
        * F.col("h")
        / F.nullif(den4, F.lit(0.0))
        / F.col("n")
        / F.col("ni")
        * 1e9
    ).cast("long")
    terms = (
        dense.crossJoin(F.broadcast(tot))
        .groupBy("event_type", "ni")
        .agg(F.sum(t_nano.cast(_DEC)).alias("contrib_nano"))
        .localCheckpoint()  # k rows; read per-type AND for the total
    )
    total = terms.agg(
        F.sum(F.col("contrib_nano").cast("double") / 1e9).alias("csum")
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            F.col("ni").alias("n_group"),
            F.round(F.col("contrib_nano").cast("double") / 1e9, 6).alias(
                "ad_contrib"
            ),
            F.round(
                (F.col("n").cast("double") - 1) / F.col("n") * F.col("csum"), 6
            ).alias("a2_akn"),
        )
    )

# --------------------------------------------------------------------
# Ordered-alternative pair: Page's L (within-block) and
# Jonckheere-Terpstra (pooled) over the ORDERED day-part treatment
# night(0) -> morning(1) -> afternoon(2) -> evening(3). Friedman/KW
# are omnibus — they cannot say "values RISE through the day"; these
# two test exactly that monotone alternative, from the same exact
# integer rank/cell devices.

_DAYPART_DUCK = f"CAST(EXTRACT(hour FROM {DUCK_TS}) // 6 AS BIGINT)"

_PAGE_ORACLE = f"""
WITH k AS (SELECT CAST(4 AS BIGINT) AS k),
cells AS (
    SELECT date_trunc('day', {DUCK_TS}) AS day,
           {_DAYPART_DUCK} AS part,
           CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
full_blocks AS (
    SELECT day FROM cells, k GROUP BY day, k.k HAVING COUNT(*) = ANY_VALUE(k.k)
),
ranked AS (
    SELECT c.part,
           2 * RANK() OVER (PARTITION BY c.day ORDER BY c.mq)
             + CAST(COUNT(*) OVER (PARTITION BY c.day, c.mq) AS BIGINT) - 1
               AS r2
    FROM cells c JOIN full_blocks f ON c.day = f.day
),
sums AS (
    SELECT part, CAST(COUNT(*) AS BIGINT) AS b,
           CAST(SUM(CAST(r2 AS HUGEINT)) AS HUGEINT) AS r2sum
    FROM ranked GROUP BY 1
),
l AS (
    SELECT CAST(SUM((part + 1) * r2sum) AS HUGEINT) AS l2,
           MAX(b) AS b, CAST(COUNT(*) AS BIGINT) AS k
    FROM sums
)
SELECT b AS n_blocks, k,
       ROUND(CAST(l2 AS DOUBLE) / 2, 6) AS page_l,
       ROUND((CAST(l2 AS DOUBLE) / 2 - CAST(b AS DOUBLE) * k * (k + 1)
              * (k + 1) / 4)
             * 12 / (CAST(k AS DOUBLE) * (k + 1)
                     * SQRT(CAST(b AS DOUBLE) * (k - 1))), 6) AS page_z
FROM l
"""


@query("page_trend_test", oracle=_PAGE_ORACLE)
def page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE'S L TEST for an ordered alternative across day-parts
    (night -> morning -> afternoon -> evening): each complete calendar
    day ranks its four day-part mean values; L = Σ_j j·R_j loads
    monotone-increasing treatment effects that Friedman's omnibus Q
    dilutes across all permutations. The within-block companion to
    jonckheere_terpstra_dayparts.

    Determinism: the exact friedman rank device (1e-6 cell means,
    ×2-carried midranks, DECIMAL(38,0)/HUGEINT rank sums); L2 = 2L is
    an exact integer; the z uses the exact permutation moments
    E[L] = bk(k+1)²/4, Var[L] = bk²(k+1)²(k−1)/144 in one
    shared-verbatim double readout (midrank ties identical on both
    engines, documented like friedman's).

    100 TB shape: one (day × 4)-cell aggregate; rank windows over ≤ 4
    rows; 4-row algebra after."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            (F.hour("ts") / 6).cast("long").alias("part"),
        )
        .agg(
            F.round(
                F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"))
                / F.count(F.lit(1)).cast("double")
            ).cast("long").alias("mq")
        )
        .localCheckpoint()  # bounded (day x 4) frame: completeness
        # filter + rank join read it once
    )
    full = (
        cells.groupBy("day")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == 4)
        .select("day")
    )
    wday = Window.partitionBy("day").orderBy("mq")
    wtie = Window.partitionBy("day", "mq")
    ranked = cells.join(full, "day").select(
        "part",
        (
            2 * F.rank().over(wday)
            + F.count(F.lit(1)).over(wtie).cast("long") - 1
        ).alias("r2"),
    )
    sums = ranked.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.sum(F.col("r2").cast(_DEC)).alias("r2sum"),
    )
    l = sums.agg(
        F.sum((F.col("part") + 1).cast(_DEC) * F.col("r2sum")).alias("l2"),
        F.max("b").alias("b"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    bd, kd = F.col("b").cast("double"), F.col("k").cast("double")
    page_l = F.col("l2").cast("double") / 2
    return l.select(
        F.col("b").alias("n_blocks"),
        "k",
        F.round(page_l, 6).alias("page_l"),
        F.round(
            (page_l - bd * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1) / 4)
            * 12
            / (kd * (F.col("k") + 1) * F.sqrt(bd * (F.col("k") - 1))),
            6,
        ).alias("page_z"),
    )


_JT_ORACLE = f"""
WITH cells AS (
    SELECT {_DAYPART_DUCK} AS g, CAST(ROUND(value * 100) AS BIGINT) AS vq,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
vals AS (SELECT DISTINCT vq FROM cells),
grps AS (SELECT DISTINCT g FROM cells),
dense AS (
    SELECT gr.g, v.vq, COALESCE(c.c, 0) AS c,
           CAST(COALESCE(SUM(c.c) OVER (PARTITION BY gr.g ORDER BY v.vq
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS HUGEINT) AS plt
    FROM grps gr CROSS JOIN vals v
    LEFT JOIN cells c ON c.g = gr.g AND c.vq = v.vq
),
j2 AS (
    SELECT CAST(SUM(dj.c * (2 * di.plt + COALESCE(ci.c, 0))) AS HUGEINT) AS j2
    FROM dense di JOIN dense dj ON di.vq = dj.vq AND di.g < dj.g
    LEFT JOIN cells ci ON ci.g = di.g AND ci.vq = di.vq
),
sizes AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sn2,
           CAST(SUM(CAST(c AS HUGEINT) * c * (2 * c + 3)) AS HUGEINT) AS sn23
    FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS c FROM cells GROUP BY 1)
)
SELECT s.n AS n_rows,
       ROUND(CAST(j.j2 AS DOUBLE) / 2, 6) AS jt_stat,
       ROUND((CAST(s.n AS DOUBLE) * s.n - CAST(s.sn2 AS DOUBLE)) / 4, 6)
           AS jt_expected,
       ROUND((CAST(j.j2 AS DOUBLE) / 2
              - (CAST(s.n AS DOUBLE) * s.n - CAST(s.sn2 AS DOUBLE)) / 4)
             / SQRT((CAST(s.n AS DOUBLE) * s.n * (2 * s.n + 3)
                     - CAST(s.sn23 AS DOUBLE)) / 72), 6) AS jt_z
FROM j2 j, sizes s
"""


@query("jonckheere_terpstra_dayparts", oracle=_JT_ORACLE)
def jonckheere_terpstra_dayparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JONCKHEERE-TERPSTRA test for a monotone value trend across the
    ORDERED day-parts (night < morning < afternoon < evening):
    J = Σ_{{i<j}} U_ij over ordered group pairs, each U counting
    cross-pairs where the later day-part's value is larger (ties
    half-weighted). The pooled companion to page_trend_test, and the
    ordered-alternative upgrade of kruskal_wallis (which squanders
    power on non-monotone permutations).

    Determinism: J2 = 2J is an exact integer off the DENSE
    (group × value-cell) grid — per cell, group j's count times
    (2·strictly-below-count_i + ties_i); expectation and the no-tie
    normal variance [n²(2n+3) − Σn_i²(2n_i+3)]/72 are one
    shared-verbatim readout (tie share at the 2-dp lattice is
    identical on both engines, documented).

    100 TB shape: one bounded cell aggregate, per-group cumulative
    windows over the dense 4 × |value domain| grid, a 6-pair join of
    bounded frames. Nothing scales with rows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = (
        ev.groupBy(
            (F.hour("ts") / 6).cast("long").alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("vq"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # bounded; dense grid + sizes read it
    )
    vals = cells.select("vq").distinct()
    grps = cells.select("g").distinct()
    wg = Window.partitionBy("g").orderBy("vq").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dense = (
        grps.crossJoin(vals)
        .join(cells, ["g", "vq"], "left")
        .select(
            "g", "vq",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .withColumn(
            "plt", F.coalesce(F.sum("c").over(wg), F.lit(0)).cast(_DEC)
        )
    )
    di = dense.select(
        F.col("g").alias("gi"), F.col("vq"),
        F.col("c").alias("ci"), F.col("plt"),
    )
    dj = dense.select(
        F.col("g").alias("gj"), F.col("vq").alias("vqj"),
        F.col("c").alias("cj"),
    )
    j2 = (
        di.join(
            F.broadcast(dj),
            (F.col("vq") == F.col("vqj")) & (F.col("gi") < F.col("gj")),
        )
        .agg(
            F.sum(
                F.col("cj").cast(_DEC) * (2 * F.col("plt") + F.col("ci"))
            ).alias("j2")
        )
    )
    sizes = (
        cells.groupBy("g")
        .agg(F.sum("c").cast("long").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c").cast(_DEC) * F.col("c")).alias("sn2"),
            F.sum(
                F.col("c").cast(_DEC) * F.col("c") * (2 * F.col("c") + 3)
            ).alias("sn23"),
        )
    )
    nd = F.col("n").cast("double")
    jt = F.col("j2").cast("double") / 2
    exp_j = (nd * F.col("n") - F.col("sn2").cast("double")) / 4
    var_j = (
        nd * F.col("n") * (2 * F.col("n") + 3) - F.col("sn23").cast("double")
    ) / 72
    return j2.crossJoin(F.broadcast(sizes)).select(
        F.col("n").alias("n_rows"),
        F.round(jt, 6).alias("jt_stat"),
        F.round(exp_j, 6).alias("jt_expected"),
        F.round((jt - exp_j) / F.sqrt(var_j), 6).alias("jt_z"),
    )

# ------------------------------------------- Spectral entropy (hourly)
# How CONCENTRATED is the hourly series' power spectrum? Normalized
# Shannon entropy of the periodogram — near 1 = white noise, near 0 =
# one dominant cycle. The scalar summary beside fisher_g_periodicity's
# formal max-share test, over the SAME exact-integer periodogram.

_SPECENT_ORACLE = f"""
WITH series AS (
    SELECT ROW_NUMBER() OVER (ORDER BY bucket) - 1 AS idx,
           CAST(svq AS DOUBLE) / cnt / 1e6 AS y
    FROM (
        SELECT date_trunc('hour', {DUCK_TS}) AS bucket,
               CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS svq,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    )
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) / COUNT(*) AS ybar
    FROM series
),
freqs AS (
    SELECT unnest(generate_series(1, CAST((n - 1) // 2 AS INTEGER))) AS j, n
    FROM tot WHERE n >= 3
),
terms AS (
    SELECT f.j,
           CAST(SUM(CAST(ROUND((s.y - t.ybar)
                * cos(2 * pi() * f.j * s.idx / f.n) * 1e9) AS BIGINT))
               AS HUGEINT) AS aq,
           CAST(SUM(CAST(ROUND((s.y - t.ybar)
                * sin(2 * pi() * f.j * s.idx / f.n) * 1e9) AS BIGINT))
               AS HUGEINT) AS bq
    FROM freqs f JOIN series s ON TRUE, tot t
    GROUP BY 1
),
pgram AS (
    SELECT j,
           CAST(aq AS DOUBLE) * CAST(aq AS DOUBLE)
             + CAST(bq AS DOUBLE) * CAST(bq AS DOUBLE) AS i_j
    FROM terms
),
s AS (SELECT SUM(i_j) AS si, CAST(COUNT(*) AS BIGINT) AS m,
             MAX(i_j) AS imax
      FROM pgram),
ent AS (
    SELECT CAST(SUM(CAST(ROUND(CASE WHEN p.i_j > 0
               THEN -(p.i_j / s.si) * LN(p.i_j / s.si) ELSE 0 END * 1e12)
               AS BIGINT)) AS HUGEINT) AS e_pico
    FROM pgram p, s
)
SELECT s.m AS n_freqs,
       ROUND(CAST(e.e_pico AS DOUBLE) / 1e12, 6) AS spectral_entropy,
       ROUND(CAST(e.e_pico AS DOUBLE) / 1e12 / LN(CAST(s.m AS DOUBLE)), 6)
           AS spectral_entropy_norm,
       ROUND(s.imax / s.si, 6) AS peak_share
FROM s, ent e
"""


@query("spectral_entropy_hourly", oracle=_SPECENT_ORACLE)
def spectral_entropy_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL ENTROPY of the hourly mean-value series: normalized
    Shannon entropy of the periodogram across all Fourier frequencies
    — the scalar regularity summary (≈1 white noise, →0 one dominant
    cycle) beside fisher_g_periodicity's formal max-share test.
    peak_share cross-references Fisher's g on the SAME spectrum.

    Determinism: the identical exact periodogram construction as
    fisher_g (1e-9-quantized per-term cos/sin products, integer a/b
    sums); each −p·ln p entropy term quantizes to 1e-12 before the
    distributed sum; the n≥3 degenerate-span guard matches fisher's.

    100 TB shape: identical to fisher_g — one bounded hourly
    aggregate, a time-bounded term frame, per-frequency rollups."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)")).alias("svq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    series = hourly.select(
        (F.row_number().over(Window.orderBy("bucket")) - 1).alias("idx"),
        (F.col("svq").cast("double") / F.col("cnt") / 1e6).alias("y"),
    ).localCheckpoint()
    tot = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("y") / F.count(F.lit(1))).alias("ybar"),
    )
    freqs = tot.filter(F.col("n") >= 3).select(
        F.explode(F.sequence(F.lit(1), ((F.col("n") - 1) / 2).cast("int")))
        .alias("j"),
        "n",
    )
    terms = (
        freqs.join(series)
        .crossJoin(F.broadcast(tot.select("ybar")))
        .select(
            "j",
            F.expr(
                "CAST(ROUND((y - ybar) * cos(2 * pi() * j * idx / n) * 1e9)"
                " AS BIGINT)"
            ).alias("ca"),
            F.expr(
                "CAST(ROUND((y - ybar) * sin(2 * pi() * j * idx / n) * 1e9)"
                " AS BIGINT)"
            ).alias("cb"),
        )
        .groupBy("j")
        .agg(
            F.sum(F.col("ca").cast(_DEC)).alias("aq"),
            F.sum(F.col("cb").cast(_DEC)).alias("bq"),
        )
    )
    pgram = terms.select(
        (
            F.col("aq").cast("double") * F.col("aq").cast("double")
            + F.col("bq").cast("double") * F.col("bq").cast("double")
        ).alias("i_j")
    ).localCheckpoint()  # frequency-bounded; totals + entropy read it
    s = pgram.agg(
        F.sum("i_j").alias("si"),
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("i_j").alias("imax"),
    )
    p = F.col("i_j") / F.col("si")
    ent = pgram.crossJoin(F.broadcast(s)).agg(
        F.sum(
            F.round(
                F.when(F.col("i_j") > 0, -p * F.log(p)).otherwise(0.0) * 1e12
            ).cast("long").cast(_DEC)
        ).alias("e_pico")
    )
    return s.crossJoin(F.broadcast(ent)).select(
        F.col("m").alias("n_freqs"),
        F.round(F.col("e_pico").cast("double") / 1e12, 6).alias(
            "spectral_entropy"
        ),
        F.round(
            F.col("e_pico").cast("double") / 1e12
            / F.log(F.col("m").cast("double")),
            6,
        ).alias("spectral_entropy_norm"),
        F.round(F.col("imax") / F.col("si"), 6).alias("peak_share"),
    )


# ------------------------------------------ Rayleigh circular test
# Event TIMES as angles on the 24 h circle: mean resultant length R
# and the Rayleigh z = nR² test for non-uniformity — the circular-
# statistics lane (hour_of_day_profile shows the histogram; this is
# the TEST that the clock pattern is real, with sub-second phase
# resolution a binned chi2 throws away).

_RAYLEIGH_ORACLE = f"""
WITH a AS (
    SELECT 2 * pi() * (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
               / 86400000000.0 AS theta
    FROM events
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(cos(theta) * 1e9) AS BIGINT)) AS HUGEINT)
               AS cq,
           CAST(SUM(CAST(ROUND(sin(theta) * 1e9) AS BIGINT)) AS HUGEINT)
               AS sq
    FROM a
)
SELECT n AS n_events,
       ROUND(CAST(cq AS DOUBLE) / 1e9 / n, 6) AS mean_cos,
       ROUND(CAST(sq AS DOUBLE) / 1e9 / n, 6) AS mean_sin,
       ROUND(SQRT(CAST(cq AS DOUBLE) * cq + CAST(sq AS DOUBLE) * sq)
             / 1e9 / n, 6) AS resultant_r,
       ROUND((CAST(cq AS DOUBLE) * cq + CAST(sq AS DOUBLE) * sq)
             / 1e18 / n, 6) AS rayleigh_z
FROM s
"""


@query("rayleigh_event_times", oracle=_RAYLEIGH_ORACLE)
def rayleigh_event_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAYLEIGH TEST of event-time uniformity on the 24-hour circle:
    each event's time-of-day becomes an angle θ; the mean resultant
    length R = |Σe^{{iθ}}|/n and z = nR² test whether activity
    clusters around a preferred clock time — the circular-statistics
    lane the registry lacked (hour_of_day_profile bins a histogram;
    this keeps microsecond phase and gives a test statistic;
    fisher_g_periodicity finds cycles ACROSS days, this finds the
    phase concentration WITHIN the day).

    Determinism: per-event cos θ / sin θ quantize to 1e-9 BIGINT on
    the map side (the acf convention), so both component sums are
    exact integers and R/z are shared-verbatim readouts of two
    integers.

    100 TB shape: ONE map-side-combined aggregate — two quantized
    trig sums and a count; the theoretical minimum shuffle (a few
    bytes per partition)."""
    ev = load_table(spark, sf_dir, "events")
    theta = (
        2 * F.lit(math.pi)
        * (F.unix_micros("ts") % 86400000000)
        / F.lit(86400000000.0)
    )
    s = ev.select(
        F.round(F.cos(theta) * 1e9).cast("long").alias("cn"),
        F.round(F.sin(theta) * 1e9).cast("long").alias("sn"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cn").cast(_DEC)).alias("cq"),
        F.sum(F.col("sn").cast(_DEC)).alias("sq"),
    )
    cd, sd = F.col("cq").cast("double"), F.col("sq").cast("double")
    nd = F.col("n")
    return s.select(
        F.col("n").alias("n_events"),
        F.round(cd / 1e9 / nd, 6).alias("mean_cos"),
        F.round(sd / 1e9 / nd, 6).alias("mean_sin"),
        F.round(F.sqrt(cd * F.col("cq") + sd * F.col("sq")) / 1e9 / nd, 6)
        .alias("resultant_r"),
        F.round((cd * F.col("cq") + sd * F.col("sq")) / 1e18 / nd, 6)
        .alias("rayleigh_z"),
    )

# ---------------------------------------------- Regression diagnostics
# The checks sensor_drift / ridge_normal_equations assume away:
# Breusch-Pagan (is the error variance constant over time?) and
# Cook's distance (which single readings steer the fit?). Both run on
# the GLOBAL value ~ hours-since-start OLS from exact integer moments;
# residual-derived quantities quantize before any distributed sum.

_OLS_BASE_DUCK = f"""
base AS (
    SELECT event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS y,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                - (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                   FROM events) AS BIGINT) AS x,
           value
    FROM events WHERE value IS NOT NULL
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
               AS HUGEINT) AS a,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS sxy_c
    FROM base
)
"""

# slope/intercept as shared-verbatim doubles of exact integers
_OLS_B = "(CAST(sxy_c AS DOUBLE) / CAST(a AS DOUBLE))"
_OLS_A = f"((CAST(sy AS DOUBLE) - {_OLS_B} * CAST(sx AS DOUBLE)) / n)"
_OLS_E = f"(y - {_OLS_A} - {_OLS_B} * x)"  # residual, centi units

_BP_BASE_DUCK = """
base AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS y,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT) AS x
    FROM events WHERE value IS NOT NULL
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
               AS HUGEINT) AS a,
           CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT))
               AS HUGEINT) AS sxy_c
    FROM base
)
"""

_BP_ORACLE = f"""
WITH {_BP_BASE_DUCK},
aux AS (
    SELECT m.n, m.a,
           CAST(SUM(CAST(ROUND({_OLS_E} * {_OLS_E} * 1e3) AS BIGINT))
               AS HUGEINT) AS sz,
           CAST(SUM(CAST(x AS HUGEINT)
                    * CAST(ROUND({_OLS_E} * {_OLS_E} * 1e3) AS BIGINT))
               AS HUGEINT) AS sxz,
           CAST(SUM(CAST(CAST(ROUND({_OLS_E} * {_OLS_E} * 1e3) AS BIGINT)
                         AS HUGEINT)
                    * CAST(ROUND({_OLS_E} * {_OLS_E} * 1e3) AS BIGINT))
               AS HUGEINT) AS szz
    FROM base, mom m
    GROUP BY 1, 2
)
SELECT n AS n_rows,
       ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST((SELECT sx FROM mom) AS DOUBLE) * CAST(sz AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                - CAST((SELECT sx FROM mom) AS DOUBLE) * CAST(sz AS DOUBLE))
             / (CAST(a AS DOUBLE)
                * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                   - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
             * n, 6) AS bp_lm
FROM aux
"""


@query("breusch_pagan_lm", oracle=_BP_ORACLE)
def breusch_pagan_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BREUSCH-PAGAN LM test for heteroscedasticity of the global
    value ~ hours-since-start regression: LM = n·R² of the auxiliary
    regression of squared residuals on time. A large LM says error
    variance drifts over the observation window — the assumption
    audit behind every OLS consumer in the registry (sensor_drift,
    regr_value_trend, ridge), and the reason to prefer the robust
    lanes when it fires.

    Determinism: slope/intercept are shared-verbatim doubles of exact
    integer moments (the integer-subtracted a = nΣx²−(Σx)² form);
    each squared residual quantizes to milli units (exact BIGINT)
    BEFORE the auxiliary moment sums, so R²'s inputs are exact
    integers and LM is one shared-verbatim readout.

    100 TB shape: two map-side-combined aggregates over the fact (one
    for moments, one for the auxiliary moments with the 1-row moment
    frame broadcast) — no shuffle wider than a scalar row."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # raw epoch hours: the LM statistic is shift-invariant and every
    # ingredient is an integer-subtracted central form, so no
    # min-subtraction pass is needed (2 fact scans total)
    base = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.expr("unix_micros(ts) div 3600000000").alias("x"),
    )
    xd, yd = F.col("x").cast(_DEC), F.col("y").cast(_DEC)
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        (F.count(F.lit(1)) * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).alias("a"),
        (F.count(F.lit(1)) * F.sum(xd * yd) - F.sum(xd) * F.sum(yd)).alias(
            "sxy_c"
        ),
    )
    zq = F.expr(f"CAST(ROUND({_OLS_E} * {_OLS_E} * 1e3) AS BIGINT)")
    aux = (
        base.crossJoin(F.broadcast(mom))
        .groupBy("n", "a", "sx")
        .agg(
            F.sum(zq.cast(_DEC)).alias("sz"),
            F.sum(xd * zq.cast(_DEC)).alias("sxz"),
            F.sum(zq.cast(_DEC) * zq.cast(_DEC)).alias("szz"),
        )
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxz").cast("double") - F.col("sx").cast("double") * F.col(
        "sz"
    ).cast("double")
    den = F.col("a").cast("double") * (
        nd * F.col("szz").cast("double")
        - F.col("sz").cast("double") * F.col("sz").cast("double")
    )
    return aux.select(
        F.col("n").alias("n_rows"),
        F.round(num * num / den * F.col("n"), 6).alias("bp_lm"),
    )


COOKS_TOP = 25

_COOKS_ORACLE = f"""
WITH {_OLS_BASE_DUCK},
res AS (
    SELECT base.event_id, base.value, base.x, m.n, m.a,
           {_OLS_E} AS e,
           CAST(m.n * base.x - m.sx AS HUGEINT) AS u
    FROM base, mom m
),
mse AS (
    SELECT SUM(e * e) / (ANY_VALUE(n) - 2) AS mse FROM res
),
scored AS (
    SELECT event_id, value, x,
           1.0 / n + CAST(u AS DOUBLE) * CAST(u AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(a AS DOUBLE)) AS h,
           e
    FROM res
)
SELECT event_id, value, x AS hours_since_start,
       ROUND(h, 6) AS leverage,
       ROUND(e * e * h / (2 * m.mse * (1 - h) * (1 - h)), 6) AS cooks_d
FROM scored, mse m
ORDER BY CAST(ROUND(e * e * h / (2 * m.mse * (1 - h) * (1 - h)) * 1e9)
              AS BIGINT) DESC, event_id
LIMIT {COOKS_TOP}
"""


@query("cooks_distance_topk", oracle=_COOKS_ORACLE)
def cooks_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{COOKS_TOP} COOK'S DISTANCE influence points of the global
    value ~ hours-since-start OLS — which single readings most steer
    the fitted line (D = e²h/(p·MSE·(1−h)²), p=2). The influence
    companion to mahalanobis_outlier_topk: Mahalanobis flags points
    far from the CLOUD, Cook's flags points that bend the MODEL —
    high-leverage endpoints with modest residuals outrank mid-span
    spikes.

    Determinism: leverage h = 1/n + u²/(n·a) with u = n·x − Σx exact
    integer and a the integer-subtracted Σx² form; residuals are
    shared-verbatim doubles of exact moments; the top-k ORDER is the
    1e-9-quantized BIGINT of D with an event_id tiebreak (MSE is a
    5-term… n-term double sum — identical inputs both engines, and
    the quantized rank key absorbs last-ulp noise).

    100 TB shape: one moment aggregate + one MSE aggregate, each
    map-side; the scoring pass is a projection under
    TakeOrderedAndProject. Same two-scan envelope as mahalanobis."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hours = F.expr("unix_micros(ts) div 3600000000")
    base = ev.select(
        "event_id", "value",
        F.round(F.col("value") * 100).cast("long").alias("y"),
        hours.alias("h"),
    )
    h0 = base.agg(F.min("h").alias("h0"))
    base = base.crossJoin(F.broadcast(h0)).select(
        "event_id", "value", "y", (F.col("h") - F.col("h0")).alias("x")
    ).localCheckpoint()  # scored twice (MSE + ranking): one fact scan
    xd, yd = F.col("x").cast(_DEC), F.col("y").cast(_DEC)
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        (F.count(F.lit(1)) * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).alias("a"),
        (F.count(F.lit(1)) * F.sum(xd * yd) - F.sum(xd) * F.sum(yd)).alias(
            "sxy_c"
        ),
    )
    res = base.crossJoin(F.broadcast(mom)).select(
        "event_id", "value", "x", "n", "a",
        F.expr(_OLS_E).alias("e"),
        (F.col("n").cast(_DEC) * F.col("x") - F.col("sx")).alias("u"),
    )
    mse = res.agg(
        (F.sum(F.col("e") * F.col("e")) / (F.any_value("n") - 2)).alias("mse")
    )
    h = 1.0 / F.col("n") + F.col("u").cast("double") * F.col("u").cast(
        "double"
    ) / (F.col("n").cast("double") * F.col("a").cast("double"))
    d = F.col("e") * F.col("e") * h / (
        2 * F.col("mse") * (1 - h) * (1 - h)
    )
    return (
        res.crossJoin(F.broadcast(mse))
        .select(
            "event_id", "value",
            F.col("x").alias("hours_since_start"),
            F.round(h, 6).alias("leverage"),
            F.round(d, 6).alias("cooks_d"),
            F.round(d * 1e9).cast("long").alias("_rank_key"),
        )
        .orderBy(F.col("_rank_key").desc(), "event_id")
        .limit(COOKS_TOP)
        .drop("_rank_key")
    )

# ------------------------------------- RBO retriever rank agreement
# Do the dense (cosine) and lexical (BM25) retrievers AGREE? Rank-
# Biased Overlap at p=0.9 over their top-K lists per query — the
# retrieval-eval the judged-metrics lane (ndcg/mrr/rbp/err grade
# each retriever vs labels) cannot answer: two retrievers can score
# identically on labels while returning disjoint tails. Low RBO =
# fusion (rrf_hybrid_retrieval) has headroom; RBO ~ 1 = the second
# retriever is redundant.

RBO_P = 0.9
RBO_K = 20
# (1-p) p^(d-1) discounts precomputed HERE and embedded as literals in
# BOTH engines' SQL — repr() round-trips the exact double, so neither
# engine evaluates POWER (the libm-pow divergence class).
_RBO_W = {d: (1 - RBO_P) * RBO_P ** (d - 1) for d in range(1, RBO_K + 1)}
_RBO_W_SQL = ", ".join(f"({d}, {w!r})" for d, w in _RBO_W.items())

# the lexical ranker IS bm25_retrieval's scorer — one shared term text
from iot_etl_spark.plans.queries_text import _BM25_TERM_SQL as _BM25_TERM  # noqa: E402

_RBO_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM v
      WHERE vec_id IN (0, 7, 42)),
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
    ) WHERE rnk <= {RBO_K}
),
tok AS (
    SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        FROM documents
    ) WHERE tok <> ''
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
dfx AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
qt AS (SELECT DISTINCT doc_id AS qid, tok FROM tf WHERE doc_id IN (0, 7, 42)),
terms AS (
    SELECT qt.qid, t.doc_id,
           CAST(ROUND(({_BM25_TERM}) * 1e9) AS BIGINT) AS nano
    FROM qt
    JOIN tf t ON t.tok = qt.tok AND t.doc_id <> qt.qid
    JOIN dfx ON dfx.tok = qt.tok
    JOIN dl ON dl.doc_id = t.doc_id, st
),
lex AS (
    SELECT qid, doc_id AS id, rnk AS lr FROM (
        SELECT qid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY SUM(nano) DESC, doc_id) AS rnk
        FROM terms GROUP BY qid, doc_id
    ) WHERE rnk <= {RBO_K}
),
matched AS (
    SELECT d.qid, GREATEST(d.dr, l.lr) AS m
    FROM dense d JOIN lex l ON d.qid = l.qid AND d.id = l.id
),
w AS (SELECT * FROM (VALUES {_RBO_W_SQL}) AS t(d, wt)),
xd AS (
    SELECT q.qid, w.d, w.wt,
           CAST(COUNT(m.m) AS BIGINT) AS x
    FROM (SELECT DISTINCT qid FROM dense) q
    CROSS JOIN w
    LEFT JOIN matched m ON m.qid = q.qid AND m.m <= w.d
    GROUP BY 1, 2, 3
)
SELECT qid AS query_id,
       CAST(MAX(CASE WHEN d = 10 THEN x END) AS BIGINT) AS overlap_at_10,
       CAST(MAX(CASE WHEN d = {RBO_K} THEN x END) AS BIGINT)
           AS overlap_at_{RBO_K},
       ROUND(CAST(SUM(CAST(ROUND(wt * x / d * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12, 6) AS rbo_min
FROM xd GROUP BY 1
"""


@query("rbo_rank_agreement", oracle=_RBO_ORACLE)
def rbo_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber et al.) between the dense cosine
    retriever and the BM25 lexical retriever, per query: rbo_min =
    Σ_d (1−p)p^(d−1)·|A_d ∩ B_d|/d over the top-{RBO_K} prefixes at
    p={RBO_P} (the truncated lower bound), plus raw prefix overlaps.
    The retriever-AGREEMENT eval the judged metrics can't express —
    two retrievers with equal NDCG can be disjoint below the head,
    which is exactly when RRF fusion pays.

    Determinism: both rankings order INTEGERS (rounded cosine /
    BM25's nano-quantized sum — the pagerank fixed-point device); the
    RBO discounts are precomputed in Python and embedded as repr'd
    literals in BOTH engines' plans, so libm POWER never runs; each
    depth term quantizes to 1e-12 before the per-query sum.

    100 TB shape: reuses the two retrievers' shapes verbatim (dense:
    3-query broadcast against the embedding scan; lexical: one
    postings shuffle with the query-term side broadcast); agreement
    math runs on 3 × {RBO_K} rank rows crossed with {RBO_K} weights.
    Reference parity: none — retrieval-eval extension."""
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = v.filter(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    dot = F.aggregate(
        F.zip_with("emb", "qemb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    wdense = Window.partitionBy("qid").orderBy(
        F.col("cos6").desc(), F.col("vec_id")
    )
    # r14 (guide §1.2): dense is referenced twice (overlap join + the
    # per-query grid) and its lineage is the full embeddings cosine
    # cross-join — localCheckpoint the <= 3 x RBO_K rank rows so the
    # second reference is lineage-free. The lexical side keeps the
    # lazy tokenize (a shared postings stage re-measured SLOWER at
    # bench scale — see queries_text._bm25_tf).
    dense = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(dot / (nrm(F.col("emb")) * nrm(F.col("qemb"))), 6)
            .alias("cos6"),
        )
        .withColumn("dr", F.row_number().over(wdense))
        .filter(F.col("dr") <= RBO_K)
        .select("qid", F.col("vec_id").alias("id"), "dr")
        .localCheckpoint()
    )
    from iot_etl_spark.plans.queries_text import _bm25_tf

    tf = _bm25_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    dfx = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = (
        tf.filter(F.col("doc_id").isin(0, 7, 42))
        .select(F.col("doc_id").alias("qid"), "tok")
        .distinct()
    )
    qdf = dfx.join(F.broadcast(qt.select("tok").distinct()), "tok")
    wlex = Window.partitionBy("qid").orderBy(F.col("nano").desc(), "doc_id")
    lex = (
        tf.join(F.broadcast(qt), "tok")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(F.broadcast(qdf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select(
            "qid", "doc_id",
            F.round(F.expr(_BM25_TERM) * F.lit(1e9)).cast("long")
            .alias("nano"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("nano").cast("long").alias("nano"))
        .withColumn("lr", F.row_number().over(wlex))
        .filter(F.col("lr") <= RBO_K)
        .select("qid", F.col("doc_id").alias("id"), "lr")
    )
    matched = dense.join(F.broadcast(lex), ["qid", "id"]).select(
        F.col("qid").alias("mqid"), F.greatest("dr", "lr").alias("m")
    )
    w = spark.createDataFrame(
        [(d, wt) for d, wt in _RBO_W.items()],
        T.StructType(
            [T.StructField("d", T.IntegerType()),
             T.StructField("wt", T.DoubleType())]
        ),
    )
    qids = dense.select("qid").distinct()
    # matched's key is RENAMED before the join: both frames descend
    # from `dense`, so a same-name join condition self-resolves to one
    # attribute (trivially true) and a drop() can remove the wrong
    # column — the self-join ambiguity trap, hit live here.
    xd = (
        qids.crossJoin(F.broadcast(w))
        .join(
            F.broadcast(matched),
            (F.col("mqid") == F.col("qid")) & (F.col("m") <= F.col("d")),
            "left",
        )
        .groupBy("qid", "d", "wt")
        .agg(F.count("m").cast("long").alias("x"))
    )
    return xd.groupBy("qid").agg(
        F.max(F.when(F.col("d") == 10, F.col("x"))).cast("long")
        .alias("overlap_at_10"),
        F.max(F.when(F.col("d") == RBO_K, F.col("x"))).cast("long")
        .alias(f"overlap_at_{RBO_K}"),
        F.round(
            F.sum(
                F.round(F.col("wt") * F.col("x") / F.col("d") * 1e12)
                .cast("long").cast(_DEC)
            ).cast("double")
            / 1e12,
            6,
        ).alias("rbo_min"),
    ).withColumnRenamed("qid", "query_id")

# -------------------------------------------------- Pettitt changepoint
# Nonparametric single-changepoint test on the daily event-count
# series: U_t = Σ_{i<=t} Σ_{j>t} sgn(y_j − y_i), K = max|U_t| — the
# rank-based member of the changepoint family (binseg fits means,
# CUSUM/Page-Hinkley track drifts, Chow assumes a known split; Pettitt
# finds an UNKNOWN split with no distributional assumption).

_PETTITT_ORACLE = f"""
WITH daily AS (
    SELECT epoch_us(date_trunc('day', {DUCK_TS})) // 1000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1
),
n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
pairs AS (
    SELECT a.day AS di, b.day AS dj,
           CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS s
    FROM daily a JOIN daily b ON b.day > a.day
),
u AS (
    SELECT t.day AS t,
           CAST(SUM(CASE WHEN p.di <= t.day AND p.dj > t.day
                         THEN p.s ELSE 0 END) AS BIGINT) AS u_t
    FROM (SELECT day FROM daily) t, pairs p
    GROUP BY 1
),
k AS (
    SELECT t AS change_day, ABS(u_t) AS k_stat, u_t
    FROM u ORDER BY ABS(u_t) DESC, t LIMIT 1
)
SELECT n_.n AS n_days, k.change_day AS change_day_epoch,
       k.u_t AS u_at_change, k.k_stat,
       ROUND(2 * EXP(-6.0 * k.k_stat * k.k_stat
                     / (CAST(n_.n AS DOUBLE) * n_.n * n_.n
                        + CAST(n_.n AS DOUBLE) * n_.n)), 6) AS p_approx
FROM k, n_
"""


@query("pettitt_changepoint_daily", oracle=_PETTITT_ORACLE)
def pettitt_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PETTITT TEST for a single unknown changepoint in the daily
    event-count series — the nonparametric member of the changepoint
    family: binseg fits means, CUSUM/Page-Hinkley track sequential
    drift, chow_break_test assumes a KNOWN split; Pettitt locates an
    unknown split through rank statistics immune to outlier days.
    K = max_t |Σ_{{i≤t}}Σ_{{j>t}} sgn(y_j − y_i)|, with the standard
    2·exp(−6K²/(n³+n²)) significance approximation.

    Determinism: U_t sums are exact integers over the day-pair frame;
    the argmax breaks ties toward the earlier day; the only double is
    the final shared-verbatim p-approximation.

    100 TB shape: one map-side day aggregate (bounded by the span),
    then day² pair math (30 days → 435 pairs) — time-bounded,
    row-count-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            (F.unix_micros(F.date_trunc("day", F.col("ts"))) / 1_000_000)
            .cast("long").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint()  # span-bounded; pairs + t-grid + n read it
    )
    n_ = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = daily.select(F.col("day").alias("di"), F.col("y").alias("yi"))
    b = daily.select(F.col("day").alias("dj"), F.col("y").alias("yj"))
    pairs = a.join(F.broadcast(b), F.col("dj") > F.col("di")).select(
        "di", "dj",
        F.when(F.col("yj") > F.col("yi"), 1)
        .when(F.col("yj") < F.col("yi"), -1)
        .otherwise(0).alias("s"),
    )
    u = (
        daily.select(F.col("day").alias("t"))
        .join(F.broadcast(pairs))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(
                    (F.col("di") <= F.col("t")) & (F.col("dj") > F.col("t")),
                    F.col("s"),
                ).otherwise(0)
            ).cast("long").alias("u_t")
        )
    )
    k = (
        u.orderBy(F.abs(F.col("u_t")).desc(), "t")
        .limit(1)
        .select(
            F.col("t").alias("change_day"),
            F.abs(F.col("u_t")).cast("long").alias("k_stat"),
            F.col("u_t").alias("u_at_change"),
        )
    )
    nd = F.col("n").cast("double")
    return k.crossJoin(F.broadcast(n_)).select(
        F.col("n").alias("n_days"),
        F.col("change_day").alias("change_day_epoch"),
        "u_at_change",
        "k_stat",
        F.round(
            2 * F.exp(
                -6.0 * F.col("k_stat") * F.col("k_stat")
                / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
            ),
            6,
        ).alias("p_approx"),
    )


# --------------------------------------------- Seasonal Mann-Kendall
# Hirsch-Slack seasonal trend test: one Mann-Kendall S per hour-of-day
# season over that hour's DAILY mean-value sequence, then
# S = Σ S_s, Var = Σ Var_s (tie-corrected), z with continuity
# correction — the trend detector that a diurnal cycle cannot fool
# (plain mann_kendall_trend mixes 3 AM against 3 PM; this only ever
# compares an hour with the same hour on other days).

_SMK_ORACLE = f"""
WITH cells AS (
    SELECT EXTRACT(hour FROM {DUCK_TS}) AS season,
           date_trunc('day', {DUCK_TS}) AS day,
           CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT))
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
s_term AS (
    SELECT a.season,
           CAST(SUM(CASE WHEN b.mq > a.mq THEN 1
                         WHEN b.mq < a.mq THEN -1 ELSE 0 END) AS BIGINT) AS s
    FROM cells a JOIN cells b ON a.season = b.season AND b.day > a.day
    GROUP BY 1
),
v_term AS (
    SELECT season,
           CAST(COUNT(*) AS BIGINT) AS n,
           (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cells c2
                  WHERE c2.season = cells.season GROUP BY c2.mq)
            WHERE t > 1) AS tie_term
    FROM cells GROUP BY season
),
tot AS (
    SELECT CAST(SUM(s.s) AS BIGINT) AS s_total,
           SUM((CAST(v.n AS DOUBLE) * (v.n - 1) * (2 * v.n + 5)
                - v.tie_term) / 18) AS var_total,
           CAST(COUNT(*) AS BIGINT) AS n_seasons
    FROM s_term s JOIN v_term v USING (season)
)
SELECT n_seasons, s_total,
       ROUND(var_total, 6) AS var_total,
       ROUND((s_total - CASE WHEN s_total > 0 THEN 1
                             WHEN s_total < 0 THEN -1 ELSE 0 END)
             / SQRT(var_total), 6) AS z
FROM tot
"""


@query("seasonal_mann_kendall", oracle=_SMK_ORACLE)
def seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL MANN-KENDALL (Hirsch-Slack) trend test: a separate
    Mann-Kendall S per hour-of-day season over that hour's daily mean
    values, combined as S = ΣS_s with Var = ΣVar_s (tie-corrected per
    season) — the monotone-trend detector the diurnal cycle cannot
    fool, where plain mann_kendall_trend compares 3 AM readings
    against 3 PM ones and calls the cycle a trend.

    Determinism: season series live on the 1e-6 integer cell grid
    (the friedman mean convention); every S_s is an exact integer
    pair sum; tie terms are exact integers; the z (with continuity
    correction) is one shared-verbatim double.

    100 TB shape: one (hour, day) cell aggregate bounded by the span;
    per-season pair joins over ~30-row series (24 x 435 pairs);
    24-row combination after."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = (
        ev.groupBy(
            F.hour("ts").cast("long").alias("season"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"))
                / F.count(F.lit(1)).cast("double")
            ).cast("long").alias("mq")
        )
        .localCheckpoint()  # bounded (24 x days); pairs + ties read it
    )
    a = cells.select("season", F.col("day").alias("di"), F.col("mq").alias("mi"))
    b = cells.select(
        F.col("season").alias("s2"), F.col("day").alias("dj"),
        F.col("mq").alias("mj"),
    )
    s_term = (
        a.join(
            F.broadcast(b),
            (F.col("season") == F.col("s2")) & (F.col("dj") > F.col("di")),
        )
        .groupBy("season")
        .agg(
            F.sum(
                F.when(F.col("mj") > F.col("mi"), 1)
                .when(F.col("mj") < F.col("mi"), -1)
                .otherwise(0)
            ).cast("long").alias("s")
        )
    )
    ties = (
        cells.groupBy("season", "mq")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("season")
        .agg(
            F.sum(
                F.when(
                    F.col("t") > 1,
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5),
                ).otherwise(0)
            ).cast("long").alias("tie_term"),
            F.count(F.lit(1)).alias("_cells"),
        )
        .drop("_cells")
    )
    v_term = cells.groupBy("season").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).join(ties, "season")
    nd = F.col("n").cast("double")
    tot = (
        s_term.join(v_term, "season")
        .agg(
            F.sum("s").cast("long").alias("s_total"),
            F.sum(
                (nd * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term"))
                / 18
            ).alias("var_total"),
            F.count(F.lit(1)).cast("long").alias("n_seasons"),
        )
    )
    cc = F.when(F.col("s_total") > 0, 1).when(F.col("s_total") < 0, -1).otherwise(0)
    return tot.select(
        "n_seasons", "s_total",
        F.round(F.col("var_total"), 6).alias("var_total"),
        F.round(
            (F.col("s_total") - cc) / F.sqrt(F.col("var_total")), 6
        ).alias("z"),
    )

# ------------------------------------------- Bartels rank randomness
# Von Neumann's successive-difference ratio on RANKS of the daily
# event counts: RVN = Σ(r_t − r_{t+1})² / Σ(r_t − r̄)². The serial-
# correlation randomness test beside runs_test (which only sees
# above/below-median signs): RVN < 2 flags positive day-to-day
# persistence, > 2 flags alternation.

_BARTELS_ORACLE = f"""
WITH daily AS (
    SELECT epoch_us(date_trunc('day', {DUCK_TS})) // 1000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day,
           2 * RANK() OVER (ORDER BY y)
             + CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS r2
    FROM daily
),
seq AS (
    SELECT r2, LEAD(r2) OVER (ORDER BY day) AS r2n,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM ranked
),
agg AS (
    SELECT MAX(n) AS n,
           CAST(SUM(CASE WHEN r2n IS NULL THEN 0
                         ELSE (r2 - r2n) * (r2 - r2n) END) AS HUGEINT) AS n4,
           CAST(SUM((r2 - n - 1) * (r2 - n - 1)) AS HUGEINT) AS d4
    FROM seq
)
SELECT n AS n_days,
       ROUND(CAST(n4 AS DOUBLE) / CAST(d4 AS DOUBLE), 6) AS rvn,
       ROUND((CAST(n4 AS DOUBLE) / CAST(d4 AS DOUBLE) - 2)
             / SQRT(4.0 * (n - 2) * (5 * CAST(n AS DOUBLE) * n - 2 * n - 9)
                    / (5.0 * n * (n + 1) * (n - 1) * (n - 1))), 6) AS z
FROM agg
"""


@query("bartels_rank_randomness", oracle=_BARTELS_ORACLE)
def bartels_rank_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARTELS RANK TEST of randomness (the rank version of von
    Neumann's successive-difference ratio) on the daily event-count
    sequence: RVN = Σ(r_t − r_{{t+1}})²/Σ(r_t − r̄)² over midranks in
    DAY order. The serial-correlation companion to
    runs_test_randomness — runs only sees above/below-median signs,
    Bartels weighs HOW FAR consecutive days jump in rank (RVN < 2 =
    persistence, > 2 = alternation).

    Determinism: ×2-carried midranks make numerator and denominator
    EXACT integers (2r̄ = n+1 exactly, so deviations are integers);
    RVN and the large-sample z (Var = 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²))
    are shared-verbatim double readouts.

    100 TB shape: one span-bounded day aggregate; rank/lead windows
    over the ~30-row day frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.unix_micros(F.date_trunc("day", F.col("ts"))) / 1_000_000)
        .cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    wr = Window.orderBy("y")
    wt = Window.partitionBy("y")
    ranked = daily.select(
        "day",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt).cast("long") - 1
        ).alias("r2"),
    )
    wd = Window.orderBy("day")
    seq = ranked.select(
        "r2",
        F.lead("r2").over(wd).alias("r2n"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    agg = seq.groupBy().agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("r2n").isNull(), F.lit(0).cast("long")).otherwise(
                (F.col("r2") - F.col("r2n")) * (F.col("r2") - F.col("r2n"))
            ).cast(_DEC)
        ).alias("n4"),
        F.sum(
            ((F.col("r2") - F.col("n") - 1) * (F.col("r2") - F.col("n") - 1))
            .cast(_DEC)
        ).alias("d4"),
    )
    nd = F.col("n").cast("double")
    rvn = F.col("n4").cast("double") / F.col("d4").cast("double")
    var = (
        4.0 * (F.col("n") - 2) * (5 * nd * F.col("n") - 2 * F.col("n") - 9)
        / (5.0 * F.col("n") * (F.col("n") + 1) * (F.col("n") - 1) * (F.col("n") - 1))
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.round(rvn, 6).alias("rvn"),
        F.round((rvn - 2) / F.sqrt(var), 6).alias("z"),
    )

# ---------------------------------------- Link-prediction score panel
# The five classic common-neighbor link predictors for the SAME
# candidate pairs, side by side: CN, Jaccard, Adamic-Adar, Resource
# Allocation, Preferential Attachment. adamic_adar_linkpred ships one
# of them; ranking disagreements BETWEEN predictors is the actual
# model-selection signal (RA punishes hubs hardest, PA ignores
# common neighbors entirely).

LINKPRED_TOP = 25

from iot_etl_spark.plans.graphedges import (  # noqa: E402
    COACT_BUCKET_CAP, duck_capped_activity,
)

_LP_ORACLE = f"""
WITH a AS (
    SELECT b, user_id FROM {duck_capped_activity(
        "epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) // 1000000",
        COACT_BUCKET_CAP,
    )}
),
e AS (
    SELECT DISTINCT x.user_id AS ua, y.user_id AS ub
    FROM a x JOIN a y ON x.b = y.b AND x.user_id < y.user_id
),
n AS (
    SELECT ua AS z, ub AS x FROM e
    UNION ALL
    SELECT ub AS z, ua AS x FROM e
),
deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM n GROUP BY 1),
wedge AS (
    SELECT n1.x AS ua, n2.x AS ub, n1.z
    FROM n n1 JOIN n n2 ON n1.z = n2.z AND n1.x < n2.x
),
sc AS (
    SELECT w.ua, w.ub,
           CAST(COUNT(*) AS BIGINT) AS cn,
           SUM(1.0 / ln(deg.d)) AS aa,
           SUM(1.0 / deg.d) AS ra
    FROM wedge w JOIN deg ON deg.z = w.z
    GROUP BY 1, 2
),
cand AS (
    SELECT sc.*, da.d AS da, db.d AS db
    FROM sc
    LEFT JOIN e ON e.ua = sc.ua AND e.ub = sc.ub
    JOIN deg da ON da.z = sc.ua
    JOIN deg db ON db.z = sc.ub
    WHERE e.ua IS NULL
)
SELECT ua AS user_a, ub AS user_b, cn AS common_neighbors,
       ROUND(CAST(cn AS DOUBLE) / (da + db - cn), 6) AS jaccard,
       ROUND(aa, 6) AS adamic_adar,
       ROUND(ra, 6) AS resource_allocation,
       CAST(da * db AS BIGINT) AS pref_attachment
FROM cand
ORDER BY cn DESC, ua, ub
LIMIT {LINKPRED_TOP}
"""


@query("link_prediction_scores", oracle=_LP_ORACLE)
def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK-PREDICTION SCORE PANEL over the capped co-activity graph:
    the top {LINKPRED_TOP} non-adjacent pairs by common-neighbor
    count, scored by all five classic predictors at once — CN,
    Jaccard = CN/(d_a + d_b − CN), Adamic-Adar (Σ 1/ln d_z), Resource
    Allocation (Σ 1/d_z), Preferential Attachment (d_a·d_b). The
    model-selection view adamic_adar_linkpred alone can't give: where
    the five DISAGREE is exactly where hub structure matters (RA
    punishes hubs hardest, PA ignores common neighbors entirely).

    Determinism: ranked by the INTEGER common-neighbor count with
    (ua, ub) tiebreaks; AA/RA weights ride the wedge rows as
    ln/div of exact integer degrees (shared-verbatim); Jaccard and PA
    are pure integer-ratio readouts.

    100 TB shape: identical to adamic_adar_linkpred — the shared
    degree-attached edge stage, weights attached BEFORE the wedge
    expansion (both 1/ln d and 1/d ride 2|E| rows), one (a, b)
    aggregate, one anti-join, TakeOrderedAndProject; the pair-degree
    attach is a broadcast of the node-degree projection."""
    # r14 (VERDICT r13 item 4): the wedge expansion + (a, b) aggregate
    # is the SHARED materialized stage capped_wedge_scores (see
    # adamic_adar_linkpred) — this query is now TakeOrdered over the
    # pair-score table plus the 25-row degree attach.
    from iot_etl_spark.plans.graphedges import (
        capped_edges_with_degrees,
        capped_wedge_scores,
    )

    edeg = capped_edges_with_degrees(spark, sf_dir)
    sc = capped_wedge_scores(spark, sf_dir)
    # node degrees as a projection of the materialized stage
    nodes = (
        edeg.select(F.col("ua").alias("node"), F.col("da").alias("d"))
        .unionAll(edeg.select(F.col("ub").alias("node"), F.col("db").alias("d")))
        .distinct()
    )
    # rank by the INTEGER cn first, attach degrees to the 25 survivors
    # only — the degree joins never touch the full candidate set.
    # Broadcast DIRECTION (VERDICT r12 item 3): ship the 25-row head to
    # the executors scanning the |V|-row nodes side — never the other
    # way around; at 100x the node-degree table is the unbounded one.
    head = (
        sc.filter((F.col("adj") == 0) & (F.col("cn") >= 1))
        .select("ua", "ub", "cn", "aa", "ra")
        .orderBy(F.col("cn").desc(), "ua", "ub")
        .limit(LINKPRED_TOP)
    )
    return (
        F.broadcast(
            F.broadcast(head).join(
                nodes.select(F.col("node").alias("ua"), F.col("d").alias("da")),
                "ua",
            )
        )
        .join(
            nodes.select(F.col("node").alias("ub"), F.col("d").alias("db")),
            "ub",
        )
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            F.col("cn").alias("common_neighbors"),
            F.round(
                F.col("cn").cast("double") / (F.col("da") + F.col("db") - F.col("cn")),
                6,
            ).alias("jaccard"),
            F.round("aa", 6).alias("adamic_adar"),
            F.round("ra", 6).alias("resource_allocation"),
            (F.col("da").cast("long") * F.col("db")).cast("long")
            .alias("pref_attachment"),
        )
    )
