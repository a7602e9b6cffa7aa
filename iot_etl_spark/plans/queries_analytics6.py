"""Round-9 analytics batch: revenue concentration (Gini via
tie-group prefix sums), distribution-free per-device trend detection
(Kendall tau-b over daily means), and a corpus length-filter yield
curve (training-data mixing planner).

Reference parity: none of these exist in the reference (its analytics
surface is ~327 lines of TimescaleDB SQL, `analytical_queries.sql`);
they extend the engine along the established lanes — statistics
battery + LLM-pipeline planning — each with a DuckDB oracle and an
explicit 100 TB shape note.

Determinism: integer cents/micro-unit quantization before any sum;
cross-engine float constants are inlined as Python repr literals into
BOTH expression trees; every computed double is ROUND(x, 6); ordered
comparisons use cross-multiplied integers, never divided doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iot_etl_spark.plans.registry import query, duck_bucket_epoch
from iot_etl_spark.sources.tables import load_table

# ------------------------------------------------ Gini concentration
# Rank-weighted sum via TIE GROUPS: group customers by exact revenue
# r, then the sum of ascending ranks inside a tie group of size c
# that starts after `prev` smaller customers is c*prev + c*(c+1)/2 —
# so sum_i(i * x_i) needs only a cumulative count over DISTINCT
# revenue values, never a global per-row sort. The per-value frame is
# what bounds the window at scale (quantize cents -> whole units to
# cap the distinct-value count; exact at test data where values are
# already discrete cents).
_GINI_ORACLE = """
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS r
    FROM orders GROUP BY 1
),
g AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS c FROM rev GROUP BY 1),
w AS (
    SELECT r, c,
           CAST(COALESCE(SUM(c) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prev
    FROM g
),
agg AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS HUGEINT) * c) AS HUGEINT) AS s,
           CAST(SUM(CAST(r AS HUGEINT)
                    * (CAST(c AS HUGEINT) * prev
                       + CAST(c AS HUGEINT) * (c + 1) / 2)) AS HUGEINT)
               AS ranksum
    FROM w
)
SELECT n AS n_customers,
       CAST(s AS BIGINT) AS total_revenue_cents,
       ROUND((CAST(2.0 AS DOUBLE) * CAST(ranksum AS DOUBLE)
              - (CAST(n AS DOUBLE) + 1) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM agg
"""


@query("gini_customer_revenue", oracle=_GINI_ORACLE)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL Gini coefficient of per-customer order revenue — the
    whole-book concentration index next to nation_revenue_gini's
    per-nation panel (queries_audit.py). Deliberately a DIFFERENT
    algorithm than that sibling: the per-nation version rank-windows
    within each nation partition (fine — the partition bounds the
    sort); a global rank window would be a single-partition sort, so
    THIS query derives the rank-weighted sum from tie-group prefix
    sums over distinct revenue values instead — the sort-free
    formulation that survives an unpartitioned 100 TB input.

    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending
    ranks i. Ranks come from the tie-group identity (header comment),
    so there is NO global per-row sort: revenue cents are exact
    BIGINTs, rank-weighted sums are DECIMAL(38,0) (HUGEINT oracle —
    sum(i*x) grows as n^2 * x), and the only doubles are the final
    shared-verbatim readout.

    100 TB shape: one customer aggregate (bounded by |customers|),
    one distinct-value aggregate, a cumulative window over the
    bounded value cells, one scalar readout. Integer division c*(c+1)/2
    is exact (consecutive integers)."""
    dec = "decimal(38,0)"
    rev = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("long").alias("r"))
    )
    g = rev.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, -1)
    wd = g.select(
        "r",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("prev"),
    )
    agg = wd.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("r").cast(dec) * F.col("c").cast(dec)).alias("s"),
        F.sum(
            F.col("r").cast(dec)
            * (
                F.col("c").cast(dec) * F.col("prev").cast(dec)
                + F.col("c").cast(dec) * (F.col("c") + 1).cast(dec) / 2
            )
        ).alias("ranksum"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("s").cast("long").alias("total_revenue_cents"),
        F.round(
            (
                F.lit(2.0).cast("double") * F.col("ranksum").cast("double")
                - (F.col("n").cast("double") + 1) * F.col("s").cast("double")
            )
            / (F.col("n").cast("double") * F.col("s").cast("double")),
            6,
        ).alias("gini"),
    )


# --------------------------------------- Kendall tau-b trend per device
# Concordance decided on CROSS-MULTIPLIED integer daily sums
# (s2*c1 vs s1*c2), so no division and no float compare anywhere —
# the mean ordering is exact. Day pairs are generated WITHIN each
# device only (per-key history is calendar-bounded), never globally.
_KENDALL_ORACLE = f"""
WITH d AS (
    SELECT user_id, {duck_bucket_epoch("day")} AS day,
           CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
p AS (
    SELECT a.user_id,
           CASE WHEN CAST(b.s AS HUGEINT) * a.c > CAST(a.s AS HUGEINT) * b.c
                THEN 1 ELSE 0 END AS con,
           CASE WHEN CAST(b.s AS HUGEINT) * a.c < CAST(a.s AS HUGEINT) * b.c
                THEN 1 ELSE 0 END AS dis
    FROM d a JOIN d b ON a.user_id = b.user_id AND a.day < b.day
),
k AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(SUM(con) AS BIGINT) AS concordant,
           CAST(SUM(dis) AS BIGINT) AS discordant
    FROM p GROUP BY 1
),
nd AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY 1)
SELECT k.user_id, n_days, concordant, discordant,
       ROUND((CAST(concordant AS DOUBLE) - discordant)
             / SQRT(CAST(n0 AS DOUBLE)
                    * (CAST(n0 AS DOUBLE) - (n0 - concordant - discordant))),
             6) AS tau_b
FROM k JOIN nd USING (user_id)
WHERE n0 > (n0 - concordant - discordant)
"""


@query("kendall_trend_per_device", oracle=_KENDALL_ORACLE)
def kendall_trend_per_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between calendar day and daily mean value, per
    device — the distribution-free trend detector (Mann-Kendall test
    statistic's correlation form) next to theilsen_trend_recent's
    slope estimate: tau near +1/-1 flags monotone drift regardless of
    scale or outliers.

    Days are distinct per device (x has no ties), so
    tau_b = (C - D) / sqrt(n0 * (n0 - T)) with T = y-tie pairs; pairs
    whose y are ALL tied (denominator 0) are excluded by the guard.
    Concordance compares s2*c1 vs s1*c2 (cross-multiplied BIGINT
    daily sums; DECIMAL/HUGEINT headroom at production volumes), so
    both engines order the means identically without dividing.

    100 TB shape: the day grid is one shuffle (device, day); the pair
    expansion is PER DEVICE over its calendar-bounded history (90
    days -> ~4k pairs), never a global cross join; the readout is one
    per-device aggregate."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).cast("long").alias("day"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("vu"),
    ).groupBy("user_id", "day").agg(
        F.sum("vu").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    a = d.select("user_id", F.col("day").alias("d1"), F.col("s").alias("s1"), F.col("c").alias("c1"))
    b = d.select("user_id", F.col("day").alias("d2"), F.col("s").alias("s2"), F.col("c").alias("c2"))
    p = a.join(b, ["user_id"]).filter(F.col("d1") < F.col("d2")).select(
        "user_id",
        F.when(
            F.col("s2").cast(dec) * F.col("c1").cast(dec)
            > F.col("s1").cast(dec) * F.col("c2").cast(dec),
            1,
        ).otherwise(0).alias("con"),
        F.when(
            F.col("s2").cast(dec) * F.col("c1").cast(dec)
            < F.col("s1").cast(dec) * F.col("c2").cast(dec),
            1,
        ).otherwise(0).alias("dis"),
    )
    k = p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("con").cast("long").alias("concordant"),
        F.sum("dis").cast("long").alias("discordant"),
    )
    nd = d.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = F.col("n0") - F.col("concordant") - F.col("discordant")
    return (
        k.join(nd, "user_id")
        .filter(F.col("n0") > ties)
        .select(
            "user_id",
            "n_days",
            "concordant",
            "discordant",
            F.round(
                (F.col("concordant").cast("double") - F.col("discordant"))
                / F.sqrt(
                    F.col("n0").cast("double")
                    * (F.col("n0").cast("double") - ties)
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ------------------------------------------- length-filter yield curve
_YIELD_THRESHOLDS = tuple(range(50, 551, 50))  # 50..550 chars

_YIELD_ORACLE = f"""
WITH h AS (
    SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY 1
),
t AS (SELECT UNNEST(ARRAY{list(_YIELD_THRESHOLDS)}) AS threshold),
tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars
    FROM h
)
SELECT threshold,
       CAST(COALESCE(SUM(CASE WHEN n_chars >= threshold THEN n_docs END), 0)
            AS BIGINT) AS n_docs_kept,
       ROUND(CAST(COALESCE(SUM(CASE WHEN n_chars >= threshold THEN n_docs END),
                           0) AS DOUBLE) / MAX(total_docs), 6) AS doc_yield,
       ROUND(CAST(COALESCE(SUM(CASE WHEN n_chars >= threshold THEN chars END),
                           0) AS DOUBLE) / MAX(total_chars), 6) AS char_yield
FROM t CROSS JOIN h CROSS JOIN tot
GROUP BY threshold
"""


@query("length_filter_yield_curve", oracle=_YIELD_ORACLE)
def length_filter_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus yield curve for a minimum-length quality filter: for
    each candidate threshold, the fraction of documents and of
    character mass that survives — the planning readout a
    training-data pipeline reads BEFORE committing a filter (doc
    yield tells you how many examples remain; char yield how much
    token budget). Monotone non-increasing in the threshold by
    construction (pinned as an invariant test).

    100 TB shape: the corpus collapses to a length histogram FIRST
    (bounded cells — one combine-heavy aggregate), then the curve is
    a tiny thresholds x cells cross join; the raw text is scanned
    exactly once and only the n_chars column is read (column
    pruning)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in _YIELD_THRESHOLDS])
        ).alias("t")
    ).select(F.col("t").cast("long").alias("threshold"))
    tot = h.agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
    )
    kept = F.sum(
        F.when(F.col("n_chars") >= F.col("threshold"), F.col("n_docs"))
    )
    kept_chars = F.sum(
        F.when(F.col("n_chars") >= F.col("threshold"), F.col("chars"))
    )
    return (
        F.broadcast(t)
        .crossJoin(h)
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold")
        .agg(
            F.coalesce(kept, F.lit(0)).cast("long").alias("n_docs_kept"),
            F.round(
                F.coalesce(kept, F.lit(0)).cast("double") / F.max("total_docs"),
                6,
            ).alias("doc_yield"),
            F.round(
                F.coalesce(kept_chars, F.lit(0)).cast("double")
                / F.max("total_chars"),
                6,
            ).alias("char_yield"),
        )
    )
