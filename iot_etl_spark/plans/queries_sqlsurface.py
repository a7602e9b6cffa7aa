"""SQL-surface capabilities beyond plain SELECT: correlated LATERAL
subqueries and recursive CTEs — both new to Spark's SQL dialect in the
4.x line, both run through ``spark.sql`` over registered views with the
SAME statement text DuckDB executes as the oracle (modulo the
epoch-extraction idiom, the ``sql_shipping_priority`` convention).

A reference user's warehouse SQL increasingly uses these shapes
(TimescaleDB/Postgres dialect): LATERAL for correlated top-n-per-row,
WITH RECURSIVE for graph reachability — pasting them at this engine
now works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iot_etl_spark.plans.registry import query
from iot_etl_spark.sources.tables import register_views


# ------------------------------------------------ LATERAL top-n-per-row
# For each of the 5 highest-balance customers, their 3 most recent
# orders — the correlated-subquery-returning-rows shape that would
# otherwise need a window + filter. Identical text on both engines.
_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.orderdate_epoch, o.o_totalprice
FROM (
    SELECT c_custkey, c_name FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 5
) c,
LATERAL (
    SELECT o_orderkey, {orderdate_epoch} AS orderdate_epoch, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_orderdate DESC, o_orderkey
    LIMIT 3
) o
ORDER BY c.c_custkey, orderdate_epoch DESC, o.o_orderkey
"""

_LATERAL_ORACLE = _LATERAL_SQL.format(
    orderdate_epoch="epoch_us(o_orderdate) // 1000000"
)


@query("sql_lateral_recent_orders", oracle=_LATERAL_ORACLE)
def sql_lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery on the SQL surface: top-3 recent
    orders per top-5 customer, one statement, no hand-written window.

    Scale: Catalyst decorrelates the lateral into a join against the
    5-row driving side — the per-customer LIMIT becomes a ranked
    filter, not 5 separate scans; the driving side is broadcastable by
    construction. (The window formulation is what the optimizer
    produces; LATERAL is the ergonomic surface for it.)"""
    register_views(spark, sf_dir)
    return spark.sql(
        _LATERAL_SQL.format(
            orderdate_epoch="CAST(unix_timestamp(o_orderdate) AS BIGINT)"
        )
    )


# ------------------------------------------- recursive CTE reachability
# Canonical-document election on the exact-duplicate graph, expressed
# as WITH RECURSIVE reachability: docs sharing a text digest form a
# chain (each doc points at the previous doc_id in its group), and the
# recursion walks every doc to its chain root (the group's min doc_id).
# Matches dedup_exact's canonical election, computed by a completely
# different mechanism — and the statement text is identical on both
# engines (md5 and LAG exist in both dialects).
_RECURSIVE_SQL = """
WITH RECURSIVE
edges AS (
    SELECT doc_id,
           LAG(doc_id) OVER (PARTITION BY md5(text) ORDER BY doc_id) AS parent
    FROM documents
),
walk (doc_id, anc) AS (
    SELECT doc_id, doc_id AS anc FROM edges
    UNION ALL
    SELECT w.doc_id, e.parent
    FROM walk w JOIN edges e ON w.anc = e.doc_id
    WHERE e.parent IS NOT NULL
)
SELECT doc_id,
       CAST(MIN(anc) AS BIGINT) AS canonical_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS chain_depth
FROM walk
GROUP BY doc_id
"""


@query("sql_recursive_dedup_roots", oracle=_RECURSIVE_SQL)
def sql_recursive_dedup_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE on the SQL surface (new in Spark 4): every
    document walks the exact-duplicate chain to its root, electing the
    same canonical doc_id `dedup_exact` elects via MIN() — two
    mechanisms, one answer, both engines running the identical
    recursive statement. chain_depth counts the hops (0 for uniques
    and canonicals).

    Scale: recursion depth is the longest duplicate CHAIN (group
    size - 1), not corpus size — each iteration is one co-partitioned
    join on the accumulating frontier. For graphs with real diameter
    (social, citation), the iterative min-label operator
    (`dedup_clusters`, pointer-jumping escape hatch) is the 100 TB
    path; the recursive CTE is the SQL-ergonomics twin for shallow
    hierarchies."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# --------------------------------------------- explicit GROUPING SETS
# The custom-combination member of the grouping-sets family the
# registry's CUBE (all subsets) and ROLLUP (hierarchy prefixes) can't
# express: exactly the named combinations, nothing else. Identical
# statement text on both engines.
_GROUPING_SETS_SQL = """
SELECT event_type,
       {dow} AS day_of_week,
       GROUPING(event_type) * 2 + GROUPING({dow_raw}) AS grouping_id,
       COUNT(*) AS reading_count,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY GROUPING SETS ((event_type, {dow_raw}), (event_type), ({dow_raw}))
"""


@query(
    "grouping_sets_matrix",
    oracle=_GROUPING_SETS_SQL.format(
        dow="CAST(EXTRACT(dow FROM CAST(ts AS TIMESTAMP)) AS BIGINT)",
        dow_raw="CAST(EXTRACT(dow FROM CAST(ts AS TIMESTAMP)) AS BIGINT)",
    ),
)
def grouping_sets_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS on the SQL surface: the (type, dow),
    (type), (dow) margins — a strict subset of CUBE's 4 combinations,
    declared rather than filtered, with GROUPING() markers
    disambiguating real NULLs from subtotal rows.

    Scale: one map-side Expand (3x rows) + one shuffle on the compound
    key — declaring only the needed sets cuts Expand fan-out vs CUBE,
    which is the point at 100 TB. DuckDB EXTRACT(dow) is 0=Sunday vs
    Spark dayofweek 1=Sunday, so the Spark text shifts by one (the
    cube_type_dow convention)."""
    register_views(spark, sf_dir)
    return spark.sql(
        _GROUPING_SETS_SQL.format(
            dow="CAST(dayofweek(ts) - 1 AS BIGINT)",
            dow_raw="CAST(dayofweek(ts) - 1 AS BIGINT)",
        )
    )
