"""Star-schema (TPC-H-ish) queries: enrichment joins, conditional
aggregates, HAVING, top-k — the reference's J1-J4 / A3 / A9 / O1-O4
surface exercised on the driver's joinable tables (FIXTURES.md §B).

Scale notes: dimension joins broadcast the small side (customer /
nation / region are dimension-sized; the fact side never shuffles for
enrichment). Aggregations are hash aggs with map-side partial
aggregation; top-k compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iot_etl_spark.plans.registry import query
from iot_etl_spark.sources.tables import load_table
from iot_etl_spark.operators.enrich import enrich_left_join


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 6) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
           AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
           AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / COUNT(*) AS avg_disc,
       COUNT(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship-grade scan->filter->agg->sort (TPC-H Q1 shape; covers
    reference A1/A3-style grouped aggregates, spark_transform.py:282).

    Money/quantity aggregates accumulate EXACTLY (BIGINT quantities,
    DECIMAL(18,2)/(4,2) prices and discounts — the fixture data is
    2-decimal, so the casts are lossless) and every displayed double
    derives from an exact sum via one division: a plain double SUM is
    order-dependent in its last ulp, which flips ROUND(,6) on boundary
    cells at sf0.1+ group sizes. Exact accumulation is bit-identical
    at any scale and partition count — TPC-H itself specifies decimal
    arithmetic for exactly this reason."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("long"))
    base = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    disc_price = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    )
    disc = F.sum(F.col("l_discount").cast("decimal(4,2)"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(qty.cast("double"), 6).alias("sum_qty"),
            F.round(base.cast("double"), 6).alias("sum_base_price"),
            F.round(disc_price.cast("double"), 6).alias("sum_disc_price"),
            (qty.cast("double") / n).alias("avg_qty"),
            (base.cast("double") / n).alias("avg_price"),
            (disc.cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ENRICH_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
       o.o_orderpriority, c.c_name, n.n_name, r.r_name
FROM lineitem l
LEFT JOIN orders   o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
ORDER BY l.l_extendedprice DESC, l.l_orderkey, l.l_linenumber
LIMIT 100
"""


@query("enriched_lineitem_topk", oracle=_ENRICH_ORACLE)
def enriched_lineitem_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enrichment chain (reference J1-J3,
    spark_transform.py:46-86: three left joins that must not drop fact
    rows) + deterministic top-k (O2). All dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    df = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
    df = df.join(orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
                 df.l_orderkey == orders.o_orderkey, "left").drop("o_orderkey")
    df = enrich_left_join(df, cust.select(F.col("c_custkey").alias("o_custkey"),
                                          "c_name", "c_nationkey"), on="o_custkey")
    df = enrich_left_join(df, nation.select(F.col("n_nationkey").alias("c_nationkey"),
                                            "n_name", "n_regionkey"), on="c_nationkey")
    df = enrich_left_join(df, region.select(F.col("r_regionkey").alias("n_regionkey"),
                                            "r_name"), on="n_regionkey")
    return (
        df.select("l_orderkey", "l_linenumber", "l_extendedprice",
                  "o_orderpriority", "c_name", "n_name", "r_name")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


_REVENUE_NATION_ORACLE = """
SELECT n.n_name,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
           AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders   o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("revenue_by_nation", oracle=_REVENUE_NATION_ORACLE)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop inner-join + grouped revenue (A3/J1-J3 at joinable
    scale). Fact side shuffles once for the orderkey join; all
    dimension hops broadcast. Revenue accumulates as exact DECIMAL
    (order-independent; see pricing_summary for the convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    df = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    )
    return (
        df.groupBy("n_name")
        .agg(
            F.round(revenue.cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_TOP_CUSTOMERS_ORACLE = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(o.o_totalprice), 6) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_revenue DESC, c_custkey
LIMIT 20
"""


@query("top_customers_by_revenue", oracle=_TOP_CUSTOMERS_ORACLE)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust.select("c_custkey", "c_name")),
                    orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_revenue").desc(), "c_custkey")
        .limit(20)
    )


_PRIORITY_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 6) AS avg_price,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders
FROM orders
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
ORDER BY o_orderpriority
"""


@query("order_priority_counts", oracle=_PRIORITY_ORACLE)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregate + HAVING (reference A3/A9 pattern:
    SUM(CASE WHEN ...), HAVING COUNT(*) > n, analytical_queries.sql:
    100-127)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("finished_orders"),
        )
        .filter(F.col("n_orders") > 10)
        .orderBy("o_orderpriority")
    )


# ------------------------------------------- SQL-surface Q3 (shipping)
Q3_CUTOFF = "1998-06-01"

_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       {{orderdate_epoch}} AS orderdate_epoch,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, orderdate_epoch, l_orderkey
LIMIT 10
"""

_SHIPPING_PRIORITY_ORACLE = _SHIPPING_PRIORITY_SQL.format(
    orderdate_epoch="epoch_us(o_orderdate) // 1000000"
)


@query("sql_shipping_priority", oracle=_SHIPPING_PRIORITY_ORACLE)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape shipping-priority query executed through the
    **SQL surface**: tables registered as views (sources/tables.py:
    register_views) and the statement run via spark.sql — the Spark
    and DuckDB texts are the SAME template, differing only in the
    epoch-extraction idiom. Proves a reference user can paste their
    warehouse SQL (analytical_queries.sql style) at the engine
    unchanged. Plan: Catalyst reorders the 3-way join, pushes both
    date predicates into the parquet scans, broadcasts the filtered
    customer side; top-10 compiles to TakeOrderedAndProject. Revenue
    in exact integer cents (order-independent across group sizes)."""
    from iot_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _SHIPPING_PRIORITY_SQL.format(
            orderdate_epoch="CAST(unix_timestamp(o_orderdate) AS BIGINT)"
        )
    )


# ------------------------------------------- TPC-H Q5 (local supplier)
_Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the deepest join chain in the suite (6 tables)
    with the distinctive *local supplier* constraint: the customer and
    the supplier of each lineitem must share a nation
    (c_nationkey = s_nationkey), so the join graph is cyclic, the
    classic stress test for join ordering. Revenue accumulates in
    exact integer cents (order-independent across engines — see
    pricing conventions).

    Scale: region -> nation -> supplier collapse into one broadcast
    dim (the ASIA prune cuts suppliers ~5x before the fact join);
    the orders date filter is pushed into the parquet scan; lineitem,
    the 100 TB table, shuffles once on l_orderkey. Customer carries no
    explicit hint — dimension-sized here, AQE picks broadcast; at
    full scale it exceeds the threshold and degrades to a shuffle
    join on o_custkey, which is the right plan there."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return j.groupBy("n_name").agg(
        F.sum(cents).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ------------------------------------------- TPC-H Q10 (returned items)
_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT))
            AS BIGINT) AS lost_revenue_cents,
       COUNT(*) AS n_returned_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue_cents DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — which customers returned the most revenue:
    the returned-lineitem fact filtered at the scan (l_returnflag
    pushdown), joined up the customer->nation dimension chain, grouped
    per customer, top-20 by lost revenue (TakeOrderedAndProject, no
    global sort). Revenue in exact integer cents.

    Scale: the returnflag filter prunes ~75% of lineitem before any
    join; orders->lineitem is the one fact-fact shuffle; customer and
    nation broadcast at dimension scale (AQE decides customer)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(cents).alias("lost_revenue_cents"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("lost_revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


# ----------------------------------------------------------- TPC-H Q17
Q17_BRAND = "Brand#23"
Q17_MAX_SIZE = 25

_Q17_ORACLE = f"""
WITH pf AS (
    SELECT p_partkey FROM part
    WHERE p_brand = '{Q17_BRAND}' AND p_size <= {Q17_MAX_SIZE}
),
li AS (
    SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
    FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
),
a AS (
    SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
    FROM li GROUP BY l_partkey
)
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(li.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(SUM(CAST(ROUND(li.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           / 700.0 AS avg_yearly
FROM li JOIN a ON li.l_partkey = a.l_partkey
WHERE li.l_quantity < a.qty_limit
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems of a
    brand/size part slice whose quantity is below 20% of that part's
    average quantity — the correlated-aggregate-subquery pattern,
    decorrelated the way Catalyst plans it: semi-reduce lineitem by
    the broadcast part slice, ONE shuffle on l_partkey computing the
    per-part average as a window, filter, aggregate to a single row.

    Scale: the part slice is ~1/250 of the dim -> always broadcast;
    lineitem is reduced by that factor BEFORE its only shuffle. On a
    real cluster the same join also arms a runtime Bloom filter on
    l_partkey that prunes lineitem row groups at the scan (pinned by
    the plan suite with lowered injection thresholds — the optimizer
    injects it automatically past 10 GB scans, no code change).
    avg_yearly is emitted UNROUNDED: it derives from an exact integer
    cents sum via one IEEE division, bit-identical on both engines.
    The 0.2*avg threshold compare is exact too (integer quantities,
    group sums < 2^53)."""
    from pyspark.sql import Window

    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == Q17_BRAND) & (F.col("p_size") <= Q17_MAX_SIZE))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("l_partkey")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.withColumn("qty_limit", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents).alias("revenue_cents"),
            (F.sum(cents) / 700.0).alias("avg_yearly"),
        )
    )


# ----------------------------------------------------------- TPC-H Q18
Q18_QTY_THRESHOLD = 280
Q18_TOP_N = 100

_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) // 1000000 AS orderdate_epoch,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, orderdate_epoch, o.o_orderkey
LIMIT {Q18_TOP_N}
"""


@query("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds a threshold, enriched with the customer — the
    aggregate-HAVING-then-join-back pattern. The classic formulation
    re-joins lineitem and re-aggregates; here the aggregate IS the
    driving table (computed once, already order-grained), so lineitem
    is scanned and shuffled exactly once.

    Scale: the HAVING filter makes `big` tiny (large-volume orders are
    rare tail events) -> broadcast it into orders, then one shuffle
    join to customer; top-k compiles to TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.select(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias("orderdate_epoch"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "orderdate_epoch", "o_orderkey")
        .limit(Q18_TOP_N)
    )
