"""Hot-bucket guard for co-activity edge builds (VERDICT r5 item 4).

The co-activity graph family (``device_cooccurrence``,
``triangle_count_graph``, ``pagerank_device_graph``) derives edges
from "two users active in the same minute bucket" — a pair expansion
whose cost is the sum over buckets of occupancy², quadratic in a hot
bucket's occupancy. At test scale the max per-minute occupancy is ~12;
at 100 TB a flash-crowd minute with 10⁶ active users would expand
10¹² pairs. This module makes the guard CODE, not prose: each family
member has a ``_capped`` twin whose activity set is bounded per bucket
BEFORE any pair expansion, the same pattern the approx-percentile
twins apply to the global-NTILE family.

Semantics (documented, deterministic): per bucket, the ``cap``
lowest-id members are kept; members beyond the cap contribute no edges
from that bucket. With ``cap >= max bucket occupancy`` the output is
IDENTICAL to the exact build (pinned by pytest equivalence), so the
twin is a pure scale guard, not an approximation at current data. The
cap runs as a per-bucket ``row_number`` — sort-based, spillable,
bounded state — never a ``collect_list`` of the raw bucket, so the
guard itself cannot blow up on the hot bucket it protects against.

Cap choice: ``COACT_BUCKET_CAP = 64`` — >5x the sf0.1 max occupancy
(non-binding at every test SF) while bounding the per-bucket expansion
at 64*63/2 = 2016 pairs regardless of crowd size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

COACT_BUCKET_CAP = 64


def cap_bucket_activity(
    act: DataFrame,
    cap: int | None,
    bucket_col: str = "b",
    id_col: str = "user_id",
) -> DataFrame:
    """Bound a distinct (bucket, id) activity frame to at most ``cap``
    members per bucket — the ``cap`` lowest ids win (deterministic and
    engine-independent). ``cap=None`` is the exact pass-through, so
    every consumer routes through this one guard and the capped twins
    differ from their exact siblings by ONLY this call."""
    if cap is None:
        return act
    w = Window.partitionBy(bucket_col).orderBy(id_col)
    return (
        act.withColumn("_bucket_rn", F.row_number().over(w))
        .filter(F.col("_bucket_rn") <= cap)
        .drop("_bucket_rn")
    )


def capped_minute_activity(spark, sf_dir: str):
    """The shared root of all three ``_capped`` co-activity twins
    (cooccurrence / triangles / PageRank): distinct (minute, user)
    activity with the COACT_BUCKET_CAP guard applied, MATERIALIZED
    once per (source fingerprint, builder code) via the stage cache —
    the twins otherwise each pay the distinct + per-bucket window
    again. At 100 TB this is the activity-index table a graph
    pipeline maintains beside the events (same argument as the
    MinHash/SimHash shared stages)."""
    from iot_etl_spark.plans.stagecache import cached_stage
    from iot_etl_spark.sources.tables import load_table

    def build():
        act = (
            load_table(spark, sf_dir, "events")
            .select(
                F.unix_timestamp(F.date_trunc("minute", F.col("ts")))
                .cast("long")
                .alias("b"),
                "user_id",
            )
            .distinct()
        )
        return cap_bucket_activity(act, COACT_BUCKET_CAP)

    return cached_stage(
        spark, "coact_capped", sf_dir, ("events",), build,
        code_deps=(cap_bucket_activity,),
    )


def duck_capped_activity(bucket_sql: str, cap: int) -> str:
    """DuckDB twin of ``cap_bucket_activity`` over the events view:
    a CTE body yielding the capped distinct (b, user_id) activity set,
    spliced into each capped twin's oracle so both engines apply the
    identical per-bucket min-id cap."""
    return f"""(
    SELECT b, user_id FROM (
        SELECT b, user_id,
               ROW_NUMBER() OVER (PARTITION BY b ORDER BY user_id) AS rn
        FROM (SELECT DISTINCT {bucket_sql} AS b, user_id FROM events)
    ) WHERE rn <= {cap}
)"""


def capped_coactivity_edges(spark, sf_dir: str):
    """The distinct id-ordered co-activity EDGE LIST built from
    capped_minute_activity, materialized via the stage cache. The
    bucket self-join + distinct is the graph family's second shared
    root (after the capped activity set): consumers whose lineage
    fans the edge list out several times (adamic_adar_linkpred reads
    it 6x through the union/anti-join tree) would otherwise re-run
    the pair expansion per read — measured 7.4 s -> ~2 s warm at
    sf0.1. At 100 TB this is the adjacency table a graph pipeline
    maintains as a first-class artifact beside the activity index."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        act = capped_minute_activity(spark, sf_dir)
        other = act.select(F.col("b").alias("b2"), F.col("user_id").alias("u2"))
        return (
            act.join(
                other, (F.col("b") == F.col("b2")) & (F.col("user_id") < F.col("u2"))
            )
            .select(F.col("user_id").alias("ua"), F.col("u2").alias("ub"))
            .distinct()
        )

    return cached_stage(
        spark, "coact_capped_edges", sf_dir, ("events",), build,
        code_deps=(capped_minute_activity, cap_bucket_activity),
    )


def _attach_endpoint_degrees(e: DataFrame) -> DataFrame:
    """(ua, ub) -> (ua, ub, da, db): undirected degree of each
    endpoint attached to every id-ordered edge. Runs INSIDE a stage
    build — consumers then derive orientation (triangles), weighted
    directed adjacency (adamic-adar), or plain directed adjacency by
    pure projection/union, with zero per-query degree aggregates or
    degree joins (VERDICT r8 item 7: the family's shared recompute)."""
    deg = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        e.join(deg.select(F.col("u").alias("ua"), F.col("deg").alias("da")), "ua")
        .join(deg.select(F.col("u").alias("ub"), F.col("deg").alias("db")), "ub")
        .select("ua", "ub", "da", "db")
    )


def capped_edges_with_degrees(spark, sf_dir: str):
    """Capped co-activity edge list with endpoint degrees attached,
    materialized once per (source, code) fingerprint — the graph
    family's third shared artifact (activity set -> edge list -> this).
    At 100 TB it is the degree-annotated adjacency table a graph
    pipeline maintains so orientation/weighting never re-aggregates."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        return _attach_endpoint_degrees(capped_coactivity_edges(spark, sf_dir))

    return cached_stage(
        spark, "coact_capped_edeg", sf_dir, ("events",), build,
        code_deps=(
            _attach_endpoint_degrees,
            capped_coactivity_edges,
            capped_minute_activity,
            cap_bucket_activity,
        ),
    )


def capped_wedge_scores(spark, sf_dir: str):
    """(ua, ub) wedge-pair scores over the capped co-activity graph —
    the SHARED intermediate of the link-prediction family
    (adamic_adar_linkpred + link_prediction_scores), materialized once
    per (source, code) fingerprint like the edge/degree stages it
    builds on (r14; VERDICT r13 item 4). Both consumers used to replay
    the identical wedge expansion + (a, b) aggregate — the family's
    dominant cost (~1.9 s each at sf0.1) — per query.

    Columns: cn (common-neighbor count), aa (Σ 1/ln d_z),
    ra (Σ 1/d_z), adj (1 iff the pair is an EDGE). The adjacency
    anti-join is folded INTO the aggregate: edge rows ride the same
    shuffle tagged is_e=1 with null weights, so `cn = COUNT(invlog)`
    counts wedge rows only and `adj = MAX(is_e)` marks pairs the
    consumers must drop — no second pass over the pair frame, no
    broadcast build of the edge list per action.

    100 TB shape: bounded by the capped graph's wedge space (the
    bucket cap bounds per-vertex fan-out), the same argument that
    makes the edge list materializable; weights attach BEFORE the
    expansion (ride 2|E| rows), the aggregate is map-side combinable,
    and consumers are projection + filter + TakeOrdered."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        edeg = capped_edges_with_degrees(spark, sf_dir)
        n = edeg.select(
            F.col("ua").alias("z"), F.col("ub").alias("x"),
            F.col("da").cast("double").alias("d"),
        ).unionAll(
            edeg.select(
                F.col("ub").alias("z"), F.col("ua").alias("x"),
                F.col("db").cast("double").alias("d"),
            )
        )
        # degree-1 vertices anchor no wedge and would make ln(d) = 0:
        # drop them BEFORE the weight (the r6 adamic convention)
        n1 = n.filter(F.col("d") >= 2).select(
            "z", F.col("x").alias("wa"),
            (1.0 / F.log(F.col("d"))).alias("invlog"),
            (1.0 / F.col("d")).alias("invd"),
        )
        n2 = n.select(F.col("z").alias("z2"), F.col("x").alias("wb"))
        wedge = n1.join(
            n2, (F.col("z") == F.col("z2")) & (F.col("wa") < F.col("wb"))
        ).select(
            F.col("wa").alias("ua"), F.col("wb").alias("ub"),
            "invlog", "invd", F.lit(0).alias("is_e"),
        )
        tagged = wedge.unionAll(
            edeg.select(
                "ua", "ub",
                F.lit(None).cast("double").alias("invlog"),
                F.lit(None).cast("double").alias("invd"),
                F.lit(1).alias("is_e"),
            )
        )
        return tagged.groupBy("ua", "ub").agg(
            F.count("invlog").cast("long").alias("cn"),
            F.sum("invlog").alias("aa"),
            F.sum("invd").alias("ra"),
            F.max("is_e").alias("adj"),
        )

    return cached_stage(
        spark, "coact_wedge_scores", sf_dir, ("events",), build,
        code_deps=(
            capped_edges_with_degrees,
            _attach_endpoint_degrees,
            capped_coactivity_edges,
            capped_minute_activity,
            cap_bucket_activity,
        ),
    )


def exact_edges_with_degrees(spark, sf_dir: str):
    """Exact-family sibling of capped_edges_with_degrees."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        return _attach_endpoint_degrees(exact_coactivity_edges(spark, sf_dir))

    return cached_stage(
        spark, "coact_exact_edeg", sf_dir, ("events",), build,
        code_deps=(
            _attach_endpoint_degrees,
            exact_coactivity_edges,
            exact_minute_activity,
        ),
    )


def _adjacency_lists(e: DataFrame) -> DataFrame:
    """(ua, ub) -> one row per node: (user_id, nbrs array, deg).
    ``sort_array`` pins the array content deterministically (consumers
    are order-invariant — PageRank sums over an explode — but a stage
    artifact should not depend on shuffle arrival order)."""
    return (
        e.select(F.col("ua").alias("src"), F.col("ub").alias("dst"))
        .unionAll(e.select(F.col("ub").alias("src"), F.col("ua").alias("dst")))
        .groupBy(F.col("src").alias("user_id"))
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).cast("long").alias("deg"),
        )
    )


def capped_adjacency_lists(spark, sf_dir: str):
    """Adjacency-list table (node -> neighbor array + degree) of the
    capped co-activity graph, materialized once per fingerprint — the
    layout PageRank's iterative sweeps join against (|V| rows instead
    of 2|E|); previously rebuilt (groupBy + collect_list) per query
    run."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        return _adjacency_lists(capped_coactivity_edges(spark, sf_dir))

    return cached_stage(
        spark, "coact_capped_adj", sf_dir, ("events",), build,
        code_deps=(
            _adjacency_lists,
            capped_coactivity_edges,
            capped_minute_activity,
            cap_bucket_activity,
        ),
    )


def exact_adjacency_lists(spark, sf_dir: str):
    """Exact-family sibling of capped_adjacency_lists."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        return _adjacency_lists(exact_coactivity_edges(spark, sf_dir))

    return cached_stage(
        spark, "coact_exact_adj", sf_dir, ("events",), build,
        code_deps=(
            _adjacency_lists,
            exact_coactivity_edges,
            exact_minute_activity,
        ),
    )


def capped_node_degrees(spark, sf_dir: str, deg_alias: str = "deg"):
    """(u, <deg_alias>) per edge-endpoint node — a pure PROJECTION of
    the adjacency-list stage (zero aggregates, zero shuffles). The one
    place degree semantics live; triangle/k-core/modularity/component
    consumers used to each re-derive this with a 2|E|-row dedup
    aggregate (r9 review finding)."""
    return capped_adjacency_lists(spark, sf_dir).select(
        F.col("user_id").alias("u"), F.col("deg").alias(deg_alias)
    )


def exact_node_degrees(spark, sf_dir: str, deg_alias: str = "deg"):
    """Exact-family sibling of capped_node_degrees."""
    return exact_adjacency_lists(spark, sf_dir).select(
        F.col("user_id").alias("u"), F.col("deg").alias(deg_alias)
    )


def capped_cc_labels(spark, sf_dir: str):
    """Connected-component labels of the capped co-activity graph —
    (u, label) with label = min user_id in the component —
    materialized once per (source, code) fingerprint. The min-label
    loop is the family's only iterative stage; its output is exactly
    the entity-resolution table a production graph pipeline persists
    (the dedup family already materializes its cluster labels the
    same way: queries_text.py's _cluster_labels stage). Consumers:
    graph_modularity_components (Q over the partition) and
    coactivity_component_stats (per-component profile)."""
    from iot_etl_spark.plans.stagecache import cached_stage
    from iot_etl_spark.plans.queries_text import _min_label_components

    def build():
        e = capped_coactivity_edges(spark, sf_dir)
        sym = e.select(F.col("ua").alias("a"), F.col("ub").alias("b")).unionAll(
            e.select(F.col("ub").alias("a"), F.col("ua").alias("b"))
        )
        return _min_label_components(sym).withColumnRenamed("doc_id", "u")

    return cached_stage(
        spark, "coact_capped_cc", sf_dir, ("events",), build,
        code_deps=(
            _min_label_components,
            capped_coactivity_edges,
            capped_minute_activity,
            cap_bucket_activity,
        ),
    )


def exact_minute_activity(spark, sf_dir: str):
    """UNCAPPED distinct (minute, user) activity — the exact family's
    shared root (triangle / PageRank / cooccurrence), materialized via
    the stage cache with the same argument as the capped twin's:
    several consumers, each of whose lineage would otherwise re-run
    the distinct per read."""
    from iot_etl_spark.plans.stagecache import cached_stage
    from iot_etl_spark.sources.tables import load_table

    def build():
        return (
            load_table(spark, sf_dir, "events")
            .select(
                F.unix_timestamp(F.date_trunc("minute", F.col("ts")))
                .cast("long")
                .alias("b"),
                "user_id",
            )
            .distinct()
        )

    return cached_stage(spark, "coact_exact_act", sf_dir, ("events",), build)


def exact_coactivity_edges(spark, sf_dir: str):
    """UNCAPPED distinct id-ordered co-activity edge list,
    materialized once per (source, builder code) — the exact twins'
    adjacency artifact. The triangle query's lineage reads the edge
    list FOUR times (degree, orientation, wedge legs, closure);
    without materialization each read re-runs the bucket pair
    expansion (the measured cache-vs-recompute note that used to live
    inline now favors the parquet stage: the expansion runs once per
    fingerprint instead of 4x per query run). The capped twin
    (capped_coactivity_edges) carries the hot-bucket guard; THIS
    stage is the exact-semantics sibling and scales with true
    occupancy² — at 100 TB route consumers to the capped artifact."""
    from iot_etl_spark.plans.stagecache import cached_stage

    def build():
        act = exact_minute_activity(spark, sf_dir)
        other = act.select(F.col("b").alias("b2"), F.col("user_id").alias("u2"))
        return (
            act.join(
                other, (F.col("b") == F.col("b2")) & (F.col("user_id") < F.col("u2"))
            )
            .select(F.col("user_id").alias("ua"), F.col("u2").alias("ub"))
            .distinct()
        )

    return cached_stage(
        spark, "coact_exact_edges", sf_dir, ("events",), build,
        code_deps=(exact_minute_activity,),
    )
