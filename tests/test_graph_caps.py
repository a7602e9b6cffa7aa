"""Hot-bucket guard for the co-activity graph family (VERDICT r5
item 4): the ``_capped`` twins equal their exact siblings whenever the
cap covers the max bucket occupancy, and the cap genuinely bounds the
pair fan-out when it binds."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iot_etl_spark.plans.graphedges import COACT_BUCKET_CAP, cap_bucket_activity
from iot_etl_spark.plans.registry import QUERIES
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cap_covers_test_scale_occupancy(spark):
    """Premise of the equivalence tests: COACT_BUCKET_CAP exceeds the
    max per-minute occupancy at test SF, so the guard is non-binding
    there (a pure scale guard, not an approximation at current
    data)."""
    occ = (
        load_table(spark, SF_DIR, "events")
        .select(F.date_trunc("minute", "ts").alias("b"), "user_id")
        .distinct()
        .groupBy("b")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ <= COACT_BUCKET_CAP


@pytest.mark.parametrize(
    "exact,capped",
    [
        ("device_cooccurrence", "device_cooccurrence_capped"),
        ("triangle_count_graph", "triangle_count_graph_capped"),
        ("pagerank_device_graph", "pagerank_device_graph_capped"),
    ],
)
def test_capped_twin_identical_when_cap_covers_occupancy(spark, exact, capped):
    assert _rows(QUERIES[capped](spark, SF_DIR)) == _rows(QUERIES[exact](spark, SF_DIR))


def test_cap_bounds_bucket_membership_and_pair_fanout(spark):
    """When the cap BINDS: a hot bucket of 10 users capped at 3 keeps
    exactly the 3 lowest ids, so its pair expansion is C(3,2)=3, not
    C(10,2)=45 — the quadratic term is bounded by the cap; cold
    buckets are untouched."""
    rows = [(1, u) for u in range(10)] + [(2, 100), (2, 101)]
    act = spark.createDataFrame(rows, "b LONG, user_id LONG")
    capped = cap_bucket_activity(act, 3)
    got = sorted((r.b, r.user_id) for r in capped.collect())
    assert got == [(1, 0), (1, 1), (1, 2), (2, 100), (2, 101)]

    # the downstream expansion sees only the capped membership:
    # sum over buckets of C(size, 2) = 3 (hot, capped) + 1 (cold)
    n_pairs = (
        capped.groupBy("b")
        .count()
        .select((F.col("count") * (F.col("count") - 1) / 2).cast("long").alias("np"))
        .agg(F.sum("np"))
        .collect()[0][0]
    )
    assert n_pairs == 4


def test_kcore_bounded_rounds_reach_fixpoint_at_test_scale(spark):
    """kcore_membership runs a FIXED number of peel rounds (static
    plan depth); this pins that the fixpoint is reached at test scale
    — recomputing the survivor set one more round changes nothing —
    so the driver-checked output is the exact k-core, and that the
    peel actually discriminates (some node is out of core)."""
    from iot_etl_spark.plans.queries_audit import (
        KCORE_K,
        kcore_membership,
    )

    out = kcore_membership(spark, SF_DIR).cache()
    rows = {r.user_id: r for r in out.collect()}
    assert rows, "empty graph"
    survivors = {u for u, r in rows.items() if r.in_core == 1}
    # one more peel over the reported core: every survivor's degree
    # within the survivor set must still be >= K (fixpoint), directly
    # from the reported core_degree
    for u in survivors:
        assert rows[u].core_degree >= KCORE_K
    # non-survivors report degree 0 by contract
    for u, r in rows.items():
        if u not in survivors:
            assert r.core_degree == 0
    assert len(survivors) < len(rows), "peel did not discriminate at test scale"
