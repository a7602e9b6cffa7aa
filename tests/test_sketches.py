"""Sketch profiles vs their exact twins, within published error bounds
(extensions/sketches.py). Run on real testdata so cardinalities are
realistic for the bounds being claimed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_etl_spark.extensions.sketches import (
    approx_distinct_profile,
    approx_quantile_profile,
)
from iot_etl_spark.sources.tables import load_events, load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF_DIR).cache()


def test_hll_within_relative_error(spark, events):
    rsd = 0.023
    approx = {
        r.event_type: r
        for r in approx_distinct_profile(events, rsd=rsd).collect()
    }
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.countDistinct(F.to_date("ts")).alias("days"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, ex in exact.items():
        ap = approx[et]
        # HLL++ rsd is a standard deviation; 5 sigma is a safe test bound
        assert abs(ap.approx_distinct_devices - ex.d) <= max(5 * rsd * ex.d, 1.0), et
        assert abs(ap.approx_active_days - ex.days) <= max(5 * rsd * ex.days, 1.0), et
        assert ap.reading_count == ex.n  # plain count is exact


def test_gk_quantiles_within_rank_error(spark, events):
    accuracy = 10_000
    approx = {r.event_type: r for r in approx_quantile_profile(events, accuracy=accuracy).collect()}
    # GK guarantee: returned value's RANK is within n/accuracy of the
    # target rank -> check by rank, not by value distance
    vals = {
        et: sorted(
            r.value for r in events.filter(
                (F.col("event_type") == et) & F.col("value").isNotNull()
            ).select("value").collect()
        )
        for et in approx
    }
    for et, row in approx.items():
        v, n = vals[et], len(vals[et])
        tol = max(2 * n // accuracy, 2)
        for p, got in ((0.5, row.p50_value), (0.95, row.p95_value), (0.99, row.p99_value)):
            target = int(p * (n - 1))
            lo = v[max(0, target - tol)]
            hi = v[min(n - 1, target + tol)]
            assert lo <= got <= hi, (et, p, got, lo, hi)


def test_cms_overestimates_and_bounds(spark):
    """CMS guarantees: est >= true for EVERY key; mean overestimate
    well inside the e/width * N bound."""
    import math
    import pyspark.sql.functions as F
    from iot_etl_spark.extensions.sketches import cms_build, cms_estimate

    docs = load_table(spark, str(SF_DIR), "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    cms = cms_build(tok)
    est = cms_estimate(cms, exact.select("token"))
    j = exact.join(est, "token").select("token", "c", "est").collect()
    n_total = sum(r.c for r in j)
    assert all(r.est >= r.c for r in j), "CMS must never underestimate"
    bound = math.e / 256 * n_total
    overs = [r.est - r.c for r in j]
    assert sum(overs) / len(overs) <= bound
    # with depth 4, the fraction of keys past the 1-row bound is tiny
    assert sum(1 for o in overs if o > bound) <= len(overs) * 0.05


def test_cms_merge_is_exact(spark):
    """cms(A) + cms(B) must equal cms(A union B) cell-for-cell —
    the mergeability that makes it a distributed partial aggregate."""
    import pyspark.sql.functions as F
    from iot_etl_spark.extensions.sketches import cms_build, cms_merge

    docs = load_table(spark, str(SF_DIR), "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    a = cms_build(tok.filter("doc_id % 2 = 0"))
    b = cms_build(tok.filter("doc_id % 2 = 1"))
    merged = {(r.row, r.slot): r.c for r in cms_merge(a, b).collect()}
    full = {(r.row, r.slot): r.c for r in cms_build(tok).collect()}
    assert merged == full
