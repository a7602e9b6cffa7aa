"""Equivalence pins for the approx-cut-point twins (VERDICT r4 item 3):
the scalable percentile-swap queries must produce IDENTICAL buckets to
exact cut points whenever the sketch is exact (accuracy >= frame size,
true at every test SF) — i.e. the only approximation is the documented
sketch rank error, not the bucketing construction. Plus plan pins: the
swaps' entire point is that no WindowExec (and no per-stratum sort)
survives in the physical plan.

Runs at sf0.01 (the driver's correctness SF) — large enough for ties
and multi-source strata, small enough for CI.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_etl_spark.plans import registry
from tests.conftest import SF_DIR_MED


def _exact_disc(sorted_vals, p):
    """DuckDB/Spark discrete quantile: smallest element whose CDF
    reaches p — the element at 1-indexed rank ceil(p * n)."""
    n = len(sorted_vals)
    return sorted_vals[max(0, math.ceil(p * n) - 1)]


def test_gate_approx_kept_set_identical(spark):
    """kept == (cume_dist >= 0.75) exactly: the discrete-quantile
    threshold is provably the same predicate when the sketch is exact."""
    exact = (
        registry.QUERIES["quality_percentile_gate"](spark, SF_DIR_MED)
        .select("doc_id", F.col("kept").alias("kept_exact"))
    )
    approx = (
        registry.QUERIES["quality_percentile_gate_approx"](spark, SF_DIR_MED)
        .select("doc_id", F.col("kept").alias("kept_approx"))
    )
    diff = exact.join(approx, "doc_id").filter(
        F.col("kept_exact") != F.col("kept_approx")
    )
    assert diff.count() == 0
    assert exact.count() == approx.count()


def test_rfm_approx_buckets_match_exact_cut_points(spark):
    """Approx quintiles == quintiles from EXACT cut points (identical
    buckets up to sketch error; sketch error is zero at this n)."""
    rows = registry.QUERIES["rfm_segments_approx"](spark, SF_DIR_MED).collect()
    ps = (0.2, 0.4, 0.6, 0.8)
    for metric, bucket_col, desc in (
        ("recency_days", "r_quintile", True),
        ("frequency", "f_quintile", False),
        ("monetary", "m_quintile", False),
    ):
        cuts = [_exact_disc(sorted(r[metric] for r in rows), p) for p in ps]
        for r in rows:
            v = r[metric]
            want = 1 + sum((v < c) if desc else (v > c) for c in cuts)
            assert r[bucket_col] == want, (metric, v, cuts, r[bucket_col], want)


def test_pareto_approx_curve_matches_exact(spark):
    """Bucket boundaries sit ON the exact supplier-level cumulative
    curve: cum_share after bucket b == exact cum_share at supplier rank
    sum(n_suppliers through b); bucket populations cover every supplier
    and the curve ends at 1.0."""
    exact = {
        r["rnk"]: r["cum_share"]
        for r in registry.QUERIES["supplier_pareto_share"](spark, SF_DIR_MED)
        .select("rnk", "cum_share")
        .collect()
    }
    buckets = sorted(
        registry.QUERIES["supplier_pareto_share_approx"](spark, SF_DIR_MED).collect(),
        key=lambda r: r["bucket"],
    )
    assert sum(b["n_suppliers"] for b in buckets) == len(exact)
    assert abs(buckets[-1]["cum_share"] - 1.0) < 1e-9
    rank = 0
    for b in buckets:
        rank += b["n_suppliers"]
        # revenue ties across a cut boundary could reorder membership;
        # revenues are DECIMAL sums of many lineitems, effectively
        # unique, so boundary equality holds to rounding.
        assert abs(b["cum_share"] - exact[rank]) < 1e-6, (b["bucket"], rank)


def test_approx_twins_have_no_window_exec(spark):
    """The whole point of the swap: no WindowExec anywhere in the
    row-level twins' plans (the pareto twin may keep its window — it
    runs over the <=20-row bucket frame)."""
    for name in (
        "rfm_segments_approx",
        "quality_percentile_gate_approx",
        "value_deciles_approx",
    ):
        df = registry.QUERIES[name](spark, SF_DIR_MED)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, name
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, name


def test_decile_approx_cuts_match_exact_order_statistics(spark):
    """Per-type approx decile cut points == exact discrete deciles of
    the collected values (sketch exact at this n), and the bucketed
    populations cover every row with per-bucket min/max consistent
    with the cuts."""
    from iot_etl_spark.plans.queries_events import _DECILE_PS
    from iot_etl_spark.sources.tables import load_events

    vals = {}
    for r in (
        load_events(spark, SF_DIR_MED)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    rows = registry.QUERIES["value_deciles_approx"](spark, SF_DIR_MED).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(vals)
    for et, vs in vals.items():
        vs.sort()
        cuts = [_exact_disc(vs, p) for p in _DECILE_PS]
        buckets = sorted(by_type[et], key=lambda r: r["decile"])
        assert sum(b["n_values"] for b in buckets) == len(vs)
        for b in buckets:
            d = b["decile"]
            # value-bucket semantics: bucket d spans (cut[d-2], cut[d-1]]
            if d >= 2:
                assert b["min_value"] > cuts[d - 2], (et, d)
            if d <= len(cuts):
                assert b["max_value"] <= cuts[d - 1], (et, d)


def test_median_ci_approx_within_cell_width_of_exact(spark):
    """Quantized-cell CI: ranks and counts IDENTICAL to the exact
    twin; each value statistic is the lower cell edge, so
    0 <= exact - approx < 0.1 (the cell width) for median and both
    CI endpoints."""
    exact = {
        r["event_type"]: r
        for r in registry.QUERIES["median_ci_order_stats"](spark, SF_DIR_MED).collect()
    }
    approx = {
        r["event_type"]: r
        for r in registry.QUERIES["median_ci_order_stats_approx"](
            spark, SF_DIR_MED
        ).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        for col in ("n_values", "k_lo", "k_hi"):
            assert e[col] == a[col], (et, col)
        for col in ("median_value", "ci_lo", "ci_hi"):
            diff = e[col] - a[col]
            assert 0.0 <= diff < 0.1, (et, col, e[col], a[col])
