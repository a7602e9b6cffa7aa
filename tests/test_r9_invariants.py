"""Semantic invariants for the round-9 batch — properties the
oracle-equality gate can't see (it would be equally green if both
engines computed the same wrong thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.plans import QUERIES
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_component_stats_conserve_nodes_and_edges(spark):
    """Component rows must partition the edge-graph's vertex set and
    account for every edge exactly once (components are disjoint and
    every edge is within exactly one component); density lives in
    (0, 1]; the label is the component's minimum member by the
    min-label construction."""
    from iot_etl_spark.plans.graphedges import capped_coactivity_edges

    rows = QUERIES["coactivity_component_stats"](spark, SF_DIR).collect()
    e = capped_coactivity_edges(spark, SF_DIR)
    n_nodes = (
        e.select(F.col("ua").alias("u")).union(e.select("ub")).distinct().count()
    )
    n_edges = e.count()
    assert sum(r.n_nodes for r in rows) == n_nodes
    assert sum(r.n_edges_within for r in rows) == n_edges
    # handshake: within-component degree mass is twice its edges
    assert all(r.degree_sum == 2 * r.n_edges_within for r in rows)
    assert all(0.0 < r.density <= 1.0 for r in rows)
    assert all(r.n_nodes >= 2 for r in rows)


def test_gini_bounds_and_mass(spark):
    """Gini of a non-degenerate positive distribution sits in [0, 1);
    the total must equal the straight revenue sum."""
    row = QUERIES["gini_customer_revenue"](spark, SF_DIR).collect()[0]
    orders = load_table(spark, SF_DIR, "orders")
    total = orders.select(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("t")
    ).collect()[0].t
    n = orders.select("o_custkey").distinct().count()
    assert row.n_customers == n
    assert row.total_revenue_cents == total
    assert 0.0 <= row.gini < 1.0


def test_kendall_tau_bounds_and_pair_accounting(spark):
    """tau_b in [-1, 1]; concordant + discordant never exceeds the
    day-pair count n_days*(n_days-1)/2."""
    rows = QUERIES["kendall_trend_per_device"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n0 = r.n_days * (r.n_days - 1) // 2
        assert r.concordant + r.discordant <= n0
        assert -1.0 <= r.tau_b <= 1.0


def test_yield_curve_monotone_and_anchored(spark):
    """Both yields are monotone non-increasing in the threshold, and
    a threshold at or below the corpus minimum keeps everything."""
    rows = sorted(
        QUERIES["length_filter_yield_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.threshold,
    )
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    min_len = docs.agg(F.min("n_chars")).collect()[0][0]
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs_kept >= b.n_docs_kept
        assert a.doc_yield >= b.doc_yield
        assert a.char_yield >= b.char_yield
    full = [r for r in rows if r.threshold <= min_len]
    assert all(r.n_docs_kept == n_docs and r.doc_yield == 1.0 for r in full)


def test_edge_churn_set_algebra(spark):
    """Overlap can't exceed either half; all rates are proper
    fractions; the halves together cover the full-period edge set
    count at least (union >= full-period edges is NOT guaranteed —
    an edge needs BOTH endpoints in one bucket of one half — but
    union <= full edges + common always holds by distinct-set
    algebra, so pin the unconditional containments)."""
    row = QUERIES["coactivity_edge_churn"](spark, SF_DIR).collect()[0]
    assert row.n_common <= min(row.n_first, row.n_second)
    assert 0.0 <= row.jaccard <= 1.0
    assert 0.0 <= row.dropped_rate <= 1.0
    assert 0.0 <= row.new_rate <= 1.0


def test_pinball_losses_nonneg_and_coverage_bounds(spark):
    """Pinball losses are non-negative by definition; realized P90
    coverage is a proper fraction and, with a stationary generator,
    should exceed the P50 coverage implied by construction (we pin
    only the unconditional bounds)."""
    rows = QUERIES["pinball_loss_eval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_eval > 0
        assert r.pinball_p50 >= 0.0
        assert r.pinball_p90 >= 0.0
        assert 0.0 <= r.coverage_p90 <= 1.0


def test_clamped_balance_builtin_equals_grouped_map(spark):
    """The reflection identity b_t = cum_t - min(0, running_min(cum))
    must reproduce the sequential fold EXACTLY — same rows, same
    integers, same clamp counts (the builtin twin's whole reason to
    exist)."""
    a = sorted(
        map(tuple, QUERIES["clamped_running_balance"](spark, SF_DIR).collect())
    )
    b = sorted(
        map(
            tuple,
            QUERIES["clamped_running_balance_builtin"](spark, SF_DIR).collect(),
        )
    )
    assert a == b


def test_grid_cc_driver_and_distributed_paths_agree(spark, monkeypatch):
    """grid_density_clusters picks union-find vs distributed CC by a
    size threshold; the choice must be invisible in the output."""
    from iot_etl_spark.plans import queries_analytics4 as qa4

    fast = sorted(map(tuple, QUERIES["grid_density_clusters"](spark, SF_DIR).collect()))
    monkeypatch.setattr(qa4, "GRID_DRIVER_CC_MAX", 0)  # force distributed
    slow = sorted(map(tuple, QUERIES["grid_density_clusters"](spark, SF_DIR).collect()))
    assert fast == slow


def test_power_iteration_matches_numpy_float_trajectory(spark):
    """The integer-lattice power iteration must track an INDEPENDENT
    float implementation of the same estimator (numpy, same start,
    same round count, same L-inf renorm): |cos| >= 0.999. The
    synthetic embeddings have a nearly flat spectrum (lambda1/lambda2
    ~ 1.07), so no 3-round method lands on the true eigenvector here —
    the invariant is the TRAJECTORY, which the lattice must reproduce.
    Also pinned: exact L-inf lattice norm and canonical sign."""
    import numpy as np

    from iot_etl_spark.plans.queries_analytics6 import PCA_ITERS

    rows = sorted(
        QUERIES["embedding_top_pc_power_iteration"](spark, SF_DIR).collect(),
        key=lambda r: r.j,
    )
    v = np.array([r.loading for r in rows])
    assert max(abs(x) for x in v) == 1.0  # L-inf renormalized lattice
    top = max(rows, key=lambda r: (abs(r.vq_lattice), -r.j))
    assert top.vq_lattice > 0  # canonical sign

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    G = X.T @ X
    ref = np.ones(X.shape[1])
    for _ in range(PCA_ITERS):
        ref = G @ ref
        ref = ref / np.max(np.abs(ref))
    cos = abs(float(v @ ref)) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos >= 0.999, cos
