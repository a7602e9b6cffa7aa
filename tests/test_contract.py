"""Driver-contract guards: the three surfaces the build driver and the
bench harness consume must keep their exact shapes — a regression here
blanks a whole round's verification, so it gets its own tests.

Spark-session-free where possible (fast collection); the bench run
uses a tiny single-query subset at sf0.001.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_module_contract():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert callable(e.entry)
    assert len(qs) >= 157
    # every query callable, every oracle a non-empty SQL string, and
    # the two dicts cover the same names (zero rows-only checks)
    assert set(qs) == set(osql)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # driver-window curation (round 7): CORRECTNESS_r06 was never
    # recorded, so the round-6 registrations are still never-driver-
    # checked — the window leads with the round-7 registrations, then
    # the round-6 batch in its original order; spill past 50 stays in
    # the rotation pool for the next round.
    first50 = list(qs)[:50]
    for must in (
        # round-7 registrations (fresh evidence first)
        "bitmap_exact_distinct",
        "k_anonymity_audit",
        "ridge_normal_equations",
        "conformal_prediction_interval",
        "bfs_hop_distance",
        "scd2_point_in_time",
        "shapley_channel_attribution",
        "sprt_sequential_monitor",
        "stream_cdc_apply",
        "clamped_running_balance",
        "negative_binomial_fit",
        "benjamini_hochberg_fdr",
        "diff_in_diff_readout",
        "nelson_aalen_hazard",
        "grid_density_clusters",
        "anova_oneway_value",
        "cramers_v_type_dow",
        "ucb1_bandit_replay",
        "wasserstein_weekend_value",
        "graph_modularity_components",
        "brier_decomposition",
        "harmonic_regression_daily",
        "jackknife_ratio_variance",
        "fellegi_sunter_weights",
        "acf_pacf_hourly",
        "quantile_treatment_effect",
        "logrank_test_arms",
        "suppressed_release_counts",
        "dedup_threshold_curve",
        "binseg_changepoints",
        "kendall_taub_hour_value",
        "mann_kendall_trend",
        "stream_session_dynamic_gap",
        "seasonal_strength_index",
        "holt_winters_hourly",
        # round-6 registrations fill the remaining slots (never
        # driver-checked); pin only the head of that block so adding a
        # round-7 query does not invalidate the contract each time
        "device_cooccurrence_capped",
        "triangle_count_graph_capped",
        "pagerank_device_graph_capped",
    ):
        assert must in first50, must


def test_bench_emits_contract_json_line(tmp_path):
    """bench.py's LAST stdout line must be the driver's JSON contract,
    and the full map must land in BENCH_LOCAL.json (whose committed
    full-registry content is restored afterwards)."""
    local = os.path.join(REPO, "BENCH_LOCAL.json")
    saved = open(local).read() if os.path.exists(local) else None
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_QUERIES="order_priority_counts",
        SPARK_DRIVER_MEMORY="2g",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        last = out.stdout.strip().splitlines()[-1]
        r = json.loads(last)
        assert r["metric"] == "total_query_wall_time"
        assert r["unit"] == "sec"
        assert r["sf"] == 0.001
        assert r["n_failed"] == 0
        assert set(r["queries"]) == {"order_priority_counts"}
        assert r["queries"]["order_priority_counts"] > 0
        with open(local) as fh:
            disk = json.load(fh)
        assert disk["queries"] == r["queries"]
    finally:
        if saved is not None:
            with open(local, "w") as fh:
                fh.write(saved)
