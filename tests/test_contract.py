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
    # driver-window curation (round 6, VERDICT r5 item 5): full union
    # coverage was reached in r5, so the window now carries the round-6
    # registrations plus the OLDEST r1 greens for regression re-checks.
    first50 = list(qs)[:50]
    for must in (
        # round-6 registrations (fresh evidence)
        "device_cooccurrence_capped",
        "triangle_count_graph_capped",
        "pagerank_device_graph_capped",
        "ks_weekend_value",
        "mannwhitney_weekend_value",
        "adamic_adar_linkpred",
        "rrf_hybrid_retrieval",
        "stream_outer_join_attribution",
        "welch_ttest_value",
        "bm25_retrieval",
        "kaplan_meier_waits",
        "group_kfold_assign",
        "hill_tail_index",
        "cuped_experiment_readout",
        "stream_full_outer_reconcile",
        "srm_arm_balance",
        "calibration_bins",
        "ndcg_label_retrieval",
        "dedup_token_inflation",
        "source_overlap_matrix",
        "mutual_info_type_hour",
        "stream_dedup_ttl",
        "hard_negative_mining",
        "target_encode_loo",
        # latest round-6 registrations (freshest code needs driver
        # evidence most)
        "anomaly_ensemble_vote",
        "seasonal_naive_backtest",
        "readability_grade",
        "heaps_law_curve",
        "funnel_step_timing",
        "centroid_separation_audit",
        "pr_curve_bins",
        # analytics batch 3 (the 53 round-6 registrations exceed the
        # 50-slot window: weighted_median_price / fifo_click_purchase_
        # match / mrr_recall_retrieval and the r1 re-checks spill to
        # the r7 window — never-driver-checked queries outrank
        # re-checks of five-times-green ones)
        "dft_periodogram",
        "skyline_supplier_frontier",
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
