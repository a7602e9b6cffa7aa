#!/usr/bin/env python
"""Regenerate PLANS.md: captured executed-plan snapshots for the
headline queries, the human-readable companion to the assertions in
tests/test_plans.py. Run from the repo root."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = [
    ("pricing_summary",
     "TPC-H Q1: scan -> pushed filter -> hash agg; the whole-stage-codegen floor"),
    ("q5_local_supplier_volume",
     "deepest join chain: one fact shuffle, every dim broadcast, pushed dates"),
    ("q17_small_quantity_revenue",
     "decorrelated aggregate subquery: broadcast slice + single window shuffle"),
    ("q19_disjunctive_revenue",
     "disjunctive pushdown: OR bands reach the scan, zero shuffles"),
    ("q21_sole_blame_supplier",
     "EXISTS+NOT EXISTS decorrelation: ONE lineitem scan via window collect_set"),
    ("minhash_lsh_candidates",
     "banded LSH: no self-join, no cartesian, bucket-grouped candidates"),
    ("embedding_cosine_topk",
     "brute-force ANN baseline: 1-row broadcast + TakeOrderedAndProject"),
    ("decontaminate_overlap",
     "train/eval decontamination: eval grams DISTINCT + broadcast, "
     "train never shuffles shingles"),
    ("latest_per_device",
     "DISTINCT ON / last-per-key: single window shuffle, no global sort"),
    ("device_cooccurrence",
     "co-activity graph: within-bucket pair expansion (LSH-bucket shape), "
     "never a self-join on the time bucket"),
    ("session_path_topk",
     "native session_window sessionization -> tiny-key path counts -> "
     "TakeOrderedAndProject"),
    ("quality_classifier_score",
     "hashed linear classifier: ZERO Exchanges - feature hashing, weight "
     "lookup and scoring all inside whole-stage codegen on the scan"),
    ("setsim_prefix_join",
     "exact set-similarity join: prefix-shingle buckets (no self-join), "
     "BIGINT hash-space comparisons, exact verify of candidates only"),
    ("key_skew_audit",
     "skew diagnostics: exactly two map-side-combinable aggregation levels, "
     "no window, no join"),
    ("triangle_count_graph",
     "vertex-ordered triangle join: each triangle produced once, "
     "edge-list shuffles only on its own keys"),
    ("holt_forecast_per_device",
     "per-key sequential recurrence: one shuffle to the sorted array, "
     "the whole fold inside codegen"),
    ("triangle_count_graph_capped",
     "hot-bucket guard: per-bucket row_number cap bounds the pair "
     "expansion before any join; downstream oriented wedge join unchanged"),
    ("editdist_blocking_pairs",
     "deletion-neighborhood blocking: position-filtered variant equi-join, "
     "exact by construction, never an all-pairs product"),
    ("nation_revenue_gini",
     "exact rank-formula Gini: nation-partitioned window over the "
     "per-customer aggregate, no global sort or single-partition exchange"),
    ("kcore_membership",
     "shrinking-frontier iteration: per-round survivor set materialized "
     "(localCheckpoint) so consumed-twice lineage stays linear"),
    ("linear_attribution",
     "one running-sum window + keyed aggregates; credit is one integer "
     "division per output row, no float accumulation"),
    ("ks_weekend_value",
     "two-sample KS: one shuffle to (type, value) cells, window over "
     "cells not rows, integer sup-statistic"),
    ("adamic_adar_linkpred",
     "wedge join over the stage-cached co-activity edge list (6x lineage "
     "fan-out reads one materialized artifact), LEFT ANTI vs edges, "
     "TakeOrderedAndProject on the integer count"),
    ("rrf_hybrid_retrieval",
     "hybrid RAG fusion: 3-row query dim broadcast into both the dense "
     "scan-and-score and the token-overlap join; fusion touches only "
     "2x20 rows per query"),
    ("bm25_retrieval",
     "postings shuffle once on the term key; query terms + their df "
     "broadcast; per-term scores quantized to nano-unit BIGINTs so the "
     "ranking orders an integer"),
    ("kaplan_meier_waits",
     "one user_id shuffle for LEAD spells; KM product as an integer "
     "log-sum over duration cells (bounded by span minutes, not rows)"),
    ("hard_negative_mining",
     "contrastive mining: anchor dim broadcast, label inequality inside "
     "the join condition, per-anchor top-k ranking window"),
    ("target_encode_loo",
     "leakage-free target encoder: ONE scan, ONE cell-frame shuffle; the "
     "category/fold/global marginals are windows over the ~25-row cells"),
    ("zorder_pruning_audit",
     "layout audit: map-side key-range file assignment (no global "
     "row_number), one 128-cell stats aggregate, broadcast probe matrix"),
    ("chow_break_test",
     "structural-break OLS: ONE scan to a 2-cell HUGEINT moment frame; "
     "the cancellations form in exact integers, doubles only at readout"),
    ("fisher_g_periodicity",
     "periodogram: fact collapses to the checkpointed hourly series; the "
     "n x m trig frame is time-bounded, per-term 1e-9 quantized"),
    ("calibration_bins",
     "classifier reliability: zero-shuffle scan scoring into a <=21-cell "
     "aggregate; the global window runs on the post-aggregate bin frame"),
    ("dft_periodogram",
     "spectral analysis: ONE scan into the hourly rollup; series stats "
     "are windows over the post-aggregate hour frame; nano-quantized "
     "cos/sin terms fold as BIGINTs in two exchanges"),
    ("skyline_supplier_frontier",
     "distributed 2-D skyline: bucket-partitioned local frontier prune, "
     "then ONE single-partition pass over the pruned union; point set "
     "checkpointed so the dominance double-read costs one lineitem scan"),
    ("fifo_click_purchase_match",
     "FIFO rank matching: one rank window over both queues, pair fold "
     "as a (user, rank) group-by conditional min - no ranked self-join"),
    ("hurst_rs_exponent",
     "R/S analysis: one scan into the hourly rollup; block windows and "
     "the 4-point slope all run on the post-aggregate hour frame"),
    ("allan_variance_per_device",
     "sensor stability: 4x tau fan-out of one scan into a map-side "
     "(tau, device, bucket) rollup; LAG + aggregate reuse the same keys"),
    ("weighted_median_price",
     "exact weighted median: cumulative DECIMAL weight over the "
     "(flag, price) pre-aggregate - frame is the distinct-price domain, "
     "not the row count"),
    ("ridge_normal_equations",
     "training as aggregation: ONE scan, ONE exchange - ten exact "
     "DECIMAL moments fold map-side, the Cramer solve runs on 1 row"),
    ("bitmap_exact_distinct",
     "exact mergeable distinct: (type, bucket) bitmaps fold map-side "
     "with constant 4KB state, no Expand-based COUNT(DISTINCT) rewrite"),
    ("clamped_running_balance",
     "non-associative fold: one user_id shuffle onto the Arrow "
     "grouped-map; integer micro-units end to end"),
    ("clamped_running_balance_builtin",
     "reflection identity b=cum-min(0,runmin(cum)): the same clamp "
     "fold as two window passes in whole-stage codegen - no Python"),
    ("benjamini_hochberg_fdr",
     "FDR over quantized p-cells: one scan; the only single-partition "
     "exchange is the window over the bounded cell pre-aggregate"),
    ("wasserstein_weekend_value",
     "W1 drift distance: integer CDF cross-products over cents cells, "
     "one division at the end"),
    ("ucb1_bandit_replay",
     "offline policy replay: distributed daily rewards, the sequential "
     "pick fold as ONE aggregate() HOF over the 30-day array"),
    ("quantile_treatment_effect",
     "per-arm order statistics: arm-partitioned cumulative windows "
     "over value cells, integer decile ranks, 9-row decile join"),
    ("window_funnel_conversion",
     "24h windowFunnel: three chained whole-partition MINs on ONE "
     "user exchange - per-row state is 3 BIGINTs, never an array"),
    ("page_hinkley_drift",
     "sequential drift: integer-scaled PH recursion (n*cum - rn*S) "
     "as running sums/minima on a single user exchange"),
    ("theil_u_forecast_skill",
     "forecast skill: calendar lags as [h-k, h-k] RANGE frames on the "
     "hour grid - one scan, no self-joins, centi-unit error squares"),
    ("ivf_probe_recall_curve",
     "ANN recall curve: brute-force scores staged ONCE, 4 consumers "
     "(exact + 3 probe branches) read the cached narrow parquet"),
    ("value_deciles_approx",
     "decile swap: per-type approx_percentile cuts broadcast back, "
     "map-side bucketing - no WindowExec, no per-type sort"),
    ("gini_customer_revenue",
     "sort-free global Gini: rank-weighted sum from tie-group prefix "
     "sums over distinct-revenue cells - no per-row global sort; "
     "DECIMAL rank products"),
    ("length_filter_yield_curve",
     "corpus yield planner: documents collapse to a bounded length "
     "histogram first (scan prunes to n_chars), thresholds broadcast"),
    ("embedding_top_pc_power_iteration",
     "integer power iteration: each matvec is two keyed aggregates "
     "over the exploded component table, v broadcast back per round, "
     "L-inf renorm by truncating integer division - zero float state"),
    ("coactivity_component_stats",
     "both graph artifacts (CC labels, degree-attached edges) read "
     "from materialized stages - no min-label iteration in the plan"),
    ("kruskal_wallis_value_by_type",
     "sort-free rank test: integer 2*rank via tie-group prefix sums; "
     "the only ordered window runs over distinct-value cells, the raw "
     "rows are never globally sorted"),
    ("priority_sample_per_type",
     "weighted priority sampling: one scan, per-stratum partitioned "
     "rank window (no global sort), division-only sort key, threshold "
     "+ HT estimate on the top-(K+1) frame"),
    ("silhouette_by_label",
     "simplified silhouette: exploded vectors join the ROUND(6) "
     "centroid frame via broadcast - one scan, O(n*k) distances, "
     "never pairwise"),
    ("energy_distance_weekend",
     "O(n^2) pairwise |x-y| sums with ZERO pair expansion: one bounded "
     "value-cell aggregate + one cumulative window, all integer"),
    ("mahalanobis_outlier_topk",
     "exact-integer quadratic-form ranking: one 6-moment aggregate "
     "broadcast back, TakeOrderedAndProject, no global sort"),
    ("theil_inequality_decomposition",
     "between/within decomposition: one customer-keyed fact shuffle, "
     "dims broadcast, entropy terms quantized map-side"),
    ("anderson_darling_ksample",
     "dense type x value grid off ONE checkpointed cell frame: "
     "windows over bounded frames, zero fact rescans"),
    ("rbo_rank_agreement",
     "two full retriever builds (dense broadcast probe + BM25 "
     "postings), agreement math on 60 broadcast rank rows"),
    ("link_prediction_scores",
     "shared degree-attached edge stage; weights ride 2|E| rows "
     "before the wedge; the 25-row top-k head BROADCASTS into the "
     "|V|-row degree joins (r13: direction flipped per VERDICT r12)"),
    # round-13 registrations
    ("kuiper_test_hours",
     "24-cell hour grid: one map-side count aggregate, one bounded "
     "window, exact-integer sups — nothing scales past the scan"),
    ("cliffs_delta_weekend",
     "cumulative-cell device: checkpointed value cells, one "
     "single-partition window, pair counts with zero pair expansion"),
    ("kmv_distinct_setops",
     "theta sketch: map-side-distinct hash stream -> "
     "TakeOrderedAndProject(K=512) per side; merge + estimates are "
     "O(K) algebra; exact twins priced as the audit"),
    ("bloom_filter_fpr_audit",
     "bounded 65536-row bit set BROADCAST onto exploded probe "
     "positions; membership is an integer join, no shuffle of probes"),
    ("herfindahl_concentration",
     "lineitem scan with supplier+nation BROADCAST; exact-integer "
     "revenue squares on the bounded supplier frame; no global sort"),
    ("dagostino_k2_normality",
     "anchored-moment device: cells checkpointed, anchor broadcast, "
     "transform chain is O(k) row algebra over 5 moment rows"),
]

HEADER = """# PLANS — captured physical plans for the headline queries

Generated from `df.explain(formatted := queryExecution)` at sf0.001 (plan SHAPE is
scale-invariant; AQE may re-plan sizes at runtime). Regenerate with
`python tools/gen_plans.py`. The properties called out per query are
the ones `tests/test_plans.py` pins — this file is the human-readable
companion to those assertions.
"""


def main() -> None:
    from iot_etl_spark.session import get_spark
    from iot_etl_spark.plans import QUERIES

    spark = get_spark(app_name="plansdoc", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    out = [HEADER]
    for name, why in PICKS:
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        lines = [ln.rstrip()[:200] for ln in plan.splitlines()]
        out.append(f"\n## {name}\n\n{why}\n\n```\n" + "\n".join(lines) + "\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
