"""Semantic invariants for the round-7 analytics batch — properties
the oracle-equality gate can't see (it would be equally green if both
engines computed the same wrong thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.plans import QUERIES
from iot_etl_spark.plans.queries_analytics4 import BFS_MAX_HOPS
from iot_etl_spark.plans.graphedges import capped_coactivity_edges
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap popcount path must equal Spark's own COUNT(DISTINCT)
    — an independent algorithm WITHIN the engine (the oracle already
    checks DuckDB; this pins the bitmap bucket/bit mapping as
    injective over the real id range, including user_id = 0)."""
    got = {
        r["event_type"]: (r["distinct_users"], r["n_events"])
        for r in QUERIES["bitmap_exact_distinct"](spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: (r["d"], r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want and got


def test_k_anonymity_accounting(spark):
    row = QUERIES["k_anonymity_audit"](spark, SF_DIR).collect()[0]
    assert row["n_rows"] > 0 and row["n_groups"] > 0
    assert 1 <= row["min_k"] <= row["avg_k"]
    assert row["rows_at_risk"] <= row["n_rows"]
    assert row["groups_k_violating"] <= row["n_groups"]
    assert row["groups_l_violating"] <= row["n_groups"]
    assert 1 <= row["min_l"] <= row["avg_l"]
    # rows_at_risk counts k<5 groups, so it is < 5 * groups_k_violating
    assert row["rows_at_risk"] <= 5 * row["groups_k_violating"]


def test_ridge_fit_beats_mean_only_model(spark):
    """Training MSE of the 2-feature ridge fit must be below the
    variance of y (the mean-only model's MSE): with n >> lambda the
    ridge solution is essentially OLS, which always weakly improves on
    the intercept-only fit and strictly so whenever the slopes are
    nonzero. (No sign assertion: this generator draws extendedprice
    independent of quantity — corr ~ -0.01 — unlike real TPC-H.)"""
    row = QUERIES["ridge_normal_equations"](spark, SF_DIR).collect()[0]
    assert row["train_mse"] >= 0.0
    assert row["beta_quantity"] != 0.0
    var_y = (
        load_table(spark, SF_DIR, "lineitem")
        .agg(F.var_pop("l_extendedprice").alias("v"))
        .collect()[0]["v"]
    )
    assert row["train_mse"] < var_y


def test_conformal_coverage_near_target(spark):
    """Split-conformal guarantees coverage >= 1 - alpha in expectation
    over splits; with the fixed md5 split, allow finite-sample slack
    below 0.9 but fail on gross miscoverage."""
    rows = QUERIES["conformal_prediction_interval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_calib"] > 0 and r["n_test"] > 0
        assert r["interval_radius"] > 0.0
        assert 0.80 <= r["coverage"] <= 1.0, r


def test_bfs_seed_and_first_hop_degree(spark):
    """Hop 0 is exactly the seed (the lowest active user); hop 1 is
    exactly the seed's undirected degree in the capped edge list —
    checked against the edge frame directly, independent of the BFS
    loop."""
    hops = {
        r["hop"]: r for r in QUERIES["bfs_hop_distance"](spark, SF_DIR).collect()
    }
    assert set(hops) <= set(range(BFS_MAX_HOPS + 1))
    h0 = hops[0]
    assert h0["n_users"] == 1 and h0["min_user"] == h0["max_user"]
    seed = h0["min_user"]
    edges = capped_coactivity_edges(spark, SF_DIR)
    deg = edges.filter(
        (F.col("ua") == seed) | (F.col("ub") == seed)
    ).count()
    if 1 in hops:
        assert hops[1]["n_users"] == deg
        assert hops[1]["min_user"] > seed  # seed is the global min id
    else:
        assert deg == 0


def test_scd2_pit_accounts_for_attributable_purchases(spark):
    """Every purchase at-or-after its user's first browsing event is
    attributed to exactly one regime (validity windows partition
    [first_browse, inf)); purchases before any browse are dropped.
    Checked against an independent count off the raw table."""
    out = QUERIES["scd2_point_in_time"](spark, SF_DIR)
    total_attributed = out.agg(F.sum("n_purchases")).collect()[0][0]
    ev = load_table(spark, SF_DIR, "events")
    first_browse = (
        ev.filter(F.col("event_type").isin("view", "click", "signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_browse, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .count()
    )
    assert total_attributed == want > 0


def test_shapley_efficiency_identity(spark):
    """Shapley values must sum to v(full) - v(empty) (efficiency
    axiom), with v computed independently off the raw table."""
    rows = QUERIES["shapley_channel_attribution"](spark, SF_DIR).collect()
    assert {r["channel"] for r in rows} == {"click", "signup", "view"}
    total = sum(r["shapley"] for r in rows)
    per_user = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
            F.max((F.col("event_type") == "signup").cast("int")).alias("s"),
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "conv"
            ),
        )
    )
    def rate(c, s, v):
        g = per_user.filter(
            (F.col("c") == c) & (F.col("s") == s) & (F.col("v") == v)
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")).collect()[0]
        return (g["k"] or 0) / g["n"] if g["n"] else 0.0
    want = rate(1, 1, 1) - rate(0, 0, 0)
    assert abs(total - want) < 5e-6


def test_sprt_cumulative_and_boundaries(spark):
    rows = sorted(
        QUERIES["sprt_sequential_monitor"](spark, SF_DIR).collect(),
        key=lambda r: r["day_epoch"],
    )
    assert rows
    prev_t = prev_s = 0
    for r in rows:
        assert r["cum_trials"] >= prev_t and r["cum_succ"] >= prev_s
        assert r["cum_succ"] <= r["cum_trials"]
        prev_t, prev_s = r["cum_trials"], r["cum_succ"]
        llr = r["cum_succ"] * 0.22314355131420976 + (
            r["cum_trials"] - r["cum_succ"]
        ) * -0.06453852113757118
        assert abs(llr - r["llr"]) < 1e-5
        want_state = (
            "accept_h1"
            if llr >= 2.9444389791664403
            else "accept_h0" if llr <= -2.9444389791664403 else "continue"
        )
        assert r["boundary_state"] == want_state


def test_stream_cdc_apply_matches_batch_and_is_idempotent(spark):
    """The CDC-merged table equals the batch last-op-per-key state
    computed independently, and a second invocation (checkpoint
    complete, no new files) returns identical rows."""
    from pyspark.sql import Window

    got1 = sorted(
        map(tuple, QUERIES["stream_cdc_apply"](spark, SF_DIR).collect())
    )
    got2 = sorted(
        map(tuple, QUERIES["stream_cdc_apply"](spark, SF_DIR).collect())
    )
    assert got1 == got2 and got1
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    want = sorted(
        map(
            tuple,
            ev.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select(
                F.col("user_id").cast("long"),
                F.col("event_type"),
                F.round(
                    F.expr("CAST(ROUND(value * 1e6) AS BIGINT)").cast("double")
                    / F.lit(1e6),
                    6,
                ),
            )
            .collect(),
        )
    )
    assert got1 == want


def test_clamped_balance_nonnegative_and_bounded(spark):
    """Clamp semantics: balances are nonnegative, max >= final, and
    the final balance is bounded above by the plain (unclamped)
    positive inflow per user. A user with zero debits must show
    final == credits sum and zero clamps."""
    out = {
        r["user_id"]: r
        for r in QUERIES["clamped_running_balance"](spark, SF_DIR).collect()
    }
    assert out
    ev = load_table(spark, SF_DIR, "events")
    flows = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"),
                ).otherwise(0)
            ).alias("credit"),
            F.sum(
                F.when(
                    F.col("event_type") == "error",
                    F.expr("CAST(ROUND(value * 1e6) AS BIGINT)"),
                ).otherwise(0)
            ).alias("debit"),
        )
        .collect()
    )
    for f in flows:
        r = out[f["user_id"]]
        assert 0.0 <= r["final_balance"] <= r["max_balance"] + 1e-9
        assert r["final_balance"] <= f["credit"] / 1e6 + 1e-9
        if f["debit"] == 0:
            assert r["n_clamps"] == 0
            assert abs(r["final_balance"] - f["credit"] / 1e6) < 1e-6


def test_negative_binomial_moment_identities(spark):
    rows = QUERIES["negative_binomial_fit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 2
        assert r["mean_daily"] > 0 and r["var_daily"] >= 0
        # dispersion_index == var/mean (rounded)
        assert abs(r["dispersion_index"] - r["var_daily"] / r["mean_daily"]) < 1e-4
        if r["nb_r"] is not None:
            assert r["var_daily"] > r["mean_daily"]
            assert r["nb_r"] > 0
            # NB mean = r(1-p)/p identity at the MoM solution
            p, nbr = r["nb_p"], r["nb_r"]
            assert abs(nbr * (1 - p) / p - r["mean_daily"]) < 1e-2 * r["mean_daily"]


def test_bh_rejection_consistency(spark):
    row = QUERIES["benjamini_hochberg_fdr"](spark, SF_DIR).collect()[0]
    assert row["n_tests"] > 0
    assert 0 <= row["n_rejected"] <= row["n_tests"]
    if row["n_rejected"] > 0:
        # the threshold p must satisfy the BH inequality at rank k
        assert row["reject_threshold_p"] <= (
            row["n_rejected"] / row["n_tests"]
        ) * 0.10 + 1e-9
    else:
        assert row["reject_threshold_p"] is None


def test_did_algebra_and_se(spark):
    r = QUERIES["diff_in_diff_readout"](spark, SF_DIR).collect()[0]
    want = (r["r_b_post"] - r["r_b_pre"]) - (r["r_a_post"] - r["r_a_pre"])
    assert abs(r["did"] - want) < 5e-6
    assert r["se"] > 0
    assert abs(r["z"] - r["did"] / r["se"]) < 1e-3


def test_nelson_aalen_vs_kaplan_meier(spark):
    """Classic estimator inequality: Fleming-Harrington survival
    exp(-H) >= Kaplan-Meier survival pointwise, and H is
    nondecreasing in duration."""
    na = {
        r["t_min"]: r
        for r in QUERIES["nelson_aalen_hazard"](spark, SF_DIR).collect()
    }
    km = {
        r["t_min"]: r
        for r in QUERIES["kaplan_meier_waits"](spark, SF_DIR).collect()
    }
    assert na and set(na) == set(km)
    prev_h = -1.0
    for t in sorted(na):
        assert na[t]["cum_hazard"] >= prev_h
        prev_h = na[t]["cum_hazard"]
        assert na[t]["fh_survival"] >= km[t]["survival"] - 1e-6, t
        assert na[t]["n_at_risk"] == km[t]["n_at_risk"]


def test_grid_clusters_partition_core_cells(spark):
    """Cluster rows partition the core-cell set: label count and cell
    totals must match an independent computation of the core cells,
    and each cluster's bounding box must be internally consistent."""
    rows = QUERIES["grid_density_clusters"](spark, SF_DIR).collect()
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    cells = ev.groupBy(
        F.hour("ts").cast("long").alias("h"),
        F.expr("CAST(FLOOR(value / CAST(5.0 AS DOUBLE)) AS BIGINT)").alias(
            "b"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = cells.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_cells")
    ).collect()[0]
    core = cells.filter(
        F.col("cnt") * tot["n_cells"] >= 3 * tot["total"]
    ).collect()
    assert sum(r["n_cells"] for r in rows) == len(core)
    assert sum(r["n_points"] for r in rows) == sum(c["cnt"] for c in core)
    for r in rows:
        assert r["hour_min"] <= r["hour_max"]
        assert r["band_min"] <= r["band_max"]
        # the label is a member cell id: h*1000+b within the box
        h, b = divmod(r["cluster_label"], 1000)
        assert r["hour_min"] <= h <= r["hour_max"]
        assert r["band_min"] <= b <= r["band_max"]


def test_anova_eta_squared_matches_variance_decomposition(spark):
    row = QUERIES["anova_oneway_value"](spark, SF_DIR).collect()[0]
    assert row["k"] == 5 and row["f_stat"] > 0
    assert 0.0 <= row["eta_squared"] <= 1.0
    ev = load_table(spark, SF_DIR, "events")
    g = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.var_pop("value").alias("v"))
        .collect()
    )
    ssw = sum(r["n"] * r["v"] for r in g)
    tot = ev.agg(
        F.count(F.lit(1)).alias("n"), F.var_pop("value").alias("v")
    ).collect()[0]
    sst = tot["n"] * tot["v"]
    assert abs(row["eta_squared"] - (1 - ssw / sst)) < 1e-4


def test_cramers_v_bounds(spark):
    row = QUERIES["cramers_v_type_dow"](spark, SF_DIR).collect()[0]
    assert row["r"] == 5 and row["c"] == 7
    assert row["chi2"] >= 0
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_ucb1_replay_accounting(spark):
    rows = {r["arm"]: r for r in QUERIES["ucb1_bandit_replay"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2}
    n_days = (
        load_table(spark, SF_DIR, "events")
        .select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_picks"] for r in rows.values()) == n_days
    for r in rows.values():
        assert r["n_picks"] >= 1  # init phase plays every arm once
        assert 0.0 <= r["avg_reward"] <= 1.0 + 1e-9
        assert abs(r["total_reward"] - r["avg_reward"] * r["n_picks"]) < 1e-3


def test_wasserstein_weekend_bounds(spark):
    """W1 is nonnegative, zero iff identical distributions, and
    bounded above by the value range; cross-checked against a direct
    numpy computation on the quantized cells."""
    import numpy as np

    row = QUERIES["wasserstein_weekend_value"](spark, SF_DIR).collect()[0]
    assert row["n_weekend"] > 0 and row["n_weekday"] > 0
    assert row["w1_distance"] >= 0.0
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            F.expr("CAST(ROUND(value * 1e2) AS BIGINT)").alias("cell"),
            F.dayofweek("ts").isin(1, 7).alias("we"),
        )
        .collect()
    )
    we = np.sort([r["cell"] for r in ev if r["we"]])
    wd = np.sort([r["cell"] for r in ev if not r["we"]])
    grid = np.unique(np.concatenate([we, wd]))
    f1 = np.searchsorted(we, grid, side="right") / len(we)
    f2 = np.searchsorted(wd, grid, side="right") / len(wd)
    w1 = float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(grid))) / 100.0
    assert abs(row["w1_distance"] - w1) < 1e-5


def test_modularity_of_components_is_nonnegative_identity(spark):
    """For a partition into exact connected components every edge is
    intra-community, so Q = 1 - sum((d_i/2m)^2) — recomputed
    independently from the edge list; Q in [0, 1)."""
    row = QUERIES["graph_modularity_components"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["modularity"] < 1.0
    edges = capped_coactivity_edges(spark, SF_DIR)
    m = edges.count()
    assert row["n_edges"] == m
    # independent Q via per-component degree sums over a python CC
    rows = edges.collect()
    import collections

    adj = collections.defaultdict(set)
    for r in rows:
        adj[r["ua"]].add(r["ub"])
        adj[r["ub"]].add(r["ua"])
    seen, comps = set(), []
    for start in adj:
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        comps.append(comp)
    assert row["n_components"] == len(comps)
    assert row["largest_component"] == max(len(c) for c in comps)
    q = 1.0 - sum(
        (sum(len(adj[u]) for u in c) / (2.0 * m)) ** 2 for c in comps
    )
    assert abs(row["modularity"] - q) < 1e-5


def test_brier_decomposition_identity(spark):
    """REL - RES + UNC must equal the directly-computed mean squared
    error of the binned forecasts, and each component respects its
    bounds."""
    row = QUERIES["brier_decomposition"](spark, SF_DIR).collect()[0]
    assert row["reliability"] >= 0.0
    assert row["resolution"] >= 0.0
    assert 0.0 <= row["uncertainty"] <= 0.25 + 1e-9
    assert (
        abs(
            row["brier_score"]
            - (row["reliability"] - row["resolution"] + row["uncertainty"])
        )
        < 5e-6
    )
    # resolution can never exceed uncertainty (variance decomposition)
    assert row["resolution"] <= row["uncertainty"] + 1e-9


def test_harmonic_regression_beats_mean_and_amplitude(spark):
    row = QUERIES["harmonic_regression_daily"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["r2"] < 1.0
    amp = (row["beta_cos"] ** 2 + row["beta_sin"] ** 2) ** 0.5
    assert abs(row["amplitude"] - amp) < 1e-4
    # the level term approximates the global mean when the harmonics
    # are near-orthogonal to the intercept (balanced hours)
    mean = (
        load_table(spark, SF_DIR, "events")
        .agg(F.avg("value"))
        .collect()[0][0]
    )
    assert abs(row["beta_level"] - mean) < 0.05 * abs(mean) + 1.0


def test_jackknife_se_positive_and_theta_exact(spark):
    row = QUERIES["jackknife_ratio_variance"](spark, SF_DIR).collect()[0]
    assert row["k"] == 5
    assert row["se_jackknife"] >= 0.0
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert abs(row["theta"] - purchases / n_users) < 1e-5


def test_fellegi_sunter_weight_ordering(spark):
    """Full agreement must outrank full disagreement, and the weight
    must be monotone in each field's agreement (agree weight >
    disagree weight per field given smoothing and m > u)."""
    rows = {
        (r["type_agree"], r["size_agree"]): r["fs_weight"]
        for r in QUERIES["fellegi_sunter_weights"](spark, SF_DIR).collect()
    }
    assert rows
    if (1, 1) in rows and (0, 0) in rows:
        assert rows[(1, 1)] > rows[(0, 0)]
    for (ta, sa), w in rows.items():
        if (1 - ta, sa) in rows and ta == 1:
            assert w > rows[(0, sa)]
        if (ta, 1 - sa) in rows and sa == 1:
            assert w > rows[(ta, 0)]


def test_acf_pacf_against_numpy_yule_walker(spark):
    """The PACF closed forms are SHARED with the oracle, so a wrong
    formula would be invisible to the equality gate — cross-check
    against numpy's independent Toeplitz solve, and pin ACF basics
    (r0 = 1, |r_k| <= 1, pacf_1 = r_1)."""
    import numpy as np

    rows = {r["lag"]: r for r in QUERIES["acf_pacf_hourly"](spark, SF_DIR).collect()}
    assert rows[0]["acf"] == 1.0
    for r in rows.values():
        assert abs(r["acf"]) <= 1.0 + 1e-9
    assert abs(rows[1]["pacf"] - rows[1]["acf"]) < 1e-6
    r1, r2, r3 = (rows[k]["acf"] for k in (1, 2, 3))
    phi2 = np.linalg.solve(np.array([[1, r1], [r1, 1]]), np.array([r1, r2]))
    assert abs(rows[2]["pacf"] - phi2[1]) < 1e-4
    phi3 = np.linalg.solve(
        np.array([[1, r1, r2], [r1, 1, r1], [r2, r1, 1]]),
        np.array([r1, r2, r3]),
    )
    assert abs(rows[3]["pacf"] - phi3[2]) < 1e-4


def test_qte_deciles_monotone_and_match_sorted_values(spark):
    """Per-arm decile values must be nondecreasing in the decile, and
    the control decile must equal the directly-sorted order statistic
    at rank ceil(d*n/10)."""
    rows = sorted(
        QUERIES["quantile_treatment_effect"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for a, b in zip(rows, rows[1:]):
        assert a["q_control"] <= b["q_control"]
        assert a["q_treatment"] <= b["q_treatment"]
    ev = load_table(spark, SF_DIR, "events").selectExpr(
        "cast(conv(substr(md5(cast(user_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) % 2 AS arm",
        "CAST(ROUND(value * 1e6) AS BIGINT) AS cell",
    )
    ctl = sorted(r["cell"] for r in ev.filter("arm = 0").collect())
    n = len(ctl)
    for r in rows:
        k = (r["decile"] * n + 9) // 10
        assert abs(r["q_control"] - ctl[k - 1] / 1e6) < 1e-9, r["decile"]
        assert abs(r["qte"] - round(r["q_treatment"] - r["q_control"], 6)) < 2e-6


def test_logrank_totals_and_variance(spark):
    row = QUERIES["logrank_test_arms"](spark, SF_DIR).collect()[0]
    assert row["variance"] > 0
    # O1 and E1 are both bounded by the total observed events
    ev = load_table(spark, SF_DIR, "events")
    total_obs = ev.count() - ev.select("user_id").distinct().count()
    assert 0 <= row["o1"] <= total_obs
    assert 0.0 <= row["e1"] <= total_obs
    assert abs(row["z"] - (row["o1"] - row["e1"]) / row["variance"] ** 0.5) < 1e-3


def test_suppressed_release_is_k_anonymous(spark):
    """Every released (non-suppressed) cell has >= RELEASE_K docs and
    totals are preserved."""
    rows = QUERIES["suppressed_release_counts"](spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == load_table(spark, SF_DIR, "documents").count()
    for r in rows:
        if r["lang"] != "__suppressed__":
            assert r["n_docs"] >= 5 and r["n_cells_merged"] == 1


def test_dedup_curve_monotone_and_consistent_with_registry(spark):
    rows = sorted(
        QUERIES["dedup_threshold_curve"](spark, SF_DIR).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_doc_slots"] >= b["n_doc_slots"]
    # the 0.8 point must agree with dedup_ngram_jaccard's pair count
    n08 = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).count()
    assert dict((r["threshold"], r["n_pairs"]) for r in rows)[0.8] == n08


def test_binseg_level1_matches_numpy_argmax(spark):
    """Level-1 changepoint must equal the numpy argmax of the centered
    cusum (earliest index on ties), and level-2 points must fall
    strictly inside their segments."""
    import numpy as np

    rows = QUERIES["binseg_changepoints"](spark, SF_DIR).collect()
    by_seg = {(r["level"], r["segment"]): r for r in rows}
    assert set(by_seg) == {(1, "all"), (2, "left"), (2, "right")}
    series = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("b"))
        .count()
        .orderBy("b")
        .collect()
    )
    y = np.array([r["count"] for r in series], dtype=np.int64)
    n = len(y)
    c = np.abs(n * np.cumsum(y) - np.arange(1, n + 1) * y.sum())
    t1 = int(np.argmax(c)) + 1  # ties: argmax returns first = earliest
    r1 = by_seg[(1, "all")]
    assert r1["t_idx"] == t1
    assert r1["stat_abs"] == int(c[t1 - 1])
    assert 1 <= by_seg[(2, "left")]["t_idx"] <= t1
    assert t1 < by_seg[(2, "right")]["t_idx"] <= n


def test_kendall_taub_against_numpy_contingency(spark):
    """The suffix-sum pair counting is SHARED with the oracle (and a
    sparse-grid bug there would be mutually invisible) — recompute
    C/D/tau-b from the dense contingency with numpy 2-D suffix sums."""
    import numpy as np

    row = QUERIES["kendall_taub_hour_value"](spark, SF_DIR).collect()[0]
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "CAST(hour(ts) AS INT) AS h",
            "CAST(FLOOR(value / CAST(5.0 AS DOUBLE)) AS INT) AS b",
        )
        .collect()
    )
    hs = sorted({r["h"] for r in ev})
    bs = sorted({r["b"] for r in ev})
    hi = {v: i for i, v in enumerate(hs)}
    bi = {v: i for i, v in enumerate(bs)}
    m = np.zeros((len(hs), len(bs)), dtype=np.int64)
    for r in ev:
        m[hi[r["h"]], bi[r["b"]]] += 1
    # suffix sums: S[i, j] = sum of m[i:, j:]
    S = np.flip(np.cumsum(np.cumsum(np.flip(m), axis=0), axis=1))
    C = int(np.sum(m[:-1, :-1] * S[1:, 1:]))
    # discordant: m[i, j] * sum of m[i' > i, b' < j]
    pre = np.zeros_like(m)
    pre[:, 1:] = np.cumsum(m, axis=1)[:, :-1]  # strictly-less columns
    below = np.zeros_like(m)
    below[:-1, :] = np.flip(np.cumsum(np.flip(pre, 0), 0), 0)[1:, :]
    D = int(np.sum(m * below))
    n = int(m.sum())
    n0 = n * (n - 1) // 2
    n1 = int(sum(t * (t - 1) // 2 for t in m.sum(axis=1)))
    n2 = int(sum(t * (t - 1) // 2 for t in m.sum(axis=0)))
    assert row["concordant"] == C
    assert row["discordant"] == D
    want = (C - D) / ((n0 - n1) * (n0 - n2)) ** 0.5
    assert abs(row["tau_b"] - want) < 1e-5
    assert -1.0 <= row["tau_b"] <= 1.0


def test_mann_kendall_against_numpy(spark):
    import numpy as np

    row = QUERIES["mann_kendall_trend"](spark, SF_DIR).collect()[0]
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .count()
        .orderBy("d")
        .collect()
    )
    y = np.array([r["count"] for r in daily], dtype=np.int64)
    s = int(np.sum(np.sign(y[None, :] - y[:, None])[np.triu_indices(len(y), 1)]))
    assert row["s"] == s and row["n"] == len(y)
    _, t = np.unique(y, return_counts=True)
    tie = int(np.sum(t * (t - 1) * (2 * t + 5)))
    var = (len(y) * (len(y) - 1) * (2 * len(y) + 5) - tie) / 18
    assert abs(row["variance"] - var) < 1e-6
    zc = (s - np.sign(s)) / var ** 0.5 if s != 0 else 0.0
    assert abs(row["z"] - zc) < 1e-5


def test_seasonal_strength_consistent_with_decomposition(spark):
    """F_s recomputed from seasonal_decomposition_hourly's own cells
    (index and residual_std) must match within rounding, and sits in
    [0, 1]."""
    row = QUERIES["seasonal_strength_index"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["seasonal_strength"] <= 1.0
    assert row["var_remainder"] <= row["var_detrended"] + 1e-9
    cells = QUERIES["seasonal_decomposition_hourly"](spark, SF_DIR).collect()
    n = sum(c["n_obs"] for c in cells)
    ss_rem = sum(c["n_obs"] * c["residual_std"] ** 2 for c in cells)
    mean_all = sum(c["n_obs"] * c["seasonal_index"] for c in cells) / n
    ss_det = ss_rem + sum(
        c["n_obs"] * (c["seasonal_index"] - mean_all) ** 2 for c in cells
    )
    want = max(0.0, 1.0 - ss_rem / ss_det)
    assert abs(row["seasonal_strength"] - want) < 1e-3


def test_holt_winters_matches_python_fold(spark):
    """Both engines share the recursion, so a wrong update rule would
    be mutually invisible — re-run the identical fold in plain Python
    over the collected hourly series and compare level/trend/SSE and
    every forecast."""
    rows = {
        r["horizon_hours"]: r
        for r in QUERIES["holt_winters_hourly"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(1, 7))
    series = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.expr("unix_timestamp(ts) div 3600").alias("hr"))
        .count()
        .orderBy("hr")
        .collect()
    )
    y = [float(r["count"]) for r in series]
    p, a, b, g = 24, 0.2, 0.05, 0.1
    m1 = sum(y[:p]) / p
    m2 = sum(y[p : 2 * p]) / p
    lv, tr = m1, (m2 - m1) / p
    seas = [v - m1 for v in y[:p]]
    sse = 0.0
    for v in y[p:]:
        s0 = seas.pop(0)
        pred = lv + tr + s0
        sse += (v - pred) ** 2
        lv2 = a * (v - s0) + (1 - a) * (lv + tr)
        tr = b * (lv2 - lv) + (1 - b) * tr
        seas.append(g * (v - lv2) + (1 - g) * s0)
        lv = lv2
    r1 = rows[1]
    assert abs(r1["level"] - lv) < 1e-4
    assert abs(r1["trend"] - tr) < 1e-4
    assert abs(r1["sse"] - sse) < max(1e-3, 1e-9 * sse)
    for h in range(1, 7):
        want = lv + h * tr + seas[(h - 1) % p]
        assert abs(rows[h]["forecast"] - want) < 1e-3, h


def test_lsh_recall_accounting(spark):
    """LSH pairs are a subset of the exact pair set (same verification
    space), so n_exact must equal n_lsh + n_missed exactly; recall in
    (0, 1]. The LSH design point (4 bands x 4 rows at s = 0.8) has
    theoretical recall ~0.88 — allow slack but fail on collapse."""
    row = QUERIES["lsh_recall_audit"](spark, SF_DIR).collect()[0]
    assert row["n_exact"] > 0
    assert row["n_exact"] == row["n_lsh"] + row["n_missed"]
    assert 0.5 <= row["recall"] <= 1.0


def test_hodges_lehmann_against_numpy(spark):
    """HL shift and Cliff's delta recomputed directly from the
    quantized samples with numpy (full pairwise difference matrix at
    test scale) — the cell construction is shared with the oracle."""
    import numpy as np

    row = QUERIES["hodges_lehmann_weekend"](spark, SF_DIR).collect()[0]
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "CAST(ROUND(value) AS BIGINT) AS cell",
            "dayofweek(ts) IN (1, 7) AS we",
        )
        .collect()
    )
    we = np.array([r["cell"] for r in ev if r["we"]], dtype=np.int64)
    wd = np.array([r["cell"] for r in ev if not r["we"]], dtype=np.int64)
    diffs = (we[:, None] - wd[None, :]).ravel()
    diffs.sort()
    tot = len(diffs)
    # lower weighted median: min d with 2*cum >= tot
    hl = int(diffs[(tot + 1) // 2 - 1])
    assert row["n_pairs"] == tot
    assert row["hl_shift"] == hl
    cliffs = (np.sum(diffs > 0) - np.sum(diffs < 0)) / tot
    assert abs(row["cliffs_delta"] - cliffs) < 1e-6
    assert -1.0 <= row["cliffs_delta"] <= 1.0
