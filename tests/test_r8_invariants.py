"""Semantic invariants for the round-8 analytics batch — properties
the oracle-equality gate can't see (it would be equally green if both
engines computed the same wrong thing)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_etl_spark.plans import QUERIES
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_window_funnel_depths_partition_users(spark):
    """Depth buckets partition the active-user universe, and depth>=1
    is exactly the set of users with at least one view event."""
    rows = QUERIES["window_funnel_conversion"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    n_viewers = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert sum(r["n_users"] for r in rows if r["funnel_depth"] >= 1) == n_viewers
    # monotone containment: completing step k requires step k-1
    by_depth = {r["funnel_depth"]: r["n_users"] for r in rows}
    assert all(d in (0, 1, 2, 3) for d in by_depth)


def test_registry_rejects_duplicate_names():
    """A repeated @query name must raise, not silently clobber the
    earlier registration (round-8 near-miss: a new module re-used
    session_path_topk and replaced the session_window variant)."""
    import pytest

    from iot_etl_spark.plans.registry import query

    with pytest.raises(ValueError, match="duplicate query registration"):
        query("session_path_topk")(lambda spark, sf: None)


def test_schema_drift_first_seen_accounting(spark):
    """Every key is new exactly once: sum of n_new_keys over days ==
    global distinct key count, and n_new_keys <= n_keys per day."""
    rows = QUERIES["schema_drift_daily"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").filter(F.col("props").isNotNull())
    n_keys_global = (
        ev.select(
            F.explode(
                F.map_keys(F.from_json("props", "map<string,string>"))
            ).alias("k")
        )
        .distinct()
        .count()
    )
    assert sum(r["n_new_keys"] for r in rows) == n_keys_global
    assert all(0 <= r["n_new_keys"] <= r["n_keys"] for r in rows)
    # the first observed day introduces every key it carries
    first = min(rows, key=lambda r: r["day"])
    assert first["n_new_keys"] == first["n_keys"]


def test_null_rate_drift_accounting(spark):
    """Rates live in [0,1], row counts cover the table, and exactly
    the earliest day has NULL deltas (no predecessor)."""
    rows = QUERIES["null_rate_drift_daily"](spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    first_day = min(r["day"] for r in rows)
    for r in rows:
        for c in ("value_null_rate", "props_null_rate"):
            assert 0.0 <= r[c] <= 1.0
        if r["day"] == first_day:
            assert r["value_rate_delta"] is None
            assert r["props_rate_delta"] is None
        else:
            assert r["value_rate_delta"] is not None
            # -0.0 must never survive the normalization
            assert not (
                r["value_rate_delta"] == 0.0
                and math.copysign(1.0, r["value_rate_delta"]) < 0
            )


def test_theil_u2_is_ratio_of_its_own_parts(spark):
    """u2 recomputes from the published integer sums, and the error
    sums are non-negative."""
    for r in QUERIES["theil_u_forecast_skill"](spark, SF_DIR).collect():
        assert r["ss_naive"] >= 0 and r["ss_seasonal"] >= 0
        assert r["n_hours"] > 0
        if r["ss_naive"] > 0:
            want = round(math.sqrt(r["ss_seasonal"] / r["ss_naive"]), 6)
            assert abs(r["u2_seasonal_vs_naive"] - want) < 1e-9
        else:
            assert r["u2_seasonal_vs_naive"] is None


def test_page_hinkley_alarm_consistency(spark):
    """The statistic is non-negative and the alarm fields agree: a
    first-alarm timestamp exists iff the flag is set, and the flag
    matches stat > lambda up to readout rounding."""
    rows = QUERIES["page_hinkley_drift"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ph_stat"] >= 0.0
        assert (r["first_alarm_epoch"] is not None) == r["drift_flag"]
        if r["drift_flag"]:
            assert r["ph_stat"] > 5.0 - 1e-6
        else:
            assert r["ph_stat"] <= 5.0 + 1e-6


def test_uniqueness_implies_novelty(spark):
    """df==1 shingles are a subset of first-seen shingles: per doc,
    n_unique <= novel_shingles, with identical shingle universes."""
    uniq = {
        r["doc_id"]: r
        for r in QUERIES["ngram_uniqueness_rate"](spark, SF_DIR).collect()
    }
    nov = {
        r["doc_id"]: r for r in QUERIES["ngram_novelty"](spark, SF_DIR).collect()
    }
    assert set(uniq) == set(nov)
    for d, u in uniq.items():
        assert u["n_shingles"] == nov[d]["n_shingles"], d
        assert u["n_unique"] <= nov[d]["novel_shingles"], d


def test_ivf_recall_monotone_and_consistent(spark):
    """Recall@k is monotone non-decreasing in nprobe, k rows are
    retrieved per probe setting, and the nprobe=3 arm reproduces
    embedding_ivf_topk's result set."""
    rows = sorted(
        QUERIES["ivf_probe_recall_curve"](spark, SF_DIR).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3]
    recalls = [r["recall_at_k"] for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert r["n_retrieved"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_k"] - r["n_hits"] / 10.0) < 1e-9
    ivf = {
        r["vec_id"] for r in QUERIES["embedding_ivf_topk"](spark, SF_DIR).collect()
    }
    exact = {
        r["vec_id"]
        for r in QUERIES["embedding_cosine_topk"](spark, SF_DIR).collect()
    }
    assert rows[2]["n_hits"] == len(ivf & exact)


def test_tukey_pairs_cover_all_types(spark):
    """k types -> k(k-1)/2 unordered pairs; q >= 0; the significance
    flag is exactly q > q_crit."""
    from iot_etl_spark.plans.queries_analytics5 import TUKEY_Q_CRIT

    rows = QUERIES["tukey_hsd_pairwise"](spark, SF_DIR).collect()
    k = (
        load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["q_stat"] >= 0.0
        assert r["significant"] == (r["q_stat"] > TUKEY_Q_CRIT) or abs(
            r["q_stat"] - TUKEY_Q_CRIT
        ) < 1e-5


def test_ljung_box_readout_consistent(spark):
    from iot_etl_spark.plans.queries_analytics5 import LB_CHI2_CRIT

    rows = QUERIES["ljung_box_whitenoise"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    n_hours = (
        load_table(spark, SF_DIR, "events")
        .select(F.date_trunc("hour", F.col("ts")))
        .distinct()
        .count()
    )
    assert r["n_hours"] == n_hours
    assert r["q_stat"] >= 0.0
    assert r["whitenoise_rejected"] == (r["q_stat"] > LB_CHI2_CRIT) or abs(
        r["q_stat"] - LB_CHI2_CRIT
    ) < 1e-5


def test_granger_directions_and_flags(spark):
    from iot_etl_spark.plans.queries_analytics5 import GRANGER_F_CRIT

    rows = QUERIES["granger_lag1_causality"](spark, SF_DIR).collect()
    assert {r["direction"] for r in rows} == {
        "click->purchase",
        "purchase->click",
    }
    n0, n1 = (r["n_hours"] for r in rows)
    assert n0 == n1 and n0 > 3
    for r in rows:
        assert r["f_stat"] is not None
        assert r["causes"] == (r["f_stat"] > GRANGER_F_CRIT) or abs(
            r["f_stat"] - GRANGER_F_CRIT
        ) < 1e-5


def test_lsh_tuning_configs_are_nested(spark):
    """Refinement nesting: a pair colliding on an 8-perm band collides
    on both 4-perm halves, so candidates(2x8) <= candidates(4x4) <=
    candidates(8x2); the 4x4 row must equal the production
    minhash_lsh_candidates pair count; the analytic recall estimate
    rises with band count."""
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in QUERIES["lsh_band_tuning_curve"](spark, SF_DIR).collect()
    }
    assert set(rows) == {(2, 8), (4, 4), (8, 2)}
    assert (
        rows[(2, 8)]["n_candidate_pairs"]
        <= rows[(4, 4)]["n_candidate_pairs"]
        <= rows[(8, 2)]["n_candidate_pairs"]
    )
    assert (
        rows[(2, 8)]["est_recall_at_08"]
        < rows[(4, 4)]["est_recall_at_08"]
        < rows[(8, 2)]["est_recall_at_08"]
    )
    n_prod = QUERIES["minhash_lsh_candidates"](spark, SF_DIR).count()
    assert rows[(4, 4)]["n_candidate_pairs"] == n_prod


def test_stream_funnel_matches_batch_twin(spark):
    """The stateful streaming funnel must land on exactly the batch
    MIN-construction histogram (stream/batch unification)."""
    stream = {
        r["funnel_depth"]: r["n_users"]
        for r in QUERIES["stream_window_funnel"](spark, SF_DIR).collect()
    }
    batch = {
        r["funnel_depth"]: r["n_users"]
        for r in QUERIES["window_funnel_conversion"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_burstiness_bounded_and_consistent(spark):
    """B lives in (-1, 1), cv >= 0, and B == (cv-1)/(cv+1) up to
    readout rounding (algebraic identity of the two columns)."""
    rows = QUERIES["burstiness_interevent"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 < r["burstiness"] < 1.0
        assert r["cv"] >= 0.0
        want = (r["cv"] - 1.0) / (r["cv"] + 1.0)
        assert abs(r["burstiness"] - want) < 1e-4, r
        assert r["n_gaps"] >= 2 and r["mean_gap_s"] > 0


def test_isotonic_map_is_pava(spark):
    """The minimax construction must equal a reference PAVA run in
    plain Python: monotone non-decreasing, mass-preserving
    (sum n*iso == sum pos), and block-wise equal to the merge-stack
    solution."""
    rows = sorted(
        QUERIES["isotonic_calibration_map"](spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["isotonic_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone
    assert all(0.0 <= v <= 1.0 for v in iso)
    # reference PAVA (merge stack) on the same (n, pos) sequence
    stack = []  # (n, pos)
    for r in rows:
        stack.append((r["n_docs"], r["n_pos"]))
        while len(stack) >= 2:
            n2, p2 = stack[-1]
            n1, p1 = stack[-2]
            if p1 * n2 >= p2 * n1:  # rate1 >= rate2: violation, merge
                stack[-2:] = [(n1 + n2, p1 + p2)]
            else:
                break
    # expand block rates across their member bins
    expanded = []
    i = 0
    for n, p in stack:
        cnt = 0
        acc = 0
        while acc < n:
            acc += rows[i + cnt]["n_docs"]
            cnt += 1
        expanded.extend([p / n] * cnt)
        i += cnt
    assert len(expanded) == len(rows)
    for got, want in zip(iso, expanded):
        assert abs(got - round(want, 6)) < 1e-9
    # mass preservation
    mass = sum(r["n_docs"] * v for r, v in zip(rows, iso))
    assert abs(mass - sum(r["n_pos"] for r in rows)) < 1e-2 * len(rows)
