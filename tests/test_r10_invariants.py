"""Semantic invariants for the round-10 batch — properties the
oracle-equality gate can't see (it would be equally green if both
engines computed the same wrong thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.plans import QUERIES
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_kendall_day_cap_is_inactive_at_current_data(spark):
    """VERDICT r9 item 4: the O(days^2) pair expansion is now bounded
    IN CODE to the most recent _KENDALL_DAY_CAP days per device. At
    the current ~90-day test calendar the cap must be inactive — the
    capped default equals a run with the cap effectively removed —
    and the cap must actually bind the pair count."""
    from iot_etl_spark.plans.queries_analytics6 import (
        _KENDALL_DAY_CAP,
        kendall_trend_per_device,
    )

    capped = kendall_trend_per_device(spark, SF_DIR).collect()
    uncapped = kendall_trend_per_device(
        spark, SF_DIR, _day_cap=10**9
    ).collect()
    key = lambda r: r.user_id  # noqa: E731
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    # the guard is real: no device contributes more days than the cap,
    # so the per-device expansion is <= cap*(cap-1)/2 pairs by algebra
    for r in capped:
        assert r.n_days <= _KENDALL_DAY_CAP
        assert (
            r.concordant + r.discordant
            <= _KENDALL_DAY_CAP * (_KENDALL_DAY_CAP - 1) // 2
        )


def test_kendall_day_cap_binds_on_long_history(spark, tmp_path):
    """With a synthetic multi-year history the cap must truncate to
    exactly _KENDALL_DAY_CAP most-recent days — the bound is code,
    not a calendar assumption."""
    import os

    from iot_etl_spark.plans.queries_analytics6 import (
        _KENDALL_DAY_CAP,
        kendall_trend_per_device,
    )

    sf = str(tmp_path / "sf_long")
    os.makedirs(sf)
    n_days = _KENDALL_DAY_CAP + 77
    rows = spark.range(n_days).selectExpr(
        "CAST(1 AS LONG) AS user_id",
        "timestampadd(DAY, CAST(id AS INT), TIMESTAMP'2020-01-01 00:00:00')"
        " AS ts",
        "CAST(id AS DOUBLE) / 10 AS value",
        "id AS event_id",
        "'reading' AS event_type",
    )
    rows.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = kendall_trend_per_device(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == _KENDALL_DAY_CAP  # truncated, not n_days
    # strictly increasing values -> all retained pairs concordant
    expect_pairs = _KENDALL_DAY_CAP * (_KENDALL_DAY_CAP - 1) // 2
    assert r.concordant == expect_pairs and r.discordant == 0
    assert r.tau_b == 1.0


def test_power_iteration_accumulators_are_decimal(spark):
    """VERDICT r9 item 5: the matvec accumulators must run in
    DECIMAL(38,0) (oracle HUGEINT) — BIGINT sums would wrap near sf1.
    The localCheckpoint per round hides the aggregate types from the
    final plan, so the tripwire is source-level: both matvec sums and
    the renormalization must cast to DECIMAL(38,0) before
    accumulating/scaling. Output invariants re-pinned alongside."""
    import inspect

    from iot_etl_spark.plans import queries_analytics6 as m

    src = inspect.getsource(m.embedding_top_pc_power_iteration)
    assert src.count("CAST(eq AS DECIMAL(38,0))") == 2  # both matvecs
    assert "CAST(yq AS DECIMAL(38,0))" in src  # renormalization
    oracle = m._pca_oracle()
    assert oracle.count("CAST(eq AS HUGEINT)") == 2 * m.PCA_ITERS
    assert oracle.count("CAST(yq AS HUGEINT)") == m.PCA_ITERS

    rows = QUERIES["embedding_top_pc_power_iteration"](spark, SF_DIR).collect()
    assert rows and all(abs(r.vq_lattice) <= 10_000 for r in rows)
    # the largest |loading| is +1.0 after sign canonicalization
    assert max(r.loading for r in rows) == 1.0


def test_kruskal_wallis_tie_correction_and_rank_identity(spark):
    """The tie-corrected H must exceed raw H (ties exist, so the
    correction factor is < 1), and the rank accounting must be
    internally consistent: group sizes sum to N and the weighted mean
    of the per-group mean ranks equals the global mean rank (N+1)/2 —
    the identity a broken prefix-sum rank construction breaks first."""
    rows = QUERIES["kruskal_wallis_value_by_type"](spark, SF_DIR).collect()
    assert len(rows) == 5
    n = rows[0].n_total
    assert sum(r.n_group for r in rows) == n
    wmean = sum(r.mean_rank * r.n_group for r in rows) / n
    assert abs(wmean - (n + 1) / 2) < 1e-6
    assert all(r.h_tie_corrected >= r.h_stat for r in rows)
    assert all(r.h_stat >= 0 for r in rows)


def test_durbin_watson_bounds(spark):
    """DW lives in [0, 4] by construction (num <= 4*den via
    Cauchy-Schwarz); a value outside means the moment assembly or the
    lag window is wrong."""
    rows = QUERIES["durbin_watson_per_device"](spark, SF_DIR).collect()
    assert rows
    assert all(0.0 <= r.dw_stat <= 4.0 for r in rows)


def test_croston_components_positive_and_bounded(spark):
    """Size EWMA is a convex combination of positive demands; the
    interval EWMA of day gaps is >= 1 (demand days are distinct days);
    the forecast is their ratio."""
    rows = QUERIES["croston_intermittent_demand"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.size_ewma > 0
        assert r.interval_ewma >= 1.0
        assert abs(r.croston_forecast - round(r.size_ewma / r.interval_ewma, 6)) < 2e-6


def test_priority_sample_exact_size_and_ht_bounds(spark):
    """Priority sampling must return EXACTLY K rows per stratum (its
    selling point over hash-threshold PPS), and the Horvitz-Thompson
    estimate must be >= the sample's own weight sum (every term is
    max(w, tau) >= w)."""
    from iot_etl_spark.plans.queries_analytics7 import PRIORITY_K

    rows = QUERIES["priority_sample_per_type"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for t, rs in by_type.items():
        assert len(rs) == PRIORITY_K, t
        assert sorted(r.rn for r in rs) == list(range(1, PRIORITY_K + 1))
        est = rs[0].ht_total_estimate
        assert all(r.ht_total_estimate == est for r in rs)
        assert est >= sum(r.value for r in rs) - 1e-6


def test_stream_two_level_agg_hour_cascade(spark):
    """n_hours must count non-empty HOURS (1..24 per day), strictly
    fewer than n_events somewhere (events share hours), proving the
    day level aggregated hour rows rather than raw events."""
    rows = QUERIES["stream_two_level_agg"](spark, SF_DIR).collect()
    assert rows
    assert all(1 <= r.n_hours <= 24 for r in rows)
    assert all(r.n_hours <= r.n_events for r in rows)
    assert any(r.n_hours < r.n_events for r in rows)


def test_silhouette_bounds_and_consistency(spark):
    """Silhouette scores live in [-1, 1]; the per-label mean respects
    that; intra/nearest distances are positive; and labels with good
    separation (mean_nearest >> mean_intra) must score positive."""
    rows = QUERIES["silhouette_by_label"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert 0.0 <= r.frac_negative <= 1.0
        assert r.mean_intra_dist > 0 and r.mean_nearest_dist > 0
        if r.mean_nearest_dist > 2 * r.mean_intra_dist:
            assert r.mean_silhouette > 0


def test_capture_recapture_set_algebra(spark):
    """The overlap cannot exceed either capture list; Chapman's
    estimate is >= both list sizes (a capture can't see more than the
    population) minus rounding; coverage estimates live in (0, 1]."""
    r = QUERIES["capture_recapture_dedup"](spark, SF_DIR).collect()[0]
    assert r.n_overlap <= min(r.n_minhash_pairs, r.n_simhash_pairs)
    assert r.chapman_total_est >= max(r.n_minhash_pairs, r.n_simhash_pairs) - 1
    assert 0 < r.minhash_coverage_est <= 1.0 + 1e-9
    assert 0 < r.simhash_coverage_est <= 1.0 + 1e-9


def test_int8_recall_bounds(spark):
    """Recall@K lives in [0, 1] with n_kept <= K; symmetric int8 on
    64-dim floats should not collapse retrieval (recall stays well
    above chance: K/n ~ 0.02)."""
    from iot_etl_spark.plans.queries_embed import INT8_RECALL_K

    rows = QUERIES["int8_recall_audit"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_kept <= INT8_RECALL_K
        assert abs(r.recall_at_k - r.n_kept / INT8_RECALL_K) < 1e-9
    assert sum(r.recall_at_k for r in rows) / len(rows) > 0.5


def test_stream_dedup_then_agg_collapses_duplicates(spark):
    """The chained dedup is load-bearing: the doubled input stream
    must collapse to the single-copy batch counts over the emitted
    (watermark-closed) hour windows."""
    from iot_etl_spark.plans.queries_stream import DEDUP_AGG_WM_S

    rows = QUERIES["stream_dedup_then_agg"](spark, SF_DIR).collect()
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    mx = ev.agg(F.max("ts").alias("mx")).collect()[0]["mx"]
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(
            F.col("hr") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(mx) - F.expr(f"INTERVAL {DEDUP_AGG_WM_S} SECONDS")
        )
        .agg(F.sum("n").alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r.n_events for r in rows) == batch  # 2x input, 1x output


def test_incremental_refresh_covers_the_stale_window(spark):
    """The refresh must fill the days the stale build never saw: the
    stored table's newest bucket equals the newest event hour, and a
    second call reuses the committed table (idempotent marker)."""
    df1 = QUERIES["hourly_agg_incremental_refresh"](spark, SF_DIR)
    mx_bucket = df1.agg(F.max("bucket_epoch").alias("m")).collect()[0]["m"]
    ev = load_table(spark, SF_DIR, "events")
    mx_event_hour = (
        ev.agg(
            F.max(F.unix_timestamp(F.date_trunc("hour", "ts"))).alias("m")
        ).collect()[0]["m"]
    )
    assert mx_bucket == mx_event_hour  # stale build alone stops 3 days short
    n1 = df1.count()
    n2 = QUERIES["hourly_agg_incremental_refresh"](spark, SF_DIR).count()
    assert n1 == n2


def test_stream_join_then_agg_day_grid_and_positive(spark):
    """Chained join->agg: every emitted day aligns to the epoch day
    grid, counts are positive, and the rolled-up pair total matches
    the batch interval join restricted to the same cut window."""
    from iot_etl_spark.plans.queries_stream import (
        ATTRIBUTION_WINDOW_S,
        JOIN_AGG_CUT_S,
    )

    rows = QUERIES["stream_join_then_agg"](spark, SF_DIR).collect()
    assert rows
    assert all(r.day_epoch % 86400 == 0 for r in rows)
    assert all(r.n_pairs >= 1 for r in rows)
    ev = load_table(spark, SF_DIR, "events")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    batch = (
        p.join(c, (p.user_id == F.col("cu"))
               & (F.col("cts") <= F.col("pts"))
               & (F.col("cts") >= F.col("pts")
                  - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")))
        .filter(
            F.date_trunc("day", "pts") + F.expr("INTERVAL 1 DAY")
            <= F.lit(mx) - F.expr(f"INTERVAL {JOIN_AGG_CUT_S} SECONDS")
        )
        .count()
    )
    assert sum(r.n_pairs for r in rows) == batch
