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
