"""Approximate (sketch-backed) twins of the exact profile queries —
the documented 100 TB path.

Exact DISTINCT and exact percentiles are correct but expensive at
scale: COUNT(DISTINCT x) plans an Expand + double aggregation (one
extra shuffle of every distinct value), exact PERCENTILE buffers each
group's values. The sketch versions are one-pass, fixed-memory,
mergeable partial aggregates — the shape that survives 1000 executors:

- ``approx_distinct_profile``: HyperLogLog++ (`approx_count_distinct`,
  default rsd 2.3%, tunable) in place of
  ``distinct_devices_per_type``'s exact Expand.
- ``approx_quantile_profile``: Greenwald-Khanna (`percentile_approx`,
  accuracy = 1/relative_error observations) in place of the exact
  ``F.percentile`` in the stats queries.

Estimates are implementation-specific, so these are deliberately NOT
DuckDB-oracle-gated (cross-engine hashes cannot match); correctness is
pinned by pytest against the EXACT operators with the algorithms'
published error bounds (see tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct_profile(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    rsd: float = 0.023,
) -> DataFrame:
    """HLL++ distinct users + active days per key group — the scale
    twin of distinct_devices_per_type (exact Expand aggregation)."""
    return events.groupBy(*keys).agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_distinct_devices"),
        F.approx_count_distinct(F.to_date("ts"), rsd).alias("approx_active_days"),
        F.count(F.lit(1)).alias("reading_count"),
    )


def approx_quantile_profile(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate p50/p95/p99 of value per key group
    (error <= 1/accuracy of rank) — the scale twin of the exact
    F.percentile aggregates."""
    return events.groupBy(*keys).agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("p50_value"),
        F.percentile_approx("value", F.lit(0.95), F.lit(accuracy)).alias("p95_value"),
        F.percentile_approx("value", F.lit(0.99), F.lit(accuracy)).alias("p99_value"),
    )
