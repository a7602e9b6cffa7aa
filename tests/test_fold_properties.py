"""Oracle-independent validation of the RECURSION-FLATTENING queries:
operators whose relational formulation replaces an inherently
sequential algorithm (a smoother fold, a PAVA merge stack, a Fourier
accumulation) are replayed here with the ACTUAL sequential algorithm
in plain Python and compared to the engine output. This is the
strongest check these queries can get — the DuckDB oracle mirrors the
same clever flattening, so only an independent *sequential*
implementation can catch a flaw in the flattening identity itself.

All at sf0.001.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


def test_holt_matches_sequential_fold(spark, ev):
    """The aggregate() fold vs a literal step-by-step Holt recursion
    (alpha = beta = 1/2; every step an exact IEEE halving, so the
    tolerance is rounding-only)."""
    rows = {r.user_id: r for r in QUERIES["holt_forecast_per_device"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        v = [float(x) for x in sub.value]  # NULLs stay NaN: none at sf0.001
        if len(v) < 2:
            assert u not in rows
            continue
        level, trend = v[1], v[1] - v[0]
        for x in v[2:]:
            new_level = x / 2 + (level + trend) / 2
            trend = (new_level - level) / 2 + trend / 2
            level = new_level
        r = rows[u]
        assert r.n_obs == len(v), u
        assert abs(r.level - level) < 1e-6, u
        assert abs(r.trend - trend) < 1e-6, u
        assert abs(r.forecast_next - (level + trend)) < 1e-6, u
        checked += 1
    assert checked >= 10


def test_isotonic_map_matches_real_pava(spark):
    """The relational minimax identity vs the actual pool-adjacent-
    violators merge stack, run on the engine's own bin frame."""
    rows = sorted(
        QUERIES["isotonic_calibration_map"](spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    assert len(rows) >= 3
    # classic weighted PAVA: pools of (weight, weighted-sum)
    pools: list[list[float]] = []  # [w, s]
    for r in rows:
        pools.append([float(r.n_docs), float(r.n_pos)])
        while len(pools) >= 2 and pools[-2][1] / pools[-2][0] >= pools[-1][1] / pools[-1][0]:
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    # expand pools back to per-bin values by re-walking the bins
    expanded = []
    it = iter(pools)
    cur_w, cur_s = next(it)
    used = 0.0
    for r in rows:
        if used >= cur_w:
            cur_w, cur_s = next(it)
            used = 0.0
        expanded.append(cur_s / cur_w)
        used += float(r.n_docs)
    for r, iso in zip(rows, expanded):
        assert abs(r.isotonic_rate - iso) < 1e-5, r.bin
    # and the result is monotone non-decreasing
    assert all(a.isotonic_rate <= b.isotonic_rate + 1e-9 for a, b in zip(rows, rows[1:]))


def test_dft_periodogram_matches_naive_fourier(spark, ev):
    from iot_etl_spark.plans.queries_analytics3 import DFT_PERIODS

    h = (
        ev.assign(hr=ev.ts.values.astype("datetime64[h]").astype(np.int64))
        .groupby("hr")
        .size()
        .sort_index()
    )
    hrs = h.index.to_numpy()
    cnt = h.to_numpy().astype(np.int64)
    n, tot, hr0 = len(cnt), int(cnt.sum()), int(hrs.min())
    rows = {r.period_hours: r for r in QUERIES["dft_periodogram"](spark, SF_DIR).collect()}
    for p in DFT_PERIODS:
        re = im = 0
        for hr, c in zip(hrs, cnt):
            t = int(hr) - hr0
            centered = c - tot / n
            for acc, fn in (("re", math.cos), ("im", math.sin)):
                term = centered * fn(2 * math.pi * t / p) * 1e9
                q = int(math.copysign(math.floor(abs(term) + 0.5), term))
                if acc == "re":
                    re += q
                else:
                    im += q
        power = ((re / 1e9) ** 2 + (im / 1e9) ** 2) / (float(n) * n)
        amp = 2 * math.sqrt((re / 1e9) ** 2 + (im / 1e9) ** 2) / n
        r = rows[p]
        assert r.n_hours == n
        assert abs(r.spec_power - power) < 1e-5, p
        assert abs(r.amplitude - amp) < 1e-5, p
