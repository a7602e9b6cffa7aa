"""Oracle-independent validation of the seasonal/interval family:
classical additive decomposition, the Hyndman seasonal-strength
index, time-weighted averages, split-conformal intervals, and the
harmonic regression solve. Fifteenth module of the independence
campaign.

All at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


def _ha_int(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    df["epoch"] = df.ts.values.astype("datetime64[s]").astype(np.int64)
    return df


@pytest.fixture(scope="module")
def seasonal_cells(ev):
    """(hour_of_day -> (n, sum_d24, sum_d24sq)) from the zero-filled
    grid with the centered [-11, +12] moving window."""
    hr = ev.epoch // 3600
    c = Counter(hr)
    mn, mx = int(hr.min()), int(hr.max())
    cnt = np.array([c.get(h, 0) for h in range(mn, mx + 1)], dtype=np.int64)
    cells: dict[int, list[int]] = {}
    for i in range(len(cnt)):
        lo, hi = i - 11, i + 12
        if lo < 0 or hi >= len(cnt):
            continue  # n24 == 24 filter
        d24 = 24 * int(cnt[i]) - int(cnt[lo:hi + 1].sum())
        hod = (mn + i) % 24
        cell = cells.setdefault(hod, [0, 0, 0])
        cell[0] += 1
        cell[1] += d24
        cell[2] += d24 * d24
    return cells


def test_seasonal_decomposition_matches_naive(spark, seasonal_cells):
    rows = {r.hour_of_day: r for r in QUERIES["seasonal_decomposition_hourly"](spark, SF_DIR).collect()}
    assert set(rows) == set(seasonal_cells)
    for hod, (n, sd, sd2) in seasonal_cells.items():
        r = rows[hod]
        assert r.n_obs == n, hod
        assert abs(r.seasonal_index - sd / 24 / n) < 1e-6, hod
        std = math.sqrt(sd2 / 576 / n - (sd / 24 / n) ** 2)
        assert abs(r.residual_std - std) < 1e-6, hod


def test_seasonal_strength_matches_cells(spark, seasonal_cells):
    n_total = sum(c[0] for c in seasonal_cells.values())
    ss_rem = sum(c[2] - c[1] ** 2 / c[0] for c in seasonal_cells.values())
    sum_d = sum(c[1] for c in seasonal_cells.values())
    sum_d2 = sum(c[2] for c in seasonal_cells.values())
    ss_det = sum_d2 - sum_d**2 / n_total
    row = QUERIES["seasonal_strength_index"](spark, SF_DIR).collect()[0]
    assert row.n_obs == n_total
    assert abs(row.var_remainder - ss_rem / n_total / 576) < 1e-6
    assert abs(row.var_detrended - ss_det / n_total / 576) < 1e-6
    assert abs(row.seasonal_strength - max(0.0, 1 - ss_rem / ss_det)) < 1e-6


def test_time_weighted_avg_matches_interval_walk(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["us"] = d.ts.values.astype("datetime64[us]").astype(np.int64)
    rows = {r.user_id: r for r in QUERIES["time_weighted_avg"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["us", "event_id"])
        us = sub.us.to_numpy()
        v = sub.value.to_numpy()
        if len(us) < 2:
            assert u not in rows
            continue
        dts = np.diff(us)
        units = sum(_ha_int(float(v[i]) * int(dts[i]) / 10000.0) for i in range(len(dts)))
        total_dt = int(dts.sum())
        r = rows[u]
        assert r.n_intervals == len(dts), u
        assert r.total_dt_us == total_dt, u
        assert r.weighted_units == units, u
        assert abs(r.time_weighted_avg - units * 10000.0 / total_dt) < 1e-9, u
        checked += 1
    assert checked >= 10


def test_conformal_matches_literal_split(spark, ev):
    from iot_etl_spark.plans.queries_analytics4 import CONFORMAL_FOLDS

    d = ev.copy()
    d["vq"] = np.where(
        d.value.notna(),
        np.sign(d.value.fillna(0)) * np.floor(np.abs(d.value.fillna(0)) * 1e6 + 0.5),
        np.nan,
    )
    d["fold"] = [
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % CONFORMAL_FOLDS
        for u in d.user_id
    ]
    rows = {r.event_type: r for r in QUERIES["conformal_prediction_interval"](spark, SF_DIR).collect()}
    for g, sub in d.groupby("event_type"):
        train = sub[sub.fold <= 2]
        # engine: SUM(vq)/COUNT(*) — COUNT includes NULL-vq rows
        pred = np.nansum(train.vq) / len(train)
        calib = sub[sub.fold == 3]
        cal_cells = sorted(
            _ha_int(abs(x - pred)) for x in calib.vq if not np.isnan(x)
        ) + [None] * int(calib.vq.isna().sum())
        # NULL nonconformity scores: |NULL - pred| is NULL; the cell
        # groups still count rows? CASE: round(NULL) -> NULL cell;
        # engine counts them in n_calib (COUNT(*)) but their cell is
        # NULL and sorts last in the cumulative
        n_calib = len(calib)
        k = math.ceil((n_calib + 1) * 0.9)
        cum = 0
        q = None
        for cell in [c for c in cal_cells if c is not None]:
            cum += 1
            if cum >= k:
                q = cell
                break
        if q is None:
            # quantile falls into the NULL tail: engine emits no row
            assert g not in rows or rows[g] is None
            continue
        test = sub[sub.fold == 4]
        tv = test.vq.to_numpy()
        covered = sum(
            1 for x in tv if not np.isnan(x) and _ha_int(abs(x - pred)) <= q
        )
        r = rows[g]
        assert r.n_calib == n_calib, g
        assert r.n_test == len(test), g
        assert abs(r.interval_radius - q / 1e6) < 1e-6, g
        assert abs(r.coverage - covered / len(test)) < 1e-6, g


def test_harmonic_regression_matches_numpy_solve(spark, ev):
    h = ev.ts.dt.hour.to_numpy()
    fc = np.array([_ha_int(math.cos(2 * math.pi * x / 24) * 1e6) for x in h], dtype=np.float64)
    fs = np.array([_ha_int(math.sin(2 * math.pi * x / 24) * 1e6) for x in h], dtype=np.float64)
    vq = np.where(
        ev.value.notna(),
        np.sign(ev.value.fillna(0)) * np.floor(np.abs(ev.value.fillna(0)) * 1e6 + 0.5),
        np.nan,
    )
    n = float(len(h))
    nn = ~np.isnan(vq)
    s1, s2 = fc.sum() / 1e6, fs.sum() / 1e6
    s11, s12, s22 = (fc * fc).sum() / 1e12, (fc * fs).sum() / 1e12, (fs * fs).sum() / 1e12
    sy = vq[nn].sum()
    s1y, s2y = (fc[nn] * vq[nn]).sum() / 1e6, (fs[nn] * vq[nn]).sum() / 1e6
    syy = (vq[nn] * vq[nn]).sum()
    A = np.array([[n, s1, s2], [s1, s11, s12], [s2, s12, s22]])
    b = np.array([sy, s1y, s2y])
    b0, b1, b2 = np.linalg.solve(A, b)
    sse = syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y) + (
        b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22
        + 2 * (b0 * b1 * s1 + b0 * b2 * s2 + b1 * b2 * s12)
    )
    sst = syy - sy * sy / n
    row = QUERIES["harmonic_regression_daily"](spark, SF_DIR).collect()[0]
    assert row.n_rows == int(n)
    assert abs(row.beta_level - b0 / 1e6) < 1e-5
    assert abs(row.beta_cos - b1 / 1e6) < 1e-5
    assert abs(row.beta_sin - b2 / 1e6) < 1e-5
    assert abs(row.amplitude - math.hypot(b1, b2) / 1e6) < 1e-5
    assert abs(row.r2 - (1 - sse / sst)) < 1e-5
