"""Oracle-independent validation of the remaining time-series and
distribution-fit statistics: per-device lag-1 autocorrelation, the
Wald-Wolfowitz runs test, Benford's first-digit audit, Mann-Kendall,
the negative-binomial moments fit, and the per-type OLS value trend.
Eleventh module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
ORDERS = f"{SF_DIR}/orders.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df.sort_values(["user_id", "ts", "event_id"])


def test_value_autocorr_matches_numpy(spark, ev):
    rows = {r.user_id: r for r in QUERIES["value_autocorr"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in ev.groupby("user_id"):
        v = sub.value.to_numpy()
        pv = np.r_[np.nan, v[:-1]]
        keep = ~np.isnan(pv)  # n_pairs counts rows with a lag present
        n_pairs = int(keep.sum())
        both = keep & ~np.isnan(v)
        rho = np.corrcoef(v[both], pv[both])[0, 1]
        r = rows[u]
        assert r.n_pairs == n_pairs, u
        assert abs(r.lag1_autocorr - rho) < 1e-5, u
        checked += 1
    assert checked >= 10


def test_runs_test_matches_literal_walk(spark, ev):
    rows = {r.user_id: r for r in QUERIES["runs_test_randomness"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in ev.groupby("user_id"):
        v = sub.value.dropna().to_numpy()
        vals = np.round(v * 100).astype(np.int64)  # DECIMAL(18,2) exact cents
        # lower weighted median over value cells: min v with 2*cum >= total
        cells = Counter(vals)
        tot = len(vals)
        cum = 0
        med = None
        for cell in sorted(cells):
            cum += cells[cell]
            if 2 * cum >= tot:
                med = cell
                break
        signs = [x > med for x in vals if x != med]
        if not signs:
            assert u not in rows
            continue
        n1 = sum(signs)
        n2 = len(signs) - n1
        runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
        if n1 == 0 or n2 == 0 or n1 + n2 <= 1:
            assert u not in rows
            continue
        mu = 1 + 2 * n1 * n2 / (n1 + n2)
        sig = math.sqrt(
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        r = rows[u]
        assert (r.n_above, r.n_below, r.r_runs) == (n1, n2, runs), u
        assert abs(r.expected_runs - mu) < 1e-9, u
        assert abs(r.z_score - (runs - mu) / sig) < 1e-9, u
        checked += 1
    assert checked >= 10


def test_benford_matches_first_digit_count(spark):
    o = pd.read_parquet(ORDERS)
    digits = Counter()
    for v in o.o_totalprice:
        m = next((ch for ch in str(v) if ch in "123456789"), None)
        assert m is not None
        digits[int(m)] += 1
    total = sum(digits.values())
    rows = {r.digit: r for r in QUERIES["benford_first_digit"](spark, SF_DIR).collect()}
    assert set(rows) == set(digits)
    for d, n in digits.items():
        r = rows[d]
        assert r.n_orders == n, d
        assert abs(r.observed_pct - n / total) < 1e-6, d
        assert abs(r.expected_pct - math.log10(1 + 1 / d)) < 1e-6, d


def test_mann_kendall_matches_pair_loop(spark, ev):
    daily = ev.assign(day=ev.ts.values.astype("datetime64[D]")).groupby("day").size()
    y = daily.sort_index().to_numpy().astype(np.int64)
    n = len(y)
    s = sum(
        int(np.sign(y[j] - y[i])) for i in range(n) for j in range(i + 1, n)
    )
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(y).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    row = QUERIES["mann_kendall_trend"](spark, SF_DIR).collect()[0]
    assert (row.s, row.n) == (s, n)
    assert abs(row.variance - var) < 1e-6
    assert abs(row.z - (s - cc) / math.sqrt(var)) < 1e-6


def test_negative_binomial_matches_moments(spark, ev):
    d = ev.assign(day=ev.ts.values.astype("datetime64[D]"))
    rows = {r.event_type: r for r in QUERIES["negative_binomial_fit"](spark, SF_DIR).collect()}
    for g, sub in d.groupby("event_type"):
        c = sub.groupby("day").size().to_numpy().astype(np.int64)
        n = len(c)
        mean = c.sum() / n
        var = (float((c**2).sum()) - float(c.sum()) ** 2 / n) / (n - 1)
        r = rows[g]
        assert r.n_days == n, g
        assert abs(r.mean_daily - mean) < 1e-6, g
        assert abs(r.var_daily - var) < 1e-6, g
        assert abs(r.nb_p - mean / var) < 1e-6, g
        if var > mean:
            assert abs(r.nb_r - mean * mean / (var - mean)) < 1e-5, g
        else:
            assert r.nb_r is None, g
        assert abs(r.dispersion_index - var / mean) < 1e-6, g


def test_regr_trend_matches_numpy_ols(spark, ev):
    d = ev[ev.value.notna()].copy()
    us = d.ts.values.astype("datetime64[us]").astype(np.int64)
    d["x"] = (us - 1704067200000000) / 86400000000.0
    rows = {r.event_type: r for r in QUERIES["regr_value_trend"](spark, SF_DIR).collect()}
    for g, sub in d.groupby("event_type"):
        x, yv = sub.x.to_numpy(), sub.value.to_numpy()
        slope, intercept = np.polyfit(x, yv, 1)
        r2 = np.corrcoef(x, yv)[0, 1] ** 2
        r = rows[g]
        assert r.n_points == len(x), g
        assert abs(r.slope_per_day - slope) < 1e-5, g
        assert abs(r.intercept - intercept) < 1e-4, g
        assert abs(r.r2 - r2) < 1e-6, g
