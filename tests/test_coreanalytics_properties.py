"""Oracle-independent validation of the CORE reference-parity
analytics — the operators closest to the reference's own surface:
z-score anomaly flags, IQR Tukey fences, gap sessionization, winsorized
means, and the ordered funnel. Eighteenth module of the independence
campaign; these are the queries a reference user would port first, so
their naive-walk validation closes the loop on SURVEY §2's own rows.

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


def _pcont(sorted_vals: np.ndarray, q: float) -> float:
    """PERCENTILE_CONT linear interpolation."""
    n = len(sorted_vals)
    pos = q * (n - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_zscore_matches_naive(spark, ev):
    rows = {r.event_id: r for r in QUERIES["zscore_anomaly"](spark, SF_DIR).collect()}
    assert len(rows) == len(ev)
    checked = 0
    for u, sub in ev.groupby("user_id"):
        v = sub.value.to_numpy()
        nn = v[~np.isnan(v)]
        mn = nn.mean()
        sd = nn.std(ddof=1)
        for eid, x in zip(sub.event_id, v):
            r = rows[eid]
            if np.isnan(x):
                assert r.z_score is None, eid
                continue
            z = (x - mn) / sd if sd > 0 else 0.0
            assert abs(r.z_score - z) < 1e-5, eid
            assert bool(r.is_anomaly_zscore) == (abs(z) > 3.0), eid
            checked += 1
    assert checked > 500


def test_iqr_fences_match_percentile_cont(spark, ev):
    from iot_etl_spark.plans.queries_events import ANOMALY_IQR_MULTIPLIER

    rows = {r.event_id: r for r in QUERIES["iqr_anomaly"](spark, SF_DIR).collect()}
    for u, sub in ev.groupby("user_id"):
        nn = np.sort(sub.value.dropna().to_numpy())
        q1, q3 = _pcont(nn, 0.25), _pcont(nn, 0.75)
        lo = q1 - ANOMALY_IQR_MULTIPLIER * (q3 - q1)
        hi = q3 + ANOMALY_IQR_MULTIPLIER * (q3 - q1)
        for eid, x in zip(sub.event_id, sub.value):
            r = rows[eid]
            assert abs(r.lower_fence - lo) < 1e-5, eid
            assert abs(r.upper_fence - hi) < 1e-5, eid
            if not pd.isna(x):
                assert bool(r.is_anomaly_iqr) == bool(x < lo or x > hi), eid


def test_session_stats_match_gap_walk(spark, ev):
    from iot_etl_spark.plans.queries_events import SESSION_GAP_MINUTES

    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    d = ev.copy()
    d["us"] = d.ts.values.astype("datetime64[us]").astype(np.int64)
    rows = {
        (r.user_id, r.session_seq): r
        for r in QUERIES["session_stats"](spark, SF_DIR).collect()
    }
    n_sessions = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values("us")
        seq = 0
        cur: list = []
        sessions = []
        prev = None
        for us, val in zip(sub.us, sub.value):
            if prev is None or us - prev >= gap_us:
                if cur:
                    sessions.append(cur)
                cur = []
            cur.append((us, val))
            prev = us
        if cur:
            sessions.append(cur)
        for i, s in enumerate(sessions, start=1):
            r = rows[(u, i)]
            uss = [x for x, _ in s]
            vals = [v for _, v in s if not pd.isna(v)]
            assert r.n_events == len(s), (u, i)
            assert r.session_start_epoch == min(uss) // 1_000_000, (u, i)
            assert r.session_end_epoch == max(uss) // 1_000_000 + SESSION_GAP_MINUTES * 60, (u, i)
            if vals:
                assert abs(r.avg_value - sum(vals) / len(vals)) < 1e-5, (u, i)
            n_sessions += 1
    assert n_sessions == len(rows)


def test_winsorized_matches_clamp(spark, ev):
    d = ev[ev.value.notna()]
    rows = {r.event_type: r for r in QUERIES["winsorized_stats"](spark, SF_DIR).collect()}
    for g, sub in d.groupby("event_type"):
        v = np.sort(sub.value.to_numpy())
        p05, p95 = _pcont(v, 0.05), _pcont(v, 0.95)
        clamped = np.clip(sub.value.to_numpy(), p05, p95)
        r = rows[g]
        assert r.n_values == len(v), g
        assert r.n_capped_low == int((sub.value < p05).sum()), g
        assert r.n_capped_high == int((sub.value > p95).sum()), g
        assert abs(r.avg_raw - sub.value.mean()) < 1e-5, g
        assert abs(r.avg_winsorized - clamped.mean()) < 1e-5, g
        assert abs(r.p05 - p05) < 1e-5 and abs(r.p95 - p95) < 1e-5, g


def test_funnel_matches_ordered_walk(spark, ev):
    d = ev[ev.event_type.isin(["view", "click", "purchase"])]
    n_v = n_c = n_p = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values("ts")
        views = sub[sub.event_type == "view"]
        if views.empty:
            continue
        n_v += 1
        t1 = views.ts.min()
        clicks = sub[(sub.event_type == "click") & (sub.ts > t1)]
        if clicks.empty:
            continue
        n_c += 1
        t2 = clicks.ts.min()
        if not sub[(sub.event_type == "purchase") & (sub.ts > t2)].empty:
            n_p += 1
    row = QUERIES["funnel_conversion"](spark, SF_DIR).collect()[0]
    assert (row.n_view, row.n_view_click, row.n_full_funnel) == (n_v, n_c, n_p)
    assert abs(row.click_rate - n_c / n_v) < 1e-9
    assert abs(row.purchase_rate - n_p / n_c) < 1e-9
