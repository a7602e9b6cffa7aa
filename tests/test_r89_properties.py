"""Oracle-INDEPENDENT validation of the round-8/9 statistics batch —
the same treatment tests/test_r10_properties.py gives the round-10
queries: each statistic re-derived from the raw parquet with naive
Python/numpy (sequential folds, literal pair loops, numpy least
squares) and compared to the engine output. Complements the existing
r8/r9 invariant tests, which check internal consistency but not the
value itself against an independent implementation.

All at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
ORDERS = f"{SF_DIR}/orders.parquet"


def _half_away(v, scale):
    """Spark/DuckDB ROUND semantics (HALF_UP, away from zero)."""
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5)


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


def test_gini_matches_numpy_sort(spark):
    o = pd.read_parquet(ORDERS)
    cents = _half_away(o.o_totalprice.to_numpy() * 100, 1).astype(np.int64)
    rev = np.sort(pd.Series(cents).groupby(o.o_custkey.to_numpy()).sum().to_numpy())
    n = len(rev)
    s = rev.sum()
    ranksum = (np.arange(1, n + 1, dtype=np.float64) * rev).sum()
    gini = (2.0 * ranksum - (n + 1) * s) / (n * float(s))
    row = QUERIES["gini_customer_revenue"](spark, SF_DIR).collect()[0]
    assert row.n_customers == n
    assert row.total_revenue_cents == s
    assert abs(row.gini - gini) < 1e-5


def test_kendall_matches_naive_pair_loop(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["day"] = d.ts.values.astype("datetime64[D]").astype("datetime64[s]").astype(np.int64)
    d["vu"] = _half_away(d.value.to_numpy() * 1e6, 1).astype(np.int64)
    rows = {r.user_id: r for r in QUERIES["kendall_trend_per_device"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        g = sub.groupby("day").agg(s=("vu", "sum"), c=("vu", "size")).sort_index()
        g = g.tail(128)  # the day cap keeps the most recent days
        s, c = g.s.to_numpy(), g.c.to_numpy()
        con = dis = n0 = 0
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                n0 += 1
                l, r = int(s[j]) * int(c[i]), int(s[i]) * int(c[j])
                con += l > r
                dis += l < r
        ties = n0 - con - dis
        if n0 <= ties:
            assert u not in rows
            continue
        tau = (con - dis) / np.sqrt(float(n0) * (n0 - ties))
        r = rows[u]
        assert (r.concordant, r.discordant, r.n_days) == (con, dis, len(s)), u
        assert abs(r.tau_b - tau) < 1e-5, u
        checked += 1
    assert checked >= 10


def test_page_hinkley_matches_sequential_fold(spark, ev):
    from iot_etl_spark.plans.queries_analytics5 import PH_DELTA_MICRO, PH_LAMBDA_MICRO

    d = ev[ev.value.notna()].copy()
    d["t"] = d.ts.values.astype("datetime64[us]").astype(np.int64)
    d["xu"] = _half_away(d.value.to_numpy() * 1e6, 1).astype(np.int64)
    rows = {r.user_id: r for r in QUERIES["page_hinkley_drift"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["t", "event_id"])
        xs = [int(x) for x in sub.xu]
        ts = [int(t) for t in sub.t]
        n, s_tot = len(xs), sum(xs)
        cum = 0
        runmin = None
        ph_max = 0
        first_alarm = None
        for rn, (x, t) in enumerate(zip(xs, ts), start=1):
            cum += x
            mt = n * cum - rn * s_tot - rn * n * PH_DELTA_MICRO
            runmin = mt if runmin is None else min(runmin, mt)
            ph = mt - runmin
            ph_max = max(ph_max, ph)
            if ph > n * PH_LAMBDA_MICRO and first_alarm is None:
                first_alarm = t // 1_000_000
        r = rows[u]
        assert r.n_obs == n, u
        assert abs(r.ph_stat - ph_max / (n * 1e6)) < 1e-5, u
        assert bool(r.drift_flag) == (ph_max > n * PH_LAMBDA_MICRO), u
        assert r.first_alarm_epoch == first_alarm, u
        checked += 1
    assert checked >= 10


def test_theil_u_matches_naive(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["h"] = d.ts.values.astype("datetime64[h]").astype("datetime64[s]").astype(np.int64)
    d["vu"] = _half_away(d.value.to_numpy() * 1e6, 1).astype(np.int64)
    rows = {r.event_type: r for r in QUERIES["theil_u_forecast_skill"](spark, SF_DIR).collect()}
    for g, sub in d.groupby("event_type"):
        agg = sub.groupby("h").vu.agg(["sum", "size"])
        m = {int(h): s / (c * 1e6) for h, (s, c) in agg.iterrows()}
        ss_n = ss_s = nh = 0
        for h, y in m.items():
            if (h - 3600) in m and (h - 86400) in m:
                en = int(_half_away(np.float64((y - m[h - 3600]) * 100), 1))
                es = int(_half_away(np.float64((y - m[h - 86400]) * 100), 1))
                ss_n += en * en
                ss_s += es * es
                nh += 1
        r = rows[g]
        assert (r.n_hours, r.ss_naive, r.ss_seasonal) == (nh, ss_n, ss_s), g
        assert abs(r.u2_seasonal_vs_naive - np.sqrt(ss_s / ss_n)) < 1e-5, g


def test_tukey_matches_direct_formula(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = _half_away(d.value.to_numpy() * 1e6, 1).astype(np.int64)
    g = d.groupby("event_type").vq.agg(["size", "sum", lambda x: (x.astype(object) ** 2).sum()])
    g.columns = ["n", "s", "ss"]
    N, k = int(g.n.sum()), len(g)
    w = (float(g.ss.sum()) - sum(float(s) ** 2 / n for s, n in zip(g.s, g.n))) / (N - k)
    rows = QUERIES["tukey_hsd_pairwise"](spark, SF_DIR).collect()
    types = sorted(g.index)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        na, sa = g.loc[r.type_a, "n"], float(g.loc[r.type_a, "s"])
        nb, sb = g.loc[r.type_b, "n"], float(g.loc[r.type_b, "s"])
        md = sa / na - sb / nb
        q = abs(md) / np.sqrt(w / 2 * (1.0 / na + 1.0 / nb))
        assert abs(r.mean_diff - md / 1e6) < 1e-5, (r.type_a, r.type_b)
        assert abs(r.q_stat - q) < 1e-4, (r.type_a, r.type_b)


def test_ljung_box_matches_naive(spark, ev):
    from iot_etl_spark.plans.queries_analytics5 import LB_CHI2_CRIT, LB_MAX_LAG

    d = ev.copy()
    d["h"] = d.ts.values.astype("datetime64[h]")
    d["vq"] = _half_away(d.value.to_numpy() * 1e6, 1)
    agg = d.groupby("h").vq.agg(["sum", "size"]).sort_index()
    y = (agg["sum"] / agg["size"] / 1e6).to_numpy()
    n = len(y)
    ybar = y.sum() / n
    c = y - ybar
    nums = [
        int(sum(int(_half_away(np.float64(c[i] * c[i + k] * 1e9), 1))
                for i in range(n - k)))
        for k in range(LB_MAX_LAG + 1)
    ]
    den = nums[0]
    tq = [
        int(_half_away(np.float64(nums[k]) * nums[k] / den / den / (n - k) * 1e12, 1))
        for k in range(1, LB_MAX_LAG + 1)
    ]
    q = n * (n + 2) * float(sum(tq)) / 1e12
    row = QUERIES["ljung_box_whitenoise"](spark, SF_DIR).collect()[0]
    assert row.n_hours == n
    assert abs(row.q_stat - q) < 1e-4
    assert bool(row.whitenoise_rejected) == (q > LB_CHI2_CRIT)


def test_granger_matches_numpy_lstsq(spark, ev):
    d = ev.copy()
    d["h"] = d.ts.values.astype("datetime64[h]").astype("datetime64[s]").astype(np.int64)
    c = d[d.event_type == "click"].groupby("h").size()
    p = d[d.event_type == "purchase"].groupby("h").size()
    hours = sorted(set(d.h))
    cs = {h: int(c.get(h, 0)) for h in hours}
    ps = {h: int(p.get(h, 0)) for h in hours}
    rows_in = [
        (cs[h], ps[h], cs[h - 3600], ps[h - 3600])
        for h in hours
        if (h - 3600) in cs
    ]
    cy = np.array([r[0] for r in rows_in], dtype=np.float64)
    py = np.array([r[1] for r in rows_in], dtype=np.float64)
    c1 = np.array([r[2] for r in rows_in], dtype=np.float64)
    p1 = np.array([r[3] for r in rows_in], dtype=np.float64)
    n = len(rows_in)

    def f_stat(y, y1, x1):
        one = np.ones_like(y)
        rss_r = (np.linalg.lstsq(np.c_[one, y1], y, rcond=None)[1])[0]
        rss_f = (np.linalg.lstsq(np.c_[one, y1, x1], y, rcond=None)[1])[0]
        return (rss_r - rss_f) / (rss_f / (n - 3))

    got = {r.direction: r for r in QUERIES["granger_lag1_causality"](spark, SF_DIR).collect()}
    assert got["click->purchase"].n_hours == n
    assert abs(got["click->purchase"].f_stat - f_stat(py, p1, c1)) < 1e-3
    assert abs(got["purchase->click"].f_stat - f_stat(cy, c1, p1)) < 1e-3


def test_burstiness_matches_naive(spark, ev):
    d = ev.copy()
    d["t"] = d.ts.values.astype("datetime64[us]").astype(np.int64)
    rows = {r.user_id: r for r in QUERIES["burstiness_interevent"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["t", "event_id"])
        t = sub.t.to_numpy()
        dt = (np.diff(t) // 10000).astype(np.int64)
        n, s = len(dt), int(dt.sum())
        if n < 2 or s <= 0:
            assert u not in rows
            continue
        mu = s / n
        sig = np.sqrt(float((dt.astype(object) ** 2).sum()) / n - mu * mu)
        r = rows[u]
        assert r.n_gaps == n, u
        assert abs(r.mean_gap_s - mu / 100) < 1e-5, u
        assert abs(r.cv - sig / mu) < 1e-5, u
        assert abs(r.burstiness - (sig - mu) / (sig + mu)) < 1e-5, u
        checked += 1
    assert checked >= 10
