"""Oracle-INDEPENDENT validation of the distribution-shift / tail
statistics battery (rounds 4-7 registrations): naive numpy/pure-Python
reimplementation vs engine output, completing the coverage that
test_r89_properties.py and test_r10_properties.py give the newer
batches.

NULL discipline matters here and is replicated deliberately: several
queries scan `events` without a value filter, so NULL-value rows count
toward group sizes (ANOVA n, Welch nw/ne, the KS/MW totals) and sort
past every real value (DuckDB NULLS LAST == Spark NULLS LAST for ASC)
— a naive reimplementation that silently drops NULLs gets different
statistics, which is exactly the class of quiet divergence these
tests exist to catch.

All at sf0.001.
"""

from __future__ import annotations

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
    # Spark dayofweek: 1=Sunday; weekend = isin(1,7) == Sun/Sat
    df["we"] = df.ts.dt.dayofweek.isin([5, 6])  # pandas: Mon=0 .. Sun=6
    return df


def test_ks_weekend_matches_naive(spark, ev):
    rows = {r.event_type: r for r in QUERIES["ks_weekend_value"](spark, SF_DIR).collect()}
    for g, sub in ev.groupby("event_type"):
        nw = int((~sub.we).sum())  # NULL-value rows included in totals
        ne = int(sub.we.sum())
        nn = sub[sub.value.notna()]
        vals = np.sort(nn.value.unique())
        cumw = cume = 0
        d = 0
        for v in vals:
            m = nn.value == v
            cumw += int((m & ~nn.we).sum())
            cume += int((m & nn.we).sum())
            d = max(d, abs(cumw * ne - cume * nw))
        r = rows[g]
        assert (r.n_weekday, r.n_weekend) == (nw, ne), g
        assert abs(r.ks_d - d / (nw * ne)) < 1e-5, g


def test_mannwhitney_weekend_matches_naive(spark, ev):
    rows = {r.event_type: r for r in QUERIES["mannwhitney_weekend_value"](spark, SF_DIR).collect()}
    for g, sub in ev.groupby("event_type"):
        # NULL values form the top tie group (NULLS LAST)
        key = sub.value.where(sub.value.notna(), np.inf)
        nw = int((~sub.we).sum())
        ne = int(sub.we.sum())
        n = nw + ne
        u2 = 0
        tsum = 0
        cumw = 0
        for v in np.sort(pd.unique(key)):
            m = key == v
            cw = int((m & ~sub.we).sum())
            ce = int((m & sub.we).sum())
            cumw += cw
            u2 += ce * (2 * cumw - cw)
            t = cw + ce
            tsum += t * t * t - t
        z = (u2 - float(nw) * ne) / (
            2 * np.sqrt(float(nw) * ne / 12 * ((n + 1) - tsum / (float(n) * (n - 1))))
        )
        r = rows[g]
        assert (r.n_weekday, r.n_weekend, r.u2_weekend) == (nw, ne, u2), g
        assert abs(r.z_approx - z) < 1e-5, g


def test_welch_matches_naive(spark, ev):
    rows = {r.event_type: r for r in QUERIES["welch_ttest_value"](spark, SF_DIR).collect()}
    for g, sub in ev.groupby("event_type"):
        nw = int((~sub.we).sum())  # counts include NULL-value rows
        ne = int(sub.we.sum())
        vw_ = sub[~sub.we].value.dropna().to_numpy()
        ve_ = sub[sub.we].value.dropna().to_numpy()
        dsw, dse = vw_.sum(), ve_.sum()
        dqw, dqe = (vw_**2).sum(), (ve_**2).sum()
        vw = (dqw - dsw * dsw / nw) / (nw - 1)
        vv = (dqe - dse * dse / ne) / (ne - 1)
        t = (dsw / nw - dse / ne) / np.sqrt(vw / nw + vv / ne)
        df = (vw / nw + vv / ne) ** 2 / (
            (vw / nw) ** 2 / (nw - 1) + (vv / ne) ** 2 / (ne - 1)
        )
        r = rows[g]
        assert (r.n_weekday, r.n_weekend) == (nw, ne), g
        assert abs(r.mean_weekday - dsw / nw) < 1e-4, g
        assert abs(r.mean_weekend - dse / ne) < 1e-4, g
        assert abs(r.t_stat - t) < 1e-4, g
        assert abs(r.df_approx - df) < df * 1e-5, g


def test_anova_matches_naive(spark, ev):
    # n counts ALL rows per type (NULL vq excluded only from sums)
    vq = np.where(
        ev.value.notna(),
        np.sign(ev.value.fillna(0)) * np.floor(np.abs(ev.value.fillna(0)) * 1e6 + 0.5),
        np.nan,
    )
    d = pd.DataFrame({"g": ev.event_type, "vq": vq})
    n = d.groupby("g").size()
    s = d.groupby("g").vq.sum()
    ss = d.groupby("g").vq.apply(lambda x: float((x.dropna() ** 2).sum()))
    k, N = len(n), int(n.sum())
    btw = float(sum(s[g] ** 2 / n[g] for g in n.index)) - float(s.sum()) ** 2 / N
    win = float(ss.sum()) - float(sum(s[g] ** 2 / n[g] for g in n.index))
    f = (btw / (k - 1)) / (win / (N - k))
    row = QUERIES["anova_oneway_value"](spark, SF_DIR).collect()[0]
    assert (row.k, row.n_total) == (k, N)
    assert abs(row.f_stat - f) < 1e-4
    assert abs(row.eta_squared - btw / (btw + win)) < 1e-6


def test_spearman_matches_scipy_free_ranks(spark, ev):
    d = ev[ev.value.notna()].copy()
    rows = {r.user_id: r for r in QUERIES["spearman_value_time"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        v = sub.value.to_numpy()
        rt = np.arange(1, len(v) + 1, dtype=np.float64)
        rv = pd.Series(v).rank(method="average").to_numpy()
        rho = np.corrcoef(rv, rt)[0, 1]
        r = rows[u]
        assert r.n_events == len(v), u
        assert abs(r.spearman_rho - rho) < 1e-5, u
        checked += 1
    assert checked >= 10


def test_hill_matches_naive(spark, ev):
    from iot_etl_spark.plans.queries_audit import HILL_K

    cnt = ev.groupby("user_id").size().reset_index(name="c")
    top = cnt.sort_values(["c", "user_id"], ascending=[False, True]).head(HILL_K + 1)
    xs = top.c.to_numpy()
    xk1 = int(xs[HILL_K])
    nano = sum(
        int(np.sign(t) * np.floor(abs(t) + 0.5))
        for t in (np.log(xs[:HILL_K] / xk1) * 1e9)
    )
    h = nano / 1e9 / HILL_K
    row = QUERIES["hill_tail_index"](spark, SF_DIR).collect()[0]
    assert row.x_kplus1 == xk1
    assert abs(row.hill_h - h) < 1e-6
    assert abs(row.tail_alpha - 1.0 / h) < 1e-4
