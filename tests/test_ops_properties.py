"""Oracle-independent validation of the operational-analytics batch:
FIFO rank matching, the price-volume bridge, covariate-balance SMD,
process capability Cpk, and the SPRT sequential monitor. Sixteenth
module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
LINEITEM = f"{SF_DIR}/lineitem.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    df["epoch"] = df.ts.values.astype("datetime64[s]").astype(np.int64)
    return df


def test_fifo_matching_matches_queue_walk(spark, ev):
    rows = {r.user_id: r for r in QUERIES["fifo_click_purchase_match"](spark, SF_DIR).collect()}
    d = ev[ev.event_type.isin(["click", "purchase"])]
    assert set(rows) == set(d.user_id.unique())
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        clicks = sub[sub.event_type == "click"].epoch.tolist()
        purch = sub[sub.event_type == "purchase"].epoch.tolist()
        waits = [p - c for c, p in zip(clicks, purch)]
        r = rows[u]
        assert (r.n_clicks, r.n_purchases) == (len(clicks), len(purch)), u
        assert r.n_matched == len(waits), u
        if waits:
            assert r.n_causal_matches == sum(w >= 0 for w in waits), u
            assert abs(r.avg_wait_s - sum(waits) / len(waits)) < 1e-6, u
            assert r.max_wait_s == max(waits), u
        else:
            assert r.avg_wait_s is None and r.max_wait_s is None, u
        checked += 1
    assert checked >= 10


def test_price_volume_bridge_matches_decomposition(spark):
    from iot_etl_spark.plans.queries_analytics3 import PV_YEAR0, PV_YEAR1

    li = pd.read_parquet(LINEITEM)
    li["yr"] = pd.to_datetime(li.l_shipdate).dt.year
    li = li[li.yr.isin([PV_YEAR0, PV_YEAR1])]
    # exact cents: quantity and extendedprice are 2-decimal data
    li["rev"] = np.round(li.l_extendedprice * 100) * np.round(
        (1 - li.l_discount) * 100
    ) / 10000.0
    rows = {r.l_returnflag: r for r in QUERIES["price_volume_bridge"](spark, SF_DIR).collect()}
    for flag, sub in li.groupby("l_returnflag"):
        g = sub.groupby("yr").agg(q=("l_quantity", "sum"), rev=("rev", "sum"))
        if PV_YEAR0 not in g.index or PV_YEAR1 not in g.index:
            assert flag not in rows
            continue
        q0, q1 = g.q[PV_YEAR0], g.q[PV_YEAR1]
        r0, r1 = g.rev[PV_YEAR0], g.rev[PV_YEAR1]
        vol = (q1 - q0) * (r0 / q0)
        price = q1 * (r1 / q1 - r0 / q0)
        r = rows[flag]
        assert abs(r.revenue_y0 - round(r0, 2)) < 1e-6, flag
        assert abs(r.revenue_y1 - round(r1, 2)) < 1e-6, flag
        assert abs(r.volume_effect - vol) < 1e-3, flag
        assert abs(r.price_effect - price) < 1e-3, flag
        # the bridge must be EXACTLY additive
        assert abs((r.volume_effect + r.price_effect) - (r1 - r0)) < 1e-3, flag


def test_covariate_balance_matches_direct_smd(spark, ev):
    we = ev.ts.dt.dayofweek.isin([5, 6])
    cents = np.round(ev.value.fillna(0) * 100).astype(np.int64)
    per = pd.DataFrame({
        "user_id": ev.user_id, "we": we.astype(int), "cents": cents
    }).groupby("user_id").agg(
        n_events=("we", "size"), n_weekend=("we", "sum"), cents=("cents", "sum")
    )
    per["sum_value"] = per.cents / 100.0
    per["arm"] = [
        int(hashlib.md5(str(u).encode()).hexdigest()[8:16], 16) % 2
        for u in per.index
    ]
    rows = {r.covariate: r for r in QUERIES["covariate_balance_smd"](spark, SF_DIR).collect()}
    for cov in ("n_events", "n_weekend", "sum_value"):
        x0 = per[per.arm == 0][cov].to_numpy(dtype=np.float64)
        x1 = per[per.arm == 1][cov].to_numpy(dtype=np.float64)
        m0, m1 = x0.mean(), x1.mean()
        v0 = x0.var(ddof=1)
        v1 = x1.var(ddof=1)
        smd = (m1 - m0) / math.sqrt((v0 + v1) / 2)
        r = rows[cov]
        assert (r.n_control, r.n_treatment) == (len(x0), len(x1)), cov
        assert abs(r.mean_control - m0) < 1e-6, cov
        assert abs(r.mean_treatment - m1) < 1e-6, cov
        assert abs(r.smd - smd) < 1e-6, cov


def test_cpk_matches_direct_formula(spark, ev):
    from iot_etl_spark.plans.queries_analytics3 import CPK_LSL, CPK_USL

    d = ev[ev.value.notna()]
    rows = {r.user_id: r for r in QUERIES["process_capability_cpk"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        cents = np.round(sub.value.to_numpy() * 100).astype(np.int64)
        n = len(cents)
        if n <= 1:
            assert u not in rows
            continue
        s = cents.sum() / 100.0
        q = float((cents.astype(object) ** 2).sum()) / 10000.0
        mu = s / n
        sigma = math.sqrt((n * q - s * s) / (n * (n - 1.0)))
        cpk = min(CPK_USL - mu, mu - CPK_LSL) / (3 * sigma)
        oos = int(((sub.value < CPK_LSL) | (sub.value > CPK_USL)).sum())
        r = rows[u]
        assert (r.n_readings, r.n_out_of_spec) == (n, oos), u
        assert abs(r.mean_value - mu) < 1e-9, u
        assert abs(r.stddev_value - sigma) < 1e-9, u
        assert abs(r.cpk - cpk) < 1e-9, u
        checked += 1
    assert checked >= 10


def test_sprt_matches_cumulative_walk(spark, ev):
    arm1 = {
        u for u in ev.user_id.unique()
        if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 1
    }
    d = ev[ev.user_id.isin(arm1)].copy()
    d["day"] = d.ts.values.astype("datetime64[D]")
    ls, lf = 0.22314355131420976, -0.06453852113757118
    up, lo = 2.9444389791664403, -2.9444389791664403
    rows = {r.day_epoch: r for r in QUERIES["sprt_sequential_monitor"](spark, SF_DIR).collect()}
    cum_t = cum_s = 0
    for day in sorted(d.day.unique()):
        sub = d[d.day == day]
        cum_t += sub.user_id.nunique()
        cum_s += sub[sub.event_type == "purchase"].user_id.nunique()
        llr = cum_s * ls + (cum_t - cum_s) * lf
        state = (
            "accept_h1" if llr >= up else ("accept_h0" if llr <= lo else "continue")
        )
        epoch = int(pd.Timestamp(day).timestamp())
        r = rows[epoch]
        assert (r.cum_trials, r.cum_succ) == (cum_t, cum_s), day
        assert abs(r.llr - llr) < 1e-6, day
        assert r.boundary_state == state, day
    assert len(rows) == d.day.nunique()
