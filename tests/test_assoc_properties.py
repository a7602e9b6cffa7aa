"""Oracle-independent validation of the association/effect-size and
sequential-decision statistics: Cramér's V, mutual information,
WOE/IV, the UCB1 bandit replay (literal day-by-day fold), and the
Theil-Sen trailing robust slope (literal pairwise-slope loop).
Fourteenth module of the independence campaign.

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
    return df


def test_cramers_v_matches_contingency(spark, ev):
    dow = ev.ts.dt.dayofweek  # encoding differs from Spark's, but the
    cells = Counter(zip(ev.event_type, dow))  # cell SET is identical
    rt: Counter = Counter()
    ct: Counter = Counter()
    for (t, d), o in cells.items():
        rt[t] += o
        ct[d] += o
    n = sum(cells.values())
    chi2 = sum(
        (o - rt[t] * ct[d] / n) ** 2 / (rt[t] * ct[d] / n)
        for (t, d), o in cells.items()
    )
    r_, c_ = len(rt), len(ct)
    v = math.sqrt(chi2 / (n * (min(r_, c_) - 1)))
    row = QUERIES["cramers_v_type_dow"](spark, SF_DIR).collect()[0]
    assert (row.r, row.c, row.n_total) == (r_, c_, n)
    assert abs(row.chi2 - chi2) < 1e-4
    assert abs(row.cramers_v - v) < 1e-6


def test_mutual_info_matches_cell_sum(spark, ev):
    hr = ev.ts.dt.hour
    cells = Counter(zip(ev.event_type, hr))
    rt: Counter = Counter()
    ct: Counter = Counter()
    for (t, h), o in cells.items():
        rt[t] += o
        ct[h] += o
    n = sum(cells.values())
    rows = {r.event_type: r for r in QUERIES["mutual_info_type_hour"](spark, SF_DIR).collect()}
    for t in rt:
        nano = sum(
            _ha_int((o / n) * math.log2(o * n / (rt[t] * ct[h])) * 1e9)
            for (tt, h), o in cells.items()
            if tt == t
        )
        r = rows[t]
        assert r.n_rows == rt[t], t
        assert abs(r.mi_bits_contrib - nano / 1e9) < 1e-6, t


def test_woe_iv_matches_direct(spark, ev):
    we = ev.ts.dt.dayofweek.isin([5, 6])
    bins = ev.assign(we=we).groupby("event_type").we.agg(ce="sum", n="size")
    bins["cw"] = bins.n - bins.ce
    tw, te = int(bins.cw.sum()), int(bins.ce.sum())
    rows = {r.event_type: r for r in QUERIES["woe_iv_event_weekend"](spark, SF_DIR).collect()}
    total_nano = sum(
        _ha_int(
            ((r.ce / te) - (r.cw / tw)) * math.log((r.ce / te) / (r.cw / tw)) * 1e9
        )
        for _, r in bins.iterrows()
        if r.ce > 0 and r.cw > 0
    )
    for t, b in bins.iterrows():
        if b.ce == 0 or b.cw == 0:
            assert t not in rows
            continue
        woe = math.log((b.ce / te) / (b.cw / tw))
        iv = ((b.ce / te) - (b.cw / tw)) * woe
        r = rows[t]
        assert (r.n_weekday, r.n_weekend) == (b.cw, b.ce), t
        assert abs(r.woe - woe) < 1e-6, t
        assert abs(r.iv_term - iv) < 1e-6, t
        assert abs(r.total_iv - total_nano / 1e9) < 1e-6, t


def test_ucb1_matches_literal_replay(spark, ev):
    d = ev.assign(
        day=ev.ts.values.astype("datetime64[D]"),
        arm=[int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 3 for u in ev.user_id],
        is_p=ev.event_type == "purchase",
    )
    daily: dict[object, list[int]] = {}
    for (day, arm), sub in d.groupby(["day", "arm"]):
        actives = sub.user_id.nunique()
        purch = sub[sub.is_p].user_id.nunique()
        daily.setdefault(day, [0, 0, 0])[arm] = _ha_int(1e6 * purch / actives)
    days = sorted(daily)
    n = [0, 0, 0]
    s = [0, 0, 0]
    for t, day in enumerate(days, start=1):
        rw = daily[day]
        if t <= 3:
            pick = t - 1
        else:
            u = [
                _ha_int(
                    (s[i] / max(n[i], 1)
                     + 1e6 * math.sqrt(2 * math.log(max(t - 1, 1)) / max(n[i], 1)))
                    * 1000
                )
                for i in range(3)
            ]
            pick = 0 if (u[0] >= u[1] and u[0] >= u[2]) else (1 if u[1] >= u[2] else 2)
        n[pick] += 1
        s[pick] += rw[pick]
    rows = {r.arm: r for r in QUERIES["ucb1_bandit_replay"](spark, SF_DIR).collect()}
    for a in range(3):
        r = rows[a]
        assert r.n_picks == n[a], a
        assert abs(r.total_reward - s[a] / 1e6) < 1e-6, a
        assert abs(r.avg_reward - s[a] / max(n[a], 1) / 1e6) < 1e-6, a


def test_theilsen_matches_pair_loop(spark, ev):
    from iot_etl_spark.plans.queries_audit import THEIL_N

    d = ev.copy()
    d["t"] = d.ts.values.astype("datetime64[us]").astype(np.int64)
    rows = {r.user_id: r for r in QUERIES["theilsen_trend_recent"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        sub = sub.sort_values(["t", "event_id"], ascending=False).head(THEIL_N)
        sub = sub.sort_values(["t", "event_id"])
        pts = list(zip(sub.t, sub.event_id, sub.value))
        if len(pts) < 2:
            assert u not in rows
            continue
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (ta, _, va), (tb, _, vb) = pts[i], pts[j]
                if ta == tb:
                    continue
                s = (vb - va) / (tb - ta)  # NaN propagates for NULL values
                slopes.append(s)
        if not slopes:
            assert u not in rows
            continue
        # lower median with NULLs (NaN) sorting last, engine-style
        slopes.sort(key=lambda x: (math.isnan(x), x))
        med = slopes[(len(slopes) + 1) // 2 - 1]
        r = rows[u]
        assert r.n_points == len(pts), u
        assert r.n_slopes == len(slopes), u
        want = round(med, 6) + 0.0
        if math.isnan(want):
            assert r.theilsen_slope is None or math.isnan(r.theilsen_slope), u
        else:
            assert abs(r.theilsen_slope - want) < 1e-6, u
        checked += 1
    assert checked >= 10
