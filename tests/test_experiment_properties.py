"""Oracle-independent validation of the experimentation/attribution
family: Shapley channel values via a literal coalition enumeration,
linear multi-touch attribution via a per-user segment walk, CUPED via
direct theta/adjustment algebra, and the SRM chi-square. Twelfth
module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

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
    return df.sort_values(["user_id", "ts", "event_id"])


def test_shapley_matches_coalition_enumeration(spark, ev):
    """Literal Shapley: enumerate all 3! orderings' marginal
    contributions over the coalition conversion-rate function."""
    per = ev.groupby("user_id").event_type.agg(set)
    chans = ("click", "signup", "view")
    cells: Counter = Counter()
    convs: Counter = Counter()
    for types in per:
        key = tuple(c in types for c in chans)
        cells[key] += 1
        convs[key] += "purchase" in types

    def rate(coal: frozenset) -> float:
        key = tuple(c in coal for c in chans)
        return convs[key] / cells[key] if cells[key] else 0.0

    rows = {r.channel: r.shapley for r in QUERIES["shapley_channel_attribution"](spark, SF_DIR).collect()}
    n = len(chans)
    for i in chans:
        others = [c for c in chans if c != i]
        phi = 0.0
        for k in range(n):
            for s in combinations(others, k):
                w = math.factorial(k) * math.factorial(n - k - 1) / math.factorial(n)
                phi += w * (rate(frozenset(s) | {i}) - rate(frozenset(s)))
        assert abs(rows[i] - phi) < 1e-6, i


def test_linear_attribution_matches_segment_walk(spark, ev):
    got = {
        (r.touch_type, r.segment_size): r
        for r in QUERIES["linear_attribution"](spark, SF_DIR).collect()
    }
    want: Counter = Counter()
    for _, sub in ev.groupby("user_id"):
        types = sub.event_type.tolist()
        n_conv = types.count("purchase")
        # per (user, conv_seq) segment sizes
        seg: dict = defaultdict(list)
        conv_seq = 0
        for t in types:
            if t == "purchase":
                conv_seq += 1
            elif conv_seq < n_conv:
                seg[conv_seq].append(t)
        for touches in seg.values():
            k = len(touches)
            for t in touches:
                want[(t, k)] += 1
    assert set(got) == set(want)
    for key, n in want.items():
        r = got[key]
        assert r.n_touches == n, key
        assert abs(r.attributed_conversions - n / key[1]) < 1e-6, key


def _arm(user_id: int, offset: int, mod: int) -> int:
    h = hashlib.md5(str(user_id).encode()).hexdigest()
    return int(h[offset:offset + 8], 16) % mod


def test_cuped_matches_direct_algebra(spark, ev):
    from iot_etl_spark.plans.queries_audit import CUPED_SPLIT_DAYS

    t0 = ev.ts.min()
    split = t0 + pd.Timedelta(days=CUPED_SPLIT_DAYS)
    cents = np.round(ev.value.fillna(0) * 100).astype(np.int64)
    cents[ev.value.isna()] = 0
    d = pd.DataFrame({
        "user_id": ev.user_id,
        "x": np.where(ev.ts < split, cents, 0),
        "y": np.where(ev.ts >= split, cents, 0),
    })
    per = d.groupby("user_id").agg(x=("x", "sum"), y=("y", "sum")) / 100.0
    per["arm"] = [_arm(u, 8, 2) for u in per.index]
    n_all = len(per)
    dsx, dsy = per.x.sum(), per.y.sum()
    dsxx, dsxy = (per.x**2).sum(), (per.x * per.y).sum()
    theta = (dsxy - dsx * dsy / n_all) / (dsxx - dsx**2 / n_all)
    rows = {r.arm: r for r in QUERIES["cuped_experiment_readout"](spark, SF_DIR).collect()}
    for arm, sub in per.groupby("arm"):
        r = rows[arm]
        assert r.n_users == len(sub), arm
        assert abs(r.mean_post - sub.y.mean()) < 1e-5, arm
        assert abs(r.mean_pre - sub.x.mean()) < 1e-5, arm
        assert abs(r.theta - theta) < 1e-5, arm
        adj = sub.y.mean() - theta * (sub.x.mean() - dsx / n_all)
        assert abs(r.mean_post_cuped - adj) < 1e-5, arm


def test_srm_matches_chi2(spark, ev):
    from iot_etl_spark.plans.queries_audit import SRM_ARMS, SRM_CRIT_P001

    users = ev.user_id.unique()
    arms = Counter(_arm(int(u), 16, SRM_ARMS) for u in users)
    n_all = len(users)
    chi2 = (SRM_ARMS * sum(v * v for v in arms.values()) - n_all**2) / n_all
    rows = {r.arm: r for r in QUERIES["srm_arm_balance"](spark, SF_DIR).collect()}
    assert set(rows) == set(arms)
    for a, n in arms.items():
        r = rows[a]
        assert r.n_users == n, a
        assert abs(r.expected - n_all / SRM_ARMS) < 1e-6, a
        assert abs(r.chi2 - chi2) < 1e-6, a
        assert bool(r.srm_alarm) == (chi2 > SRM_CRIT_P001), a
