"""Oracle-independent validation of the survival-analysis family and
the paired rank test: Kaplan-Meier, Nelson-Aalen, and the log-rank
test replayed with literal risk-set loops over the same right-censored
spell construction, Wilcoxon signed-rank with scipy-style average
ranks. Fifth module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def spells() -> pd.DataFrame:
    """(user_id, t_min, observed): inter-event gaps in whole minutes,
    last spell per user right-censored at the global observation end —
    the construction shared by kaplan_meier_waits / nelson_aalen_hazard
    / logrank_test_arms."""
    df = pd.read_parquet(EVENTS)
    us = pd.to_datetime(df.ts).dt.floor("us").values.astype("datetime64[us]").astype(np.int64)
    d = pd.DataFrame({"user_id": df.user_id, "us": us}).sort_values(["user_id", "us"])
    obs_end = int(d.us.max())
    rows = []
    for u, sub in d.groupby("user_id"):
        t = sub.us.to_numpy()
        for i in range(len(t)):
            if i + 1 < len(t):
                rows.append((u, (int(t[i + 1]) - int(t[i])) // 60_000_000, 1))
            else:
                rows.append((u, (obs_end - int(t[i])) // 60_000_000, 0))
    return pd.DataFrame(rows, columns=["user_id", "t_min", "observed"])


def _risk_cells(sp: pd.DataFrame):
    """ascending list of (t, d, n): deaths and at-risk count per cell."""
    cells = sp.groupby("t_min").agg(d=("observed", "sum"), c=("observed", "size"))
    cells = cells.sort_index()
    n_after = cells.c[::-1].cumsum()[::-1]
    return [(int(t), int(cells.d[t]), int(n_after[t])) for t in cells.index]


def test_kaplan_meier_matches_naive_product(spark, spells):
    rows = {r.t_min: r for r in QUERIES["kaplan_meier_waits"](spark, SF_DIR).collect()}
    assert rows
    surv = 1.0
    died_out = False
    seen = 0
    for t, d, n in _risk_cells(spells):
        if d == n:
            died_out = True
        elif d > 0:
            surv *= 1.0 - d / n
        if d > 0 and t % 60 == 0:
            r = rows[t]
            assert (r.n_at_risk, r.n_ended) == (n, d), t
            want = 0.0 if died_out else surv
            assert abs(r.survival - want) < 1e-4, t
            seen += 1
    assert seen == len(rows) and seen >= 3


def test_nelson_aalen_matches_naive_cumsum(spark, spells):
    rows = {r.t_min: r for r in QUERIES["nelson_aalen_hazard"](spark, SF_DIR).collect()}
    assert rows
    h = 0.0
    seen = 0
    for t, d, n in _risk_cells(spells):
        h += d / n
        if d > 0 and t % 60 == 0:
            r = rows[t]
            assert (r.n_at_risk, r.n_ended) == (n, d), t
            assert abs(r.cum_hazard - h) < 1e-4, t
            assert abs(r.fh_survival - np.exp(-h)) < 1e-4, t
            seen += 1
    assert seen == len(rows) and seen >= 3


def test_logrank_matches_naive_risk_sets(spark, spells):
    arm = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in spells.user_id.unique()
    }
    sp = spells.assign(grp=spells.user_id.map(arm))
    # per-arm cells and descending risk sets on the same duration grid
    cells = sp.groupby(["t_min", "grp"]).agg(
        d=("observed", "sum"), c=("observed", "size")
    ).reset_index()
    o1 = 0
    e1 = v = 0.0
    for t in sorted(cells.t_min.unique()):
        d_g = {g: 0 for g in (0, 1)}
        n_g = {g: 0 for g in (0, 1)}
        for g in (0, 1):
            m = cells.grp == g
            d_g[g] = int(cells[(cells.t_min == t) & m].d.sum())
            n_g[g] = int(cells[(cells.t_min >= t) & m].c.sum())
        d, n = d_g[0] + d_g[1], n_g[0] + n_g[1]
        if d == 0:
            continue
        o1 += d_g[1]
        e1 += d * n_g[1] / n
        if n > 1:
            v += d * (n_g[1] / n) * (1 - n_g[1] / n) * (n - d) / (n - 1)
    row = QUERIES["logrank_test_arms"](spark, SF_DIR).collect()[0]
    assert row.o1 == o1
    assert abs(row.e1 - e1) < 1e-4
    assert abs(row.variance - v) < 1e-4
    assert abs(row.z - (o1 - e1) / np.sqrt(v)) < 1e-4


def test_wilcoxon_matches_naive_ranks(spark):
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df.ts).dt.floor("us")
    df = df[df.value.notna()]
    we = df.ts.dt.dayofweek.isin([5, 6])
    per = df.assign(we=we).groupby("user_id").apply(
        lambda s: pd.Series({
            "we_mean": s[s.we].value.mean() if s.we.any() else np.nan,
            "wd_mean": s[~s.we].value.mean() if (~s.we).any() else np.nan,
        }),
        include_groups=False,
    )
    per = per.dropna()
    du = np.sign(x := (per.we_mean - per.wd_mean).to_numpy() * 1e6) * np.floor(
        np.abs(x) + 0.5
    )
    du = du[du != 0].astype(np.int64)
    ranks = pd.Series(np.abs(du)).rank(method="average").to_numpy()
    n = len(du)
    w_plus = float(ranks[du > 0].sum())
    w_minus = float(ranks[du < 0].sum())
    tie_adj = sum(
        int(c) ** 3 - int(c) for c in pd.Series(np.abs(du)).value_counts()
    )
    z = (w_plus - n * (n + 1) / 4) / np.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - tie_adj / 48
    )
    row = QUERIES["wilcoxon_signed_rank_weekend"](spark, SF_DIR).collect()[0]
    assert row.n_pairs == n
    assert abs(row.w_plus - w_plus) < 1e-6
    assert abs(row.w_minus - w_minus) < 1e-6
    assert abs(row.z_score - z) < 1e-5
