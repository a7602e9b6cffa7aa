"""Round-11 oracle-INDEPENDENT validation, tranche 1 (events + TPC-H
families): each query's statistic re-derived from the raw parquet with
naive Python/numpy (literal loops, argsort order statistics, numpy
solves) and pinned equal to the engine output. The DuckDB gate proves
Spark == DuckDB; these prove the agreed value is the RIGHT value —
exactly the check that caught the shared log-rank risk-set flaw in
round 10 (STATUS.md).

All at sf0.001. Rounding convention: Spark ROUND is HALF_UP; naive
sides use `_round_half_up` wherever a tie is reachable (integer-ratio
roundings), np.round elsewhere (2-dp source values cannot tie at the
1e6 lattice).
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


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _round_half_up(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _ns(series: pd.Series) -> pd.Series:
    """Epoch nanoseconds regardless of the frame's datetime unit."""
    return series.astype("datetime64[ns]").astype("int64")


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


# --------------------------------------------------------- resampling


def test_jackknife_ratio_matches_literal_folds(spark, ev):
    """Delete-one-fold jackknife SE from a literal Python fold loop."""
    folds = {}
    for uid, et in zip(ev.user_id, ev.event_type):
        f = _md5_u32(str(uid)) % 5
        u, p = folds.setdefault(f, [set(), 0])
        u.add(uid)
        folds[f][1] = p + (et == "purchase")
    tp = sum(p for _, p in folds.values())
    tn = sum(len(u) for u, _ in folds.values())
    thetas = [(tp - p) / (tn - len(u)) for u, p in folds.values()]
    tbar = sum(thetas) / len(thetas)
    k = len(thetas)
    se = math.sqrt((k - 1) / k * sum((t - tbar) ** 2 for t in thetas))
    row = QUERIES["jackknife_ratio_variance"](spark, SF_DIR).first()
    assert row.k == k
    assert abs(row.theta - tp / tn) < 1e-6
    assert abs(row.se_jackknife - se) < 1e-6


def test_bootstrap_ci_matches_literal_replicas(spark, ev):
    """Poisson-bootstrap CI from a literal per-(row, replica) loop over
    the same md5 ladder; CI = ceil(.05/.95 * nb) order statistics."""
    ladder = ((367879, 0), (735759, 1), (919699, 2), (981012, 3))
    out = {}
    for et, sub in ev.groupby("event_type"):
        vq = np.round(sub.value.to_numpy() * 1e6).astype(np.int64)
        eids = sub.event_id.to_numpy()
        means = []
        for b in range(32):
            swv = sw = 0
            for e, v in zip(eids, vq):
                u = _md5_u32(f"{e}:{b}") % 1000000
                w = 4
                for t, wv in ladder:
                    if u < t:
                        w = wv
                        break
                swv += w * int(v)
                sw += w
            if sw > 0:
                means.append((swv / sw) / 1e6)
        means.sort()
        nb = len(means)
        out[et] = (
            len(sub),
            vq.sum() / len(sub) / 1e6,
            means[math.ceil(0.05 * nb) - 1],
            means[math.ceil(0.95 * nb) - 1],
        )
    for r in QUERIES["bootstrap_mean_ci"](spark, SF_DIR).collect():
        n, mean, lo, hi = out[r.event_type]
        assert r.n_events == n
        assert abs(r.mean_value - mean) < 1e-6
        assert abs(r.ci_low - lo) < 1e-6
        assert abs(r.ci_high - hi) < 1e-6


# ------------------------------------------------- multiple testing


def test_benjamini_hochberg_matches_naive_sort(spark, ev):
    """BH on naively sorted per-user p-values (argsort, not the
    cumulative-cell device)."""
    daily = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby(["user_id", "day"])
        .size()
        .rename("c")
        .reset_index()
    )
    ps = []
    for uid, sub in daily.groupby("user_id"):
        c = sub.c.to_numpy().astype(np.int64)
        n = len(c)
        if n < 2:
            continue
        s, ss = int(c.sum()), int((c * c).sum())
        disp = (ss - s * s / n) / (n - 1) / (s / n)
        z = ((n - 1) * disp - (n - 1)) / math.sqrt(2.0 * (n - 1))
        p = 2.0 / (1.0 + math.exp(1.702 * abs(z)))
        ps.append(int(np.round(p * 1e6)))
    ps.sort()
    m = len(ps)
    n_rej, thresh = 0, None
    for i, pc in enumerate(ps, start=1):
        if pc / 1e6 <= i / m * 0.10:
            n_rej, thresh = i, pc
    row = QUERIES["benjamini_hochberg_fdr"](spark, SF_DIR).first()
    assert row.n_tests == m
    assert row.n_rejected == n_rej
    if thresh is not None:
        assert abs(row.reject_threshold_p - thresh / 1e6) < 1e-9


# --------------------------------------------------------- causal


def test_diff_in_diff_matches_naive_cells(spark, ev):
    d0 = ev.ts.dt.floor("D").min()
    split = d0 + pd.Timedelta(days=15)
    per = {}
    for uid, t, et in zip(ev.user_id, ev.ts, ev.event_type):
        arm = _md5_u32(str(uid)) % 2
        period = 0 if t.floor("D") < split else 1
        key = (uid, arm, period)
        per[key] = per.get(key, 0) + (et == "purchase")
    cells = {}
    for (_, arm, period), c in per.items():
        n, s, ss = cells.get((arm, period), (0, 0, 0))
        cells[(arm, period)] = (n + 1, s + c, ss + c * c)
    r, v = {}, {}
    for (arm, period), (n, s, ss) in cells.items():
        r[(arm, period)] = s / n
        v[(arm, period)] = (ss - s * s / n) / (n - 1) / n
    did = (r[(1, 1)] - r[(1, 0)]) - (r[(0, 1)] - r[(0, 0)])
    se = math.sqrt(sum(v.values()))
    row = QUERIES["diff_in_diff_readout"](spark, SF_DIR).first()
    assert abs(row.r_a_pre - r[(0, 0)]) < 1e-6
    assert abs(row.r_b_post - r[(1, 1)]) < 1e-6
    assert abs(row.did - did) < 1e-6
    assert abs(row.se - se) < 1e-6
    assert abs(row.z - did / se) < 1e-5


def test_quantile_treatment_effect_matches_argsort(spark, ev):
    arms = {0: [], 1: []}
    for uid, val in zip(ev.user_id, ev.value):
        arms[_md5_u32(str(uid)) % 2].append(int(np.round(val * 1e6)))
    for a in arms:
        arms[a].sort()
    for r in QUERIES["quantile_treatment_effect"](spark, SF_DIR).collect():
        d = r.decile
        qc = arms[0][(d * len(arms[0]) + 9) // 10 - 1] / 1e6
        qt = arms[1][(d * len(arms[1]) + 9) // 10 - 1] / 1e6
        assert abs(r.q_control - qc) < 1e-9, d
        assert abs(r.q_treatment - qt) < 1e-9, d
        assert abs(r.qte - (qt - qc)) < 1e-9, d


# ------------------------------------------------ categorical / grid


def test_chi2_contributions_match_naive_contingency(spark, ev):
    tab = pd.crosstab(ev.event_type, ev.ts.dt.dayofweek)
    o = tab.to_numpy().astype(float)
    e = o.sum(1, keepdims=True) * o.sum(0, keepdims=True) / o.sum()
    contrib = ((o - e) ** 2 / e).sum(1)
    exp = dict(zip(tab.index, contrib))
    n_rows = dict(zip(tab.index, o.sum(1).astype(int)))
    for r in QUERIES["chi2_type_dow"](spark, SF_DIR).collect():
        assert r.n_rows == n_rows[r.event_type]
        assert abs(r.chi2_contrib - exp[r.event_type]) < 1e-4


def test_seasonal_naive_backtest_matches_naive_cells(spark, ev):
    d = ev[ev.value.notna()]
    vmic = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    keys = list(zip(d.event_type, d.ts.dt.dayofweek, d.ts.dt.hour))
    cells: dict = {}
    for k, v in zip(keys, vmic):
        s, c = cells.get(k, (0, 0))
        cells[k] = (s + int(v), c + 1)
    pred_cell = {k: int(_round_half_up(s / c)) for k, (s, c) in cells.items()}
    tsum: dict = {}
    for k, (s, c) in cells.items():
        a, b = tsum.get(k[0], (0, 0))
        tsum[k[0]] = (a + s, b + c)
    pred_type = {t: int(_round_half_up(s / c)) for t, (s, c) in tsum.items()}
    es, en, cnt = {}, {}, {}
    for k, v in zip(keys, vmic):
        t = k[0]
        es[t] = es.get(t, 0) + abs(int(v) - pred_cell[k])
        en[t] = en.get(t, 0) + abs(int(v) - pred_type[t])
        cnt[t] = cnt.get(t, 0) + 1
    for r in QUERIES["seasonal_naive_backtest"](spark, SF_DIR).collect():
        t = r.event_type
        assert r.n_events == cnt[t]
        assert abs(r.mae_seasonal - es[t] / cnt[t] / 1e6) < 1e-6
        assert abs(r.mae_naive - en[t] / cnt[t] / 1e6) < 1e-6
        assert abs(r.skill_score - (1.0 - es[t] / en[t])) < 1e-6


# ---------------------------------------------- order statistics


def test_median_ci_matches_sorted_pick(spark, ev):
    z = 1.959964
    d = ev[ev.value.notna()]
    for r in QUERIES["median_ci_order_stats"](spark, SF_DIR).collect():
        # the engine works on the 2-dp DECIMAL grid; source values are
        # already 2-dp so plain sort matches
        vals = np.sort(d[d.event_type == r.event_type].value.to_numpy())
        n = len(vals)
        k_lo = max(math.floor(n / 2.0 - z * math.sqrt(n) / 2), 1)
        k_hi = min(math.ceil(n / 2.0 + z * math.sqrt(n) / 2) + 1, n)
        k_med = math.ceil(n / 2.0)
        assert r.n_values == n
        assert r.k_lo == k_lo and r.k_hi == k_hi
        assert abs(r.median_value - vals[k_med - 1]) < 1e-9
        assert abs(r.ci_lo - vals[k_lo - 1]) < 1e-9
        assert abs(r.ci_hi - vals[k_hi - 1]) < 1e-9


def test_weighted_median_matches_cumsum_walk(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for r in QUERIES["weighted_median_price"](spark, SF_DIR).collect():
        sub = li[li.l_returnflag == r.l_returnflag]
        g = sub.groupby("l_extendedprice")["l_quantity"].sum().sort_index()
        tot = g.sum()
        cum = 0.0
        for price, w in g.items():
            cum += w
            if 2 * cum >= tot:
                break
        assert r.n_rows == len(sub)
        assert abs(r.total_weight - tot) < 1e-6
        assert abs(r.weighted_median_price - price) < 1e-9


def test_inter_arrival_matches_naive_gaps(spark, ev):
    rows = {
        r.user_id: r
        for r in QUERIES["inter_arrival_stats"](spark, SF_DIR).collect()
    }
    for uid, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        es = (_ns(sub.ts) // 10**9).to_numpy()
        gaps = np.diff(es)
        if len(gaps) == 0:
            assert uid not in rows
            continue
        r = rows[uid]
        assert r.n_gaps == len(gaps)
        assert r.min_gap_s == gaps.min() and r.max_gap_s == gaps.max()
        assert abs(r.avg_gap_s - gaps.mean()) < 1e-6
        assert abs(r.p50_gap_s - np.percentile(gaps, 50)) < 1e-6
        assert abs(r.p95_gap_s - np.percentile(gaps, 95)) < 1e-6


# ------------------------------------------------- behavioral folds


def test_activity_streaks_match_literal_runs(spark, ev):
    rows = {
        r.user_id: r
        for r in QUERIES["user_activity_streaks"](spark, SF_DIR).collect()
    }
    for uid, sub in ev.groupby("user_id"):
        days = sorted(set(_ns(sub.ts.dt.floor("D")) // 10**9 // 86400))
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        r = rows[uid]
        assert r.n_active_days == len(days)
        assert r.n_streaks == len(runs)
        assert r.longest_streak_days == max(runs)


def test_decayed_engagement_matches_literal_sum(spark, ev):
    es = (_ns(ev.ts) // 10**9).to_numpy()
    max_s = es.max()
    scores: dict = {}
    for uid, e in zip(ev.user_id, es):
        age_d = (max_s - e) // 86400
        term = int(_round_half_up(2.0 ** (-age_d / 7.0) * 1e9))
        n, s = scores.get(uid, (0, 0))
        scores[uid] = (n + 1, s + term)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:100]
    got = QUERIES["decayed_engagement_score"](spark, SF_DIR).collect()
    assert len(got) == len(top)
    for r, (uid, (n, s)) in zip(got, top):
        assert r.user_id == uid and r.n_events == n
        assert abs(r.decayed_score - s / 1e9) < 1e-6


def test_holt_recent_matches_literal_recursion(spark, ev):
    rows = {
        r.user_id: r
        for r in QUERIES["holt_forecast_recent"](spark, SF_DIR).collect()
    }
    for uid, sub in ev.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"]).tail(32)
        vals = sub.value.to_numpy()
        if len(vals) < 2:
            assert uid not in rows
            continue
        level, trend = vals[1], vals[1] - vals[0]
        for x in vals[2:]:
            new_level = x / 2 + (level + trend) / 2
            trend = (new_level - level) / 2 + trend / 2
            level = new_level
        r = rows[uid]
        assert r.n_used == len(vals)
        assert abs(r.level - level) < 1e-5
        assert abs(r.trend - trend) < 1e-5
        assert abs(r.forecast_next - (level + trend)) < 1e-5


def test_time_to_first_purchase_matches_naive_mins(spark, ev):
    rows = {
        r.user_id: r
        for r in QUERIES["time_to_first_purchase"](spark, SF_DIR).collect()
    }
    seen = set()
    for uid, sub in ev.groupby("user_id"):
        sg = sub[sub.event_type == "signup"]
        pu = sub[sub.event_type == "purchase"]
        if sg.empty or pu.empty:
            assert uid not in rows
            continue
        seen.add(uid)
        s = int(_ns(sg.ts).min() // 10**9)
        p = int(_ns(pu.ts).min() // 10**9)
        r = rows[uid]
        assert r.signup_epoch == s and r.first_purchase_epoch == p
        assert abs(r.hours_to_convert - (p - s) / 3600.0) < 1e-6
    assert seen == set(rows)


def test_cohort_retention_matches_literal_matrix(spark, ev):
    us = _ns(ev.ts) // 10**3
    first_us = us.groupby(ev.user_id).transform("min")
    first_ts = ev.groupby("user_id").ts.transform("min")
    cohort = (
        _ns(first_ts.dt.to_period("W-SUN").dt.start_time) // 10**9
    )
    offset = (us - first_us) // 604800000000
    naive = (
        pd.DataFrame(
            {"c": cohort, "o": offset, "u": ev.user_id.to_numpy()}
        )
        .groupby(["c", "o"])
        .u.nunique()
        .to_dict()
    )
    got = {
        (r.cohort_week_epoch, r.week_offset): r.active_users
        for r in QUERIES["cohort_retention"](spark, SF_DIR).collect()
    }
    assert got == {(int(c), int(o)): int(v) for (c, o), v in naive.items()}


def test_burst_detection_matches_naive_z(spark, ev):
    got = {
        (r.user_id, r.bucket_epoch): r
        for r in QUERIES["burst_detection"](spark, SF_DIR).collect()
    }
    expected = set()
    mins = _ns(ev.ts.dt.floor("min")) // 10**9
    counts = (
        pd.DataFrame({"u": ev.user_id, "b": mins})
        .groupby(["u", "b"])
        .size()
        .rename("c")
        .reset_index()
    )
    for uid, sub in counts.groupby("u"):
        c = sub.c.to_numpy().astype(float)
        if len(c) < 2:
            continue
        mu, sd = c.mean(), c.std(ddof=1)
        if sd <= 0:
            continue
        for b, n in zip(sub.b, sub.c):
            z = (n - mu) / sd
            if z > 2.0:
                expected.add((uid, int(b)))
                r = got[(uid, int(b))]
                assert r.n_events == n
                assert abs(r.burst_z - z) < 1e-5
    assert expected == set(got)


def test_device_correlation_matches_naive_hourly(spark, ev):
    sub = ev[ev.user_id.isin([1, 2])]
    hours = _ns(sub.ts.dt.floor("h")) // 10**9
    frame = pd.DataFrame({"b": hours, "u": sub.user_id, "v": sub.value})
    rows = {r.bucket_epoch: r for r in QUERIES["device_correlation"](spark, SF_DIR).collect()}
    expected = {}
    for b, g in frame.groupby("b"):
        a, bb = g[g.u == 1], g[g.u == 2]
        if len(a) and len(bb):
            expected[int(b)] = (a.v.mean(), bb.v.mean())
    assert set(expected) == set(rows)
    for b, (ma, mb) in expected.items():
        r = rows[b]
        if not (pd.isna(ma) and r.avg_value_a is None):
            assert abs(r.avg_value_a - ma) < 1e-6
        if not (pd.isna(mb) and r.avg_value_b is None):
            assert abs(r.avg_value_b - mb) < 1e-6


# --------------------------------------------------- encodings / eval


def test_target_encode_loo_matches_literal_cells(spark, ev):
    from decimal import ROUND_HALF_UP, Decimal

    q = lambda v: Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
    cells: dict = {}
    for et, uid, val in zip(ev.event_type, ev.user_id, ev.value):
        f = _md5_u32(str(uid)) % 5
        n, s = cells.get((et, f), (0, Decimal(0)))
        cells[(et, f)] = (n + 1, s + q(val))
    na = sum(n for n, _ in cells.values())
    sa = sum(s for _, s in cells.values())
    for r in QUERIES["target_encode_loo"](spark, SF_DIR).collect():
        ncf, scf = cells[(r.event_type, r.fold)]
        nc = sum(n for (et, _), (n, _) in cells.items() if et == r.event_type)
        sc = sum(s for (et, _), (_, s) in cells.items() if et == r.event_type)
        naf = sum(n for (_, f), (n, _) in cells.items() if f == r.fold)
        saf = sum(s for (_, f), (_, s) in cells.items() if f == r.fold)
        enc = (float(sc - scf) + 20 * (float(sa - saf) / (na - naf))) / (
            (nc - ncf) + 20
        )
        assert r.n_in_fold == ncf
        assert abs(r.enc_value - enc) < 1e-6


def test_pinball_loss_matches_literal_split(spark, ev):
    d = ev[ev.value.notna()]
    t_us = _ns(d.ts) // 10**3
    mid = int((t_us.min() + t_us.max()) / 2)
    vu = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    key = list(zip(d.event_type, d.ts.dt.hour))
    train: dict = {}
    for k, v, t in zip(key, vu, t_us):
        if t <= mid:
            train.setdefault(k, []).append(int(v))
    q50, q90 = {}, {}
    for k, vals in train.items():
        vals.sort()
        n = len(vals)
        q50[k] = vals[(n + 1) // 2 - 1]
        q90[k] = vals[(9 * n + 9) // 10 - 1]
    agg: dict = {}
    for k, v, t in zip(key, vu, t_us):
        if t > mid and k in q50:
            et = k[0]
            n, s50, s90, cov = agg.get(et, (0, 0, 0, 0))
            d50 = int(v) - q50[k]
            d90 = int(v) - q90[k]
            agg[et] = (
                n + 1,
                s50 + abs(d50),
                s90 + max(9 * d90, -d90),
                cov + (v <= q90[k]),
            )
    for r in QUERIES["pinball_loss_eval"](spark, SF_DIR).collect():
        n, s50, s90, cov = agg[r.event_type]
        assert r.n_eval == n
        assert abs(r.pinball_p50 - s50 / (n * 2e6)) < 1e-6
        assert abs(r.pinball_p90 - s90 / (n * 1e7)) < 1e-6
        assert abs(r.coverage_p90 - cov / n) < 1e-6


# ------------------------------------------------ sketch-audit family


def test_quantile_sketch_audit_exact_sides_and_bounds(spark, ev):
    for r in QUERIES["quantile_sketch_audit"](spark, SF_DIR).collect():
        vals = ev[ev.event_type == r.event_type].value.dropna().to_numpy()
        assert r.n_values == ev[ev.event_type == r.event_type].shape[0]
        assert abs(r.p50_exact - np.percentile(vals, 50)) < 1e-6
        assert abs(r.p95_exact - np.percentile(vals, 95)) < 1e-6
        assert r.p50_within_bound and r.p95_within_bound


def test_hll_audit_exact_sides_and_bounds(spark, ev):
    for r in QUERIES["hll_distinct_audit"](spark, SF_DIR).collect():
        sub = ev[ev.event_type == r.event_type]
        assert r.exact_users == sub.user_id.nunique()
        assert r.exact_days == sub.ts.dt.floor("D").nunique()
        assert r.users_within_bound and r.days_within_bound


def test_winsorized_stats_consistent_with_raw(spark, ev):
    """Given the engine's own cut points, clip counts and both means
    must match a literal clamp over the raw rows, and each cut's rank
    must sit within the approx_percentile(1e6) error bound."""
    from decimal import ROUND_HALF_UP, Decimal

    q = lambda v: Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
    for r in QUERIES["winsorized_value_stats"](spark, SF_DIR).collect():
        vals = ev[ev.event_type == r.event_type].value.to_numpy()
        n = len(vals)
        assert r.n_rows == n
        assert r.n_clipped_low == int((vals < r.p05).sum())
        assert r.n_clipped_high == int((vals > r.p95).sum())
        clamped = np.clip(vals, r.p05, r.p95)
        wm = float(sum(q(v) for v in clamped)) / n
        rm = float(sum(q(v) for v in vals)) / n
        assert abs(r.winsorized_mean - wm) < 1e-6
        assert abs(r.raw_mean - rm) < 1e-6
        # rank sanity of the cut points (eps = n/accuracy + 1 slack)
        eps = n / 1e6 + 1
        assert (vals <= r.p05).sum() >= 0.05 * n - eps
        assert (vals < r.p05).sum() <= 0.05 * n + eps
        assert (vals <= r.p95).sum() >= 0.95 * n - eps
        assert (vals < r.p95).sum() <= 0.95 * n + eps
