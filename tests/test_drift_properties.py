"""Oracle-independent validation of the drift-distance and
contingency-table statistics: W1, Hodges-Lehmann/Cliff's delta, PSI,
Jensen-Shannon, Poisson dispersion, the Gumbel block-maxima fit,
McNemar, the odds ratio with Woolf CI, and Cohen's kappa algebra.
Seventh module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
DOCS = f"{SF_DIR}/documents.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    df["we"] = df.ts.dt.dayofweek.isin([5, 6])
    return df


def _ha(v):  # half-away rounding, engine ROUND semantics
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def test_wasserstein_matches_cdf_walk(spark, ev):
    nn = ev[ev.value.notna()]
    cells = pd.DataFrame({
        "cell": _ha(nn.value.to_numpy() * 100).astype(np.int64),
        "we": nn.we.to_numpy(),
    }).groupby(["cell"]).we.agg(n1="sum", nboth="size").reset_index()
    cells["n2"] = cells.nboth - cells.n1
    # totals include NULL-value rows (they group into a NULL cell that
    # sorts last with gap 0, contributing nothing but inflating N)
    tot1 = int(ev.we.sum())
    tot2 = int((~ev.we).sum())
    cells = cells.sort_values("cell")
    c1 = cells.n1.cumsum().to_numpy()
    c2 = cells.n2.cumsum().to_numpy()
    gap = np.r_[np.diff(cells.cell.to_numpy()), 0]
    num = int(np.sum(np.abs(c1 * tot2 - c2 * tot1) * gap))
    row = QUERIES["wasserstein_weekend_value"](spark, SF_DIR).collect()[0]
    assert (row.n_weekend, row.n_weekday) == (tot1, tot2)
    assert abs(row.w1_distance - num / (float(tot1) * tot2) / 100) < 1e-5


def test_hodges_lehmann_matches_weighted_median(spark, ev):
    cells: dict = {}
    for v, w in zip(ev.value, ev.we):
        cell = None if pd.isna(v) else int(_ha(v))
        cells[(w, cell)] = cells.get((w, cell), 0) + 1
    diffs: dict = {}
    for (wa, ca), na in cells.items():
        if not wa:
            continue
        for (wb, cb), nb in cells.items():
            if wb:
                continue
            d = None if (ca is None or cb is None) else ca - cb
            diffs[d] = diffs.get(d, 0) + na * nb
    tot = sum(diffs.values())
    wpos = sum(w for d, w in diffs.items() if d is not None and d > 0)
    wneg = sum(w for d, w in diffs.items() if d is not None and d < 0)
    cum = 0
    hl = None
    for d in sorted(k for k in diffs if k is not None):
        cum += diffs[d]
        if 2 * cum >= tot and hl is None:
            hl = d
    row = QUERIES["hodges_lehmann_weekend"](spark, SF_DIR).collect()[0]
    assert row.n_pairs == tot
    assert row.hl_shift == hl
    assert abs(row.cliffs_delta - (wpos - wneg) / tot) < 1e-6


def test_psi_matches_naive_bins(spark, ev):
    from iot_etl_spark.plans.queries_mlprep import PSI_BINS

    wk = ev.assign(
        week=ev.ts.values.astype("datetime64[W]")  # ISO-truncation differs;
    )
    # replicate date_trunc('week') via pandas: Monday-anchored periods
    wk["week"] = ev.ts.dt.to_period("W-SUN").dt.start_time
    wk["week_epoch"] = wk.week.values.astype("datetime64[s]").astype(np.int64)
    w0 = int(wk.week_epoch.min())
    basev = wk[wk.week_epoch == w0].value.dropna().to_numpy()
    bounds = np.quantile(basev, [i / PSI_BINS for i in range(1, PSI_BINS)])
    rows = {r.week_epoch: r for r in QUERIES["psi_value_drift"](spark, SF_DIR).collect()}
    base_counts = np.array([
        int(((basev[:, None] >= bounds[None, :]).sum(axis=1) == b).sum())
        for b in range(PSI_BINS)
    ])
    n0 = len(basev)
    p0 = (base_counts + 1.0) / (n0 + PSI_BINS)
    for we, r in rows.items():
        v = wk[wk.week_epoch == we].value.dropna().to_numpy()
        nb = np.array([
            int(((v[:, None] >= bounds[None, :]).sum(axis=1) == b).sum())
            for b in range(PSI_BINS)
        ])
        n = len(v)
        p = (nb + 1.0) / (n + PSI_BINS)
        psi = float(np.sum((p - p0) * np.log(p / p0)))
        assert r.n_events == n, we
        assert abs(r.psi - psi) < 1e-5, we


def test_js_divergence_matches_counter(spark):
    from iot_etl_spark.plans.queries_corpus import JS_VOCAB

    docs = pd.read_parquet(DOCS)
    toks: dict[str, Counter] = {}
    glob: Counter = Counter()
    for s, txt in zip(docs.source, docs.text):
        ws = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        toks.setdefault(s, Counter()).update(ws)
        glob.update(ws)
    vocab = {t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:JS_VOCAB]}
    dist = {
        s: Counter({(t if t in vocab else "<oov>"): c for t, c in cnt.items()})
        for s, cnt in toks.items()
    }
    # rebuild with summed oov
    for s in dist:
        m: Counter = Counter()
        for t, c in toks[s].items():
            m[t if t in vocab else "<oov>"] += c
        dist[s] = m
    rows = {(r.src_a, r.src_b): r for r in QUERIES["js_divergence_sources"](spark, SF_DIR).collect()}
    srcs = sorted(dist)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            na, nb = sum(dist[a].values()), sum(dist[b].values())
            js = 0.0
            for t in set(dist[a]) | set(dist[b]):
                pa, pb = dist[a][t] / na, dist[b][t] / nb
                m = (pa + pb) / 2
                term = 0.0
                if pa > 0:
                    term += 0.5 * pa * np.log2(pa / m)
                if pb > 0:
                    term += 0.5 * pb * np.log2(pb / m)
                js += float(_ha(np.float64(term * 1e9))) / 1e9
            r = rows[(a, b)]
            assert (r.n_tokens_a, r.n_tokens_b) == (na, nb), (a, b)
            assert abs(r.js_bits - js) < 1e-5, (a, b)


def test_poisson_dispersion_matches_naive(spark, ev):
    hr = ev.ts.values.astype("datetime64[h]").astype(np.int64)
    mn, mx = int(hr.min()), int(hr.max())
    rows = {r.event_type: r for r in QUERIES["poisson_dispersion_test"](spark, SF_DIR).collect()}
    for g in ev.event_type.unique():
        c = Counter(hr[ev.event_type.to_numpy() == g])
        grid = np.array([c.get(h, 0) for h in range(mn, mx + 1)], dtype=np.int64)
        n = len(grid)
        mean = grid.sum() / n
        var = (n * float((grid.astype(object) ** 2).sum()) - float(grid.sum()) ** 2) / (
            n * (n - 1.0)
        )
        r = rows[g]
        assert r.n_hours == n, g
        assert abs(r.mean_per_hour - mean) < 1e-9, g
        assert abs(r.dispersion_index - var / mean) < 1e-9, g
        assert abs(r.chi2_stat - (n - 1) * var / mean) < 1e-6, g


def test_gumbel_matches_moments(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["day"] = d.ts.values.astype("datetime64[D]")
    rows = {r.event_type: r for r in QUERIES["extreme_value_gumbel_fit"](spark, SF_DIR).collect()}
    gamma = 0.5772156649015329
    for g, sub in d.groupby("event_type"):
        m = sub.groupby("day").value.max().to_numpy()
        n = len(m)
        mean = m.sum() / n
        std = np.sqrt((n * (m**2).sum() - m.sum() ** 2) / (n * (n - 1.0)))
        scale = std * np.sqrt(6.0) / np.pi
        loc = mean - gamma * scale
        rl99 = loc - scale * np.log(-np.log(0.99))
        r = rows[g]
        assert r.n_days == n, g
        assert abs(r.gumbel_loc - loc) < 1e-6, g
        assert abs(r.gumbel_scale - scale) < 1e-6, g
        assert abs(r.return_level_99 - rl99) < 1e-5, g


def test_mcnemar_matches_contingency(spark, ev):
    per = ev.assign(is_p=ev.event_type == "purchase").groupby("user_id").apply(
        lambda s: pd.Series({
            "we": int((s.is_p & s.we).any()),
            "wd": int((s.is_p & ~s.we).any()),
        }),
        include_groups=False,
    )
    b = int(((per.we == 1) & (per.wd == 0)).sum())
    c = int(((per.we == 0) & (per.wd == 1)).sum())
    row = QUERIES["mcnemar_weekend_conversion"](spark, SF_DIR).collect()[0]
    assert row.n_users == len(per)
    assert (row.n_weekend_only, row.n_weekday_only) == (b, c)
    assert row.n_both == int(((per.we == 1) & (per.wd == 1)).sum())
    assert abs(row.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-9


def test_odds_ratio_matches_contingency(spark, ev):
    err = ev.event_type == "error"
    a = int((ev.we & err).sum())
    b = int((ev.we & ~err).sum())
    c = int((~ev.we & err).sum())
    d = int((~ev.we & ~err).sum())
    orr = (a * d) / (b * c)
    se = np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    row = QUERIES["odds_ratio_weekend_error"](spark, SF_DIR).collect()[0]
    assert (row.n_weekend_error, row.n_weekend_other) == (a, b)
    assert (row.n_weekday_error, row.n_weekday_other) == (c, d)
    assert abs(row.odds_ratio - orr) < 1e-9
    assert abs(row.ci_lo - np.exp(np.log(orr) - 1.959964 * se)) < 1e-6
    assert abs(row.ci_hi - np.exp(np.log(orr) + 1.959964 * se)) < 1e-6


def test_cohens_kappa_algebra(spark):
    """Kappa's ALGEBRA from its own reported contingency counts (the
    gates themselves are oracle-gated elsewhere)."""
    r = QUERIES["cohens_kappa_quality"](spark, SF_DIR).collect()[0]
    a, b, c, d = r.n_both_keep, r.n_model_only, r.n_rules_only, r.n_both_drop
    n = r.n_docs
    assert a + b + c + d == n
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    assert abs(r.observed_agreement - po) < 1e-9
    assert abs(r.cohens_kappa - (po - pe) / (1 - pe)) < 1e-9
