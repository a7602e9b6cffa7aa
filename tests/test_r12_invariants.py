"""Round-12 oracle-INDEPENDENT validation: every round-12 registration
re-derived from the raw parquet with naive Python/numpy/pandas
(literal pair loops, pandas midranks, dict-based LMs, per-user session
walks) and pinned equal to the engine output. The DuckDB gate proves
Spark == DuckDB; these prove the agreed value is the RIGHT value —
the check that caught the Chow/EWMA shared-formula bugs in round 11.

All at sf0.001. pandas dayofweek is 0=Monday, so weekend is {5, 6}
(NOT an affine relabeling of Spark/DuckDB codes — the round-11
partial-correlation lesson).
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


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


@pytest.fixture(scope="module")
def we_split(ev):
    """(weekday_vq, weekend_vq) integer centi-value arrays."""
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    we = d.ts.dt.dayofweek.isin([5, 6]).to_numpy()
    return d.vq.to_numpy()[~we], d.vq.to_numpy()[we]


# ------------------------------------------------- two-sample trio


def test_energy_distance_matches_brute_force_pairs(spark, we_split):
    x, y = we_split
    n, m = len(x), len(y)
    sxy = np.abs(x[:, None] - y[None, :]).sum()
    sxx = np.abs(x[:, None] - x[None, :]).sum() / 2
    syy = np.abs(y[:, None] - y[None, :]).sum() / 2
    d2 = (2 * sxy / (n * m) - 2 * sxx / n**2 - 2 * syy / m**2) / 100
    row = QUERIES["energy_distance_weekend"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_weekday == n and row.n_weekend == m
    assert abs(row.mean_cross_absdiff - sxy / n / m / 100) < 1e-6
    assert abs(row.energy_distance - d2) < 1e-6
    assert abs(row.energy_stat - n * m / (n + m) * d2) < 1e-4
    assert row.energy_stat >= 0


def test_cramer_von_mises_matches_literal_midranks(spark, we_split):
    x, y = we_split
    n, m = len(x), len(y)
    pooled = pd.Series(np.concatenate([x, y]))
    ranks = pooled.rank(method="average").to_numpy()
    rx = np.sort(ranks[:n])
    ry = np.sort(ranks[n:])
    u = n * ((rx - np.arange(1, n + 1)) ** 2).sum() + m * (
        (ry - np.arange(1, m + 1)) ** 2
    ).sum()
    nn = n + m
    t = u / (n * m * nn) - (4 * n * m - 1) / (6 * nn)
    row = QUERIES["cramer_von_mises_weekend"](spark, SF_DIR).toPandas().iloc[0]
    assert row.u_stat == u  # exact integer on the engine side
    assert abs(row.cvm_t - t) < 1e-6


def test_ansari_bradley_matches_literal_scores(spark, we_split):
    x, y = we_split
    n, m = len(x), len(y)
    nn = n + m
    pooled = np.concatenate([x, y])
    order = np.argsort(pooled, kind="stable")
    base = np.minimum(np.arange(1, nn + 1), nn + 1 - np.arange(1, nn + 1))
    # midrank ties: average the positional scores within each tie group
    scores = np.empty(nn, dtype=float)
    sorted_vals = pooled[order]
    i = 0
    while i < nn:
        j = i
        while j < nn and sorted_vals[j] == sorted_vals[i]:
            j += 1
        scores[order[i:j]] = base[i:j].mean()
        i = j
    t_ab = scores[n:].sum()  # weekend side
    sbar = scores.mean()
    var = m * n / (nn * (nn - 1)) * ((scores - sbar) ** 2).sum()
    z = (t_ab - m * sbar) / math.sqrt(var)
    row = QUERIES["ansari_bradley_scale"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_weekend == m and row.n_weekday == n
    assert abs(row.ab_t_weekend - t_ab) < 1e-3  # 1e-6-grid quantized sum
    assert abs(row.ab_expected - m * sbar) < 1e-4
    assert abs(row.z_approx - z) < 1e-4


# ------------------------------------------------- moment trio


def test_jarque_bera_matches_numpy_moments(spark, ev):
    d = ev[ev.value.notna()]
    out = (
        QUERIES["jarque_bera_by_type"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for et, g in d.groupby("event_type"):
        x = np.round(g.value.to_numpy() * 100).astype(np.int64).astype(float)
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + exk**2 / 4)
        r = out.loc[et]
        assert r.n_group == n
        assert abs(r.mean_value - mu / 100) < 1e-6
        assert abs(r.skewness - skew) < 1e-6
        assert abs(r.ex_kurtosis - exk) < 1e-6
        assert abs(r.jb_stat - jb) < 1e-4


def test_bartlett_matches_literal_formula(spark, ev):
    d = ev[ev.value.notna()]
    groups = {
        et: np.round(g.value.to_numpy() * 100).astype(np.int64)
        for et, g in d.groupby("event_type")
    }
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    variances = {et: v.var(ddof=1) for et, v in groups.items()}
    sp2 = sum((len(v) - 1) * variances[et] for et, v in groups.items()) / (
        nn - k
    )
    m_stat = (nn - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(variances[et]) for et, v in groups.items()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (nn - k)
    ) / (3 * (k - 1))
    out = (
        QUERIES["bartlett_variance_test"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for et, v in groups.items():
        assert out.loc[et].n_group == len(v)
        assert abs(out.loc[et].var_value - variances[et] / 1e4) < 1e-5
        assert abs(out.loc[et].bartlett_stat - m_stat / c) < 1e-5


def test_welch_anova_matches_literal_formula(spark, ev):
    d = ev[ev.value.notna()]
    groups = [
        np.round(g.value.to_numpy() * 100).astype(np.int64)
        for _, g in d.groupby("event_type")
    ]
    k = len(groups)
    w = [len(g) / g.var(ddof=1) for g in groups]
    means = [g.mean() for g in groups]
    wsum = sum(w)
    xw = sum(wi * mi for wi, mi in zip(w, means)) / wsum
    anum = sum(wi * (mi - xw) ** 2 for wi, mi in zip(w, means)) / (k - 1)
    bden = sum(
        (1 - wi / wsum) ** 2 / (len(g) - 1) for wi, g in zip(w, groups)
    )
    lam = 3 * bden / (k**2 - 1)
    f = anum / (1 + 2 * (k - 2) * lam / 3)
    row = QUERIES["welch_anova_value"](spark, SF_DIR).toPandas().iloc[0]
    assert row.k == k and row.n_total == sum(len(g) for g in groups)
    assert abs(row.welch_f - f) < 1e-5
    assert abs(row.df2 - 1 / lam) < 1e-3


# ------------------------------------------------- rank post-hocs


def test_dunn_matches_pandas_midranks(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    d["rank"] = d.vq.rank(method="average")
    nn = len(d)
    tie_counts = d.vq.value_counts().to_numpy()
    tsum = (tie_counts.astype(np.int64) ** 3 - tie_counts).sum()
    sig2 = nn * (nn + 1) / 12 - tsum / (12 * (nn - 1))
    mr = d.groupby("event_type")["rank"].mean()
    sizes = d.groupby("event_type").size()
    out = QUERIES["dunn_posthoc_pairwise"](spark, SF_DIR).toPandas()
    assert len(out) == len(mr) * (len(mr) - 1) // 2
    for _, r in out.iterrows():
        za = (mr[r.type_a] - mr[r.type_b]) / math.sqrt(
            sig2 * (1 / sizes[r.type_a] + 1 / sizes[r.type_b])
        )
        assert abs(r.mean_rank_a - mr[r.type_a]) < 1e-6
        assert abs(r.mean_rank_b - mr[r.type_b]) < 1e-6
        assert abs(r.dunn_z - za) < 1e-6


def test_kendall_w_matches_literal_blocks(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["day"] = d.ts.dt.floor("D")
    # the engine's cell mean: ROUND(sum(round(v*1e6)) / count)
    cells = (
        d.assign(vmq=np.round(d.value.to_numpy() * 1e6).astype(np.int64))
        .groupby(["day", "event_type"])["vmq"]
        .agg(["sum", "count"])
    )
    cells["mq"] = np.round(cells["sum"] / cells["count"]).astype(np.int64)
    k = d.event_type.nunique()
    piv = cells["mq"].unstack()
    full = piv.dropna()  # complete blocks only
    b = len(full)
    ranks = full.rank(axis=1, method="average")
    rj = ranks.sum(axis=0)
    s = ((rj - b * (k + 1) / 2) ** 2).sum()
    w = 12 * s / (b**2 * k * (k**2 - 1))
    row = QUERIES["kendall_w_concordance"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_blocks == b and row.k == k
    assert abs(row.kendall_w - w) < 1e-9
    assert abs(row.friedman_q_implied - b * (k - 1) * w) < 1e-5
    assert 0 <= row.kendall_w <= 1


# ------------------------------------------------- KPSS


def test_kpss_matches_literal_recursion(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["hour"] = d.ts.dt.floor("h")
    cells = (
        d.assign(vmq=np.round(d.value.to_numpy() * 1e6).astype(np.int64))
        .groupby("hour")["vmq"]
        .agg(["sum", "count"])
        .sort_index()
    )
    mq = np.round(cells["sum"] / cells["count"]).astype(np.int64).to_numpy()
    n = len(mq)
    e = mq - mq.mean()
    s = np.cumsum(e)
    bw = max(b for b in range(21) if b**4 * 100 <= 256 * n)
    lrv = (e * e).sum() + 2 * sum(
        (1 - l / (bw + 1)) * (e[:-l] * e[l:]).sum() for l in range(1, bw + 1)
    )
    eta = (s * s).sum() / (n * lrv)
    row = QUERIES["kpss_level_stationarity"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_hours == n and row.bandwidth == bw
    assert abs(row.kpss_eta - eta) < 1e-6


# ------------------------------------------------- bivariate duo


@pytest.fixture(scope="module")
def xy(ev):
    d = ev[ev.value.notna()].copy()
    d["y"] = d.props.map(
        lambda p: pd.NA if pd.isna(p) else pd.read_json(
            __import__("io").StringIO(p), typ="series"
        ).get("k", pd.NA)
    )
    d = d[d.y.notna()].copy()
    d["x"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    d["y"] = d.y.astype(np.int64)
    return d


def test_mahalanobis_topk_matches_numpy(spark, xy):
    d = xy
    pts = np.stack([d.x.to_numpy(float), d.y.to_numpy(float)], axis=1)
    mu = pts.mean(axis=0)
    cov = np.cov(pts.T, ddof=1)
    inv = np.linalg.inv(cov)
    dev = pts - mu
    d2 = np.einsum("ij,jk,ik->i", dev, inv, dev)
    frame = pd.DataFrame(
        {"event_id": d.event_id.to_numpy(), "d2": d2}
    ).sort_values(["d2", "event_id"], ascending=[False, True])
    top = frame.head(25)
    out = QUERIES["mahalanobis_outlier_topk"](spark, SF_DIR).toPandas()
    assert len(out) == 25
    assert set(out.event_id) == set(top.event_id)
    got = out.set_index("event_id").mahalanobis_d
    for eid, want in zip(top.event_id, np.sqrt(top.d2)):
        assert abs(got[eid] - want) < 1e-6


def test_hotelling_t2_matches_numpy(spark, xy):
    d = xy
    we = d.ts.dt.dayofweek.isin([5, 6]).to_numpy()
    a = np.stack([d.x.to_numpy(float)[~we], d.y.to_numpy(float)[~we]], axis=1)
    b = np.stack([d.x.to_numpy(float)[we], d.y.to_numpy(float)[we]], axis=1)
    n1, n2 = len(a), len(b)
    dmean = a.mean(axis=0) - b.mean(axis=0)
    w = (a - a.mean(axis=0)).T @ (a - a.mean(axis=0)) + (
        b - b.mean(axis=0)
    ).T @ (b - b.mean(axis=0))
    sp = w / (n1 + n2 - 2)
    t2 = n1 * n2 / (n1 + n2) * dmean @ np.linalg.inv(sp) @ dmean
    row = QUERIES["hotelling_t2_weekend"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_weekday == n1 and row.n_weekend == n2
    assert abs(row.dx_value - dmean[0] / 100) < 1e-6
    assert abs(row.dy_k - dmean[1]) < 1e-6
    assert abs(row.t2_stat - t2) < 1e-4
    assert abs(
        row.f_stat - (n1 + n2 - 3) / (2 * (n1 + n2 - 2)) * t2
    ) < 1e-4


# ------------------------------------------------- Theil + RMST


def test_theil_decomposition_matches_dict_loops(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    customer = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = orders.merge(
        customer[["c_custkey", "c_nationkey"]],
        left_on="o_custkey", right_on="c_custkey",
    ).merge(nation[["n_nationkey", "n_name"]],
            left_on="c_nationkey", right_on="n_nationkey")
    j["rq"] = np.round(j.o_totalprice.to_numpy() * 100).astype(np.int64)
    cust = j.groupby(["c_custkey", "n_name"])["rq"].sum().reset_index()
    r_tot = cust.rq.sum()
    n_tot = len(cust)
    out = (
        QUERIES["theil_inequality_decomposition"](spark, SF_DIR)
        .toPandas()
        .set_index("n_name")
    )
    total_within, total_between = 0.0, 0.0
    for name, g in cust.groupby("n_name"):
        rg, ng = g.rq.sum(), len(g)
        tg = sum(
            (rq * ng / rg) * math.log(rq * ng / rg) for rq in g.rq
        ) / ng
        bt = rg / r_tot * math.log((rg * n_tot) / (r_tot * ng))
        r = out.loc[name]
        assert r.n_customers == ng
        assert abs(r.revenue_share - rg / r_tot) < 1e-6
        assert abs(r.theil_within - tg) < 1e-6
        assert abs(r.between_term - bt) < 1e-6
        total_within += rg / r_tot * tg
        total_between += bt
    # decomposition consistency: total Theil equals within + between
    mu = r_tot / n_tot
    t_total = sum(
        (rq / mu) * math.log(rq / mu) for rq in cust.rq
    ) / n_tot
    assert abs(t_total - (total_within + total_between)) < 1e-9


def test_rmst_matches_literal_km_walk(spark, ev):
    us = ev.assign(us=ev.ts.astype("datetime64[us]").astype(np.int64))
    obs_end = us.us.max()
    spells = []
    for _, g in us.groupby("user_id"):
        t = np.sort(g.us.to_numpy())
        for a, b in zip(t[:-1], t[1:]):
            spells.append(((b - a) // 60_000_000, 1))
        spells.append(((obs_end - t[-1]) // 60_000_000, 0))
    df = pd.DataFrame(spells, columns=["t", "obs"]).sort_values("t")
    # literal KM product walk over distinct durations
    steps = []  # (t, S_after_t)
    surv = 1.0
    at_risk = len(df)
    for t, g in df.groupby("t"):
        d = int(g.obs.sum())
        if d > 0:
            surv *= 1 - d / at_risk
        at_risk -= len(g)
        steps.append((int(t), surv))
    out = (
        QUERIES["rmst_restricted_mean_survival"](spark, SF_DIR)
        .toPandas()
        .set_index("tau_min")
    )
    for tau in (60, 240, 480):
        area, prev_t, prev_s = 0.0, 0, 1.0
        for t, s in steps:
            if t >= tau:
                break
            area += prev_s * (min(t, tau) - prev_t)
            prev_t, prev_s = t, s
        area += prev_s * (tau - prev_t)
        got = out.loc[tau].rmst_min
        assert abs(got - area) < 2e-3  # nano-quantized hazards/survival
        assert got <= tau + 1e-9


# ------------------------------------------------- LM + AD + stream


def test_bigram_perplexity_matches_dict_lm(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    def split(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10 < 9
    docs["is_train"] = docs.doc_id.map(split)
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    vocab: set[str] = set()
    for _, r in docs[docs.is_train].iterrows():
        ws = r.text.split(" ")
        vocab.update(ws)
        for a, b in zip(ws[:-1], ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = len(vocab)
    stats: dict[str, list] = {}
    for _, r in docs[~docs.is_train].iterrows():
        ws = r.text.split(" ")
        for a, b in zip(ws[:-1], ws[1:]):
            lp = math.log((big.get((a, b), 0) + 1) / (ctx.get(a, 0) + v + 1))
            s = stats.setdefault(r.lang, [set(), 0, 0.0])
            s[0].add(r.doc_id)
            s[1] += 1
            s[2] += lp
    out = (
        QUERIES["bigram_perplexity_heldout"](spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    assert set(out.index) == set(stats)
    for lang, (dids, nb, lpsum) in stats.items():
        r = out.loc[lang]
        assert r.n_docs == len(dids) and r.n_bigrams == nb
        assert abs(r.avg_logprob - lpsum / nb) < 1e-5
        assert abs(r.perplexity - math.exp(-lpsum / nb)) < 1e-3


def test_anderson_darling_matches_literal_a2akn(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    zs = np.sort(d.vq.unique())
    nn = len(d)
    h = d.vq.value_counts().sort_index().to_numpy()
    hcum = np.cumsum(h)
    b_mid = hcum - h / 2
    out = (
        QUERIES["anderson_darling_ksample"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    total = 0.0
    for et, g in d.groupby("event_type"):
        ni = len(g)
        f = g.vq.value_counts().reindex(zs, fill_value=0).sort_index().to_numpy()
        fcum = np.cumsum(f)
        m_mid = fcum - f / 2
        den = b_mid * (nn - b_mid) - nn * h / 4
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = (h / nn) * (nn * m_mid - ni * b_mid) ** 2 / den / ni
        contrib = np.nansum(np.where(den > 0, terms, np.nan))
        assert abs(out.loc[et].ad_contrib - contrib) < 1e-5
        assert out.loc[et].n_group == ni
        total += contrib
    a2 = (nn - 1) / nn * total
    assert abs(out.a2_akn.iloc[0] - a2) < 1e-4


def test_stream_session_then_agg_matches_session_walk(spark, ev):
    gap = pd.Timedelta(minutes=30)
    wm = ev.ts.max() - pd.Timedelta(seconds=3600)
    sessions = []
    for uid, g in ev.sort_values("ts").groupby("user_id"):
        start = prev = None
        n = 0
        sv = 0
        for t, v in zip(g.ts, g.value):
            if prev is None or t - prev >= gap:
                if prev is not None:
                    sessions.append((start, prev + gap, n, sv))
                start, n, sv = t, 0, 0
            n += 1
            sv += int(round(v * 100))
            prev = t
        sessions.append((start, prev + gap, n, sv))
    rows = []
    for start, end, n, sv in sessions:
        day = (end - pd.Timedelta(microseconds=1)).floor("D")
        if day + pd.Timedelta(days=1) <= wm:
            rows.append(
                (day, n, sv, (end - start) / pd.Timedelta(seconds=1))
            )
    naive = (
        pd.DataFrame(rows, columns=["day", "n", "sv", "dur"])
        .groupby("day")
        .agg(n_sessions=("n", "size"), n_events=("n", "sum"),
             sum_cents=("sv", "sum"), dur=("dur", "sum"))
    )
    out = QUERIES["stream_session_then_agg"](spark, SF_DIR).toPandas()
    out["day"] = pd.to_datetime(out.day_epoch, unit="s")
    out = out.set_index("day").sort_index()
    assert list(out.index) == list(naive.index)
    for day, r in naive.iterrows():
        o = out.loc[day]
        assert o.n_sessions == r.n_sessions and o.n_events == r.n_events
        assert abs(o.sum_value - r.sum_cents / 100) < 1e-6
        assert abs(o.avg_session_seconds - r.dur / r.n_sessions) < 1e-5


# ----------------------------- second round-12 batch (same contract)


def test_page_trend_matches_literal_blocks(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["day"] = d.ts.dt.floor("D")
    d["part"] = d.ts.dt.hour // 6
    cells = (
        d.assign(vmq=np.round(d.value.to_numpy() * 1e6).astype(np.int64))
        .groupby(["day", "part"])["vmq"].agg(["sum", "count"])
    )
    cells["mq"] = np.round(cells["sum"] / cells["count"]).astype(np.int64)
    piv = cells["mq"].unstack().dropna()
    b, k = len(piv), 4
    ranks = piv.rank(axis=1, method="average")
    rj = ranks.sum(axis=0)  # indexed by part 0..3
    l_stat = sum((j + 1) * rj[j] for j in range(4))
    e_l = b * k * (k + 1) ** 2 / 4
    var_l = b * k**2 * (k + 1) ** 2 * (k - 1) / 144
    row = QUERIES["page_trend_test"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_blocks == b and row.k == k
    assert abs(row.page_l - l_stat) < 1e-6
    assert abs(row.page_z - (l_stat - e_l) / math.sqrt(var_l)) < 1e-6


def test_jonckheere_matches_literal_pair_loops(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["part"] = d.ts.dt.hour // 6
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    groups = {g: sub.vq.to_numpy() for g, sub in d.groupby("part")}
    keys = sorted(groups)
    j_stat = 0.0
    for a_i in range(len(keys)):
        for b_i in range(a_i + 1, len(keys)):
            x, y = groups[keys[a_i]], groups[keys[b_i]]
            j_stat += (x[:, None] < y[None, :]).sum()
            j_stat += 0.5 * (x[:, None] == y[None, :]).sum()
    n = len(d)
    sizes = np.array([len(v) for v in groups.values()], dtype=np.int64)
    e_j = (n * n - (sizes**2).sum()) / 4
    var_j = (
        n * n * (2 * n + 3) - (sizes**2 * (2 * sizes + 3)).sum()
    ) / 72
    row = (
        QUERIES["jonckheere_terpstra_dayparts"](spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert row.n_rows == n
    assert abs(row.jt_stat - j_stat) < 1e-6
    assert abs(row.jt_expected - e_j) < 1e-6
    assert abs(row.jt_z - (j_stat - e_j) / math.sqrt(var_j)) < 1e-6


def test_spectral_entropy_matches_numpy_periodogram(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["hour"] = d.ts.dt.floor("h")
    cells = (
        d.assign(vmq=np.round(d.value.to_numpy() * 1e6).astype(np.int64))
        .groupby("hour")["vmq"].agg(["sum", "count"]).sort_index()
    )
    y = (cells["sum"] / cells["count"] / 1e6).to_numpy()
    n = len(y)
    e = y - y.mean()
    idx = np.arange(n)
    i_j = np.array([
        (e * np.cos(2 * np.pi * j * idx / n)).sum() ** 2
        + (e * np.sin(2 * np.pi * j * idx / n)).sum() ** 2
        for j in range(1, (n - 1) // 2 + 1)
    ])
    p = i_j / i_j.sum()
    se = -(p[p > 0] * np.log(p[p > 0])).sum()
    row = QUERIES["spectral_entropy_hourly"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_freqs == len(i_j)
    assert abs(row.spectral_entropy - se) < 1e-4
    assert abs(row.spectral_entropy_norm - se / math.log(len(i_j))) < 1e-4
    assert abs(row.peak_share - p.max()) < 1e-4
    assert 0 <= row.spectral_entropy_norm <= 1


def test_rayleigh_matches_numpy_trig(spark, ev):
    us = ev.ts.astype("datetime64[us]").astype(np.int64)
    theta = 2 * np.pi * (us % 86_400_000_000) / 86_400_000_000
    n = len(theta)
    c, s = np.cos(theta).sum(), np.sin(theta).sum()
    r = math.hypot(c, s) / n
    row = QUERIES["rayleigh_event_times"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_events == n
    assert abs(row.mean_cos - c / n) < 1e-6
    assert abs(row.mean_sin - s / n) < 1e-6
    assert abs(row.resultant_r - r) < 1e-6
    assert abs(row.rayleigh_z - n * r * r) < 1e-4


@pytest.fixture(scope="module")
def ols(ev):
    d = ev[ev.value.notna()].copy()
    h = ev.ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
    d["x"] = (h - h.min()).astype(float)[ev.value.notna()]
    d["y"] = np.round(d.value.to_numpy() * 100).astype(np.int64).astype(float)
    slope, intercept = np.polyfit(d.x, d.y, 1)
    d["e"] = d.y - intercept - slope * d.x
    return d


def test_breusch_pagan_matches_numpy_aux_regression(spark, ols):
    d = ols
    z = d.e**2
    r = np.corrcoef(d.x, z)[0, 1]
    lm = len(d) * r * r
    row = QUERIES["breusch_pagan_lm"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_rows == len(d)
    assert abs(row.bp_lm - lm) < 1e-3  # milli-quantized residual squares


def test_cooks_distance_matches_numpy_influence(spark, ols):
    d = ols
    n = len(d)
    sxx = ((d.x - d.x.mean()) ** 2).sum()
    h = 1 / n + (d.x - d.x.mean()) ** 2 / sxx
    mse = (d.e**2).sum() / (n - 2)
    cd = d.e**2 * h / (2 * mse * (1 - h) ** 2)
    frame = pd.DataFrame(
        {"event_id": d.event_id, "cd": cd, "h": h}
    ).sort_values(["cd", "event_id"], ascending=[False, True])
    top = frame.head(25)
    out = QUERIES["cooks_distance_topk"](spark, SF_DIR).toPandas()
    assert set(out.event_id) == set(top.event_id)
    got = out.set_index("event_id")
    for _, r in top.iterrows():
        assert abs(got.loc[r.event_id].cooks_d - r.cd) < 1e-6
        assert abs(got.loc[r.event_id].leverage - r.h) < 1e-6


def test_rbo_matches_literal_prefix_overlap(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    import re

    tf: dict = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        c = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
        tf[r.doc_id] = c
    df: dict = {}
    for c in tf.values():
        for t in c:
            df[t] = df.get(t, 0) + 1
    n_docs = len(tf)
    total_len = sum(sum(c.values()) for c in tf.values())
    avg_dl = total_len / n_docs
    out = QUERIES["rbo_rank_agreement"](spark, SF_DIR).toPandas().set_index(
        "query_id"
    )
    p = 0.9
    for q in (0, 7, 42):
        qv = m[ids == q][0]
        cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
        dense = [
            vid for _, vid in sorted(
                ((-round(c, 6), vid) for vid, c in zip(ids, cos) if vid != q)
            )[:20]
        ]
        scores = {}
        dlq = {d: sum(c.values()) for d, c in tf.items()}
        for t in tf[q]:
            idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            for d, c in tf.items():
                if d == q or t not in c:
                    continue
                tfx = c[t]
                term = idf * tfx * 2.2 / (
                    tfx + 1.2 * (0.25 + 0.75 * dlq[d] / avg_dl)
                )
                scores[d] = scores.get(d, 0) + round(term * 1e9)
        lex = [d for _, d in sorted(
            ((-s, d) for d, s in scores.items())
        )[:20]]
        rbo = 0.0
        for depth in range(1, 21):
            x = len(set(dense[:depth]) & set(lex[:depth]))
            rbo += (1 - p) * p ** (depth - 1) * x / depth
        r = out.loc[q]
        assert r.overlap_at_10 == len(set(dense[:10]) & set(lex[:10]))
        assert r.overlap_at_20 == len(set(dense[:20]) & set(lex[:20]))
        assert abs(r.rbo_min - rbo) < 1e-6


# ----------------------------- third round-12 batch (same contract)


def test_pettitt_matches_literal_u_walk(spark, ev):
    day = ev.ts.dt.floor("D").astype("datetime64[us]").astype(np.int64) // 1_000_000
    y = pd.DataFrame({"day": day}).groupby("day").size()
    days = list(y.index)
    vals = y.to_numpy()
    n = len(vals)
    best = None
    for ti, t in enumerate(days):
        u = 0
        for i in range(n):
            for j in range(n):
                if days[i] <= t < days[j]:
                    u += int(np.sign(vals[j] - vals[i]))
        if best is None or abs(u) > best[1]:
            best = (t, abs(u), u)
    t_star, k, u_at = best
    row = QUERIES["pettitt_changepoint_daily"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == n
    assert row.k_stat == k and row.change_day_epoch == t_star
    assert row.u_at_change == u_at
    assert abs(row.p_approx - 2 * math.exp(-6 * k * k / (n**3 + n**2))) < 1e-6


def test_seasonal_mann_kendall_matches_pair_loops(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["season"] = d.ts.dt.hour
    d["day"] = d.ts.dt.floor("D")
    cells = (
        d.assign(vmq=np.round(d.value.to_numpy() * 1e6).astype(np.int64))
        .groupby(["season", "day"])["vmq"].agg(["sum", "count"])
    )
    cells["mq"] = np.round(cells["sum"] / cells["count"]).astype(np.int64)
    s_total, var_total, n_seasons = 0, 0.0, 0
    for season, g in cells.groupby(level="season"):
        mq = g["mq"].sort_index(level="day").to_numpy()
        n = len(mq)
        s = sum(
            int(np.sign(mq[j] - mq[i]))
            for i in range(n) for j in range(i + 1, n)
        )
        ties = pd.Series(mq).value_counts()
        tie = sum(t * (t - 1) * (2 * t + 5) for t in ties if t > 1)
        var_total += (n * (n - 1) * (2 * n + 5) - tie) / 18
        s_total += s
        n_seasons += 1
    z = (s_total - np.sign(s_total)) / math.sqrt(var_total)
    row = QUERIES["seasonal_mann_kendall"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_seasons == n_seasons and row.s_total == s_total
    assert abs(row.var_total - var_total) < 1e-5
    assert abs(row.z - z) < 1e-6


def test_bartels_matches_literal_rank_ratio(spark, ev):
    day = ev.ts.dt.floor("D").astype("datetime64[us]").astype(np.int64) // 1_000_000
    y = pd.DataFrame({"day": day}).groupby("day").size().sort_index()
    r = y.rank(method="average").to_numpy()
    n = len(r)
    rvn = ((r[:-1] - r[1:]) ** 2).sum() / ((r - r.mean()) ** 2).sum()
    var = 4 * (n - 2) * (5 * n * n - 2 * n - 9) / (
        5 * n * (n + 1) * (n - 1) ** 2
    )
    row = QUERIES["bartels_rank_randomness"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == n
    assert abs(row.rvn - rvn) < 1e-9
    assert abs(row.z - (rvn - 2) / math.sqrt(var)) < 1e-6


def test_link_prediction_scores_matches_set_algebra(spark, ev):
    # rebuild the minute-bucket co-activity graph from raw events (the
    # 64-cap never binds at sf0.001's 15 users)
    from collections import defaultdict

    mins = ev.ts.values.astype("datetime64[m]")
    act = pd.DataFrame({"b": mins, "u": ev.user_id}).drop_duplicates()
    edges = set()
    for _, sub in act.groupby("b"):
        us = sorted(sub.u)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                edges.add((int(us[i]), int(us[j])))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cand = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            cn = len(common)
            cand.append((
                -cn, a, b,
                cn / (len(adj[a]) + len(adj[b]) - cn),
                sum(1 / math.log(len(adj[z])) for z in common),
                sum(1 / len(adj[z]) for z in common),
                len(adj[a]) * len(adj[b]),
            ))
    cand.sort()
    # row ORDER is not part of the contract (the driver compare
    # sorts; the r13 head-side broadcast changed presentation order)
    # — compare the top-25 SELECTION, sorted by the same key
    out = (
        QUERIES["link_prediction_scores"](spark, SF_DIR)
        .toPandas()
        .sort_values(
            ["common_neighbors", "user_a", "user_b"],
            ascending=[False, True, True],
        )
        .reset_index(drop=True)
    )
    assert len(out) == min(25, len(cand))
    for o, (negcn, a, b, jac, aa, ra, pa) in zip(out.itertuples(), cand[:25]):
        assert (o.user_a, o.user_b, o.common_neighbors) == (a, b, -negcn)
        assert abs(o.jaccard - jac) < 1e-6
        assert abs(o.adamic_adar - aa) < 1e-6
        assert abs(o.resource_allocation - ra) < 1e-6
        assert o.pref_attachment == pa
