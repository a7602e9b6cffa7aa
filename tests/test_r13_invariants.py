"""Round-13 oracle-INDEPENDENT validation: every round-13 registration
re-derived from the raw parquet with naive Python/numpy/pandas
(literal pair loops, pandas midranks, python-set sketches, per-triple
pattern walks) and pinned equal to the engine output. The DuckDB gate
proves Spark == DuckDB; these prove the agreed value is the RIGHT
value — the check that caught the Chow/EWMA shared-formula bugs in
round 11.

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
DOCS = f"{SF_DIR}/documents.parquet"


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


@pytest.fixture(scope="module")
def daily(ev):
    """Exact daily centi-unit totals, date-ordered."""
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    return (
        d.groupby(d.ts.dt.floor("D"))["vq"].sum().sort_index()
        .to_numpy().astype(np.int64)
    )


@pytest.fixture(scope="module")
def shingle_sides():
    """(even_side_set, odd_side_set) of distinct 3-gram shingles."""
    docs = pd.read_parquet(DOCS)
    sides: list[set] = [set(), set()]
    for doc_id, text in zip(docs.doc_id, docs.text):
        ws = text.split(" ")
        sides[int(doc_id) % 2] |= {
            " ".join(ws[i : i + 3]) for i in range(max(len(ws) - 2, 0))
        }
    return sides[0], sides[1]


# --------------------------------------------------- circular / hours


def test_kuiper_matches_literal_cdf_scan(spark, ev):
    h = ev.ts.dt.hour.to_numpy()
    n = len(h)
    counts = np.bincount(h, minlength=24)
    cum = np.cumsum(counts)
    grid = (np.arange(1, 25)) / 24.0
    dplus = (cum / n - grid).max()
    dminus = (grid - (cum - counts) / n).max()
    v = dplus + dminus
    row = QUERIES["kuiper_test_hours"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_events == n
    assert abs(row.d_plus - dplus) < 1e-6
    assert abs(row.d_minus - dminus) < 1e-6
    assert abs(row.kuiper_v - v) < 1e-6
    assert abs(
        row.kuiper_vstar - v * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    ) < 1e-6
    # both one-sided sups are nonnegative by construction (the CDFs
    # cross the uniform at least once), and V* >= V for n >= 1
    assert row.d_plus >= 0 and row.d_minus >= 0
    assert row.kuiper_vstar >= row.kuiper_v


# ----------------------------------------------- effect-size panel


def test_cliffs_delta_matches_brute_force_pairs(spark, we_split):
    x, y = we_split  # weekday, weekend
    n, m = len(x), len(y)
    gt = int((y[:, None] > x[None, :]).sum())  # weekend > weekday
    lt = int((y[:, None] < x[None, :]).sum())
    eq = int((y[:, None] == x[None, :]).sum())
    delta = (gt - lt) / (n * m)
    vda = (gt + 0.5 * eq) / (n * m)
    xw, xe = x / 100.0, y / 100.0
    dmean = xe.mean() - xw.mean()
    ssw = ((xw - xw.mean()) ** 2).sum()
    sse = ((xe - xe.mean()) ** 2).sum()
    d = dmean / math.sqrt((ssw + sse) / (n + m - 2))
    g = d * (1 - 3 / (4 * (n + m) - 9))
    row = QUERIES["cliffs_delta_weekend"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_weekday == n and row.n_weekend == m
    assert abs(row.cliffs_delta - delta) < 1e-6
    assert abs(row.vargha_delaney_a - vda) < 1e-6
    assert abs(row.cohens_d - d) < 1e-5
    assert abs(row.hedges_g - g) < 1e-5
    # consistency: delta = 2A - 1 up to rounding
    assert abs(row.cliffs_delta - (2 * row.vargha_delaney_a - 1)) < 2e-6


def test_mood_scale_matches_literal_midranks(spark, we_split):
    x, y = we_split
    n, m = len(x), len(y)
    nn = n + m
    pooled = pd.Series(np.concatenate([x, y]))
    ranks = pooled.rank(method="average").to_numpy()
    t = ((ranks[:n] - (nn + 1) / 2) ** 2).sum()
    mean_h0 = n * (nn**2 - 1) / 12
    var_h0 = n * m * (nn + 1) * (nn**2 - 4) / 180
    row = QUERIES["mood_scale_test"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_weekday == n and row.n_weekend == m
    assert abs(row.mood_t - t) < 1e-6
    assert abs(row.t_mean_h0 - mean_h0) < 1e-6
    assert abs(row.z_stat - (t - mean_h0) / math.sqrt(var_h0)) < 1e-6


# ------------------------------------------------- daily-series panel


def test_von_neumann_matches_literal_diffs(spark, daily):
    d = daily.astype(float)
    n = len(d)
    vn = (np.diff(d) ** 2).sum() / ((d - d.mean()) ** 2).sum()
    z = (vn - 2 * n / (n - 1)) / math.sqrt(
        4 * (n - 2) / ((n + 1) * (n - 1) ** 2)
    )
    row = QUERIES["von_neumann_ratio_daily"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == n
    assert abs(row.von_neumann_ratio - vn) < 1e-6
    assert abs(row.z_stat - z) < 1e-6


def test_cox_stuart_matches_literal_signs(spark, daily):
    n = len(daily)
    k = n // 2
    off = n - k
    first, second = daily[:k], daily[off : off + k]
    plus = int((second > first).sum())
    minus = int((second < first).sum())
    mm = plus + minus
    if mm == 0:
        z = 0.0
    else:
        z = (1 if plus >= minus else -1) * max(
            abs(plus - mm / 2) - 0.5, 0
        ) / math.sqrt(mm / 4)
    row = QUERIES["cox_stuart_trend"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == n
    assert row.n_plus == plus and row.n_minus == minus
    assert abs(row.z_stat - z) < 1e-6


def test_permutation_entropy_matches_literal_patterns(spark, daily):
    pats: dict[int, int] = {}
    for i in range(len(daily) - 2):
        a, b, c = daily[i], daily[i + 1], daily[i + 2]
        pid = 4 * (b < a) + 2 * (c < a) + (c < b)
        pats[pid] = pats.get(pid, 0) + 1
    t = sum(pats.values())
    h = -sum(c / t * math.log(c / t) for c in pats.values())
    row = (
        QUERIES["permutation_entropy_daily"](spark, SF_DIR).toPandas().iloc[0]
    )
    assert row.n_triples == t
    assert row.n_patterns == len(pats)
    assert abs(row.perm_entropy - h) < 1e-6
    assert abs(row.perm_entropy_norm - h / math.log(6)) < 1e-6
    assert 0 <= row.perm_entropy_norm <= 1 + 1e-9


def test_sample_entropy_matches_literal_template_loop(spark, daily):
    d = daily
    n = len(d)
    sd = math.sqrt(((d - d.mean()) ** 2).sum() / (n - 1))
    r = round(0.2 * sd)
    # templates of length 2 start at i = 0..n-2 (inclusive), length 3
    # need i+2 < n; self-matches excluded, unordered pairs i < j
    b_cnt = a_cnt = 0
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if abs(int(d[i]) - int(d[j])) <= r and abs(
                int(d[i + 1]) - int(d[j + 1])
            ) <= r:
                b_cnt += 1
                if (
                    i + 2 < n
                    and j + 2 < n
                    and abs(int(d[i + 2]) - int(d[j + 2])) <= r
                ):
                    a_cnt += 1
    row = QUERIES["sample_entropy_daily"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == n
    assert row.r_centi == r
    assert row.b_cnt == b_cnt and row.a_cnt == a_cnt
    if a_cnt and b_cnt:
        assert abs(row.sampen - (-math.log(a_cnt / b_cnt))) < 1e-6


# ------------------------------------------------ blocked / reliability


def test_quade_matches_literal_pandas_ranks(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    d["day"] = d.ts.dt.floor("D")
    obs = d.pivot_table(
        index="day", columns="event_type", values="vq", aggfunc="sum",
        fill_value=0,
    ).astype(np.int64)
    b, k = obs.shape
    r = obs.rank(axis=1, method="average").to_numpy()
    rge = (obs.max(axis=1) - obs.min(axis=1)).to_frame("r")
    q = rge.rank(method="average").to_numpy().ravel()
    s = q[:, None] * (r - (k + 1) / 2)
    a_stat = (s**2).sum()
    b_stat = (s.sum(axis=0) ** 2).sum() / b
    f = (b - 1) * b_stat / (a_stat - b_stat)
    row = QUERIES["quade_test_blocks"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_blocks == b and row.n_treatments == k
    assert abs(row.quade_f - f) < 1e-6


def test_cronbach_alpha_matches_literal_pivot(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    d["day"] = d.ts.dt.floor("D")
    d["hour"] = d.ts.dt.hour
    mat = d.pivot_table(
        index="day", columns="hour", values="vq", aggfunc="sum", fill_value=0
    ).reindex(columns=range(24), fill_value=0).astype(float)
    k = 24
    item_vars = mat.var(axis=0, ddof=1)
    total_var = mat.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - item_vars.sum() / total_var)
    rbar = alpha / (k - alpha * (k - 1))
    row = QUERIES["cronbach_alpha_hours"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_days == mat.shape[0] and row.n_items == 24
    assert abs(row.cronbach_alpha - alpha) < 1e-6
    assert abs(row.avg_interitem_r - rbar) < 1e-6


def test_icc_matches_literal_anova_decomposition(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    g = d.groupby("event_type")["vq"]
    n_i = g.count().to_numpy().astype(float)
    s_i = g.sum().to_numpy().astype(float)
    ss_i = (d.groupby("event_type")["vq"].apply(
        lambda v: (v.to_numpy().astype(float) ** 2).sum()
    )).to_numpy()
    k, n = len(n_i), n_i.sum()
    btw = (s_i**2 / n_i).sum() - s_i.sum() ** 2 / n
    win = ss_i.sum() - (s_i**2 / n_i).sum()
    msb, msw = btw / (k - 1), win / (n - k)
    n0 = (n - (n_i**2).sum() / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    row = QUERIES["icc_oneway_types"](spark, SF_DIR).toPandas().iloc[0]
    assert row.k == k and row.n_total == n
    assert abs(row.n0 - n0) < 1e-6
    assert abs(row.icc1 - icc) < 1e-6
    assert -1 <= row.icc1 <= 1


# --------------------------------------------------------- normality


def test_dagostino_k2_matches_literal_transforms(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["vq"] = np.round(d.value.to_numpy() * 100).astype(np.int64)
    out = QUERIES["dagostino_k2_normality"](spark, SF_DIR).toPandas()
    assert set(out.event_type) == set(d.event_type.unique())
    for _, row in out.iterrows():
        v = d[d.event_type == row.event_type].vq.to_numpy().astype(float)
        n = len(v)
        m2 = ((v - v.mean()) ** 2).mean()
        m3 = ((v - v.mean()) ** 3).mean()
        m4 = ((v - v.mean()) ** 4).mean()
        b1 = m3 / m2**1.5
        b2 = m4 / m2**2
        assert row.n_group == n
        assert abs(row.skew_g1 - b1) < 1e-5
        assert abs(row.ex_kurtosis - (b2 - 3)) < 1e-5
        # skewtest (D'Agostino 1970)
        y = b1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
        beta2 = (
            3 * (n**2 + 27 * n - 70) * (n + 1) * (n + 3)
            / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
        )
        w2 = -1 + math.sqrt(2 * (beta2 - 1))
        delta = 1 / math.sqrt(0.5 * math.log(w2))
        alpha = math.sqrt(2 / (w2 - 1))
        z1 = delta * math.asinh(y / alpha)
        # kurtosistest (Anscombe-Glynn 1983)
        ek = 3 * (n - 1) / (n + 1)
        vk = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
        xk = (b2 - ek) / math.sqrt(vk)
        sb1 = (
            6 * (n**2 - 5 * n + 2) / ((n + 7) * (n + 9))
            * math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
        )
        aa = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / sb1**2))
        term = (1 - 2 / aa) / (1 + xk * math.sqrt(2 / (aa - 4)))
        z2 = (1 - 2 / (9 * aa) - math.copysign(abs(term) ** (1 / 3), term)) / (
            math.sqrt(2 / (9 * aa))
        )
        assert abs(row.z_skew - z1) < 1e-5
        assert abs(row.z_kurtosis - z2) < 1e-5
        assert abs(row.k2_stat - (z1**2 + z2**2)) < 1e-4


# ----------------------------------------------------------- sketches


def _h(s: str, nhex: int, off: int = 0) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[off : off + nhex], 16)


def test_kmv_matches_python_set_sketch(spark, shingle_sides):
    a_set, b_set = shingle_sides
    k = 512
    ha = sorted({_h(s, 12) for s in a_set})
    hb = sorted({_h(s, 12) for s in b_set})
    ska, skb = ha[:k], hb[:k]
    sku = sorted(set(ska) | set(skb))[:k]

    def est(sk):
        return float(len(sk)) if len(sk) < k else (k - 1) * 2**48 / sk[-1]

    row = QUERIES["kmv_distinct_setops"](spark, SF_DIR).toPandas().iloc[0]
    assert row.k_param == k
    assert row.n_a_exact == len(a_set) and row.n_b_exact == len(b_set)
    assert row.n_union_exact == len(a_set | b_set)
    assert row.n_inter_exact == len(a_set & b_set)
    assert abs(row.est_a - est(ska)) < 1e-6
    assert abs(row.est_b - est(skb)) < 1e-6
    assert abs(row.est_union - est(sku)) < 1e-6
    assert abs(row.est_inter - (est(ska) + est(skb) - est(sku))) < 1e-6
    # the estimator should land within 25% of truth when in the
    # estimation regime (binomial CI at K=512 is ~9%)
    if len(ska) == k:
        assert abs(row.est_a / row.n_a_exact - 1) < 0.25
    if len(sku) == k:
        assert abs(row.est_union / row.n_union_exact - 1) < 0.25


def test_bloom_fpr_matches_python_bitset(spark, shingle_sides):
    a_set, b_set = shingle_sides
    m = 65536
    probe = b_set - a_set
    bits = {
        _h(s, 8, off) % m for s in a_set for off in (0, 8, 16)
    }
    fp = sum(
        1
        for s in probe
        if all(_h(s, 8, off) % m in bits for off in (0, 8, 16))
    )
    row = QUERIES["bloom_filter_fpr_audit"](spark, SF_DIR).toPandas().iloc[0]
    assert row.m_bits == m and row.k_hashes == 3
    assert row.n_build == len(a_set)
    assert row.bits_set == len(bits)
    assert row.n_probe_neg == len(probe)
    assert row.false_pos == fp
    assert abs(row.fpr_observed - fp / len(probe)) < 1e-6
    yth = 1 - math.exp(3 * len(a_set) * math.log(1 - 1 / m))
    assert abs(row.fpr_theoretical - yth**3) < 1e-6
    # the observed rate should be in the theoretical ballpark (same
    # order of magnitude band; generous for hash-family variance)
    assert row.fpr_observed <= 5 * max(row.fpr_theoretical, 1e-4)


# ----------------------------------------------------- model QA / OLAP


def test_classifier_ks_matches_numpy_sup(spark):
    from iot_etl_spark.plans.queries_mlprep import quality_classifier_score

    cls = quality_classifier_score(spark, SF_DIR).toPandas()
    pos = np.sort(cls[cls.lang == "en"].quality_logit.to_numpy())
    neg = np.sort(cls[cls.lang != "en"].quality_logit.to_numpy())
    scores = np.unique(np.concatenate([pos, neg]))
    fp = np.searchsorted(pos, scores, side="right") / len(pos)
    fn = np.searchsorted(neg, scores, side="right") / len(neg)
    gaps = np.abs(fp - fn)
    ks = gaps.max()
    # argmax threshold with smallest-score tie-break: integer-exact
    # gap comparison on the engine side, float here — compare KS to
    # 1e-6 and check the threshold achieves the sup
    row = QUERIES["classifier_ks_separation"](spark, SF_DIR).toPandas().iloc[0]
    assert row.n_english == len(pos) and row.n_other == len(neg)
    assert abs(row.ks_stat - ks) < 1e-6
    i = int(np.searchsorted(scores, row.ks_threshold))
    assert abs(gaps[i] - ks) < 1e-9


def test_hhi_matches_pandas_merge(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    # HALF_UP like the engines' ROUND on doubles — np.round is
    # half-to-even and flips the exact half-cent products
    li = li.assign(
        revq=np.floor(
            li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100
            + 0.5
        ).astype(np.int64)
    )
    srev = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .groupby(["s_nationkey", "l_suppkey"])["revq"].sum().reset_index()
    )
    out = QUERIES["herfindahl_concentration"](spark, SF_DIR).toPandas()
    for _, row in out.iterrows():
        nk = nat[nat.n_name == row.nation].n_nationkey.iloc[0]
        rv = srev[srev.s_nationkey == nk].revq.to_numpy().astype(float)
        hhi = (rv**2).sum() / rv.sum() ** 2
        assert row.n_suppliers == len(rv)
        assert abs(row.total_revenue - round(rv.sum() / 100, 2)) < 1e-6
        assert abs(row.hhi - hhi) < 1e-6
        if len(rv) > 1:
            exp = (hhi - 1 / len(rv)) / (1 - 1 / len(rv))
            assert abs(row.hhi_normalized - exp) < 1e-6
    # shares sum to 1 -> HHI bounded by [1/n, 1]
    assert ((out.hhi <= 1 + 1e-9) & (out.hhi >= 1.0 / out.n_suppliers - 1e-9)).all()
