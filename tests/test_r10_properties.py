"""Oracle-INDEPENDENT validation of the round-10 statistics: each
query's math re-derived from the raw parquet with naive Python/numpy
(sequential folds, argsort ranks, brute-force scans) and compared to
the engine output. The DuckDB oracle gate proves Spark and DuckDB
agree; these tests prove the agreed-on value is the RIGHT value — the
same independence argument as the power-iteration-vs-numpy pin
(tests/test_r9_invariants.py).

All at sf0.001 (small enough for O(n log n)/O(n*k) naive passes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
EMB = f"{SF_DIR}/embeddings.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")  # engine truncates ns->us
    return df


def test_kruskal_wallis_matches_naive_ranks(spark, ev):
    """Tie-corrected H from scipy-style average ranks over the same
    milli-quantized values (independent: argsort, not prefix sums)."""
    d = ev[ev.value.notna()]
    vq = np.round(d.value.to_numpy() * 1000).astype(np.int64)
    groups = d.event_type.to_numpy()
    order = np.argsort(vq, kind="stable")
    ranks = np.empty(len(vq), dtype=np.float64)
    sv = vq[order]
    i = 0
    pos = 1
    tie_sum = 0.0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        c = j - i
        avg = pos + (c - 1) / 2.0
        ranks[order[i:j]] = avg
        tie_sum += c**3 - c
        pos += c
        i = j
    n = len(vq)
    h = 0.0
    for g in np.unique(groups):
        r = ranks[groups == g]
        h += r.sum() ** 2 / len(r)
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    h_corr = h / (1.0 - tie_sum / (n**3 - n))
    rows = QUERIES["kruskal_wallis_value_by_type"](spark, SF_DIR).collect()
    assert abs(rows[0].h_tie_corrected - h_corr) < 1e-4
    assert abs(rows[0].h_stat - h) < 1e-4
    by_type = {r.event_type: r for r in rows}
    for g in np.unique(groups):
        assert abs(by_type[g].mean_rank - ranks[groups == g].mean()) < 1e-4


def test_brown_forsythe_matches_naive(spark, ev):
    d = ev[ev.value.notna()]
    z = {}
    for g, sub in d.groupby("event_type"):
        z[g] = np.abs(sub.value.to_numpy() - np.median(sub.value.to_numpy()))
    n = sum(len(v) for v in z.values())
    k = len(z)
    zbar = np.concatenate(list(z.values())).mean()
    ssb = sum(len(v) * (v.mean() - zbar) ** 2 for v in z.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in z.values())
    w = ((n - k) / (k - 1)) * ssb / ssw
    rows = QUERIES["brown_forsythe_variance_by_type"](spark, SF_DIR).collect()
    assert abs(rows[0].bf_w_stat - w) < 1e-4
    by_type = {r.event_type: r for r in rows}
    for g, v in z.items():
        assert abs(by_type[g].mean_absdev - v.mean()) < 1e-5


def test_durbin_watson_matches_naive(spark, ev):
    d = ev[ev.value.notna()].sort_values(["user_id", "ts", "event_id"])
    rows = {r.user_id: r for r in QUERIES["durbin_watson_per_device"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        v = np.round(sub.value.to_numpy() * 1e6)
        if len(v) < 8 or np.allclose(v, v[0]):
            assert u not in rows or len(v) >= 8
            continue
        num = (np.diff(v) ** 2).sum()
        den = ((v - v.mean()) ** 2).sum()
        dw = num / den
        assert abs(rows[u].dw_stat - dw) < 1e-4, u
        checked += 1
    assert checked >= 10


def test_croston_matches_sequential_fold(spark, ev):
    """The closed-form expansion vs an ACTUAL step-by-step EWMA fold."""
    a = 0.2
    d = ev[ev.event_type == "purchase"].copy()
    d["day"] = (d.ts.values.astype("datetime64[D]")).astype("datetime64[s]").astype(np.int64) // 86400
    rows = {r.user_id: r for r in QUERIES["croston_intermittent_demand"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in d.groupby("user_id"):
        counts = sub.groupby("day").size().sort_index()
        days = counts.index.to_numpy()
        q = counts.to_numpy()
        if len(days) < 2:
            assert u not in rows
            continue
        z = float(q[0])
        for x in q[1:]:
            z = a * x + (1 - a) * z
        gaps = np.diff(days)
        p = float(gaps[0])
        for x in gaps[1:]:
            p = a * x + (1 - a) * p
        r = rows[u]
        assert abs(r.size_ewma - z) < 1e-4, u
        assert abs(r.interval_ewma - p) < 1e-4, u
        assert abs(r.croston_forecast - z / p) < 1e-4, u
        checked += 1
    assert checked >= 10


def test_mase_matches_naive(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["day"] = d.ts.values.astype("datetime64[D]").astype(np.int64)
    d["vmic"] = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    daily = d.groupby(["user_id", "day"]).vmic.sum()
    dmax = d.day.max()
    rows = {r.user_id: r for r in QUERIES["mase_daily_per_device"](spark, SF_DIR).collect()}
    checked = 0
    for u in d.user_id.unique():
        s = daily.loc[u]
        tr, te = [], []
        for day, y in s.items():
            if (day - 7) in s.index:
                (te if day > dmax - 7 else tr).append(abs(y - s.loc[day - 7]))
        if not tr or not te or sum(tr) == 0:
            assert u not in rows
            continue
        mase = (sum(te) / len(te)) / (sum(tr) / len(tr))
        r = rows[u]
        assert r.n_train == len(tr) and r.n_test == len(te), u
        assert abs(r.mase - mase) < 1e-5, u
        checked += 1
    assert checked >= 10


def test_cochran_armitage_matches_naive(spark, ev):
    hr = ev.ts.dt.hour.to_numpy()
    is_p = (ev.event_type == "purchase").to_numpy()
    n, r_tot = len(ev), int(is_p.sum())
    a = float((hr * is_p).sum())
    b = float(hr.sum())
    c = float((hr.astype(np.int64) ** 2).sum())
    z = (n * a - r_tot * b) * np.sqrt(n) / np.sqrt(
        r_tot * (n - r_tot) * (n * c - b * b)
    )
    row = QUERIES["cochran_armitage_hour_trend"](spark, SF_DIR).collect()[0]
    assert row.n_total == n and row.n_purchase == r_tot
    assert abs(row.ca_z_trend - z) < 1e-5


def _u32(event_id: int) -> float:
    h = int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


def test_priority_sample_matches_bruteforce(spark, ev):
    from iot_etl_spark.plans.queries_analytics7 import PRIORITY_K

    d = ev[(ev.value.notna()) & (ev.value > 0)]
    rows = QUERIES["priority_sample_per_type"](spark, SF_DIR).collect()
    got = {}
    for r in rows:
        got.setdefault(r.event_type, set()).add(r.event_id)
    for g, sub in d.groupby("event_type"):
        prio = [
            (v / _u32(int(e)), int(e))
            for e, v in zip(sub.event_id, sub.value)
        ]
        prio.sort(key=lambda t: (-t[0], t[1]))
        top = {e for _, e in prio[:PRIORITY_K]}
        assert got[g] == top, g
        # HT estimate: sum(max(w, tau)) over the sample
        tau = prio[PRIORITY_K][0] if len(prio) > PRIORITY_K else 0.0
        byid = dict(zip(sub.event_id.astype(int), sub.value))
        est = sum(max(byid[e], tau) for e in top)
        ht = next(r.ht_total_estimate for r in rows if r.event_type == g)
        assert abs(ht - est) < 1e-4, g


def test_silhouette_matches_numpy(spark):
    emb = pd.read_parquet(EMB)
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    labels = emb.label.to_numpy()
    uniq = np.unique(labels)
    def round_half_away(v, nd=6):
        # Spark's ROUND is HALF_UP (away from zero); np.round is
        # banker's — a centroid component on a 5e-7 tie would flip a
        # near-boundary point's silhouette sign
        s = 10.0 ** nd
        return np.sign(v) * np.floor(np.abs(v) * s + 0.5) / s

    cents = np.stack([
        round_half_away(x[labels == l].mean(axis=0)) for l in uniq
    ])
    d = np.sqrt(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    own_idx = np.searchsorted(uniq, labels)
    a = d[np.arange(len(x)), own_idx]
    dm = d.copy()
    dm[np.arange(len(x)), own_idx] = np.inf
    b = dm.min(axis=1)
    s = np.where(a > b, (b - a) / a, np.where(b > a, (b - a) / b, 0.0))
    rows = QUERIES["silhouette_by_label"](spark, SF_DIR).collect()
    for r in rows:
        m = labels == r.label
        assert r.n_vectors == int(m.sum())
        assert abs(r.mean_silhouette - s[m].mean()) < 1e-5, r.label
        # engine output is ROUND(x, 6): tolerance must cover the
        # quantization step, not just float noise
        assert abs(r.frac_negative - (s[m] < 0).mean()) < 5e-7, r.label
        assert abs(r.mean_intra_dist - a[m].mean()) < 1e-5, r.label
        assert abs(r.mean_nearest_dist - b[m].mean()) < 1e-5, r.label


def test_int8_recall_matches_numpy(spark):
    from iot_etl_spark.plans.queries_embed import INT8_RECALL_BATCH, INT8_RECALL_K

    emb = pd.read_parquet(EMB).sort_values("vec_id")
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    m = np.abs(x).max(axis=1)
    codes = np.clip(np.floor(x * 127.0 / m[:, None] + 0.5), -127, 127)
    scale = m / 127.0

    def topk(scores, qi):
        s = np.round(scores, 6)
        s[qi] = -np.inf
        order = np.lexsort((ids, -s))
        return set(ids[order[:INT8_RECALL_K]])

    rows = {r.q_id: r for r in QUERIES["int8_recall_audit"](spark, SF_DIR).collect()}
    for qi in range(INT8_RECALL_BATCH):
        exact = topk(x @ x[qi], qi)
        quant = topk((codes @ codes[qi]) * scale * scale[qi], qi)
        want = len(exact & quant)
        assert rows[qi].n_kept == want, qi
