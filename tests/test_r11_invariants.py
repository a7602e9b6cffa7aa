"""Round-11 registration invariants: each new query's statistic
re-derived naively (Python loops / numpy / np.fft) from the raw
parquet and pinned equal to the engine output — the same
oracle-independence argument as the campaign modules, applied to the
round's own registrations from day one.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _round_half_up(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


def test_friedman_matches_naive_ranks(spark, ev):
    d = ev[ev.value.notna()]
    vmic = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    cells: dict = {}
    for (day, et), v in zip(
        zip(d.ts.dt.floor("D"), d.event_type), vmic
    ):
        s, c = cells.get((day, et), (0, 0))
        cells[(day, et)] = (s + int(v), c + 1)
    k = d.event_type.nunique()
    mq = {key: int(_round_half_up(s / c)) for key, (s, c) in cells.items()}
    days = sorted({day for day, _ in mq})
    full = [day for day in days
            if sum(1 for (dd, _) in mq if dd == day) == k]
    rank_sum: dict = {}
    b = len(full)
    for day in full:
        row = sorted(
            ((v, et) for (dd, et), v in mq.items() if dd == day)
        )
        vals = [v for v, _ in row]
        for v, et in row:
            lo = vals.index(v)  # first occurrence
            hi = lo + vals.count(v)
            avg_rank = (lo + 1 + hi) / 2.0
            rank_sum[et] = rank_sum.get(et, 0.0) + avg_rank
    srq = sum(r * r for r in rank_sum.values())
    q_stat = 12.0 / (b * k * (k + 1)) * srq - 3.0 * b * (k + 1)
    rows = QUERIES["friedman_test_day_blocks"](spark, SF_DIR).collect()
    for r in rows:
        assert r.n_blocks == b
        assert abs(r.mean_rank - rank_sum[r.event_type] / b) < 1e-6
        assert abs(r.friedman_q - q_stat) < 1e-4


def test_mood_median_matches_naive(spark, ev):
    d = ev[ev.value.notna()]
    vals = np.sort(d.value.to_numpy())
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]
    a_tot = int((d.value > med).sum())
    for r in QUERIES["mood_median_test"](spark, SF_DIR).collect():
        sub = d[d.event_type == r.event_type]
        nj, aj = len(sub), int((sub.value > med).sum())
        ea = nj * a_tot / n
        eb = nj * (n - a_tot) / n
        chi = (aj - ea) ** 2 / ea + ((nj - aj) - eb) ** 2 / eb
        assert r.grand_median == pytest.approx(med, abs=1e-9)
        assert (r.n_group, r.n_above) == (nj, aj)
        assert abs(r.expected_above - ea) < 1e-5
        assert abs(r.chi2_contrib - chi) < 1e-4


def test_grubbs_matches_naive_argmax(spark, ev):
    d = ev[ev.value.notna()]
    for r in QUERIES["grubbs_outlier_scan"](spark, SF_DIR).collect():
        sub = d[d.event_type == r.event_type]
        vq = np.round(sub.value.to_numpy() * 100).astype(np.int64)
        n, s = len(vq), int(vq.sum())
        dev = np.abs(n * vq - s)
        dmax = dev.max()
        picked = int(sub.event_id.to_numpy()[dev == dmax].min())
        var = vq.astype(float).var(ddof=1) / 1e4
        g = dmax / n / 100.0 / math.sqrt(var)
        assert r.n_values == n
        assert r.outlier_event_id == picked
        assert abs(r.variance - var) < 1e-4
        assert abs(r.g_stat - g) < 1e-5


def test_chow_matches_numpy_ols(spark, ev):
    """Independent OLS via numpy lstsq. This pin CAUGHT the original
    moment-formula implementation: at microsecond x magnitudes the
    double-precision cancellation syy - sy^2/n ... was ~5% wrong on
    BOTH engines (shared-verbatim formula -> invisible to the hash
    gate). The engine now forms the cancellations in exact
    DECIMAL(38,0) with x in whole seconds and y in centi-units."""
    d = ev[ev.value.notna()]
    t_us = (d.ts.astype("datetime64[ns]").astype("int64") // 10**3).to_numpy()
    t = t_us // 10**6  # whole seconds, the engine's x resolution
    y = np.round(d.value.to_numpy() * 100)
    t0, mid_us = t.min(), (t_us.min() + t_us.max()) // 2
    in_pre = t_us <= mid_us
    x = (t - t0).astype(float)

    def sse(xs, ys):
        A = np.column_stack([np.ones(len(xs)), xs])
        beta, *_ = np.linalg.lstsq(A, ys, rcond=None)
        return float(((A @ beta - ys) ** 2).sum()) / 1e4

    s1 = sse(x[in_pre], y[in_pre])
    s2 = sse(x[~in_pre], y[~in_pre])
    sp = sse(x, y)
    n = len(x)
    f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
    r = QUERIES["chow_break_test"](spark, SF_DIR).first()
    assert (r.n, r.n1, r.n2) == (n, int(in_pre.sum()), int((~in_pre).sum()))
    assert abs(r.sse_pooled - sp) < max(1e-4, 1e-9 * sp)
    assert abs(r.sse_pre - s1) < max(1e-4, 1e-9 * s1)
    assert abs(r.sse_post - s2) < max(1e-4, 1e-9 * s2)
    assert abs(r.chow_f - f) < 1e-4


def test_neyman_matches_literal_apportionment(spark, ev):
    d = ev[ev.value.notna()]
    strata = {}
    for et, sub in d.groupby("event_type"):
        vq = np.round(sub.value.to_numpy() * 1e6).astype(np.int64)
        n = len(vq)
        sd = math.sqrt(
            (float((vq.astype(object) ** 2).sum()) - float(vq.sum()) ** 2 / n)
            / (n - 1)
            / 1e12
        )
        strata[et] = (n, sd, int(_round_half_up(n * sd * 1e6)))

    def alloc(weights: dict, budget: int = 1000) -> dict:
        tw = sum(weights.values())
        base = {k: budget * w // tw for k, w in weights.items()}
        rem = {k: budget * w % tw for k, w in weights.items()}
        leftover = budget - sum(base.values())
        order = sorted(weights, key=lambda k: (-rem[k], k))
        for k in order[:leftover]:
            base[k] += 1
        return base

    a_ney = alloc({k: w for k, (_, _, w) in strata.items()})
    a_prop = alloc({k: n for k, (n, _, _) in strata.items()})
    for r in QUERIES["neyman_allocation_plan"](spark, SF_DIR).collect():
        n, sd, _ = strata[r.event_type]
        assert r.n_rows == n
        assert abs(r.stddev_value - sd) < 1e-5
        assert r.alloc_neyman == a_ney[r.event_type]
        assert r.alloc_proportional == a_prop[r.event_type]
    assert sum(a_ney.values()) == 1000 and sum(a_prop.values()) == 1000


@pytest.fixture(scope="module")
def emb():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in df.embedding])
    return df.label.to_numpy(), X


def test_calinski_harabasz_matches_numpy(spark, emb):
    labels, X = emb
    n, k = len(X), len(set(labels))
    cents = {
        l: np.round(X[labels == l].mean(axis=0), 6) for l in set(labels)
    }
    g = np.round(X.mean(axis=0), 6)
    W = sum(
        float(((X[labels == l] - cents[l]) ** 2).sum()) for l in set(labels)
    )
    B = sum(
        (labels == l).sum() * float(((cents[l] - g) ** 2).sum())
        for l in set(labels)
    )
    ch = (B / (k - 1)) / (W / (n - k))
    r = QUERIES["calinski_harabasz_index"](spark, SF_DIR).first()
    assert (r.n_vectors, r.k_labels) == (n, k)
    assert abs(r.between_ss - B) < 1e-3
    assert abs(r.within_ss - W) < 1e-3
    assert abs(r.ch_index - ch) < 1e-3


def test_davies_bouldin_matches_numpy(spark, emb):
    labels, X = emb
    ls = sorted(set(labels))
    cents = {l: np.round(X[labels == l].mean(axis=0), 6) for l in ls}
    s = {
        l: math.sqrt(
            float(((X[labels == l] - cents[l]) ** 2).sum())
            / (labels == l).sum()
        )
        for l in ls
    }
    r_worst = {}
    for i in ls:
        r_worst[i] = max(
            (s[i] + s[j]) / float(np.linalg.norm(cents[i] - cents[j]))
            for j in ls
            if j != i
        )
    db = sum(r_worst.values()) / len(ls)
    for r in QUERIES["davies_bouldin_index"](spark, SF_DIR).collect():
        assert r.n_vectors == int((labels == r.label).sum())
        assert abs(r.scatter - s[r.label]) < 1e-4
        assert abs(r.worst_ratio - r_worst[r.label]) < 1e-4
        assert abs(r.db_index - db) < 1e-4


def test_fisher_g_matches_numpy_fft(spark, ev):
    d = ev[ev.value.notna()]
    vmic = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    hourly: dict = {}
    for h, v in zip(d.ts.dt.floor("h"), vmic):
        sH, c = hourly.get(h, (0, 0))
        hourly[h] = (sH + int(v), c + 1)
    y = np.array([hourly[h][0] / hourly[h][1] / 1e6 for h in sorted(hourly)])
    n = len(y)
    m = (n - 1) // 2
    f = np.fft.fft(y - y.mean())
    I = (f.real**2 + f.imag**2)[1 : m + 1]
    g = I.max() / I.sum()
    peak = int(np.argmax(I)) + 1
    r = QUERIES["fisher_g_periodicity"](spark, SF_DIR).first()
    assert (r.n_hours, r.n_freqs) == (n, m)
    assert r.peak_j == peak
    assert abs(r.period_hours - n / peak) < 1e-5
    assert abs(r.fisher_g - g) < 1e-4


def test_zorder_audit_matches_literal_simulation(spark, ev):
    t_ns = ev.ts.astype("datetime64[ns]").astype("int64")
    day = (t_ns // 10**9 // 86400).to_numpy()
    hour = (t_ns // 10**9 // 3600).to_numpy()
    users = ev.user_id.to_numpy()
    h0, h1 = hour.min(), hour.max()
    f_time = (hour - h0) * 64 // (h1 - h0 + 1)
    # range-scaled coordinates, as a real Z-order writer bins them
    u8 = (users - users.min()) * 256 // (users.max() - users.min() + 1)
    d8 = (day - day.min()) * 256 // (day.max() - day.min() + 1)
    morton = np.zeros(len(ev), dtype=np.int64)
    for i in range(8):
        morton += ((u8 >> i) & 1) << (2 * i + 1)
        morton += ((d8 >> i) & 1) << (2 * i)
    f_z = morton // (65536 // 64)
    out = {}
    for name, f in (("time_range", f_time), ("zorder", f_z)):
        stats = {}
        for fi, u in zip(f, users):
            mn, mx, c = stats.get(fi, (u, u, 0))
            stats[fi] = (min(mn, u), max(mx, u), c + 1)
        probes = sorted(set(users))
        scans = [
            sum(1 for (mn, mx, _) in stats.values() if mn <= p <= mx)
            for p in probes
        ]
        out[name] = (
            len(stats),
            max(c for _, _, c in stats.values()),
            sum(scans) / len(probes) / len(stats),
        )
    for r in QUERIES["zorder_pruning_audit"](spark, SF_DIR).collect():
        nf, mr, frac = out[r.layout]
        assert r.n_files == nf
        assert r.max_file_rows == mr
        assert abs(r.avg_scan_fraction - frac) < 1e-6
    # the audit's point: z-order prunes, time-range files don't
    assert out["zorder"][2] < out["time_range"][2]


def test_rbp_err_matches_literal_user_models(spark):
    """RBP/ERR vs a literal per-query scoring loop over the same
    rounded-cosine ranking contract."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    vids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    rows = {r.query_id: r
            for r in QUERIES["rbp_err_retrieval_eval"](spark, SF_DIR).collect()}
    for q in (0, 3, 7, 11, 19, 23, 42, 57):
        qv = X[vids == q][0]
        ql = labels[vids == q][0]
        scored = sorted(
            (
                -round(float(X[i] @ qv / (np.linalg.norm(X[i]) * np.linalg.norm(qv))), 6),
                int(vids[i]),
                labels[i] == ql,
            )
            for i in range(len(X))
            if vids[i] != q
        )[:10]
        rbp = err = 0.0
        prev_rel = 0
        for r, (_, _, rel) in enumerate(scored, start=1):
            if rel:
                rbp += 0.8 ** (r - 1)
                err += 1.0 / (r * 2 ** (prev_rel + 1))
                prev_rel += 1
        row = rows[q]
        assert row.label == ql
        assert row.n_rel == sum(rel for _, _, rel in scored)
        assert abs(row.rbp_08 - 0.2 * rbp) < 1e-6
        assert abs(row.err - err) < 1e-6


def test_cdc_chunks_match_literal_walk(spark):
    import hashlib

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    stats: dict = {}
    for src, text in zip(docs.source, docs.text):
        ws = text.split(" ")
        chunks, cur = [], []
        for i, w in enumerate(ws):
            cur.append(w)
            if i >= 2:
                h = int(
                    hashlib.md5(" ".join(ws[i - 2 : i + 1]).encode())
                    .hexdigest()[:8],
                    16,
                )
                if h % 64 == 0:
                    chunks.append(cur)
                    cur = []
        if cur:
            chunks.append(cur)
        n, dset, words = stats.get(src, (0, set(), 0))
        for ch in chunks:
            dset.add(hashlib.md5(" ".join(ch).encode()).hexdigest())
            words += len(ch)
            n += 1
        stats[src] = (n, dset, words)
    for r in QUERIES["cdc_chunk_dedup"](spark, SF_DIR).collect():
        n, dset, words = stats[r.source]
        assert r.n_chunks == n
        assert r.n_distinct_chunks == len(dset)
        assert abs(r.dup_chunk_rate - (1 - len(dset) / n)) < 1e-6
        assert abs(r.avg_chunk_words - words / n) < 1e-6


def test_g_test_matches_naive_contingency(spark, ev):
    tab = pd.crosstab(ev.event_type, ev.ts.dt.dayofweek)
    o = tab.to_numpy().astype(float)
    e = o.sum(1, keepdims=True) * o.sum(0, keepdims=True) / o.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(o > 0, o * np.log(o / e), 0.0)
    g = dict(zip(tab.index, 2.0 * terms.sum(1)))
    nr = dict(zip(tab.index, o.sum(1).astype(int)))
    for r in QUERIES["g_test_type_dow"](spark, SF_DIR).collect():
        assert r.n_rows == nr[r.event_type]
        assert abs(r.g_contrib - g[r.event_type]) < 1e-4


def test_ewma_chart_matches_literal_recursion(spark, ev):
    """The engine computes the EWMA as a normalized geometric
    expansion; the naive side runs the LITERAL recursion
    e_t = (1-l) e_{t-1} + l x_t (initialized at x_1), which equals
    the truncated expansion normalized by its finite weight sum."""
    d = ev[ev.value.notna()]
    vmic = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    cells: dict = {}
    for (u, dy), v in zip(
        zip(d.user_id,
            d.ts.astype("datetime64[ns]").astype("int64") // 10**9 // 86400),
        vmic,
    ):
        s, c = cells.get((u, dy), (0, 0))
        cells[(u, dy)] = (s + int(v), c + 1)
    rows = {r.user_id: r
            for r in QUERIES["ewma_control_chart"](spark, SF_DIR).collect()}
    lam = 0.25
    for u in set(d.user_id):
        hist = sorted(
            ((dy, s, c) for (uu, dy), (s, c) in cells.items() if uu == u),
            key=lambda t: -t[0],
        )[:64]
        hist.sort()
        mqs = [math.floor(s / c + 0.5) if s >= 0 else math.ceil(s / c - 0.5)
               for _, s, c in hist]
        n = len(mqs)
        if n < 2:
            assert u not in rows
            continue
        mu = sum(mqs) / n
        sd = math.sqrt(sum((x - mu) ** 2 for x in mqs) / (n - 1))
        limit = 3.0 * sd * math.sqrt(lam / (2 - lam))
        e = None
        ooc = 0
        first = None
        for (dy, _, _), x in zip(hist, mqs):
            e = x if e is None else (1 - lam) * e + lam * x
            if abs(e - mu) > limit:
                ooc += 1
                if first is None:
                    first = dy
        r = rows[u]
        assert r.n_days == n
        assert r.n_out_of_control == ooc, (u, r.n_out_of_control, ooc)
        assert (r.first_ooc_day_epoch is None) == (first is None)
        if first is not None:
            assert r.first_ooc_day_epoch == first


def test_partial_corr_matches_numpy(spark, ev):
    d = ev[ev.value.notna()]
    x = np.round(d.value.to_numpy() * 100)
    y = d.ts.dt.hour.to_numpy().astype(float)
    # DuckDB-style dow (0=Sunday): pandas dayofweek is 0=Monday, which
    # is NOT an affine relabeling of Spark/DuckDB codes — Pearson r is
    # only invariant to affine maps, so match the oracle's convention
    z = ((d.ts.dt.dayofweek.to_numpy() + 1) % 7).astype(float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    pr = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    r = QUERIES["partial_corr_value_hour"](spark, SF_DIR).first()
    assert r.n_rows == len(x)
    assert abs(r.r_value_hour - rxy) < 1e-5
    # Spark's 1=Sunday code is DuckDB's 0=Sunday + 1: affine, so r is
    # identical (not just up to sign)
    assert abs(r.r_hour_dow - ryz) < 1e-5
    assert abs(r.partial_r_value_hour - pr) < 1e-5


def test_cochran_q_matches_literal_blocks(spark, ev):
    k = ev.event_type.nunique()
    counts: dict = {}
    for u, et in zip(ev.user_id, ev.event_type):
        counts[(u, et)] = counts.get((u, et), 0) + 1
    totals: dict = {}
    for (u, _), c in counts.items():
        totals[u] = totals.get(u, 0) + c
    cj: dict = {}
    ri: dict = {}
    for (u, et), c in counts.items():
        x = 1 if c * k > totals[u] else 0
        cj[et] = cj.get(et, 0) + x
        ri[u] = ri.get(u, 0) + x
    n = sum(ri.values())
    sr2 = sum(r * r for r in ri.values())
    sc2 = sum(c * c for c in cj.values())
    denom = k * n - sr2
    q = (k - 1) * (k * sc2 - n * n) / denom if denom else None
    for r in QUERIES["cochran_q_test"](spark, SF_DIR).collect():
        assert r.n_users_over == cj[r.event_type]
        assert r.n_users == len(ri)
        if q is None:
            assert r.cochran_q is None
        else:
            assert abs(r.cochran_q - q) < 1e-5


def test_mcc_matches_literal_confusion(spark):
    import hashlib

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tp = fp = fn = tn = 0
    for lang, text in zip(docs.lang, docs.text):
        ws = text.split(" ")
        feats = ws + [" ".join(p) for p in zip(ws, ws[1:])]
        if not feats:
            continue
        wsum = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 2001 - 1000
            for t in feats
        )
        keep = wsum > 0
        en = lang == "en"
        if keep and en:
            tp += 1
        elif keep:
            fp += 1
        elif en:
            fn += 1
        else:
            tn += 1
    r = QUERIES["mcc_classifier_eval"](spark, SF_DIR).first()
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r.mcc - mcc) < 1e-6
    assert abs(r.accuracy - (tp + tn) / (tp + fp + fn + tn)) < 1e-6
    assert abs(r.f1 - 2 * tp / (2 * tp + fp + fn)) < 1e-6
