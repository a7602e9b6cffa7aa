"""Round-12 oracle-independence campaign tranche: naive
re-derivations (dict loops, pandas walks, numpy algebra, literal
greedy folds) for previously-unpinned registry statistics — the
shared-pipeline queries first (md5 hash thresholds, fingerprints,
packing, scoring formulas), where Spark and DuckDB share enough
construction that the hash gate alone can't catch a both-engines-
wrong flaw (the Chow/EWMA/log-rank class).

All at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
DOCS = f"{SF_DIR}/documents.parquet"


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(DOCS)


# ----------------------------------------------------- events family


def test_value_deciles_matches_literal_ntile(spark, ev):
    d = ev[ev.value.notna()].sort_values(["value", "event_id"])
    out = QUERIES["value_deciles"](spark, SF_DIR).toPandas()
    for et, g in d.groupby("event_type"):
        vals = g.value.to_numpy()
        n = len(vals)
        base, extra = divmod(n, 10)
        idx = 0
        for dec in range(1, 11):
            size = base + (1 if dec <= extra else 0)
            chunk = vals[idx: idx + size]
            idx += size
            if size == 0:
                continue
            r = out[(out.event_type == et) & (out.decile == dec)].iloc[0]
            assert r.n_values == size
            assert abs(r.min_value - chunk.min()) < 1e-9
            assert abs(r.max_value - chunk.max()) < 1e-9


def test_device_mad_matches_numpy_median(spark, ev):
    d = ev[ev.value.notna()]
    out = QUERIES["device_mad_builtin"](spark, SF_DIR).toPandas().set_index(
        "user_id"
    )
    for uid, g in d.groupby("user_id"):
        med = np.median(g.value)
        mad = np.median(np.abs(g.value - med))
        r = out.loc[uid]
        assert r.n == len(g)
        assert abs(r.median_value - med) < 1e-9
        assert abs(r.mad - mad) < 1e-9


def test_wow_percent_change_matches_pandas_walk(spark, ev):
    d = ev.copy()
    day_epoch = d.ts.dt.floor("D").astype("datetime64[us]").astype(
        np.int64
    ) // 1_000_000
    d["week"] = day_epoch // 604800 * 604800
    wk = (
        d.groupby(["event_type", "week"])
        .agg(n_events=("event_id", "size"), n_users=("user_id", "nunique"))
        .reset_index()
        .sort_values(["event_type", "week"])
    )
    wk["prev"] = wk.groupby("event_type")["n_events"].shift(1)
    out = QUERIES["wow_percent_change"](spark, SF_DIR).toPandas()
    out = out.set_index(["event_type", "week"]).sort_index()
    assert len(out) == len(wk)
    for _, r in wk.iterrows():
        o = out.loc[(r.event_type, r.week)]
        assert o.n_events == r.n_events and o.n_users == r.n_users
        if pd.isna(r.prev):
            assert pd.isna(o.wow_change)
        else:
            assert abs(o.wow_change - (r.n_events - r.prev) / r.prev) < 1e-6


def test_sensor_drift_matches_numpy_lstsq(spark, ev):
    d = ev[ev.value.notna()]
    out = QUERIES["sensor_drift"](spark, SF_DIR).toPandas().set_index("user_id")
    for uid, g in d.groupby("user_id"):
        t_us = g.ts.astype("datetime64[us]").astype(np.int64)
        x = (t_us // 1_000_000 - t_us.min() // 1_000_000) / 3600.0
        slope, intercept = np.polyfit(x, g.value, 1)
        r = out.loc[uid]
        assert r.n_values == len(g)
        assert abs(r.drift_per_hour - slope) < 1e-6
        assert abs(r.baseline_value - intercept) < 1e-6


def test_value_time_correlation_matches_numpy(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["hod"] = d.ts.dt.hour.astype(float)
    out = (
        QUERIES["value_time_correlation"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for et, g in d.groupby("event_type"):
        r = out.loc[et]
        assert r.n_values == len(g)
        assert abs(r.corr_value_hour - np.corrcoef(g.value, g.hod)[0, 1]) < 1e-6
        cov = np.cov(g.value, g.hod, ddof=1)[0, 1]
        assert abs(r.covar_value_hour - cov) < 1e-6


def test_value_histogram_matches_literal_binning(spark, ev):
    d = ev[ev.value.notna()]
    out = QUERIES["value_histogram"](spark, SF_DIR).toPandas()
    for et, g in d.groupby("event_type"):
        lo, hi = g.value.min(), g.value.max()
        bins = (
            np.zeros(len(g), dtype=int)
            if hi == lo
            else np.minimum(
                19, np.floor((g.value.to_numpy() - lo) / (hi - lo) * 20)
            ).astype(int)
        )
        c = Counter(bins)
        sub = out[out.event_type == et].set_index("bin")
        assert set(sub.index) == set(c)
        for b, n in c.items():
            assert sub.loc[b].n_values == n
            assert abs(sub.loc[b].bin_lo - (lo + b * (hi - lo) / 20)) < 1e-9


def test_locf_gap_fill_matches_pandas_ffill(spark, ev):
    d = ev.sort_values(["user_id", "ts", "event_id"]).copy()
    d["filled"] = d.groupby("user_id")["value"].ffill()
    out = (
        QUERIES["locf_gap_fill"](spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
    )
    for _, r in d.iterrows():
        o = out.loc[r.event_id]
        assert bool(o.was_gap) == pd.isna(r.value)
        if pd.isna(r.filled):
            assert pd.isna(o.value_filled)
        else:
            assert abs(o.value_filled - r.filled) < 1e-12


def test_asof_click_attribution_matches_merge_asof(spark, ev):
    p = ev[ev.event_type == "purchase"].sort_values("ts")
    c = ev[ev.event_type == "click"].sort_values("ts")
    m = pd.merge_asof(
        p[["event_id", "user_id", "ts"]],
        c[["user_id", "ts"]].rename(columns={"ts": "cts"}),
        left_on="ts", right_on="cts", by="user_id", direction="backward",
    )
    out = (
        QUERIES["asof_click_attribution"](spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
    )
    assert len(out) == len(m)
    for _, r in m.iterrows():
        o = out.loc[r.event_id]
        if pd.isna(r.cts):
            assert pd.isna(o.matched_ts_us)
        else:
            want = r.cts.value // 1000 if r.cts.value else 0
            assert o.matched_ts_us == int(
                r.cts.to_datetime64().astype("datetime64[us]").astype(np.int64)
            )
            assert o.gap_us == o.ts_us - o.matched_ts_us


def test_rolling_7d_active_users_matches_set_walk(spark, ev):
    day = ev.ts.dt.floor("D").astype("datetime64[us]").astype(np.int64) // 1_000_000
    du = pd.DataFrame({"day": day, "user_id": ev.user_id}).drop_duplicates()
    days = sorted(du.day.unique())
    out = (
        QUERIES["rolling_7d_active_users"](spark, SF_DIR)
        .toPandas()
        .set_index("day")
    )
    for g in days:
        win = du[(du.day >= g - 518400) & (du.day <= g)]
        dau = win[win.day == g].user_id.nunique()
        wau = win.user_id.nunique()
        r = out.loc[g]
        assert r.dau == dau and r.wau_7d == wau
        assert abs(r.stickiness - dau / wau) < 1e-6


def test_user_event_signature_matches_literal_join(spark, ev):
    out = (
        QUERIES["user_event_signature"](spark, SF_DIR)
        .toPandas()
        .set_index("user_id")
    )
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        sig = ">".join(g.event_type)
        assert out.loc[uid].n_events == len(g)
        assert out.loc[uid].event_signature == sig


def test_group_kfold_assign_matches_md5_folds(spark, ev):
    folds = ev.user_id.map(lambda u: _md5_32(str(u)) % 5)
    out = QUERIES["group_kfold_assign"](spark, SF_DIR).toPandas().set_index(
        "fold"
    )
    n_total = len(ev)
    for f in sorted(folds.unique()):
        sub = ev[folds == f]
        r = out.loc[f]
        assert r.n_users == sub.user_id.nunique()
        assert r.n_events == len(sub)
        assert r.n_types == sub.event_type.nunique()
        assert abs(r.event_share - len(sub) / n_total) < 1e-6


# ----------------------------------------------------- TPC-H family


def test_supplier_pareto_matches_exact_cents(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    price_c = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    disc_h = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    li = li.assign(rq=price_c * (100 - disc_h))  # 1e-4 units, exact
    rev = li.groupby("l_suppkey")["rq"].sum().reset_index()
    rev = rev.sort_values(["rq", "l_suppkey"], ascending=[False, True])
    rev["rnk"] = np.arange(1, len(rev) + 1)
    rev["cum"] = rev.rq.cumsum()
    total = rev.rq.sum()
    out = QUERIES["supplier_pareto_share"](spark, SF_DIR).toPandas().set_index(
        "l_suppkey"
    )
    for _, r in rev.iterrows():
        o = out.loc[r.l_suppkey]
        assert o.rnk == r.rnk
        assert abs(o.revenue - r.rq / 1e4) < 1e-6
        assert abs(o.cum_share - r.cum / total) < 1e-6
        assert bool(o.pareto_head) == ((r.cum - r.rq) / total < 0.8)


def test_basket_lift_matches_literal_pair_loop(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = op.l_orderkey.nunique()
    item = Counter(op.l_partkey)
    pairs: Counter = Counter()
    for _, g in op.groupby("l_orderkey"):
        parts = sorted(set(g.l_partkey))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pairs[(parts[i], parts[j])] += 1
    cand = [
        (cnt * n_orders / (item[a] * item[b]), a, b, cnt)
        for (a, b), cnt in pairs.items()
        if cnt >= 2
    ]
    cand.sort(key=lambda t: (-round(t[0], 6), t[1], t[2]))
    out = QUERIES["basket_lift_pairs"](spark, SF_DIR).toPandas()
    assert len(out) == min(25, len(cand))
    for o, (lift, a, b, cnt) in zip(out.itertuples(), cand[:25]):
        assert (o.part_a, o.part_b, o.pair_cnt) == (a, b, cnt)
        assert abs(o.lift - lift) < 1e-6


# ------------------------------------------------- text/corpus family


def test_token_heavy_hitters_matches_counter(spark, docs):
    c: Counter = Counter()
    for t in docs.text:
        c.update(t.split(" "))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    out = QUERIES["token_heavy_hitters"](spark, SF_DIR).toPandas()
    assert [(r.token, r.occurrences) for r in out.itertuples()] == top


def test_doc_fingerprint_matches_literal_shingles(spark, docs):
    out = QUERIES["doc_fingerprint"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        sh = list(dict.fromkeys(
            " ".join(ws[i: i + 3]) for i in range(max(len(ws) - 2, 0))
        ))
        if not sh:
            assert r.doc_id not in out.index
            continue
        hs = [_md5_32(s) for s in sh]
        o = out.loc[r.doc_id]
        assert o.n_shingles == len(sh)
        assert o.min_shingle_hash == min(hs)
        assert o.max_shingle_hash == max(hs)


def test_simhash_fingerprint_matches_literal_bits(spark, docs):
    out = QUERIES["simhash_fingerprint"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for _, r in docs.iterrows():
        counts = Counter(r.text.split(" "))
        fp = 0
        for b in range(60):
            score = sum(
                (c if (int(hashlib.md5(w.encode()).hexdigest()[:15], 16) >> b) & 1
                 else -c)
                for w, c in counts.items()
            )
            if score > 0:
                fp |= 1 << b
        assert out.loc[r.doc_id].simhash == fp


def test_tfidf_matches_dict_scoring(spark, docs):
    tf: dict = defaultdict(Counter)
    df: Counter = Counter()
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        tf[r.doc_id].update(toks)
        df.update(set(toks))
    n_docs = len(docs)
    out = QUERIES["tfidf_top_terms"](spark, SF_DIR).toPandas()
    for doc_id, counts in tf.items():
        scored = sorted(
            (
                (-round(c * (math.log((n_docs + 1) / (df[t] + 1)) + 1), 6), t, c)
                for t, c in counts.items()
            )
        )[:3]
        sub = out[out.doc_id == doc_id].sort_values("rk")
        assert len(sub) == len(scored)
        for o, (neg_s, t, c) in zip(sub.itertuples(), scored):
            assert o.term == t and o.tf == c
            assert abs(o.tfidf - (-neg_s)) < 1e-6


def test_langid_confusion_matches_literal_stopwords(spark, docs):
    stop = {
        "en": {"the", "a", "of"}, "de": {"der", "die", "das"},
        "es": {"el", "los", "las"}, "fr": {"le", "les", "des"},
    }
    conf: Counter = Counter()
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        c = {k: sum(1 for w in ws if w in v) for k, v in stop.items()}
        pred = "unknown"
        for k in ("en", "de", "es", "fr"):
            if all(c[k] > c[o] for o in c if o != k):
                pred = k
                break
        conf[(r.lang, pred)] += 1
    out = QUERIES["langid_confusion"](spark, SF_DIR).toPandas()
    got = {(r.lang, r.predicted_lang): r.n_docs for r in out.itertuples()}
    assert got == dict(conf)


def test_sequence_packing_matches_literal_greedy_fold(spark, docs):
    rows = []
    for _, r in docs.iterrows():
        n = len(r.text.split(" "))
        for k in range((n - 1) // 24 + 1):
            rows.append((r.doc_id % 32, r.doc_id, k, min(32, n - k * 24)))
    rows.sort(key=lambda t: (t[0], t[1], t[2]))
    offsets = defaultdict(int)
    agg = defaultdict(lambda: [0, set(), 0])
    for bucket, doc_id, k, tok in rows:
        start = offsets[bucket]
        offsets[bucket] += tok
        key = (bucket, start // 128)
        agg[key][0] += 1
        agg[key][1].add(doc_id)
        agg[key][2] += tok
    out = QUERIES["sequence_packing"](spark, SF_DIR).toPandas()
    got = {
        (r.bucket, r.pack_id): (r.n_chunks, r.n_docs, r.total_tokens)
        for r in out.itertuples()
    }
    want = {k: (v[0], len(v[1]), v[2]) for k, v in agg.items()}
    assert got == want


def test_sample_stratified_matches_md5_thresholds(spark, docs):
    rates = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
    keep = {
        r.doc_id
        for _, r in docs.iterrows()
        if _md5_32(f"sample:{r.doc_id}") / 4294967296.0
        < rates.get(r.source, 0.1)
    }
    out = QUERIES["sample_stratified"](spark, SF_DIR).toPandas()
    assert set(out.doc_id) == keep


def test_decontaminate_overlap_matches_literal_sets(spark, docs):
    sh = {}
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        sh[r.doc_id] = list(dict.fromkeys(
            " ".join(ws[i: i + 3]) for i in range(max(len(ws) - 2, 0))
        ))
    eval_grams = set()
    for did, s in sh.items():
        if did % 10 == 0:
            eval_grams.update(s)
    out = QUERIES["decontaminate_overlap"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for did, s in sh.items():
        if did % 10 == 0 or not s:
            assert did not in out.index
            continue
        ov = sum(1 for g in s if g in eval_grams)
        o = out.loc[did]
        assert o.n_shingles == len(s) and o.overlap_shingles == ov
        pct = 100 * ov / len(s)
        assert abs(o.contamination_pct - pct) < 1e-6
        assert bool(o.is_contaminated) == (pct > 50)


# ------------------------------------------------- embeddings family


@pytest.fixture(scope="module")
def emb() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/embeddings.parquet")


def test_embedding_dim_stats_matches_numpy(spark, emb):
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    out = QUERIES["embedding_dim_stats"](spark, SF_DIR).toPandas().set_index(
        "dim"
    )
    assert len(out) == m.shape[1]
    for d in range(m.shape[1]):
        r = out.loc[d]
        assert r.n == m.shape[0]
        assert abs(r.mean_v - m[:, d].mean()) < 1e-6
        assert abs(r.stddev_v - m[:, d].std(ddof=1)) < 1e-6
        assert abs(r.min_v - m[:, d].min()) < 1e-6
        assert abs(r.max_v - m[:, d].max()) < 1e-6


def test_embedding_norm_outliers_matches_numpy(spark, emb):
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    d = pd.DataFrame(
        {"vec_id": emb.vec_id, "label": emb.label, "nrm": norms}
    )
    want = {}
    for lab, g in d.groupby("label"):
        mu, sd = g.nrm.mean(), g.nrm.std(ddof=1)
        if sd <= 0:
            continue
        z = (g.nrm - mu) / sd
        for vid, zz, nn in zip(g.vec_id, z, g.nrm):
            if abs(zz) > 2.0:
                want[vid] = (nn, zz)
    out = QUERIES["embedding_norm_outliers"](spark, SF_DIR).toPandas()
    assert set(out.vec_id) == set(want)
    for r in out.itertuples():
        nn, zz = want[r.vec_id]
        assert abs(r.l2_norm - nn) < 1e-6 and abs(r.z_score - zz) < 1e-6


def test_knn_join_matches_numpy_cosine(spark, emb):
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    out = QUERIES["knn_join"](spark, SF_DIR).toPandas()
    for q in ids[ids < 10]:
        qv = m[ids == q][0]
        cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
        cand = sorted(
            ((-round(c, 6), vid) for vid, c in zip(ids, cos) if vid != q)
        )[:5]
        sub = out[out.q_id == q].sort_values("rank")
        assert list(sub.vec_id) == [vid for _, vid in cand]
        for o, (negc, _) in zip(sub.itertuples(), cand):
            assert abs(o.cosine - (-negc)) < 1e-9
