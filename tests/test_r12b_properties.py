"""Round-12 oracle-independence campaign, tranche 2: naive
re-derivations for the remaining pinnable statistics — anomaly rates,
text-quality ratios, rolling/lag windows, seasonal residuals, growth
accounting (DAU flows), skew audits, md5 feature hashing, coverage
curves. Same contract as test_r12_properties: literal Python loops /
pandas walks / numpy algebra against the raw parquet, pinned equal to
the engine output. All at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


# --------------------------------------------------- anomaly family


def test_anomaly_rate_by_device_matches_pandas(spark, ev):
    g = ev.groupby("user_id").agg(
        total=("event_id", "size"),
        anom=("event_type", lambda s: int((s == "error").sum())),
    )
    g = g[g.total > 30]
    out = QUERIES["anomaly_rate_by_device"](spark, SF_DIR).toPandas().set_index(
        "user_id"
    )
    assert set(out.index) == set(g.index)
    for uid, r in g.iterrows():
        o = out.loc[uid]
        assert o.total_readings == r.total and o.anomaly_count == r.anom
        assert abs(o.anomaly_rate_pct - 100 * r.anom / r.total) < 1e-6


def test_anomaly_trends_7d_matches_pandas(spark, ev):
    hi = pd.Timestamp("2024-01-30")
    d = ev[(ev.ts >= hi - pd.Timedelta(days=7)) & (ev.ts < hi)].copy()
    d["bucket"] = d.ts.dt.floor("h").astype("datetime64[us]").astype(
        np.int64
    ) // 1_000_000
    g = d.groupby(["bucket", "user_id"]).agg(
        total=("event_id", "size"),
        anom=("event_type", lambda s: int((s == "error").sum())),
    )
    out = QUERIES["anomaly_trends_7d"](spark, SF_DIR).toPandas()
    out = out.set_index(["bucket_epoch", "user_id"])
    assert set(out.index) == set(g.index)
    for key, r in g.iterrows():
        o = out.loc[key]
        assert o.total_readings == r.total and o.anomaly_count == r.anom


def test_seasonal_residual_anomaly_matches_cell_walk(spark, ev):
    d = ev[ev.value.notna()].copy()
    d["dow"] = d.ts.dt.dayofweek  # cell identity only; labels unused
    d["hod"] = d.ts.dt.hour
    stats = defaultdict(lambda: [0, 0.0, 0])
    out = (
        QUERIES["seasonal_residual_anomaly"](spark, SF_DIR)
        .toPandas().set_index("event_type")
    )
    for et, g in d.groupby("event_type"):
        n_anom, abs_res = 0, []
        for _, cell in g.groupby(["dow", "hod"]):
            mu = cell.value.mean()
            sd = cell.value.std(ddof=1) if len(cell) > 1 else np.nan
            res = (cell.value - mu).abs()
            abs_res.extend(res)
            if not np.isnan(sd) and sd > 0:
                n_anom += int((res > 3 * sd).sum())
        r = out.loc[et]
        assert r.n_values == len(g)
        assert r.n_seasonal_anomalies == n_anom
        assert abs(r.mean_abs_residual - float(np.mean(abs_res))) < 1e-6


def test_deviation_banding_matches_literal_bands(spark, ev):
    d = ev.copy()
    bands = {}
    for et, g in d.groupby("event_type"):
        mu, sd = g.value.mean(), g.value.std(ddof=1)
        for eid, v in zip(g.event_id, g.value):
            dev = abs(v - mu) if pd.notna(v) else np.nan
            cat = (
                "High" if dev > 2 * sd
                else "Medium" if dev > sd else "Normal"
            ) if pd.notna(v) else None
            bands[eid] = (dev, cat)
    frame = pd.DataFrame(
        [(eid, dv, c) for eid, (dv, c) in bands.items() if pd.notna(dv)],
        columns=["event_id", "dev", "cat"],
    ).sort_values(["dev", "event_id"], ascending=[False, True]).head(100)
    out = QUERIES["deviation_banding"](spark, SF_DIR).toPandas()
    assert list(out.event_id) == list(frame.event_id)
    for o, (_, r) in zip(out.itertuples(), frame.iterrows()):
        assert abs(o.deviation - r.dev) < 1e-6
        assert o.deviation_category == r["cat"]  # r.cat is the accessor


def test_key_skew_audit_matches_pandas(spark, ev):
    out = QUERIES["key_skew_audit"](spark, SF_DIR).toPandas().set_index(
        "event_type"
    )
    for et, g in ev.groupby("event_type"):
        cnt = g.groupby("user_id").size()
        r = out.loc[et]
        assert r.n_keys == len(cnt) and r.total_rows == len(g)
        assert r.max_key_rows == cnt.max()
        assert abs(r.max_key_share - cnt.max() / len(g)) < 1e-6
        assert abs(r.median_key_rows - float(np.median(cnt))) < 1e-6
        assert abs(r.skew_ratio - cnt.max() / np.median(cnt)) < 1e-6
        assert r.suggested_salt_buckets == math.ceil(
            cnt.max() / (len(g) / len(cnt))
        )


# ----------------------------------------------------- window family


def test_lag_features_matches_pandas_shift(spark, ev):
    d = ev.sort_values(["user_id", "ts", "event_id"]).copy()
    d["l1"] = d.groupby("user_id")["value"].shift(1)
    d["l2"] = d.groupby("user_id")["value"].shift(2)
    out = QUERIES["lag_features"](spark, SF_DIR).toPandas().set_index(
        "event_id"
    )
    for _, r in d.iterrows():
        o = out.loc[r.event_id]
        for col, want in (("value_lag_1", r.l1), ("value_lag_2", r.l2)):
            if pd.isna(want):
                assert pd.isna(o[col])
            else:
                assert abs(o[col] - want) < 1e-12
        want_chg = r.value - r.l1
        if pd.isna(want_chg):
            assert pd.isna(o.value_change)
        else:
            assert abs(o.value_change - want_chg) < 1e-12


def test_rolling_window_stats_matches_literal_ranges(spark, ev):
    d = ev.copy()
    d["ts_epoch"] = d.ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
    out = QUERIES["rolling_window_stats"](spark, SF_DIR).toPandas().set_index(
        "event_id"
    )
    rng = np.random.default_rng(7)
    for uid, g in d.groupby("user_id"):
        g = g.sort_values("ts_epoch")
        sample = g.iloc[rng.choice(len(g), size=min(8, len(g)), replace=False)]
        for _, r in sample.iterrows():
            w5 = g[(g.ts_epoch >= r.ts_epoch - 300) & (g.ts_epoch <= r.ts_epoch)]
            w1h = g[(g.ts_epoch >= r.ts_epoch - 3600) & (g.ts_epoch <= r.ts_epoch)]
            o = out.loc[r.event_id]
            assert abs(o.rolling_avg_5min - w5.value.mean()) < 1e-6
            assert abs(o.rolling_avg_1h - w1h.value.mean()) < 1e-6
            sd = w1h.value.std(ddof=1)
            if pd.isna(sd):
                assert pd.isna(o.rolling_stddev_1h)
            else:
                assert abs(o.rolling_stddev_1h - sd) < 1e-6


def test_daily_active_flows_matches_set_algebra(spark, ev):
    day = ev.ts.dt.floor("D").astype("datetime64[us]").astype(np.int64) // 1_000_000
    du = pd.DataFrame({"day": day, "user_id": ev.user_id}).drop_duplicates()
    days = sorted(du.day.unique())
    first = du.groupby("user_id")["day"].min()
    sets = {d_: set(du[du.day == d_].user_id) for d_ in days}
    out = QUERIES["daily_active_flows"](spark, SF_DIR).toPandas().set_index(
        "day"
    )
    for d_ in days:
        cur = sets[d_]
        prev = sets.get(d_ - 86400, set())
        new = {u for u in cur if first[u] == d_}
        retained = cur & prev
        resurrected = cur - new - retained
        churned = prev - cur
        r = out.loc[d_]
        assert r.dau == len(cur) and r.new_users == len(new)
        assert r.retained == len(retained)
        assert r.resurrected == len(resurrected)
        assert r.churned == len(churned)


# -------------------------------------------------------- text family


def test_boilerplate_stats_matches_shingle_sets(spark, docs):
    sh = {}
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        sh[r.doc_id] = list(dict.fromkeys(
            " ".join(ws[i: i + 3]) for i in range(max(len(ws) - 2, 0))
        ))
    df_count: Counter = Counter()
    for s in sh.values():
        df_count.update(set(s))
    hot = {g for g, c in df_count.items() if c >= 2}
    out = QUERIES["boilerplate_stats"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for did, s in sh.items():
        if not s:
            assert did not in out.index
            continue
        bp = sum(1 for g in s if g in hot)
        o = out.loc[did]
        assert o.n_shingles == len(s) and o.boilerplate_shingles == bp
        assert abs(o.boilerplate_fraction - bp / len(s)) < 1e-6


def test_repetition_stats_matches_bigram_counters(spark, docs):
    out = QUERIES["repetition_stats"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        if len(ws) < 2:
            assert r.doc_id not in out.index
            continue
        bg = Counter(f"{a} {b}" for a, b in zip(ws[:-1], ws[1:]))
        tot = sum(bg.values())
        o = out.loc[r.doc_id]
        assert o.n_words == len(ws)
        assert abs(o.distinct_word_ratio - len(set(ws)) / len(ws)) < 1e-6
        assert o.total_bigrams == tot
        dupf = 1 - len(bg) / tot
        topf = max(bg.values()) / tot
        assert abs(o.dup_bigram_fraction - dupf) < 1e-6
        assert abs(o.top_bigram_fraction - topf) < 1e-6
        assert bool(o.is_repetitive) == (topf > 0.2 or dupf > 0.3)


def test_text_quality_stats_matches_literal_ratios(spark, docs):
    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    out = QUERIES["text_quality_stats"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        o = out.loc[r.doc_id]
        assert o.n_words == len(ws)
        assert o.n_distinct_words == len(set(ws))
        assert abs(o.avg_word_len - sum(map(len, ws)) / len(ws)) < 1e-6
        assert abs(
            o.stopword_ratio - sum(1 for w in ws if w in stop) / len(ws)
        ) < 1e-6
        assert abs(o.ttr - len(set(ws)) / len(ws)) < 1e-6


def test_text_normalize_stats_matches_regex_md5(spark, docs):
    out = QUERIES["text_normalize_stats"](spark, SF_DIR).toPandas().set_index(
        "doc_id"
    )
    for _, r in docs.iterrows():
        norm = re.sub(r"[ \t\r\n]+", " ", r.text).strip()
        o = out.loc[r.doc_id]
        assert o.norm_chars == len(norm)
        assert bool(o.changed) == (len(norm) != r.n_chars)
        assert o.norm_digest == hashlib.md5(norm.encode()).hexdigest()


def test_vocab_coverage_curve_matches_counter(spark, docs):
    c: Counter = Counter()
    for t in docs.text:
        c.update(t.split(" "))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    out = QUERIES["vocab_coverage_curve"](spark, SF_DIR).toPandas()
    out = out.sort_values("rnk").reset_index(drop=True)
    assert len(out) == min(100, len(ranked))
    cum = 0
    for i, (tok, cnt) in enumerate(ranked[: len(out)]):
        cum += cnt
        o = out.iloc[i]
        assert (o.token, o.cnt, o.rnk, o.cum_count) == (tok, cnt, i + 1, cum)
        assert abs(o.cum_share - cum / total) < 1e-6


def test_mixture_sampling_weights_matches_literal_alpha(spark, docs):
    toks = {
        src: int(sum(len(t.split(" ")) for t in g.text))
        for src, g in docs.groupby("source")
    }
    total = sum(toks.values())
    p = {s: (n / total) ** 0.3 for s, n in toks.items()}
    z = sum(p.values())
    out = QUERIES["mixture_sampling_weights"](spark, SF_DIR).toPandas()
    out = out.set_index("source")
    for s, n in toks.items():
        o = out.loc[s]
        assert o.n_tokens == n
        assert abs(o.sample_weight - p[s] / z) < 1e-6
        assert abs(o.upsample_factor - (p[s] / z) / (n / total)) < 1e-6


def test_hashed_embedding_vectors_matches_md5_dict(spark, docs):
    w: dict = defaultdict(int)
    for _, r in docs.iterrows():
        for t in r.text.split(" "):
            if not t:
                continue
            dim = _md5_32(t) % 16
            sgn = (_md5_32("s#" + t) % 2) * 2 - 1
            w[(r.doc_id, dim)] += sgn
    l2 = defaultdict(float)
    for (did, _), wt in w.items():
        l2[did] += wt * wt
    out = QUERIES["hashed_embedding_vectors"](spark, SF_DIR).toPandas()
    got = {(r.doc_id, r.dim): (r.weight, r.norm_weight) for r in out.itertuples()}
    want = {k: v for k, v in w.items() if v != 0}
    assert set(got) == set(want)
    for k, wt in want.items():
        gw, gn = got[k]
        assert gw == wt
        assert abs(gn - wt / math.sqrt(l2[k[0]])) < 1e-6


def test_embedding_label_centroids_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    out = QUERIES["embedding_label_centroids"](spark, SF_DIR).toPandas()
    out = out.set_index("label")
    for lab, g in emb.groupby("label"):
        sub = m[(emb.label == lab).to_numpy()]
        o = out.loc[lab]
        assert o.n_vectors == len(sub)
        assert abs(o.avg_component - sub.mean()) < 1e-6
        assert abs(o.avg_sq_norm - (sub * sub).sum() / len(sub)) < 1e-6


def test_json_key_coverage_matches_dict_loop(spark, ev):
    import json as _json

    n = len(ev)
    agg: dict = {}
    for p in ev.props:
        if p is None or (isinstance(p, float) and pd.isna(p)):
            continue
        for k, v in _json.loads(p).items():
            cnt, mn, mx = agg.get(k, (0, None, None))
            try:
                iv = int(v)
            except (TypeError, ValueError):
                iv = None
            if iv is not None:
                mn = iv if mn is None else min(mn, iv)
                mx = iv if mx is None else max(mx, iv)
            agg[k] = (cnt + 1, mn, mx)
    out = QUERIES["json_key_coverage"](spark, SF_DIR).toPandas().set_index("key")
    assert set(out.index) == set(agg)
    for k, (cnt, mn, mx) in agg.items():
        o = out.loc[k]
        assert o.n_rows == cnt
        assert abs(o.coverage - cnt / n) < 1e-6
        assert o.min_value == mn and o.max_value == mx
