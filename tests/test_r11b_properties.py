"""Round-11 oracle-INDEPENDENT validation, tranche 2 (TPC-H + corpus +
embedding families): naive Python/numpy re-derivations pinned equal to
the engine output (see test_r11_properties.py for the argument).
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


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


# ----------------------------------------------------------- TPC-H


def test_ridge_matches_numpy_solve(spark):
    """Normal-equations ridge vs an independent numpy linear solve
    over Decimal-exact moments."""
    from decimal import ROUND_HALF_UP, Decimal

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    q2 = lambda v: Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
    q = np.array([float(q2(v)) for v in li.l_quantity])
    d = np.array([float(q2(v)) for v in li.l_discount])
    y = np.array([float(q2(v)) for v in li.l_extendedprice])
    n = len(q)
    X = np.column_stack([np.ones(n), q, d])
    A = X.T @ X + np.eye(3) * 1.0
    b = np.linalg.solve(A, X.T @ y)
    mse = float(((X @ b - y) ** 2).mean())
    # the ridge penalty biases the fit, so recompute MSE the query's
    # way: (y'y - 2 b.X'y + b.X'X b)/n with the RAW X'X
    row = QUERIES["ridge_normal_equations"](spark, SF_DIR).first()
    assert row.n_rows == n
    assert abs(row.beta_intercept - b[0]) < 1e-4
    assert abs(row.beta_quantity - b[1]) < 1e-4
    assert abs(row.beta_discount - b[2]) < 1e-4
    assert abs(row.train_mse - mse) < max(1e-3, 1e-6 * abs(mse))


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fellegi_sunter_matches_literal_pairs(spark):
    """FS weights from a literal blocked pair loop with a real
    Levenshtein DP (independent of Spark's levenshtein)."""
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    p = p.assign(noun=p.p_name.str.split(" ").str[1])
    cells: dict = {}
    mp = mt = ms = 0
    recs = list(p.itertuples())
    by_block = defaultdict(list)
    for r in recs:
        by_block[(r.noun, r.p_brand)].append(r)
    for blk in by_block.values():
        for i in range(len(blk)):
            for j in range(len(blk)):
                a, b = blk[i], blk[j]
                if a.p_partkey >= b.p_partkey or a.p_name == b.p_name:
                    continue
                ta = int(a.p_type == b.p_type)
                sa = int(a.p_size == b.p_size)
                pseudo = int(_levenshtein(a.p_name, b.p_name) <= 2)
                np_, nps = cells.get((ta, sa), (0, 0))
                cells[(ta, sa)] = (np_ + 1, nps + pseudo)
                mp += pseudo
                mt += pseudo * ta
                ms += pseudo * sa
    cnt_t = Counter(p.p_type)
    cnt_s = Counter(p.p_size)
    N = len(p)
    ud = N * (N - 1)
    ut = sum(c * (c - 1) for c in cnt_t.values())
    us = sum(c * (c - 1) for c in cnt_s.values())
    m_t, m_s = (mt + 1) / (mp + 2), (ms + 1) / (mp + 2)
    u_t, u_s = ut / ud, us / ud
    for r in QUERIES["fellegi_sunter_weights"](spark, SF_DIR).collect():
        np_, nps = cells[(r.type_agree, r.size_agree)]
        assert r.n_pairs == np_ and r.n_pseudo == nps
        w = (
            math.log(m_t / u_t)
            if r.type_agree
            else math.log((1 - m_t) / (1 - u_t))
        ) + (
            math.log(m_s / u_s)
            if r.size_agree
            else math.log((1 - m_s) / (1 - u_s))
        )
        assert abs(r.fs_weight - w) < 1e-5


def test_nation_gini_matches_literal_rank_formula(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    rev = (
        j.groupby(["c_nationkey", "o_custkey"])
        .o_totalprice.sum()
        .reset_index()
    )
    rows = {r.n_name: r for r in QUERIES["nation_revenue_gini"](spark, SF_DIR).collect()}
    nmap = dict(zip(nation.n_nationkey, nation.n_name))
    for nk, sub in rev.groupby("c_nationkey"):
        sub = sub.sort_values(["o_totalprice", "o_custkey"])
        x = sub.o_totalprice.to_numpy()
        n = len(x)
        i = np.arange(1, n + 1)
        g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        r = rows[nmap[nk]]
        assert r.n_customers == n
        assert abs(r.total_revenue - x.sum()) < 0.01
        assert abs(r.gini - g) < 1e-5


def _ntile(order_idx: np.ndarray, k: int) -> np.ndarray:
    """NTILE(k) over rows pre-sorted by order_idx (0-based positions):
    first n%k buckets get ceil(n/k)."""
    n = len(order_idx)
    size, rem = divmod(n, k)
    out = np.empty(n, dtype=int)
    pos = 0
    for b in range(1, k + 1):
        cnt = size + (1 if b <= rem else 0)
        out[order_idx[pos : pos + cnt]] = b
        pos += cnt
    return out


def test_rfm_segments_match_literal_ntile(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    anchor = orders.o_orderdate.max()
    agg = orders.groupby("o_custkey").agg(
        recency_days=("o_orderdate", lambda s: (anchor - s.max()).days),
        frequency=("o_orderdate", "size"),
        monetary=("o_totalprice", "sum"),
    )
    agg = agg.reset_index().rename(columns={"o_custkey": "c_custkey"})
    rq = _ntile(
        np.lexsort((agg.c_custkey, -agg.recency_days)), 5
    )
    fq = _ntile(np.lexsort((agg.c_custkey, agg.frequency)), 5)
    mq = _ntile(np.lexsort((agg.c_custkey, agg.monetary)), 5)

    rows = {r.c_custkey: r for r in QUERIES["rfm_segments"](spark, SF_DIR).collect()}
    assert set(rows) == set(agg.c_custkey)
    for i, rec in agg.iterrows():
        r = rows[rec.c_custkey]
        assert r.recency_days == rec.recency_days
        assert r.frequency == rec.frequency
        assert abs(r.monetary - rec.monetary) < 1e-4
        assert (r.r_quintile, r.f_quintile, r.m_quintile) == (
            rq[i], fq[i], mq[i],
        ), rec.c_custkey
        if rq[i] >= 4 and fq[i] >= 4 and mq[i] >= 4:
            want = "champion"
        elif rq[i] <= 2 and fq[i] >= 4:
            want = "at_risk_loyal"
        elif rq[i] >= 4 and fq[i] <= 2:
            want = "new_or_promising"
        else:
            want = "core"
        assert r.segment == want


# ----------------------------------------------------------- corpus


def test_pmi_matches_literal_window_loop(spark, docs):
    pair_c: Counter = Counter()
    uni_c: Counter = Counter()
    for text in docs.text:
        ws = text.split(" ")
        uni_c.update(ws)
        for i, w in enumerate(ws):
            for dd in (1, 2):
                if i + dd < len(ws):
                    a, b = w, ws[i + dd]
                    pair_c[(min(a, b), max(a, b))] += 1
    t_tokens = sum(uni_c.values())
    t_pairs = sum(pair_c.values())
    scored = []
    for (a, b), c in pair_c.items():
        if c >= 5:
            pmi = math.log(
                (c * t_tokens * t_tokens) / (t_pairs * uni_c[a] * uni_c[b])
            )
            scored.append((round(pmi, 6), a, b, c))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = QUERIES["pmi_cooccurrence"](spark, SF_DIR).collect()
    assert len(got) == min(20, len(scored))
    for r, (pmi, a, b, c) in zip(got, scored[:20]):
        assert (r.w1, r.w2, r.pair_count) == (a, b, c)
        assert abs(r.pmi - pmi) < 1e-5


def test_bigram_lm_matches_literal_dicts(spark, docs):
    uni: Counter = Counter()
    big: Counter = Counter()
    for text in docs.text:
        ws = text.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    total = sum(uni.values())
    ctx: Counter = Counter()
    for (prev, _), c in big.items():
        ctx[prev] += c
    rows = {r.doc_id: r for r in QUERIES["bigram_lm_score"](spark, SF_DIR).collect()}
    for doc_id, text in zip(docs.doc_id, docs.text):
        ws = text.split(" ")
        lps = [
            math.log(
                0.7 * big[(p, c)] / ctx[p] + 0.3 * uni[c] / total
            )
            for p, c in zip(ws, ws[1:])
        ]
        if not lps:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert r.n_bigrams == len(lps)
        assert abs(r.mean_bigram_logprob - sum(lps) / len(lps)) < 1e-5
        assert abs(r.min_bigram_logprob - min(lps)) < 1e-5


def test_pps_estimate_matches_literal_ht(spark, docs):
    per_src: dict = {}
    for src, sub in docs.groupby("source"):
        total = int(sub.n_chars.sum())
        n_sampled = ht = 0
        for doc_id, nc in zip(sub.doc_id, sub.n_chars):
            u = (_md5_u32(str(doc_id)) % 1000000) / 1000000.0
            pi = min(1.0, 8 * nc / total)
            if u < pi:
                n_sampled += 1
                # nc/pi hits exact .5 for every un-capped doc
                # (= total/K): HALF_UP like Spark ROUND, not banker's
                ht += int(math.floor(nc / pi + 0.5))
        per_src[src] = (len(sub), total, n_sampled, ht)
    for r in QUERIES["pps_sample_estimate"](spark, SF_DIR).collect():
        n_docs, total, n_sampled, ht = per_src[r.source]
        assert r.n_docs == n_docs and r.true_chars == total
        assert r.n_sampled == n_sampled
        assert r.ht_estimate_chars == ht
        assert abs(r.rel_err - (ht - total) / total) < 1e-6


# -------------------------------------------------------- embeddings


def test_srp_sketch_matches_numpy_bits(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {
        int(v): np.round(np.asarray(e, dtype=np.float64) * 1e6).astype(np.int64)
        for v, e in zip(emb.vec_id, emb.embedding)
    }
    dim = len(next(iter(vecs.values())))
    planes = 16
    sgn = np.array(
        [
            [1 if _md5_u32(f"{d}:{p}") % 2 == 0 else -1 for p in range(planes)]
            for d in range(dim)
        ],
        dtype=np.int64,
    )
    bits = {v: (vec @ sgn > 0).astype(int) for v, vec in vecs.items()}
    got = QUERIES["srp_sketch_audit"](spark, SF_DIR).collect()
    assert got, "audit produced no pairs"
    for r in got:
        ham = int((bits[r.vec_id_a] != bits[r.vec_id_b]).sum())
        assert r.hamming == ham
        assert abs(r.srp_cosine - math.cos(math.pi * ham / planes)) < 1e-5
        assert abs(r.srp_err - (r.srp_cosine - r.cosine)) < 2e-6


# ------------------------------------------- MinHash / LSH audits


def _shingle_tokens(docs: pd.DataFrame) -> dict:
    """doc_id -> distinct 3-gram shingles (raw strings)."""
    out = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        ws = text.split(" ")
        sh = []
        seen = set()
        if len(ws) >= 3:
            for i in range(len(ws) - 2):
                s = " ".join(ws[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    sh.append(s)
        out[int(doc_id)] = sh
    return out


_MH_P = 4294967311
_MH_A = [
    a % 65536 | 1
    for a in [15485863, 32452843, 49979687, 67867967, 86028121, 104395301,
              122949823, 141650939, 160481183, 179424673, 198491317,
              217645177, 236887691, 256203161, 275604541, 295075147]
]
_MH_B = [982451653 % _MH_P * (i + 1) % _MH_P for i in range(16)]


def _minhash_rows(shingles: list[str]) -> list[int] | None:
    if not shingles:
        return None
    hs = [_md5_u32(s) for s in shingles]
    return [min((h * _MH_A[i] + _MH_B[i]) % _MH_P for h in hs) for i in range(16)]


def _lsh_candidates(mins: dict) -> set:
    buckets: dict = {}
    for doc_id, m in mins.items():
        if m is None:
            continue
        for b in range(4):
            key = (b, "|".join(str(x) for x in m[b * 4 : b * 4 + 4]))
            buckets.setdefault(key, []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def test_minhash_estimate_audit_matches_literal_perms(spark, docs):
    """Per-candidate-pair MinHash agreement + exact Jaccard from a
    literal 16-permutation loop and raw-set intersection."""
    sh = _shingle_tokens(docs)
    mins = {d: _minhash_rows(s) for d, s in sh.items()}
    cand = _lsh_candidates(mins)
    got = {(r.doc_id_a, r.doc_id_b): r
           for r in QUERIES["minhash_estimate_audit"](spark, SF_DIR).collect()}
    assert set(got) == cand
    for (a, b), r in got.items():
        n_agree = sum(x == y for x, y in zip(mins[a], mins[b]))
        sa, sb = set(sh[a]), set(sh[b])
        jac = len(sa & sb) / len(sa | sb)
        assert r.n_agree == n_agree
        assert abs(r.est_jaccard - n_agree / 16) < 1e-6
        assert abs(r.jaccard - jac) < 1e-6
        assert abs(r.abs_error - abs(n_agree / 16 - jac)) < 2e-6


def test_lsh_recall_audit_matches_bruteforce(spark, docs):
    """Recall of the LSH lane against a literal all-pairs Jaccard scan
    in the same md5-token space."""
    sh = _shingle_tokens(docs)
    toks = {d: {_md5_u32(s) for s in s_list} for d, s_list in sh.items()}
    ids = sorted(d for d, t in toks.items() if t)
    exact = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(toks[a] & toks[b])
            if inter and inter / (len(toks[a]) + len(toks[b]) - inter) >= 0.8:
                exact.add((a, b))
    mins = {d: _minhash_rows(s) for d, s in sh.items()}
    lsh = set()
    for a, b in _lsh_candidates(mins):
        inter = len(toks[a] & toks[b])
        if inter and inter / (len(toks[a]) + len(toks[b]) - inter) >= 0.8:
            lsh.add((a, b))
    row = QUERIES["lsh_recall_audit"](spark, SF_DIR).first()
    assert row.n_exact == len(exact)
    assert row.n_lsh == len(lsh)
    assert row.n_missed == len(exact - lsh)
    assert abs(row.recall - len(lsh & exact) / len(exact)) < 1e-6


def test_window_funnel_matches_literal_greedy(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["t"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**3
    win = 86_400_000_000
    hist: Counter = Counter()
    for _, sub in ev.groupby("user_id"):
        views = sub[sub.event_type == "view"].t
        s1 = views.min() if len(views) else None
        s2 = s3 = None
        if s1 is not None:
            clicks = sub[
                (sub.event_type == "click") & (sub.t > s1) & (sub.t <= s1 + win)
            ].t
            s2 = clicks.min() if len(clicks) else None
        if s2 is not None:
            buys = sub[
                (sub.event_type == "purchase") & (sub.t > s2) & (sub.t <= s1 + win)
            ].t
            s3 = buys.min() if len(buys) else None
        hist[3 if s3 is not None else 2 if s2 is not None else 1 if s1 is not None else 0] += 1
    got = {r.funnel_depth: r.n_users
           for r in QUERIES["window_funnel_conversion"](spark, SF_DIR).collect()}
    assert got == {d: n for d, n in hist.items()}


# ----------------------- SimHash / capture-recapture / misc remainder


def _simhash_fp(docs: pd.DataFrame) -> dict:
    """60-bit SimHash per doc from md5 word hashes weighted by term
    frequency (literal bit loop)."""
    out = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        cnt = Counter(text.split(" "))
        score = [0] * 60
        for w, c in cnt.items():
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for b in range(60):
                score[b] += c if (h >> b) & 1 else -c
        fp = 0
        for b in range(60):
            if score[b] > 0:
                fp |= 1 << b
        out[int(doc_id)] = fp
    return out


def test_simhash_near_pairs_match_allpairs_hamming(spark, docs):
    fps = _simhash_fp(docs)
    ids = sorted(fps)
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(fps[ids[i]] ^ fps[ids[j]]).count("1")
            if h <= 4:
                expected[(ids[i], ids[j])] = h
    got = {(r.doc_id_a, r.doc_id_b): r.hamming
           for r in QUERIES["simhash_near_pairs"](spark, SF_DIR).collect()}
    assert got == expected


def test_capture_recapture_matches_literal_capture_lists(spark, docs):
    """Both capture lists recomputed naively (LSH band candidates via
    the literal 16-permutation loop; SimHash pairs via the all-pairs
    Hamming scan) + the Chapman algebra."""
    sh = _shingle_tokens(docs)
    mins = {d: _minhash_rows(s) for d, s in sh.items()}
    lsh = _lsh_candidates(mins)
    fps = _simhash_fp(docs)
    ids = sorted(fps)
    simp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(fps[ids[i]] ^ fps[ids[j]]).count("1") <= 4:
                simp.add((ids[i], ids[j]))
    n1, n2, m = len(lsh), len(simp), len(lsh & simp)
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    r = QUERIES["capture_recapture_dedup"](spark, SF_DIR).first()
    assert (r.n_minhash_pairs, r.n_simhash_pairs, r.n_overlap) == (n1, n2, m)
    assert abs(r.chapman_total_est - chapman) < 1e-4
    assert abs(r.minhash_coverage_est - n1 / chapman) < 1e-6
    assert abs(r.simhash_coverage_est - n2 / chapman) < 1e-6


def test_centroid_separation_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    labels = emb.label.to_numpy()
    ls = sorted(set(labels))
    cents = {l: np.round(X[labels == l].mean(axis=0), 6) for l in ls}
    for r in QUERIES["centroid_separation_audit"](spark, SF_DIR).collect():
        assert r.n_vectors == int((labels == r.label).sum())
        assert abs(
            r.centroid_norm2 - round(float((cents[r.label] ** 2).sum()), 6)
        ) < 2e-6
        d2 = {
            l: round(float(((cents[r.label] - cents[l]) ** 2).sum()), 6)
            for l in ls
            if l != r.label
        }
        best = min(d2, key=lambda l: (d2[l], l))
        assert r.nearest_label == best
        assert abs(r.nearest_dist2 - d2[best]) < 2e-6


def test_cohort_revenue_triangle_matches_literal(spark):
    from decimal import ROUND_HALF_UP, Decimal

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    q2 = lambda v: Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
    wk = (
        orders.o_orderdate.astype("datetime64[ns]").astype("int64")
        // 10**9
        // 604800
    )
    cohort = wk.groupby(orders.o_custkey).transform("min")
    tri: dict = {}
    for ck, w, cw, p in zip(
        orders.o_custkey, wk, cohort, orders.o_totalprice
    ):
        key = (int(cw) * 604800, int(w - cw))
        users, n, rev = tri.get(key, (set(), 0, Decimal(0)))
        users.add(ck)
        tri[key] = (users, n + 1, rev + q2(p))
    got = QUERIES["cohort_revenue_triangle"](spark, SF_DIR).collect()
    assert len(got) == len(tri)
    for r in got:
        users, n, rev = tri[(r.cohort_week, r.age_weeks)]
        assert r.n_customers == len(users)
        assert r.n_orders == n
        assert abs(r.revenue - float(rev)) < 1e-4


def test_ivf_probe_recall_matches_numpy(spark):
    """IVF recall curve vs a literal numpy pipeline: label centroids,
    cosine cell ranking, per-probe exact top-10, hit counting."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    vids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    q = X[vids == 0][0]
    cents = {l: X[labels == l].mean(axis=0) for l in set(labels)}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cells = sorted(cents, key=lambda l: (-cos(cents[l], q), l))
    scored = sorted(
        [(-cos(X[i], q), int(vids[i]), labels[i])
         for i in range(len(X)) if vids[i] != 0]
    )
    exact = {v for _, v, _ in scored[:10]}
    expect = {}
    for p in (1, 2, 3):
        allowed = set(cells[:p])
        got = [v for _, v, l in scored if l in allowed][:10]
        expect[p] = (len(got), len(set(got) & exact))
    for r in QUERIES["ivf_probe_recall_curve"](spark, SF_DIR).collect():
        n_ret, n_hits = expect[r.nprobe]
        assert r.n_retrieved == n_ret
        assert r.n_hits == n_hits
        assert abs(r.recall_at_k - n_hits / 10.0) < 1e-9


def test_centroid_drift_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    vids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    for r in QUERIES["embedding_centroid_drift"](spark, SF_DIR).collect():
        sel = labels == r.label
        ev = X[sel & (vids % 2 == 0)]
        od = X[sel & (vids % 2 == 1)]
        assert (r.n_even, r.n_odd) == (len(ev), len(od))
        ca, cb = ev.mean(axis=0), od.mean(axis=0)
        c = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        assert abs(r.centroid_cosine - c) < 1e-5


def test_kendall_capped_matches_literal_pairs(spark):
    """Capped Kendall tau-b vs a literal pair loop over per-device
    daily (sum, count) cells with cross-multiplied comparisons."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    d = ev[ev.value.notna()]
    days = (
        d.ts.astype("datetime64[ns]").astype("int64") // 10**9 // 86400
    ).to_numpy()
    vu = np.round(d.value.to_numpy() * 1e6).astype(np.int64)
    cells: dict = {}
    for u, dy, v in zip(d.user_id, days, vu):
        s, c = cells.get((u, dy), (0, 0))
        cells[(u, dy)] = (s + int(v), c + 1)
    rows = {r.user_id: r
            for r in QUERIES["kendall_trend_per_device"](spark, SF_DIR).collect()}
    for u in set(d.user_id):
        hist = sorted(
            ((dy, s, c) for (uu, dy), (s, c) in cells.items() if uu == u),
            key=lambda t: -t[0],
        )[:128]
        hist.sort()
        con = dis = n0 = 0
        for i in range(len(hist)):
            for j in range(i + 1, len(hist)):
                _, s1, c1 = hist[i]
                _, s2, c2 = hist[j]
                n0 += 1
                if s2 * c1 > s1 * c2:
                    con += 1
                elif s2 * c1 < s1 * c2:
                    dis += 1
        ties = n0 - con - dis
        if n0 <= ties:
            assert u not in rows
            continue
        tau = (con - dis) / math.sqrt(n0 * (n0 - ties))
        r = rows[u]
        assert (r.n_days, r.concordant, r.discordant) == (len(hist), con, dis)
        assert abs(r.tau_b - tau) < 1e-6
