"""Oracle-independent validation of the retrieval family: BM25
scoring re-derived with dict-based tf/df/dl bookkeeping, NDCG@10 and
MRR/precision/recall from a numpy cosine ranking. Eighth module of the
independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"
EMB = f"{SF_DIR}/embeddings.parquet"


def _ha_int(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def test_bm25_matches_dict_scoring(spark):
    from iot_etl_spark.plans.queries_text import BM25_QUERY_IDS, BM25_TOP

    docs = pd.read_parquet(DOCS)
    tf: dict[int, Counter] = {}
    for did, txt in zip(docs.doc_id, docs.text):
        ws = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        tf[int(did)] = Counter(ws)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n_docs = len(tf)
    total_len = sum(dl.values())
    avgdl = total_len / n_docs
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())

    rows: dict = {}
    for r in QUERIES["bm25_retrieval"](spark, SF_DIR).collect():
        rows.setdefault(r.query_id, []).append(r)
    for qid in BM25_QUERY_IDS:
        scores: dict[int, int] = {}
        for tok in tf[qid]:
            d_f = df[tok]
            idf = math.log(1 + (n_docs - d_f + 0.5) / (d_f + 0.5))
            for did, c in tf.items():
                if did == qid or tok not in c:
                    continue
                t = c[tok]
                term = idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * dl[did] / avgdl))
                scores[did] = scores.get(did, 0) + _ha_int(term * 1e9)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
        got = sorted(rows[qid], key=lambda r: r.rnk)
        assert [r.doc_id for r in got] == [d for d, _ in top], qid
        for r, (_, nano) in zip(got, top):
            assert abs(r.bm25_score - nano / 1e9) < 1e-6, (qid, r.doc_id)


@pytest.fixture(scope="module")
def cosine_hits():
    """(qid -> ordered [(vec_id, rel)]) by round(cosine, 6) desc with
    vec_id tiebreak — the ranking contract both eval queries share."""
    emb = pd.read_parquet(EMB).sort_values("vec_id")
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    norms = np.sqrt((x * x).sum(axis=1))

    def hits(qid, k):
        qi = int(np.where(ids == qid)[0][0])
        cos = (x @ x[qi]) / (norms * norms[qi])
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        mask = ids != qid
        order = np.lexsort((ids[mask], -cos[mask]))
        sel = np.nonzero(mask)[0][order[:k]]
        return [(int(ids[i]), int(labels[i] == labels[qi])) for i in sel]

    return hits, {int(i): int(l) for i, l in zip(ids, labels)}


def test_ndcg_matches_numpy_ranking(spark, cosine_hits):
    from iot_etl_spark.plans.queries_embed import NDCG_K, NDCG_QUERY_IDS

    hits, _ = cosine_hits
    rows = {r.query_id: r for r in QUERIES["ndcg_label_retrieval"](spark, SF_DIR).collect()}
    for qid in NDCG_QUERY_IDS:
        h = hits(qid, NDCG_K)
        rels = [rel for _, rel in h]
        disc = [_ha_int(1e9 / math.log2(r + 1)) for r in range(1, NDCG_K + 1)]
        dcg = sum(rel * d for rel, d in zip(rels, disc))
        ideal = sorted(rels, reverse=True)
        idcg = sum(rel * d for rel, d in zip(ideal, disc))
        r = rows[qid]
        assert r.n_rel == sum(rels), qid
        want = dcg / idcg if idcg > 0 else 0.0
        assert abs(r.ndcg - want) < 1e-6, qid


def test_mrr_matches_numpy_ranking(spark, cosine_hits):
    from iot_etl_spark.plans.queries_analytics3 import MRR_K, MRR_QUERY_IDS

    hits, label_of = cosine_hits
    label_counts = Counter(label_of.values())
    rows = {r.query_id: r for r in QUERIES["mrr_recall_retrieval"](spark, SF_DIR).collect()}
    for qid in MRR_QUERY_IDS:
        h = hits(qid, MRR_K)
        rels = [rel for _, rel in h]
        first = next((i + 1 for i, rel in enumerate(rels) if rel), 0)
        n_rel = sum(rels)
        n_label = label_counts[label_of[qid]]
        r = rows[qid]
        assert (r.first_rel_rank, r.n_rel_topk) == (first, n_rel), qid
        assert abs(r.reciprocal_rank - (1.0 / first if first else 0.0)) < 1e-6, qid
        assert abs(r.precision_at_k - n_rel / MRR_K) < 1e-6, qid
        want_rec = n_rel / (n_label - 1) if n_label > 1 else 0.0
        assert abs(r.recall_at_k - want_rec) < 1e-6, qid
