"""Oracle-independent validation of the text-law and model-QA
statistics: Zipf OLS, per-doc token entropy, the classifier rank AUC
(tie-corrected), reliability-bin ECE, and the Murphy Brier
decomposition. Ninth module of the independence campaign.

The three model-QA checks drive their naive math from the engine's
own classifier frame (quality_logit, lang) — the classifier itself is
oracle-gated by quality_classifier_score; what these validate is the
METRIC algebra (U statistic, binning, decomposition identities).

All at sf0.001.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


def test_zipf_slope_matches_numpy_ols(spark):
    from iot_etl_spark.plans.queries_audit import ZIPF_TOP

    docs = pd.read_parquet(DOCS)
    cnt: Counter = Counter()
    for txt in docs.text:
        cnt.update(txt.split(" "))  # engine splits on single space
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    y = np.log([c for _, c in top])
    x = np.log(np.arange(1, len(top) + 1))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    row = QUERIES["zipf_slope_audit"](spark, SF_DIR).collect()[0]
    assert row.n_ranks == len(top)
    assert abs(row.zipf_slope - slope) < 1e-5
    assert abs(row.zipf_intercept - intercept) < 1e-5
    assert abs(row.fit_r2 - r2) < 1e-5


def test_token_entropy_matches_counter(spark):
    docs = pd.read_parquet(DOCS)
    rows = {r.doc_id: r for r in QUERIES["token_entropy_stats"](spark, SF_DIR).collect()}
    assert len(rows) == len(docs)
    for did, txt in zip(docs.doc_id, docs.text):
        c = Counter(txt.split(" "))
        n = sum(c.values())
        ent = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        r = rows[did]
        assert (r.n_tokens, r.n_distinct_tokens) == (n, len(c)), did
        assert abs(r.token_entropy - ent) < 1e-5, did
        assert abs(r.distinct_ratio - len(c) / n) < 1e-6, did


@pytest.fixture(scope="module")
def classifier(spark) -> pd.DataFrame:
    from iot_etl_spark.plans.queries_mlprep import quality_classifier_score

    return quality_classifier_score(spark, SF_DIR).toPandas()


def test_classifier_auc_matches_tie_corrected_u(spark, classifier):
    s = classifier.quality_logit.to_numpy()
    pos = (classifier.lang == "en").to_numpy()
    np_, nn_ = int(pos.sum()), int((~pos).sum())
    # U = sum over positives of (#neg below + 0.5 * #neg tied)
    u = 0.0
    neg_sorted = np.sort(s[~pos])
    for v in s[pos]:
        below = np.searchsorted(neg_sorted, v, side="left")
        tied = np.searchsorted(neg_sorted, v, side="right") - below
        u += below + 0.5 * tied
    auc = u / (np_ * nn_)
    row = QUERIES["classifier_lang_auc"](spark, SF_DIR).collect()[0]
    assert (row.n_english, row.n_other) == (np_, nn_)
    assert abs(row.auc - auc) < 1e-6


def test_calibration_bins_match_naive(spark, classifier):
    rows = {r.bin: r for r in QUERIES["calibration_bins"](spark, SF_DIR).collect()}
    s = classifier.quality_logit.to_numpy()
    pos = (classifier.lang == "en").to_numpy()
    bins = np.floor(s * 10).astype(int)
    n_total = len(s)
    ece = 0.0
    for b in np.unique(bins):
        m = bins == b
        n = int(m.sum())
        npos = int(pos[m].sum())
        # pnano quantization: conf = round((logit+1)*5e8)/1e9 per doc
        conf = sum(
            int(math.copysign(math.floor(abs((v + 1) * 5e8) + 0.5), (v + 1)))
            for v in s[m]
        ) / (n * 1e9)
        r = rows[b]
        assert (r.n_docs, r.n_pos) == (n, npos), b
        assert abs(r.mean_conf - conf) < 1e-6, b
        assert abs(r.pos_rate - npos / n) < 1e-6, b
        contrib = n / n_total * abs(npos / n - conf)
        assert abs(r.ece_contrib - contrib) < 1e-6, b
        ece += contrib
    assert 0 <= ece <= 1


def test_brier_decomposition_identities(spark, classifier):
    s = classifier.quality_logit.to_numpy()
    pos = (classifier.lang == "en").to_numpy()
    bins = np.floor(s * 10).astype(int)
    n_total = len(s)
    obar = pos.sum() / n_total
    rel = res = 0.0
    for b in np.unique(bins):
        m = bins == b
        n = int(m.sum())
        o = pos[m].sum() / n
        f = sum(
            int(math.copysign(math.floor(abs((v + 1) * 5e8) + 0.5), (v + 1)))
            for v in s[m]
        ) / (n * 1e9)
        rel += n * (f - o) ** 2 / n_total
        res += n * (o - obar) ** 2 / n_total
    unc = obar * (1 - obar)
    row = QUERIES["brier_decomposition"](spark, SF_DIR).collect()[0]
    assert row.n_docs == n_total
    assert abs(row.reliability - rel) < 1e-6
    assert abs(row.resolution - res) < 1e-6
    assert abs(row.uncertainty - unc) < 1e-6
    assert abs(row.brier_score - (rel - res + unc)) < 1e-6
