"""Oracle-independent validation of the remaining text-lane laws:
Flesch readability, the Heaps vocabulary-growth curve, and the
unigram-LM quality score — each re-derived with Counter/loop math.
Seventeenth module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


def _ha_int(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(DOCS)


def test_readability_matches_direct_formulas(spark, docs):
    per_lang: dict = {}
    for lang, txt in zip(docs.lang, docs.text):
        w = len(txt.split(" "))
        s = max(len(re.findall(r"[.!?]+", txt)), 1)
        syl = max(len(re.findall(r"[aeiouy]+", txt.lower())), w)
        wps = w / s
        spw = syl / w
        fre = 206.835 - 1.015 * wps - 84.6 * spw
        fkg = 0.39 * wps + 11.8 * spw - 15.59
        cell = per_lang.setdefault(lang, [0, 0, 0, 0, 0])
        cell[0] += 1
        cell[1] += w
        cell[2] += _ha_int(wps * 1e6)
        cell[3] += _ha_int(fre * 1e6)
        cell[4] += _ha_int(fkg * 1e6)
    rows = {r.lang: r for r in QUERIES["readability_grade"](spark, SF_DIR).collect()}
    assert set(rows) == set(per_lang)
    for lang, (n, w, wps_m, fre_m, fkg_m) in per_lang.items():
        r = rows[lang]
        assert (r.n_docs, r.total_words) == (n, w), lang
        assert abs(r.avg_words_per_sentence - wps_m / n / 1e6) < 1e-6, lang
        assert abs(r.avg_flesch_ease - fre_m / n / 1e6) < 1e-6, lang
        assert abs(r.avg_fk_grade - fkg_m / n / 1e6) < 1e-6, lang


def test_heaps_curve_matches_incremental_walk(spark, docs):
    toks = {
        int(did): [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for did, txt in zip(docs.doc_id, docs.text)
    }
    mn, mx = min(toks), max(toks)
    rows = {r.checkpoint: r for r in QUERIES["heaps_law_curve"](spark, SF_DIR).collect()}
    prev = None
    for i in range(1, 11):
        th = mn + math.floor((mx - mn) * i / 10)
        ids = [d for d in toks if d <= th]
        cum_tokens = sum(len(toks[d]) for d in ids)
        vocab = len({t for d in ids for t in toks[d]})
        r = rows[i]
        assert r.doc_id_threshold == th, i
        assert r.n_docs_cum == len(ids), i
        assert r.cum_tokens == cum_tokens, i
        assert r.vocab_size == vocab, i
        if prev is not None and math.log(cum_tokens) > math.log(prev[0]):
            beta = (math.log(vocab) - math.log(prev[1])) / (
                math.log(cum_tokens) - math.log(prev[0])
            )
            assert abs(r.heaps_beta - beta) < 1e-5, i
        prev = (cum_tokens, vocab)
    # the vocabulary-growth exponent must be sublinear
    betas = [r.heaps_beta for r in rows.values() if r.heaps_beta is not None]
    assert betas and all(b < 1.0 for b in betas)


def test_unigram_logprob_matches_counter_lm(spark, docs):
    vocab: Counter = Counter()
    per_doc = {}
    for did, txt in zip(docs.doc_id, docs.text):
        ws = txt.split(" ")
        per_doc[int(did)] = ws
        vocab.update(ws)
    t = sum(vocab.values())
    rows = {r.doc_id: r for r in QUERIES["unigram_logprob_score"](spark, SF_DIR).collect()}
    assert set(rows) == set(per_doc)
    for did, ws in per_doc.items():
        lps = [math.log(vocab[w] / t) for w in ws]
        r = rows[did]
        assert r.n_tokens == len(ws), did
        assert abs(r.mean_logprob - sum(lps) / len(lps)) < 1e-5, did
        assert abs(r.min_logprob - min(lps)) < 1e-6, did
