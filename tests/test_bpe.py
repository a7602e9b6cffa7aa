"""BPE tokenizer extension: distributed training against a pure-Python
reference implementation of the identical algorithm, application
round-trip, and compression monotonicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_etl_spark.extensions.bpe import (
    END_MARK,
    apply_bpe,
    train_bpe_merges,
)
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _py_train(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Reference trainer mirroring the Spark semantics exactly:
    overlapping pair counts weighted by word frequency; tiebreak
    (count desc, a asc, b asc); left-to-right non-overlapping merge."""
    vocab = {w: list(w) + [END_MARK] for w in word_counts}
    rules = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        a, b = best
        for w, syms in vocab.items():
            out, prev = [], None
            for x in syms:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            vocab[w] = out
        rules.append(best)
    return rules


CORPUS = ["low low low low low", "lower lower", "newest newest newest",
          "widest widest", "low lower newest"]


def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_training_matches_reference_implementation(spark):
    docs = _corpus_df(spark)
    got = train_bpe_merges(docs, n_merges=8)
    wc: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = _py_train(wc, 8)
    assert got == want


def test_apply_round_trips_and_respects_merges(spark):
    docs = _corpus_df(spark)
    merges = train_bpe_merges(docs, n_merges=6)
    out = {r.doc_id: r for r in apply_bpe(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        toks = out[i].tokens
        # round trip: concatenating tokens reproduces the words with
        # one END_MARK per word
        assert "".join(toks) == "".join(w + END_MARK for w in text.split(" "))
        assert out[i].n_tokens == len(toks)
    # the most frequent word ('low') must have compressed into few
    # symbols under 6 merges
    low_doc = out[0].tokens
    assert f"low{END_MARK}" in low_doc or "low" in low_doc


def test_more_merges_never_increase_token_count(spark):
    docs = load_table(spark, str(SF_DIR), "documents").limit(50)
    m2 = train_bpe_merges(docs, n_merges=2)
    m8 = train_bpe_merges(docs, n_merges=8)
    assert m8[:2] == m2  # merge list is a prefix-stable sequence
    n2 = apply_bpe(docs, m2).agg(F.sum("n_tokens")).first()[0]
    n8 = apply_bpe(docs, m8).agg(F.sum("n_tokens")).first()[0]
    assert n8 <= n2


def test_apply_is_deterministic(spark):
    docs = _corpus_df(spark)
    merges = train_bpe_merges(docs, n_merges=4)
    a = sorted(map(tuple, apply_bpe(docs, merges).collect()))
    b = sorted(map(tuple, apply_bpe(docs, merges).collect()))
    assert a == b
