"""Byte-pair-encoding tokenizer: distributed merge-rule TRAINING as
an iterative DataFrame loop, and Arrow-batched APPLICATION via
``mapInPandas`` — the real tokenizer plumbing a training-data pipeline
runs before packing sequences (the registry's ``bpe_token_stats`` is
the regex *pre*-tokenizer; this is the merge stage after it).

Training never collects data to the driver (the package-wide rule):
each round's winning pair is a 1-row frame cross-joined back in
broadcast form (the kmeans_cells idiom), and the in-word merge is a
pure ``aggregate()`` fold over the symbol array. The vocabulary table
(distinct words x counts) is the only thing iterated — sublinear in
corpus size, the same observation that makes unigram_logprob_score's
broadcast legal.

Application follows the standard rank-greedy algorithm (lowest-rank
merge first, as GPT-2/SentencePiece-BPE do) in a pandas batch per
Arrow chunk; the merge table rides along as a plain Python dict
closure (broadcast once per executor by Spark's task serialization).

Reference parity: the reference has no tokenizer at all; SURVEY §2
marks token statistics as the nearest surface. Cited shapes:
Sennrich et al. 2016 (BPE), GPT-2's rank-greedy merge application.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

END_MARK = "</w>"  # word-final marker so merges can't cross words


def _words_with_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


_SYMS_EXPR = (
    # word -> array of single-char symbols + terminal marker
    f"concat(transform(split(word, ''), c -> c), array('{END_MARK}'))"
)

# aggregate() fold merging every non-overlapping (a, b) occurrence
# left-to-right: state = (out array, pending symbol)
_MERGE_FOLD = """
aggregate(
  syms,
  struct(CAST(array() AS ARRAY<STRING>) AS out, CAST(NULL AS STRING) AS prev),
  (st, x) -> CASE
      WHEN st.prev IS NULL
          THEN struct(st.out AS out, CAST(x AS STRING) AS prev)
      WHEN st.prev = pa AND x = pb
          THEN struct(concat(st.out, array(concat(pa, pb))) AS out,
                      CAST(NULL AS STRING) AS prev)
      ELSE struct(concat(st.out, array(st.prev)) AS out,
                  CAST(x AS STRING) AS prev)
  END,
  st -> CASE WHEN st.prev IS NULL THEN st.out
             ELSE concat(st.out, array(st.prev)) END
)
"""


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus (Sennrich
    2016): repeatedly merge the most frequent adjacent symbol pair,
    weighted by word frequency, with a deterministic (count desc,
    pair asc) tiebreak.

    Distributed shape: the iterated table is the VOCABULARY (distinct
    words x counts — sublinear in corpus size), symbols live in one
    array column, and each round is (1) a pair-count aggregate with
    map-side combine, (2) a 1-row top-pair frame broadcast back, (3)
    a pure-expression fold rewriting the symbol arrays. No data ever
    reaches the driver; the returned rule list is built from the
    per-round 1-row frames at the very end (2 short strings per
    round).

    Lineage: each round caches its vocabulary frame and unpersists
    the previous one (the dedup_clusters loop discipline), keeping
    plan depth flat."""
    vocab = (
        _words_with_counts(docs, text_col)
        .select("wc", F.expr(_SYMS_EXPR).alias("syms"))
        .cache()
    )
    rules: list[DataFrame] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "wc",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
                        "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("c"))
        )
        top = (
            pairs.orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .select(F.col("a").alias("pa"), F.col("b").alias("pb"))
        )
        merged = (
            vocab.crossJoin(F.broadcast(top))
            .select("wc", F.expr(_MERGE_FOLD).alias("syms"))
            .cache()
        )
        merged.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = merged
        rules.append(top)
    out = []
    for t in rules:
        row = t.first()  # 1-row rule frame; ops-plane, 2 short strings
        out.append((row["pa"], row["pb"]))
    vocab.unpersist()
    return out


def _apply_merges_to_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE application (the GPT-2 algorithm): repeatedly
    merge the pair with the LOWEST training rank until none applies."""
    syms = list(word) + [END_MARK]
    while len(syms) >= 2:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the learned merge table:
    (id, tokens array<string>, n_tokens). Arrow-batched
    ``mapInPandas`` — the merge table is a tiny dict closure shipped
    once per executor; per-word results are memoized within a batch
    (Zipf makes the word cache hit rate high)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = f"{id_col} long, tokens array<string>, n_tokens long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def tok_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _apply_merges_to_word(w, ranks)
            return got

        for pdf in batches:
            toks = [
                [t for w in text.split(" ") if w for t in tok_word(w)]
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
