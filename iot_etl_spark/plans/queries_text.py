"""LLM-data-pipeline text operators over ``documents`` (driver north
star, SURVEY.md §7.1 M7): exact + fuzzy dedup (shingle Jaccard,
MinHash-LSH, SimHash), text quality / token statistics, language-ID
heuristic, document fingerprinting, multimodal byte plumbing.

All hash arithmetic is md5-derived integers (identical in Spark and
DuckDB — verified ``conv(substr(md5(x),1,8),16,10)`` ==
``('0x'||substr(md5(x),1,8))::BIGINT``) so every operator has an exact
oracle twin.

Scale notes (100 TB): the shingle inverted-index join is the
small-scale exact method; its candidate set explodes on common
shingles, which is precisely what MinHash banding bounds — LSH
candidates are generated with 16 permutations x 4 bands so the join
key is (band, signature), never a raw shingle. SimHash reduces each
doc to one 32-bit int, making the pair scan a cheap block-local join.
No driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iot_etl_spark.plans.registry import query
from iot_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------- helpers

# MinHash parameters: 16 universal-hash permutations over 32-bit
# shingle hashes; prime just above 2^32; a < 2^16 keeps a*h in 2^48.
MINHASH_P = 4294967311
MINHASH_A = [15485863, 32452843, 49979687, 67867967, 86028121, 104395301,
             122949823, 141650939, 160481183, 179424673, 198491317, 217645177,
             236887691, 256203161, 275604541, 295075147]
MINHASH_A = [a % 65536 | 1 for a in MINHASH_A]  # odd, < 2^16
MINHASH_B = [982451653 % MINHASH_P * (i + 1) % MINHASH_P for i in range(16)]
MINHASH_BANDS = 4  # 4 bands x 4 rows

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOP_SQL = "('the','a','of','and','to','in','is','it')"


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def _shingles_expr() -> str:
    """3-gram word shingles, distinct (0-indexed Spark arrays)."""
    return (
        "array_distinct(transform(sequence(1, greatest(size(ws) - 2, 0)), "
        "i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))"
    )


_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(ws) - 2, 0)), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
)

_H32_SPARK = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731


def _duck_h32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# ---------------------------------------------------------- exact dedup
_DEDUP_EXACT_ORACLE = """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
ORDER BY doc_id
"""


@query("dedup_exact", oracle=_DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group on content digest, keep the min doc_id
    as canonical. At 100 TB this is one shuffle on a 128-bit key with
    map-side combine — the standard first pass of any corpus dedup."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text")))
    return (
        docs.select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_doc_id"),
            (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- n-gram Jaccard dedup
_NGRAM_JACCARD_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM w),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
co AS (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS inter
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       ROUND(inter::DOUBLE / (len(x.s) + len(y.s) - inter), 6) AS jaccard
FROM co
JOIN sh x ON x.doc_id = doc_id_a
JOIN sh y ON y.doc_id = doc_id_b
WHERE inter::DOUBLE / (len(x.s) + len(y.s) - inter) >= 0.8
ORDER BY doc_id_a, doc_id_b
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram shingle Jaccard >= 0.8 via an
    inverted-index self-join (explode shingles -> co-occurrence counts
    -> |A∩B| / (|A|+|B|-|A∩B|)). Exact but candidate-heavy — the LSH
    variant below is the 100 TB path."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    ex = sh.select("doc_id", F.explode("s").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    co = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        co.join(sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na")), "doc_id_a")
        .join(sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb")), "doc_id_b")
        .withColumn("jac", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jac") >= 0.8)
    )
    return j.select(
        "doc_id_a", "doc_id_b", F.round("jac", 6).alias("jaccard")
    ).orderBy("doc_id_a", "doc_id_b")


# ---------------------------------------------------- MinHash-LSH dedup
def _duck_minhash_perms() -> str:
    rows = ", ".join(
        f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(16)
    )
    return f"(VALUES {rows}) AS perms(perm, pa, pb)"


_MINHASH_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM w),
ex AS (SELECT doc_id, {_duck_h32('unnest(s)')} AS h FROM sh),
mh AS (
    SELECT doc_id, perm, MIN((pa * h + pb) % {MINHASH_P}) AS mh
    FROM ex, {_duck_minhash_perms()}
    GROUP BY doc_id, perm
),
sig AS (
    SELECT doc_id, perm // {MINHASH_BANDS} AS band,
           string_agg(CAST(mh AS VARCHAR), '|' ORDER BY perm) AS sig
    FROM mh GROUP BY doc_id, perm // {MINHASH_BANDS}
)
SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM sig a JOIN sig b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
ORDER BY doc_id_a, doc_id_b
"""


@query("minhash_lsh_candidates", oracle=_MINHASH_ORACLE)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH banding (4 bands x 4 rows): candidate
    near-dup pairs join on (band, signature) instead of raw shingles —
    the scale path for fuzzy dedup (candidate count is bounded by true
    collisions, not posting-list squares)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    ex = sh.select("doc_id", F.explode("s").alias("shingle")).select(
        "doc_id", _H32_SPARK(F.col("shingle")).alias("h")
    )
    perms = spark.createDataFrame(
        [(i, MINHASH_A[i], MINHASH_B[i]) for i in range(16)],
        "perm INT, pa LONG, pb LONG",
    )
    mh = (
        ex.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min((F.col("pa") * F.col("h") + F.col("pb")) % MINHASH_P).alias("mh"))
    )
    sig = (
        mh.withColumn("band", F.expr(f"perm div {MINHASH_BANDS}"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
                "|",
            ).alias("sig")
        )
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
        .orderBy("doc_id_a", "doc_id_b")
    )


# --------------------------------------------------------------- SimHash
_SIMHASH_CTE = f"""
w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
wc AS (SELECT doc_id, lang, unnest(ws) AS word FROM w),
cnt AS (SELECT doc_id, lang, word, COUNT(*) AS c FROM wc GROUP BY 1, 2, 3),
hb AS (
    SELECT doc_id, lang, c, {_duck_h32('word')} AS h FROM cnt
),
bits AS (
    SELECT doc_id, lang, b,
           SUM(CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END) AS score
    FROM hb, generate_series(0, 31) AS t(b)
    GROUP BY 1, 2, 3
),
fp AS (
    SELECT doc_id, lang,
           CAST(SUM(CASE WHEN score > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY 1, 2
)
"""

_SIMHASH_ORACLE = f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash FROM fp ORDER BY doc_id
"""


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", "lang", F.explode(_words()).alias("word"))
        .groupBy("doc_id", "lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("h", _H32_SPARK(F.col("word")))
    )
    bits = (
        cnt.select("doc_id", "lang", "c", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(
            F.sum(
                F.expr("CASE WHEN shiftright(h, cast(b AS INT)) & 1 = 1 THEN c ELSE -c END")
            ).alias("score")
        )
    )
    return (
        bits.groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.expr("CASE WHEN score > 0 THEN shiftleft(1L, cast(b AS INT)) ELSE 0L END")
            ).cast("long").alias("simhash")
        )
    )


@query("simhash_fingerprint", oracle=_SIMHASH_ORACLE)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from md5-derived word hashes weighted
    by term frequency — one int per doc; near-dups differ in few bits."""
    return _simhash_df(spark, sf_dir).select("doc_id", "simhash").orderBy("doc_id")


_SIMHASH_PAIRS_ORACLE = f"""
WITH {_SIMHASH_CTE}
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
ORDER BY doc_id_a, doc_id_b
"""


@query("simhash_near_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance <= 4 within a language
    block. The pair scan compares one BIGINT per doc — at 100 TB,
    block + band the fingerprint (e.g. 4x8-bit chunks) to avoid the
    quadratic scan; the fingerprint itself is the scalable artifact."""
    fp = _simhash_df(spark, sf_dir)
    a = fp.alias("a")
    b = fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= 4)
        .orderBy("doc_id_a", "doc_id_b")
    )


# ------------------------------------------------- text quality / tokens
_TEXT_STATS_ORACLE = f"""
WITH w AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, lang, n_chars,
       len(ws) AS n_words,
       len(list_distinct(ws)) AS n_distinct_words,
       ROUND(list_aggregate(list_transform(ws, x -> len(x)), 'sum')::DOUBLE / len(ws), 6)
           AS avg_word_len,
       ROUND(len(list_filter(ws, x -> x IN {_STOP_SQL}))::DOUBLE / len(ws), 6)
           AS stopword_ratio,
       ROUND(len(list_distinct(ws))::DOUBLE / len(ws), 6) AS ttr
FROM w
ORDER BY doc_id
"""


@query("text_quality_stats", oracle=_TEXT_STATS_ORACLE)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: word/distinct-word counts, average
    word length, stopword ratio, type-token ratio — the standard
    pre-training quality-filter features. Pure higher-order-function
    columns (no UDF, fully codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", "lang", "n_chars", _words().alias("ws"))
    n = F.size("ws")
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    return w.select(
        "doc_id", "lang", "n_chars",
        n.alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct_words"),
        F.round(
            F.expr("aggregate(transform(ws, x -> length(x)), 0L, (acc, x) -> acc + x)")
            .cast("double") / n, 6,
        ).alias("avg_word_len"),
        F.round(
            F.expr(f"size(filter(ws, x -> x IN ({stop_arr})))").cast("double") / n, 6
        ).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct("ws")).cast("double") / n, 6).alias("ttr"),
    ).orderBy("doc_id")


_TOKEN_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS total_tokens,
       ROUND(SUM(len(regexp_extract_all(text, '[a-z0-9]+')))::DOUBLE / COUNT(*), 6)
           AS avg_tokens_per_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("token_count_by_lang", oracle=_TOKEN_ORACLE)
def token_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (BPE-ish pre-tokenizer: alnum runs)
    aggregated per language — corpus sizing for training-data budgets."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.regexp_count(F.col("text"), F.lit("[a-z0-9]+"))
    return (
        docs.withColumn("ntok", ntok)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.round(F.sum("ntok").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------- language ID
_LANG_SETS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "los", "las"),
    "fr": ("le", "les", "des"),
}


def _duck_langcount(lang: str) -> str:
    s = ", ".join(f"'{w}'" for w in _LANG_SETS[lang])
    return f"len(list_filter(ws, x -> x IN ({s})))"


_LANGID_ORACLE = f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
sc AS (
    SELECT doc_id, lang,
           {_duck_langcount('en')} AS c_en,
           {_duck_langcount('de')} AS c_de,
           {_duck_langcount('es')} AS c_es,
           {_duck_langcount('fr')} AS c_fr
    FROM w
),
pred AS (
    SELECT lang,
           CASE WHEN c_en > c_de AND c_en > c_es AND c_en > c_fr THEN 'en'
                WHEN c_de > c_en AND c_de > c_es AND c_de > c_fr THEN 'de'
                WHEN c_es > c_en AND c_es > c_de AND c_es > c_fr THEN 'es'
                WHEN c_fr > c_en AND c_fr > c_de AND c_fr > c_es THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM sc
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("langid_confusion", oracle=_LANGID_ORACLE)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID heuristic with a strict-argmax CASE
    chain (ties -> 'unknown'), reported as a (true lang x predicted)
    confusion matrix."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", "lang", _words().alias("ws"))
    cols = {}
    for lg, ws_ in _LANG_SETS.items():
        s = ", ".join(f"'{x}'" for x in ws_)
        cols[lg] = F.expr(f"size(filter(ws, x -> x IN ({s})))")
    c_en, c_de, c_es, c_fr = cols["en"], cols["de"], cols["es"], cols["fr"]
    pred = (
        F.when((c_en > c_de) & (c_en > c_es) & (c_en > c_fr), "en")
        .when((c_de > c_en) & (c_de > c_es) & (c_de > c_fr), "de")
        .when((c_es > c_en) & (c_es > c_de) & (c_es > c_fr), "es")
        .when((c_fr > c_en) & (c_fr > c_de) & (c_fr > c_es), "fr")
        .otherwise("unknown")
    )
    return (
        w.withColumn("predicted_lang", pred)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


# --------------------------------------------- rolling-hash fingerprint
_FINGERPRINT_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM w),
ex AS (SELECT doc_id, {_duck_h32('unnest(s)')} AS h FROM sh)
SELECT doc_id, COUNT(*) AS n_shingles,
       MIN(h) AS min_shingle_hash, MAX(h) AS max_shingle_hash
FROM ex GROUP BY doc_id ORDER BY doc_id
"""


@query("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min/max over rolling
    3-gram hashes (the min-hash of the shingle stream) + shingle count."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _words().alias("ws")).select(
        "doc_id", F.expr(_shingles_expr()).alias("s")
    )
    ex = sh.select("doc_id", F.explode("s").alias("shingle")).select(
        "doc_id", _H32_SPARK(F.col("shingle")).alias("h")
    )
    return (
        ex.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.min("h").alias("min_shingle_hash"),
            F.max("h").alias("max_shingle_hash"),
        )
        .orderBy("doc_id")
    )


# ----------------------------------------------- multimodal byte plumbing
_BYTES_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest
FROM documents
ORDER BY doc_id
"""


@query("multimodal_bytes_stats", oracle=_BYTES_ORACLE)
def multimodal_bytes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary plumbing exercised on real data: treat text bytes
    as a binary payload (the testdata ships no media table), compute
    size + content digest. The full multimodal decode pipeline
    (mapInPandas over binary + typed metadata) lives in
    iot_etl_spark/extensions/multimodal.py with stubbed codecs."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    ).orderBy("doc_id")
