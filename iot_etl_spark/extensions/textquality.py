"""Compression-based text quality signals.

The Gopher/CCNet pipelines use a document's DEFLATE compression ratio
as a cheap repetition/boilerplate detector: natural prose compresses
to ~0.35-0.6 of its raw size, boilerplate and template spam far lower,
high-entropy noise (base64 blobs, minified JS) near or above 1.0. The
codec has no SQL equivalent in either engine, so this is a legitimate
rung of the Python-UDF ladder (SCALE.md "Python-surface ladder"):
Arrow-batched ``mapInPandas``, stdlib ``zlib`` only, no external deps
— and it stays OUT of the oracle-paired registry (DuckDB cannot run
DEFLATE; pytest pins the semantics instead).

Reference parity: none — training-data-pipeline extension beside the
repetition_stats / boilerplate_stats family (those count n-gram and
line repetition declaratively; DEFLATE catches what n-gram windows
miss, e.g. long-range template repetition).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField

DEFLATE_LEVEL = 6  # zlib default; fixed so the signal is reproducible


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
) -> DataFrame:
    """Append ``out_col`` = compressed_bytes / raw_bytes per document
    (UTF-8 encoded, zlib level ``DEFLATE_LEVEL``). Empty/NULL text
    gets ratio NULL (no information, not "maximally compressible").

    100 TB shape: pure map — no shuffle, no per-group state; each
    Arrow batch compresses independently, so the operator scales with
    input bytes and parallelism, and composes with any upstream
    pushdown (only ``text_col`` plus passthrough columns cross the
    Python boundary)."""
    import pandas as pd

    fields = df.schema.fields + [StructField(out_col, DoubleType(), True)]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ratios = []
            for t in pdf[text_col]:
                # not isinstance(str) also covers pandas NaN — Arrow
                # can coerce an all-null batch to float NaN, which is
                # not None and would raise on len()
                if not isinstance(t, str) or not t:
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                ratios.append(
                    len(zlib.compress(raw, DEFLATE_LEVEL)) / len(raw)
                )
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(ratios, index=pdf.index, dtype="float64")
            yield pdf

    return df.mapInPandas(fn, out_schema)


def compression_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    low: float = 0.30,
    high: float = 1.0,
) -> DataFrame:
    """Corpus-level rollup of the compression screen: per source,
    document counts, mean ratio, and how many fall outside the
    [low, high] keep band (too compressible = templated/repetitive,
    too incompressible = binary/noise). The aggregate side is plain
    JVM; only the ratio map crosses into Python."""
    from pyspark.sql import functions as F

    scored = with_compression_ratio(df, text_col=text_col)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("compression_ratio"), 6).alias("mean_ratio"),
        F.sum((F.col("compression_ratio") < low).cast("int"))
        .cast("long")
        .alias("n_too_repetitive"),
        F.sum((F.col("compression_ratio") > high).cast("int"))
        .cast("long")
        .alias("n_noise_like"),
    )


__all__ = [
    "DEFLATE_LEVEL",
    "with_compression_ratio",
    "compression_quality_stats",
]
