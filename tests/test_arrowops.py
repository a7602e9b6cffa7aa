"""mapInArrow operator tests: the zero-copy Arrow batch surface
(extensions/arrowops.py). The quantizer must be BIT-equal to the JVM
expression path — two independent implementations, one contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.extensions.arrowops import int8_quantize_arrow
from iot_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_JVM_CODES = (
    "transform(array(array_max(transform(embedding, x -> abs(cast(x as double))))), m -> "
    "transform(embedding, x -> CAST(least(127.0d, greatest(-127.0d, "
    "floor(cast(x as double) * 127.0d / if(m > 0, m, 1.0d) + 0.5d))) AS TINYINT)))[0]"
)


def test_int8_quantize_arrow_bit_equals_jvm_path(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    arrow = int8_quantize_arrow(emb).orderBy("vec_id").collect()
    jvm = (
        emb.select(
            "vec_id",
            F.expr(
                "array_max(transform(embedding, x -> abs(cast(x as double))))"
            ).alias("scale"),
            F.expr(_JVM_CODES).alias("codes"),
        )
        .orderBy("vec_id")
        .collect()
    )
    assert len(arrow) == len(jvm) > 0
    for a, j in zip(arrow, jvm):
        assert a.vec_id == j.vec_id
        assert abs(a.scale - j.scale) < 1e-12
        assert list(a.codes) == list(j.codes)


def test_int8_quantize_arrow_ragged_and_zero_rows(spark):
    """The ragged fallback path: mixed widths, an all-zero vector
    (scale 0 -> zero codes), and an empty array row."""
    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0]),
            (3, []),
            (4, [3.0]),
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {r.vec_id: r for r in int8_quantize_arrow(df).collect()}
    assert out[1].scale == 2.0
    # floor(1*127/2 + .5)=64, floor(-2*127/2+.5)=-127, floor(.5*127/2+.5)=32
    assert list(out[1].codes) == [64, -127, 32]
    assert out[2].scale == 0.0 and list(out[2].codes) == [0, 0]
    assert out[3].scale == 0.0 and list(out[3].codes) == []
    assert out[4].scale == 3.0 and list(out[4].codes) == [127]
