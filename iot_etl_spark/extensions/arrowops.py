"""Arrow-native batch operators via ``mapInArrow`` — the zero-copy
rung of the Python UDF ladder.

The registry's rule stands: built-in Column expressions first (JVM,
whole-stage codegen — e.g. embedding_int8_quant's HOF form), Pandas
UDFs when Python is unavoidable. ``mapInArrow`` sits below Pandas
UDFs: the executor hands Python raw ``pyarrow.RecordBatch``es with NO
pandas conversion (no copy into numpy object arrays, no index
machinery), which matters precisely for the columns pandas handles
worst — fixed-width list/array columns and large binaries, i.e. the
embedding and media payloads of an LLM data pipeline.

``int8_quantize_arrow`` is the demonstrator: symmetric int8 embedding
quantization (the same math as embedding_int8_quant's JVM path —
scale = max|x|, code = clamp(floor(x * 127 / scale + 0.5))) over the
Arrow buffers directly. numpy views the flattened values buffer
zero-copy, the per-vector reduction is one reshape when the layout is
fixed-width, and the output batch is rebuilt as Arrow arrays without a
pandas detour. The pytest pins bit-equality of codes and scales
against the JVM expression path at test SF — two independent
implementations, one contract (the approx-twin convention applied to
an API surface).

Scale: map-side only, no shuffle; Arrow batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; peak Python memory
is one batch's values buffer plus the int8 output (|batch| x dim
bytes), independent of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import types as T

QUANT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("scale", T.DoubleType(), True),
        T.StructField("codes", T.ArrayType(T.ByteType()), True),
    ]
)


def _quantize_matrix(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) float64 -> per-row scales (n,) and int8 codes (n, d):
    code = clamp(floor(x * 127 / scale + 0.5), -127, 127); rows with
    scale 0 (the all-zero vector) code to zeros with scale 0."""
    scales = np.abs(mat).max(axis=1)
    safe = np.where(scales > 0, scales, 1.0)
    codes = np.floor(mat * (127.0 / safe[:, None]) + 0.5)
    np.clip(codes, -127.0, 127.0, out=codes)
    codes[scales == 0] = 0.0
    return scales, codes.astype(np.int8)


def int8_quantize_arrow(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization of an ``array<float|double>`` column
    via ``mapInArrow`` (module notes above). Output:
    (vec_id, scale double, codes array<tinyint>)."""

    def process(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            vec = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(vec, pa.ChunkedArray):  # pragma: no cover - RB cols are flat
                vec = vec.combine_chunks()
            lv = vec
            if pa.types.is_fixed_size_list(lv.type):
                dim = lv.type.list_size
                flat = lv.values.to_numpy(zero_copy_only=False).astype(np.float64)
                mat = flat.reshape(len(lv), dim)
                scales, codes = _quantize_matrix(mat)
                codes_arr = pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), type=pa.int8()), dim
                ).cast(pa.list_(pa.int8()))
            else:
                offsets = lv.offsets.to_numpy(zero_copy_only=False)
                flat = lv.values.to_numpy(zero_copy_only=False).astype(np.float64)
                widths = np.diff(offsets)
                if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
                    mat = flat[offsets[0]: offsets[-1]].reshape(len(lv), widths[0])
                    scales, codes = _quantize_matrix(mat)
                    flat_codes = codes.ravel()
                else:  # ragged fallback: per-row slices, same math
                    scales = np.empty(len(lv))
                    parts = []
                    for i in range(len(lv)):
                        row = flat[offsets[i]: offsets[i + 1]][None, :]
                        if row.size == 0:
                            scales[i] = 0.0
                            parts.append(np.empty(0, dtype=np.int8))
                            continue
                        s, c = _quantize_matrix(row)
                        scales[i] = s[0]
                        parts.append(c[0])
                    flat_codes = np.concatenate(parts) if parts else np.empty(0, np.int8)
                codes_arr = pa.ListArray.from_arrays(
                    pa.array(offsets - offsets[0], type=pa.int32()),
                    pa.array(flat_codes, type=pa.int8()),
                )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(scales, type=pa.float64()), codes_arr],
                names=["vec_id", "scale", "codes"],
            )

    return df.select(id_col, vec_col).mapInArrow(process, schema=QUANT_SCHEMA)
