"""Multimodal column plumbing: media as opaque ``binary`` + typed
metadata (MEDIA_SCHEMA), processed with Arrow-batched ``mapInPandas``.

This is the 100 TB shape for image/audio/video work on Spark: the
bytes never leave the executors, Python sees them in Arrow record
batches (not row-at-a-time pickling), and per-media work is
embarrassingly parallel — partition by media_id ranges upstream and
every stage below scales linearly.

CODECS ARE STUBBED. This container ships no PIL/torchaudio/ffmpeg, so
the *decode* step recognizes a deterministic fake header (see
``make_fake_media_bytes``) and raises ``NotImplementedError`` for real
formats — swap ``_decode_payload`` for a real codec in production.
Everything around the stub — schemas, Arrow batch iteration, feature
math (vectorized numpy over the raw bytes), frame-sampling fan-out —
is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAGIC = b"FAKE"
_KINDS = {"image": 1, "audio": 2, "video": 3}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}
_HEADER = struct.Struct("<4sBiiq")  # magic, kind, width, height, duration_ms


def make_fake_media_bytes(
    kind: str, width: int = 0, height: int = 0, duration_ms: int = 0, seed: int = 0
) -> bytes:
    """Deterministic stand-in for an encoded media payload: a parseable
    header + seed-derived body bytes. Tests fabricate media with this
    so the decode/feature/frame plumbing runs on real binary columns."""
    header = _HEADER.pack(_MAGIC, _KINDS[kind], width, height, duration_ms)
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=max(64, width * height % 4096), dtype=np.uint8)
    return header + body.tobytes()


def _decode_payload(payload: bytes) -> dict:
    """STUB decode: parse the fake header. A real deployment replaces
    this with PIL.Image.open / soundfile / pyav and returns the same
    dict shape; anything without the fake magic lands here."""
    if payload is None or len(payload) < _HEADER.size:
        return {"ok": False, "error": "payload too short"}
    magic, kind_b, width, height, duration_ms = _HEADER.unpack_from(payload)
    if magic != _MAGIC:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "payload is not FAKE-encoded"
        )
    return {
        "ok": True,
        "error": None,
        "decoded_kind": _KIND_NAMES.get(kind_b),
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
    }


def _body_features(payload: bytes) -> dict:
    """Vectorized feature math over the raw bytes (numpy, no per-byte
    Python): size, shannon entropy, mean byte, content digest."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / arr.size
    return {
        "n_bytes": int(arr.size),
        "entropy_bits": float(-(p * np.log2(p)).sum()),
        "mean_byte": float(arr.mean()),
        "digest": hashlib.md5(payload).hexdigest(),
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("decoded_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("entropy_bits", T.DoubleType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over a MEDIA_SCHEMA frame: one output
    row per media row, Arrow batch in / Arrow batch out. Decode errors
    are rows (ok=false), never task failures — a 100 TB run must not
    die on one corrupt file."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, kind, mime, content in zip(
                pdf["media_id"], pdf["kind"], pdf["mime"], pdf["content"]
            ):
                row = {"media_id": media_id, "kind": kind, "mime": mime,
                       "ok": False, "error": None, "decoded_kind": None,
                       "width": None, "height": None, "duration_ms": None,
                       "n_bytes": None, "entropy_bits": None,
                       "mean_byte": None, "digest": None}
                try:
                    payload = bytes(content) if content is not None else None
                    row.update(_decode_payload(payload))
                    if row["ok"]:
                        row.update(_body_features(payload))
                except Exception as exc:  # noqa: BLE001 - errors become rows
                    row["ok"] = False
                    row["error"] = f"{type(exc).__name__}: {exc}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(process, schema=DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("offset_ms", T.LongType(), False),
        T.StructField("frame_digest", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling fan-out for video payloads: one output row per
    sampled timestamp (mapInPandas is a flat-map — output rows need not
    align 1:1 with input). The frame *pixels* come from the stubbed
    decoder; the digest is deterministic in (payload, offset) so the
    fan-out shape and lineage are fully testable."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or content is None:
                    continue
                payload = bytes(content)
                try:
                    meta = _decode_payload(payload)
                except NotImplementedError:
                    continue
                if not meta.get("ok"):
                    continue
                duration = meta["duration_ms"] or 0
                for idx, off in enumerate(range(0, duration, every_ms)):
                    digest = hashlib.md5(payload + off.to_bytes(8, "little")).hexdigest()
                    out.append(
                        {"media_id": media_id, "frame_index": idx,
                         "offset_ms": off, "frame_digest": digest}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(process, schema=FRAME_SCHEMA)
