"""Multimodal column plumbing: media as opaque ``binary`` + typed
metadata (MEDIA_SCHEMA), processed with Arrow-batched ``mapInPandas``.

This is the 100 TB shape for image/audio/video work on Spark: the
bytes never leave the executors, Python sees them in Arrow record
batches (not row-at-a-time pickling), and per-media work is
embarrassingly parallel — partition by media_id ranges upstream and
every stage below scales linearly.

Codec status (this container ships no PIL/torchaudio/ffmpeg):

- **RIFF/WAVE audio decodes FOR REAL** via the stdlib ``wave`` module:
  sample rate, channels, frame-count duration, and RMS amplitude
  computed from the actual PCM samples.
- **Uncompressed 24-bit BMP decodes FOR REAL** via ``struct`` header
  parsing: dimensions plus mean pixel value from the actual pixel
  array (stride-aware).
- **PNG decodes FOR REAL** via stdlib ``zlib``: chunk walk, IDAT
  inflate, per-row unfiltering (all five filter types incl. Paeth),
  mean pixel over the reconstructed samples (8-bit non-interlaced
  greyscale/RGB/GA/RGBA; other shapes fall back to dims-only).
- Entropy-coded formats (JPEG/MP3/MP4/...) still raise
  ``NotImplementedError`` — DCT/Huffman needs a real codec library;
  swap ``_decode_payload``'s fallthrough for PIL/pyav in production.
- The deterministic ``FAKE`` header (``make_fake_media_bytes``) remains
  for exercising the video frame-sampling fan-out, which has no
  stdlib-decodable container format.

Everything around the codecs — schemas, Arrow batch iteration, feature
math (vectorized numpy), error-as-row handling, frame fan-out — is the
same code path real formats take.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def make_wav_bytes(
    duration_ms: int = 1000, rate: int = 8000, freq_hz: float = 440.0
) -> bytes:
    """A REAL (stdlib-written) mono 16-bit PCM RIFF/WAVE payload: a
    sine tone at ``freq_hz``. Round-trips through ``_decode_wav``."""
    import io
    import wave

    n = int(rate * duration_ms / 1000)
    t = np.arange(n, dtype=np.float64)
    samples = (0.5 * np.sin(2 * np.pi * freq_hz * t / rate) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def make_bmp_bytes(width: int = 8, height: int = 6, seed: int = 0) -> bytes:
    """A REAL uncompressed 24-bit BMP payload (BITMAPINFOHEADER,
    4-byte-padded rows) with seed-deterministic pixels."""
    rng = np.random.default_rng(seed)
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    body = b"".join(
        rng.integers(0, 256, row_len, dtype=np.uint8).tobytes() + b"\x00" * pad
        for _ in range(height)
    )
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + dib + body


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick left/up/up-left
    closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def make_png_bytes(width: int = 8, height: int = 6, seed: int = 0) -> bytes:
    """A REAL stdlib-written 8-bit RGB PNG with seed-deterministic
    pixels. Rows cycle filter types 0-4 (None/Sub/Up/Average/Paeth) so
    a decode round-trip exercises every unfilter branch."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (height, width * 3), dtype=np.uint8)
    bpp = 3
    lines = []
    for y in range(height):
        raw = px[y]
        up = px[y - 1] if y else np.zeros(width * 3, dtype=np.uint8)
        ftype = y % 5
        if ftype == 0:
            filt = raw.copy()
        elif ftype == 2:
            filt = raw - up  # uint8 wraparound == mod-256 arithmetic
        else:
            filt = np.empty_like(raw)
            for x in range(width * 3):
                left = int(raw[x - bpp]) if x >= bpp else 0
                upleft = int(up[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + int(up[x])) // 2
                else:
                    pred = _paeth(left, int(up[x]), upleft)
                filt[x] = (int(raw[x]) - pred) % 256
        lines.append(bytes([ftype]) + filt.tobytes())
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> dict:
    """Real PNG decode, pure stdlib: chunk walk -> IHDR dims -> zlib
    inflate of the IDAT stream -> per-row unfiltering (all five filter
    types) -> mean pixel over the reconstructed samples. Supports 8-bit
    greyscale/RGB/greyscale-alpha/RGBA, non-interlaced; other shapes
    (16-bit, palette, Adam7) fall back to dims-only metadata."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return {"ok": False, "error": "bad PNG signature"}
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # data + length/type/CRC words
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        return {"ok": False, "error": "missing IHDR"}
    width, height, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    out = {
        "ok": True,
        "error": None,
        "decoded_kind": "image",
        "width": int(width),
        "height": int(height),
    }
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0 or width == 0 or height == 0:
        return out  # dims-only for shapes outside the stdlib decoder
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        return {"ok": False, "error": f"IDAT inflate failed: {exc}"}
    bpp = channels  # bytes per pixel at depth 8
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        return out  # truncated pixel data; keep header metadata
    recon = np.zeros((height, stride), dtype=np.uint8)
    rpos = 0
    for y in range(height):
        ftype = raw[rpos]
        line = np.frombuffer(raw, np.uint8, stride, rpos + 1).copy()
        rpos += stride + 1
        up = recon[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            recon[y] = line
        elif ftype == 2:
            recon[y] = line + up  # uint8 wraparound == mod-256
        elif ftype in (1, 3, 4):
            row = recon[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + int(up[x])) // 2
                else:
                    upleft = int(up[x - bpp]) if x >= bpp else 0
                    pred = _paeth(left, int(up[x]), upleft)
                row[x] = (int(line[x]) + pred) % 256
        else:
            return {"ok": False, "error": f"unknown PNG filter type {ftype}"}
    out["mean_pixel"] = float(recon.mean())
    return out


def _decode_wav(payload: bytes) -> dict:
    """Real RIFF/WAVE decode (stdlib ``wave``): container metadata plus
    RMS amplitude computed from the decoded PCM samples."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        sample_width = w.getsampwidth()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    out = {
        "ok": True,
        "error": None,
        "decoded_kind": "audio",
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "sample_rate_hz": int(rate),
        "n_channels": int(n_channels),
    }
    if sample_width == 2 and frames:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        out["rms"] = float(np.sqrt(np.mean(arr * arr)))
    return out


def _decode_bmp(payload: bytes) -> dict:
    """Real uncompressed-BMP decode (``struct`` header parse):
    dimensions plus mean pixel value over the stride-aware pixel
    array."""
    if len(payload) < 54:
        return {"ok": False, "error": "truncated BMP header"}
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    _, width, height_raw = struct.unpack_from("<Iii", payload, 14)
    bits_per_pixel = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    height = abs(height_raw)
    out = {
        "ok": True,
        "error": None,
        "decoded_kind": "image",
        "width": int(width),
        "height": int(height),
    }
    if bits_per_pixel == 24 and compression == 0:
        row_len = width * 3
        stride = (row_len + 3) // 4 * 4
        need = data_offset + stride * height
        # width > 0 matters too: a crafted width=0 header would compute
        # a mean over an empty slice (NaN + numpy warning) otherwise
        if len(payload) >= need and height > 0 and width > 0:
            px = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                               offset=data_offset).reshape(height, stride)
            out["mean_pixel"] = float(px[:, :row_len].mean())
    return out


def _decode_payload(payload: bytes) -> dict:
    """Dispatch decode: real WAV (RIFF/WAVE) and uncompressed BMP parse
    natively; the deterministic FAKE header drives the video plumbing;
    compressed formats raise (a real deployment adds PIL.Image.open /
    soundfile / pyav branches returning the same dict shape)."""
    if payload is None or len(payload) < 14:
        return {"ok": False, "error": "payload too short"}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if len(payload) >= _HEADER.size:
        magic, kind_b, width, height, duration_ms = _HEADER.unpack_from(payload)
        if magic == _MAGIC:
            return {
                "ok": True,
                "error": None,
                "decoded_kind": _KIND_NAMES.get(kind_b),
                "width": width,
                "height": height,
                "duration_ms": duration_ms,
            }
    raise NotImplementedError(
        "entropy-coded media codecs (JPEG/MP3/MP4/...) are not available in "
        "this environment; RIFF/WAVE, uncompressed BMP, and PNG decode natively"
    )


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
        T.StructField("sample_rate_hz", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
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
                       "sample_rate_hz": None, "n_channels": None,
                       "rms": None, "mean_pixel": None,
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
