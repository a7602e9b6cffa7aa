"""Multimodal plumbing tests: MEDIA_SCHEMA + Arrow-batched
mapInPandas decode/feature/frame-sample with fabricated binaries
(the container has no media codecs — the decode step is a documented
deterministic stub; the Spark plumbing under test is real)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.extensions.multimodal import (
    DECODED_SCHEMA,
    FRAME_SCHEMA,
    decode_and_featurize,
    make_fake_media_bytes,
    sample_frames,
)
from iot_etl_spark.schemas import MEDIA_SCHEMA


def _media_df(spark):
    rows = [
        (1, "image", make_fake_media_bytes("image", 640, 480, 0, seed=1),
         "image/fake", 640, 480, None),
        (2, "audio", make_fake_media_bytes("audio", 0, 0, 30_000, seed=2),
         "audio/fake", None, None, 30_000),
        (3, "video", make_fake_media_bytes("video", 1280, 720, 5_500, seed=3),
         "video/fake", 1280, 720, 5_500),
        (4, "image", b"\x89PNG\r\n\x1a\n not actually decodable",
         "image/png", None, None, None),
        (5, "image", None, "image/fake", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_and_featurize_schema_and_values(spark):
    out = decode_and_featurize(_media_df(spark))
    assert out.schema == DECODED_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5  # one row per media row, errors included

    img = rows[1]
    assert img.ok and img.decoded_kind == "image"
    assert (img.width, img.height) == (640, 480)
    assert img.n_bytes and img.n_bytes > 64
    assert 0.0 < img.entropy_bits <= 8.0
    assert img.digest and len(img.digest) == 32

    vid = rows[3]
    assert vid.ok and vid.duration_ms == 5_500

    # PNG magic but no chunks -> real decoder rejects it, as a row
    png = rows[4]
    assert not png.ok and "IHDR" in png.error

    # null payload -> error row, not a crash
    assert not rows[5].ok


def test_decode_is_deterministic(spark):
    a = decode_and_featurize(_media_df(spark)).filter("ok").select("media_id", "digest")
    b = decode_and_featurize(_media_df(spark)).filter("ok").select("media_id", "digest")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sample_frames_fanout(spark):
    out = sample_frames(_media_df(spark), every_ms=1000)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    # only media 3 is a decodable video: 5.5s at 1 f/s -> 6 frames (0..5000ms)
    assert {r.media_id for r in rows} == {3}
    assert [r.offset_ms for r in sorted(rows, key=lambda r: r.frame_index)] == [
        0, 1000, 2000, 3000, 4000, 5000
    ]
    assert len({r.frame_digest for r in rows}) == len(rows)  # per-frame digests differ


def test_partitioned_batch_shape(spark):
    """The plumbing survives multi-partition Arrow batching (the 100 TB
    layout: media sharded across executors)."""
    df = _media_df(spark).repartition(4, F.col("media_id"))
    out = decode_and_featurize(df)
    assert out.count() == 5
    assert out.filter("ok").count() == 3


def test_dedupe_corpus_end_to_end(spark):
    """dedupe_corpus drops exact dups AND near-dups, keeps the min-id
    canonical of each group, and never drops distinct content."""
    from iot_etl_spark.extensions.corpus import dedupe_corpus

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base + " indeed"  # high-Jaccard near-dup of base
    distinct1 = "completely different words about spark and catalyst and parquet files"
    distinct2 = "yet another unrelated document mentioning streams windows and state stores"
    rows = [
        (0, base, "en", "web", len(base)),
        (1, base, "en", "web", len(base)),          # exact dup of 0
        (2, near, "en", "web", len(near)),          # near dup of 0
        (3, distinct1, "en", "web", len(distinct1)),
        (4, distinct2, "en", "web", len(distinct2)),
        (5, distinct2, "en", "web", len(distinct2)),  # exact dup of 4
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    kept = sorted(r.doc_id for r in dedupe_corpus(spark, docs).collect())
    assert kept == [0, 3, 4], kept


def test_real_wav_decode_through_spark(spark):
    """RIFF/WAVE payloads decode FOR REAL (stdlib wave): container
    metadata and an RMS computed from the actual PCM sine samples
    (0.5 amplitude sine -> RMS ~ 0.3536)."""
    from iot_etl_spark.extensions.multimodal import make_wav_bytes

    wav = make_wav_bytes(duration_ms=500, rate=8000, freq_hz=440.0)
    df = spark.createDataFrame(
        [(10, "audio", wav, "audio/wav", None, None, None)], MEDIA_SCHEMA
    )
    row = decode_and_featurize(df).collect()[0]
    assert row.ok and row.decoded_kind == "audio"
    assert row.sample_rate_hz == 8000 and row.n_channels == 1
    assert row.duration_ms == 500
    assert abs(row.rms - 0.5 / 2 ** 0.5) < 0.01
    assert row.digest and row.n_bytes == len(wav)


def test_real_bmp_decode_through_spark(spark):
    """Uncompressed 24-bit BMP payloads decode FOR REAL (struct header
    parse + stride-aware pixel array): dimensions and mean pixel match
    a direct numpy computation on the same seeded pixels."""
    from iot_etl_spark.extensions.multimodal import make_bmp_bytes
    import numpy as np

    bmp = make_bmp_bytes(width=5, height=4, seed=7)  # width forces row padding
    df = spark.createDataFrame(
        [(11, "image", bmp, "image/bmp", 5, 4, None)], MEDIA_SCHEMA
    )
    row = decode_and_featurize(df).collect()[0]
    assert row.ok and row.decoded_kind == "image"
    assert (row.width, row.height) == (5, 4)
    rng = np.random.default_rng(7)
    expected = np.concatenate(
        [rng.integers(0, 256, 15, dtype=np.uint8) for _ in range(4)]
    ).mean()
    assert abs(row.mean_pixel - float(expected)) < 1e-9


def test_real_png_decode_through_spark(spark):
    """PNG payloads decode FOR REAL (stdlib zlib inflate + per-row
    unfiltering): the generator cycles all five filter types, so a
    matching mean pixel proves every unfilter branch (incl. Paeth)
    reconstructs exactly."""
    from iot_etl_spark.extensions.multimodal import make_png_bytes
    import numpy as np

    png = make_png_bytes(width=7, height=10, seed=21)  # >=10 rows: filters 0-4 twice
    df = spark.createDataFrame(
        [(13, "image", png, "image/png", 7, 10, None)], MEDIA_SCHEMA
    )
    row = decode_and_featurize(df).collect()[0]
    assert row.ok and row.decoded_kind == "image"
    assert (row.width, row.height) == (7, 10)
    expected = np.random.default_rng(21).integers(0, 256, (10, 21), dtype=np.uint8).mean()
    assert abs(row.mean_pixel - float(expected)) < 1e-9
    assert row.digest and row.n_bytes == len(png)


def test_png_dims_only_fallback():
    """Unsupported PNG shapes (16-bit depth) keep header metadata but
    skip pixel reconstruction — no crash, no NotImplementedError."""
    import struct
    import zlib
    from iot_etl_spark.extensions.multimodal import _decode_png

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0)  # 16-bit RGB
    payload = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    out = _decode_png(payload)
    assert out["ok"] and (out["width"], out["height"]) == (4, 3)
    assert "mean_pixel" not in out


def test_real_jpeg_decode_through_spark(spark):
    """Baseline JPEG payloads decode FOR REAL (stdlib marker walk +
    canonical Huffman entropy decode + matrix IDCT): dimensions exact
    and mean pixel within quantization error of the source image, for
    greyscale, RGB 4:4:4, and RGB 4:2:0 with restart markers."""
    import numpy as np
    from iot_etl_spark.extensions.multimodal import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:33].astype(float)
    gray = np.clip(128 + 60 * np.sin(xx / 8) + 40 * np.cos(yy / 6), 0, 255).astype(
        np.uint8
    )
    rgb = np.stack(
        [np.clip(128 + 80 * np.sin(xx / 7 + i) * np.cos(yy / 9), 0, 255)
         for i in range(3)],
        axis=-1,
    ).astype(np.uint8)
    payloads = [
        (20, encode_jpeg(gray), gray),
        (21, encode_jpeg(rgb), rgb),
        (22, encode_jpeg(rgb, subsample=True, restart_interval=2), rgb),
    ]
    df = spark.createDataFrame(
        [(i, "image", p, "image/jpeg", 33, 24, None) for i, p, _ in payloads],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_and_featurize(df).collect()}
    for i, payload, src in payloads:
        row = rows[i]
        assert row.ok and row.decoded_kind == "image", row.error
        assert (row.width, row.height) == (33, 24)
        assert abs(row.mean_pixel - float(src.mean())) < 1.5
        assert row.digest and row.n_bytes == len(payload)


def test_jpeg_restart_decode_identical():
    """Restart-marker streams reconstruct the identical image as the
    plain stream (byte-align + DC-predictor reset path)."""
    import numpy as np
    from iot_etl_spark.extensions.multimodal import encode_jpeg, _decode_jpeg

    yy, xx = np.mgrid[0:40, 0:56].astype(float)
    rgb = np.stack(
        [np.clip(128 + 80 * np.sin(xx / 7 + i), 0, 255) for i in range(3)], axis=-1
    ).astype(np.uint8)
    plain = _decode_jpeg(encode_jpeg(rgb, subsample=True))
    rst = _decode_jpeg(encode_jpeg(rgb, subsample=True, restart_interval=3))
    assert plain["ok"] and rst["ok"]
    assert plain["mean_pixel"] == rst["mean_pixel"]


def test_jpeg_progressive_dims_only_fallback():
    """Progressive JPEG (SOF2) keeps header metadata but skips pixel
    reconstruction — no crash, no NotImplementedError."""
    import struct
    from iot_etl_spark.extensions.multimodal import _decode_jpeg

    sof2 = struct.pack(">BHHB", 8, 9, 13, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
        + b"\xff\xd9"
    )
    out = _decode_jpeg(payload)
    assert out["ok"] and (out["width"], out["height"]) == (13, 9)
    assert "mean_pixel" not in out


def test_malformed_jpeg_errors_as_row(spark):
    """A JPEG-magic payload with no frame header is an error ROW
    (ok=false), never a task failure."""
    df = spark.createDataFrame(
        [(12, "image", b"\xff\xd8\xff\xe0 not a decodable jpeg body",
          "image/jpeg", None, None, None)],
        MEDIA_SCHEMA,
    )
    row = decode_and_featurize(df).collect()[0]
    assert not row.ok and "SOF" in row.error


def test_real_gif_decode_through_spark(spark):
    """GIF payloads decode FOR REAL (full LZW decompression + palette
    mapping): mean pixel matches the seeded source EXACTLY (LZW is
    lossless), for both random images (dictionary growth) and flat
    images (the KwKwK special case)."""
    import numpy as np
    from iot_etl_spark.extensions.multimodal import make_gif_bytes

    cases = [(30, 33, 24, 5, False), (31, 64, 64, 3, True)]
    df = spark.createDataFrame(
        [(i, "image", make_gif_bytes(w, h, seed, flat=flat), "image/gif", w, h, None)
         for i, w, h, seed, flat in cases],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_and_featurize(df).collect()}
    for i, w, h, seed, flat in cases:
        rng = np.random.default_rng(seed)
        palette = rng.integers(0, 256, (64, 3), dtype=np.uint8)
        idx = (
            np.full((h, w), int(rng.integers(0, 64)), dtype=np.uint8)
            if flat else rng.integers(0, 64, (h, w), dtype=np.uint8)
        )
        row = rows[i]
        assert row.ok and row.decoded_kind == "image", row.error
        assert (row.width, row.height) == (w, h)
        assert row.mean_pixel == float(palette[idx].mean())


def test_gif_lzw_dictionary_overflow_roundtrip():
    """A large random GIF forces the LZW dictionary through every code
    width up to 12 bits and a mid-stream Clear reset; the decode is
    still bit-exact."""
    import numpy as np
    from iot_etl_spark.extensions.multimodal import make_gif_bytes, _decode_gif

    out = _decode_gif(make_gif_bytes(500, 400, seed=9))
    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, (400, 500), dtype=np.uint8)
    assert out["ok"] and out["mean_pixel"] == float(palette[idx].mean())


def test_compressed_formats_still_error_as_rows(spark):
    """Unparseable payloads land as error ROWS, never task failures:
    an ID3 tag with no MPEG frames behind it is a parse error from
    the real MP3 walk; a genuinely unknown container still takes the
    documented NotImplementedError path."""
    df = spark.createDataFrame(
        [(12, "audio", b"ID3\x04\x00\x00\x00\x00\x00\x00 not decodable mp3",
          "audio/mpeg", None, None, None),
         (13, "video", b"\x00unknown-container" + b"\x00" * 32,
          "video/x-unknown", None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_and_featurize(df).collect()}
    assert not rows[12].ok and "no valid MPEG audio frames" in rows[12].error
    assert not rows[13].ok and "NotImplementedError" in rows[13].error


def test_resize_identity_on_bmp(spark):
    """Resize to the source's own dims is the pixel identity: the
    output BMP decodes to the same dimensions and the same mean pixel
    as the input (nearest-neighbor index map i*src//out == i)."""
    from iot_etl_spark.extensions.multimodal import (
        RESIZED_SCHEMA,
        make_bmp_bytes,
        resize_images,
    )

    bmp = make_bmp_bytes(width=8, height=6, seed=3)
    df = spark.createDataFrame(
        [(21, "image", bmp, "image/bmp", 8, 6, None)], MEDIA_SCHEMA
    )
    out = resize_images(df, 8, 6).collect()
    assert len(out) == 1
    r = out[0]
    assert r.ok and r.error is None
    assert (r.src_width, r.src_height) == (8, 6)
    assert (r.out_width, r.out_height) == (8, 6)
    # identity: round-trip the produced BMP through the decoder
    redecoded = decode_and_featurize(
        spark.createDataFrame(
            [(22, "image", bytes(r.content), "image/bmp", 8, 6, None)],
            MEDIA_SCHEMA,
        )
    ).collect()[0]
    assert redecoded.ok
    assert (redecoded.width, redecoded.height) == (8, 6)
    assert abs(redecoded.mean_pixel - r.mean_pixel) < 1e-9
    # schema contract
    assert [f.name for f in RESIZED_SCHEMA.fields] == list(out[0].asDict())


def test_resize_downscale_png_and_errors_as_rows(spark):
    """PNG pixels resize through the same path (channel-normalized to
    RGB); a constant-color source stays constant after resize; formats
    without pixel-level decode and corrupt payloads become ok=false
    ROWS, never task failures."""
    from iot_etl_spark.extensions.multimodal import (
        make_fake_media_bytes,
        make_png_bytes,
        resize_images,
    )

    png = make_png_bytes(width=10, height=8, seed=5)
    rows = [
        (31, "image", png, "image/png", 10, 8, None),
        (32, "video", make_fake_media_bytes("video", 64, 48, 1000, seed=1),
         "video/fake", 64, 48, 1000),
        (33, "image", b"\x89PNG\r\n\x1a\n corrupt", "image/png", None, None, None),
    ]
    out = {r.media_id: r for r in resize_images(
        spark.createDataFrame(rows, MEDIA_SCHEMA), 5, 4).collect()}
    ok_row = out[31]
    assert ok_row.ok and (ok_row.out_width, ok_row.out_height) == (5, 4)
    assert ok_row.content is not None and bytes(ok_row.content)[:2] == b"BM"
    assert not out[32].ok and "pixel-level" in out[32].error
    assert not out[33].ok

    # constant image invariant: every resized pixel equals the constant
    import numpy as np
    from iot_etl_spark.extensions.multimodal import _decode_payload

    const = np.full((6, 6, 3), 77, dtype=np.uint8)
    from iot_etl_spark.extensions.multimodal import _encode_bmp_pixels

    cbmp = _encode_bmp_pixels(const)
    cdf = spark.createDataFrame(
        [(41, "image", cbmp, "image/bmp", 6, 6, None)], MEDIA_SCHEMA
    )
    cres = resize_images(cdf, 3, 2).collect()[0]
    assert cres.ok and cres.mean_pixel == 77.0
    meta = _decode_payload(bytes(cres.content))
    assert meta["width"] == 3 and meta["height"] == 2 and meta["mean_pixel"] == 77.0


def test_resize_is_deterministic(spark):
    """Same input, same target dims -> byte-identical output digest
    across invocations (no RNG, no kernel ambiguity)."""
    from iot_etl_spark.extensions.multimodal import make_bmp_bytes, resize_images

    bmp = make_bmp_bytes(width=9, height=7, seed=11)
    df = spark.createDataFrame(
        [(51, "image", bmp, "image/bmp", 9, 7, None)], MEDIA_SCHEMA
    )
    d1 = resize_images(df, 4, 3).collect()[0].digest
    d2 = resize_images(df, 4, 3).collect()[0].digest
    assert d1 == d2


def _ramp_bmp(width=32, height=24, reverse=False, perturb=None):
    """Deterministic smooth horizontal-ramp BMP via the module's own
    encoder; optional single-pixel perturbation for near-dup tests."""
    import numpy as np

    from iot_etl_spark.extensions.multimodal import _encode_bmp_pixels

    x = (np.arange(width) * 255) // (width - 1)
    if reverse:
        x = x[::-1]
    arr = np.repeat(x[None, :], height, axis=0).astype(np.uint8)
    arr = np.repeat(arr[:, :, None], 3, axis=2)
    if perturb:
        y0, x0, delta = perturb
        arr[y0, x0] = np.clip(arr[y0, x0].astype(int) + delta, 0, 255)
    return _encode_bmp_pixels(np.ascontiguousarray(arr))


def test_dhash_perceptual_properties(spark):
    """dHash is stable under small edits and under resize, and far for
    structurally different images; errors are rows."""
    from iot_etl_spark.extensions.multimodal import dhash_images, resize_images

    rows = [
        (1, "image", _ramp_bmp(), "image/bmp", 32, 24, None),
        (2, "image", _ramp_bmp(perturb=(3, 5, 40)), "image/bmp", 32, 24, None),
        (3, "image", _ramp_bmp(reverse=True), "image/bmp", 32, 24, None),
        (4, "image", b"not an image", "image/bmp", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in dhash_images(df).collect()}
    assert out[4].ok is False and out[4].error
    h1, h2, h3 = out[1].dhash, out[2].dhash, out[3].dhash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h1, h2) <= 4          # near-dup: one perturbed pixel
    assert ham(h1, h3) >= 32         # reversed ramp flips every gradient
    # resize invariance on smooth content: hash the 2x upscale
    up = resize_images(df.filter("media_id = 1"), 64, 48).select(
        "media_id", F.col("content").alias("content"),
        F.lit("image").alias("kind"), F.lit("image/bmp").alias("mime"),
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    hup = dhash_images(up).collect()[0]
    assert hup.ok and ham(h1, hup.dhash) == 0


def test_dhash_near_pairs_banding_lossless(spark):
    """Block-banded candidate join + exact rescore finds exactly the
    pairs an all-pairs scan would, and refuses an unsound radius."""
    import itertools

    import pytest

    from iot_etl_spark.extensions.multimodal import dhash_images, dhash_near_pairs

    rows = [
        (1, "image", _ramp_bmp(), "image/bmp", 32, 24, None),
        (2, "image", _ramp_bmp(perturb=(3, 5, 40)), "image/bmp", 32, 24, None),
        (3, "image", _ramp_bmp(perturb=(10, 20, -35)), "image/bmp", 32, 24, None),
        (4, "image", _ramp_bmp(reverse=True), "image/bmp", 32, 24, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashed = dhash_images(df).filter("ok").select("media_id", "dhash")
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in dhash_near_pairs(hashed, max_hamming=4).collect()
    }
    # brute-force oracle
    hs = {r.media_id: r.dhash for r in hashed.collect()}
    expected = {}
    for a, b in itertools.combinations(sorted(hs), 2):
        d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        if d <= 4:
            expected[(a, b)] = d
    assert got == expected and (1, 2) in got
    with pytest.raises(ValueError):
        dhash_near_pairs(hashed, max_hamming=5)


def test_mp3_container_metadata_real_parse(spark):
    """MPEG-audio frame walk: exact frame count drives the duration,
    mode/rate come from the header tables, and the ID3v2 tag skip
    runs. rms stays null (sample decode is the documented gate)."""
    from iot_etl_spark.extensions.multimodal import make_mp3_bytes

    mp3 = make_mp3_bytes(duration_ms=2000, rate=44100, bitrate_kbps=128)
    df = spark.createDataFrame([(20, "audio", mp3, "audio/mpeg", None, None, None)],
                               MEDIA_SCHEMA)
    row = decode_and_featurize(df).collect()[0]
    assert row.ok and row.decoded_kind == "audio"
    assert row.sample_rate_hz == 44100 and row.n_channels == 1
    # duration quantizes to whole 1152-sample frames
    assert abs(row.duration_ms - 2000) <= 27
    assert row.rms is None
    assert row.n_bytes == len(mp3)


def test_aac_adts_metadata_real_parse(spark):
    from iot_etl_spark.extensions.multimodal import make_aac_adts_bytes

    aac = make_aac_adts_bytes(duration_ms=1500, rate=48000, channels=2)
    df = spark.createDataFrame([(21, "audio", aac, "audio/aac", None, None, None)],
                               MEDIA_SCHEMA)
    row = decode_and_featurize(df).collect()[0]
    assert row.ok and row.decoded_kind == "audio"
    assert row.sample_rate_hz == 48000 and row.n_channels == 2
    assert abs(row.duration_ms - 1500) <= 22  # whole 1024-sample frames


def test_mp4_box_walk_and_frame_sampling(spark):
    """ISO-BMFF box walk feeds the SAME frame-sampling fan-out the
    fake header drives — real MP4 payloads now fan out too."""
    from iot_etl_spark.extensions.multimodal import make_mp4_bytes

    mp4 = make_mp4_bytes(duration_ms=5500, width=1280, height=720)
    m4a = make_mp4_bytes(duration_ms=3000, kind="audio")
    df = spark.createDataFrame(
        [(22, "video", mp4, "video/mp4", 1280, 720, 5500),
         (23, "audio", m4a, "audio/mp4", None, None, 3000)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_and_featurize(df).collect()}
    assert rows[22].ok and rows[22].decoded_kind == "video"
    assert (rows[22].width, rows[22].height) == (1280, 720)
    assert rows[22].duration_ms == 5500
    assert rows[23].ok and rows[23].decoded_kind == "audio"
    assert rows[23].duration_ms == 3000
    frames = sample_frames(df, every_ms=1000).collect()
    # only the video row fans out: offsets 0..5000
    assert sorted(f.offset_ms for f in frames) == [0, 1000, 2000, 3000, 4000, 5000]
    assert {f.media_id for f in frames} == {22}


def test_mp3_mp4_corrupt_payloads_become_error_rows(spark):
    from iot_etl_spark.extensions.multimodal import make_mp4_bytes

    bad_mp4 = make_mp4_bytes()[:20]
    bad_mp3 = b"\xff\xfb" + b"\x01"  # truncated mid-header
    df = spark.createDataFrame(
        [(30, "video", bad_mp4, "video/mp4", None, None, None),
         (31, "audio", bad_mp3, "audio/mpeg", None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = decode_and_featurize(df).collect()
    assert all(not r.ok and r.error for r in rows)


def test_audio_container_dispatch_order():
    """ADTS and MP3 both sync on 0xFF: layer bits 00 must route to the
    ADTS parser and never to the MPEG-audio walk (which treats layer
    00 as reserved), and ID3-prefixed payloads route to MP3."""
    from iot_etl_spark.extensions.multimodal import (
        _decode_payload,
        make_aac_adts_bytes,
        make_mp3_bytes,
    )

    aac = make_aac_adts_bytes(duration_ms=200, rate=44100, channels=1)
    assert aac[0] == 0xFF and (aac[1] & 0xF6) == 0xF0
    out = _decode_payload(aac)
    assert out["ok"] and out["duration_ms"] > 0 and out["n_channels"] == 1

    mp3 = make_mp3_bytes(duration_ms=200)
    assert mp3[:3] == b"ID3"
    out = _decode_payload(mp3)
    assert out["ok"] and out["sample_rate_hz"] == 44100

    # bare MP3 frames (no ID3) still route via the 0xFF sync
    bare = mp3[20:]
    assert bare[0] == 0xFF and (bare[1] & 0xE0) == 0xE0
    out = _decode_payload(bare)
    assert out["ok"] and out["decoded_kind"] == "audio"


# ---------------------- Layer-III side-info parse (VERDICT r11 item 7)


class _BitWriter:
    """MSB-first writer used to craft side-info blocks with KNOWN
    field values — the round-trip proof that parse_mp3_sideinfo reads
    the ISO bit layout, not just zeros."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self, total_bytes: int) -> bytes:
        bits = self.bits + [0] * (total_bytes * 8 - len(self.bits))
        out = bytearray(total_bytes)
        for i, b in enumerate(bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


def _mp3_frame_with_sideinfo(mono: bool, mdb: int, gains: list[int]) -> bytes:
    """One MPEG-1 Layer-III 128kbps/44100 frame whose side info carries
    the given main_data_begin and per-(granule, channel) global_gain
    values (part2_3_length = 100+i, big_values = 10+i)."""
    from iot_etl_spark.extensions.multimodal import _MP3_BITRATES, _MP3_RATES

    hdr = bytes([0xFF, 0xFB,
                 (_MP3_BITRATES[(1, 3)].index(128) << 4)
                 | (_MP3_RATES[1].index(44100) << 2),
                 0xC0 if mono else 0x00])
    w = _BitWriter()
    ch = 1 if mono else 2
    w.write(mdb, 9)
    w.write(0, 5 if mono else 3)
    w.write(0, 4 * ch)  # scfsi
    for i, g in enumerate(gains):
        w.write(100 + i, 12)   # part2_3_length
        w.write(10 + i, 9)     # big_values
        w.write(g, 8)          # global_gain
        w.write(0, 59 - 29)    # rest of the granule block
    si = w.tobytes(17 if mono else 32)
    frame_len = 144 * 128 * 1000 // 44100
    return hdr + si + b"\x00" * (frame_len - 4 - len(si))


def test_mp3_sideinfo_roundtrips_crafted_fields():
    from iot_etl_spark.extensions.multimodal import parse_mp3_sideinfo

    out = parse_mp3_sideinfo(
        _mp3_frame_with_sideinfo(True, mdb=311, gains=[210, 99])
        + _mp3_frame_with_sideinfo(True, mdb=7, gains=[0, 255])
    )
    assert out["ok"] and out["n_frames"] == 2
    assert out["n_granule_channels"] == 4  # 2 granules x mono x 2 frames
    f0, f1 = out["frames"]
    assert f0["main_data_begin"] == 311 and f1["main_data_begin"] == 7
    assert [g["global_gain"] for g in f0["granules"]] == [210, 99]
    assert [g["global_gain"] for g in f1["granules"]] == [0, 255]
    assert [g["part2_3_length"] for g in f0["granules"]] == [100, 101]
    assert [g["big_values"] for g in f0["granules"]] == [10, 11]
    assert out["max_main_data_begin"] == 311
    assert out["mean_global_gain"] == (210 + 99 + 0 + 255) / 4
    assert out["total_part2_3_bits"] == (100 + 101) * 2


def test_mp3_sideinfo_stereo_layout():
    from iot_etl_spark.extensions.multimodal import parse_mp3_sideinfo

    out = parse_mp3_sideinfo(
        _mp3_frame_with_sideinfo(False, mdb=123, gains=[1, 2, 3, 4])
    )
    assert out["ok"] and out["n_granule_channels"] == 4
    assert out["frames"][0]["main_data_begin"] == 123
    assert [g["global_gain"] for g in out["frames"][0]["granules"]] == [1, 2, 3, 4]


def test_mp3_sideinfo_zeroed_fixture_and_frame_parity():
    from iot_etl_spark.extensions.multimodal import (
        _parse_mp3, make_mp3_bytes, parse_mp3_sideinfo,
    )

    payload = make_mp3_bytes(duration_ms=500)
    meta = _parse_mp3(payload)
    out = parse_mp3_sideinfo(payload)
    assert out["ok"] and meta["ok"]
    # same frame walk as the metadata parser, zeroed side info
    assert out["n_frames"] * 1152 * 1000 // 44100 == meta["duration_ms"]
    assert out["mean_global_gain"] == 0
    assert out["max_main_data_begin"] == 0
    assert not parse_mp3_sideinfo(b"\x00" * 64)["ok"]


def test_gif_lzw_width_growth_on_final_code_regression():
    """Regression pin for the round-12 hypothesis catch (w=7, h=28,
    seed=139): when the decoder's phantom append on the FINAL data
    code lands exactly on 2^width, it widens before reading END — the
    encoder must mirror that growth or the END code truncates."""
    import numpy as np

    from iot_etl_spark.extensions.multimodal import _decode_gif, make_gif_bytes

    out = _decode_gif(make_gif_bytes(7, 28, 139, flat=False))
    assert out["ok"], out.get("error")
    rng = np.random.default_rng(139)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, (28, 7), dtype=np.uint8)
    assert abs(out["mean_pixel"] - float(pal[idx].mean())) < 1e-9


def _mp3_frame_full_granules(grans: list[dict]) -> bytes:
    """One mono MPEG-1 frame whose two granule blocks carry the given
    FULL field sets (round-13 side-info extension)."""
    from iot_etl_spark.extensions.multimodal import _MP3_BITRATES, _MP3_RATES

    hdr = bytes([0xFF, 0xFB,
                 (_MP3_BITRATES[(1, 3)].index(128) << 4)
                 | (_MP3_RATES[1].index(44100) << 2),
                 0xC0])
    w = _BitWriter()
    w.write(0, 9)   # main_data_begin
    w.write(0, 5)   # private
    w.write(0, 4)   # scfsi
    for g in grans:
        w.write(g.get("p23", 0), 12)
        w.write(g.get("bigv", 0), 9)
        w.write(g.get("gain", 0), 8)
        w.write(g.get("sfc", 0), 4)
        w.write(g.get("wsf", 0), 1)
        if g.get("wsf"):
            w.write(g["btype"], 2)
            w.write(g.get("mixed", 0), 1)
            for t in g["tables"]:       # 2 selections
                w.write(t, 5)
            for s in g.get("subgain", (0, 0, 0)):
                w.write(s, 3)
        else:
            for t in g["tables"]:       # 3 selections
                w.write(t, 5)
            w.write(g.get("r0", 0), 4)
            w.write(g.get("r1", 0), 3)
        w.write(g.get("preflag", 0), 1)
        w.write(g.get("sfscale", 0), 1)
        w.write(g.get("count1t", 0), 1)
    si = w.tobytes(17)
    frame_len = 144 * 128 * 1000 // 44100
    return hdr + si + b"\x00" * (frame_len - 4 - len(si))


def test_mp3_sideinfo_full_granule_roundtrip():
    """Round-13 extension: the Huffman TABLE SELECTIONS, block types,
    region counts and flag bits round-trip through crafted bitfields,
    and the codebook histogram aggregates them."""
    from iot_etl_spark.extensions.multimodal import parse_mp3_sideinfo

    out = parse_mp3_sideinfo(
        _mp3_frame_full_granules([
            # normal block: 3 codebooks + region counts + flags
            {"p23": 777, "bigv": 120, "gain": 200, "sfc": 9,
             "tables": [7, 13, 24], "r0": 5, "r1": 2,
             "preflag": 1, "sfscale": 1, "count1t": 1},
            # short (transient) block: 2 codebooks + subblock gains
            {"p23": 555, "bigv": 80, "gain": 150, "sfc": 3, "wsf": 1,
             "btype": 2, "mixed": 1, "tables": [15, 31],
             "subgain": (1, 2, 7)},
        ])
    )
    assert out["ok"] and out["n_frames"] == 1
    g0, g1 = out["frames"][0]["granules"]
    assert g0["scalefac_compress"] == 9
    assert g0["window_switching"] == 0 and g0["block_type"] == 0
    assert g0["table_select"] == [7, 13, 24]
    assert g0["region0_count"] == 5 and g0["region1_count"] == 2
    assert g0["preflag"] == 1 and g0["scalefac_scale"] == 1
    assert g0["count1table_select"] == 1
    assert g1["window_switching"] == 1 and g1["block_type"] == 2
    assert g1["mixed_block"] == 1
    assert g1["table_select"] == [15, 31]
    assert g1["subblock_gain"] == [1, 2, 7]
    assert g1["region0_count"] is None
    assert out["huffman_table_histogram"] == {7: 1, 13: 1, 15: 1,
                                              24: 1, 31: 1}
    assert out["n_short_block_granules"] == 1
