"""Multimodal plumbing tests: Arrow batch shape, frame sampling slices,
and determinism of the fake decode (the real decoder is a deployment
swap; the Spark-side contract is what's under test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.multimodal import (
    binarize_documents,
    decode_media,
    sample_frames,
)
from data_engineering_pipeline_spark.sources import load_table


def test_decode_features_match_bytes(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    media = binarize_documents(docs)
    feats = {r.media_id: r for r in decode_media(media).collect()}
    for row in docs.collect():
        buf = row.text.encode("utf-8")
        f = feats[row.doc_id]
        assert f.byte_len == len(buf)
        assert f.checksum == sum(buf) % 997
        assert f.width == 64 + (len(buf) % 577)
        assert f.decoder == "fake-deterministic"


def _wav_bytes(channels=2, rate=8000, samples=None):
    import struct

    import numpy as np

    if samples is None:
        t = np.arange(800)
        samples = (np.sin(t / 10.0) * 12000).astype("<i2")
        samples = np.repeat(samples, channels)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    ), samples


def _ppm_bytes(w=7, h=5):
    import numpy as np

    px = (np.arange(w * h * 3) % 251).astype(np.uint8)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px.tobytes(), px


def _bmp_bytes(w=5, h=3):
    import struct

    import numpy as np

    row_bytes = (w * 3 + 3) & ~3
    rows = (np.arange(h * row_bytes) % 200).astype(np.uint8).reshape(h, row_bytes)
    data = rows.tobytes()
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    )
    return header + data, rows[:, : w * 3]


def _png_bytes(w=9, h=4):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def test_builtin_decoders_recover_ground_truth(spark):
    """WAV/PPM/BMP/PNG blobs decode FOR REAL through the Spark path:
    channels/rate/sample-count/dimensions/means match the generating
    parameters, and unknown formats still take the labeled fake path."""
    import numpy as np

    wav, samples = _wav_bytes(channels=2, rate=8000)
    ppm, px = _ppm_bytes(w=7, h=5)
    bmp, rows = _bmp_bytes(w=5, h=3)
    png = _png_bytes(w=9, h=4)
    blobs = [
        (0, wav, "audio/wav"),
        (1, ppm, "image/x-portable-pixmap"),
        (2, bmp, "image/bmp"),
        (3, png, "image/png"),
        (4, b"not a media file at all", "application/octet-stream"),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), t, None) for i, b, t in blobs],
        "media_id long, content binary, media_type string, meta map<string,string>",
    )
    f = {r.media_id: r for r in decode_media(media).collect()}

    assert f[0].decoder == "builtin-wav"
    assert (f[0].channels, f[0].sample_rate) == (2, 8000)
    assert f[0].n_samples == len(samples) // 2
    assert abs(f[0].mean_val - np.abs(samples.astype(np.float64)).mean()) < 1e-9

    assert f[1].decoder == "builtin-ppm"
    assert (f[1].width, f[1].height, f[1].channels) == (7, 5, 3)
    assert abs(f[1].mean_val - px.astype(np.float64).mean()) < 1e-9

    assert f[2].decoder == "builtin-bmp"
    assert (f[2].width, f[2].height) == (5, 3)
    assert abs(f[2].mean_val - rows.astype(np.float64).mean()) < 1e-9

    assert f[3].decoder == "builtin-png-header"
    assert (f[3].width, f[3].height) == (9, 4)

    assert f[4].decoder == "fake-deterministic"
    assert f[4].byte_len == len(b"not a media file at all")


def test_malformed_blobs_fall_back_instead_of_crashing(spark):
    """Valid magic + corrupt body must NOT fail the task: every decode
    error falls through to the deterministic fake (the documented
    contract — at corpus scale a truncated blob is a certainty and one
    struct.error would kill the whole job after task retries)."""
    import struct

    wav, _ = _wav_bytes(channels=2, rate=8000)
    ppm, _ = _ppm_bytes(w=7, h=5)
    bmp, _ = _bmp_bytes(w=5, h=3)
    # fmt chunk shorter than the 16 bytes struct.unpack_from needs
    short_fmt = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 6) + b"\x01\x00\x02\x00\x40\x1f"
    )
    # >=44 bytes total (past wav()'s early length guard) but the fmt body
    # is cut to 4 bytes by the buffer end: struct.unpack_from("<HHIIHH")
    # raises struct.error, exercising sniff()'s exception path for WAV.
    trunc_fmt = (
        b"RIFF" + struct.pack("<I", 38) + b"WAVE"
        + b"LIST" + struct.pack("<I", 14) + b"\x00" * 14
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00"
    )
    assert len(trunc_fmt) >= 44
    # IHDR present but declares hostile dims: zero and >2^31-1 (would
    # wrap in an int32 column without the png() guard)
    png_zero = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 0, 5)
    )
    png_huge = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 0x80000000, 5)
    )
    blobs = [
        (0, wav[:30], "audio/wav"),            # truncated mid-header
        (1, short_fmt, "audio/wav"),           # fmt chunk < 16 bytes
        (2, ppm[: len(ppm) // 2], "image/x-portable-pixmap"),  # pixels cut
        (3, b"P6\n9999999 9999999\n255\n\x00", "image/x-portable-pixmap"),
        (4, bmp[:40], "image/bmp"),            # 40 bytes: below the 54-byte header guard
        (5, bmp[:60], "image/bmp"),            # header ok, pixel data cut
        (6, b"BM" + b"\x00" * 60, "image/bmp"),  # zero dims/offset garbage
        (7, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4, "image/png"),  # no IHDR
        (8, b"P6\n-3 5\n255\n" + b"\x00" * 64, "image/x-portable-pixmap"),
        (9, trunc_fmt, "audio/wav"),           # raises inside fmt unpack
        (10, png_zero, "image/png"),           # IHDR width == 0
        (11, png_huge, "image/png"),           # IHDR width > 2^31-1
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), t, None) for i, b, t in blobs],
        "media_id long, content binary, media_type string, meta map<string,string>",
    )
    feats = {r.media_id: r for r in decode_media(media).collect()}
    assert len(feats) == len(blobs)
    for i, b, _t in blobs:
        assert feats[i].decoder == "fake-deterministic", i
        assert feats[i].byte_len == len(b)
        # fake dims are the documented deterministic derivation
        assert feats[i].width == 64 + (len(b) % 577)


def test_decode_failure_labeling_is_opt_in(spark):
    """With label_decode_failures=True, a recognized-magic blob whose
    decoder RAISED is labeled 'decode-failed' (so a corpus run can
    measure its decode-failure rate), while unknown formats and blobs
    rejected by plain validity guards stay 'fake-deterministic'. The
    fake dims are produced either way."""
    import struct

    trunc_fmt = (
        b"RIFF" + struct.pack("<I", 38) + b"WAVE"
        + b"LIST" + struct.pack("<I", 14) + b"\x00" * 14
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00"
    )
    blobs = [
        (0, trunc_fmt, "audio/wav"),                  # raises -> labeled
        (1, b"not a media file at all", "text/plain"),  # unknown -> fake
        (2, b"BM" + b"\x00" * 60, "image/bmp"),       # guard-rejected -> fake
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), t, None) for i, b, t in blobs],
        "media_id long, content binary, media_type string, meta map<string,string>",
    )
    on = {
        r.media_id: r
        for r in decode_media(media, label_decode_failures=True).collect()
    }
    assert on[0].decoder == "decode-failed"
    assert on[1].decoder == "fake-deterministic"
    assert on[2].decoder == "fake-deterministic"
    assert on[0].width == 64 + (len(trunc_fmt) % 577)
    off = {r.media_id: r for r in decode_media(media).collect()}
    assert off[0].decoder == "fake-deterministic"


def test_frame_sampling_slices_and_strides(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").filter(F.col("doc_id") < 5)
    frames = sample_frames(
        binarize_documents(docs), frame_size=64, every_n=4
    ).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert frames
    for fr in frames:
        buf = texts[fr.media_id]
        assert fr.frame_no % 4 == 0
        start = fr.frame_no * 64
        assert bytes(fr.frame_bytes) == buf[start : start + 64]


def test_resize_real_ppm_and_bmp_nearest_neighbor(spark):
    """PPM/BMP blobs resize FOR REAL: a 4x4 image with known pixels
    downsamples to the exact nearest-neighbor 2x2 (src index =
    y*H div th), re-encoded P6 byte-for-byte."""
    import hashlib

    import numpy as np

    from data_engineering_pipeline_spark.operators.multimodal import (
        resize_media,
    )

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    ppm = b"P6\n4 4\n255\n" + px.tobytes()
    rows = [(1, ppm, "image/x-portable-pixmap", None)]
    bmp, bmp_rows = _bmp_bytes(w=5, h=3)
    rows.append((2, bmp, "image/bmp", None))
    media = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string, "
        "meta map<string,string>"
    )
    out = {
        r.media_id: r
        for r in resize_media(media, out_w=2, out_h=2).collect()
    }
    # expected: rows 0,2 and cols 0,2 of the 4x4
    want = b"P6\n2 2\n255\n" + px[[0, 2]][:, [0, 2]].tobytes()
    r1 = out[1]
    assert r1.fmt == "ppm" and bytes(r1.out_bytes) == want
    assert r1.out_md5 == hashlib.md5(want).hexdigest()
    assert r1.out_len == len(want)
    # BMP goes through the real branch too: file rows are bottom-up
    # BGR; the parser re-encodes top-down RGB before resampling
    r2 = out[2]
    assert r2.fmt == "ppm" and r2.out_w == 2 and r2.out_h == 2
    exp_src = np.zeros((3, 5, 3), np.uint8)
    for y in range(3):
        exp_src[3 - 1 - y] = bmp_rows[y].reshape(5, 3)[:, ::-1]
    ys = (np.arange(2) * 3) // 2
    xs = (np.arange(2) * 5) // 2
    want2 = b"P6\n2 2\n255\n" + exp_src[ys][:, xs].tobytes()
    assert bytes(r2.out_bytes) == want2


def test_resize_fake_path_is_deterministic_stride(spark):
    import hashlib

    from data_engineering_pipeline_spark.operators.multimodal import (
        resize_media,
    )

    blob = bytes(range(256)) * 4  # 1024 bytes, no known magic
    media = spark.createDataFrame(
        [(7, blob, "application/octet-stream", None)],
        "media_id long, content binary, media_type string, "
        "meta map<string,string>",
    )
    r = resize_media(media, out_w=8, out_h=8).collect()[0]
    k = 8 * 8 * 3
    stride = max(1, len(blob) // k)
    want = b"P6\n8 8\n255\n" + bytes(
        blob[i * stride] for i in range(min(k, len(blob)))
    )
    assert r.fmt == "fake"
    assert bytes(r.out_bytes) == want
    assert r.out_md5 == hashlib.md5(want).hexdigest()


def test_decode_media_records_per_batch_deprecated_alias(spark):
    """r10 (ADVICE): records_per_batch kept as a deprecated alias for
    emit_chunk_rows (its meaning moved from input-batch to emitted-
    chunk bounding in r9); passing it warns and still applies."""
    import warnings

    docs = spark.createDataFrame(
        [(i, "en", f"sample text number {i}", "s") for i in range(4)],
        "doc_id long, lang string, text string, source string",
    )
    media = binarize_documents(docs)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = decode_media(media, records_per_batch=2)
        n = out.count()
    assert n == 4
    assert any(
        issubclass(x.category, DeprecationWarning)
        and "emit_chunk_rows" in str(x.message)
        for x in w
    )


def _encode_png(px, ctype, row_filters, plte=None, depth=8,
                interlace=0):
    """Forward PNG encoder for ground-truth tests: applies the real
    per-scanline filters (0-4), deflates, and emits proper chunks —
    the decoder must exactly invert it."""
    import struct
    import zlib

    import numpy as np

    h = px.shape[0]
    nch = 1 if px.ndim == 2 else px.shape[2]
    w = px.shape[1]
    flat = px.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = row_filters[y % len(row_filters)]
        raw = flat[y]
        enc = raw.copy()
        if ft == 1:
            for x in range(stride - 1, nch - 1, -1):
                enc[x] = (raw[x] - raw[x - nch]) & 255
        elif ft == 2:
            enc = (raw - prev) & 255
        elif ft == 3:
            for x in range(stride):
                left = raw[x - nch] if x >= nch else 0
                enc[x] = (raw[x] - ((left + prev[x]) >> 1)) & 255
        elif ft == 4:
            for x in range(stride):
                a = int(raw[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (raw[x] - pr) & 255
        out.append(ft)
        out += bytes(int(v) & 255 for v in enc)
        prev = raw

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += chunk(b"PLTE", bytes(plte))
    blob += chunk(b"IDAT", zlib.compress(bytes(out)))
    blob += chunk(b"IEND", b"")
    return blob


def test_png_full_decode_recovers_ground_truth(spark):
    """Full PNG pixel decode (r13): every filter type, the four
    non-palette color types and palette expansion round-trip through
    the Spark path to the exact generating mean; unsupported configs
    (16-bit, interlaced) and corrupt IDAT degrade to the header tier
    instead of crashing or faking."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (5, 9, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    rgba = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    idx = rng.randint(0, 4, (6, 5), dtype=np.uint8)
    plte = bytes(rng.randint(0, 256, 12, dtype=np.uint8))
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3)

    blobs = [
        (0, _encode_png(rgb, 2, [0, 1, 2, 3, 4])),
        (1, _encode_png(gray, 0, [4, 3, 1, 2])),
        (2, _encode_png(rgba, 6, [2, 4, 1])),
        (3, _encode_png(idx, 3, [0, 1], plte=plte)),
        (4, _encode_png(rgb, 2, [0], depth=16)),      # unsupported depth
        (5, _encode_png(rgb, 2, [0], interlace=1)),   # Adam7
    ]
    # corrupt IDAT: valid chunks, garbage deflate stream
    bad = bytearray(_encode_png(rgb, 2, [0]))
    pos = bytes(bad).index(b"IDAT") + 4
    bad[pos : pos + 8] = b"\x00" * 8
    blobs.append((6, bytes(bad)))

    media = spark.createDataFrame(
        [(i, bytearray(b), "image/png", None) for i, b in blobs],
        "media_id long, content binary, media_type string, "
        "meta map<string,string>",
    )
    f = {r.media_id: r for r in decode_media(media).collect()}

    for mid, px, nch in (
        (0, rgb, 3), (1, gray, 1), (2, rgba, 4),
    ):
        assert f[mid].decoder == "builtin-png", mid
        assert (f[mid].width, f[mid].height) == (px.shape[1], px.shape[0])
        assert f[mid].channels == nch
        assert abs(f[mid].mean_val - px.astype(np.float64).mean()) < 1e-9

    expanded = pal[idx]
    assert f[3].decoder == "builtin-png"
    assert (f[3].width, f[3].height, f[3].channels) == (5, 6, 3)
    assert abs(f[3].mean_val - expanded.astype(np.float64).mean()) < 1e-9

    for mid in (4, 5, 6):
        assert f[mid].decoder == "builtin-png-header", mid
        assert (f[mid].width, f[mid].height) == (9, 5)
        assert f[mid].mean_val is None
