"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

What is REAL here (and tested): the schema contract, the mapInPandas
batch shape (pandas DataFrames in/out, Arrow transfer), partition-size
control for large blobs, and ACTUAL decoders for the self-contained
formats parseable with stdlib+numpy — WAV/RIFF PCM (channels, sample
rate, sample count, mean |amplitude|), PPM P6 and uncompressed 24-bit
BMP (dimensions + mean pixel), and full PNG (zlib IDAT inflate +
scanline unfilter + palette expansion for 8-bit non-interlaced
gray/RGB/palette/alpha images; other PNG configs report IHDR
dimensions as the header-only tier). Blobs in any
other format fall back to a DETERMINISTIC FAKE derived from the bytes,
clearly labeled `fake-deterministic` in the `decoder` column — that is
where a PIL/ffmpeg call slots in at deployment; the magic-byte dispatch
is the wiring point and nothing else changes.

Scale notes: blobs ride in the DataFrame (at 100 TB: parquet binary
columns or pointer columns to object storage). mapInPandas streams
Arrow record batches, so executor memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch times the blob size — set
`records_per_batch` small for big media. repartition before the map if
blob sizes are skewed."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField("media_type", T.StringType(), nullable=False),
        T.StructField(
            "meta", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_val", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Demo media table from the documents fixture: utf-8 bytes as the
    opaque blob (the plumbing doesn't care what the bytes mean)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_media(
    media: DataFrame,
    emit_chunk_rows: int = 8192,
    label_decode_failures: bool = False,
    records_per_batch: int | None = None,
) -> DataFrame:
    """binary blobs -> per-item features via Arrow-batched mapInPandas.
    Pure per-partition map: no shuffle, scales with input splits.

    `label_decode_failures=True` marks recognized-magic-but-corrupt blobs
    with decoder='decode-failed' instead of 'fake-deterministic', so a
    corpus-scale run can measure its decode-failure rate with a plain
    groupBy. Off by default: the deterministic-fake output (and the
    DuckDB oracle that replays it) treats corrupt and unknown blobs
    identically.

    `emit_chunk_rows` bounds the EMITTED Arrow batches (chunked
    yields, same device as resize_media). Feature rows are scalar-only
    (no blobs), so the default is generous — 256-row chunks cost a
    measurable +30% in per-batch overhead at bench scale; lower it
    only if a custom decoder emits wide rows. It cannot bound the INPUT
    batch from inside this lazy API: the r9 review found the previous
    set-then-restore of arrow.maxRecordsPerBatch was a silent no-op —
    the conf was restored before any action executed, so the knob
    never applied. Input-side bounding for huge blobs is the session
    conf spark.sql.execution.arrow.maxRecordsPerBatch, set by the
    caller before the action runs.

    `records_per_batch` is the r8 name for this knob, kept as a
    deprecated alias; it warns when passed because its meaning moved
    from input-batch bounding (which never actually worked, see above)
    to output-chunk bounding, and callers who tuned it to bound decoder
    memory should switch to the session conf instead (r10, ADVICE).

    Dispatch by magic bytes: RIFF/WAVE PCM, PPM P6, 24-bit BMP, and PNG
    IHDR are decoded FOR REAL (stdlib struct + numpy — no external
    media libraries needed); anything else gets the deterministic fake.
    A PIL/ffmpeg integration replaces only the fallback branch.

    NOTE the decode helpers are nested so the closure references only
    locals + pandas/numpy: cloudpickle ships it BY VALUE and executors
    do not need this package on their PYTHONPATH (a module-global
    reference would make every worker import this module)."""
    if records_per_batch is not None:
        import warnings

        warnings.warn(
            "decode_media(records_per_batch=...) is deprecated: it now "
            "bounds EMITTED chunks (use emit_chunk_rows); to bound "
            "decoder input memory set "
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            DeprecationWarning,
            stacklevel=2,
        )
        emit_chunk_rows = records_per_batch
    feature_cols = [f.name for f in FEATURE_SCHEMA]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        def wav(buf):
            # RIFF little-endian; walk chunks for fmt + data
            if len(buf) < 44 or buf[8:12] != b"WAVE":
                return None
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(buf):
                cid = buf[pos : pos + 4]
                (clen,) = struct.unpack_from("<I", buf, pos + 4)
                body = buf[pos + 8 : pos + 8 + clen]
                if cid == b"fmt ":
                    fmt = struct.unpack_from("<HHIIHH", body, 0)
                elif cid == b"data":
                    data = body
                pos += 8 + clen + (clen & 1)  # chunks are word-aligned
            if fmt is None or data is None or fmt[0] != 1 or fmt[5] != 16:
                return None  # PCM16 only
            _, channels, rate, _, _, _ = fmt
            samples = np.frombuffer(
                data[: len(data) - len(data) % (2 * channels)], "<i2"
            )
            return {
                "channels": channels,
                "sample_rate": rate,
                "n_samples": len(samples) // channels,
                "mean_val": float(np.abs(samples.astype(np.float64)).mean())
                if len(samples)
                else 0.0,
                "decoder": "builtin-wav",
            }

        def ppm(buf):
            # P6 header: magic, then 3 ints (w h maxval), '#' comments ok
            toks, pos = [], 2
            while len(toks) < 3 and pos < len(buf):
                while pos < len(buf) and buf[pos : pos + 1].isspace():
                    pos += 1
                if buf[pos : pos + 1] == b"#":
                    while pos < len(buf) and buf[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(buf) and not buf[pos : pos + 1].isspace():
                    pos += 1
                toks.append(buf[start:pos])
            try:
                w, h, maxval = (int(t) for t in toks)
            except ValueError:
                return None
            if maxval > 255 or w <= 0 or h <= 0:
                return None
            px = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos + 1)
            return {
                "width": w,
                "height": h,
                "channels": 3,
                "mean_val": float(px.astype(np.float64).mean()),
                "decoder": "builtin-ppm",
            }

        def bmp(buf):
            if len(buf) < 54:
                return None
            (data_off,) = struct.unpack_from("<I", buf, 10)
            w, h = struct.unpack_from("<ii", buf, 18)
            (bpp,) = struct.unpack_from("<H", buf, 28)
            (compression,) = struct.unpack_from("<I", buf, 30)
            if bpp != 24 or compression != 0 or w <= 0 or h == 0:
                return None
            row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            rows = np.frombuffer(
                buf, np.uint8, count=abs(h) * row_bytes, offset=data_off
            ).reshape(abs(h), row_bytes)[:, : w * 3]
            return {
                "width": w,
                "height": abs(h),
                "channels": 3,
                "mean_val": float(rows.astype(np.float64).mean()),
                "decoder": "builtin-bmp",
            }

        def png(buf):
            # Full pixel decode for the common web configuration
            # (8-bit depth, color types gray/RGB/palette/gray+alpha/
            # RGBA, no interlace) with stdlib zlib + numpy: chunk walk
            # -> concatenated-IDAT inflate -> per-scanline unfilter
            # (types 0-4) -> palette expansion. Any OTHER valid PNG
            # (16-bit, Adam7 interlace, truncated/undecodable body)
            # still reports its IHDR dimensions as
            # 'builtin-png-header' — the r12 behavior, kept as the
            # graceful tier between full decode and the fake.
            if len(buf) < 24 or buf[12:16] != b"IHDR":
                return None
            w, h = struct.unpack_from(">II", buf, 16)
            # IHDR dims are unsigned 32-bit: a corrupt PNG can declare 0
            # or >2^31-1, which would wrap silently in an IntegerType
            # column (Arrow safe-conversion is off by default).
            if w == 0 or h == 0 or w > 0x7FFFFFFF or h > 0x7FFFFFFF:
                return None
            hdr = {"width": w, "height": h, "decoder": "builtin-png-header"}
            if len(buf) < 29:
                return hdr
            depth, ctype, comp, filt, inter = struct.unpack_from(
                ">BBBBB", buf, 24
            )
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            if depth != 8 or nch is None or comp or filt or inter:
                return hdr
            pos, idat, plte = 8, [], None
            while pos + 8 <= len(buf):
                (clen,) = struct.unpack_from(">I", buf, pos)
                ctag = buf[pos + 4 : pos + 8]
                body = buf[pos + 8 : pos + 8 + clen]
                if len(body) < clen:
                    return hdr  # truncated chunk
                if ctag == b"IDAT":
                    idat.append(body)
                elif ctag == b"PLTE":
                    plte = body
                elif ctag == b"IEND":
                    break
                pos += 12 + clen  # len + tag + body + crc (not checked)
            if not idat:
                return hdr
            try:
                raw = zlib.decompress(b"".join(idat))
            except zlib.error:
                return hdr
            stride = w * nch
            if len(raw) < h * (stride + 1):
                return hdr
            raw = np.frombuffer(
                raw, np.uint8, count=h * (stride + 1)
            ).reshape(h, stride + 1)
            ftypes = raw[:, 0]
            data = raw[:, 1:].astype(np.int32)
            recon = np.zeros((h, stride), np.int32)
            zero = np.zeros(stride, np.int32)
            for y in range(h):
                ft = int(ftypes[y])
                line = data[y]
                prev = recon[y - 1] if y else zero
                if ft == 0:
                    rec = line
                elif ft == 2:  # Up: fully vectorized
                    rec = (line + prev) & 255
                elif ft == 1:  # Sub: sequential in x per pixel lane
                    rec = line.copy()
                    for x in range(nch, stride):
                        rec[x] = (rec[x] + rec[x - nch]) & 255
                elif ft == 3:  # Average
                    rec = line.copy()
                    for x in range(stride):
                        left = rec[x - nch] if x >= nch else 0
                        rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 255
                elif ft == 4:  # Paeth
                    rec = line.copy()
                    for x in range(stride):
                        a = int(rec[x - nch]) if x >= nch else 0
                        b = int(prev[x])
                        c = int(prev[x - nch]) if x >= nch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = (
                            a
                            if pa <= pb and pa <= pc
                            else (b if pb <= pc else c)
                        )
                        rec[x] = (rec[x] + pr) & 255
                else:
                    return hdr  # unknown filter type
                recon[y] = rec
            px = recon.astype(np.uint8)
            if ctype == 3:
                if plte is None or len(plte) < 3:
                    return hdr
                pal = np.frombuffer(plte, np.uint8)
                pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
                idx = px.reshape(h, w)
                if int(idx.max()) >= len(pal):
                    return hdr
                px, nch = pal[idx], 3
            return {
                "width": w,
                "height": h,
                "channels": nch,
                "mean_val": float(px.astype(np.float64).mean()),
                "decoder": "builtin-png",
            }

        def sniff(buf):
            # A valid magic does NOT imply a well-formed body: at corpus
            # scale truncated/corrupt blobs are a certainty, and a
            # struct.error / ValueError here would fail the task (and,
            # after retries, the whole job). Decode failures of
            # recognized formats take the deterministic-fake fallback;
            # only the parse-error types the decoders can raise on
            # malformed bytes are caught, so genuine programming bugs
            # still surface instead of being silently swallowed.
            try:
                if buf[:4] == b"RIFF":
                    return wav(buf)
                if buf[:2] == b"P6":
                    return ppm(buf)
                if buf[:2] == b"BM":
                    return bmp(buf)
                if buf[:8] == b"\x89PNG\r\n\x1a\n":
                    return png(buf)
            except (struct.error, ValueError, IndexError):
                return "decode-failed"
            return None

        chunk = max(1, int(emit_chunk_rows))
        for pdf in batches:
            out = []
            for mid, mtype, buf in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                buf = bytes(buf) if buf is not None else b""
                n = len(buf)
                row = {
                    "media_id": mid,
                    "media_type": mtype,
                    "byte_len": n,
                    "checksum": int(sum(buf) % 997),
                    "width": None,
                    "height": None,
                    "channels": None,
                    "sample_rate": None,
                    "n_samples": None,
                    "mean_val": None,
                    "decoder": "fake-deterministic",
                }
                real = sniff(buf) if n else None
                if isinstance(real, dict):
                    row.update(real)
                else:
                    # DETERMINISTIC FAKE dims derived from the bytes —
                    # the fallback a PIL/ffmpeg call would replace
                    row["width"] = 64 + (n % 577)
                    row["height"] = 64 + ((n * 31 + (buf[0] if n else 0)) % 449)
                    if real == "decode-failed" and label_decode_failures:
                        row["decoder"] = "decode-failed"
                out.append(row)
                if len(out) >= chunk:
                    yield pd.DataFrame(out, columns=feature_cols)
                    out = []
            if out:
                yield pd.DataFrame(out, columns=feature_cols)

    return media.select("media_id", "media_type", "content").mapInPandas(
        _decode, FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, frame_size: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing: slice each blob into fixed-size 'frames'
    and keep every n-th (a video frame sampler has exactly this shape —
    replace the slicer with a container demuxer). One output row per
    sampled frame."""

    frame_cols = [f.name for f in FRAME_SCHEMA]  # locals-only closure

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked yields (r9 review): output rows CARRY BLOBS and fan
        # out per input row (one row per sampled frame) — accumulating
        # a whole input batch's frames in one pandas frame made peak
        # memory proportional to blob bytes x batch rows, defeating
        # the bounded-batch contract the module promises
        chunk = 1024
        rows = []
        for pdf in batches:
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf) if buf is not None else b""
                n_frames = max(len(buf) // frame_size, 0)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "frame_bytes": buf[
                                i * frame_size : (i + 1) * frame_size
                            ],
                        }
                    )
                    if len(rows) >= chunk:
                        yield pd.DataFrame(rows, columns=frame_cols)
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=frame_cols)

    return media.select("media_id", "content").mapInPandas(
        _frames, FRAME_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("out_md5", T.StringType()),
        T.StructField("out_bytes", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    records_per_batch: int = 256,
) -> DataFrame:
    """Thumbnail resize via Arrow-batched mapInPandas — the remaining
    multimodal verb next to decode/feature-extract/frame-sample. Pure
    per-partition map (no shuffle).

    REAL for the self-decodable rasters: PPM P6 and uncompressed
    24-bit BMP are nearest-neighbor-resampled with numpy integer
    index math (src_y = y * H div out_h) and re-encoded as P6 —
    fmt='ppm', exact bytes unit-tested against hand-computed pixels.
    Anything else gets the DETERMINISTIC FAKE thumbnail (fmt='fake'):
    a P6 header plus out_w*out_h*3 bytes strided from the blob
    (stride = max(1, n div k)) — the branch a PIL/ffmpeg call
    replaces at deployment, and the branch the DuckDB oracle replays
    byte-for-byte (out_md5 is the hashable surface for binary
    output, as multimodal-frames)."""
    resize_cols = [f.name for f in RESIZE_SCHEMA]
    tw, th = int(out_w), int(out_h)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        import numpy as np

        header = f"P6\n{tw} {th}\n255\n".encode()

        def ppm_pixels(buf):
            # P6 header: magic then 3 ints (w h maxval); '#' comments
            # ok — same tokenizer as decode_media's ppm()
            if buf[:2] != b"P6":
                return None
            toks, pos = [], 2
            while len(toks) < 3 and pos < len(buf):
                while pos < len(buf) and buf[pos : pos + 1].isspace():
                    pos += 1
                if buf[pos : pos + 1] == b"#":
                    while pos < len(buf) and buf[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(buf) and not buf[pos : pos + 1].isspace():
                    pos += 1
                toks.append(buf[start:pos])
            try:
                w, h, maxval = (int(t) for t in toks)
            except ValueError:
                return None
            if maxval != 255 or w <= 0 or h <= 0:
                return None
            data = buf[pos + 1 : pos + 1 + w * h * 3]
            if len(data) < w * h * 3:
                return None
            return w, h, np.frombuffer(data, "u1").reshape(h, w, 3)

        def bmp_pixels(buf):
            if buf[:2] != b"BM" or len(buf) < 54:
                return None
            off, _hdr, w, h, _planes, bpp = struct.unpack_from(
                "<IIiiHH", buf, 10
            )
            if bpp != 24 or h <= 0:
                return None
            row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            if len(buf) < off + row * h:
                return None
            px = np.zeros((h, w, 3), "u1")
            for y in range(h):
                r = np.frombuffer(
                    buf, "u1", count=w * 3, offset=off + y * row
                ).reshape(w, 3)
                px[h - 1 - y] = r[:, ::-1]  # bottom-up BGR -> top-down RGB
            return w, h, px

        def fake_thumb(buf):
            n, k = len(buf), tw * th * 3
            stride = max(1, n // k)
            cnt = min(k, n)
            body = bytes(buf[i * stride] for i in range(cnt))
            return header + body

        chunk = max(1, int(records_per_batch))
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf) if buf is not None else b""
                px = None
                for parser in (ppm_pixels, bmp_pixels):
                    try:
                        px = parser(buf)
                    except Exception:
                        px = None
                    if px is not None:
                        break
                if px is not None:
                    w, h, arr = px
                    ys = (np.arange(th) * h) // th
                    xs = (np.arange(tw) * w) // tw
                    out = header + arr[ys][:, xs].tobytes()
                    fmt = "ppm"
                else:
                    out = fake_thumb(buf)
                    fmt = "fake"
                rows.append(
                    {
                        "media_id": mid,
                        "out_w": tw,
                        "out_h": th,
                        "fmt": fmt,
                        "out_len": len(out),
                        "out_md5": hashlib.md5(out).hexdigest(),
                        "out_bytes": out,
                    }
                )
                # bound the DECODED-output footprint per emitted Arrow
                # batch: yield as soon as records_per_batch thumbnails
                # accumulate, instead of one batch-sized frame — this
                # is what makes the knob effective regardless of when
                # the returned lazy frame executes (a session conf set
                # here would already be restored by then)
                if len(rows) >= chunk:
                    yield pd.DataFrame(rows, columns=resize_cols)
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=resize_cols)

    return media.select("media_id", "content").mapInPandas(
        _resize, RESIZE_SCHEMA
    )
