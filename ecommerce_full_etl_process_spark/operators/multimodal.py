"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (BASELINE.json north-star extension).

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` passes — the correct Spark shape for Python-only media
libraries (one python worker per partition, columnar Arrow transfer, no
per-row pickling).

Decode tiers (round 12 lifted the env-gating for codec-free formats):
``decode='real'`` runs a REAL dependency-free decoder — binary PNM
(PPM/PGM) and 24-bit uncompressed BMP in pure numpy
(:func:`decode_image`) — for feature extraction and resize;
NotImplementedError remains only inside the decoder for formats that
genuinely need a codec library (PNG/JPEG → ``decode='pil'``, video frame
decode → ffmpeg). ``decode='fake'`` produces deterministic
pseudo-features derived from the payload bytes (payloads that aren't
images at all, e.g. the utf-8 doc-text stand-ins). The Spark-side
plumbing — schema, batching, partition behavior, UDF signatures — is the
same for every tier, and the real tier is oracle-graded end-to-end
(``multimodal_real_decode``: synthetic closed-form PPMs whose decoded
statistics DuckDB recomputes from the pixel formula).

Round-6 cluster-readiness shim: ``decode="pil"`` on
:func:`extract_features` / :func:`resize_images` runs REAL pixel work via
Pillow when it is importable in the executor's Python (a cluster image
normally has it) and raises a clear ImportError when not — so deploying to
a real cluster needs zero code changes here. Tests for the pil path are
``pytest.importorskip``-gated and simply skip in this container.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition an under-partitioned source up to the cluster's
    parallelism (round-13 opt, guide §2.5 input skew): every kernel in
    this module is row-local CPU work (codec encode/decode in numpy), so
    a single small parquet split serializes the whole modality pass —
    measured at sf0.1, the PNG entry's generate+inflate+decode chain ran
    as ONE 4.3 s task on a 32-core host. No-op at scale, where the
    scan's natural splits already cover the cluster; the shuffle it adds
    on tiny inputs moves only the doc ids the generators consume."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: each document's text bytes become the
    payload (stands in for image/audio bytes; real pipelines read the bytes
    from object storage with ``binaryFile`` or a manifest join)."""
    # project to the two consumed columns BEFORE spreading (r13 ADVICE
    # fix): the repartition otherwise shuffles every extra doc column
    # alongside the text payload (guide §2.3 "project before the
    # exchange")
    docs = _spread(docs.select("doc_id", "text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.length("text") % 16 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _make_image_codec():
    """Dependency-free image codec (round-12 verdict item 7): decode for
    binary PNM (PPM ``P6`` / PGM ``P5``) and 24-bit uncompressed BMP, and
    a PPM/PGM encoder — pure numpy + struct, no PIL. Defined inside a
    factory so the returned functions have ``<locals>`` qualnames:
    cloudpickle then serializes them BY VALUE into mapInPandas kernels
    (a plain module-level def would pickle by reference and require this
    package on the executor workers' sys.path — the failure mode the
    kernel-closure note in :func:`extract_features` documents)."""

    def _parse_pnm_header(b, start):
        """Parse a binary-PNM header at ``start``; returns
        ``(w, h, bands, data_pos)``."""
        magic = b[start : start + 2]
        pos, vals = start + 2, []
        while len(vals) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":  # comment to end-of-line
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            begin = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(b[begin:pos]))
        # the PNM spec mandates EXACTLY ONE whitespace byte between maxval
        # and the raster; a CRLF or a comment here would silently shift the
        # pixel offset and decode garbage — error instead (advice r12)
        if not b[pos : pos + 1].isspace():
            raise NotImplementedError(
                "PNM header: expected a single whitespace byte after "
                f"maxval, got {b[pos : pos + 1]!r} at offset {pos}"
            )
        pos += 1
        w, h, maxval = vals
        if maxval != 255:
            raise NotImplementedError("only 8-bit PNM (maxval 255)")
        return w, h, (3 if magic == b"P6" else 1), pos

    def split_pnm_stream(b):
        """Split CONCATENATED binary-PNM frames (the engine's codec-free
        video container: back-to-back PPM/PGM images) into per-frame byte
        slices; each slice is itself a valid standalone PNM payload."""
        frames, pos = [], 0
        while pos < len(b):
            if b[pos : pos + 2] not in (b"P6", b"P5"):
                raise NotImplementedError(
                    "PNM stream: expected a P5/P6 frame header at offset "
                    f"{pos}"
                )
            w, h, bands, data_pos = _parse_pnm_header(b, pos)
            end = data_pos + w * h * bands
            if end > len(b):
                raise NotImplementedError(
                    f"PNM stream: truncated frame at offset {pos}"
                )
            frames.append(b[pos:end])
            pos = end
        return frames

    def _png_unfilter_row(f, line, prev, cur, bpp):
        """Invert one scanline's PNG filter (spec §6: None/Sub/Up/
        Average/Paeth) into ``cur``; ``prev`` is the reconstructed row
        above. Sub is a per-lane mod-256 prefix sum (vectorized); Up is
        a vector add; Average/Paeth carry a true sequential dependency
        along the row, so they run as per-byte loops — correctness
        first, and rows are short."""
        import numpy as np

        if f == 0:
            cur[:] = line
        elif f == 2:  # Up — uint8 add wraps mod 256
            np.add(line, prev, out=cur, casting="unsafe")
        elif f == 1:  # Sub — per-lane prefix sum mod 256
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(
                    line[lane::bpp], dtype=np.uint64
                ) % 256
        elif f == 3:  # Average
            for i in range(len(line)):
                a = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                cur[i] = (int(line[i]) + ((a + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(len(line)):
                a = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")

    def decode_png(b):
        """Stdlib-zlib PNG decode (round-13 verdict item 5): non-
        interlaced 8-bit grayscale (color type 0) and RGB (color type 2),
        all five scanline filters. Chunk walk -> IHDR validation -> IDAT
        concatenation -> zlib inflate -> per-row unfilter. Anything else
        (palette, alpha, 16-bit, interlaced) still needs decode='pil'."""
        import struct
        import zlib

        import numpy as np

        pos, hdr, idat = 8, None, []
        while pos + 8 <= len(b):
            ln = struct.unpack_from(">I", b, pos)[0]
            typ = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln  # length + type + payload + crc
            if typ == b"IHDR":
                if len(data) != 13:
                    raise NotImplementedError(
                        f"PNG: malformed IHDR ({len(data)} bytes, want 13)"
                    )
                hdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
        if hdr is None or not idat:
            raise NotImplementedError("PNG: missing IHDR/IDAT chunk")
        w, h, depth, ctype, comp, filt, interlace = hdr
        if (depth, comp, filt, interlace) != (8, 0, 0, 0) or ctype not in (0, 2):
            raise NotImplementedError(
                "stdlib PNG decode supports non-interlaced 8-bit grayscale "
                f"(color type 0) and RGB (2); got depth={depth} "
                f"ctype={ctype} interlace={interlace} — use decode='pil'"
            )
        bands = 3 if ctype == 2 else 1
        stride = w * bands
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != (stride + 1) * h:
            raise NotImplementedError(
                f"PNG: inflated size {len(raw)} != {(stride + 1) * h} "
                "(truncated or non-standard scanline layout)"
            )
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            off = y * (stride + 1)
            line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
            _png_unfilter_row(raw[off], line, prev, out[y], bands)
            prev = out[y]
        return w, h, bands, out.reshape(h, w, bands)

    def encode_png(px, filters=None):
        """``HxWxB uint8 ndarray -> PNG bytes`` (B=3 -> RGB, B=1 -> gray).
        ``filters`` optionally assigns a per-row filter type (indexed
        ``filters[y % len(filters)]``) so synthetic fixtures can exercise
        every decode filter path; default is filter 0 throughout. The
        filter TRANSFORMS (spec §6) are the exact inverses the decoder
        applies, all vectorized here because encoding reads only
        already-final pixel values."""
        import struct
        import zlib

        import numpy as np

        h, w, bands = px.shape
        stride = w * bands

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if bands == 3 else 0, 0, 0, 0)
        flat = px.reshape(h, stride).astype(np.int64)
        zeros = np.zeros(bands, dtype=np.int64)
        parts = []
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            cur = flat[y]
            f = 0 if filters is None else int(filters[y % len(filters)])
            left = np.concatenate([zeros, cur[:-bands]])
            upleft = np.concatenate([zeros, prev[:-bands]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left) % 256
            elif f == 2:
                enc = (cur - prev) % 256
            elif f == 3:
                enc = (cur - (left + prev) // 2) % 256
            elif f == 4:
                p = left + prev - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - prev)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, upleft),
                )
                enc = (cur - pred) % 256
            else:
                raise NotImplementedError(f"PNG filter type {f}")
            parts.append(bytes([f]) + enc.astype(np.uint8).tobytes())
            prev = cur
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
            + chunk(b"IEND", b"")
        )

    def decode_image(b):
        """``payload bytes -> (width, height, bands, HxWxB uint8 ndarray)``.
        Formats genuinely needing a codec library (JPEG, interlaced or
        non-8-bit PNG, ...) raise NotImplementedError — that branch is
        now ONLY for those."""
        import numpy as np

        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(b)
        if b[:2] in (b"P6", b"P5"):
            w, h, bands, pos = _parse_pnm_header(b, 0)
            # a standalone PNM payload is exactly header + raster; a CRLF
            # after maxval (spec-violating, passes the single-whitespace
            # check because '\r' IS whitespace) leaves one trailing byte
            # and would shift every pixel — error instead of decoding
            # garbage (advice r12)
            if len(b) != pos + w * h * bands:
                raise NotImplementedError(
                    f"PNM payload length {len(b)} != header+raster "
                    f"{pos + w * h * bands} (CRLF after maxval or a "
                    "truncated/padded raster)"
                )
            px = np.frombuffer(b, dtype=np.uint8, count=w * h * bands, offset=pos)
            return w, h, bands, px.reshape(h, w, bands)
        if b[:2] == b"BM":
            import struct

            data_off = struct.unpack_from("<I", b, 10)[0]
            w, h = struct.unpack_from("<ii", b, 18)
            bpp = struct.unpack_from("<H", b, 28)[0]
            comp = struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0:
                raise NotImplementedError("only 24-bit uncompressed BMP")
            bottom_up = h > 0
            h = abs(h)
            row = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
            arr = np.frombuffer(
                b, dtype=np.uint8, offset=data_off, count=row * h
            ).reshape(h, row)
            px = arr[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
            if bottom_up:
                px = px[::-1]
            return w, h, 3, np.ascontiguousarray(px)
        raise NotImplementedError(
            "dependency-free decode supports binary PNM (P5/P6), 24-bit "
            "uncompressed BMP, and non-interlaced 8-bit gray/RGB PNG; "
            "other formats need decode='pil' (Pillow)"
        )

    def encode_pnm(px):
        """``HxWxB uint8 ndarray -> PPM(P6)/PGM(P5) bytes`` (B=3 / B=1)."""
        h, w, bands = px.shape
        magic = b"P6" if bands == 3 else b"P5"
        return magic + f"\n{w} {h}\n255\n".encode("ascii") + px.tobytes()

    def luma_features(b, feature_dim):
        """The decode='pil' feature layout computed via decode_image:
        [w, h, bands, mean/255, min/255, max/255, spread/255, aspect]
        over ITU-R 601-2 integer luma ((299R+587G+114B)//1000 — PIL's
        convert("L") truncating formula, so the two paths agree)."""
        import numpy as np

        w, h, bands, px = decode_image(b)
        if bands == 3:
            p = px.astype(np.int64)
            lum = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
        else:
            lum = px[..., 0].astype(np.int64)
        lo, hi = int(lum.min()), int(lum.max())
        return [
            float(w),
            float(h),
            float(bands),
            int(lum.sum()) / (w * h) / 255.0,
            lo / 255.0,
            hi / 255.0,
            (hi - lo) / 255.0,
            w / max(h, 1),
        ][:feature_dim]

    return decode_image, encode_pnm, luma_features, split_pnm_stream, encode_png


decode_image, encode_pnm, _luma_features, split_pnm_stream, encode_png = (
    _make_image_codec()
)


def synthetic_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-image media table: one PPM (P6) per document,
    every pixel a closed-form function of (doc_id, x, y) — so a SQL
    oracle can regenerate the pixels and recompute the DECODED statistics
    exactly, grading the real decode path end-to-end. Arrow-batched
    generation (mapInPandas), numpy-vectorized per image:

        w = 8 + (doc_id % 5)*4, h = 8 + (doc_id % 3)*4
        R = (7·id + 13·x + 31·y) % 256
        G = (11·id + 3·x + 17·y) % 256
        B = (5·id + 29·x + 23·y) % 256
    """
    return _synthetic_image_media(docs, encode_pnm)


def synthetic_png_media(docs: DataFrame) -> DataFrame:
    """The :func:`synthetic_ppm_media` pixel formula in a PNG container
    (round 13): same closed-form (doc_id, x, y) pixels, encoded via the
    stdlib-zlib PNG encoder with the per-row filter cycling 0..4 — so ONE
    graded entry exercises every scanline-filter inverse in the decoder
    (None/Sub/Up/Average/Paeth) plus the chunk walk and inflate, while
    the SQL oracle keeps regenerating pixels from the formula (the
    container is invisible to the oracle: compressed payload length is
    not SQL-derivable, so the PNG entry grades pixel statistics only)."""
    return _synthetic_image_media(
        docs, lambda px: encode_png(px, filters=[0, 1, 2, 3, 4])
    )


def _synthetic_image_media(docs: DataFrame, enc) -> DataFrame:
    gen_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    # `enc` has a <locals> qualname -> pickled by value (see _make_image_codec)

    def _batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 5) * 4
                h = 8 + (did % 3) * 4
                x = _np.arange(w)[None, :, None]
                y = _np.arange(h)[:, None, None]
                r = (7 * did + 13 * x + 31 * y) % 256
                g = (11 * did + 3 * x + 17 * y) % 256
                bl = (5 * did + 29 * x + 23 * y) % 256
                px = _np.concatenate(
                    _np.broadcast_arrays(r, g, bl), axis=2
                ).astype(_np.uint8)
                payloads.append(enc(px))
                ws.append(w)
                hs.append(h)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "width": _pd.Series(ws, dtype="int32"),
                    "height": _pd.Series(hs, dtype="int32"),
                }
            )

    flat = _spread(docs.select("doc_id")).mapInPandas(
        _batches, schema=gen_schema
    )
    return flat.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image").alias("kind"),
            F.col("width"),
            F.col("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _make_audio_codec():
    """Dependency-free audio codec (round 12): 16-bit PCM WAV decode and
    encode in pure numpy + struct — no librosa/soundfile. Factory-scoped
    for the same cloudpickle by-value reason as :func:`_make_image_codec`.
    Compressed formats (MP3/OGG/FLAC) raise NotImplementedError — those
    genuinely need a codec library."""

    def decode_wav(b):
        """``bytes -> (sample_rate, n_channels, int16 ndarray [n, ch])``."""
        import struct

        import numpy as np

        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise NotImplementedError(
                "dependency-free audio decode supports 16-bit PCM WAV only; "
                "compressed formats need a codec library"
            )
        fmt = data = None
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            size = struct.unpack_from("<I", b, pos + 4)[0]
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # RIFF chunks pad to even sizes
        if fmt is None or data is None:
            raise NotImplementedError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
        bits = struct.unpack_from("<H", fmt, 14)[0]
        if audio_fmt != 1 or bits != 16:
            raise NotImplementedError("only 16-bit PCM WAV (format tag 1)")
        s = np.frombuffer(data, dtype="<i2")
        return rate, n_ch, s.reshape(-1, n_ch)

    def encode_wav(samples, rate):
        """``int16 ndarray [n] or [n, ch] -> PCM16 WAV bytes``."""
        import struct

        import numpy as np

        samples = np.asarray(samples, dtype="<i2")
        if samples.ndim == 1:
            samples = samples[:, None]
        _n, ch = samples.shape
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, ch, int(rate), int(rate) * ch * 2, ch * 2, 16)
        body = (
            b"WAVEfmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    return decode_wav, encode_wav


decode_wav, encode_wav = _make_audio_codec()

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over PCM16 WAV payloads via
    the REAL dependency-free decoder: (sample_rate, n_samples, peak,
    mean_amp, rms) per row — the standard loudness/clipping signals a
    corpus-quality filter thresholds on. Row-local mapInPandas, zero
    exchanges; unsupported formats raise inside the decoder."""
    dec = decode_wav  # <locals> qualname -> pickled by value

    def _batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "peak",
                "mean_amp", "rms",
            )}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                if b is None:
                    for k in ("sample_rate", "n_samples", "peak",
                              "mean_amp", "rms"):
                        out[k].append(None)
                    continue
                rate, _ch, s = dec(bytes(b))
                v = s.astype(_np.int64).ravel()
                n = v.size
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(n))
                out["peak"].append(int(_np.abs(v).max()) if n else 0)
                out["mean_amp"].append(int(v.sum()) / n if n else None)
                out["rms"].append(
                    float(_np.sqrt(int((v * v).sum()) / n)) if n else None
                )
            yield _pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=AUDIO_FEATURES_SCHEMA
    )


def synthetic_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-audio media table: one mono PCM16 WAV per
    document, every sample a closed-form function of (doc_id, i) so a
    SQL oracle can regenerate the waveform and recompute the decoded
    statistics exactly:

        n    = 256 + (doc_id % 7)·64
        rate = 8000 + (doc_id % 3)·4000
        s[i] = ((31·doc_id + 17·i) % 4096) − 2048   (sawtooth-like, exact
                                                     integers — no float
                                                     transcendentals)
    """
    gen_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.IntegerType(), True),
        ]
    )
    enc = encode_wav

    def _batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads, rates, ns = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 256 + (did % 7) * 64
                rate = 8000 + (did % 3) * 4000
                i = _np.arange(n, dtype=_np.int64)
                s = ((31 * did + 17 * i) % 4096) - 2048
                payloads.append(enc(s.astype("<i2"), rate))
                rates.append(rate)
                ns.append(n)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "sample_rate": _pd.Series(rates, dtype="int32"),
                    "n_samples": _pd.Series(ns, dtype="int32"),
                }
            )

    flat = _spread(docs.select("doc_id")).mapInPandas(
        _batches, schema=gen_schema
    )
    return flat.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: FEATURE_DIM
    doubles derived from the md5 digest."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``decode='real'`` (round 12) runs the REAL dependency-free decoder —
    binary PNM (P6/P5) and 24-bit uncompressed BMP via
    :func:`decode_image` — and emits the same pixel-statistic layout as
    the pil path: [w, h, n_bands, mean/255, min/255, max/255,
    extrema-spread, aspect] over ITU-R 601-2 integer luma; formats
    genuinely needing a codec library still raise NotImplementedError
    inside the decoder. ``decode='pil'`` decodes with Pillow when
    importable (any format PIL knows); both paths agree on PNM/BMP
    inputs (tests/test_multimodal.py)."""
    if decode not in ("fake", "real", "pil"):
        raise ValueError(f"decode must be 'fake', 'real' or 'pil', got {decode!r}")

    feature_dim = FEATURE_DIM  # captured by value — see closure note below
    real_features = _luma_features  # <locals> qualname -> pickled by value

    # NB the kernel must be a SELF-CONTAINED closure: any reference to a
    # module-level name makes cloudpickle serialize it by module reference,
    # and the executor-side Python worker then needs this package on its
    # sys.path (it isn't, when the driver runs from another cwd).
    def _batches(it):
        import hashlib as _hashlib

        import pandas as _pd

        pil_image = None
        if decode == "pil":
            try:
                from PIL import Image as pil_image  # noqa: N813
            except ImportError as exc:  # pragma: no cover — env-dependent
                raise ImportError(
                    "decode='pil' requires Pillow in the executor Python; "
                    "use decode='fake' in codec-free environments"
                ) from exc

        def _pil_features(b):
            if b is None:
                return None
            import io as _io

            with pil_image.open(_io.BytesIO(b)) as img:
                stat_img = img.convert("L")
                px = list(stat_img.getdata())
                lo, hi = min(px), max(px)
                return [
                    float(img.width),
                    float(img.height),
                    float(len(img.getbands())),
                    sum(px) / len(px) / 255.0,
                    lo / 255.0,
                    hi / 255.0,
                    (hi - lo) / 255.0,
                    img.width / max(img.height, 1),
                ][:feature_dim]

        for pdf in it:
            payloads = pdf["payload"]
            if decode == "real":
                feats = payloads.map(
                    lambda b: real_features(b, feature_dim)
                    if b is not None
                    else None
                )
            elif decode == "pil":
                feats = payloads.map(_pil_features)
            else:
                feats = payloads.map(
                    lambda b: [
                        _hashlib.md5(b).digest()[i] / 255.0
                        for i in range(feature_dim)
                    ]
                    if b is not None
                    else None
                )
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_nth: int = 4, decode: str = "fake") -> DataFrame:
    """Frame sampling: one output row per sampled frame (a 1→N mapInPandas
    expansion).

    ``decode='real'`` (round 12) parses the payload as the engine's
    codec-free video container — CONCATENATED binary-PNM frames
    (:func:`split_pnm_stream`) — and emits every ``every_nth`` frame as
    its own standalone PNM payload; the frame count comes from the
    container itself, not metadata. Containers genuinely needing ffmpeg
    (MP4/WebM/...) raise inside the splitter. ``decode='fake'`` keeps the
    deterministic byte-slice stand-in driven by ``meta.n_frames``."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    split = split_pnm_stream  # <locals> qualname -> pickled by value

    # self-contained closure (see extract_features note)
    def _batches(it):
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_payload = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                if decode == "real":
                    frames = split(bytes(payload)) if payload else []
                    for frame in range(0, len(frames), every_nth):
                        out_ids.append(row["media_id"])
                        out_idx.append(frame)
                        out_payload.append(frames[frame])
                    continue
                n = int(row["n_frames"] or 0)
                for frame in range(0, n, every_nth):
                    start = (frame * 7) % max(len(payload), 1)
                    out_ids.append(row["media_id"])
                    out_idx.append(frame)
                    out_payload.append(payload[start : start + 16])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": pd.Series(out_payload, dtype=object),
                }
            )

    src = media.select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return src.mapInPandas(_batches, schema=FRAMES_SCHEMA)


def synthetic_ppm_video(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-video media table: one concatenated-PNM
    container per document — ``n_frames = 2 + (doc_id % 4)`` PPM frames,
    every pixel a closed-form function of (doc_id, x, y, frame):

        w = 8 + (doc_id % 3)·4, h = 8
        R = (7·id + 13·x + 31·y + 41·f) % 256
        G = (11·id + 3·x + 17·y + 41·f) % 256
        B = (5·id + 29·x + 23·y + 41·f) % 256
    """
    gen_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
        ]
    )
    enc = encode_pnm

    def _batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads, ws, nf = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 3) * 4
                h = 8
                frames = 2 + (did % 4)
                x = _np.arange(w)[None, :, None]
                y = _np.arange(h)[:, None, None]
                parts = []
                for f in range(frames):
                    r = (7 * did + 13 * x + 31 * y + 41 * f) % 256
                    g = (11 * did + 3 * x + 17 * y + 41 * f) % 256
                    bl = (5 * did + 29 * x + 23 * y + 41 * f) % 256
                    px = _np.concatenate([r, g, bl], axis=2).astype(
                        _np.uint8
                    )
                    parts.append(enc(px))
                payloads.append(b"".join(parts))
                ws.append(w)
                nf.append(frames)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "width": _pd.Series(ws, dtype="int32"),
                    "n_frames": _pd.Series(nf, dtype="int32"),
                }
            )

    flat = _spread(docs.select("doc_id")).mapInPandas(
        _batches, schema=gen_schema
    )
    return flat.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video").alias("kind"),
            F.col("width"),
            F.lit(8).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.col("n_frames"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """Image resize to a fixed (width, height) — the standard
    pre-training normalization step. Arrow-batched 1→1 mapInPandas; the
    Spark-side plumbing (schema, batch shape, metadata update) is real,
    and so is the pixel work for codec-free formats (round 12):
    ``decode='real'`` decodes PNM/24-bit-BMP via :func:`decode_image`,
    nearest-neighbour-resamples the pixel grid in numpy, and re-encodes
    as PPM/PGM — NotImplementedError now fires only inside the decoder,
    for formats genuinely needing a codec library. ``decode='pil'``
    resizes with Pillow when it imports (re-encoded as PNG bytes); the
    ``fake`` path emits a deterministic byte-resample of the payload sized
    ``width·height`` bytes (1 byte/px stand-in), so downstream batch
    sizing and storage accounting behave like the real thing."""
    if decode not in ("fake", "real", "pil"):
        raise ValueError(f"decode must be 'fake', 'real' or 'pil', got {decode!r}")
    w, h = int(width), int(height)
    dec, enc = decode_image, encode_pnm  # by-value pickling aliases

    def _batches(it):
        import pandas as _pd

        pil_image = None
        if decode == "pil":
            try:
                from PIL import Image as pil_image  # noqa: N813
            except ImportError as exc:  # pragma: no cover — env-dependent
                raise ImportError(
                    "decode='pil' requires Pillow in the executor Python; "
                    "use decode='fake' in codec-free environments"
                ) from exc

        def _pil_resize(b):
            if b is None:
                return None
            import io as _io

            with pil_image.open(_io.BytesIO(b)) as img:
                out = _io.BytesIO()
                img.resize((w, h)).save(out, format="PNG")
                return out.getvalue()

        def _real_resize(b):
            if b is None:
                return None
            import numpy as _np

            w0, h0, _bands, px = dec(b)
            xs = (_np.arange(w) * w0) // w  # nearest-neighbour index map
            ys = (_np.arange(h) * h0) // h
            return enc(_np.ascontiguousarray(px[ys][:, xs]))

        for pdf in it:

            def _resample(b):
                if b is None:
                    return None
                n = w * h
                if len(b) == 0:
                    return bytes(n)
                # nearest-neighbour byte resample: index stretch/shrink
                return bytes(b[(i * len(b)) // n] for i in range(n))

            kernel = {
                "pil": _pil_resize,
                "real": _real_resize,
                "fake": _resample,
            }[decode]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(kernel),
                    "width": _pd.Series([w] * len(pdf), dtype="int32"),
                    "height": _pd.Series([h] * len(pdf), dtype="int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=RESIZED_SCHEMA
    )
