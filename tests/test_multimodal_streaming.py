"""Multimodal plumbing (mapInPandas) + Structured Streaming variants."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark import schemas
from ecommerce_full_etl_process_spark.operators import multimodal as M
from ecommerce_full_etl_process_spark.streaming import stream_pipeline as SP


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return M.media_from_documents(docs.limit(50))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.first()
    assert row["meta"]["kind"] == "image"


def test_extract_features_deterministic(media, spark):
    feats = M.extract_features(media, decode="fake")
    rows = {r["media_id"]: r for r in feats.collect()}
    # cross-check one row against driver-side recomputation
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    mid, payload = next(iter(src.items()))
    got = rows[mid]
    assert got["n_bytes"] == len(payload)
    assert got["content_md5"] == hashlib.md5(payload).hexdigest()
    assert got["features"] == [hashlib.md5(payload).digest()[i] / 255.0 for i in range(M.FEATURE_DIM)]
    assert len(rows) == 50


def test_extract_features_real_decode_rejects_unknown_formats(media):
    """decode='real' is a real decoder since round 12, but these media
    payloads are utf-8 doc text — not PNM/BMP — so the decoder must
    refuse them loudly (NotImplementedError naming the supported set),
    never emit garbage statistics."""
    with pytest.raises(Exception) as exc_info:
        M.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_image_pnm_roundtrip_and_bmp():
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    w, h, bands, out = M.decode_image(M.encode_pnm(px))
    assert (w, h, bands) == (7, 5, 3)
    assert np.array_equal(out, px)
    gray = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    w, h, bands, out = M.decode_image(M.encode_pnm(gray))
    assert (w, h, bands) == (6, 4, 1)
    assert np.array_equal(out, gray)
    # comments + multi-whitespace in the PNM header must parse
    hdr_variant = b"P6\n# made by hand\n7  5\n255\n" + px.tobytes()
    assert np.array_equal(M.decode_image(hdr_variant)[3], px)

    # hand-built 24-bit BMP, bottom-up rows, 4-byte row padding
    import struct

    bw, bh = 3, 2  # row = 9 bytes -> padded to 12
    rgb = np.arange(bw * bh * 3, dtype=np.uint8).reshape(bh, bw, 3)
    row_size = ((bw * 3 + 3) // 4) * 4
    body = b""
    for y in range(bh - 1, -1, -1):  # bottom-up
        row = rgb[y][:, ::-1].tobytes()  # BGR on disk
        body += row + b"\x00" * (row_size - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, bw, bh, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    w, h, bands, out = M.decode_image(header + body)
    assert (w, h, bands) == (bw, bh, 3)
    assert np.array_equal(out, rgb)

    # a PNG signature with a garbage chunk stream fails in the PNG
    # decoder (round 13: PNG is now a real in-sandbox format)
    with pytest.raises(NotImplementedError, match="PNG"):
        M.decode_image(b"\x89PNG\r\n\x1a\nnotreally")
    # genuinely unknown formats still name the supported set
    with pytest.raises(NotImplementedError, match="PNM"):
        M.decode_image(b"\xff\xd8\xff\xe0notajpegreally")


def test_wav_codec_roundtrip_and_rejections():
    import numpy as np

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    rate, ch, out = M.decode_wav(M.encode_wav(mono, 16000))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(out.ravel(), mono)
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    rate, ch, out = M.decode_wav(M.encode_wav(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)
    with pytest.raises(NotImplementedError, match="PCM WAV"):
        M.decode_wav(b"ID3\x04notanmp3frame")
    # odd-sized chunk before data: the walker must honor RIFF padding
    import struct

    wav = M.encode_wav(mono[:4], 8000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    padded = wav[:12] + extra + wav[12:]
    padded = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
    rate, ch, out = M.decode_wav(padded)
    assert rate == 8000 and np.array_equal(out.ravel(), mono[:4])


def test_split_pnm_stream_and_real_frame_sampling(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    container = b"".join(M.encode_pnm(f) for f in frames)
    parts = M.split_pnm_stream(container)
    assert len(parts) == 5
    for part, f in zip(parts, frames):
        assert np.array_equal(M.decode_image(part)[3], f)
    with pytest.raises(NotImplementedError, match="frame header"):
        M.split_pnm_stream(container + b"garbage")

    media = spark.createDataFrame(
        [(7, bytearray(container), ("video", 6, 4, None, 5))],
        schema=M.MEDIA_SCHEMA,
    )
    rows = {
        r["frame_idx"]: bytes(r["frame_payload"])
        for r in M.sample_frames(media, every_nth=2, decode="real").collect()
    }
    assert sorted(rows) == [0, 2, 4]  # frame count from the container
    for idx, payload in rows.items():
        assert np.array_equal(M.decode_image(payload)[3], frames[idx])


def test_extract_audio_features_hand_computed(spark):
    import numpy as np

    s = np.array([0, 100, -200, 300], dtype=np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(M.encode_wav(s, 12000))), (2, None)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r for r in M.extract_audio_features(media).collect()
    }
    r = rows[1]
    assert (r["sample_rate"], r["n_samples"], r["peak"]) == (12000, 4, 300)
    assert r["mean_amp"] == pytest.approx((0 + 100 - 200 + 300) / 4)
    assert r["rms"] == pytest.approx(
        (0 + 100**2 + 200**2 + 300**2) ** 0.5 / 2
    )
    assert rows[2]["n_samples"] is None


def test_extract_features_real_matches_hand_computed(spark):
    import numpy as np

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[..., 0] = 200  # R
    px[..., 1] = 100  # G
    px[..., 2] = 50   # B
    lum = (299 * 200 + 587 * 100 + 114 * 50) // 1000  # ITU-R 601-2
    media = spark.createDataFrame(
        [(1, bytearray(M.encode_pnm(px)))], "media_id long, payload binary"
    )
    feats = M.extract_features(media, decode="real").collect()[0]["features"]
    assert feats[:3] == [4.0, 2.0, 3.0]
    assert abs(feats[3] - lum / 255.0) < 1e-12  # constant image: mean==px
    assert feats[4] == feats[5] == lum / 255.0
    assert feats[6] == 0.0
    assert feats[7] == 2.0


def test_resize_images_real_nearest_neighbour(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(M.encode_pnm(px)))], "media_id long, payload binary"
    )
    out = M.resize_images(media, 4, 3, decode="real").collect()[0]
    w, h, bands, got = M.decode_image(bytes(out["payload"]))
    assert (w, h, bands) == (4, 3, 3)
    xs = (np.arange(4) * 8) // 4
    ys = (np.arange(3) * 6) // 3
    assert np.array_equal(got, px[ys][:, xs])


def test_real_and_pil_paths_agree_on_ppm(spark):
    """Parity gate for cluster images that DO have Pillow: the
    dependency-free decoder and PIL must emit identical features for the
    formats both understand (skips in this codec-free container)."""
    pytest.importorskip("PIL")
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(M.encode_pnm(px)))], "media_id long, payload binary"
    )
    real = M.extract_features(media, decode="real").collect()[0]["features"]
    pil = M.extract_features(media, decode="pil").collect()[0]["features"]
    assert real == pytest.approx(pil, abs=1e-12)


def test_sample_frames_expansion(media):
    frames = M.sample_frames(media, every_nth=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame_payload"}
    # every sampled frame index is a multiple of the stride
    assert (pdf["frame_idx"] % 4 == 0).all()
    # 1→N expansion really expands
    assert len(pdf) >= 50


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


def _write_tx_batch(spark, path, rows):
    spark.createDataFrame(rows, schemas.TRANSACTIONS).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_incremental_dedup(spark, tmp_path):
    src = str(tmp_path / "tx_src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    batch1 = [
        (1, "2026-02-02", 1, 1, 2, 20.0, "visa", "success"),
        (2, "2026-02-02", 1, 2, 1, 10.0, "visa", "success"),
        (2, "2026-02-02", 1, 2, 1, 10.0, "visa", "success"),  # dup line
    ]
    _write_tx_batch(spark, src, batch1)

    q = SP.run_incremental(spark, src, chk, out, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # duplicate (transaction_id, product_id) dropped by the stream
    assert got.count() == 2

    # second micro-batch: one new tx + a replay of tx 1 within watermark
    batch2 = [
        (1, "2026-02-02", 1, 1, 2, 20.0, "visa", "success"),  # replay
        (3, "2026-02-03", 1, 1, 1, 10.0, "visa", "failed"),
    ]
    _write_tx_batch(spark, src, batch2)
    q2 = SP.run_incremental(spark, src, chk, out, available_now=True)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out)
    ids = sorted(
        (r["transaction_id"], r["product_id"]) for r in got2.collect()
    )
    assert ids == [(1, 1), (2, 2), (3, 1)]


def test_run_incremental_dedup_contract_knob(spark, tmp_path):
    """Round-11 advice fix: the dedup contract is an explicit kwarg —
    'unbounded' opts back into the pre-round-10 exactly-once-forever
    behavior (dropDuplicates, state grows with every key ever seen);
    an unknown value fails loudly."""
    import pytest

    with pytest.raises(ValueError, match="dedup must be"):
        SP.run_incremental(
            spark, "/nope", "/nope", "/nope", dedup="sometimes"
        )

    src = str(tmp_path / "txu_src")
    chk = str(tmp_path / "txu_chk")
    out = str(tmp_path / "txu_out")
    _write_tx_batch(
        spark,
        src,
        [
            (1, "2026-02-02", 1, 1, 2, 20.0, "visa", "success"),
            (1, "2026-02-02", 1, 1, 2, 20.0, "visa", "success"),  # dup
            (2, "2026-02-02", 1, 2, 1, 10.0, "visa", "success"),
        ],
    )
    q = SP.run_incremental(
        spark, src, chk, out, available_now=True, dedup="unbounded"
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_watermark_finalizes_closed_windows_only(spark, tmp_path):
    """Late-data policy (append mode + event-time watermark): after the
    watermark advances past a window's end, that window is finalized and
    emitted; windows the watermark hasn't passed are withheld, pending
    possible late arrivals."""
    src = str(tmp_path / "wm_src")
    chk = str(tmp_path / "wm_chk")
    spark.createDataFrame(
        [
            (1, "2026-02-01", 1, 1, 1, 5.0, "visa", "success"),
            (2, "2026-02-01", 1, 2, 1, 5.0, "visa", "success"),
            (3, "2026-02-10", 1, 1, 1, 5.0, "visa", "success"),
        ],
        schemas.TRANSACTIONS,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = SP.with_event_time(SP.transactions_file_stream(spark, src))
    agg = SP.windowed_status_counts(stream, window="1 day", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_sink")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (str(r["window_start"].date()), r["status"]): r["n"]
        for r in spark.sql("SELECT * FROM wm_sink").collect()
    }
    # Feb-1 window closed (watermark = Feb 9) → emitted with both events;
    # Feb-10 window still open → withheld
    assert got == {("2026-02-01", "success"): 2}


def test_windowed_status_counts_batch_semantics(spark):
    """Window aggregation semantics validated on a static frame (the same
    plan streams with a watermark)."""
    rows = [
        (1, "2026-02-02", 1, 1, 1, 5.0, "visa", "success"),
        (2, "2026-02-02", 1, 1, 1, 5.0, "visa", "failed"),
        (3, "2026-02-03", 1, 1, 1, 5.0, "visa", "success"),
    ]
    tx = SP.with_event_time(
        spark.createDataFrame(rows, schemas.TRANSACTIONS)
    )
    out = (
        tx.groupBy(F.window("event_time", "1 day").alias("w"), "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("date").alias("d"), "status", "n")
    )
    got = {(str(r["d"]), r["status"]): r["n"] for r in out.collect()}
    assert got == {
        ("2026-02-02", "success"): 1,
        ("2026-02-02", "failed"): 1,
        ("2026-02-03", "success"): 1,
    }


def test_resize_images_fake_path(spark, sf_dir):
    from ecommerce_full_etl_process_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = M.media_from_documents(docs)
    out = M.resize_images(media, width=16, height=8).collect()
    assert len(out) == 20
    for r in out:
        assert r["width"] == 16 and r["height"] == 8
        assert len(r["payload"]) == 16 * 8
    # deterministic: same input -> same resampled bytes
    again = M.resize_images(media, width=16, height=8).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def test_resize_images_real_path_rejects_unknown_formats(spark, sf_dir):
    import pytest

    from ecommerce_full_etl_process_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = M.media_from_documents(docs)  # utf-8 text payloads, not images
    with pytest.raises(Exception) as exc:
        M.resize_images(media, 4, 4, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_pil_decode_skipped_unless_available(spark):
    """decode='pil' runs REAL pixel work when Pillow is importable; in
    this codec-free container the test skips — on a cluster image with
    Pillow it verifies the shim end-to-end (round-6 cluster-readiness)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    def png_bytes(w, h, value):
        img = Image.new("L", (w, h), value)
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()

    rows = [(1, png_bytes(8, 4, 100)), (2, png_bytes(3, 3, 255)), (3, None)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = {
        r["media_id"]: r["features"]
        for r in M.extract_features(media, decode="pil").collect()
    }
    assert feats[1][:3] == [8.0, 4.0, 1.0]  # w, h, n_bands
    assert abs(feats[1][3] - 100 / 255.0) < 1e-9  # mean gray
    assert feats[2][5] == 1.0  # max pixel
    assert feats[3] is None

    resized = {
        r["media_id"]: r
        for r in M.resize_images(media, 4, 4, decode="pil").collect()
    }
    with Image.open(io.BytesIO(bytes(resized[1]["payload"]))) as img:
        assert img.size == (4, 4)
    assert resized[3]["payload"] is None


def test_pil_decode_raises_clear_importerror_when_absent(spark):
    """In the codec-free container the pil path must fail with an
    actionable ImportError (not a raw ModuleNotFoundError buried in a
    task stack) the moment the kernel runs."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow available: covered by the positive test")
    except ImportError:
        pass
    media = spark.createDataFrame(
        [(1, b"notanimage")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="decode='pil' requires Pillow"):
        M.extract_features(media, decode="pil").collect()


# ---------------------------------------------------------------------------
# stdlib PNG codec (round 13)


def test_png_round_trip_all_filters_and_shapes():
    """encode_png -> decode_image recovers exact pixels for RGB and gray
    across every scanline filter (the per-row ``filters`` knob cycles the
    encoder through None/Sub/Up/Average/Paeth) and awkward shapes (1×1,
    single-column, wide rows)."""
    import numpy as np

    rng = np.random.default_rng(3)
    for bands in (1, 3):
        for (w, h) in [(1, 1), (5, 7), (16, 12), (3, 64)]:
            px = rng.integers(0, 256, size=(h, w, bands), dtype=np.uint8)
            for filters in (None, [1], [2], [3], [4], [0, 1, 2, 3, 4]):
                b = M.encode_png(px, filters=filters)
                w2, h2, b2, got = M.decode_image(b)
                assert (w2, h2, b2) == (w, h, bands), (w, h, bands, filters)
                assert np.array_equal(got, px), (w, h, bands, filters)


def test_png_decode_rejects_unsupported_variants():
    """Interlaced / 16-bit / palette / malformed PNGs raise
    NotImplementedError (the decode='pil' escape hatch), never decode
    garbage."""
    import struct
    import zlib

    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = M.encode_png(px)

    def mutate_ihdr(b, depth=8, ctype=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return b[:8] + chunk + b[8 + 12 + 13 :]

    for bad in (
        mutate_ihdr(good, depth=16),
        mutate_ihdr(good, ctype=3),  # palette
        mutate_ihdr(good, ctype=6),  # RGBA
        mutate_ihdr(good, interlace=1),  # Adam7
        good[:8] + good[8:20],  # truncated chunk stream
    ):
        with pytest.raises(NotImplementedError):
            M.decode_image(bad)


def test_png_luma_features_match_ppm_features(spark):
    """The SAME pixels through the PNG container and the PPM container
    must produce identical decoded features (the container is invisible
    to the statistics) — pinned via the two synthetic media generators
    over a handful of documents."""
    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    ppm = M.extract_features(
        M.synthetic_ppm_media(docs), decode="real"
    ).select("media_id", "features")
    png = M.extract_features(
        M.synthetic_png_media(docs), decode="real"
    ).select("media_id", "features")
    a = {r["media_id"]: r["features"] for r in ppm.collect()}
    b = {r["media_id"]: r["features"] for r in png.collect()}
    assert set(a) == set(b)
    for mid in a:
        # n_bytes-independent positions: w,h,bands + all luma stats
        assert a[mid] == b[mid], mid


def test_png_pil_cross_check(spark):
    """Pillow parity for the stdlib decoder (skips in this codec-free
    container; on a cluster image with Pillow it pins that our unfilter
    logic agrees with a reference implementation)."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    out = io.BytesIO()
    Image.fromarray(px, mode="RGB").save(out, format="PNG")
    w, h, bands, got = M.decode_image(out.getvalue())
    assert (w, h, bands) == (13, 11, 3)
    assert np.array_equal(got, px)
    # and PIL decodes OUR encoder's output
    with Image.open(io.BytesIO(M.encode_png(px, filters=[4]))) as img:
        assert np.array_equal(np.asarray(img), px)
