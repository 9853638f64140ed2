"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (BASELINE.json north-star extension).

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` passes — the correct Spark shape for Python-only media
libraries (one python worker per partition, columnar Arrow transfer, no
per-row pickling).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are STUBBED: ``decode=fake`` produces deterministic
pseudo-features derived from the payload bytes (so tests can assert exact
values); ``decode=real`` raises NotImplementedError at the call site where
the codec would run. The Spark-side plumbing — schema, batching, partition
behavior, UDF signatures — is real and tested.

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


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: each document's text bytes become the
    payload (stands in for image/audio bytes; real pipelines read the bytes
    from object storage with ``binaryFile`` or a manifest join)."""
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


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: FEATURE_DIM
    doubles derived from the md5 digest."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``decode='real'`` marks where an actual image/audio decoder would run —
    unavailable in this environment (NotImplementedError). ``decode='pil'``
    decodes the payload as an image with Pillow (if importable) and emits
    real pixel statistics as the feature vector: [w, h, n_bands,
    mean/255, min/255, max/255, extrema-spread, aspect] — deterministic,
    so the skipped-unless-PIL test can pin exact values."""
    if decode not in ("fake", "real", "pil"):
        raise ValueError(f"decode must be 'fake', 'real' or 'pil', got {decode!r}")

    feature_dim = FEATURE_DIM  # captured by value — see closure note below

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
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg, "
                    "not present in this container"
                )
            payloads = pdf["payload"]
            if decode == "pil":
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
    expansion). Fake decode slices the payload deterministically."""
    if decode == "real":
        raise NotImplementedError("real video decode unavailable (no ffmpeg)")

    # self-contained closure (see extract_features note)
    def _batches(it):
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_payload = [], [], []
            for _, row in pdf.iterrows():
                n = int(row["n_frames"] or 0)
                payload = row["payload"] or b""
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
    the pixel work is env-gated like the other multimodal kernels:
    ``decode='real'`` is where PIL's ``Image.resize`` would run
    (NotImplementedError here — no PIL in the container); ``decode='pil'``
    runs it for real when Pillow imports (re-encoded as PNG bytes); the
    ``fake`` path emits a deterministic byte-resample of the payload sized
    ``width·height`` bytes (1 byte/px stand-in), so downstream batch
    sizing and storage accounting behave like the real thing."""
    if decode not in ("fake", "real", "pil"):
        raise ValueError(f"decode must be 'fake', 'real' or 'pil', got {decode!r}")
    w, h = int(width), int(height)

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

        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "real image resize requires PIL, not present in this "
                    "container"
                )

            def _resample(b):
                if b is None:
                    return None
                n = w * h
                if len(b) == 0:
                    return bytes(n)
                # nearest-neighbour byte resample: index stretch/shrink
                return bytes(b[(i * len(b)) // n] for i in range(n))

            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        _pil_resize if decode == "pil" else _resample
                    ),
                    "width": _pd.Series([w] * len(pdf), dtype="int32"),
                    "height": _pd.Series([h] * len(pdf), dtype="int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=RESIZED_SCHEMA
    )
