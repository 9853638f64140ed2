"""Oracle-checked catalog entries for the SCD2 centerpiece (SURVEY §2.6),
the J7 change-comparison join, and the multimodal mapInPandas path.

The SCD2 merge query builds a deterministic scenario from the customer
table entirely inside the query (initial load + a mutated incoming batch),
runs the engine's ``scd2_merge``, and returns the full post-merge dimension
— which a DuckDB CTE chain reproduces exactly, surrogate keys included.
"""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.scd2 import Scd2Config, scd2_merge

EFFECTIVE = date(2026, 2, 1)
INITIAL_START = date(2026, 1, 1)

CUSTOMER_SCD2 = Scd2Config(
    natural_key="c_custkey",
    surrogate_key="c_sk",
    tracked_cols=("c_name", "c_acctbal", "c_mktsegment"),
    carried_cols=(),
    new_key_start_col=None,
)


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def scd2_merge_customers(spark, sf_dir):
    """Full SCD2 merge: initial dim = every customer (version 1, sk dense by
    custkey); incoming batch mutates acctbal for custkey%5==0 and drops
    custkey%7==0 (absent keys stay untouched). Returns the merged dim.

    Expected oracle-verifiable effects: changed keys close (end_date =
    eff-1, current=false) and reopen with a new max+row_number sk; unchanged
    and absent keys keep version 1 current.
    """
    c = _customer(spark, sf_dir)
    w = Window.orderBy("c_custkey")
    dim = c.select(
        F.row_number().over(w).cast("long").alias("c_sk"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        F.lit(INITIAL_START).cast("date").alias("start_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.lit(True).alias("current_flag"),
    )
    incoming = c.where(F.col("c_custkey") % 7 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 5 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    result = scd2_merge(dim, incoming, CUSTOMER_SCD2, EFFECTIVE)
    merged = result.dim.select(
        "c_sk",
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        "start_date",
        "end_date",
        "current_flag",
    ).localCheckpoint(eager=True)  # materialize so the merge's caches can go
    result.unpersist()
    return merged


SCD2_MERGE_CUSTOMERS_ORACLE = f"""
WITH dim AS (
  SELECT row_number() OVER (ORDER BY c_custkey) AS c_sk,
         c_custkey, c_name, c_acctbal, c_mktsegment,
         DATE '{INITIAL_START}' AS start_date,
         CAST(NULL AS DATE) AS end_date,
         TRUE AS current_flag
  FROM customer
),
incoming AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 100.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 != 0
),
classified AS (
  SELECT i.*, d.c_sk AS old_sk,
         (i.c_name IS DISTINCT FROM d.c_name
          OR i.c_acctbal IS DISTINCT FROM d.c_acctbal
          OR i.c_mktsegment IS DISTINCT FROM d.c_mktsegment) AS changed
  FROM incoming i JOIN dim d ON i.c_custkey = d.c_custkey
),
closed AS (
  SELECT d.c_sk, d.c_custkey, d.c_name, d.c_acctbal, d.c_mktsegment,
         d.start_date,
         DATE '{EFFECTIVE}' - 1 AS end_date,
         FALSE AS current_flag
  FROM dim d JOIN classified c ON d.c_custkey = c.c_custkey AND c.changed
),
untouched AS (
  SELECT d.* FROM dim d
  WHERE d.c_custkey NOT IN (SELECT c_custkey FROM classified WHERE changed)
),
new_versions AS (
  SELECT (SELECT max(c_sk) FROM dim)
           + row_number() OVER (ORDER BY c_custkey) AS c_sk,
         c_custkey, c_name, c_acctbal, c_mktsegment,
         DATE '{EFFECTIVE}' AS start_date,
         CAST(NULL AS DATE) AS end_date,
         TRUE AS current_flag
  FROM classified WHERE changed
)
SELECT c_sk, c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, c_mktsegment,
       start_date, end_date, current_flag
FROM (
  SELECT * FROM untouched
  UNION ALL SELECT * FROM closed
  UNION ALL SELECT * FROM new_versions
)
"""


def change_comparison_join(spark, sf_dir):
    """J7 (SCD2 diff classification): incoming snapshot vs current table —
    count new / changed / unchanged keys, change detected via exact
    null-safe attribute compare (reference ETL/etl.py:193-195,241-243)."""
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_partkey", "p_name", "p_retailprice"
    )
    incoming = p.withColumn(
        "p_retailprice",
        F.when(
            F.col("p_partkey") % 7 == 0, F.round(F.col("p_retailprice") * 1.1, 2)
        ).otherwise(F.col("p_retailprice")),
    )
    current = p.select(
        "p_partkey",
        F.col("p_name").alias("cur_name"),
        F.col("p_retailprice").alias("cur_price"),
    )
    joined = incoming.join(current, "p_partkey", "left")
    status = (
        F.when(F.col("cur_name").isNull(), F.lit("new"))
        .when(
            ~F.col("p_name").eqNullSafe(F.col("cur_name"))
            | ~F.col("p_retailprice").eqNullSafe(F.col("cur_price")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n")
    )


CHANGE_COMPARISON_JOIN_ORACLE = """
WITH incoming AS (
  SELECT p_partkey, p_name,
         CASE WHEN p_partkey % 7 = 0 THEN round(p_retailprice * 1.1, 2)
              ELSE p_retailprice END AS p_retailprice
  FROM part
)
SELECT CASE
         WHEN c.p_partkey IS NULL THEN 'new'
         WHEN i.p_name IS DISTINCT FROM c.p_name
           OR i.p_retailprice IS DISTINCT FROM c.p_retailprice THEN 'changed'
         ELSE 'unchanged'
       END AS status,
       count(*) AS n
FROM incoming i LEFT JOIN part c ON i.p_partkey = c.p_partkey
GROUP BY 1
"""


def multimodal_features(spark, sf_dir):
    """Arrow mapInPandas feature extraction over binary payloads, verified
    against SQL: payload = utf-8 doc text, so n_bytes/md5/features are all
    SQL-derivable from the text column."""
    from ..operators.multimodal import extract_features, media_from_documents

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    feats = extract_features(media_from_documents(docs), decode="fake")
    return feats.select(
        "media_id",
        "n_bytes",
        "content_md5",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 8), 6).alias("f7"),
    )


MULTIMODAL_FEATURES_ORACLE = """
SELECT doc_id AS media_id,
       strlen(text) AS n_bytes,
       md5(text) AS content_md5,
       round((('0x' || substr(md5(text), 1, 2))::INT) / 255.0, 6) AS f0,
       round((('0x' || substr(md5(text), 15, 2))::INT) / 255.0, 6) AS f7
FROM documents
"""


def multimodal_real_decode(spark, sf_dir):
    """REAL image decode graded end-to-end (round 12, lifting the
    env-gated-codec caveat): synthetic PPM(P6) images — one per document,
    every pixel a closed-form function of (doc_id, x, y)
    (operators/multimodal.synthetic_ppm_media) — go through the
    dependency-free decoder (decode='real': PNM/BMP in pure numpy) and
    the standard pixel-statistic feature layout; the oracle REGENERATES
    the pixels from the same formula in SQL and recomputes the decoded
    statistics, so a decoder bug (header parse, row order, luma formula)
    is a value mismatch, not a skipped test. Scale shape: generation and
    decode are both row-local Arrow mapInPandas passes — zero exchanges
    beyond the scan."""
    from ..operators.multimodal import extract_features, synthetic_ppm_media

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    media = synthetic_ppm_media(docs)
    feats = extract_features(media, decode="real")
    return feats.select(
        "media_id",
        "n_bytes",
        F.element_at("features", 1).cast("long").alias("width"),
        F.element_at("features", 2).cast("long").alias("height"),
        F.round(F.element_at("features", 4), 6).alias("luma_mean"),
        F.round(F.element_at("features", 5), 6).alias("luma_min"),
        F.round(F.element_at("features", 6), 6).alias("luma_max"),
        F.round(F.element_at("features", 8), 6).alias("aspect"),
    )


MULTIMODAL_REAL_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 8 + (doc_id % 3) * 4 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         (299 * ((7*doc_id + 13*(i % w) + 31*(i // w)) % 256)
        + 587 * ((11*doc_id + 3*(i % w) + 17*(i // w)) % 256)
        + 114 * ((5*doc_id + 29*(i % w) + 23*(i // w)) % 256)) // 1000 AS L
  FROM dims, UNNEST(range(w * h)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
              + 3 * w * h AS BIGINT) AS n_bytes,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(sum(L) / count(*) / 255.0, 6) AS luma_mean,
       round(min(L) / 255.0, 6) AS luma_min,
       round(max(L) / 255.0, 6) AS luma_max,
       round(CAST(w AS DOUBLE) / h, 6) AS aspect
FROM px GROUP BY doc_id, w, h
"""


def multimodal_png_decode(spark, sf_dir):
    """Stdlib-zlib PNG decode graded end-to-end (round 13, closing the
    last common in-sandbox image-format gap): the same closed-form
    (doc_id, x, y) pixels as multimodal_real_decode, but in a PNG
    container whose per-row scanline filter cycles 0..4
    (operators/multimodal.synthetic_png_media) — so the graded pass
    exercises the chunk walk, zlib inflate, and ALL FIVE filter
    inverses (None/Sub/Up/Average/Paeth), not just the easy path. The
    oracle regenerates the pixels from the formula and recomputes the
    decoded statistics; n_bytes is omitted (a compressed payload length
    is not SQL-derivable). A filter-inverse or inflate bug is a value
    mismatch, not a skipped test. Scale shape: generation and decode are
    both row-local Arrow mapInPandas passes — zero exchanges beyond the
    scan. Pillow is now needed only for JPEG / interlaced / non-8-bit
    formats."""
    from ..operators.multimodal import extract_features, synthetic_png_media

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    media = synthetic_png_media(docs)
    feats = extract_features(media, decode="real")
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("long").alias("width"),
        F.element_at("features", 2).cast("long").alias("height"),
        F.round(F.element_at("features", 4), 6).alias("luma_mean"),
        F.round(F.element_at("features", 5), 6).alias("luma_min"),
        F.round(F.element_at("features", 6), 6).alias("luma_max"),
        F.round(F.element_at("features", 8), 6).alias("aspect"),
    )


MULTIMODAL_PNG_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 8 + (doc_id % 3) * 4 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         (299 * ((7*doc_id + 13*(i % w) + 31*(i // w)) % 256)
        + 587 * ((11*doc_id + 3*(i % w) + 17*(i // w)) % 256)
        + 114 * ((5*doc_id + 29*(i % w) + 23*(i // w)) % 256)) // 1000 AS L
  FROM dims, UNNEST(range(w * h)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(sum(L) / count(*) / 255.0, 6) AS luma_mean,
       round(min(L) / 255.0, 6) AS luma_min,
       round(max(L) / 255.0, 6) AS luma_max,
       round(CAST(w AS DOUBLE) / h, 6) AS aspect
FROM px GROUP BY doc_id, w, h
"""


def multimodal_resize_decode(spark, sf_dir):
    """The full real-codec pipeline graded end-to-end (round 12):
    closed-form synthetic PPMs → REAL nearest-neighbour resize to a
    fixed 12×10 (decode → numpy resample → PPM re-encode) → REAL decode
    of the resized payloads → pixel statistics. The oracle regenerates
    the resampled pixel grid directly from the source formula
    (src_x = (x·w0)//12, src_y = (y·h0)//10 — the exact index map
    resize_images uses), so a resample-index or re-encode bug is a
    value mismatch. Two chained Arrow mapInPandas passes, both
    row-local — zero exchanges beyond the scan."""
    from ..operators.multimodal import (
        extract_features,
        resize_images,
        synthetic_ppm_media,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    media = synthetic_ppm_media(docs)
    resized = resize_images(media, 12, 10, decode="real")
    feats = extract_features(
        resized.select("media_id", "payload"), decode="real"
    )
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("features", 4), 6).alias("luma_mean"),
        F.round(F.element_at("features", 5), 6).alias("luma_min"),
        F.round(F.element_at("features", 6), 6).alias("luma_max"),
    )


def multimodal_frame_sample(spark, sf_dir):
    """REAL frame sampling graded end-to-end (round 12): synthetic
    concatenated-PNM video containers (2–5 closed-form PPM frames per
    document) → sample_frames(decode='real') parses the container and
    emits every 2nd frame as a standalone PPM → real decode of each
    sampled frame → per-frame luma statistics. The oracle regenerates
    the sampled frames' pixels from the (doc_id, x, y, frame) formula,
    so a container-split, frame-boundary, or sampling-stride bug is a
    value mismatch. Frame rows are keyed through the stat extractor by
    the composite id ``media_id·16 + frame_idx`` (frame_idx < 16 by
    construction) and unpacked in the final projection."""
    from ..operators.multimodal import (
        extract_features,
        sample_frames,
        synthetic_ppm_video,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    video = synthetic_ppm_video(docs)
    frames = sample_frames(video, every_nth=2, decode="real")
    tagged = frames.select(
        (F.col("media_id") * 16 + F.col("frame_idx")).alias("media_id"),
        F.col("frame_payload").alias("payload"),
    )
    feats = extract_features(tagged, decode="real")
    composite = F.col("media_id")
    return feats.select(
        ((composite - composite % 16) / 16).cast("long").alias("media_id"),
        (composite % 16).cast("long").alias("frame_idx"),
        "n_bytes",
        F.round(F.element_at("features", 4), 6).alias("luma_mean"),
        F.round(F.element_at("features", 6), 6).alias("luma_max"),
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 2 + (doc_id % 4) AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, f
  FROM dims, UNNEST(range(nf)) AS t(f)
  WHERE f % 2 = 0
), px AS (
  SELECT doc_id, w, f,
         (299 * ((7*doc_id + 13*(i % w) + 31*(i // w) + 41*f) % 256)
        + 587 * ((11*doc_id + 3*(i % w) + 17*(i // w) + 41*f) % 256)
        + 114 * ((5*doc_id + 29*(i % w) + 23*(i // w) + 41*f) % 256))
           // 1000 AS L
  FROM fr, UNNEST(range(w * 8)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(10 + length(CAST(w AS VARCHAR)) + 3 * w * 8 AS BIGINT) AS n_bytes,
       round(sum(L) / count(*) / 255.0, 6) AS luma_mean,
       round(max(L) / 255.0, 6) AS luma_max
FROM px GROUP BY doc_id, f, w
"""


def multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode graded end-to-end (round 12): synthetic mono
    PCM16 WAVs — one per document, every sample a closed-form integer
    function of (doc_id, i) (operators/multimodal.synthetic_wav_media) —
    round-trip through the dependency-free WAV encoder/decoder and emit
    the standard loudness statistics. The oracle regenerates the
    waveform from the same formula in SQL, so a RIFF-parse, chunk-walk,
    or int16 interpretation bug is a value mismatch. Together with the
    image entries this makes decode/features real for every codec-free
    modality; compressed formats stay behind NotImplementedError inside
    the decoder."""
    from ..operators.multimodal import (
        extract_audio_features,
        synthetic_wav_media,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    feats = extract_audio_features(synthetic_wav_media(docs))
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "peak",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms", 6).alias("rms"),
    )


MULTIMODAL_AUDIO_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         256 + (doc_id % 7) * 64 AS n,
         8000 + (doc_id % 3) * 4000 AS rate
  FROM documents
), s AS (
  SELECT doc_id, n, rate,
         ((31 * doc_id + 17 * i) % 4096) - 2048 AS v
  FROM dims, UNNEST(range(n)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       round(sum(v) / count(*), 6) AS mean_amp,
       round(sqrt(sum(v * v) / count(*)), 6) AS rms
FROM s GROUP BY doc_id, n, rate
"""


MULTIMODAL_RESIZE_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w0, 8 + (doc_id % 3) * 4 AS h0
  FROM documents
), px AS (
  SELECT doc_id,
         (299 * ((7*doc_id + 13*((((i % 12)) * w0) // 12)
                           + 31*((((i // 12)) * h0) // 10)) % 256)
        + 587 * ((11*doc_id + 3*((((i % 12)) * w0) // 12)
                           + 17*((((i // 12)) * h0) // 10)) % 256)
        + 114 * ((5*doc_id + 29*((((i % 12)) * w0) // 12)
                           + 23*((((i // 12)) * h0) // 10)) % 256)) // 1000 AS L
  FROM dims, UNNEST(range(120)) AS t(i)
)
SELECT doc_id AS media_id,
       CAST(13 + 360 AS BIGINT) AS n_bytes,
       round(sum(L) / count(*) / 255.0, 6) AS luma_mean,
       round(min(L) / 255.0, 6) AS luma_min,
       round(max(L) / 255.0, 6) AS luma_max
FROM px GROUP BY doc_id
"""
