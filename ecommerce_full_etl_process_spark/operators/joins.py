"""Join operators (SURVEY §2.4, J1-J7).

The reference implements joins as per-row correlated SQLite lookups; here
each is a set-based DataFrame join. Small dimension sides are broadcast so
the big (fact) side never shuffles for a lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def semi_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J1: FK-existence (reference set probe, ETL/validation.py:116,121)."""
    return df.join(F.broadcast(keys), on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J4/J6: complement of J1 — orphans / not-yet-loaded rows."""
    return df.join(F.broadcast(keys), on, "left_anti")


def join_current_version(
    facts: DataFrame, dim: DataFrame, natural_key: str, select_cols: list[str]
) -> DataFrame:
    """J2: equi lookup against the dimension's current version
    (reference ``WHERE <nk>=? AND current_flag=1``, ETL/etl.py:271-275)."""
    current = dim.where(F.col("current_flag")).select(natural_key, *select_cols)
    return facts.join(F.broadcast(current), natural_key, "left")


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    natural_key: str,
    fact_date_col: str,
    select_cols: list[str],
    defensive_unique: bool = False,
) -> DataFrame:
    """J3: point-in-time (as-of) surrogate-key resolution.

    Reference (ETL/etl.py:326-352): ``start_date <= d AND (end_date IS NULL
    OR end_date >= d) ORDER BY start_date DESC LIMIT 1``.

    SCD2 validity intervals are disjoint per natural key, so the range match
    is unique and no LIMIT-1 tie-break is needed; ``defensive_unique=True``
    adds the row_number guard anyway (for corrupted dims).

    Physical plan: broadcast hash join on the equi key with the interval
    predicate as post-join filter — the scalable shape for a big fact vs a
    dimensional right side.
    """
    d = F.col(fact_date_col).cast("date")
    cond = (
        (facts[natural_key] == dim[natural_key])
        & (dim["start_date"] <= d)
        & (F.coalesce(dim["end_date"], F.lit("9999-12-31").cast("date")) >= d)
    )
    out = facts.join(F.broadcast(dim), cond, "left").select(
        *[facts[c] for c in facts.columns],
        *[dim[c] for c in select_cols],
        *([dim["start_date"].alias("__asof_start")] if defensive_unique else []),
    )
    if defensive_unique:
        w = Window.partitionBy(
            *[facts[c] for c in facts.columns]  # full-row identity
        ).orderBy(F.desc("__asof_start"))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__asof_start")
        )
    return out


# Largest bitmap shipped as a plan-literal array<long>: 2^18 bits = 4096
# longs = 32 KiB. Beyond that the literal would be serialized into every
# task binary, so the probe switches to a Spark broadcast variable read by
# a vectorized Arrow pandas_udf.
_BLOOM_LITERAL_MAX_BITS = 1 << 18
# Hard ceiling on the bitmap itself (2^30 bits = 128 MiB broadcast).
_BLOOM_MAX_BITS = 1 << 30


def _bloom_auto_bits(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two bitmap size ≈ ``bits_per_key``×|keys| (~1% FP at
    k=5), floored at 2^14 and capped at the broadcast ceiling."""
    target = max(1 << 14, n_keys * bits_per_key)
    bits = 1 << (target - 1).bit_length()  # next power of two
    return min(bits, _BLOOM_MAX_BITS)


def build_bloom_bitmap(
    keys: DataFrame, on: str, num_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Distributed Bloom-filter build over a key column: each key sets k
    bit positions ``xxhash64(key, i) mod num_bits``; positions are
    aggregated into 64-bit words with ``bit_or`` in ONE Spark job and only
    the ``num_bits/64``-long word list (8 KiB at the default) comes back
    to the driver — the same bounded-collect contract as the IVF
    centroids. The key set itself never leaves the cluster.
    """
    words = num_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(on), F.lit(i)), F.lit(num_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    packed = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # shiftleft() takes a literal shift amount only — expr form
            # accepts the column
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * words
    for r in packed:
        bitmap[int(r["w"])] = int(r["word"])
    return bitmap


def bloom_semi_join(
    facts: DataFrame,
    keys: DataFrame,
    on: str,
    num_bits: int | None = None,
    k: int = 5,
    bits_per_key: int = 10,
) -> DataFrame:
    """J1 at fact scale: semi join with an explicit Bloom-filter
    pre-filter — the manual form of Spark's runtime row-level filtering,
    for when the key side is too big to broadcast but its Bloom bitmap
    is not.

    ``num_bits=None`` (default) sizes the bitmap from a cheap
    ``keys.count()`` as ~``bits_per_key``×|keys| rounded up to a power
    of two (~1% false positives at k=5) — a fixed ``num_bits`` silently
    saturates when the key side grows (at ~1 bit/key the prefilter
    passes everything and becomes a no-op; results stay correct via the
    trailing exact semi join, but the shuffle saving vanishes).

    Probe path by bitmap size:

    - ≤ 32 KiB (2^18 bits): pure JVM column expressions against a
      literal ``array<long>`` (``element_at`` + ``getbit``) — the fact
      table is pre-filtered INSIDE its scan stage under whole-stage
      codegen.
    - larger (up to 2^30 bits = 128 MiB): the bitmap ships as a Spark
      BROADCAST variable probed by a vectorized Arrow ``pandas_udf``
      (the k positions are still computed JVM-side with xxhash64 so
      both paths test identical bits). A plan literal at this size
      would be serialized into every task binary.

    Either way the exact semi join removes all Bloom false positives, so
    the result is bit-identical to a plain semi join (the oracle), just
    with ~|selectivity| of the shuffle volume.

    At 100 TB: bitmap build is one job over the key side; the bitmap
    broadcast is O(num_bits); the fact side reads once and shuffles only
    surviving rows.
    """
    if num_bits is None:
        num_bits = _bloom_auto_bits(keys.count(), bits_per_key=bits_per_key)
    if num_bits > _BLOOM_MAX_BITS:
        raise ValueError(
            f"num_bits={num_bits} exceeds the {_BLOOM_MAX_BITS}-bit "
            "(128 MiB) broadcast ceiling — a bitmap this size should be "
            "a runtime-filter rewrite, not a driver-built Bloom filter"
        )
    bitmap = build_bloom_bitmap(keys, on, num_bits=num_bits, k=k)

    pos_cols = [
        F.pmod(F.xxhash64(F.col(on), F.lit(i)), F.lit(num_bits))
        for i in range(k)
    ]
    if num_bits <= _BLOOM_LITERAL_MAX_BITS:
        lit_words = F.array(*[F.lit(w).cast("long") for w in bitmap])
        tmp = facts
        probe_cols = []
        conds = []
        for i, pos in enumerate(pos_cols):
            # getbit's position arg accepts a column only in SQL-expr
            # form, so stage word/bit-index as temp columns
            wc, bc = f"__bloom_w{i}", f"__bloom_b{i}"
            tmp = tmp.withColumn(
                wc, F.element_at(lit_words, (pos / 64).cast("int") + 1)
            ).withColumn(bc, (pos % 64).cast("int"))
            probe_cols += [wc, bc]
            conds.append(F.expr(f"getbit({wc}, {bc})") == 1)
        might_contain = conds[0]
        for c in conds[1:]:
            might_contain = might_contain & c
        candidates = tmp.where(might_contain).drop(*probe_cols)
    else:
        # Spark delivers the bitmap words as SIGNED 64-bit longs (bit 63
        # set => negative). Reinterpret the bits explicitly: np.array(...,
        # dtype=np.uint64) on negative ints is deprecated on NumPy 1.26
        # and raises OverflowError on NumPy >= 2.0.
        bc_bitmap = facts.sparkSession.sparkContext.broadcast(
            np.array(bitmap, dtype=np.int64).view(np.uint64)
        )

        @F.pandas_udf("boolean")
        def _might_contain(pos: pd.Series) -> pd.Series:
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            words = bc_bitmap.value
            mat = np.vstack(pos.to_numpy())  # batch × k positions
            w = words[mat >> 6]
            hit = (w >> (mat & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        candidates = (
            facts.withColumn("__bloom_pos", F.array(*pos_cols))
            .where(_might_contain(F.col("__bloom_pos")))
            .drop("__bloom_pos")
        )
    return candidates.join(keys.select(on).distinct(), on, "left_semi")


def asof_merge_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """J3 at fact-×-fact scale: fanout-free as-of join via a merged
    timeline + carry-forward window.

    Same semantics as the candidate-join form of J3 (reference
    ETL/etl.py:326-352): each left row is matched to the right row with
    the greatest ``(right_ts, *payload_cols)`` such that
    ``right_ts <= left_ts`` on the same key. Ties at equal ``right_ts``
    resolve to the lexicographically greatest payload (= the
    ``ORDER BY ts DESC, key DESC LIMIT 1`` tie-break).

    Why a second physical strategy: the candidate-join form materializes
    |left| × (avg right rows per key before each left ts) intermediate
    rows before its argmax — the round-7 SCALEBENCH decomposition
    measured 10× fanout (30.0M joined rows for 3.0M outputs at ×30).
    Fine while the right side is dimension-sized and broadcastable;
    at fact×fact scale the fanout term dominates. This form instead:

    1. tags both inputs and unions them into one timeline
       (zero-shuffle, column-pruned to key + ts + payload);
    2. ONE hash exchange on the key + per-partition sort by
       ``(ts, side, payload)`` — right rows sort before left rows at
       equal ts, so an order ON the left row's date is visible to it
       (inclusive bound);
    3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
       rows frame carries the latest right payload forward into every
       left row.

    Cost is shuffle+sort of |left|+|right| rows — independent of match
    fanout — and the sort run length is bounded by the largest single
    key's row count, not the corpus. ``how='left'`` keeps left rows with
    no preceding right row (null payload); ``'inner'`` drops them,
    matching the candidate-join form.
    """
    key = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in key]
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"payload columns collide with left columns: {sorted(clash)} "
            "— alias one side before joining"
        )
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
    )
    payload_type = right.select(payload.alias("__p")).schema["__p"].dataType
    r = right.select(
        *key,
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        payload.alias("__p"),
    )
    l = left.select(
        *key,
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        F.lit(None).cast(payload_type).alias("__p"),
    )
    w = (
        Window.partitionBy(*key)
        .orderBy("__t", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "__carry", F.last("__p", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__carry").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *key,
        *lcols,
        *[F.col(f"__carry.{c}").alias(c) for c in payload_cols],
    )


def asof_merge_join_skewed(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Skew-safe ``asof_merge_join``: identical semantics, hot keys split
    across partitions.

    The plain merge strategy partitions by key, so one key's ENTIRE
    timeline lands in one task — a key with 100M events becomes a
    straggler. This variant windows by (key, time-bucket) instead:

    1. phase 1 — carry-forward WITHIN each (key, bucket): the data-sized
       exchange is keyed by (key, bucket), so a hot key spreads over
       timeline/bucket_seconds tasks;
    2. phase 2 — per (key, bucket) the bucket's LAST right payload is a
       ``max(__p)`` (same ordering as the timeline: __p starts with
       right_ts), aggregated WITHOUT a new exchange (grouping keys ==
       partitioning keys); the cross-bucket prefix carry is a window
       over bucket-level rows — |keys|×|buckets| rows, not data-sized;
    3. left rows with no in-bucket predecessor coalesce to the previous
       buckets' carry, joined back on (key, bucket).

    Total data-sized exchanges: ONE (phase 1), same as the plain form —
    plus two bucket-level (tiny) exchanges. Choose ``bucket_seconds`` ~
    hot-key-rows-per-day >> task size; any value is correct, it only
    moves the split granularity (pinned by the equivalence test across
    bucket sizes, including degenerate 1-second buckets).
    """
    key = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in key]
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"payload columns collide with left columns: {sorted(clash)} "
            "— alias one side before joining"
        )
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
    )
    payload_type = right.select(payload.alias("__p")).schema["__p"].dataType
    r = right.select(
        *key,
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        payload.alias("__p"),
    )
    l = left.select(
        *key,
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        F.lit(None).cast(payload_type).alias("__p"),
    )
    merged = r.unionByName(l).withColumn(
        "__bkt",
        F.floor(F.unix_timestamp("__t") / F.lit(bucket_seconds)).cast("long"),
    )
    # phase 1: carry within (key, bucket) — THE data-sized exchange
    w_in = (
        Window.partitionBy(*key, "__bkt")
        .orderBy("__t", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = merged.withColumn(
        "__local", F.last("__p", ignorenulls=True).over(w_in)
    )
    # phase 2: bucket summaries (no new exchange: grouping keys ==
    # phase-1 partitioning) → per-key prefix over bucket-level rows
    bucket_last = staged.groupBy(*key, "__bkt").agg(
        F.max("__p").alias("__blast")
    )
    w_prefix = (
        Window.partitionBy(*key)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_carry = bucket_last.select(
        *key,
        "__bkt",
        F.last("__blast", ignorenulls=True).over(w_prefix).alias("__prev"),
    )
    out = (
        staged.where(F.col("__side") == 1)
        .join(prev_carry, [*key, "__bkt"], "left")
        .withColumn("__carry", F.coalesce("__local", "__prev"))
    )
    if how == "inner":
        out = out.where(F.col("__carry").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *key,
        *lcols,
        *[F.col(f"__carry.{c}").alias(c) for c in payload_cols],
    )


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, descending: bool = True
) -> DataFrame:
    """O2: greatest-per-group (reference ``ORDER BY x DESC LIMIT 1`` per key,
    ETL/etl.py:285-291) via a row_number window."""
    order = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*key_cols).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_lo,
    left_hi,
    right_point,
    bucket_width_seconds: int,
    *,
    lo_open: bool = False,
    hi_open: bool = False,
) -> DataFrame:
    """Interval×point range join via time-bucket blocking (beyond-reference
    join family: the batch form of an interval join).

    Matches each left row to the right rows that share the ``on`` keys and
    whose ``right_point`` timestamp falls inside the left row's
    ``[left_lo, left_hi]`` interval (``lo_open``/``hi_open`` make either
    bound strict). All three bound arguments are TIMESTAMP_NTZ Columns —
    the epoch math is pure NTZ (``timestamp_diff``), so results are
    session-timezone independent.

    Scale shape: Spark plans a raw ``t1.ts BETWEEN t2.lo AND t2.hi``
    join as a broadcast-nested-loop / cartesian — quadratic and
    cluster-fatal at fact×fact scale. Here each right row is assigned ONE
    bucket (``floor(epoch/width)``) and each left interval explodes to its
    covered bucket ids (``sequence(lo_bucket, hi_bucket)`` — fan-out =
    interval/width + 1, bounded by the caller's width choice), turning the
    inequality join into a plain equi join on (keys, bucket) that
    hash-partitions, AQE-skew-splits, and map-side prunes like any other;
    the exact bound predicate then filters within buckets. Each matching
    (left, right) pair meets in exactly one bucket (the right row's), so
    no post-join dedup is needed. Inner semantics; compose a left join at
    the call site to keep unmatched left rows (see
    ``repeat_purchases_within_90d``).
    """
    width_s = int(bucket_width_seconds)
    if width_s <= 0:
        raise ValueError(
            f"bucket_width_seconds must be positive, got {width_s}"
        )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def _bucket(col):
        # second-granularity epoch keeps the arithmetic inside double's
        # exact-integer range for ~280k years; floor(sec/width) is
        # consistent between a point and its covering interval bounds, so
        # sub-second points only ever over-generate candidates (the exact
        # predicate below filters them), never miss one
        return F.floor(
            F.timestamp_diff("SECOND", epoch, col) / F.lit(width_s)
        ).cast("long")

    l = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(left_lo), _bucket(left_hi))),
    )
    r = right.withColumn("__bucket", _bucket(right_point))
    lo_ok = right_point > left_lo if lo_open else right_point >= left_lo
    hi_ok = right_point < left_hi if hi_open else right_point <= left_hi
    return l.join(r, [*on, "__bucket"]).where(lo_ok & hi_ok).drop("__bucket")


def fuzzy_match_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    block,
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution fuzzy join: match each left record to its best
    right record by edit distance, with a blocking key so the candidate
    space is per-block, never all-pairs.

    ``block`` is a Column→Column function deriving the blocking key from
    the text (e.g. a stable suffix, a phonetic code, a sorted-token
    prefix). Returns (left_id, right_id, distance) keeping, per left row,
    the candidate with the lexicographically smallest (distance,
    right_id) among those within ``max_distance``; left rows whose block
    contains no candidate within the threshold are absent (inner
    semantics — anti-join the result to list non-matches).

    Scale shape: one shuffle per side on the block key, then a hash join;
    Levenshtein runs JVM-side only WITHIN blocks, so cost is
    Σ |L_b|·|R_b| — the block function choice bounds the quadratic term
    exactly like an LSH bucket. The best-match reduction is a single
    struct-min groupBy (map-side combined), not a window sort. A hot
    block is AQE-skew-splittable because the join is a plain equi join.
    """
    l = left.select(
        F.col(left_id),
        F.col(left_text).alias("__lt"),
        block(F.col(left_text)).alias("__blk"),
    )
    r = right.select(
        F.col(right_id),
        F.col(right_text).alias("__rt"),
        block(F.col(right_text)).alias("__blk"),
    )
    cand = (
        l.join(r, "__blk")
        .withColumn("distance", F.levenshtein("__lt", "__rt"))
        .where(F.col("distance") <= max_distance)
    )
    best = cand.groupBy(left_id).agg(
        F.min(F.struct("distance", right_id)).alias("__m")
    )
    return best.select(
        left_id,
        F.col(f"__m.{right_id}").alias(right_id),
        F.col("__m.distance").alias("distance"),
    )
