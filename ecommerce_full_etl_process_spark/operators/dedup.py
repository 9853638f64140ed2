"""Deduplication operators for large-scale text corpora (BASELINE.json
north-star extension: exact, MinHash+LSH, SimHash, n-gram Jaccard).

All hot-path logic is JVM-side column expressions (md5 / conv / bit ops /
higher-order array functions) — no Python UDFs — so every operator scales as
a normal shuffle/aggregate job:

- exact dedup       : one hash-groupBy (map-side partial agg).
- n-gram Jaccard    : per-row shingle arrays + array intersection math.
- MinHash + LSH     : per-row signature (narrow) → explode bands →
                      groupBy band bucket (the only shuffle) → in-bucket
                      pairs → exact-Jaccard verify. At 100 TB the band
                      shuffle is the cost; bucket skew is bounded because
                      identical-signature docs collapse to distinct pairs
                      per bucket, and AQE splits hot buckets.
- SimHash           : per-row 60-bit fingerprint via bitwise vote of token
                      hashes; near-dup = small Hamming distance.

Cross-engine determinism: the base token/shingle hash is the first 8 (or 15)
hex chars of md5, parsed as an integer — identical in Spark (``conv``) and
DuckDB (``('0x'||…)::BIGINT``), which makes every operator here
oracle-checkable. MinHash permutation constants are generated from a fixed
seed and shared with the SQL oracle builder.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared deterministic constants (also consumed by the DuckDB oracle builder)
# ---------------------------------------------------------------------------

MINHASH_PRIME = 4294967311  # smallest prime > 2^32
NUM_HASHES = 32
ROWS_PER_BAND = 4  # → 8 bands
_rng = random.Random(0x5EED)
# A is capped at 2^30 so a*h (h < 2^32) stays below 2^62 — no 64-bit
# overflow in either Spark (silent wrap) or DuckDB (hard error).
MINHASH_A = tuple(_rng.randrange(1, 2 ** 30) for _ in range(NUM_HASHES))
MINHASH_B = tuple(_rng.randrange(0, MINHASH_PRIME) for _ in range(NUM_HASHES))

SIMHASH_BITS = 60  # 15 hex chars of md5 → stays inside a signed 64-bit long


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side).

    NB ``sequence(1, 0)`` in Spark yields a DESCENDING [1, 0], so texts with
    fewer than n words need an explicit empty-array guard."""
    words = F.split(text, " ")
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, F.lit(n))))
    )


def hash32(c: Column) -> Column:
    """First 8 md5 hex chars as an unsigned 32-bit value in a long —
    bit-identical to DuckDB ``('0x'||substr(md5(x),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash60(c: Column) -> Column:
    """First 15 md5 hex chars (60 bits) as a positive long."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signature(shingle_hashes: Column) -> Column:
    """MinHash signature: for each permutation i, min((a_i*h + b_i) mod P)
    over the document's shingle hashes. Empty docs → NULL signature."""
    def _perm(a: int, b: int):
        # real closure: PySpark infers lambda arity from the Python
        # signature, so default-arg captures would break it
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    parts = [
        F.array_min(F.transform(shingle_hashes, _perm(a, b)))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return F.when(F.size(shingle_hashes) > 0, F.array(*parts))


def lsh_band_hashes(signature: Column) -> Column:
    """Banded LSH keys: md5 of each ROWS_PER_BAND-slice of the signature."""
    n_bands = NUM_HASHES // ROWS_PER_BAND
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, band * ROWS_PER_BAND + r + 1).cast(
                            "string"
                        )
                        for r in range(ROWS_PER_BAND)
                    ],
                )
            )
            for band in range(n_bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


def hamming60(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (text_hash, n_docs, keep_id).
    One hash-groupBy; at scale this is the cheapest dedup pass and runs
    first to shrink the corpus before near-dup passes."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + banded LSH, verified
    with exact Jaccard: (id_a, id_b, jaccard_sim). Pairs are emitted once
    (id_a < id_b) regardless of how many bands collide."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("sh_hashes", F.transform(F.col("shingles"), lambda s: hash32(s)))
    sigs = base.withColumn("sig", minhash_signature(F.col("sh_hashes"))).where(
        F.col("sig").isNotNull()
    )
    banded = sigs.select(
        "doc_id",
        "shingles",
        F.posexplode(lsh_band_hashes(F.col("sig"))).alias("band", "band_hash"),
    )
    left = banded.select(
        F.col("band"),
        F.col("band_hash"),
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
    )
    right = banded.select(
        F.col("band"),
        F.col("band_hash"),
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard_sim") >= min_jaccard)
        .select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )


def ngram_jaccard_pairs(
    pairs: DataFrame, text_a: str, text_b: str, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for pre-paired rows (candidate verification)."""
    return pairs.withColumn(
        "jaccard_sim",
        F.round(
            jaccard(
                word_shingles(F.col(text_a), n), word_shingles(F.col(text_b), n)
            ),
            6,
        ),
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document SimHash fingerprint over distinct word tokens.

    Each token hashes to SIMHASH_BITS bits; every bit position gets a +1/-1
    vote per token; the fingerprint sets bits whose vote is positive
    (``2*ones > n`` — a tie votes negative). Shape: explode tokens → one
    hash-aggregate per doc with per-bit conditional sums (map-side partial
    aggregation keeps the shuffle at one row per doc)."""
    tokens = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h", hash60(F.col("tok")))
    aggs = [
        F.sum((F.shiftright(F.col("h"), b) % 2 == 1).cast("long")).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ] + [F.count(F.lit(1)).alias("n")]
    per_doc = tokens.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fp = fp + F.when(
            F.col(f"s{b}") * 2 > F.col("n"), F.lit(2 ** b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs among consecutive ids by SimHash Hamming distance —
    the verification shape; at scale candidates come from banding the
    fingerprint bits exactly like MinHash-LSH."""
    fps = simhash_fingerprints(df, id_col, text_col)
    a = fps.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = fps.select(
        (F.col(id_col) - 1).alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sh_b"),
    )
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            "id_b",
            hamming60(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
