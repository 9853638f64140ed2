"""Similarity search over embedding columns (BASELINE.json north-star
extension): brute-force cosine top-k as the exact baseline, and a
sign-bit-bucketed (LSH/IVF-style) variant as the scale path.

All math is JVM-side higher-order array functions in double precision —
``zip_with`` + ``aggregate`` for the dot product — so the scan is one
whole-stage-codegen pass, no Python. At 100 TB the brute-force pass is a
full scan per query (fine for batch scoring); the bucketed variant prunes
to one bucket (≈1/2^BUCKET_BITS of the corpus) at the cost of recall, the
standard ANN trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_BITS = 8  # sign-bit bucket over the first 8 dimensions → 256 buckets


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order → oracle-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    da, db = _to_double(a), _to_double(b)
    return dot(da, db) / (l2_norm(da) * l2_norm(db))


def sign_bucket(a: Column, bits: int = BUCKET_BITS) -> Column:
    """IVF-style bucket id: sign bits of the first ``bits`` components."""
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(
            F.element_at(a, j + 1) > 0, F.lit(2 ** j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a single-row ``query``
    DataFrame with a ``q`` array column. Returns (vec_id, cos_sim) with a
    deterministic id tie-break."""
    scored = embeddings.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def bucketed_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the query's sign-bit bucket (plus exact
    rescoring inside the bucket). Recall < 1 by design; the bucket filter
    happens before any pairwise math, so the scan prunes to ~1/256."""
    emb = embeddings.withColumn("__bucket", sign_bucket(_to_double(F.col(vec_col))))
    q = query.withColumn("__qbucket", sign_bucket(_to_double(F.col("q"))))
    in_bucket = emb.crossJoin(F.broadcast(q)).where(
        F.col("__bucket") == F.col("__qbucket")
    )
    return (
        in_bucket.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    group_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking group
    (id_a < id_b, cos >= threshold). The group column bounds the quadratic
    blow-up — at scale the group is an LSH bucket or IVF cell, here any
    low-cardinality column (e.g. label)."""
    a = embeddings.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = embeddings.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    return (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "g",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
