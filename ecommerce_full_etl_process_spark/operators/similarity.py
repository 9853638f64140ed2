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


def kmeans_lite(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means over an embedding column, pure
    DataFrame ops — the centroid-training path for IVF-style ANN.

    - init: the k lowest-id vectors (deterministic, reproducible)
    - assign: broadcast centroids, nearest by squared L2 with a
      min(struct(dist, cid)) tie-break (no nondeterministic min_by ties)
    - update: elementwise mean via posexplode → (cluster, dim) avg →
      ordered reassembly

    Returns (centroids(cid, cv), assignments(id, cid)). Scale shape: the
    full vectors shuffle ONCE (the initial hash-partition by id, cached);
    every iteration then shuffles only skinny (id, dist, cid) rows for the
    argmin, and the id-keyed join back to the vectors reuses the cached
    partitioning — no per-iteration reshuffle of the embedding payload and
    no array-valued group keys.
    """
    from pyspark.sql.window import Window

    v = embeddings.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    )
    pts = v.repartition("id").cache()  # co-partitioned with the argmin below
    pts.count()
    w = Window.orderBy("init_id")
    centroids = (
        v.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("init_id"), F.col("v").alias("cv"))
        .withColumn("cid", F.row_number().over(w) - 1)
        .select("cid", "cv")
    )

    def _assign(points: DataFrame, cents: DataFrame) -> DataFrame:
        dist2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = points.crossJoin(F.broadcast(cents)).select(
            "id", F.struct(dist2.alias("d"), F.col("cid").alias("cid")).alias("s")
        )
        best = scored.groupBy("id").agg(F.min("s").alias("best"))
        return points.join(best, "id").select(
            "id", "v", F.col("best.cid").alias("cid")
        )

    assigned = None
    for _ in range(iters):
        assigned = _assign(pts, centroids)
        centroids = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            # k tiny rows, but the LINEAGE doubles per Lloyd round —
            # truncate it so iters stay O(1) plan depth (same driver-heap
            # hazard as connected_components)
            .localCheckpoint(eager=True)
        )
    # checkpoint the skinny assignment and release the cached corpus —
    # otherwise every kmeans invocation pins a full embedding copy
    out_assign = assigned.select("id", "cid").localCheckpoint(eager=True)
    pts.unpersist()
    return centroids, out_assign


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF multi-probe ANN: rank the query's ``nprobe`` nearest centroids,
    rescore only those cells' vectors exactly. Standard recall/cost trade —
    nprobe=1 is fastest, nprobe=n_cells degenerates to exact brute force.
    Scale shape is unchanged by nprobe: centroids stay broadcast, the cell
    prune is a broadcast semi-style join, and only the probed fraction of
    the corpus is rescored."""
    dist2 = F.aggregate(
        F.zip_with(F.col("q"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = query.crossJoin(F.broadcast(centroids)).select(
        "q", F.struct(dist2.alias("d"), F.col("cid").alias("cid")).alias("s")
    )
    qcell = (
        scored.groupBy("q")
        .agg(F.slice(F.array_sort(F.collect_list("s")), 1, nprobe).alias("probes"))
        .select("q", F.explode("probes").alias("p"))
        .select("q", F.col("p.cid").alias("cid"))
    )
    cell_members = embeddings.join(
        assignments.withColumnRenamed("id", id_col), id_col
    )
    in_cell = cell_members.join(F.broadcast(qcell), "cid")
    return (
        in_cell.select(
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
