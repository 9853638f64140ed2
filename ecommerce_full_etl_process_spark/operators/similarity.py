"""Similarity search over embedding columns (BASELINE.json north-star
extension): brute-force cosine top-k as the exact baseline, and a
sign-bit-bucketed (LSH/IVF-style) variant as the scale path.

Two scoring kernels, same semantics:

- ``cosine`` — JVM higher-order functions (``zip_with`` + ``aggregate``),
  a strictly sequential left fold. Spark evaluates HOF lambdas
  *interpreted* (no codegen), so this is the oracle-determinism
  reference, not the fast path. k-means assignment stays on it because
  the argmin over unrounded distances must be bit-reproducible.
- ``cosine_np`` / ``cosine_to_query_np`` — Arrow ``pandas_udf`` numpy
  kernels, the compute-bound scale path. Measured on local[32],
  512k × 64-dim float vectors, single-query scoring pass:
  HOF 1.26 s vs numpy 0.65 s (≈2.0×); at 128k vectors 0.80 s vs 0.49 s
  (1.62×). Both kernels agree after the catalog-standard ``round(·, 6)``
  (asserted in tests/test_similarity_kernels.py), which is the same
  tolerance that already absorbs DuckDB's different fold order in the
  oracle gate.

At 100 TB the brute-force pass is a full scan per query (fine for batch
scoring); the bucketed variant prunes to one bucket (≈1/2^BUCKET_BITS of
the corpus) at the cost of recall, the standard ANN trade.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

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


def cosine_np(a: Column, b: Column) -> Column:
    """Row-wise cosine via an Arrow ``pandas_udf`` numpy kernel — the
    compute-bound scale path (see module docstring for measured numbers).
    The kernel body is a self-contained closure (imports inside) so
    executors never need this package on sys.path."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _k(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        ma = np.array(list(va), dtype=np.float64)
        mb = np.array(list(vb), dtype=np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return _k(a, b)


def cosine_to_query_np(query_vec: Sequence[float]) -> Column:
    """Cosine of each row's vector against one fixed query vector,
    captured driver-side — avoids shipping a per-row copy of the query
    through Arrow (64 extra doubles/row on a broadcast-join q column)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    qv = [float(x) for x in query_vec]

    @F.pandas_udf(DoubleType())
    def _k(va: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        q = np.array(qv, dtype=np.float64)
        ma = np.array(list(va), dtype=np.float64)
        return pd.Series(
            (ma @ q) / (np.linalg.norm(ma, axis=1) * np.linalg.norm(q))
        )

    return _k


def _query_vector(query: DataFrame) -> list[float]:
    """Collect the single-row query frame's ``q`` vector (a scalar-sized
    driver read, same class as max-id lookups)."""
    return [float(x) for x in query.select("q").first()[0]]


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
    kernel: str = "numpy",
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a single-row ``query``
    DataFrame with a ``q`` array column. Returns (vec_id, cos_sim) with a
    deterministic id tie-break. ``kernel="numpy"`` (default) scores with
    the Arrow kernel; ``"hof"`` keeps the interpreted JVM fold. Ordering
    happens on the 6-dp-rounded score either way, so the two kernels
    return identical rows."""
    if kernel == "numpy":
        score = cosine_to_query_np(_query_vector(query))(F.col(vec_col))
        scored = embeddings.select(
            F.col(id_col), F.round(score, 6).alias("cos_sim")
        )
    else:
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
    kernel: str = "numpy",
) -> DataFrame:
    """ANN top-k probing only the query's sign-bit bucket (plus exact
    rescoring inside the bucket). Recall < 1 by design; the bucket filter
    happens before any pairwise math, so the scan prunes to ~1/256.
    Measured recall contract (tests/test_similarity_kernels.py): on a
    planted-neighbor fixture recall@10 ≥ 0.9 vs brute_force_topk."""
    if kernel == "numpy":
        qvec = _query_vector(query)
        qb = sum(2 ** j for j in range(BUCKET_BITS) if qvec[j] > 0)
        in_bucket = embeddings.where(
            sign_bucket(_to_double(F.col(vec_col))) == F.lit(qb)
        )
        score = cosine_to_query_np(qvec)(F.col(vec_col))
        return (
            in_bucket.select(
                F.col(id_col), F.round(score, 6).alias("cos_sim")
            )
            .orderBy(F.desc("cos_sim"), F.asc(id_col))
            .limit(k)
        )
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


def ivf_defaults(n_rows: int) -> tuple[int, int]:
    """Recall-targeted IVF sizing: ``(n_cells, nprobe)`` for a corpus of
    ``n_rows`` vectors.

    - ``n_cells = max(16, round(sqrt(N)))`` — the classic IVF heuristic:
      cell population ~sqrt(N) balances the centroid-ranking cost
      (O(n_cells)) against the cell-rescore cost (O(N/n_cells · nprobe)).
    - ``nprobe = ceil(n_cells / 2)`` — sized to hold **recall@10 ≥ 0.9 on
      the WORST-CASE corpus**: the SCALEBENCH embeddings are uniform in
      [-0.5, 0.5)^64, where neighbor structure is weakest and IVF prunes
      worst. Measured on that corpus at N=30k (numpy replica of this
      Lloyd's loop, 100 queries, 3 seeds): 50% probe → recall@10
      0.93–0.95; 40% → 0.89–0.91 (below target on one seed); 25% → 0.83.
      The old defaults (k=16, nprobe=1) measured 0.28 (SCALEBENCH
      §ivf_refresh, round 11) — correct per the all-cell contract but
      unusable ANN quality for a user who never touches the knobs.
      Clustered real-world embedding corpora reach the same recall at a
      far smaller probe fraction; these defaults are the safe floor, and
      ``nprobe`` stays the explicit cost/recall knob.
    """
    import math

    n_cells = max(16, int(round(math.sqrt(max(1, n_rows)))))
    return n_cells, (n_cells + 1) // 2


def kmeans_lite(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means over an embedding column — the
    centroid-training path for IVF-style ANN.

    - init: the k vectors with the lowest ``xxhash64(id)`` — a
      DETERMINISTIC uniform sample of the corpus (reproducible, and
      distribution-proportional: re-training over a corpus whose append
      half drifted seeds BOTH regions ∝ their mass, so the re-train
      actually re-balances the cells — the k-lowest-ID init this
      replaces seeded only the oldest data's region and left a drifted
      cloud collapsed into one cell, measured in SCALEBENCH
      §ivf_refresh round 11)
    - assign (``kernel="numpy"``, default): centroids live DRIVER-SIDE
      between rounds (see ``_kmeans_numpy_loop``) and are captured in an
      Arrow ``pandas_udf`` that returns the nearest cid per row directly —
      ONE map pass over the corpus and ONE Spark job per Lloyd round, no
      N×k crossJoin, no argmin shuffle, no join back, no per-round
      checkpoint. ``np.argmin`` takes the first index on exact ties, which
      with cid-ordered centroids matches the HOF path's
      min(struct(dist, cid)) tie-break.
    - assign (``kernel="hof"``): broadcast centroids, interpreted
      ``zip_with`` fold for squared L2, min(struct(dist, cid)) groupBy —
      the oracle-determinism reference shape.
    - update: elementwise mean via posexplode → (cluster, dim) avg →
      ordered reassembly (stays distributed — the only big shuffle per
      iteration, and it's skinny (cid, pos, x) rows).

    Returns (centroids(cid, cv), assignments(id, cid)). Scale shape: the
    full vectors shuffle ONCE (the initial hash-partition by id, cached);
    every iteration then moves only skinny rows.

    ``k=None`` (the default since round 12) sizes the index via
    :func:`ivf_defaults` — ``max(16, round(sqrt(N)))`` cells, costing one
    count() job up front. Pass an explicit ``k`` to pin the layout (every
    oracle-graded catalog entry does, so its grid is reproducible).
    """
    from pyspark.sql.window import Window

    v = embeddings.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    )
    if k is None:
        k, _ = ivf_defaults(v.count())
    # reused by every iteration below; no eager count — the cache fills
    # on the first Lloyd round's path (one fewer fixed job per training)
    pts = v.repartition("id").cache()
    w = Window.orderBy("init_id")
    centroids = (
        # hash-spread seed sample; id tie-break keeps the order total
        v.orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(k)
        .select(F.col("id").alias("init_id"), F.col("v").alias("cv"))
        .withColumn("cid", F.row_number().over(w) - 1)
        .select("cid", "cv")
    )

    if kernel == "numpy":
        return _kmeans_numpy_loop(pts, centroids, iters, k)

    def _assign_hof(points: DataFrame, cents: DataFrame) -> DataFrame:
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
        assigned = _assign_hof(pts, centroids)
        new_c = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv_new")
            )
        )
        centroids = (
            # a cluster that lost all members keeps its previous centroid
            # (it may re-acquire points later) — same rule as the numpy
            # loop, keeping the two kernels assignment-identical even when
            # a cluster empties mid-training
            centroids.select("cid", F.col("cv").alias("cv_prev"))
            .join(new_c, "cid", "left")
            .select("cid", F.coalesce("cv_new", "cv_prev").alias("cv"))
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


def _kmeans_numpy_loop(
    pts: DataFrame, init_centroids: DataFrame, iters: int, k: int
) -> tuple[DataFrame, DataFrame]:
    """Lloyd iterations with DRIVER-RESIDENT centroids (numpy kernel).

    The Arrow assignment kernel must collect the k centroids every round
    anyway (they're captured in the pandas_udf closure), so keeping them
    as a driver-side list between rounds removes the per-iteration
    localCheckpoint job AND the per-iteration re-collect — ONE Spark job
    per Lloyd round (the centroid-update aggregate) instead of two.
    Centroid state is k×d doubles (even 4096×1024 ≈ 32 MB), the same
    payload the closure already shipped per round; the full corpus never
    leaves the cluster. Numerics are identical to the DataFrame loop:
    the update is the same Spark avg aggregate, merely collected."""
    import pandas as pd
    from pyspark.sql.types import LongType

    spark = pts.sparkSession
    cmat = [
        [float(x) for x in r["cv"]]
        for r in init_centroids.orderBy("cid").collect()
    ]

    def _nearest_udf(cmat_now: list[list[float]]):
        @F.pandas_udf(LongType())
        def _nearest(vec: pd.Series) -> pd.Series:
            import numpy as np
            import pandas as pd

            if len(vec) == 0:
                return pd.Series([], dtype="int64")
            m = np.array(list(vec), dtype=np.float64)
            c = np.array(cmat_now, dtype=np.float64)
            # N×k distance matrix without materializing N×k×d: the (m·m)
            # term is constant per row — drop it, argmin unchanged; argmin
            # takes the first index on exact ties = lowest cid, matching
            # the HOF path's min(struct(dist, cid)) tie-break
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
            return pd.Series(d2.argmin(axis=1).astype("int64"))

        return _nearest

    assigned = None
    for _ in range(iters):
        assigned = pts.withColumn("cid", _nearest_udf(cmat)(F.col("v")))
        rows = (
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
            .collect()  # k tiny rows — the round's ONE job
        )
        new_cmat: list[list[float] | None] = [None] * k
        for r in rows:
            new_cmat[int(r["cid"])] = [float(x) for x in r["cv"]]
        # a cluster that lost all members keeps its previous centroid
        cmat = [nc if nc is not None else old for nc, old in zip(new_cmat, cmat)]

    out_assign = assigned.select("id", "cid").localCheckpoint(eager=True)
    pts.unpersist()
    centroids = spark.createDataFrame(
        [(cid, cv) for cid, cv in enumerate(cmat)], "cid int, cv array<double>"
    )
    return centroids, out_assign


def assign_to_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
) -> DataFrame:
    """Assign vectors to FROZEN centroids — the incremental IVF index
    maintenance path: new embeddings arriving after training join the
    index via one nearest-centroid map pass (O(batch × k), one Spark
    job), never a re-clustering of the corpus. Same kernels and the
    same lowest-cid tie-break as training (``kmeans_lite``), so an
    appended vector lands exactly where training would have put it.
    Returns ``(id, cid)`` rows, union-able with the training
    assignments for :func:`ivf_topk`.

    Refresh policy (measured, SCALEBENCH §ivf_refresh): correctness
    never forces a re-train — the all-cell probe equals brute force at
    any index size, and for appends drawn from the trained distribution
    partial-probe recall stays FLAT as the index grows to 2× training
    size (re-training buys nothing outside noise). What forces a
    re-train is DISTRIBUTION DRIFT, and its symptom is cell imbalance,
    not recall: a shifted append cloud collapses into the one nearest
    frozen cell (measured max-cell fraction 0.51 of the corpus after a
    same-size drifted append vs 0.09 after a re-train), so nprobe=1
    degenerates toward a brute-force scan. Monitor
    ``max(cell size) / corpus size`` on the maintained assignments —
    one state-sized groupBy — and re-train when it drifts well past
    ~2/k; between re-trains this function is the whole maintenance
    cost."""
    v = embeddings.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    )
    if kernel == "numpy":
        import pandas as pd
        from pyspark.sql.types import LongType

        # collect (cid, vector) pairs and map argmin POSITIONS back to the
        # real cids: kmeans_lite emits contiguous 0..k-1, but a filtered or
        # user-supplied centroids frame need not, and the positional index
        # would silently mislabel every assignment (the HOF branch below
        # always returned real cids — the two kernels must agree)
        rows = centroids.orderBy("cid").collect()
        cids = [int(r["cid"]) for r in rows]
        cmat = [[float(x) for x in r["cv"]] for r in rows]

        @F.pandas_udf(LongType())
        def _nearest(vec: pd.Series) -> pd.Series:
            import numpy as np

            if len(vec) == 0:
                return pd.Series([], dtype="int64")
            m = np.array(list(vec), dtype=np.float64)
            c = np.array(cmat, dtype=np.float64)
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
            pos = d2.argmin(axis=1)
            return pd.Series(np.array(cids, dtype="int64")[pos])

        return v.select("id", _nearest(F.col("v")).alias("cid"))
    dist2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "id", F.struct(dist2.alias("d"), F.col("cid").alias("cid")).alias("s")
    )
    return (
        scored.groupBy("id")
        .agg(F.min("s").alias("best"))
        .select("id", F.col("best.cid").alias("cid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int | None = None,
    kernel: str = "numpy",
) -> DataFrame:
    """IVF multi-probe ANN: rank the query's ``nprobe`` nearest centroids,
    rescore only those cells' vectors exactly. Standard recall/cost trade —
    nprobe=1 is fastest, nprobe=n_cells degenerates to exact brute force.
    ``nprobe=None`` (the default since round 12) probes ceil(n_cells/2) —
    the :func:`ivf_defaults` sizing measured at recall@10 ≥ 0.9 on the
    worst-case (uniform) SCALEBENCH corpus; the old default of 1 measured
    0.28 there. Scale shape is unchanged by nprobe: centroids stay
    broadcast, the cell prune is a broadcast semi-style join, and only the
    probed fraction of the corpus is rescored. The centroid ranking (k
    tiny rows) stays on the HOF fold; only the corpus rescore uses the
    Arrow kernel."""
    if nprobe is None:
        nprobe = (centroids.count() + 1) // 2
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
    score = (
        cosine_np(F.col(vec_col), F.col("q"))
        if kernel == "numpy"
        else cosine(F.col(vec_col), F.col("q"))
    )
    return (
        in_cell.select(
            F.col(id_col),
            F.round(score, 6).alias("cos_sim"),
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
    kernel: str = "numpy",
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
    score = (
        cosine_np(F.col("va"), F.col("vb"))
        if kernel == "numpy"
        else cosine(F.col("va"), F.col("vb"))
    )
    return (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "g",
            "id_a",
            "id_b",
            F.round(score, 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
