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


def brute_force_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for a whole BATCH of queries in one plan
    (round 13): ``queries`` is (query_id, q array<double>), broadcast
    against the corpus, per-query top-k via a row_number window over the
    6-dp-rounded score with the same id tie-break as
    :func:`brute_force_topk`. At scale this is the right serving shape —
    per-query driver loops pay fixed job overhead per query, while the
    batch plan scans the corpus ONCE for all queries (the scan dominates
    at 100 TB; the window shuffles only n_queries × |corpus| scored
    rows, and the query set is the small side by construction)."""
    from pyspark.sql.window import Window

    scored = embeddings.crossJoin(
        F.broadcast(queries.select(qid_col, "q"))
    ).select(
        qid_col,
        F.col(id_col),
        F.round(
            cosine_np(F.col(vec_col), F.col("q")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """IVF multi-probe ANN for a BATCH of queries in one plan (round 13):
    per query, rank centroids (broadcast — k tiny rows), probe the
    ``nprobe`` nearest cells, rescore exactly only those cells' vectors,
    per-query top-k via a row_number window. Same semantics per query as
    :func:`ivf_topk` (``nprobe=None`` defaults to ceil(n_cells/2) via the
    :func:`ivf_defaults` sizing); one job for the whole query set instead
    of one per query. Scale shape: the corpus is touched once, pruned to
    the union of probed cells BEFORE any pairwise math; only (query ×
    probed-cell-member) rows are scored."""
    from pyspark.sql.window import Window

    if nprobe is None:
        nprobe = (centroids.count() + 1) // 2
    dist2 = F.aggregate(
        F.zip_with(F.col("q"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qcell = (
        queries.select(qid_col, "q")
        .crossJoin(F.broadcast(centroids))
        .select(
            qid_col,
            "q",
            F.struct(dist2.alias("d"), F.col("cid").alias("cid")).alias("s"),
        )
        .groupBy(qid_col)
        .agg(
            F.first("q").alias("q"),  # constant per query_id
            F.slice(F.array_sort(F.collect_list("s")), 1, nprobe).alias(
                "probes"
            ),
        )
        .select(qid_col, "q", F.explode("probes").alias("p"))
        .select(qid_col, "q", F.col("p.cid").alias("cid"))
    )
    cell_members = embeddings.join(
        assignments.withColumnRenamed("id", id_col), id_col
    )
    in_cell = cell_members.join(F.broadcast(qcell), "cid")
    scored = in_cell.select(
        qid_col,
        F.col(id_col),
        F.round(cosine_np(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


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


def ivf_defaults(n_rows: int, profile: str = "uniform") -> tuple[int, int]:
    """Recall-targeted IVF sizing: ``(n_cells, nprobe)`` for a corpus of
    ``n_rows`` vectors.

    ``profile="clustered"`` (round 13): when the corpus is KNOWN to have
    neighborhood structure — real embedding corpora almost always do —
    ``nprobe = ceil(0.15 · n_cells)``, the budget measured at recall@10
    0.99-1.0 on the planted-mixture SCALEBENCH §ivf_clustered corpus and
    pinned ≥ 0.9 by the graded ``similarity_topk_ivf_clustered`` entry.
    The default ``"uniform"`` profile keeps the distribution-free safe
    floor below (structure-free data is the worst case, where recall
    tracks the probed fraction and no training quality changes that).

    - ``n_cells = max(16, round(sqrt(N)))`` — the classic IVF heuristic:
      cell population ~sqrt(N) balances the centroid-ranking cost
      (O(n_cells)) against the cell-rescore cost (O(N/n_cells · nprobe)).
    - ``nprobe = ceil(n_cells / 2)`` — sized to hold **recall@10 ≥ 0.9 on
      the WORST-CASE corpus**: the SCALEBENCH embeddings are uniform in
      [-0.5, 0.5)^64, where neighbor structure is weakest and IVF prunes
      worst. Measured on that corpus at N=30k (numpy replica of this
      loop, 50 queries, 3 seeds, round-13 k-means|| init + iters=15):
      50% probe → recall@10 0.944–0.952 (up from 0.924 under the old
      hash init + 5 iters); 40% → 0.900–0.912 (no margin);
      15% → ~0.67. On structure-free data recall tracks the probed
      fraction — no init quality changes that — so the uniform floor
      stays at half the cells. The old defaults (k=16, nprobe=1)
      measured 0.28 (SCALEBENCH §ivf_refresh, round 11).
      CLUSTERED corpora are where cell pruning pays: on the planted
      32-cluster SCALEBENCH §ivf_clustered corpus recall@10 = 1.0 at a
      5% probe, and the graded ``similarity_topk_ivf_clustered`` entry
      pins ≥ 0.9 at 15%. These defaults are the distribution-free safe
      floor; ``nprobe`` stays the explicit cost/recall knob.
    """
    import math

    n_cells = max(16, int(round(math.sqrt(max(1, n_rows)))))
    if profile == "clustered":
        return n_cells, -(-n_cells * 15 // 100)
    if profile != "uniform":
        raise ValueError(
            f"ivf_defaults: unknown profile {profile!r} "
            "(expected 'uniform' or 'clustered')"
        )
    return n_cells, (n_cells + 1) // 2


def _weighted_kmeanspp(
    cand: list[list[float]], weights: list[float], k: int, lloyd_iters: int = 10
) -> list[list[float]]:
    """Driver-side weighted k-means++ over the k-means|| candidate set
    (tiny: O(rounds·2k) rows): k-means++ D²-seeding, then a few weighted
    Lloyd refinements. Deterministic — fixed-seed rng for the D²-draws,
    heaviest candidate as the first center."""
    import numpy as np

    C = np.asarray(cand, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    n = len(C)
    if n <= k:
        return [list(map(float, c)) for c in C]
    rng = np.random.default_rng(20240607)
    chosen = [int(np.argmax(w))]
    d2 = ((C - C[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        p = w * d2
        tot = float(p.sum())
        if tot <= 0.0:
            # remaining candidates coincide with chosen centers (clone
            # corpus): take the lowest-index unchosen one
            taken = set(chosen)
            nxt = next(i for i in range(n) if i not in taken)
        else:
            nxt = int(rng.choice(n, p=p / tot))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((C - C[nxt]) ** 2).sum(axis=1))
    centers = C[np.array(chosen)]
    c2 = (C * C).sum(axis=1)
    for _ in range(lloyd_iters):
        # n×k distance matrix without the n×k×d intermediate
        dist = (
            c2[:, None]
            - 2.0 * (C @ centers.T)
            + (centers * centers).sum(axis=1)[None, :]
        )
        a = dist.argmin(axis=1)
        newc = centers.copy()
        for j in range(k):
            mask = a == j
            wm = float(w[mask].sum())
            if wm > 0.0:
                newc[j] = (C[mask] * w[mask, None]).sum(axis=0) / wm
        if bool((newc == centers).all()):
            break
        centers = newc
    return [list(map(float, c)) for c in centers]


#: Corpora at or below this row count are collected whole for an EXACT
#: driver-side k-means++ init (one Spark job, ~1 MB at 64 dims); above
#: it, the same collected hash-sample seeds the distributed k-means||
#: rounds. Also the oversample candidate budget for large corpora.
INIT_COLLECT_CAP = 2048


def _kmeanspp_init_cmat(
    pts: DataFrame, k: int, rounds: int = 2
) -> tuple[list[list[float]], list | None]:
    """Deterministic k-means++ / k-means|| init (round 13), in as few
    Spark jobs as the corpus size allows:

    - ONE TakeOrdered job collects the ``INIT_COLLECT_CAP`` lowest-
      ``xxhash64(id)`` rows — a deterministic uniform sample. If that IS
      the whole corpus (N ≤ cap), run exact k-means++ driver-side and
      stop: one job total, the common case for dimension-table-sized
      embedding sets.
    - Otherwise the sample seeds the candidate set and ``rounds``
      distributed D²-weighted oversampling passes follow (Bahmani et
      al., "Scalable k-means++", VLDB 2012): 2k picks per round via the
      Efraimidis-Spirakis weighted-reservoir key (-ln(u)/d², take the ℓ
      smallest — ONE job per round, no separate total-cost aggregate),
      deterministic because u derives from xxhash64(id, round). A
      final pass weights each candidate by attracted corpus mass, then
      driver-side WEIGHTED k-means++ reduces the candidates to k.

    Replaces the flat hash-sample init: on clustered corpora a uniform
    sample seeds big clusters many times and misses small ones, which is
    what forced the half-the-cells default probe budget; D²-seeding
    spreads centers ∝ distance mass, cutting the probe fraction needed
    for a given recall (SCALEBENCH §ivf_clustered).

    Scale shape: 1 job small-N, ``rounds``+2 jobs large-N. Candidate
    state is O(cap + rounds·2k) vectors driver-side; the Arrow kernels
    chunk their row batches so the transient row×candidate distance
    matrix stays ~tens of MB regardless of batch size. The full corpus
    never leaves the cluster.

    Returns ``(cmat, corpus)``: ``corpus`` is the collected ``(id, v)``
    row list when the ONE sampling job proved the sample IS the whole
    corpus (N ≤ cap) — round-13-opt: the caller can then finish the
    entire Lloyd loop driver-side instead of paying one cluster job per
    round for ≤2048 rows — and None for the large-N distributed path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    ell = 2.0 * k
    base = (
        pts.orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(INIT_COLLECT_CAP + 1)
        .collect()
    )
    if not base:
        return [], []
    if len(base) <= INIT_COLLECT_CAP:
        # the sample IS the corpus: exact k-means++ driver-side, weights 1
        cands = [[float(x) for x in r["v"]] for r in base]
        return _weighted_kmeanspp(cands, [1.0] * len(cands), k), base
    cands = [[float(x) for x in r["v"]] for r in base[:INIT_COLLECT_CAP]]

    def _min_d2(m: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
        # row-chunked so the transient chunk×candidates matrix stays small
        out = np.empty(len(m), dtype=np.float64)
        c2 = (c * c).sum(axis=1)[None, :]
        for lo in range(0, len(m), 2048):
            mm = m[lo : lo + 2048]
            d2 = (mm * mm).sum(axis=1)[:, None] - 2.0 * (mm @ c.T) + c2
            out[lo : lo + 2048] = d2.min(axis=1)
        return np.maximum(out, 0.0)

    def _d2_udf(cmat_now: list[list[float]]):
        @F.pandas_udf(DoubleType())
        def _d2(vec: pd.Series) -> pd.Series:
            import numpy as np

            if len(vec) == 0:
                return pd.Series([], dtype="float64")
            m = np.array(list(vec), dtype=np.float64)
            c = np.array(cmat_now, dtype=np.float64)
            return pd.Series(_min_d2(m, c))

        return _d2

    for rnd in range(rounds):
        scored = pts.withColumn("d2", _d2_udf(cands)(F.col("v")))
        # a d2=0 point (an already-chosen candidate) is filtered out and
        # can never be re-picked
        u = (
            (
                F.pmod(
                    F.xxhash64(F.col("id"), F.lit(rnd)), F.lit(1_000_000_007)
                )
                + 1
            )
            / F.lit(1_000_000_008.0)
        )
        key = -F.log(u) / F.col("d2")
        picked = (
            scored.select("id", "v", key.alias("__key"), "d2")
            .where(F.col("d2") > 0.0)
            .orderBy("__key", "id")  # id tie-break keeps the order total
            .limit(int(ell))
            .collect()
        )
        if not picked:
            break  # every remaining point coincides with a candidate
        cands.extend([[float(x) for x in r["v"]] for r in picked])

    # weight candidates by attracted corpus mass (one assignment pass)
    cmat = np.array(cands, dtype=np.float64)

    @F.pandas_udf("long")
    def _nearest_cand(vec: pd.Series) -> pd.Series:
        import numpy as np

        if len(vec) == 0:
            return pd.Series([], dtype="int64")
        m = np.array(list(vec), dtype=np.float64)
        c2 = (cmat * cmat).sum(axis=1)[None, :]
        out = np.empty(len(m), dtype=np.int64)
        for lo in range(0, len(m), 2048):
            mm = m[lo : lo + 2048]
            d2 = c2 - 2.0 * (mm @ cmat.T)
            out[lo : lo + 2048] = d2.argmin(axis=1)
        return pd.Series(out)

    wrows = (
        pts.select(_nearest_cand(F.col("v")).alias("ci"))
        .groupBy("ci")
        .count()
        .collect()
    )
    weights = [0.0] * len(cands)
    for r in wrows:
        weights[int(r["ci"])] = float(r["count"])
    return _weighted_kmeanspp(cands, weights, k), None


def _kmeans_driver_finish(
    spark, corpus_rows, cmat0: list[list[float]], iters: int
) -> tuple[DataFrame, DataFrame]:
    """Small-N Lloyd fast path (round-13 opt): when the init's ONE
    sampling job already collected the whole corpus (N ≤
    ``INIT_COLLECT_CAP``), run every Lloyd round driver-side in numpy —
    zero additional Spark jobs — instead of one cluster job per round
    over ≤2048 rows. Identical algorithm to ``_kmeans_numpy_loop``: same
    squared-distance argmin with the lowest-cid first-index tie-break,
    same keep-stale-centroid rule for emptied clusters, same exact-
    fixpoint early stop, and assignments are (as there) the ones made
    with the PRE-update centroids of the final round. The only numeric
    difference is the per-cluster mean's float summation order (numpy
    row order vs Spark's partial-aggregate merge order) — the same
    class of last-ulp variation the distributed loop itself has across
    partitionings, absorbed by the catalog-standard round(·, 6) and the
    recall-floor contracts downstream."""
    import numpy as np

    ids = [r["id"] for r in corpus_rows]
    if not ids:
        return (
            spark.createDataFrame([], "cid int, cv array<double>"),
            spark.createDataFrame([], "id bigint, cid bigint"),
        )
    m = np.array([[float(x) for x in r["v"]] for r in corpus_rows])
    cmat = np.asarray(cmat0, dtype=np.float64)
    k = len(cmat)
    a = None
    for _ in range(iters):
        d2 = (cmat * cmat).sum(axis=1)[None, :] - 2.0 * (m @ cmat.T)
        a = d2.argmin(axis=1)
        merged = cmat.copy()
        for j in range(k):
            mask = a == j
            if mask.any():
                merged[j] = m[mask].mean(axis=0)
        if (merged == cmat).all():
            break
        cmat = merged
    centroids = spark.createDataFrame(
        [(cid, [float(x) for x in cv]) for cid, cv in enumerate(cmat)],
        "cid int, cv array<double>",
    )
    assigns = spark.createDataFrame(
        [(int(i), int(c)) for i, c in zip(ids, a)], "id bigint, cid bigint"
    )
    return centroids, assigns


def kmeans_lite(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = 15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "numpy",
    init: str = "kmeans||",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means over an embedding column — the
    centroid-training path for IVF-style ANN.

    - init (``init="kmeans||"``, default since round 13): deterministic
      k-means|| D²-weighted oversampling + driver-side weighted
      k-means++ (:func:`_kmeanspp_init_cmat`). The flat hash-sample init
      (``init="hash"``: the k vectors with the lowest ``xxhash64(id)``,
      a deterministic uniform sample) remains for cheap paths; it is
      distribution-proportional but cluster-blind — on clustered corpora
      it seeds big clusters many times and misses small ones, which is
      what forced the half-the-cells default probe budget
      (SCALEBENCH §ivf_refresh, rounds 11-12).
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

    ``iters=15`` (the default since round 13, was 5): enough Lloyd
    rounds to actually converge on clustered corpora; the numpy loop
    stops EARLY at the exact fixpoint (new centroid floats identical to
    the old — the next assignment pass would be a bit-for-bit no-op), so
    converged trainings pay only the rounds they use.
    """
    from pyspark.sql.window import Window

    if iters < 1:
        # iters=0 would leave both kernels' assignment variable unbound
        # (neither loop body runs) — a confusing TypeError deep in the
        # finish path instead of a contract error here (r13 ADVICE fix)
        raise ValueError(f"kmeans_lite requires iters >= 1, got {iters}")
    v = embeddings.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    )
    if k is None:
        k, _ = ivf_defaults(v.count())

    if kernel == "numpy":
        # round-13 opt: NO id-repartition here — the numpy kernel never
        # joins by id (assignment is a map, the update is a groupBy), so
        # the hash exchange bought nothing: at 100 TB it was a full extra
        # shuffle of the vectors, and at bench SFs it turned every Lloyd
        # job into shuffle-partition-count tiny tasks instead of the
        # scan's natural splits (plans/r13/similarity_topk_ivf_*.txt).
        # The hof kernel below keeps it: its per-round join by id reuses
        # that partitioning.
        pts = v.cache()
        if init == "kmeans||":
            cmat0, corpus = _kmeanspp_init_cmat(pts, k)
            if corpus is not None:
                # the ONE init job collected the whole corpus — finish
                # every Lloyd round driver-side, zero further Spark jobs
                pts.unpersist()
                return _kmeans_driver_finish(
                    v.sparkSession, corpus, cmat0, iters
                )
        else:
            # hash-spread seed sample, cid ordered by sampled id — the
            # same rows/order the window form produced, collected
            # directly (one job) instead of a window + later re-collect
            rows = (
                pts.orderBy(F.xxhash64(F.col("id")), F.col("id"))
                .limit(k)
                .collect()
            )
            rows.sort(key=lambda r: r["id"])
            cmat0 = [[float(x) for x in r["v"]] for r in rows]
        return _kmeans_numpy_loop(pts, cmat0, iters, len(cmat0))

    # reused by every iteration below; no eager count — the cache fills
    # on the first Lloyd round's path (one fewer fixed job per training)
    pts = v.repartition("id").cache()
    if init == "kmeans||":
        # the init's d² passes run on the SAME cached corpus and the
        # resulting cmat feeds BOTH kernels identically, so the
        # numpy/hof assignment-parity contract is unaffected by the
        # init's internal use of the Arrow kernel
        cmat0, _corpus = _kmeanspp_init_cmat(pts, k)
        k = len(cmat0)  # a tiny/clone corpus can yield fewer centers
        centroids = pts.sparkSession.createDataFrame(
            [(cid, cv) for cid, cv in enumerate(cmat0)],
            "cid int, cv array<double>",
        )
    else:
        w = Window.orderBy("init_id")
        centroids = (
            # hash-spread seed sample; id tie-break keeps the order total
            v.orderBy(F.xxhash64(F.col("id")), F.col("id"))
            .limit(k)
            .select(F.col("id").alias("init_id"), F.col("v").alias("cv"))
            .withColumn("cid", F.row_number().over(w) - 1)
            .select("cid", "cv")
        )

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
    pts: DataFrame, cmat: list[list[float]], iters: int, k: int
) -> tuple[DataFrame, DataFrame]:
    """Lloyd iterations with DRIVER-RESIDENT centroids (numpy kernel).

    The Arrow assignment kernel must collect the k centroids every round
    anyway (they're captured in the pandas_udf closure), so keeping them
    as a driver-side list between rounds removes the per-iteration
    localCheckpoint job AND the per-iteration re-collect — ONE Spark job
    per Lloyd round (the centroid-update aggregate) instead of two.
    Round-13 opt: the init centroids now ARRIVE as that driver-side list
    (every init path already had them driver-resident), dropping the
    former re-collect of a just-created local centroid frame — at bench
    SFs that orderBy("cid") re-collect alone cost two 32-task jobs per
    training. Centroid state is k×d doubles (even 4096×1024 ≈ 32 MB),
    the same payload the closure already shipped per round; the full
    corpus never leaves the cluster. Numerics are identical to the
    DataFrame loop: the update is the same Spark avg aggregate, merely
    collected."""
    import pandas as pd
    from pyspark.sql.types import LongType

    spark = pts.sparkSession
    cmat = [[float(x) for x in cv] for cv in cmat]

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
        merged = [nc if nc is not None else old for nc, old in zip(new_cmat, cmat)]
        if merged == cmat:
            # EXACT fixpoint: the next assignment pass would reproduce
            # `assigned` bit-for-bit, so further Lloyd rounds are no-ops —
            # stop early (this is what makes the round-13 iters=15 default
            # affordable: converged trainings pay only the rounds they use,
            # and a kernel="hof" run at the same iters cannot diverge, its
            # extra rounds are the same no-ops).
            # One documented exception to that numpy/hof parity: corpora
            # with N <= INIT_COLLECT_CAP never reach this loop — they
            # finish driver-side (_kmeans_driver_finish), whose
            # per-cluster means use numpy row-order summation instead of
            # this Spark avg aggregate, so a last-ulp mean difference at
            # an assignment boundary could in principle flip a point
            # between kernels there (absorbed by the catalog-standard
            # round(·,6) and the recall-floor contracts downstream).
            break
        cmat = merged

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
