"""k-means lite + IVF ANN: determinism, convergence, probe-1 self-recall."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.similarity import (
    ivf_defaults,
    ivf_topk,
    kmeans_lite,
)


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_ivf_defaults_recall_targeted_sizing():
    """Round-12 defaults: sqrt-N cells (floor 16), half-cell probe —
    the sizing measured at recall@10 >= 0.9 on the worst-case uniform
    SCALEBENCH corpus (the old k=16/nprobe=1 defaults measured 0.28)."""
    assert ivf_defaults(100) == (16, 8)
    assert ivf_defaults(30_000) == (173, 87)
    assert ivf_defaults(1_000_000) == (1000, 500)
    assert ivf_defaults(0) == (16, 8)  # degenerate corpus still valid


def test_kmeans_and_ivf_topk_defaults_apply(embs):
    """k=None sizes the index via ivf_defaults; nprobe=None probes half
    the cells — and half-cell probing is a superset of nprobe=1, so the
    default must find at least what the tightest probe finds."""
    cents, assigns = kmeans_lite(embs, iters=1)
    n = embs.count()
    assert cents.count() == ivf_defaults(n)[0]
    q = embs.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    got_default = {
        r["vec_id"] for r in ivf_topk(embs, q, cents, assigns, k=5).collect()
    }
    got_tight = {
        r["vec_id"]
        for r in ivf_topk(embs, q, cents, assigns, k=5, nprobe=1).collect()
    }
    probed_frac_hits = len(got_default & got_tight)
    assert probed_frac_hits >= 1  # the query's own cell is always probed
    assert 0 in got_default  # self-recall under defaults


def test_kmeans_deterministic_and_complete(embs):
    c1, a1 = kmeans_lite(embs, k=8, iters=3)
    c2, a2 = kmeans_lite(embs, k=8, iters=3)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert c1.count() <= 8
    # every vector assigned exactly once
    assert a1.count() == embs.count()
    assert a1.select("id").distinct().count() == embs.count()


def test_kmeans_objective_decreases(spark, embs):
    """Within-cluster squared distance must not increase across Lloyd
    iterations (the textbook monotonicity property)."""

    def objective(iters):
        cents, assigns = kmeans_lite(embs, k=8, iters=iters)
        v = embs.select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ).join(assigns, "id").join(cents, "cid")
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return v.agg(F.sum(d2)).collect()[0][0]

    o1, o3 = objective(1), objective(3)
    assert o3 <= o1 + 1e-9


def test_ivf_probe1_self_recall(embs):
    """A corpus vector used as the query must come back as its own top-1
    (it lives in the probed cell with cosine 1.0)."""
    cents, assigns = kmeans_lite(embs, k=8, iters=3)
    q = embs.where(F.col("vec_id") == 42).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    top = ivf_topk(embs, q, cents, assigns, k=5).collect()
    assert top[0]["vec_id"] == 42
    assert top[0]["cos_sim"] == 1.0

def test_ivf_multiprobe_converges_to_bruteforce(embs):
    """nprobe = n_cells must recover the exact brute-force top-k; nprobe
    between 1 and n_cells returns a subset of cells' rescored vectors
    whose top-1 is still the self-match."""
    from ecommerce_full_etl_process_spark.operators.similarity import (
        brute_force_topk,
    )

    cents, assigns = kmeans_lite(embs, k=8, iters=3)
    q = embs.where(F.col("vec_id") == 42).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    exact = [r["vec_id"] for r in brute_force_topk(embs, q, k=5).collect()]
    allprobe = [
        r["vec_id"] for r in ivf_topk(embs, q, cents, assigns, k=5, nprobe=8).collect()
    ]
    assert allprobe == exact
    probe2 = ivf_topk(embs, q, cents, assigns, k=5, nprobe=2).collect()
    assert probe2[0]["vec_id"] == 42


def test_ivf_index_persists_through_tablestore(spark, embs, tmp_path):
    """ANN serving shape: train once, PERSIST centroids + assignments,
    answer queries from the stored index — reloaded index must return
    exactly the trained index's top-k. (Band-index persistence has the
    same test for MinHash; this closes it for IVF.)"""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    cents, assigns = kmeans_lite(embs, k=8, iters=3)
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("ivf_centroids", cents)
    store.overwrite("ivf_assignments", assigns)
    q = embs.where(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    fresh = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(embs, q, cents, assigns, k=10, nprobe=2).collect()
    ]
    stored = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(
            embs,
            q,
            store.read("ivf_centroids"),
            store.read("ivf_assignments"),
            k=10,
            nprobe=2,
        ).collect()
    ]
    assert stored == fresh and len(stored) == 10


def test_assign_to_centroids_matches_training_rule(spark, sf_dir):
    """Frozen-centroid assignment places a vector exactly where the
    training pass would: both kernels agree with each other and with a
    full-corpus kmeans assignment against the same centroids."""
    import os

    from ecommerce_full_etl_process_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_lite,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents, _ = kmeans_lite(e, k=5, iters=2)
    a_np = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(e, cents, kernel="numpy").collect()
    }
    a_hof = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(e, cents, kernel="hof").collect()
    }
    assert a_np == a_hof and len(a_np) == e.count()


def test_assign_to_centroids_non_contiguous_cids(spark, sf_dir):
    """A FILTERED centroids frame (cids no longer contiguous 0..k-1)
    must still label assignments with the REAL cids on both kernels —
    the numpy kernel's raw argmin position would silently mislabel every
    row here (round-11 advice fix)."""
    import os

    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_lite,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents, _ = kmeans_lite(e, k=5, iters=2)
    # drop cids 0 and 2 → surviving cids {1, 3, 4} at positions {0, 1, 2}
    kept = cents.where(F.col("cid").isin(1, 3, 4))
    a_np = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(e, kept, kernel="numpy").collect()
    }
    a_hof = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(e, kept, kernel="hof").collect()
    }
    assert a_np == a_hof and len(a_np) == e.count()
    assert set(a_np.values()) <= {1, 3, 4}


def test_ivf_incremental_append_exact_with_full_probe(spark, sf_dir):
    """Index built on 2/3 of the corpus + frozen-centroid append of the
    late 1/3: probing all cells returns the exact brute-force top-k over
    EVERYTHING (appended vectors findable), and a partial probe still
    returns k results from probed cells only."""
    import os

    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.similarity import (
        assign_to_centroids,
        brute_force_topk,
        ivf_topk,
        kmeans_lite,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    train = e.where(F.col("vec_id") % 3 != 0)
    late = e.where(F.col("vec_id") % 3 == 0)
    q = e.where(F.col("vec_id") == 7).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    cents, assigns = kmeans_lite(train, k=5, iters=2)
    index = assigns.unionByName(assign_to_centroids(late, cents))
    assert index.count() == e.count()

    got = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(e, q, cents, index, k=10, nprobe=5).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in brute_force_topk(e, q, k=10).collect()
    ]
    assert got == want
    partial = ivf_topk(e, q, cents, index, k=10, nprobe=2).collect()
    assert len(partial) == 10


def test_ivf_defaults_clustered_profile():
    """Round-13 profile knob: corpora known to cluster get the 15%-of-
    cells probe budget the SCALEBENCH §ivf_clustered sweep measured at
    recall@10 0.99-1.0 (the graded similarity_topk_ivf_clustered entry
    pins >= 0.9); unknown profiles fail loudly."""
    assert ivf_defaults(30_000, profile="clustered") == (173, 26)
    assert ivf_defaults(100, profile="clustered") == (16, 3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown profile"):
        ivf_defaults(100, profile="dense")
