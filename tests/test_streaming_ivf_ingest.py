"""Streaming ANN ingestion (round 11): frozen-centroid assignment per
micro-batch into a persisted IVF index, exactly-once two-table appends
under the intent/commit marker protocol, probe parity with brute force."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.similarity import (
    assign_to_centroids,
    brute_force_topk,
    ivf_topk,
    kmeans_lite,
)
from ecommerce_full_etl_process_spark.sources.io import TableStore
from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
    init_streaming_ivf_index,
    run_streaming_ivf_ingest,
)


def _embs(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")


def _write_batch(spark, src_dir, df):
    df.coalesce(1).write.mode("append").parquet(src_dir)


def _run(spark, src, ckpt, wh):
    q = run_streaming_ivf_ingest(
        spark, src, ckpt, wh, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    return TableStore(spark, wh)


def _setup(spark, sf_dir, tmp_path, k=5):
    """Train on 2/3 of the corpus, return (store, late_third, centroids)."""
    e = _embs(spark, sf_dir)
    train = e.where(F.col("vec_id") % 3 != 0)
    late = e.where(F.col("vec_id") % 3 == 0)
    cents, assigns = kmeans_lite(train, k=k, iters=2)
    store = TableStore(spark, str(tmp_path / "wh"))
    init_streaming_ivf_index(store, cents, train, assigns)
    return store, late, cents


def test_streaming_ivf_end_to_end_probe_equals_bruteforce(
    spark, sf_dir, tmp_path
):
    """After draining the stream, the persisted (training ∪ streamed)
    index probed over all cells returns the exact brute-force top-k over
    the FULL corpus — streamed vectors findable, placed exactly where
    training would put them."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    store, late, cents = _setup(spark, sf_dir, tmp_path)
    for m in (0, 1):
        _write_batch(spark, src, late.where(F.col("vec_id") % 2 == m))
    store = _run(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"))

    e = _embs(spark, sf_dir)
    n_total = e.count()
    assert store.read("vectors").count() == n_total
    assert store.read("ivf_assignments").count() == n_total
    assert store.read("batch_commits").count() == 2

    # streamed assignments match the deterministic frozen-centroid rule
    want = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(
            late, store.read("ivf_centroids")
        ).collect()
    }
    got = {
        r["vec_id"]: r["cid"]
        for r in store.read("ivf_assignments")
        .where(F.col("batch_id") >= 0)
        .collect()
    }
    assert got == want

    q = e.where(F.col("vec_id") == 7).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    corpus = store.read("vectors").select("vec_id", "embedding")
    index = store.read("ivf_assignments").select(
        F.col("vec_id").alias("id"), "cid"
    )
    got_k = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(
            corpus, q, store.read("ivf_centroids"), index, k=10, nprobe=5
        ).collect()
    ]
    want_k = [
        (r["vec_id"], r["cos_sim"])
        for r in brute_force_topk(e, q, k=10).collect()
    ]
    assert got_k == want_k and len(got_k) == 10


def test_streaming_ivf_replay_is_noop(spark, sf_dir, tmp_path):
    """A fresh checkpoint re-delivers every file; the commit-marker skip
    must land nothing twice."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    store, late, _ = _setup(spark, sf_dir, tmp_path)
    for m in (0, 1):
        _write_batch(spark, src, late.where(F.col("vec_id") % 2 == m))
    store = _run(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"))
    n_vec = store.read("vectors").count()
    n_asn = store.read("ivf_assignments").count()

    store = _run(spark, src, str(tmp_path / "ckpt2"), str(tmp_path / "wh"))
    assert store.read("vectors").count() == n_vec
    assert store.read("ivf_assignments").count() == n_asn
    assert store.read("batch_commits").count() == 2
    # and the stream picks up NEW files with the original checkpoint
    _write_batch(
        spark,
        src,
        late.limit(0),  # an empty file must be a harmless no-op batch
    )
    store = _run(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"))
    assert store.read("vectors").count() == n_vec


def test_streaming_ivf_heals_torn_batch(spark, sf_dir, tmp_path):
    """A crash between the two data appends (intent marker + the vectors
    rows landed, assignments and commit marker absent) must heal on
    replay: every vec_id exactly once in BOTH tables, assignments
    identical to a crash-free run."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    store, late, cents = _setup(spark, sf_dir, tmp_path)
    b0 = late.where(F.col("vec_id") % 2 == 0)
    b1 = late.where(F.col("vec_id") % 2 == 1)

    # batch 0 commits normally
    _write_batch(spark, src, b0)
    store = _run(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"))
    assert store.read("batch_commits").count() == 1

    # hand-craft batch 1's TORN state: intent marker + HALF of batch 1's
    # vectors rows landed; no assignments, no commit marker
    store.append(
        "batch_attempts", spark.createDataFrame([(1,)], "batch_id long")
    )
    store.append(
        "vectors",
        b1.where(F.col("vec_id") % 4 == 1).select(
            "vec_id", "embedding", F.lit(1).cast("long").alias("batch_id")
        ),
    )

    # the file arrives and the stream replays batch 1
    _write_batch(spark, src, b1)
    store = _run(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "wh"))

    e = _embs(spark, sf_dir)
    n_total = e.count()
    assert store.read("batch_commits").count() == 2
    vec = store.read("vectors")
    asn = store.read("ivf_assignments")
    assert vec.count() == n_total
    assert vec.select("vec_id").distinct().count() == n_total
    assert asn.count() == n_total
    assert asn.select("vec_id").distinct().count() == n_total
    # healed assignments equal the deterministic crash-free rule
    want = {
        r["id"]: r["cid"]
        for r in assign_to_centroids(late, cents).collect()
    }
    got = {
        r["vec_id"]: r["cid"]
        for r in asn.where(F.col("batch_id") >= 0).collect()
    }
    assert got == want
    # a further fresh-checkpoint replay is a no-op
    store = _run(spark, src, str(tmp_path / "ckpt2"), str(tmp_path / "wh"))
    assert store.read("vectors").count() == n_total
    assert store.read("ivf_assignments").count() == n_total
