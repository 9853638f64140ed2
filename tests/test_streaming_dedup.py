"""End-to-end streaming dedup ingestion: incremental LSH against the
growing TableStore index, per-batch keep/dup decisions, replay guard."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.sources.io import TableStore
from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (
    run_streaming_dedup_ingest,
)

DOC = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a pale winter moon tonight"
)


def _write_batch(spark, src_dir, name, rows):
    # append a new part file into the watched dir (one file = one batch
    # under maxFilesPerTrigger=1); `name` is only documentation
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src_dir)


def _run(spark, src, ckpt, wh):
    q = run_streaming_dedup_ingest(
        spark, src, ckpt, wh, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    return TableStore(spark, wh)


def test_streaming_dedup_ingest_end_to_end(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    os.makedirs(src, exist_ok=True)

    # batch 1: two distinct docs + one in-batch near-dup of doc 1
    _write_batch(
        spark,
        src,
        "b1",
        [
            (1, DOC),
            (2, "completely different text about spark structured streaming engines running stateful aggregations at scale"),
            (3, DOC + " extra"),
        ],
    )
    store = _run(spark, src, ckpt, wh)
    log1 = {r["doc_id"]: r for r in store.read("dedup_log").collect()}
    assert log1[1]["keep"] and log1[2]["keep"]
    assert not log1[3]["keep"] and log1[3]["dup_of"] == 1
    assert store.read("corpus").count() == 3
    assert store.read("lsh_bands").count() == 3

    # batch 2: a near-dup of ARCHIVED doc 1, and a fresh doc
    _write_batch(
        spark,
        src,
        "b2",
        [
            (10, DOC + " again"),
            (11, "yet another unrelated document mentioning warehouses catalogs manifests and atomic version flips"),
        ],
    )
    store = _run(spark, src, ckpt, wh)
    log = {r["doc_id"]: r for r in store.read("dedup_log").collect()}
    assert len(log) == 5
    assert not log[10]["keep"] and log[10]["dup_of"] == 1  # cross-batch dup
    assert log[11]["keep"]
    assert store.read("corpus").count() == 5
    assert store.read("lsh_bands").count() == 5

    # replay with a FRESH checkpoint: both files re-delivered; the
    # batch-id guard must skip re-committed batches -> no duplicate rows
    store = _run(spark, src, str(tmp_path / "ckpt2"), wh)
    assert store.read("dedup_log").count() == 5
    assert store.read("corpus").count() == 5


def test_streaming_dedup_soak_matches_offline(spark, tmp_path):
    """8-batch soak: 60 fresh + 15 near-copies of earlier docs per batch
    (star-shaped components only, so the online greedy and the offline
    full-corpus keep list must agree exactly). Asserts log completeness,
    dup_of validity, index growth, and keep-set equality with
    corpus_dedup_keep_list over the full corpus."""
    import random

    from ecommerce_full_etl_process_spark.operators import dedup as D

    rng = random.Random(13)
    words = [f"w{i}" for i in range(500)]
    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh")
    os.makedirs(src, exist_ok=True)

    all_rows = []
    fresh_texts = {}
    next_id = 0
    n_batches, fresh_per, dups_per = 8, 60, 15
    for b in range(n_batches):
        rows = []
        for _ in range(fresh_per):
            text = " ".join(rng.choice(words) for _ in range(40)) + f" uniq{next_id}"
            fresh_texts[next_id] = text
            rows.append((next_id, text))
            next_id += 1
        if b > 0:
            # copies of docs FRESH in earlier batches (truncate 3 words)
            prev_ids = [i for i in fresh_texts if i < next_id - fresh_per]
            for _ in range(dups_per):
                src_id = rng.choice(prev_ids)
                rows.append(
                    (next_id, " ".join(fresh_texts[src_id].split()[:-3]))
                )
                next_id += 1
        all_rows.extend(rows)
        _write_batch(spark, src, f"b{b}", rows)
        _run(spark, src, str(tmp_path / "ckpt"), wh)

    store = TableStore(spark, wh)
    log = {r["doc_id"]: r for r in store.read("dedup_log").collect()}
    assert len(log) == len(all_rows)
    assert store.read("corpus").count() == len(all_rows)
    assert store.read("lsh_bands").count() == len(all_rows)
    for did, r in log.items():
        if not r["keep"]:
            assert r["dup_of"] is not None and r["dup_of"] < did

    # offline ground truth over the final corpus
    full = spark.createDataFrame(all_rows, "doc_id long, text string")
    offline = {
        r["doc_id"]: (r["keep"], r["comp"])
        for r in D.corpus_dedup_keep_list(full, "doc_id", "text").collect()
    }
    stream_nonkeep = {d: r["dup_of"] for d, r in log.items() if not r["keep"]}
    off_nonkeep = {d: c for d, (k, c) in offline.items() if not k}
    assert stream_nonkeep == off_nonkeep


def test_streaming_dedup_heals_torn_batch(spark, tmp_path):
    """Round-6 ADVICE fix, exercised directly: a crash BETWEEN the data
    appends of one micro-batch (intent marker + partial corpus/log rows
    landed, commit marker absent) must be healed on replay — nothing
    lost, nothing duplicated, decisions identical to a crash-free run."""
    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh")
    os.makedirs(src, exist_ok=True)

    # batch 0 commits normally
    _write_batch(spark, src, "b0", [(1, DOC), (2, DOC + " other tail here")])
    store = _run(spark, src, str(tmp_path / "ckpt"), wh)
    assert store.read("batch_commits").count() == 1

    # hand-craft batch 1's TORN state: the dead writer appended the
    # intent marker, the dedup_log decision for doc 10 and the corpus row
    # for doc 10 — but crashed before doc 11's rows, the band index, and
    # the commit marker
    batch1 = [(10, DOC + " again"), (11, "fresh unrelated text about parquet manifests and atomic version flips")]
    store.append(
        "batch_attempts", spark.createDataFrame([(1,)], "batch_id long")
    )
    store.append(
        "dedup_log",
        spark.createDataFrame(
            [(10, False, 1, 1)], "doc_id long, keep boolean, dup_of long, batch_id long"
        ),
    )
    store.append(
        "corpus", spark.createDataFrame(batch1[:1], "doc_id long, text string")
    )

    # now the file arrives (again) and the stream replays batch 1
    _write_batch(spark, src, "b1", batch1)
    store = _run(spark, src, str(tmp_path / "ckpt"), wh)

    # healed: every doc exactly once everywhere, commit marker present
    assert store.read("batch_commits").count() == 2
    assert store.read("corpus").count() == 4
    assert store.read("lsh_bands").count() == 4
    log = {r["doc_id"]: r for r in store.read("dedup_log").collect()}
    assert len(log) == 4
    assert sorted(log) == [1, 2, 10, 11]
    assert not log[10]["keep"] and log[10]["dup_of"] == 1
    assert log[11]["keep"]
    # and a further replay with a fresh checkpoint is a no-op
    store = _run(spark, src, str(tmp_path / "ckpt2"), wh)
    assert store.read("corpus").count() == 4
    assert store.read("dedup_log").count() == 4
