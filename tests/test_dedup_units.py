"""Unit tests for dedup building blocks not covered by catalog oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators import dedup as D


def test_simhash_neardup_consecutive_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of 1
        (3, "completely different words about spark sql engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_neardup_pairs(df, "doc_id", "text", max_hamming=60).collect()
    }
    # (1,2) nearly identical → small hamming; (2,3) unrelated → large
    assert pairs[(1, 2)] < pairs[(2, 3)]
    assert pairs[(1, 2)] <= 12


def test_exact_dup_groups(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.exact_dup_groups(df, "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1


def test_word_shingles_short_text(spark):
    """Texts shorter than n words must yield an empty shingle set (guards
    the Spark sequence(1,0)→[1,0] descending quirk)."""
    df = spark.createDataFrame([(1, "two words"), (2, "a b c d")], "id long, t string")
    out = {
        r["id"]: r["s"]
        for r in df.select("id", D.word_shingles(F.col("t"), 3).alias("s")).collect()
    }
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]


def test_jaccard_empty_arrays(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        D.jaccard(F.array().cast("array<string>"), F.array().cast("array<string>")).alias("j")
    )
    assert df.collect()[0]["j"] == 0.0

def test_hot_bucket_clone_corpus(spark):
    """A clone corpus putting hundreds of docs in one LSH bucket must
    stream its quadratic pair output through the bucket self-join (no
    giant in-memory array row) and still emit every pair: C(n,2) clone
    pairs at jaccard 1.0."""
    from ecommerce_full_etl_process_spark.operators.dedup import minhash_lsh_pairs

    n_clones = 256  # -> 32,640 pairs through a single hot bucket
    rows = [(i, "the same cloned document text repeated verbatim here") for i in range(n_clones)]
    rows += [(10_000 + i, f"unique filler document number {i} totally different words {i * 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text")
    clone_pairs = pairs.where((F.col("id_a") < 10_000) & (F.col("id_b") < 10_000))
    expected = n_clones * (n_clones - 1) // 2
    got = clone_pairs.count()
    assert got == expected, (got, expected)
    assert clone_pairs.where(F.col("jaccard_sim") < 1.0).count() == 0


def test_hot_bucket_clone_corpus_without_broadcast(spark):
    """Round-12 un-pin check: the candidate-id prune must NOT be a pinned
    broadcast hint — on a clone-heavy corpus the candidate set can outgrow
    broadcast size, and a forced broadcast would OOM the driver. With
    broadcasts disabled entirely (the planner state a too-big candidate
    set degrades to), the operator must still run and emit every pair —
    i.e. the plan works under EITHER join strategy, AQE's choice."""
    from ecommerce_full_etl_process_spark.operators.dedup import minhash_lsh_pairs

    n_clones = 128
    rows = [(i, "the same cloned document text repeated verbatim here") for i in range(n_clones)]
    rows += [(10_000 + i, f"unique filler document number {i} totally different words {i * 7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = minhash_lsh_pairs(df, "doc_id", "text")
        clone_pairs = pairs.where(
            (F.col("id_a") < 10_000) & (F.col("id_b") < 10_000)
        )
        assert clone_pairs.count() == n_clones * (n_clones - 1) // 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_clone_batch_without_broadcast(spark):
    """Round-13 un-pin check for the INCREMENTAL path (the batch path got
    this in round 12): a clone-heavy batch colliding with a clone-heavy
    archive makes the candidate set quadratic in the clone count, so the
    candidate-id prune must not be a pinned broadcast hint. With
    broadcasts disabled entirely (the planner state a too-big candidate
    set degrades to), the operator must still emit every (new,new) and
    (new,archive) pair — the plan works under either join strategy."""
    from ecommerce_full_etl_process_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_pairs_incremental,
    )

    n_arch, n_new = 96, 64
    clone = "the same cloned document text repeated verbatim here"
    archive = spark.createDataFrame(
        [(i, clone) for i in range(n_arch)]
        + [(5_000 + i, f"archive filler doc {i} other words {i * 3}") for i in range(20)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100_000 + i, clone) for i in range(n_new)],
        "doc_id long, text string",
    )
    index = minhash_band_index(archive, "doc_id", "text").localCheckpoint(
        eager=True
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = minhash_lsh_pairs_incremental(
            batch, archive, index, "doc_id", "text"
        )
        expected = n_new * (n_new - 1) // 2 + n_new * n_arch
        got = pairs.where(F.col("jaccard_sim") >= 1.0).count()
        assert pairs.count() == expected, (pairs.count(), expected)
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed min-label loop
    must produce identical (node, comp) labels — chains, a star, a cycle,
    an isolated edge, and min-id components spread across edge order."""
    import random

    rng = random.Random(42)
    edges = [(2, 9), (9, 4), (4, 2)]            # cycle {2,4,9} -> comp 2
    edges += [(10 + i, 11 + i) for i in range(6)]  # chain 10..16 -> comp 10
    edges += [(50, 60), (50, 70), (50, 80)]     # star -> comp 50
    edges += [(99, 98)]                          # edge -> comp 98
    rng.shuffle(edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long").localCheckpoint(
        eager=True
    )
    fast = {
        (r["node"], r["comp"])
        for r in D.connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["comp"])
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist
    comp_of = dict(fast)
    assert comp_of[9] == 2 and comp_of[16] == 10
    assert comp_of[80] == 50 and comp_of[99] == 98


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(pairs).count() == 0
    assert D.connected_components_star(pairs).count() == 0


def test_connected_components_star_agrees(spark):
    """Large-star/small-star contraction must label identically to the DSU
    fast path on the mixed-topology graph, a long chain (the high-diameter
    case star contraction exists for), and random graphs."""
    import random

    rng = random.Random(7)
    cases = []
    mixed = [(2, 9), (9, 4), (4, 2), (50, 60), (50, 70), (99, 98)]
    mixed += [(10 + i, 11 + i) for i in range(6)]
    cases.append(mixed)
    # 60-node chain: diameter 59, min-label would need ~59 rounds but star
    # contraction must finish inside the default max_iter=20 (O(log d))
    cases.append([(100 + i, 101 + i) for i in range(60)])
    for seed in (1, 2):
        r = random.Random(seed)
        cases.append(
            [(r.randrange(40), r.randrange(40)) for _ in range(50)]
        )
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        rng.shuffle(edges)
        pairs = spark.createDataFrame(
            edges, "id_a long, id_b long"
        ).localCheckpoint(eager=True)
        dsu = {
            (r["node"], r["comp"])
            for r in D.connected_components(pairs).collect()
        }
        star = {
            (r["node"], r["comp"])
            for r in D.connected_components_star(pairs).collect()
        }
        assert star == dsu, f"star CC diverged on {sorted(edges)[:5]}..."


def test_connected_components_star_chain_round_count(spark):
    """The chain case must converge well under max_iter — cap rounds at 8
    (log2(60) ≈ 6) to pin the O(log d) behavior, not just the answer."""
    edges = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long").localCheckpoint(
        eager=True
    )
    out = {
        (r["node"], r["comp"])
        for r in D.connected_components_star(pairs, max_iter=8).collect()
    }
    assert out == {(i, 0) for i in range(41)}


def test_simhash_kernels_bit_identical(spark, sf_dir):
    """The numpy Arrow kernel and the JVM aggregate path must produce the
    SAME fingerprint for every document (hashlib md5 == JVM md5, same
    first-15-hex-chars parse, same tie-votes-negative rule) — including
    NULL-text rows, which BOTH kernels must drop entirely."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    null_row = docs.sparkSession.createDataFrame(
        [(-1, None), (-2, "")], "doc_id long, text string"
    )
    docs = docs.select("doc_id", "text").unionByName(null_row)
    a = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_fingerprints(docs, "doc_id", "text", kernel="numpy").collect()
    }
    b = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_fingerprints(docs, "doc_id", "text", kernel="jvm").collect()
    }
    assert a == b and len(a) > 0
    assert -1 not in a  # NULL text dropped by both kernels
    assert -2 in a  # empty-string text kept by both kernels


def test_minhash_incremental_matches_full_run(spark, sf_dir):
    """Incremental (batch vs indexed archive) output == full-corpus run
    filtered to pairs touching a batch id; archive-internal pairs absent."""
    from ecommerce_full_etl_process_spark.plans import llm_queries as lq

    aug = lq._augmented_docs(spark, sf_dir)
    full = {
        (r["id_a"], r["id_b"], r["jaccard_sim"])
        for r in D.minhash_lsh_pairs(
            aug, "doc_id", "text", n=3, min_jaccard=0.5
        ).collect()
    }
    want = {
        t for t in full if t[0] >= lq.OFFSET or t[1] >= lq.OFFSET
    }
    assert want, "fixture must plant cross-batch duplicates"
    got = {
        (r["id_a"], r["id_b"], r["jaccard_sim"])
        for r in lq.minhash_incremental_pairs(spark, str(sf_dir)).collect()
    }
    assert got == want


def test_minhash_index_roundtrips_through_tablestore(spark, sf_dir, tmp_path):
    """The band index survives parquet persistence: incremental pairs from
    a stored index == pairs from a freshly computed one."""
    from ecommerce_full_etl_process_spark.plans import llm_queries as lq
    from ecommerce_full_etl_process_spark.sources.io import TableStore
    from pyspark.sql import functions as F

    aug = lq._augmented_docs(spark, str(sf_dir))
    archive = aug.where(F.col("doc_id") < lq.OFFSET)
    batch = aug.where(F.col("doc_id") >= lq.OFFSET)
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("lsh_index", D.minhash_band_index(archive, "doc_id", "text"))
    stored = store.read("lsh_index")
    fresh_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs_incremental(
            batch, archive, D.minhash_band_index(archive, "doc_id", "text"),
            "doc_id", "text",
        ).collect()
    }
    stored_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs_incremental(
            batch, archive, stored, "doc_id", "text"
        ).collect()
    }
    assert stored_pairs == fresh_pairs and stored_pairs


def test_simhash_banding_recall_guarantee(spark, sf_dir):
    """Pigeonhole contract: every pair within hamming <= bands-1 of the
    ground-truth fingerprint set MUST appear in the banded candidates.
    Ground truth = all-pairs popcount over the fingerprints."""
    from ecommerce_full_etl_process_spark.plans import llm_queries as lq

    aug = lq._augmented_docs(spark, sf_dir)
    fps = D.simhash_fingerprints(aug, "doc_id", "text")
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    truth = {
        (r["id_a"], r["id_b"]): r["h"]
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", D.hamming60(F.col("sa"), F.col("sb")).alias("h")
        )
        .where(F.col("h") <= 8)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_band_pairs(
            aug, "doc_id", "text", max_hamming=8, bands=10
        ).collect()
    }
    # bands=10 guarantees recall through hamming 9 > threshold 8: banded
    # output must EQUAL the ground truth, not just be a subset
    assert banded == truth and truth


def test_connected_components_star_string_ids(spark):
    """Both CC algorithms support string node ids (doc hashes, URLs) —
    comp = lexicographic min of the component."""
    edges = [("b", "c"), ("c", "a"), ("x", "y")]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    want = {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}
    dsu = {
        (r["node"], r["comp"])
        for r in D.connected_components(pairs).collect()
    }
    star = {
        (r["node"], r["comp"])
        for r in D.connected_components_star(pairs).collect()
    }
    assert dsu == want and star == want


def test_min_label_falls_back_on_high_diameter(spark):
    """A chain longer than max_iter must NOT silently return unconverged
    labels from the distributed min-label loop — the high-diameter
    fallback to star contraction produces correct labels (before the
    fix, 40 of 61 nodes on this graph kept wrong comps)."""
    edges = [(i, i + 1) for i in range(60)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long").localCheckpoint(
        eager=True
    )
    out = {
        (r["node"], r["comp"])
        for r in D.connected_components(pairs, driver_threshold=0).collect()
    }
    assert out == {(i, 0) for i in range(61)}


def test_connected_components_star_self_loop_singletons(spark):
    """A node whose ONLY edge is a self-loop must be labeled (x, x) by
    both CC variants — round-6 ADVICE fix: the star variant used to drop
    such nodes entirely when the u != v filter removed their edges."""
    pairs = spark.createDataFrame(
        [(1, 2), (7, 7), (9, 9), (2, 1)], "id_a long, id_b long"
    )
    for fn in (D.connected_components, D.connected_components_star):
        got = {(r["node"], r["comp"]) for r in fn(pairs).collect()}
        assert got == {(1, 1), (2, 1), (7, 7), (9, 9)}, fn.__name__


def test_corpus_dedup_keep_best_quality_policy(spark):
    """Planted clusters: keep-best retains the highest-quality member
    (ties -> min id), unlike the min-id keep list."""
    from pyspark.sql import functions as F

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base + " one extra tail word"),     # cluster A, longest
        (2, base),                               # cluster A
        (3, base + " x"),                        # cluster A, middle
        (7, "completely different text about bloom filters shuffling partitions and adaptive execution plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in D.corpus_dedup_keep_best(
            df, "doc_id", "text", F.length("text").cast("long")
        ).collect()
    }
    # doc 7 is a singleton: not listed (same contract as keep-list)
    assert sorted(out) == [1, 2, 3]
    assert out[1]["keep"] is True          # longest wins, not min id
    assert not out[2]["keep"] and not out[3]["keep"]
    assert all(r["comp"] == out[1]["comp"] for r in out.values())
    # min-id policy would also keep 1 here; prove divergence with ids flipped
    flipped = spark.createDataFrame(
        [(10, base), (5, base + " longest of the cluster yes")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in D.corpus_dedup_keep_best(
            flipped, "doc_id", "text", F.length("text").cast("long")
        ).collect()
    }
    assert got == {5: True, 10: False}  # min-id would keep 5 anyway…
    flipped2 = spark.createDataFrame(
        [(5, base), (10, base + " longest of the cluster yes")],
        "doc_id long, text string",
    )
    got2 = {
        r["doc_id"]: r["keep"]
        for r in D.corpus_dedup_keep_best(
            flipped2, "doc_id", "text", F.length("text").cast("long")
        ).collect()
    }
    assert got2 == {10: True, 5: False}  # …but HERE min-id would keep 5
