"""Scale tooling: salted joins preserve semantics; bucketed tables join
without a shuffle (the co-located-join story for 100 TB facts)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.skew import (
    salted_join,
    top_key_skew_report,
)


def test_salted_join_equivalent(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", salt_buckets=8)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_report(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rep = top_key_skew_report(li, "l_suppkey", top_n=5).collect()
    assert len(rep) == 5
    assert all(r["share"] > 0 for r in rep)
    # descending
    assert [r["n_rows"] for r in rep] == sorted(
        (r["n_rows"] for r in rep), reverse=True
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join with NO
    Exchange on either side — the pre-partitioned co-located join that
    makes repeated fact⋈fact joins affordable at scale."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").select("o_orderkey", "o_totalprice"), "o_orderkey"
    )
    # broadcast would dodge the question — force SMJ path by disabling
    # auto-broadcast for this check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

# ---------------------------------------------------------------------------
# TableStore file skipping (Delta-style data skipping on plain parquet)
# ---------------------------------------------------------------------------

def _skip_store(spark, tmp_path):
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    store.overwrite("t", df.repartition(8))  # k spread across all files
    return store


def test_file_skipping_after_cluster_by(spark, tmp_path):
    store = _skip_store(spark, tmp_path)
    # unclustered + no stats: nothing skipped, read still correct
    kept, skipped = store.prune_files("t", "k", 100, 199)
    assert skipped == 0 and len(kept) == 8
    assert store.read_where("t", "k", 100, 199).count() == 100

    store.collect_stats("t")
    # random layout: every file spans ~the full k range -> still no skips
    _kept, skipped = store.prune_files("t", "k", 100, 199)
    assert skipped == 0

    store.cluster_by("t", ["k"], num_files=8)
    kept, skipped = store.prune_files("t", "k", 100, 199)
    assert skipped >= 6, f"expected most files skipped, got {skipped}"
    out = store.read_where("t", "k", 100, 199)
    assert out.count() == 100
    # pruned read ≡ full-scan filter
    full = store.read("t").where(F.col("k").between(100, 199))
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in full.collect()
    )


def test_file_skipping_stats_survive_versioning(spark, tmp_path):
    """Stats are per-version: a new overwrite without stats must fall back
    to keep-everything (never prune on a stale version's stats)."""
    store = _skip_store(spark, tmp_path)
    store.cluster_by("t", ["k"], num_files=4)
    _kept, skipped = store.prune_files("t", "k", 0, 10)
    assert skipped == 3
    # new version written WITHOUT stats -> conservative full keep
    store.overwrite("t", store.read("t").repartition(5))
    kept, skipped = store.prune_files("t", "k", 0, 10)
    assert skipped == 0 and len(kept) == 5
    assert store.read_where("t", "k", 0, 10).count() == 11


def test_file_skipping_empty_result(spark, tmp_path):
    store = _skip_store(spark, tmp_path)
    store.cluster_by("t", ["k"], num_files=4)
    kept, skipped = store.prune_files("t", "k", 50_000, 60_000)
    assert kept == [] and skipped == 4
    assert store.read_where("t", "k", 50_000, 60_000).count() == 0


def test_file_skipping_string_and_date_stats(spark, tmp_path):
    """ISO-rendered date stats order chronologically; string stats prune
    lexicographic ranges."""
    import datetime as dt

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh2"))
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.date_add(F.lit(dt.date(2024, 1, 1)), F.col("id").cast("int") % 365).alias("d"),
    )
    store.overwrite("dates", df)
    store.cluster_by("dates", ["d"], num_files=6)
    kept, skipped = store.prune_files(
        "dates", "d", dt.date(2024, 2, 1), dt.date(2024, 2, 7)
    )
    assert skipped >= 4
    got = store.read_where(
        "dates", "d", dt.date(2024, 2, 1), dt.date(2024, 2, 7)
    ).count()
    want = (
        store.read("dates")
        .where(F.col("d").between("2024-02-01", "2024-02-07"))
        .count()
    )
    assert got == want > 0


def test_compact_restores_file_count(spark, tmp_path):
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh3"))
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    store.overwrite("t", df.repartition(2))
    for _ in range(6):  # simulated micro-batch appends -> file bloat
        store.append("t", df.limit(50).repartition(4))
    before = store.compact("t", target_files=4)
    assert before >= 20
    data_dir = store._data_dir("t", store._current_version("t"))
    after = sum(
        1 for _dp, _d, fs in os.walk(data_dir)
        for f in fs if f.endswith(".parquet")
    )
    assert after <= 4
    assert store.read("t").count() == 2000 + 6 * 50
    # compaction wrote a NEW version: the pre-compaction one time-travels
    prev = store._current_version("t") - 1
    assert store.read("t", version=prev).count() == 2000 + 6 * 50


def test_schema_evolution_across_versions(spark, tmp_path):
    """Each version dir is schema-isolated: adding a column in a new
    version never corrupts old-version time-travel reads."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh4"))
    v1 = spark.range(0, 10).select(F.col("id").alias("k"))
    store.overwrite("t", v1)
    v2 = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
    )
    store.overwrite("t", v2)
    assert store.read("t").columns == ["k", "extra"]
    old = store.read("t", version=1)
    assert old.columns == ["k"] and old.count() == 10


def test_read_where_pushes_row_group_filter(spark, tmp_path):
    """File skipping composes with parquet pushdown: the kept files are
    still scanned WITH the predicate pushed to the reader."""
    store = _skip_store(spark, tmp_path)
    store.cluster_by("t", ["k"], num_files=8)
    plan = store.read_where("t", "k", 100, 199)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,100" in plan, plan[:2000]


def test_export_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """JSONL export: shard count respected, gzip'd, and a JSON-lines read
    round-trips every row (ids and text equal)."""
    import glob
    import gzip
    import json as _json

    from ecommerce_full_etl_process_spark.sources.io import export_jsonl

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "corpus_jsonl")
    export_jsonl(docs, out, shards=3, order_col="doc_id")
    files = sorted(glob.glob(os.path.join(out, "part-*.json.gz")))
    assert len(files) == 3
    rows = []
    for fp in files:
        with gzip.open(fp, "rt") as f:
            shard = [_json.loads(line) for line in f]
        # per-shard ordering contract
        ids = [r["doc_id"] for r in shard]
        assert ids == sorted(ids)
        rows.extend(shard)
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in rows}
    assert got == want


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling is live: with thresholds scaled to test
    size, a join with one hot key ends with the skewed partition SPLIT in
    the final adaptive plan (the runtime answer to skew that salting
    solves statically — both belong in the 100 TB toolbox)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 == 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        # execute THIS plan tree (count() would build and finalize a
        # different one, leaving joined's AdaptiveSparkPlan un-finalized)
        assert len(joined.collect()) == 20_900
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "SortMergeJoin(skew=true)" in final_plan, final_plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_read_where_partitioned_table_schema_parity(spark, tmp_path):
    """read_where on a partition_by table must keep the hive partition
    columns (basePath pinned to the version dir) so its schema matches
    read() and partition-column predicates still work (round-6 ADVICE
    fix — without basePath the leaf-file read drops them)."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    store.overwrite("t", df, partition_by=["p"])
    store.collect_stats("t")

    out = store.read_where("t", "k", 100, 199)
    assert sorted(out.columns) == sorted(store.read("t").columns)
    assert "p" in out.columns
    assert out.count() == 100
    # partition-column predicate on the pruned read works
    assert out.where(F.col("p") == 1).count() == 25
    # and values agree with the full-scan filter, partition col included
    full = store.read("t").where(F.col("k").between(100, 199))
    assert sorted((r["k"], r["p"]) for r in out.collect()) == sorted(
        (r["k"], r["p"]) for r in full.collect()
    )


def test_relational_scale_dir_matches_driver_schemas(spark, tmp_path):
    """write_relational_scale_dir must produce tables whose schemas match
    the driver testdata exactly (so every catalog query runs unmodified on
    the scaled corpus) with row counts scaling by the multiplier and the
    fixed dims copied through."""
    from ecommerce_full_etl_process_spark.sources import scale_corpus as SC

    d = str(tmp_path / "rel")
    SC.write_relational_scale_dir(spark, d, 1)
    ref_dir = "/root/testdata/sf0.1"
    for t in ("customer", "orders", "lineitem", "events", "nation", "region"):
        got = spark.read.parquet(f"{d}/{t}.parquet")
        ref = spark.read.parquet(f"{ref_dir}/{t}.parquet")
        assert dict(got.dtypes) == dict(ref.dtypes), t
    assert spark.read.parquet(f"{d}/customer.parquet").count() == SC.BASE_CUSTOMERS
    assert spark.read.parquet(f"{d}/orders.parquet").count() == SC.BASE_ORDERS
    assert (
        spark.read.parquet(f"{d}/lineitem.parquet").count()
        == SC.BASE_ORDERS * SC.LINES_PER_ORDER
    )
    # fixed dims: identical content, not just schema
    assert spark.read.parquet(f"{d}/nation.parquet").count() == 25
    # referential shape: every order's custkey resolves
    o = spark.read.parquet(f"{d}/orders.parquet")
    c = spark.read.parquet(f"{d}/customer.parquet")
    from pyspark.sql import functions as FF
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    assert orphans == 0
    # date ranges keep the TPC-H-shaped predicates selective
    row = o.agg(
        FF.min("o_orderdate").alias("lo"), FF.max("o_orderdate").alias("hi")
    ).collect()[0]
    assert str(row["lo"]).startswith("1995-01-01")
    assert str(row["hi"]).startswith("2001-")


def test_zorder_clustering_prunes_on_both_columns(spark, tmp_path):
    """2-D grid: linear clustering on x gives y-predicates nothing to
    skip; Z-order keeps BOTH columns' per-file ranges narrow, so
    read_where prunes on either column — and pruned reads stay exactly
    equal to full-scan filters."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    store.overwrite("grid", df.repartition(16))

    # linear clustering on x: y still spans the full range in every file
    store.cluster_by("grid", ["x"], num_files=16)
    _kept, skipped_y_linear = store.prune_files("grid", "y", 10, 19)
    assert skipped_y_linear == 0

    store.cluster_by_zorder("grid", ["x", "y"], num_files=16)
    _kept, skipped_x = store.prune_files("grid", "x", 10, 19)
    _kept, skipped_y = store.prune_files("grid", "y", 10, 19)
    # a 16-file Z-layout of a 100x100 grid puts a 10-wide slab of either
    # dimension into ~half the curve cells
    assert skipped_x >= 8, skipped_x
    assert skipped_y >= 8, skipped_y
    for col in ("x", "y"):
        out = store.read_where("grid", col, 10, 19)
        full = store.read("grid").where(F.col(col).between(10, 19))
        assert sorted(r["payload"] for r in out.collect()) == sorted(
            r["payload"] for r in full.collect()
        )


def test_zorder_constant_and_skewed_columns(spark, tmp_path):
    """Degenerate inputs: a constant column (max == min) buckets to 0
    everywhere and must not break the key or the rewrite; row count and
    content survive the layout rewrite bit-for-bit."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(0, 1_000).select(
        F.lit(7).alias("c"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    store.overwrite("t", df.repartition(4))
    store.cluster_by_zorder("t", ["c", "k"], num_files=4)
    got = sorted((r["c"], r["k"], r["v"]) for r in store.read("t").collect())
    assert got == [(7, i, 2 * i) for i in range(1_000)]
    # constant column contributes nothing, so the layout degrades to
    # linear clustering on k — k-predicates still prune
    _kept, skipped = store.prune_files("t", "k", 0, 99)
    assert skipped >= 2


def test_overwrite_partitions_dynamic(spark, tmp_path):
    """Round-8: dynamic partition overwrite — replacing one hive
    partition rewrites O(changed partition) bytes, hardlinks the rest
    into the new version (same inode, zero copy), keeps whole-version
    atomicity and time travel, and equals a full overwrite row-wise."""
    import os

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    base = spark.range(0, 400).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    store.overwrite("t", base, partition_by=["g"])
    v1 = store._current_version("t")

    patch = spark.range(1000, 1010).select(
        F.lit(1).alias("g"), F.col("id").alias("v")
    )
    replaced = store.overwrite_partitions("t", patch, "g")
    assert replaced == ["g=1"]

    got = sorted((r["g"], r["v"]) for r in store.read("t").collect())
    want = sorted(
        (r["g"], r["v"])
        for r in base.where(F.col("g") != 1).unionByName(patch).collect()
    )
    assert got == want
    # time travel: the prior version still reads the old content
    old = sorted((r["g"], r["v"]) for r in store.read("t", v1).collect())
    assert old == sorted((r["g"], r["v"]) for r in base.collect())
    # hardlink evidence: untouched partitions share inodes across versions
    d1 = store._data_dir("t", v1)
    d2 = store._data_dir("t", v1 + 1)
    for part in ("g=0", "g=2", "g=3"):
        old_inodes = {
            os.stat(os.path.join(d1, part, f)).st_ino
            for f in os.listdir(os.path.join(d1, part))
            if f.endswith(".parquet")
        }
        new_inodes = {
            os.stat(os.path.join(d2, part, f)).st_ino
            for f in os.listdir(os.path.join(d2, part))
            if f.endswith(".parquet")
        }
        assert old_inodes and old_inodes == new_inodes, part
    # replaced partition must NOT share inodes (fresh bytes)
    ino1 = {
        os.stat(os.path.join(d1, "g=1", f)).st_ino
        for f in os.listdir(os.path.join(d1, "g=1"))
        if f.endswith(".parquet")
    }
    ino2 = {
        os.stat(os.path.join(d2, "g=1", f)).st_ino
        for f in os.listdir(os.path.join(d2, "g=1"))
        if f.endswith(".parquet")
    }
    assert not (ino1 & ino2)
    # vacuuming the old version must not corrupt the linked bytes
    store.vacuum("t", keep_versions=1)
    assert sorted(
        (r["g"], r["v"]) for r in store.read("t").collect()
    ) == want

    # guard rails: unpartitioned table / missing partition column
    import pytest

    store.overwrite("flat", spark.range(5).select(F.col("id").alias("v")))
    with pytest.raises(ValueError, match="not hive-partitioned"):
        store.overwrite_partitions(
            "flat", patch.withColumnRenamed("g", "p"), "p"
        )
    with pytest.raises(ValueError, match="lacks partition column"):
        store.overwrite_partitions("t", patch.drop("g"), "g")


def test_zorder_rank_bucketing_survives_outliers(spark, tmp_path):
    """Round-8 (verdict item 3): ONE outlier collapses linear min/max
    bucketing — every real value lands in bucket 0 and pruning dies —
    while rank (equi-depth percentile_approx) bucketing keeps ~1/2^bits
    of the ROWS per bucket no matter the value range, so the same band
    predicate skips at least half the files. Results stay exactly equal
    to the full-scan filter under both layouts."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    # uniform body in [0, 1000) plus one 1e12 outlier: the linear scale
    # becomes 1e12 / 1024 ≈ 1e9 per bucket → all real values bucket 0
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") == 0, F.lit(1.0e12))
        .otherwise((F.col("id") % 1000).cast("double"))
        .alias("v"),
        (F.col("id") % 100).alias("x"),
        F.col("id").alias("payload"),
    )
    store.overwrite("skewed", df.repartition(16))

    store.cluster_by_zorder("skewed", ["v", "x"], num_files=16)
    _kept, skipped_linear = store.prune_files("skewed", "v", 100.0, 199.0)
    assert skipped_linear == 0, skipped_linear

    store.cluster_by_zorder(
        "skewed", ["v", "x"], num_files=16, bucketing="rank"
    )
    _kept, skipped_rank = store.prune_files("skewed", "v", 100.0, 199.0)
    assert skipped_rank >= 8, skipped_rank
    # the other interleaved axis still prunes too (the z-order property)
    _kept, skipped_x = store.prune_files("skewed", "x", 10, 19)
    assert skipped_x >= 4, skipped_x
    out = store.read_where("skewed", "v", 100.0, 199.0)
    full = store.read("skewed").where(F.col("v").between(100.0, 199.0))
    assert sorted(r["payload"] for r in out.collect()) == sorted(
        r["payload"] for r in full.collect()
    )


def _pq_files_per_partition(store, table, partition_col):
    data_dir = store._data_dir(table, store._current_version(table))
    out = {}
    for name in os.listdir(data_dir):
        pdir = os.path.join(data_dir, name)
        if name.startswith(f"{partition_col}=") and os.path.isdir(pdir):
            out[name] = sorted(
                os.path.join(dp, f)
                for dp, _d, fs in os.walk(pdir)
                for f in fs
                if f.endswith(".parquet")
            )
    return out


def test_compact_partitions_scoped_rewrite(spark, tmp_path):
    """Partition-scoped compaction rewrites ONLY the offending partitions
    (one file each), hardlinks healthy partitions (same inodes), preserves
    content exactly, and no-ops (no version bump) when everything is
    healthy."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "whc"))
    base = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    store.overwrite("t", base.repartition(3, "p"), partition_by=["p"])
    # bloat partitions p=0 and p=1 with 6 small appends each; p=2 untouched
    for _ in range(6):
        store.append(
            "t",
            base.where(F.col("p") < 2).limit(40).repartition(2),
            partition_by=["p"],
        )
    before = _pq_files_per_partition(store, "t", "p")
    assert len(before["p=0"]) > 4 and len(before["p=1"]) > 4
    healthy_inodes = {os.stat(f).st_ino for f in before["p=2"]}
    want = sorted(map(tuple, store.read("t").collect()))

    compacted = store.compact_partitions("t", "p", max_files=4)
    assert set(compacted) == {"p=0", "p=1"}
    assert compacted["p=0"] == len(before["p=0"])

    after = _pq_files_per_partition(store, "t", "p")
    assert len(after["p=0"]) == 1 and len(after["p=1"]) == 1
    # healthy partition carried over by hardlink: same inode, zero copy
    assert {os.stat(f).st_ino for f in after["p=2"]} == healthy_inodes
    assert sorted(map(tuple, store.read("t").collect())) == want
    # pre-compaction version still time-travels
    prev = store._current_version("t") - 1
    assert sorted(map(tuple, store.read("t", version=prev).collect())) == want

    # idempotent: second call finds nothing, writes nothing
    v = store._current_version("t")
    assert store.compact_partitions("t", "p", max_files=4) == {}
    assert store._current_version("t") == v


def test_compact_partitions_refreshes_stats_incrementally(spark, tmp_path):
    """When a stats manifest exists, compaction writes a manifest for the
    new version: carried files keep their entries verbatim (no footer
    re-read needed), fresh files get new entries, and read_where pruning
    keeps working."""
    import json as _json

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "whs"))
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    store.overwrite("t", base.repartition(4, "p"), partition_by=["p"])
    for _ in range(5):
        store.append(
            "t",
            base.where(F.col("p") == 0).limit(30).repartition(2),
            partition_by=["p"],
        )
    store.collect_stats("t")
    old_version = store._current_version("t")
    with open(store._stats_path("t", old_version)) as f:
        old_stats = _json.load(f)["files"]

    compacted = store.compact_partitions("t", "p", max_files=4)
    assert set(compacted) == {"p=0"}
    new_version = store._current_version("t")
    spath = store._stats_path("t", new_version)
    assert os.path.exists(spath)
    with open(spath) as f:
        new_stats = _json.load(f)["files"]
    # carried files: identical entries under the same relative path
    carried = {r for r in new_stats if not r.startswith("p=0/")}
    assert carried and all(new_stats[r] == old_stats[r] for r in carried)
    # compacted partition: exactly one fresh file entry
    fresh = [r for r in new_stats if r.startswith("p=0/")]
    assert len(fresh) == 1 and fresh[0] not in old_stats
    # pruning still works against the refreshed manifest: an
    # out-of-range probe skips EVERY file (each entry has usable
    # min/max), and an in-range read stays correct
    kept, skipped = store.prune_files("t", "k", 1000, 2000, version=new_version)
    assert skipped == len(new_stats) and not kept
    got = store.read_where("t", "k", 0, 3).count()
    want = store.read("t").where(F.col("k").between(0, 3)).count()
    assert got == want > 0


def test_compact_partitions_writes_stats_before_flip(spark, tmp_path):
    """Round-11 advice fix: the refreshed stats manifest must land BEFORE
    the version flip — a crash between the flip and a post-flip manifest
    write would leave the live version stats-less, silently disabling
    file skipping. Simulated by failing _set_version itself: the new
    version's manifest must already be on disk while the pointer still
    names the old version (stats are version-keyed, so the early write is
    invisible to current readers)."""
    import json as _json

    import pytest as _pytest

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "whf"))
    base = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    store.overwrite("t", base.repartition(2, "p"), partition_by=["p"])
    for _ in range(5):
        store.append(
            "t",
            base.where(F.col("p") == 0).limit(20).repartition(2),
            partition_by=["p"],
        )
    store.collect_stats("t")
    old_version = store._current_version("t")

    real_set = store._set_version

    def _boom(table, version):
        raise RuntimeError("injected crash at the flip")

    store._set_version = _boom
    try:
        with _pytest.raises(RuntimeError, match="injected crash"):
            store.compact_partitions("t", "p", max_files=4)
    finally:
        store._set_version = real_set
    # pointer untouched, old version + old stats still the live pair...
    assert store._current_version("t") == old_version
    assert os.path.exists(store._stats_path("t", old_version))
    # ...and the NEW version's manifest already exists pre-flip
    new_stats_path = store._stats_path("t", old_version + 1)
    assert os.path.exists(new_stats_path)
    with open(new_stats_path) as f:
        per_file = _json.load(f)["files"]
    assert per_file  # non-empty: written from the fully-landed new files
    # a rerun (no injected crash) completes and the live pair is coherent
    compacted = store.compact_partitions("t", "p", max_files=4)
    assert set(compacted) == {"p=0"}
    live = store._current_version("t")
    assert os.path.exists(store._stats_path("t", live))
    got = store.read_where("t", "k", 0, 3).count()
    want = store.read("t").where(F.col("k").between(0, 3)).count()
    assert got == want > 0


def test_compact_partitions_layout_guard(spark, tmp_path):
    """A flat (unpartitioned) table raises instead of silently reporting
    nothing to compact."""
    import pytest as _pytest

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "whf"))
    store.overwrite("t", spark.range(0, 10).select(F.col("id").alias("k")))
    with _pytest.raises(ValueError, match="not hive-partitioned"):
        store.compact_partitions("t", "p", max_files=1)


def test_compact_partitions_random_bloat_property(spark, tmp_path):
    """Seeded-random property sweep: arbitrary interleavings of
    partitioned appends (varying file counts and partition subsets)
    followed by compaction at a random threshold always preserve content
    exactly, never leave a compacted partition above one file, and never
    touch a below-threshold partition (inode evidence)."""
    import random

    from ecommerce_full_etl_process_spark.sources.io import TableStore

    rng = random.Random(101)
    for trial in range(3):
        store = TableStore(spark, str(tmp_path / f"whp{trial}"))
        n_parts = rng.randrange(3, 6)
        base = spark.range(0, 120 * n_parts).select(
            F.col("id").alias("k"), (F.col("id") % n_parts).alias("p")
        )
        store.overwrite(
            "t", base.repartition(n_parts, "p"), partition_by=["p"]
        )
        for _ in range(rng.randrange(2, 7)):
            subset = rng.sample(range(n_parts), rng.randrange(1, n_parts))
            store.append(
                "t",
                base.where(F.col("p").isin(subset)).limit(
                    rng.randrange(10, 80)
                ).repartition(rng.randrange(1, 4)),
                partition_by=["p"],
            )
        want = sorted(map(tuple, store.read("t").collect()))
        before = _pq_files_per_partition(store, "t", "p")
        max_files = rng.randrange(1, 5)
        compacted = store.compact_partitions("t", "p", max_files=max_files)
        after = _pq_files_per_partition(store, "t", "p")

        assert set(compacted) == {
            n for n, fs in before.items() if len(fs) > max_files
        }
        for name in after:
            if name in compacted:
                assert len(after[name]) == 1
            else:  # healthy partition: identical files by inode
                assert {os.stat(f).st_ino for f in after[name]} == {
                    os.stat(f).st_ino for f in before[name]
                }
        assert sorted(map(tuple, store.read("t").collect())) == want


def test_compact_partitions_max_records_per_file(spark, tmp_path):
    """A partition too big for one healthy file splits at the record cap
    during compaction (writer maxRecordsPerFile), content preserved."""
    from ecommerce_full_etl_process_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "whr"))
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    store.overwrite("t", base.repartition(2, "p"), partition_by=["p"])
    for _ in range(5):
        store.append("t", base.limit(60).repartition(2), partition_by=["p"])
    want = sorted(map(tuple, store.read("t").collect()))
    compacted = store.compact_partitions(
        "t", "p", max_files=4, max_records_per_file=200
    )
    assert set(compacted) == {"p=0", "p=1"}
    after = _pq_files_per_partition(store, "t", "p")
    # p=0 holds 500 base + appended rows -> ceil(rows/200) files, > 1
    assert 2 <= len(after["p=0"]) <= 4
    assert sorted(map(tuple, store.read("t").collect())) == want
