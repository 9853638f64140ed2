"""End-to-end demo — entry point 2 of the reference (demo.ipynb, SURVEY §3):
populate clean OLTP data, inject dirty records, run the ETL pipeline, print
the run report and the 9-check data-quality verification.

Usage:
    python -m ecommerce_full_etl_process_spark.demo \
        --today 2026-02-02 --users 100 --products 25 --transactions 250 \
        --invalid 30 --warehouse /tmp/etl_warehouse

Exit code 0 iff the run succeeds AND all QA checks pass (the reference's
PASS/FAIL report, demo.ipynb cell 26).

Corpus mode (beyond-reference): ``--corpus /root/testdata/sf0.01`` prints
the training-corpus curation report instead — per-source funnel, near-dup
pairs, packing and quantization summaries, each with a PASS/FAIL
invariant.
"""

from __future__ import annotations

import argparse
import sys
from datetime import date, datetime

from pyspark.sql import functions as F

from .plans import pipeline
from .session import get_spark
from .sources import generators as G
from .sources.io import TableStore


def qa_checks(store: TableStore) -> dict[str, int]:
    """The 9 golden zero-count invariants (demo.ipynb cell 26)."""
    du = store.read(pipeline.DIM_USER)
    dp = store.read(pipeline.DIM_PRODUCT)
    ft = store.read(pipeline.FACT_TRANSACTIONS)
    return {
        "empty_or_null_dim_user_names": du.where(
            F.col("name").isNull() | (F.trim("name") == "")
        ).count(),
        "invalid_dim_user_emails": du.where(~F.col("email").like("%@%.%")).count(),
        "negative_dim_product_prices": dp.where(F.col("price") < 0).count(),
        "dim_product_price_ge_10000": dp.where(F.col("price") >= 10000).count(),
        "fact_quantity_le_0": ft.where(F.col("quantity") <= 0).count(),
        "fact_invalid_status": ft.where(
            ~F.col("status").isin("success", "failed")
        ).count(),
        "fact_invalid_payment_type": ft.where(
            ~F.col("payment_type").isin(
                "visa", "mastercard", "wire transfer", "other"
            )
        ).count(),
        "fact_orphan_user_sk": ft.join(
            du.select("user_sk"), "user_sk", "left_anti"
        ).count(),
        "fact_orphan_product_sk": ft.join(
            dp.select("product_sk"), "product_sk", "left_anti"
        ).count(),
    }


def corpus_report(spark, sf_dir: str) -> int:
    """Training-corpus curation report (the LLM-pipeline counterpart of
    the ETL QA report): per-source curation funnel, near-dup pairs,
    packing and quantization summaries, each with a PASS/FAIL invariant.
    Exit code 0 iff every invariant holds."""
    from .plans import llm_queries as lq

    print(f"== corpus curation report over {sf_dir} ==")
    funnel = lq.corpus_prep_pipeline(spark, sf_dir).orderBy("source").collect()
    print(f"  {'source':<8} {'docs':>6} {'quality':>8} {'dup':>5} "
          f"{'contam':>7} {'final':>6} {'tokens':>9}")
    ok = True
    for r in funnel:
        print(f"  {r['source']:<8} {r['n_docs']:>6} "
              f"{r['n_quality_rejected']:>8} {r['n_dup_removed']:>5} "
              f"{r['n_contaminated']:>7} {r['n_final']:>6} "
              f"{r['tokens_final']:>9}")
        ok = ok and (
            r["n_quality_rejected"] + r["n_dup_removed"]
            + r["n_contaminated"] + r["n_final"] == r["n_docs"]
        )
    print(f"  [{'PASS' if ok else 'FAIL'}] funnel stages sum to n_docs")

    pairs = lq.minhash_lsh_neardups(spark, sf_dir)
    n_pairs = pairs.count()
    n_below = pairs.where(F.col("jaccard_sim") < 0.5).count()
    print(f"== near-duplicates (MinHash+LSH): {n_pairs} verified pairs ==")
    mark = n_below == 0
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] all pairs >= 0.5 jaccard "
          f"({n_below} below)")

    packs = lq.token_budget_packing(spark, sf_dir).collect()
    total_fill = sum(r["n_tokens"] for r in packs)
    print(f"== packing: {len(packs)} bins, {total_fill} tokens ==")
    # bins per language must be gapless 0..max (the prefix-sum assignment
    # can overfill a bin by at most one straddling doc, never skip one)
    by_lang: dict[str, list[int]] = {}
    for r in packs:
        by_lang.setdefault(r["lang"], []).append(r["bin"])
    gaps = {
        lang: bins
        for lang, bins in by_lang.items()
        if sorted(bins) != list(range(max(bins) + 1))
    }
    mark = not gaps
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] bins gapless per language "
          f"({len(gaps)} languages with gaps)")

    quant = lq.embedding_quantization(spark, sf_dir)
    bad_q = quant.where(
        (F.col("max_q") > 127) | (F.col("rmse") > F.col("scale") / 2 + 1e-9)
    ).count()
    print(f"== int8 quantization: {quant.count()} vectors ==")
    mark = bad_q == 0
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] levels <= 127 and "
          f"rmse <= scale/2 ({bad_q} violations)")

    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def stream_dedup_report(spark, workdir: str) -> int:
    """Drive the continuous-dedup loop end-to-end on a synthetic feed:
    two micro-batches where batch 2 near-duplicates an archived batch-1
    doc, then replay from a fresh checkpoint. PASS iff the cross-batch
    dup is caught, fresh docs are kept, and replay commits nothing new."""
    import os
    import shutil

    from .streaming.stream_pipeline import run_streaming_dedup_ingest

    shutil.rmtree(workdir, ignore_errors=True)
    src = os.path.join(workdir, "incoming")
    wh = os.path.join(workdir, "wh")
    os.makedirs(src)
    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards brew strong potions under a pale winter moon")

    def _feed(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def _run(ckpt):
        q = run_streaming_dedup_ingest(spark, src, os.path.join(workdir, ckpt), wh)
        q.awaitTermination(120)

    print(f"== streaming dedup ingest under {workdir} ==")
    _feed([(1, base), (2, "unrelated text about atomic manifest flips and versioned parquet tables")])
    _run("ckpt1")
    _feed([(10, base + " tonight"), (11, "fresh unique document mentioning broadcast joins and skew salting")])
    _run("ckpt1")
    store = TableStore(spark, wh)
    log = {r["doc_id"]: r for r in store.read("dedup_log").collect()}
    ok = True
    mark = (not log[10]["keep"]) and log[10]["dup_of"] == 1
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] cross-batch near-dup 10 -> dup_of 1")
    mark = log[1]["keep"] and log[2]["keep"] and log[11]["keep"]
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] originals and fresh docs kept")
    n_before = store.read("dedup_log").count()
    _run("ckpt_replay")  # fresh checkpoint re-delivers every file
    mark = store.read("dedup_log").count() == n_before
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] replay committed 0 new rows "
          f"({n_before} total)")
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def cdc_report(spark, workdir: str) -> int:
    """Drive the CDC consumer end-to-end on a synthetic feed: a
    partitioned snapshot, an out-of-order two-batch log through the
    versioned apply, a patch log, and the CDC × MV maintenance loop.
    PASS iff every surface converges to its whole-log fold."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from .operators.cdc import (
        apply_cdc,
        apply_cdc_partitioned,
        apply_cdc_patch,
        apply_cdc_versioned,
        strip_versioned,
        to_versioned,
    )
    from .operators.incremental import finalize_aggs
    from .streaming.stream_pipeline import (
        init_cdc_mv,
        run_cdc_mv_maintenance,
    )

    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    print(f"== CDC consumer report under {workdir} ==")
    ok = True
    chg_schema = "k long, g string, v double, seq long, op string"
    snap = spark.createDataFrame(
        [(k, "ab"[k % 2], float(k)) for k in range(20)],
        "k long, g string, v double",
    )
    log = [
        (1, "a", 11.0, 5, "U"), (2, "a", 0.0, 2, "D"),
        (1, "a", 7.0, 3, "U"),  # late: must lose to seq 5
        (25, "b", 25.0, 1, "I"), (3, "b", 0.0, 4, "D"),
    ]
    whole = apply_cdc(
        snap, spark.createDataFrame(log, chg_schema), ["k"], "seq"
    )
    want = sorted(map(tuple, whole.collect()))

    # 1. versioned apply over an out-of-order split
    vs = to_versioned(snap)
    for batch in ([log[0], log[4]], [log[1], log[2], log[3]]):
        vs = apply_cdc_versioned(
            vs, spark.createDataFrame(batch, chg_schema), ["k"], "seq"
        ).localCheckpoint(eager=True)
    mark = sorted(map(tuple, strip_versioned(vs).collect())) == want
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] out-of-order split apply == whole-log fold")

    # 2. partition-scoped apply on a hive-partitioned store
    store = TableStore(spark, os.path.join(workdir, "wh_part"))
    store.overwrite("snap", snap, partition_by=["g"])
    replaced = apply_cdc_partitioned(
        store,
        "snap",
        spark.createDataFrame(log, chg_schema),
        ["k"],
        "seq",
        "g",
    )
    got = sorted(map(tuple, store.read("snap").select("k", "g", "v").collect()))
    mark = got == want
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] partition-scoped apply == whole-log fold "
          f"(replaced {replaced})")

    # 3. patch apply: per-column weave
    patch_schema = chg_schema + ", set_cols array<string>"
    patches = [
        (1, "a", 99.0, 1, "U", ["v"]),   # sets v only
        (1, "zz", 0.0, 2, "U", ["g"]),   # sets g only — same row weaves both
    ]
    patched = apply_cdc_patch(
        snap, spark.createDataFrame(patches, patch_schema), ["k"], "seq"
    )
    row = patched.where(F.col("k") == 1).collect()[0]
    mark = (row["g"], row["v"]) == ("zz", 99.0)
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] patch apply weaves v@seq1 + g@seq2 into one row")

    # 4. CDC × MV loop: snapshot + aggregate maintained exactly-once
    src = os.path.join(workdir, "feed")
    os.makedirs(src)
    for batch in ([log[0], log[4]], [log[1], log[2], log[3]]):
        spark.createDataFrame(batch, chg_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    mv_store = TableStore(spark, os.path.join(workdir, "wh_mv"))
    init_cdc_mv(mv_store, snap, ["g"], "v")
    q = run_cdc_mv_maintenance(
        spark, src, os.path.join(workdir, "ckpt"),
        os.path.join(workdir, "wh_mv"), chg_schema,
        ["k"], "seq", ["g"], "v",
    )
    if not q.awaitTermination(120):
        q.stop()
        print("  [FAIL] CDC x MV stream did not drain within 120s")
        print("RESULT: FAIL")
        return 1
    got_agg = {
        r["g"]: (r["n_rows"], r["value_sum"])
        for r in finalize_aggs(
            mv_store.read("agg_state").drop("last_batch")
        ).collect()
    }
    want_agg = {
        r["g"]: (r["n_rows"], r["value_sum"])
        for r in finalize_aggs(
            whole.groupBy("g").agg(
                F.count("v").alias("cnt"), F.sum("v").alias("sum"),
                F.min("v").alias("min"), F.max("v").alias("max"),
            )
        ).collect()
    }
    mark = got_agg == want_agg
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] CDC x MV loop aggregate == whole-log recompute")

    # 5. streaming partitioned×versioned warehouse (round-10): the same
    # out-of-order feed drains into a hive-partitioned tombstone-safe
    # snapshot, one pruned partition rewrite per micro-batch
    from .streaming.stream_pipeline import (
        init_cdc_partitioned_warehouse,
        run_cdc_partitioned_warehouse,
    )

    pw_store = TableStore(spark, os.path.join(workdir, "wh_pw"))
    init_cdc_partitioned_warehouse(pw_store, snap, "g")
    q = run_cdc_partitioned_warehouse(
        spark, src, os.path.join(workdir, "ckpt_pw"),
        os.path.join(workdir, "wh_pw"), chg_schema,
        ["k"], "seq", "g", keep_versions=2,
    )
    if not q.awaitTermination(120):
        q.stop()
        print("  [FAIL] partitioned CDC stream did not drain within 120s")
        print("RESULT: FAIL")
        return 1
    got_pw = sorted(
        map(
            tuple,
            strip_versioned(
                pw_store.read("snapshot").drop("last_batch")
            ).select("k", "g", "v").collect(),
        )
    )
    mark = got_pw == want
    ok = ok and mark
    print(f"  [{'PASS' if mark else 'FAIL'}] streaming partitioned warehouse == whole-log fold")
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--cdc",
        metavar="WORKDIR",
        help="drive the CDC consumer (versioned/partitioned/patch apply "
        "+ the CDC x MV loop) end-to-end in this scratch directory and "
        "print its PASS/FAIL report",
    )
    ap.add_argument(
        "--corpus",
        metavar="SF_DIR",
        help="run the training-corpus curation report over this testdata "
        "dir instead of the ETL demo",
    )
    ap.add_argument(
        "--stream-dedup",
        metavar="WORKDIR",
        help="drive the continuous streaming-dedup loop end-to-end in "
        "this scratch directory and print its PASS/FAIL report",
    )
    ap.add_argument("--today", default="2026-02-02")
    ap.add_argument("--users", type=int, default=100)
    ap.add_argument("--products", type=int, default=25)
    ap.add_argument("--transactions", type=int, default=250)
    ap.add_argument("--invalid", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--warehouse", default="/tmp/etl_warehouse")
    args = ap.parse_args(argv)

    today = datetime.strptime(args.today, "%Y-%m-%d").date()
    spark = get_spark(app_name="etl-demo")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cdc:
        return cdc_report(spark, args.cdc)
    if args.corpus:
        return corpus_report(spark, args.corpus)
    if args.stream_dedup:
        return stream_dedup_report(spark, args.stream_dedup)
    store = TableStore(spark, args.warehouse)

    print(f"== populate: {args.users} users, {args.products} products, "
          f"{args.transactions} tx lines, {args.invalid} dirty records ==")
    dfs, batch = G.generate_oltp(
        spark,
        seed=args.seed,
        n_users=args.users,
        n_products=args.products,
        n_transactions=args.transactions,
        n_dirty=args.invalid,
        today=today,
    )

    print(f"== run ETL for {today} ==")
    summary = pipeline.run(
        spark, store, today, dfs["users"], dfs["products"], dfs["transactions"]
    )
    print(f"status: {summary.status}  run_id: {summary.run_id}")
    for k, v in summary.counters.items():
        print(f"  {k}: {v}")

    print("== error breakdown ==")
    el = store.read("etl_error_log").where(F.col("run_id") == summary.run_id)
    for r in (
        el.groupBy("error_type", "severity")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .collect()
    ):
        print(f"  {r['error_type']:<22} {r['severity']:<8} {r['n']}")

    print("== data-quality verification (expect all 0) ==")
    checks = qa_checks(store)
    ok = True
    for name, n in checks.items():
        mark = "PASS" if n == 0 else "FAIL"
        ok = ok and n == 0
        print(f"  [{mark}] {name}: {n}")
    print("RESULT:", "PASS" if ok and summary.status == "success" else "FAIL")
    return 0 if ok and summary.status == "success" else 1


if __name__ == "__main__":
    sys.exit(main())
