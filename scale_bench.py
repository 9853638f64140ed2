#!/usr/bin/env python
"""Scale-headroom benchmark: time the heavy operators at ×1 vs ×N data.

The per-round bench (bench.py) runs at sf0.1, where fixed job overhead
(~0.2 s/AQE stage) dominates — it proves speed, not SCALING. This harness
generates identically-distributed corpora at ×1 and ×N the sf0.1 row
counts (sources/scale_corpus.py: deterministic, fully distributed) and
times the heavy operators at both, so the wall-time growth ratio isolates
how the PLAN scales with data volume: near-linear growth (ratio ≲ N, and
in practice well under N while fixed overhead amortizes) is the evidence
that the 100 TB design claims hold; a super-linear ratio flags a plan that
would blow up on a real cluster.

Usage:
    python scale_bench.py                 # multipliers 1,10 → SCALEBENCH.json
    python scale_bench.py --multipliers 1,10,30 --repeats 2

Prints ONE JSON line:
    {"metric": "scale_headroom", "multipliers": [...],
     "queries": {name: {"x1": s, "xN": s, "growth_xN": r}}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_full_etl_process_spark.plans import catalog  # noqa: E402
from ecommerce_full_etl_process_spark.session import get_spark  # noqa: E402
from ecommerce_full_etl_process_spark.sources import scale_corpus  # noqa: E402

#: the operators whose 100 TB claims need volume evidence — everything
#: here is super-constant work per row (LSH banding, CC, Lloyd rounds,
#: per-user windows, micro-batch streaming), where a quadratic term or a
#: driver bottleneck would show up as super-linear growth
HEAVY = [
    "minhash_lsh_neardups",
    "corpus_dedup_components",
    "simhash_planted_pairs",
    "similarity_topk_ivf",
    "sessionize_events",
    "streaming_event_counts",
    # round-5 additions: the new shuffle-bearing curation operators
    "line_dedup_corpus",       # window by line + regroup by doc
    "corpus_prep_pipeline",    # dedup window + per-source aggregate
    "bpe_merge_candidates",    # vocab collapse + pair aggregate + top-k
    # round-5 session: row-local Counter kernel + vocab-bounded broadcast
    # model — the claim is the model never grows with the corpus
    "trigram_lm_scores",
    # round-6: retention policy rides the same LSH+CC jobs — growth must
    # track corpus_dedup_components, not exceed it
    "dedup_keep_best_quality",
    # round-7: bounded-state MG sketch — candidate state is fixed (≤k per
    # partition), so growth must be the token-stream scan, near-linear
    "heavy_hitter_bigrams",
]

#: TPC-H-side scale headroom (round-6): the star-join half of the engine
#: timed on ×N relational data — these are the shapes that must hold at
#: 100× (reference analogue: demo.ipynb cell 26's star-join QA queries).
RELATIONAL = [
    "flagship_revenue_by_nation",   # fact⋈fact shuffle + broadcast dims
    "pricing_summary",              # full-scan wide aggregation
    "shipping_priority",            # selective filter + join + top-k
    "asof_events_to_orders",        # as-of point-in-time join
    "latest_order_per_customer",    # window dedup over orders
    "scd2_merge_customers",         # SCD2 merge centerpiece
    "scd2_intervals_from_orders",   # lead() interval construction
    "bloom_filtered_orders",        # bloom build + prefiltered semi join
    "hopping_event_rates",          # 4x window fan-out + one aggregate
    # round-7 session additions
    "bilateral_trade_volume",       # Q7: two shuffle joins + dict filters
    "product_type_profit",          # Q9: star join, decimal-exact profit agg
    # late-round-7 additions
    "discount_band_revenue",        # Q6: pure pushdown + one global agg
    "repeat_purchases_within_90d",  # interval×point range join (fact×fact)
    "snapshot_diff_orders",         # FULL OUTER keyed reconciliation diff
    "data_quality_expectations",    # one-scan expectation suite
    "incremental_monthly_revenue",  # partial-state merge refresh
    "cdc_apply_orders",             # CDC log fold: window winner + anti join
]

#: queries whose ``.count()`` lets Catalyst eliminate the operator under
#: test (repeat_purchases: the aggregate groups by a unique key, so the
#: left join back — and with it the entire range join subtree — drops out
#: of a count-only plan; verified via optimizedPlan: 2 joins → 0). These
#: are timed by hashing EVERY output value instead, so the committed
#: growth factor measures the real operator, not a pruned scan.
FORCE_MATERIALIZE = {"repeat_purchases_within_90d"}


def _execute(df, name: str) -> int:
    """Execute a query for timing: ``.count()`` unless the query is in
    FORCE_MATERIALIZE, in which case bit_xor(xxhash64(*)) folds every
    output value through one scalar — no driver-side result transfer,
    nothing prunable — and the row count comes from a cheap length probe
    on the same already-computed action semantics (count runs untimed by
    the caller in that case)."""
    if name in FORCE_MATERIALIZE:
        from pyspark.sql import functions as F

        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("h")).collect()
        return -1
    return df.count()

SCALE_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/root/repo/.scale")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multipliers", default="1,10")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="SCALEBENCH.json")
    ap.add_argument(
        "--sections",
        default="all",
        help="comma list of sections to run (heavy,incremental,relational,"
        "asof,skew,cdc_partitioned,compaction,streaming_state,"
        "streaming_warehouse,streaming_warehouse_rocksdb,ivf_refresh,"
        "ivf_clustered) — a subset run MERGES its "
        "results into the existing artifact instead of replacing it",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.multipliers.split(",")]
    sections = set(args.sections.split(","))

    def _want(name: str) -> bool:
        return "all" in sections or name in sections

    spark = get_spark(app_name="scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()

    dirs: dict[int, str] = {}
    if (
        _want("heavy")
        or _want("incremental")
        or _want("ivf_refresh")
        or _want("ivf_clustered")
    ):
        for m in mults:
            d = os.path.join(SCALE_ROOT, f"x{m}")
            t0 = time.perf_counter()
            scale_corpus.write_scale_dir(spark, d, m)
            print(
                f"scale_bench: corpus x{m} ready in "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            dirs[m] = d

    rows: dict[str, dict[int, int]] = {}
    timings: dict[str, dict[str, float]] = {n: {} for n in HEAVY}
    errors: dict[str, str] = {}
    import gc

    if _want("heavy"):
        # warm the JVM once so x1 doesn't absorb first-job startup cost
        queries[HEAVY[0]](spark, dirs[mults[0]]).limit(1).count()

    for name in HEAVY if _want("heavy") else []:
        for m in mults:
            try:
                samples = []
                nrows = 0
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    nrows = _execute(queries[name](spark, dirs[m]), name)
                    samples.append(time.perf_counter() - t0)
                if nrows < 0:  # forced-materialize path: rows untimed
                    nrows = queries[name](spark, dirs[m]).count()
                timings[name][f"x{m}"] = round(min(samples), 3)
                rows.setdefault(name, {})[m] = nrows
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[f"{name}@x{m}"] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"scale_bench: {name}@x{m} FAILED", file=sys.stderr)
            # measurement hygiene: earlier heavy queries leave checkpointed
            # blocks + garbage that GC-pause LATER measurements (observed:
            # steady-state 1.4s read as 5s mid-suite). Drop Python-side
            # DataFrame refs so the ContextCleaner unpersists their RDDs,
            # then force a JVM GC so the next timing starts clean.
            gc.collect()
            spark.sparkContext._jvm.System.gc()
    # ---- incremental-dedup headroom: FIXED batch vs GROWING archive -----
    # The claim under test: per-ingest cost of the index-probe path is
    # O(batch + collisions), not O(archive). A fixed 500-doc batch against
    # a ×1/×10/×30 archive should time ~flat for the incremental path
    # while the full-corpus rerun grows with the archive. The index build
    # is NOT timed — it is amortized across every later ingest (that is
    # the operator's point).
    incremental: dict[str, dict[str, float]] = {}
    try:
        from pyspark.sql import functions as F

        from ecommerce_full_etl_process_spark.operators import dedup as D

        for m in mults if _want("incremental") else []:
            docs = spark.read.parquet(
                os.path.join(dirs[m], "documents.parquet")
            ).select("doc_id", "text")
            n_docs = scale_corpus.BASE_DOCS * m
            step = max(n_docs // 500, 1)
            words = F.split(F.col("text"), " ")
            batch = docs.where(
                (F.col("doc_id") % step == 0) & (F.col("doc_id") < step * 500)
            ).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))),
                ).alias("text"),
            )
            index = D.minhash_band_index(
                docs, "doc_id", "text"
            ).localCheckpoint(eager=True)
            inc_s, full_s = [], []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                D.minhash_lsh_pairs_incremental(
                    batch, docs, index, "doc_id", "text"
                ).count()
                inc_s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                D.minhash_lsh_pairs(
                    docs.unionByName(batch), "doc_id", "text"
                ).count()
                full_s.append(time.perf_counter() - t0)
            incremental[f"x{m}"] = {
                "incremental": round(min(inc_s), 3),
                "full_rerun": round(min(full_s), 3),
            }
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        if incremental:
            b = incremental[f"x{mults[0]}"]
            for m in mults[1:]:
                cur = incremental[f"x{m}"]
                cur["growth_incremental"] = round(
                    cur["incremental"] / b["incremental"], 2
                )
                cur["growth_full"] = round(
                    cur["full_rerun"] / b["full_rerun"], 2
                )
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["incremental_dedup"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- relational (TPC-H-side) scale headroom -------------------------
    rel_dirs: dict[int, str] = {}
    rel_timings: dict[str, dict[str, float]] = {n: {} for n in RELATIONAL}
    try:
        if (
            _want("relational")
            or _want("asof")
            or _want("cdc_partitioned")
            or _want("compaction")
            or _want("streaming_warehouse")
            or _want("streaming_warehouse_rocksdb")
        ):
            for m in mults:
                d = os.path.join(SCALE_ROOT, f"rel_x{m}")
                t0 = time.perf_counter()
                scale_corpus.write_relational_scale_dir(spark, d, m)
                print(
                    f"scale_bench: relational x{m} ready in "
                    f"{time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                )
                rel_dirs[m] = d
        for name in RELATIONAL if _want("relational") else []:
            for m in mults:
                try:
                    samples = []
                    nrows = 0
                    for _ in range(args.repeats):
                        t0 = time.perf_counter()
                        nrows = _execute(
                            queries[name](spark, rel_dirs[m]), name
                        )
                        samples.append(time.perf_counter() - t0)
                    if nrows < 0:  # forced-materialize path: rows untimed
                        nrows = queries[name](spark, rel_dirs[m]).count()
                    rel_timings[name][f"x{m}"] = round(min(samples), 3)
                    rows.setdefault(name, {})[m] = nrows
                except Exception as exc:  # noqa: BLE001 — isolate per query
                    errors[f"{name}@rel_x{m}"] = (
                        f"{type(exc).__name__}: {exc}"[:500]
                    )
                    print(f"scale_bench: {name}@rel_x{m} FAILED", file=sys.stderr)
                gc.collect()
                spark.sparkContext._jvm.System.gc()
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["relational_corpus"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- as-of join growth decomposition (round-7) ----------------------
    # SCALEBENCH's steepest relational line is asof_events_to_orders
    # (×30 growth ~8.4 while output rows grow 30×). Decompose WHERE the
    # time goes at each scale so join cost is separable from result
    # materialization:
    #   join_fanout   — events⋈orders + range filter only (.count();
    #                   the per-user fan-out term, pre-aggregation)
    #   asof_count    — the full query via .count(); Catalyst prunes the
    #                   struct-max aggregate down to its grouping keys
    #   asof_hash     — xxhash64 over ALL output columns summed, forcing
    #                   the as-of key to actually materialize (what a
    #                   downstream consumer pays)
    # The 100×-safety claim holds iff each component's growth ≲ its row
    # growth (joined rows for the first, output rows for the others).
    asof_decomp: dict[str, dict[str, float]] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.plans import (
            operator_queries as oq,
        )

        for m in mults if _want("asof") else []:
            d = rel_dirs[m]
            e = spark.read.parquet(os.path.join(d, "events.parquet")).select(
                "event_id", "user_id", "ts"
            )
            o = spark.read.parquet(os.path.join(d, "orders.parquet")).select(
                F.col("o_custkey").alias("user_id"),
                "o_orderkey",
                "o_orderdate",
            )
            joined = e.join(o, "user_id").where(
                F.col("o_orderdate") <= F.col("ts")
            )
            comp: dict[str, float] = {}
            jf, ac, ah = [], [], []
            jrows = orows = 0
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jrows = joined.count()
                jf.append(time.perf_counter() - t0)
                full = oq.asof_events_to_orders_fanout(spark, d)
                t0 = time.perf_counter()
                orows = full.count()
                ac.append(time.perf_counter() - t0)
                full = oq.asof_events_to_orders_fanout(spark, d)
                t0 = time.perf_counter()
                # bit_xor, not sum: summing 64-bit hashes overflows under
                # ANSI mode; xor folds without overflow and still forces
                # every output value to materialize
                full.select(
                    F.bit_xor(
                        F.xxhash64("event_id", "user_id", "asof_orderkey")
                    )
                ).collect()
                ah.append(time.perf_counter() - t0)
            # merge strategy (round 7): same semantics, fanout-free —
            # union timeline + ONE exchange + carry-forward window.
            # Timed with the same forced-materialization hash probe so
            # the two strategies are directly comparable.
            mh = []
            for _ in range(args.repeats):
                merged = oq.asof_events_to_orders_merge(spark, d)
                t0 = time.perf_counter()
                merged.select(
                    F.bit_xor(
                        F.xxhash64("event_id", "user_id", "asof_orderkey")
                    )
                ).collect()
                mh.append(time.perf_counter() - t0)
            comp["join_fanout"] = round(min(jf), 3)
            comp["asof_count"] = round(min(ac), 3)
            comp["asof_hash"] = round(min(ah), 3)
            comp["asof_merge_hash"] = round(min(mh), 3)
            comp["joined_rows"] = jrows
            comp["output_rows"] = orows
            asof_decomp[f"x{m}"] = comp
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        b = asof_decomp[f"x{mults[0]}"] if asof_decomp else {}
        for m in mults[1:] if asof_decomp else []:
            cur = asof_decomp[f"x{m}"]
            for kk in (
                "join_fanout", "asof_count", "asof_hash", "asof_merge_hash"
            ):
                if b.get(kk):
                    cur[f"growth_{kk}"] = round(cur[kk] / b[kk], 2)
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["asof_decomposition"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- skew-safe as-of: 90%-hot-key timeline (round-8) ----------------
    # The plain merge strategy partitions by key, so a hot key's ENTIRE
    # timeline is one task — the canonical fact×fact straggler. The claim
    # for asof_merge_join_skewed: on a 90%-hot timeline it stays within a
    # small factor of ITSELF on a uniform timeline of the same size
    # (skew ≈ no-skew wall), while the plain form degrades with the hot
    # key's share. Synthetic deterministic timelines; forced full-output
    # materialization (bit_xor of xxhash64) so no component prunes away.
    asof_skew: dict[str, dict[str, float]] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.operators.joins import (
            asof_merge_join,
            asof_merge_join_skewed,
        )

        EPOCH = 1_600_000_000
        SPAN = 86_400 * 30  # 30-day timeline → ~30 day-buckets

        def _timeline(n_left: int, n_right: int, hot: bool):
            def keyed(df):
                if hot:  # 90% of rows on key 0, rest spread over 1..999
                    k = F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(
                        F.col("id") % 1000
                    )
                else:
                    k = F.col("id") % 1000
                return df.withColumn("user_id", k.cast("long"))

            ts = F.timestamp_seconds(
                F.lit(EPOCH) + (F.col("id") * 37) % SPAN
            )
            lft = keyed(spark.range(n_left)).select(
                F.col("id").alias("event_id"), "user_id", ts.alias("ts")
            )
            rgt = keyed(spark.range(n_right)).select(
                F.col("id").alias("o_orderkey"),
                "user_id",
                ts.alias("o_ts"),
            )
            return lft, rgt

        def _time_hash(df) -> float:
            t0 = time.perf_counter()
            df.select(
                F.bit_xor(
                    F.xxhash64("event_id", "user_id", "o_orderkey")
                )
            ).collect()
            return time.perf_counter() - t0

        for m in mults if _want("skew") else []:
            n_l, n_r = 100_000 * m, 20_000 * m
            hot_l, hot_r = _timeline(n_l, n_r, hot=True)
            uni_l, uni_r = _timeline(n_l, n_r, hot=False)
            comp = {}
            for label, (ll, rr, fn) in {
                "plain_hot": (hot_l, hot_r, asof_merge_join),
                "skewsafe_hot": (hot_l, hot_r, asof_merge_join_skewed),
                "skewsafe_uniform": (uni_l, uni_r, asof_merge_join_skewed),
            }.items():
                samples = [
                    _time_hash(
                        fn(ll, rr, "user_id", "ts", "o_ts", ["o_orderkey"])
                    )
                    for _ in range(args.repeats)
                ]
                comp[label] = round(min(samples), 3)
            comp["skew_penalty"] = round(
                comp["skewsafe_hot"] / comp["skewsafe_uniform"], 2
            )
            comp["vs_plain"] = round(
                comp["plain_hot"] / comp["skewsafe_hot"], 2
            )
            asof_skew[f"x{m}"] = comp
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        b = asof_skew[f"x{mults[0]}"] if asof_skew else {}
        for m in mults[1:] if asof_skew else []:
            cur = asof_skew[f"x{m}"]
            for kk in ("plain_hot", "skewsafe_hot", "skewsafe_uniform"):
                if b.get(kk):
                    cur[f"growth_{kk}"] = round(cur[kk] / b[kk], 2)
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["asof_skew"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- partitioned CDC: FIXED change set vs growing table (round-10,
    # carried round-8 verdict item 5) ----------------------------------
    # The claim measured (operators/cdc.py:210,284 docstrings): apply
    # wall grows with AFFECTED partitions, not table rows. The table is
    # hive-partitioned in fixed-size chunks of the key space, so the
    # partition COUNT grows ×m while each partition stays the same size;
    # the change set is pinned to the first 4 chunks at every scale. The
    # partitioned apply (pruned fold + 4-partition rewrite + hardlinked
    # carry-over) should stay near-flat — its only O(table) term is the
    # column-pruned (key, partition) old-homes lookup — while the naive
    # whole-table fold + full rewrite grows with m.
    cdc_part: dict[str, dict] = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.operators.cdc import (
            apply_cdc_partitioned_versioned,
            apply_cdc_versioned,
            to_versioned,
        )
        from ecommerce_full_etl_process_spark.sources.io import TableStore

        CHUNK = 7_500  # rows per partition → partition count grows ×m
        for m in mults if _want("cdc_partitioned") else []:
            d = rel_dirs[m]
            k = F.col("o_orderkey")
            orders = spark.read.parquet(
                os.path.join(d, "orders.parquet")
            ).select(
                "o_orderkey",
                "o_orderpriority",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                ((k - 1) / CHUNK).cast("long").alias("pk"),
            )
            # FIXED change set: keys ≤ 4*CHUNK (present at every scale,
            # partitions 0-3 only), ~1/17 updated, 1/5 of those deleted
            changes = orders.where(
                (k <= 4 * CHUNK) & (k % 17 == 0)
            ).select(
                "o_orderkey",
                "o_orderpriority",
                (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
                "pk",
                F.lit(1).cast("long").alias("seq"),
                F.when(k % 5 == 0, "D").otherwise("U").alias("op"),
            ).localCheckpoint(eager=True)
            root = tempfile.mkdtemp(prefix=f"cdcpart_x{m}_")
            store = TableStore(spark, root)
            t0 = time.perf_counter()
            store.overwrite("snap", to_versioned(orders), partition_by=["pk"])
            setup_s = time.perf_counter() - t0
            store.overwrite(
                "snap_full", to_versioned(orders), partition_by=["pk"]
            )
            part_s, full_s = [], []
            replaced: list = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                replaced = apply_cdc_partitioned_versioned(
                    store, "snap", changes, ["o_orderkey"], "seq", "pk"
                )
                part_s.append(time.perf_counter() - t0)
                # the naive path a partition-blind consumer pays: whole-
                # table fold + full partitioned rewrite
                t0 = time.perf_counter()
                folded = apply_cdc_versioned(
                    store.read("snap_full"), changes, ["o_orderkey"], "seq"
                )
                store.overwrite("snap_full", folded, partition_by=["pk"])
                full_s.append(time.perf_counter() - t0)
            n_rows = scale_corpus.BASE_ORDERS * m
            cdc_part[f"x{m}"] = {
                "partitioned_apply": round(min(part_s), 3),
                "full_rewrite": round(min(full_s), 3),
                "affected_partitions": len(replaced),
                "total_partitions": (n_rows + CHUNK - 1) // CHUNK,
                "table_rows": n_rows,
                "change_rows": changes.count(),
                "setup_write_untimed": round(setup_s, 3),
            }
            shutil.rmtree(root, ignore_errors=True)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        if cdc_part:
            b = cdc_part[f"x{mults[0]}"]
            for m in mults[1:]:
                cur = cdc_part[f"x{m}"]
                cur["growth_partitioned"] = round(
                    cur["partitioned_apply"] / b["partitioned_apply"], 2
                )
                cur["growth_full"] = round(
                    cur["full_rewrite"] / b["full_rewrite"], 2
                )
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["cdc_partitioned"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- partition-scoped compaction: FIXED hot set vs growing table
    # (round 10, sources/io.py compact_partitions) ----------------------
    # The claim measured: compaction wall grows with OFFENDING
    # partitions, not table rows. Same chunked layout as cdc_partitioned
    # (partition count ×m, fixed partition size); the small-file bloat
    # is pinned to the first 4 partitions at every scale (8 append
    # rounds × 2 files each). compact_partitions (read 4 partitions,
    # rewrite 4 dirs, hardlink the rest) should stay near-flat; the
    # partition-blind alternative — a whole-table partitioned rewrite,
    # what OPTIMIZE without a WHERE does — grows with m. Each repeat
    # resets the hot partitions via overwrite_partitions (untimed) so
    # every timed compaction sees identical content and file counts.
    compaction: dict[str, dict] = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.sources.io import TableStore

        CHUNK = 7_500
        HOT, ROUNDS = 4, 8
        for m in mults if _want("compaction") else []:
            d = rel_dirs[m]
            k = F.col("o_orderkey")
            orders = spark.read.parquet(
                os.path.join(d, "orders.parquet")
            ).select(
                "o_orderkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                ((k - 1) / CHUNK).cast("long").alias("pk"),
            )
            hot_rows = orders.where(k <= HOT * CHUNK).localCheckpoint(
                eager=True
            )
            n_parts = (scale_corpus.BASE_ORDERS * m + CHUNK - 1) // CHUNK
            root = tempfile.mkdtemp(prefix=f"compact_x{m}_")
            store = TableStore(spark, root)
            t0 = time.perf_counter()
            store.overwrite(
                "snap", orders.repartition(n_parts, "pk"), partition_by=["pk"]
            )
            setup_s = time.perf_counter() - t0

            hot_slice = hot_rows.where(k % 97 == 0).localCheckpoint(
                eager=True
            )

            def _bloat():
                # reset the hot partitions to base content, then append
                # ROUNDS small partitioned batches into them (the slice
                # spans all HOT partitions, so every round adds up to 2
                # files to each hot dir)
                store.overwrite_partitions(
                    "snap", hot_rows.repartition(HOT, "pk"), "pk"
                )
                for _ in range(ROUNDS):
                    store.append(
                        "snap",
                        hot_slice.repartition(2),
                        partition_by=["pk"],
                    )

            def _hot_files() -> int:
                ddir = store._data_dir("snap", store._current_version("snap"))
                return sum(
                    1
                    for p in range(HOT)
                    for _dp, _d, fs in os.walk(
                        os.path.join(ddir, f"pk={p}")
                    )
                    for f in fs
                    if f.endswith(".parquet")
                )
            scoped_s, full_s = [], []
            files_before = files_after = 0
            compacted: dict = {}
            for _ in range(args.repeats):
                _bloat()
                files_before = _hot_files()
                t0 = time.perf_counter()
                compacted = store.compact_partitions("snap", "pk", max_files=4)
                scoped_s.append(time.perf_counter() - t0)
                files_after = _hot_files()
                # the partition-blind alternative on identical bloat: a
                # whole-table partitioned rewrite (OPTIMIZE sans WHERE)
                _bloat()
                t0 = time.perf_counter()
                store.overwrite(
                    "snap",
                    store.read("snap").repartition(n_parts, "pk"),
                    partition_by=["pk"],
                )
                full_s.append(time.perf_counter() - t0)
            compaction[f"x{m}"] = {
                "scoped_compact": round(min(scoped_s), 3),
                "full_rewrite": round(min(full_s), 3),
                "compacted_partitions": len(compacted),
                "total_partitions": n_parts,
                "hot_files_before": files_before,
                "hot_files_after": files_after,
                "table_rows": scale_corpus.BASE_ORDERS * m,
                "bloat_rows_untimed": ROUNDS * hot_slice.count(),
                "setup_write_untimed": round(setup_s, 3),
            }
            shutil.rmtree(root, ignore_errors=True)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        if compaction:
            b = compaction[f"x{mults[0]}"]
            for m in mults[1:]:
                cur = compaction[f"x{m}"]
                cur["growth_scoped"] = round(
                    cur["scoped_compact"] / b["scoped_compact"], 2
                )
                cur["growth_full"] = round(
                    cur["full_rewrite"] / b["full_rewrite"], 2
                )
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["compaction"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- streaming state growth: sessionize + MV maintenance (round-10,
    # carried round-8 verdict item 7) -----------------------------------
    # The claim measured: stateful-streaming state is bounded by the
    # WATERMARK HORIZON, not input volume. A synthetic timeline where
    # each user is active for one hour (200 users/hour, 30 events each)
    # grows ×m in LENGTH (hours = 8*m → input rows ×m) but keeps the
    # horizon density constant. It streams the LIVE-STREAM way: each
    # file covers a FIXED time window (0.8 h), so the file count — and
    # micro-batch count — grows ×m while per-batch input stays constant,
    # exactly like a fixed trigger interval on a real stream. (The first
    # design here used a FIXED file count, which made each batch cover
    # ×m more time — a backlog-drain shape whose state is bounded by the
    # batch's own working set, growing with the batch; time-bounded
    # batches isolate the horizon bound the claim is about.) Event-time-
    # timeout eviction must keep per-batch state rows ≈ users inside
    # (watermark 1 h + gap 30 min, plus the current window) ≈ constant
    # at every m — max/final state flat while input and batch count grow
    # ×m. For the foreachBatch MV loop the state is the agg table
    # itself: rows == group cardinality (12), flat by construction.
    stream_state: dict[str, dict] = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.sources.io import TableStore
        from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (  # noqa: E501
            run_sessionize_scale,
            run_streaming_agg_maintenance,
        )

        UPH, EPU, HOURS_X1, FILES_X1 = 200, 30, 8, 10
        for m in mults if _want("streaming_state") else []:
            hours = HOURS_X1 * m
            FILES = FILES_X1 * m  # fixed 0.8 h window per file/batch
            src_root = os.path.join(SCALE_ROOT, f"stream_tb_x{m}")
            ev_dir = os.path.join(src_root, "events.parquet")
            if not os.path.exists(ev_dir):
                # rows are globally time-ordered by construction (id →
                # (hour, user, event) lexicographic), so slicing the id
                # range into FILES equal pieces yields chronological
                # ~0.8 h files without hour-boundary rounding artifacts
                N = hours * UPH * EPU
                base = F.to_timestamp(
                    F.lit("2024-01-01 00:00:00")
                ).cast("timestamp_ntz")
                for i in range(FILES):
                    lo, hi = i * N // FILES, (i + 1) * N // FILES
                    f = spark.range(lo, hi).select(
                        (F.col("id") / EPU).cast("long").alias("user_id"),
                        F.timestamp_add(
                            "SECOND",
                            (
                                (F.col("id") / (UPH * EPU)).cast("long")
                                * 3600
                                + (F.col("id") % EPU) * 10
                            ).cast("int"),
                            base,
                        ).alias("ts"),
                        F.concat(
                            F.lit("t"), (F.col("id") % 12).cast("string")
                        ).alias("event_type"),
                        ((F.col("id") % 1000) / 10.0).alias("value"),
                        F.col("id").alias("event_id"),
                    )
                    f.coalesce(1).write.mode("append").parquet(ev_dir)
            t0 = time.perf_counter()
            n_out, batches = run_sessionize_scale(spark, src_root)
            sess_wall = time.perf_counter() - t0
            # MV maintenance over the same files (event_type groups)
            ckpt = tempfile.mkdtemp(prefix=f"aggmaint_x{m}_")
            wh = tempfile.mkdtemp(prefix=f"aggwh_x{m}_")
            t0 = time.perf_counter()
            q = run_streaming_agg_maintenance(
                spark, ev_dir, ckpt, wh, ["event_type"], "value",
                max_files_per_trigger=1,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError("agg maintenance did not finish in 600s")
            agg_wall = time.perf_counter() - t0
            agg_state_rows = TableStore(spark, wh).read("agg_state").count()
            shutil.rmtree(ckpt, ignore_errors=True)
            shutil.rmtree(wh, ignore_errors=True)
            stream_state[f"x{m}"] = {
                "input_rows": sum(b["input_rows"] for b in batches),
                "n_batches": len(batches),
                "emitted_sessions": n_out,
                "sessionize_max_state_rows": max(
                    b["state_rows_total"] for b in batches
                ),
                "sessionize_final_state_rows": batches[-1][
                    "state_rows_total"
                ],
                "sessionize_per_batch_state": [
                    b["state_rows_total"] for b in batches
                ],
                "sessionize_wall": round(sess_wall, 3),
                "agg_maintenance_state_rows": agg_state_rows,
                "agg_maintenance_wall": round(agg_wall, 3),
            }
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        if stream_state:
            b = stream_state[f"x{mults[0]}"]
            for m in mults[1:]:
                cur = stream_state[f"x{m}"]
                cur["growth_input"] = round(
                    cur["input_rows"] / b["input_rows"], 2
                )
                cur["growth_max_state"] = round(
                    cur["sessionize_max_state_rows"]
                    / b["sessionize_max_state_rows"],
                    2,
                )
                cur["growth_agg_state"] = round(
                    cur["agg_maintenance_state_rows"]
                    / b["agg_maintenance_state_rows"],
                    2,
                )
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["streaming_state"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- streaming warehouse long-run: per-batch wall under composed
    # retention (round-11 verdict item 5) --------------------------------
    # The claim measured: a CONTINUOUS CDC consumer with keep_versions AND
    # compact_max_files both on pays a FLAT per-batch cost — the apply is
    # O(changes + affected partitions), compaction O(offending dirs),
    # vacuum O(pruned versions) — so batch 30 costs what batch 1 did.
    # Without retention the version/inode metadata grows with every batch
    # and a partition-blind consumer's wall drifts upward. Fixed-size
    # change set per batch (same keys, advancing seq) over the ×base
    # relational orders table; correctness of the composed run itself is
    # pinned by tests/test_cdc_partitioned_warehouse.py's 32-batch soak.
    streaming_warehouse: dict = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.sources.io import TableStore
        from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (  # noqa: E501
            apply_cdc_partitioned_warehouse_batch,
            init_cdc_partitioned_warehouse,
        )

        if _want("streaming_warehouse"):
            m = mults[0]
            CHUNK = 7_500
            N_BATCHES = 30
            k = F.col("o_orderkey")
            orders = spark.read.parquet(
                os.path.join(rel_dirs[m], "orders.parquet")
            ).select(
                "o_orderkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                ((k - 1) / CHUNK).cast("long").alias("pk"),
            )
            root = tempfile.mkdtemp(prefix="stream_wh_")
            store = TableStore(spark, root)
            init_cdc_partitioned_warehouse(store, orders, "pk")
            # per-batch change set: ~1/200 of keys updated (hot
            # partitions only — the locality a real CDC feed has) PLUS a
            # rotating delete slice (~1/211 of keys spread over the 30
            # batches, so every batch carries genuine D ops and the
            # snapshot monotonically sheds rows), seq strictly advancing
            upd = orders.where(k % 199 == 0).localCheckpoint(eager=True)
            dele = orders.where(k % 211 == 0).localCheckpoint(eager=True)
            walls = []
            for b in range(N_BATCHES):
                batch = upd.select(
                    "o_orderkey",
                    "pk",
                    (F.col("o_totalprice") + F.lit(float(b))).alias(
                        "o_totalprice"
                    ),
                    F.lit(b + 1).cast("long").alias("seq"),
                    F.lit("U").alias("op"),
                ).unionByName(
                    dele.where(k % N_BATCHES == b).select(
                        "o_orderkey",
                        "pk",
                        F.lit(None).cast("double").alias("o_totalprice"),
                        F.lit(b + 1).cast("long").alias("seq"),
                        F.lit("D").alias("op"),
                    )
                ).select(
                    "o_orderkey", "pk", "o_totalprice", "seq", "op"
                )
                t0 = time.perf_counter()
                apply_cdc_partitioned_warehouse_batch(
                    spark,
                    store,
                    batch,
                    b,
                    ["o_orderkey"],
                    "seq",
                    "pk",
                    keep_versions=3,
                    compact_max_files=4,
                )
                walls.append(round(time.perf_counter() - t0, 3))
            tdir = store._table_dir("snapshot")
            n_versions = len(
                [n for n in os.listdir(tdir) if n.startswith("v=")]
            )
            first5 = sum(walls[:5]) / 5
            last5 = sum(walls[-5:]) / 5
            streaming_warehouse = {
                "n_batches": N_BATCHES,
                "changes_per_batch": upd.count(),
                "deletes_total": dele.count(),
                "table_rows": scale_corpus.BASE_ORDERS * m,
                "keep_versions": 3,
                "compact_max_files": 4,
                "per_batch_wall": walls,
                "first5_mean": round(first5, 3),
                "last5_mean": round(last5, 3),
                "drift_last5_over_first5": round(last5 / first5, 2),
                "versions_on_disk_final": n_versions,
            }
            shutil.rmtree(root, ignore_errors=True)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["streaming_warehouse"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- RocksDB state-store provider at soak scale (round-13 verdict
    # item 7) -------------------------------------------------------------
    # tests/test_state_store_rocksdb.py proves provider PARITY on one
    # drain; this section proves the provider under SUSTAINED state
    # churn. Two workloads, both under SPARK_GRAFT_STATE_STORE semantics
    # (configure_state_store): (a) the sessionize soak — the engine's
    # store-backed stateful op (applyInPandasWithState with event-time
    # eviction), one micro-batch per 0.8 h file, run under BOTH providers
    # for a same-corpus wall/state comparison; (b) the 30-batch CDC
    # partitioned-warehouse consumer as a REAL foreachBatch file stream
    # drained with the provider flag set — its per-batch state lives in
    # the TableStore (no Spark state store rows), so (a) is the churn
    # evidence and (b) is end-to-end pipeline compatibility under the
    # flag, with per-batch walls comparable to the HDFS-section loop.
    streaming_warehouse_rocksdb: dict = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.sources.io import TableStore
        from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (  # noqa: E501
            STATE_STORE_PROVIDER_CONF,
            configure_state_store,
            run_cdc_partitioned_warehouse,
            run_sessionize_scale,
        )

        if _want("streaming_warehouse_rocksdb"):
            m = mults[0]
            prior = spark.conf.get(STATE_STORE_PROVIDER_CONF, None)
            # (a) sessionize soak, both providers over the same corpus
            UPH, EPU, HOURS_X1, FILES_X1 = 200, 30, 8, 10
            hours, FILES = HOURS_X1 * m, FILES_X1 * m
            src_root = os.path.join(SCALE_ROOT, f"stream_tb_x{m}")
            ev_dir = os.path.join(src_root, "events.parquet")
            if not os.path.exists(ev_dir):
                N = hours * UPH * EPU
                base = F.to_timestamp(
                    F.lit("2024-01-01 00:00:00")
                ).cast("timestamp_ntz")
                for i in range(FILES):
                    lo, hi = i * N // FILES, (i + 1) * N // FILES
                    f = spark.range(lo, hi).select(
                        (F.col("id") / EPU).cast("long").alias("user_id"),
                        F.timestamp_add(
                            "SECOND",
                            (
                                (F.col("id") / (UPH * EPU)).cast("long")
                                * 3600
                                + (F.col("id") % EPU) * 10
                            ).cast("int"),
                            base,
                        ).alias("ts"),
                        F.concat(
                            F.lit("t"), (F.col("id") % 12).cast("string")
                        ).alias("event_type"),
                        ((F.col("id") % 1000) / 10.0).alias("value"),
                        F.col("id").alias("event_id"),
                    )
                    f.coalesce(1).write.mode("append").parquet(ev_dir)
            for provider in ("hdfs", "rocksdb"):
                configure_state_store(spark, provider)
                t0 = time.perf_counter()
                n_out, batches = run_sessionize_scale(spark, src_root)
                streaming_warehouse_rocksdb[f"sessionize_{provider}"] = {
                    "emitted_sessions": n_out,
                    "n_batches": len(batches),
                    "max_state_rows": max(
                        b["state_rows_total"] for b in batches
                    ),
                    "state_rows_updated_total": sum(
                        b.get("state_rows_updated", 0) for b in batches
                    ),
                    "state_rows_removed_total": sum(
                        b.get("state_rows_removed", 0) for b in batches
                    ),
                    "wall": round(time.perf_counter() - t0, 3),
                }
            a, b = (
                streaming_warehouse_rocksdb["sessionize_hdfs"],
                streaming_warehouse_rocksdb["sessionize_rocksdb"],
            )
            streaming_warehouse_rocksdb["sessionize_providers_agree"] = bool(
                a["emitted_sessions"] == b["emitted_sessions"]
            )
            # (b) the 30-batch CDC warehouse consumer as a real
            # foreachBatch file stream, drained under rocksdb
            configure_state_store(spark, "rocksdb")
            CHUNK, N_BATCHES = 7_500, 30
            k = F.col("o_orderkey")
            orders = spark.read.parquet(
                os.path.join(rel_dirs[m], "orders.parquet")
            ).select(
                "o_orderkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                ((k - 1) / CHUNK).cast("long").alias("pk"),
            )
            log_dir = tempfile.mkdtemp(prefix="cdc_log_rocks_")
            upd = orders.where(k % 199 == 0).localCheckpoint(eager=True)
            dele = orders.where(k % 211 == 0).localCheckpoint(eager=True)
            for bi in range(N_BATCHES):
                batch = upd.select(
                    "o_orderkey",
                    "pk",
                    (F.col("o_totalprice") + F.lit(float(bi))).alias(
                        "o_totalprice"
                    ),
                    F.lit(bi + 1).cast("long").alias("seq"),
                    F.lit("U").alias("op"),
                ).unionByName(
                    dele.where(k % N_BATCHES == bi).select(
                        "o_orderkey",
                        "pk",
                        F.lit(None).cast("double").alias("o_totalprice"),
                        F.lit(bi + 1).cast("long").alias("seq"),
                        F.lit("D").alias("op"),
                    )
                )
                batch.coalesce(1).write.mode("append").parquet(log_dir)
            root = tempfile.mkdtemp(prefix="stream_wh_rocks_")
            ckpt = tempfile.mkdtemp(prefix="stream_wh_rocks_ckpt_")
            store = TableStore(spark, root)
            from ecommerce_full_etl_process_spark.streaming.stream_pipeline import (  # noqa: E501
                init_cdc_partitioned_warehouse,
            )

            init_cdc_partitioned_warehouse(store, orders, "pk")
            t0 = time.perf_counter()
            q = run_cdc_partitioned_warehouse(
                spark,
                log_dir,
                ckpt,
                root,
                "o_orderkey long, pk long, o_totalprice double, "
                "seq long, op string",
                ["o_orderkey"],
                "seq",
                "pk",
                keep_versions=3,
                compact_max_files=4,
                max_files_per_trigger=1,
            )
            if not q.awaitTermination(900):
                q.stop()
                raise RuntimeError("rocksdb CDC drain did not finish in 900s")
            drain_wall = time.perf_counter() - t0
            from ecommerce_full_etl_process_spark.operators.cdc import (
                strip_versioned,
            )

            # LIVE rows (tombstones stripped): every deleted key stays
            # dead except the dele∩upd overlap keys whose delete batch
            # precedes the final update batch — those are legitimately
            # resurrected by the later higher-seq update (delete-first
            # only wins TIES)
            n_rows = strip_versioned(
                store.read("snapshot").drop("last_batch")
            ).count()
            overlap = [
                r["o_orderkey"]
                for r in dele.join(upd, "o_orderkey", "left_semi")
                .select("o_orderkey")
                .collect()
            ]
            resurrected = sum(
                1 for kk in overlap if kk % N_BATCHES < N_BATCHES - 1
            )
            expected = orders.count() - dele.count() + resurrected
            streaming_warehouse_rocksdb["cdc_warehouse"] = {
                "provider": "rocksdb",
                "n_batches": N_BATCHES,
                "drain_wall": round(drain_wall, 3),
                "mean_batch_wall": round(drain_wall / N_BATCHES, 3),
                "snapshot_live_rows": n_rows,
                "snapshot_live_rows_expected": expected,
                "resurrected_by_later_update": resurrected,
                "rows_match": bool(n_rows == expected),
            }
            for d in (log_dir, root, ckpt):
                shutil.rmtree(d, ignore_errors=True)
            if prior is None:
                spark.conf.unset(STATE_STORE_PROVIDER_CONF)
            else:
                spark.conf.set(STATE_STORE_PROVIDER_CONF, prior)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["streaming_warehouse_rocksdb"] = (
            f"{type(exc).__name__}: {exc}"[:500]
        )

    # ---- IVF refresh policy: partial-probe recall vs appended fraction,
    # measured UNDER THE SHIPPED DEFAULTS (round-13 verdict item 3: the
    # old K=16/iters=3 rows misrepresented the engine) --------------------
    # The claim quantified: frozen-centroid assignment keeps the index
    # CORRECT forever (all-cell probe == brute force — the graded
    # contract), but PARTIAL-probe recall decays as appended data shifts
    # the distribution the centroids were trained on. Train on half the
    # corpus at ivf_defaults sizing with the shipped kmeans_lite defaults
    # (k-means|| init, iters=15 + early stop), append 10%/50%/100% of the
    # training size from the held-out half, measure recall@10 vs exact
    # brute force at 5%/15%/50%-of-cells probe budgets with frozen
    # centroids, and at the 15% budget with RE-TRAINED (re-sized)
    # centroids — the gap is what a re-train buys. The appended half is
    # drawn from the SAME distribution (the worst case for demonstrating
    # decay, the common case in production).
    ivf_refresh: dict = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.operators.similarity import (
            assign_to_centroids,
            brute_force_topk,
            ivf_defaults,
            ivf_topk,
            kmeans_lite,
        )

        def _probe_n(n_cells: int, frac: float) -> int:
            return max(1, -(-int(n_cells * 100 * frac) // 100))

        def _recall_q(corpus, centroids, index, nprobe, qids) -> float:
            hits = 0
            for qid in qids:
                q = corpus.where(F.col("vec_id") == qid).select(
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("q")
                )
                exact = {
                    r["vec_id"]
                    for r in brute_force_topk(corpus, q, k=10).collect()
                }
                got = {
                    r["vec_id"]
                    for r in ivf_topk(
                        corpus, q, centroids, index, k=10, nprobe=nprobe
                    ).collect()
                }
                hits += len(got & exact)
            return round(hits / (len(qids) * 10), 3)

        if _want("ivf_refresh"):
            m = mults[-1]
            e = spark.read.parquet(
                os.path.join(dirs[m], "embeddings.parquet")
            ).select("vec_id", "embedding")
            train = e.where(F.col("vec_id") % 2 == 0).localCheckpoint(
                eager=True
            )
            pool = e.where(F.col("vec_id") % 2 == 1)
            n_train = train.count()
            K, DNP = ivf_defaults(n_train)
            t0 = time.perf_counter()
            cents, assigns = kmeans_lite(train, k=K)  # shipped defaults
            train_wall = time.perf_counter() - t0
            assigns = assigns.localCheckpoint(eager=True)
            # 10 train-side queries — arbitrary corpus points, NOT the
            # training seeds (a cell forms AROUND a seed, so seed-point
            # queries always find their neighbors)
            q_ids = [2 * i for i in range(1, 11)]
            fracs = (0.05, 0.15, 0.50)

            for frac in (0.1, 0.5, 1.0):
                lim = int(n_train * frac)
                appended = (
                    pool.orderBy("vec_id").limit(lim)  # deterministic slice
                ).localCheckpoint(eager=True)
                corpus = train.unionByName(appended).localCheckpoint(
                    eager=True
                )
                t0 = time.perf_counter()
                app_assign = assign_to_centroids(
                    appended, cents
                ).localCheckpoint(eager=True)
                assign_wall = time.perf_counter() - t0
                index = assigns.unionByName(app_assign)
                entry: dict = {
                    "appended_rows": lim,
                    "corpus_rows": n_train + lim,
                    "assign_wall": round(assign_wall, 3),
                }
                for pf in fracs:
                    entry[f"recall_frozen_probe{int(pf * 100)}pct"] = (
                        _recall_q(corpus, cents, index, _probe_n(K, pf), q_ids)
                    )
                # what a re-train (re-sized to the grown corpus) buys at
                # the mid probe budget
                rk, _ = ivf_defaults(n_train + lim)
                t0 = time.perf_counter()
                r_cents, r_assigns = kmeans_lite(corpus, k=rk)
                retrain_wall = time.perf_counter() - t0
                entry["retrain_n_cells"] = rk
                entry["recall_retrained_probe15pct"] = _recall_q(
                    corpus,
                    r_cents,
                    r_assigns.localCheckpoint(eager=True),
                    _probe_n(rk, 0.15),
                    q_ids,
                )
                entry["retrain_wall"] = round(retrain_wall, 3)
                ivf_refresh[f"append_{int(frac * 100)}pct"] = entry
                gc.collect()
                spark.sparkContext._jvm.System.gc()
            # DRIFTED append (the case that actually forces a re-train):
            # the appended vectors live off the trained distribution
            # (constant +1.5 shift per dim — a new embedding model, a new
            # data domain). Queries come FROM the drifted region, where
            # frozen centroids have no cells: recall at small probe
            # budgets is what degrades, and a re-train recovers it.
            drifted = pool.orderBy("vec_id").limit(n_train).select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(1.5)
                ).alias("embedding"),
            ).localCheckpoint(eager=True)
            corpus = train.unionByName(drifted).localCheckpoint(eager=True)
            d_assign = assign_to_centroids(drifted, cents).localCheckpoint(
                eager=True
            )
            index = assigns.unionByName(d_assign)
            dq_ids = [
                r["vec_id"]
                for r in drifted.orderBy("vec_id").limit(10).collect()
            ]
            entry = {"appended_rows": n_train, "corpus_rows": 2 * n_train}
            for pf in fracs:
                entry[f"recall_frozen_probe{int(pf * 100)}pct"] = _recall_q(
                    corpus, cents, index, _probe_n(K, pf), dq_ids
                )
            rk, _ = ivf_defaults(2 * n_train)
            r_cents, r_assigns = kmeans_lite(corpus, k=rk)
            r_assigns = r_assigns.localCheckpoint(eager=True)
            entry["retrain_n_cells"] = rk
            for pf in (0.05, 0.15):
                entry[f"recall_retrained_probe{int(pf * 100)}pct"] = (
                    _recall_q(corpus, r_cents, r_assigns, _probe_n(rk, pf), dq_ids)
                )

            # drift's real cost under frozen centroids is CELL IMBALANCE,
            # not recall: every drifted vector lands in the few cells
            # nearest the shifted cloud, so probe cost collapses toward a
            # brute-force scan. A re-train re-balances the cells; THAT is
            # what re-training buys. Monitor max(cell)/corpus.
            def _max_cell_frac(idx) -> float:
                mx = (
                    idx.groupBy("cid")
                    .count()
                    .agg(F.max("count"))
                    .collect()[0][0]
                )
                return round(mx / (2 * n_train), 3)

            entry["frozen_max_cell_frac"] = _max_cell_frac(index)
            entry["retrained_max_cell_frac"] = _max_cell_frac(r_assigns)
            ivf_refresh["append_100pct_drifted"] = entry
            # the SHIPPED defaults (ivf_defaults: n_cells = max(16, √N),
            # nprobe = ceil(n_cells/2)) must hold recall@10 >= 0.9 on this
            # worst-case uniform corpus — the round-11 verdict's quality
            # gate for a user who never touches the knobs (the old
            # k=16/nprobe=1 defaults measured 0.28 here). Probing HALF the
            # cells on a uniform corpus is near-necessary: the round-13
            # k-means|| init + iters=15 upgrade lifted 50%-probe recall
            # only 0.924 -> ~0.95 in the offline 3-seed replica — recall
            # on structure-free data tracks the probed fraction, which is
            # why the clustered section below is where the default-path
            # cost argument actually lives.
            t0 = time.perf_counter()
            rec = _recall_q(train, cents, assigns, DNP, q_ids)
            ivf_refresh["defaults"] = {
                "n_cells": K,
                "nprobe": DNP,
                "corpus_rows": n_train,
                "recall_at10": rec,
                "meets_target_090": bool(rec >= 0.9),
                "train_wall": round(train_wall, 3),
                "probe_wall_10q": round(time.perf_counter() - t0, 3),
            }
            ivf_refresh["n_cells"] = K
            ivf_refresh["train_rows"] = n_train
            ivf_refresh["queries"] = len(q_ids)
            ivf_refresh["kmeans_defaults"] = "kmeans||_init,iters=15,early_stop"
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["ivf_refresh"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- IVF on a CLUSTERED corpus: where cell pruning actually pays
    # (round-13 verdict item 2) -------------------------------------------
    # The uniform corpus above is ANN's worst case: recall tracks the
    # probed fraction almost linearly, so the safe default probes half
    # the cells. Real embedding corpora are clustered; this section
    # plants the SAME deterministic 32-cluster structure the graded
    # similarity_topk_ivf_clustered entry uses (center(c,j) =
    # ((c·37+j·11)%17)/17−0.5 + 0.15·uniform noise) at scale-bench size,
    # trains at shipped defaults, and sweeps the probe budget — the
    # committed evidence that recall@10 ≥ 0.9 needs only ~5-15% of cells
    # where the corpus has structure.
    ivf_clustered: dict = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from ecommerce_full_etl_process_spark.operators.similarity import (
            brute_force_topk,
            ivf_defaults,
            ivf_topk,
            kmeans_lite,
        )

        if _want("ivf_clustered"):
            m = mults[-1]
            e = spark.read.parquet(
                os.path.join(dirs[m], "embeddings.parquet")
            ).select("vec_id", "embedding")
            planted = e.select(
                "vec_id",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        ((F.col("vec_id") % 32) * 37 + i * 11) % 17
                    ).cast("double")
                    / 17.0
                    - 0.5
                    + 0.15 * x.cast("double"),
                ).alias("embedding"),
            ).localCheckpoint(eager=True)
            n = planted.count()
            dk, dnp = ivf_defaults(n)
            t0 = time.perf_counter()
            cents, assigns = kmeans_lite(planted, k=dk)  # shipped defaults
            c_train_wall = time.perf_counter() - t0
            assigns = assigns.localCheckpoint(eager=True)
            q_ids = [2 * i for i in range(1, 11)]

            def _recall_wall(nprobe):
                hits = 0
                t0 = time.perf_counter()
                for qid in q_ids:
                    q = planted.where(F.col("vec_id") == qid).select(
                        F.col("embedding").alias("q")
                    )
                    exact = {
                        r["vec_id"]
                        for r in brute_force_topk(planted, q, k=10).collect()
                    }
                    got = {
                        r["vec_id"]
                        for r in ivf_topk(
                            planted, q, cents, assigns, k=10, nprobe=nprobe
                        ).collect()
                    }
                    hits += len(got & exact)
                return (
                    round(hits / (len(q_ids) * 10), 3),
                    round(time.perf_counter() - t0, 3),
                )

            for pf in (0.05, 0.10, 0.15, 0.50):
                nprobe = max(1, -(-int(dk * 100 * pf) // 100))
                rec, wall = _recall_wall(nprobe)
                ivf_clustered[f"probe_{int(pf * 100)}pct"] = {
                    "nprobe": nprobe,
                    "recall_at10": rec,
                    # includes the 10 exact brute-force baselines — the
                    # recall denominator, identical across rows; the
                    # ROW-over-row delta isolates the probe cost
                    "recall_pass_wall_10q": wall,
                }
            ivf_clustered.update(
                {
                    "n_cells": dk,
                    "default_nprobe": dnp,
                    "corpus_rows": n,
                    "planted_clusters": 32,
                    "noise_scale": 0.15,
                    "train_wall": round(c_train_wall, 3),
                    "kmeans_defaults": "kmeans||_init,iters=15,early_stop",
                }
            )
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["ivf_clustered"] = f"{type(exc).__name__}: {exc}"[:500]

    base = mults[0]
    for table in (timings, rel_timings):
        for name in table:
            t1 = table[name].get(f"x{base}")
            for m in mults[1:]:
                tn = table[name].get(f"x{m}")
                if t1 and tn:
                    table[name][f"growth_x{m}"] = round(tn / t1, 2)

    result = {
        "metric": "scale_headroom",
        "unit": "sec",
        "multipliers": mults,
        "base_rows": {
            "documents": scale_corpus.BASE_DOCS,
            "embeddings": scale_corpus.BASE_VECS,
            "events": scale_corpus.BASE_EVENTS,
            "orders": scale_corpus.BASE_ORDERS,
            "lineitem": scale_corpus.BASE_ORDERS * scale_corpus.LINES_PER_ORDER,
            "customer": scale_corpus.BASE_CUSTOMERS,
        },
        "queries": timings,
        "relational_queries": rel_timings,
        "incremental_dedup": incremental,
        "asof_decomposition": asof_decomp,
        "asof_skew": asof_skew,
        "cdc_partitioned": cdc_part,
        "compaction": compaction,
        "streaming_state": stream_state,
        "streaming_warehouse": streaming_warehouse,
        "streaming_warehouse_rocksdb": streaming_warehouse_rocksdb,
        "ivf_refresh": ivf_refresh,
        "ivf_clustered": ivf_clustered,
        "result_rows": {n: {f"x{m}": c for m, c in v.items()} for n, v in rows.items()},
        "repeats_min": args.repeats,
        "partial": bool(errors),
        "errors": errors,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), args.out
    )
    if "all" not in sections and os.path.exists(out_path):
        # subset run: merge the freshly-measured sections into the
        # committed artifact instead of clobbering the others' evidence
        with open(out_path) as f:
            merged = json.loads(f.read())
        section_keys = {
            "heavy": ["queries"],
            "incremental": ["incremental_dedup"],
            "relational": ["relational_queries"],
            "asof": ["asof_decomposition"],
            "skew": ["asof_skew"],
            "cdc_partitioned": ["cdc_partitioned"],
            "compaction": ["compaction"],
            "streaming_state": ["streaming_state"],
            "streaming_warehouse": ["streaming_warehouse"],
            "streaming_warehouse_rocksdb": ["streaming_warehouse_rocksdb"],
            "ivf_refresh": ["ivf_refresh"],
            "ivf_clustered": ["ivf_clustered"],
        }
        for sec, keys in section_keys.items():
            if _want(sec):
                for kk in keys:
                    merged[kk] = result[kk]
        if _want("heavy") or _want("relational"):
            rr = merged.get("result_rows", {})
            rr.update(result["result_rows"])
            merged["result_rows"] = rr
        merged["errors"] = {**merged.get("errors", {}), **errors}
        merged["partial"] = bool(merged["errors"])
        result = merged
    line = json.dumps(result)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
