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
    args = ap.parse_args()
    mults = [int(m) for m in args.multipliers.split(",")]

    spark = get_spark(app_name="scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()

    dirs: dict[int, str] = {}
    for m in mults:
        d = os.path.join(SCALE_ROOT, f"x{m}")
        t0 = time.perf_counter()
        scale_corpus.write_scale_dir(spark, d, m)
        print(
            f"scale_bench: corpus x{m} ready in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        dirs[m] = d

    rows: dict[str, dict[int, int]] = {}
    timings: dict[str, dict[str, float]] = {n: {} for n in HEAVY}
    errors: dict[str, str] = {}
    # warm the JVM once so x1 doesn't absorb first-job startup cost
    queries[HEAVY[0]](spark, dirs[mults[0]]).limit(1).count()
    import gc

    for name in HEAVY:
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

        for m in mults:
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
        b = incremental[f"x{mults[0]}"]
        for m in mults[1:]:
            cur = incremental[f"x{m}"]
            cur["growth_incremental"] = round(
                cur["incremental"] / b["incremental"], 2
            )
            cur["growth_full"] = round(cur["full_rerun"] / b["full_rerun"], 2)
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["incremental_dedup"] = f"{type(exc).__name__}: {exc}"[:500]

    # ---- relational (TPC-H-side) scale headroom -------------------------
    rel_dirs: dict[int, str] = {}
    rel_timings: dict[str, dict[str, float]] = {n: {} for n in RELATIONAL}
    try:
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
        for name in RELATIONAL:
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

        for m in mults:
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
        b = asof_decomp[f"x{mults[0]}"]
        for m in mults[1:]:
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

        for m in mults:
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
        b = asof_skew[f"x{mults[0]}"]
        for m in mults[1:]:
            cur = asof_skew[f"x{m}"]
            for kk in ("plain_hot", "skewsafe_hot", "skewsafe_uniform"):
                if b.get(kk):
                    cur[f"growth_{kk}"] = round(cur[kk] / b[kk], 2)
    except Exception as exc:  # noqa: BLE001 — isolate the section
        errors["asof_skew"] = f"{type(exc).__name__}: {exc}"[:500]

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
        "result_rows": {n: {f"x{m}": c for m, c in v.items()} for n, v in rows.items()},
        "repeats_min": args.repeats,
        "partial": bool(errors),
        "errors": errors,
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
