#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall time across headline queries (each materialized via
a count-style action so the full plan executes, without collecting large
results to the driver).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_full_etl_process_spark.plans import catalog  # noqa: E402
from ecommerce_full_etl_process_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family; extended as the catalog grows.
HEADLINE = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "filtered_incremental_scan",
    "asof_events_to_orders",
    "latest_order_per_customer",
    "scd2_intervals_from_orders",
    "first_occurrence_dedup",
    "price_tolerance_check",
    "minhash_lsh_neardups",
    "simhash_planted_pairs",
    "similarity_topk_bruteforce",
    "embedding_neardup_pairs",
    "text_quality_stats",
    "token_count_bpe",
    "json_extract_events",
    "shipping_priority",
    "sessionize_events",
    "rollup_revenue",
    "running_customer_revenue",
    # heavy pipeline-end ops (round-3 addition): the cost of the engine
    # actually lives here, so they need per-round perf evidence too
    "corpus_dedup_components",
    "similarity_topk_ivf",
    "multimodal_features",
    "streaming_event_counts",
    # round-5 curation + streaming additions
    "line_dedup_corpus",
    "corpus_prep_pipeline",
    "bpe_merge_candidates",
    "streaming_click_purchase_join",
    "stateful_sessionize",
    "similarity_topk_quantized",
    "repeated_ngram_spans",
    "streaming_enriched_segment_counts",
    # round-5 session additions: incremental dedup, LM scoring, entity res
    "minhash_incremental_pairs",
    "trigram_lm_scores",
    "fuzzy_name_match",
    "semantic_dedup_components",
    "simhash_banded_neardups",
    # round-6 additions: bloom-prefiltered semi join, quality-aware dedup,
    # hopping-window aggregation
    "bloom_filtered_orders",
    "dedup_keep_best_quality",
    "hopping_event_rates",
    "customer_revenue_deciles",
    "order_priority_counts",
    "streaming_hopping_rates",
    "customer_order_distribution",
    "promo_revenue_share",
    # round-7 additions: Q21 (EXISTS+NOT-EXISTS decorrelated) and Q20
    # (nested semi-join chain) shapes
    "suppliers_who_kept_waiting",
    "surplus_part_suppliers",
    # round-7 session additions: Q7 (two-nation disjunctive join),
    # Q9 (profit star join), Q16 (anti join + count-distinct)
    "bilateral_trade_volume",
    "product_type_profit",
    "part_supplier_diversity",
    # late-round-7 additions: Q6 pure-pushdown scan, interval×point
    # range join, snapshot reconciliation diff, expectation suite
    "discount_band_revenue",
    "repeat_purchases_within_90d",
    "snapshot_diff_orders",
    "data_quality_expectations",
    "heavy_hitter_bigrams",
    "incremental_monthly_revenue",
    "cdc_apply_orders",
    "streaming_agg_maintenance_state",
    "zorder_pruned_scan",
    # round-8 additions: skew-safe as-of merge and the CDC × MV
    # composition (snapshot + aggregate maintained in one loop)
    "asof_events_to_orders_skewsafe",
    "cdc_mv_maintenance_state",
    # round-10 additions: the streaming partitioned CDC consumer and the
    # fact-scale (no-global-sort) decile segmentation
    "streaming_cdc_partitioned_warehouse",
    "revenue_deciles_distributed",
    # round-10 second wave: bounded-state streaming dedup,
    # partition-scoped small-file compaction, and incrementally
    # maintained quantiles (mergeable histogram state)
    "streaming_dedup_within_watermark",
    "compacted_partition_scan",
    "incremental_value_quantiles",
    "streaming_quantile_maintenance_state",
    "similarity_topk_ivf_incremental",
    # round-11 additions: adaptive (range-free) quantile state, the
    # driver-gradeable incremental HLL distinct state, and the streaming
    # ANN ingest (frozen-centroid assignment into a persisted IVF index)
    "adaptive_quantile_state",
    "incremental_distinct_counts",
    "streaming_ivf_ingest",
    "streaming_adaptive_quantile_state",
    # round-12 additions: signed adaptive quantile state (negative-bin
    # grid), real dependency-free image decode, and the default-parameter
    # IVF recall contract (sqrt-N cells, half-cell probe)
    "adaptive_quantile_state_signed",
    "multimodal_real_decode",
    "multimodal_resize_decode",
    "multimodal_audio_decode",
    "multimodal_frame_sample",
    "similarity_topk_ivf_recall",
    "content_defined_chunks",
    # round-13 additions: stdlib-zlib PNG decode (all five scanline
    # filters) and the clustered-corpus IVF recall contract at a 15%
    # probe budget (batch top-k serving shape)
    "multimodal_png_decode",
    "similarity_topk_ivf_clustered",
]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def summary_line(full: dict) -> str:
    """Compact (<500 char) last-line summary.

    The driver records only the LAST ~2000 chars of stdout; round 5's
    single full JSON line outgrew that window and the round's official
    total was lost (``BENCH_r05.json parsed: null``). The contract now:
    the full detail JSON goes to ``bench_out.json`` (committed) and to an
    early stdout line for humans, while the FINAL stdout line is this
    compact summary that always fits the tail capture.
    ``tests/test_bench_contract.py`` pins the <500-char bound.
    """
    return json.dumps(
        {
            "metric": full["metric"],
            "value": full["value"],
            # round-8: the count-action total lets Catalyst prune work a
            # real consumer pays for (BENCH_NOTES_r7.md), so the honest
            # full-output-materialized total rides in the summary too —
            # null when the pass was disabled or any query errored, and
            # LABELED with materialized_n (queries with non-hashable
            # output skip the metric, so coverage is explicit rather
            # than a silently-partial sum)
            "materialized_total_wall": full.get("materialized_total_wall"),
            "materialized_n": full.get("materialized_n", 0),
            "unit": full["unit"],
            "partial": full["partial"],
            "n_queries": len(full["queries"]),
            "n_errors": len(full["errors"]),
            "repeats_min": full["repeats_min"],
            "sf": full["sf"],
            "detail": "bench_out.json",
        }
    )


def _release_persistent_rdds(spark) -> int:
    """Unpersist every still-persisted RDD — the localCheckpoint analogue
    of the clearCache() below (round-14 session hygiene, guide §5).

    Catalog entries materialize results (and iteration frontiers) with
    ``localCheckpoint(eager=True)``; the blocks are released only when
    py4j's periodic GC gets around to detaching the JVM references, so a
    long bench session (80 queries × ~6 timed executions) accumulates
    hundreds of dead checkpoint block sets. Measured on this host: by the
    tail of the full run the block manager is evicting, and the
    Python-kernel entries degrade 5-7× (multimodal_frame_sample 9.6 s in
    the full run vs 1.4 s isolated, identical code — r14 baseline).
    Between queries nothing can still need a prior query's blocks, so the
    explicit synchronous release restores query independence — the same
    contract clearCache()+gc.collect() (round 5) already established."""
    sc = spark.sparkContext
    jrdds = sc._jsc.getPersistentRDDs()  # py4j JavaMap view
    n = 0
    for jrdd in jrdds.values():
        jrdd.unpersist(False)
        n += 1
    return n


def per_query_lines(timings: dict[str, float], budget: int = 600) -> list[str]:
    """Per-query timings as SMALL self-contained JSON lines that survive
    the driver's ~2000-char stdout tail capture (round-13 verdict item 2:
    PERF_r13 lost its whole per-query/geomean/scaling analysis because the
    only per-query carrier was the full detail line, which outgrew the
    window rounds ago).

    Format: ``{"queries_cs": {name: centiseconds-int, ...}}`` — compact
    separators, each line <= ``budget`` chars so tail truncation can only
    eat WHOLE leading lines, never corrupt a trailing one. Queries are
    ordered cheapest-first across the lines: the lines nearest the end of
    stdout (the guaranteed-surviving ones, right before the summary) carry
    the most expensive queries, which is what per-round perf attribution
    and the core-count scaling comparison need most. ~55 of 80 entries fit
    the 2000-char window at current name lengths; the FULL set is always
    in bench_out.json."""
    ordered = sorted(timings, key=lambda n: (timings[n], n))
    lines: list[str] = []
    chunk: dict[str, int] = {}
    for name in ordered:
        chunk[name] = int(round(timings[name] * 100))
        if len(json.dumps({"queries_cs": chunk}, separators=(",", ":"))) > budget:
            last = chunk.popitem()
            if chunk:
                lines.append(
                    json.dumps({"queries_cs": chunk}, separators=(",", ":"))
                )
            chunk = dict([last])
    if chunk:
        lines.append(json.dumps({"queries_cs": chunk}, separators=(",", ":")))
    return lines


def _ab_worktree(base_commit: str) -> str:
    """Materialize (once) a detached git worktree of ``base_commit`` under
    ``.ab_worktrees/`` so the A/B runner can execute the OLD code in its
    own process while HEAD stays checked out for the new side."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    sha = subprocess.check_output(
        ["git", "rev-parse", base_commit], cwd=root, text=True
    ).strip()
    wt = os.path.join(root, ".ab_worktrees", sha[:12])
    if not os.path.isdir(wt):
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", wt, sha], cwd=root
        )
    return wt


def _ab_run_once(workdir: str, subset: list[str]) -> dict:
    """One full bench subprocess in ``workdir``; returns its bench_out.json.

    A fresh process per sample is the point: each side pays identical JVM
    start + warmup, so cross-run session residue (the round-5 drift) can't
    favour either side, and host-noise bursts land on whichever side is
    running *now* — which interleaving then averages out.
    """
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_SUBSET"] = ",".join(subset)
    env["SPARK_GRAFT_BENCH_REPEATS"] = env.get("SPARK_GRAFT_AB_INNER", "1")
    env["SPARK_GRAFT_BENCH_MATERIALIZE"] = "1"
    subprocess.run(
        [sys.executable, os.path.join(workdir, "bench.py")],
        cwd=workdir,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(workdir, "bench_out.json")) as fh:
        return json.load(fh)


def ab_main(base_commit: str, subset: list[str], repeats: int) -> None:
    """Interleaved A/B: HEAD vs ``base_commit``, min-of-``repeats`` a side.

    Standing bench-protocol hardening (round-11 verdict item 8): this host's
    identical-code runs vary up to 2.2x, so a regression claim needs HEAD
    and base sampled *alternately* within the same noise window, not two
    monolithic runs an hour apart. Odd repeats start base-first so slow
    warm-up drift (page cache, CPU governor) can't systematically favour
    the side that always runs second.
    """
    root = os.path.dirname(os.path.abspath(__file__))
    base_wt = _ab_worktree(base_commit)
    # SPARK_GRAFT_AB_HEAD pins the "head" side to a commit worktree too,
    # so an A/B can keep running while the working tree is being edited.
    head_pin = os.environ.get("SPARK_GRAFT_AB_HEAD", "")
    sides = {"head": _ab_worktree(head_pin) if head_pin else root, "base": base_wt}
    samples: dict[str, dict[str, dict[str, list[float]]]] = {
        s: {"count": {}, "materialized": {}} for s in sides
    }
    for r in range(repeats):
        order = ["head", "base"] if r % 2 == 0 else ["base", "head"]
        for side in order:
            out = _ab_run_once(sides[side], subset)
            for metric, key in (
                ("count", "queries"),
                ("materialized", "queries_materialized"),
            ):
                for q, t in out.get(key, {}).items():
                    samples[side][metric].setdefault(q, []).append(t)
            print(
                f"ab repeat {r + 1}/{repeats} {side}: "
                + json.dumps(out.get("queries", {})),
                flush=True,
            )
    table: dict[str, dict] = {}
    for q in subset:
        row: dict = {}
        for metric in ("count", "materialized"):
            h = samples["head"][metric].get(q)
            b = samples["base"][metric].get(q)
            if h and b:
                row[metric] = {
                    "head_min": round(min(h), 3),
                    "base_min": round(min(b), 3),
                    "head_samples": h,
                    "base_samples": b,
                    "ratio_min": round(min(h) / min(b), 3),
                }
        table[q] = row
    result = {
        "mode": "ab",
        "base_commit": base_commit,
        "repeats": repeats,
        "sf_dir": SF_DIR,
        "queries": table,
    }
    with open(os.path.join(root, "bench_ab_out.json"), "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    for q, row in table.items():
        c = row.get("count", {})
        m = row.get("materialized", {})
        print(
            f"{q}: count head {c.get('head_min')} vs base {c.get('base_min')}"
            f" (x{c.get('ratio_min')}) | materialized head"
            f" {m.get('head_min')} vs base {m.get('base_min')}"
            f" (x{m.get('ratio_min')})"
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        base = sys.argv[2]
        subset = [
            s.strip()
            for s in os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "").split(",")
            if s.strip()
        ]
        if not subset:
            raise SystemExit("--ab requires SPARK_GRAFT_BENCH_SUBSET")
        ab_main(base, subset, int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "5")))
        return
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()
    # SPARK_GRAFT_BENCH_SUBSET: comma-separated query names — used to
    # bisect session effects (e.g. replay only round-4's 23-query set in
    # an otherwise identical session). Unset = full headline list.
    subset = os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "")
    wanted = [s.strip() for s in subset.split(",") if s.strip()] or HEADLINE
    names = [n for n in wanted if n in queries]

    # warm the JVM + parquet footers once so we measure query execution
    for name in names[:1]:
        queries[name](spark, SF_DIR).limit(1).count()

    # min of 3 runs: local timings swing ±30% with host load/GC/JIT, and
    # min-of-2 still records a bad draw too often (measured round 2).
    # Sub-second queries get 2 extra repeats (their relative noise is the
    # worst), and the median is reported alongside the min so regressions
    # are attributable to plan changes rather than a bad draw.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # SPARK_GRAFT_BENCH_MATERIALIZE: additionally time each query with
    # a forced full-output materialization (bit_xor of xxhash64 over all
    # output columns). The default count() action lets Catalyst prune
    # work a real consumer pays for — e.g. a count prunes the fanout
    # as-of's argmax but not the merge form's window, so count-only
    # numbers can invert the true ranking of two strategies
    # (BENCH_NOTES_r7.md). ON by default since round 8 (the summary line
    # carries materialized_total_wall so the round artifact records the
    # honest number); set =0 to skip and roughly halve bench wall time.
    materialize = os.environ.get("SPARK_GRAFT_BENCH_MATERIALIZE", "1") != "0"
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    materialized: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        # per-query failure isolation: one broken query must never zero
        # the whole round's perf evidence — record the error, keep timing
        # the rest, and still emit the JSON line (exit 0)
        try:
            samples: list[float] = []
            while True:
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.count()  # force full execution; write-free action
                samples.append(time.perf_counter() - t0)
                if len(samples) >= repeats + (2 if min(samples) < 1.0 else 0):
                    break
            samples.sort()
            timings[name] = round(samples[0], 3)
            medians[name] = round(samples[len(samples) // 2], 3)
            if materialize:
                # own try: a non-hashable output type (array/variant)
                # must not flag the query errored — the count metric
                # above already succeeded; just skip the extra number
                try:
                    from pyspark.sql import functions as F

                    msamples: list[float] = []
                    for _ in range(repeats):
                        # timer starts BEFORE query construction, same
                        # as the count loop — for queries with eager
                        # localCheckpoints, construction IS the compute
                        t0 = time.perf_counter()
                        df = queries[name](spark, SF_DIR)
                        df.select(
                            F.bit_xor(F.xxhash64(*df.columns))
                        ).collect()
                        msamples.append(time.perf_counter() - t0)
                        spark.catalog.clearCache()
                    materialized[name] = round(min(msamples), 3)
                except Exception:  # noqa: BLE001 — optional metric
                    pass
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        finally:
            # Session hygiene between queries: round 5 showed a uniform
            # 1.1–1.8x drift across untouched queries as the headline set
            # grew 23→36 in one long session — drop cached frames and
            # collect py-side garbage so query N+1 isn't paying for the
            # residue of queries 1..N.
            spark.catalog.clearCache()
            df = None  # drop the last result ref before releasing blocks
            gc.collect()
            _release_persistent_rdds(spark)

    # with any failed query, a summed total would silently cover fewer
    # queries and read as a round-over-round speedup — null it out and
    # flag the run partial so cross-round comparisons can't be fooled
    total = round(sum(timings.values()), 3) if not errors else None
    # materialized total is labeled with its coverage (materialized_n):
    # queries with non-hashable output types skip the materialize metric,
    # so the sum covers materialized_n of n_queries — recorded explicitly
    # so a partial-coverage sum can never masquerade as the full total
    mat_total = (
        round(sum(materialized.values()), 3)
        if materialize and not errors and materialized
        else None
    )
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "materialized_total_wall": mat_total,
        "materialized_n": len(materialized),
        "unit": "sec",
        "partial": bool(errors),
        "queries": timings,
        "queries_median": medians,
        **({"queries_materialized": materialized} if materialize else {}),
        "errors": errors,
        "repeats_min": repeats,
        "sf": _sf_from_dir(SF_DIR),
    }
    # full detail: committed file + an early stdout line (humans/debug)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(json.dumps(full))
    # penultimate lines: per-query timings in tail-survivable chunks
    # (round-13 verdict item 2); slowest queries land nearest the summary
    for line in per_query_lines(timings):
        print(line)
    # LAST line = compact summary — must survive the driver's tail capture
    print(summary_line(full))


if __name__ == "__main__":
    main()
