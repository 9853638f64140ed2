"""Registry mapping query names → (spark callable, oracle SQL).

This is the single source of truth consumed by ``__spark_entry__``.
Every operator from SURVEY.md §2 that is implemented gets a named entry;
oracle SQL is omitted only for genuinely non-SQL-expressible operators
(the driver then records a weaker rows-only check).

Ordering contract: the correctness driver grades the FIRST 50 entries of
``spark_queries()``/``oracle_queries()``. Through round 10 the window was
the _REGISTRY insertion order (one slot per operator family, rotated each
round until every entry had been graded at least once — closed in round
10). From round 11 the window is the explicit ``TIER1`` list below,
selected STALENESS-FIRST: the 50 entries whose last driver grade is
oldest, so no entry's last grade ages past ~4 rounds. ``_REGISTRY``
insertion order no longer affects grading; it remains grouped by family
for readability (historical tier comments preserved).

``tests/test_catalog_plan_lint.py`` asserts the window really contains
every TIER1_REQUIRED name so a careless edit can't silently push an
entry out of the graded window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics
from . import llm_queries as lq
from . import operator_queries as oq
from . import scd2_queries as sq
from ..streaming import stream_pipeline as sp

# How many leading entries the correctness driver grades.
GRADED_WINDOW = 50

# name -> (callable, oracle_sql | None)
_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    # ------------------------------------------------------------------
    # Tier 1 — one entry per unique operator family (graded window).
    # Round-10 rotation (verdict item 4, completed in two waves): ALL 31
    # remaining never-driver-graded entries promoted — the full
    # curation-funnel family, the dedup long tail, the TPC-H long tail
    # (Q2/Q9/Q10/Q12/Q15/Q16/Q17/Q19/Q22), sampling, brute-force ANN,
    # embedding stats/preprocess, salted skew join, chunking, n-gram
    # contamination, BPE merge counting, tfidf, gap fill and both decile
    # forms — plus the SEVEN new round-10 builds
    # (streaming_cdc_partitioned_warehouse, revenue_deciles_distributed,
    # streaming_dedup_within_watermark, compacted_partition_scan,
    # incremental_value_quantiles, streaming_quantile_maintenance_state,
    # similarity_topk_ivf_incremental).
    # 38 slots demoted to tier 2, every one driver-graded green 2-9
    # times and still oracle-checked every pytest run. After this
    # round's grading, every catalog entry has been driver-graded at
    # least once — the rotation program that began in round 7 closes.
    # ------------------------------------------------------------------
    "flagship_revenue_by_nation": (
        analytics.flagship_revenue_by_nation,
        analytics.FLAGSHIP_ORACLE,
    ),
    # round-10 promotions: TPC-H long-tail shapes — Q10 returned-item
    # revenue (filter+join+topk), Q9-style product-type profit and the
    # Q15 max-revenue supplier (scalar-threshold-from-same-aggregate);
    # they take the scan/predicate family slots whose representatives
    # graded green 9 rounds straight (filtered_incremental_scan,
    # regex_predicate, price_tolerance_check — now tier 2)
    "returned_item_revenue": (
        oq.returned_item_revenue,
        oq.RETURNED_ITEM_REVENUE_ORACLE,
    ),
    "product_type_profit": (
        oq.product_type_profit,
        oq.PRODUCT_TYPE_PROFIT_ORACLE,
    ),
    "top_revenue_supplier": (
        oq.top_revenue_supplier,
        oq.TOP_REVENUE_SUPPLIER_ORACLE,
    ),
    # round-10 NEW (second wave): bounded-state streaming dedup —
    # dropDuplicatesWithinWatermark through a real AvailableNow query
    # over a duplicated events feed; takes asof_events_to_orders_fanout's
    # slot (graded green r09; the as-of family stays covered in tier 2 by
    # all three physical forms, each driver-graded r07-r09)
    "streaming_dedup_within_watermark": (
        sp.streaming_dedup_within_watermark,
        sp.STREAMING_DEDUP_WITHIN_WATERMARK_ORACLE,
    ),
    # §2.6 SCD2 merge (centerpiece)
    "scd2_merge_customers": (
        sq.scd2_merge_customers,
        sq.SCD2_MERGE_CUSTOMERS_ORACLE,
    ),
    # round-10 NEW: the streaming partitioned×versioned CDC consumer —
    # foreachBatch exactly-once (in-table marker) over
    # apply_cdc_partitioned_versioned, the complete Debezium-to-
    # partitioned-warehouse shape (carried round-8 verdict item 6);
    # takes snapshot_diff_orders' slot (graded green r07-r09, §2.7
    # family still covered by the CDC entries below)
    "streaming_cdc_partitioned_warehouse": (
        sp.streaming_cdc_partitioned_warehouse,
        sp.STREAMING_CDC_PARTITIONED_WAREHOUSE_ORACLE,
    ),
    # §2.3 validation / expectation suites (forced-broadcast FK hint
    # dropped this round per the r09 verdict — re-graded after change)
    "data_quality_expectations": (
        oq.data_quality_expectations,
        oq.DATA_QUALITY_EXPECTATIONS_ORACLE,
    ),
    # round-10 promotion: Gopher-style heuristic quality filter — the
    # errors-array validation pattern over text-quality signals; takes
    # validation_rule_counts' slot (graded green 9 rounds straight)
    "quality_filter_docs": (
        lq.quality_filter_docs,
        lq.QUALITY_FILTER_DOCS_ORACLE,
    ),
    # round-10 promotion: date-spine gap fill + forward fill; takes
    # discount_band_revenue's slot (graded r07-r09)
    "gap_filled_daily_order_counts": (
        oq.gap_filled_daily_order_counts,
        oq.GAP_FILLED_DAILY_ORDER_COUNTS_ORACLE,
    ),
    # round-10 promotions: ntile decile segmentation (exact window form,
    # never graded) AND its new fact-scale twin — exact distributed
    # ranking via range partitions + shard-local positions, NO global
    # sort (verdict item 8); they take the scalar-function slot
    # (multiformat_date_parse graded green 9 rounds straight)
    "customer_revenue_deciles": (
        oq.customer_revenue_deciles,
        oq.CUSTOMER_REVENUE_DECILES_ORACLE,
    ),
    "revenue_deciles_distributed": (
        oq.revenue_deciles_distributed,
        oq.REVENUE_DECILES_DISTRIBUTED_ORACLE,
    ),
    # LLM-data-pipeline: deduplication — round-10 promotions take the
    # family's graded slots from dedup_exact_summary (9× green),
    # minhash_lsh_neardups and simhash_planted_pairs (8× green each):
    # C4-style global line dedup (the exact-dedup shape at line grain),
    # full-corpus banded SimHash (guaranteed-recall LSH) and SemDeDup-
    # style embedding-space dedup end-to-end
    "line_dedup_corpus": (lq.line_dedup_corpus, lq.LINE_DEDUP_CORPUS_ORACLE),
    "simhash_banded_neardups": (
        lq.simhash_banded_neardups,
        lq.SIMHASH_BANDED_NEARDUPS_ORACLE,
    ),
    "semantic_dedup_components": (
        lq.semantic_dedup_components,
        lq.SEMANTIC_DEDUP_COMPONENTS_ORACLE,
    ),
    # LLM-data-pipeline: curation — round-10 promotions: the end-to-end
    # per-source curation funnel (quality → dedup → contamination →
    # tokens) and PII redaction take the slots of corpus_curation_stats
    # and token_budget_packing (8× green each, now tier 2)
    "corpus_prep_pipeline": (
        lq.corpus_prep_pipeline,
        lq.CORPUS_PREP_PIPELINE_ORACLE,
    ),
    "pii_scrub_docs": (lq.pii_scrub_docs, lq.PII_SCRUB_DOCS_ORACLE),
    # round-10 NEW (second wave): incremental IVF index maintenance —
    # frozen-centroid assignment of late-arriving vectors, all-cell
    # probe proves exact top-k over the appended index; takes
    # embedding_quantization's slot (graded green r09; the ANN family
    # stays covered in-window by similarity_topk_bruteforce)
    "similarity_topk_ivf_incremental": (
        lq.similarity_topk_ivf_incremental,
        lq.SIMILARITY_TOPK_IVF_INCREMENTAL_ORACLE,
    ),
    # round-9 promotion: PMI collocation mining — never driver-graded
    "bigram_pmi": (lq.bigram_pmi, lq.BIGRAM_PMI_ORACLE),
    # round-10 promotion: ExactSubstr-style cross-doc repeated-span
    # signal (the round-9 xxhash64 plan fix, now driver-graded); takes
    # embedding_neardup_pairs' slot (8× green)
    "repeated_ngram_spans": (
        lq.repeated_ngram_spans,
        lq.REPEATED_NGRAM_SPANS_ORACLE,
    ),
    # LLM-data-pipeline: text analysis — round-10 promotions: Gopher
    # repetition signals, Unicode NFC canonicalization (Arrow kernel)
    # and salient-term tf-idf take the slots of text_quality_stats,
    # language_id_heuristic and token_count_bpe (8× green each)
    "repetition_stats_docs": (
        lq.repetition_stats_docs,
        lq.REPETITION_STATS_DOCS_ORACLE,
    ),
    "unicode_normalize_docs": (
        lq.unicode_normalize_docs,
        lq.UNICODE_NORMALIZE_DOCS_ORACLE,
    ),
    "tfidf_top_terms": (lq.tfidf_top_terms, lq.TFIDF_TOP_TERMS_ORACLE),
    # round-10 promotion: blocked Levenshtein entity resolution; takes
    # the multimodal slot (multimodal_features 8× green, now tier 2)
    "fuzzy_name_match": (
        oq.fuzzy_name_match,
        oq.FUZZY_NAME_MATCH_ORACLE,
    ),
    # round-9 promotion: reproducible training-epoch shuffle + sharding
    # (md5 sort key, shard-local positions) — never driver-graded
    "epoch_shuffle_docs": (
        lq.epoch_shuffle_docs,
        lq.EPOCH_SHUFFLE_DOCS_ORACLE,
    ),
    # round-10 NEW (second wave): incrementally-maintained quantiles —
    # mergeable fixed-bin histogram state (the non-decomposable-metric
    # counterpart to incremental_monthly_revenue's monoid partials);
    # takes grouping_sets_revenue's slot (graded green r09; the
    # multi-grain agg family stays covered by cube/rollup in tier 2)
    "incremental_value_quantiles": (
        oq.incremental_value_quantiles,
        oq.INCREMENTAL_VALUE_QUANTILES_ORACLE,
    ),
    # round-10 NEW (second wave): the streaming quantile-maintenance
    # loop — histogram monoid state under the exactly-once
    # state-embedded-marker protocol; same oracle as the batch form, so
    # the key grades algebra + plumbing together. Takes
    # interpolated_daily_values' slot (graded green r09; the date-spine
    # family stays covered by gap_filled_daily_order_counts in tier 1)
    "streaming_quantile_maintenance_state": (
        sp.streaming_quantile_maintenance_state,
        oq.INCREMENTAL_VALUE_QUANTILES_ORACLE,
    ),
    # round-9 promotion: partial-column (patch) CDC apply — per-column
    # argmax over surviving patches with delete-horizon semantics
    # (operators/cdc.py apply_cdc_patch) — never driver-graded; the
    # whole-row LWW apply it displaces graded green r08
    "cdc_patch_orders": (
        oq.cdc_patch_orders,
        oq.CDC_PATCH_ORDERS_ORACLE,
    ),
    # round-9 promotion: partition-scoped CDC apply — only affected
    # partitions rewritten, untouched ones hardlinked (operators/cdc.py
    # apply_cdc_partitioned + io.py overwrite_partitions) — never graded
    "cdc_partitioned_apply_orders": (
        oq.cdc_partitioned_apply_orders,
        oq.CDC_PARTITIONED_APPLY_ORDERS_ORACLE,
    ),
    # round-9 NEW: the partitioned × versioned composition — the same
    # log delivered as out-of-order per-sequence batches must converge
    # to the whole-log fold while rewriting only affected partitions
    # (operators/cdc.py apply_cdc_partitioned_versioned)
    "cdc_partitioned_versioned_orders": (
        oq.cdc_partitioned_versioned_orders,
        oq.CDC_PARTITIONED_VERSIONED_ORDERS_ORACLE,
    ),
    # round-8 NEW: CDC × MV composition — one foreachBatch loop maintains
    # the versioned snapshot (out-of-order-safe apply_cdc_versioned) AND
    # its group aggregate (bounded affected-group re-aggregate with
    # retraction), exactly-once across BOTH tables
    "cdc_mv_maintenance_state": (
        sp.cdc_mv_maintenance_state,
        sp.CDC_MV_MAINTENANCE_STATE_ORACLE,
    ),
    # round-10 NEW (second wave): partition-scoped small-file compaction
    # (TableStore.compact_partitions) end-to-end — bloat, compact,
    # aggregate; takes zorder_rank_pruned_scan's slot (graded green r09;
    # the layout family stays covered by the Z-order/bucketed tier-2
    # entries, each driver-graded r08-r09)
    "compacted_partition_scan": (
        oq.compacted_partition_scan,
        oq.COMPACTED_PARTITION_SCAN_ORACLE,
    ),
    # round-9 promotion: TPC-H Q8 market-share shape — never graded
    "nation_market_share": (
        oq.nation_market_share,
        oq.NATION_MARKET_SHARE_ORACLE,
    ),
    # round-9 (verdict item 8): the bucketed zero-exchange layout join,
    # pytest-pinned since round 6 but never driver-graded — takes
    # order_priority_counts' slot (graded green r08; the group-by-count
    # family stays via customer_order_distribution + grouping_sets)
    "bucketed_colocated_revenue": (
        oq.bucketed_colocated_revenue,
        oq.BUCKETED_COLOCATED_REVENUE_ORACLE,
    ),
    # round-9 promotion: TPC-H Q11 scalar-subquery-HAVING shape — never
    # driver-graded (validates the round-7 decimal-threshold fix under
    # the driver gate, per the round-8 verdict)
    "important_part_revenue": (
        oq.important_part_revenue,
        oq.IMPORTANT_PART_REVENUE_ORACLE,
    ),
    # round-10 second-wave promotions: the FINAL 15 never-driver-graded
    # entries (closing the set a round early — after this round every
    # catalog entry has been driver-graded at least once): the TPC-H
    # Q2/Q12/Q16/Q17/Q19/Q22 long tail, sampling (stratified/weighted),
    # brute-force ANN baseline, embedding stats/preprocess, salted skew
    # join, chunking, n-gram contamination and BPE merge counting
    "shipping_delay_priority_mix": (
        oq.shipping_delay_priority_mix,
        oq.SHIPPING_DELAY_PRIORITY_MIX_ORACLE,
    ),
    "part_supplier_diversity": (
        oq.part_supplier_diversity,
        oq.PART_SUPPLIER_DIVERSITY_ORACLE,
    ),
    "small_quantity_revenue": (
        oq.small_quantity_revenue,
        oq.SMALL_QUANTITY_REVENUE_ORACLE,
    ),
    "disjunctive_promo_revenue": (
        oq.disjunctive_promo_revenue,
        oq.DISJUNCTIVE_PROMO_REVENUE_ORACLE,
    ),
    "best_price_supplier_per_part": (
        oq.best_price_supplier_per_part,
        oq.BEST_PRICE_SUPPLIER_PER_PART_ORACLE,
    ),
    "stratified_sample_docs": (
        lq.stratified_sample_docs,
        lq.STRATIFIED_SAMPLE_DOCS_ORACLE,
    ),
    "similarity_topk_bruteforce": (
        lq.similarity_topk_bruteforce,
        lq.SIMILARITY_TOPK_BRUTEFORCE_ORACLE,
    ),
    "embedding_dimension_stats": (
        lq.embedding_dimension_stats,
        lq.EMBEDDING_DIMENSION_STATS_ORACLE,
    ),
    "salted_join_revenue": (
        oq.salted_join_revenue,
        oq.SALTED_JOIN_REVENUE_ORACLE,
    ),
    "weighted_source_sample": (
        lq.weighted_source_sample,
        lq.WEIGHTED_SOURCE_SAMPLE_ORACLE,
    ),
    "chunk_documents": (lq.chunk_documents, lq.CHUNK_DOCUMENTS_ORACLE),
    "contamination_ngram_overlap": (
        lq.contamination_ngram_overlap,
        lq.CONTAMINATION_NGRAM_OVERLAP_ORACLE,
    ),
    "bpe_merge_candidates": (
        lq.bpe_merge_candidates,
        lq.BPE_MERGE_CANDIDATES_ORACLE,
    ),
    "embedding_preprocess": (
        lq.embedding_preprocess,
        lq.EMBEDDING_PREPROCESS_ORACLE,
    ),
    "lapsed_high_balance_customers": (
        oq.lapsed_high_balance_customers,
        oq.LAPSED_HIGH_BALANCE_CUSTOMERS_ORACLE,
    ),
    # ------------------------------------------------------------------
    # Tier 2 — same-family variants (past the graded window)
    # ------------------------------------------------------------------
    # round-10 second-wave demotions (each graded green r09; displaced by
    # the bounded-dedup, partition-compaction and histogram-quantile
    # builds)
    "interpolated_daily_values": (
        oq.interpolated_daily_values,
        oq.INTERPOLATED_DAILY_VALUES_ORACLE,
    ),
    "embedding_quantization": (
        lq.embedding_quantization,
        lq.EMBEDDING_QUANTIZATION_ORACLE,
    ),
    "grouping_sets_revenue": (
        oq.grouping_sets_revenue,
        oq.GROUPING_SETS_REVENUE_ORACLE,
    ),
    "asof_events_to_orders_fanout": (
        oq.asof_events_to_orders_fanout,
        oq.ASOF_EVENTS_TO_ORDERS_ORACLE,
    ),
    "zorder_rank_pruned_scan": (
        oq.zorder_rank_pruned_scan,
        oq.ZORDER_RANK_PRUNED_SCAN_ORACLE,
    ),
    # round-8 rotation demotions (each driver-graded green 2-7 rounds:
    # semi/anti join r01-r07, default as-of merge r07, change-comparison
    # r07, change-detect r01-r07, first-occurrence dedup r07, conditional
    # counters r07, union split r07, string functions r07, top-k r07,
    # pivot r07, array stats r07, variant/quantile/window-frame/
    # incremental-minhash r06+r07). Families remain represented in
    # tier 1 by bloom_filtered_orders (semi), part-diversity/Q22-style
    # anti joins in the long-tail shapes, asof_events_to_orders_skewsafe
    # (same oracle), scd2_merge_customers, snapshot_diff_orders,
    # dedup_exact_summary/dedup_keep_best_quality,
    # customer_order_distribution (aggregates), multiformat_date_parse
    # (scalar fns), suppliers_who_kept_waiting (sorts/top-k via its
    # ordered output), hopping_event_rates (window frames) and
    # minhash_lsh_neardups.
    # round-9 demotion: graded green r08; group-by-count family stays in
    # tier 1 via customer_order_distribution + grouping_sets_revenue
    "order_priority_counts": (
        oq.order_priority_counts,
        oq.ORDER_PRIORITY_COUNTS_ORACLE,
    ),
    "semi_join_customers_with_orders": (
        oq.semi_join_customers_with_orders,
        oq.SEMI_JOIN_ORACLE,
    ),
    # J2 current-version lookup (graded r01-r07; per-key-winner family
    # represented in tier 1 by dedup_keep_best_quality)
    "latest_order_per_customer": (
        oq.latest_order_per_customer,
        oq.LATEST_ORDER_PER_CUSTOMER_ORACLE,
    ),
    "anti_join_customers_without_orders": (
        oq.anti_join_customers_without_orders,
        oq.ANTI_JOIN_ORACLE,
    ),
    # J3 default physical strategy (fanout-free merged timeline; graded
    # r01-r07, same oracle as the graded skew-safe variant)
    "asof_events_to_orders": (
        oq.asof_events_to_orders,
        oq.ASOF_EVENTS_TO_ORDERS_ORACLE,
    ),
    "change_comparison_join": (
        sq.change_comparison_join,
        sq.CHANGE_COMPARISON_JOIN_ORACLE,
    ),
    "change_detect_events": (
        oq.change_detect_events,
        oq.CHANGE_DETECT_EVENTS_ORACLE,
    ),
    "first_occurrence_dedup": (
        oq.first_occurrence_dedup,
        oq.FIRST_OCCURRENCE_DEDUP_ORACLE,
    ),
    "conditional_counters": (
        oq.conditional_counters,
        oq.CONDITIONAL_COUNTERS_ORACLE,
    ),
    "union_split_streams": (oq.union_split_streams, oq.UNION_SPLIT_STREAMS_ORACLE),
    "string_functions": (oq.string_functions, oq.STRING_FUNCTIONS_ORACLE),
    "top_orders_by_value": (oq.top_orders_by_value, oq.TOP_ORDERS_BY_VALUE_ORACLE),
    "pivot_status_by_priority": (
        oq.pivot_status_by_priority,
        oq.PIVOT_STATUS_BY_PRIORITY_ORACLE,
    ),
    "array_stats_embeddings": (
        oq.array_stats_embeddings,
        oq.ARRAY_STATS_EMBEDDINGS_ORACLE,
    ),
    "variant_extract_events": (
        oq.variant_extract_events,
        oq.VARIANT_EXTRACT_EVENTS_ORACLE,
    ),
    "order_value_quantiles": (
        oq.order_value_quantiles,
        oq.ORDER_VALUE_QUANTILES_ORACLE,
    ),
    "rolling_hourly_user_value": (
        oq.rolling_hourly_user_value,
        oq.ROLLING_HOURLY_USER_VALUE_ORACLE,
    ),
    "minhash_incremental_pairs": (
        lq.minhash_incremental_pairs,
        lq.MINHASH_INCREMENTAL_PAIRS_ORACLE,
    ),
    # round-7 rotation demotions (all driver-graded green in r05/r06)
    "projection_filter": (oq.projection_filter, oq.PROJECTION_FILTER_ORACLE),
    "rollup_revenue": (oq.rollup_revenue, oq.ROLLUP_REVENUE_ORACLE),
    "approx_distinct_counts": (
        oq.approx_distinct_counts,
        oq.APPROX_DISTINCT_COUNTS_ORACLE,
    ),
    "null_aware_aggregates": (
        oq.null_aware_aggregates,
        oq.NULL_AWARE_AGGREGATES_ORACLE,
    ),
    "sessionize_events": (
        analytics.sessionize_events,
        analytics.SESSIONIZE_EVENTS_ORACLE,
    ),
    # J3 skew-safe two-phase merge strategy (driver-graded green r08;
    # same oracle as the graded fanout form)
    "asof_events_to_orders_skewsafe": (
        oq.asof_events_to_orders_skewsafe,
        oq.ASOF_EVENTS_TO_ORDERS_ORACLE,
    ),
    # round-7 TPC-H long-tail shapes — remaining tier-2 variants (their
    # never-graded siblings were promoted in the round-10 second wave).
    "groupby_count_desc": (oq.groupby_count_desc, oq.GROUPBY_COUNT_DESC_ORACLE),
    "max_key_allocation": (oq.max_key_allocation, oq.MAX_KEY_ALLOCATION_ORACLE),
    "distinct_keys": (oq.distinct_keys, oq.DISTINCT_KEYS_ORACLE),
    "calendar_decomposition": (
        oq.calendar_decomposition,
        oq.CALENDAR_DECOMPOSITION_ORACLE,
    ),
    "deterministic_sample": (
        oq.deterministic_sample,
        oq.DETERMINISTIC_SAMPLE_ORACLE,
    ),
    "json_extract_events": (oq.json_extract_events, oq.JSON_EXTRACT_EVENTS_ORACLE),
    "running_customer_revenue": (
        oq.running_customer_revenue,
        oq.RUNNING_CUSTOMER_REVENUE_ORACLE,
    ),
    "scd2_intervals_from_orders": (
        oq.scd2_intervals_from_orders,
        oq.SCD2_INTERVALS_ORACLE,
    ),
    "pricing_summary": (
        analytics.pricing_summary,
        analytics.PRICING_SUMMARY_ORACLE,
    ),
    "domain_predicate": (oq.domain_predicate, oq.DOMAIN_PREDICATE_ORACLE),
    "null_blank_predicate": (
        oq.null_blank_predicate,
        oq.NULL_BLANK_PREDICATE_ORACLE,
    ),
    "ngram_jaccard_planted_pairs": (
        lq.ngram_jaccard_planted_pairs,
        lq.NGRAM_JACCARD_PLANTED_PAIRS_ORACLE,
    ),
    "winnowing_overlap_pairs": (
        lq.winnowing_overlap_pairs,
        lq.WINNOWING_OVERLAP_PAIRS_ORACLE,
    ),
    "shipping_priority": (
        analytics.shipping_priority,
        analytics.SHIPPING_PRIORITY_ORACLE,
    ),
    "large_volume_customers": (
        analytics.large_volume_customers,
        analytics.LARGE_VOLUME_CUSTOMERS_ORACLE,
    ),
    "session_window_events": (
        analytics.session_window_events,
        analytics.SESSION_WINDOW_EVENTS_ORACLE,
    ),
    "event_funnel": (analytics.event_funnel, analytics.EVENT_FUNNEL_ORACLE),
    "weekly_retention_cohorts": (
        analytics.weekly_retention_cohorts,
        analytics.WEEKLY_RETENTION_COHORTS_ORACLE,
    ),
    "top_bigrams": (analytics.top_bigrams, analytics.TOP_BIGRAMS_ORACLE),
    "order_value_histogram": (
        oq.order_value_histogram,
        oq.ORDER_VALUE_HISTOGRAM_ORACLE,
    ),
    "median_order_values": (oq.median_order_values, oq.MEDIAN_ORDER_VALUES_ORACLE),
    "cube_revenue": (oq.cube_revenue, oq.CUBE_REVENUE_ORACLE),
    "unpivot_status_counts": (
        oq.unpivot_status_counts,
        oq.UNPIVOT_STATUS_COUNTS_ORACLE,
    ),
    "intersect_except_users": (
        oq.intersect_except_users,
        oq.INTERSECT_EXCEPT_USERS_ORACLE,
    ),
    "cheapest_part_per_type": (
        oq.cheapest_part_per_type,
        oq.CHEAPEST_PART_PER_TYPE_ORACLE,
    ),
    "event_value_anomalies": (
        oq.event_value_anomalies,
        oq.EVENT_VALUE_ANOMALIES_ORACLE,
    ),
    "dedup_exact_groups": (lq.dedup_exact_groups, lq.DEDUP_EXACT_GROUPS_ORACLE),
    "doc_fingerprints": (lq.doc_fingerprints, lq.DOC_FINGERPRINTS_ORACLE),
    # training-data curation (round-4 additions): mixture sampling with
    # a deterministic cross-engine hash gate
    # round-5 additions: the n-gram contamination tier (winnowing
    # fingerprints vs a broadcast probe index) and the Gopher-style
    # heuristic quality filter (errors-array pattern over quality signals)
    # round-5: distributed BPE merge-candidate counting
    # round-5: per-dim centering + L2 norms (ANN/k-means preprocessing)
    # round-7: TPC-H Q22 shape — scalar-average subquery + anti join
    # ------------------------------------------------------------------
    # round-10 rotation demotions (driver-graded green 2-9 times each;
    # still oracle-checked every pytest run)
    # ------------------------------------------------------------------
    "repeat_purchases_within_90d": (
        oq.repeat_purchases_within_90d,
        oq.REPEAT_PURCHASES_WITHIN_90D_ORACLE,
    ),
    "contamination_screen": (
        lq.contamination_screen,
        lq.CONTAMINATION_SCREEN_ORACLE,
    ),
    "corpus_dedup_components_star": (
        lq.corpus_dedup_components_star,
        lq.CORPUS_DEDUP_COMPONENTS_STAR_ORACLE,
    ),
    "dedup_keep_best_quality": (
        lq.dedup_keep_best_quality,
        lq.DEDUP_KEEP_BEST_QUALITY_ORACLE,
    ),
    "similarity_topk_ivf": (
        lq.similarity_topk_ivf,
        lq.SIMILARITY_TOPK_IVF_ORACLE,
    ),
    "trigram_lm_scores": (
        lq.trigram_lm_scores,
        lq.TRIGRAM_LM_SCORES_ORACLE,
    ),
    "heavy_hitter_bigrams": (
        lq.heavy_hitter_bigrams,
        lq.HEAVY_HITTER_BIGRAMS_ORACLE,
    ),
    "streaming_click_purchase_join": (
        sp.streaming_click_purchase_join,
        sp.STREAMING_CLICK_PURCHASE_JOIN_ORACLE,
    ),
    "stateful_sessionize": (
        sp.stateful_sessionize,
        sp.STATEFUL_SESSIONIZE_ORACLE,
    ),
    "streaming_agg_maintenance_state": (
        sp.streaming_agg_maintenance_state,
        sp.STREAMING_AGG_MAINTENANCE_STATE_ORACLE,
    ),
    "incremental_monthly_revenue": (
        oq.incremental_monthly_revenue,
        oq.INCREMENTAL_MONTHLY_REVENUE_ORACLE,
    ),
    "bloom_filtered_orders": (
        oq.bloom_filtered_orders,
        oq.BLOOM_FILTERED_ORDERS_ORACLE,
    ),
    "customer_order_distribution": (
        oq.customer_order_distribution,
        oq.CUSTOMER_ORDER_DISTRIBUTION_ORACLE,
    ),
    "surplus_part_suppliers": (
        oq.surplus_part_suppliers,
        oq.SURPLUS_PART_SUPPLIERS_ORACLE,
    ),
    "bilateral_trade_volume": (
        oq.bilateral_trade_volume,
        oq.BILATERAL_TRADE_VOLUME_ORACLE,
    ),
    "filtered_incremental_scan": (
        oq.filtered_incremental_scan,
        oq.FILTERED_INCREMENTAL_SCAN_ORACLE,
    ),
    "regex_predicate": (oq.regex_predicate, oq.REGEX_PREDICATE_ORACLE),
    "price_tolerance_check": (
        oq.price_tolerance_check,
        oq.PRICE_TOLERANCE_CHECK_ORACLE,
    ),
    "snapshot_diff_orders": (
        oq.snapshot_diff_orders,
        oq.SNAPSHOT_DIFF_ORDERS_ORACLE,
    ),
    "validation_rule_counts": (
        oq.validation_rule_counts,
        oq.VALIDATION_RULE_COUNTS_ORACLE,
    ),
    "discount_band_revenue": (
        oq.discount_band_revenue,
        oq.DISCOUNT_BAND_REVENUE_ORACLE,
    ),
    "multiformat_date_parse": (
        oq.multiformat_date_parse,
        oq.MULTIFORMAT_DATE_PARSE_ORACLE,
    ),
    "dedup_exact_summary": (lq.dedup_exact_summary, lq.DEDUP_EXACT_SUMMARY_ORACLE),
    "minhash_lsh_neardups": (
        lq.minhash_lsh_neardups,
        lq.MINHASH_LSH_NEARDUPS_ORACLE,
    ),
    "simhash_planted_pairs": (
        lq.simhash_planted_pairs,
        lq.SIMHASH_PLANTED_PAIRS_ORACLE,
    ),
    "corpus_curation_stats": (
        lq.corpus_curation_stats,
        lq.CORPUS_CURATION_STATS_ORACLE,
    ),
    "token_budget_packing": (
        lq.token_budget_packing,
        lq.TOKEN_BUDGET_PACKING_ORACLE,
    ),
    "embedding_neardup_pairs": (
        lq.embedding_neardup_pairs,
        lq.EMBEDDING_NEARDUP_PAIRS_ORACLE,
    ),
    "text_quality_stats": (lq.text_quality_stats, lq.TEXT_QUALITY_STATS_ORACLE),
    "language_id_heuristic": (
        lq.language_id_heuristic,
        lq.LANGUAGE_ID_HEURISTIC_ORACLE,
    ),
    "token_count_bpe": (lq.token_count_bpe, lq.TOKEN_COUNT_BPE_ORACLE),
    "multimodal_features": (sq.multimodal_features, sq.MULTIMODAL_FEATURES_ORACLE),
    "suppliers_who_kept_waiting": (
        oq.suppliers_who_kept_waiting,
        oq.SUPPLIERS_WHO_KEPT_WAITING_ORACLE,
    ),
    # ------------------------------------------------------------------
    # round-9 rotation demotions (each driver-graded green at least once
    # — most r08, streaming_event_counts r01-r08 — family still
    # represented in tier 1, still oracle-checked every pytest run)
    # ------------------------------------------------------------------
    "corpus_dedup_components": (
        lq.corpus_dedup_components,
        lq.CORPUS_DEDUP_COMPONENTS_ORACLE,
    ),
    "similarity_topk_bucketed": (
        lq.similarity_topk_bucketed,
        lq.SIMILARITY_TOPK_BUCKETED_ORACLE,
    ),
    "similarity_topk_quantized": (
        lq.similarity_topk_quantized,
        lq.SIMILARITY_TOPK_QUANTIZED_ORACLE,
    ),
    "streaming_event_counts": (
        sp.streaming_event_counts,
        sp.STREAMING_EVENT_COUNTS_ORACLE,
    ),
    "streaming_enriched_segment_counts": (
        sp.streaming_enriched_segment_counts,
        sp.STREAMING_ENRICHED_SEGMENT_COUNTS_ORACLE,
    ),
    "streaming_hopping_rates": (
        sp.streaming_hopping_rates,
        sp.STREAMING_HOPPING_RATES_ORACLE,
    ),
    "cdc_apply_orders": (
        oq.cdc_apply_orders,
        oq.CDC_APPLY_ORDERS_ORACLE,
    ),
    "zorder_pruned_scan": (
        oq.zorder_pruned_scan,
        oq.ZORDER_PRUNED_SCAN_ORACLE,
    ),
    "hopping_event_rates": (
        oq.hopping_event_rates,
        oq.HOPPING_EVENT_RATES_ORACLE,
    ),
    "table_stats_orders": (
        oq.table_stats_orders,
        oq.TABLE_STATS_ORDERS_ORACLE,
    ),
    "local_supplier_volume": (
        oq.local_supplier_volume,
        oq.LOCAL_SUPPLIER_VOLUME_ORACLE,
    ),
    "promo_revenue_share": (
        oq.promo_revenue_share,
        oq.PROMO_REVENUE_SHARE_ORACLE,
    ),
    # ------------------------------------------------------------------
    # round-11 NEW builds
    # ------------------------------------------------------------------
    # adaptive (width-doubling) quantile state — lifts the round-10
    # a-priori-[lo,hi] caveat: per-group power-of-2 bin widths chosen by
    # pure comparisons, lossless coarsening on merge (verdict item 4)
    "adaptive_quantile_state": (
        oq.adaptive_quantile_state,
        oq.ADAPTIVE_QUANTILE_STATE_ORACLE,
    ),
    # incrementally-maintained HLL distinct counts, driver-gradeable via
    # the exact-contract pattern (verdict item 3)
    "incremental_distinct_counts": (
        oq.incremental_distinct_counts,
        oq.INCREMENTAL_DISTINCT_COUNTS_ORACLE,
    ),
    # streaming ANN ingest — frozen-centroid assignment per micro-batch
    # into a persisted IVF index, exactly-once two-table appends; the
    # all-cell probe over the (training ∪ streamed) index must equal
    # exact brute force (verdict item 7)
    "streaming_ivf_ingest": (
        sp.streaming_ivf_ingest,
        lq.SIMILARITY_TOPK_BRUTEFORCE_ORACLE,
    ),
    # range-free STREAMING quantile maintenance — the adaptive
    # width-doubling state under the state-embedded-marker protocol;
    # stream files split by value range so the grid must coarsen
    # mid-stream; same oracle as the batch adaptive form
    "streaming_adaptive_quantile_state": (
        sp.streaming_adaptive_quantile_state,
        oq.ADAPTIVE_QUANTILE_STATE_ORACLE,
    ),
    # ------------------------------------------------------------------
    # round-12 NEW builds
    # ------------------------------------------------------------------
    # adaptive quantile state over a SIGNED metric — negative bin
    # indices instead of a clamping floor anchor (verdict item 6)
    "adaptive_quantile_state_signed": (
        oq.adaptive_quantile_state_signed,
        oq.ADAPTIVE_QUANTILE_STATE_SIGNED_ORACLE,
    ),
    # REAL (dependency-free PNM/BMP) image decode graded end-to-end over
    # closed-form synthetic PPMs (verdict item 7)
    "multimodal_real_decode": (
        sq.multimodal_real_decode,
        sq.MULTIMODAL_REAL_DECODE_ORACLE,
    ),
    # default-parameter IVF quality contract: exact top-10 payload +
    # mean recall_ok under the shipped ivf_defaults (verdict item 3)
    "similarity_topk_ivf_recall": (
        lq.similarity_topk_ivf_recall,
        lq.SIMILARITY_TOPK_IVF_RECALL_ORACLE,
    ),
    # full real-codec pipeline: decode -> numpy resample -> re-encode ->
    # decode -> stats, oracle regenerates the resampled grid in SQL
    "multimodal_resize_decode": (
        sq.multimodal_resize_decode,
        sq.MULTIMODAL_RESIZE_DECODE_ORACLE,
    ),
    # REAL audio decode: PCM16 WAV round-trip over closed-form waveforms,
    # oracle regenerates the samples and recomputes loudness stats
    "multimodal_audio_decode": (
        sq.multimodal_audio_decode,
        sq.MULTIMODAL_AUDIO_DECODE_ORACLE,
    ),
    # REAL frame sampling: concatenated-PNM containers split + sampled +
    # per-frame decoded, oracle regenerates the sampled frames' pixels
    "multimodal_frame_sample": (
        sq.multimodal_frame_sample,
        sq.MULTIMODAL_FRAME_SAMPLE_ORACLE,
    ),
    # content-defined (rolling-hash) chunking — the shift-invariant
    # chunker for chunk-level dedup/delta storage; exact-integer
    # boundary rule replayed verbatim by the SQL oracle
    "content_defined_chunks": (
        lq.content_defined_chunks,
        lq.CONTENT_DEFINED_CHUNKS_ORACLE,
    ),
    # stdlib-zlib PNG decode (round 13): closed-form pixels in a PNG
    # container whose per-row filter cycles 0..4 — grades the chunk
    # walk, inflate, and all five scanline-filter inverses
    "multimodal_png_decode": (
        sq.multimodal_png_decode,
        sq.MULTIMODAL_PNG_DECODE_ORACLE,
    ),
    # IVF on a planted clustered corpus at nprobe = 15% of cells
    # (round 13): exact top-10 payload + mean recall@10 >= 0.9 —
    # the evidence that cell pruning pays where corpora are clustered
    "similarity_topk_ivf_clustered": (
        lq.similarity_topk_ivf_clustered,
        lq.SIMILARITY_TOPK_IVF_CLUSTERED_ORACLE,
    ),
}

# ---------------------------------------------------------------------------
# The graded window, round-14 rotation (staleness-first re-grading policy).
#
# "Graded at least once" closed in round 10; the standing target is now
# "no entry's last driver grade older than ~4 rounds". This list IS the
# window: spark_queries()/oracle_queries() emit these names first, so the
# driver grades exactly these 50. Composition (last-grade data from
# CORRECTNESS_r01..r13; r13 verdict item 1):
#   - the 12 entries the r13 verdict ordered back into the window: their
#     code changed in round 13 AFTER their last driver grade (state-
#     partition sizing, maintenance-apply job trims, MG spread, the
#     multimodal spread), so the driver has only ever graded their
#     PRE-change implementations;
#   - the round-14 CHANGED-CODE re-grades: the one-batch backlog drains +
#     single-job replay probes (cdc warehouses, agg/quantile/adaptive
#     maintenance, ivf ingest — several overlap the 12 above), the
#     incremental-minhash shared shingle cache, and the
#     content_defined_chunks input spread;
#   - the 25 remaining round-10-graded entries — the stalest cohort
#     (staleness 4 of the MAX_STALENESS=5 lint);
#   - dedup_keep_best_quality (r12-graded, examined/profiled this round)
#     and the 8 oldest round-11-graded entries in catalog order.
# Every demoted entry was graded green in r12/r13 and stays
# oracle-checked in every pytest run (tests/test_catalog_oracle.py).
# ---------------------------------------------------------------------------
TIER1: list[str] = [
    # --- r13-changed, last graded pre-change (verdict item 1; several
    #     also changed again this round) ---
    "streaming_event_counts",
    "streaming_hopping_rates",
    "streaming_enriched_segment_counts",
    "streaming_dedup_within_watermark",
    "streaming_click_purchase_join",
    "streaming_agg_maintenance_state",
    "streaming_quantile_maintenance_state",
    "streaming_adaptive_quantile_state",
    "cdc_mv_maintenance_state",
    "heavy_hitter_bigrams",
    "multimodal_audio_decode",
    "multimodal_features",
    # --- round-14 changed-code re-grades (rest) ---
    "streaming_cdc_partitioned_warehouse",
    "streaming_ivf_ingest",
    "minhash_incremental_pairs",
    "content_defined_chunks",
    "dedup_keep_best_quality",
    # --- last graded round 10 (all 25 remaining) ---
    "fuzzy_name_match",
    "epoch_shuffle_docs",
    "incremental_value_quantiles",
    "cdc_patch_orders",
    "cdc_partitioned_apply_orders",
    "cdc_partitioned_versioned_orders",
    "compacted_partition_scan",
    "nation_market_share",
    "bucketed_colocated_revenue",
    "important_part_revenue",
    "shipping_delay_priority_mix",
    "part_supplier_diversity",
    "small_quantity_revenue",
    "disjunctive_promo_revenue",
    "best_price_supplier_per_part",
    "stratified_sample_docs",
    "similarity_topk_bruteforce",
    "embedding_dimension_stats",
    "salted_join_revenue",
    "weighted_source_sample",
    "chunk_documents",
    "contamination_ngram_overlap",
    "bpe_merge_candidates",
    "embedding_preprocess",
    "lapsed_high_balance_customers",
    # --- oldest round-11-graded, catalog order (8) ---
    "latest_order_per_customer",
    "change_comparison_join",
    "change_detect_events",
    "first_occurrence_dedup",
    "conditional_counters",
    "union_split_streams",
    "string_functions",
    "top_orders_by_value",
]

# Families that MUST sit inside the graded window (lint-enforced) — with
# the staleness-first policy the window IS the TIER1 list.
TIER1_REQUIRED = frozenset(TIER1)

_unknown = TIER1_REQUIRED - set(_REGISTRY)
assert not _unknown, f"TIER1 names missing from _REGISTRY: {sorted(_unknown)}"
assert len(TIER1) == len(TIER1_REQUIRED) == GRADED_WINDOW


def _ordered_names() -> list[str]:
    """Registry names with the graded window (TIER1) first; everything
    else keeps its _REGISTRY insertion order. The driver grades the
    first GRADED_WINDOW names of the returned dicts."""
    rest = [n for n in _REGISTRY if n not in TIER1_REQUIRED]
    return TIER1 + rest


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _ordered_names()}


def oracle_queries() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _ordered_names()
        if _REGISTRY[name][1] is not None
    }
