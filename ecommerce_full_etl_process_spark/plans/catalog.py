"""Registry mapping query names → (spark callable, oracle SQL).

This is the single source of truth consumed by ``__spark_entry__``.
Every operator from SURVEY.md §2 that is implemented gets a named entry;
oracle SQL is omitted only for genuinely non-SQL-expressible operators
(the driver then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics
from . import llm_queries as lq
from . import operator_queries as oq
from . import scd2_queries as sq
from ..streaming import stream_pipeline as sp

# name -> (callable, oracle_sql | None)
_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "flagship_revenue_by_nation": (
        analytics.flagship_revenue_by_nation,
        analytics.FLAGSHIP_ORACLE,
    ),
    "pricing_summary": (
        analytics.pricing_summary,
        analytics.PRICING_SUMMARY_ORACLE,
    ),
    "shipping_priority": (
        analytics.shipping_priority,
        analytics.SHIPPING_PRIORITY_ORACLE,
    ),
    "large_volume_customers": (
        analytics.large_volume_customers,
        analytics.LARGE_VOLUME_CUSTOMERS_ORACLE,
    ),
    "sessionize_events": (
        analytics.sessionize_events,
        analytics.SESSIONIZE_EVENTS_ORACLE,
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
    # SURVEY §2.1 scans
    "filtered_incremental_scan": (
        oq.filtered_incremental_scan,
        oq.FILTERED_INCREMENTAL_SCAN_ORACLE,
    ),
    # §2.2 projections / predicates
    "projection_filter": (oq.projection_filter, oq.PROJECTION_FILTER_ORACLE),
    "regex_predicate": (oq.regex_predicate, oq.REGEX_PREDICATE_ORACLE),
    "domain_predicate": (oq.domain_predicate, oq.DOMAIN_PREDICATE_ORACLE),
    "null_blank_predicate": (
        oq.null_blank_predicate,
        oq.NULL_BLANK_PREDICATE_ORACLE,
    ),
    "price_tolerance_check": (
        oq.price_tolerance_check,
        oq.PRICE_TOLERANCE_CHECK_ORACLE,
    ),
    # §2.4 joins
    "semi_join_customers_with_orders": (
        oq.semi_join_customers_with_orders,
        oq.SEMI_JOIN_ORACLE,
    ),
    "anti_join_customers_without_orders": (
        oq.anti_join_customers_without_orders,
        oq.ANTI_JOIN_ORACLE,
    ),
    "latest_order_per_customer": (
        oq.latest_order_per_customer,
        oq.LATEST_ORDER_PER_CUSTOMER_ORACLE,
    ),
    "asof_events_to_orders": (
        oq.asof_events_to_orders,
        oq.ASOF_EVENTS_TO_ORDERS_ORACLE,
    ),
    # §2.6 / §2.7 SCD2 + change detection
    "scd2_intervals_from_orders": (
        oq.scd2_intervals_from_orders,
        oq.SCD2_INTERVALS_ORACLE,
    ),
    "change_detect_events": (
        oq.change_detect_events,
        oq.CHANGE_DETECT_EVENTS_ORACLE,
    ),
    # §2.5 aggregations / distinct / dedup
    "first_occurrence_dedup": (
        oq.first_occurrence_dedup,
        oq.FIRST_OCCURRENCE_DEDUP_ORACLE,
    ),
    "groupby_count_desc": (oq.groupby_count_desc, oq.GROUPBY_COUNT_DESC_ORACLE),
    "conditional_counters": (
        oq.conditional_counters,
        oq.CONDITIONAL_COUNTERS_ORACLE,
    ),
    "max_key_allocation": (oq.max_key_allocation, oq.MAX_KEY_ALLOCATION_ORACLE),
    "distinct_keys": (oq.distinct_keys, oq.DISTINCT_KEYS_ORACLE),
    # §2.10 set ops
    "union_split_streams": (oq.union_split_streams, oq.UNION_SPLIT_STREAMS_ORACLE),
    # §2.8 scalar functions
    "calendar_decomposition": (
        oq.calendar_decomposition,
        oq.CALENDAR_DECOMPOSITION_ORACLE,
    ),
    "multiformat_date_parse": (
        oq.multiformat_date_parse,
        oq.MULTIFORMAT_DATE_PARSE_ORACLE,
    ),
    # §2.3 validation pattern
    "validation_rule_counts": (
        oq.validation_rule_counts,
        oq.VALIDATION_RULE_COUNTS_ORACLE,
    ),
    # §2.9 sorts / top-k / sampling
    "top_orders_by_value": (oq.top_orders_by_value, oq.TOP_ORDERS_BY_VALUE_ORACLE),
    "deterministic_sample": (
        oq.deterministic_sample,
        oq.DETERMINISTIC_SAMPLE_ORACLE,
    ),
    # beyond-reference: JSON column ops
    "json_extract_events": (oq.json_extract_events, oq.JSON_EXTRACT_EVENTS_ORACLE),
    # §2.5 extensions: rollup, framed windows, approximate aggregates
    "rollup_revenue": (oq.rollup_revenue, oq.ROLLUP_REVENUE_ORACLE),
    "running_customer_revenue": (
        oq.running_customer_revenue,
        oq.RUNNING_CUSTOMER_REVENUE_ORACLE,
    ),
    "approx_distinct_counts": (
        oq.approx_distinct_counts,
        oq.APPROX_DISTINCT_COUNTS_ORACLE,
    ),
    "order_value_histogram": (
        oq.order_value_histogram,
        oq.ORDER_VALUE_HISTOGRAM_ORACLE,
    ),
    "null_aware_aggregates": (
        oq.null_aware_aggregates,
        oq.NULL_AWARE_AGGREGATES_ORACLE,
    ),
    "median_order_values": (oq.median_order_values, oq.MEDIAN_ORDER_VALUES_ORACLE),
    "pivot_status_by_priority": (
        oq.pivot_status_by_priority,
        oq.PIVOT_STATUS_BY_PRIORITY_ORACLE,
    ),
    "cube_revenue": (oq.cube_revenue, oq.CUBE_REVENUE_ORACLE),
    "unpivot_status_counts": (
        oq.unpivot_status_counts,
        oq.UNPIVOT_STATUS_COUNTS_ORACLE,
    ),
    "array_stats_embeddings": (
        oq.array_stats_embeddings,
        oq.ARRAY_STATS_EMBEDDINGS_ORACLE,
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
    "string_functions": (oq.string_functions, oq.STRING_FUNCTIONS_ORACLE),
    # LLM-data-pipeline: deduplication
    "dedup_exact_summary": (lq.dedup_exact_summary, lq.DEDUP_EXACT_SUMMARY_ORACLE),
    "dedup_exact_groups": (lq.dedup_exact_groups, lq.DEDUP_EXACT_GROUPS_ORACLE),
    "doc_fingerprints": (lq.doc_fingerprints, lq.DOC_FINGERPRINTS_ORACLE),
    "ngram_jaccard_planted_pairs": (
        lq.ngram_jaccard_planted_pairs,
        lq.NGRAM_JACCARD_PLANTED_PAIRS_ORACLE,
    ),
    "minhash_lsh_neardups": (
        lq.minhash_lsh_neardups,
        lq.MINHASH_LSH_NEARDUPS_ORACLE,
    ),
    "simhash_planted_pairs": (
        lq.simhash_planted_pairs,
        lq.SIMHASH_PLANTED_PAIRS_ORACLE,
    ),
    "corpus_dedup_components": (
        lq.corpus_dedup_components,
        lq.CORPUS_DEDUP_COMPONENTS_ORACLE,
    ),
    "corpus_curation_stats": (
        lq.corpus_curation_stats,
        lq.CORPUS_CURATION_STATS_ORACLE,
    ),
    "stratified_sample_docs": (
        lq.stratified_sample_docs,
        lq.STRATIFIED_SAMPLE_DOCS_ORACLE,
    ),
    "token_budget_packing": (
        lq.token_budget_packing,
        lq.TOKEN_BUDGET_PACKING_ORACLE,
    ),
    # LLM-data-pipeline: similarity search
    "similarity_topk_bruteforce": (
        lq.similarity_topk_bruteforce,
        lq.SIMILARITY_TOPK_BRUTEFORCE_ORACLE,
    ),
    "similarity_topk_bucketed": (
        lq.similarity_topk_bucketed,
        lq.SIMILARITY_TOPK_BUCKETED_ORACLE,
    ),
    "embedding_neardup_pairs": (
        lq.embedding_neardup_pairs,
        lq.EMBEDDING_NEARDUP_PAIRS_ORACLE,
    ),
    # LLM-data-pipeline: text analysis
    "text_quality_stats": (lq.text_quality_stats, lq.TEXT_QUALITY_STATS_ORACLE),
    "language_id_heuristic": (
        lq.language_id_heuristic,
        lq.LANGUAGE_ID_HEURISTIC_ORACLE,
    ),
    "token_count_bpe": (lq.token_count_bpe, lq.TOKEN_COUNT_BPE_ORACLE),
    "winnowing_overlap_pairs": (
        lq.winnowing_overlap_pairs,
        lq.WINNOWING_OVERLAP_PAIRS_ORACLE,
    ),
    "embedding_dimension_stats": (
        lq.embedding_dimension_stats,
        lq.EMBEDDING_DIMENSION_STATS_ORACLE,
    ),
    # §2.6 SCD2 merge (the centerpiece) + §2.4 J7 change-comparison join
    "scd2_merge_customers": (
        sq.scd2_merge_customers,
        sq.SCD2_MERGE_CUSTOMERS_ORACLE,
    ),
    "change_comparison_join": (
        sq.change_comparison_join,
        sq.CHANGE_COMPARISON_JOIN_ORACLE,
    ),
    # multimodal: Arrow mapInPandas feature extraction vs SQL-derived oracle
    "multimodal_features": (sq.multimodal_features, sq.MULTIMODAL_FEATURES_ORACLE),
    # §2.12 streaming: real Structured Streaming query (AvailableNow → memory sink)
    "streaming_event_counts": (
        sp.streaming_event_counts,
        sp.STREAMING_EVENT_COUNTS_ORACLE,
    ),
}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
