"""Operator library — public surface.

Each module keeps `/root/reference` file:line citations in its docstrings
for parity checking (SURVEY.md §2).
"""

from .dedup import (  # noqa: F401
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .dims import build_dim_date, missing_dim_date_rows  # noqa: F401
from .facts import load_fact_transactions  # noqa: F401
from .joins import (  # noqa: F401
    anti_join,
    asof_join,
    join_current_version,
    latest_per_key,
    semi_join,
)
from .scd2 import PRODUCT_SCD2, USER_SCD2, Scd2Config, scd2_merge  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    bucketed_topk,
    cosine,
    cosine_neardup_pairs,
)
from .snapshot import stock_history_delta  # noqa: F401
from .textstats import (  # noqa: F401
    fingerprint,
    language_id,
    quality_stats,
    token_count,
)
from .validation import (  # noqa: F401
    ValidationResult,
    validate_all,
    validate_products,
    validate_transactions,
    validate_users,
)

__all__ = [
    "exact_dup_groups", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "simhash_fingerprints", "simhash_neardup_pairs",
    "build_dim_date", "missing_dim_date_rows",
    "load_fact_transactions",
    "anti_join", "asof_join", "join_current_version", "latest_per_key",
    "semi_join",
    "PRODUCT_SCD2", "USER_SCD2", "Scd2Config", "scd2_merge",
    "brute_force_topk", "bucketed_topk", "cosine", "cosine_neardup_pairs",
    "stock_history_delta",
    "fingerprint", "language_id", "quality_stats", "token_count",
    "ValidationResult", "validate_all", "validate_products",
    "validate_transactions", "validate_users",
]
