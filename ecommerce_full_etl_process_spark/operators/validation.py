"""Rule-based validation engine (SURVEY §2.3, rules V1-V14).

The reference classifies rows one at a time in Python
(``ETL/validation.py:34-195``): every rule appends an error record, rows with
``error``-severity violations go to ``rejected_records``, rows with only
``warning``-severity violations (duplicate_tx_id, price_mismatch) still load.

Spark-first re-expression — one declarative pass, no row loops:

- each rule is a ``Column`` predicate contributing
  ``when(cond, struct(error_type, message, severity))`` to an ``errors`` array
- ``valid  = rows where no error-severity entry`` (warnings allowed)
- ``rejected = the complement``
- the error log is ``explode(errors)`` over all rows
- FK existence (V7/V8) is a broadcast left join against the valid key sets
  instead of Python set probes (reference builds sets at validation.py:183-185)
- in-batch duplicate detection (V13) is a window ``row_number`` over the
  batch order instead of a ``seen_tx_ids`` set (validation.py:110,155-159)

Scale: validation is a single map-side pass over the batch plus two broadcast
joins (user/product keysets) and one window partitioned by transaction_id —
no all-to-all shuffle of the fact batch beyond the dedup window.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import parse_date_multi
from ..functions.text import is_blank, is_valid_email

# reference ETL/validation.py:17-18 — case-insensitive domains
VALID_PAYMENT_TYPES = ("visa", "mastercard", "wire transfer", "other")
VALID_STATUSES = ("success", "failed")

ERRORS_COL = "errors"

_ERROR_STRUCT_FIELDS = ("error_type", "message", "severity")


@dataclass(frozen=True)
class Rule:
    error_type: str
    severity: str  # 'error' rejects the row; 'warning' logs but loads
    condition: Column
    message: Column


def _errors_array(rules: list[Rule]) -> Column:
    entries = [
        F.when(
            r.condition,
            F.struct(
                F.lit(r.error_type).alias("error_type"),
                r.message.alias("message"),
                F.lit(r.severity).alias("severity"),
            ),
        )
        for r in rules
    ]
    # drop the nulls from non-firing rules
    return F.filter(F.array(*entries), lambda e: e.isNotNull())


def _n_errors(errors: Column) -> Column:
    return F.size(F.filter(errors, lambda e: e["severity"] == F.lit("error")))


@dataclass
class ValidationResult:
    """Mirror of the reference's ValidationResult (ETL/validation.py:6-11),
    as DataFrames. ``annotated`` keeps every input row with its ``errors``
    array; ``valid``/``rejected`` are the two output streams."""

    annotated: DataFrame
    valid: DataFrame
    rejected: DataFrame

    def error_records(self, entity: str, record_id: Column) -> DataFrame:
        """Exploded per-violation rows for the error log
        (entity, record_id, error_type, message, severity)."""
        return (
            self.annotated.select(
                F.lit(entity).alias("entity"),
                record_id.cast("string").alias("record_id"),
                F.explode(F.col(ERRORS_COL)).alias("e"),
            ).select(
                "entity",
                "record_id",
                F.col("e.error_type").alias("error_type"),
                F.col("e.message").alias("message"),
                F.col("e.severity").alias("severity"),
            )
        )


def _split(df: DataFrame, input_cols: list[str]) -> ValidationResult:
    annotated = df
    valid = (
        annotated.where(_n_errors(F.col(ERRORS_COL)) == 0)
        .select(*input_cols)
    )
    rejected = (
        annotated.where(_n_errors(F.col(ERRORS_COL)) > 0)
        .select(*input_cols)
    )
    return ValidationResult(annotated=annotated, valid=valid, rejected=rejected)


# ---------------------------------------------------------------------------
# Users (reference ETL/validation.py:24-56): V1 empty name, V2 bad email,
# V3 null join_date — all error severity, error_type 'invalid_user'.
# ---------------------------------------------------------------------------

def validate_users(users: DataFrame) -> ValidationResult:
    rules = [
        Rule(
            "invalid_user",
            "error",
            is_blank(F.col("name")),
            F.format_string("User %s: invalid or empty name", F.col("user_id")),
        ),
        Rule(
            "invalid_user",
            "error",
            ~is_valid_email(F.col("email")),
            F.format_string(
                "User %s: invalid email '%s'",
                F.col("user_id"),
                F.coalesce(F.col("email"), F.lit("NULL")),
            ),
        ),
        Rule(
            "invalid_user",
            "error",
            F.col("join_date").isNull(),
            F.format_string("User %s: missing join_date", F.col("user_id")),
        ),
    ]
    annotated = users.withColumn(ERRORS_COL, _errors_array(rules))
    return _split(annotated, users.columns)


# ---------------------------------------------------------------------------
# Products (reference ETL/validation.py:58-85): V4 empty name,
# V5 price >= 10000, V6 negative stock. (Deliberately NO price<0 rule —
# the reference doesn't have one; only notebook QA looks for it. SURVEY §7.4.)
# ---------------------------------------------------------------------------

def validate_products(products: DataFrame) -> ValidationResult:
    rules = [
        Rule(
            "invalid_product",
            "error",
            is_blank(F.col("name")),
            F.format_string(
                "Product %s: invalid or empty name", F.col("product_id")
            ),
        ),
        Rule(
            "price_ge_10000",
            "error",
            F.col("price").isNotNull() & (F.col("price") >= 10000),
            F.format_string(
                "Product %s: price %s >= 10000", F.col("product_id"), F.col("price")
            ),
        ),
        Rule(
            "negative_stock",
            "error",
            F.col("stock").isNotNull() & (F.col("stock") < 0),
            F.format_string(
                "Product %s: negative stock %s", F.col("product_id"), F.col("stock")
            ),
        ),
    ]
    annotated = products.withColumn(ERRORS_COL, _errors_array(rules))
    return _split(annotated, products.columns)


# ---------------------------------------------------------------------------
# Transactions (reference ETL/validation.py:87-174): V7-V14.
# Depends on the valid user/product sets (dataflow DAG, validation.py:178-189).
# ---------------------------------------------------------------------------

def validate_transactions(
    transactions: DataFrame,
    valid_users: DataFrame,
    valid_products: DataFrame,
    order_col: str | None = None,
) -> ValidationResult:
    """V7-V14 plus the valid-path normalization (parsed date, lowercased
    payment_type/status — reference ETL/validation.py:167-172).

    ``order_col``: column defining the batch iteration order for the
    first-occurrence duplicate rule V13 (the reference iterates in
    ``ORDER BY transaction_id`` fetch order, ties by file position —
    ETL/etl.py:167). If None, an input-file-position surrogate is used.
    """
    input_cols = transactions.columns
    tx = transactions
    if order_col is None:
        order_col = "__batch_pos"
        # monotonically_increasing_id encodes (partition, in-partition pos):
        # exactly the reference's "file order" tie-break, without a shuffle.
        tx = tx.withColumn(order_col, F.monotonically_increasing_id())

    # FK existence via broadcast semi-style joins (J1): indicator columns
    # instead of left_semi so one pass serves both the predicate and the log.
    user_keys = valid_users.select(
        F.col("user_id").alias("user_id"), F.lit(True).alias("__user_ok")
    )
    product_side = valid_products.select(
        F.col("product_id").alias("product_id"),
        F.lit(True).alias("__product_ok"),
        F.col("price").alias("__unit_price"),
    )
    tx = tx.join(F.broadcast(user_keys), "user_id", "left").join(
        F.broadcast(product_side), "product_id", "left"
    )

    # V13 in-batch duplicate detection: reference keys on transaction_id
    # alone (validation.py:110,155-159) — later rows with a seen id get a
    # warning but still load.
    w = Window.partitionBy("transaction_id").orderBy(F.col(order_col))
    tx = tx.withColumn("__tx_occurrence", F.row_number().over(w))

    parsed_date = parse_date_multi(F.col("date"))
    tx = tx.withColumn("__parsed_date", parsed_date)

    qty = F.col("quantity")
    unit_price_actual = F.col("price") / qty  # price column is the LINE total
    rules = [
        Rule(
            "orphan_user",
            "error",
            F.col("__user_ok").isNull(),
            F.format_string(
                "Transaction %s: user_id %s not found",
                F.col("transaction_id"),
                F.col("user_id"),
            ),
        ),
        Rule(
            "orphan_product",
            "error",
            F.col("__product_ok").isNull(),
            F.format_string(
                "Transaction %s: product_id %s not found",
                F.col("transaction_id"),
                F.col("product_id"),
            ),
        ),
        Rule(
            "qty_zero",
            "error",
            qty.isNotNull() & (qty == 0),
            F.format_string(
                "Transaction %s: quantity is zero", F.col("transaction_id")
            ),
        ),
        Rule(
            "qty_negative",
            "error",
            qty.isNotNull() & (qty < 0),
            F.format_string(
                "Transaction %s: negative quantity %s",
                F.col("transaction_id"),
                qty,
            ),
        ),
        Rule(
            "invalid_payment_type",
            "error",
            F.col("payment_type").isNull()
            | ~F.lower(F.col("payment_type")).isin(*VALID_PAYMENT_TYPES),
            F.format_string(
                "Transaction %s: invalid payment_type '%s'",
                F.col("transaction_id"),
                F.coalesce(F.col("payment_type"), F.lit("NULL")),
            ),
        ),
        Rule(
            "invalid_status",
            "error",
            F.col("status").isNull()
            | ~F.lower(F.col("status")).isin(*VALID_STATUSES),
            F.format_string(
                "Transaction %s: invalid status '%s'",
                F.col("transaction_id"),
                F.coalesce(F.col("status"), F.lit("NULL")),
            ),
        ),
        Rule(
            "bad_date_format",
            "error",
            F.col("__parsed_date").isNull(),
            F.format_string(
                "Transaction %s: unparseable date '%s'",
                F.col("transaction_id"),
                F.coalesce(F.col("date"), F.lit("NULL")),
            ),
        ),
        # warning-severity: the row still loads (reference validation.py:155-165)
        Rule(
            "duplicate_tx_id",
            "warning",
            F.col("__tx_occurrence") > 1,
            F.format_string(
                "Transaction %s: duplicate transaction_id in batch",
                F.col("transaction_id"),
            ),
        ),
    ]
    # reference logs price_mismatch only for otherwise-valid rows
    # ('product_id in product_prices and is_valid and quantity > 0',
    # validation.py:161): a row rejected for e.g. invalid_status must not
    # also get the warning.
    no_error = ~reduce(
        lambda a, b: a | b,
        [F.coalesce(r.condition, F.lit(False)) for r in rules if r.severity == "error"],
    )
    rules = rules + [
        Rule(
            "price_mismatch",
            "warning",
            no_error
            & F.col("__unit_price").isNotNull()
            & qty.isNotNull()
            & (qty > 0)
            & (F.abs(unit_price_actual - F.col("__unit_price")) > 0.01),
            F.format_string(
                "Transaction %s: unit price %s deviates from catalog price %s",
                F.col("transaction_id"),
                F.round(unit_price_actual, 4),
                F.col("__unit_price"),
            ),
        ),
    ]
    annotated = tx.withColumn(ERRORS_COL, _errors_array(rules))

    # valid-path normalization (reference validation.py:167-172)
    valid = (
        annotated.where(_n_errors(F.col(ERRORS_COL)) == 0)
        .withColumn("date", F.col("__parsed_date"))
        .withColumn("payment_type", F.lower(F.col("payment_type")))
        .withColumn("status", F.lower(F.col("status")))
        .select(*input_cols)
    )
    rejected = annotated.where(_n_errors(F.col(ERRORS_COL)) > 0).select(*input_cols)
    return ValidationResult(annotated=annotated, valid=valid, rejected=rejected)


def validate_all(
    users: DataFrame, products: DataFrame, transactions: DataFrame
) -> dict[str, ValidationResult]:
    """Full validation DAG (reference DataValidator.validate_all,
    ETL/validation.py:178-195): users and products first; their valid key
    sets feed transaction FK checks."""
    u = validate_users(users)
    p = validate_products(products)
    t = validate_transactions(transactions, u.valid, p.valid)
    return {"user": u, "product": p, "transaction": t}
