"""Seeded synthetic + dirty-data generators (SURVEY §2.1 S10-S12).

Deterministic re-expression of the reference's Faker-based generators
(``OLTP/scripts/populate.py:22-320``) and its 14-class dirty-data injector
(``OLTP/scripts/generate_invalid.py:107-487``). These are TEST FIXTURES, not
hot-path operators: rows are built driver-side with a seeded ``random.Random``
and handed to ``spark.createDataFrame`` (the reference's transaction generator
is inherently serial too — it threads stock decrements through every row,
populate.py:258-264).

Every dirty class maps 1:1 to a validation rule so tests can assert exact
per-error-type counts (SURVEY §5).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession

from .. import schemas

FIRST_NAMES = [
    "Alex", "Sam", "Maria", "Chen", "Priya", "Omar", "Lucia", "Ivan",
    "Keiko", "Ana", "Noah", "Zara", "Liam", "Tara", "Hugo", "Ines",
]
LAST_NAMES = [
    "Garcia", "Smith", "Mueller", "Tanaka", "Okafor", "Silva", "Novak",
    "Khan", "Rossi", "Dubois", "Larsen", "Moreau", "Costa", "Haddad",
]
CATEGORIES = ["Footwear", "Electronics", "Clothing", "Accessories", "Beauty"]
PRODUCT_WORDS = [
    "Aurora", "Bolt", "Cedar", "Delta", "Ember", "Flux", "Granite", "Halo",
    "Iris", "Jet", "Kite", "Luna", "Mesa", "Nimbus", "Onyx", "Pulse",
]
# reference OLTP/scripts/populate.py:247 / ETL/validation.py:17-18
PAYMENT_TYPES = ["Visa", "Mastercard", "Wire Transfer", "Other"]
STATUSES = ["success", "failed"]

# dirty pools — reference OLTP/scripts/generate_invalid.py
BAD_EMAILS = [
    "bademail", "user@", "@example.com", "user.example.com", "user @email.com",
]  # generate_invalid.py:376-386
BAD_PAYMENT_TYPES = [
    "Bitcoin", "PayPal", "bank_transfer", "crypto", "cash", "check",
]  # generate_invalid.py:257
BAD_STATUSES = [
    "pending", "processing", "cancelled", "refunded", "unknown",
]  # generate_invalid.py:276

# the 14 dirty classes of the registry at generate_invalid.py:423-438
DIRTY_CLASSES = (
    "user_empty_name",          # V1
    "user_bad_email",           # V2
    "user_null_join_date",      # V3
    "product_empty_name",       # V4
    "product_price_ge_10000",   # V5
    "product_negative_stock",   # V6
    "tx_orphan_user",           # V7
    "tx_orphan_product",        # V8
    "tx_qty_zero",              # V9a
    "tx_qty_negative",          # V9b
    "tx_bad_payment_type",      # V10
    "tx_bad_status",            # V11
    "tx_bad_date",              # V12
    "tx_duplicate_id",          # V13 (warning)
)
# price_mismatch (V14, warning) is injected via tx price drift
# (generate_invalid.py:225-234) — included when `include_price_drift` is set.


@dataclass
class GeneratedBatch:
    users: list[tuple] = field(default_factory=list)
    products: list[tuple] = field(default_factory=list)
    transactions: list[tuple] = field(default_factory=list)
    dirty_counts: dict[str, int] = field(default_factory=dict)


def generate_clean(
    rng: random.Random,
    n_users: int,
    n_products: int,
    n_transactions: int,
    today: date,
    multi_product_chance: float = 0.2,
    status_weights: tuple[float, float] = (0.85, 0.15),
) -> GeneratedBatch:
    """Clean OLTP batch (reference populate.py:22-320).

    Transactions: ~20% span multiple product lines sharing one
    transaction_id (populate.py:178,287-290); ``price`` is the LINE TOTAL =
    unit price × quantity (populate.py:263-264).
    """
    batch = GeneratedBatch()
    join_pool = [today - timedelta(days=d) for d in range(0, 365)]
    for uid in range(1, n_users + 1):
        name = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        email = f"user{uid}@example.com"
        jd = rng.choice(join_pool).strftime("%Y-%m-%d")
        batch.users.append((uid, name, email, jd))

    for pid in range(1, n_products + 1):
        name = f"{rng.choice(PRODUCT_WORDS)} {rng.choice(PRODUCT_WORDS)}"
        category = rng.choice(CATEGORIES)
        price = round(rng.uniform(5, 500), 2)  # populate.py:48
        stock = rng.randint(1, 200)  # populate.py:49
        batch.products.append((pid, name, category, price, stock))

    prices = {p[0]: p[3] for p in batch.products}
    tx_id = 0
    lines = 0
    while lines < n_transactions:
        tx_id += 1
        n_lines = 1
        if rng.random() < multi_product_chance:
            n_lines = rng.randint(2, 3)  # populate.py:287-290
        chosen = rng.sample(range(1, n_products + 1), min(n_lines, n_products))
        for pid in chosen:
            if lines >= n_transactions:
                break
            qty = rng.randint(1, 5)
            total = round(prices[pid] * qty, 2)
            status = "success" if rng.random() < status_weights[0] else "failed"
            batch.transactions.append(
                (
                    tx_id,
                    today.strftime("%Y-%m-%d"),
                    rng.randint(1, n_users),
                    pid,
                    qty,
                    total,
                    rng.choice(PAYMENT_TYPES),
                    status,
                )
            )
            lines += 1
    return batch


def inject_dirty(
    rng: random.Random,
    batch: GeneratedBatch,
    n_dirty: int,
    today: date,
    include_price_drift: bool = True,
) -> GeneratedBatch:
    """Inject ``n_dirty`` invalid records, uniformly sampled over the 14
    classes (reference generate_invalid.py:441-487; uniform choice at 476).
    Orphan FKs are guaranteed orphans via max_id + randint
    (generate_invalid.py:113-114,134-135)."""
    max_uid = max((u[0] for u in batch.users), default=0)
    max_pid = max((p[0] for p in batch.products), default=0)
    max_tid = max((t[0] for t in batch.transactions), default=0)
    existing_tx = list({t[0] for t in batch.transactions})
    today_s = today.strftime("%Y-%m-%d")

    classes = list(DIRTY_CLASSES) + (
        ["tx_price_drift"] if include_price_drift else []
    )
    next_uid, next_pid, next_tid = max_uid, max_pid, max_tid

    def _clean_tx_fields():
        pid = rng.randint(1, max_pid) if max_pid else 1
        unit = next(
            (p[3] for p in batch.products if p[0] == pid), 10.0
        )
        qty = rng.randint(1, 5)
        return pid, qty, round(unit * qty, 2)

    for _ in range(n_dirty):
        cls = rng.choice(classes)
        batch.dirty_counts[cls] = batch.dirty_counts.get(cls, 0) + 1
        if cls == "user_empty_name":
            next_uid += 1
            batch.users.append(
                (next_uid, rng.choice(["", "   ", None]), f"dirty{next_uid}@example.com", today_s)
            )
        elif cls == "user_bad_email":
            next_uid += 1
            batch.users.append(
                (next_uid, "Dirty User", rng.choice(BAD_EMAILS), today_s)
            )
        elif cls == "user_null_join_date":
            next_uid += 1
            batch.users.append(
                (next_uid, "Dirty User", f"dirty{next_uid}@example.com", None)
            )
        elif cls == "product_empty_name":
            next_pid += 1
            batch.products.append(
                (next_pid, rng.choice(["", "  ", None]), rng.choice(CATEGORIES),
                 round(rng.uniform(5, 500), 2), rng.randint(1, 200))
            )
        elif cls == "product_price_ge_10000":
            next_pid += 1
            batch.products.append(
                (next_pid, "Pricey Thing", rng.choice(CATEGORIES),
                 round(rng.uniform(10000, 50000), 2), rng.randint(1, 200))
            )  # generate_invalid.py:185-195
        elif cls == "product_negative_stock":
            next_pid += 1
            batch.products.append(
                (next_pid, "Ghost Stock", rng.choice(CATEGORIES),
                 round(rng.uniform(5, 500), 2), rng.randint(-50, -1))
            )  # generate_invalid.py:405-415
        elif cls == "tx_orphan_user":
            next_tid += 1
            pid, qty, total = _clean_tx_fields()
            batch.transactions.append(
                (next_tid, today_s, max_uid + rng.randint(1, 100), pid, qty,
                 total, rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_orphan_product":
            next_tid += 1
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), max_pid + rng.randint(1, 100),
                 rng.randint(1, 5), round(rng.uniform(10, 500), 2),
                 rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_qty_zero":
            next_tid += 1
            pid, _, _ = _clean_tx_fields()
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), pid, 0, 0.0,
                 rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_qty_negative":
            next_tid += 1
            pid, _, _ = _clean_tx_fields()
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), pid,
                 rng.randint(-5, -1), round(rng.uniform(10, 500), 2),
                 rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_bad_payment_type":
            next_tid += 1
            pid, qty, total = _clean_tx_fields()
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), pid, qty, total,
                 rng.choice(BAD_PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_bad_status":
            next_tid += 1
            pid, qty, total = _clean_tx_fields()
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), pid, qty, total,
                 rng.choice(PAYMENT_TYPES), rng.choice(BAD_STATUSES))
            )
        elif cls == "tx_bad_date":
            # reference generate_invalid.py:303-309: five formats, of which
            # Y/m/d, ISO-T and Ymd parse; d-m-Y and 'Mon dd, YYYY' reject
            next_tid += 1
            pid, qty, total = _clean_tx_fields()
            bad_date = rng.choice(
                [
                    today.strftime("%d-%m-%Y"),
                    today.strftime("%b %d, %Y"),
                ]
            )
            batch.transactions.append(
                (next_tid, bad_date, rng.randint(1, max_uid), pid, qty, total,
                 rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_duplicate_id":
            # copy an existing id (generate_invalid.py:326-356) — warning V13
            dup_id = rng.choice(existing_tx) if existing_tx else 1
            pid, qty, total = _clean_tx_fields()
            batch.transactions.append(
                (dup_id, today_s, rng.randint(1, max_uid), pid, qty, total,
                 rng.choice(PAYMENT_TYPES), rng.choice(STATUSES))
            )
        elif cls == "tx_price_drift":
            # ±10-50% unit price drift (generate_invalid.py:225-234) — V14
            next_tid += 1
            pid, qty, _ = _clean_tx_fields()
            unit = next((p[3] for p in batch.products if p[0] == pid), 10.0)
            drift = 1 + rng.choice([-1, 1]) * rng.uniform(0.10, 0.50)
            batch.transactions.append(
                (next_tid, today_s, rng.randint(1, max_uid), pid, qty,
                 round(unit * drift * qty, 2), rng.choice(PAYMENT_TYPES),
                 rng.choice(STATUSES))
            )
    return batch


def batch_to_dataframes(
    spark: SparkSession, batch: GeneratedBatch
) -> dict[str, DataFrame]:
    return {
        "users": spark.createDataFrame(batch.users, schemas.USERS),
        "products": spark.createDataFrame(batch.products, schemas.PRODUCTS),
        "transactions": spark.createDataFrame(
            batch.transactions, schemas.TRANSACTIONS
        ),
    }


def generate_clean_distributed(
    spark: SparkSession, n_users: int, n_products: int, seed: int, today: date
) -> dict[str, DataFrame]:
    """Distributed variant of the clean user/product generators (S10) for
    large fixtures: ``spark.range`` + hash-derived pseudo-random columns —
    deterministic for a given (seed, id) regardless of partitioning, no
    driver-side row building. (Transactions stay driver-side: the
    reference's stock-accounting is inherently serial, SURVEY §2.1 S11.)
    """
    from pyspark.sql import functions as F

    def h(col, salt):
        # uniform [0,1) derived from md5(seed|salt|id) — partition-invariant
        return (
            F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.lit(salt), col)), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(2 ** 32))
        )

    first = F.array(*[F.lit(x) for x in FIRST_NAMES])
    last = F.array(*[F.lit(x) for x in LAST_NAMES])
    users = spark.range(1, n_users + 1).select(
        F.col("id").alias("user_id"),
        F.concat_ws(
            " ",
            F.element_at(first, (h(F.col("id"), "fn") * len(FIRST_NAMES)).cast("int") + 1),
            F.element_at(last, (h(F.col("id"), "ln") * len(LAST_NAMES)).cast("int") + 1),
        ).alias("name"),
        F.format_string("user%d@example.com", F.col("id")).alias("email"),
        F.date_format(
            F.date_sub(F.lit(today), (h(F.col("id"), "jd") * 365).cast("int")),
            "yyyy-MM-dd",
        ).alias("join_date"),
    )

    words = F.array(*[F.lit(x) for x in PRODUCT_WORDS])
    cats = F.array(*[F.lit(x) for x in CATEGORIES])
    products = spark.range(1, n_products + 1).select(
        F.col("id").alias("product_id"),
        F.concat_ws(
            " ",
            F.element_at(words, (h(F.col("id"), "w1") * len(PRODUCT_WORDS)).cast("int") + 1),
            F.element_at(words, (h(F.col("id"), "w2") * len(PRODUCT_WORDS)).cast("int") + 1),
        ).alias("name"),
        F.element_at(cats, (h(F.col("id"), "cat") * len(CATEGORIES)).cast("int") + 1).alias(
            "category"
        ),
        F.round(F.lit(5.0) + h(F.col("id"), "price") * 495.0, 2).alias("price"),
        ((h(F.col("id"), "stock") * 200).cast("int") + 1).alias("stock"),
    )
    return {
        "users": users.select(*[f.name for f in schemas.USERS.fields]),
        "products": products.select(*[f.name for f in schemas.PRODUCTS.fields]),
    }


def generate_oltp(
    spark: SparkSession,
    seed: int = 42,
    n_users: int = 100,
    n_products: int = 25,
    n_transactions: int = 250,
    n_dirty: int = 30,
    today: date = date(2026, 2, 2),
    multi_product_chance: float = 0.2,
    status_weights: tuple[float, float] = (0.85, 0.15),
) -> tuple[dict[str, DataFrame], GeneratedBatch]:
    """Demo-scale batch matching the reference's demo.ipynb cell-1 config.

    The knobs also cover the notebook-driven alt workload
    (OLTP/main.ipynb cells 18-21: 300 tx at status weights [0.7, 0.3] on
    2026-02-02 plus 100 dirty records)."""
    rng = random.Random(seed)
    batch = generate_clean(
        rng,
        n_users,
        n_products,
        n_transactions,
        today,
        multi_product_chance=multi_product_chance,
        status_weights=status_weights,
    )
    batch = inject_dirty(rng, batch, n_dirty, today)
    return batch_to_dataframes(spark, batch), batch
