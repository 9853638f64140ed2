"""Per-operator query catalog (SURVEY §2) over the driver testdata corpus.

One named query per operator family, each with a DuckDB oracle. These are
the driver-visible correctness surface for: scans (S3), projections/filters
(P1-P10), joins J1-J7 (semi/anti/current-version/as-of), aggregations A1-A7,
sorts/top-k O1-O5, set ops (§2.10), scalar functions F1-F5 (§2.8), the
validation errors-array pattern (§2.3), SCD2 interval construction (§2.6)
and change-detection snapshots (§2.7).

Conventions: every computed column aliased identically in Spark and SQL;
doubles rounded identically on both sides; deterministic tie-breaks on every
top-k.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import date_id, iso_week, iso_weekday, parse_date_multi


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ntz_epoch() -> F.Column:
    """Naive UTC epoch — the anchor for timezone-independent NTZ epoch
    math. Built lazily: F.lit needs an active SparkContext, so a module-
    level constant would break import order."""
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def ntz_epoch_micros(col) -> F.Column:
    """Exact microseconds-since-epoch (BIGINT) of a TIMESTAMP_NTZ column,
    with no session-timezone dependence (pure NTZ arithmetic — no LTZ hop).
    Mirrors DuckDB's ``epoch_us`` on naive timestamps."""
    return F.timestamp_diff("MICROSECOND", _ntz_epoch(), col)


def _read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read events.parquet whatever the physical ``ts`` type.

    The driver corpus has stored ``ts`` two different ways across rounds:
    INT64 TIMESTAMP(NANOS) (rounds 1-2), which Spark's reader rejects
    outright unless nanos are read as raw longs, and parquet timestamp[us]
    (round 3+), which Spark reads natively as TIMESTAMP_NTZ. Try the
    native read first; only on the SPECIFIC unsupported-nanos failure flip
    the legacy nanos conf (left set afterwards: the scan consults it when
    decoding pages, not just at schema inference, so save-and-restore would
    be unsound). Any other failure — missing file, corrupt footer,
    permission error — re-raises untouched: retrying those with a legacy
    conf flipped session-wide would mask the real error behind a confusing
    second failure (tests/test_events_ts_matrix.py pins this)."""
    try:
        return spark.read.parquet(path)
    except Exception as exc:
        msg = str(exc)
        if "Illegal Parquet type" in msg and "NANOS" in msg:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return spark.read.parquet(path)
        raise


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP_NTZ (naive UTC wall time) regardless
    of the representation it was read as. All conversion math is
    timezone-independent, so results are stable under any session TZ:

    - ``bigint`` (legacy nanos via nanosAsLong): integer ns→µs division
      (``/ 1000`` goes through double and a ~1.7e18 ns epoch exceeds 2^53,
      drifting ±1 µs vs DuckDB's exact truncation), then µs→NTZ via
      ``timestamp_add`` from the naive epoch — no LTZ intermediary.
    - ``timestamp`` (LTZ): ``unix_micros`` (TZ-independent internal µs)
      then the same µs→NTZ construction.
    - ``timestamp_ntz``: already the canonical form."""
    dt = dict(df.dtypes).get("ts")
    if dt == "timestamp_ntz" or dt is None:
        return df
    if dt == "bigint":
        micros = F.expr("ts div 1000")
    elif dt == "timestamp":
        micros = F.unix_micros(F.col("ts"))
    else:
        raise TypeError(f"events.ts: unsupported dtype {dt!r}")
    return df.withColumn(
        "ts", F.timestamp_add("MICROSECOND", micros, _ntz_epoch())
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to TIMESTAMP_NTZ — every
    downstream consumer (sessionization, funnels, windows, streaming) is
    representation-agnostic through this one choke point."""
    df = _read_events_raw(spark, os.path.join(sf_dir, "events.parquet"))
    return _normalize_events_ts(df)


# ---------------------------------------------------------------------------
# S3 — filtered incremental scan (reference WHERE t.date = ?, ETL/etl.py:166)
# ---------------------------------------------------------------------------

def filtered_incremental_scan(spark, sf_dir):
    """Day-slice scan with projection; filter + pruning push to parquet."""
    return (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    )


FILTERED_INCREMENTAL_SCAN_ORACLE = """
SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# P1/P7 — projection + numeric threshold
# ---------------------------------------------------------------------------

def projection_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") < 15)
        .select("p_partkey", "p_name", "p_size")
    )


PROJECTION_FILTER_ORACLE = """
SELECT p_partkey, p_name, p_size FROM part WHERE p_size < 15
"""


# ---------------------------------------------------------------------------
# P5 — regex predicate (reference email rlike, ETL/validation.py:19)
# ---------------------------------------------------------------------------

def regex_predicate(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").rlike("window .*hash"))
        .select("doc_id", "lang")
    )


REGEX_PREDICATE_ORACLE = """
SELECT doc_id, lang FROM documents WHERE regexp_matches(text, 'window .*hash')
"""


# ---------------------------------------------------------------------------
# P8/P10 — set-membership domain predicate
# ---------------------------------------------------------------------------

def domain_predicate(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .where(F.lower(F.col("o_orderstatus")).isin("o", "f"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


DOMAIN_PREDICATE_ORACLE = """
SELECT o_orderstatus, count(*) AS n
FROM orders
WHERE lower(o_orderstatus) IN ('o', 'f')
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# P4 — null/blank predicate (counted so the result is non-empty)
# ---------------------------------------------------------------------------

def null_blank_predicate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.sum(
            (F.col("text").isNull() | (F.trim("text") == "")).cast("long")
        ).alias("n_blank"),
        F.count(F.lit(1)).alias("n_total"),
    )


NULL_BLANK_PREDICATE_ORACLE = """
SELECT CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blank,
       count(*) AS n_total
FROM documents
"""


# ---------------------------------------------------------------------------
# P9/J5 — arithmetic tolerance predicate over a broadcast price lookup
# (reference price-mismatch rule, ETL/validation.py:161-165)
# ---------------------------------------------------------------------------

def price_tolerance_check(spark, sf_dir):
    """Lines whose implied unit price drifts >50% from the part's list price
    — the reference's unit-price-drift warning at TPC-H shape."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    return (
        li.where(F.col("l_quantity") > 0)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(
            F.abs(
                F.col("l_extendedprice") / F.col("l_quantity")
                - F.col("p_retailprice")
            )
            > F.col("p_retailprice") * 0.5
        )
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_drifting"))
    )


PRICE_TOLERANCE_CHECK_ORACLE = """
SELECT p_partkey, count(*) AS n_drifting
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity > 0
  AND abs(l_extendedprice / l_quantity - p_retailprice) > p_retailprice * 0.5
GROUP BY p_partkey
"""


# ---------------------------------------------------------------------------
# J1 — left semi join (FK existence)
# ---------------------------------------------------------------------------

def semi_join_customers_with_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_mktsegment")


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


# ---------------------------------------------------------------------------
# J4/J6 — left anti join (orphans / idempotent-load complement)
# ---------------------------------------------------------------------------

def anti_join_customers_without_orders(spark, sf_dir):
    """Customers with NO high-value (>300k) order — left anti join against
    a filtered keyset (every customer has *some* order in this corpus, so
    the plain complement would be trivially empty)."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
"""


# ---------------------------------------------------------------------------
# J2 + O2 — current-version lookup: latest order per customer joined back
# (reference current_flag probe ETL/etl.py:271-275 + LIMIT-1 pattern)
# ---------------------------------------------------------------------------

def latest_order_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        o.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    c = _t(spark, sf_dir, "customer")
    return latest.join(
        F.broadcast(c), latest.o_custkey == c.c_custkey
    ).select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.round("o_totalprice", 2).alias("latest_totalprice"),
    )


LATEST_ORDER_PER_CUSTOMER_ORACLE = """
SELECT c_custkey, c_name,
       o_orderkey AS latest_orderkey,
       round(o_totalprice, 2) AS latest_totalprice
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) o JOIN customer ON o_custkey = c_custkey
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# J3 — as-of (point-in-time) join: each event resolved to the user's most
# recent order at event time (reference SK resolution, ETL/etl.py:326-352)
# ---------------------------------------------------------------------------

def asof_events_to_orders(spark, sf_dir):
    """Per event: the latest (o_orderdate, o_orderkey) at or before ts.

    Default strategy = the merged-timeline form (round 7): the
    candidate-join form below materializes |events| × avg-prior-orders
    intermediate rows before its argmax (measured 10× fanout), while the
    merge form's cost is ONE shuffle+sort of |events|+|orders| rows
    regardless of fanout. Measured head-to-head on the relational scale
    corpora (forced full materialization, min of 3): ×1 0.36 s vs
    0.71 s, ×10 0.86 s vs 1.81 s, ×30 1.34 s vs 4.13 s — the merge form
    is 2-3× faster everywhere and its growth curve is flatter (3.7× vs
    5.8× at ×30). ``asof_events_to_orders_fanout`` keeps the
    candidate-join strategy for comparison.
    """
    return asof_events_to_orders_merge(spark, sf_dir)


def asof_events_to_orders_fanout(spark, sf_dir):
    """J3, candidate-join physical strategy: fan out each event to all
    prior orders, argmax per event.

    Plan note: expressed as ``max(struct(date, key))`` per event — a hash
    aggregate with map-side partial aggregation — instead of a row_number
    window, which would sort every (event × candidate-order) row. Same
    semantics (struct compare = lexicographic = the DESC/DESC tie-break),
    one shuffle of pre-aggregated rows.

    The build side is NOT hint-forced: at bench scale Catalyst/AQE
    broadcasts the (small) order-key projection on its own; on a cluster
    where orders outgrows the broadcast threshold the same plan degrades
    gracefully to a shuffled hash join on user_id instead of OOMing the
    driver (round-6 scale audit: a forced broadcast(orders) was the one
    plan here that could not survive 100×). Kept as the explicit
    variant: it can win when the right side is tiny AND the left side is
    already partitioned by something else (no new shuffle of the fact),
    but measured on these corpora the merge form is strictly faster.
    """
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    joined = e.join(o, "user_id").where(
        F.col("o_orderdate") <= F.col("ts")
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.max(F.struct("o_orderdate", "o_orderkey"))["o_orderkey"].alias(
            "asof_orderkey"
        )
    )


ASOF_EVENTS_TO_ORDERS_ORACLE = """
SELECT event_id, user_id, o_orderkey AS asof_orderkey
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""


def asof_events_to_orders_merge(spark, sf_dir):
    """J3, merged-timeline physical strategy: identical semantics (and
    oracle) to ``asof_events_to_orders``, computed fanout-free by
    ``joins.asof_merge_join`` — union events+orders, ONE exchange on
    user_id, carry the latest order forward with a window. The
    candidate-join form materializes ~10× fanout before its argmax
    (SCALEBENCH r7 ``asof_decomposition``); this form's cost is
    shuffle+sort of |events|+|orders| rows regardless of how many past
    orders each event matches — the fact×fact scale path.
    """
    from ..operators.joins import asof_merge_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_merge_join(
        e,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        how="inner",
    ).select(
        "event_id", "user_id", F.col("o_orderkey").alias("asof_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.6 — SCD2 interval construction from version history
# ---------------------------------------------------------------------------

def scd2_intervals_from_orders(spark, sf_dir):
    """Treat each customer's orders as successive 'versions': start at the
    order date, end the day before the next version, newest current — the
    lead()-based SCD2 build."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("start_date"),
        F.date_sub(
            F.lead(F.col("o_orderdate").cast("date")).over(w), 1
        ).alias("end_date"),
        (F.lead("o_orderkey").over(w).isNull()).alias("current_flag"),
    )


SCD2_INTERVALS_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS start_date,
       lead(CAST(o_orderdate AS DATE)) OVER w - 1 AS end_date,
       lead(o_orderkey) OVER w IS NULL AS current_flag
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# §2.7 — change-detection snapshot (lag-based)
# ---------------------------------------------------------------------------

def change_detect_events(spark, sf_dir):
    """Keep only events whose value changed vs the user's previous event —
    the stock-history change filter re-expressed."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
    )


CHANGE_DETECT_EVENTS_ORACLE = """
SELECT event_id, user_id, round(value, 6) AS value
FROM (
  SELECT *, lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
WHERE prev_value IS NULL OR value <> prev_value
"""


# ---------------------------------------------------------------------------
# A7 — in-batch first-occurrence dedup
# ---------------------------------------------------------------------------

def first_occurrence_dedup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


FIRST_OCCURRENCE_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id AS first_event_id
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A3 — group-by count ordered desc (the error-breakdown query shape)
# ---------------------------------------------------------------------------

def groupby_count_desc(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
    )


GROUPBY_COUNT_DESC_ORACLE = """
SELECT event_type, count(*) AS cnt
FROM events GROUP BY event_type ORDER BY cnt DESC, event_type
"""


# ---------------------------------------------------------------------------
# A5 — multi-accumulator conditional aggregation (run counters shape)
# ---------------------------------------------------------------------------

def conditional_counters(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_finished"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("n_open"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("n_pending"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 2).alias("finished_value"),
        F.count(F.lit(1)).alias("n_total"),
    )


CONDITIONAL_COUNTERS_ORACLE = """
SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS finished_value,
       count(*) AS n_total
FROM orders
"""


# ---------------------------------------------------------------------------
# A4 — max-key allocation (next-id pattern)
# ---------------------------------------------------------------------------

def max_key_allocation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.agg(F.max("o_orderkey").alias("max_orderkey")).crossJoin(
        c.agg(F.max("c_custkey").alias("max_custkey"))
    )


MAX_KEY_ALLOCATION_ORACLE = """
SELECT (SELECT max(o_orderkey) FROM orders) AS max_orderkey,
       (SELECT max(c_custkey) FROM customer) AS max_custkey
"""


# ---------------------------------------------------------------------------
# A6 — distinct keyset
# ---------------------------------------------------------------------------

def distinct_keys(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


DISTINCT_KEYS_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# §2.10 — union of complementary filtered streams (valid ∪ rejected shape)
# ---------------------------------------------------------------------------

def union_split_streams(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    small = p.where(F.col("p_size") < 25).withColumn("stream", F.lit("small"))
    large = p.where(~(F.col("p_size") < 25)).withColumn("stream", F.lit("large"))
    return (
        small.unionByName(large)
        .groupBy("stream")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


UNION_SPLIT_STREAMS_ORACLE = """
SELECT stream, count(*) AS n, round(avg(p_retailprice), 6) AS avg_price
FROM (
  SELECT 'small' AS stream, p_retailprice FROM part WHERE p_size < 25
  UNION ALL
  SELECT 'large' AS stream, p_retailprice FROM part WHERE NOT (p_size < 25)
)
GROUP BY stream
"""


# ---------------------------------------------------------------------------
# F1/F2 — date_id encoding + ISO calendar decomposition
# ---------------------------------------------------------------------------

def calendar_decomposition(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            date_id(d).alias("date_id"),
            F.year(d).alias("year"),
            F.month(d).alias("month"),
            F.dayofmonth(d).alias("day"),
            iso_week(d).alias("week"),
            iso_weekday(d).alias("weekday"),
        )
        .groupBy("date_id", "year", "month", "day", "week", "weekday")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


CALENDAR_DECOMPOSITION_ORACLE = """
SELECT CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS INT) AS date_id,
       CAST(year(o_orderdate) AS INT) AS year,
       CAST(month(o_orderdate) AS INT) AS month,
       CAST(day(o_orderdate) AS INT) AS day,
       CAST(weekofyear(o_orderdate) AS INT) AS week,
       CAST(isodow(o_orderdate) AS INT) AS weekday,
       count(*) AS n_orders
FROM orders
GROUP BY ALL
"""


# ---------------------------------------------------------------------------
# F5 — multi-format tolerant date parse (round-trip through 4+2 formats)
# ---------------------------------------------------------------------------

def multiformat_date_parse(spark, sf_dir):
    """Render each shipdate in one of six formats (4 parseable, 2 not — the
    reference's accepted/rejected format split) then run the engine's
    tolerant parser; count parse outcomes per format."""
    li = _t(spark, sf_dir, "lineitem")
    fmt = (F.col("l_orderkey") % 6).alias("fmt")
    d = F.col("l_shipdate")
    rendered = li.select(
        fmt,
        d,
        F.when(F.col("l_orderkey") % 6 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("l_orderkey") % 6 == 1, F.date_format(d, "yyyy/MM/dd"))
        .when(F.col("l_orderkey") % 6 == 2, F.concat(F.date_format(d, "yyyy-MM-dd"), F.lit("T00:00:00")))
        .when(F.col("l_orderkey") % 6 == 3, F.date_format(d, "yyyyMMdd"))
        .when(F.col("l_orderkey") % 6 == 4, F.date_format(d, "dd-MM-yyyy"))
        .otherwise(F.date_format(d, "MMM dd, yyyy"))
        .alias("rendered"),
    )
    parsed = rendered.withColumn("parsed", parse_date_multi(F.col("rendered")))
    return parsed.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("parsed").isNotNull().cast("long")).alias("n_parsed"),
        F.sum(
            F.when(F.col("parsed") == F.col("l_shipdate").cast("date"), 1)
            .otherwise(0)
            .cast("long")
        ).alias("n_roundtrip"),
    )


MULTIFORMAT_DATE_PARSE_ORACLE = """
WITH rendered AS (
  SELECT l_orderkey % 6 AS fmt,
         CAST(l_shipdate AS DATE) AS d,
         CASE l_orderkey % 6
           WHEN 0 THEN strftime(l_shipdate, '%Y-%m-%d')
           WHEN 1 THEN strftime(l_shipdate, '%Y/%m/%d')
           WHEN 2 THEN strftime(l_shipdate, '%Y-%m-%d') || 'T00:00:00'
           WHEN 3 THEN strftime(l_shipdate, '%Y%m%d')
           WHEN 4 THEN strftime(l_shipdate, '%d-%m-%Y')
           ELSE strftime(l_shipdate, '%b %d, %Y')
         END AS rendered
  FROM lineitem
), parsed AS (
  SELECT fmt, d,
         coalesce(
           CAST(try_strptime(rendered, '%Y-%m-%d') AS DATE),
           CAST(try_strptime(rendered, '%Y/%m/%d') AS DATE),
           CASE WHEN contains(rendered, 'T')
                THEN CAST(try_strptime(split_part(rendered, 'T', 1), '%Y-%m-%d') AS DATE) END,
           CASE WHEN regexp_matches(rendered, '^[0-9]{8}$')
                THEN CAST(try_strptime(rendered, '%Y%m%d') AS DATE) END
         ) AS parsed
  FROM rendered
)
SELECT fmt, count(*) AS n,
       CAST(sum(CASE WHEN parsed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
       CAST(sum(CASE WHEN parsed = d THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip
FROM parsed GROUP BY fmt
"""


# ---------------------------------------------------------------------------
# §2.3 — validation errors-array pattern (rule engine shape on orders)
# ---------------------------------------------------------------------------

def validation_rule_counts(spark, sf_dir):
    """The errors-array pattern: evaluate rules, explode, count per type."""
    o = _t(spark, sf_dir, "orders")
    rules = F.filter(
        F.array(
            F.when(
                F.col("o_totalprice") > 400000,
                F.struct(
                    F.lit("high_value").alias("error_type"),
                    F.lit("warning").alias("severity"),
                ),
            ),
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"),
                F.struct(
                    F.lit("bad_status").alias("error_type"),
                    F.lit("error").alias("severity"),
                ),
            ),
            F.when(
                F.year("o_orderdate") < 1996,
                F.struct(
                    F.lit("stale_order").alias("error_type"),
                    F.lit("warning").alias("severity"),
                ),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    return (
        o.withColumn("errors", rules)
        .select(F.explode("errors").alias("e"))
        .groupBy(
            F.col("e.error_type").alias("error_type"),
            F.col("e.severity").alias("severity"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


VALIDATION_RULE_COUNTS_ORACLE = """
SELECT error_type, severity, count(*) AS cnt FROM (
  SELECT 'high_value' AS error_type, 'warning' AS severity FROM orders WHERE o_totalprice > 400000
  UNION ALL
  SELECT 'bad_status', 'error' FROM orders WHERE o_orderstatus NOT IN ('O','F','P')
  UNION ALL
  SELECT 'stale_order', 'warning' FROM orders WHERE year(o_orderdate) < 1996
) GROUP BY error_type, severity
"""


# ---------------------------------------------------------------------------
# O2 global — top-k with deterministic tie-break
# ---------------------------------------------------------------------------

def top_orders_by_value(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


TOP_ORDERS_BY_VALUE_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# O5 — deterministic sampling (hash-mod; RANDOM() is not oracle-able)
# ---------------------------------------------------------------------------

def deterministic_sample(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", "o_custkey")
    )


DETERMINISTIC_SAMPLE_ORACLE = """
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 97 = 0
"""


# ---------------------------------------------------------------------------
# Correlated-subquery decorrelation (TPC-H Q2 shape; SURVEY §4 note:
# "we never emit correlated lookups — we express the set-based join")
# ---------------------------------------------------------------------------

def cheapest_part_per_type(spark, sf_dir):
    """Parts matching the min retail price of their type — written as the
    decorrelated groupBy-min + join; the oracle uses the correlated
    subquery the reference style would have produced. Equal results prove
    the rewrite."""
    p = _t(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("t")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.t) & (p.p_retailprice == mins.min_price),
        )
        .select("p_partkey", "p_type", F.round("p_retailprice", 2).alias("price"))
    )


CHEAPEST_PART_PER_TYPE_ORACLE = """
SELECT p_partkey, p_type, round(p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
"""


# ---------------------------------------------------------------------------
# Per-key z-score anomaly detection (windowed stats over events)
# ---------------------------------------------------------------------------

def event_value_anomalies(spark, sf_dir):
    """Events whose value is > 2 sample standard deviations from the
    user's mean — one aggregation + broadcast join back (no window needed,
    so the fact side shuffles once)."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    stats = e.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        e.join(F.broadcast(stats), "user_id")
        .where(
            (F.col("n") >= 10)
            & F.col("sigma").isNotNull()
            & (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma"))
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z_score"
            ),
        )
    )


EVENT_VALUE_ANOMALIES_ORACLE = """
WITH stats AS (
  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma,
         count(*) AS n
  FROM events GROUP BY user_id
)
SELECT event_id, e.user_id, round(value, 6) AS value,
       round((value - mu) / sigma, 4) AS z_score
FROM events e JOIN stats s ON e.user_id = s.user_id
WHERE n >= 10 AND sigma IS NOT NULL AND abs(value - mu) > 2 * sigma
"""


# ---------------------------------------------------------------------------
# Grouping sets / rollup (free via Spark groupBy — SURVEY §2.5 note)
# ---------------------------------------------------------------------------

def rollup_revenue(spark, sf_dir):
    """Revenue by (region, nation) with ROLLUP subtotals + grand total."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup(r.r_name.alias("region"), n.n_name.alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ROLLUP_REVENUE_ORACLE = """
SELECT r_name AS region, n_name AS nation,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# Running / framed window aggregates (beyond the reference's top-k windows)
# ---------------------------------------------------------------------------

def running_customer_revenue(spark, sf_dir):
    """Cumulative revenue + 3-order moving average per customer over order
    date — unbounded-preceding and bounded frames."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("cum_revenue"),
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4
        ).alias("moving_avg_3"),
    )


RUNNING_CUSTOMER_REVENUE_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w_cum, 2) AS cum_revenue,
       round(avg(o_totalprice) OVER w_mov, 4) AS moving_avg_3
FROM orders
WINDOW
  w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def pivot_status_by_priority(spark, sf_dir):
    """Pivot (long→wide): order counts per priority with one column per
    status. Unpivot is the inverse via stack()/unpivot — same engine path."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


PIVOT_STATUS_BY_PRIORITY_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


def median_order_values(spark, sf_dir):
    """Exact interpolated percentiles per status (Spark ``percentile`` and
    DuckDB ``quantile_cont`` both linear-interpolate)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_value"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_value"),
        F.count(F.lit(1)).alias("n"),
    )


MEDIAN_ORDER_VALUES_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_value,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_value,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""


def string_functions(spark, sf_dir):
    """Scalar string-function family (F8-F13 breadth): case, trim, pad,
    substring, concat, replace, length — one derived label per customer."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(
            "|",
            F.upper(F.substring("c_name", 1, 4)),
            F.lpad(F.col("c_custkey").cast("string"), 6, "0"),
            F.lower(F.trim("c_mktsegment")),
            F.regexp_replace("c_name", "[0-9]", "#"),
        ).alias("label"),
        F.length("c_name").alias("name_len"),
    )


STRING_FUNCTIONS_ORACLE = """
SELECT c_custkey,
       concat_ws('|',
                 upper(substring(c_name, 1, 4)),
                 lpad(CAST(c_custkey AS VARCHAR), 6, '0'),
                 lower(trim(c_mktsegment)),
                 regexp_replace(c_name, '[0-9]', '#', 'g')) AS label,
       length(c_name) AS name_len
FROM customer
"""


def cube_revenue(spark, sf_dir):
    """CUBE over (status, priority): all grouping-set combinations."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


CUBE_REVENUE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def unpivot_status_counts(spark, sf_dir):
    """Unpivot (wide→long) via stack(): the inverse of the pivot query."""
    wide = pivot_status_by_priority(spark, sf_dir)
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'F', n_f, 'O', n_o, 'P', n_p) AS (status, n)",
    )


UNPIVOT_STATUS_COUNTS_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, s.status, s.n FROM wide,
LATERAL (VALUES ('F', n_f), ('O', n_o), ('P', n_p)) AS s(status, n)
"""


def array_stats_embeddings(spark, sf_dir):
    """Array-function family over the embedding column: min/max/mean per
    vector via higher-order functions."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min(v), 5).alias("v_min"),
        F.round(F.array_max(v), 5).alias("v_max"),
        F.round(mean, 5).alias("v_mean"),
    )


ARRAY_STATS_EMBEDDINGS_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       round(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 5) AS v_min,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 5) AS v_max,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             / len(embedding), 5) AS v_mean
FROM embeddings
"""


def intersect_except_users(spark, sf_dir):
    """Set operators INTERSECT/EXCEPT: customers who placed orders vs
    users who produced events."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    e = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    both = o.intersect(e)
    only_orders = o.distinct().exceptAll(e.distinct())
    return both.withColumn("src", F.lit("both")).unionByName(
        only_orders.withColumn("src", F.lit("orders_only"))
    ).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


INTERSECT_EXCEPT_USERS_ORACLE = """
SELECT src, count(*) AS n FROM (
  SELECT k, 'both' AS src FROM (
    SELECT o_custkey AS k FROM orders INTERSECT SELECT user_id FROM events
  )
  UNION ALL
  SELECT k, 'orders_only' AS src FROM (
    SELECT DISTINCT o_custkey AS k FROM orders
    EXCEPT
    SELECT DISTINCT user_id FROM events
  )
) GROUP BY src
"""


def order_value_histogram(spark, sf_dir):
    """Fixed-width histogram of order values (floor-binning; the profiling
    primitive behind data-skew and quality dashboards)."""
    o = _t(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return (
        o.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


ORDER_VALUE_HISTOGRAM_ORACLE = """
SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bin,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY 1
"""


def null_aware_aggregates(spark, sf_dir):
    """NULL-semantics parity: count(*) vs count(col) vs count(distinct),
    null-skipping avg — nulls manufactured via nullif(discount, 0)."""
    li = _t(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(d).alias("n_nonzero_disc"),
        F.countDistinct(d).alias("n_distinct_disc"),
        F.round(F.avg(d), 6).alias("avg_nonzero_disc"),
        F.sum(d.isNull().cast("long")).alias("n_zero_disc"),
    )


NULL_AWARE_AGGREGATES_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       count(nullif(l_discount, 0.0)) AS n_nonzero_disc,
       count(DISTINCT nullif(l_discount, 0.0)) AS n_distinct_disc,
       round(avg(nullif(l_discount, 0.0)), 6) AS avg_nonzero_disc,
       CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_zero_disc
FROM lineitem GROUP BY l_returnflag
"""


def approx_distinct_counts(spark, sf_dir):
    """Approximate distinct (HLL) with a checkable contract: HLL estimates
    differ across engines, so the sketch value itself is not compared —
    instead the query asserts its own estimate is within 5% of exact
    (default rsd=0.05 gives ~1.6% typical error) and the oracle checks the
    exact side plus the same boolean."""
    li = _t(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey")
    exact = F.countDistinct("l_partkey")
    return li.agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("within_5pct"),
    )


APPROX_DISTINCT_COUNTS_ORACLE = """
SELECT count(DISTINCT l_partkey) AS exact_parts, TRUE AS within_5pct
FROM lineitem
"""


# ---------------------------------------------------------------------------
# JSON extraction (events.props — beyond-reference scope, FIXTURES.md §B)
# ---------------------------------------------------------------------------

def json_extract_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


JSON_EXTRACT_EVENTS_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(props->>'k' AS BIGINT)), 6) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# skew mitigation through the oracle gate (SURVEY §4 posture)
# ---------------------------------------------------------------------------

def salted_join_revenue(spark, sf_dir):
    """lineitem ⋈ part with 8-way key salting (operators/skew.salted_join):
    hot join keys spread over salt_buckets reducers. The oracle runs the
    PLAIN equi-join — salting changes the physical distribution, never the
    join semantics, and the gate proves it."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, on="l_partkey", salt_buckets=8)
    return joined.groupBy("p_brand").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SALTED_JOIN_REVENUE_ORACLE = """
SELECT p_brand, round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# ANALYZE-style column profiling (the stats a cost-based optimizer feeds on)
# ---------------------------------------------------------------------------

#: columns profiled by table_stats_orders; o_orderdate is normalized to a
#: DATE first so its string rendering is engine-identical
_STATS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def table_stats_orders(spark, sf_dir):
    """Per-column table statistics over orders — row count, null count,
    exact NDV, min/max — the ANALYZE TABLE ... COMPUTE STATISTICS FOR
    COLUMNS shape (what a cost-based optimizer and a data-quality monitor
    both consume).

    Scale shape: ONE aggregate over the table computes every column's
    stats (count/min/max are map-side combined; the exact countDistincts
    share the single Expand-based aggregate — the standard ANALYZE cost);
    the melt to one-row-per-column happens on the single result row.
    min/max are taken on the NATIVE type and cast to string only for the
    uniform report schema (casting first would compare lexicographically).
    """
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in _STATS_COLS:
        aggs += [
            F.count(c).alias(f"{c}__cnt"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__cnt")).alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in _STATS_COLS
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def _table_stats_oracle() -> str:
    parts = []
    for c in _STATS_COLS:
        expr = f"CAST({c} AS DATE)" if c == "o_orderdate" else c
        parts.append(
            f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
            f"CAST(count(*) - count({expr}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct, "
            f"CAST(min({expr}) AS VARCHAR) AS min_value, "
            f"CAST(max({expr}) AS VARCHAR) AS max_value FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


TABLE_STATS_ORDERS_ORACLE = _table_stats_oracle()


def fuzzy_name_match(spark, sf_dir):
    """Entity resolution over customer names: three deterministic
    corruption classes (char deletion, separator swap, digits masked) are
    derived in-query, then matched back to the canonical side with
    suffix-blocking + Levenshtein ≤ 2 best-match
    (operators/joins.fuzzy_match_join). The digits-masked class lands in
    an empty block, pinning the no-match path. Mirrors the reference's
    dirty-data repair theme (ETL/validation normalization) as a set-based
    blocked join instead of per-row lookups."""
    from ..operators.joins import fuzzy_match_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    key = F.col("c_custkey")
    d0 = c.where(key % 7 == 0).select(
        key.alias("dirty_id"),
        F.concat(
            F.substring("c_name", 1, 2), F.expr("substring(c_name, 4)")
        ).alias("name"),
    )
    d3 = c.where(key % 7 == 3).select(
        key.alias("dirty_id"), F.translate("c_name", "#", "-").alias("name")
    )
    d5 = c.where(key % 7 == 5).select(
        key.alias("dirty_id"),
        F.regexp_replace("c_name", "[0-9]", "X").alias("name"),
    )
    dirty = d0.unionByName(d3).unionByName(d5)
    return fuzzy_match_join(
        dirty,
        c,
        "dirty_id",
        "name",
        "c_custkey",
        "c_name",
        block=lambda col: F.substring(col, -6, 6),
        max_distance=2,
    )


FUZZY_NAME_MATCH_ORACLE = """
WITH c AS (SELECT c_custkey, c_name FROM customer),
dirty AS (
  SELECT c_custkey AS dirty_id,
         substr(c_name, 1, 2) || substr(c_name, 4) AS name
  FROM c WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, replace(c_name, '#', '-') FROM c WHERE c_custkey % 7 = 3
  UNION ALL
  SELECT c_custkey, regexp_replace(c_name, '[0-9]', 'X', 'g')
  FROM c WHERE c_custkey % 7 = 5
),
cand AS (
  SELECT d.dirty_id, r.c_custkey,
         CAST(levenshtein(d.name, r.c_name) AS INT) AS dist
  FROM dirty d JOIN c r ON substr(d.name, -6, 6) = substr(r.c_name, -6, 6)
  WHERE levenshtein(d.name, r.c_name) <= 2
),
best AS (SELECT dirty_id, min(dist) AS distance FROM cand GROUP BY dirty_id)
SELECT c.dirty_id, min(c.c_custkey) AS c_custkey, b.distance
FROM cand c JOIN best b ON c.dirty_id = b.dirty_id AND c.dist = b.distance
GROUP BY c.dirty_id, b.distance
"""


def rolling_hourly_user_value(spark, sf_dir):
    """Trailing 1-hour per-user rolling aggregate per event — a TIME-RANGE
    window frame (RANGE BETWEEN 1 HOUR PRECEDING AND CURRENT ROW), the
    standard real-time-feature shape (fraud velocity checks, rate
    limiting, feature-store trailing windows). The frame is defined on
    epoch MICROSECONDS (``ntz_epoch_micros``) so bounds are exact integer
    arithmetic on both engines; a range frame is order-insensitive within
    ties, so the result is deterministic without an event_id tie-break.

    Scale shape: one shuffle on user_id, then a per-partition ordered
    scan; the frame buffer holds only one hour of one user's events."""
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    ep = ntz_epoch_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("__ep")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.withColumn("__ep", ep)
        .select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 6).alias("value_1h"),
        )
    )


ROLLING_HOURLY_USER_VALUE_ORACLE = """
SELECT event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       round(sum(value) OVER w, 6) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def variant_extract_events(spark, sf_dir):
    """Semi-structured access through the binary VARIANT type (Spark 4):
    ``parse_json`` once, then typed ``variant_get`` extraction, NULL-safe
    ``try_variant_get`` on an absent path, and ``schema_of_variant``
    introspection. Complements ``json_extract_events`` (string-path
    get_json_object): at scale a parsed-once Variant column is stored and
    re-read without re-parsing JSON text per access. The generator emits a
    fixed {"k": int} shape, so the introspected schema is a constant the
    oracle pins literally."""
    e = _t(spark, sf_dir, "events")
    var = F.parse_json("props")
    return e.where(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.variant_get(var, "$.k", "long").alias("k"),
        F.try_variant_get(var, "$.absent", "string").alias("absent"),
        F.schema_of_variant(var).alias("vschema"),
    )


VARIANT_EXTRACT_EVENTS_ORACLE = """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k,
       CAST(NULL AS VARCHAR) AS absent,
       'OBJECT<k: BIGINT>' AS vschema
FROM events WHERE event_id % 100 = 0
"""


def order_value_quantiles(spark, sf_dir):
    """Per-priority order-value quantiles via the mergeable
    percentile_approx sketch (Greenwald-Khanna): the distributed-quantile
    workhorse — each partition sketches locally, sketches merge at the
    driver-side of the agg, no global sort. Accuracy 100000 exceeds every
    per-group row count at bench scale, making the sketch EXACT here and
    therefore oracle-comparable against DuckDB's quantile_disc; at real
    scale the same plan runs at lower accuracy with a bounded rank error
    (that is the point of a sketch)."""
    o = _t(spark, sf_dir, "orders")
    acc = F.lit(100_000)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile_approx("o_totalprice", F.lit(0.5), acc).alias("p50"),
            F.percentile_approx("o_totalprice", F.lit(0.9), acc).alias("p90"),
            F.percentile_approx("o_totalprice", F.lit(0.99), acc).alias("p99"),
        )
    )


ORDER_VALUE_QUANTILES_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.9) AS p90,
       quantile_disc(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderpriority
"""


def gap_filled_daily_order_counts(spark, sf_dir):
    """Date-spine gap fill + forward fill — the reporting/feature-store
    shape: build the complete (priority × day) spine over the observed
    date range, zero-fill days with no orders, and carry the most recent
    observed avg price forward (``last(..., ignorenulls)`` over an
    ordered window). Days before a priority's first order stay NULL.

    Scale shape: the spine is dimension-sized (groups × days), built
    from a broadcast one-row bounds frame — the fact table is touched
    once for the daily aggregate; the fill is one window over the spine,
    never over raw facts."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_totalprice",
    )
    daily = o.groupBy("o_orderpriority", "d").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine_days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    prios = o.select("o_orderpriority").distinct()
    spine = prios.crossJoin(F.broadcast(spine_days))
    w = Window.partitionBy("o_orderpriority").orderBy("d")
    return spine.join(daily, ["o_orderpriority", "d"], "left").select(
        "o_orderpriority",
        "d",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.last("avg_price", ignorenulls=True).over(w).alias("last_seen_avg"),
    )


GAP_FILLED_DAILY_ORDER_COUNTS_ORACLE = """
WITH o AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d, o_totalprice
  FROM orders
),
daily AS (
  SELECT o_orderpriority, d, CAST(count(*) AS BIGINT) AS n_orders,
         round(avg(o_totalprice), 6) AS avg_price
  FROM o GROUP BY o_orderpriority, d
),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM bounds
),
spine AS (
  SELECT p.o_orderpriority, days.d
  FROM (SELECT DISTINCT o_orderpriority FROM o) p CROSS JOIN days
)
SELECT s.o_orderpriority, s.d,
       COALESCE(dl.n_orders, 0) AS n_orders,
       last_value(dl.avg_price IGNORE NULLS)
         OVER (PARTITION BY s.o_orderpriority ORDER BY s.d) AS last_seen_avg
FROM spine s LEFT JOIN daily dl USING (o_orderpriority, d)
"""


def local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 proper: revenue from lineitems whose CUSTOMER and
    SUPPLIER sit in the same nation — the co-location predicate joined
    across six tables. Completes table coverage (supplier was otherwise
    unused by the catalog).

    Scale shape: only lineitem⋈orders shuffles (orderkey); customer,
    supplier, and nation broadcast; the same-nation predicate is a
    post-join filter on two broadcast-sourced columns, so no extra
    exchange appears for it."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


LOCAL_SUPPLIER_VOLUME_ORACLE = """
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned lineitems per customer,
    top 20 — the churn-analysis join-agg (fact filter → two joins → agg
    → top-k). Only lineitem⋈orders shuffles; customer and nation
    broadcast; the returnflag filter is pushed to the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_REVENUE_ORACLE = """
SELECT c_custkey, c_name, n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
       count(*) AS n_returned_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC LIMIT 20
"""


def bloom_filtered_orders(spark, sf_dir):
    """Bloom-prefiltered semi join (round-6): orders of BUILDING-segment
    customers, with the fact side pre-filtered by a Bloom bitmap of the
    key set BEFORE the exact semi join — the manual form of Spark's
    runtime row-level filtering, for key sides too big to broadcast but
    whose ~KiB bitmap is not. Result is bit-identical to the plain semi
    join (the oracle); the bitmap kills most non-matching fact rows
    inside the scan stage. See operators/joins.bloom_semi_join for the
    100 TB shape (one build job, O(num_bits) broadcast, pre-shuffle
    filter)."""
    from ..operators.joins import bloom_semi_join

    o = _t(spark, sf_dir, "orders")
    keys = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    # auto-sized bitmap (~10 bits/key → ~1% FP at k=5): a hard-coded
    # num_bits saturates when the key side grows and the prefilter
    # silently degrades to a no-op (round-7 ADVICE fix) — sizing from
    # keys.count() keeps the FP rate flat at any SF
    out = bloom_semi_join(o, keys, "o_custkey")
    return out.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


BLOOM_FILTERED_ORDERS_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_value
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
GROUP BY o_orderstatus
"""


def hopping_event_rates(spark, sf_dir):
    """Hopping (sliding) window aggregation (round-6): per-event-type
    counts and value sums over 1-hour windows advancing every 15 minutes
    — the overlapping-window family (tumbling ⊂ hopping; sessionize
    covers gap windows). Each event lands in exactly 4 windows; Spark's
    ``F.window(ts, '1 hour', '15 minutes')`` expands them row-locally
    (a 4× fan-out BEFORE one map-side-combined aggregate — no
    self-join), which is the scale shape: shuffle volume is 4×
    pre-aggregated group rows, never 4× events. Restricted to one day so
    the result stays a compact, fully-checkable window table."""
    e = _events(spark, sf_dir).where(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp_ntz"))
    )
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


HOPPING_EVENT_RATES_ORACLE = """
WITH day AS (
  SELECT ts, event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
    AND ts <  TIMESTAMP '2024-01-04 00:00:00'
),
expanded AS (
  SELECT make_timestamp(((epoch_us(ts) // 900000000) - j) * 900000000)
           AS win_start,
         event_type, value
  FROM day, unnest([0, 1, 2, 3]) AS t(j)
)
SELECT win_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM expanded
GROUP BY win_start, event_type
"""


def customer_revenue_deciles(spark, sf_dir):
    """ntile decile segmentation (round-6): customers bucketed into 10
    equal-frequency tiers by total order value — the classic RFM-style
    scoring step. Completes the ranking-window family (row_number /
    rank exist elsewhere; ntile's equal-size partitioning is distinct).
    Per-decile stats keep the result compact and fully checkable.

    Scale note: the ntile window is a GLOBAL ordering — fine for a
    customer dimension (ntile over aggregated per-customer rows, not
    facts). For the same EXACT segmentation with no single-partition
    sort use :func:`revenue_deciles_distributed` (range partitions +
    shard-local ranks); for approximate fact-scale percentiles use
    order_value_quantiles' mergeable-sketch path."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    tiled = per_cust.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("revenue"), 2).alias("decile_revenue"),
        F.round(F.min("revenue"), 2).alias("min_revenue"),
        F.round(F.max("revenue"), 2).alias("max_revenue"),
    )


CUSTOMER_REVENUE_DECILES_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT *, ntile(10) OVER (ORDER BY revenue DESC, o_custkey ASC) AS decile
  FROM per_cust
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(revenue), 2) AS decile_revenue,
       round(min(revenue), 2) AS min_revenue,
       round(max(revenue), 2) AS max_revenue
FROM tiled GROUP BY decile
"""


def revenue_deciles_distributed(spark, sf_dir, shards=8):
    """Fact-scale ntile (round-10, verdict item 8): the SAME decile
    segmentation as :func:`customer_revenue_deciles` with NO global
    single-partition sort anywhere in the plan. ntile needs each row's
    exact global rank; at dimension scale a global window is fine, but
    at fact scale the one-task sort is the bottleneck the round-9
    verdict flagged. Exact distributed ranking instead:

    1. ``repartitionByRange`` on the strict total order
       (revenue desc, custkey asc — custkey is unique, so no boundary
       ties) splits the frame into ``shards`` ordered, NON-overlapping
       ranges, each sorted locally (``sortWithinPartitions``) — every
       shard sorts in parallel.
    2. partition-local positions come FREE from
       ``monotonically_increasing_id`` (pid<<33 | local index, assigned
       in partition row order — a narrow map, no window exchange).
    3. global rank = local position + the shard's prefix offset, where
       offsets come from one shards-sized count collect (k rows on the
       driver, same bounded-collect class as the IVF centroids).
    4. the exact ntile arithmetic (first n%10 buckets get one extra
       row) is a literal expression over the rank, so the output is
       hash-identical to the window ntile / the DuckDB oracle — the
       layout changed the PLAN, not the answer.

    Cost: the groupBy exchange + ONE range exchange; no stage sees more
    than 1/shards of the rows. Boundary placement by the range sampler
    cannot affect the result — ranks derive from actual per-shard
    counts under a strict total order."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    order_cols = [F.desc("revenue"), F.asc("o_custkey")]
    ranged = (
        per_cust.repartitionByRange(shards, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrn", (F.col("__mid") % F.lit(1 << 33)).cast("long") + 1
        )
        .localCheckpoint(eager=True)  # pin ids: rank math reads it twice
    )
    counts = {
        r["__pid"]: r["c"]
        for r in ranged.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        off_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(
            off_expr
        )
    rank = (off_expr + F.col("__lrn")).alias("rank")
    q, r = divmod(n, 10)
    q_safe = max(q, 1)  # the q==0 branch is unreachable when n < 10
    ranked = ranged.select("revenue", rank)
    tiled = ranked.withColumn(
        "decile",
        F.when(
            F.col("rank") <= r * (q + 1),
            F.ceil(F.col("rank") / F.lit(q + 1)),
        )
        .otherwise(
            F.lit(r)
            + F.ceil((F.col("rank") - F.lit(r * (q + 1))) / F.lit(q_safe))
        )
        .cast("int"),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("revenue"), 2).alias("decile_revenue"),
        F.round(F.min("revenue"), 2).alias("min_revenue"),
        F.round(F.max("revenue"), 2).alias("max_revenue"),
    )


# identical segmentation contract — the distributed ranking must be
# indistinguishable from the window ntile
REVENUE_DECILES_DISTRIBUTED_ORACLE = CUSTOMER_REVENUE_DECILES_ORACLE


def order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape (round-6): orders placed in one quarter having AT
    LEAST ONE slow lineitem (shipped >60 days after the order date),
    counted by priority — the correlated-EXISTS family, expressed as a
    left-semi join with a compound (equi + range) condition so Spark
    plans one hash semi join on orderkey with the range test as its
    post-probe filter. The reference analogue is the notebook's
    late-shipment QA probe; the date filter pushes to the orders scan."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.timestamp_add("DAY", F.lit(60), o.o_orderdate)),
        "left_semi",
    ))
    return (
        slow.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_COUNTS_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (round-6): distribution of orders-per-customer —
    LEFT join so zero-order customers are counted in the c_count=0
    bucket, then a second aggregation over the per-customer counts (the
    count-of-counts / histogram-of-cardinalities pattern). Both
    aggregations are map-side combined; the first shuffles on custkey,
    the second on the (tiny) count domain."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_DISTRIBUTION_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (round-6): share of one month's revenue earned by
    PROMO parts — the conditional-sum-over-join ratio (a single scalar
    row). The month filter pushes to the lineitem scan; part broadcasts;
    both sums come out of ONE map-side-combined aggregate, so the ratio
    costs exactly one scan + one broadcast join at any scale."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


PROMO_REVENUE_SHARE_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
         AS promo_revenue_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def suppliers_who_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape (round-7): suppliers who were the SOLE late
    shipper on a finished multi-supplier order — the hardest classic
    semi/anti composition (EXISTS + NOT-EXISTS over the same fact,
    correlated on a potentially skewed supplier key).

    Reference analogue: the notebook's late-shipment QA probe
    (pipeline.ipynb cell 23) is the single-EXISTS half of this; the
    reference engine would run three correlated sqlite scans per row.

    Spark-first decorrelation: instead of three lineitem self-joins
    (l1 ⋈ EXISTS(l2) ⋈ NOT-EXISTS(l3)), derive per-order supplier
    lateness in ONE orderkey-keyed aggregate — n_suppliers,
    n_late_suppliers and the (unique when n_late=1) late supplier —
    then filter n_supp ≥ 2 AND n_late = 1. EXISTS becomes "≥2
    suppliers"; NOT-EXISTS becomes "no OTHER late supplier", i.e.
    exactly one late supplier. One shuffle join (lineitem ⋈ orders on
    orderkey, AQE-skew-splittable) + one aggregate replaces the
    three-way self-join; the multi-distinct aggregate plans as a single
    Expand pass, and the final supplier attribution is a broadcast
    join against the 100-row dimension. No per-supplier skew ever
    reaches a shuffle key: the aggregate is keyed by orderkey.
    """
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
    ).withColumn(
        "late",
        F.col("l_shipdate")
        > F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate")),
    )
    # two-level aggregate instead of countDistinct×2: both levels'
    # grouping keys contain/equal the join key, so the join's orderkey
    # partitioning satisfies both and neither re-shuffles — and no
    # Expand pass (which would triple the rows) is planned
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    waiting = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(
            F.broadcast(s), waiting.late_supp == s.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


SUPPLIERS_WHO_KEPT_WAITING_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier,
     (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
                   AND o.o_orderstatus = 'F'
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
     ) waiting
WHERE s_suppkey = waiting.l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


def surplus_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (round-7): the nested semi-join CHAIN — suppliers
    having a (part, supplier) supply relationship whose 1996 shipped
    quantity exceeds HALF of that pair's all-time demand (with a
    minimum-volume floor), over 'red'-named parts only. The testdata
    has no partsupp table, so the supply relation is derived from
    lineitem itself; the correlated-aggregate-threshold semantics
    (ps_availqty > 0.5 × correlated SUM in Q20) are preserved as
    "period share > 0.5 × total" per pair.

    Spark-first: part-name semi filter BROADCAST onto the lineitem
    scan (kills ~7/8 of rows before any shuffle), ONE (partkey,
    suppkey) aggregate with a conditional sum (the decorrelated form
    of Q20's scalar subquery — no per-pair re-scan), then a semi join
    from the 100-row supplier dimension into the qualifying pairs.
    The only corpus-scale shuffle is the pair aggregate, map-side
    combined; everything else is broadcast-sized.
    """
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity"
    )
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    pairs = (
        li.join(F.broadcast(p), "l_partkey", "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in96, F.col("l_quantity")).otherwise(0.0)).alias(
                "q96"
            ),
            F.sum("l_quantity").alias("q_total"),
        )
        .where(
            (F.col("q96") > 0.5 * F.col("q_total"))
            & (F.col("q_total") >= 60)
        )
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


SURPLUS_PART_SUPPLIERS_ORACLE = """
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate <  TIMESTAMP '1997-01-01'
             THEN l_quantity ELSE 0.0 END) > 0.5 * sum(l_quantity)
     AND sum(l_quantity) >= 60
)
ORDER BY s_name
"""


def important_part_revenue(spark, sf_dir):
    """TPC-H Q11 shape (round-7): parts whose revenue exceeds a fraction
    of TOTAL revenue — the scalar-subquery-HAVING family (a per-group
    aggregate compared against a global aggregate of the same scan).

    Spark-first: ONE lineitem scan builds the per-part aggregate; the
    global total is then re-aggregated FROM the per-part frame (2k rows,
    part-bounded) instead of re-scanning the fact table, and joined back
    as a broadcast 1-row frame. ``localCheckpoint`` pins the per-part
    aggregate so its two consumers (threshold + filter) don't recompute
    the fact scan (multi-consumer recompute hazard). Accumulation is in
    decimal(18,4): exact decimal sums are associative, so the per-part
    values AND the re-summed total are bit-identical to the oracle's
    direct lineitem sum regardless of association order. The threshold
    product is NOT fully exact: decimal(28,4) total × decimal(10,8)
    fraction formally needs precision 39, one over Spark's 38-digit
    cap, so ``allowPrecisionLoss`` trims the product scale (~11 digits
    survive) while DuckDB resolves the same product at full scale — the
    two engines' thresholds can differ by < 5e-12, and a boundary flip
    would need a part_value within that sliver of the threshold
    (round-8 advice: stated as a bound, not "can never flip"; the real
    round-7 hazard — each side cent-rounding in double — stays fixed).

    At 100 TB: per-part is |parts|-bounded (dimension-sized), the only
    fact-scale work is the one map-side-combined groupBy.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("v"),
    )
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum("v").alias("part_value"))
        .localCheckpoint(eager=True)
    )
    total = per_part.agg(F.sum("part_value").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("part_value")
            > F.col("__total") * F.expr("CAST(0.00065 AS DECIMAL(10,8))")
        )
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


IMPORTANT_PART_REVENUE_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS part_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(part_value, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE part_value >
      (SELECT sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4))) * CAST(0.00065 AS DECIMAL(10,8))
       FROM lineitem)
ORDER BY part_value DESC, l_partkey ASC
"""


def lapsed_high_balance_customers(spark, sf_dir):
    """TPC-H Q22 shape (round-7): high-balance customers with NO recent
    orders, rolled up by nation — the scalar-average subquery + anti
    join composition (Q22's country-code bucketing replaced by the
    nation dimension the testdata actually has; "no orders at all"
    relaxed to "no orders since 1999" because every sf customer has
    lifetime orders).

    Spark-first: the positive-balance average is a broadcast 1-row
    frame (crossJoin against a dimension-sized table); the recency
    check is a left-anti join against the date-filtered orders
    projection (filter pushed to the orders scan); nation attribution
    broadcasts. No fact-scale shuffle at all — the only orders work is
    a pushed-filter scan.
    """
    c = _t(spark, sf_dir, "customer")
    avg_pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, "c_custkey", "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


LAPSED_HIGH_BALANCE_CUSTOMERS_ORACLE = """
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                     WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Round-7 TPC-H long-tail shapes (Q7/Q8/Q9/Q12/Q15/Q16/Q17/Q19 analogues,
# adapted to this star schema — no partsupp/shipmode/commitdate columns).
# Reference analogue for all of these: the notebook's OLAP star-join
# reporting cells (pipeline.ipynb cells 25-31) — per-dimension revenue
# rollups the reference computes with row-loop sqlite queries.
# ---------------------------------------------------------------------------

def bilateral_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: revenue shipped between two specific nations
    (either direction), by supplier nation × customer nation × ship year.

    Plan: both nation filters are applied INSIDE the dimension sides
    before any fact row is touched — supplier and (customer ⋈ orders)
    shrink to the two-nation slice, the supplier side broadcasts, and
    the only fact-scale work is lineitem ⋈ orders on orderkey. The
    disjunctive pair predicate runs post-join on two tiny dict columns.
    """
    pair = ("NATION_1", "NATION_2")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount",
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


BILATERAL_TRADE_VOLUME_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_5's share of revenue sold into the ASIA
    market (customers in ASIA nations), per order year.

    Plan: the market membership (region → nation → customer) collapses
    to a broadcast semi join before the fact join; the supplier's
    nation label rides in on a broadcast dict; both the conditional and
    total sums come out of ONE map-side-combined aggregate keyed by the
    (tiny) year — no second pass for the denominator.
    """
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_mkt = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(n_mkt),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(
            "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
                        0.0
                    )
                )
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


NATION_MARKET_SHARE_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                      ELSE 0.0 END) / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
GROUP BY o_year
ORDER BY o_year
"""


def product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on widget-family parts by supplier nation
    and order year. No partsupp table here, so cost is modeled from the
    part dimension (80% of retail price × quantity) — same join/agg
    topology: fact ⋈ two broadcast dims ⋈ orders, profit expression
    evaluated pre-aggregation inside codegen.
    """
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    # the profit difference amplifies float error enough that a plain
    # double sum drifts a cent across engines at sf0.01 — sum exactly
    # in decimal(18,4) (order-independent), round, then return double
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.round(F.sum(profit.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


PRODUCT_TYPE_PROFIT_ORACLE = """
SELECT nation, o_year,
       CAST(round(sum(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.8 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def shipping_delay_priority_mix(spark, sf_dir):
    """TPC-H Q12 shape: line counts split by order priority
    (urgent/high vs other) across ship-delay buckets — the
    conditional-count-over-join. No shipmode column, so the grouping
    dimension is the order→ship delay bucket (a CASE over datediff).
    One orderkey join + ONE aggregate keyed by the 3-value bucket.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(delay <= 30, "0-30d")
        .when(delay <= 90, "31-90d")
        .otherwise("90d+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


SHIPPING_DELAY_PRIORITY_MIX_ORACLE = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN '0-30d'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN '31-90d'
            ELSE '90d+' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


def top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — aggregate, take the scalar max, join back on equality.

    Plan: ONE fact aggregate keyed by suppkey (map-side combined behind
    a pushed quarter filter); the scalar max comes from a global-max
    window over the ALREADY-AGGREGATED supplier-sized frame — a
    scalar-subquery crossJoin would recompute the whole fact aggregate
    (Spark does not reuse an exchange across the two consumers), i.e.
    scan lineitem twice. The single-partition window touches only
    |suppliers| pre-aggregated rows. Revenue is rounded BEFORE the
    max-equality so the tie comparison is exact across engines.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("total_revenue")
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn(
            "__mx", F.max("total_revenue").over(Window.partitionBy())
        )
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "total_revenue")
        .orderBy("s_name")
    )


TOP_REVENUE_SUPPLIER_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_name
"""


def part_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers have shipped each
    (brand, type, size) part family — excluding one brand, one type,
    and any supplier in deficit (the NOT-IN-subquery → broadcast anti
    join). No partsupp table, so the supplier↔part relationship is
    derived from lineitem.

    Plan: part filter broadcasts; the deficit-supplier exclusion is a
    broadcast ANTI join (never a shuffle); the count-distinct runs as
    distinct-then-count (two key-prefixed exchanges, no Expand pass).
    """
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deficit = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    rels = (
        li.join(
            F.broadcast(deficit),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        rels.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


PART_SUPPLIER_DIVERSITY_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: yearly revenue lost to small-quantity orders of
    one brand's parts — the correlated scalar-average subquery,
    decorrelated into a per-part aggregate joined back to the fact.

    Plan: the brand slice broadcasts into the fact scan twice (once to
    prune lines, once as the per-part average); both the average and
    the final scalar come out of brand-sized data, so fact-scale cost
    is one pruned scan. No correlated per-row re-scan, which is what
    the reference's row-loop would do.
    """
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            F.broadcast(p),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("__half_avg")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("__half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SMALL_QUANTITY_REVENUE_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
"""


def disjunctive_promo_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of three (brand, size,
    quantity) conjunctions — the disjunctive-predicate-pushdown test.

    Plan: the part side is pre-pruned to the union of the three brand
    slices (a pushed IN filter on the part scan) and broadcast; the
    residual OR runs post-join inside codegen. The fact side is never
    shuffled; the aggregate is a single scalar row.
    """
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


DISJUNCTIVE_PROMO_REVENUE_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def best_price_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape: for each part shipped into one region, the
    supplier offering the minimum observed unit price — the classic
    correlated-min-over-a-join, decorrelated. No partsupp table here, so
    the supplier↔part offer price is the average observed unit price
    (l_extendedprice/l_quantity) from lineitem.

    Plan: offers = ONE fact aggregate keyed by (part, supplier) with the
    region membership applied as a broadcast semi join BEFORE the
    aggregate (prunes the fact scan's output early); the per-part min is
    a second aggregate over offer-sized (not fact-sized) data; the
    winner join is offer⋈min on (part, price) — all shuffles are keyed
    by part, so the exchange chain reuses one partitioning. The final
    supplier/part attribution broadcasts the dims. Top 100 by account
    balance mirrors Q2's ORDER BY s_acctbal DESC LIMIT.
    """
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n_eu = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n_eu), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(
            F.broadcast(s.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4)
        .alias("unit_price")
    )
    best = offers.groupBy("l_partkey").agg(
        F.min("unit_price").alias("best_price")
    ).select(
        F.col("l_partkey").alias("bp_partkey"),
        "best_price",
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bp_partkey"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .select(F.col("l_partkey").alias("p_partkey"), "l_suppkey", "unit_price")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), "p_partkey")
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "unit_price",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "l_suppkey"
        )
        .limit(100)
    )


BEST_PRICE_SUPPLIER_PER_PART_ORACLE = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 4) AS unit_price
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM eu_supp)
  GROUP BY l_partkey, l_suppkey
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       p_type, unit_price
FROM offers o
JOIN eu_supp ON s_suppkey = l_suppkey
JOIN part    ON p_partkey = l_partkey
WHERE unit_price = (SELECT min(unit_price) FROM offers o2
                    WHERE o2.l_partkey = o.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, l_suppkey
LIMIT 100
"""


def asof_events_to_orders_skewsafe(spark, sf_dir):
    """J3, skew-safe two-phase merge strategy: same semantics and oracle
    as ``asof_events_to_orders``, windowed by (user, day-bucket) so a
    hot user's timeline spreads across partitions instead of landing in
    one straggler task (`joins.asof_merge_join_skewed`). Still ONE
    data-sized exchange; the cross-bucket prefix runs over bucket-level
    rows only.
    """
    from ..operators.joins import asof_merge_join_skewed

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_merge_join_skewed(
        e,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        how="inner",
        bucket_seconds=86400,
    ).select(
        "event_id", "user_id", F.col("o_orderkey").alias("asof_orderkey")
    )


def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS — the general form cube/rollup specialize:
    revenue at (status, priority), (status) and grand-total granularity
    ONLY (a cube would also emit the (priority) slice). One Expand pass
    over pre-aggregated rows, exactly like cube/rollup; grouping_id
    disambiguates a real NULL key from a rolled-up one.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


GROUPING_SETS_REVENUE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


def interpolated_daily_values(spark, sf_dir):
    """Time-series linear interpolation over a date spine — the
    feature-store fill beyond forward-fill (gap_filled_daily_order_counts
    carries; this one interpolates between the bracketing observations).

    Observed series: daily mean purchase value, with every third
    calendar day deterministically withheld so the interpolation path is
    exercised at any SF. Missing days get
    ``prev + (next - prev) · Δdays/span``; days before the first or
    after the last observation stay NULL (no extrapolation).

    Scale shape: the fact table is touched once for the daily aggregate;
    the spine and both bracketing windows are SPINE-sized (days — a few
    thousand rows for a decade), never fact-sized, so the single-
    partition windows here are bounded by the calendar, not the data.
    """
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
        .where(F.pmod(F.dayofmonth("d"), F.lit(3)) != 0)
    )
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    grid = spine.join(daily, "d", "left")
    w_prev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.orderBy("d").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs = F.when(F.col("v").isNotNull(), F.struct("d", "v"))
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    interp = F.round(
        prev["v"]
        + (nxt["v"] - prev["v"])
        * F.datediff(F.col("d"), prev["d"])
        / F.datediff(nxt["d"], prev["d"]),
        6,
    )
    return grid.select(
        "d",
        "v",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp)
        .alias("v_filled"),
    )


INTERPOLATED_DAILY_VALUES_ORACLE = """
WITH daily AS (
  SELECT * FROM (
    SELECT CAST(ts AS DATE) AS d, round(avg(value), 6) AS v
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
  ) WHERE day(d) % 3 <> 0
), bounds AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
  FROM events WHERE event_type = 'purchase'
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
), grid AS (
  SELECT s.d, daily.v FROM spine s LEFT JOIN daily ON s.d = daily.d
), spans AS (
  SELECT d, v,
         last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_d,
         last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_v,
         first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_d,
         first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_v
  FROM grid
)
SELECT d, v,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              round(prev_v + (next_v - prev_v)
                    * date_diff('day', prev_d, d)
                    / date_diff('day', prev_d, next_d), 6)
       END AS v_filled
FROM spans
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — the last classic missing from the long tail: pure
# scan-side predicate stack + one global aggregate, the canonical
# pushdown/vectorization microbenchmark (no join at all).
# ---------------------------------------------------------------------------

def discount_band_revenue(spark, sf_dir):
    """Revenue that would be recovered by dropping a discount band
    (TPC-H Q6 shape): one-year ship window × discount band × small
    quantities, summed revenue delta. Every predicate is a plain
    column comparison, so the whole WHERE stack pushes into the parquet
    scan (PushedFilters) and the surviving rows feed ONE
    map-side-combined global aggregate — the minimal full-scan shape:
    zero joins, zero wide shuffles, one SinglePartition exchange of a
    single partial-agg row per task."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


DISCOUNT_BAND_REVENUE_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS potential_revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Interval join (range_bucket_join showcase) — beyond-reference join
# family: batch interval×point join without a nested-loop plan.
# ---------------------------------------------------------------------------

def repeat_purchases_within_90d(spark, sf_dir):
    """Per order: how many LATER orders the same customer placed within
    90 days (repeat-purchase burst signal). A naive
    ``b.date > a.date AND b.date <= a.date + 90d`` join plans as a
    broadcast-nested-loop — quadratic per customer and cluster-fatal on
    a fact×fact pair. ``operators/joins.range_bucket_join`` turns it
    into an equi join on (custkey, 90-day bucket): each right order
    lands in ONE bucket, each left interval explodes to its ≤2 covered
    buckets, and the exact bound predicate filters inside the bucket.
    Unmatched orders are restored by a left join of the aggregated
    match counts back onto orders (count 0)."""
    from ..operators.joins import range_bucket_join

    o = _t(spark, sf_dir, "orders")
    left = o.select("o_orderkey", "o_custkey", "o_orderdate")
    right = o.select(
        "o_custkey", F.col("o_orderdate").alias("r_orderdate")
    )
    matched = range_bucket_join(
        left,
        right,
        ["o_custkey"],
        F.col("o_orderdate"),
        F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate")),
        F.col("r_orderdate"),
        bucket_width_seconds=90 * 86400,
        lo_open=True,  # strictly later orders only
    )
    counts = matched.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_repeat_90d")
    )
    return left.select("o_orderkey").join(counts, "o_orderkey", "left").select(
        "o_orderkey",
        F.coalesce("n_repeat_90d", F.lit(0)).alias("n_repeat_90d"),
    )


REPEAT_PURCHASES_WITHIN_90D_ORACLE = """
SELECT a.o_orderkey,
       CAST(count(b.o_orderdate) AS BIGINT) AS n_repeat_90d
FROM orders a LEFT JOIN orders b
  ON b.o_custkey = a.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 90 DAY
GROUP BY a.o_orderkey
"""


# ---------------------------------------------------------------------------
# Snapshot reconciliation diff — the migration/validation tool every ETL
# engine needs: given yesterday's and today's snapshot of a keyed table,
# classify every key as unchanged / changed / only_left / only_right in
# one pass.
# ---------------------------------------------------------------------------

_DIFF_COMPARE_COLS = [
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _orders_next_snapshot(o):
    """Deterministic 'today' snapshot: ~1% deletes (key % 97), ~1%
    price updates (key % 89), ~1% inserts (key % 101 cloned to a
    disjoint key range). Mutations are exact-arithmetic (+1.5 on a
    parquet double) so both engines compute identical values."""
    kept = o.where(F.col("o_orderkey") % 97 != 0)
    updated = kept.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = o.where(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    return updated.unionByName(inserts)


def snapshot_diff_orders(spark, sf_dir):
    """Keyed snapshot diff (reconciliation): FULL OUTER join of two
    order snapshots on the primary key, each key classified by
    null-safe column comparison — no row-hash, so engine-specific float
    formatting can't fake a diff. Scale shape: two hash exchanges on
    the key (bucketing both snapshots on the key makes them zero) and
    one tiny summary aggregate; the comparison itself is JVM column
    expressions inside the join stage. Output: per-class row counts
    plus the summed absolute price drift of changed keys."""
    o = _t(spark, sf_dir, "orders")
    left = o.select("o_orderkey", *_DIFF_COMPARE_COLS)
    right = _orders_next_snapshot(o).select(
        F.col("o_orderkey"),
        *[F.col(c).alias(f"r_{c}") for c in _DIFF_COMPARE_COLS],
    )
    j = left.join(right, "o_orderkey", "full_outer")
    # presence flags: a snapshot row always has a non-null custkey, so
    # null-ness of one side's columns after the outer join marks absence
    has_l = F.col("o_custkey").isNotNull()
    has_r = F.col("r_o_custkey").isNotNull()
    differs = None
    for c in _DIFF_COMPARE_COLS:
        d = ~F.col(c).eqNullSafe(F.col(f"r_{c}"))
        differs = d if differs is None else (differs | d)
    status = (
        F.when(has_l & ~has_r, F.lit("only_left"))
        .when(~has_l & has_r, F.lit("only_right"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("diff_status"),
            F.when(
                has_l & has_r,
                F.abs(F.col("o_totalprice") - F.col("r_o_totalprice")),
            )
            .otherwise(F.lit(0.0))
            .alias("price_delta"),
        )
        .groupBy("diff_status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum("price_delta"), 2).alias("abs_price_drift"),
        )
    )


SNAPSHOT_DIFF_ORDERS_ORACLE = """
WITH next AS (
  SELECT o_orderkey,
         o_custkey,
         o_orderstatus,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.5
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 101 = 0
),
j AS (
  SELECT l.o_custkey AS lc, r.o_custkey AS rc,
         CASE
           WHEN r.o_custkey IS NULL THEN 'only_left'
           WHEN l.o_custkey IS NULL THEN 'only_right'
           WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
             OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
             OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
             OR (l.o_orderdate IS DISTINCT FROM r.o_orderdate)
             OR (l.o_orderpriority IS DISTINCT FROM r.o_orderpriority)
           THEN 'changed'
           ELSE 'unchanged'
         END AS diff_status,
         CASE WHEN l.o_custkey IS NOT NULL AND r.o_custkey IS NOT NULL
              THEN abs(l.o_totalprice - r.o_totalprice) ELSE 0.0 END
           AS price_delta
  FROM orders l FULL OUTER JOIN next r USING (o_orderkey)
)
SELECT diff_status, CAST(count(*) AS BIGINT) AS n_keys,
       round(sum(price_delta), 2) AS abs_price_drift
FROM j GROUP BY diff_status
"""


# ---------------------------------------------------------------------------
# Data-quality expectation suite — deequ-style constraint checking in ONE
# aggregation pass (plus one anti-join for referential integrity).
# ---------------------------------------------------------------------------

def data_quality_expectations(spark, sf_dir):
    """Seven table expectations evaluated in a single scan: row count,
    PK uniqueness, not-null, value bounds, domain membership, date
    range, and FK existence. All scalar metrics come from ONE
    map-side-combined aggregate over orders (conditional sums — no
    per-rule scans); the FK check is an anti-join count with NO forced
    broadcast hint — AQE broadcasts the customer keyset at runtime when
    it fits (the test-SF case) and falls back to a shuffle anti-join
    when a 100 TB-scale dimension exceeds the broadcast limit, instead
    of OOMing on a hint (same rationale as operators/cdc.py). The
    two 1-row frames cross-join (broadcast, constant) and unpivot via
    ``stack`` into (expectation, observed, passed) rows — the shape a
    quality gate consumes. At 100 TB this is exactly 1 fact scan + 1
    tiny exchange regardless of how many rules are added."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    allowed = ["O", "F", "P"]
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dups"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
        F.sum((~F.col("o_orderstatus").isin(allowed)).cast("long")).alias(
            "bad_status"
        ),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp_ntz"))
            ).cast("long")
        ).alias("bad_date"),
    )
    orphans = (
        o.join(c, "o_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    both = m.crossJoin(orphans)
    return both.select(
        F.expr(
            """stack(7,
            'row_count_positive', CAST(n_rows AS DOUBLE), n_rows > 0,
            'orderkey_unique', CAST(pk_dups AS DOUBLE), pk_dups = 0,
            'custkey_not_null', CAST(null_cust AS DOUBLE), null_cust = 0,
            'totalprice_positive', CAST(bad_price AS DOUBLE), bad_price = 0,
            'orderstatus_in_domain', CAST(bad_status AS DOUBLE), bad_status = 0,
            'orderdate_in_range', CAST(bad_date AS DOUBLE), bad_date = 0,
            'custkey_fk_exists', CAST(fk_orphans AS DOUBLE), fk_orphans = 0
            ) AS (expectation, observed, passed)"""
        )
    )


DATA_QUALITY_EXPECTATIONS_ORACLE = """
WITH m AS (
  SELECT count(*) AS n_rows,
         count(*) - count(DISTINCT o_orderkey) AS pk_dups,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           AS bad_status,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                    OR o_orderdate >= TIMESTAMP '2002-01-01'
                  THEN 1 ELSE 0 END) AS bad_date
  FROM orders
), fk AS (
  SELECT count(*) AS fk_orphans FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'row_count_positive' AS expectation,
       CAST(n_rows AS DOUBLE) AS observed, n_rows > 0 AS passed FROM m
UNION ALL SELECT 'orderkey_unique', CAST(pk_dups AS DOUBLE), pk_dups = 0 FROM m
UNION ALL SELECT 'custkey_not_null', CAST(null_cust AS DOUBLE),
                 null_cust = 0 FROM m
UNION ALL SELECT 'totalprice_positive', CAST(bad_price AS DOUBLE),
                 bad_price = 0 FROM m
UNION ALL SELECT 'orderstatus_in_domain', CAST(bad_status AS DOUBLE),
                 bad_status = 0 FROM m
UNION ALL SELECT 'orderdate_in_range', CAST(bad_date AS DOUBLE),
                 bad_date = 0 FROM m
UNION ALL SELECT 'custkey_fk_exists', CAST(fk_orphans AS DOUBLE),
                 fk_orphans = 0 FROM fk
"""


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view refresh) — merge a
# new batch's partial aggregates into persisted state instead of
# rescanning history (operators/incremental.py).
# ---------------------------------------------------------------------------

def incremental_monthly_revenue(spark, sf_dir):
    """Monthly revenue metrics maintained INCREMENTALLY: history's
    partial-aggregate state (count/sum/min/max per month — each a
    mergeable monoid) is merged with the partials of a new batch
    (orders ≥ 1997-06-01), and avg is finalized from the merged
    partials. The oracle recomputes the same metrics from the full
    table, so the merge path is cross-checked against the full-rescan
    semantics it replaces. Here the history state is built in-query and
    eagerly checkpointed to stand in for the persisted state table a
    production refresh would READ — the refresh plan itself touches
    only the batch scan plus two state-sized (month-cardinality)
    aggregates, independent of history size."""
    from ..operators.incremental import (
        finalize_aggs,
        merge_partials,
        partial_agg,
    )

    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-06-01").cast("timestamp_ntz")
    # cast to DATE: Spark's date_trunc returns a timestamp while the
    # oracle's returns a date, and month granularity is a date anyway
    month = (
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("month")
    )
    hist = o.where(F.col("o_orderdate") < cutoff).select(
        month, "o_totalprice"
    )
    batch = o.where(F.col("o_orderdate") >= cutoff).select(
        month, "o_totalprice"
    )
    state_hist = partial_agg(hist, ["month"], "o_totalprice").localCheckpoint(
        eager=True
    )
    state_new = partial_agg(batch, ["month"], "o_totalprice")
    return finalize_aggs(merge_partials([state_hist, state_new], ["month"]))


INCREMENTAL_MONTHLY_REVENUE_ORACLE = """
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(count(o_totalprice) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS value_sum,
       round(sum(o_totalprice) / count(o_totalprice), 2) AS value_avg,
       round(min(o_totalprice), 2) AS value_min,
       round(max(o_totalprice), 2) AS value_max
FROM orders
GROUP BY date_trunc('month', o_orderdate)
"""


def incremental_value_quantiles(spark, sf_dir):
    """Quantiles maintained INCREMENTALLY (round 10): exact quantiles
    are not decomposable, so the maintained state is a fixed-bin
    histogram — a true monoid (bin-wise count sum), deterministic on
    any engine, error bounded by one bin width. Orders split into three
    deterministic batches; each contributes histogram partials
    (operators/incremental.py histogram_partial), the partials merge,
    and P50/P90/P99 per order priority read out as the upper edge of
    the first bin whose cumulative count reaches ceil(q·total). The
    oracle replays the IDENTICAL binned-rank arithmetic in SQL over the
    whole table in one pass — merge-split invariance (pinned in
    tests/test_incremental_aggs.py) makes the three-batch state equal
    the one-pass histogram, and the read-out is engine-exact (integer
    bin index → one multiply-add). Refresh cost in production is
    O(batch + groups·bins), independent of history size."""
    from ..operators.incremental import (
        histogram_partial,
        merge_histogram_partials,
        quantiles_from_histogram,
    )

    LO, HI, BINS = 0.0, 600_000.0, 600
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    k = F.col("o_orderkey")
    parts = [
        histogram_partial(
            o.where(k % 3 == m),
            ["o_orderpriority"],
            "o_totalprice",
            LO,
            HI,
            BINS,
        )
        for m in (0, 1, 2)
    ]
    state = merge_histogram_partials(parts, ["o_orderpriority"])
    return quantiles_from_histogram(
        state, ["o_orderpriority"], LO, HI, BINS, [0.5, 0.9, 0.99]
    )


INCREMENTAL_VALUE_QUANTILES_ORACLE = """
WITH b AS (
  SELECT o_orderpriority,
         LEAST(GREATEST(CAST(floor(CAST(o_totalprice AS DOUBLE) / 1000.0)
                             AS BIGINT), 0), 599) AS bin,
         count(*) AS cnt
  FROM orders GROUP BY 1, 2
), c AS (
  SELECT o_orderpriority, bin,
         sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY o_orderpriority) AS tot
  FROM b
), qs AS (
  SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) t(q)
)
SELECT o_orderpriority, q, round((min(bin) + 1) * 1000.0, 2) AS q_value
FROM c, qs
WHERE cum >= ceil(q * tot)
GROUP BY o_orderpriority, q
"""


def adaptive_quantile_state(spark, sf_dir):
    """Quantile state with NO a-priori [lo, hi] (round 11, lifting the
    round-10 caveat): each batch's histogram picks its own power-of-2
    bin width from its per-group max (width = base·2^d chosen by pure
    comparisons — no float transcendentals, so every engine picks the
    same grid), and the merge losslessly coarsens to the widest grid
    present (floor(bin/2^j) — exact for anchored power-of-2 grids).
    The batches here split orders BY VALUE RANGE so batch 3's values
    blow past batch 1's range by ~25× — the exact drifting-range shape
    the fixed grid can't survive — and the merged state still equals a
    one-pass histogram at the final width, which is what the oracle
    replays (per-group width from the overall max: width selection is
    monotone in the max, so max-over-batches of batch widths == the
    width of the overall max). Error ≤ one final bin width by
    construction; refresh cost O(batch + groups·bins)."""
    from ..operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
        quantiles_from_adaptive_histogram,
    )

    LO, BINS, BASE_W = 0.0, 256, 16.0
    keys = ["o_orderpriority"]
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    p = F.col("o_totalprice")
    batches = [
        o.where(p < 20_000),
        o.where((p >= 20_000) & (p < 100_000)),
        o.where(p >= 100_000),
    ]
    parts = [
        adaptive_histogram_partial(
            b, keys, "o_totalprice", LO, BINS, BASE_W
        )
        for b in batches
    ]
    state = merge_adaptive_histogram_partials(parts, keys)
    return quantiles_from_adaptive_histogram(
        state, keys, LO, [0.5, 0.9, 0.99]
    )


ADAPTIVE_QUANTILE_STATE_ORACLE = """
WITH gm AS (
  SELECT o_orderpriority, max(CAST(o_totalprice AS DOUBLE)) AS gmax
  FROM orders GROUP BY 1
), w AS (
  SELECT o_orderpriority,
         16.0 * pow(2.0, (SELECT min(d)
                          FROM range(0, 41) t(d)
                          WHERE 256 * 16.0 * pow(2.0, d) > gmax - 0.0)) AS width
  FROM gm
), b AS (
  SELECT o.o_orderpriority,
         GREATEST(CAST(floor(CAST(o_totalprice AS DOUBLE) / width) AS BIGINT),
                  CAST(0 AS BIGINT)) AS bin,
         width,
         count(*) AS cnt
  FROM orders o JOIN w USING (o_orderpriority)
  GROUP BY 1, 2, 3
), c AS (
  SELECT o_orderpriority, bin, width,
         sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY o_orderpriority) AS tot
  FROM b
), qs AS (
  SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) t(q)
)
SELECT o_orderpriority, q,
       round(0.0 + (min(bin) + 1) * max(width), 2) AS q_value
FROM c, qs
WHERE cum >= ceil(q * tot)
GROUP BY o_orderpriority, q
"""


def adaptive_quantile_state_signed(spark, sf_dir):
    """Adaptive quantile state over a SIGNED metric (round 12, lifting
    the round-11 floor-anchor caveat): the grid anchor stays a fixed
    shared point (0 here) but values below it get NEGATIVE bin indices
    instead of clamping into bin 0 — floor division is exact for
    negatives, so the power-of-2 lossless-coarsening identity holds on
    both sides of the anchor and the width now covers
    max(gmax-lo, lo-gmin). The metric is the signed day offset of each
    order date from 1998-01-01 (≈ -1100..+1300 days at any SF); batches split
    by |offset| so batch 1's grid is 32× finer than batch 3's — the
    merge must coarsen across the anchor. Oracle replays the one-pass
    histogram at the final per-group width (width selection is monotone
    in the two-sided span, so max-over-batches of widths == width of
    the overall span)."""
    from ..operators.incremental import (
        adaptive_histogram_partial,
        merge_adaptive_histogram_partials,
        quantiles_from_adaptive_histogram,
    )

    LO, BINS, BASE_W = 0.0, 64, 1.0
    keys = ["o_orderpriority"]
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lit("1998-01-01").cast("date"))
        .cast("double")
        .alias("day_offset"),
    )
    d = F.abs(F.col("day_offset"))
    batches = [
        o.where(d < 30),
        o.where((d >= 30) & (d < 400)),
        o.where(d >= 400),
    ]
    parts = [
        adaptive_histogram_partial(b, keys, "day_offset", LO, BINS, BASE_W)
        for b in batches
    ]
    state = merge_adaptive_histogram_partials(parts, keys)
    return quantiles_from_adaptive_histogram(
        state, keys, LO, [0.1, 0.5, 0.9]
    )


ADAPTIVE_QUANTILE_STATE_SIGNED_ORACLE = """
WITH v AS (
  SELECT o_orderpriority,
         CAST(datediff('day', DATE '1998-01-01', o_orderdate) AS DOUBLE) AS d
  FROM orders
), gm AS (
  SELECT o_orderpriority, max(d) AS gmax, min(d) AS gmin
  FROM v GROUP BY 1
), w AS (
  SELECT o_orderpriority,
         1.0 * pow(2.0, (SELECT min(t.d)
                         FROM range(0, 41) t(d)
                         WHERE 64 * 1.0 * pow(2.0, t.d)
                               > GREATEST(gmax - 0.0, 0.0 - gmin))) AS width
  FROM gm
), b AS (
  SELECT v.o_orderpriority,
         CAST(floor((v.d - 0.0) / width) AS BIGINT) AS bin,
         width,
         count(*) AS cnt
  FROM v JOIN w USING (o_orderpriority)
  GROUP BY 1, 2, 3
), c AS (
  SELECT o_orderpriority, bin, width,
         sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY o_orderpriority) AS tot
  FROM b
), qs AS (
  SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.1), (0.5), (0.9)) t(q)
)
SELECT o_orderpriority, q,
       round(0.0 + (min(bin) + 1) * max(width), 2) AS q_value
FROM c, qs
WHERE cum >= ceil(q * tot)
GROUP BY o_orderpriority, q
"""


def incremental_distinct_counts(spark, sf_dir):
    """INCREMENTALLY-maintained distinct counts made driver-gradeable
    (round 11, closing the round-10 gap): the HLL sketch state itself is
    engine-specific (DuckDB has no DataSketches), so the graded contract
    follows the approx_distinct_counts pattern — emit the EXACT distinct
    (computable identically on both engines) plus a within_5pct boolean
    asserting the merged-sketch estimate's error bound (lgK=12 → ~1.6%
    typical, 5% is the contract). The state is genuinely maintained the
    incremental way: three deterministic batches → per-batch
    distinct_partial sketches → group-wise hll_union_agg merge →
    estimate. Production refresh is O(batch + groups·2^lgK bytes),
    independent of history; the exact side here exists only to GRADE the
    sketch."""
    from ..operators.incremental import (
        distinct_partial,
        finalize_distinct,
        merge_distinct_partials,
    )

    keys = ["o_orderpriority"]
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    k = F.col("o_orderkey")
    states = [
        distinct_partial(o.where(k % 3 == m), keys, "o_custkey")
        for m in (0, 1, 2)
    ]
    state = merge_distinct_partials(states, keys)
    est = finalize_distinct(state, keys)
    exact = o.groupBy(*keys).agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return exact.join(est, keys).select(
        *keys,
        "exact_customers",
        (
            F.abs(
                F.col("distinct_est").cast("double")
                - F.col("exact_customers").cast("double")
            )
            <= 0.05 * F.col("exact_customers").cast("double")
        ).alias("within_5pct"),
    )


INCREMENTAL_DISTINCT_COUNTS_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_5pct
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# CDC apply — fold an ordered change log (binlog/Debezium shape) into a
# snapshot: last-writer-wins upserts + delete tombstones
# (operators/cdc.py).
# ---------------------------------------------------------------------------

def _orders_cdc_changes(o, extra_cols=()):
    """THE deterministic orders CDC log shared by cdc_apply_orders and
    cdc_partitioned_apply_orders (one builder, so the two entries'
    'same log' claim cannot drift): seq 1 updates price +1.5 for keys
    %89==0, seq 2 deletes keys %97==0, seq 3 re-updates price +2.5 for
    keys %89==0 AND %2==1 (last-writer-wins over seq 1), plus seq 1
    inserts of cloned keys (+10M) for keys %101==0. ``extra_cols``:
    (name, builder) pairs appended per change row (e.g. a partition
    column derived from the key)."""
    k = F.col("o_orderkey")

    def ch(df, seq, op, price):
        kk = F.col("o_orderkey")
        return df.select(
            "o_orderkey",
            *[expr(kk).alias(name) for name, expr in extra_cols],
            price.alias("o_totalprice"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
        )

    p = F.col("o_totalprice")
    return (
        ch(o.where(k % 89 == 0), 1, "U", p + 1.5)
        .unionByName(ch(o.where(k % 97 == 0), 2, "D", p))
        .unionByName(
            ch(o.where((k % 89 == 0) & (k % 2 == 1)), 3, "U", p + 2.5)
        )
        .unionByName(
            ch(
                o.where(k % 101 == 0).withColumn(
                    "o_orderkey", k + 10_000_000
                ),
                1,
                "I",
                p,
            )
        )
    )


def cdc_apply_orders(spark, sf_dir):
    """Next orders snapshot from the deterministic 3-sequence CDC log
    (``_orders_cdc_changes``). Keys divisible by both 89 and 97 exercise
    delete-after-update; the oracle replays the same log with window
    SQL, so the operator's anti-join + union plan is cross-checked
    against the declarative row_number semantics. Output is the full
    resulting snapshot (key, price) — every row hash-compared."""
    from ..operators.cdc import apply_cdc

    o = _t(spark, sf_dir, "orders")
    snap = o.select("o_orderkey", "o_totalprice")
    changes = _orders_cdc_changes(o)
    return apply_cdc(
        snap, changes, ["o_orderkey"], "seq"
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


CDC_APPLY_ORDERS_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_totalprice + 1.5 AS o_totalprice,
         1 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 2, 'D'
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 2.5, 3, 'U'
  FROM orders WHERE o_orderkey % 89 = 0 AND o_orderkey % 2 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, 1, 'I'
  FROM orders WHERE o_orderkey % 101 = 0
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC, (op = 'D') DESC) AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.o_orderkey = o.o_orderkey)
UNION ALL
SELECT o_orderkey, round(o_totalprice, 2)
FROM last WHERE op <> 'D'
"""


def cdc_partitioned_apply_orders(spark, sf_dir):
    """Partition-scoped CDC apply end-to-end (round-8,
    operators/cdc.py apply_cdc_partitioned + TableStore.
    overwrite_partitions): orders land in a hive-partitioned TableStore
    snapshot (p = o_orderkey % 8), the SAME deterministic log as
    cdc_apply_orders folds in — but only the affected partitions are
    rewritten (untouched ones hardlink into the new version) — and the
    full resulting snapshot reads back for the hash gate. The oracle is
    the whole-log declarative replay, so partition pruning, the
    affected-partition union (rows move partitions only if the key
    expression changed — here p is key-derived, so moves don't occur;
    cross-partition moves are pinned by tests/test_cdc_apply.py) and the
    hardlink carry-over must be invisible to the result."""
    import shutil
    import tempfile

    from ..operators.cdc import apply_cdc_partitioned
    from ..sources.io import TableStore

    o = _t(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )
    k = F.col("o_orderkey")
    snap = o.select("o_orderkey", (k % 8).alias("p"), "o_totalprice")
    changes = _orders_cdc_changes(
        o, extra_cols=[("p", lambda kk: kk % 8)]
    )
    root = tempfile.mkdtemp(prefix="cdc_part_")
    try:
        store = TableStore(spark, root)
        store.overwrite("snap", snap, partition_by=["p"])
        apply_cdc_partitioned(
            store, "snap", changes, ["o_orderkey"], "seq", "p"
        )
        out = store.read("snap").select(
            "o_orderkey",
            F.col("p").cast("int").alias("p"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


CDC_PARTITIONED_APPLY_ORDERS_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_totalprice + 1.5 AS o_totalprice,
         1 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 2, 'D'
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 2.5, 3, 'U'
  FROM orders WHERE o_orderkey % 89 = 0 AND o_orderkey % 2 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, 1, 'I'
  FROM orders WHERE o_orderkey % 101 = 0
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC, (op = 'D') DESC) AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT o.o_orderkey, CAST(o.o_orderkey % 8 AS INT) AS p,
       round(o.o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.o_orderkey = o.o_orderkey)
UNION ALL
SELECT o_orderkey, CAST(o_orderkey % 8 AS INT), round(o_totalprice, 2)
FROM last WHERE op <> 'D'
"""


def cdc_partitioned_versioned_orders(spark, sf_dir):
    """Partitioned × versioned CDC composition end-to-end (round-9,
    operators/cdc.py apply_cdc_partitioned_versioned): the SAME
    deterministic log as cdc_apply_orders/cdc_partitioned_apply_orders,
    but delivered as three per-sequence batches OUT OF ORDER
    (seq 3, then 1, then 2) against a hive-partitioned VERSIONED
    TableStore snapshot (p = o_orderkey % 8). Each apply rewrites only
    affected partitions; the versioned layer (per-row ``__seq`` +
    tombstones) makes the out-of-order delivery converge to the
    whole-log fold — a plain per-batch apply_cdc would let the late
    seq-1 update clobber the seq-3 price on odd %89 keys AND let seq-3
    resurrect the seq-2 deletes on %89∩%97 keys, so the oracle gate
    genuinely discriminates the composition's safety, not just the
    plumbing. Output is the live-row view (tombstones stripped)."""
    import shutil
    import tempfile

    from ..operators.cdc import (
        apply_cdc_partitioned_versioned,
        strip_versioned,
        to_versioned,
    )
    from ..sources.io import TableStore

    o = _t(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )
    k = F.col("o_orderkey")
    snap = o.select("o_orderkey", (k % 8).alias("p"), "o_totalprice")
    changes = _orders_cdc_changes(
        o, extra_cols=[("p", lambda kk: kk % 8)]
    ).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="cdc_pv_")
    try:
        store = TableStore(spark, root)
        store.overwrite("snap", to_versioned(snap), partition_by=["p"])
        for seq in (3, 1, 2):  # deliberately out-of-order delivery
            batch = changes.where(F.col("seq") == seq)
            apply_cdc_partitioned_versioned(
                store, "snap", batch, ["o_orderkey"], "seq", "p"
            )
        out = strip_versioned(store.read("snap")).select(
            "o_orderkey",
            F.col("p").cast("int").alias("p"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# out-of-order batched delivery through the versioned layer must equal
# the whole-log declarative replay — byte-for-byte the same oracle as
# the single-batch partitioned apply
CDC_PARTITIONED_VERSIONED_ORDERS_ORACLE = CDC_PARTITIONED_APPLY_ORDERS_ORACLE


def cdc_patch_orders(spark, sf_dir):
    """Partial-column (patch) CDC apply end-to-end (round-8,
    operators/cdc.py apply_cdc_patch): a deterministic log where seq 1
    patches ONLY the price (%89 keys), seq 2 deletes (%97), seq 3
    patches ONLY the priority (%89) and seq 3 empty-set patches (%83)
    resurrect deleted keys as all-null-payload rows. The per-column
    merge must weave price-from-seq-1 with priority-from-seq-3 on the
    same row, wipe snapshot contributions behind a delete, and keep
    untouched rows byte-identical; the oracle recomputes the same
    closed form declaratively (per-column arg_max over surviving
    patches + delete horizon)."""
    from ..operators.cdc import apply_cdc_patch

    o = _t(spark, sf_dir, "orders")
    snap = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderpriority",
    )
    k = F.col("o_orderkey")

    def ch(df, seq, op, price, prio, sets):
        return df.select(
            "o_orderkey",
            price.cast("double").alias("o_totalprice"),
            prio.alias("o_orderpriority"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
            F.array(*[F.lit(s) for s in sets])
            .cast("array<string>")
            .alias("set_cols"),
        )

    p, pr = F.col("o_totalprice"), F.col("o_orderpriority")
    changes = (
        ch(o.where(k % 89 == 0), 1, "U", p + 1.5, pr, ["o_totalprice"])
        .unionByName(ch(o.where(k % 97 == 0), 2, "D", p, pr, []))
        .unionByName(
            ch(
                o.where(k % 89 == 0),
                3,
                "U",
                p,
                F.lit("9-PATCHED"),
                ["o_orderpriority"],
            )
        )
        .unionByName(ch(o.where(k % 83 == 0), 3, "U", p, pr, []))
    )
    out = apply_cdc_patch(snap, changes, ["o_orderkey"], "seq")
    return out.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


CDC_PATCH_ORDERS_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, CAST(o_totalprice + 1.5 AS DOUBLE) AS o_totalprice,
         o_orderpriority, 1 AS seq, 'U' AS op,
         ['o_totalprice'] AS set_cols
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), o_orderpriority,
         2, 'D', []::VARCHAR[]
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), '9-PATCHED',
         3, 'U', ['o_orderpriority']
  FROM orders WHERE o_orderkey % 89 = 0
  UNION ALL
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), o_orderpriority,
         3, 'U', []::VARCHAR[]
  FROM orders WHERE o_orderkey % 83 = 0
),
d AS (
  SELECT o_orderkey AS k, max(seq) AS dseq
  FROM changes WHERE op = 'D' GROUP BY 1
),
surv AS (
  SELECT c.* FROM changes c LEFT JOIN d ON c.o_orderkey = d.k
  WHERE c.op <> 'D' AND (d.dseq IS NULL OR c.seq > d.dseq)
),
per_key AS (
  SELECT o_orderkey,
         arg_max(o_totalprice, seq)
           FILTER (WHERE list_contains(set_cols, 'o_totalprice'))
           AS w_price,
         count(*) FILTER (WHERE list_contains(set_cols, 'o_totalprice'))
           > 0 AS has_price,
         arg_max(o_orderpriority, seq)
           FILTER (WHERE list_contains(set_cols, 'o_orderpriority'))
           AS w_prio,
         count(*) FILTER (WHERE list_contains(set_cols, 'o_orderpriority'))
           > 0 AS has_prio
  FROM surv GROUP BY 1
)
SELECT o.o_orderkey,
       round(CASE WHEN pk.has_price THEN pk.w_price
                  WHEN d.dseq IS NULL THEN o.o_totalprice END, 2)
         AS o_totalprice,
       CASE WHEN pk.has_prio THEN pk.w_prio
            WHEN d.dseq IS NULL THEN o.o_orderpriority END
         AS o_orderpriority
FROM orders o
LEFT JOIN per_key pk ON pk.o_orderkey = o.o_orderkey
LEFT JOIN d ON d.k = o.o_orderkey
WHERE pk.o_orderkey IS NOT NULL OR d.k IS NULL
UNION ALL
SELECT pk.o_orderkey, round(pk.w_price, 2), pk.w_prio
FROM per_key pk
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = pk.o_orderkey)
"""


# ---------------------------------------------------------------------------
# Z-order pruned scan — the file-skipping storage path end-to-end under
# the oracle gate (sources/io.py cluster_by_zorder + read_where).
# ---------------------------------------------------------------------------

def zorder_pruned_scan(spark, sf_dir):
    """Orders copied into a TableStore, Z-order-clustered on
    (o_totalprice, o_custkey), then range-read on EACH axis via the
    stats-pruned ``read_where`` path and combined — results must equal
    the oracle's plain full-scan filters, proving pruned reads drop
    whole files without dropping rows. The interleaved layout is what
    lets BOTH predicates skip files from one rewrite; the oracle only
    checks correctness (pruning effectiveness is pinned by
    tests/test_scale_tools.py)."""
    import shutil
    import tempfile

    from ..sources.io import TableStore

    root = tempfile.mkdtemp(prefix="zorder_q_")
    try:
        store = TableStore(spark, root)
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        store.overwrite("orders_z", o.repartition(8))
        store.cluster_by_zorder(
            "orders_z", ["o_totalprice", "o_custkey"], 16
        )
        by_price = store.read_where(
            "orders_z", "o_totalprice", 50_000.0, 100_000.0
        ).select("o_orderkey", F.lit("price_band").alias("probe"))
        by_cust = store.read_where("orders_z", "o_custkey", 100, 499).select(
            "o_orderkey", F.lit("cust_band").alias("probe")
        )
        return by_price.unionByName(by_cust).localCheckpoint(eager=True)
    finally:
        # the eager localCheckpoint pins the result in the block manager;
        # the parquet files are no longer needed — without this, every
        # invocation (bench runs each query >= 3x) leaked a full
        # clustered copy of orders to disk
        shutil.rmtree(root, ignore_errors=True)


ZORDER_PRUNED_SCAN_ORACLE = """
SELECT o_orderkey, 'price_band' AS probe FROM orders
WHERE o_totalprice BETWEEN 50000.0 AND 100000.0
UNION ALL
SELECT o_orderkey, 'cust_band' FROM orders
WHERE o_custkey BETWEEN 100 AND 499
"""


def zorder_rank_pruned_scan(spark, sf_dir):
    """The RANK-bucketed (equi-depth percentile) Z-order path end-to-end
    under the oracle gate (round-8, sources/io.py cluster_by_zorder
    bucketing="rank"): same rewrite-then-pruned-read shape as
    zorder_pruned_scan but with quantile-edge bucket ids and different
    probe bands, so the binary-search bucket kernel, the staged-column
    plan construction and the stats-pruned reads over the rank layout
    are all regression-gated on correctness (outlier-robust pruning
    effectiveness is pinned by tests/test_scale_tools.py)."""
    import shutil
    import tempfile

    from ..sources.io import TableStore

    root = tempfile.mkdtemp(prefix="zorder_rank_q_")
    try:
        store = TableStore(spark, root)
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        store.overwrite("orders_zr", o.repartition(8))
        store.cluster_by_zorder(
            "orders_zr",
            ["o_totalprice", "o_custkey"],
            16,
            bucketing="rank",
        )
        by_price = store.read_where(
            "orders_zr", "o_totalprice", 120_000.0, 180_000.0
        ).select("o_orderkey", F.lit("price_band").alias("probe"))
        by_cust = store.read_where(
            "orders_zr", "o_custkey", 600, 899
        ).select("o_orderkey", F.lit("cust_band").alias("probe"))
        return by_price.unionByName(by_cust).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


ZORDER_RANK_PRUNED_SCAN_ORACLE = """
SELECT o_orderkey, 'price_band' AS probe FROM orders
WHERE o_totalprice BETWEEN 120000.0 AND 180000.0
UNION ALL
SELECT o_orderkey, 'cust_band' FROM orders
WHERE o_custkey BETWEEN 600 AND 899
"""


def compacted_partition_scan(spark, sf_dir):
    """Partition-scoped small-file compaction END-TO-END under the
    oracle gate (sources/io.py ``TableStore.compact_partitions``, round
    10): orders land in a hive-partitioned TableStore as an initial
    write plus three partitioned appends — the small-file bloat shape
    every continuously-ingested warehouse develops — a stats manifest is
    collected, the offenders are compacted to one file per partition
    (healthy dirs hardlink across; the manifest refreshes incrementally),
    and the compacted table aggregates per partition. The oracle
    computes the same aggregate straight from orders, so the entry
    passes iff compaction preserved every row through the rewrite;
    file-count, inode-sharing and incremental-stats behavior are pinned
    by tests/test_scale_tools.py."""
    import shutil
    import tempfile

    from ..sources.io import TableStore

    root = tempfile.mkdtemp(prefix="compact_q_")
    try:
        store = TableStore(spark, root)
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        k = F.col("o_orderkey")
        store.overwrite(
            "orders_p",
            o.where(k % 4 == 0).repartition(2, "o_orderpriority"),
            partition_by=["o_orderpriority"],
        )
        for m in (1, 2, 3):  # micro-batch appends -> small files
            store.append(
                "orders_p",
                o.where(k % 4 == m).repartition(2),
                partition_by=["o_orderpriority"],
            )
        store.collect_stats("orders_p")
        compacted = store.compact_partitions(
            "orders_p", "o_orderpriority", max_files=2
        )
        if not compacted:
            raise RuntimeError(
                "compacted_partition_scan: fixture failed to bloat any "
                "partition past the threshold"
            )
        out = (
            store.read("orders_p")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


COMPACTED_PARTITION_SCAN_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS price_sum
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Bucketed co-located join — the zero-exchange physical-layout path
# end-to-end under the oracle gate (sources/bucketed.py). The reference
# has no layout notion (SQLite b-trees, ETL/etl.py:146-168); at 100 TB
# the layout IS the optimization: two facts bucketed on the join key
# with matching bucket counts join AND aggregate with no exchange at
# all — each task reads bucket i of both sides, joins it, and folds the
# per-order aggregate in place because the SMJ's output partitioning
# (hash on o_orderkey) already satisfies the groupBy's distribution.
# ---------------------------------------------------------------------------

def bucketed_join_frame(spark, sf_dir, root, buckets=8):
    """Build the co-located orders⋈lineitem + per-order revenue frame
    over freshly bucketed copies under ``root``. Factored out of the
    catalog entry so tests/test_bucketed_join.py can lint the REAL
    executed plan (SortMergeJoin, ZERO exchanges end-to-end, including
    the aggregate) before the entry checkpoints it away. Returns
    ``(frame, (left_table, right_table))`` — caller drops the tables.

    The ``merge`` hint pins the strategy bucketing optimizes: at test
    SF the dimension-sized sides would otherwise broadcast, turning the
    plan into the one shape bucketing does NOT help and re-introducing
    an exchange for the groupBy. The aggregate groups on
    (o_orderkey, o_totalprice); hash-partitioning on o_orderkey alone
    satisfies that clustering (subset rule), so no exchange there
    either — the totalprice column rides along for the output without
    costing a shuffle.
    """
    from ..sources.bucketed import read_bucketed, write_bucketed

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    # table names derive from the caller's tmpdir suffix so (a) a failed
    # first write can't leak a fixed-name catalog entry pointing at a
    # deleted tmpdir for the NEXT run to trip over, and (b) concurrent
    # invocations in one session can't collide on the session catalog
    suffix = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(root))
    lt, rt = f"bq_orders_{suffix}", f"bq_lineitem_{suffix}"
    write_bucketed(o, lt, "o_orderkey", buckets, path=os.path.join(root, "o"))
    write_bucketed(
        li, rt, "o_orderkey", buckets, path=os.path.join(root, "l")
    )
    joined = (
        read_bucketed(spark, lt)
        .hint("merge")
        .join(read_bucketed(spark, rt), "o_orderkey")
    )
    out = joined.groupBy("o_orderkey", "o_totalprice").agg(
        F.count(F.lit(1)).alias("n_items"),
        # per-row cast to exact decimal BEFORE summing (the repo's Q11
        # convention): decimal sums are associative, so the per-order
        # value is engine- and partition-order-independent and the
        # 2-dp round can't flip on a half-cent double artifact
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )
    return out, (lt, rt)


def bucketed_colocated_revenue(spark, sf_dir):
    """Per-order item count + discounted revenue via the bucketed
    zero-exchange join (round-8 verdict item 8: the layout path was
    pytest-pinned but never driver-graded). Writes both facts bucketed
    by o_orderkey, joins them co-located and aggregates in place — the
    daily-repeated fact⋈fact join whose shuffle a single bucketed write
    amortizes away. Results must equal the oracle's plain shuffled
    join, proving the layout changes the PLAN, not the answer. The
    eager checkpoint pins the result so the temp warehouse and catalog
    tables can be dropped per invocation (bench runs each query ≥3×)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="bucketed_q_")
    # mirror bucketed_join_frame's name derivation so BOTH tables are
    # dropped even when the second write_bucketed fails after the first
    # created its catalog entry (previously the caller's tuple stayed
    # empty on a mid-build failure and the entry leaked)
    suffix = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(root))
    tables = (f"bq_orders_{suffix}", f"bq_lineitem_{suffix}")
    try:
        out, _ = bucketed_join_frame(spark, sf_dir, root)
        return out.localCheckpoint(eager=True)
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(root, ignore_errors=True)


BUCKETED_COLOCATED_REVENUE_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""
