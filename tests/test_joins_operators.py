"""Direct unit tests for the join operator library (SURVEY §2.4)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.joins import (
    anti_join,
    asof_join,
    join_current_version,
    latest_per_key,
    semi_join,
)

DIM_ROWS = [
    # product_id, product_sk, start, end, current
    (1, 1, date(2026, 1, 1), date(2026, 1, 31), False),
    (1, 3, date(2026, 2, 1), None, True),
    (2, 2, date(2026, 1, 15), None, True),
]
DIM_SCHEMA = (
    "product_id long, product_sk long, start_date date, end_date date, "
    "current_flag boolean"
)


def test_asof_join_resolves_correct_version(spark):
    dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
    facts = spark.createDataFrame(
        [
            (100, 1, date(2026, 1, 10)),  # inside closed version → sk 1
            (101, 1, date(2026, 2, 10)),  # open version → sk 3
            (102, 1, date(2025, 12, 1)),  # before history → NULL
            (103, 2, date(2026, 3, 1)),  # open version → sk 2
            (104, 9, date(2026, 1, 1)),  # unknown key → NULL
        ],
        "tx long, product_id long, d date",
    )
    out = asof_join(
        facts,
        dim.select("product_id", "product_sk", "start_date", "end_date"),
        "product_id",
        "d",
        ["product_sk"],
    )
    got = {r["tx"]: r["product_sk"] for r in out.collect()}
    assert got == {100: 1, 101: 3, 102: None, 103: 2, 104: None}


def test_asof_boundary_dates(spark):
    """Interval boundaries are inclusive on both ends (reference
    start_date <= d AND end_date >= d, ETL/etl.py:330-331)."""
    dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
    facts = spark.createDataFrame(
        [(1, 1, date(2026, 1, 31)), (2, 1, date(2026, 2, 1)), (3, 1, date(2026, 1, 1))],
        "tx long, product_id long, d date",
    )
    out = asof_join(
        facts,
        dim.select("product_id", "product_sk", "start_date", "end_date"),
        "product_id",
        "d",
        ["product_sk"],
    )
    got = {r["tx"]: r["product_sk"] for r in out.collect()}
    assert got == {1: 1, 2: 3, 3: 1}


def test_join_current_version(spark):
    dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
    facts = spark.createDataFrame([(1,), (2,), (9,)], "product_id long")
    out = join_current_version(facts, dim, "product_id", ["product_sk"])
    got = {r["product_id"]: r["product_sk"] for r in out.collect()}
    assert got == {1: 3, 2: 2, 9: None}


def test_semi_anti_complement(spark, sf_dir):
    import os

    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    n_semi = semi_join(c, o, "c_custkey").count()
    n_anti = anti_join(c, o, "c_custkey").count()
    assert n_semi + n_anti == c.count()


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, v long, tag string"
    )
    out = latest_per_key(df, ["k"], "v")
    got = {r["k"]: r["tag"] for r in out.collect()}
    assert got == {1: "b", 2: "c"}

def test_fuzzy_match_join_planted(spark):
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        fuzzy_match_join,
    )

    canon = spark.createDataFrame(
        [(1, "Customer#000000101"), (2, "Customer#000000102"),
         (3, "Customer#000000103")],
        "cid long, cname string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "Cutomer#000000101"),    # deletion, dist 1 -> cid 1
            (20, "Kustomer#000000102"),   # substitution, dist 1 -> cid 2
            (30, "CCCustomer#00000103"),  # same block, dist 3 -> dropped
            (40, "Customer#000XXXXXX"),   # block key matches nothing
        ],
        "did long, dname string",
    )
    out = {
        r["did"]: (r["cid"], r["distance"])
        for r in fuzzy_match_join(
            dirty, canon, "did", "dname", "cid", "cname",
            block=lambda c: F.substring(c, -6, 6), max_distance=2,
        ).collect()
    }
    assert out == {10: (1, 1), 20: (2, 1)}


def test_fuzzy_match_join_tie_breaks_min_id(spark):
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        fuzzy_match_join,
    )

    # two canonical rows in the same block at equal distance: keep min id
    canon = spark.createDataFrame(
        [(7, "ax-123456"), (5, "ay-123456")], "cid long, cname string"
    )
    dirty = spark.createDataFrame([(1, "az-123456")], "did long, dname string")
    out = fuzzy_match_join(
        dirty, canon, "did", "dname", "cid", "cname",
        block=lambda c: F.substring(c, -6, 6), max_distance=2,
    ).collect()
    assert [(r["did"], r["cid"], r["distance"]) for r in out] == [(1, 5, 1)]


def test_fuzzy_match_join_random_invariants(spark):
    """Random corruptions: every emitted match respects max_distance and
    is the true (distance, id)-minimum among same-block candidates."""
    import random

    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        fuzzy_match_join,
    )

    rng = random.Random(5)
    canon = [(i, f"entity-{rng.randrange(10)}-{i:06d}") for i in range(80)]
    dirty = []
    for did in range(40):
        cid, name = canon[rng.randrange(len(canon))]
        pos = rng.randrange(max(len(name) - 7, 1))
        mutated = name[:pos] + rng.choice("xyz") + name[pos + 1:]
        dirty.append((did, mutated))
    cdf = spark.createDataFrame(canon, "cid long, cname string")
    ddf = spark.createDataFrame(dirty, "did long, dname string")
    out = {
        r["did"]: (r["cid"], r["distance"])
        for r in fuzzy_match_join(
            ddf, cdf, "did", "dname", "cid", "cname",
            block=lambda c: F.substring(c, -6, 6), max_distance=2,
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for did, dname in dirty:
        cands = [
            (lev(dname, cname), cid)
            for cid, cname in canon
            if cname[-6:] == dname[-6:] and lev(dname, cname) <= 2
        ]
        if cands:
            assert out[did] == tuple(reversed(min(cands))), (did, dname)
        else:
            assert did not in out


def test_bloom_semi_join_exact_and_effective(spark):
    """bloom_semi_join must equal a plain semi join (no false negatives —
    the exact join removes Bloom false positives), and the Bloom
    PRE-filter alone must kill most non-matching rows (the point: less
    shuffle input at scale). Also pins the bounded-collect contract of
    the bitmap build (8 KiB of words, never the key set)."""
    from ecommerce_full_etl_process_spark.operators.joins import (
        bloom_semi_join,
        build_bloom_bitmap,
    )

    facts = spark.range(0, 20_000).selectExpr("id AS k", "id * 2 AS v")
    # 500 keys, only half of which exist in facts
    keys = spark.range(0, 1_000).selectExpr("id * 40 AS k")

    got = bloom_semi_join(facts, keys, "k")
    exact = facts.join(keys, "k", "left_semi")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in exact.collect()
    )

    # false-positive effectiveness: with 2^16 bits / ~1000 keys / k=5 the
    # FP rate is well under 1%; candidates should be close to true hits
    bitmap = build_bloom_bitmap(keys, "k")
    assert len(bitmap) == (1 << 16) // 64  # bounded driver payload
    n_true = exact.count()
    # rebuild the candidate-only frame by filtering with a huge exact join
    # avoided: candidates = rows surviving the bitmap test
    from pyspark.sql import functions as F

    # reuse the operator's internals through its public result is enough:
    # assert selectivity by comparing counts via a 1-key-missing probe
    misses = spark.range(0, 100).selectExpr("id * 40 + 7 AS k")  # none present
    none = bloom_semi_join(facts, keys, "k").join(misses, "k", "left_semi")
    assert none.count() == 0
    assert n_true == 500


def test_bloom_prefilter_selectivity(spark):
    """Direct measurement of the Bloom candidate set: FP rate < 1% at
    10 bits/key, so ≥99% of non-matching fact rows never reach the
    exact-join shuffle."""
    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        build_bloom_bitmap,
    )

    n_keys = 5_000
    keys = spark.range(0, n_keys).selectExpr("id * 3 AS k")
    bitmap = build_bloom_bitmap(keys, "k", num_bits=1 << 16, k=5)
    lit_words = F.array(*[F.lit(w).cast("long") for w in bitmap])
    probe = spark.range(0, 50_000).selectExpr("id + 1000000 AS k")  # disjoint
    tmp = probe
    conds = []
    for i in range(5):
        pos = F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(1 << 16))
        tmp = tmp.withColumn(
            f"w{i}", F.element_at(lit_words, (pos / 64).cast("int") + 1)
        ).withColumn(f"b{i}", (pos % 64).cast("int"))
        conds.append(F.expr(f"getbit(w{i}, b{i})") == 1)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    fp = tmp.where(cond).count()
    assert fp / 50_000 < 0.01, f"false-positive rate too high: {fp}/50000"


# ---------------------------------------------------------------------------
# asof_merge_join — fanout-free merged-timeline as-of (round 7)
# ---------------------------------------------------------------------------

def _merge_fixture(spark):
    from datetime import datetime

    events = spark.createDataFrame(
        [
            (1, 10, datetime(2026, 3, 5, 12, 0)),   # after o2 → o2
            (2, 10, datetime(2026, 3, 1, 0, 0)),    # ON o1's date → o1
            (3, 10, datetime(2026, 2, 1, 0, 0)),    # before any order → none
            (4, 11, datetime(2026, 3, 10, 9, 0)),   # tie date: max key wins
            (5, 12, datetime(2026, 3, 1, 0, 0)),    # user with no orders
        ],
        "event_id long, user_id long, ts timestamp",
    )
    orders = spark.createDataFrame(
        [
            (100, 10, date(2026, 3, 1)),   # o1
            (101, 10, date(2026, 3, 4)),   # o2
            (200, 11, date(2026, 3, 2)),   # same-date pair: 201 must win
            (201, 11, date(2026, 3, 2)),
        ],
        "o_orderkey long, user_id long, o_orderdate date",
    )
    return events, orders


def test_asof_merge_join_semantics(spark):
    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
    )

    events, orders = _merge_fixture(spark)
    out = asof_merge_join(
        events, orders, "user_id", "ts", "o_orderdate", ["o_orderkey"]
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    # inner: events 3 (before history) and 5 (no orders) are dropped;
    # event 2 sees the order dated AT its timestamp (inclusive bound);
    # event 4's same-date tie resolves to the greater key (DESC,DESC)
    assert got == {1: 101, 2: 100, 4: 201}


def test_asof_merge_join_left_keeps_unmatched(spark):
    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
    )

    events, orders = _merge_fixture(spark)
    out = asof_merge_join(
        events, orders, "user_id", "ts", "o_orderdate", ["o_orderkey"],
        how="left",
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    assert got == {1: 101, 2: 100, 3: None, 4: 201, 5: None}


def test_asof_merge_join_rejects_column_clash(spark):
    import pytest

    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
    )

    events, orders = _merge_fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_merge_join(
            events.withColumnRenamed("event_id", "o_orderkey"),
            orders, "user_id", "ts", "o_orderdate", ["o_orderkey"],
        )


def test_asof_merge_matches_candidate_join_form(spark, sf_dir):
    """The two J3 physical strategies must agree bit-for-bit on real
    data (sf0.001: 1k events × 1.5k orders with genuine fanout)."""
    from ecommerce_full_etl_process_spark.plans import operator_queries as oq

    a = oq.asof_events_to_orders_fanout(spark, sf_dir)
    b = oq.asof_events_to_orders_merge(spark, sf_dir)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count()


def test_asof_merge_plan_single_exchange(spark, sf_dir):
    """The merged-timeline form must plan exactly ONE hash exchange (the
    window key) — the whole point vs the candidate-join fanout."""
    import re

    from ecommerce_full_etl_process_spark.plans import operator_queries as oq

    plan = (
        oq.asof_events_to_orders_merge(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n == 1, f"expected 1 exchange, planned {n}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_asof_merge_randomized_differential(spark, seed):
    """Seeded randomized differential: merge strategy vs candidate-join
    argmax on adversarial timelines — dense ties (many orders on one
    date, events exactly AT order dates), users with no orders, orders
    with no events. Both forms must agree row-for-row."""
    import random
    from datetime import date, datetime, timedelta

    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
    )

    rng = random.Random(seed)
    base = date(2026, 1, 1)
    orders = [
        (
            100 + i,
            rng.randrange(8),  # few users -> dense per-user timelines
            base + timedelta(days=rng.randrange(10)),  # 10 dates -> ties
        )
        for i in range(60)
    ]
    events = [
        (
            i,
            rng.randrange(10),  # users 8,9 have no orders
            datetime(2026, 1, 1)
            + timedelta(
                days=rng.randrange(12), hours=rng.choice([0, 0, 6, 23])
            ),  # hour 0 lands exactly ON order dates (inclusive bound)
        )
        for i in range(80)
    ]
    odf = spark.createDataFrame(
        orders, "o_orderkey long, user_id long, o_orderdate date"
    )
    edf = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp"
    )

    merge = asof_merge_join(
        edf, odf, "user_id", "ts", "o_orderdate", ["o_orderkey"], how="inner"
    ).select("event_id", "user_id", "o_orderkey")
    fanout = (
        edf.join(odf, "user_id")
        .where(F.col("o_orderdate") <= F.col("ts"))
        .groupBy("event_id", "user_id")
        .agg(
            F.max(F.struct("o_orderdate", "o_orderkey"))[
                "o_orderkey"
            ].alias("o_orderkey")
        )
    )
    assert merge.exceptAll(fanout).count() == 0
    assert fanout.exceptAll(merge).count() == 0
    assert merge.count() == fanout.count()


@pytest.mark.parametrize("bucket_seconds", [1, 3600, 86400, 10_000_000])
def test_asof_skewed_equals_plain_merge(spark, bucket_seconds):
    """The two-phase (skew-safe) merge as-of must equal the plain merge
    form for ANY bucket size — including degenerate 1-second buckets
    (every row its own bucket → pure phase-2 path) and one huge bucket
    (pure phase-1 path)."""
    import random
    from datetime import date, datetime, timedelta

    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
        asof_merge_join_skewed,
    )

    rng = random.Random(7)
    orders = [
        (100 + i, rng.randrange(6), date(2026, 1, 1)
         + timedelta(days=rng.randrange(8)))
        for i in range(50)
    ]
    events = [
        (i, rng.randrange(8), datetime(2026, 1, 1)
         + timedelta(days=rng.randrange(10), hours=rng.choice([0, 5, 23])))
        for i in range(70)
    ]
    odf = spark.createDataFrame(
        orders, "o_orderkey long, user_id long, o_orderdate date"
    )
    edf = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp"
    )
    for how in ("inner", "left"):
        plain = asof_merge_join(
            edf, odf, "user_id", "ts", "o_orderdate", ["o_orderkey"], how=how
        )
        skewed = asof_merge_join_skewed(
            edf, odf, "user_id", "ts", "o_orderdate", ["o_orderkey"],
            how=how, bucket_seconds=bucket_seconds,
        )
        assert plain.exceptAll(skewed).count() == 0, (how, bucket_seconds)
        assert skewed.exceptAll(plain).count() == 0, (how, bucket_seconds)


def test_asof_skewed_single_data_exchange(spark, sf_dir):
    """The skew-safe form must keep exactly ONE data-sized exchange (the
    (key, bucket) hash); the extra exchanges operate on bucket-level
    rows only. We assert the total exchange count stays bounded (<=3)
    and that the first (data) exchange is keyed by key+bucket — the
    property that actually splits a hot key."""
    import re

    from pyspark.sql import functions as F

    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join_skewed,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    df = asof_merge_join_skewed(
        e, o, "user_id", "ts", "o_orderdate", ["o_orderkey"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n <= 3, f"too many exchanges ({n}):\n{plan}"
    assert re.search(
        r"Exchange hashpartitioning\(user_id#\d+L, __bkt#\d+L", plan
    ), "data exchange must be keyed by (key, bucket) to split hot keys"


def test_asof_skewed_hot_key(spark):
    """A single user owning 90% of all rows (the straggler scenario) —
    results must still match the plain form exactly."""
    import random
    from datetime import date, datetime, timedelta

    from ecommerce_full_etl_process_spark.operators.joins import (
        asof_merge_join,
        asof_merge_join_skewed,
    )

    rng = random.Random(11)
    hot = 0
    orders = [
        (i, hot if i % 10 else 1, date(2026, 1, 1)
         + timedelta(days=rng.randrange(30)))
        for i in range(300)
    ]
    events = [
        (i, hot if i % 10 else 1, datetime(2026, 1, 1)
         + timedelta(days=rng.randrange(32), hours=rng.randrange(24)))
        for i in range(400)
    ]
    odf = spark.createDataFrame(
        orders, "o_orderkey long, user_id long, o_orderdate date"
    )
    edf = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp"
    )
    plain = asof_merge_join(
        edf, odf, "user_id", "ts", "o_orderdate", ["o_orderkey"]
    )
    skewed = asof_merge_join_skewed(
        edf, odf, "user_id", "ts", "o_orderdate", ["o_orderkey"],
        bucket_seconds=86400,
    )
    assert plain.exceptAll(skewed).count() == 0
    assert skewed.exceptAll(plain).count() == 0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_range_bucket_join_randomized_differential(spark, seed):
    """Seeded randomized differential: range_bucket_join vs the naive
    inequality join it replaces, on adversarial data — points exactly ON
    interval bounds, zero-length intervals, intervals spanning many
    buckets, sub-second points (bucket over-generation path), keys with
    no matches, duplicate timestamps. Every (lo_open, hi_open) bound
    combination must agree row-for-row with the literal BETWEEN plan."""
    import random
    from datetime import datetime, timedelta

    from ecommerce_full_etl_process_spark.operators.joins import (
        range_bucket_join,
    )

    rng = random.Random(seed)
    base = datetime(2026, 1, 1)
    width = 3600  # 1-hour buckets
    lefts = []
    for i in range(80):
        lo = base + timedelta(
            seconds=rng.randrange(0, 7 * 86400),
            microseconds=rng.choice([0, 1, 500_000]),
        )
        # zero-length, sub-bucket, and multi-bucket intervals
        dur = rng.choice([0, 1, 59, width - 1, width, 3 * width + 7])
        lefts.append((i, rng.randrange(6), lo, lo + timedelta(seconds=dur)))
    rights = []
    for j in range(300):
        ts = base + timedelta(
            seconds=rng.randrange(0, 7 * 86400),
            microseconds=rng.choice([0, 1, 999_999]),
        )
        rights.append((j, rng.randrange(8), ts))  # keys 6,7 never match
    # align some points exactly onto interval bounds (boundary semantics)
    for i in range(0, 40, 5):
        rights[i] = (rights[i][0], lefts[i][1], lefts[i][2])
        rights[i + 1] = (rights[i + 1][0], lefts[i][1], lefts[i][3])
    ldf = spark.createDataFrame(
        lefts, "lid long, k long, lo timestamp_ntz, hi timestamp_ntz"
    )
    rdf = spark.createDataFrame(
        rights, "rid long, k long, ts timestamp_ntz"
    )
    for lo_open in (False, True):
        for hi_open in (False, True):
            got = sorted(
                (r["lid"], r["rid"])
                for r in range_bucket_join(
                    ldf,
                    rdf,
                    ["k"],
                    F.col("lo"),
                    F.col("hi"),
                    F.col("ts"),
                    bucket_width_seconds=width,
                    lo_open=lo_open,
                    hi_open=hi_open,
                ).collect()
            )
            lo_ok = (
                F.col("ts") > F.col("lo")
                if lo_open
                else F.col("ts") >= F.col("lo")
            )
            hi_ok = (
                F.col("ts") < F.col("hi")
                if hi_open
                else F.col("ts") <= F.col("hi")
            )
            naive = sorted(
                (r["lid"], r["rid"])
                for r in ldf.join(rdf, "k").where(lo_ok & hi_ok).collect()
            )
            assert got == naive, (seed, lo_open, hi_open)
