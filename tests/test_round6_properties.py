"""Seeded property-style tests for the round-6 operators (same
randomized-scenario pattern as test_scd2_properties): Bloom semi join
exactness and keep-best retention invariants under random inputs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators import dedup as D
from ecommerce_full_etl_process_spark.operators.joins import (
    bloom_semi_join,
    build_bloom_bitmap,
)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_bloom_semi_join_equals_plain_semi_join(spark, seed):
    """For ANY key/fact sets the bloom path must return exactly the plain
    semi join's rows: the bitmap can only over-approximate (no false
    negatives by construction — every true key sets its own bits) and the
    trailing exact join removes the over-approximation."""
    rng = random.Random(seed)
    keys = sorted(rng.sample(range(0, 100_000), rng.randint(50, 2_000)))
    facts = sorted(rng.sample(range(0, 100_000), 5_000))
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    fdf = spark.createDataFrame([(f,) for f in facts], "k long")
    got = sorted(r["k"] for r in bloom_semi_join(fdf, kdf, "k").collect())
    want = sorted(set(facts) & set(keys))
    assert got == want


@pytest.mark.parametrize("seed", [3, 11])
def test_bloom_bitmap_contains_every_true_key(spark, seed):
    """Membership completeness: every inserted key passes all k bit
    tests (the no-false-negative half of the Bloom contract)."""
    rng = random.Random(seed)
    num_bits, k = 1 << 14, 5
    keys = rng.sample(range(0, 10_000_000), 1_000)
    kdf = spark.createDataFrame([(x,) for x in keys], "k long")
    bitmap = build_bloom_bitmap(kdf, "k", num_bits=num_bits, k=k)
    lit_words = F.array(*[F.lit(w).cast("long") for w in bitmap])
    tmp = kdf
    conds = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(num_bits))
        tmp = tmp.withColumn(
            f"w{i}", F.element_at(lit_words, (pos / 64).cast("int") + 1)
        ).withColumn(f"b{i}", (pos % 64).cast("int"))
        conds.append(F.expr(f"getbit(w{i}, b{i})") == 1)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    assert tmp.where(cond).count() == len(set(keys))


@pytest.mark.parametrize("seed", [5, 19])
def test_keep_best_invariants_random_corpus(spark, seed):
    """Random corpora with planted near-dup clusters: (a) exactly one
    keep per component, (b) the keeper maximizes (quality, -id) within
    its component, (c) the component partition matches the min-id keep
    list's partition on the same corpus."""
    rng = random.Random(seed)
    words = [f"tok{i}" for i in range(300)]
    rows = []
    next_id = 0
    for _c in range(rng.randint(4, 8)):
        base = " ".join(rng.choice(words) for _ in range(40)) + f" u{next_id}"
        size = rng.randint(1, 4)
        for j in range(size):
            # progressively truncate so members differ but stay near-dups
            text = " ".join(base.split()[: 40 - j]) if j else base
            rows.append((next_id, text))
            next_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    quality = F.length("text").cast("long")

    best = D.corpus_dedup_keep_best(df, "doc_id", "text", quality).collect()
    by_comp: dict[int, list] = {}
    for r in best:
        by_comp.setdefault(r["comp"], []).append(r)
    for comp, members in by_comp.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1, f"component {comp}: {len(keeps)} keeps"
        winner = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert keeps[0]["doc_id"] == winner["doc_id"]

    minid = D.corpus_dedup_keep_list(df, "doc_id", "text").collect()
    part_best = {r["doc_id"]: r["comp"] for r in best}
    part_min = {r["node"] if "node" in r else r["doc_id"]: r["comp"] for r in minid}
    assert part_best == part_min  # same clustering, different retention

def test_keep_best_string_ids_and_null_quality(spark):
    """Round-7 ADVICE fix: keep-best must work with string ids (no
    numeric-negation trick) and a null quality must not win unless the
    whole cluster is null-quality (then min-id retention applies)."""
    base = " ".join(f"tok{i}" for i in range(40))
    trunc = " ".join(base.split()[:39])
    trunc2 = " ".join(base.split()[:38])
    other = " ".join(f"zzz{i}" for i in range(40))
    other_t = " ".join(other.split()[:39])
    rows = [
        # cluster 1: null quality on the longest doc — must NOT win
        ("doc-a", base, None),
        ("doc-b", trunc, 10),
        ("doc-c", trunc2, 7),
        # cluster 2: all-null quality -> min string id wins
        ("x-2", other, None),
        ("x-1", other_t, None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, q long")
    out = D.corpus_dedup_keep_best(df, "doc_id", "text", "q").collect()
    keeps = sorted(r["doc_id"] for r in out if r["keep"])
    assert keeps == ["doc-b", "x-1"]
    # exactly one keep per component
    comps = {}
    for r in out:
        comps.setdefault(r["comp"], 0)
        comps[r["comp"]] += int(r["keep"])
    assert all(v == 1 for v in comps.values())

def test_bloom_large_bitmap_broadcast_path(spark):
    """Round-7 fix: num_bits ≥ 2^22 must (a) stay bit-identical to the
    plain semi join and (b) ship the bitmap as a broadcast variable read
    by an Arrow pandas_udf — NOT a multi-MiB plan literal serialized
    into every task binary."""
    rng = random.Random(42)
    keys = sorted(rng.sample(range(0, 1_000_000), 3_000))
    facts = sorted(rng.sample(range(0, 1_000_000), 20_000))
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    fdf = spark.createDataFrame([(f,) for f in facts], "k long")
    out = bloom_semi_join(fdf, kdf, "k", num_bits=1 << 22)
    got = sorted(r["k"] for r in out.collect())
    assert got == sorted(set(facts) & set(keys))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # broadcast+pandas_udf probe
    # 2^22 bits = 65536 longs; a literal would dwarf any sane plan string
    assert len(plan) < 200_000


def test_bloom_auto_sizing_and_guard(spark):
    """Auto num_bits tracks the key count (~10 bits/key, pow-2, floor
    2^14) and the broadcast ceiling raises instead of silently building
    an unshippable bitmap."""
    from ecommerce_full_etl_process_spark.operators.joins import (
        _bloom_auto_bits,
    )

    assert _bloom_auto_bits(10) == 1 << 14
    assert _bloom_auto_bits(2_000) == 1 << 15  # 20k bits -> 32768
    assert _bloom_auto_bits(90_000) == 1 << 20  # 900k bits -> 1M: no saturation
    assert _bloom_auto_bits(10**12) == 1 << 30  # capped
    kdf = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_semi_join(kdf, kdf, "k", num_bits=1 << 31)
