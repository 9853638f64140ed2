"""Heavy-hitter operator (operators/frequency.py) unit + property tests.

The contract under test: ``heavy_hitter_terms`` is EXACT — identical to
the brute-force full-vocabulary groupBy it replaces — for any corpus,
any partitioning, and any k, because the Misra-Gries candidate set is a
pigeonhole-guaranteed superset of the true heavy hitters and the rescore
is exact. Randomized corpora deliberately include Zipf-like skew, empty
strings, NULLs, multi-space runs, and case variation.
"""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators.frequency import (
    heavy_hitter_terms,
    misra_gries_candidates,
)


def _brute(texts: list[str | None], k: int, ngram: int) -> dict[str, int]:
    counts: Counter[str] = Counter()
    total = 0
    for t in texts:
        if t is None:
            continue
        toks = [w for w in t.lower().split(" ") if w]
        for i in range(len(toks) - ngram + 1):
            counts[" ".join(toks[i : i + ngram])] += 1
            total += 1
    return {
        term: c for term, c in counts.items() if c * (k + 1) > total
    }


def _random_corpus(rng: random.Random, n_docs: int) -> list[str | None]:
    # Zipf-ish vocabulary: a few very hot words, a long unique tail
    hot = ["the", "data", "spark"]
    warm = [f"w{i}" for i in range(20)]
    docs: list[str | None] = []
    for d in range(n_docs):
        n_words = rng.randint(0, 30)
        words = []
        for _ in range(n_words):
            r = rng.random()
            if r < 0.35:
                words.append(rng.choice(hot))
            elif r < 0.7:
                words.append(rng.choice(warm))
            else:
                words.append(f"rare{d}_{rng.randint(0, 10 ** 6)}")
        text = " ".join(words)
        # inject whitespace pathologies and case variation
        if rng.random() < 0.2:
            text = text.replace(" ", "   ", 1)
        if rng.random() < 0.2:
            text = text.upper()
        docs.append(text if rng.random() > 0.05 else None)
    return docs


def test_exact_vs_bruteforce_randomized(spark):
    rng = random.Random(7)
    for trial in range(4):
        texts = _random_corpus(rng, 120)
        k = rng.choice([5, 10, 40])
        ngram = rng.choice([1, 2])
        df = spark.createDataFrame(
            [(t,) for t in texts], "text string"
        ).repartition(rng.choice([1, 3, 8]))
        got = {
            r["term"]: r["n_occurrences"]
            for r in heavy_hitter_terms(df, "text", k=k, ngram=ngram).collect()
        }
        assert got == _brute(texts, k, ngram), (trial, k, ngram)


def test_candidates_are_superset_even_when_state_overflows(spark):
    # vocabulary (≈300 distinct) far exceeds k=8 counters, forcing the
    # decrement-all eviction path; the true heavy hitter must survive
    texts = []
    for i in range(300):
        texts.append(f"hot filler{i} filler{i + 1000}")
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    mg = misra_gries_candidates(df.coalesce(1), "text", k=8)
    cand = {r["term"] for r in mg.collect() if r["term"] is not None}
    assert len(cand) <= 8
    assert "hot" in cand  # 300 of 900 tokens — global count >> N/9
    got = {
        r["term"]: r["n_occurrences"]
        for r in heavy_hitter_terms(df, "text", k=8).collect()
    }
    assert got == {"hot": 300}


def test_marker_rows_carry_exact_token_total(spark):
    texts = ["a b c", "", None, "  d   e "]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    mg = misra_gries_candidates(df, "text", k=10)
    total = (
        mg.where(F.col("term").isNull())
        .agg(F.sum("cnt").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 5  # a b c d e — empties and NULL contribute nothing


def test_threshold_boundary_is_strict(spark):
    # 9 tokens, k=2 → threshold N/(k+1) = 3 exactly; a count of exactly
    # 3 must NOT qualify (strict >), 4 must. Integer math on both sides.
    texts = ["x x x y y y y", "z z"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["term"]: r["n_occurrences"]
        for r in heavy_hitter_terms(df, "text", k=2).collect()
    }
    assert got == {"y": 4}
