"""Bounded-state frequency analysis: exact heavy hitters via Misra-Gries
candidate generation + exact rescore.

Beyond-reference operator family (the reference engine has no frequency
sketches; the closest surface is its GROUP BY/ORDER BY report queries,
``/root/reference/ETL/etl.py`` aggregate section). The 100 TB problem it
solves: a raw ``groupBy(term).count()`` over a web-scale corpus shuffles
the ENTIRE vocabulary — billions of distinct n-grams, most with count 1 —
when the consumer only wants the handful of globally frequent terms
(stop-word discovery, boilerplate detection, tokenizer-vocab seeding).

Misra-Gries gives the candidate set with bounded state and NO shuffle:
each partition streams its tokens through at most ``k`` counters
(decrement-all when full), and by the pigeonhole argument any term with
global count > N/(k+1) must survive in at least one partition's counter
set — if it were evicted everywhere, each partition would have absorbed
more than N_p/(k+1) decrements, summing past N/(k+1) ≥ its own count.
The union of per-partition survivors (≤ k × partitions rows, kilobytes)
is therefore a SUPERSET of the true heavy hitters; one exact
broadcast-semi-filtered aggregate over the token stream then rescores
only those candidates, and the final integer-exact threshold filter
makes the result EXACT — same answer as the full-vocabulary groupBy,
with the corpus-scale shuffle replaced by a candidate-sized one.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitter_terms", "misra_gries_candidates"]


def _tokens(text_col: str):
    # whitespace tokens of the lowercased text; empty strings dropped.
    # Mirrored exactly by the oracle's string_split(lower(text), ' ').
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )


def misra_gries_candidates(
    df: DataFrame, text_col: str, k: int, ngram: int = 1
) -> DataFrame:
    """Per-partition Misra-Gries survivors plus partition term totals.

    Arrow-batched ``mapInPandas``; state is a dict of at most ``k``
    counters per partition regardless of corpus size (the whole point —
    nothing vocabulary-sized is ever held or shuffled). Terms are
    space-joined word ``ngram``s of the JVM-lowercased, empty-filtered
    token stream (lowercasing happens via ``F.lower`` BEFORE the kernel
    so the candidate strings and the rescore's terms come from the SAME
    case-folding — Python ``str.lower`` differs from the JVM's on a few
    Unicode code points, which could otherwise break the superset
    guarantee). Output rows: ``(term, cnt)`` for
    each surviving counter, plus one ``(NULL, n)`` marker row per
    batch-stream carrying the partition's term count so the caller can
    compute the global N without a second corpus scan. Surviving ``cnt``
    values are MG lower bounds — diagnostics only, never the final
    answer (the caller rescores exactly).
    """
    if k < 1:
        # k=0 would silently yield an empty counter set → empty result,
        # a silent wrong answer instead of a loud contract violation
        raise ValueError(f"misra_gries_candidates requires k >= 1, got {k}")

    def _mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        n_terms = 0
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                toks = [t for t in str(text).split(" ") if t]
                for i in range(len(toks) - ngram + 1):
                    term = " ".join(toks[i : i + ngram])
                    n_terms += 1
                    if term in counters:
                        counters[term] += 1
                    elif len(counters) < k:
                        counters[term] = 1
                    else:
                        # decrement-all; drop zeros. Amortized O(1) per
                        # term: each decrement pass removes k+1 "units"
                        # that each took one increment to add.
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "cnt": [int(c) for c in counters.values()] + [n_terms],
            }
        )

    return (
        df.select(F.lower(F.col(text_col)).alias(text_col))
        .mapInPandas(_mg, schema="term string, cnt long")
    )


def heavy_hitter_terms(
    df: DataFrame, text_col: str, k: int = 200, ngram: int = 1
) -> DataFrame:
    """EXACT heavy hitters: every word-``ngram`` whose global occurrence
    count strictly exceeds N/(k+1), with its exact count.

    Plan shape: one bounded-state MG map pass (no shuffle) → a
    kilobyte-sized candidate set → one exploded-term aggregate that a
    broadcast semi join prunes to candidate terms only, so the groupBy
    shuffles ≤ candidates × partitions rows instead of the vocabulary →
    integer-exact threshold (``count · (k+1) > N`` — no float division,
    so Spark and the oracle agree on boundary ties). Correct by
    construction: the MG superset guarantee means no true heavy hitter
    can be missing, and the exact rescore removes every false candidate.

    Round-13 opt: the corpus is spread to the cluster's parallelism
    when the source is under-partitioned (a single small parquet file
    read as ONE split) — the MG kernel is per-partition bounded state
    and the rescore's n-gram explode is per-row, so both stages were
    running SERIALLY in that case (measured at sf0.1: one 2.3 s
    single-task stage). MG survivors per partition change with the
    partitioning, but the result does not: the superset guarantee holds
    for any partitioning and the exact rescore + threshold make the
    output identical. At 100 TB the scan's natural splits already
    provide the parallelism and the repartition is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.select(text_col).repartition(target)
    mg = misra_gries_candidates(df, text_col, k, ngram).localCheckpoint(
        eager=True
    )
    total = mg.where(F.col("term").isNull()).agg(
        F.sum("cnt").alias("n_total")
    )
    candidates = mg.where(F.col("term").isNotNull()).select("term").distinct()
    ws = _tokens(text_col)
    if ngram == 1:
        grams = ws
    else:
        grams = F.when(
            F.size(ws) >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (ngram - 1)),
                lambda i: F.concat_ws(
                    " ", F.slice(ws, i, F.lit(ngram))
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    terms = df.select(F.explode(grams).alias("term"))
    return (
        terms.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * (k + 1) > F.col("n_total"))
        .select("term", "n_occurrences")
    )
