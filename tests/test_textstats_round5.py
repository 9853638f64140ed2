"""Unit tests for the round-5 curation operators: Gopher repetition
signals, PII scrubbing, C4-style global line dedup, int8 quantization —
planted inputs with hand-computed expectations (the catalog oracle mirror
in test_catalog_oracle.py covers the corpus-scale cross-engine check)."""

from __future__ import annotations

import math

from ecommerce_full_etl_process_spark.operators import textstats as T
from ecommerce_full_etl_process_spark.operators.quantize import quantize_int8


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # pure loop
            (2, "w x y z"),          # no repetition
            (3, "hi"),               # single word: no grams
            (4, "p q p q p q"),      # period-2 loop
        ],
        "doc_id long, text string",
    )
    out = _rows(T.repetition_stats(df, "doc_id", "text"))

    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["distinct_word_frac"] == 0.25
    assert r1["top_bigram_frac"] == 1.0          # all 3 bigrams are "a a"
    assert r1["dup_trigram_frac"] == 0.5         # 2 trigrams, 1 distinct

    r2 = out[2]
    assert r2["distinct_word_frac"] == 1.0
    assert r2["top_bigram_frac"] == round(1 / 3, 6)
    assert r2["dup_trigram_frac"] == 0.0

    r3 = out[3]
    assert (r3["top_bigram_frac"], r3["dup_trigram_frac"]) == (0.0, 0.0)

    r4 = out[4]
    # bigrams: pq qp pq qp pq → top "p q" covers 3/5
    assert r4["top_bigram_frac"] == 0.6
    # trigrams: pqp qpq pqp qpq → 2 distinct of 4
    assert r4["dup_trigram_frac"] == 0.5


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org and 10.1.2.3 plus 1.2.3.4"),
            (2, "ssn 987-65-4321 inline"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = _rows(T.pii_scrub(df, "doc_id", "text"))

    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_ssn"]) == (1, 2, 0)
    assert r1["redacted"] == "mail <EMAIL> and <IP> plus <IP>"

    r2 = out[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_ssn"]) == (0, 0, 1)
    assert r2["redacted"] == "ssn <SSN> inline"

    r3 = out[3]
    assert (r3["n_email"], r3["n_ipv4"], r3["n_ssn"]) == (0, 0, 0)
    assert r3["redacted"] == "clean text only"


def test_pii_email_consumes_dotted_digits_before_ip_rule(spark):
    """Sequencing: digits dotted inside an email must not double-count as
    an IPv4 once the email is redacted."""
    df = spark.createDataFrame(
        [(1, "x 10.2.3.4@h.example.com y")], "doc_id long, text string"
    )
    r = _rows(T.pii_scrub(df, "doc_id", "text"))[1]
    assert (r["n_email"], r["n_ipv4"]) == (1, 0)
    assert r["redacted"] == "x <EMAIL> y"


def test_line_dedup_keeps_first_occurrence_globally(spark):
    df = spark.createDataFrame(
        [
            (1, "x\ny\nz"),
            (2, "y\nw"),     # y already seen in doc 1
            (3, "y\nx"),     # everything already seen → empty doc
            (4, "q\nq"),     # in-doc duplicate: keep first only
        ],
        "doc_id long, text string",
    )
    out = _rows(T.line_dedup(df, "doc_id", "text"))

    assert out[1]["cleaned_text"] == "x\ny\nz"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_removed"]) == (3, 0)
    assert out[2]["cleaned_text"] == "w"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_removed"]) == (1, 1)
    assert out[3]["cleaned_text"] == ""
    assert (out[3]["n_lines_kept"], out[3]["n_lines_removed"]) == (0, 2)
    assert out[4]["cleaned_text"] == "q"
    assert (out[4]["n_lines_kept"], out[4]["n_lines_removed"]) == (1, 1)


def test_line_dedup_preserves_within_doc_order(spark):
    df = spark.createDataFrame(
        [(1, "c\na\nb"), (2, "a\nd\nc\ne")], "doc_id long, text string"
    )
    out = _rows(T.line_dedup(df, "doc_id", "text"))
    assert out[1]["cleaned_text"] == "c\na\nb"   # original order, not sorted
    assert out[2]["cleaned_text"] == "d\ne"      # survivors keep their order


import pytest


@pytest.mark.parametrize("seed", [3, 11])
def test_line_dedup_properties_random_corpus(spark, seed):
    """Randomized invariants: every distinct corpus line survives exactly
    once; each doc's kept lines are a subsequence of its original lines;
    the surviving copy belongs to the smallest (doc_id, position) owner."""
    import random

    rng = random.Random(seed)
    pool = [f"line{i}" for i in range(12)]  # small pool → many collisions
    docs = [
        (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 8))))
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = _rows(T.line_dedup(df, "doc_id", "text"))

    orig = {i: t.split("\n") for i, t in docs}
    all_kept = []
    for i, lines in orig.items():
        r = out[i]
        kept = r["cleaned_text"].split("\n") if r["cleaned_text"] else []
        all_kept.extend(kept)
        assert r["n_lines"] == len(lines)
        assert r["n_lines_kept"] == len(kept)
        assert r["n_lines_removed"] == len(lines) - len(kept)
        it = iter(lines)  # subsequence check
        assert all(any(x == k for x in it) for k in kept)

    distinct = {ln for lines in orig.values() for ln in lines}
    assert sorted(all_kept) == sorted(distinct)  # each line exactly once

    # the surviving copy is the globally first occurrence
    first_owner = {}
    for i in sorted(orig):
        for pos, ln in enumerate(orig[i]):
            first_owner.setdefault(ln, i)
    for i in orig:
        kept = out[i]["cleaned_text"].split("\n") if out[i]["cleaned_text"] else []
        for ln in kept:
            assert first_owner[ln] == i


def test_bpe_pair_stats_planted(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab aaa")], "doc_id long, text string"
    )
    rows = [
        (r["pair"], r["n_occurrences"])
        for r in T.bpe_pair_stats(df, "text", top_k=10).collect()
    ]
    # ab appears 3× as a word (pair 'ab' ×3); 'aaa' contributes 'aa' twice
    # from ONE word occurrence; cd once. Order: count desc, pair asc.
    assert rows == [("ab", 3), ("aa", 2), ("cd", 1)]


def test_bpe_pair_stats_weighting_uses_word_frequency(spark):
    """The pair table must weight by word frequency, not distinct words:
    10 occurrences of 'xy' beat one occurrence of 'zw zw zw' collapsed."""
    df = spark.createDataFrame(
        [(1, " ".join(["xy"] * 10) + " zw")], "doc_id long, text string"
    )
    top = T.bpe_pair_stats(df, "text", top_k=1).collect()
    assert (top[0]["pair"], top[0]["n_occurrences"]) == ("xy", 10)


def test_corpus_prep_funnel_is_exhaustive(spark, sf_dir):
    """Every document lands in exactly one funnel stage: the per-source
    stage counts must sum to n_docs (oracle equality is covered by the
    catalog mirror; this pins the funnel algebra itself)."""
    from ecommerce_full_etl_process_spark.plans.llm_queries import (
        corpus_prep_pipeline,
    )

    for r in corpus_prep_pipeline(spark, sf_dir).collect():
        assert (
            r["n_quality_rejected"]
            + r["n_dup_removed"]
            + r["n_contaminated"]
            + r["n_final"]
            == r["n_docs"]
        )
        assert r["n_final"] > 0  # the synthetic corpus is not all-rejected
        assert r["tokens_final"] > 0


def test_repeated_span_stats_planted(spark):
    """A shared 8-gram embedded mid-document flags BOTH docs; repetition
    within a single doc does not count (cross-doc distinct-count ≥ 2)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [
            (1, f"{shared} u1 u2"),          # 3 grams, 1 repeated (leading)
            (2, f"v1 v2 {shared}"),          # 3 grams, 1 repeated (trailing)
            (3, "a b c d e f g h i j"),      # all unique → 0
            (4, " ".join(["w"] * 16)),       # in-doc repeats only → 0
        ],
        "doc_id long, text string",
    )
    out = _rows(T.repeated_span_stats(df, "doc_id", "text", n=8))
    assert (out[1]["n_grams"], out[1]["n_repeated"]) == (3, 1)
    assert out[1]["repeated_frac"] == round(1 / 3, 6)
    assert (out[2]["n_grams"], out[2]["n_repeated"]) == (3, 1)
    assert (out[3]["n_grams"], out[3]["n_repeated"]) == (3, 0)
    assert (out[4]["n_grams"], out[4]["n_repeated"]) == (9, 0)


def test_quantize_int8_planted(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.54, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = _rows(quantize_int8(df, "vec_id", "embedding"), key="vec_id")

    r1 = out[1]
    scale = 2.54 / 127.0  # = 0.02
    assert r1["dim"] == 3
    assert r1["scale"] == round(scale, 6)
    assert r1["max_q"] == 127  # the max-|x| element always hits ±127
    # q = [50, -127, 0] → errors [1-50*0.02=0, 0, 0] → rmse 0 (within fp noise)
    assert r1["rmse"] <= 1e-6

    r2 = out[2]  # zero vector: floor scale, zero error, zero levels
    assert r2["max_q"] == 0
    assert r2["rmse"] == 0.0


def test_quantize_int8_error_bound(spark):
    """Quantization error per element is ≤ scale/2, so rmse ≤ scale/2."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(64)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in quantize_int8(df, "vec_id", "embedding").collect():
        assert r["max_q"] <= 127
        assert r["rmse"] <= r["scale"] / 2 + 1e-9
        assert not math.isnan(r["rmse"])


def test_trigram_lm_scores_planted(spark):
    """A doc made of corpus-common trigrams must outscore a doc of unique
    junk trigrams; counts must match hand-derivation."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "zq#7x!v9@k"),          # every trigram unique -> lowest score
        (4, "ab"),                   # < 3 chars -> no trigrams, excluded
        (5, None),                   # NULL text -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in T.trigram_lm_scores(df, "doc_id", "text").collect()
    }
    assert set(out) == {1, 2, 3}
    # "the cat sat on the mat" = 22 chars -> 20 trigrams
    assert out[1]["n_trigrams"] == 20
    assert out[3]["n_trigrams"] == 8
    # junk doc scores strictly below both natural docs
    assert out[3]["avg_logprob"] < out[1]["avg_logprob"]
    assert out[3]["avg_logprob"] < out[2]["avg_logprob"]
    # shared trigrams push docs 1/2 close together, far from doc 3
    assert abs(out[1]["avg_logprob"] - out[2]["avg_logprob"]) < 0.5


def test_trigram_lm_repeated_trigram_weighting(spark):
    """c_dt weighting: a doc repeating one trigram counts it per
    occurrence, not once."""
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in T.trigram_lm_scores(df, "doc_id", "text").collect()
    }
    assert out[1]["n_trigrams"] == 2 and out[1]["n_distinct"] == 1
    assert out[2]["n_trigrams"] == 2 and out[2]["n_distinct"] == 2
    # 'aaa' occurs twice in corpus (both in doc 1), 'abc'/'bcd' once each:
    # doc 1 avg = ln(2/4), doc 2 avg = ln(1/4)
    assert out[1]["avg_logprob"] == round(math.log(2 / 4), 6)
    assert out[2]["avg_logprob"] == round(math.log(1 / 4), 6)


@pytest.mark.parametrize("seed", [3, 11])
def test_trigram_lm_invariants_random_corpus(spark, seed):
    """For any corpus: avg_logprob <= 0 (a trigram's corpus count never
    exceeds the total), n_distinct <= n_trigrams, and n_trigrams ==
    len(text) - 2 exactly for every doc with >= 3 chars."""
    import random

    rng = random.Random(seed)
    alpha = "ab cd"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in T.trigram_lm_scores(df, "doc_id", "text").collect()
    }
    by_id = dict(rows)
    for i, text in rows:
        if len(text) >= 3:
            assert out[i]["n_trigrams"] == len(text) - 2, (i, text)
        else:
            assert i not in out
    for r in out.values():
        assert r["avg_logprob"] <= 0.0
        assert 1 <= r["n_distinct"] <= r["n_trigrams"]


def test_trigram_lm_kernels_identical(spark, sf_dir):
    """The Arrow Counter kernel and the JVM explode path must produce
    identical rows — including NULL and sub-3-char texts, which both
    kernels drop."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(-1, None), (-2, "ab"), (-3, "UPPER case MIX")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)
    a = {
        r["doc_id"]: (r["n_trigrams"], r["n_distinct"], r["avg_logprob"])
        for r in T.trigram_lm_scores(docs, "doc_id", "text", kernel="numpy").collect()
    }
    b = {
        r["doc_id"]: (r["n_trigrams"], r["n_distinct"], r["avg_logprob"])
        for r in T.trigram_lm_scores(docs, "doc_id", "text", kernel="jvm").collect()
    }
    assert a == b and len(a) > 0
    assert -1 not in a and -2 not in a and -3 in a


def test_content_defined_chunks_shift_invariance(spark):
    """The CDC selling point: inserting a prefix re-chunks only the region
    up to the first post-insertion boundary — every later chunk keeps its
    exact bytes and md5 (fixed-size chunking would lose ALL alignment).
    Also pins: every doc yields >= 1 chunk, chunk lens sum to doc len,
    chunks reassemble the doc in order."""
    import hashlib

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the windowsill and the rain keeps falling on the "
        "old tin roof of the barn behind the orchard where apples rot "
        "sweetly in the tall autumn grass near the broken fence"
    ) * 3
    shifted = "INSERTED PREAMBLE >>> " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted), (3, "tiny"), (4, "")],
        "doc_id long, text string",
    )
    rows = T.content_defined_chunks(docs, "doc_id", "text").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did in (1, 2, 3, 4):
        chunks = sorted(by_doc[did], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in chunks] == list(range(len(chunks)))
        text = {1: base, 2: shifted, 3: "tiny", 4: ""}[did]
        assert sum(r["chunk_len"] for r in chunks) == len(text)
        # chunks reassemble: walk spans and re-hash
        start = 0
        for r in chunks:
            piece = text[start : start + r["chunk_len"]]
            assert hashlib.md5(piece.encode()).hexdigest() == r["chunk_md5"]
            start += r["chunk_len"]
    assert len(by_doc[3]) == 1 and len(by_doc[4]) == 1  # short/empty: 1 chunk
    # shift-invariance: the tail chunks of doc 2 equal doc 1's tail chunks
    h1 = [r["chunk_md5"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_md5"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])]
    assert len(h1) > 3, "fixture must produce several chunks"
    # find the longest common suffix of chunk-hash sequences
    k = 0
    while k < min(len(h1), len(h2)) and h1[-1 - k] == h2[-1 - k]:
        k += 1
    assert k >= len(h1) - 2, (
        "insertion must only disturb chunks before the first boundary; "
        f"common suffix {k} of {len(h1)}"
    )
