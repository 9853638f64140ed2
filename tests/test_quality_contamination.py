"""Unit tests for the round-5 curation operators: the Gopher-style
quality filter (planted bad docs, per-rule reasons) and the n-gram
contamination tier (planted mid-document leak caught, clean docs not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_full_etl_process_spark.operators import textstats as T


def _filter_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return T.quality_filter(df, "doc_id", "text").collect()[0]


def test_quality_filter_planted_bad_docs(spark):
    # 3 words → too_short; no stopwords → few_stopwords
    r = _filter_one(spark, "one two three")
    assert r["keep"] is False
    assert r["reject_reasons"] == "too_short,few_stopwords"

    # 120 words with healthy word length and stopword mix → only too_long
    r = _filter_one(spark, " ".join(["their"] * 110 + ["the"] * 10))
    assert r["reject_reasons"] == "too_long"

    # 12 two-char words → word_len (mean < 3) and no stopwords
    r = _filter_one(spark, "aa bb cc dd ee ff gg hh ii jj kk ll")
    assert "word_len" in r["reject_reasons"]
    assert "few_stopwords" in r["reject_reasons"]

    # digit-heavy text → low_alpha
    r = _filter_one(
        spark, "the 1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 of"
    )
    assert "low_alpha" in r["reject_reasons"]
    assert r["keep"] is False


def test_quality_filter_clean_doc_keeps(spark):
    r = _filter_one(
        spark,
        "the quality pipeline validates documents and keeps everything "
        "wholesome of the corpus to ensure training distributions remain "
        "stable across sources",
    )
    assert r["keep"] is True and r["reject_reasons"] == ""


def test_quality_filter_reasons_accumulate(spark):
    # one doc tripping MANY rules reports all of them in rule order
    r = _filter_one(spark, "11 22")
    assert r["reject_reasons"] == "too_short,word_len,few_stopwords,low_alpha"


def test_fingerprint_overlap_catches_embedded_leak(spark):
    """A probe (eval item) embedded VERBATIM mid-document must be caught
    with high overlap; unrelated docs with disjoint vocabulary must not
    appear at all. Winnowing guarantees a shared fingerprint for any
    verbatim match of length >= k+window-1 chars; a fully-embedded probe
    shares nearly all interior window minima."""
    probe_text = (
        "what is the capital of france and when was the eiffel tower built"
    )
    corpus = spark.createDataFrame(
        [
            (1, f"padding words around the leak {probe_text} trailing filler"),
            (2, "zebra yak xylophone quartz jigsaw vortex plasma nebula"),
            (3, probe_text),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, probe_text)], "probe_id long, text string"
    )
    got = {
        r["doc_id"]: r["overlap_frac"]
        for r in T.fingerprint_overlap(corpus, probes, min_frac=0.5).collect()
    }
    assert 3 in got and got[3] == 1.0  # verbatim copy: full overlap
    assert 1 in got and got[1] >= 0.5  # embedded leak: caught
    assert 2 not in got  # disjoint vocabulary: clean


def test_fingerprint_overlap_threshold_prunes(spark):
    """min_frac is a real knob: a doc containing only HALF the probe has a
    strictly partial overlap — included at a low threshold, pruned at 1.0,
    while the verbatim copy survives both."""
    probe_text = (
        "what is the capital of france and when was the eiffel tower built"
    )
    corpus = spark.createDataFrame(
        [
            (1, "what is the capital of france and"),  # first half only
            (3, probe_text),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, probe_text)], "probe_id long, text string"
    )
    loose = {
        r["doc_id"]: r["overlap_frac"]
        for r in T.fingerprint_overlap(corpus, probes, min_frac=0.2).collect()
    }
    assert loose[3] == 1.0
    assert 1 in loose and 0.2 <= loose[1] < 1.0  # partial, not full
    strict = {
        r["doc_id"]
        for r in T.fingerprint_overlap(corpus, probes, min_frac=1.0).collect()
    }
    assert strict == {3}
