"""Text-analysis operators for training-data pipelines (BASELINE.json
north-star extension): quality scoring, language-ID heuristic, token
counting, document fingerprinting. All JVM-side column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# BPE-ish tokenization: word pieces, digit runs, single punctuation marks
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to")

# tiny per-language marker lexicons for the n-gram/langid heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("的", "是", "了"),
}


def token_count(text: Column) -> Column:
    """BPE-ish token count via regex extraction (F-free of Python)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality metrics: char/word counts, mean word length,
    stopword ratio, alpha ratio — the standard cheap quality filters."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS))
    )
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_words.alias("n_words"),
        F.round(
            (F.length(t) - (n_words - 1)).cast("double") / n_words, 6
        ).alias("mean_word_len"),
        F.round(n_stop.cast("double") / n_words, 6).alias("stopword_ratio"),
        F.round(n_alpha.cast("double") / F.length(t), 6).alias("alpha_ratio"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language-ID heuristic: score each language by marker hits
    over the token set; highest score wins (ties broken by language code
    order); no hits → 'und'. A deterministic, oracle-checkable stand-in for
    the n-gram langid models used in corpus pipelines."""
    words = F.array_distinct(F.split(F.lower(F.col(text_col)), " "))

    def _marker_filter(markers: tuple[str, ...]):
        # real closure: a default-arg lambda would change the inferred arity
        return lambda w: w.isin(*markers)

    scores = {
        lang: F.size(F.filter(words, _marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = F.lit("und")
    best = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # later wins only on strict >
        s = scores[lang]
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return df.select(F.col(id_col), F.col(text_col), pred.alias("pred_lang"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): hash every char
    k-gram, slide a window of ``window`` consecutive k-gram hashes, keep
    each window's minimum — the distinct minima are the fingerprint set.
    Guarantees any match of length ≥ k+window-1 shares a fingerprint.

    The k-gram hash is the md5-derived 32-bit value used across the engine
    (cross-engine deterministic), standing in for the rolling polynomial
    hash — same selection semantics, oracle-checkable. All JVM-side
    higher-order functions; one row per doc with an array column.
    """
    from ..operators.dedup import hash32  # local import avoids a cycle

    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(0))
    gram_idx = F.when(n_grams > 0, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    gram_hashes = F.transform(gram_idx, lambda i: hash32(F.substring(t, i, k)))

    def _winnow(hashes: Column) -> Column:
        n_windows = F.greatest(F.size(hashes) - (window - 1), F.lit(0))
        win_idx = F.when(
            n_windows > 0, F.sequence(F.lit(1), n_windows)
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(
                win_idx, lambda i: F.array_min(F.slice(hashes, i, window))
            )
        )

    return df.select(
        F.col(id_col),
        F.array_sort(_winnow(gram_hashes)).alias("fingerprints"),
    )


#: Gopher-style heuristic rules: (reason, predicate-builder) — predicate
#: takes the signal columns and returns a boolean Column that fires when
#: the document should be REJECTED. Thresholds are the knobs; the operator
#: is the shape (Rae et al. 2021, "Scaling Language Models", App. A).
QUALITY_RULES: tuple[tuple[str, str], ...] = (
    ("too_short", "n_words < 10"),
    ("too_long", "n_words > 100"),
    ("word_len", "mean_word_len < 3.0 OR mean_word_len > 10.0"),
    ("few_stopwords", "stopword_ratio < 0.05"),
    ("low_alpha", "alpha_ratio < 0.8"),
)


def quality_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality filter: combine the ``quality_stats``
    signals into a keep/reject decision with an auditable reasons column —
    the errors-array validation pattern (operators/validation.py) applied
    to corpus curation. A rejected doc carries EVERY rule it tripped
    (comma-joined in rule order), not just the first, so curation reports
    can break rejections down by cause.

    One map stage: signals and predicates are pure column expressions over
    the text, no shuffle, no UDF — the ideal 100 TB shape (the groupBy
    rollup, if wanted, is the caller's one aggregate on top)."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    sig = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        ((F.length(t) - (n_words - 1)).cast("double") / n_words).alias(
            "mean_word_len"
        ),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
        (n_alpha.cast("double") / F.length(t)).alias("alpha_ratio"),
    )
    # concat_ws skips NULL args on both Spark and DuckDB, so the fired
    # rules join in declaration order with no array intermediary
    reasons = F.concat_ws(
        ",",
        *[F.when(F.expr(cond), F.lit(name)) for name, cond in QUALITY_RULES],
    )
    return sig.select(
        id_col,
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        reasons.alias("reject_reasons"),
        (reasons == "").alias("keep"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, App. A): documents
    dominated by repeated n-grams are generation loops / boilerplate and
    get filtered before training. Per doc:

    - ``distinct_word_frac``: |distinct words| / |words|
    - ``top_bigram_frac``: occurrences of the most frequent word 2-gram
      over all 2-grams (the "fraction covered by the top n-gram" rule)
    - ``dup_trigram_frac``: fraction of word 3-grams that are repeats

    Everything is row-local higher-order-function math over the split
    word array — a pure map stage, no shuffle, no UDF, the ideal 100 TB
    shape. The top-bigram count is O(distinct × n) per doc, which is fine
    for document-sized arrays and stays inside whole-stage codegen.
    """
    w = F.split(F.col(text_col), " ")
    n_words = F.size(w)

    def _grams(n: int):
        cnt = F.greatest(n_words - (n - 1), F.lit(0))
        return F.when(
            cnt > 0,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bg, tg = _grams(2), _grams(3)
    top_bg = F.when(
        F.size(bg) > 0,
        F.array_max(
            F.transform(
                F.array_distinct(bg),
                lambda g: F.size(F.filter(bg, lambda x: x == g)),
            )
        ),
    ).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.size(F.array_distinct(w)).cast("double") / n_words, 6
        ).alias("distinct_word_frac"),
        F.when(
            F.size(bg) > 0,
            F.round(top_bg.cast("double") / F.size(bg), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            F.size(tg) > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(tg)).cast("double") / F.size(tg),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


#: (name, java/RE2-compatible pattern, replacement token). Applied IN
#: ORDER to the running redacted text — emails are consumed before the
#: IPv4 rule so dotted digits inside an address can't double-count.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4 addresses /
    SSN-shaped ids with typed tokens and count each class per document
    (the audit trail curation reports need). Patterns are deliberately in
    the Java ∩ RE2 regex subset so the DuckDB oracle runs them verbatim.

    Counts are taken on the running text between replacements, so classes
    are counted post-consumption by earlier rules, never twice. Pure
    ``regexp_replace`` / ``regexp_extract_all`` column expressions — map
    stage, no shuffle, no UDF."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), *counts, cur.alias("redacted"))


def line_dedup(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """C4-style global line deduplication (Raffel et al. 2020 §2.2;
    ``sep`` is a Java regex — escape metacharacters for literals): any
    line occurring more than once in the ENTIRE corpus keeps only its
    first occurrence (smallest (doc, position)); every later occurrence
    is removed and each document is reassembled from its surviving lines
    in order. Returns per-doc (n_lines, n_lines_kept, n_lines_removed,
    cleaned_text); a fully-boilerplate doc comes back with empty text,
    not a missing row.

    Scale shape: two key-parallel shuffles — posexplode is row-local
    fan-out, the first-occurrence choice is a window partitioned BY LINE
    (same distribution as exact dedup's hash-groupBy; hot boilerplate
    lines are single keys but their groups are tiny — one row per doc
    containing the line), and reassembly groups by doc id. No UDFs; the
    rebuild is collect_list → array_sort → transform, all JVM-side.
    """
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    first = F.row_number().over(
        Window.partitionBy("line").orderBy(id_col, "pos")
    )
    rebuilt = (
        lines.withColumn("rn", first)
        .where(F.col("rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines_kept"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("cleaned_text"),
        )
    )
    orig = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), sep)).alias("n_lines")
    )
    return orig.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        (F.col("n_lines") - F.coalesce("n_lines_kept", F.lit(0))).alias(
            "n_lines_removed"
        ),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def repeated_span_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Cross-document repeated-span detection — the ExactSubstr dedup
    signal (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better") at fixed n-token granularity: for every doc, how many
    of its token n-grams also occur in at least one OTHER document.
    High ``repeated_frac`` docs are templated/boilerplate/leaked content
    that span-level dedup would cut.

    Scale shape: ONE pass over the gram stream. The explode + per-gram
    hash is the dominant cost, so the plan is arranged to compute it
    exactly once: grams are first collapsed to distinct ``(gh, doc)``
    pairs with an in-doc instance count (map-side-combined groupBy),
    then a window partitioned by ``gh`` counts the docs per gram — the
    cross-doc-repeat test — without re-reading the corpus, and a final
    regroup by doc sums the surviving instance counts. (The earlier
    two-branch form — groupBy for the repeated-hash set, then a join of
    a SECOND gram stream against it — recomputed the explode+hash
    pipeline twice; Spark does not reuse a non-checkpointed subtree
    across consumers.) Gram identity is xxhash64 (an 8-byte long):
    hash values never leave the plan — only per-doc counts do — so the
    engine-side hash needn't match the oracle's, and a 64-bit
    non-cryptographic hash beats md5 strings on BOTH compute (round-9
    same-process interleaved A/B at sf0.1, 5 repeats: min materialized
    wall 3.18 → 2.90 s, −9%) and shuffle width (the groupBy/window keys
    shrink from 32-char strings to 8-byte longs — a 4× key-width cut
    whose payoff grows with the shuffle volume, i.e. with corpus size;
    see BENCH_NOTES_r9.md).

    Collision bound: xxhash64 is 64-bit, so by the birthday bound a
    corpus with ~2^32 (≈4e9) DISTINCT n-grams expects its first
    cross-gram collision; a 100 TB corpus can exceed that, and a
    collision merges two distinct grams — over-counting
    ``n_repeated``/``repeated_frac`` by a vanishing but non-zero
    amount. The signal is a *filter score*, not an exact dedup key, so
    this is acceptable here; if exactness matters at corpus scale, pair
    xxhash64 with a second independent seed (two 64-bit hashes ≈ one
    128-bit identity) at 2× the key width.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = df.select(F.col(id_col), F.explode(grams).alias("gh"))
    per = g.groupBy("gh", id_col).agg(F.count(F.lit(1)).alias("c"))
    n_docs_with_gram = F.count(F.lit(1)).over(
        Window.partitionBy("gh")
    )
    hits = (
        per.withColumn("nd", n_docs_with_gram)
        .where(F.col("nd") >= 2)
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_repeated"))
    )
    base = df.select(F.col(id_col), cnt.cast("long").alias("n_grams"))
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_repeated", F.lit(0)).alias("n_repeated"),
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.coalesce("n_repeated", F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("repeated_frac"),
    )


def bpe_pair_stats(
    df: DataFrame, text_col: str, top_k: int = 20
) -> DataFrame:
    """The first iteration of BPE tokenizer training, distributed: count
    every adjacent character pair across the corpus weighted by word
    frequency and return the top-``top_k`` merge candidates (Sennrich et
    al. 2016 §3.2 — the argmax of this table IS the first merge rule).

    Scale shape: two map-side-combined shuffles. Words are counted first
    (groupBy word — the corpus collapses to its vocabulary, typically
    thousands of times smaller), then pairs explode off the DISTINCT
    words only, weighted by the word count — so the expensive per-pair
    fan-out runs over the vocabulary, not the corpus. Top-k is a
    TakeOrdered, not a full sort. Ties break on pair text so the result
    is deterministic cross-engine.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).where(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    n = F.length("word")
    pairs = vocab.where(n >= 2).select(
        "wn",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(top_k)
    )


def trigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, kernel: str = "numpy"
) -> DataFrame:
    """Char-trigram language-model scoring — the CCNet/KenLM-style
    perplexity signal for corpus quality filtering, self-trained on the
    scored corpus: a document full of rare character sequences (mojibake,
    base64 blobs, boilerplate markup) scores a low average log-probability
    and can be dropped by thresholding.

    Returns (id, n_trigrams, n_distinct, avg_logprob) where avg_logprob =
    Σ c_dt·ln(c_tg/total) / Σ c_dt over the doc's trigrams (c_dt = count in
    doc, c_tg = corpus count).

    Two kernels, identical output (pinned in tests):

    - ``kernel="numpy"`` (default): an Arrow mapInPandas kernel emits the
      doc-LOCAL distinct-trigram counts directly — the (doc, trigram)
      aggregation happens row-locally with ZERO shuffle, so downstream
      only ever moves n_distinct (~hundreds) rows per doc instead of
      n_chars exploded rows. Round-6 profiling replaced the per-slice
      Python ``Counter`` (the linear term behind SCALEBENCH r5's 5.54×
      growth at ×30) with true vectorization: each text is decoded to a
      UTF-32 codepoint array and the trigram becomes one int64 CODE
      ``(a<<42)|(b<<21)|c`` built by shifted adds, counted with
      ``np.unique`` — all C loops. The code↔trigram map is bijective
      (codepoints < 2^21), so aggregating the model on the code instead
      of the string changes nothing downstream, and the skinny long/long
      rows also shuffle cheaper than strings.
    - ``kernel="jvm"``: explode + groupBy — pure column expressions, kept
      as the oracle-determinism reference.

    Scale shape: per-doc counting is row-local either way; the corpus
    model is derived by re-aggregating those counts (no second scan) and
    is vocab-bounded (≤ |charset|³ rows) so it BROADCASTS back for
    scoring. At 100 TB the model stays a few MB; the only corpus-keyed
    shuffle left is the final per-doc score groupBy.
    """
    if kernel == "numpy":

        def _counts(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                id_chunks, tg_chunks, c_chunks = [], [], []
                for did, t in zip(pdf[id_col], pdf[text_col]):
                    if t is None:
                        continue
                    t = t.lower()
                    if len(t) < 3:
                        continue
                    # errors="replace": lone surrogates (possible in scraped
                    # corpora via surrogatepass decoding) would otherwise
                    # raise UnicodeEncodeError and kill the whole task; the
                    # deterministic '?' substitution keeps the kernel total.
                    cp = _np.frombuffer(
                        t.encode("utf-32-le", errors="replace"), dtype=_np.uint32
                    ).astype(_np.int64)
                    codes = (
                        (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
                    )
                    tgc, cnt = _np.unique(codes, return_counts=True)
                    id_chunks.append(_np.full(len(tgc), did, dtype=_np.int64))
                    tg_chunks.append(tgc)
                    c_chunks.append(cnt.astype(_np.int64))
                if id_chunks:
                    yield _pd.DataFrame(
                        {
                            id_col: _np.concatenate(id_chunks),
                            "tg": _np.concatenate(tg_chunks),
                            "c_dt": _np.concatenate(c_chunks),
                        }
                    )
                else:
                    yield _pd.DataFrame(
                        {
                            id_col: _pd.Series([], dtype="int64"),
                            "tg": _pd.Series([], dtype="int64"),
                            "c_dt": _pd.Series([], dtype="int64"),
                        }
                    )

        per = df.select(id_col, text_col).mapInPandas(
            _counts, schema=f"{id_col} long, tg long, c_dt long"
        )
    else:
        t = F.lower(F.col(text_col))
        grams = F.when(
            F.length(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - 2),
                lambda i: F.substring(t, i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        per = (
            df.select(F.col(id_col), F.explode(grams).alias("tg"))
            .groupBy(id_col, "tg")
            .agg(F.count(F.lit(1)).alias("c_dt"))
        )
    # `per` feeds BOTH the model aggregation and the scoring join; without
    # materialization Spark re-runs the counting stage once per consumer
    # (round-6 profiling: the recompute, not the Python kernel, dominated
    # wall time). One eager localCheckpoint halves the work and truncates
    # the lineage for the iterative-plan-safety reasons used elsewhere.
    per = per.localCheckpoint(eager=True)
    model = per.groupBy("tg").agg(F.sum("c_dt").alias("c"))
    total = model.agg(F.sum("c").cast("double").alias("total"))
    scored = per.join(F.broadcast(model), "tg").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.sum("c_dt").alias("n_trigrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.sum(F.col("c_dt") * F.log(F.col("c") / F.col("total")))
            / F.sum("c_dt"),
            6,
        ).alias("avg_logprob"),
    )


def normalize_text(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus text canonicalization (the C4/CCNet preprocessing step):
    Unicode NFC composition, lowercase, whitespace collapse + trim.
    Returns (id, norm_text, changed).

    NFC runs in an Arrow pandas_udf (Python ``unicodedata`` — Spark has
    no built-in Unicode-normalization expression); lowercase/whitespace
    stay JVM-side around it. Shuffle-free row-local map, so it scales as
    a pure scan; put it FIRST in the curation funnel so every downstream
    hash (exact dedup, MinHash, winnowing) sees canonical bytes — the
    composed/decomposed forms of the same text must collide, not dodge
    dedup."""
    import pandas as pd

    def _nfc(texts):
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    _nfc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    nfc_udf = F.pandas_udf(_nfc, "string")
    norm = F.trim(
        F.regexp_replace(F.lower(nfc_udf(F.col(text_col))), r"\s+", " ")
    )
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        (~norm.eqNullSafe(F.col(text_col))).alias("changed"),
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    divisor: int = 64,
    modulus: int = 1 << 20,
) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync-style) — split each text at
    positions where a rolling hash of the trailing ``window`` characters
    hits ``h % divisor == 0``. Because boundaries depend only on LOCAL
    content, an insertion near the start shifts only the chunks up to the
    next boundary: every later chunk keeps its bytes AND its hash — the
    property chunk-level dedup/delta-storage of a 100 TB corpus relies on
    (fixed-size chunking loses all alignment after one insertion; pinned
    by test). Expected chunk length ≈ ``divisor`` characters.

    Hash: ``h_i = Σ_{j=0..window-1} codepoint(s[i-j]) · 31^j mod modulus``
    — exact integer arithmetic a SQL oracle replays verbatim (no
    byte-order or float ambiguity); a boundary AFTER 1-based position i
    (i in [window, len)) closes the chunk at i. Returns
    ``(id, chunk_idx, chunk_len, chunk_md5)``; every doc yields ≥ 1
    chunk (short/empty docs are one whole-text chunk).

    Scale shape: one Arrow mapInPandas pass, row-local (the rolling hash
    is vectorized shifted-slice adds, the chunk md5s are computed in the
    kernel) — ZERO exchanges, a pure scan at any corpus size.
    """
    if window < 1 or divisor < 1 or modulus < 1:
        raise ValueError(
            "content_defined_chunks: window/divisor/modulus must be >= 1 "
            f"(got {window}, {divisor}, {modulus})"
        )
    w, dv, md = int(window), int(divisor), int(modulus)

    # self-contained closure (see trigram_lm_scores note)
    def _batches(it):
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        pows = [pow(31, j, md) for j in range(w)]

        for pdf in it:
            ids, idxs, lens, md5s = [], [], [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    t = ""
                n = len(t)
                bounds = []
                if n > w:
                    cp = _np.frombuffer(
                        t.encode("utf-32-le", errors="replace"),
                        dtype=_np.uint32,
                    ).astype(_np.int64)
                    h = _np.zeros(n - w + 1, dtype=_np.int64)
                    for j, pj in enumerate(pows):
                        h += cp[w - 1 - j : n - j] * pj
                    h %= md
                    # h[k] covers 1-based positions k+1..k+w, boundary
                    # after position k+w; exclude a boundary at i == n
                    # (it would close an empty final chunk)
                    bpos = _np.nonzero(h % dv == 0)[0] + w
                    bounds = [int(b) for b in bpos if b < n]
                start = 0
                for ci, stop in enumerate(bounds + [n]):
                    chunk = t[start:stop]
                    ids.append(int(did))
                    idxs.append(ci)
                    lens.append(len(chunk))
                    md5s.append(
                        _hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
                    start = stop
            yield _pd.DataFrame(
                {
                    id_col: _pd.Series(ids, dtype="int64"),
                    "chunk_idx": _pd.Series(idxs, dtype="int64"),
                    "chunk_len": _pd.Series(lens, dtype="int64"),
                    "chunk_md5": _pd.Series(md5s, dtype=object),
                }
            )

    # spread an under-partitioned source to the cluster's parallelism
    # (round-14, guide §2.5 — same discipline as the multimodal/MG
    # kernels in r13): the rolling hash + per-chunk md5 are row-local
    # CPU work, and a single small parquet split serialized the whole
    # pass (one task at any core count — the r13 verdict's 32c-slower-
    # than-8c inversion was this entry running on idle cores). The
    # projection happens BEFORE the repartition so only (id, text)
    # shuffles; no-op at scale where the scan's splits already cover
    # the cluster.
    src = df.select(id_col, text_col)
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(
        _batches,
        schema=f"{id_col} long, chunk_idx long, chunk_len long, "
        "chunk_md5 string",
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the canonical-form hash used for exact dedup across formatting)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def fingerprint_overlap(
    corpus: DataFrame,
    probes: DataFrame,
    corpus_id: str = "doc_id",
    probe_id: str = "probe_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing-fingerprint overlap of a SMALL probe set against a large
    corpus — the n-gram tier of contamination screening (catches leaked
    eval items embedded mid-document, where substring LIKE needs exact
    phrasing). Returns (corpus_id, probe_id, n_shared, overlap_frac) for
    every pair sharing ≥ ``min_frac`` of the probe's fingerprints;
    winnowing guarantees any verbatim match of length ≥ k+window-1 chars
    shares at least one fingerprint.

    Scale shape: the probe set is benchmark-sized (thousands), so its
    exploded fingerprint index BROADCASTS; the corpus side is one map
    (fingerprint + explode, row-local fan-out) into a broadcast hash join
    and a map-side-combined count — no corpus shuffle, no pairwise text
    comparison ever happens."""
    p_idx = winnowing_fingerprints(probes, probe_id, text_col, k, window).select(
        probe_id,
        F.size("fingerprints").alias("probe_n"),
        F.explode("fingerprints").alias("fp"),
    )
    d_idx = winnowing_fingerprints(corpus, corpus_id, text_col, k, window).select(
        corpus_id, F.explode("fingerprints").alias("fp")
    )
    # fingerprint sets are distinct (winnowing array_distincts), so the
    # per-(doc, probe) join hit count IS the intersection size
    hits = (
        d_idx.join(F.broadcast(p_idx), "fp")
        .groupBy(corpus_id, probe_id, "probe_n")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # scaled-integer threshold, no float edge cases
    return hits.where(
        F.col("n_shared") * F.lit(1_000_000)
        >= F.col("probe_n") * F.lit(int(min_frac * 1_000_000))
    ).select(
        corpus_id,
        probe_id,
        "n_shared",
        F.round(
            F.col("n_shared").cast("double") / F.col("probe_n"), 6
        ).alias("overlap_frac"),
    )
