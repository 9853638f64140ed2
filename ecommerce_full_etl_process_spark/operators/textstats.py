"""Text-analysis operators for training-data pipelines (BASELINE.json
north-star extension): quality scoring, language-ID heuristic, token
counting, document fingerprinting. All JVM-side column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the canonical-form hash used for exact dedup across formatting)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
