"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in column expressions (whole-stage
codegen'd; no Python in the hot path) — these run over the full corpus
at 100 TB, so every one of them must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language marker stopwords for the n-gram/stopword-hit language
# heuristic (classic trigram-profile stand-in that stays relational)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "por", "una"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count (0 for empty text)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def word_occurrences(text: Column, word: str) -> Column:
    """Count of ' word ' occurrences via replace-arithmetic — identical
    semantics in Spark and ANSI SQL (no regex dialect risk)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1]:
    length band, punctuation density, stopword ratio, mean word length.
    The score formula is arbitrary-but-fixed; what matters is that it
    is deterministic, cheap, and columnar."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count_col(t)
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    n_stop = sum(word_occurrences(t, w) for w in LANG_MARKERS["en"])
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    score = F.round(
        0.4 * len_score + 0.3 * (1 - F.least(punct_ratio * 5, F.lit(1.0))) + 0.3 * F.least(stop_ratio * 3, F.lit(1.0)),
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-stopword
    hits (ties broken by language code asc; 'und' when no marker hits).
    Pure column arithmetic → a single codegen'd projection."""
    t = F.col(text_col)
    scores = [
        (lang, sum(word_occurrences(t, w) for w in words))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    pairs = F.array(
        *[F.struct(s.cast("long").alias("hits"), F.lit(lang).alias("lang")) for lang, s in scores]
    )
    max_hits = F.array_max(F.transform(pairs, lambda p: p["hits"]))
    # ties on hits → smallest language code wins (deterministic)
    winner = F.array_min(
        F.filter(pairs, lambda p: (p["hits"] == max_hits) & (p["hits"] > 0))
    )["lang"]
    return docs.select(
        "doc_id",
        F.coalesce(winner, F.lit("und")).alias("pred_lang"),
        max_hits.alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable content fingerprint: md5 over whitespace/case-normalized
    text. The join key for exact dedup across shards."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fp"))
