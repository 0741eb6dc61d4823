"""Text analysis operators — language-ID, quality scoring, token counting,
fingerprinting — all pure ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen; zero Python in the hot path).

Every operator has one canonical definition used by both the Spark
implementation and the DuckDB oracle, so results are bit-comparable:

* tokens = whitespace split of trimmed text (empty text → no tokens);
* BPE-ish tokens = matches of ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]``;
* fingerprint = md5 of the sorted distinct tokens joined by single spaces
  (the classic key-collision / rolling fingerprint method);
* language-ID = argmax of marker-token hit counts with a fixed preference
  order (en > de > fr > es > zh, then 'und').
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "los", "y", "es", "las"),
    "zh": ("的", "是", "了", "在", "和"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens; empty/blank text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, single punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH)).cast("long")


def _count_in(arr: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr, lambda x: F.array_contains(lit_arr, x))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: lengths, token stats, stopword ratio,
    uniqueness ratio — the standard cheap pre-training filters."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.round(
            F.when(n_tok > 0, _count_in(toks, STOPWORDS) / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("unique_ratio"),
        F.round(
            F.when(
                n_tok > 0,
                (F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")) / n_tok),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language heuristic: hit counts per language, argmax with
    fixed preference order; no hits at all → 'und'."""
    toks = tokens(text_col)
    scores = {lang: _count_in(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties (applied last)
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Key-collision fingerprint: md5 over the sorted distinct token set.
    Word-order- and duplication-insensitive document identity."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )
