"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all built-in
column expressions (JVM-side, whole-stage codegen), zero Python UDFs, so
they stream through a 100 TB corpus at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual marker-word lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "las", "es", "una", "que"],
    "fr": ["le", "la", "les", "est", "une", "dans", "que"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char counts, average token length per document."""
    toks = tokens(text_col)
    non_ws_chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return df.select(
        "*",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        F.round(non_ws_chars / F.size(toks), 4).alias("avg_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: type-token ratio (vocabulary
    diversity), stopword ratio, length band. Deterministic arithmetic on
    integer counts so oracle comparison is exact."""
    toks = tokens(text_col)
    n = F.size(toks)
    distinct_n = F.size(F.array_distinct(toks))
    stop_n = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    )
    ttr = distinct_n / n
    stop_ratio = stop_n / n
    return df.select(
        "*",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            (distinct_n / n) * 0.6
            + (stop_n / n) * 0.2
            + F.least(n / F.lit(100.0), F.lit(1.0)) * 0.2,
            6,
        ).alias("quality_score"),
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count marker hits per language, predict
    the argmax (ties broken by a fixed language order). Pure column
    expressions — the argmax is a chained greatest/when."""
    toks = tokens(text_col)
    hit_cols = {
        lang: _marker_hits(toks, words) for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hit_cols[lang] for lang in langs])
    pred = F.lit("unknown")
    # build when-chain in reverse so earlier langs win ties
    for lang in reversed(langs):
        pred = F.when((hit_cols[lang] == best) & (best > 0), lang).otherwise(
            pred
        )
    return df.select(
        "*",
        *[hit_cols[lang].cast("long").alias(f"hits_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token bag. Two docs with the same vocabulary collide —
    the cheap first-stage near-dup key."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        F.md5(F.col(text_col)).alias("exact_fingerprint"),
        bag_fingerprint(text_col).alias("bag_fingerprint"),
    )
