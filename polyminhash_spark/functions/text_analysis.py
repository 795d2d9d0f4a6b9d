"""Package-level text-analysis operators — DataFrame-native APIs for
the training-data-pipeline extras (language-ID, quality scoring, token
counting, document fingerprinting).

Each function is pure JVM expression work (regexp/aggregate inside
whole-stage codegen, no Python) and is arithmetic-identical to its
`plans/sql_mirror.py` oracle query, so the driver CORRECTNESS rows
(`lang_id`, `quality_score`, `token_count`, `doc_fingerprint`) gate
these implementations directly.

Reference analog: these fill SURVEY.md §2.2's "checklist categories not
present in the reference" — row-local text metrics the reference never
needed for polygons but a 100 TB text corpus pipeline runs constantly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# language -> stopword alternation (must stay in lock-step with
# plans/sql_mirror._STOPWORDS — the oracle mirrors these literals)
STOPWORDS = {
    "en": "the|and|of|is|to|in|that",
    "es": "el|la|de|los|que|y|en",
    "de": "der|die|und|das|ist|von",
    "fr": "le|la|les|et|des|est",
}


def _rx_count(col: Column, pattern: str) -> Column:
    """Count of non-overlapping full-pattern matches (group 0)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """+ c_<lang> stopword-hit counts + lang_guess (argmax, ties broken
    in the fixed en > es > de > fr order — deterministic)."""
    out = df
    for lang, words in STOPWORDS.items():
        out = out.withColumn(
            f"c_{lang}",
            _rx_count(F.col(text_col), r"\b(" + words + r")\b").cast("bigint"))
    guess = (
        F.when((F.col("c_en") >= F.col("c_es")) & (F.col("c_en") >= F.col("c_de"))
               & (F.col("c_en") >= F.col("c_fr")), "en")
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), "es")
        .when(F.col("c_de") >= F.col("c_fr"), "de")
        .otherwise("fr"))
    return out.withColumn("lang_guess", guess)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """+ n (chars), n_ws (whitespace), n_punct (non-alnum-non-ws),
    alpha_x1000 = floor(1000 * alphanumeric-ratio) — the integer-floored
    quality score the mirror oracle checks."""
    n = F.length(F.col(text_col)).cast("bigint")
    n_ws = _rx_count(F.col(text_col), r"\s").cast("bigint")
    n_punct = _rx_count(F.col(text_col), r"[^A-Za-z0-9\s]").cast("bigint")
    return (df.withColumn("n", n).withColumn("n_ws", n_ws)
            .withColumn("n_punct", n_punct)
            .filter(F.col("n") > 0)
            .withColumn(
                "alpha_x1000",
                F.floor(1000.0 * (F.col("n") - F.col("n_ws") - F.col("n_punct"))
                        / F.col("n")).cast("bigint")))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """+ n_ws_tokens (whitespace split) + n_bpe_tokens (BPE-ish regex:
    letter runs | digit runs | single punct)."""
    trimmed = F.trim(F.col(text_col))
    n_ws = F.when(F.length(trimmed) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(trimmed, r"\s+"))).cast("bigint")
    n_bpe = _rx_count(F.col(text_col), r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]") \
        .cast("bigint")
    return df.withColumn("n_ws_tokens", n_ws).withColumn("n_bpe_tokens", n_bpe)


def with_fingerprint(df: DataFrame, text_col: str = "norm_content",
                     k: int = 8) -> DataFrame:
    """+ fingerprint: min k-gram hash (a 1-permutation MinHash — the
    rolling-hash document fingerprint).  Mirror arithmetic: first 15
    hex chars of md5 as bigint, min over distinct k-grams."""
    grams = F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(length({text_col})-{k-1}, 1)),"
        f" i -> substr({text_col}, i, {k}))"))
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("bigint"))
    return df.withColumn("fingerprint", F.array_min(hashes))
