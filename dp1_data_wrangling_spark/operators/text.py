"""Text analysis operators for training-data pipelines (north star).

All hot-path computation is JVM column expressions (split/regexp/aggregate)
— no Python UDFs; every metric is integer-derived so results are
deterministic under any partitioning (the single final division of two
identical integers is bit-stable)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-substring frequencies per language; deterministic heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and "],
    "de": [" der ", " und "],
    "es": [" el ", " los "],
    "fr": [" le ", " les "],
}


def occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences via length difference —
    integer-exact, no regex engine differences."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != "")).cast("long")


def distinct_token_count(text: Column) -> Column:
    return F.size(
        F.array_distinct(F.filter(F.split(F.lower(text), r"\W+"), lambda x: x != ""))
    ).cast("long")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("long")


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum-non-space marks — the character-class skeleton of GPT-2-style
# pre-tokenization, using only regex constructs whose semantics are
# identical in Spark (Java regex) and DuckDB (RE2).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Approximate subword-pretoken count (whitespace tokens split further
    at letter/digit/punctuation boundaries)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast(
        "long"
    )


def quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: lengths, token counts, punctuation and
    type-token ratios (length/punct/stopword heuristics)."""
    t = F.col(text_col)
    return docs.withColumns(
        {
            "n_chars_actual": F.length(t).cast("long"),
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_token_count(t),
            "n_distinct_tokens": distinct_token_count(t),
            "n_punct": punct_count(t),
            "stopword_hits": occurrences(t, " the "),
        }
    ).withColumns(
        {
            "type_token_ratio": F.col("n_distinct_tokens")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            "punct_ratio": F.col("n_punct") / F.greatest(F.col("n_chars_actual"), F.lit(1)),
            "avg_token_len": (
                F.col("n_chars_actual") - F.col("n_tokens") + 1
            ) / F.greatest(F.col("n_tokens"), F.lit(1)),
        }
    )


def lang_scores(text: Column) -> dict[str, Column]:
    lowered = F.lower(text)
    return {
        lang: sum(
            (occurrences(lowered, m) for m in markers), start=F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-marker language ID; argmax with a fixed precedence order
    (en > de > es > fr) so the guess is deterministic."""
    scores = lang_scores(F.col(text_col))
    out = docs
    for lang, score in scores.items():
        out = out.withColumn(f"score_{lang}", score)
    guess = (
        F.when(
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr")),
            F.lit("en"),
        )
        .when(
            (F.col("score_de") >= F.col("score_es"))
            & (F.col("score_de") >= F.col("score_fr")),
            F.lit("de"),
        )
        .when(F.col("score_es") >= F.col("score_fr"), F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return out.withColumn("lang_guess", guess)


FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31
FINGERPRINT_PREFIX = 64


def rolling_fingerprint(text_col_name: str) -> Column:
    """Polynomial rolling hash of the first 64 chars (document
    fingerprint): h = ((h * 31) + ascii(c)) mod 1e9+7, left fold.  Pure
    JVM aggregate; bounded by the prefix so cost is O(1) per doc."""
    return F.expr(
        f"aggregate("
        f"transform(sequence(1, least(length({text_col_name}), {FINGERPRINT_PREFIX})), "
        f"j -> ascii(substr({text_col_name}, j, 1))), "
        f"0L, (acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition metrics (the Gopher/MassiveText rules:
    docs dominated by one token or by duplicated n-gram windows are
    boilerplate/spam).  Per doc: token counts, the most-frequent-token
    count, and distinct-vs-total bigram counts — all integers, so the
    ratios users derive from them are engine-exact.

    Entirely row-local (tokenize, count, mode, bigrams inside one
    project): ZERO shuffles at any corpus size.  The per-row mode is
    O(distinct x tokens) array work — bounded by document length, not by
    corpus size, and never leaves the JVM.

    DuckDB replay: list_filter/list_transform/list_distinct/list_max over
    regexp_split_to_array (same expressions, see q_doc_repetition_stats).
    """
    t = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
    )
    docs = docs.withColumn("_t", t).where(F.size("_t") >= 2)
    top = F.array_max(
        F.expr("transform(array_distinct(_t), d -> size(filter(_t, x -> x = d)))")
    )
    bigrams = F.expr("transform(sequence(1, size(_t) - 1), i -> concat(_t[i - 1], ' ', _t[i]))")
    return (
        docs.withColumn("n_tokens", F.size("_t").cast("bigint"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct("_t")).cast("bigint"))
        .withColumn("top_token_count", top.cast("bigint"))
        .withColumn("_bg", bigrams)
        .withColumn("n_bigrams", F.size("_bg").cast("bigint"))
        .withColumn(
            "n_distinct_bigrams", F.size(F.array_distinct("_bg")).cast("bigint")
        )
        .drop("_t", "_bg")
    )
