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


# PII patterns restricted to regex constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
# \b word boundaries.  No lookarounds (RE2 has none), no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (tag, pattern, replacement) — applied IN ORDER; email first so its
    # local-part digits are consumed before the bare-number pattern runs.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("idnum", r"\b\d{9,}\b", "[ID]"),
]


def scrub_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 addresses, long id numbers)
    and count what was removed — the standard pre-training privacy screen.

    Pure row-local ``regexp_replace``/``regexp_count`` column expressions:
    ZERO shuffles at any corpus size, cost linear in document length, and
    fully deterministic (no model, no sampling).  Counts are taken per
    pattern on the text as it looked *when that pattern ran* (post the
    previous replacements), so count and replacement always agree — an
    email's digits can never also be counted as an id number.

    The DuckDB oracle replays the same chain with
    ``regexp_replace(..., 'g')`` / ``len(regexp_extract_all(...))``;
    patterns are restricted to the Java/RE2-identical subset above.
    """
    out = docs.withColumn(out_col, F.col(text_col))
    for tag, pattern, replacement in PII_PATTERNS:
        out = out.withColumn(
            f"n_{tag}", F.regexp_count(F.col(out_col), F.lit(pattern)).cast("long")
        ).withColumn(
            out_col, F.regexp_replace(F.col(out_col), pattern, replacement)
        )
    return out


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    *,
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (``size - stride`` chars shared between neighbours) — the retrieval /
    context-window chunking primitive.

    Chunk ``i`` covers ``[1 + i*stride, i*stride + size]``; starts are
    generated while they land inside the document, so the final chunk may
    be short but no chunk is ever empty.  Row-local ``sequence`` +
    ``explode`` + ``substr`` — zero shuffles; output size is bounded by
    ``ceil(size/stride)`` times the corpus, a constant the caller chose.

    Empty documents produce no chunks (and, guard-wise, never reach the
    ``sequence`` call: Spark's two-argument ``sequence(0, -1)`` would
    count *downward*, fabricating phantom chunks).
    """
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size=} {stride=}")
    n = F.length(F.col(text_col))
    last_idx = F.floor((n - F.lit(1)) / F.lit(stride)).cast("long")
    out = (
        docs.where(n >= 1)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), last_idx)))
        .withColumn(
            "chunk",
            F.col(text_col).substr(
                (F.col("chunk_idx") * stride + 1).cast("int"), F.lit(size)
            ),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("int"))
    )
    return out


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


def top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Per-document top-k keywords by tf-idf — the keyword-extraction /
    corpus-indexing primitive.

    The idf is FIXED-POINT: ``idf_milli = (n_docs * 1000) div df`` — an
    integer inverse-document-frequency in units of 1/1000.  Scoring by
    ``tf * idf_milli`` preserves the tf-idf ranking for any terms whose
    idf differs by >= one milli-unit while keeping every comparison
    integer-exact (a float ``ln`` would differ in the last ulp across
    engines/libms and flip ranks nondeterministically — same fixed-point
    discipline as the registry's cents/micros contract).

    Plan: row-local tokenize + explode -> one (doc, term) combinable
    count -> a vocab-sized document-frequency aggregate (vocabulary ≪
    corpus, so the join back broadcasts; else it's an equi-join on the
    term) -> per-doc top-k window (partitioned by doc id — maximal
    parallelism, each partition is one document's vocabulary).  The
    corpus total rides a one-row broadcast cross join, never a driver
    collect."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_count")
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score_milli"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score_milli", F.expr("tf * ((n_docs * 1000) div df_count)"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df_count", "score_milli", F.col("rnk").cast("int").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Frozen-vocab subword tokenizer (round 7)
# ---------------------------------------------------------------------------

# A small frozen BPE-style merge vocabulary: common English subwords +
# every single letter/digit + common punctuation.  FROZEN means the list
# is the versioned artifact itself — training-side token budgets are only
# reproducible if the vocab bytes never drift, so treat edits as a new
# vocab version (consumers pin semantics to SUBWORD_VOCAB_VERSION).
SUBWORD_VOCAB_VERSION = 1
SUBWORD_VOCAB: list[str] = [
    # 4-char merges
    "tion", "able", "ness", "ment", "less", "ship", "ould", "ight",
    "ance", "ence", "ound", "ting", "ers", "ing", "ion", "the", "and",
    # 3-char merges
    "ent", "ati", "for", "her", "ter", "hat", "tha", "ere", "ate", "his",
    "con", "res", "ver", "all", "ons", "nce", "men", "ith", "ted", "pro",
    "thi", "wit", "are", "ess", "not", "ive", "was", "ect", "rea", "com",
    "eve", "per", "int", "est", "sta", "cti", "ica", "ist", "ear", "ain",
    "one", "our", "iti", "rat", "you", "out",
    # 2-char merges
    "qu", "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st",
    "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co",
    "me", "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li",
    "ch", "ll", "be", "ma", "si", "om", "ur",
    # single characters (letters, digits, common marks) — the fallback
    # tier that keeps ASCII text unknown-free
    *"abcdefghijklmnopqrstuvwxyz",
    *"0123456789",
    ".", ",", ";", ":", "!", "?", "'", '"', "-", "(", ")",
]


def subword_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with the FROZEN vocab: BPE-ish pre-tokenization
    (``BPE_ISH_PATTERN`` — letter runs / digit runs / single marks),
    lowercase, then greedy longest-match against ``SUBWORD_VOCAB`` from
    the left; a character no vocab entry covers becomes one unknown
    token.  Exactly the semantics a DuckDB recursive CTE can replay, so
    the whole tokenizer is oracle-checkable (n_subwords, n_unknown, and
    the vocab-id checksum all hash-compared).

    Output per document: ``n_pretokens`` (equals ``bpe_token_count`` on
    ASCII by construction), ``n_subwords`` (the real token budget —
    drop-in for the ``n_tokens`` consumers: pack_sequences, source_mix,
    corpus token stats), ``n_unknown``, and ``vid_sum`` (sum of 1-based
    vocab indexes of every matched piece — pins WHICH pieces matched,
    not just how many).

    Arrow-batched mapInPandas; the Python loop is the honest cost of a
    real tokenizer (a production deployment would swap in a compiled
    tokenizer behind the same signature).  Row-local: zero shuffles,
    embarrassingly parallel, text bytes never leave their scan partition.
    Determinism caveat: python-re vs RE2 ``\\s`` agree on ASCII; for
    corpora with unicode whitespace, normalize first."""
    import pandas as pd

    vocab = list(SUBWORD_VOCAB)
    vid = {t: i + 1 for i, t in enumerate(vocab)}
    max_len = max(map(len, vocab))
    pattern = BPE_ISH_PATTERN

    def batches(it):
        import re

        rx = re.compile(pattern)
        for pdf in it:
            out = {
                id_col: [], "n_pretokens": [], "n_subwords": [],
                "n_unknown": [], "vid_sum": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                n_pt = n_sub = n_unk = vsum = 0
                for pt in rx.findall(text or ""):
                    pt = pt.lower()
                    n_pt += 1
                    pos, n = 0, len(pt)
                    while pos < n:
                        for length in range(min(max_len, n - pos), 0, -1):
                            i = vid.get(pt[pos : pos + length])
                            if i is not None:
                                vsum += i
                                pos += length
                                break
                        else:
                            n_unk += 1
                            pos += 1
                        n_sub += 1
                out[id_col].append(did)
                out["n_pretokens"].append(n_pt)
                out["n_subwords"].append(n_sub)
                out["n_unknown"].append(n_unk)
                out["vid_sum"].append(vsum)
            yield pd.DataFrame(out)

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("n_pretokens", LongType(), False),
            StructField("n_subwords", LongType(), False),
            StructField("n_unknown", LongType(), False),
            StructField("vid_sum", LongType(), False),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Frozen unigram LM quality scoring (round 7)
# ---------------------------------------------------------------------------

# CCNet-style perplexity filtering needs a language model; the engine's
# deterministic stand-in is a FROZEN unigram table of integer
# milli-log-probabilities (smaller = more probable).  Like SUBWORD_VOCAB,
# the table is the versioned artifact: values are arbitrary but fixed —
# what matters for curation is the stable ORDERING it induces over
# documents, reproducible across engines because every step is integer.
LM_VOCAB_VERSION = 1
LM_UNKNOWN_MILLI = 12_000  # penalty for out-of-vocabulary tokens
LM_VOCAB: list[tuple[str, int]] = [
    # (token, milli_logprob): common English words, frozen pseudo-Zipf
    # values 1500..~7000 (rank-correlated, deterministic formula)
    (w, 1500 + i * 55 + (i * i * 7) % 97)
    for i, w in enumerate(
        [
            "the", "of", "and", "a", "to", "in", "is", "was", "that", "for",
            "it", "on", "with", "he", "be", "i", "by", "as", "at", "you",
            "are", "his", "had", "not", "this", "have", "from", "but",
            "which", "she", "they", "or", "an", "her", "were", "there",
            "we", "their", "been", "has", "will", "one", "all", "would",
            "can", "if", "who", "more", "when", "said", "do", "what",
            "about", "out", "up", "time", "than", "into", "only", "some",
            "could", "them", "other", "then", "its", "these", "two", "may",
            "first", "any", "my", "now", "such", "like", "our", "over",
            "man", "me", "even", "most", "made", "after", "also", "did",
            "many", "before", "must", "through", "years", "where", "much",
            "way", "well", "down", "should", "because", "each", "just",
            "those", "people",
        ]
    )
]


def unigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document LM quality proxy from the frozen unigram table:
    tokenize (lowercased ``\\W+`` split), sum each token's
    milli-log-probability (out-of-vocabulary tokens pay
    ``LM_UNKNOWN_MILLI``), and derive the integer per-token mean — the
    perplexity-proxy curation filters rank on (CCNet keeps the
    low-perplexity head/middle).

    Entirely native row-local expressions: a map-literal lookup inside a
    higher-order ``transform`` + ``aggregate`` fold — ZERO shuffles, no
    Python, linear in text bytes at any corpus size.  All integers, so
    the DuckDB oracle replays it exactly (VALUES join + group)."""
    lm = F.create_map(
        *[x for w, m in LM_VOCAB for x in (F.lit(w), F.lit(m))]
    )
    # NULL text scores like empty text (the SQL unnest/left-join replay
    # yields 0 rows for NULL — a bare split(NULL) would propagate NULL
    # counts instead)
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
        lambda x: x != "",
    )
    scores = F.transform(
        toks,
        lambda t: F.coalesce(F.element_at(lm, t), F.lit(LM_UNKNOWN_MILLI)).cast(
            "long"
        ),
    )
    total = F.aggregate(
        scores, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(toks).cast("long")
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens_scored"),
        total.alias("milli_logprob_sum"),
    ).withColumn(
        # exact integer division (no float round-trip): the mean
        # milli-log-probability per token, the rank key curation uses
        "milli_ppl_proxy",
        F.expr("milli_logprob_sum div greatest(n_tokens_scored, 1)"),
    )


BIGRAM_VERSION = 1
LM_BACKOFF_MILLI = 916  # stupid-backoff penalty: -1000*log(0.4), rounded
LM_BIGRAMS: list[tuple[str, str, int]] = [
    # (prev, token, milli_logprob): frozen common-English bigram table;
    # costs are deterministic (rank-correlated formula) and CHEAPER than
    # the unigram fallback, as a conditional model should be
    (v, w, 600 + i * 45 + (i * i * 11) % 83)
    for i, (v, w) in enumerate(
        [
            ("of", "the"), ("in", "the"), ("to", "the"), ("on", "the"),
            ("and", "the"), ("for", "the"), ("at", "the"), ("from", "the"),
            ("with", "the"), ("by", "the"), ("it", "is"), ("it", "was"),
            ("there", "is"), ("there", "was"), ("this", "is"),
            ("he", "was"), ("she", "was"), ("they", "were"), ("we", "are"),
            ("you", "are"), ("i", "have"), ("i", "was"), ("i", "am"),
            ("to", "be"), ("will", "be"), ("can", "be"), ("would", "be"),
            ("has", "been"), ("have", "been"), ("had", "been"),
            ("do", "not"), ("did", "not"), ("does", "not"), ("is", "not"),
            ("was", "not"), ("one", "of"), ("some", "of"), ("all", "of"),
            ("out", "of"), ("because", "of"), ("such", "as"), ("as", "well"),
            ("more", "than"), ("rather", "than"), ("each", "other"),
            ("the", "first"), ("the", "most"), ("the", "same"),
        ]
    )
]


def bigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram LM quality proxy with stupid backoff — one
    modeling step closer to CCNet's KenLM filter than the unigram table:
    the first token pays its unigram cost; every following token pays the
    frozen bigram cost when (prev, token) is in ``LM_BIGRAMS``, else its
    unigram cost plus ``LM_BACKOFF_MILLI`` (-1000·log 0.4 — Brants et
    al.'s stupid backoff, integer-quantized).  Fluent English (frequent
    continuations) scores lower than shuffled or boilerplate text with
    the same unigram profile — exactly the signal the unigram proxy
    cannot see.

    Entirely native row-local expressions: two map literals probed inside
    higher-order folds — ZERO shuffles, no Python, linear in text bytes.
    All integers, so the DuckDB oracle replays it exactly (two VALUES
    joins + group)."""
    uni = F.create_map(
        *[x for w, m in LM_VOCAB for x in (F.lit(w), F.lit(m))]
    )
    big = F.create_map(
        *[
            x
            for v, w, m in LM_BIGRAMS
            for x in (F.lit(f"{v} {w}"), F.lit(m))
        ]
    )
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
        lambda x: x != "",
    )

    def uni_cost(t):
        return F.coalesce(F.element_at(uni, t), F.lit(LM_UNKNOWN_MILLI)).cast(
            "long"
        )

    out = docs.select(F.col(id_col), toks.alias("__t"))
    n = F.size("__t").cast("long")
    first = F.when(n >= 1, uni_cost(F.element_at("__t", F.lit(1)))).otherwise(
        F.lit(0).cast("long")
    )
    # sequence(2, n) would DESCEND for n < 2 — guard the whole fold
    pair_costs = F.transform(
        F.sequence(F.lit(2), n.cast("int")),
        lambda i: F.coalesce(
            F.element_at(
                big,
                F.concat(
                    F.element_at("__t", (i - 1).cast("int")),
                    F.lit(" "),
                    F.element_at("__t", i.cast("int")),
                ),
            ).cast("long"),
            uni_cost(F.element_at("__t", i.cast("int")))
            + F.lit(LM_BACKOFF_MILLI),
        ),
    )
    rest = F.when(
        n >= 2,
        F.aggregate(pair_costs, F.lit(0).cast("long"), lambda a, x: a + x),
    ).otherwise(F.lit(0).cast("long"))
    return out.select(
        F.col(id_col),
        n.alias("n_tokens_scored"),
        (first + rest).alias("milli_logprob_sum"),
    ).withColumn(
        "milli_ppl_proxy",
        F.expr("milli_logprob_sum div greatest(n_tokens_scored, 1)"),
    )


# ---------------------------------------------------------------------------
# Luhn-validated card-number screening (round 7)
# ---------------------------------------------------------------------------


def _luhn_sum_sql(var: str) -> str:
    """SQL for the Luhn checksum of digit-string ``var``: standard
    right-to-left doubling of every 2nd digit, digits-of-double summed.
    Pure native expressions (sequence/transform/aggregate + ascii math) —
    identical semantics in Spark SQL and (with list_sum/``//``) DuckDB."""
    d = f"(ascii(substr(reverse({var}), i, 1)) - 48)"
    return (
        f"aggregate(transform(sequence(1, length({var})), "
        f"i -> CASE WHEN i % 2 = 0 THEN (({d} * 2) div 10) + (({d} * 2) % 10) "
        f"ELSE {d} END), 0L, (a, x) -> a + x)"
    )


CARD_PATTERN = r"\b\d{13,19}\b"


def card_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII screen, precision tier: find 13-19-digit runs and validate
    them with the Luhn checksum — a bare ``\\d{13,}`` PII pattern flags
    any long number (order ids, timestamps); the checksum keeps only
    plausibly-real payment-card numbers, the highest-severity PII class.

    Per doc: ``n_candidates`` (digit runs of card length),
    ``n_valid_cards`` (Luhn-passing), ``has_valid_card``.  Entirely
    native row-local expressions (regexp + a higher-order fold per
    candidate): ZERO shuffles, no Python, linear in text bytes."""
    # CARD_PATTERN is a plain Python regex; embedding it in a Spark SQL
    # string literal requires escaping the backslashes once more.
    sql_pattern = CARD_PATTERN.replace("\\", "\\\\")
    cands = (
        f"regexp_extract_all(coalesce({text_col}, ''), '{sql_pattern}', 0)"
    )
    luhn = _luhn_sum_sql("c")
    return docs.select(
        F.col(id_col),
        F.expr(f"cast(size({cands}) as bigint)").alias("n_candidates"),
        F.expr(
            f"cast(size(filter({cands}, c -> {luhn} % 10 = 0)) as bigint)"
        ).alias("n_valid_cards"),
    ).withColumn("has_valid_card", F.col("n_valid_cards") > 0)


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (round 8)
# ---------------------------------------------------------------------------

# Stop-word presence list from the Gopher quality rules (Rae et al. 2021,
# arXiv:2112.11446, Table A1): a document must contain at least
# ``min_stopwords`` DISTINCT members to pass the stop-word rule.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: int = 3,
    max_mean_wlen: int = 10,
    max_symbol_milli: int = 100,
    max_bullet_milli: int = 900,
    max_ellipsis_milli: int = 300,
    min_alpha_milli: int = 800,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-paper quality-rule screen (Rae et al. 2021, arXiv:2112.11446
    §A1.1): per-document boolean flags for the published heuristics plus a
    combined ``keep``.

    Every rule is evaluated as INTEGER arithmetic with cross-multiplied
    thresholds (``1000 * n_symbols <= max_symbol_milli * n_words`` instead
    of a float ratio), so the verdicts are bit-deterministic and replay
    exactly in the DuckDB oracle.  All computation is row-local JVM column
    expressions — ZERO shuffles, no Python; at 100 TB this is a map-only
    pass that pipelines into whatever shuffle the consumer adds.

    Rules (thresholds in parts-per-thousand where ratios are involved):
      * word count within [min_words, max_words]
      * mean word length within [min_mean_wlen, max_mean_wlen]
      * symbol-to-word ratio ('#' and '...') <= max_symbol_milli/1000
      * fraction of lines starting with a bullet ('-'/'*') <= max_bullet_milli/1000
      * fraction of lines ending with '...' <= max_ellipsis_milli/1000
      * fraction of words containing an alphabetic char >= min_alpha_milli/1000
      * at least min_stopwords DISTINCT members of GOPHER_STOPWORDS present
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    words_lc = F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")
    lines = F.split(t, "\n")
    out = docs.withColumns(
        {
            "n_words": F.size(words).cast("long"),
            "sum_wchars": F.length(F.regexp_replace(t, r"\s", "")).cast("long"),
            "n_symbols": (occurrences(t, "#") + occurrences(t, "...")).cast("long"),
            "n_lines": F.size(lines).cast("long"),
            "n_bullet_lines": F.size(
                F.filter(
                    lines,
                    lambda l: F.startswith(F.ltrim(l), F.lit("-"))
                    | F.startswith(F.ltrim(l), F.lit("*")),
                )
            ).cast("long"),
            "n_ellipsis_lines": F.size(
                F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("...")))
            ).cast("long"),
            "n_alpha_words": F.size(
                F.filter(words, lambda w: w.rlike("[A-Za-z]"))
            ).cast("long"),
            "n_stop_distinct": sum(
                (
                    F.array_contains(words_lc, sw).cast("long")
                    for sw in GOPHER_STOPWORDS
                ),
                start=F.lit(0).cast("long"),
            ),
        }
    )
    nw, nl = F.col("n_words"), F.col("n_lines")
    flags = {
        "word_count_ok": (nw >= min_words) & (nw <= max_words),
        "mean_wlen_ok": (
            (F.col("sum_wchars") >= F.lit(min_mean_wlen) * nw)
            & (F.col("sum_wchars") <= F.lit(max_mean_wlen) * nw)
        ),
        "symbol_ok": F.lit(1000) * F.col("n_symbols") <= F.lit(max_symbol_milli) * nw,
        "bullet_ok": F.lit(1000) * F.col("n_bullet_lines")
        <= F.lit(max_bullet_milli) * nl,
        "ellipsis_ok": F.lit(1000) * F.col("n_ellipsis_lines")
        <= F.lit(max_ellipsis_milli) * nl,
        "alpha_ok": F.lit(1000) * F.col("n_alpha_words")
        >= F.lit(min_alpha_milli) * nw,
        "stopword_ok": F.col("n_stop_distinct") >= min_stopwords,
    }
    out = out.withColumns(flags)
    keep = F.lit(True)
    for name in flags:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def df_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
) -> DataFrame:
    """Per-term document-frequency drift screen between a REFERENCE
    corpus snapshot and fresh data (r12) — the vocabulary-shift check a
    training pipeline runs next to the value-distribution KS screen:
    a topic surge, a new boilerplate template, or a scraper regression
    all announce themselves as terms whose document rate moved.

    Per term appearing in >= ``min_df`` documents on either side:

        rate_ratio_ppm = (df_cur * n_ref * 1_000_000)
                         div (df_ref * n_cur)

    the EXACT cross-multiplied ratio of document rates in ppm (1e6 =
    unchanged; NULL when the term is one-sided — flagged by
    ``is_new`` / ``is_gone`` instead, which IS the strongest drift
    signal).  Tokenization is the shared lower/\\W+ split.

    An EMPTY (or all-NULL-text) reference fails fast executor-side —
    the ks_reference lesson (stats.py): a drift screen that reads
    "everything is new" against a misconfigured reference is noise,
    and one that reads "no drift" is worse; neither is an answer.

    Returns ``(term, df_ref, df_cur, rate_ratio_ppm, is_new,
    is_gone)``.

    Scale posture (100 TB): per side one row-local tokenize + a
    (doc, term) distinct + a term-keyed combinable census; the censuses
    full-outer-join on the term key; the corpus totals ride one-row
    broadcast cross joins (never a driver collect).  Overflow: BOTH
    sides of the cross-multiply run in DECIMAL(38,0) — exact past any
    real corpus size, no 2^62 envelope, no wrap on either the
    numerator or ``df_ref * n_cur`` (r12 ADVICE).
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")

    def census(docs: DataFrame, out: str) -> DataFrame:
        return (
            docs.select(
                F.col(id_col),
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), r"\W+"),
                        lambda x: x != "",
                    )
                ).alias("term"),
            )
            .distinct()
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    nr = ref.agg(
        F.count(F.when(F.col(text_col).isNotNull(), F.lit(1)))
        .cast("bigint")
        .alias("__nr")
    ).select(
        # empty-reference fail-fast, threaded into the column every
        # output row consumes (the ks_reference pattern)
        F.when(F.col("__nr") > 0, F.col("__nr"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "df_drift: the reference corpus is empty (or "
                    "all-NULL text) — a vocabulary-drift screen "
                    "against nothing is not an answer; supply a "
                    "non-empty reference"
                )
            ).cast("bigint")
        )
        .alias("__nr")
    )
    # same non-NULL-text convention as __nr: both document-rate
    # denominators count documents WITH text (r12 ADVICE — mixed
    # conventions skew every ratio when cur carries NULL-text rows)
    nc = cur.agg(
        F.count(F.when(F.col(text_col).isNotNull(), F.lit(1)))
        .cast("bigint")
        .alias("__nc")
    )
    joined = (
        census(ref, "df_ref")
        .join(census(cur, "df_cur"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("df_ref", F.lit(0)).alias("df_ref"),
            F.coalesce("df_cur", F.lit(0)).alias("df_cur"),
        )
        .filter(F.greatest(F.col("df_ref"), F.col("df_cur")) >= min_df)
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
    )
    # both sides of the cross-multiply ride DECIMAL(38,0): the old
    # BIGINT path guarded only the numerator against 2^62 and left
    # df_ref * __nc to wrap (r12 ADVICE) — the decimal product is
    # exact past any real corpus size, no envelope needed
    _d = "decimal(38,0)"
    num = (
        F.col("df_cur").cast(_d)
        * F.col("__nr").cast(_d)
        * F.lit(1_000_000).cast(_d)
    )
    den = F.col("df_ref").cast(_d) * F.col("__nc").cast(_d)
    return joined.select(
        "term",
        "df_ref",
        "df_cur",
        F.when(
            (F.col("df_ref") > 0) & (F.col("df_cur") > 0),
            ((num - (num % den)) / den).cast("bigint"),
        ).alias("rate_ratio_ppm"),
        (F.col("df_ref") == 0).alias("is_new"),
        (F.col("df_cur") == 0).alias("is_gone"),
    )


def collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_pair_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by LIFT (r12) — the PMI-class
    collocation miner ("new york"-finder) next to the frequency-ranked
    ``top_terms``/``corpus_top_ngrams``: frequency finds what is
    common, lift finds what CO-OCCURS more than its parts predict.

        lift_ppm = (c_ab * n_bigrams * 1_000_000)
                   div (c_a * c_b)

    an exact DECIMAL(38,0) cross-multiply with one truncating division
    — monotone in PMI (log is monotone), so ranking by lift_ppm IS the
    PMI ranking with zero float computation; ties break on the bigram
    text.  ``c_a``/``c_b`` count the words' occurrences as a bigram
    MEMBER (left or right slot, interior words counted twice — the
    symmetric convention, stated), over the same lower/\\W+ tokens as
    every text operator; bigrams never cross document boundaries.

    Returns at most ``k`` rows: ``(w1, w2, pair_count, w1_count,
    w2_count, lift_ppm)`` ordered by (lift_ppm DESC, w1, w2).

    Scale posture (100 TB): row-local token arrays -> a row-local
    adjacent-pair transform (no self-join) -> one combinable bigram
    census; the member counts fold FROM that census (two term-keyed
    combinable aggregates over census-sized data, never re-reading the
    corpus); totals ride a one-row broadcast; the top-k lowers to
    TakeOrderedAndProject (no global sort materializes).  DECIMAL(38,0)
    keeps the cross-multiply exact to ~1e19-bigram corpora — no 2^62
    envelope needed where the BIGINT family required one.
    """
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
    )
    # the size >= 2 screen must come BEFORE sequence(1, size-1):
    # Spark's two-argument sequence counts DOWNWARD when the end is
    # below the start, so a one-token document would fabricate indices
    # [1, 0] and die in element_at (the chunk_documents pitfall)
    bigrams = (
        docs.select(toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.struct(
                        F.element_at("__t", i).alias("w1"),
                        F.element_at("__t", i + 1).alias("w2"),
                    ),
                )
            ).alias("__b")
        )
        .select("__b.w1", "__b.w2")
    )
    # ONE corpus-sized census; everything below folds from it.
    # Lazily checkpointed: three consumers (member counts x2, total)
    # would otherwise re-run the corpus scan (the dedup two-pass-valve
    # pattern).
    census = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .localCheckpoint(eager=False)
    )
    left = census.groupBy(F.col("w1").alias("term")).agg(
        F.sum("pair_count").alias("__c")
    )
    right = census.groupBy(F.col("w2").alias("term")).agg(
        F.sum("pair_count").alias("__c")
    )
    member = (
        left.unionByName(right)
        .groupBy("term")
        .agg(F.sum("__c").cast("bigint").alias("member_count"))
    )
    total = census.agg(
        F.coalesce(F.sum("pair_count"), F.lit(0)).cast("bigint").alias("__n")
    )
    d38 = "decimal(38,0)"
    num = (
        F.col("pair_count").cast(d38)
        * F.col("__n").cast(d38)
        * F.lit(1_000_000).cast(d38)
    )
    den = F.col("w1_count").cast(d38) * F.col("w2_count").cast(d38)
    lift = ((num - (num % den)) / den).cast("bigint")
    return (
        census.filter(F.col("pair_count") >= min_pair_count)
        .join(
            member.select(
                F.col("term").alias("w1"), F.col("member_count").alias("w1_count")
            ),
            "w1",
        )
        .join(
            member.select(
                F.col("term").alias("w2"), F.col("member_count").alias("w2_count")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .withColumn("lift_ppm", lift)
        .select("w1", "w2", "pair_count", "w1_count", "w2_count", "lift_ppm")
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(k)
    )


def vocab_growth(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: tuple[int, ...] = (1, 10, 100),
) -> DataFrame:
    """Heaps-law vocabulary-growth report (r13) — the corpus-health
    curve a pipeline owner reads before scaling a crawl: natural text
    grows vocabulary ~ T^beta (beta ~ 0.5); a template farm or a
    de-randomized scrape flattens the curve (vocab saturates), while
    spam/boilerplate injection steepens it.  Measured over NESTED
    deterministic corpus prefixes (``doc_id mod max(bands) < b`` for
    each band b — every smaller band is a subset of every larger), so
    the growth ratios are exact set statements, not a float fit.

    Per band: ``(band, n_docs, n_tokens, n_terms,
    tokens_growth_ppm, terms_growth_ppm, terms_per_mtoken)`` where the
    growth columns are the exact ppm ratio vs the PREVIOUS band (NULL
    on the first) and ``terms_per_mtoken = (n_terms * 1e6) div
    n_tokens`` is the running lexical-density KPI.  The Heaps
    signature: terms_growth well under tokens_growth, and
    terms_per_mtoken falling as the corpus grows.  Tokenization is the
    shared lower/\\W+ split; NULL texts contribute nothing.

    Scale posture (100 TB): one row-local tokenize/explode pass into
    ONE (term, first_band) combinable census (per term: the smallest
    band containing it, plus token counts per band slot) — then the
    per-band report folds from census-sized data with a bands-sized
    window.  No data-sized join or window; never 3 passes over the
    corpus.
    """
    if sorted(bands) != list(bands) or len(set(bands)) != len(bands):
        raise ValueError(f"bands must be strictly increasing, got {bands}")
    if any(b < 1 for b in bands):
        raise ValueError(f"bands must be positive, got {bands}")
    from pyspark.sql import Window

    mod = max(bands)
    tokens = docs.select(
        (F.col(id_col) % F.lit(mod)).alias("__slot"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"),
                lambda x: x != "",
            )
        ).alias("__term"),
    )
    # per term: token count per band + the smallest band that sees it
    band_tok = [
        F.sum((F.col("__slot") < b).cast("bigint")).alias(f"__tok_{b}")
        for b in bands
    ]
    first_band = F.least(
        *[
            F.min(
                F.when(F.col("__slot") < b, F.lit(b)).otherwise(
                    F.lit(None).cast("int")
                )
            )
            for b in bands
        ]
    )
    census = tokens.groupBy("__term").agg(*band_tok, first_band.alias("__fb"))
    per_band = census.groupBy().agg(
        *[
            F.sum(f"__tok_{b}").cast("bigint").alias(f"__toks_{b}")
            for b in bands
        ],
        *[
            F.sum((F.col("__fb") <= b).cast("bigint"))
            .cast("bigint")
            .alias(f"__terms_{b}")
            for b in bands
        ],
    )
    rows = per_band.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"__toks_{b}").alias("n_tokens"),
                        F.col(f"__terms_{b}").alias("n_terms"),
                    )
                    for b in bands
                ]
            )
        ).alias("__r")
    ).select("__r.band", "__r.n_tokens", "__r.n_terms")
    n_docs = docs.groupBy().agg(
        *[
            F.sum(
                (
                    (F.col(id_col) % F.lit(mod) < b)
                    & F.col(text_col).isNotNull()
                ).cast("bigint")
            )
            .cast("bigint")
            .alias(f"__docs_{b}")
            for b in bands
        ]
    )
    docs_rows = n_docs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"__docs_{b}").alias("n_docs"),
                    )
                    for b in bands
                ]
            )
        ).alias("__d")
    ).select("__d.band", "__d.n_docs")
    w = Window.orderBy("band")  # bands-sized spine (len(bands) rows)
    out = rows.join(F.broadcast(docs_rows), "band")
    prev_tok = F.lag("n_tokens").over(w)
    prev_term = F.lag("n_terms").over(w)
    return out.select(
        "band",
        "n_docs",
        "n_tokens",
        "n_terms",
        F.when(prev_tok > 0, (F.col("n_tokens") * 1_000_000))
        .cast("bigint")
        .alias("__num_tok"),
        F.when(prev_term > 0, (F.col("n_terms") * 1_000_000))
        .cast("bigint")
        .alias("__num_term"),
        prev_tok.alias("__prev_tok"),
        prev_term.alias("__prev_term"),
    ).select(
        "band",
        "n_docs",
        "n_tokens",
        "n_terms",
        F.expr("__num_tok div __prev_tok").alias("tokens_growth_ppm"),
        F.expr("__num_term div __prev_term").alias("terms_growth_ppm"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(n_terms * 1000000) div n_tokens"),
        ).alias("terms_per_mtoken"),
    )


def _run_count(text: Column, char_class: str) -> Column:
    """Count of maximal runs of a regex character class, via the
    double-replace length identity: replacing each run with a single
    marker shrinks the string by (run_chars - 1) per run, replacing
    with '' shrinks by run_chars — the difference is the run count.
    Integer-exact and portable: the same `[...]+` pattern means the
    same thing to Java regex and RE2, and both engines' replace-all
    are applied (Spark regexp_replace is global; DuckDB takes 'g')."""
    pat = f"[{char_class}]+"
    return (
        F.length(F.regexp_replace(text, pat, "#"))
        - F.length(F.regexp_replace(text, pat, ""))
    ).cast("long")


def readability(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Corpus readability per group — Flesch reading ease and the
    Flesch-Kincaid grade level, the curation screen that separates
    "encyclopedia prose" from "keyword soup" sources before a
    training-mix decision (a complement to gopher_rules' structural
    gates: those catch boilerplate, this scores the prose itself).

    Counting conventions, all integer-exact and engine-portable:

    - words      = non-empty whitespace tokens (the gopher convention)
    - sentences  = maximal runs of ``[.!?]``  (run-count identity —
      "Stop!!" and "Stop." both end one sentence)
    - syllables  = maximal lowercase vowel runs ``[aeiouy]+`` (the
      classic one-vowel-group-per-syllable proxy; stated convention —
      all-consonant tokens contribute zero)

    group sums feed the exact milli formulas (one truncating division
    per ratio, replayed verbatim by the oracle; W = words,
    S = sentences, Y = syllables):

        flesch_milli   = 206835 − (1015·W) div S − (84600·Y) div W
        fk_grade_milli = (390·W) div S + (11800·Y) div W − 15590

    Flesch is legitimately negative for dense prose (the subtraction
    is BIGINT, never a division of negatives); groups with zero words
    or zero sentences emit NULL scores, never fake zeros.  NULL text
    rows are excluded.

    Returns ``(*group_cols, n_docs, n_words, n_sentences, n_syllables,
    flesch_milli, fk_grade_milli)``.

    Scale posture (100 TB): per-row JVM regex/length expressions (no
    Python, no explode — three regexp_replace passes per document)
    into ONE combinable groupBy; the ratio algebra runs on one row per
    group.  W ≤ 2^63/84600 ≈ 1e14 words per group before overflow —
    envelope-checked via the documented BIGINT headroom, not guarded
    (a corpus 100× the public web would still fit).

    Engine extension — the reference (exporter.py:75-141) has no text
    tier; formulas per Flesch (1948) / Kincaid et al. (1975).
    """
    groups = group_cols or []
    text = F.col(text_col)
    base = docs.filter(text.isNotNull()).select(
        *groups,
        token_count(text).alias("__w"),
        _run_count(text, ".!?").alias("__s"),
        _run_count(F.lower(text), "aeiouy").alias("__y"),
    )
    g = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__s").cast("bigint").alias("n_sentences"),
        F.sum("__y").cast("bigint").alias("n_syllables"),
    )
    return g.select(
        *groups,
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CASE WHEN n_words > 0 AND n_sentences > 0 THEN "
            "206835 - (1015 * n_words) div n_sentences "
            "- (84600 * n_syllables) div n_words END"
        )
        .cast("bigint")
        .alias("flesch_milli"),
        F.expr(
            "CASE WHEN n_words > 0 AND n_sentences > 0 THEN "
            "(390 * n_words) div n_sentences "
            "+ (11800 * n_syllables) div n_words - 15590 END"
        )
        .cast("bigint")
        .alias("fk_grade_milli"),
    )


def char_entropy(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Character-level Shannon entropy per group — the
    information-density screen that separates natural prose (~4.1 nats
    is typical English char entropy ceiling ln(26)≈3.26 for letters
    alone; real text with space/punct sits lower per symbol) from
    keyboard-mash, base64 blobs (near ln(64)) and template boilerplate
    (far below the corpus norm) — the curation companion to
    :func:`readability` (that one scores prose STRUCTURE, this one
    scores symbol usage).

        H          = ln(n) − (Σ c·ln c)/n      (nats; c = char count)
        efficiency = H / ln(k)                  (share of the k-symbol
                                                 alphabet's capacity)

    Determinism: the only float reduction, ``Σ c·ln(c)``, runs as a
    FIXED-ORDER left fold over the char census sorted by char (UTF-8
    binary order in both engines) — Spark ``aggregate`` and DuckDB
    ``list_reduce(list(... ORDER BY ch))`` replay the identical
    addition sequence on identical exact integer inputs, so the
    rounded-6 doubles are bit-equal (the binned_psi technique).
    Groups with no characters emit NULL entropy; single-symbol groups
    emit entropy 0 and NULL efficiency (ln 1 = 0).

    Returns ``(*group_cols, n_chars, n_distinct_chars, entropy,
    efficiency)``.

    Scale posture (100 TB): the per-char explode pipelines into the
    partial hash aggregate inside one whole-stage-codegen span (chars
    are never materialized to a shuffle — the ONE exchange carries the
    (group, char) census, bounded by the alphabet).  The per-group
    fold then runs row-local over alphabet-sized arrays.  No join, no
    window, no Python.

    Engine extension — the reference (exporter.py:75-141) has no text
    tier; estimator per Shannon (1948).
    """
    groups = group_cols or []
    text = F.col(text_col)
    census = (
        docs.filter(text.isNotNull())
        .select(*groups, F.explode(F.split(text, "")).alias("__ch"))
        .filter(F.col("__ch") != "")
        .groupBy(*groups, "__ch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    g = census.groupBy(*groups).agg(
        F.sum("__cnt").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        F.array_sort(
            F.collect_list(F.struct("__ch", "__cnt"))
        ).alias("__rows"),
    )
    s = F.expr(
        """
        aggregate(
          __rows,
          CAST(0.0 AS DOUBLE),
          (acc, r) -> acc
            + CAST(r.__cnt AS DOUBLE) * ln(CAST(r.__cnt AS DOUBLE))
        )
        """
    )
    n_d = F.col("n_chars").cast("double")
    k_d = F.col("n_distinct_chars").cast("double")
    ent = F.log(n_d) - F.col("__s") / n_d
    return (
        g.withColumn("__s", s)
        .select(
            *groups,
            "n_chars",
            "n_distinct_chars",
            F.when(F.col("n_chars") > 0, F.round(ent, 6)).alias("entropy"),
            F.when(
                (F.col("n_chars") > 0) & (F.col("n_distinct_chars") > 1),
                F.round(ent / F.log(k_d), 6),
            ).alias("efficiency"),
        )
    )


def vocab_gini(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini concentration of the token-frequency distribution per group
    — the template-detector: a source whose token mass concentrates in
    a few terms (boilerplate, navigation chrome, generated filler)
    reads near 1; diverse prose sits lower.  The vocabulary-side
    companion to :func:`char_entropy` (symbols) and ``vocab_growth``
    (Heaps' law counts vocabulary, this measures how UNEQUALLY it is
    used).

    Exact integer algebra end to end: with term frequencies f_i sorted
    ascending (rank i = 1..V, ties broken by the term string — the
    rank-block sum is tie-order invariant, the ordering is just the
    determinism contract):

        gini_ppm = (1e6 · Σ (2i − V − 1)·f_i) div (V · Σf)

    the standard discrete Gini cleared of rationals — one truncating
    DECIMAL(38,0) division replayed verbatim by the HUGEINT oracle.
    Single-term groups emit NULL (V = 1 has no inequality to measure).
    Tokenization is the shared lower/\\W+ split; NULL text rows are
    excluded.

    Returns ``(*group_cols, n_terms, n_tokens, gini_ppm)``.

    Scale posture (100 TB): the token explode pipelines into the
    partial hash aggregate (one codegen span — tokens never hit a
    shuffle); the ONE data exchange carries the (group, term) census,
    bounded by vocabulary; the rank window and the final fold run
    census-sized on the group key (the standing per-key contract).
    No join, no Python.

    Engine extension — the reference (exporter.py:75-141) has no text
    tier; coefficient per Gini (1912) in the standard discrete form.
    """
    groups = group_cols or []
    from pyspark.sql import Window

    text = F.col(text_col)
    census = (
        docs.filter(text.isNotNull())
        .select(
            *groups,
            F.explode(
                F.filter(
                    F.split(F.lower(text), r"\W+"), lambda x: x != ""
                )
            ).alias("__term"),
        )
        .groupBy(*groups, "__term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__f"))
    )
    w = (
        Window.partitionBy(*groups) if groups else Window.partitionBy()
    ).orderBy("__f", "__term")
    ranked = census.withColumn("__i", F.row_number().over(w))
    g = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("__f").cast("bigint").alias("n_tokens"),
        F.sum(
            (F.lit(2) * F.col("__i").cast("decimal(38,0)"))
            * F.col("__f").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("__s2if"),
    )
    # Σ(2i−V−1)f = Σ2if − (V+1)·Σf, assembled from exact parts
    dec = "cast({} as decimal(38,0))"
    num = (
        f"(1000000 * (__s2if - ({dec.format('n_terms')} + 1) "
        f"* {dec.format('n_tokens')}))"
    )
    den = f"({dec.format('n_terms')} * {dec.format('n_tokens')})"
    return g.select(
        *groups,
        "n_terms",
        "n_tokens",
        F.expr(
            f"CASE WHEN n_terms > 1 AND n_tokens > 0 THEN "
            f"CAST(({num}) div {den} AS BIGINT) END"
        ).alias("gini_ppm"),
    )
