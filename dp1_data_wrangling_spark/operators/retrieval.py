"""BM25 full-text retrieval — inverted-index scoring as DataFrame algebra.

The Lucene/Elasticsearch ranking workhorse (Robertson & Zaragoza, "The
probabilistic relevance framework: BM25 and beyond", 2009 — public
literature), re-expressed Spark-first: the "inverted index" is the
(term, doc) postings DataFrame, a broadcast hash join with the query
terms plays the posting-list lookup, and per-document accumulation is a
row-local ordered fold.  LLM data pipelines use exactly this shape for
retrieval-based decontamination, hard-negative mining, and
dedup-by-query probes.

Engine extension — the reference (a per-row export/import tool) has no
text-retrieval tier.

Determinism (the driver hash-compares values): tf saturation is ONE
IEEE-identical division of two exact BIGINTs — with k1 = 6/5 and
b = 3/4 the BM25 denominator clears to integers:

    tf_part = 44·tf·S / (20·tf·S + 6·S + 18·dl·N)      (S = Σ dl)

idf = ln((2N + 2)/(2df + 1)) — the Lucene non-negative form
ln(1 + (N − df + 0.5)/(df + 0.5)) with the fraction cleared (the raw
Robertson idf goes NEGATIVE for df > N/2, which breaks top-k on
stop-word-heavy corpora) — is the one transcendental: the
argument is an exact division, and engine libms agree to ≤ 1 ulp, so
per-term products and the ORDERED left-fold sum (Spark ``aggregate`` ==
DuckDB ``list_reduce`` bit-for-bit on the same addition order) land
within a few ulps — far inside the ``round(score, 6)`` grid every float
column in this engine ships behind.

Scale posture (100 TB): the corpus is tokenized ONCE (one explode +
one (doc, term) groupBy); corpus statistics (N, Σdl) are a one-row
aggregate broadcast back; query terms broadcast to the postings join so
only documents sharing a query term ever leave the scan (inverted-index
pruning, no all-pairs); the fold is row-local; the final top-k is one
window over (query, doc) SCORES — cardinality bounded by matching docs,
never |queries| × |corpus|.  Skew valve: a stop-word-class query term
matches everything — cap with ``max_df_ratio_milli`` (drop terms whose
df exceeds the ratio, the standard stop-list discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize(df: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """(id, term) token stream — lowercase ``\\W+`` split, empties
    dropped; the same cross-engine-safe tokenization the corpus-stats
    tier uses (regexp_split semantics agree between Spark and DuckDB
    for this pattern on ASCII text)."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
            )
        ).alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    max_df_ratio_milli: int = 1000,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (k1 = 1.2, b = 0.75).

    ``queries`` is a SMALL DataFrame (query_id, query_text) — it is
    broadcast; duplicate terms within one query count once (standard
    bag-of-words query semantics for short queries).  Returns
    ``(query_id, rank, doc_id, score)`` with ``score`` rounded to 6
    decimals and rank ties broken by doc_id.  Documents sharing no term
    with the query are never scored (inverted-index pruning).

    ``max_df_ratio_milli``: query terms whose document frequency
    exceeds this milli-ratio of the corpus are dropped (stop-word
    valve); 1000 keeps everything.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 1 <= max_df_ratio_milli <= 1000:
        raise ValueError(
            f"max_df_ratio_milli must be in [1, 1000], got {max_df_ratio_milli}"
        )
    toks = tokenize(docs, text_col=text_col, id_col=id_col)
    # postings: tf per (doc, term); dl recovered per doc by a window on
    # the SAME partitioning (no second scan of the raw text).  The
    # postings table is THE index — it feeds corpus stats, document
    # frequencies, and the match join, so checkpoint it once (the same
    # multi-reference discipline as connected_components' edge set;
    # without the cut the tokenize+groupBy subtree re-executes four
    # times and the plan balloons to 16 shuffles).
    postings = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
        .localCheckpoint(eager=True)
    )
    # corpus stats: one row (N docs, S total tokens), broadcast back
    stats = F.broadcast(
        postings.groupBy().agg(
            F.countDistinct(id_col).alias("__n"),
            F.sum("tf").cast("bigint").alias("__s"),
        )
    )
    # document frequency per term, semi-reduced to the QUERY vocabulary
    # first (broadcast both ways: qterms is tiny, and df-of-query-terms
    # is <= |query vocabulary| rows however large the corpus)
    qvocab = F.broadcast(
        tokenize(
            queries, text_col=query_text_col, id_col=query_id_col
        ).distinct()
    )
    qterms = F.broadcast(
        postings.join(qvocab.select("term").distinct(), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .join(qvocab, "term")
    )
    matched = (
        postings.join(qterms, "term")
        .crossJoin(stats)
        .filter(F.expr(f"1000 * df <= {max_df_ratio_milli} * __n"))
    )
    # per-term BM25, exact-rational form (see module docstring):
    #   tf_part = 44 tf S / (20 tf S + 6 S + 18 dl N)   one IEEE division
    #   idf     = ln((2N + 2) / (2df + 1))   Lucene form, one ln of one division
    scored = matched.withColumn(
        "__w",
        F.expr(
            "ln((2.0 * __n + 2.0) / (2.0 * df + 1.0))"
            " * ((44 * tf * __s) / (20 * tf * __s + 6 * __s + 18 * dl * __n))"
        ),
    )
    # ordered fold: sort per-(query, doc) term weights by term and sum
    # left-to-right — the addition order DuckDB's list_reduce replays
    folded = (
        scored.groupBy(query_id_col, id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("term"), F.col("__w")))
            ).alias("__tw")
        )
        .withColumn(
            "score",
            F.round(
                F.aggregate(
                    F.col("__tw"),
                    F.lit(0.0),
                    lambda acc, x: acc + x["__w"],
                ),
                6,
            ),
        )
    )
    rank_w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        folded.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def positional_postings(
    df: DataFrame, *, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, term) positional token stream — the positional inverted
    index's row form.  Positions are 0-based indexes into the
    empties-filtered token array (filter BEFORE positions, so both
    engines agree on the coordinate system)."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
            )
        ).alias("pos", "term"),
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    phrase_text_col: str = "phrase_text",
) -> DataFrame:
    """Exact phrase occurrence counts via positional postings — the
    relational form of Lucene's PhraseQuery (slop 0): a phrase of
    terms (t_0 .. t_{m-1}) occurs at anchor position p iff the document
    has t_i at p+i for EVERY offset i.  Joining the (phrase, offset,
    term) tokens against the postings on term and grouping by
    ``anchor = pos - offset`` turns that conjunction into a count: an
    anchor with all m DISTINCT offsets present is a match.  Distinct
    matters for phrases with repeated terms: offset i is satisfied only
    by the posting at p+i, so counting distinct offsets checks presence
    of every coordinate without letting one posting stand in for two.

    Returns one row per (phrase, matching doc):
    ``(phrase_id, doc_id, n_matches, first_pos)`` — occurrence count
    and the 0-based position of the earliest match.  Documents with no
    match produce no row (inverted-index pruning: only postings whose
    term appears in some phrase ever leave the scan).

    Scale posture (100 TB): the phrase table is tiny and broadcasts;
    postings join it on term (only matching terms survive the scan),
    and the single data shuffle is the (phrase, doc, anchor) count
    aggregate — map-side combinable, anchor-bounded.  The positional
    index rows are (id, int, term) — the same catalog-tier artifact
    class as the BM25 postings.
    """
    ptoks = positional_postings(
        phrases, text_col=phrase_text_col, id_col=phrase_id_col
    ).select(
        F.col(phrase_id_col), F.col("pos").alias("offset"), "term"
    )
    plen = ptoks.groupBy(phrase_id_col).agg(
        F.count("*").alias("__m")
    )
    postings = positional_postings(docs, text_col=text_col, id_col=id_col)
    anchored = (
        postings.join(F.broadcast(ptoks), "term")
        .select(
            phrase_id_col,
            id_col,
            (F.col("pos") - F.col("offset")).alias("anchor"),
            "offset",
        )
        .filter(F.col("anchor") >= 0)
    )
    hits = (
        anchored.groupBy(phrase_id_col, id_col, "anchor")
        .agg(F.countDistinct("offset").alias("__k"))
        .join(F.broadcast(plen), phrase_id_col)
        .filter(F.col("__k") == F.col("__m"))
    )
    return hits.groupBy(phrase_id_col, id_col).agg(
        F.count("*").alias("n_matches"),
        F.min("anchor").alias("first_pos"),
    )
