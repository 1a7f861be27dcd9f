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


def doc_length_postings(
    docs: DataFrame, *, text_col: str, id_col: str
) -> DataFrame:
    """Postings ``(id, term, tf, dl)`` — tf per (doc, term), dl
    recovered by a window over the SAME partitioning (no second scan of
    the raw text).  A pure per-document function of the text — the
    property the streaming index appender's exactness rests on."""
    return (
        tokenize(docs, text_col=text_col, id_col=id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
    )


def bm25_score_rank(
    matched: DataFrame,
    *,
    query_id_col: str,
    id_col: str,
    k: int,
    n_sql: str,
    s_sql: str,
) -> DataFrame:
    """The ONE BM25 scoring + fold + top-k block — shared by the online
    ``bm25_topk`` and the persisted-index ``bm25_query_index`` so the
    two paths cannot drift (their equality is a contract, not a test
    accident).  ``matched`` carries (query_id, id, tf, dl, df);
    ``n_sql`` / ``s_sql`` are SQL fragments for the corpus statistics
    (column names in the online path, exact integer literals in the
    index path — identical arithmetic trees either way).

    Per-term BM25, exact-rational form (module docstring):
      tf_part = 44 tf S / (20 tf S + 6 S + 18 dl N)   one IEEE division
      idf     = ln((2N + 2) / (2df + 1))   Lucene form, one ln of one division
    then the per-(query, doc) ordered fold (sort term weights by term,
    sum left-to-right — the addition order DuckDB's list_reduce
    replays) and the rank window (score desc, id asc, <= k)."""
    scored = matched.withColumn(
        "__w",
        F.expr(
            f"ln((2.0 * {n_sql} + 2.0) / (2.0 * df + 1.0))"
            f" * ((44 * tf * {s_sql}) / (20 * tf * {s_sql}"
            f" + 6 * {s_sql} + 18 * dl * {n_sql}))"
        ),
    )
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
    # r13 restructure (guide §2.3 "aggregate before you shuffle" /
    # §3.2 semi-reduction): nothing in BM25 needs the FULL corpus
    # postings.  Corpus statistics (N, S) fold out of row-local token
    # counts — a one-row zero-shuffle aggregate over the raw docs — and
    # the (doc, term) tf aggregation only matters for tokens that MATCH
    # a query term, so the broadcast semi-join moves BEFORE the groupBy.
    # The full-corpus (doc, term) shuffle, its doc-length window and the
    # eager full-postings checkpoint (the previous shape) are gone: the
    # only shuffled rows are query-term occurrences.  tf/dl/df/N/S are
    # value-identical, so scores and ranks are bit-identical.
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
        ).alias("__toks"),
    ).select(F.col(id_col), F.size("__toks").alias("dl"), F.col("__toks"))
    # one-row corpus stats: N = docs holding >= 1 token, S = Σ dl.
    # Row counts, not countDistinct — a distinct would force a full
    # shuffle by id, and the id column is unique per row by the same
    # postings contract tf already rests on (duplicate ids would
    # double-count tf in any shape).  Fully map-side combinable:
    # zero data shuffle, one single-partition gather of partials.
    stats = F.broadcast(
        toks.agg(
            F.sum(F.when(F.col("dl") >= 1, 1).otherwise(0))
            .cast("bigint")
            .alias("__n"),
            F.sum("dl").cast("bigint").alias("__s"),
        )
    )
    qvocab = F.broadcast(
        tokenize(
            queries, text_col=query_text_col, id_col=query_id_col
        ).distinct()
    )
    # query-term occurrences only; the tf groupBy and everything after
    # it run over this semi-reduced stream.  df is a count-window over
    # the SAME stream (one narrow exchange on term, over query-term
    # postings only) instead of a dependent broadcast chain — the
    # stream is consumed once, so it needs no checkpoint.
    matched_tf = (
        toks.select(F.col(id_col), F.col("dl"), F.explode("__toks").alias("term"))
        .join(F.broadcast(qvocab.select("term").distinct()), "term")
        .groupBy(id_col, "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    matched = (
        matched_tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term"))
        )
        .join(qvocab, "term")
        .crossJoin(stats)
        .filter(F.expr(f"1000 * df <= {max_df_ratio_milli} * __n"))
    )
    return bm25_score_rank(
        matched,
        query_id_col=query_id_col,
        id_col=id_col,
        k=k,
        n_sql="__n",
        s_sql="__s",
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


def mmr_rerank(
    candidates: DataFrame,
    *,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
    k: int = 5,
    lambda_milli: int = 700,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998 — public literature): greedily select ``k`` of each
    query's candidates maximizing

        mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} cos(c, s)

    — the standard diversity re-rank between first-stage retrieval
    (BM25 / ANN) and an LLM consumer.  ``candidates`` is the SMALL
    per-query pool ``(query_id, id, rel, vec)`` (tens of rows per query
    by contract — the output of a top-N retriever), so the whole greedy
    loop runs ROW-LOCALLY: one groupBy gathers each query's pool into
    an array, and ``F.aggregate`` over a static k-step sequence plays
    the iteration with pure JVM higher-order functions — no driver
    loop, no Python, no per-step shuffle.

    Determinism: a score λ·rel − (1−λ)·div over 6-decimal inputs lands
    a 7th decimal of exactly 5 for a large fraction of candidates —
    deterministically CONSTRUCTED round-half cases where engines'
    rounding modes disagree (observed: Spark 0.255123 vs DuckDB
    0.255122 flipping an argmax).  So the greedy NEVER compares floats:
    relevance and each pairwise cosine snap to exact integer MICROS
    (``round(x · 1e6, 0)`` — one rounding of the raw double, the same
    1-ulp-safety class as the engine-wide round-6), the score is the
    exact BIGINT ``lambda_milli·rel_u − (1000−lambda_milli)·div_u`` in
    nano units, and every argmax is integer comparison with ascending-id
    ties.

    Returns ``(query_id, rank, id, mmr_score_nano)`` with rank 1..k
    (fewer if the pool is smaller); ``mmr_score_nano`` is the exact
    integer score in 1e-9 units (divide by 1e9 for the conventional
    value); rank 1 is pure relevance (its score is λ·rel — no diversity
    term exists yet).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lambda_milli <= 1000:
        raise ValueError(
            f"lambda_milli must be in [0, 1000], got {lambda_milli}"
        )
    lam = F.lit(lambda_milli).cast("bigint")
    mu = F.lit(1000 - lambda_milli).cast("bigint")

    def micros(x):
        return F.round(x * F.lit(1000000.0), 0).cast("bigint")

    def cos_u(a, b):
        num = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x * x), F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        nb = F.sqrt(
            F.aggregate(
                F.transform(b, lambda x: x * x), F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        return micros(num / (na * nb))

    # Pool per query, sorted by (rel desc, id) — struct field order makes
    # array_sort the deterministic argmax: the head is rank 1.  The id
    # keeps its NATURAL type (string doc ids are the common retrieval
    # case — a silent bigint cast would NULL them, and NULL ids break
    # the selected-set exclusion); a NULL id fails fast executor-side.
    id_type = candidates.schema[id_col].dataType
    safe_id = F.when(
        F.col(id_col).isNotNull(), F.col(id_col)
    ).otherwise(
        F.raise_error(
            F.lit("mmr_rerank: NULL candidate id (ids must be non-null)")
        ).cast(id_type)
    )
    pool = candidates.groupBy(query_id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-micros(F.col(rel_col))).alias("nrel"),
                    safe_id.alias("id"),
                    F.col(vec_col).cast("array<double>").alias("vec"),
                )
            )
        ).alias("__pool")
    )
    first = F.element_at("__pool", 1)
    init = F.struct(
        F.array(first).alias("sel"),
        F.array(
            F.struct(
                first["id"].alias("id"),
                (lam * (-first["nrel"])).alias("score"),
            )
        ).alias("out"),
    )

    def step(state, _i):
        sel, out = state["sel"], state["out"]
        rem = F.filter(
            F.col("__pool"),
            lambda c: ~F.exists(sel, lambda s: s["id"] == c["id"]),
        )
        scored = F.transform(
            rem,
            lambda c: F.struct(
                (
                    -(
                        lam * (-c["nrel"])
                        - mu
                        * F.array_max(
                            F.transform(
                                sel, lambda s: cos_u(c["vec"], s["vec"])
                            )
                        )
                    )
                ).alias("nscore"),
                c["id"].alias("id"),
                c["nrel"].alias("nrel"),
                c["vec"].alias("vec"),
            ),
        )
        best = F.array_min(scored)
        grown = F.struct(
            F.concat(
                sel,
                F.array(
                    F.struct(
                        best["nrel"].alias("nrel"),
                        best["id"].alias("id"),
                        best["vec"].alias("vec"),
                    )
                ),
            ).alias("sel"),
            F.concat(
                out,
                F.array(
                    F.struct(
                        best["id"].alias("id"),
                        (-best["nscore"]).alias("score"),
                    )
                ),
            ).alias("out"),
        )
        return F.when(F.size(rem) > 0, grown).otherwise(state)

    folded = pool.withColumn(
        "__mmr",
        F.aggregate(F.sequence(F.lit(2), F.lit(k)), init, step)["out"]
        if k > 1
        else init["out"],
    )
    return folded.select(
        query_id_col, F.posexplode("__mmr").alias("__pos", "__e")
    ).select(
        query_id_col,
        (F.col("__pos") + 1).cast("int").alias("rank"),
        F.col("__e.id").alias(id_col),
        F.col("__e.score").alias("mmr_score_nano"),
    )


def ndcg_at_k(
    ranking: DataFrame,
    labels: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k — the standard graded retrieval-quality metric
    (Järvelin & Kekäläinen, "Cumulated gain-based evaluation of IR
    techniques", TOIS 2002 — public literature), closing the retrieval
    tier's loop: BM25/ANN produce rankings, MMR re-ranks, this measures.

    ``ranking`` is a retriever's output ``(query_id, rank, id)``;
    ``labels`` the graded relevance ``(query_id, id, rel)`` with small
    non-negative integer grades (unlabeled retrieved docs count rel 0).
    Gains are exponential ``2^rel - 1`` (exact in a double for any
    realistic grade); the
    position discount is the NATURAL-log form ``gain / ln(i + 1)`` —
    base-2 and base-e DCG differ by a constant factor that cancels in
    the NDCG ratio, and ``ln`` is the one libm both engines agree on to
    1 ulp (the BM25 idf precedent), where ``log2``'s two-step evaluation
    need not be.  IDCG ranks the query's labels by (rel desc, id) over
    the WHOLE labeled corpus cut to k — the true ideal, not the
    retrieved subset.

    DCG/IDCG are ordered left-folds in rank order (``F.aggregate`` ==
    ``list_reduce``); ``ndcg = round(dcg / idcg, 6)`` (NULL when the
    query has no positive labels).  Returns
    ``(query_id, dcg_ln, idcg_ln, ndcg)`` with the dcg columns rounded
    to 6 digits for cross-engine hashing.

    Scale posture (100 TB): one equi-join of the (queries x k)-sized
    ranking against labels (broadcast whichever side is small), one
    window over per-query labels for the ideal cut, two per-query folds
    — nothing touches the corpus beyond the label table.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def gain(rel):
        # 2^rel - 1 for small integer grades: pow is exact here (and
        # F.shiftleft requires a literal bit count, not a column)
        return F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)

    def fold_dcg(pairs_col):
        # pairs: array<struct<rank, g>> sorted by rank — fold adds
        # g / ln(rank + 1) left-to-right
        return F.round(
            F.aggregate(
                pairs_col,
                F.lit(0.0),
                lambda acc, x: acc
                + x["g"] / F.log(x["rank"].cast("double") + F.lit(1.0)),
            ),
            6,
        )

    got = (
        ranking.filter(F.col(rank_col) <= k)
        .join(
            labels.select(
                F.col(query_id_col),
                F.col(id_col),
                F.col(rel_col).alias("__rel"),
            ),
            [query_id_col, id_col],
            "left",
        )
        .select(
            query_id_col,
            F.col(rank_col).cast("bigint").alias("__rank"),
            gain(F.coalesce(F.col("__rel"), F.lit(0))).alias("__g"),
        )
        .groupBy(query_id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rank").alias("rank"), F.col("__g").alias("g")
                    )
                )
            ).alias("__pairs")
        )
        .select(query_id_col, fold_dcg(F.col("__pairs")).alias("dcg_ln"))
    )
    w_ideal = Window.partitionBy(query_id_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    ideal = (
        labels.withColumn("__irank", F.row_number().over(w_ideal))
        .filter((F.col("__irank") <= k) & (F.col(rel_col) > 0))
        .select(
            query_id_col,
            F.col("__irank").cast("bigint").alias("__rank"),
            gain(F.col(rel_col)).alias("__g"),
        )
        .groupBy(query_id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rank").alias("rank"), F.col("__g").alias("g")
                    )
                )
            ).alias("__pairs")
        )
        .select(query_id_col, fold_dcg(F.col("__pairs")).alias("idcg_ln"))
    )
    return (
        got.join(ideal, query_id_col, "left")
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_ln") > 0,
                F.round(F.col("dcg_ln") / F.col("idcg_ln"), 6),
            ),
        )
        .select(query_id_col, "dcg_ln", "idcg_ln", "ndcg")
    )


def coverage_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str,
    id_col: str,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
) -> DataFrame:
    """Boolean-coverage ranker: per (query, doc) the number of DISTINCT
    query terms present, then total matched term frequency — the
    query-independent-of-weights complement a score ranker is typically
    FUSED with (exact integers end to end, no IDF/length model).
    Top-k by (n_terms DESC, tf_sum DESC, id ASC) per query.

    Scale shape: same inverted-index prune as BM25 — only documents
    sharing a query term are ever considered; the rank window runs
    per query over matched docs, never |queries| x |corpus|.
    """
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    post = (
        tokenize(docs, text_col=text_col, id_col=id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    qt = tokenize(
        queries, text_col=query_text_col, id_col=query_id_col
    ).distinct()
    matched = post.join(F.broadcast(qt), on="term")
    grp = matched.groupBy(query_id_col, id_col).agg(
        F.count_distinct("term").cast("bigint").alias("n_terms"),
        F.sum("tf").cast("bigint").alias("tf_sum"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_terms").desc(), F.col("tf_sum").desc(), F.col(id_col)
    )
    return (
        grp.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "n_terms", "tf_sum")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    *,
    query_id_col: str,
    id_col: str,
    rank_col: str = "rank",
    rrf_k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009
    — public): fuse N ranked lists by

        rrf_ppm = sum over lists containing the doc of
                  1e6 div (rrf_k + rank)

    — the ppm-scaled classic with each reciprocal TRUNCATED to an
    integer, so the fused score replays bit-for-bit in any engine (the
    float sum order problem is gone by construction).  Docs missing
    from a list simply contribute nothing (the standard convention);
    ``n_lists`` rides along as the agreement diagnostic.  Ties on the
    fused score break by id (stated, stable).

    Scale shape: a UNION of the (already bounded) top-k lists + ONE
    combinable groupBy + a per-query window over at most
    N x k candidates — never corpus-sized.
    """
    if not ranked_lists:
        raise ValueError("ranked_lists must be non-empty")
    if rrf_k < 1 or top_n < 1:
        raise ValueError(f"rrf_k/top_n must be positive, got {rrf_k}/{top_n}")
    parts = [
        df.select(
            F.col(query_id_col),
            F.col(id_col),
            F.expr(f"1000000 div ({rrf_k} + {rank_col})")
            .cast("bigint")
            .alias("__c"),
        )
        for df in ranked_lists
    ]
    u = parts[0]
    for nxt in parts[1:]:
        u = u.unionByName(nxt)
    fused = u.groupBy(query_id_col, id_col).agg(
        F.sum("__c").cast("bigint").alias("rrf_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_ppm").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= top_n)
        .select(query_id_col, "fused_rank", id_col, "rrf_ppm", "n_lists")
    )


def mrr_map_at_k(
    ranking: DataFrame,
    labels: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """MRR@k / AP@k / precision@k / recall@k — the binary-relevance
    eval battery next to the graded :func:`ndcg_at_k` (Voorhees, TREC-8
    "Overview" MRR; Buckley & Voorhees, SIGIR 2000 MAP — public
    literature).  A label row with ``rel > 0`` is relevant; unlabeled
    or zero-grade retrieved docs are not.

    Exactness contract (the ``rrf_fuse`` stance — exact integers by
    construction, no float-sum order anywhere):

        rr_ppm     = 1e6 div r_first            (0 when no hit in top-k)
        ap_ppm     = (sum_j 1e6 * j div r_j) div min(R, k)
        p_at_k_ppm = 1e6 * n_hits div k
        recall_ppm = 1e6 * n_hits div R         (NULL when R = 0)

    where ``r_j`` is the rank of the j-th hit (so ``j div r_j`` IS
    precision@r_j) and R the query's total relevant-label count.  Each
    precision term is TRUNCATED to ppm before the mean — a < 1e-6
    per-term bias, stated, in exchange for order-free integer sums
    that replay verbatim in any engine.  Queries with R = 0 report
    NULL ap/recall (nothing to retrieve is not a zero score); a
    retrieved-but-unlabeled query row still reports rr/p@k.

    Scale posture (100 TB): ``ranking`` is (queries x k)-sized; ONE
    equi-join against the label table, then ONE per-query groupBy whose
    collected (rank, hit) array (<= k elements) carries every metric as
    an ordered array fold — a single aggregation branch, so the
    upstream retriever plan executes ONCE (the ndcg_at_k shape) — plus
    one combinable label census for R.  Nothing touches the corpus
    beyond the label table.

    Engine extension — the reference (export_dp1.py / import_dp1.py)
    has no retrieval tier; cited for provenance only.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    got = (
        ranking.filter(F.col(rank_col) <= k)
        .join(
            labels.select(
                F.col(query_id_col),
                F.col(id_col),
                F.col(rel_col).alias("__rel"),
            ),
            [query_id_col, id_col],
            "left",
        )
        .select(
            query_id_col,
            F.col(rank_col).cast("bigint").alias("__rank"),
            (F.coalesce(F.col("__rel"), F.lit(0)) > 0).alias("__hit"),
        )
    )
    per_q = (
        got.groupBy(query_id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rank").alias("rank"),
                        F.col("__hit").alias("hit"),
                    )
                )
            ).alias("__pairs")
        )
        # hits in rank order; the j-th hit's precision@rank is exactly
        # (1e6 * j) div rank — transform's index IS j-1, so no running
        # counter and no window: everything is one ordered array fold
        .withColumn("__h", F.expr("filter(__pairs, x -> x.hit)"))
        .withColumn(
            "n_hits", F.expr("size(__h)").cast("bigint")
        )
        .withColumn(
            "first_hit_rank",
            F.expr("try_element_at(__h, 1).rank").cast("bigint"),
        )
        .withColumn(
            "__ap_sum",
            F.expr(
                "aggregate(transform(__h, (x, i) -> "
                "(1000000 * (cast(i as bigint) + 1)) div x.rank), "
                "cast(0 as bigint), (a, b) -> a + b)"
            ).cast("bigint"),
        )
    )
    r_census = labels.groupBy(query_id_col).agg(
        F.count(F.when(F.col(rel_col) > 0, 1)).cast("bigint").alias("n_rel")
    )
    out = (
        per_q.join(r_census, query_id_col, "left")
        .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)).cast("bigint"))
        .withColumn(
            "rr_ppm",
            F.coalesce(
                F.expr("1000000 div first_hit_rank"), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "ap_ppm",
            F.when(
                F.col("n_rel") > 0,
                F.expr(
                    f"coalesce(__ap_sum, 0) div least(n_rel, {k})"
                ),
            ).cast("bigint"),
        )
        .withColumn(
            "p_at_k_ppm",
            F.expr(f"(1000000 * n_hits) div {k}").cast("bigint"),
        )
        .withColumn(
            "recall_ppm",
            F.when(
                F.col("n_rel") > 0, F.expr("(1000000 * n_hits) div n_rel")
            ).cast("bigint"),
        )
    )
    return out.select(
        query_id_col,
        "n_rel",
        "n_hits",
        "first_hit_rank",
        "rr_ppm",
        "ap_ppm",
        "p_at_k_ppm",
        "recall_ppm",
    )
