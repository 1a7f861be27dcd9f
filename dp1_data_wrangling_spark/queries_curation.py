"""Curation / sampling / packing query catalog (split from
queries_llm.py in round 13 — VERDICT r12 item 6).  Same @register
calls, registry name set identical; stable sampling, split assignment,
the end-to-end curation pipeline, sequence/subword packing, n-gram and
co-occurrence corpus reports, source quotas, importance resampling,
decontamination, repetition stats, PII scrub, chunking, global
shuffle, incremental rollup, line dedup, top terms, dup spans and the
near-dup curation composition."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import text as tx
from .registry import register
from .tables import load_table, spread

from .queries_llm import (
    MUTANT_OFFSET,
    _AUG_EXACT,
    _AUG_NEAR,
    _BPE_CORE_CTES,
    _LANG_SCORE_SQL,
    _MINHASH_SIG_SQL,
    _augment_exact,
    _augment_near,
)

@register(
    "doc_stable_sample",
    """
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5('corpus_v1' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 100 AS bucket
    FROM documents
    WHERE CAST(('0x' || substr(md5('corpus_v1' || CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 100 < 20
    """,
)
def q_doc_stable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% corpus sample (operators/sampling.py): the keep
    decision is md5(salt || doc_id) mod 100 — reproducible run-to-run,
    partitioning-independent, and consistent across tables (rand()-based
    sampling is none of these).  Pure row-local JVM expression, zero
    shuffles at any scale."""
    from .operators.sampling import hash_bucket, stable_sample

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "lang")
    return stable_sample(docs, "doc_id", percent=20, salt="corpus_v1").select(
        "doc_id", "lang", hash_bucket(F.col("doc_id"), "corpus_v1").alias("bucket")
    )


@register(
    "doc_split_assign",
    """
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('split_v1' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment by contiguous hash-bucket ranges
    (90/5/5): every row gets exactly one split, the same doc_id lands in
    the same split in every table salted alike (no cross-split leakage
    through joins), and re-runs are bit-identical.  Zero shuffles."""
    from .operators.sampling import split_assign

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "lang")
    return split_assign(
        docs, "doc_id", weights={"train": 90, "val": 5, "test": 5}, salt="split_v1"
    )


@register(
    "doc_curation_pipeline",
    f"""
    WITH aug AS ({_AUG_EXACT}),
    scored AS (SELECT doc_id, text, {_LANG_SCORE_SQL} FROM aug),
    en AS (
        SELECT doc_id, text FROM scored
        WHERE score_en >= score_de AND score_en >= score_es
              AND score_en >= score_fr
    ),
    toks AS (
        SELECT doc_id, text,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_tokens
        FROM en
    ),
    good AS (SELECT * FROM toks WHERE n_tokens >= 10),
    surv AS (
        SELECT min(doc_id) AS doc_id,
               arg_min(n_tokens, doc_id) AS n_tokens,
               count(*) AS n_copies
        FROM good GROUP BY md5(text)
    )
    SELECT doc_id, n_tokens, n_copies,
           CASE WHEN CAST(('0x' || substr(md5('curation_v1' ||
                     CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
                THEN 'train'
                WHEN CAST(('0x' || substr(md5('curation_v1' ||
                     CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95
                THEN 'val'
                ELSE 'test' END AS split
    FROM surv
    """,
    headline=True,
)
def q_doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation, the composition a training-data run
    actually executes: language filter (en) -> quality floor (>= 10
    tokens) -> exact-dedup survivors -> deterministic train/val/test
    assignment.  One linear plan: the filters are row-local JVM
    expressions evaluated before the single digest-groupBy shuffle
    (16-byte keys, payloads never shuffle), and the split is a hash
    bucket — at 100 TB this runs as scan -> map -> one narrow shuffle ->
    map.  Each stage is individually oracle-verified by doc_lang_id,
    doc_token_stats, doc_exact_dedup, and doc_split_assign; this query
    verifies their composition."""
    from .plans.curation import curate_documents

    return curate_documents(_augment_exact(spark, sf_dir))


@register(
    "doc_pack_sequences",
    """
    WITH RECURSIVE d AS (
        SELECT doc_id, doc_id % 4 AS shard,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, shard, n_tokens,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM d
    ),
    packed AS (
        SELECT shard, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS seq_id, n_tokens AS used
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN p.used + o.n_tokens > 500 AND p.used > 0
                    THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.used + o.n_tokens > 500 AND p.used > 0
                    THEN o.n_tokens ELSE p.used + o.n_tokens END
        FROM ordered o JOIN packed p
          ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_tokens, seq_id FROM packed
    """,
)
def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (operators/packing.py): docs walked in
    doc_id order per shard, a new fixed-budget training sequence opens
    whenever the next doc would overflow 500 tokens.  Inherently stateful
    -> Arrow-batched applyInPandas per shard (the §2.11 slow-path tier,
    never a row-at-a-time UDF); the DuckDB oracle replays the walk as a
    recursive CTE.  One shuffle (shard key), then embarrassingly parallel
    per-shard walks."""
    from .operators.packing import pack_sequences, with_shards

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    sized = with_shards(
        docs.select("doc_id", tx.token_count(F.col("text")).alias("n_tokens")),
        n_shards=4,
    ).select("doc_id", "shard", "n_tokens")
    return pack_sequences(sized, budget=500)


_SUBWORD_PACK_ORACLE = f"""
    WITH RECURSIVE {_BPE_CORE_CTES},
    d AS (
        SELECT CAST(d0.doc_id AS BIGINT) AS doc_id,
               CAST(d0.doc_id % 4 AS BIGINT) AS shard,
               CAST(coalesce(a.n_subwords, 0) AS BIGINT) AS n_subwords
        FROM documents d0 LEFT JOIN agg a USING (doc_id)
    ),
    ordered AS (
        SELECT doc_id, shard, n_subwords,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM d
    ),
    packed AS (
        SELECT shard, rn, doc_id, n_subwords,
               CAST(0 AS BIGINT) AS seq_id, n_subwords AS used
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_subwords,
               CASE WHEN p.used + o.n_subwords > 500 AND p.used > 0
                    THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.used + o.n_subwords > 500 AND p.used > 0
                    THEN o.n_subwords ELSE p.used + o.n_subwords END
        FROM ordered o JOIN packed p
          ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_subwords, seq_id FROM packed
"""


@register("doc_subword_pack", _SUBWORD_PACK_ORACLE)
def q_doc_subword_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing under a REAL subword budget (round 7): the
    frozen-vocab tokenizer feeds pack_sequences through its token_col
    parameter — with doc_subword_mix, both token-budget consumers are now
    wired to real counts.  The oracle chains TWO recursive CTEs — the
    greedy-match tokenizer walk and the greedy packing walk — so the
    composition is hash-compared end to end."""
    from .operators.packing import pack_sequences, with_shards

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    sized = with_shards(
        tx.subword_stats(docs).select("doc_id", "n_subwords"), n_shards=4
    ).select("doc_id", "shard", "n_subwords")
    return pack_sequences(sized, budget=500, token_col="n_subwords").select(
        "doc_id", "shard", "n_subwords", "seq_id"
    )


@register(
    "corpus_top_ngrams",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\W+'),
                    x -> x != '') AS t
        FROM documents
    ),
    grams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS ngram
        FROM toks WHERE len(t) >= 2
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n
    FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram ASC LIMIT 20
    """,
)
def q_corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k word bigrams: the n-gram census behind corpus
    inspection and contamination screens.  All-integer pipeline: explode
    bigrams, ONE map-side-combinable groupBy count, TakeOrderedAndProject
    top-k (count desc, ngram asc tie-break — deterministic).  At 100 TB
    the combine collapses per-partition duplicates before the shuffle and
    the top-k never materializes the full census on one node."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("text")
    toks = docs.select(
        F.filter(
            F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != ""
        ).alias("t")
    ).filter(F.size("t") >= 2)
    grams = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(20)
    )


@register(
    "doc_cooccurrence",
    """
    WITH co_toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\W+'),
                   x -> x != '')) AS item
        FROM documents
    ),
    co_bi AS (SELECT DISTINCT doc_id, item FROM co_toks),
    co_freq AS (
        SELECT item FROM co_bi GROUP BY item HAVING count(*) >= 20
    ),
    co_cap AS (
        SELECT doc_id, item,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY item) AS rn
        FROM co_bi WHERE item IN (SELECT item FROM co_freq)
    ),
    co_kept AS (SELECT doc_id, item FROM co_cap WHERE rn <= 30)
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(count(*) AS BIGINT) AS n_baskets
    FROM co_kept a JOIN co_kept b
      ON a.doc_id = b.doc_id AND a.item < b.item
    GROUP BY item_a, item_b
    HAVING count(*) >= 10
    """,
)
def q_doc_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-occurring word pairs (operators/itemsets.py
    frequent_pairs — apriori level 2): unordered pairs of
    individually-frequent tokens counted by the number of documents
    containing both, with the deterministic lexicographic per-doc cap
    as the blow-up valve.  Same cross-engine tokenization as
    corpus_top_ngrams; the oracle replays prune, cap, and pair census
    verbatim."""
    from .operators.itemsets import frequent_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\W+"),
                lambda x: x != "",
            )
        ).alias("item"),
    )
    return frequent_pairs(
        toks,
        basket_col="doc_id",
        item_col="item",
        min_item_support=20,
        min_pair_support=10,
        max_items_per_basket=30,
    )


@register(
    "doc_source_quota",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('quota_v1' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rank
        FROM documents
    )
    SELECT doc_id, source, rank FROM ranked WHERE rank <= 10
    """,
)
def q_doc_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep at most 10 docs per source, selected by an
    unbiased deterministic hash rank (operators/selection.py).  Semantics
    are a single ranking window, but the physical plan is the two-stage
    sharded top-k — no task ever sees more than k * n_shards rows of one
    group, so a 40 TB CommonCrawl-sized source cannot serialize onto one
    executor the way a naive PARTITION BY source window would."""
    from .operators.selection import group_topk

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "source")
    return group_topk(docs, "source", "doc_id", k=10, salt="quota_v1")


@register(
    "doc_importance_resample",
    """
    WITH w AS (
        SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 1.5
                         WHEN 'es' THEN 2.25 ELSE 0.5 END AS wt,
               CAST(('0x' || substr(md5('resample_v1' || CAST(doc_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    r AS (
        SELECT doc_id, lang,
               CAST(floor(wt) AS BIGINT)
               + CASE WHEN bucket < CAST(round((wt - floor(wt)) * 100) AS BIGINT)
                      THEN 1 ELSE 0 END AS repeats
        FROM w
    )
    SELECT doc_id, lang, CAST(u.i AS INT) AS copy_id
    FROM r, LATERAL unnest(generate_series(1, repeats)) AS u(i)
    """,
)
def q_doc_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling of the corpus mix: de 1.5x, es 2.25x,
    en 1.0x, everything else 0.5x.  Integer copies are guaranteed; the
    fractional remainder becomes one extra copy for a deterministic
    hash-selected fraction of keys (stochastic rounding — expected copy
    count equals the weight, every decision a pure function of the key).
    Row-local explode, zero shuffles at any scale; weights resolve to
    percent precision (operators/selection.py)."""
    from .operators.selection import importance_resample

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "lang")
    weight = (
        F.when(F.col("lang") == "en", 1.0)
        .when(F.col("lang") == "de", 1.5)
        .when(F.col("lang") == "es", 2.25)
        .otherwise(0.5)
    )
    return importance_resample(docs, "doc_id", weight, salt="resample_v1")


@register(
    "doc_decontaminate",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t,
               CAST(('0x' || substr(md5('split_v1' || CAST(doc_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    trg AS (
        SELECT doc_id, CAST(len(d) AS BIGINT) AS n_grams,
               unnest(d) AS digest
        FROM (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(t) - 2),
                        i -> md5(array_to_string(t[i:i+3], ' ')))) AS d
            FROM tok WHERE bucket < 90 AND len(t) >= 4
        )
    ),
    evg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
                    i -> md5(array_to_string(t[i:i+3], ' ')))) AS digest
        FROM tok WHERE bucket >= 95 AND len(t) >= 4
    )
    SELECT doc_id, max(n_grams) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM trg JOIN evg USING (digest)
    GROUP BY doc_id
    """,
)
def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): train docs (the
    90% hash split) sharing any 4-token window with the held-out test
    split (>= bucket 95), with shared-window counts.  The eval side's
    digests are distinct-ed and broadcast; the corpus side is a row-local
    map (tokenize -> n-grams -> md5 -> per-doc distinct) probed against
    the broadcast, then ONE combinable groupBy on doc_id — the 100 TB
    train corpus never shuffles its n-grams.  n=4 here only because the
    fixture vocabulary is tiny; production screens use n of 8-13."""
    from .operators.decontam import contamination
    from .operators.sampling import hash_bucket

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    bucket = hash_bucket(F.col("doc_id"), "split_v1")
    train = docs.where(bucket < 90)
    eval_docs = docs.where(bucket >= 95)
    return contamination(train, eval_docs, n=4)


@register(
    "doc_repetition_stats",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
           CAST(list_max(list_transform(list_distinct(t),
                d -> len(list_filter(t, x -> x = d)))) AS BIGINT)
               AS top_token_count,
           CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1]))) AS BIGINT)
               AS n_distinct_bigrams
    FROM tok WHERE len(t) >= 2
    """,
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition screen (operators/text.py):
    most-frequent-token share and duplicate-bigram fraction come straight
    off these integer counts.  Pure row-local array expressions — zero
    shuffles at any corpus size, work bounded by doc length."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.repetition_stats(docs).select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top_token_count",
        "n_bigrams",
        "n_distinct_bigrams",
    )


@register(
    "doc_pii_scrub",
    """
    WITH inj AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com from 10.'
                        || CAST(doc_id % 256 AS VARCHAR) || '.'
                        || CAST(doc_id % 100 AS VARCHAR) || '.'
                        || CAST(doc_id % 50 AS VARCHAR)
                        || ' ref 10000000' || CAST(doc_id % 100 AS VARCHAR)
               ELSE text END AS text
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_email,
               regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                    '[EMAIL]', 'g') AS t
        FROM inj
    ),
    s2 AS (
        SELECT doc_id, n_email,
               CAST(len(regexp_extract_all(t,
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                    AS BIGINT) AS n_ip,
               regexp_replace(t,
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                    '[IP]', 'g') AS t
        FROM s1
    )
    SELECT doc_id, n_email, n_ip,
           CAST(len(regexp_extract_all(t, '\\b\\d{9,}\\b')) AS BIGINT)
               AS n_idnum,
           regexp_replace(t, '\\b\\d{9,}\\b', '[ID]', 'g') AS clean_text
    FROM s2
    """,
)
def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction screen (operators/text.py scrub_pii): emails, IPv4
    addresses, and long id numbers replaced with typed placeholders, with
    per-document removal counts.  The fixture corpus contains no natural
    PII, so every %7 doc gets a deterministic synthetic injection (email +
    IP + 9-digit id derived from doc_id) that both engines compute
    identically — the scrubber then has real work whose counts the oracle
    hash-verifies.  Row-local regexp chain: zero shuffles at any scale."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(" ref 10000000"),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return tx.scrub_pii(injected).select(
        "doc_id", "n_email", "n_ip", "n_idnum", "clean_text"
    )


@register(
    "doc_chunk",
    """
    SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
           substring(text, CAST(u.i * 150 + 1 AS INT), 200) AS chunk,
           CAST(len(substring(text, CAST(u.i * 150 + 1 AS INT), 200))
                AS BIGINT) AS chunk_len
    FROM documents,
         LATERAL unnest(generate_series(0,
             CAST(floor((length(text) - 1) / 150) AS BIGINT))) AS u(i)
    WHERE length(text) >= 1
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (operators/text.py
    chunk_documents): 200-char windows every 150 chars — the
    retrieval/context-window splitting primitive.  Row-local sequence +
    explode + substr; output volume is corpus size times a caller-chosen
    constant (ceil(size/stride)), zero shuffles."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.chunk_documents(docs, size=200, stride=150).select(
        "doc_id", "chunk_idx", "chunk", "chunk_len"
    )


@register(
    "doc_global_shuffle",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5('shuffle_v1' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS position
    FROM documents
    """,
    headline=True,
)
def q_doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (operators/sampling.py
    global_shuffle): each doc's 1-based position in the md5(salt||key)
    ordering, computed by the two-pass distributed rank (hash-prefix
    buckets + per-bucket windows + prefix-summed offsets) instead of the
    single-task ROW_NUMBER-over-everything the oracle uses — identical
    output, cluster-parallel plan."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    from .operators.sampling import global_shuffle

    return global_shuffle(docs, "doc_id", salt="shuffle_v1").select(
        "doc_id", "position"
    )


@register(
    "events_rollup_incremental",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS value_micros
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate refresh (plans/rollup.py): the hourly rollup
    is built INCREMENTALLY — two disjoint event batches folded in by
    successive refresh_rollup calls through the catalog's transactional
    MERGE — and must hash-equal the oracle's one-shot aggregate over all
    events (decomposable count/sum partials in fixed-point micros make
    the combine exact, not approximately right).  Externally verifies the
    whole merge/commit path, not just the aggregation."""
    import tempfile

    from .plans.catalog import Catalog
    from .plans.rollup import refresh_rollup

    events = load_table(spark, sf_dir, "events")
    cat = Catalog(tempfile.mkdtemp(prefix="rollup_q_"))
    for parity in (0, 1):
        refresh_rollup(
            spark, cat, events.where(F.col("event_id") % 2 == parity)
        )
    return cat.read(spark, "events_rollup").select(
        "bucket_ts", "event_type", "n_events", "value_micros"
    )


@register(
    "doc_line_dedup",
    f"""
    WITH aug AS ({_AUG_EXACT}),
    docs2 AS (
        SELECT doc_id, replace(text, ' merge ', chr(10)) AS text FROM aug
    ),
    split_docs AS (
        SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2
    ),
    lines AS (
        SELECT doc_id, CAST(u.i AS INT) - 1 AS pos, l[u.i] AS line
        FROM split_docs, LATERAL unnest(generate_series(1, len(l))) AS u(i)
    ),
    hot AS (
        SELECT md5(line) AS d FROM lines GROUP BY 1 HAVING count(*) > 2
    ),
    kept AS (
        SELECT * FROM lines WHERE md5(line) NOT IN (SELECT d FROM hot)
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(len(s.l) AS BIGINT) AS n_lines,
           coalesce(r.n_kept, 0) AS n_kept,
           CAST(len(s.l) AS BIGINT) - coalesce(r.n_kept, 0) AS n_removed
    FROM split_docs s LEFT JOIN rebuilt r USING (doc_id)
    """,
    headline=True,
)
def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate-line removal (operators/dedup.py
    line_dedup): lines occurring more than twice across the corpus are
    dropped from every document.  The fixture soup has no newlines, so
    the query derives multi-line docs deterministically (every ' merge '
    separator becomes a line break — identical replace semantics in both
    engines); the tiny vocabulary then yields genuinely repeated short
    lines, and the %10 verbatim mutants repeat whole documents' lines —
    both removed and hash-verified."""
    aug = _augment_exact(spark, sf_dir).withColumn(
        "text", F.replace(F.col("text"), F.lit(" merge "), F.lit("\n"))
    )
    return dd.line_dedup(aug, max_freq=2).select(
        "doc_id", "clean_text", "n_lines", "n_kept", "n_removed"
    )


@register(
    "doc_top_terms",
    """
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                                  x -> x != '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2
    ),
    dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df_count FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf, df_count,
               tf * ((n_docs * 1000) // df_count) AS score_milli
        FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_milli DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tf, df_count, score_milli, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf-idf keywords (operators/text.py top_terms)
    with the integer milli-idf — rankings are engine-exact by
    construction, no float log in sight."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.top_terms(docs, k=3)


@register(
    "doc_dup_spans",
    """
    WITH tok0 AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t
        FROM documents
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(t[1:30], ' ') || ' uniq'
                   || CAST(doc_id AS VARCHAR) AS text
        FROM tok0 WHERE doc_id % 10 = 0 AND len(t) >= 30
    ),
    tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t
        FROM corpus
    ),
    eligible AS (SELECT * FROM tok WHERE len(t) >= 8),
    grams AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos,
               md5(array_to_string(t[u.i + 1 : u.i + 8], ' ')) AS d
        FROM eligible,
             LATERAL unnest(generate_series(0, len(t) - 8)) AS u(i)
    ),
    hot AS (SELECT d FROM grams GROUP BY d HAVING count(*) > 1),
    hits AS (
        SELECT doc_id, pos FROM grams WHERE d IN (SELECT d FROM hot)
    ),
    agg AS (SELECT doc_id, list_sort(list(pos)) AS ps FROM hits GROUP BY doc_id),
    calc AS (
        SELECT doc_id,
               CAST(len(ps) AS BIGINT) AS n_hit_grams,
               CAST(coalesce(list_sum(list_transform(range(1, len(ps)),
                    i -> least(8, ps[i + 1] - ps[i]))), 0) + 8 AS BIGINT)
                   AS dup_tokens,
               CAST(1 + len(list_filter(range(1, len(ps)),
                    i -> ps[i + 1] - ps[i] > 8)) AS BIGINT) AS n_spans
        FROM agg
    )
    SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           coalesce(c.n_hit_grams, 0) AS n_hit_grams,
           coalesce(c.dup_tokens, 0) AS dup_tokens,
           coalesce(c.n_spans, 0) AS n_spans
    FROM tok t LEFT JOIN calc c USING (doc_id)
    """,
)
def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-duplication screen (operators/dedup.py dup_span_stats):
    per-doc duplicated-span token counts over a corpus where every %10
    doc also appears as a PARTIAL copy (its first 30 tokens + a unique
    tail) — so spans are genuinely partial, not whole-document: the
    mutant duplicates 30 of its 31 tokens, the original exactly its
    leading 30.  The union-of-filtered-branches corpus build evaluates
    the scan twice (same tradeoff as fixtures.build_associations)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")
    mutants = (
        docs.withColumn("_t", toks)
        .where((F.col("doc_id") % 10 == 0) & (F.size("_t") >= 30))
        .select(
            (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
            F.concat(
                F.array_join(F.slice("_t", 1, 30), " "),
                F.lit(" uniq"),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
    )
    return dd.dup_span_stats(docs.unionByName(mutants), n=8).select(
        "doc_id", "n_tokens", "n_hit_grams", "dup_tokens", "n_spans"
    )


_CC_SPLIT_ORACLE = f"""
    WITH RECURSIVE aug AS ({_AUG_NEAR}),
    norm AS (SELECT doc_id, lower(substr(text, 1, 200)) AS n FROM aug),
    hashed AS (SELECT doc_id, list_transform(
        range(1, greatest(length(n) - 4, 1) + 1),
        j -> md5(substr(n, j, 5))) AS hl FROM norm),
    sigs AS (SELECT doc_id, {{sig_sql}} FROM hashed),
    bands AS (
        SELECT doc_id, 0 AS band, md5(s0 || s1) AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1 AS band, md5(s2 || s3) AS band_key FROM sigs
        UNION ALL SELECT doc_id, 2 AS band, md5(s4 || s5) AS band_key FROM sigs
    ),
    kept AS (
        SELECT b.doc_id, b.band, b.band_key
        FROM bands b
        JOIN (SELECT band, band_key, count(*) AS n
              FROM bands GROUP BY 1, 2) s
          ON b.band = s.band AND b.band_key = s.band_key
         AND s.n <= {{max_bucket}}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM kept a
        JOIN kept b ON a.band = b.band AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION SELECT id_b AS a, id_a AS b FROM cand
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lbl FROM aug
        UNION
        SELECT e.a AS id, r.lbl FROM reach r JOIN edges e ON e.b = r.id
    ),
    comp AS (SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id)
    SELECT doc_id, component,
           CASE WHEN CAST(('0x' || substr(md5('curation_v1' ||
                     CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
                THEN 'train'
                WHEN CAST(('0x' || substr(md5('curation_v1' ||
                     CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95
                THEN 'val'
                ELSE 'test' END AS split
    FROM comp WHERE doc_id = component
    """.format(sig_sql=_MINHASH_SIG_SQL, max_bucket=dd.MAX_BUCKET_SIZE)


@register("doc_near_dup_curation", _CC_SPLIT_ORACLE)
def q_doc_near_dup_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate curation end-to-end: MinHash-LSH candidate pairs ->
    connected-component clustering -> keep the min-id survivor per
    cluster -> deterministic train/val/test split.  The oracle replays
    the ENTIRE pipeline exactly — the md5 LSH construction verbatim plus
    a recursive-CTE transitive closure standing in for the distributed
    label propagation (fixpoints must agree whatever the cluster shape).
    At 100 TB this is bucketed equi-joins + O(log n) star rounds + a
    row-local hash split — no stage is all-pairs or driver-bound."""
    from .operators.components import dedup_survivors
    from .operators.sampling import split_assign

    aug = _augment_near(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(aug)
    surv = (
        dedup_survivors(aug, pairs)
        .where(F.col("is_survivor"))
        .select("doc_id", "component")
    )
    return split_assign(
        surv,
        "doc_id",
        weights={"train": 90, "val": 5, "test": 5},
        salt="curation_v1",
    )


