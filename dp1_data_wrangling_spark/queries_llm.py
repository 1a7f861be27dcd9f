"""Training-data-pipeline query catalog (north star extensions).

Dedup (exact + MinHash-LSH + SimHash + Jaccard), similarity search,
text analysis, multimodal features — over the documents/embeddings
fixtures.  Everything hash-based is md5-derived so the DuckDB oracle can
replay the *exact* pipeline (no engine-specific hash functions).

The dedup fixtures augment the corpus with deterministic mutants
(doc_id + 1_000_000) because the generated documents contain no natural
duplicates: exact dedup gets verbatim copies, minhash gets copies with a
suffix appended beyond the normalization prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators import text as tx
from .registry import register
from .tables import load_table, spread

MUTANT_OFFSET = 1_000_000


def _md5mod(cols: list[F.Column], m: int) -> F.Column:
    """Deterministic pseudo-random draw in [0, m): the first 15 hex chars
    of md5 as a BIGINT, mod m — the exact idiom every DuckDB oracle
    replays as ``CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT) % m``.
    One definition so the graph generators can never desynchronize from
    their oracles one copy at a time."""
    payload = F.concat(*cols).cast("binary")
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint") % F.lit(m)

_AUG_EXACT = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""

_AUG_NEAR = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text
    FROM documents WHERE doc_id % 10 = 0
"""


def _augmented(docs: DataFrame, mutant_suffix: str) -> DataFrame:
    """Single-scan corpus augmentation: each %10 doc also emits a mutant
    row via a per-row struct-array explode — the union-of-filtered-branches
    form evaluates the documents scan twice (Spark does not share subtrees
    across union branches; same reasoning as fixtures.build_associations).
    """
    variants = F.array_compact(
        F.array(
            F.struct(F.col("doc_id"), F.col("text")),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.struct(
                    (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(mutant_suffix)).alias("text"),
                ),
            ),
        )
    )
    return docs.select(F.explode(variants).alias("__v")).select(
        F.col("__v.doc_id").alias("doc_id"), F.col("__v.text").alias("text")
    )


def _augment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No spread here: exact dedup is one md5 per doc — the round-robin
    # shuffle would cost more than the map it parallelizes (unlike the
    # shingle-hash path in _augment_near).
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _augmented(docs, "")


def _augment_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return _augmented(docs, " zz")


def _dense_doc_index(docs: DataFrame) -> DataFrame:
    """Dense 0-based id map over a unique numeric id column, cast to the
    historical INT dtype and eagerly checkpointed because every caller
    reads it several times (degree draw + both endpoint joins + the
    graph operators' own checkpoints).

    r13 opt round: ``doc_id`` is UNIQUE (the corpus primary key), so the
    full tie-exact ``distributed_rank`` (whose per-distinct-value census
    is corpus-sized here) is replaced by the two-pass unique-key rank —
    exact integer range bucketing (monotone, so bucket order prefixes
    the total order), a 1024-row bucket census collected to literal
    offsets, and one per-bucket ``row_number`` window.  Identical to
    ``row_number() OVER (ORDER BY doc_id) - 1`` for unique ids; the only
    corpus-sized exchange left is the window's (guide §2.3 — the census
    shuffle shrank from one row per distinct id to 1024 rows).  No
    single-partition exchange at any corpus size, same as before."""
    from pyspark.sql import Window

    st = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if st["lo"] is None:  # empty corpus: keep the (doc_id, idx) schema
        return docs.select(
            "doc_id", F.lit(None).cast("int").alias("idx")
        ).localCheckpoint()
    lo, hi = int(st["lo"]), int(st["hi"])
    if hi - lo >= (1 << 63):  # executor (x - lo) would wrap int64
        raise ValueError(
            "_dense_doc_index: doc_id span exceeds int64 — rescale ids"
        )
    wm = (hi - lo) // 1024 + 1
    keyed = docs.withColumn("__b", F.expr(f"(doc_id - {lo}) div {wm}"))
    counts = sorted(
        (int(r["__b"]), int(r["n"]))
        for r in keyed.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for b, c in counts:
        offsets[b] = acc
        acc += c
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__b").orderBy("doc_id")
    return (
        keyed.withColumn(
            "idx",
            (
                F.coalesce(omap[F.col("__b")], F.lit(0))
                + F.row_number().over(w)
                - 1
            ).cast("int"),
        )
        .select("doc_id", "idx")
        .localCheckpoint()
    )




# Round-13 seam split (VERDICT r12 item 6): the dedup family moved to
# queries_dedup.py, multimodal to queries_multimodal.py, and the
# curation/sampling/packing tier to queries_curation.py — same
# @register calls, registry name set identical.  _MINHASH_SIG_SQL
# stays here (shared by the dedup module, the curation composition
# and the semantic tail).
_MINHASH_SIG_SQL = ",\n".join(
    f"list_aggregate(list_transform(hl, h -> substr(h, {i * dd.SIG_SLICE + 1}, "
    f"{dd.SIG_SLICE})), 'min') AS s{i}"
    for i in range(dd.MINHASH_HASHES)
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_GOPHER_STOP_SUM = " + ".join(
    f"CAST(list_contains(lw, '{sw}') AS BIGINT)" for sw in tx.GOPHER_STOPWORDS
)

_GOPHER_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_words,
               CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
                   AS sum_wchars,
               CAST((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_symbols,
               CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
               CAST(len(list_filter(string_split(text, chr(10)),
                    l -> starts_with(ltrim(l), '-')
                         OR starts_with(ltrim(l), '*'))) AS BIGINT)
                   AS n_bullet_lines,
               CAST(len(list_filter(string_split(text, chr(10)),
                    l -> ends_with(rtrim(l), '...'))) AS BIGINT)
                   AS n_ellipsis_lines,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    w -> w != '' AND regexp_matches(w, '[A-Za-z]')))
                   AS BIGINT) AS n_alpha_words,
               {_GOPHER_STOP_SUM} AS n_stop_distinct
        FROM (
            SELECT doc_id, coalesce(text, '') AS text,
                   list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                       '\\s+'), x -> x != '') AS lw
            FROM documents
        )
    )
    SELECT doc_id, n_words, sum_wchars, n_symbols, n_lines, n_bullet_lines,
           n_ellipsis_lines, n_alpha_words, n_stop_distinct,
           (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
           (sum_wchars >= 3 * n_words AND sum_wchars <= 10 * n_words)
               AS mean_wlen_ok,
           (1000 * n_symbols <= 100 * n_words) AS symbol_ok,
           (1000 * n_bullet_lines <= 900 * n_lines) AS bullet_ok,
           (1000 * n_ellipsis_lines <= 300 * n_lines) AS ellipsis_ok,
           (1000 * n_alpha_words >= 800 * n_words) AS alpha_ok,
           (n_stop_distinct >= 2) AS stopword_ok,
           ((n_words >= 50 AND n_words <= 100000)
            AND (sum_wchars >= 3 * n_words AND sum_wchars <= 10 * n_words)
            AND (1000 * n_symbols <= 100 * n_words)
            AND (1000 * n_bullet_lines <= 900 * n_lines)
            AND (1000 * n_ellipsis_lines <= 300 * n_lines)
            AND (1000 * n_alpha_words >= 800 * n_words)
            AND (n_stop_distinct >= 2)) AS keep
    FROM base
    """


@register("doc_gopher_rules", _GOPHER_ORACLE)
def q_doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-paper quality-rule screen (operators/text.py gopher_rules;
    Rae et al. 2021 arXiv:2112.11446 §A1.1): published defaults, every
    ratio rule as cross-multiplied integers — the oracle replays each rule
    verbatim.  Row-local, ZERO shuffles (plan-gated)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    out = tx.gopher_rules(docs)
    return out.select(
        "doc_id", "n_words", "sum_wchars", "n_symbols", "n_lines",
        "n_bullet_lines", "n_ellipsis_lines", "n_alpha_words",
        "n_stop_distinct", "word_count_ok", "mean_wlen_ok", "symbol_ok",
        "bullet_ok", "ellipsis_ok", "alpha_ok", "stopword_ok", "keep",
    )


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len(list_distinct(list_filter(
                regexp_split_to_array(lower(text), '\\W+'),
                x -> x != ''))) AS BIGINT) AS n_distinct_tokens,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
               AS n_punct,
           CAST((length(text) - length(replace(text, ' the ', ''))) / 5
               AS BIGINT) AS stopword_hits,
           CAST(len(list_distinct(list_filter(
                regexp_split_to_array(lower(text), '\\W+'), x -> x != '')))
                AS DOUBLE)
             / greatest(len(list_filter(regexp_split_to_array(text, '\\s+'),
                x -> x != '')), 1) AS type_token_ratio,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio
    FROM documents
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring: all integer-derived metrics, one
    final division (operators/text.py)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    out = tx.quality_stats(docs)
    return out.select(
        "doc_id",
        "n_chars_actual",
        "n_tokens",
        "n_bpe_tokens",
        "n_distinct_tokens",
        "n_punct",
        "stopword_hits",
        "type_token_ratio",  # as computed by quality_stats — one formula
        "punct_ratio",
    )


_LM_VALUES = ", ".join(f"('{w}', {m})" for w, m in tx.LM_VOCAB)
_LM_SCORE_ORACLE = f"""
    WITH lm(tok, mlp) AS (VALUES {_LM_VALUES}),
    toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                   x -> x != '')) AS tok
        FROM documents
    ),
    scored AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_scored,
               CAST(sum(coalesce(lm.mlp, {tx.LM_UNKNOWN_MILLI})) AS BIGINT) AS s
        FROM toks t LEFT JOIN lm ON t.tok = lm.tok
        GROUP BY 1
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           coalesce(s.n_scored, 0) AS n_tokens_scored,
           coalesce(s.s, 0) AS milli_logprob_sum,
           coalesce(s.s, 0) // greatest(coalesce(s.n_scored, 0), 1)
               AS milli_ppl_proxy
    FROM documents d LEFT JOIN scored s USING (doc_id)
"""


@register("doc_lm_score", _LM_SCORE_ORACLE)
def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (round 7): a CCNet-style LM
    filter rank from the frozen integer unigram table
    (operators/text.py LM_VOCAB) — map-literal lookup inside a
    higher-order transform/aggregate fold, zero shuffles, no Python.
    All integers, so the oracle replays it exactly (VALUES join +
    group); curation keeps the low-milli_ppl_proxy head."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.unigram_lm_score(docs)


_BIGRAM_VALUES = ", ".join(
    f"('{v}', '{w}', {m})" for v, w, m in tx.LM_BIGRAMS
)
_BIGRAM_SCORE_ORACLE = f"""
    WITH uni(tok, mlp) AS (VALUES {_LM_VALUES}),
    big(prv, tok, mlp) AS (VALUES {_BIGRAM_VALUES}),
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                   '\\W+'), x -> x != '') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks
    ),
    costs AS (
        SELECT p.doc_id,
               CASE WHEN p.i = 1
                    THEN coalesce(u.mlp, {tx.LM_UNKNOWN_MILLI})
                    ELSE coalesce(b.mlp,
                        coalesce(u.mlp, {tx.LM_UNKNOWN_MILLI})
                        + {tx.LM_BACKOFF_MILLI})
               END AS c
        FROM pos p
        LEFT JOIN uni u ON u.tok = p.t[p.i]
        LEFT JOIN big b
          ON p.i > 1 AND b.prv = p.t[p.i - 1] AND b.tok = p.t[p.i]
    ),
    scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s
        FROM costs GROUP BY 1
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           coalesce(s.n, 0) AS n_tokens_scored,
           coalesce(s.s, 0) AS milli_logprob_sum,
           coalesce(s.s, 0) // greatest(coalesce(s.n, 0), 1)
               AS milli_ppl_proxy
    FROM documents d LEFT JOIN scored s USING (doc_id)
"""


@register("doc_bigram_score", _BIGRAM_SCORE_ORACLE)
def q_doc_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM perplexity proxy with stupid backoff (round 8): the
    conditional upgrade of doc_lm_score — frozen (prev, token) bigram
    costs where the table hits, unigram cost + the integer-quantized
    backoff penalty (-1000·log 0.4) where it misses, first token pays
    unigram.  Two map-literal probes inside native folds: zero shuffles,
    no Python, linear in text bytes.  All integers, so the oracle
    replays it exactly with two VALUES joins."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.bigram_lm_score(docs)


_CARD_SCAN_ORACLE = """
    WITH base AS (
        SELECT doc_id, text,
               list_aggregate(list_transform(range(0, 15),
                   i -> CAST((doc_id * 7 + i * 3) % 10 AS VARCHAR)),
                   'string_agg', '') AS p
        FROM documents
    ),
    chk AS (
        SELECT doc_id, text, p,
               (10 - list_sum(list_transform(range(1, len(p || '0') + 1),
                   i -> CASE WHEN i % 2 = 0
                        THEN ((ascii(substr(reverse(p || '0'), i, 1)) - 48) * 2) // 10
                             + ((ascii(substr(reverse(p || '0'), i, 1)) - 48) * 2) % 10
                        ELSE ascii(substr(reverse(p || '0'), i, 1)) - 48 END)) % 10)
                   % 10 AS check_digit
        FROM base
    ),
    aug AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 5 = 0
                            THEN ' card ' || p || CAST(check_digit AS VARCHAR)
                            WHEN doc_id % 5 = 1
                            THEN ' card ' || p ||
                                 CAST((check_digit + 1) % 10 AS VARCHAR)
                            ELSE '' END AS text2
        FROM chk
    ),
    scanned AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text2, '\\b\\d{13,19}\\b'))
                   AS BIGINT) AS n_candidates,
               CAST(len(list_filter(regexp_extract_all(text2, '\\b\\d{13,19}\\b'),
                   c -> list_sum(list_transform(range(1, len(c) + 1),
                       i -> CASE WHEN i % 2 = 0
                            THEN ((ascii(substr(reverse(c), i, 1)) - 48) * 2) // 10
                                 + ((ascii(substr(reverse(c), i, 1)) - 48) * 2) % 10
                            ELSE ascii(substr(reverse(c), i, 1)) - 48 END)) % 10 = 0))
                   AS BIGINT) AS n_valid_cards
        FROM aug
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n_candidates, n_valid_cards,
           n_valid_cards > 0 AS has_valid_card
    FROM scanned
"""


@register("doc_card_scan", _CARD_SCAN_ORACLE)
def q_doc_card_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-validated card-number screen (round 7): plant one card-shaped
    number per doc_id%5∈{0,1} — VALID Luhn for %5==0 (check digit derived
    by the same checksum), off-by-one otherwise — then run the scan
    (operators/text.py card_scan).  A bare long-digit PII pattern cannot
    tell the two apart; the checksum keeps only plausibly-real cards.
    The oracle replays the plant AND the validation with the identical
    integer arithmetic, so doubling-direction and check-digit bugs are
    hash mismatches.  Pure native fold: zero shuffles at any corpus."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    p_expr = (
        "array_join(transform(sequence(0, 14), "
        "i -> cast((doc_id * 7 + i * 3) % 10 as string)), '')"
    )
    chk = tx._luhn_sum_sql("concat(__p, '0')")
    aug = (
        docs.withColumn("__p", F.expr(p_expr))
        .withColumn("__chk", F.expr(f"cast((10 - ({chk}) % 10) % 10 as int)"))
        .withColumn(
            "text",
            F.expr(
                "concat(coalesce(text, ''), CASE "
                "WHEN doc_id % 5 = 0 THEN concat(' card ', __p, cast(__chk as string)) "
                "WHEN doc_id % 5 = 1 THEN concat(' card ', __p, "
                "cast((__chk + 1) % 10 as string)) "
                "ELSE '' END)"
            ),
        )
    )
    return tx.card_scan(aug.select("doc_id", "text"))


_VOCAB_VALUES = ", ".join(
    "('" + t.replace("'", "''") + f"', {i + 1})"
    for i, t in enumerate(tx.SUBWORD_VOCAB)
)
# The tokenizer CTE chain, shared by every oracle that consumes real
# subword counts (doc_bpe_tokens, doc_subword_mix): vocab VALUES ->
# pre-tokens -> recursive greedy-match walk -> per-doc aggregates.
_BPE_CORE_CTES = f"""vocab(tok, vid) AS (
        SELECT * FROM (VALUES {_VOCAB_VALUES}) v(tok, vid)),
    pts AS (
        SELECT doc_id,
               lower(unnest(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS pt
        FROM documents
    ),
    m(doc_id, pt, pos, n_sub, n_unk, vsum) AS (
        SELECT doc_id, pt, 1, 0, 0, 0 FROM pts
        UNION ALL
        SELECT m.doc_id, m.pt,
               m.pos + coalesce(ml.len, 1),
               m.n_sub + 1,
               m.n_unk + CASE WHEN ml.len IS NULL THEN 1 ELSE 0 END,
               m.vsum + coalesce(ml.vid, 0)
        FROM m LEFT JOIN LATERAL (
            SELECT len(v.tok) AS len, v.vid AS vid
            FROM vocab v
            WHERE substr(m.pt, m.pos, len(v.tok)) = v.tok
            ORDER BY len(v.tok) DESC LIMIT 1
        ) ml ON true
        WHERE m.pos <= len(m.pt)
    ),
    term AS (SELECT * FROM m WHERE pos > len(pt)),
    agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pretokens,
               CAST(sum(n_sub) AS BIGINT) AS n_subwords,
               CAST(sum(n_unk) AS BIGINT) AS n_unknown,
               CAST(sum(vsum) AS BIGINT) AS vid_sum
        FROM term GROUP BY 1
    )"""

_BPE_TOKENS_ORACLE = f"""
    WITH RECURSIVE {_BPE_CORE_CTES}
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           coalesce(a.n_pretokens, 0) AS n_pretokens,
           coalesce(a.n_subwords, 0) AS n_subwords,
           coalesce(a.n_unknown, 0) AS n_unknown,
           coalesce(a.vid_sum, 0) AS vid_sum
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register("doc_bpe_tokens", _BPE_TOKENS_ORACLE, headline=True)
def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL subword tokenization (round 7): greedy longest-match against
    the frozen 161-entry vocab (operators/text.py SUBWORD_VOCAB), not the
    regex approximation.  The oracle replays the exact tokenizer as a
    recursive CTE walking match positions with a longest-match lateral
    against the same vocab VALUES — n_subwords, n_unknown, and the
    vocab-id checksum are all hash-compared, so a greedy-order or
    off-by-one bug cannot hide.  n_subwords is the token budget the
    packing/mixing consumers take via their token_col parameter."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return tx.subword_stats(docs)


_LANG_SCORE_SQL = ",\n".join(
    "CAST(({parts}) AS BIGINT) AS score_{lang}".format(
        lang=lang,
        parts=" + ".join(
            f"(length(lower(text)) - length(replace(lower(text), '{m}', ''))) / {len(m)}"
            for m in markers
        ),
    )
    for lang, markers in tx.LANG_MARKERS.items()
)

_LANG_ORACLE = f"""
    SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
           CASE WHEN score_en >= score_de AND score_en >= score_es
                     AND score_en >= score_fr THEN 'en'
                WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
                WHEN score_es >= score_fr THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM (SELECT doc_id, lang, {_LANG_SCORE_SQL} FROM documents)
    """


@register("doc_lang_id", _LANG_ORACLE)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-n-gram language ID heuristic (deterministic argmax)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text"
    )
    return tx.lang_id(docs).select(
        "doc_id", "lang", "score_en", "score_de", "score_es", "score_fr", "lang_guess"
    )


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(
                    list_transform(
                        range(1, least(length(text), {tx.FINGERPRINT_PREFIX}) + 1),
                        j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
                    (a, b) -> (a * {tx.FINGERPRINT_BASE} + b) % {tx.FINGERPRINT_MOD})
           END AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash fingerprint (left fold, JVM aggregate)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    return docs.select(
        "doc_id", tx.rolling_fingerprint("text").alias("fingerprint")
    ).select("doc_id", F.col("fingerprint").cast("long").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "cosine_topk",
    """
    WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   CAST(p.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS sim
        FROM probes p JOIN embeddings c ON p.vec_id != c.vec_id
    )
    SELECT probe_id, neighbor_id, sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
    headline=True,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast probes, JVM fold dot products,
    windowed per-probe cut.  Similarity rounded to 6 digits before ranking
    so the ordering is engine-reproducible (64-element folds agree to
    ~1e-14)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    out = sim.brute_force_topk(probes, emb, k=5)
    return out.select(
        "probe_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


# Full replay of operators/similarity.lsh_topk (defaults: 8 planes x 4
# tables over dim 64).  Plane signs are md5-byte parity — pure string
# md5s, engine-identical; every dot product is a LEFT FOLD in dimension
# order (list_reduce here, F.aggregate there), so the IEEE double sums
# are bit-identical and the sign test / bucket membership cannot
# diverge.  Final sims round to 6 digits like cosine_topk.
_LSH_TOPK_ORACLE = """
    WITH plane_vecs AS (
        SELECT t, pl,
               list_transform(range(0, 64),
                   d -> CASE WHEN CAST('0x' || substr(md5(
                            CAST(t AS VARCHAR) || ':' || CAST(pl AS VARCHAR)
                            || ':' || CAST(d AS VARCHAR)), 1, 2) AS INTEGER)
                            % 2 = 1
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(-1.0 AS DOUBLE) END) AS pv
        FROM range(0, 4) tt(t), range(0, 8) pp(pl)
    ),
    sigs AS (
        SELECT v.vec_id, p.t AS tbl,
               CAST(sum(CASE WHEN list_reduce(
                       list_transform(range(1, 65),
                           i -> CAST(v.embedding[i] AS DOUBLE) * p.pv[i]),
                       (a, b) -> a + b) >= 0
                   THEN CAST(1 AS BIGINT) << p.pl ELSE 0 END) AS BIGINT) AS sig
        FROM embeddings v, plane_vecs p
        GROUP BY v.vec_id, p.t
    ),
    cand AS (
        SELECT DISTINCT ps.vec_id AS probe_id, cs.vec_id AS neighbor_id
        FROM sigs ps JOIN sigs cs ON ps.tbl = cs.tbl AND ps.sig = cs.sig
        WHERE ps.vec_id % 50 = 0 AND ps.vec_id != cs.vec_id
    ),
    scored AS (
        SELECT c.probe_id, c.neighbor_id,
               round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                            CAST(n.embedding AS DOUBLE[])),
                     6) AS sim
        FROM cand c
        JOIN embeddings p ON p.vec_id = c.probe_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    )
    SELECT probe_id, neighbor_id, sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """


@register("lsh_topk", _LSH_TOPK_ORACLE)
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k as exploded scalar rows
    (probe_id, neighbor_id, sim, rank) — fully oracle-replayed: the
    DuckDB side recomputes the md5-derived hyperplanes, the per-table
    signatures (left-fold projections, so the sign tests agree
    bit-for-bit), the bucket equi-join, and the exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    out = sim.lsh_topk(probes, emb, k=5, dim=64)
    return out.select(
        "probe_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


# Full replay of operators/similarity.ivf_topk (16 md5-sampled centroid
# cells, nprobe=4).  The quantizer sample (ORDER BY md5(id) LIMIT 16),
# the nearest-cell assignment (negsim = -(dot / sqrt(norm_v * norm_c)),
# the EXACT formula _nearest_cells executes, ties on cell id), the
# nprobe fan-out, and the in-cell exact re-rank are all recomputed with
# dimension-order left folds, so cell membership is bit-identical.
_IVF_TOPK_ORACLE = """
    WITH cents AS (
        SELECT CAST(row_number() OVER (ORDER BY k, vec_id) AS INTEGER) - 1
                   AS cell,
               embedding AS centroid
        FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS k, vec_id, embedding
              FROM embeddings ORDER BY k, vec_id LIMIT 16)
    ),
    assign AS (
        SELECT v.vec_id, c.cell,
               -(list_reduce(list_transform(range(1, 65),
                      i -> CAST(v.embedding[i] AS DOUBLE)
                           * CAST(c.centroid[i] AS DOUBLE)),
                      (a, b) -> a + b)
                 / sqrt(list_reduce(list_transform(range(1, 65),
                            i -> CAST(v.embedding[i] AS DOUBLE)
                                 * CAST(v.embedding[i] AS DOUBLE)),
                            (a, b) -> a + b)
                        * list_reduce(list_transform(range(1, 65),
                              i -> CAST(c.centroid[i] AS DOUBLE)
                                   * CAST(c.centroid[i] AS DOUBLE)),
                              (a, b) -> a + b))) AS negsim
        FROM embeddings v, cents c
    ),
    corpus_cell AS (
        SELECT vec_id AS neighbor_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY negsim, cell) AS rn
            FROM assign) WHERE rn = 1
    ),
    probe_cell AS (
        SELECT vec_id AS probe_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY negsim, cell) AS rn
            FROM assign WHERE vec_id % 50 = 0) WHERE rn <= 4
    ),
    cand AS (
        SELECT DISTINCT probe_id, neighbor_id
        FROM probe_cell p JOIN corpus_cell c USING (cell)
        WHERE probe_id != neighbor_id
    ),
    scored AS (
        SELECT c.probe_id, c.neighbor_id,
               round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                            CAST(n.embedding AS DOUBLE[])),
                     6) AS sim
        FROM cand c
        JOIN embeddings p ON p.vec_id = c.probe_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    )
    SELECT probe_id, neighbor_id, sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """


@register("ivf_topk", _IVF_TOPK_ORACLE)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k as exploded scalar rows — fully
    oracle-replayed: the DuckDB side recomputes the md5-sampled coarse
    quantizer, the nearest-cell assignment with the exact
    -(dot / sqrt(nv * nc)) formula (left folds, bit-identical), the
    nprobe=4 fan-out, and the in-cell exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    out = sim.ivf_topk(probes, emb, k=5, n_cells=16, nprobe=4)
    return out.select(
        "probe_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


_ANN_RECALL_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_probes, TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 50 = 0
    """


def _ann_recall_bound(spark, sf_dir, ann, threshold: float) -> DataFrame:
    """Shared recall bound-check: mean top-5 recall of an ANN operator vs
    the brute-force baseline over the %50 probe family, asserted >=
    ``threshold`` in the driver-compared output.  The pipelines are fully
    deterministic (md5-derived planes / centroid sample, rounded sims,
    id tie-breaks), so the verdict is stable across runs and SFs
    (measured: LSH 0.90-0.94, IVF 0.71-0.78 at sf0.001/0.01/0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    bf = sim.brute_force_topk(probes, emb, k=5).select("probe_id", "neighbor_id")
    hits = bf.join(
        ann(probes, emb).select("probe_id", "neighbor_id"),
        ["probe_id", "neighbor_id"],
        "left_semi",
    )
    per_probe = (
        probes.select(F.col("vec_id").alias("probe_id"))
        .join(hits.groupBy("probe_id").agg(F.count("*").alias("n_hit")), "probe_id", "left")
        .select(F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
    )
    return per_probe.agg(
        F.count("*").cast("long").alias("n_probes"),
        ((F.sum("n_hit") / (F.count("*") * 5)) >= threshold).alias("recall_ok"),
    )


@register("lsh_recall_bound", _ANN_RECALL_ORACLE)
def q_lsh_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN quality as a driver-checked bound: mean recall@5 vs brute
    force must clear 0.7 (recall-tuned config: 4 planes x 16 tables —
    random near-orthogonal embeddings are hyperplane LSH's worst case)."""
    return _ann_recall_bound(
        spark,
        sf_dir,
        lambda p, c: sim.lsh_topk(p, c, k=5, dim=64, n_planes=4, n_tables=16),
        0.7,
    )


@register("ivf_kmeans_recall_bound", _ANN_RECALL_ORACLE)
def q_ivf_kmeans_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a k-means-TRAINED coarse quantizer (operators/similarity.py
    kmeans_centroids): distributed Lloyd's iterations — broadcast-assign +
    one combinable fixed-point groupBy per iteration, bit-deterministic
    under any partitioning.  Tighter cells than the sampled quantizer:
    recall@5 must clear 0.7 at the same nprobe=8 where the sampled bound
    is 0.5 (measured 0.90 vs 0.78 at sf0.001)."""
    return _ann_recall_bound(
        spark,
        sf_dir,
        lambda p, c: sim.ivf_topk_trained(
            p, c, k=5, n_cells=16, nprobe=8, n_iters=4
        ),
        0.7,
    )


@register("pq_recall_bound", _ANN_RECALL_ORACLE)
def q_pq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py pq_adc_topk; Jégou
    et al. 2011) as a driver-checked bound: 64-bit PQ codes (m=16
    subspaces x 4-bit codewords — a 16x compression of the 64-float
    vectors; at 100 TB the scan touches codes, never raw vectors) scored
    by true ADC LUT lookups, with a 5%-of-corpus shortlist re-ranked
    exactly.  Mean recall@5 vs brute force must clear 0.6 (measured
    0.86 / 0.96 / 0.755 at sf0.001/0.01/0.1 — random near-orthogonal
    vectors are PQ's worst case; deterministic, so the verdict is
    stable)."""

    def ann(p: DataFrame, c: DataFrame) -> DataFrame:
        shortlist = max(50, -(-c.count() // 20))
        return sim.pq_adc_topk(
            p, c, k=5, dim=64, m=16, k_codes=16, shortlist=shortlist
        )

    return _ann_recall_bound(spark, sf_dir, ann, 0.6)


@register("ivf_pq_recall_bound", _ANN_RECALL_ORACLE)
def q_ivf_pq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/similarity.py ivf_pq_topk) — the
    production index shape (FAISS ``IVFPQ``): the coarse quantizer cuts
    the candidate join to nprobe/n_cells of the corpus AND each candidate is
    scored by m ADC lookups over 64-bit PQ codes instead of a dim-length
    float fold.  The two levers compose multiplicatively at 100 TB: scan
    fraction x bytes-per-row.  Mean recall@5 vs brute force must clear
    0.6.  Knob law (r10 isolated sweep; deterministic md5 quantizer +
    codebooks, so every number is exactly reproducible):

        nprobe=10 short=1/20: 0.80 / 0.80 / 0.68  (sf0.001/0.01/0.1)
        nprobe=12 short=1/20: 0.82 / 0.86 / 0.745
        nprobe=12 short=1/12: 0.82 / 0.86 / 0.80   <- shipped
        nprobe=14 short=1/10: 0.84 / 0.92 / 0.865

    The r9 config (10, 1/20) passed sf0.1 at 0.68 — a 0.08 margin too
    thin for a driver-checked gate; the shipped config holds >= 0.80 at
    every SF (0.2 over the bound) for ~35% more candidate volume, and a
    dedicated margin test pins recall >= 0.75 so a codebook tweak
    cannot silently skirt the driver bound."""

    def ann(p: DataFrame, c: DataFrame) -> DataFrame:
        shortlist = max(50, -(-c.count() // 12))
        return sim.ivf_pq_topk(
            p, c, k=5, dim=64, n_cells=16, nprobe=12, m=16, k_codes=16,
            shortlist=shortlist,
        )

    return _ann_recall_bound(spark, sf_dir, ann, 0.6)


@register("ivf_recall_bound", _ANN_RECALL_ORACLE)
def q_ivf_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN quality as a driver-checked bound: mean recall@5 vs brute
    force must clear 0.5 with nprobe=8 of 16 cells (half the corpus
    visited; random vectors spread the true neighbors across cells)."""
    return _ann_recall_bound(
        spark,
        sf_dir,
        lambda p, c: sim.ivf_topk(p, c, k=5, n_cells=16, nprobe=8),
        0.5,
    )


@register("ivf_index_recall_bound", _ANN_RECALL_ORACLE)
def q_ivf_index_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF index (plans/ann_index.py): quantizer trained and
    corpus published cell-partitioned through the catalog, queries served
    with directory-level partition pruning.  Exact-equality with the
    online ivf_topk_trained is pipeline-tested; this driver check holds
    the same recall@5 >= 0.7 bound through the full build->publish->query
    round trip."""
    import tempfile

    from .plans.ann_index import build_ivf_index, ivf_query_index
    from .plans.catalog import Catalog

    cat = Catalog(tempfile.mkdtemp(prefix="ann_q_"))
    built = {"done": False}

    def ann(probes, corpus):
        if not built["done"]:
            build_ivf_index(spark, cat, corpus, n_cells=16, n_iters=4)
            built["done"] = True
        return ivf_query_index(spark, cat, probes, 5, nprobe=8)

    return _ann_recall_bound(spark, sf_dir, ann, 0.7)


# ---------------------------------------------------------------------------
# Semantic (embedding-space) dedup — SemDeDup tier
# ---------------------------------------------------------------------------

EMB_MUTANT_DELTA = 0.0002  # per-component perturbation unit (oracle replays)


def _augment_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding corpus + planted semantic near-duplicates.

    The generated embeddings contain no natural near-dups (max off-diagonal
    cosine ~0.51 at sf0.01), so every %10 vector also emits a mutant
    (vec_id + MUTANT_OFFSET) perturbed per-component by a deterministic
    md5-derived delta in [-0.002, 0.002] — cosine to its source ~0.9999,
    far above the 0.95 dedup threshold and far below any natural pair.
    Same single-scan struct-array-explode form as the text `_augmented`."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    mutated = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mut:"),
                            F.col("vec_id").cast("string"),
                            F.lit(":"),
                            i.cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 21
            - 10
        )
        * F.lit(EMB_MUTANT_DELTA),
    )
    variants = F.array_compact(
        F.array(
            F.struct(F.col("vec_id"), F.col("embedding")),
            F.when(
                F.col("vec_id") % 10 == 0,
                F.struct(
                    (F.col("vec_id") + MUTANT_OFFSET).alias("vec_id"),
                    mutated.alias("embedding"),
                ),
            ),
        )
    )
    return emb.select(F.explode(variants).alias("__v")).select(
        F.col("__v.vec_id").alias("vec_id"),
        F.col("__v.embedding").alias("embedding"),
    )


_AUG_EMB_SQL = """
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(range(1, length(embedding) + 1),
                 j -> CAST(embedding[j] AS DOUBLE)
                      + (CAST(('0x' || substr(md5('mut:'
                             || CAST(vec_id AS VARCHAR) || ':'
                             || CAST(j - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 21 - 10) * 0.0002) AS v
        FROM embeddings WHERE vec_id % 10 = 0
"""


def _semantic_cc_sql(aug_body: str, final_select: str) -> str:
    """The SemDeDup oracle pipeline (quantize -> SRP sigs -> capped
    buckets -> cosine edges -> recursive transitive closure) over a
    caller-supplied ``aug`` CTE body, ending in ``final_select`` (which
    sees CTEs ``aug`` (vec_id, v) and ``comp`` (vec_id, component))."""
    return f"""
    WITH RECURSIVE aug AS ({aug_body}),
    quant AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS q
        FROM aug
    ),
    sigs AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dotp >= 0
                             THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
                    AS BIGINT) AS sig
        FROM (
            SELECT q.vec_id, p.p,
                   list_aggregate(
                       list_transform(range(1, 65),
                         j -> q.q[j] *
                              (CASE WHEN CAST(('0x' || substr(md5('semdedup_v1:'
                                       || CAST(p.p AS VARCHAR) || ':'
                                       || CAST(j - 1 AS VARCHAR)), 1, 2)) AS INT)
                                       % 2 = 1
                                    THEN 1 ELSE -1 END)),
                       'sum') AS dotp
            FROM quant q CROSS JOIN range(0, 8) p(p)) d
        GROUP BY 1
    ),
    kept AS (
        SELECT s.vec_id, s.sig FROM sigs s
        JOIN (SELECT sig, count(*) AS n FROM sigs GROUP BY 1) c
          ON s.sig = c.sig AND c.n <= 100
    ),
    edges0 AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM kept a
        JOIN kept b ON a.sig = b.sig AND a.vec_id < b.vec_id
        JOIN aug va ON va.vec_id = a.vec_id
        JOIN aug vb ON vb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= 0.95
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM edges0
        UNION SELECT id_b AS a, id_a AS b FROM edges0
    ),
    reach AS (
        SELECT vec_id AS id, vec_id AS lbl FROM aug
        UNION
        SELECT e.a AS id, r.lbl FROM reach r JOIN edges e ON e.b = r.id
    ),
    comp AS (SELECT id AS vec_id, min(lbl) AS component FROM reach GROUP BY id)
    {final_select}
    """


_SEMANTIC_DEDUP_ORACLE = _semantic_cc_sql(
    _AUG_EMB_SQL,
    "SELECT vec_id, component, vec_id = component AS is_survivor FROM comp",
)


# Eval side of the semantic-decontamination oracle: ONLY the planted
# mutants from _AUG_EMB_SQL (the "benchmark" is a paraphrased leak of
# every %10 training doc), so exactly the %10 corpus rows must flag.
_SEMANTIC_DECONTAM_ORACLE = """
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    evalset AS (
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(range(1, length(embedding) + 1),
                 j -> CAST(embedding[j] AS DOUBLE)
                      + (CAST(('0x' || substr(md5('mut:'
                             || CAST(vec_id AS VARCHAR) || ':'
                             || CAST(j - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 21 - 10) * 0.0002) AS v
        FROM embeddings WHERE vec_id % 10 = 0
    ),
    allv AS (
        SELECT 'c' AS side, vec_id, v FROM corpus
        UNION ALL SELECT 'e', vec_id, v FROM evalset
    ),
    quant AS (
        SELECT side, vec_id,
               list_transform(v, x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS q
        FROM allv
    ),
    sigs AS (
        SELECT side, vec_id,
               CAST(sum(CASE WHEN dotp >= 0
                             THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
                    AS BIGINT) AS sig
        FROM (
            SELECT q.side, q.vec_id, p.p,
                   list_aggregate(
                       list_transform(range(1, 65),
                         j -> q.q[j] *
                              (CASE WHEN CAST(('0x' || substr(md5('semdedup_v1:'
                                       || CAST(p.p AS VARCHAR) || ':'
                                       || CAST(j - 1 AS VARCHAR)), 1, 2)) AS INT)
                                       % 2 = 1
                                    THEN 1 ELSE -1 END)),
                       'sum') AS dotp
            FROM quant q CROSS JOIN range(0, 8) p(p)) d
        GROUP BY 1, 2
    ),
    c_kept AS (
        SELECT s.vec_id, s.sig FROM sigs s
        JOIN (SELECT sig, count(*) AS n FROM sigs WHERE side = 'c'
              GROUP BY 1) b
          ON s.sig = b.sig AND b.n <= 100
        WHERE s.side = 'c'
    ),
    hits AS (
        SELECT vec_id, CAST(count(DISTINCT eid) AS BIGINT) AS n_eval_hits,
               max(sim) AS max_sim
        FROM (
            SELECT ck.vec_id, es.vec_id AS eid,
                   round(list_cosine_similarity(cv.v, ev.v), 6) AS sim
            FROM c_kept ck
            JOIN (SELECT vec_id, sig FROM sigs WHERE side = 'e') es
              ON es.sig = ck.sig
            JOIN corpus cv ON cv.vec_id = ck.vec_id
            JOIN evalset ev ON ev.vec_id = es.vec_id
        ) x
        WHERE sim >= 0.95
        GROUP BY 1
    )
    SELECT c.vec_id,
           coalesce(h.n_eval_hits, 0) AS n_eval_hits,
           h.max_sim,
           coalesce(h.n_eval_hits, 0) > 0 AS contaminated
    FROM corpus c LEFT JOIN hits h USING (vec_id)
    """


@register("doc_semantic_decontam", _SEMANTIC_DECONTAM_ORACLE)
def q_doc_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-overlap screening (round 8): the embedding-space
    complement to the n-gram `doc_decontaminate` — catches paraphrased
    or re-embedded benchmark leakage that token-level n-grams cannot
    see.  The eval set is the planted near-dup mutants (cosine ~0.9999
    to their %10 sources), so ONLY %10 corpus rows can flag and nearly
    all do (SRP blocking recall ~1 at 8 planes; a planted pair that
    misses its bucket is missed identically by the oracle — the replay
    is exact either way).
    Operator: operators/semantic.py semantic_decontaminate — two-sided
    integer-SRP blocking, ONE corpus↔eval signature equi-join (never
    corpus × eval), corpus-side hot-bucket cap, exact rounded cosine.
    The oracle replays planes, quantization, cap, and threshold
    verbatim.  At 100 TB the corpus shuffles only (sig, id, vector) for
    occupied buckets; eval signatures are benchmark-sized."""
    from .operators.semantic import semantic_decontaminate

    corpus = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    eval_set = _augment_embeddings(spark, sf_dir).filter(
        F.col("vec_id") >= MUTANT_OFFSET
    )
    return semantic_decontaminate(
        corpus, eval_set, dim=64, threshold=0.95, n_planes=8
    )


@register("embedding_semantic_dedup", _SEMANTIC_DEDUP_ORACLE, headline=True)
def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end: integer-SRP blocking ->
    within-bucket cosine edges -> connected-component clustering -> min-id
    survivors.  The oracle replays the ENTIRE pipeline exactly — the
    md5-derived Rademacher planes and micro-quantized integer dot products
    verbatim, plus a recursive-CTE transitive closure standing in for the
    distributed label propagation.  At 100 TB: row-local signatures, one
    signature equi-join (never all-pairs), O(log n) component rounds."""
    from .operators.semantic import semantic_dedup

    aug = _augment_embeddings(spark, sf_dir)
    return semantic_dedup(aug, dim=64, threshold=0.95, n_planes=8)


# ---------------------------------------------------------------------------
# Corpus composition: source mixing under a token budget
# ---------------------------------------------------------------------------

# Percent-scale weights over the 20 fixture sources (w = i%4 + 1) and a
# budget that leaves high-weight sources fully kept and low-weight ones
# subsampled — exercising both sides of the min(1, rate) clamp.
MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}
MIX_BUDGET = 30_000

_MIX_VALUES = ", ".join(f"('src{i}', {(i % 4) + 1})" for i in range(20))
_SOURCE_MIX_ORACLE = f"""
    WITH w(source, wt) AS (VALUES {_MIX_VALUES}),
    dt AS (
        SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS gt
            FROM dt GROUP BY 1),
    thr AS (
        SELECT t.source,
               CASE WHEN t.gt = 0 THEN
                        CASE WHEN coalesce(w.wt, 0) > 0 THEN 10000 ELSE 0 END
                    ELSE least(10000, CAST(floor(10000 *
                        (CAST({MIX_BUDGET} * coalesce(w.wt, 0) AS DOUBLE) /
                         CAST({sum(MIX_WEIGHTS.values())} * t.gt AS DOUBLE)))
                        AS BIGINT))
               END AS thr
        FROM tot t LEFT JOIN w USING (source)
    )
    SELECT d.doc_id, d.source, d.n_tokens,
           (CAST(('0x' || substr(md5('mix_v1' || CAST(d.doc_id AS VARCHAR)),
                 1, 15)) AS BIGINT) % 10000) < t.thr AS keep
    FROM dt d JOIN thr t USING (source)
"""


@register("doc_source_mix", _SOURCE_MIX_ORACLE)
def q_doc_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: compose the corpus to a 30k-token budget with
    per-source target weights (operators/sampling.py source_mix).  One
    map-side-combinable groupBy + a broadcast-able source-dimension join
    + a row-local integer keep decision; the oracle replays the md5
    threshold rule exactly."""
    from .operators.sampling import source_mix

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    )
    return source_mix(
        docs, weights=MIX_WEIGHTS, token_budget=MIX_BUDGET
    ).select("doc_id", "source", "n_tokens", "keep")


_SUBWORD_MIX_ORACLE = f"""
    WITH RECURSIVE {_BPE_CORE_CTES},
    w(source, wt) AS (VALUES {_MIX_VALUES}),
    dt AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
               CAST(coalesce(a.n_subwords, 0) AS BIGINT) AS n_subwords
        FROM documents d LEFT JOIN agg a USING (doc_id)
    ),
    tot AS (SELECT source, CAST(sum(n_subwords) AS BIGINT) AS gt
            FROM dt GROUP BY 1),
    thr AS (
        SELECT t.source,
               CASE WHEN t.gt = 0 THEN
                        CASE WHEN coalesce(w.wt, 0) > 0 THEN 10000 ELSE 0 END
                    ELSE least(10000, CAST(floor(10000 *
                        (CAST({MIX_BUDGET} * coalesce(w.wt, 0) AS DOUBLE) /
                         CAST({sum(MIX_WEIGHTS.values())} * t.gt AS DOUBLE)))
                        AS BIGINT))
               END AS thr
        FROM tot t LEFT JOIN w USING (source)
    )
    SELECT d.doc_id, d.source, d.n_subwords,
           (CAST(('0x' || substr(md5('mix_v1' || CAST(d.doc_id AS VARCHAR)),
                 1, 15)) AS BIGINT) % 10000) < t.thr AS keep
    FROM dt d JOIN thr t USING (source)
"""


@register("doc_subword_mix", _SUBWORD_MIX_ORACLE)
def q_doc_subword_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing budgeted by REAL subword counts (round 7): the
    frozen-vocab tokenizer's n_subwords drives source_mix through its
    token_col parameter — the consumer-wiring proof that token budgets
    no longer depend on the regex approximation.  The oracle composes the
    recursive-CTE tokenizer replay with the mix threshold replay, so the
    whole chain (tokenize -> per-source totals -> integer keep decision)
    is hash-compared end to end."""
    from .operators.sampling import source_mix

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    joined = docs.select("doc_id", "source").join(
        tx.subword_stats(docs).select("doc_id", "n_subwords"), "doc_id"
    )
    return source_mix(
        joined,
        weights=MIX_WEIGHTS,
        token_budget=MIX_BUDGET,
        token_col="n_subwords",
    ).select("doc_id", "source", "n_subwords", "keep")


# ---------------------------------------------------------------------------
# Quantile-based quality filtering
# ---------------------------------------------------------------------------

_QUALITY_QUANTILE_ORACLE = """
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(floor(
                   (len(list_distinct(list_filter(
                        regexp_split_to_array(lower(text), '\\W+'),
                        x -> x != ''))) * 1000)
                   / greatest(len(list_filter(
                        regexp_split_to_array(text, '\\s+'), x -> x != '')), 1)
               ) AS BIGINT) AS milli_ttr
        FROM documents
    ),
    rk AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY milli_ttr DESC, doc_id) AS r,
               count(*) OVER (PARTITION BY lang) AS n
        FROM scored
    )
    SELECT doc_id, lang, milli_ttr, (r * 100 <= n * 60) AS keep FROM rk
"""


@register("doc_quality_quantile", _QUALITY_QUANTILE_ORACLE)
def q_doc_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile quality filter: keep the top 60% of docs by
    integer milli type-token ratio within each language.  The engine runs
    the skew-proof histogram decomposition (operators/selection.py
    quantile_filter); the oracle runs the naive rank window — independent
    validation of the decomposition's exactness."""
    from .operators.selection import quantile_filter

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.floor(
            (tx.distinct_token_count(F.col("text")) * 1000)
            / F.greatest(tx.token_count(F.col("text")), F.lit(1))
        )
        .cast("long")
        .alias("milli_ttr"),
    )
    return quantile_filter(
        docs,
        score_col="milli_ttr",
        group_col="lang",
        keep_top_percent=60,
        id_col="doc_id",
    ).select("doc_id", "lang", "milli_ttr", "keep")


# ---------------------------------------------------------------------------
# Corpus composition report
# ---------------------------------------------------------------------------

_CORPUS_STATS_ORACLE = """
    WITH dt AS (
        SELECT lang, source,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    grp AS (
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM dt GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM dt)
    SELECT g.lang, g.source, g.n_docs, g.n_tokens,
           CAST(floor((g.n_tokens * 1000) / t.t) AS BIGINT) AS share_milli
    FROM grp g CROSS JOIN tot t
"""


@register("corpus_stats", _CORPUS_STATS_ORACLE)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per (lang, source) doc counts, token
    totals, and integer milli share of corpus tokens — the dashboard
    query behind every mixing decision.  One combinable groupBy + a
    broadcast one-row total; all-integer outputs (floor of one exact
    BIGINT division)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "lang", "source", tx.token_count(F.col("text")).alias("n_tokens")
    )
    grp = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    tot = docs.agg(F.sum("n_tokens").alias("__t"))
    return grp.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.floor((F.col("n_tokens") * 1000) / F.col("__t"))
        .cast("long")
        .alias("share_milli"),
    )


# ---------------------------------------------------------------------------
# Cluster-safe (leakage-free) split assignment
# ---------------------------------------------------------------------------

_CLUSTER_SAFE_SPLIT_ORACLE = f"""
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
           CASE WHEN CAST(('0x' || substr(md5('leakfree_v1' ||
                     CAST(component AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
                THEN 'train'
                WHEN CAST(('0x' || substr(md5('leakfree_v1' ||
                     CAST(component AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95
                THEN 'val'
                ELSE 'test' END AS split
    FROM comp
    """.format(sig_sql=_MINHASH_SIG_SQL, max_bucket=dd.MAX_BUCKET_SIZE)


@register("doc_cluster_safe_split", _CLUSTER_SAFE_SPLIT_ORACLE)
def q_doc_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test assignment: split by the near-dup
    CLUSTER id, not the doc id, so a document and its near-duplicates can
    never straddle splits (hash-splitting raw ids silently leaks train
    content into eval — the cluster key closes that hole).  Keeps ALL
    docs (splitting precedes any survivor choice); the oracle replays the
    LSH + recursive transitive closure + component-keyed hash ranges."""
    from .operators.components import dedup_survivors
    from .operators.sampling import split_assign

    aug = _augment_near(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(aug)
    comp = dedup_survivors(aug, pairs).select("doc_id", "component")
    return split_assign(
        comp,
        "component",
        weights={"train": 90, "val": 5, "test": 5},
        salt="leakfree_v1",
    )


# ---------------------------------------------------------------------------
# End-to-end semantic curation (cross-modal composition)
# ---------------------------------------------------------------------------

_SEMANTIC_CURATION_ORACLE = _semantic_cc_sql(
    f"""
        SELECT a.vec_id, a.v FROM ({_AUG_EMB_SQL}) a
        JOIN documents d ON d.doc_id = a.vec_id % 1000000
        WHERE d.lang = 'en'
    """,
    """
    SELECT c.vec_id, c.component, c.vec_id = c.component AS is_survivor,
           CASE WHEN CAST(('0x' || substr(md5('semcur_v1' ||
                     CAST(c.component AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 100 < 90
                THEN 'train'
                WHEN CAST(('0x' || substr(md5('semcur_v1' ||
                     CAST(c.component AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 100 < 95
                THEN 'val'
                ELSE 'test' END AS split
    FROM comp c
    """,
)


@register("doc_semantic_curation", _SEMANTIC_CURATION_ORACLE)
def q_doc_semantic_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation end-to-end: document metadata gates the
    EMBEDDING pipeline — keep English docs (mutants inherit their source
    doc's language through a modulo join), semantically dedup their
    embeddings (integer-SRP blocking -> cosine edges -> CC), then assign
    leakage-free splits keyed on the semantic CLUSTER id.  The oracle
    replays every stage including the recursive closure.  Scale shape:
    the metadata gate is a broadcast-able dim join BEFORE any signature
    work (prune early), then the standard bucketed semantic pipeline."""
    from .operators.components import dedup_survivors
    from .operators.sampling import split_assign
    from .operators.semantic import semantic_candidate_pairs

    aug = _augment_embeddings(spark, sf_dir)
    en_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    kept = aug.join(
        F.broadcast(en_docs),
        (F.col("vec_id") % MUTANT_OFFSET) == F.col("doc_id"),
    ).select("vec_id", "embedding")
    pairs = semantic_candidate_pairs(kept, dim=64)
    comp = dedup_survivors(kept, pairs, id_col="vec_id").select(
        "vec_id", "component", "is_survivor"
    )
    return split_assign(
        comp,
        "component",
        weights={"train": 90, "val": 5, "test": 5},
        salt="semcur_v1",
    )


@register(
    "doc_df_drift",
    """
    WITH dd_ref AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    dd_cur AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' driftterm'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 2 = 1
    ),
    dd_rp AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\\W+'),
                       x -> x != '')) AS term
            FROM dd_ref)
    ),
    dd_cp AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\\W+'),
                       x -> x != '')) AS term
            FROM dd_cur)
    ),
    dd_rdf AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df_ref
        FROM dd_rp GROUP BY term
    ),
    dd_cdf AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df_cur
        FROM dd_cp GROUP BY term
    ),
    dd_nr AS (SELECT CAST(count(text) AS BIGINT) AS nr FROM dd_ref),
    dd_nc AS (SELECT CAST(count(text) AS BIGINT) AS nc FROM dd_cur)
    SELECT COALESCE(r.term, c.term) AS term,
           COALESCE(r.df_ref, 0) AS df_ref,
           COALESCE(c.df_cur, 0) AS df_cur,
           CASE WHEN COALESCE(r.df_ref, 0) > 0
                 AND COALESCE(c.df_cur, 0) > 0
                THEN CAST((c.df_cur * nr.nr * 1000000)
                          // (r.df_ref * nc.nc) AS BIGINT) END
               AS rate_ratio_ppm,
           COALESCE(r.df_ref, 0) = 0 AS is_new,
           COALESCE(c.df_cur, 0) = 0 AS is_gone
    FROM dd_rdf r
    FULL OUTER JOIN dd_cdf c ON c.term = r.term
    CROSS JOIN dd_nr nr CROSS JOIN dd_nc nc
    WHERE greatest(COALESCE(r.df_ref, 0), COALESCE(c.df_cur, 0)) >= 5
    """,
)
def q_doc_df_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift screen (operators/text.py df_drift, r12): the
    even-id document half is the reference snapshot, the odd-id half is
    the fresh corpus with a planted template term appended to every
    %7 doc — which the screen must surface as ``is_new`` while the
    shared vocabulary reads rate ratios near 1e6 ppm.  The exact
    cross-multiplied document-rate ratio replays with ``//``; the
    is_new/is_gone flags are the one-sided signal.  The screen family's
    vocabulary-shift member next to the value-distribution KS drift."""
    from .operators.text import df_drift

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" driftterm")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return df_drift(ref, cur, min_df=5)


@register(
    "doc_collocations",
    """
    WITH cl_t AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t
        FROM documents
    ),
    cl_b AS (
        SELECT t[CAST(u.i AS BIGINT)] AS w1,
               t[CAST(u.i AS BIGINT) + 1] AS w2
        FROM cl_t, UNNEST(range(1, len(t))) AS u(i)
    ),
    cl_c AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
        FROM cl_b GROUP BY w1, w2
    ),
    cl_m AS (
        SELECT term, CAST(SUM(c) AS BIGINT) AS member_count FROM (
            SELECT w1 AS term, pair_count AS c FROM cl_c
            UNION ALL
            SELECT w2 AS term, pair_count AS c FROM cl_c
        ) GROUP BY term
    ),
    cl_n AS (
        SELECT CAST(COALESCE(SUM(pair_count), 0) AS BIGINT) AS n FROM cl_c
    )
    SELECT c.w1, c.w2, c.pair_count,
           m1.member_count AS w1_count,
           m2.member_count AS w2_count,
           CAST((CAST(c.pair_count AS HUGEINT) * n.n * 1000000)
                // (m1.member_count * m2.member_count) AS BIGINT)
               AS lift_ppm
    FROM cl_c c
    JOIN cl_m m1 ON m1.term = c.w1
    JOIN cl_m m2 ON m2.term = c.w2
    CROSS JOIN cl_n n
    WHERE c.pair_count >= 5
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT 20
    """,
)
def q_doc_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by exact lift (operators/text.py
    collocations, r12): the PMI-class collocation miner — frequency
    (corpus_top_ngrams) finds what is common, lift finds what
    CO-OCCURS more than its parts predict.  DECIMAL(38,0) vs HUGEINT
    cross-multiply with one truncating division; the ranking is the
    PMI ranking because log is monotone."""
    from .operators.text import collocations

    docs = spread(load_table(spark, sf_dir, "documents")).select("text")
    return collocations(docs, min_pair_count=5, k=20)


@register(
    "doc_dup_rate_by_source",
    f"""
    WITH RECURSIVE aug AS ({_AUG_EXACT}),
    dr_g AS (
        SELECT md5(text) AS dg, min(doc_id) AS keep
        FROM aug GROUP BY md5(text)
    ),
    dr_d AS (
        SELECT a.doc_id, a.doc_id % 1000000 AS base_id, md5(a.text) AS dg
        FROM aug a
    ),
    dr_s AS (
        SELECT doc.source, dr_d.doc_id, dr_g.keep
        FROM dr_d
        JOIN dr_g USING (dg)
        JOIN documents doc ON doc.doc_id = dr_d.base_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id != keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_rows,
           CAST((sum(CASE WHEN doc_id != keep THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS dup_ppm
    FROM dr_s GROUP BY source
    """,
)
def q_doc_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication-rate report (r12) — the curation KPI a
    corpus owner reads before deciding which scrape to re-crawl: for
    each source, the row count, the count of NON-survivor rows under
    exact dedup (min-id survivorship over the content digest), and the
    duplication rate in exact ppm.  The augmented corpus plants
    verbatim copies on every %10 doc, so rates are non-trivial; a
    mutant's source is its base document's (id mod 1e6 maps back).
    Composition of the standing exact-dedup groups — one digest
    groupBy + a digest join-back + a broadcast dim join + a combinable
    source census."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "source"
    )
    aug = _augment_exact(spark, sf_dir)
    groups = dd.exact_dedup(aug)
    d = aug.select(
        "doc_id",
        (F.col("doc_id") % MUTANT_OFFSET).alias("base_id"),
        dd.content_digest(F.col("text")).alias("digest"),
    )
    return (
        d.join(groups.select("digest", "keep_id"), "digest")
        .join(F.broadcast(docs), "base_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("doc_id") != F.col("keep_id")).cast("bigint"))
            .cast("bigint")
            .alias("n_dup_rows"),
        )
        .withColumn(
            "dup_ppm", F.expr("(n_dup_rows * 1000000) div n_docs")
        )
    )


@register(
    "doc_source_lang_simpson",
    """
    WITH si_c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents WHERE lang IS NOT NULL
        GROUP BY source, lang
    ),
    si_a AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_categories,
               SUM(CAST(n AS HUGEINT) * (n - 1)) AS s
        FROM si_c GROUP BY source
    )
    SELECT source, n_rows, n_categories,
           CASE WHEN n_rows >= 2
                THEN CAST((s * 1000000)
                          // (CAST(n_rows AS HUGEINT) * (n_rows - 1))
                     AS BIGINT) END AS simpson_ppm
    FROM si_a
    """,
)
def q_doc_source_lang_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language concentration (operators/stats.py
    simpson_concentration, r12): the Simpson/Hunter-Gaston index of
    each source's language mix in exact ppm — the corpus-mix
    homogeneity KPI next to corpus_stats' share report (shares say
    WHAT the mix is; the index says HOW concentrated, in one
    pair-draw probability).  DECIMAL(38,0) vs HUGEINT cross-multiply
    with one truncating division."""
    from .operators.stats import simpson_concentration

    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    return simpson_concentration(
        docs, item_col="lang", group_cols=["source"]
    )


@register(
    "corpus_ngram_overlap",
    """
    WITH ov_tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\W+'),
                           x -> x != '') AS t
        FROM documents
    ),
    ov_prev AS (
        SELECT doc_id + 1 AS doc_id, t AS pt FROM ov_tok
    ),
    ov_cur_tok AS (
        SELECT c.doc_id,
               CASE WHEN c.doc_id % 9 = 0 AND p.pt IS NOT NULL
                    THEN p.pt ELSE c.t END AS t
        FROM ov_tok c LEFT JOIN ov_prev p USING (doc_id)
        WHERE c.doc_id % 2 = 1
    ),
    ov_rg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3),
                    i -> md5(array_to_string(t[i:i+4], ' ')))) AS digest
        FROM ov_tok WHERE doc_id % 2 = 0 AND len(t) >= 5
    ),
    ov_cg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3),
                    i -> md5(array_to_string(t[i:i+4], ' ')))) AS digest
        FROM ov_cur_tok WHERE len(t) >= 5
    ),
    ov_j AS (
        SELECT r.digest AS rd, c.digest AS cd
        FROM ov_rg r FULL OUTER JOIN ov_cg c ON c.digest = r.digest
    ),
    ov_a AS (
        SELECT CAST(count(rd) AS BIGINT) AS n_ref_grams,
               CAST(count(cd) AS BIGINT) AS n_cur_grams,
               CAST(count(CASE WHEN rd IS NOT NULL AND cd IS NOT NULL
                               THEN 1 END) AS BIGINT) AS n_shared
        FROM ov_j
    )
    SELECT n_ref_grams, n_cur_grams, n_shared,
           CASE WHEN n_cur_grams > 0
                THEN CAST((n_shared * 1000000) // n_cur_grams AS BIGINT)
           END AS cur_in_ref_ppm,
           CASE WHEN n_ref_grams > 0
                THEN CAST((n_shared * 1000000) // n_ref_grams AS BIGINT)
           END AS ref_in_cur_ppm
    FROM ov_a
    """,
)
def q_corpus_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level 5-gram overlap share (operators/decontam.py
    corpus_ngram_overlap, r12): the even-id half is the reference
    training corpus, the odd-id half the incoming scrape with every
    %9 doc REPLACED by its even predecessor's text (a planted verbatim
    re-crawl), so the screen reads a non-trivial cur-in-ref share —
    the 'how much of this scrape is already in training' KPI next to
    the per-doc decontamination flags.  Exact ppm; the oracle replays
    tokenization, the window digests, both distinct censuses, the
    full-outer join and the conditional counts."""
    from .operators.decontam import corpus_ngram_overlap

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    prev = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("ptext")
    )
    cur = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 9 == 0) & F.col("ptext").isNotNull(),
                F.col("ptext"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return corpus_ngram_overlap(ref, cur, n=5)


@register(
    "doc_readability",
    """
    WITH rd_b AS (
        SELECT source,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                    x -> x != '')) AS BIGINT) AS w,
               CAST(length(regexp_replace(text, '[.!?]+', '#', 'g'))
                  - length(regexp_replace(text, '[.!?]+', '', 'g'))
                  AS BIGINT) AS s,
               CAST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
                  - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
                  AS BIGINT) AS y
        FROM documents WHERE text IS NOT NULL
    ),
    rd_g AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS n_words,
               CAST(sum(s) AS BIGINT) AS n_sentences,
               CAST(sum(y) AS BIGINT) AS n_syllables
        FROM rd_b GROUP BY source
    )
    SELECT source, n_docs, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 AND n_sentences > 0 THEN
               206835 - (1015 * n_words) // n_sentences
                      - (84600 * n_syllables) // n_words
           END AS flesch_milli,
           CASE WHEN n_words > 0 AND n_sentences > 0 THEN
               (390 * n_words) // n_sentences
               + (11800 * n_syllables) // n_words - 15590
           END AS fk_grade_milli
    FROM rd_g
    """,
)
def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus readability per scrape source (operators/text.py
    readability, r13): Flesch reading ease + Flesch-Kincaid grade in
    exact milli from integer word / sentence-run / vowel-run counts —
    the prose-quality screen next to doc_gopher_rules' structural
    gates when weighing a source's training-mix share.  Run counts use
    the double-replace length identity (portable: Java regex and RE2
    agree on `[...]+`), ratios are one truncating division each,
    replayed verbatim.  Per-row JVM regex into ONE combinable groupBy;
    no join, no window, no Python (plan-gated)."""
    from .operators.text import readability

    docs = load_table(spark, sf_dir, "documents")
    return readability(docs, text_col="text", group_cols=["source"])


@register(
    "doc_char_entropy",
    """
    WITH ce_x AS (
        SELECT source, unnest(string_split(text, '')) AS ch
        FROM documents WHERE text IS NOT NULL
    ),
    ce_c AS (
        SELECT source, ch, CAST(count(*) AS BIGINT) AS cnt
        FROM ce_x WHERE ch != '' GROUP BY 1, 2
    ),
    ce_g AS (
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS n_chars,
               CAST(count(*) AS BIGINT) AS n_distinct_chars,
               list_reduce(
                   list(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))
                        ORDER BY ch),
                   (a, b) -> a + b) AS s
        FROM ce_c GROUP BY 1
    )
    SELECT source, n_chars, n_distinct_chars,
           CASE WHEN n_chars > 0
                THEN round(ln(CAST(n_chars AS DOUBLE))
                           - s / CAST(n_chars AS DOUBLE), 6)
           END AS entropy,
           CASE WHEN n_chars > 0 AND n_distinct_chars > 1
                THEN round((ln(CAST(n_chars AS DOUBLE))
                            - s / CAST(n_chars AS DOUBLE))
                           / ln(CAST(n_distinct_chars AS DOUBLE)), 6)
           END AS efficiency
    FROM ce_g
    """,
)
def q_doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy information-density screen per scrape source
    (operators/text.py char_entropy, r13): Shannon entropy in nats +
    alphabet efficiency — the symbol-usage quality signal next to
    doc_readability's prose-structure score (base64 blobs read near
    ln 64, template boilerplate far below the corpus norm).  The one
    float reduction is a fixed-order fold over the char census in
    UTF-8 binary order, replayed bit-equal by DuckDB's ordered
    list_reduce (the binned_psi technique).  The explode pipelines
    into the partial aggregate inside one codegen span; ONE exchange
    carries the alphabet-bounded census (plan-gated)."""
    from .operators.text import char_entropy

    docs = load_table(spark, sf_dir, "documents")
    return char_entropy(docs, text_col="text", group_cols=["source"])


@register(
    "doc_vocab_gini",
    """
    WITH vg_x AS (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(text),
                   '\\W+'), x -> x != '')) AS term
        FROM documents WHERE text IS NOT NULL
    ),
    vg_c AS (
        SELECT source, term, CAST(count(*) AS BIGINT) AS f
        FROM vg_x GROUP BY 1, 2
    ),
    vg_r AS (
        SELECT source, f,
               row_number() OVER (PARTITION BY source
                                  ORDER BY f, term) AS i
        FROM vg_c
    ),
    vg_g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(f) AS BIGINT) AS n_tokens,
               CAST(sum(2 * CAST(i AS HUGEINT) * f) AS HUGEINT) AS s2if
        FROM vg_r GROUP BY 1
    )
    SELECT source, n_terms, n_tokens,
           CASE WHEN n_terms > 1 AND n_tokens > 0 THEN
               CAST((1000000 * (s2if - (CAST(n_terms AS HUGEINT) + 1)
                                * n_tokens))
                    // (CAST(n_terms AS HUGEINT) * n_tokens) AS BIGINT)
           END AS gini_ppm
    FROM vg_g
    """,
)
def q_doc_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency Gini concentration per scrape source
    (operators/text.py vocab_gini, r13): the template/boilerplate
    detector — a source whose token mass concentrates in few terms
    reads near 1e6 ppm, diverse prose lower; the usage-inequality
    companion to doc_heaps_law's vocabulary growth and
    doc_char_entropy's symbol entropy.  Exact end to end: frequencies
    sort ascending with the term string as the determinism tie-break
    (rank-block sums are tie-order invariant), one truncating
    DECIMAL(38,0)-vs-HUGEINT division.  The token explode pipelines
    into the partial census aggregate; the rank window runs
    census-sized on the source key (plan-gated)."""
    from .operators.text import vocab_gini

    docs = load_table(spark, sf_dir, "documents")
    return vocab_gini(docs, text_col="text", group_cols=["source"])
