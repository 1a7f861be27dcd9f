"""Dedup-family query catalog (split from queries_llm.py in round 13 —
VERDICT r12 item 6: the monolith was re-forming).  Same @register
calls, registry name set identical; exact dedup, MinHash-LSH, SimHash,
PPJoin Jaccard, PassJoin fuzzy pairs, survivorship — over the
augmented documents fixtures (see queries_llm._augment_exact /
_augment_near for the mutant-planting laws both engines share)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import similarity as sim
from .registry import register
from .tables import load_table, spread

from .queries_llm import (
    _AUG_EXACT,
    _AUG_NEAR,
    _MINHASH_SIG_SQL,
    _augment_exact,
    _augment_near,
)

# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@register(
    "doc_exact_dedup",
    f"""
    WITH RECURSIVE aug AS ({_AUG_EXACT})
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM aug GROUP BY md5(text)
    """,
    headline=True,
)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a content digest: the shuffle moves 16-byte digests,
    not document payloads (operators/dedup.py design note)."""
    return dd.exact_dedup(_augment_exact(spark, sf_dir))


@register(
    "doc_dedup_survivors",
    f"""
    WITH RECURSIVE aug AS ({_AUG_EXACT}),
    groups AS (
        SELECT md5(text) AS digest, min(doc_id) AS keep_id
        FROM aug GROUP BY md5(text)
    )
    SELECT a.doc_id, g.digest, length(a.text) AS n_chars
    FROM aug a JOIN groups g ON a.doc_id = g.keep_id AND md5(a.text) = g.digest
    """,
)
def q_doc_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full narrow-shuffle exact-dedup pattern: group digests (16-byte
    shuffle), then join survivors back by (digest, keep_id) — document
    payloads never cross a shuffle as dedup keys."""
    aug = _augment_exact(spark, sf_dir)
    groups = dd.exact_dedup(aug)
    with_digest = aug.withColumn("digest", dd.content_digest(F.col("text")))
    return (
        with_digest.join(
            groups.select("digest", "keep_id"),
            (F.col("doc_id") == F.col("keep_id")) & (with_digest.digest == groups.digest),
        )
        .select("doc_id", with_digest.digest.alias("digest"), F.length("text").alias("n_chars"))
    )


_MINHASH_ORACLE = f"""
    WITH RECURSIVE aug AS ({_AUG_NEAR}),
    norm AS (SELECT doc_id, lower(substr(text, 1, 200)) AS n FROM aug),
    hashed AS (SELECT doc_id, list_transform(
        range(1, greatest(length(n) - 4, 1) + 1),
        j -> md5(substr(n, j, 5))) AS hl FROM norm),
    sigs AS (SELECT doc_id, {_MINHASH_SIG_SQL} FROM hashed),
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
         AND s.n <= {dd.MAX_BUCKET_SIZE}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM kept a
    JOIN kept b ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
    """


@register("minhash_pairs", _MINHASH_ORACLE, headline=True)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle -> md5 min-hash family ->
    band -> bucket equi-join.  The oracle replays the identical pipeline in
    SQL — the whole LSH construction is engine-agnostic by design."""
    return dd.minhash_candidate_pairs(_augment_near(spark, sf_dir))


@register(
    "doc_fuzzy_pairs",
    """
    WITH k AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      1, 16) AS key
        FROM documents
        WHERE length(substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                            1, 16)) > 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
    FROM k a JOIN k b
      ON a.doc_id < b.doc_id
     AND abs(length(a.key) - length(b.key)) <= 2
    WHERE levenshtein(a.key, b.key) <= 2
    """,
    headline=True,
)
def q_doc_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy join (record linkage / fuzzy dedup): all pairs
    of docs whose ASCII-normalized 16-char key prefixes are within
    Levenshtein distance 2, via COMPLETE PassJoin segment blocking
    (operators/fuzzy.py) — never all-pairs.  The oracle is the
    brute-force quadratic form, so this check exercises a genuinely
    independent algorithm: any blocking incompleteness or verify-filter
    slip diverges.  Keys are normalized to ASCII because Spark counts
    codepoint edits while DuckDB counts byte edits."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = spread(docs).select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), 1, 16
        ).alias("key"),
    )
    from .operators.fuzzy import fuzzy_pairs

    return fuzzy_pairs(keyed, key_col="key", id_col="doc_id", max_dist=2)


@register(
    "doc_jaccard_join",
    """
    WITH jj_d AS (
        SELECT doc_id, list_distinct(list_filter(
            regexp_split_to_array(lower(text), '\\W+'), x -> x != ''))
            AS toks
        FROM documents WHERE doc_id % 5 = 0
    ),
    jj_s AS (
        SELECT doc_id, toks, len(toks) AS n FROM jj_d WHERE len(toks) > 0
    ),
    jj_p AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
                   AS n_inter,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
        FROM jj_s a JOIN jj_s b ON a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, n_inter, n_a, n_b,
           CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
    FROM jj_p
    WHERE 1000 * n_inter >= 400 * (n_a + n_b - n_inter)
    """,
)
def q_doc_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard-threshold similarity JOIN (operators/dedup.py
    jaccard_threshold_join — the AllPairs/PPJoin prefix-filter family):
    all document pairs with token-set Jaccard >= 0.4 over a fifth of the
    corpus, candidates generated ONLY through rarity-ordered prefix
    tokens, verified by exact row-local intersection with the threshold
    cross-multiplied in integers.  The oracle is the BRUTE-FORCE
    all-pairs form (an independent algorithm with no filtering), so the
    hash compare proves the prefix filter's completeness theorem on
    real data — the same independent-oracle pattern as the geofence and
    entity-resolution queries."""
    from .operators.dedup import jaccard_threshold_join

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    return jaccard_threshold_join(docs, t_milli=400)


@register(
    "jaccard_pairs",
    """
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(list_filter(
            regexp_split_to_array(lower(text), '\\W+'), x -> x != ''))) AS token
        FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS n_inter
        FROM toks a JOIN toks b
          ON a.token = b.token AND b.doc_id = a.doc_id + 100
        GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b, n_inter,
           sa.n_tokens AS n_a, sb.n_tokens AS n_b,
           CAST(n_inter AS DOUBLE) / (sa.n_tokens + sb.n_tokens - n_inter)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    """,
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (word-token) Jaccard similarity, computed distributively via
    token explode + equi-join — integer math until the final division."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.jaccard_pairs(docs, pair_offset=100)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE aug AS ({_AUG_EXACT}),
    d AS (SELECT doc_id, md5(text) AS dg FROM aug)
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY dg) AS component,
           doc_id = min(doc_id) OVER (PARTITION BY dg) AS is_survivor
    FROM d
    """,
    headline=True,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster dedup via connected components
    (operators/components.py).  The pair graph is deliberately a CHAIN per
    duplicate group (each doc paired only with the next same-digest doc),
    so the component label must propagate multi-hop — the oracle states
    the fixpoint directly (min id per digest group)."""
    from pyspark.sql import Window

    from .operators.components import dedup_survivors

    aug = _augment_exact(spark, sf_dir)
    d = aug.select("doc_id", F.md5(F.col("text").cast("binary")).alias("dg"))
    w = Window.partitionBy("dg").orderBy("doc_id")
    pairs = (
        d.withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return dedup_survivors(d, pairs)


@register(
    "doc_quality_survivors",
    f"""
    WITH RECURSIVE aug AS ({_AUG_NEAR}),
    qs_d AS (
        -- length() = CHARACTER length (matches Spark F.length); strlen
        -- is bytes and diverges on multibyte text (r12 ADVICE)
        SELECT doc_id, CAST(length(text) AS BIGINT) AS quality,
               md5(lower(substr(text, 1, 200))) AS dg
        FROM aug
    )
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY dg) AS component,
           quality,
           row_number() OVER (
               PARTITION BY dg ORDER BY quality DESC, doc_id
           ) = 1 AS is_survivor
    FROM qs_d
    """,
)
def q_doc_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster curation dedup (operators/components.py
    quality_survivors, r12): near-dup groups (prefix-normalized digest
    — the ' zz' mutants group WITH their originals) keep the
    highest-quality member, quality = text length here, so every
    mutant (3 chars longer) out-survives its original — the case
    min-id survivorship gets exactly backwards.  The pair graph is
    again a chain per group, so the component label must propagate
    multi-hop; the oracle states the fixpoint (min id per group) and
    the argmax directly."""
    from pyspark.sql import Window

    from .operators.components import quality_survivors

    aug = _augment_near(spark, sf_dir)
    d = aug.select(
        "doc_id",
        F.length("text").cast("bigint").alias("quality"),
        F.md5(dd.normalized(F.col("text")).cast("binary")).alias("dg"),
    )
    w = Window.partitionBy("dg").orderBy("doc_id")
    pairs = (
        d.withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return quality_survivors(d, pairs)


@register(
    "embedding_near_dup",
    """
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim,
           round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])), 6) >= 0.9 AS is_near_dup
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 25
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection over the deterministic
    pair family (id, id+25): JVM fold dot products, threshold at 0.9.
    At corpus scale the pair generation is an LSH bucket join
    (sim.lsh_topk); the pair-family form keeps the oracle exact."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("__ea"))
    b = emb.select(
        (F.col("vec_id") - 25).alias("vec_id_a"),
        F.col("vec_id").alias("vec_id_b"),
        F.col("embedding").alias("__eb"),
    )
    cos = F.round(sim.cosine(F.col("__ea"), F.col("__eb")), 6)
    return (
        a.join(b, "vec_id_a")
        .select(
            "vec_id_a",
            "vec_id_b",
            cos.alias("cos_sim"),
            (cos >= 0.9).alias("is_near_dup"),
        )
    )


_SIMHASH_ORACLE = f"""
    WITH RECURSIVE aug AS ({_AUG_NEAR}),
    toks AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(text), '\\W+'), x -> x != '')) AS tok
        FROM aug
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM toks
    ),
    votes AS (
        SELECT doc_id, b.b AS b,
               sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h CROSS JOIN range(0, 60) b(b)
        GROUP BY 1, 2
    ),
    fp AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    ),
    keys AS (
        SELECT doc_id, simhash, c.c AS chunk,
               (simhash >> (c.c * 15)) & 32767 AS chunk_val
        FROM fp CROSS JOIN range(0, 4) c(c)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS simhash_a, b.simhash AS simhash_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM keys a JOIN keys b
      ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
     AND a.doc_id < b.doc_id
    """


@register("simhash_pairs", _SIMHASH_ORACLE, headline=True)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates with hamming distance.  The whole
    pipeline is md5-derived integer arithmetic, so the DuckDB oracle
    replays it exactly: 60-bit token hashes, per-bit ±1 votes, sign-vector
    fingerprint, 15-bit chunk banding, i<j bucket pairs, popcount
    hamming."""
    out = dd.simhash_candidate_pairs(_augment_near(spark, sf_dir))
    return out.select(
        "id_a",
        "id_b",
        "simhash_a",
        "simhash_b",
        F.col("hamming").cast("long").alias("hamming"),
    )




@register(
    "doc_dedup_eval",
    f"""
    WITH RECURSIVE pred AS ({_MINHASH_ORACLE.strip()}
    ),
    truth AS (
        SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        FROM documents WHERE doc_id % 10 = 0
    ),
    tp_t AS (
        SELECT CAST(count(*) AS BIGINT) AS tp
        FROM pred p JOIN truth t ON p.id_a = t.id_a AND p.id_b = t.id_b
    ),
    cnt AS (
        SELECT CAST((SELECT count(*) FROM pred) AS BIGINT) AS n_pred,
               CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
               tp
        FROM tp_t
    )
    SELECT n_truth, n_pred, tp,
           CAST(n_pred - tp AS BIGINT) AS fp,
           CAST(n_truth - tp AS BIGINT) AS fn,
           CASE WHEN n_pred > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // n_pred
                          AS BIGINT) END AS precision_ppm,
           CASE WHEN n_truth > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // n_truth
                          AS BIGINT) END AS recall_ppm,
           CASE WHEN 2 * tp + (n_pred - tp) + (n_truth - tp) > 0
                THEN CAST((CAST(tp AS HUGEINT) * 2000000)
                          // (2 * tp + (n_pred - tp) + (n_truth - tp))
                          AS BIGINT) END AS f1_ppm
    FROM cnt
    """,
)
def q_doc_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise dedup-quality evaluation: score the MinHash-LSH
    candidate generator against the PLANTED near-dup truth (every
    %10 doc's ' zz' mutant — the only ground truth the fixture
    defines; every base text is distinct).  TP = candidate pairs that
    are planted pairs, FP = candidates outside the planted set
    (includes any organic high-Jaccard pair — a fixture property both
    engines replay), FN = planted pairs the bands missed.  Exact ppm
    precision/recall/F1 via the same integer identities as the
    classification report (F1 = 2·tp·1e6 div (2·tp+fp+fn)).  ONE row
    out; the candidate generation is the audited operator itself, the
    eval adds one broadcast-sized join + scalar algebra — the "did my
    banding config actually recover the dupes" readout a curation
    pipeline runs before trusting its dedup pass at 100 TB."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pred = dd.minhash_candidate_pairs(_augment_near(spark, sf_dir))
    truth = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1_000_000).alias("id_b"),
    )
    tp_df = pred.join(F.broadcast(truth), on=["id_a", "id_b"], how="inner")
    counts = (
        pred.agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
        .crossJoin(
            truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
        )
        .crossJoin(tp_df.agg(F.count(F.lit(1)).cast("bigint").alias("tp")))
    )
    d = "decimal(38,0)"
    return counts.select(
        "n_truth",
        "n_pred",
        "tp",
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_truth") - F.col("tp")).cast("bigint").alias("fn"),
        F.when(
            F.col("n_pred") > 0,
            F.expr(f"(cast(tp as {d}) * 1000000) div n_pred").cast("bigint"),
        ).alias("precision_ppm"),
        F.when(
            F.col("n_truth") > 0,
            F.expr(f"(cast(tp as {d}) * 1000000) div n_truth").cast("bigint"),
        ).alias("recall_ppm"),
        F.when(
            F.lit(2) * F.col("tp")
            + (F.col("n_pred") - F.col("tp"))
            + (F.col("n_truth") - F.col("tp"))
            > 0,
            F.expr(
                f"(cast(tp as {d}) * 2000000) div "
                "(2 * tp + (n_pred - tp) + (n_truth - tp))"
            ).cast("bigint"),
        ).alias("f1_ppm"),
    )
