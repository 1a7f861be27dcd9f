"""SemDeDup-style semantic deduplication over an embedding column.

Exact and near dedup (operators/dedup.py) catch byte- and token-level
copies; semantic dedup removes *meaning-level* duplicates — paraphrases,
re-crawls after template changes, translations re-embedded into a shared
space — by clustering on embedding cosine similarity (Abbas et al.,
"SemDeDup", arXiv:2303.09540).

Pipeline (all DataFrame ops, no Python in the hot path):

1. **Blocking** — an integer sign-random-projection (SRP) signature:
   components quantized to micros (``round(x * 1e6)`` as BIGINT), then for
   each of ``n_planes`` Rademacher hyperplanes (±1 signs derived from md5,
   no RNG state) the sign of the integer dot product contributes one
   signature bit.  All-integer ⇒ associative, partition-order-proof, and
   replayable verbatim in the DuckDB oracle.  SRP is the classic cosine
   LSH: vectors at angle θ collide on one plane with prob 1 − θ/π.
2. **Candidate pairs** — ONE self-equi-join on the signature (never
   all-pairs).  A hot-bucket cap mirrors the MinHash pipeline: a
   degenerate bucket (e.g. a zero-vector pile-up) is dropped, not
   exploded, and the oracle replays the cap.
3. **Edges** — exact cosine (JVM left-fold) inside buckets, thresholded
   on the value rounded to 6 digits (cross-engine reproducible — same
   contract as ``embedding_near_dup``).
4. **Survivors** — connected components over the edge set; min-id per
   component survives (``operators.components.dedup_survivors``).

100 TB posture: step 1 is row-local (zero shuffles); step 2 shuffles
16-byte (id, signature) pairs + the vectors only for rows that land in a
shared bucket; steps 3-4 are the bucketed-equi-join + O(log n) component
machinery shared with the text near-dup family.  Nothing is all-pairs,
nothing collects to the driver.  Recall is tuned by ``n_planes`` (fewer
planes ⇒ bigger buckets ⇒ higher recall, more comparison work); multi-
table SRP (union several plane sets) raises recall further at linear cost
— at fixture scale one table already pairs >95% of planted mutants.

Reference parity note: the reference engine (lsst-dm/dp1-data-wrangling)
has no embedding path at all; this extends the training-data-pipeline
tier mandated by BASELINE.json.
"""

from __future__ import annotations

import functools
import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import keyed_checkpoint
from .components import dedup_survivors
from .similarity import cosine

QUANT_SCALE = 1_000_000  # micros; oracle replays round(x*1e6) AS BIGINT
DEFAULT_SALT = "semdedup_v1"
MAX_BUCKET_SIZE = 100  # hot-bucket cap (oracle replays this)


@functools.lru_cache(maxsize=None)
def _srp_signs(salt: str, plane: int, dim: int) -> tuple[int, ...]:
    """±1 Rademacher signs for one hyperplane, from md5 first-byte parity.

    DuckDB replay: ``CASE WHEN CAST(('0x' || substr(md5(salt||':'||p||':'||i),
    1, 2)) AS INT) % 2 = 1 THEN 1 ELSE -1 END`` — the hex of the digest's
    first byte has the same parity as ``digest()[0]``."""
    return tuple(
        1 if hashlib.md5(f"{salt}:{plane}:{i}".encode()).digest()[0] % 2 else -1
        for i in range(dim)
    )


def srp_signature(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 8,
    salt: str = DEFAULT_SALT,
    out_col: str = "srp_sig",
) -> DataFrame:
    """Append an integer SRP signature column (row-local, zero shuffles).

    The quantized vector is materialized once in a temp column so the
    per-plane folds share it instead of re-quantizing ``n_planes`` times."""
    if n_planes < 1 or n_planes > 62:
        raise ValueError(f"n_planes must be in [1, 62], got {n_planes}")
    quant = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long")
    )
    out = df.withColumn("__srp_q", quant)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        signs = F.array(*[F.lit(s) for s in _srp_signs(salt, p, dim)])
        dotp = F.aggregate(
            F.zip_with(F.col("__srp_q"), signs, lambda q, s: q * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dotp >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return out.withColumn(out_col, sig).drop("__srp_q")


def semantic_candidate_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 1,
    salt: str = DEFAULT_SALT,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """(id_a, id_b, cos_sim) for same-SRP-bucket pairs above ``threshold``.

    id_a < id_b; cos_sim is rounded to 6 digits BEFORE thresholding so the
    edge set is engine-reproducible.  ``n_tables`` is the recall knob:
    each table draws an independent plane set (salted ``{salt}/t{i}``) and
    a pair is a candidate if it collides in ANY table — recall
    1 − (1 − p^planes)^tables for per-plane collision prob p, at linear
    cost in tables.  Table 0 keeps the bare salt so ``n_tables=1``
    reproduces the single-table construction (and its oracle) exactly."""
    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")

    def one_table(table_salt: str) -> DataFrame:
        return pairs_from_signatures(
            srp_signature(
                vectors.select(F.col(id_col), F.col(vec_col)),
                vec_col=vec_col,
                dim=dim,
                n_planes=n_planes,
                salt=table_salt,
            ),
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
        )

    out = one_table(salt)
    for t in range(1, n_tables):
        out = out.unionByName(one_table(f"{salt}/t{t}"))
    return out.distinct() if n_tables > 1 else out


def pairs_from_signatures(
    sig: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    sig_col: str = "srp_sig",
) -> DataFrame:
    """The bucket/cosine half of ``semantic_candidate_pairs``, over an
    ALREADY-computed signature column — callers holding materialized
    signatures (the streaming index keeps them, ``streaming/semantic.py``)
    skip re-deriving the n_planes × dim folds per row."""
    # Hot-bucket cap: windowed count avoids a second aggregate+join.
    # Lazy keyed checkpoint (r13): both sides of the self-join below
    # consume `kept`, whose SRP-signature subtree (n_planes x dim
    # integer folds per row) is THE expensive stage — without the cut it
    # evaluates twice, and the join re-shuffles both sides by the
    # signature.  The window has already hash-partitioned the rows on
    # ``sig_col``; the keyed checkpoint RECORDS that partitioning, so
    # the self-join reads ONE materialized co-partitioned RDD twice and
    # plans with zero exchanges (guide §2.4).
    n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy(sig_col))
    kept = keyed_checkpoint(
        sig.withColumn("__n", n_in_bucket).filter(
            F.col("__n") <= max_bucket_size
        ),
        eager=False,
    )
    a = kept.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col(sig_col),
    )
    b = kept.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col(sig_col),
    )
    cos = F.round(cosine(F.col("__va"), F.col("__vb")), 6)
    return (
        a.join(b, sig_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 1,
    salt: str = DEFAULT_SALT,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Keep-one-per-semantic-cluster: (id, component, is_survivor).

    Vectors in no above-threshold pair are singleton components and
    survive; in each cluster the min id survives."""
    pairs = semantic_candidate_pairs(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        salt=salt,
        max_bucket_size=max_bucket_size,
    )
    return dedup_survivors(vectors, pairs, id_col=id_col)


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    salt: str = DEFAULT_SALT,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Embedding-space eval-overlap screening: flag corpus vectors whose
    cosine to ANY eval-set vector clears ``threshold`` — the semantic
    complement to the n-gram ``operators/decontam.py`` (which catches
    verbatim leakage; this catches paraphrased/re-embedded leakage the
    token level cannot see).

    Shape mirrors ``semantic_candidate_pairs`` but two-sided: both sides
    get the SAME integer-SRP signatures (row-local, zero shuffles), the
    candidate set is one corpus↔eval equi-join on the signature — never
    corpus × eval — and exact cosine (rounded to 6 digits BEFORE
    thresholding, engine-reproducible) re-ranks inside buckets.  The
    hot-bucket cap applies to CORPUS-side bucket sizes (a degenerate
    pile-up is dropped, not exploded — those rows go unscreened, the
    documented recall trade the dedup family makes); the eval side is
    benchmark-sized by definition.

    Returns one row per corpus vector: (id, n_eval_hits, max_sim,
    contaminated) — max_sim is NULL for clean rows.  At 100 TB: the
    corpus never shuffles payloads beyond (signature, id, vector) for
    rows landing in an occupied bucket; eval signatures are tiny.
    """
    from ..tables import spread

    c_sig = srp_signature(
        spread(corpus).select(F.col(id_col), F.col(vec_col)),
        vec_col=vec_col,
        dim=dim,
        n_planes=n_planes,
        salt=salt,
    )
    e_sig = srp_signature(
        eval_set.select(F.col(id_col), F.col(vec_col)),
        vec_col=vec_col,
        dim=dim,
        n_planes=n_planes,
        salt=salt,
    )
    n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy("srp_sig"))
    c_kept = (
        c_sig.withColumn("__n", n_in_bucket)
        .filter(F.col("__n") <= max_bucket_size)
        .select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cv"),
            "srp_sig",
        )
    )
    e = e_sig.select(
        F.col(id_col).alias("__eid"), F.col(vec_col).alias("__ev"), "srp_sig"
    )
    sim = F.round(cosine(F.col("__cv"), F.col("__ev")), 6)
    hits = (
        c_kept.join(e, "srp_sig")
        .select("__cid", "__eid", sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .groupBy("__cid")
        .agg(
            F.countDistinct("__eid").alias("n_eval_hits"),
            F.max("__sim").alias("max_sim"),
        )
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("__cid"), "left")
        .select(
            id_col,
            F.coalesce("n_eval_hits", F.lit(0).cast("long")).alias(
                "n_eval_hits"
            ),
            "max_sim",
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
