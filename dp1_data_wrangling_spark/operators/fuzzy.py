"""Edit-distance fuzzy matching (record-linkage / fuzzy-dedup family).

The reference has no string-similarity join; this extends the dedup tier
(SURVEY.md §7.1.7 extensions) with the classic record-linkage primitive:
all pairs of rows whose join keys are within Levenshtein distance ``d``,
WITHOUT an all-pairs comparison.

Algorithm (PassJoin-style complete segment blocking, Li et al., ICDE'11
— public literature):

- Split every key into ``d+1`` contiguous segments (the canonical even
  split).  If ``lev(a, b) <= d`` then by pigeonhole at least one segment
  of ``a`` appears VERBATIM in ``b``, and each edit shifts alignment by
  at most one position, so the matching occurrence starts within ``±d``
  of the segment's own start.  Blocking on (key_length, segment_index,
  segment_text) against the probe side's bounded substring enumeration
  is therefore COMPLETE — no within-threshold pair can be missed — and
  the final exact ``levenshtein`` filter makes it precise.
- Probe enumeration per row is a constant bounded by
  ``(2d+1) lengths x (d+1) segments x (2d+1) positions`` (~75 for d=2):
  linear in corpus size, never quadratic.

Scale posture (100 TB): four narrow shuffles — the blocking equi-join
(one exchange per side, keyed on the segment content + coordinates),
the probe-substring ``distinct``, and the candidate-pair ``distinct``.  Keys ride along through the explode (a
fuzzy key is a short normalized string — bytes per doc stay bounded by
``~75 x |key|``), so no join-back to the corpus is needed and document
payloads never shuffle.  Skew: a degenerate segment (e.g. all-spaces
keys) concentrates one block; normalize keys upstream and keep them
short.  Levenshtein verification runs row-local with the thresholded
(banded) variant, JVM-side.

Cross-engine caveat: Spark's ``levenshtein`` counts CODEPOINT edits,
DuckDB's counts BYTE edits — identical only for ASCII keys.  Queries
that want oracle replay must normalize keys to ASCII first (the
``doc_fuzzy_pairs`` query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    *,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All (id_a < id_b) pairs with ``levenshtein(key_a, key_b) <= max_dist``.

    Returns (id_a, id_b, key_a, key_b, dist).  Rows with empty or NULL
    keys are excluded (an empty key is within ``d`` of every short key —
    callers who want them must pre-bucket separately).

    Exact and complete: the segment blocking provably generates every
    within-threshold pair (module docstring), and the thresholded
    ``levenshtein`` filter removes false candidates.  Never all-pairs.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    d = max_dist
    nseg = d + 1

    keys = df.select(
        F.col(id_col).alias("__id"),
        F.col(key_col).alias("__key"),
        F.length(key_col).alias("__len"),
    ).filter(F.col("__len") > 0)

    # --- segment side: the canonical even split of each key ------------
    # base/rem arithmetic is pure integer; segment i (0-based) has length
    # base + (i < rem) and 1-based start i*base + min(i, rem) + 1.
    seg_i = F.col("__i")
    base = (F.col("__len") / nseg).cast("int")
    rem = F.col("__len") % nseg
    slen = base + (seg_i < rem).cast("int")
    sstart = seg_i * base + F.least(seg_i, rem) + F.lit(1)
    # Empty segments (keys shorter than d+1 chars) are KEPT: for such a
    # key, d edits can touch every non-empty segment, so the pigeonhole
    # match is the empty one — dropping it would lose completeness.  The
    # empty-content block only ever holds keys shorter than ~2(d+1)
    # chars, so its size is bounded by the tiny-key population.
    segs = (
        keys.withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(d))))
        .withColumn("__seg", F.col("__key").substr(sstart, slen))
        .select(
            "__id",
            "__key",
            F.col("__len").alias("__bl"),
            "__i",
            "__seg",
        )
    )

    # --- probe side: bounded substring enumeration ---------------------
    # For every candidate block length Lc in [len-d, len+d] and segment i
    # of THAT split, every substring of this key with the segment's length
    # starting within ±d of the segment's start.
    lc = F.col("__lc")
    pbase = (lc / nseg).cast("int")
    prem = lc % nseg
    plen = pbase + (seg_i < prem).cast("int")
    pstart = seg_i * pbase + F.least(seg_i, prem) + F.lit(1)
    p_lo = F.greatest(F.lit(1), pstart - d)
    p_hi = F.least(F.col("__len") - plen + 1, pstart + d)
    probes = (
        keys.withColumn(
            "__lc",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("__len") - d),
                    F.col("__len") + d,
                )
            ),
        )
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(d))))
        .withColumn("__plen", plen)
        .withColumn(
            "__p",
            F.explode(
                F.when(p_lo <= p_hi, F.sequence(p_lo, p_hi)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .select(
            F.col("__id").alias("__id_p"),
            F.col("__key").alias("__key_p"),
            F.col("__lc").alias("__bl"),
            "__i",
            F.col("__key").substr(F.col("__p"), F.col("__plen")).alias("__seg"),
        )
        .distinct()  # collapse repeated substrings before the join
    )

    cands = (
        segs.join(probes, ["__bl", "__i", "__seg"])
        .filter(F.col("__id") < F.col("__id_p"))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_p").alias("id_b"),
            F.col("__key").alias("key_a"),
            F.col("__key_p").alias("key_b"),
        )
        .distinct()
    )

    dist = F.levenshtein(F.col("key_a"), F.col("key_b"), d)
    return (
        cands.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "key_a", "key_b", F.col("dist").cast("bigint").alias("dist"))
    )
