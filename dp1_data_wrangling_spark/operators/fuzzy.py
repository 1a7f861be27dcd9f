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

Scale posture (100 TB): the blocking equi-join (one exchange per side,
keyed on the segment content + coordinates — the segment side
broadcast-joins while it fits the threshold) and the candidate-pair
``distinct``; probe substrings are enumerated and deduplicated
ROW-LOCALLY (array_distinct before the explode), so the probe stream
never pays its own exchange (r13).  Keys ride along through the
explode (a fuzzy key is a short normalized string — bytes per doc stay
bounded by ``~75 x |key|``), so no join-back to the corpus is needed
and document payloads never shuffle.  Skew: a degenerate segment (e.g. all-spaces
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
    # Both the segment side and the probe side consume `keys`; without a
    # cut the (id, key, len) subtree — including the caller's key
    # normalization over full document text — evaluates twice (the CC
    # multi-reference lesson).  The checkpoint also gives the planner
    # ACCURATE sizes for both join inputs, so broadcast-vs-shuffle for
    # the blocking join is decided from real bytes (scale-adaptive: the
    # d+1-rows/key segment side broadcasts at bench scale, and the
    # planner falls back to a narrow shuffle join when it outgrows the
    # threshold).  Rows are (id, short key, int) — narrow by contract.
    keys = keys.localCheckpoint(eager=False)

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
    # starting within ±d of the segment's start.  Enumerated ROW-LOCALLY
    # as one nested-transform array and deduplicated with array_distinct
    # BEFORE the explode (r13): the duplicates the old global .distinct()
    # collapsed were all within-row (the row's own id was part of the
    # dedup key), so the row-local dedup is result-identical — the final
    # candidate .distinct() covers duplicate-id inputs — and the probe
    # stream reaches the blocking join without paying a corpus-sized
    # exchange of its ~(2d+1)²(d+1) rows per key (guide §2.4; measured
    # -1 data shuffle, the largest intermediate in the plan).
    pbase_sql = f"cast((lc / {nseg}) as int)"
    plen_sql = f"({pbase_sql} + (case when i < lc % {nseg} then 1 else 0 end))"
    pstart_sql = f"(i * {pbase_sql} + least(i, lc % {nseg}) + 1)"
    p_lo_sql = f"greatest(1, {pstart_sql} - {d})"
    p_hi_sql = f"least(__len - {plen_sql} + 1, {pstart_sql} + {d})"
    probe_structs = F.expr(
        "array_distinct(flatten(transform("
        f"sequence(greatest(1, __len - {d}), __len + {d}), lc -> "
        f"flatten(transform(sequence(0, {d}), i -> "
        f"transform("
        f"if({p_lo_sql} <= {p_hi_sql}, sequence({p_lo_sql}, {p_hi_sql}), "
        f"cast(array() as array<int>)), "
        f"p -> named_struct('__bl', lc, '__i', i, "
        f"'__seg', substr(__key, p, {plen_sql}))))))))"
    )
    probes = keys.select(
        F.col("__id").alias("__id_p"),
        F.col("__key").alias("__key_p"),
        F.explode(probe_structs).alias("__ps"),
    ).select(
        "__id_p",
        "__key_p",
        F.col("__ps.__bl").alias("__bl"),
        F.col("__ps.__i").alias("__i"),
        F.col("__ps.__seg").alias("__seg"),
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
