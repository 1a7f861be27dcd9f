"""Corpus selection operators: per-group quota top-k and deterministic
importance resampling.

Training-data pipelines routinely (a) cap how much any one source/domain
may contribute to the mix (quota sampling — CommonCrawl dumps would
otherwise drown curated sources) and (b) up/down-weight slices by
repeating or dropping documents (importance resampling — e.g. 2x a
high-quality subset, 0.3x a noisy one).  Both must be deterministic and
partitioning-independent so re-runs and joined tables agree, so — like
``operators.sampling`` — every decision here derives from
``md5(salt || key)``, exactly replayable by the DuckDB oracle.

Scale notes:

- ``group_topk`` is the quota primitive.  A single ranking window
  partitioned by a low-cardinality group column serializes each group
  into ONE task — the classic window-skew trap at 100 TB (a 40 TB
  CommonCrawl group would hit a single executor).  The operator instead
  runs the standard two-stage exact top-k: stage 1 ranks within
  ``(group, shard)`` — ``n_shards``-way parallel — and keeps at most
  ``k`` rows per shard (any row beyond a shard's top-k cannot be in the
  group's top-k, so this is lossless); stage 2 ranks the surviving
  ``<= k * n_shards`` rows per group.  The second window is bounded by
  k, not by group size, so no task ever sees more than ``k * n_shards``
  rows however large the group.
- ``importance_resample`` is a pure row-local map (explode of a
  per-row-computed sequence): zero shuffles at any scale.  ``max_repeats``
  bounds the write amplification a bad weight expression could cause.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def rank_key(key: Column, salt: str) -> Column:
    """Deterministic unbiased ordering key: the md5 hex digest of
    (salt, key).  DuckDB replay: ``md5(salt || CAST(key AS VARCHAR))``."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))


def group_topk(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    k: int,
    salt: str = "",
    n_shards: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep at most ``k`` rows per ``group_col``, ranked by
    ``md5(salt || key)`` with ``key_col`` as the tie-break — an unbiased
    deterministic per-group quota.

    Semantically identical to
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5, key) <= k``
    but executed as a two-stage top-k (module docstring) so a group with
    billions of rows never lands in a single window task.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    rk = rank_key(F.col(key_col), salt)
    shard = hash_bucket(F.col(key_col), salt + ":shard") % n_shards
    within_shard = Window.partitionBy(group_col, "_shard").orderBy(
        "_rk", key_col
    )
    within_group = Window.partitionBy(group_col).orderBy("_rk", key_col)
    return (
        df.withColumn("_rk", rk)
        .withColumn("_shard", shard)
        .withColumn("_srn", F.row_number().over(within_shard))
        .where(F.col("_srn") <= k)
        .withColumn(rank_col, F.row_number().over(within_group))
        .where(F.col(rank_col) <= k)
        .drop("_rk", "_shard", "_srn")
    )


def repeat_counts(
    key: Column, weight: Column, *, salt: str = "", max_repeats: int = 10
) -> Column:
    """Deterministic integer repeat count for a fractional weight.

    ``floor(weight)`` guaranteed copies plus one stochastic-rounding
    extra: the fractional part is compared (as an integer percentage)
    against the row's hash bucket, so across many rows the expected copy
    count equals the weight while each individual decision is a pure
    function of (salt, key).  DuckDB replay::

        CAST(floor(wt) AS BIGINT)
        + CASE WHEN bucket < CAST(round((wt - floor(wt)) * 100) AS BIGINT)
               THEN 1 ELSE 0 END

    Weights are honored to two decimal places (percent resolution — the
    bucket space).  ``max_repeats`` caps write amplification.
    """
    base = F.floor(weight).cast("bigint")
    frac_pct = F.round((weight - F.floor(weight)) * 100).cast("bigint")
    extra = F.when(hash_bucket(key, salt) < frac_pct, F.lit(1)).otherwise(
        F.lit(0)
    )
    return F.least(base + extra, F.lit(max_repeats))


def importance_resample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    *,
    salt: str = "",
    max_repeats: int = 10,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Repeat each row ``repeat_counts(...)`` times (0 drops the row),
    emitting ``copy_col`` = 1..n per copy.

    Row-local explode of a per-row sequence: zero shuffles.  A weight of
    2.0 emits exactly 2 copies of every row; 0.3 keeps ~30% of rows
    (deterministically, by key hash); 1.5 keeps every row and doubles a
    deterministic half.
    """
    repeats = repeat_counts(
        F.col(key_col), weight, salt=salt, max_repeats=max_repeats
    )
    # sequence(1, 0) descends in Spark — guard the empty case explicitly.
    copies = F.when(
        repeats >= 1, F.sequence(F.lit(1), repeats.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        *df.columns, F.explode(copies).alias(copy_col)
    )


def quantile_filter(
    df: DataFrame,
    *,
    score_col: str,
    group_col: str,
    keep_top_percent: int,
    id_col: str,
    out_col: str = "keep",
) -> DataFrame:
    """Keep the top ``keep_top_percent``% of rows per group by score
    (quantile-based quality filtering, e.g. "top 60% by quality within
    each language").

    Exact integer semantics: with rows ranked by (score desc, id asc)
    within a group of n rows, a row is kept iff ``rank * 100 <= n * pct``
    — no percent_rank floats, no boundary ambiguity, deterministic ties.

    Scale shape: the naive form is ONE window partitioned by the group —
    which serializes a 40 TB language into one task (the same skew trap
    ``group_topk`` documents).  Instead this decomposes exactly:

    1. per-(group, score) counts — map-side-combinable groupBy;
    2. per-group cumulative counts over DISTINCT scores (a window over
       the score histogram, not the rows — bounded by score cardinality);
    3. join back: scores wholly under the cutoff keep all rows; the ONE
       boundary score per group keeps its first ``keep_n - kept_before``
       rows by id (a row_number window partitioned by (group, score) —
       fine-grained, never group-sized).

    NULL scores are unrankable: they are excluded from the histogram (so
    the group size ``n`` counts only rankable rows) and are never kept —
    even at ``keep_top_percent=100``.  A naive rank window with NULLS LAST
    would instead keep them at 100%; replay that reference with a
    ``score IS NOT NULL`` guard to match.

    The DuckDB oracle runs the naive rank-window form, independently
    validating the decomposition."""
    if not 0 <= keep_top_percent <= 100:
        raise ValueError(
            f"keep_top_percent must be in [0, 100], got {keep_top_percent}"
        )
    g, s = F.col(group_col), F.col(score_col)
    counts = (
        df.filter(s.isNotNull())
        .groupBy(group_col, score_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(s.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy(group_col)
    # PURE integer cutoffs (the docstring's no-floats contract, honored at
    # any n): with rank r, group size n, and kept_before = cum - c rows of
    # strictly-higher score,
    #   whole score kept      ⇔ cum * 100            <= n * pct
    #   tie t at the boundary ⇔ (kept_before + t) * 100 <= n * pct
    # — both cross-multiplied forms of r*100 <= n*pct, no division at all.
    n_pct = (F.sum("__c").over(w_grp) * keep_top_percent).cast("long")
    agg = counts.withColumn("__cum", F.sum("__c").over(w_cum)).select(
        group_col,
        score_col,
        F.col("__c").cast("long").alias("__c"),
        F.col("__cum").cast("long").alias("__cum"),
        n_pct.alias("__n_pct"),
    )
    tie_w = Window.partitionBy(group_col, score_col).orderBy(F.col(id_col))
    # LEFT join + null-safe keep: rows with a NULL group or score cannot
    # equi-join their histogram entry; an inner join would silently DROP
    # them from the output — they stay, with keep=false (a NULL score
    # cannot rank "above" any quantile).
    kept_before = F.col("__cum") - F.col("__c")
    return (
        df.join(agg, [group_col, score_col], "left")
        .withColumn("__tie", F.row_number().over(tie_w).cast("long"))
        .withColumn(
            out_col,
            F.coalesce(
                (F.col("__cum") * 100 <= F.col("__n_pct"))
                | ((kept_before + F.col("__tie")) * 100 <= F.col("__n_pct")),
                F.lit(False),
            ),
        )
        .drop("__c", "__cum", "__n_pct", "__tie")
    )


def period_momentum(
    df: DataFrame,
    *,
    key_cols: list[str],
    period_col: str,
    k: int | None = None,
) -> DataFrame:
    """Two-period momentum screen — "what's trending": per key, the
    activity count in the pre (0) and post (1) period and the
    add-one-smoothed exact growth ratio

        momentum_ppm = (1e6 · (n_post + 1)) div (n_pre + 1)

    (the Laplace +1 keeps new entrants finite and dead keys at ~0
    instead of dividing by zero; both engines truncate the division).
    With ``k`` set, returns the top-k risers ordered by
    ``(momentum_ppm DESC, *key_cols)`` — the key columns are the
    deterministic tie-break, and the sort lowers to
    TakeOrderedAndProject, never a global sort.

    ``period_col`` must be 0/1 non-NULL (executor fail-fast, the
    ab_contingency contract).  The ratio numerator is computed in
    DECIMAL(38,0) and lands back in BIGINT; keys whose post count
    exceeds 9e12 raise rather than overflow the BIGINT output (at
    such counts pre-aggregate to a coarser key).

    Returns ``(*key_cols, n_pre, n_post, momentum_ppm)``.

    Scale posture (100 TB): ONE map-side-combinable groupBy — two
    conditional counts per key; the top-k cut is a per-partition heap
    + driver merge of k rows (TakeOrderedAndProject).  No window, no
    join.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    p = F.col(period_col)
    bad = p.isNull() | ~p.cast("bigint").isin(0, 1)
    p_ok = F.when(~bad, p.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "period_momentum: period must be 0/1 and non-NULL — "
                "rows outside the two periods have no cell; filter "
                "upstream"
            )
        ).cast("bigint")
    )
    counts = (
        df.withColumn("__p", p_ok)
        .groupBy(*key_cols)
        .agg(
            F.sum((F.col("__p") == 0).cast("bigint")).alias("n_pre"),
            F.sum((F.col("__p") == 1).cast("bigint")).alias("n_post"),
        )
    )
    post_ok = F.when(
        F.col("n_post") <= F.lit(9_000_000_000_000), F.col("n_post")
    ).otherwise(
        F.raise_error(
            F.lit(
                "period_momentum: n_post exceeds 9e12 — the ppm ratio "
                "would overflow BIGINT; pre-aggregate to a coarser key"
            )
        ).cast("bigint")
    )
    out = counts.withColumn("__po", post_ok).select(
        *key_cols,
        "n_pre",
        "n_post",
        F.expr(
            "cast((1000000 * (cast(__po as decimal(38,0)) + 1)) "
            "div (cast(n_pre as decimal(38,0)) + 1) as bigint)"
        ).alias("momentum_ppm"),
    )
    if k is not None:
        out = out.orderBy(
            F.col("momentum_ppm").desc(),
            *[F.col(c) for c in key_cols],
        ).limit(k)
    return out
