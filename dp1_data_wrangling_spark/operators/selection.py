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
