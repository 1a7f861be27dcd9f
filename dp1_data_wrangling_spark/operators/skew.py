"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

At 100 TB the failure mode of ``groupBy(hot_key)`` is a straggler task
holding one giant key.  Two standing defenses in this engine:

- **AQE skew-join splitting** is always on (session.py) — Spark splits
  oversized shuffle partitions at runtime.  That covers sort-merge joins.
- **Salting**, this module, covers aggregations and broadcast-side fanout
  that AQE cannot split: phase 1 aggregates on (key, salt) — spreading a
  hot key over ``n_salts`` reducers — phase 2 combines the partials on the
  key alone.  Correct for any *algebraic* aggregate (sum/count/min/max),
  whose partials compose; avg is derived as sum/count.

The salt must be deterministic for the oracle to be replayable, yet
spread rows of one key across buckets: we hash a high-cardinality salt
column (e.g. the fact table's line number), never ``rand()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_source: Column, n_salts: int) -> DataFrame:
    """Append a deterministic salt bucket in [0, n_salts)."""
    return df.withColumn("__salt", F.pmod(F.hash(salt_source), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    salt_source: Column,
    *,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n_rows",
) -> DataFrame:
    """Two-phase salted sum+count per key.

    Phase 1 shuffles on (keys..., salt) — a hot key occupies ``n_salts``
    reducers instead of one; phase 2 combines the (at most
    n_salts × distinct-keys) partials, a tiny shuffle.  Result is exactly
    ``groupBy(keys).agg(sum, count)``."""
    partial = (
        with_salt(df, salt_source, n_salts)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value).alias("__s"), F.count("*").alias("__c"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__s").alias(sum_alias), F.sum("__c").cast("long").alias(count_alias)
    )


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: Column,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join a skewed large side with a small side, pre-salted.

    The small side is exploded ``n_salts``× (still small) and the join key
    becomes (key, salt), so one hot key's rows land on ``n_salts``
    partitions.  With a broadcastable small side Spark would broadcast
    anyway — this shape matters when the small side is just above the
    broadcast threshold or the join must shuffle for a later stage."""
    salted_large = with_salt(skewed, salt_source, n_salts)
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(salted_small, [key, "__salt"]).drop("__salt")
