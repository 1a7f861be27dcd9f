"""Table profiling: one-pass per-column data-quality statistics.

The deequ/dbt-style profiling pass every ingest pipeline runs before
trusting a new drop: per-column row/null/distinct counts (plus empty
and min/max length for string columns), emitted as one tidy row per
column so the result is itself a queryable dataset.

Engine extension — the reference (exporter.py:75-141) has no profiling
tier; its import path trusts the registry schema blindly.

Scale posture (100 TB): a single wide aggregate — every statistic is an
associative combinable aggregate, so the map side reduces each
partition to ONE row before the single-row shuffle.  Exact distinct
counts over k columns make Spark expand the input k+1 ways before that
aggregate (the classic multi-DISTINCT Expand plan) — correct but k× the
scan bytes through the agg; ``exact_distinct=False`` switches to
HyperLogLog++ (`approx_count_distinct`) which profiles all columns in
ONE non-expanded pass and is the mode to run at full scale (the
registered oracle query pins the exact mode at fixture scale, the
approx mode is property-tested against exact within rsd bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(
    df: DataFrame,
    *,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: one row per column.

    Output columns: ``column_name``, ``n_rows``, ``n_nulls``,
    ``n_distinct`` (exact or HLL++ approximate), and for string columns
    ``n_empty`` / ``min_len`` / ``max_len`` (NULL for non-string).  All
    counts BIGINT; runs as ONE aggregate job regardless of column count.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    str_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    }
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).alias(f"__nd_{i}")
            )
        if c in str_cols:
            aggs.append(
                F.count(F.when(F.col(c) == "", 1)).alias(f"__ne_{i}")
            )
            aggs.append(F.min(F.length(F.col(c))).alias(f"__lo_{i}"))
            aggs.append(F.max(F.length(F.col(c))).alias(f"__hi_{i}"))

    one = df.agg(*aggs)

    # unpivot the single wide row into one tidy row per column
    per_col = []
    for i, c in enumerate(cols):
        base = [
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
            F.col(f"__nd_{i}").cast("bigint").alias("n_distinct"),
        ]
        if c in str_cols:
            base += [
                F.col(f"__ne_{i}").alias("n_empty"),
                F.col(f"__lo_{i}").cast("bigint").alias("min_len"),
                F.col(f"__hi_{i}").cast("bigint").alias("max_len"),
            ]
        else:
            base += [
                F.lit(None).cast("bigint").alias("n_empty"),
                F.lit(None).cast("bigint").alias("min_len"),
                F.lit(None).cast("bigint").alias("max_len"),
            ]
        per_col.append(F.struct(*base))
    return one.select(
        F.explode(F.array(*per_col)).alias("__p")
    ).select("__p.*")
