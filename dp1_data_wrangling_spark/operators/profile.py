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


def profile_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    columns_ref: list[str] | None = None,
    columns_cur: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Snapshot-over-snapshot profile drift audit (r13) — the
    table-shape sibling of the value-distribution KS screen and the
    vocabulary DF-drift screen: between a REFERENCE snapshot and fresh
    data, which columns appeared/disappeared, and how did null rates
    and cardinalities move?  A scraper regression announces itself
    here before any value-level screen fires (a column going 40% NULL
    is a schema-contract break, not a distribution shift).

    Per column (full outer on column name): ``(column_name, in_ref,
    in_cur, n_rows_ref, n_rows_cur, n_nulls_ref, n_nulls_cur,
    null_ppm_ref, null_ppm_cur, null_shift_ppm, n_distinct_ref,
    n_distinct_cur, distinct_ratio_ppm)`` — all exact integers
    (``null_shift_ppm`` is a plain difference and may be negative;
    ``distinct_ratio_ppm`` = cur/ref cardinality in ppm, NULL when
    either side is absent or ref has no distinct values).  One-sided
    columns carry NULL metrics on the missing side and the
    ``in_ref``/``in_cur`` flags ARE the schema-drift signal.

    Scale posture (100 TB): two ONE-pass profile aggregates (each a
    single combinable job regardless of column count — see
    :func:`profile_table`) + a column-count-sized full-outer join.
    """
    pr = profile_table(
        ref, columns=columns_ref, exact_distinct=exact_distinct
    ).select(
        "column_name",
        F.col("n_rows").alias("n_rows_ref"),
        F.col("n_nulls").alias("n_nulls_ref"),
        F.col("n_distinct").alias("n_distinct_ref"),
    )
    pc = profile_table(
        cur, columns=columns_cur, exact_distinct=exact_distinct
    ).select(
        "column_name",
        F.col("n_rows").alias("n_rows_cur"),
        F.col("n_nulls").alias("n_nulls_cur"),
        F.col("n_distinct").alias("n_distinct_cur"),
    )
    j = pr.join(pc, "column_name", "full_outer")
    null_ref = F.when(
        F.col("n_rows_ref") > 0,
        F.expr("(n_nulls_ref * 1000000) div n_rows_ref"),
    )
    null_cur = F.when(
        F.col("n_rows_cur") > 0,
        F.expr("(n_nulls_cur * 1000000) div n_rows_cur"),
    )
    return j.select(
        "column_name",
        F.col("n_rows_ref").isNotNull().alias("in_ref"),
        F.col("n_rows_cur").isNotNull().alias("in_cur"),
        "n_rows_ref",
        "n_rows_cur",
        "n_nulls_ref",
        "n_nulls_cur",
        null_ref.alias("null_ppm_ref"),
        null_cur.alias("null_ppm_cur"),
        (null_cur - null_ref).alias("null_shift_ppm"),
        "n_distinct_ref",
        "n_distinct_cur",
        F.when(
            F.col("n_distinct_ref") > 0,
            F.expr("(n_distinct_cur * 1000000) div n_distinct_ref"),
        ).alias("distinct_ratio_ppm"),
    )


def profile_census_projection(
    df: DataFrame, *, columns: list[str] | None = None
) -> DataFrame:
    """The shared projection the streaming profile maintainer consumes
    (streaming/census.py read_table_profile): each row explodes to one
    census row per profiled column — ``(column_name, __null, __empty,
    __len)`` — so the per-column profile becomes a keyed census of
    associative pieces: counts and conditional sums add, string-length
    extrema min/max-merge (non-string columns carry NULL ``__len``,
    which min/max ignore — matching the batch profiler's NULL
    min_len/max_len for them).  Exact distinct counts are the one
    batch statistic with no associative form — the streaming twin
    omits n_distinct (compose the KMV/HLL sketch maintainers for a
    live estimate; both already exist).

    Scale: the explode is k× the row count map-side but collapses to
    the |columns|-sized census in the SAME stage's partial aggregate —
    nothing k× ever crosses the wire.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_census_projection needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_census_projection: unknown columns {missing}")
    str_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    }
    per_col = []
    for c in cols:
        v = F.col(c)
        per_col.append(
            F.struct(
                F.lit(c).alias("column_name"),
                v.isNull().cast("bigint").alias("__null"),
                (
                    (v == "").cast("bigint")
                    if c in str_cols
                    else F.lit(None).cast("bigint")
                ).alias("__empty"),
                (
                    F.length(v).cast("bigint")
                    if c in str_cols
                    else F.lit(None).cast("bigint")
                ).alias("__len"),
            )
        )
    return df.select(F.explode(F.array(*per_col)).alias("__p")).select("__p.*")


def profile_from_census(
    census: DataFrame, *, string_cols: list[str]
) -> DataFrame:
    """Fold a maintained ``(column_name, n_rows, n_nulls, n_empty,
    min_len, max_len)`` census to the batch :func:`profile_table`
    shape minus ``n_distinct`` (see profile_census_projection).
    ``string_cols`` is the caller's schema knowledge — the census
    alone cannot distinguish an all-NULL string column (batch
    n_empty = 0) from a non-string column (batch n_empty = NULL), so
    the fold takes the same declaration the projection derived from
    the schema."""
    is_str = F.col("column_name").isin(list(string_cols))
    return census.select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.when(
            is_str, F.coalesce(F.col("n_empty").cast("bigint"), F.lit(0))
        ).alias("n_empty"),
        F.col("min_len").cast("bigint").alias("min_len"),
        F.col("max_len").cast("bigint").alias("max_len"),
    )
