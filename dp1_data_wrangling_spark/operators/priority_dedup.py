"""Priority first-wins dedup across datastores.

Reference semantics (datastore_parquet.py:32-50, 66-76): when the same
dataset_id has file records in several datastores, the first datastore in
the configured priority list wins (mirrors ChainedDatastore lookup order).

Spark mapping (SURVEY.md §2.4 J5 / §2.6 W2): broadcast the (name, priority)
list, then either

- ``row_number() OVER (PARTITION BY dataset_id ORDER BY priority)`` = 1, or
- ``groupBy(dataset_id).agg(min_by(struct(*), priority))``.

Both are a single shuffle on dataset_id; the engine uses the ``min_by``
form because it partially aggregates map-side — each mapper ships at most
one candidate row per key into the shuffle instead of every row (measured
2× faster at sf0.1, and the gap widens with duplication factor).  The
window form remains the right tool when top-N with N>1 is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import local_df


def priority_map(spark: SparkSession, priority: Sequence[str]) -> DataFrame:
    rows = [(name, i) for i, name in enumerate(priority)]
    return local_df(spark, rows, "datastore_name string, priority int")


def priority_dedup(
    records: DataFrame,
    priority: DataFrame,
    *,
    key_col: str = "dataset_id",
    name_col: str = "datastore_name",
    priority_col: str = "priority",
    tie_breaker: str | None = "path",
) -> DataFrame:
    """Keep, per key, only the record from the highest-priority datastore.

    ``priority`` is a small (name, priority) DataFrame — broadcast.  The
    tie-breaker orders within one datastore (the reference treats that as
    first-batch-wins; we make it deterministic).
    """
    joined = records.join(
        F.broadcast(priority.withColumnRenamed(name_col, "__pd_name")),
        records[name_col] == F.col("__pd_name"),
        "inner",
    ).drop("__pd_name")
    payload = [c for c in records.columns if c != key_col]
    order_cols = [F.col(priority_col)]
    if tie_breaker is not None:
        order_cols.append(F.col(tie_breaker))
    winner = F.min_by(F.struct(*payload), F.struct(*order_cols)).alias("__pd_w")
    return (
        joined.groupBy(key_col)
        .agg(winner)
        .select(
            *[
                F.col(c) if c == key_col else F.col(f"__pd_w.{c}").alias(c)
                for c in records.columns
            ]
        )
    )
