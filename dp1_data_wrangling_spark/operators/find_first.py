"""Find-first dataset resolution — the reference's signature query.

Semantics (reference: exporter.py:75-87, flag at :84): given datasets that
may exist in several collections of an *ordered* (flattened) collection
chain, keep for each data ID only the dataset from the earliest collection
in the chain.  Calibration dataset types bypass find-first and keep every
row (``find_first=not dataset_type.isCalibration()``).

Spark mapping (SURVEY.md §2.4 J4 / §2.6 W1): a single window —

    row_number() OVER (PARTITION BY <dataId cols>
                       ORDER BY chain_pos, <tie-breaker>) = 1

Scale posture: this is ONE shuffle on the data-ID columns; the chain
position mapping is tiny and broadcast.  At 100 TB the only tuning knobs
are the shuffle partition count and data-ID skew (AQE skew-join handles a
hot data ID).  The tie-breaker makes the result deterministic when the same
data ID occurs twice in one collection — the reference asserts this cannot
happen (exporter.py:42-45); we make the operator total instead of partial.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_first(
    datasets: DataFrame,
    chain_positions: DataFrame,
    data_id_cols: Sequence[str],
    *,
    collection_col: str = "run",
    position_col: str = "position",
    child_col: str = "child",
    tie_breaker: str | None = "dataset_id",
    is_calibration: bool = False,
) -> DataFrame:
    """Resolve each data ID to its first dataset along the collection chain.

    Parameters
    ----------
    datasets : dataset rows; one column names the collection they live in.
    chain_positions : (child, position) mapping from the flattened chain
        (see ``operators.chains.flatten_chains``).
    data_id_cols : the data-ID key columns to deduplicate on.
    tie_breaker : extra deterministic ordering column (hex of a binary id
        is applied automatically for BinaryType columns).
    is_calibration : when True, bypass find-first entirely (reference
        exporter.py:81-84) — all rows from chain collections are kept.
    """
    pos = F.broadcast(
        chain_positions.select(
            F.col(child_col).alias("__ff_coll"), F.col(position_col).alias("__ff_pos")
        )
    )
    joined = datasets.join(pos, datasets[collection_col] == pos["__ff_coll"], "inner")
    if is_calibration:
        return joined.drop("__ff_coll", "__ff_pos")

    order = [F.col("__ff_pos").asc()]
    if tie_breaker is not None:
        dt = dict(datasets.dtypes).get(tie_breaker)
        tb = F.col(tie_breaker)
        if dt == "binary":
            tb = F.hex(tb)
        order.append(tb.asc())
    w = Window.partitionBy(*[F.col(c) for c in data_id_cols]).orderBy(*order)
    return (
        joined.withColumn("__ff_rn", F.row_number().over(w))
        .filter(F.col("__ff_rn") == 1)
        .drop("__ff_rn", "__ff_coll", "__ff_pos")
    )
