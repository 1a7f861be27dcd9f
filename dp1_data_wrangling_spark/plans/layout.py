"""Z-order (Morton) clustering for multi-column file pruning.

A range-clustered table (``Transaction.stage(range_by=[col])``) prunes
scans filtered on THAT column via parquet footer min/max stats — but a
single-dimension sort leaves every other column spanning its full range
in every file, so filters on a second column prune nothing.  Z-ordering
interleaves the bits of several columns into one clustering key: sorting
by it bounds every participating column's per-file span simultaneously
(each file covers a small hyper-rectangle of the key space), which is
how Delta/Iceberg `OPTIMIZE ZORDER BY` makes multi-predicate scans cheap.

Everything is JVM integer expressions (bit shifts inside an
``aggregate`` fold) — the key costs one projection, then rides the same
``repartitionByRange`` + ``sortWithinPartitions`` write path as plain
range clustering.  Layout never changes query *results*, only which
files a predicate scan must read.

Quantization bounds come from one driver-side min/max aggregate over the
input (a single row collected — maintenance-job territory, same budget
class as compaction itself).  At 100 TB that agg is a combinable
column-pruned scan; cache or supply bounds explicitly if the table's
envelope is already known.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zorder_key(cols: list[Column], *, bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of non-negative integer
    columns into one BIGINT: column j contributes its bit i at output
    position ``i * n_cols + j``.  ``n_cols * bits`` must fit a signed
    64-bit key."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits > 63; "
            "lower bits or drop a column"
        )
    # Statically unrolled (bits is a Python int): n_cols * bits shift/mask
    # terms in one projection — whole-stage-codegen-friendly, no lambdas.
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cb = c.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cb, i).bitwiseAND(F.lit(1).cast("bigint"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def quantize(col: Column, lo: float, hi: float, *, bits: int = DEFAULT_BITS) -> Column:
    """Scale a numeric column from [lo, hi] onto the integer grid
    [0, 2**bits - 1], clamping out-of-range values (late rows outside the
    sampled envelope cluster at the edges, never corrupt the key)."""
    top = (1 << bits) - 1
    if hi <= lo:  # constant column: everything quantizes to 0
        return F.lit(0).cast("bigint")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(float(top))
    ).cast("bigint")
    return F.greatest(F.lit(0).cast("bigint"), F.least(scaled, F.lit(top).cast("bigint")))


def with_zorder_key(
    df: DataFrame,
    col_names: list[str],
    *,
    bits: int = DEFAULT_BITS,
    key_col: str = "_zorder_key",
) -> DataFrame:
    """Attach the Morton key for ``col_names`` (numeric/timestamp columns;
    bounds taken from one min/max aggregate over ``df``)."""
    if not col_names:
        raise ValueError("with_zorder_key needs at least one column")
    aggs = []
    for c in col_names:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"hi_{c}"))
    bounds = df.agg(*aggs).collect()[0]
    quantized = [
        quantize(
            F.col(c),
            bounds[f"lo_{c}"] if bounds[f"lo_{c}"] is not None else 0.0,
            bounds[f"hi_{c}"] if bounds[f"hi_{c}"] is not None else 0.0,
            bits=bits,
        )
        for c in col_names
    ]
    return df.withColumn(key_col, zorder_key(quantized, bits=bits))
