"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning and at any
cluster size, and (c) consistent across tables — the same key must land
in the same split everywhere so joined tables never leak across splits.
``rand()``/``TABLESAMPLE`` give none of these (seeded rand is
partitioning-dependent), so both operators here derive the decision from
an md5 of (salt, key): a pure per-row JVM expression, zero shuffles, and
exactly replayable by the DuckDB oracle (same md5-replay contract as the
minhash/simhash family, operators/dedup.py).

Scale: a row-local map over any input size; changing ``salt`` draws a
fresh independent sample/split without touching the data.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 100


def hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 100) from md5(salt || key) — first 15 hex
    chars (60 bits) as an integer, mod 100.  Matches the DuckDB replay
    ``CAST(('0x' || substr(md5(salt || key), 1, 15)) AS BIGINT) % 100``."""
    payload = F.concat(F.lit(salt), key.cast("string")).cast("binary")
    h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10)
    return (h.cast("bigint") % N_BUCKETS).alias("bucket")


def stable_sample(
    df: DataFrame, key_col: str, *, percent: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``percent`` (0-100).

    Unlike ``df.sample()``, the decision is a function of the KEY alone:
    re-runs, repartitions, and other tables sampled with the same salt
    keep exactly the same keys, so sampled fact/dim tables still join."""
    if not 0 <= percent <= 100:
        raise ValueError(f"percent must be in [0, 100], got {percent}")
    return df.where(hash_bucket(F.col(key_col), salt) < percent)


def split_assign(
    df: DataFrame,
    key_col: str,
    *,
    weights: Mapping[str, int],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a named split by contiguous hash-bucket ranges.

    ``weights`` maps split name -> percent; must sum to 100 so every row
    gets exactly one split (total, disjoint cover of the bucket space).
    Iteration order of ``weights`` fixes the ranges, e.g.
    ``{"train": 90, "val": 5, "test": 5}`` -> train=[0,90) val=[90,95)
    test=[95,100)."""
    bad = {n: w for n, w in weights.items() if not isinstance(w, int) or w <= 0}
    if bad:
        # A negative weight would pass the sum check while silently
        # collapsing ranges (first-match-wins eats the later splits).
        raise ValueError(f"split weights must be positive ints, got {bad}")
    total = sum(weights.values())
    if total != N_BUCKETS:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    for name, pct in weights.items():
        hi = lo + pct
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(split_col, expr)
