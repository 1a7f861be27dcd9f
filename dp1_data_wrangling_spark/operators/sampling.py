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


def global_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    salt: str = "",
    n_buckets: int = 256,
    position_col: str = "position",
) -> DataFrame:
    """Deterministic global shuffle: every row gets its 1-based position
    in the ordering by ``md5(salt || key)`` (ties broken by the key) —
    the "shuffle the corpus once, reproducibly" step before sharding
    training data, where row order must not correlate with source order.

    A naive ``ROW_NUMBER() OVER (ORDER BY md5)`` is an unpartitioned
    window: Spark funnels the whole corpus through ONE task.  This runs
    the classic two-pass distributed rank instead:

    1. bucket rows by the first hex chars of the hash — an md5 prefix, so
       bucket order is a *prefix* of the total order and buckets are
       uniformly sized (corpus/``n_buckets`` per bucket, no skew by
       construction);
    2. count rows per bucket (combinable aggregate, ``n_buckets`` rows to
       the driver), prefix-sum the counts into per-bucket offsets, and
       broadcast-map them back;
    3. rank within each bucket (window partitioned by bucket — parallel
       across buckets) and add the bucket's offset.

    Unlike ``zipWithIndex``, the result is partitioning-invariant: the
    position depends only on (salt, key), never on where rows physically
    sit.  Two data passes total (the count pass reads only the key
    column); the single shuffle is the per-bucket window.  At 100 TB
    raise ``n_buckets`` so a bucket (corpus/n_buckets rows) fits a task.

    DuckDB replay: ``ROW_NUMBER() OVER (ORDER BY md5(salt || key), key)``.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # Hard cap at 16^5 = 1,048,576 buckets: the per-bucket count pass
    # materializes one row per bucket on the driver (catalog-scale
    # metadata, never fact rows) and 1M buckets already puts a 100 TB
    # corpus at ~100 MB per bucket task — more buckets buys nothing.
    if not 1 <= (prefix_len := len(f"{n_buckets - 1:x}")) <= 5:
        raise ValueError(
            f"n_buckets too large: {n_buckets} (max 16^5 = 1048576; a "
            "bucket holds corpus/n_buckets rows, ample at any real scale)"
        )
    n_buckets = 16**prefix_len  # widen to a full hex-prefix space
    from .selection import rank_key

    key = F.col(key_col)
    rk = rank_key(key, salt)
    bucket = F.conv(F.substring(rk, 1, prefix_len), 16, 10).cast("int")
    keyed = df.withColumn("_rk", rk).withColumn("_bucket", bucket)
    counts = sorted(
        (r["_bucket"], r["n"])
        for r in keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    from pyspark.sql import Window

    w = Window.partitionBy("_bucket").orderBy("_rk", key_col)
    if len(offsets) <= 4096:
        # small bucket space: a literal map beats a join
        offset_map = F.create_map(
            *[F.lit(x) for b_off in offsets.items() for x in b_off]
        )
        ranked = keyed.withColumn(
            position_col,
            (
                F.row_number().over(w).cast("long")
                + F.coalesce(offset_map[F.col("_bucket")], F.lit(0)).cast("long")
            ),
        )
    else:
        # large bucket space: a 2M-literal create_map would choke Catalyst
        # — broadcast-join a tiny offsets table instead (still no
        # corpus-sized single-partition anything)
        off_df = df.sparkSession.createDataFrame(
            list(offsets.items()), "_bucket int, _off long"
        )
        ranked = (
            keyed.join(F.broadcast(off_df), "_bucket", "left")
            .withColumn(
                position_col,
                F.row_number().over(w).cast("long")
                + F.coalesce(F.col("_off"), F.lit(0)),
            )
            .drop("_off")
        )
    return ranked.drop("_rk", "_bucket")


MIX_BUCKETS = 10_000  # finer grain than hash_bucket: mix rates to 0.01%


def source_mix(
    docs: DataFrame,
    *,
    weights: Mapping[str, int],
    token_budget: int,
    group_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "mix_v1",
) -> DataFrame:
    """Compose a training corpus to a token budget with per-source target
    weights (the Pile/Dolma "data mixing" step).

    Each source ``s`` gets a target of ``token_budget * w_s / Σw`` tokens;
    its deterministic keep-rate is ``min(1, target_s / tokens_s)``,
    realized as an integer bucket threshold: keep a doc iff
    ``md5_bucket(salt, id) < thr_s`` where
    ``thr_s = least(B, floor(B * (budget*w_s) / (Σw * tokens_s)))``.
    The only floating step is one per-SOURCE division of two exact BIGINTs
    (IEEE-correctly-rounded, so engine-identical); every per-ROW decision
    is pure integer compare — reproducible, repartition-proof, and
    replayable by the DuckDB oracle.

    Returns all input rows plus a ``keep`` flag (callers filter; keeping
    the flag makes the decision auditable and oracle-checkable).

    A source absent from ``weights`` gets weight 0 ⇒ ``keep = false``
    (explicit curation: unlisted sources are excluded, not smuggled in).

    Scale: one map-side-combinable groupBy on the source (the ONLY
    shuffle), a source-dimension join back (broadcast while the source
    dimension is small; Spark falls back to a hash join if "source" is
    e.g. millions of domains), then a row-local keep decision.  Rates are
    exact at any corpus size: ``budget*w ≤ ~2.5e15`` and ``Σw*tokens``
    stay far inside int64 for a 100 TB corpus with percent-scale weights.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    bad = {s: w for s, w in weights.items() if not isinstance(w, int) or w < 0}
    if bad or not weights:
        raise ValueError(f"weights must be non-negative ints, got {bad or weights}")
    sum_w = sum(weights.values())
    if sum_w == 0:
        raise ValueError("at least one weight must be positive")

    wmap = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(w))]
    )
    totals = docs.groupBy(group_col).agg(
        F.sum(F.col(token_col)).alias("__grp_tokens")
    )
    wt = F.coalesce(F.element_at(wmap, F.col(group_col)), F.lit(0)).cast("long")
    b = F.lit(MIX_BUCKETS).cast("long")
    # A zero-token source has no budget pressure, but only POSITIVE-weight
    # sources may pass through: an unlisted (weight-0) source with all-empty
    # docs must still be excluded per the contract above.
    thr = (
        F.when(F.col("__grp_tokens") == 0, F.when(wt > 0, b).otherwise(F.lit(0).cast("long")))
        .otherwise(
            F.least(
                b,
                F.floor(
                    b
                    * (
                        (F.lit(token_budget).cast("long") * wt).cast("double")
                        / (F.lit(sum_w).cast("long") * F.col("__grp_tokens"))
                        .cast("double")
                    )
                ),
            )
        )
        .alias("__thr")
    )
    lim = totals.select(group_col, thr)
    payload = F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    bucket = (
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")
        % MIX_BUCKETS
    )
    # LEFT join + null-safe keep: a NULL group key cannot equi-join, and an
    # inner join would silently DROP those rows (a row-count change no
    # caller expects from a sampling decision) — they stay, with keep=false.
    return (
        docs.join(lim, group_col, "left")
        .withColumn(
            "keep", F.coalesce(bucket < F.col("__thr"), F.lit(False))
        )
        .drop("__thr")
    )
