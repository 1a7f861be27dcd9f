"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable.

The classic bottom-k cardinality sketch (Bar-Yossef et al. 2002;
Beyer et al., "On synopses for distinct-value estimation under multiset
operations", SIGMOD'07 — public literature): hash every value into a
uniform space, keep the k smallest distinct hashes per group.  The k-th
smallest hash h_k estimates the distinct count as ``(k-1) · M / h_k``
(M = hash-space size), and two sketches MERGE by taking the k smallest
of their union — the property that makes the sketch reaggregatable
across partitions, days, or tenants without touching raw data again.

Engine extension — the reference has no sketch tier; Spark's built-in
``approx_count_distinct`` (HLL++) is neither mergeable-as-data nor
engine-replayable.  This sketch is BOTH:

- **Deterministic**: the hash is the first 15 hex chars of md5 of the
  value's canonical string, as a BIGINT in [0, 16^15) — no seed, no JVM
  hashCode — so a DuckDB oracle replays sketch AND estimate bit-for-bit
  (``CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT)``).
  Canonical-string hashing restricts value columns to string/integer
  types (Spark's cast-to-string == Python str() == DuckDB VARCHAR cast
  only there — same rule as the catalog's Bloom stats).
- **Exact arithmetic**: (k-1)·M is computed in doubles but both factors
  and the product are exactly representable (k ≤ 2^20, M = 2^60), and
  the single division by h_k is IEEE-identical across engines.

Scale posture (100 TB): two narrow shuffles — the (group, hash) distinct
(map-side combinable, 8-byte hashes, never values) and the per-group
bottom-k window.  The shuffle is the same width as exact distinct-count;
what the sketch buys at scale is the DOWNSTREAM state: k BIGINTs per
group, reaggregatable, instead of the full distinct set — merge jobs,
rolling windows, and cross-partition unions touch sketch rows only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash-space size: 15 hex chars = 16^15 = 2^60.
KMV_SPACE = 16**15


def kmv_hash(col: Column) -> Column:
    """Deterministic 60-bit hash of a value's canonical string."""
    return F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k sketch: the k smallest distinct hashes of
    ``value_col``, as rows ``(*group_cols, hv)``.  NULL values are
    excluded (a NULL contributes nothing to a distinct count)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (the estimator uses k-1), got {k}")
    groups = group_cols or []
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, kmv_hash(F.col(value_col)).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(*groups).orderBy("hv")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    sketches: list[DataFrame],
    *,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Union sketches and re-take the bottom k per group — the KMV merge
    law.  ``kmv_merge([kmv_sketch(A), kmv_sketch(B)]) ==
    kmv_sketch(A UNION B)`` exactly (property-tested), because both are
    'k smallest of the union of distinct hashes'."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    groups = group_cols or []
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    w = Window.partitionBy(*groups).orderBy("hv")
    return (
        unioned.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame,
    *,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch.

    Returns ``(*group_cols, n_seen, kth_hash, est_distinct)``: a group
    holding fewer than k hashes is EXACT (``est = n_seen``, kth_hash
    NULL); a saturated group estimates ``(k-1) · M / h_k`` — both
    branches replay identically in SQL."""
    groups = group_cols or []
    agg = sketch.groupBy(*groups).agg(
        F.count("*").alias("n_seen"),
        F.max("hv").alias("__max_hv"),
    )
    kth = F.when(F.col("n_seen") == k, F.col("__max_hv"))
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col("__max_hv"), 6)
    )
    return agg.select(
        *groups,
        "n_seen",
        kth.alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_rolling(
    df: DataFrame,
    *,
    value_col: str,
    time_col: str,
    window_size: int,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Trailing-window distinct-count estimates from MERGED daily
    sketches — the workload the merge law exists for (rolling 7-day
    active users, etc.).

    ``time_col`` is an integer time bucket (e.g. epoch days).  For every
    (group, bucket) observed in the data, returns the KMV estimate over
    the trailing ``window_size`` buckets: ``(*group_cols, time_col,
    n_seen, kth_hash, est_distinct)``.

    The rolling union is computed entirely in SKETCH space: per-bucket
    bottom-k sketches are built once, each sketch row fans out to the ≤
    ``window_size`` anchors it can serve (a row-local explode), and the
    per-anchor re-min is a bottom-k window over ≤ k·window_size rows.
    By the merge law (k smallest of a union of distinct hashes — the
    property ``test_kmv_merge_equals_sketch_of_union`` pins), the result
    is EXACTLY the sketch of the raw trailing union, which is what the
    oracle computes directly from the observations: two independent
    formulations meeting at fact scale.

    Scale posture (100 TB): raw data is touched once (the daily-sketch
    build — same cost as one distinct count); the rolling stage moves
    only (group, bucket, 8-byte hash) sketch rows, ≤ k per group-bucket,
    ×window_size fan-out — catalog-sized state however large the fact
    table, and fully incremental (yesterday's daily sketches never
    rebuild).
    """
    if window_size < 1:
        raise ValueError(f"window_size must be >= 1, got {window_size}")
    groups = group_cols or []
    daily = kmv_sketch(
        df, value_col=value_col, group_cols=[*groups, time_col], k=k
    )
    # Each daily sketch row serves the window_size anchors it can reach;
    # __native marks the row whose anchor IS its own bucket.  An anchor
    # is OBSERVED (no phantom buckets) iff it has >= 1 native row, so
    # the anchor filter is a window max over the fanout itself — daily
    # is referenced exactly ONCE (no self-join, no recomputed subtree;
    # the r8 two-reference form recomputed the whole daily-sketch build
    # per branch and cost 6 shuffles against this form's 3).
    fanout = (
        daily.withColumn(
            "__anchor",
            F.explode(
                F.sequence(
                    F.col(time_col),
                    F.col(time_col) + F.lit(window_size - 1),
                )
            ),
        )
        .withColumn("__native", F.col("__anchor") == F.col(time_col))
        .drop(time_col)
        .withColumnRenamed("__anchor", time_col)
    )
    # All three windows share the (groups, anchor) partitioning prefix —
    # ONE exchange, stacked sorts.  Dedup duplicate hashes (the same
    # value observed on several buckets of the window) by first-
    # occurrence row_number over the (.., hv) superset key, then rank
    # the distinct hashes for bottom-k.
    part = [*groups, time_col]
    w_grp = Window.partitionBy(*part)
    w_hv = Window.partitionBy(*part, "hv").orderBy("__native")
    w_rank = Window.partitionBy(*part).orderBy("hv")
    bottom_k = (
        fanout.withColumn(
            "__has_anchor",
            F.max("__native").over(
                w_grp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("__dup", F.row_number().over(w_hv))
        .filter(F.col("__has_anchor") & (F.col("__dup") == 1))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= k)
        .select(*part, "hv")
    )
    return kmv_estimate(bottom_k, group_cols=[*groups, time_col], k=k)


# ---------------------------------------------------------------------------
# Theta set algebra — intersection / difference / union estimates over
# per-key KMV sketches (Dasgupta et al., "Theta-sketch framework for
# approximate set operations", 2016 — public literature)
# ---------------------------------------------------------------------------


def theta_overlap(
    sketch: DataFrame,
    *,
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """Set-operation cardinality estimates for every unordered key pair
    from per-key bottom-k sketches (``kmv_sketch`` rows ``(key, hv)``).

    The theta convention: a saturated sketch's threshold is its k-th
    smallest hash (``theta = max(hv)``), an unsaturated one keeps the
    whole space (``theta = M`` — every estimate is then EXACT over the
    hashed values).  For a pair, ``theta = least(theta_a, theta_b)`` and
    only entries strictly below it count — each sketch restricted below
    the pair theta is a uniform sample of its set at rate ``theta / M``,
    so ``|entries| · M / theta`` estimates each region's cardinality
    (Dasgupta et al. §3; the KMV single-set estimator ``(k-1)·M/h_k`` is
    the same formula applied to the k-1 entries below h_k).

    Returns one row per ``key_a < key_b``:
    ``(key_a, key_b, theta, n_a, n_b, n_inter, est_a, est_b,
    est_intersect, est_only_a, est_only_b, est_union, jaccard)`` where
    ``n_*`` count surviving hashes, estimates scale by ``M / theta``
    (round 6), and ``jaccard = n_inter / n_union`` (NULL when the pair
    theta-region is empty).  Inclusion–exclusion holds exactly:
    ``n_union = n_a + n_b - n_inter``.

    Determinism: hashes are the md5-derived 60-bit integers of
    ``kmv_hash`` — a DuckDB oracle replays sketch, thresholds, counts
    and the single double division bit-for-bit (``n · M`` is exact in a
    double for n ≤ k ≤ 2^20, M = 2^60).

    Scale posture (100 TB): everything here runs in SKETCH space — at
    most k rows per key survive the upstream ``kmv_sketch``, so the
    key-pair frame, the hash equi-join, and the below-theta counts all
    move ≤ k·|keys| 8-byte rows; the pair frame is |keys|² but keys are
    a dimension (event types, tenants, days), never fact rows.  Raw
    data is scanned once by the sketch build and never again — the
    algebra composes with ``kmv_merge``'s reaggregation (sketch daily,
    answer pairwise-overlap queries forever after).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (the estimator uses k-1), got {k}")
    # The sketch feeds five branches (thetas, both side counts, both
    # intersection references) — cut it once so the upstream build runs
    # once (the same multi-reference discipline as connected_components'
    # edge set; sketch rows are <= k per key, so the materialization is
    # dimension-sized).
    s = sketch.select(F.col(key_col).alias("__key"), "hv").localCheckpoint(
        eager=True
    )
    stats = s.groupBy("__key").agg(
        F.count("*").alias("__n"), F.max("hv").alias("__mx")
    )
    th = stats.select(
        "__key",
        F.when(F.col("__n") == k, F.col("__mx"))
        .otherwise(F.lit(KMV_SPACE))
        .alias("__theta"),
    )
    # Key-pair frame: |keys|² is dimension-sized; the inequality join is
    # a broadcast nested loop over the tiny theta table, never fact data.
    a, b = th.alias("a"), th.alias("b")
    pairs = a.join(b, F.col("a.__key") < F.col("b.__key")).select(
        F.col("a.__key").alias("key_a"),
        F.col("b.__key").alias("key_b"),
        F.least(F.col("a.__theta"), F.col("b.__theta")).alias("theta"),
    )
    # Per-pair survivor counts: one side each (below the pair theta) and
    # the hash equi-join intersection — all in sketch space.  The pair
    # frame and the per-pair count frames are |keys|²-sized dimensions:
    # broadcast them so the only repartitions left are the pair-keyed
    # count aggregates themselves.
    n_a = (
        s.join(F.broadcast(pairs), s["__key"] == pairs["key_a"])
        .filter(F.col("hv") < F.col("theta"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_a"))
    )
    n_b = (
        s.join(F.broadcast(pairs), s["__key"] == pairs["key_b"])
        .filter(F.col("hv") < F.col("theta"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_b"))
    )
    x, y = s.alias("x"), s.alias("y")
    inter = (
        x.join(F.broadcast(y), F.col("x.hv") == F.col("y.hv"))
        .filter(F.col("x.__key") < F.col("y.__key"))
        .select(
            F.col("x.__key").alias("key_a"),
            F.col("y.__key").alias("key_b"),
            F.col("x.hv").alias("hv"),
        )
        .join(F.broadcast(pairs), ["key_a", "key_b"])
        .filter(F.col("hv") < F.col("theta"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_inter"))
    )
    keys = ["key_a", "key_b"]
    out = (
        pairs.join(F.broadcast(n_a), keys, "left")
        .join(F.broadcast(n_b), keys, "left")
        .join(F.broadcast(inter), keys, "left")
        .fillna(0, subset=["n_a", "n_b", "n_inter"])
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )

    def est(n: str) -> F.Column:
        # (n · M) exact in a double, then ONE IEEE division by theta —
        # the same expression shape the oracle uses.
        return F.round(
            (F.col(n).cast("double") * F.lit(float(KMV_SPACE))) / F.col("theta"),
            6,
        )

    return (
        out.select(
            *keys,
            "theta",
            "n_a",
            "n_b",
            "n_inter",
            "n_union",
            est("n_a").alias("est_a"),
            est("n_b").alias("est_b"),
            est("n_inter").alias("est_intersect"),
        )
        .withColumn(
            "est_only_a", F.round(F.col("est_a") - F.col("est_intersect"), 6)
        )
        .withColumn(
            "est_only_b", F.round(F.col("est_b") - F.col("est_intersect"), 6)
        )
        .withColumn(
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_intersect"), 6
            ),
        )
        .withColumn(
            "jaccard",
            F.when(
                F.col("n_union") > 0,
                F.round(
                    F.col("n_inter").cast("double") / F.col("n_union"), 6
                ),
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bottom-k uniform sample sketch — mergeable sampling + quantile estimates
# ---------------------------------------------------------------------------


def sample_sketch(
    df: DataFrame,
    *,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    salt: str = "sample_v1",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic per-group uniform sample of ``k`` rows WITHOUT
    replacement, as a MERGEABLE bottom-k sketch: rank every row by the
    60-bit md5 hash of (salt, its unique ``id_col``) and keep the k
    smallest ranks.  Because the rank depends only on row identity, the
    k smallest of a union of sketches IS the sketch of the union — the
    same merge law as KMV (k-smallest-of-union), so per-partition /
    per-day / per-tenant samples reaggregate without rescanning raw
    data, and the sample is partitioning-independent and
    SQL-replayable (no RAND(), no reservoir order dependence).

    Returns ``(*group_cols, rank_hash, id_col, *keep_cols)``.

    Scale posture (100 TB): one window shuffle of (group, 8-byte rank,
    payload) rows; downstream state is k rows per group.  ``id_col``
    must be unique per row (duplicate ids would collapse in the union
    merge — that is the identity semantic that makes merging exact).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = group_cols or []
    keeps = keep_cols or []
    rank = kmv_hash(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*groups).orderBy("rank_hash", id_col)
    # NULL ids are excluded (a NULL rank would sort engine-differently
    # AND violate the uniqueness contract silently); full-row distinct
    # makes redelivered rows consume ONE sample slot — the property the
    # streaming twin's within-batch redelivery robustness rests on
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(
            *groups, rank.alias("rank_hash"), F.col(id_col), *keeps
        )
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_merge(
    sketches: list[DataFrame],
    *,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Union sample sketches and re-take the k smallest ranks per group.
    Because ranks are a pure function of row identity,
    ``sample_merge([sample_sketch(A), sample_sketch(B)]) ==
    sample_sketch(A ∪ B)`` exactly (property-tested) — rows present in
    both inputs dedup by id, never double-sample."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    groups = group_cols or []
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    w = Window.partitionBy(*groups).orderBy("rank_hash", id_col)
    return (
        unioned.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_quantiles(
    sketch: DataFrame,
    *,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    percents: list[int] = (25, 50, 75, 90),
) -> DataFrame:
    """Nearest-rank quantile estimates from a uniform sample sketch:
    per group, the sample's order statistic at rank
    ``ceil(p/100 * n_sample)`` for each percent — all-integer rank
    arithmetic over the (value, id) total order, and the value is
    copied VERBATIM (no interpolation), so double columns stay
    hash-identical across engines.

    Returns ``(*group_cols, n_sample, q_p{p}...)`` — one row per group.
    Estimates converge at O(1/sqrt(k)) in distribution distance: the
    honest trade for k-bounded state on an unbounded stream.

    NULL ``value_col`` rows must be filtered upstream: engines disagree
    on NULL sort position (Spark ASC is NULLS FIRST, most SQL engines
    NULLS LAST), which would shift every rank.
    """
    groups = group_cols or []
    ps = list(percents)
    if not ps or any(p < 1 or p > 100 for p in ps):
        raise ValueError(f"percents must be within [1, 100], got {ps}")
    w = Window.partitionBy(*groups).orderBy(value_col, id_col)
    cw = Window.partitionBy(*groups)
    ranked = sketch.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(cw)
    )
    aggs = [F.max("__n").alias("n_sample")]
    for p in ps:
        # nearest-rank: ceil(p/100 * n) = (p*n + 99) div 100, all BIGINT
        target = F.expr(f"({p} * __n + 99) div 100")
        aggs.append(
            F.max(
                F.when(F.col("__rn") == target, F.col(value_col))
            ).alias(f"q_p{p}")
        )
    return ranked.groupBy(*groups).agg(*aggs)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# ---------------------------------------------------------------------------


def cm_sketch(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch as rows ``(*group_cols, row_idx, col_idx, cnt)``.

    Each value increments one cell per hash row (md5-derived column
    index); ``weight_col`` aggregates weighted frequency instead of row
    counts.  NULL values are excluded.

    Sketch state is ``depth · width`` cells per group REGARDLESS of the
    stream size — the whole point at 100 TB: one combinable groupBy
    produces a bounded matrix that merges with any other sketch by
    cellwise addition (``cm_merge``), so rolling windows and cross-day
    unions never rescan raw data.  Estimates (``cm_estimate``) only ever
    OVER-count (collisions add, never subtract): est >= true, with
    error <= 2N/width per row whp — pick width against the stream mass.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    groups = group_cols or []
    wgt = F.col(weight_col) if weight_col else F.lit(1)
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, F.col(value_col).alias("__v"), wgt.alias("__w"))
        .withColumn("__row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
    )
    col_idx = F.concat(
        F.lit("cm"), F.col("__row").cast("string"), F.lit("|"),
        F.col("__v").cast("string"),
    ).cast("binary")
    col_idx = F.conv(F.substring(F.md5(col_idx), 1, 15), 16, 10).cast(
        "bigint"
    ) % F.lit(width)
    return (
        rows.withColumn("__col", col_idx)
        .groupBy(*groups, F.col("__row").alias("row_idx"), F.col("__col").alias("col_idx"))
        .agg(F.sum("__w").cast("bigint").alias("cnt"))
    )


def cm_merge(
    sketches: list[DataFrame],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cellwise addition — ``cm_merge([cm(A), cm(B)]) == cm(A ++ B)``
    exactly (counts are sums; property-tested)."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    groups = group_cols or []
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*groups, "row_idx", "col_idx").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Frequency estimate per probe value: min over hash rows of the
    probed cell (a missing cell is 0 — the value was never seen).
    Returns the probe columns plus ``est_cnt``.

    The probe side explodes ``depth`` cells per value and left-joins the
    sketch on (group, row, col) — narrow int keys; broadcast the sketch
    side when the group count is small (it is ``depth·width`` cells per
    group by construction)."""
    groups = group_cols or []
    pr = probes.withColumn(
        "__row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    col_idx = F.concat(
        F.lit("cm"), F.col("__row").cast("string"), F.lit("|"),
        F.col(value_col).cast("string"),
    ).cast("binary")
    col_idx = F.conv(F.substring(F.md5(col_idx), 1, 15), 16, 10).cast(
        "bigint"
    ) % F.lit(width)
    pr = pr.withColumn("__col", col_idx)
    sk = sketch.select(
        *groups,
        F.col("row_idx").alias("__row"),
        F.col("col_idx").alias("__col"),
        "cnt",
    )
    joined = pr.join(F.broadcast(sk), [*groups, "__row", "__col"], "left")
    return (
        joined.withColumn("__cell", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*probes.columns)
        .agg(F.min("__cell").alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# HDR log-linear histogram sketch — bounded-relative-error quantiles
# ---------------------------------------------------------------------------


def _floor_log2(col: str) -> str:
    """SQL expression for exact integer floor(log2(col)) of a POSITIVE
    BIGINT: smear the top bit down with 6 or-shift rounds, then
    ``bit_count(smeared) - 1``.  Pure int64 ops — bit-identical in
    Spark and DuckDB (a float log2() rounds untrustworthily at octave
    boundaries: log2(2^60) can come back 59.9999… or 60.0000…1)."""
    s = col
    for sh in (1, 2, 4, 8, 16, 32):
        s = f"({s} | ({s} >> {sh}))"
    return f"(bit_count({s}) - 1)"


def hdr_bucket(col: str, precision_bits: int = 4) -> Column:
    """HDR-histogram bucket id of a NON-NEGATIVE BIGINT value (the
    HdrHistogram / DDSketch family: log-spaced octaves, 2^precision
    linear slots per octave, relative error <= 2^-precision_bits).

    Values below 2^(p+1) index themselves exactly (bucket id = value);
    a larger value with exponent e = floor(log2(v)) maps to bucket
    ``(e - p) * 2^p + (v >> (e - p))``: the shifted mantissa keeps the
    top p+1 bits, and the per-octave offset keeps ids strictly ordered
    by value — so bucket order IS value order and cumulative counts
    give quantiles.  Everything is int64 shifts/ors, replayable in SQL.
    """
    p = precision_bits
    e = _floor_log2(col)
    return F.expr(
        f"CASE WHEN {col} < {1 << (p + 1)} THEN {col} "
        f"ELSE ({e} - {p}) * {1 << p} + ({col} >> ({e} - {p})) END"
    ).cast("bigint")


def hdr_bucket_lo(bucket: str, precision_bits: int = 4) -> Column:
    """Smallest value mapping to ``bucket`` — the deterministic quantile
    estimate (a lower bound within 2^-p relative error of any member)."""
    p = precision_bits
    return F.expr(
        f"CASE WHEN {bucket} < {1 << (p + 1)} THEN {bucket} "
        f"ELSE ({bucket} % {1 << p} + {1 << p})"
        f" * (CAST(1 AS BIGINT) << ({bucket} div {1 << p} - 1)) END"
    ).cast("bigint")


def hdr_sketch(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
    precision_bits: int = 4,
) -> DataFrame:
    """Per-group HDR histogram: rows ``(*group_cols, bucket, n)`` with
    ``n`` the count of values in the bucket.  ``value_col`` must be a
    non-negative integer column (quantize upstream — micros, cents);
    NULLs are excluded, negatives raise at execution time (a silent
    wrap would corrupt quantiles).

    MERGE LAW: histograms are cellwise-additive — ``hdr_merge`` of any
    partition of the data equals the sketch of the union, EXACTLY (the
    property test pins it), which is what makes the sketch maintainable
    incrementally (per-day / per-tenant / streaming state) without
    rescanning raw data.

    Scale posture (100 TB): ONE map-side-combinable groupBy shuffle of
    (group, bucket) cells; state per group is bounded by
    ~64 * 2^precision_bits cells regardless of row count — the whole
    point versus exact percentile's full-sort."""
    if not 1 <= precision_bits <= 12:
        raise ValueError(
            f"precision_bits must be in [1, 12], got {precision_bits}"
        )
    groups = group_cols or []
    guarded = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__v",
        F.when(
            F.col(value_col) < 0,
            F.expr(
                f"raise_error(concat('hdr_sketch: negative value ', "
                f"CAST({value_col} AS STRING)))"
            ).cast("bigint"),
        ).otherwise(F.col(value_col).cast("bigint")),
    )
    return (
        guarded.withColumn("bucket", hdr_bucket("__v", precision_bits))
        .groupBy(*groups, "bucket")
        .agg(F.count("*").alias("n"))
    )


def hdr_merge(
    sketches: list[DataFrame],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cellwise-add histograms: the sketch of the union, exactly."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    groups = group_cols or []
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*groups, "bucket").agg(F.sum("n").alias("n"))


def hdr_quantiles(
    sketch: DataFrame,
    *,
    group_cols: list[str] | None = None,
    percents: list[int] = (50, 90, 99),
    precision_bits: int = 4,
) -> DataFrame:
    """Nearest-rank quantile estimates from an HDR sketch: per group,
    the lower bound of the first bucket whose cumulative count reaches
    rank ``ceil(p/100 * n)`` — within 2^-precision_bits relative error
    of the true order statistic, all-integer, engine-replayable.

    Returns ``(*group_cols, n_values, q_p{p}...)`` — one row per group.
    ONE cumulative-window shuffle over cells (not values)."""
    groups = group_cols or []
    ps = list(percents)
    if not ps or any(p < 1 or p > 100 for p in ps):
        raise ValueError(f"percents must be within [1, 100], got {ps}")
    w = Window.partitionBy(*groups).orderBy("bucket")
    cum = (
        sketch.withColumn(
            "__cum",
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "__tot",
            F.sum("n").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("__lo", hdr_bucket_lo("bucket", precision_bits))
    )
    aggs = [F.max("__tot").cast("bigint").alias("n_values")]
    for p in ps:
        target = F.expr(f"({p} * __tot + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("__cum") >= target, F.col("__lo"))).alias(
                f"q_p{p}"
            )
        )
    return cum.groupBy(*groups).agg(*aggs)


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, public literature) — the canonical
# fixed-size cardinality sketch: hash each value, route it to one of
# m = 2^p registers by its top p bits, and keep per register the MAXIMUM
# rho = (leading zeros of the remaining bits) + 1.  The harmonic mean of
# 2^-register estimates the distinct count as alpha_m * m^2 / sum(2^-M_j).
#
# Engine posture vs KMV above: the KMV sketch is k rows per group and
# exact below k; HLL is at most m rows per group FOREVER (registers
# saturate, they never grow), merge = cellwise MAX (associative,
# idempotent — re-delivery under at-least-once streaming is free), and
# the build is ONE combinable groupBy (no window pass at all).  At
# 100 TB the HLL build is the cheapest possible distinct-count shape:
# map-side max-combine over (group, bucket) cells.
#
# Determinism: the same md5-derived 60-bit hash as KMV; rho is computed
# as ``(w+1) - length(bin(remainder))`` — minimal binary strings are
# engine-identical — and the estimator is exact-integer up to ONE double
# division chain replayed verbatim by the oracle.  No ln()-based
# small-range correction is applied (a transcendental is not
# cross-engine-stable); `zero_buckets` is emitted so callers can see
# when linear counting would apply.
# --------------------------------------------------------------------------

#: alpha_m in micro units, from the HLL paper's table (m = 16, 32, 64)
#: and its asymptotic formula for larger m.
_HLL_ALPHA_MICRO = {4: 673_000, 5: 697_000, 6: 709_000}


def _hll_params(p: int) -> tuple[int, int, int]:
    """(m, w, alpha_micro) for precision p; w = remainder bits."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be within [4, 14], got {p}")
    m = 1 << p
    w = 60 - p
    alpha_micro = _HLL_ALPHA_MICRO.get(p) or round(
        721_300 / (1 + 1.079 / m)
    )
    return m, w, alpha_micro


def hll_sketch(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """Per-group HLL registers ``(*group_cols, bucket, reg)``: bucket is
    the hash's top ``p`` bits, reg the max rho observed there.  Empty
    buckets are implicit (reg 0) — the estimator accounts for them.
    NULL values are excluded.  ONE combinable groupBy; no distinct, no
    window (max is idempotent, duplicates are free)."""
    _, w, _ = _hll_params(p)
    groups = group_cols or []
    mask = (1 << w) - 1
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, kmv_hash(F.col(value_col)).alias("__hv"))
        .withColumn("bucket", F.expr(f"shiftright(__hv, {w})"))
        .withColumn("__r", F.expr(f"__hv & {mask}"))
        .withColumn(
            "__rho",
            F.expr(
                f"CASE WHEN __r = 0 THEN {w + 1} "
                f"ELSE {w + 1} - length(bin(__r)) END"
            ).cast("int"),
        )
    )
    return hashed.groupBy(*groups, "bucket").agg(
        F.max("__rho").alias("reg")
    )


def hll_merge(
    sketches: list[DataFrame],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cellwise-max registers: the sketch of the union, exactly
    (property-tested), because max over a union is max of maxes."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    groups = group_cols or []
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*groups, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    sketch: DataFrame,
    *,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """Raw-HLL distinct estimate per group.

    Returns ``(*group_cols, zero_buckets, reg_denom, est_distinct)``.
    ``reg_denom`` is the harmonic-mean denominator scaled by 2^(w+1) so
    it is an EXACT BIGINT: sum over all m buckets of 2^(w+1-reg), with
    the (m - seen) empty buckets contributing 2^(w+1) each; the bound is
    m * 2^(w+1) = 2^61 regardless of p, so it never overflows.  The
    estimate alpha_m * m^2 / sum(2^-reg) is then
    ``alpha_micro * m^2 * 2^(w+1) / reg_denom / 1e6`` — the numerator is
    an exactly-representable double (alpha_micro * m^2 < 2^53 times a
    power of two) and the two divisions are IEEE-identical across
    engines, so a DuckDB oracle replays the estimate bit-for-bit."""
    m, w, alpha_micro = _hll_params(p)
    groups = group_cols or []
    rmax = w + 1
    num = float(alpha_micro * m * m) * float(1 << rmax)
    agg = sketch.groupBy(*groups).agg(
        (F.lit(m) - F.count("*")).cast("bigint").alias("zero_buckets"),
        (
            # coalesce: a global agg over an EMPTY sketch sums to NULL,
            # but the all-registers-zero denominator is exactly m*2^rmax
            F.coalesce(
                F.sum(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - reg)")
                ),
                F.lit(0).cast("bigint"),
            )
            + (F.lit(m) - F.count("*")) * F.lit(1 << rmax)
        )
        .cast("bigint")
        .alias("reg_denom"),
    )
    return agg.select(
        *groups,
        "zero_buckets",
        "reg_denom",
        F.round(
            F.lit(num) / F.col("reg_denom").cast("double") / F.lit(1e6), 6
        ).alias("est_distinct"),
    )


def hll_rolling(
    df: DataFrame,
    *,
    value_col: str,
    time_col: str,
    window_size: int,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """Trailing-window HLL distinct estimates from MERGED daily register
    tables — the cellwise-max twin of :func:`kmv_rolling`, and simpler:
    no dedup pass and no bottom-k re-rank, because max is idempotent
    and order-free.  Per-bucket registers build once from raw data;
    each register row fans out (row-local explode) to the <=
    ``window_size`` anchors it serves; one combinable groupBy re-maxes
    per (group, anchor, register-bucket).  By the merge law
    (``test_hll_merge_equals_sketch_of_union``) the result is EXACTLY
    the registers of the raw trailing union, which the oracle computes
    directly — two formulations meeting at fact scale.

    Returns ``(*group_cols, time_col, zero_buckets, reg_denom,
    est_distinct)`` for every OBSERVED (group, bucket) anchor.

    Scale posture (100 TB): raw data touched once; the rolling stage
    moves (group, day, bucket<=2^p, tinyint) cells x window_size —
    bounded state regardless of fact volume, and the re-max groupBy is
    map-side combinable (cheaper than kmv_rolling's rank windows).
    """
    if window_size < 1:
        raise ValueError(f"window_size must be >= 1, got {window_size}")
    groups = group_cols or []
    daily = hll_sketch(
        df, value_col=value_col, group_cols=[*groups, time_col], p=p
    )
    fanout = (
        daily.withColumn(
            "__anchor",
            F.explode(
                F.sequence(
                    F.col(time_col),
                    F.col(time_col) + F.lit(window_size - 1),
                )
            ),
        )
        .withColumn("__native", F.col("__anchor") == F.col(time_col))
        .drop(time_col)
        .withColumnRenamed("__anchor", time_col)
    )
    regs = fanout.groupBy(*groups, time_col, "bucket").agg(
        F.max("reg").alias("reg"), F.max("__native").alias("__nat")
    )
    w_grp = Window.partitionBy(*groups, time_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    observed = (
        regs.withColumn("__has_anchor", F.max("__nat").over(w_grp))
        .filter(F.col("__has_anchor"))
        .select(*groups, time_col, "bucket", "reg")
    )
    return hll_estimate(observed, group_cols=[*groups, time_col], p=p)
