"""Generic exactly-once keyed-census maintenance + census-fold read
sides (r12).

Several batch operators in this engine decompose through an
ASSOCIATIVE census — a keyed count the whole answer re-derives from
(rank/ntile: the value census; KS drift: the bin census; CUSUM drift:
the per-period count census; seasonal profiles: the period census).
Counts add, so a stream maintains the census by per-key addition with
the idempotent-foreachBatch MERGE pattern, and the READ side replays
the batch fold over census-sized data — bit-identical to the batch
operator over every delivered event, however the stream was cut, and
robust to LATE data (a late event revises its key's count, which
re-derives every downstream statistic — the cross-row damage bounded
incremental state cannot express).

``stream_census`` is the generic maintainer (the
``streaming/ranking.py`` twin is its single-key specialization with
the total-order NULL guard), extended in r13 with ``sum_cols`` —
associative DECIMAL(38,0) sums riding the same exactly-once MERGE as
the counts, which is all a WEIGHTED census (sums + counts) needs.
Read sides, each sharing its fold with the batch operator by
construction: ``read_cusum_alarms`` (volume-drift alarms, the
``events_changepoints`` surface), ``read_grid_hotspots`` (Moore
stencil), ``read_benford`` (r13 — first-digit conformity, the
``orders_benford`` surface), ``read_seasonal_profile`` (r13 — the
first weighted read side, the ``events_seasonal_profile`` surface)
and ``read_simpson`` (r13 — mix concentration, the
``doc_source_lang_simpson`` surface).  r13 late adds the experiment
read sides: ``read_post_strat_ate`` (per-(group, stratum, arm) cell
census) and ``read_cuped_ate`` (per-(group, arm) cross-moment census
— sums of y, x, xy, xx add, so pooled theta re-derives exactly),
then the rank/survival families: ``read_kruskal_wallis`` (the k-arm
midrank omnibus — a late unit moves every midrank above it),
``read_nelson_aalen`` (cumulative hazard — a late subject moves
n_risk for every earlier duration) and ``read_log_rank`` (the
censoring-correct two-arm retention experiment monitored live).

Engine extension — the reference (export_dp1.py / import_dp1.py) has
no streaming tier; cited for provenance only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 5


def stream_census(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str,
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Maintain ``catalog_root``/``table`` = one ``(*key_cols, n_rows)``
    row per distinct key over every event delivered so far, exactly
    once (the per-stream batch-id watermark rides the same atomic
    MERGE commit as the counts).

    Project the key expressions on the STREAM before calling (e.g.
    ``stream.select(F.col("event_type"), (ts div day).alias("day"))``)
    — the census maintainer is expression-agnostic by design, so the
    caller's projection is the single definition both the stream and
    its batch oracle share.  NULL keys census like any other value
    (SQL GROUP BY semantics); screen upstream where a NULL has no
    meaning.

    ``sum_cols`` (r13) extends the census with associative SUM
    columns — ``{"sum_q": "vq"}`` maintains ``sum(vq)`` per key as
    DECIMAL(38,0) alongside ``n_rows`` (sums add exactly like counts,
    so the maintenance algebra is unchanged).  This is what the
    weighted read sides (seasonal-index profile) fold from; drop NULL
    value rows in the caller's projection when the batch twin uses
    mean semantics (count of non-NULL).

    ``min_cols`` / ``max_cols`` (r13) extend it with associative
    MIN/MAX columns of ANY orderable type — including STRUCTS, whose
    lexicographic field order is how a first/last-by-total-order
    becomes associative (project ``struct(ts, tie, value)`` and the
    min's ``.value`` IS the open; the OHLC read side rides exactly
    this).  Late data revises the extremum only if it actually extends
    it — which is the correct semantics, unlike bounded incremental
    state for first/last.

    Scale: per batch one combinable groupBy over the batch + a
    touched-keys recombine (census-sized) + one MERGE rewrite; state
    is the census — bounded by distinct keys, never rows.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    sums = sum_cols or {}
    mins = min_cols or {}
    maxs = max_cols or {}
    reserved = {"n_rows"} | set(key_cols)
    bags = [("sum_cols", sums), ("min_cols", mins), ("max_cols", maxs)]
    taken: set[str] = set()
    for bag_name, bag in bags:
        overlap_names = set(bag) & (reserved | taken)
        if overlap_names:
            raise ValueError(
                f"{bag_name} collide with census columns: {overlap_names}"
            )
        taken |= set(bag)
    meta_key = batch_meta_key(f"census:{table}", checkpoint_dir, stream_name)

    def _aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            *[
                F.sum(F.col(src).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias(out)
                for out, src in sums.items()
            ],
            *[F.min(F.col(src)).alias(out) for out, src in mins.items()],
            *[F.max(F.col(src)).alias(out) for out, src in maxs.items()],
        ]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        partial = batch_df.groupBy(*key_cols).agg(*_aggs())
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            if cat.exists(table):
                current = cat.read(spark, table)
                touched = partial.select(*key_cols).distinct()
                overlap = current.join(touched, on=key_cols, how="left_semi")
                updates = (
                    overlap.unionByName(partial)
                    .groupBy(*key_cols)
                    .agg(
                        F.sum("n_rows").cast("bigint").alias("n_rows"),
                        *[
                            F.sum(out).cast("decimal(38,0)").alias(out)
                            for out in sums
                        ],
                        *[F.min(out).alias(out) for out in mins],
                        *[F.max(out).alias(out) for out in maxs],
                    )
                )
            else:
                updates = partial
            try:
                cat.merge(
                    spark,
                    table,
                    updates,
                    key_cols,
                    sort_by=list(key_cols),
                    max_retries=1,
                    meta={meta_key: batch_id},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_census({table!r}): concurrent commits kept winning "
            f"after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cusum_alarms(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    order_col: str,
    slack_milli: int = 0,
    threshold_milli: int = 1000,
) -> DataFrame:
    """Fold a maintained ``(group, period, n_rows)`` census through the
    exact two-sided CUSUM detector (operators/changepoint.py) — the
    volume-drift alarm, bit-identical to the batch detector over the
    same delivered events.  A LATE event that revises an old period's
    count moves the group mean and therefore EVERY position's
    statistic — which the census fold re-derives and bounded
    sequential state cannot.  Runs over census-sized data (periods,
    not events)."""
    from ..operators.changepoint import cusum_changepoints

    census = Catalog(catalog_root).read(spark, table)
    return cusum_changepoints(
        census,
        value_col="n_rows",
        order_cols=[order_col],
        group_cols=group_cols,
        slack_milli=slack_milli,
        threshold_milli=threshold_milli,
    )


def read_grid_hotspots(
    spark,
    catalog_root: str,
    *,
    table: str,
    min_count: int = 1,
) -> DataFrame:
    """Fold a maintained ``(cell_x, cell_y, n_rows)`` census through
    the exact Moore-stencil hotspot screen (operators/spatial.py
    hotspots_from_census) — the streaming form of the
    ``events_grid_hotspots`` surface.  A LATE point revises its cell's
    count, which moves that cell AND its eight neighbors'
    concentration — the stencil fold re-derives all of it over
    census-sized data.  Project the stream through
    ``operators.spatial.grid_cells`` so the cell definition is shared
    with the batch screen and the oracle."""
    from ..operators.spatial import hotspots_from_census

    census = Catalog(catalog_root).read(spark, table)
    return hotspots_from_census(
        census, min_count=min_count, count_col="n_rows"
    )


def read_benford(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
) -> DataFrame:
    """Fold a maintained ``(group, digit, n_rows)`` census through the
    exact Benford conformity screen (operators/stats.py
    benford_from_census) — the streaming form of the ``orders_benford``
    surface: a forensic alarm over amount streams that revises history
    when late amounts land (one digit's count moves the group total
    and therefore EVERY digit's Pearson term — which the census fold
    re-derives and bounded incremental state cannot).  Project the
    stream through ``operators.stats.benford_digit_projection`` so the
    digit definition is shared with the batch screen and the oracle.
    Runs over census-sized data (at most 9 rows per group)."""
    from ..operators.stats import benford_from_census

    census = Catalog(catalog_root).read(spark, table)
    return benford_from_census(
        census, group_cols=group_cols, count_col="n_rows"
    )


def read_seasonal_profile(
    spark,
    catalog_root: str,
    *,
    table: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a maintained ``(*keys, position, n_rows, sum_q)`` census
    (``stream_census(..., sum_cols={"sum_q": "__vq"})`` over the
    ``operators.timeseries.seasonal_census_projection`` of the stream)
    through the exact ratio-to-mean seasonal-index fold
    (operators/timeseries.py seasonal_from_census) — the streaming
    form of the ``events_seasonal_profile`` surface.  A late
    observation revises one position's (count, sum), which moves the
    key totals and therefore EVERY position's index — re-derived here
    over census-sized data (``period`` rows per key)."""
    from ..operators.timeseries import seasonal_from_census

    census = Catalog(catalog_root).read(spark, table)
    return seasonal_from_census(
        census,
        key_cols=key_cols or [],
        position_col="__pos",
        count_col="n_rows",
        sum_col="sum_q",
    )


def read_simpson(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a maintained ``(*groups, item, n_rows)`` category census
    through the exact Simpson mix-concentration index
    (operators/stats.py simpson_from_census) — the streaming form of
    the ``doc_source_lang_simpson`` surface: the mix-homogeneity KPI a
    corpus owner watches live during ingestion.  A late row revises
    one category's count, which moves N and therefore the whole
    pair-draw probability — re-derived census-sized at read.  Project
    the stream to ``(*groups, item)``; the maintainer's n_rows IS the
    category count."""
    from ..operators.stats import simpson_from_census

    census = Catalog(catalog_root).read(spark, table)
    return simpson_from_census(
        census, group_cols=group_cols or [], count_col="n_rows"
    )


def read_classification_report(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    actual_col: str = "actual",
    predicted_col: str = "predicted",
) -> DataFrame:
    """Fold a maintained ``(*groups, actual, predicted, n_rows)``
    confusion census through the exact per-class precision/recall/F1
    report (operators/agreement.py classification_report_from_census)
    — the streaming form of the ``events_classification_report``
    surface: live model-quality monitoring over a prediction stream.
    A LATE labeled prediction revises one confusion cell, which moves
    its class's tp/fp/fn AND every rate derived from them — re-derived
    census-sized at read.  Project the stream to
    ``(*groups, actual, predicted)``; the maintainer's n_rows IS the
    cell count."""
    from ..operators.agreement import classification_report_from_census

    census = Catalog(catalog_root).read(spark, table)
    return classification_report_from_census(
        census,
        group_cols=group_cols,
        actual_col=actual_col,
        predicted_col=predicted_col,
        count_col="n_rows",
    )


def read_cohens_kappa(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    rater_a_col: str = "rater_a",
    rater_b_col: str = "rater_b",
) -> DataFrame:
    """Fold a maintained ``(*groups, rater_a, rater_b, n_rows)``
    agreement census through exact Cohen's kappa
    (operators/agreement.py cohens_kappa_from_census) — the streaming
    form of the ``events_rater_agreement`` surface: a labeling
    campaign's acceptance gate watched live as ratings stream in.  A
    late rating revises one (a, b) cell, which moves n, BOTH marginal
    vectors and the chance-expected term S — cross-cell damage only
    the census fold can re-derive."""
    from ..operators.agreement import cohens_kappa_from_census

    census = Catalog(catalog_root).read(spark, table)
    return cohens_kappa_from_census(
        census,
        group_cols=group_cols,
        rater_a_col=rater_a_col,
        rater_b_col=rater_b_col,
        count_col="n_rows",
    )


def read_heavy_hitters(
    spark,
    catalog_root: str,
    *,
    table: str,
    key_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """EXACT top-k heavy hitters from a maintained key census — the
    lossless sibling of the batch Count-Min screen
    (``events_cm_heavy_hitters``): the census maintainer already pays
    for one row per distinct key, so the stream's top-k needs no
    sketch at all.  Deterministic total order (count DESC, then keys)
    lowers to TakeOrderedAndProject over census-sized data; ties at
    the k boundary resolve by key order, stated and stable."""
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    census = Catalog(catalog_root).read(spark, table)
    ordered = census.orderBy(
        F.col("n_rows").desc(), *[F.col(c) for c in key_cols]
    )
    return ordered.select(*key_cols, "n_rows").limit(k)


def read_srm(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    arm_col: str = "arm",
    expected_trt_ppm: int = 500_000,
) -> DataFrame:
    """Fold a maintained ``(*groups, arm, n_rows)`` assignment census
    through the exact sample-ratio-mismatch gate (operators/stats.py
    srm_from_census) — the streaming form of the ``events_srm_check``
    surface, and the one you actually want live: SRM is a LAUNCH-DAY
    alarm (broken assignment/logging shows up in the first hours and
    invalidates everything downstream), so the arm-split census is
    monitored as units stream in, and a late unit revises its cell —
    moving n, d and the chi-square — re-derived census-sized at read.
    """
    from ..operators.stats import srm_from_census

    census = Catalog(catalog_root).read(spark, table)
    return srm_from_census(
        census,
        group_cols=group_cols,
        arm_col=arm_col,
        count_col="n_rows",
        expected_trt_ppm=expected_trt_ppm,
    )


def read_post_strat_ate(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    stratum_col: str = "stratum",
) -> DataFrame:
    """Fold a maintained ``(*groups, stratum, arm, n_meas, sum_vq)``
    cell census through the exact post-stratification ATE
    (operators/stats.py post_strat_from_census) — the streaming form
    of the ``events_post_strat_ate`` surface: the confounding-corrected
    effect readout watched live as experiment units stream in.  A LATE
    unit revises ONE cell, which moves its stratum's mean, the
    stratum's weight AND the group's weighted ATE — cross-stratum
    damage only the census fold re-derives.  Project the stream
    through ``operators.stats.post_strat_census_projection`` and
    maintain with ``stream_census(..., key_cols=[*groups, stratum,
    "arm"], sum_cols={"n_meas": "__meas", "sum_vq": "__vq"})``."""
    from ..operators.stats import post_strat_from_census

    census = Catalog(catalog_root).read(spark, table)
    return post_strat_from_census(
        census, group_cols=group_cols, stratum_col=stratum_col
    )


def read_cuped_ate(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
) -> DataFrame:
    """Fold a maintained per-(group, arm) cross-moment census through
    the exact CUPED variance-reduced ATE (operators/stats.py
    cuped_from_census) — the streaming form of the ``events_cuped_ate``
    surface: counts and the four moment sums (y, x, xy, xx) all ADD,
    so theta = cov(x,y)/var(x), both arm means and the adjusted
    readout re-derive from TWO census rows per group.  A late unit
    revises one arm's moments, which moves theta (pooled across arms!)
    and therefore the adjustment of BOTH arms — exactly the cross-arm
    coupling bounded incremental state cannot express.  Project the
    stream through ``operators.stats.cuped_census_projection`` and
    maintain with ``stream_census(..., key_cols=[*groups, "arm"],
    sum_cols={"sum_y": "__y", "sum_x": "__x", "sum_xy": "__xy",
    "sum_xx": "__xx"})``; the maintainer's n_rows IS the pair count."""
    from ..operators.stats import cuped_from_census

    census = Catalog(catalog_root).read(spark, table)
    return cuped_from_census(census, group_cols=group_cols)


def read_ohlc(
    spark,
    catalog_root: str,
    *,
    table: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a maintained extremum census to exact OHLC candlesticks
    (operators/timeseries.py ohlc_from_census) — the streaming form of
    the ``events_ohlc`` surface, and the op that MOTIVATED the r13
    min/max census extension: open/close are first/last by a total
    order, which no bounded incremental state can maintain under late
    data — but ``min(struct(ts, tie, value))`` is associative, so the
    maintainer pays one struct per (key, bucket) and a late tick
    revises open/close only when it actually precedes/follows the
    current extremum (the correct semantics, for free).  Project the
    stream through ``operators.timeseries.ohlc_census_projection`` and
    maintain with ``stream_census(..., min_cols={"__lo": "__v",
    "__first": "__ord"}, max_cols={"__hi": "__v", "__last": "__ord"})``.
    """
    from ..operators.timeseries import ohlc_from_census

    census = Catalog(catalog_root).read(spark, table)
    return ohlc_from_census(census, key_cols=key_cols)


def read_table_profile(
    spark,
    catalog_root: str,
    *,
    table: str,
    string_cols: list[str],
) -> DataFrame:
    """Fold a maintained per-column profile census to the batch
    profiler's shape minus n_distinct (operators/profile.py
    profile_from_census) — live data-quality monitoring over an
    ingest stream: null rates, empty-string counts and length extrema
    per column, exactly-once, with late rows revising their column
    rows (the r13 min/max census extension carries the extrema; exact
    distincts have no associative form — compose the KMV/HLL sketch
    maintainers for a live estimate).  Project the stream through
    ``operators.profile.profile_census_projection`` and maintain with
    ``stream_census(..., key_cols=["column_name"],
    sum_cols={"n_nulls": "__null", "n_empty": "__empty"},
    min_cols={"min_len": "__len"}, max_cols={"max_len": "__len"})``.
    """
    from ..operators.profile import profile_from_census

    census = Catalog(catalog_root).read(spark, table)
    return profile_from_census(census, string_cols=string_cols)


def read_kruskal_wallis(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    arm_col: str = "arm",
    value_col: str = "value",
) -> DataFrame:
    """Fold a maintained ``(*groups, arm, value, n_rows)`` census
    through the exact Kruskal-Wallis omnibus (operators/stats.py
    kruskal_wallis_from_census) — the streaming form of the
    ``events_kruskal_wallis`` surface: the k-arm metric experiment
    watched live as units stream in.  A LATE unit revises one census
    cell, which moves EVERY value's midrank above it, every arm's rank
    sum and the tie correction — re-derived census-sized at read (no
    bounded incremental state can hold a midrank).  Project the stream
    to (groups, arm, quantized value) and maintain with
    ``stream_census(..., key_cols=[*groups, arm, value])``."""
    from ..operators.stats import kruskal_wallis_from_census

    census = Catalog(catalog_root).read(spark, table)
    return kruskal_wallis_from_census(
        census,
        group_cols=group_cols,
        arm_col=arm_col,
        value_col=value_col,
        count_col="n_rows",
    )


def read_nelson_aalen(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str] | None = None,
    duration_col: str = "duration",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fold a maintained ``(*groups, duration, n_rows, n_events)``
    subject census through the exact Nelson-Aalen cumulative hazard
    (operators/survival.py nelson_aalen_from_census) — the streaming
    form of the ``user_churn_hazard`` surface: the churn hazard curve
    kept live as subjects resolve.  A LATE subject revises one census
    row, which moves n_risk for every EARLIER duration's term — the
    at-risk coupling only the census fold re-derives.  Maintain with
    ``stream_census(..., key_cols=[*groups, duration],
    sum_cols={"n_events": "<event flag>"})``; censored-at-duration
    counts are ``n_rows − n_events`` by construction."""
    from ..operators.survival import nelson_aalen_from_census

    census = Catalog(catalog_root).read(spark, table)
    return nelson_aalen_from_census(
        census.withColumn(
            "__cens", F.col("n_rows") - F.col("n_events")
        ),
        group_cols=group_cols,
        duration_col=duration_col,
        events_col="n_events",
        censored_col="__cens",
        scale=scale,
    )


def read_log_rank(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str] | None = None,
    duration_col: str = "duration",
    arm_col: str = "arm",
) -> DataFrame:
    """Fold a maintained ``(*groups, duration, arm, n_rows, n_events)``
    census through the exact two-sample log-rank test
    (operators/survival.py log_rank_from_census) — the streaming form
    of the ``user_churn_logrank`` surface, and the one a retention
    experiment actually wants: the censoring-correct arm comparison
    monitored live as subjects churn or age, exactly-once, with a late
    subject revising one cell and the O/E/V sums re-deriving
    census-sized at read.  Maintain with ``stream_census(...,
    key_cols=[*groups, duration, arm],
    sum_cols={"n_events": "<event flag>"})``."""
    from ..operators.survival import log_rank_from_census

    census = Catalog(catalog_root).read(spark, table)
    return log_rank_from_census(
        census,
        group_cols=group_cols,
        duration_col=duration_col,
        arm_col=arm_col,
        total_col="n_rows",
        events_col="n_events",
    )


def read_cmh(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    stratum_col: str = "stratum",
    arm_col: str = "arm",
    conv_col: str = "n_conv",
) -> DataFrame:
    """Fold a maintained ``(*groups, stratum, arm, n_rows, n_conv)``
    cell census through the exact Cochran-Mantel-Haenszel test + MH
    pooled odds ratio (operators/stats.py cmh_from_census) — the
    streaming form of the ``events_cmh_test`` surface: the
    confounding-controlled conversion experiment monitored live.  A
    LATE unit revises one cell, which moves its stratum's E and V and
    the POOLED sums — re-derived census-sized at read.  Maintain with
    ``stream_census(..., key_cols=[*groups, stratum, arm],
    sum_cols={"n_conv": "<0/1 outcome>"})``."""
    from ..operators.stats import cmh_from_census

    census = Catalog(catalog_root).read(spark, table)
    arm = F.col(arm_col)
    arm_ok = F.when(
        arm.isNotNull() & arm.cast("bigint").isin(0, 1),
        arm.cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit("read_cmh: arm must be 0/1 and non-NULL")
        ).cast("bigint")
    )
    conv = F.col(conv_col).cast("bigint")
    non = F.col("n_rows").cast("bigint") - conv
    wide = (
        census.withColumn("__arm", arm_ok)
        .groupBy(*group_cols, F.col(stratum_col).alias("__stratum"))
        .agg(
            F.sum(F.when(F.col("__arm") == 1, conv).otherwise(0))
            .cast("bigint")
            .alias("__a"),
            F.sum(F.when(F.col("__arm") == 1, non).otherwise(0))
            .cast("bigint")
            .alias("__b"),
            F.sum(F.when(F.col("__arm") == 0, conv).otherwise(0))
            .cast("bigint")
            .alias("__c"),
            F.sum(F.when(F.col("__arm") == 0, non).otherwise(0))
            .cast("bigint")
            .alias("__d"),
        )
    )
    return cmh_from_census(wide, group_cols=group_cols)


def read_anova(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
) -> DataFrame:
    """Fold a maintained ``(*groups, arm, n_rows, sum_vq, sumsq_vq)``
    moment census through the exact one-way ANOVA F + eta²
    (operators/stats.py anova_from_census) — the streaming form of the
    ``events_anova_f`` surface: the parametric mean-shift omnibus
    monitored live next to read_kruskal_wallis' rank form.  A LATE
    unit revises one arm's moments, which moves the grand mean and
    every arm's between-group term — re-derived census-sized at read.
    Project the stream to (groups, arm, vq) with NULL values dropped
    and maintain with ``stream_census(..., key_cols=[*groups, arm],
    sum_cols={"sum_vq": "vq", "sumsq_vq": "<vq*vq>"})``."""
    from ..operators.stats import anova_from_census

    census = Catalog(catalog_root).read(spark, table)
    return anova_from_census(
        census,
        group_cols=group_cols,
        count_col="n_rows",
        sum_col="sum_vq",
        sumsq_col="sumsq_vq",
    )
