"""Exact Kaplan-Meier survival estimation over a subject table.

The churn/retention question every event warehouse eventually asks —
"what fraction of users are still active t days after they arrive?" —
with the right-censoring handled properly: a user who is still active
when the observation window closes is CENSORED at their observed age,
not counted as churned (the classic KM correction; naive "percent
still here" curves are biased low).

Engine-exact by construction.  The KM estimator is a product of
rationals S(t) = prod_{t_i <= t} (n_i - d_i) / n_i — float products
are accumulation-order-dependent, so instead the survival level is
carried as an integer in ``scale`` units (default nano, 1e9) through a
STEPWISE truncating division:

    s_0 = scale
    s_i = s_{i-1} * (n_i - d_i) div n_i     (only where d_i > 0)

Both engines (this operator and the DuckDB recursive-CTE oracle)
replay the identical fold, so the result is bit-identical regardless
of partitioning.  The truncation bias per step is < 1 ulp of the scale
(≤ 1e-9 at nano) — stated convention, not noise.

Scale posture (100 TB): the subject table reduces to a (group,
duration) CENSUS in ONE combinable groupBy — the only data-sized
shuffle.  The per-group KM fold then runs over census rows (bounded by
the number of DISTINCT durations — days in the observation window —
not by subjects), as a row-local JVM ``aggregate`` fold over the
collected census array: the same census-decomposition stance as
``distributed_rank`` and ``grid_hotspots``.  No Python, no
single-partition exchange over subject-sized data.

Overflow contract: ``scale * n_risk`` must fit a signed 64-bit
integer; validated with an executor ``raise_error`` on the group
totals (fail fast, never silent wraparound).  At the default nano
scale that admits ~9.2e9 subjects per group.

Engine extension — the reference (exporter.py:75-141) has no survival
tier; the operator follows the Kaplan-Meier (1958) estimator as
presented in standard texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def km_survival(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Kaplan-Meier survival table from one row per subject.

    ``duration_col`` — non-negative BIGINT observed duration (time
    units are the caller's; days is typical).  ``event_col`` — 1 if
    the terminal event (churn/death) was OBSERVED at that duration,
    0 if the subject was right-censored there.  Both validated with
    executor fail-fasts.

    Returns one row per (group, distinct duration) in duration order:
    ``n_risk`` (subjects with duration >= t), ``n_events`` /
    ``n_censored`` at t, and ``survival_scaled`` — the KM level after
    processing t, in ``scale`` units (events processed before
    censorings at the same t, the standard convention).
    """
    if scale < 1:
        raise ValueError(f"scale must be positive, got {scale}")
    groups = group_cols or []
    for c in (duration_col, event_col):
        if c in groups:
            raise ValueError(f"column {c!r} cannot also be a group column")

    dur = F.col(duration_col).cast("bigint")
    ev = F.col(event_col).cast("bigint")
    checked = df.select(
        *groups,
        F.when(dur >= 0, dur)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("km_survival: negative duration "),
                    dur.cast("string"),
                )
            )
        )
        .alias("__t"),
        F.when(ev.isin(0, 1), ev)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("km_survival: event flag must be 0/1, got "),
                    ev.cast("string"),
                )
            )
        )
        .alias("__e"),
    )

    # the ONE data-sized shuffle: subjects -> (group, duration) census
    census = checked.groupBy(*groups, "__t").agg(
        F.sum("__e").alias("__d"),
        (F.count(F.lit(1)) - F.sum("__e")).alias("__c"),
    )

    # per-group fold over the census (bounded by distinct durations).
    # array_sort orders the structs by their first field (__t, distinct
    # within a group), so the fold walks durations ascending.
    n_cap = (1 << 62) // scale
    folded = census.groupBy(*groups).agg(
        F.sum(F.col("__d") + F.col("__c")).alias("__n"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__d", "__c"))
        ).alias("__rows"),
    )
    guarded = folded.withColumn(
        "__nok",
        F.when(F.col("__n") < F.lit(n_cap), F.col("__n")).otherwise(
            F.raise_error(
                F.lit(
                    f"km_survival: group has >= {n_cap} subjects — "
                    f"scale*n_risk would overflow 64-bit; lower scale"
                )
            )
        ),
    )
    # accumulator: (s = current survival level, rem = subjects still at
    # risk, out = emitted rows).  n_risk at a duration is `rem` BEFORE
    # removing that duration's events + censorings.  Written as one SQL
    # aggregate so the stepwise division is BIGINT `div` (Column `/` is
    # float division — inexact past 2^53, which scale*n_risk exceeds).
    fold = F.expr(
        f"""
        aggregate(
          __rows,
          struct(
            CAST({scale} AS BIGINT) AS s,
            __nok AS rem,
            CAST(array() AS
              array<struct<t:bigint,nr:bigint,d:bigint,c:bigint,s:bigint>>
            ) AS out),
          (acc, r) -> struct(
            CASE WHEN r.__d > 0
                 THEN (acc.s * (acc.rem - r.__d)) div acc.rem
                 ELSE acc.s END AS s,
            acc.rem - r.__d - r.__c AS rem,
            concat(acc.out, array(struct(
              r.__t AS t,
              acc.rem AS nr,
              r.__d AS d,
              r.__c AS c,
              CASE WHEN r.__d > 0
                   THEN (acc.s * (acc.rem - r.__d)) div acc.rem
                   ELSE acc.s END AS s))) AS out),
          acc -> acc.out
        )
        """
    )
    out = guarded.select(*groups, F.explode(fold).alias("__r"))
    return out.select(
        *groups,
        F.col("__r.t").alias("duration"),
        F.col("__r.nr").alias("n_risk"),
        F.col("__r.d").alias("n_events"),
        F.col("__r.c").alias("n_censored"),
        F.col("__r.s").alias("survival_scaled"),
    )
