"""Label-quality evaluation: exact confusion-matrix classification
reports and Cohen's-kappa inter-rater agreement.

The model-eval tier's fixed-threshold leg: `roc_curve` sweeps the
threshold, `calibration_curve` audits the probabilities, and this
module grades the HARD labels — the per-class precision/recall/F1
report every classifier eval prints, and the chance-corrected
agreement score every labeling campaign (human raters, LLM judges,
weak-supervision voters) is accepted or rejected on.

Engine extension — the reference (exporter.py:75-141) has no
evaluation tier; cited for provenance only.

Everything is exact integer arithmetic over a CONFUSION CENSUS — one
row per (group, actual, predicted) with its count — so both engines
replay the same fold bit-for-bit:

- ``precision_ppm = tp * 1e6 div (tp + fp)`` (NULL when never
  predicted), ``recall_ppm = tp * 1e6 div (tp + fn)`` (NULL when no
  support), ``f1_ppm = 2 * tp * 1e6 div (2*tp + fp + fn)`` — the
  harmonic mean collapses to one truncating division of integers, no
  intermediate rates needed.
- ``kappa_ppm = (n*agree - S) * 1e6 / (n*n - S)`` with
  ``S = sum_c rowsum_c * colsum_c`` — the (po - pe)/(1 - pe) identity
  cleared of denominators; kappa is legitimately NEGATIVE (worse than
  chance), so the division is sign-split truncate-toward-zero (the
  uplift_curve lesson: Spark ``div`` and DuckDB ``//`` disagree on
  negative numerators).

Scale posture (100 TB): ONE data-sized combinable groupBy builds the
census; every later step (class explode, marginal products, group
fold) is census-sized — bounded by |groups| x |classes|^2, never by
rows.  No window over data, no join against data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"
_PPM = 1_000_000


def _required_str(col: str, what: str) -> F.Column:
    """NULL label fail-fast: a row with no label has no cell."""
    return F.when(F.col(col).isNotNull(), F.col(col).cast("string")).otherwise(
        F.raise_error(
            F.lit(
                f"{what}: NULL {col} — a row without a label has no "
                "confusion cell; filter upstream"
            )
        ).cast("string")
    )


def confusion_census(
    df: DataFrame,
    *,
    actual_col: str,
    predicted_col: str,
    group_cols: list[str],
) -> DataFrame:
    """One combinable groupBy: (group, actual, predicted) -> n_pairs.

    The census both report folds below consume; exposed so callers can
    materialize it once (it is the only data-sized pass).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    for c in (actual_col, predicted_col):
        if c in group_cols:
            raise ValueError(f"{c} cannot also be a group column")
    return (
        df.select(
            *group_cols,
            _required_str(actual_col, "confusion_census").alias("__a"),
            _required_str(predicted_col, "confusion_census").alias("__p"),
        )
        .groupBy(*group_cols, "__a", "__p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )


def classification_report(
    df: DataFrame,
    *,
    actual_col: str,
    predicted_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-(group, class) tp/fp/fn + exact precision/recall/F1 ppm.

    Each census row (a, p, n) contributes to class ``a`` (as tp when
    a == p, else fn) and to class ``p`` (as fp when p != a) — a
    census-sized two-way explode, then ONE census-sized combinable
    groupBy per (group, class).  ``precision_ppm`` is NULL for a class
    never predicted, ``recall_ppm`` NULL for a class with no support
    (it can still appear via fp), ``f1_ppm`` NULL only when the class
    has neither; all three divisions have non-negative operands so
    plain truncating ``div`` replays in both engines.
    """
    census = confusion_census(
        df,
        actual_col=actual_col,
        predicted_col=predicted_col,
        group_cols=group_cols,
    )
    return classification_report_from_census(census, group_cols=group_cols)


def classification_report_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    actual_col: str = "__a",
    predicted_col: str = "__p",
    count_col: str = "__n",
) -> DataFrame:
    """The census-sized fold `classification_report` and its streaming
    twin (streaming/census.py read_classification_report) share —
    the confusion census is associative (counts add), so a maintained
    census folds to the identical report however the stream was cut.
    """
    census = census.select(
        *group_cols,
        F.col(actual_col).alias("__a"),
        F.col(predicted_col).alias("__p"),
        F.col(count_col).cast("bigint").alias("__n"),
    )
    as_actual = F.struct(
        F.col("__a").alias("label_class"),
        F.when(F.col("__a") == F.col("__p"), F.col("__n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("tp"),
        F.lit(0).cast("bigint").alias("fp"),
        F.when(F.col("__a") != F.col("__p"), F.col("__n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("fn"),
    )
    as_predicted = F.struct(
        F.col("__p").alias("label_class"),
        F.lit(0).cast("bigint").alias("tp"),
        F.col("__n").cast("bigint").alias("fp"),
        F.lit(0).cast("bigint").alias("fn"),
    )
    contrib = census.select(
        *group_cols,
        F.explode(
            F.when(
                F.col("__a") == F.col("__p"), F.array(as_actual)
            ).otherwise(F.array(as_actual, as_predicted))
        ).alias("__c"),
    ).select(*group_cols, "__c.*")
    folded = contrib.groupBy(*group_cols, "label_class").agg(
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("fp").cast("bigint").alias("fp"),
        F.sum("fn").cast("bigint").alias("fn"),
    )
    return folded.select(
        *group_cols,
        "label_class",
        "tp",
        "fp",
        "fn",
        (F.col("tp") + F.col("fn")).cast("bigint").alias("support"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr(f"(cast(tp as {_D}) * {_PPM}) div (tp + fp)").cast(
                "bigint"
            ),
        ).alias("precision_ppm"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr(f"(cast(tp as {_D}) * {_PPM}) div (tp + fn)").cast(
                "bigint"
            ),
        ).alias("recall_ppm"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.expr(
                f"(cast(tp as {_D}) * {2 * _PPM}) div (2 * tp + fp + fn)"
            ).cast("bigint"),
        ).alias("f1_ppm"),
    )


def cohens_kappa(
    df: DataFrame,
    *,
    rater_a_col: str,
    rater_b_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Exact Cohen's kappa per group, chance-corrected agreement.

    From the confusion census: ``n`` items, ``agree`` diagonal mass,
    per-class marginals ``rowsum_c`` (rater a) and ``colsum_c``
    (rater b), and ``S = sum_c rowsum_c * colsum_c`` (DECIMAL(38,0)
    cross products — exact far past any census this engine can hold).
    Then

        po_ppm    = agree * 1e6 div n
        pe_ppm    = S * 1e6 div n^2
        kappa_ppm = (n*agree - S) * 1e6 / (n*n - S)   [sign-split]

    ``kappa_ppm`` is NULL when pe == 1 (n*n == S: both raters constant
    — agreement is undefined, never faked as 0 or 1).  The marginal
    product needs classes present for BOTH raters only — a full outer
    on the class key would add zero terms, so the inner join is exact.

    Scale posture: the census groupBy is the only data-sized pass; the
    two marginal folds, their |classes|-sized join and the final group
    fold are all census-sized.
    """
    census = confusion_census(
        df,
        actual_col=rater_a_col,
        predicted_col=rater_b_col,
        group_cols=group_cols,
    )
    return cohens_kappa_from_census(census, group_cols=group_cols)


def cohens_kappa_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    rater_a_col: str = "__a",
    rater_b_col: str = "__p",
    count_col: str = "__n",
) -> DataFrame:
    """The census-sized fold `cohens_kappa` and its streaming twin
    share (streaming/census.py read_cohens_kappa): a late rating
    revises one (a, b) cell, which moves n, the marginals and S — the
    fold re-derives all of it from the maintained census.
    """
    census = census.select(
        *group_cols,
        F.col(rater_a_col).alias("__a"),
        F.col(rater_b_col).alias("__p"),
        F.col(count_col).cast("bigint").alias("__n"),
    )
    census = census.localCheckpoint(eager=False)  # 3 census-sized consumers
    totals = census.groupBy(*group_cols).agg(
        F.sum("__n").cast("bigint").alias("n_items"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__p"), F.col("__n"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    marg_a = census.groupBy(*group_cols, "__a").agg(
        F.sum("__n").cast(_D).alias("__ra")
    ).withColumnRenamed("__a", "__cls")
    marg_b = census.groupBy(*group_cols, "__p").agg(
        F.sum("__n").cast(_D).alias("__cb")
    ).withColumnRenamed("__p", "__cls")
    s = (
        marg_a.join(marg_b, on=[*group_cols, "__cls"], how="inner")
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.sum((F.col("__ra") * F.col("__cb")).cast(_D)), F.lit(0)
            )
            .cast(_D)
            .alias("__s")
        )
    )
    out = (
        totals.join(s, on=group_cols, how="inner")
        .withColumn(
            "__knum",
            (
                F.col("n_items").cast(_D) * F.col("n_agree").cast(_D)
                - F.col("__s")
            ).cast(_D)
            * F.lit(_PPM).cast(_D),
        )
        .withColumn(
            "__kden",
            (
                F.col("n_items").cast(_D) * F.col("n_items").cast(_D)
                - F.col("__s")
            ).cast(_D),
        )
    )
    kappa = F.when(
        F.col("__kden") > 0,
        F.when(
            F.col("__knum") >= 0, F.expr("__knum div __kden")
        ).otherwise(-F.expr("(-__knum) div __kden")),
    ).cast("bigint")
    return out.select(
        *group_cols,
        "n_items",
        "n_agree",
        F.expr(f"(cast(n_agree as {_D}) * {_PPM}) div n_items")
        .cast("bigint")
        .alias("po_ppm"),
        F.expr(f"(__s * {_PPM}) div (cast(n_items as {_D}) * n_items)")
        .cast("bigint")
        .alias("pe_ppm"),
        kappa.alias("kappa_ppm"),
    )
