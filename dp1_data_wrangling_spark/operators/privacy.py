"""Privacy-risk audits over tabular data (r13): k-anonymity and
l-diversity — the release-readiness screens a training-data pipeline
runs before shipping user-derived tables (GDPR/HIPAA-style
re-identification risk), next to the PII scanners in
``operators/text.py``.

Sweeney's k-anonymity: every row must be indistinguishable from at
least ``k - 1`` others on its QUASI-IDENTIFIER columns (the columns an
attacker can link from outside: zip, birth date, segment...).
Machanavajjhala's l-diversity strengthens it: each equivalence class
must also carry at least ``l`` distinct values of the SENSITIVE column
(a k-anonymous class whose members all share one diagnosis still leaks
it).

Both are pure census statements, so the audit is ONE map-side
combinable groupBy over the quasi-identifier key — no join, no window,
no collect — and the output is equivalence-class-sized (bounded by the
quasi-key cardinality, never rows).

Engine extension — the reference (export_dp1.py / import_dp1.py) has
no privacy tier; cited for provenance only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_div: int | None = None,
) -> DataFrame:
    """Equivalence-class audit: one row per distinct quasi-identifier
    combination with its class size, distinct-sensitive count and
    violation flags.

    Returns ``(*quasi_cols, class_size, n_sensitive,
    k_violation, l_violation)`` where ``class_size`` counts rows in
    the class, ``n_sensitive`` counts distinct non-NULL sensitive
    values (NULL when no ``sensitive_col`` is given), ``k_violation``
    is ``class_size < k`` and ``l_violation`` is ``n_sensitive <
    l_div`` (NULL when l-diversity is not requested).  NULL
    quasi-identifier values form classes like any other value (SQL
    GROUP BY semantics — an attacker can link on "missing" too).

    The dataset is k-anonymous iff no row has ``k_violation``;
    publish-gating on ``l_violation`` adds the homogeneity defense.

    Scale posture (100 TB): ONE combinable groupBy on the quasi key
    (count + count_distinct both partial-aggregate map-side); output
    is class-count-sized.  At very high quasi-key cardinality the
    census IS the risk report — every size-1 class is a direct
    re-identification.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if l_div is not None and l_div < 2:
        raise ValueError(f"l_div must be >= 2, got {l_div}")
    if l_div is not None and sensitive_col is None:
        raise ValueError("l_div requires sensitive_col")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("n_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    if sensitive_col is None:
        out = out.withColumn("n_sensitive", F.lit(None).cast("bigint"))
    return out.select(
        *quasi_cols,
        "class_size",
        "n_sensitive",
        (F.col("class_size") < k).alias("k_violation"),
        (
            (F.col("n_sensitive") < l_div).alias("l_violation")
            if l_div is not None
            else F.lit(None).cast("boolean").alias("l_violation")
        ),
    )


def anonymity_report(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_div: int | None = None,
) -> DataFrame:
    """One-row release-readiness summary over the class census:
    ``(n_rows, n_classes, min_class_size, n_k_violating_classes,
    n_rows_at_risk, risk_ppm, n_l_violating_classes)`` — the number a
    privacy officer reads (``risk_ppm`` = rows in sub-k classes per
    million).  Folds from :func:`k_anonymity`'s census — one more
    census-sized combinable aggregate, nothing row-sized."""
    census = k_anonymity(
        df,
        quasi_cols=quasi_cols,
        sensitive_col=sensitive_col,
        k=k,
        l_div=l_div,
    )
    agg = census.agg(
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.col("k_violation").cast("bigint"))
        .cast("bigint")
        .alias("n_k_violating_classes"),
        F.sum(
            F.when(F.col("k_violation"), F.col("class_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.sum(F.col("l_violation").cast("bigint"))
        .cast("bigint")
        .alias("n_l_violating_classes"),
    )
    return agg.select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_k_violating_classes",
        "n_rows_at_risk",
        F.when(
            F.col("n_rows") > 0,
            F.expr("(n_rows_at_risk * 1000000) div n_rows"),
        ).alias("risk_ppm"),
        "n_l_violating_classes",
    )
