"""Declarative data-quality expectation suite — Deequ/Great-Expectations
class, evaluated in ONE aggregate pass.

Ingest pipelines gate every new data drop on a rule suite ("doc_id is
unique", "lang is always one of …", "at least 99.9% of text non-null")
before it reaches training; the engine ships the check as a first-class
operator that turns a declarative rule list into a single wide
aggregate and a tidy verdict table — one row per rule, queryable and
joinable like any other dataset.

Engine extension — the reference (importer.py:33-126) trusts its
registry schema blindly; the closest reference behavior is the
write-once/idempotence guard, which is a key-level check, not a
content-quality gate.  The catalog tier's CHECK constraints
(plans/catalog.py) enforce row predicates at write time; this operator
is the complementary READ-side audit with ratio thresholds and a
machine-readable report.

Determinism (the driver hash-compares values): every metric is an
integer — ratios in milli (1000 * satisfied div population, truncating
div), counts raw — so the verdict table replays bit-exactly in a SQL
oracle.

Scale posture (100 TB): the whole suite is ONE aggregate job — every
rule lowers to associative combinable aggregates (count / conditional
count / min / max / count_distinct), so the map side reduces each
partition to a single row before a single-row shuffle.  Exact
uniqueness rules add the multi-DISTINCT Expand pass (k distinct columns
scan the input k+1 ways — the same documented trade as
``profile_table``); suites without ``unique`` rules stay a plain
one-pass scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES = ("not_null", "unique", "between", "in_set", "matches", "row_count")


def expectation_suite(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Evaluate declarative expectations against ``df`` in one pass.

    Each rule is a dict with ``rule`` (one of ``not_null``, ``unique``,
    ``between``, ``in_set``, ``matches``, ``row_count``) plus:

    - ``not_null``: ``column``, optional ``min_ratio_milli`` (default
      1000 — every row).  Metric: 1000 * non-null div rows.
    - ``unique``: ``column``.  Metric: 1000 * distinct div non-null
      (1000 iff all non-null values distinct); threshold fixed at 1000.
    - ``between``: ``column``, ``lo``, ``hi`` (inclusive numeric
      bounds), optional ``min_ratio_milli``.  Metric over NON-NULL
      values (pair with ``not_null`` to bound nulls).
    - ``in_set``: ``column``, ``allowed`` (list of strings), optional
      ``min_ratio_milli``.  Metric over non-null values.
    - ``matches``: ``column``, ``pattern`` (regexp, anchored by the
      caller), optional ``min_ratio_milli``.  Metric over non-null
      values.
    - ``row_count``: ``lo`` and/or ``hi``.  Metric: the raw row count.

    Returns one row per rule: ``(rule, column_name, metric, threshold,
    passed)`` — ``metric``/``threshold`` BIGINT (milli-ratios for ratio
    rules, raw counts for ``row_count``; threshold is the effective
    lower bound), ``passed`` BOOLEAN.  Ratio rules on an empty
    population (0 rows / all-NULL column) pass vacuously with metric
    1000 — emptiness itself is what ``row_count`` rules are for.
    """
    if not rules:
        raise ValueError("expectation_suite needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    # (rule_name, column, metric_expr_builder, threshold, passed_builder)
    projections = []

    def milli(num_col: str, den_col: str):
        # 1000 * num div den, truncating; vacuous 1000 when den == 0
        return F.when(F.col(den_col) == 0, F.lit(1000).cast("bigint")).otherwise(
            F.expr(f"(1000 * {num_col}) div {den_col}")
        )

    for i, r in enumerate(rules):
        kind = r.get("rule")
        if kind not in _RULES:
            raise ValueError(f"unknown rule {kind!r}; expected one of {_RULES}")
        col = r.get("column")
        if kind != "row_count":
            if not col:
                raise ValueError(f"rule {kind!r} needs a column")
            if col not in df.columns:
                raise ValueError(f"rule {kind!r}: unknown column {col!r}")
        if kind == "row_count":
            lo = r.get("lo")
            hi = r.get("hi")
            if lo is None and hi is None:
                raise ValueError("row_count needs lo and/or hi")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("__n") >= F.lit(int(lo)))
            if hi is not None:
                cond = cond & (F.col("__n") <= F.lit(int(hi)))
            projections.append(
                (
                    "row_count",
                    None,
                    F.col("__n").cast("bigint"),
                    F.lit(int(lo) if lo is not None else 0).cast("bigint"),
                    cond,
                )
            )
            continue

        thr = int(r.get("min_ratio_milli", 1000))
        if kind == "not_null":
            aggs.append(F.count(F.col(col)).alias(f"__nn_{i}"))
            metric = milli(f"__nn_{i}", "__n")
        elif kind == "unique":
            aggs.append(F.count(F.col(col)).alias(f"__nn_{i}"))
            aggs.append(F.count_distinct(F.col(col)).alias(f"__nd_{i}"))
            metric = milli(f"__nd_{i}", f"__nn_{i}")
            thr = 1000
        else:
            if kind == "between":
                lo, hi = r["lo"], r["hi"]
                ok = F.col(col).between(F.lit(lo), F.lit(hi))
            elif kind == "in_set":
                allowed = r["allowed"]
                if not allowed:
                    raise ValueError("in_set needs a non-empty allowed list")
                ok = F.col(col).isin(list(allowed))
            else:  # matches
                ok = F.col(col).rlike(r["pattern"])
            aggs.append(F.count(F.col(col)).alias(f"__nn_{i}"))
            aggs.append(
                F.count(F.when(F.col(col).isNotNull() & ok, 1)).alias(
                    f"__ok_{i}"
                )
            )
            metric = milli(f"__ok_{i}", f"__nn_{i}")
        projections.append(
            (kind, col, metric, F.lit(thr).cast("bigint"), metric >= F.lit(thr))
        )

    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(kind).alias("rule"),
            (F.lit(col) if col is not None else F.lit(None)).cast("string").alias(
                "column_name"
            ),
            metric.alias("metric"),
            thr_col.alias("threshold"),
            passed.alias("passed"),
        )
        for kind, col, metric, thr_col, passed in projections
    ]
    return one.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def fk_orphan_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across fact→dimension relations
    (r13) — the warehouse-health staple next to the declarative rule
    suite above: per relation, how many fact rows point at a key the
    dimension does not carry (orphans), in exact ppm.

    ``relations`` is ``[(name, fact_df, fk_col, dim_df, pk_col), ...]``.
    NULL foreign keys are reported separately (``n_null_fk``) — a NULL
    FK is a modeling decision, not an orphan — and excluded from the
    orphan count and rate denominator.

    Returns one row per relation: ``(relation, n_rows, n_null_fk,
    n_orphans, orphan_ppm)`` with ``orphan_ppm`` NULL when no non-NULL
    FK rows exist.

    Scale posture (100 TB): per relation one left-anti join on the key
    (broadcastable when the dimension's DISTINCT key set is small —
    the distinct() keeps the build side key-sized) + combinable
    counts; the per-relation one-row frames union at the end
    (relation-count-sized).  No window, no collect.
    """
    if not relations:
        raise ValueError("relations must be non-empty")
    names = [r[0] for r in relations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate relation names: {names}")
    outs = []
    for name, fact, fk_col, dim, pk_col in relations:
        keys = dim.select(F.col(pk_col).alias("__pk")).distinct()
        base = fact.select(F.col(fk_col).alias("__fk"))
        counts = base.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count(F.when(F.col("__fk").isNull(), F.lit(1)))
            .cast("bigint")
            .alias("n_null_fk"),
        )
        orphans = (
            base.filter(F.col("__fk").isNotNull())
            .join(keys, F.col("__fk") == F.col("__pk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        outs.append(
            counts.crossJoin(F.broadcast(orphans)).select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_null_fk",
                "n_orphans",
                F.when(
                    (F.col("n_rows") - F.col("n_null_fk")) > 0,
                    F.expr(
                        "(n_orphans * 1000000) div (n_rows - n_null_fk)"
                    ),
                ).alias("orphan_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
