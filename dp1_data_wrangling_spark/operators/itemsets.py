"""Frequent-pair mining (apriori level 2) — co-occurrence census with
support pruning.

The market-basket primitive behind "words that appear together",
product-affinity, and tag-correlation analyses: for baskets of items,
count the baskets containing each unordered item PAIR, keeping only
pairs of individually-frequent items.  The apriori property (a frequent
pair's items are both frequent) makes the level-1 prune lossless for
the level-2 census, and it is what keeps the pair explosion bounded:
pairs are generated per basket from the CAPPED frequent-item list, never
from the raw item stream.

Engine extension — the reference (exporter.py:75-141) has no mining
tier.

Scale posture (100 TB): four narrow shuffles — the (basket, item)
distinct, the item census (map-side combinable), the per-basket cap
window, and the pair census (map-side combinable); the frequent-item
prune is a broadcast semi-join while the frequent vocabulary is
catalog-sized.  The blow-up valve is ``max_items_per_basket``: pair
volume is bounded by baskets x cap²/2 regardless of basket skew, and
the cap is DETERMINISTIC (lexicographically first items win) so results
are partitioning-independent and SQL-replayable — a capped basket is a
documented semantic, not silent truncation.  A hot ITEM costs nothing
extra (pairs are keyed by basket, never by item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_pairs(
    items: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
    max_items_per_basket: int,
) -> DataFrame:
    """Unordered frequent item pairs: ``(item_a < item_b, n_baskets)``
    over baskets of distinct items, pruned to items appearing in at
    least ``min_item_support`` baskets and pairs co-occurring in at
    least ``min_pair_support``.  NULL items are excluded.  Per basket,
    only the lexicographically first ``max_items_per_basket`` frequent
    items generate pairs (the deterministic blow-up valve)."""
    if min_item_support < 1 or min_pair_support < 1:
        raise ValueError(
            "min_item_support and min_pair_support must be >= 1, got "
            f"{min_item_support}, {min_pair_support}"
        )
    if max_items_per_basket < 2:
        raise ValueError(
            f"max_items_per_basket must be >= 2 (pairs need two), got "
            f"{max_items_per_basket}"
        )
    # Checkpoint the distinct basket-item set ONCE: it feeds both the
    # item-frequency census and the prune+cap branch, and without the
    # cut Spark re-derives the whole upstream (tokenize + distinct of
    # the full corpus) per consumer — the same multi-reference lesson as
    # connected_components' edge set.
    basket_items = (
        items.filter(F.col(item_col).isNotNull())
        .select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    frequent = (
        basket_items.groupBy("__i")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_item_support)
        .select("__i")
    )
    pruned = basket_items.join(F.broadcast(frequent), "__i")
    capped = (
        pruned.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__b").orderBy("__i")
            ),
        )
        .filter(F.col("__rn") <= max_items_per_basket)
        .select("__b", "__i")
    )
    # Pair generation is ROW-LOCAL: collect each basket's capped items
    # into a sorted array (the groupBy is satisfied by the cap window's
    # partitioning — no extra shuffle) and explode the i<j combinations
    # JVM-side.  A self-join on basket id would reference `capped` twice
    # and recompute the whole distinct+prune+window subtree per branch
    # (9 shuffles vs this form's 4); the cap bounds the explosion at
    # C(max_items_per_basket, 2) rows per basket.
    baskets = capped.groupBy("__b").agg(
        F.array_sort(F.collect_list("__i")).alias("__items")
    )
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(__items, (x, i) -> transform("
                "slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS item_a, y AS item_b)))"
            )
        )
    ).alias("__p")
    return (
        baskets.select(pair)
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_pair_support)
    )


def association_rules(
    items: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
    max_items_per_basket: int,
    min_confidence_milli: int = 0,
) -> DataFrame:
    """Directed association rules A -> B with exact integer metrics —
    the Agrawal-Srikant market-basket output (public literature) on top
    of the level-2 census:

        support_milli    = 1000 * n_ab div N
        confidence_milli = 1000 * n_ab div n_a
        lift_milli       = (1000 * n_ab * N) div (n_a * n_b)

    Every statistic — N (total baskets), item supports n_a/n_b and the
    pair support n_ab — is computed over the SAME pruned+capped basket
    view (items in >= ``min_item_support`` baskets; per basket the
    lexicographically first ``max_items_per_basket`` frequent items),
    so the metrics are mutually consistent: confidence_milli <= 1000
    always, and a capped basket is one documented semantic applied
    everywhere, not a silent inconsistency between numerator and
    denominator censuses.  Truncating ``div`` replays exactly in SQL.

    Returns one row PER DIRECTION: ``(antecedent, consequent, n_ab,
    n_a, n_b, n_baskets, support_milli, confidence_milli,
    lift_milli)``, filtered to ``n_ab >= min_pair_support`` and
    ``confidence_milli >= min_confidence_milli``.

    Scale posture (100 TB): the frequent_pairs shuffle budget (distinct
    + two combinable censuses + one cap window) plus one broadcast of
    the one-row basket total and one broadcast item-census join — the
    item census is vocabulary-sized.  Overflow: ``1000 * n_ab * N`` is
    guarded in DOUBLE against 2^62 (executor fail-fast threaded into
    the consumed count column), covering corpora to ~2e15 basket-pairs.
    """
    if min_confidence_milli < 0 or min_confidence_milli > 1000:
        raise ValueError(
            f"min_confidence_milli must be in [0, 1000], got "
            f"{min_confidence_milli}"
        )
    if min_item_support < 1 or min_pair_support < 1:
        raise ValueError(
            "min_item_support and min_pair_support must be >= 1, got "
            f"{min_item_support}, {min_pair_support}"
        )
    if max_items_per_basket < 2:
        raise ValueError(
            f"max_items_per_basket must be >= 2 (pairs need two), got "
            f"{max_items_per_basket}"
        )
    basket_items = (
        items.filter(F.col(item_col).isNotNull())
        .select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    frequent = (
        basket_items.groupBy("__i")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_item_support)
        .select("__i")
    )
    capped = (
        basket_items.join(F.broadcast(frequent), "__i")
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__b").orderBy("__i")),
        )
        .filter(F.col("__rn") <= max_items_per_basket)
        .select("__b", "__i")
        .localCheckpoint(eager=True)
    )
    total = capped.agg(
        F.countDistinct("__b").cast("bigint").alias("n_baskets")
    )
    item_counts = capped.groupBy("__i").agg(
        F.count("*").cast("bigint").alias("__cnt")
    )
    baskets = capped.groupBy("__b").agg(
        F.array_sort(F.collect_list("__i")).alias("__items")
    )
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(__items, (x, i) -> transform("
                "slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS ia, y AS ib)))"
            )
        )
    ).alias("__p")
    pairs = (
        baskets.select(pair)
        .select("__p.ia", "__p.ib")
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_support)
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias("antecedent"),
                    F.col("ib").alias("consequent"),
                ),
                F.struct(
                    F.col("ib").alias("antecedent"),
                    F.col("ia").alias("consequent"),
                ),
            )
        ).alias("__d"),
        "n_ab",
    ).select("__d.antecedent", "__d.consequent", "n_ab")
    with_counts = (
        directed.join(
            F.broadcast(
                item_counts.select(
                    F.col("__i").alias("antecedent"),
                    F.col("__cnt").alias("n_a"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("__i").alias("consequent"),
                    F.col("__cnt").alias("n_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
    )
    env = (
        F.lit(1000.0)
        * F.col("n_ab").cast("double")
        * F.col("n_baskets").cast("double")
    )
    n_ab_ok = F.when(env <= F.lit(float(1 << 62)), F.col("n_ab")).otherwise(
        F.raise_error(
            F.lit(
                "association_rules: 1000 * n_ab * N exceeds 2^62 — the "
                "lift cross-multiply would wrap int64; sample baskets "
                "or shard the census"
            )
        ).cast("bigint")
    )
    return (
        with_counts.withColumn("__ab", n_ab_ok)
        .select(
            "antecedent",
            "consequent",
            F.col("__ab").alias("n_ab"),
            "n_a",
            "n_b",
            "n_baskets",
            F.expr("(1000 * __ab) div n_baskets").alias("support_milli"),
            F.expr("(1000 * __ab) div n_a").alias("confidence_milli"),
            F.expr("(1000 * __ab * n_baskets) div (n_a * n_b)").alias(
                "lift_milli"
            ),
        )
        .filter(F.col("confidence_milli") >= F.lit(min_confidence_milli))
    )
