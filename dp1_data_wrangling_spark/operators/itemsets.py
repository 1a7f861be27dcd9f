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
