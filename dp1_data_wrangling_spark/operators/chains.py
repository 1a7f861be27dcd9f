"""Collection-chain flattening (SURVEY.md §2.4 J6).

Reference semantics (exporter.py:114-120, 163-165): CHAINED collections
hold an ordered child list; searches operate over the flattened ordered
leaves.  Chains are tiny (catalog metadata), so the reference recurses in
the driver — and so do we: a driver-side BFS over a collected DataFrame is
the idiomatic Spark shape for a sub-thousand-row catalog (collecting a
catalog is not the anti-pattern; collecting fact data is).

For completeness an iterative self-join fixpoint (`flatten_chains_distributed`)
is provided for pathological catalogs that would not fit the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import local_df


def flatten_chain_driver(
    chains: list[tuple[str, str, int]],
    collection_types: dict[str, str],
    root: str,
) -> list[str]:
    """Depth-first ordered expansion of one chain to its leaf collections.

    `chains` rows are (parent, child, position).  Children of each parent
    are visited in position order; CHAINED children are expanded in place
    (the reference's flatten_chains=True).  Cycles raise.
    """
    children: dict[str, list[tuple[int, str]]] = {}
    for parent, child, pos in chains:
        children.setdefault(parent, []).append((pos, child))
    for v in children.values():
        v.sort()

    out: list[str] = []
    seen: set[str] = set()

    def walk(name: str, stack: tuple[str, ...]) -> None:
        if name in stack:
            raise ValueError(f"collection chain cycle at {name!r}")
        if collection_types.get(name) == "CHAINED":
            for _, child in children.get(name, []):
                walk(child, stack + (name,))
        elif name not in seen:
            seen.add(name)
            out.append(name)

    walk(root, ())
    return out


def flatten_chains(
    spark: SparkSession,
    collection_chains: DataFrame,
    collections: DataFrame,
    root: str,
) -> DataFrame:
    """Flatten one chain into an ordered (child, position) DataFrame."""
    chains = [
        (r["parent"], r["child"], r["position"]) for r in collection_chains.collect()
    ]
    types = {r["name"]: r["type"] for r in collections.collect()}
    leaves = flatten_chain_driver(chains, types, root)
    return local_df(
        spark, [(name, i) for i, name in enumerate(leaves)], "child string, position int"
    )


def flatten_chains_distributed(
    collection_chains: DataFrame, root: str, max_depth: int = 32
) -> DataFrame:
    """Iterative self-join fixpoint expansion (for huge catalogs only).

    Position is rebuilt per level as parent_position * 1e6 + child_position
    to preserve depth-first order without driver recursion.
    """
    frontier = collection_chains.filter(F.col("parent") == root).select(
        "child", F.col("position").cast("long").alias("position")
    )
    result = frontier
    for _ in range(max_depth):
        expanded = (
            result.alias("r")
            .join(
                collection_chains.alias("c"),
                F.col("r.child") == F.col("c.parent"),
                "inner",
            )
            .select(
                F.col("c.child").alias("child"),
                (
                    F.col("r.position") * F.lit(1_000_000)
                    + F.col("c.position").cast("long")
                ).alias("position"),
            )
        )
        if expanded.isEmpty():
            break
        parents = collection_chains.select(F.col("parent").alias("child")).distinct()
        result = result.join(parents, "child", "left_anti").unionByName(expanded)
    return result
