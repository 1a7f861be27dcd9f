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

from pyspark.sql import DataFrame, SparkSession, Window
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

    Depth-first order is tracked as a lexicographically-ordered *path
    vector* (array<int> of positions root→leaf) — exact at any depth,
    unlike scalar encodings (parent*K + child overflows int64 at depth 4
    and misorders leaves at unequal depths).  First-occurrence-wins dedup
    = min path per leaf; final positions = rank over the path order.
    Cycles (or depth > max_depth) raise, matching ``flatten_chain_driver``.
    Lineage is cut per level (localCheckpoint) so depth-d expansion is d
    joins, not d² re-executions."""
    parents = collection_chains.select(F.col("parent").alias("child")).distinct()
    frontier = collection_chains.filter(F.col("parent") == root).select(
        "child", F.array(F.col("position")).alias("__path")
    )
    leaves = None
    for _ in range(max_depth + 1):
        new_leaves = frontier.join(parents, "child", "left_anti")
        leaves = (
            new_leaves if leaves is None else leaves.unionByName(new_leaves)
        ).localCheckpoint(eager=True)
        frontier = (
            frontier.alias("r")
            .join(parents, "child", "left_semi")
            .join(
                collection_chains.alias("c"),
                F.col("r.child") == F.col("c.parent"),
                "inner",
            )
            .select(
                F.col("c.child").alias("child"),
                F.concat(F.col("r.__path"), F.array(F.col("c.position"))).alias(
                    "__path"
                ),
            )
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
    else:
        raise ValueError(
            f"collection chain under {root!r}: cycle or depth > {max_depth}"
        )
    firsts = leaves.groupBy("child").agg(F.min("__path").alias("__path"))
    w = Window.orderBy("__path")
    return firsts.select(
        "child", (F.row_number().over(w) - 1).cast("int").alias("position")
    )
