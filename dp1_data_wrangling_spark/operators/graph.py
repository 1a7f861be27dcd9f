"""PageRank over an explicit edge list — exact integer fixed-point.

Large-scale curation pipelines weight web documents by link-graph
importance (Common-Crawl-derived corpora rank hosts/pages before
sampling — the harmonic-centrality / PageRank screens in C4- and
RefinedWeb-class pipelines).  The engine therefore ships PageRank as a
first-class batch operator: iterative sparse matrix-vector products
expressed as plain DataFrame joins + aggregations, no graph library.

Engine extension — the reference (a per-row export/import tool,
exporter.py:75-141) has no graph tier.

Determinism (the driver hash-compares values): every quantity is BIGINT.
Total rank mass starts at ``scale`` (default 1e12) split evenly; each
iteration moves integer shares with truncating division (``div``), so
the result is bit-identical across partitionings AND across engines —
a DuckDB oracle replays all iterations with chained CTEs and ``//``.
The tiny mass lost to truncation each division is deterministic too.

Scale posture (100 TB): per iteration ONE shuffle for the
contribution aggregation (groupBy dst) and one narrow join of ranks
onto edges by src — both hash-partitioned by node id; the dangling-mass
term is a one-row aggregate broadcast back via crossJoin (never a
driver collect).  Edge and degree tables are localCheckpointed once so
the (possibly expensive) edge-derivation subtree never re-executes per
round — the same lesson as connected_components
(operators/components.py).  Convergence needs O(10) rounds regardless
of corpus size; each round's cost is linear in |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping_pct: int = 85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**12,
) -> DataFrame:
    """Rank ``nodes`` by ``iterations`` exact-integer PageRank rounds.

    ``nodes`` must carry every node (including ones with no out-edges —
    their mass is redistributed uniformly as dangling mass); ``edges``
    is a directed multigraph (parallel edges count multiply, self-loops
    are legal).  Returns (node, pr) with ``pr`` a BIGINT share of
    ``scale`` total mass.

    Update rule, all BIGINT with truncating division::

        r0        = scale div n
        teleport  = ((100 - damping_pct) * r0) div 100
        share(u)  = r(u) div outdeg(u)            (per out-edge)
        dangling  = sum of r(u) where outdeg(u) = 0
        r'(v)     = teleport
                    + (damping_pct * (sum_in_edges share(u)
                                      + dangling div n)) div 100
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    n = nodes.count()  # dimension cardinality — a count, never a row collect
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    r0 = scale // n
    teleport = ((100 - damping_pct) * r0) // 100

    deg = edges.groupBy(F.col(src).alias("__n")).agg(F.count("*").alias("__d"))
    # Materialize the static sides ONCE: every round below joins them.
    ndeg = (
        nodes.select(F.col(node_col).alias("__node"))
        .join(deg, F.col("__node") == F.col("__n"), "left")
        .select("__node", F.coalesce("__d", F.lit(0)).alias("__d"))
        .localCheckpoint(eager=True)
    )
    edges_d = (
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
        .join(deg, F.col("__src") == F.col("__n"))
        .select("__src", "__dst", "__d")
        .localCheckpoint(eager=True)
    )

    ranks = ndeg.select("__node", F.lit(r0).cast("bigint").alias("pr"))
    for _ in range(iterations):
        ranks = _pagerank_round(
            ndeg, edges_d, ranks, n=n, teleport=teleport,
            damping_pct=damping_pct,
        ).localCheckpoint(eager=True)  # cut lineage growth per round
    return ranks.select(F.col("__node").alias(node_col), "pr")


def _pagerank_round(
    ndeg: DataFrame,
    edges_d: DataFrame,
    ranks: DataFrame,
    *,
    n: int,
    teleport: int,
    damping_pct: int,
) -> DataFrame:
    """One lazy update round — split out so plan-quality tests can gate
    the per-iteration shuffle shape (the loop's eager checkpoints hide
    it from the final plan)."""
    dangling = (
        ranks.join(
            ndeg.filter(F.col("__d") == 0).select("__node"), "__node", "semi"
        )
        .agg(F.coalesce(F.sum("pr"), F.lit(0)).cast("bigint").alias("__ds"))
    )
    contrib = (
        edges_d.join(ranks, edges_d["__src"] == ranks["__node"])
        .select(F.col("__dst"), F.expr("pr div __d").alias("__share"))
        .groupBy("__dst")
        .agg(F.sum("__share").alias("__contrib"))
    )
    return (
        ndeg.select("__node")
        .join(contrib, F.col("__node") == F.col("__dst"), "left")
        .crossJoin(dangling)  # one-row aggregate, broadcast
        .select(
            "__node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_pct} * (coalesce(__contrib, 0)"
                    f" + __ds div {n})) div 100"
                )
            ).cast("bigint").alias("pr"),
        )
    )
