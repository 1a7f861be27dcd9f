"""Connected components over a candidate-pair graph (dedup clustering).

Near-dup dedup ends with clusters, not pairs: every document keeps the
min-id member of its connected component as its canonical representative
(keep-one-per-cluster).  This is the step that makes the capped-bucket
LSH output usable — a 10k-document boilerplate cluster is one component
with one survivor, never 50M enumerated pairs.

Algorithm: large-star/small-star style label propagation —
each node's label starts as its own id; every iteration each node adopts
the minimum label in its neighborhood (including itself); stop when no
label changes.  Converges in O(diameter) iterations; each iteration is
one join + one aggregation on (node, label) pairs — narrow shuffles, no
driver-side graph.  This is the standard MapReduce CC construction
(Kiveris et al., "Connected Components in MapReduce and Beyond") that
GraphX/GraphFrames implement; kept here as plain DataFrame ops so the
engine has no extra dependency.

Determinism: labels are min() folds — order-independent, so the result
is exact regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import keyed_checkpoint


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label each node of the pair graph with its component's min id.

    Returns (node, component).  Isolated nodes don't appear (callers union
    non-candidates back as their own singletons — see ``dedup_survivors``).
    """
    real = pairs.filter(F.col(src) != F.col(dst))  # self-pairs carry no info
    edges = (
        real.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(real.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # Materialize ONCE: the pair subtree upstream (LSH/SRP signature +
        # bucket join + similarity) is the expensive part, and every
        # propagation round below joins against `edges` — without this the
        # whole candidate generation re-executes per iteration (measured
        # ~4x on embedding_semantic_dedup's bench entry).  Keyed on the
        # join key "a" (r13, guide §2.4) so each round's join re-shuffles
        # only the node-sized label table, never the edges.
    )
    edges = keyed_checkpoint(edges, "a")
    # labels: node -> current component candidate (min id seen so far)
    labels = edges.groupBy(F.col("a").alias("node")).agg(
        F.least(F.min("b"), F.first("a")).alias("component")
    )
    # Convergence probe (r13): labels only ever DECREASE (min folds over
    # a fixed node set), so the exact DECIMAL(38,0) sum of components is
    # strictly decreasing while any label changes and fixed at the
    # fixpoint — one cheap aggregate over the freshly-materialized round
    # replaces the old inequality-join + limit(1).count() probe (a whole
    # extra join job per round).
    def _label_sum(lb: DataFrame):
        return lb.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # propagate: each node offers its label to every neighbor
        offered = (
            edges.join(labels, edges.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
            .union(labels.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # lazy checkpoint: the sum probe below is the round's one action
        # and materializes the table; the next round then reads the
        # cached RDD (lineage still cut at the round boundary)
        labels = offered.localCheckpoint(eager=False)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # exhausting the iteration budget mid-propagation would return
        # partial labels (nodes still carrying a non-minimal component) —
        # refuse, same contract as connected_components_star
        raise ValueError(
            f"connected_components: no fixpoint after {max_iterations} rounds"
            " (label propagation moves one hop per round — raise"
            " max_iterations or use connected_components_star, which"
            " converges in O(log n) rounds)"
        )
    return labels


def connected_components_star(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Alternating large-star / small-star connected components — the
    giant-component scale path.

    Plain label propagation converges in O(diameter) rounds, which on a
    path-shaped duplicate chain (each doc paired with the next) is O(n).
    The star operations (Kiveris et al.) rewire the edge set itself each
    round — large-star hangs every larger neighbor under the neighborhood
    minimum, small-star re-hangs the smaller ones — contracting tree
    height roughly geometrically, so rounds are O(log n) on the worst
    graphs.  Each round is two narrow (node, neighbor) shuffles; edges
    stay (long, long) pairs throughout.

    Returns (node, component) with component = min id of the component,
    matching ``connected_components`` exactly (equivalence is
    property-tested)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )  # canonical u > v
        .distinct()
        # evaluated several times in round 1 (und, mins, count, exceptAll)
        # and its upstream is the expensive candidate generation — same
        # materialize-once reasoning as connected_components
        .localCheckpoint(eager=True)
    )
    prev_count: int | None = None
    converged = False
    for _ in range(max_iterations):
        # large-star: for every node, connect its LARGER neighbors to the
        # minimum of the closed neighborhood.  (Neighborhoods are built on
        # the undirected edge set.)
        und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))  # larger neighbors only
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star: connect all smaller-or-equal neighbors (plus self)
        # to the neighborhood minimum, operating on edges directed
        # high -> low.
        small_mins = edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        small = (
            edges.join(small_mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(small_mins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )
        new_edges = (
            large.union(small)
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)  # cut lineage each round
        )
        # converged when the canonical edge set is a fixpoint: every node
        # points directly at its component minimum.  The test must be
        # SYMMETRIC — new ⊆ old alone would declare a round that only
        # removed edges converged; since both sets are distinct, new ⊆ old
        # plus equal cardinality means equality.
        if prev_count is None:
            prev_count = edges.count()
        new_count = new_edges.count()
        grew = new_edges.exceptAll(edges).limit(1).count()
        edges = new_edges
        if grew == 0 and new_count == prev_count:
            converged = True
            break
        prev_count = new_count
    if not converged:
        # a silent non-fixpoint would return wrong components — refuse,
        # matching flatten_chains_distributed's contract
        raise ValueError(
            f"connected_components_star: no fixpoint after {max_iterations} rounds"
        )
    # Canonical edges are u > v, so each component's root (its min id)
    # never appears on the left — union it back as (min, min) to match
    # connected_components' output exactly.
    roots = edges.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return edges.select(F.col("u").alias("node"), F.col("v").alias("component")).unionByName(
        roots
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep-one-per-cluster: returns (doc_id, component, is_survivor).

    Documents in no candidate pair are their own singleton component and
    survive; in each multi-document component only the min id survives."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("component"))
    )


def quality_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep-BEST-per-cluster (r12): like :func:`dedup_survivors`, but the
    survivor is the cluster member with the HIGHEST quality score (min
    id breaks quality ties) — the form a real curation pipeline runs,
    where near-duplicate groups keep the longest / highest-LM-scored
    variant rather than an arbitrary id minimum.

    Returns ``(id, component, quality, is_survivor)``.  The component
    label stays the min id (the :func:`connected_components`
    convention, shared with the dedup_clusters oracle); only the
    survivorship choice consults the quality.  Quality must be an
    exact integer (the standing integer-units posture — quantize LM
    scores upstream); NULL quality and a LONG_MIN id raise
    executor-side (an argmax admits neither, and the tie-break negates
    the id).

    Scale posture (100 TB): connected components (documented
    checkpointed-rounds posture) + ONE map-side-combinable struct-max
    per component + a component-keyed equi-join back — no windows, so
    a mega-cluster costs a combiner fold, never a partition sort.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    q_ok = F.when(
        F.col(quality_col).isNotNull() & (F.col(id_col) != F.lit(-(1 << 63))),
        F.col(quality_col).cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "quality_survivors: NULL quality or LONG_MIN id — an "
                "argmax admits neither; filter or score upstream"
            )
        ).cast("bigint")
    )
    labeled = (
        docs.select(F.col(id_col), q_ok.alias("__q"))
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            "__q",
        )
    )
    # struct-max argmax: max quality first, then min id via exact
    # negation (guarded above) — one combinable aggregate, no window
    best = labeled.groupBy("component").agg(
        F.max(
            F.struct(F.col("__q").alias("q"), (-F.col(id_col)).alias("nid"))
        ).alias("__b")
    ).select("component", (-F.col("__b.nid")).alias("__bid"))
    return (
        labeled.join(best, "component")
        .select(
            F.col(id_col),
            "component",
            F.col("__q").alias(quality_col),
            (F.col(id_col) == F.col("__bid")).alias("is_survivor"),
        )
    )
