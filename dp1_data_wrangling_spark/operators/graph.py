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

from ..tables import keyed_checkpoint


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
    # Materialize the static sides ONCE (guide §2.4): edges by __src so
    # the per-round ranks⋈edges join never re-shuffles |E| rows.  The
    # out-degree rides the NODE table (r13 optimization): ranks carry
    # __d forward, so (a) the dangling term is a plain filter+aggregate
    # over checkpointed ranks — the per-round semi-join is gone — and
    # (b) the edge table shrinks to (src, dst), one bigint narrower per
    # edge through the one remaining per-round shuffle (guide §2.3).
    # ndeg only SEEDS round 0 now (the fused round carries each node's
    # self row through the contrib shuffle, so no per-round join reads
    # ndeg) — a plain eager checkpoint: round 0 reads it three times
    # (dangling agg + contrib join + self-row union) but nothing needs
    # its partitioning, so the keyed redistribution pass is dropped.
    ndeg = (
        nodes.select(F.col(node_col).alias("__node"))
        .join(deg, F.col("__node") == F.col("__n"), "left")
        .select("__node", F.coalesce("__d", F.lit(0)).alias("__d"))
        .localCheckpoint()
    )
    edges_d = keyed_checkpoint(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst")),
        "__src",
    )

    ranks = ndeg.select("__node", "__d", F.lit(r0).cast("bigint").alias("pr"))
    for _ in range(iterations):
        # lazy checkpoints: each round's table materializes inside its
        # first consuming job (and is then reused by the second
        # consumer) instead of as a standalone eager job — lineage is
        # still cut at every round boundary by the LogicalRDD.
        ranks = _pagerank_round(
            edges_d, ranks, n=n, teleport=teleport,
            damping_pct=damping_pct,
        ).localCheckpoint(eager=False)
    return ranks.select(F.col("__node").alias(node_col), "pr")


def _pagerank_round(
    edges_d: DataFrame,
    ranks: DataFrame,
    *,
    n: int,
    teleport: int,
    damping_pct: int,
) -> DataFrame:
    """One lazy update round — split out so plan-quality tests can gate
    the per-iteration shuffle shape (the loop's checkpoints hide it from
    the final plan).  ``ranks`` carries the node's out-degree ``__d``
    (the r13 shape): the dangling term is a filter+aggregate — no
    semi-join — and the round's only |E|-sized exchange is the contrib
    groupBy.  Fused recombine (r13 opt round): instead of a node-keyed
    left join of the static node table onto the contribs, each node's
    own (id, __d) rides the SAME contrib shuffle as a zero-share self
    row (``__share`` NULL — sum skips it; ``__dd`` NULL on edge rows —
    max recovers __d from the self row), so the per-round plan is ONE
    data shuffle and no recombine exchange/join at all (guide §2.4;
    measured 39 → 30 jobs over five rounds).  Nodes that only appear as
    edge targets (no self row) are dropped by the ``__d IS NOT NULL``
    filter — exactly the old left join's semantics."""
    dangling = ranks.filter(F.col("__d") == 0).agg(
        F.coalesce(F.sum("pr"), F.lit(0)).cast("bigint").alias("__ds")
    )
    contrib_in = (
        edges_d.join(ranks, edges_d["__src"] == ranks["__node"])
        .select(
            F.col("__dst"),
            F.expr("pr div __d").alias("__share"),
            F.lit(None).cast("bigint").alias("__dd"),
        )
        .unionAll(
            ranks.select(
                F.col("__node").alias("__dst"),
                F.lit(None).cast("bigint").alias("__share"),
                F.col("__d").alias("__dd"),
            )
        )
    )
    return (
        contrib_in.groupBy("__dst")
        .agg(
            F.sum("__share").alias("__contrib"),
            F.max("__dd").alias("__d"),
        )
        .filter(F.col("__d").isNotNull())
        .crossJoin(dangling)  # one-row aggregate, broadcast
        .select(
            F.col("__dst").alias("__node"),
            "__d",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_pct} * (coalesce(__contrib, 0)"
                    f" + __ds div {n})) div 100"
                )
            ).cast("bigint").alias("pr"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    Input is any directed/multi edge list; it is canonicalized first
    (self-loops dropped, (least, greatest) distinct).  Returns
    ``(node, n_triangles)`` for every node in at least one triangle.

    Algorithm — degree-ordered node-iterator (Schank & Wagner / the
    "compact-forward" family, public literature): orient every edge
    from the endpoint that is SMALLER in the (degree, id) total order
    to the larger, enumerate wedges as pairs of out-neighbors of the
    low vertex, and close each wedge with one equi-join back on the
    oriented edge set.  Each triangle {x ≺ y ≺ z} is produced exactly
    once, as the wedge (x→y, x→z) closed by y→z.

    Scale posture (100 TB): the degree orientation bounds every
    oriented out-degree by O(√|E|) on ANY graph — a celebrity hub with
    10⁸ followers contributes wedges only through its (few) higher-
    order neighbors, so the wedge self-join fan-out is skew-safe
    without salting.  All joins are narrow int-key equi-joins
    (plan-gated: no cartesian); nothing collects to the driver.  The
    degree join is the only place payload widens, by one BIGINT.  The
    canonical and oriented edge sets are localCheckpointed (eager) —
    each is read 2-3 times downstream and the materialization is
    (a, b) int pairs, far cheaper than re-running edge derivation per
    reference.
    """
    a, b = F.col(src), F.col(dst)
    # localCheckpoint the canonical edge set and the oriented edge set:
    # each is referenced 2-3 times downstream, and without materializing
    # them Spark re-executes the (possibly expensive) edge-derivation
    # subtree per reference — the same lesson as the connected-components
    # loop (operators/components.py).
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    # keyed on "a" (r13, guide §2.4): the first degree join below then
    # shuffles only the node-sized degree census, not the |E|-sized
    # edge set
    und = keyed_checkpoint(und, "a")
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        und.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
    )
    # orient low -> high in the (deg, id) total order; carry the head's
    # degree so wedge legs can be ordered by the same total order
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # keyed on the wedge pivot "u" (r13): o1 and o2 below read the SAME
    # checkpointed RDD already hash(u)-partitioned, so the wedge
    # self-join — the operator's biggest shuffle (it used to move the
    # oriented edge set TWICE) — plans with zero exchanges
    oriented = keyed_checkpoint(oriented, "u")
    o1 = oriented.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("z"), F.col("dv").alias("dz"))
    wedges = o1.join(o2, "u").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closer = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closer, ["y", "z"]).select("u", "y", "z")
    return (
        tris.select(F.explode(F.array("u", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 200,
) -> DataFrame:
    """k-core decomposition membership (Seidman, "Network structure and
    minimum degree", Social Networks 1983 — public literature): the
    maximal subgraph in which every node has degree >= ``k``, found by
    the canonical peeling fixpoint — repeatedly delete nodes of degree
    < k until none remain.  Dense-community extraction for link-graph
    curation (the step above triangle counting: triangles score nodes,
    the k-core keeps the cohesive subgraph).

    Input edges are canonicalized (undirected, self-loops dropped,
    parallel edges collapsed), so the result is a pure set function of
    the edge set — no ordering, no floats, no randomness; an oracle
    replays the peeling exactly.

    Returns ``(node, core_deg)`` for surviving nodes — ``core_deg`` is
    the node's degree WITHIN the core (>= k by construction).

    Scale posture (100 TB): each round is one degree aggregate (map-side
    combinable int counts) + an anti-join of edges against the peeled
    set — all (int, int) key shuffles, no cartesian.  The surviving edge
    set is localCheckpointed per round (the CC discipline: three
    downstream references must not re-derive the shrinking frontier),
    and rounds are data-dependent but bounded by the degeneracy ordering
    — small-world graphs settle in a handful; ``max_iters`` fail-fasts
    on adversarial chains (a path graph peels O(n) rounds — at that
    shape use the sequential degeneracy algorithm, not a cluster).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    canon = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    und = (
        canon.select("a", "b")
        .unionByName(canon.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        deg = und.groupBy("a").agg(F.count("*").alias("__deg"))
        bad = deg.filter(F.col("__deg") < k).select("a")
        if bad.isEmpty():
            return deg.select(
                F.col("a").alias("node"), F.col("__deg").alias("core_deg")
            )
        und = (
            und.join(bad, "a", "left_anti")
            .join(bad.select(F.col("a").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore: no fixpoint after {max_iters} peeling rounds "
        "(adversarial chain-like graph — raise max_iters or use a "
        "sequential degeneracy pass)"
    )


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 5,
    damping_pct: int = 85,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**12,
) -> DataFrame:
    """Personalized PageRank: rank nodes by proximity to a SEED set —
    the seeded-relevance primitive (curation pipelines boost documents
    reachable from a trusted whitelist; recommender graphs rank items
    around a user's history).  Same exact-integer discipline as
    :func:`pagerank`; the differences are the teleport vector and the
    dangling mass, both of which return to the seeds instead of
    spreading uniformly::

        seed_tel  = (((100 - damping_pct) * scale) div 100) div s
        r'(v)     = (v in S ? seed_tel : 0)
                    + (damping_pct * (contribs(v)
                       + (v in S ? dangling div s : 0))) div 100

    with ``s = |S|``.  All BIGINT truncating division, so a DuckDB
    chained-CTE oracle replays every iteration bit-for-bit.  Rank mass
    concentrates on the seeds' neighborhoods; far-from-seed nodes decay
    toward 0 — the property that makes PPR a locality score rather than
    a global one.

    ``seeds`` is a one-column DataFrame of node ids; ids not present in
    ``nodes`` are ignored (validated: at least one seed must survive
    the intersection).  Scale posture identical to :func:`pagerank` —
    the seed flag rides the checkpointed node-degree table, adding no
    join to the per-round plan.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    n = nodes.count()
    if n == 0:
        raise ValueError("personalized_pagerank needs a non-empty node set")
    seed_ids = seeds.select(
        F.col(seeds.columns[0]).alias("__seed_id")
    ).distinct()
    deg = edges.groupBy(F.col(src).alias("__n")).agg(F.count("*").alias("__d"))
    ndeg = (
        nodes.select(F.col(node_col).alias("__node"))
        .join(deg, F.col("__node") == F.col("__n"), "left")
        .join(
            seed_ids.withColumn("__is_seed", F.lit(True)),
            F.col("__node") == F.col("__seed_id"),
            "left",
        )
        .select(
            "__node",
            F.coalesce("__d", F.lit(0)).alias("__d"),
            F.coalesce("__is_seed", F.lit(False)).alias("__s"),
        )
        # seeds round 0 + the s count only (fused rounds — see pagerank):
        # plain eager checkpoint, no keyed redistribution needed
        .localCheckpoint()
    )
    s = ndeg.filter("__s").count()
    if s == 0:
        raise ValueError(
            "personalized_pagerank: no seed id matches the node set"
        )
    seed_tel = (((100 - damping_pct) * scale) // 100) // s
    r0 = scale // n
    # same r13 shape as pagerank: (src, dst)-only edge table pre-hash-
    # partitioned on __src; ranks carry (__d, __s) forward so dangling
    # is a filter+aggregate and the seed flag never joins per round
    edges_d = keyed_checkpoint(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst")),
        "__src",
    )
    ranks = ndeg.select(
        "__node", "__d", "__s", F.lit(r0).cast("bigint").alias("pr")
    )
    for _ in range(iterations):
        ranks = _ppr_round(
            edges_d, ranks, s=s, seed_tel=seed_tel,
            damping_pct=damping_pct,
        ).localCheckpoint(eager=False)
    return ranks.select(F.col("__node").alias(node_col), "pr")


def _ppr_round(
    edges_d: DataFrame,
    ranks: DataFrame,
    *,
    s: int,
    seed_tel: int,
    damping_pct: int,
) -> DataFrame:
    """One personalized round (split out for the plan gate, like
    ``_pagerank_round``): teleport and dangling mass go to SEEDS.
    ``ranks`` carries (__d, __s) — dangling is a filter+aggregate, the
    seed flag never joins per round (r13 shape).  Same fused recombine
    as ``_pagerank_round`` (r13 opt round): the self row carries
    (__d, __s) through the one contrib shuffle — ``__dd`` NULL on edge
    rows, so max() recovers both — and the node-keyed recombine join is
    gone; ``__dd IS NOT NULL`` replays the old left join's node-set
    semantics."""
    dangling = ranks.filter(F.col("__d") == 0).agg(
        F.coalesce(F.sum("pr"), F.lit(0)).cast("bigint").alias("__ds")
    )
    contrib_in = (
        edges_d.join(ranks, edges_d["__src"] == ranks["__node"])
        .select(
            F.col("__dst"),
            F.expr("pr div __d").alias("__share"),
            F.lit(None).cast("struct<__d:bigint,__s:boolean>").alias(
                "__dd"
            ),
        )
        .unionAll(
            ranks.select(
                F.col("__node").alias("__dst"),
                F.lit(None).cast("bigint").alias("__share"),
                F.struct(F.col("__d"), F.col("__s")).alias("__dd"),
            )
        )
    )
    return (
        contrib_in.groupBy("__dst")
        .agg(
            F.sum("__share").alias("__contrib"),
            F.max("__dd").alias("__m"),
        )
        .filter(F.col("__m").isNotNull())
        .crossJoin(dangling)  # one-row aggregate, broadcast
        .select(
            F.col("__dst").alias("__node"),
            F.col("__m.__d").alias("__d"),
            F.col("__m.__s").alias("__s"),
            (
                F.when(F.col("__m.__s"), F.lit(seed_tel)).otherwise(
                    F.lit(0)
                )
                + F.expr(
                    f"({damping_pct} * (coalesce(__contrib, 0)"
                    f" + CASE WHEN __m.__s THEN __ds div {s} ELSE 0 END))"
                    f" div 100"
                )
            ).cast("bigint").alias("pr"),
        )
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = 3,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, public literature), made deterministic: every node
    starts labeled with its own id; each round it adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label; isolated nodes keep their label.  Fixed ``iterations``
    rounds (classic async LPA's convergence is run-order dependent —
    the synchronous fixed-round form is the one a declarative engine
    can replay bit-for-bit, and a SQL oracle re-derives every round).

    ``edges`` is treated as UNDIRECTED (both directions propagate);
    self-loops are dropped.  Returns ``(node, community)`` with the
    community id a node id of the input's type (numeric ids and string
    ids — hosts, domains — both work: the smallest-label tie-break
    orders labels natively) — label ids survive from round 0, so
    communities are named by one of their members.

    Scale posture (100 TB): per round, one node-keyed equi-join of the
    label table onto the neighbor list + one map-side-combinable
    (node, label) count + one node-keyed argmax aggregate — all hash
    exchanges on node ids, no cartesian (plan-gated).  The neighbor
    list is localCheckpointed ONCE (the CC lesson: three references per
    round would re-derive the edge subtree), and each round's label
    table is checkpointed to truncate lineage growth.  Rounds are a
    fixed constant; each round's cost is linear in |E|.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    n = nodes.select(F.col(node_col).alias("node")).distinct()
    # the neighbor list is checkpointed ONCE, pre-hash-partitioned on
    # the per-round join key ``u`` (r13, guide §2.4): every round's
    # label join then re-shuffles only the node-sized label table, never
    # the |E|-sized neighbor list (the distinct's (v, u) partitioning
    # could not serve a join on u alone)
    nbrs = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("v"), F.col(dst).alias("u"))
        .unionByName(
            edges.filter(F.col(src) != F.col(dst)).select(
                F.col(dst).alias("v"), F.col(src).alias("u")
            )
        )
        .distinct()
    )
    nbrs = keyed_checkpoint(nbrs, "u")
    labels = n.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        msgs = nbrs.join(
            labels.select(F.col("node").alias("u"), "label"), "u"
        ).select("v", "label")
        counts = msgs.groupBy("v", "label").agg(F.count("*").alias("__c"))
        # argmax by (count desc, label asc): MIN of the lexicographic
        # struct (-count, label) — negating the COUNT (always a long)
        # instead of the label keeps the tie-break type-agnostic, so
        # string node ids (host/domain communities) order naturally
        # rather than silently null-casting (review fix).
        # Fused keep-own-label fallback (r13 opt round): each node's own
        # label rides the winners shuffle as a __nc = 0 self row instead
        # of a node-keyed left join after it (guide §2.4).  Every real
        # neighbor label has __c >= 1, i.e. __nc <= -1 < 0, so the self
        # row loses every min() it shares a group with and wins exactly
        # when the node has no neighbors — bit-identical to the old
        # coalesce(left join).  Nodes outside the label table (targets
        # of stray edges) have no self row; the old left join dropped
        # them, so the fused form drops groups whose min __nc < 0 only
        # arrived from edges: a self row is the ONLY source of __nc = 0,
        # flagged and filtered below.
        cand = counts.select(
            "v", (-F.col("__c")).alias("__nc"), "label"
        ).unionAll(
            labels.select(
                F.col("node").alias("v"),
                F.lit(0).cast("long").alias("__nc"),
                "label",
            )
        )
        labels = (
            cand.groupBy("v")
            .agg(
                F.min(
                    F.struct(F.col("__nc"), F.col("label"))
                ).alias("__m"),
                F.max(F.when(F.col("__nc") == 0, F.lit(1))).alias("__own"),
            )
            .filter(F.col("__own").isNotNull())
            .select(F.col("v").alias("node"), F.col("__m.label").alias("label"))
            # lazy: materializes inside the next round's first consuming
            # job (still cuts lineage at the round boundary) instead of
            # as a standalone eager job per round (r13)
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))


def link_prediction(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction with exact Jaccard scores: for
    every NON-adjacent pair of nodes that shares at least ``min_common``
    neighbors, the common-neighbor count and the neighborhood-Jaccard
    in exact ppm (``1e6 * |N(a) ∩ N(b)| div |N(a) ∪ N(b)|``) — the
    classic "who should link to whom" / related-document candidate
    generator (Liben-Nowell & Kleinberg 2003's CN and Jaccard
    predictors, the two that need no float algebra).

    The graph is undirected and simple: edges are canonicalized to
    ``(a < b)``, self-loops dropped, duplicates collapsed.  When
    ``max_degree`` is set, HUB nodes (full-graph degree above it) are
    removed from the scored graph entirely — edges incident to a hub
    never generate candidates AND never count toward degrees, so the
    reported Jaccard stays exactly |∩|/|∪| of the scored graph.  That
    is the skew valve: per intermediate node w the candidate generator
    emits deg(w)² pairs, so one celebrity node would otherwise
    dominate the stage (and paths through it predict nothing — the
    standard adamic-adar observation taken to its cap).  Deterministic
    and oracle-replayable, unlike sampling.

    Scale posture (100 TB of edges): canonicalize (1 shuffle), degree
    census (node-keyed groupBy), the adjacency self-join on the
    INTERMEDIATE node (w-keyed equi-join — candidates are blocked per
    node, never all-pairs), pair census (groupBy), an anti-join
    against the existing edge set, and two node-keyed degree joins.
    Every stage is key-blocked; the valve bounds the quadratic term.

    Engine extension — the reference (exporter.py:75-141) has no graph
    tier.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_degree is not None and max_degree < 1:
        raise ValueError(f"max_degree must be >= 1, got {max_degree}")

    s, d = F.col(src_col), F.col(dst_col)
    # localCheckpoint the canonical (and hub-stripped) edge sets and the
    # degree census: each is referenced 2-7 times downstream and without
    # materialization Spark re-expands the whole edge-derivation subtree
    # PER REFERENCE — the triangle_count/components lesson (a first cut
    # of this operator planned 269 exchanges; checkpointed it plans 5).
    # Lazy (eager=False): each materializes inside its first consuming
    # job instead of as a standalone job — the itemsets valve pattern
    canon = (
        edges.filter(s != d)
        .select(
            F.least(s, d).alias("a"),
            F.greatest(s, d).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    if max_degree is not None:
        # hubs are FEW by construction (the valve exists because they
        # are outliers): broadcast both anti-joins
        hubs = degrees(canon).filter(F.col("deg") > max_degree).select("node")
        canon = (
            canon.join(F.broadcast(hubs), canon.a == hubs.node, "left_anti")
            .join(F.broadcast(hubs), canon.b == hubs.node, "left_anti")
            .localCheckpoint(eager=False)
        )
    deg = degrees(canon).localCheckpoint(eager=False)

    # the Resource-Allocation index rides the same wedge census: each
    # common neighbor w contributes 1/deg(w), in exact ppm via one
    # truncating division per wedge (deg(w) >= 2 for any intermediate,
    # so the division is always defined) — the Zhou/Lü/Zhang predictor
    # that consistently beats raw CN in the link-prediction literature.
    # r13 shape (guide §2.3/§2.4): deg(w) is attached to the ADJACENCY
    # (2|E| rows) before the self-join — the old plan joined it onto the
    # wedge census (deg(w)² rows per pivot), a strictly larger join —
    # and the adjacency is checkpointed pre-partitioned on the pivot w,
    # so the wedge self-join reads one co-partitioned RDD twice and
    # plans with ZERO exchanges.
    degw = deg.select(F.col("node").alias("__w"), F.col("deg").alias("__dw"))
    adj = canon.select(F.col("a").alias("w"), F.col("b").alias("nb")).unionAll(
        canon.select(F.col("b").alias("w"), F.col("a").alias("nb"))
    )
    adj = keyed_checkpoint(
        adj.join(degw, adj.w == degw.__w).select("w", "nb", "__dw"),
        "w",
        eager=False,
    )
    left = adj.select(F.col("w"), F.col("nb").alias("pa"), "__dw")
    right = adj.select(F.col("w").alias("w2"), F.col("nb").alias("pb"))
    cn = (
        left.join(
            right, (F.col("w") == F.col("w2")) & (F.col("pa") < F.col("pb"))
        )
        .groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.expr("1000000 div __dw")).alias("ra_ppm"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )
    fresh = cn.join(
        canon,
        (cn.pa == canon.a) & (cn.pb == canon.b),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("__na"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("__nb"), F.col("deg").alias("deg_b"))
    return (
        fresh.join(da, fresh.pa == da.__na)
        .join(db, fresh.pb == db.__nb)
        .select(
            F.col("pa").alias("a"),
            F.col("pb").alias("b"),
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.expr(
                "(1000000 * common_neighbors) div "
                "(deg_a + deg_b - common_neighbors)"
            ).alias("jaccard_ppm"),
            "ra_ppm",
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of the undirected simple graph under a
    DIRECTED edge list (Newman, "Assortative mixing in networks",
    PRL 2002 — public): the Pearson correlation of endpoint degrees
    over every ordered edge orientation.  Positive = hubs link hubs
    (social shape), negative = hubs link leaves (web/star shape) — a
    one-number structure KPI watched next to the degree distribution
    when deciding crawl/curation policy for a link corpus.

    Canonicalization (the k-core/link-prediction contract): self-loops
    dropped, parallel and reverse duplicates collapsed to ONE
    undirected edge, then BOTH orientations enter the correlation —
    which makes the estimator symmetric without needing the textbook's
    half-sum correction terms.

    Exactness contract (the ``corr_pairs`` stance): sufficient
    statistics (pair count and the five moment sums) accumulate as
    exact DECIMAL(38,0) integers; the finish casts each EXACT integer
    to double once and evaluates the correlation in a fixed expression
    order — IEEE multiply/subtract/divide/sqrt are correctly rounded,
    so identical exact inputs give bit-identical doubles in Spark and
    DuckDB (round(6) as belt-and-braces).  A regular graph (zero
    degree variance) yields NULL.

    Returns ONE row: ``(n_nodes, n_edges, m_pairs, assortativity)``
    (n_nodes counts non-isolated nodes — an edge-list representation
    carries no isolated vertices).

    Scale posture (100 TB): the canonical distinct + the degree census
    + two node-keyed equi-joins (each shuffles edges by ONE endpoint —
    never materializing neighborhoods) + ONE combinable aggregate to a
    single moments row.  No window, no cartesian; hubs cost their
    degree in join fan-out, nothing quadratic.

    Engine extension — the reference (export_dp1.py / import_dp1.py)
    has no graph tier; cited for provenance only.
    """
    _D = "decimal(38,0)"
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    canon = (
        e.filter(F.col("__s") != F.col("__d"))
        .select(
            F.least("__s", "__d").alias("a"),
            F.greatest("__s", "__d").alias("b"),
        )
        .distinct()
    )
    # localCheckpoint the symmetrized edge set (the triangle_count /
    # CC lesson): it feeds the degree census AND both sides of the
    # degree join — without materializing, the edge-derivation subtree
    # re-executes once per reference.  The materialization is (a, b)
    # pairs, far cheaper than re-deriving edges.
    und = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    pairs = (
        und.join(deg.select(F.col("a").alias("__na"), F.col("deg").alias("dx")),
                 und.a == F.col("__na"))
        .join(deg.select(F.col("a").alias("__nb"), F.col("deg").alias("dy")),
              und.b == F.col("__nb"))
        .select(und.a.alias("__node"), "dx", "dy")
    )
    # n_nodes rides the SAME aggregate (count distinct of the symmetric
    # orientation's source endpoint == the degree-census row count) — a
    # second aggregation branch over `deg` would re-execute the whole
    # canonical-distinct subtree (the CC lesson)
    m = pairs.agg(
        F.count_distinct(F.col("__node")).cast("bigint").alias("n_nodes"),
        F.count(F.lit(1)).cast(_D).alias("__m"),
        F.coalesce(F.sum(F.col("dx").cast(_D)), F.lit(0)).cast(_D).alias("__sx"),
        F.coalesce(F.sum(F.col("dy").cast(_D)), F.lit(0)).cast(_D).alias("__sy"),
        F.coalesce(
            F.sum((F.col("dx").cast(_D) * F.col("dy").cast(_D)).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxy"),
        F.coalesce(
            F.sum((F.col("dx").cast(_D) * F.col("dx").cast(_D)).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxx"),
        F.coalesce(
            F.sum((F.col("dy").cast(_D) * F.col("dy").cast(_D)).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__syy"),
    )
    md = F.col("__m").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    var_x = md * sxx - sx * sx
    var_y = md * syy - sy * sy
    return m.select(
        "n_nodes",
        F.expr("__m div 2").cast("bigint").alias("n_edges"),
        F.col("__m").cast("bigint").alias("m_pairs"),
        F.when(
            (var_x > 0) & (var_y > 0),
            F.round(
                (md * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)), 6
            ),
        ).alias("assortativity"),
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient in exact ppm (Watts &
    Strogatz, Nature 1998 — public): ``cc = 2e6 * T(v) div
    (deg(v) * (deg(v) - 1))`` for ``deg >= 2`` (NULL below — one
    neighbor closes nothing), composing :func:`triangle_count` and the
    degree census over the SAME canonical simple graph.  The
    triangles/deg-pairs ratio is THE per-node community-vs-spam screen
    read next to the raw triangle count: a link farm's hub counts many
    triangles but its coefficient collapses, while a genuine community
    member's neighbors interlink.

    Exactness: the coefficient is ONE truncating division of
    non-negative BIGINTs — replayed verbatim by any engine; degrees
    and triangle counts are exact integers by construction.

    Returns ``(node, deg, n_triangles, cc_ppm)`` for every
    non-isolated node (nodes in no triangle read 0 / 0 ppm).

    Scale posture (100 TB): canonicalization runs ONCE here
    (localCheckpointed — the compact-forward enumeration inside
    triangle_count re-canonicalizes a no-op over the materialized
    pairs), the degree census and the final join are node-keyed, and
    the wedge work inherits triangle_count's O(sqrt E) skew bound.

    Engine extension — the reference (export_dp1.py / import_dp1.py)
    has no graph tier; cited for provenance only.
    """
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    tri = triangle_count(canon, src="a", dst="b")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "(2000000 * coalesce(n_triangles, 0)) div "
                    "(deg * (deg - 1))"
                ),
            ).cast("bigint").alias("cc_ppm"),
        )
    )
