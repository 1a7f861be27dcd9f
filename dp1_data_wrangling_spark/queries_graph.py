"""Link-graph query catalog (split from queries_llm.py in round 12 —
the graph tier had grown past reviewable size inside the LLM module;
zero behavior change, same @register calls).

PageRank / personalized PageRank / triangles / k-core / label-
propagation communities / link prediction over the shared md5-derived
document link graph.  Every generator is md5-deterministic so the
DuckDB oracles replay the exact graph (see queries_llm._md5mod).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_llm import _dense_doc_index, _md5mod
from .registry import register
from .tables import load_table


def _pagerank_oracle(k: int = 5, scale: int = 10**12) -> str:
    """Chained-CTE replay of ``operators.graph.pagerank`` — one CTE per
    iteration (aggregates are not legal in a recursive term, and a fixed
    iteration count is the operator's contract anyway).  All arithmetic
    is BIGINT with ``//`` (floor == Spark ``div`` for the all-positive
    masses here), so the replay is bit-exact."""
    cte = f"""
    WITH pr_docs AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        FROM documents
    ),
    pr_meta AS (SELECT count(*) AS n FROM pr_docs),
    pr_deg AS (
        SELECT idx,
               CAST(('0x' || substr(md5('pr_deg|' || CAST(idx AS VARCHAR)), 1, 15))
                    AS BIGINT) % 4 AS d
        FROM pr_docs
    ),
    pr_edges AS (
        SELECT g.idx AS src, g.d,
               CAST(('0x' || substr(md5('pr_dst|' || CAST(g.idx AS VARCHAR) || '|'
                    || CAST(g.j AS VARCHAR)), 1, 15)) AS BIGINT)
                 % (SELECT n FROM pr_meta) AS dst
        FROM (SELECT idx, d, unnest(generate_series(1, d)) AS j
              FROM pr_deg WHERE d > 0) g
    ),
    pr_it0 AS (
        SELECT idx, (SELECT {scale} // n FROM pr_meta) AS pr FROM pr_docs
    )"""
    for t in range(1, k + 1):
        cte += f""",
    pr_it{t} AS (
        SELECT nd.idx,
               (SELECT (15 * ({scale} // n)) // 100 FROM pr_meta)
               + (85 * (COALESCE(c.contrib, 0)
                        + (SELECT COALESCE(SUM(p.pr), 0) FROM pr_it{t - 1} p
                           JOIN pr_deg dg ON dg.idx = p.idx AND dg.d = 0)
                          // (SELECT n FROM pr_meta))) // 100 AS pr
        FROM pr_docs nd
        LEFT JOIN (SELECT e.dst AS idx, SUM(p.pr // e.d) AS contrib
                   FROM pr_edges e JOIN pr_it{t - 1} p ON p.idx = e.src
                   GROUP BY e.dst) c ON c.idx = nd.idx
    )"""
    # CAST back to BIGINT: DuckDB SUM(BIGINT) widens to HUGEINT and the
    # per-iteration arithmetic stays HUGEINT through the final select.
    # The DRIVER's canonicalizer (unlike the Arrow-based in-repo one)
    # does not normalize HUGEINT == int64 — this was the one red row in
    # CORRECTNESS_r08.  The masses are < 1e12, so the cast is lossless.
    return cte + f"""
    SELECT d.doc_id, CAST(p.pr AS BIGINT) AS pr
    FROM pr_docs d JOIN pr_it{k} p ON p.idx = d.idx
    """


@register("doc_link_pagerank", _pagerank_oracle(), headline=True)
def q_doc_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph importance for curation (operators/graph.py pagerank):
    web-scale pipelines weight documents by PageRank-class centrality
    before sampling (the Common-Crawl host-ranking step in C4- and
    RefinedWeb-class recipes).  The link graph is md5-derived from the
    corpus itself (out-degree 0-3 per doc — degree-0 docs exercise the
    dangling-mass path; targets uniform over the corpus), so the DuckDB
    oracle replays graph construction AND all five iterations exactly:
    every mass is a BIGINT share of 1e12 moved with truncating division.

    Scale shape: each iteration is one join of ranks onto edges by src
    (narrow, hash-partitioned) + ONE groupBy-dst shuffle; the dangling
    term is a one-row aggregate broadcast via crossJoin.  The edge table
    is checkpointed once, never re-derived per round.  The single-
    partition row_number window ranks a *dimension* table (the corpus
    id-space map); at 100 TB the id map is built once by the catalog
    tier, not per query."""
    from pyspark.sql import Window

    from .operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    idx = _dense_doc_index(docs)
    n = idx.count()
    deg = idx.select(
        "idx",
        _md5mod([F.lit("pr_deg|"), F.col("idx").cast("string")], 4).alias("d"),
    )
    edges_idx = (
        deg.filter(F.col("d") > 0)
        .select(
            "idx",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.col("d"))
            ).alias("j"),
        )
        .select(
            "idx",
            _md5mod(
                [
                    F.lit("pr_dst|"),
                    F.col("idx").cast("string"),
                    F.lit("|"),
                    F.col("j").cast("string"),
                ],
                n,
            ).alias("dst_idx"),
        )
    )
    edges = (
        edges_idx.join(
            idx.select(F.col("idx").alias("__si"), F.col("doc_id").alias("src")),
            F.col("idx") == F.col("__si"),
        )
        .join(
            idx.select(F.col("idx").alias("__di"), F.col("doc_id").alias("dst")),
            F.col("dst_idx") == F.col("__di"),
        )
        .select("src", "dst")
    )
    nodes = idx.select(F.col("doc_id").alias("node"))
    return pagerank(nodes, edges, iterations=5).select(
        F.col("node").alias("doc_id"), "pr"
    )


def _ppr_oracle(k: int = 5, scale: int = 10**12) -> str:
    """Chained-CTE replay of ``operators.graph.personalized_pagerank``
    over the md5-derived link graph with seeds = every 20th corpus
    index: teleport AND dangling mass go to the seeds; all BIGINT with
    ``//`` (floor == Spark ``div`` on the all-positive masses)."""
    cte = f"""
    WITH pp_docs AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        FROM documents
    ),
    pp_meta AS (
        SELECT count(*) AS n,
               sum(CASE WHEN idx % 20 = 0 THEN 1 ELSE 0 END) AS s
        FROM pp_docs
    ),
    pp_deg AS (
        SELECT idx,
               CAST(('0x' || substr(md5('ppr_deg|' || CAST(idx AS VARCHAR)),
                    1, 15)) AS BIGINT) % 4 AS d
        FROM pp_docs
    ),
    pp_edges AS (
        SELECT g.idx AS src, g.d,
               CAST(('0x' || substr(md5('ppr_dst|' || CAST(g.idx AS VARCHAR)
                    || '|' || CAST(g.j AS VARCHAR)), 1, 15)) AS BIGINT)
                 % (SELECT n FROM pp_meta) AS dst
        FROM (SELECT idx, d, unnest(generate_series(1, d)) AS j
              FROM pp_deg WHERE d > 0) g
    ),
    pp_it0 AS (
        SELECT idx, (SELECT {scale} // n FROM pp_meta) AS pr FROM pp_docs
    )"""
    for t in range(1, k + 1):
        cte += f""",
    pp_it{t} AS (
        SELECT nd.idx,
               CASE WHEN nd.idx % 20 = 0
                    THEN (SELECT ((15 * {scale}) // 100) // s FROM pp_meta)
                    ELSE 0 END
               + (85 * (COALESCE(c.contrib, 0)
                        + CASE WHEN nd.idx % 20 = 0 THEN
                            (SELECT COALESCE(SUM(p.pr), 0)
                             FROM pp_it{t - 1} p
                             JOIN pp_deg dg ON dg.idx = p.idx AND dg.d = 0)
                            // (SELECT s FROM pp_meta)
                          ELSE 0 END)) // 100 AS pr
        FROM pp_docs nd
        LEFT JOIN (SELECT e.dst AS idx, SUM(p.pr // e.d) AS contrib
                   FROM pp_edges e JOIN pp_it{t - 1} p ON p.idx = e.src
                   GROUP BY e.dst) c ON c.idx = nd.idx
    )"""
    return cte + f"""
    SELECT d.doc_id, (d.idx % 20 = 0) AS is_seed, CAST(p.pr AS BIGINT) AS pr
    FROM pp_docs d JOIN pp_it{k} p ON p.idx = d.idx
    """


@register("doc_link_ppr", _ppr_oracle())
def q_doc_link_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py personalized_pagerank):
    seeded relevance over the corpus link graph — every 20th document
    is a trusted seed, teleport and dangling mass return to the seeds,
    and rank mass decays with graph distance from them (the whitelist-
    boost primitive in curation and the neighborhood score in
    recommender graphs).  Same exact-integer mass accounting as
    doc_link_pagerank; the oracle replays the graph, the seed flags and
    all five seeded iterations bit-for-bit."""
    from pyspark.sql import Window

    from .operators.graph import personalized_pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    idx = _dense_doc_index(docs)
    n = idx.count()
    deg = idx.select(
        "idx",
        _md5mod([F.lit("ppr_deg|"), F.col("idx").cast("string")], 4).alias(
            "d"
        ),
    )
    edges_idx = (
        deg.filter(F.col("d") > 0)
        .select(
            "idx",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.col("d"))
            ).alias("j"),
        )
        .select(
            "idx",
            _md5mod(
                [
                    F.lit("ppr_dst|"),
                    F.col("idx").cast("string"),
                    F.lit("|"),
                    F.col("j").cast("string"),
                ],
                n,
            ).alias("dst_idx"),
        )
    )
    edges = (
        edges_idx.join(
            idx.select(
                F.col("idx").alias("__si"), F.col("doc_id").alias("src")
            ),
            F.col("idx") == F.col("__si"),
        )
        .join(
            idx.select(
                F.col("idx").alias("__di"), F.col("doc_id").alias("dst")
            ),
            F.col("dst_idx") == F.col("__di"),
        )
        .select("src", "dst")
    )
    nodes = idx.select(F.col("doc_id").alias("node"))
    seeds = idx.filter(F.col("idx") % 20 == 0).select(
        F.col("doc_id").alias("node")
    )
    pr = personalized_pagerank(nodes, edges, seeds, iterations=5)
    return (
        pr.join(idx, pr["node"] == idx["doc_id"])
        .select(
            "doc_id",
            (F.col("idx") % 20 == 0).alias("is_seed"),
            "pr",
        )
    )


_TRIANGLE_GRAPH_CTES = """
    tg_docs AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        FROM documents
    ),
    tg_meta AS (SELECT count(*) AS n FROM tg_docs),
    tg_deg AS (
        SELECT idx,
               CAST(('0x' || substr(md5('tg_deg|' || CAST(idx AS VARCHAR)), 1, 15))
                    AS BIGINT) % 6 AS d
        FROM tg_docs
    ),
    tg_edges AS (
        SELECT g.idx AS src,
               (g.idx + 1
                + CAST(('0x' || substr(md5('tg_dst|' || CAST(g.idx AS VARCHAR)
                       || '|' || CAST(g.j AS VARCHAR)), 1, 15)) AS BIGINT) % 16)
                 % (SELECT n FROM tg_meta) AS dst
        FROM (SELECT idx, d, unnest(generate_series(1, d)) AS j
              FROM tg_deg WHERE d > 0) g
    )
"""


def _tg_link_graph(spark: SparkSession, sf_dir: str):
    """The small-world md5 link graph (0-5 out-links per doc into a
    16-wide local window) shared by the triangle and k-core queries —
    ONE Spark-side generator for the ONE _TRIANGLE_GRAPH_CTES oracle
    graph, so the two can never desynchronize one copy at a time.
    Returns the (src, dst) edge DataFrame."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    idx = _dense_doc_index(docs)
    n = idx.count()
    deg = idx.select(
        "idx",
        _md5mod([F.lit("tg_deg|"), F.col("idx").cast("string")], 6).alias("d"),
    )
    edges_idx = (
        deg.filter(F.col("d") > 0)
        .select(
            "idx",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.col("d"))
            ).alias("j"),
        )
        .select(
            "idx",
            (
                (
                    F.col("idx")
                    + 1
                    + _md5mod(
                        [
                            F.lit("tg_dst|"),
                            F.col("idx").cast("string"),
                            F.lit("|"),
                            F.col("j").cast("string"),
                        ],
                        16,
                    )
                )
                % F.lit(n)
            ).alias("dst_idx"),
        )
    )
    edges = (
        edges_idx.join(
            idx.select(F.col("idx").alias("__si"), F.col("doc_id").alias("src")),
            F.col("idx") == F.col("__si"),
        )
        .join(
            idx.select(F.col("idx").alias("__di"), F.col("doc_id").alias("dst")),
            F.col("dst_idx") == F.col("__di"),
        )
        .select("src", "dst")
    )
    return edges


@register(
    "doc_link_triangles",
    f"""
    WITH {_TRIANGLE_GRAPH_CTES},
    ed AS (
        SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS a,
                        greatest(d1.doc_id, d2.doc_id) AS b
        FROM tg_edges e
        JOIN tg_docs d1 ON d1.idx = e.src
        JOIN tg_docs d2 ON d2.idx = e.dst
        WHERE d1.doc_id != d2.doc_id
    ),
    tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM ed e1
        JOIN ed e2 ON e2.a = e1.b
        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    nds AS (
        SELECT u AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
    )
    SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM nds GROUP BY node
    """,
    headline=True,
)
def q_doc_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over a small-world md5 link graph
    (operators/graph.py triangle_count) — the clustering-coefficient
    numerator used for community/spam screening in link-graph curation.
    The graph draws 0-5 out-links per doc from a 16-wide local window
    (local windows make the triangle count scale linearly with corpus
    size; the uniform-target pagerank graph holds ~5 triangles at ANY
    size).  The Spark side enumerates via degree-ordered wedges
    (skew-safe compact-forward), the oracle via the canonical a<b
    three-way self-join — two INDEPENDENT enumeration orders that must
    agree on the exact multiset of per-node counts."""
    from .operators.graph import triangle_count

    edges = _tg_link_graph(spark, sf_dir)
    nodes_tri = triangle_count(edges)
    return nodes_tri.select(F.col("node").alias("doc_id"), "n_triangles")


@register(
    "doc_link_kcore",
    f"""
    WITH RECURSIVE {_TRIANGLE_GRAPH_CTES},
    kc_ed AS (
        SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS a,
                        greatest(d1.doc_id, d2.doc_id) AS b
        FROM tg_edges e
        JOIN tg_docs d1 ON d1.idx = e.src
        JOIN tg_docs d2 ON d2.idx = e.dst
        WHERE d1.doc_id != d2.doc_id
    ),
    kc_und AS (SELECT a, b FROM kc_ed UNION SELECT b, a FROM kc_ed),
    kc_it AS (
        SELECT 0 AS round,
               (SELECT list(DISTINCT a ORDER BY a) FROM kc_und) AS alive
        UNION ALL
        SELECT t.round + 1, nx.alive2
        FROM kc_it t, LATERAL (
            SELECT coalesce(list(n ORDER BY n),
                            CAST([] AS BIGINT[])) AS alive2
            FROM (
                SELECT u.a AS n FROM kc_und u
                WHERE list_contains(t.alive, u.a)
                  AND list_contains(t.alive, u.b)
                GROUP BY u.a HAVING count(*) >= 4
            ) kc_s
        ) nx
        WHERE nx.alive2 != t.alive AND t.round < 200
    ),
    kc_fin AS (
        SELECT CASE WHEN round >= 200 THEN error(
                   'kcore oracle: no fixpoint within the round cap — '
                   'mirror of the operator max_iters fail-fast')
               ELSE 1 END AS ok, alive
        FROM kc_it ORDER BY round DESC LIMIT 1
    )
    SELECT u.a AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
    FROM kc_und u, kc_fin f
    WHERE list_contains(f.alive, u.a) AND list_contains(f.alive, u.b)
    GROUP BY u.a
    """,
)
def q_doc_link_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the small-world md5 link graph
    (operators/graph.py kcore — Seidman peeling to fixpoint): the
    maximal subgraph where every document keeps >= 4 distinct
    neighbors, the dense-community extraction above triangle counting
    in link-graph curation.  The Spark side peels distributively
    (degree aggregate + edge anti-join per round, checkpointed); the
    oracle replays the SAME fixpoint with a single-row list-state
    recursive CTE — two independent formulations of the peeling that
    must agree on the exact surviving set AND each survivor's in-core
    degree."""
    from .operators.graph import kcore

    edges = _tg_link_graph(spark, sf_dir)
    return kcore(edges, 4).select(
        F.col("node").alias("doc_id"), "core_deg"
    )


def _lpa_oracle(rounds: int = 3) -> str:
    """Chained-CTE replay of synchronous label propagation over the
    shared md5 link graph: per round, per-(node, label) neighbor counts
    -> row_number argmax (count desc, label asc) -> left-join fallback
    to the old label for isolated nodes.  Runs in idx space (the
    doc_id <-> idx map is order-preserving, so min-label tie-breaks
    agree) and maps both node and community back to doc ids at the
    end."""
    cte = f"""
    WITH {_TRIANGLE_GRAPH_CTES},
    lp_nbrs AS (
        SELECT src AS v, dst AS u FROM tg_edges WHERE src != dst
        UNION
        SELECT dst AS v, src AS u FROM tg_edges WHERE src != dst
    ),
    lp_it0 AS (SELECT idx AS node, idx AS label FROM tg_docs)"""
    for t in range(1, rounds + 1):
        cte += f""",
    lp_c{t} AS (
        SELECT nb.v, l.label, count(*) AS c
        FROM lp_nbrs nb JOIN lp_it{t - 1} l ON l.node = nb.u
        GROUP BY nb.v, l.label
    ),
    lp_w{t} AS (
        SELECT v, label FROM (
            SELECT v, label,
                   row_number() OVER (
                       PARTITION BY v ORDER BY c DESC, label) AS rk
            FROM lp_c{t})
        WHERE rk = 1
    ),
    lp_it{t} AS (
        SELECT p.node, COALESCE(w.label, p.label) AS label
        FROM lp_it{t - 1} p LEFT JOIN lp_w{t} w ON w.v = p.node
    )"""
    return cte + f"""
    SELECT d.doc_id, c.doc_id AS community
    FROM lp_it{rounds} f
    JOIN tg_docs d ON d.idx = f.node
    JOIN tg_docs c ON c.idx = f.label
    """


@register("doc_link_communities", _lpa_oracle(), headline=True)
def q_doc_link_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the shared md5 link graph
    (operators/graph.py label_propagation — synchronous LPA, Raghavan
    et al. 2007): three deterministic rounds of adopt-the-most-frequent
    neighbor label with smallest-label ties, the host/domain community
    grouping web-curation pipelines run before per-community quotas.
    The oracle replays every round via chained CTEs with an INDEPENDENT
    argmax formulation (row_number window vs the Spark side's
    lexicographic struct max) — the two must agree on every node's
    community."""
    from .operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = _tg_link_graph(spark, sf_dir)
    return label_propagation(
        docs, edges, iterations=3, node_col="doc_id"
    ).select(F.col("node").alias("doc_id"), "community")


@register(
    "doc_link_prediction",
    f"""
    WITH {_TRIANGLE_GRAPH_CTES},
    lk_ed AS (
        SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS a,
                        greatest(d1.doc_id, d2.doc_id) AS b
        FROM tg_edges e
        JOIN tg_docs d1 ON d1.idx = e.src
        JOIN tg_docs d2 ON d2.idx = e.dst
        WHERE d1.doc_id != d2.doc_id
    ),
    lk_degf AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM lk_ed UNION ALL SELECT b FROM lk_ed
        ) GROUP BY node
    ),
    lk_e AS (
        SELECT a, b FROM lk_ed
        WHERE a NOT IN (SELECT node FROM lk_degf WHERE deg > 64)
          AND b NOT IN (SELECT node FROM lk_degf WHERE deg > 64)
    ),
    lk_deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM lk_e UNION ALL SELECT b FROM lk_e
        ) GROUP BY node
    ),
    lk_adj AS (
        SELECT a AS w, b AS nb FROM lk_e
        UNION ALL SELECT b AS w, a AS nb FROM lk_e
    ),
    lk_cn AS (
        SELECT x.nb AS a, y.nb AS b, CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000000 // dw.deg) AS BIGINT) AS ra
        FROM lk_adj x
        JOIN lk_adj y ON x.w = y.w AND x.nb < y.nb
        JOIN lk_deg dw ON dw.node = x.w
        GROUP BY x.nb, y.nb
    ),
    lk_new AS (
        SELECT c.a, c.b, c.cn, c.ra FROM lk_cn c
        WHERE c.cn >= 2 AND NOT EXISTS (
            SELECT 1 FROM lk_e e WHERE e.a = c.a AND e.b = c.b)
    )
    SELECT n.a, n.b, n.cn AS common_neighbors,
           da.deg AS deg_a, db.deg AS deg_b,
           (1000000 * n.cn) // (da.deg + db.deg - n.cn) AS jaccard_ppm,
           n.ra AS ra_ppm
    FROM lk_new n
    JOIN lk_deg da ON da.node = n.a
    JOIN lk_deg db ON db.node = n.b
    """,
    headline=True,
)
def q_doc_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction candidates over the shared md5 link graph
    (operators/graph.py link_prediction — Liben-Nowell & Kleinberg's
    common-neighbor + Jaccard predictors in exact integers, plus the
    Zhou/Lü/Zhang Resource-Allocation index as exact ppm wedge
    divisions): every NON-adjacent document pair sharing >= 2
    neighbors, with the neighborhood Jaccard and RA scores in exact
    ppm — the related-document / suggested-citation candidate
    generator.  The hub valve (degree
    > 64, non-binding on this graph but in the plan) caps the
    deg(w)^2 candidate blow-up a celebrity node would cause.  The
    oracle replays canonicalization, hub filter, the w-blocked pair
    census, the NOT-EXISTS freshness screen and both degree joins."""
    from .operators.graph import link_prediction

    edges = _tg_link_graph(spark, sf_dir)
    return link_prediction(
        edges, src_col="src", dst_col="dst", min_common=2, max_degree=64
    )


@register(
    "doc_link_assortativity",
    f"""
    WITH {_TRIANGLE_GRAPH_CTES},
    da_ed AS (
        SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS a,
                        greatest(d1.doc_id, d2.doc_id) AS b
        FROM tg_edges e
        JOIN tg_docs d1 ON d1.idx = e.src
        JOIN tg_docs d2 ON d2.idx = e.dst
        WHERE d1.doc_id != d2.doc_id
    ),
    da_und AS (SELECT a, b FROM da_ed UNION SELECT b, a FROM da_ed),
    da_deg AS (
        SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        FROM da_und GROUP BY a
    ),
    da_pairs AS (
        SELECT na.deg AS dx, nb.deg AS dy
        FROM da_und u
        JOIN da_deg na ON na.node = u.a
        JOIN da_deg nb ON nb.node = u.b
    ),
    da_m AS (
        SELECT CAST(count(*) AS HUGEINT) AS m,
               CAST(sum(dx) AS HUGEINT) AS sx,
               CAST(sum(dy) AS HUGEINT) AS sy,
               CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy,
               CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
               CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy
        FROM da_pairs
    )
    SELECT CAST((SELECT count(*) FROM da_deg) AS BIGINT) AS n_nodes,
           CAST(m // 2 AS BIGINT) AS n_edges,
           CAST(m AS BIGINT) AS m_pairs,
           CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN round(
                    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    6)
           END AS assortativity
    FROM da_m
    """,
)
def q_doc_link_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the shared small-world md5 link graph
    (operators/graph.py degree_assortativity — Newman PRL 2002): the
    one-number hubs-link-hubs structure KPI next to the triangle and
    k-core screens, over the SAME _tg_link_graph generator so all
    three read one graph.  Moment sums are exact DECIMAL/HUGEINT
    integers; the finish is corr_pairs' fixed-order double evaluation,
    bit-identical across engines."""
    from .operators.graph import degree_assortativity

    return degree_assortativity(_tg_link_graph(spark, sf_dir))


@register(
    "doc_link_clustering",
    f"""
    WITH {_TRIANGLE_GRAPH_CTES},
    cl_ed AS (
        SELECT DISTINCT least(d1.doc_id, d2.doc_id) AS a,
                        greatest(d1.doc_id, d2.doc_id) AS b
        FROM tg_edges e
        JOIN tg_docs d1 ON d1.idx = e.src
        JOIN tg_docs d2 ON d2.idx = e.dst
        WHERE d1.doc_id != d2.doc_id
    ),
    cl_tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM cl_ed e1
        JOIN cl_ed e2 ON e2.a = e1.b
        JOIN cl_ed e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    cl_tn AS (
        SELECT node, CAST(count(*) AS BIGINT) AS nt FROM (
            SELECT u AS node FROM cl_tri
            UNION ALL SELECT v FROM cl_tri
            UNION ALL SELECT w FROM cl_tri
        ) cl_nds GROUP BY node
    ),
    cl_deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM cl_ed
            UNION ALL SELECT b FROM cl_ed
        ) cl_ends GROUP BY node
    )
    SELECT d.node, d.deg,
           CAST(coalesce(t.nt, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.deg >= 2
                THEN (2000000 * coalesce(t.nt, 0)) // (d.deg * (d.deg - 1))
                END AS BIGINT) AS cc_ppm
    FROM cl_deg d LEFT JOIN cl_tn t USING (node)
    """,
)
def q_doc_link_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document local clustering coefficient over the shared
    small-world md5 link graph (operators/graph.py
    clustering_coefficient — Watts-Strogatz): the triangles/deg-pairs
    ratio read next to the raw triangle count as the community-vs-spam
    screen, in exact ppm (one truncating division of BIGINTs).  Rides
    the same _tg_link_graph generator as triangles/k-core/
    assortativity; the oracle enumerates triangles via the canonical
    a<b three-way self-join — an independent order that must agree on
    every per-node count."""
    from .operators.graph import clustering_coefficient

    return clustering_coefficient(_tg_link_graph(spark, sf_dir))
