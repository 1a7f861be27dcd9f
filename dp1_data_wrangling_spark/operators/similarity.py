"""Similarity search over embedding columns (BASELINE.json north star).

Two tiers, mirroring what a 100 TB embedding corpus needs:

- **Brute-force cosine top-k** — the correctness baseline.  Probes are
  broadcast (they are the small side by construction); candidates stream
  through a single narrow projection; per-partition partial top-k happens
  inside the window/TakeOrdered machinery, so no executor materializes the
  full probe x corpus product.  Dot products are JVM expressions
  (zip_with + aggregate) — no Python in the loop.
- **LSH-bucketed cosine** — a scale path: random-hyperplane
  signatures (deterministic md5-derived planes, no RNG state) bucket both
  sides; candidates are an equi-join on (plane-set, signature); exact
  cosine re-ranks inside buckets.  Recall is tunable via n_planes/n_tables.
  ``pyspark.ml.feature.BucketedRandomProjectionLSH`` offers the same under
  ml pipelines; this implementation keeps everything in plain DataFrame
  ops (no ml Vector conversion cost) and keeps determinism.
- **IVF-bucketed cosine** — the other scale path: a coarse quantizer
  (fixed centroid set) assigns every corpus vector to its nearest-centroid
  cell once; a probe fans out to its ``nprobe`` nearest cells and re-ranks
  exactly inside them.  Candidates are an equi-join on cell id — at 100 TB
  the corpus side is partitioned (and can be physically bucketed) by cell,
  so a probe touches ``nprobe/n_cells`` of the data.  Centroids here are
  deterministic corpus samples (no k-means RNG); production would train
  them offline and broadcast.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tables import spread


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i as a strict left fold in double (JVM, deterministic).

    zip_with + fold, the r12 form, RESTORED in r14 after a same-window
    interleaved A/B (bench_runs/ab_dot_fold.json, VERDICT r13 item 3):
    the r13 index fold (two ``element_at`` lookups per step over
    ``sequence(1, size)``) looked like a wash in isolation but lost in
    the driver's ground-truth run (cosine_topk 0.65x,
    embedding_semantic_dedup 0.80x) and lost the A/B on 2 of 3 query
    mins and all 3 means — per-step ``element_at`` bounds checks cost
    more than the zip's one transient array the fold consumes
    immediately.  zip_with also NULLs the whole product on mismatched
    vector lengths (the shorter side pads with NULL), which is the
    safe answer the index fold silently got wrong (it returned a
    partial sum when size(a) < size(b) — VERDICT r13 item 4)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Top-k cosine neighbors per probe (excluding self).

    Returns (probe_id, neighbor_id, sim, rank).  ``round_digits`` rounds
    the similarity before ranking so ordering is reproducible across
    engines; ties break on neighbor id."""
    # Norms are computed ONCE per row on each side (not per pair inside the
    # cross join — that would redo the O(dim) fold probes×corpus times).
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__probe_vec"),
        l2_norm(F.col(vec_col)).alias("__probe_norm"),
    )
    # The probe×corpus product is evaluated over corpus partitions (probes
    # broadcast) — spread the corpus so the O(dim) folds parallelize.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cand_vec"),
        l2_norm(F.col(vec_col)).alias("__cand_norm"),
    )
    sim = dot(F.col("__probe_vec"), F.col("__cand_vec")) / (
        F.col("__probe_norm") * F.col("__cand_norm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@functools.lru_cache(maxsize=None)
def _plane(table: int, plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic pseudo-random hyperplane: component signs from md5
    bytes (no RNG object, reproducible everywhere).  Memoized — every
    lsh_topk call otherwise re-derives n_tables x n_planes x dim md5s in
    driver-side Python just to rebuild identical literals."""
    import hashlib

    out: list[float] = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()
        out.append(1.0 if h[0] % 2 else -1.0)
    return tuple(out)


def lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """IVF/LSH-bucketed approximate top-k: signature = sign pattern under
    ``n_planes`` hyperplanes, repeated over ``n_tables`` tables for recall;
    exact cosine re-ranks within candidate buckets."""

    def signature(df: DataFrame, out_id: str) -> DataFrame:
        sigs = []
        for t in range(n_tables):
            bits = []
            for pl in range(n_planes):
                plane = _plane(t, pl, dim)
                proj = F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(v) for v in plane]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**pl))
            sig = bits[0]
            for b in bits[1:]:
                sig = sig + b
            sigs.append(F.struct(F.lit(t).alias("table"), sig.alias("sig")))
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"__{out_id}_vec"),
            F.explode(F.array(*sigs)).alias("ts"),
        ).select(out_id, f"__{out_id}_vec", F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))

    ps = signature(spread(probes), "probe_id")
    cs = signature(spread(corpus), "neighbor_id")
    cand = (
        ps.join(cs, ["table", "sig"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__probe_id_vec"), F.col("__neighbor_id_vec")), 6
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse-quantizer centroids: the ``n_cells`` corpus
    vectors with the smallest md5(id) — a uniform pseudo-random sample
    with no RNG state, reproducible across runs and engines.  Production
    IVF would k-means these offline; the operator contract (small
    broadcastable (cell, centroid) table) is identical.

    Selection is sort+limit (TakeOrderedAndProject: per-partition top-N,
    merged on the driver) — never a global window, which would funnel the
    whole corpus through one task.  The cell-numbering window then runs
    over only ``n_cells`` rows."""
    sample = (
        corpus.select(
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("__key"),
            F.col(id_col),
            F.col(vec_col),
        )
        .orderBy("__key", id_col)
        .limit(n_cells)
    )
    w = Window.orderBy("__key", id_col)
    return sample.select(
        (F.row_number().over(w) - 1).alias("cell"),
        F.col(vec_col).alias("centroid"),
    )


def _nearest_cells(
    df: DataFrame,
    centroids: DataFrame,
    n_take: int,
    *,
    vec_col: str,
    out_cell: str = "cell",
) -> DataFrame:
    """Attach the ``n_take`` nearest cell ids (by cosine to the centroid)
    as an exploded column.  Centroids are broadcast; the argmin happens
    JVM-side via a sorted array-of-struct fold (no shuffle on the big
    side)."""
    cent = F.broadcast(
        centroids.groupBy().agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cell"), F.col("centroid")))
            ).alias("__cells")
        )
    )
    # Order by -cosine ascending == cosine descending; slice the top cells.
    top = F.expr(
        f"transform(slice(array_sort(transform(__cells, c -> struct("
        f"  -(aggregate(zip_with({vec_col}, c.centroid, (x, y) -> cast(x as double) * cast(y as double)),"
        f"            cast(0.0 as double), (acc, v) -> acc + v)"
        f"  / sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * cast(x as double)),"
        f"               cast(0.0 as double), (acc, v) -> acc + v)"
        f"     * aggregate(transform(c.centroid, x -> cast(x as double) * cast(x as double)),"
        f"                 cast(0.0 as double), (acc, v) -> acc + v))) AS negsim,"
        f"  c.cell AS cell))), 1, {n_take}), s -> s.cell)"
    )
    return df.crossJoin(cent).withColumn(out_cell, F.explode(top)).drop("__cells")


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to their single nearest
    cell, fan each probe out to its ``nprobe`` nearest cells, re-rank
    exactly inside the visited cells.

    Scale shape: ONE narrow shuffle on cell id for the candidate equi-join
    (or zero if the corpus is pre-bucketed by cell on disk); centroids
    broadcast; everything JVM expressions."""
    # Materialize the centroid table once (it is n_cells rows by
    # construction) — both _nearest_cells calls would otherwise re-run the
    # corpus-wide sample sort underneath it.
    cent_rows = ivf_centroids(corpus, n_cells, vec_col=vec_col, id_col=id_col).collect()
    cents = _local_centroids(
        corpus.sparkSession,
        [(r["cell"], list(r["centroid"])) for r in cent_rows],
    )
    return ivf_topk_with_centroids(
        probes, corpus, k, cents, nprobe=nprobe, vec_col=vec_col, id_col=id_col
    )


def _local_centroids(spark, pairs: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(
            {"cell": [c for c, _ in pairs], "centroid": [v for _, v in pairs]}
        ),
        schema="cell int, centroid array<float>",
    )


def ivf_topk_with_centroids(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    cents: DataFrame,
    *,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search against an explicit (cell, centroid) table — the shared
    core of ``ivf_topk`` (sampled quantizer) and ``ivf_topk_trained``
    (k-means quantizer).  ``cents`` must be driver-small (it broadcasts)."""
    c_assigned = _nearest_cells(
        spread(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__c_vec")
        ),
        cents,
        1,
        vec_col="__c_vec",
    )
    p_assigned = _nearest_cells(
        spread(probes).select(
            F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__p_vec")
        ),
        cents,
        nprobe,
        vec_col="__p_vec",
    )
    cand = (
        p_assigned.join(c_assigned, "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine(F.col("__p_vec"), F.col("__c_vec")), 6).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    n_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer —
    deterministic end to end.

    Init is the md5-sampled ``ivf_centroids`` (no RNG state); each
    iteration is (a) assign: broadcast centroids, row-local argmin with
    cell-id tie-break — no shuffle on the corpus; (b) re-center: ONE
    map-side-combinable groupBy per iteration over ``posexplode``d
    dimensions, summing **fixed-point micros as BIGINT** — associative,
    so the new centroids are bit-identical under any partitioning (a
    double sum would be accumulation-order-dependent and break the
    repo-wide determinism contract).  Only ``n_cells x dim`` partial-sum
    rows ever reach the driver per iteration (the same driver-holds-
    catalogs-never-facts rule as ``ivf_topk``'s centroid collect).

    An emptied cell keeps its previous centroid (standard Lloyd's
    degeneracy handling) so the quantizer never loses cells.

    Returns plain (cell, centroid) pairs — feed ``_local_centroids`` /
    ``ivf_topk_with_centroids``, or persist as a catalog table for reuse
    across queries (production trains once, searches many times).
    """
    spark = corpus.sparkSession
    vecs = spread(corpus).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    )
    cur = [
        (r["cell"], [float(x) for x in r["centroid"]])
        for r in ivf_centroids(
            corpus, n_cells, vec_col=vec_col, id_col=id_col
        ).collect()
    ]
    for _ in range(n_iters):
        cents = _local_centroids(spark, cur)
        assigned = _nearest_cells(vecs, cents, 1, vec_col="__vec")
        sums = (
            assigned.select("cell", F.posexplode("__vec").alias("pos", "x"))
            .withColumn(
                "micros", F.round(F.col("x").cast("double") * 1e6).cast("bigint")
            )
            .groupBy("cell", "pos")
            .agg(F.sum("micros").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums.collect():  # n_cells x dim rows — driver-small
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["n"])
        cur = [
            (
                cell,
                [
                    by_cell[cell][p][0] / by_cell[cell][p][1] / 1e6
                    for p in range(len(old))
                ]
                if cell in by_cell
                else old,
            )
            for cell, old in cur
        ]
    return cur


def ivf_topk_trained(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    n_cells: int = 16,
    nprobe: int = 4,
    n_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k with a k-means-trained coarse quantizer: tighter cells
    than the sampled quantizer -> better recall at the same nprobe.
    Training cost is n_iters x (broadcast-assign + one combinable
    groupBy); search is identical to ``ivf_topk``."""
    cents = _local_centroids(
        corpus.sparkSession,
        kmeans_centroids(
            corpus, n_cells, n_iters=n_iters, vec_col=vec_col, id_col=id_col
        ),
    )
    return ivf_topk_with_centroids(
        probes, corpus, k, cents, nprobe=nprobe, vec_col=vec_col, id_col=id_col
    )


# ---------------------------------------------------------------------------
# Product quantization (round 8)
# ---------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    *,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic PQ codebooks: slice the ``k_codes`` md5-smallest corpus
    vectors (the same RNG-free uniform sample as ``ivf_centroids``) into
    ``m`` contiguous subvectors — codebook entry (sub, code) is sample row
    ``code``'s slice ``sub``.

    Returns a tiny (m × k_codes)-row DataFrame ``(sub, code, cw)`` —
    broadcastable everywhere it is consumed.  Production PQ would k-means
    each subspace offline (see ``kmeans_centroids`` for the fixed-point
    recipe); the operator contract — a small frozen codebook table — is
    identical, and the sampled form keeps the whole pipeline replayable
    in the DuckDB oracle."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    sample = (
        corpus.select(
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("__key"),
            F.col(id_col),
            F.col(vec_col),
        )
        .orderBy("__key", id_col)
        .limit(k_codes)
    )
    # An underfilled codebook breaks the positional slice(__cb,
    # sub*k_codes+1, k_codes) lookups downstream (pq_encode/_pq_lut_expr
    # would read entries of the NEXT subspace), producing silently wrong
    # codes — fail loudly instead (ADVICE r8).  count() on a limit-k
    # sample is O(k), not a corpus scan.
    n_sample = sample.count()
    if n_sample < k_codes:
        raise ValueError(
            f"pq_codebooks needs >= k_codes={k_codes} corpus rows to fill "
            f"each subspace codebook, got {n_sample}; lower k_codes or "
            "grow the corpus"
        )
    w = Window.orderBy("__key", id_col)
    coded = sample.select(
        (F.row_number().over(w) - 1).alias("code"), F.col(vec_col).alias("__v")
    )
    return coded.select(
        "code",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> struct("
                f"s AS sub, transform(slice(__v, s * {d_sub} + 1, {d_sub}),"
                f" x -> cast(x as double)) AS cw))"
            )
        ).alias("e"),
    ).select(F.col("e.sub").alias("sub"), "code", F.col("e.cw").alias("cw"))


def _pq_cb_agg(codebooks: DataFrame) -> DataFrame:
    """One broadcastable row: the codebook as an array of structs sorted by
    (sub, code) — element ``sub * k + code`` is that entry, giving O(1)
    positional lookup inside JVM expressions."""
    return F.broadcast(
        codebooks.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub"), F.col("code"), F.col("cw")))
            ).alias("__cb")
        )
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    *,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Row-local PQ encoding: per subspace, the L2-nearest codeword (ties
    to the lowest code id).  Adds ``codes`` (array<int>, length m — the
    m-byte compressed representation that replaces the 4·dim-byte vector
    in a production index) and ``recon_norm2`` (squared norm of the
    implied reconstruction, probe-independent, computed once here so the
    ADC scan never touches codewords again).  Codebook is broadcast; ZERO
    shuffles on ``df``."""
    d_sub = dim // m
    codes = F.expr(
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_sort(transform(slice(__cb, s * {k_codes} + 1, {k_codes}), "
        f"e -> struct("
        f"aggregate(zip_with(slice({vec_col}, s * {d_sub} + 1, {d_sub}), e.cw,"
        f" (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        f" cast(0.0 as double), (acc, v) -> acc + v) AS dist,"
        f" e.code AS code)))[0].code)"
    )
    recon_norm2 = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m - 1}), (c, s) -> "
        f"aggregate(transform(__cb[s * {k_codes} + c].cw, x -> x * x),"
        f" cast(0.0 as double), (acc, v) -> acc + v)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return (
        df.crossJoin(_pq_cb_agg(codebooks))
        .withColumn("codes", codes)
        .withColumn("recon_norm2", recon_norm2)
        .drop("__cb")
    )


def _pq_lut_expr(m: int, k_codes: int, d_sub: int, vec: str = "__probe_vec") -> F.Column:
    """Per-probe ADC lookup table: dot(probe subvector, codeword) for all
    m x k_codes entries — k_codes·dim flops once per probe, after which
    every candidate costs m array lookups."""
    return F.expr(
        f"transform(sequence(0, {m * k_codes - 1}), i -> "
        f"aggregate(zip_with(slice({vec}, (i div {k_codes}) * {d_sub} + 1,"
        f" {d_sub}), __cb[i].cw, (x, y) -> cast(x as double) * y),"
        f" cast(0.0 as double), (acc, v) -> acc + v))"
    )


def _pq_adc_sim(m: int, k_codes: int) -> F.Column:
    """ADC cosine estimate from a probe's ``__lut`` and a candidate's
    ``codes``/``recon_norm2``: m lookups + one division."""
    return F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m - 1}), (c, s) -> "
        f"__lut[s * {k_codes} + c]), cast(0.0 as double),"
        f" (acc, v) -> acc + v)"
    ) / (F.col("__probe_norm") * F.sqrt(F.col("recon_norm2")))


def pq_adc_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    shortlist: int = 25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ top-k with true Asymmetric Distance Computation (Jégou et al.
    2011, "Product quantization for nearest neighbor search"):

    1. each probe precomputes its LUT — dot(probe subvector, codeword)
       for all m × k_codes entries (k_codes·dim flops, ONCE per probe);
    2. the scan scores each encoded candidate with m LUT lookups instead
       of a dim-length fold — dim/m× less work per pair than brute force,
       over an index that stores m small ints per vector instead of dim
       floats (the 100 TB story: a 2 TB float corpus compresses to ~64 GB
       of codes, and the scan never touches raw vectors);
    3. the ADC ``shortlist`` is re-ranked with exact cosine and the top-k
       emitted as (probe_id, neighbor_id, sim, rank) — identical shape
       and determinism contract to ``brute_force_topk`` (rounded sims,
       neighbor-id tie-breaks).

    Codebook + probes broadcast; the only shuffles are the two per-probe
    top-N windows."""
    cb = pq_codebooks(
        corpus, dim=dim, m=m, k_codes=k_codes, vec_col=vec_col, id_col=id_col
    )
    d_sub = dim // m
    # the ADC scan and its top-N window move ONLY (probe_id, neighbor_id,
    # sim_adc) triples — codes stay on the scan side, vectors are joined
    # back for the <= shortlist survivors below (broadcast, no shuffle),
    # keeping the "the scan never touches raw vectors" contract in the
    # executed plan, not just the prose
    enc = pq_encode(
        spread(corpus), cb, dim=dim, m=m, k_codes=k_codes,
        vec_col=vec_col, id_col=id_col,
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "codes",
        "recon_norm2",
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("__probe_vec"),
            l2_norm(F.col(vec_col)).alias("__probe_norm"),
        )
        .crossJoin(_pq_cb_agg(cb))
        .withColumn("__lut", _pq_lut_expr(m, k_codes, d_sub))
        .drop("__cb")
    )
    sim_adc = _pq_adc_sim(m, k_codes)
    w_adc = Window.partitionBy("probe_id").orderBy(
        F.col("sim_adc").desc(), F.col("neighbor_id")
    )
    short = (
        F.broadcast(p.drop("__probe_vec"))
        .crossJoin(enc)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id", "neighbor_id", F.round(sim_adc, 9).alias("sim_adc")
        )
        .withColumn("__adc_rank", F.row_number().over(w_adc))
        .filter(F.col("__adc_rank") <= shortlist)
        .select("probe_id", "neighbor_id")
    )
    cand_vec = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cand_vec"),
    )
    p_vec = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__probe_vec"),
        l2_norm(F.col(vec_col)).alias("__probe_norm"),
    )
    exact = F.round(
        dot(F.col("__probe_vec"), F.col("__cand_vec"))
        / (F.col("__probe_norm") * l2_norm(F.col("__cand_vec"))),
        6,
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cand_vec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(p_vec), "probe_id")
        .select("probe_id", "neighbor_id", exact.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    dim: int,
    n_cells: int = 16,
    nprobe: int = 8,
    m: int = 16,
    k_codes: int = 16,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: the production ANN index shape (FAISS ``IVFPQ``) — a coarse
    quantizer cuts the scan to ``nprobe / n_cells`` of the corpus, and
    inside the visited cells candidates are scored by PQ ADC lookups over
    m-byte codes, with an exact re-rank of the ``shortlist``.

    The two levers compose multiplicatively at 100 TB: the cell join
    touches nprobe/n_cells of the rows, and each touched row costs m LUT
    lookups against its codes instead of a dim-length float fold (and the
    scan reads ~m bytes/row, not 4·dim).  Codes are computed on the RAW
    vectors, not cell residuals (FAISS ``by_residual=False``) — one
    corpus-wide codebook, one LUT per probe (not per visited cell), and a
    pipeline a SQL oracle can replay; residual encoding buys recall only
    when cells are tight, which random/high-entropy embedding corpora are
    not.

    Plan shape: centroids + codebook + probes broadcast; ONE narrow
    shuffle on cell id for the candidate join (zero if the corpus is
    pre-bucketed by cell, as ``plans/ann_index.py`` persists it); the
    per-probe top-N windows shuffle only scored candidate rows."""
    cent_rows = ivf_centroids(
        corpus, n_cells, vec_col=vec_col, id_col=id_col
    ).collect()
    cents = _local_centroids(
        corpus.sparkSession,
        [(r["cell"], list(r["centroid"])) for r in cent_rows],
    )
    cb = pq_codebooks(
        corpus, dim=dim, m=m, k_codes=k_codes, vec_col=vec_col, id_col=id_col
    )
    d_sub = dim // m
    enc = pq_encode(
        spread(corpus), cb, dim=dim, m=m, k_codes=k_codes,
        vec_col=vec_col, id_col=id_col,
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cand_vec"),
        "codes",
        "recon_norm2",
    )
    # cell assignment is row-local and needs the raw vector; AFTER it the
    # vector is dropped so the cell join + ADC window move only codes and
    # (probe_id, neighbor_id, sim_adc) — vectors come back for the
    # <= shortlist survivors via broadcast joins (no shuffle), keeping
    # "the scan reads ~m bytes/row" true in the executed plan
    c_assigned = _nearest_cells(enc, cents, 1, vec_col="__cand_vec").drop(
        "__cand_vec"
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("__probe_vec"),
            l2_norm(F.col(vec_col)).alias("__probe_norm"),
        )
        .crossJoin(_pq_cb_agg(cb))
        .withColumn("__lut", _pq_lut_expr(m, k_codes, d_sub))
        .drop("__cb")
    )
    p_assigned = _nearest_cells(p, cents, nprobe, vec_col="__probe_vec").drop(
        "__probe_vec"
    )
    sim_adc = _pq_adc_sim(m, k_codes)
    w_adc = Window.partitionBy("probe_id").orderBy(
        F.col("sim_adc").desc(), F.col("neighbor_id")
    )
    short = (
        p_assigned.join(c_assigned, "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id", "neighbor_id", F.round(sim_adc, 9).alias("sim_adc")
        )
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("__adc_rank", F.row_number().over(w_adc))
        .filter(F.col("__adc_rank") <= shortlist)
        .select("probe_id", "neighbor_id")
    )
    cand_vec = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cand_vec"),
    )
    p_vec = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__probe_vec"),
        l2_norm(F.col(vec_col)).alias("__probe_norm"),
    )
    exact = F.round(
        dot(F.col("__probe_vec"), F.col("__cand_vec"))
        / (F.col("__probe_norm") * l2_norm(F.col("__cand_vec"))),
        6,
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cand_vec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(p_vec), "probe_id")
        .select("probe_id", "neighbor_id", exact.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
