"""Persisted IVF vector index: the ANN corpus as a cell-partitioned
catalog table.

``operators/similarity.ivf_topk`` assigns the corpus to cells at query
time — one pass over every vector per query batch.  At 100 TB the
assignment belongs on DISK: ``build_ivf_index`` trains the k-means coarse
quantizer once, assigns every vector to its nearest cell, and publishes
the corpus hive-partitioned BY CELL (plus the centroid table) in one
atomic catalog transaction.  ``ivf_query_index`` then reads only the
``nprobe`` cells its probes map to — Spark's partition pruning turns the
cell filter into a directory-level skip, so a query touches
``nprobe / n_cells`` of the corpus bytes and needs NO corpus-side shuffle
at all (the SCALE.md "pre-bucket corpus by cell on disk" path, made
real and plan-gated by ``test_ivf_index_query_prunes_partitions``).

Determinism: the quantizer is the fixed-point distributed k-means
(bit-identical under any partitioning), so rebuilding the index from the
same corpus reproduces the same layout, and an indexed query returns
EXACTLY what the online ``ivf_topk_trained`` returns with the same
parameters (equality-tested, not just recall-bounded).

Index freshness is the catalog's concern: rebuilds publish atomically
(readers see old or new index, never a mix), time travel keeps the old
index queryable, and ``Catalog.diff`` shows what a rebuild changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _local_centroids,
    _nearest_cells,
    cosine,
    kmeans_centroids,
)
from ..tables import spread
from .catalog import Catalog

CORPUS_TABLE = "ann/corpus"
CENTROIDS_TABLE = "ann/centroids"


def build_ivf_index(
    spark: SparkSession,
    catalog: Catalog,
    corpus: DataFrame,
    *,
    n_cells: int = 16,
    n_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Train the quantizer, assign the corpus, publish both atomically.

    The corpus lands hive-partitioned by ``cell``: one directory per
    cell, each internally one parquet stream — the layout queries prune
    against.  Assignment is broadcast-centroids + row-local argmin; the
    only shuffle is the partitioned write's file routing."""
    cents = kmeans_centroids(
        corpus, n_cells, n_iters=n_iters, vec_col=vec_col, id_col=id_col
    )
    cents_df = _local_centroids(spark, cents)
    assigned = _nearest_cells(
        spread(corpus).select(F.col(id_col), F.col(vec_col)),
        cents_df,
        1,
        vec_col=vec_col,
    )
    txn = catalog.begin()
    txn.stage(CORPUS_TABLE, assigned, mode="overwrite", partition_by=["cell"])
    txn.stage(CENTROIDS_TABLE, cents_df, mode="overwrite")
    # ann:build_id identifies the quantizer GENERATION: cell ids are only
    # comparable within one build, so incremental appenders (streaming/ann.py)
    # pin it and refuse to mix generations after a rebuild.
    catalog.commit(
        txn,
        meta={
            "ann:n_cells": n_cells,
            "ann:vec_col": vec_col,
            "ann:build_id": txn.txn_id,
        },
    )


def ivf_query_index(
    spark: SparkSession,
    catalog: Catalog,
    probes: DataFrame,
    k: int,
    *,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors from the persisted index.

    Probe cells are computed against the stored centroids (n_cells rows,
    collected — driver-small by construction); the distinct probed cells
    (``<= min(n_probes * nprobe, n_cells)``, also driver-small) become a
    partition-pruning ``IN`` filter on the corpus scan.  The candidate
    join is probe-side-broadcast onto an un-shuffled corpus stream."""
    cent_rows = catalog.read(spark, CENTROIDS_TABLE).collect()
    cents_df = _local_centroids(
        spark, [(r["cell"], list(r["centroid"])) for r in cent_rows]
    )
    p_assigned = _nearest_cells(
        spread(probes).select(
            F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__p_vec")
        ),
        cents_df,
        nprobe,
        vec_col="__p_vec",
    )
    cells = sorted(
        r["cell"] for r in p_assigned.select("cell").distinct().collect()
    )
    corpus = (
        catalog.read(spark, CORPUS_TABLE)
        .where(F.col("cell").isin(cells))
        .select(
            F.col("cell"),
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__c_vec"),
        )
    )
    from pyspark.sql import Window

    cand = (
        corpus.join(F.broadcast(p_assigned), "cell")
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
