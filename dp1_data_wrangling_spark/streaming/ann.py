"""Streaming appends to the persisted IVF index (plans/ann_index.py).

An embedding corpus at ingest time grows continuously; rebuilding the
index per batch is a full-corpus job.  Incremental maintenance is the
standard IVF practice: the coarse quantizer is FROZEN (new vectors are
assigned to existing cells with the stored centroids — a broadcast +
row-local argmin, no shuffle beyond the partitioned write's file
routing), and each micro-batch appends its assigned vectors to the
cell-partitioned corpus table in one exactly-once catalog transaction.

Freshness/quality tradeoff, stated plainly: a frozen quantizer does not
drift with the data.  If the incoming distribution shifts, new vectors
pile into few cells (recall and pruning both degrade); the mitigation is
a periodic ``build_ivf_index`` rebuild — it retrains and republishes
ATOMICALLY, so queries see the old index until the rebuild commits, and
the streaming appender must then be restarted from a fresh checkpoint
against the new quantizer (the stored centroids it assigns against are
re-read per batch, but cell ids are only comparable within one
quantizer generation — the ``ann:build_id`` meta guards this).

Queries against a streamed-into index remain exactly the online
``ivf_topk_with_centroids`` result on the accumulated corpus with the
same centroids (equality-tested): assignment is deterministic row-local
math, so WHERE the vector arrived (build vs stream, batch split) cannot
change any query answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import _local_centroids, _nearest_cells
from ..plans.ann_index import CENTROIDS_TABLE, CORPUS_TABLE
from ..plans.catalog import Catalog
from .sinks import batch_meta_key, maybe_auto_compact


def stream_ivf_index_append(
    stream_vectors: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    auto_compact_roots: int | None = None,
) -> StreamingQuery:
    """Start the incremental index-maintenance stream.

    Requires a built index (``build_ivf_index``) — the stored centroids
    define the cell space.  Per batch: drop ids already indexed
    (cross-batch redelivery guard — an id-column-only scan of the corpus
    table), assign the rest row-locally against the stored centroids,
    append hive-partitioned by cell with the batch-id watermark in the
    SAME commit.  Long streams accumulate one txn root per batch — run
    ``Catalog.compact(..., partition_by=['cell'])`` periodically (safe
    under the OCC conflict check while the stream commits)."""
    meta_key = batch_meta_key("ann_append", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        if not cat.exists(CENTROIDS_TABLE):
            raise RuntimeError(
                "stream_ivf_index_append: no persisted index — run "
                "build_ivf_index first (the quantizer defines the cells)"
            )
        meta = cat.meta()
        if meta.get(meta_key) is not None and batch_id <= meta[meta_key]:
            return  # replay after recovery — already committed
        # Generation pin: cell ids are meaningless across quantizer
        # rebuilds.  The first batch records the build id; a later batch
        # seeing a different one means the index was rebuilt under this
        # stream — restart the appender from a fresh checkpoint.
        build_id = meta.get("ann:build_id")
        if build_id is None:
            # Catalog.commit treats a None meta value as a delete, so
            # passing it through would silently erase the pin and disable
            # the rebuild guard for the stream's whole lifetime.
            raise RuntimeError(
                "stream_ivf_index_append: persisted index carries no "
                "ann:build_id meta — rebuild it with build_ivf_index "
                "(the generation pin cannot protect an unversioned index)"
            )
        pinned = meta.get(f"{meta_key}:build")
        if pinned is not None and pinned != build_id:
            raise RuntimeError(
                f"stream_ivf_index_append: index was rebuilt (build "
                f"{pinned} -> {build_id}) under this stream; restart from "
                "a fresh checkpoint against the new quantizer"
            )
        spark = batch_df.sparkSession
        # Roots of the centroid table we are about to assign against: the
        # commit below carries require_roots on them, so a rebuild landing
        # BETWEEN this read and our commit aborts the batch (CommitConflict)
        # instead of committing old-generation cell ids into the rebuilt
        # corpus — the pre-batch build_id check alone cannot see that race.
        cent_roots = list(cat.manifest()["tables"][CENTROIDS_TABLE])
        cent_rows = cat.read(spark, CENTROIDS_TABLE).collect()
        cents_df = _local_centroids(
            spark, [(r["cell"], list(r["centroid"])) for r in cent_rows]
        )
        fresh = batch_df.select(F.col(id_col), F.col(vec_col)).join(
            cat.read(spark, CORPUS_TABLE).select(id_col).distinct(),
            id_col,
            "left_anti",
        )
        assigned = _nearest_cells(fresh, cents_df, 1, vec_col=vec_col)
        txn = cat.begin()
        txn.stage(CORPUS_TABLE, assigned, mode="append", partition_by=["cell"])
        cat.commit(
            txn,
            meta={meta_key: batch_id, f"{meta_key}:build": build_id},
            require_roots={CENTROIDS_TABLE: cent_roots},
        )
        # bound append-root growth, preserving the cell partitioning the
        # query-time pruning depends on
        maybe_auto_compact(
            cat, spark, [CORPUS_TABLE], auto_compact_roots,
            partition_by=["cell"],
        )

    writer = stream_vectors.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
