"""Streaming geofence enrichment — the classic location-alerting shape.

``stream_geofence`` joins a stream of points against a STATIC fence set
(the stream-static pattern: fences are dimension data, read once and
broadcast per batch) using the exact integer point-in-polygon operator
(operators/spatial.py point_in_polygon) and appends the containment
facts to a catalog table with exactly-once semantics (idempotent
foreachBatch, batch-id watermark on the commit — the pattern shared by
every sink in this package).

Because the containment test is a pure per-point function of the static
fences, the streamed table equals the batch operator over all delivered
rows regardless of micro-batch cuts — equivalence-tested.

Scale per batch: the bbox-cell equi-join + row-local ray cast (never
points x fences); the fence side re-derives per batch but is
dimension-sized by contract (build it once and pass the DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.spatial import point_in_polygon
from ..plans.catalog import Catalog
from .sinks import batch_meta_key, maybe_auto_compact

HITS_TABLE = "geofence_hits"


def stream_geofence(
    stream_pts: DataFrame,
    polygons: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    x_col: str,
    y_col: str,
    id_col: str,
    poly_id_col: str,
    vertices_col: str,
    cell_size: int,
    hits_table: str = HITS_TABLE,
    max_cells_per_poly: int = 4096,
    trigger_available_now: bool = True,
    auto_compact_roots: int | None = None,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Start the geofence stream: per micro-batch, every point's fence
    containments (id, poly_id, on_boundary) append to ``hits_table`` in
    ONE exactly-once catalog commit."""
    meta_key = batch_meta_key(
        f"geofence:{hits_table}", checkpoint_dir, stream_name
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        hits = point_in_polygon(
            batch_df,
            polygons,
            x_col=x_col,
            y_col=y_col,
            id_col=id_col,
            poly_id_col=poly_id_col,
            vertices_col=vertices_col,
            cell_size=cell_size,
            max_cells_per_poly=max_cells_per_poly,
        )
        txn = cat.begin()
        txn.stage(hits_table, hits, mode="append")
        cat.commit(txn, meta={meta_key: batch_id})
        maybe_auto_compact(
            cat, batch_df.sparkSession, [hits_table], auto_compact_roots
        )

    writer = stream_pts.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
