"""Sequence packing: group documents into fixed-token-budget sequences.

Training runs consume documents packed into fixed-capacity sequences
(e.g. 2048-token windows).  Greedy sequential packing — walk the docs in
a deterministic order, open a new sequence when the next doc would
overflow — is inherently stateful (each decision depends on the running
fill), so no window function expresses it.  This is the engine's
designed slow-path tier for such semantics (SURVEY.md §2.11): an
Arrow-batched ``applyInPandas`` per shard, NOT a row-at-a-time UDF.

Scale shape: packing is sharded — each shard packs independently, so the
operator is one shuffle on the shard key followed by embarrassingly
parallel per-shard state walks.  Shards are deterministic (doc_id
arithmetic), so the packing is reproducible run-to-run and replayable by
a DuckDB recursive CTE (the driver oracle for ``doc_pack_sequences``).

Packing rule (mirrored EXACTLY by the oracle SQL):
- docs are walked in ascending ``order_col`` within a shard;
- if the running fill plus the doc's tokens exceeds the budget, a new
  sequence opens and the doc starts it (fill resets to the doc's size);
- a doc larger than the whole budget therefore lands alone: it opens its
  own sequence and the very next doc overflows out of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DEFAULT_MAX_ROWS_PER_SHARD = 2_000_000


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int,
    shard_col: str = "shard",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_rows_per_shard: int | None = DEFAULT_MAX_ROWS_PER_SHARD,
) -> DataFrame:
    """Assign each doc a ``seq_id`` (per shard) by greedy sequential
    packing under ``budget`` tokens.  Adds ``seq_id``; preserves input
    columns.

    ``max_rows_per_shard`` is the executor-memory safety valve: one shard
    is materialized as ONE pandas DataFrame on one executor, so a skewed
    shard key (or a caller passing too-few shards for the corpus) would
    OOM the executor with no useful diagnostic.  A shard exceeding the cap
    raises with the shard id and the fix (more shards / different key)
    instead — fail loud, not fail silent-OOM.  Pass ``None`` to disable
    when shard sizes are externally bounded."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_rows_per_shard is not None and max_rows_per_shard <= 0:
        raise ValueError(
            f"max_rows_per_shard must be positive or None, got {max_rows_per_shard}"
        )

    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType: StructType.add mutates the instance, which would
    # corrupt the input DataFrame's cached schema object
    out_schema = StructType(
        list(docs.schema.fields) + [StructField("seq_id", LongType())]
    )
    order_idx = docs.columns.index(order_col)
    token_idx = docs.columns.index(token_col)

    shard_idx = docs.columns.index(shard_col)

    def pack(pdf):
        if max_rows_per_shard is not None and len(pdf) > max_rows_per_shard:
            shard = pdf.iloc[0, shard_idx] if len(pdf) else "?"
            raise ValueError(
                f"pack_sequences: shard {shard!r} holds {len(pdf)} rows, over "
                f"the {max_rows_per_shard}-row per-shard cap (one shard is one "
                f"in-memory pandas frame on one executor). Raise n_shards / "
                f"pick a less-skewed shard key, or pass a higher "
                f"max_rows_per_shard if executors have the memory."
            )
        pdf = pdf.sort_values(pdf.columns[order_idx]).reset_index(drop=True)
        seq, used = 0, 0
        ids = []
        for t in pdf[pdf.columns[token_idx]]:
            t = int(t)
            if used + t > budget and used > 0:
                seq += 1
                used = 0
            ids.append(seq)
            used += t
        pdf["seq_id"] = ids
        return pdf

    return docs.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


def with_shards(docs: DataFrame, n_shards: int, key_col: str = "doc_id") -> DataFrame:
    """Deterministic shard assignment (key modulo): reproducible and
    oracle-replayable, unlike hash-partitioning internals."""
    return docs.withColumn("shard", (F.col(key_col) % n_shards).cast("long"))
