"""Stateful streaming operators (SURVEY.md §2.10 'stateful').

``incremental_find_first`` is the streaming analogue of the engine's
signature batch operator (operators/find_first.py; reference
exporter.py:75-87): as dataset rows arrive on a stream, each data ID's
current winner — the dataset from the earliest collection in the chain —
is maintained in keyed state and re-emitted whenever it improves.

Implementation: ``applyInPandasWithState`` — Arrow-batched per-key state,
update output mode.  State per data ID is just (best_position,
best_tie_breaker, best_row), so state size is O(distinct data IDs) and
independent of stream length; a production deployment would add a state
TTL via ``GroupStateTimeout`` keyed on event time.

Emissions are monotone per key (position, tie) only ever decreases, so a
downstream consumer can reduce with min() to recover the exact batch
find-first result — that equivalence is the unit-test contract.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def incremental_find_first(
    datasets: DataFrame,
    chain_positions: dict[str, int],
    data_id_cols: Sequence[str],
    *,
    collection_col: str = "run",
    id_col: str = "dataset_id_hex",
) -> DataFrame:
    """Maintain the find-first winner per data ID over a (streaming)
    DataFrame of dataset rows.

    ``chain_positions`` is the flattened chain as a plain dict (catalog
    metadata — driver-resident, serialized into the closure, the streaming
    equivalent of broadcasting the chain-position map).

    Works on both batch and streaming inputs; emits
    (data_id_cols..., position, dataset_id_hex, run) rows whenever a key's
    winner improves.
    """
    id_fields = [datasets.schema[c] for c in data_id_cols]
    out_schema = StructType(
        [
            *[StructField(f.name, f.dataType) for f in id_fields],
            StructField("position", IntegerType()),
            StructField(id_col, StringType()),
            StructField(collection_col, StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("position", IntegerType()),
            StructField("tie", StringType()),
            StructField("collection", StringType()),
        ]
    )
    pos_map = dict(chain_positions)
    key_cols = list(data_id_cols)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            best_pos, best_tie, best_coll = state.get
        else:
            best_pos, best_tie, best_coll = None, None, None
        improved = False
        for pdf in pdfs:
            for coll, tie in zip(pdf[collection_col], pdf[id_col]):
                pos = pos_map.get(coll)
                if pos is None:
                    continue  # not in the chain -> not a candidate
                cand = (pos, tie)
                if best_pos is None or cand < (best_pos, best_tie):
                    best_pos, best_tie, best_coll = pos, tie, coll
                    improved = True
        if improved:
            state.update((best_pos, best_tie, best_coll))
            yield pd.DataFrame(
                [[*key, best_pos, best_tie, best_coll]],
                columns=[*key_cols, "position", id_col, collection_col],
            )

    return (
        datasets.groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
