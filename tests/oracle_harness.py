"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL, compares row count, sorted column
names, and the order-insensitive multiset of normalized row values.  Uses
Arrow on both sides so int64/binary/timestamps keep full fidelity (pandas
would coerce nullable int64 to lossy float64 — begin_nsec is ~1e18).
"""

from __future__ import annotations

import datetime
import math
from collections import Counter

import duckdb

from dp1_data_wrangling_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rows(table) -> tuple[list[str], Counter]:
    cols = sorted(table.column_names)
    data = table.to_pylist()
    return cols, Counter(tuple(_norm(r[c]) for c in cols) for r in data)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    spark_tbl = spark_df.toArrow()
    oracle_tbl = con.sql(sql).arrow()
    s_cols, s_rows = _rows(spark_tbl)
    o_cols, o_rows = _rows(oracle_tbl)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    assert sum(s_rows.values()) == sum(o_rows.values()), (
        f"{name}: row count {sum(s_rows.values())} != {sum(o_rows.values())}"
    )
    if s_rows != o_rows:
        only_s = list((s_rows - o_rows).items())[:3]
        only_o = list((o_rows - s_rows).items())[:3]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {only_s}\n oracle-only: {only_o}"
        )
