"""Schema registry: dimensions, dataset types, and load-order toposort.

The reference derives every table schema at runtime from the Butler
"dimension universe" (dimension_record_parquet.py:23, datasets_parquet.py:92-116
in /root/reference) and inserts dimension records in topologically sorted
dependency order so FK-like inserts succeed (importer.py:59-71).  This module
is the engine's data-driven equivalent (SURVEY.md §1.1, §2.7 O6, §7.4.5):
new dimensions / dataset types are registry rows, not code.

Virtual dimensions (``has_own_table=False``, e.g. the reference's ``band``
derived from ``physical_filter``) are skipped by import (importer.py:64-68 —
§2.3 P8).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Dimension:
    """One dimension element: key columns (the data ID part it governs),
    payload columns, and the dimensions it depends on.  ``types`` maps
    column name → Spark simpleString type (the registry is the single
    source of schema truth, reference dimension_record_parquet.py:23)."""

    name: str
    keys: tuple[str, ...]
    payload: tuple[str, ...] = ()
    depends_on: tuple[str, ...] = ()
    has_own_table: bool = True
    types: Mapping[str, str] = field(default_factory=dict)

    @property
    def columns(self) -> tuple[str, ...]:
        return self.keys + self.payload

    def struct_type(self) -> StructType:
        """Runtime StructType for this dimension's record table (the
        reference's make_arrow_schema, dimension_record_parquet.py:23)."""
        missing = [c for c in self.columns if c not in self.types]
        if missing:
            raise ValueError(f"dimension {self.name!r}: untyped columns {missing}")
        ddl = ", ".join(f"`{c}` {self.types[c]}" for c in self.columns)
        return StructType.fromDDL(ddl)


@dataclass(frozen=True)
class DatasetType:
    """A dataset type: its dimension group fixes the data-ID columns of its
    dataset table (datasets_parquet.py:92-116); ``is_calibration`` controls
    the find-first bypass (exporter.py:81-84)."""

    name: str
    dimensions: tuple[str, ...]
    storage_class: str = "Exposure"
    is_calibration: bool = False


@dataclass
class Universe:
    """The data-driven registry the pipelines consult."""

    dimensions: dict[str, Dimension] = field(default_factory=dict)
    dataset_types: dict[str, DatasetType] = field(default_factory=dict)

    def add_dimension(self, dim: Dimension) -> None:
        for dep in dim.depends_on:
            if dep not in self.dimensions:
                raise ValueError(f"dimension {dim.name!r}: unknown dependency {dep!r}")
        self.dimensions[dim.name] = dim

    def add_dataset_type(self, dt: DatasetType) -> None:
        for d in dt.dimensions:
            if d not in self.dimensions:
                raise ValueError(f"dataset type {dt.name!r}: unknown dimension {d!r}")
        self.dataset_types[dt.name] = dt

    def sorted_dimensions(self, names: Iterable[str] | None = None) -> list[str]:
        """Dependency-ordered dimension names (reference importer.py:59-63).

        Deterministic: ties broken alphabetically via static_order over a
        name-sorted insertion.  Driver-side — this orders load *stages*,
        not data (SURVEY.md §2.7 O6)."""
        wanted = set(names) if names is not None else set(self.dimensions)
        # Dependencies are always loaded too (FK targets must exist first).
        stack = list(wanted)
        while stack:
            for dep in self.dimensions[stack.pop()].depends_on:
                if dep not in wanted:
                    wanted.add(dep)
                    stack.append(dep)
        ts: TopologicalSorter[str] = TopologicalSorter()
        for name in sorted(wanted):
            ts.add(name, *sorted(d for d in self.dimensions[name].depends_on))
        return list(ts.static_order())

    def dataset_struct_type(self, dataset_type: str) -> StructType:
        """Runtime schema for a dataset type's table, constructed from its
        dimension group (the reference builds these per type at runtime,
        datasets_parquet.py:92-116): binary(16) dataset_id, run string,
        one typed column per data-ID key."""
        parts = ["`dataset_id` binary", "`run` string"]
        for c in self.data_id_columns(dataset_type):
            owner = next(
                (d for d in self.dimensions.values() if c in d.keys and c in d.types),
                None,
            )
            if owner is None:
                raise ValueError(
                    f"dataset type {dataset_type!r}: data-ID column {c!r} has "
                    "no typed owner dimension in the universe"
                )
            parts.append(f"`{c}` {owner.types[c]}")
        return StructType.fromDDL(", ".join(parts))

    def data_id_columns(self, dataset_type: str) -> list[str]:
        """The data-ID key columns of a dataset type's dimension group,
        dependency-ordered (low→high cardinality convention, reference
        dimension_record_parquet.py:54-56)."""
        dt = self.dataset_types[dataset_type]
        cols: list[str] = []
        for name in self.sorted_dimensions(dt.dimensions):
            if name in dt.dimensions:
                for k in self.dimensions[name].keys:
                    if k not in cols:
                        cols.append(k)
        return cols

    def to_manifest(self) -> dict:
        return {
            "dimensions": [
                {
                    "name": d.name,
                    "keys": list(d.keys),
                    "payload": list(d.payload),
                    "depends_on": list(d.depends_on),
                    "has_own_table": d.has_own_table,
                    "types": dict(d.types),
                }
                for d in self.dimensions.values()
            ],
            "dataset_types": [
                {
                    "name": t.name,
                    "dimensions": list(t.dimensions),
                    "storage_class": t.storage_class,
                    "is_calibration": t.is_calibration,
                }
                for t in self.dataset_types.values()
            ],
        }

    @classmethod
    def from_manifest(cls, doc: Mapping) -> "Universe":
        u = cls()
        for d in doc["dimensions"]:
            u.add_dimension(
                Dimension(
                    name=d["name"],
                    keys=tuple(d["keys"]),
                    payload=tuple(d["payload"]),
                    depends_on=tuple(d["depends_on"]),
                    has_own_table=d["has_own_table"],
                    types=dict(d.get("types", {})),
                )
            )
        for t in doc["dataset_types"]:
            u.add_dataset_type(
                DatasetType(
                    name=t["name"],
                    dimensions=tuple(t["dimensions"]),
                    storage_class=t["storage_class"],
                    is_calibration=t["is_calibration"],
                )
            )
        return u


def fixture_universe() -> Universe:
    """The universe describing the derived Butler-model fixtures
    (fixtures.py): nation ← customer, plus a virtual segment dimension."""
    u = Universe()
    u.add_dimension(
        Dimension(
            "nation",
            keys=("nation",),
            payload=("name", "region"),
            types={"nation": "int", "name": "string", "region": "int"},
        )
    )
    u.add_dimension(
        Dimension(
            "customer",
            keys=("customer",),
            payload=("nation", "mktsegment", "acctbal"),
            depends_on=("nation",),
            types={
                "customer": "bigint",
                "nation": "int",
                "mktsegment": "string",
                "acctbal": "double",
            },
        )
    )
    u.add_dimension(
        Dimension(
            "mktsegment",
            keys=("mktsegment",),
            depends_on=("customer",),
            has_own_table=False,
            types={"mktsegment": "string"},
        )
    )
    u.add_dataset_type(DatasetType("orders_raw", dimensions=("customer", "nation")))
    u.add_dataset_type(
        DatasetType(
            "orders_calib",
            dimensions=("customer", "nation"),
            storage_class="Calibration",
            is_calibration=True,
        )
    )
    return u
