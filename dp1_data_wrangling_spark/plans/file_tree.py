"""File-tree pipeline: symlink-farm sink (reference
generate_dp1_file_tree.py → SURVEY.md §3.3, K12).

The reference streams the exported datastore records, rewrites each path
(absolutize, RSP remap, strip '#fragment'), and fans symlink creation out
over a 16-thread pool, tolerating ``FileExistsError`` because many records
share one file.  The Spark shape:

- path rewriting is pure column expressions (C3/C6/C7) — JVM-side,
  whole-stage-codegen'd;
- the side-effecting sink is ``foreachPartition``: executor-local loops,
  parallelism = partition count instead of a thread pool (G6);
- idempotent under task retries: an existing correct link is success, a
  conflicting one is an error (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import absolutize, prefix_replace, strip_fragment
from .importer import RSP_PREFIX, RSP_TARGET


def mapped_paths(
    records: DataFrame,
    datastore_root: str,
    *,
    path_col: str = "path",
) -> DataFrame:
    """(source, link) pairs for the symlink farm.

    ``source`` = the physical file (absolute, fragment stripped, reference
    generate_dp1_file_tree.py:58-72); ``link`` = the target-layout relative
    path (RSP remap of absolute URIs, else the path as-is)."""
    p = F.col(path_col)
    source = strip_fragment(absolutize(p, datastore_root))
    link = strip_fragment(
        F.when(
            p.startswith("file://"), prefix_replace(p, RSP_PREFIX, RSP_TARGET)
        ).otherwise(p)
    )
    return records.select(source.alias("source"), link.alias("link")).distinct()


def _create_links(tree_root: str, rows: Iterable) -> None:
    # Runs on executors; deliberately stdlib-only (pickled closure).
    for row in rows:
        dest = os.path.join(tree_root, row["link"])
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        try:
            os.symlink(row["source"], dest)
        except FileExistsError:
            # Many-to-one paths and task retries both land here; a link to
            # the same source is success, anything else is corruption.
            if os.readlink(dest) != row["source"]:
                raise FileExistsError(
                    f"{dest} exists and points elsewhere: "
                    f"{os.readlink(dest)} != {row['source']}"
                )


def generate_file_tree(
    records: DataFrame,
    tree_root: str,
    datastore_root: str,
    *,
    path_col: str = "path",
) -> int:
    """Materialize the symlink farm; returns the number of distinct links.

    Local-filesystem sink by design (like the reference): ``tree_root``
    must be visible to every executor (shared FS) — true on local[N] and on
    the reference's single-node deployment alike."""
    pairs = mapped_paths(records, datastore_root, path_col=path_col).cache()
    n = pairs.count()
    pairs.foreachPartition(lambda rows: _create_links(tree_root, rows))
    pairs.unpersist()
    return n
