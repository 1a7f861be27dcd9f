"""Path-rewriting column expressions (SURVEY.md §2.9 C3-C7, P9/C11).

The reference implements these as per-row Python string functions inside
its DatastoreMappingFunction plug point (import_dp1.py:83-122,
generate_dp1_file_tree.py:58-72, paths.py:18-25).  Here they are pure
Column expressions — JVM-side, whole-stage-codegen'd, no Python in the hot
path.  A user-supplied mapping can still be plugged in as a pandas UDF
(SURVEY.md §2.11); the three built-ins never need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC 3986 scheme: ALPHA *(ALPHA / DIGIT / "+" / "-" / ".").  The
# reference's narrower `^[\w+]+://` (import_dp1.py:92) misses schemes
# containing '-' or '.', letting e.g. 'my-scheme://...' slip past the
# guard whose whole job is rejecting unhandled absolute URIs.
ABSOLUTE_URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def prefix_replace(col: Column, old_prefix: str, new_prefix: str) -> Column:
    """C3: replace a literal path prefix (RSP layout rewrite,
    import_dp1.py:86-91).  Non-matching rows pass through unchanged."""
    return F.when(
        col.startswith(old_prefix),
        F.concat(F.lit(new_prefix), col.substr(F.lit(len(old_prefix) + 1), F.length(col))),
    ).otherwise(col)


def guard_no_absolute_uri(df: DataFrame, col_name: str) -> DataFrame:
    """C3 guard (import_dp1.py:92-95): after rewriting, any path that still
    looks like an absolute URI is an error."""
    bad = df.filter(F.col(col_name).rlike(ABSOLUTE_URI_RE))
    first = bad.limit(1).collect()
    if first:
        raise ValueError(f"unhandled absolute URI in {col_name}: {first[0][col_name]}")
    return df


def conditional_prefix_rewrite(
    col: Column,
    rules: list[tuple[str, str]],
    default_prefix: str,
) -> Column:
    """C4: first-match-wins prefix rules, else prepend a default prefix
    (Rucio layout, import_dp1.py:106-118)."""
    expr: Column | None = None
    for old, new in rules:
        branch = F.concat(
            F.lit(new), col.substr(F.lit(len(old) + 1), F.length(col))
        )
        expr = (
            F.when(col.startswith(old), branch)
            if expr is None
            else expr.when(col.startswith(old), branch)
        )
    default = F.concat(F.lit(default_prefix), col)
    return default if expr is None else expr.otherwise(default)


def strip_fragment(col: Column) -> Column:
    """C6: drop a '#fragment' load hint (generate_dp1_file_tree.py:67-72)."""
    return F.substring_index(col, "#", 1)


def absolutize(col: Column, root: str) -> Column:
    """C7: 'file://' paths become plain absolute paths; relative paths are
    joined under the datastore root (generate_dp1_file_tree.py:58-64)."""
    return F.when(
        col.startswith("file://"),
        col.substr(F.lit(8), F.length(col)),
    ).otherwise(F.concat(F.lit(root.rstrip("/") + "/"), col))


def validate_path_fragment(df: DataFrame, col_name: str) -> DataFrame:
    """P9/C11 (paths.py:18-25): reject path segments that could traverse
    outside the export tree; returns offending rows (empty = valid)."""
    return df.filter(~F.col(col_name).rlike(r"^\w+\.?\w*$"))
