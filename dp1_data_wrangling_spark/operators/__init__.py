"""Engine operators.

Each module re-expresses one capability family from SURVEY.md §2 as a
composition of native Spark DataFrame primitives (no RDDs, no row-at-a-time
Python in the hot path).
"""

from .chains import flatten_chains
from .find_first import find_first
from .intervals import asof_lookup, check_no_overlaps, overlapping_pairs
from .priority_dedup import priority_dedup

__all__ = [
    "find_first",
    "priority_dedup",
    "flatten_chains",
    "check_no_overlaps",
    "overlapping_pairs",
    "asof_lookup",
]
