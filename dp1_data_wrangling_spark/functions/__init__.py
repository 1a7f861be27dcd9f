"""Column-expression function libraries (SURVEY.md §2.9)."""

from .paths import (
    absolutize,
    conditional_prefix_rewrite,
    guard_no_absolute_uri,
    prefix_replace,
    strip_fragment,
    validate_path_fragment,
)

__all__ = [
    "prefix_replace",
    "conditional_prefix_rewrite",
    "strip_fragment",
    "absolutize",
    "guard_no_absolute_uri",
    "validate_path_fragment",
]
