"""Relational operators of the engine (SURVEY.md §2 inventory)."""

from gbif_filter_python_spark.operators.resolution import resolve_names
from gbif_filter_python_spark.operators.expansion import expand_children
from gbif_filter_python_spark.operators.spatial import zone_filter
from gbif_filter_python_spark.operators.tagging import (
    tag_existence,
    apply_tag_mode,
    apply_filter_mode,
)

__all__ = [
    "resolve_names",
    "expand_children",
    "zone_filter",
    "tag_existence",
    "apply_tag_mode",
    "apply_filter_mode",
]
