"""Relational + pipeline operators (SURVEY §2) and north-star extensions."""

from annotations_ingester_spark.operators.filters import (
    match_predicate,
    range_filter,
    valid_text_filter,
)
from annotations_ingester_spark.operators.antijoin import skip_processed
from annotations_ingester_spark.operators.explode import (
    explode_entities,
    prefix_project,
)
from annotations_ingester_spark.operators.windows import date_windows, window_segment

__all__ = [
    "valid_text_filter",
    "range_filter",
    "match_predicate",
    "skip_processed",
    "explode_entities",
    "prefix_project",
    "date_windows",
    "window_segment",
]
