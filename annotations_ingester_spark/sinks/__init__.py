"""Sink-side operators (SURVEY §2.8, W1-W4): writers with semantics."""

from annotations_ingester_spark.sinks.writers import (
    merge_annotation_sets,
    write_flat,
    write_nested,
    write_partitioned,
)

__all__ = ["write_flat", "write_partitioned", "write_nested", "merge_annotation_sets"]
