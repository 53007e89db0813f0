"""Source connectors (SURVEY §2.1) behind one reader interface."""

from annotations_ingester_spark.sources.parquet import read_table
from annotations_ingester_spark.sources.elasticsearch import (
    es_read_options,
    es_write_options,
    read_es,
    write_es,
)

__all__ = ["read_table", "es_read_options", "es_write_options", "read_es", "write_es"]
