"""Parquet source/sink — the hermetic test backend and the lake-side twin
of the reference's Elasticsearch indices (SURVEY §1.5: index ↔ table).

Scans benefit from Catalyst pushdown automatically: id/range predicates and
column pruning reach the parquet reader (S1/S3/S4/P1 for free). At 100 TB,
``maxPartitionBytes`` (session.py) sizes scan tasks; date/type-partitioned
layouts (sinks/writers.py) give partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
