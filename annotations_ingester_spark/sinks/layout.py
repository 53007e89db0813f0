"""Physical layout helpers — the partitioning strategy that holds at 100 TB.

Two layout tools and the reasoning behind them:

- ``write_date_partitioned``: corpus partitioned by a derived date column
  (e.g. month of ``dct``). The B1 windowed runs then *prune* partitions
  instead of scanning the corpus — the reference's date-range scan
  (es_common.py:303-330) becomes a directory listing.
- ``write_bucketed``: corpus bucketed by the join key (``doc_id``). Joins
  between two tables bucketed the same way (documents ↔ processed-ids ↔
  annotations) are co-located: NO shuffle Exchange at all — at 1000
  executors this is the difference between a metadata operation and
  re-shuffling 100 TB. Verified by test: the bucketed join plan contains
  no Exchange.

Bucketing uses the session catalog (``saveAsTable``) because bucket
metadata lives in the metastore; on a cluster this is the lake catalog
(HMS/Glue/Unity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    date_col: str,
    granularity: str = "month",
    mode: str = "overwrite",
) -> None:
    part = F.date_format(
        F.to_date(F.col(date_col)), "yyyy-MM" if granularity == "month" else "yyyy-MM-dd"
    ).alias("_dt")
    df.withColumn("_dt", part).write.mode(mode).partitionBy("_dt").parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
