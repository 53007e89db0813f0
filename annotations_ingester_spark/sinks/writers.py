"""Sink writers W1-W4 (SURVEY §2.8) over the parquet backend.

Elasticsearch equivalents (the production backend) are option-mapped in
``sources.elasticsearch``; these writers implement identical semantics on
parquet so the whole pipeline is testable hermetically:

- W1 flat append       → plain parquet append (deterministic row_id ⇒
  idempotent rewrite, reference: annotations_indexer.py:201-227).
- W2 split-by-field    → ``partitionBy(index_suffix)`` (reference derives a
  per-entity index suffix, annotations_indexer.py:214-218).
- W4 nested per-doc    → one row per doc with an annotations array
  (reference: doc_{id}_annotations, annotations_indexer.py:166-200).
- W3 same-index merge  → read-modify-write union+dedup of annotation sets
  (reference: painless scripted upsert, annotations_indexer.py:148-165);
  here a deterministic merge helper used by batch rewrites and
  streaming ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_flat(df: DataFrame, path: str, mode: str = "append") -> None:
    """W1: flat annotation rows. At 100 TB: writers scale with tasks; no
    shuffle is introduced by the write itself."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "index_suffix", mode: str = "append"
) -> None:
    """W2: per-type physical partitioning — the parquet twin of the ES
    dynamic resource pattern ``sink-{type}``. Readers of one type prune
    all other partitions (partition pruning replaces the reference's
    ``base-*`` wildcard search, es_common.py:141-142)."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_nested(df: DataFrame, path: str, mode: str = "append") -> None:
    """W4: per-doc combined rows (annotations array column)."""
    df.write.mode(mode).parquet(path)


def merge_annotation_sets(
    existing: DataFrame, new: DataFrame, dedup_cols: list[str] | None = None
) -> DataFrame:
    """W3/U2: old ∪ new with whole-record dedup — the engine-side
    equivalent of the reference's scripted-upsert merge + canonical-JSON
    dedup (annotations_indexer.py:148-165; utils.py:16-19).

    Deterministic and idempotent: re-merging the same batch is a no-op.
    """
    merged = existing.unionByName(new, allowMissingColumns=True)
    keys = dedup_cols or [
        f.name for f in merged.schema.fields if f.dataType.typeName() != "map"
    ]
    return merged.dropDuplicates(keys)


NUM_UPSERT_BUCKETS = 64


def _is_path_missing(exc: Exception) -> bool:
    """True only for the 'sink has never been written' AnalysisException.
    Anything else (corrupt footer, FS hiccup, permission error) must
    propagate — treating it as first-batch would silently replace the whole
    sink with the current micro-batch."""
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def upsert_nested_foreach_batch(
    path: str, doc_key: str = "ann_doc_id", num_buckets: int = NUM_UPSERT_BUCKETS
):
    """Build a ``foreachBatch`` function implementing the W4 upsert on a
    *bucketed* parquet sink. The ES backend instead maps to
    ``es.write.operation=upsert`` with the doc-keyed id (J2 point semi-join
    done by the store; reference scripted upsert
    annotations_indexer.py:148-200).

    Layout: the sink is physically partitioned by
    ``bucket = pmod(hash(doc_key), num_buckets)``. Per micro-batch:

    1. the batch's touched buckets are computed (≤ ``num_buckets`` scalars
       on the driver — bounded, not data-sized);
    2. ONLY those buckets are read back (partition pruning skips the rest
       of the sink);
    3. old ∪ new rows merge on the deterministic (doc, entity-id) key with
       explicit new-wins priority (``max_by(entity, priority)``), so a
       changed payload under an existing id is replaced, never dropped —
       the parquet twin of the reference's whole-record canonical-JSON
       dedup (utils.py:16-19) which likewise never discards a changed
       record; then regroup per doc;
    4. dynamic partition overwrite rewrites only the touched bucket
       directories.

    Per-batch I/O is proportional to touched-buckets/sink, not sink size —
    the old read-everything / rewrite-everything (+ ``_tmp`` double write,
    which doubled I/O and could truncate the sink on a crash between the
    two writes) is gone. A transient read failure now propagates instead
    of being mistaken for the first batch.
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        b = batch.withColumn("bucket", F.pmod(F.hash(F.col(doc_key)), F.lit(num_buckets)))
        touched = [r["bucket"] for r in b.select("bucket").distinct().collect()]
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as exc:
            if not _is_path_missing(exc):
                raise
            existing = None
        if existing is not None and "bucket" not in existing.columns:
            raise ValueError(
                f"sink at {path!r} uses the legacy unbucketed layout (no 'bucket' "
                "partition column); migrate once before streaming into it: read "
                "the old sink, add bucket = pmod(hash(doc_key), num_buckets), and "
                "rewrite with partitionBy('bucket') — see upsert_nested_foreach_batch"
            )
        if existing is not None:
            current = existing.filter(F.col("bucket").isin(touched))
            exploded_old = current.select(
                doc_key, "bucket", F.explode_outer("annotations").alias("entity")
            ).withColumn("_prio", F.lit(0))
            exploded_new = b.select(
                doc_key, "bucket", F.explode_outer("annotations").alias("entity")
            ).withColumn("_prio", F.lit(1))
            # new-wins merge: if an entity's payload changed under the same id
            # (annotator/model update), the incoming record must replace the
            # stored one — dropDuplicates would keep an arbitrary winner
            merged = (
                exploded_old.unionByName(exploded_new)
                .withColumn("_eid", F.col("entity.id"))
                .groupBy(doc_key, "bucket", "_eid")
                .agg(F.max_by("entity", "_prio").alias("entity"))
                .drop("_eid")
                .groupBy(doc_key, "bucket")
                .agg(F.collect_list("entity").alias("annotations"))
            )
        else:
            merged = b
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return apply
