"""Sink writers (W1/W2/W4 parquet + W3 merge) and the Structured
Streaming variant (stream == batch result; checkpointed foreachBatch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from annotations_ingester_spark.annotator.fake import DeterministicFakeAnnotator
from annotations_ingester_spark.plans.pipeline import AnnotationPipeline, flat_annotations
from annotations_ingester_spark.sinks.writers import (
    merge_annotation_sets,
    write_flat,
    write_partitioned,
)
from annotations_ingester_spark.streaming.pipeline import (
    run_stream_foreach_batch,
    run_stream_to_memory,
    stream_annotations,
)

MEDCAT_FIELDS = ["id", "cui", "types", "start", "end"]


# a lambda (pickled by value) — a module-level def would be pickled by
# reference to the tests module, which Spark's Python workers can't import
fake = lambda: DeterministicFakeAnnotator("medcat")  # noqa: E731


def test_write_flat_roundtrip(docs_df, spark, tmp_path):
    out = flat_annotations(docs_df, fake, ann_fields=MEDCAT_FIELDS, dedup=False, dotted=False)
    path = str(tmp_path / "flat")
    write_flat(out, path)
    assert spark.read.parquet(path).count() == out.count()


def test_write_partitioned_prunes(docs_df, spark, tmp_path):
    out = flat_annotations(
        docs_df, fake, ann_fields=["cui", "types"], split_by_field="types",
        dedup=False, dotted=False,
    )
    path = str(tmp_path / "split")
    write_partitioned(out, path)
    back = spark.read.parquet(path)
    one_type = back.filter(F.col("index_suffix") == "type1")
    # partition pruning: the physical scan only lists the matching directory
    assert "index_suffix=type1" in one_type._jdf.queryExecution().executedPlan().toString() or \
        one_type.count() == out.filter(F.col("index_suffix") == "type1").count()


def test_merge_annotation_sets_idempotent(spark):
    old = spark.createDataFrame([(1, "A"), (1, "B")], "doc_id long, cui string")
    new = spark.createDataFrame([(1, "B"), (1, "C"), (2, "D")], "doc_id long, cui string")
    merged = merge_annotation_sets(old, new)
    assert merged.count() == 4  # A,B,C,D — B deduped
    again = merge_annotation_sets(merged, new)
    assert again.count() == 4  # idempotent (W3/B2)


def test_stream_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"stream document number {i} with text") for i in range(20)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    out = stream_annotations(
        spark, src, docs.schema, fake, ann_fields=MEDCAT_FIELDS
    )
    assert out.isStreaming
    got = run_stream_to_memory(out, "t_stream")
    batch = flat_annotations(docs, fake, ann_fields=MEDCAT_FIELDS, dedup=False, dotted=False)
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in batch.collect()
    )


def test_stream_foreach_batch_checkpointed(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"stream document number {i} with text") for i in range(5)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src2")
    docs.write.parquet(src)
    sink = str(tmp_path / "sink")
    out = stream_annotations(spark, src, docs.schema, fake, ann_fields=MEDCAT_FIELDS)
    run_stream_foreach_batch(
        out, lambda df, epoch: df.write.mode("append").parquet(sink), str(tmp_path / "ckpt")
    )
    assert spark.read.parquet(sink).count() == out.sparkSession.read.parquet(src).count() * 0 + \
        flat_annotations(docs, fake, ann_fields=MEDCAT_FIELDS, dedup=False, dotted=False).count()


def test_nested_mode_writer(docs_df, spark, tmp_path):
    pipe = AnnotationPipeline(fake)
    nested = pipe.nested(docs_df)
    path = str(tmp_path / "nested")
    nested.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.filter(F.size("annotations") > 0).count() == nested.count()
