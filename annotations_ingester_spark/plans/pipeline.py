"""The annotation pipeline as one declarative DataFrame plan (SURVEY §3.4).

    source → valid_text_filter (P3) → skip_processed (J1)
           → annotate (mapInPandas UDTF) → response_shape_guard (P6)
           → explode (W5) → prefix_project (F3/J3) → [dedup (U2)] → sink

Plan-construction discipline (SURVEY §4): everything above ``annotate`` is a
Column predicate/join Catalyst can push into the scan; everything below is
JVM-side projection. The expensive Python stage sees only rows that will
actually be written.

Unlike the reference — which collects every doc id into a driver-side list
(ingester/es_common.py:290-292) and loops a thread pool over point lookups —
no id list ever materializes on the driver; the whole flow is one
distributed plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from annotations_ingester_spark.annotator.service import Annotator
from annotations_ingester_spark.annotator.udf import annotate
from annotations_ingester_spark.operators.antijoin import skip_processed
from annotations_ingester_spark.operators.explode import (
    explode_entities,
    prefix_project,
    split_index_suffix,
)
from annotations_ingester_spark.operators.filters import (
    range_filter,
    response_shape_guard,
    valid_text_filter,
)
from annotations_ingester_spark.types import MIN_TEXT_LEN


def flat_annotations(
    docs: DataFrame,
    annotator_factory: Callable[[], Annotator],
    text_field: str = "text",
    docid_field: str = "doc_id",
    persist_fields: list[str] | None = None,
    mode: str = "medcat",
    ann_fields: list[str] | None = None,
    processed_ids: DataFrame | None = None,
    split_by_field: str | None = None,
    dedup: bool = True,
    dotted: bool = True,
    min_text_len: int = MIN_TEXT_LEN,
    ann_id_field: str = "id",
) -> DataFrame:
    """W1 separate-index flat path: one row per (doc × entity) with
    ``meta.*``/``nlp.*`` columns and deterministic ``row_id``.

    With ``split_by_field`` also appends the W2 ``index_suffix`` partition
    column. ``dedup=True`` applies U2 whole-record distinct (the reference's
    canonical-JSON set dedup, ingester/utils.py:16-19 — equality over all
    fields ⇒ ``dropDuplicates()`` over all non-map columns).
    """
    plan = valid_text_filter(docs, text_field, min_text_len)
    plan = skip_processed(plan, processed_ids, docid_field=docid_field)
    plan = annotate(plan, annotator_factory, text_field, docid_field, mode)
    plan = response_shape_guard(plan)
    plan = explode_entities(plan)
    extra: list[str] = []
    if split_by_field:
        plan = split_index_suffix(plan, split_by_field)
        extra = ["index_suffix"]
    out = prefix_project(
        plan,
        persist_fields=persist_fields or [docid_field],
        docid_field=docid_field,
        ann_fields=ann_fields,
        dotted=dotted,
        extra_cols=extra,
        ann_id_field=ann_id_field,
    )
    if dedup:
        # U2: every other column is a deterministic function of the
        # (doc, entity-id) pair the synthesized row_id encodes
        # (functions/names.py:46, reference annotations_indexer.py:221), so
        # row_id-equality ≡ whole-record-equality — and, unlike the full
        # column list, it also covers map-typed columns (meta_anns) that
        # dropDuplicates can't compare. Keying the dedup on row_id (+ the
        # W2 partition column) makes the exchange carry one short string
        # per row instead of the entire sink payload.
        out = out.dropDuplicates(["row_id", *extra])
    return out


class AnnotationPipeline:
    """Config-driven batch pipeline (the reference's BatchAnnotationsIndexer
    surface, ingester/annotations_indexer.py:842-861, re-expressed as plans)."""

    def __init__(
        self,
        annotator_factory: Callable[[], Annotator],
        text_field: str = "text",
        docid_field: str = "doc_id",
        persist_fields: list[str] | None = None,
        mode: str = "medcat",
        date_field: str | None = None,
        ann_id_field: str = "id",
    ) -> None:
        self.annotator_factory = annotator_factory
        self.text_field = text_field
        self.docid_field = docid_field
        self.persist_fields = persist_fields or [docid_field]
        self.mode = mode
        self.date_field = date_field
        self.ann_id_field = ann_id_field

    def annotated(self, docs: DataFrame, processed_ids: DataFrame | None = None) -> DataFrame:
        """Filtered + annotated + guarded doc-level DataFrame (entities array)."""
        plan = valid_text_filter(docs, self.text_field)
        plan = skip_processed(plan, processed_ids, docid_field=self.docid_field)
        plan = annotate(plan, self.annotator_factory, self.text_field, self.docid_field, self.mode)
        return response_shape_guard(plan)

    def flat(self, docs: DataFrame, **kw) -> DataFrame:
        return flat_annotations(
            docs,
            self.annotator_factory,
            text_field=self.text_field,
            docid_field=self.docid_field,
            persist_fields=self.persist_fields,
            mode=self.mode,
            ann_id_field=self.ann_id_field,
            **kw,
        )

    def windowed(
        self,
        docs: DataFrame,
        date_start: str,
        date_end: str,
        interval_days: int = 30,
        **kw,
    ) -> DataFrame:
        """B1-scoped run: restrict the corpus to the window range first
        (pushes to the scan), then annotate. One plan, no driver loop.

        ``**kw`` (e.g. ``split_by_field``) is forwarded to :meth:`flat` so a
        dated whole-span run produces the same columns as the segmented
        driver loop — without it, split-index-by-field plus a date range
        crashed in write_out on the missing ``index_suffix`` column.
        """
        if not self.date_field:
            raise ValueError("date_field not configured")
        scoped = range_filter(docs, self.date_field, date_start, date_end)
        return self.flat(scoped, **kw)

    def nested(
        self, docs: DataFrame, processed_ids: DataFrame | None = None
    ) -> DataFrame:
        """W4: one row per document, annotations collected into an array
        (reference: doc_{id}_annotations sink docs,
        annotations_indexer.py:166-200). ``processed_ids`` threads the J1
        skip-processed anti-join through, same as the flat path — without
        it a resumed run over an append sink duplicated every doc row."""
        ann = self.annotated(docs, processed_ids=processed_ids)
        exploded = explode_entities(ann)
        keys = [self.docid_field] + [
            p for p in self.persist_fields if p != self.docid_field
        ]
        return (
            exploded.groupBy(*keys)
            .agg(F.collect_list("entity").alias("annotations"))
            .withColumn(
                "ann_doc_id",
                F.format_string("doc_%s_annotations", F.col(self.docid_field).cast("string")),
            )
        )
