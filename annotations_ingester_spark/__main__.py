"""CLI entry point: ``python -m annotations_ingester_spark --config cfg.yml``.

Mirrors the reference's CLI (reference: ingester/__main__.py:34-45 arg
parsing + config validation; :128-129 ``index_range`` execution) but wires
a Spark plan instead of a thread pool:

  config → PipelineConfig → source read → AnnotationPipeline.windowed/flat
         → sink write (parquet or Elasticsearch backend).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser("annotations_ingester_spark")
    parser.add_argument("--config", required=True, help="YAML pipeline config")
    parser.add_argument("--date-start", default=None, help="override batch date-start")
    parser.add_argument("--date-end", default=None, help="override batch date-end")
    parser.add_argument("--stream", action="store_true", help="run the Structured Streaming variant")
    parser.add_argument(
        "--segmented",
        action="store_true",
        help="B1: run one date segment at a time (reference driver-loop parity, "
        "annotations_indexer.py:847-861; the J1 anti-join absorbs the "
        "boundary-date overlap between consecutive inclusive segments)",
    )
    parser.add_argument("--dry-run", action="store_true", help="build + explain the plan, don't execute")
    args = parser.parse_args(argv)

    from annotations_ingester_spark.annotator.service import HttpNlpClient
    from annotations_ingester_spark.config import PipelineConfig
    from annotations_ingester_spark.plans.pipeline import AnnotationPipeline
    from annotations_ingester_spark.session import get_spark
    from annotations_ingester_spark.utils import check_url_available

    cfg = PipelineConfig.from_yaml(args.config)
    logging.basicConfig(
        level=cfg.logging_level,  # reference logging-level, config.yml:73
        format="%(asctime)s %(levelname)s %(message)s",
    )
    if cfg.es_date_format != "yyyy-MM-dd" or cfg.python_date_format != "%Y-%m-%d":
        # range_filter/date_windows operate on ISO date strings; a custom
        # format would silently mis-scope every range scan — refuse loudly
        print(
            "only ISO date formats (yyyy-MM-dd / %Y-%m-%d) are supported; "
            f"got {cfg.es_date_format!r} / {cfg.python_date_format!r}",
            file=sys.stderr,
        )
        return 2
    date_start = args.date_start or cfg.date_start
    date_end = args.date_end or cfg.date_end

    nlp = cfg.nlp
    fake_mode = bool(nlp.endpoints) and nlp.endpoints[0].startswith("fake://")

    # S11 pre-flight: refuse to start against a dead NLP service
    if nlp.endpoints and not fake_mode and not check_url_available(nlp.endpoints):
        print("NLP endpoints unavailable", file=sys.stderr)
        return 2

    # S11 pre-flight for the jar-free ES REST backend: the version
    # handshake (GET / + the 8.x X-Elastic-Product header check) fails
    # fast on an unreachable, pre-7.x, or lookalike server before any
    # Spark job is planned — the reference's check_url_available posture
    # (utils.py:7-14) upgraded to the official client handshake.
    for end in (cfg.source, cfg.sink):
        if end.backend == "elasticsearch-rest":
            from annotations_ingester_spark.sources.es_rest import EsRestClient

            try:
                EsRestClient(end).verify_compat()
            except Exception as exc:
                print(f"Elasticsearch endpoint check failed: {exc}", file=sys.stderr)
                return 2

    spark = get_spark("annotations_ingester_spark")

    if fake_mode:  # hermetic runs: fake:// resolves via the registry
        from annotations_ingester_spark.annotator.registry import get_annotator

        annotator = get_annotator(
            "fake-gate" if nlp.mode == "gate-nlp" else "fake-medcat"
        )
    else:

        def annotator():
            return HttpNlpClient(
                nlp.endpoints,
                mode=nlp.mode,
                auth=(nlp.username, nlp.password) if nlp.username else None,
                max_retries=nlp.max_retries_on_failure,
                application_params=nlp.application_params,
                threads=cfg.threads,  # reference threads-count, per partition
                max_in_flight=nlp.max_in_flight,
                rate_limit_per_sec=nlp.rate_limit_per_sec,
            )

    pipe = AnnotationPipeline(
        annotator,
        text_field=cfg.text_field,
        docid_field=cfg.docid_field,
        persist_fields=cfg.persist_fields,
        mode="gate" if cfg.nlp.mode == "gate-nlp" else "medcat",
        date_field=cfg.date_field,
        ann_id_field=cfg.annotation_id_field,
    )

    if cfg.source.backend == "elasticsearch":
        from annotations_ingester_spark.sources.elasticsearch import read_es

        docs = read_es(spark, cfg.source)
    elif cfg.source.backend == "elasticsearch-rest":
        # jar-free fallback: sliced-scroll parallel read; schema from a
        # bounded sample (ES dynamic-mapping parity). A configured date
        # span pushes down into the scroll query (S3 parity,
        # es_common.py:303-330) — out-of-range docs never leave the
        # cluster; segmented runs re-filter Spark-side within the span
        from annotations_ingester_spark.sources.es_rest import (
            infer_es_rest_schema,
            read_es_rest,
        )

        rng = None
        if date_start and date_end:
            rng = {
                "range": {
                    cfg.date_field: {
                        "gte": date_start,
                        "lte": date_end,
                        "format": "yyyy-MM-dd",
                    }
                }
            }
        docs = read_es_rest(
            spark, cfg.source, infer_es_rest_schema(spark, cfg.source), query=rng
        )
    else:
        docs = spark.read.parquet(cfg.source.index_name)

    def sink_processed_ids():
        """J1 resume (reference skip-processed-doc-check, config.yml:68 /
        annotations_indexer.py:309-324): distinct already-written doc ids
        read back from the sink; None on first run. The anti-join
        broadcasts when small, shuffles both sides keyed on the id
        otherwise — never a driver-side id list."""
        if not cfg.skip_processed_doc_check:
            return None
        from pyspark.sql import functions as Fn

        from annotations_ingester_spark.sinks.writers import _is_path_missing

        try:
            if cfg.sink.backend == "elasticsearch":
                from annotations_ingester_spark.sources.elasticsearch import read_es as _r

                written = _r(spark, cfg.sink)
            elif cfg.sink.backend == "elasticsearch-rest":
                from pyspark.sql import types as T

                from annotations_ingester_spark.sources.es_rest import (
                    EsRestClient,
                    read_es_rest,
                )

                # resume needs ONLY the id column: a 1-doc sample picks the
                # column name and type, then a narrow sliced-scroll read
                # fetches just that field (no full-schema inference — the
                # annotation rows carry map-typed fields that don't need to
                # round-trip here)
                sample = EsRestClient(cfg.sink).search_page(size=1)
                if not sample:
                    return None  # absent or empty sink index — first run
                for done_col in (f"meta.{cfg.docid_field}", cfg.docid_field):
                    if done_col in sample[0]:
                        typ = (
                            T.LongType()
                            if isinstance(sample[0][done_col], int)
                            else T.StringType()
                        )
                        written = read_es_rest(
                            spark,
                            cfg.sink,
                            T.StructType([T.StructField(done_col, typ)]),
                        )
                        return written.select(
                            Fn.col(f"`{done_col}`").alias(cfg.docid_field)
                        ).distinct()
                return None
            else:
                written = spark.read.parquet(cfg.sink.index_name)
        except Exception as exc:
            # ONLY sink-never-written counts as first run; a corrupt or
            # unreadable sink must propagate — treating it as first-run
            # would silently reprocess (and, on parquet append, duplicate)
            # the whole corpus
            # an absent or empty REST sink index is equally a first run
            if (
                _is_path_missing(exc)
                or "index_not_found" in str(exc)
                or "returned no documents" in str(exc)
            ):
                return None
            raise
        # flat sinks carry the doc id as meta.<docid>; the W4 nested sink
        # keeps the bare docid groupBy key
        for done_col in (f"meta.{cfg.docid_field}", cfg.docid_field):
            if done_col in written.columns:
                return written.select(
                    Fn.col(f"`{done_col}`").alias(cfg.docid_field)
                ).distinct()
        return None

    def write_out(out) -> None:
        if cfg.sink.backend == "elasticsearch":
            from annotations_ingester_spark.sources.elasticsearch import write_es

            write_es(
                out,
                cfg.sink,
                split_suffix_field="index_suffix" if cfg.split_index_by_field else None,
                upsert=cfg.ingest_mode == "same-index",
            )
        elif cfg.sink.backend == "elasticsearch-rest":
            from annotations_ingester_spark.sources.es_rest import write_es_rest

            write_es_rest(
                out,
                cfg.sink,
                split_suffix_field="index_suffix" if cfg.split_index_by_field else None,
                upsert=cfg.ingest_mode == "same-index",
            )
        elif cfg.split_index_by_field:
            from annotations_ingester_spark.sinks.writers import write_partitioned

            write_partitioned(out, cfg.sink.index_name)  # W2 physical partitioning
        else:
            out.write.mode("append").parquet(cfg.sink.index_name)

    if args.stream:
        # S7: the same flat plan as a checkpointed availableNow stream —
        # deterministic row ids make micro-batch replay an idempotent upsert
        from annotations_ingester_spark.streaming.pipeline import (
            run_stream_foreach_batch,
            stream_annotations,
        )

        if cfg.source.backend == "elasticsearch":
            print("--stream requires a file-based source backend", file=sys.stderr)
            return 2
        schema = spark.read.parquet(cfg.source.index_name).schema
        out = stream_annotations(
            spark,
            cfg.source.index_name,
            schema,
            annotator,
            text_field=cfg.text_field,
            docid_field=cfg.docid_field,
            mode="gate" if nlp.mode == "gate-nlp" else "medcat",
        )
        if args.dry_run:
            out.explain("formatted")
            return 0
        if cfg.sink.backend == "elasticsearch":
            from annotations_ingester_spark.sources.elasticsearch import es_foreach_batch

            batch_fn = es_foreach_batch(cfg.sink, upsert=cfg.ingest_mode == "same-index")
        elif cfg.sink.backend == "elasticsearch-rest":
            from annotations_ingester_spark.sources.es_rest import write_es_rest

            def batch_fn(batch, epoch_id):
                # deterministic row ids make micro-batch replay idempotent
                write_es_rest(batch, cfg.sink, upsert=cfg.ingest_mode == "same-index")
        else:

            def batch_fn(batch, epoch_id):
                batch.write.mode("append").parquet(cfg.sink.index_name)

        # checkpoint placement: path-backed sinks keep it beside the sink;
        # ES sinks have no filesystem path, so anchor it beside the SOURCE
        # path (always file-based in stream mode), tagged with the
        # normalized index name so two streams into different indices
        # never share offsets
        if cfg.sink.backend.startswith("elasticsearch"):
            from annotations_ingester_spark.functions.names import format_index_name

            ckpt = (
                cfg.source.index_name.rstrip("/")
                + "_ckpt_"
                + format_index_name(cfg.sink.index_name)
            )
        else:
            ckpt = cfg.sink.index_name.rstrip("/") + "_ckpt"
        run_stream_foreach_batch(out, batch_fn, ckpt)
        return 0

    if cfg.ingest_mode == "nested":
        # W4: one row per document with an annotations array (reference
        # doc_{id}_annotations docs, annotations_indexer.py:166-200)
        from annotations_ingester_spark.operators.filters import range_filter

        if args.segmented:
            # the segment loop writes flat columns and tracks flat overlap
            # semantics; silently running nested un-segmented would betray
            # the flag — refuse loudly (same philosophy as the date-format
            # refusal above)
            print(
                "--segmented is not supported with ingest-mode=nested; "
                "run the whole span (the J1 skip-processed anti-join "
                "makes reruns idempotent)",
                file=sys.stderr,
            )
            return 2
        scoped = (
            range_filter(docs, cfg.date_field, date_start, date_end)
            if date_start and date_end
            else docs
        )
        out = pipe.nested(scoped, processed_ids=sink_processed_ids())
        if args.dry_run:
            out.explain("formatted")
            return 0
        if cfg.sink.backend == "elasticsearch":
            from annotations_ingester_spark.sources.elasticsearch import write_es

            write_es(out, cfg.sink, mapping_id="ann_doc_id", scripted_upsert=True)
        elif cfg.sink.backend == "elasticsearch-rest":
            from annotations_ingester_spark.sources.es_rest import write_es_rest

            # doc_as_upsert update replaces the annotations array like the
            # scripted upsert (merge already happened engine-side, W4)
            write_es_rest(out, cfg.sink, mapping_id="ann_doc_id", upsert=True)
        else:
            from annotations_ingester_spark.sinks.writers import write_nested

            write_nested(out, cfg.sink.index_name)
        return 0

    if args.segmented and date_start and date_end:
        # reference driver-loop parity: one inclusive range scan per
        # segment; consecutive segments share their boundary date, and the
        # J1 anti-join against already-written ids absorbs the overlap —
        # so segmented == whole-span (certified in tests/test_cli.py)
        from annotations_ingester_spark.operators.filters import range_filter
        from annotations_ingester_spark.operators.windows import date_windows

        processed = sink_processed_ids()
        for seg_start, seg_end in date_windows(
            date_start, date_end, cfg.batch_interval_days
        ):
            scoped = range_filter(docs, cfg.date_field, seg_start, seg_end)
            seg_out = pipe.flat(
                scoped,
                split_by_field=cfg.split_index_by_field or None,
                processed_ids=processed,
            )
            if args.dry_run:
                seg_out.explain("formatted")
                return 0
            write_out(seg_out)
            # everything up to this segment's end is now in the sink; only
            # the shared boundary date overlaps the next segment
            processed = range_filter(docs, cfg.date_field, date_start, seg_end).select(
                cfg.docid_field
            )
        return 0

    if date_start and date_end:
        # same column surface as the --segmented loop: a dated whole-span run
        # with split-index-by-field configured must also carry index_suffix,
        # or write_out crashes on the missing partition column
        out = pipe.windowed(
            docs,
            date_start,
            date_end,
            cfg.batch_interval_days,
            split_by_field=cfg.split_index_by_field or None,
            processed_ids=sink_processed_ids(),
        )
    else:
        out = pipe.flat(
            docs,
            split_by_field=cfg.split_index_by_field or None,
            processed_ids=sink_processed_ids(),
        )

    if args.dry_run:
        out.explain("formatted")
        return 0

    write_out(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
