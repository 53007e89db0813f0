"""CLI end-to-end on the parquet backend with the hermetic fake:// NLP
registry: whole-span vs --segmented (B1 driver-loop parity,
annotations_indexer.py:847-861) and the --stream variant — all three must
produce the identical row_id set (B2 idempotency absorbs the segmented
mode's boundary-date overlap via the J1 anti-join)."""

from __future__ import annotations

import yaml

from annotations_ingester_spark.__main__ import main

DOCS = [
    # (doc_id, text, dct) — boundary dates 2020-01-31 / 2020-03-01 appear
    # in TWO consecutive inclusive segments (the reference's overlap)
    (1, "cli corpus document number one body", "2020-01-05"),
    (2, "cli corpus document number two body", "2020-01-31"),
    (3, "cli corpus document number three body", "2020-01-31"),
    (4, "cli corpus document number four body", "2020-02-10"),
    (5, "cli corpus document number five body", "2020-03-01"),
    (6, "cli corpus document number six body", "2020-03-10"),
    (7, "x", "2020-02-01"),  # P3-filtered (too short) in every mode
]


def _corpus(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(DOCS, "doc_id long, text string, dct string").write.parquet(src)
    return src


def _cfg(tmp_path, src, sink, dated=True, split=None):
    batch = {"date-field": "dct", "interval": 30}
    if dated:
        batch |= {"date-start": "2020-01-01", "date-end": "2020-03-15"}
    cfg = {
        "source": {"backend": "parquet", "path": src},
        "sink": {"backend": "parquet", "path": sink},
        "nlp-service": {"endpoints-url": ["fake://medcat"], "protocol-mode": "medcat"},
        "mapping": {
            "source": {
                "text-field": "text",
                "docid-field": "doc_id",
                "persist-fields": ["doc_id"],
                "batch": batch,
            },
            "sink": {"split-index-by-field": split} if split else {},
        },
    }
    p = tmp_path / f"cfg_{len(sink)}.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _row_ids(spark, path):
    return sorted(r["row_id"] for r in spark.read.parquet(path).select("row_id").collect())


def test_segmented_equals_whole_span(spark, tmp_path):
    src = _corpus(spark, tmp_path)
    whole, seg = str(tmp_path / "whole"), str(tmp_path / "seg")
    assert main(["--config", _cfg(tmp_path, src, whole)]) == 0
    assert main(["--config", _cfg(tmp_path, src, seg), "--segmented"]) == 0
    whole_ids, seg_ids = _row_ids(spark, whole), _row_ids(spark, seg)
    assert whole_ids == seg_ids  # overlap absorbed, nothing lost
    assert len(seg_ids) == len(set(seg_ids))  # boundary docs not written twice
    assert not any(r.startswith("doc-7-") for r in seg_ids)  # P3 filtered


def test_split_by_field_dated_whole_span(spark, tmp_path):
    """split-index-by-field + a date range must not crash in write_out and
    must match --segmented with the same split config (the dated whole-span
    path previously dropped the index_suffix column)."""
    src = _corpus(spark, tmp_path)
    whole, seg = str(tmp_path / "w2whole"), str(tmp_path / "w2seg")
    assert main(["--config", _cfg(tmp_path, src, whole, split="types")]) == 0
    assert main(["--config", _cfg(tmp_path, src, seg, split="types"), "--segmented"]) == 0
    assert _row_ids(spark, whole) == _row_ids(spark, seg)
    # the W2 physical layout actually partitioned on the suffix
    import os

    assert any(d.startswith("index_suffix=") for d in os.listdir(whole))


def test_stream_cli_matches_batch(spark, tmp_path):
    src = _corpus(spark, tmp_path)
    batch_sink, stream_sink = str(tmp_path / "b"), str(tmp_path / "s")
    assert main(["--config", _cfg(tmp_path, src, batch_sink, dated=False)]) == 0
    assert main(["--config", _cfg(tmp_path, src, stream_sink, dated=False), "--stream"]) == 0
    assert _row_ids(spark, batch_sink) == _row_ids(spark, stream_sink)


def test_nested_ingest_mode(spark, tmp_path):
    """ingest-mode: nested (W4) must produce one row per doc with an
    annotations array — previously the CLI parsed the mode but wrote flat."""
    import yaml as _yaml

    src = _corpus(spark, tmp_path)
    sink = str(tmp_path / "nested_out")
    cfg_path = _cfg(tmp_path, src, sink)
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["mapping"]["sink"]["ingest-mode"] = "nested"
    p = tmp_path / "cfg_nested.yml"
    p.write_text(_yaml.safe_dump(cfg))
    assert main(["--config", str(p)]) == 0
    back = spark.read.parquet(sink)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert set(back.columns) >= {"doc_id", "annotations", "ann_doc_id"}
    assert 7 not in rows  # P3 filtered
    assert all(len(r["annotations"]) > 0 for r in rows.values())
    assert rows[1]["ann_doc_id"] == "doc_1_annotations"
    # one row per doc that passes P3 AND yields >=1 entity from the
    # deterministic fake (zero-entity docs drop in every ingest mode)
    from annotations_ingester_spark.annotator.fake import entity_count

    expected = {d for d, text, _ in DOCS if len(text) >= 5 and entity_count(text) > 0}
    assert set(rows) == expected and back.count() == len(expected)


def test_skip_processed_resume(spark, tmp_path):
    """skip-processed-doc-check (J1 resume): a second run over a grown
    corpus must only write the NEW docs — previously the flag was parsed
    but never wired, so reruns duplicated every row."""
    import yaml as _yaml

    src1 = str(tmp_path / "src1")
    spark.createDataFrame(DOCS[:3], "doc_id long, text string, dct string").write.parquet(src1)
    sink = str(tmp_path / "resume_sink")

    def cfg_for(src):
        cfg = _yaml.safe_load(open(_cfg(tmp_path, src, sink, dated=False)))
        cfg["mapping"]["source"]["skip-processed-doc-check"] = True
        p = tmp_path / f"cfg_resume_{len(src)}.yml"
        p.write_text(_yaml.safe_dump(cfg))
        return str(p)

    assert main(["--config", cfg_for(src1)]) == 0
    first = _row_ids(spark, sink)
    # corpus grows: same three docs plus three new ones
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(DOCS[:6], "doc_id long, text string, dct string").write.parquet(src2)
    assert main(["--config", cfg_for(src2)]) == 0
    second = _row_ids(spark, sink)
    assert len(second) == len(set(second))  # old docs NOT rewritten
    assert set(second) > set(first)  # new docs landed


def test_nested_skip_processed_resume(spark, tmp_path):
    """nested ingest + skip-processed-doc-check: a rerun over a grown
    corpus must only append the NEW docs' rows — previously the nested
    branch ignored the resume flag and duplicated every doc (r3 advice)."""
    import yaml as _yaml

    src1 = str(tmp_path / "nsrc1")
    spark.createDataFrame(DOCS[:3], "doc_id long, text string, dct string").write.parquet(src1)
    sink = str(tmp_path / "nested_resume_sink")

    def cfg_for(src, tag):
        cfg = _yaml.safe_load(open(_cfg(tmp_path, src, sink, dated=False)))
        cfg["mapping"]["source"]["skip-processed-doc-check"] = True
        cfg["mapping"]["sink"]["ingest-mode"] = "nested"
        p = tmp_path / f"cfg_nested_resume_{tag}.yml"
        p.write_text(_yaml.safe_dump(cfg))
        return str(p)

    assert main(["--config", cfg_for(src1, "a")]) == 0
    first = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    src2 = str(tmp_path / "nsrc2")
    spark.createDataFrame(DOCS[:6], "doc_id long, text string, dct string").write.parquet(src2)
    assert main(["--config", cfg_for(src2, "b")]) == 0
    second = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert len(second) == len(set(second))  # old docs NOT rewritten
    assert set(second) > set(first)  # new docs landed


def test_nested_segmented_refused(spark, tmp_path):
    """--segmented with ingest-mode=nested must refuse loudly (exit 2),
    not silently run un-segmented or write flat columns."""
    import os

    import yaml as _yaml

    src = _corpus(spark, tmp_path)
    sink = str(tmp_path / "nested_seg_sink")
    cfg = _yaml.safe_load(open(_cfg(tmp_path, src, sink)))
    cfg["mapping"]["sink"]["ingest-mode"] = "nested"
    p = tmp_path / "cfg_nested_seg.yml"
    p.write_text(_yaml.safe_dump(cfg))
    assert main(["--config", str(p), "--segmented"]) == 2
    assert not os.path.exists(sink)  # refused before writing anything


def test_dry_run_segmented(spark, tmp_path, capsys):
    src = _corpus(spark, tmp_path)
    sink = str(tmp_path / "dry")
    rc = main(["--config", _cfg(tmp_path, src, sink), "--segmented", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    import os

    assert not os.path.exists(sink)  # nothing written


def test_non_iso_date_format_refused(spark, tmp_path):
    import yaml as _yaml

    src = _corpus(spark, tmp_path)
    cfg = _yaml.safe_load(open(_cfg(tmp_path, src, str(tmp_path / "x"))))
    cfg["mapping"]["source"]["batch"]["es-date-format"] = "dd/MM/yyyy"
    p = tmp_path / "cfg_badfmt.yml"
    p.write_text(_yaml.safe_dump(cfg))
    assert main(["--config", str(p)]) == 2  # loud refusal, not silent mis-scoping


def test_skip_processed_corrupt_sink_propagates(spark, tmp_path):
    """A corrupt (unreadable) sink must fail the resume read loudly — not
    be mistaken for 'first run', which would reprocess and duplicate the
    whole corpus on a parquet append sink."""
    import pathlib

    import pytest
    import yaml as _yaml

    src = _corpus(spark, tmp_path)
    sink = tmp_path / "corrupt_resume_sink"
    sink.mkdir()
    (sink / "part-00000.parquet").write_bytes(b"definitely not parquet")
    cfg = _yaml.safe_load(open(_cfg(tmp_path, src, str(sink), dated=False)))
    cfg["mapping"]["nlp"] = {"skip-processed-doc-check": True}
    p = tmp_path / "cfg_corrupt.yml"
    p.write_text(_yaml.safe_dump(cfg))
    with pytest.raises(Exception):
        main(["--config", str(p)])
