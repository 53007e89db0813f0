"""S8 sink-mapping DDL: the four declared variants + the same-index lazy
patch, spot-checked against the reference's mapping shapes
(annotations_indexer.py:347-357 lazy nested/flattened; :359-440
medcat-nested-object; :442-586 gate-nlp-nested-object; :588-688
medcat-separate-index; :690-833 gate-nlp-separate-index)."""

from __future__ import annotations

import pytest

from annotations_ingester_spark.sinks.mappings import (
    mapping_for,
    same_index_patch_mapping,
)


def test_same_index_patch_nested_and_flattened_goldens():
    # the lazy-add path carries a bare type, no sub-properties
    assert same_index_patch_mapping(use_nested_objects=True) == {
        "properties": {"annotations": {"type": "nested"}}
    }
    assert same_index_patch_mapping(use_nested_objects=False) == {
        "properties": {"annotations": {"type": "flattened"}}
    }


def test_medcat_nested_object_shape():
    m = mapping_for("medcat-nested-object")
    ann = m["properties"]["annotations"]
    assert ann["type"] == "nested"
    props = ann["properties"]
    assert props["cui"]["type"] == "text"  # string fields get text+keyword
    assert props["cui"]["fields"]["keyword"]["type"] == "keyword"
    assert props["start"]["type"] == "long"
    assert props["acc"]["type"] == "float"  # reference declares float
    assert props["meta_anns"]["type"] == "nested"  # open map → nested


def test_gate_nested_object_shape():
    props = mapping_for("gate-nlp-nested-object")["properties"]["annotations"]["properties"]
    assert "rule" in props and "matchedWithLonger" in props
    assert props["matchedWithLonger"]["type"] == "boolean"


@pytest.mark.parametrize(
    "variant,field", [("medcat-separate-index", "nlp.cui"), ("gate-nlp-separate-index", "nlp.rule")]
)
def test_separate_index_prefixes(variant, field):
    m = mapping_for(variant, persist_fields=["_id", "dct"])
    props = m["properties"]
    assert field in props  # nlp.-prefixed entity fields
    assert props["meta._id"] == {"type": "keyword"}
    assert props["meta.dct"] == {"type": "keyword"}
    assert all(k.startswith(("nlp.", "meta.")) for k in props)


def test_unknown_variant_raises():
    with pytest.raises(ValueError, match="unknown schema mapping"):
        mapping_for("no-such-mapping")
