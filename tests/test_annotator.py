"""Annotator client + response-normalization tests (SURVEY §1.3/§2.9;
envelope semantics from ingester/nlp_service.py:100-132)."""

from __future__ import annotations

import json

from annotations_ingester_spark.annotator.fake import (
    DeterministicFakeAnnotator,
    gate_envelope,
    medcat_envelope,
)
from annotations_ingester_spark.annotator.service import (
    BioyodieClient,
    HttpNlpClient,
    normalize_gate,
    normalize_medcat,
)


def test_normalize_medcat_happy_path():
    text = "value key sort customer joined"  # len 30 → 2 entities
    env = medcat_envelope(5, text)
    ents = normalize_medcat(env)
    assert ents is not None and len(ents) == len(text) % 4 == 2
    assert ents[0]["cui"].startswith("C")
    assert ents[0]["timestamp"] == "2026-01-01T00:00:00"  # denormalized result ts
    assert isinstance(ents[0]["start"], int)


def test_normalize_medcat_stringly_result():
    # result may arrive as a JSON string (nlp_service.py:102-103)
    text = "value key sort customer another"  # len 31 → 3 entities
    env = medcat_envelope(5, text)
    env["result"] = json.dumps(env["result"])
    ents = normalize_medcat(env)
    assert ents is not None and len(ents) == 3


def test_normalize_medcat_ordinal_map_order():
    # entities arrive as an ordinal-keyed MAP; order by numeric key
    env = {
        "result": {
            "annotations": {"entities": {"10": {"id": 10, "cui": "Cb"}, "2": {"id": 2, "cui": "Ca"}}},
            "timestamp": "t",
        }
    }
    ents = normalize_medcat(env)
    assert [e["cui"] for e in ents] == ["Ca", "Cb"]


def test_normalize_medcat_malformed_guards():
    # P6 guards (annotations_indexer.py:266-289): malformed → None, never raise
    for bad in [None, {}, {"result": {}}, {"result": {"annotations": None}},
                {"result": {"annotations": {"entities": None}}},
                {"result": "not json {"}]:
        assert normalize_medcat(bad) is None


def test_normalize_gate_sequential_ids_and_substring():
    text = "abcdefghij"
    env = {
        "entities": {
            "Person": [{"indices": ["2", 6]}],
            "Org": [{"indices": [0, 4]}, {"indices": [5, 9]}],
        }
    }
    ents = normalize_gate(env, text, pipeline_url="u", timestamp="ts")
    # sorted type order (Org < Person), sequential ids (nlp_service.py:117)
    assert [e["id"] for e in ents] == [0, 1, 2]
    assert [e["type"] for e in ents] == ["Org", "Org", "Person"]
    assert ents[0]["source_value"] == text[0:4]
    assert ents[2]["source_value"] == text[2:6]  # indices coerced from strings
    assert ents[0]["pipeline_url"] == "u"
    assert normalize_gate({"entities": None}, text) is None


def test_http_client_retry_and_multi_endpoint_merge():
    calls = []

    def transport(url, text):
        calls.append(url)
        if url == "flaky" and calls.count("flaky") == 1:
            return None  # first attempt fails → retried (nlp_service.py:75-80)
        return medcat_envelope(1, text)

    client = HttpNlpClient(["flaky", "stable"], mode="medcat", max_retries=1, transport=transport)
    text = "value key sort customer joined"  # len 30 → 2 entities/endpoint
    [ents] = client.annotate_batch([1], [text])
    assert calls.count("flaky") == 2 and calls.count("stable") == 1
    assert len(ents) == 2 * (len(text) % 4)  # merged endpoints


def test_http_client_total_failure_yields_none():
    client = HttpNlpClient(["down"], max_retries=2, transport=lambda u, t: None)
    assert client.annotate_batch([1], ["some text here"]) == [None]  # B3: row skipped


def test_bioyodie_defaults():
    c = BioyodieClient(["x"], transport=lambda u, t: None)
    assert c.mode == "gate"
    assert c.application_params == {"annotationSets": "Bio:*"}


def test_fake_annotator_modes():
    med = DeterministicFakeAnnotator("medcat")
    gat = DeterministicFakeAnnotator("gate")
    text = "abcdefghij"  # len 10 → 2 entities
    [m], [g] = med.annotate_batch([3], [text]), gat.annotate_batch([3], [text])
    assert m is not None and g is not None
    assert {e["cui"] for e in m} and all("type" in e for e in g)
    assert med.annotate_batch([1], [None]) == [None]
    assert gate_envelope(3, text)["text"] == text


def test_annotator_registry():
    from annotations_ingester_spark.annotator.registry import (
        get_annotator,
        list_annotators,
        register_annotator,
    )

    assert {"fake-medcat", "fake-gate"} <= set(list_annotators())
    fake = get_annotator("fake-medcat")()
    [ents] = fake.annotate_batch([1], ["abcdefghij"])
    assert len(ents) == 2

    register_annotator("custom", urls=["http://nlp:5000"], mode="gate-nlp", retries=3)
    client = get_annotator("custom")()
    assert client.mode == "gate" and client.max_retries == 3

    import pytest

    with pytest.raises(KeyError, match="no annotator registered"):
        get_annotator("missing")
