"""Scalar function library tests (SURVEY §2.6)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from annotations_ingester_spark.functions.hashing import md5_hash64, seeded_hash64
from annotations_ingester_spark.functions.names import (
    format_index_name,
    index_name,
    normalize_index_name,
    synth_row_id,
)
from annotations_ingester_spark.functions.text import (
    bag_fingerprint,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from annotations_ingester_spark.functions.vectors import cosine_similarity, sign_bucket


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_normalize_index_name_matches_python_twin(spark):
    cases = ["MyIndex", "_lead.ing-", 'we#ird/chars*?"<>| x', "UPPER CASE"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["n"] for r in df.select(normalize_index_name("s").alias("n")).collect()]
    assert got == [format_index_name(c) for c in cases]
    # reference rules (es_common.py:116-131): lowercase, edge-strip, replace
    assert format_index_name("_Ann#Set x.") == "ann_set_x"


def test_index_name_and_row_id(spark):
    assert one(spark, index_name(F.lit("base"), F.lit("sfx"))) == "base-sfx"
    assert (
        one(spark, synth_row_id(F.lit(7), F.lit(3))) == "doc-7-ann-3"
    )  # annotations_indexer.py:221


def test_md5_hash64_matches_hashlib(spark):
    h = one(spark, md5_hash64(F.lit("hello")))
    assert h == int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    hs = one(spark, seeded_hash64(F.lit("abc"), 5))
    assert hs == int(hashlib.md5(b"5:abc").hexdigest()[:15], 16)


def test_tokens_and_shingles(spark):
    assert one(spark, tokens(F.lit("A b,,C  9x!"))) == ["a", "b", "c", "9x"]
    assert one(spark, token_count(F.lit("one two three"))) == 3
    assert one(spark, word_shingles(F.lit("a b c d"), 3)) == ["a b c", "b c d"]
    assert one(spark, word_shingles(F.lit("a b"), 3)) == []


def test_bag_fingerprint_is_order_insensitive(spark):
    a = one(spark, bag_fingerprint(F.lit("dog cat bird")))
    b = one(spark, bag_fingerprint(F.lit("bird dog cat cat")))
    assert a == b


def test_quality_score_bounds(spark):
    q = one(spark, quality_score(F.lit("the cat and the dog in a field")))
    assert 0.0 < q <= 1.0


def test_cosine_similarity_and_bucket(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    got = [r["c"] for r in df.select(F.round(cosine_similarity("a", "b"), 6).alias("c")).collect()]
    assert got == [1.0, 0.0, 0.0]  # zero-norm → 0, not NaN
    bdf = spark.createDataFrame([([1.0, -1.0, 1.0, -1.0],)], "v array<float>")
    assert bdf.select(sign_bucket("v", 4).alias("b")).first()["b"] == 0b1010


# ---- BPE encode (functions/bpe.py) -----------------------------------------


def test_bpe_greedy_left_to_right_semantics(spark):
    """The sentinel-replace fold must reproduce BPE's greedy
    left-to-right non-overlapping merge semantics exactly."""
    from annotations_ingester_spark.functions import bpe

    df = spark.createDataFrame(
        [(1, "the then that"), (2, "ananas"), (3, "THE!!"), (4, "xyz")],
        "i long, text string",
    )
    out = {
        r.i: (r.n, list(r.t))
        for r in df.select(
            "i",
            bpe.bpe_token_count("text").alias("n"),
            bpe.bpe_tokens("text").alias("t"),
        ).collect()
    }
    # 'the' -> th+e -> the (second-order merge); 'then' -> the,n;
    # 'that' -> th,at
    assert out[1][1][:1] == ["the"]
    assert out[3] == (1, ["the"])  # normalization strips case/punct
    # 'ananas': (a,n) merges greedily left-to-right -> an,an,a,s
    assert out[2] == (4, ["an", "an", "a", "s"])
    assert out[4] == (3, ["x", "y", "z"])  # no merges apply


def test_bpe_counts_match_token_list_lengths(spark):
    from annotations_ingester_spark.functions import bpe
    from annotations_ingester_spark.plans.catalog import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    rows = docs.select(
        bpe.bpe_token_count("text").alias("n"),
        F.size(bpe.bpe_tokens("text")).alias("m"),
    ).collect()
    assert rows and all(r.n == r.m for r in rows)
