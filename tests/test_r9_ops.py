"""Round-9 operator tests: Bloom membership cert, local clustering
coefficient, Hodges-Lehmann estimator, DP noisy-count release,
split-leakage audit, character-bigram entropy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from annotations_ingester_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_local_clustering_triangle_pendant(spark):
    """Triangle {1,2,3} + pendant 3-4: the degree-2 corners have cc=1
    (their neighborhood is fully connected), the hub has cc=2·1/(3·2)=1/3,
    the pendant (degree 1) reports 0.0."""
    from annotations_ingester_spark.operators.graph import local_clustering

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["src", "dst"]
    )
    out = {r.node: r for r in local_clustering(edges).collect()}
    assert out[1].local_cc == 1.0 and out[1].n_tri == 1
    assert out[2].local_cc == 1.0
    assert out[3].deg == 3 and out[3].local_cc == round(1 / 3, 6)
    assert out[4].deg == 1 and out[4].n_tri == 0 and out[4].local_cc == 0.0


def test_bloom_membership_no_false_negatives(spark):
    """The structural Bloom guarantee: every truly-present key must hit
    all k positions — false_negatives is 0 by construction, and the
    cert's tallies must partition the probe set."""
    r = REGISTRY["sketch_bloom_membership_cert"].spark(spark, SF).collect()[0]
    assert r.false_negatives == 0
    assert r.n_probe == 150  # every sf0.001 customer probed
    assert r.n_present + r.n_absent == r.n_probe
    assert 0 <= r.false_positives <= r.n_absent
    assert 0.0 <= r.fpr_measured <= 1.0
    # n=~100 build keys in m=65536 bits -> expected fpr well under 1%
    assert r.fpr_expected < 0.01
    assert r.n_bits_set <= 4 * r.n_build  # k positions per key, pre-dedup


def test_hodges_lehmann_matches_numpy(spark):
    """Independent recompute: the HL estimate must equal the numpy median
    of all Walsh averages of the daily revenue series."""
    import duckdb
    import numpy as np

    days = duckdb.sql(
        f"""SELECT sum(round(value * 100)::BIGINT)::BIGINT AS x
            FROM '{SF}/events.parquet'
            GROUP BY (floor(epoch(ts))::BIGINT // 86400)"""
    ).fetchnumpy()["x"]
    walsh = [
        (int(days[i]) + int(days[j])) / 2.0
        for i in range(len(days))
        for j in range(i, len(days))
    ]
    expected = float(np.median(np.array(walsh)))
    r = REGISTRY["stats_hodges_lehmann"].spark(spark, SF).collect()[0]
    assert r.n_days == len(days)
    assert r.n_pairs == len(walsh)
    assert r.hl_cents == pytest.approx(expected, abs=0.01)


def test_dp_noisy_counts_deterministic_and_consistent(spark):
    """The seeded release is reproducible (same noise both runs), the
    noisy count is exactly exact+noise, and the envelope flag matches
    the |noise| <= b·ln(100) rule."""
    rows1 = {
        r.n_name: r
        for r in REGISTRY["privacy_dp_noisy_counts_cert"].spark(spark, SF).collect()
    }
    rows2 = {
        r.n_name: r
        for r in REGISTRY["privacy_dp_noisy_counts_cert"].spark(spark, SF).collect()
    }
    assert len(rows1) == 25
    b_ln100 = math.log(100.0)
    for name, r in rows1.items():
        assert rows2[name].noise == r.noise  # seeded, not random
        assert r.noisy_count == pytest.approx(r.exact_count + r.noise, abs=2e-6)
        assert r.within_99pct == (abs(r.noise) <= b_ln100 + 1e-9)
    # noise must actually vary across groups (it is a per-group draw)
    assert len({r.noise for r in rows1.values()}) > 1


def test_split_leakage_audit_consistent(spark):
    r = REGISTRY["eval_split_leakage_audit"].spark(spark, SF).collect()[0]
    assert 0 <= r.n_cross_pairs <= r.n_eval_side_pairs <= r.n_neardup_pairs
    assert r.n_contaminated_eval_docs <= r.n_cross_pairs or r.n_cross_pairs == 0
    assert 0.0 <= r.leakage_rate <= 1.0


def test_char_entropy_known_values(spark, tmp_path):
    """'aaaaa' has one bigram type -> entropy 0 (flagged); 'ababa' has
    bigrams ab,ba,ab,ba -> exactly 1 bit; a diverse string clears the
    3-bit flag."""
    import pandas as pd

    diverse = "the quick brown fox jumps over the lazy dog 0123456789"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["aaaaa", "ababa", diverse],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [5, 5, len(diverse)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_id: r
        for r in REGISTRY["text_char_entropy"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1].char_bigram_entropy == 0.0 and out[1].low_entropy_flag
    assert out[2].n_bigrams == 4
    assert out[2].char_bigram_entropy == 1.0 and out[2].low_entropy_flag
    assert out[3].char_bigram_entropy > 3.0 and not out[3].low_entropy_flag
