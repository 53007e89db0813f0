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


# --- batch B: ANOVA, permutation, PSI, conformal, centroids, jaccard -------


def test_anova_matches_scipy_formula(spark):
    """Independent recompute of the F statistic from raw group arrays."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, list(round(o_totalprice * 100)::BIGINT)
            FROM '{SF}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    groups = [g for _, g in rows]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f_expected = (ssb / (k - 1)) / (ssw / (n - k))
    r = REGISTRY["stats_anova_oneway"].spark(spark, SF).collect()[0]
    assert r.k == k and r.n_total == n
    assert r.f_stat == pytest.approx(f_expected, rel=1e-4)
    assert r.eta_squared == pytest.approx(ssb / (ssb + ssw), abs=1e-4)


def test_permutation_test_pvalue_valid(spark):
    """A/A p-value is in (0,1], add-one guaranteed > 0, and the replicate
    count is the pinned constant."""
    r = REGISTRY["stats_permutation_test"].spark(spark, SF).collect()[0]
    assert r.b_reps == 499
    assert 1.0 / 500 <= r.p_value <= 1.0
    assert r.n_days == 30  # sf0.001 date domain


def test_psi_identical_halves_is_zero(spark, tmp_path):
    """A synthetic orders table whose two halves share the exact value
    distribution must score PSI == 0."""
    import pandas as pd

    vals = [10_000.0, 20_000.0, 60_000.0, 120_000.0] * 25
    df = pd.DataFrame(
        {
            "o_orderkey": range(200),
            "o_custkey": [1] * 200,
            "o_orderstatus": ["F"] * 200,
            "o_totalprice": vals + vals,
            "o_orderdate": pd.Series(
                [pd.Timestamp("2024-01-01")] * 100
                + [pd.Timestamp("2024-06-01")] * 100,
                dtype="datetime64[us]",  # Spark can't read NANOS here
            ),
            "o_orderpriority": ["1-URGENT"] * 200,
        }
    )
    df.to_parquet(tmp_path / "orders.parquet")
    r = REGISTRY["stats_psi_drift"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_first_half == 100 and r.n_second_half == 100
    assert r.psi == 0.0


def test_conformal_coverage_guarantee(spark):
    """Finite-sample conformal validity: test coverage must land near the
    90% target (within binomial noise for the sf0.001 test-split size),
    and qhat must be the k-th smallest calibration residual."""
    r = REGISTRY["eval_conformal_coverage"].spark(spark, SF).collect()[0]
    assert r.n_train + r.n_cal + r.n_test == 1000  # sf0.001 events
    assert r.k_rank == math.ceil(0.9 * (r.n_cal + 1))
    assert r.coverage >= 0.80  # 90% guarantee minus small-sample noise
    assert r.qhat_millicents > 0


def test_label_centroid_sim_range_and_count(spark):
    rows = REGISTRY["eval_label_centroid_sim"].spark(spark, SF).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2  # every unordered pair
    for r in rows:
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
        assert r.label_a < r.label_b


def test_vocab_jaccard_self_similarity_bounds(spark, tmp_path):
    """Two sources with identical corpora -> Jaccard 1; a disjoint third
    -> Jaccard 0 against both."""
    import pandas as pd

    same = "alpha beta gamma delta epsilon"
    other = "zeta eta theta iota kappa"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [same, same, other],
            "lang": ["en"] * 3,
            "source": ["s1", "s2", "s3"],
            "n_chars": [len(same), len(same), len(other)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        (r.source_a, r.source_b): r
        for r in REGISTRY["lm_vocab_jaccard_sources"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert len(rows) == 3
    assert rows[("s1", "s2")].jaccard == 1.0
    assert rows[("s1", "s3")].jaccard == 0.0
    assert rows[("s2", "s3")].jaccard == 0.0
