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


# --- batch C: Tukey, Brown-Forsythe, effect sizes, HLL inter, pinball ------


def test_tukey_hsd_pair_count_and_consistency(spark):
    """10 unordered pairs over 5 groups; q_stat recomputes from the
    reported mean diffs and the ANOVA MSW."""
    rows = REGISTRY["stats_tukey_hsd"].spark(spark, SF).collect()
    assert len(rows) == 10
    anova = REGISTRY["stats_anova_oneway"].spark(spark, SF).collect()[0]
    msw = anova.ss_within / (anova.n_total - anova.k)
    import duckdb

    sizes = dict(
        duckdb.sql(
            f"""SELECT o_orderpriority, count(*)
                FROM '{SF}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    for r in rows:
        assert r.grp_a < r.grp_b
        se = math.sqrt(msw / 2 * (1 / sizes[r.grp_a] + 1 / sizes[r.grp_b]))
        # q_stat is rounded to 4 dp in the query output
        assert r.q_stat == pytest.approx(
            abs(r.mean_diff_cents) / se, abs=1e-4 + 1e-3 * abs(r.q_stat)
        )
        assert r.significant == (r.q_stat >= 3.858) or abs(
            r.q_stat - 3.858
        ) < 1e-3


def test_brown_forsythe_matches_scipy_formula(spark):
    """Independent recompute: BF = one-way F over |x - group median|."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, list(round(o_totalprice * 100)::BIGINT)
            FROM '{SF}/orders.parquet' GROUP BY 1"""
    ).fetchall()

    def lower_median(g):
        s = sorted(g)
        return s[math.ceil(0.5 * len(s)) - 1]

    zs = [[abs(x - lower_median(g)) for x in g] for _, g in rows]
    n = sum(len(z) for z in zs)
    k = len(zs)
    grand = sum(sum(z) for z in zs) / n
    ssb = sum(len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs)
    ssw = sum(sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs)
    expected = (ssb / (k - 1)) / (ssw / (n - k))
    r = REGISTRY["stats_brown_forsythe"].spark(spark, SF).collect()[0]
    assert r.k == k and r.n_total == n
    assert r.bf_stat == pytest.approx(expected, rel=1e-3)


def test_effect_sizes_consistency(spark):
    """Hedges g is the documented shrink of d; magnitude matches the
    pinned thresholds; d agrees with Welch means scaled by pooled sd."""
    r = REGISTRY["stats_effect_sizes"].spark(spark, SF).collect()[0]
    shrink = 1.0 - 3.0 / (4.0 * (r.n1 + r.n2) - 9.0)
    assert r.hedges_g == pytest.approx(r.cohens_d * shrink, abs=2e-6)
    lvl = (
        "negligible"
        if abs(r.cohens_d) < 0.2
        else "small"
        if abs(r.cohens_d) < 0.5
        else "medium"
        if abs(r.cohens_d) < 0.8
        else "large"
    )
    assert r.magnitude == lvl
    w = REGISTRY["stats_welch_ttest"].spark(spark, SF).collect()[0]
    assert r.cohens_d == pytest.approx(
        (w.mean1_cents - w.mean2_cents) / r.pooled_sd_cents, rel=1e-3
    )


def test_hll_intersection_inclusion_exclusion(spark):
    """The exact tier is the integer identity |A∩B| = |A|+|B|-|A∪B|; the
    sketch estimate must sit inside the documented 3x envelope."""
    r = REGISTRY["sketch_hll_intersection_cert"].spark(spark, SF).collect()[0]
    assert r.exact_intersection == r.exact_a + r.exact_b - r.exact_union
    assert 0 <= r.exact_intersection <= min(r.exact_a, r.exact_b)
    assert r.certified  # deterministic for a fixed input set


def test_streaming_psi_equals_batch(spark):
    """The foreachBatch fold must reproduce the batch PSI bit-for-bit —
    the monoid merge claim, proven by running the stream."""
    batch = REGISTRY["stats_psi_drift"].spark(spark, SF).collect()
    stream = REGISTRY["streaming_psi_drift"].spark(spark, SF).collect()
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_pinball_loss_exact_recompute(spark):
    """Independent recompute of both losses for one event type from the
    raw split (same hash, same rank-ceil quantile convention)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""WITH e AS (
              SELECT event_id, event_type, round(value * 100)::BIGINT AS c,
                     (('0x' || substr(md5('pin:' || event_id::VARCHAR), 1, 15))
                       ::BIGINT) % 4 AS split
              FROM '{SF}/events.parquet' WHERE event_type = 'click')
            SELECT split <= 2 AS is_train, list(c ORDER BY c, event_id)
            FROM e GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    by = {k: v for k, v in rows}
    train, test = by[True], by[False]
    q50 = train[math.ceil(0.5 * len(train)) - 1]
    q90 = train[math.ceil(0.9 * len(train)) - 1]
    p50 = sum(5 * abs(c - q50) for c in test) / (10.0 * len(test))
    p90 = sum(
        9 * (c - q90) if c >= q90 else (q90 - c) for c in test
    ) / (10.0 * len(test))
    out = {
        r.event_type: r
        for r in REGISTRY["eval_pinball_loss"].spark(spark, SF).collect()
    }
    r = out["click"]
    assert r.n_train == len(train) and r.n_test == len(test)
    assert r.q50_cents == q50 and r.q90_cents == q90
    assert r.pinball50 == pytest.approx(p50, abs=1e-4)
    assert r.pinball90 == pytest.approx(p90, abs=1e-4)


# --- batch D: Cramér's V, NB fit, BH-FDR, 2-hop, DP quantile, fertility ----


def test_cramers_v_consistency(spark):
    """V recomputes from the chi-square query's own chi2/dof and sits in
    [0, 1]."""
    chi = REGISTRY["stats_chi_square_independence"].spark(spark, SF).collect()[0]
    r = REGISTRY["stats_cramers_v"].spark(spark, SF).collect()[0]
    assert r.chi2 == pytest.approx(chi.chi2, abs=1e-4)
    assert r.dof == chi.dof
    # min(r,c)-1 recovered from dof factorization is not unique; check the
    # definitional identity instead
    assert 0.0 <= r.cramers_v <= 1.0
    # V^2 * n * (min-1) == chi2 for the actual min dimension
    mins = [
        m
        for m in range(1, 40)
        if abs(r.cramers_v**2 * r.n * m - r.chi2) < max(1e-2, r.chi2 * 1e-3)
    ]
    assert mins, "cramers_v does not invert to chi2 for any min(r,c)-1"


def test_negative_binomial_fit_identities(spark):
    """Where overdispersed: NB mean r(1-p)/p must equal the sample mean and
    NB variance r(1-p)/p^2 the sample variance (method of moments)."""
    rows = REGISTRY["stats_negative_binomial_fit"].spark(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        if r.overdispersed:
            nb_mean = r.nb_r * (1 - r.nb_p) / r.nb_p
            nb_var = r.nb_r * (1 - r.nb_p) / r.nb_p**2
            assert nb_mean == pytest.approx(r.mean_count, rel=1e-3)
            assert nb_var == pytest.approx(r.var_count, rel=1e-3)
        else:
            assert r.nb_r is None and r.nb_p is None


def test_bh_fdr_step_up_consistency(spark):
    """The rejection set must be exactly the BH step-up: everything at or
    below the largest p_i <= alpha i/m."""
    rows = sorted(
        REGISTRY["stats_bh_fdr"].spark(spark, SF).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    m = len(rows)
    passing = [r.p_value for r in rows if r.p_value <= 0.10 * r.rank / m]
    thr = max(passing) if passing else -1.0
    for r in rows:
        assert r.bh_critical == pytest.approx(0.10 * r.rank / m, abs=1e-6)
        assert r.rejected == (r.p_value <= thr)
        assert 1.0 / 200 <= r.p_value <= 1.0


def test_two_hop_reach_path_graph(spark):
    """Path 1-2-3-4-5: ends reach 2, second nodes reach 3, middle 4."""
    from annotations_ingester_spark.operators.graph import two_hop_reach

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    out = {r.node: r for r in two_hop_reach(edges).collect()}
    assert out[1].deg == 1 and out[1].reach_2hop == 2
    assert out[2].deg == 2 and out[2].reach_2hop == 3
    assert out[3].deg == 2 and out[3].reach_2hop == 4
    assert out[5].reach_2hop == 2


def test_dp_quantile_release_deterministic_and_sane(spark):
    """Seeded release is reproducible; the true median bucket is correct
    by recompute; rank error is 0 when the mechanism picks the median."""
    import duckdb

    r1 = REGISTRY["privacy_dp_quantile_release"].spark(spark, SF).collect()[0]
    r2 = REGISTRY["privacy_dp_quantile_release"].spark(spark, SF).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert 0 <= r1.released_bucket <= 9
    med_cents = duckdb.sql(
        f"""SELECT median(round(o_totalprice * 100)::BIGINT)
            FROM '{SF}/orders.parquet'"""
    ).fetchone()[0]
    assert r1.true_median_bucket == min(int(med_cents) // 5000000, 9)
    if r1.released_bucket == r1.true_median_bucket:
        # the released bucket's rank error is the minimum over candidates
        assert r1.rank_error <= r1.n


def test_subword_fertility_bounds(spark):
    """BPE splits words, never merges across whitespace: fertility >= 1
    for every source (each ws word maps to >= 1 BPE token)."""
    rows = REGISTRY["lm_subword_fertility"].spark(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.fertility >= 1.0
        assert r.n_bpe_tokens >= r.n_ws_tokens
        assert r.fertility == pytest.approx(
            r.n_bpe_tokens / r.n_ws_tokens, abs=1e-5
        )


# --- batch E: kappa, Wilcoxon, Friedman, burstiness -------------------------


def test_cohens_kappa_identity(spark):
    """kappa recomputes from po/pe; po is the langid confusion accuracy."""
    r = REGISTRY["eval_cohens_kappa"].spark(spark, SF).collect()[0]
    assert r.kappa == pytest.approx((r.po - r.pe) / (1 - r.pe), abs=2e-5)
    conf = REGISTRY["eval_langid_confusion"].spark(spark, SF).collect()
    acc = sum(c.tp for c in conf) / sum(c.support for c in conf)
    assert r.po == pytest.approx(acc, abs=1e-6)
    assert -1.0 <= r.kappa <= 1.0


def test_wilcoxon_matches_scipy_formula(spark):
    """Independent recompute of W+ and the tie-corrected z from the raw
    daily paired differences."""
    import duckdb

    diffs = [
        v[0]
        for v in duckdb.sql(
            f"""WITH e AS (
                  SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                         event_type
                  FROM '{SF}/events.parquet')
                SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       - sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                FROM e GROUP BY day"""
        ).fetchall()
        if v[0] != 0
    ]
    n = len(diffs)
    sorted_abs = sorted(abs(d) for d in diffs)
    # midranks
    rank_of = {}
    i = 0
    while i < len(sorted_abs):
        j = i
        while j < len(sorted_abs) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        rank_of[sorted_abs[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(rank_of[abs(d)] for d in diffs if d > 0)
    from collections import Counter

    ties = sum(k**3 - k for k in Counter(sorted_abs).values())
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    )
    r = REGISTRY["stats_wilcoxon_signed_rank"].spark(spark, SF).collect()[0]
    assert r.n_pairs == n
    assert r.w_plus_doubled == int(2 * w_plus)
    assert r.t_ties == ties
    assert r.z_score == pytest.approx(z, abs=2e-4)


def test_friedman_matches_scipy_formula(spark):
    """Independent recompute via the Conover tie-general formula on
    midranks."""
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""WITH e AS (
              SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                     event_type
              FROM '{SF}/events.parquet')
            SELECT day, event_type, count(*) FROM e GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    cnt = {(d, t): 0 for d in days for t in types}
    for d, t, c in rows:
        cnt[(d, t)] = c
    n, k = len(days), len(types)
    rank_sum = dict.fromkeys(types, 0.0)
    a_sq = 0.0
    for d in days:
        vals = sorted(cnt[(d, t)] for t in types)
        c = Counter(vals)
        cum = 0
        midrank = {}
        for v in sorted(c):
            midrank[v] = cum + (c[v] + 1) / 2.0
            cum += c[v]
        for t in types:
            r_ = midrank[cnt[(d, t)]]
            rank_sum[t] += r_
            a_sq += r_ * r_
    sum_rj_sq = sum(v * v for v in rank_sum.values())
    chi2 = (
        (k - 1)
        * (sum_rj_sq - n * n * k * (k + 1) ** 2 / 4.0)
        / (a_sq - n * k * (k + 1) ** 2 / 4.0)
    )
    r = REGISTRY["stats_friedman_test"].spark(spark, SF).collect()[0]
    assert r.n_blocks == n and r.k == k
    assert r.chi2_f == pytest.approx(chi2, abs=2e-3)


def test_burstiness_poisson_vs_bursty(spark, tmp_path):
    """A token appearing once in every doc has Fano 0 (constant count); a
    token concentrated in one doc is maximally bursty (Fano ~ count)."""
    import pandas as pd

    docs = ["even " + "bursty " * 10] + ["even"] * 9
    pd.DataFrame(
        {
            "doc_id": range(10),
            "text": docs,
            "lang": ["en"] * 10,
            "source": ["t"] * 10,
            "n_chars": [len(x) for x in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.token: r
        for r in REGISTRY["text_token_burstiness"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out["even"].fano == 0.0  # once in every doc: zero variance
    assert out["bursty"].df == 1 and out["bursty"].fano > 5.0


# --- batch F: Kruskal-Wallis, Ljung-Box --------------------------------------


def test_kruskal_wallis_matches_scipy_formula(spark):
    """Independent recompute of tie-corrected H from the raw groups."""
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    values = sorted(v for _, v in rows)
    n = len(values)
    c = Counter(values)
    cum = 0
    midrank = {}
    for v in sorted(c):
        midrank[v] = cum + (c[v] + 1) / 2.0
        cum += c[v]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(midrank[v])
    s = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
    ties = sum(k**3 - k for k in c.values())
    h = (12.0 / (n * (n + 1)) * s - 3 * (n + 1)) / (1 - ties / (n**3 - n))
    r = REGISTRY["stats_kruskal_wallis"].spark(spark, SF).collect()[0]
    assert r.k_groups == len(groups) and r.n_total == n
    assert r.t_ties == ties
    assert r.h_stat == pytest.approx(h, abs=2e-3)


def test_ljung_box_matches_numpy(spark):
    """Independent recompute of Q from the daily series with the standard
    single-mean ACF estimator over the day+h pairing."""
    import duckdb

    days = dict(
        duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                       sum(round(value * 100)::BIGINT)
                FROM '{SF}/events.parquet' GROUP BY day"""
        ).fetchall()
    )
    keys = sorted(days)
    xs = [float(days[k]) for k in keys]
    n = len(xs)
    xbar = sum(xs) / n
    den = sum((x - xbar) ** 2 for x in xs)
    q = 0.0
    for h in range(1, 6):
        num = sum(
            (days[k] - xbar) * (days[k + h] - xbar)
            for k in keys
            if k + h in days
        )
        q += (num / den) ** 2 / (n - h)
    q *= n * (n + 2)
    r = REGISTRY["stats_ljung_box"].spark(spark, SF).collect()[0]
    assert r.n_days == n and r.n_lags == 5
    assert r.q_stat == pytest.approx(q, abs=2e-3)


# --- batch G: Mood's median test, MCC ----------------------------------------


def test_mood_median_matches_formula(spark):
    """Independent recompute: classify vs the exact lower grand median,
    chi-square of groups x {above, not} against the pooled proportion."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    values = sorted(v for _, v in rows)
    n = len(values)
    med = values[math.ceil(0.5 * n) - 1]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    a_tot = sum(1 for _, v in rows if v > med)
    p = a_tot / n
    chi2 = 0.0
    for g, vs in groups.items():
        ng = len(vs)
        above = sum(1 for v in vs if v > med)
        chi2 += (above - ng * p) ** 2 / (ng * p)
        chi2 += ((ng - above) - ng * (1 - p)) ** 2 / (ng * (1 - p))
    r = REGISTRY["stats_mood_median_test"].spark(spark, SF).collect()[0]
    assert r.k_groups == len(groups) and r.n_total == n
    assert r.grand_median_cents == med
    assert r.chi2_mood == pytest.approx(chi2, abs=2e-3)


def test_mcc_matches_formula(spark):
    """MCC recomputes from the reported confusion cells and is the phi
    coefficient in [-1, 1]."""
    r = REGISTRY["eval_mcc_langid"].spark(spark, SF).collect()[0]
    tp, tn, fp, fn = r.tp, r.tn, r.fp, r.fn
    denom = math.sqrt((tp + fp) * (tp + fn)) * math.sqrt((tn + fp) * (tn + fn))
    expected = 0.0 if denom == 0 else (tp * tn - fp * fn) / denom
    assert r.mcc == pytest.approx(expected, abs=2e-6)
    assert -1.0 <= r.mcc <= 1.0
    conf = {
        c.lang: c for c in REGISTRY["eval_langid_confusion"].spark(spark, SF).collect()
    }
    assert tp == conf["en"].tp  # binarized TP is the en diagonal cell
