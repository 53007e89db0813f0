"""Hand-computed references for the round-6 quality-statistics queries
(the catalog oracles certify them against DuckDB at three SFs; these pin
the arithmetic itself on tiny inputs a reviewer can verify by hand)."""

from __future__ import annotations

import math


def test_chi_square_known_table(spark, tmp_path):
    """2×2 table [[10, 20], [30, 40]] → chi2 = N(ad-bc)²/(r1 r2 c1 c2)."""
    import pandas as pd

    rows = (
        [("en", "a")] * 10 + [("en", "b")] * 20 + [("fr", "a")] * 30 + [("fr", "b")] * 40
    )
    pd.DataFrame(
        {"doc_id": range(len(rows)),
         "lang": [r[0] for r in rows],
         "source": [r[1] for r in rows],
         "text": ["x"] * len(rows),
         "n_chars": [1] * len(rows)}
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_chi_square_independence"].spark(spark, str(tmp_path)).collect()[0]
    n, a, b, c, d = 100, 10, 20, 30, 40
    expected = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert r.dof == 1 and r.n_cells == 4
    assert abs(r.chi2 - expected) < 1e-4


def test_lm_perplexity_uniform_corpus(spark, tmp_path):
    """Two identical docs 'a b a b': bigrams {ab:2(x2 docs? no — per doc
    'a b','b a','a b'}. Verify one doc's cross-entropy against the direct
    formula."""
    import pandas as pd

    pd.DataFrame(
        {"doc_id": [1, 2], "lang": ["en", "en"], "source": ["s", "s"],
         "text": ["a b a b", "a b c"], "n_chars": [7, 5]}
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    out = {
        r.doc_id: r
        for r in REGISTRY["lm_perplexity_scores"].spark(spark, str(tmp_path)).collect()
    }
    # corpus: doc1 tokens a,b,a,b ; doc2 a,b,c → V=3
    # unigram counts: a=3, b=3, c=1
    # bigram counts: 'a b'=3 (2 in doc1, 1 in doc2), 'b a'=1, 'b c'=1
    V = 3.0
    nll = lambda c2, c1: round(math.log2(c1 + V) - math.log2(c2 + 1), 9)
    d1 = (nll(3, 3) + nll(1, 3) + nll(3, 3)) / 3  # a b, b a, a b
    assert out[1].n_bigrams == 3
    assert abs(out[1].cross_entropy - round(d1, 6)) < 1e-6
    d2 = (nll(3, 3) + nll(1, 3)) / 2  # a b, b c
    assert out[2].n_bigrams == 2
    assert abs(out[2].cross_entropy - round(d2, 6)) < 1e-6


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """Docs sharing the target language's bigrams must score higher than
    disjoint ones (sign test, not exact arithmetic — that's the oracle's
    job)."""
    import pandas as pd

    rows = []
    for i in range(10):
        rows.append((i, "en", "s", "alpha beta gamma delta"))
    rows.append((100, "fr", "s", "alpha beta gamma delta"))  # target-like
    rows.append((101, "fr", "s", "zig zag zip zap"))  # disjoint
    pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "lang": [r[1] for r in rows],
         "source": [r[2] for r in rows], "text": [r[3] for r in rows],
         "n_chars": [len(r[3]) for r in rows]}
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    out = {
        r.doc_id: r.avg_log_weight
        for r in REGISTRY["dsir_importance_weights"].spark(spark, str(tmp_path)).collect()
    }
    assert out[100] > out[101]


def test_sketch_rollup_certified_and_exact(spark):
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = REGISTRY["sketch_mergeable_rollup"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r.certified for r in rows)
    per = [r for r in rows if r.scope != "ALL"]
    allr = [r for r in rows if r.scope == "ALL"]
    assert len(allr) == 1 and len(per) >= 2
    # union distinct ≤ sum of group distincts (overlap), ≥ max group
    assert allr[0].exact_distinct <= sum(r.exact_distinct for r in per)
    assert allr[0].exact_distinct >= max(r.exact_distinct for r in per)


def test_misra_gries_guarantee_on_adversarial_stream(spark):
    """The MG theorems the certified query leans on, checked directly:
    any item with frequency > N/k appears in the merged summary with an
    estimate in [exact - N/k, exact] — under a stream deliberately
    spread across many partitions/batches."""
    from collections import Counter

    from annotations_ingester_spark.operators.sketches import (
        misra_gries_summaries,
    )

    # 3 hot items at ~10% each + a long uniform tail, shuffled
    # deterministically across 16 partitions
    vals = []
    for i in range(20000):
        if i % 10 < 3:
            vals.append(i % 10)  # items 0,1,2 hot
        else:
            vals.append(100 + (i * 7919) % 500)
    df = spark.createDataFrame([(v,) for v in vals], "item long").repartition(16)
    k = 20
    est = {
        r.item: r.mg_count
        for r in misra_gries_summaries(df, "item", k=k).collect()
    }
    exact = Counter(vals)
    n = len(vals)
    for item, c in exact.items():
        if c > n / k:
            assert item in est, f"guaranteed-frequent item {item} missing"
            assert est[item] <= c and c - est[item] <= n / k, (item, c, est[item])


def test_misra_gries_batch_bounds():
    from annotations_ingester_spark.operators.sketches import misra_gries_batch

    stream = [1] * 50 + [2] * 30 + list(range(100, 140))
    out = misra_gries_batch(stream, k=5)
    assert len(out) <= 5
    assert out.get(1, 0) <= 50 and 50 - out.get(1, 0) <= len(stream) / 5


def _write_events(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": [1] * len(rows),
            "event_type": [r[0] for r in rows],
            "value": [r[1] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_ks_identical_samples_d_zero(spark, tmp_path):
    """Identical click/purchase value distributions → D = 0."""
    rows = [("click", v) for v in (1.0, 2.0, 3.0)] + [
        ("purchase", v) for v in (1.0, 2.0, 3.0)
    ]
    _write_events(tmp_path, rows)
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_ks_test"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.d_num, r.d_stat) == (3, 3, 0, 0.0)


def test_ks_disjoint_samples_d_one(spark, tmp_path):
    """Fully separated samples → D = 1 (max CDF gap at the boundary)."""
    rows = [("click", v) for v in (1.0, 2.0)] + [
        ("purchase", v) for v in (10.0, 20.0)
    ]
    _write_events(tmp_path, rows)
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_ks_test"].spark(spark, str(tmp_path)).collect()[0]
    assert r.d_stat == 1.0 and r.d_num == r.n1 * r.n2


def test_mann_whitney_hand_example(spark, tmp_path):
    """A = {1,2}, B = {3,4}: R1 = 1+2 = 3 → U1 = 0; with ties doubled
    ranks stay integral (u1_doubled = 2*U1)."""
    rows = [("click", 1.0), ("click", 2.0), ("purchase", 3.0), ("purchase", 4.0)]
    _write_events(tmp_path, rows)
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_mann_whitney"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.u1_doubled, r.t_ties) == (2, 2, 0, 0)
    assert r.rank_biserial == -1.0  # all A below all B


def test_auc_perfect_separation(spark, tmp_path):
    """English docs all longer-worded than the rest → AUC = 1."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en", "en", "fr", "fr"],
            "source": ["s"] * 4,
            # chars-per-token score: en docs one long token, fr docs short
            "text": ["abcdefghij", "abcdefgh", "ab", "abc"],
            "n_chars": [10, 8, 2, 3],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["eval_auc_roc"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc, r.gini) == (2, 2, 1.0, 1.0)


def test_good_turing_hand_counts(spark, tmp_path):
    """Corpus 'a a a b b c' → N_1 = 1 (c), N_2 = 1 (b), N_3 = 1 (a):
    r*(1) = 2*N_2/N_1 = 2; r*(2) = 3*N_3/N_2 = 3; r*(3) = 4*0/1 = 0."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1],
            "lang": ["en"],
            "source": ["s"],
            "text": ["a a a b b c"],
            "n_chars": [11],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = {
        r.r: r
        for r in REGISTRY["lm_good_turing_counts"].spark(spark, str(tmp_path)).collect()
    }
    assert rows[1].r_star == 2.0 and rows[2].r_star == 3.0 and rows[3].r_star == 0.0
    assert rows[1].n_r == rows[2].n_r == rows[3].n_r == 1


def test_acf_constant_series_zero(spark, tmp_path):
    """A constant daily series has zero variance → acf guards to 0."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=10, freq="D")
    pd.DataFrame(
        {
            "event_id": range(10),
            "ts": days,
            "user_id": [1] * 10,
            "event_type": ["click"] * 10,
            "value": [5.0] * 10,
            "props": ["{}"] * 10,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = REGISTRY["timeseries_acf"].spark(spark, str(tmp_path)).collect()
    assert {r.lag for r in rows} == {1, 2, 3, 4, 5}
    assert all(r.acf == 0.0 for r in rows)


def test_acf_alternating_series_lag_signs(spark, tmp_path):
    """Alternating hi/lo days: acf(1) ≈ -1, acf(2) ≈ +1."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=12, freq="D")
    vals = [10.0 if i % 2 == 0 else 1.0 for i in range(12)]
    pd.DataFrame(
        {
            "event_id": range(12),
            "ts": days,
            "user_id": [1] * 12,
            "event_type": ["click"] * 12,
            "value": vals,
            "props": ["{}"] * 12,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = {r.lag: r.acf for r in REGISTRY["timeseries_acf"].spark(spark, str(tmp_path)).collect()}
    assert rows[1] < -0.9 and rows[2] > 0.9


def test_theil_sen_exact_linear(spark, tmp_path):
    """Orders forming an exact monthly line y = 100*m + c in cents →
    sen slope = exactly 100 cents/month, immune to one outlier month."""
    import pandas as pd

    months = pd.period_range("2023-01", periods=9, freq="M")
    dates = [m.to_timestamp().date() for m in months]
    prices = [1.0 * (i + 1) for i in range(9)]  # +1.00/month → +100 cents
    prices[4] = 500.0  # one contaminated month
    pd.DataFrame(
        {
            "o_orderkey": range(9),
            "o_custkey": [1] * 9,
            "o_orderstatus": ["F"] * 9,
            "o_totalprice": prices,
            "o_orderdate": dates,
            "o_orderpriority": ["1-URGENT"] * 9,
            "o_clerk": ["c"] * 9,
            "o_shippriority": [0] * 9,
            "o_comment": [""] * 9,
        }
    ).to_parquet(tmp_path / "orders.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_theil_sen_slope"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_points == 9 and r.n_pairs == 36
    assert r.sen_slope == 100.0


def test_kaplan_meier_hand_curve(spark, tmp_path):
    """3 users: conversions at t=1 and t=2, one censored at t=2.
    S(1) = 2/3; S(2) = 2/3 * 1/2 = 1/3 (risk set at t=2 is {u2, u3})."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        # u1: first event day0, big purchase day1 → death t=1
        (1, base, "click", 1.0),
        (1, base + pd.Timedelta(days=1), "purchase", 200.0),
        # u2: first day0, big purchase day2 → death t=2
        (2, base, "click", 1.0),
        (2, base + pd.Timedelta(days=2), "purchase", 200.0),
        # u3: first day0, last day2, never converts → censored t=2
        (3, base, "click", 1.0),
        (3, base + pd.Timedelta(days=2), "view", 1.0),
    ]
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    out = {
        r.lifetime_days: r
        for r in REGISTRY["survival_kaplan_meier"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1].n_risk == 3 and out[1].n_deaths == 1
    assert abs(out[1].survival - 2 / 3) < 1e-5
    assert out[2].n_risk == 2 and out[2].n_deaths == 1
    assert abs(out[2].survival - 1 / 3) < 1e-5


def test_spearman_perfect_monotone(spark, tmp_path):
    """Days where purchase volume rises exactly with click volume →
    rho = 1 even though the relationship is nonlinear."""
    import pandas as pd

    rows = []
    base = pd.Timestamp("2024-01-01")
    for day in range(5):
        for _ in range(day + 1):
            rows.append((base + pd.Timedelta(days=day), "click"))
        for _ in range((day + 1) ** 2):  # nonlinear but monotone
            rows.append((base + pd.Timedelta(days=day), "purchase"))
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[0] for r in rows],
            "user_id": [1] * len(rows),
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_spearman_corr"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n == 5 and r.spearman_rho == 1.0


def test_minhash_mergeable_always_exact(spark):
    """Mergeability is an algebraic identity — every seed must agree at
    sf0.001."""
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = (
        REGISTRY["sketch_minhash_mergeable"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 8 and all(r.merge_exact for r in rows)


def test_cusum_locates_level_shift(spark, tmp_path):
    """10 days at 100 then 10 days at 900 → the changepoint lands on the
    last low day (max |cumulative deviation|)."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=20, freq="D")
    vals = [1.0] * 10 + [9.0] * 10
    pd.DataFrame(
        {
            "event_id": range(20),
            "ts": days,
            "user_id": [1] * 20,
            "event_type": ["click"] * 20,
            "value": vals,
            "props": ["{}"] * 20,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["events_changepoint_cusum"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 20 and r.cp_index == 10
    # |S_10| = 10*(100 - 500) = 4000 cents below the mean path
    assert r.max_dev_cents == 4000.0


def test_seasonal_index_flat_series_is_one(spark, tmp_path):
    """A constant daily series → every weekly phase index is exactly 1."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=14, freq="D")
    pd.DataFrame(
        {
            "event_id": range(14),
            "ts": days,
            "user_id": [1] * 14,
            "event_type": ["click"] * 14,
            "value": [5.0] * 14,
            "props": ["{}"] * 14,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = REGISTRY["timeseries_seasonal_decompose"].spark(spark, str(tmp_path)).collect()
    assert len(rows) == 7
    assert all(r.seasonal_index == 1.0 and r.n_days == 2 for r in rows)


def test_benford_digit_extraction(spark, tmp_path):
    """Prices 1.23 / 0.45 / 9.99 → first cents digits 1, 4, 9."""
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1] * 3,
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": [1.23, 0.45, 9.99],
            "o_orderdate": [pd.Timestamp("2024-01-01").date()] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
            "o_clerk": ["c"] * 3,
            "o_shippriority": [0] * 3,
            "o_comment": [""] * 3,
        }
    ).to_parquet(tmp_path / "orders.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = {
        r.digit: r
        for r in REGISTRY["stats_benford_first_digit"].spark(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 4, 9} and all(r.n_obs == 1 for r in rows.values())
    import math

    assert abs(rows[1].expected_n - 3 * math.log10(2)) < 1e-3


def test_oov_rate_hand_vocab(spark, tmp_path):
    """Tokens: 'a'x5 'b'x3 'c'x2; a top-1 budget covers 5/10 → the query
    at its smallest pinned budget (100 >= all types) covers everything."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1],
            "lang": ["en"],
            "source": ["s"],
            "text": ["a a a a a b b b c c"],
            "n_chars": [19],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = {
        r.vocab_size: r
        for r in REGISTRY["lm_oov_rate_by_vocab_size"].spark(spark, str(tmp_path)).collect()
    }
    assert rows[100].total_tokens == 10
    assert rows[100].covered_tokens == 10 and rows[100].oov_rate == 0.0


def test_forecast_backtest_perfect_weekly_cycle(spark, tmp_path):
    """A strict 7-day periodic series → seasonal-naive MAE = 0,
    improvement = 1."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=42, freq="D")
    vals = [float(1 + (i % 7)) for i in range(42)]
    pd.DataFrame(
        {
            "event_id": range(42),
            "ts": days,
            "user_id": [1] * 42,
            "event_type": ["click"] * 42,
            "value": vals,
            "props": ["{}"] * 42,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["forecast_backtest_mae"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_naive == 28 and r.n_seasonal == 28
    assert r.mae_seasonal_cents == 0.0 and r.improvement == 1.0
    assert r.mae_naive_cents > 0


def test_kendall_tau_perfect_and_reversed(spark, tmp_path):
    """Strictly co-monotone daily (x, y) with no ties → tau_b = 1."""
    import pandas as pd

    rows = []
    base = pd.Timestamp("2024-01-01")
    for day in range(4):
        rows += [(base + pd.Timedelta(days=day), "click")] * (day + 1)
        rows += [(base + pd.Timedelta(days=day), "purchase")] * (2 * day + 1)
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[0] for r in rows],
            "user_id": [1] * len(rows),
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_kendall_tau"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 6 and r.concordant == 6 and r.discordant == 0
    assert r.ties_x == 0 and r.ties_y == 0 and r.kendall_tau_b == 1.0


def test_readability_hand_counts(spark, tmp_path):
    """'The cat sat. It ran!' → 2 sentences, 5 words; syllables = vowel
    runs (e, a, a, i, a) = 5."""
    import pandas as pd

    text = "The cat sat. It ran!"
    pd.DataFrame(
        {
            "doc_id": [1],
            "lang": ["en"],
            "source": ["s"],
            "text": [text],
            "n_chars": [len(text)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["text_readability_fk"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_sentences, r.n_words, r.n_syllables) == (2, 5, 5)
    # FK = 0.39*(5/2) + 11.8*(5/5) - 15.59 = 0.975 + 11.8 - 15.59
    assert abs(r.fk_grade - (0.39 * 2.5 + 11.8 - 15.59)) < 1e-6


def test_pareto_abc_hand_classes(spark, tmp_path):
    """Revenues 80, 15, 5 → exactly one A (cum 80%), one B (95%), one C."""
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [10, 20, 30],
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": [80.0, 15.0, 5.0],
            "o_orderdate": [pd.Timestamp("2024-01-01").date()] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
            "o_clerk": ["c"] * 3,
            "o_shippriority": [0] * 3,
            "o_comment": [""] * 3,
        }
    ).to_parquet(tmp_path / "orders.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = {
        r.abc_class: r
        for r in REGISTRY["orders_pareto_abc"].spark(spark, str(tmp_path)).collect()
    }
    assert rows["A"].n_customers == 1 and rows["A"].class_rev_cents == 8000
    assert rows["B"].n_customers == 1 and rows["B"].class_rev_cents == 1500
    assert rows["C"].n_customers == 1 and rows["C"].class_rev_cents == 500


def test_runs_test_alternating_series(spark, tmp_path):
    """Strictly alternating up/down moves → every move starts a new run
    (runs = n) and z is strongly positive."""
    import pandas as pd

    days = pd.date_range("2024-01-01", periods=13, freq="D")
    vals = [5.0 if i % 2 == 0 else 1.0 for i in range(13)]
    pd.DataFrame(
        {
            "event_id": range(13),
            "ts": days,
            "user_id": [1] * 13,
            "event_type": ["click"] * 13,
            "value": vals,
            "props": ["{}"] * 13,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_runs_test"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n == 12 and r.runs == 12 and r.n_up == 6 and r.n_down == 6
    assert r.z_score > 2.0


def test_welch_ttest_hand_moments(spark, tmp_path):
    """click cents {100,200,300}, view cents {200,400,600}: m1=200, m2=400,
    v1=10000, v2=40000 → t = -200/sqrt(50000/3) ≈ -1.5492, df ≈ 2.94."""
    import pandas as pd

    vals = [("click", 1.0), ("click", 2.0), ("click", 3.0),
            ("view", 2.0), ("view", 4.0), ("view", 6.0)]
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": [base] * len(vals),
            "user_id": [1] * len(vals),
            "event_type": [t for t, _ in vals],
            "value": [v for _, v in vals],
            "props": ["{}"] * len(vals),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_welch_ttest"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2) == (3, 3)
    assert (r.mean1_cents, r.mean2_cents) == (200.0, 400.0)
    assert (r.var1, r.var2) == (10000.0, 40000.0)
    assert r.t_stat == -1.5492
    assert r.welch_df == 2.94


def test_bootstrap_ci_degenerate_constant_series(spark, tmp_path):
    """All events share value 2.00 → every replicate mean is exactly 200,
    so the CI collapses onto the point estimate (and exposes any weighting
    bug as a NULL or a spread)."""
    import pandas as pd

    n = 50
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(n)],
            "user_id": [1] * n,
            "event_type": ["click"] * n,
            "value": [2.0] * n,
            "props": ["{}"] * n,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_bootstrap_poisson_ci"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_events == n and r.n_replicates == 100
    assert r.point_mean_cents == 200.0
    assert r.ci_lo_cents == 200.0 and r.ci_hi_cents == 200.0


def test_gini_hand_values(spark, tmp_path):
    """Equal revenues → G = 0; cents {100,100,100,700} → S = 3400,
    G = (2*3400 - 5*1000) / (4*1000) = 0.45."""
    import pandas as pd

    pd.DataFrame(
        {"o_custkey": [1, 2, 3, 4], "o_totalprice": [10.0, 10.0, 10.0, 10.0]}
    ).to_parquet(tmp_path / "orders.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_gini_lorenz"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.total_cents, r.gini) == (4, 4000, 0.0)

    pd.DataFrame(
        {"o_custkey": [1, 2, 3, 4], "o_totalprice": [1.0, 1.0, 1.0, 7.0]}
    ).to_parquet(tmp_path / "orders.parquet")
    r = REGISTRY["stats_gini_lorenz"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.total_cents, r.gini) == (4, 1000, 0.45)


def test_did_null_effect_on_period_only_shift(spark, tmp_path):
    """Every user moves 1.00 → 3.00 across the pivot: both arms shift
    identically, so the A/A DiD estimate is exactly 0."""
    import pandas as pd

    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(8):
        rows.append((u, base, 1.0))
        rows.append((u, base + pd.Timedelta(days=20), 3.0))
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[1] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [r[2] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_diff_in_diff"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_t_pre + r.n_c_pre == 8 and r.n_t_post + r.n_c_post == 8
    assert r.mean_t_pre == 100.0 and r.mean_t_post == 300.0
    assert r.mean_c_pre == 100.0 and r.mean_c_post == 300.0
    assert r.did_cents == 0.0


def test_weighted_median_hand_cumulative(spark, tmp_path):
    """(price, qty) = (1.00,1),(2.00,2),(3.00,1): W=4; cumulative weight
    crosses W/4 at 100 cents and both W/2 and 3W/4 at 200 cents."""
    import pandas as pd

    pd.DataFrame(
        {"l_extendedprice": [1.0, 2.0, 3.0], "l_quantity": [1.0, 2.0, 1.0]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_weighted_median"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.total_weight, r.wq25_cents, r.wmedian_cents, r.wq75_cents) == (
        4,
        100,
        200,
        200,
    )


def test_ipw_constant_outcome_zero_effect(spark, tmp_path):
    """Every event is worth 2.00 in both strata → both IPW means are
    exactly 200 and the A/A effect is exactly 0 regardless of how the
    hash splits the arms."""
    import pandas as pd

    n = 40
    rows = [(u, t) for u in range(n) for t in ("click", "view")]
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(len(rows))],
            "user_id": [u for u, _ in rows],
            "event_type": [t for _, t in rows],
            "value": [2.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_ipw_estimate"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_strata == 2
    assert r.n_treat + r.n_control == len(rows)
    assert r.mu_treat_cents == 200.0 and r.mu_control_cents == 200.0
    assert r.ate_cents == 0.0


def test_power_mde_from_welch_moments(spark, tmp_path):
    """Same groups as the Welch test (v1=10000, v2=40000, n=3 each):
    SE = sqrt(50000/3) = 129.099445, MDE = 2.80159*SE = 361.6831 cents
    = 1.808415 of the 200-cent baseline."""
    import pandas as pd

    vals = [("click", 1.0), ("click", 2.0), ("click", 3.0),
            ("view", 2.0), ("view", 4.0), ("view", 6.0)]
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": [base] * len(vals),
            "user_id": [1] * len(vals),
            "event_type": [t for t, _ in vals],
            "value": [v for _, v in vals],
            "props": ["{}"] * len(vals),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_power_mde"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2) == (3, 3)
    assert r.se_cents == 129.099445
    assert r.mde_cents == 361.6831
    assert r.mde_rel == 1.808415


def test_overdispersion_poisson_boundary(spark, tmp_path):
    """Per-user click counts {1, 3}: mean 2, var 2, index exactly 1.0 —
    the Poisson boundary, not flagged."""
    import pandas as pd

    rows = [(1, "click")] + [(2, "click")] * 3
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(len(rows))],
            "user_id": [u for u, _ in rows],
            "event_type": [t for _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["stats_overdispersion"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_users, r.n_events, r.mean_k, r.var_k) == (2, 4, 2.0, 2.0)
    assert r.dispersion_index == 1.0 and not r.overdispersed


def test_group_sequential_balanced_mix_never_crosses(spark, tmp_path):
    """Every user contributes one purchase and one click per active day,
    so both arms convert at exactly 0.5 at every look: z = 0 everywhere,
    no OBF boundary crossed."""
    import pandas as pd

    rows = []
    for u in range(12):
        for d in (0, 7, 13, 19, 25):
            rows.append((u, d, "purchase"))
            rows.append((u, d, "click"))
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [base + pd.Timedelta(days=d, minutes=i)
                   for i, (_, d, _) in enumerate(rows)],
            "user_id": [u for u, _, _ in rows],
            "event_type": [t for _, _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rs = REGISTRY["stats_group_sequential"].spark(spark, str(tmp_path)).collect()
    assert [r.look for r in rs] == [1, 2, 3, 4, 5]
    assert all(r.z_k == 0.0 and not r.crossed for r in rs)
    assert rs[-1].n_treat + rs[-1].n_control == len(rows)


def test_srm_chi2_arithmetic(spark, tmp_path):
    """chi2 must equal (n1-n0)^2/(n1+n0) computed from the returned arm
    counts, and the flag must agree with the pinned 3.841 cutoff."""
    import pandas as pd

    n = 60
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": [base + pd.Timedelta(days=i % 3, minutes=i) for i in range(n)],
            "user_id": [i % 20 for i in range(n)],
            "event_type": ["click"] * n,
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    rows = REGISTRY["stats_sequential_srm"].spark(spark, str(tmp_path)).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_treat + r.n_control == 20
        expect = (r.n_treat - r.n_control) ** 2 / (r.n_treat + r.n_control)
        assert r.chi2 == round(expect, 4)
        assert r.srm_flag == (expect > 3.841)
