"""Round-11 independent recomputes: every operator added this round gets a
from-raw-data Python check (the r9 lesson — parity alone cannot catch a
shared-formula bug)."""

from __future__ import annotations

import hashlib
import math

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _lifetimes():
    """Per-user (lifetime, observed) from the events table, recomputed in
    pure pandas — the shared input of the KM / Nelson-Aalen / log-rank
    family."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id,
                   (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                   event_type, value
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    first, last, conv = {}, {}, {}
    for uid, day, et, val in rows:
        first[uid] = min(first.get(uid, day), day)
        last[uid] = max(last.get(uid, day), day)
        if et == "purchase" and val >= 150:
            conv[uid] = min(conv.get(uid, day), day)
    out = []
    for uid in first:
        if uid in conv:
            out.append((uid, conv[uid] - first[uid], 1))
        else:
            out.append((uid, last[uid] - first[uid], 0))
    return out


def test_nelson_aalen_matches_python(spark):
    """H(t) recomputed with a plain Python loop over the risk-set table;
    Breslow survival = exp(-H)."""
    lts = _lifetimes()
    times = sorted({t for _, t, obs in lts if obs == 1})
    got = {
        r.lifetime_days: r
        for r in REGISTRY["survival_nelson_aalen"].spark(spark, SF).collect()
    }
    assert set(got) == set(times)
    h = 0.0
    for t in times:
        n_risk = sum(1 for _, lt, _ in lts if lt >= t)
        d = sum(1 for _, lt, obs in lts if lt == t and obs == 1)
        h += round(d / n_risk, 9)
        r = got[t]
        assert r.n_risk == n_risk and r.n_deaths == d
        assert r.cum_hazard == pytest.approx(h, abs=2e-6)
        assert r.breslow_survival == pytest.approx(math.exp(-h), abs=2e-6)


def test_nelson_aalen_vs_kaplan_meier(spark):
    """Cross-estimator check: Breslow survival upper-bounds KM (standard
    inequality exp(-d/n) >= 1 - d/n) and tracks it closely while d << n."""
    km = {
        r.lifetime_days: r.survival
        for r in REGISTRY["survival_kaplan_meier"].spark(spark, SF).collect()
    }
    na = {
        r.lifetime_days: r.breslow_survival
        for r in REGISTRY["survival_nelson_aalen"].spark(spark, SF).collect()
    }
    assert set(km) == set(na)
    for t in km:
        assert na[t] >= km[t] - 1e-9


def test_log_rank_matches_python(spark):
    """O/E/V recomputed with a plain Python loop over event times."""
    lts = [(uid % 2, t, obs) for uid, t, obs in _lifetimes()]
    times = sorted({t for _, t, obs in lts if obs == 1})
    o1 = e1 = v = 0.0
    for t in times:
        n = sum(1 for _, lt, _ in lts if lt >= t)
        n1 = sum(1 for g, lt, _ in lts if lt >= t and g == 1)
        d = sum(1 for _, lt, obs in lts if lt == t and obs == 1)
        d1 = sum(1 for g, lt, obs in lts if lt == t and obs == 1 and g == 1)
        o1 += d1
        e1 += round(d * n1 / n, 9)
        if n > 1:
            v += round(d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1), 9)
    r = REGISTRY["survival_log_rank"].spark(spark, SF).collect()[0]
    assert r.n_users_g0 == sum(1 for g, _, _ in lts if g == 0)
    assert r.n_users_g1 == sum(1 for g, _, _ in lts if g == 1)
    assert r.observed_g1 == o1
    assert r.expected_g1 == pytest.approx(e1, abs=2e-6)
    assert r.variance == pytest.approx(v, abs=2e-6)
    assert r.logrank_chi2 == pytest.approx((o1 - e1) ** 2 / v, abs=2e-4)
    assert r.curves_differ == ((o1 - e1) ** 2 / v >= 3.8415)


def _md5_64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pred_stream():
    """The deterministic synthetic prediction stream (conf_bp, correct)
    shared by the calibration family, recomputed from vec_ids directly."""
    import duckdb

    ids = duckdb.sql(
        f"SELECT vec_id FROM '{SF}/embeddings.parquet'"
    ).fetchnumpy()["vec_id"]
    out = []
    for vid in ids:
        conf = _md5_64(f"conf:{vid}") % 10000
        correct = 1 if (_md5_64(f"outcome:{vid}") % 10000) < (conf * 9) // 10 + 500 else 0
        out.append((conf, correct))
    return out


def test_ece_mce_matches_python(spark):
    p = _pred_stream()
    bins = {}
    for conf, corr in p:
        b = conf // 1000
        n, sc, nc = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, sc + conf, nc + corr)
    n_total = sum(n for n, _, _ in bins.values())
    ece = sum(abs(sc - 10000 * nc) for _, sc, nc in bins.values()) / n_total
    mce = max(round(abs(sc / n - 10000.0 * nc / n), 4) for n, sc, nc in bins.values())
    r = REGISTRY["eval_ece_mce"].spark(spark, SF).collect()[0]
    assert r.n_total == n_total and r.n_bins == len(bins)
    assert r.ece_bp == pytest.approx(ece, abs=1e-3)
    assert r.mce_bp == pytest.approx(mce, abs=1e-3)
    assert r.grossly_miscalibrated == (ece >= 500.0)


def test_brier_decomposition_matches_python(spark):
    p = _pred_stream()
    n = len(p)
    brier = sum((c / 10000 - y) ** 2 for c, y in p) / n
    acc = sum(y for _, y in p) / n
    bins = {}
    for conf, corr in p:
        b = conf // 1000
        cnt, sc, nc = bins.get(b, (0, 0, 0))
        bins[b] = (cnt + 1, sc + conf, nc + corr)
    rel = sum(cnt * ((sc / cnt - 10000 * nc / cnt) / 10000) ** 2 for cnt, sc, nc in bins.values()) / n
    res = sum(cnt * (nc / cnt - acc) ** 2 for cnt, _, nc in bins.values()) / n
    r = REGISTRY["eval_brier_decomposition"].spark(spark, SF).collect()[0]
    assert r.n_total == n
    assert r.brier == pytest.approx(brier, abs=2e-6)
    assert r.reliability == pytest.approx(rel, abs=2e-6)
    assert r.resolution == pytest.approx(res, abs=2e-6)
    assert r.uncertainty == pytest.approx(acc * (1 - acc), abs=2e-6)
    # Murphy identity: residual = brier - (rel - res + unc) exactly
    # (within-bin conf variance - 2*within-bin conf/outcome covariance)
    assert r.decomp_residual == pytest.approx(brier - (rel - res + r.uncertainty), abs=5e-6)


def test_lift_gains_matches_python(spark):
    p = _pred_stream()
    n_total = len(p)
    pos_total = sum(y for _, y in p)
    rows = {r.threshold_bp: r for r in REGISTRY["eval_lift_gains_curve"].spark(spark, SF).collect()}
    assert len(rows) == 10
    for b in range(10):
        thr = b * 1000
        cum_n = sum(1 for c, _ in p if c >= thr)
        cum_pos = sum(y for c, y in p if c >= thr)
        r = rows[thr]
        assert r.n_targeted == cum_n and r.n_captured == cum_pos
        assert r.coverage == pytest.approx(cum_n / n_total, abs=2e-6)
        assert r.capture_rate == pytest.approx(cum_pos / pos_total, abs=2e-6)
        assert r.lift == pytest.approx((cum_pos / cum_n) / (pos_total / n_total), abs=2e-4)
    # top-scored rows must over-capture: lift at the 9000bp cutoff > 1
    assert rows[9000].lift > 1.0
    # threshold 0 targets everyone -> lift exactly 1
    assert rows[0].lift == pytest.approx(1.0, abs=1e-9)


def test_jarque_bera_matches_numpy(spark):
    import duckdb
    import numpy as np

    data = duckdb.sql(
        f"""SELECT o_orderpriority, round(o_totalprice)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    groups = {}
    for grp, d in data:
        groups.setdefault(grp, []).append(int(d))
    rows = {r.grp: r for r in REGISTRY["stats_jarque_bera"].spark(spark, SF).collect()}
    assert set(rows) == set(groups)
    for grp, xs in groups.items():
        a = np.array(xs, dtype=np.float64)
        n = len(a)
        mu = a.mean()
        m2 = ((a - mu) ** 2).mean()
        m3 = ((a - mu) ** 3).mean()
        m4 = ((a - mu) ** 4).mean()
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
        r = rows[grp]
        assert r.n == n
        assert r.skewness == pytest.approx(skew, abs=1e-4)
        assert r.ex_kurtosis == pytest.approx(exk, abs=1e-4)
        assert r.jb_stat == pytest.approx(jb, rel=1e-3)
        assert r.normal_rejected == (jb >= 5.9915)


def _token_re_counts(texts_by_source):
    import re
    from collections import Counter

    counts = {}
    for src, texts in texts_by_source.items():
        c = Counter()
        for t in texts:
            c.update(x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
        counts[src] = c
    return counts


def _docs_by_source():
    import duckdb

    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    by = {}
    for src, t in rows:
        by.setdefault(src, []).append(t)
    return by


def test_yule_k_matches_python(spark):
    counts = _token_re_counts(_docs_by_source())
    got = {r.source: r for r in REGISTRY["text_yule_k"].spark(spark, SF).collect()}
    assert set(got) == set(counts)
    for src, c in counts.items():
        n = sum(c.values())
        s2 = sum(v * v for v in c.values())
        r = got[src]
        assert r.n_tokens == n and r.n_types == len(c)
        assert r.yule_k == pytest.approx(1e4 * (s2 - n) / (n * n), abs=1e-3)


def test_hapax_matches_python(spark):
    counts = _token_re_counts(_docs_by_source())
    got = {
        r.source: r for r in REGISTRY["text_hapax_legomena"].spark(spark, SF).collect()
    }
    for src, c in counts.items():
        v1 = sum(1 for v in c.values() if v == 1)
        v2 = sum(1 for v in c.values() if v == 2)
        r = got[src]
        assert (r.n_types, r.n_hapax, r.n_dis) == (len(c), v1, v2)
        assert r.hapax_ratio == pytest.approx(v1 / len(c), abs=2e-6)
        assert r.sichel_s == pytest.approx(v2 / len(c), abs=2e-6)


def test_bigram_cond_entropy_matches_python(spark):
    import re
    from collections import Counter

    by = _docs_by_source()
    got = {
        r.source: r
        for r in REGISTRY["lm_bigram_cond_entropy"].spark(spark, SF).collect()
    }
    for src, texts in by.items():
        cb, cf = Counter(), Counter()
        for t in texts:
            toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            for a, b in zip(toks, toks[1:]):
                cb[(a, b)] += 1
                cf[a] += 1
        n = sum(cb.values())
        h_joint = math.log2(n) - sum(c * math.log2(c) for c in cb.values()) / n
        h_first = math.log2(n) - sum(c * math.log2(c) for c in cf.values()) / n
        r = got[src]
        assert r.n_bigrams == n and r.n_distinct_bigrams == len(cb)
        assert r.h_joint_bits == pytest.approx(h_joint, abs=2e-5)
        assert r.h_cond_bits == pytest.approx(h_joint - h_first, abs=2e-5)
        assert r.branching_factor == pytest.approx(2 ** (h_joint - h_first), abs=2e-3)


def test_adamic_adar_consistent_with_common_neighbors(spark):
    """AA runs on the identical wedge set as the CN scorer: same "
    "(doc_a, doc_b, cn) triples, and each AA score is bounded by
    cn/ln(16) <= aa <= cn/ln(2) (pivot degrees live in [2, 16])."""
    cn_rows = {
        (r.doc_a, r.doc_b): r.cn
        for r in REGISTRY["graph_common_neighbor_scores"].spark(spark, SF).collect()
    }
    aa_rows = {
        (r.doc_a, r.doc_b): r
        for r in REGISTRY["graph_adamic_adar"].spark(spark, SF).collect()
    }
    assert set(cn_rows) == set(aa_rows)
    for pair, r in aa_rows.items():
        assert r.cn == cn_rows[pair]
        assert r.cn / math.log(16) - 1e-6 <= r.aa_score <= r.cn / math.log(2) + 1e-6


def test_group_holdout_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                     list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> ''))), ' '))
            FROM '{SF}/documents.parquet'
            WHERE text IS NOT NULL"""
    ).fetchall()

    def bucket(h):
        m = h % 100
        return "train" if m < 80 else ("val" if m < 90 else "test")

    groups = {}
    for doc_id, gk in rows:
        g_split = bucket(_md5_64(f"gsplit:{gk}"))
        n_split = bucket(_md5_64(f"nsplit:{doc_id}"))
        groups.setdefault(gk, (g_split, []))[1].append(n_split)
    leak_naive = 0
    per_split = {}
    for gk, (g_split, members) in groups.items():
        n = len(members)
        from collections import Counter

        k2 = sum(v * v for v in Counter(members).values())
        leak_naive += (n * n - k2) // 2
        s = per_split.setdefault(g_split, [0, 0, 0])
        s[0] += n
        s[1] += 1
        s[2] += n if n > 1 else 0
    got = {r.split: r for r in REGISTRY["split_group_holdout"].spark(spark, SF).collect()}
    assert set(got) == set(per_split)
    for split, (n_docs, n_clusters, n_dup) in per_split.items():
        r = got[split]
        assert (r.n_docs, r.n_clusters, r.n_dup_docs) == (n_docs, n_clusters, n_dup)
        assert r.leaky_pairs_grouped == 0  # the certification
        assert r.leaky_pairs_naive == leak_naive
    # the naive split must actually leak on this corpus (else the cert
    # is vacuous): sf0.001 documents contain exact duplicates
    assert leak_naive > 0


def test_hurst_rs_matches_numpy(spark):
    import duckdb
    import numpy as np

    xs = duckdb.sql(
        f"""SELECT sum(round(value * 100)::BIGINT)::BIGINT AS x
            FROM '{SF}/events.parquet'
            GROUP BY (floor(epoch(ts))::BIGINT // 86400)
            ORDER BY (floor(epoch(ts))::BIGINT // 86400)"""
    ).fetchnumpy()["x"].astype(np.float64)
    got = {r.window_days: r for r in REGISTRY["stats_hurst_rs"].spark(spark, SF).collect()}
    pts = []
    for w in (4, 8, 16):
        nb = len(xs) // w
        rs_vals = []
        for b in range(nb):
            blk = xs[b * w : (b + 1) * w]
            dev = np.cumsum(blk - blk.mean())
            r_ = dev.max() - dev.min()
            s_ = blk.std()  # population
            if s_ > 0:
                rs_vals.append(round(r_ / s_, 9))
        mean_rs = sum(rs_vals) / len(rs_vals)
        r = got[w]
        assert r.n_blocks == len(rs_vals)
        assert r.mean_rs == pytest.approx(mean_rs, abs=2e-6)
        pts.append((math.log(w), math.log(round(mean_rs, 6))))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    for r in got.values():
        assert r.hurst_exponent == pytest.approx(hurst, abs=2e-5)
        assert r.strong_persistence == (round(hurst, 6) > 0.65)


def test_ols_two_factor_matches_numpy(spark):
    import duckdb
    import numpy as np

    y, x1, x2 = duckdb.sql(
        f"""SELECT round(l_extendedprice * 100)::BIGINT,
                   round(l_quantity)::BIGINT,
                   round(l_discount * 100)::BIGINT
            FROM '{SF}/lineitem.parquet'"""
    ).fetchnumpy().values()
    y = y.astype(np.float64)
    X = np.column_stack([np.ones(len(y)), x1, x2]).astype(np.float64)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = ((y - pred) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    r2 = 1 - ss_res / ss_tot
    n = len(y)
    r = REGISTRY["stats_ols_two_factor"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert r.intercept_cents == pytest.approx(beta[0], rel=1e-5)
    assert r.beta_quantity == pytest.approx(beta[1], rel=1e-5)
    assert r.beta_discount == pytest.approx(beta[2], rel=1e-4)
    assert r.r_squared == pytest.approx(r2, abs=1e-5)
    assert r.f_stat == pytest.approx(r2 / (1 - r2) * (n - 3) / 2, rel=1e-3)


def _daily_two_series():
    import duckdb

    rows = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN round(value * 100)::BIGINT ELSE 0 END),
                   sum(CASE WHEN event_type <> 'purchase'
                            THEN round(value * 100)::BIGINT ELSE 0 END)
            FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
    ).fetchall()
    return [(int(y), int(x)) for _, y, x in rows]


def test_granger_lag1_matches_numpy(spark):
    import numpy as np

    series = _daily_two_series()
    y = np.array([v[0] for v in series[1:]], dtype=np.float64)
    yl = np.array([v[0] for v in series[:-1]], dtype=np.float64)
    xl = np.array([v[1] for v in series[:-1]], dtype=np.float64)
    n = len(y)
    Xu = np.column_stack([np.ones(n), yl, xl])
    Xr = np.column_stack([np.ones(n), yl])
    bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_u = ((y - Xu @ bu) ** 2).sum()
    rss_r = ((y - Xr @ br) ** 2).sum()
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    r = REGISTRY["stats_granger_lag1"].spark(spark, SF).collect()[0]
    assert r.n_days_used == n
    assert r.beta_ylag == pytest.approx(bu[1], abs=1e-4)
    assert r.beta_xlag == pytest.approx(bu[2], abs=1e-4)
    assert r.f_granger == pytest.approx(f, rel=1e-3)
    assert r.x_granger_causes_y == (round(f, 4) >= 4.20)


def test_cronbach_alpha_matches_numpy(spark):
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                   event_type, sum(round(value * 100)::BIGINT)::BIGINT
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    cells = {(d, t): 0 for d in days for t in types}
    for d, t, x in rows:
        cells[(d, t)] = int(x)
    M = np.array([[cells[(d, t)] for t in types] for d in days], dtype=np.float64)
    k = len(types)
    item_vars = M.var(axis=0)  # population
    total_var = M.sum(axis=1).var()
    alpha = k / (k - 1) * (1 - sum(round(v, 9) for v in item_vars) / total_var)
    r = REGISTRY["stats_cronbach_alpha"].spark(spark, SF).collect()[0]
    assert r.n_items == k and r.n_days == len(days)
    assert r.total_var == pytest.approx(total_var, rel=1e-6)
    assert r.cronbach_alpha == pytest.approx(alpha, abs=2e-5)


def test_ams_f2_matches_python(spark):
    import duckdb
    from collections import Counter

    uids = duckdb.sql(
        f"SELECT user_id FROM '{SF}/events.parquet'"
    ).fetchnumpy()["user_id"]
    zs = []
    for s in range(16):
        z = sum(
            1 if _md5_64(f"ams{s}:{u}") % 2 == 0 else -1 for u in uids
        )
        zs.append(z)
    est = sum(z * z for z in zs) / 16
    counts = Counter(int(u) for u in uids)
    f2 = sum(c * c for c in counts.values())
    r = REGISTRY["sketch_ams_f2_cert"].spark(spark, SF).collect()[0]
    assert r.n_events == len(uids) and r.n_users == len(counts)
    assert r.f2_exact == f2
    assert r.f2_estimate == pytest.approx(est, abs=0.01)
    assert r.est_ratio == pytest.approx(est / f2, abs=2e-6)
    assert r.within_2x == (0.5 <= round(est / f2, 6) <= 2.0)


def test_randomized_response_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT event_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    n = len(rows)
    n_true = sum(1 for _, et in rows if et == "purchase")
    n_rep = 0
    for eid, et in rows:
        t = 1 if et == "purchase" else 0
        honest = _md5_64(f"rr:{eid}") % 10000 < 7500
        n_rep += t if honest else 1 - t
    r = REGISTRY["privacy_randomized_response_cert"].spark(spark, SF).collect()[0]
    assert (r.n, r.n_true, r.n_reported) == (n, n_true, n_rep)
    debiased = (n_rep / n - 0.25) / 0.5
    assert r.debiased_frac == pytest.approx(debiased, abs=2e-6)
    assert r.abs_error == pytest.approx(abs(debiased - n_true / n), abs=2e-6)
    # the mechanism must actually flip some answers (else vacuous)
    assert n_rep != n_true
    assert r.epsilon == pytest.approx(math.log(3), abs=1e-6)


def test_peak_detection_matches_python(spark):
    import duckdb

    xs = [
        (int(d), int(x))
        for d, x in duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                       sum(round(value * 100)::BIGINT)::BIGINT
                FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
        ).fetchall()
    ]
    got = {r.day: r for r in REGISTRY["events_peak_detection"].spark(spark, SF).collect()}
    assert set(got) == {d for d, _ in xs[1:-1]}
    for i in range(1, len(xs) - 1):
        day, x = xs[i]
        lo, hi = max(0, i - 3), min(len(xs), i + 4)
        base = sum(v for _, v in xs[lo:hi]) / (hi - lo)
        rel = round(x / base, 6)
        r = got[day]
        assert r.revenue_cents == x
        assert r.rel_height == pytest.approx(rel, abs=2e-6)
        assert r.is_peak == (
            x > xs[i - 1][1] and x > xs[i + 1][1] and rel >= 1.15
        )


def _daily_cents():
    import duckdb

    return [
        (int(d), int(x))
        for d, x in duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                       sum(round(value * 100)::BIGINT)::BIGINT
                FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
        ).fetchall()
    ]


def test_pettitt_matches_python(spark):
    """U_t recomputed from the DEFINITION (pairwise sign sum), not the
    rank identity the implementation uses — a genuine cross-check."""
    xs = [x for _, x in _daily_cents()]
    days = [d for d, _ in _daily_cents()]
    T = len(xs)

    def sgn(v):
        return (v > 0) - (v < 0)

    best_k, best_day = -1, None
    for t in range(1, T):  # split after position t (1-indexed t days)
        u = sum(sgn(xs[j] - xs[i]) for i in range(t) for j in range(t, T))
        if abs(u) > best_k:
            best_k, best_day = abs(u), days[t - 1]
    p = 2 * math.exp(-6 * best_k**2 / (T**3 + T**2))
    r = REGISTRY["stats_pettitt_test"].spark(spark, SF).collect()[0]
    assert r.n_days == T
    assert r.k_stat == best_k
    assert r.changepoint_day == best_day
    assert r.p_approx == pytest.approx(p, abs=2e-6)
    assert r.shift_detected == (round(p, 6) < 0.05)


def test_variance_ratio_matches_numpy(spark):
    import numpy as np

    series = _daily_two_series()
    a = np.array([v[0] for v in series], dtype=np.float64)
    b = np.array([v[1] for v in series], dtype=np.float64)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    f = max(va, vb) / min(va, vb)
    r = REGISTRY["stats_variance_ratio_test"].spark(spark, SF).collect()[0]
    assert r.n_days == len(series)
    assert r.sd_purchase_cents == pytest.approx(math.sqrt(va), rel=1e-6)
    assert r.sd_other_cents == pytest.approx(math.sqrt(vb), rel=1e-6)
    assert r.f_ratio == pytest.approx(f, abs=2e-4)
    assert r.variances_differ == (round(f, 4) >= 1.90)


def test_weighted_kappa_matches_python(spark):
    import duckdb
    from collections import Counter

    ids = duckdb.sql(
        f"SELECT vec_id FROM '{SF}/embeddings.parquet'"
    ).fetchnumpy()["vec_id"]
    cells = Counter()
    for vid in ids:
        a = (_md5_64(f"conf:{vid}") % 10000) // 2000
        nz = _md5_64(f"wk:{vid}") % 10
        shift = 0 if nz < 6 else (1 if nz < 8 else -1)
        b = min(max(a + shift, 0), 4)
        cells[(a, b)] += 1
    n = sum(cells.values())
    wo = sum((a - b) ** 2 * c for (a, b), c in cells.items())
    ma = Counter()
    mb = Counter()
    for (a, b), c in cells.items():
        ma[a] += c
        mb[b] += c
    we = sum((a - b) ** 2 * ma[a] * mb[b] for a in ma for b in mb) / n
    kappa = 1 - wo / we
    r = REGISTRY["eval_weighted_kappa"].spark(spark, SF).collect()[0]
    assert r.n_items == n and r.disagreement_weighted == wo
    assert r.expected_weighted == pytest.approx(we, abs=1e-3)
    assert r.weighted_kappa == pytest.approx(kappa, abs=2e-6)
    # the perturbed rater must agree far better than chance
    assert r.weighted_kappa > 0.5


def test_soft_weights_matches_python(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT source,
                   md5(array_to_string(list_sort(list_distinct(
                     list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> ''))), ' '))
            FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"""
    ).fetchall()
    sizes = Counter(gk for _, gk in rows)
    per_src = {}
    for src, gk in rows:
        s = per_src.setdefault(src, [0, 0, 0.0])
        s[0] += 1
        s[1] += 1 if sizes[gk] > 1 else 0
        s[2] += round(1.0 / sizes[gk], 9)
    got = {r.source: r for r in REGISTRY["dedup_soft_weights"].spark(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, (n, nd, eff) in per_src.items():
        r = got[src]
        assert (r.n_docs, r.n_dup_docs) == (n, nd)
        assert r.effective_docs == pytest.approx(eff, abs=1e-3)
        assert r.duplication_inflation == pytest.approx(n / eff, abs=1e-3)
    # at least one source must contain duplicates (else vacuous)
    assert any(nd > 0 for _, nd, _ in per_src.values())


def test_entropy_trend_matches_python(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT, event_type
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    per_day = {}
    for d, et in rows:
        per_day.setdefault(int(d), Counter())[et] += 1
    hs = []
    for d in sorted(per_day):
        c = per_day[d]
        n = sum(c.values())
        h = round(
            math.log2(n) - sum(round(v * math.log2(v), 9) for v in c.values()) / n, 6
        )
        hs.append((d, n, h))
    m = len(hs)
    st = m * (m + 1) // 2
    stt = sum(t * t for t in range(1, m + 1))
    sh = sum(round(h, 6) for _, _, h in hs)
    sth = sum(round((i + 1) * h, 6) for i, (_, _, h) in enumerate(hs))
    slope = 1000.0 * (m * sth - st * sh) / (m * stt - st * st)
    got = {r.day: r for r in REGISTRY["events_entropy_trend"].spark(spark, SF).collect()}
    assert set(got) == {d for d, _, _ in hs}
    for d, n, h in hs:
        r = got[d]
        assert r.n_events == n
        assert r.h_bits == pytest.approx(h, abs=2e-6)
        assert r.trend_mbits_per_day == pytest.approx(slope, abs=2e-4)
        assert r.mix_concentrating == (round(slope, 6) < 0)


def test_streaming_ams_fold_equals_batch(spark):
    """Mergeability, run for real: the streaming fold must reproduce the
    batch sketch EXACTLY (same Z sums, same exact F2)."""
    batch = REGISTRY["sketch_ams_f2_cert"].spark(spark, SF).collect()[0]
    stream = REGISTRY["streaming_ams_f2"].spark(spark, SF).collect()[0]
    assert batch.asDict() == stream.asDict()


def test_holt_forecast_matches_python(spark):
    xs = [x for _, x in _daily_cents()]
    l, b = float(xs[0]), float(xs[1] - xs[0])
    for x in xs[1:]:
        l2 = round(0.3 * x + 0.7 * (l + b), 9)
        b = round(0.1 * (l2 - l) + 0.9 * b, 9)
        l = l2
    rows = {r.horizon_days: r for r in REGISTRY["timeseries_holt_forecast"].spark(spark, SF).collect()}
    assert set(rows) == set(range(1, 8))
    for h, r in rows.items():
        assert r.n_days == len(xs)
        assert r.level_cents == pytest.approx(l, abs=1e-3)
        assert r.trend_cents_per_day == pytest.approx(b, abs=1e-3)
        assert r.forecast_cents == pytest.approx(l + h * b, abs=1e-3)


def test_pacf_matches_numpy(spark):
    import numpy as np

    xs = np.array([x for _, x in _daily_cents()], dtype=np.float64)
    mu = xs.mean()
    dev = xs - mu
    c = [float((dev[: len(xs) - k] * dev[k:]).sum()) for k in range(4)]
    r1, r2, r3 = c[1] / c[0], c[2] / c[0], c[3] / c[0]
    # Durbin-Levinson by direct Yule-Walker solve
    p1 = r1
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    R = np.array([[1, r1, r2], [r1, 1, r1], [r2, r1, 1]])
    p3 = float(np.linalg.solve(R, np.array([r1, r2, r3]))[2])
    got = {r.lag: r for r in REGISTRY["timeseries_pacf"].spark(spark, SF).collect()}
    assert got[1].acf_rk == pytest.approx(r1, abs=1e-4)
    assert got[2].acf_rk == pytest.approx(r2, abs=1e-4)
    assert got[3].acf_rk == pytest.approx(r3, abs=1e-4)
    assert got[1].pacf == pytest.approx(p1, abs=1e-4)
    assert got[2].pacf == pytest.approx(p2, abs=1e-4)
    assert got[3].pacf == pytest.approx(p3, abs=1e-4)


def test_audio_clipping_matches_python_and_real_decode(spark):
    """Recompute from the synth arithmetic AND re-decode one real WAV
    payload with the stdlib wave module to pin the content path."""
    import io
    import struct
    import wave

    from annotations_ingester_spark.multimodal.media import synth_pcm_wav

    got = {r.media_id: r for r in REGISTRY["media_audio_clipping"].spark(spark, SF).collect()}
    import duckdb

    ids = duckdb.sql(f"SELECT doc_id FROM '{SF}/documents.parquet'").fetchnumpy()["doc_id"]
    assert set(got) == {int(i) for i in ids}
    for mid in list(got)[:50]:
        samples = [((mid * 31 + i * 17) % 4096) - 2048 for i in range(256)]
        n_clip = sum(1 for s in samples if abs(s) >= 2000)
        r = got[mid]
        assert r.n_samples == 256
        assert r.peak_amplitude == max(abs(s) for s in samples)
        assert r.n_clipped == n_clip
        assert r.clipped == (round(n_clip / 256, 6) >= 0.02)
    # real container round-trip for one id
    mid = int(ids[0])
    with wave.open(io.BytesIO(synth_pcm_wav(mid))) as wf:
        raw = wf.readframes(wf.getnframes())
    decoded = struct.unpack(f"<{len(raw) // 2}h", raw)
    assert list(decoded) == [((mid * 31 + i * 17) % 4096) - 2048 for i in range(256)]


def test_cross_source_overlap_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT DISTINCT source,
                   md5(array_to_string(list_sort(list_distinct(
                     list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> ''))), ' '))
            FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"""
    ).fetchall()
    by_key = {}
    sizes = {}
    for src, gk in rows:
        by_key.setdefault(gk, set()).add(src)
        sizes[src] = sizes.get(src, 0) + 1
    pairs = {}
    for gk, srcs in by_key.items():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] = pairs.get((ss[i], ss[j]), 0) + 1
    got = {
        (r.source_a, r.source_b): r
        for r in REGISTRY["corpus_cross_source_overlap"].spark(spark, SF).collect()
    }
    assert set(got) == set(pairs)
    for (a, b), n in pairs.items():
        r = got[(a, b)]
        assert r.n_shared == n
        assert (r.n_keys_a, r.n_keys_b) == (sizes[a], sizes[b])
        assert r.key_jaccard == pytest.approx(
            n / (sizes[a] + sizes[b] - n), abs=2e-6
        )
    assert pairs  # the corpus must actually have cross-source duplicates


def test_nprobe_sweep_monotone_and_consistent(spark):
    """Recall@3 must be non-decreasing in the probe count (candidate-set
    inclusion: any item displacing a truth member from a larger
    candidate top-3 would itself be in the exact top-3), and the
    9-probe arm must equal the certified full-multiprobe result."""
    rows = {r.n_probes: r for r in REGISTRY["ann_nprobe_sweep"].spark(spark, SF).collect()}
    assert set(rows) == {1, 5, 9}
    nq = {r.n_queries for r in rows.values()}
    assert len(nq) == 1 and nq.pop() > 0
    assert rows[1].n_hits <= rows[5].n_hits <= rows[9].n_hits
    for r in rows.values():
        assert 0.0 <= r.recall_at_3 <= 1.0
        assert r.recall_at_3 == pytest.approx(r.n_hits / (3 * r.n_queries), abs=2e-6)
    # cross-check the 9-probe arm against the independently certified
    # queries: multiprobe top-3 vs brute-force top-3 overlap
    truth = {
        (r.q_id, r.vec_id)
        for r in REGISTRY["embedding_cosine_topk"].spark(spark, SF).collect()
        if r.rank <= 3
    }
    pred = {
        (r.q_id, r.vec_id)
        for r in REGISTRY["ann_multiprobe_topk"].spark(spark, SF).collect()
    }
    assert rows[9].n_hits == len(truth & pred)


def test_cramer_von_mises_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END,
                   round(value * 100)::BIGINT
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('click', 'purchase')"""
    ).fetchall()
    xs = sorted(v for a, v in rows if a == 1)
    ys = sorted(v for a, v in rows if a == 0)
    n, m2 = len(xs), len(ys)
    import bisect

    num = 0
    for v in sorted(set(xs) | set(ys)):
        k1 = bisect.bisect_right(xs, v) - bisect.bisect_left(xs, v)
        k2 = bisect.bisect_right(ys, v) - bisect.bisect_left(ys, v)
        c1 = bisect.bisect_right(xs, v)
        c2 = bisect.bisect_right(ys, v)
        num += (k1 + k2) * (c1 * m2 - c2 * n) ** 2
    t = num / (n * m2 * (n + m2) ** 2)
    r = REGISTRY["stats_cramer_von_mises"].spark(spark, SF).collect()[0]
    assert (r.n1, r.n2) == (n, m2)
    assert r.t_stat == pytest.approx(t, abs=2e-6)
    assert r.distributions_differ == (round(t, 6) >= 0.461)


def test_sign_test_matches_python(spark):
    series = _daily_two_series()
    k = sum(1 for a, b in series if a > b)
    n = sum(1 for a, b in series if a != b)
    z = (2 * k - n) / math.sqrt(n)
    r = REGISTRY["stats_sign_test"].spark(spark, SF).collect()[0]
    assert r.n_days == len(series)
    assert (r.n_informative, r.n_purchase_higher) == (n, k)
    assert r.z_stat == pytest.approx(z, abs=2e-4)
    assert r.medians_differ == (abs(round(z, 4)) > 1.96)


def test_ngram_coverage_matches_python(spark):
    import duckdb
    import re

    rows = duckdb.sql(
        f"""SELECT doc_id, text FROM '{SF}/documents.parquet'
            WHERE text IS NOT NULL"""
    ).fetchall()
    grams = {1: ({}, {}), 2: ({}, {}), 3: ({}, {})}
    train_sets = {1: set(), 2: set(), 3: set()}
    test_sets = {1: set(), 2: set(), 3: set()}
    for doc_id, text in rows:
        is_train = _md5_64(f"split:{doc_id}") % 100 < 80
        toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
        for n in (1, 2, 3):
            tgt = train_sets[n] if is_train else test_sets[n]
            for i in range(len(toks) - n + 1):
                tgt.add(" ".join(toks[i : i + n]))
    got = {r.ngram_order: r for r in REGISTRY["lm_ngram_coverage_curve"].spark(spark, SF).collect()}
    for n in (1, 2, 3):
        covered = len(test_sets[n] & train_sets[n])
        r = got[n]
        assert r.n_test_grams == len(test_sets[n])
        assert r.n_covered == covered
        assert r.coverage == pytest.approx(covered / len(test_sets[n]), abs=2e-6)
    # the curve must fall with n (higher orders are harder to cover)
    assert got[1].coverage > got[2].coverage > got[3].coverage


def test_holt_winters_matches_python(spark):
    xs = [float(x) for _, x in _daily_cents()]
    m = 7
    a, g, c = 0.3, 0.1, 0.2
    avg1 = round(sum(xs[:m]) / m, 9)
    avg2 = sum(xs[m : 2 * m]) / m
    l = avg1
    b = round((avg2 - avg1) / m, 9)
    s = [round(x - avg1, 9) for x in xs[:m]]
    for t in range(m + 1, len(xs) + 1):
        x = xs[t - 1]
        slot = (t - 1) % m
        si = s[slot]
        l2 = round(a * (x - si) + (1 - a) * (l + b), 9)
        b = round(g * (l2 - l) + (1 - g) * b, 9)
        s[slot] = round(c * (x - l2) + (1 - c) * si, 9)
        l = l2
    rows = {r.horizon_days: r for r in REGISTRY["timeseries_holt_winters"].spark(spark, SF).collect()}
    assert set(rows) == set(range(1, 8))
    T = len(xs)
    for h, r in rows.items():
        assert r.n_days == T
        assert r.level_cents == pytest.approx(l, abs=1e-3)
        assert r.trend_cents_per_day == pytest.approx(b, abs=1e-3)
        slot = (T + h - 1) % m
        assert r.seasonal_cents == pytest.approx(s[slot], abs=1e-3)
        assert r.forecast_cents == pytest.approx(l + h * b + s[slot], abs=1e-3)


def test_esd_outliers_matches_python(spark):
    xs = dict(_daily_cents())
    remaining = dict(xs)
    rows = {r.round: r for r in REGISTRY["stats_esd_outliers"].spark(spark, SF).collect()}
    assert set(rows) == {1, 2, 3}
    lambdas = {1: 3.16, 2: 3.14, 3: 3.12}
    for rnd in (1, 2, 3):
        vals = list(remaining.values())
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
        best = max(
            remaining.items(), key=lambda kv: (abs(kv[1] - mu) / sd, -kv[0])
        )
        r_stat = abs(best[1] - mu) / sd
        r = rows[rnd]
        assert r.day == best[0]
        assert r.revenue_cents == best[1]
        assert r.r_stat == pytest.approx(r_stat, abs=2e-4)
        assert r.lambda_crit == pytest.approx(lambdas[rnd], abs=1e-9)
        assert r.is_outlier == (round(r_stat, 4) > lambdas[rnd])
        del remaining[best[0]]


def test_page_trend_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT, event_type,
                   sum(round(value * 100)::BIGINT)::BIGINT
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    cells = {(d, t): 0 for d in days for t in types}
    for d, t, x in rows:
        cells[(d, t)] = int(x)
    m, k = len(days), len(types)
    l2 = 0
    for d in days:
        vals = [(cells[(d, t)], j + 1) for j, t in enumerate(types)]
        for x, ord_j in vals:
            less = sum(1 for v, _ in vals if v < x)
            ties = sum(1 for v, _ in vals if v == x)
            r2 = 2 * (less + 1) + ties - 1  # doubled tie-averaged rank
            l2 += ord_j * r2
    z = (l2 / 2 - m * k * (k + 1) ** 2 / 4) / math.sqrt(
        m * k * k * (k + 1) ** 2 * (k - 1) / 144
    )
    r = REGISTRY["stats_page_trend_test"].spark(spark, SF).collect()[0]
    assert (r.n_days, r.n_types) == (m, k)
    assert r.page_l_doubled == l2
    assert r.z_stat == pytest.approx(z, abs=2e-4)
    assert r.ordered_trend == (abs(round(z, 4)) > 1.96)


def test_wilson_ci_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT event_type, count(*),
                   sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END)
            FROM '{SF}/events.parquet' GROUP BY 1"""
    ).fetchall()
    got = {r.event_type: r for r in REGISTRY["stats_wilson_ci"].spark(spark, SF).collect()}
    z = 1.96
    for et, n, k in rows:
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        r = got[et]
        assert (r.n, r.k) == (n, k)
        assert r.ci_lo == pytest.approx((center - half) / denom, abs=2e-6)
        assert r.ci_hi == pytest.approx((center + half) / denom, abs=2e-6)
        assert r.ci_lo <= r.p_hat <= r.ci_hi
        assert 0.0 <= r.ci_lo and r.ci_hi <= 1.0


def test_dau_wau_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id,
                   (floor(epoch(ts))::BIGINT // 86400)::BIGINT
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_day = {}
    for uid, d in rows:
        by_day.setdefault(int(d), set()).add(uid)
    lo, hi = min(by_day), max(by_day)
    got = {r.day: r for r in REGISTRY["events_dau_wau_stickiness"].spark(spark, SF).collect()}
    assert set(got) == set(range(lo, hi + 1)) & {
        d for d in got
    }  # every covered day in range
    for day, r in got.items():
        dau = len(by_day.get(day, set()))
        wau = len(set().union(*(by_day.get(d, set()) for d in range(day - 6, day + 1))))
        assert (r.dau, r.wau) == (dau, wau)
        assert r.stickiness == pytest.approx(dau / wau, abs=2e-6)
        assert r.dau <= r.wau


def test_poisson_rate_ratio_matches_python(spark):
    import duckdb

    n1, n2 = duckdb.sql(
        f"""SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            FROM '{SF}/events.parquet'"""
    ).fetchall()[0]
    z = (n1 - (n1 + n2) * 0.5) / math.sqrt((n1 + n2) * 0.25)
    r = REGISTRY["stats_poisson_rate_ratio"].spark(spark, SF).collect()[0]
    assert (r.n_purchase, r.n_click) == (n1, n2)
    assert r.rate_ratio == pytest.approx(n1 / n2, abs=2e-6)
    assert r.z_stat == pytest.approx(z, abs=2e-4)
    assert r.rates_differ == (abs(round(z, 4)) > 1.96)


def test_bot_score_matches_python(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT user_id, event_type, floor(epoch(ts))::BIGINT
            FROM '{SF}/events.parquet' ORDER BY user_id, 3"""
    ).fetchall()
    by_user = {}
    for uid, et, ts in rows:
        by_user.setdefault(uid, []).append((ts, et))
    n_total = len(rows)
    n_users = len(by_user)
    got = {r.user_id: r for r in REGISTRY["events_bot_score"].spark(spark, SF).collect()}
    for uid, evs in by_user.items():
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if len(gaps) < 2:
            assert uid not in got
            continue
        mean = sum(gaps) / len(gaps)
        var = sum(g * g for g in gaps) / len(gaps) - mean * mean
        cv = math.sqrt(max(var, 0.0)) / mean if sum(gaps) > 0 else 0.0
        c = Counter(et for _, et in evs)
        n = len(evs)
        h = round(
            math.log2(n) - sum(round(v * math.log2(v), 9) for v in c.values()) / n, 6
        )
        score = (
            500.0 * max(1.0 - cv, 0.0)
            + 300.0 * max(1.0 - h / 2.3219281, 0.0)
            + 200.0 * min(n * n_users / n_total / 5.0, 1.0)
        )
        r = got[uid]
        assert r.n_events == n and r.n_gaps == len(gaps)
        assert r.interarrival_cv == pytest.approx(cv, abs=2e-6)
        assert r.type_entropy_bits == pytest.approx(h, abs=2e-6)
        assert r.bot_score_milli == pytest.approx(score, abs=2e-3)
        assert r.flagged == (round(score, 4) >= 400.0)


def test_backlog_aging_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderstatus, o_orderdate,
                   round(o_totalprice * 100)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    asof = max(d for _, d, _ in rows)
    buckets = {}
    for st, d, cents in rows:
        if st == "F":
            continue
        age = (asof - d).days
        b = "00-30" if age <= 30 else ("31-90" if age <= 90 else ("91-365" if age <= 365 else "365+"))
        agg = buckets.setdefault((st, b), [0, 0])
        agg[0] += 1
        agg[1] += int(cents)
    got = {
        (r.status, r.age_bucket): r
        for r in REGISTRY["orders_backlog_aging"].spark(spark, SF).collect()
    }
    assert set(got) == set(buckets)
    for key, (n, cents) in buckets.items():
        r = got[key]
        assert (r.n_orders, r.backlog_cents) == (n, cents)
        assert r.avg_order_cents == pytest.approx(cents / n, abs=1e-3)


def test_ann_map_bounded_by_recall(spark):
    """AP@10 = sum(prec@hit)/10 <= hits/10 = recall@10 per query, so
    MAP@10 <= recall@10 from the independently certified curve; and the
    bucketed ANN must find SOMETHING (MAP > 0)."""
    r = REGISTRY["eval_ann_map"].spark(spark, SF).collect()[0]
    curve = {
        c.k: c for c in REGISTRY["eval_recall_at_k_curve"].spark(spark, SF).collect()
    }
    assert r.n_queries == curve[10].n_queries
    assert 0.0 < r.map_at_10 <= curve[10].recall_at_k + 1e-9
    assert r.map_at_10 <= 1.0


def test_js_divergence_matches_python(spark):
    from collections import Counter

    by = _docs_by_source()
    counts = _token_re_counts(by)
    totals = {s: sum(c.values()) for s, c in counts.items()}
    glob = Counter()
    for c in counts.values():
        glob.update(c)
    top = [t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:200]]
    dists = {}
    for s, c in counts.items():
        n = totals[s]
        p = {t: c.get(t, 0) / n for t in top}
        p["\x02OOV"] = (n - sum(c.get(t, 0) for t in top)) / n
        dists[s] = p
    got = {
        (r.source_a, r.source_b): r
        for r in REGISTRY["lm_js_divergence_sources"].spark(spark, SF).collect()
    }
    srcs = sorted(dists)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            js = 0.0
            for t in dists[a]:
                p, q = dists[a][t], dists[b][t]
                m = (p + q) / 2
                term = 0.0
                if p > 0:
                    term += 0.5 * p * math.log2(p / m)
                if q > 0:
                    term += 0.5 * q * math.log2(q / m)
                js += round(term, 9)
            r = got[(a, b)]
            assert r.js_bits == pytest.approx(js, abs=2e-6)
            assert 0.0 <= r.js_bits <= 1.0 + 1e-9  # JS in bits is bounded by 1
            assert r.js_distance == pytest.approx(math.sqrt(max(js, 0)), abs=2e-6)


def test_quade_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT, event_type,
                   sum(round(value * 100)::BIGINT)::BIGINT
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    cells = {(d, t): 0 for d in days for t in types}
    for d, t, x in rows:
        cells[(d, t)] = int(x)
    m, k = len(days), len(types)

    def ranks(vals):
        out = []
        for v in vals:
            less = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            out.append(less + (ties + 1) / 2)
        return out

    ranges = [max(cells[(d, t)] for t in types) - min(cells[(d, t)] for t in types) for d in days]
    q = ranks(ranges)
    s_ij = {}
    for i, d in enumerate(days):
        r = ranks([cells[(d, t)] for t in types])
        for j, t in enumerate(types):
            s_ij[(d, t)] = q[i] * (r[j] - (k + 1) / 2)
    a = sum(v * v for v in s_ij.values())
    sj = {t: sum(s_ij[(d, t)] for d in days) for t in types}
    b = sum(v * v for v in sj.values()) / m
    f = (m - 1) * b / (a - b)
    r = REGISTRY["stats_quade_test"].spark(spark, SF).collect()[0]
    assert (r.n_days, r.n_types) == (m, k)
    assert r.quade_f == pytest.approx(f, rel=1e-3)
    assert r.treatments_differ == (round(f, 4) >= 2.61)


def test_exponentiality_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, floor(epoch(ts))::BIGINT
            FROM '{SF}/events.parquet' ORDER BY user_id, 2"""
    ).fetchall()
    by_user = {}
    for uid, ts in rows:
        by_user.setdefault(uid, []).append(ts)
    gaps = []
    for evs in by_user.values():
        gaps.extend(b - a for a, b in zip(evs, evs[1:]) if b - a > 0)
    n = len(gaps)
    lam = n / sum(gaps)
    gaps.sort()
    import bisect

    d = 0.0
    for v in sorted(set(gaps)):
        emp = bisect.bisect_right(gaps, v) / n
        d = max(d, abs(emp - (1 - math.exp(-lam * v))))
    r = REGISTRY["stats_exponentiality_test"].spark(spark, SF).collect()[0]
    assert r.n_gaps == n
    assert r.mean_gap_s == pytest.approx(sum(gaps) / n, abs=1e-3)
    assert r.d_stat == pytest.approx(d, abs=2e-6)
    assert r.not_exponential == (round(d * math.sqrt(n), 4) > 1.08)


def test_image_entropy_matches_python_and_real_decode(spark):
    """bit_count of the planted pattern must equal the decoded bright
    count, and one payload is re-decoded here with the vendored decoder
    to pin the content path."""
    import hashlib as _h

    got = {r.media_id: r for r in REGISTRY["media_image_entropy"].spark(spark, SF).collect()}

    def pattern(doc_id):
        g, mm = doc_id // 4, doc_id % 4
        base = (int(_h.md5(f"phash:{g}".encode()).hexdigest()[:15], 16) | 1)
        p = base
        if mm in (1, 3):
            p ^= 1 << (g % 59 + 1)
        if mm in (2, 3):
            p ^= 1 << ((g * 7 + 3) % 59 + 1)
        return p & 0xFFFFFFFFFFFFFFFF

    for mid in list(got)[:40]:
        nb = bin(pattern(mid)).count("1")
        r = got[mid]
        assert r.n_pixels == 64 and r.n_bright == nb
        p = nb / 64
        ent = 0.0 if p in (0, 1) else -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
        assert r.entropy_bits == pytest.approx(ent, abs=2e-6)
        assert r.near_blank == (round(ent, 6) < 0.3)
    # real decode of one payload
    from annotations_ingester_spark.multimodal.media import gray8_png, png_decode_gray

    mid = sorted(got)[0]
    _w, _h2, _mode, rows_px = png_decode_gray(gray8_png(pattern(mid)))
    assert sum(1 for row in rows_px for px in row if px >= 128) == got[mid].n_bright


def test_token_rank_typicality_matches_python(spark):
    import duckdb
    import re
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT doc_id, text FROM '{SF}/documents.parquet'
            WHERE text IS NOT NULL"""
    ).fetchall()
    corpus = Counter()
    doc_toks = {}
    for doc_id, text in rows:
        toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
        doc_toks[doc_id] = toks
        corpus.update(toks)
    rank = {
        t: i + 1
        for i, (t, _) in enumerate(sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0])))
    }
    got = {r.doc_id: r for r in REGISTRY["lm_token_rank_typicality"].spark(spark, SF).collect()}
    for doc_id, toks in doc_toks.items():
        if not toks:
            assert doc_id not in got
            continue
        mean = sum(round(math.log2(rank[t]), 9) for t in toks) / len(toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.mean_log2_rank == pytest.approx(mean, abs=2e-6)
        assert r.atypical == (round(mean, 6) > 9.0)
