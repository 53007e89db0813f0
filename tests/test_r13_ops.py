"""Round-12 session (r13-tier) independent recomputes (the r9 lesson:
parity alone cannot catch a shared-formula bug — every operator gets a
from-scratch Python recompute against the raw parquet)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _md5_64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _bpe_tokens(text: str) -> list[str]:
    """Pure-Python twin of functions/bpe.py bpe_tokens: normalize to
    [a-z ], wrap each char in the \\x1f sentinel, apply the pinned merge
    table as sequential string replaces, split and drop spaces."""
    from annotations_ingester_spark.functions.bpe import BPE_MERGES

    sep = "\x1f"
    norm = re.sub(r"[^a-z ]", "", text.lower())
    enc = "".join(f"{sep}{c}{sep}" for c in norm)
    for a, b in BPE_MERGES:
        enc = enc.replace(f"{sep}{a}{sep}{sep}{b}{sep}", f"{sep}{a}{b}{sep}")
    stripped = enc[1:-1] if len(enc) >= 2 else ""
    return [t for t in stripped.split(sep + sep) if t not in ("", " ")]


def _docs():
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchall()


def _substring_removal_positions(tok_streams, anchor_n, min_len):
    """Shared reference: duplicated anchor_n-gram positions -> islands ->
    removal position sets per doc (the Lee-et-al multiset relaxation)."""
    from collections import Counter

    gram_count = Counter()
    doc_grams = {}
    for did, toks in tok_streams.items():
        grams = [
            " ".join(toks[i : i + anchor_n])
            for i in range(len(toks) - anchor_n + 1)
        ]
        doc_grams[did] = grams
        gram_count.update(grams)
    removed = {}
    for did, grams in doc_grams.items():
        hits = [i for i, g in enumerate(grams) if gram_count[g] >= 2]
        out = set()
        islands = []
        for pos in hits:
            if islands and pos <= islands[-1][-1] + anchor_n:
                islands[-1].append(pos)
            else:
                islands.append([pos])
        for isl in islands:
            span = isl[-1] + anchor_n - 1 - isl[0] + 1
            if span >= min_len:
                out.update(range(isl[0], isl[-1] + anchor_n))
        removed[did] = out
    return removed


def test_bpe_survivors_matches_python(spark):
    """Full from-scratch recompute of dedup_substring_bpe_survivors:
    Python BPE tokenizer -> corpus 5-gram counts -> islands >= 50 BPE
    tokens -> cut -> per-doc counts + md5 of the surviving stream."""
    toks = {did: _bpe_tokens(t) for did, t in _docs()}
    removed = _substring_removal_positions(toks, anchor_n=5, min_len=50)
    rows = REGISTRY["dedup_substring_bpe_survivors"].spark(spark, SF).collect()
    assert len(rows) == len(toks)
    for r in rows:
        tk = toks[r.doc_id]
        rem = removed[r.doc_id]
        surv = [w for i, w in enumerate(tk) if i not in rem]
        assert r.total_tokens == len(tk)
        assert r.removed_tokens == len(rem)
        assert r.surviving_tokens == len(surv)
        assert r.surviving_hash == hashlib.md5(" ".join(surv).encode()).hexdigest()


def test_bpe_survivors_consistent_with_intervals(spark):
    """Cross-operator invariant: removed_tokens equals the summed span
    lengths of dedup_substring_bpe_k50's (disjoint, maximal) intervals."""
    spans = REGISTRY["dedup_substring_bpe_k50"].spark(spark, SF).collect()
    by_doc = {}
    for s in spans:
        by_doc[s.doc_id] = by_doc.get(s.doc_id, 0) + s.span_len
    surv = REGISTRY["dedup_substring_bpe_survivors"].spark(spark, SF).collect()
    for r in surv:
        assert r.removed_tokens == by_doc.get(r.doc_id, 0)
        assert r.total_tokens == r.removed_tokens + r.surviving_tokens


def test_minhash_containment_matches_python(spark):
    """Recompute the LSH banding AND the exact containment/Jaccard from
    raw text: 3-shingle md5-60bit sets, 8 xor-mixed minhashes, 2-row
    bands, then |A∩B|/|A| over the distinct shingle sets."""
    from annotations_ingester_spark.operators.dedup import seed_constant

    docs = _docs()
    sets = {}
    sigs = {}
    for did, text in docs:
        tk = _tokens(text)
        sh = {
            _md5_64(" ".join(tk[i : i + 3])) for i in range(len(tk) - 2)
        }
        if not sh:
            continue
        sets[did] = sh
        sigs[did] = [
            min(h ^ seed_constant(s) for h in sh) for s in range(8)
        ]
    buckets = {}
    for did, sig in sigs.items():
        for band in range(4):
            key = (
                band,
                hashlib.md5(
                    ",".join(str(m) for m in sig[2 * band : 2 * band + 2]).encode()
                ).hexdigest(),
            )
            buckets.setdefault(key, []).append(did)
    pairs = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    pairs.add((a, b))
    expected = {}
    for a, b in pairs:
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        expected[(a, b)] = (
            inter,
            len(sets[a]),
            len(sets[b]),
            round(inter / len(sets[a]), 6),
            round(inter / len(sets[b]), 6),
            round(inter / (len(sets[a]) + len(sets[b]) - inter), 6),
        )
    rows = REGISTRY["dedup_minhash_containment"].spark(spark, SF).collect()
    got = {
        (r.doc_a, r.doc_b): (
            r.n_inter, r.size_a, r.size_b,
            r.containment_a, r.containment_b, r.jaccard,
        )
        for r in rows
    }
    assert got == expected
    assert expected, "no candidate pairs at sf0.001 — test has no teeth"


def test_cluster_size_histogram_matches_python(spark):
    import duckdb
    from collections import Counter

    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    clusters = Counter()
    for (t,) in texts:
        clusters[hashlib.md5(t.encode()).hexdigest() if t is not None else None] += 1
    hist = Counter(clusters.values())
    rows = REGISTRY["dedup_cluster_size_histogram"].spark(spark, SF).collect()
    got = {r.cluster_size: (r.n_clusters, r.n_docs, r.dup_overhead_docs) for r in rows}
    assert got == {
        size: (n, size * n, (size - 1) * n) for size, n in hist.items()
    }


def test_weighted_reservoir_matches_python(spark):
    import duckdb

    MOD = 2147483647
    orders = duckdb.sql(
        f"SELECT o_orderkey, round(o_totalprice * 100)::BIGINT "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    keyed = []
    for k, w in orders:
        u = (_md5_64(f"wrs:{k}") % MOD + 1) / (MOD + 1)
        keyed.append((math.log(u) / w, -k, k, w))
    keyed.sort(reverse=True)
    top = keyed[:100]
    rows = REGISTRY["sample_weighted_reservoir"].spark(spark, SF).collect()
    assert len(rows) == 100
    got = {r.o_orderkey: (r.weight_cents, r.wrs_key) for r in rows}
    assert set(got) == {k for _, _, k, _ in top}
    for key, _, k, w in top:
        assert got[k][0] == w
        assert got[k][1] == pytest.approx(round(key, 12), abs=1e-12)
    # sampling is weighted: the sampled mean weight must exceed the
    # population mean (totalprice-weighted draw favors big orders)
    pop_mean = sum(w for _, w in orders) / len(orders)
    samp_mean = sum(w for _, _, _, w in top) / len(top)
    assert samp_mean > pop_mean


def test_chunk_sentence_packed_matches_python(spark):
    BUDGET = 48
    expected = {}
    for did, text in _docs():
        sl = [
            len(_tokens(s))
            for s in re.split(r"[.!?]+", text)
            if s.strip()
        ]
        if not sl:
            continue
        cum = 0
        for sidx, st in enumerate(sl):
            bin_ = cum // BUDGET
            key = (did, bin_)
            n, first, last, tok = expected.get(key, (0, sidx, sidx, 0))
            expected[key] = (n + 1, min(first, sidx), max(last, sidx), tok + st)
            cum += st
    rows = REGISTRY["chunk_sentence_packed"].spark(spark, SF).collect()
    got = {
        (r.doc_id, r.chunk_id): (
            r.n_sentences, r.first_sentence, r.last_sentence, r.chunk_tokens
        )
        for r in rows
    }
    assert got == expected
    # no sentence is ever split: chunk token sums add back to doc totals
    by_doc = {}
    for (did, _), (_, _, _, tok) in got.items():
        by_doc[did] = by_doc.get(did, 0) + tok
    for did, text in _docs():
        sl = sum(
            len(_tokens(s)) for s in re.split(r"[.!?]+", text) if s.strip()
        )
        if sl:
            assert by_doc[did] == sl


# --- Batch B: classical stats ----------------------------------------------


def _events(cols="event_type, round(value * 100)::BIGINT AS cents"):
    import duckdb

    return duckdb.sql(
        f"SELECT {cols} FROM '{SF}/events.parquet'"
    ).fetchall()


def test_fisher_exact_matches_lgamma(spark):
    """Independent p-value recompute via math.lgamma (a different
    log-factorial method than the engine's Stirling ladder)."""
    r = REGISTRY["stats_fisher_exact"].spark(spark, SF).collect()[0]
    a, b, c, d = r.a, r.b, r.c, r.d
    assert a + b + c + d == 500  # documents table
    n, r1, c1 = a + b + c + d, a + b, a + c
    r2, c2 = n - r1, n - c1
    lg = math.lgamma

    def lpmf(k):
        return (
            lg(r1 + 1) + lg(r2 + 1) + lg(c1 + 1) + lg(c2 + 1) - lg(n + 1)
            - lg(k + 1) - lg(r1 - k + 1) - lg(c1 - k + 1)
            - lg(n - r1 - c1 + k + 1)
        )

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    base = lpmf(a)
    p = sum(
        math.exp(lpmf(k)) for k in range(lo, hi + 1) if lpmf(k) <= base + 1e-7
    )
    assert r.p_two_sided == pytest.approx(p, abs=1e-5)
    assert r.significant == (round(p, 6) < 0.05)
    odds = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    assert r.odds_ratio == pytest.approx(odds, abs=1e-5)


def test_tost_equivalence_matches_python(spark):
    rows = [
        (1 if et == "click" else 0, v)
        for et, v in _events()
        if et in ("click", "view")
    ]
    xa = [v for f, v in rows if f == 1]
    xb = [v for f, v in rows if f == 0]
    ma, mb = sum(xa) / len(xa), sum(xb) / len(xb)
    va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
    vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
    se = math.sqrt(va / len(xa) + vb / len(xb))
    diff = ma - mb
    r = REGISTRY["stats_tost_equivalence"].spark(spark, SF).collect()[0]
    assert (r.n1, r.n2) == (len(xa), len(xb))
    assert r.mean_diff_cents == pytest.approx(diff, abs=1e-3)
    assert r.t_lower == pytest.approx((diff + 500) / se, abs=1e-3)
    assert r.t_upper == pytest.approx((500 - diff) / se, abs=1e-3)
    assert r.equivalent == (
        min(r.t_lower, r.t_upper) >= 1.6448536269514722
    )


def test_partial_correlation_matches_python(spark):
    import duckdb

    days = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400) AS day,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
                   sum(CASE WHEN event_type = 'purchase'
                       THEN round(value * 100)::BIGINT ELSE 0 END),
                   count(*)
            FROM '{SF}/events.parquet' GROUP BY day"""
    ).fetchall()
    xs = [float(x) for _, x, _, _ in days]
    ys = [float(y) for _, _, y, _ in days]
    zs = [float(z) for _, _, _, z in days]

    def corr(p, q):
        n = len(p)
        mp, mq = sum(p) / n, sum(q) / n
        num = sum((a - mp) * (b - mq) for a, b in zip(p, q))
        return num / math.sqrt(
            sum((a - mp) ** 2 for a in p) * sum((b - mq) ** 2 for b in q)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    r = REGISTRY["stats_partial_correlation"].spark(spark, SF).collect()[0]
    assert r.n_days == len(days)
    assert r.r_xy == pytest.approx(rxy, abs=1e-5)
    assert r.partial_r_xy_given_z == pytest.approx(part, abs=1e-5)


def _daily_fit():
    import duckdb

    days = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400) AS day,
                   sum(round(value * 100)::BIGINT) AS x
            FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
    ).fetchall()
    xs = [float(d) for d, _ in days]
    ys = [float(v) for _, v in days]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    alpha = my - beta * mx
    es = [y - (alpha + beta * x) for x, y in zip(xs, ys)]
    return days, xs, ys, es, sxx, mx, n


def test_breusch_pagan_matches_python(spark):
    _, xs, _, es, _, _, n = _daily_fit()
    gs = [e * e for e in es]
    mg, mx = sum(gs) / n, sum(xs) / n
    r_aux = sum((x - mx) * (g - mg) for x, g in zip(xs, gs)) / math.sqrt(
        sum((x - mx) ** 2 for x in xs) * sum((g - mg) ** 2 for g in gs)
    )
    lm = n * r_aux**2
    r = REGISTRY["stats_breusch_pagan"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.lm_stat == pytest.approx(lm, abs=1e-3)
    assert r.heteroscedastic == (round(lm, 4) >= 3.8415)


def test_cooks_distance_matches_python(spark):
    days, xs, _, es, sxx, mx, n = _daily_fit()
    sse = sum(e * e for e in es)
    s2 = sse / (n - 2)
    expected = {}
    for (day, _), x, e in zip(days, xs, es):
        h = 1 / n + (x - mx) ** 2 / sxx
        expected[day] = (e, h, e * e / (2 * s2) * h / (1 - h) ** 2)
    rows = REGISTRY["stats_cooks_distance"].spark(spark, SF).collect()
    assert len(rows) == n
    flagged = 0
    for r in rows:
        e, h, d = expected[r.day]
        assert r.residual_cents == pytest.approx(e, abs=1e-2)
        assert r.leverage == pytest.approx(h, abs=1e-5)
        assert r.cooks_d == pytest.approx(d, abs=1e-4)
        assert r.influential == (r.cooks_d > 4.0 / n)
        flagged += int(r.influential)
    assert 0 < flagged < n  # the diagnostic separates, it isn't constant


def test_anderson_darling_matches_python(spark):
    """Exact-formula recompute (same A-S tail polynomial) plus an
    erf-based sanity band (the approximation must sit within 5e-3 of the
    exact-Phi statistic for this data's z range)."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(int(v))

    def q_as(x):  # A-S 26.2.17, same arithmetic as the engine
        t = 1.0 / (1.0 + 0.2316419 * x)
        poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
                    + t * (-1.821255978 + t * 1.330274429))))
        return 0.3989422804014327 * math.exp(-x * x / 2.0) * poly

    def phi_as(z):
        return 1.0 - q_as(z) if z >= 0 else q_as(-z)

    def phi_erf(z):
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    got = {
        r.grp: r
        for r in REGISTRY["stats_anderson_darling"].spark(spark, SF).collect()
    }
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        mu = sum(vs) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / (n - 1))
        for phi, tol in ((phi_as, 1e-3), (phi_erf, 5e-3)):
            s = sum(
                (2 * i + 1) * (math.log(phi((vs[i] - mu) / sd))
                               + math.log(1.0 - phi((vs[n - 1 - i] - mu) / sd)))
                for i in range(n)
            )
            a2 = -n - s / n
            assert got[g].a2_stat == pytest.approx(a2, abs=tol)
        assert got[g].n == n
        assert got[g].normal_rejected == (got[g].a2_star >= 0.752)


def test_dunn_posthoc_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    pooled = sorted((int(v), g) for g, v in rows)
    n_total = len(pooled)
    # midranks with ties
    ranks: dict[int, float] = {}
    ties = 0
    i = 0
    while i < n_total:
        j = i
        while j < n_total and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        ranks[pooled[i][0]] = (i + 1 + j) / 2
        ties += t**3 - t
        i = j
    rank_sum: dict[str, float] = {}
    n_g: dict[str, int] = {}
    for v, g in pooled:
        rank_sum[g] = rank_sum.get(g, 0.0) + ranks[v]
        n_g[g] = n_g.get(g, 0) + 1
    var_term = n_total * (n_total + 1) / 12 - ties / (12 * (n_total - 1))
    got = {
        (r.group_a, r.group_b): r
        for r in REGISTRY["stats_dunn_posthoc"].spark(spark, SF).collect()
    }
    assert len(got) == 10
    for (ga, gb), r in got.items():
        mra = rank_sum[ga] / n_g[ga]
        mrb = rank_sum[gb] / n_g[gb]
        z = abs(mra - mrb) / math.sqrt(var_term * (1 / n_g[ga] + 1 / n_g[gb]))
        assert r.mean_rank_a == pytest.approx(mra, abs=1e-3)
        assert r.mean_rank_b == pytest.approx(mrb, abs=1e-3)
        assert r.z_stat == pytest.approx(z, abs=1e-3)
        assert r.significant == (r.z_stat >= 2.807)


def test_ansari_bradley_matches_python(spark):
    rows = [
        (1 if et == "click" else 0, v)
        for et, v in _events()
        if et in ("click", "purchase")
    ]
    pooled = sorted(rows, key=lambda r: r[1])
    n_total = len(pooled)
    # AB scores with midrank convention over tie blocks
    scores = [min(j + 1, n_total - j) for j in range(n_total)]
    i = 0
    t1 = 0.0
    s_all: list[float] = []
    while i < n_total:
        j = i
        while j < n_total and pooled[j][1] == pooled[i][1]:
            j += 1
        avg = sum(scores[i:j]) / (j - i)
        for k in range(i, j):
            s_all.append(avg)
            if pooled[k][0] == 1:
                t1 += avg
        i = j
    n1 = sum(f for f, _ in rows)
    n2 = n_total - n1
    s_sum = sum(s_all)
    s_sq = sum(s * s for s in s_all)
    e_t1 = n1 * s_sum / n_total
    var = n1 * n2 * (n_total * s_sq - s_sum**2) / (
        n_total**2 * (n_total - 1)
    )
    z = (t1 - e_t1) / math.sqrt(var)
    r = REGISTRY["stats_ansari_bradley"].spark(spark, SF).collect()[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert r.ab_statistic == pytest.approx(t1, abs=1e-2)
    assert r.z_stat == pytest.approx(z, abs=1e-3)
    assert r.scale_differs == (abs(r.z_stat) >= 1.96)


# --- Batch C: eval family ----------------------------------------------------


def _pred_stream():
    import duckdb

    ids = [
        int(v)
        for (v,) in duckdb.sql(
            f"SELECT vec_id FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    ]
    out = []
    for vid in ids:
        conf = _md5_64(f"conf:{vid}") % 10000
        outc = 1 if (_md5_64(f"outcome:{vid}") % 10000) < (conf * 9) // 10 + 500 else 0
        out.append((conf, outc))
    return out


def test_reliability_regression_matches_python(spark):
    pred = _pred_stream()
    xs = [c / 10000 for c, _ in pred]
    ys = [y for _, y in pred]
    n = len(pred)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    intercept = my - slope * mx
    r = REGISTRY["eval_reliability_regression"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert r.calibration_slope == pytest.approx(slope, abs=1e-5)
    assert r.calibration_intercept == pytest.approx(intercept, abs=1e-5)
    # the pinned stream is acc = 0.9 conf + 0.05: slope must sit near 0.9
    assert 0.75 < r.calibration_slope < 1.0
    assert not r.well_calibrated


def test_spiegelhalter_z_matches_python(spark):
    pred = _pred_stream()
    num = sum((y - c / 10000) * (1 - 2 * c / 10000) for c, y in pred)
    den = sum(
        (1 - 2 * c / 10000) ** 2 * (c / 10000) * (1 - c / 10000)
        for c, _ in pred
    )
    z = num / math.sqrt(den)
    r = REGISTRY["eval_spiegelhalter_z"].spark(spark, SF).collect()[0]
    assert r.n == len(pred)
    assert r.z_stat == pytest.approx(z, abs=1e-3)
    assert r.miscalibrated == (abs(r.z_stat) >= 1.96)


def test_krippendorff_alpha_matches_python(spark):
    """Independent recompute straight from the DEFINITION: per-item
    ordered disagreeing pairs weighted 1/(m-1), expected disagreement
    from the coincidence category totals."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    grid = {}
    for vid, label in rows:
        cats = []
        for r_ in range(3):
            true_c = label % 4
            if _md5_64(f"kripp{r_}:{vid}") % 100 < 80:
                cats.append(true_c)
            else:
                cats.append((true_c + 1 + _md5_64(f"krippalt{r_}:{vid}") % 3) % 4)
        grid[vid] = cats
    m = 3
    d_o = 0.0  # sum over items of disagreeing ordered pairs / (m-1)
    n_c: dict[int, int] = {}
    for cats in grid.values():
        for i in range(m):
            n_c[cats[i]] = n_c.get(cats[i], 0) + 1
            for j in range(m):
                if i != j and cats[i] != cats[j]:
                    d_o += 1 / (m - 1)
    n = m * len(grid)
    d_e = (n * n - sum(v * v for v in n_c.values())) / (n - 1)
    alpha = 1 - d_o / d_e
    r = REGISTRY["eval_krippendorff_alpha"].spark(spark, SF).collect()[0]
    assert r.n_items == len(grid)
    assert r.n_ratings == n
    assert r.alpha == pytest.approx(alpha, abs=1e-5)
    # 80% rater accuracy over 4 categories lands well above chance but
    # below perfect: alpha must be in the open interval (0.3, 0.9)
    assert 0.3 < r.alpha < 0.9
    assert r.reliable == (r.alpha >= 0.667)


def test_theil_u_matches_python(spark):
    import duckdb

    days = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400) AS day,
                   sum(round(value * 100)::BIGINT) AS x
            FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
    ).fetchall()
    xs = [int(v) for _, v in days]
    cut = len(xs) - 7
    ssm = sum((xs[i] - xs[i - 7]) ** 2 for i in range(cut, len(xs)))
    ssn = sum((xs[i] - xs[i - 1]) ** 2 for i in range(cut, len(xs)))
    r = REGISTRY["eval_forecast_theil_u"].spark(spark, SF).collect()[0]
    assert r.n_test == 7
    assert r.theil_u2 == pytest.approx(math.sqrt(ssm / ssn), abs=1e-5)
    assert r.rmse_model == pytest.approx(math.sqrt(ssm / 7), abs=1e-2)
    assert r.beats_naive1 == (r.theil_u2 < 1.0)


def test_label_noise_pairs_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()

    def bucket(v):
        out = 0
        for i in range(8):
            out = out * 2 + (1 if v[i] >= 0 else 0)
        return out

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na * nb > 0 else 0.0

    vecs = [(vid, lab, [float(x) for x in v], bucket(v)) for vid, lab, v in rows]
    expected = {}
    for i, (ia, la, va, ba) in enumerate(vecs):
        for ib, lb_, vb, bb in vecs[i + 1 :]:
            if ba != bb or la == lb_:
                continue
            a_, b_ = (ia, ib) if ia < ib else (ib, ia)
            c = round(cos(va, vb), 6)
            if c >= 0.3:
                expected[(a_, b_)] = (
                    (la, lb_) if ia < ib else (lb_, la),
                    c,
                )
    got = {
        (r.id_a, r.id_b): ((r.label_a, r.label_b), r.cos)
        for r in REGISTRY["eval_label_noise_pairs"].spark(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k][0] == expected[k][0]
        assert got[k][1] == pytest.approx(expected[k][1], abs=2e-6)
    assert got, "no conflicting near-dup pairs at sf0.001 — no teeth"


# --- Batch D: analytics family -------------------------------------------------


def test_spectral_peak_matches_python(spark):
    import duckdb

    days = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400) AS day,
                   sum(round(value * 100)::BIGINT) AS x
            FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
    ).fetchall()
    d0 = min(d for d, _ in days)
    n = len(days)
    mean = sum(x for _, x in days) / n
    sst = sum((x - mean) ** 2 for _, x in days)
    expected = {}
    for p in range(2, 15):
        csum = sum(
            (x - mean) * math.cos(2 * math.pi * (d - d0) / p) for d, x in days
        )
        ssum = sum(
            (x - mean) * math.sin(2 * math.pi * (d - d0) / p) for d, x in days
        )
        expected[p] = (csum**2 + ssum**2) / (n * sst)
    rows = REGISTRY["timeseries_spectral_peak"].spark(spark, SF).collect()
    got = {r.period: r for r in rows}
    assert set(got) == set(expected)
    top = max(expected, key=lambda p: round(expected[p], 6))
    for p, r in got.items():
        assert r.power_frac == pytest.approx(expected[p], abs=1e-5)
        assert r.is_peak == (
            round(expected[p], 6) == round(expected[top], 6)
        )
    assert got[top].is_peak
    assert sum(1 for r in got.values() if r.is_peak) >= 1


def test_drawdown_matches_python(spark):
    import duckdb

    days = duckdb.sql(
        f"""SELECT (floor(epoch(ts))::BIGINT // 86400) AS day,
                   sum(round(value * 100)::BIGINT) AS x
            FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
    ).fetchall()
    peak = -1
    max_dd, max_day = -1.0, None
    runs, cur = [], 0
    for d, x in days:
        peak = max(peak, x)
        dd = round((peak - x) / peak, 6)
        if dd > max_dd:
            max_dd, max_day = dd, d
        if x < peak:
            cur += 1
        else:
            if cur:
                runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    r = REGISTRY["timeseries_drawdown_stats"].spark(spark, SF).collect()[0]
    assert r.n_days == len(days)
    assert r.max_drawdown_frac == pytest.approx(max_dd, abs=1e-9)
    assert r.max_drawdown_day == max_day
    assert r.longest_underwater_days == (max(runs) if runs else 0)


def test_path_trigrams_matches_python(spark):
    import duckdb
    from collections import Counter

    evs = duckdb.sql(
        f"""SELECT user_id, event_type, floor(epoch(ts))::BIGINT, event_id
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_user = {}
    for uid, et, ts, eid in evs:
        by_user.setdefault(uid, []).append((ts, eid, et))
    occ = Counter()
    users = {}
    for uid, rows in by_user.items():
        rows.sort()
        seq = [et for _, _, et in rows]
        for i in range(len(seq) - 2):
            tri = (seq[i], seq[i + 1], seq[i + 2])
            occ[tri] += 1
            users.setdefault(tri, set()).add(uid)
    rows = REGISTRY["events_path_trigrams"].spark(spark, SF).collect()
    got = {(r.t1, r.t2, r.t3): (r.n_occurrences, r.n_users) for r in rows}
    assert got == {t: (c, len(users[t])) for t, c in occ.items()}


def test_burstiness_memory_matches_python(spark):
    import duckdb

    evs = duckdb.sql(
        f"""SELECT event_type, floor(epoch(ts))::BIGINT, event_id
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_type = {}
    for et, ts, eid in evs:
        by_type.setdefault(et, []).append((ts, eid))
    got = {
        r.event_type: r
        for r in REGISTRY["events_burstiness_memory"].spark(spark, SF).collect()
    }
    for et, rows in by_type.items():
        rows.sort()
        taus = [rows[i][0] - rows[i - 1][0] for i in range(1, len(rows))]
        n = len(taus)
        mu = sum(taus) / n
        sd = math.sqrt(sum((t - mu) ** 2 for t in taus) / n)
        b = (sd - mu) / (sd + mu)
        pa, pb = taus[:-1], taus[1:]
        ma, mb = sum(pa) / len(pa), sum(pb) / len(pb)
        mem = sum((x - ma) * (y - mb) for x, y in zip(pa, pb)) / math.sqrt(
            sum((x - ma) ** 2 for x in pa) * sum((y - mb) ** 2 for y in pb)
        )
        r = got[et]
        assert r.n_gaps == n
        assert r.burstiness == pytest.approx(b, abs=1e-5)
        assert r.memory_coef == pytest.approx(mem, abs=1e-5)


# --- Batch E: LLM-data curation family ----------------------------------------


def test_unigram_surprisal_matches_python(spark):
    from collections import Counter

    docs = {did: _tokens(t) for did, t in _docs()}
    voc = Counter()
    for tk in docs.values():
        voc.update(tk)
    big_n = sum(voc.values())
    rows = REGISTRY["lm_unigram_surprisal_quality"].spark(spark, SF).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {d for d, tk in docs.items() if tk}
    for did, tk in docs.items():
        if not tk:
            continue
        s = sum(-math.log(voc[w] / big_n) for w in tk) / len(tk)
        r = got[did]
        assert r.n_tokens == len(tk)
        assert r.mean_surprisal_nats == pytest.approx(s, abs=1e-5)
        assert r.high_surprisal == (r.mean_surprisal_nats >= 8.0)


def test_ocr_garbage_matches_python(spark):
    rows = REGISTRY["text_ocr_garbage_score"].spark(spark, SF).collect()
    got = {r.doc_id: r for r in rows}
    for did, text in _docs():
        tk = _tokens(text)
        if not tk:
            continue
        n_sym = len(re.sub(r"[a-zA-Z0-9\s]", "", text, flags=re.ASCII))
        runs = len(re.findall(r"[bcdfghjklmnpqrstvwxz]{5,}", text.lower()))
        mixed = sum(
            1 for w in tk if re.match(r"^[a-z]+[0-9]+[a-z0-9]*$", w)
        )
        r = got[did]
        assert r.n_chars == len(text)
        assert r.n_tokens == len(tk)
        assert r.n_symbol_chars == n_sym
        assert r.n_consonant_runs == runs
        assert r.n_mixed_tokens == mixed
        score = n_sym / len(text) + runs / len(tk) + mixed / len(tk)
        assert r.garbage_score == pytest.approx(score, abs=1e-5)
        assert r.garbage_suspect == (r.garbage_score >= 0.05)


def test_kfold_assign_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT doc_id, source, text FROM '{SF}/documents.parquet'
            WHERE text IS NOT NULL"""
    ).fetchall()
    agg = {}
    for did, src, text in rows:
        fold = _md5_64(f"fold:{did}") % 5
        n, t, srcs = agg.get(fold, (0, 0, set()))
        agg[fold] = (n + 1, t + len(_tokens(text)), srcs | {src})
    got = {
        r.fold: (r.n_docs, r.total_tokens, r.n_sources)
        for r in REGISTRY["split_kfold_assign"].spark(spark, SF).collect()
    }
    assert got == {f: (n, t, len(s)) for f, (n, t, s) in agg.items()}
    # the hash split must be roughly balanced: no fold 2x another
    sizes = [n for n, _, _ in got.values()]
    assert max(sizes) < 2 * min(sizes)


def test_skyline_matches_python(spark):
    """Brute-force O(n^2) strict-dominance recompute of the Pareto set."""
    from annotations_ingester_spark.functions.text import quality_score
    import duckdb

    # reuse the engine's own quality column (scored in Spark) but verify
    # the SKYLINE selection logic independently, pairwise
    sdf = (
        REGISTRY["curation_skyline_quality"].spark(spark, SF).collect()
    )
    import pyspark.sql.functions as SF_  # noqa: N812

    spark_docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(SF_.col("text").isNotNull())
        .select(
            "doc_id",
            quality_score("text").alias("q"),
            SF_.col("n_chars").cast("long").alias("n"),
        )
        .collect()
    )
    pts = [(r.doc_id, r.q, r.n) for r in spark_docs]
    skyline = {
        did
        for did, q, n in pts
        if not any(q2 > q and n2 > n for _, q2, n2 in pts)
    }
    assert {r.doc_id for r in sdf} == skyline
    assert 0 < len(skyline) < len(pts)
    for r in sdf:
        assert (r.quality, r.n_chars) in {(q, n) for _, q, n in pts}


def test_cut_interval_survivors_edge_shapes(spark):
    """Synthetic edge cases for the interval slice fold
    (operators/dedup.py _cut_interval_survivors) that corpus data may
    never exercise: interval starting at position 0, interval running to
    the last token, a FULLY-removed doc (surviving_hash = md5('')),
    adjacent-but-disjoint intervals arriving unsorted, and a doc with no
    intervals at all."""
    import hashlib

    from pyspark.sql import functions as SF_  # noqa: N812

    from annotations_ingester_spark.operators.dedup import (
        _cut_interval_survivors,
    )

    toks = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e"]),  # head cut [0,1]
            (2, ["a", "b", "c", "d", "e"]),  # tail cut [3,4]
            (3, ["a", "b", "c"]),  # fully removed [0,2]
            (4, ["a", "b", "c", "d", "e", "f"]),  # two islands, unsorted
            (5, ["x", "y"]),  # no intervals
            (6, []),  # empty token array, no intervals
        ],
        "doc_id int, _tk array<string>",
    )
    iv = spark.createDataFrame(
        [
            (1, 0, 1),
            (2, 3, 4),
            (3, 0, 2),
            (4, 4, 5),  # deliberately listed before the earlier island
            (4, 0, 1),
            (5, None, None),
        ],
        "doc_id int, start_pos long, end_pos long",
    ).filter(SF_.col("start_pos").isNotNull())
    out = {
        r.doc_id: r
        for r in _cut_interval_survivors(toks, iv, "doc_id").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1].surviving_tokens, out[1].surviving_hash) == (3, md5("c d e"))
    assert (out[2].surviving_tokens, out[2].surviving_hash) == (3, md5("a b c"))
    assert (out[3].removed_tokens, out[3].surviving_hash) == (3, md5(""))
    assert (out[4].surviving_tokens, out[4].surviving_hash) == (2, md5("c d"))
    assert (out[5].removed_tokens, out[5].surviving_hash) == (0, md5("x y"))
    assert (out[6].total_tokens, out[6].surviving_hash) == (0, md5(""))
    for r in out.values():
        assert r.total_tokens == r.removed_tokens + r.surviving_tokens


def test_cut_interval_survivors_randomized(spark):
    """Seeded-random recompute of the interval slice fold: 200 docs with
    random token arrays and random DISJOINT sorted islands (the
    gaps-and-islands output contract), compared against a pure-Python
    cut. One Spark job for the whole batch."""
    import hashlib
    import random

    from annotations_ingester_spark.operators.dedup import (
        _cut_interval_survivors,
    )

    rng = random.Random(0xC0FFEE)
    docs, ivs, expect = [], [], {}
    for did in range(200):
        n = rng.randint(0, 40)
        tk = [rng.choice("abcdefg") for _ in range(n)]
        spans = []
        pos = 0
        while pos < n:
            start = pos + rng.randint(0, 6)
            end = start + rng.randint(0, 8)
            if start >= n:
                break
            end = min(end, n - 1)
            if rng.random() < 0.6:
                spans.append((start, end))
            pos = end + 2  # >= 1-token gap keeps islands disjoint
        removed = {p for s, e in spans for p in range(s, e + 1)}
        surv = [w for i, w in enumerate(tk) if i not in removed]
        expect[did] = (
            n,
            len(removed),
            len(surv),
            hashlib.md5(" ".join(surv).encode()).hexdigest(),
        )
        docs.append((did, tk))
        ivs.extend((did, s, e) for s, e in spans)
    toks_df = spark.createDataFrame(docs, "doc_id int, _tk array<string>")
    iv_df = spark.createDataFrame(ivs, "doc_id int, start_pos long, end_pos long")
    out = _cut_interval_survivors(toks_df, iv_df, "doc_id").collect()
    assert len(out) == 200
    for r in out:
        assert (
            r.total_tokens,
            r.removed_tokens,
            r.surviving_tokens,
            r.surviving_hash,
        ) == expect[r.doc_id], f"doc {r.doc_id}"
