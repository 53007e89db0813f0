"""Round-10 independent recomputes: every operator added or changed this
round gets a from-raw-data Python/synthetic-graph check (the r9 lesson —
parity alone cannot catch a shared-formula bug)."""

from __future__ import annotations

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY  # noqa: F401

SF = "/root/testdata/sf0.001"


def test_two_hop_reach_hub_cap_excludes_super_node(spark):
    """Star: hub 0 — leaves 1..70 (hub degree 70 > default cap 64).
    With the cap, a leaf's 2-hop frontier through the hub is EXCLUDED:
    reach = 1-hop only = {hub}. Raising the cap restores the full
    69-sibling reach. The hub's own row is unaffected (its MIDDLE nodes
    are the leaves, degree 1)."""
    from annotations_ingester_spark.operators.graph import two_hop_reach

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 71)], ["src", "dst"]
    )
    capped = {r.node: r for r in two_hop_reach(edges).collect()}
    assert capped[0].deg == 70 and capped[0].reach_2hop == 70
    assert capped[1].deg == 1 and capped[1].reach_2hop == 1

    uncapped = {r.node: r for r in two_hop_reach(edges, hub_cap=100).collect()}
    assert uncapped[1].reach_2hop == 70  # hub + 69 siblings


def test_two_hop_reach_cap_is_inclusive(spark):
    """A middle node of degree EXACTLY hub_cap still pivots (<=, not <)."""
    from annotations_ingester_spark.operators.graph import two_hop_reach

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = {r.node: r for r in two_hop_reach(edges, hub_cap=2).collect()}
    assert out[0].reach_2hop == 2  # node 1 (deg 2 == cap) pivots 0 -> 2


def _write_docs(tmp_path, texts):
    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


CLONE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"  # 12 tokens
SHORT_DUP = "red green blue cyan magenta"  # 5 tokens — one duplicated 5-gram only


def test_substring_exact_known_spans(spark, tmp_path):
    """Two docs share a verbatim 12-token clone -> one removal interval per
    doc covering exactly those 12 positions; a 5-token duplicated phrase
    (below min_len=10) must NOT produce an interval."""
    texts = [
        f"{CLONE} one two three {SHORT_DUP}",
        f"zz yy {CLONE} ww vv",
        f"uu tt ss {SHORT_DUP} rr qq pp oo nn mm ll kk jj",
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {
        (r.doc_id, r.start_pos, r.end_pos, r.span_len)
        for r in REGISTRY["dedup_substring_exact"].spark(spark, sf).collect()
    }
    # doc 1: clone at 0..11; doc 2: at 2..13; doc 3: short dup only -> none
    assert rows == {(1, 0, 11, 12), (2, 2, 13, 12)}


def test_substring_survivors_reconstruction(spark, tmp_path):
    """Surviving text is exactly the tokens outside the removal intervals,
    hash-verified against a from-scratch Python reconstruction."""
    import hashlib

    texts = [
        f"{CLONE} one two three {SHORT_DUP}",
        f"zz yy {CLONE} ww vv",
        f"uu tt ss {SHORT_DUP} rr qq pp oo nn mm ll kk jj",
    ]
    sf = _write_docs(tmp_path, texts)
    out = {
        r.doc_id: r
        for r in REGISTRY["dedup_substring_survivors"].spark(spark, sf).collect()
    }
    removal = {1: range(0, 12), 2: range(2, 14), 3: range(0, 0)}
    for doc_id, text in enumerate(texts, start=1):
        toks = text.split()
        surviving = [w for i, w in enumerate(toks) if i not in removal[doc_id]]
        r = out[doc_id]
        assert r.total_tokens == len(toks)
        assert r.surviving_tokens == len(surviving)
        assert r.removed_tokens == len(toks) - len(surviving)
        assert r.surviving_hash == hashlib.md5(
            " ".join(surviving).encode()
        ).hexdigest()


def _daily_cents():
    import duckdb

    return duckdb.sql(
        f"""WITH e AS (SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                  round(value * 100)::BIGINT AS cents
            FROM '{SF}/events.parquet')
        SELECT day, sum(cents)::BIGINT AS x FROM e GROUP BY day ORDER BY day"""
    ).fetchall()


def test_page_hinkley_recompute(spark):
    """From-raw-data loop recompute of m_t / gap / alarm."""
    import pytest

    series = _daily_cents()
    xs = [x for _, x in series]
    xbar = sum(xs) / len(xs)
    delta, lam = round(0.005 * xbar, 4), round(0.05 * xbar, 4)
    out = {r.day: r for r in REGISTRY["stats_page_hinkley"].spark(spark, SF).collect()}
    assert len(out) == len(series)
    m = mn = 0.0
    cum = 0
    for t, (day, x) in enumerate(series, start=1):
        cum += x
        m += round(x - cum / t - delta, 9)
        mn = min(mn, m)
        gap = round(m - mn, 4)
        r = out[day]
        assert r.ph_m == pytest.approx(m, abs=2e-4)
        assert r.gap == pytest.approx(gap, abs=2e-4)
        assert r.alarm == (r.gap > lam)


def test_dickey_fuller_recompute(spark):
    import pytest

    xs = [x for _, x in _daily_cents()]
    pairs = [(xs[i] - xs[i - 1], xs[i - 1]) for i in range(1, len(xs))]
    m = len(pairs)
    sy, sz = sum(y for y, _ in pairs), sum(z for _, z in pairs)
    syy = sum(y * y for y, _ in pairs)
    szz = sum(z * z for _, z in pairs)
    szy = sum(y * z for y, z in pairs)
    vzz, vzy, vyy = szz - sz * sz / m, szy - sz * sy / m, syy - sy * sy / m
    rho = vzy / vzz
    se = (((vyy - vzy * vzy / vzz) / (m - 2)) / vzz) ** 0.5
    r = REGISTRY["stats_dickey_fuller"].spark(spark, SF).collect()[0]
    assert r.n_diffs == m
    assert r.rho_hat == pytest.approx(rho, abs=1e-5)
    assert r.df_stat == pytest.approx(rho / se, abs=1e-3)
    assert r.stationary == (r.df_stat < -2.93)


def test_durbin_watson_recompute(spark):
    import pytest

    series = _daily_cents()
    n = len(series)
    ts = list(range(1, n + 1))
    xs = [x for _, x in series]
    st, sx = sum(ts), sum(xs)
    stt = sum(t * t for t in ts)
    stx = sum(t * x for t, x in zip(ts, xs))
    b = (stx - st * sx / n) / (stt - st * st / n)
    a = sx / n - b * st / n
    e = [x - a - b * t for t, x in zip(ts, xs)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(v * v for v in e)
    r = REGISTRY["stats_durbin_watson"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.slope_cents_per_day == pytest.approx(b, abs=1e-4)
    assert r.dw_stat == pytest.approx(dw, abs=1e-3)
    assert r.positive_autocorr == (r.dw_stat < 1.35)


def _order_groups():
    import duckdb

    return duckdb.sql(
        f"""SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
               round(o_totalprice * 100)::BIGINT AS cents
        FROM '{SF}/orders.parquet'"""
    ).fetchall()


def test_bartlett_recompute(spark):
    import math

    import pytest

    rows = _order_groups()
    groups: dict[int, list[int]] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    k, n = len(groups), len(rows)
    s2 = {}
    for g, vals in groups.items():
        ni = len(vals)
        mean = sum(vals) / ni
        s2[g] = sum((v - mean) ** 2 for v in vals) / (ni - 1)
    sp2 = sum((len(v) - 1) * s2[g] for g, v in groups.items()) / (n - k)
    t = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(s2[g]) for g, v in groups.items()
    )
    c = 1.0 + (sum(1.0 / (len(v) - 1) for v in groups.values()) - 1.0 / (n - k)) / (
        3.0 * (k - 1)
    )
    r = REGISTRY["stats_bartlett_test"].spark(spark, SF).collect()[0]
    assert (r.k_groups, r.n_total) == (k, n)
    assert r.bartlett_t == pytest.approx(t / c, abs=1e-2)
    assert r.reject_equal_var == (r.bartlett_t > 9.488)


def test_cochran_q_recompute(spark):
    import duckdb
    import pytest

    mat = duckdb.sql(
        f"""SELECT user_id, event_type
        FROM '{SF}/events.parquet'
        GROUP BY user_id, event_type
        HAVING count(DISTINCT floor(epoch(ts))::BIGINT // 86400) >= 12"""
    ).fetchall()
    types = duckdb.sql(
        f"SELECT count(DISTINCT event_type) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    ri: dict = {}
    cj: dict = {}
    for u, t in mat:
        ri[u] = ri.get(u, 0) + 1
        cj[t] = cj.get(t, 0) + 1
    k = types
    s = sum(ri.values())
    q = (
        (k - 1)
        * (k * sum(v * v for v in cj.values()) - s * s)
        / (k * s - sum(v * v for v in ri.values()))
    )
    r = REGISTRY["stats_cochran_q"].spark(spark, SF).collect()[0]
    assert r.k_treatments == k
    assert r.q_stat == pytest.approx(q, abs=1e-3)
    assert r.reject_equal_rates == (r.q_stat > 9.488)


def test_jonckheere_recompute_bruteforce(spark):
    """Doubled JT by brute-force pairwise comparison over raw orders."""
    import pytest

    rows = _order_groups()
    groups: dict[int, list[int]] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    import numpy as np

    jt2 = 0
    gs = sorted(groups)
    for a_i in range(len(gs)):
        for b_i in range(a_i + 1, len(gs)):
            x = np.array(groups[gs[a_i]])[:, None]
            y = np.array(groups[gs[b_i]])[None, :]
            jt2 += int(2 * (x < y).sum() + (x == y).sum())
    n = len(rows)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    mu2 = (n * n - sn2) / 2.0
    sigma = ((n * n * (2 * n + 3) - sn23) / 72.0) ** 0.5
    r = REGISTRY["stats_jonckheere_terpstra"].spark(spark, SF).collect()[0]
    assert r.n_total == n
    assert r.jt_doubled == jt2
    assert r.z_stat == pytest.approx((jt2 - mu2) / (2 * sigma), abs=1e-3)
    assert r.increasing_trend == (r.z_stat > 1.645)


def test_mcnemar_recompute(spark):
    import pytest

    pred = [
        (r.labeled_lang, r.predicted_lang)
        for r in REGISTRY["text_lang_id"].spark(spark, SF).collect()
    ]
    counts: dict = {}
    for y, _ in pred:
        counts[y] = counts.get(y, 0) + 1
    maj = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    b = sum(1 for y, yh in pred if yh == y and y != maj)
    c = sum(1 for y, yh in pred if yh != y and y == maj)
    chi2 = 0.0 if b + c == 0 else (abs(b - c) - 1.0) ** 2 / (b + c)
    r = REGISTRY["eval_mcnemar_models"].spark(spark, SF).collect()[0]
    assert (r.n_docs, r.only_a_correct, r.only_b_correct) == (len(pred), b, c)
    assert r.mcnemar_chi2 == pytest.approx(chi2, abs=1e-3)
    assert r.models_differ == (r.mcnemar_chi2 > 3.841)


def test_capture_recapture_recompute(spark):
    import pytest

    p1 = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["minhash_lsh_pairs"].spark(spark, SF).collect()
    }
    p2 = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["simhash_near_dup_pairs"].spark(spark, SF).collect()
    }
    n1, n2, m = len(p1), len(p2), len(p1 & p2)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    r = REGISTRY["eval_dup_capture_recapture"].spark(spark, SF).collect()[0]
    assert (r.n_lsh, r.n_simhash, r.n_both) == (n1, n2, m)
    assert r.est_total_pairs == pytest.approx(nhat, abs=0.01)
    assert r.union_coverage == pytest.approx((n1 + n2 - m) / nhat, abs=1e-5)


def test_waterfill_recompute(spark):
    import duckdb

    supply = dict(
        duckdb.sql(
            f"""SELECT source, sum(len(list_filter(regexp_split_to_array(
                  lower(text), '[^a-z0-9]+'), x -> x <> '')))::BIGINT
            FROM '{SF}/documents.parquet' GROUP BY source"""
        ).fetchall()
    )
    total = sum(supply.values())
    budget = total * 50 // 100
    ordered = sorted(supply.items(), key=lambda kv: (kv[1], kv[0]))
    s_cnt = len(ordered)
    sat, pfx, all_ok = set(), 0, True
    for i, (src, c) in enumerate(ordered, start=1):
        all_ok = all_ok and (c * (s_cnt - i + 1) <= budget - pfx)
        if all_ok:
            sat.add(src)
        pfx += c
    pfx_sat = sum(supply[s] for s in sat)
    theta = None if len(sat) == s_cnt else (budget - pfx_sat) // (s_cnt - len(sat))
    out = {
        r.source: r
        for r in REGISTRY["curation_mixture_waterfill"].spark(spark, SF).collect()
    }
    assert set(out) == set(supply)
    for src, c in supply.items():
        r = out[src]
        expect = c if src in sat else min(c, theta)
        assert (r.tokens, r.alloc_tokens, r.saturated) == (c, expect, src in sat)
    # the allocation respects the budget and fills it up to < n_src tokens
    # of integer-floor slack
    assert sum(r.alloc_tokens for r in out.values()) <= budget


def test_self_bleu_recompute_exact_strings(spark):
    """Recompute with EXACT bigram strings (no hashing) — catches a hash
    collision or a clipping bug that two hash-based engines would share."""
    import re

    import duckdb
    import pytest

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    per_doc: dict = {}
    glob: dict = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if len(toks) < 2:
            continue
        cnt: dict = {}
        for i in range(len(toks) - 1):
            g = f"{toks[i]} {toks[i + 1]}"
            cnt[g] = cnt.get(g, 0) + 1
            glob[g] = glob.get(g, 0) + 1
        per_doc[doc_id] = cnt
    out = {
        r.doc_id: r for r in REGISTRY["lm_self_bleu_proxy"].spark(spark, SF).collect()
    }
    assert set(out) == set(per_doc)
    for doc_id, cnt in per_doc.items():
        n = sum(cnt.values())
        clipped = sum(min(c, glob[g] - c) for g, c in cnt.items())
        r = out[doc_id]
        assert r.n_bigrams == n
        assert r.self_bleu2 == pytest.approx(clipped / n, abs=1e-5)


def test_banding_sweep_nesting(spark):
    """Band keys nest: an (r rows/band) candidate is always an (r/2) one,
    so pair counts are monotone non-increasing in rows_per_band; a pair of
    identical docs is found by every arm."""
    rows = {
        r.rows_per_band: r
        for r in REGISTRY["dedup_lsh_banding_sweep"].spark(spark, SF).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1].n_bands == 8 and rows[2].n_bands == 4 and rows[4].n_bands == 2
    assert (
        rows[1].n_candidate_pairs
        >= rows[2].n_candidate_pairs
        >= rows[4].n_candidate_pairs
    )
    assert rows[4].n_candidate_pairs >= 1  # the corpus has exact dup pairs
    for r in rows.values():
        assert r.n_docs_flagged <= 2 * r.n_candidate_pairs


def test_shot_boundaries_synthetic(spark, tmp_path):
    """Payload with 3 frames of pattern A then 2 of pattern B (A/B differ
    in >12 average-hash bits): exactly one boundary, n_shots = 2, and the
    signatures match a from-scratch Python recompute."""
    import pytest

    frame_a = "ab" * 16  # bytes alternate 97/98
    frame_b = "a" * 16 + "z" * 16  # half low, half high
    payload = frame_a * 3 + frame_b * 2

    def avg_hash(fr: bytes) -> int:
        mean = sum(fr) // len(fr)
        return sum(1 << i for i, b in enumerate(fr) if b >= mean)

    sig_a, sig_b = avg_hash(frame_a.encode()), avg_hash(frame_b.encode())
    ham = bin(sig_a ^ sig_b).count("1")
    assert ham > 12
    sf = _write_docs(tmp_path, [payload, frame_a])  # doc 2: single frame
    out = {
        r.media_id: r
        for r in REGISTRY["media_shot_boundaries"].spark(spark, sf).collect()
    }
    r1 = out[1]
    assert (r1.n_frames, r1.n_boundaries, r1.n_shots) == (5, 1, 2)
    assert r1.mean_hamming == pytest.approx(ham / 4.0, abs=1e-3)
    r2 = out[2]
    assert (r2.n_frames, r2.n_boundaries, r2.n_shots, r2.mean_hamming) == (
        1, 0, 1, 0.0,
    )


def test_streaming_page_hinkley_equals_batch(spark):
    """The streaming fold must reproduce the batch PH report EXACTLY —
    the commutative-monoid contract across arbitrary micro-batch splits."""
    batch = sorted(
        map(tuple, REGISTRY["stats_page_hinkley"].spark(spark, SF).collect())
    )
    stream = sorted(
        map(tuple, REGISTRY["streaming_page_hinkley"].spark(spark, SF).collect())
    )
    assert batch == stream


def test_grubbs_recompute(spark):
    import pytest

    series = _daily_cents()
    xs = [x for _, x in series]
    n = len(xs)
    mean = sum(xs) / n
    sd = (sum((v - mean) ** 2 for v in xs) / (n - 1)) ** 0.5
    suspect = sorted(series, key=lambda dv: (-abs(dv[1] - mean), dv[0]))[0]
    r = REGISTRY["stats_grubbs_outlier"].spark(spark, SF).collect()[0]
    assert (r.n_days, r.suspect_day, r.suspect_cents) == (n, *suspect)
    assert r.g_stat == pytest.approx(abs(suspect[1] - mean) / sd, abs=1e-3)
    assert r.is_outlier == (r.g_stat > 2.745)


def test_substring_dedup_corpus_wide_boilerplate_hot_key(spark, tmp_path):
    """Worst-case gram skew: ONE 12-token boilerplate block present in
    EVERY document (the license-header pathology — a single gram_hash key
    carries the whole corpus). Semantics: every doc gets exactly one
    removal interval over the block, and survivors keep only the unique
    tail. This is the hot-key path the docstring assigns to the
    broadcast/AQE tier; 400 docs suffice to make the hot gram dominate."""
    n = 400
    texts = [f"{CLONE} tail{i}a tail{i}b tail{i}c" for i in range(n)]
    sf = _write_docs(tmp_path, texts)
    rows = REGISTRY["dedup_substring_exact"].spark(spark, sf).collect()
    assert len(rows) == n
    assert {(r.start_pos, r.end_pos, r.span_len) for r in rows} == {(0, 11, 12)}
    surv = {
        r.doc_id: r
        for r in REGISTRY["dedup_substring_survivors"].spark(spark, sf).collect()
    }
    assert all(
        (surv[i].total_tokens, surv[i].surviving_tokens) == (15, 3)
        for i in range(1, n + 1)
    )


# --- r11 head-start tier (built late in r10; certify next round) -------------


def test_cross_split_contamination_recompute(spark, tmp_path):
    """Train doc carries the clone; the test doc quoting it gets exactly
    the clone span flagged; an uncontaminated test doc reports zero.
    Split membership is forced by choosing doc ids on both sides of the
    hash split (computed below, not assumed)."""
    import hashlib

    def is_train(doc_id: int) -> bool:
        h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % 100 < 80

    train_id = next(i for i in range(1, 50) if is_train(i))
    test_ids = [i for i in range(1, 50) if not is_train(i)][:2]
    texts_by_id = {
        train_id: f"{CLONE} trainer filler words here",
        test_ids[0]: f"aa bb {CLONE} cc dd",
        test_ids[1]: "totally fresh unseen words without any overlap at all",
    }
    n = max(texts_by_id) + 1
    texts = [texts_by_id.get(i, f"pad{i}x pad{i}y pad{i}z") for i in range(1, n)]
    sf = _write_docs(tmp_path, texts)
    out = {
        r.doc_id: r
        for r in REGISTRY["dedup_substring_cross_split"].spark(spark, sf).collect()
    }
    assert train_id not in out  # train docs are not scored
    quoted = out[test_ids[0]]
    assert (quoted.total_tokens, quoted.contaminated_tokens) == (16, 12)
    clean = out[test_ids[1]]
    assert clean.contaminated_tokens == 0 and clean.contamination_frac == 0.0


def test_cochran_armitage_recompute(spark):
    import pytest

    rows = _order_groups()
    cents = sorted(c for _, c in rows)
    n = len(cents)
    med = cents[(n - 1) // 2] if n % 2 else cents[n // 2 - 1]
    # lower median per the two-level prefix definition: min v with
    # 2*cum(v) >= n
    cum = 0
    for v in cents:
        cum += 1
        if 2 * cum >= n:
            med = v
            break
    ni: dict = {}
    ri: dict = {}
    for g, c in rows:
        ni[g] = ni.get(g, 0) + 1
        if c > med:
            ri[g] = ri.get(g, 0) + 1
    N = sum(ni.values())
    R = sum(ri.values())
    strv = sum(t * ri.get(t, 0) for t in ni)
    stn = sum(t * ni[t] for t in ni)
    stt = sum(t * t * ni[t] for t in ni)
    z = (N * strv - R * stn) / ((R * (N - R) * (N * stt - stn * stn) / N) ** 0.5)
    r = REGISTRY["stats_cochran_armitage"].spark(spark, SF).collect()[0]
    assert (r.n_total, r.successes) == (N, R)
    assert r.z_stat == pytest.approx(z, abs=1e-3)
    assert r.trend_detected == (abs(r.z_stat) > 1.96)


def test_markov_entropy_rate_recompute(spark):
    import math

    import duckdb
    import pytest

    trans = duckdb.sql(
        f"""WITH e AS (SELECT user_id, event_type AS s,
                  floor(epoch(ts))::BIGINT AS ts_s, event_id
            FROM '{SF}/events.parquet'),
        seq AS (SELECT user_id, s,
                       lag(s) OVER (PARTITION BY user_id
                                    ORDER BY ts_s, event_id) AS prev
                FROM e)
        SELECT prev, s, count(*) FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, s"""
    ).fetchall()
    cs: dict = {}
    total = 0
    for p, _, c in trans:
        cs[p] = cs.get(p, 0) + c
        total += c
    h = -sum((c / total) * math.log2(c / cs[p]) for p, _, c in trans)
    r = REGISTRY["events_markov_entropy_rate"].spark(spark, SF).collect()[0]
    assert (r.n_transitions, r.n_states) == (total, len(cs))
    assert r.entropy_rate_bits == pytest.approx(h, abs=1e-4)
    assert r.predictability_ratio == pytest.approx(
        h / math.log2(len(cs)), abs=1e-4
    )


def test_mattr_recompute(spark, tmp_path):
    import pytest

    texts = [
        " ".join(["tok"] * 40),                      # degenerate: MATTR = 1/25
        " ".join(f"w{i}" for i in range(40)),        # all distinct: MATTR = 1
        "a b c a b",                                  # short doc (< W): TTR 3/5
    ]
    sf = _write_docs(tmp_path, texts)
    out = {
        r.doc_id: r
        for r in REGISTRY["text_mattr_diversity"].spark(spark, sf).collect()
    }
    assert out[1].mattr == pytest.approx(1.0 / 25, abs=1e-6)
    assert out[2].mattr == pytest.approx(1.0, abs=1e-6)
    assert out[3].n_tokens == 5 and out[3].mattr == pytest.approx(0.6, abs=1e-6)
    # independent recompute on real data
    import re

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    real = {
        r.doc_id: r.mattr
        for r in REGISTRY["text_mattr_diversity"].spark(spark, SF).collect()
    }
    for doc_id, text in docs[:50]:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n = len(toks)
        if n < 25:
            expect = len(set(toks)) / n
        else:
            expect = sum(
                len(set(toks[i : i + 25])) for i in range(n - 25 + 1)
            ) / ((n - 25 + 1) * 25)
        assert real[doc_id] == pytest.approx(expect, abs=1e-5)
