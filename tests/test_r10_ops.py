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
