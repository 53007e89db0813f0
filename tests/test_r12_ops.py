"""Round-12 head-start independent recomputes (the r9 lesson: parity
alone cannot catch a shared-formula bug)."""

from __future__ import annotations

import hashlib
import math

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _md5_64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_modularity_matches_python(spark):
    """Full recompute: 2-iteration synchronous LPA with (max weight, min
    label) tie-break over the bipartite graph, then Newman Q."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, event_type, count(*)::BIGINT
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    edges = []
    for uid, et, w in rows:
        u, t = f"u:{uid}", f"t:{et}"
        edges.append((u, t, int(w)))
        edges.append((t, u, int(w)))
    nodes = {n for e in edges for n in e[:2]}
    label = {n: n for n in nodes}
    for _ in range(2):
        votes = {}
        for s, d, w in edges:
            votes.setdefault(d, {}).setdefault(label[s], 0)
            votes[d][label[s]] += w
        new = {}
        for n in nodes:
            if n in votes:
                new[n] = min(
                    votes[n], key=lambda lb: (-votes[n][lb], lb)
                )
            else:
                new[n] = n
        label = new
    big_w = sum(w for _, _, w in edges)
    w_in = {}
    d_c = {}
    for s, d, w in edges:
        if label[s] == label[d]:
            w_in[label[s]] = w_in.get(label[s], 0) + w
        d_c[label[s]] = d_c.get(label[s], 0) + w
    q = sum(
        round(w_in.get(c, 0) / big_w - (d_c[c] / big_w) ** 2, 9) for c in d_c
    )
    r = REGISTRY["graph_modularity_score"].spark(spark, SF).collect()[0]
    assert r.n_communities == len(d_c)
    assert r.internal_weight == sum(w_in.values())
    assert r.modularity == pytest.approx(q, abs=2e-6)
    assert r.well_partitioned == (round(q, 6) > 0.3)


def test_return_intervals_matches_python(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id,
                   (floor(epoch(ts))::BIGINT // 86400)::BIGINT
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_user = {}
    for uid, d in rows:
        by_user.setdefault(uid, []).append(int(d))
    gaps = Counter()
    for days in by_user.values():
        days.sort()
        for a, b in zip(days, days[1:]):
            gaps[b - a] += 1
    total = sum(gaps.values())
    got = {r.gap_days: r for r in REGISTRY["events_return_intervals"].spark(spark, SF).collect()}
    assert set(got) == set(gaps)
    for g, n in gaps.items():
        assert got[g].n_returns == n
        assert got[g].return_share == pytest.approx(n / total, abs=2e-6)
    # shares must sum to 1
    assert sum(r.return_share for r in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_sliced_calibration_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    slices = {}
    for vid, lbl in rows:
        conf = _md5_64(f"conf:{vid}") % 10000
        correct = 1 if (_md5_64(f"outcome:{vid}") % 10000) < (conf * 9) // 10 + 500 else 0
        b = conf // 1000
        s = slices.setdefault(lbl, {})
        n, sc, nc = s.get(b, (0, 0, 0))
        s[b] = (n + 1, sc + conf, nc + correct)
    eces = {}
    for lbl, bins in slices.items():
        n_total = sum(n for n, _, _ in bins.values())
        ece = round(
            sum(abs(sc - 10000 * nc) for _, sc, nc in bins.values()) / n_total, 4
        )
        eces[lbl] = (n_total, ece)
    disparity = round(max(e for _, e in eces.values()) - min(e for _, e in eces.values()), 4)
    got = {r.label: r for r in REGISTRY["eval_sliced_calibration"].spark(spark, SF).collect()}
    assert set(got) == set(eces)
    for lbl, (n_total, ece) in eces.items():
        r = got[lbl]
        assert r.n_total == n_total
        assert r.ece_bp == pytest.approx(ece, abs=1e-3)
        assert r.ece_disparity_bp == pytest.approx(disparity, abs=1e-3)
        assert r.disparate_slices == (disparity > 100.0)


def test_cusum_variance_matches_python(spark):
    import duckdb

    xs = [
        (int(d), int(x))
        for d, x in duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                       sum(round(value * 100)::BIGINT)::BIGINT
                FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
        ).fetchall()
    ]
    vals = [x for _, x in xs]
    n = len(vals)
    mu = sum(vals) / n
    var0 = sum((v - mu) ** 2 for v in vals) / n
    s = 0.0
    best_k, best_day = -1.0, None
    for day, x in xs:
        s += round((x - mu) ** 2 / var0 - 1.0, 9)
        if abs(s) > best_k:
            best_k, best_day = abs(s), day
    r = REGISTRY["stats_cusum_variance"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.k_stat == pytest.approx(best_k, abs=2e-4)
    assert r.shift_day == best_day
    assert r.k_scaled == pytest.approx(best_k / math.sqrt(2 * n), abs=2e-4)
    assert r.variance_shift_detected == (
        round(best_k / math.sqrt(2 * n), 4) > 1.36
    )


def test_seasonal_mann_kendall_matches_python(spark):
    import duckdb

    xs = [
        (int(d), int(x))
        for d, x in duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                       sum(round(value * 100)::BIGINT)::BIGINT
                FROM '{SF}/events.parquet' GROUP BY day ORDER BY day"""
        ).fetchall()
    ]
    seasons = {}
    for d, x in xs:
        seasons.setdefault(d % 7, []).append((d, x))
    s_stat = 0
    var_s = 0.0
    tie_term = 0
    for sub in seasons.values():
        n = len(sub)
        var_s += n * (n - 1) * (2 * n + 5)
        from collections import Counter

        for t in Counter(x for _, x in sub).values():
            if t > 1:
                tie_term += t * (t - 1) * (2 * t + 5)
        for i in range(n):
            for j in range(i + 1, n):
                diff = sub[j][1] - sub[i][1]
                s_stat += (diff > 0) - (diff < 0)
    var_s = (var_s - tie_term) / 18.0
    z = (
        (s_stat - 1) / math.sqrt(var_s)
        if s_stat > 0
        else ((s_stat + 1) / math.sqrt(var_s) if s_stat < 0 else 0.0)
    )
    r = REGISTRY["stats_seasonal_mann_kendall"].spark(spark, SF).collect()[0]
    assert r.n_seasons == len(seasons)
    assert r.n_points == len(xs)
    assert r.s_stat == s_stat
    assert r.var_s == pytest.approx(var_s, abs=1e-3)
    assert r.z_stat == pytest.approx(z, abs=2e-4)
    assert r.trend == ("increasing" if s_stat > 0 else "decreasing" if s_stat < 0 else "none")


def test_hourly_seasonality_matches_python(spark):
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT ((floor(epoch(ts))::BIGINT % 86400) // 3600)::BIGINT,
                   round(value * 100)::BIGINT
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    n_h, r_h = Counter(), Counter()
    for hr, cents in rows:
        n_h[int(hr)] += 1
        r_h[int(hr)] += int(cents)
    nt = sum(n_h.values())
    rt = sum(r_h.values())
    top3 = sum(n for _, n in sorted(n_h.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    got = {r.hour_utc: r for r in REGISTRY["events_hourly_seasonality"].spark(spark, SF).collect()}
    assert set(got) == set(n_h)
    for hr, r in got.items():
        assert (r.n_events, r.revenue_cents) == (n_h[hr], r_h[hr])
        assert r.event_share == pytest.approx(n_h[hr] / nt, abs=2e-6)
        assert r.revenue_share == pytest.approx(r_h[hr] / rt, abs=2e-6)
        assert r.top3_hour_concentration == pytest.approx(top3 / nt, abs=2e-6)
    assert sum(r.event_share for r in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_audio_clipping_odd_frame_buffer_degrades_not_raises(spark):
    """ADVICE r10: a WAV that opens cleanly but yields an odd-length
    frame buffer must degrade (no row) instead of raising struct.error
    and failing the whole Spark task. Build such a blob by writing a
    valid header and then truncating mid-sample."""
    import pandas as pd

    from annotations_ingester_spark.multimodal.media import (
        audio_clipping_stats,
        audio_frame_energy,
        synth_pcm_wav,
    )

    good = synth_pcm_wav(7)
    # Chop one byte off the data chunk: wave happily opens it (header
    # still parses) but readframes returns an odd number of bytes once
    # we also lie about nframes via direct truncation.
    odd = good[:-1]
    rows = [(1, bytearray(good)), (2, bytearray(odd)), (3, bytearray(b"RIFFxxxxWAVE"))]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        schema="media_id long, payload binary",
    )
    out = audio_clipping_stats(df).collect()
    ids = {r.media_id for r in out}
    assert 1 in ids  # the intact blob still decodes
    assert 3 not in ids  # garbage degrades silently
    # And the frame-energy path shares the hardened unpack:
    out2 = audio_frame_energy(df).collect()
    assert {r.media_id for r in out2} <= {1, 2}


def test_multiprobe_n_probes_validated(spark, sf_dir):
    """ADVICE r10: n_probes outside [1, n_bits+1] must raise instead of
    silently probing buckets outside the code domain."""
    import pytest as _pytest

    from annotations_ingester_spark.operators.similarity import (
        multiprobe_bucketed_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.select("vec_id").limit(2)
    with _pytest.raises(ValueError, match="n_probes"):
        multiprobe_bucketed_topk(emb, q, n_bits=8, n_probes=10)
    with _pytest.raises(ValueError, match="n_probes"):
        multiprobe_bucketed_topk(emb, q, n_bits=8, n_probes=0)
    # the boundary values are legal
    multiprobe_bucketed_topk(emb, q, n_bits=8, n_probes=9)
    multiprobe_bucketed_topk(emb, q, n_bits=8, n_probes=1)


def test_substring_bpe_k50_matches_python(spark):
    """Independent recompute of the BPE-token substring dedup (k=50):
    re-derive the BPE token stream with a from-scratch Python merge
    loop (not the Spark/DuckDB string-replace trick), then anchors →
    islands → >= 50-token intervals."""
    import re

    import duckdb

    from annotations_ingester_spark.functions.bpe import BPE_MERGES

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()

    def bpe(text: str) -> list[str]:
        norm = re.sub(r"[^a-z ]", "", text.lower())
        toks = list(norm)
        for a, b in BPE_MERGES:
            out = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return [t for t in toks if t not in ("", " ")]

    n, k = 5, 50
    grams: dict[int, list[tuple[int, str]]] = {}
    counts: dict[str, int] = {}
    for did, text in rows:
        tk = bpe(text)
        g = []
        for p in range(len(tk) - n + 1):
            s = " ".join(tk[p : p + n])
            g.append((p, s))
            counts[s] = counts.get(s, 0) + 1
        grams[did] = g
    expected = set()
    for did, g in grams.items():
        hits = sorted(p for p, s in g if counts[s] >= 2)
        if not hits:
            continue
        start = prev = hits[0]
        runs = []
        for p in hits[1:]:
            if p > prev + n:
                runs.append((start, prev))
                start = p
            prev = p
        runs.append((start, prev))
        for s, e in runs:
            span = e + n - 1 - s + 1
            if span >= k:
                expected.add((did, s, e + n - 1, span))

    got = {
        (r.doc_id, r.start_pos, r.end_pos, r.span_len)
        for r in REGISTRY["dedup_substring_bpe_k50"].spark(spark, SF).collect()
    }
    assert got == expected
    assert expected  # teeth: sf0.001 must actually contain >=50-token clones


def test_g_test_matches_python(spark):
    import math

    import duckdb

    rows = duckdb.sql(
        f"""SELECT ((floor(epoch(ts))::BIGINT // 86400) % 7)::BIGINT,
                   event_type, count(*)
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    n = sum(c for _, _, c in rows)
    rl: dict[int, int] = {}
    cl: dict[str, int] = {}
    for dow, et, c in rows:
        rl[dow] = rl.get(dow, 0) + c
        cl[et] = cl.get(et, 0) + c
    from decimal import Decimal

    g = sum(
        Decimal(str(round(2.0 * c * math.log(c / (rl[dow] * cl[et] / n)), 9)))
        for dow, et, c in rows
    )
    r = REGISTRY["stats_g_test"].spark(spark, SF).collect()[0]
    assert r.g_stat == pytest.approx(float(g), abs=2e-6)
    assert r.dof == (len(rl) - 1) * (len(cl) - 1)
    assert r.n_cells == len(rows)


def test_mantel_haenszel_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT n.n_regionkey,
                   CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END,
                   CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END, count(*)
            FROM '{SF}/customer.parquet' c
            JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3"""
    ).fetchall()
    strata: dict[int, dict[tuple[int, int], float]] = {}
    for s, e, o, c in rows:
        strata.setdefault(s, {})[(e, o)] = float(c)
    srn = ssn = sa = se = sv = 0.0
    for cells in strata.values():
        a = cells.get((1, 1), 0.0)
        b = cells.get((1, 0), 0.0)
        cc = cells.get((0, 1), 0.0)
        d = cells.get((0, 0), 0.0)
        n = a + b + cc + d
        r1, r2, c1, c2 = a + b, cc + d, a + cc, b + d
        srn += a * d / n
        ssn += b * cc / n
        sa += a
        se += r1 * c1 / n
        sv += r1 * r2 * c1 * c2 / (n * n * (n - 1))
    cmh = (abs(sa - se) - 0.5) ** 2 / sv
    r = REGISTRY["stats_mantel_haenszel"].spark(spark, SF).collect()[0]
    assert r.n_strata == len(strata)
    assert r.mh_odds_ratio == pytest.approx(srn / ssn, abs=2e-6)
    assert r.cmh_stat == pytest.approx(cmh, abs=2e-6)
    assert r.association_detected == (round(cmh, 6) > 3.841)


def test_chow_test_matches_python(spark):
    import duckdb

    days = dict(
        duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT,
                       sum(round(value * 100)::BIGINT)
                FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    d0, dmax = min(days), max(days)
    brk = d0 + (dmax - d0) // 2

    def rss(pts):
        n = float(len(pts))
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        return (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / (sxx - sx * sx / n)

    pts = [(float(day - d0), float(v)) for day, v in days.items()]
    seg1 = [(x, y) for (x, y), day in zip(pts, days) if day <= brk]
    seg2 = [(x, y) for (x, y), day in zip(pts, days) if day > brk]
    rss_u = rss(seg1) + rss(seg2)
    rss_p = rss(pts)
    n_tot = len(pts)
    f = (rss_p - rss_u) / 2 / (rss_u / (n_tot - 4))
    r = REGISTRY["stats_chow_test"].spark(spark, SF).collect()[0]
    assert (r.break_day, r.n_days) == (brk, n_tot)
    assert r.f_stat == pytest.approx(f, abs=1e-4)
    assert r.structural_break == (round(f, 6) > 3.0)


def test_fleiss_kappa_matches_python(spark):
    import duckdb

    ids = [
        int(i)
        for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    R, K = 3, 4

    def rating(d: int, r: int) -> int:
        hv = _md5_64(f"{d}:{r}")
        return d % K if hv % 5 > 0 else (hv // 5) % K

    cells = {}
    for d in ids:
        row = [0] * K
        for r in range(R):
            row[rating(d, r)] += 1
        cells[d] = row
    p_i = {
        d: (sum(v * v for v in row) - R) / (R * (R - 1)) for d, row in cells.items()
    }
    p_bar = sum(p_i.values()) / len(ids)
    nj = [sum(row[j] for row in cells.values()) for j in range(K)]
    p_e = sum((x / (len(ids) * R)) ** 2 for x in nj)
    kappa = (p_bar - p_e) / (1 - p_e)
    r = REGISTRY["eval_fleiss_kappa"].spark(spark, SF).collect()[0]
    assert (r.n_items, r.n_raters) == (len(ids), R)
    assert r.p_observed == pytest.approx(p_bar, abs=2e-6)
    assert r.p_expected == pytest.approx(p_e, abs=2e-6)
    assert r.fleiss_kappa == pytest.approx(kappa, abs=2e-6)
    # teeth: raters agree more than chance but not perfectly
    assert 0.3 < kappa < 0.99


def test_rank_biased_overlap_matches_python(spark):
    """Recompute truncated RBO@10 (p=0.9) from scratch: exact cosine
    rankings vs sign-bucket ANN rankings, prefix overlaps by depth."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(i): np.array(e, dtype=np.float64) for i, e in rows}
    qids = [i for i in vecs if i % 101 == 0 and i < 2000]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return round(float(a @ b / (na * nb)), 6) if na * nb > 0 else 0.0

    def topk(q, cand_ids, k=10):
        scored = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in cand_ids if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        return [c for _, c in scored]

    def bucket(v, bits=8):
        return sum((1 << i) for i in range(bits) if v[i] >= 0)

    by_bucket: dict[int, list[int]] = {}
    for i, v in vecs.items():
        by_bucket.setdefault(bucket(v), []).append(i)

    p, K = 0.9, 10
    from decimal import Decimal

    total = Decimal(0)
    for q in qids:
        truth = topk(q, list(vecs))
        pred = topk(q, by_bucket[bucket(vecs[q])])
        rt = {c: r + 1 for r, c in enumerate(truth)}
        rp = {c: r + 1 for r, c in enumerate(pred)}
        mr = [max(rt[c], rp[c]) for c in rp if c in rt]
        mass = Decimal(0)
        for d in range(1, K + 1):
            x = sum(1 for m in mr if m <= d)
            mass += Decimal(str(round((1 - p) * p ** (d - 1) * x / d, 9)))
        total += mass
    expect = float(total) / len(qids)
    r = REGISTRY["eval_rank_biased_overlap"].spark(spark, SF).collect()[0]
    assert r.n_queries == len(qids)
    assert r.mean_rbo_at_10 == pytest.approx(expect, abs=2e-6)
    assert 0.0 < r.mean_rbo_at_10 <= 1.0


def test_forecast_mase_matches_python(spark):
    import duckdb

    days = dict(
        duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT,
                       sum(round(value * 100)::BIGINT)
                FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    ordered = sorted(days)
    cut = max(ordered) - 7
    lagged = [
        (d, days[d], days[ordered[i - 7]])
        for i, d in enumerate(ordered)
        if i >= 7
    ]
    tr = [abs(x - xs) for d, x, xs in lagged if d <= cut]
    te = [abs(x - xs) for d, x, xs in lagged if d > cut]
    sm = [
        abs(x - xs) / ((abs(x) + abs(xs)) / 2)
        for d, x, xs in lagged
        if d > cut and (abs(x) + abs(xs)) > 0
    ]
    mase = (sum(te) / len(te)) / (sum(tr) / len(tr))
    r = REGISTRY["eval_forecast_mase"].spark(spark, SF).collect()[0]
    assert (r.n_train, r.n_test) == (len(tr), len(te))
    assert r.mase == pytest.approx(mase, abs=1e-4)
    assert r.smape_pct == pytest.approx(100 * sum(sm) / len(sm), abs=1e-2)


def test_audio_snr_matches_python(spark):
    import math

    import duckdb

    ids = [
        int(i)
        for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    got = {r.media_id: r for r in REGISTRY["media_audio_snr"].spark(spark, SF).collect()}
    assert set(got) == set(ids)
    for mid in ids[:50]:
        samples = [((mid * 31 + i * 17) % 4096) - 2048 for i in range(256)]
        energies = [
            sum(s * s for s in samples[f * 64 : (f + 1) * 64]) for f in range(4)
        ]
        r = got[mid]
        assert r.n_frames == 4
        assert r.peak_energy == max(energies)
        assert r.floor_energy == min(energies)
        if min(energies) > 0:
            assert r.snr_db == pytest.approx(
                round(10 * math.log10(max(energies) / min(energies)), 4), abs=1e-9
            )
        else:
            assert r.snr_db is None


def test_jaccard_link_scores_consistent_with_adamic_adar(spark):
    """The J and AA queries share the candidate graph and wedge rule, so
    their (pair, cn) sets must be IDENTICAL; J itself recomputed from
    the degree table."""
    aa = {
        (r.doc_a, r.doc_b): r.cn
        for r in REGISTRY["graph_adamic_adar"].spark(spark, SF).collect()
    }
    jj = {
        (r.doc_a, r.doc_b): r
        for r in REGISTRY["graph_jaccard_link_scores"].spark(spark, SF).collect()
    }
    assert {k: v for k, v in aa.items()} == {k: r.cn for k, r in jj.items()}
    for (a, b), r in jj.items():
        assert r.jaccard_score == pytest.approx(
            round(r.cn / (r.deg_a + r.deg_b - r.cn), 6), abs=1e-9
        )
        assert 0 < r.jaccard_score <= 1.0
        assert r.cn <= min(r.deg_a, r.deg_b)


def test_sentence_stats_matches_python(spark):
    import re

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    got = {
        r.doc_id: r
        for r in REGISTRY["text_sentence_stats"].spark(spark, SF).collect()
    }
    n_checked = 0
    for did, text in rows:
        sents = [s for s in re.split(r"[.!?]+", text) if s.strip() != ""]
        sl = [
            len([t for t in re.split(r"[^a-z0-9]+", s.lower()) if t != ""])
            for s in sents
        ]
        if not sl:
            assert did not in got
            continue
        r = got[did]
        n_checked += 1
        assert r.n_sentences == len(sl)
        assert r.total_tokens == sum(sl)
        assert r.mean_sentence_tokens == pytest.approx(
            round(sum(sl) / len(sl), 4), abs=1e-9
        )
        assert r.max_sentence_tokens == max(sl)
        assert r.short_sentence_share == pytest.approx(
            round(sum(1 for x in sl if x < 4) / len(sl), 6), abs=1e-9
        )
    assert n_checked == len(got)


def test_theta_forecast_matches_python(spark):
    """From-scratch theta: OLS trend + SES(alpha=0.2) of the theta-2
    line, with the engine's 9-dp per-step rounding."""
    import duckdb

    days = dict(
        duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT,
                       sum(round(value * 100)::BIGINT)
                FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    xs = [float(days[d]) for d in sorted(days)]
    n = len(xs)
    ts = list(range(1, n + 1))
    st, sx = sum(ts), sum(xs)
    stt = sum(t * t for t in ts)
    stx = sum(t * x for t, x in zip(ts, xs))
    b = round((stx - st * sx / n) / (stt - st * st / n), 9)
    a = round((sx - b * st) / n, 9)
    zs = [round(2 * x - (a + b * t), 9) for t, x in zip(ts, xs)]
    level = zs[0]
    for z in zs[1:]:
        level = round(0.2 * z + 0.8 * level, 9)
    got = {
        r.horizon_days: r
        for r in REGISTRY["timeseries_theta_forecast"].spark(spark, SF).collect()
    }
    assert set(got) == set(range(1, 8))
    for h, r in got.items():
        assert r.n_days == n
        assert r.trend_cents_per_day == pytest.approx(round(b, 4), abs=1e-9)
        assert r.ses_theta2_level == pytest.approx(round(level, 4), abs=1e-9)
        assert r.forecast_cents == pytest.approx(
            round(0.5 * ((a + b * (n + h)) + level), 4), abs=1e-9
        )


def test_hits_2iter_matches_python(spark):
    import duckdb

    pairs = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    outd: dict[int, int] = {}
    ind: dict[str, int] = {}
    for u, t in pairs:
        outd[u] = outd.get(u, 0) + 1
        ind[t] = ind.get(t, 0) + 1
    a2 = {}
    for u, t in pairs:
        a2[t] = a2.get(t, 0) + outd[u]
    m = max(a2.values())
    got = {r.event_type: r for r in REGISTRY["graph_hits_2iter"].spark(spark, SF).collect()}
    assert set(got) == set(ind)
    for t, r in got.items():
        assert r.auth1_indegree == ind[t]
        assert r.auth2 == a2[t]
        assert r.auth2_norm == pytest.approx(round(a2[t] / m, 6), abs=1e-9)
        assert r.n_users == len(outd)
    # teeth: a2(t) = sum of in-neighbor outdegrees >= indegree, strictly
    # greater somewhere (some user touches >= 2 types), so iteration 2
    # genuinely used hub mass rather than copying indegree
    assert all(got[t].auth2 >= got[t].auth1_indegree for t in got)
    assert any(got[t].auth2 > got[t].auth1_indegree for t in got)


def test_temporal_holdout_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, (floor(epoch(ts))::BIGINT // 86400)::BIGINT,
                   round(value * 100)::BIGINT
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    d0 = min(d for _, d, _ in rows)
    d1 = max(d for _, d, _ in rows)
    cut = d0 + (d1 - d0) * 4 // 5
    agg = {"train": [0, set(), 0], "test": [0, set(), 0]}
    for u, d, c in rows:
        s = "train" if d <= cut else "test"
        agg[s][0] += 1
        agg[s][1].add(u)
        agg[s][2] += c
    overlap = len(agg["train"][1] & agg["test"][1])
    got = {r.split: r for r in REGISTRY["split_temporal_holdout"].spark(spark, SF).collect()}
    assert set(got) == {"train", "test"}
    assert (got["train"].day_from, got["train"].day_to) == (d0, cut)
    assert (got["test"].day_from, got["test"].day_to) == (cut + 1, d1)
    for s in ("train", "test"):
        assert got[s].n_events == agg[s][0]
        assert got[s].n_users == len(agg[s][1])
        assert got[s].revenue_cents == agg[s][2]
        assert got[s].n_overlap_users == overlap
    assert 0 < overlap <= min(len(agg["train"][1]), len(agg["test"][1]))


def test_dup_quality_association_matches_python(spark):
    import re

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    STOP = {"the", "and", "of", "to", "a", "in", "is", "it"}
    from collections import Counter
    import hashlib

    def bag_fp(t: str) -> str:
        toks = sorted({x for x in re.split(r"[^a-z0-9]+", t.lower()) if x != ""})
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    fps = Counter(bag_fp(t) for _, t in rows)
    cells = [0, 0, 0, 0]  # a=dup_lowq, b=dup_highq, c=uniq_lowq, d=uniq_highq
    for _, t in rows:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x != ""]
        punct = len(re.sub(r"[\w\s]", "", t)) / max(len(t), 1)
        stw = len([x for x in toks if x in STOP]) / max(len(toks), 1)
        q = round(0.5 * min(len(t) / 400.0, 1.0) + 0.5 * stw - punct, 6)
        is_dup = fps[bag_fp(t)] > 1
        q_pass = q >= 0.35
        idx = (0 if is_dup else 2) + (1 if q_pass else 0)
        cells[idx] += 1
    a, b, c, d = cells
    orr = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    r = REGISTRY["corpus_dup_quality_association"].spark(spark, SF).collect()[0]
    assert (r.dup_lowq, r.dup_highq, r.uniq_lowq, r.uniq_highq) == (a, b, c, d)
    assert r.odds_ratio_haldane == pytest.approx(orr, abs=2e-6)
    assert a + b + c + d == len(rows)
    assert a + b > 0  # teeth: the corpus actually contains exact dups


def test_eb_shrinkage_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT n.n_name, count(*),
                   sum(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END)
            FROM '{SF}/customer.parquet' c
            JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1"""
    ).fetchall()
    prs = {nm: y / n for nm, n, y in rows}
    pbar = sum(prs.values()) / len(prs)
    s2 = round(sum(p * p for p in prs.values()) / len(prs) - pbar * pbar, 9)
    m = pbar * (1 - pbar) / s2 - 1
    got = {r.nation: r for r in REGISTRY["stats_eb_shrinkage"].spark(spark, SF).collect()}
    assert set(got) == set(prs)
    for nm, n, y in rows:
        r = got[nm]
        assert (r.n, r.y) == (n, y)
        assert r.raw_rate == pytest.approx(round(y / n, 6), abs=1e-9)
        assert r.shrunk_rate == pytest.approx((y + pbar * m) / (n + m), abs=2e-6)
        assert r.shrink_weight == pytest.approx(n / (n + m), abs=2e-6)
        # shrinkage moves every rate TOWARD the grand mean
        assert abs(r.shrunk_rate - pbar) <= abs(r.raw_rate - pbar) + 1e-9


def test_rayleigh_hour_matches_python(spark):
    import math

    import duckdb

    hrs = duckdb.sql(
        f"""SELECT ((floor(epoch(ts))::BIGINT % 86400) // 3600)::BIGINT, count(*)
            FROM '{SF}/events.parquet' GROUP BY 1"""
    ).fetchall()
    n = sum(c for _, c in hrs)
    cc = sum(c * round(math.cos(2 * math.pi * h / 24), 9) for h, c in hrs)
    ss = sum(c * round(math.sin(2 * math.pi * h / 24), 9) for h, c in hrs)
    rbar = math.sqrt(cc * cc + ss * ss) / n
    mean_hour = ((math.atan2(ss, cc) + 2 * math.pi) % (2 * math.pi)) / (2 * math.pi) * 24
    r = REGISTRY["stats_rayleigh_hour_uniformity"].spark(spark, SF).collect()[0]
    assert r.n_events == n
    assert r.resultant_r == pytest.approx(rbar, abs=2e-6)
    assert r.mean_hour_utc == pytest.approx(mean_hour, abs=1e-3)
    assert r.rayleigh_z == pytest.approx(n * rbar * rbar, abs=1e-3)
    assert 0 <= r.mean_hour_utc < 24


def test_auc_pr_matches_python(spark):
    import re
    from decimal import Decimal

    import duckdb

    rows = duckdb.sql(
        f"SELECT lang, n_chars, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    pv: dict[int, list[int]] = {}
    for lang, n_chars, text in rows:
        toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x != ""]
        if not toks:
            continue
        v = round(n_chars * 1000000.0 / len(toks))
        cell = pv.setdefault(v, [0, 0])
        cell[0 if lang == "en" else 1] += 1
    n_pos = sum(k1 for k1, _ in pv.values())
    n_neg = sum(k2 for _, k2 in pv.values())
    c1 = c2 = 0
    ap = Decimal(0)
    for v in sorted(pv, reverse=True):
        k1, k2 = pv[v]
        c1 += k1
        c2 += k2
        if k1 > 0:
            ap += Decimal(str(round((c1 / (c1 + c2)) * (k1 / n_pos), 9)))
    r = REGISTRY["eval_auc_pr"].spark(spark, SF).collect()[0]
    assert (r.n_pos, r.n_neg) == (n_pos, n_neg)
    assert r.average_precision == pytest.approx(float(ap), abs=2e-6)
    assert r.prevalence == pytest.approx(n_pos / (n_pos + n_neg), abs=2e-6)
    assert r.lift_over_random == pytest.approx(
        float(ap) / (n_pos / (n_pos + n_neg)), abs=1e-3
    )
    # consistency teeth: AP in (0, 1], and the lift column must equal
    # AP/prevalence (here lift < 1 — the chars-per-token score actually
    # UNDERPERFORMS random under AP while ROC-AUC looks mild, which is
    # precisely the imbalance blind spot the metric exists to expose)
    assert 0.0 < r.average_precision <= 1.0
    assert r.lift_over_random == pytest.approx(
        r.average_precision / r.prevalence, abs=2e-3
    )


def test_powerlaw_tail_fit_matches_python(spark):
    import math
    from decimal import Decimal

    import duckdb

    degs = [
        int(d)
        for (d,) in duckdb.sql(
            f"SELECT count(*) FROM '{SF}/events.parquet' GROUP BY user_id"
        ).fetchall()
    ]
    sd = sorted(degs)
    xmin = sd[math.ceil(0.5 * len(sd)) - 1]  # quantile_disc semantics
    tail = [d for d in degs if d >= xmin]
    slog = sum(Decimal(str(round(math.log(d / xmin), 9))) for d in tail)
    alpha = 1.0 + len(tail) / float(slog)
    from collections import Counter

    dd = Counter(tail)
    n_ge = 0
    pts = []
    for d in sorted(dd, reverse=True):
        n_ge += dd[d]
        pts.append((round(math.log(d), 9), round(math.log(n_ge / len(tail)), 9)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = -(sxy - sx * sy / n) / (sxx - sx * sx / n)
    r = REGISTRY["stats_powerlaw_tail_fit"].spark(spark, SF).collect()[0]
    assert (r.n_tail, r.xmin) == (len(tail), xmin)
    assert r.hill_alpha == pytest.approx(alpha, abs=1e-3)
    assert r.ccdf_slope_alpha_minus_1 == pytest.approx(slope, abs=1e-3)
    assert r.plausible_powerlaw == (1.5 <= round(alpha, 4) <= 4.0)
