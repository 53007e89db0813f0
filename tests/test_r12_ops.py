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
