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
