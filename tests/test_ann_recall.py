"""ANN recall certification (VERDICT r2 #4): the engine certifies not just
determinism but RETRIEVAL QUALITY — recall@k of each ANN tier against
brute-force ground truth, with floors.

Two datasets, because recall is a property of data geometry:

- **planted near-neighbors** (100 clusters × 5 noisy copies, pairwise
  cos ≈ 0.95 within a cluster): the operator's actual use case (near-dup
  retrieval). Floors: multiprobe ≥ 0.8, IVF ≥ 0.8, IVF nprobe=3 ≥ 0.95.
- **uniform-random sf0.1 embeddings**: the adversarial no-structure case —
  all cosines concentrate near 0 (≈ N(0, 1/√d)), so NO sublinear method
  can score high absolute recall. The honest metric there is *lift*:
  recall must beat the candidate fraction (what random candidate
  selection would score) by ≥ 2×.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from annotations_ingester_spark.operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    ivf_topk,
    multiprobe_bucketed_topk,
)

K = 4


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    dim, nclust, copies = 64, 100, 5
    base = rng.normal(size=(nclust, dim))
    rows = []
    for c in range(nclust):
        for _ in range(copies):
            v = base[c] + rng.normal(scale=0.12, size=dim)
            rows.append((len(rows), [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = emb.filter(F.col("vec_id") % copies == 0)
    centroids = emb.filter(F.col("vec_id") % 25 == 3)  # 20-cell quantizer
    gt = brute_force_topk(emb, queries, k=K).select("q_id", "vec_id").cache()
    return emb, queries, centroids, gt


def _recall(ann, gt):
    nq = gt.select("q_id").distinct().count()
    hits = ann.select("q_id", "vec_id").join(gt, ["q_id", "vec_id"]).count()
    return hits / (K * nq)


def test_recall_floors_on_planted_neighbors(planted):
    emb, queries, centroids, gt = planted
    table = {
        "bucketed@8": _recall(bucketed_topk(emb, queries, k=K, n_bits=8), gt),
        "multiprobe@8": _recall(multiprobe_bucketed_topk(emb, queries, k=K, n_bits=8), gt),
        "ivf_nprobe1": _recall(ivf_topk(emb, queries, centroids, k=K, nprobe=1), gt),
        "ivf_nprobe3": _recall(ivf_topk(emb, queries, centroids, k=K, nprobe=3), gt),
    }
    print("planted recall@4:", table)  # the recall table, -s to display
    assert table["bucketed@8"] >= 0.45, table
    assert table["multiprobe@8"] >= 0.80, table
    assert table["ivf_nprobe1"] >= 0.80, table
    assert table["ivf_nprobe3"] >= 0.95, table
    # the dials are monotone: more probes → recall can only improve
    assert table["multiprobe@8"] >= table["bucketed@8"]
    assert table["ivf_nprobe3"] >= table["ivf_nprobe1"]


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.1"),
    reason="sf0.1 testdata not staged (CI stages only the sf0.001 fixture)",
)
def test_uniform_random_lift_at_sf01(spark):
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    gt = brute_force_topk(emb, queries, k=K).select("q_id", "vec_id").cache()
    nq = gt.select("q_id").distinct().count()
    ann = multiprobe_bucketed_topk(emb, queries, k=K, n_bits=8)
    rec = _recall(ann, gt)
    # candidate fraction: what random selection of the same volume scores
    bucketed = emb.withColumn(
        "bucket",
        __import__(
            "annotations_ingester_spark.functions.vectors", fromlist=["sign_bucket"]
        ).sign_bucket("embedding", 8),
    )
    probes = bucketed.join(queries.select("vec_id"), "vec_id", "left_semi").select(
        F.col("vec_id").alias("q_id"),
        F.explode(
            F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(8)])
        ).alias("bucket"),
    )
    n_cand = bucketed.join(probes, "bucket").filter(F.col("vec_id") != F.col("q_id")).count()
    frac = n_cand / (nq * (n - 1))
    print(f"uniform sf0.1: recall@{K}={rec:.3f} candidate_frac={frac:.3f} lift={rec / frac:.1f}x")
    assert rec >= 2 * frac, (rec, frac)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Realistic near-dups at the operators' design point: 200-token docs
    whose duplicate replaces one contiguous 8-token block (a small edit in
    a long document). Shingle-Jaccard stays ≈0.9 (a contiguous edit kills
    only ~10 of ~198 trigram shingles) and the SimHash bit sums barely
    move (4% token change over 200-token sums). Scattered edits in SHORT
    docs are a different regime — they shred most shingles and flip many
    near-zero bit sums, and no sketch method retrieves them well."""
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(5000)]
    rows, pairs = [], []
    did = 0
    for b in range(100):
        base = list(rng.choice(vocab, size=200, replace=False))
        rows.append((did, " ".join(base)))
        base_id = did
        did += 1
        if b % 2 == 0:
            dup = base.copy()
            start = int(rng.integers(0, 192))
            repl = list(rng.choice(vocab, size=8, replace=False))
            dup[start : start + 8] = repl
            rows.append((did, " ".join(dup)))
            pairs.append((base_id, did))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), set(pairs)


def test_minhash_lsh_recall_on_planted_near_dups(planted_docs):
    """LSH banding must recover planted shingle-Jaccard≈0.9 near-dups:
    with 8 hashes in 4 bands of 2, P(any band) = 1-(1-J^2)^4 ≈ 0.999."""
    from annotations_ingester_spark.operators.dedup import (
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs, truth = planted_docs
    cand = lsh_candidate_pairs(lsh_band_keys(minhash_signatures(docs)))
    got = {(r["doc_a"], r["doc_b"]) for r in cand.select("doc_a", "doc_b").collect()}
    recall = len(got & truth) / len(truth)
    print(f"minhash-lsh planted recall: {recall:.3f} ({len(got)} candidates)")
    assert recall >= 0.9, recall


def test_simhash_banding_recall_on_planted_near_dups(planted_docs):
    """SimHash banding's contract, certified at both strengths: pairs
    within the pigeonhole guarantee (Hamming ≤ 3 over 4×15-bit bands MUST
    share a clean band) are recovered at recall 1.0; beyond it the band
    collision is probabilistic and decays (planted 4%-edit pairs land at
    Hamming 0-10, measured ≥ 0.6 overall). Higher-Hamming near-dups are
    the MinHash-LSH tier's job — the test above shows it at 1.0 on the
    same corpus."""
    from annotations_ingester_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    docs, truth = planted_docs
    out = simhash_near_dup_pairs(docs, max_hamming=10, allow_partial_recall=True)
    got = {(r["doc_a"], r["doc_b"]) for r in out.select("doc_a", "doc_b").collect()}
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    within_guarantee = {
        (a, b) for a, b in truth if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert within_guarantee  # the regime is actually exercised
    assert within_guarantee <= got  # pigeonhole: recall 1.0 where promised
    recall = len(got & truth) / len(truth)
    print(f"simhash-band planted recall: {recall:.3f} "
          f"({len(within_guarantee)} pairs within the Hamming<=3 guarantee)")
    assert recall >= 0.6, recall


def test_hash64_banding_exact_recall_vs_brute_force(spark):
    """hash64_near_dup_pairs' pigeonhole claim, checked against brute
    force: on random-ish 64-bit fingerprints with planted <=4-bit
    perturbations, the banded join returns EXACTLY the set of pairs at
    Hamming <= 4 — recall 1.0 AND no extras (the verify filter prunes
    band-collision false candidates)."""
    import hashlib

    from annotations_ingester_spark.operators.dedup import hash64_near_dup_pairs

    def h64(s: str) -> int:
        v = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) | 1
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = []
    for g in range(40):
        base = h64(f"g{g}")
        for m in range(4):
            flips = 0
            if m in (1, 3):
                flips ^= 1 << (1 + g % 59)
            if m in (2, 3):
                flips ^= (1 << (2 + g % 57)) | (1 << (3 + g % 53))
            rows.append((g * 4 + m, base ^ flips))
    df = spark.createDataFrame(rows, "doc_id long, h long")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hash64_near_dup_pairs(
            df, id_col="doc_id", hash_col="h", n_bands=5, max_hamming=4
        ).collect()
    }
    exact = set()
    for i, (ida, ha) in enumerate(rows):
        for idb, hb in rows[i + 1 :]:
            d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= 4:
                exact.add((min(ida, idb), max(ida, idb), d))
    assert got == exact and len(exact) >= 40 * 4  # regime exercised


def test_hash64_banding_rejects_unguaranteed_threshold():
    import pytest

    from annotations_ingester_spark.operators.dedup import hash64_near_dup_pairs

    with pytest.raises(ValueError):
        hash64_near_dup_pairs(None, "i", "h", n_bands=4, max_hamming=4)


def test_gray8_png_roundtrip_phash_equals_pattern():
    """gray8_png builds a REAL PNG; the vendored decoder + average hash
    must recover the planted 64-bit pattern bit-for-bit (the identity the
    media_phash_near_dup_pairs oracle relies on)."""
    from annotations_ingester_spark.multimodal.media import (
        average_hash_gray,
        gray8_png,
        png_decode_gray,
    )

    for pattern in (1, -1, 0x0123456789ABCDEF | 1, (-1 << 40) | 0xF0F1):
        w, h, mode, rows = png_decode_gray(gray8_png(pattern))
        assert (w, h, mode) == (8, 8, "L")
        assert average_hash_gray(rows, w, h) == pattern


def test_matryoshka_prefix_blind_spot(spark, tmp_path):
    """vec 1 hides its divergence in dim 9: at 8 dims it ties the pure
    e1 vectors (rank ties on vec_id pull it into the top 5, overlap
    4/5); at 16 dims the divergence is visible and overlap is exact."""
    import pandas as pd

    def vec(*pairs):
        v = [0.0] * 64
        for i, x in pairs:
            v[i] = x
        return v

    rows = {0: vec((0, 1.0)), 1: vec((0, 1.0), (8, 5.0))}
    for i in range(2, 7):
        rows[i] = vec((0, 1.0))
    pd.DataFrame(
        {
            "vec_id": list(rows),
            "embedding": [rows[k] for k in rows],
            "label": [0] * len(rows),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    out = {
        r.dim: r
        for r in REGISTRY["eval_matryoshka_truncation"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[8].n_queries == out[16].n_queries == 1
    assert out[8].mean_overlap5 == 0.8
    assert out[16].mean_overlap5 == 1.0


def test_davies_bouldin_two_hand_clusters(spark, tmp_path):
    """Clusters A={0,1} (zero scatter) and B={173,174} (S=1.0) with
    centroid distance sqrt(10): R = 1/sqrt(10) for both clusters."""
    import pandas as pd

    def vec(*pairs):
        v = [0.0] * 8
        for i, x in pairs:
            v[i] = x
        return v

    rows = {
        0: vec((0, 1.0)),
        1: vec((0, 1.0)),
        173: vec((1, 3.0)),
        174: vec((1, 5.0)),
    }
    pd.DataFrame(
        {
            "vec_id": list(rows),
            "embedding": [rows[k] for k in rows],
            "label": [0] * len(rows),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    out = {
        r.centroid_id: r
        for r in REGISTRY["eval_cluster_davies_bouldin"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {0, 173}
    assert out[0].n_members == out[173].n_members == 2
    assert out[0].s_intra == 0.0 and out[173].s_intra == 1.0
    assert out[0].r_max == out[173].r_max == 0.316228


def test_isotropy_centered_vs_degenerate(spark, tmp_path):
    """[1,0] and [-1,0]: mean vector is 0 (anisotropy 0) and dim 0 holds
    all the variance (share 1.0)."""
    import pandas as pd

    pd.DataFrame(
        {
            "vec_id": [0, 1],
            "embedding": [[1.0, 0.0], [-1.0, 0.0]],
            "label": [0, 0],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    from annotations_ingester_spark.plans.queries import REGISTRY

    r = REGISTRY["eval_embedding_isotropy"].spark(spark, str(tmp_path)).collect()[0]
    assert r.n_vectors == 2
    assert r.mean_norm2 == 0.0 and r.mean_sq_norm == 1.0
    assert r.anisotropy == 0.0
    assert r.top_dim_var_share == 1.0
