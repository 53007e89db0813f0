"""Round-6 quality-statistics families: n-gram LM perplexity filtering
(the CCNet-style quality signal), DSIR-style hashed-n-gram importance
weights (data selection), chi-square independence over a contingency
table, and mergeable-HLL sketch rollups (the 100 TB pre-aggregation
pattern).

Parity discipline (plans/catalog.py): every per-item log term is rounded
to 9 dp and summed as DECIMAL(20,9) — double log/ln is IEEE-identical
across engines for identical arguments, and the decimal sum removes
accumulation-order sensitivity; one final 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from annotations_ingester_spark.functions import text as tx
from annotations_ingester_spark.functions.hashing import md5_hash64
from annotations_ingester_spark.plans.catalog import register, table

TOKS = tx.tokens_sql("text")
# bigrams from the already-bound token array t (CTE provides t)
_BIGRAMS = (
    "list_transform(range(1, greatest(len(t) - 1, 0) + 1), i -> t[i] || ' ' || t[i+1])"
)
_DSIR_BUCKETS = 1024


@register(
    "lm_perplexity_scores",
    f"""WITH d AS (SELECT doc_id, {TOKS} AS t FROM documents),
       d2 AS (SELECT doc_id, {_BIGRAMS} AS bgs FROM d WHERE len(t) >= 2),
       bg AS (SELECT doc_id, unnest(bgs) AS bg FROM d2),
       uni AS (SELECT unnest(t) AS w FROM d),
       c1 AS (SELECT w, count(*)::DOUBLE AS c1 FROM uni GROUP BY w),
       v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM uni),
       c2 AS (SELECT bg, count(*)::DOUBLE AS c2 FROM bg GROUP BY bg),
       scored AS (
         SELECT bg.doc_id,
                round(log2(c1.c1 + v.v) - log2(c2.c2 + 1), 9)::DECIMAL(20,9) AS nll
         FROM bg
         JOIN c2 USING (bg)
         JOIN c1 ON c1.w = split_part(bg.bg, ' ', 1)
         CROSS JOIN v)
       SELECT doc_id, count(*)::BIGINT AS n_bigrams,
              round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS cross_entropy
       FROM scored GROUP BY doc_id""",
    doc="Bigram-LM cross-entropy per document (add-one smoothing: "
    "p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V)) — the CCNet/KenLM-style perplexity "
    "quality signal: low cross-entropy = in-distribution text, high = "
    "noise. Counts are corpus aggregates; the bigram table joins back to "
    "the per-doc stream on the bigram key (zipfian → AQE skew handling); "
    "V and nothing else is a 1-row broadcast. Per-bigram -log2 p rounded "
    "to 9 dp and decimal-summed so the per-doc mean is order-insensitive.",
)
def q_lm_perplexity(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents")
    big = docs.select(
        F.col("doc_id"), F.explode(tx.word_shingles("text", n=2)).alias("bg")
    )
    uni = docs.select(F.explode(tx.tokens("text")).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").cast("double").alias("c1"))
    v = uni.agg(F.count_distinct("w").cast("double").alias("v"))
    c2 = big.groupBy("bg").agg(F.count("*").cast("double").alias("c2"))
    scored = (
        big.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c2, "bg")
        .join(c1, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log2(F.col("c1") + F.col("v")) - F.log2(F.col("c2") + 1), 9
            )
            .cast("decimal(20,9)")
            .alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("cross_entropy"),
    )


@register(
    "dsir_importance_weights",
    f"""WITH d AS (SELECT doc_id, lang, {TOKS} AS t FROM documents),
       d2 AS (SELECT doc_id, lang, {_BIGRAMS} AS bgs FROM d WHERE len(t) >= 2),
       f AS (
         SELECT doc_id, lang,
                ('0x' || substr(md5(u.bg), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
         FROM (SELECT doc_id, lang, unnest(bgs) AS bg FROM d2) u),
       bucket AS (
         SELECT b, count(*)::DOUBLE AS cr,
                sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS ct
         FROM f GROUP BY b),
       totals AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bucket),
       scored AS (
         SELECT f.doc_id,
                round(ln((k.ct + 1) / (totals.nt + {_DSIR_BUCKETS}))
                      - ln((k.cr + 1) / (totals.nr + {_DSIR_BUCKETS})), 9)::DECIMAL(20,9) AS lw
         FROM f
         JOIN bucket k USING (b)
         CROSS JOIN totals)
       SELECT doc_id, count(*)::BIGINT AS n_features,
              round(CAST(sum(lw) AS DOUBLE) / count(*), 6) AS avg_log_weight
       FROM scored GROUP BY doc_id""",
    doc="DSIR-style importance weights (Xie et al., hashed n-gram "
    "importance resampling): features are bigrams hashed into 1024 "
    "buckets with the engine-portable md5 hash; a doc's weight is its "
    "mean log-ratio of the target (lang='en') vs raw bucket "
    "distributions, add-one smoothed. Raw and target bucket counts come "
    "from ONE aggregate over the feature stream (conditional sum — not "
    "separate filtered scans); totals reduce the 1024-row bucket table. "
    "The feature stream then joins the broadcast bucket table map-side, "
    "so the whole selection score is two feature-stream passes + one "
    "per-doc aggregate. Per-feature log terms rounded + decimal-summed.",
)
def q_dsir_weights(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents")
    f = docs.select(
        F.col("doc_id"),
        F.col("lang"),
        F.explode(tx.word_shingles("text", n=2)).alias("bg"),
    ).select(
        "doc_id", "lang", (md5_hash64("bg") % F.lit(_DSIR_BUCKETS)).alias("b")
    )
    bucket = f.groupBy("b").agg(
        F.count("*").cast("double").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("ct"),
    )
    totals = bucket.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    B = float(_DSIR_BUCKETS)
    scored = (
        f.join(F.broadcast(bucket), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("ct") + 1) / (F.col("nt") + B))
                - F.log((F.col("cr") + 1) / (F.col("nr") + B)),
                9,
            )
            .cast("decimal(20,9)")
            .alias("lw"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_features"),
        F.round(F.sum("lw").cast("double") / F.count("*"), 6).alias("avg_log_weight"),
    )


@register(
    "stats_chi_square_independence",
    """WITH obs AS (
         SELECT lang, source, count(*)::DOUBLE AS o
         FROM documents GROUP BY lang, source),
       rt AS (SELECT lang, sum(o) AS rl FROM obs GROUP BY lang),
       ct AS (SELECT source, sum(o) AS cl FROM obs GROUP BY source),
       n AS (SELECT sum(o) AS n FROM obs),
       cells AS (
         SELECT round(pow(o - rl * cl / n.n, 2) / (rl * cl / n.n), 9)::DECIMAL(20,9) AS term
         FROM obs JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n),
       dims AS (
         SELECT (SELECT count(*) FROM rt) AS nl, (SELECT count(*) FROM ct) AS ns)
       SELECT round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
              ((SELECT nl FROM dims) - 1) * ((SELECT ns FROM dims) - 1) AS dof,
              count(*)::BIGINT AS n_cells
       FROM cells""",
    doc="Pearson chi-square independence test over the lang × source "
    "contingency table: observed counts vs rl·cl/N expected, per-cell "
    "terms rounded + decimal-summed, dof = (r-1)(c-1). The whole test is "
    "aggregates of aggregates — the contingency table is "
    "categories², tiny at any corpus scale; only the first groupBy "
    "touches data.",
)
def q_chi_square(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("o")
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("cl"))
    n = obs.agg(F.sum("o").alias("n"))
    exp = F.col("rl") * F.col("cl") / F.col("n")
    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(F.pow(F.col("o") - exp, 2) / exp, 9)
            .cast("decimal(20,9)")
            .alias("term")
        )
    )
    stats1 = cells.agg(
        F.round(F.sum("term").cast("double"), 6).alias("chi2"),
        F.count("*").cast("long").alias("n_cells"),
    )
    dims = rt.agg(F.count("*").alias("nl")).crossJoin(ct.agg(F.count("*").alias("ns")))
    return stats1.crossJoin(F.broadcast(dims)).select(
        "chi2",
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long").alias("dof"),
        "n_cells",
    )


# HLL default lgConfigK=12 → rsd = 1.04/sqrt(2^12) ≈ 0.01625; certify at 4σ
_HLL_BOUND = 0.065


@register(
    "sketch_mergeable_rollup",
    """WITH per AS (
         SELECT o_orderpriority AS scope,
                count(DISTINCT o_custkey)::BIGINT AS exact_distinct
         FROM orders GROUP BY o_orderpriority)
       SELECT scope, exact_distinct, true AS certified FROM per
       UNION ALL
       SELECT 'ALL' AS scope, count(DISTINCT o_custkey)::BIGINT AS exact_distinct,
              true AS certified
       FROM orders""",
    doc="Mergeable-sketch rollup: per-priority HLL sketches of distinct "
    "customers (hll_sketch_agg), then a UNION of the group sketches "
    "(hll_union_agg) for the global row — the 100 TB pre-aggregation "
    "pattern where partial sketches are stored per partition/day and "
    "rolled up without rescanning. Every estimate is certified against "
    "the exact distinct within 4σ of the configured rsd "
    "(lgConfigK=12 → 6.5%); the oracle pins the exact counts and the "
    "certification verdicts. HLL is deterministic for a fixed input set, "
    "so the verdict is stable, not statistical flake.",
)
def q_sketch_rollup(spark: SparkSession, sf: str):
    orders = table(spark, sf, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct"),
    )
    def cert(est):
        return (
            F.abs(est.cast("double") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= F.lit(_HLL_BOUND)
        )
    per = g.select(
        F.col("o_orderpriority").alias("scope"),
        "exact_distinct",
        cert(F.hll_sketch_estimate("sk")).alias("certified"),
    )
    all_exact = orders.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    union_row = (
        g.agg(F.hll_union_agg("sk").alias("sku"))
        .crossJoin(F.broadcast(all_exact))
        .select(
            F.lit("ALL").alias("scope"),
            "exact_distinct",
            cert(F.hll_sketch_estimate("sku")).alias("certified"),
        )
    )
    return per.unionByName(union_row)
