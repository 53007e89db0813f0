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
from annotations_ingester_spark.plans.catalog import (
    DAILY_CENTS_CTE,
    DAILY_TYPE_COUNTS_CTE,
    ckpt,
    daily_type_counts,
    events_table,
    register,
    table,
)

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
    # Per-(doc, bigram) multiplicities g are reduced from the shingle
    # stream ONCE; the corpus bigram table derives from g (sum of k) and
    # the per-doc score weights each bigram's rounded -log2 p by k —
    # exactly equal to the oracle's per-occurrence formulation (identical
    # term, integer multiplier) at half the shingle passes and a smaller
    # probability join.
    docs = table(spark, sf, "documents")
    g = (
        docs.select(
            F.col("doc_id"), F.explode(tx.word_shingles("text", n=2)).alias("bg")
        )
        .groupBy("doc_id", "bg")
        .agg(F.count("*").cast("long").alias("k"))
    )
    # g feeds the bigram table AND the score join — same re-derivation
    # class as dsir_importance_weights (runtime: 0 ReusedExchange, 4
    # scans before this round): lazy-checkpoint it so the shingle stream
    # reduces once. ABBA r13 at sf0.1 in the change log.
    g = g.transform(ckpt)
    uni = docs.select(F.explode(tx.tokens("text")).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").cast("double").alias("c1"))
    # V = |distinct w| is exactly c1's row count — deriving it from c1
    # removes a second full tokenize scan of the corpus (the count rides
    # c1's exchange; AQE never reused it across the two legs).
    v = c1.agg(F.count("*").cast("double").alias("v"))
    c2 = g.groupBy("bg").agg(F.sum("k").cast("double").alias("c2"))
    scored = (
        g.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c2, "bg")
        .join(c1, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.col("k"),
            (
                F.col("k").cast("decimal(20,9)")
                * F.round(
                    F.log2(F.col("c1") + F.col("v")) - F.log2(F.col("c2") + 1), 9
                ).cast("decimal(20,9)")
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.sum("k"), 6).alias("cross_entropy"),
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
    # The expensive stream (shingle + portable md5 per bigram) is reduced
    # ONCE into per-(doc, bucket) multiplicities g; the corpus bucket
    # table and its totals derive from g (sums over a ≤ docs×1024 frame),
    # and the per-doc score weights each bucket's rounded log term by its
    # multiplicity — exactly equal to summing the identically-rounded
    # per-feature terms, at half the feature-stream passes and a far
    # smaller score join. The oracle keeps the per-feature formulation;
    # values are equal by construction.
    docs = table(spark, sf, "documents")
    f = docs.select(
        F.col("doc_id"),
        F.col("lang"),
        F.explode(tx.word_shingles("text", n=2)).alias("bg"),
    ).select(
        "doc_id", "lang", (md5_hash64("bg") % F.lit(_DSIR_BUCKETS)).alias("b")
    )
    g = f.groupBy("doc_id", "lang", "b").agg(F.count("*").cast("long").alias("k"))
    # g feeds the bucket table AND the score join; without a
    # materialization point the runtime plan re-derives the shingle+md5
    # stream per leg (0 ReusedExchange, 3 scans — pruning differentiates
    # the subtrees). ckpt auto-classifies this aggregate root lazy: one
    # scan into the shuffle, legs re-derive only the post-shuffle tail.
    # ABBA r13 at sf0.1: lazy 1.73 min / 1.87 med vs none 2.46/2.53 vs
    # eager 1.83/2.00.
    g = g.transform(ckpt)
    bucket = g.groupBy("b").agg(
        F.sum("k").cast("double").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", F.col("k")).otherwise(0))
        .cast("double")
        .alias("ct"),
    )
    totals = bucket.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    B = float(_DSIR_BUCKETS)
    scored = (
        g.join(F.broadcast(bucket), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.col("k"),
            (
                F.col("k").cast("decimal(20,9)")
                * F.round(
                    F.log((F.col("ct") + 1) / (F.col("nt") + B))
                    - F.log((F.col("cr") + 1) / (F.col("nr") + B)),
                    9,
                ).cast("decimal(20,9)")
            ).alias("lw"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_features"),
        F.round(F.sum("lw").cast("double") / F.sum("k"), 6).alias("avg_log_weight"),
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


@register(
    "cohort_retention_matrix",
    """WITH e AS (
         SELECT user_id, floor(epoch(ts))::BIGINT // 604800 AS wk FROM events),
       c AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
       a AS (
         SELECT DISTINCT e.user_id, c.cw, e.wk - c.cw AS off
         FROM e JOIN c USING (user_id))
       SELECT cw AS cohort_week, off AS week_offset, count(*)::BIGINT AS n_users
       FROM a GROUP BY cw, off""",
    doc="Cohort retention matrix: users grouped by first-activity epoch-week "
    "(ts_s // 604800 — integer weeks, timezone-free by construction), "
    "counted as active per week offset. Both aggregates and the "
    "distinct-activity dedup shuffle on user_id — one partitioning serves "
    "the whole matrix; the output is cohorts × offsets, tiny at any scale.",
)
def q_cohort_retention(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import events_table

    e = events_table(spark, sf).select(
        "user_id", F.expr("div(ts_s, 604800)").alias("wk")
    )
    c = e.groupBy("user_id").agg(F.min("wk").alias("cw"))
    a = (
        e.join(c, "user_id")
        .select("user_id", "cw", (F.col("wk") - F.col("cw")).alias("off"))
        .distinct()
    )
    return a.groupBy(
        F.col("cw").alias("cohort_week"), F.col("off").alias("week_offset")
    ).agg(F.count("*").cast("long").alias("n_users"))


@register(
    "events_anomaly_mad",
    """WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
       med AS (
         SELECT event_type,
                percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
         FROM v GROUP BY event_type),
       dev AS (
         SELECT v.event_type, abs(v.value - m.med) AS ad, m.med
         FROM v JOIN med m USING (event_type)),
       madt AS (
         SELECT event_type,
                percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
         FROM dev GROUP BY event_type)
       SELECT d.event_type, round(min(d.med), 6) AS med, round(min(t.mad), 6) AS mad,
              sum(CASE WHEN d.ad > 3 * 1.4826 * t.mad THEN 1 ELSE 0 END)::BIGINT
                AS n_outliers,
              count(*)::BIGINT AS n
       FROM dev d JOIN madt t USING (event_type)
       GROUP BY d.event_type""",
    doc="Robust (median/MAD) outlier detection per event type: "
    "|v − median| > 3·1.4826·MAD — the robust z-score that a mean/stddev "
    "rule gets wrong under heavy tails. Exact interpolated percentiles "
    "(order-independent, so the comparison doubles are bit-identical on "
    "both engines); two grouped percentile passes + one flag aggregate, "
    "all shuffling on event_type.",
)
def q_mad_outliers(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import events_table

    v = events_table(spark, sf).select("event_type", "value").filter(
        F.col("value").isNotNull()
    )
    med = v.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("ad"), "med"
    )
    madt = dev.groupBy("event_type").agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    flagged = dev.join(F.broadcast(madt), "event_type")
    return flagged.groupBy("event_type").agg(
        F.round(F.min("med"), 6).alias("med"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.sum(
            F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.count("*").cast("long").alias("n"),
    )


@register(
    "vocab_zipf_slope",
    f"""WITH tokc AS (
         SELECT u.tok, count(*)::BIGINT AS cnt
         FROM (SELECT unnest({TOKS}) AS tok FROM documents) u
         GROUP BY u.tok),
       top AS (
         SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS r
         FROM tokc),
       sel AS (
         SELECT ln(r::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM top WHERE r <= 1000),
       terms AS (
         SELECT round(x, 9)::DECIMAL(20,9) AS xr, round(y, 9)::DECIMAL(20,9) AS yr,
                round(x * y, 9)::DECIMAL(20,9) AS xy,
                round(x * x, 9)::DECIMAL(20,9) AS x2
         FROM sel),
       s AS (
         SELECT count(*)::DOUBLE AS n, CAST(sum(xr) AS DOUBLE) AS sx,
                CAST(sum(yr) AS DOUBLE) AS sy, CAST(sum(xy) AS DOUBLE) AS sxy,
                CAST(sum(x2) AS DOUBLE) AS sx2
         FROM terms)
       SELECT round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
              round((sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx) / n, 6)
                AS intercept,
              n::BIGINT AS n_terms
       FROM s""",
    doc="Zipf slope of the vocabulary: least-squares fit of ln(freq) vs "
    "ln(rank) over the top-1000 terms (slope ≈ −1 for natural language — "
    "a corpus-health diagnostic that catches boilerplate/spam corpora "
    "whose head flattens). The rank-1000 cut is TakeOrderedAndProject; "
    "the regression sums are per-term products rounded to 9 dp and "
    "decimal-summed, so the fit is accumulation-order-independent — "
    "regr_slope's double accumulator would not hash-match across engines.",
)
def q_zipf_slope(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    tokc = (
        docs.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    top = tokc.orderBy(F.col("cnt").desc(), F.col("tok")).limit(1000)
    r = F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("tok")))
    sel = top.withColumn("r", r).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    terms = sel.select(
        F.round("x", 9).cast("decimal(20,9)").alias("xr"),
        F.round("y", 9).cast("decimal(20,9)").alias("yr"),
        F.round(F.col("x") * F.col("y"), 9).cast("decimal(20,9)").alias("xy"),
        F.round(F.col("x") * F.col("x"), 9).cast("decimal(20,9)").alias("x2"),
    )
    s = terms.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("xr").cast("double").alias("sx"),
        F.sum("yr").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("x2").cast("double").alias("sx2"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.col("n").cast("long").alias("n_terms"),
    )


@register(
    "bpe_pair_merges",
    f"""WITH w AS (SELECT unnest({TOKS}) AS w FROM documents),
       wf AS (SELECT w, count(*)::BIGINT AS f FROM w GROUP BY w),
       p0 AS (
         SELECT f, list_transform(range(1, length(w)), i -> substring(w, i, 2)) AS ps
         FROM wf WHERE length(w) >= 2),
       pr AS (SELECT unnest(ps) AS pair, f FROM p0),
       agg AS (SELECT pair, sum(f)::BIGINT AS merges FROM pr GROUP BY pair),
       top AS (
         SELECT pair, merges FROM agg ORDER BY merges DESC, pair LIMIT 20)
       SELECT pair, merges,
              row_number() OVER (ORDER BY merges DESC, pair)::BIGINT AS rank
       FROM top""",
    doc="First BPE merge step over the corpus: adjacent character-pair "
    "frequencies weighted by word frequency (the statistic each BPE "
    "iteration maximizes when learning a tokenizer). Pair generation runs "
    "over the DISTINCT-word table — vocabulary-sized, not corpus-sized — "
    "with corpus weights carried as counts; top-20 is "
    "TakeOrderedAndProject with rank derived post-limit.",
)
def q_bpe_pairs(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    wf = (
        docs.select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
        .filter(F.length("w") >= 2)
    )
    pr = wf.select(
        "f",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    agg = pr.groupBy("pair").agg(F.sum("f").cast("long").alias("merges"))
    top = agg.orderBy(F.col("merges").desc(), F.col("pair")).limit(20)
    w = Window.orderBy(F.col("merges").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


@register(
    "quantile_disc_certified",
    """WITH c AS (
         SELECT o_orderpriority,
                round(o_totalprice * 100)::BIGINT AS cents,
                o_orderkey
         FROM orders),
       sized AS (
         SELECT o_orderpriority, count(*)::BIGINT AS n FROM c GROUP BY 1),
       ranked AS (
         SELECT o_orderpriority, cents,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY cents, o_orderkey) AS r
         FROM c)
       SELECT s.o_orderpriority, s.n,
              min(CASE WHEN r.r >= ceil(0.5 * s.n) THEN r.cents END)::BIGINT
                AS p50_cents,
              min(CASE WHEN r.r >= ceil(0.95 * s.n) THEN r.cents END)::BIGINT
                AS p95_cents,
              TRUE AS sketch_within_tol
       FROM sized s JOIN ranked r ON s.o_orderpriority = r.o_orderpriority
       GROUP BY s.o_orderpriority, s.n""",
    doc="Mergeable-quantile certification (the percentile companion to "
    "sketch_mergeable_rollup's HLL): per order priority, the EXACT "
    "discrete p50/p95 of integer cents — defined engine-portably as the "
    "value at rank ceil(q*n) under a (cents, orderkey) total order, no "
    "interpolation-convention or float-fold ambiguity — plus a "
    "certification flag that Spark's mergeable percentile_approx sketch "
    "(accuracy 10000, the structure a 1000-executor rollup would merge "
    "map-side) lands within 5% of the exact value. The oracle recomputes "
    "the exact quantiles and expects every group certified. DELIBERATE "
    "one-sided certification: the oracle hardcodes sketch_within_tol = "
    "TRUE, so parity rests on percentile_approx(accuracy=10000) actually "
    "landing within 5% at the tested scale factors — a data-distribution "
    "property, not a pinned equality. That is the point of the query (a "
    "parity failure here IS the sketch's error envelope being violated "
    "and should fail loudly); at accuracy 10000 the rank error bound is "
    "n/10000, orders of magnitude inside 5% of these distributions at "
    "every shipped sf. Scale shape: "
    "exact tier = one priority-partitioned window (bounded: 5 groups); "
    "sketch tier = one map-side-combinable aggregate — at 100 TB only "
    "the sketch runs, and this query is the standing proof of its error "
    "envelope.",
)
def q_quantile_disc_certified(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    ranked = c.withColumn("r", F.row_number().over(w))
    sized = c.groupBy("o_orderpriority").agg(F.count("*").cast("long").alias("n"))
    exact = (
        ranked.join(F.broadcast(sized), "o_orderpriority")
        .groupBy("o_orderpriority", "n")
        .agg(
            F.min(
                F.when(F.col("r") >= F.ceil(0.5 * F.col("n")), F.col("cents"))
            ).cast("long").alias("p50_cents"),
            F.min(
                F.when(F.col("r") >= F.ceil(0.95 * F.col("n")), F.col("cents"))
            ).cast("long").alias("p95_cents"),
        )
    )
    sketch = c.groupBy("o_orderpriority").agg(
        F.percentile_approx("cents", [0.5, 0.95], 10000).alias("approx")
    )
    return exact.join(sketch, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "p50_cents",
        "p95_cents",
        (
            (F.abs(F.col("approx")[0] - F.col("p50_cents")) <= 0.05 * F.col("p50_cents"))
            & (F.abs(F.col("approx")[1] - F.col("p95_cents")) <= 0.05 * F.col("p95_cents"))
        ).alias("sketch_within_tol"),
    )


@register(
    "events_winsorized_stats",
    """WITH e AS (
         SELECT event_type, round(value * 10000)::BIGINT AS v, event_id
         FROM events),
       sized AS (SELECT event_type, count(*)::BIGINT AS n FROM e GROUP BY 1),
       ranked AS (
         SELECT event_type, v,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY v, event_id) AS r
         FROM e),
       bounds AS (
         SELECT s.event_type, s.n,
                min(CASE WHEN r.r >= ceil(0.05 * s.n) THEN r.v END)::BIGINT AS lo,
                min(CASE WHEN r.r >= ceil(0.95 * s.n) THEN r.v END)::BIGINT AS hi
         FROM sized s JOIN ranked r ON s.event_type = r.event_type
         GROUP BY s.event_type, s.n)
       SELECT b.event_type, b.n, b.lo, b.hi,
              sum(CASE WHEN e.v < b.lo THEN 1 ELSE 0 END)::BIGINT
                AS n_clipped_low,
              sum(CASE WHEN e.v > b.hi THEN 1 ELSE 0 END)::BIGINT
                AS n_clipped_high,
              round(CAST(sum(greatest(least(e.v, b.hi), b.lo)::DECIMAL(28,0))
                         AS DOUBLE) / b.n / 10000, 6) AS winsorized_mean
       FROM e JOIN bounds b ON e.event_type = b.event_type
       GROUP BY b.event_type, b.n, b.lo, b.hi""",
    doc="Percentile winsorization — the TRANSFORM companion to the "
    "MAD/z-score anomaly FLAGS: per event type, clip values to the exact "
    "rank-selected [p05, p95] (the engine-portable ceil(q*n) convention "
    "from quantile_disc_certified; values as 4-dp fixed-point integers) "
    "and report clip counts plus the winsorized mean (decimal-exact sum, "
    "one rounding point). The standard robust-metric prep before "
    "training-signal aggregation — a single fat-finger event no longer "
    "moves the mean. Scale shape: one event_type-partitioned rank "
    "window + a broadcast bounds join back over the data.",
)
def q_events_winsorized_stats(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import events_table

    e = events_table(spark, sf).select(
        "event_type",
        F.expr("CAST(round(value * 10000) AS BIGINT)").alias("v"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    ranked = e.withColumn("r", F.row_number().over(w))
    sized = e.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    bounds = (
        ranked.join(F.broadcast(sized), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.min(
                F.when(F.col("r") >= F.ceil(0.05 * F.col("n")), F.col("v"))
            ).cast("long").alias("lo"),
            F.min(
                F.when(F.col("r") >= F.ceil(0.95 * F.col("n")), F.col("v"))
            ).cast("long").alias("hi"),
        )
    )
    clipped = F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
            .cast("long").alias("n_clipped_low"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0))
            .cast("long").alias("n_clipped_high"),
            F.round(
                F.sum(clipped.cast("decimal(28,0)")).cast("double")
                / F.col("n") / 10000,
                6,
            ).alias("winsorized_mean"),
        )
        .select(
            "event_type", "n", "lo", "hi",
            "n_clipped_low", "n_clipped_high", "winsorized_mean",
        )
    )


@register(
    "lm_kneser_ney_bigram",
    f"""WITH d AS (SELECT doc_id, {TOKS} AS t FROM documents),
       bg AS (
         SELECT split_part(u.b, ' ', 1) AS w1, split_part(u.b, ' ', 2) AS w2
         FROM (SELECT unnest({_BIGRAMS}) AS b FROM d WHERE len(t) >= 2) u),
       c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY w1, w2),
       c1 AS (SELECT w1, sum(c2)::BIGINT AS c1,
                     count(*)::BIGINT AS nf
              FROM c2 GROUP BY w1),
       cb AS (SELECT w2, count(*)::BIGINT AS nb FROM c2 GROUP BY w2),
       tt AS (SELECT count(*)::BIGINT AS t_types FROM c2)
       SELECT c2.w1, c2.w2, c2.c2,
              round((greatest(c2.c2 - 0.75, 0.0)
                     + ((0.75 * c1.nf) * cb.nb) / tt.t_types) / c1.c1, 8)
                AS p_kn
       FROM c2
       JOIN c1 ON c1.w1 = c2.w1
       JOIN cb ON cb.w2 = c2.w2
       CROSS JOIN tt
       WHERE c2.c2 >= 3""",
    doc="Kneser-Ney smoothed bigram language model — the strongest "
    "classical n-gram smoother (and the scorer behind CCNet-style "
    "perplexity filters when add-k is not good enough): "
    "P(w2|w1) = (max(c(w1w2)-D, 0) + D * N1+(w1,.) * N1+(.,w2)/T) / "
    "c(w1) with discount D = 0.75 pinned; the continuation probability "
    "N1+(.,w2)/T (how many distinct contexts a word FOLLOWS, not how "
    "often it occurs) is what lets rare-but-versatile words outscore "
    "frequent-but-bound ones. Emitted for bigrams seen >= 3 times. "
    "Float discipline: every operand is an exact integer-valued double "
    "(counts and 0.75 * integer are exactly representable), the "
    "expression tree is identical on both engines, and each of the "
    "three inexact ops (two divisions, one addition) is IEEE "
    "correctly-rounded — so the 8-dp rounding is cosmetic, not "
    "load-bearing. Scale shape: one corpus explode into three "
    "vocabulary-sized map-side-combinable aggregates; the model tables "
    "join back on the bigram's own keys (the type-count scalar "
    "broadcasts). All state is vocabulary-sized, never corpus-sized.",
)
def q_lm_kneser_ney(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents").select(tx.tokens("text").alias("t"))
    bg = (
        d.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    # The bigram count table feeds FOUR consumers (c1, cb, the type-count
    # scalar, and the final scored join) — materialize the vocabulary-
    # sized frame once so the corpus explode runs once, not four times
    # (the consumed-N-times class the scan-multiplicity audit pins).
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
        .transform(ckpt)
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"), F.count("*").cast("long").alias("nf")
    )
    cb = c2.groupBy("w2").agg(F.count("*").cast("long").alias("nb"))
    tt = c2.agg(F.count("*").cast("long").alias("t_types"))
    p = (
        F.greatest(F.col("c2") - 0.75, F.lit(0.0))
        + ((0.75 * F.col("nf")) * F.col("nb")) / F.col("t_types")
    ) / F.col("c1")
    return (
        c2.filter(F.col("c2") >= 3)
        .join(c1, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tt))
        .select("w1", "w2", "c2", F.round(p, 8).alias("p_kn"))
    )


_BT_HASH = "('0x' || substr(md5('bt:' || o_orderkey::VARCHAR), 1, 15))::BIGINT"


@register(
    "stats_bradley_terry",
    f"""WITH cmp AS (
         SELECT (o_orderkey % 11)::BIGINT AS a,
                (1 + (o_orderkey // 11) % 10)::BIGINT AS b0,
                {_BT_HASH} % 100 AS r
         FROM orders),
       c2 AS (
         SELECT a, CASE WHEN b0 = a THEN 0 ELSE b0 END AS b,
                CASE WHEN r < 50 + 4 * (a - CASE WHEN b0 = a THEN 0 ELSE b0 END)
                     THEN 1 ELSE 0 END AS a_wins
         FROM cmp WHERE a <> CASE WHEN b0 = a THEN 0 ELSE b0 END),
       pairs AS (
         SELECT least(a, b) AS i, greatest(a, b) AS j,
                count(*)::BIGINT AS n_ij,
                sum(CASE WHEN (a < b AND a_wins = 1)
                          OR (a > b AND a_wins = 0) THEN 1 ELSE 0 END)::BIGINT
                  AS wins_i
         FROM c2 GROUP BY 1, 2),
       items AS (
         SELECT i AS item, sum(n_ij)::BIGINT AS n_i, sum(wins_i)::BIGINT AS w_i
         FROM pairs GROUP BY i
         UNION ALL
         SELECT j, sum(n_ij), sum(n_ij - wins_i) FROM pairs GROUP BY j),
       it AS (
         SELECT item, sum(n_i)::BIGINT AS n_i, sum(w_i)::BIGINT AS w_i
         FROM items GROUP BY item),
       s1 AS (SELECT item, n_i, w_i, (2.0 * w_i) / n_i AS s FROM it),
       terms AS (
         SELECT p.i AS item,
                round(p.n_ij / (si.s + sj.s), 12)::DECIMAL(28,12) AS term
         FROM pairs p JOIN s1 si ON si.item = p.i JOIN s1 sj ON sj.item = p.j
         UNION ALL
         SELECT p.j,
                round(p.n_ij / (si.s + sj.s), 12)::DECIMAL(28,12)
         FROM pairs p JOIN s1 si ON si.item = p.i JOIN s1 sj ON sj.item = p.j),
       denom AS (
         SELECT item, sum(term) AS den FROM terms GROUP BY item)
       SELECT s1.item, s1.n_i AS n_comparisons, s1.w_i AS wins,
              round(s1.s, 6) AS strength_mm1,
              round(s1.w_i / CAST(d.den AS DOUBLE), 6) AS strength_mm2
       FROM s1 JOIN denom d ON d.item = s1.item""",
    doc="Bradley-Terry pairwise-strength fit — the model behind every "
    "arena-style preference leaderboard (and the first step of an RLHF "
    "reward-data audit): 11 items, ~15k deterministic synthetic "
    "comparisons whose win probability increases with the strength gap "
    "(so the fit must recover the planted ordering), two unrolled "
    "Zermelo/Hunter MM iterations s_i <- W_i / sum_j n_ij/(s_i + s_j) "
    "from the uniform start. Float discipline: iteration-1 strengths "
    "are single correctly-rounded divisions of exact integers "
    "(cross-engine identical); iteration-2 denominators round each "
    "pair term to 12 dp and sum as DECIMAL so the per-item sum is "
    "order-free; one 6-dp rounding per output. Scale shape: comparisons "
    "reduce to one pairs-table aggregate (items x items, tiny); both MM "
    "steps are joins over that model-sized table — at 100 TB only the "
    "first aggregate touches the comparison log.",
)
def q_stats_bradley_terry(spark: SparkSession, sf: str):
    o = table(spark, sf, "orders").select(
        (F.col("o_orderkey") % 11).cast("long").alias("a"),
        (1 + (F.col("o_orderkey") / 11).cast("long") % 10).cast("long").alias("b0"),
        (
            md5_hash64(
                F.concat(F.lit("bt:"), F.col("o_orderkey").cast("string"))
            )
            % 100
        ).alias("r"),
    )
    c2 = (
        o.withColumn(
            "b", F.when(F.col("b0") == F.col("a"), F.lit(0)).otherwise(F.col("b0"))
        )
        .filter(F.col("a") != F.col("b"))
        .withColumn(
            "a_wins",
            (F.col("r") < 50 + 4 * (F.col("a") - F.col("b"))).cast("int"),
        )
    )
    pairs = (
        c2.select(
            F.least("a", "b").alias("i"),
            F.greatest("a", "b").alias("j"),
            F.when(
                ((F.col("a") < F.col("b")) & (F.col("a_wins") == 1))
                | ((F.col("a") > F.col("b")) & (F.col("a_wins") == 0)),
                1,
            )
            .otherwise(0)
            .alias("win_i"),
        )
        .groupBy("i", "j")
        .agg(
            F.count("*").cast("long").alias("n_ij"),
            F.sum("win_i").cast("long").alias("wins_i"),
        )
        .transform(ckpt)  # model-sized; feeds 4 consumers
    )
    side_i = pairs.select(
        F.col("i").alias("item"), "n_ij", F.col("wins_i").alias("w")
    )
    side_j = pairs.select(
        F.col("j").alias("item"), "n_ij", (F.col("n_ij") - F.col("wins_i")).alias("w")
    )
    it = (
        side_i.unionByName(side_j)
        .groupBy("item")
        .agg(
            F.sum("n_ij").cast("long").alias("n_i"),
            F.sum("w").cast("long").alias("w_i"),
        )
    )
    s1 = it.select(
        "item", "n_i", "w_i", (2.0 * F.col("w_i") / F.col("n_i")).alias("s")
    )
    si = s1.select(F.col("item").alias("i"), F.col("s").alias("s_i"))
    sj = s1.select(F.col("item").alias("j"), F.col("s").alias("s_j"))
    term = F.round(F.col("n_ij") / (F.col("s_i") + F.col("s_j")), 12).cast(
        "decimal(28,12)"
    )
    joined = pairs.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
    terms = joined.select(F.col("i").alias("item"), term.alias("term")).unionByName(
        joined.select(F.col("j").alias("item"), term.alias("term"))
    )
    denom = terms.groupBy("item").agg(F.sum("term").alias("den"))
    return (
        s1.join(denom, "item")
        .select(
            "item",
            F.col("n_i").alias("n_comparisons"),
            F.col("w_i").alias("wins"),
            F.round(F.col("s"), 6).alias("strength_mm1"),
            F.round(F.col("w_i") / F.col("den").cast("double"), 6).alias(
                "strength_mm2"
            ),
        )
    )


@register(
    "sketch_heavy_hitters_certified",
    """WITH s AS (
         SELECT CASE WHEN l_orderkey % 2 = 0 THEN (l_suppkey % 8)::BIGINT
                     ELSE l_suppkey::BIGINT END AS item
         FROM lineitem),
       n AS (SELECT count(*)::BIGINT AS n_total FROM s),
       c AS (SELECT item, count(*)::BIGINT AS exact_n FROM s GROUP BY item)
       SELECT c.item, c.exact_n, n.n_total,
              TRUE AS in_sketch, TRUE AS within_bound
       FROM c, n WHERE c.exact_n * 32 > n.n_total""",
    doc="Misra-Gries heavy-hitters sketch with exact certification — the "
    "frequent-items summary Spark has no built-in for, implemented at "
    "the brief's custom-sketch seam (operators/sketches.py): Arrow-"
    "batched mapInPandas computes a bounded 32-counter MG summary per "
    "batch (O(k) state regardless of stream size), summaries merge with "
    "a relational sum. The stream plants skew (even orderkeys collapse "
    "onto 8 hot supplier buckets, ~1/16 of the stream each; odd keys "
    "spread over the full supplier domain, so evictions are real). "
    "Certified facts are the MG THEOREMS, deterministic under any "
    "stream/batch order — every item with exact frequency > N/32 is "
    "present in the merged sketch, with estimate in [exact - N/32, "
    "exact] — so the exact-SQL oracle (exact counts of the same "
    "guaranteed-frequent set + TRUE flags) pins them without having to "
    "simulate the stream. At 100 TB the summary is counters, never the "
    "corpus; the merge shuffles <= batches x k rows.",
)
def q_sketch_heavy_hitters(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.sketches import (
        misra_gries_summaries,
    )

    s = table(spark, sf, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 2 == 0, (F.col("l_suppkey") % 8).cast("long")
        )
        .otherwise(F.col("l_suppkey").cast("long"))
        .alias("item")
    )
    # The exact-count table is item-domain-sized and feeds BOTH the
    # heavy-hitter filter and the stream-total scalar — materialize it
    # once so the stream is scanned exactly twice (exact + sketch tiers)
    exact = (
        s.groupBy("item")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .transform(ckpt)
    )
    n = exact.agg(F.sum("exact_n").cast("long").alias("n_total"))
    sketch = misra_gries_summaries(s, "item", k=32)
    hh = (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("exact_n") * 32 > F.col("n_total"))
        .join(sketch, "item", "left")
    )
    return hh.select(
        "item",
        "exact_n",
        "n_total",
        F.col("mg_count").isNotNull().alias("in_sketch"),
        (
            F.col("mg_count").isNotNull()
            & (F.col("mg_count") <= F.col("exact_n"))
            & (F.col("exact_n") - F.col("mg_count") <= F.col("n_total") / 32)
        ).alias("within_bound"),
    )


_AB_HASH = "('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT"


@register(
    "stats_ab_test_proportions",
    f"""WITH assign AS (
         SELECT DISTINCT user_id, ({_AB_HASH} % 2)::BIGINT AS variant
         FROM events),
       conv AS (
         SELECT user_id FROM events WHERE event_type = 'purchase'
         GROUP BY user_id HAVING count(*) >= 5),
       cells AS (
         SELECT a.variant,
                count(*)::BIGINT AS n_users,
                sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_converted
         FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
         GROUP BY a.variant),
       w AS (
         SELECT max(CASE WHEN variant = 0 THEN n_users END) AS n0,
                max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
                max(CASE WHEN variant = 1 THEN n_users END) AS n1,
                max(CASE WHEN variant = 1 THEN n_converted END) AS c1
         FROM cells)
       SELECT n0, c0, n1, c1,
              round(c0 * 1.0 / n0, 6) AS p0,
              round(c1 * 1.0 / n1, 6) AS p1,
              round((c1 * 1.0 / n1) - (c0 * 1.0 / n0), 6) AS lift,
              round(CASE WHEN (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1)
                         THEN 0.0
                         ELSE ((c1 * 1.0 / n1) - (c0 * 1.0 / n0))
                              / sqrt((((c0 + c1) * 1.0 / (n0 + n1))
                                      * (1.0 - ((c0 + c1) * 1.0 / (n0 + n1))))
                                     * ((1.0 / n0) + (1.0 / n1))) END, 4)
                AS z_score
       FROM w""",
    doc="Two-proportion A/B test (pooled z-test) over a deterministic "
    "hash split of the user base: users assign to variants by the "
    "portable hash (the same stable-assignment contract as "
    "split_hash_assign — no RNG to reconcile), conversion = any "
    "'purchase' event, and the output is the contingency cells plus "
    "conversion rates, lift, and the pooled z-score — the decision "
    "statistic every experimentation platform computes. Float "
    "discipline: all inputs are exact integer counts and the z "
    "expression tree is shared, so each division/sqrt is IEEE "
    "correctly-rounded identically on both engines; one rounding per "
    "output. Scale shape: two distinct-user aggregates + a user-keyed "
    "left join, then a 2-row pivot — flat at any event volume.",
)
def q_stats_ab_test(spark: SparkSession, sf: str):
    ev = table(spark, sf, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (
            md5_hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
            % 2
        ).cast("long").alias("variant"),
    )
    # conversion = a repeat purchaser (>=5 purchase events): all-but-one
    # user makes SOME purchase in this corpus, which would degenerate the
    # pooled variance to zero — the z-test needs a non-trivial rate
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("_np"))
        .filter(F.col("_np") >= 5)
        .select("user_id")
        .withColumn("_c", F.lit(1))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias(
                "n_converted"
            ),
        )
    )
    w = cells.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0") * 1.0 / F.col("n0")
    p1 = F.col("c1") * 1.0 / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = F.when(
        ((F.col("c0") + F.col("c1")) == 0)
        | ((F.col("c0") + F.col("c1")) == (F.col("n0") + F.col("n1"))),
        F.lit(0.0),
    ).otherwise(
        (p1 - p0)
        / F.sqrt((pp * (1.0 - pp)) * ((1.0 / F.col("n0")) + (1.0 / F.col("n1"))))
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(p1 - p0, 6).alias("lift"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "streaming_heavy_hitters",
    """WITH s AS (
         SELECT CASE WHEN l_orderkey % 2 = 0 THEN (l_suppkey % 8)::BIGINT
                     ELSE l_suppkey::BIGINT END AS item
         FROM lineitem),
       n AS (SELECT count(*)::BIGINT AS n_total FROM s),
       c AS (SELECT item, count(*)::BIGINT AS exact_n FROM s GROUP BY item)
       SELECT c.item, c.exact_n, n.n_total,
              TRUE AS in_sketch, TRUE AS within_bound
       FROM c, n WHERE c.exact_n * 32 > n.n_total""",
    doc="Streaming twin of the Misra-Gries heavy-hitters sketch, run for "
    "real: the planted-skew item stream arrives as micro-batches "
    "(availableNow), foreachBatch computes each batch's bounded "
    "32-counter MG summary and lands it at a BATCH-ID-KEYED path "
    "(idempotent under at-least-once retry — the shard-manifest "
    "discipline), and the final fold is a relational sum of counters. "
    "The MG guarantee is MERGEABLE (per-batch undercounts sum to <= "
    "N/32 total), so the certified facts — every item with exact "
    "frequency > N/32 present, estimate within [exact - N/32, exact] — "
    "hold under ANY micro-batch split, which is exactly what the "
    "certification asserts against the batch oracle. At 100 TB this is "
    "the streaming trending-items pipeline: O(k) state per batch, "
    "counter rows on the wire, never the stream.",
)
def q_streaming_heavy_hitters(spark: SparkSession, sf: str):
    import os
    import shutil
    import tempfile

    from annotations_ingester_spark.operators.sketches import (
        misra_gries_summaries,
    )

    s = table(spark, sf, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 2 == 0, (F.col("l_suppkey") % 8).cast("long")
        )
        .otherwise(F.col("l_suppkey").cast("long"))
        .alias("item")
    )
    run_dir = tempfile.mkdtemp(prefix="spark_graft_shh_")
    try:
        feed_dir = os.path.join(run_dir, "feed")
        store = os.path.join(run_dir, "store")
        s.repartition(8).write.mode("overwrite").parquet(feed_dir)

        def land(batch_df, batch_id):
            misra_gries_summaries(batch_df, "item", k=32).write.mode(
                "overwrite"
            ).parquet(f"{store}/batch={batch_id}")

        stream = (
            spark.readStream.schema(s.schema)
            .option("maxFilesPerTrigger", "3")
            .parquet(feed_dir)
        )
        q = stream.writeStream.foreachBatch(land).trigger(availableNow=True).start()
        q.awaitTermination()
        sketch = (
            spark.read.parquet(store)
            .groupBy("item")
            .agg(F.sum("mg_count").cast("long").alias("mg_count"))
        )
        exact = (
            spark.read.parquet(feed_dir)
            .groupBy("item")
            .agg(F.count("*").cast("long").alias("exact_n"))
            .localCheckpoint(eager=True)
        )
        n = exact.agg(F.sum("exact_n").cast("long").alias("n_total"))
        result = (
            exact.crossJoin(F.broadcast(n))
            .filter(F.col("exact_n") * 32 > F.col("n_total"))
            .join(sketch, "item", "left")
            .select(
                "item",
                "exact_n",
                "n_total",
                F.col("mg_count").isNotNull().alias("in_sketch"),
                (
                    F.col("mg_count").isNotNull()
                    & (F.col("mg_count") <= F.col("exact_n"))
                    & (F.col("exact_n") - F.col("mg_count") <= F.col("n_total") / 32)
                ).alias("within_bound"),
            )
            .localCheckpoint(eager=True)
        )
        return result
    finally:
        # a failed feed write / stream / read must not leak the feed copy
        shutil.rmtree(run_dir, ignore_errors=True)


@register(
    "bpe_learn_two_merges",
    f"""WITH wf AS (
         SELECT u.w, count(*)::BIGINT AS f
         FROM (SELECT unnest({TOKS}) AS w FROM documents) u
         WHERE length(u.w) >= 2 GROUP BY u.w),
       e0 AS (
         SELECT f, regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g')
                  AS enc
         FROM wf),
       p0 AS (
         SELECT f,
                string_split(substr(enc, 2, length(enc) - 2),
                             chr(31) || chr(31)) AS t
         FROM e0),
       pr0 AS (
         SELECT t[i] AS a, t[i + 1] AS b, sum(f)::BIGINT AS merges
         FROM p0, unnest(range(1, len(t))) AS u(i)
         GROUP BY t[i], t[i + 1]),
       m1 AS (SELECT a, b, merges FROM pr0
              ORDER BY merges DESC, a, b LIMIT 1),
       e1 AS (
         SELECT e0.f,
                replace(e0.enc,
                        chr(31) || m1.a || chr(31) || chr(31) || m1.b || chr(31),
                        chr(31) || m1.a || m1.b || chr(31)) AS enc
         FROM e0 CROSS JOIN m1),
       p1 AS (
         SELECT f,
                string_split(substr(enc, 2, length(enc) - 2),
                             chr(31) || chr(31)) AS t
         FROM e1),
       pr1 AS (
         SELECT t[i] AS a, t[i + 1] AS b, sum(f)::BIGINT AS merges
         FROM p1, unnest(range(1, len(t))) AS u(i)
         GROUP BY t[i], t[i + 1]),
       m2 AS (SELECT a, b, merges FROM pr1
              ORDER BY merges DESC, a, b LIMIT 1)
       SELECT 1::BIGINT AS step, a AS pair_a, b AS pair_b, merges FROM m1
       UNION ALL
       SELECT 2::BIGINT, a, b, merges FROM m2""",
    doc="BPE merge LEARNING, two real iterations: the first merge is the "
    "weighted argmax adjacent pair over the vocabulary (what "
    "bpe_pair_merges reports as statistics), then — the part one-shot "
    "statistics cannot do — that merge is APPLIED to every word (the "
    "dynamic sentinel-replace: the learned pair arrives as a 1-row "
    "broadcast, not a compile-time literal) and the pair counts are "
    "recomputed over the updated corpus to learn merge #2, whose count "
    "reflects post-merge adjacency (e.g. ('th','e') only exists after "
    "('t','h')). Deterministic argmax via (count DESC, pair ASC). "
    "Scale shape: everything runs over the VOCABULARY table with corpus "
    "weights carried as counts (the standard BPE-learning trick — "
    "corpus-sized only at the initial token count), one explode + "
    "aggregate per learned merge; a 50k-merge learner is this loop "
    "driven by the driver, each step one tiny argmax broadcast.",
)
def q_bpe_learn_two_merges(spark: SparkSession, sf: str):
    SEP = "\x1f"

    wf = (
        table(spark, sf, "documents")
        .select(F.explode(tx.tokens("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    e0 = wf.select(
        "f", F.regexp_replace("w", "(.)", f"{SEP}$1{SEP}").alias("enc")
    ).transform(ckpt)  # feeds pair count 1 AND the re-encode

    def pair_counts(e):
        # size(t) >= 2 guard (the q_lm_kneser_ney pattern): after merge #1
        # a 2-letter word collapses to ONE token, where sequence(1, 0)
        # counts DOWN and element_at(t, 0) throws — the oracle's
        # range(1, len(t)) yields empty for the same row
        p = e.filter(F.size("t") >= 2).select(
            "f",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS a,"
                    "             element_at(t, i + 1) AS b))"
                )
            ).alias("pr"),
        ).select("f", "pr.a", "pr.b")
        return p.groupBy("a", "b").agg(F.sum("f").cast("long").alias("merges"))

    def with_toks(e):
        return e.withColumn(
            "t",
            F.split(
                F.col("enc").substr(F.lit(2), F.length("enc") - 2),
                f"{SEP}{SEP}",
            ),
        )

    m1 = (
        pair_counts(with_toks(e0))
        .orderBy(F.col("merges").desc(), "a", "b")
        .limit(1)
    )
    e1 = e0.crossJoin(F.broadcast(m1.select("a", "b"))).select(
        "f",
        F.replace(
            F.col("enc"),
            F.concat(
                F.lit(SEP), F.col("a"), F.lit(SEP), F.lit(SEP), F.col("b"),
                F.lit(SEP),
            ),
            F.concat(F.lit(SEP), F.col("a"), F.col("b"), F.lit(SEP)),
        ).alias("enc"),
    )
    m2 = (
        pair_counts(with_toks(e1))
        .orderBy(F.col("merges").desc(), "a", "b")
        .limit(1)
    )
    one = m1.select(
        F.lit(1).cast("long").alias("step"),
        F.col("a").alias("pair_a"),
        F.col("b").alias("pair_b"),
        "merges",
    )
    two = m2.select(
        F.lit(2).cast("long").alias("step"),
        F.col("a").alias("pair_a"),
        F.col("b").alias("pair_b"),
        "merges",
    )
    return one.unionByName(two)


# ---- Round-7 rank-statistics family ------------------------------------------
#
# Two-sample tests (Kolmogorov-Smirnov, Mann-Whitney) and the ROC/AUC rank
# statistic share one ingredient: per distinct value, the sample counts and
# the INCLUSIVE cumulative counts in value order. The distinct-value table
# is bounded by the VALUE DOMAIN (fixed-point cents / e6 scores), not the
# stream, and its cumulative sums use the same two-level distributed prefix
# sum as sinks/sharding.py: in-bucket windows partitioned by an
# order-preserving value bucket, plus a broadcast running offset over the
# tiny bucket-count table (the only unpartitioned window). All rank sums
# are exact integers (doubled average ranks stay integral); the only
# floats are the final shared-expression-tree statistics.

#: order-preserving value-bucket width for the two-level prefix sum —
#: bucket count = value-domain / width, a constant independent of rows
_CDF_BUCKET_WIDTH = 4096


def _two_sample_cdf(df):
    """``(is_a 0/1, v BIGINT)`` stream -> per distinct v: (k1, k2) sample
    counts and (c1, c2) inclusive cumulative counts in v order. The
    reduced per-value frame is localCheckpoint'ed so every downstream
    statistic branch reuses it without re-reading the source scan."""
    from pyspark.sql import Window

    per_v = (
        df.groupBy("v")
        .agg(
            F.sum("is_a").cast("long").alias("k1"),
            F.sum(1 - F.col("is_a")).cast("long").alias("k2"),
        )
        .withColumn("_bucket", F.floor(F.col("v") / _CDF_BUCKET_WIDTH).cast("long"))
        .transform(ckpt)
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = per_v.withColumn("_c1", F.sum("k1").over(w_in)).withColumn(
        "_c2", F.sum("k2").over(w_in)
    )
    counts = per_v.groupBy("_bucket").agg(
        F.sum("k1").alias("_b1"), F.sum("k2").alias("_b2")
    )
    # running offset over the bucket-count aggregate — bounded by the value
    # domain / _CDF_BUCKET_WIDTH, never by the stream (sharding.py pattern)
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_b1").over(w_off), F.lit(0)).cast("long").alias("_o1"),
        F.coalesce(F.sum("_b2").over(w_off), F.lit(0)).cast("long").alias("_o2"),
    )
    # the FINAL frame checkpoints too: KS consumes it twice (totals + the
    # D reduction) — without this the two window stages and the offsets
    # join would re-execute per consumer (the consumed-twice class)
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .select(
            "v",
            "k1",
            "k2",
            (F.col("_o1") + F.col("_c1")).cast("long").alias("c1"),
            (F.col("_o2") + F.col("_c2")).cast("long").alias("c2"),
        )
        .transform(ckpt)
    )


def _cdf_oracle_cte(src: str) -> str:
    """DuckDB twin of :func:`_two_sample_cdf`; ``src`` selects (is_a, v)."""
    return f"""s AS ({src}),
       pv AS (SELECT v, sum(is_a)::BIGINT AS k1, sum(1 - is_a)::BIGINT AS k2
              FROM s GROUP BY v),
       cdf AS (SELECT v, k1, k2,
                      sum(k1) OVER w::BIGINT AS c1,
                      sum(k2) OVER w::BIGINT AS c2
               FROM pv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING))"""


_KS_SRC = (
    "SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a, "
    "round(value * 100)::BIGINT AS v FROM events "
    "WHERE event_type IN ('click', 'purchase')"
)


@register(
    "stats_ks_test",
    f"""WITH {_cdf_oracle_cte(_KS_SRC)},
       t AS (SELECT max(c1) AS n1, max(c2) AS n2 FROM cdf),
       d AS (SELECT t.n1, t.n2,
                    max(abs(c1 * t.n2 - c2 * t.n1))::BIGINT AS d_num
             FROM cdf, t GROUP BY t.n1, t.n2)
       SELECT n1, n2, d_num,
              round(d_num * 1.0 / (n1 * n2), 6) AS d_stat,
              round(sqrt((n1 * 1.0 * n2) / (n1 + n2))
                    * (d_num * 1.0 / (n1 * n2)), 6) AS ks_scaled
       FROM d""",
    doc="Two-sample Kolmogorov-Smirnov test — the distribution-drift gate "
    "every data pipeline runs (did this batch's value distribution shift "
    "vs the reference?): D = max_v |F1(v) - F2(v)| between the click and "
    "purchase value distributions, computed EXACTLY as the integer "
    "max |c1*n2 - c2*n1| over the merged empirical CDFs (no float CDF "
    "subtraction), plus the sqrt(n1*n2/(n1+n2))-scaled statistic the "
    "critical tables use. Values quantize to cents (one pinned rounding); "
    "the CDF table is bounded by the cents domain and prefix-summed with "
    "the two-level bucket pattern (sinks/sharding.py). BIGINT cross "
    "products hold to ~1e9 rows per sample; the DECIMAL(38) swap is the "
    "documented extreme-scale variant.",
)
def q_stats_ks_test(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cdf = _two_sample_cdf(s)
    t = cdf.agg(F.max("c1").alias("n1"), F.max("c2").alias("n2"))
    d = (
        cdf.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
            .cast("long")
            .alias("d_num")
        )
    )
    n1, n2, d_num = F.col("n1"), F.col("n2"), F.col("d_num")
    return d.select(
        "n1",
        "n2",
        "d_num",
        F.round(d_num * 1.0 / (n1 * n2), 6).alias("d_stat"),
        F.round(
            F.sqrt((n1 * 1.0 * n2) / (n1 + n2)) * (d_num * 1.0 / (n1 * n2)), 6
        ).alias("ks_scaled"),
    )


@register(
    "stats_mann_whitney",
    f"""WITH {_cdf_oracle_cte(_KS_SRC)},
       m AS (SELECT
               sum(k1 * (2 * ((c1 - k1) + (c2 - k2)) + (k1 + k2) + 1))::BIGINT
                 AS r1d,
               sum((k1 + k2)::DECIMAL(38,0) * (k1 + k2) * (k1 + k2)
                   - (k1 + k2))::DECIMAL(38,0) AS t_dec,
               max(c1) AS n1, max(c2) AS n2
             FROM cdf),
       u AS (SELECT n1, n2, t_dec::BIGINT AS t_ties,
                    (r1d - n1 * (n1 + 1))::BIGINT AS u1_doubled
             FROM m)
       SELECT n1, n2, u1_doubled, t_ties,
              round(u1_doubled * 1.0 / (n1 * n2) - 1, 6) AS rank_biserial,
              round(CASE WHEN ((n1 * n2) / 12.0)
                              * ((n1 + n2 + 1)
                                 - (t_ties * 1.0
                                    / ((n1 + n2) * (n1 + n2 - 1)))) <= 0
                         THEN 0.0
                         ELSE (u1_doubled - n1 * n2)
                              / (2.0 * sqrt(((n1 * n2) / 12.0)
                                 * ((n1 + n2 + 1)
                                    - (t_ties * 1.0
                                       / ((n1 + n2) * (n1 + n2 - 1))))))
                    END, 4) AS z_score
       FROM u""",
    doc="Mann-Whitney U rank-sum test (the nonparametric two-sample "
    "location test — robust where the t-test's normality assumption "
    "fails): U from the tie-averaged rank sum of the click sample vs the "
    "purchase sample, tie-corrected normal approximation z, and the "
    "rank-biserial effect size. EXACT integer core: doubled average "
    "ranks keep tie midpoints integral (R1*2 = sum k1*(2*cum_before + "
    "k + 1)), the tie term sums k^3 - k per distinct value, and the only "
    "floats are the final shared-expression z/effect computations "
    "(division + one sqrt — IEEE-identical on identical integer "
    "operands). Same bounded-domain CDF + two-level prefix sum as "
    "stats_ks_test; one aggregate over the per-value table, no cross "
    "join (the totals fold into the same reduction).",
)
def q_stats_mann_whitney(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cdf = _two_sample_cdf(s)
    k1, k2, c1, c2 = F.col("k1"), F.col("k2"), F.col("c1"), F.col("c2")
    # the cubic tie term accumulates in DECIMAL(38,0) (the sxx/syy moment
    # discipline): a single distinct value holding k >= 2^21 rows would
    # overflow k^3 in BIGINT silently
    kd = (k1 + k2).cast("decimal(38,0)")
    m = cdf.agg(
        F.sum(k1 * (2 * ((c1 - k1) + (c2 - k2)) + (k1 + k2) + 1))
        .cast("long")
        .alias("r1d"),
        F.sum(kd * (k1 + k2) * (k1 + k2) - (k1 + k2))
        .cast("decimal(38,0)")
        .alias("t_dec"),
        F.max("c1").alias("n1"),
        F.max("c2").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    tt = F.col("t_ties")
    u = m.select(
        "n1", "n2",
        F.col("t_dec").cast("long").alias("t_ties"),
        (F.col("r1d") - n1 * (n1 + 1)).cast("long").alias("u1_doubled"),
    )
    u1d = F.col("u1_doubled")
    sigma2 = ((n1 * n2) / 12.0) * (
        (n1 + n2 + 1) - (tt * 1.0 / ((n1 + n2) * (n1 + n2 - 1)))
    )
    return u.select(
        "n1", "n2", "u1_doubled", "t_ties",
        F.round(u1d * 1.0 / (n1 * n2) - 1, 6).alias("rank_biserial"),
        F.round(
            F.when(sigma2 <= 0, F.lit(0.0)).otherwise(
                (u1d - n1 * n2) / (2.0 * F.sqrt(sigma2))
            ),
            4,
        ).alias("z_score"),
    )


@register(
    "lm_good_turing_counts",
    f"""WITH d AS (SELECT unnest({TOKS}) AS w FROM documents),
       c AS (SELECT w, count(*)::BIGINT AS cnt FROM d GROUP BY w),
       coc AS (SELECT cnt AS r, count(*)::BIGINT AS n_r FROM c GROUP BY cnt)
       SELECT a.r, a.n_r, coalesce(b.n_r, 0)::BIGINT AS n_r1,
              round((a.r + 1) * coalesce(b.n_r, 0) * 1.0 / a.n_r, 6) AS r_star
       FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
       WHERE a.r BETWEEN 1 AND 10""",
    doc="Good-Turing count-of-counts smoothing table (the Katz-backoff "
    "ingredient; the third smoothing surface next to add-one perplexity "
    "and Kneser-Ney): N_r = how many unigram types occur exactly r times, "
    "and the adjusted count r* = (r+1) * N_(r+1) / N_r for r = 1..10 — "
    "the low-count head where GT smoothing actually matters (N_1/N "
    "estimates the unseen mass). Scale shape: one token explode -> "
    "map-side-combinable type counts -> a count-of-counts aggregate "
    "bounded by the max type frequency; the tiny N_r table is "
    "localCheckpoint'ed and self-joined on r+1. Exact integers "
    "throughout; one rounded division per row.",
)
def q_lm_good_turing(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents")
    toks = docs.select(F.explode(tx.tokens("text")).alias("w"))
    c = toks.groupBy("w").agg(F.count("*").cast("long").alias("cnt"))
    coc = (
        c.groupBy(F.col("cnt").alias("r"))
        .agg(F.count("*").cast("long").alias("n_r"))
        .transform(ckpt)
    )
    b = coc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_r1"))
    out = (
        coc.join(b, "r", "left")
        .filter(F.col("r").between(1, 10))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("_n_r1"), F.lit(0)).cast("long").alias("n_r1"),
        )
    )
    return out.select(
        "r",
        "n_r",
        "n_r1",
        F.round(
            (F.col("r") + 1) * F.col("n_r1") * 1.0 / F.col("n_r"), 6
        ).alias("r_star"),
    )


@register(
    "stats_spearman_corr",
    f"""WITH {DAILY_TYPE_COUNTS_CTE},
       vx AS (SELECT x, count(*)::BIGINT AS k,
                     coalesce(sum(count(*)) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       ::BIGINT AS cb
              FROM d GROUP BY x),
       vy AS (SELECT y, count(*)::BIGINT AS k,
                     coalesce(sum(count(*)) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       ::BIGINT AS cb
              FROM d GROUP BY y),
       rk AS (SELECT (2 * vx.cb + vx.k + 1)::BIGINT AS rx2,
                     (2 * vy.cb + vy.k + 1)::BIGINT AS ry2
              FROM d JOIN vx USING (x) JOIN vy USING (y)),
       m AS (SELECT count(*)::BIGINT AS n,
                    sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
                    sum(rx2::DECIMAL(38,0) * rx2)::DECIMAL(38,0) AS sxx,
                    sum(ry2::DECIMAL(38,0) * ry2)::DECIMAL(38,0) AS syy,
                    sum(rx2::DECIMAL(38,0) * ry2)::DECIMAL(38,0) AS sxy
             FROM rk)
       SELECT n,
              round(CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                              * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                              <= 0 THEN 0.0
                    ELSE (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                         / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                                * (n * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE) * sy)) END, 6)
                AS spearman_rho
       FROM m""",
    doc="Spearman rank correlation between the daily click and purchase "
    "volumes — the monotonic-association twin of the Pearson machinery "
    "(robust to nonlinear but monotone coupling and to outlier days): "
    "each day's metrics rank via DOUBLED tie-averaged ranks (2*cum_"
    "before + k + 1 from the per-value count tables — exact integers, "
    "the Mann-Whitney discipline), and rho is Pearson over the doubled "
    "ranks from exact decimal moment sums (doubling cancels). Scale "
    "shape: one map-side-combinable daily rollup (bounded by the date "
    "domain, localCheckpoint'ed), two value-domain count tables with "
    "their cumulative windows, one moments aggregate; the only "
    "unpartitioned windows run over the BOUNDED value-count tables.",
)
def q_stats_spearman(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    d = daily_type_counts(spark, sf)

    def ranks(col: str, out: str):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            d.groupBy(col)
            .agg(F.count("*").cast("long").alias("k"))
            .select(
                col,
                "k",
                F.coalesce(F.sum("k").over(w), F.lit(0)).cast("long").alias("cb"),
            )
            .select(
                col,
                (2 * F.col("cb") + F.col("k") + 1).cast("long").alias(out),
            )
        )

    rk = d.join(ranks("x", "rx2"), "x").join(ranks("y", "ry2"), "y")
    rx_d = F.col("rx2").cast("decimal(38,0)")
    ry_d = F.col("ry2").cast("decimal(38,0)")
    m = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(rx_d * F.col("rx2")).cast("decimal(38,0)").alias("sxx"),
        F.sum(ry_d * F.col("ry2")).cast("decimal(38,0)").alias("syy"),
        F.sum(rx_d * F.col("ry2")).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    dx = n * sxx - sx * F.col("sx")
    dy = n * syy - sy.cast("double") * sy
    num = n * sxy - sx * sy
    return m.select(
        "n",
        F.round(
            F.when(dx * dy <= 0, F.lit(0.0)).otherwise(num / F.sqrt(dx * dy)), 6
        ).alias("spearman_rho"),
    )


@register(
    "stats_cuped_adjustment",
    f"""WITH e AS (
         SELECT user_id, event_type,
                (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                round(value * 100)::BIGINT AS cents
         FROM events),
       b AS (SELECT ((min(day) + max(day)) // 2)::BIGINT AS mid FROM e),
       pu AS (SELECT e.user_id, ({_AB_HASH} % 2)::BIGINT AS variant,
                     sum(CASE WHEN event_type = 'purchase' AND e.day <= b.mid
                              THEN cents ELSE 0 END)::BIGINT AS x,
                     sum(CASE WHEN event_type = 'purchase' AND e.day > b.mid
                              THEN cents ELSE 0 END)::BIGINT AS y
              FROM e, b GROUP BY 1, 2),
       pv AS (SELECT variant, count(*)::BIGINT AS n,
                     sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                     sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxx,
                     sum(x::DECIMAL(38,0) * y)::DECIMAL(38,0) AS sxy
              FROM pu GROUP BY variant),
       g AS (SELECT sum(n)::BIGINT AS gn, sum(sx)::BIGINT AS gx,
                    sum(sy)::BIGINT AS gy,
                    sum(sxx)::DECIMAL(38,0) AS gxx,
                    sum(sxy)::DECIMAL(38,0) AS gxy
             FROM pv),
       th AS (SELECT gn, gx,
                     CASE WHEN gn * CAST(gxx AS DOUBLE)
                               - CAST(gx AS DOUBLE) * gx = 0 THEN 0.0
                          ELSE (gn * CAST(gxy AS DOUBLE)
                                - CAST(gx AS DOUBLE) * gy)
                               / (gn * CAST(gxx AS DOUBLE)
                                  - CAST(gx AS DOUBLE) * gx) END AS theta
             FROM g)
       SELECT pv.variant, pv.n AS n_users,
              round(pv.sy * 1.0 / pv.n, 4) AS mean_y,
              round(pv.sy * 1.0 / pv.n
                    - th.theta * (pv.sx * 1.0 / pv.n
                                  - th.gx * 1.0 / th.gn), 4) AS mean_y_cuped,
              round(th.theta, 6) AS theta
       FROM pv, th""",
    doc="CUPED variance-reduced A/B readout (the industry-standard "
    "pre-experiment covariate adjustment): per hash-assigned variant, "
    "the raw second-half purchase-spend mean and the CUPED-adjusted "
    "mean y - theta*(x - mean(x)), where x is the user's FIRST-half "
    "spend and theta = cov(x,y)/var(x) is fit POOLED across variants "
    "(the unbiased recipe — per-arm thetas leak treatment effect). "
    "EXACT integer core: per-user cents rollups, per-variant "
    "integer/decimal moments, and the pooled moments are SUMS OF THE "
    "2-ROW VARIANT TABLE (no second pass over users); theta and the "
    "adjusted means are shared-tree IEEE divisions, one rounding per "
    "output. Scale shape: one 1-row date-midpoint broadcast, one "
    "user-keyed rollup, one 2-row aggregate — flat in events.",
)
def q_stats_cuped(spark: SparkSession, sf: str):
    ev = events_table(spark, sf).select(
        "user_id",
        "event_type",
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = ev.agg(
        F.expr("CAST((min(day) + max(day)) DIV 2 AS BIGINT)").alias("mid")
    )
    pu = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "user_id",
            (
                md5_hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
                % 2
            ).cast("long").alias("variant"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("day") <= F.col("mid")),
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("day") > F.col("mid")),
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    x_d = F.col("x").cast("decimal(38,0)")
    pv = (
        pu.groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(x_d * F.col("x")).cast("decimal(38,0)").alias("sxx"),
            F.sum(x_d * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        )
        .transform(ckpt)
    )
    g = pv.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("sx").cast("long").alias("gx"),
        F.sum("sy").cast("long").alias("gy"),
        F.sum("sxx").cast("decimal(38,0)").alias("gxx"),
        F.sum("sxy").cast("decimal(38,0)").alias("gxy"),
    )
    gn, gx = F.col("gn"), F.col("gx").cast("double")
    gxx, gxy = F.col("gxx").cast("double"), F.col("gxy").cast("double")
    th = g.select(
        "gn",
        "gx",
        F.when(gn * gxx - gx * F.col("gx") == 0, F.lit(0.0))
        .otherwise((gn * gxy - gx * F.col("gy")) / (gn * gxx - gx * F.col("gx")))
        .alias("theta"),
    )
    j = pv.crossJoin(F.broadcast(th))
    return j.select(
        "variant",
        F.col("n").alias("n_users"),
        F.round(F.col("sy") * 1.0 / F.col("n"), 4).alias("mean_y"),
        F.round(
            F.col("sy") * 1.0 / F.col("n")
            - F.col("theta")
            * (F.col("sx") * 1.0 / F.col("n") - F.col("gx") * 1.0 / F.col("gn")),
            4,
        ).alias("mean_y_cuped"),
        F.round(F.col("theta"), 6).alias("theta"),
    )


def _pmi_oracle() -> str:
    from annotations_ingester_spark.functions.text import word_shingles_sql

    bg = word_shingles_sql("text", 2)
    return f"""WITH uni AS (
         SELECT w, count(*)::BIGINT AS c FROM
           (SELECT unnest({TOKS}) AS w FROM documents) GROUP BY w),
       bgx AS (SELECT g, count(*)::BIGINT AS c_ab FROM
           (SELECT unnest({bg}) AS g FROM documents) GROUP BY g),
       tot AS (SELECT (SELECT sum(c) FROM uni)::BIGINT AS n,
                      (SELECT sum(c_ab) FROM bgx)::BIGINT AS nb),
       p AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
                    c_ab FROM bgx WHERE c_ab >= 5),
       j AS (SELECT p.w1, p.w2, p.c_ab, a.c AS c_a, b.c AS c_b, t.n, t.nb
             FROM p JOIN uni a ON a.w = p.w1 JOIN uni b ON b.w = p.w2
             CROSS JOIN tot t)
       SELECT w1, w2, c_ab, c_a, c_b,
              round(log2((c_ab * 1.0 / nb)
                         / ((c_a * 1.0 / n) * (c_b * 1.0 / n))), 6) AS pmi
       FROM j
       WHERE log2((c_ab * 1.0 / nb)
                  / ((c_a * 1.0 / n) * (c_b * 1.0 / n))) >= 0.3"""


@register(
    "collocation_pmi_pairs",
    None,  # oracle assembled below (shares the word-shingle SQL helper)
    doc="Pointwise-mutual-information collocations — the phrase-mining "
    "primitive (which adjacent word pairs co-occur far above chance: "
    "named entities, terms of art — the candidates a tokenizer or "
    "vocab builder should keep intact): PMI = log2(p(ab)/(p(a)p(b))) "
    "over adjacent token bigrams, emitted for pairs with count >= 5 "
    "and PMI >= 0.3 (both pinned; the synthetic corpus is near-uniform "
    "random vocabulary, so its PMI ceiling sits far below natural "
    "text's — the cutoff is chosen to exercise the filter at every "
    "SF). Counts are exact corpus aggregates "
    "(the unigram and bigram count tables are vocabulary-bounded and "
    "localCheckpoint'ed — each feeds two consumers without re-reading "
    "the corpus); the filter and output share one expression tree "
    "(log2 + IEEE divisions, the lm_perplexity discipline), one "
    "rounding per row. Scale shape: two explode aggregates with "
    "map-side combine, a bigram->unigram equi-join (zipfian -> AQE), "
    "and a 1-row totals broadcast.",
)
def q_collocation_pmi(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.text import word_shingles

    docs = table(spark, sf, "documents")
    uni = (
        docs.select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .transform(ckpt)
    )
    bgx = (
        docs.select(F.explode(word_shingles("text", 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .transform(ckpt)
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n")).crossJoin(
        bgx.agg(F.sum("c_ab").cast("long").alias("nb"))
    )
    p = bgx.filter(F.col("c_ab") >= 5).select(
        F.expr("split_part(g, ' ', 1)").alias("w1"),
        F.expr("split_part(g, ' ', 2)").alias("w2"),
        "c_ab",
    )
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    j = p.join(a, "w1").join(b, "w2").crossJoin(F.broadcast(tot))
    pmi = F.log2(
        (F.col("c_ab") * 1.0 / F.col("nb"))
        / ((F.col("c_a") * 1.0 / F.col("n")) * (F.col("c_b") * 1.0 / F.col("n")))
    )
    return j.filter(pmi >= 0.3).select(
        "w1", "w2", "c_ab", "c_a", "c_b", F.round(pmi, 6).alias("pmi")
    )


from annotations_ingester_spark.plans.catalog import REGISTRY as _REG_S  # noqa: E402

_REG_S["collocation_pmi_pairs"].oracle = _pmi_oracle()


@register(
    "stats_benford_first_digit",
    """WITH c AS (
         SELECT round(o_totalprice * 100)::BIGINT AS cents FROM orders
         WHERE round(o_totalprice * 100) >= 1),
       o AS (SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit,
                    count(*)::BIGINT AS n_obs
             FROM c GROUP BY 1),
       t AS (SELECT sum(n_obs)::BIGINT AS n FROM o)
       SELECT o.digit, o.n_obs,
              round(t.n * log10(1.0 + 1.0 / o.digit), 4) AS expected_n,
              round((o.n_obs - t.n * log10(1.0 + 1.0 / o.digit))
                    * (o.n_obs - t.n * log10(1.0 + 1.0 / o.digit))
                    / (t.n * log10(1.0 + 1.0 / o.digit)), 6)
                AS chi2_contribution
       FROM o, t""",
    doc="Benford first-digit audit — the classic fabricated-data / "
    "corrupted-feed screen every financial-quality pipeline runs: the "
    "observed first-significant-digit distribution of order totals vs "
    "the Benford expectation p(d) = log10(1 + 1/d), with per-digit "
    "chi-square contributions (sum them for the 8-dof statistic). The "
    "digit extracts from the INTEGER cents string (no float log "
    "tricks on the extraction path — exact and locale-free); expected "
    "counts and contributions are one shared log10/division tree "
    "(IEEE-identical), one rounding per output. Scale shape: one "
    "scan-fused 9-row aggregate + a 1-row total broadcast. (TPC-H "
    "prices are uniform-ish, not Benford — the audit's point is the "
    "COMPARISON, and the synthetic corpus deliberately fails it.)",
)
def q_stats_benford(spark: SparkSession, sf: str):
    # guard on the QUANTIZED value: a sub-cent price rounds to cents = 0,
    # whose "first digit" 0 would divide by log10(1 + 1/0)
    c = (
        table(spark, sf, "orders")
        .filter(F.round(F.col("o_totalprice") * 100) >= 1)
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    )
    o = (
        c.select(
            F.expr("CAST(substr(CAST(cents AS STRING), 1, 1) AS BIGINT)").alias(
                "digit"
            )
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
        .transform(ckpt)
    )
    t = o.agg(F.sum("n_obs").cast("long").alias("n"))
    j = o.crossJoin(F.broadcast(t))
    exp_n = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    return j.select(
        "digit",
        "n_obs",
        F.round(exp_n, 4).alias("expected_n"),
        F.round(
            (F.col("n_obs") - exp_n) * (F.col("n_obs") - exp_n) / exp_n, 6
        ).alias("chi2_contribution"),
    )


@register(
    "lm_oov_rate_by_vocab_size",
    f"""WITH u AS (SELECT w, count(*)::BIGINT AS c FROM
           (SELECT unnest({TOKS}) AS w FROM documents) GROUP BY w),
       r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
             FROM u),
       k AS (SELECT unnest([100, 500, 1000])::BIGINT AS k)
       SELECT k.k AS vocab_size,
              sum(CASE WHEN r.rk <= k.k THEN r.c ELSE 0 END)::BIGINT
                AS covered_tokens,
              sum(r.c)::BIGINT AS total_tokens,
              round(1.0 - sum(CASE WHEN r.rk <= k.k THEN r.c ELSE 0 END)
                          * 1.0 / sum(r.c), 6) AS oov_rate
       FROM r CROSS JOIN k GROUP BY k.k""",
    doc="Out-of-vocabulary rate curve by vocabulary budget — the "
    "tokenizer-sizing decision table (how much of the token stream does "
    "a top-k vocab cover at k = 100/500/1000?): types rank by frequency "
    "with a deterministic term tiebreak, and each budget row reports "
    "covered vs total token OCCURRENCES (occurrence mass, not type "
    "count — the quantity that drives UNK rates). Exact integer counts; "
    "one rounded division per row. Scale shape: one token explode into "
    "a map-side-combinable type-count aggregate; the rank window runs "
    "over the VOCABULARY table (bounded by distinct types — the "
    "ssjoin/Zipf allowlist class), then a 3-row budget broadcast "
    "fans the one-pass conditional sums.",
)
def q_lm_oov_rate(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    u = (
        table(spark, sf, "documents")
        .select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    r = u.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))).alias("rk"),
    )
    k = spark.createDataFrame([(100,), (500,), (1000,)], "k long")
    j = r.crossJoin(F.broadcast(k))
    covered = F.sum(F.when(F.col("rk") <= F.col("k"), F.col("c")).otherwise(0))
    return j.groupBy(F.col("k").alias("vocab_size")).agg(
        covered.cast("long").alias("covered_tokens"),
        F.sum("c").cast("long").alias("total_tokens"),
        F.round(1.0 - covered * 1.0 / F.sum("c"), 6).alias("oov_rate"),
    )


# ---- round-8 statistics additions ------------------------------------------
# Welch's t-test, the distributed Poisson bootstrap, Gini concentration,
# and difference-in-differences: the experiment-analysis quartet that
# complements the existing AB-proportions/CUPED/Mann-Whitney family with
# unequal-variance means testing, a resampling CI that never materializes
# a resample, and the causal-effect panel estimator.


@register(
    "stats_welch_ttest",
    """WITH c AS (
         SELECT event_type, round(value * 100)::BIGINT AS cents FROM events
         WHERE event_type IN ('click', 'view')),
       m AS (SELECT event_type, count(*)::BIGINT AS n,
                    sum(cents)::BIGINT AS s,
                    sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS q
             FROM c GROUP BY event_type),
       w AS (SELECT
               max(CASE WHEN event_type = 'click' THEN n END)::BIGINT AS n1,
               max(CASE WHEN event_type = 'view' THEN n END)::BIGINT AS n2,
               max(CASE WHEN event_type = 'click' THEN s END)::BIGINT AS s1,
               max(CASE WHEN event_type = 'view' THEN s END)::BIGINT AS s2,
               max(CASE WHEN event_type = 'click' THEN q END) AS q1,
               max(CASE WHEN event_type = 'view' THEN q END) AS q2
             FROM m),
       v AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / n1 AS m1,
                    CAST(s2 AS DOUBLE) / n2 AS m2,
                    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      / (n1 - 1) AS v1,
                    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                      / (n2 - 1) AS v2
             FROM w)
       SELECT n1, n2, round(m1, 6) AS mean1_cents, round(m2, 6) AS mean2_cents,
              round(v1, 4) AS var1, round(v2, 4) AS var2,
              round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
              round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                    / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                       + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS welch_df
       FROM v""",
    doc="Welch's unequal-variance two-sample t-test (click vs view event "
    "value): group moments come from exact integer/decimal sums "
    "(Σcents BIGINT, Σcents² DECIMAL(38,0) — never a float variance "
    "over raw doubles), so mean/variance/t/df are one shared IEEE "
    "expression tree over exact inputs, rounded once each. The "
    "Welch-Satterthwaite df is the output a reader joins to a t-table. "
    "Scale shape: one scan-fused 2-group aggregate (map-side "
    "combinable), then 1-row arithmetic — no shuffle beyond the "
    "2-group exchange.",
)
def q_stats_welch_ttest(spark: SparkSession, sf: str):
    c = (
        events_table(spark, sf)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
    )
    m = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    )
    pick = lambda t, col: F.max(F.when(F.col("event_type") == t, F.col(col)))  # noqa: E731
    w = m.agg(
        pick("click", "n").cast("long").alias("n1"),
        pick("view", "n").cast("long").alias("n2"),
        pick("click", "s").cast("long").alias("s1"),
        pick("view", "s").cast("long").alias("s2"),
        pick("click", "q").alias("q1"),
        pick("view", "q").alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / n1) / (
        n1 - 1
    )
    v2 = (F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2") / n2) / (
        n2 - 1
    )
    se2 = v1 / n1 + v2 / n2
    return w.select(
        "n1",
        "n2",
        F.round(m1, 6).alias("mean1_cents"),
        F.round(m2, 6).alias("mean2_cents"),
        F.round(v1, 4).alias("var1"),
        F.round(v2, 4).alias("var2"),
        F.round((m1 - m2) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)),
            2,
        ).alias("welch_df"),
    )


# Poisson(1) CDF thresholds (inverse-CDF bootstrap weights; see the
# stats_bootstrap_poisson_ci docstring). Shared double literals — both
# engines compare the same IEEE constants.
_POIS_T = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)
_BOOT_B = 100  # replicates; CI picks order stats 3 (2.5%) and 98 (97.5%)
_U_DENOM = float(1 << 60)  # md5_hash64 is uniform on [0, 2^60)


def _boot_w_sql(u: str) -> str:
    t = _POIS_T
    return (
        f"CASE WHEN {u} < {t[0]!r} THEN 0 WHEN {u} < {t[1]!r} THEN 1 "
        f"WHEN {u} < {t[2]!r} THEN 2 WHEN {u} < {t[3]!r} THEN 3 "
        f"WHEN {u} < {t[4]!r} THEN 4 ELSE 5 END"
    )


from annotations_ingester_spark.functions.hashing import md5_hash64_sql  # noqa: E402

# Per-replicate 60-bit hashes h_b = md5_hash64(str(b)), precomputed once
# (they are pinned by B) and xor-combined with the per-EVENT hash h_0 =
# md5_hash64(event_id): u_eb = xor(h_0, h_b) / 2^60. XOR with a constant
# permutes the uniform 60-bit space, so each replicate sees an
# independent-looking uniform — the SIG_CTE minhash trick. This replaces
# the original per-(event, replicate) seeded md5 (B x N hash evaluations,
# the whole query's cost at 11 s/sf0.1) with N + B hashes; measured
# 11.0 s -> ~2 s at sf0.1 with identical structure.
import hashlib  # noqa: E402

_BOOT_HB = tuple(
    int(hashlib.md5(str(b).encode()).hexdigest()[:15], 16) for b in range(_BOOT_B)
)
_BOOT_R_VALUES = ", ".join(f"({b}, {h})" for b, h in enumerate(_BOOT_HB))
_BOOT_U = f"(CAST(xor(h0, hb) AS DOUBLE) / {_U_DENOM!r})"


@register(
    "stats_bootstrap_poisson_ci",
    f"""WITH c AS (
         SELECT {md5_hash64_sql('event_id::VARCHAR')} AS h0,
                round(value * 100)::BIGINT AS cents FROM events),
       r AS (SELECT * FROM (VALUES {_BOOT_R_VALUES}) t(b, hb)),
       x AS (SELECT c.cents, r.b, {_BOOT_U} AS u FROM c CROSS JOIN r),
       w AS (SELECT b, cents, {_boot_w_sql('u')} AS wgt FROM x),
       rep AS (SELECT b, sum(wgt)::BIGINT AS sw,
                      sum(wgt::BIGINT * cents)::BIGINT AS swc
               FROM w GROUP BY b),
       mb AS (SELECT b, round(CAST(swc AS DOUBLE) / sw, 6) AS mean_b,
                     row_number() OVER (
                       ORDER BY round(CAST(swc AS DOUBLE) / sw, 6), b) AS rn
              FROM rep),
       pt AS (SELECT count(*)::BIGINT AS n_events,
                     round(CAST(sum(cents) AS DOUBLE) / count(*), 6)
                       AS point_mean
              FROM c)
       SELECT pt.n_events, {_BOOT_B}::BIGINT AS n_replicates,
              pt.point_mean AS point_mean_cents,
              max(CASE WHEN rn = 3 THEN mean_b END) AS ci_lo_cents,
              max(CASE WHEN rn = {_BOOT_B - 2} THEN mean_b END) AS ci_hi_cents
       FROM mb, pt GROUP BY pt.n_events, pt.point_mean""",
    doc="Distributed Poisson bootstrap 95% CI for the mean event value — "
    "the resampling scheme that actually scales (Poisson(1) weights "
    "approximate multinomial resampling without ever materializing a "
    "resample or needing the global n up front; the practical method "
    "for CIs over sharded data). Replicate b draws each row "
    "w ~ Poisson(1) times via the inverse CDF on a SEEDED PORTABLE "
    "hash-uniform u = xor(md5(event_id), md5(b))/2^60 (one md5 per "
    "EVENT plus B pinned replicate hashes, xor-permuted per replicate — "
    "the minhash seeding trick; never B x N hash evaluations) — "
    "deterministic, "
    "engine-replayable, no RNG state. Replicate sums Σw and Σw·cents "
    "are exact integers, so each replicate mean is one rounded "
    "division; the CI takes exact order statistics 3/98 of the 100 "
    "replicate means (window over the 100-row replicate table — "
    "bounded by B, the offset-table class). Scale shape: the ×B "
    "explode feeds a map-side-combinable B-group aggregate (state = B "
    "rows per task), plus one scan-fused point-estimate pass; two "
    "column-pruned scans total, no join against data.",
)
def q_stats_bootstrap_ci(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = events_table(spark, sf).select(
        md5_hash64(F.col("event_id").cast("string")).alias("h0"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    reps = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.lit(h).alias("hb"))
            for b, h in enumerate(_BOOT_HB)
        ]
    )
    x = c.select(
        "cents", "h0", F.explode(reps).alias("r")
    ).select("cents", F.col("r.b").alias("b"), F.col("h0").bitwiseXOR(F.col("r.hb")).alias("hx"))
    u = F.col("hx").cast("double") / F.lit(_U_DENOM)
    t = _POIS_T
    wgt = (
        F.when(u < t[0], 0)
        .when(u < t[1], 1)
        .when(u < t[2], 2)
        .when(u < t[3], 3)
        .when(u < t[4], 4)
        .otherwise(5)
    )
    rep = (
        x.select("b", "cents", wgt.alias("wgt"))
        .groupBy("b")
        .agg(
            F.sum("wgt").cast("long").alias("sw"),
            F.sum(F.col("wgt").cast("long") * F.col("cents")).cast("long").alias("swc"),
        )
    )
    mean_b = F.round(F.col("swc").cast("double") / F.col("sw"), 6)
    # window over the B-row replicate table (bounded by B, offset-table class)
    mb = rep.select(
        "b", mean_b.alias("mean_b"),
        F.row_number().over(Window.orderBy(mean_b, F.col("b"))).alias("rn"),
    )
    pt = c.agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("cents").cast("double") / F.count("*"), 6).alias("point_mean"),
    )
    ci = mb.agg(
        F.max(F.when(F.col("rn") == 3, F.col("mean_b"))).alias("ci_lo_cents"),
        F.max(F.when(F.col("rn") == _BOOT_B - 2, F.col("mean_b"))).alias(
            "ci_hi_cents"
        ),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_events",
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        F.col("point_mean").alias("point_mean_cents"),
        "ci_lo_cents",
        "ci_hi_cents",
    )


@register(
    "stats_gini_lorenz",
    """WITH c AS (
         SELECT o_custkey, sum(round(o_totalprice * 100))::BIGINT AS rev
         FROM orders GROUP BY o_custkey),
       b AS (SELECT o_custkey, rev, (rev // 1048576)::BIGINT AS bkt FROM c),
       ranked AS (
         SELECT rev, bkt,
                row_number() OVER (PARTITION BY bkt
                                   ORDER BY rev, o_custkey) AS rk_in
         FROM b),
       bc AS (SELECT bkt, count(*)::BIGINT AS cnt FROM b GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(cnt) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       g AS (SELECT (f.o + r.rk_in)::BIGINT AS rk, r.rev
             FROM ranked r JOIN off f USING (bkt)),
       m AS (SELECT count(*)::BIGINT AS n, sum(rev)::BIGINT AS total,
                    sum(rk::DECIMAL(38,0) * rev)::DECIMAL(38,0) AS s
             FROM g)
       SELECT n AS n_customers, total AS total_cents,
              round((2 * CAST(s AS DOUBLE) - (n + 1) * CAST(total AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS gini
       FROM m""",
    doc="Gini coefficient of customer revenue concentration — the scalar "
    "summary under the Pareto/ABC classification (0 = perfectly even, "
    "→1 = one customer is the book): G = (2·Σ i·x_i − (n+1)·Σx) / "
    "(n·Σx) over revenues sorted ASCENDING with a deterministic "
    "custkey tiebreak. The global rank i is the ascending twin of the "
    "orders_pareto_abc machinery — the two-level distributed prefix "
    "rank over order-preserving 2^20-cent revenue buckets (in-bucket "
    "row_number windows partitioned by bucket + a broadcast cumulative "
    "count over the tiny bucket table; never a global unpartitioned "
    "window over customers). Σ i·x_i accumulates as DECIMAL(38,0) — "
    "exact under any order — and the final formula is one shared IEEE "
    "tree rounded once. Scale shape: one map-side-combinable "
    "per-customer rollup, bounded-domain windows, 1-row output.",
)
def q_stats_gini(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("rev"))
        .withColumn("bkt", F.expr("CAST(rev DIV 1048576 AS BIGINT)"))
        .transform(ckpt)
    )
    w_in = Window.partitionBy("bkt").orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = c.select("rev", "bkt", F.row_number().over(w_in).alias("rk_in"))
    bc = c.groupBy("bkt").agg(F.count("*").cast("long").alias("cnt"))
    w_off = Window.orderBy(F.asc("bkt")).rowsBetween(Window.unboundedPreceding, -1)
    off = bc.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).cast("long").alias("o")
    )
    g = ranked.join(F.broadcast(off), "bkt").select(
        (F.col("o") + F.col("rk_in")).cast("long").alias("rk"), "rev"
    )
    m = g.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rev").cast("long").alias("total"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("rev")).alias("s"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        F.round(
            (2 * F.col("s").cast("double") - (F.col("n") + 1) * F.col("total").cast("double"))
            / (F.col("n").cast("double") * F.col("total").cast("double")),
            6,
        ).alias("gini"),
    )


@register(
    "stats_diff_in_diff",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                user_id, round(value * 100)::BIGINT AS cents
         FROM events),
       p AS (SELECT ((min(day) + max(day) + 1) // 2)::BIGINT AS piv FROM e),
       t AS (SELECT e.cents,
                    e.day >= p.piv AS post,
                    {md5_hash64_sql("user_id::VARCHAR")} % 2 = 0 AS treat
             FROM e, p),
       m AS (SELECT treat, post, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
             FROM t GROUP BY treat, post),
       w AS (SELECT
               max(CASE WHEN treat AND post
                        THEN round(CAST(s AS DOUBLE) / n, 6) END) AS m_t_post,
               max(CASE WHEN treat AND NOT post
                        THEN round(CAST(s AS DOUBLE) / n, 6) END) AS m_t_pre,
               max(CASE WHEN NOT treat AND post
                        THEN round(CAST(s AS DOUBLE) / n, 6) END) AS m_c_post,
               max(CASE WHEN NOT treat AND NOT post
                        THEN round(CAST(s AS DOUBLE) / n, 6) END) AS m_c_pre,
               max(CASE WHEN treat AND post THEN n END)::BIGINT AS n_t_post,
               max(CASE WHEN treat AND NOT post THEN n END)::BIGINT AS n_t_pre,
               max(CASE WHEN NOT treat AND post THEN n END)::BIGINT AS n_c_post,
               max(CASE WHEN NOT treat AND NOT post THEN n END)::BIGINT
                 AS n_c_pre,
               max(p2.piv)::BIGINT AS pivot_day
             FROM m, (SELECT piv FROM p) p2)
       SELECT pivot_day, n_t_pre, n_t_post, n_c_pre, n_c_post,
              m_t_pre AS mean_t_pre, m_t_post AS mean_t_post,
              m_c_pre AS mean_c_pre, m_c_post AS mean_c_post,
              round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)
                AS did_cents
       FROM w""",
    doc="Difference-in-differences panel estimator over the event stream: "
    "users split into pseudo-treatment/control arms by the PORTABLE "
    "md5 user hash (deterministic, engine-replayable — the same "
    "assignment discipline as split_hash_assign), the period pivots at "
    "the data midpoint day (1-row broadcast), and the effect is "
    "(treat_post − treat_pre) − (control_post − control_pre) over "
    "per-cell means from exact integer sums — each mean rounds once "
    "before the subtraction tree, so both engines subtract identical "
    "doubles. On hash-split synthetic arms the true effect is ~0 — the "
    "query is the estimator's A/A calibration harness. Scale shape: "
    "one scan-fused 4-cell aggregate (map-side combinable) + a 1-row "
    "pivot broadcast; no shuffle beyond the 4-group exchange.",
)
def q_stats_did(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = e.agg(
        F.expr("CAST((min(day) + max(day) + 1) DIV 2 AS BIGINT)").alias("pivot")
    )
    t = e.crossJoin(F.broadcast(p)).select(
        "cents",
        (F.col("day") >= F.col("pivot")).alias("post"),
        (md5_hash64(F.col("user_id").cast("string")) % 2 == 0).alias("treat"),
        "pivot",
    )
    m = t.groupBy("treat", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.max("pivot").alias("pivot"),
    )
    mean6 = F.round(F.col("s").cast("double") / F.col("n"), 6)

    def cell(tr: bool, po: bool, expr):
        cond = (F.col("treat") == tr) & (F.col("post") == po)
        return F.max(F.when(cond, expr))

    w = m.agg(
        cell(True, True, mean6).alias("m_t_post"),
        cell(True, False, mean6).alias("m_t_pre"),
        cell(False, True, mean6).alias("m_c_post"),
        cell(False, False, mean6).alias("m_c_pre"),
        cell(True, True, F.col("n")).cast("long").alias("n_t_post"),
        cell(True, False, F.col("n")).cast("long").alias("n_t_pre"),
        cell(False, True, F.col("n")).cast("long").alias("n_c_post"),
        cell(False, False, F.col("n")).cast("long").alias("n_c_pre"),
        F.max("pivot").cast("long").alias("pivot_day"),
    )
    return w.select(
        "pivot_day",
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        F.col("m_t_pre").alias("mean_t_pre"),
        F.col("m_t_post").alias("mean_t_post"),
        F.col("m_c_pre").alias("mean_c_pre"),
        F.col("m_c_post").alias("mean_c_post"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            6,
        ).alias("did_cents"),
    )


@register(
    "stats_weighted_median",
    """WITH c AS (
         SELECT round(l_extendedprice * 100)::BIGINT AS cents,
                sum(l_quantity)::BIGINT AS w
         FROM lineitem GROUP BY cents),
       b AS (SELECT cents, w, (cents // 1048576)::BIGINT AS bkt FROM c),
       ranked AS (
         SELECT cents, w, bkt,
                sum(w) OVER (PARTITION BY bkt ORDER BY cents
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cw_in
         FROM b),
       bc AS (SELECT bkt, sum(w)::BIGINT AS bw FROM b GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(bw) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       g AS (SELECT r.cents, (f.o + r.cw_in)::BIGINT AS cw
             FROM ranked r JOIN off f USING (bkt)),
       tot AS (SELECT sum(w)::BIGINT AS tw FROM c)
       SELECT t.tw AS total_weight,
              min(CASE WHEN 4 * g.cw >= t.tw THEN g.cents END)::BIGINT
                AS wq25_cents,
              min(CASE WHEN 2 * g.cw >= t.tw THEN g.cents END)::BIGINT
                AS wmedian_cents,
              min(CASE WHEN 4 * g.cw >= 3 * t.tw THEN g.cents END)::BIGINT
                AS wq75_cents
       FROM g, tot t GROUP BY t.tw""",
    doc="Exact weighted quantiles (quantity-weighted price p25/median/"
    "p75): the lower weighted quantile — the smallest price whose "
    "cumulative weight reaches q·W — computed via the two-level "
    "distributed prefix sum over DISTINCT price points (per-price "
    "weight rollup collapses duplicates first; in-bucket cumulative "
    "windows partitioned by 2^20-cent bucket + a cumulated offset over "
    "the tiny bucket table — never a global unpartitioned window over "
    "prices). All comparisons are integer cross-multiplications "
    "(4·cum ≥ 3·W), no float thresholds anywhere. The percentile_approx "
    "sketch answers this at lower cost when tolerance allows "
    "(quantile_disc_certified certifies that trade); this is the exact "
    "tier for the WEIGHTED case, which the sketch does not cover. "
    "Scale shape: one map-side-combinable price rollup, bounded-domain "
    "windows, one 1-row total broadcast, 1-row output.",
)
def q_stats_weighted_median(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = (
        table(spark, sf, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("cents")
        .agg(F.sum("w").cast("long").alias("w"))
        .withColumn("bkt", F.expr("CAST(cents DIV 1048576 AS BIGINT)"))
        .transform(ckpt)
    )
    w_in = Window.partitionBy("bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = c.select(
        "cents", "bkt", F.sum("w").over(w_in).cast("long").alias("cw_in")
    )
    bc = c.groupBy("bkt").agg(F.sum("w").cast("long").alias("bw"))
    w_off = Window.orderBy(F.asc("bkt")).rowsBetween(Window.unboundedPreceding, -1)
    off = bc.select(
        "bkt", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).cast("long").alias("o")
    )
    g = ranked.join(F.broadcast(off), "bkt").select(
        "cents", (F.col("o") + F.col("cw_in")).cast("long").alias("cw")
    )
    tot = c.agg(F.sum("w").cast("long").alias("tw"))
    pick = lambda cond: F.min(F.when(cond, F.col("cents"))).cast("long")  # noqa: E731
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("tw")
        .agg(
            pick(4 * F.col("cw") >= F.col("tw")).alias("wq25_cents"),
            pick(2 * F.col("cw") >= F.col("tw")).alias("wmedian_cents"),
            pick(4 * F.col("cw") >= 3 * F.col("tw")).alias("wq75_cents"),
        )
        .select(
            F.col("tw").alias("total_weight"),
            "wq25_cents",
            "wmedian_cents",
            "wq75_cents",
        )
    )


@register(
    "stats_ipw_estimate",
    f"""WITH e AS (
         SELECT event_type AS stratum,
                {md5_hash64_sql("'ipw:' || user_id::VARCHAR")} % 2 = 0 AS treat,
                round(value * 100)::BIGINT AS cents
         FROM events),
       s AS (SELECT stratum, count(*)::BIGINT AS n,
                    sum(CASE WHEN treat THEN 1 ELSE 0 END)::BIGINT AS n1,
                    sum(CASE WHEN treat THEN cents ELSE 0 END)::BIGINT AS s1,
                    sum(CASE WHEN NOT treat THEN 1 ELSE 0 END)::BIGINT AS n0,
                    sum(CASE WHEN NOT treat THEN cents ELSE 0 END)::BIGINT
                      AS s0
             FROM e GROUP BY stratum),
       pos AS (SELECT * FROM s WHERE n1 > 0 AND n0 > 0),
       agg AS (SELECT count(*)::BIGINT AS n_strata, sum(n)::BIGINT AS n_all,
                      sum(n1)::BIGINT AS n_treat, sum(n0)::BIGINT AS n_control,
                      sum(round(CAST(s1 AS DOUBLE) * n / n1, 9)
                          ::DECIMAL(25,9)) AS t1,
                      sum(round(CAST(s0 AS DOUBLE) * n / n0, 9)
                          ::DECIMAL(25,9)) AS t0
               FROM pos)
       SELECT n_strata, n_treat, n_control,
              round(CAST(t1 AS DOUBLE) / n_all, 6) AS mu_treat_cents,
              round(CAST(t0 AS DOUBLE) / n_all, 6) AS mu_control_cents,
              round(CAST(t1 AS DOUBLE) / n_all
                    - CAST(t0 AS DOUBLE) / n_all, 6) AS ate_cents
       FROM agg""",
    doc="Inverse-propensity-weighted treatment-effect estimate with "
    "exact stratum propensities (e_s = treated share within each "
    "event-type stratum; arms assigned by the salted PORTABLE md5 user "
    "hash, so this is the estimator's A/A calibration — true effect "
    "~0). With stratum-constant propensity the Horvitz-Thompson sums "
    "collapse algebraically: Σ T·y/e_s = Σ_s s1_s·n_s/n1_s, so each "
    "stratum contributes ONE term computed from exact integer moments, "
    "rounded to 9 dp and accumulated as DECIMAL(25,9) (order-exact); "
    "strata missing either arm are excluded (the positivity rule, "
    "reported via n_strata). Scale shape: one scan-fused "
    "stratum-domain-bounded aggregate, then 1-row arithmetic.",
)
def q_stats_ipw(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.col("event_type").alias("stratum"),
        (
            md5_hash64(F.concat(F.lit("ipw:"), F.col("user_id").cast("string")))
            % 2
            == 0
        ).alias("treat"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("treat"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(~F.col("treat"), 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(~F.col("treat"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s0"),
    )
    pos = s.filter((F.col("n1") > 0) & (F.col("n0") > 0))
    term = lambda sc, nc: F.sum(  # noqa: E731
        F.round(F.col(sc).cast("double") * F.col("n") / F.col(nc), 9).cast(
            "decimal(25,9)"
        )
    )
    agg = pos.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("n").cast("long").alias("n_all"),
        F.sum("n1").cast("long").alias("n_treat"),
        F.sum("n0").cast("long").alias("n_control"),
        term("s1", "n1").alias("t1"),
        term("s0", "n0").alias("t0"),
    )
    mu1 = F.col("t1").cast("double") / F.col("n_all")
    mu0 = F.col("t0").cast("double") / F.col("n_all")
    return agg.select(
        "n_strata",
        "n_treat",
        "n_control",
        F.round(mu1, 6).alias("mu_treat_cents"),
        F.round(mu0, 6).alias("mu_control_cents"),
        F.round(mu1 - mu0, 6).alias("ate_cents"),
    )


# two-sided alpha=0.05 / power=0.80 normal quantiles — pinned literals
# shared by both engines (the experiment-sizing constants)
_Z_ALPHA2 = 1.959963984540054
_Z_BETA = 0.8416212335729143


@register(
    "stats_power_mde",
    f"""WITH c AS (
         SELECT event_type, round(value * 100)::BIGINT AS cents FROM events
         WHERE event_type IN ('click', 'view')),
       m AS (SELECT event_type, count(*)::BIGINT AS n,
                    sum(cents)::BIGINT AS s,
                    sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS q
             FROM c GROUP BY event_type),
       w AS (SELECT
               max(CASE WHEN event_type = 'click' THEN n END)::BIGINT AS n1,
               max(CASE WHEN event_type = 'view' THEN n END)::BIGINT AS n2,
               max(CASE WHEN event_type = 'click' THEN s END)::BIGINT AS s1,
               max(CASE WHEN event_type = 'view' THEN s END)::BIGINT AS s2,
               max(CASE WHEN event_type = 'click' THEN q END) AS q1,
               max(CASE WHEN event_type = 'view' THEN q END) AS q2
             FROM m),
       v AS (SELECT n1, n2, CAST(s1 AS DOUBLE) / n1 AS m1,
                    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      / (n1 - 1) AS v1,
                    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                      / (n2 - 1) AS v2
             FROM w)
       SELECT n1, n2, round(sqrt(v1 / n1 + v2 / n2), 6) AS se_cents,
              round(({_Z_ALPHA2!r} + {_Z_BETA!r})
                    * sqrt(v1 / n1 + v2 / n2), 4) AS mde_cents,
              round(({_Z_ALPHA2!r} + {_Z_BETA!r})
                    * sqrt(v1 / n1 + v2 / n2) / m1, 6) AS mde_rel
       FROM v""",
    doc="Experiment sizing: the minimum detectable effect at the CURRENT "
    "sample sizes (two-sided alpha 0.05, power 0.80 — quantiles pinned "
    "as shared literals) for the click-vs-view value comparison, "
    "absolute and relative to the baseline mean. Group variances come "
    "from the same exact integer/decimal moments as stats_welch_ttest "
    "(never a float variance over raw doubles); MDE = (z_a/2 + z_b) * "
    "SE is one shared IEEE tree rounded once per output. Scale shape: "
    "one scan-fused 2-group aggregate, then 1-row arithmetic.",
)
def q_stats_power_mde(spark: SparkSession, sf: str):
    c = (
        events_table(spark, sf)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    m = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    )
    pick = lambda t, col: F.max(F.when(F.col("event_type") == t, F.col(col)))  # noqa: E731
    w = m.agg(
        pick("click", "n").cast("long").alias("n1"),
        pick("view", "n").cast("long").alias("n2"),
        pick("click", "s").cast("long").alias("s1"),
        pick("view", "s").cast("long").alias("s2"),
        pick("click", "q").alias("q1"),
        pick("view", "q").alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    v1 = (
        F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / n1
    ) / (n1 - 1)
    v2 = (
        F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2") / n2
    ) / (n2 - 1)
    se = F.sqrt(v1 / n1 + v2 / n2)
    zsum = F.lit(_Z_ALPHA2) + F.lit(_Z_BETA)
    return w.select(
        "n1",
        "n2",
        F.round(se, 6).alias("se_cents"),
        F.round(zsum * se, 4).alias("mde_cents"),
        F.round(zsum * se / m1, 6).alias("mde_rel"),
    )


@register(
    "stats_overdispersion",
    """WITH c AS (
         SELECT user_id, event_type, count(*)::BIGINT AS k
         FROM events GROUP BY user_id, event_type),
       m AS (SELECT event_type, count(*)::BIGINT AS n_users,
                    sum(k)::BIGINT AS s,
                    sum(k::DECIMAL(38,0) * k)::DECIMAL(38,0) AS q
             FROM c GROUP BY event_type)
       SELECT event_type, n_users, s AS n_events,
              round(CAST(s AS DOUBLE) / n_users, 6) AS mean_k,
              round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_users)
                    / (n_users - 1), 6) AS var_k,
              round(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_users)
                     / (n_users - 1)) / (CAST(s AS DOUBLE) / n_users), 6)
                AS dispersion_index,
              ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_users)
               / (n_users - 1)) / (CAST(s AS DOUBLE) / n_users) > 1.5
                AS overdispersed
       FROM m ORDER BY event_type""",
    doc="Overdispersion diagnostic for per-user event counts: the index "
    "of dispersion var/mean per event type (1 under Poisson arrivals; "
    "> 1.5 flags clumped usage that invalidates Poisson-rate "
    "assumptions in the A/B machinery). Count moments are exact "
    "integer/decimal sums; the index is one shared IEEE tree, rounded "
    "once for display and compared UNROUNDED for the flag (both "
    "engines evaluate the identical expression). Scale shape: one "
    "(user, type) rollup shuffle + a type-domain-bounded aggregate.",
)
def q_stats_overdispersion(spark: SparkSession, sf: str):
    c = events_table(spark, sf).groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("k")
    )
    m = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("q"),
    )
    mean_k = F.col("s").cast("double") / F.col("n_users")
    var_k = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_users")
    ) / (F.col("n_users") - 1)
    idx = var_k / mean_k
    return m.select(
        "event_type",
        "n_users",
        F.col("s").alias("n_events"),
        F.round(mean_k, 6).alias("mean_k"),
        F.round(var_k, 6).alias("var_k"),
        F.round(idx, 6).alias("dispersion_index"),
        (idx > 1.5).alias("overdispersed"),
    ).orderBy("event_type")


# O'Brien-Fleming boundaries for 5 equally-spaced looks at overall
# two-sided alpha 0.05 (z_final * sqrt(K/k), z_final = 2.04) — pinned
# literals shared by both engines
_OBF_LOOKS = (
    (1, 6, 4.5616),
    (2, 12, 3.2256),
    (3, 18, 2.6337),
    (4, 24, 2.2808),
    (5, 30, 2.04),
)


@register(
    "stats_group_sequential",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                {md5_hash64_sql("'gs:' || user_id::VARCHAR")} % 2 = 0 AS treat,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
         FROM events),
       d0 AS (SELECT min(day)::BIGINT AS min_day FROM e),
       daily AS (
         SELECT day - d0.min_day AS day_off, treat,
                count(*)::BIGINT AS n, sum(conv)::BIGINT AS x
         FROM e, d0 GROUP BY day_off, treat),
       looks AS (SELECT * FROM (VALUES {', '.join(f'({k}, {c}, {b!r})' for k, c, b in _OBF_LOOKS)})
                 AS l(look, cutoff_days, obf_boundary)),
       cum AS (
         SELECT l.look, l.cutoff_days, l.obf_boundary,
                sum(CASE WHEN d.treat THEN d.n ELSE 0 END)::BIGINT AS n1,
                sum(CASE WHEN d.treat THEN d.x ELSE 0 END)::BIGINT AS x1,
                sum(CASE WHEN NOT d.treat THEN d.n ELSE 0 END)::BIGINT AS n0,
                sum(CASE WHEN NOT d.treat THEN d.x ELSE 0 END)::BIGINT AS x0
         FROM looks l JOIN daily d ON d.day_off < l.cutoff_days
         GROUP BY 1, 2, 3),
       z AS (
         SELECT look, cutoff_days, n1, x1, n0, x0, obf_boundary,
                (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                / sqrt((CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                       * (1 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                       * (1.0 / n1 + 1.0 / n0)) AS zv
         FROM cum)
       SELECT look::BIGINT AS look, cutoff_days::BIGINT AS cutoff_days,
              n1 AS n_treat, n0 AS n_control, x1 AS conv_treat,
              x0 AS conv_control, round(zv, 4) AS z_k,
              obf_boundary, abs(zv) > obf_boundary AS crossed
       FROM z ORDER BY look""",
    doc="Group-sequential interim monitoring (O'Brien-Fleming, 5 equally "
    "spaced looks, two-sided alpha 0.05 — boundaries pinned as shared "
    "literals): at each look, the cumulative two-proportion purchase-"
    "conversion z between md5-hash arms is compared to its boundary — "
    "the peeking-safe alternative to re-running stats_ab_test_"
    "proportions daily, and an A/A calibration here (hash arms: no "
    "look should cross). The crossing flag compares the UNROUNDED z "
    "(identical IEEE tree both engines); z rounds once for display. "
    "Scale shape: one scan-fused (day x arm)-bounded rollup, a 1-row "
    "min-day broadcast, a 5-row look table fanned over the ~60-row "
    "rollup, 5-row output.",
)
def q_stats_group_sequential(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        (
            md5_hash64(F.concat(F.lit("gs:"), F.col("user_id").cast("string"))) % 2
            == 0
        ).alias("treat"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    d0 = e.agg(F.min("day").cast("long").alias("min_day"))
    daily = (
        e.crossJoin(F.broadcast(d0))
        .groupBy((F.col("day") - F.col("min_day")).alias("day_off"), "treat")
        .agg(F.count("*").cast("long").alias("n"), F.sum("conv").cast("long").alias("x"))
    )
    looks = spark.createDataFrame(
        list(_OBF_LOOKS), "look int, cutoff_days int, obf_boundary double"
    )
    cum = (
        F.broadcast(looks)
        .join(daily, daily["day_off"] < looks["cutoff_days"])
        .groupBy("look", "cutoff_days", "obf_boundary")
        .agg(
            F.sum(F.when(F.col("treat"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("treat"), F.col("x")).otherwise(0))
            .cast("long")
            .alias("x1"),
            F.sum(F.when(~F.col("treat"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(~F.col("treat"), F.col("x")).otherwise(0))
            .cast("long")
            .alias("x0"),
        )
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p0 = F.col("x0").cast("double") / F.col("n0")
    pp = (F.col("x1") + F.col("x0")).cast("double") / (F.col("n1") + F.col("n0"))
    zv = (p1 - p0) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n0")))
    return cum.select(
        F.col("look").cast("long").alias("look"),
        F.col("cutoff_days").cast("long").alias("cutoff_days"),
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_control"),
        F.col("x1").alias("conv_treat"),
        F.col("x0").alias("conv_control"),
        F.round(zv, 4).alias("z_k"),
        "obf_boundary",
        (F.abs(zv) > F.col("obf_boundary")).alias("crossed"),
    ).orderBy("look")


_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row; eps = 2/W for the reported bound flag

# Per-row 60-bit seed hashes h_s = md5_hash64('cms' + str(s)), pinned and
# xor-combined with the per-TOKEN hash: bucket(s, w) = xor(h0(w), h_s) % W
# — the bootstrap/minhash seeding trick (one md5 per token occurrence
# plus d pinned constants, never d x stream hash evaluations; measured
# 33 s -> ~8 s at sf1 for the batch cert)
_CMS_HS = tuple(
    int(hashlib.md5(f"cms{s}".encode()).hexdigest()[:15], 16) for s in range(_CMS_D)
)
_CMS_SEED_VALUES = ", ".join(f"({s}, {h})" for s, h in enumerate(_CMS_HS))


@register(
    "sketch_count_min_certified",
    f"""WITH d AS (SELECT {TOKS} AS t FROM documents),
       tok AS (SELECT unnest(t) AS w, {md5_hash64_sql('unnest(t)')} AS h0
               FROM d),
       n AS (SELECT count(*)::BIGINT AS n_total FROM tok),
       sd AS (SELECT * FROM (VALUES {_CMS_SEED_VALUES}) v(seed, hs)),
       cells AS (
         SELECT s.seed, (xor(tok.h0, s.hs) % {_CMS_W})::BIGINT AS bkt,
                count(*)::BIGINT AS c
         FROM tok, sd s
         GROUP BY s.seed, bkt),
       exact AS (SELECT w, count(*)::BIGINT AS xc FROM tok GROUP BY w),
       top AS (SELECT w, {md5_hash64_sql('w')} AS h0, xc FROM exact
               ORDER BY xc DESC, w LIMIT 20),
       est AS (
         SELECT t.w, t.xc, min(c.c)::BIGINT AS cms
         FROM top t, sd s
         JOIN cells c ON c.seed = s.seed
          AND c.bkt = (xor(t.h0, s.hs) % {_CMS_W})
         GROUP BY t.w, t.xc)
       SELECT e.w AS token, e.xc AS exact_count, e.cms AS cms_estimate,
              (e.cms - e.xc)::BIGINT AS overestimate,
              (e.cms - e.xc) * {_CMS_W} <= 2 * n.n_total AS within_2eps
       FROM est e, n ORDER BY e.xc DESC, e.w""",
    doc="Count-min sketch certified against exact counts: a d=4 x w=256 "
    "CMS over the corpus token stream (cells are ONE map-side-"
    "combinable (seed, bucket) aggregate — 1024 cells of state per "
    "task, the textbook mergeable-across-executors layout), queried "
    "for the exact top-20 tokens. The report certifies the structural "
    "guarantee — CMS never underestimates (overestimate >= 0 by "
    "construction, visible per row) — and flags each row against the "
    "2N/w Markov envelope (an expectation-scale bound computed "
    "identically by both engines, reported not assumed). Alongside "
    "Misra-Gries (deterministic support) and HLL (distinct counts), "
    "this completes the mergeable-sketch triad a 1000-executor "
    "frequency rollup chooses from. Row hashes follow the xor-seeding "
    "discipline (one md5 per occurrence, d pinned seed constants — "
    "never d x stream hash evaluations). Scale shape: one token "
    "explode x 4 pinned seeds into a 1024-cell aggregate + one "
    "vocab-bounded exact rollup; the probe joins 20 x 4 rows against "
    "broadcast cells.",
)
def q_sketch_count_min(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents").select(tx.tokens("text").alias("t"))
    tok = d.select(
        F.explode("t").alias("w")
    ).select("w", md5_hash64(F.col("w")).alias("h0")).transform(ckpt)
    n = tok.agg(F.count("*").cast("long").alias("n_total"))
    seeds = F.explode(
        F.array(
            *[
                F.struct(F.lit(s).alias("seed"), F.lit(h).alias("hs"))
                for s, h in enumerate(_CMS_HS)
            ]
        )
    ).alias("sd")
    cells = (
        tok.select("h0", seeds)
        .select(
            F.col("sd.seed").alias("seed"),
            (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _CMS_W).alias("bkt"),
        )
        .groupBy("seed", "bkt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = tok.groupBy("w").agg(F.count("*").cast("long").alias("xc"))
    top = exact.orderBy(F.desc("xc"), F.asc("w")).limit(20)
    probes = top.select("w", md5_hash64(F.col("w")).alias("h0"), "xc", seeds).select(
        "w",
        "xc",
        F.col("sd.seed").alias("seed"),
        (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _CMS_W).alias("bkt"),
    )
    est = (
        probes.join(F.broadcast(cells), ["seed", "bkt"])
        .groupBy("w", "xc")
        .agg(F.min("c").cast("long").alias("cms"))
    )
    return (
        est.crossJoin(F.broadcast(n))
        .select(
            F.col("w").alias("token"),
            F.col("xc").alias("exact_count"),
            F.col("cms").alias("cms_estimate"),
            (F.col("cms") - F.col("xc")).cast("long").alias("overestimate"),
            (
                (F.col("cms") - F.col("xc")) * _CMS_W <= 2 * F.col("n_total")
            ).alias("within_2eps"),
        )
        .orderBy(F.desc("exact_count"), F.asc("token"))
    )


from annotations_ingester_spark.plans.catalog import REGISTRY as _SREG  # noqa: E402


@register(
    "streaming_count_min",
    _SREG["sketch_count_min_certified"].oracle,
    doc="Streaming twin of the count-min certification, run for real: "
    "documents stream in (availableNow, several micro-batches) and "
    "foreachBatch reduces each batch to its OWN 4x256 cell partial "
    "landed at a batch-id-keyed path (idempotent overwrite) — the "
    "whole point of CMS is that cells are a commutative monoid, so "
    "the final fold (sum cells across batches) must equal the batch "
    "sketch EXACTLY, and the probe against the exact top-20 then "
    "matches sketch_count_min_certified row for row (shared oracle). "
    "This is the operational proof of the sketch's merge claim: any "
    "batching, any arrival order, same cells. Scale shape: per batch "
    "one token explode into 1024 cells; fold is O(batches x 1024); "
    "the exact tier reads the settled corpus once.",
)
def q_streaming_count_min(spark: SparkSession, sf: str):
    import os
    import shutil
    import tempfile

    docs = table(spark, sf, "documents").select("doc_id", "text")
    run_dir = tempfile.mkdtemp(prefix="spark_graft_cms_")
    feed_dir = os.path.join(run_dir, "feed")
    store = os.path.join(run_dir, "store")
    try:
        docs.repartition(8).write.mode("overwrite").parquet(feed_dir)

        seed_arr = F.array(
            *[
                F.struct(F.lit(s).alias("seed"), F.lit(h).alias("hs"))
                for s, h in enumerate(_CMS_HS)
            ]
        )

        def sketch(batch_df, batch_id):
            tok = (
                batch_df.select(F.explode(tx.tokens("text")).alias("w"))
                .select(md5_hash64(F.col("w")).alias("h0"))
                .select("h0", F.explode(seed_arr).alias("sd"))
            )
            cells = (
                tok.select(
                    F.col("sd.seed").alias("seed"),
                    (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _CMS_W).alias("bkt"),
                )
                .groupBy("seed", "bkt")
                .agg(F.count("*").cast("long").alias("c"))
            )
            cells.write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "3")
            .parquet(feed_dir)
        )
        q = stream.writeStream.foreachBatch(sketch).trigger(availableNow=True).start()
        q.awaitTermination()
        merged = (
            spark.read.parquet(store)
            .groupBy("seed", "bkt")
            .agg(F.sum("c").cast("long").alias("c"))
            .localCheckpoint(eager=True)
        )
        # exact tier + probe over the settled corpus (one scan)
        tok = (
            table(spark, sf, "documents")
            .select(F.explode(tx.tokens("text")).alias("w"))
            .localCheckpoint(eager=True)
        )
        n = tok.agg(F.count("*").cast("long").alias("n_total"))
        exact = tok.groupBy("w").agg(F.count("*").cast("long").alias("xc"))
        top = exact.orderBy(F.desc("xc"), F.asc("w")).limit(20)
        probes = top.select(
            "w",
            md5_hash64(F.col("w")).alias("h0"),
            "xc",
            F.explode(seed_arr).alias("sd"),
        ).select(
            "w",
            "xc",
            F.col("sd.seed").alias("seed"),
            (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _CMS_W).alias("bkt"),
        )
        est = (
            probes.join(F.broadcast(merged), ["seed", "bkt"])
            .groupBy("w", "xc")
            .agg(F.min("c").cast("long").alias("cms"))
        )
        return (
            est.crossJoin(F.broadcast(n))
            .select(
                F.col("w").alias("token"),
                F.col("xc").alias("exact_count"),
                F.col("cms").alias("cms_estimate"),
                (F.col("cms") - F.col("xc")).cast("long").alias("overestimate"),
                (
                    (F.col("cms") - F.col("xc")) * _CMS_W <= 2 * F.col("n_total")
                ).alias("within_2eps"),
            )
            .orderBy(F.desc("exact_count"), F.asc("token"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


@register(
    "stats_sequential_srm",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                {md5_hash64_sql("'ab:' || user_id::VARCHAR")} % 2 = 0 AS treat
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN treat THEN 1 ELSE 0 END)::BIGINT AS n1,
                    sum(CASE WHEN NOT treat THEN 1 ELSE 0 END)::BIGINT AS n0
             FROM e GROUP BY day)
       SELECT day, n1 AS n_treat, n0 AS n_control,
              round(CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0), 4)
                AS chi2,
              CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0) > 3.841
                AS srm_flag
       FROM d ORDER BY day""",
    doc="Sample-ratio-mismatch monitor for the hash-split A/B arms (the "
    "same 'ab:' assignment stats_ab_test_proportions reads): per day, "
    "the 1-df chi-square of the two arm sizes against the designed "
    "50/50 split — (n1-n0)^2/(n1+n0) — flagged above the pinned 3.841 "
    "95% critical value. SRM is the first health check every "
    "experimentation platform runs: a flagged day means the assignment "
    "or logging is broken and every downstream test on that exposure "
    "is invalid. Exact integer counts; the flag compares the UNROUNDED "
    "statistic (identical IEEE tree both engines). Scale shape: one "
    "scan-fused (day x arm)-bounded aggregate, day-domain output.",
)
def q_stats_srm(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        (
            md5_hash64(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 2
            == 0
        ).alias("treat"),
    )
    d = e.groupBy("day").agg(
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("treat"), 1).otherwise(0)).cast("long").alias("n0"),
    )
    chi2 = ((F.col("n1") - F.col("n0")) * (F.col("n1") - F.col("n0"))).cast(
        "double"
    ) / (F.col("n1") + F.col("n0"))
    return d.select(
        "day",
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_control"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    ).orderBy("day")


# --- Bloom-filter membership certification (r9) ---------------------------

_BLOOM_M = 65536  # bits
_BLOOM_K = 4  # hash functions
# xor-seeding discipline (count-min/bootstrap lineage): ONE md5 per key
# plus k pinned 60-bit constants, never k stream hash evaluations
_BLOOM_HS = tuple(
    int(hashlib.md5(f"bloom{s}".encode()).hexdigest()[:15], 16)
    for s in range(_BLOOM_K)
)
_BLOOM_SEED_VALUES = ", ".join(f"({s}, {h})" for s, h in enumerate(_BLOOM_HS))


@register(
    "sketch_bloom_membership_cert",
    f"""WITH build AS (
         SELECT DISTINCT o_custkey AS key FROM orders),
       bh AS (SELECT key, {md5_hash64_sql('key::VARCHAR')} AS h0 FROM build),
       sd AS (SELECT * FROM (VALUES {_BLOOM_SEED_VALUES}) v(seed, hs)),
       bits AS (
         SELECT DISTINCT (xor(bh.h0, sd.hs) % {_BLOOM_M})::BIGINT AS pos
         FROM bh, sd),
       probe AS (
         SELECT c_custkey AS key,
                {md5_hash64_sql('c_custkey::VARCHAR')} AS h0
         FROM customer),
       hits AS (
         SELECT p.key,
                count(b.pos)::BIGINT AS n_hit
         FROM probe p
         CROSS JOIN sd
         LEFT JOIN bits b
           ON b.pos = (xor(p.h0, sd.hs) % {_BLOOM_M})
         GROUP BY p.key),
       flags AS (
         SELECT h.key, h.n_hit = {_BLOOM_K} AS bloom_hit,
                EXISTS (SELECT 1 FROM build b WHERE b.key = h.key) AS present
         FROM hits h),
       n AS (SELECT count(*)::BIGINT AS n_build FROM build)
       SELECT n.n_build,
              (SELECT count(*) FROM bits)::BIGINT AS n_bits_set,
              count(*)::BIGINT AS n_probe,
              sum(CASE WHEN f.present THEN 1 ELSE 0 END)::BIGINT AS n_present,
              sum(CASE WHEN f.present AND NOT f.bloom_hit THEN 1 ELSE 0 END)
                ::BIGINT AS false_negatives,
              sum(CASE WHEN NOT f.present THEN 1 ELSE 0 END)::BIGINT
                AS n_absent,
              sum(CASE WHEN NOT f.present AND f.bloom_hit THEN 1 ELSE 0 END)
                ::BIGINT AS false_positives,
              round(sum(CASE WHEN NOT f.present AND f.bloom_hit
                             THEN 1 ELSE 0 END) * 1.0
                    / greatest(sum(CASE WHEN NOT f.present THEN 1 ELSE 0 END),
                               1), 6) AS fpr_measured,
              round(power(1.0 - power(1.0 - 1.0/{_BLOOM_M},
                                      {_BLOOM_K}.0 * n.n_build),
                          {_BLOOM_K}.0), 6) AS fpr_expected
       FROM flags f, n GROUP BY n.n_build""",
    doc="Bloom-filter membership certification — the missing member of "
    "the mergeable-sketch family (HLL distinct / Misra-Gries heavy "
    "hitters / count-min frequencies / MinHash similarity / BLOOM "
    "membership): an m=65536-bit, k=4 filter built over the distinct "
    "ordering customers, probed with every customer. Certifies the "
    "structural no-false-negative guarantee (false_negatives must be "
    "0 — reported, not assumed), the measured false-positive rate on "
    "the truly-absent keys, and the analytic expectation "
    "(1-(1-1/m)^(kn))^k both engines compute from the same integers "
    "(rounded once). Hashing follows the xor-seeding discipline: one "
    "md5 per key, k pinned seed constants. The filter is represented "
    "as the distinct SET of set bit positions, which makes "
    "mergeability structural: the union of per-partition bit sets IS "
    "the distinct aggregate Spark executes (map-side combinable, "
    "<=m rows of state). Scale shape: one distinct over build keys, "
    "one <=m-row bit aggregate broadcast to the probe side (the probe "
    "never shuffles), one key-shuffle semi for ground truth — at "
    "100 TB swap the cert's exact-truth tier for the production "
    "filter use unchanged (reference parity: the J1 skip-processed "
    "anti-join is exactly where a cluster deployment would consult "
    "this filter before paying the shuffle).",
)
def q_sketch_bloom_membership(spark: SparkSession, sf: str):
    seeds = F.explode(
        F.array(
            *[
                F.struct(F.lit(s).alias("seed"), F.lit(h).alias("hs"))
                for s, h in enumerate(_BLOOM_HS)
            ]
        )
    ).alias("sd")
    build = (
        table(spark, sf, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
        .transform(ckpt)  # feeds bits + ground-truth tiers
    )
    bits = (
        build.select(md5_hash64(F.col("key").cast("string")).alias("h0"), seeds)
        .select(
            (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _BLOOM_M)
            .cast("long")
            .alias("pos")
        )
        .distinct()
    )
    probe = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"),
        md5_hash64(F.col("c_custkey").cast("string")).alias("h0"),
    )
    hits = (
        probe.select("key", "h0", seeds)
        .select(
            "key",
            (F.col("h0").bitwiseXOR(F.col("sd.hs")) % _BLOOM_M)
            .cast("long")
            .alias("pos"),
        )
        .join(F.broadcast(bits.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.count("_set").cast("long").alias("n_hit"))
    )
    flags = hits.join(
        build.withColumn("_b", F.lit(1)), "key", "left"
    ).select(
        "key",
        (F.col("n_hit") == _BLOOM_K).alias("bloom_hit"),
        F.col("_b").isNotNull().alias("present"),
    )
    n_build = build.agg(F.count("*").cast("long").alias("n_build"))
    n_bits = bits.agg(F.count("*").cast("long").alias("n_bits_set"))
    fp = F.sum(F.when((~F.col("present")) & F.col("bloom_hit"), 1).otherwise(0))
    absent = F.sum(F.when(~F.col("present"), 1).otherwise(0))
    return (
        flags.crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
        .groupBy("n_build", "n_bits_set")
        .agg(
            F.count("*").cast("long").alias("n_probe"),
            F.sum(F.when(F.col("present"), 1).otherwise(0))
            .cast("long")
            .alias("n_present"),
            F.sum(
                F.when(F.col("present") & (~F.col("bloom_hit")), 1).otherwise(0)
            )
            .cast("long")
            .alias("false_negatives"),
            absent.cast("long").alias("n_absent"),
            fp.cast("long").alias("false_positives"),
            F.round(fp * 1.0 / F.greatest(absent, F.lit(1)), 6).alias(
                "fpr_measured"
            ),
        )
        .select(
            "n_build",
            "n_bits_set",
            "n_probe",
            "n_present",
            "false_negatives",
            "n_absent",
            "false_positives",
            "fpr_measured",
            F.round(
                F.pow(
                    1.0
                    - F.pow(
                        F.lit(1.0 - 1.0 / _BLOOM_M),
                        _BLOOM_K * F.col("n_build").cast("double"),
                    ),
                    float(_BLOOM_K),
                ),
                6,
            ).alias("fpr_expected"),
        )
    )


# --- round-9 batch B: ANOVA, permutation test, PSI drift -------------------

_PERM_B = 499  # pinned replicate count — p-value resolution 1/(B+1) = 0.002


@register(
    "stats_anova_oneway",
    """WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       m AS (SELECT grp, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
                    sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS q
             FROM c GROUP BY grp),
       a AS (SELECT count(*)::BIGINT AS k,
                    sum(n)::BIGINT AS n_total,
                    sum(s)::BIGINT AS s_total,
                    sum(q)::DECIMAL(38,0) AS q_total,
                    sum(round(CAST(s AS DOUBLE) * s / n, 4)::DECIMAL(30,4))
                      AS sb_terms
             FROM m)
       SELECT k, n_total,
              round(CAST(sb_terms AS DOUBLE)
                    - CAST(s_total AS DOUBLE) * s_total / n_total, 2)
                AS ss_between,
              round(CAST(q_total AS DOUBLE) - CAST(sb_terms AS DOUBLE), 2)
                AS ss_within,
              round(((CAST(sb_terms AS DOUBLE)
                      - CAST(s_total AS DOUBLE) * s_total / n_total)
                     / (k - 1))
                    / ((CAST(q_total AS DOUBLE) - CAST(sb_terms AS DOUBLE))
                       / (n_total - k)), 4) AS f_stat,
              round((CAST(sb_terms AS DOUBLE)
                     - CAST(s_total AS DOUBLE) * s_total / n_total)
                    / (CAST(q_total AS DOUBLE)
                       - CAST(s_total AS DOUBLE) * s_total / n_total), 6)
                AS eta_squared
       FROM a""",
    doc="One-way ANOVA F-statistic over the five order-priority groups "
    "(order value in cents): the >2-group generalization of "
    "stats_welch_ttest. Group moments are exact (n, Σcents BIGINT, "
    "Σcents² DECIMAL(38,0)); each group's between-term s²/n rounds to "
    "4 dp and re-accumulates as DECIMAL so both engines sum identical "
    "terms; SS_between/SS_within/F/η² are then one shared IEEE "
    "expression tree over exact inputs, rounded once each. η² "
    "(SS_between/SS_total) is the effect size a reader pairs with the "
    "F table at (k-1, N-k) df. Scale shape: one scan-fused 5-group "
    "aggregate (map-side combinable), a 5-row fold, 1-row arithmetic — "
    "no shuffle beyond the k-group exchange.",
)
def q_stats_anova_oneway(spark: SparkSession, sf: str):
    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    )
    a = m.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_total"),
        F.sum("q").cast("decimal(38,0)").alias("q_total"),
        F.sum(
            F.round(
                F.col("s").cast("double") * F.col("s") / F.col("n"), 4
            ).cast("decimal(30,4)")
        ).alias("sb_terms"),
    )
    sb = F.col("sb_terms").cast("double")
    st = F.col("s_total").cast("double")
    qt = F.col("q_total").cast("double")
    n = F.col("n_total")
    k = F.col("k")
    ssb = sb - st * F.col("s_total") / n
    ssw = qt - sb
    sst = qt - st * F.col("s_total") / n
    return a.select(
        "k",
        "n_total",
        F.round(ssb, 2).alias("ss_between"),
        F.round(ssw, 2).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 4).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


@register(
    "stats_permutation_test",
    f"""WITH {DAILY_CENTS_CTE},
       h AS (SELECT day, x,
                    {md5_hash64_sql("'perm:' || day::VARCHAR")} % 2 AS arm
             FROM d),
       o AS (SELECT
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN arm = 0 THEN x ELSE 0 END)::BIGINT AS s0,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN arm = 1 THEN x ELSE 0 END)::BIGINT AS s1
             FROM h),
       reps AS (
         SELECT r.b, hh.day, hh.x,
                {md5_hash64_sql("'perm:' || b::VARCHAR || ':' || day::VARCHAR")}
                  % 2 AS arm
         FROM h hh CROSS JOIN (SELECT unnest(range(1, {_PERM_B} + 1)) AS b) r),
       pm AS (SELECT b,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN arm = 0 THEN x ELSE 0 END)::BIGINT AS s0,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN arm = 1 THEN x ELSE 0 END)::BIGINT AS s1
              FROM reps GROUP BY b),
       cmp AS (SELECT p.b,
                CASE WHEN abs(CAST(p.s0 AS DOUBLE) * p.n1
                              - CAST(p.s1 AS DOUBLE) * p.n0)
                          * (CAST(o.n0 AS DOUBLE) * o.n1)
                     >= abs(CAST(o.s0 AS DOUBLE) * o.n1
                            - CAST(o.s1 AS DOUBLE) * o.n0)
                          * (CAST(p.n0 AS DOUBLE) * p.n1)
                     THEN 1 ELSE 0 END AS ge
               FROM pm p, o)
       SELECT o.n0 + o.n1 AS n_days, {_PERM_B} AS b_reps,
              round(CAST(o.s0 AS DOUBLE) / o.n0
                    - CAST(o.s1 AS DOUBLE) / o.n1, 4) AS obs_diff_cents,
              round((1.0 + sum(ge)) / ({_PERM_B} + 1.0), 6) AS p_value
       FROM cmp, o GROUP BY o.n0, o.n1, o.s0, o.s1""",
    doc="Distribution-free permutation test on the A/A hash arms: days "
    "are the exchangeable unit (daily revenue in cents), the observed "
    "statistic is the |difference of arm means|, and each of the "
    f"pinned B={_PERM_B} replicates re-assigns every day via "
    "md5('perm:'||b||':'||day) — seeded, engine-portable, and "
    "date-domain-bounded (days x B hash evaluations, a constant "
    "independent of row count; the N+B xor discipline is unnecessary "
    "when N is the date domain). The >= comparison cross-multiplies "
    "means into products of exact integers evaluated as identical IEEE "
    "doubles on both engines — no accumulation-order sensitivity. "
    "p = (1 + #{stat_b >= stat_obs}) / (B+1), the add-one permutation "
    "p-value; under A/A it calibrates to Uniform(0,1) — the harness a "
    "real experiment drops its treatment column into. Scale shape: one "
    "map-side-combinable daily rollup, a days x B cross of two tiny "
    "domains, one B-group aggregate, 1-row output.",
)
def q_stats_permutation_test(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    h = d.select(
        "day",
        "x",
        (
            md5_hash64(F.concat(F.lit("perm:"), F.col("day").cast("string"))) % 2
        ).alias("arm"),
    )
    def _arms(df, keys):
        return df.groupBy(*keys).agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
            .cast("long")
            .alias("s0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
            .cast("long")
            .alias("s1"),
        )

    o = _arms(h, [])
    reps = (
        h.select("day", "x")
        .crossJoin(F.broadcast(spark.range(1, _PERM_B + 1).withColumnRenamed("id", "b")))
        .select(
            "b",
            "x",
            (
                md5_hash64(
                    F.concat_ws(
                        "",
                        F.lit("perm:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("day").cast("string"),
                    )
                )
                % 2
            ).alias("arm"),
        )
    )
    pm = _arms(reps, ["b"])
    obs = o.select(
        F.col("n0").alias("on0"),
        F.col("s0").alias("os0"),
        F.col("n1").alias("on1"),
        F.col("s1").alias("os1"),
    )
    lhs = F.abs(
        F.col("s0").cast("double") * F.col("n1")
        - F.col("s1").cast("double") * F.col("n0")
    ) * (F.col("on0").cast("double") * F.col("on1"))
    rhs = F.abs(
        F.col("os0").cast("double") * F.col("on1")
        - F.col("os1").cast("double") * F.col("on0")
    ) * (F.col("n0").cast("double") * F.col("n1"))
    cmp = pm.crossJoin(F.broadcast(obs)).select(
        "on0",
        "os0",
        "on1",
        "os1",
        F.when(lhs >= rhs, 1).otherwise(0).alias("ge"),
    )
    return (
        cmp.groupBy("on0", "os0", "on1", "os1")
        .agg(F.sum("ge").alias("n_ge"))
        .select(
            (F.col("on0") + F.col("on1")).cast("long").alias("n_days"),
            F.lit(_PERM_B).cast("int").alias("b_reps"),
            F.round(
                F.col("os0").cast("double") / F.col("on0")
                - F.col("os1").cast("double") / F.col("on1"),
                4,
            ).alias("obs_diff_cents"),
            F.round((1.0 + F.col("n_ge")) / (_PERM_B + 1.0), 6).alias("p_value"),
        )
    )


@register(
    "stats_psi_drift",
    """WITH c AS (
         SELECT floor(epoch(o_orderdate))::BIGINT AS t,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       p AS (SELECT ((min(t) + max(t)) // 2)::BIGINT AS mid FROM c),
       b AS (SELECT least(c.cents // 5000000, 9)::BIGINT AS bkt,
                    CASE WHEN c.t <= p.mid THEN 0 ELSE 1 END AS half
             FROM c, p),
       counts AS (SELECT bkt,
                    sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
                    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
                  FROM b GROUP BY bkt),
       spine AS (SELECT unnest(range(10))::BIGINT AS bkt),
       dense AS (SELECT s.bkt, coalesce(c.c1, 0)::BIGINT AS c1,
                        coalesce(c.c2, 0)::BIGINT AS c2
                 FROM spine s LEFT JOIN counts c USING (bkt)),
       tot AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM dense),
       terms AS (SELECT d.bkt,
                   round(((d.c1 + 1) / (t.n1 + 10.0)
                          - (d.c2 + 1) / (t.n2 + 10.0))
                         * ln(((d.c1 + 1) / (t.n1 + 10.0))
                              / ((d.c2 + 1) / (t.n2 + 10.0))),
                         9)::DECIMAL(20,9) AS term
                 FROM dense d, tot t)
       SELECT t.n1 AS n_first_half, t.n2 AS n_second_half,
              round(CAST(sum(term) AS DOUBLE), 6) AS psi
       FROM terms, tot t GROUP BY t.n1, t.n2""",
    doc="Population stability index of the order-value distribution, "
    "first half vs second half of the date range (the diff_in_diff "
    "data-midpoint pivot): the standard model-monitoring drift score "
    "PSI = sum (p_i - q_i) ln(p_i/q_i) over 10 PINNED 50k-wide value "
    "buckets (bucket edges are job constants, never data quantiles — "
    "the 100 TB-safe choice), add-one smoothed so empty buckets are "
    "defined. Rule of thumb a monitor applies: <0.1 stable, 0.1-0.25 "
    "moderate shift, >0.25 action. Per-bucket terms round to 9 dp and "
    "sum as DECIMAL (the repo-wide log-term discipline); the bucket "
    "spine densifies missing buckets so both halves share the full "
    "10-bucket support. Scale shape: one scan-fused (bucket, half) "
    "aggregate (map-side combinable), a 10-row spine join, two 1-row "
    "broadcasts (midpoint, totals), 1-row output.",
)
def q_stats_psi_drift(spark: SparkSession, sf: str):
    c = table(spark, sf, "orders").select(
        F.unix_timestamp("o_orderdate").cast("long").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    p = c.agg(F.expr("CAST((min(t) + max(t)) DIV 2 AS BIGINT)").alias("mid"))
    b = c.crossJoin(F.broadcast(p)).select(
        F.least(F.expr("cents DIV 5000000"), F.lit(9)).cast("long").alias("bkt"),
        F.when(F.col("t") <= F.col("mid"), 0).otherwise(1).alias("half"),
    )
    counts = b.groupBy("bkt").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    spine = spark.range(10).select(F.col("id").cast("long").alias("bkt"))
    dense = (
        spine.join(F.broadcast(counts), "bkt", "left")
        .select(
            "bkt",
            F.coalesce(F.col("c1"), F.lit(0)).cast("long").alias("c1"),
            F.coalesce(F.col("c2"), F.lit(0)).cast("long").alias("c2"),
        )
        .transform(ckpt)  # tiny; feeds totals + terms branches
    )
    tot = dense.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    pi = (F.col("c1") + 1) / (F.col("n1") + 10.0)
    qi = (F.col("c2") + 1) / (F.col("n2") + 10.0)
    terms = dense.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.round((pi - qi) * F.log(pi / qi), 9).cast("decimal(20,9)").alias("term"),
    )
    return (
        terms.groupBy("n1", "n2")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("psi"))
        .select(
            F.col("n1").alias("n_first_half"),
            F.col("n2").alias("n_second_half"),
            "psi",
        )
    )


# --- round-9 batch C: post-hoc, variance test, effect sizes, HLL inter -----

# Studentized-range upper-5% critical value q(0.05, k=5, df=inf) — pinned
# job constant (published table value), the df→inf row because N >> k at
# every shipped sf.
_TUKEY_Q_CRIT = 3.858


@register(
    "stats_tukey_hsd",
    f"""WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       m AS (SELECT grp, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
                    sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS q
             FROM c GROUP BY grp),
       a AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n_total,
                    sum(round((CAST(q AS DOUBLE)
                               - CAST(s AS DOUBLE) * s / n), 4)
                        ::DECIMAL(30,4)) AS ssw
             FROM m),
       msw AS (SELECT CAST(ssw AS DOUBLE) / (n_total - k) AS msw FROM a),
       p AS (SELECT x.grp AS grp_a, y.grp AS grp_b,
                    CAST(x.s AS DOUBLE) / x.n - CAST(y.s AS DOUBLE) / y.n
                      AS diff,
                    x.n AS na, y.n AS nb
             FROM m x JOIN m y ON x.grp < y.grp)
       SELECT p.grp_a, p.grp_b,
              round(p.diff, 6) AS mean_diff_cents,
              round(abs(p.diff)
                    / sqrt(w.msw / 2 * (1.0 / p.na + 1.0 / p.nb)), 4)
                AS q_stat,
              abs(p.diff) / sqrt(w.msw / 2 * (1.0 / p.na + 1.0 / p.nb))
                >= {_TUKEY_Q_CRIT} AS significant
       FROM p, msw w""",
    doc="Tukey HSD post-hoc over the five order-priority groups — the "
    "pairwise follow-up to stats_anova_oneway (which only says SOME "
    "group differs): all 10 pairwise mean differences, the studentized "
    "range statistic q = |m_a - m_b| / sqrt(MSW/2 (1/n_a + 1/n_b)) "
    "(Tukey-Kramer form for unequal n), and a significance flag at the "
    f"pinned published critical value q(0.05, k=5, df=inf) = "
    f"{_TUKEY_Q_CRIT} (N >> k at every shipped sf, so the df=inf row "
    "applies). Group moments are the exact ANOVA integers; per-group "
    "within-SS terms round to 4 dp and re-accumulate as DECIMAL. Scale "
    "shape: one scan-fused 5-group aggregate, a 5x5 domain pair spine, "
    "one 1-row MSW broadcast — 10-row output at any corpus size.",
)
def q_stats_tukey_hsd(spark: SparkSession, sf: str):
    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    ).transform(ckpt)  # 5 rows; feeds MSW + both pair sides
    a = m.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum(
            F.round(
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n"),
                4,
            ).cast("decimal(30,4)")
        ).alias("ssw"),
    )
    msw = a.select(
        (F.col("ssw").cast("double") / (F.col("n_total") - F.col("k"))).alias(
            "msw"
        )
    )
    x = m.select(
        F.col("grp").alias("grp_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    y = m.select(
        F.col("grp").alias("grp_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    p = x.crossJoin(F.broadcast(y)).filter(F.col("grp_a") < F.col("grp_b"))
    diff = F.col("sa").cast("double") / F.col("na") - F.col("sb").cast(
        "double"
    ) / F.col("nb")
    se = F.sqrt(F.col("msw") / 2 * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return p.crossJoin(F.broadcast(msw)).select(
        "grp_a",
        "grp_b",
        F.round(diff, 6).alias("mean_diff_cents"),
        F.round(F.abs(diff) / se, 4).alias("q_stat"),
        (F.abs(diff) / se >= F.lit(_TUKEY_Q_CRIT)).alias("significant"),
    )


@register(
    "stats_brown_forsythe",
    """WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents,
                o_orderkey
         FROM orders),
       sized AS (SELECT grp, count(*)::BIGINT AS n FROM c GROUP BY grp),
       ranked AS (
         SELECT grp, cents,
                row_number() OVER (PARTITION BY grp
                                   ORDER BY cents, o_orderkey) AS r
         FROM c),
       med AS (
         SELECT s.grp,
                min(CASE WHEN r.r >= ceil(0.5 * s.n) THEN r.cents END)::BIGINT
                  AS med
         FROM sized s JOIN ranked r ON s.grp = r.grp
         GROUP BY s.grp),
       z AS (SELECT c.grp, abs(c.cents - m.med)::BIGINT AS z
             FROM c JOIN med m ON c.grp = m.grp),
       zm AS (SELECT grp, count(*)::BIGINT AS n, sum(z)::BIGINT AS s,
                     sum(z::DECIMAL(38,0) * z)::DECIMAL(38,0) AS q
              FROM z GROUP BY grp),
       a AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n_total,
                    sum(s)::BIGINT AS s_total,
                    sum(q)::DECIMAL(38,0) AS q_total,
                    sum(round(CAST(s AS DOUBLE) * s / n, 4)::DECIMAL(30,4))
                      AS sb_terms
             FROM zm)
       SELECT k, n_total,
              round(((CAST(sb_terms AS DOUBLE)
                      - CAST(s_total AS DOUBLE) * s_total / n_total)
                     / (k - 1))
                    / ((CAST(q_total AS DOUBLE) - CAST(sb_terms AS DOUBLE))
                       / (n_total - k)), 4) AS bf_stat
       FROM a""",
    doc="Brown-Forsythe variance-homogeneity test (the robust Levene "
    "variant) over the five order-priority groups: one-way ANOVA F "
    "recomputed on the absolute deviations from the GROUP MEDIAN "
    "(median-centering makes the test robust to heavy tails, the "
    "standard pre-check before trusting stats_anova_oneway's pooled "
    "MSW). Group medians are the exact rank-ceil(n/2) order statistic "
    "via the quantile_disc_certified partitioned-window shape; the "
    "deviations are pure integers, so the second-stage ANOVA reuses "
    "the exact-moment discipline verbatim. Scale shape: one "
    "grp-partitioned rank window (5 bounded groups), one 5-row median "
    "broadcast back onto the scan, two scan-fused 5-group aggregates — "
    "three passes total, each with pushed-down column pruning.",
)
def q_stats_brown_forsythe(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    sized = c.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("grp").orderBy("cents", "o_orderkey")
    ranked = c.withColumn("r", F.row_number().over(w))
    med = (
        ranked.join(F.broadcast(sized), "grp")
        .groupBy("grp")
        .agg(
            F.min(
                F.when(F.col("r") >= F.ceil(0.5 * F.col("n")), F.col("cents"))
            )
            .cast("long")
            .alias("med")
        )
    )
    z = c.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("cents") - F.col("med")).cast("long").alias("z")
    )
    zm = z.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("z")).alias("q"),
    )
    a = zm.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_total"),
        F.sum("q").cast("decimal(38,0)").alias("q_total"),
        F.sum(
            F.round(
                F.col("s").cast("double") * F.col("s") / F.col("n"), 4
            ).cast("decimal(30,4)")
        ).alias("sb_terms"),
    )
    sb = F.col("sb_terms").cast("double")
    st = F.col("s_total").cast("double")
    qt = F.col("q_total").cast("double")
    n = F.col("n_total")
    k = F.col("k")
    return a.select(
        "k",
        "n_total",
        F.round(
            ((sb - st * F.col("s_total") / n) / (k - 1)) / ((qt - sb) / (n - k)),
            4,
        ).alias("bf_stat"),
    )


@register(
    "stats_effect_sizes",
    """WITH c AS (
         SELECT event_type, round(value * 100)::BIGINT AS cents FROM events
         WHERE event_type IN ('click', 'view')),
       m AS (SELECT event_type, count(*)::BIGINT AS n,
                    sum(cents)::BIGINT AS s,
                    sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS q
             FROM c GROUP BY event_type),
       w AS (SELECT
               max(CASE WHEN event_type = 'click' THEN n END)::BIGINT AS n1,
               max(CASE WHEN event_type = 'view' THEN n END)::BIGINT AS n2,
               max(CASE WHEN event_type = 'click' THEN s END)::BIGINT AS s1,
               max(CASE WHEN event_type = 'view' THEN s END)::BIGINT AS s2,
               max(CASE WHEN event_type = 'click' THEN q END) AS q1,
               max(CASE WHEN event_type = 'view' THEN q END) AS q2
             FROM m),
       v AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
                    ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                      / (n1 + n2 - 2) AS pv
             FROM w),
       d AS (SELECT n1, n2, md / sqrt(pv) AS d, sqrt(pv) AS psd FROM v)
       SELECT n1, n2,
              round(psd, 4) AS pooled_sd_cents,
              round(d, 6) AS cohens_d,
              round(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g,
              CASE WHEN abs(d) < 0.2 THEN 'negligible'
                   WHEN abs(d) < 0.5 THEN 'small'
                   WHEN abs(d) < 0.8 THEN 'medium'
                   ELSE 'large' END AS magnitude
       FROM d""",
    doc="Parametric effect sizes for the click-vs-view value comparison: "
    "Cohen's d from the pooled standard deviation (exact integer/"
    "decimal group moments — the stats_welch_ttest discipline), the "
    "small-sample bias-corrected Hedges' g = d (1 - 3/(4N - 9)), and "
    "the conventional magnitude label at the pinned 0.2/0.5/0.8 "
    "thresholds. Complements the NONPARAMETRIC effect size the "
    "Mann-Whitney query already reports (rank-biserial = Cliff's "
    "delta): d answers 'how many pooled SDs apart', the rank-biserial "
    "answers 'how often does one sample win'. Scale shape: one "
    "scan-fused 2-group aggregate, 1-row arithmetic.",
)
def q_stats_effect_sizes(spark: SparkSession, sf: str):
    c = (
        events_table(spark, sf)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    m = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    )
    pick = lambda t, col: F.max(F.when(F.col("event_type") == t, F.col(col)))  # noqa: E731
    w = m.agg(
        pick("click", "n").cast("long").alias("n1"),
        pick("view", "n").cast("long").alias("n2"),
        pick("click", "s").cast("long").alias("s1"),
        pick("view", "s").cast("long").alias("s2"),
        pick("click", "q").alias("q1"),
        pick("view", "q").alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    md = F.col("s1").cast("double") / n1 - F.col("s2").cast("double") / n2
    pv = (
        (F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / n1)
        + (
            F.col("q2").cast("double")
            - F.col("s2").cast("double") * F.col("s2") / n2
        )
    ) / (n1 + n2 - 2)
    d = md / F.sqrt(pv)
    return w.select(
        "n1",
        "n2",
        F.round(F.sqrt(pv), 4).alias("pooled_sd_cents"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6).alias("hedges_g"),
        F.when(F.abs(d) < 0.2, "negligible")
        .when(F.abs(d) < 0.5, "small")
        .when(F.abs(d) < 0.8, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@register(
    "sketch_hll_intersection_cert",
    """WITH a AS (
         SELECT count(DISTINCT CASE WHEN event_type = 'click'
                                    THEN user_id END)::BIGINT AS exact_a,
                count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END)::BIGINT AS exact_b,
                count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                                    THEN user_id END)::BIGINT AS exact_union
         FROM events)
       SELECT exact_a, exact_b, exact_union,
              (exact_a + exact_b - exact_union)::BIGINT AS exact_intersection,
              true AS certified
       FROM a""",
    doc="HLL intersection estimate certified against the exact count: "
    "|A∩B| (users who clicked AND purchased) via inclusion-exclusion "
    "over three mergeable sketches — hll(A) + hll(B) - hll(A∪B), the "
    "union sketch being the cell-wise merge hll_union(skA, skB), never "
    "a rescan. Inclusion-exclusion COMPOUNDS the three sketches' "
    "errors (each ±rsd of its own cardinality), so the certification "
    "envelope is 3x the single-sketch bound TIMES THE UNION (the "
    "relative-to-intersection error can be arbitrarily large when the "
    "overlap is small — this query is also the standing documentation "
    "of that caveat). DELIBERATE one-sided certification like "
    "sketch_mergeable_rollup: the oracle pins the exact integers and "
    "certified=true; a parity failure IS the envelope being violated. "
    "Scale shape: ONE scan builds both sketches and all three exact "
    "tiers as conditional aggregates; at 100 TB only the sketch side "
    "runs, merged from per-partition partials.",
)
def q_sketch_hll_intersection(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select("event_type", "user_id")
    click = F.when(F.col("event_type") == "click", F.col("user_id"))
    purch = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    either = F.when(
        F.col("event_type").isin("click", "purchase"), F.col("user_id")
    )
    a = e.agg(
        F.hll_sketch_agg(click).alias("ska"),
        F.hll_sketch_agg(purch).alias("skb"),
        F.count_distinct(click).cast("long").alias("exact_a"),
        F.count_distinct(purch).cast("long").alias("exact_b"),
        F.count_distinct(either).cast("long").alias("exact_union"),
    )
    est_inter = (
        F.hll_sketch_estimate("ska")
        + F.hll_sketch_estimate("skb")
        - F.hll_sketch_estimate(F.hll_union("ska", "skb"))
    )
    exact_inter = F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
    return a.select(
        "exact_a",
        "exact_b",
        "exact_union",
        exact_inter.cast("long").alias("exact_intersection"),
        (
            F.abs(est_inter.cast("double") - exact_inter)
            <= 3 * _HLL_BOUND * F.col("exact_union")
        ).alias("certified"),
    )


@register(
    "streaming_psi_drift",
    _SREG["stats_psi_drift"].oracle,
    doc="Streaming twin of the PSI drift monitor, run for real: orders "
    "stream in (availableNow, several micro-batches) and foreachBatch "
    "reduces each batch to its OWN (bucket, orderdate-second) count "
    "partial landed at a batch-id-keyed path (idempotent overwrite). "
    "Counts keyed by (bucket, t) are a commutative monoid and the t "
    "domain is the DATE DOMAIN (orderdates are day-resolution), so the "
    "fold — sum partials, derive the (min+max)/2 midpoint from the "
    "folded key set, assign halves, densify the 10-bucket spine, same "
    "DECIMAL term sum — must equal the batch query EXACTLY (shared "
    "oracle with stats_psi_drift). This is the operational proof that "
    "the drift monitor can run incrementally: a 100 TB deployment "
    "stores per-window partials and re-derives PSI on every fold "
    "without rescanning history. Scale shape: per batch one scan-fused "
    "(bucket, t) aggregate; fold is O(batches x buckets x dates).",
)
def q_streaming_psi_drift(spark: SparkSession, sf: str):
    import os
    import shutil
    import tempfile

    orders = table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    run_dir = tempfile.mkdtemp(prefix="spark_graft_psi_")
    feed_dir = os.path.join(run_dir, "feed")
    store = os.path.join(run_dir, "store")
    try:
        orders.repartition(8).write.mode("overwrite").parquet(feed_dir)

        def partials(batch_df, batch_id):
            cells = (
                batch_df.select(
                    F.unix_timestamp("o_orderdate").cast("long").alias("t"),
                    F.least(
                        F.expr(
                            "CAST(round(o_totalprice * 100) AS BIGINT)"
                            " DIV 5000000"
                        ),
                        F.lit(9),
                    )
                    .cast("long")
                    .alias("bkt"),
                )
                .groupBy("bkt", "t")
                .agg(F.count("*").cast("long").alias("n"))
            )
            cells.write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

        stream = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", "3")
            .parquet(feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(partials)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        folded = (
            spark.read.parquet(store)
            .groupBy("bkt", "t")
            .agg(F.sum("n").cast("long").alias("n"))
            .localCheckpoint(eager=True)  # (bucket x date)-domain bounded
        )
        mid = folded.agg(
            F.expr("CAST((min(t) + max(t)) DIV 2 AS BIGINT)").alias("mid")
        )
        counts = (
            folded.crossJoin(F.broadcast(mid))
            .groupBy("bkt")
            .agg(
                F.sum(F.when(F.col("t") <= F.col("mid"), F.col("n")).otherwise(0))
                .cast("long")
                .alias("c1"),
                F.sum(F.when(F.col("t") > F.col("mid"), F.col("n")).otherwise(0))
                .cast("long")
                .alias("c2"),
            )
        )
        spine = spark.range(10).select(F.col("id").cast("long").alias("bkt"))
        dense = (
            spine.join(F.broadcast(counts), "bkt", "left")
            .select(
                "bkt",
                F.coalesce(F.col("c1"), F.lit(0)).cast("long").alias("c1"),
                F.coalesce(F.col("c2"), F.lit(0)).cast("long").alias("c2"),
            )
            .localCheckpoint(eager=True)
        )
        tot = dense.agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c2").cast("long").alias("n2"),
        )
        pi = (F.col("c1") + 1) / (F.col("n1") + 10.0)
        qi = (F.col("c2") + 1) / (F.col("n2") + 10.0)
        terms = dense.crossJoin(F.broadcast(tot)).select(
            "n1",
            "n2",
            F.round((pi - qi) * F.log(pi / qi), 9)
            .cast("decimal(20,9)")
            .alias("term"),
        )
        return (
            terms.groupBy("n1", "n2")
            .agg(F.round(F.sum("term").cast("double"), 6).alias("psi"))
            .select(
                F.col("n1").alias("n_first_half"),
                F.col("n2").alias("n_second_half"),
                "psi",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


# --- round-9 batch D: Cramér's V, NB fit, BH-FDR ----------------------------

_FDR_B = 199  # pinned replicates per hypothesis — p resolution 1/200
_FDR_ALPHA = 0.10


@register(
    "stats_cramers_v",
    """WITH obs AS (
         SELECT lang, source, count(*)::DOUBLE AS o
         FROM documents GROUP BY lang, source),
       rt AS (SELECT lang, sum(o) AS rl FROM obs GROUP BY lang),
       ct AS (SELECT source, sum(o) AS cl FROM obs GROUP BY source),
       n AS (SELECT sum(o) AS n FROM obs),
       cells AS (
         SELECT round(pow(o - rl * cl / n.n, 2) / (rl * cl / n.n), 9)
                  ::DECIMAL(20,9) AS term
         FROM obs JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n),
       dims AS (
         SELECT (SELECT count(*) FROM rt)::BIGINT AS nl,
                (SELECT count(*) FROM ct)::BIGINT AS ns,
                (SELECT n FROM n) AS n),
       agg AS (SELECT CAST(sum(term) AS DOUBLE) AS chi2 FROM cells)
       SELECT round(a.chi2, 6) AS chi2,
              (d.nl - 1) * (d.ns - 1) AS dof,
              d.n::BIGINT AS n,
              round(sqrt(a.chi2 / (d.n * (least(d.nl, d.ns) - 1))), 6)
                AS cramers_v
       FROM agg a, dims d""",
    doc="Cramér's V effect size for the lang x source association — the "
    "magnitude companion to stats_chi_square_independence (chi-square "
    "says WHETHER the contingency departs from independence; V = "
    "sqrt(chi2 / (N (min(r,c) - 1))) in [0,1] says HOW MUCH, "
    "comparable across table sizes). Same cells construction: per-cell "
    "terms rounded to 9 dp and decimal-summed, one shared chi2 feeding "
    "both outputs. Scale shape: one scan into the categories² "
    "contingency aggregate; everything after runs on domain tables.",
)
def q_stats_cramers_v(spark: SparkSession, sf: str):
    obs = (
        table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("double").alias("o"))
        .transform(ckpt)  # categories^2 rows; feeds 4 branches
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("cl"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                F.pow(F.col("o") - F.col("rl") * F.col("cl") / F.col("n"), 2)
                / (F.col("rl") * F.col("cl") / F.col("n")),
                9,
            )
            .cast("decimal(20,9)")
            .alias("term")
        )
    )
    dims = (
        rt.agg(F.count("*").cast("long").alias("nl"))
        .crossJoin(F.broadcast(ct.agg(F.count("*").cast("long").alias("ns"))))
        .crossJoin(F.broadcast(n))
    )
    agg = cells.agg(F.sum("term").cast("double").alias("chi2"))
    return agg.crossJoin(F.broadcast(dims)).select(
        F.round(F.col("chi2"), 6).alias("chi2"),
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("nl"), F.col("ns")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "stats_negative_binomial_fit",
    """WITH pc AS (
         SELECT event_type, user_id, count(*)::BIGINT AS c
         FROM events GROUP BY event_type, user_id),
       m AS (SELECT event_type, count(*)::BIGINT AS n_users,
                    sum(c)::BIGINT AS s,
                    sum(c::DECIMAL(38,0) * c)::DECIMAL(38,0) AS q
             FROM pc GROUP BY event_type),
       v AS (SELECT event_type, n_users,
                    CAST(s AS DOUBLE) / n_users AS mean,
                    (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_users)
                      / (n_users - 1) AS var
             FROM m)
       SELECT event_type, n_users,
              round(mean, 6) AS mean_count,
              round(var, 6) AS var_count,
              var > mean AS overdispersed,
              round(CASE WHEN var > mean
                         THEN mean * mean / (var - mean) END, 6) AS nb_r,
              round(CASE WHEN var > mean THEN mean / var END, 6) AS nb_p
       FROM v""",
    doc="Method-of-moments negative-binomial fit of per-user event "
    "counts, per event type: r = m²/(v-m), p = m/v — the parametric "
    "follow-through to stats_overdispersion (which only flags v > m; "
    "this hands the modeler the NB(r, p) a count model would use, with "
    "NULL parameters where the Poisson already fits). Moments are "
    "exact (Σc BIGINT, Σc² DECIMAL); mean/variance/r/p are one shared "
    "IEEE tree rounded once each. Scale shape: one (type, user) "
    "key-shuffle rollup, then a 5-group aggregate — the same shuffle "
    "the overdispersion gate already pays.",
)
def q_stats_negative_binomial_fit(spark: SparkSession, sf: str):
    pc = (
        events_table(spark, sf)
        .groupBy("event_type", "user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    m = pc.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n_users")
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_users")
    ) / (F.col("n_users") - 1)
    return m.select(
        "event_type",
        "n_users",
        F.round(mean, 6).alias("mean_count"),
        F.round(var, 6).alias("var_count"),
        (var > mean).alias("overdispersed"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)), 6
        ).alias("nb_r"),
        F.round(F.when(var > mean, mean / var), 6).alias("nb_p"),
    )


@register(
    "stats_bh_fdr",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day, event_type, sum(cents)::BIGINT AS x
             FROM e GROUP BY day, event_type),
       o AS (SELECT event_type,
               sum(CASE WHEN {md5_hash64_sql("'fdr:' || day::VARCHAR")} % 2 = 0
                        THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN {md5_hash64_sql("'fdr:' || day::VARCHAR")} % 2 = 0
                        THEN x ELSE 0 END)::BIGINT AS s0,
               sum(CASE WHEN {md5_hash64_sql("'fdr:' || day::VARCHAR")} % 2 = 1
                        THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN {md5_hash64_sql("'fdr:' || day::VARCHAR")} % 2 = 1
                        THEN x ELSE 0 END)::BIGINT AS s1
             FROM d GROUP BY event_type),
       reps AS (
         SELECT r.b, dd.event_type, dd.x,
                {md5_hash64_sql("'fdr:' || b::VARCHAR || ':' || day::VARCHAR")}
                  % 2 AS arm
         FROM d dd
         CROSS JOIN (SELECT unnest(range(1, {_FDR_B} + 1)) AS b) r),
       pm AS (SELECT event_type, b,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
               sum(CASE WHEN arm = 0 THEN x ELSE 0 END)::BIGINT AS s0,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN arm = 1 THEN x ELSE 0 END)::BIGINT AS s1
              FROM reps GROUP BY event_type, b),
       pv AS (SELECT p.event_type,
               round((1.0 + sum(CASE WHEN
                 abs(CAST(p.s0 AS DOUBLE) * p.n1 - CAST(p.s1 AS DOUBLE) * p.n0)
                   * (CAST(o.n0 AS DOUBLE) * o.n1)
                 >= abs(CAST(o.s0 AS DOUBLE) * o.n1
                        - CAST(o.s1 AS DOUBLE) * o.n0)
                   * (CAST(p.n0 AS DOUBLE) * p.n1)
                 THEN 1 ELSE 0 END))
                / ({_FDR_B} + 1.0), 6) AS p_value
              FROM pm p JOIN o ON o.event_type = p.event_type
              GROUP BY p.event_type, o.n0, o.s0, o.n1, o.s1),
       ranked AS (
         SELECT event_type, p_value,
                row_number() OVER (ORDER BY p_value, event_type) AS rk,
                count(*) OVER () AS m
         FROM pv),
       thr AS (SELECT coalesce(max(CASE WHEN p_value
                                          <= {_FDR_ALPHA} * rk / m
                                        THEN p_value END), -1.0) AS t
               FROM ranked)
       SELECT r.event_type, r.p_value, r.rk::BIGINT AS rank,
              round({_FDR_ALPHA} * r.rk / r.m, 6) AS bh_critical,
              r.p_value <= t.t AS rejected
       FROM ranked r, thr t""",
    doc="Benjamini-Hochberg FDR control over a FAMILY of five "
    "distribution-free permutation tests (one per event type, daily "
    "revenue A/A arms, the stats_permutation_test machinery with a "
    f"per-hypothesis pinned B={_FDR_B}): p-values from the add-one "
    "permutation count, then the BH step-up — rank ascending p, find "
    f"the largest p_i <= alpha i/m at alpha={_FDR_ALPHA}, reject "
    "everything at or below it. This is the multiple-testing layer "
    "every metrics platform needs above its per-test family (running "
    "five uncorrected tests at alpha=0.1 false-alarms ~40% of the "
    "time); under A/A the rejection set calibrates to empty almost "
    "always. The day-replicate re-randomization is shared across "
    "hypotheses (one hash per (day, b), types ride the same spine), "
    "so the hash volume stays days x B — date-domain bounded. The "
    "rank window runs over the 5-row p-value table (structural). "
    "Scale shape: one (day, type) rollup, a days x B x types "
    "domain cross, one (type, b) aggregate, 5-row arithmetic.",
)
def q_stats_bh_fdr(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = (
        e.groupBy("day", "event_type")
        .agg(F.sum("cents").cast("long").alias("x"))
        .transform(ckpt)  # (date x type)-domain bounded
    )
    arm_obs = (
        md5_hash64(F.concat(F.lit("fdr:"), F.col("day").cast("string"))) % 2
    )
    def _arms(df, keys, arm):
        return df.groupBy(*keys).agg(
            F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n0"),
            F.sum(F.when(arm == 0, F.col("x")).otherwise(0))
            .cast("long")
            .alias("s0"),
            F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(arm == 1, F.col("x")).otherwise(0))
            .cast("long")
            .alias("s1"),
        )

    o = _arms(d, ["event_type"], arm_obs).select(
        "event_type",
        F.col("n0").alias("on0"),
        F.col("s0").alias("os0"),
        F.col("n1").alias("on1"),
        F.col("s1").alias("os1"),
    )
    reps = d.crossJoin(
        F.broadcast(spark.range(1, _FDR_B + 1).withColumnRenamed("id", "b"))
    ).select(
        "b",
        "event_type",
        "x",
        (
            md5_hash64(
                F.concat_ws(
                    "",
                    F.lit("fdr:"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("day").cast("string"),
                )
            )
            % 2
        ).alias("arm"),
    )
    pm = _arms(reps, ["event_type", "b"], F.col("arm"))
    lhs = F.abs(
        F.col("s0").cast("double") * F.col("n1")
        - F.col("s1").cast("double") * F.col("n0")
    ) * (F.col("on0").cast("double") * F.col("on1"))
    rhs = F.abs(
        F.col("os0").cast("double") * F.col("on1")
        - F.col("os1").cast("double") * F.col("on0")
    ) * (F.col("n0").cast("double") * F.col("n1"))
    pv = (
        pm.join(F.broadcast(o), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                (1.0 + F.sum(F.when(lhs >= rhs, 1).otherwise(0)))
                / (_FDR_B + 1.0),
                6,
            ).alias("p_value")
        )
    )
    w = Window.orderBy("p_value", "event_type")
    ranked = pv.select(
        "event_type",
        "p_value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    ).transform(ckpt)  # 5 rows; feeds threshold + report
    thr = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value") <= _FDR_ALPHA * F.col("rk") / F.col("m"),
                    F.col("p_value"),
                )
            ),
            F.lit(-1.0),
        ).alias("t")
    )
    return ranked.crossJoin(F.broadcast(thr)).select(
        "event_type",
        "p_value",
        F.col("rk").cast("long").alias("rank"),
        F.round(_FDR_ALPHA * F.col("rk") / F.col("m"), 6).alias("bh_critical"),
        (F.col("p_value") <= F.col("t")).alias("rejected"),
    )


# --- round-9 batch E: paired/blocked nonparametrics -------------------------


@register(
    "stats_wilcoxon_signed_rank",
    f"""WITH {DAILY_TYPE_COUNTS_CTE},
       dd AS (SELECT day, x - y AS df FROM d WHERE x - y != 0),
       av AS (SELECT abs(df)::BIGINT AS ad, count(*)::BIGINT AS k,
                     sum(CASE WHEN df > 0 THEN 1 ELSE 0 END)::BIGINT AS kp
              FROM dd GROUP BY abs(df)),
       ranked AS (
         SELECT ad, k, kp,
                coalesce(sum(k) OVER (ORDER BY ad
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS cb
         FROM av),
       agg AS (
         SELECT sum(k)::BIGINT AS n,
                sum(kp * (2 * cb + k + 1))::BIGINT AS w2,
                sum(k::DECIMAL(38,0) * k * k - k)::DECIMAL(38,0) AS t_dec
         FROM ranked)
       SELECT n AS n_pairs, w2 AS w_plus_doubled, t_dec::BIGINT AS t_ties,
              round((w2 / 2.0 - n * (n + 1) / 4.0)
                    / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0
                           - CAST(t_dec AS DOUBLE) / 48.0), 4) AS z_score
       FROM agg""",
    doc="Wilcoxon signed-rank test on the PAIRED daily (clicks, "
    "purchases) series — the paired companion to stats_mann_whitney "
    "(same exchangeable-days framing as the permutation family, but "
    "rank-based and sign-symmetric): nonzero daily differences ranked "
    "by |d| with tie midranks kept integral via the doubled-rank "
    "discipline (2R = 2·cum_before + k + 1 per distinct |d|), "
    "W+ from the positive-difference ranks, tie term Σ(k³-k), and the "
    "tie-corrected normal approximation z — the only floats are the "
    "final shared expression over exact integers. The rank cumulative "
    "runs over the DISTINCT-|d| table, bounded by the date domain. "
    "Scale shape: one map-side-combinable daily rollup, a "
    "days-bounded cumulative, 1-row output.",
)
def q_stats_wilcoxon_signed_rank(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    d = daily_type_counts(spark, sf)
    dd = d.select((F.col("x") - F.col("y")).alias("df")).filter(F.col("df") != 0)
    av = dd.groupBy(F.abs(F.col("df")).cast("long").alias("ad")).agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.when(F.col("df") > 0, 1).otherwise(0)).cast("long").alias("kp"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = av.withColumn(
        "cb", F.coalesce(F.sum("k").over(w), F.lit(0)).cast("long")
    )
    agg = ranked.agg(
        F.sum("k").cast("long").alias("n"),
        F.sum(F.col("kp") * (2 * F.col("cb") + F.col("k") + 1))
        .cast("long")
        .alias("w2"),
        F.sum(
            F.col("k").cast("decimal(38,0)") * F.col("k") * F.col("k")
            - F.col("k")
        )
        .cast("decimal(38,0)")
        .alias("t_dec"),
    )
    n = F.col("n")
    return agg.select(
        n.alias("n_pairs"),
        F.col("w2").alias("w_plus_doubled"),
        F.col("t_dec").cast("long").alias("t_ties"),
        F.round(
            (F.col("w2") / 2.0 - n * (n + 1) / 4.0)
            / F.sqrt(
                n * (n + 1.0) * (2 * n + 1) / 24.0
                - F.col("t_dec").cast("double") / 48.0
            ),
            4,
        ).alias("z_score"),
    )


@register(
    "stats_friedman_test",
    """WITH c AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, count(*)::BIGINT AS cnt
         FROM events GROUP BY day, event_type),
       days AS (SELECT DISTINCT day FROM c),
       types AS (SELECT DISTINCT event_type FROM c),
       dense AS (
         SELECT d.day, t.event_type, coalesce(c.cnt, 0)::BIGINT AS cnt
         FROM days d CROSS JOIN types t
         LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type),
       grp AS (SELECT day, cnt, count(*)::BIGINT AS k FROM dense
               GROUP BY day, cnt),
       ranked AS (
         SELECT day, cnt, k,
                coalesce(sum(k) OVER (PARTITION BY day ORDER BY cnt
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS cb
         FROM grp),
       r2 AS (SELECT d.day, d.event_type,
                     (2 * r.cb + r.k + 1)::BIGINT AS rr2
              FROM dense d
              JOIN ranked r ON r.day = d.day AND r.cnt = d.cnt),
       rj AS (SELECT event_type, sum(rr2)::BIGINT AS rj2 FROM r2
              GROUP BY event_type),
       dims AS (SELECT (SELECT count(*) FROM days)::BIGINT AS n,
                       (SELECT count(*) FROM types)::BIGINT AS k),
       parts AS (
         SELECT (SELECT sum(rj2::DECIMAL(38,0) * rj2) FROM rj)
                  ::DECIMAL(38,0) AS sum_rj2_sq,
                (SELECT sum(rr2::DECIMAL(38,0) * rr2) FROM r2)
                  ::DECIMAL(38,0) AS a2,
                n, k
         FROM dims)
       SELECT n AS n_blocks, k,
              round((k - 1.0)
                    * (CAST(sum_rj2_sq AS DOUBLE)
                       - CAST(n AS DOUBLE) * n * k * (k + 1) * (k + 1))
                    / (CAST(a2 AS DOUBLE)
                       - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1)),
                    4) AS chi2_f
       FROM parts""",
    doc="Friedman test over (day blocks x 5 event-type treatments) daily "
    "activity counts — the k-sample repeated-measures nonparametric "
    "(one-way blocked ANOVA on ranks; completes the family: "
    "Mann-Whitney = 2 unpaired, Wilcoxon = 2 paired, Kruskal class "
    "k unpaired, Friedman = k BLOCKED): within-day ranks with tie "
    "midranks via the doubled-rank discipline, per-treatment rank sums "
    "Rj, and the Conover tie-general statistic "
    "chi2 = (k-1)(ΣRj² - n²k(k+1)²)/(A - nk(k+1)²) evaluated in the "
    "DOUBLED-rank scale where every Σ is an exact integer (the "
    "identity holds verbatim with 2R everywhere). Day-partitioned rank "
    "windows see k<=5 rows each; the day x type densification is a "
    "domain cross. Scale shape: one (day, type) rollup, bounded "
    "windows, 1-row output.",
)
def q_stats_friedman_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = (
        events_table(spark, sf)
        .select(F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
        .transform(ckpt)  # (date x type)-domain bounded
    )
    days = c.select("day").distinct()
    types = c.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(F.broadcast(c), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
        .transform(ckpt)
    )
    grp = dense.groupBy("day", "cnt").agg(F.count("*").cast("long").alias("k"))
    w = (
        Window.partitionBy("day")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = grp.withColumn(
        "cb", F.coalesce(F.sum("k").over(w), F.lit(0)).cast("long")
    )
    r2 = dense.join(F.broadcast(ranked), ["day", "cnt"]).select(
        "day",
        "event_type",
        (2 * F.col("cb") + F.col("k") + 1).cast("long").alias("rr2"),
    ).transform(ckpt)  # feeds rank sums + A2
    rj = r2.groupBy("event_type").agg(F.sum("rr2").cast("long").alias("rj2"))
    sum_rj2_sq = rj.agg(
        F.sum(F.col("rj2").cast("decimal(38,0)") * F.col("rj2"))
        .cast("decimal(38,0)")
        .alias("sum_rj2_sq")
    )
    a2 = r2.agg(
        F.sum(F.col("rr2").cast("decimal(38,0)") * F.col("rr2"))
        .cast("decimal(38,0)")
        .alias("a2")
    )
    dims = days.agg(F.count("*").cast("long").alias("n")).crossJoin(
        F.broadcast(types.agg(F.count("*").cast("long").alias("k")))
    )
    n, k = F.col("n"), F.col("k")
    return (
        sum_rj2_sq.crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(dims))
        .select(
            n.alias("n_blocks"),
            "k",
            F.round(
                (k - 1.0)
                * (
                    F.col("sum_rj2_sq").cast("double")
                    - n.cast("double") * n * k * (k + 1) * (k + 1)
                )
                / (
                    F.col("a2").cast("double")
                    - n.cast("double") * k * (k + 1) * (k + 1)
                ),
                4,
            ).alias("chi2_f"),
        )
    )


# --- round-9 batch F: Kruskal-Wallis, Ljung-Box ------------------------------


@register(
    "stats_kruskal_wallis",
    """WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       vg AS (SELECT cents, grp, count(*)::BIGINT AS kj
              FROM c GROUP BY cents, grp),
       v AS (SELECT cents, sum(kj)::BIGINT AS k,
                    (cents // 1048576)::BIGINT AS bkt
             FROM vg GROUP BY cents),
       ranked AS (
         SELECT cents, k, bkt,
                sum(k) OVER (PARTITION BY bkt ORDER BY cents
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cw_in
         FROM v),
       bc AS (SELECT bkt, sum(k)::BIGINT AS bw FROM v GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(bw) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       mid AS (SELECT r.cents,
                      (2 * (f.o + r.cw_in - r.k) + r.k + 1)::BIGINT AS mid2,
                      r.k
               FROM ranked r JOIN off f USING (bkt)),
       rj AS (SELECT g.grp, sum(g.kj)::BIGINT AS nj,
                     sum(g.kj * m.mid2)::BIGINT AS rj2
              FROM vg g JOIN mid m ON m.cents = g.cents
              GROUP BY g.grp),
       ties AS (SELECT sum(k::DECIMAL(38,0) * k * k - k)::DECIMAL(38,0) AS t
                FROM v),
       agg AS (SELECT count(*)::BIGINT AS kg, sum(nj)::BIGINT AS n,
                      sum(round(CAST(rj2 AS DOUBLE) * rj2 / nj, 6)
                          ::DECIMAL(30,6)) AS s
               FROM rj)
       SELECT a.kg AS k_groups, a.n AS n_total,
              t.t::BIGINT AS t_ties,
              round((12.0 / (4.0 * a.n * (a.n + 1)) * CAST(a.s AS DOUBLE)
                     - 3.0 * (a.n + 1))
                    / (1.0 - CAST(t.t AS DOUBLE)
                             / (CAST(a.n AS DOUBLE) * a.n * a.n - a.n)),
                    4) AS h_stat
       FROM agg a, ties t""",
    doc="Kruskal-Wallis H over the five order-priority groups — the "
    "k-sample UNPAIRED nonparametric that completes the 2x2 rank-test "
    "family (Mann-Whitney 2-unpaired / Wilcoxon 2-paired / Friedman "
    "k-blocked / KW k-unpaired), and the robust twin of "
    "stats_anova_oneway. Global tie midranks stay integral via the "
    "doubled-rank discipline over DISTINCT cent values, located with "
    "the stats_weighted_median two-level prefix sum (in-bucket "
    "cumulatives partitioned by 2^20-cent bucket + a cumulated offset "
    "over the tiny bucket table — never a global unpartitioned window "
    "over values); per-group rank sums come from the (value, group) "
    "rollup joined to the midrank table. H is evaluated in the doubled "
    "scale (Sum Rj2^2/(4 nj) folded into 12/(4 N(N+1))) with the "
    "standard tie correction 1 - Sum(k^3-k)/(N^3-N). Scale shape: one "
    "(value, group) rollup, bounded-domain windows, a value-key join, "
    "5-row + 1-row arithmetic.",
)
def q_stats_kruskal_wallis(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    vg = (
        c.groupBy("cents", "grp")
        .agg(F.count("*").cast("long").alias("kj"))
        .transform(ckpt)  # value x group domain; feeds 2 branches
    )
    v = (
        vg.groupBy("cents")
        .agg(F.sum("kj").cast("long").alias("k"))
        .withColumn("bkt", F.expr("CAST(cents DIV 1048576 AS BIGINT)"))
        .transform(ckpt)
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = v.withColumn("cw_in", F.sum("k").over(w_in).cast("long"))
    bc = v.groupBy("bkt").agg(F.sum("k").cast("long").alias("bw"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.withColumn(
        "o", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).cast("long")
    ).select("bkt", "o")
    mid = ranked.join(F.broadcast(off), "bkt").select(
        "cents",
        "k",
        (2 * (F.col("o") + F.col("cw_in") - F.col("k")) + F.col("k") + 1)
        .cast("long")
        .alias("mid2"),
    )
    rj = (
        vg.join(mid.select("cents", "mid2"), "cents")
        .groupBy("grp")
        .agg(
            F.sum("kj").cast("long").alias("nj"),
            F.sum(F.col("kj") * F.col("mid2")).cast("long").alias("rj2"),
        )
    )
    ties = v.agg(
        F.sum(
            F.col("k").cast("decimal(38,0)") * F.col("k") * F.col("k")
            - F.col("k")
        )
        .cast("decimal(38,0)")
        .alias("t")
    )
    agg = rj.agg(
        F.count("*").cast("long").alias("kg"),
        F.sum("nj").cast("long").alias("n"),
        F.sum(
            F.round(
                F.col("rj2").cast("double") * F.col("rj2") / F.col("nj"), 6
            ).cast("decimal(30,6)")
        ).alias("s"),
    )
    n = F.col("n")
    return agg.crossJoin(F.broadcast(ties)).select(
        F.col("kg").alias("k_groups"),
        n.alias("n_total"),
        F.col("t").cast("long").alias("t_ties"),
        F.round(
            (12.0 / (4.0 * n * (n + 1)) * F.col("s").cast("double") - 3.0 * (n + 1))
            / (
                1.0
                - F.col("t").cast("double")
                / (n.cast("double") * n * n - n)
            ),
            4,
        ).alias("h_stat"),
    )


@register(
    "stats_ljung_box",
    f"""WITH {DAILY_CENTS_CTE},
       m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxx
             FROM d),
       l AS (SELECT unnest(range(1, 6))::BIGINT AS lag),
       p AS (SELECT l.lag, a.x AS ya, b.x AS yb
             FROM d a CROSS JOIN l JOIN d b ON b.day = a.day + l.lag),
       pl AS (SELECT lag, count(*)::BIGINT AS np,
                     sum(ya)::BIGINT AS sa, sum(yb)::BIGINT AS sb,
                     sum(ya::DECIMAL(38,0) * yb)::DECIMAL(38,0) AS sxy
              FROM p GROUP BY lag),
       rho AS (
         SELECT pl.lag,
                (CAST(pl.sxy AS DOUBLE)
                 - (CAST(m.sx AS DOUBLE) / m.n) * (pl.sa + pl.sb)
                 + pl.np * (CAST(m.sx AS DOUBLE) / m.n)
                   * (CAST(m.sx AS DOUBLE) / m.n))
                / (CAST(m.sxx AS DOUBLE)
                   - CAST(m.sx AS DOUBLE) * m.sx / m.n) AS r,
                m.n
         FROM pl, m),
       q AS (SELECT max(n)::BIGINT AS n,
                    sum(round(r * r / (n - lag), 12)::DECIMAL(25,12)) AS body
             FROM rho)
       SELECT n AS n_days, 5 AS n_lags,
              round(n * (n + 2.0) * CAST(body AS DOUBLE), 4) AS q_stat
       FROM q""",
    doc="Ljung-Box portmanteau test on the daily revenue series at lags "
    "1..5 — the 'is there ANY autocorrelation left' gate that "
    "complements timeseries_acf's per-lag view (Q is what a "
    "forecasting pipeline checks on its residuals; compare to "
    "chi-square with 5 df). Uses the STANDARD single-mean estimator "
    "rho_h = Sum (x_t - xbar)(x_(t+h) - xbar) / Sum (x_t - xbar)^2 "
    "expanded into exact integer moment sums (full-series n/Sx/Sxx, "
    "per-lag pair sums via the day+h equi-join — the ACF query's "
    "pairing convention over the contiguous date domain); per-lag "
    "rho^2/(n-h) terms round to 12 dp and re-accumulate as DECIMAL so "
    "both engines sum identical addends, one final rounding. Scale "
    "shape: one date-domain daily rollup, a 5-way lag join over that "
    "tiny table, 1-row output.",
)
def q_stats_ljung_box(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    lags = spark.range(1, 6).select(F.col("id").cast("long").alias("lag"))
    a = d.select(F.col("day").alias("da"), F.col("x").alias("ya"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("yb"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    pl = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("np"),
        F.sum("ya").cast("long").alias("sa"),
        F.sum("yb").cast("long").alias("sb"),
        F.sum(F.col("ya").cast("decimal(38,0)") * F.col("yb")).alias("sxy"),
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    r = (
        F.col("sxy").cast("double")
        - xbar * (F.col("sa") + F.col("sb"))
        + F.col("np") * xbar * xbar
    ) / (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    rho = pl.crossJoin(F.broadcast(m)).select(
        "lag", r.alias("r"), "n"
    )
    q = rho.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.round(
                F.col("r") * F.col("r") / (F.col("n") - F.col("lag")), 12
            ).cast("decimal(25,12)")
        ).alias("body"),
    )
    return q.select(
        F.col("n").alias("n_days"),
        F.lit(5).cast("int").alias("n_lags"),
        F.round(
            F.col("n") * (F.col("n") + 2.0) * F.col("body").cast("double"), 4
        ).alias("q_stat"),
    )


# --- round-9 batch G: Mood's median test -------------------------------------


@register(
    "stats_mood_median_test",
    """WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       v AS (SELECT cents, count(*)::BIGINT AS k,
                    (cents // 1048576)::BIGINT AS bkt
             FROM c GROUP BY cents),
       ranked AS (
         SELECT cents, k, bkt,
                sum(k) OVER (PARTITION BY bkt ORDER BY cents
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cw_in
         FROM v),
       bc AS (SELECT bkt, sum(k)::BIGINT AS bw FROM v GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(bw) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       tot AS (SELECT sum(k)::BIGINT AS n FROM v),
       med AS (SELECT min(CASE WHEN 2 * (f.o + r.cw_in) >= t.n
                               THEN r.cents END)::BIGINT AS med
               FROM ranked r JOIN off f USING (bkt), tot t),
       cls AS (SELECT c.grp,
                      count(*)::BIGINT AS n_g,
                      sum(CASE WHEN c.cents > m.med THEN 1 ELSE 0 END)
                        ::BIGINT AS above
               FROM c, med m GROUP BY c.grp),
       g AS (SELECT sum(n_g)::BIGINT AS n, sum(above)::BIGINT AS a FROM cls),
       terms AS (
         SELECT round(pow(cls.above - cls.n_g * (CAST(g.a AS DOUBLE) / g.n),
                          2)
                      / (cls.n_g * (CAST(g.a AS DOUBLE) / g.n)), 9)
                  ::DECIMAL(20,9)
                + round(pow((cls.n_g - cls.above)
                            - cls.n_g * (1.0 - CAST(g.a AS DOUBLE) / g.n), 2)
                        / (cls.n_g * (1.0 - CAST(g.a AS DOUBLE) / g.n)), 9)
                  ::DECIMAL(20,9) AS term
         FROM cls, g)
       SELECT (SELECT count(*) FROM cls)::BIGINT AS k_groups,
              (SELECT n FROM g) AS n_total,
              (SELECT med FROM med) AS grand_median_cents,
              round(CAST(sum(term) AS DOUBLE), 4) AS chi2_mood
       FROM terms""",
    doc="Mood's median test over the five order-priority groups: classify "
    "every order above/at-or-below the GRAND median (the exact lower "
    "median via the weighted-median two-level prefix sum over distinct "
    "cent values), then the chi-square of the groups x {above, not} "
    "contingency against the pooled proportion — the coarsest, most "
    "outlier-proof of the k-sample location tests (it only looks at "
    "median crossings, so it survives distributions where even "
    "Kruskal-Wallis's rank machinery is distorted; the three-way "
    "ANOVA / KW / Mood comparison is the standard robustness ladder). "
    "Per-cell (O-E)^2/E terms round to 9 dp and sum as DECIMAL. Scale "
    "shape: one value rollup + bounded-domain windows for the median, "
    "one 1-row median broadcast back over the scan into a 5-group "
    "aggregate, 1-row output.",
)
def q_stats_mood_median_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    v = (
        c.groupBy("cents")
        .agg(F.count("*").cast("long").alias("k"))
        .withColumn("bkt", F.expr("CAST(cents DIV 1048576 AS BIGINT)"))
        .transform(ckpt)  # value-domain; feeds 3 branches
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = v.withColumn("cw_in", F.sum("k").over(w_in).cast("long"))
    bc = v.groupBy("bkt").agg(F.sum("k").cast("long").alias("bw"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.withColumn(
        "o", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).cast("long")
    ).select("bkt", "o")
    tot = v.agg(F.sum("k").cast("long").alias("n"))
    med = (
        ranked.join(F.broadcast(off), "bkt")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    2 * (F.col("o") + F.col("cw_in")) >= F.col("n"),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("med")
        )
    )
    cls = (
        c.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum(F.when(F.col("cents") > F.col("med"), 1).otherwise(0))
            .cast("long")
            .alias("above"),
        )
        .transform(ckpt)  # 5 rows; feeds totals + terms
    )
    g = cls.agg(
        F.sum("n_g").cast("long").alias("n"), F.sum("above").cast("long").alias("a")
    )
    p = F.col("a").cast("double") / F.col("n")
    e_above = F.col("n_g") * p
    e_below = F.col("n_g") * (1.0 - p)
    term = (
        F.round(F.pow(F.col("above") - e_above, 2) / e_above, 9).cast(
            "decimal(20,9)"
        )
        + F.round(
            F.pow((F.col("n_g") - F.col("above")) - e_below, 2) / e_below, 9
        ).cast("decimal(20,9)")
    )
    terms = cls.crossJoin(F.broadcast(g)).select(term.alias("term"))
    kg = cls.agg(F.count("*").cast("long").alias("k_groups"))
    return (
        terms.agg(F.round(F.sum("term").cast("double"), 4).alias("chi2_mood"))
        .crossJoin(F.broadcast(kg))
        .crossJoin(F.broadcast(g.select(F.col("n").alias("n_total"))))
        .crossJoin(F.broadcast(med.select(F.col("med").alias("grand_median_cents"))))
        .select("k_groups", "n_total", "grand_median_cents", "chi2_mood")
    )


# --- round-10 batch A: sequential/time-series diagnostics -------------------
#
# Parity discipline for the family: exact BIGINT/DECIMAL aggregates, each
# double term rounded to 9 dp and summed as DECIMAL, one final rounding;
# boolean flags always compare ROUNDED values so they can never disagree
# with the printed number.

_PH_DELTA_FRAC = 0.005  # drift allowance as a fraction of the global mean
_PH_LAMBDA_FRAC = 0.05  # alarm threshold as a fraction of the global mean


@register(
    "stats_page_hinkley",
    f"""WITH {DAILY_CENTS_CTE},
       g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM d),
       par AS (SELECT round({_PH_DELTA_FRAC} * CAST(s AS DOUBLE) / n, 4) AS delta,
                      round({_PH_LAMBDA_FRAC} * CAST(s AS DOUBLE) / n, 4) AS lam
               FROM g),
       o AS (SELECT day, x,
                    row_number() OVER (ORDER BY day) AS t,
                    sum(x) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
             FROM d),
       t1 AS (SELECT day, t,
                     round(x - CAST(cum AS DOUBLE) / t - p.delta, 9)
                       ::DECIMAL(20,9) AS term
              FROM o, par p),
       m AS (SELECT day, t,
                    sum(term) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                      AS mt
             FROM t1),
       mm AS (SELECT day, mt,
                     min(mt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                       AS minm
              FROM m)
       SELECT day, round(CAST(mt AS DOUBLE), 4) AS ph_m,
              round(CAST(mt - minm AS DOUBLE), 4) AS gap,
              round(CAST(mt - minm AS DOUBLE), 4) > p.lam AS alarm
       FROM mm, par p""",
    doc="Page-Hinkley mean-INCREASE detector over the daily revenue "
    "series — the ONLINE sequential companion to events_changepoint_"
    "cusum (which locates a shift retrospectively) and stats_psi_drift "
    "(distribution shape): m_t = sum_(i<=t)(x_i - xbar_i - delta) with "
    "the running mean xbar_i, alarm when m_t - min_(i<=t) m_i exceeds "
    "lambda. delta/lambda are pinned FRACTIONS of the global mean "
    f"({_PH_DELTA_FRAC}/{_PH_LAMBDA_FRAC}), so the detector is "
    "scale-free across sf. Each term rounds to 9 dp and cumulates as "
    "DECIMAL (running sums are order-defined but the decimal sum "
    "removes any accumulation sensitivity); the alarm compares the "
    "4-dp-rounded gap to the 4-dp-rounded threshold. Scale shape: one "
    "map-side-combinable daily rollup, then windows over the bounded "
    "DATE DOMAIN (~30 rows at any sf); 1-row global mean broadcast.",
)
def q_stats_page_hinkley(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    return _page_hinkley_report(daily_cents(spark, sf))


def _page_hinkley_report(d):
    """The exact PH computation over a ``(day, x)`` daily series — shared
    by the batch query and its streaming twin (same oracle)."""
    from pyspark.sql import Window

    g = d.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    par = g.select(
        F.round(
            F.lit(_PH_DELTA_FRAC) * F.col("s").cast("double") / F.col("n"), 4
        ).alias("delta"),
        F.round(
            F.lit(_PH_LAMBDA_FRAC) * F.col("s").cast("double") / F.col("n"), 4
        ).alias("lam"),
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    o = d.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("x").over(w_run).cast("long").alias("cum"),
    )
    t1 = o.crossJoin(F.broadcast(par)).select(
        "day",
        "lam",
        F.round(
            F.col("x") - F.col("cum").cast("double") / F.col("t") - F.col("delta"),
            9,
        )
        .cast("decimal(20,9)")
        .alias("term"),
    )
    m = t1.select("day", "lam", F.sum("term").over(w_run).alias("mt"))
    mm = m.select("day", "lam", "mt", F.min("mt").over(w_run).alias("minm"))
    gap = F.round((F.col("mt") - F.col("minm")).cast("double"), 4)
    return mm.select(
        "day",
        F.round(F.col("mt").cast("double"), 4).alias("ph_m"),
        gap.alias("gap"),
        (gap > F.col("lam")).alias("alarm"),
    )


_DF_CRIT_5PCT = -2.93  # tau_mu 5% critical value (constant-only DF, n ~ 30)


@register(
    "stats_dickey_fuller",
    f"""WITH {DAILY_CENTS_CTE},
       o AS (SELECT day, x, lag(x) OVER (ORDER BY day) AS xp FROM d),
       p AS (SELECT (x - xp)::BIGINT AS y, xp AS z FROM o WHERE xp IS NOT NULL),
       s AS (SELECT count(*)::BIGINT AS m,
                    sum(z)::BIGINT AS sz, sum(y)::BIGINT AS sy,
                    sum(z::DECIMAL(38,0) * z)::DECIMAL(38,0) AS szz,
                    sum(z::DECIMAL(38,0) * y)::DECIMAL(38,0) AS szy,
                    sum(y::DECIMAL(38,0) * y)::DECIMAL(38,0) AS syy
             FROM p),
       c AS (SELECT m,
                    CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / m AS vzz,
                    CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * sy / m AS vzy,
                    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m AS vyy
             FROM s)
       SELECT m AS n_diffs,
              round(vzy / vzz, 6) AS rho_hat,
              round((vzy / vzz)
                    / sqrt(((vyy - vzy * vzy / vzz) / (m - 2)) / vzz),
                    4) AS df_stat,
              round((vzy / vzz)
                    / sqrt(((vyy - vzy * vzy / vzz) / (m - 2)) / vzz),
                    4) < {_DF_CRIT_5PCT} AS stationary
       FROM c""",
    doc="Dickey-Fuller unit-root test (constant-only) on the daily "
    "revenue series — the stationarity gate a forecasting pipeline "
    "runs before trusting timeseries_acf/seasonal models: regress "
    "delta-x on the lagged level, DF = rho_hat / se(rho_hat); "
    "rho near 0 (DF above the critical value) means a random walk, "
    "strongly negative means mean-reversion. EXACT integer/DECIMAL(38) "
    "sum core (the five OLS sufficient statistics), then a fixed "
    "closed-form double expression — no accumulation-order "
    f"sensitivity; the flag compares the ROUNDED stat to the pinned "
    f"tau_mu 5% critical value {_DF_CRIT_5PCT}. Scale shape: daily "
    "rollup + one date-domain lag window + single-row arithmetic.",
)
def q_stats_dickey_fuller(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    o = d.select("day", "x", F.lag("x").over(Window.orderBy("day")).alias("xp"))
    p = o.filter(F.col("xp").isNotNull()).select(
        (F.col("x") - F.col("xp")).cast("long").alias("y"),
        F.col("xp").alias("z"),
    )
    s = p.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("z").cast("long").alias("sz"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("z"))
        .cast("decimal(38,0)")
        .alias("szz"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("szy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    m = F.col("m")
    vzz = F.col("szz").cast("double") - F.col("sz").cast("double") * F.col("sz") / m
    vzy = F.col("szy").cast("double") - F.col("sz").cast("double") * F.col("sy") / m
    vyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / m
    rho = vzy / vzz
    df_stat = F.round(rho / F.sqrt(((vyy - vzy * vzy / vzz) / (m - 2)) / vzz), 4)
    return s.select(
        m.alias("n_diffs"),
        F.round(rho, 6).alias("rho_hat"),
        df_stat.alias("df_stat"),
        (df_stat < F.lit(_DF_CRIT_5PCT)).alias("stationary"),
    )


_DW_POS_AUTOCORR = 1.35  # d_L lower bound, k=1 regressor, n ~ 30, 5%


@register(
    "stats_durbin_watson",
    f"""WITH {DAILY_CENTS_CTE},
       o AS (SELECT day, x, row_number() OVER (ORDER BY day) AS t FROM d),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(t)::BIGINT AS st, sum(x)::BIGINT AS sx,
                    sum(t::DECIMAL(38,0) * t)::DECIMAL(38,0) AS stt,
                    sum(t::DECIMAL(38,0) * x)::DECIMAL(38,0) AS stx
             FROM o),
       fit AS (SELECT n,
                      (CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * sx / n)
                      / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
                        AS b,
                      CAST(sx AS DOUBLE) / n
                      - (CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * sx / n)
                        / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
                        * CAST(st AS DOUBLE) / n AS a
               FROM s),
       resid AS (SELECT o.day, o.x - f.a - f.b * o.t AS res
                 FROM o, fit f),
       l AS (SELECT day, res, lag(res) OVER (ORDER BY day) AS rp FROM resid),
       terms AS (SELECT
                   sum(round(res * res, 9)::DECIMAL(30,9)) AS se2,
                   sum(CASE WHEN rp IS NULL THEN 0::DECIMAL(30,9)
                            ELSE round((res - rp) * (res - rp), 9)
                                 ::DECIMAL(30,9) END) AS sd2
                 FROM l)
       SELECT f.n AS n_days, round(f.b, 6) AS slope_cents_per_day,
              round(CAST(t.sd2 AS DOUBLE) / CAST(t.se2 AS DOUBLE), 4)
                AS dw_stat,
              round(CAST(t.sd2 AS DOUBLE) / CAST(t.se2 AS DOUBLE), 4)
                < {_DW_POS_AUTOCORR} AS positive_autocorr
       FROM terms t, fit f""",
    doc="Durbin-Watson autocorrelation-of-residuals test on the daily "
    "revenue series detrended by its OLS day-index line — the lag-1 "
    "WHITENESS check behind every trend report (timeseries_linear_"
    "trend fits the line; DW says whether its residuals are "
    "independent, i.e. whether the trend's standard errors can be "
    "believed — DW ~ 2 is white, << 2 positively autocorrelated). "
    "EXACT integer/DECIMAL OLS sufficient statistics, fixed "
    "closed-form residual expression per row, each squared term "
    "rounded to 9 dp and DECIMAL-summed, flag from the ROUNDED stat "
    f"vs the pinned d_L 5% bound {_DW_POS_AUTOCORR}. Scale shape: "
    "date-domain windows only; 1-row fit broadcast onto ~30 rows.",
)
def q_stats_durbin_watson(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    o = d.select(
        "day", "x", F.row_number().over(Window.orderBy("day")).alias("t")
    ).transform(ckpt)  # feeds fit + residuals
    s = o.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t"))
        .cast("decimal(38,0)")
        .alias("stt"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("stx"),
    )
    n = F.col("n")
    b = (F.col("stx").cast("double") - F.col("st").cast("double") * F.col("sx") / n) / (
        F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st") / n
    )
    fit = s.select(n.alias("n"), b.alias("b"), (
        F.col("sx").cast("double") / n - b * F.col("st").cast("double") / n
    ).alias("a"))
    e = o.crossJoin(F.broadcast(fit)).select(
        "day", "n", "b", (F.col("x") - F.col("a") - F.col("b") * F.col("t")).alias("res")
    )
    l = e.select(
        "day", "n", "b", "res", F.lag("res").over(Window.orderBy("day")).alias("rp")
    )
    terms = l.groupBy("n", "b").agg(
        F.sum(F.round(F.col("res") * F.col("res"), 9).cast("decimal(30,9)")).alias(
            "se2"
        ),
        F.sum(
            F.when(F.col("rp").isNull(), F.lit(0).cast("decimal(30,9)")).otherwise(
                F.round(
                    (F.col("res") - F.col("rp")) * (F.col("res") - F.col("rp")), 9
                ).cast("decimal(30,9)")
            )
        ).alias("sd2"),
    )
    dw = F.round(F.col("sd2").cast("double") / F.col("se2").cast("double"), 4)
    return terms.select(
        F.col("n").alias("n_days"),
        F.round(F.col("b"), 6).alias("slope_cents_per_day"),
        dw.alias("dw_stat"),
        (dw < F.lit(_DW_POS_AUTOCORR)).alias("positive_autocorr"),
    )


# --- round-10 batch B: k-group homogeneity / ordered-trend tests ------------

_CHI2_CRIT_4DF = 9.488  # 5% critical value, chi-square with 4 df


@register(
    "stats_bartlett_test",
    f"""WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       pg AS (SELECT grp, count(*)::BIGINT AS ni,
                     sum(cents)::BIGINT AS sx,
                     sum(cents::DECIMAL(38,0) * cents)::DECIMAL(38,0) AS sx2
              FROM c GROUP BY grp),
       v AS (SELECT grp, ni,
                    (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx / ni)
                    / (ni - 1) AS s2
             FROM pg),
       agg AS (SELECT count(*)::BIGINT AS k, sum(ni)::BIGINT AS n,
                      sum(round((ni - 1) * s2, 4)::DECIMAL(30,4)) AS pooled_num,
                      sum(round((ni - 1) * ln(s2), 9)::DECIMAL(20,9)) AS sum_lns,
                      sum(round(1.0 / (ni - 1), 12)::DECIMAL(20,12)) AS sum_inv
               FROM v)
       SELECT k AS k_groups, n AS n_total,
              round(((n - k) * ln(CAST(pooled_num AS DOUBLE) / (n - k))
                     - CAST(sum_lns AS DOUBLE))
                    / (1.0 + (CAST(sum_inv AS DOUBLE) - 1.0 / (n - k))
                             / (3.0 * (k - 1))),
                    4) AS bartlett_t,
              round(((n - k) * ln(CAST(pooled_num AS DOUBLE) / (n - k))
                     - CAST(sum_lns AS DOUBLE))
                    / (1.0 + (CAST(sum_inv AS DOUBLE) - 1.0 / (n - k))
                             / (3.0 * (k - 1))),
                    4) > {_CHI2_CRIT_4DF} AS reject_equal_var
       FROM agg""",
    doc="Bartlett's test for variance homogeneity across the five "
    "order-priority groups — the NORMAL-theory twin of stats_brown_"
    "forsythe (BF is robust to non-normality; Bartlett is the more "
    "powerful classical test when normality holds — a pipeline runs "
    "both and trusts BF when they disagree). Per-group variances from "
    "EXACT integer/DECIMAL(38) moment sums; the (ni-1)*ln(s2) and "
    "1/(ni-1) terms round to 9/12 dp and DECIMAL-sum over the 5-row "
    "group table; T = ((N-k) ln Sp2 - Sum(ni-1) ln si2) / C with the "
    "standard small-sample correction C, flag from the ROUNDED stat "
    f"vs the pinned chi-square(4) 5% value {_CHI2_CRIT_4DF}. Scale "
    "shape: one map-side-combinable group rollup, 5-row arithmetic.",
)
def q_stats_bartlett(spark: SparkSession, sf: str):
    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pg = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("ni"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sx2"),
    )
    s2 = (
        F.col("sx2").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / F.col("ni")
    ) / (F.col("ni") - 1)
    v = pg.select("grp", "ni", s2.alias("s2"))
    agg = v.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum(
            F.round((F.col("ni") - 1) * F.col("s2"), 4).cast("decimal(30,4)")
        ).alias("pooled_num"),
        F.sum(
            F.round((F.col("ni") - 1) * F.log(F.col("s2")), 9).cast("decimal(20,9)")
        ).alias("sum_lns"),
        F.sum(
            F.round(F.lit(1.0) / (F.col("ni") - 1), 12).cast("decimal(20,12)")
        ).alias("sum_inv"),
    )
    k, n = F.col("k"), F.col("n")
    t_stat = F.round(
        (
            (n - k) * F.log(F.col("pooled_num").cast("double") / (n - k))
            - F.col("sum_lns").cast("double")
        )
        / (
            F.lit(1.0)
            + (F.col("sum_inv").cast("double") - F.lit(1.0) / (n - k))
            / (F.lit(3.0) * (k - 1))
        ),
        4,
    )
    return agg.select(
        k.alias("k_groups"),
        n.alias("n_total"),
        t_stat.alias("bartlett_t"),
        (t_stat > F.lit(_CHI2_CRIT_4DF)).alias("reject_equal_var"),
    )


_COCHRAN_MIN_DAYS = 12  # x=1 iff the user emitted the type on >= 12 days


@register(
    "stats_cochran_q",
    f"""WITH ud AS (
         SELECT user_id, event_type
         FROM events
         GROUP BY user_id, event_type
         HAVING count(DISTINCT floor(epoch(ts))::BIGINT // 86400)
                >= {_COCHRAN_MIN_DAYS}),
       nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM events),
       kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM events),
       r AS (SELECT user_id, count(*)::BIGINT AS ri FROM ud GROUP BY user_id),
       cj AS (SELECT event_type, count(*)::BIGINT AS cjn
              FROM ud GROUP BY event_type),
       rs AS (SELECT coalesce(sum(ri), 0)::BIGINT AS s,
                     coalesce(sum(ri * ri), 0)::BIGINT AS sr2
              FROM r),
       cs AS (SELECT coalesce(sum(cjn * cjn), 0)::BIGINT AS sc2 FROM cj),
       q AS (SELECT kk.k, nu.n_users,
                    CASE WHEN kk.k * rs.s - rs.sr2 = 0 THEN 0.0
                         ELSE round((kk.k - 1)
                                    * (kk.k * CAST(cs.sc2 AS DOUBLE)
                                       - CAST(rs.s AS DOUBLE) * rs.s)
                                    / (kk.k * CAST(rs.s AS DOUBLE) - rs.sr2), 4)
                    END AS q_stat
             FROM kk, nu, rs, cs)
       SELECT k AS k_treatments, n_users, q_stat,
              q_stat > {_CHI2_CRIT_4DF} AS reject_equal_rates
       FROM q""",
    doc="Cochran's Q over the user x event-type participation matrix "
    "(blocks = users, treatments = the k event types, x = 1 iff the "
    "user emitted that type on >= 12 distinct days — 'ever' saturates "
    "to an all-ones matrix where Q is undefined; the pinned day "
    "threshold sits at the per-(user,type) median so both margins "
    "vary) — the k-treatment extension of "
    "McNemar and the BINARY companion to stats_friedman_test (same "
    "blocked design, binary outcomes): do the event types differ in "
    "adoption rate once per-user activity level is blocked out? "
    "Q = (k-1)(k SumCj^2 - S^2)/(kS - SumRi^2) — EXACT integer core "
    "(row/column totals of a 0/1 matrix), one double division, flag "
    f"from the ROUNDED stat vs chi-square(k-1=4) 5% = {_CHI2_CRIT_4DF}. "
    "Scale shape: one DISTINCT rollup (map-side combinable), two tiny "
    "total tables, 1-row arithmetic — no window, no join on data.",
)
def q_stats_cochran_q(spark: SparkSession, sf: str):
    ev = events_table(spark, sf).transform(ckpt)
    ud = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.countDistinct(F.expr("CAST(ts_s DIV 86400 AS BIGINT)")).alias("nd")
        )
        .filter(F.col("nd") >= _COCHRAN_MIN_DAYS)
        .select("user_id", "event_type")
        .transform(ckpt)  # feeds row + column totals
    )
    nu = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    kk = ev.agg(F.countDistinct("event_type").cast("long").alias("k"))
    r = ud.groupBy("user_id").agg(F.count("*").cast("long").alias("ri"))
    cj = ud.groupBy("event_type").agg(F.count("*").cast("long").alias("cjn"))
    rs = r.agg(
        F.coalesce(F.sum("ri"), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum(F.col("ri") * F.col("ri")), F.lit(0))
        .cast("long")
        .alias("sr2"),
    )
    cs = cj.agg(
        F.coalesce(F.sum(F.col("cjn") * F.col("cjn")), F.lit(0))
        .cast("long")
        .alias("sc2")
    )
    j = (
        kk.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(cs))
    )
    k = F.col("k")
    den = k * F.col("s").cast("double") - F.col("sr2")
    q = F.when(den == 0, F.lit(0.0)).otherwise(
        F.round(
            (k - 1)
            * (
                k * F.col("sc2").cast("double")
                - F.col("s").cast("double") * F.col("s")
            )
            / den,
            4,
        )
    )
    return j.select(
        k.alias("k_treatments"),
        "n_users",
        q.alias("q_stat"),
        (q > F.lit(_CHI2_CRIT_4DF)).alias("reject_equal_rates"),
    )


# --- round-10: Jonckheere-Terpstra ordered-trend test ------------------------
#
# The 10-term pairwise expansion (ordered group pairs i<j over the 5
# priority ordinals) is generated once here and shared verbatim by the
# Spark builder and the DuckDB oracle, so the two engines cannot drift.

_JT_K = 5
_JT_PAIRS = [(i, j) for i in range(1, _JT_K + 1) for j in range(1, _JT_K + 1) if i < j]
# per-value contribution to the DOUBLED statistic: k_j(v) * (2*cumlt_i(v) + k_i(v))
_JT_TERM_SQL = " + ".join(
    f"k{j} * (2 * (o{i} + cw{i} - k{i}) + k{i})" for i, j in _JT_PAIRS
)
_Z_CRIT_5PCT = 1.645


def _jt_oracle() -> str:
    ks = ",\n                ".join(
        f"sum(CASE WHEN g = {i} THEN kj ELSE 0 END)::BIGINT AS k{i}"
        for i in range(1, _JT_K + 1)
    )
    cws = ",\n                ".join(
        f"sum(k{i}) OVER (PARTITION BY bkt ORDER BY cents"
        f" ROWS UNBOUNDED PRECEDING)::BIGINT AS cw{i}"
        for i in range(1, _JT_K + 1)
    )
    bs = ",\n                ".join(
        f"sum(k{i})::BIGINT AS b{i}" for i in range(1, _JT_K + 1)
    )
    offs = ",\n                ".join(
        f"coalesce(sum(b{i}) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED"
        f" PRECEDING AND 1 PRECEDING), 0)::BIGINT AS o{i}"
        for i in range(1, _JT_K + 1)
    )
    return f"""WITH c AS (
         SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       vg AS (SELECT cents, g, count(*)::BIGINT AS kj
              FROM c GROUP BY cents, g),
       v AS (SELECT cents, (cents // 1048576)::BIGINT AS bkt,
                {ks}
             FROM vg GROUP BY cents),
       w AS (SELECT cents, bkt, k1, k2, k3, k4, k5,
                {cws}
             FROM v),
       bc AS (SELECT bkt,
                {bs}
              FROM v GROUP BY bkt),
       off AS (SELECT bkt,
                {offs}
               FROM bc),
       jt AS (SELECT sum({_JT_TERM_SQL})::BIGINT AS jt2
              FROM w JOIN off USING (bkt)),
       gs AS (SELECT g, count(*)::BIGINT AS ng FROM c GROUP BY g),
       tot AS (SELECT sum(ng)::BIGINT AS n, sum(ng * ng)::BIGINT AS sn2,
                      sum(ng * ng * (2 * ng + 3))::BIGINT AS sn23
               FROM gs)
       SELECT t.n AS n_total, j.jt2 AS jt_doubled,
              round((j.jt2 - (t.n * t.n - t.sn2) / 2.0)
                    / (2.0 * sqrt((CAST(t.n AS DOUBLE) * t.n * (2 * t.n + 3)
                                   - t.sn23) / 72.0)), 4) AS z_stat,
              round((j.jt2 - (t.n * t.n - t.sn2) / 2.0)
                    / (2.0 * sqrt((CAST(t.n AS DOUBLE) * t.n * (2 * t.n + 3)
                                   - t.sn23) / 72.0)), 4)
                > {_Z_CRIT_5PCT} AS increasing_trend
       FROM jt j, tot t"""


@register(
    "stats_jonckheere_terpstra",
    None,  # oracle assembled below (shares the generated pairwise expansion)
    doc="Jonckheere-Terpstra ordered-alternative trend test across the "
    "five order-priority ordinals (1-URGENT < ... < 5-LOW by label "
    "prefix — a pinned ordinal domain): JT = Sum over ordered group "
    "pairs i<j of the Mann-Whitney count #(x_i < x_j) + ties/2. Where "
    "stats_kruskal_wallis asks 'do the groups differ AT ALL', JT asks "
    "'do values RISE with the ordinal' — the one-degree-of-freedom "
    "test a priority-SLA or dose-response question actually wants. "
    "Kept exact in the DOUBLED scale (2U = 2*strict + ties is integral); "
    "the per-value contribution k_j(v)*(2*cumlt_i(v)+k_i(v)) runs over "
    "the DISTINCT-cents rollup with the weighted-median two-level "
    "bucketed prefix sum PER GROUP COLUMN (in-bucket cumulatives "
    "partitioned by 2^20-cent bucket, a cumulated offset over the tiny "
    "bucket table — never a global window over values), and the "
    "5-column pivot makes the 10 pair terms one projection. z uses "
    "the standard no-tie normal approximation (ties are a vanishing "
    "fraction of continuous cents; the exact-tie variance correction "
    "changes z in the 3rd decimal here), flag from the ROUNDED z vs "
    f"{_Z_CRIT_5PCT}. Scale shape: one (value, group) rollup, "
    "bucket-partitioned windows, a bucket-key join, 1-row arithmetic.",
)
def q_stats_jonckheere(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    vg = c.groupBy("cents", "g").agg(F.count("*").cast("long").alias("kj"))
    ks = [
        F.sum(F.when(F.col("g") == i, F.col("kj")).otherwise(0))
        .cast("long")
        .alias(f"k{i}")
        for i in range(1, _JT_K + 1)
    ]
    v = (
        vg.groupBy("cents")
        .agg(*ks)
        .withColumn("bkt", F.expr("CAST(cents DIV 1048576 AS BIGINT)"))
        .transform(ckpt)  # feeds in-bucket windows + bucket rollup
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w = v.select(
        "cents",
        "bkt",
        *[F.col(f"k{i}") for i in range(1, _JT_K + 1)],
        *[
            F.sum(f"k{i}").over(w_in).cast("long").alias(f"cw{i}")
            for i in range(1, _JT_K + 1)
        ],
    )
    bc = v.groupBy("bkt").agg(
        *[F.sum(f"k{i}").cast("long").alias(f"b{i}") for i in range(1, _JT_K + 1)]
    )
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.select(
        "bkt",
        *[
            F.coalesce(F.sum(f"b{i}").over(w_off), F.lit(0))
            .cast("long")
            .alias(f"o{i}")
            for i in range(1, _JT_K + 1)
        ],
    )
    jt = (
        w.join(F.broadcast(off), "bkt")
        .select(F.expr(_JT_TERM_SQL).alias("term"))
        .agg(F.sum("term").cast("long").alias("jt2"))
    )
    gs = c.groupBy("g").agg(F.count("*").cast("long").alias("ng"))
    tot = gs.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("ng") * F.col("ng")).cast("long").alias("sn2"),
        F.sum(F.col("ng") * F.col("ng") * (2 * F.col("ng") + 3))
        .cast("long")
        .alias("sn23"),
    )
    j = jt.crossJoin(F.broadcast(tot))
    n = F.col("n")
    z = F.round(
        (F.col("jt2") - (n * n - F.col("sn2")) / F.lit(2.0))
        / (
            F.lit(2.0)
            * F.sqrt(
                (n.cast("double") * n * (2 * n + 3) - F.col("sn23")) / F.lit(72.0)
            )
        ),
        4,
    )
    return j.select(
        n.alias("n_total"),
        F.col("jt2").alias("jt_doubled"),
        z.alias("z_stat"),
        (z > F.lit(_Z_CRIT_5PCT)).alias("increasing_trend"),
    )


from annotations_ingester_spark.plans.catalog import REGISTRY as _REG_R10  # noqa: E402

_REG_R10["stats_jonckheere_terpstra"].oracle = _jt_oracle()


# --- round-10: streaming twin of the Page-Hinkley detector -------------------


@register(
    "streaming_page_hinkley",
    _REG_R10["stats_page_hinkley"].oracle,
    doc="Streaming twin of the Page-Hinkley drift detector, run for "
    "real: the scan-fused (day, cents) projection of the event stream "
    "feeds availableNow micro-batches, and foreachBatch reduces each "
    "batch to its OWN per-day cents partial landed at a "
    "batch-id-keyed path (idempotent overwrite — a retried batch "
    "re-lands the same partial). Daily sums are a commutative monoid, "
    "so the fold (sum partials per day) equals the batch rollup "
    "EXACTLY regardless of how the stream split into batches or "
    "arrival order; the folded series then runs the identical PH "
    "computation (shared code path and shared oracle with "
    "stats_page_hinkley). Operational meaning at 100 TB: the drift "
    "monitor keeps per-window partials and re-derives the alarm "
    "sequence on every fold without rescanning history — the same "
    "partial-store discipline as streaming_psi_drift. Scale shape: "
    "per batch one map-side-combinable day rollup; fold is "
    "O(batches x days); the PH windows run on the date-domain table.",
)
def q_streaming_page_hinkley(spark: SparkSession, sf: str):
    import os
    import shutil
    import tempfile

    ev = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    run_dir = tempfile.mkdtemp(prefix="spark_graft_ph_")
    feed_dir = os.path.join(run_dir, "feed")
    store = os.path.join(run_dir, "store")
    try:
        ev.repartition(8).write.mode("overwrite").parquet(feed_dir)

        def partials(batch_df, batch_id):
            (
                batch_df.groupBy("day")
                .agg(F.sum("cents").cast("long").alias("x"))
                .write.mode("overwrite")
                .parquet(f"{store}/batch={batch_id}")
            )

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "3")
            .parquet(feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(partials)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        folded = (
            spark.read.parquet(store)
            .groupBy("day")
            .agg(F.sum("x").cast("long").alias("x"))
            .localCheckpoint(eager=True)  # date-domain bounded
        )
        return _page_hinkley_report(folded).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


# --- round-10: Grubbs' outlier test -------------------------------------------

_GRUBBS_CRIT = 2.745  # two-sided 5% critical value, n ~ 30


@register(
    "stats_grubbs_outlier",
    f"""WITH {DAILY_CENTS_CTE},
       s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxx
             FROM d),
       m AS (SELECT n, CAST(sx AS DOUBLE) / n AS mean,
                    sqrt((CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * sx / n) / (n - 1)) AS sd
             FROM s),
       dev AS (SELECT d.day, d.x, m.n, m.mean, m.sd,
                      abs(d.x - m.mean) AS ad
               FROM d, m),
       top AS (SELECT * FROM dev ORDER BY ad DESC, day LIMIT 1)
       SELECT n AS n_days, day AS suspect_day, x AS suspect_cents,
              round(ad / sd, 4) AS g_stat,
              round(ad / sd, 4) > {_GRUBBS_CRIT} AS is_outlier
       FROM top""",
    doc="Grubbs' test for a single outlier in the daily revenue series — "
    "the FORMAL hypothesis test completing the outlier family "
    "(events_anomaly_mad flags points by robust z; Grubbs says whether "
    "the single most extreme day is statistically incompatible with "
    "the rest under normality, the classic before-you-delete-a-point "
    "gate): G = max|x - xbar| / s, suspect located by a TOTAL order "
    "(|deviation| desc, day asc — deterministic at ties). EXACT "
    "integer/DECIMAL(38) moment core, one double sqrt/division, flag "
    f"from the ROUNDED G vs the pinned 5% critical value {_GRUBBS_CRIT} "
    "(n ~ 30; the date domain is pinned by the generator). Scale "
    "shape: one map-side-combinable daily rollup, a 1-row moment "
    "broadcast, TakeOrdered(1) — no window at all.",
)
def q_stats_grubbs(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    n = F.col("n")
    m = s.select(
        n.alias("n"),
        (F.col("sx").cast("double") / n).alias("mean"),
        F.sqrt(
            (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n)
            / (n - 1)
        ).alias("sd"),
    )
    dev = d.crossJoin(F.broadcast(m)).select(
        "day", "x", "n", "sd", F.abs(F.col("x") - F.col("mean")).alias("ad")
    )
    top = dev.orderBy(F.col("ad").desc(), F.col("day").asc()).limit(1)
    g = F.round(F.col("ad") / F.col("sd"), 4)
    return top.select(
        F.col("n").alias("n_days"),
        F.col("day").alias("suspect_day"),
        F.col("x").alias("suspect_cents"),
        g.alias("g_stat"),
        (g > F.lit(_GRUBBS_CRIT)).alias("is_outlier"),
    )


# --- round-11 head start: Cochran-Armitage trend in proportions ---------------


@register(
    "stats_cochran_armitage",
    f"""WITH c AS (
         SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
                round(o_totalprice * 100)::BIGINT AS cents
         FROM orders),
       v AS (SELECT cents, count(*)::BIGINT AS k FROM c GROUP BY cents),
       vb AS (SELECT cents, k, (cents // 1048576)::BIGINT AS bkt FROM v),
       ranked AS (
         SELECT cents, k, bkt,
                sum(k) OVER (PARTITION BY bkt ORDER BY cents
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cw_in
         FROM vb),
       bc AS (SELECT bkt, sum(k)::BIGINT AS bw FROM vb GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(bw) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       tot AS (SELECT sum(k)::BIGINT AS n FROM v),
       med AS (SELECT min(CASE WHEN 2 * (f.o + r.cw_in) >= tot.n
                               THEN r.cents END)::BIGINT AS med
               FROM ranked r JOIN off f USING (bkt), tot),
       pg AS (SELECT c.g AS t, count(*)::BIGINT AS ni,
                     sum(CASE WHEN c.cents > med.med THEN 1 ELSE 0 END)
                       ::BIGINT AS ri
              FROM c, med GROUP BY c.g),
       s AS (SELECT sum(ni)::BIGINT AS n, sum(ri)::BIGINT AS r,
                    sum(t * ri)::BIGINT AS str_, sum(t * ni)::BIGINT AS stn,
                    sum(t * t * ni)::BIGINT AS stt
             FROM pg)
       SELECT n AS n_total, r AS successes,
              round((CAST(n AS DOUBLE) * str_ - CAST(r AS DOUBLE) * stn)
                    / sqrt(CAST(r AS DOUBLE) * (n - r)
                           * (CAST(n AS DOUBLE) * stt
                              - CAST(stn AS DOUBLE) * stn) / n),
                    4) AS z_stat,
              abs(round((CAST(n AS DOUBLE) * str_ - CAST(r AS DOUBLE) * stn)
                    / sqrt(CAST(r AS DOUBLE) * (n - r)
                           * (CAST(n AS DOUBLE) * stt
                              - CAST(stn AS DOUBLE) * stn) / n),
                    4)) > 1.96 AS trend_detected
       FROM s""",
    doc="Cochran-Armitage trend test for PROPORTIONS across the ordered "
    "priority ordinals (scores t = 1..5): is the share of "
    "above-grand-median orders rising or falling with priority? The "
    "binary companion to stats_jonckheere_terpstra (JT ranks the "
    "values; CA tests a success rate) and the trend refinement of the "
    "2xk chi-square — one degree of freedom pointed at the ordering. "
    "The grand median is EXACT via the weighted-median two-level "
    "bucketed prefix (the mood_median machinery); the statistic "
    "reduces to five exact integer sums and one closed-form double "
    "z = (N Sum(t r) - R Sum(t n)) / sqrt(R(N-R)(N Sum(t^2 n) - "
    "Sum(t n)^2)/N), flag from the ROUNDED |z| vs 1.96. Scale shape: "
    "one value rollup + bucket-partitioned windows for the median, "
    "one group rollup, 1-row arithmetic.",
)
def q_stats_cochran_armitage(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    v = (
        c.groupBy("cents")
        .agg(F.count("*").cast("long").alias("k"))
        .withColumn("bkt", F.expr("CAST(cents DIV 1048576 AS BIGINT)"))
        .transform(ckpt)
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = v.withColumn("cw_in", F.sum("k").over(w_in).cast("long"))
    bc = v.groupBy("bkt").agg(F.sum("k").cast("long").alias("bw"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.withColumn(
        "o", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).cast("long")
    ).select("bkt", "o")
    tot = v.agg(F.sum("k").cast("long").alias("n"))
    med = (
        ranked.join(F.broadcast(off), "bkt")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    2 * (F.col("o") + F.col("cw_in")) >= F.col("n"),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("med")
        )
    )
    pg = (
        c.crossJoin(F.broadcast(med))
        .groupBy(F.col("g").alias("t"))
        .agg(
            F.count("*").cast("long").alias("ni"),
            F.sum(F.when(F.col("cents") > F.col("med"), 1).otherwise(0))
            .cast("long")
            .alias("ri"),
        )
    )
    s = pg.agg(
        F.sum("ni").cast("long").alias("n"),
        F.sum("ri").cast("long").alias("r"),
        F.sum(F.col("t") * F.col("ri")).cast("long").alias("str_"),
        F.sum(F.col("t") * F.col("ni")).cast("long").alias("stn"),
        F.sum(F.col("t") * F.col("t") * F.col("ni")).cast("long").alias("stt"),
    )
    n, r = F.col("n"), F.col("r")
    z = F.round(
        (n.cast("double") * F.col("str_") - r.cast("double") * F.col("stn"))
        / F.sqrt(
            r.cast("double")
            * (n - r)
            * (n.cast("double") * F.col("stt") - F.col("stn").cast("double") * F.col("stn"))
            / n
        ),
        4,
    )
    return s.select(
        n.alias("n_total"),
        r.alias("successes"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("trend_detected"),
    )


# --- round-11: Jarque-Bera normality test --------------------------------------

_JB_CHI2_CRIT_2DF = 5.9915  # chi-square 0.95 quantile, 2 df


@register(
    "stats_jarque_bera",
    f"""WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice)::BIGINT AS d
         FROM orders),
       m AS (SELECT grp, count(*)::BIGINT AS n,
                    sum(d)::BIGINT AS s1,
                    sum(d::DECIMAL(38,0) * d)::DECIMAL(38,0) AS s2,
                    sum(d::DECIMAL(38,0) * d * d)::DECIMAL(38,0) AS s3,
                    sum(d::DECIMAL(38,0) * d * d * d)::DECIMAL(38,0) AS s4
             FROM c GROUP BY grp),
       k AS (SELECT grp, n,
                    s1 * 1.0 / n AS mu,
                    CAST(s2 AS DOUBLE) / n AS r2,
                    CAST(s3 AS DOUBLE) / n AS r3,
                    CAST(s4 AS DOUBLE) / n AS r4
             FROM m),
       ct AS (SELECT grp, n,
                     r2 - mu * mu AS m2,
                     r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
                     r4 - 4 * mu * r3 + 6 * mu * mu * r2
                        - 3 * mu * mu * mu * mu AS m4
              FROM k)
       SELECT grp, n,
              round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
              round(m4 / (m2 * m2) - 3.0, 6) AS ex_kurtosis,
              round(n / 6.0 * ((m3 / (m2 * sqrt(m2)))
                               * (m3 / (m2 * sqrt(m2)))
                               + (m4 / (m2 * m2) - 3.0)
                                 * (m4 / (m2 * m2) - 3.0) / 4.0), 4)
                AS jb_stat,
              n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                         + (m4 / (m2 * m2) - 3.0)
                           * (m4 / (m2 * m2) - 3.0) / 4.0)
                >= {_JB_CHI2_CRIT_2DF!r} AS normal_rejected
       FROM ct""",
    doc="Jarque-Bera normality test per order-priority group: JB = "
    "n/6*(skew^2 + ex_kurtosis^2/4) against the chi-square(2) 0.95 "
    "critical value — the moment-based normality screen that should "
    "run before any t-test/ANOVA whose small-sample validity leans on "
    "normal residuals (stats_welch_ttest, stats_anova_oneway on these "
    "same groups). Raw power sums S1..S4 accumulate as EXACT "
    "DECIMAL(38,0) integers over whole-dollar values (order-free); "
    "central moments come from the closed-form raw-to-central "
    "conversion in one deterministic double expression per group, "
    "rounded once per output. Scale shape: one scan-fused "
    "map-side-combinable 5-group aggregate — no window, no join, no "
    "shuffle beyond the 5-row exchange; flat at any order count.",
)
def q_stats_jarque_bera(spark: SparkSession, sf: str):
    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice")).cast("long").alias("d"),
    )
    dd = F.col("d").cast("decimal(38,0)")
    m = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(dd * F.col("d")).cast("decimal(38,0)").alias("s2"),
        F.sum(dd * F.col("d") * F.col("d")).cast("decimal(38,0)").alias("s3"),
        F.sum(dd * F.col("d") * F.col("d") * F.col("d"))
        .cast("decimal(38,0)")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") * 1.0 / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return m.select(
        "grp",
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(exk, 6).alias("ex_kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb >= F.lit(_JB_CHI2_CRIT_2DF)).alias("normal_rejected"),
    )


# --- round-11: Hurst exponent via rescaled-range (R/S) analysis ---------------

_HURST_WINDOWS = (4, 8, 16)  # block sizes (days) for the R/S ladder


def _hurst_oracle() -> str:
    arms = []
    for w in _HURST_WINDOWS:
        arms.append(f"""SELECT {w}::BIGINT AS w, blk,
                avg(x) AS mu,
                count(*)::BIGINT AS m,
                sum(x)::BIGINT AS s1,
                sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS s2
         FROM (SELECT x, (t - 1) // {w} AS blk,
                      count(*) OVER () AS tt
               FROM o) WHERE (blk + 1) * {w} <= tt
         GROUP BY blk""")
    stats_union = "\n       UNION ALL\n       ".join(arms)
    return f"""WITH {DAILY_CENTS_CTE},
       o AS (SELECT day, x, row_number() OVER (ORDER BY day) AS t FROM d),
       bs AS ({stats_union}),
       cum AS (
         SELECT b.w, b.blk,
                sum(o.x - CAST(b.s1 AS DOUBLE) / b.m)
                  OVER (PARTITION BY b.w, b.blk ORDER BY o.t
                        ROWS UNBOUNDED PRECEDING) AS y
         FROM o JOIN bs b
           ON (o.t - 1) // b.w = b.blk AND b.m = b.w),
       rg AS (SELECT w, blk, max(y) - min(y) AS r
              FROM cum GROUP BY 1, 2),
       sd AS (SELECT w, blk, m,
                     sqrt(CAST(s2 AS DOUBLE) / m
                          - (CAST(s1 AS DOUBLE) / m)
                            * (CAST(s1 AS DOUBLE) / m)) AS s
              FROM bs),
       rs AS (SELECT r.w, count(*)::BIGINT AS n_blocks,
                     sum(round(r.r / s.s, 9)::DECIMAL(20,9)) AS rs_sum
              FROM rg r JOIN sd s ON r.w = s.w AND r.blk = s.blk
              WHERE s.s > 0
              GROUP BY r.w),
       pts AS (SELECT w, n_blocks,
                      round(CAST(rs_sum AS DOUBLE) / n_blocks, 6) AS mean_rs
               FROM rs),
       fit AS (SELECT count(*)::BIGINT AS k,
                      sum(ln(w)) AS sx, sum(ln(mean_rs)) AS sy,
                      sum(ln(w) * ln(w)) AS sxx,
                      sum(ln(w) * ln(mean_rs)) AS sxy
               FROM pts)
       SELECT p.w AS window_days, p.n_blocks, p.mean_rs,
              round((f.k * f.sxy - f.sx * f.sy)
                    / (f.k * f.sxx - f.sx * f.sx), 6) AS hurst_exponent,
              round((f.k * f.sxy - f.sx * f.sy)
                    / (f.k * f.sxx - f.sx * f.sx), 6) > 0.65
                AS strong_persistence
       FROM pts p CROSS JOIN fit f"""


@register(
    "stats_hurst_rs",
    None,  # assembled by _hurst_oracle below (shared block-arm template)
    doc="Hurst exponent of the daily revenue series by rescaled-range "
    "(R/S) analysis: for block sizes 4/8/16 days, each full block's "
    "range of cumulative mean-deviations divided by its population "
    "std, averaged per size; H is the log-log OLS slope of mean R/S "
    "vs block size — H~0.5 random walk, H>0.65 flagged as strong "
    "long-memory persistence (burstiness that AR-based diagnostics "
    "like stats_ljung_box miss). Block moments are exact BIGINT/"
    "DECIMAL(38,0) sums; per-block R/S rounds to 9 dp and sums as "
    "DECIMAL; the 3-point fit is one deterministic double expression. "
    "The persistence flag compares the ROUNDED exponent (engines can "
    "never disagree with the printed value). Scale shape: one daily "
    "rollup (map-side combinable over events), then every window and "
    "join runs over the bounded DATE-DOMAIN table and its "
    "(3 x blocks) ladder — flat in the event count.",
)
def q_stats_hurst_rs(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    o = d.select(
        "day", "x", F.row_number().over(Window.orderBy("day")).alias("t")
    ).transform(ckpt)  # bounded day table; feeds all 3 arms
    arms = []
    for w in _HURST_WINDOWS:
        tt = o.agg(F.count("*").alias("tt"))
        blocks = (
            o.crossJoin(F.broadcast(tt))
            .select(
                "day",
                "x",
                "t",
                ((F.col("t") - 1) / w).cast("long").alias("blk"),
                "tt",
            )
            .filter((F.col("blk") + 1) * w <= F.col("tt"))
        )
        bs = blocks.groupBy("blk").agg(
            F.count("*").cast("long").alias("m"),
            F.sum("x").cast("long").alias("s1"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        wc = (
            Window.partitionBy("blk")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            blocks.join(F.broadcast(bs), "blk")
            .select(
                "blk",
                F.sum(
                    F.col("x") - F.col("s1").cast("double") / F.col("m")
                )
                .over(wc)
                .alias("y"),
            )
            .groupBy("blk")
            .agg((F.max("y") - F.min("y")).alias("r"))
        )
        mu = F.col("s1").cast("double") / F.col("m")
        sd = bs.select(
            "blk",
            F.sqrt(F.col("s2").cast("double") / F.col("m") - mu * mu).alias("s"),
        )
        arm = (
            cum.join(sd, "blk")
            .filter(F.col("s") > 0)
            .agg(
                F.lit(w).cast("long").alias("w"),
                F.count("*").cast("long").alias("n_blocks"),
                F.sum(
                    F.round(F.col("r") / F.col("s"), 9).cast("decimal(20,9)")
                ).alias("rs_sum"),
            )
        )
        arms.append(arm)
    pts = arms[0]
    for a in arms[1:]:
        pts = pts.unionByName(a)
    pts = pts.select(
        "w",
        "n_blocks",
        F.round(F.col("rs_sum").cast("double") / F.col("n_blocks"), 6).alias(
            "mean_rs"
        ),
    )
    fit = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.log("w")).alias("sx"),
        F.sum(F.log("mean_rs")).alias("sy"),
        F.sum(F.log("w") * F.log("w")).alias("sxx"),
        F.sum(F.log("w") * F.log("mean_rs")).alias("sxy"),
    )
    hurst = F.round(
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        F.col("w").alias("window_days"),
        "n_blocks",
        "mean_rs",
        hurst.alias("hurst_exponent"),
        (hurst > 0.65).alias("strong_persistence"),
    )


from annotations_ingester_spark.plans.catalog import REGISTRY as _REG_R11  # noqa: E402

_REG_R11["stats_hurst_rs"].oracle = _hurst_oracle()


# --- round-11: two-factor OLS via normal equations ----------------------------


@register(
    "stats_ols_two_factor",
    """WITH c AS (
         SELECT round(l_extendedprice * 100)::BIGINT AS y,
                round(l_quantity)::BIGINT AS x1,
                round(l_discount * 100)::BIGINT AS x2
         FROM lineitem),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(y)::BIGINT AS sy, sum(x1)::BIGINT AS s1,
                    sum(x2)::BIGINT AS s2,
                    sum(x1::DECIMAL(38,0) * x1)::DECIMAL(38,0) AS s11,
                    sum(x2::DECIMAL(38,0) * x2)::DECIMAL(38,0) AS s22,
                    sum(x1::DECIMAL(38,0) * x2)::DECIMAL(38,0) AS s12,
                    sum(x1::DECIMAL(38,0) * y)::DECIMAL(38,0) AS s1y,
                    sum(x2::DECIMAL(38,0) * y)::DECIMAL(38,0) AS s2y,
                    sum(y::DECIMAL(38,0) * y)::DECIMAL(38,0) AS syy
             FROM c),
       m AS (SELECT n,
                    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS v11,
                    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS v22,
                    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS v12,
                    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS v1y,
                    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS v2y,
                    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS vyy,
                    CAST(sy AS DOUBLE) / n AS my,
                    CAST(s1 AS DOUBLE) / n AS m1,
                    CAST(s2 AS DOUBLE) / n AS m2
             FROM s),
       b AS (SELECT n, vyy, v1y, v2y, my, m1, m2,
                    (v22 * v1y - v12 * v2y) / (v11 * v22 - v12 * v12) AS b1,
                    (v11 * v2y - v12 * v1y) / (v11 * v22 - v12 * v12) AS b2
             FROM m)
       SELECT n,
              round(my - b1 * m1 - b2 * m2, 4) AS intercept_cents,
              round(b1, 6) AS beta_quantity,
              round(b2, 6) AS beta_discount,
              round((b1 * v1y + b2 * v2y) / vyy, 6) AS r_squared,
              round(((b1 * v1y + b2 * v2y) / vyy)
                    / (1.0 - (b1 * v1y + b2 * v2y) / vyy)
                    * (n - 3) / 2.0, 4) AS f_stat
       FROM b""",
    doc="Two-regressor OLS by closed-form normal equations: "
    "extendedprice ~ quantity + discount over lineitem, solved with "
    "Cramer's rule on the centered covariance matrix — coefficients, "
    "R^2 and the overall F(2, n-3) statistic, generalizing "
    "timeseries_linear_trend's single-regressor fit to the smallest "
    "genuinely multivariate case (where collinearity between "
    "regressors first matters — v12 appears in every numerator). All "
    "nine raw power sums accumulate as exact BIGINT/DECIMAL(38,0) "
    "integers in ONE map-side-combinable aggregate; the solve is a "
    "single deterministic double expression tree, one rounding per "
    "output. Scale shape: one scan-fused full-table aggregate, no "
    "window, no join — the cheapest possible distributed regression.",
)
def q_stats_ols_two_factor(spark: SparkSession, sf: str):
    c = table(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_quantity")).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = c.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(dec("x1") * F.col("x1")).cast("decimal(38,0)").alias("s11"),
        F.sum(dec("x2") * F.col("x2")).cast("decimal(38,0)").alias("s22"),
        F.sum(dec("x1") * F.col("x2")).cast("decimal(38,0)").alias("s12"),
        F.sum(dec("x1") * F.col("y")).cast("decimal(38,0)").alias("s1y"),
        F.sum(dec("x2") * F.col("y")).cast("decimal(38,0)").alias("s2y"),
        F.sum(dec("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    v11 = F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    v22 = F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2") / n
    v12 = F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2") / n
    v1y = F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy") / n
    v2y = F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n
    vyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    det = v11 * v22 - v12 * v12
    b1 = (v22 * v1y - v12 * v2y) / det
    b2 = (v11 * v2y - v12 * v1y) / det
    my = F.col("sy").cast("double") / n
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    r2 = (b1 * v1y + b2 * v2y) / vyy
    return s.select(
        "n",
        F.round(my - b1 * m1 - b2 * m2, 4).alias("intercept_cents"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_discount"),
        F.round(r2, 6).alias("r_squared"),
        F.round(r2 / (1.0 - r2) * (n - 3) / 2.0, 4).alias("f_stat"),
    )


# --- round-11: Granger causality (lag-1, daily series) ------------------------

_GRANGER_F_CRIT = 4.20  # F(1, ~27) 0.95 critical value, pinned


@register(
    "stats_granger_lag1",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN event_type = 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS y,
                    sum(CASE WHEN event_type <> 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS x
             FROM e GROUP BY day),
       o AS (SELECT day, y, x,
                    lag(y) OVER (ORDER BY day) AS yl,
                    lag(x) OVER (ORDER BY day) AS xl
             FROM d),
       p AS (SELECT y, yl AS x1, xl AS x2 FROM o WHERE yl IS NOT NULL),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(y)::BIGINT AS sy, sum(x1)::BIGINT AS s1,
                    sum(x2)::BIGINT AS s2,
                    sum(x1::DECIMAL(38,0) * x1)::DECIMAL(38,0) AS s11,
                    sum(x2::DECIMAL(38,0) * x2)::DECIMAL(38,0) AS s22,
                    sum(x1::DECIMAL(38,0) * x2)::DECIMAL(38,0) AS s12,
                    sum(x1::DECIMAL(38,0) * y)::DECIMAL(38,0) AS s1y,
                    sum(x2::DECIMAL(38,0) * y)::DECIMAL(38,0) AS s2y,
                    sum(y::DECIMAL(38,0) * y)::DECIMAL(38,0) AS syy
             FROM p),
       m AS (SELECT n,
                    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS v11,
                    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS v22,
                    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS v12,
                    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS v1y,
                    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS v2y,
                    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS vyy
             FROM s),
       f AS (SELECT n, v1y, v2y, vyy,
                    (v22 * v1y - v12 * v2y) / (v11 * v22 - v12 * v12) AS b1,
                    (v11 * v2y - v12 * v1y) / (v11 * v22 - v12 * v12) AS b2,
                    vyy - v1y * v1y / v11 AS rss_r
             FROM m)
       SELECT n AS n_days_used,
              round(b1, 6) AS beta_ylag,
              round(b2, 6) AS beta_xlag,
              round(rss_r - (vyy - b1 * v1y - b2 * v2y), 4) AS rss_drop,
              round((rss_r - (vyy - b1 * v1y - b2 * v2y))
                    / ((vyy - b1 * v1y - b2 * v2y) / (n - 3)), 4)
                AS f_granger,
              round((rss_r - (vyy - b1 * v1y - b2 * v2y))
                    / ((vyy - b1 * v1y - b2 * v2y) / (n - 3)), 4)
                >= {_GRANGER_F_CRIT!r} AS x_granger_causes_y
       FROM f""",
    doc="Granger causality (lag-1) between two daily revenue series: "
    "does yesterday's NON-purchase activity (clicks/views) improve "
    "today's purchase-revenue forecast beyond purchase's own lag? "
    "Restricted AR(1) RSS vs the two-regressor (y_lag, x_lag) OLS "
    "RSS — F = (RSS_r - RSS_u)/(RSS_u/(n-3)) with 1 restriction, "
    "against a pinned F(1, n-3) 0.95 critical value; the flag "
    "compares the ROUNDED F. Shares stats_ols_two_factor's exact-"
    "integer normal-equation machinery (all power sums BIGINT/"
    "DECIMAL(38,0)); RSS values come from the same closed forms "
    "(RSS_u = Syy - b1*S1y - b2*S2y). Scale shape: one daily rollup "
    "over events (map-side combinable), a lag window over the "
    "bounded DATE DOMAIN, one full aggregate — flat in event count.",
)
def q_stats_granger_lag1(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(
            F.when(F.col("event_type") != "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("day")
    o = d.select(
        "y",
        F.lag("y").over(w).alias("x1"),
        F.lag("x").over(w).alias("x2"),
    ).filter(F.col("x1").isNotNull())
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = o.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(dec("x1") * F.col("x1")).cast("decimal(38,0)").alias("s11"),
        F.sum(dec("x2") * F.col("x2")).cast("decimal(38,0)").alias("s22"),
        F.sum(dec("x1") * F.col("x2")).cast("decimal(38,0)").alias("s12"),
        F.sum(dec("x1") * F.col("y")).cast("decimal(38,0)").alias("s1y"),
        F.sum(dec("x2") * F.col("y")).cast("decimal(38,0)").alias("s2y"),
        F.sum(dec("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    v11 = F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    v22 = F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2") / n
    v12 = F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2") / n
    v1y = F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy") / n
    v2y = F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n
    vyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    det = v11 * v22 - v12 * v12
    b1 = (v22 * v1y - v12 * v2y) / det
    b2 = (v11 * v2y - v12 * v1y) / det
    rss_r = vyy - v1y * v1y / v11
    rss_u = vyy - b1 * v1y - b2 * v2y
    f_g = F.round((rss_r - rss_u) / (rss_u / (n - 3)), 4)
    return s.select(
        n.alias("n_days_used"),
        F.round(b1, 6).alias("beta_ylag"),
        F.round(b2, 6).alias("beta_xlag"),
        F.round(rss_r - rss_u, 4).alias("rss_drop"),
        f_g.alias("f_granger"),
        (f_g >= F.lit(_GRANGER_F_CRIT)).alias("x_granger_causes_y"),
    )


# --- round-11: Cronbach's alpha reliability -----------------------------------


@register(
    "stats_cronbach_alpha",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       cell AS (SELECT day, event_type, sum(cents)::BIGINT AS x
                FROM e GROUP BY 1, 2),
       days AS (SELECT DISTINCT day FROM cell),
       types AS (SELECT DISTINCT event_type FROM cell),
       grid AS (SELECT d.day, t.event_type,
                       coalesce(c.x, 0)::BIGINT AS x
                FROM days d CROSS JOIN types t
                LEFT JOIN cell c
                  ON c.day = d.day AND c.event_type = t.event_type),
       item AS (SELECT event_type,
                       count(*)::BIGINT AS m,
                       sum(x)::BIGINT AS s,
                       sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS q
                FROM grid GROUP BY event_type),
       tot AS (SELECT day, sum(x)::BIGINT AS t FROM grid GROUP BY day),
       ts AS (SELECT count(*)::BIGINT AS m, sum(t)::BIGINT AS s,
                     sum(t::DECIMAL(38,0) * t)::DECIMAL(38,0) AS q
              FROM tot),
       iv AS (SELECT count(*)::BIGINT AS k,
                     sum(round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / m)
                               / m, 9)::DECIMAL(30,9)) AS sum_item_var
              FROM item),
       tv AS (SELECT (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / m) / m
                       AS total_var,
                     m
              FROM ts)
       SELECT iv.k AS n_items, tv.m AS n_days,
              round(CAST(iv.sum_item_var AS DOUBLE), 4) AS sum_item_var,
              round(tv.total_var, 4) AS total_var,
              round(iv.k * 1.0 / (iv.k - 1)
                    * (1.0 - CAST(iv.sum_item_var AS DOUBLE) / tv.total_var),
                    6) AS cronbach_alpha
       FROM iv CROSS JOIN tv""",
    doc="Cronbach's alpha internal-consistency coefficient treating the "
    "event types as k 'items' scored per day (the respondents): alpha "
    "= k/(k-1) * (1 - sum(item variances)/variance(day totals)) — "
    "the classic reliability scalar for ANY multi-signal quality "
    "score (do the k signals move together enough to justify summing "
    "them into one index? — directly applicable to "
    "text_quality_scores' component signals). Population variances "
    "from exact BIGINT/DECIMAL(38,0) power sums over the densified "
    "(day x type) grid; per-item variances round to 9 dp and sum as "
    "DECIMAL. Scale shape: one map-side-combinable (day, type) "
    "rollup over events, then every aggregate runs on the bounded "
    "(days x 5-type) grid; two 1-row broadcasts assemble the report.",
)
def q_stats_cronbach_alpha(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = e.groupBy("day", "event_type").agg(
        F.sum("cents").cast("long").alias("x")
    ).transform(ckpt)  # bounded (day x type) grid source
    days = cell.select("day").distinct()
    types = cell.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cell, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
        )
    )
    dec = F.col("x").cast("decimal(38,0)")
    item = grid.groupBy("event_type").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("s"),
        F.sum(dec * F.col("x")).cast("decimal(38,0)").alias("q"),
    )
    tot = grid.groupBy("day").agg(F.sum("x").cast("long").alias("t"))
    dect = F.col("t").cast("decimal(38,0)")
    ts = tot.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("t").cast("long").alias("s"),
        F.sum(dect * F.col("t")).cast("decimal(38,0)").alias("q"),
    )
    pvar = (
        F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("m")
    ) / F.col("m")
    iv = item.agg(
        F.count("*").cast("long").alias("k"),
        # DECIMAL(30,9): per-item variances reach ~2.4e12 cents^2 at sf1
        F.sum(F.round(pvar, 9).cast("decimal(30,9)")).alias("sum_item_var"),
    )
    tv = ts.select(pvar.alias("total_var"), "m")
    siv = F.col("sum_item_var").cast("double")
    return iv.crossJoin(F.broadcast(tv)).select(
        F.col("k").alias("n_items"),
        F.col("m").alias("n_days"),
        F.round(siv, 4).alias("sum_item_var"),
        F.round(F.col("total_var"), 4).alias("total_var"),
        F.round(
            F.col("k") * 1.0 / (F.col("k") - 1) * (1.0 - siv / F.col("total_var")),
            6,
        ).alias("cronbach_alpha"),
    )


# --- round-11: AMS (tug-of-war) F2 sketch certification -----------------------

_AMS_ROWS = 16  # sketch rows (independent sign hashes)


@register(
    "sketch_ams_f2_cert",
    f"""WITH ev AS (SELECT user_id FROM events),
       sgn AS (
         SELECT r.s,
                sum(CASE WHEN ({md5_hash64_sql("'ams' || r.s::VARCHAR || ':' || ev.user_id::VARCHAR")}
                           % 2) = 0 THEN 1 ELSE -1 END)::BIGINT AS z
         FROM ev CROSS JOIN (SELECT unnest(range(0, {_AMS_ROWS})) AS s) r
         GROUP BY r.s),
       est AS (SELECT sum(z::DECIMAL(38,0) * z)::DECIMAL(38,0) AS zz
               FROM sgn),
       ex AS (SELECT sum(c::DECIMAL(38,0) * c)::DECIMAL(38,0) AS f2,
                     count(*)::BIGINT AS n_users,
                     sum(c)::BIGINT AS n_events
              FROM (SELECT user_id, count(*)::BIGINT AS c
                    FROM ev GROUP BY user_id))
       SELECT ex.n_events, ex.n_users,
              CAST(ex.f2 AS BIGINT) AS f2_exact,
              round(CAST(est.zz AS DOUBLE) / {_AMS_ROWS}, 4) AS f2_estimate,
              round(CAST(est.zz AS DOUBLE) / {_AMS_ROWS}
                    / CAST(ex.f2 AS DOUBLE), 6) AS est_ratio,
              round(CAST(est.zz AS DOUBLE) / {_AMS_ROWS}
                    / CAST(ex.f2 AS DOUBLE), 6) BETWEEN 0.5 AND 2.0
                AS within_2x
       FROM est CROSS JOIN ex""",
    doc="AMS (Alon-Matias-Szegedy 'tug-of-war') sketch for the second "
    "frequency moment F2 of the per-user event counts, certified "
    "against the exact value: 16 independent seeded sign hashes, "
    "each sketch row is one counter Z_s = sum(sign_s(user)); "
    "E[Z^2] = F2, estimator = mean of Z^2 — F2/self-join-size "
    "estimation in ONE PASS with 16 integers of state, the "
    "streaming-mergeable companion to sketch_count_min_certified "
    "(point frequencies) and sketch_hll_intersection_cert "
    "(cardinality). Everything is exact integer arithmetic (signs, "
    "Z sums, Z^2, exact F2 as DECIMAL(38,0)) until the final "
    "ratio; the certification flag compares the ROUNDED ratio to "
    "the 2x envelope. Scale shape: a 16-way map fan over the "
    "pruned user_id scan collapsing map-side to 16 rows, plus one "
    "per-user rollup for the exact side; no window, no data join.",
)
def q_sketch_ams_f2_cert(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    ev = events_table(spark, sf).select("user_id")
    seeds = ev.sparkSession.range(_AMS_ROWS).select(
        F.col("id").cast("long").alias("s")
    )
    sgn = (
        ev.crossJoin(F.broadcast(seeds))
        .select(
            "s",
            F.when(
                md5_hash64(
                    F.concat(
                        F.lit("ams"),
                        F.col("s").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                )
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("sign"),
        )
        .groupBy("s")
        .agg(F.sum("sign").cast("long").alias("z"))
    )
    est = sgn.agg(
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("z"))
        .cast("decimal(38,0)")
        .alias("zz")
    )
    ex = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("f2"),
            F.count("*").cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
        )
    )
    ratio = F.round(
        F.col("zz").cast("double") / _AMS_ROWS / F.col("f2").cast("double"), 6
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "n_events",
        "n_users",
        F.col("f2").cast("long").alias("f2_exact"),
        F.round(F.col("zz").cast("double") / _AMS_ROWS, 4).alias("f2_estimate"),
        ratio.alias("est_ratio"),
        ratio.between(0.5, 2.0).alias("within_2x"),
    )


# --- round-11: Pettitt changepoint test ---------------------------------------

_PETTITT_P_CRIT = 0.05


@register(
    "stats_pettitt_test",
    f"""WITH {DAILY_CENTS_CTE},
       tt AS (SELECT count(*)::BIGINT AS t_n FROM d),
       rk AS (SELECT day, x,
                     (2 * rank() OVER (ORDER BY x)
                      + count(*) OVER (PARTITION BY x) - 1)::BIGINT AS r2
              FROM d),
       u AS (SELECT day,
                    row_number() OVER (ORDER BY day) AS t,
                    sum(r2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                      ::BIGINT AS w2
             FROM rk),
       ut AS (SELECT day, t,
                     (w2 - t * (tt.t_n + 1))::BIGINT AS u_t
              FROM u CROSS JOIN tt
              WHERE t < tt.t_n),
       k AS (SELECT max(abs(u_t))::BIGINT AS k_stat FROM ut),
       cp AS (SELECT min(day) AS changepoint_day
              FROM ut, k WHERE abs(u_t) = k.k_stat)
       SELECT tt.t_n AS n_days, k.k_stat, cp.changepoint_day,
              round(2.0 * exp(-6.0 * k.k_stat * k.k_stat
                              / (CAST(tt.t_n AS DOUBLE) * tt.t_n * tt.t_n
                                 + CAST(tt.t_n AS DOUBLE) * tt.t_n)), 6)
                AS p_approx,
              round(2.0 * exp(-6.0 * k.k_stat * k.k_stat
                              / (CAST(tt.t_n AS DOUBLE) * tt.t_n * tt.t_n
                                 + CAST(tt.t_n AS DOUBLE) * tt.t_n)), 6)
                < {_PETTITT_P_CRIT!r} AS shift_detected
       FROM tt CROSS JOIN k CROSS JOIN cp""",
    doc="Pettitt nonparametric changepoint test on the daily revenue "
    "series: U_t telescopes to sum(doubled tie-averaged ranks of the "
    "first t days) - t*(T+1) — the Mann-Whitney identity that turns "
    "the textbook O(T^2) pair sum into one rank window plus one "
    "cumulative sum, ALL INTEGER (doubled ranks absorb tie halves); "
    "K = max|U_t| locates the most probable shift day (earliest on "
    "ties), with the standard 2*exp(-6K^2/(T^3+T^2)) significance "
    "approximation. The rank-based complement to events_changepoint_"
    "cusum (mean CUSUM) — robust to the heavy-tailed revenue days "
    "that drag a mean-based locator. The flag compares the ROUNDED "
    "p. Scale shape: one map-side-combinable daily rollup, then "
    "every window runs over the bounded DATE DOMAIN; three 1-row "
    "broadcasts assemble the report.",
)
def q_stats_pettitt_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    tt = d.agg(F.count("*").cast("long").alias("t_n"))
    rk = d.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count("*").over(Window.partitionBy("x"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    u = rk.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("r2").over(w_run).cast("long").alias("w2"),
    )
    ut = (
        u.crossJoin(F.broadcast(tt))
        .filter(F.col("t") < F.col("t_n"))
        .select(
            "day",
            (F.col("w2") - F.col("t") * (F.col("t_n") + 1))
            .cast("long")
            .alias("u_t"),
        )
        .transform(ckpt)  # bounded day table; feeds max + argmax
    )
    k = ut.agg(F.max(F.abs(F.col("u_t"))).cast("long").alias("k_stat"))
    cp = (
        ut.crossJoin(F.broadcast(k))
        .filter(F.abs(F.col("u_t")) == F.col("k_stat"))
        .agg(F.min("day").alias("changepoint_day"))
    )
    tn = F.col("t_n").cast("double")
    p = F.round(
        2.0
        * F.exp(
            -6.0
            * F.col("k_stat")
            * F.col("k_stat")
            / (tn * F.col("t_n") * F.col("t_n") + tn * F.col("t_n"))
        ),
        6,
    )
    return (
        tt.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(cp))
        .select(
            F.col("t_n").alias("n_days"),
            "k_stat",
            "changepoint_day",
            p.alias("p_approx"),
            (p < F.lit(_PETTITT_P_CRIT)).alias("shift_detected"),
        )
    )


# --- round-11: two-sample variance-ratio F test -------------------------------

_VR_F_CRIT = 1.90  # F(~27, ~27) 0.95 critical value, pinned


@register(
    "stats_variance_ratio_test",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN event_type = 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS a,
                    sum(CASE WHEN event_type <> 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS b
             FROM e GROUP BY day),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(a)::BIGINT AS sa, sum(b)::BIGINT AS sb,
                    sum(a::DECIMAL(38,0) * a)::DECIMAL(38,0) AS qa,
                    sum(b::DECIMAL(38,0) * b)::DECIMAL(38,0) AS qb
             FROM d),
       v AS (SELECT n,
                    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n)
                      / (n - 1) AS va,
                    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n)
                      / (n - 1) AS vb
             FROM s)
       SELECT n AS n_days,
              round(sqrt(va), 4) AS sd_purchase_cents,
              round(sqrt(vb), 4) AS sd_other_cents,
              round(greatest(va, vb) / least(va, vb), 4) AS f_ratio,
              round(greatest(va, vb) / least(va, vb), 4) >= 1.90
                AS variances_differ
       FROM v""",
    doc="Two-sample variance-ratio F test between the daily purchase and "
    "non-purchase revenue series (paired by day): F = larger sample "
    "variance / smaller, against a pinned F(n-1, n-1) 0.95 critical "
    "value — the dispersion counterpart of stats_welch_ttest (which "
    "compares the means and must be told whether pooling is safe; "
    "this test IS that check, and Brown-Forsythe covers the k-group "
    "version on a different table). Sample variances from exact "
    "BIGINT/DECIMAL(38,0) power sums in one aggregate; the flag "
    "compares the ROUNDED ratio. Scale shape: one map-side-"
    "combinable daily rollup over events, one aggregate over the "
    "bounded day table — no window, no join, flat in event count.",
)
def q_stats_variance_ratio_test(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(F.col("event_type") != "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("b"),
    )
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("a"))
        .cast("decimal(38,0)")
        .alias("qa"),
        F.sum(F.col("b").cast("decimal(38,0)") * F.col("b"))
        .cast("decimal(38,0)")
        .alias("qb"),
    )
    n = F.col("n")
    va = (F.col("qa").cast("double") - F.col("sa").cast("double") * F.col("sa") / n) / (
        n - 1
    )
    vb = (F.col("qb").cast("double") - F.col("sb").cast("double") * F.col("sb") / n) / (
        n - 1
    )
    fr = F.round(F.greatest(va, vb) / F.least(va, vb), 4)
    return s.select(
        n.alias("n_days"),
        F.round(F.sqrt(va), 4).alias("sd_purchase_cents"),
        F.round(F.sqrt(vb), 4).alias("sd_other_cents"),
        fr.alias("f_ratio"),
        (fr >= F.lit(_VR_F_CRIT)).alias("variances_differ"),
    )


# --- round-11: streaming twin of the AMS F2 sketch ----------------------------


@register(
    "streaming_ams_f2",
    None,  # shares sketch_ams_f2_cert's oracle (assigned below)
    doc="Streaming twin of sketch_ams_f2_cert, run for real: the events "
    "stream (availableNow, several micro-batches) is reduced per "
    "batch by foreachBatch to (a) the 16 per-seed sign-sum partials "
    "and (b) per-user count partials, each landed at a batch-id-"
    "keyed path (idempotent overwrite). Both states are commutative "
    "monoids — Z_s sums add, per-user counts add — so the fold must "
    "reproduce the batch query EXACTLY (shared oracle): this is the "
    "textbook mergeability claim of the AMS sketch made operational, "
    "the same per-window-partials discipline as streaming_psi_drift. "
    "At 100 TB the 16-counter sketch state is O(1) per window while "
    "the exact side keys on users (the verifiable small-scale "
    "companion; production would keep only the sketch). Scale "
    "shape: per batch one 16-row sign aggregate + one per-user "
    "rollup; fold is O(batches x 16) + O(users).",
)
def q_streaming_ams_f2(spark: SparkSession, sf: str):
    import os
    import shutil
    import tempfile

    from annotations_ingester_spark.functions.hashing import md5_hash64
    from annotations_ingester_spark.plans.catalog import events_table

    ev = events_table(spark, sf).select("event_id", "user_id")
    run_dir = tempfile.mkdtemp(prefix="spark_graft_ams_")
    feed_dir = os.path.join(run_dir, "feed")
    signs = os.path.join(run_dir, "signs")
    counts = os.path.join(run_dir, "counts")
    try:
        ev.repartition(8).write.mode("overwrite").parquet(feed_dir)
        seeds = spark.range(_AMS_ROWS).select(
            F.col("id").cast("long").alias("s")
        )

        def partials(batch_df, batch_id):
            sgn = (
                batch_df.crossJoin(F.broadcast(seeds))
                .select(
                    "s",
                    F.when(
                        md5_hash64(
                            F.concat(
                                F.lit("ams"),
                                F.col("s").cast("string"),
                                F.lit(":"),
                                F.col("user_id").cast("string"),
                            )
                        )
                        % 2
                        == 0,
                        1,
                    )
                    .otherwise(-1)
                    .alias("sign"),
                )
                .groupBy("s")
                .agg(F.sum("sign").cast("long").alias("z"))
            )
            sgn.write.mode("overwrite").parquet(f"{signs}/batch={batch_id}")
            (
                batch_df.groupBy("user_id")
                .agg(F.count("*").cast("long").alias("c"))
                .write.mode("overwrite")
                .parquet(f"{counts}/batch={batch_id}")
            )

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "3")
            .parquet(feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(partials)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        zf = (
            spark.read.parquet(signs)
            .groupBy("s")
            .agg(F.sum("z").cast("long").alias("z"))
        )
        est = zf.agg(
            F.sum(F.col("z").cast("decimal(38,0)") * F.col("z"))
            .cast("decimal(38,0)")
            .alias("zz")
        )
        ex = (
            spark.read.parquet(counts)
            .groupBy("user_id")
            .agg(F.sum("c").cast("long").alias("c"))
            .agg(
                F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
                .cast("decimal(38,0)")
                .alias("f2"),
                F.count("*").cast("long").alias("n_users"),
                F.sum("c").cast("long").alias("n_events"),
            )
        )
        ratio = F.round(
            F.col("zz").cast("double") / _AMS_ROWS / F.col("f2").cast("double"),
            6,
        )
        out = (
            est.crossJoin(F.broadcast(ex))
            .select(
                "n_events",
                "n_users",
                F.col("f2").cast("long").alias("f2_exact"),
                F.round(F.col("zz").cast("double") / _AMS_ROWS, 4).alias(
                    "f2_estimate"
                ),
                ratio.alias("est_ratio"),
                ratio.between(0.5, 2.0).alias("within_2x"),
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


_REG_R11["streaming_ams_f2"].oracle = _REG_R11["sketch_ams_f2_cert"].oracle


# --- round-11: Cramér-von Mises two-sample test -------------------------------

_CVM_CRIT_5PCT = 0.461  # two-sample omega^2 0.95 critical value, pinned


@register(
    "stats_cramer_von_mises",
    f"""WITH {_cdf_oracle_cte(_KS_SRC)},
       t AS (SELECT max(c1) AS n1, max(c2) AS n2 FROM cdf),
       cvm AS (SELECT t.n1, t.n2,
                    sum((k1 + k2)
                        * (c1 * t.n2 - c2 * t.n1)::DECIMAL(38,0)
                        * (c1 * t.n2 - c2 * t.n1))::DECIMAL(38,0) AS num
             FROM cdf, t GROUP BY t.n1, t.n2)
       SELECT n1, n2,
              round(CAST(num AS DOUBLE)
                    / (n1 * 1.0 * n2 * (n1 + n2) * (n1 + n2)), 6) AS t_stat,
              round(CAST(num AS DOUBLE)
                    / (n1 * 1.0 * n2 * (n1 + n2) * (n1 + n2)), 6)
                >= {_CVM_CRIT_5PCT!r} AS distributions_differ
       FROM cvm""",
    doc="Two-sample Cramér-von Mises test on the click-vs-purchase value "
    "distributions: T = sum over pooled values of (k1+k2)*(F1-F2)^2 "
    "scaled by nm/(n+m)^2 — the INTEGRATED-squared-gap companion to "
    "stats_ks_test's single-supremum D (CvM weights the whole CDF "
    "gap, catching spread/shape shifts a one-point supremum misses). "
    "The numerator telescopes to exact DECIMAL(38,0) integers over "
    "the SAME two-level bucketed CDF frame as KS/Mann-Whitney/AUC "
    "(shared _two_sample_cdf machinery — one checkpointed per-value "
    "table, windows over the bounded value domain); ONE double "
    "division, flag on the ROUNDED statistic against the pinned 5% "
    "critical value. Scale shape: identical to stats_ks_test.",
)
def q_stats_cramer_von_mises(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cdf = _two_sample_cdf(s)
    t = cdf.agg(F.max("c1").alias("n1"), F.max("c2").alias("n2"))
    gap = (F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).cast(
        "decimal(38,0)"
    )
    srow = (
        cdf.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(
            F.sum(
                (F.col("k1") + F.col("k2"))
                * gap
                * (F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            )
            .cast("decimal(38,0)")
            .alias("num")
        )
    )
    n1, n2 = F.col("n1"), F.col("n2")
    t_stat = F.round(
        F.col("num").cast("double") / (n1 * 1.0 * n2 * (n1 + n2) * (n1 + n2)),
        6,
    )
    return srow.select(
        "n1",
        "n2",
        t_stat.alias("t_stat"),
        (t_stat >= F.lit(_CVM_CRIT_5PCT)).alias("distributions_differ"),
    )


# --- round-11: paired sign test -----------------------------------------------


@register(
    "stats_sign_test",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN event_type = 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS a,
                    sum(CASE WHEN event_type <> 'purchase'
                             THEN cents ELSE 0 END)::BIGINT AS b
             FROM e GROUP BY day),
       s AS (SELECT count(*)::BIGINT AS n_days,
                    sum(CASE WHEN a > b THEN 1 ELSE 0 END)::BIGINT AS k,
                    sum(CASE WHEN a <> b THEN 1 ELSE 0 END)::BIGINT AS n
             FROM d)
       SELECT n_days, n AS n_informative, k AS n_purchase_higher,
              round((2.0 * k - n) / sqrt(n), 4) AS z_stat,
              abs(round((2.0 * k - n) / sqrt(n), 4)) > 1.96
                AS medians_differ
       FROM s""",
    doc="Paired sign test between the daily purchase and non-purchase "
    "revenue series: counts only WHICH side won each day (ties "
    "dropped), z = (2k - n)/sqrt(n) — the assumption-free floor of "
    "the paired-test ladder (Wilcoxon signed-rank uses magnitudes "
    "and assumes symmetric differences; the sign test needs nothing "
    "but exchangeability, the right default for heavy-tailed revenue "
    "days). Exact integer counts, one rounded z; the flag compares "
    "the ROUNDED statistic. Scale shape: one map-side-combinable "
    "daily rollup over events, one aggregate over the bounded day "
    "table — no window, no join.",
)
def q_stats_sign_test(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.when(F.col("event_type") != "purchase", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("b"),
    )
    s = d.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.when(F.col("a") > F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("k"),
        F.sum(F.when(F.col("a") != F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n"),
    )
    z = F.round((2.0 * F.col("k") - F.col("n")) / F.sqrt(F.col("n")), 4)
    return s.select(
        "n_days",
        F.col("n").alias("n_informative"),
        F.col("k").alias("n_purchase_higher"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("medians_differ"),
    )


# --- round-11: generalized ESD multi-outlier test ------------------------------

# Rosner lambda critical values, alpha=0.05 two-sided, pinned for the
# rehearsal day-domain size (n ~ 30); like _GRANGER_F_CRIT these are
# job parameters, not data-derived
_ESD_LAMBDAS = (3.16, 3.14, 3.12)


def _esd_oracle() -> str:
    a, rounds = [], []
    prev_excl = "SELECT NULL::BIGINT AS day WHERE FALSE"
    for i, lam in enumerate(_ESD_LAMBDAS, start=1):
        rounds.append(f"""ex{i} AS ({prev_excl}),
       s{i} AS (SELECT count(*)::BIGINT AS n, avg(x::DOUBLE) AS mu,
                       sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS q,
                       sum(x)::BIGINT AS sx
                FROM d WHERE day NOT IN (SELECT day FROM ex{i})),
       v{i} AS (SELECT n, mu,
                       sqrt((CAST(q AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx / n) / (n - 1)) AS sd
                FROM s{i}),
       p{i} AS (SELECT d.day, d.x,
                       abs(d.x - v{i}.mu) / v{i}.sd AS r_stat
                FROM d, v{i}
                WHERE d.day NOT IN (SELECT day FROM ex{i})
                ORDER BY abs(d.x - v{i}.mu) / v{i}.sd DESC, d.day
                LIMIT 1)""")
        a.append(
            f"SELECT {i}::BIGINT AS round, day, x AS revenue_cents,"
            f" round(r_stat, 4) AS r_stat, {lam!r} AS lambda_crit,"
            f" round(r_stat, 4) > {lam!r} AS is_outlier FROM p{i}"
        )
        prev_excl = " UNION ALL ".join(
            f"SELECT day FROM p{j}" for j in range(1, i + 1)
        )
    return (
        f"WITH {DAILY_CENTS_CTE},\n       "
        + ",\n       ".join(rounds)
        + "\n       "
        + "\n       UNION ALL\n       ".join(a)
    )


@register(
    "stats_esd_outliers",
    None,  # assembled below (three unrolled suspect rounds)
    doc="Generalized ESD (Rosner) multi-outlier test on the daily revenue "
    "series, three rounds: each round studentizes the remaining days "
    "against their own mean/sd (sample, n-1), picks the maximal "
    "suspect (total order: deviation desc, day asc) and removes it "
    "before the next round — the masking-robust extension of "
    "stats_grubbs_outlier (a second outlier inflates sd and hides "
    "the first from single-pass Grubbs; ESD re-estimates after each "
    "removal). Lambda critical values are pinned job parameters for "
    "the rehearsal day-domain size; flags compare the ROUNDED "
    "statistic. Moments from exact BIGINT/DECIMAL(38,0) power sums "
    "per round. Scale shape: one daily rollup (checkpointed), then "
    "three unrolled (1-row stats broadcast + bounded-day argmax) "
    "rounds — everything after the rollup is day-domain work.",
)
def q_stats_esd_outliers(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    excluded = None
    arms = []
    for i, lam in enumerate(_ESD_LAMBDAS, start=1):
        cur = d if excluded is None else d.join(excluded, "day", "left_anti")
        s = cur.agg(
            F.count("*").cast("long").alias("n"),
            F.avg(F.col("x").cast("double")).alias("mu"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("q"),
            F.sum("x").cast("long").alias("sx"),
        )
        v = s.select(
            "mu",
            F.sqrt(
                (
                    F.col("q").cast("double")
                    - F.col("sx").cast("double") * F.col("sx") / F.col("n")
                )
                / (F.col("n") - 1)
            ).alias("sd"),
        )
        p = (
            cur.crossJoin(F.broadcast(v))
            .select(
                "day",
                "x",
                (F.abs(F.col("x") - F.col("mu")) / F.col("sd")).alias("r_stat"),
            )
            .orderBy(F.desc("r_stat"), F.asc("day"))
            .limit(1)
            .transform(ckpt)  # 1 row; feeds arm + next exclusion
        )
        arms.append(
            p.select(
                F.lit(i).cast("long").alias("round"),
                "day",
                F.col("x").alias("revenue_cents"),
                F.round(F.col("r_stat"), 4).alias("r_stat"),
                F.lit(lam).alias("lambda_crit"),
                (F.round(F.col("r_stat"), 4) > F.lit(lam)).alias("is_outlier"),
            )
        )
        sel = p.select("day")
        excluded = sel if excluded is None else excluded.unionByName(sel)
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionByName(arm)
    return out


_REG_R11["stats_esd_outliers"].oracle = _esd_oracle()


# --- round-11: Page trend test (ordered repeated measures) ---------------------


@register(
    "stats_page_trend_test",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       cell AS (SELECT day, event_type, sum(cents)::BIGINT AS x
                FROM e GROUP BY 1, 2),
       days AS (SELECT DISTINCT day FROM cell),
       types AS (SELECT event_type,
                        row_number() OVER (ORDER BY event_type)::BIGINT
                          AS ord
                 FROM (SELECT DISTINCT event_type FROM cell)),
       grid AS (SELECT d.day, t.event_type, t.ord,
                       coalesce(c.x, 0)::BIGINT AS x
                FROM days d CROSS JOIN types t
                LEFT JOIN cell c
                  ON c.day = d.day AND c.event_type = t.event_type),
       rk AS (SELECT day, event_type, ord,
                     (2 * rank() OVER (PARTITION BY day ORDER BY x)
                      + count(*) OVER (PARTITION BY day, x) - 1)::BIGINT
                       AS r2
              FROM grid),
       rs AS (SELECT ord, sum(r2)::BIGINT AS r2j FROM rk GROUP BY ord),
       dims AS (SELECT count(DISTINCT day)::BIGINT AS m,
                       count(DISTINCT event_type)::BIGINT AS k
                FROM grid),
       l AS (SELECT sum(ord * r2j)::BIGINT AS l2 FROM rs)
       SELECT dims.m AS n_days, dims.k AS n_types, l.l2 AS page_l_doubled,
              round((l.l2 / 2.0
                     - dims.m * dims.k * (dims.k + 1) * (dims.k + 1) / 4.0)
                    / sqrt(dims.m * 1.0 * dims.k * dims.k
                           * (dims.k + 1) * (dims.k + 1) * (dims.k - 1)
                           / 144.0), 4) AS z_stat,
              abs(round((l.l2 / 2.0
                     - dims.m * dims.k * (dims.k + 1) * (dims.k + 1) / 4.0)
                    / sqrt(dims.m * 1.0 * dims.k * dims.k
                           * (dims.k + 1) * (dims.k + 1) * (dims.k - 1)
                           / 144.0), 4)) > 1.96 AS ordered_trend
       FROM dims CROSS JOIN l""",
    doc="Page's L trend test for ordered repeated measures: days are the "
    "blocks, event types the k ordered treatments (pinned "
    "alphabetical hypothesis order), L = sum(ord_j * R_j) over "
    "within-day rank sums — detects a MONOTONE revenue ordering "
    "across treatments that Friedman's omnibus chi-square dilutes "
    "(Friedman asks 'any difference?', Page asks 'THIS order?'; the "
    "blocked companion to stats_jonckheere_terpstra's independent-"
    "groups trend). Doubled tie-averaged ranks keep everything "
    "integral through L; one rounded z against the normal "
    "approximation, flag on the ROUNDED value. Scale shape: one "
    "(day x type) rollup over events, then windows partitioned by "
    "day over the bounded densified grid; two 1-row broadcasts.",
)
def q_stats_page_trend_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = (
        e.groupBy("day", "event_type")
        .agg(F.sum("cents").cast("long").alias("x"))
        .transform(ckpt)
    )
    days = cell.select("day").distinct()
    types = (
        cell.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("long")
            .alias("ord"),
        )
    )
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cell, ["day", "event_type"], "left")
        .select(
            "day",
            "ord",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
        )
    )
    rk = grid.select(
        "ord",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("x"))
            + F.count("*").over(Window.partitionBy("day", "x"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    rs = rk.groupBy("ord").agg(F.sum("r2").cast("long").alias("r2j"))
    dims = grid.agg(
        F.countDistinct("day").cast("long").alias("m"),
        F.countDistinct("ord").cast("long").alias("k"),
    )
    l2 = rs.agg(F.sum(F.col("ord") * F.col("r2j")).cast("long").alias("l2"))
    m, k = F.col("m"), F.col("k")
    z = F.round(
        (F.col("l2") / 2.0 - m * k * (k + 1) * (k + 1) / 4.0)
        / F.sqrt(m * 1.0 * k * k * (k + 1) * (k + 1) * (k - 1) / 144.0),
        4,
    )
    return dims.crossJoin(F.broadcast(l2)).select(
        m.alias("n_days"),
        k.alias("n_types"),
        F.col("l2").alias("page_l_doubled"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("ordered_trend"),
    )


# --- round-11: Wilson score confidence intervals -------------------------------

_WILSON_Z = 1.96


@register(
    "stats_wilson_ci",
    f"""WITH s AS (
         SELECT event_type,
                count(*)::BIGINT AS n,
                sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END)::BIGINT AS k
         FROM events GROUP BY event_type),
       w AS (SELECT event_type, n, k,
                    k * 1.0 / n AS p,
                    {_WILSON_Z} * {_WILSON_Z} AS z2
             FROM s)
       SELECT event_type, n, k,
              round(p, 6) AS p_hat,
              round((p + z2 / (2 * n)
                     - {_WILSON_Z} * sqrt(p * (1 - p) / n
                                          + z2 / (4.0 * n * n)))
                    / (1 + z2 / n), 6) AS ci_lo,
              round((p + z2 / (2 * n)
                     + {_WILSON_Z} * sqrt(p * (1 - p) / n
                                          + z2 / (4.0 * n * n)))
                    / (1 + z2 / n), 6) AS ci_hi
       FROM w""",
    doc="Wilson score 95% confidence interval for the high-value rate "
    "(value >= 150) per event type — the proportion CI that stays "
    "inside [0,1] and behaves at small k where the Wald interval "
    "collapses (the right error bar for every rate this catalog "
    "reports: conversion, dedup, OOV, defect rates). Closed-form "
    "from exact integer (n, k) per group in one scan-fused "
    "aggregate; identical expression tree both engines, one "
    "rounding per bound. Scale shape: one map-side-combinable "
    "5-group aggregate — no window, no join, flat at any scale.",
)
def q_stats_wilson_ci(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("value") >= 150, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    p = F.col("k") * 1.0 / F.col("n")
    z = _WILSON_Z
    z2 = z * z
    n = F.col("n")
    half = z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    return s.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((p + z2 / (2 * n) - half) / (1 + z2 / n), 6).alias("ci_lo"),
        F.round((p + z2 / (2 * n) + half) / (1 + z2 / n), 6).alias("ci_hi"),
    )


# --- round-11: two-sample Poisson rate-ratio test ------------------------------


@register(
    "stats_poisson_rate_ratio",
    """WITH s AS (
         SELECT sum(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END)::BIGINT AS n1,
                sum(CASE WHEN event_type = 'click'
                         THEN 1 ELSE 0 END)::BIGINT AS n2
         FROM events),
       z AS (SELECT n1, n2,
                    (n1 - (n1 + n2) * 0.5)
                      / sqrt((n1 + n2) * 0.25) AS z_stat
             FROM s)
       SELECT n1 AS n_purchase, n2 AS n_click,
              round(n1 * 1.0 / n2, 6) AS rate_ratio,
              round(z_stat, 4) AS z_stat,
              abs(round(z_stat, 4)) > 1.96 AS rates_differ
       FROM z""",
    doc="Two-sample Poisson rate-ratio test between purchase and click "
    "event counts over the same exposure window: the CONDITIONAL "
    "(binomial) test — given N = n1 + n2 total events, n1 ~ "
    "Binomial(N, 1/2) under equal rates, z = (n1 - N/2)/sqrt(N/4) — "
    "the exact-conditioning trick that removes the unknown baseline "
    "rate entirely (no per-day variance estimate needed, unlike the "
    "t-family on daily rollups; equal exposure is by construction "
    "here since both series cover the identical window). Integer "
    "counts, one z, flag on the ROUNDED statistic. Scale shape: one "
    "scan-fused full aggregate — no window, no join, no rollup.",
)
def q_stats_poisson_rate_ratio(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    z = (n1 - (n1 + n2) * 0.5) / F.sqrt((n1 + n2) * 0.25)
    return s.select(
        n1.alias("n_purchase"),
        n2.alias("n_click"),
        F.round(n1 * 1.0 / n2, 6).alias("rate_ratio"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) > 1.96).alias("rates_differ"),
    )


# --- round-11: Quade test (range-weighted blocked ranks) -----------------------


@register(
    "stats_quade_test",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       cell AS (SELECT day, event_type, sum(cents)::BIGINT AS x
                FROM e GROUP BY 1, 2),
       days AS (SELECT DISTINCT day FROM cell),
       types AS (SELECT DISTINCT event_type FROM cell),
       grid AS (SELECT d.day, t.event_type,
                       coalesce(c.x, 0)::BIGINT AS x
                FROM days d CROSS JOIN types t
                LEFT JOIN cell c
                  ON c.day = d.day AND c.event_type = t.event_type),
       rk AS (SELECT day, event_type,
                     (2 * rank() OVER (PARTITION BY day ORDER BY x)
                      + count(*) OVER (PARTITION BY day, x) - 1)::BIGINT
                       AS r2
              FROM grid),
       rng AS (SELECT day, max(x) - min(x) AS range_x FROM grid
               GROUP BY day),
       qr AS (SELECT day,
                     (2 * rank() OVER (ORDER BY range_x)
                      + count(*) OVER (PARTITION BY range_x) - 1)::BIGINT
                       AS q2
              FROM rng),
       dims AS (SELECT count(DISTINCT day)::BIGINT AS m,
                       count(DISTINCT event_type)::BIGINT AS k
                FROM grid),
       s AS (SELECT rk.event_type,
                    sum(qr.q2 * (rk.r2 - (dims.k + 1)))::BIGINT AS s4j
             FROM rk JOIN qr USING (day) CROSS JOIN dims
             GROUP BY rk.event_type),
       ab AS (SELECT sum((qr.q2 * (rk.r2 - (dims.k + 1)))::DECIMAL(38,0)
                         * (qr.q2 * (rk.r2 - (dims.k + 1))))::DECIMAL(38,0)
                       AS a16
              FROM rk JOIN qr USING (day) CROSS JOIN dims),
       b16 AS (SELECT sum(s4j::DECIMAL(38,0) * s4j)::DECIMAL(38,0) AS bnum
               FROM s)
       SELECT dims.m AS n_days, dims.k AS n_types,
              round((dims.m - 1)
                    * (CAST(b16.bnum AS DOUBLE) / dims.m)
                    / (CAST(ab.a16 AS DOUBLE)
                       - CAST(b16.bnum AS DOUBLE) / dims.m), 4) AS quade_f,
              round((dims.m - 1)
                    * (CAST(b16.bnum AS DOUBLE) / dims.m)
                    / (CAST(ab.a16 AS DOUBLE)
                       - CAST(b16.bnum AS DOUBLE) / dims.m), 4) >= 2.61
                AS treatments_differ
       FROM dims CROSS JOIN ab CROSS JOIN b16""",
    doc="Quade test across event types blocked by day — the range-"
    "weighted Friedman: each day's within-day treatment ranks are "
    "weighted by the rank of that day's RANGE, so high-signal days "
    "count more (Friedman treats a flat day and a wild day equally; "
    "Quade dominates it at small k). Doubled tie-averaged ranks for "
    "both rank layers keep S_ij = Q_i*(R_ij - (k+1)/2) integral at "
    "4x scale (the 16x factor cancels in F = (m-1)B/(A-B)); exact "
    "DECIMAL(38,0) squares; flag on the ROUNDED F against a pinned "
    "F(k-1, (m-1)(k-1)) 0.95 value. Scale shape: one (day x type) "
    "rollup over events, windows over the bounded densified grid "
    "(day-partitioned ranks + a day-domain range rank), three "
    "bounded aggregates.",
)
def q_stats_quade_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = (
        e.groupBy("day", "event_type")
        .agg(F.sum("cents").cast("long").alias("x"))
        .transform(ckpt)
    )
    days = cell.select("day").distinct()
    types = cell.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cell, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
        )
        .transform(ckpt)  # bounded grid; feeds ranks + ranges
    )
    rk = grid.select(
        "day",
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("x"))
            + F.count("*").over(Window.partitionBy("day", "x"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    rng = grid.groupBy("day").agg((F.max("x") - F.min("x")).alias("range_x"))
    qr = rng.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("range_x"))
            + F.count("*").over(Window.partitionBy("range_x"))
            - 1
        )
        .cast("long")
        .alias("q2"),
    )
    dims = grid.agg(
        F.countDistinct("day").cast("long").alias("m"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    sij = rk.join(qr, "day").crossJoin(F.broadcast(dims)).select(
        "event_type",
        (F.col("q2") * (F.col("r2") - (F.col("k") + 1))).alias("s4"),
    ).transform(ckpt)  # bounded (day x type); feeds A and S_j
    s = sij.groupBy("event_type").agg(F.sum("s4").cast("long").alias("s4j"))
    a16 = sij.agg(
        F.sum(F.col("s4").cast("decimal(38,0)") * F.col("s4"))
        .cast("decimal(38,0)")
        .alias("a16")
    )
    bnum = s.agg(
        F.sum(F.col("s4j").cast("decimal(38,0)") * F.col("s4j"))
        .cast("decimal(38,0)")
        .alias("bnum")
    )
    m = F.col("m")
    bb = F.col("bnum").cast("double") / m
    f_stat = F.round(
        (m - 1) * bb / (F.col("a16").cast("double") - bb), 4
    )
    return (
        dims.crossJoin(F.broadcast(a16))
        .crossJoin(F.broadcast(bnum))
        .select(
            m.alias("n_days"),
            F.col("k").alias("n_types"),
            f_stat.alias("quade_f"),
            (f_stat >= 2.61).alias("treatments_differ"),
        )
    )


# --- round-11: exponentiality test for interarrival gaps -----------------------


@register(
    "stats_exponentiality_test",
    """WITH e AS (
         SELECT user_id, floor(epoch(ts))::BIGINT AS ts_s FROM events),
       seq AS (SELECT ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                             ORDER BY ts_s) AS gap
               FROM e),
       g AS (SELECT gap FROM seq WHERE gap IS NOT NULL AND gap > 0),
       t AS (SELECT count(*)::BIGINT AS n, sum(gap)::BIGINT AS s FROM g),
       pv AS (SELECT gap, count(*)::BIGINT AS k FROM g GROUP BY gap),
       c AS (SELECT gap, k,
                    sum(k) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING)
                      ::BIGINT AS cum
             FROM pv),
       d AS (SELECT t.n, t.s,
                    max(abs(c.cum * 1.0 / t.n
                            - (1.0 - exp(-(t.n * 1.0 / t.s) * c.gap))))
                      AS d_stat
             FROM c, t GROUP BY t.n, t.s)
       SELECT n AS n_gaps,
              round(s * 1.0 / n, 4) AS mean_gap_s,
              round(d_stat, 6) AS d_stat,
              round(d_stat * sqrt(n), 4) AS d_scaled,
              round(d_stat * sqrt(n), 4) > 1.08 AS not_exponential
       FROM d""",
    doc="Lilliefors-type exponentiality test of the per-user "
    "interarrival gaps: KS distance between the pooled empirical gap "
    "CDF and Exp(1/mean) with the rate ESTIMATED from the same data "
    "(hence the Lilliefors critical value ~1.08/sqrt(n), pinned, not "
    "the vanilla KS 1.36) — the formal version of the Poisson-"
    "process assumption events_interarrival_stats eyeballs and the "
    "bot-score's regularity signal implies: real human traffic is "
    "over-dispersed, schedulers are under-dispersed, both reject. "
    "The empirical CDF runs over the DISTINCT-gap value domain "
    "(seconds, bounded by the time span); the analytic CDF is one "
    "deterministic exp() per distinct value from broadcast (n, s). "
    "Flag on the ROUNDED scaled statistic. Scale shape: one user-"
    "partitioned lag window, a distinct-gap rollup, one bounded "
    "cumulative window + aggregate.",
)
def q_stats_exponentiality_test(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select("user_id", "ts_s")
    seq = e.select(
        (
            F.col("ts_s")
            - F.lag("ts_s").over(Window.partitionBy("user_id").orderBy("ts_s"))
        ).alias("gap")
    )
    g = seq.filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    pv = g.groupBy("gap").agg(F.count("*").cast("long").alias("k")).transform(ckpt)  # distinct-gap value domain; feeds totals + CDF
    t = pv.agg(
        F.sum("k").cast("long").alias("n"),
        F.sum(F.col("gap") * F.col("k")).cast("long").alias("s"),
    )
    w = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    c = pv.select("gap", F.sum("k").over(w).cast("long").alias("cum"))
    d = (
        c.crossJoin(F.broadcast(t))
        .groupBy("n", "s")
        .agg(
            F.max(
                F.abs(
                    F.col("cum") * 1.0 / F.col("n")
                    - (
                        1.0
                        - F.exp(
                            -(F.col("n") * 1.0 / F.col("s")) * F.col("gap")
                        )
                    )
                )
            ).alias("d_stat")
        )
    )
    ds = F.round(F.col("d_stat") * F.sqrt(F.col("n")), 4)
    return d.select(
        F.col("n").alias("n_gaps"),
        F.round(F.col("s") * 1.0 / F.col("n"), 4).alias("mean_gap_s"),
        F.round(F.col("d_stat"), 6).alias("d_stat"),
        ds.alias("d_scaled"),
        (ds > 1.08).alias("not_exponential"),
    )


# --- round-12 head start: variance-shift CUSUM --------------------------------


@register(
    "stats_cusum_variance",
    f"""WITH {DAILY_CENTS_CTE},
       g AS (SELECT count(*)::BIGINT AS n, avg(x::DOUBLE) AS mu,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS q,
                    sum(x)::BIGINT AS sx
             FROM d),
       v AS (SELECT n, mu,
                    (CAST(q AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n
                      AS var0
             FROM g),
       t1 AS (SELECT d.day,
                     round((d.x - v.mu) * (d.x - v.mu) / v.var0 - 1.0, 9)
                       ::DECIMAL(20,9) AS term
              FROM d, v),
       m AS (SELECT day,
                    sum(term) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                      AS st
             FROM t1),
       k AS (SELECT max(abs(CAST(st AS DOUBLE))) AS k_stat FROM m),
       cp AS (SELECT min(day) AS shift_day FROM m, k
              WHERE abs(CAST(st AS DOUBLE)) = k.k_stat)
       SELECT g.n AS n_days,
              round(k.k_stat, 4) AS k_stat,
              cp.shift_day,
              round(k.k_stat / sqrt(2.0 * g.n), 4) AS k_scaled,
              round(k.k_stat / sqrt(2.0 * g.n), 4) > 1.36
                AS variance_shift_detected
       FROM g CROSS JOIN k CROSS JOIN cp""",
    doc="Variance-shift CUSUM on the daily revenue series: cumulative "
    "sum of the standardized squared deviations minus one "
    "((x-mu)^2/var - 1 has mean 0 under constant variance), max "
    "|S_t| locating the most likely VOLATILITY changepoint — the "
    "second-moment companion to events_changepoint_cusum (mean "
    "shifts) and stats_pettitt_test (location, rank-based): a "
    "variance regime change (flash-sale turbulence, metering bug) "
    "leaves the mean CUSUM flat and this one kinked. Terms round to "
    "9 dp and cumulate as DECIMAL; scaled by sqrt(2n) (the "
    "asymptotic sd of the chi-square(1)-increment walk) against a "
    "pinned KS-style 1.36 bar on the ROUNDED value. Scale shape: "
    "one daily rollup, a 1-row moment broadcast, windows over the "
    "bounded DATE DOMAIN, two 1-row report broadcasts.",
)
def q_stats_cusum_variance(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    g = d.agg(
        F.count("*").cast("long").alias("n"),
        F.avg(F.col("x").cast("double")).alias("mu"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
        F.sum("x").cast("long").alias("sx"),
    )
    v = g.select(
        "n",
        "mu",
        (
            (
                F.col("q").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n")
            )
            / F.col("n")
        ).alias("var0"),
    )
    t1 = d.crossJoin(F.broadcast(v)).select(
        "day",
        F.round(
            (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")) / F.col("var0")
            - 1.0,
            9,
        )
        .cast("decimal(20,9)")
        .alias("term"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = t1.select("day", F.sum("term").over(w).alias("st")).transform(ckpt)  # bounded day table; feeds max + argmax
    k = m.agg(F.max(F.abs(F.col("st").cast("double"))).alias("k_stat"))
    cp = (
        m.crossJoin(F.broadcast(k))
        .filter(F.abs(F.col("st").cast("double")) == F.col("k_stat"))
        .agg(F.min("day").alias("shift_day"))
    )
    ks = F.round(F.col("k_stat") / F.sqrt(2.0 * F.col("n")), 4)
    return (
        g.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(cp))
        .select(
            F.col("n").alias("n_days"),
            F.round(F.col("k_stat"), 4).alias("k_stat"),
            "shift_day",
            ks.alias("k_scaled"),
            (ks > 1.36).alias("variance_shift_detected"),
        )
    )


# --- round-11 additions --------------------------------------------------------


@register(
    "stats_g_test",
    """WITH e AS (
         SELECT ((floor(epoch(ts))::BIGINT // 86400) % 7)::BIGINT AS dow,
                event_type
         FROM events),
       obs AS (SELECT dow, event_type, count(*)::DOUBLE AS o
               FROM e GROUP BY dow, event_type),
       rt AS (SELECT dow, sum(o) AS rl FROM obs GROUP BY dow),
       ct AS (SELECT event_type, sum(o) AS cl FROM obs GROUP BY event_type),
       n AS (SELECT sum(o) AS n FROM obs),
       cells AS (
         SELECT round(2.0 * o * ln(o / (rl * cl / n.n)), 9)
                  ::DECIMAL(20,9) AS term
         FROM obs JOIN rt USING (dow) JOIN ct USING (event_type)
              CROSS JOIN n),
       dims AS (
         SELECT (SELECT count(*) FROM rt) AS nr,
                (SELECT count(*) FROM ct) AS nc)
       SELECT round(CAST(sum(term) AS DOUBLE), 6) AS g_stat,
              ((SELECT nr FROM dims) - 1) * ((SELECT nc FROM dims) - 1)
                AS dof,
              count(*)::BIGINT AS n_cells
       FROM cells""",
    doc="G-test (log-likelihood ratio) of independence over the "
    "day-of-week × event_type contingency table: G = 2·Σ O·ln(O/E), "
    "E = rl·cl/N — the information-theoretic twin of "
    "stats_chi_square_independence (G is 2N·MI(nats) between the "
    "margins, additive across partitions of the table, and "
    "preferable when any O/E is far from 1 where Pearson's "
    "quadratic approximation degrades). Observed cells only (O=0 "
    "contributes 0 by the x·ln x limit); per-cell terms rounded to "
    "9 dp and summed as DECIMAL(20,9) (order-free parity). Scale "
    "shape: identical to the chi-square — one map-side-combinable "
    "groupBy builds the 7×|types| table; everything after is "
    "aggregates of a constant-size frame.",
)
def q_stats_g_test(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST((ts_s DIV 86400) % 7 AS BIGINT)").alias("dow"),
        "event_type",
    )
    obs = e.groupBy("dow", "event_type").agg(
        F.count("*").cast("double").alias("o")
    )
    obs = obs.transform(ckpt)  # 7 x |types| cells; feeds 4 consumers
    rt = obs.groupBy("dow").agg(F.sum("o").alias("rl"))
    ct = obs.groupBy("event_type").agg(F.sum("o").alias("cl"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "dow")
        .join(F.broadcast(ct), "event_type")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                2.0
                * F.col("o")
                * F.log(F.col("o") / (F.col("rl") * F.col("cl") / F.col("n"))),
                9,
            )
            .cast("decimal(20,9)")
            .alias("term")
        )
    )
    dims = rt.agg(F.count("*").alias("nr")).crossJoin(
        F.broadcast(ct.agg(F.count("*").alias("nc")))
    )
    return (
        cells.agg(
            F.round(F.sum("term").cast("double"), 6).alias("g_stat"),
            F.count("*").cast("long").alias("n_cells"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "g_stat",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            "n_cells",
        )
    )


@register(
    "stats_mantel_haenszel",
    """WITH c AS (
         SELECT n.n_regionkey AS stratum,
                CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                  AS exposed,
                CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END AS outcome
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
       cells AS (
         SELECT stratum,
                sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END)
                  ::DOUBLE AS a,
                sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END)
                  ::DOUBLE AS b,
                sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END)
                  ::DOUBLE AS cc,
                sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END)
                  ::DOUBLE AS d
         FROM c GROUP BY stratum),
       t AS (SELECT stratum, a, b, cc, d, a + b + cc + d AS n,
                    a + b AS r1, cc + d AS r2, a + cc AS c1, b + d AS c2
             FROM cells),
       s AS (SELECT sum(a * d / n) AS srn, sum(b * cc / n) AS ssn,
                    sum(a) AS sa, sum(r1 * c1 / n) AS se,
                    sum(r1 * r2 * c1 * c2 / (n * n * (n - 1))) AS sv,
                    count(*)::BIGINT AS n_strata
             FROM t)
       SELECT n_strata,
              round(srn / ssn, 6) AS mh_odds_ratio,
              round(pow(abs(sa - se) - 0.5, 2) / sv, 6) AS cmh_stat,
              round(pow(abs(sa - se) - 0.5, 2) / sv, 6) > 3.841
                AS association_detected
       FROM s""",
    doc="Mantel-Haenszel stratified 2×2 analysis over customers: "
    "stratum = region, exposure = BUILDING market segment, outcome = "
    "positive account balance. Reports the MH common odds ratio "
    "Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) and the continuity-corrected "
    "Cochran-Mantel-Haenszel statistic (|Σa − ΣE|−½)²/ΣV with "
    "hypergeometric variance — THE tool for 'is the association "
    "real once a confounder is stratified out', which a flat "
    "chi-square cannot answer (Simpson's paradox). Scale shape: one "
    "broadcast join to nation, one map-side-combinable groupBy to a "
    "5-row stratum table, then constant-size arithmetic — identical "
    "at any sf.",
)
def q_stats_mantel_haenszel(spark: SparkSession, sf: str):
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    c = cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]).select(
        F.col("n_regionkey").alias("stratum"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("exposed"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("outcome"),
    )
    cells = c.groupBy("stratum").agg(
        F.sum(F.when((F.col("exposed") == 1) & (F.col("outcome") == 1), 1).otherwise(0))
        .cast("double")
        .alias("a"),
        F.sum(F.when((F.col("exposed") == 1) & (F.col("outcome") == 0), 1).otherwise(0))
        .cast("double")
        .alias("b"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("outcome") == 1), 1).otherwise(0))
        .cast("double")
        .alias("cc"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("outcome") == 0), 1).otherwise(0))
        .cast("double")
        .alias("d"),
    )
    t = cells.select(
        "stratum",
        "a",
        "b",
        "cc",
        "d",
        (F.col("a") + F.col("b") + F.col("cc") + F.col("d")).alias("n"),
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("cc") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("cc")).alias("c1"),
        (F.col("b") + F.col("d")).alias("c2"),
    )
    s = t.agg(
        F.sum(F.col("a") * F.col("d") / F.col("n")).alias("srn"),
        F.sum(F.col("b") * F.col("cc") / F.col("n")).alias("ssn"),
        F.sum("a").alias("sa"),
        F.sum(F.col("r1") * F.col("c1") / F.col("n")).alias("se"),
        F.sum(
            F.col("r1")
            * F.col("r2")
            * F.col("c1")
            * F.col("c2")
            / (F.col("n") * F.col("n") * (F.col("n") - 1))
        ).alias("sv"),
        F.count("*").cast("long").alias("n_strata"),
    )
    cmh = F.round(
        F.pow(F.abs(F.col("sa") - F.col("se")) - 0.5, 2) / F.col("sv"), 6
    )
    return s.select(
        "n_strata",
        F.round(F.col("srn") / F.col("ssn"), 6).alias("mh_odds_ratio"),
        cmh.alias("cmh_stat"),
        (cmh > 3.841).alias("association_detected"),
    )


@register(
    "stats_chow_test",
    f"""WITH {DAILY_CENTS_CTE},
       bounds AS (SELECT min(day) AS d0,
                         (min(day) + (max(day) - min(day)) // 2) AS brk
                  FROM d),
       pts AS (SELECT (day - d0)::DOUBLE AS x, d.x::DOUBLE AS y,
                      CASE WHEN day <= brk THEN 0 ELSE 1 END AS seg
               FROM d CROSS JOIN bounds),
       fit AS (
         SELECT seg, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
         FROM pts GROUP BY seg),
       ssr AS (
         SELECT seg, n,
                syy - sy * sy / n
                  - pow(sxy - sx * sy / n, 2) / (sxx - sx * sx / n) AS rss
         FROM fit),
       pool AS (
         SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
         FROM pts),
       poolr AS (
         SELECT n,
                syy - sy * sy / n
                  - pow(sxy - sx * sy / n, 2) / (sxx - sx * sx / n) AS rss
         FROM pool),
       agg AS (SELECT sum(rss) AS rss_u, sum(n) AS n_tot,
                      count(*)::BIGINT AS n_segs
               FROM ssr)
       SELECT (SELECT brk FROM bounds)::BIGINT AS break_day,
              n_tot::BIGINT AS n_days,
              round((SELECT rss FROM poolr), 4) AS rss_pooled,
              round(rss_u, 4) AS rss_unrestricted,
              round(((SELECT rss FROM poolr) - rss_u) / 2
                    / (rss_u / (n_tot - 4)), 6) AS f_stat,
              round(((SELECT rss FROM poolr) - rss_u) / 2
                    / (rss_u / (n_tot - 4)), 6) > 3.0
                AS structural_break
       FROM agg""",
    doc="Chow structural-break test on the daily-revenue linear trend: "
    "fit y = a + b·x separately on the two halves (break at the "
    "midpoint day) and pooled, F = ((RSS_p − RSS₁ − RSS₂)/k) / "
    "((RSS₁+RSS₂)/(n − 2k)) with k = 2 parameters — the standard "
    "'did the regime change' audit for a pipeline's throughput/"
    "revenue trend line. Closed-form OLS via sufficient statistics "
    "(Σx, Σy, Σxx, Σxy, Σyy per segment), so the whole test is one "
    "map-side-combinable rollup to days, one 2-row groupBy, and "
    "constant-size arithmetic; no window, no join, no iteration.",
)
def q_stats_chow_test(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    d = d.transform(ckpt)  # bounded day table; feeds bounds + pts
    bounds = d.agg(
        F.min("day").alias("d0"),
        (F.min("day") + ((F.max("day") - F.min("day")) / 2).cast("long")).alias(
            "brk"
        ),
    )
    pts = d.crossJoin(F.broadcast(bounds)).select(
        (F.col("day") - F.col("d0")).cast("double").alias("x"),
        d["x"].cast("double").alias("y"),  # d.x = daily revenue cents
        F.when(F.col("day") <= F.col("brk"), 0).otherwise(1).alias("seg"),
    )

    def suff(gdf, keys):
        return gdf.agg(
            F.count("*").cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )

    rss_expr = (
        F.col("syy")
        - F.col("sy") * F.col("sy") / F.col("n")
        - F.pow(F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"), 2)
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    )
    ssr = suff(pts.groupBy("seg"), ["seg"]).select("n", rss_expr.alias("rss"))
    poolr = suff(pts.groupBy(), []).select(rss_expr.alias("rss"))
    agg = ssr.agg(
        F.sum("rss").alias("rss_u"), F.sum("n").alias("n_tot")
    )
    f_stat = F.round(
        (F.col("rss_p") - F.col("rss_u"))
        / 2
        / (F.col("rss_u") / (F.col("n_tot") - 4)),
        6,
    )
    return (
        agg.crossJoin(F.broadcast(poolr.select(F.col("rss").alias("rss_p"))))
        .crossJoin(F.broadcast(bounds.select(F.col("brk").alias("break_day"))))
        .select(
            F.col("break_day").cast("long"),
            F.col("n_tot").cast("long").alias("n_days"),
            F.round(F.col("rss_p"), 4).alias("rss_pooled"),
            F.round(F.col("rss_u"), 4).alias("rss_unrestricted"),
            f_stat.alias("f_stat"),
            (f_stat > 3.0).alias("structural_break"),
        )
    )


_EB_BAL = 5000  # "high-balance" conversion definition


@register(
    "stats_eb_shrinkage",
    f"""WITH c AS (
         SELECT n.n_name AS nation,
                count(*)::BIGINT AS n,
                sum(CASE WHEN c.c_acctbal > {_EB_BAL} THEN 1 ELSE 0 END)
                  ::BIGINT AS y
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name),
       p AS (SELECT nation, n, y, y * 1.0 / n AS pr FROM c),
       mom AS (SELECT avg(pr) AS pbar,
                      round(avg(pr * pr) - avg(pr) * avg(pr), 9) AS s2
               FROM p),
       prior AS (SELECT pbar, s2,
                        pbar * (1 - pbar) / s2 - 1 AS m
                 FROM mom)
       SELECT p.nation, p.n, p.y,
              round(p.pr, 6) AS raw_rate,
              round((p.y + prior.pbar * prior.m)
                    / (p.n + prior.m), 6) AS shrunk_rate,
              round(p.n / (p.n + prior.m), 6) AS shrink_weight
       FROM p CROSS JOIN prior""",
    doc="Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of "
    "per-nation high-balance rates: fit the Beta prior from the "
    "across-nation rate moments (M = p̄(1−p̄)/s² − 1 prior "
    "pseudo-observations), then shrink each nation's raw rate toward "
    "the grand mean by n/(n+M) — THE small-sample fix for ranking "
    "segments by rate (a 3-customer nation at 100% must not outrank "
    "a 3000-customer nation at 80%; the A/B family tests differences, "
    "this produces usable per-segment ESTIMATES). Population variance "
    "via avg(p²)−avg(p)², rounded once at 9 dp (the parity anchor); "
    "per-row outputs rounded at 6. Scale shape: one broadcast join to "
    "nation, one map-side-combinable rollup to the 25-row nation "
    "table, a 1-row prior broadcast back over it.",
)
def q_stats_eb_shrinkage(spark: SparkSession, sf: str):
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation").select("n_nationkey", "n_name")
    c = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("c_acctbal") > _EB_BAL, 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    p = c.select("nation", "n", "y", (F.col("y") * 1.0 / F.col("n")).alias("pr"))
    p = p.transform(ckpt)  # 25-row nation table; feeds mom + report
    mom = p.agg(
        F.avg("pr").alias("pbar"),
        F.round(F.avg(F.col("pr") * F.col("pr")) - F.avg("pr") * F.avg("pr"), 9).alias(
            "s2"
        ),
    )
    prior = mom.select(
        "pbar", "s2", (F.col("pbar") * (1 - F.col("pbar")) / F.col("s2") - 1).alias("m")
    )
    return p.crossJoin(F.broadcast(prior)).select(
        "nation",
        "n",
        "y",
        F.round(F.col("pr"), 6).alias("raw_rate"),
        F.round(
            (F.col("y") + F.col("pbar") * F.col("m")) / (F.col("n") + F.col("m")), 6
        ).alias("shrunk_rate"),
        F.round(F.col("n") / (F.col("n") + F.col("m")), 6).alias("shrink_weight"),
    )


@register(
    "stats_rayleigh_hour_uniformity",
    """WITH e AS (
         SELECT ((floor(epoch(ts))::BIGINT % 86400) // 3600)::BIGINT AS hr
         FROM events),
       h AS (SELECT hr, count(*)::BIGINT AS n_h FROM e GROUP BY hr),
       v AS (SELECT hr, n_h,
                    round(cos(2 * pi() * hr / 24.0), 9) AS ch,
                    round(sin(2 * pi() * hr / 24.0), 9) AS sh
             FROM h),
       s AS (SELECT sum(n_h)::BIGINT AS n,
                    sum(n_h * ch) AS cc, sum(n_h * sh) AS ss
             FROM v),
       r AS (SELECT n, cc, ss,
                    sqrt(cc * cc + ss * ss) / n AS rbar
             FROM s)
       SELECT n AS n_events,
              round(rbar, 6) AS resultant_r,
              round(((atan2(ss, cc) + 2 * pi()) % (2 * pi()))
                    / (2 * pi()) * 24, 4) AS mean_hour_utc,
              round(n * rbar * rbar, 4) AS rayleigh_z,
              round(n * rbar * rbar, 4) > 3.0 AS hour_nonuniform
       FROM r""",
    doc="Circular statistics for event time-of-day: hours become angles "
    "on the 24-hour circle, the resultant vector gives the circular "
    "mean hour and concentration R̄, and the Rayleigh statistic "
    "z = n·R̄² tests uniformity — the CORRECT treatment of cyclic "
    "time (a linear mean of {{23h, 1h}} says noon; the circular mean "
    "says midnight), complementing events_hourly_seasonality's "
    "per-hour table with the one-number direction/concentration "
    "summary. cos/sin are evaluated on the 24 integer hours only and "
    "rounded to 9 dp before the weighted sum, so both engines fold "
    "identical per-hour constants. Scale shape: one map-side-"
    "combinable hour rollup (24 rows), then constant-size arithmetic.",
)
def q_stats_rayleigh_hour(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST((ts_s % 86400) DIV 3600 AS BIGINT)").alias("hr")
    )
    h = e.groupBy("hr").agg(F.count("*").cast("long").alias("n_h"))
    v = h.select(
        "n_h",
        F.round(F.cos(2 * F.lit(3.141592653589793) * F.col("hr") / 24.0), 9).alias(
            "ch"
        ),
        F.round(F.sin(2 * F.lit(3.141592653589793) * F.col("hr") / 24.0), 9).alias(
            "sh"
        ),
    )
    s = v.agg(
        F.sum("n_h").cast("long").alias("n"),
        F.sum(F.col("n_h") * F.col("ch")).alias("cc"),
        F.sum(F.col("n_h") * F.col("sh")).alias("ss"),
    )
    rbar = F.sqrt(F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss")) / F.col("n")
    two_pi = 2 * 3.141592653589793
    mean_hour = F.round(
        ((F.atan2(F.col("ss"), F.col("cc")) + two_pi) % two_pi) / two_pi * 24, 4
    )
    z = F.round(F.col("n") * rbar * rbar, 4)
    return s.select(
        F.col("n").alias("n_events"),
        F.round(rbar, 6).alias("resultant_r"),
        mean_hour.alias("mean_hour_utc"),
        z.alias("rayleigh_z"),
        (z > 3.0).alias("hour_nonuniform"),
    )


@register(
    "stats_powerlaw_tail_fit",
    """WITH c AS (SELECT user_id, count(*)::BIGINT AS deg
             FROM events GROUP BY user_id),
       xm AS (SELECT quantile_disc(deg, 0.5)::BIGINT AS xmin FROM c),
       tail AS (SELECT c.deg, xm.xmin FROM c CROSS JOIN xm
                WHERE c.deg >= xm.xmin),
       hill AS (SELECT count(*)::BIGINT AS n_tail,
                       min(xmin)::BIGINT AS xmin,
                       sum(round(ln(deg * 1.0 / xmin), 9)::DECIMAL(20,9))
                         AS slog
                FROM tail),
       dd AS (SELECT deg, count(*)::BIGINT AS k FROM tail GROUP BY deg),
       ccdf AS (SELECT deg,
                       (sum(k) OVER (ORDER BY deg DESC
                                     ROWS UNBOUNDED PRECEDING))::BIGINT
                         AS n_ge
                FROM dd),
       pts AS (SELECT round(ln(deg), 9) AS lx,
                      round(ln(n_ge * 1.0
                               / (SELECT n_tail FROM hill)), 9) AS ly
               FROM ccdf),
       fit AS (SELECT count(*)::DOUBLE AS n, sum(lx) AS sx, sum(ly) AS sy,
                      sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
               FROM pts)
       SELECT hill.n_tail, hill.xmin,
              round(1.0 + hill.n_tail / CAST(hill.slog AS DOUBLE), 4)
                AS hill_alpha,
              round(-(fit.sxy - fit.sx * fit.sy / fit.n)
                    / (fit.sxx - fit.sx * fit.sx / fit.n), 4)
                AS ccdf_slope_alpha_minus_1,
              round(1.0 + hill.n_tail / CAST(hill.slog AS DOUBLE), 4)
                BETWEEN 1.5 AND 4.0 AS plausible_powerlaw
       FROM hill CROSS JOIN fit""",
    doc="Power-law tail diagnosis of the per-user activity distribution: "
    "the Hill MLE alpha = 1 + n/Σ ln(x/xmin) over the tail above the "
    "median, cross-checked by the log-log CCDF OLS slope (≈ alpha−1 "
    "under a true power law; divergence between the two flags "
    "lognormal/exponential look-alikes) — the number that decides "
    "whether hot-key mitigations (salting, hub caps, AQE skew joins) "
    "are load-bearing for this corpus or paranoia: alpha < 2 means "
    "unbounded mean, a guaranteed straggler without them. Log terms "
    "are 9-dp-rounded and decimal-summed (order-free); OLS via "
    "sufficient statistics. Scale shape: one map-side-combinable "
    "per-user rollup, exact median via quantile_disc on it, then all "
    "windows/fits run over the bounded DISTINCT-degree table.",
)
def q_stats_powerlaw_tail_fit(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = (
        events_table(spark, sf)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    c = c.transform(ckpt)  # per-user rollup; feeds median + tail
    xm = c.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY deg)")
        .cast("long")
        .alias("xmin")
    )
    tail = c.crossJoin(F.broadcast(xm)).filter(F.col("deg") >= F.col("xmin"))
    tail = tail.transform(ckpt)  # feeds hill + ccdf
    hill = tail.agg(
        F.count("*").cast("long").alias("n_tail"),
        F.min("xmin").cast("long").alias("xmin"),
        F.sum(
            F.round(F.log(F.col("deg") * 1.0 / F.col("xmin")), 9).cast(
                "decimal(20,9)"
            )
        ).alias("slog"),
    )
    dd = tail.groupBy("deg").agg(F.count("*").cast("long").alias("k"))
    w = Window.orderBy(F.desc("deg")).rowsBetween(Window.unboundedPreceding, 0)
    ccdf = dd.select("deg", F.sum("k").over(w).cast("long").alias("n_ge"))
    pts = ccdf.crossJoin(F.broadcast(hill.select("n_tail"))).select(
        F.round(F.log("deg"), 9).alias("lx"),
        F.round(F.log(F.col("n_ge") * 1.0 / F.col("n_tail")), 9).alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    alpha = F.round(1.0 + F.col("n_tail") / F.col("slog").cast("double"), 4)
    return hill.crossJoin(F.broadcast(fit)).select(
        "n_tail",
        "xmin",
        alpha.alias("hill_alpha"),
        F.round(
            -(F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
            4,
        ).alias("ccdf_slope_alpha_minus_1"),
        alpha.between(1.5, 4.0).alias("plausible_powerlaw"),
    )


# --- round-12 session: classical-stats additions --------------------------------


def _lf_sql(e: str) -> str:
    """log-factorial LF(m) = ln(m!): exact CASE ladder for m <= 9, 3-term
    Stirling tail for m >= 10 (|err| < 1e-12 — far inside the 6-dp output
    rounding). Dialect-neutral: CASE/ln/power parse identically in Spark
    SQL and DuckDB, so BOTH engines evaluate the very same arithmetic."""
    stir = (
        f"((({e}) + 0.5) * ln({e}) - ({e}) + 0.9189385332046727"
        f" + 1.0/(12.0*({e})) - 1.0/(360.0*power(({e}), 3))"
        f" + 1.0/(1260.0*power(({e}), 5)))"
    )
    facts = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880]
    ladder = " ".join(f"WHEN ({e}) = {m} THEN ln({facts[m]}.0)" for m in range(10))
    return f"(CASE {ladder} ELSE {stir} END)"


def _fisher_lpmf(k: str) -> str:
    """ln hypergeometric pmf at ``k`` given frame columns r1,r2,c1,c2,n."""
    lf = _lf_sql
    return (
        f"({lf('r1')} + {lf('r2')} + {lf('c1')} + {lf('c2')} - {lf('n')}"
        f" - {lf(k)} - {lf(f'(r1 - ({k}))')} - {lf(f'(c1 - ({k}))')}"
        f" - {lf(f'(n - r1 - c1 + ({k}))')})"
    )


_FISHER_Q_GATE = 0.35  # quality threshold (corpus_dup_quality_association's)

_FISHER_CELLS_SQL = f"""cells AS (
         SELECT sum(CASE WHEN is_dup = 1 AND q_pass = 0 THEN 1 ELSE 0 END)
                  ::BIGINT AS a,
                sum(CASE WHEN is_dup = 1 AND q_pass = 1 THEN 1 ELSE 0 END)
                  ::BIGINT AS b,
                sum(CASE WHEN is_dup = 0 AND q_pass = 0 THEN 1 ELSE 0 END)
                  ::BIGINT AS c,
                sum(CASE WHEN is_dup = 0 AND q_pass = 1 THEN 1 ELSE 0 END)
                  ::BIGINT AS d
         FROM t),
       m AS (SELECT a, b, c, d,
                    a + b AS r1, c + d AS r2, a + c AS c1, b + d AS c2,
                    a + b + c + d AS n,
                    greatest(0, (a + b) + (a + c) - (a + b + c + d)) AS lo,
                    least(a + b, a + c) AS hi
             FROM cells)"""


@register(
    "stats_fisher_exact",
    f"""WITH f AS (
         SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                  x -> x <> ''))), ' ')) AS fp,
                {tx.quality_score_sql("text")} AS q
         FROM documents WHERE text IS NOT NULL),
       g AS (SELECT fp, count(*) AS nn FROM f GROUP BY fp),
       t AS (SELECT CASE WHEN g.nn > 1 THEN 1 ELSE 0 END AS is_dup,
                    CASE WHEN f.q >= {_FISHER_Q_GATE} THEN 1 ELSE 0 END
                      AS q_pass
             FROM f JOIN g USING (fp)),
       {_FISHER_CELLS_SQL},
       p AS (SELECT a, b, c, d,
                    list_sum(list_transform(range(lo, hi + 1),
                      kk -> CASE WHEN {_fisher_lpmf("kk")}
                                      <= {_fisher_lpmf("a")} + 1e-7
                                 THEN exp({_fisher_lpmf("kk")})
                                 ELSE 0.0 END)) AS pv
             FROM m)
       SELECT a, b, c, d,
              round((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 6)
                AS odds_ratio,
              round(pv, 6) AS p_two_sided,
              round(pv, 6) < 0.05 AS significant
       FROM p""",
    doc="Fisher's EXACT test on the duplication x quality 2x2 table "
    "(the corpus_dup_quality_association cells): two-sided p sums the "
    "hypergeometric pmf over every table at least as extreme as the "
    "observed one (pmf(k) <= pmf(a)*(1+1e-7), R's convention) — the "
    "small-cell-safe companion to that query's chi-square-style "
    "association, valid when a dedup slice leaves a near-empty cell "
    "the asymptotic test cannot handle. ln-factorials come from an "
    "exact <=9 ladder + 3-term Stirling tail evaluated as the SAME "
    "dialect-neutral arithmetic in both engines; the support sweep is "
    "a bounded sequential fold (support <= min(r1,c1)), not a window "
    "or join. Odds ratio is Haldane-corrected (+0.5 cells). Scale "
    "shape: one content-key rollup + re-join (the soft-dedup class), "
    "one 4-counter aggregate, then O(support) scalar arithmetic on a "
    "1-row frame.",
)
def q_stats_fisher_exact(spark: SparkSession, sf: str):
    f = (
        table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.array_sort(F.array_distinct(tx.tokens("text")))
                )
            ).alias("fp"),
            tx.quality_score("text").alias("q"),
        )
    )
    g = f.groupBy("fp").agg(F.count("*").alias("nn"))
    t = f.join(g, "fp").select(
        F.when(F.col("nn") > 1, 1).otherwise(0).alias("is_dup"),
        F.when(F.col("q") >= _FISHER_Q_GATE, 1).otherwise(0).alias("q_pass"),
    )
    cells = t.agg(
        F.sum(F.when((F.col("is_dup") == 1) & (F.col("q_pass") == 0), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("is_dup") == 1) & (F.col("q_pass") == 1), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("is_dup") == 0) & (F.col("q_pass") == 0), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("is_dup") == 0) & (F.col("q_pass") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    m = cells.select(
        "a",
        "b",
        "c",
        "d",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("c") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("c")).alias("c1"),
        (F.col("b") + F.col("d")).alias("c2"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("a") + F.col("b") + F.col("a") + F.col("c")
            - (F.col("a") + F.col("b") + F.col("c") + F.col("d")),
        ).alias("lo"),
        F.least(F.col("a") + F.col("b"), F.col("a") + F.col("c")).alias("hi"),
    )
    p = m.withColumn(
        "pv",
        F.expr(
            f"""aggregate(sequence(lo, hi), cast(0.0 as double),
              (acc, kk) -> acc + IF({_fisher_lpmf("kk")}
                                      <= {_fisher_lpmf("a")} + 1e-7,
                                    exp({_fisher_lpmf("kk")}),
                                    cast(0.0 as double)))"""
        ),
    )
    return p.select(
        "a",
        "b",
        "c",
        "d",
        F.round(
            (F.col("a") + 0.5) * (F.col("d") + 0.5)
            / ((F.col("b") + 0.5) * (F.col("c") + 0.5)),
            6,
        ).alias("odds_ratio"),
        F.round("pv", 6).alias("p_two_sided"),
        (F.round("pv", 6) < 0.05).alias("significant"),
    )


_TOST_MARGIN_CENTS = 500  # +-5.00 equivalence margin on the mean
_Z_ONE_SIDED_05 = 1.6448536269514722


@register(
    "stats_tost_equivalence",
    f"""WITH e AS (
         SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
                round(value * 100)::BIGINT AS cents
         FROM events WHERE event_type IN ('click', 'view')),
       s AS (SELECT sum(is_a)::BIGINT AS n1,
                    sum(1 - is_a)::BIGINT AS n2,
                    sum(CASE WHEN is_a = 1 THEN cents ELSE 0 END)::BIGINT AS s1a,
                    sum(CASE WHEN is_a = 0 THEN cents ELSE 0 END)::BIGINT AS s1b,
                    sum(CASE WHEN is_a = 1
                        THEN cents::DECIMAL(38,0) * cents ELSE 0 END)
                      ::DECIMAL(38,0) AS s2a,
                    sum(CASE WHEN is_a = 0
                        THEN cents::DECIMAL(38,0) * cents ELSE 0 END)
                      ::DECIMAL(38,0) AS s2b
             FROM e),
       k AS (SELECT n1, n2,
                    s1a * 1.0 / n1 - s1b * 1.0 / n2 AS diff,
                    sqrt((CAST(s2a AS DOUBLE) - s1a * (s1a * 1.0 / n1))
                           / (n1 - 1) / n1
                         + (CAST(s2b AS DOUBLE) - s1b * (s1b * 1.0 / n2))
                           / (n2 - 1) / n2) AS se
             FROM s)
       SELECT n1, n2,
              round(diff, 4) AS mean_diff_cents,
              round(se, 4) AS se_cents,
              round((diff + {_TOST_MARGIN_CENTS}) / se, 4) AS t_lower,
              round(({_TOST_MARGIN_CENTS} - diff) / se, 4) AS t_upper,
              least(round((diff + {_TOST_MARGIN_CENTS}) / se, 4),
                    round(({_TOST_MARGIN_CENTS} - diff) / se, 4))
                >= {_Z_ONE_SIDED_05!r} AS equivalent
       FROM k""",
    doc="TOST equivalence test (two one-sided tests) on click-vs-view "
    "mean value: unlike stats_welch_ttest, which can only FAIL to find "
    "a difference, TOST positively certifies |mu1 - mu2| < margin "
    "(+-500 cents) — the test an A/B pipeline needs to declare 'no "
    "meaningful change' (non-significance is not equivalence). Both "
    "one-sided Welch statistics (diff +- margin over the Welch SE) "
    "must clear the one-sided 5% normal critical value (z "
    "approximation — df is in the thousands here, where t and z "
    "coincide to 4 dp; documented). Moments accumulate as exact "
    "BIGINT/DECIMAL(38,0) sums; the flag gates on the ROUNDED "
    "statistics. Scale shape: one scan-fused 6-counter aggregate, "
    "scalar arithmetic on a 1-row frame.",
)
def q_stats_tost_equivalence(spark: SparkSession, sf: str):
    e = (
        events_table(spark, sf)
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    dd = F.col("cents").cast("decimal(38,0)")
    s = e.agg(
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n2"),
        F.sum(F.when(F.col("is_a") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1a"),
        F.sum(F.when(F.col("is_a") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1b"),
        F.sum(F.when(F.col("is_a") == 1, dd * F.col("cents")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s2a"),
        F.sum(F.when(F.col("is_a") == 0, dd * F.col("cents")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s2b"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    diff = F.col("s1a") * 1.0 / n1 - F.col("s1b") * 1.0 / n2
    se = F.sqrt(
        (F.col("s2a").cast("double") - F.col("s1a") * (F.col("s1a") * 1.0 / n1))
        / (n1 - 1)
        / n1
        + (F.col("s2b").cast("double") - F.col("s1b") * (F.col("s1b") * 1.0 / n2))
        / (n2 - 1)
        / n2
    )
    t_lo = F.round((diff + _TOST_MARGIN_CENTS) / se, 4)
    t_up = F.round((_TOST_MARGIN_CENTS - diff) / se, 4)
    return s.select(
        "n1",
        "n2",
        F.round(diff, 4).alias("mean_diff_cents"),
        F.round(se, 4).alias("se_cents"),
        t_lo.alias("t_lower"),
        t_up.alias("t_upper"),
        (F.least(t_lo, t_up) >= F.lit(_Z_ONE_SIDED_05)).alias("equivalent"),
    )


@register(
    "stats_partial_correlation",
    """WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type, round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      ::BIGINT AS x,
                    sum(CASE WHEN event_type = 'purchase'
                        THEN cents ELSE 0 END)::BIGINT AS y,
                    count(*)::BIGINT AS z
             FROM e GROUP BY day),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                    sum(z)::BIGINT AS sz,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxx,
                    sum(y::DECIMAL(38,0) * y)::DECIMAL(38,0) AS syy,
                    sum(z::DECIMAL(38,0) * z)::DECIMAL(38,0) AS szz,
                    sum(x::DECIMAL(38,0) * y)::DECIMAL(38,0) AS sxy,
                    sum(x::DECIMAL(38,0) * z)::DECIMAL(38,0) AS sxz,
                    sum(y::DECIMAL(38,0) * z)::DECIMAL(38,0) AS syz
             FROM d),
       r AS (SELECT n,
                    CAST(n * sxy - sx::DECIMAL(38,0) * sy AS DOUBLE)
                      / sqrt(CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                             * CAST(n * syy - sy::DECIMAL(38,0) * sy AS DOUBLE))
                      AS rxy,
                    CAST(n * sxz - sx::DECIMAL(38,0) * sz AS DOUBLE)
                      / sqrt(CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                             * CAST(n * szz - sz::DECIMAL(38,0) * sz AS DOUBLE))
                      AS rxz,
                    CAST(n * syz - sy::DECIMAL(38,0) * sz AS DOUBLE)
                      / sqrt(CAST(n * syy - sy::DECIMAL(38,0) * sy AS DOUBLE)
                             * CAST(n * szz - sz::DECIMAL(38,0) * sz AS DOUBLE))
                      AS ryz
             FROM s)
       SELECT n AS n_days,
              round(rxy, 6) AS r_xy,
              round(rxz, 6) AS r_xz,
              round(ryz, 6) AS r_yz,
              round((rxy - rxz * ryz)
                    / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
                AS partial_r_xy_given_z
       FROM r""",
    doc="First-order PARTIAL correlation of daily click count and daily "
    "purchase revenue CONTROLLING for total daily traffic: r_xy.z = "
    "(r_xy - r_xz*r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)). The raw click-"
    "revenue correlation is confounded by overall volume (busy days "
    "have more of everything); partialling out z answers whether "
    "clicks co-move with revenue BEYOND the shared traffic driver — "
    "the spurious-correlation screen stats_spearman_corr (raw "
    "monotone association) cannot provide. All three Pearson r's "
    "come from one pass of exact BIGINT/DECIMAL(38,0) power sums "
    "over the date-domain daily rollup; one rounded output each. "
    "Scale shape: one map-side-combinable daily aggregate, one "
    "9-sum aggregate over the ~30-row day frame, scalar math.",
)
def q_stats_partial_correlation(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("y"),
        F.count("*").cast("long").alias("z"),
    )

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(dec("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(dec("z") * F.col("z")).cast("decimal(38,0)").alias("szz"),
        F.sum(dec("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x") * F.col("z")).cast("decimal(38,0)").alias("sxz"),
        F.sum(dec("y") * F.col("z")).cast("decimal(38,0)").alias("syz"),
    )
    n = F.col("n")

    def pearson(spq, sp, sq, spp, sqq):
        num = (n * F.col(spq) - dec(sp) * F.col(sq)).cast("double")
        den = F.sqrt(
            (n * F.col(spp) - dec(sp) * F.col(sp)).cast("double")
            * (n * F.col(sqq) - dec(sq) * F.col(sq)).cast("double")
        )
        return num / den

    r = s.select(
        n.alias("n_days"),
        pearson("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        pearson("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        pearson("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        "n_days",
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (1 - F.col("rxz") * F.col("rxz"))
                * (1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("partial_r_xy_given_z"),
    )


_BP_CHI2_CRIT_1DF = 3.8415  # chi-square(1) 0.95


@register(
    "stats_breusch_pagan",
    f"""WITH {DAILY_CENTS_CTE},
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(day)::BIGINT AS sx, sum(x)::BIGINT AS sy,
                    sum(day::DECIMAL(38,0) * day)::DECIMAL(38,0) AS sxx,
                    sum(day::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxy
             FROM d),
       fit AS (SELECT n, sx, sy, sxx,
                      CAST(n * sxy - sx::DECIMAL(38,0) * sy AS DOUBLE)
                        / CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                        AS beta
               FROM s),
       res AS (SELECT d.day, fit.n, fit.sx, fit.sxx,
                      power(d.x - ((fit.sy - fit.beta * fit.sx) / fit.n
                                   + fit.beta * d.day), 2) AS g
               FROM d, fit),
       aux AS (SELECT max(n) AS n,
                      sum(day * g) AS sxg, sum(g) AS sg, sum(g * g) AS sgg,
                      max(sx) AS sx, max(sxx) AS sxx
               FROM res)
       SELECT n AS n_days,
              round(n * power(
                  (n * sxg - sx * sg)
                  / sqrt(CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                         * (n * sgg - sg * sg)), 2), 4) AS lm_stat,
              round(n * power(
                  (n * sxg - sx * sg)
                  / sqrt(CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                         * (n * sgg - sg * sg)), 2), 4)
                >= {_BP_CHI2_CRIT_1DF!r} AS heteroscedastic
       FROM aux""",
    doc="Breusch-Pagan heteroscedasticity test on the daily-revenue "
    "trend regression (the timeseries_linear_trend fit): regress "
    "squared residuals on the day regressor; LM = n * R-squared of "
    "that auxiliary fit against chi-square(1). Heteroscedastic "
    "residuals invalidate the OLS standard errors every trend/forecast "
    "query quotes — this is the diagnostic that says whether those "
    "intervals can be trusted, complementing stats_durbin_watson "
    "(autocorrelation) on the same fit. beta comes from exact "
    "DECIMAL(38,0) power sums; residuals are evaluated per day-row "
    "from that closed form; the auxiliary sums run over the ~30-row "
    "date-domain frame. Scale shape: one daily rollup, one 5-sum "
    "aggregate, a broadcast 1-row fit joined back, one 5-sum "
    "aggregate over days, scalar math.",
)
def q_stats_breusch_pagan(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("x").cast("long").alias("sy"),
        F.sum(dd("day") * F.col("day")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dd("day") * F.col("x")).cast("decimal(38,0)").alias("sxy"),
    )
    fit = s.select(
        "n",
        "sx",
        "sy",
        "sxx",
        (
            (F.col("n") * F.col("sxy") - dd("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - dd("sx") * F.col("sx")).cast("double")
        ).alias("beta"),
    )
    res = d.crossJoin(F.broadcast(fit)).select(
        "day",
        "n",
        "sx",
        "sxx",
        F.pow(
            F.col("x")
            - (
                (F.col("sy") - F.col("beta") * F.col("sx")) / F.col("n")
                + F.col("beta") * F.col("day")
            ),
            2,
        ).alias("g"),
    )
    aux = res.agg(
        F.max("n").alias("n"),
        F.sum(F.col("day") * F.col("g")).alias("sxg"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
        F.max("sx").alias("sx"),
        F.max("sxx").alias("sxx"),
    )
    n = F.col("n")
    r_aux = (n * F.col("sxg") - F.col("sx") * F.col("sg")) / F.sqrt(
        (n * F.col("sxx") - dd("sx") * F.col("sx")).cast("double")
        * (n * F.col("sgg") - F.col("sg") * F.col("sg"))
    )
    lm = F.round(n * F.pow(r_aux, 2), 4)
    return aux.select(
        n.alias("n_days"),
        lm.alias("lm_stat"),
        (lm >= F.lit(_BP_CHI2_CRIT_1DF)).alias("heteroscedastic"),
    )


def _norm_tail_sql(x: str) -> str:
    """Upper-tail normal probability Q(x) = 1 - Phi(x) for x >= 0 via the
    Abramowitz-Stegun 26.2.17 five-term polynomial (|err| < 7.5e-8),
    written as dialect-neutral SQL so Spark and DuckDB evaluate the SAME
    arithmetic. Always strictly positive — safe under ln() even deep in
    the tail, unlike computing 1 - Phi(x) by subtraction."""
    t = f"(1.0/(1.0 + 0.2316419*({x})))"
    poly = (
        f"({t}*(0.319381530 + {t}*(-0.356563782 + {t}*(1.781477937"
        f" + {t}*(-1.821255978 + {t}*1.330274429)))))"
    )
    return f"(0.3989422804014327 * exp(-(({x})*({x}))/2.0) * {poly})"


def _ln_phi_sql(z: str) -> str:
    """ln Phi(z), tail-safe: the z<0 branch goes through the always-
    positive Q(-z) rather than 1 - (1 - tiny)."""
    return (
        f"(CASE WHEN ({z}) >= 0 THEN ln(1.0 - {_norm_tail_sql(z)})"
        f" ELSE ln({_norm_tail_sql(f'(-({z}))')}) END)"
    )


def _ln_phi_tail_sql(z: str) -> str:
    """ln(1 - Phi(z)), tail-safe on the z>0 side."""
    return (
        f"(CASE WHEN ({z}) >= 0 THEN ln({_norm_tail_sql(z)})"
        f" ELSE ln(1.0 - {_norm_tail_sql(f'(-({z}))')}) END)"
    )


_AD_CRIT_5PCT = 0.752  # case-3 (estimated mu, sigma) 5% critical value


@register(
    "stats_anderson_darling",
    f"""WITH c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS v
         FROM orders),
       pv AS (SELECT grp, v, count(*)::BIGINT AS k FROM c GROUP BY grp, v),
       cum AS (SELECT grp, v, k,
                      sum(k) OVER (PARTITION BY grp ORDER BY v
                                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cc
               FROM pv),
       m AS (SELECT grp, count(*)::BIGINT AS n, sum(v)::BIGINT AS s1,
                    sum(v::DECIMAL(38,0) * v)::DECIMAL(38,0) AS s2
             FROM c GROUP BY grp),
       zt AS (SELECT cum.grp, cum.k, cum.cc, m.n,
                     (cum.v - m.s1 * 1.0 / m.n)
                       / sqrt((CAST(m.s2 AS DOUBLE)
                               - m.s1 * (m.s1 * 1.0 / m.n)) / (m.n - 1))
                       AS z
              FROM cum JOIN m USING (grp)),
       terms AS (SELECT grp, n,
                        (k * (2*(cc - k) + k)) * {_ln_phi_sql("z")}
                        + (k * (2*n - 2*(cc - k) - k)) * {_ln_phi_tail_sql("z")}
                          AS term
                 FROM zt),
       a2 AS (SELECT grp, max(n) AS n,
                     -max(n) - sum(term) / max(n) AS a2
              FROM terms GROUP BY grp)
       SELECT grp, n,
              round(a2, 4) AS a2_stat,
              round(a2 * (1.0 + 0.75/n + 2.25/(n*n)), 4) AS a2_star,
              round(a2 * (1.0 + 0.75/n + 2.25/(n*n)), 4)
                >= {_AD_CRIT_5PCT!r} AS normal_rejected
       FROM a2""",
    doc="Anderson-Darling normality test per order-priority group: the "
    "EDF-based A-squared statistic with estimated (mu, sigma) — the "
    "tail-weighted companion to stats_jarque_bera's moment screen on "
    "the same groups (AD detects tail departures JB's skew/kurtosis "
    "summary can miss; flag vs the case-3 5% critical value 0.752 "
    "after the small-sample factor). The (2i-1) rank weights collapse "
    "per DISTINCT value with tie blocks: a block of k values after "
    "cp predecessors contributes integer weights k(2cp+k) to "
    "ln Phi(z) and k(2n-2cp-k) to ln(1-Phi(z)). Phi uses the A-S "
    "26.2.17 tail polynomial evaluated as the SAME dialect-neutral "
    "arithmetic in both engines, through the always-positive tail "
    "form (ln-safe at z = +-6). Moments come from exact BIGINT/"
    "DECIMAL(38,0) sums. Scale shape: per-group distinct-value frame "
    "(value-domain bounded), GROUP-PARTITIONED cumulative window, one "
    "5-group rollup; no unpartitioned window, no join bigger than the "
    "5-row moment table.",
)
def q_stats_anderson_darling(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    pv = c.groupBy("grp", "v").agg(F.count("*").cast("long").alias("k"))
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.withColumn("cc", F.sum("k").over(w).cast("long"))
    m = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    zt = cum.join(F.broadcast(m), "grp").select(
        "grp",
        "k",
        "cc",
        "n",
        (
            (F.col("v") - F.col("s1") * 1.0 / F.col("n"))
            / F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1") * (F.col("s1") * 1.0 / F.col("n"))
                )
                / (F.col("n") - 1)
            )
        ).alias("z"),
    )
    terms = zt.select(
        "grp",
        "n",
        (
            (F.col("k") * (2 * (F.col("cc") - F.col("k")) + F.col("k")))
            * F.expr(_ln_phi_sql("z"))
            + (
                F.col("k")
                * (2 * F.col("n") - 2 * (F.col("cc") - F.col("k")) - F.col("k"))
            )
            * F.expr(_ln_phi_tail_sql("z"))
        ).alias("term"),
    )
    a2f = terms.groupBy("grp").agg(
        F.max("n").alias("n"),
        (-F.max("n") - F.sum("term") / F.max("n")).alias("a2"),
    )
    star = F.round(
        F.col("a2")
        * (1.0 + 0.75 / F.col("n") + 2.25 / (F.col("n") * F.col("n"))),
        4,
    )
    return a2f.select(
        "grp",
        "n",
        F.round("a2", 4).alias("a2_stat"),
        star.alias("a2_star"),
        (star >= F.lit(_AD_CRIT_5PCT)).alias("normal_rejected"),
    )


@register(
    "stats_cooks_distance",
    f"""WITH {DAILY_CENTS_CTE},
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(day)::BIGINT AS sx, sum(x)::BIGINT AS sy,
                    sum(day::DECIMAL(38,0) * day)::DECIMAL(38,0) AS sxx,
                    sum(day::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxy,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS syy
             FROM d),
       fit AS (SELECT n, sx, sy,
                      CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE) AS sxx_n,
                      CAST(n * sxy - sx::DECIMAL(38,0) * sy AS DOUBLE)
                        / CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                        AS beta,
                      (CAST(n * syy - sy::DECIMAL(38,0) * sy AS DOUBLE)
                       - power(CAST(n * sxy - sx::DECIMAL(38,0) * sy
                                    AS DOUBLE), 2)
                         / CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE))
                        / n AS sse
               FROM s),
       rows_ AS (SELECT d.day, fit.n,
                        d.x - ((fit.sy - fit.beta * fit.sx) / fit.n
                               + fit.beta * d.day) AS e,
                        1.0 / fit.n
                        + power(d.day - fit.sx * 1.0 / fit.n, 2)
                          / (fit.sxx_n / fit.n) AS h,
                        fit.sse / (fit.n - 2) AS s2
                 FROM d, fit)
       SELECT day,
              round(e, 4) AS residual_cents,
              round(h, 6) AS leverage,
              round(e * e / (2.0 * s2) * h / power(1.0 - h, 2), 6) AS cooks_d,
              round(e * e / (2.0 * s2) * h / power(1.0 - h, 2), 6)
                > 4.0 / n AS influential
       FROM rows_""",
    doc="Cook's distance for every point of the daily-revenue trend "
    "regression: D_i = e_i^2/(p*s^2) * h_i/(1-h_i)^2 with p = 2 and "
    "leverage h_i = 1/n + (x_i - xbar)^2/Sxx — WHICH days single-"
    "handedly steer the fitted trend (flag: D > 4/n). The per-point "
    "influence diagnostic that complements stats_breusch_pagan "
    "(variance shape) and stats_durbin_watson (autocorrelation) on "
    "the same fit: a flagged day is a candidate data incident, not a "
    "trend. beta/SSE come in closed form from exact DECIMAL(38,0) "
    "power sums (SSE = (Syy - beta*Sxy)/n — no per-row residual "
    "re-aggregation), so every output is one deterministic double "
    "expression per day row. Scale shape: one daily rollup, one 6-sum "
    "aggregate, a broadcast 1-row fit joined back over the ~30-row "
    "date-domain frame.",
)
def q_stats_cooks_distance(spark: SparkSession, sf: str):
    from annotations_ingester_spark.plans.catalog import daily_cents

    d = daily_cents(spark, sf)
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("x").cast("long").alias("sy"),
        F.sum(dd("day") * F.col("day")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dd("day") * F.col("x")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dd("x") * F.col("x")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    sxx_n = (n * F.col("sxx") - dd("sx") * F.col("sx")).cast("double")
    sxy_n = (n * F.col("sxy") - dd("sx") * F.col("sy")).cast("double")
    syy_n = (n * F.col("syy") - dd("sy") * F.col("sy")).cast("double")
    fit = s.select(
        "n",
        "sx",
        "sy",
        sxx_n.alias("sxx_n"),
        (sxy_n / sxx_n).alias("beta"),
        ((syy_n - F.pow(sxy_n, 2) / sxx_n) / n).alias("sse"),
    )
    rows = d.crossJoin(F.broadcast(fit)).select(
        "day",
        "n",
        (
            F.col("x")
            - (
                (F.col("sy") - F.col("beta") * F.col("sx")) / F.col("n")
                + F.col("beta") * F.col("day")
            )
        ).alias("e"),
        (
            1.0 / F.col("n")
            + F.pow(F.col("day") - F.col("sx") * 1.0 / F.col("n"), 2)
            / (F.col("sxx_n") / F.col("n"))
        ).alias("h"),
        (F.col("sse") / (F.col("n") - 2)).alias("s2"),
    )
    cooks = F.round(
        F.col("e") * F.col("e") / (2.0 * F.col("s2"))
        * F.col("h") / F.pow(1.0 - F.col("h"), 2),
        6,
    )
    return rows.select(
        "day",
        F.round("e", 4).alias("residual_cents"),
        F.round("h", 6).alias("leverage"),
        cooks.alias("cooks_d"),
        (cooks > 4.0 / F.col("n")).alias("influential"),
    )


_DUNN_GROUPS = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_DUNN_Z_BONF = 2.807  # two-sided 0.05 Bonferroni-corrected over 10 pairs


def _dunn_pv_sql() -> str:
    ks = ",\n                    ".join(
        f"sum(CASE WHEN grp = '{g}' THEN 1 ELSE 0 END)::BIGINT AS k{i + 1}"
        for i, g in enumerate(_DUNN_GROUPS)
    )
    return f"""c AS (
         SELECT o_orderpriority AS grp,
                round(o_totalprice * 100)::BIGINT AS v
         FROM orders),
       pv AS (SELECT v, {ks},
                    count(*)::BIGINT AS kt
             FROM c GROUP BY v),
       cum AS (SELECT v, k1, k2, k3, k4, k5, kt,
                      sum(kt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                        ::BIGINT - kt AS cp
               FROM pv)"""


@register(
    "stats_dunn_posthoc",
    f"""WITH {_dunn_pv_sql()},
       agg AS (SELECT
                 {", ".join(f"sum(k{i + 1})::BIGINT AS n{i + 1}, "
                            f"sum(k{i + 1} * (2*cp + kt + 1))::BIGINT AS r{i + 1}"
                            for i in range(5))},
                 sum(kt)::BIGINT AS big_n,
                 sum(kt * kt * kt - kt)::BIGINT AS ties
               FROM cum),
       g AS ({" UNION ALL ".join(
                 f"SELECT '{g}' AS grp, n{i + 1} AS n, r{i + 1} AS r2, "
                 f"big_n, ties FROM agg"
                 for i, g in enumerate(_DUNN_GROUPS))}),
       pairs AS (
         SELECT a.grp AS group_a, b.grp AS group_b,
                a.n AS n_a, b.n AS n_b,
                a.r2 * 0.5 / a.n AS mr_a, b.r2 * 0.5 / b.n AS mr_b,
                a.big_n AS big_n, a.ties AS ties
         FROM g a JOIN g b ON a.grp < b.grp)
       SELECT group_a, group_b, n_a, n_b,
              round(mr_a, 4) AS mean_rank_a,
              round(mr_b, 4) AS mean_rank_b,
              round(abs(mr_a - mr_b)
                    / sqrt((big_n * (big_n + 1.0) / 12.0
                            - ties / (12.0 * (big_n - 1.0)))
                           * (1.0/n_a + 1.0/n_b)), 4) AS z_stat,
              round(abs(mr_a - mr_b)
                    / sqrt((big_n * (big_n + 1.0) / 12.0
                            - ties / (12.0 * (big_n - 1.0)))
                           * (1.0/n_a + 1.0/n_b)), 4)
                >= {_DUNN_Z_BONF!r} AS significant
       FROM pairs""",
    doc="Dunn's post-hoc test for every order-priority pair — the step "
    "AFTER stats_kruskal_wallis rejects: WHICH groups differ. Pairwise "
    "z on tie-corrected mean ranks, Bonferroni-gated at the 10-"
    "comparison two-sided 5% critical value (2.807), using the pooled "
    "KW variance N(N+1)/12 - sum(t^3-t)/(12(N-1)). Doubled rank sums "
    "k_g*(2cp + kt + 1) stay exact BIGINTs over the distinct-value "
    "frame (the kruskal/mood two-level prefix class: in-bucket "
    "windows are bucket-partitioned; the only unpartitioned window "
    "runs over the ~dozen-row bucket-count table). The 5x5 pair fan "
    "is a broadcast of the FIVE-row per-group aggregate — never a "
    "data-sized cross. Scale shape: one distinct-value rollup, one "
    "bounded prefix sum, one 12-sum aggregate, a 10-row pair fan.",
)
def q_stats_dunn_posthoc(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    c = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    pv = (
        c.groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("grp") == g, 1).otherwise(0))
                .cast("long")
                .alias(f"k{i + 1}")
                for i, g in enumerate(_DUNN_GROUPS)
            ],
            F.count("*").cast("long").alias("kt"),
        )
        .withColumn("_bucket", F.floor(F.col("v") / 1048576).cast("long"))
        .transform(ckpt)
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = pv.withColumn("_ct", F.sum("kt").over(w_in))
    counts = pv.groupBy("_bucket").agg(F.sum("kt").alias("_bt"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).cast("long").alias("_off"),
    )
    cum = ranked.join(F.broadcast(offsets), "_bucket").withColumn(
        "cp", (F.col("_off") + F.col("_ct") - F.col("kt")).cast("long")
    )
    agg = cum.agg(
        *[
            x
            for i in range(5)
            for x in (
                F.sum(f"k{i + 1}").cast("long").alias(f"n{i + 1}"),
                F.sum(
                    F.col(f"k{i + 1}")
                    * (2 * F.col("cp") + F.col("kt") + 1)
                )
                .cast("long")
                .alias(f"r{i + 1}"),
            )
        ],
        F.sum("kt").cast("long").alias("big_n"),
        F.sum(F.col("kt") * F.col("kt") * F.col("kt") - F.col("kt"))
        .cast("long")
        .alias("ties"),
    )
    stack_args = ", ".join(
        f"'{g}', n{i + 1}, r{i + 1}" for i, g in enumerate(_DUNN_GROUPS)
    )
    g = agg.select(
        "big_n",
        "ties",
        F.expr(f"stack(5, {stack_args}) AS (grp, n, r2)"),
    )
    a = g.select(
        F.col("grp").alias("group_a"),
        F.col("n").alias("n_a"),
        (F.col("r2") * 0.5 / F.col("n")).alias("mr_a"),
        "big_n",
        "ties",
    )
    b = g.select(
        F.col("grp").alias("group_b"),
        F.col("n").alias("n_b"),
        (F.col("r2") * 0.5 / F.col("n")).alias("mr_b"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("group_a") < F.col("group_b"))
    z = F.round(
        F.abs(F.col("mr_a") - F.col("mr_b"))
        / F.sqrt(
            (
                F.col("big_n") * (F.col("big_n") + 1.0) / 12.0
                - F.col("ties") / (12.0 * (F.col("big_n") - 1.0))
            )
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
        4,
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round("mr_a", 4).alias("mean_rank_a"),
        F.round("mr_b", 4).alias("mean_rank_b"),
        z.alias("z_stat"),
        (z >= F.lit(_DUNN_Z_BONF)).alias("significant"),
    )


@register(
    "stats_ansari_bradley",
    f"""WITH {_cdf_oracle_cte(_KS_SRC)},
       t AS (SELECT max(c1)::BIGINT AS n1, max(c2)::BIGINT AS n2 FROM cdf),
       blocks AS (
         SELECT k1, k2, (k1 + k2) AS kt,
                (c1 + c2) - (k1 + k2) + 1 AS a,
                (c1 + c2) AS b,
                t.n1 + t.n2 AS big_n,
                (t.n1 + t.n2 + 1) // 2 AS m1,
                t.n1, t.n2
         FROM cdf, t),
       scored AS (
         SELECT k1, k2, kt, n1, n2, big_n,
                CASE WHEN b <= m1 THEN (a + b) * (b - a + 1)
                     WHEN a > m1 THEN 2*(big_n + 1)*(b - a + 1)
                                      - (a + b)*(b - a + 1)
                     ELSE (a + m1)*(m1 - a + 1)
                          + 2*(big_n + 1)*(b - m1) - (m1 + 1 + b)*(b - m1)
                END AS s2x
         FROM blocks),
       stat AS (
         SELECT max(n1) AS n1, max(n2) AS n2, max(big_n) AS big_n,
                sum(k1 * s2x * 1.0 / kt) / 2.0 AS t1,
                sum(s2x)::BIGINT AS s_tot2,
                sum(s2x * 1.0 * s2x / kt) / 4.0 AS ssq
         FROM scored)
       SELECT n1, n2,
              round(t1, 4) AS ab_statistic,
              round((t1 - n1 * (s_tot2 * 0.5 / big_n))
                    / sqrt(n1 * 1.0 * n2
                           * (big_n * ssq - power(s_tot2 * 0.5, 2))
                           / (big_n * 1.0 * big_n * (big_n - 1))), 4) AS z_stat,
              abs(round((t1 - n1 * (s_tot2 * 0.5 / big_n))
                    / sqrt(n1 * 1.0 * n2
                           * (big_n * ssq - power(s_tot2 * 0.5, 2))
                           / (big_n * 1.0 * big_n * (big_n - 1))), 4))
                >= 1.96 AS scale_differs
       FROM stat""",
    doc="Ansari-Bradley scale test on click vs purchase values: ranks "
    "fold from both ends (score = min(rank, N+1-rank)), so the "
    "statistic is sensitive to DISPERSION differences with equal "
    "medians — the rank companion to stats_brown_forsythe's "
    "deviation-ANOVA. Tie-robust by construction: per tie block the "
    "doubled score SUM has an exact integer closed form (the block "
    "either sits below the fold, above it, or splits at m1 = "
    "floor((N+1)/2)), and the null moments are the FINITE-POPULATION "
    "moments of the actual midscore multiset — correct under heavy "
    "cent-level ties where the textbook no-tie variance is wrong. "
    "z-flag at two-sided 5%. Reuses the shared _two_sample_cdf "
    "distinct-value frame (value-domain bounded, two-level prefix "
    "sum). Scale shape: identical to stats_ks_test.",
)
def q_stats_ansari_bradley(spark: SparkSession, sf: str):
    ev = events_table(spark, sf)
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    cdf = _two_sample_cdf(s)
    t = cdf.agg(
        F.max("c1").cast("long").alias("n1"), F.max("c2").cast("long").alias("n2")
    )
    blocks = cdf.crossJoin(F.broadcast(t)).select(
        "k1",
        "k2",
        (F.col("k1") + F.col("k2")).alias("kt"),
        (F.col("c1") + F.col("c2") - (F.col("k1") + F.col("k2")) + 1).alias("a"),
        (F.col("c1") + F.col("c2")).alias("b"),
        (F.col("n1") + F.col("n2")).alias("big_n"),
        ((F.col("n1") + F.col("n2") + 1) / 2).cast("long").alias("m1"),
        "n1",
        "n2",
    )
    s2x = (
        F.when(
            F.col("b") <= F.col("m1"),
            (F.col("a") + F.col("b")) * (F.col("b") - F.col("a") + 1),
        )
        .when(
            F.col("a") > F.col("m1"),
            2 * (F.col("big_n") + 1) * (F.col("b") - F.col("a") + 1)
            - (F.col("a") + F.col("b")) * (F.col("b") - F.col("a") + 1),
        )
        .otherwise(
            (F.col("a") + F.col("m1")) * (F.col("m1") - F.col("a") + 1)
            + 2 * (F.col("big_n") + 1) * (F.col("b") - F.col("m1"))
            - (F.col("m1") + 1 + F.col("b")) * (F.col("b") - F.col("m1"))
        )
    )
    scored = blocks.select(
        "k1", "k2", "kt", "n1", "n2", "big_n", s2x.alias("s2x")
    )
    stat = scored.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("big_n").alias("big_n"),
        (F.sum(F.col("k1") * F.col("s2x") * 1.0 / F.col("kt")) / 2.0).alias("t1"),
        F.sum("s2x").cast("long").alias("s_tot2"),
        (F.sum(F.col("s2x") * 1.0 * F.col("s2x") / F.col("kt")) / 4.0).alias(
            "ssq"
        ),
    )
    n1, n2, big_n = F.col("n1"), F.col("n2"), F.col("big_n")
    z = F.round(
        (F.col("t1") - n1 * (F.col("s_tot2") * 0.5 / big_n))
        / F.sqrt(
            n1
            * 1.0
            * n2
            * (big_n * F.col("ssq") - F.pow(F.col("s_tot2") * 0.5, 2))
            / (big_n * 1.0 * big_n * (big_n - 1))
        ),
        4,
    )
    return stat.select(
        "n1",
        "n2",
        F.round("t1", 4).alias("ab_statistic"),
        z.alias("z_stat"),
        (F.abs(z) >= 1.96).alias("scale_differs"),
    )
