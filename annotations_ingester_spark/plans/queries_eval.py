"""Round-6 evaluation-metrics family: the engine measures the quality of
its OWN tiers as queries — language-ID confusion/precision/recall against
the labeled corpus, LSH candidate precision/recall against the exact
set-similarity join, and NDCG@10 of bucketed ANN against the brute-force
cosine ground truth.

These are the queries a training-data team runs to tune thresholds
(bands, bits, τ) before a 100 TB pass: each one joins a cheap approximate
tier to its exact counterpart and reduces to a handful of metric rows.
Oracles compose the already-certified queries' SQL as subqueries, so both
engines score identical inputs; metric arithmetic follows the catalog
rounding discipline (exact counts → one rounding point per output).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from annotations_ingester_spark.functions.vectors import sign_bucket_sql
from annotations_ingester_spark.plans.catalog import (
    ckpt,
    REGISTRY,
    events_table,
    register,
    run_concurrently,
    table,
)

# fixed IDCG@10 for binary-graded gains rel(i) = 11 - i, i = 1..10 —
# Σ (11-i)/log2(i+1); one shared literal on both engines
IDCG_10 = 29.966109248940597

# the SAME bucket function the certified ann_bucketed_topk oracle uses
_SB = sign_bucket_sql("e", 8)


def _oracle(name: str) -> str:
    return REGISTRY[name].oracle


@register(
    "eval_langid_confusion",
    f"""WITH pred AS (SELECT * FROM ({_oracle('text_lang_id')}) t),
       cm AS (
         SELECT labeled_lang, predicted_lang, count(*)::DOUBLE AS n
         FROM pred GROUP BY labeled_lang, predicted_lang),
       lbl AS (SELECT labeled_lang AS lang, sum(n) AS n_label FROM cm
               GROUP BY labeled_lang),
       prd AS (SELECT predicted_lang AS lang, sum(n) AS n_pred FROM cm
               GROUP BY predicted_lang),
       tp AS (SELECT labeled_lang AS lang, n AS tp FROM cm
              WHERE labeled_lang = predicted_lang)
       SELECT l.lang, l.n_label::BIGINT AS support,
              coalesce(t.tp, 0)::BIGINT AS tp,
              round(CASE WHEN coalesce(p.n_pred, 0) = 0 THEN 0
                         ELSE coalesce(t.tp, 0) / p.n_pred END, 6) AS precision,
              round(coalesce(t.tp, 0) / l.n_label, 6) AS recall,
              round(CASE WHEN coalesce(t.tp, 0) = 0 THEN 0
                         ELSE 2 * (coalesce(t.tp, 0) / p.n_pred)
                              * (coalesce(t.tp, 0) / l.n_label)
                              / ((coalesce(t.tp, 0) / p.n_pred)
                                 + (coalesce(t.tp, 0) / l.n_label)) END, 6) AS f1
       FROM lbl l
       LEFT JOIN prd p ON p.lang = l.lang
       LEFT JOIN tp t ON t.lang = l.lang""",
    doc="Per-class precision/recall/F1 of the stopword language-ID "
    "heuristic against the labeled corpus — the evaluation query that "
    "gates a heuristic before it filters 100 TB. The confusion matrix is "
    "categories², so everything after the one data scan (the certified "
    "text_lang_id projection) is aggregates of a tiny frame. F1 uses the "
    "unrounded exact-count ratios identically on both engines.",
)
def q_langid_confusion(spark: SparkSession, sf: str):
    pred = REGISTRY["text_lang_id"].spark(spark, sf)
    cm = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count("*").cast("double").alias("n")
    )
    lbl = cm.groupBy(F.col("labeled_lang").alias("lang")).agg(
        F.sum("n").alias("n_label")
    )
    prd = cm.groupBy(F.col("predicted_lang").alias("lang")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = cm.filter(F.col("labeled_lang") == F.col("predicted_lang")).select(
        F.col("labeled_lang").alias("lang"), F.col("n").alias("tp")
    )
    j = (
        lbl.join(F.broadcast(prd), "lang", "left")
        .join(F.broadcast(tp), "lang", "left")
    )
    tpc = F.coalesce(F.col("tp"), F.lit(0.0))
    p = tpc / F.col("n_pred")
    r = tpc / F.col("n_label")
    return j.select(
        "lang",
        F.col("n_label").cast("long").alias("support"),
        tpc.cast("long").alias("tp"),
        F.round(
            F.when(F.coalesce(F.col("n_pred"), F.lit(0.0)) == 0, F.lit(0.0)).otherwise(p),
            6,
        ).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(
            F.when(tpc == 0, F.lit(0.0)).otherwise(2 * p * r / (p + r)), 6
        ).alias("f1"),
    )


@register(
    "eval_lsh_precision_recall",
    f"""WITH truth AS (
         SELECT doc_a, doc_b FROM ({_oracle('ssjoin_jaccard_prefix')}) t),
       pred AS (
         SELECT doc_a, doc_b FROM ({_oracle('minhash_lsh_pairs')}) p),
       tp AS (
         SELECT count(*)::DOUBLE AS n_tp
         FROM truth JOIN pred USING (doc_a, doc_b)),
       nt AS (SELECT count(*)::DOUBLE AS n_truth FROM truth),
       np AS (SELECT count(*)::DOUBLE AS n_pred FROM pred)
       SELECT n_truth::BIGINT AS n_truth, n_pred::BIGINT AS n_pred,
              n_tp::BIGINT AS n_tp,
              round(CASE WHEN n_pred = 0 THEN 0 ELSE n_tp / n_pred END, 6)
                AS precision,
              round(CASE WHEN n_truth = 0 THEN 0 ELSE n_tp / n_truth END, 6)
                AS recall,
              round(CASE WHEN n_tp = 0 THEN 0
                         ELSE 2 * (n_tp / n_pred) * (n_tp / n_truth)
                              / ((n_tp / n_pred) + (n_tp / n_truth)) END, 6) AS f1
       FROM tp CROSS JOIN nt CROSS JOIN np""",
    doc="Precision/recall of the MinHash-LSH candidate tier against the "
    "EXACT Jaccard ≥ 0.6 join (the certified AllPairs prefix-filter "
    "query) — the band/row tuning query: recall tells you whether 4 "
    "bands × 2 rows is enough at the target threshold, precision prices "
    "the verify stage. Both sides are certified queries; the metric is "
    "three counts off an equi-join of their pair sets.",
)
def q_lsh_pr(spark: SparkSession, sf: str):
    # Materialize both pair sets ONCE: each is consumed twice below (the
    # TP join and its own count), and each re-derivation would re-run
    # the catalog's most expensive pipelines (exact ssjoin / LSH banding)
    # — the consumed-twice class the scan-multiplicity audit flags. The
    # materialized frames are pair-id lists, tiny relative to their
    # lineage.
    # The two materializations are independent jobs (exact ssjoin vs LSH
    # banding) — overlap them (guide §2.6, catalog.run_concurrently; same
    # pattern as eval_dup_capture_recapture, measured −15% there): the
    # lighter LSH pass back-fills the ssjoin's straggler tail. Rows are
    # identical to the sequential form.
    truth_lazy = REGISTRY["ssjoin_jaccard_prefix"].spark(spark, sf).select(
        "doc_a", "doc_b"
    )
    pred_lazy = REGISTRY["minhash_lsh_pairs"].spark(spark, sf).select(
        "doc_a", "doc_b"
    )
    truth, pred = run_concurrently(
        lambda: truth_lazy.transform(ckpt),
        lambda: pred_lazy.transform(ckpt),
    )
    tp = truth.join(pred, ["doc_a", "doc_b"]).agg(
        F.count("*").cast("double").alias("n_tp")
    )
    nt = truth.agg(F.count("*").cast("double").alias("n_truth"))
    np_ = pred.agg(F.count("*").cast("double").alias("n_pred"))
    j = tp.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(np_))
    p = F.col("n_tp") / F.col("n_pred")
    r = F.col("n_tp") / F.col("n_truth")
    return j.select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_tp").cast("long").alias("n_tp"),
        F.round(F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(p), 6).alias(
            "precision"
        ),
        F.round(F.when(F.col("n_truth") == 0, F.lit(0.0)).otherwise(r), 6).alias(
            "recall"
        ),
        F.round(
            F.when(F.col("n_tp") == 0, F.lit(0.0)).otherwise(2 * p * r / (p + r)), 6
        ).alias("f1"),
    )


@register(
    "eval_ann_ndcg",
    f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       scored AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       truth AS (
         SELECT q_id, vec_id, rn AS rank_t FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM scored) WHERE rn <= 10),
       bkt AS (
         SELECT vec_id, e, {_SB} AS bucket FROM b),
       qb AS (SELECT k.vec_id AS q_id, k.e AS qe, k.bucket
              FROM bkt k WHERE k.vec_id % 101 = 0 AND k.vec_id < 2000),
       cand AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM bkt c JOIN qb q ON c.bucket = q.bucket
         WHERE c.vec_id <> q.q_id),
       pred AS (
         SELECT q_id, vec_id, rn AS rank_p FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM cand) WHERE rn <= 10),
       terms AS (
         SELECT p.q_id,
                CASE WHEN t.rank_t IS NOT NULL THEN 1 ELSE 0 END AS hit,
                round(coalesce(11 - t.rank_t, 0) / log2(p.rank_p + 1),
                      9)::DECIMAL(20,9) AS term
         FROM pred p LEFT JOIN truth t USING (q_id, vec_id))
       SELECT q_id, count(*)::BIGINT AS n_retrieved,
              sum(hit)::BIGINT AS n_hits,
              round(CAST(sum(term) AS DOUBLE) / {IDCG_10!r}, 6) AS ndcg
       FROM terms GROUP BY q_id""",
    doc="NDCG@10 of the sign-bucket ANN tier against the brute-force "
    "cosine ground truth (graded gains 11 − true_rank, fixed IDCG@10 "
    "literal shared by both engines) — the rank-quality companion to the "
    "recall floors in test_ann_recall.py: recall says the neighbor was "
    "found, NDCG says it was found EARLY. Per-term gains rounded + "
    "decimal-summed; both retrieval lists reuse the certified ANN "
    "shapes (broadcast query side / bucket equi-join).",
)
def q_ann_ndcg(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.similarity import (
        brute_force_topk,
        bucketed_topk,
    )

    emb = table(spark, sf, "embeddings")
    qs = emb.filter((F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000))
    truth = brute_force_topk(emb, qs, k=10).select(
        "q_id", "vec_id", F.col("rank").alias("rank_t")
    )
    pred = bucketed_topk(emb, qs, k=10, n_bits=8).select(
        "q_id", "vec_id", F.col("rank").alias("rank_p")
    )
    terms = pred.join(truth, ["q_id", "vec_id"], "left").select(
        "q_id",
        F.when(F.col("rank_t").isNotNull(), 1).otherwise(0).alias("hit"),
        F.round(
            F.coalesce(F.lit(11) - F.col("rank_t"), F.lit(0))
            / F.log2(F.col("rank_p") + 1),
            9,
        )
        .cast("decimal(20,9)")
        .alias("term"),
    )
    return terms.groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_retrieved"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.round(F.sum("term").cast("double") / F.lit(IDCG_10), 6).alias("ndcg"),
    )


@register(
    "eval_knn_label_accuracy",
    """WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe, label AS true_label FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       scored AS (
         SELECT q.q_id, q.true_label, c.label AS c_label, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       knn AS (
         SELECT q_id, true_label, c_label FROM (
           SELECT q_id, true_label, c_label,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM scored) WHERE rn <= 5),
       votes AS (
         SELECT q_id, true_label, c_label, count(*) AS v
         FROM knn GROUP BY 1, 2, 3),
       pred AS (
         SELECT q_id, true_label, c_label AS pred_label FROM (
           SELECT q_id, true_label, c_label,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY v DESC, c_label) AS pr
           FROM votes) WHERE pr = 1)
       SELECT true_label::BIGINT AS label,
              count(*)::BIGINT AS n_queries,
              sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::BIGINT
                AS n_correct,
              round(sum(CASE WHEN pred_label = true_label
                             THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                AS accuracy
       FROM pred GROUP BY 1""",
    doc="Embedding-quality metric through the LABELED corpus: 5-NN "
    "majority-vote classification of the fixed query batch (exact "
    "brute-force cosine neighbors — the certified ground-truth tier), "
    "per-class accuracy and support. This is the standard probe for "
    "whether an embedding space separates its classes — the number a "
    "team watches when swapping embedding models or quantization levels "
    "(compose with embedding_quantized_cosine_cert / embedding_pq_codes "
    "to measure quality loss per compression step). Deterministic "
    "throughout: rank ties break on vec_id, vote ties on the smaller "
    "label. Scale shape: broadcast query batch, one N·Q scored pass, "
    "bounded top-5 windows, tiny vote/metric aggregates.",
)
def q_eval_knn_label_accuracy(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.operators.similarity import brute_force_topk

    emb = table(spark, sf, "embeddings")
    qs = emb.filter((F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000))
    knn = brute_force_topk(emb, qs, k=5).select("q_id", "vec_id")
    labels = emb.select("vec_id", F.col("label").cast("long").alias("c_label"))
    q_labels = qs.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").cast("long").alias("true_label"),
    )
    votes = (
        knn.join(labels, "vec_id")
        .join(F.broadcast(q_labels), "q_id")
        .groupBy("q_id", "true_label", "c_label")
        .agg(F.count("*").alias("v"))
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("v"), F.asc("c_label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select("q_id", "true_label", F.col("c_label").alias("pred_label"))
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        correct.cast("long").alias("n_correct"),
        F.round(correct.cast("double") / F.count("*"), 6).alias("accuracy"),
    )


def _knn_pred_sql(vec_expr: str, tag: str) -> str:
    """One 5-NN majority-vote prediction chain over ``vec_expr`` (a
    DuckDB expression in terms of the base CTE ``b``'s column ``e``).
    Emitted twice — exact and quantized — by eval_knn_quantized_delta."""
    return f"""bv_{tag} AS (
         SELECT vec_id, {vec_expr} AS v, label FROM b),
       q_{tag} AS (SELECT vec_id AS q_id, v AS qv, label AS true_label
                   FROM bv_{tag} WHERE vec_id % 101 = 0 AND vec_id < 2000),
       sc_{tag} AS (
         SELECT q.q_id, q.true_label, c.label AS c_label, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(c.v, c.v)) > 0
                      THEN list_dot_product(q.qv, c.v)
                           / (sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.v, c.v)))
                      ELSE 0.0 END, 6) AS cos
         FROM bv_{tag} c, q_{tag} q WHERE c.vec_id <> q.q_id),
       knn_{tag} AS (
         SELECT q_id, true_label, c_label FROM (
           SELECT q_id, true_label, c_label,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM sc_{tag}) WHERE rn <= 5),
       votes_{tag} AS (
         SELECT q_id, true_label, c_label, count(*) AS v
         FROM knn_{tag} GROUP BY 1, 2, 3),
       pred_{tag} AS (
         SELECT q_id, true_label, c_label AS pred_label FROM (
           SELECT q_id, true_label, c_label,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY v DESC, c_label) AS pr
           FROM votes_{tag}) WHERE pr = 1)"""


@register(
    "eval_knn_quantized_delta",
    None,  # assembled below (needs the quantize SQL helper)
    doc="The compression bill, measured end-to-end: per-class 5-NN "
    "majority-vote accuracy computed twice — on exact float cosine and "
    "on int8-quantized cosine (the certified 4x-storage path) — with "
    "the per-class delta. Composes three certified components (kNN "
    "probe, int8 quantization, brute-force exactness tier) into the "
    "number a team actually decides with: what does quantization cost "
    "in downstream retrieval quality, per class? Deterministic "
    "throughout (rank ties on vec_id, vote ties on smaller label, "
    "round-half-up quantization). Scale shape: two broadcast-batch "
    "scoring passes (fixed Q -> linear in N), tiny vote/metric frames.",
)
def q_eval_knn_quantized_delta(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
        quantize_int8,
    )

    emb = table(spark, sf, "embeddings")

    def pred_for(vec_col):
        base = emb.select(
            "vec_id", vec_col.alias("_v"),
            F.col("label").cast("long").alias("label"),
        ).withColumn("_n", l2_norm("_v"))
        qs = base.filter(
            (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000)
        ).select(
            F.col("vec_id").alias("q_id"),
            F.col("_v").alias("_qv"),
            F.col("_n").alias("_qn"),
            F.col("label").alias("true_label"),
        )
        pairs = base.crossJoin(F.broadcast(qs)).filter(
            F.col("vec_id") != F.col("q_id")
        )
        scored = pairs.select(
            "q_id", "true_label", F.col("label").alias("c_label"), "vec_id",
            F.round(cosine_from_norms("_qv", "_v", "_qn", "_n"), 6).alias("cos"),
        )
        wr = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        knn = scored.withColumn("rn", F.row_number().over(wr)).filter(
            F.col("rn") <= 5
        )
        votes = knn.groupBy("q_id", "true_label", "c_label").agg(
            F.count("*").alias("v")
        )
        wp = Window.partitionBy("q_id").orderBy(F.desc("v"), F.asc("c_label"))
        return (
            votes.withColumn("pr", F.row_number().over(wp))
            .filter(F.col("pr") == 1)
            .select("q_id", "true_label", F.col("c_label").alias("pred_label"))
        )

    exact = pred_for(F.col("embedding").cast("array<double>"))
    quant = pred_for(quantize_int8("embedding")).select(
        "q_id", F.col("pred_label").alias("pred_label_q")
    )
    j = exact.join(quant, "q_id")
    hit = lambda c: F.sum(  # noqa: E731
        F.when(F.col(c) == F.col("true_label"), 1).otherwise(0)
    )
    return j.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(hit("pred_label").cast("double") / F.count("*"), 6).alias(
            "acc_exact"
        ),
        F.round(hit("pred_label_q").cast("double") / F.count("*"), 6).alias(
            "acc_quantized"
        ),
        F.round(
            (hit("pred_label_q") - hit("pred_label")).cast("double")
            / F.count("*"),
            6,
        ).alias("acc_delta"),
    )


def _knn_quantized_delta_oracle() -> str:
    from annotations_ingester_spark.functions.vectors import quantize_int8_sql

    return f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
       {_knn_pred_sql('e', 'x')},
       {_knn_pred_sql(quantize_int8_sql('e'), 'q')}
       SELECT x.true_label::BIGINT AS label,
              count(*)::BIGINT AS n_queries,
              round(sum(CASE WHEN x.pred_label = x.true_label
                             THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                AS acc_exact,
              round(sum(CASE WHEN q.pred_label = x.true_label
                             THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                AS acc_quantized,
              round((sum(CASE WHEN q.pred_label = x.true_label
                              THEN 1 ELSE 0 END)
                     - sum(CASE WHEN x.pred_label = x.true_label
                               THEN 1 ELSE 0 END))::DOUBLE / count(*), 6)
                AS acc_delta
       FROM pred_x x JOIN pred_q q USING (q_id)
       GROUP BY 1"""


REGISTRY["eval_knn_quantized_delta"].oracle = _knn_quantized_delta_oracle()


_CONF_HASH = "('0x' || substr(md5('conf:' || vec_id::VARCHAR), 1, 15))::BIGINT"
_OUT_HASH = "('0x' || substr(md5('outcome:' || vec_id::VARCHAR), 1, 15))::BIGINT"


@register(
    "eval_calibration_bins",
    f"""WITH p AS (
         SELECT vec_id,
                ({_CONF_HASH} % 10000)::BIGINT AS conf_bp,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS correct
         FROM embeddings),
       b AS (
         SELECT conf_bp // 1000 AS bin,
                count(*)::BIGINT AS n,
                sum(conf_bp)::BIGINT AS sum_conf_bp,
                sum(correct)::BIGINT AS n_correct
         FROM p GROUP BY 1)
       SELECT bin::BIGINT AS bin, n,
              round(sum_conf_bp * 1.0 / n, 2) AS avg_conf_bp,
              round(n_correct * 10000.0 / n, 2) AS acc_bp,
              round(abs(sum_conf_bp * 1.0 / n - n_correct * 10000.0 / n), 2)
                AS gap_bp
       FROM b""",
    doc="Calibration audit (the per-bin decomposition of Expected "
    "Calibration Error): a scored prediction stream — confidences and "
    "outcomes synthesized deterministically from vec_id via the portable "
    "hash, with outcome probability pinned at 0.9*conf + 0.05 so the "
    "model is measurably over/under-confident at the extremes — is "
    "bucketed into 10 equal-width confidence bins; each bin reports "
    "count, mean confidence, accuracy, and |accuracy - confidence| (the "
    "ECE summand), all in integer basis points until the single rounded "
    "division per output. This is the reliability-diagram query every "
    "model-eval pipeline runs next to accuracy. Scale shape: one "
    "scan-fused map-side-combinable 10-group aggregate — flat at any "
    "prediction-set size.",
)
def q_eval_calibration_bins(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("conf_bp"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("correct"),
    )
    b = p.groupBy(
        F.floor(F.col("conf_bp") / 1000).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conf_bp").cast("long").alias("sum_conf_bp"),
        F.sum("correct").cast("long").alias("n_correct"),
    )
    return b.select(
        "bin",
        "n",
        F.round(F.col("sum_conf_bp") * 1.0 / F.col("n"), 2).alias("avg_conf_bp"),
        F.round(F.col("n_correct") * 10000.0 / F.col("n"), 2).alias("acc_bp"),
        F.round(
            F.abs(
                F.col("sum_conf_bp") * 1.0 / F.col("n")
                - F.col("n_correct") * 10000.0 / F.col("n")
            ),
            2,
        ).alias("gap_bp"),
    )


@register(
    "eval_recall_at_k_curve",
    f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       nq AS (SELECT count(*)::BIGINT AS n_queries FROM q0),
       scored AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       truth AS (
         SELECT q_id, vec_id, rn AS rank_t FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM scored) WHERE rn <= 10),
       bkt AS (
         SELECT vec_id, e, {_SB} AS bucket FROM b),
       qb AS (SELECT k.vec_id AS q_id, k.e AS qe, k.bucket
              FROM bkt k WHERE k.vec_id % 101 = 0 AND k.vec_id < 2000),
       cand AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM bkt c JOIN qb q ON c.bucket = q.bucket
         WHERE c.vec_id <> q.q_id),
       pred AS (
         SELECT q_id, vec_id, rn AS rank_p FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM cand) WHERE rn <= 10),
       hits AS (
         SELECT k.k, count(*)::BIGINT AS total_hits
         FROM pred p
         JOIN truth t USING (q_id, vec_id)
         CROSS JOIN (SELECT unnest([1, 5, 10]) AS k) k
         WHERE p.rank_p <= k.k AND t.rank_t <= k.k
         GROUP BY k.k)
       SELECT k.k::BIGINT AS k, nq.n_queries,
              coalesce(h.total_hits, 0)::BIGINT AS total_hits,
              round(coalesce(h.total_hits, 0) * 1.0 / (k.k * nq.n_queries), 6)
                AS recall_at_k
       FROM (SELECT unnest([1, 5, 10]) AS k) k
       LEFT JOIN hits h ON h.k = k.k
       CROSS JOIN nq""",
    doc="Recall@k curve (k = 1, 5, 10) of the sign-bucket ANN tier "
    "against the brute-force ground truth — the tuning curve read next "
    "to eval_ann_ndcg's rank quality: recall@1 prices exact-hit "
    "serving, recall@10 prices candidate-generation-plus-rerank. Both "
    "retrieval lists reuse the certified ANN shapes (broadcast query "
    "side / bucket equi-join); hits are one joined pass fanned over "
    "the three cutoffs; integer counts with one rounded division per "
    "row, a 1-row query-count broadcast.",
)
def q_eval_recall_curve(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.similarity import (
        brute_force_topk,
        bucketed_topk,
    )

    emb = table(spark, sf, "embeddings")
    # the query batch feeds both retrieval tiers AND the count scalar —
    # materialize the tiny frame once (scan-multiplicity discipline)
    qs = emb.filter(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000)
    ).transform(ckpt)
    nq = qs.agg(F.count("*").cast("long").alias("n_queries"))
    truth = brute_force_topk(emb, qs, k=10).select(
        "q_id", "vec_id", F.col("rank").alias("rank_t")
    )
    pred = bucketed_topk(emb, qs, k=10, n_bits=8).select(
        "q_id", "vec_id", F.col("rank").alias("rank_p")
    )
    ks = spark.createDataFrame(
        [(1,), (5,), (10,)], "k long"
    )
    hits = (
        pred.join(truth, ["q_id", "vec_id"])
        .crossJoin(F.broadcast(ks))
        .filter((F.col("rank_p") <= F.col("k")) & (F.col("rank_t") <= F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("total_hits"))
    )
    return (
        ks.join(hits, "k", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "k",
            "n_queries",
            F.coalesce(F.col("total_hits"), F.lit(0)).cast("long").alias(
                "total_hits"
            ),
            F.round(
                F.coalesce(F.col("total_hits"), F.lit(0))
                * 1.0
                / (F.col("k") * F.col("n_queries")),
                6,
            ).alias("recall_at_k"),
        )
    )


@register(
    "eval_er_blocking_quality",
    """WITH s AS (
         SELECT c_custkey, c_name, c_nationkey, substr(c_name, 1, 15) AS pref
         FROM customer WHERE c_custkey % 13 = 0 AND c_custkey < 16384),
       truth AS (
         SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         FROM s a JOIN s b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1),
       blocked AS (
         SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         FROM s a JOIN s b
           ON a.c_nationkey = b.c_nationkey AND a.pref = b.pref
         WHERE a.c_custkey < b.c_custkey
           AND levenshtein(a.c_name, b.c_name) <= 1),
       cand AS (
         SELECT count(*)::BIGINT AS n_candidates FROM (
           SELECT 1 FROM s a JOIN s b
             ON a.c_nationkey = b.c_nationkey AND a.pref = b.pref
           WHERE a.c_custkey < b.c_custkey)),
       n AS (SELECT count(*)::BIGINT AS n_rows FROM s),
       m AS (
         SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
                (SELECT count(*) FROM blocked)::BIGINT AS n_blocked)
       SELECT m.n_truth, m.n_blocked, cand.n_candidates,
              round(m.n_blocked * 1.0 / greatest(m.n_truth, 1), 6)
                AS pair_completeness,
              round(1.0 - cand.n_candidates * 2.0 / (n.n_rows * (n.n_rows - 1)), 6)
                AS reduction_ratio
       FROM m, cand, n""",
    doc="Blocking-scheme quality audit for entity resolution — the two "
    "numbers every blocking design is judged on (Christen's framework): "
    "PAIR COMPLETENESS (what fraction of true levenshtein<=1 matches "
    "survive the (nation, name-prefix) blocking er_entity_clusters "
    "uses) and REDUCTION RATIO (what fraction of the all-pairs "
    "comparison space the blocking eliminates). Ground truth is the "
    "EXACT unblocked pair set over a bounded deterministic subset "
    "(custkey%13=0 AND custkey<16384 — an ABSOLUTE cap, not a corpus "
    "fraction: the exactness-tier cartesian stays <=1261 rows / ~0.8M "
    "pairs at ANY corpus size; the cap exceeds sf0.1's max custkey "
    "14999 so every certified result is bit-identical to the uncapped "
    "form. The blocked tier is the production path). "
    "Integer counts, one rounded division per metric.",
)
def q_eval_er_blocking(spark: SparkSession, sf: str):
    s = (
        table(spark, sf, "customer")
        .filter((F.col("c_custkey") % 13 == 0) & (F.col("c_custkey") < 16384))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.substring("c_name", 1, 15).alias("pref"),
        )
        .transform(ckpt)  # feeds truth/blocked/candidate tiers
    )
    a = s.select(
        F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"),
        F.col("c_nationkey").alias("nka"), F.col("pref").alias("pa"),
    )
    b = s.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"),
        F.col("c_nationkey").alias("nkb"), F.col("pref").alias("pb"),
    )
    truth = a.crossJoin(b).filter(
        (F.col("ka") < F.col("kb"))
        # bounded levenshtein (threshold arg): identical kept rows, the
        # banded DP short-circuits past distance 1 — the exactness-tier
        # cartesian is where the per-pair DP cost actually concentrates
        & (F.levenshtein("na", "nb", 1).between(0, 1))
    )
    blocked_cand = a.join(
        b, (F.col("nka") == F.col("nkb")) & (F.col("pa") == F.col("pb"))
    ).filter(F.col("ka") < F.col("kb"))
    blocked = blocked_cand.filter(F.levenshtein("na", "nb", 1).between(0, 1))
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_blocked = blocked.agg(F.count("*").cast("long").alias("n_blocked"))
    n_cand = blocked_cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_rows = s.agg(F.count("*").cast("long").alias("n_rows"))
    return (
        n_truth.crossJoin(n_blocked).crossJoin(n_cand).crossJoin(n_rows)
        .select(
            "n_truth",
            "n_blocked",
            "n_candidates",
            F.round(
                F.col("n_blocked") * 1.0 / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("pair_completeness"),
            F.round(
                1.0
                - F.col("n_candidates")
                * 2.0
                / (F.col("n_rows") * (F.col("n_rows") - 1)),
                6,
            ).alias("reduction_ratio"),
        )
    )


@register(
    "eval_ann_mrr",
    f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       scored AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       top1 AS (
         SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM scored) WHERE rn = 1),
       bkt AS (SELECT vec_id, e, {_SB} AS bucket FROM b),
       qb AS (SELECT k.vec_id AS q_id, k.e AS qe, k.bucket
              FROM bkt k WHERE k.vec_id % 101 = 0 AND k.vec_id < 2000),
       cand AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                           * sqrt(list_dot_product(c.e, c.e)) > 0
                      THEN list_dot_product(q.qe, c.e)
                           / (sqrt(list_dot_product(q.qe, q.qe))
                              * sqrt(list_dot_product(c.e, c.e)))
                      ELSE 0.0 END, 6) AS cos
         FROM bkt c JOIN qb q ON c.bucket = q.bucket
         WHERE c.vec_id <> q.q_id),
       pred AS (
         SELECT q_id, vec_id, rn AS rank_p FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM cand) WHERE rn <= 10),
       rr AS (
         SELECT t.q_id,
                round(coalesce(1.0 / min(p.rank_p), 0.0), 9)::DECIMAL(20,9)
                  AS rr
         FROM top1 t LEFT JOIN pred p USING (q_id, vec_id)
         GROUP BY t.q_id)
       SELECT count(*)::BIGINT AS n_queries,
              sum(CASE WHEN rr > 0 THEN 1 ELSE 0 END)::BIGINT AS n_found,
              round(CAST(sum(rr) AS DOUBLE) / count(*), 6) AS mrr
       FROM rr""",
    doc="Mean reciprocal rank of the sign-bucket ANN tier at finding "
    "each query's TRUE nearest neighbor (brute-force top-1 as the "
    "relevant item) within its top-10 — the single-number retrieval "
    "summary read next to recall@k (where does the right answer land, "
    "averaged as 1/rank; misses contribute 0). Per-query reciprocal "
    "ranks rounded + decimal-summed so the mean is order-free; both "
    "tiers reuse the certified ANN shapes.",
)
def q_eval_ann_mrr(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.similarity import (
        brute_force_topk,
        bucketed_topk,
    )

    emb = table(spark, sf, "embeddings")
    qs = emb.filter(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000)
    ).transform(ckpt)
    top1 = brute_force_topk(emb, qs, k=1).select("q_id", "vec_id")
    pred = bucketed_topk(emb, qs, k=10, n_bits=8).select(
        "q_id", "vec_id", F.col("rank").alias("rank_p")
    )
    rr = (
        top1.join(pred, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.round(
                F.coalesce(1.0 / F.min("rank_p"), F.lit(0.0)), 9
            )
            .cast("decimal(20,9)")
            .alias("rr")
        )
    )
    return rr.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum((F.col("rr") > 0).cast("long")).cast("long").alias("n_found"),
        F.round(F.sum("rr").cast("double") / F.count("*"), 6).alias("mrr"),
    )


# ---- ROC/AUC rank statistic (round 7) ----------------------------------------


@register(
    "eval_auc_roc",
    None,  # composed below from the stats module's shared CDF CTE
    doc="ROC AUC of a deterministic scalar scorer (chars-per-token, the "
    "crudest language signal) predicting the labeled positive class "
    "(lang = 'en') — the threshold-free ranking metric every classifier "
    "gate (quality_classifier_scores, streaming_quality_gate) should be "
    "tuned against before picking a cutoff. Computed EXACTLY as the "
    "Mann-Whitney rank statistic: AUC = U1/(n_pos*n_neg) with doubled "
    "tie-averaged ranks kept integral, so the only floats are the final "
    "two divisions (shared expression tree, one rounding each). Gini = "
    "2*AUC - 1. Same bounded-domain score CDF + two-level prefix sum as "
    "stats_ks_test (scores quantize to e6 fixed-point — the pinned "
    "rounding); one aggregate over the per-score table, no cross join.",
)
def q_eval_auc_roc(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions import text as tx
    from annotations_ingester_spark.plans.queries_stats import _two_sample_cdf

    docs = table(spark, sf, "documents")
    # the non-empty-token filter runs as a cheap RLIKE equivalent
    # (tokens split on [^a-z0-9]+, so "has a token" == "has an alnum
    # char") — filtering on size(tokens(...)) would re-run the regex
    # tokenize in FilterExec on top of the projection's own evaluation
    # (the consumed-twice class; tokenization dominates per-row cost)
    s = docs.filter(F.lower(F.col("text")).rlike("[a-z0-9]")).select(
        (F.col("lang") == "en").cast("int").alias("is_a"),
        F.round(
            F.col("n_chars") * 1000000.0 / F.size(tx.tokens("text"))
        )
        .cast("long")
        .alias("v"),
    )
    cdf = _two_sample_cdf(s)
    k1, k2, c1, c2 = F.col("k1"), F.col("k2"), F.col("c1"), F.col("c2")
    m = cdf.agg(
        F.sum(k1 * (2 * ((c1 - k1) + (c2 - k2)) + (k1 + k2) + 1))
        .cast("long")
        .alias("r1d"),
        F.max("c1").alias("n_pos"),
        F.max("c2").alias("n_neg"),
    )
    n1, n2 = F.col("n_pos"), F.col("n_neg")
    u = m.select(
        "n_pos", "n_neg",
        (F.col("r1d") - n1 * (n1 + 1)).cast("long").alias("u1_doubled"),
    )
    u1d = F.col("u1_doubled")
    return u.select(
        "n_pos", "n_neg", "u1_doubled",
        F.round(u1d / (2.0 * n1 * n2), 6).alias("auc"),
        F.round(u1d * 1.0 / (n1 * n2) - 1, 6).alias("gini"),
    )


def _auc_oracle() -> str:
    from annotations_ingester_spark.functions.text import tokens_sql
    from annotations_ingester_spark.plans.queries_stats import _cdf_oracle_cte

    toks = tokens_sql("text")
    src = (
        "SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a, "
        f"round(n_chars * 1000000.0 / len({toks}))::BIGINT AS v "
        f"FROM documents WHERE len({toks}) >= 1"
    )
    return f"""WITH {_cdf_oracle_cte(src)},
       m AS (SELECT
               sum(k1 * (2 * ((c1 - k1) + (c2 - k2)) + (k1 + k2) + 1))::BIGINT
                 AS r1d,
               max(c1) AS n_pos, max(c2) AS n_neg
             FROM cdf),
       u AS (SELECT n_pos, n_neg,
                    (r1d - n_pos * (n_pos + 1))::BIGINT AS u1_doubled
             FROM m)
       SELECT n_pos, n_neg, u1_doubled,
              round(u1_doubled / (2.0 * n_pos * n_neg), 6) AS auc,
              round(u1_doubled * 1.0 / (n_pos * n_neg) - 1, 6) AS gini
       FROM u"""


REGISTRY["eval_auc_roc"].oracle = _auc_oracle()


def _matryoshka_knn_sql(vec_expr: str, tag: str) -> str:
    """Top-5 cosine neighbor SET at one truncation (DuckDB expression
    ``vec_expr`` over base CTE ``mb``'s column ``e``) — the set-overlap
    twin of _knn_pred_sql (which keeps votes, not members)."""
    return f"""mv_{tag} AS (
         SELECT vec_id, {vec_expr} AS v FROM mb),
       mq_{tag} AS (SELECT vec_id AS q_id, v AS qv FROM mv_{tag}
                    WHERE vec_id % 101 = 0 AND vec_id < 2000),
       msc_{tag} AS (
         SELECT q.q_id, c.vec_id,
                round(CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(c.v, c.v)) > 0
                      THEN list_dot_product(q.qv, c.v)
                           / (sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.v, c.v)))
                      ELSE 0.0 END, 6) AS cos
         FROM mv_{tag} c, mq_{tag} q WHERE c.vec_id <> q.q_id),
       mknn_{tag} AS (
         SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, vec_id) AS rn
           FROM msc_{tag}) WHERE rn <= 5)"""


_MATRYOSHKA_DIMS = (8, 16)


def _matryoshka_overlap_sql() -> str:
    knns = [_matryoshka_knn_sql("e", "full")] + [
        _matryoshka_knn_sql(f"e[1:{d}]", f"d{d}") for d in _MATRYOSHKA_DIMS
    ]
    per_dim = "\n         UNION ALL ".join(
        f"""SELECT {d} AS dim, t.q_id,
                sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_common
         FROM mknn_d{d} t LEFT JOIN mknn_full f
           ON t.q_id = f.q_id AND t.vec_id = f.vec_id
         GROUP BY t.q_id"""
        for d in _MATRYOSHKA_DIMS
    )
    knn_block = ",\n       ".join(knns)
    return f"""WITH mb AS (SELECT vec_id, embedding AS e FROM embeddings),
       {knn_block},
       ov AS ({per_dim})
       SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n_queries,
              round(CAST(sum(n_common) AS DOUBLE) / (5 * count(*)), 6)
                AS mean_overlap5,
              round(CAST(min(n_common) AS DOUBLE) / 5, 6) AS min_overlap5
       FROM ov GROUP BY dim ORDER BY dim"""


@register(
    "eval_matryoshka_truncation",
    None,  # assembled below (shares the knn CTE builder)
    doc="Matryoshka-truncation retrieval cert: top-5 cosine neighbor "
    "OVERLAP between prefix-truncated embeddings (dims 8 and 16 of 64) "
    "and the full vector, per truncation — the number that decides "
    "whether a cheap prefix index can serve first-stage retrieval. "
    "Overlap@5 per query is an exact integer (|knn_d ∩ knn_full| via a "
    "(q_id, vec_id) equi-join of two top-5 sets), so the mean is one "
    "rounded integer division — no float accumulation. Deterministic "
    "rank ties on vec_id. Scale shape: one broadcast query batch "
    "scored per truncation (fixed Q → linear in N each), bounded top-5 "
    "windows, Q-bounded overlap join.",
)
def q_eval_matryoshka(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.similarity import brute_force_topk

    emb = table(spark, sf, "embeddings")

    def knn_at(frame):
        qs = frame.filter((F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000))
        return brute_force_topk(frame, qs, k=5).select("q_id", "vec_id")

    # the full-dim top-5 set is consumed once per truncation — checkpoint
    # so the N·Q scoring pass runs exactly once (scan-multiplicity rule)
    full = (
        knn_at(emb.select("vec_id", "embedding"))
        .select(F.col("q_id").alias("f_q"), F.col("vec_id").alias("f_v"))
        .transform(ckpt)
    )
    per_q = None
    for d in _MATRYOSHKA_DIMS:
        trunc = knn_at(
            emb.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        )
        ov = (
            trunc.join(
                full,
                (trunc["q_id"] == full["f_q"]) & (trunc["vec_id"] == full["f_v"]),
                "left",
            )
            .groupBy("q_id")
            .agg(
                F.sum(F.when(F.col("f_v").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_common")
            )
            .select(F.lit(d).alias("dim"), "q_id", "n_common")
        )
        per_q = ov if per_q is None else per_q.unionAll(ov)
    return (
        per_q.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(
                F.sum("n_common").cast("double") / (5 * F.count("*")), 6
            ).alias("mean_overlap5"),
            F.round(F.min("n_common").cast("double") / 5, 6).alias("min_overlap5"),
        )
        .orderBy("dim")
    )


REGISTRY["eval_matryoshka_truncation"].oracle = _matryoshka_overlap_sql()


# shared kmeans CTE prefix (the kmeans_lloyd_step machinery: per-dim
# explode + exact-decimal L2^2 + deterministic argmin assignment)
_KM_ASSIGN_CTE = """b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       c AS (SELECT vec_id AS centroid_id, e AS ce FROM b
            WHERE vec_id % 173 = 0 AND vec_id < 2000),
       vd AS (
         SELECT vec_id, s.i AS dim, s.v AS v
         FROM (SELECT vec_id,
                      unnest(list_transform(range(len(e)),
                                            i -> {'i': i, 'v': e[i + 1]})) AS s
               FROM b)),
       cd AS (
         SELECT centroid_id, s.i AS dim, s.v AS cv
         FROM (SELECT centroid_id,
                      unnest(list_transform(range(len(ce)),
                                            i -> {'i': i, 'v': ce[i + 1]})) AS s
               FROM c)),
       d2 AS (
         SELECT vd.vec_id, cd.centroid_id,
                sum(((vd.v - cd.cv) * (vd.v - cd.cv))::DECIMAL(28,12)) AS d2
         FROM vd JOIN cd USING (dim)
         GROUP BY vd.vec_id, cd.centroid_id),
       assign AS (
         SELECT vec_id, centroid_id, d2
         FROM (SELECT vec_id, centroid_id, d2,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, centroid_id) AS rn
               FROM d2)
         WHERE rn = 1)"""


@register(
    "eval_cluster_davies_bouldin",
    f"""WITH {_KM_ASSIGN_CTE},
       s AS (
         SELECT centroid_id, count(*)::BIGINT AS n_members,
                round(CAST(sum(round(sqrt(CAST(d2 AS DOUBLE)), 6)
                                ::DECIMAL(25,6)) AS DOUBLE) / count(*), 6)
                  AS s_intra
         FROM assign GROUP BY centroid_id),
       m AS (
         SELECT a.centroid_id AS ci, b2.centroid_id AS cj,
                round(sqrt(CAST(sum(((a.cv - b2.cv) * (a.cv - b2.cv))
                                    ::DECIMAL(28,12)) AS DOUBLE)), 6) AS dist
         FROM cd a JOIN cd b2 USING (dim)
         WHERE a.centroid_id <> b2.centroid_id
         GROUP BY ci, cj),
       r AS (
         SELECT m.ci AS centroid_id,
                max(round((si.s_intra + sj.s_intra) / m.dist, 6)) AS r_max
         FROM m JOIN s si ON si.centroid_id = m.ci
                JOIN s sj ON sj.centroid_id = m.cj
         GROUP BY m.ci)
       SELECT s.centroid_id, s.n_members, s.s_intra, r.r_max
       FROM s JOIN r USING (centroid_id) ORDER BY s.centroid_id""",
    doc="Davies-Bouldin cluster-quality report over the fixed-seed "
    "k-means assignment (centroids vec_id%173<2000 — the "
    "kmeans_lloyd_step seeds): per cluster, the member count, the mean "
    "member-to-centroid distance S_i, and the DB term "
    "R_i = max_j (S_i+S_j)/M_ij over the k x k centroid-distance "
    "table — the separation-vs-scatter score that decides whether a "
    "semantic-dedup clustering is tight enough to trust (mean of R_i "
    "is the classic DB index; per-cluster rows localize the blame). "
    "Distances are exact-decimal L2^2 folds (the kmeans argmin "
    "discipline) surfaced once through sqrt and rounded to 6 dp; "
    "per-cluster means accumulate rounded terms as DECIMAL(25,6) "
    "(order-exact). Scale shape: broadcast-centroid assignment "
    "(N x k, never all-pairs), one cluster-key aggregate, and a k x k "
    "centroid cross bounded by the pinned k.",
)
def q_eval_davies_bouldin(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.operators.similarity import kmeans_assign

    emb = table(spark, sf, "embeddings")
    # cents (k rows) is consumed by the assignment, the member re-join,
    # and both sides of the k x k distance table; the assignment frame by
    # the member join — checkpoint both so the final plan reads the
    # corpus ONCE (scan-multiplicity rule; the kmeans_two_round_assign
    # discipline)
    cents = (
        emb.filter((F.col("vec_id") % 173 == 0) & (F.col("vec_id") < 2000))
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
        .transform(ckpt)
    )
    asg = kmeans_assign(emb, cents).transform(ckpt)
    d2_sql = (
        "aggregate("
        " zip_with(_v, _cv, (a, b) ->"
        "   CAST((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        "        * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) AS DECIMAL(28,12))),"
        " CAST(0 AS DECIMAL(28,12)),"
        " (acc, x) -> CAST(acc + x AS DECIMAL(28,12)))"
    )
    member_d = (
        asg.join(emb.select("vec_id", F.col("embedding").alias("_v")), "vec_id")
        .join(
            F.broadcast(
                cents.select("centroid_id", F.col("embedding").alias("_cv"))
            ),
            "centroid_id",
        )
        .select(
            "centroid_id",
            F.round(F.sqrt(F.expr(d2_sql).cast("double")), 6).alias("dist"),
        )
    )
    # s (k rows) feeds si, sj, and the final join — checkpoint so the
    # member-distance scan behind it runs once
    s = member_d.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.round(
            F.sum(F.col("dist").cast("decimal(25,6)")).cast("double") / F.count("*"),
            6,
        ).alias("s_intra"),
    ).transform(ckpt)
    ci = cents.select(F.col("centroid_id").alias("ci"), F.col("embedding").alias("_v"))
    cj = cents.select(F.col("centroid_id").alias("cj"), F.col("embedding").alias("_cv"))
    m = (
        ci.crossJoin(F.broadcast(cj))
        .filter(F.col("ci") != F.col("cj"))
        .select(
            "ci",
            "cj",
            F.round(F.sqrt(F.expr(d2_sql).cast("double")), 6).alias("dist"),
        )
    )
    si = s.select(F.col("centroid_id").alias("ci"), F.col("s_intra").alias("s_i"))
    sj = s.select(F.col("centroid_id").alias("cj"), F.col("s_intra").alias("s_j"))
    r = (
        m.join(F.broadcast(si), "ci")
        .join(F.broadcast(sj), "cj")
        .groupBy(F.col("ci").alias("centroid_id"))
        .agg(
            F.max(
                F.round((F.col("s_i") + F.col("s_j")) / F.col("dist"), 6)
            ).alias("r_max")
        )
    )
    return (
        s.join(r, "centroid_id")
        .select("centroid_id", "n_members", "s_intra", "r_max")
        .orderBy("centroid_id")
    )


from annotations_ingester_spark.functions.hashing import (  # noqa: E402
    md5_hash64,
    md5_hash64_sql,
)


@register(
    "eval_join_cardinality_est",
    f"""WITH c AS (
         SELECT l_partkey, count(*)::BIGINT AS k
         FROM lineitem GROUP BY l_partkey),
       a AS (SELECT count(*)::BIGINT AS n_keys,
                    sum(CASE WHEN {md5_hash64_sql("'jce:' || l_partkey::VARCHAR")}
                             % 16 = 0 THEN 1 ELSE 0 END)::BIGINT
                      AS n_sampled,
                    sum(k::DECIMAL(38,0) * k)::DECIMAL(38,0) AS exact_pairs,
                    sum(CASE WHEN {md5_hash64_sql("'jce:' || l_partkey::VARCHAR")}
                             % 16 = 0
                             THEN k::DECIMAL(38,0) * k
                             ELSE 0::DECIMAL(38,0) END)
                      * 16 AS est_pairs
             FROM c)
       SELECT n_keys, n_sampled,
              exact_pairs::BIGINT AS exact_pairs,
              est_pairs::BIGINT AS est_pairs,
              round(abs(CAST(est_pairs AS DOUBLE) - CAST(exact_pairs AS DOUBLE))
                    / CAST(exact_pairs AS DOUBLE), 6) AS rel_error
       FROM a""",
    doc="Join-cardinality estimation certified against ground truth: the "
    "self-equi-join size on l_partkey is exactly sum(c_k^2) over "
    "per-key counts, and the 1/16 KEY-sampled estimator (keys chosen "
    "by the salted portable md5 hash — sampling keys, not rows, keeps "
    "the per-key count exact inside the sample) scales its partial sum "
    "by 16; the report prices that estimator with its relative error — "
    "the number a planner needs before risking a shuffle join at "
    "100 TB. Both the exact and sampled sums ride ONE map-side-"
    "combinable aggregate over the key-count rollup (a single scan, no "
    "join is ever executed); pair counts accumulate as DECIMAL(38,0). "
    "Scale shape: one key-rollup shuffle + a 1-row reduce.",
)
def q_eval_join_card(spark: SparkSession, sf: str):
    c = (
        table(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("k"))
    )
    sampled = (
        md5_hash64(F.concat(F.lit("jce:"), F.col("l_partkey").cast("string"))) % 16
        == 0
    )
    k2 = F.col("k").cast("decimal(38,0)") * F.col("k")
    a = c.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(k2).alias("exact_pairs"),
        (F.sum(F.when(sampled, k2).otherwise(F.lit(0).cast("decimal(38,0)"))) * 16)
        .alias("est_pairs"),
    )
    return a.select(
        "n_keys",
        "n_sampled",
        F.col("exact_pairs").cast("long").alias("exact_pairs"),
        F.col("est_pairs").cast("long").alias("est_pairs"),
        F.round(
            F.abs(
                F.col("est_pairs").cast("double")
                - F.col("exact_pairs").cast("double")
            )
            / F.col("exact_pairs").cast("double"),
            6,
        ).alias("rel_error"),
    )


@register(
    "eval_embedding_isotropy",
    """WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       vd AS (
         SELECT s.i AS dim, s.v AS v
         FROM (SELECT unnest(list_transform(range(len(e)),
                                            i -> {'i': i, 'v': e[i + 1]})) AS s
               FROM b)),
       per_dim AS (
         SELECT dim, count(*)::BIGINT AS n,
                sum(v::DECIMAL(27,12))::DECIMAL(38,12) AS s,
                sum((v * v)::DECIMAL(28,12))::DECIMAL(38,12) AS q
         FROM vd GROUP BY dim),
       agg AS (
         SELECT max(n)::BIGINT AS n,
                sum(round((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                          12)::DECIMAL(25,12)) AS mu2,
                sum(q)::DECIMAL(38,12) AS qtot,
                max(round(CAST(q AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                          12)) AS max_var,
                sum(round(CAST(q AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                          12)::DECIMAL(25,12)) AS var_tot
         FROM per_dim)
       SELECT n AS n_vectors,
              round(CAST(mu2 AS DOUBLE), 6) AS mean_norm2,
              round(CAST(qtot AS DOUBLE) / n, 6) AS mean_sq_norm,
              round(CAST(mu2 AS DOUBLE) / (CAST(qtot AS DOUBLE) / n), 6)
                AS anisotropy,
              round(CAST(max_var AS DOUBLE) / CAST(var_tot AS DOUBLE), 6)
                AS top_dim_var_share
       FROM agg""",
    doc="Embedding-space isotropy diagnostic: ||mean vector||^2 vs the "
    "mean squared norm (their ratio is the classic anisotropy score — "
    "near 0 for a centered isotropic space, near 1 when all vectors "
    "share a dominant direction, the common pathology that breaks "
    "cosine retrieval) plus the largest single dimension's share of "
    "total variance. Per-dimension first/second moments accumulate as "
    "exact DECIMAL sums over the posexplode stream (map-side "
    "combinable, dim-domain-bounded groups); each per-dim mean/variance "
    "rounds to 12 dp before the DECIMAL re-accumulation so both engines "
    "sum identical terms. Scale shape: one N x d explode into a "
    "64-group aggregate, then 1-row arithmetic.",
)
def q_eval_isotropy(spark: SparkSession, sf: str):
    b = table(spark, sf, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    per_dim = b.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(27,12)")).cast("decimal(38,12)").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(28,12)"))
        .cast("decimal(38,12)")
        .alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    var_d = F.round(F.col("q").cast("double") / F.col("n") - mu * mu, 12)
    agg = per_dim.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.round(mu * mu, 12).cast("decimal(25,12)")).alias("mu2"),
        F.sum("q").cast("decimal(38,12)").alias("qtot"),
        F.max(var_d).alias("max_var"),
        F.sum(var_d.cast("decimal(25,12)")).alias("var_tot"),
    )
    return agg.select(
        F.col("n").alias("n_vectors"),
        F.round(F.col("mu2").cast("double"), 6).alias("mean_norm2"),
        F.round(F.col("qtot").cast("double") / F.col("n"), 6).alias("mean_sq_norm"),
        F.round(
            F.col("mu2").cast("double") / (F.col("qtot").cast("double") / F.col("n")),
            6,
        ).alias("anisotropy"),
        F.round(
            F.col("max_var").cast("double") / F.col("var_tot").cast("double"), 6
        ).alias("top_dim_var_share"),
    )


# --- train/eval near-duplicate leakage audit (r9) --------------------------


@register(
    "eval_split_leakage_audit",
    None,  # oracle attached below (composes the shared LSH-edge CTE)
    doc="Train/eval contamination audit over the near-duplicate graph: "
    "assign every document its stable hash split (the split_hash_assign "
    "80/10/10 rule — same salt, same buckets), take the MinHash-LSH "
    "candidate pairs (the banded near-dup graph minhash_lsh_pairs "
    "certifies), and count the pairs that STRADDLE train vs val/test — "
    "each one is an eval example whose near-duplicate sits in the "
    "training set, the leakage class that silently inflates benchmark "
    "scores (the reason decontamination pipelines exist). Reports the "
    "pair totals, the straddling count, the leakage rate over eval-side "
    "pairs, and the count of distinct CONTAMINATED EVAL DOCS (the "
    "number a release gate would act on). Scale shape: the banded "
    "self-join is the certified LSH shape ((band, band_key) buckets, "
    "never all-pairs); split assignment is a scan-fused projection "
    "joined onto the pair list by doc id — two key equi-joins, "
    "map-side-combinable counts.",
)
def q_eval_split_leakage(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.sampling import hash_split
    from annotations_ingester_spark.plans.queries_analytics import _lsh_edges

    splits = hash_split(
        table(spark, sf, "documents").select("doc_id")
    ).select("doc_id", "split")
    pairs = _lsh_edges(spark, sf)
    j = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("src"), F.col("split").alias("split_a")
            ),
            "src",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("dst"), F.col("split").alias("split_b")
            ),
            "dst",
        )
        .transform(ckpt)  # feeds the totals and the doc rollup
    )
    is_cross = (
        (F.col("split_a") == "train") & (F.col("split_b") != "train")
    ) | ((F.col("split_a") != "train") & (F.col("split_b") == "train"))
    touches_eval = (F.col("split_a") != "train") | (F.col("split_b") != "train")
    totals = j.agg(
        F.count("*").cast("long").alias("n_neardup_pairs"),
        F.sum(F.when(touches_eval, 1).otherwise(0))
        .cast("long")
        .alias("n_eval_side_pairs"),
        F.sum(F.when(is_cross, 1).otherwise(0))
        .cast("long")
        .alias("n_cross_pairs"),
    )
    contaminated = (
        j.filter(is_cross)
        .select(
            F.when(F.col("split_a") != "train", F.col("src"))
            .otherwise(F.col("dst"))
            .alias("doc")
        )
        .agg(F.count_distinct(F.col("doc")).cast("long").alias("n_contaminated_eval_docs"))
    )
    return totals.crossJoin(contaminated).select(
        "n_neardup_pairs",
        "n_eval_side_pairs",
        "n_cross_pairs",
        "n_contaminated_eval_docs",
        F.round(
            F.col("n_cross_pairs")
            * 1.0
            / F.greatest(F.col("n_eval_side_pairs"), F.lit(1)),
            6,
        ).alias("leakage_rate"),
    )


def _split_leakage_oracle() -> str:
    from annotations_ingester_spark.functions.hashing import md5_hash64_sql
    from annotations_ingester_spark.plans.queries_analytics import _lsh_edges_sql

    split_hash = md5_hash64_sql("'split:' || doc_id::VARCHAR")
    return f"""WITH {_lsh_edges_sql()},
       sp AS (
         SELECT doc_id,
                CASE WHEN {split_hash} % 100 < 80 THEN 'train'
                     WHEN {split_hash} % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents),
       j AS (
         SELECT e.src, e.dst, sa.split AS split_a, sb.split AS split_b
         FROM e
         JOIN sp sa ON sa.doc_id = e.src
         JOIN sp sb ON sb.doc_id = e.dst),
       t AS (
         SELECT count(*)::BIGINT AS n_neardup_pairs,
                sum(CASE WHEN split_a <> 'train' OR split_b <> 'train'
                         THEN 1 ELSE 0 END)::BIGINT AS n_eval_side_pairs,
                sum(CASE WHEN (split_a = 'train' AND split_b <> 'train')
                           OR (split_a <> 'train' AND split_b = 'train')
                         THEN 1 ELSE 0 END)::BIGINT AS n_cross_pairs
         FROM j),
       c AS (
         SELECT count(DISTINCT CASE WHEN split_a <> 'train' THEN src
                                    ELSE dst END)::BIGINT
                  AS n_contaminated_eval_docs
         FROM j
         WHERE (split_a = 'train' AND split_b <> 'train')
            OR (split_a <> 'train' AND split_b = 'train'))
       SELECT t.n_neardup_pairs, t.n_eval_side_pairs, t.n_cross_pairs,
              c.n_contaminated_eval_docs,
              round(t.n_cross_pairs * 1.0
                    / greatest(t.n_eval_side_pairs, 1), 6) AS leakage_rate
       FROM t, c"""


REGISTRY["eval_split_leakage_audit"].oracle = _split_leakage_oracle()


# --- round-9 batch B: conformal coverage, label-centroid similarity --------

_CONF_BKT = 1_048_576  # 2^20-millicent residual buckets (two-level prefix)


@register(
    "eval_conformal_coverage",
    f"""WITH e AS (
         SELECT event_id, event_type,
                round(value * 100)::BIGINT AS cents,
                {md5_hash64_sql("'conf:' || event_id::VARCHAR")} % 4 AS split
         FROM events),
       tm AS (SELECT event_type, count(*)::BIGINT AS n,
                     round(CAST(sum(cents) AS DOUBLE) * 1000
                           / count(*))::BIGINT AS pm
              FROM e WHERE split <= 1 GROUP BY event_type),
       cal AS (SELECT abs(e.cents * 1000 - tm.pm)::BIGINT AS r
               FROM e JOIN tm USING (event_type) WHERE e.split = 2),
       tst AS (SELECT abs(e.cents * 1000 - tm.pm)::BIGINT AS r
               FROM e JOIN tm USING (event_type) WHERE e.split = 3),
       nc AS (SELECT count(*)::BIGINT AS n_cal FROM cal),
       rv AS (SELECT r, count(*)::BIGINT AS w,
                     (r // {_CONF_BKT})::BIGINT AS bkt
              FROM cal GROUP BY r),
       ranked AS (
         SELECT r, bkt,
                sum(w) OVER (PARTITION BY bkt ORDER BY r
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cw_in
         FROM rv),
       bc AS (SELECT bkt, sum(w)::BIGINT AS bw FROM rv GROUP BY bkt),
       off AS (SELECT bkt,
                      coalesce(sum(bw) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT AS o
               FROM bc),
       g AS (SELECT r.r, (f.o + r.cw_in)::BIGINT AS cw
             FROM ranked r JOIN off f USING (bkt)),
       qh AS (SELECT min(CASE WHEN 10 * g.cw >= 9 * (nc.n_cal + 1)
                              THEN g.r END)::BIGINT AS qhat
              FROM g, nc),
       cov AS (SELECT count(*)::BIGINT AS n_test,
                      sum(CASE WHEN t.r <= q.qhat THEN 1 ELSE 0 END)::BIGINT
                        AS n_covered
               FROM tst t, qh q)
       SELECT (SELECT sum(n) FROM tm)::BIGINT AS n_train,
              nc.n_cal, c.n_test,
              ((9 * (nc.n_cal + 1) + 9) // 10)::BIGINT AS k_rank,
              q.qhat AS qhat_millicents,
              round(CAST(c.n_covered AS DOUBLE) / c.n_test, 6) AS coverage
       FROM nc, qh q, cov c""",
    doc="Split-conformal prediction-interval certification over the "
    "event stream: a 50/25/25 hash split (train/calibration/test, "
    "md5('conf:'||event_id) — stable, engine-portable), the 'model' is "
    "the per-event-type train mean (rounded once to integer "
    "millicents), nonconformity is the absolute residual, and qhat is "
    "the EXACT k-th smallest calibration residual at "
    "k = ceil(0.9*(n_cal+1)) — the finite-sample-valid conformal rank, "
    "located via the stats_weighted_median two-level prefix sum "
    "(per-residual rollup, in-bucket cumulative windows partitioned by "
    "2^20-millicent bucket, a cumulated offset over the tiny bucket "
    "table — never a global unpartitioned window over residuals) with "
    "the rank threshold as the integer cross-multiplication "
    "10*cum >= 9*(n_cal+1). The reported test coverage certifies the "
    "conformal guarantee P(covered) >= 90% holds empirically on the "
    "held-out quarter — the distribution-free ML-deployment check. "
    "Scale shape: scan-fused split projection, one 5-group train "
    "aggregate, map-side-combinable residual rollup, bounded-domain "
    "windows, two 1-row broadcasts (k, qhat), 1-row output.""",
)
def q_eval_conformal_coverage(spark: SparkSession, sf: str):
    e = events_table(spark, sf).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            md5_hash64(F.concat(F.lit("conf:"), F.col("event_id").cast("string")))
            % 4
        ).alias("split"),
    )
    tm = (
        e.filter(F.col("split") <= 1)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("cents").cast("double") * 1000 / F.count("*"))
            .cast("long")
            .alias("pm"),
        )
        .transform(ckpt)  # 5 rows; feeds join + n_train branches
    )
    resid = F.abs(F.col("cents") * 1000 - F.col("pm")).cast("long").alias("r")
    joined = e.join(F.broadcast(tm.select("event_type", "pm")), "event_type")
    cal = joined.filter(F.col("split") == 2).select(resid)
    tst = joined.filter(F.col("split") == 3).select(resid)
    n_train = tm.agg(F.sum("n").cast("long").alias("n_train"))
    rv = (
        cal.groupBy("r")
        .agg(F.count("*").cast("long").alias("w"))
        .withColumn("bkt", F.expr(f"CAST(r DIV {_CONF_BKT} AS BIGINT)"))
        # value-domain-bounded rollup; feeds n_cal + in-bucket + bucket-count
        .transform(ckpt)
    )
    nc = rv.agg(F.sum("w").cast("long").alias("n_cal"))
    from pyspark.sql import Window

    w_in = (
        Window.partitionBy("bkt")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rv.withColumn("cw_in", F.sum("w").over(w_in).cast("long"))
    bc = rv.groupBy("bkt").agg(F.sum("w").cast("long").alias("bw"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.withColumn(
        "o", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).cast("long")
    ).select("bkt", "o")
    g = ranked.join(F.broadcast(off), "bkt").select(
        "r", (F.col("o") + F.col("cw_in")).cast("long").alias("cw")
    )
    qh = (
        g.crossJoin(F.broadcast(nc))
        .agg(
            F.min(
                F.when(
                    10 * F.col("cw") >= 9 * (F.col("n_cal") + 1), F.col("r")
                )
            )
            .cast("long")
            .alias("qhat")
        )
    )
    cov = tst.crossJoin(F.broadcast(qh)).agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        F.max("qhat").cast("long").alias("qhat"),
    )
    return (
        cov.crossJoin(F.broadcast(n_train))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_train",
            "n_cal",
            "n_test",
            F.expr("CAST((9 * (n_cal + 1) + 9) DIV 10 AS BIGINT)").alias("k_rank"),
            F.col("qhat").alias("qhat_millicents"),
            F.round(F.col("n_covered").cast("double") / F.col("n_test"), 6).alias(
                "coverage"
            ),
        )
    )


@register(
    "eval_label_centroid_sim",
    """WITH vd AS (
         SELECT label, s.i AS dim, s.v AS v
         FROM (SELECT label,
                      unnest(list_transform(range(len(embedding)),
                             i -> {'i': i, 'v': embedding[i + 1]::DOUBLE})) AS s
               FROM embeddings)),
       pd AS (SELECT label, dim, count(*)::BIGINT AS n,
                     sum(v::DECIMAL(27,12))::DECIMAL(38,12) AS s
              FROM vd GROUP BY label, dim),
       cent AS (SELECT label, dim,
                       round(CAST(s AS DOUBLE) / n, 12) AS c
                FROM pd),
       nrm AS (SELECT label,
                      sum(round(c * c, 12)::DECIMAL(25,12)) AS n2
               FROM cent GROUP BY label),
       dots AS (SELECT a.label AS label_a, b.label AS label_b,
                       sum(round(a.c * b.c, 12)::DECIMAL(25,12)) AS dot
                FROM cent a JOIN cent b ON a.dim = b.dim
                                        AND a.label < b.label
                GROUP BY a.label, b.label)
       SELECT d.label_a, d.label_b,
              round(CAST(d.dot AS DOUBLE)
                    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)),
                    6) AS cos_sim
       FROM dots d
       JOIN nrm na ON na.label = d.label_a
       JOIN nrm nb ON nb.label = d.label_b""",
    doc="Pairwise cosine similarity between per-label embedding "
    "centroids — the class-separability diagnostic that complements "
    "eval_cluster_davies_bouldin (high inter-centroid cosine = classes "
    "whose mean directions collide, the retrieval/classification "
    "failure eval_embedding_isotropy's anisotropy score predicts). "
    "Per-(label, dim) first moments accumulate as exact DECIMAL sums "
    "over the posexplode stream (the isotropy discipline: map-side "
    "combinable, label x dim = 640 bounded groups); each centroid "
    "coordinate rounds to 12 dp before the pairwise products, which "
    "re-accumulate as DECIMAL so both engines sum identical terms. "
    "Scale shape: one N x d explode into a 640-group aggregate, then "
    "all joins run on the label/dim DOMAIN tables (<=45 pairs) — the "
    "N-row stream is touched exactly once.",
)
def q_eval_label_centroid_sim(spark: SparkSession, sf: str):
    vd = table(spark, sf, "embeddings").select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    )
    pd_ = vd.groupBy("label", "dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(27,12)")).cast("decimal(38,12)").alias("s"),
    )
    cent = pd_.select(
        "label", "dim", F.round(F.col("s").cast("double") / F.col("n"), 12).alias("c")
    ).transform(ckpt)  # 640 rows; feeds norms + pair branches
    nrm = cent.groupBy("label").agg(
        F.sum(F.round(F.col("c") * F.col("c"), 12).cast("decimal(25,12)")).alias("n2")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                F.round(F.col("ca") * F.col("cb"), 12).cast("decimal(25,12)")
            ).alias("dot")
        )
    )
    na = nrm.select(F.col("label").alias("label_a"), F.col("n2").alias("n2a"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("n2").alias("n2b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double")),
                6,
            ).alias("cos_sim"),
        )
    )


@register(
    "eval_pinball_loss",
    f"""WITH e AS (
         SELECT event_id, event_type,
                round(value * 100)::BIGINT AS cents,
                {md5_hash64_sql("'pin:' || event_id::VARCHAR")} % 4 AS split
         FROM events),
       tr AS (SELECT event_type, cents, event_id FROM e WHERE split <= 2),
       sized AS (SELECT event_type, count(*)::BIGINT AS n_train
                 FROM tr GROUP BY event_type),
       ranked AS (
         SELECT event_type, cents,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS r
         FROM tr),
       qs AS (
         SELECT s.event_type, s.n_train,
                min(CASE WHEN r.r >= ceil(0.5 * s.n_train)
                         THEN r.cents END)::BIGINT AS q50,
                min(CASE WHEN r.r >= ceil(0.9 * s.n_train)
                         THEN r.cents END)::BIGINT AS q90
         FROM sized s JOIN ranked r ON s.event_type = r.event_type
         GROUP BY s.event_type, s.n_train),
       t AS (SELECT e.event_type, q.n_train, e.cents, q.q50, q.q90
             FROM e JOIN qs q USING (event_type) WHERE e.split = 3)
       SELECT event_type, n_train, count(*)::BIGINT AS n_test,
              max(q50)::BIGINT AS q50_cents,
              max(q90)::BIGINT AS q90_cents,
              round(sum(5 * abs(cents - q50))::BIGINT
                    / (10.0 * count(*)), 4) AS pinball50,
              round(sum(CASE WHEN cents >= q90 THEN 9 * (cents - q90)
                             ELSE (q90 - cents) END)::BIGINT
                    / (10.0 * count(*)), 4) AS pinball90
       FROM t GROUP BY event_type, n_train""",
    doc="Pinball (quantile) loss evaluation of per-event-type quantile "
    "forecasts: a 75/25 hash split (md5('pin:'||event_id)), the "
    "'forecaster' is the exact train-split p50/p90 (the "
    "quantile_disc_certified rank-ceil(q n) order statistic via "
    "PARTITIONED rank windows — 5 bounded groups), scored on the test "
    "split with the loss that quantile regression optimizes: "
    "L_q(y, yhat) = q (y - yhat) if y >= yhat else (1-q)(yhat - y). "
    "Pinball loss is the proper scoring rule for quantiles — the "
    "companion eval to eval_conformal_coverage (coverage says the "
    "interval is wide enough; pinball says the quantile is SHARP). "
    "EXACT integer core: 10x the per-row loss is an integer (5|d| for "
    "p50, 9d+ or 1d- for p90), summed as BIGINT, divided once. Scale "
    "shape: one train scan into the partitioned rank window, one "
    "5-row quantile broadcast onto the test scan, one scan-fused "
    "5-group loss aggregate.",
)
def q_eval_pinball_loss(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    e = events_table(spark, sf).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            md5_hash64(F.concat(F.lit("pin:"), F.col("event_id").cast("string")))
            % 4
        ).alias("split"),
    )
    tr = e.filter(F.col("split") <= 2).select("event_type", "cents", "event_id")
    sized = tr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_train")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = tr.withColumn("r", F.row_number().over(w))
    qs = (
        ranked.join(F.broadcast(sized), "event_type")
        .groupBy("event_type", "n_train")
        .agg(
            F.min(
                F.when(
                    F.col("r") >= F.ceil(0.5 * F.col("n_train")), F.col("cents")
                )
            )
            .cast("long")
            .alias("q50"),
            F.min(
                F.when(
                    F.col("r") >= F.ceil(0.9 * F.col("n_train")), F.col("cents")
                )
            )
            .cast("long")
            .alias("q90"),
        )
    )
    t = e.filter(F.col("split") == 3).join(F.broadcast(qs), "event_type")
    l50 = 5 * F.abs(F.col("cents") - F.col("q50"))
    l90 = F.when(
        F.col("cents") >= F.col("q90"), 9 * (F.col("cents") - F.col("q90"))
    ).otherwise(F.col("q90") - F.col("cents"))
    return t.groupBy("event_type", "n_train").agg(
        F.count("*").cast("long").alias("n_test"),
        F.max("q50").cast("long").alias("q50_cents"),
        F.max("q90").cast("long").alias("q90_cents"),
        F.round(F.sum(l50).cast("long") / (10.0 * F.count("*")), 4).alias(
            "pinball50"
        ),
        F.round(F.sum(l90).cast("long") / (10.0 * F.count("*")), 4).alias(
            "pinball90"
        ),
    )


@register(
    "eval_cohens_kappa",
    f"""WITH pred AS (SELECT * FROM ({_oracle('text_lang_id')}) t),
       cm AS (
         SELECT labeled_lang, predicted_lang, count(*)::BIGINT AS n
         FROM pred GROUP BY labeled_lang, predicted_lang),
       tot AS (SELECT sum(n)::BIGINT AS n,
                      sum(CASE WHEN labeled_lang = predicted_lang
                               THEN n ELSE 0 END)::BIGINT AS agree
               FROM cm),
       rt AS (SELECT labeled_lang AS lang, sum(n)::BIGINT AS r FROM cm
              GROUP BY labeled_lang),
       ct AS (SELECT predicted_lang AS lang, sum(n)::BIGINT AS c FROM cm
              GROUP BY predicted_lang),
       pe AS (SELECT sum(rt.r::DECIMAL(38,0) * ct.c)::DECIMAL(38,0) AS pe_num
              FROM rt JOIN ct USING (lang))
       SELECT t.n, t.agree,
              round(CAST(t.agree AS DOUBLE) / t.n, 6) AS po,
              round(CAST(p.pe_num AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n), 6)
                AS pe,
              round((CAST(t.n AS DOUBLE) * t.agree - CAST(p.pe_num AS DOUBLE))
                    / (CAST(t.n AS DOUBLE) * t.n - CAST(p.pe_num AS DOUBLE)),
                    6) AS kappa
       FROM tot t, pe p""",
    doc="Cohen's kappa of the language-ID heuristic against the labeled "
    "corpus — chance-corrected agreement, the metric an ANNOTATION "
    "pipeline publishes about its annotators (the reference engine's "
    "whole domain: its MedCAT/GATE services emit annotations whose "
    "agreement against gold labels is exactly this statistic; "
    "eval_langid_confusion gives per-class P/R/F1, kappa gives the one "
    "chance-robust scalar). EXACT integer core: kappa = (N·agree - "
    "Σ r_i c_i) / (N² - Σ r_i c_i) — the marginal cross products "
    "accumulate as DECIMAL, the final division is one shared IEEE "
    "expression. Scale shape: one certified-projection scan into the "
    "categories² confusion matrix; everything after is domain-table "
    "arithmetic.",
)
def q_eval_cohens_kappa(spark: SparkSession, sf: str):
    pred = REGISTRY["text_lang_id"].spark(spark, sf)
    cm = (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").cast("long").alias("n"))
        .transform(ckpt)  # categories^2 rows; feeds 3 branches
    )
    tot = cm.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("labeled_lang") == F.col("predicted_lang"), F.col("n")
            ).otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    rt = cm.groupBy(F.col("labeled_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("r")
    )
    ct = cm.groupBy(F.col("predicted_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("c")
    )
    pe = (
        rt.join(F.broadcast(ct), "lang")
        .agg(
            F.sum(F.col("r").cast("decimal(38,0)") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("pe_num")
        )
    )
    nd = F.col("n").cast("double")
    pn = F.col("pe_num").cast("double")
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "agree",
        F.round(F.col("agree").cast("double") / F.col("n"), 6).alias("po"),
        F.round(pn / (nd * F.col("n")), 6).alias("pe"),
        F.round(
            (nd * F.col("agree") - pn) / (nd * F.col("n") - pn), 6
        ).alias("kappa"),
    )


@register(
    "eval_mcc_langid",
    f"""WITH pred AS (SELECT * FROM ({_oracle('text_lang_id')}) t),
       b AS (SELECT (labeled_lang = 'en')::INT AS y,
                    (predicted_lang = 'en')::INT AS yh
             FROM pred),
       m AS (SELECT
               sum(CASE WHEN y = 1 AND yh = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
               sum(CASE WHEN y = 0 AND yh = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
               sum(CASE WHEN y = 0 AND yh = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
               sum(CASE WHEN y = 1 AND yh = 0 THEN 1 ELSE 0 END)::BIGINT AS fn
             FROM b)
       SELECT tp, tn, fp, fn,
              round(CASE WHEN (tp + fp) * (tp + fn) = 0
                           OR (tn + fp) * (tn + fn) = 0 THEN 0.0
                    ELSE (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                         / sqrt((CAST(tp AS DOUBLE) + fp) * (tp + fn))
                         / sqrt((CAST(tn AS DOUBLE) + fp) * (tn + fn)) END,
                    6) AS mcc
       FROM m""",
    doc="Matthews correlation coefficient of the language-ID heuristic "
    "binarized to the dominant class (en vs not) — the single "
    "imbalance-robust scalar for a binary gate (accuracy and even F1 "
    "mislead under class imbalance; MCC is the binary-confusion phi "
    "coefficient and only rewards getting BOTH classes right). "
    "Completes the agreement family next to eval_cohens_kappa "
    "(chance-corrected multiclass) and eval_langid_confusion "
    "(per-class P/R/F1). EXACT integer core — TP/TN/FP/FN from one "
    "scan-fused conditional aggregate; the two-sqrt factoring keeps "
    "the product inside double range at any corpus size. Scale shape: "
    "one certified-projection scan, 1-row arithmetic.",
)
def q_eval_mcc_langid(spark: SparkSession, sf: str):
    pred = REGISTRY["text_lang_id"].spark(spark, sf)
    y = (F.col("labeled_lang") == "en").cast("int")
    yh = (F.col("predicted_lang") == "en").cast("int")
    m = pred.select(y.alias("y"), yh.alias("yh")).agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("yh") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yh") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yh") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yh") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
    )
    tp, tn, fp, fn = (F.col(x) for x in ("tp", "tn", "fp", "fn"))
    mcc = (tp.cast("double") * tn - fp.cast("double") * fn) / F.sqrt(
        (tp.cast("double") + fp) * (tp + fn)
    ) / F.sqrt((tn.cast("double") + fp) * (tn + fn))
    degenerate = ((tp + fp) * (tp + fn) == 0) | ((tn + fp) * (tn + fn) == 0)
    return m.select(
        "tp",
        "tn",
        "fp",
        "fn",
        F.round(F.when(degenerate, F.lit(0.0)).otherwise(mcc), 6).alias("mcc"),
    )


# --- round-10: paired model comparison + dedup coverage estimation ----------

_CHI2_CRIT_1DF = 3.841  # 5% critical value, chi-square with 1 df


@register(
    "eval_mcnemar_models",
    f"""WITH pred AS (SELECT * FROM ({{langid}}) t),
       maj AS (
         SELECT labeled_lang AS m FROM pred
         GROUP BY labeled_lang
         ORDER BY count(*) DESC, labeled_lang LIMIT 1),
       pairs AS (
         SELECT (predicted_lang = labeled_lang) AS a_ok,
                (labeled_lang = maj.m) AS b_ok
         FROM pred, maj),
       m AS (SELECT count(*)::BIGINT AS n_docs,
                    sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                      ::BIGINT AS b,
                    sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
                      ::BIGINT AS c
             FROM pairs)
       SELECT n_docs, b AS only_a_correct, c AS only_b_correct,
              CASE WHEN b + c = 0 THEN 0.0
                   ELSE round((abs(b - c) - 1.0) * (abs(b - c) - 1.0)
                              / (b + c), 4) END AS mcnemar_chi2,
              CASE WHEN b + c = 0 THEN 0.0
                   ELSE round((abs(b - c) - 1.0) * (abs(b - c) - 1.0)
                              / (b + c), 4) END > {_CHI2_CRIT_1DF}
                AS models_differ
       FROM m""",
    doc="McNemar's paired test between two language-ID models on the SAME "
    "documents — model A = the n-gram langid heuristic (text_lang_id), "
    "model B = the majority-class baseline (predict the corpus-majority "
    "label everywhere; count-desc, label-asc tiebreak). The PAIRED "
    "design is the point: only the b/c discordant cells (exactly one "
    "model right) carry information, so McNemar detects a real accuracy "
    "difference with far fewer documents than comparing two independent "
    "accuracy estimates — the standard before/after gate for swapping a "
    "quality classifier on the same eval set. Continuity-corrected "
    "chi-square (|b-c|-1)^2/(b+c), guarded at b+c=0, EXACT integer "
    "cells, flag from the ROUNDED stat vs chi-square(1) 5% = "
    f"{_CHI2_CRIT_1DF}. Scale shape: one certified-projection scan, a "
    "1-row majority broadcast, 1-row arithmetic.",
)
def q_eval_mcnemar(spark: SparkSession, sf: str):
    pred = REGISTRY["text_lang_id"].spark(spark, sf)
    maj = (
        pred.groupBy("labeled_lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("labeled_lang").asc())
        .limit(1)
        .select(F.col("labeled_lang").alias("m"))
    )
    pairs = pred.crossJoin(F.broadcast(maj)).select(
        (F.col("predicted_lang") == F.col("labeled_lang")).alias("a_ok"),
        (F.col("labeled_lang") == F.col("m")).alias("b_ok"),
    )
    m = pairs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("a_ok") & ~F.col("b_ok"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("a_ok") & F.col("b_ok"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    b, c = F.col("b"), F.col("c")
    chi2 = F.when(b + c == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c),
            4,
        )
    )
    return m.select(
        "n_docs",
        b.alias("only_a_correct"),
        c.alias("only_b_correct"),
        chi2.alias("mcnemar_chi2"),
        (chi2 > F.lit(_CHI2_CRIT_1DF)).alias("models_differ"),
    )


_REG_MC = REGISTRY["eval_mcnemar_models"]
_REG_MC.oracle = _REG_MC.oracle.format(langid=_oracle("text_lang_id"))


@register(
    "eval_dup_capture_recapture",
    f"""WITH p1 AS (SELECT doc_a, doc_b FROM ({{lsh}}) t1),
       p2 AS (SELECT doc_a, doc_b FROM ({{simhash}}) t2),
       s AS (SELECT
               (SELECT count(*) FROM p1)::BIGINT AS n1,
               (SELECT count(*) FROM p2)::BIGINT AS n2,
               (SELECT count(*) FROM p1 JOIN p2 USING (doc_a, doc_b))
                 ::BIGINT AS m)
       SELECT n1 AS n_lsh, n2 AS n_simhash, m AS n_both,
              round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2)
                AS est_total_pairs,
              round((n1 + n2 - m)
                    / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0), 6)
                AS union_coverage
       FROM s""",
    doc="Capture-recapture (Chapman's bias-corrected Lincoln-Petersen) "
    "estimate of the TRUE near-duplicate pair count from two dedup "
    "detectors run on the same corpus — capture 1 = MinHash-LSH banded "
    "candidates, capture 2 = SimHash Hamming pairs. The overlap m "
    "between the two 'samples' estimates what BOTH miss: "
    "N_hat = (n1+1)(n2+1)/(m+1) - 1, union_coverage = |P1 u P2|/N_hat "
    "— the dedup-recall health number a pipeline tracks without any "
    "labeled ground truth (the detectors share signal, so N_hat is a "
    "LOWER bound on missed pairs — documented heuristic, standard in "
    "ecology and dedup audits alike). EXACT integer counts via one "
    "equi-join on the pair key; Chapman's +1s keep it finite at m=0. "
    "Scale shape: two certified banded/bucketed pair tiers (never "
    "all-pairs), one pair-key equi-join, 1-row arithmetic.",
)
def q_eval_capture_recapture(spark: SparkSession, sf: str):
    # each pair set feeds its own count AND the overlap join — checkpoint
    # once so the banded/bucketed tiers don't re-scan the corpus per use.
    # The two materializations are INDEPENDENT jobs (different detectors,
    # different lineages): submit both concurrently so the SimHash pass
    # back-fills the LSH pass's straggler tail (guide §2.6,
    # catalog.run_concurrently) instead of waiting for it; rows are
    # identical to the sequential form.
    p1_lazy = REGISTRY["minhash_lsh_pairs"].spark(spark, sf).select(
        "doc_a", "doc_b"
    )
    p2_lazy = REGISTRY["simhash_near_dup_pairs"].spark(spark, sf).select(
        "doc_a", "doc_b"
    )
    p1, p2 = run_concurrently(
        lambda: p1_lazy.transform(ckpt),
        lambda: p2_lazy.transform(ckpt),
    )
    n1 = p1.agg(F.count("*").cast("long").alias("n1"))
    n2 = p2.agg(F.count("*").cast("long").alias("n2"))
    m = p1.join(p2, ["doc_a", "doc_b"]).agg(F.count("*").cast("long").alias("m"))
    s = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    nhat = (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0
    return s.select(
        F.col("n1").alias("n_lsh"),
        F.col("n2").alias("n_simhash"),
        F.col("m").alias("n_both"),
        F.round(nhat, 2).alias("est_total_pairs"),
        F.round((F.col("n1") + F.col("n2") - F.col("m")) / nhat, 6).alias(
            "union_coverage"
        ),
    )


_REG_CR = REGISTRY["eval_dup_capture_recapture"]
_REG_CR.oracle = _REG_CR.oracle.format(
    lsh=_oracle("minhash_lsh_pairs"), simhash=_oracle("simhash_near_dup_pairs")
)


# --- round-11: scalar calibration metrics (ECE / MCE) --------------------------

_ECE_GROSS_BP = 500.0  # "grossly miscalibrated" gate, basis points


@register(
    "eval_ece_mce",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000)::BIGINT AS conf_bp,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS correct
         FROM embeddings),
       b AS (
         SELECT conf_bp // 1000 AS bin,
                count(*)::BIGINT AS n,
                sum(conf_bp)::BIGINT AS sc,
                sum(correct)::BIGINT AS nc
         FROM p GROUP BY 1)
       SELECT sum(n)::BIGINT AS n_total,
              count(*)::BIGINT AS n_bins,
              round(sum(abs(sc - 10000 * nc)) * 1.0 / sum(n), 4) AS ece_bp,
              round(max(abs(sc * 1.0 / n - 10000.0 * nc / n)), 4) AS mce_bp,
              sum(abs(sc - 10000 * nc)) * 1.0 / sum(n) >= {_ECE_GROSS_BP!r}
                AS grossly_miscalibrated
       FROM b""",
    doc="Expected / Maximum Calibration Error — the two scalars every "
    "model card quotes, over the same deterministic synthetic "
    "prediction stream as eval_calibration_bins (outcome probability "
    "pinned at 0.9*conf + 0.05, so true ECE is ~250 bp): ECE = "
    "sum_b n_b*|conf-acc|/N computed as EXACT INTEGERS "
    "(n_b*|mean_conf - acc| telescopes to |sum_conf - 10000*n_correct| "
    "in basis points — zero per-bin divisions) until one final "
    "division; MCE is the max per-bin gap. Where calibration_bins "
    "shows the diagram, this is the headline number with a pinned "
    "gross-miscalibration gate far from the expected value. Scale "
    "shape: one scan-fused map-side-combinable 10-group aggregate "
    "then a 10-row reduce — flat at any prediction-set size.",
)
def q_eval_ece_mce(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("conf_bp"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("correct"),
    )
    b = p.groupBy(
        F.floor(F.col("conf_bp") / 1000).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conf_bp").cast("long").alias("sc"),
        F.sum("correct").cast("long").alias("nc"),
    )
    ece = F.sum(F.abs(F.col("sc") - 10000 * F.col("nc"))) * 1.0 / F.sum("n")
    return b.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(ece, 4).alias("ece_bp"),
        F.round(
            F.max(
                F.abs(
                    F.col("sc") * 1.0 / F.col("n")
                    - 10000.0 * F.col("nc") / F.col("n")
                )
            ),
            4,
        ).alias("mce_bp"),
        (ece >= F.lit(_ECE_GROSS_BP)).alias("grossly_miscalibrated"),
    )


# --- round-11: Brier score decomposition ---------------------------------------


@register(
    "eval_brier_decomposition",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000)::BIGINT AS conf_bp,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS correct
         FROM embeddings),
       b AS (
         SELECT conf_bp // 1000 AS bin,
                count(*)::BIGINT AS n,
                sum(conf_bp)::BIGINT AS sc,
                sum(correct)::BIGINT AS nc,
                sum((conf_bp - 10000 * correct)::DECIMAL(38,0)
                    * (conf_bp - 10000 * correct))::DECIMAL(38,0) AS sq
         FROM p GROUP BY 1),
       g AS (SELECT sum(n)::BIGINT AS n_total,
                    sum(nc)::BIGINT AS nc_total,
                    sum(sq)::DECIMAL(38,0) AS sq_total
             FROM b),
       t AS (
         SELECT g.n_total, g.nc_total, g.sq_total,
                sum(round((b.sc - 10000.0 * b.nc)
                          * (b.sc - 10000.0 * b.nc) / (1e8 * b.n), 9)
                    ::DECIMAL(20,9)) AS rel_s,
                sum(round(b.n * (b.nc * 1.0 / b.n
                                 - g.nc_total * 1.0 / g.n_total)
                              * (b.nc * 1.0 / b.n
                                 - g.nc_total * 1.0 / g.n_total), 9)
                    ::DECIMAL(20,9)) AS res_s
         FROM b CROSS JOIN g
         GROUP BY 1, 2, 3)
       SELECT n_total,
              round(CAST(sq_total AS DOUBLE) / (1e8 * n_total), 6) AS brier,
              round(CAST(rel_s AS DOUBLE) / n_total, 6) AS reliability,
              round(CAST(res_s AS DOUBLE) / n_total, 6) AS resolution,
              round((nc_total * 1.0 / n_total)
                    * (1.0 - nc_total * 1.0 / n_total), 6) AS uncertainty,
              round(CAST(sq_total AS DOUBLE) / (1e8 * n_total)
                    - (CAST(rel_s AS DOUBLE) / n_total
                       - CAST(res_s AS DOUBLE) / n_total
                       + (nc_total * 1.0 / n_total)
                         * (1.0 - nc_total * 1.0 / n_total)), 6)
                AS decomp_residual
       FROM t""",
    doc="Murphy decomposition of the Brier score over the deterministic "
    "synthetic prediction stream: BS = reliability - resolution + "
    "uncertainty + residual, where the residual is the exact gap from "
    "binning (within-bin confidence variance MINUS twice the within-bin "
    "confidence-outcome covariance — negative here because conf and "
    "outcome correlate inside bins by construction); reporting it makes "
    "the identity itself an auditable cross-engine check rather than an "
    "assumed-zero. The raw Brier sum is EXACT "
    "integer arithmetic ((conf_bp - 10000*outcome)^2 summed as "
    "DECIMAL(38,0)); reliability/resolution bin terms are 9-dp "
    "DECIMAL(20,9) sums. Tells the modeler WHERE a bad Brier comes "
    "from: miscalibration (reliability) vs weak discrimination (low "
    "resolution). Scale shape: one scan-fused 10-bin aggregate, one "
    "1-row global broadcast back over the 10 bins — flat at any N.",
)
def q_eval_brier_decomposition(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("conf_bp"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("correct"),
    )
    dev = F.col("conf_bp") - 10000 * F.col("correct")
    b = p.groupBy(
        F.floor(F.col("conf_bp") / 1000).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conf_bp").cast("long").alias("sc"),
        F.sum("correct").cast("long").alias("nc"),
        F.sum(dev.cast("decimal(38,0)") * dev).cast("decimal(38,0)").alias("sq"),
    )
    g = b.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("nc").cast("long").alias("nc_total"),
        F.sum("sq").cast("decimal(38,0)").alias("sq_total"),
    )
    acc_gap = F.col("nc") * 1.0 / F.col("n") - F.col("nc_total") * 1.0 / F.col(
        "n_total"
    )
    t = (
        b.crossJoin(F.broadcast(g))
        .groupBy("n_total", "nc_total", "sq_total")
        .agg(
            F.sum(
                F.round(
                    (F.col("sc") - 10000.0 * F.col("nc"))
                    * (F.col("sc") - 10000.0 * F.col("nc"))
                    / (1e8 * F.col("n")),
                    9,
                ).cast("decimal(20,9)")
            ).alias("rel_s"),
            F.sum(
                F.round(F.col("n") * acc_gap * acc_gap, 9).cast("decimal(20,9)")
            ).alias("res_s"),
        )
    )
    n = F.col("n_total")
    brier = F.col("sq_total").cast("double") / (1e8 * n)
    rel = F.col("rel_s").cast("double") / n
    res = F.col("res_s").cast("double") / n
    acc = F.col("nc_total") * 1.0 / n
    unc = acc * (1.0 - acc)
    return t.select(
        "n_total",
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - (rel - res + unc), 6).alias("decomp_residual"),
    )


# --- round-11: cumulative gains / lift curve ------------------------------------


@register(
    "eval_lift_gains_curve",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000)::BIGINT AS conf_bp,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS correct
         FROM embeddings),
       b AS (
         SELECT conf_bp // 1000 AS bucket,
                count(*)::BIGINT AS n,
                sum(correct)::BIGINT AS n_pos
         FROM p GROUP BY 1),
       c AS (
         SELECT bucket,
                sum(n) OVER w AS cum_n,
                sum(n_pos) OVER w AS cum_pos,
                sum(n) OVER () AS n_total,
                sum(n_pos) OVER () AS pos_total
         FROM b WINDOW w AS (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING))
       SELECT (bucket * 1000)::BIGINT AS threshold_bp,
              cum_n::BIGINT AS n_targeted,
              cum_pos::BIGINT AS n_captured,
              round(cum_n * 1.0 / n_total, 6) AS coverage,
              round(cum_pos * 1.0 / pos_total, 6) AS capture_rate,
              round((cum_pos * 1.0 / cum_n)
                    / (pos_total * 1.0 / n_total), 4) AS lift
       FROM c""",
    doc="Cumulative gains / lift table over the deterministic synthetic "
    "prediction stream: for each score threshold (decile cutoffs "
    "9000..0 bp), how many rows a campaign targeting conf >= t "
    "touches, what fraction of all positives it captures, and the "
    "lift over random targeting — the curve every targeting / "
    "routing / filtering decision is costed against (distinct from "
    "calibration_bins: CUMULATIVE capture vs coverage, not per-bin "
    "accuracy, and from auc_roc: actionable threshold economics, not "
    "a rank scalar). All counts stay integers; three divisions per "
    "output row, each rounded once. Scale shape: one scan-fused "
    "10-group aggregate, then every window runs over the bounded "
    "10-row bucket domain — flat at any prediction-set size.",
)
def q_eval_lift_gains_curve(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("conf_bp"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("correct"),
    )
    b = p.groupBy(
        F.floor(F.col("conf_bp") / 1000).cast("long").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("correct").cast("long").alias("n_pos"),
    )
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        "bucket",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n").over(w_all).alias("n_total"),
        F.sum("n_pos").over(w_all).alias("pos_total"),
    )
    return c.select(
        (F.col("bucket") * 1000).cast("long").alias("threshold_bp"),
        F.col("cum_n").cast("long").alias("n_targeted"),
        F.col("cum_pos").cast("long").alias("n_captured"),
        F.round(F.col("cum_n") * 1.0 / F.col("n_total"), 6).alias("coverage"),
        F.round(F.col("cum_pos") * 1.0 / F.col("pos_total"), 6).alias(
            "capture_rate"
        ),
        F.round(
            (F.col("cum_pos") * 1.0 / F.col("cum_n"))
            / (F.col("pos_total") * 1.0 / F.col("n_total")),
            4,
        ).alias("lift"),
    )


# --- round-11: quadratic-weighted kappa (ordinal raters) ----------------------

_WK_NOISE_HASH = "('0x' || substr(md5('wk:' || vec_id::VARCHAR), 1, 15))::BIGINT"
_WK_K = 5  # ordinal grades 0..4


@register(
    "eval_weighted_kappa",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000) // 2000 AS a,
                least(greatest(
                  ({_CONF_HASH} % 10000) // 2000
                  + CASE WHEN ({_WK_NOISE_HASH} % 10) < 6 THEN 0
                         WHEN ({_WK_NOISE_HASH} % 10) < 8 THEN 1
                         ELSE -1 END, 0), {_WK_K - 1}) AS b
         FROM embeddings),
       o AS (SELECT a, b, count(*)::BIGINT AS n FROM p GROUP BY 1, 2),
       ma AS (SELECT a, sum(n)::BIGINT AS na FROM o GROUP BY a),
       mb AS (SELECT b, sum(n)::BIGINT AS nb FROM o GROUP BY b),
       tot AS (SELECT sum(n)::BIGINT AS nt FROM o),
       num AS (SELECT sum((a - b) * (a - b) * n)::BIGINT AS wo FROM o),
       den AS (SELECT sum((ma.a - mb.b) * (ma.a - mb.b)
                          * ma.na::DECIMAL(38,0) * mb.nb)::DECIMAL(38,0)
                 AS we_scaled
               FROM ma CROSS JOIN mb)
       SELECT tot.nt AS n_items,
              num.wo AS disagreement_weighted,
              round(CAST(den.we_scaled AS DOUBLE) / tot.nt, 4)
                AS expected_weighted,
              round(1.0 - num.wo * CAST(tot.nt AS DOUBLE)
                          / CAST(den.we_scaled AS DOUBLE), 6)
                AS weighted_kappa
       FROM tot CROSS JOIN num CROSS JOIN den""",
    doc="Quadratic-weighted Cohen's kappa between two deterministic "
    "synthetic ORDINAL raters (grades 0..4; rater B = rater A "
    "hash-perturbed +-1 with pinned 60/20/20 odds, clamped): kappa_w "
    "= 1 - sum(w_ij O_ij) / sum(w_ij E_ij) with w_ij = (i-j)^2 — the "
    "partial-credit agreement scalar ordinal label audits need where "
    "eval_cohens_kappa's 0/1 disagreement over-penalizes near-miss "
    "grades. The (i-j)^2 weights keep BOTH sums exact integers "
    "(observed directly; expected as the marginal outer product "
    "scaled by n, divided once at the end) — zero per-cell floats. "
    "Scale shape: one scan-fused 25-cell aggregate, marginals from "
    "the cells, a 5x5 domain cross for the expected sum — flat at "
    "any prediction-set size.",
)
def q_eval_weighted_kappa(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    noise = md5_hash64(
        F.concat(F.lit("wk:"), F.col("vec_id").cast("string"))
    ) % 10
    a = F.floor(conf / 2000).cast("long")
    shift = (
        F.when(noise < 6, 0).when(noise < 8, 1).otherwise(-1)
    )
    p = table(spark, sf, "embeddings").select(
        a.alias("a"),
        F.least(
            F.greatest(a + shift, F.lit(0)), F.lit(_WK_K - 1)
        ).cast("long").alias("b"),
    )
    o = p.groupBy("a", "b").agg(F.count("*").cast("long").alias("n"))
    o = o.transform(ckpt)  # 25 cells; feeds marginals + sums
    ma = o.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    mb = o.groupBy("b").agg(F.sum("n").cast("long").alias("nb"))
    tot = o.agg(F.sum("n").cast("long").alias("nt"))
    num = o.agg(
        F.sum((F.col("a") - F.col("b")) * (F.col("a") - F.col("b")) * F.col("n"))
        .cast("long")
        .alias("wo")
    )
    den = ma.crossJoin(F.broadcast(mb)).agg(
        F.sum(
            (F.col("a") - F.col("b"))
            * (F.col("a") - F.col("b"))
            * F.col("na").cast("decimal(38,0)")
            * F.col("nb")
        )
        .cast("decimal(38,0)")
        .alias("we_scaled")
    )
    return (
        tot.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("nt").alias("n_items"),
            F.col("wo").alias("disagreement_weighted"),
            F.round(
                F.col("we_scaled").cast("double") / F.col("nt"), 4
            ).alias("expected_weighted"),
            F.round(
                1.0
                - F.col("wo")
                * F.col("nt").cast("double")
                / F.col("we_scaled").cast("double"),
                6,
            ).alias("weighted_kappa"),
        )
    )


# --- round-11: mean average precision of the bucketed ANN ----------------------


@register(
    "eval_ann_map",
    f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       sc AS (SELECT q.q_id, c.vec_id,
                     round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                                * sqrt(list_dot_product(c.e, c.e)) > 0
                           THEN list_dot_product(q.qe, c.e)
                                / (sqrt(list_dot_product(q.qe, q.qe))
                                   * sqrt(list_dot_product(c.e, c.e)))
                           ELSE 0.0 END, 6) AS cos
              FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       truth AS (SELECT q_id, vec_id FROM (
                   SELECT q_id, vec_id,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cos DESC, vec_id) AS rn
                   FROM sc) WHERE rn <= 10),
       bk AS (SELECT vec_id, e, {_SB} AS bucket FROM b),
       qb AS (SELECT k.vec_id AS q_id, k.e AS qe, k.bucket FROM bk k
              WHERE k.vec_id % 101 = 0 AND k.vec_id < 2000),
       cand AS (SELECT q.q_id, c.vec_id,
                       round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                                  * sqrt(list_dot_product(c.e, c.e)) > 0
                             THEN list_dot_product(q.qe, c.e)
                                  / (sqrt(list_dot_product(q.qe, q.qe))
                                     * sqrt(list_dot_product(c.e, c.e)))
                             ELSE 0.0 END, 6) AS cos
                FROM bk c JOIN qb q ON c.bucket = q.bucket
                WHERE c.vec_id <> q.q_id),
       pred AS (SELECT q_id, vec_id, rn FROM (
                  SELECT q_id, vec_id,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY cos DESC, vec_id) AS rn
                  FROM cand) WHERE rn <= 10),
       hits AS (SELECT p.q_id, p.rn,
                       CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END
                         AS hit
                FROM pred p LEFT JOIN truth t
                  ON t.q_id = p.q_id AND t.vec_id = p.vec_id),
       prec AS (SELECT q_id, rn, hit,
                       sum(hit) OVER (PARTITION BY q_id ORDER BY rn
                                      ROWS UNBOUNDED PRECEDING) AS cum
                FROM hits),
       ap AS (SELECT q_id,
                     sum(round(CASE WHEN hit = 1
                               THEN cum * 1.0 / rn ELSE 0 END, 9)
                         ::DECIMAL(20,9)) / 10 AS ap
              FROM prec GROUP BY q_id),
       nq AS (SELECT count(*)::BIGINT AS n_queries FROM q0)
       SELECT nq.n_queries,
              round(CAST(sum(ap.ap) AS DOUBLE) / nq.n_queries, 6)
                AS map_at_10
       FROM ap CROSS JOIN nq GROUP BY nq.n_queries""",
    doc="Mean Average Precision @10 of the bucketed ANN against exact "
    "brute-force truth: AP rewards putting the hits EARLY in the "
    "ranked list (precision-at-each-hit averaged over the 10 "
    "relevant items), completing the retrieval-metric triad — "
    "recall@k (set coverage), NDCG (graded position discount), MRR "
    "(first hit only); MAP is the binary-relevance ranking summary "
    "IR evaluations default to. Per-rank precision terms round to "
    "9 dp and sum as DECIMAL per query, one rounded global mean. "
    "Scale shape: the certified ANN shapes (ABSOLUTE-size query "
    "batch; bucket equi-join candidate side), hit flags via one "
    "left join, per-query rank windows partitioned by q_id.",
)
def q_eval_ann_map(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.operators.similarity import (
        brute_force_topk,
        bucketed_topk,
    )

    emb = table(spark, sf, "embeddings")
    qs = emb.filter(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000)
    ).transform(ckpt)
    nq = qs.agg(F.count("*").cast("long").alias("n_queries"))
    truth = brute_force_topk(emb, qs, k=10).select("q_id", "vec_id")
    pred = bucketed_topk(emb, qs, k=10, n_bits=8).select(
        "q_id", "vec_id", F.col("rank").alias("rn")
    )
    hits = pred.join(
        truth.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "left"
    ).select("q_id", "rn", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    w = (
        Window.partitionBy("q_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prec = hits.select(
        "q_id", "rn", "hit", F.sum("hit").over(w).alias("cum")
    )
    ap = prec.groupBy("q_id").agg(
        (
            F.sum(
                F.round(
                    F.when(
                        F.col("hit") == 1, F.col("cum") * 1.0 / F.col("rn")
                    ).otherwise(0.0),
                    9,
                ).cast("decimal(20,9)")
            )
            / 10
        ).alias("ap")
    )
    return (
        ap.crossJoin(F.broadcast(nq))
        .groupBy("n_queries")
        .agg(
            F.round(
                F.sum("ap").cast("double") / F.col("n_queries"), 6
            ).alias("map_at_10")
        )
        .select("n_queries", "map_at_10")
    )


# --- round-12 head start: sliced calibration audit -----------------------------


@register(
    "eval_sliced_calibration",
    f"""WITH p AS (
         SELECT label,
                ({_CONF_HASH} % 10000)::BIGINT AS conf_bp,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS correct
         FROM embeddings),
       b AS (
         SELECT label, conf_bp // 1000 AS bin,
                count(*)::BIGINT AS n,
                sum(conf_bp)::BIGINT AS sc,
                sum(correct)::BIGINT AS nc
         FROM p GROUP BY 1, 2),
       s AS (
         SELECT label, sum(n)::BIGINT AS n_total,
                round(sum(abs(sc - 10000 * nc)) * 1.0 / sum(n), 4) AS ece_bp
         FROM b GROUP BY label),
       d AS (SELECT max(ece_bp) - min(ece_bp) AS disparity FROM s)
       SELECT s.label::BIGINT AS label, s.n_total, s.ece_bp,
              round(d.disparity, 4) AS ece_disparity_bp,
              round(d.disparity, 4) > 100.0 AS disparate_slices
       FROM s CROSS JOIN d""",
    doc="Sliced calibration audit: ECE computed PER LABEL SLICE over the "
    "deterministic synthetic prediction stream, plus the max-min "
    "disparity across slices — the fairness-style evaluation "
    "discipline (a model can be well-calibrated on average while "
    "badly mis-calibrated on a subgroup; aggregate ECE hides exactly "
    "this). Reuses eval_ece_mce's integer telescoping per slice "
    "(n_b*|conf-acc| = |sum_conf - 10000*n_correct|, zero per-bin "
    "divisions); the disparity gate compares the ROUNDED spread. "
    "Scale shape: one scan-fused (label x 10-bin) aggregate, a "
    "per-label rollup, one 1-row disparity broadcast — flat at any "
    "prediction-set size.",
)
def q_eval_sliced_calibration(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        "label",
        conf.cast("long").alias("conf_bp"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("correct"),
    )
    b = p.groupBy(
        "label", F.floor(F.col("conf_bp") / 1000).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conf_bp").cast("long").alias("sc"),
        F.sum("correct").cast("long").alias("nc"),
    )
    s = b.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_total"),
        F.round(
            F.sum(F.abs(F.col("sc") - 10000 * F.col("nc"))) * 1.0 / F.sum("n"),
            4,
        ).alias("ece_bp"),
    )
    d = s.agg((F.max("ece_bp") - F.min("ece_bp")).alias("disparity"))
    disp = F.round(F.col("disparity"), 4)
    return s.crossJoin(F.broadcast(d)).select(
        F.col("label").cast("long").alias("label"),
        "n_total",
        "ece_bp",
        disp.alias("ece_disparity_bp"),
        (disp > 100.0).alias("disparate_slices"),
    )


# --- round-11 additions --------------------------------------------------------

_FLEISS_RATERS = 3
_FLEISS_CATS = 4


@register(
    "eval_fleiss_kappa",
    f"""WITH r AS (SELECT unnest(range({_FLEISS_RATERS})) AS rater),
       h AS (
         SELECT d.doc_id, r.rater,
                ('0x' || substr(md5(d.doc_id::VARCHAR || ':' ||
                                    r.rater::VARCHAR), 1, 15))::BIGINT AS hv
         FROM documents d CROSS JOIN r),
       lab AS (
         SELECT doc_id, rater,
                CASE WHEN hv % 5 > 0 THEN doc_id % {_FLEISS_CATS}
                     ELSE (hv // 5) % {_FLEISS_CATS} END AS cat
         FROM h),
       cell AS (SELECT doc_id, cat, count(*)::DOUBLE AS nij
                FROM lab GROUP BY doc_id, cat),
       pi AS (SELECT doc_id,
                     (sum(nij * nij) - {_FLEISS_RATERS})
                       / ({_FLEISS_RATERS} * ({_FLEISS_RATERS} - 1.0)) AS p_i
              FROM cell GROUP BY doc_id),
       pj AS (SELECT cat, sum(nij) AS nj FROM cell GROUP BY cat),
       tot AS (SELECT count(*)::BIGINT AS n_items FROM pi),
       pbar AS (SELECT avg(p_i) AS p_bar FROM pi),
       pe AS (SELECT sum(pow(nj / (t.n_items * {_FLEISS_RATERS}.0), 2)) AS p_e
              FROM pj CROSS JOIN tot t)
       SELECT t.n_items, {_FLEISS_RATERS}::BIGINT AS n_raters,
              round(pb.p_bar, 6) AS p_observed,
              round(pe.p_e, 6) AS p_expected,
              round((pb.p_bar - pe.p_e) / (1 - pe.p_e), 6) AS fleiss_kappa
       FROM tot t CROSS JOIN pbar pb CROSS JOIN pe""",
    doc="Fleiss' kappa for multi-rater categorical agreement — the "
    "n-raters generalization completing the agreement triad with "
    "eval_cohens_kappa (2 raters) and eval_weighted_kappa (ordinal "
    "penalties): per-item agreement P_i = (Σ n_ij² − n)/(n(n−1)), "
    "chance agreement P_e = Σ p_j², κ = (P̄−P_e)/(1−P_e). Three "
    "deterministic synthetic raters label every document (md5-hash "
    "ratings biased 80% toward the doc's own class, so agreement is "
    "high but imperfect — the realistic annotation-QA regime). Scale "
    "shape: the rater dimension is a constant-3 broadcast cross, "
    "then two map-side-combinable groupBys (items×cats, cats) and "
    "constant-size arithmetic; no window, no data-sized join.",
)
def q_eval_fleiss_kappa(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    raters = spark.range(_FLEISS_RATERS).select(F.col("id").alias("rater"))
    lab = (
        table(spark, sf, "documents")
        .select("doc_id")
        .crossJoin(F.broadcast(raters))
        .select(
            "doc_id",
            "rater",
            md5_hash64(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("rater").cast("string"),
                )
            ).alias("hv"),
        )
        .select(
            "doc_id",
            F.when(
                F.col("hv") % 5 > 0, F.col("doc_id") % _FLEISS_CATS
            )
            .otherwise(F.expr(f"(hv DIV 5) % {_FLEISS_CATS}"))
            .alias("cat"),
        )
    )
    cell = lab.groupBy("doc_id", "cat").agg(
        F.count("*").cast("double").alias("nij")
    )
    pi = cell.groupBy("doc_id").agg(
        (
            (F.sum(F.col("nij") * F.col("nij")) - _FLEISS_RATERS)
            / (_FLEISS_RATERS * (_FLEISS_RATERS - 1.0))
        ).alias("p_i")
    )
    pi = pi.transform(ckpt)  # feeds count + mean
    pj = cell.groupBy("cat").agg(F.sum("nij").alias("nj"))
    tot = pi.agg(F.count("*").cast("long").alias("n_items"))
    pbar = pi.agg(F.avg("p_i").alias("p_bar"))
    pe = pj.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.pow(F.col("nj") / (F.col("n_items") * float(_FLEISS_RATERS)), 2)
        ).alias("p_e")
    )
    return (
        tot.crossJoin(F.broadcast(pbar))
        .crossJoin(F.broadcast(pe))
        .select(
            "n_items",
            F.lit(_FLEISS_RATERS).cast("long").alias("n_raters"),
            F.round(F.col("p_bar"), 6).alias("p_observed"),
            F.round(F.col("p_e"), 6).alias("p_expected"),
            F.round(
                (F.col("p_bar") - F.col("p_e")) / (1 - F.col("p_e")), 6
            ).alias("fleiss_kappa"),
        )
    )


_RBO_P = 0.9
_RBO_K = 10


@register(
    "eval_rank_biased_overlap",
    f"""WITH b AS (
         SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       q0 AS (SELECT vec_id AS q_id, e AS qe FROM b
              WHERE vec_id % 101 = 0 AND vec_id < 2000),
       sc AS (SELECT q.q_id, c.vec_id,
                     round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                                * sqrt(list_dot_product(c.e, c.e)) > 0
                           THEN list_dot_product(q.qe, c.e)
                                / (sqrt(list_dot_product(q.qe, q.qe))
                                   * sqrt(list_dot_product(c.e, c.e)))
                           ELSE 0.0 END, 6) AS cos
              FROM b c, q0 q WHERE c.vec_id <> q.q_id),
       truth AS (SELECT q_id, vec_id, rn FROM (
                   SELECT q_id, vec_id,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cos DESC, vec_id) AS rn
                   FROM sc) WHERE rn <= {_RBO_K}),
       bk AS (SELECT vec_id, e, {_SB} AS bucket FROM b),
       qb AS (SELECT k.vec_id AS q_id, k.e AS qe, k.bucket FROM bk k
              WHERE k.vec_id % 101 = 0 AND k.vec_id < 2000),
       cand AS (SELECT q.q_id, c.vec_id,
                       round(CASE WHEN sqrt(list_dot_product(q.qe, q.qe))
                                  * sqrt(list_dot_product(c.e, c.e)) > 0
                             THEN list_dot_product(q.qe, c.e)
                                  / (sqrt(list_dot_product(q.qe, q.qe))
                                     * sqrt(list_dot_product(c.e, c.e)))
                             ELSE 0.0 END, 6) AS cos
                FROM bk c JOIN qb q ON c.bucket = q.bucket
                WHERE c.vec_id <> q.q_id),
       pred AS (SELECT q_id, vec_id, rn FROM (
                  SELECT q_id, vec_id,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY cos DESC, vec_id) AS rn
                  FROM cand) WHERE rn <= {_RBO_K}),
       m AS (SELECT p.q_id, greatest(p.rn, t.rn) AS mr
             FROM pred p JOIN truth t
               ON t.q_id = p.q_id AND t.vec_id = p.vec_id),
       depth AS (SELECT unnest(range(1, {_RBO_K} + 1)) AS d),
       xd AS (SELECT q.q_id, depth.d,
                     (SELECT count(*) FROM m
                      WHERE m.q_id = q.q_id AND m.mr <= depth.d)::DOUBLE AS x
              FROM q0 q CROSS JOIN depth),
       rq AS (SELECT q_id,
                     sum(round((1 - {_RBO_P}) * pow({_RBO_P}, d - 1) * x / d,
                               9)::DECIMAL(20,9)) AS rbo_mass
              FROM xd GROUP BY q_id),
       nq AS (SELECT count(*)::BIGINT AS n_queries FROM q0)
       SELECT nq.n_queries,
              round(CAST(sum(rq.rbo_mass) AS DOUBLE) / nq.n_queries, 6)
                AS mean_rbo_at_10
       FROM rq CROSS JOIN nq GROUP BY nq.n_queries""",
    doc="Rank-biased overlap (Webber et al.) between the exact "
    "brute-force cosine ranking and the sign-bucketed ANN ranking, "
    "truncated at k=10 with persistence p=0.9: RBO = (1−p)·Σ_d "
    "p^(d−1)·|A_:d ∩ B_:d|/d — the top-weighted rank-similarity "
    "metric that, unlike recall@k/MAP/NDCG (which score against a "
    "relevance set), compares the two RANKINGS directly and "
    "penalizes disagreement more the nearer it is to rank 1. "
    "Per-depth overlap comes from matched pairs' max(rank_a, "
    "rank_b) <= d, so no prefix materialization; per-depth terms "
    "round to 9 dp and sum as DECIMAL. Scale shape: the certified "
    "ANN shapes (ABSOLUTE-size query batch, bucket equi-join "
    "candidates), one rank join, a constant 10-row depth dimension.",
)
def q_eval_rank_biased_overlap(spark: SparkSession, sf: str):
    from annotations_ingester_spark.operators.similarity import (
        brute_force_topk,
        bucketed_topk,
    )

    emb = table(spark, sf, "embeddings")
    qs = emb.filter(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 2000)
    ).transform(ckpt)
    nq = qs.agg(F.count("*").cast("long").alias("n_queries"))
    truth = brute_force_topk(emb, qs, k=_RBO_K).select(
        "q_id", "vec_id", F.col("rank").alias("rt")
    )
    pred = bucketed_topk(emb, qs, k=_RBO_K, n_bits=8).select(
        "q_id", "vec_id", F.col("rank").alias("rp")
    )
    m = pred.join(truth, ["q_id", "vec_id"]).select(
        "q_id", F.greatest("rp", "rt").alias("mr")
    )
    depth = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    xd = (
        qs.select("vec_id")
        .withColumnRenamed("vec_id", "q_id")
        .crossJoin(F.broadcast(depth))
        .join(m, "q_id", "left")
        .groupBy("q_id", "d")
        .agg(
            F.sum(
                F.when(F.col("mr").isNotNull() & (F.col("mr") <= F.col("d")), 1)
                .otherwise(0)
            )
            .cast("double")
            .alias("x")
        )
    )
    rq = xd.groupBy("q_id").agg(
        F.sum(
            F.round(
                (1 - _RBO_P)
                * F.pow(F.lit(_RBO_P), F.col("d") - 1)
                * F.col("x")
                / F.col("d"),
                9,
            ).cast("decimal(20,9)")
        ).alias("rbo_mass")
    )
    return (
        rq.crossJoin(F.broadcast(nq))
        .groupBy("n_queries")
        .agg(
            F.round(
                F.sum("rbo_mass").cast("double") / F.col("n_queries"), 6
            ).alias("mean_rbo_at_10")
        )
        .select("n_queries", "mean_rbo_at_10")
    )


_MASE_SEASON = 7
_MASE_HORIZON = 7


@register(
    "eval_forecast_mase",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day, sum(cents)::BIGINT AS x FROM e GROUP BY day),
       lagd AS (SELECT day, x,
                       lag(x, {_MASE_SEASON}) OVER (ORDER BY day) AS xs
                FROM d),
       cut AS (SELECT max(day) - {_MASE_HORIZON} AS c FROM d),
       tr AS (SELECT abs(x - xs)::DOUBLE AS ae FROM lagd CROSS JOIN cut
              WHERE xs IS NOT NULL AND day <= c),
       te AS (SELECT abs(x - xs)::DOUBLE AS ae,
                     abs(x - xs)::DOUBLE
                       / nullif((abs(x) + abs(xs)) / 2.0, 0) AS sm
              FROM lagd CROSS JOIN cut
              WHERE xs IS NOT NULL AND day > c),
       s AS (SELECT (SELECT count(*) FROM tr)::BIGINT AS n_train,
                    (SELECT count(*) FROM te)::BIGINT AS n_test,
                    (SELECT avg(ae) FROM tr) AS mae_insample,
                    (SELECT avg(ae) FROM te) AS mae_test,
                    (SELECT avg(sm) FROM te) AS smape_frac)
       SELECT n_train, n_test,
              round(mae_insample, 4) AS mae_insample_naive,
              round(mae_test, 4) AS mae_test,
              round(mae_test / mae_insample, 6) AS mase,
              round(100 * smape_frac, 4) AS smape_pct,
              round(mae_test / mae_insample, 6) < 1.0
                AS beats_naive_insample
       FROM s""",
    doc="Forecast-accuracy audit with MASE (Hyndman-Koehler) and sMAPE "
    "for the seasonal-naive forecast (x̂_t = x_(t−7)) of daily "
    "revenue: the last 7 days are the test horizon, MASE = test MAE "
    "/ in-sample seasonal-naive MAE — the scale-free forecast metric "
    "that (unlike MAPE) survives zero/near-zero days and compares "
    "across series; eval_pinball_loss covers quantile forecasts, "
    "this covers point forecasts. Scale shape: one map-side-"
    "combinable rollup to the bounded day table, one lag window "
    "over it, constant-size aggregates; no join touches raw events "
    "twice.",
)
def q_eval_forecast_mase(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import events_table

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    d = d.transform(ckpt)  # bounded day table; feeds lag + max
    w = Window.orderBy("day")
    lagd = d.select(
        "day", "x", F.lag("x", _MASE_SEASON).over(w).alias("xs")
    )
    cut = d.agg((F.max("day") - _MASE_HORIZON).alias("c"))
    both = lagd.crossJoin(F.broadcast(cut)).filter(F.col("xs").isNotNull())
    ae = F.abs(F.col("x") - F.col("xs")).cast("double")
    tr = both.filter(F.col("day") <= F.col("c")).agg(
        F.count("*").cast("long").alias("n_train"),
        F.avg(ae).alias("mae_insample"),
    )
    te = both.filter(F.col("day") > F.col("c")).agg(
        F.count("*").cast("long").alias("n_test"),
        F.avg(ae).alias("mae_test"),
        F.avg(
            ae
            / F.nullif(
                (F.abs(F.col("x")) + F.abs(F.col("xs"))) / 2.0, F.lit(0.0)
            )
        ).alias("smape_frac"),
    )
    mase = F.round(F.col("mae_test") / F.col("mae_insample"), 6)
    return tr.crossJoin(F.broadcast(te)).select(
        "n_train",
        "n_test",
        F.round(F.col("mae_insample"), 4).alias("mae_insample_naive"),
        F.round(F.col("mae_test"), 4).alias("mae_test"),
        mase.alias("mase"),
        F.round(100 * F.col("smape_frac"), 4).alias("smape_pct"),
        (mase < 1.0).alias("beats_naive_insample"),
    )


@register(
    "eval_auc_pr",
    """WITH s AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a,
                round(n_chars * 1000000.0 / len(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                  x -> x <> '')))::BIGINT AS v
         FROM documents
         WHERE len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), x -> x <> '')) >= 1),
       pv AS (SELECT v, sum(is_a)::BIGINT AS k1, sum(1 - is_a)::BIGINT AS k2
              FROM s GROUP BY v),
       cdf AS (SELECT v, k1, k2,
                      sum(k1) OVER w::BIGINT AS c1,
                      sum(k2) OVER w::BIGINT AS c2
               FROM pv WINDOW w AS (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)),
       tot AS (SELECT max(c1)::BIGINT AS n_pos, max(c2)::BIGINT AS n_neg
               FROM cdf),
       ap AS (SELECT sum(round((c1 * 1.0 / (c1 + c2)) * (k1 * 1.0 / t.n_pos),
                               9)::DECIMAL(20,9)) AS ap
              FROM cdf CROSS JOIN tot t WHERE k1 > 0)
       SELECT t.n_pos, t.n_neg,
              round(CAST(ap.ap AS DOUBLE), 6) AS average_precision,
              round(t.n_pos * 1.0 / (t.n_pos + t.n_neg), 6) AS prevalence,
              round(CAST(ap.ap AS DOUBLE)
                    / (t.n_pos * 1.0 / (t.n_pos + t.n_neg)), 4)
                AS lift_over_random
       FROM ap CROSS JOIN tot t""",
    doc="Precision-recall AUC (average precision) of the chars-per-token "
    "score as an English-detector — the imbalanced-class complement "
    "of eval_auc_roc on the IDENTICAL score/label design: ROC-AUC "
    "stays optimistic when negatives dominate because FPR divides by "
    "n_neg; AP integrates precision over recall so every false "
    "positive costs. Threshold-level step integration AP = "
    "Σ_t P(t)·ΔR(t) over DISTINCT scores descending (tie-safe — no "
    "per-row ordering is ever needed), per-threshold terms rounded "
    "to 9 dp and decimal-summed; lift = AP/prevalence is the "
    "random-classifier-normalized summary. Scale shape: the auc_roc "
    "shape exactly — one map-side-combinable score rollup, one "
    "cumulative window over the bounded distinct-score table, a "
    "1-row totals broadcast.",
)
def q_eval_auc_pr(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.functions.text import token_count

    s = (
        table(spark, sf, "documents")
        .filter(token_count("text") >= 1)
        .select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_a"),
            F.round(F.col("n_chars") * 1000000.0 / token_count("text"))
            .cast("long")
            .alias("v"),
        )
    )
    pv = s.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("k1"),
        F.sum(1 - F.col("is_a")).cast("long").alias("k2"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(Window.unboundedPreceding, 0)
    cdf = pv.select(
        "v",
        "k1",
        "k2",
        F.sum("k1").over(w).cast("long").alias("c1"),
        F.sum("k2").over(w).cast("long").alias("c2"),
    )
    cdf = cdf.transform(ckpt)  # bounded distinct-score table
    tot = cdf.agg(
        F.max("c1").cast("long").alias("n_pos"),
        F.max("c2").cast("long").alias("n_neg"),
    )
    ap = (
        cdf.filter(F.col("k1") > 0)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    (F.col("c1") * 1.0 / (F.col("c1") + F.col("c2")))
                    * (F.col("k1") * 1.0 / F.col("n_pos")),
                    9,
                ).cast("decimal(20,9)")
            ).alias("ap")
        )
    )
    prev = F.round(F.col("n_pos") * 1.0 / (F.col("n_pos") + F.col("n_neg")), 6)
    return ap.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        "n_neg",
        F.round(F.col("ap").cast("double"), 6).alias("average_precision"),
        prev.alias("prevalence"),
        F.round(
            F.col("ap").cast("double")
            / (F.col("n_pos") * 1.0 / (F.col("n_pos") + F.col("n_neg"))),
            4,
        ).alias("lift_over_random"),
    )


# --- round-12 session: calibration regression / exact-z / agreement /
#     forecast-ratio / label-noise additions ----------------------------------


@register(
    "eval_reliability_regression",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000)::BIGINT AS x,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS y
         FROM embeddings),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                    sum(x::DECIMAL(38,0) * x)::DECIMAL(38,0) AS sxx,
                    sum(x::DECIMAL(38,0) * y)::DECIMAL(38,0) AS sxy
             FROM p),
       k AS (SELECT n,
                    10000.0 * CAST(n * sxy - sx::DECIMAL(38,0) * sy AS DOUBLE)
                      / CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE)
                      AS slope,
                    sy * 1.0 / n
                    - (10000.0 * CAST(n * sxy - sx::DECIMAL(38,0) * sy
                                      AS DOUBLE)
                       / CAST(n * sxx - sx::DECIMAL(38,0) * sx AS DOUBLE))
                      * (sx * 1.0 / n / 10000.0) AS intercept
             FROM s)
       SELECT n,
              round(slope, 6) AS calibration_slope,
              round(intercept, 6) AS calibration_intercept,
              (abs(round(slope, 6) - 1.0) < 0.08
               AND abs(round(intercept, 6)) < 0.04) AS well_calibrated
       FROM k""",
    doc="Calibration REGRESSION (Cox 1958 recalibration line): OLS of "
    "outcome on predicted probability over the eval_calibration_bins "
    "prediction stream — slope and intercept in probability units. "
    "Slope < 1 is overconfidence (predictions too extreme), intercept "
    "> 0 is calibration-in-the-large bias; the pinned synthetic "
    "stream (acc = 0.9*conf + 0.05) must measure slope ~0.9 / "
    "intercept ~0.05 and fail the (|slope-1| < 0.08, |intercept| < "
    "0.04) gate — the line summarizes what the 10-bin reliability "
    "diagram shows pointwise, and is the standard 2-parameter "
    "recalibration a serving stack fits. All sums are exact "
    "BIGINT/DECIMAL(38,0); two rounded outputs. Scale shape: one "
    "scan-fused 5-sum aggregate over the prediction stream; scalar "
    "math on a 1-row frame.",
)
def q_eval_reliability_regression(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("x"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("y"),
    )
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dd("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dd("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n")
    slope = (
        10000.0
        * (n * F.col("sxy") - dd("sx") * F.col("sy")).cast("double")
        / (n * F.col("sxx") - dd("sx") * F.col("sx")).cast("double")
    )
    intercept = F.col("sy") * 1.0 / n - slope * (F.col("sx") * 1.0 / n / 10000.0)
    return s.select(
        "n",
        F.round(slope, 6).alias("calibration_slope"),
        F.round(intercept, 6).alias("calibration_intercept"),
        (
            (F.abs(F.round(slope, 6) - 1.0) < 0.08)
            & (F.abs(F.round(intercept, 6)) < 0.04)
        ).alias("well_calibrated"),
    )


@register(
    "eval_spiegelhalter_z",
    f"""WITH p AS (
         SELECT ({_CONF_HASH} % 10000)::BIGINT AS x,
                CASE WHEN ({_OUT_HASH} % 10000) <
                          (({_CONF_HASH} % 10000) * 9) // 10 + 500
                     THEN 1 ELSE 0 END::BIGINT AS y
         FROM embeddings),
       s AS (SELECT count(*)::BIGINT AS n,
                    sum((10000 * y - x)::DECIMAL(38,0)
                        * (10000 - 2 * x))::DECIMAL(38,0) AS num8,
                    sum((10000 - 2*x)::DECIMAL(38,0) * (10000 - 2*x)
                        * x * (10000 - x))::DECIMAL(38,0) AS den16
             FROM p)
       SELECT n,
              round(CAST(num8 AS DOUBLE) / sqrt(CAST(den16 AS DOUBLE)), 4)
                AS z_stat,
              abs(round(CAST(num8 AS DOUBLE) / sqrt(CAST(den16 AS DOUBLE)),
                        4)) >= 1.96 AS miscalibrated
       FROM s""",
    doc="Spiegelhalter's Z test of calibration: Z = sum((y-p)(1-2p)) / "
    "sqrt(sum((1-2p)^2 p(1-p))) over the eval_calibration_bins "
    "prediction stream — the hypothesis-test companion to ECE (which "
    "measures but does not test) and the Brier decomposition (whose "
    "reliability term this tests directly). In basis points both "
    "sums are EXACT integers — numerator terms (10^4 y - x)(10^4 - "
    "2x), denominator (10^4-2x)^2 x (10^4-x) as DECIMAL(38,0) — so "
    "the statistic is one deterministic double division; the pinned "
    "miscalibrated stream must reject at two-sided 5%. Scale shape: "
    "one scan-fused 3-sum aggregate; no window, no join.",
)
def q_eval_spiegelhalter_z(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    conf = md5_hash64(
        F.concat(F.lit("conf:"), F.col("vec_id").cast("string"))
    ) % 10000
    out = md5_hash64(
        F.concat(F.lit("outcome:"), F.col("vec_id").cast("string"))
    ) % 10000
    p = table(spark, sf, "embeddings").select(
        conf.cast("long").alias("x"),
        (out < F.floor(conf * 9 / 10) + 500).cast("long").alias("y"),
    )
    s = p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            (10000 * F.col("y") - F.col("x")).cast("decimal(38,0)")
            * (10000 - 2 * F.col("x"))
        )
        .cast("decimal(38,0)")
        .alias("num8"),
        F.sum(
            (10000 - 2 * F.col("x")).cast("decimal(38,0)")
            * (10000 - 2 * F.col("x"))
            * F.col("x")
            * (10000 - F.col("x"))
        )
        .cast("decimal(38,0)")
        .alias("den16"),
    )
    z = F.round(
        F.col("num8").cast("double") / F.sqrt(F.col("den16").cast("double")), 4
    )
    return s.select(
        "n", z.alias("z_stat"), (F.abs(z) >= 1.96).alias("miscalibrated")
    )


_KRIPP_RATERS = 3
_KRIPP_CATS = 4
_KRIPP_ACC_PCT = 80  # rater reads the true category 80% of the time


def _kripp_label_sql(r: int) -> str:
    h1 = f"(('0x' || substr(md5('kripp{r}:' || vec_id::VARCHAR), 1, 15))::BIGINT % 100)"
    h2 = f"(('0x' || substr(md5('krippalt{r}:' || vec_id::VARCHAR), 1, 15))::BIGINT % {_KRIPP_CATS - 1})"
    true_c = f"(label % {_KRIPP_CATS})"
    return (
        f"CASE WHEN {h1} < {_KRIPP_ACC_PCT} THEN {true_c}"
        f" ELSE ({true_c} + 1 + {h2}) % {_KRIPP_CATS} END"
    )


@register(
    "eval_krippendorff_alpha",
    f"""WITH r AS (
         {" UNION ALL ".join(f"SELECT vec_id, ({_kripp_label_sql(r)})::BIGINT AS cat FROM embeddings" for r in range(_KRIPP_RATERS))}),
       uc AS (SELECT vec_id, cat, count(*)::BIGINT AS cnt
              FROM r GROUP BY vec_id, cat),
       peritem AS (SELECT vec_id, sum(cnt * cnt)::BIGINT AS sq
                   FROM uc GROUP BY vec_id),
       d_o AS (SELECT count(*)::BIGINT AS n_items,
                      sum({_KRIPP_RATERS * _KRIPP_RATERS} - sq)::BIGINT
                        AS do2
               FROM peritem),
       nc AS (SELECT cat, sum(cnt)::BIGINT AS n_c FROM uc GROUP BY cat),
       d_e AS (SELECT sum(n_c)::BIGINT AS n_tot,
                      sum(n_c * n_c)::BIGINT AS sq_c
               FROM nc)
       SELECT d_o.n_items,
              d_e.n_tot AS n_ratings,
              round(1.0 - (d_e.n_tot - 1.0) * d_o.do2
                    / (2.0 * (d_e.n_tot::DECIMAL(38,0) * d_e.n_tot
                              - d_e.sq_c)), 6) AS alpha,
              round(1.0 - (d_e.n_tot - 1.0) * d_o.do2
                    / (2.0 * (d_e.n_tot::DECIMAL(38,0) * d_e.n_tot
                              - d_e.sq_c)), 6) >= 0.667 AS reliable
       FROM d_o, d_e""",
    doc="Krippendorff's alpha (nominal) over a deterministic 3-rater "
    "annotation grid (raters read the true label-mod-4 category 80% "
    "of the time, hash-derived disagreements otherwise): the "
    "agreement coefficient that generalizes the kappa family "
    "(eval_cohens_kappa: 2 raters; eval_fleiss_kappa: marginal-based "
    "chance) by chance-correcting against the COINCIDENCE matrix — "
    "the measure of record for annotation QA, defined for missing "
    "data and any number of raters. With equal m=3 the observed "
    "disagreement collapses to exact integers: per item "
    "m^2 - sum_c n_uc^2 ordered disagreeing pairs (x2 scaling kept "
    "integral), expected disagreement from category totals "
    "n^2 - sum n_c^2; alpha = 1 - (n-1)*Do2 / (2*(n^2 - sum n_c^2)). "
    "Flag at Krippendorff's customary 0.667 floor. Scale shape: one "
    "3-way union scan, one (item, cat) rollup feeding two "
    "map-side-combinable aggregates, a 1-row x 1-row combine.",
)
def q_eval_krippendorff_alpha(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.hashing import md5_hash64

    emb = table(spark, sf, "embeddings")
    cats = []
    for r in range(_KRIPP_RATERS):
        h1 = md5_hash64(
            F.concat(F.lit(f"kripp{r}:"), F.col("vec_id").cast("string"))
        ) % 100
        h2 = md5_hash64(
            F.concat(F.lit(f"krippalt{r}:"), F.col("vec_id").cast("string"))
        ) % (_KRIPP_CATS - 1)
        true_c = F.col("label") % _KRIPP_CATS
        cats.append(
            F.when(h1 < _KRIPP_ACC_PCT, true_c)
            .otherwise((true_c + 1 + h2) % _KRIPP_CATS)
            .cast("long")
        )
    # one scan: the 3 rater labels fan out as an array explode, not a
    # 3-way union (a union re-reads the table per rater)
    r_ = emb.select("vec_id", F.explode(F.array(*cats)).alias("cat"))
    uc = (
        r_.groupBy("vec_id", "cat")
        .agg(F.count("*").cast("long").alias("cnt"))
        .transform(ckpt)  # (item, cat) frame; feeds 2 rollups
    )
    peritem = uc.groupBy("vec_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sq")
    )
    d_o = peritem.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(_KRIPP_RATERS * _KRIPP_RATERS - F.col("sq"))
        .cast("long")
        .alias("do2"),
    )
    nc = uc.groupBy("cat").agg(F.sum("cnt").cast("long").alias("n_c"))
    d_e = nc.agg(
        F.sum("n_c").cast("long").alias("n_tot"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("sq_c"),
    )
    alpha = F.round(
        1.0
        - (F.col("n_tot") - 1.0)
        * F.col("do2")
        / (
            2.0
            * (
                F.col("n_tot").cast("decimal(38,0)") * F.col("n_tot")
                - F.col("sq_c")
            ).cast("double")
        ),
        6,
    )
    return d_o.crossJoin(F.broadcast(d_e)).select(
        "n_items",
        F.col("n_tot").alias("n_ratings"),
        alpha.alias("alpha"),
        (alpha >= 0.667).alias("reliable"),
    )


_THEIL_HORIZON = 7
_THEIL_SEASON = 7


@register(
    "eval_forecast_theil_u",
    f"""WITH e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day, sum(cents)::BIGINT AS x FROM e GROUP BY day),
       lagd AS (SELECT day, x,
                       lag(x, {_THEIL_SEASON}) OVER (ORDER BY day) AS xs,
                       lag(x, 1) OVER (ORDER BY day) AS x1
                FROM d),
       cut AS (SELECT max(day) - {_THEIL_HORIZON} AS c FROM d),
       te AS (SELECT (x - xs)::DECIMAL(38,0) * (x - xs) AS se_model,
                     (x - x1)::DECIMAL(38,0) * (x - x1) AS se_naive
              FROM lagd CROSS JOIN cut
              WHERE xs IS NOT NULL AND x1 IS NOT NULL AND day > c),
       s AS (SELECT count(*)::BIGINT AS n_test,
                    sum(se_model)::DECIMAL(38,0) AS ssm,
                    sum(se_naive)::DECIMAL(38,0) AS ssn
             FROM te)
       SELECT n_test,
              round(sqrt(CAST(ssm AS DOUBLE) / n_test), 4) AS rmse_model,
              round(sqrt(CAST(ssn AS DOUBLE) / n_test), 4) AS rmse_naive1,
              round(sqrt(CAST(ssm AS DOUBLE) / CAST(ssn AS DOUBLE)), 6)
                AS theil_u2,
              round(sqrt(CAST(ssm AS DOUBLE) / CAST(ssn AS DOUBLE)), 6)
                < 1.0 AS beats_naive1
       FROM s""",
    doc="Theil's U2 forecast-quality ratio on the last-7-day horizon of "
    "daily revenue: RMSE of the seasonal-naive model (x̂_t = x_(t-7), "
    "the eval_forecast_mase forecaster) over RMSE of the no-change "
    "naive (x̂_t = x_(t-1)). U2 < 1 means the model genuinely beats "
    "the cheapest possible forecast — the RMSE-based complement to "
    "MASE's MAE scaling, and the classical 'is this forecaster worth "
    "anything' gate. Squared errors accumulate as exact "
    "DECIMAL(38,0) (cent-integer differences squared); two double "
    "divisions at the end. Scale shape: one map-side-combinable "
    "rollup to the bounded day table, one two-lag window over it, a "
    "constant-size aggregate.",
)
def q_eval_forecast_theil_u(spark: SparkSession, sf: str):
    from pyspark.sql import Window

    from annotations_ingester_spark.plans.catalog import events_table

    e = events_table(spark, sf).select(
        F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d = e.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    d = d.transform(ckpt)  # bounded day table; feeds lag + max
    w = Window.orderBy("day")
    lagd = d.select(
        "day",
        "x",
        F.lag("x", _THEIL_SEASON).over(w).alias("xs"),
        F.lag("x", 1).over(w).alias("x1"),
    )
    cut = d.agg((F.max("day") - _THEIL_HORIZON).alias("c"))
    te = (
        lagd.crossJoin(F.broadcast(cut))
        .filter(
            F.col("xs").isNotNull()
            & F.col("x1").isNotNull()
            & (F.col("day") > F.col("c"))
        )
        .select(
            ((F.col("x") - F.col("xs")).cast("decimal(38,0)")
             * (F.col("x") - F.col("xs"))).alias("se_model"),
            ((F.col("x") - F.col("x1")).cast("decimal(38,0)")
             * (F.col("x") - F.col("x1"))).alias("se_naive"),
        )
    )
    s = te.agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum("se_model").cast("decimal(38,0)").alias("ssm"),
        F.sum("se_naive").cast("decimal(38,0)").alias("ssn"),
    )
    u2 = F.round(
        F.sqrt(F.col("ssm").cast("double") / F.col("ssn").cast("double")), 6
    )
    return s.select(
        "n_test",
        F.round(F.sqrt(F.col("ssm").cast("double") / F.col("n_test")), 4).alias(
            "rmse_model"
        ),
        F.round(F.sqrt(F.col("ssn").cast("double") / F.col("n_test")), 4).alias(
            "rmse_naive1"
        ),
        u2.alias("theil_u2"),
        (u2 < 1.0).alias("beats_naive1"),
    )


def _sign_bucket_sql_noise() -> str:
    from annotations_ingester_spark.functions.vectors import sign_bucket_sql

    return sign_bucket_sql("embedding", 8)


def _cos_sql_noise(a: str, b: str) -> str:
    from annotations_ingester_spark.functions.vectors import (
        cosine_similarity_sql,
    )

    return cosine_similarity_sql(a, b)

_NOISE_COS_THRESHOLD = 0.3  # the embedding_near_dup_pairs discovery bar


@register(
    "eval_label_noise_pairs",
    f"""WITH e AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS v,
                 {_sign_bucket_sql_noise()} AS bucket
          FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.label::BIGINT AS label_a, b.label::BIGINT AS label_b,
               round({_cos_sql_noise("a.v", "b.v")}, 6) AS cos
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round({_cos_sql_noise("a.v", "b.v")}, 6)
                >= {_NOISE_COS_THRESHOLD!r}
          AND a.label <> b.label""",
    doc="Label-noise candidates (the confident-learning screen): "
    "embedding near-dup pairs (same sign-bucket self-join + cosine "
    "threshold as embedding_near_dup_pairs) whose LABELS DISAGREE — "
    "two points this close in representation space with different "
    "labels mean at least one annotation is suspect. This is the "
    "standard first pass of training-label QA: rank the conflicts, "
    "send them to re-annotation, and the dedup family's discovery "
    "machinery is reused verbatim so the screen costs nothing extra "
    "at 100 TB (per-bucket keyed self-join, norms pre-folded, never "
    "a corpus-wide cross). Scale shape: identical to "
    "embedding_near_dup_pairs plus a scan-level label inequality.",
)
def q_eval_label_noise_pairs(spark: SparkSession, sf: str):
    from annotations_ingester_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
        sign_bucket,
    )

    # labels ride WITH the vectors through one checkpointed scan (joining
    # them back post-pairing would re-read the table twice more)
    e = (
        table(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.col("embedding").alias("v"),
            sign_bucket("embedding", 8).alias("bucket"),
            l2_norm("embedding").alias("_nrm"),
        )
        .transform(ckpt)
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label_a"),
        F.col("v").alias("_va"),
        F.col("_nrm").alias("_na"),
        "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine_from_norms("_va", "_vb", "_na", "_nb"), 6)
    return (
        pairs.select("id_a", "id_b", "label_a", "label_b", cos.alias("cos"))
        .filter(
            (F.col("cos") >= F.lit(_NOISE_COS_THRESHOLD))
            & (F.col("label_a") != F.col("label_b"))
        )
    )
