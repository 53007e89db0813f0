"""Ranked-retrieval queries: BM25 match ranking (the parquet-backend twin
of the reference store's Lucene scoring, es_common.py:141-160) and TF-IDF
characteristic terms — each with an exact DuckDB oracle over the identical
integer tf/df/dl counts and one shared rounding point."""

from __future__ import annotations

from pyspark.sql import SparkSession

from annotations_ingester_spark.functions import text as tx
from annotations_ingester_spark.operators.search import bm25_rank, tfidf_top_terms
from annotations_ingester_spark.plans.catalog import register, table

TOKS = tx.tokens_sql("text")
QUERY_TERMS = ["spark", "join", "window"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "bm25_match_ranking",
    f"""WITH base AS (
         SELECT doc_id, {TOKS} AS t FROM documents),
       b2 AS (SELECT doc_id, t FROM base WHERE len(t) > 0),
       dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM b2),
       stats AS (SELECT count(*)::DOUBLE AS n_docs, sum(dl) AS sum_dl FROM dl),
       tf AS (
         SELECT doc_id, u.term, count(*)::DOUBLE AS tf
         FROM (SELECT doc_id, unnest(t) AS term FROM b2) u
         WHERE u.term IN ({_TERMS_SQL})
         GROUP BY doc_id, u.term),
       dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       scored AS (
         SELECT tf.doc_id,
                round(sum(
                  ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
                  (tf.tf * 2.2) /
                  (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.sum_dl / s.n_docs)))
                ), 6) AS score
         FROM tf
         JOIN dl USING (doc_id)
         JOIN dfreq d USING (term), stats s
         GROUP BY tf.doc_id),
       ranked AS (
         SELECT doc_id, score,
                row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
         FROM scored)
       SELECT doc_id, score, rank FROM ranked WHERE rank <= 20""",
    doc="BM25 top-20 for a literal term set (Lucene/ES scoring parity, "
    "k1=1.2 b=0.75): tf/df/dl as distributed integer aggregates, corpus "
    "stats broadcast, one rounding point before the bounded global rank.",
)
def q_bm25(spark: SparkSession, sf: str):
    return bm25_rank(table(spark, sf, "documents"), QUERY_TERMS, k=20)


@register(
    "tfidf_top_terms",
    f"""WITH base AS (
         SELECT doc_id, {TOKS} AS t FROM documents),
       b2 AS (SELECT doc_id, t FROM base WHERE len(t) > 0),
       nd AS (SELECT count(*)::DOUBLE AS n_docs FROM b2),
       tf AS (
         SELECT doc_id, u.term, count(*)::DOUBLE AS tf
         FROM (SELECT doc_id, unnest(t) AS term FROM b2) u
         GROUP BY doc_id, u.term),
       dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       scored AS (
         SELECT tf.doc_id, tf.term,
                round(tf.tf * ln(nd.n_docs / d.df), 6) AS tfidf
         FROM tf JOIN dfreq d USING (term), nd),
       ranked AS (
         SELECT doc_id, term, tfidf,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term)::BIGINT AS term_rank
         FROM scored)
       SELECT doc_id, term, tfidf, term_rank FROM ranked WHERE term_rank <= 3""",
    doc="Per-doc top-3 characteristic terms by tf·ln(N/df): one token "
    "explode, two aggregates, df equi-join (AQE skew-safe for zipfian "
    "vocabularies), deterministic (score, term) tie-break.",
)
def q_tfidf(spark: SparkSession, sf: str):
    return tfidf_top_terms(table(spark, sf, "documents"), top_n=3)
