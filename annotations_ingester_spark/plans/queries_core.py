"""Reference-surface queries (SURVEY §2: scans, filters, joins, aggs, set
ops, windows, scalars) + the generic analytics surface (TPC-H-style
aggregation/join/window/rollup plans), each with a DuckDB oracle.

Reference citations point at the operator each query certifies.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from annotations_ingester_spark.functions.names import index_name, normalize_index_name, synth_row_id
from annotations_ingester_spark.operators.filters import (
    match_predicate,
    range_filter,
    valid_text_filter,
)
from annotations_ingester_spark.operators.antijoin import skip_processed
from annotations_ingester_spark.operators.windows import window_segment
from annotations_ingester_spark.plans.catalog import events_table, register, table


# ---------------------------------------------------------------- scans ----


@register(
    "s1_scan_doc_ids",
    "SELECT doc_id FROM documents",
    doc="S1 full scan, ids only (reference: es_common.py:273-292); Catalyst "
    "prunes the scan to the one column (check ReadSchema).",
)
def s1(spark: SparkSession, sf: str):
    return table(spark, sf, "documents").select("doc_id")


@register(
    "s3_range_scan_orders",
    """SELECT o_orderkey, o_custkey, strftime(o_orderdate::DATE, '%Y-%m-%d') AS o_date
       FROM orders
       WHERE o_orderdate::DATE BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""",
    doc="S3/P5 both-ends-inclusive date range scan (es_common.py:303-330); "
    "pushes to parquet row-group stats.",
)
def s3(spark: SparkSession, sf: str):
    df = range_filter(table(spark, sf, "orders"), "o_orderdate", "1996-01-01", "1996-12-31")
    return df.select(
        "o_orderkey", "o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date")
    )


@register(
    "s4_point_lookup",
    "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
    doc="S4 point lookup by id (es_common.py:212-231).",
)
def s4(spark: SparkSession, sf: str):
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "lang", "source", "n_chars")
    )


# -------------------------------------------------------------- filters ----


@register(
    "p3_valid_text_filter",
    """SELECT doc_id, n_chars FROM documents
       WHERE text IS NOT NULL AND length(text) >= 5""",
    doc="P3 null/short-text filter, MIN_TEXT_LEN=5 "
    "(annotations_indexer.py:244-247).",
)
def p3(spark: SparkSession, sf: str):
    return valid_text_filter(table(spark, sf, "documents"), "text").select("doc_id", "n_chars")


@register(
    "p4_match_predicate",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
    doc="P4 equality match predicate (es_common.py:254-271).",
)
def p4(spark: SparkSession, sf: str):
    return match_predicate(table(spark, sf, "customer"), {"c_mktsegment": "BUILDING"}).select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------- joins ----


@register(
    "j1_anti_join_skip_processed",
    """SELECT d.doc_id FROM documents d
       WHERE NOT EXISTS (SELECT 1 FROM documents p
                         WHERE p.doc_id % 3 = 0 AND p.doc_id = d.doc_id)""",
    doc="J1 skip-processed anti-join (annotations_indexer.py:80-101): the "
    "per-doc sink probe becomes one distributed left_anti join.",
)
def j1(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents")
    processed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return skip_processed(docs, processed).select("doc_id")


@register(
    "j3_broadcast_dim_join",
    """SELECT o.o_orderkey, c.c_name, n.n_name
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderstatus = 'F'""",
    doc="J3-style parent-attr recombination generalized: fact × broadcast "
    "dims (customer, nation broadcast — no shuffle of the big side).",
)
def j3(spark: SparkSession, sf: str):
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    c = F.broadcast(table(spark, sf, "customer"))
    n = F.broadcast(table(spark, sf, "nation"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "c_name", "n_name")
    )


# ----------------------------------------------------------- aggregates ----


@register(
    "a1_doc_count",
    "SELECT count(*) AS n_docs FROM documents",
    doc="A1 count(*) (es_common.py:153-160); parquet metadata count.",
)
def a1(spark: SparkSession, sf: str):
    return table(spark, sf, "documents").agg(F.count("*").alias("n_docs"))


@register(
    "a2_filtered_count_exists",
    """SELECT count(*) AS n_match, count(*) > 0 AS found
       FROM customer WHERE c_mktsegment = 'BUILDING'""",
    doc="A2 filtered count → exists (es_common.py:261-271).",
)
def a2(spark: SparkSession, sf: str):
    return (
        table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .agg(F.count("*").alias("n_match"), (F.count("*") > 0).alias("found"))
    )


@register(
    "a3_collect_list_per_group",
    """SELECT o_custkey, count(*) AS n_orders,
              string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys
       FROM orders GROUP BY o_custkey""",
    doc="A3 collect-per-key (annotations_indexer.py:107-111) — sorted join "
    "for an order-insensitive value hash.",
)
def a3(spark: SparkSession, sf: str):
    return (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("order_keys"),
        )
    )


# -------------------------------------------------------------- set ops ----


@register(
    "u1_union_all",
    """SELECT doc_id, lang FROM documents WHERE lang = 'en'
       UNION ALL
       SELECT doc_id, lang FROM documents WHERE source = 'src1'""",
    doc="U1 union of old ∪ new record sets (annotations_indexer.py:107-111).",
)
def u1(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents")
    a = d.filter(F.col("lang") == "en").select("doc_id", "lang")
    b = d.filter(F.col("source") == "src1").select("doc_id", "lang")
    return a.unionByName(b)


@register(
    "u2_distinct_records",
    "SELECT DISTINCT lang, source FROM documents",
    doc="U2 whole-record distinct — the reference's canonical-JSON set dedup "
    "(utils.py:16-19) as dropDuplicates.",
)
def u2(spark: SparkSession, sf: str):
    return table(spark, sf, "documents").select("lang", "source").dropDuplicates()


# ----------------------------------------------------- batch windowing -----


@register(
    "b1_tumbling_date_windows",
    """SELECT date_diff('day', DATE '1995-01-01', o_orderdate::DATE) // 30 AS seg,
              count(*) AS n_orders,
              CAST(sum(o_totalprice::DECIMAL(14,2)) AS DOUBLE) AS total
       FROM orders GROUP BY seg""",
    doc="B1 tumbling date windows (annotations_indexer.py:842-861) as a "
    "partitioning expression — no driver loop, no boundary overlap.",
)
def b1(spark: SparkSession, sf: str):
    o = table(spark, sf, "orders")
    return (
        o.withColumn("seg", window_segment("o_orderdate", "1995-01-01", 30))
        .groupBy("seg")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
        )
    )


# -------------------------------------------------------------- scalars ----


@register(
    "f1_index_name_normalize",
    """SELECT DISTINCT source,
              regexp_replace(regexp_replace(lower(source || '-Ann#Set X.'),
                  '(^[._\\-+]+)|([._\\-+]+$)', '', 'g'),
                  '[#\\\\/*?"<>| ]', '_', 'g') AS normalized,
              lower(source) || '-' || 'suffix' AS with_suffix
       FROM documents""",
    doc="F1 index-name normalization + F2 name concat "
    "(es_common.py:116-151).",
)
def f1(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents")
    return d.select(
        "source",
        normalize_index_name(F.concat(F.col("source"), F.lit("-Ann#Set X."))).alias("normalized"),
        index_name(F.lower(F.col("source")), F.lit("suffix")).alias("with_suffix"),
    ).dropDuplicates()


@register(
    "f2_row_id_synthesis",
    """SELECT doc_id, e.i AS ann_id,
              'doc-' || doc_id::VARCHAR || '-ann-' || e.i::VARCHAR AS row_id
       FROM documents, (SELECT unnest(range(0, 2)) AS i) e""",
    doc="F2 deterministic sink row id doc-{docid}-ann-{annid} "
    "(annotations_indexer.py:221).",
)
def f2(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents")
    return (
        d.select("doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("ann_id"))
        .withColumn("row_id", synth_row_id("doc_id", "ann_id"))
    )


@register(
    "f4_substring_by_indices",
    """SELECT doc_id, substr(text, 3, 8) AS sub, upper(substr(text, 1, 4)) AS head
       FROM documents WHERE text IS NOT NULL AND length(text) >= 10""",
    doc="F4 substring-by-indices source_value extraction "
    "(nlp_service.py:118-121) — 1-based in both engines.",
)
def f4(spark: SparkSession, sf: str):
    d = table(spark, sf, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") >= 10)
    )
    return d.select(
        "doc_id",
        F.substring("text", 3, 8).alias("sub"),
        F.upper(F.substring("text", 1, 4)).alias("head"),
    )


@register(
    "f6_date_arithmetic",
    """SELECT o_orderkey, strftime(o_orderdate::DATE, '%Y-%m-%d') AS d,
              strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS d_plus,
              strftime(o_orderdate::DATE, '%Y-%m') AS ym
       FROM orders""",
    doc="F6 date parse/format/add with interval days "
    "(annotations_indexer.py:849-853).",
)
def f6(spark: SparkSession, sf: str):
    o = table(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("d"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("d_plus"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "f_scalar_suite",
    """SELECT p_partkey,
              lower(p_name) AS lname, upper(p_brand) AS ubrand,
              length(p_name)::BIGINT AS name_len,
              trim(' ' || p_type || ' ') AS ttype,
              concat_ws('|', p_brand, p_type) AS joined,
              round(abs(p_retailprice - 1000.0), 2) AS price_delta,
              lpad(p_size::VARCHAR, 4, '0') AS padded,
              replace(p_type, ' ', '_') AS snake,
              coalesce(NULL, p_brand) AS co
       FROM part""",
    doc="F-series scalar library: string/math/null functions "
    "(SURVEY §2.6) — all JVM built-ins, no UDF.",
)
def fsuite(spark: SparkSession, sf: str):
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("ttype"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_delta"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.regexp_replace("p_type", " ", "_").alias("snake"),
        F.coalesce(F.lit(None), F.col("p_brand")).alias("co"),
    )


# ------------------------------------------------- generic analytics -------


@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) AS sum_qty,
              CAST(sum(l_extendedprice::DECIMAL(14,2)) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) ) AS DOUBLE) AS sum_disc_price,
              round(CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) / count(*), 6) AS avg_qty,
              round(CAST(sum(l_discount::DECIMAL(8,4)) AS DOUBLE) / count(*), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate::DATE <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1-style pricing summary: scan-heavy groupBy with decimal-"
    "stable sums (map-side partial agg; one shuffle on the 6-group key).",
)
def q1(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem").filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double") / F.count("*"), 6
        ).alias("avg_qty"),
        F.round(
            F.sum(F.col("l_discount").cast("decimal(8,4)")).cast("double") / F.count("*"), 6
        ).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """SELECT o.o_orderkey,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
              strftime(o.o_orderdate::DATE, '%Y-%m-%d') AS odate, o.o_orderpriority
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate::DATE < DATE '1998-03-15'
         AND l.l_shipdate::DATE > DATE '1996-03-15'
       GROUP BY o.o_orderkey, odate, o.o_orderpriority
       ORDER BY revenue DESC, o.o_orderkey LIMIT 10""",
    doc="TPC-H Q3-style join + top-k: broadcast the filtered customer dim, "
    "shuffle only lineitem↔orders; total order via (revenue, key) tiebreak.",
)
def q3(spark: SparkSession, sf: str):
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(F.to_date("o_orderdate") < F.lit("1998-03-15"))
    li = table(spark, sf, "lineitem").filter(F.to_date("l_shipdate") > F.lit("1996-03-15"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"), "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "odate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    """SELECT n.n_name,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM region r
       JOIN nation n ON n.n_regionkey = r.r_regionkey
       JOIN customer c ON c.c_nationkey = n.n_nationkey
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
       GROUP BY n.n_name""",
    doc="TPC-H Q5-style multi-join: dims broadcast, one shuffle join "
    "lineitem↔orders; co-located supplier condition.",
)
def q5(spark: SparkSession, sf: str):
    r = F.broadcast(table(spark, sf, "region"))
    n = F.broadcast(table(spark, sf, "nation"))
    c = F.broadcast(table(spark, sf, "customer"))
    s = F.broadcast(table(spark, sf, "supplier"))
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "window_topk_per_customer",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey, strftime(o_orderdate::DATE, '%Y-%m-%d') AS odate,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
    doc="Top-k per group via ranked window — the scalable per-key top-k "
    "(single shuffle on the partition key).",
)
def wtopk(spark: SparkSession, sf: str):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        table(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"), "rn")
    )


@register(
    "window_running_total",
    """SELECT o_custkey, o_orderkey,
              CAST(sum(o_totalprice::DECIMAL(14,2)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
       FROM orders""",
    doc="Running total window (decimal-stable accumulation).",
)
def wrun(spark: SparkSession, sf: str):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).over(w).cast("double").alias("running"),
    )


@register(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) AS qty
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    doc="ROLLUP grouping sets — native Catalyst expansion.",
)
def rollup(spark: SparkSession, sf: str):
    return (
        table(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
    )


@register(
    "events_sessionization",
    """WITH ev AS (
         SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_s FROM events),
       flagged AS (
         SELECT user_id, event_id, ts_s,
                CASE WHEN lag(ts_s) OVER w IS NULL
                          OR ts_s - lag(ts_s) OVER w > 1800
                     THEN 1 ELSE 0 END AS new_sess
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
       sessed AS (
         SELECT user_id, event_id,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         FROM flagged)
       SELECT user_id, session_id, count(*) AS n_events,
              min(event_id) AS first_event
       FROM sessed GROUP BY user_id, session_id""",
    doc="Sessionization: lag-gap flag + running sum — the batch twin of "
    "streaming session_window(ts, gap).",
)
def sessionize(spark: SparkSession, sf: str):
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    flagged = events_table(spark, sf).withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessed = flagged.withColumn("session_id", F.sum("new_sess").over(wsum))
    return sessed.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("event_id").alias("first_event")
    )


@register(
    "events_json_extract",
    """SELECT CAST(props::JSON ->> 'k' AS BIGINT) AS k, count(*) AS n,
              CAST(sum(value::DECIMAL(14,4)) AS DOUBLE) AS total_value
       FROM events GROUP BY k""",
    doc="F8 JSON parse (nlp_service.py:103): get_json_object over a string "
    "column, grouped.",
)
def json_extract(spark: SparkSession, sf: str):
    e = events_table(spark, sf)
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("total_value"),
        )
    )


@register(
    "q4_order_priority_exists",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders o
       WHERE o.o_orderdate::DATE >= DATE '1996-01-01'
         AND o.o_orderdate::DATE < DATE '1996-10-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate::DATE > o.o_orderdate::DATE + 60)
       GROUP BY o_orderpriority""",
    doc="TPC-H Q4-style: EXISTS correlated subquery → left-semi join "
    "(late-shipping orders per priority).",
)
def q4(spark: SparkSession, sf: str):
    o = table(spark, sf, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01"))
    )
    li = table(spark, sf, "lineitem")
    joined = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 60)),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
              count(*) AS n
       FROM lineitem
       WHERE l_shipdate::DATE >= DATE '1996-01-01'
         AND l_shipdate::DATE < DATE '1997-01-01'
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24""",
    doc="TPC-H Q6-style: pure scan-filter-aggregate — the pushdown + "
    "whole-stage-codegen showcase (no join, no wide shuffle).",
)
def q6(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n")
    )


@register(
    "q10_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c.c_custkey LIMIT 20""",
    doc="TPC-H Q10-style: returned-item revenue per customer, top-20 — "
    "fact-to-fact join + broadcast dims + total-order top-k.",
)
def q10(spark: SparkSession, sf: str):
    c = F.broadcast(table(spark, sf, "customer"))
    n = F.broadcast(table(spark, sf, "nation"))
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    """SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                   THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                   ELSE 0 END) AS DOUBLE)
              / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_share,
              count(*) AS n
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""",
    doc="TPC-H Q14-style: conditional aggregate share (CASE inside SUM) "
    "over a broadcast part join.",
)
def q14(spark: SparkSession, sf: str):
    p = F.broadcast(table(spark, sf, "part"))
    li = table(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,6)"))
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
        ).alias("promo_share"),
        F.count("*").alias("n"),
    )


@register(
    "q22_global_sales_opportunity",
    """WITH avg_bal AS (
         SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
       SELECT c.c_nationkey, count(*) AS n_cust,
              CAST(sum(c.c_acctbal::DECIMAL(14,2)) AS DOUBLE) AS total_bal
       FROM customer c, avg_bal
       WHERE c.c_acctbal > avg_bal.a
         AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'P')
       GROUP BY c.c_nationkey""",
    doc="TPC-H Q22-style: scalar-subquery threshold (broadcast one-row "
    "aggregate) + NOT EXISTS anti-join — above-average-balance customers "
    "with no pending orders, per nation.",
)
def q22(spark: SparkSession, sf: str):
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_orderstatus") == "P"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double").alias("total_bal"),
        )
    )
