"""TPC-H-style expansion pack (the generic analytics surface, round 2).

Adapted to the driver's TPC-H-ish schema (no partsupp / commitdate /
receiptdate columns — q2/q11/q12/q16/q20/q21 patterns are re-expressed on
lineitem), keeping each query's *plan pattern*: correlated mins, nation-pair
joins, market share, profit roll-ups, scalar-threshold HAVING, left-join
distributions, view+max, distinct-count skylines, avg-correlated filters,
disjunctive pushdown, and multi-EXISTS. Decimal discipline throughout:
money sums go through DECIMAL(18,6) and are cast to DOUBLE only at the
edge; ratios round exactly once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from annotations_ingester_spark.plans.catalog import register, table

DEC = "decimal(18,6)"
REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)


@register(
    "q2_min_cost_supplier",
    """WITH pr AS (
         SELECT l_partkey, l_suppkey,
                min(round(l_extendedprice / l_quantity, 6)) AS unit_cost
         FROM lineitem WHERE l_quantity > 0
         GROUP BY l_partkey, l_suppkey),
       pmin AS (
         SELECT l_partkey, min(unit_cost) AS best FROM pr GROUP BY l_partkey)
       SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, pr.unit_cost
       FROM pr
       JOIN pmin ON pr.l_partkey = pmin.l_partkey AND pr.unit_cost = pmin.best
       JOIN part p ON p.p_partkey = pr.l_partkey
       JOIN supplier s ON s.s_suppkey = pr.l_suppkey
       WHERE p.p_type = 'STANDARD' AND p.p_size < 10""",
    doc="TPC-H Q2-style correlated minimum: cheapest supplier per part "
    "(min unit price from lineitem standing in for partsupp), min-of-min "
    "join-back, broadcast part/supplier dims.",
)
def q2(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem").filter(F.col("l_quantity") > 0)
    pr = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias("unit_cost")
    )
    pmin = pr.groupBy("l_partkey").agg(F.min("unit_cost").alias("best"))
    p = F.broadcast(
        table(spark, sf, "part").filter(
            (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
        )
    )
    s = F.broadcast(table(spark, sf, "supplier"))
    return (
        pr.join(pmin, ["l_partkey"])
        .filter(F.col("unit_cost") == F.col("best"))
        .join(p, pr.l_partkey == p.p_partkey)
        .join(s, pr.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
    )


@register(
    "q7_nation_volume",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l.l_shipdate::DATE)::BIGINT AS l_year,
              CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
       WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
       GROUP BY supp_nation, cust_nation, l_year""",
    doc="TPC-H Q7-style bilateral shipping volume: two broadcast nation "
    "dims aliased independently, disjunctive nation-pair predicate, "
    "per-year decimal revenue roll-up.",
)
def q7(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    s = F.broadcast(table(spark, sf, "supplier"))
    c = table(spark, sf, "customer")
    n1 = F.broadcast(table(spark, sf, "nation")).alias("n1")
    n2 = F.broadcast(table(spark, sf, "nation")).alias("n2")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            ((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
        )
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
            _rev().alias("_rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""WITH vol AS (
         SELECT year(o.o_orderdate::DATE)::BIGINT AS o_year,
                {REV_SQL} AS v, n1.n_name AS supp_nation
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         JOIN region r ON n2.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
       SELECT o_year,
              round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN v
                                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                    / CAST(sum(v) AS DOUBLE), 6) AS mkt_share
       FROM vol GROUP BY o_year""",
    doc="TPC-H Q8-style market share: one nation's slice of PROMO-part "
    "revenue into ASIA customers per year — conditional decimal sums, "
    "single rounding point on the ratio.",
)
def q8(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    p = F.broadcast(table(spark, sf, "part").filter(F.col("p_type") == "PROMO"))
    s = F.broadcast(table(spark, sf, "supplier"))
    c = table(spark, sf, "customer")
    n1 = F.broadcast(table(spark, sf, "nation")).alias("n1")
    n2 = F.broadcast(table(spark, sf, "nation")).alias("n2")
    r = F.broadcast(table(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .join(r, F.col("n2.n_regionkey") == F.col("r_regionkey"))
        .select(
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
            _rev().alias("v"),
            F.col("n1.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast(DEC)
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("v")).otherwise(zero))
            .cast("double")
            / F.sum("v").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """SELECT n.n_name AS nation, year(o.o_orderdate::DATE)::BIGINT AS o_year,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                       - CAST(p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(18,6)))
                   AS DOUBLE) AS profit
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY nation, o_year""",
    doc="TPC-H Q9-style product-type profit per nation/year (supply cost "
    "stood in by 10% of retail price): decimal-exact revenue-minus-cost, "
    "LIKE filter on part name, broadcast dims.",
)
def q9(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    p = F.broadcast(table(spark, sf, "part").filter(F.col("p_name").like("%widget%")))
    s = F.broadcast(table(spark, sf, "supplier"))
    n = F.broadcast(table(spark, sf, "nation"))
    cost = (F.col("p_retailprice") * F.col("l_quantity") * 0.1).cast(DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
            (_rev() - cost).alias("_p"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("_p").cast("double").alias("profit"))
    )


@register(
    "q11_important_value",
    """WITH val AS (
         SELECT s.s_nationkey,
                sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS v
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY s.s_nationkey),
       tot AS (SELECT sum(v) AS t FROM val)
       SELECT n.n_name AS nation, CAST(val.v AS DOUBLE) AS value
       FROM val JOIN nation n ON val.s_nationkey = n.n_nationkey, tot
       WHERE CAST(val.v AS DOUBLE) > CAST(tot.t AS DOUBLE) * 0.05""",
    doc="TPC-H Q11-style important-stock skyline: per-nation supplied "
    "value vs a scalar-subquery global threshold (broadcast one-row "
    "aggregate) — HAVING-over-fraction pattern.",
)
def q11(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    s = F.broadcast(table(spark, sf, "supplier"))
    n = F.broadcast(table(spark, sf, "nation"))
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t").cast("double") * 0.05)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("v").cast("double").alias("value"))
    )


@register(
    "q12_ship_lag_buckets",
    """SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 'high' ELSE 'low' END AS priority_class,
              count(*) AS late_count,
              sum(CASE WHEN date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) > 90
                       THEN 1 ELSE 0 END)::BIGINT AS very_late_count
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) > 60
       GROUP BY priority_class""",
    doc="TPC-H Q12-style shipping-lag buckets (ship-vs-order lag standing "
    "in for commit/receipt dates): priority-class CASE key, conditional "
    "count aggregate.",
)
def q12(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    cls = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(lag > 60)
        .select(cls.alias("priority_class"), lag.alias("_lag"))
        .groupBy("priority_class")
        .agg(
            F.count("*").alias("late_count"),
            F.sum(F.when(F.col("_lag") > 90, 1).otherwise(0))
            .cast("long")
            .alias("very_late_count"),
        )
    )


@register(
    "q13_customer_order_counts",
    """WITH co AS (
         SELECT c.c_custkey, count(o.o_orderkey) AS c_count
         FROM customer c
         LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey)
       SELECT c_count, count(*) AS custdist FROM co GROUP BY c_count""",
    doc="TPC-H Q13-style order-count distribution: LEFT join keeps "
    "zero-order customers (count of a nullable key), then a second "
    "aggregate over the counts.",
)
def q13(spark: SparkSession, sf: str):
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    f"""WITH rev AS (
         SELECT l_suppkey, round(CAST(sum({REV_SQL}) AS DOUBLE), 4) AS total_rev
         FROM lineitem
         WHERE l_shipdate::DATE >= DATE '1996-01-01'
           AND l_shipdate::DATE < DATE '1996-04-01'
         GROUP BY l_suppkey),
       m AS (SELECT max(total_rev) AS best FROM rev)
       SELECT s.s_suppkey, s.s_name, r.total_rev
       FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey, m
       WHERE r.total_rev = m.best""",
    doc="TPC-H Q15-style top supplier: quarterly revenue view + scalar max "
    "join-back (broadcast one-row aggregate); rounded-decimal equality "
    "keeps the max comparison engine-portable.",
)
def q15(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev()).cast("double"), 4).alias("total_rev")
    )
    m = rev.agg(F.max("total_rev").alias("best"))
    s = F.broadcast(table(spark, sf, "supplier"))
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("total_rev") == F.col("best"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16_part_supplier_counts",
    """SELECT p.p_brand, p.p_type, p.p_size,
              count(DISTINCT l.l_suppkey) AS supplier_cnt
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17)
       GROUP BY p.p_brand, p.p_type, p.p_size""",
    doc="TPC-H Q16-style supplier-count skyline per (brand, type, size) "
    "(lineitem supplier links standing in for partsupp): COUNT DISTINCT "
    "over an equi-join with negated + IN-list dim predicates.",
)
def q16(spark: SparkSession, sf: str):
    p = F.broadcast(
        table(spark, sf, "part").filter(
            (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
        )
    )
    li = table(spark, sf, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """WITH pa AS (
         SELECT l_partkey,
                CAST(sum(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE)
                  / count(*) AS avg_qty
         FROM lineitem GROUP BY l_partkey)
       SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 4)
                AS avg_yearly,
              count(*) AS n
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN pa ON l.l_partkey = pa.l_partkey
       WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * pa.avg_qty""",
    doc="TPC-H Q17-style small-quantity revenue: per-part average quantity "
    "(decimal-exact sum / count) joined back as a correlated threshold, "
    "brand-filtered.",
)
def q17(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(14,4)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    p = F.broadcast(table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3"))
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.l_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return j.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4
        ).alias("avg_yearly"),
        F.count("*").alias("n"),
    )


@register(
    "q19_disjunctive_revenue",
    f"""SELECT CAST(sum({REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
              AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
              AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 20 AND 30)""",
    doc="TPC-H Q19-style disjunctive predicate revenue: three OR'd "
    "brand/size/quantity conjunctions across the join — Catalyst pushes "
    "the common sub-predicates to both scans.",
)
def q19(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    p = F.broadcast(table(spark, sf, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    j = li.join(p, li.l_partkey == p.p_partkey).filter(cond)
    return j.agg(
        F.sum(_rev()).cast("double").alias("revenue"), F.count("*").alias("n")
    )


@register(
    "q21_waiting_suppliers",
    """WITH late AS (
         SELECT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderstatus = 'F'
           AND date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) > 90),
       multi AS (
         SELECT DISTINCT a.l_orderkey, a.l_suppkey
         FROM late a
         WHERE EXISTS (SELECT 1 FROM lineitem b
                       WHERE b.l_orderkey = a.l_orderkey
                         AND b.l_suppkey <> a.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM late c
                           WHERE c.l_orderkey = a.l_orderkey
                             AND c.l_suppkey <> a.l_suppkey))
       SELECT s.s_name, count(*) AS numwait
       FROM multi JOIN supplier s ON multi.l_suppkey = s.s_suppkey
       GROUP BY s.s_name""",
    doc="TPC-H Q21-style sole-blame late supplier (ship-vs-order lag "
    "standing in for receipt/commit): EXISTS → left-semi join, NOT EXISTS "
    "→ left-anti join on the same derived relation.",
)
def q21(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90)
        .select("l_orderkey", "l_suppkey")
    )
    a = late.alias("a")
    others = li.select("l_orderkey", "l_suppkey").alias("b")
    semi = a.join(
        others,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi",
    )
    other_late = late.alias("c")
    sole = semi.join(
        other_late,
        (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("c.l_suppkey")),
        "left_anti",
    ).distinct()
    s = F.broadcast(table(spark, sf, "supplier"))
    return (
        sole.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q20_potential_promotion",
    """WITH ps AS (
         SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                ((l_partkey * 13 + l_suppkey * 37) % 500)::BIGINT AS ps_availqty
         FROM lineitem),
       shipped AS (
         SELECT l_partkey, l_suppkey,
                sum(l_quantity)::BIGINT AS qty
         FROM lineitem
         WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
         GROUP BY l_partkey, l_suppkey),
       cand AS (
         SELECT DISTINCT ps.ps_suppkey
         FROM ps
         JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'small%'
         JOIN shipped s ON s.l_partkey = ps.ps_partkey AND s.l_suppkey = ps.ps_suppkey
         WHERE ps.ps_availqty > 0.5 * s.qty)
       SELECT sp.s_name, n.n_name
       FROM supplier sp
       JOIN nation n ON sp.s_nationkey = n.n_nationkey
       WHERE sp.s_suppkey IN (SELECT ps_suppkey FROM cand)
         AND n.n_name IN ('NATION_0', 'NATION_1')""",
    doc="TPC-H Q20 pattern (potential part promotion), adapted: the test "
    "schema has no partsupp table, so availqty is synthesized "
    "deterministically from (partkey, suppkey) over the distinct lineitem "
    "pairs — identical arithmetic on both engines. Shape: semi-join chain "
    "(parts-by-name -> half-of-shipped-qty threshold -> supplier "
    "left-semi), broadcast dims. Completes all 22 TPC-H query patterns.",
)
def q20(spark: SparkSession, sf: str):
    li = table(spark, sf, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct().withColumn(
        "ps_availqty",
        ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 37) % 500).cast("long"),
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    part_small = F.broadcast(
        table(spark, sf, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    cand = (
        ps.join(part_small, ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    n = F.broadcast(
        table(spark, sf, "nation").filter(F.col("n_name").isin("NATION_0", "NATION_1"))
    )
    sp = table(spark, sf, "supplier")
    return (
        sp.join(cand, sp.s_suppkey == cand.ps_suppkey, "left_semi")
        .join(n, sp.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )
