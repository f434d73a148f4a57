"""TPC-H-shaped composite queries, wave 2 (SURVEY.md §2 Tier-C+).

The reference pushes arbitrary SQL to its source engine (reference
`LoaderBean.kt:12`, `EtlMain.kt:106`), so its de-facto query surface is the
full analytical-SQL surface of that engine. This module covers the remaining
plan-interesting TPC-H query SHAPES not already in `relational.py`
(Q3/Q5/Q10/Q18 shapes live there): semi/anti-join EXISTS patterns,
disjunctive bracket predicates, conditional-share aggregates, outer-join
histograms, and scalar-subquery maxima.

The driver fixtures lack some classic TPC-H columns (no partsupp table, no
l_shipmode / l_commitdate / l_receiptdate, no c_phone), so each query keeps
the original's PLAN shape — the join topology, subquery structure, and
aggregate pattern — over the columns that exist; the substitutions are noted
per query. Cross-engine float discipline follows base.py: exact DECIMAL
sums cast to double, identical expression trees on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .base import dec2, register, t

# Revenue expression used by every revenue-bearing shape, as one SQL fragment
# so Spark and DuckDB build the same exact-decimal tree.
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))


def _ntz(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


@register(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking) shape: date-windowed orders,
    correlated EXISTS against lineitem -> left-semi join, count by priority.
    Lateness proxy: shipped >60 days after the order date (the fixture has
    no l_commitdate/l_receiptdate). The semi-join keeps orders the small
    side post-filter; at scale AQE broadcasts it against lineitem."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ntz("1996-07-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q_tpch_q7_shape",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(rev_dec) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_REV_SQL} AS rev_dec
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_9'  AND n2.n_name = 'NATION_11')
         OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) shape: two broadcast copies of the nation
    dim under a disjunctive cross-nation pair predicate, revenue by
    (supp_nation, cust_nation, ship year). The OR predicate cannot be
    pushed below either nation join alone — exactly the planning stress Q7
    exists for; both nation sides stay broadcast so only the fact tables
    shuffle."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_9"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("rev_dec"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_dec").cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q8_shape",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN rev_dec END) AS DOUBLE)
             / CAST(SUM(rev_dec) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS rev_dec,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) shape: 8-way join (two nation
    copies + region), conditional-share aggregate — NATION_9 suppliers'
    fraction of ECONOMY-part revenue sold into ASIA customers, per order
    year. Share = exact-decimal conditional sum / exact-decimal total, both
    cast to double before one deterministic division."""
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rows = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("rev_dec"),
            "supp_nation",
        )
    )
    national = F.sum(
        F.when(F.col("supp_nation") == "NATION_9", F.col("rev_dec"))
    ).cast("double")
    total = F.sum("rev_dec").cast("double")
    return rows.groupBy("o_year").agg((national / total).alias("mkt_share"))


@register(
    "q_tpch_q9_shape",
    oracle=f"""
    SELECT n_name AS nation, o_year,
           CAST(SUM(rev_dec) AS DOUBLE) - CAST(SUM(cost_dec) AS DOUBLE) AS profit
    FROM (
      SELECT s_nationkey,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS rev_dec,
             CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0)) AS cost_dec
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%'
    ) profit_rows
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, o_year
    """,
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) shape: part-name LIKE filter, 5-way
    join, profit per (supplier nation, order year). The fixture has no
    partsupp, so supply cost is proxied by p_retailprice * l_quantity;
    profit is computed as two exact decimal sums (revenue, cost) cast to
    double and subtracted once — decimal subtraction of the (38,4) revenue
    and (17,2) cost trees would overflow Spark's 38-digit cap and round,
    so the subtraction happens in float space where both engines agree."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    rows = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "s_nationkey",
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("rev_dec"),
            (
                F.col("p_retailprice").cast("decimal(12,2)")
                * F.col("l_quantity").cast("decimal(4,0)")
            ).alias("cost_dec"),
        )
    )
    profit = (
        F.sum("rev_dec").cast("double") - F.sum("cost_dec").cast("double")
    ).alias("profit")
    return (
        rows.join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(profit)
    )


@register(
    "q_tpch_q12_shape",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority) shape: fact-fact join with a
    year's ship-date window, CASE-split conditional counts by priority
    class. The fixture has no l_shipmode, so lines group by l_returnflag;
    the pattern under test — one pass, two complementary conditional
    aggregates — is unchanged. COUNT(CASE...) rather than SUM(CASE...)
    keeps both engines in BIGINT (DuckDB SUM(int) widens to HUGEINT)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q13_shape",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution) shape: left outer join with the
    filter INSIDE the join condition (so no-order customers survive with
    count 0), then a two-level aggregate building the orders-per-customer
    histogram. The priority exclusion stands in for the original's
    o_comment NOT LIKE filter (no comment column in the fixture)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (
        o.o_orderpriority != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q14_shape",
    oracle=f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_dec END) AS DOUBLE))
             / CAST(SUM(rev_dec) AS DOUBLE) AS promo_revenue
    FROM (
      SELECT p_type, {_REV_SQL} AS rev_dec
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
    ) month_lines
    """,
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) shape: one-month lineitem window joined
    to a broadcast part dim, promo revenue share as a single global
    conditional-ratio aggregate (one row out)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-06-01"))
        & (F.col("l_shipdate") < _ntz("1997-07-01"))
    )
    p = t(spark, sf_dir, "part")
    rows = li.join(broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", _rev().alias("rev_dec")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_dec"))).cast("double")
    total = F.sum("rev_dec").cast("double")
    return rows.agg(((F.lit(100.0) * promo) / total).alias("promo_revenue"))


@register(
    "q_tpch_q15_shape",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT MAX(total_dec) FROM rev)
    """,
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier) shape: half-year revenue per supplier, then
    a scalar-subquery maximum selecting the top supplier(s). The max is a
    1-row aggregate broadcast back over the per-supplier revenue (equality
    compared in exact DECIMAL, so ties and float noise cannot diverge
    between engines); the per-supplier aggregate is computed once and
    reused for both sides — no second lineitem scan."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1997-07-01"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_dec")
    )
    mx = rev.agg(F.max("total_dec").alias("mx_dec"))
    return (
        rev.join(broadcast(mx), rev.total_dec == mx.mx_dec)
        .join(broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue")
        )
    )


@register(
    "q_tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) shape: NOT-IN subquery
    becomes a left-anti join against the excluded supplier set, then
    COUNT(DISTINCT supplier) per (brand, type, size) bucket. The supplier
    exclusion predicate is s_acctbal < 0 (the fixture has no s_comment);
    the distinct-count runs as Spark's two-phase partial-distinct
    aggregate, no row explosion."""
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
    )
    li = t(spark, sf_dir, "lineitem")
    bad = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q19_shape",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue) shape: three disjunctive predicate
    brackets mixing part attributes (brand, size) and lineitem attributes
    (quantity) across the join. Catalyst splits the OR into the
    single-side conjuncts it can push (brand/size unions to the part scan,
    quantity union to the lineitem scan) and evaluates the full bracket
    predicate post-join — the pushdown stress this query exists for.
    Brackets use brands that exist in the fixture (Brand#1..#25)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    brackets = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .where(brackets)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q21_shape",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND s_nationkey = 9
      AND l1.l_shipdate >= TIMESTAMP '2000-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 10
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) shape: the classic
    EXISTS + NOT-EXISTS self-join pair on lineitem — a semi-join proving
    the order is multi-supplier, then an anti-join proving THIS supplier
    is the only late one. "Late" is l_shipdate >= 2000-01-01 (the fixture
    has no commit/receipt dates); the self-join correlation structure —
    same order, different supplier — is the original's. Both self-join
    sides are slim 2-column projections of lineitem, keyed on l_orderkey,
    so all three legs co-shuffle on the same key."""
    li = t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") >= _ntz("2000-01-01")
    s = t(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 9)
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(late).select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.where(late).select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l_orderkey") == l2.l2_orderkey)
            & (F.col("l_suppkey") != l2.l2_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.l3_orderkey)
            & (F.col("l_suppkey") != l3.l3_suppkey),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@register(
    "q_tpch_q22_shape",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) shape: scalar-subquery global
    average (exact decimal sum / count, one deterministic double division)
    broadcast over customers, plus a NOT-EXISTS anti-join against a
    filtered orders subset. Every fixture customer has orders, so the
    anti-join target is the urgent-priority subset (customers who never
    placed an urgent order), keeping the output non-trivial; grouping is
    by c_nationkey (no c_phone country code in the fixture)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec2("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("ab")
        )
    )
    return (
        c.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q_tpch_q6_shape",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) shape: the canonical pure
    scan-filter-aggregate — every predicate (date window, discount band,
    quantity cap) must reach the parquet scan as a pushed filter and the
    read schema must prune to the four referenced columns; a single global
    exact-decimal sum follows. At 100 TB this is the query whose whole cost
    IS the scan, so pushdown/pruning quality decides everything."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ntz("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec2("l_extendedprice") * dec2("l_discount"))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q_tpch_q2_shape",
    oracle="""
    WITH eu_li AS (
      SELECT l_partkey, l_extendedprice, s_name, s_acctbal, n_name
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    min_p AS (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM eu_li GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, min_price
    FROM part
    JOIN eu_li ON p_partkey = eu_li.l_partkey
    JOIN min_p ON min_p.l_partkey = eu_li.l_partkey
               AND eu_li.l_extendedprice = min_p.min_price
    WHERE p_size >= 40 AND p_type = 'LARGE'
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier) shape: correlated scalar-subquery
    minimum decorrelated into a per-key aggregate self-joined back on
    (key, value == min) — the classic groupwise-minimum plan. The fixture
    has no partsupp, so lineitem plays the part-supplier association and
    l_extendedprice the supply cost; region restriction EUROPE applies to
    both the outer and the minimum's scope, exactly like Q2's nested
    region filter. Both join branches hash-partition on l_partkey, so the
    agg and the join-back share one exchange (ReusedExchange at runtime);
    the filtered part dim is broadcast. Exact double equality is safe:
    both engines compare the identical parquet-sourced IEEE values."""
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            broadcast(
                t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_li = (
        t(spark, sf_dir, "lineitem")
        .join(broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "l_extendedprice", "s_name", "s_acctbal", "n_name")
    )
    min_p = (
        eu_li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "mp_partkey")
    )
    p = broadcast(
        t(spark, sf_dir, "part").where(
            (F.col("p_size") >= 40) & (F.col("p_type") == "LARGE")
        )
    )
    return (
        eu_li.join(
            min_p,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "min_price")
    )


@register(
    "q_tpch_q11_shape",
    oracle="""
    WITH g AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS val_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
    FROM g, (SELECT 1.05 * (CAST(SUM(val_dec) AS DOUBLE) / COUNT(*)) AS thr FROM g) s
    WHERE CAST(val_dec AS DOUBLE) > thr
    """,
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) shape: per-part inventory
    value filtered by a scalar-subquery threshold over the SAME aggregate.
    The threshold (1.05x the mean part value, scale-invariant unlike Q11's
    fixed fraction) is derived from the grouped aggregate itself, not a
    second scan: both branches build the identical groupBy(l_partkey)
    exchange, so Spark reuses the shuffle (ReusedExchange) and lineitem is
    read once. Value arithmetic is exact decimal end-to-end; only the final
    compare is double, with an identical expression tree in the oracle."""
    g = (
        t(spark, sf_dir, "lineitem")
        .join(
            broadcast(
                t(spark, sf_dir, "supplier")
                .join(
                    broadcast(t(spark, sf_dir, "nation")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .join(
                    broadcast(
                        t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(dec2("l_extendedprice") * dec2("l_quantity")).alias("val_dec"))
    )
    thr = g.agg(
        (F.lit(1.05) * (F.sum("val_dec").cast("double") / F.count(F.lit(1)))).alias(
            "thr"
        )
    )
    return (
        g.crossJoin(broadcast(thr))
        .where(F.col("val_dec").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
    )


@register(
    "q_tpch_q20_shape",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 40
      )
    """,
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) shape: doubly-nested IN
    subqueries decorrelated into chained semi-joins — suppliers who moved
    >40 units of any 'red' part in 1996, restricted to AMERICA nations.
    part-name IN becomes a broadcast semi-join under the date-filtered
    lineitem scan; the grouped HAVING feeds a semi-join into supplier, so
    the unbounded fact table collapses to (suppkey) before touching the
    dim side. Quantity sums are exact decimal so the threshold compare
    can't straddle a float ulp across engines."""
    red = t(spark, sf_dir, "part").where(F.col("p_name").like("red %")).select(
        "p_partkey"
    )
    qual = (
        t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= _ntz("1996-01-01"))
            & (F.col("l_shipdate") < _ntz("1997-01-01"))
        )
        .join(broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    am_nation = t(spark, sf_dir, "nation").join(
        broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(
            broadcast(am_nation.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
