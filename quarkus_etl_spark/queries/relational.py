"""Tier-B relational core: scans, predicates, joins, aggregates, sorts,
set ops (SURVEY.md §2 Tier B).

The reference admits this whole surface by pushing arbitrary SQL to the
source engine (reference: LoaderBean.kt:12, EtlMain.kt:106); here each shape
is expressed with the DataFrame API so Catalyst plans it natively (predicate
pushdown into the parquet scan, broadcast/SMJ selection by AQE, partial+final
aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .base import davg, dec2, dsum, ensure_views, register, sql_davg, sql_dsum, t

# ---------------------------------------------------------------------------
# Scans (A1 parity: whole-query source scan — reference EtlMain.kt:103-108)
# ---------------------------------------------------------------------------


@register("q_scan_parquet", oracle="SELECT * FROM lineitem")
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem")


@register("q_scan_select_literal", oracle="SELECT 1 AS one")
def q_scan_select_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's job-0 extract is `select 1`
    (application.properties:13)."""
    return spark.sql("SELECT 1 AS one")


# ---------------------------------------------------------------------------
# Projection + filter (the reference's job-1 shape: application.properties:18
# `select id,street_address,... from addresses where id < 13422`)
# ---------------------------------------------------------------------------


@register(
    "q_filter_projection",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 1342
    """,
)
def q_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1342)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "q_pred_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def q_pred_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-12-31 23:59:59").cast("timestamp_ntz")
    return li.where(F.col("l_shipdate").between(lo, hi)).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )


@register(
    "q_pred_in",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def q_pred_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "q_pred_like",
    oracle="SELECT p_partkey, p_name, p_type FROM part WHERE p_name LIKE '%red%'",
)
def q_pred_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "q_pred_null",
    oracle="""
    SELECT event_id, user_id, props FROM events
    WHERE props IS NOT NULL AND value IS NOT NULL
    """,
)
def q_pred_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.where(F.col("props").isNotNull() & F.col("value").isNotNull()).select(
        "event_id", "user_id", "props"
    )


@register(
    "q_pred_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_quantity
    FROM lineitem
    WHERE (l_discount > 0.05 AND l_quantity < 25.0) OR NOT (l_returnflag = 'A')
    """,
)
def q_pred_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cond = ((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 25.0)) | ~(
        F.col("l_returnflag") == "A"
    )
    return li.where(cond).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_discount", "l_quantity"
    )


# ---------------------------------------------------------------------------
# Joins — physical strategy left to Catalyst/AQE except where hinted
# ---------------------------------------------------------------------------


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
    SELECT o_orderkey, c_custkey, c_acctbal
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_acctbal"
    )


@register(
    "q_join_full",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    c = t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same values as a plain inner join; the broadcast hint pins the
    physical plan to BroadcastHashJoin (dim side ships to every executor —
    no shuffle of the fact side)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return c.join(broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@register(
    "q_join_theta_range",
    oracle="""
    SELECT o_orderkey, b.band_id, o_totalprice
    FROM orders
    JOIN (VALUES (0, 0.0, 50000.0), (1, 50000.0, 150000.0),
                 (2, 150000.0, 300000.0), (3, 300000.0, 1e18)) AS b(band_id, lo, hi)
      ON o_totalprice >= b.lo AND o_totalprice < b.hi
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (non-equi) join. The band table is tiny, so Spark plans a
    BroadcastNestedLoopJoin — the scalable physical choice for theta joins
    against a small build side."""
    o = t(spark, sf_dir, "orders")
    # VALUES is synthesized JVM-side: createDataFrame(py_list) would route
    # the 4 rows through a Python worker (~6 s cold — measured; see NOTES).
    bands = spark.sql(
        "SELECT band_id, CAST(lo AS DOUBLE) lo, CAST(hi AS DOUBLE) hi FROM VALUES "
        "(0, 0.0d, 50000.0d), (1, 50000.0d, 150000.0d), "
        "(2, 150000.0d, 300000.0d), (3, 300000.0d, 1e18d) AS b(band_id, lo, hi)"
    )
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return o.join(broadcast(bands), cond).select("o_orderkey", "band_id", "o_totalprice")


@register(
    "q_join_multiway",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderkey, c_custkey, n_name
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_totalprice > 200000
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("l_orderkey", "l_linenumber", "o_orderkey", "c_custkey", "n_name")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape (pricing summary report). Catalyst plans
    partial+final hash aggregation; decimal arithmetic keeps the result
    bit-identical across engines and partitionings."""
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    price, disc, tax = dec2("l_extendedprice"), dec2("l_discount"), dec2("l_tax")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_having",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_cust, {sql_dsum("c_acctbal", "sum_bal")}
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 3
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal", "sum_bal"))
        .where(F.col("n_cust") > 3)
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_cust
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_rsd_ok,
           TRUE AS parts_rsd_ok
    FROM lineitem
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100TB-scale substitute for exact
    COUNT(DISTINCT) (one pass, fixed memory, no shuffle explosion). The
    estimates themselves are engine-specific, so (the
    q_agg_percentile_approx pattern, VERDICT r7 #2) the hashed output is
    the sketch CONTRACT, conclusively oracled:

    - the exact distinct counts (real values, hash-compared vs DuckDB);
    - `*_rsd_ok` booleans pinned TRUE asserting the estimate sits inside
      5x its declared rsd (0.05 → 25% — a ~5-sigma envelope, so the pin
      is stable across fuzz-mutated fixtures while still catching a
      broken sketch outright). Integer arithmetic (|est-exact|*4 <=
      exact), exact==0 degrades to TRUE on both sides.

    The estimate is deterministic under repartitioning (register maxima
    merge order-free), so the booleans are partition-stable. The exact
    counts exist here FOR the oracle; the sketch is the headline op —
    at 100 TB only the approx path runs (the exact one is the shuffle
    this operator exists to avoid).

    Plan note: the sketches aggregate SEPARATELY from the exact counts
    (1-row x 1-row crossJoin after). Mixing regular aggs into a
    multi-DISTINCT aggregate triggers the Expand rewrite — every row
    replicated once per distinct group PLUS once for the regular aggs,
    with the sketch evaluated on the expanded stream: measured 8.5 s
    combined vs 0.7 s (sketch) + 2.9 s (exacts) split, at 6M rows."""
    li = t(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    sketch = li.agg(
        F.approx_count_distinct("l_orderkey", 0.05).alias("__ao"),
        F.approx_count_distinct("l_partkey", 0.05).alias("__ap"),
    )
    agg = exact.crossJoin(sketch)
    return agg.select(
        "exact_orders",
        "exact_parts",
        (
            F.abs(F.col("__ao") - F.col("exact_orders")) * 4
            <= F.col("exact_orders")
        ).alias("orders_rsd_ok"),
        (
            F.abs(F.col("__ap") - F.col("exact_parts")) * 4
            <= F.col("exact_parts")
        ).alias("parts_rsd_ok"),
    )


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty")
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt, {sql_dsum("c_acctbal", "sum_bal")}
    FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("c_acctbal", "sum_bal")
    )


@register(
    "q_agg_gsets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               {sql_dsum("l_extendedprice", "sum_price")}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Sorts / top-k
# ---------------------------------------------------------------------------


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS pos
    FROM customer
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort; the sort position is materialized as a column so the
    order itself is value-checked (the harness hash is order-insensitive)."""
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey", "c_acctbal", "c_mktsegment", F.row_number().over(w).alias("pos")
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge — no global sort, scale-safe). Full-key tiebreak makes the
    k-th row deterministic."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q_union_all",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    a = c.where(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    b = c.where(F.col("c_acctbal") > 8000).select("c_custkey", "c_acctbal")
    return a.unionByName(b)


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.subtract(s)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytical composites (join+agg+topk stress, SURVEY.md §6's
# "bench within 2x" target runs these shapes at sf0.1)
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q3_shape",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority) shape: selective dim filter -> 3-way
    join -> grouped decimal revenue -> top-10. Catalyst broadcast-joins the
    filtered customer side; the topk is TakeOrderedAndProject."""
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.sum(
        dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    ).cast("double").alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue)
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q_tpch_q5_shape",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) shape: 6-way join with two broadcast
    dims and a same-nation theta constraint, grouped decimal revenue."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.sum(
        dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    ).cast("double").alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue)
    )


@register(
    "q_tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) shape: quarter filter on orders,
    returnflag filter pushed to the lineitem scan, fact-fact shuffle join +
    broadcast nation dim, grouped decimal revenue, top-20 by revenue.
    Catalyst plans TakeOrderedAndProject for the limit."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    revenue = F.sum(
        dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    ).cast("double").alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q_tpch_q18_shape",
    oracle="""
    WITH order_qty AS (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(qty_dec AS DOUBLE) AS total_qty
    FROM order_qty
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer) shape. The classic SQL writes the
    quantity sum twice (HAVING subquery + outer GROUP BY, rescanning
    lineitem); here the per-order aggregate is computed ONCE and reused —
    one lineitem shuffle keyed by l_orderkey, an already-co-keyed join to
    orders (AQE merges the exchanges), a second join to customer, and a
    TakeOrderedAndProject top-100 with full-key tiebreak
    (o_totalprice DESC, o_orderdate, o_orderkey). At 100 TB the surviving
    HAVING rows are a sliver of lineitem, so the orders join's build side
    is small and AQE turns it into a broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty_dec"))
        .where(F.col("qty_dec") > 250)
    )
    return (
        oq.join(o, oq.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Reshaping: pivot / unpivot / sampling
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "q_pivot",
    # no ELSE: empty cells stay NULL to match Spark's pivot semantics
    oracle=f"""
    SELECT c_nationkey,
           {", ".join(
               f"CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS {s}"
               for s in _SEGMENTS
           )}
    FROM customer GROUP BY c_nationkey
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: nation x market-segment account-balance matrix. Explicit
    value list, so Spark skips the extra distinct-scan and the output
    schema is deterministic."""
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.sum(dec2("c_acctbal")).cast("double"))
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'total' AS metric, o_totalprice AS amount FROM orders
    UNION ALL
    SELECT o_orderkey, 'half' AS metric, o_totalprice / 2 AS amount FROM orders
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide metric columns to (key, metric, amount) rows."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        (F.col("o_totalprice") / 2).alias("half"),
    )
    return o.unpivot(
        ids=["o_orderkey"], values=["total", "half"],
        variableColumnName="metric", valueColumnName="amount",
    )


@register("q_sample")  # engine-specific PRNG → rows-only check
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling — deterministic per engine (Spark's
    sampler differs from any SQL oracle's, so rows-only; the pytest suite
    pins reproducibility)."""
    return t(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (quantile_cont semantics), computed
    from value histograms (operators/percentile.py) instead of Spark's
    `percentile` aggregate — whose buffer holds every raw value of a group
    and therefore cannot scale with low-cardinality keys like l_returnflag.
    The histogram plan shuffles |distinct values| per key, not |rows|, and
    produces the same bit-exact (1-g)*lower + g*upper doubles."""
    from ..operators.percentile import exact_percentiles_multi

    li = t(spark, sf_dir, "lineitem")
    return exact_percentiles_multi(
        li,
        ["l_returnflag"],
        {
            "l_quantity": {"median_qty": 0.5},
            "l_extendedprice": {"p25_price": 0.25, "p90_price": 0.9},
        },
    )


@register(
    "q_agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(l_extendedprice) AS BIGINT) AS n_valid,
           quantile_cont(l_extendedprice, 0.45) AS med_lo,
           quantile_cont(l_extendedprice, 0.55) AS med_hi,
           quantile_cont(l_extendedprice, 0.85) AS p90_lo,
           quantile_cont(l_extendedprice, 0.95) AS p90_hi,
           TRUE AS median_rank_ok,
           TRUE AS p90_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for continuous/unbounded domains where even the
    distinct-value histogram is large: approx_percentile (GK/KLL-style,
    bounded memory, one pass). The sketch's values are engine-specific, so
    they are not emitted raw; instead the query emits the sketch CONTRACT
    as a conclusive bounded-tolerance oracle (VERDICT r6 #5):

    - exact interpolated quantiles at p±0.05 around each target — real
      data values via the verified histogram plan (q_agg_percentile's
      machinery), hash-compared against DuckDB quantile_cont;
    - `*_rank_ok` booleans asserting the GK guarantee IN INTEGERS: the
      estimate's possible rank interval [below+1, below+ties] must
      intersect [ceil((p-eps)n)-1, floor((p+eps)n)+1] with eps = 1/10000
      (the accuracy argument). The oracle pins them TRUE — a sketch
      estimate drifting past its declared rank error hash-fails the
      driver gate. Integer `div` arithmetic (never doubles: n*9001 can
      pass 2^53 at trillion-row groups — the q_time_lttb lesson), and a
      degenerate all-NULL-measure group degrades to TRUE on both sides
      (rank interval [1,0] vs [-1,1] still intersects at the boundary
      slack).

    Rank counting is one broadcast join of the 3-row sketch table back to
    the fact (map-side compare + re-aggregate): the booleans are stable
    under any partitioning even though the sketch values themselves are
    not, so the query is partition-deterministic end to end."""
    from ..operators.percentile import exact_percentiles_multi

    # r12 re-measured (VERDICT r11 #2) and REJECTED: materializing one
    # narrow (l_returnflag, l_extendedprice) projection shared by the
    # sketch/rank/bracket passes does collapse 3 parquet scans to 1, but
    # the interleaved A/B at sf0.1 (6 pairs) read 2.799 s min / 3.133 med
    # for the 3-scan shape vs 3.697 / 4.167 with the shared materialized
    # frame — the materialization job costs more than two extra
    # column-pruned scans (the same class as the r11 embedding-frame
    # rejection: pruned scans are cheaper than a block-store round trip).
    # The three passes are already ReadSchema-pruned to these 2 columns.
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_percentile(price, F.lit(0.5), F.lit(10000)).alias("__amed"),
        F.approx_percentile(price, F.lit(0.9), F.lit(10000)).alias("__ap90"),
    )
    ranks = (
        li.join(F.broadcast(approx), ["l_returnflag"], "left")
        .groupBy("l_returnflag")
        .agg(
            F.count(price).alias("n_valid"),
            F.sum(F.when(price < F.col("__amed"), 1).otherwise(0)).alias("mb"),
            F.sum(F.when(price == F.col("__amed"), 1).otherwise(0)).alias("ma"),
            F.sum(F.when(price < F.col("__ap90"), 1).otherwise(0)).alias("pb"),
            F.sum(F.when(price == F.col("__ap90"), 1).otherwise(0)).alias("pa"),
        )
    )
    brackets = exact_percentiles_multi(
        li,
        ["l_returnflag"],
        {
            "l_extendedprice": {
                "med_lo": 0.45, "med_hi": 0.55,
                "p90_lo": 0.85, "p90_hi": 0.95,
            }
        },
    )

    def rank_ok(below: str, ties: str, plo: int, phi: int) -> Column:
        # eps = 1/10000; rank bounds as exact integer arithmetic with ±1
        # index-convention slack: lo = ceil(n*plo/10000)-1, hi =
        # floor(n*phi/10000)+1 where plo/phi = (p∓eps)*10000.
        lo_r = F.expr(f"(n_valid * {plo} + 9999) div 10000") - 1
        hi_r = F.expr(f"(n_valid * {phi}) div 10000") + 1
        return (F.col(below) + 1 <= hi_r) & (F.col(below) + F.col(ties) >= lo_r)

    return ranks.join(brackets, ["l_returnflag"], "left").select(
        "l_returnflag",
        "n_valid",
        "med_lo", "med_hi", "p90_lo", "p90_hi",
        rank_ok("mb", "ma", 4999, 5001).alias("median_rank_ok"),
        rank_ok("pb", "pa", 8999, 9001).alias("p90_rank_ok"),
    )


_STATS_ORACLE = """
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) /
             (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) AS corr_qty_disc
    FROM s
"""


@register("q_agg_stats", oracle=_STATS_ORACLE)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation, cross-engine deterministic: built-in
    var_samp/corr accumulate floats in partition order (never reproducible
    across engines OR partitionings), so the moments are computed as EXACT
    decimal sums and the statistics assembled from them with one fixed
    double expression — same discipline as dsum/davg, extended to second
    moments."""
    li = t(spark, sf_dir, "lineitem")
    x, y = dec2("l_quantity"), dec2("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    var = (sxx - sx * sx / n) / (n - 1)
    corr = (sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
    return s.select(
        "l_returnflag",
        "n",
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        corr.alias("corr_qty_disc"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
           array_to_string(list_transform(list_sort(list(c_custkey)),
                                          x -> CAST(x AS VARCHAR)), ',') AS custkeys
    FROM customer GROUP BY c_nationkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregation (collect_set/collect_list). Collection
    order is partition-dependent, so both engines canonicalize with a sort
    before comparison — the same rule any deterministic consumer of
    collect_* must follow. The sorted arrays are serialized to a
    comma-joined string on BOTH sides because the driver's value-hasher
    cannot hash list cells (round-1 harness ERR); the array semantics
    themselves stay pinned by tests/test_operators.py."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
        # Sort numerically FIRST, then stringify ("10" would sort before "2").
        F.concat_ws(
            ",",
            F.transform(F.array_sort(F.collect_list("c_custkey")), lambda x: x.cast("string")),
        ).alias("custkeys"),
    )


@register(
    "q_agg_histogram",
    oracle="""
    SELECT LEAST(GREATEST(CAST(FLOOR(l_extendedprice / 5000.0) AS INT), 0), 21)
               AS bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_sum
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram (the dashboard/profiling aggregate):
    bucket = clamped floor(value/width), one grouped count — a map-side-
    combinable hash aggregate whose key count is the fixed bucket count,
    so the shuffle is O(buckets x partitions) regardless of row count.
    Arithmetic bucketing instead of width_bucket keeps the expression
    portable (DuckDB has no width_bucket) and pushdown-friendly."""
    li = t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.greatest(F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("int"), F.lit(0)),
        F.lit(21),
    )
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec2("l_extendedprice")).cast("double").alias("bucket_sum"),
    )


@register(
    "q_agg_mode",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag,
           arg_max(qty, n * 100 + (50 - qty)) AS mode_qty,
           MAX(n) AS mode_n
    FROM c GROUP BY 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: count by (group, value), then max_by
    over a packed BIGINT key (count*100 + (50 - value)) — ties on count
    break toward the SMALLEST value on both engines, where a bare mode()
    would be engine-nondeterministic. The packed scalar key keeps Spark's
    max_by a real HashAggregate with map-side partials (a struct ordering
    key would demote it to SortAggregate — same finding as q_time_ohlc);
    two shuffles total, the second over |groups| rows only."""
    li = t(spark, sf_dir, "lineitem")
    c = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.groupBy("l_returnflag").agg(
        F.max_by("qty", F.col("n") * 100 + (F.lit(50) - F.col("qty"))).alias("mode_qty"),
        F.max("n").alias("mode_n"),
    )


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping-id markers on a rollup: the bits that let a
    consumer of a multi-level aggregate distinguish "NULL because
    subtotal row" from "NULL because the data had NULL" — required the
    moment rollup output feeds anything downstream. Spark's grouping_id
    bit order depends on its internal column order, so the portable gid
    is assembled explicitly from the per-column grouping bits (g_flag*2 +
    g_status), identical in both engines."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        (F.grouping("l_returnflag").cast("long") * 2
         + F.grouping("l_linestatus").cast("long")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "gid", "n", "sum_qty"
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH l AS (
        SELECT event_id, nullif(event_type, 'view') AS k FROM events
    ), r AS (
        SELECT nullif(event_type, 'view') AS k, count(*) AS grp_cnt
        FROM events GROUP BY 1
    )
    SELECT l.event_id, l.k, r.grp_cnt
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — the semantics a dimension join needs
    when "unknown" is itself a category. Spark plans `<=>` as a proper
    EQUI-join (hash/broadcast with null-safe key comparison), not a
    nested-loop theta join, so the scale shape is the same as a plain
    equi-join."""
    ev = t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("view"))
    l = ev.select("event_id", k.alias("k"))
    r = ev.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("grp_cnt"))
    return l.join(r, l["k"].eqNullSafe(r["k"])).select(
        l["event_id"], l["k"].alias("k"), r["grp_cnt"]
    )


@register(
    "q_agg_cond_bool",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
               AS n_high_disc,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount = 0.0) AS any_zero_disc,
           CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_cond_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional and boolean aggregates — count_if / every / some (SQL
    FILTER-clause semantics): the predicate-summary family a data-quality
    dashboard is built from. All map-side-combinable single-pass
    aggregates."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") == 0.0).alias("any_zero_disc"),
        F.count_distinct("l_linestatus").cast("long").alias("n_status"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_partkey) AS mixed,
           l_orderkey << 3 AS shifted_up,
           l_orderkey >> 2 AS shifted_down,
           CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
    FROM lineitem
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitwise function family head-on (the primitives SimHash,
    Z-order, and the packed-key aggregates compose internally): and / or /
    xor / shifts / popcount, all pure integer column algebra."""
    li = t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("l_partkey")).alias("mixed"),
        F.shiftleft(k, 3).alias("shifted_up"),
        F.shiftright(k, 2).alias("shifted_down"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "q_agg_linreg",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
           sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n)
               AS intercept
    FROM s
    """,
)
def q_agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity): slope and
    intercept assembled from EXACT decimal moments in one grouped pass —
    the regr_slope/regr_intercept surface, but cross-engine
    deterministic (built-in float regression aggregates accumulate in
    partition order and can never hash-match across engines). Same
    moment discipline as q_agg_stats, one extra cross-moment."""
    li = t(spark, sf_dir, "lineitem")
    x, y = dec2("l_quantity"), dec2("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "sxy"))
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        (sy / n - slope * (sx / n)).alias("intercept"),
    )


@register(
    "q_agg_hll_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts,
           TRUE AS est_rsd_ok,
           TRUE AS merge_agrees_direct
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts,
           TRUE AS est_rsd_ok,
           TRUE AS merge_agrees_direct
    FROM lineitem
    """,
)
def q_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the property that makes
    approximate distinct counting work at warehouse scale: per-partition
    (here per-returnflag) HLL sketches are built ONCE, stored, and any
    rollup (the global count here) is a cheap sketch UNION — no rescan of
    the raw data, unlike exact COUNT(DISTINCT) which cannot reuse
    per-group results. Sketch binaries and estimates are engine-specific,
    so (the q_agg_percentile_approx pattern, VERDICT r7 #2) the hashed
    output is the sketch CONTRACT, conclusively oracled:

    - exact per-group + global distinct counts (hash-compared vs DuckDB);
    - `est_rsd_ok` pinned TRUE: each estimate within 10% of its exact
      count (default lgConfigK=12 → rsd ~1.6%; 10% is a ~6-sigma
      envelope, fuzz-stable but fatal to a broken sketch). The ALL row's
      boolean uses the MERGED-union estimate, so the union path itself
      is inside the envelope. Integer arithmetic, exact==0 degrades TRUE;
    - `merge_agrees_direct` pinned TRUE on the ALL row: the union of the
      per-group sketches estimates within 10% of what ONE sketch built
      directly over the raw rows estimates. NOT exact equality: the
      union is register-maxima only for same-mode sketches, and the
      sparse→dense promotion happens at different points on the two
      paths (measured: merged 1991 vs direct 2023 at 2000 exact —
      ~1.6%), so the trustworthy-rollup contract is envelope agreement,
      not bit identity.

    The exact counts exist here FOR the oracle; at 100 TB only the
    sketch path runs (one scan, map-side partials, 4 KB state/group).

    Plan note: exact counts and sketches aggregate SEPARATELY — a
    DISTINCT agg and a regular agg in one aggregate trigger the Expand
    rewrite (rows replicated per distinct group, the sketch evaluated on
    the expanded stream). Both exact counts (per-group AND global) come
    from ONE (flag, partkey)-distinct pre-aggregation, so the raw data
    is scanned once for exacts; the tiny per-group results rejoin the
    sketch side null-safely (a NULL group key must not drop). Measured
    5.6 s -> 2.5 s at 6M rows."""
    li = t(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    # count("l_partkey"), NOT count(lit(1)): the distinct pre-aggregation
    # keeps one (flag, NULL) row per group with a NULL partkey, but both
    # COUNT(DISTINCT l_partkey) and hll_sketch_agg ignore NULLs — counting
    # the NULL row would diverge from the oracle and skew the rsd envelope
    # by one on any NULL-partkey input (ADVICE r8; NULL l_partkey is now
    # minted by phase-5 fuzz).
    exact_per = pairs.groupBy("l_returnflag").agg(
        F.count("l_partkey").alias("exact_distinct_parts")
    )
    exact_global = (
        pairs.select("l_partkey")
        .distinct()
        .agg(F.count("l_partkey").alias("exact_distinct_parts"))
    )
    sketch_per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    per_group = exact_per.alias("e").join(
        sketch_per.alias("s"),
        F.col("e.l_returnflag").eqNullSafe(F.col("s.l_returnflag")),
    ).select(F.col("e.l_returnflag"), "exact_distinct_parts", "sketch")
    # coalesce(0): an all-NULL-partkey input yields a NULL sketch (aggs
    # skip NULLs), and NULL estimates must degrade to 0 so the pinned-TRUE
    # booleans stay TRUE (exact is 0 there too), not NULL.
    direct_global = li.agg(
        F.coalesce(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")), F.lit(0)
        ).alias("__direct")
    ).crossJoin(exact_global)
    merged = sketch_per.agg(
        F.coalesce(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")), F.lit(0)
        ).alias("__est")
    )
    rsd_ok = (
        F.abs(F.col("__est") - F.col("exact_distinct_parts")) * 10
        <= F.col("exact_distinct_parts")
    )
    per = per_group.select(
        "l_returnflag",
        "exact_distinct_parts",
        F.coalesce(F.hll_sketch_estimate("sketch"), F.lit(0)).alias("__est"),
    ).select(
        "l_returnflag",
        "exact_distinct_parts",
        rsd_ok.alias("est_rsd_ok"),
        F.lit(True).alias("merge_agrees_direct"),
    )
    all_row = direct_global.crossJoin(merged).select(
        F.lit("ALL").alias("l_returnflag"),
        "exact_distinct_parts",
        rsd_ok.alias("est_rsd_ok"),
        (
            F.abs(F.col("__est") - F.col("__direct")) * 10
            <= F.greatest(F.col("exact_distinct_parts"), F.lit(1))
        ).alias("merge_agrees_direct"),
    )
    return per.unionByName(all_row)


@register(
    "q_agg_corr",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sz,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS szz,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxz,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syz
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_price' AS pair, (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr FROM s
    UNION ALL
    SELECT l_returnflag, 'qty_disc' AS pair, (n * sxz - sx * sz) / (sqrt(n * sxx - sx * sx) * sqrt(n * szz - sz * sz)) AS corr FROM s
    UNION ALL
    SELECT l_returnflag, 'price_disc' AS pair, (n * syz - sy * sz) / (sqrt(n * syy - sy * sy) * sqrt(n * szz - sz * sz)) AS corr FROM s
""",
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation MATRIX (quantity/price/discount, three
    pairs) assembled from EXACT decimal moments in ONE grouped pass over
    lineitem — the feature-correlation screen run before model training.
    Built-in corr() accumulates floats in partition order and can never
    hash-match across engines; here every moment is an exact DECIMAL sum
    cast once to double, and each corr is one textually-identical double
    expression on those moments — bit-equal on any partitioning, any
    engine. The 3-row-per-group expansion happens on the post-aggregate
    table (|groups| rows), not the scan. Same discipline as q_agg_linreg,
    generalized to the full moment matrix."""
    li = t(spark, sf_dir, "lineitem")
    x, y, z = dec2("l_quantity"), dec2("l_extendedprice"), dec2("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(z).cast("double").alias("sz"),
        # scale-4 product sums bridge decimal->double THROUGH A STRING:
        # both engines parse decimal strings correctly rounded, while
        # DuckDB's direct DECIMAL(.,4)->DOUBLE cast divides by 10^4 in
        # floating point and can land 1 ULP off Spark's BigDecimal cast
        # (measured on syy at sf0.001).
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
        F.sum(y * y).cast("string").cast("double").alias("syy"),
        F.sum(z * z).cast("string").cast("double").alias("szz"),
        F.sum(x * y).cast("string").cast("double").alias("sxy"),
        F.sum(x * z).cast("string").cast("double").alias("sxz"),
        F.sum(y * z).cast("string").cast("double").alias("syz"),
    )

    def corr(a: str, b: str) -> Column:
        n = F.col("n")
        sa, sb = F.col(f"s{a}"), F.col(f"s{b}")
        saa, sbb = F.col(f"s{a}{a}"), F.col(f"s{b}{b}")
        sab = F.col(f"s{a}{b}")
        return (n * sab - sa * sb) / (
            F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        )

    rows = [("x", "y", "qty_price"), ("x", "z", "qty_disc"), ("y", "z", "price_disc")]
    out = None
    for a, b, lbl in rows:
        part = s.select(
            "l_returnflag", F.lit(lbl).alias("pair"), corr(a, b).alias("corr")
        )
        out = part if out is None else out.unionByName(part)
    return out


@register(
    "q_stats_ttest",
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS g,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS VARCHAR) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY l_returnflag
    ), m AS (
        SELECT g, n, sx / n AS mean,
               (sxx - sx * sx / n) / (n - 1) AS var
        FROM s
    )
    SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
           a.mean - b.mean AS mean_diff,
           (a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n) AS t_stat,
           (a.var / a.n + b.var / b.n) * (a.var / a.n + b.var / b.n)
             / ((a.var / a.n) * (a.var / a.n) / (a.n - 1)
                + (b.var / b.n) * (b.var / b.n) / (b.n - 1)) AS df_welch
    FROM m a JOIN m b ON a.g < b.g
    """,
)
def q_stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between every pair of return-flag groups
    (price means) — the A/B-significance primitive, computed from ONE
    grouped pass of exact decimal moments; the t statistic and
    Welch–Satterthwaite df are textually-identical double expressions on
    those moments, so both engines emit bit-equal values (built-in var/
    stddev aggregates stream in partition order and can't cross-check).
    The pair expansion is a self-join of the 3-row moment table —
    negligible at any scale. Product sums bridge decimal->double through
    a string (the DECIMAL(.,4) direct-cast ULP gotcha, see q_agg_corr)."""
    li = t(spark, sf_dir, "lineitem")
    x = dec2("l_extendedprice")
    s = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
    )
    m = s.select(
        "g",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a, b = m.alias("a"), m.alias("b")
    va_n = F.col("a.var") / F.col("a.n")
    vb_n = F.col("b.var") / F.col("b.n")
    t_stat = (F.col("a.mean") - F.col("b.mean")) / F.sqrt(va_n + vb_n)
    df_welch = (va_n + vb_n) * (va_n + vb_n) / (
        va_n * va_n / (F.col("a.n") - 1) + vb_n * vb_n / (F.col("b.n") - 1)
    )
    return a.join(b, F.col("a.g") < F.col("b.g")).select(
        F.col("a.g").alias("group_a"),
        F.col("b.g").alias("group_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        (F.col("a.mean") - F.col("b.mean")).alias("mean_diff"),
        t_stat.alias("t_stat"),
        df_welch.alias("df_welch"),
    )
