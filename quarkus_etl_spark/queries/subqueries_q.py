"""Tier-B subqueries / CTEs (SURVEY.md §2 "Subqueries / CTEs").

These run through `spark.sql` over the registered fixture views — Catalyst
decorrelates the correlated EXISTS and plans scalar/IN subqueries natively.
Scalar-subquery thresholds use the exact-decimal mean so the comparison
boundary is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import dec2, ensure_views, register, t

_EXACT_AVG_PRICE = (
    "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)"
)

_SCALAR_SQL = f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > {_EXACT_AVG_PRICE}
"""

_IN_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""

_EXISTS_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
"""

_CTE_SQL = """
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
    ),
    big_spenders AS (
        SELECT o_custkey, n_orders, total_spend
        FROM cust_orders WHERE total_spend > 1000000
    )
    SELECT b.o_custkey, c.c_name, b.n_orders, b.total_spend
    FROM big_spenders b JOIN customer c ON b.o_custkey = c.c_custkey
"""


@register("q_subq_scalar", oracle=_SCALAR_SQL)
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


@register("q_subq_in", oracle=_IN_SQL)
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


@register("q_subq_exists_corr", oracle=_EXISTS_SQL)
def q_subq_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@register("q_cte", oracle=_CTE_SQL)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(_CTE_SQL)


@register(
    "q_tpch_q17_shape",
    # The oracle keeps the CORRELATED aggregate form; the Spark side is the
    # decorrelated plan an optimizer (or a careful engineer) produces.
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) shape: a correlated
    aggregate subquery, hand-decorrelated into per-part threshold
    aggregation joined back to the filtered fact — ONE extra shuffle over
    lineitem instead of a per-row subquery. The threshold mean rides the
    exact-decimal discipline so the `<` boundary is bit-identical to the
    oracle's correlated form."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2) * (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_thr")
    )
    from pyspark.sql.functions import broadcast

    sel = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
    )
    return sel.agg(
        (F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )
