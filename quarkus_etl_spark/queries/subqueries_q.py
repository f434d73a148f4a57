"""Tier-B subqueries / CTEs (SURVEY.md §2 "Subqueries / CTEs").

These run through `spark.sql` over the registered fixture views — Catalyst
decorrelates the correlated EXISTS and plans scalar/IN subqueries natively.
Scalar-subquery thresholds use the exact-decimal mean so the comparison
boundary is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import ensure_views, register

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
