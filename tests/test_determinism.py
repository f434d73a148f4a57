"""Determinism contracts (SURVEY.md §7.4): results must be bit-identical
under different physical partitionings — the property that lets the same
query hash-match DuckDB from a laptop or a 1000-executor cluster — plus
edge-case guards for the text primitives."""

from __future__ import annotations

from pyspark.sql import functions as F

from quarkus_etl_spark.catalog import load_table
from quarkus_etl_spark.functions.text import ngrams, tokenize
from quarkus_etl_spark.queries.base import davg, dsum


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_decimal_aggregates_invariant_under_partitioning(spark, sf_dir):
    """The decimal-exact sum/avg discipline: any repartitioning (different
    partial-aggregation splits, different add order) produces the same
    doubles bit-for-bit. Plain double sums do NOT have this property."""
    li = load_table(spark, sf_dir, "lineitem")
    def agg(df):
        return df.groupBy("l_returnflag").agg(
            dsum("l_extendedprice", "s"), davg("l_quantity", "a")
        )
    base = _rows(agg(li))
    for parts in (1, 7, 32):
        assert _rows(agg(li.repartition(parts))) == base
    # and under a skewed partitioner
    assert _rows(agg(li.repartition(13, "l_orderkey"))) == base


def test_window_rank_invariant_under_partitioning(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    def ranked(df):
        return df.select("o_orderkey", F.row_number().over(w).alias("rn"))
    assert _rows(ranked(o)) == _rows(ranked(o.repartition(17)))


def test_topk_deterministic_with_tiebreak(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    def topk(df):
        return df.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(10)
    assert _rows(topk(o)) == _rows(topk(o.repartition(29)))


def test_ngrams_short_input_is_empty_not_error(spark):
    df = spark.createDataFrame([("solo",), ("two words",), ("",)], "text string")
    out = df.select(ngrams(tokenize("text"), 2).alias("g")).collect()
    grams = [r["g"] for r in out]
    assert grams[0] == []  # 1 token -> no bigrams (and no ANSI index error)
    assert grams[1] == ["two words"]
    assert grams[2] == []


def test_generator_invariant_under_parallelism(spark):
    from quarkus_etl_spark.operators.generator import gen_addresses

    a = gen_addresses(spark, 300, seed=42)
    b = gen_addresses(spark, 300, seed=42).repartition(11)
    assert _rows(a) == _rows(b)


def test_sample_reproducible(spark, sf_dir):
    from quarkus_etl_spark.queries.relational import q_sample

    a = _rows(q_sample(spark, sf_dir))
    b = _rows(q_sample(spark, sf_dir))
    assert a == b and 0 < len(a) < 6000
