"""Tier-B scalar function families (SURVEY.md §2 "Scalar functions").

One query per family, each exercising several functions as aliased output
columns. All expressions are built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen; no Python UDFs on this path.

Cross-engine notes (SURVEY.md §7.4):
- `round` on doubles differs between engines at decimal boundaries (Spark
  rounds the shortest decimal repr HALF_UP; DuckDB rounds the binary value),
  so rounding here is only applied to irrational intermediates (sqrt, /7)
  where a boundary hit is impossible.
- Decimal outputs are rendered to strings to pin scale ("123.40" vs 123.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from .base import register, t


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up_name,
           LOWER(c_mktsegment) AS low_seg,
           SUBSTR(c_name, 1, 8) AS name8,
           c_name || '-' || c_mktsegment AS name_seg,
           TRIM('  ' || c_mktsegment || ' ') AS trimmed,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, 'Customer', 'Cust') AS replaced,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family. Mirrors the engine's uppercase normalization heritage
    (reference ClassMapMapper.kt:21)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(DAY FROM o_orderdate) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / 7, 4) AS price_div7,
           ABS(0.0 - l_discount) AS abs_disc,
           l_orderkey % 7 AS key_mod7,
           POWER(l_quantity, 2) AS qty_sq,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           CAST(FLOOR(l_extendedprice) AS DOUBLE) AS price_floor,
           CAST(CEIL(l_extendedprice) AS DOUBLE) AS price_ceil,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 4).alias("price_div7"),
        F.abs(F.lit(0.0) - F.col("l_discount")).alias("abs_disc"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        # Spark floor/ceil return BIGINT while DuckDB's return DOUBLE; both
        # sides are pinned to DOUBLE so the typed value-hash agrees
        # (round-1 hash FAIL: 100 vs 100.0).
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "q_fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                              ELSE 'partial' END AS status_label,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS prio,
           CASE WHEN o_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
    FROM orders
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unspecified")
        ).alias("prio"),
        F.when(F.col("o_custkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )


@register(
    "q_fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST('123' AS BIGINT) AS lit_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl
    FROM lineitem
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.lit("123").cast("long").alias("lit_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1] AS first_token,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_sort(F.array_distinct(toks)).getItem(0).alias("first_token"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


@register(
    "q_fn_map",
    # The oracle computes the same *values* without a map — Spark-side map
    # construction + lookup must round-trip to exactly these.
    oracle="""
    SELECT c_custkey, c_mktsegment AS seg_val, c_acctbal AS bal_val
    FROM customer
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment").cast("string"),
        F.lit("bal"), F.col("c_acctbal").cast("string"),
    )
    return c.select(
        "c_custkey",
        m.getItem("seg").alias("seg_val"),
        m.getItem("bal").cast("double").alias("bal_val"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    parsed = F.from_json(
        F.col("props"), StructType([StructField("k", IntegerType())])
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getItem("k").cast("long").alias("k_int"),
    )


@register(
    "q_fn_struct",
    # The oracle computes the same values WITHOUT a struct — Spark-side
    # nested construction + field access must round-trip to exactly these
    # (same contract shape as q_fn_map).
    oracle="""
    SELECT o_orderkey,
           o_custkey AS cust,
           o_totalprice AS price,
           o_orderpriority AS prio,
           CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket
    FROM orders
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, nesting, and field access: pack columns into a
    nested struct, then project fields back out — the round-trip every
    semi-structured pipeline (and every sink writing nested parquet)
    depends on."""
    o = t(spark, sf_dir, "orders")
    nested = F.struct(
        F.col("o_custkey").alias("cust"),
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("detail"),
    )
    packed = o.select("o_orderkey", nested.alias("s"))
    return packed.select(
        "o_orderkey",
        F.col("s.cust").alias("cust"),
        F.col("s.detail.price").alias("price"),
        F.col("s.detail.prio").alias("prio"),
        F.when(F.col("s.detail.price") > 100000, "big").otherwise("small").alias("bucket"),
    )


@register(
    "q_fn_hof",
    oracle="""
    WITH tk AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           LEN(LIST_FILTER(toks, x -> LEN(x) > 4)) AS n_long,
           LEN(LIST_FILTER(toks, x -> LEN(x) > 8)) > 0 AS any_very_long,
           LEN(LIST_FILTER(toks, x -> NOT LEN(x) < 12)) = 0 AS all_under_12,
           CAST(LIST_AGGREGATE(LIST_TRANSFORM(toks, x -> LEN(x)), 'sum')
                AS BIGINT) AS sum_len,
           CAST(LIST_AGGREGATE(LIST_TRANSFORM(toks, x -> LEN(x) * LEN(x)), 'sum')
                AS BIGINT) AS sum_len_sq
    FROM tk
    """,
)
def q_fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface head-on: filter / exists / forall /
    transform / aggregate over an array column, folded to scalars. These
    are the primitives the dedup/text operators compose internally; this
    query pins their direct API semantics against DuckDB's list_* family.
    HOF lambdas are CodegenFallback but live in a PROJECTION here (fine);
    the repo's rule is only to keep them out of Generate inputs
    (functions/text.py chunked docstring)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda x: F.length(x))
    zero = F.lit(0).cast("long")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.exists(toks, lambda x: F.length(x) > 8).alias("any_very_long"),
        F.forall(toks, lambda x: F.length(x) < 12).alias("all_under_12"),
        F.aggregate(lens, zero, lambda a, x: a + x).alias("sum_len"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x) * F.length(x)),
            zero,
            lambda a, x: a + x,
        ).alias("sum_len_sq"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_str,
           props IS NOT NULL AND json_valid(props) AS is_valid
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4): parse the JSON payload
    once into Variant's binary encoding, then extract typed fields with
    variant_get paths — the open-schema column a 100 TB event-log table
    stores instead of strings, because the binary form skips re-parsing
    on every access and shreds into columnar storage. Missing paths are
    NULL (not an ANSI error), and try_parse_json gates validity. The
    DuckDB oracle expresses the same accesses over its JSON type."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.missing", "string").alias("missing_str"),
        F.try_parse_json("props").isNotNull().alias("is_valid"),
    )


@register(
    "q_fn_collate",
    oracle="""
    WITH planted AS (
        SELECT lang,
               CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
                   AS variant
        FROM documents
    )
    SELECT lang,
           COUNT(DISTINCT variant) AS n_distinct_binary,
           COUNT(DISTINCT lower(variant)) AS n_distinct_ci
    FROM planted GROUP BY lang
    """,
)
def q_fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): distinct counts
    under binary vs case-insensitive (UTF8_LCASE) collation over a
    deterministically case-mangled column. The collated distinct is the
    engine-native form of `lower()`-normalized matching — the DuckDB
    oracle states the same semantics with lower(); only counts are
    emitted (a collated GROUP BY's representative value is
    engine-chosen, so values themselves are not hash-stable)."""
    d = t(spark, sf_dir, "documents")
    variant = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    planted = d.select("lang", variant.alias("variant"))
    return planted.groupBy("lang").agg(
        F.countDistinct("variant").alias("n_distinct_binary"),
        F.countDistinct(F.collate(F.col("variant"), "UTF8_LCASE")).alias(
            "n_distinct_ci"
        ),
    )
