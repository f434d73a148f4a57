"""Tier-B window functions (SURVEY.md §2 "Window functions").

Every window ORDER BY carries a full-key tiebreak so row_number/lag frames
are deterministic across engines (SURVEY.md §7.4 item 2). Running sums go
through DECIMAL so the prefix accumulation is exact rather than
order-of-float-addition dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import dec2, register, t


@register(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. At scale this is the shuffle-once pattern:
    one hash partition by key, per-partition sort, no global sort."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        ).where(F.col("rn") <= 3)
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@register(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER (ORDER BY o_totalprice ASC NULLS FIRST,
                          o_orderkey ASC) AS quartile
    FROM orders
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    # NULLS FIRST pinned on BOTH engines: Spark's ASC default is nulls-first,
    # DuckDB's is nulls-LAST — an unpinned sort diverges the moment a
    # totalprice is NULL (found by the phase-3 NULL-measure fuzz).
    w = Window.orderBy(
        F.col("o_totalprice").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey", "o_totalprice", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "q_win_distribution",
    # percent_rank/cume_dist return exact small-denominator rationals; the
    # same integer division happens in both engines, so doubles match.
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) /
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey) AS DOUBLE)
               AS share
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions + ratio-to-report: each order's
    percentile standing and revenue share within its customer. The share
    divides exact decimals (one deterministic decimal division per row),
    so partial-aggregation order cannot skew the quotient."""
    o = t(spark, sf_dir, "orders")
    # nulls-first pinned on both engines (DuckDB ASC defaults nulls-LAST)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    wp = Window.partitionBy("o_custkey")
    # double-of-exact-decimal on both sides of ONE double division: decimal
    # division scale rules differ between engines, double division does not.
    share = dec2("o_totalprice").cast("double") / F.sum(dec2("o_totalprice")).over(wp).cast(
        "double"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        share.alias("share"),
    )


@register(
    "q_win_moving",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS trail7_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS trail7_avg,
           COUNT(*) OVER w AS trail7_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS-frame rolling features (trailing-7-orders spend/mean) —
    the per-entity feature-engineering window every ML pipeline computes.
    One shuffle on the partition key, a bounded frame the executor slides
    in O(1) per row; the ORDER BY carries the key tiebreak so the frame
    contents are deterministic under ties. Mean = exact decimal sum /
    frame count (one double division, same tree as the oracle)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    s = F.sum(dec2("o_totalprice")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        s.alias("trail7_spend"),
        (s / n).alias("trail7_avg"),
        n.alias("trail7_n"),
    )


@register(
    "q_win_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS anchor
        FROM days
    )
    SELECT user_id,
           min(d) AS streak_start,
           max(d) AS streak_end,
           CAST(count(*) AS BIGINT) AS streak_days
    FROM grp GROUP BY user_id, anchor
    """,
)
def q_win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands on the calendar: each user's runs of CONSECUTIVE
    active days (streak detection — the retention/engagement primitive
    sessionize can't express, because the gap here is measured in
    calendar days over a DISTINCT-day set, not event-to-event time). The
    classic anchor trick: date minus dense row-number is constant within
    a consecutive run, so one distinct + one window + one groupBy —
    two shuffles total, both on the user key."""
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return grp.groupBy("user_id", "anchor").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("anchor")


# --------------------------------------------------------------------------
# Truncated exponential moving average (binary-exact weights)
# --------------------------------------------------------------------------

_EMA_LAGS = 8  # alpha = 1/2: weights 2^-j are EXACT doubles


def _ema_sql() -> str:
    num = " + ".join(
        f"COALESCE(lag(v, {j}) OVER w * {0.5 ** j!r}, 0.0)" for j in range(_EMA_LAGS)
    )
    den = " + ".join(
        f"CASE WHEN lag(v, {j}) OVER w IS NOT NULL THEN {0.5 ** j!r} ELSE 0.0 END"
        for j in range(_EMA_LAGS)
    )
    return f"""
    SELECT event_id, user_id, ts, v AS value,
           ({num}) / ({den}) AS ema
    FROM (
        SELECT event_id, user_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """


@register("q_win_ema", oracle=_ema_sql())
def q_win_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponential moving average (alpha=1/2, 8 lags) of each
    user's purchase values — the smoothing operator behind trend lines and
    anomaly baselines. True EMA is a sequential recurrence; the truncated
    form (weights 2^-j vanish past ~8 lags) is the standard parallel
    rewrite: 8 lag() reads over ONE window pass, no recurrence. Weights
    2^-j are EXACT doubles (exponent shifts), the numerator/denominator
    are summed in the same textual order on both engines, so the result
    is bit-deterministic. Short histories renormalize by the weight mass
    actually present. One shuffle on user_id; per-row state is 8 lags."""
    ev = t(spark, sf_dir, "events")
    pts = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "event_id", "user_id", "ts", dec2("value").cast("double").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    num = None
    den = None
    for j in range(_EMA_LAGS):
        x = F.lag("v", j).over(w)
        wj = F.lit(0.5**j)
        nj = F.coalesce(x * wj, F.lit(0.0))
        dj = F.when(x.isNotNull(), wj).otherwise(F.lit(0.0))
        num = nj if num is None else num + nj
        den = dj if den is None else den + dj
    return pts.select(
        "event_id", "user_id", "ts", F.col("v").alias("value"), (num / den).alias("ema")
    )
