"""Event-analytics queries: ordered funnel conversion, cohort retention,
and OHLC time bars. The reference delegates this whole family to its source
RDBMS's SQL surface (reference EtlMain.kt:103-108 passes the extract string
verbatim); here each is a native Spark plan engineered for one (or zero)
extra shuffles at 100 TB.

Cross-engine determinism notes:
- Funnel step times chain strict `>` comparisons on the raw microsecond
  timestamps — no same-instant ambiguity can change a count.
- OHLC open/close are picked with min_by/max_by over a packed BIGINT
  ordering key (in-bucket micros << 31 | event_id low bits) because DuckDB's
  arg_min/arg_max accept scalar sort keys only and a string key would demote
  Spark's aggregate to SortAggregate; the composite key makes
  equal-timestamp picks deterministic.
- Day offsets are cast to INT on both sides (DuckDB date_diff returns
  BIGINT, Spark datediff returns INT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import dec2, dsum, register, t

# Strict ordered funnel over the events fixture: view -> click -> purchase.
_STEPS = ("view", "click", "purchase")


@register(
    "q_funnel",
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ), per_user AS (
        SELECT DISTINCT user_id, t1, t2, t3 FROM w3
    )
    SELECT count(*) AS n_users,
           count(t1) AS n_step1_view,
           count(t2) AS n_step2_click,
           count(t3) AS n_step3_purchase
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (view -> click -> purchase): per user, step N's
    timestamp is the earliest qualifying event strictly after step N-1's.

    Plan: the three conditional mins share one whole-partition window spec
    (partitionBy user_id, no ordering), so the chain costs exactly ONE hash
    shuffle and zero sorts; the per-user distinct reuses that clustering and
    the final count is a tiny global agg. At 100 TB this is the canonical
    one-pass funnel — no self-joins, no per-step rescans of the event log."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == _STEPS[0], F.col("ts"))).over(w)
    staged = ev.select("user_id", "event_type", "ts").withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == _STEPS[1]) & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when((F.col("event_type") == _STEPS[2]) & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(w)
    per_user = staged.withColumn("t3", t3).select("user_id", "t1", "t2", "t3").distinct()
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_step1_view"),
        F.count("t2").alias("n_step2_click"),
        F.count("t3").alias("n_step3_purchase"),
    )


@register(
    "q_retention_cohort",
    oracle="""
    WITH seen AS (
        SELECT user_id, ts,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    )
    SELECT CAST(date_trunc('day', first_ts) AS DATE) AS cohort_day,
           CAST(date_diff('day', CAST(date_trunc('day', first_ts) AS DATE),
                                 CAST(date_trunc('day', ts) AS DATE)) AS INTEGER)
               AS day_offset,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM seen
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, activity
    counted at each day offset from the cohort day.

    Plan: the cohort day comes from a whole-partition window min (ONE hash
    shuffle on user_id, no sort, no join-back — the classic two-scan
    `first_events JOIN events` formulation is a second shuffle this avoids);
    the (cohort, offset) rollup is a partial-aggregated groupBy. Cohort
    cardinality is bounded by the calendar, so the final agg is tiny at any
    data scale."""
    ev = t(spark, sf_dir, "events")
    first_ts = F.min("ts").over(Window.partitionBy("user_id"))
    seen = ev.select("user_id", "ts").withColumn(
        "cohort_day", F.to_date(F.date_trunc("day", first_ts))
    )
    return (
        seen.withColumn(
            "day_offset",
            F.datediff(F.to_date(F.date_trunc("day", F.col("ts"))), F.col("cohort_day")),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# Packed BIGINT ordering key for the open/close picks. A string key would be
# lexicographically correct but its immutable buffer demotes Spark's
# aggregate to SortAggregate (per-map-task sort); a long keeps it a true
# HashAggregate. Layout: in-bucket microsecond offset (< 3.6e9, 32 bits for
# an hour bucket) << 31 | event_id's low 31 bits — 63 bits total, no ANSI
# overflow. Ties need two events in the same MICROSECOND whose ids also
# collide mod 2^31; ids below 2^31 (any realistic per-source id space) make
# the key exact.
_TIE_MOD = 2_147_483_648  # 2^31

_SQL_ORD = (
    "(epoch_us(ts) - epoch_us(date_trunc('hour', ts))) * 2147483648"
    " + (event_id % 2147483648)"
)


def _ord_key() -> F.Column:
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    ep_hour = F.unix_micros(F.date_trunc("hour", F.col("ts")).cast("timestamp"))
    return (ep - ep_hour) * F.lit(_TIE_MOD) + F.pmod(F.col("event_id"), F.lit(_TIE_MOD))


@register(
    "q_time_ohlc",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           arg_min(value, {_SQL_ORD}) AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           arg_max(value, {_SQL_ORD}) AS close_v,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def q_time_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close are the first/last value
    by (ts, event_id), high/low the extremes, volume the exact decimal sum.

    Plan: pure hash aggregation — min_by/max_by over the packed long key
    carry (value, key) pairs through Spark's partial+final aggregation, so
    the bars build map-side with NO sort anywhere and one shuffle keyed by
    (hour, type). That is the shape a 100 TB tick store needs: per-group
    state is O(1) regardless of group size, unlike a first_value window
    (sorts every partition) or a string-keyed min_by (demotes to
    SortAggregate)."""
    ev = t(spark, sf_dir, "events")
    keyed = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "event_type",
        "value",
        # Masked ordering key: a NULL-valued tick isn't a price, so it must
        # not become a bar's open/close. min_by/max_by skip NULL-ord rows
        # (min/max ignore NULLs), exactly DuckDB arg_min/arg_max's
        # NULL-value skipping (fuzz_diff phase 3).
        F.when(F.col("value").isNotNull(), _ord_key()).alias("ord_key"),
    )
    return keyed.groupBy("bucket", "event_type").agg(
        F.min_by("value", "ord_key").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", "ord_key").alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "volume"),
    )


@register(
    "q_funnel_window",
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                                AND ts <= t1 + INTERVAL 1 HOUR THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                                AND ts <= t2 + INTERVAL 24 HOURS THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ), per_user AS (
        SELECT DISTINCT user_id, t1, t2, t3 FROM w3
    )
    SELECT count(*) AS n_users,
           count(t1) AS n_step1_view,
           count(t2) AS n_step2_click_1h,
           count(t3) AS n_step3_purchase_24h,
           CASE WHEN count(t1) > 0
                THEN CAST(count(t3) AS DOUBLE) / count(t1) END AS conv_rate
    FROM per_user
    """,
)
def q_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: click must land within 1 hour of the first
    view, purchase within 24 hours of that click — the standard
    product-analytics form (an unbounded funnel overcounts users who
    convert weeks later). Same one-shuffle plan as q_funnel: the window
    bounds are plain timestamp comparisons against the previous step's
    whole-partition min, so the three chained conditional mins still share
    a single hash exchange with zero sorts."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == _STEPS[0], F.col("ts"))).over(w)
    staged = ev.select("user_id", "event_type", "ts").withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == _STEPS[1])
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == _STEPS[2])
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS")),
            F.col("ts"),
        )
    ).over(w)
    per_user = staged.withColumn("t3", t3).select("user_id", "t1", "t2", "t3").distinct()
    n1, n3 = F.count("t1"), F.count("t3")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        n1.alias("n_step1_view"),
        F.count("t2").alias("n_step2_click_1h"),
        n3.alias("n_step3_purchase_24h"),
        F.when(n1 > 0, n3.cast("double") / n1).alias("conv_rate"),
    )


@register(
    "q_scd2_build",
    # The `pv <> value` compare below is NULL-UNSAFE ON BOTH ENGINES BY
    # DESIGN (change-collapse semantics: a NULL on either side is "no
    # detectable change", so the run is not split) and the Spark side
    # mirrors it exactly — fuzz-proven in r8's <> audit. Do NOT convert
    # to IS DISTINCT FROM (the q_table_diff fix does not generalize here:
    # table_diff's CONTRACT is null-safe, scd2's collapse is not).
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type, value,
               lag(event_type) OVER w AS pet,
               lag(value) OVER w AS pv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, ts, event_id, event_type, value
        FROM ordered
        WHERE pet IS NULL OR pet <> event_type OR pv <> value
    )
    SELECT user_id,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current,
           event_type, value
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: collapse
    consecutive no-change records, then give every surviving version a
    [valid_from, valid_to) validity interval (open-ended = current row) —
    the warehouse primitive that turns an event stream into a
    point-in-time-joinable dimension (the as-of join's natural build
    side, operators/asof.py).

    One shuffle total: the change-detection lag pass and the
    validity-interval lead/row_number pass share the same (user) hash
    partitioning, so Catalyst plans a single exchange with two
    back-to-back window sorts. Change detection compares raw attribute
    values (no arithmetic), so cross-engine equality is exact."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("pet"),
        F.lag("value").over(w).alias("pv"),
    )
    changes = ordered.where(
        F.col("pet").isNull()
        | (F.col("pet") != F.col("event_type"))
        | (F.col("pv") != F.col("value"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w2).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        "event_type",
        "value",
    )


@register(
    "q_outlier_mad",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        FROM lineitem GROUP BY l_returnflag
    ), dev AS (
        SELECT l.l_returnflag, abs(l.l_quantity - m.med) AS adev, m.med
        FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    ), mad AS (
        SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           any_value(d.med) AS med,
           any_value(a.mad) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           count(*) AS n
    FROM dev d JOIN mad a ON d.l_returnflag = a.l_returnflag
    GROUP BY d.l_returnflag
    """,
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD (median absolute
    deviation): flag values more than 3 MADs from their group median —
    the quality gate that, unlike mean/stddev z-scores (q_feat_scale),
    no outlier can itself corrupt. ONE row-proportional pass: the raw
    rows collapse into a per-(group, value) histogram up front (map-side
    combine shrinks the only shuffle to |distinct quantities| per group),
    and the median, the deviation table, the MAD, and the outlier counts
    are all computed over those histogram cells — the naive plan's three
    lineitem scans (median pass, deviation pass, count pass) become one.
    The percentile arithmetic is operators/percentile.py's quantile_cont
    machinery (percentiles_from_hist), the tiny median/MAD tables
    broadcast back, and the deviation arithmetic is a fixed double
    expression, so both engines agree bit-for-bit. NULL quantities carry
    no deviation (never outliers) but still count in n, matching the
    oracle's COUNT(*) vs NULL-propagating CASE."""
    from ..operators.percentile import percentiles_from_hist
    from ..plans.tuning import ensure_parallelism

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    # The histogram feeds THREE consumers (median, deviation/MAD, final
    # counts); without a cut point Catalyst plans an independent scan +
    # shuffle per consumer (pushed-filter differences defeat ReuseExchange).
    # localCheckpoint pins the domain-bounded cells once — the only
    # row-proportional work runs exactly once. Eager since r12: the three
    # consumers can land in concurrent broadcast-build stages, where a
    # lazy checkpoint double-computes (interleaved A/B: 2.349 -> 2.160 s
    # min over 6 pairs, median wash — and the hazard is gone).
    hist = (
        ensure_parallelism(li)
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    med = percentiles_from_hist(
        hist, ["l_returnflag"], "l_quantity", "c", {"med": 0.5}
    )
    # LEFT joins: percentiles_from_hist drops NULL cells before its groupBy,
    # so a group whose quantities are ALL NULL has no med/mad row. The oracle
    # keeps such a group (quantile_cont → NULL, the join on returnflag still
    # matches) with NULL med/mad, 0 outliers, n = COUNT(*); an inner join
    # here would silently erase it (ADVICE r4).
    cells = hist.join(F.broadcast(med), "l_returnflag", "left").select(
        "l_returnflag",
        "med",
        F.abs(F.col("l_quantity") - F.col("med")).alias("adev"),
        "c",
    )
    mad = percentiles_from_hist(cells, ["l_returnflag"], "adev", "c", {"mad": 0.5})
    return (
        cells.join(F.broadcast(mad), "l_returnflag", "left")
        .groupBy("l_returnflag")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), F.col("c")).otherwise(0)
            ).alias("n_outliers"),
            F.sum("c").alias("n"),
        )
    )


_DRIFT_BINS = 10


@register(
    "q_drift_tvd",
    oracle=f"""
    WITH b AS (
        SELECT CAST(min(o_totalprice) AS DOUBLE) AS mn,
               CAST(max(o_totalprice) AS DOUBLE) AS mx
        FROM orders
    ), binned AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-07-01'
                    THEN 'ref' ELSE 'cur' END AS split,
               least(CAST(floor((o_totalprice - mn) / (mx - mn)
                                * {_DRIFT_BINS}) AS BIGINT),
                     {_DRIFT_BINS - 1}) AS bin
        FROM orders CROSS JOIN b
    ), counts AS (
        SELECT bin,
               CAST(count(*) FILTER (split = 'ref') AS BIGINT) AS n_ref,
               CAST(count(*) FILTER (split = 'cur') AS BIGINT) AS n_cur
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT CAST(sum(n_ref) AS DOUBLE) AS t_ref,
               CAST(sum(n_cur) AS DOUBLE) AS t_cur
        FROM counts
    )
    SELECT bin, n_ref, n_cur,
           abs(CAST(n_ref AS DOUBLE) / t_ref - CAST(n_cur AS DOUBLE) / t_cur)
               AS abs_share_diff
    FROM counts CROSS JOIN tot
    """,
)
def q_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring between a reference window and the
    current one (orders before vs after mid-1996): equal-width bins over
    the global value span, per-bin share difference — summing
    abs_share_diff/2 downstream gives total-variation distance, the
    log-free drift metric (PSI's ln(p/q) would hit libm divergence
    between engines AND blow up on empty bins; TVD does neither).

    One pass builds both histograms (conditional counts share one
    grouped aggregate); the bounds come from a 1-row min/max broadcast.
    Integer counts divide by totals once at the end — every double is
    derived from exact integers, so both engines agree bit-for-bit."""
    o = t(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").cast("double").alias("mn"),
        F.max("o_totalprice").cast("double").alias("mx"),
    )
    binned = o.crossJoin(F.broadcast(b)).select(
        F.when(
            F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"), "ref"
        )
        .otherwise("cur")
        .alias("split"),
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _DRIFT_BINS
            ).cast("long"),
            F.lit(_DRIFT_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("split") == "ref").alias("n_ref"),
        F.count_if(F.col("split") == "cur").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.abs(
            F.col("n_ref").cast("double") / F.col("t_ref")
            - F.col("n_cur").cast("double") / F.col("t_cur")
        ).alias("abs_share_diff"),
    )


def attribution_touch_key(secs: Column, touch_id: Column) -> Column:
    """Fixed-width string ordering key for (epoch-seconds, touch-id):
    zero-padded offset seconds (12 digits) ++ zero-padded id (10 digits),
    so lexicographic order == numeric order. Fail-loud outside the
    lpad-safe domain — secs in [-1e11, 9e11), id in [0, 1e10) — because
    truncation would mis-order silently AND identically in both engines
    (the one failure the differential gate cannot see). Unit-pinned in
    tests/test_timeseries.py; q_attribution's docstring carries the full
    why-a-string rationale."""
    return F.when(
        secs.between(-100000000000, 899999999999)
        & touch_id.between(0, 9999999999),
        F.concat(
            F.lpad((secs + F.lit(100000000000)).cast("string"), 12, "0"),
            F.lpad(touch_id.cast("string"), 10, "0"),
        ),
    ).otherwise(F.raise_error(F.lit("attribution key out of domain")))


@register(
    "q_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type IN ('view', 'click')
    ), joined AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               t.event_id AS touch_id, t.ts AS touch_ts
        FROM p JOIN touch t
          ON t.user_id = p.user_id
         AND t.ts > p.ts - INTERVAL 1 HOUR
         AND t.ts <= p.ts
    ), keyed AS (
        SELECT *,
               CASE WHEN epoch_us(touch_ts) // 1000000
                         BETWEEN -100000000000 AND 899999999999
                         AND touch_id BETWEEN 0 AND 9999999999
                    THEN lpad(CAST(epoch_us(touch_ts) // 1000000
                                   + 100000000000 AS VARCHAR), 12, '0')
                         || lpad(CAST(touch_id AS VARCHAR), 10, '0')
                    ELSE error('attribution key out of domain') END AS k
        FROM joined
    )
    SELECT purchase_id, user_id,
           COUNT(*) AS n_touches,
           arg_min(touch_id, k) AS first_touch,
           arg_max(touch_id, k) AS last_touch
    FROM keyed GROUP BY purchase_id, user_id
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase credits the FIRST and LAST
    view/click touch inside its trailing 1-hour window (first-touch /
    last-touch in one pass), plus the touch count. The interval join is
    the verified q_join_interval shape; the winners are ONE min_by/max_by
    pair on a packed fixed-width STRING key (scalar, so both engines'
    arg_min/arg_max accept it). The string buffer demotes the winner
    aggregate to SortAggregate (immutable buffer field — the q_time_ohlc
    finding); that is the accepted price of the overflow-free key: the
    BIGINT pack ANSI-overflows on clock-skewed rows and a DECIMAL key is
    silently wrong in DuckDB arg_min/arg_max (inline comment below).
    Measured healthy at 100x (13.1 s @10M events) — the interval join,
    not the winner sort, dominates."""
    ev = t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("ts").alias("touch_ts")
    )
    joined = p.join(
        touch,
        (p.user_id == touch.user_id)
        & (F.col("touch_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("touch_ts") <= F.col("p_ts")),
    ).select("purchase_id", p.user_id, "touch_id", "touch_ts")
    # (epoch SECONDS | id low bits) packed as a FIXED-WIDTH STRING:
    # zero-padded offset seconds (12 digits, +1e11 keeps the whole
    # timestamp domain non-negative) ++ zero-padded id (10 digits), so
    # lexicographic order == numeric order. Why not numeric packs: the
    # original BIGINT secs*2^32 overflows past 2038 / before 1832 (ANSI
    # throws — one clock-skewed touch killed the sf0.01 phase-4 fuzz),
    # and a DECIMAL(38,0) key is silently WRONG in DuckDB 1.0 arg_min/
    # arg_max (returns a non-extreme row while max() over the same key is
    # right — minimal repro in NOTES "Round 6"). Seconds come from `div`,
    # which truncates toward zero on BOTH engines (pinned in
    # tests/test_timeseries.py), so pre-epoch keys agree; the key is
    # ordering-only. The string buffer costs a SortAggregate (immutable
    # buffer fields demote — the q_time_ohlc finding), accepted here
    # because no overflow-free scalar alternative exists: the guarded
    # domain spans 1e12 seconds x 1e10 ids = 1e22 > 2^63, too wide for
    # any BIGINT pack. Fail-loud domain guard (ADVICE r6, widened
    # ADVICE r7): past the 12-digit window (secs outside [-1e11, 9e11)) or
    # a touch_id outside [0, 1e10) lpad would truncate / mis-order
    # SILENTLY AND IDENTICALLY in both engines — the one failure shape the
    # differential gate cannot see — so such rows raise instead (the
    # oracle carries the same error() branch). The id packs RAW, no
    # modulo: '% 2^32' collapsed equal-second touches whose ids differ by
    # 2^32 onto one key — the arbitrary-tiebreak class this guard exists
    # to kill; lpad width 10 already fits the whole guarded domain.
    secs = F.expr("unix_micros(CAST(touch_ts AS TIMESTAMP)) div 1000000")
    key = attribution_touch_key(secs, F.col("touch_id"))
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.min_by("touch_id", key).alias("first_touch"),
        F.max_by("touch_id", key).alias("last_touch"),
    )


@register(
    "q_stats_ks",
    oracle="""
    WITH s AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS isa
        FROM documents WHERE lang IN ('en', 'de')
    ), tot AS (
        SELECT CAST(SUM(isa) AS BIGINT) AS n1,
               CAST(SUM(1 - isa) AS BIGINT) AS n2
        FROM s
    ), g AS (
        SELECT v, CAST(SUM(isa) AS BIGINT) AS a,
               CAST(SUM(1 - isa) AS BIGINT) AS b
        FROM s GROUP BY v
    ), c AS (
        SELECT v,
               CAST(SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
               CAST(SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
        FROM g
    ), d AS (
        SELECT v, c1, c2,
               abs(CAST(c1 AS DECIMAL(38,0)) * n2
                   - CAST(c2 AS DECIMAL(38,0)) * n1) AS diff,
               n1, n2
        FROM c CROSS JOIN tot
    )
    SELECT n1, n2, v AS ks_at_value,
           CAST(floor(CAST(diff AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                      * 1000000) AS BIGINT) AS ks_ppm
    FROM d ORDER BY diff DESC, v ASC LIMIT 1
    """,
)
def q_stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (en vs de document lengths)
    — the nonparametric drift gate that complements q_drift_tvd's binned
    TVD with an exact, binning-free answer. The whole computation is
    INTEGER: per-value counts, one windowed cumulative pass, and the sup
    as max |c1*n2 - c2*n1| in DECIMAL (exact at any corpus size; the
    long product overflows past ~3e9 rows/side). Only the final
    normalized statistic touches floats, as a quantized ppm. Shuffle
    carries |distinct values| rows — the histogram trick from
    q_agg_percentile; the unbounded window runs over distinct values,
    not rows."""
    d = t(spark, sf_dir, "documents")
    s = d.where(F.col("lang").isin("en", "de")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("isa"),
    )
    tot = s.agg(
        F.sum("isa").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("isa")).cast("long").alias("n2"),
    )
    g = s.groupBy("v").agg(
        F.sum("isa").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("isa")).cast("long").alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "v",
        F.sum("a").over(w).cast("long").alias("c1"),
        F.sum("b").over(w).cast("long").alias("c2"),
    )
    dd = c.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("c1").cast("decimal(38,0)") * F.col("n2")
            - F.col("c2").cast("decimal(38,0)") * F.col("n1")
        ).alias("diff"),
    )
    return (
        dd.orderBy(F.desc("diff"), F.asc("v"))
        .limit(1)
        .select(
            "n1",
            "n2",
            F.col("v").alias("ks_at_value"),
            F.floor(
                F.col("diff").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
                * 1000000
            )
            .cast("long")
            .alias("ks_ppm"),
        )
    )


@register(
    "q_feat_target_encode",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority AS cat, COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(s) AS DOUBLE) AS st
        FROM g
    )
    SELECT o.o_orderkey, o.o_orderpriority AS cat,
           (CAST(g.s AS DOUBLE) + 10.0 * (tot.st / tot.nt))
               / (n + 10.0) AS enc_smooth,
           CASE WHEN n > 1 THEN
               CAST(g.s - CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                   / (n - 1.0)
           END AS enc_loo
    FROM orders o
    JOIN g ON o.o_orderpriority = g.cat
    CROSS JOIN tot
    """,
)
def q_feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding for a categorical feature (the GBDT/tabular-ML
    staple): per-category smoothed target mean (prior weight m=10) plus
    the LEAVE-ONE-OUT encoding that prevents target leakage in training
    folds — LOO is (sum - own)/(n-1) from EXACT decimal sums, so no
    per-row re-aggregation and no float drift. The category stats table
    is attribute-domain-sized, broadcast back onto the scan: one
    aggregation + one map-side join at any scale."""
    o = t(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec2("o_totalprice")).alias("s")
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("s").cast("double").alias("st")
    )
    return (
        o.join(
            F.broadcast(g), o["o_orderpriority"] == g["cat"]
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "cat",
            (
                (F.col("s").cast("double") + F.lit(10.0) * (F.col("st") / F.col("nt")))
                / (F.col("n") + F.lit(10.0))
            ).alias("enc_smooth"),
            # singleton categories would give 0.0/0.0 -> NaN on both
            # engines (a hash-stability hazard); emit NULL instead
            F.when(
                F.col("n") > 1,
                (F.col("s") - dec2("o_totalprice")).cast("double")
                / (F.col("n") - F.lit(1.0)),
            ).alias("enc_loo"),
        )
    )


@register(
    "q_win_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id, length(s) AS seq_len,
           CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_funnels,
           CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS n_error_bursts
    FROM seq
    """,
)
def q_win_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): each user's
    time-ordered event-type initials collapse into one string, and
    behavioral patterns become regexes — view->clicks->purchase funnels
    (v c* p) and error bursts (ee+), counted with non-overlapping scan
    semantics that Java regex and RE2 share. The per-user sequence is
    built by an ORDER-pinned aggregation (struct sort keyed on
    (ts, event_id) — deterministic under any partial-agg order); per-key
    state is the user's own history, the same bound a MATCH_RECOGNIZE
    engine carries. One shuffle; patterns evaluate scan-fused."""
    ev = t(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("rec")), lambda r: r.getField("c")
                ),
                "",
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.regexp_count("s", F.lit("vc*p")).cast("long").alias("n_funnels"),
        F.regexp_count("s", F.lit("ee+")).cast("long").alias("n_error_bursts"),
    )


@register(
    "q_dq_profile",
    oracle="""
    SELECT 'o_orderkey' AS col, COUNT(o_orderkey) AS n_filled,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(o_orderstatus),
           COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(o_orderpriority),
           COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(o_totalprice),
           COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler — the dataset-onboarding summary (null rate,
    cardinality, bounds) every ingestion pipeline snapshots before and
    after a load. All four column profiles compute in ONE aggregation
    over ONE scan: a single agg() carries every measure (count,
    count-distinct, min, max per column — Catalyst plans the multiple
    distinct aggregates via Expand), and the 1-row result reshapes into
    one row per column with an explode of 4 structs — no per-column
    re-scan. Bounds render as strings through the exact DECIMAL path for
    floats so the hash is format-stable; output is O(columns), never
    O(rows)."""
    o = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]

    def measures(c):
        mn = (
            F.min(dec2(c)).cast("string")
            if c == "o_totalprice"
            else F.min(c).cast("string")
        )
        mx = (
            F.max(dec2(c)).cast("string")
            if c == "o_totalprice"
            else F.max(c).cast("string")
        )
        return [
            F.count(c).alias(f"nf_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            mn.alias(f"mn_{c}"),
            mx.alias(f"mx_{c}"),
        ]

    agg = o.agg(*[m for c in cols for m in measures(c)])
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"nf_{c}").alias("n_filled"),
                F.col(f"nn_{c}").alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(rows).alias("p")).select("p.*")
