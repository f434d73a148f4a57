"""Tier-B UDF/UDAF/UDTF surface (SURVEY.md §2).

The reference has no UDF story of its own (its functions are whatever the
source engine ships); ours is the native Spark ladder, slowest to fastest:
row-at-a-time Python UDF (q_udf_scalar — demonstrated, but the slow path),
Arrow-vectorized pandas UDF (q_udf_pandas — the 100TB-scale way to run
Python), grouped applyInPandas UDAF, and explode/posexplode as the built-in
table-function path.

Oracle determinism: pandas/numpy float ops are per-row IEEE (no
accumulation), and the grouped UDAF only sums integer-valued doubles
(exact in any order), so results hash-match SQL exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .base import register, t


@register(
    "q_udf_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier
    FROM customer
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — correct, but the slow path (ser/de per
    row). Kept in the inventory because the surface exists; real pipelines
    should use q_udf_pandas' shape."""

    @F.udf(returnType=StringType(), useArrow=False)
    def tier(bal):
        if bal < 0:
            return "debt"
        if bal < 5000:
            return "standard"
        return "premium"

    c = t(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_acctbal", tier("c_acctbal").alias("tier"))


@register(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched vectorized UDF: numpy does one IEEE multiply per row —
    bit-identical to the SQL expression, ~10-100x faster than a row UDF."""

    @F.pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via applyInPandas. Each group arrives as
    one pandas DataFrame (Arrow batches); quantities are integer-valued
    doubles, so the pandas sum is exact and order-insensitive."""

    def group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL NULL semantics by hand: pandas .sum() over an all-NaN column
        # returns 0.0 (skipna default) where SQL SUM returns NULL —
        # min_count=1 forces NaN, mapped to None so Arrow emits a null
        # double, not a NaN (found by the phase-3 all-NULL-group fuzz).
        qsum = pdf["l_quantity"].sum(min_count=1)
        pmax = pdf["l_extendedprice"].max()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n_rows": [len(pdf)],
                "sum_qty": [None if pd.isna(qsum) else float(qsum)],
                "max_price": [None if pd.isna(pmax) else float(pmax)],
            }
        )

    # Project to the 4 referenced columns BEFORE the grouped-map stage:
    # every column kept is Arrow-serialized into Python for every row, and
    # the scan prune doesn't happen automatically through applyInPandas.
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    # Salted two-phase execution — the scale pattern for grouped UDAFs:
    # only 6 (flag, status) groups exist, which would serialize the Arrow
    # work onto 6 cores (or one straggler executor at cluster scale). The
    # pandas phase runs per (group, salt) partial — full parallelism — and
    # a built-in aggregation combines partials (counts/sums/max all
    # combine losslessly; sums are integer-valued doubles, exact in any
    # order).
    salted = li.withColumn("__salt", F.pmod(F.hash("l_quantity"), F.lit(32)))
    partials = salted.groupBy("l_returnflag", "l_linestatus", "__salt").applyInPandas(
        lambda pdf: group_stats(pdf.drop(columns="__salt")),
        schema="l_returnflag string, l_linestatus string, n_rows long, "
        "sum_qty double, max_price double",
    )
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_qty").alias("sum_qty"),
        F.max("max_price").alias("max_price"),
    )


@register(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1 row -> N rows) via posexplode; 1-based position to
    match SQL subscript convention."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token"))
        .select("doc_id", "token", (F.col("pos0") + 1).cast("long").alias("pos"))
    )


@register(
    "q_udtf_python",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Python UDTF surface (Spark 4 `@udtf` class, registered
    and invoked through LATERAL correlation) — one input row fans out to
    N output rows from arbitrary Python. Same contract as q_udtf_explode
    so the oracle is shared; like q_udf_scalar it exists to pin the API
    surface, while the built-in posexplode form remains the 100 TB path
    (JVM Generate vs per-row Python worker round-trips)."""
    from pyspark.sql.functions import udtf
    from .base import ensure_views

    @udtf(returnType="token string, pos bigint")
    class SplitWords:
        def eval(self, text: str):
            # NULL text fans out to ZERO rows — the same contract as the
            # built-in posexplode(split(...)) form and the oracle's
            # unnest-of-NULL ("" would instead mint one ghost token per
            # missing doc; fuzz_diff phase 3).
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1

    ensure_views(spark, sf_dir)
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        "SELECT doc_id, s.token, s.pos FROM documents, LATERAL split_words(text) s"
    )


@register(
    "q_udf_arrow",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           c_acctbal + 100.0 AS projected
    FROM customer
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The middle rung of the Python ladder (Spark 4 `useArrow=True`):
    row-at-a-time Python SEMANTICS with Arrow-batched TRANSFER — no
    pickle per row, columnar ser/de like a pandas UDF, but the function
    still sees scalars (no vectorization work for the author). ~2-10x
    over pickled row UDFs; q_udf_pandas remains the fully-vectorized
    fast path. The numeric column is a single IEEE add — the identical
    op in Python and SQL, so no rounding-rule divergence can appear
    (Python round() is half-even, DuckDB's is half-away: never round in
    a cross-engine UDF contract)."""

    @F.udf(returnType="string", useArrow=True)
    def tier(bal):
        if bal < 0:
            return "debt"
        if bal < 5000:
            return "standard"
        return "premium"

    @F.udf(returnType="double", useArrow=True)
    def projected(bal):
        return bal + 100.0

    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        tier("c_acctbal").alias("tier"),
        projected("c_acctbal").alias("projected"),
    )


@register(
    "q_udf_cogroup",
    oracle="""
    WITH cd AS (
        -- key-dedup the dimension FIRST (min segment = deterministic
        -- pick): a double-ingested customer row must neither double the
        -- order counts (raw-join fan-out) nor emit two rows per key
        -- (post-agg merge fan-out) — phase-5 referential fuzz
        SELECT c_custkey, min(c_mktsegment) AS seg
        FROM customer GROUP BY c_custkey
    )
    SELECT cd.c_custkey,
           any_value(cd.seg) AS seg,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM cd JOIN orders o ON o.o_custkey = cd.c_custkey
    GROUP BY cd.c_custkey
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-sided Python surface: cogroup(...).applyInPandas — both
    tables grouped on the key, each key's pair of pandas frames handed to
    one Python function (the custom-join escape hatch when a combine
    genuinely can't be said relationally; here it deliberately CAN, so
    the SQL oracle pins it).

    Scale pattern that matters: cogroup on a HASH BUCKET of the real key,
    not the key itself — per-group Python invocation costs ~ms, so 15k
    natural customer groups cost ~30 s while 32 buckets cost ~1 s
    (measured); the per-customer work happens vectorized inside pandas
    (merge + groupby per bucket). Money is summed as exact integer cents
    (row order within a shuffled group is arbitrary — a float sum would
    hash-differently run to run), divided back once."""
    import pandas as pd  # noqa: F811

    def combine(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty or orders.empty:
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series(dtype="int64"),
                    "seg": pd.Series(dtype="object"),
                    "n_orders": pd.Series(dtype="int64"),
                    "total_price": pd.Series(dtype="float64"),
                }
            )
        o = orders.copy()
        # cents stay float64: a NULL totalprice is NaN here and astype
        # int64 would throw (phase-3 NULL-measure fuzz). Integer-valued
        # float sums are exact below 2^53, so order-insensitivity holds;
        # min_count=1 gives SQL SUM semantics (all-NULL group -> NULL,
        # NaN -> Arrow null on return); size() counts NULL rows like
        # COUNT(*).
        o["cents"] = (o["o_totalprice"] * 100).round()
        g = o.groupby("o_custkey")["cents"]
        agg = pd.DataFrame(
            {"n_orders": g.size(), "cents": g.sum(min_count=1)}
        ).reset_index()
        # key-dedup the dimension before the merge (min = deterministic,
        # matches the oracle's GROUP BY c_custkey): duplicate customer
        # rows must not fan the per-key aggregates (phase-5 fuzz)
        cd = (
            cust.groupby("c_custkey", as_index=False)["c_mktsegment"].min()
        )
        m = agg.merge(cd, left_on="o_custkey", right_on="c_custkey")
        return pd.DataFrame(
            {
                "c_custkey": m["c_custkey"].astype("int64"),
                "seg": m["c_mktsegment"],
                "n_orders": m["n_orders"].astype("int64"),
                "total_price": m["cents"].astype("float64") / 100.0,
            }
        )

    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.pmod("c_custkey", F.lit(32)).alias("bk")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.pmod("o_custkey", F.lit(32)).alias("bk")
    )
    return (
        c.groupBy("bk")
        .cogroup(o.groupBy("bk"))
        .applyInPandas(
            combine,
            "c_custkey long, seg string, n_orders long, total_price double",
        )
    )


@register(
    "q_udf_mapinarrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS disc_price
    FROM lineitem WHERE l_quantity > 25
    """,
)
def q_udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-copy Python rung: mapInArrow hands each partition as raw
    pyarrow RecordBatches — no pandas conversion at all, the cheapest
    possible Python boundary (the shape a custom columnar kernel or a
    GPU handoff would use). The filter + IEEE multiply run in pyarrow
    compute, matching the SQL oracle bit-for-bit."""

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            t_ = pa.Table.from_batches([b])
            t_ = t_.filter(pc.greater(t_.column("l_quantity"), 25.0))
            disc = pc.multiply(
                t_.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t_.column("l_discount")),
            )
            out = pa.table(
                {
                    "l_orderkey": t_.column("l_orderkey"),
                    "l_linenumber": t_.column("l_linenumber"),
                    "disc_price": disc,
                }
            )
            yield from out.to_batches()

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        kernel, "l_orderkey long, l_linenumber int, disc_price double"
    )


@register(
    "q_udf_window_pandas",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value * 100 AS BIGINT)) OVER w AS DOUBLE) / 100.0
               AS roll3_sum
    FROM (SELECT user_id, event_id, ts,
                 CAST(round(value * 100) AS BIGINT) / 100.0 AS value
          FROM events WHERE event_type = 'purchase' AND user_id % 4 = 0)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_udf_window_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last Python rung: a GROUPED_AGG pandas UDF evaluated OVER A
    WINDOW FRAME — arbitrary Python aggregation with rolling-frame
    semantics (each frame's values arrive as one pandas Series). The
    rolling money sum rides integer cents inside Python and in the SQL
    oracle, so frame-evaluation order (Spark per-row, DuckDB segment
    tree) can't leak into the double.

    Cost model to know: GROUPED_AGG-over-window invokes the UDF once per
    ROW'S FRAME (no sharing between overlapping frames) — inherently
    ~10-100x a built-in frame aggregate; it exists for aggregations SQL
    can't express. The query therefore runs on a quarter of the purchase
    users (user_id % 4 = 0, mirrored in the oracle): the API surface
    demonstrated without taxing the whole events table — VERDICT r4 #7
    caps this query's bench share at <= 4%."""
    import pandas as pd  # noqa: F811
    from pyspark.sql.window import Window

    @F.pandas_udf("long")
    def cents_sum(v: pd.Series) -> int | None:
        # SQL SUM semantics over the frame: NULLs are skipped, an all-NULL
        # (or empty) frame sums to NULL — a bare astype would instead crash
        # the Python worker on the NaN (fuzz_diff phase 3).
        v = v.dropna()
        if v.empty:
            return None
        return int((v * 100).round().astype("int64").sum())

    ev = t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 4 == 0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        (cents_sum("value").over(w).cast("double") / 100.0).alias("roll3_sum"),
    )
