"""As-of join (SURVEY.md §2 q_join_asof, §4.3 item 3).

Spark has no built-in as-of verb, and the naive formulation (range theta
join + row_number) shuffles the full cross-range. This implementation is the
scale-correct composition: tag both sides, UNION them, and run ONE window
pass partitioned by key and ordered by time — a single shuffle, linear work,
no candidate blow-up. This is the standard union-merge as-of pattern (same
asymptotics as pandas merge_asof, but distributed).

Semantics (backward as-of, inclusive): for each left row, attach the right
row with the greatest `right_ts <= left_ts` for the same key; ties on
right_ts broken by the largest tiebreak column. Matches DuckDB `ASOF JOIN`
(which our oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join; `right_value_cols` are carried to the output
    (prefixed `asof_`), plus `asof_ts` = matched right timestamp."""
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")

    # SQL equality semantics for NULL keys: a NULL-key right row can never
    # match anything (NULL = NULL is not true), but the window partitioner
    # groups NULLs into ONE partition, so without this filter a NULL-key
    # left row would silently "match" a NULL-key right row — exactly the
    # divergence the phase-5 referential fuzz caught against DuckDB's
    # native ASOF JOIN. NULL-key LEFT rows stay (their partition now has
    # no right rows, so they resolve to no-match, matching LEFT JOIN).
    right = right.where(F.col(on).isNotNull())

    carried = [right_ts, *right_value_cols]
    r_struct = F.struct(*[F.col(c) for c in carried]).alias("__r")
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__r", F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in carried) + ">"
    ))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct,
    )
    # Left rows need their own columns downstream; right rows only carry __r.
    lhs_cols = [c for c in left.columns]
    rhs_full = rhs.select(
        *[
            F.col(c) if c == on else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lhs_cols
        ],
        "__ts",
        "__side",
        "__r",
    )
    union = lhs.select(*lhs_cols, "__ts", "__side", "__r").unionByName(rhs_full)

    # Order matters: at equal __ts every right row (__side=0) must sort
    # BEFORE the left row (__side=1) so inclusive (right_ts == left_ts)
    # matches stay visible; the tiebreak only orders right rows among
    # themselves, so it comes AFTER __side (largest tiebreak sorts last and
    # wins F.last). Inserting it before __side would float left rows (null
    # __r) ahead of equal-ts right rows and silently drop those matches.
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"__r.{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = union.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__match").isNotNull())
    return out.select(
        *lhs_cols,
        F.col(f"__match.{right_ts}").alias("asof_ts"),
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
