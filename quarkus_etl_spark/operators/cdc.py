"""Change-data-capture / table-maintenance operators: last-writer-wins
merge (upsert) and keyed table diff.

The reference is a snapshot copier (reference EtlMain.kt:103-108: SELECT *
-> batched INSERT); production ETL re-runs are incremental. These are the
two primitives that make a pipeline incremental:

- `merge_upsert`: MERGE INTO semantics without a table format — union the
  base and the change set with a version rank and keep the highest-version
  row per key. ONE shuffle by key (window keep-first), no join; N change
  batches stack into the same single window pass, which is how replaying a
  CDC backlog stays linear.
- `table_diff`: full-outer keyed comparison classifying every key as
  added / removed / changed — the verification step after any migration or
  backfill (and the engine's own regression harness between runs). One
  shuffle on the join key; comparison columns are pruned to the requested
  set, so the scan never reads unrelated columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str = "__version",
) -> DataFrame:
    """Last-writer-wins merge: rows from `updates` replace same-key rows in
    `base`; unmatched rows pass through. Columns must align (same schema
    minus `version_col`, which this function adds: base=0, updates=1).
    CDC contract: `updates` carries at most one row per key (compact the
    batch first) — equal-version duplicates would tie arbitrarily."""
    tagged = base.withColumn(version_col, F.lit(0)).unionAll(
        updates.withColumn(version_col, F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key present in either side:
    'added' (new only), 'removed' (old only), 'changed' (both, any
    compare_col differs — null-safe). Unchanged keys are dropped. Output:
    keys, change, old_<col>/new_<col> per compare column."""
    # Explicit presence markers: a NULL compare column in a PRESENT row
    # must not read as absence.
    o = old.select(
        *keys,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols],
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return j.withColumn("change", change).where(F.col("change").isNotNull()).select(
        *keys,
        "change",
        *[c for cc in compare_cols for c in (f"old_{cc}", f"new_{cc}")],
    )
