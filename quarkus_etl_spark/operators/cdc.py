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
    """MERGE INTO semantics: every base row whose key has an update takes
    the update's values (version 1); base rows without one pass through
    (version 0); update rows whose key is absent from base are inserts.
    Crucially, DUPLICATE base keys each get updated and each survive —
    SQL MERGE updates every matching target row; the earlier
    keep-row_number-1 form silently collapsed double-ingested base rows
    to one (caught by the phase-5 referential fuzz against the oracle's
    join form). Columns must align (same schema minus `version_col`).
    CDC contract: `updates` carries at most one row per key (compact the
    batch first — SQL MERGE errors on duplicate source matches) and no
    NULL keys (NULL never equality-matches in SQL; a NULL-key update
    would wrongly pair with NULL-key base rows under the window
    partitioner). The one-update-per-key half of the contract is
    ENFORCED fail-loud (ADVICE r7): a per-key update count rides the
    same window pass and any key holding >1 update rows raises instead
    of letting max_by crown an arbitrary one — SQL MERGE errors on
    duplicate source matches, and so does this (the old max(struct)
    form at least picked deterministically; max_by does not).

    Still ONE shuffle by key and no join: the update's values broadcast
    to their key group through a window aggregate — max_by keyed on the
    version flag, so the value struct itself is never compared and value
    columns of ANY type (maps, nested arrays — not just Spark-orderable
    ones) are supported. N change batches keep stacking into a single
    window pass."""
    val_cols = [c for c in base.columns if c not in keys]
    tagged = base.withColumn(version_col, F.lit(0)).unionAll(
        updates.withColumn(version_col, F.lit(1))
    )
    w = Window.partitionBy(*keys)
    # Fail-loud one-update-per-key contract check: rides the SAME window
    # pass as the merge itself (version is 0/1, so sum counts update rows).
    n_upd = F.sum(F.col(version_col)).over(w)

    def checked(version_out):
        return (
            F.when(F.col("__nu") <= 1, version_out)
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("merge_upsert: "),
                        F.col("__nu").cast("string"),
                        F.lit(
                            " update rows share one key — the CDC contract"
                            " is at most one update per key (compact the"
                            " batch first; SQL MERGE errors on duplicate"
                            " source matches)"
                        ),
                    )
                )
            )
            .alias(version_col)
        )

    if not val_cols:
        # Key-only schema: MERGE degenerates to key-set union — base keys
        # pass through (flagged updated when an update matched), update
        # keys absent from base are inserts. An empty F.struct() is not
        # constructible, so this case short-circuits.
        has_base0 = F.max(F.when(F.col(version_col) == 0, 1).otherwise(0)).over(w)
        has_upd0 = F.max(F.col(version_col)).over(w)
        return (
            tagged.withColumn("__hb", has_base0)
            .withColumn("__hu", has_upd0)
            .withColumn("__nu", n_upd)
            .where((F.col(version_col) == 0) | (F.col("__hb") == 0))
            .select(*keys, checked(F.col("__hu")))
        )
    upd_vals = F.max_by(
        F.when(
            F.col(version_col) == 1,
            F.struct(*[F.col(c) for c in val_cols]),
        ),
        F.col(version_col),
    ).over(w)
    has_base = F.max(F.when(F.col(version_col) == 0, 1).otherwise(0)).over(w)
    merged = (
        tagged.withColumn("__upd", upd_vals)
        .withColumn("__hb", has_base)
        .withColumn("__nu", n_upd)
    )
    out_cols = [
        F.col(c)
        if c in keys
        else F.when(F.col("__upd").isNotNull(), F.col(f"__upd.{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in base.columns
    ]
    return (
        merged.where((F.col(version_col) == 0) | (F.col("__hb") == 0))
        .select(
            *out_cols,
            checked(
                F.when(F.col("__upd").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ),
        )
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
