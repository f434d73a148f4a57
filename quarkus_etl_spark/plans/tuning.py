"""Partitioning guards.

A small parquet file arrives as ONE input split, so a quadratic operator
(blocked self-join, MinHash explode) downstream of it would run on one core
no matter how many the cluster has. `ensure_parallelism` round-robins such
inputs up to the session's default parallelism BEFORE the expensive stage.

At real scale inputs have many splits and the guard is a no-op — it only
spends a (cheap, linear) shuffle when the input is under-partitioned
relative to the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # Probe with inputFiles() — file listing over the analyzed plan only.
    # The previous probe (df.rdd.getNumPartitions()) runs the FULL
    # optimizer + physical-planning pipeline on the driver: measured 4.6 s
    # on the ngram feature plan, paid per operator build on every wide
    # expression tree, then paid again at execution. File count is a
    # conservative heuristic for split count (Spark may pack many small
    # files into fewer splits, in which case we skip a repartition that
    # could have helped — acceptable: that regime is already
    # volume-parallel), and a single file is exactly the case the guard
    # exists for.
    try:
        n_files = len(df.inputFiles())
    except Exception:  # pragma: no cover - e.g. streaming plan
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        # No file source (in-memory relation): plans are small there, so
        # the RDD probe's planning cost is negligible.
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:  # pragma: no cover - plan not RDD-convertible
            pass
    return df.repartition(target)
