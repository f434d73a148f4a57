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
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan not RDD-convertible
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
