"""SparkSession factory with scale-aware defaults.

The reference has no engine of its own (SURVEY.md §4.1) — its physical
choices are transport-level (2000-row batches, a producer/consumer channel:
EtlMain.kt:51-74). Here Catalyst+Tungsten replace all of that; this module
just pins the confs that matter for a large cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- shuffle partitions sized to the local core count for tests; on a real
  cluster AQE coalesces from a high initial number, so we set a high
  ``initialPartitionNum`` rather than hand-tuning per query.
- Arrow enabled for any pandas interchange (UDF path is Arrow-batched).
- UTC session timezone so timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "quarkus-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[N] runs driver + all executor threads in ONE JVM; the 1g
        # spark.driver.memory default GC-thrashes long before the machine
        # is full. Only effective when this factory starts the JVM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which vanilla Spark refuses
        # to read; read it as long and convert (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
