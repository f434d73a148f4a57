"""Deterministic synthetic data generator (SURVEY.md Tier A10).

Reference: DataImporter.kt:48-82 generates random US-ish addresses from
5-value pools + random street number / zip, inserting row-at-a-time over
JDBC. Spark-first: `spark.range(n)` + hash-seeded column expressions — fully
distributed, no driver loop, deterministic under a seed (the reference's
unseeded kotlin.random.Random is one of the quirks we do NOT replicate,
SURVEY.md §7.4 item 6; nor its positional-bind off-by-one,
DataImporter.kt:59-63).

Value pools are the reference's own (DataImporter.kt:69-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STREETS = ("Main St", "Oak Ave", "Park Rd", "Cedar Ln", "Elm St")
CITIES = ("Springfield", "Rivertown", "Lakeside", "Hillview", "Maplewood")
STATES = ("CA", "NY", "TX", "FL", "IL")
COUNTRIES = ("USA", "Canada", "UK", "Australia", "Germany")

DEFAULT_ROWS = 10_000  # the loop count actually executed (DataImporter.kt:56)


def _pick(pool: tuple[str, ...], id_col, salt: int):
    """Deterministic pseudo-random pool choice: hash(id, salt) -> index.
    element_at is 1-based."""
    idx = F.pmod(F.hash(id_col, F.lit(salt)), F.lit(len(pool))) + 1
    return F.element_at(F.array(*[F.lit(v) for v in pool]), idx)


def gen_addresses(spark: SparkSession, n: int = DEFAULT_ROWS, seed: int = 42) -> DataFrame:
    """Columns mirror the reference's `addresses` DDL (DataImporter.kt:33-40):
    id SERIAL, street_address, city, state, postal_code, country."""
    ids = spark.range(1, n + 1).withColumnRenamed("id", "id")
    street_no = F.pmod(F.hash(F.col("id"), F.lit(seed)), F.lit(9999)) + 1
    zip5 = F.pmod(F.hash(F.col("id"), F.lit(seed + 1)), F.lit(90000)) + 10000
    return ids.select(
        F.col("id"),
        F.concat(street_no.cast("string"), F.lit(" "), _pick(STREETS, F.col("id"), seed + 2))
        .alias("street_address"),
        _pick(CITIES, F.col("id"), seed + 3).alias("city"),
        _pick(STATES, F.col("id"), seed + 4).alias("state"),
        zip5.cast("string").alias("postal_code"),
        _pick(COUNTRIES, F.col("id"), seed + 5).alias("country"),
    )
