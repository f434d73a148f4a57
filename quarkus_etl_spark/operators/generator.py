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


def _nib4(h, pos: int):
    """4 hex nibbles of the row digest as an integer in [0, 65536)."""
    return F.conv(F.substring(h, pos, 4), 16, 10).cast("long")


def _pick(pool: tuple[str, ...], h, pos: int):
    """Deterministic pool choice from digest nibbles (element_at 1-based)."""
    idx = (_nib4(h, pos) % F.lit(len(pool))).cast("int") + 1
    return F.element_at(F.array(*[F.lit(v) for v in pool]), idx)


def gen_addresses(spark: SparkSession, n: int = DEFAULT_ROWS, seed: int = 42) -> DataFrame:
    """Columns mirror the reference's `addresses` DDL (DataImporter.kt:33-40):
    id SERIAL, street_address, city, state, postal_code, country.

    Every field derives from md5('<seed>:<id>') nibbles — the engine-
    PORTABLE hash family (same discipline as the q_gen_pysource connector
    and the md5 MinHash variant), so a plain-SQL oracle reproduces the
    generator bit-for-bit and the driver grade is a conclusive hash
    verdict (VERDICT r6 #5; previously F.hash = Spark-private murmur →
    rows-only). Still fully distributed: spark.range + column expressions,
    no driver loop."""
    ids = spark.range(1, n + 1).withColumnRenamed("id", "id")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
    street_no = _nib4(h, 1) % 9999 + 1
    zip5 = _nib4(h, 17) % 90000 + 10000
    return ids.select(
        F.col("id"),
        F.concat(street_no.cast("string"), F.lit(" "), _pick(STREETS, h, 5))
        .alias("street_address"),
        _pick(CITIES, h, 9).alias("city"),
        _pick(STATES, h, 13).alias("state"),
        zip5.cast("string").alias("postal_code"),
        _pick(COUNTRIES, h, 21).alias("country"),
    )
