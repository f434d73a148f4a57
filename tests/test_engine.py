"""Unit tests for the Tier-A engine behaviors the DuckDB oracle can't check
(SURVEY.md §5.2): identifier normalization, dup guard, config parsing, job
runner sequencing incl. DDL-as-job, writer round-trips, generator
determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quarkus_etl_spark.catalog import (
    DuplicateColumnError,
    assert_no_duplicate_columns,
    load_table,
    normalize_identifiers,
)
from quarkus_etl_spark.config import EtlJob, WriteTarget, jobs_from_dicts, jobs_from_properties
from quarkus_etl_spark.jobs import JobRunner
from quarkus_etl_spark.operators.generator import CITIES, COUNTRIES, STATES, gen_addresses


# --- A6/A7: identifier normalization + duplicate guard -----------------------


def test_normalize_uppercases_and_alias_wins(spark):
    df = spark.range(3).select(F.col("id").alias("my_key"), F.lit("x").alias("val"))
    out = normalize_identifiers(df)
    assert out.columns == ["MY_KEY", "VAL"]


def test_duplicate_column_guard_fires(spark):
    df = spark.range(1).select(F.lit(1).alias("a"), F.lit(2).alias("A"))
    with pytest.raises(DuplicateColumnError, match="appeared twice"):
        normalize_identifiers(df)
    # pre-normalization exact duplicates also fail fast
    df2 = df.toDF("a", "a")
    with pytest.raises(DuplicateColumnError):
        assert_no_duplicate_columns(df2)


# --- A12: config parsing (dict + reference .properties syntax) ---------------


def test_jobs_from_dicts_roundtrip():
    jobs = jobs_from_dicts(
        [
            {"name": "ddl", "extract": "SELECT 1", "write": "CREATE TABLE x (i INT)"},
            {
                "name": "copy",
                "extract": "SELECT * FROM t",
                "write": {"format": "parquet", "path": "/tmp/x", "mode": "overwrite"},
            },
        ]
    )
    assert [j.name for j in jobs] == ["ddl", "copy"]
    assert isinstance(jobs[1].write, WriteTarget)
    assert jobs[1].write.mode == "overwrite"


def test_jobs_from_properties(tmp_path):
    # the reference's own config shape (application.properties:12-21)
    props = tmp_path / "application.properties"
    props.write_text(
        """
# jobs
loader.jobs[0].name=tableCreate
loader.jobs[0].extract=select 1
loader.jobs[0].write=CREATE TABLE IF NOT EXISTS addrx (id INT)
loader.jobs[1].name=addrx
loader.jobs[1].extract=select id,street_address from addresses where id <13422
loader.jobs[1].write=INSERT INTO addrx SELECT * FROM etl_source
"""
    )
    jobs = jobs_from_properties(props)
    assert [j.name for j in jobs] == ["tableCreate", "addrx"]
    assert "13422" in jobs[1].extract


# --- A8/A9/A11/A12: job runner ----------------------------------------------


def test_job_runner_extract_normalizes(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    job = EtlJob("j", "SELECT o_orderkey, o_totalprice AS total FROM orders", None)
    res = JobRunner(spark).run_job(job)
    assert res.rows == 1500
    assert JobRunner(spark).extract(job).columns == ["O_ORDERKEY", "TOTAL"]


def test_job_runner_ddl_and_insert_sequence(spark, sf_dir, tmp_path):
    """The reference's two shipped jobs end-to-end: DDL job then copy job
    (application.properties:12-21), against a Spark-native target."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql("DROP TABLE IF EXISTS addrx_test")
    jobs = [
        EtlJob(
            "tableCreate",
            "SELECT 1",
            "CREATE TABLE IF NOT EXISTS addrx_test (O_ORDERKEY BIGINT, TOTAL DOUBLE) USING parquet",
        ),
        EtlJob(
            "copy",
            "SELECT o_orderkey, o_totalprice AS total FROM orders WHERE o_orderkey < 100",
            "INSERT INTO addrx_test SELECT * FROM etl_source",
        ),
    ]
    results = JobRunner(spark).run(jobs)
    assert [r.name for r in results] == ["tableCreate", "copy"]
    assert results[0].rows == 0  # pure DDL: extract never materialized
    assert results[1].rows == 100  # observed via the write's own action
    assert spark.table("addrx_test").count() == 100
    spark.sql("DROP TABLE addrx_test")


def test_job_runner_write_target_parquet(spark, sf_dir, tmp_path):
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    target = WriteTarget(format="parquet", path=str(tmp_path / "nation_out"), mode="overwrite")
    res = JobRunner(spark).run_job(EtlJob("copy_nation", "SELECT * FROM nation", target))
    assert res.rows == 25
    assert spark.read.parquet(target.path).count() == 25


def test_job_runner_rejects_arbitrary_write_sql(spark):
    with pytest.raises(ValueError, match="write SQL must start"):
        JobRunner(spark).run_job(EtlJob("bad", "SELECT 1", "SELECT 1"))


# --- A10: generator ----------------------------------------------------------


def test_gen_addresses_deterministic_and_in_pools(spark):
    a = gen_addresses(spark, n=500, seed=42)
    b = gen_addresses(spark, n=500, seed=42)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    rows = a.collect()
    assert len(rows) == 500
    assert {r.city for r in rows} <= set(CITIES)
    assert {r.state for r in rows} <= set(STATES)
    assert {r.country for r in rows} <= set(COUNTRIES)
    assert all(10000 <= int(r.postal_code) <= 99999 for r in rows)
    # different seed -> different content
    c = gen_addresses(spark, n=500, seed=7)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))
