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


def test_jobs_from_dicts_rejects_bare_string_depends_on():
    # {"depends_on": "stage"} must fail at parse time, not iterate
    # char-by-char into ('s','t','a','g','e') and surface later as a
    # confusing unknown-jobs DAG error
    import pytest

    with pytest.raises(TypeError, match="depends_on"):
        jobs_from_dicts(
            [{"name": "b", "extract": "SELECT 1", "depends_on": "stage"}]
        )


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


# --- A1-A3/A13-A14: JDBC transport contract ---------------------------------
# No JDBC driver jar ships in this image, so the option ASSEMBLY (the part
# of the transport the reference pins: whole-query pushdown, 2000-row
# batches, partitioned parallel reads, engine-by-driver-config) is tested
# structurally; the e2e below skips until a jar appears on the classpath.


def test_jdbc_read_options_query_pushdown():
    from quarkus_etl_spark.sources.readers import jdbc_read_options

    opts = jdbc_read_options("jdbc:postgresql://h/db", query="SELECT * FROM t WHERE x > 5")
    assert opts["url"] == "jdbc:postgresql://h/db"
    assert opts["query"] == "SELECT * FROM t WHERE x > 5"  # whole-query pushdown (A1)
    assert opts["fetchsize"] == "2000"  # reference cursor batch (EtlMain.kt:74)
    assert "dbtable" not in opts


def test_jdbc_read_options_partitioned_table_scan():
    from quarkus_etl_spark.sources.readers import jdbc_read_options

    opts = jdbc_read_options(
        "jdbc:mysql://h/db",
        table="orders",
        driver="com.mysql.cj.jdbc.Driver",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=16,
        fetchsize=5000,
        sessionInitStatement="SET NAMES utf8",
    )
    assert opts["dbtable"] == "orders"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"  # A14 engine-by-config
    assert (opts["partitionColumn"], opts["lowerBound"], opts["upperBound"]) == (
        "o_orderkey", "1", "1000000",
    )
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "5000"
    assert opts["sessionInitStatement"] == "SET NAMES utf8"  # passthrough


def test_jdbc_read_options_requires_exactly_one_source():
    from quarkus_etl_spark.sources.readers import jdbc_read_options

    with pytest.raises(ValueError, match="exactly one"):
        jdbc_read_options("jdbc:h2:mem:x")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_read_options("jdbc:h2:mem:x", query="SELECT 1", table="t")


def test_jdbc_write_options_reference_batch():
    from quarkus_etl_spark.sources.writers import REFERENCE_BATCH_SIZE, jdbc_write_options

    opts = jdbc_write_options("jdbc:postgresql://h/db", "out_t")
    assert opts["batchsize"] == str(REFERENCE_BATCH_SIZE) == "2000"  # A2/A3
    assert opts["dbtable"] == "out_t"
    custom = jdbc_write_options(
        "jdbc:h2:mem:x", "t", batchsize=500, driver="org.h2.Driver", isolationLevel="NONE"
    )
    assert custom["batchsize"] == "500"
    assert custom["driver"] == "org.h2.Driver"
    assert custom["isolationLevel"] == "NONE"


def test_jdbc_roundtrip_e2e_when_driver_present(spark, tmp_path):
    """Live JDBC write->read roundtrip (the reference's whole job,
    EtlMain.kt:76-108). Skips while the image has no driver jar; lights up
    the moment one appears on the Spark classpath."""
    from quarkus_etl_spark.sources.readers import read_jdbc
    from quarkus_etl_spark.sources.writers import write_jdbc

    url = f"jdbc:h2:{tmp_path}/e2e;MODE=PostgreSQL"
    df = spark.range(10).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS dbl")
    try:
        write_jdbc(df, url, "roundtrip", mode="overwrite", driver="org.h2.Driver")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "ClassNotFoundException" in msg or "No suitable driver" in msg:
            pytest.skip("no JDBC driver jar on the classpath")
        raise
    back = read_jdbc(spark, url, table="roundtrip", driver="org.h2.Driver")
    assert back.count() == 10
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_python_datasource_partitions_and_determinism(spark):
    """The custom Python DataSource (Spark 4 API) plans its reads into the
    requested number of input partitions, yields exactly the id range,
    and is bit-deterministic across scans (restart-safe derivation from
    row ids)."""
    from quarkus_etl_spark.sources.pydatasource import register as reg

    reg(spark)
    df = spark.read.format("addresses").option("rows", "1000").option(
        "partitions", "4"
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg({"id": "min"}).first()[0] == 1
    assert df.agg({"id": "max"}).first()[0] == 1000
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
    row = dict(zip(df.columns, a[0]))
    assert row["country"] in {"USA", "Canada", "UK", "Australia", "Germany"}


def test_job_dag_respects_dependencies_and_parallelizes(spark, sf_dir):
    """run_dag: a dependent job sees the table its upstream created; two
    independent branches both complete; unknown deps and cycles raise."""
    import pytest

    from quarkus_etl_spark.config import EtlJob
    from quarkus_etl_spark.jobs import JobRunner

    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "dag_nation"
    )
    spark.sql("DROP TABLE IF EXISTS dag_stage")
    jobs = [
        EtlJob(
            name="stage",
            extract="SELECT N_NATIONKEY, N_NAME FROM dag_nation",
            write="CREATE TABLE dag_stage AS SELECT * FROM etl_source",
        ),
        EtlJob(
            name="count_stage",
            extract="SELECT count(*) AS C FROM dag_stage",
            depends_on=("stage",),
        ),
        EtlJob(name="independent", extract="SELECT 1 AS ONE"),
    ]
    runner = JobRunner(spark)
    results = {r.name: r for r in runner.run_dag(jobs)}
    assert set(results) == {"stage", "count_stage", "independent"}
    assert results["stage"].rows == 25
    assert spark.sql("SELECT C FROM (SELECT count(*) AS C FROM dag_stage)").first()["C"] == 25

    with pytest.raises(ValueError, match="unknown jobs"):
        runner.run_dag([EtlJob(name="a", extract="SELECT 1", depends_on=("zz",))])
    with pytest.raises(ValueError, match="cycle"):
        runner.run_dag(
            [
                EtlJob(name="a", extract="SELECT 1", depends_on=("b",)),
                EtlJob(name="b", extract="SELECT 1", depends_on=("a",)),
            ]
        )
    spark.sql("DROP TABLE IF EXISTS dag_stage")
