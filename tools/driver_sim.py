"""Driver-conditions simulation: import __spark_entry__.py BY PATH from a
foreign cwd, build a VANILLA SparkSession (none of session.py's confs), and
differential-check queries against DuckDB — exactly the harness shape the
per-round grader uses. This gate caught two whole bug classes the repo-cwd
UTC-configured harness masks: session-timezone-dependent timestamp
conversion and worker-side ModuleNotFoundError for pickled-by-reference
package symbols.

Usage:
    cd /tmp && python /root/repo/tools/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("entry rows:", len(m.entry(spark).collect()))

    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from quarkus_etl_spark.verify import compare_query

    names = list(m.queries())
    if first_n:
        names = names[:first_n]
    bad = 0
    for n in names:
        r = compare_query(spark, con, n, sf_dir)
        if not r.ok:
            bad += 1
            print("FAIL", n, (r.error or "")[:200])
    print(f"driver-sim: {len(names)} queries, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
