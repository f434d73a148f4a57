"""Replicated-fixture stress driver (SCALE.md's measurement tool).

Builds an N×-replicated copy of selected fixture tables under
`.scratch/stress_{mult}x/` (ids shifted per replica so each doc/vector/event
is unique while every row gains `mult-1` exact-duplicate partners — the
worst case for near-dup pair generation) and times registered queries
against it with a noop sink.

Usage:
    python -m tools.stress --base /root/testdata/sf0.1 --mult 100 \
        q_dedup_soft q_graph_label_prop

Replicated tables: documents, embeddings, events (the big inputs of the
north-star families). Relational tables are symlinked unreplicated — the
TPC-H shapes have their own bench coverage.
"""

from __future__ import annotations

import argparse
import os
import time

REPLICATED = {"documents": "doc_id", "embeddings": "vec_id", "events": "event_id"}
ID_STRIDE = 10_000_000  # > any fixture id; replica r shifts ids by r*stride


def build_fixture(spark, base_dir: str, out_dir: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from quarkus_etl_spark.catalog import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if name in REPLICATED:
            id_col = REPLICATED[name]
            df = load_table(spark, base_dir, name)
            rep = df.crossJoin(
                spark.range(mult).select(F.col("id").alias("__rep"))
            ).withColumn(
                id_col, F.col(id_col) + F.col("__rep") * F.lit(ID_STRIDE)
            ).drop("__rep")
            if name == "events":
                # keep the TIMESTAMP_NTZ column type the catalog produces
                rep = rep.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            rep.write.mode("overwrite").parquet(dst)
        else:
            os.symlink(os.path.join(base_dir, f"{name}.parquet"), dst)


def time_query(spark, name: str, sf_dir: str) -> float:
    from quarkus_etl_spark.queries import all_query_callables

    fn = all_query_callables()[name]
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--timeout-note", default="")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from quarkus_etl_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.abspath(f".scratch/stress_{args.mult}x")
    build_fixture(spark, args.base, out_dir, args.mult)
    for q in args.queries:
        try:
            secs = time_query(spark, q, out_dir)
            print(f"STRESS {q} mult={args.mult} secs={secs:.1f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"STRESS {q} mult={args.mult} ERROR {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
