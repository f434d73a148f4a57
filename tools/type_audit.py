"""Exact engine-type audit: for every oracled query, print each column where
the Spark type and the DuckDB oracle's Arrow type differ in WIDTH or exact
kind (int32 vs int64, float32 vs float64, timestamp units, decimal params) —
one level stricter than verify.py's class gate. The driver's value-hash is
engine-typed; class parity is what it is known to require (r4 post-mortem),
but width skews are the next candidate class, so this audit keeps an exact
inventory. Informational: exits 0 always, prints the diff table.

Usage: python -m tools.type_audit [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark_to_arrow_name(dt) -> str:
    from pyspark.sql import types as T

    m = {
        T.BooleanType: "bool",
        T.ByteType: "int8",
        T.ShortType: "int16",
        T.IntegerType: "int32",
        T.LongType: "int64",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.StringType: "string",
        T.BinaryType: "binary",
        T.DateType: "date32[day]",
    }
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, T.DecimalType):
        return f"decimal128({dt.precision}, {dt.scale})"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp[us]"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_to_arrow_name(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    return f"other:{dt.simpleString()}"


def _arrow_name(t) -> str:
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_name(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    return str(t)


def main() -> None:
    from quarkus_etl_spark.queries import all_oracles, all_query_callables
    from quarkus_etl_spark.session import get_spark
    from quarkus_etl_spark.verify import duck_connection

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("type_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    queries, oracles = all_query_callables(), all_oracles()
    n_cols = n_diff = 0
    for name in sorted(oracles):
        sdf = queries[name](spark, sf_dir)
        spark_types = {f.name: _spark_to_arrow_name(f.dataType) for f in sdf.schema}
        atbl = con.execute(oracles[name]).fetch_arrow_table()
        for fld in atbl.schema:
            n_cols += 1
            st = spark_types.get(fld.name)
            ot = _arrow_name(fld.type)
            if st is not None and st != ot:
                n_diff += 1
                print(f"{name:30s} {fld.name:24s} spark={st:20s} oracle={ot}")
    print(f"-- {n_cols} columns audited, {n_diff} exact-type diffs")


if __name__ == "__main__":
    main()
