"""Exact engine-type audit: for every oracled query, print each column where
the Spark type and the DuckDB oracle's Arrow type differ in WIDTH or exact
kind (int32 vs int64, float32 vs float64, timestamp units, decimal params) —
one level stricter than verify.py's class gate. The driver's value-hash is
engine-typed; class parity is what it is known to require (r4 post-mortem),
but width skews are the next candidate class, so this audit keeps an exact
inventory.

The known skews are FROZEN in tools/type_skews.json (VERDICT r6 #4): with
--check, any skew not in the manifest — or any manifest entry that silently
resolved — exits 1 NAMING the column, so a new width skew can never drift
the count silently. --write regenerates the manifest after a reviewed
change. Without flags: informational table, exit 0.

Usage: python -m tools.type_audit [--check|--write] [sf_dir]
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


MANIFEST = os.path.join(REPO, "tools", "type_skews.json")


def collect_skews(spark, con, sf_dir: str) -> tuple[dict[str, str], int]:
    """'query.column' -> 'spark=X oracle=Y' for every exact-type diff."""
    from quarkus_etl_spark.queries import all_oracles, all_query_callables

    queries, oracles = all_query_callables(), all_oracles()
    skews: dict[str, str] = {}
    n_cols = 0
    for name in sorted(oracles):
        sdf = queries[name](spark, sf_dir)
        spark_types = {f.name: _spark_to_arrow_name(f.dataType) for f in sdf.schema}
        atbl = con.execute(oracles[name]).fetch_arrow_table()
        for fld in atbl.schema:
            n_cols += 1
            st = spark_types.get(fld.name)
            ot = _arrow_name(fld.type)
            if st is not None and st != ot:
                skews[f"{name}.{fld.name}"] = f"spark={st} oracle={ot}"
    return skews, n_cols


def main() -> int:
    import json

    args = [a for a in sys.argv[1:]]
    check = "--check" in args
    write = "--write" in args
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.001"

    from quarkus_etl_spark.session import get_spark
    from quarkus_etl_spark.verify import duck_connection

    spark = get_spark("type_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    skews, n_cols = collect_skews(spark, con, sf_dir)
    for key, val in skews.items():
        name, _, col = key.partition(".")
        print(f"{name:30s} {col:24s} {val}")
    print(f"-- {n_cols} columns audited, {len(skews)} exact-type diffs")

    if write:
        with open(MANIFEST, "w") as fh:
            json.dump(skews, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(skews)} known skews -> {MANIFEST}")
        return 0
    if check:
        try:
            with open(MANIFEST) as fh:
                known = json.load(fh)
        except OSError:
            print("NO MANIFEST — run tools.type_audit --write")
            return 1
        new = {k: v for k, v in skews.items()
               if k not in known or known[k] != v}
        gone = {k: v for k, v in known.items() if k not in skews}
        for k, v in new.items():
            print(f"NEW SKEW (not in frozen manifest): {k} {v}")
        for k, v in gone.items():
            print(f"RESOLVED SKEW (stale manifest entry): {k} {v}")
        if new or gone:
            print("type-skew manifest drift — review, then tools.type_audit --write")
            return 1
        print(f"type skews match frozen manifest ({len(known)} known)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
