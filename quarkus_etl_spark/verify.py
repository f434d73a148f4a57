"""Local differential harness mirroring the driver's correctness gate
(SURVEY.md §5.2): run each registered query on Spark AND its DuckDB oracle
on the same parquet fixtures, compare row count + column names + an
order-insensitive multiset of row values (columns sorted by name).

Used by tests/test_correctness.py and by ad-hoc `python -m
quarkus_etl_spark.verify [sf_dir] [query ...]`.
"""

from __future__ import annotations

import decimal
import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from .catalog import TABLES
from .queries import all_oracles, all_query_callables


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison.

    Numeric/bool cells carry a TYPE TAG: the driver's value-hash is typed
    (it distinguishes 100 from 100.0 and True from 1), while Python `==`
    is not — which is exactly how the round-1 q_fn_math long-vs-double
    skew passed locally but failed the driver. Tagging makes the local
    gate at least as strict as the driver's."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # distinguish -0.0 from +0.0: Python == and hash() conflate them,
        # a bit-level value hash does not — same strictness rationale as
        # the type tags above.
        return ("float", v, math.copysign(1.0, v))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rowset(rows: list[tuple], col_order: list[int]) -> Counter:
    return Counter(tuple(_canon(r[i]) for i in col_order) for r in rows)


# --------------------------------------------------------------------------
# Engine-type parity (round-5 hardening). The driver's value-hash is TYPED at
# the engine level: a DuckDB HUGEINT/DECIMAL(38,0) column hashes differently
# from a Spark BIGINT even when every value is equal — which is how the round-4
# q_chunk_dedup class passed this local gate (duckdb fetchall() surfaces
# HUGEINT as plain Python int, so _canon tags both engines ("int", v)) yet
# failed the driver. We therefore compare TYPE CLASSES via the oracle's Arrow
# schema vs the Spark schema, so an un-cast SUM()/integer-division oracle fails
# locally before the driver ever sees it.
# --------------------------------------------------------------------------


def _arrow_type_class(t) -> str:
    import pyarrow as pa

    if pa.types.is_null(t):
        return "any"  # untyped literal NULL column — no class evidence
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list:" + _arrow_type_class(t.value_type)
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    return "any"


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, getattr(T, "TimestampNTZType", T.TimestampType))):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "list:" + _spark_type_class(dt.elementType)
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return "any"


def type_class_mismatches(spark_schema, arrow_schema) -> list[str]:
    """Per-column engine-type-class diffs, empty when schemas agree classwise.

    Matches by column NAME (the driver sorts columns by name before hashing).
    'any' on either side (NULL-typed literals, exotic types) is a wildcard."""
    spark_classes = {f.name: _spark_type_class(f.dataType) for f in spark_schema}
    diffs = []
    for fld in arrow_schema:
        sc = spark_classes.get(fld.name)
        oc = _arrow_type_class(fld.type)
        if sc is None or sc == "any" or oc == "any":
            continue
        if sc != oc:
            diffs.append(
                f"{fld.name}: spark={sc} oracle={oc} ({fld.type}) — cast the oracle"
            )
    return diffs


def _assert_fetchall_parity(t, col: str, top: bool = True) -> None:
    """LOUD guard (ADVICE r6): _arrow_rows' to_pylist canon is verified
    equivalent to the old duckdb fetchall() canon only for the type
    whitelist below. Any other oracle output type (a HUGEINT leaking as
    decimal128(38,0) where the driver's engine-typed hash expects BIGINT,
    a UUID surfacing as str, interval types, ...) raises here naming the
    column instead of silently row-diffing differently than fetchall
    would — 'the sweep stays green' must not be the only thing standing
    between an exotic oracle type and a wrong local verdict."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        # deliberate DECIMAL casts are fine (both canons yield
        # decimal.Decimal); precision-38/scale-0 is DuckDB's HUGEINT
        # signature — an un-cast SUM()/COUNT() product the driver hashes
        # as a different engine type. Cast the oracle to BIGINT.
        if t.precision == 38 and t.scale == 0:
            raise TypeError(
                f"oracle column '{col}' is {t} (DuckDB HUGEINT leak) — "
                "cast the oracle expression to BIGINT/DECIMAL(<38,*)"
            )
        return
    if (
        pa.types.is_null(t)
        or pa.types.is_boolean(t)
        or pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_time(t)
    ):
        return
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        _assert_fetchall_parity(t.value_type, f"{col}[]", top=False)
        return
    if pa.types.is_struct(t):
        for f in t:
            _assert_fetchall_parity(f.type, f"{col}.{f.name}", top=False)
        return
    if pa.types.is_map(t):
        if not top:
            # _arrow_rows converts only TOP-LEVEL map cells back to dicts;
            # a map nested under a list/struct would keep Arrow's
            # list-of-tuples canon and silently diff vs fetchall
            raise TypeError(
                f"oracle column '{col}' nests a map type ({t}) below the "
                "top level — _arrow_rows cannot re-canonicalize it"
            )
        _assert_fetchall_parity(t.key_type, f"{col}<key>", top=False)
        _assert_fetchall_parity(t.item_type, f"{col}<value>", top=False)
        return
    raise TypeError(
        f"oracle column '{col}' has Arrow type {t}, outside the verified "
        "fetchall-parity whitelist — extend _assert_fetchall_parity only "
        "after checking to_pylist vs fetchall canon for it"
    )


def _arrow_rows(atbl) -> list[tuple]:
    """Row tuples from a materialized Arrow table, matching what
    duckdb.fetchall() would have produced for the same result: map-typed
    cells surface as list-of-(k,v)-tuples in Arrow's to_pylist but as
    dicts from fetchall, so they are converted back. Types outside the
    verified-parity whitelist raise loudly (_assert_fetchall_parity)."""
    import pyarrow as pa

    cols = []
    for i, fld in enumerate(atbl.schema):
        _assert_fetchall_parity(fld.type, fld.name)
        vals = atbl.column(i).to_pylist()
        if pa.types.is_map(fld.type):
            vals = [dict(v) if v is not None else None for v in vals]
        cols.append(vals)
    return list(zip(*cols)) if cols else []


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int = -1
    rows_duck: int = -1
    cols_spark: list[str] = field(default_factory=list)
    cols_duck: list[str] = field(default_factory=list)
    error: str = ""
    sample_only_spark: list = field(default_factory=list)
    sample_only_duck: list = field(default_factory=list)
    secs: float = 0.0  # wall seconds (Spark + oracle), for sweep profiling


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
) -> CompareResult:
    queries, oracles = all_query_callables(), all_oracles()
    try:
        sdf = queries[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
    except Exception as e:  # noqa: BLE001
        return CompareResult(name, False, error=f"spark: {type(e).__name__}: {e}")
    if name not in oracles:
        # rows-only check, like the driver's weaker path
        return CompareResult(name, True, rows_spark=len(srows), cols_spark=scols)
    try:
        # ONE oracle execution serves both the typed schema and the rows
        # (ADVICE r5: the earlier execute-twice form doubled oracle cost and
        # could diverge on a nondeterministic oracle). Rows come off the
        # already-materialized Arrow table; map columns are converted back
        # to dicts to match duckdb-fetchall canon (Arrow yields key/value
        # tuple lists, which _canon would tag differently).
        atbl = con.execute(oracles[name]).fetch_arrow_table()
        dcols = list(atbl.schema.names)
        drows = _arrow_rows(atbl)
    except Exception as e:  # noqa: BLE001
        return CompareResult(name, False, error=f"duckdb: {type(e).__name__}: {e}")

    res = CompareResult(
        name, True, len(srows), len(drows), scols, dcols
    )
    if sorted(scols) != sorted(dcols):
        res.ok = False
        res.error = f"column mismatch: spark={scols} duck={dcols}"
        return res
    type_diffs = type_class_mismatches(sdf.schema, atbl.schema)
    if type_diffs:
        res.ok = False
        res.error = "engine type-class mismatch: " + "; ".join(type_diffs)
        return res
    if len(srows) != len(drows):
        res.ok = False
        res.error = f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    s_order = [scols.index(c) for c in sorted(scols)]
    d_order = [dcols.index(c) for c in sorted(dcols)]
    sset, dset = _rowset(srows, s_order), _rowset(drows, d_order)
    if sset != dset:
        res.ok = False
        only_s = list((sset - dset).elements())[:3]
        only_d = list((dset - sset).elements())[:3]
        res.sample_only_spark = only_s
        res.sample_only_duck = only_d
        if not res.error:
            res.error = "value multiset mismatch"
    return res


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    import time

    con = duck_connection(sf_dir)
    queries = all_query_callables()
    names = names or sorted(queries)
    out = []
    for n in names:
        start = time.monotonic()
        r = compare_query(spark, con, n, sf_dir)
        r.secs = round(time.monotonic() - start, 2)
        out.append(r)
    return out


def main() -> None:
    import sys

    from .session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or None
    spark = get_spark("verify")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    results = run_all(spark, sf_dir, names)
    for r in results:
        status = "OK  " if r.ok else "FAIL"
        extra = "" if r.ok else f"  {r.error}"
        checked = "oracle" if r.rows_duck >= 0 else "rows-only"
        print(
            f"{status} {r.name:28s} rows={r.rows_spark} "
            f"[{checked}] {r.secs:6.2f}s{extra}"
        )
        if not r.ok:
            failures += 1
            if r.sample_only_spark or r.sample_only_duck:
                print(f"     spark-only: {r.sample_only_spark}")
                print(f"     duck-only : {r.sample_only_duck}")
    slow = sorted(results, key=lambda r: -r.secs)[:8]
    print("slowest:", ", ".join(f"{r.name}={r.secs:.1f}s" for r in slow))
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failing")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
