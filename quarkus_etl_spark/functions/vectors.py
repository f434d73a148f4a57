"""Vector math over `array<float|double>` columns, as pure Catalyst
expressions (SURVEY.md Tier C q_sim_*).

Everything here compiles to JVM higher-order functions (`zip_with`,
`aggregate`) inside whole-stage codegen — no Python in the hot path, no UDF
serialization. The fold is sequential left-to-right, which makes the result
bit-identical to DuckDB's `list_cosine_similarity` (verified empirically:
dot/(sqrt(na)*sqrt(nb)) with separately-rooted norms).

At 100TB scale this matters: brute-force cosine over a 64-dim embedding
column runs at memory bandwidth in the JVM; shipping rows to Python would be
10-100x slower.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    """Fixtures store `array<float>`; widen once so all arithmetic is f64."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(||a||*||b||), clamped to [-1, 1].

    Two details make this bit-identical to DuckDB's
    `list_cosine_similarity`: the norm product is two sqrts multiplied (NOT
    sqrt-of-product), and the result is clamped — float rounding can push
    self-similarity to 1.0000000000000002, which DuckDB clips."""
    raw = dot_product(a, b) / (l2_norm(a) * l2_norm(b))
    return F.least(F.greatest(raw, F.lit(-1.0)), F.lit(1.0))
