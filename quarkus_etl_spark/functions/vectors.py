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


def vec_nonfinite_to_null(c: Column | str) -> Column:
    """Failed-encoder guard (r11 fuzz phase 7): a vector containing any
    NaN/±Inf component carries no usable geometry — and letting one reach
    the cosine path is actively dangerous: NaN/NaN = NaN, and the [-1,1]
    clamp's null-skipping `least(greatest(NaN, -1), 1)` silently rewrites
    it to 1.0 in Spark (self-similar to everything), while DuckDB orders
    the raw NaN greatest — a cross-engine divergence AND a wrong answer.
    Map such vectors to NULL at load so the round-4 missing-embedding
    conventions (structural filters, NULL cosine, survivors-not-losers)
    cover them with no further per-query logic. NULL stays NULL; -0.0 and
    subnormal components are legitimate geometry and pass through.

    One extra JVM-side O(dim) fold per row at load — map-only, no shuffle,
    negligible next to the cosine math it protects."""
    c = F.col(c) if isinstance(c, str) else c
    nonfinite = F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    # when() without otherwise: nonfinite -> NULL, NULL input -> NULL
    return F.when(~nonfinite, c)


def vec_contract_to_null(c: Column | str, dim: int) -> Column:
    """The full embedding-column contract guard (r11 fuzz phases 7+8):
    vec_nonfinite_to_null PLUS a dimension check — a vector whose length
    differs from the column's declared dimension (encoder version drift,
    truncated writes, empty lists) is equally unusable geometry and maps
    to NULL/missing. The dimension leg is not optional hygiene: Spark's
    zip_with silently NULL-pads the shorter side (a ragged dot product
    quietly becomes NULL), while DuckDB's list_cosine_similarity raises
    on mismatched lengths and an EMPTY list trips an INTERNAL error that
    fatally invalidates the whole database — one ragged row would kill
    the oracle side and silently skew the Spark side."""
    c = F.col(c) if isinstance(c, str) else c
    nonfinite = F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    # size(NULL) is NULL under default sizeOfNull semantics, so a NULL
    # vector falls through both branches to NULL, same as before
    return F.when((F.size(c) == F.lit(dim)) & ~nonfinite, c)


# DuckDB mirror of vec_contract_to_null for the differential oracles:
# TRUE only for a present, contract-dimension, all-finite embedding
# (isfinite() is FALSE for both NaN and ±Inf; len() = dim rejects ragged
# AND empty lists BEFORE any list_* kernel can see them — DuckDB's
# list_cosine_similarity raises on ragged input and fatally invalidates
# the database on an empty list). Interpolate into an oracle's structural
# vector filter so both engines admit exactly the same rows. The fixture
# embeddings table declares dim=64 (FIXTURES.md).
SQL_EMB_FINITE = (
    "(embedding IS NOT NULL AND len(embedding) = 64"
    " AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0)"
)


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


def guarded_cosine(dot: Column, denom: Column) -> Column:
    """Shared zero-norm-safe cosine closer: 0.0 when the norm product is 0
    (zero vectors — failed-encoder rows every real embedding table has;
    under ANSI the bare division would abort the whole job), NULL when an
    input vector is NULL (MISSING != EMPTY: a missing embedding has no
    similarity, where a zero vector has a defined degenerate one — the
    round-4 NULL convention), else the raw ratio clamped to [-1, 1].
    CaseWhen short-circuits per row, so the division never evaluates on
    the zero-denominator rows and the nonzero path stays bit-identical to
    the unguarded fold. The clamp sits INSIDE the non-NULL branch because
    Spark's least/greatest SKIP nulls (greatest(NULL, -1.0) = -1.0 would
    resurrect a missing score). Oracles mirror the convention with a CASE
    around list_cosine_similarity (whose own zero-vector behavior — NaN
    clamped to -1.0 — is neither portable nor meaningful): an explicit
    IS NULL leg, then the zero-norm leg, then the raw similarity."""
    clamped = F.least(F.greatest(dot / denom, F.lit(-1.0)), F.lit(1.0))
    # denom NULL (NULL vector) -> neither branch -> implicit NULL. The
    # dot.isNotNull() conjunct guards the one asymmetric corner (NULL dot
    # with a non-NULL denom) from the null-skipping clamp turning it
    # into -1.0.
    return F.when(dot.isNotNull() & (denom != 0.0), clamped).when(
        denom == 0.0, F.lit(0.0)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(||a||*||b||), clamped to [-1, 1]; 0.0 on zero-norm inputs.

    Two details make the nonzero path bit-identical to DuckDB's
    `list_cosine_similarity`: the norm product is two sqrts multiplied (NOT
    sqrt-of-product), and the result is clamped — float rounding can push
    self-similarity to 1.0000000000000002, which DuckDB clips."""
    return guarded_cosine(dot_product(a, b), l2_norm(a) * l2_norm(b))


def const_vec(vec: list[float]) -> Column:
    """A constant vector as ONE Literal node (array<double>).

    Building it as `F.array(F.lit(x), ...)` creates dim+1 expression nodes
    per use — with 16 centroids x 64 dims that's thousands of nodes, and
    Catalyst analysis + whole-stage codegen compile time (a per-QUERY fixed
    cost, pure overhead for short interactive queries) grows with tree
    size. A single Literal carries the same ArrayData at O(1) tree size."""
    return F.lit([float(x) for x in vec])


def py_l2_norm(vec: list[float]) -> float:
    """Driver-side ||v||, bit-identical to `l2_norm` on the same values:
    Python `sum` and the Catalyst fold both accumulate left-to-right over
    IEEE doubles, and both sqrts are correctly rounded."""
    import math

    return math.sqrt(sum(float(x) * float(x) for x in vec))


def cosine_to_const(a: Column, vec: list[float], a_norm: Column | None = None) -> Column:
    """cosine_similarity against a constant vector, with the constant's
    norm folded at plan-build time (per-row work halves: one zip_with fold
    + the row norm instead of three folds). Pass `a_norm` to reuse an
    already-computed row norm across many constants (IVF scoring)."""
    na = l2_norm(a) if a_norm is None else a_norm
    return guarded_cosine(
        dot_product(a, const_vec(vec)), na * F.lit(py_l2_norm(vec))
    )
