"""Skew-handling join strategies.

AQE's skew-join splitting (on by default in the session factory) handles
MODERATE skew adaptively by splitting oversized shuffle partitions. Explicit
key salting is the remaining lever when a single join key's rows exceed what
any one task should hold even after AQE splitting — the classic case being a
low-cardinality or power-law key (event_type, country, null-bucket) joined
against a side too large or wrong-shaped to broadcast, or streaming joins
where AQE does not apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALTABLE = {"inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_src: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join that spreads each hot left key over `n_salts` reducers:
    left rows get a deterministic salt (xxhash64 of `salt_src` — a
    high-cardinality column set, e.g. the row's primary key — so the
    spread is uniform and replay-stable), the right side is replicated
    once per salt value, and the join key becomes (key…, salt). The result
    is value-identical to the plain join; only the shuffle layout changes:
    a key holding 10% of a 100 TB fact now lands on 16 reducers instead
    of one.

    Cost model: replication multiplies the RIGHT side by n_salts — use
    when the right side is small-to-medium (but not broadcastable) and
    the left is the skewed giant. Only left-preserving joins are allowed:
    under right/full outer joins the replicated unmatched right rows
    would surface n_salts times."""
    if how.replace("_", "") not in {h.replace("_", "") for h in _SALTABLE}:
        raise ValueError(f"salted_join supports left-preserving joins only, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_rep = right.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")).alias(
            "__salt"
        ),
    )
    return l_salted.join(r_rep, [*on, "__salt"], how).drop("__salt")
