"""Deduplication operators for training-data pipelines (SURVEY.md Tier C
q_dedup_*): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point at 100TB):
- Exact dedup is ONE hash shuffle on the dedup key (window keep-first), not
  a global sort.
- MinHash signatures are computed with a single explode + one groupBy (k
  min-aggregations ride the same shuffle); LSH banding turns the O(n²)
  candidate space into per-bucket self-joins. Candidates are then verified
  with exact Jaccard so precision is 1.0 (recall bounded by the LSH S-curve).
- SimHash is explode + one groupBy with 64 bit-majority aggregates; near-dup
  pairs come from banding the fingerprint bytes (pigeonhole: hamming<=3 on
  4 bands guarantees one equal band) and verifying with bit_count(xor).
- No Python UDFs anywhere — everything is codegen'd Column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import char_shingles, normalize_text, tokenize


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def dedup_exact(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key (deterministically the min `order_col`).
    One shuffle; no global sort."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature per document.

    One explode + one groupBy: the k hash families are k columns of the
    exploded shingle relation, min-aggregated together (map-side partial
    aggregation collapses them before the shuffle)."""
    shingled = df.select(
        F.col(id_col), F.explode(char_shingles(normalize_text(text_col), shingle_size)).alias("__sh")
    )
    hashed = shingled.select(
        id_col, *[F.hash(F.col("__sh"), F.lit(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """Band the signature into `bands` groups of r=k/b rows; docs sharing any
    band hash become candidate pairs (id_a < id_b, distinct)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)], F.lit(b)).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = signatures.select(id_col, *band_cols)
    exploded = banded.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def exact_jaccard(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, shingle_size: int = 5
) -> DataFrame:
    """Attach exact shingle-set Jaccard to candidate pairs (verification
    step — precision 1.0)."""
    sets = df.select(
        F.col(id_col), char_shingles(normalize_text(text_col), shingle_size).alias("__set")
    )
    return (
        pairs.join(sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("__set", "set_a"), "id_a")
        .join(sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("__set", "set_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Full near-dedup pipeline: signatures -> LSH candidates -> exact
    verification at `threshold`."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    return exact_jaccard(df, cands, id_col, text_col, shingle_size).where(
        F.col("jaccard") >= threshold
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the token+bigram set: per bit, majority vote of
    feature hashes (+1/-1); fingerprint assembles the positive bits. 64 bits
    (xxhash64) keeps random-document hamming distances near 32, so a
    radius-3 search stays selective even over a small shared vocabulary."""
    from ..functions.text import ngrams

    norm = normalize_text(text_col)
    feats = F.array_union(
        F.array_distinct(tokenize(norm)), F.array_distinct(ngrams(tokenize(norm), 2))
    )
    toks = df.select(F.col(id_col), F.explode(feats).alias("__tok"))
    h = F.xxhash64("__tok")
    one = F.lit(1).cast("long")
    # shiftleft wraps to the sign bit at i=63, which is exactly the mask we
    # want; literals like 1<<63 would overflow the long literal instead.
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    fingerprint = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        fingerprint = fingerprint.bitwiseOR(term)
    return bit_sums.select(id_col, fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Banding the 64-bit fingerprint into (max_hamming+1) 16-bit bands gives the
    pigeonhole guarantee: any pair within the radius shares at least one
    exact band — candidates come from equality joins, never a cross join."""
    bands = max_hamming + 1
    width = SIMHASH_BITS // bands
    fp = simhash(df, id_col, text_col)
    banded = fp.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias(f"band{b}")
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# Word n-gram Jaccard (blocked exhaustive — oracle-checkable)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float,
    n: int = 2,
) -> DataFrame:
    """Exhaustive-within-block pairwise word-n-gram-set Jaccard.
    Deterministic and SQL-replicable (unlike LSH), so it serves as the
    oracle-checked member of the near-dup family; the block column bounds
    the quadratic term. Word n-grams (default bigrams) capture local order,
    which keeps Jaccard discriminative even over a small shared vocabulary
    (unigram sets saturate)."""
    from ..functions.text import ngrams

    toks = tokenize(normalize_text(text_col))
    sets = df.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        F.array_distinct(ngrams(toks, n)).alias("__set"),
    )
    a, b = sets.alias("a"), sets.alias("b")
    j = F.size(F.array_intersect("a.__set", "b.__set")).cast("double") / F.size(
        F.array_union("a.__set", "b.__set")
    )
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            j.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
