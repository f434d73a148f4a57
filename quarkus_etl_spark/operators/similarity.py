"""Similarity search over embedding columns (SURVEY.md Tier C q_sim_*).

Three tiers, slowest-exact to fastest-approximate:
- `brute_force_topk`: exact cosine vs a probe vector; Spark plans
  TakeOrderedAndProject (per-partition heap, no global sort). The correct
  baseline at any scale where a full scan is acceptable.
- `pairwise_similar`: exhaustive blocked self-join (exact, oracle-checkable;
  the block column bounds the quadratic).
- `lsh_topk` / random-hyperplane bucketing: the 100TB path — sign-bit
  signatures from d fixed hyperplanes put each vector in one of 2^d buckets;
  probing the query's bucket (+ optional multi-probe neighbors at hamming
  distance 1) reduces candidates by ~2^d while keeping recall high for
  high-cosine neighbors. Hyperplanes are seeded-deterministic.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import (
    const_vec,
    cosine_to_const,
    dot_product,
    guarded_cosine,
    l2_norm,
    to_double_array,
)
from ..plans.tuning import ensure_parallelism, log_route, routing_count


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, probe: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine vs `probe`, deterministic tiebreak on id."""
    v = to_double_array(vec_col)
    sim = cosine_to_const(v, probe)
    return (
        ensure_parallelism(df).select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pairwise_similar(
    df: DataFrame, id_col: str, vec_col: str, block_col: str, threshold: float
) -> DataFrame:
    """All pairs within a block with cosine >= threshold (exact)."""
    from ..functions.vectors import dot_product, l2_norm

    # Precompute each vector's norm ONCE (n sqrt-folds) instead of twice per
    # pair (n^2). Repartition the RAW vectors BEFORE the norm projection —
    # repartition() sits above its child, so projecting first would compute
    # every norm inside the single-split scan stage on one core.
    #
    # No broadcast HINT on either side: the build side is the full dataset,
    # which only fits executors at small scale. Catalyst's size estimate
    # auto-broadcasts when it measurably fits (local/small-SF) and otherwise
    # plans a shuffle join on the __blk equi-key, where AQE's skew-join
    # splitting keeps low-cardinality blocks parallel. An unconditional hint
    # here was round-1's scale-killer.
    pre = ensure_parallelism(
        df.select(
            F.col(id_col), F.col(block_col).alias("__blk"), to_double_array(vec_col).alias("__v")
        )
    )
    base = pre.select(F.col(id_col), "__blk", "__v", l2_norm(F.col("__v")).alias("__n"))
    a, b = base.alias("a"), base.alias("b")
    sim = guarded_cosine(
        dot_product(F.col("a.__v"), F.col("b.__v")), F.col("a.__n") * F.col("b.__n")
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
            sim.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def batch_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probes: DataFrame,
    probe_id_col: str,
    probe_vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Batched exact top-k: the JOIN form of similarity search — one scan of
    `df` scores EVERY probe (the probe batch broadcasts; candidates never
    shuffle), then a two-level tournament picks per-probe winners:

    1. partial top-k inside each scan partition (collect_list bounded by the
       partition's rows, sorted + sliced to k), so the shuffle carries
       k rows per (probe, partition) instead of the full
       |probes| x |candidates| score matrix;
    2. a closing window ranks |probes| x partitions x k survivors —
       negligible at any scale, and balanced because real probe batches are
       >> cores.

    Norms are computed once per side; the cosine fold matches DuckDB's
    `list_cosine_similarity` bit-for-bit (see functions.vectors), and the
    double negation used for the struct sort is an exact IEEE involution,
    so the tournament is value-identical to a global ORDER BY."""
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col), to_double_array(vec_col).alias("__v"))
        .withColumn("__n", l2_norm(F.col("__v")))
    )
    p = probes.select(
        F.col(probe_id_col).alias("__pid"), to_double_array(probe_vec_col).alias("__pv")
    ).withColumn("__pn", l2_norm(F.col("__pv")))
    sim = guarded_cosine(
        dot_product(F.col("__pv"), F.col("__v")), F.col("__pn") * F.col("__n")
    )
    scored = base.crossJoin(F.broadcast(p)).select(
        "__pid",
        F.col(id_col),
        sim.alias("cosine"),
        F.spark_partition_id().alias("__part"),
    )
    partial = scored.groupBy("__pid", "__part").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("cosine")).alias("nc"), F.col(id_col).alias("id"))
                )
            ),
            1,
            k,
        ).alias("top")
    )
    cand = partial.select("__pid", F.explode("top").alias("s")).select(
        "__pid", F.col("s.id").alias(id_col), (-F.col("s.nc")).alias("cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col("__pid").alias(probe_id_col), F.col(id_col), "cosine")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def md5_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """ENGINE-PORTABLE hyperplane family: entry (i, d) is uniform in [-1, 1)
    derived from the first 32 bits of md5("i:d") — the exact double DuckDB
    computes from (CAST('0x'||substr(md5(i||':'||d),1,8) AS BIGINT)
    / 4294967296.0) * 2 - 1, so an oracle can rebuild the planes in SQL and
    replicate every bucket bit-for-bit (list_dot_product's fold is
    left-to-right like ours — verified over the full fixture). Uniform-cube
    directions are a valid sign-LSH family (any sign-symmetric component
    distribution works); the Gaussian family stays the production default."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
             / 4294967296.0) * 2 - 1
            for d in range(dim)
        ]
        for i in range(n_planes)
    ]


# Cap for the auto-sized plane count: 2^32 buckets covers n/target up to
# ~4.3e9 (≈860 billion vectors at target_bucket=200) and keeps the
# multi-probe fan-out (1+P per row) bounded. Bucket ids are bigint so the
# cap is about probe cost, not bit width.
AUTO_PLANES_MAX = 32


def _auto_planes(df: DataFrame, target_bucket: int) -> int:
    """P = log2(n/target): expected bucket population stays ~target at any
    scale (fixed P goes quadratic — measured, see knn_graph_ann). The
    count() is a plan-build-time action — metadata-cheap on raw scans;
    callers passing derived frames pay one evaluation of their plan."""
    n_rows = max(routing_count(df), 1)
    p = math.ceil(math.log2(max(n_rows / target_bucket, 1.0)))
    return min(max(3, p), AUTO_PLANES_MAX)


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the data (one limit-1 scan at plan build).
    Hyperplanes must match the data's dim: a mismatched constant would
    null every dot product and silently hash all rows to one bucket.
    NULL/empty vectors are skipped — an arbitrary first() row being a
    failed-encoder row must not abort the whole query (the probe is
    partition-order-dependent); only an all-degenerate table raises.
    Cached per (session, plan, files) via routing_meta — the dim cannot
    change while all three are unchanged, and the probe cost (~0.25 s at
    sf0.1) was paid on every operator invocation (r11)."""
    from ..plans.tuning import routing_meta

    def _compute(d: DataFrame):
        return (
            d.select(F.size(to_double_array(vec_col)).alias("d"))
            .where(F.col("d") > 0)
            .first()
        )

    row = routing_meta(df, f"vec_dim:{vec_col}", _compute)
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot derive vector dim from column {vec_col!r}")
    return int(row["d"])


def add_lsh_bucket(
    df: DataFrame, vec_col: str, planes: list[list[float]], out_col: str = "bucket"
) -> DataFrame:
    """Sign-bit bucket id from the hyperplane dot products (pure Column
    algebra — one pass, codegen'd)."""
    v = to_double_array(vec_col)
    bucket = None
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(v, const_vec(p), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        # bigint, not int: the auto-sized plane count grows with data volume
        # and 1 << i exceeds int32 from i=31 (ANSI mode would error the cast).
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn(out_col, bucket)


def _bucket_of(probe: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(probe, p)) >= 0:
            b |= 1 << i
    return b


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    plane_family: str = "gauss",
) -> DataFrame:
    """ANN top-k: score only vectors in the probe's bucket (plus hamming-1
    neighbor buckets when multiprobe) — candidate set ~n/2^planes * (1 +
    planes). Recall is approximate by design; exactness is brute_force_topk's
    job. plane_family "md5" swaps in the engine-portable hyperplanes so an
    SQL oracle can replicate the candidate set exactly."""
    if plane_family not in ("gauss", "md5"):
        raise ValueError(f"unknown plane_family: {plane_family!r}")
    dim = len(probe)
    planes = (
        md5_hyperplanes(dim, n_planes)
        if plane_family == "md5"
        else random_hyperplanes(dim, n_planes, seed)
    )
    target = _bucket_of(probe, planes)
    probe_buckets = [target] + ([target ^ (1 << i) for i in range(n_planes)] if multiprobe else [])
    bucketed = add_lsh_bucket(df, vec_col, planes)
    cands = bucketed.where(F.col("bucket").isin(probe_buckets))
    v = to_double_array(vec_col)
    sim = cosine_to_const(v, probe)
    return (
        cands.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization
# --------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int, refine_iters: int = 0
) -> list[list[float]]:
    """Deterministic centroid seed: the first `n_cells` vectors by id,
    optionally refined with `refine_iters` Lloyd (k-means) steps. One tiny
    n_cells-row driver collect per iteration.

    Each refinement step is fully distributed and deterministic: cell
    assignment is the same pure-Column scoring `add_ivf_cell` uses at query
    time, and the new centroid means ride the portable fixed-point
    aggregation (floor to a 1e-15 grid -> exact integer sums; see
    q_emb_centroid) — shuffle volume |cells| x dim per step. Empty cells
    keep their previous centroid. Balanced cells mean balanced scan work
    per probe, which is what refinement buys the index at scale."""
    rows = (
        df.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(to_double_array(vec_col).alias("v"))
        .collect()
    )
    cents = [list(r["v"]) for r in rows]
    for _ in range(refine_iters):
        assigned = add_ivf_cell(df, vec_col, cents, out_col="__cell")
        exploded = assigned.select(
            "__cell", F.posexplode(to_double_array(vec_col)).alias("pos", "x")
        )
        q = F.floor(F.col("x") * F.lit(1e15)).cast("decimal(28,0)")
        means = (
            exploded.groupBy("__cell", "pos")
            .agg((F.sum(q).cast("double") / F.lit(1e15) / F.count(F.lit(1))).alias("m"))
            .groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("__cell", F.col("pm.m").alias("mean"))
            .collect()
        )
        new_cents = list(cents)
        for r in means:
            new_cents[r["__cell"]] = [float(x) for x in r["mean"]]
        cents = new_cents
    return cents


def add_ivf_cell(
    df: DataFrame, vec_col: str, centroids: list[list[float]], out_col: str = "cell"
) -> DataFrame:
    """Assign each vector to its max-cosine centroid — pure Column algebra:
    build the score array, take array_position of its max. Ties resolve to
    the lowest cell id (array_position finds the first occurrence)."""
    from ..functions.vectors import l2_norm

    v = to_double_array(vec_col)
    # The row norm is shared by every centroid score: compute it once per
    # row (a named column, not a repeated subtree) so scoring n_cells
    # centroids costs n_cells dot-folds + ONE norm-fold, and the expression
    # tree stays linear in n_cells (fast analysis/codegen).
    nv = l2_norm(v)
    scores = F.array(*[cosine_to_const(v, c, a_norm=F.col("__nv")) for c in centroids])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return (
        df.withColumn("__nv", nv).withColumn(out_col, cell).drop("__nv")
    )


def _probe_cells(probe: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """Driver-side probe->cell routing, BIT-IDENTICAL to the engine/oracle
    cosine convention (functions.vectors guarded_cosine + DuckDB
    list_cosine_similarity): left-to-right folds, separately-rooted norms,
    zero-norm -> 0.0 (NOT -1.0 — a zero centroid must rank exactly where the
    Column/SQL forms rank it), result clamped to [-1, 1], ties -> lowest
    cell id. The q_sim_ann_ivf recall-contract oracle replicates this
    routing in SQL, so any convention drift here is a hash FAIL, not a
    silent recall blip."""

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        denom = math.sqrt(sum(float(x) * float(x) for x in a)) * math.sqrt(
            sum(float(y) * float(y) for y in b)
        )
        if denom == 0.0:
            return 0.0
        return min(max(dot / denom, -1.0), 1.0)

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-cos(probe, centroids[i]), i)
    )
    return ranked[:nprobe]


def ivf_write_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_cells: int = 16,
    refine_iters: int = 1,
) -> list[list[float]]:
    """Materialize the IVF index AT REST: assign every vector to its cell
    and write hive-partitioned by `cell`. This is the claim `ivf_topk`'s
    docstring makes, made literal — after this, a probe query is partition
    PRUNING, not filtering: Spark's planner selects only the nprobe cell
    directories, so the scan reads ~nprobe/n_cells of the data with zero
    query-time shuffle. Returns the centroids (the only driver-side state;
    at scale these persist next to the index)."""
    cents = ivf_centroids(df, vec_col, id_col, n_cells, refine_iters=refine_iters)
    assigned = add_ivf_cell(ensure_parallelism(df), vec_col, cents)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    return cents


def ivf_query_indexed(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    probe: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """ANN top-k over a stored IVF index: route the probe to its nprobe
    cells driver-side (tiny centroid math), scan ONLY those hive
    partitions (PartitionFilters — pinned by test), score, top-k."""
    cells = _probe_cells(probe, centroids, nprobe)
    stored = spark.read.parquet(path).where(F.col("cell").isin(cells))
    sim = cosine_to_const(to_double_array(vec_col), probe)
    return (
        stored.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 3,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF ANN: route the probe to its `nprobe` nearest cells and scan only
    those (~nprobe/n_cells of the data). The cell assignment is a pure
    column expression, so at scale the index is just a partition/cluster-by
    column on the stored table — no shuffle at query time."""
    cents = ivf_centroids(df, vec_col, id_col, n_cells, refine_iters=refine_iters)
    cells = _probe_cells(probe, cents, nprobe)
    bucketed = add_ivf_cell(ensure_parallelism(df), vec_col, cents)
    cands = bucketed.where(F.col("cell").isin(cells))
    sim = cosine_to_const(to_double_array(vec_col), probe)
    return (
        cands.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_graph_ann(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_planes: int | None = None,
    seed: int = 42,
    block_col: str | None = None,
    target_bucket: int = 200,
    n_tables: int = 2,
    collapse_duplicates: bool = True,
) -> DataFrame:
    """APPROXIMATE k-NN graph — the scale path for exact blocked kNN
    (quadratic per block): each vector's candidates are the members of its
    sign-LSH bucket plus all hamming-1 neighbor buckets (multi-probe on
    the QUERY side only, so each candidate pair appears exactly once per
    table), across `n_tables` INDEPENDENT plane families, exact-cosine
    reranked to the top k per source. Independent tables are the classic
    recall lever (union of L S-curves: 1-(1-p)^L); each table's plane
    count is bumped by ceil(log2(L)) so the total candidate volume stays
    near the single-table budget ((P+8)/(P+1)x with the bounded hamming-2
    probes — 1.64x at P=10, falling toward 1 as P gets large). Measured on
    fixtures: recall@3 0.62 -> 0.95 (sf0.01) / 0.97 (sf0.001); 200k-vec
    stress 32 s -> 58 s. Plan per table: one map-only bucket assignment,
    a (1+P+C(h2,2))-way probe explode on the query side, a shuffled
    equi-join on the bucket id; tables union into one (src, nbr) dedup +
    bounded per-source window. Recall is approximate by design (pytest
    pins a floor vs the exact graph).

    EXACT-DUPLICATE COLLAPSE (default on; the r7 scale fix): identical
    vectors share every sign bit under every plane family, so no plane
    count can split them — bucket population is >= the duplicate
    multiplicity and the bucket join is QUADRATIC in it. Measured: 2M
    vectors as 2000 distinct x 1000 copies (one hot boilerplate page per
    distinct doc — a real web-corpus shape) did not finish in 10 minutes.
    The graph is therefore built on DISTINCT (vector[, block]) groups
    (one representative each), then expanded: each copy's first k
    neighbors are fellow copies (exact duplicates ARE the true top-k,
    cosine 1.0 for nonzero vectors; 0.0 for identical ZERO vectors and
    no fellow edges at all for NULL vectors, matching the guarded_cosine
    convention the uncollapsed path applies) from a k+1-bounded
    per-group head list, merged with its
    representative's graph edges through one bounded top-k window. The
    group aggregate collapses duplicates MAP-SIDE (the exchange carries
    ~distinct vectors) and a limit-1 existence probe routes
    duplicate-free inputs straight to the plain LSH path, so pristine
    data pays one map-combined aggregate and nothing else. For
    all-distinct inputs the output is identical to the uncollapsed form
    (pinned by test); LSH work is quadratic only in DISTINCT bucket
    population, which auto_planes bounds."""
    from pyspark.sql import Window

    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    if n_planes is None:
        # P MUST grow with n: the per-bucket population is n_block/2^P and
        # candidate volume is quadratic in it, so a fixed P turns the
        # bucket join quadratic as data grows (measured: P=3 fine at 20k
        # vectors, effectively unbounded at 200k). The +log2(L) keeps the
        # L-table union at the single-table candidate budget.
        n_planes = min(
            _auto_planes(df, target_bucket) + max(n_tables - 1, 0).bit_length(),
            AUTO_PLANES_MAX,
        )
    dim = _vec_dim(df, vec_col)
    cols = [F.col(id_col), to_double_array(vec_col).alias("__v")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("__blk"))
    raw = ensure_parallelism(df.select(*cols))
    members = None
    if collapse_duplicates:
        grp = ["__v"] + (["__blk"] if block_col is not None else [])
        # hash aggregate keyed on the vector itself (bit-exact grouping, no
        # collision risk) — map-side partials collapse duplicates BEFORE
        # the shuffle, so the exchange carries ~distinct vectors only
        groups = raw.groupBy(*grp).agg(
            F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__m")
        )
        # Adaptive routing (same pattern as fits_exact_pairwise): the
        # expansion machinery only pays when duplicates EXIST. A corpus
        # that already ran exact dedup — or the pristine fixtures — takes
        # the zero-extra-shuffle path; the probe is a limit-1 early-out,
        # cached per (session, plan, files) like routing_count (the probe
        # aggregate cost ~0.9 s per invocation at sf0.1 — r11; the boolean
        # cannot change while session, plan and input files are unchanged).
        from ..plans.tuning import routing_meta

        has_dup = routing_meta(
            groups,
            "dup_probe",
            lambda g: g.where(F.col("__m") > 1).limit(1).count() > 0,
        )
        if has_dup:
            nodes = groups.select(F.col("__rep").alias(id_col), *grp)
            members = raw.join(groups, grp).select(
                F.col(id_col).alias("__src"),
                "__rep",
                "__m",
                # group norm, carried so the fellow-edge shortcut can honor
                # the guarded_cosine convention (see the fellows projection)
                l2_norm(F.col("__v")).alias("__gn"),
            )
        else:
            nodes = raw
    else:
        nodes = raw
    base = nodes.withColumn("__n", l2_norm(F.col("__v")))

    def table_pairs(table_seed: int) -> DataFrame:
        planes = random_hyperplanes(dim, n_planes, table_seed)
        bucketed = add_lsh_bucket(base, "__v", planes, out_col="__b")
        # Probe set: self bucket, all hamming-1 flips, and hamming-2 flips
        # over the FIRST `h2` planes only — a fixed +C(h2,2) probes that
        # buys the S-curve tail without scaling the fan-out with P (full
        # hamming-2 would add C(P,2) ~ P^2/2 probes).
        h2 = min(n_planes, 4)
        probe_buckets = F.array(
            F.col("__b"),
            *[F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            *[
                F.col("__b").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(h2)
                for j in range(i + 1, h2)
            ],
        )
        probe_cols = [
            F.col(id_col).alias("__src"),
            F.col("__v").alias("__pv"),
            F.col("__n").alias("__pn"),
            F.explode(probe_buckets).alias("__pb"),
        ]
        if block_col is not None:
            probe_cols.insert(3, F.col("__blk").alias("__pblk"))
        probes = bucketed.select(*probe_cols)
        sim = guarded_cosine(
            dot_product(F.col("__pv"), F.col("__v")), F.col("__pn") * F.col("__n")
        )
        cond = (F.col("__pb") == F.col("__b")) & (F.col("__src") != F.col(id_col))
        if block_col is not None:
            cond = cond & (F.col("__pblk") == F.col("__blk"))
        return probes.join(bucketed, cond).select(
            "__src", F.col(id_col).alias("__nbr"), sim.alias("cosine")
        )

    pairs = table_pairs(seed)
    for t in range(1, n_tables):
        pairs = pairs.unionByName(table_pairs(seed + 7919 * t))
    if n_tables > 1:
        # A pair found by several tables carries the identical cosine (same
        # deterministic fold on the same vectors), so max() is pure dedup;
        # the groupBy partitions by __src like the window right after, and
        # AQE coalesces the back-to-back exchanges.
        pairs = pairs.groupBy("__src", "__nbr").agg(F.max("cosine").alias("cosine"))

    w = Window.partitionBy("__src").orderBy(F.desc("cosine"), F.asc("__nbr"))
    rep_graph = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__src").alias("src"),
            F.col("__nbr").alias("nbr"),
            "cosine",
            F.col("__rn").alias("nn_rank"),
        )
    )
    if members is None:
        return rep_graph

    # Expansion: copies inherit their representative's edges, plus fellow
    # copies as cosine-1.0 neighbors from a k+1-BOUNDED per-group head
    # list (the first k+1 ids in id order — enough to give every copy k
    # fellows after self-exclusion, O(k) state per group no matter the
    # multiplicity). The head window runs over DUPLICATED members only
    # (usually a small minority). Everything downstream is <= 2k rows per
    # copy.
    dup = members.where(F.col("__m") > 1)
    hw = Window.partitionBy("__rep").orderBy(F.asc("__src"))
    heads = (
        dup.withColumn("__gr", F.row_number().over(hw))
        .where(F.col("__gr") <= k + 1)
        .groupBy("__rep")
        .agg(F.sort_array(F.collect_list(F.col("__src"))).alias("__head"))
    )
    fellows = (
        # NULL-vector groups are excluded entirely: with collapse off such
        # rows never bucket-match (NULL bucket joins nothing) and emit zero
        # edges, so the expansion must not mint edges for them either.
        dup.where(F.col("__gn").isNotNull())
        .join(heads, "__rep")
        .select(
            "__src",
            F.explode(
                F.slice(
                    F.filter("__head", lambda x: x != F.col("__src")), 1, k
                )
            ).alias("__nbr"),
            # identical NONZERO vectors: the true cosine, not the float
            # fold. Identical ZERO vectors (failed-encoder rows duplicate
            # naturally) follow the guarded_cosine convention — 0.0, not
            # 1.0 — so collapse on/off agree on where they rank (ADVICE
            # r7: a 1.0 here made zero vectors top-ranked neighbors while
            # the uncollapsed path ranks them last at 0.0).
            F.when(F.col("__gn") > 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
    )
    inherited = members.join(
        rep_graph, members["__rep"] == rep_graph["src"]
    ).select("__src", F.col("nbr").alias("__nbr"), "cosine")
    merged = fellows.unionByName(inherited)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__src").alias("src"),
            F.col("__nbr").alias("nbr"),
            "cosine",
            F.col("__rn").alias("nn_rank"),
        )
    )


# Exact-pairwise routing threshold (q_sim_pairs / q_dedup_embed): the
# blocked half-matrix is quadratic per block — measured 1109 s at 200k
# vectors on local[32] — so above this count the pair generators delegate
# to sign-LSH bucketed candidates with exact-cosine verification
# (precision 1.0 at the threshold, recall bounded by the bucket S-curve).
EXACT_PAIRWISE_MAX_VECS = 50_000


def fits_exact_pairwise(df: DataFrame) -> bool:
    import os

    limit = int(
        os.environ.get("SPARK_GRAFT_EXACT_PAIRWISE_MAX_VECS", EXACT_PAIRWISE_MAX_VECS)
    )
    return routing_count(df) <= limit


def ann_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
    n_planes: int | None = None,
    seed: int = 42,
    target_bucket: int = 200,
) -> DataFrame:
    """APPROXIMATE all-pairs at cosine >= threshold: the scale path for
    `pairwise_similar`. Same multi-probe sign-LSH candidate plan as
    knn_graph_ann — each vector probes its own bucket plus all hamming-1
    neighbors, and the `probe.id < base.id` conjunct makes every unordered
    pair appear EXACTLY once (same-bucket pairs surface only from the
    smaller id's self-probe; one-bit-apart pairs only from the smaller id's
    neighbor-probe) — verified with the exact cosine fold, so every emitted
    pair carries the identical value the exhaustive plan would produce.
    Auto-sized P = log2(n/target) keeps expected bucket size constant as
    data grows (fixed P goes quadratic — measured, see knn_graph_ann).

    Duplicate-multiplicity caveat (differs from knn_graph_ann's collapse):
    identical vectors defeat plane splitting, but here the OUTPUT itself
    is quadratic in multiplicity — all C(m,2) copy-pairs truly satisfy
    any threshold — so collapse cannot help; quadratic cost is the
    declared all-pairs semantics. A duplicate-heavy corpus runs exact
    dedup (dedup_exact / dedup_keep_best) upstream first, which is the
    pipeline order the curation queries already use."""
    if n_planes is None:
        n_planes = _auto_planes(df, target_bucket)
    planes = random_hyperplanes(_vec_dim(df, vec_col), n_planes, seed)
    cols = [F.col(id_col), to_double_array(vec_col).alias("__v")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("__blk"))
    base = ensure_parallelism(df.select(*cols)).withColumn(
        "__n", l2_norm(F.col("__v"))
    )
    bucketed = add_lsh_bucket(base, "__v", planes, out_col="__b")
    probe_cols = [
        F.col(id_col).alias("__pid"),
        F.col("__v").alias("__pv"),
        F.col("__n").alias("__pn"),
        F.explode(
            F.array(
                F.col("__b"),
                *[F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("__pb"),
    ]
    if block_col is not None:
        probe_cols.insert(3, F.col("__blk").alias("__pblk"))
    probes = bucketed.select(*probe_cols)
    sim = guarded_cosine(
        dot_product(F.col("__pv"), F.col("__v")), F.col("__pn") * F.col("__n")
    )
    cond = (F.col("__pb") == F.col("__b")) & (F.col("__pid") < F.col(id_col))
    if block_col is not None:
        cond = cond & (F.col("__pblk") == F.col("__blk"))
    return (
        probes.join(bucketed, cond)
        .select(
            F.col("__pid").alias("id_a"),
            F.col(id_col).alias("id_b"),
            sim.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def similar_pairs_auto(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Size-routed pair generation: exact blocked half-matrix below
    EXACT_PAIRWISE_MAX_VECS (the oracle-checked plan), sign-LSH candidates
    with exact verification above. Identical (id_a, id_b, cosine) contract
    and identical values on every emitted pair."""
    if fits_exact_pairwise(df):
        log_route("similar_pairs_auto", "exact", approximate=False)
        return pairwise_similar(df, id_col, vec_col, block_col, threshold)
    log_route("similar_pairs_auto", "ann", approximate=True)
    return ann_pairs(df, id_col, vec_col, threshold, block_col=block_col)
