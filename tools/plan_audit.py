"""Physical-plan anti-pattern audit over the whole query inventory.

Sweeps every registered query's executed plan at sf0.001 for the node
classes a 100 TB deployment must review one-by-one, and freezes the
reviewed state into `tools/plan_markers.json`:

- `CartesianProduct` — must stay EMPTY (unbounded x unbounded; even
  q_join_cross plans as a broadcast nested-loop join);
- `BroadcastNestedLoopJoin` — acceptable ONLY for single-row /
  broadcast-scalar fan-outs, the deliberate cross join, and
  q_time_gapfill's dense-grid expansion (its build side is the DISTINCT
  series keys — bounded by key cardinality, not data size; VERDICT r7
  adjudicated it inherent to gapfill's output contract); every name in
  the manifest was reviewed as one of those shapes;
- Python-boundary nodes (`BatchEvalPython`, `ArrowEvalPython`,
  `MapInPandas`, `MapInArrow`, `ArrowWindowPython`,
  `FlatMapGroupsInPandas`, `FlatMapCoGroupsInPandas`) — allowed only
  where SURVEY §2 demands that exact API (the udf_q family, the
  multimodal codec seams);
- `SortAggregate` — the hash-aggregate demotions (string min/max buffers,
  string ordering keys); each reviewed as either inherent (string
  extremes ARE the output) or the documented overflow-safety trade
  (q_attribution / q_dedup_canonical_best packed string keys).

`--check` (the round-close gate) exits 1 naming any drift in EITHER
direction: a new hit means an unreviewed anti-pattern shipped; a
silently-resolved one means the manifest no longer reflects the code and
must be regenerated deliberately (`--write`), mirroring
tools/type_audit.py's frozen-manifest discipline.

The q_stream_live_* queries are excluded: calling them EXECUTES a real
micro-batch run. Their executed micro-batch plans are audited instead by
tests/test_streaming.py::test_live_streaming_executed_plan_markers
(VERDICT r8 #5), which runs each live query and pins the same forbidden
node classes plus the expected stateful operators, via the plan capture
in streaming/streams.py::run_stream_to_memory.

Usage:
    python -m tools.plan_audit --check   # gate (exit 1 on drift)
    python -m tools.plan_audit --write   # regenerate after review
"""

from __future__ import annotations

import argparse
import json
import os

MARKERS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "ArrowWindowPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "SortAggregate",
)

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_markers.json")
# Marker sweeps run at the smallest fixture for speed; honor the repo-wide
# SPARK_GRAFT_SF_DIR convention (bench.py, verify skill) but keep sf0.001
# as the default — the manifest was frozen at that scale (ADVICE r8).
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def sweep(spark, sf_dir: str = SF_DIR) -> dict[str, list[str]]:
    from quarkus_etl_spark.queries import all_query_callables

    hits: dict[str, list[str]] = {m: [] for m in MARKERS}
    for name, fn in sorted(all_query_callables().items()):
        if name.startswith("q_stream_live_"):
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for m in MARKERS:
            if m in plan:
                hits[m].append(name)
    return hits


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    from quarkus_etl_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        hits = sweep(spark, args.sf_dir)
    finally:
        spark.stop()

    if args.write:
        with open(MANIFEST, "w") as f:
            json.dump(hits, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {sum(len(v) for v in hits.values())} marker hits -> {MANIFEST}")
        return

    with open(MANIFEST) as f:
        frozen = json.load(f)
    drift = []
    for m in MARKERS:
        new = sorted(set(hits.get(m, [])) - set(frozen.get(m, [])))
        gone = sorted(set(frozen.get(m, [])) - set(hits.get(m, [])))
        for n in new:
            drift.append(f"NEW {m}: {n} (unreviewed anti-pattern — review, then --write)")
        for n in gone:
            drift.append(f"RESOLVED {m}: {n} (manifest stale — regenerate with --write)")
    if hits.get("CartesianProduct"):
        drift.append(f"CartesianProduct present: {hits['CartesianProduct']}")
    if drift:
        print("\n".join(drift))
        raise SystemExit(1)
    print(
        f"plan audit clean: {sum(len(v) for v in hits.values())} frozen marker hits, "
        "no drift, zero CartesianProduct"
    )


if __name__ == "__main__":
    main()
