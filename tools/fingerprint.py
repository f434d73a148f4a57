"""Query-implementation fingerprints: the regrade-queue automation
(VERDICT r6 #3).

Rounds 5 and 6 both caught changed-output queries still sitting in
`_PREVIOUSLY_GRADED` only by human diligence. This tool freezes, per
registered query, a fingerprint of everything that determines its graded
output:

- **src**  — sha256 of the query function's docstring-stripped AST dump
  (direct implementation edits; cheap, no Spark);
- **oracle** — sha256 of the DuckDB oracle SQL ('' for rows-only queries);
- **plan** — sha256 of the NORMALIZED analyzed logical plan at sf0.001
  (catches shared-operator changes the function source can't see —
  r6's asof/cdc fixes are exactly this class). Plan strings are stable
  across sessions once exprIds are normalized (probed; the manifest
  regeneration itself re-proves it every round). Live-streaming queries
  (q_stream_live_*) EXECUTE a stream when called and return a
  memory-sink scan, so their plan part is skipped — src+oracle still
  fingerprint them, and their semantics are pinned row-exact in
  tests/test_streaming.py.

The committed manifest is `tools/fingerprints.json`. Enforcement:

- tests/test_coverage.py checks the CHEAP parts (src+oracle) for every
  `_PREVIOUSLY_GRADED` query on every pytest run;
- `python -m tools.fingerprint --check` (a standing round gate in the
  verify skill) additionally checks the plan part with a live session.

A mismatch for a `_PREVIOUSLY_GRADED` name means: move the query into
`_GRADE_FIRST`, then regenerate with `python -m tools.fingerprint --write`.
`--write` refuses to overwrite a changed entry for a _PREVIOUSLY_GRADED
name unless `--force` is given, so the manifest can't be silently
refreshed past the queue discipline.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST = os.path.join(REPO, "tools", "fingerprints.json")
SF_DIR_DEFAULT = "/root/testdata/sf0.001"

# Queries whose callable executes a live micro-batch stream and returns a
# memory-sink scan: the analyzed plan of the RETURNED frame is just the
# sink table, so only src+oracle are fingerprinted.
_NO_PLAN_PREFIXES = ("q_stream_live_",)

_EXPR_ID = re.compile(r"#\d+")
_CACHE_ID = re.compile(r"\bcache_[0-9a-f]+\b")
# higher-order-function lambda variables print with a SESSION-GLOBAL
# counter ("lambda x_483#"): how many lambdas were planned earlier in the
# session leaks into the name — pure noise for fingerprinting
_LAMBDA_VAR = re.compile(r"(?<=lambda )([A-Za-z]+)_\d+#")


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest()[:20]


def _strip_docstrings(node: ast.AST) -> None:
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(n, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                n.body = body[1:] or [ast.Pass()]


def src_fingerprint(fn) -> str:
    """Docstring-stripped AST dump of the function — whitespace/comment/
    docstring edits don't move it; any code edit does."""
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    _strip_docstrings(tree)
    return _sha(ast.dump(tree))


def _norm_plan(plan: str, sf_dir: str) -> str:
    plan = _LAMBDA_VAR.sub(r"\1_#", plan)
    plan = _EXPR_ID.sub("#", plan)
    plan = _CACHE_ID.sub("cache_", plan)
    plan = plan.replace(sf_dir, "<SF>").replace(REPO, "<REPO>")
    # q_join_bucketed registers PID-suffixed catalog tables/paths
    # (orders_bk_<sftag>_<pid>, .../bk_orders_<pid>) so concurrent harness
    # processes never collide — the suffix is session noise here. The
    # replacement is ANCHORED to the bk_ token: a bare str(pid)
    # substitution once mangled whichever query's float literals (probe
    # vectors, centroids) happened to contain the current PID's digit
    # run, flagging a different random victim every run.
    plan = re.sub(
        rf"(bk_[a-z0-9_]*?){os.getpid()}\b", r"\g<1><PID>", plan
    )
    # lifecycle scratch dirs are keyed .scratch/<sf>.pid<pid>/ since r11
    # (".pid" spelling per ADVICE r10 — a bare ".<pid>" suffix was
    # ambiguous against legitimate sf names like sf0.1 when the pid's
    # digits coincide, e.g. pid 1 in a container; ".pid" never occurs in a
    # scale-factor name so this strip can't mangle unrelated paths). The
    # pid is session noise exactly like the bk_ suffix above. It is
    # DROPPED (not replaced by a token): pre-r10 plans carried the bare
    # .scratch/<sf>/ path, so erasing the token reproduces the historical
    # normal form and the committed lifecycle fingerprints stay valid — a
    # path-only re-keying is not an implementation change and must not
    # look like one.
    plan = re.sub(
        rf"(\.scratch/[^/\s]*?)\.pid{os.getpid()}\b", r"\g<1>", plan
    )
    return plan


def plan_fingerprint(spark, sf_dir: str, fn) -> str:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    return _sha(_norm_plan(plan, sf_dir))


def cheap_fingerprints() -> dict[str, dict[str, str]]:
    """src+oracle parts for every registered query. No Spark session."""
    from quarkus_etl_spark.queries.base import ORACLES, all_query_callables

    qs = all_query_callables()
    return {
        name: {"src": src_fingerprint(fn), "oracle": _sha(ORACLES.get(name, ""))}
        for name, fn in qs.items()
    }


def full_fingerprints(spark, sf_dir: str) -> dict[str, dict[str, str]]:
    from quarkus_etl_spark.queries.base import all_query_callables

    out = cheap_fingerprints()
    qs = all_query_callables()
    for name, fn in qs.items():
        if name.startswith(_NO_PLAN_PREFIXES):
            continue
        out[name]["plan"] = plan_fingerprint(spark, sf_dir, fn)
    return out


def load_manifest() -> dict[str, dict[str, str]]:
    try:
        with open(MANIFEST) as fh:
            return json.load(fh)
    except OSError:
        return {}


def diff_against_manifest(
    current: dict[str, dict[str, str]], manifest: dict[str, dict[str, str]]
) -> list[str]:
    """Human-readable drift list for PREVIOUSLY-GRADED names only: a
    _GRADE_FIRST query is already queued for a fresh verdict, so its drift
    is expected until the next manifest regeneration."""
    from quarkus_etl_spark.queries.base import _GRADE_FIRST, _PREVIOUSLY_GRADED

    problems = []
    for name in sorted(_PREVIOUSLY_GRADED):
        if name in _GRADE_FIRST:
            continue
        cur, old = current.get(name), manifest.get(name)
        if cur is None:
            problems.append(f"{name}: in _PREVIOUSLY_GRADED but not registered")
            continue
        if old is None:
            problems.append(f"{name}: no manifest entry — regenerate (--write)")
            continue
        for part, v in cur.items():
            if part in old and old[part] != v:
                problems.append(
                    f"{name}: {part} fingerprint drifted — its driver verdict "
                    "no longer matches this implementation; move it to "
                    "_GRADE_FIRST and regenerate the manifest"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true",
                    help="verify the manifest and exit nonzero on drift — the "
                         "default when --write is absent; the explicit flag "
                         "exists so the round battery drives all three "
                         "manifest gates (plan_audit / type_audit / "
                         "fingerprint) with the same --check one-liner "
                         "(VERDICT r9 #7)")
    ap.add_argument("--write", action="store_true", help="regenerate manifest")
    ap.add_argument("--force", action="store_true",
                    help="allow --write to overwrite drifted previously-graded entries")
    ap.add_argument("--cheap", action="store_true",
                    help="check only src+oracle parts (no Spark session)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR_FP", SF_DIR_DEFAULT))
    args = ap.parse_args()
    if args.check and args.write:
        ap.error("--check and --write are mutually exclusive")

    if args.cheap and not args.write:
        current = cheap_fingerprints()
    else:
        from quarkus_etl_spark.session import get_spark

        spark = get_spark()
        current = full_fingerprints(spark, args.sf)

    manifest = load_manifest()
    problems = diff_against_manifest(current, manifest)

    if args.write:
        # a missing entry is what --write exists to create; only DRIFT of an
        # existing previously-graded entry blocks regeneration
        problems = [p for p in problems if "no manifest entry" not in p]
        if problems and not args.force:
            print("REFUSING --write: previously-graded entries drifted "
                  "(re-queue them in _GRADE_FIRST first, or --force):")
            for p in problems:
                print("  " + p)
            return 1
        with open(MANIFEST, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(current)} fingerprints -> {MANIFEST}")
        return 0

    if problems:
        print(f"FINGERPRINT DRIFT ({len(problems)}):")
        for p in problems:
            print("  " + p)
        return 1
    print(f"fingerprints consistent: {len(current)} queries "
          f"({'cheap' if args.cheap else 'full'} check)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
