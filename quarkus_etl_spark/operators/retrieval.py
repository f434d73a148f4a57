"""At-rest term-frequency materialized view for the retrieval family.

The three retrieval queries (q_text_bm25, q_hybrid_rrf via bm25,
q_text_postings) all start from the same (doc_id, term) aggregate of the
corpus. Deriving it inline re-runs the corpus explode 2-3x per query
(SCALE.md retrieval row: tf re-derived was the dominant cost at 500k docs).
This module materializes it ONCE per (sf_dir, documents-fingerprint) —
the MV pattern q_agg_incremental already proves for aggregates — so every
consumer reads a small at-rest parquet instead of re-exploding the corpus:

    tf_mv(doc_id, term, fp, tf)
      fp = first position of term in doc (postings), tf = occurrences

written `repartitionByRange` on term, so term-keyed consumers (document
frequency, postings build) read range-partitioned files with parquet
min/max pruning available for term-filtered access. Document length is
sum(tf) per doc — derivable from the MV without touching the corpus.

Freshness: a token file records (mtime_ns, size) of the source
documents.parquet; any change rebuilds. Contents are exact integers, so
consumers are bit-identical to the inline derivation (oracle-checked).

At 100 TB the MV is the inverted-index precursor a production search
pipeline materializes anyway; range partitioning by term is what makes the
posting build and df lookups shuffle-free at scale.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCRATCH = Path(__file__).resolve().parent.parent.parent / ".scratch"

# Per-process cache: (session-key, sf_dir) -> DataFrame, so repeat callers
# skip even the freshness stat.
_MV_CACHE: dict[tuple[str, str], DataFrame] = {}


def _freshness_token(path: str) -> dict:
    """(mtime_ns, size) over the file, or the per-file (name, mtime, size)
    listing for a dir — sizes included so a same-mtime rewrite (coarse
    filesystem timestamps, touch-after-copy) still changes the token."""
    if os.path.isdir(path):
        entries = sorted(os.listdir(path))
        listing = []
        for e in entries:
            st = os.stat(os.path.join(path, e))
            listing.append([e, st.st_mtime, st.st_size])
        return {"entries": listing}
    st = os.stat(path)
    return {"mtime_ns": st.st_mtime_ns, "size": st.st_size}


def mv_paths(sf_dir: str) -> tuple[Path, Path]:
    """(parquet, freshness-marker) locations for `sf_dir`'s tf MV. Keyed by
    the FULL path (hashed), not just the basename: two corpora named alike
    (e.g. /a/sf0.01 and /b/sf0.01 — exactly what the fuzz harness creates)
    must not share one MV file, or each rebuild poisons the other's cached
    reads."""
    import hashlib

    abs_dir = os.path.abspath(sf_dir)
    sf = (
        f"{os.path.basename(os.path.normpath(sf_dir)) or 'sf'}-"
        f"{hashlib.md5(abs_dir.encode()).hexdigest()[:10]}"
    )
    return _SCRATCH / sf / "tf_mv.parquet", _SCRATCH / sf / "tf_mv.token.json"


def tf_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized (doc_id, term, fp, tf) table for `sf_dir`'s
    documents — built on first use, reused (from disk) afterwards."""
    from ..catalog import _session_key, load_table
    from ..functions.text import normalize_text, tokenize
    from ..plans.tuning import ensure_parallelism

    key = (_session_key(spark), os.path.abspath(sf_dir))
    if key in _MV_CACHE:
        return _MV_CACHE[key]

    out, marker = mv_paths(sf_dir)
    token = _freshness_token(os.path.join(sf_dir, "documents.parquet"))

    def _is_fresh() -> bool:
        if not (marker.exists() and out.exists()):
            return False
        try:
            return json.loads(marker.read_text()) == token
        except (ValueError, OSError):
            return False

    if not _is_fresh():
        # Cross-process build serialization (ADVICE r4): two processes over
        # the same sf_dir (pytest + a fuzz run) could both see a stale marker
        # and rebuild concurrently, one reading the other's half-written
        # parquet. An exclusive flock around check-and-build makes one the
        # builder and parks the other until the MV is complete; the loser
        # re-checks under the lock and finds it fresh. The build itself goes
        # to a temp dir renamed into place, so `out` never holds partial data
        # (rename is atomic; the pre-rename rmtree gap only affects a reader
        # whose corpus fingerprint already changed under it).
        import fcntl
        import shutil

        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out.parent / ".build.lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if not _is_fresh():
                if marker.exists():
                    marker.unlink()  # stale marker never outlives a rebuild
                d = load_table(spark, sf_dir, "documents")
                pos = ensure_parallelism(d).select(
                    "doc_id",
                    F.posexplode(tokenize(normalize_text("text"))).alias(
                        "p", "term"
                    ),
                )
                tf = pos.groupBy("term", "doc_id").agg(
                    F.min("p").alias("fp"), F.count(F.lit(1)).alias("tf")
                )
                tmp = out.parent / f"{out.name}.tmp-{os.getpid()}"
                tf.repartitionByRange(32, F.col("term")).write.mode(
                    "overwrite"
                ).parquet(str(tmp))
                if out.exists():
                    shutil.rmtree(out)
                os.rename(tmp, out)
                marker.write_text(json.dumps(token))
                # the session may hold a cached listing for the old MV files
                spark.catalog.refreshByPath(str(out))
    mv = spark.read.parquet(str(out))
    _MV_CACHE[key] = mv
    return mv
