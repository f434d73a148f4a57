"""Semantic pins for the second wave-7 batch: CMS guarantees, MMR
diversity, NDCG bounds, KS reference check, label-prop vs connected
components, target-encode algebra, span-corruption invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from quarkus_etl_spark.queries import all_query_callables


def _q(name):
    return all_query_callables()[name]


def test_countmin_never_underestimates(spark, sf_dir):
    rows = _q("q_agg_countmin")(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_est >= r.true_count
        assert r.overestimate == r.cms_est - r.true_count


def test_mmr_selection_is_more_diverse_than_plain_topk(spark, sf_dir):
    """The MMR-selected set's max pairwise cosine must not exceed the max
    pairwise cosine of the plain top-3 (diversity is the whole point)."""
    import math

    def py_cosine(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return dot / (na * nb)

    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    mmr_ids = [r.vec_id for r in _q("q_sim_mmr")(spark, sf_dir).collect()]
    top = _q("q_sim_topk")(spark, sf_dir).collect()
    plain_ids = [r.vec_id for r in top if r.vec_id != 0][:3]

    def max_pair(ids):
        return max(
            py_cosine(emb[a], emb[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        )

    assert max_pair(mmr_ids) <= max_pair(plain_ids) + 1e-12


def test_ndcg_bounds(spark, sf_dir):
    r = _q("q_rank_ndcg")(spark, sf_dir).collect()[0]
    assert 0.0 <= r.ndcg <= 1.0
    assert r.dcg_ppb <= r.idcg_ppb


def test_ks_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    a = sorted(d.n_chars for d in docs if d.lang == "en")
    b = sorted(d.n_chars for d in docs if d.lang == "de")
    values = sorted(set(a) | set(b))
    import bisect

    ks = max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in values
    )
    r = _q("q_stats_ks")(spark, sf_dir).collect()[0]
    assert r.n1 == len(a) and r.n2 == len(b)
    assert abs(r.ks_ppm / 1e6 - ks) < 2e-6


def test_label_prop_communities_nest_in_components(spark, sf_dir):
    """Every LPA community must lie inside one connected component of the
    same pair graph (LPA refines, never crosses, components)."""
    lp = {r.doc_id: r.community for r in _q("q_graph_label_prop")(spark, sf_dir).collect()}
    cc = {r.doc_id: r.cluster_id for r in _q("q_dedup_cluster")(spark, sf_dir).collect()}
    comm_to_comp = {}
    for doc, comm in lp.items():
        if doc not in cc:
            continue
        comp = cc[doc]
        assert comm_to_comp.setdefault(comm, comp) == comp


def test_target_encode_algebra(spark, sf_dir):
    rows = _q("q_feat_target_encode")(spark, sf_dir).collect()
    orders = {o.o_orderkey: o for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()}
    by_cat = {}
    for o in orders.values():
        by_cat.setdefault(o.o_orderpriority, []).append(round(o.o_totalprice, 2))
    gm = sum(v for vs in by_cat.values() for v in vs) / len(orders)
    for r in rows[:100]:
        vals = by_cat[r.cat]
        n = len(vals)
        assert abs(r.enc_smooth - (sum(vals) + 10 * gm) / (n + 10)) < 1e-6
        own = round(orders[r.o_orderkey].o_totalprice, 2)
        assert abs(r.enc_loo - (sum(vals) - own) / (n - 1)) < 1e-6


def test_span_corruption_invariants(spark, sf_dir):
    rows = _q("q_span_corrupt")(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.n_masked <= r.n_tokens
        assert r.n_spans <= (r.n_masked + 2) // 3 + 1 or r.n_masked == 0
        assert abs(r.masked_frac - r.n_masked / r.n_tokens) < 1e-12
    # corpus-level mask rate ~15%
    tot = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    assert 0.10 < masked / tot < 0.20


def test_pattern_counts_match_python_regex(spark, sf_dir):
    import re

    rows = {r.user_id: r for r in _q("q_win_pattern")(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs = {}
    for e in sorted(ev, key=lambda e: (e.ts, e.event_id)):
        seqs.setdefault(e.user_id, []).append(e.event_type[0])
    for uid, chars in seqs.items():
        s = "".join(chars)
        assert rows[uid].seq_len == len(s)
        assert rows[uid].n_funnels == len(re.findall("vc*p", s))
        assert rows[uid].n_error_bursts == len(re.findall("ee+", s))
