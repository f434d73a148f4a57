

def test_knn_graph_ann_recall(spark, sf_dir):
    """The LSH-accelerated kNN graph must recover a meaningful share of the
    exact graph's edges (fixture vectors are near-orthogonal random — the
    hardest case for LSH — so the floor is modest; high-cosine planted
    neighbors are exactly what sign-LSH keeps). Since r11 the query itself
    emits the recall CONTRACT row (VERDICT r10 #4), so this test pins the
    floor on the raw OPERATOR edges and cross-checks the query's summary."""
    from pyspark.sql import functions as F

    from quarkus_etl_spark.catalog import load_table
    from quarkus_etl_spark.operators.similarity import knn_graph_ann
    from quarkus_etl_spark.queries.northstar_q import q_knn_graph, q_knn_graph_ann

    exact = {
        (r["src"], r["nbr"]) for r in q_knn_graph(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    approx = {
        (r["src"], r["nbr"])
        for r in knn_graph_ann(e, "vec_id", "embedding", k=3, block_col="label").collect()
    }
    assert approx, "ANN graph is empty"
    recall = len(exact & approx) / len(exact)
    # Floor raised per VERDICT r3 #3: 2 independent plane tables + bounded
    # hamming-2 probes — measured 0.95 (sf0.01) / 0.97 (sf0.001).
    assert recall >= 0.85, f"recall {recall:.3f}"
    # and the ANN graph is a valid top-k shape: <= 3 per source, rank 1..3
    from collections import Counter

    per_src = Counter(s for s, _ in approx)
    assert max(per_src.values()) <= 3
    # the driver-graded contract row agrees with the set arithmetic above
    row = q_knn_graph_ann(spark, sf_dir).collect()[0]
    assert row["n_exact_edges"] == len(exact)
    assert row["recall_ok"] is True


def test_ivf_topk_recall_floor(spark, sf_dir):
    """VERDICT r7 #5: the IVF ANN path gets a recall floor to match its LSH
    sibling's 0.85 pin. Measured at the SHIPPED q_sim_ann_ivf config
    (n_cells=16, nprobe=3, k=10) over 10 probe vectors: mean recall@10
    0.92 (sf0.001) / 0.89 (sf0.01); the nprobe curve at sf0.01 is
    0.84/0.89/0.89/0.90/0.93/0.95 for nprobe 1/2/3/4/6/8 (NOTES.md).
    Floors leave headroom for the fixtures' near-orthogonal worst case:
    mean >= 0.8, per-probe min >= 0.6."""
    from pyspark.sql import functions as F

    from quarkus_etl_spark.catalog import load_table
    from quarkus_etl_spark.operators.similarity import brute_force_topk, ivf_topk

    e = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    probes = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in e.where(F.col("vec_id") < 10).collect()
    }
    assert len(probes) == 10
    recalls = []
    for _pid, pv in sorted(probes.items()):
        exact = {r[0] for r in brute_force_topk(e, "embedding", "vec_id", pv, k=10).collect()}
        ivf = {
            r[0]
            for r in ivf_topk(
                e, "embedding", "vec_id", pv, k=10, n_cells=16, nprobe=3
            ).collect()
        }
        recalls.append(len(exact & ivf) / len(exact))
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.8, f"mean recall@10 {mean:.3f} ({recalls})"
    assert min(recalls) >= 0.6, f"per-probe recall floor broken: {recalls}"


def test_knn_graph_ann_collapse_parity_on_distinct(spark, sf_dir):
    """Duplicate collapse must be a pure optimization on all-distinct
    input: identical output (same edges, cosines, ranks) with it on/off."""
    from pyspark.sql import functions as F
    from quarkus_etl_spark.catalog import load_table
    from quarkus_etl_spark.operators.similarity import knn_graph_ann

    e = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    off = knn_graph_ann(e, "vec_id", "embedding", k=3, block_col="label",
                        collapse_duplicates=False)
    on = knn_graph_ann(e, "vec_id", "embedding", k=3, block_col="label",
                       collapse_duplicates=True)
    assert sorted(map(tuple, off.collect())) == sorted(map(tuple, on.collect()))


def test_knn_graph_ann_duplicate_multiplicity_bounded(spark):
    """The r7 scale fix: identical vectors share every LSH bucket at any
    plane count, so pre-collapse the bucket join was quadratic in
    multiplicity (2000 distinct x 1000 copies = DNF >10 min; collapsed:
    33.8 s — SCALE.md). Semantics on duplicated input: every copy gets
    exactly k neighbors, its fellow copies first at cosine 1.0."""
    from collections import Counter

    from pyspark.sql import functions as F
    from quarkus_etl_spark.catalog import load_table
    from quarkus_etl_spark.operators.similarity import knn_graph_ann

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        F.col("embedding").isNotNull()
    )
    dup = e.limit(50).crossJoin(
        spark.range(40).select(F.col("id").alias("__r"))
    ).select(
        (F.col("vec_id") + F.col("__r") * 100000).alias("vec_id"),
        "embedding",
        "label",
    )
    rows = knn_graph_ann(dup, "vec_id", "embedding", k=3, block_col="label").collect()
    per = Counter(r["src"] for r in rows)
    assert len(per) == 2000 and set(per.values()) == {3}
    assert all(
        r["cosine"] == 1.0 and r["src"] % 100000 == r["nbr"] % 100000
        for r in rows
    )


def test_knn_graph_ann_zero_and_null_vector_duplicates(spark):
    """ADVICE r7: identical ZERO vectors duplicate naturally (failed
    encoders emit them, and the fuzz mutators mint them at phase>=2) —
    the duplicate-collapse expansion must follow the guarded_cosine
    convention: fellow edges at 0.0 (they rank LAST, as the uncollapsed
    path ranks them), never the hardcoded 1.0 that made dead rows
    top-ranked neighbors. NULL-vector copies get no edges at all (with
    collapse off they never bucket-match). Nonzero duplicates keep their
    true-cosine 1.0 fellows."""
    from quarkus_etl_spark.operators.similarity import knn_graph_ann

    rows_in = [
        (i, [float(((i + 1) * (j + 2)) % 101 - 50) for j in range(8)])
        for i in range(40)
    ]
    rows_in += [(i, [1.0] * 8) for i in (100, 101, 102)]
    rows_in += [(i, [0.0] * 8) for i in (200, 201, 202)]
    rows_in += [(i, None) for i in (300, 301, 302)]
    df = spark.createDataFrame(rows_in, "vec_id long, embedding array<double>")

    rows = knn_graph_ann(df, "vec_id", "embedding", k=3).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)

    assert not any(s in (300, 301, 302) for s in by_src), "NULL vectors got edges"
    for s in (200, 201, 202):
        assert s in by_src, "zero-vector copy lost its edges"
        assert all(r["cosine"] == 0.0 for r in by_src[s]), (
            "zero-vector duplicate ranked above the guarded_cosine 0.0"
        )
    for s in (100, 101, 102):
        fellows = [r for r in by_src[s] if r["nbr"] in (100, 101, 102)]
        assert len(fellows) == 2
        assert all(r["cosine"] == 1.0 for r in fellows)
