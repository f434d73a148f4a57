

def test_knn_graph_ann_recall(spark, sf_dir):
    """The LSH-accelerated kNN graph must recover a meaningful share of the
    exact graph's edges (fixture vectors are near-orthogonal random — the
    hardest case for LSH — so the floor is modest; high-cosine planted
    neighbors are exactly what sign-LSH keeps)."""
    from quarkus_etl_spark.queries.northstar_q import q_knn_graph, q_knn_graph_ann

    exact = {
        (r["src"], r["nbr"]) for r in q_knn_graph(spark, sf_dir).collect()
    }
    approx = {
        (r["src"], r["nbr"]) for r in q_knn_graph_ann(spark, sf_dir).collect()
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
