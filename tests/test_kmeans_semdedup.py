"""k-means + SemDeDup (round 8c): determinism, guard rails, and the
narrow-assignment scale pin."""

import pytest
from pyspark.sql import functions as F

from interlinked_spark.llm.embeddings import kmeans_assign, kmeans_fit, semdedup_keep

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_kmeans_deterministic(emb):
    a = kmeans_fit(emb, k=4, iters=2)
    b = kmeans_fit(emb, k=4, iters=2)
    assert a == b


def test_kmeans_validates_inputs(emb):
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(emb.limit(2), k=5)


def test_kmeans_assign_is_narrow(emb):
    """The assignment pass must be a pure projection: no Exchange, no
    join — the property that makes the per-iteration cost one scan."""
    fit = kmeans_fit(emb, k=4, iters=1)
    plan = kmeans_assign(emb, fit)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_kmeans_partitions_all_rows(emb):
    fit = kmeans_fit(emb, k=8, iters=3)
    asg = kmeans_assign(emb, fit)
    n = emb.count()
    assert asg.count() == n
    cids = {r.cluster_id for r in asg.select("cluster_id").distinct().collect()}
    assert cids <= set(range(8))


def test_semdedup_cluster_minimum_always_kept(emb):
    """The lowest-id member of every cluster has no lower-id neighbor,
    so it can never be dominated."""
    fit = kmeans_fit(emb, k=8, iters=3)
    keep = semdedup_keep(emb, fit, cosine_threshold=0.3)
    mins = keep.groupBy("cluster_id").agg(F.min("id").alias("id")).select("id")
    bad = keep.join(mins, "id").filter(~F.col("kept")).count()
    assert bad == 0


def test_semdedup_hot_cluster_guard(emb):
    fit = kmeans_fit(emb, k=2, iters=1)
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup_keep(emb, fit, max_cluster_size=10)


def test_ivf_probed_probe_all_equals_exact_and_partial_is_subset(spark):
    """n_probe = k_clusters degrades to exact brute-force top-k (every
    list searched); a partial probe returns a SUBSET of per-list-exact
    results — pins that approximation comes only from unprobed lists,
    never from a scoring bug."""
    import pyspark.sql.functions as F

    from interlinked_spark.llm.embeddings import ivf_probed_top_k, kmeans_fit
    from interlinked_spark.llm.similarity import cosine_top_k

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fit = kmeans_fit(e, k=4, iters=2)
    qs = e.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_top_k(e, qs, k=5).collect()
    }
    all_probe = {
        (r.query_id, r.neighbor_id)
        for r in ivf_probed_top_k(e, qs, fit, k=5, n_probe=4).collect()
    }
    assert all_probe == exact
    partial = [
        (r.query_id, r.neighbor_id, r.cosine)
        for r in ivf_probed_top_k(e, qs, fit, k=5, n_probe=1).collect()
    ]
    # Partial-probe cosines are the true cosines (no score distortion)…
    true_cos = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_top_k(e, qs, k=10_000, max_query_rows=None).collect()
    }
    assert all(true_cos[(q, n)] == c for q, n, c in partial)


def test_fit_ivf_wrapper_matches_manual_handoff(spark):
    """fit_ivf(...).probe(...) is exactly kmeans_fit -> ivf_probed_top_k
    with the fit's own column bindings carried through (the blessed
    production handoff); n_probe is clamped to k_clusters."""
    import pyspark.sql.functions as F

    from interlinked_spark.llm.embeddings import fit_ivf, ivf_probed_top_k, kmeans_fit

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = fit_ivf(e, k_clusters=4, iters=2)
    assert idx.k_clusters == 4
    assert idx.centroids == kmeans_fit(e, k=4, iters=2)
    qs = e.filter(F.col("vec_id") < 3)
    manual = sorted(
        (r.query_id, r.neighbor_id, r.cosine)
        for r in ivf_probed_top_k(e, qs, idx.centroids, k=5, n_probe=2).collect()
    )
    wrapped = sorted(
        (r.query_id, r.neighbor_id, r.cosine)
        for r in idx.probe(e, qs, k=5, n_probe=2).collect()
    )
    assert wrapped == manual
    # clamp: probing more lists than exist is the full probe, not an error
    assert sorted(
        (r.query_id, r.neighbor_id)
        for r in idx.probe(e, qs, k=5, n_probe=99).collect()
    ) == sorted(
        (r.query_id, r.neighbor_id)
        for r in idx.probe(e, qs, k=5, n_probe=4).collect()
    )
    # assign carries the fit's bindings: one cluster id per corpus row
    assert idx.assign(e).count() == e.count()
    with pytest.raises(ValueError):
        idx.probe(e, qs, n_probe=0)
    with pytest.raises(ValueError):
        from interlinked_spark.llm.embeddings import IvfIndex

        IvfIndex([])


def test_semdedup_keep_assigned_lazy_mode(spark):
    """eager=False composes lazily (no persist, no checkpoint) and
    yields the same kept set as the default eager path (ADVICE r10)."""
    from pyspark.sql import functions as F

    from interlinked_spark.llm.embeddings import semdedup_keep_assigned

    tagged = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.001], 0),  # near-dup pair, cluster 0
         (3, [0.0, 1.0], 1), (4, [-1.0, 0.0], 1)],   # dissimilar, cluster 1
        ["id", "__v", "cluster_id"],
    ).withColumn("__v", F.col("__v").cast("array<double>"))

    eager = {(r.id, r.kept) for r in semdedup_keep_assigned(
        tagged, cosine_threshold=0.9, max_cluster_size=None).collect()}
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    lazy_df = semdedup_keep_assigned(
        tagged, cosine_threshold=0.9, max_cluster_size=None, eager=False)
    # composing the plan persisted nothing and ran nothing new
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before
    assert {(r.id, r.kept) for r in lazy_df.collect()} == eager
    assert eager == {(1, True), (2, False), (3, True), (4, True)}
