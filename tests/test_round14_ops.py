"""Round-14 operator tests: IVF-routed embedding near-dup pairs (the
scale-safe successor to the LSH self-join — r13 verdict item 1) and the
duplicate-span removal surface."""

import pyspark.sql.functions as F

from .conftest import SF_SMOKE as SF


def _exact_pairs(spark, emb, threshold=0.3):
    from interlinked_spark.llm.similarity import cosine_similarity

    a = emb.select(F.col("vec_id").alias("left_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("right_id"), F.col("embedding").alias("vb"))
    return (
        F.broadcast(a)
        .join(b, F.col("left_id") < F.col("right_id"))
        .withColumn("exact", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
        .filter(F.col("exact") >= threshold)
        .select("left_id", "right_id", "exact")
    )


def test_ivf_near_dups_probe_all_is_exhaustive(spark):
    """With n_probe = k the probe set covers every list, so the IVF
    candidate contract (home(b) in probe(a) or vice versa) degenerates
    to ALL pairs — the result must equal the brute-force exact pair
    set, values included.  This pins that approximation lives ONLY in
    probe selection, never in the verify."""
    from interlinked_spark.llm.embeddings import kmeans_fit
    from interlinked_spark.llm.similarity import embedding_near_dup_pairs_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fit = kmeans_fit(emb, k=8, iters=3)
    ivf = embedding_near_dup_pairs_ivf(emb, fit, cosine_threshold=0.3, n_probe=8)
    exact = _exact_pairs(spark, emb)
    got = {(r.left_id, r.right_id, r.cosine) for r in ivf.collect()}
    want = {(r.left_id, r.right_id, r.exact) for r in exact.collect()}
    assert got == want and len(got) > 0


def test_ivf_near_dups_partial_probe_subset(spark):
    """At n_probe < k the IVF pair set must be a SUBSET of the exact
    pair set with identical cosines (candidates can only be missed,
    never invented), and its home assignment (rk=1) must bit-match
    ``kmeans_assign`` — the fit/probe binding the IvfIndex contract
    exists to protect."""
    from interlinked_spark.llm.embeddings import kmeans_assign, kmeans_fit
    from interlinked_spark.llm.similarity import (
        embedding_near_dup_pairs_ivf,
        ivf_probe_ranks,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fit = kmeans_fit(emb, k=8, iters=3)
    ivf = embedding_near_dup_pairs_ivf(emb, fit, cosine_threshold=0.3, n_probe=2)
    got = {(r.left_id, r.right_id, r.cosine) for r in ivf.collect()}
    want = {(r.left_id, r.right_id, r.exact) for r in _exact_pairs(spark, emb).collect()}
    assert got and got < want
    home = ivf_probe_ranks(emb, fit, n_probe=2).filter(F.col("__rk") == 1)
    asg = kmeans_assign(emb, fit)
    mism = (
        home.select("id", F.col("__cid").alias("probe_cid"))
        .join(asg.select("id", "cluster_id"), "id")
        .filter(F.col("probe_cid") != F.col("cluster_id"))
    )
    assert mism.count() == 0


def test_duplicate_span_runs_pins_known_span(spark):
    """A hand-built corpus with ONE known 10-token shared run: the
    stitcher must report exactly that run (positions and length), not
    fragments, and docs shorter than k tokens must not crash the
    positional-k-gram builder."""
    from interlinked_spark.llm.dedup import duplicate_span_runs

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, f"intro one two {shared} outro"),
            (2, f"different head {shared} and a different tail here"),
            (3, "tiny"),
            (4, "unrelated words entirely disjoint from the rest corpus"),
        ],
        "doc_id long, text string",
    )
    runs = duplicate_span_runs(docs, k=3, min_len=8).collect()
    assert len(runs) == 1
    r = runs[0]
    # doc 1: span starts after 3 lead tokens; doc 2: after 2.
    assert (r.left_id, r.right_id) == (1, 2)
    assert (r.left_start, r.right_start, r.span_len) == (4, 3, 10)


def test_remove_duplicate_spans_excises_only_the_span(spark):
    """Surgery contract: the higher-id doc loses exactly the shared
    tokens (order of survivors preserved), the lower-id doc is
    untouched (absent from the output), and overlapping spans from two
    different sources merge instead of double-removing."""
    import pyspark.sql.functions as F

    from interlinked_spark.llm.dedup import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} kappa"),          # keeper for doc 3's prefix
            (2, f"gamma delta epsilon zeta eta theta iota joker"),  # keeper for doc 3's suffix
            (3, f"{shared} iota trailing"),  # overlapped by both
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, k=3, min_len=6).collect()}
    assert set(out) == {2, 3}
    # doc 3: tokens 1-8 covered by doc 1's span, 3-9 by doc 2's ->
    # union covers 1-9, leaving only "trailing".
    assert out[3].dedup_text == "trailing"
    assert (out[3].n_tokens, out[3].n_removed) == (10, 9)
    # doc 2 loses its 6-token overlap with doc 1 (gamma..theta).
    assert out[2].dedup_text == "iota joker"


def test_mmr_checkpointed_rounds_equal_inplan(spark):
    """The checkpoint_every lineage cut must not move a single pick:
    k=7 with cuts every 2 rounds equals the fully in-plan chain
    (checkpoint_every=None path via a huge interval), and the max_k
    guard raises with the sampler pointer."""
    import pyspark.sql.functions as F
    import pytest

    from interlinked_spark.llm.similarity import mmr_select

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(
        F.first("embedding").alias("embedding")
    )
    a = [tuple(r) for r in mmr_select(e, q, k=7, checkpoint_every=2).collect()]
    b = [tuple(r) for r in mmr_select(e, q, k=7, checkpoint_every=100).collect()]
    assert sorted(a) == sorted(b) and len(a) == 7
    with pytest.raises(ValueError, match="max_k"):
        mmr_select(e, q, k=65)


def test_dsir_select_ranks_target_like_docs_higher(spark):
    """DSIR semantics: a pool doc written in the target domain's
    vocabulary must carry a higher importance log-weight than one with
    disjoint vocabulary, and the md5-deterministic Gumbel selection
    must reproduce bit-identically across calls."""
    from interlinked_spark.llm.ranking import dsir_select

    target = spark.createDataFrame(
        [(100 + i, "science physics quantum theory experiment data") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "quantum physics experiment shows theory works with data"),
            (2, "recipe butter flour sugar oven bake delicious cake"),
            (3, "physics data experiment quantum"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_select(pool, target, k=3).collect()}
    assert out[1].log_weight > out[2].log_weight
    assert out[3].log_weight > out[2].log_weight
    again = {r.doc_id: r for r in dsir_select(pool, target, k=3).collect()}
    assert {(r.rank, r.doc_id, r.log_weight, r.sel_key) for r in out.values()} == {
        (r.rank, r.doc_id, r.log_weight, r.sel_key) for r in again.values()
    }


def test_stream_span_dedup_equals_batch_and_replay_idempotent(spark):
    """The 10th streaming-state gate's two claims: (1) with id-ordered
    batches the concatenated per-batch outputs equal the one-shot batch
    twin — including a CROSS-batch span (keeper in an earlier batch)
    and a WITHIN-batch span; (2) replaying the whole stream into the
    same state path rewrites identical state."""
    from interlinked_spark.catalog import _stage_id_ordered_files
    from interlinked_spark.llm.dedup import remove_duplicate_spans
    from interlinked_spark.streaming.ops import (
        run_span_dedup_into_state,
        stream_from_parquet,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} kappa lambda"),            # batch 0: keeper
            (3, f"prefix {shared} suffix"),           # later batch: cross-batch excise
            (6, f"one two three {shared}"),           # cross-batch excise
            (7, f"{shared} trailing bits here now"),  # same batch as 6: also vs 6
            (9, "totally unrelated filler text with no shared runs at all"),
        ],
        "doc_id long, text string",
    )
    staged = _stage_id_ordered_files(docs, "doc_id", 4)

    def run(state_path=None):
        return run_span_dedup_into_state(
            stream_from_parquet(spark, staged),
            state_path=state_path, k=3, min_len=6,
        )

    state = run()
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{state}/out")
        .select("doc_id", "n_tokens", "n_removed", "dedup_text")
        .collect()
    }
    want = {
        tuple(r)
        for r in remove_duplicate_spans(docs, k=3, min_len=6).collect()
    }
    assert got == want and {r[0] for r in got} == {3, 6, 7}
    # replay: identical stream into the SAME state path
    run(state_path=state)
    again = {
        tuple(r)
        for r in spark.read.parquet(f"{state}/out")
        .select("doc_id", "n_tokens", "n_removed", "dedup_text")
        .collect()
    }
    assert again == got


def test_self_span_dedup_tandem_and_plain_repeats(spark):
    """Within-doc span semantics: a plain repeated phrase keeps its
    first occurrence only; a TANDEM repeat (period < span) collapses to
    one copy because every later position is covered by some qualifying
    run; a doc without repeats is absent from the output."""
    from interlinked_spark.llm.dedup import remove_self_duplicate_spans

    phrase = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"{phrase} middle filler words {phrase}"),
            (2, "x y z x y z x y z x y z"),  # tandem repeat, period 3
            (3, "all tokens here are completely distinct friends"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_self_duplicate_spans(docs, k=3, min_len=4).collect()}
    assert set(out) == {1, 2}
    assert out[1].dedup_text == f"{phrase} middle filler words"
    assert (out[1].n_tokens, out[1].n_removed) == (11, 4)
    # tandem: first period survives, everything after is covered
    assert out[2].dedup_text == "x y z"
    assert (out[2].n_tokens, out[2].n_removed) == (12, 9)


def test_golden_records_survivorship_votes(spark):
    """Survivorship contract: most-frequent non-null value wins per
    attribute (nulls abstain), ties break on the smaller value, entity
    id is the component minimum, singletons are their own entity."""
    from interlinked_spark.operators.merge import golden_records

    recs = spark.createDataFrame(
        [
            (1, "widget", "A", 5),
            (2, "widget", "B", None),
            (3, "gadget", "B", 7),   # name 'gadget' loses 2:1; type B wins 2:1
            (9, "lonely", "C", 1),   # singleton
        ],
        "pk long, name string, typ string, size int",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "left_id long, right_id long"
    )
    out = {r.entity_id: r for r in golden_records(
        recs, pairs, "pk", ["name", "typ", "size"]
    ).collect()}
    assert set(out) == {1, 9}
    assert out[1].n_members == 3
    assert out[1].name == "widget"      # 2 votes vs 1
    assert out[1].typ == "B"            # 2 votes vs 1
    assert out[1].size == 5             # 1-1 tie among non-nulls -> smaller
    assert (out[9].n_members, out[9].name) == (1, "lonely")


def test_ks_two_sample_reference_values(spark):
    """KS semantics against hand-computed references: identical
    distributions give D=0; disjoint supports give D=1 at the boundary
    value; a known partial shift gives the exact rational sup; a group
    missing one cohort yields NULL."""
    from interlinked_spark.operators.aggregates import ks_two_sample

    rows = []
    # g1: A = {1,2,3,4}, B = {1,2,3,4} -> D = 0
    for v in [1, 2, 3, 4]:
        rows += [("g1", True, float(v)), ("g1", False, float(v))]
    # g2: A = {1,2}, B = {3,4} -> D = 1 at v=2
    rows += [("g2", True, 1.0), ("g2", True, 2.0), ("g2", False, 3.0), ("g2", False, 4.0)]
    # g3: A = {1,2,3,4}, B = {2,3,4,5} -> sup |Fa-Fb| = 1/4 at v=1
    for v in [1, 2, 3, 4]:
        rows.append(("g3", True, float(v)))
    for v in [2, 3, 4, 5]:
        rows.append(("g3", False, float(v)))
    # g4: only cohort A -> NULL
    rows += [("g4", True, 1.0), ("g4", True, 2.0)]
    df = spark.createDataFrame(rows, "g string, side boolean, v double")
    out = {r.g: r for r in ks_two_sample(df, "side", "v", keys=["g"]).collect()}
    assert out["g1"].d_stat == 0.0
    assert (out["g2"].d_stat, out["g2"].d_at) == (1.0, 2.0)
    assert (out["g3"].d_stat, out["g3"].d_at) == (0.25, 1.0)
    assert out["g4"].d_stat is None and out["g4"].n_b == 0


def test_pq_roundtrip_exact_when_corpus_is_codebook(spark):
    """PQ sanity: with exactly k vectors on the 6dp lattice every
    vector IS a centroid after the deterministic fit, so reconstruction
    error is exactly zero; codes are length-m in [0, k); and a
    non-divisible subspace split raises."""
    import pytest

    from interlinked_spark.llm.embeddings import pq_encode, pq_fit

    rows = [
        (i, [round(0.1 * i + 0.01 * j, 6) for j in range(8)]) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_fit(df, m=2, k=4, iters=2)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    out = pq_encode(df, books).collect()
    assert len(out) == 4
    for r in out:
        assert len(r.codes) == 2 and all(0 <= c < 4 for c in r.codes)
        assert r.max_abs_err <= 1e-6 and r.mse <= 1e-9
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(df, m=3, k=2, iters=1)


def test_pq_adc_exact_when_codebook_is_lossless(spark):
    """ADC sanity: with m=1 and k = n the codebook IS the (6dp-rounded)
    corpus, so ADC distances equal true squared L2 up to the lattice
    rounding and the top-k matches the exact ordering."""
    import pyspark.sql.functions as F

    from interlinked_spark.llm.embeddings import pq_adc_top_k, pq_fit

    rows = [(i, [round(0.3 * i + 0.05 * j, 6) for j in range(4)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_fit(df, m=1, k=6, iters=2)
    qs = df.filter(F.col("vec_id") < 2)
    top = pq_adc_top_k(df, qs, books, k=3)
    got = {
        q: [r.neighbor_id for r in sorted(rows, key=lambda r: r.adc)]
        for q, rows in __import__("itertools").groupby(
            sorted(top.collect(), key=lambda r: (r.query_id, r.adc, r.neighbor_id)),
            key=lambda r: r.query_id,
        )
    }
    # 1-d-increasing corpus: nearest neighbors of 0 are 1,2,3; of 1 are 0,2 then 3
    assert got[0] == [1, 2, 3]
    assert got[1] == [0, 2, 3] or got[1] == [2, 0, 3]


def test_ivfpq_probe_all_lossless_codebook_matches_exact(spark):
    """IVF-PQ sanity: probing ALL lists with a lossless residual
    codebook (m=1, k=n — every residual is its own centroid) makes ADC
    equal true squared L2 up to lattice rounding, so the top-k matches
    the exact neighbor ordering."""
    import pyspark.sql.functions as F

    from interlinked_spark.llm.embeddings import ivfpq_fit, ivfpq_probed_top_k

    rows = [(i, [round(0.3 * i + 0.05 * j, 6) for j in range(4)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    coarse, books = ivfpq_fit(df, coarse_k=2, m=1, k=6, coarse_iters=2, pq_iters=2)
    qs = df.filter(F.col("vec_id") == 0)
    top = ivfpq_probed_top_k(df, qs, coarse, books, k=3, n_probe=2)
    got = [r.neighbor_id for r in sorted(top.collect(), key=lambda r: (r.adc, r.neighbor_id))]
    assert got == [1, 2, 3]
