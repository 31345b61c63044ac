"""Round-13 operators: rolling z-score anomaly windows, Markov
transition matrices, TF-IDF-weighted token-set cosine ER join,
interval-overlap join, directed shingle containment."""

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_rolling_zscore_window_semantics(spark):
    """The frame is [-window, -1]: a spike never scores against itself;
    rows below min_periods and zero-spread windows get NULL z; keys are
    isolated (one user's history never feeds another's window)."""
    from interlinked_spark.operators.timeseries import rolling_zscore

    rows = (
        [("a", i, 10.0 + (i % 2)) for i in range(8)]   # alternating 10/11
        + [("a", 8, 1000.0)]                            # the spike
        + [("b", 0, 5.0), ("b", 1, 5.0), ("b", 2, 5.0),
           ("b", 3, 5.0), ("b", 4, 5.0), ("b", 5, 99.0)]  # zero spread
    )
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        (r.k, r.i): (r.zscore, r.is_outlier)
        for r in rolling_zscore(
            df, ["k"], ["i"], "v", window_rows=20, min_periods=5, n_sigmas=3.0
        ).collect()
    }
    # first min_periods rows of each key: NULL (too few predecessors)
    for i in range(5):
        assert got[("a", i)] == (None, None)
    # the spike scores against the CLEAN preceding mean/std -> huge z
    z_spike, flag = got[("a", 8)]
    preceding = [10.0 + (i % 2) for i in range(8)]
    mu = sum(preceding) / 8
    sd = math.sqrt(sum((x - mu) ** 2 for x in preceding) / 7)
    assert math.isclose(z_spike, round((1000.0 - mu) / sd, 6))
    assert flag is True
    # zero rolling spread -> NULL, not inf (user b rows 1..4 have sd=0)
    assert got[("b", 5)] == (None, None)


def test_transition_counts_no_cross_key_leak(spark):
    """lead() is per-entity: the last event of one user never pairs
    with the first of the next; probabilities row-normalize."""
    from interlinked_spark.operators.timeseries import transition_counts

    rows = [
        ("u1", 1, "view"), ("u1", 2, "click"), ("u1", 3, "view"),
        ("u2", 1, "buy"),  # singleton: contributes NO transition
        ("u3", 1, "view"), ("u3", 2, "view"),
    ]
    df = spark.createDataFrame(rows, "u string, i long, t string")
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in transition_counts(df, ["u"], ["i"], "t").collect()
    }
    # u1: view->click, click->view; u3: view->view.  No *->buy, no buy->*.
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketed equi-join == brute-force overlap scan, including pairs
    that only touch at an endpoint (closed intervals), pairs spanning a
    grain boundary, and blocking-key isolation."""
    from datetime import datetime

    from interlinked_spark.operators.joins import interval_overlap_join

    def ts(d, h=0):
        return datetime(2024, 1, d, h)

    rows = [
        (1, "k1", ts(1), ts(3)),
        (2, "k1", ts(3), ts(5)),     # touches 1 at the endpoint
        (3, "k1", ts(6), ts(7)),     # disjoint from 1, 2 ... wait: 5<6
        (4, "k1", ts(4), ts(10)),    # spans the week boundary (Jan 8 = Mon)
        (5, "k1", ts(9), ts(12)),    # overlaps 4 across the boundary
        (6, "k2", ts(1), ts(12)),    # other block: overlaps nothing in k1
    ]
    df = spark.createDataFrame(rows, "id long, k string, s timestamp, e timestamp")
    l = df.select(F.col("id").alias("l_id"), "k", "s", "e")
    r = df.select(F.col("id").alias("r_id"), "k", "s", "e")
    got = {
        (x.l_id, x.r_id, x.overlap_seconds)
        for x in interval_overlap_join(
            l, r, "l_id", "r_id", "s", "e", "s", "e",
            on=["k"], grain="week", dedupe_self=True,
        ).collect()
    }
    want = set()
    for i, ki, si, ei in rows:
        for j, kj, sj, ej in rows:
            if i < j and ki == kj and si <= ej and sj <= ei:
                want.add((i, j, round((min(ei, ej) - max(si, sj)).total_seconds(), 6)))
    assert got == want
    assert (1, 2, 0.0) in got         # endpoint touch counts (closed)
    assert (4, 5, 86400.0) in got     # cross-boundary pair found
    assert not any(6 in (a, b) for a, b, _ in got)  # block isolation


def test_soft_tfidf_join_matches_bruteforce(spark):
    """Posting-join score == brute-force idf-weighted set cosine; the
    df cap drops pairs whose only shared tokens are viral."""
    from interlinked_spark.operators.joins import soft_tfidf_self_join

    rows = [
        (1, "acme rocket skates ltd", "A"),
        (2, "acme rocket skates inc", "A"),
        (3, "acme anvil ltd", "A"),
        (4, "acme rocket skates ltd", "B"),  # other block
        (5, "generic widgets ltd", "A"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r.left_id, r.right_id): r.cosine
        for r in soft_tfidf_self_join(
            df, "name", "id", threshold=0.01, extra_on=["blk"]
        ).collect()
    }
    # brute force
    toksets = {i: set(n.split()) for i, n, _ in rows}
    blk = {i: b for i, _, b in rows}
    dfreq = {}
    for s in toksets.values():
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    idf = {t: math.log(len(rows) / c) for t, c in dfreq.items()}
    want = {}
    for i in toksets:
        for j in toksets:
            if i < j and blk[i] == blk[j]:
                shared = toksets[i] & toksets[j]
                if not shared:
                    continue
                dot = sum(idf[t] ** 2 for t in shared)
                ni = math.sqrt(sum(idf[t] ** 2 for t in toksets[i]))
                nj = math.sqrt(sum(idf[t] ** 2 for t in toksets[j]))
                if dot / (ni * nj) >= 0.01:
                    want[(i, j)] = round(dot / (ni * nj), 6)
    assert got == want
    assert got[(1, 2)] > got[(1, 3)]  # 3 shared rare tokens beat 1
    # viral-token cap: "acme"/"ltd" have df=4; capping at df<=3 removes
    # them from postings, so (3, 5) ("ltd" their only shared token)
    # disappears while (1, 2) still collides on rocket/skates (df=3)
    capped = {
        (r.left_id, r.right_id)
        for r in soft_tfidf_self_join(
            df, "name", "id", threshold=0.01, extra_on=["blk"], max_token_df=3
        ).collect()
    }
    assert (3, 5) not in capped
    assert (1, 2) in capped           # rocket/skates postings survive


def test_ngram_containment_direction_vs_jaccard(spark):
    """A short quote inside a long document scores ~1.0 containment in
    the quote->container direction only, while symmetric Jaccard stays
    small — the asymmetric signal the operator exists for."""
    from interlinked_spark.llm.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, quote), (2, filler + " " + quote + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in ngram_containment_pairs(df, n=3, threshold=0.6).collect()
    }
    assert set(got) == {(1, 2)}       # quote contained in doc, not reverse
    assert got[(1, 2)] == 1.0          # every quote shingle is in the doc
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.5).count()
    assert jac == 0                    # symmetric Jaccard misses it


def test_round13_catalog_plan_shapes(spark):
    """Plan hygiene on the new catalog queries: equi-join candidates
    everywhere — no CartesianProduct / BroadcastNestedLoopJoin (the
    soft-TF-IDF N-frame is the blessed one-row broadcast the advisor
    proves row-bounded, so it never plans as an unproven BNLJ)."""
    from interlinked_spark import catalog
    from interlinked_spark.plans.advisor import _unproven_bnlj

    for name in (
        "events_rolling_zscore",
        "user_event_transitions",
        "part_name_softtfidf_pairs",
        "lineitem_shipping_overlaps",
        "doc_shingle_containment",
        "part_name_sorted_neighbors",
        "doc_winnow_matches",
        "doc_bigram_logprob",
        "user_event_paths",
        "orders_benford_digits",
    ):
        df = catalog.run_query(name, spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert not (
            "BroadcastNestedLoopJoin" in plan and _unproven_bnlj(plan) is not None
        ), name
        assert df.count() > 0, name


def test_sorted_neighborhood_rank_and_pairs(spark):
    """The two-phase bucketed rank equals the global (norm, id) order —
    including across bucket boundaries — and the block join finds
    exactly the rank-band pairs the brute force finds."""
    from interlinked_spark.operators.joins import sorted_neighborhood_join

    names = [
        (1, "apple pie"), (2, "Apple  Pie"), (3, "apple tart"),
        (4, "banana split"), (5, "banana bread"), (6, "cherry cake"),
        (7, "cherry  cake"), (8, "zebra cake"),
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r.left_id, r.right_id): (r.rank_gap, r.jaccard)
        for r in sorted_neighborhood_join(
            df, "name", "id", window=3, q=3, threshold=0.3, bucket_chars=1
        ).collect()
    }

    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.strip().lower())

    def grams(s):
        s = norm(s)
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    order = sorted(names, key=lambda x: (norm(x[1]), x[0]))
    want = {}
    for a in range(len(order)):
        for b in range(a + 1, min(a + 4, len(order))):
            ga, gb = grams(order[a][1]), grams(order[b][1])
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.3:
                want[(order[a][0], order[b][0])] = (b - a, round(j, 6))
    assert got == want
    assert got[(1, 2)] == (1, 1.0)     # normalization collapses to equal
    assert got[(6, 7)][1] == 1.0


def test_winnow_guarantee_and_matches(spark):
    """Winnowing's core guarantee: any shared run of >= window + k - 1
    words leaves at least one COMMON fingerprint; documents with no
    shared 3-gram share none."""
    from interlinked_spark.llm.dedup import winnow_fingerprints, winnow_match_pairs

    shared_run = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1 words
    rows = [
        (1, "intro one two three " + shared_run + " outro red blue"),
        (2, "different prefix words here " + shared_run + " other tail"),
        (3, "totally unrelated text with no common trigrams at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=3, window=4)
    by_doc = {
        i: {r.fingerprint for r in fp.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]          # the guarantee
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    pairs = {
        (r.left_id, r.right_id): r.shared_fps
        for r in winnow_match_pairs(df, k=3, window=4, min_shared=1).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == len(by_doc[1] & by_doc[2])


def test_stream_transitions_boundary_stitch_and_replay(spark):
    """The 8th streaming-state gate's two claims: (1) batching
    invariance — cross-boundary pairs are stitched from carried state,
    including an entity ABSENT from intermediate batches (carry-forward
    path), so streamed counts == one-shot batch counts; (2) replay
    idempotency — re-running the whole stream into the same state path
    rewrites identical state."""
    from datetime import datetime

    from interlinked_spark.catalog import _stage_id_ordered_files
    from interlinked_spark.operators.timeseries import transition_counts
    from interlinked_spark.streaming.ops import (
        run_transitions_into_state,
        stream_from_parquet,
    )

    rows = [
        # (event_id, user, type) — 4 staged batches split at ids 3/6/9:
        (0, "u1", "view"),   # u1 then silent until batch 3 (id 10)
        (1, "u2", "view"),
        (2, "u2", "view"),
        (4, "u2", "buy"),    # boundary pair view->buy (batch 0 -> 1)
        (6, "u3", "a"),
        (7, "u3", "b"),
        (8, "u3", "a"),      # within-batch pairs a->b, b->a
        (10, "u1", "click"), # stitched view->click across TWO skipped batches
    ]
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, i), u, t) for i, u, t in rows],
        "event_id long, ts timestamp, user_id string, event_type string",
    )
    staged = _stage_id_ordered_files(df, "event_id", 4)

    def run(state_path=None):
        return run_transitions_into_state(
            stream_from_parquet(spark, staged),
            ["user_id"], ["ts", "event_id"], "event_type",
            state_path=state_path,
        )

    state = run()
    got = {
        (r.from_state, r.to_state): r.n
        for r in spark.read.parquet(f"{state}/counts")
        .groupBy("from_state", "to_state")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    batch_n = {
        (r.from_state, r.to_state): r.n
        for r in transition_counts(
            df, ["user_id"], ["ts", "event_id"], "event_type"
        ).select("from_state", "to_state", "n").collect()
    }
    assert got == batch_n
    assert got[("view", "click")] == 1   # u1's doubly-skipped stitch
    assert got[("view", "buy")] == 1     # single-boundary stitch
    # replay: rerun the identical stream into the SAME state path
    run(state_path=state)
    again = {
        (r.from_state, r.to_state): r.n
        for r in spark.read.parquet(f"{state}/counts")
        .groupBy("from_state", "to_state")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert again == got


def test_event_path_counts_ties_and_isolation(spark):
    """Paths never cross entity boundaries; the top-k tie order is
    (count desc, path asc) — deterministic across engines."""
    from interlinked_spark.operators.timeseries import event_path_counts

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "a"),
        ("u2", 1, "b"), ("u2", 2, "c"), ("u2", 3, "a"),
        ("u3", 1, "z"),  # too short for any 3-path
    ]
    df = spark.createDataFrame(rows, "u string, i long, t string")
    got = [
        (r.step_1, r.step_2, r.step_3, r.n)
        for r in event_path_counts(
            df, ["u"], ["i"], "t", depth=3, top_k=10
        ).collect()
    ]
    # u1: (a,b,c), (b,c,a); u2: (b,c,a) -> counts {abc:1, bca:2}
    assert got == [("b", "c", "a", 2), ("a", "b", "c", 1)]
    # no path stitches u1's tail onto u2's head
    assert ("a", "b", "c", 1) in got and len(got) == 2
