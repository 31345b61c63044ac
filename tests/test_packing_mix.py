"""Sequence packing + temperature-mix invariants (round-8 training
pipeline additions; SURVEY §5.2 tier-3 property style).

Packing pins: the two-phase distributed prefix sum equals the
single-window definition; every sequence except the last is exactly
full; token mass is conserved; docs longer than the capacity span the
right number of sequences.  Mix pins: fractions are capped/rounded,
tau = 1 with row-count sizing is natural sampling (uniform fraction),
selection is a deterministic subset keyed on md5 bands.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from interlinked_spark.llm.packing import (
    global_running_sum,
    pack_sequences,
    packed_assignments,
)
from interlinked_spark.operators.sampling import (
    temperature_fractions,
    temperature_sample,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_tokens(spark):
    from interlinked_spark.llm.text import token_stats

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return token_stats(d).select("doc_id", "n_bpe_est").cache()


def test_global_running_sum_matches_single_window(docs_tokens):
    two_phase = global_running_sum(docs_tokens, "n_bpe_est", "doc_id", bucket_width=37)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    single = docs_tokens.withColumn(
        "expected", F.coalesce(F.sum("n_bpe_est").over(w), F.lit(0)).cast("bigint")
    )
    joined = two_phase.join(single.select("doc_id", "expected"), "doc_id")
    assert joined.filter(F.col("offset") != F.col("expected")).count() == 0


def test_global_running_sum_rejects_bad_bucket(docs_tokens):
    with pytest.raises(ValueError):
        global_running_sum(docs_tokens, "n_bpe_est", "doc_id", bucket_width=0)


def test_pack_all_full_but_last_and_mass_conserved(docs_tokens):
    cap = 256
    seqs = pack_sequences(docs_tokens, "n_bpe_est", "doc_id", cap, bucket_width=50)
    rows = {r["seq_id"]: r for r in seqs.collect()}
    assert sorted(rows) == list(range(len(rows)))  # contiguous ids from 0
    last = max(rows)
    for sid, r in rows.items():
        assert r["n_docs"] >= 1
        if sid != last:
            assert r["tokens_filled"] == cap, f"seq {sid} not full"
        else:
            assert 0 < r["tokens_filled"] <= cap
    total = docs_tokens.filter(F.col("n_bpe_est") > 0).agg(
        F.sum("n_bpe_est")
    ).collect()[0][0]
    assert sum(r["tokens_filled"] for r in rows.values()) == total


def test_pack_long_doc_spans_sequences(spark):
    # One 1000-token doc at capacity 300 must span ceil-wise: rows 0..3.
    df = spark.createDataFrame(
        [(1, 10), (2, 1000), (3, 10)], ["doc_id", "n_tok"]
    )
    placed = packed_assignments(df, "n_tok", "doc_id", capacity=300, bucket_width=10)
    spans = {r["doc_id"]: (r["seq_first"], r["seq_last"]) for r in placed.collect()}
    assert spans[1] == (0, 0)
    assert spans[2] == (0, 3)  # offset 10, ends at 1009 -> seq 3
    assert spans[3] == (3, 3)


def test_pack_drops_zero_token_docs(spark):
    df = spark.createDataFrame([(1, 0), (2, 5)], ["doc_id", "n_tok"])
    placed = packed_assignments(df, "n_tok", "doc_id", capacity=8, bucket_width=10)
    assert [r["doc_id"] for r in placed.collect()] == [2]


def test_pack_rejects_bad_capacity(spark):
    df = spark.createDataFrame([(1, 1)], ["doc_id", "n_tok"])
    with pytest.raises(ValueError):
        packed_assignments(df, "n_tok", "doc_id", capacity=0, bucket_width=10)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


def test_temperature_tau1_rowcount_is_natural(docs):
    # tau=1 with row-count sizing: expected_s = target * n_s / N, so
    # fraction = target / N for every stratum.
    fr = temperature_fractions(docs, "source", tau=1.0, target_rows=100)
    n_total = docs.count()
    want = round(100.0 / n_total, 6)
    fracs = {r["source"]: r["fraction"] for r in fr.collect()}
    assert all(abs(f - want) < 1e-9 for f in fracs.values())


def test_temperature_fractions_capped_and_guarded(docs):
    fr = temperature_fractions(docs, "source", tau=0.5, target_rows=10**9)
    assert all(r["fraction"] == 1.0 for r in fr.collect())
    with pytest.raises(ValueError):
        temperature_fractions(docs, "source", tau=-0.1, target_rows=10)
    with pytest.raises(ValueError):
        temperature_fractions(docs, "source", tau=0.5, target_rows=0)


def test_temperature_sample_deterministic_subset(docs):
    a = temperature_sample(docs, "source", "doc_id", 0.5, 200, size_col="n_chars")
    b = temperature_sample(docs, "source", "doc_id", 0.5, 200, size_col="n_chars")
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and 0 < len(ids_a) < docs.count()
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(ids_a) <= all_ids
    # different salt -> different (but same-band-rate) selection
    c = temperature_sample(docs, "source", "doc_id", 0.5, 200, size_col="n_chars", salt="x")
    ids_c = sorted(r["doc_id"] for r in c.select("doc_id").collect())
    assert ids_c != ids_a


# ---- pagerank (round-8 iterative-algorithm addition) ----------------


def test_pagerank_sums_to_one_and_uniform_on_cycle(spark):
    from interlinked_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    pr = {r["vertex"]: r["pagerank"] for r in pagerank(cycle, iterations=7).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(abs(v - 1.0 / 3) < 1e-9 for v in pr.values())


def test_pagerank_dangling_mass_redistributed(spark):
    from interlinked_spark.operators.graph import pagerank

    # a -> b, b dangling: mass must NOT leak (sum stays 1) and b > a.
    chain = spark.createDataFrame([("a", "b")], ["src", "dst"])
    pr = {r["vertex"]: r["pagerank"] for r in pagerank(chain, iterations=10).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr["b"] > pr["a"]


def test_pagerank_partitioned_path_matches_small_graph_path(spark):
    from interlinked_spark.operators.graph import pagerank

    # The dangling scalar has two in-plan shapes (frame-local window at
    # n_parts==1, one-row broadcast otherwise); forcing a tiny
    # rows_per_partition flips the same graph onto the partitioned
    # path — ranks must agree to float-sum noise.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")],
        ["src", "dst"],
    )
    small = {r["vertex"]: r["pagerank"] for r in pagerank(edges, iterations=6).collect()}
    parted = {
        r["vertex"]: r["pagerank"]
        for r in pagerank(edges, iterations=6, rows_per_partition=2).collect()
    }
    assert small.keys() == parted.keys()
    assert all(abs(small[v] - parted[v]) < 1e-12 for v in small)
    assert abs(sum(small.values()) - 1.0) < 1e-9


def test_pagerank_guards(spark):
    from interlinked_spark.operators.graph import pagerank

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


# ---- incremental packing state --------------------------------------


def test_pack_incremental_continues_offsets(spark, tmp_path):
    from interlinked_spark.llm.packing import (
        init_packing_state,
        pack_incremental,
        packed_assignments,
        read_packed,
    )

    b0 = spark.createDataFrame([(1, 30), (2, 50)], ["doc_id", "n_tok"])
    b1 = spark.createDataFrame([(3, 20), (4, 40)], ["doc_id", "n_tok"])
    path = str(tmp_path / "st")
    init_packing_state(spark, path, capacity=64)
    pack_incremental(b0, path, "n_tok", "doc_id", bucket_width=10, batch_id=0)
    pack_incremental(b1, path, "n_tok", "doc_id", bucket_width=10, batch_id=1)
    got = {
        r["doc_id"]: (r["offset"], r["seq_first"], r["seq_last"])
        for r in read_packed(spark, path).collect()
    }
    full = packed_assignments(
        b0.union(b1), "n_tok", "doc_id", capacity=64, bucket_width=10
    )
    want = {
        r["doc_id"]: (r["offset"], r["seq_first"], r["seq_last"])
        for r in full.collect()
    }
    assert got == want  # batches in id order == one-shot recompute


def test_pack_incremental_replay_is_idempotent(spark, tmp_path):
    from interlinked_spark.llm.packing import (
        init_packing_state,
        pack_incremental,
        read_packed,
    )

    b0 = spark.createDataFrame([(1, 30)], ["doc_id", "n_tok"])
    path = str(tmp_path / "st")
    init_packing_state(spark, path, capacity=64)
    pack_incremental(b0, path, "n_tok", "doc_id", bucket_width=10, batch_id=0)
    again = pack_incremental(b0, path, "n_tok", "doc_id", bucket_width=10, batch_id=0)
    assert [r["offset"] for r in again.collect()] == [0]
    assert read_packed(spark, path).count() == 1  # no duplicate rows
    with pytest.raises(ValueError):
        pack_incremental(b0, path, "n_tok", "doc_id", bucket_width=10, batch_id=5)


def test_read_packed_excludes_uncommitted_partition(spark, tmp_path):
    from interlinked_spark.llm.packing import (
        init_packing_state,
        pack_incremental,
        read_packed,
    )

    b0 = spark.createDataFrame([(1, 30)], ["doc_id", "n_tok"])
    path = str(tmp_path / "st")
    init_packing_state(spark, path, capacity=64)
    pack_incremental(b0, path, "n_tok", "doc_id", bucket_width=10, batch_id=0)
    # A batch whose meta swap never landed: partition present, counter not bumped.
    b0.selectExpr("doc_id", "0 AS n_tok_ignored", "99 AS offset").write.mode(
        "overwrite"
    ).parquet(f"{path}/assignments/batch_seq=1")
    committed = read_packed(spark, path)
    assert committed.count() == 1
    assert [r["batch_seq"] for r in committed.collect()] == [0]


def test_stream_packing_batch_boundary_invariance(spark):
    """2-batch vs 4-batch replays of the same id-ordered corpus land
    identical coordinates (the streaming packer's oracle precondition),
    and both equal the one-shot recompute."""
    from interlinked_spark.catalog import _stage_id_ordered_files
    from interlinked_spark.llm.packing import (
        pack_incremental,  # noqa: F401 (import path smoke)
        packed_assignments,
        read_packed,
    )
    from interlinked_spark.llm.text import token_stats
    from interlinked_spark.streaming import replay_shuffle_partitions
    from interlinked_spark.streaming.ops import (
        run_packing_into_state,
        stream_from_parquet,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    coords = {}
    for n_batches in (2, 4):
        staged = _stage_id_ordered_files(d, "doc_id", n_batches)
        stream = stream_from_parquet(spark, staged)
        with replay_shuffle_partitions(spark, 8):
            state = run_packing_into_state(stream, capacity=256, bucket_width=100)
        coords[n_batches] = {
            r["doc_id"]: (r["offset"], r["seq_first"], r["seq_last"])
            for r in read_packed(spark, state).collect()
        }
    assert coords[2] == coords[4]
    toks = token_stats(d).select("doc_id", "n_bpe_est")
    oneshot = packed_assignments(toks, "n_bpe_est", "doc_id", 256, bucket_width=100)
    want = {
        r["doc_id"]: (r["offset"], r["seq_first"], r["seq_last"])
        for r in oneshot.collect()
    }
    assert coords[4] == want


def test_grouped_packing_never_mixes_groups(spark):
    from interlinked_spark.llm.packing import packed_assignments

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "a", 200), (4, "b", 50)],
        ["doc_id", "grp", "n_tok"],
    )
    placed = packed_assignments(
        df, "n_tok", "doc_id", capacity=128, bucket_width=10, group_col="grp"
    )
    rows = {r["doc_id"]: r for r in placed.collect()}
    # per-group offsets restart at 0
    assert rows[1]["offset"] == 0 and rows[2]["offset"] == 0
    assert rows[3]["offset"] == 100 and rows[4]["offset"] == 100
    # group column survives for downstream partitioning
    assert rows[3]["grp"] == "a"


def test_grouped_pack_sequences_full_but_last_per_group(spark, docs_tokens):
    from interlinked_spark.llm.packing import pack_sequences

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "lang")
    toks = docs_tokens.join(d, "doc_id")
    seqs = pack_sequences(
        toks, "n_bpe_est", "doc_id", 256, bucket_width=100, group_col="lang"
    )
    by_lang = {}
    for r in seqs.collect():
        by_lang.setdefault(r["lang"], {})[r["seq_id"]] = r["tokens_filled"]
    assert len(by_lang) > 1
    for lang, fills in by_lang.items():
        assert sorted(fills) == list(range(len(fills)))
        last = max(fills)
        for sid, filled in fills.items():
            if sid != last:
                assert filled == 256, f"{lang} seq {sid} not full"


# ---- plan advisor ---------------------------------------------------


def test_plan_advisor_flags_and_clears(spark):
    from interlinked_spark.plans import advise

    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    cross = a.crossJoin(b)
    codes = {f["code"] for f in advise(cross)}
    # tiny sides broadcast (BNLJ); big sides go CartesianProduct —
    # either is the nested-loop smell family
    assert codes & {"cartesian-product", "broadcast-nested-loop"}

    # ...but the engine's blessed one-row stats-frame crossJoin (the
    # broadcast side is an ungrouped aggregate — provably single-row)
    # must NOT trip the gate (r10: advisor-as-CI over the examples)
    stats = b.agg(F.sum("y").alias("total"))
    scalar_cross = a.crossJoin(F.broadcast(stats))
    codes = {f["code"] for f in advise(scalar_cross)}
    assert "broadcast-nested-loop" not in codes
    assert "cartesian-product" not in codes

    gw = a.withColumn("r", F.sum("x").over(Window.orderBy("x")))
    codes = {f["code"] for f in advise(gw)}
    assert "single-partition-exchange" in codes

    from pyspark.sql.functions import udf

    slow = a.withColumn("u", udf(lambda v: v + 1)("x"))
    codes = {f["code"] for f in advise(slow)}
    assert "python-row-udf" in codes

    # a clean catalog plan yields no findings
    from interlinked_spark import catalog

    clean = catalog.run_query("pricing_summary", spark, SF_SMOKE)
    assert advise(clean) == []
    # severity ordering: high before warn
    mixed = advise(cross.withColumn("r", F.sum("x").over(Window.orderBy("x"))))
    sevs = [f["severity"] for f in mixed]
    assert sevs == sorted(sevs, key=lambda s: {"high": 0, "warn": 1}[s])


def test_advise_shuffle_conf_sizing():
    from interlinked_spark.plans import advise_shuffle_conf

    mb = 1024 * 1024
    # tiny input: parallelism floor wins
    c = advise_shuffle_conf(10 * mb, cores=32)
    assert c["spark.sql.shuffle.partitions"] == 64
    # 100 TB at 128 MB: ~819k partitions, never the 200 default
    c = advise_shuffle_conf(100 * 1024 * 1024 * mb, cores=1000)
    assert c["spark.sql.shuffle.partitions"] == -(-100 * 1024 * 1024 * mb // (128 * mb))
    assert c["spark.sql.files.maxPartitionBytes"] == 128 * mb
    import pytest as _pytest

    with _pytest.raises(ValueError):
        advise_shuffle_conf(-1, 4)
    with _pytest.raises(ValueError):
        advise_shuffle_conf(10, 0)


def test_temperature_sample_10x_stress(spark, docs):
    """10x perturbation-duplicated corpus: fractions shrink ~10x for
    the same absolute target (the arithmetic is size-aware, not
    rate-based), selection stays deterministic, and the original
    corpus's kept set is NOT simply replicated (hash bands are id-keyed,
    so shifted copies sample independently)."""
    big = docs
    for j in range(1, 10):
        big = big.union(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(j * 10_000_000))
        )
    big = big.cache()
    fr_small = {
        r["source"]: r["fraction"]
        for r in temperature_fractions(
            docs, "source", 0.5, 100, size_col="n_chars"
        ).collect()
    }
    fr_big = {
        r["source"]: r["fraction"]
        for r in temperature_fractions(
            big, "source", 0.5, 100, size_col="n_chars"
        ).collect()
    }
    for s in fr_small:
        # 10x rows per stratum at ~10x mass: weight shares are ~equal,
        # so fraction scales ~1/10 (exact up to the 6dp round).
        assert abs(fr_big[s] - fr_small[s] / 10) < 5e-3, (s, fr_small[s], fr_big[s])
    a = sorted(
        r["doc_id"]
        for r in temperature_sample(
            big, "source", "doc_id", 0.5, 100, size_col="n_chars"
        ).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(
            big, "source", "doc_id", 0.5, 100, size_col="n_chars"
        ).select("doc_id").collect()
    )
    assert a == b and len(a) > 0
    # copies sample independently: the selected set is not 10 shifted
    # replicas of one base set
    base = {i for i in a if i < 10_000_000}
    shifted_hits = {i % 10_000_000 for i in a if i >= 10_000_000}
    assert shifted_hits != base
    big.unpersist()


def test_pagerank_broadcast_gate_helpers():
    """The broadcast hint is gated on estimated BYTES vs the session's
    autoBroadcastJoinThreshold, not rows alone (ADVICE r10 medium):
    explicit hints override the threshold and AQE never demotes them."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from interlinked_spark.operators.graph import _estimated_row_bytes

    long_schema = StructType([
        StructField("s", LongType()), StructField("d", LongType()),
        StructField("w", DoubleType()),
    ])
    str_schema = StructType([
        StructField("s", StringType()), StructField("d", StringType()),
        StructField("w", DoubleType()),
    ])
    assert _estimated_row_bytes(long_schema) == 24
    assert _estimated_row_bytes(str_schema) == 104
    # 5M string-keyed edges (the ADVICE scenario) estimate ~520MB —
    # far past any sane threshold, so the old row-only gate was unsafe
    assert 5_000_000 * _estimated_row_bytes(str_schema) > 100 * 1024 * 1024


def test_pagerank_broadcast_threshold_parsing(spark):
    from interlinked_spark.operators.graph import _auto_broadcast_threshold_bytes

    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        for raw, want in [("10MB", 10 << 20), ("10485760b", 10485760),
                          ("512k", 512 << 10), ("-1", -1), ("1g", 1 << 30)]:
            spark.conf.set(key, raw)
            assert _auto_broadcast_threshold_bytes(spark) == want, raw
        # threshold -1 (broadcast disabled): pagerank must still run,
        # just without the hint — results identical
        spark.conf.set(key, "-1")
        from interlinked_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
        )
        pr = {r["vertex"]: r["pagerank"] for r in pagerank(edges, iterations=5).collect()}
        assert abs(sum(pr.values()) - 1.0) < 1e-9
        assert max(pr.values()) - min(pr.values()) < 1e-9  # cycle = uniform
    finally:
        spark.conf.set(key, orig)
