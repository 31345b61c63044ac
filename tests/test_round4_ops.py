"""Round-4 additions: ADVICE-item regression tests + new operators.

Reference parity notes cite b12consulting/interlinked files where the
behavior under test mirrors the reference workflow surface; the engine
operators here are Spark-native additions with no reference twin.
"""

import pyspark.sql.functions as F

from .conftest import SF_SMOKE as SF


# ---------------------------------------------------------------- ADVICE r3


def test_repetition_signals_degenerate_docs(spark):
    """Docs that pass the JVM size>=n gate but tokenize to zero Python
    n-grams ('word\\n' once Spark trim keeps the newline; '\\n\\n'
    whitespace-only) must be dropped, not crash the job (ADVICE r3)."""
    from interlinked_spark.llm.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "word\n"),  # JVM split: ['word',''] -> size 2 passes gate
            (2, "\n\n"),  # whitespace-only
            (3, "a b a b a b"),  # real doc: 5 bigrams, 'a b' x3
            (4, "x"),  # fails the gate outright
        ],
        "doc_id int, text string",
    )
    out = repetition_signals(df, n=2).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [3]
    r = out[0]
    assert r.n_grams == 5
    assert r.top_gram == "a b"
    assert r.top_gram_count == 3
    assert abs(r.dup_gram_frac - (1.0 - 2 / 5)) < 1e-9


def test_repetition_signals_tie_break(spark):
    """Equal-count top grams break lexicographically smallest."""
    from interlinked_spark.llm.text import repetition_signals

    df = spark.createDataFrame([(1, "b a b a")], "doc_id int, text string")
    r = repetition_signals(df, n=2).collect()[0]
    # grams: 'b a','a b','b a' -> top ('b a',2)
    assert (r.top_gram, r.top_gram_count) == ("b a", 2)


def test_stream_upsert_target_schema_clean(spark, tmp_path):
    """The streaming-upsert parquet target must not leak the internal
    __ver struct into the consumer-visible schema (ADVICE r3)."""
    from interlinked_spark.sources.readers import normalize_nanos
    from interlinked_spark.streaming import run_upsert_into_parquet

    src = str(tmp_path / "ev_src")
    ev = normalize_nanos(spark.read.parquet(f"{SF}/events.parquet")).limit(200)
    ev.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    path = run_upsert_into_parquet(stream, ["user_id"], ["ts", "event_id"])
    cols = spark.read.parquet(path).columns
    assert "__ver" not in cols
    assert set(spark.read.parquet(src).columns) == set(cols)


def test_write_bucketed_db_qualified_overwrite(spark):
    """db-qualified bucketed overwrite must drop the real table (each
    qualifier part quoted separately) and clean the catalog-resolved
    location — twice in a row (ADVICE r3)."""
    from interlinked_spark.sources.writers import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS r4db")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    write_bucketed(nat, "r4db.nat_b", ["n_nationkey"], num_buckets=4)
    # Second overwrite exercises DESCRIBE->DROP->rmtree on a live table.
    write_bucketed(nat.limit(10), "r4db.nat_b", ["n_nationkey"], num_buckets=4)
    assert spark.table("r4db.nat_b").count() == 10
    spark.sql("DROP TABLE r4db.nat_b")
    spark.sql("DROP DATABASE r4db")


def test_cosine_top_k_guards_large_query_side(spark):
    """Brute-force cosine is O(|corpus| x |queries|) with the query set
    broadcast — a big query side must raise and point at the scale
    paths (VERDICT r3 #7)."""
    import pytest

    from interlinked_spark.llm.similarity import cosine_top_k

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="ivf_top_k"):
        cosine_top_k(emb, emb, k=2, max_query_rows=10)
    # Guard off -> runs fine.
    assert cosine_top_k(emb, emb.limit(2), k=2, max_query_rows=None).count() > 0


def test_lsh_join_cosine_is_exact_recompute(spark):
    """lsh_similarity_join output cosine must equal the exact
    brute-force cosine for the same pair (raw-array recompute, not the
    normalized-euclidean back-derivation)."""
    from interlinked_spark.llm.similarity import (
        cosine_similarity,
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(emb, cosine_threshold=0.3, num_hash_tables=12)
    a = emb.select(F.col("vec_id").alias("left_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("right_id"), F.col("embedding").alias("vb"))
    joined = (
        pairs.join(a, "left_id")
        .join(b, "right_id")
        .withColumn("exact", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
    )
    assert joined.filter(F.col("cosine") != F.col("exact")).count() == 0
    # Exact filter owns the boundary: nothing below the threshold leaks.
    assert joined.filter(F.col("cosine") < 0.3).count() == 0


def test_events_after_cutoff_integer_nanos():
    """Cutoff-nanos arithmetic must stay integral end-to-end — a float
    round-trip loses precision above 2**53 (ADVICE r3)."""
    from datetime import datetime, timedelta, timezone

    dt = datetime(2262, 4, 11, 23, 47, 16, 854775, tzinfo=timezone.utc)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    exact = ((dt - epoch) // timedelta(microseconds=1)) * 1000
    assert isinstance(exact, int)
    assert exact == 9223372036854775000  # near int64 max, > 2**53


def test_stream_scd2_multibatch_equals_batch_and_replay_idempotent(spark, tmp_path):
    """Chronologically ordered micro-batches through the streaming SCD2
    sink produce the SAME dimension table as a one-shot scd2_apply, and
    re-running the drained stream against the committed state changes
    nothing (drop_stale = replay idempotency)."""
    from interlinked_spark.operators.merge import scd2_apply
    from interlinked_spark.streaming import run_scd2_into_parquet

    seed = spark.createDataFrame(
        [(1, "A", "2020-01-01", "2260-12-31", True),
         (2, "Z", "2020-01-01", "2260-12-31", True)],
        ["k", "attr", "effective_from", "effective_to", "is_current"],
    ).selectExpr("k", "attr",
                 "cast(effective_from as timestamp) as effective_from",
                 "cast(effective_to as timestamp) as effective_to", "is_current")
    changes = spark.createDataFrame(
        [(1, "B", "2021-01-01"), (1, "B", "2021-06-01"), (2, "Z", "2021-02-01"),
         (1, "C", "2022-01-01"), (2, "Y", "2022-02-01"), (3, "N", "2022-03-01")],
        ["k", "attr", "change_ts"],
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")

    # two chronologic files -> two micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "chg")
    early = changes.filter(F.col("change_ts") < "2022-01-01").coalesce(1)
    late = changes.filter(F.col("change_ts") >= "2022-01-01").coalesce(1)
    early.write.parquet(src)
    late.write.mode("append").parquet(src)
    # file order is not guaranteed chronological; stream per-file and
    # rely on drop_stale only across REPLAYS, so feed two sinks in
    # explicit order instead: batch1 then batch2 via two drains.
    target = str(tmp_path / "dim")
    seed.write.parquet(target)
    for part in (early, late):
        one = str(tmp_path / f"one_{id(part)}")
        part.write.parquet(one)
        stream = spark.readStream.schema(part.schema).parquet(one)
        run_scd2_into_parquet(stream, ["k"], ["attr"], path=target)
    got = {(r.k, str(r.effective_from)[:10], r.attr, str(r.effective_to)[:10], r.is_current)
           for r in spark.read.parquet(target).collect()}
    want = {(r.k, str(r.effective_from)[:10], r.attr, str(r.effective_to)[:10], r.is_current)
            for r in scd2_apply(seed, changes, ["k"], ["attr"],
                                end_of_time="2260-12-31 00:00:00").collect()}
    assert got == want
    # replay the FULL change set against committed state: no-op
    full = str(tmp_path / "full")
    changes.coalesce(1).write.parquet(full)
    stream = spark.readStream.schema(changes.schema).parquet(full)
    run_scd2_into_parquet(stream, ["k"], ["attr"], path=target)
    again = {(r.k, str(r.effective_from)[:10], r.attr, str(r.effective_to)[:10], r.is_current)
             for r in spark.read.parquet(target).collect()}
    assert again == got


def test_scd2_validate_rejects_duplicate_open_rows(spark):
    """validate=True fails fast on >1 open row per key (the contract
    clause that otherwise mis-chains silently, VERDICT r10 item 6)."""
    import pytest

    from interlinked_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [(1, "A", "2020-01-01", "9999-12-31", True),
         (1, "B", "2021-01-01", "9999-12-31", True)],
        ["k", "attr", "effective_from", "effective_to", "is_current"],
    ).selectExpr("k", "attr",
                 "cast(effective_from as timestamp) as effective_from",
                 "cast(effective_to as timestamp) as effective_to", "is_current")
    ch = spark.createDataFrame(
        [(1, "C", "2022-01-01")], ["k", "attr", "change_ts"]
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")
    with pytest.raises(ValueError, match="open .*rows|open \\(is_current\\)"):
        scd2_apply(hist, ch, ["k"], ["attr"], validate=True)
    # without the flag the call stays lazy/permissive (old behavior)
    assert scd2_apply(hist, ch, ["k"], ["attr"]) is not None


def test_scd2_validate_rejects_null_tracked(spark):
    """validate=True fails fast on NULL tracked/timestamp values
    (engines disagree on NULL sort order -> nondeterministic chain)."""
    import pytest

    from interlinked_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [(1, "A", "2020-01-01", "9999-12-31", True)],
        ["k", "attr", "effective_from", "effective_to", "is_current"],
    ).selectExpr("k", "attr",
                 "cast(effective_from as timestamp) as effective_from",
                 "cast(effective_to as timestamp) as effective_to", "is_current")
    ch_null_attr = spark.createDataFrame(
        [(1, None, "2022-01-01")], "k long, attr string, change_ts string"
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")
    with pytest.raises(ValueError, match="NULL"):
        scd2_apply(hist, ch_null_attr, ["k"], ["attr"], validate=True)
    ch_null_ts = spark.createDataFrame(
        [(1, "B", None)], "k long, attr string, change_ts string"
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")
    with pytest.raises(ValueError, match="NULL"):
        scd2_apply(hist, ch_null_ts, ["k"], ["attr"], validate=True)
    # clean inputs pass the same flag
    ch_ok = spark.createDataFrame(
        [(1, "B", "2022-01-01")], ["k", "attr", "change_ts"]
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")
    out = scd2_apply(hist, ch_ok, ["k"], ["attr"], validate=True)
    assert out.count() == 2


def test_stream_scd2_on_stale_surfaces_out_of_order_batch(spark, tmp_path):
    """An out-of-chronology micro-batch (rows older than the committed
    open row) is DETECTED: on_stale='warn' (default) emits a UserWarning
    with the dropped-row count; on_stale='fail' raises (ADVICE r10)."""
    import warnings

    import pytest

    from interlinked_spark.streaming import run_scd2_into_parquet

    seed = spark.createDataFrame(
        [(1, "B", "2022-01-01", "2260-12-31", True)],
        ["k", "attr", "effective_from", "effective_to", "is_current"],
    ).selectExpr("k", "attr",
                 "cast(effective_from as timestamp) as effective_from",
                 "cast(effective_to as timestamp) as effective_to", "is_current")
    old_change = spark.createDataFrame(
        [(1, "A", "2021-01-01")], ["k", "attr", "change_ts"]
    ).selectExpr("k", "attr", "cast(change_ts as timestamp) as change_ts")

    target = str(tmp_path / "dim")
    seed.write.parquet(target)
    src = str(tmp_path / "old")
    old_change.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(old_change.schema).parquet(src)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_scd2_into_parquet(stream, ["k"], ["attr"], path=target)
    msgs = [str(w.message) for w in caught if "older than" in str(w.message)]
    assert msgs and "1 change row" in msgs[0]
    # the stale row was dropped: dimension unchanged
    assert spark.read.parquet(target).count() == 1

    stream = spark.readStream.schema(old_change.schema).parquet(src)
    with pytest.raises(Exception, match="older than"):
        run_scd2_into_parquet(stream, ["k"], ["attr"], path=target, on_stale="fail")
    with pytest.raises(ValueError, match="on_stale"):
        run_scd2_into_parquet(stream, ["k"], ["attr"], path=target, on_stale="boom")
