"""Round-12 operators: edit-distance join (q-gram count filter +
short-string band), regression aggregates, time-decayed aggregates,
MAD robust outliers, hard-negative mining."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (unit costs), classic DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", s.strip().lower())


def test_edit_distance_join_matches_bruteforce(spark):
    """Exact recall on a hand-built set that exercises every path:
    posting candidates, the count filter, the length filter, the
    short-string band (strings with <= q*d grams), and dedupe_self."""
    from interlinked_spark.operators.joins import edit_distance_join

    names = [
        (1, "small ring"), (2, "small rink"),      # ed 1 via postings
        (3, "smol ring"),                           # ed 2 of "small ring"
        (4, "completely different widget"),         # no partner
        (5, "ab"), (6, "ba"), (7, "a b"),           # short band (q*d=4 grams max)
        (8, "Small  Ring "),                        # normalizes to == 1
        (9, "ring small"),                          # word swap: far in ED
    ]
    df = spark.createDataFrame(names, "id int, name string")
    got = {
        (r.l_id, r.r_id, r.distance)
        for r in edit_distance_join(
            df.select(F.col("id").alias("l_id"), F.col("name").alias("l_name")),
            df.select(F.col("id").alias("r_id"), F.col("name").alias("r_name")),
            "l_name", "r_name", "l_id", "r_id",
            max_distance=2, q=2, dedupe_self=True,
        ).collect()
    }
    want = set()
    for i, a in names:
        for j, b in names:
            if i < j and _lev(_norm(a), _norm(b)) <= 2:
                want.add((i, j, _lev(_norm(a), _norm(b))))
    assert got == want
    assert (1, 8, 0) in got  # normalization collapses case/whitespace
    assert any(l in (5, 6, 7) and r in (5, 6, 7) for l, r, _ in got)  # short band


def test_edit_distance_join_blocking_and_length_filter(spark):
    """extra_on blocks across keys (no cross-block pairs even at ed 0);
    the length filter alone rejects |len gap| > d."""
    from interlinked_spark.operators.joins import edit_distance_join

    df = spark.createDataFrame(
        [(1, "alpha", "A"), (2, "alpha", "B"), (3, "alphaXYZ", "A")],
        "id int, name string, blk string",
    )
    l = df.select(F.col("id").alias("l_id"), F.col("name").alias("l_name"), "blk")
    r = df.select(F.col("id").alias("r_id"), F.col("name").alias("r_name"), "blk")
    got = {
        (x.l_id, x.r_id)
        for x in edit_distance_join(
            l, r, "l_name", "r_name", "l_id", "r_id",
            max_distance=2, q=2, extra_on=["blk"], dedupe_self=True,
        ).collect()
    }
    assert got == set()  # 1-2 cross-block; 1-3 len gap 3 > 2


def test_regression_agg_matches_numpy(spark):
    """slope/intercept/r2 against numpy polyfit on exact data; the
    single-point group yields NULLs, not a crash."""
    import numpy as np

    from interlinked_spark.operators.aggregates import regression_agg

    pts = [("a", 0.0, 1.0), ("a", 1.0, 3.1), ("a", 2.0, 4.9), ("a", 3.0, 7.2),
           ("b", 0.0, 5.0)]
    df = spark.createDataFrame(pts, "g string, x double, y double")
    got = {r.g: r for r in regression_agg(df, ["g"], "x", "y").collect()}
    xs = np.array([p[1] for p in pts if p[0] == "a"])
    ys = np.array([p[2] for p in pts if p[0] == "a"])
    slope, intercept = np.polyfit(xs, ys, 1)
    r2 = np.corrcoef(xs, ys)[0, 1] ** 2
    assert got["a"].n == 4
    assert math.isclose(got["a"].slope, round(slope, 6), abs_tol=1e-6)
    assert math.isclose(got["a"].intercept, round(intercept, 6), abs_tol=1e-6)
    assert math.isclose(got["a"].r2, round(r2, 6), abs_tol=1e-6)
    assert got["b"].n == 1 and got["b"].slope is None and got["b"].r2 is None


def test_time_decayed_agg_closed_form(spark):
    """Weights 2^(-age/half_life) against the hand-computed fold;
    a row AT the reference weighs exactly 1."""
    from interlinked_spark.operators.timeseries import time_decayed_agg

    rows = [("u", "2024-01-01 00:00:00", 10.0),   # age 2 half-lives -> w 0.25
            ("u", "2024-01-08 00:00:00", 20.0),   # age 1 half-life  -> w 0.5
            ("u", "2024-01-15 00:00:00", 40.0)]   # age 0            -> w 1.0
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.to_timestamp("ts").alias("ts"), "v"
    )
    out = time_decayed_agg(
        df, ["g"], "ts", "v", half_life_seconds=7 * 86400.0,
        ref_ts="2024-01-15 00:00:00",
    ).collect()[0]
    want_sum = 0.25 * 10 + 0.5 * 20 + 1.0 * 40
    want_cnt = 0.25 + 0.5 + 1.0
    assert out.n == 3
    assert math.isclose(out.decayed_sum, want_sum, abs_tol=1e-6)
    assert math.isclose(out.decayed_count, want_cnt, abs_tol=1e-6)
    assert math.isclose(out.decayed_mean, want_sum / want_cnt, abs_tol=1e-6)


def test_mad_outliers_flags_spike_zscore_misses(spark):
    """The motivating case: one 1000x spike.  MAD flags exactly the
    spike; the classic 3-sigma mean/stddev z-score misses it because
    the spike itself inflates sigma."""
    import statistics

    from interlinked_spark.operators.aggregates import mad_outlier_summary

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 10000.0]
    df = spark.createDataFrame([("u", v) for v in vals], "g string, v double")
    out = mad_outlier_summary(df, ["g"], "v", n_sigmas=3.0).collect()[0]
    med = statistics.median(vals)
    mad = statistics.median(sorted(abs(v - med) for v in vals))
    assert out.n == 8
    assert math.isclose(out.median, round(med, 6))
    assert math.isclose(out.mad, round(mad, 6))
    assert out.n_outliers == 1
    # contrast: 3-sigma on mean/stddev flags nothing (sigma ~ 3530)
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    assert not any(abs(v - mu) > 3 * sd for v in vals)


def test_hard_negative_mining_label_filter_and_guard(spark):
    """Same-label neighbors are excluded however similar; k bounds per
    anchor; the anchor-size guard raises with the scale-path pointer."""
    from interlinked_spark.llm.similarity import hard_negative_mining

    rows = [
        (1, [1.0, 0.0], "A"),   # anchor
        (2, [1.0, 0.01], "A"),  # nearest overall but SAME label
        (3, [0.9, 0.1], "B"),
        (4, [0.0, 1.0], "B"),
        (5, [0.95, 0.05], "C"),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    got = hard_negative_mining(
        df, df.filter(F.col("vec_id") == 1), k=2
    ).collect()
    ids = [r.negative_id for r in got]
    assert 2 not in ids                      # same-label excluded
    assert ids == [5, 3]                     # cosine order among B/C
    assert all(r.negative_label in ("B", "C") for r in got)
    with pytest.raises(ValueError, match="ivf_top_k|anchor"):
        hard_negative_mining(df, df, k=2, max_anchor_rows=2)


def test_edit_distance_join_scale_shape(spark):
    """Plan hygiene on the real catalog query: no CartesianProduct /
    BroadcastNestedLoop anywhere (the short band joins on the blocking
    key), and the count filter prunes before verification."""
    from interlinked_spark import catalog

    df = catalog.run_query("part_name_edit_pairs", spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert df.count() > 0
