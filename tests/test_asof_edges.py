"""Edge semantics of the union-tag as-of join: equal timestamps are
inclusive, missing matches yield nulls, per-key isolation, forward
mirror — pinned against hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from interlinked_spark.operators import asof_join


@pytest.fixture()
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "L1"),
            (1, 200, "L2"),
            (2, 150, "L3"),
            (3, 50, "L4"),  # key with no right rows at all
        ],
        "k long, ts long, tag string",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [
            (1, 100, "R@100"),  # equal to L1.ts -> inclusive match
            (1, 180, "R@180"),
            (2, 160, "R@160"),  # after L3 -> backward misses, forward hits
        ],
        "k long, rts long, rtag string",
    ).withColumn("rts", F.timestamp_seconds("rts"))
    return left, right


def collect_map(df):
    return {r.tag: r.rtag for r in df.collect()}


def test_backward_inclusive_and_nulls(spark, tables):
    left, right = tables
    out = asof_join(left, right, "ts", "rts", by=["k"], value_cols=["rtag"])
    got = collect_map(out)
    assert got == {
        "L1": "R@100",  # equal ts matches (inclusive)
        "L2": "R@180",  # latest prior
        "L3": None,     # only future right rows
        "L4": None,     # key absent from right
    }


def test_forward_direction(spark, tables):
    left, right = tables
    out = asof_join(
        left, right, "ts", "rts", by=["k"], value_cols=["rtag"], direction="forward"
    )
    got = collect_map(out)
    assert got == {
        "L1": "R@100",  # equal ts matches forward too
        "L2": None,     # nothing at-or-after 200
        "L3": "R@160",  # next right row
        "L4": None,
    }


def test_row_count_preserved(spark, tables):
    left, right = tables
    assert asof_join(left, right, "ts", "rts", by=["k"], value_cols=["rtag"]).count() == left.count()


def test_multiple_value_columns(spark, tables):
    left, right = tables
    right2 = right.withColumn("extra", F.length("rtag"))
    out = asof_join(left, right2, "ts", "rts", by=["k"], value_cols=["rtag", "extra"])
    row = {r.tag: (r.rtag, r.extra) for r in out.collect()}
    assert row["L2"] == ("R@180", 5)
    assert row["L4"] == (None, None)
