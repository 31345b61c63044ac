"""Skew salting + bucketed co-located joins — correctness AND the plan
properties that make them worth using."""

import pytest
from pyspark.sql import functions as F

from interlinked_spark.operators.skew import salted_group_agg, salted_join
from interlinked_spark.plans import physical_plan

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "k"),
            orders.withColumnRenamed("o_orderkey", "k"),
            on=["k"],
            salt_buckets=8,
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_group_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("total"),
        F.count("*").alias("n"),
        F.round(F.max("l_extendedprice"), 2).alias("mx"),
    )
    salted = salted_group_agg(
        li,
        ["l_returnflag"],
        {
            "total": ("sum", F.round(F.sum("l_quantity"), 2)),
            "n": ("count", F.count("*")),
            "mx": ("max", F.round(F.max("l_extendedprice"), 2)),
        },
        salt_buckets=8,
    )
    # sums of rounded partials can differ in the last decimals; compare rounded
    p = {r.l_returnflag: (round(r.total, 1), r.n, r.mx) for r in plain.collect()}
    s = {r.l_returnflag: (round(r.total, 1), r.n, r.mx) for r in salted.collect()}
    assert p == s


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    from interlinked_spark.sources.writers import write_bucketed

    # (warehouse dir is a static conf; managed tables land in
    # ./spark-warehouse and are dropped below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8)
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    try:
        joined = spark.table("li_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = physical_plan(joined)
        # co-located: the sort-merge join reads bucketed scans directly —
        # no Exchange on either side
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
