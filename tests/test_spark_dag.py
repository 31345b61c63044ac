"""DAG-on-Spark tier (SURVEY.md §5.2-3): workflow semantics operating on
DataFrames — multi-provide persistence, persist-on-reuse, config as
reader options — plus plan-quality checks (pushdown / pruning), which
are the 100-TB posture made testable."""

import pytest
from pyspark.sql import functions as F

from interlinked_spark import Workflow
from interlinked_spark.workflow import Run

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_multi_provide_dataframes_persist_once(spark):
    wkf = Workflow("")
    calls = {"n": 0}

    @wkf.provide("li")
    def li(spark, base_dir):
        return spark.read.parquet(f"{base_dir}/lineitem.parquet")

    @wkf.depend(li="li")
    @wkf.provide("flag.a", "flag.r")
    def flags(li):
        calls["n"] += 1
        agg = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
        return (
            agg.filter(F.col("l_returnflag") == "A"),
            agg.filter(F.col("l_returnflag") == "R"),
        )

    run = Run(wkf, spark=spark, base_dir=SF)
    a = run.resolve("flag.a")
    r = run.resolve("flag.r")
    assert calls["n"] == 1  # one call materializes both patterns
    # both slices are pinned (their shared agg prefix computes once)
    assert a.storageLevel.useMemory and r.storageLevel.useMemory
    assert a.count() == 1 and r.count() == 1
    run.release()
    assert not a.storageLevel.useMemory


def test_persist_on_reuse_skips_bare_scans(spark):
    wkf = Workflow("")

    @wkf.provide("scan")
    def scan(spark, base_dir):
        return spark.read.parquet(f"{base_dir}/nation.parquet")

    @wkf.provide("agg")
    def agg(spark, base_dir):
        return (
            spark.read.parquet(f"{base_dir}/customer.parquet")
            .groupBy("c_nationkey")
            .count()
        )

    run = Run(wkf, spark=spark, base_dir=SF)
    s1, s2 = run.resolve("scan"), run.resolve("scan")
    a1, a2 = run.resolve("agg"), run.resolve("agg")
    assert s1 is s2 and a1 is a2  # memoized
    assert not s1.storageLevel.useMemory  # scan: cache is a pessimization
    assert a1.storageLevel.useMemory  # aggregate: pinned on reuse
    run.release()


def test_config_becomes_reader_options(spark, tmp_path):
    # csv source with options flowing from the config router
    csv = tmp_path / "t.csv"
    csv.write_text("a|b\n1|x\n2|y\n")
    wkf = Workflow("")

    @wkf.provide("csvtable")
    def csvtable(spark, path, sep, header):
        from interlinked_spark.sources import read_table

        return read_table(spark, path, fmt="csv", sep=sep, header=header)

    wkf.set_config({"csvtable": {"path": str(csv), "sep": "|", "header": "true"}})
    df = wkf.run("csvtable", spark=spark)
    assert df.columns == ["a", "b"] and df.count() == 2


# -- plan quality: what .explain must show before an operator is "done" --


def test_filter_pushdown_reaches_parquet_scan(spark):
    from interlinked_spark import catalog

    df = catalog.run_query("pricing_summary", spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_column_pruning_reaches_scan(spark):
    from interlinked_spark import catalog

    df = catalog.run_query("orders_per_month", spark, SF)
    plan = plan_of(df)
    # 2-column query must not read the other 4 columns
    assert (
        "ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp_ntz>" in plan
        or "ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp>" in plan
    ), plan


def test_route_param_becomes_pushed_filter(spark):
    from interlinked_spark import catalog

    df = catalog.run_query("route_param_filter", spark, SF)
    plan = plan_of(df)
    # The route param itself must reach the scan as an EqualTo (r3: the
    # param is normalized instead of wrapping the column in upper(),
    # which used to collapse pushdown to bare IsNotNull).
    assert "EqualTo(o_orderstatus,F)" in plan, plan


def test_broadcast_join_planned_for_dims(spark):
    from interlinked_spark import catalog

    df = catalog.run_query("region_revenue", spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan


def test_global_topk_avoids_full_sort(spark):
    from interlinked_spark import catalog

    df = catalog.run_query("top_expensive_lineitems", spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_whole_stage_codegen_covers_agg(spark):
    from interlinked_spark import catalog

    import re

    df = catalog.run_query("pricing_summary", spark, SF)
    df.collect()  # AQE finalizes the plan only after an action
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # '*(N)' prefixes mark whole-stage-codegen spans; both aggregate
    # stages must be inside one
    assert len(re.findall(r"\*\(\d+\) HashAggregate", plan)) >= 2, plan
