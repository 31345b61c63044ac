"""Spark analytics workflow — resources are lazy DataFrames.

    python -m interlinked_spark examples.analytics:wkf run revenue.a -s
    python -m interlinked_spark examples.analytics:wkf deps
    python -m interlinked_spark examples.analytics:wkf validate

Config (base_dir) can come from a toml/json file via ``run -c``:
the config router injects reader parameters per resource pattern
(reference pattern: config-as-reader-options).
"""

from pyspark.sql import functions as F

from interlinked_spark import Workflow
from interlinked_spark.session import get_spark
from interlinked_spark.sources import read_table

wkf = Workflow("analytics", base_kw={"base_dir": "/root/testdata/sf0.001"})


@wkf.provide("spark")
def spark_session():
    return get_spark("analytics-example")


@wkf.depend(spark="spark")
@wkf.provide("table.{name:identifier}")
def table(spark, base_dir, name):
    return read_table(spark, f"{base_dir}/{name}.parquet")


@wkf.depend(li="table.lineitem")
@wkf.provide("revenue.{flag:identifier}")
def revenue(li, flag):
    return (
        li.filter(F.upper(F.col("l_returnflag")) == flag.upper())
        .groupBy("l_linestatus")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("l_linestatus")
    )
