"""Per-group model fitting — the reference's MLflow train/infer pattern
(``/root/reference/examples/ml-flow.py:61-79``) re-expressed Spark-first:
the per-group work runs INSIDE the cluster via applyInPandas instead of
looping over groups on the driver.

    python -m interlinked_spark examples.grouped_models:wkf run nation_models -s
"""

import pandas as pd

from interlinked_spark import Workflow
from interlinked_spark.session import get_spark

wkf = Workflow("grouped-models", base_kw={"base_dir": "/root/testdata/sf0.001"})


@wkf.provide("spark")
def spark_session():
    return get_spark("grouped-models-example")


@wkf.depend(spark="spark")
@wkf.provide("customers")
def customers(spark, base_dir):
    return spark.read.parquet(f"{base_dir}/customer.parquet")


@wkf.depend(c="customers")
@wkf.provide("nation_models")
def nation_models(c):
    """Fit a tiny 'model' (mean/std) per nation, distributed: one pandas
    group per nation, executed on executors via Arrow batches."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "n": [len(pdf)],
                "mean_acctbal": [round(pdf["c_acctbal"].mean(), 2)],
                "std_acctbal": [round(pdf["c_acctbal"].std(ddof=1), 2)],
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        fit, schema="c_nationkey int, n long, mean_acctbal double, std_acctbal double"
    )
