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
