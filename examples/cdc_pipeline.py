"""Daily-maintenance pipeline as a workflow: a change stream keeps a
latest-state table fresh (foreachBatch CDC upsert), and a new document
batch is deduped INCREMENTALLY against the accepted corpus — the two
operations a 100-TB training-data pipeline runs every day, never
recomputing history.

    PYTHONPATH=. python examples/cdc_pipeline.py
"""

from pyspark.sql import functions as F

from interlinked_spark import Workflow
from interlinked_spark.llm.dedup import ngram_jaccard_incremental
from interlinked_spark.operators.merge import keep_latest
from interlinked_spark.session import get_spark
from interlinked_spark.streaming import run_upsert_into_parquet, stream_from_parquet

wkf = Workflow("cdc-pipeline", base_kw={"base_dir": "/root/testdata/sf0.001"})


@wkf.provide("spark")
def spark_session():
    return get_spark("cdc-pipeline-example")


@wkf.depend(spark="spark")
@wkf.provide("state.users")
def user_state(spark, base_dir):
    """Keep-latest-per-user table maintained off the events change
    stream: each micro-batch compacts, then MERGEs into parquet."""
    stream = stream_from_parquet(spark, f"{base_dir}/events.parquet")
    path = run_upsert_into_parquet(stream, ["user_id"], ["ts", "event_id"])
    return spark.read.parquet(path)


@wkf.depend(spark="spark")
@wkf.provide("docs.new_matches")
def incremental_dedup(spark, base_dir):
    """New docs (every 4th id plays today's batch) matched against the
    accepted corpus + earlier new docs — never corpus x corpus."""
    d = spark.read.parquet(f"{base_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    new = d.filter(F.col("doc_id") % 4 == 0)
    return ngram_jaccard_incremental(corpus, new, threshold=0.5)


@wkf.depend(state="state.users", matches="docs.new_matches")
@wkf.provide("report")
def report(state, matches):
    return {
        "users_tracked": state.count(),
        "latest_is_unique_per_user": state.groupBy("user_id").count()
        .filter(F.col("count") > 1).count() == 0,
        "new_docs_with_duplicates": matches.select("new_id").distinct().count(),
    }


if __name__ == "__main__":
    out = wkf.run("report")
    print(out)
    # sanity: the CDC table equals the batch keep-latest answer
    spark = wkf.run("spark")
    base = wkf.base_kw["base_dir"]
    from interlinked_spark.sources.readers import normalize_nanos

    ev = normalize_nanos(spark.read.parquet(f"{base}/events.parquet"))
    assert out["users_tracked"] == keep_latest(ev, ["user_id"], ["ts", "event_id"]).count()
    print("CDC state matches batch keep-latest ✔")
