"""Writers, partition pruning via route params, IVF similarity,
multimodal transforms, foreachBatch bridge, plan/lineage utilities,
metrics hook."""

import pytest
from pyspark.sql import functions as F

from interlinked_spark import Workflow
from interlinked_spark.workflow import Run

SF = "/root/testdata/sf0.001"


def test_partitioned_write_and_pruned_scan(spark, tmp_path):
    """The engine's signature move end-to-end: write partitioned, then a
    route param becomes a partition filter — the scan must PRUNE, not
    read-and-filter."""
    from interlinked_spark.sources import write_table
    from interlinked_spark.plans import physical_plan

    target = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_table(orders, target, partition_by=["o_orderstatus"])

    wkf = Workflow("")

    @wkf.provide("orders.{status:identifier}")
    def orders_part(spark, path, status):
        df = spark.read.parquet(path)
        return df.filter(F.col("o_orderstatus") == status.upper())

    df = wkf.run("orders.f", spark=spark, path=target)
    plan = physical_plan(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    assert df.count() == orders.filter("o_orderstatus = 'F'").count()


def test_csv_json_write_read_roundtrip(spark, tmp_path):
    from interlinked_spark.sources import read_table, write_table

    nation = spark.read.parquet(f"{SF}/nation.parquet")
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / fmt)
        write_table(nation, path, fmt=fmt, header="true")
        back = read_table(
            spark, path, fmt=fmt,
            schema="n_nationkey int, n_name string, n_regionkey int",
            **({"header": "true"} if fmt == "csv" else {}),
        )
        assert back.count() == 25


def test_ivf_top_k_recall(spark):
    from interlinked_spark.llm.similarity import cosine_top_k, ivf_top_k

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    exact = cosine_top_k(emb, queries, k=5)
    approx = ivf_top_k(emb, queries, k=5, n_clusters=8, n_probe=8)  # probe-all = exact
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert e == a  # with n_probe == n_clusters IVF degenerates to exact
    # fewer probes: still k results per query, recall can drop
    part = ivf_top_k(emb, queries, k=5, n_clusters=8, n_probe=2)
    counts = part.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_multimodal_transform_plumbing(spark):
    from interlinked_spark.llm.multimodal import attach_binary_payload, transform_assets

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    out = transform_assets(attach_binary_payload(docs, "text", "doc_id"), width=4, height=4, n_frames=3)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.resized) == 16 for r in rows)
    assert all(len(r.frames) == 3 for r in rows)
    # determinism: same input -> same bytes
    again = transform_assets(attach_binary_payload(docs, "text", "doc_id"), width=4, height=4, n_frames=3)
    assert {(r.asset_id, bytes(r.resized)) for r in rows} == {
        (r.asset_id, bytes(r.resized)) for r in again.collect()
    }


def test_foreach_batch_bridge(spark):
    from interlinked_spark.streaming import stream_from_parquet, foreach_batch_into

    seen = {"rows": 0, "batches": 0}

    def handler(batch_df, batch_id):
        seen["rows"] += batch_df.count()
        seen["batches"] += 1

    stream = stream_from_parquet(spark, f"{SF}/events.parquet")
    foreach_batch_into(stream.filter(F.col("event_type") == "purchase"), handler, output_mode="append")
    batch_count = (
        spark.read.parquet(f"{SF}/events.parquet").filter("event_type = 'purchase'").count()
    )
    assert seen["rows"] == batch_count and seen["batches"] >= 1


def test_lineage_export():
    from interlinked_spark.plans import lineage

    wkf = Workflow("")

    @wkf.provide("a")
    def a():
        return 1

    @wkf.depend(x="a")
    @wkf.provide("b")
    def b(x):
        return x

    out = lineage(wkf)
    assert {"parent": "a", "dependent": "b"} in out["edges"]
    assert set(out["nodes"]) == {"a", "b"}


def test_run_metrics_hook(spark):
    wkf = Workflow("")

    @wkf.provide("n")
    def n(spark):
        return spark.range(10)

    run = Run(wkf, spark=spark)
    run.resolve("n")
    assert "n" in run.metrics and run.metrics["n"] >= 0.0


def test_pushed_filters_helper(spark):
    from interlinked_spark.plans import pushed_filters, read_schema

    df = spark.read.parquet(f"{SF}/orders.parquet").filter("o_custkey = 7").select("o_orderkey")
    assert any("o_custkey" in f for f in pushed_filters(df))
    assert read_schema(df) and "o_orderkey" in read_schema(df)[0]


def test_timestamp_encoding_matrix(spark, tmp_path):
    """Every events-path operator must analyze and run regardless of how
    the parquet writer encoded ``ts``: micros-UTC (isAdjustedToUTC=1,
    Spark reads TIMESTAMP), micros-NTZ (isAdjustedToUTC=0, Spark 4
    infers TIMESTAMP_NTZ unless inferTimestampNTZ is off), and
    TIMESTAMP(NANOS) (read as long under ``nanosAsLong``).  Guards
    against testdata regeneration silently switching encodings (the r4
    round-killer)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from interlinked_spark.operators.windows import change_intervals, sessionize
    from interlinked_spark.sources.readers import normalize_nanos
    from interlinked_spark.streaming.ops import (
        run_available_now,
        stream_from_parquet,
        tumbling_agg,
    )

    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = {
        "event_id": list(range(8)),
        "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
        "event_type": ["a", "a", "b", "b"] * 2,
        "ts": [base + datetime.timedelta(minutes=20 * i) for i in range(8)],
    }
    encodings = {
        "micros_utc": pa.timestamp("us", tz="UTC"),
        "micros_ntz": pa.timestamp("us"),
        "nanos": pa.timestamp("ns"),
    }
    expected_epochs = sorted(int((t - base).total_seconds()) + int(base.timestamp()) for t in rows["ts"])

    for name, ts_type in encodings.items():
        ts_vals = rows["ts"] if ts_type.tz else [t.replace(tzinfo=None) for t in rows["ts"]]
        table = pa.table(
            {
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "ts": pa.array(ts_vals, ts_type),
            }
        )
        path = str(tmp_path / name)
        pq.write_table(table, f"{path}.parquet", coerce_timestamps=None)

        df = normalize_nanos(spark.read.parquet(f"{path}.parquet"))
        assert df.schema["ts"].dataType.typeName() == "timestamp", (name, df.schema)

        # identical instants whichever encoding was written
        epochs = sorted(r[0] for r in df.select(F.col("ts").cast("long")).collect())
        assert epochs == expected_epochs, (name, epochs)

        # batch time operators: sessionization + gaps-and-islands
        assert sessionize(df, ["user_id"], "ts", gap_seconds=1800).count() == 8
        assert change_intervals(df, ["user_id"], "ts", "event_type").count() == 4

        # streaming: watermark + tumbling window must analyze AND drain
        stream = stream_from_parquet(spark, f"{path}.parquet")
        result = tumbling_agg(stream, "ts", "1 hour", keys=["user_id"])
        run_available_now(result, f"ts_matrix_{name}", output_mode="complete")
        assert spark.table(f"ts_matrix_{name}").count() > 0, name
