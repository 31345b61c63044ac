"""Pre-flight checklist for a big join — profile, size, then decide.

The 100-TB discipline: before launching an expensive join or bucket-
keyed self-join, spend seconds on histogram-level diagnostics instead
of discovering a 10^13-row blowup a cluster-day into the job.

1. ``profile_table``   — one-pass per-column nulls/distincts/min-max
   (is the join key dense?  how many distinct values?).
2. ``join_size_stats`` — EXACT output cardinality + skew profile of the
   planned equi-join, from the two key histograms (never the join).
3. ``bucket_stats``    — candidate-pair mass of a bucket-keyed
   self-join (LSH bands, blocking keys) before running it.

Run: ``python examples/preflight.py [sf_dir]`` (default sf0.001).
"""

import sys

from interlinked_spark.operators.diagnostics import (
    bucket_stats,
    join_size_stats,
    profile_table,
)
from interlinked_spark.session import get_spark


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("preflight-example", master="local[4]")
    orders = spark.read.parquet(f"{base}/orders.parquet")
    lineitem = spark.read.parquet(f"{base}/lineitem.parquet")

    print("== 1. profile the join key side (one scan, all columns) ==")
    profile_table(orders, exact_distinct=False).show(truncate=False)

    print("== 2. size the planned join BEFORE running it ==")
    stats = join_size_stats(orders, lineitem, ["o_orderkey"], ["l_orderkey"]).first()
    print(dict(stats.asDict()))
    if stats.overflow or stats.max_key_rows is None:
        print("-> OVERFLOW: this join exceeds 2^63 output rows; do not run it")
    else:
        fanout = stats.join_rows / max(stats.left_rows, 1)
        print(f"average fan-out {fanout:.2f}; hottest key emits {stats.max_key_rows} rows")
        if stats.max_key_rows > 1_000_000:
            print("-> salt this key (operators/skew.salted_join) before joining")

    print("== 3. candidate mass of a blocking-keyed self-join ==")
    blocked = lineitem.selectExpr("l_partkey as bucket", "l_suppkey as id")
    bucket_stats(blocked, ["bucket"], "id").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
