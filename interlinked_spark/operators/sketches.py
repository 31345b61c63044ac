"""Materialized mergeable-sketch state (SURVEY.md §2b-D approx family).

The third member of the persisted-state trilogy (shingle index, LSH
vector index, and now distinct-count sketches): per-group Datasketches
HLL sketches persisted as a parquet resource, appended per batch, and
estimated by sketch UNION at query time.  This is how a 100-TB pipeline
maintains distinct counts over an append-only history WITHOUT ever
rescanning it — each batch is scanned once, and the state is
O(groups x 2^lg_k) bytes regardless of history size.

Correctness anchor: Datasketches HLL union is register-wise max, so the
union of per-batch sketches equals the one-shot sketch of the full
multiset EXACTLY (same registers -> same estimate, order- and
batching-insensitive).  That makes "merged state == one-shot sketch" a
deterministic, test-pinnable equality, not an approximation claim; the
estimate-vs-exact error bound is the only approximate part and is
bounded by the standard HLL rse (~1.04 / sqrt(2^lg_k)).

lg_k is pinned in a one-row ``meta/`` parquet at build time and
re-read by every update — mixing lg_k across batches would silently
degrade the union to the coarser precision (Spark only allows it with
``allowDifferentLgConfigK``, which this module deliberately never sets).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sketch_distinct_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per key group: ``(keys..., sketch)`` — the rows
    the persisted state stores.  One shuffle (the groupBy), sketch
    build is JVM-side (Datasketches)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def build_sketch_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    path: str,
    lg_k: int = 12,
    num_files: int = 8,
) -> None:
    """Materialize the initial sketch state + its lg_k meta pin."""
    from ..sources.writers import write_table

    keys = list(keys)
    state = sketch_distinct_state(df, keys, value_col, lg_k=lg_k)
    write_table(state.repartition(num_files, *[F.col(k) for k in keys]),
                f"{path}/state")
    meta = df.sparkSession.createDataFrame([(int(lg_k),)], "lg_k int")
    write_table(meta.coalesce(1), f"{path}/meta")


def update_sketch_state(
    new_batch: DataFrame,
    keys: Sequence[str],
    value_col: str,
    path: str,
    num_files: int = 4,
) -> None:
    """Append the batch's per-group sketches (lg_k from the stored meta
    — batches can never drift precision).  Append-only: multiple sketch
    rows per group are fine, the estimator unions them; run
    ``sources/writers.compact_table`` periodically and/or re-aggregate
    when row count per group grows."""
    from ..sources.writers import write_table

    spark = new_batch.sparkSession
    lg_k = int(spark.read.parquet(f"{path}/meta").first().lg_k)
    keys = list(keys)
    state = sketch_distinct_state(new_batch, keys, value_col, lg_k=lg_k)
    write_table(
        state.repartition(num_files, *[F.col(k) for k in keys]),
        f"{path}/state",
        mode="append",
    )


def sketch_state_estimates(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Distinct estimates from the materialized state: union the
    accumulated sketches per group (register-wise max — exact w.r.t.
    the one-shot sketch) and estimate.  Scans only the state (KBs per
    group), never the history."""
    keys = list(keys)
    return (
        spark.read.parquet(f"{path}/state")
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("__u"))
        .select(*keys, F.hll_sketch_estimate("__u").alias(out_col))
    )
