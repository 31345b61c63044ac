"""Aggregation operators (SURVEY.md §2b-D).

All hash aggregates: Spark plans partial (map-side combine) + final
automatically, so a groupBy over 100 TB moves only the per-partition
partial states through the shuffle.  High-cardinality group keys are the
thing to watch — prefer approx sketches for distinct counts at scale.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AggSpec = Mapping[str, Column]


def group_agg(df: DataFrame, keys: Sequence[str], aggs: AggSpec) -> DataFrame:
    """``groupBy(keys).agg(...)`` with every output aliased (the
    engine-wide rule: computed columns always carry stable names)."""
    return df.groupBy(*keys).agg(*[col.alias(name) for name, col in aggs.items()])


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: AggSpec) -> DataFrame:
    """Hierarchical subtotals (k, k1..ki-1 totals, grand total)."""
    return df.rollup(*keys).agg(*[col.alias(name) for name, col in aggs.items()])


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: AggSpec) -> DataFrame:
    """All 2^k grouping-set combinations."""
    return df.cube(*keys).agg(*[col.alias(name) for name, col in aggs.items()])


def distinct_agg(df: DataFrame, keys: Sequence[str], distinct_cols: Sequence[str]) -> DataFrame:
    """Exact distinct counts; Spark expands multi-distinct into an
    expand+two-phase agg.  For >1e9-cardinality columns prefer
    :func:`approx_distinct`."""
    return df.groupBy(*keys).agg(
        *[F.countDistinct(c).alias(f"distinct_{c}") for c in distinct_cols]
    )


def approx_distinct(df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct estimate — constant memory per group, the
    only sane distinct-count at 100 TB."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"))


def approx_quantiles(df: DataFrame, keys: Sequence[str], col: str, probs: Sequence[float]) -> DataFrame:
    """Greenwald-Khanna sketch percentiles (mergeable, bounded memory)."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, list(probs)).alias(f"approx_percentiles_{col}")
    )


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    tie_breaker: Optional[str] = None,
    keep: str = "min",
) -> DataFrame:
    """Exact deduplication.

    With ``tie_breaker`` the survivor per key group is deterministic:
    rows equal to the per-key min/max of the tie-breaker, computed with
    an unordered window aggregate — ONE shuffle on the keys and no sort
    (vs. two shuffles for groupBy-min + semi-join back).  Without it,
    falls back to ``dropDuplicates`` (arbitrary survivor — cheapest,
    order-dependent).
    """
    if tie_breaker is None:
        return df.dropDuplicates(list(keys))
    from pyspark.sql import Window

    pick = F.min(tie_breaker) if keep == "min" else F.max(tie_breaker)
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__pick", pick.over(w))
        .filter(F.col(tie_breaker) == F.col("__pick"))
        .drop("__pick")
    )


def collect_sorted(df: DataFrame, keys: Sequence[str], col: str, sep: str = ",") -> DataFrame:
    """Deterministic collect: distinct values sorted then joined —
    stable across partitionings (plain collect_list is not)."""
    return df.groupBy(*keys).agg(
        F.array_join(F.sort_array(F.collect_set(col)), sep).alias(f"collected_{col}")
    )
