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


def regression_agg(
    df: DataFrame,
    keys: Sequence[str],
    x_col: Union[str, Column],
    y_col: Union[str, Column],
    round_dp: int = 6,
) -> DataFrame:
    """Per-group simple linear regression (§2b-D regression family):
    count, slope, intercept and R² of ``y`` on ``x`` via Spark's
    built-in ``regr_*`` aggregates — JVM-side co-moment accumulators,
    ONE hash aggregate (partial + final), no window, no second pass.
    The closed-form trend extractor for feature pipelines (per-entity
    drift, per-source quality trajectories).

    Rows where either side is NULL are excluded pairwise (the SQL-
    standard ``regr_*`` contract both engines implement).  Outputs
    round to ``round_dp`` — the engines' accumulation orders differ
    (distributed partials vs sequential), so last-ulp float divergence
    is expected and rounded away; callers keeping full precision can
    pass ``round_dp=None``.

    NULL contract: a single-point group (or zero x-variance) yields
    NULL slope/intercept/R² in BOTH engines — surfaced, not masked."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col

    def r(c: Column) -> Column:
        return F.round(c, round_dp) if round_dp is not None else c

    return df.groupBy(*keys).agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        r(F.regr_slope(y, x)).alias("slope"),
        r(F.regr_intercept(y, x)).alias("intercept"),
        r(F.regr_r2(y, x)).alias("r2"),
    )


def mad_outlier_summary(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_sigmas: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Robust per-group outlier summary via MAD (§2b-D robust stats):
    count, median, median-absolute-deviation, and how many values
    deviate more than ``n_sigmas * 1.4826 * MAD`` from the median
    (1.4826 scales MAD to the normal σ).  Mean/stddev z-scores break on
    the very outliers they hunt — a single 1000x spike inflates σ until
    nothing flags; medians don't.

    Plan: group medians (one hash aggregate), deviations via a join
    back (AQE broadcasts the median frame when the keyspace is small),
    then MAD as a PARTITION-WIDE window aggregate feeding the final
    count — the window and the final groupBy share the partitioning on
    ``keys``, so Catalyst plans ONE exchange for both.  Exact
    ``percentile`` is per-group-memory-bound: right for bounded groups
    (entities, devices); for huge groups switch to ``percentile_approx``
    (GK sketch, mergeable) and accept the rank-error band.  The
    interpolation rule (mean of the two middle values at even counts)
    matches ``quantile_cont`` — SQL-twin-exact."""
    from pyspark.sql import Window

    med = df.groupBy(*keys).agg(F.percentile(value_col, 0.5).alias("__med"))
    dev = df.join(med, list(keys)).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    w = Window.partitionBy(*keys)
    flagged = dev.withColumn("__mad", F.percentile("__dev", 0.5).over(w))
    return flagged.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.round(F.first("__med"), round_dp).alias("median"),
        F.round(F.first("__mad"), round_dp).alias("mad"),
        F.sum(
            F.when(
                F.col("__dev") > F.lit(float(n_sigmas) * 1.4826) * F.col("__mad"), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )
