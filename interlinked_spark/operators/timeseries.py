"""Time-series operators (SURVEY.md §2b-E extensions).

``time_grid_fill`` is the distributed resample/gap-fill: aggregate to a
time bucket, then densify each key's range so downstream windows and
charts see an unbroken grid.  The grid is generated per key with
``sequence`` + ``explode`` — row-local (narrow) generation, no driver
loop, no cross join against a global calendar table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_grid_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    unit: str = "hour",
    aggs: dict[str, Column] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Bucket ``ts_col`` by ``unit`` (``date_trunc`` granularity),
    aggregate per (keys, bucket), then LEFT-join the aggregate onto the
    dense per-key bucket grid spanning each key's min..max bucket.
    Missing buckets appear with ``fill`` defaults (default 0 per agg;
    pass ``fill={}`` to keep gap buckets NULL, e.g. for
    :func:`forward_fill`).

    Returns keys + ``bucket`` (timestamp) + agg columns."""
    keys = list(keys)
    aggs = aggs or {"n": F.count("*")}
    if fill is None:
        fill = {name: 0 for name in aggs}
    step = F.expr(f"INTERVAL 1 {unit.upper()}")
    bucketed = (
        df.groupBy(*keys, F.date_trunc(unit, ts_col).alias("bucket"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    grid = (
        bucketed.groupBy(*keys)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(*keys, F.explode(F.sequence("__lo", "__hi", step)).alias("bucket"))
    )
    out = grid.join(bucketed, keys + ["bucket"], "left")
    for name, default in fill.items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    suffix: str = "_ff",
) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: each NULL in
    ``cols`` takes the latest non-null value at or before the row in
    the per-key ``order_col`` order — ``last(..., ignorenulls=True)``
    over an unbounded-preceding frame, one shuffle on the keys (shared
    with the grid densify when chained after :func:`time_grid_fill`)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def time_decayed_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
    ref_ts: str,
    round_dp: int = 6,
) -> DataFrame:
    """Exponential time-decayed aggregate per group (§2b-D/E): each
    row weighs ``2^(-(ref - t) / half_life)``, outputs the decayed sum,
    decayed count (sum of weights) and decayed mean — the feature-store
    staple ("clicks, recency-weighted, half-life 7 days") that replaces
    arbitrary trailing-window cutoffs with smooth recency.

    ``ref_ts`` is an EXPLICIT timestamp literal (e.g. ``"2024-07-01
    00:00:00"``), never now(): the same input must produce the same
    output on every run/engine (replay, backfill, oracle parity).

    Scale: the weight is a per-row scalar against a FIXED reference —
    so this is ONE hash aggregate (partial + final), no window, no
    per-group ordering, and no running-product numeric blowup (the
    recursive EWMA formulation overflows ``(1-a)^-n``; anchoring to
    ``ref_ts`` keeps every exponent bounded by the data's time span).
    Rows after ``ref_ts`` get weight > 1 by the same formula —
    callers wanting a strict horizon filter first."""
    # timestamp -> double keeps the fractional microseconds (DuckDB
    # epoch() parity); unix_timestamp would silently floor to seconds.
    age = F.to_timestamp(F.lit(ref_ts)).cast("double") - F.col(ts_col).cast("double")
    w = F.pow(F.lit(2.0), -age / F.lit(float(half_life_seconds)))
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.round(F.sum(w * F.col(value_col)), round_dp).alias("decayed_sum"),
        F.round(F.sum(w), round_dp).alias("decayed_count"),
        F.round(F.sum(w * F.col(value_col)) / F.sum(w), round_dp).alias("decayed_mean"),
    )
