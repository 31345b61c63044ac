"""Window-function operators (SURVEY.md §2b-E, §2b-F top-k-per-group).

Scale notes: a window = one shuffle on the partition key + per-partition
sort.  Unbounded windows without a partition key collapse to a single
task — always partition.  For top-k-per-group Spark pushes a per-
partition rank limit (WindowGroupLimit) before the shuffle since 3.5.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def window_spec(
    partition: Sequence[str],
    order: Sequence[Union[str, Column]],
    rows: Optional[Tuple[int, int]] = None,
    range_: Optional[Tuple[int, int]] = None,
) -> WindowSpec:
    w = Window.partitionBy(*partition).orderBy(*order)
    if rows is not None:
        w = w.rowsBetween(*rows)
    elif range_ is not None:
        w = w.rangeBetween(*range_)
    return w


def ranked(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Union[str, Column]],
    fn: str = "row_number",
    alias: str = "rk",
) -> DataFrame:
    if fn == "ntile":
        raise ValueError("use ntile() directly with the bucket count")
    return df.withColumn(alias, _RANKERS[fn]().over(window_spec(partition, order)))


def top_k_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Union[str, Column]],
    k: int,
) -> DataFrame:
    """Keep the k first rows per group by the given order.  Use a total
    order (unique tie-breaker) for deterministic results."""
    return (
        ranked(df, partition, order, "row_number", "__rk")
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def running(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Union[str, Column]],
    col: Column,
    alias: str,
    rows: Tuple[int, int] = (Window.unboundedPreceding, 0),
) -> DataFrame:
    """Frame aggregate (running sum, moving average, ...)."""
    return df.withColumn(alias, col.over(window_spec(partition, order, rows=rows)))


def shifted(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Union[str, Column]],
    col: str,
    offsets: Sequence[int] = (-1, 1),
) -> DataFrame:
    """lag/lead columns: ``{col}_lag{n}`` / ``{col}_lead{n}``."""
    w = window_spec(partition, order)
    for off in offsets:
        if off < 0:
            df = df.withColumn(f"{col}_lag{-off}", F.lag(col, -off).over(w))
        else:
            df = df.withColumn(f"{col}_lead{off}", F.lead(col, off).over(w))
    return df


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts after ``gap_seconds``
    of per-key inactivity.  ``session_col`` numbers sessions 1..n within
    each key (lag + running sum of boundary flags — ONE shuffle on the
    keys, the batch counterpart of the streaming ``session_agg``)."""
    keys = list(keys)
    w = window_spec(keys, [ts_col])
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    boundary = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(boundary).over(window_spec(keys, [ts_col], rows=(Window.unboundedPreceding, 0))),
    )


def change_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_col: str,
    tie_breaker: Optional[str] = None,
) -> DataFrame:
    """Gaps-and-islands / SCD2 interval builder: collapse CONSECUTIVE
    rows with the same ``attr_col`` value per key into one validity
    interval.  Boundary flag (lag change) + running sum assigns island
    ids in one keyed shuffle; the island aggregate rides the same
    partitioning.  Returns keys + attr + valid_from_s/valid_to_s (epoch
    seconds) + n_events."""
    keys = list(keys)
    order = [ts_col] + ([tie_breaker] if tie_breaker else [])
    w = window_spec(keys, order)
    prev = F.lag(attr_col).over(w)
    boundary = F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    islands = df.withColumn(
        "__island",
        F.sum(boundary).over(window_spec(keys, order, rows=(Window.unboundedPreceding, 0))),
    )
    return (
        islands.groupBy(*keys, "__island", attr_col)
        .agg(
            F.min(F.col(ts_col).cast("long")).alias("valid_from_s"),
            F.max(F.col(ts_col).cast("long")).alias("valid_to_s"),
            F.count("*").alias("n_events"),
        )
        .drop("__island")
    )


def running_distinct(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_distinct",
) -> DataFrame:
    """Running distinct count per entity (§2b-E): after each row, how
    many DISTINCT ``value_col`` values has this entity produced so far
    — the vocabulary-growth / exploration-breadth curve ("has this
    user tried a new event type?") that a plain running count can't
    express (``count(distinct)`` is not a window function in either
    engine).

    Decomposition: a first-occurrence flag (``row_number() == 1`` over
    ``(keys, value)`` in event order) followed by a running sum of the
    flag over ``keys`` — two window passes with DIFFERENT partition
    keys, so two exchanges; both are exact and streaming-friendly
    (each frame is cumulative).  ``order_cols`` must totally order each
    entity (include a tiebreak id) — otherwise "first" occurrence is
    undefined and the flag nondeterministic.

    Returns the input columns + ``out_col``."""
    first_w = Window.partitionBy(*keys, value_col).orderBy(*order_cols)
    cum_w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "__first", F.when(F.row_number().over(first_w) == 1, 1).otherwise(0)
    )
    return flagged.withColumn(
        out_col, F.sum("__first").over(cum_w).cast("bigint")
    ).drop("__first")


def funnel_conversion(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Ordered multi-step funnel with an optional per-step time budget
    (§2b-E product analytics): for each entity, the FIRST-TOUCH greedy
    path through ``steps`` — step 1 anchors at the entity's earliest
    step-1 event, each later step at its earliest event STRICTLY after
    the previous step (and within ``max_gap_seconds`` of it, when
    set).  This is the standard product-analytics funnel semantics
    (Amplitude/GA-style); greedy-from-earliest is not guaranteed
    maximal when a gap budget is set — a later anchor could complete
    where the earliest stalls — and that trade is documented, not
    hidden.

    Plan shape: one pre-aggregate per step (events pruned to that
    step's rows FIRST — at 100 TB the step filter is the whole game),
    then |steps| - 1 equi-joins on ``keys``, every frame keyed
    identically so the joins co-partition.  No windows, no explode.

    Returns one row per entity that reached step 1: keys +
    ``t_1..t_N`` (NULL once stalled) + ``steps_completed`` +
    ``seconds_to_convert`` (NULL unless fully converted)."""
    keys = list(keys)
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel_conversion: need >= 2 steps")
    cur = (
        df.filter(F.col(step_col) == steps[0])
        .groupBy(*keys)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        ev = df.filter(F.col(step_col) == step).select(
            *keys, F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(prev)
        if max_gap_seconds is not None:
            cond = cond & (
                F.col("__ts").cast("double")
                <= F.col(prev).cast("double") + float(max_gap_seconds)
            )
        nxt = (
            cur.join(ev, keys, "left")
            .withColumn("__ok", F.when(cond, F.col("__ts")))
            .groupBy(*keys, *[f"t_{j}" for j in range(1, i)])
            .agg(F.min("__ok").alias(f"t_{i}"))
        )
        cur = nxt
    t_cols = [f"t_{i}" for i in range(1, len(steps) + 1)]
    completed = sum(
        [F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in t_cols],
        F.lit(0),
    )
    last, first = t_cols[-1], t_cols[0]
    return cur.select(
        *keys,
        *t_cols,
        completed.cast("int").alias("steps_completed"),
        F.round(
            F.col(last).cast("double") - F.col(first).cast("double"), 6
        ).alias("seconds_to_convert"),
    )
