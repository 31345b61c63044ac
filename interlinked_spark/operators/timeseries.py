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


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 20,
    min_periods: int = 5,
    n_sigmas: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Rolling-window anomaly score per entity (§2b-E): each row's
    z-score against the mean/stddev of its PRECEDING ``window_rows``
    observations (frame ``[-window_rows, -1]`` — the current row never
    scores against itself, so a spike cannot inflate its own baseline;
    contrast :func:`mad_outlier_summary`'s global-median robustness).
    Rows with fewer than ``min_periods`` predecessors or zero rolling
    spread get a NULL z — no opinion, not a 0.

    Scale: ONE shuffle on ``keys`` (the window partition); the frame is
    row-bounded so state per row is O(window_rows) inside the sort-based
    window exec — no per-group materialization, and a billion users is
    a billion independent partitions.  ``order_cols`` must make the
    per-key order total (pass a tiebreak id alongside the timestamp) or
    cross-engine row order — hence the rolling frame — is undefined.

    Returns the input columns + ``roll_mean``, ``roll_std``, ``zscore``
    (all rounded), ``is_outlier`` (``|z| > n_sigmas``, NULL where z is
    NULL)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(-int(window_rows), -1)
    )
    m = F.avg(value_col).over(w)
    s = F.stddev_samp(value_col).over(w)
    c = F.count(value_col).over(w)
    ok = (c >= int(min_periods)) & (s > 0)
    z = F.when(ok, (F.col(value_col) - m) / s)
    return df.select(
        *df.columns,
        F.round(m, round_dp).alias("roll_mean"),
        F.round(s, round_dp).alias("roll_std"),
        F.round(z, round_dp).alias("zscore"),
        F.when(ok, F.abs(z) > F.lit(float(n_sigmas))).alias("is_outlier"),
    )


def transition_counts(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences (§2b-E): for each entity (``keys``) ordered by
    ``order_cols``, count consecutive ``state_col`` bigrams and
    row-normalize into transition probabilities — the behavioral
    fingerprint behind funnel diagnostics and next-action models.

    Scale: ``lead`` needs ONE shuffle on ``keys``; the bigram count is
    a hash aggregate with map-side partials, and the row-normalizing
    window runs on the |states|^2-row RESULT, not the events — at 100
    TB the output is still a handful of rows per state pair.  Entity
    boundaries never leak: ``lead`` is per-partition-key, so the last
    event of one user never pairs with the first of the next.

    Returns ``(from_state, to_state, n, prob)``."""
    from pyspark.sql import Window

    seq = Window.partitionBy(*keys).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(seq).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    total = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), round_dp).alias("prob"),
    )


def event_path_counts(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
    depth: int = 3,
    top_k: int | None = None,
) -> DataFrame:
    """User-journey path mining (§2b-E): count every length-``depth``
    run of consecutive ``state_col`` values per entity — the n-gram
    generalization of :func:`transition_counts` ("view > click > buy"
    funnels, top navigation paths).  Optional ``top_k`` keeps the most
    frequent paths with a fully deterministic tie order (count desc,
    then the path lexicographically), so both engines cut the same
    boundary.

    Scale: ONE shuffle on ``keys`` computes all ``depth - 1`` leads in
    a single window pass (same partition+order ⇒ Catalyst evaluates
    them in one WindowExec); the count is a hash aggregate over
    |states|^depth keys, and the top-k is a TakeOrderedAndProject on
    the aggregated result — never a global sort of events.

    Returns ``step_1..step_<depth>, n``."""
    from pyspark.sql import Window

    seq = Window.partitionBy(*keys).orderBy(*order_cols)
    steps = [F.col(state_col).alias("step_1")] + [
        F.lead(state_col, i).over(seq).alias(f"step_{i + 1}")
        for i in range(1, int(depth))
    ]
    names = [f"step_{i + 1}" for i in range(int(depth))]
    paths = df.select(*steps)
    for c in names[1:]:
        paths = paths.filter(F.col(c).isNotNull())
    out = paths.groupBy(*names).agg(F.count("*").alias("n"))
    if top_k is not None:
        out = out.orderBy(
            F.col("n").desc(), *[F.col(c).asc() for c in names]
        ).limit(int(top_k))
    return out
