"""Time-series operators (SURVEY.md §2b-E extensions).

``time_grid_fill`` is the distributed resample/gap-fill: aggregate to a
time bucket, then densify each key's range so downstream windows and
charts see an unbroken grid.  The grid is generated per key with
``sequence`` + ``explode`` — row-local (narrow) generation, no driver
loop, no cross join against a global calendar table.
"""

from __future__ import annotations

from typing import Optional, Sequence

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


def linear_interp_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    col: str,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Linear interpolation imputation (§2b-E — the rung above LOCF
    for continuous signals): each NULL takes the straight line between
    the BRACKETING non-null observations in per-key ``order_col``
    order; leading/trailing gaps fall back to the nearest single
    neighbor (back-/forward-fill), and non-null cells pass through
    EXACTLY (their bracketing window collapses to themselves).

    Shape: two window passes over the same per-key shuffle the grid
    densify already paid — last/first ``ignorenulls`` for the values
    plus the same for the observation times; no join, no extra
    exchange.  ``order_col`` must be numeric (epoch seconds): the
    ratio ``(t - t_prev) / (t_next - t_prev)`` is a long-over-long
    double, identical in any engine, and the output rounds 6dp so the
    interpolated lattice is hash-comparable."""
    from pyspark.sql import Window

    out_col = out_col or f"{col}_li"
    wb = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.col(order_col)
    obs_t = F.when(F.col(col).isNotNull(), t)
    prev_v = F.last(col, ignorenulls=True).over(wb)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_v = F.first(col, ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    interp = F.when(
        prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
        F.round(prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t), 6),
    ).otherwise(F.round(F.coalesce(prev_v, next_v), 6))
    return df.withColumn(out_col, interp)


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cents_col: str,
    phase_col: str,
    half_window: int = 12,
) -> DataFrame:
    """STL-lite seasonal-trend decomposition (§2b-E) in EXACT integer
    arithmetic: trend = centered moving average over ``2*half_window+1``
    rows (NULL until the window is full — the classical-decomposition
    edge rule), seasonal = per-``phase_col`` mean of the detrended
    series, residual = value - trend - seasonal.

    Determinism is the design: ``cents_col`` is the integer-scaled
    value, the trend numerator is an integer window SUM, the detrended
    series is ``n*c - trend_sum`` (still integer), and the seasonal
    mean is an integer-sum over integer-count division — every division
    happens ONCE at the end on exactly-agreed integers, so no
    window-aggregation association order (Spark's sort-based frames vs
    DuckDB's segment trees) can flip a 6th decimal.  Emits ``v`` (2dp),
    ``trend`` / ``seasonal`` / ``resid`` (6dp).

    Shape: one per-key window pass (the grid's own shuffle) + one
    bounded per-(keys, phase) aggregate joined back (|keys| x period
    rows — broadcast-sized by construction)."""
    from pyspark.sql import Window

    full = 2 * half_window + 1
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-half_window, half_window)
    )
    c = F.col(cents_col)
    t_sum = F.when(
        F.count(cents_col).over(w) == full, F.sum(cents_col).over(w)
    )
    out = df.withColumn("__tsum", t_sum).withColumn(
        "__d", F.lit(full) * c - F.col("__tsum")
    )
    seasonal = (
        out.groupBy(*keys, phase_col)
        .agg(
            F.sum("__d").alias("__snum"),
            F.count("__d").alias("__scnt"),
        )
        .filter(F.col("__scnt") > 0)
    )
    scale = float(full * 100)
    joined = out.join(F.broadcast(seasonal), [*keys, phase_col], "left")
    s = F.col("__snum") / (F.lit(scale) * F.col("__scnt"))
    trend = F.col("__tsum") / F.lit(scale)
    value = c / F.lit(100.0)
    return joined.select(
        *keys,
        order_col,
        phase_col,
        F.round(value, 2).alias("v"),
        F.round(trend, 6).alias("trend"),
        F.round(s, 6).alias("seasonal"),
        F.when(
            trend.isNotNull() & s.isNotNull(),
            F.round(value - trend - s, 6),
        ).alias("resid"),
    )


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


def prorate_by_month(
    df: DataFrame,
    start_col: str,
    end_col: str,
    value_col: str,
    id_cols: Sequence[str],
    round_dp: int = 6,
) -> DataFrame:
    """Calendar-month proration of an interval-attached value (§2b-E —
    the revenue-recognition / cost-allocation staple: a contract or
    shipment spanning months recognizes value per month in proportion
    to overlap days).  ``end_col`` is EXCLUSIVE, so
    ``total_days = datediff(end, start)`` and the per-month day counts
    sum to it exactly; the share is ONE division of exact integer day
    counts (``days/total``), so the allocation is engine-portable and
    the per-interval sum reconstructs the value to rounding.

    Shape: row-local month explode (an interval spans
    ``O(days/30)`` months — bounded fan-out, no join, no shuffle: the
    100-TB proration is a map job).  Returns ``(id_cols..., month,
    days_in_month, total_days, prorated)``.

    Precondition ``end > start``, enforced by DROPPING violating rows
    deterministically (ADVICE r15): an inverted or zero-length
    interval has no days to prorate over — left in, it would make the
    month ``sequence`` throw an illegal-boundaries runtime error (one
    bad row killing the whole job) and ``total_days = 0`` divide by
    zero.  Filter-don't-raise matches the engine's NULL-abstain
    convention (``ks_two_sample``): malformed intervals are a data
    quality fact for a dq check to count, not a reason to crash a
    100-TB allocation run."""
    s, e = F.col(start_col), F.col(end_col)
    df = df.filter(e > s)
    total = F.datediff(e, s)
    months = F.sequence(
        F.trunc(s, "month"),
        F.trunc(F.date_sub(e, 1), "month"),
        F.expr("interval 1 month"),
    )
    out = df.select(
        *id_cols,
        s.alias("__s"),
        e.alias("__e"),
        F.col(value_col).alias("__v"),
        total.alias("__tot"),
        F.explode(months).alias("month"),
    )
    days = F.datediff(
        F.least(F.col("__e"), F.add_months(F.col("month"), 1)),
        F.greatest(F.col("__s"), F.col("month")),
    )
    # floor(x*10^dp + 0.5)/10^dp, not round(): the allocation quotient
    # of a 2dp price lands EXACTLY on 6th-decimal ties (e.g. .4346875)
    # where the engines' round() implementations split — the portable
    # floor rule is deterministic on the identical double.
    scale = float(10**round_dp)
    return out.select(
        *id_cols,
        "month",
        days.cast("int").alias("days_in_month"),
        F.col("__tot").cast("int").alias("total_days"),
        (
            F.floor(F.col("__v") * days / F.col("__tot") * scale + F.lit(0.5))
            / scale
        ).alias("prorated"),
    )


def position_attribution(
    events: DataFrame,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution (§2b-E event
    analytics — the marketing-standard middle ground between the
    last-touch as-of join and data-driven Shapley): each conversion's
    credit splits 40% first touch / 40% last touch / 20% across the
    middles (1 touch -> 100%, 2 -> 50/50).  A touch belongs to the
    FIRST conversion at-or-after it by the same entity, so conversion
    windows partition each entity's timeline (the previous conversion
    closes the window) and every touch credits at most one conversion.

    Shape: ONE shuffle on the entity — the touch->conversion
    assignment is the union-tag window trick (``first_value`` of the
    next conversion id over a following frame; at equal timestamps
    touches order BEFORE conversions, so a same-instant conversion
    still collects the touch), then rank/count windows per conversion
    and a broadcast-sized join back for the conversion value.  No
    touch x conversion join ever forms.  Shares are exact rational
    expressions evaluated identically in any engine; outputs round
    6dp.  Returns ``(purchase_id, click_id, touch_rank, n_touches,
    credit_share, credited_value)``."""
    from pyspark.sql import Window

    ev = events.filter(
        F.col("event_type").isin(touch_type, conversion_type)
    ).select(
        F.col(id_col).alias("__id"),
        F.col(entity_col).alias("__ent"),
        F.col(ts_col).alias("__ts"),
        (F.col("event_type") == conversion_type).alias("__is_conv"),
        F.col(value_col).alias("__v"),
    )
    wnext = (
        Window.partitionBy("__ent")
        .orderBy("__ts", "__is_conv", "__id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    nx = ev.withColumn(
        "__pid",
        F.first(F.when(F.col("__is_conv"), F.col("__id")), ignorenulls=True).over(
            wnext
        ),
    )
    touches = nx.filter(~F.col("__is_conv") & F.col("__pid").isNotNull())
    wr = Window.partitionBy("__pid").orderBy("__ts", "__id")
    wn = Window.partitionBy("__pid")
    ranked = touches.withColumn("__r", F.row_number().over(wr)).withColumn(
        "__n", F.count("*").over(wn)
    )
    conv = nx.filter(F.col("__is_conv")).select(
        F.col("__id").alias("__pid"), F.col("__v").alias("__pv")
    )
    r, n = F.col("__r"), F.col("__n")
    share = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((r == 1) | (r == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    return ranked.join(conv, "__pid").select(
        F.col("__pid").alias("purchase_id"),
        F.col("__id").alias("click_id"),
        r.cast("int").alias("touch_rank"),
        n.cast("int").alias("n_touches"),
        F.round(share, 6).alias("credit_share"),
        F.round(F.col("__pv") * share, 6).alias("credited_value"),
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


def cusum_alarms(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    slack: float,
    threshold: float,
    target: float | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per entity (§2b-E,
    Page 1954): the classic SPC recurrence ``S⁺_i = max(0, S⁺_{i-1} +
    (x_i - target - slack))`` (and the mirrored ``S⁻``) accumulates
    evidence of a sustained mean SHIFT and resets on contrary evidence
    — the drift detector a per-row z-score is blind to (ten
    consecutive +1σ readings never flag a 3σ rule; CUSUM climbs).

    The recurrence looks inherently sequential, but it has the exact
    closed form ``S_i = C_i - min(0, min_{j<=i} C_j)`` where ``C`` is
    the running sum of ``(x - target - slack)`` — a running-sum plus a
    running-min, both plain cumulative window aggregates.  So the whole
    detector is ONE shuffle on ``keys`` with all four cumulative frames
    (and the per-key mean when ``target=None``) sharing a single
    WindowExec sort — no recursion, no UDF, no driver loop, and a
    billion entities are a billion independent partitions.

    ``target=None`` baselines each entity at its own full-series mean
    (retrospective audit mode); pass an explicit target for the
    online/spec-limit mode.  ``order_cols`` must be a total order per
    key (include a tiebreak id) — cumulative sums under a nondeterministic
    order are undefined.  ``slack`` (the reference value k, typically
    0.5σ of the in-control noise) sets drift tolerance; ``threshold``
    (h, typically 4-5σ) sets the alarm line.

    Returns the input columns + ``cusum_high``, ``cusum_low`` (rounded)
    and ``alarm`` (either side above ``threshold``)."""
    from pyspark.sql import Window

    cum = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Window functions can't nest, so each level lands as a column
    # before the next reads it (baseline mean -> running sums ->
    # running mins); every Window operator shares the same partitioning
    # (+ ordering where framed), so Catalyst plans ONE exchange and ONE
    # sort for the whole stack.
    cols = list(df.columns)
    if target is None:
        full = Window.partitionBy(*keys)
        based = df.select(*cols, F.avg(value_col).over(full).alias("__mu"))
        center = F.col(value_col) - F.col("__mu")
    else:
        based = df
        center = F.col(value_col) - F.lit(float(target))
    k = F.lit(float(slack))
    staged = based.select(
        *cols,
        F.sum(center - k).over(cum).alias("__c_hi"),
        F.sum(-center - k).over(cum).alias("__c_lo"),
    )
    s_hi = F.col("__c_hi") - F.least(F.lit(0.0), F.min("__c_hi").over(cum))
    s_lo = F.col("__c_lo") - F.least(F.lit(0.0), F.min("__c_lo").over(cum))
    return staged.select(
        *cols,
        F.round(s_hi, round_dp).alias("cusum_high"),
        F.round(s_lo, round_dp).alias("cusum_low"),
        ((s_hi > float(threshold)) | (s_lo > float(threshold))).alias("alarm"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    keys: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimator (§2b-E survival family): from
    one row per subject — ``duration_col`` (time observed) and
    ``event_col`` (1 = event occurred, 0 = right-censored) — the
    product-limit curve ``S(t) = prod_{t_i <= t} (1 - d_i / n_i)``
    per ``keys`` stratum.  Censoring is the whole point: "average time
    to churn" over observed churners alone is survivorship bias; KM
    uses every subject up to the moment it stops being watched.

    Scale shape: subjects collapse to DISTINCT-duration cells in ONE
    hash aggregate first; the at-risk counts and the cumulative
    product (as ``exp(cumsum(ln(1 - d/n)))``) are windows over the
    CELLS frame — bounded by distinct event times per stratum, never
    the subject table.  All windows share one partitioning on
    ``keys``.  A zero factor (everyone at risk dies at t) pins S to
    exactly 0.0 from t on — tracked by a cumulative zero-count, not by
    ``ln(0)`` (whose -inf would poison the sum in either engine).

    Returns keys + ``t``, ``n_at_risk``, ``n_events``, ``n_censored``,
    ``survival`` (rounded) ordered cells."""
    from pyspark.sql import Window

    keys = list(keys)
    ev = F.col(event_col).cast("int")
    cells = df.groupBy(
        *keys, F.col(duration_col).alias("t")
    ).agg(
        F.sum(ev).alias("n_events"),
        F.sum(1 - ev).alias("n_censored"),
    )
    part = Window.partitionBy(*keys)
    order = part.orderBy("t")
    before = order.rowsBetween(Window.unboundedPreceding, -1)
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    leaving = F.col("n_events") + F.col("n_censored")
    at_risk = cells.select(
        *keys,
        "t",
        "n_events",
        "n_censored",
        (
            F.sum(leaving).over(part)
            - F.coalesce(F.sum(leaving).over(before), F.lit(0))
        ).alias("n_at_risk"),
    )
    factor = 1.0 - F.col("n_events") / F.col("n_at_risk")
    staged = at_risk.select(
        *at_risk.columns,
        F.sum(F.when(factor > 0, F.log(factor))).over(cum).alias("__lnsum"),
        F.sum(F.when(factor <= 0, 1).otherwise(0)).over(cum).alias("__zeros"),
    )
    surv = F.when(F.col("__zeros") > 0, 0.0).otherwise(
        F.exp(F.coalesce(F.col("__lnsum"), F.lit(0.0)))
    )
    return staged.select(
        *keys,
        "t",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
        F.round(surv, round_dp).alias("survival"),
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


def interarrival_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Per-entity inter-arrival-time diagnostics (§2b-E): mean gap,
    coefficient of variation, and the Goh-Barabási burstiness index
    ``B = (cv - 1) / (cv + 1)`` — the "is this activity Poisson,
    periodic, or bursty" classifier (B ~ -1 periodic, ~0 Poisson,
    -> 1 bursty) behind bot detection, session-timeout tuning and
    arrival-model choice.

    Gaps come from one ``lag`` window (ONE shuffle on ``keys``, the
    boundary never leaks across entities), the stats from one hash
    aggregate sharing the partitioning.  NULL cv/burstiness below 2
    gaps or at zero spread (constant cadence is B = -1 only in the
    limit; an exactly-two-equal-gaps entity has cv = 0 -> B = -1,
    which IS emitted — the NULL is for < 2 gaps where stddev_samp is
    undefined).

    Returns keys + ``n_gaps``, ``mean_gap_s``, ``cv``,
    ``burstiness``."""
    from pyspark.sql import Window

    order = list(order_cols) if order_cols else [ts_col]
    seq = Window.partitionBy(*keys).orderBy(*order)
    carry = list(dict.fromkeys([*keys, *order]))  # keep the sort inputs
    gaps = (
        df.select(*carry, F.col(ts_col).cast("double").alias("__t"))
        .withColumn("__gap", F.col("__t") - F.lag("__t").over(seq))
        .filter(F.col("__gap").isNotNull())
    )
    agg = gaps.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.avg("__gap").alias("__m"),
        F.stddev_samp("__gap").alias("__s"),
    )
    ok = (F.col("n_gaps") >= 2) & F.col("__s").isNotNull() & (F.col("__m") > 0)
    cv = F.when(ok, F.col("__s") / F.col("__m"))
    return agg.select(
        *[F.col(k) for k in keys],
        "n_gaps",
        F.round("__m", round_dp).alias("mean_gap_s"),
        F.round(cv, round_dp).alias("cv"),
        # + 0.0: cv exactly 1 reaches round() as ±eps — normalize
        # IEEE negative zero for the value gate
        (F.round(F.when(ok, (cv - 1) / (cv + 1)), round_dp) + 0.0).alias(
            "burstiness"
        ),
    )
