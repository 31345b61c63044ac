"""Sampling operators (SURVEY.md §2b extensions for pipeline tooling).

``hash_sample`` is the 100-TB workhorse: a DETERMINISTIC sample keyed on
a stable column hash.  Unlike ``df.sample`` it is reproducible across
runs, engines, partitionings and retries (Spark's sample is seeded per
partition — adding an executor changes the sample), it never needs a
second pass, and the same key always lands on the same side, so samples
taken on different tables stay join-consistent on the key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # first 8 hex chars of md5


def _hash_prefix(key_col: str, salt: str) -> F.Column:
    """THE hash expression of this module — the first 8 hex chars of
    ``md5(salt || key)``.  Every sampler/splitter and every ``*_sql``
    twin must stay in lockstep with this exact expression; keep it in
    one place (review-caught duplication: it existed at four sites)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose ``md5(salt || key)`` prefix falls below
    ``fraction`` of the 32-bit hex space.  Lowercase-hex string
    comparison IS numeric comparison (same-width hex sorts
    lexicographically), so the exact predicate is portable to any
    engine with md5 — including the DuckDB oracle.  Vary ``salt`` to
    draw independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # format(16**8, '08x') is 9 chars; an 8-char prefix compared
        # against it lexicographically would keep only ~6% of rows.
        return df
    threshold = format(int(fraction * _HEX_SPACE), "08x")
    return df.filter(_hash_prefix(key_col, salt) < F.lit(threshold))


def hash_sample_sql(key_col: str, fraction: float, salt: str = "") -> str:
    """The equivalent ANSI-SQL predicate (oracle parity helper)."""
    if fraction >= 1.0:
        return "1 = 1"
    threshold = format(int(fraction * _HEX_SPACE), "08x")
    return f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < '{threshold}'"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling via ``sampleBy`` (seeded, one pass).
    Reproducible only for a fixed partitioning — for cross-run
    reproducibility at scale prefer :func:`stratified_hash_sample`."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum fraction applied
    via the :func:`hash_sample` md5 predicate (one pass, no shuffle,
    reproducible across runs/engines/partitionings).  Strata absent
    from ``fractions`` are dropped, matching ``sampleBy``."""
    for frac in fractions.values():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {frac}")
    prefix = _hash_prefix(key_col, salt)
    threshold = None
    for stratum, frac in fractions.items():
        hexcap = F.lit("g" if frac >= 1.0 else format(int(frac * _HEX_SPACE), "08x"))
        branch = F.when(F.col(strata_col) == stratum, hexcap)
        threshold = branch if threshold is None else threshold.when(F.col(strata_col) == stratum, hexcap)
    return df.filter(prefix < threshold)


def stratified_hash_sample_sql(
    strata_col: str, key_col: str, fractions: dict, salt: str = ""
) -> str:
    """The equivalent ANSI-SQL predicate (oracle parity helper)."""
    cases = " ".join(
        f"WHEN '{s}' THEN '{'g' if f >= 1.0 else format(int(f * _HEX_SPACE), '08x')}'"
        for s, f in fractions.items()
    )
    return (
        f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < "
        f"CASE {strata_col} {cases} END"
    )


def dataset_splits(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    label whose cumulative md5-hash band its key falls into — the same
    predicate family as :func:`hash_sample`, so splits are reproducible
    across runs/engines/partitionings/retries, mutually exclusive and
    exhaustive, join-consistent on the key (the same document lands in
    the same split in every derived table), and SQL-portable for the
    oracle.  One narrow projection — no shuffle, no second pass.

    ``weights`` maps label -> fraction; fractions must sum to 1 (bands
    are laid out in the given insertion order; the last band absorbs the
    rounding remainder of the hex space).
    """
    bounds, last = _split_bounds(weights)
    return df.withColumn(
        out_col, _band_expr(_hash_prefix(key_col, salt), bounds, last)
    )


def _band_expr(prefix: F.Column, bounds, last: str) -> F.Column:
    """Nested first-match-wins band CASE over cumulative hex bounds —
    nested from the LAST band outward so the smallest bound is tested
    first, exactly SQL CASE's semantics (shared by the flat and
    stratified splitters; the SQL twins mirror it via ``_split_bounds``)."""
    expr = F.lit(last)  # last band absorbs the hex-space remainder
    for label, bound in reversed(bounds):
        expr = F.when(prefix < F.lit(bound), F.lit(label)).otherwise(expr)
    return expr


def _split_bounds(weights: dict[str, float]) -> tuple[list[tuple[str, str]], str]:
    """Validate split weights and lay out cumulative hex-band bounds —
    the SINGLE source of truth for :func:`dataset_splits` and
    :func:`dataset_splits_sql` (the two must never diverge: one labels
    Spark rows, the other is the oracle)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"split weights must be positive, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    labels = list(weights)
    cum = 0.0
    bounds = []
    for label in labels[:-1]:
        cum += weights[label]
        bounds.append((label, format(int(cum * _HEX_SPACE), "08x")))
    return bounds, labels[-1]


def dataset_splits_sql(key_col: str, weights: dict[str, float], salt: str = "") -> str:
    """The equivalent ANSI-SQL expression (oracle parity helper); same
    validation as :func:`dataset_splits`.  A single-label split emits a
    bare literal (``CASE`` with zero WHEN clauses is invalid SQL)."""
    bounds, last = _split_bounds(weights)
    if not bounds:
        return f"'{last}'"
    cases = [
        f"WHEN substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < '{bound}' THEN '{label}'"
        for label, bound in bounds
    ]
    return "CASE " + " ".join(cases) + f" ELSE '{last}' END"


def dataset_splits_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, dict[str, float]],
    default: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Per-stratum train/val/test assignment: each stratum (e.g. a
    ``source`` or language) carries its OWN split proportions — the
    dataset-card counterpart of ``corpus_mix_summary`` (hold out more of
    a scarce high-quality source, less of bulk crawl).  The hash band is
    computed ONCE per key (``md5(salt || key)``, same family as
    :func:`dataset_splits`), so assignment stays deterministic across
    runs/engines/partitionings/retries and join-consistent on the key;
    only the band LAYOUT varies by stratum.  Within every stratum the
    labels are mutually exclusive and exhaustive (property-tested).

    ``weights`` maps stratum value -> label->fraction dict (each
    validated by the same ``_split_bounds`` the SQL twin uses).  Rows
    whose stratum is not listed get the ``default`` layout, or a NULL
    split when ``default`` is None — NULL, not a guess, so an
    unexpected new source surfaces in the audit instead of silently
    polluting train.  Still one narrow projection: no shuffle, no
    second pass, plan cost O(strata x labels) literals.
    """
    layouts = {s: _split_bounds(w) for s, w in weights.items()}
    hash_col = f"__{out_col}_hash"

    if default is not None:
        out = _band_expr(F.col(hash_col), *_split_bounds(default))
    else:
        out = F.lit(None).cast("string")
    for stratum, (bounds, last) in reversed(list(layouts.items())):
        out = F.when(
            F.col(strata_col) == F.lit(stratum),
            _band_expr(F.col(hash_col), bounds, last),
        ).otherwise(out)
    # The hash rides as a materialized column (not inlined per WHEN arm)
    # so the expression tree stays O(strata x labels), not O(strata x
    # labels x md5-subtree) — the HOF-blowup lesson applied to CASE.
    return (
        df.withColumn(hash_col, _hash_prefix(key_col, salt))
        .withColumn(out_col, out)
        .drop(hash_col)
    )


def dataset_splits_stratified_sql(
    key_col: str,
    strata_col: str,
    weights: dict[str, dict[str, float]],
    default: dict[str, float] | None = None,
    salt: str = "",
) -> str:
    """ANSI-SQL twin of :func:`dataset_splits_stratified` (oracle parity
    helper): a stratum CASE whose arms are the per-stratum band CASEs
    from :func:`dataset_splits_sql` — identical ``_split_bounds`` layout,
    so the two can never diverge.  No ELSE when ``default`` is None
    (SQL CASE then yields NULL, matching the Spark side).  Degenerate
    cases mirror the Spark side too: zero strata emits the bare default
    expression (or NULL) — ``CASE END`` with no arms is invalid SQL —
    and stratum values have their single quotes doubled."""
    arms = [
        f"WHEN {strata_col} = '{s.replace(chr(39), chr(39) * 2)}' "
        f"THEN {dataset_splits_sql(key_col, w, salt)}"
        for s, w in weights.items()
    ]
    default_sql = (
        dataset_splits_sql(key_col, default, salt) if default is not None else None
    )
    if not arms:
        return default_sql if default_sql is not None else "CAST(NULL AS VARCHAR)"
    tail = f" ELSE {default_sql}" if default_sql is not None else ""
    return "CASE " + " ".join(arms) + tail + " END"


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    tau: float,
    target_rows: int,
    size_col: str | None = None,
) -> DataFrame:
    """Per-stratum sampling fractions for a temperature-weighted corpus
    mix (the multilingual/multi-source pretraining resampling rule):
    stratum weight w_s = size_s^tau / sum(size_t^tau), where size is the
    row count (or ``sum(size_col)`` — e.g. token mass — when given), and
    the expected sample from stratum s is ``target_rows * w_s`` rows.
    tau = 1 keeps natural proportions, tau = 0 is uniform over strata,
    between the two it up-weights the tail — the standard knob.

    Fully distributed: one aggregate per stratum, a one-row total
    broadcast back — no driver-side collect, any number of strata.
    Fractions are rounded to 6 dp (and capped at 1) so the downstream
    md5 threshold is bit-identical in every engine, including the SQL
    oracle twin."""
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    size = F.count("*") if size_col is None else F.sum(size_col)
    counts = df.groupBy(strata_col).agg(
        F.count("*").cast("bigint").alias("n_rows"), size.cast("double").alias("_size")
    )
    total = counts.agg(F.sum(F.pow("_size", F.lit(tau))).alias("_wtot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "fraction",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_rows))
                    * F.pow("_size", F.lit(tau))
                    / F.col("_wtot")
                    / F.col("n_rows"),
                ),
                6,
            ),
        )
        .select(strata_col, "n_rows", "fraction")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    tau: float,
    target_rows: int,
    size_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-resampled corpus: each stratum keeps
    the :func:`hash_sample` md5 band sized by its
    :func:`temperature_fractions` fraction.  The fraction table is a
    tiny per-stratum aggregate broadcast back onto the corpus — the
    whole selection is one scan + one broadcast join, reproducible
    across runs/engines/partitionings, no driver-side fraction dict."""
    fr = temperature_fractions(df, strata_col, tau, target_rows, size_col).select(
        F.col(strata_col).alias("_frs"), "fraction"
    )
    threshold = F.when(F.col("fraction") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("fraction") * _HEX_SPACE).cast("bigint"))),
            8,
            "0",
        )
    )
    joined = df.join(F.broadcast(fr), F.col(strata_col) == F.col("_frs"), "inner")
    return (
        joined.filter(_hash_prefix(key_col, salt) < threshold)
        .drop("_frs")
    )


def temperature_fractions_sql(
    strata_col: str,
    tau: float,
    target_rows: int,
    size_col: str | None = None,
    table: str = "documents",
) -> str:
    """ANSI-SQL twin of :func:`temperature_fractions` as a CTE body
    (oracle parity helper): yields ``(strata, n_rows, fraction)`` with
    the identical pow/round/cap arithmetic."""
    size = "COUNT(*)" if size_col is None else f"SUM({size_col})"
    return f"""
    SELECT {strata_col},
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(LEAST(1.0,
                 {float(target_rows)} * pow(CAST({size} AS DOUBLE), {tau})
                 / SUM(pow(CAST({size} AS DOUBLE), {tau})) OVER ()
                 / COUNT(*)), 6) AS fraction
    FROM {table} GROUP BY {strata_col}
    """


def _sql_str(value: str) -> str:
    """Escape a caller-supplied string for embedding as a SQL literal —
    the salt is config, not data, but a quote in it must not break (or
    inject into) the generated oracle SQL (same class of issue as the
    learned-BPE-pair fix, commit 5c0a775)."""
    return value.replace("'", "''")


def temperature_sample_sql_predicate(key_col: str, salt: str = "") -> str:
    """The md5-band membership predicate against a joined ``fraction``
    column (SQL twin of the :func:`temperature_sample` filter)."""
    salt = _sql_str(salt)
    return (
        f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8) < "
        "CASE WHEN fraction >= 1.0 THEN 'g' "
        f"ELSE lpad(lower(hex(CAST(floor(fraction * {_HEX_SPACE}) AS BIGINT))), 8, '0') END"
    )


def _aes_key(key_col: str, weight_expr: F.Column, salt: str) -> F.Column:
    """The Efraimidis–Spirakis A-ES priority: ``ln(u) / w`` with ``u``
    the deterministic md5-uniform of the key — monotone-equivalent to
    the paper's ``u^(1/w)`` (ln is increasing, w > 0), numerically
    tamer, and exactly portable to any engine with md5/ln.  ``u`` is
    ``(h + 0.5) / 2^32`` over the 8-hex hash prefix — never 0 or 1.
    Rounded to 6dp (engine convention) so cross-engine libm noise in
    ``ln``/division cannot flip an ordering; ties break on the key
    column downstream.

    ``weight_expr`` should be PRE-NORMALIZED to (0, 1] (divide by the
    per-group max): raw large weights (w >~ 1e4) compress every
    priority into a sub-1e-4 interval near 0, where the 6dp round
    creates mass ties that resolve via the key-ascending tie-break —
    degrading the 'weighted' sample toward deterministic smallest-key
    selection.  Scaling all weights in a draw by a positive constant
    leaves A-ES inclusion probabilities unchanged (priorities scale by
    1/c, a monotone map), so normalization is semantics-preserving and
    only widens the pre-round dynamic range."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8), 16, 10).cast("double")
        + 0.5
    ) / float(_HEX_SPACE)
    return F.round(F.log(u) / weight_expr, 6)


def weighted_sample_topn(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    group_cols: list[str] | None = None,
    salt: str = "aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES): keep the ``n`` rows with the largest ``u^(1/w)``
    priorities (computed as ``ln(u)/w``) per group — each row's
    inclusion probability is proportional to its weight, exactly the
    one-pass distributed formulation (the classic reservoir algorithm
    is sequential; A-ES turns it into a per-row score + top-n, which
    Spark executes as a map + TakeOrdered/per-group window with NO
    global sort and no driver state).

    Deterministic end-to-end: the randomness is the md5 hash of the
    key, so the sample is reproducible across runs/partitionings/
    engines (vary ``salt`` for independent draws) and SQL-twinnable
    for the oracle.  Rows with NULL or non-positive weight are
    EXCLUDED (zero-weight rows have inclusion probability 0; negative
    weights are undefined).

    The training-pipeline use: token-budget-proportional document
    sampling (weight = doc length) or quality-weighted corpus
    subsetting at 100 TB — one scan, one bounded top-n per group.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    positive = df.filter(F.col(weight_col).cast("double") > 0)
    # Normalize weights to (0, 1] by the per-draw max BEFORE the
    # priority: raw large weights compress priorities into a sub-1e-4
    # band where the 6dp round mass-ties (see _aes_key).  Per-group max
    # rides the same hash partitioning the top-n window needs (no extra
    # shuffle); the global max is a one-row broadcast.
    w = F.col(weight_col).cast("double")
    if group_cols:
        from pyspark.sql import Window

        wmax = F.max(w).over(Window.partitionBy(*group_cols))
        scored = positive.withColumn(
            "__aes", _aes_key(key_col, w / wmax, salt)
        )
    else:
        gmax = positive.agg(F.max(w).alias("__wmax"))
        scored = positive.crossJoin(F.broadcast(gmax)).withColumn(
            "__aes", _aes_key(key_col, w / F.col("__wmax"), salt)
        ).drop("__wmax")
    order = [F.col("__aes").desc(), F.col(key_col).asc()]
    if group_cols:
        from .windows import top_k_per_group

        picked = top_k_per_group(scored, group_cols, order, n)
    else:
        # Global draw: sort+limit compiles to TakeOrderedAndProject —
        # per-partition top-n merged at the driver, never the empty-
        # partition window's single-task global sort.
        picked = scored.orderBy(*order).limit(n)
    return picked.drop("__aes")


def weighted_sample_key_sql(key_col: str, weight_expr: str, salt: str = "aes") -> str:
    """DuckDB twin of :func:`_aes_key` (oracle parity helper).

    ``weight_expr`` must match the engine's normalized weight — e.g.
    ``"CAST(w AS DOUBLE) / MAX(CAST(w AS DOUBLE)) OVER (PARTITION BY g)"``
    computed in an enclosing subquery — so the 6dp-rounded priorities
    agree bit-for-bit across engines."""
    salt = _sql_str(salt)
    return (
        f"round(ln((('0x' || substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8))::BIGINT + 0.5)"
        f" / {float(_HEX_SPACE)}) / ({weight_expr}), 6)"
    )


def budget_select(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    budgets: dict[str, int] | int,
    salt: str = "",
    bucket_chars: int = 1,
    spent: DataFrame | None = None,
) -> DataFrame:
    """Token-budget corpus selection (§2b-K training-pipeline): per
    group, keep the DETERMINISTIC hash-ordered prefix of rows whose
    inclusive running ``size_col`` total stays within the group's
    budget — "take 50B tokens from source A, 30B from B" as one
    reproducible operator.  Order is ``md5(salt || key)`` (ties broken
    by the key), the same hash family as every sampler/splitter here,
    so the selected set is stable across runs/engines/partitionings
    and SQL-portable for the oracle.

    Scale shape — the naive form is one global window per group
    (PARTITION BY group ORDER BY hash), which funnels each group
    through ONE task; a 100 TB source would serialize.  Instead the
    same two-phase prefix-sum the sequence packer uses: rows bucket by
    the first ``bucket_chars`` hex chars of their order hash (the
    bucket is a PREFIX of the order key, so bucket-major order == hash
    order), phase 1 aggregates per-(group, bucket) size totals — a
    groups x 16^bucket_chars frame, KBs — and window-cumsums the
    bucket OFFSETS on that tiny frame; phase 2 broadcast-joins the
    offsets back and runs the row-level cumsum per (group, bucket) —
    16^bucket_chars-way parallel per group.  Raise ``bucket_chars``
    with corpus size (2 -> 256-way, 3 -> 4096-way).

    ``budgets``: int (every group gets the same budget) or a
    group -> budget dict — groups absent from the dict are excluded
    (a NULL budget selects nothing).  ``size_col`` values must be
    POSITIVE (they are char/token counts): bucket-level pruning drops
    whole buckets whose offset already meets the budget, which is only
    sound when every row strictly increases the running total.
    ``spent``: optional already-consumed totals — a small
    ``(group_col, __spent)`` frame broadcast-joined in so the
    effective budget is ``budget - spent`` (how the streaming gate
    charges earlier batches against each group's budget).
    Returns the selected rows plus ``__cum`` (the group-level
    inclusive running total, NOT counting ``spent``) for auditing;
    callers drop it when not wanted."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    tagged = df.withColumn("__h", h).withColumn(
        "__b", F.substring(F.col("__h"), 1, bucket_chars)
    )
    totals = tagged.groupBy(group_col, "__b").agg(F.sum(size_col).alias("__bsum"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).cast("long")
    ).select(group_col, "__b", "__off")
    if isinstance(budgets, dict):
        pairs: list = []
        for g, b in budgets.items():
            pairs.extend([F.lit(g), F.lit(int(b))])
        budget = F.element_at(F.create_map(*pairs), F.col(group_col))
    else:
        budget = F.lit(int(budgets))
    if spent is not None:
        tagged = tagged.join(
            F.broadcast(spent.select(group_col, "__spent")), group_col, "left"
        )
        budget = budget - F.coalesce(F.col("__spent"), F.lit(0)).cast("long")
    w_row = (
        Window.partitionBy(group_col, "__b")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.join(F.broadcast(offsets), [group_col, "__b"])
        # Bucket-level pruning BEFORE the row-level exchange: a bucket
        # whose offset already meets the budget can never contribute
        # (cum = offset + positive running sum > budget for its every
        # row), so those rows are dropped map-side and only the prefix
        # buckets shuffle into the window — with budget << corpus that
        # is 1-2 buckets instead of 16^bucket_chars.  (A NULL budget —
        # group absent from the dict — fails this predicate too.)
        .filter(F.col("__off") < budget)
        .withColumn(
            "__cum", (F.col("__off") + F.sum(size_col).over(w_row)).cast("long")
        )
        .filter(F.col("__cum") <= budget)
        .drop("__h", "__b", "__off", "__spent")
    )


def budget_select_sql(
    table: str,
    group_col: str,
    key_col: str,
    size_col: str,
    budget: int,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`budget_select` with a uniform budget
    (oracle parity helper): the bucketed two-phase engine cumsum
    collapses to one global window because the bucket is a prefix of
    the order hash."""
    salt = _sql_str(salt)
    return f"""
    SELECT * FROM (
      SELECT *,
             CAST(SUM({size_col}) OVER (
               PARTITION BY {group_col}
               ORDER BY md5('{salt}' || CAST({key_col} AS VARCHAR)), {key_col}
             ) AS BIGINT) AS __cum
      FROM {table})
    WHERE __cum <= {int(budget)}
    """


# ---------------------------------------------------------------------
# Poisson bootstrap (deterministic, engine-portable)
# ---------------------------------------------------------------------

# Cumulative P(X <= k) for Poisson(lambda=1), k = 0..7; replicate
# weights cap at 8 (P(X > 7) ~ 1e-5).  Module-level so the Column
# builder and the SQL twin are generated from the SAME doubles — a
# constant drifting between them would silently break oracle parity.
_POISSON1_CUM: list[float] = []
_acc, _fact = 0.0, 1.0
for _k in range(8):
    if _k:
        _fact *= _k
    _acc += math.exp(-1.0) / _fact
    _POISSON1_CUM.append(_acc)
del _acc, _fact, _k


def _bootstrap_u(key_col: str, rep_col: str, salt: str) -> F.Column:
    """Per-(row, replicate) uniform in (0, 1): the md5-uniform of
    ``salt || key || ':' || replicate`` — same construction as
    :func:`_aes_key`'s, with the replicate index in the hash input so
    the B draws per row are independent."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt),
                    F.col(key_col).cast("string"),
                    F.lit(":"),
                    F.col(rep_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    return (h + 0.5) / float(_HEX_SPACE)


def _poisson1(u: F.Column) -> F.Column:
    """Inverse-CDF Poisson(1) from a uniform — the bootstrap replicate
    weight.  A CASE chain over 8 fixed double thresholds: both engines
    compare the SAME binary64 literals against the SAME derived u, so
    the branch (and therefore the weight) can never differ."""
    expr = F.when(u < F.lit(_POISSON1_CUM[0]), 0)
    for k in range(1, len(_POISSON1_CUM)):
        expr = expr.when(u < F.lit(_POISSON1_CUM[k]), k)
    return expr.otherwise(len(_POISSON1_CUM))


def bootstrap_mean_ci(
    df: DataFrame,
    keys: list[str],
    key_col: str,
    value_col: str,
    n_boot: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    salt: str = "boot",
    round_dp: int = 6,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    POISSON bootstrap (§2b-D inference family) — the resampling scheme
    that actually distributes: classic with-replacement resampling
    needs the group materialized; weighting each row by an independent
    Poisson(1) count per replicate is its standard large-n equivalent
    (each row appears 0,1,2,... times) and stays one pass + aggregates.

    Deterministic end-to-end: the Poisson draw is inverse-CDF over the
    md5-uniform of (key, replicate), so the same input produces the
    same CI on every run/partitioning/engine — which is what lets a
    RESAMPLING operator be value-hash-gated at all.

    Plan: a row-local ``explode(sequence(0, B-1))`` fans each row to B
    replicates (narrow — no shuffle), ONE hash aggregate computes the
    per-(group, replicate) weighted mean, a second per-group aggregate
    takes exact interpolated percentiles over the B replicate means
    (bounded: B values per group), and the plain mean/count joins from
    a third aggregate on the unexploded input.  Replicate means round
    to ``round_dp`` BEFORE the percentile so both engines interpolate
    identical inputs.  Replicates whose total weight is 0 (possible
    only for tiny groups) are dropped, not averaged as NULL.

    Returns keys + ``n``, ``mean``, ``ci_lo``, ``ci_hi``,
    ``n_boot_effective``."""
    from .partitioning import spread

    # The B-fold explode multiplies per-row work (one md5 + inverse-CDF
    # CASE per (row, replicate)); spread the pre-explode input so a
    # narrow scan does not serialize the whole fan-out on one task
    # (measured 19.1s -> 4.0s at sf0.1/B=100 on the single-file corpus).
    reps = spread(df.select(*keys, key_col, value_col)).withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1)))
    )
    w = _poisson1(_bootstrap_u(key_col, "__r", salt)).cast("double")
    per_rep = (
        reps.groupBy(*keys, "__r")
        .agg(
            F.sum(w * F.col(value_col)).alias("__ws"),
            F.sum(w).alias("__w"),
        )
        .filter(F.col("__w") > 0)
        .select(
            *keys,
            F.round(F.col("__ws") / F.col("__w"), round_dp).alias("__m"),
        )
    )
    ci = per_rep.groupBy(*keys).agg(
        F.round(F.percentile("__m", float(lo)), round_dp).alias("ci_lo"),
        F.round(F.percentile("__m", float(hi)), round_dp).alias("ci_hi"),
        F.count("*").alias("n_boot_effective"),
    )
    point = df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.round(F.avg(value_col), round_dp).alias("mean"),
    )
    return point.join(ci, keys).select(
        *keys, "n", "mean", "ci_lo", "ci_hi", "n_boot_effective"
    )


def bootstrap_weight_sql(key_col: str, rep_col: str, salt: str = "boot") -> str:
    """DuckDB twin of the Poisson(1) replicate weight (oracle parity
    helper): the identical md5-uniform + the identical CASE thresholds,
    formatted from the SAME module constants."""
    salt = _sql_str(salt)
    u = (
        f"((('0x' || substr(md5('{salt}' || CAST({key_col} AS VARCHAR) || ':' || "
        f"CAST({rep_col} AS VARCHAR)), 1, 8))::BIGINT + 0.5) / {float(_HEX_SPACE)!r})"
    )
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CUM)
    )
    return f"(CASE {branches} ELSE {len(_POISSON1_CUM)} END)"


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    salt: str = "shuffle",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic per-epoch global shuffle rank (§2b-K training
    pipeline — the data-order half of reproducible training: the
    examples a run saw, in the order it saw them, recoverable from
    (salt, epoch) alone; epoch N+1 is a fresh independent permutation
    without re-materializing the corpus).  Order is ``md5(salt ||
    '-e' || epoch || ':' || key)`` with key ties broken by the key —
    the same hash family as every sampler/splitter here, so the
    permutation is stable across runs/engines/partitionings and
    SQL-portable for the oracle.

    Scale shape — :func:`budget_select`'s two-phase prefix sum applied
    to COUNTS: a naive global rank is one ORDER BY over the corpus
    (single-task sort at 100 TB).  Instead rows bucket by the first
    ``bucket_chars`` hex chars of the order hash (the bucket is a
    PREFIX of the order key, so bucket-major order == hash order),
    phase 1 counts per bucket and cumsums bucket OFFSETS on the
    16^bucket_chars-row frame, phase 2 broadcast-joins offsets back
    and ranks within buckets — 16^bucket_chars-way parallel.  A
    trainer reading shards in ``(bucket, within-bucket order)``
    replays the exact global permutation with no global sort ever
    executed.  Returns ``(df.*, shuffle_rank)``, ranks 1..n dense."""
    from pyspark.sql import Window

    h = F.md5(
        F.concat(
            F.lit(f"{salt}-e{int(epoch)}:"), F.col(key_col).cast("string")
        )
    )
    tagged = df.withColumn("__h", h).withColumn(
        "__b", F.substring(F.col("__h"), 1, bucket_chars)
    )
    counts = tagged.groupBy("__b").agg(F.count("*").alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).cast("long")
    ).select("__b", "__off")
    w_in = Window.partitionBy("__b").orderBy("__h", key_col)
    return (
        tagged.join(F.broadcast(offsets), "__b")
        .withColumn(
            "shuffle_rank", (F.col("__off") + F.row_number().over(w_in)).cast("long")
        )
        .drop("__h", "__b", "__off")
    )
