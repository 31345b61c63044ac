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


def welch_ttest(
    df: DataFrame,
    keys: Sequence[str],
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key Welch two-sample t-test (§2b-D inference family): for
    each ``keys`` group, compare ``value_col`` between the ``group_a``
    and ``group_b`` populations of ``group_col`` — the A/B-experiment
    readout (unequal variances, unequal n; Student's pooled test is the
    special case nobody's data satisfies).

    Everything is conditional aggregation inside ONE hash aggregate
    (partial + final): per-arm n/mean/sample-variance via ``when``
    filters, then the t statistic ``(m_a - m_b) / sqrt(v_a/n_a +
    v_b/n_b)`` and the Welch–Satterthwaite degrees of freedom as
    post-aggregate scalar arithmetic.  No join, no window, no second
    pass — the 100-TB shape for "t-test every experiment cell".

    The p-value needs the incomplete beta function (not in either SQL
    engine); downstream compares |t| against the fixed critical value
    for its df — ``abs_t_above_2`` ships as the conventional quick
    read.  NULL t/df when either arm has n < 2 or both spreads are 0
    (no evidence, not a 0).  Outputs round to ``round_dp``: the two
    engines accumulate variance partials in different orders, so
    last-ulp float divergence is expected and rounded away."""
    v = F.col(value_col)
    in_a = F.when(F.col(group_col) == group_a, v)
    in_b = F.when(F.col(group_col) == group_b, v)
    agg = df.groupBy(*keys).agg(
        F.count(in_a).alias("n_a"),
        F.count(in_b).alias("n_b"),
        F.avg(in_a).alias("__ma"),
        F.avg(in_b).alias("__mb"),
        F.var_samp(in_a).alias("__va"),
        F.var_samp(in_b).alias("__vb"),
    )
    se_a = F.col("__va") / F.col("n_a")
    se_b = F.col("__vb") / F.col("n_b")
    ok = (
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & ((se_a + se_b) > 0)
    )
    t = F.when(ok, (F.col("__ma") - F.col("__mb")) / F.sqrt(se_a + se_b))
    dof = F.when(
        ok,
        F.pow(se_a + se_b, 2)
        / (
            F.pow(se_a, 2) / (F.col("n_a") - 1)
            + F.pow(se_b, 2) / (F.col("n_b") - 1)
        ),
    )
    return agg.select(
        *[F.col(c) for c in keys],
        "n_a",
        "n_b",
        F.round("__ma", round_dp).alias("mean_a"),
        F.round("__mb", round_dp).alias("mean_b"),
        # + 0.0: an exactly-zero t reaches round() as ±eps — normalize
        # IEEE negative zero for the value gate
        (F.round(t, round_dp) + 0.0).alias("t_stat"),
        F.round(dof, round_dp).alias("df_welch"),
        F.when(ok, F.abs(t) > 2.0).alias("abs_t_above_2"),
    )


def chi_squared_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns (§2b-D inference family) plus Cramér's V effect size — the
    "is this feature actually associated with that label" screen run
    before any stratification/mix decision.

    Plan: ONE hash aggregate builds the R×C contingency cells; the
    marginals and grand total are window sums over the CELLS frame
    (R×C rows — like the Zipf rank window, the documented exception to
    the no-global-window rule: the window input is categorical-sized,
    never the fact table), and the statistic is one final single-row
    aggregate.  Expected counts ``row_total * col_total / n`` use
    exact BIGINT products cast late, so both engines divide the same
    integers.

    Returns ONE row: ``chi2``, ``dof``, ``n``, ``n_rows_a`` (R),
    ``n_cols_b`` (C), ``cramers_v``.  NULL chi2/V when any marginal is
    degenerate (R < 2 or C < 2)."""
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("o"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    with_m = cells.select(
        "a",
        "b",
        "o",
        F.sum("o").over(wa).alias("row_t"),
        F.sum("o").over(wb).alias("col_t"),
        F.sum("o").over(wall).alias("n"),
    )
    e = (F.col("row_t") * F.col("col_t")).cast("double") / F.col("n")
    contrib = F.pow(F.col("o") - e, 2) / e
    # size(collect_set) instead of countDistinct: two countDistincts in
    # one aggregate trigger Catalyst's distinct-rewrite Expand, whose
    # branch order follows per-session expression IDs — a semantically
    # identical but permuted plan every JVM (the orders_profile lesson,
    # plan_snapshots.py) — and the input here is the R×C cells frame,
    # so the sets are categorical-bounded.
    out = with_m.agg(
        F.sum(contrib).alias("__chi2"),
        F.first("n").alias("n"),
        F.size(F.collect_set("a")).alias("n_rows_a"),
        F.size(F.collect_set("b")).alias("n_cols_b"),
    )
    r1 = F.col("n_rows_a") - 1
    c1 = F.col("n_cols_b") - 1
    ok = (r1 >= 1) & (c1 >= 1)
    return out.select(
        F.round(F.when(ok, F.col("__chi2")), round_dp).alias("chi2"),
        F.when(ok, r1 * c1).cast("bigint").alias("dof"),
        F.col("n").cast("bigint").alias("n"),
        F.col("n_rows_a").cast("bigint").alias("n_rows_a"),
        F.col("n_cols_b").cast("bigint").alias("n_cols_b"),
        F.round(
            F.when(
                ok & (F.least(r1, c1) > 0),
                F.sqrt(F.col("__chi2") / (F.col("n") * F.least(r1, c1))),
            ),
            round_dp,
        ).alias("cramers_v"),
    )


def target_encode_kfold(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    salt: str = "folds",
    round_dp: int = 6,
) -> DataFrame:
    """K-fold leakage-safe target (mean) encoding (§2b-D feature
    family): each row's category encodes as the smoothed target mean
    computed WITHOUT the row's own fold — ``((tot_s - fold_s) + m *
    prior) / ((tot_c - fold_c) + m)`` — the standard guard against the
    label leaking into its own feature (naive mean encoding memorizes
    the training labels; K-fold exclusion is what competition pipelines
    and category_encoders ship).

    Deterministic end-to-end: the fold is the md5-uniform of the key
    mod ``k`` (portable to the SQL twin), never a random split.  The
    smoothing prior pulls thin categories toward the GLOBAL mean; a
    category entirely inside one fold encodes exactly to the prior
    (``smoothing`` must be > 0 — at 0 such a cell would divide by
    zero).

    Scale shape: ONE hash aggregate builds the |cats| x k cells;
    totals and the global prior are window sums over that CELLS frame
    (categorical-sized — the documented exception); the encoding joins
    back on (cat, fold) — AQE broadcasts the tiny cell frame.  The
    fact table is touched twice (cells + join-back), shuffled on the
    join only when the cell frame outgrows broadcast.

    Returns ``(key, cat, fold, te)``."""
    if smoothing <= 0:
        raise ValueError("target_encode_kfold: smoothing must be > 0")
    from pyspark.sql import Window

    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % int(k)
    )
    rows = df.select(
        F.col(key_col).alias("key"),
        F.col(cat_col).alias("cat"),
        F.col(target_col).alias("__y"),
        fold.alias("fold"),
    )
    cells = rows.groupBy("cat", "fold").agg(
        F.sum("__y").alias("__s"), F.count("*").alias("__c")
    )
    per_cat = Window.partitionBy("cat")
    whole = Window.partitionBy()
    m = float(smoothing)
    enc = cells.select(
        "cat",
        "fold",
        F.round(
            (
                (F.sum("__s").over(per_cat) - F.col("__s"))
                + m * (F.sum("__s").over(whole) / F.sum("__c").over(whole))
            )
            / ((F.sum("__c").over(per_cat) - F.col("__c")) + m),
            round_dp,
        ).alias("te"),
    )
    return rows.select("key", "cat", "fold").join(enc, ["cat", "fold"]).select(
        "key", "cat", "fold", "te"
    )


def quantile_normalize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Rank-based quantile normalization per group (§2b-D feature
    prep — the rank complement of the z-score/winsorize family:
    distribution-free, outlier-immune, the transform behind
    quantile-uniform feature scaling and rank-IC style metrics).
    Each distinct value maps to its tie-AVERAGED percentile midpoint
    ``q = (2*c_lt + c_eq) / (2n)`` — count-below plus half the tied
    mass, the midpoint convention that keeps q symmetric
    (q(v) + q(-v) = 1 on a sign-flipped distribution) and strictly
    inside (0, 1).

    Exactness is the design (the ``ks_two_sample`` cells shape): rows
    collapse to distinct-value CELLS in one hash aggregate, c_lt is a
    cumulative window over the cells, and q is ONE division of exact
    integers — no engine's aggregation order can move it.  Returns one
    row per (keys, value) cell: ``(keys..., v, n_ties, q)``.

    NULL values ABSTAIN (ADVICE r15, the ``ks_two_sample`` policy): a
    NULL has no rank — it would form its own cell whose position
    depends on the engine's NULL ordering (Spark windows sort NULLs
    FIRST, the SQL-twin convention LAST), silently shifting EVERY
    cell's q between engines.  Filtered before the aggregate, so n
    counts non-NULL rows only; count NULLs upstream if the gap
    matters."""
    from pyspark.sql import Window

    keys = list(keys)
    cells = (
        df.select(*keys, F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy(*keys, "v")
        .agg(F.count("*").alias("__ceq"))
    )
    w = Window.partitionBy(*keys).orderBy("v") if keys else Window.partitionBy().orderBy("v")
    wall = Window.partitionBy(*keys) if keys else Window.partitionBy()
    return cells.select(
        *keys,
        "v",
        F.col("__ceq").alias("n_ties"),
        F.round(
            (2 * (F.sum("__ceq").over(w) - F.col("__ceq")) + F.col("__ceq"))
            / (2.0 * F.sum("__ceq").over(wall)),
            round_dp,
        ).alias("q"),
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


def gini_coefficient(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Gini concentration (§2b-D inequality family): the
    Lorenz-curve complement to :func:`~...nation_revenue_hhi`'s HHI —
    0 = perfectly even, ->1 = one member holds everything ("is this
    nation's revenue carried by one customer?", "is one source
    dominating the corpus mix?").

    Uses the rank closed form ``G = 2 * sum(i * x_i) / (n * sum(x)) -
    (n + 1) / n`` over ascending-sorted values: ONE row_number window
    + ONE hash aggregate sharing the group partitioning.  Equal values
    may take their tied ranks in any order — swapping ranks between
    equal x leaves ``sum(i * x_i)`` unchanged, so no tiebreak column
    is needed for determinism (the rare window without one).  Defined
    for non-negative values; NULLs are excluded up front, an all-zero
    group yields NULL (no concentration to measure).

    Returns keys + ``n`` + ``gini``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("__x")
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, F.col(value_col).alias("__x"))
        .withColumn("__rk", F.row_number().over(w))
    )
    n = F.count("*")
    tot = F.sum("__x")
    g = F.when(
        tot > 0,
        2.0 * F.sum(F.col("__rk") * F.col("__x")) / (n * tot)
        - (n + 1.0) / n,
    )
    return ranked.groupBy(*keys).agg(
        n.cast("bigint").alias("n"), F.round(g, round_dp).alias("gini")
    )


def rank_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """AUC / Mann-Whitney U for a binary label against a numeric score
    (§2b-D inference family): ``AUC = P(score_pos > score_neg) + 0.5 *
    P(tie)`` — the threshold-free discrimination metric for any scorer
    (quality filter, classifier, fraud rule) computed WITHOUT sorting
    the fact table: rows collapse to DISTINCT-score cells (one hash
    aggregate), the tie-aware U statistic is one cumulative window
    over the CELLS frame — bounded by score granularity, not rows —
    and the final ratio is a one-row aggregate.

    ``U = sum_s pos(s) * (neg_below(s) + 0.5 * neg(s))``, the standard
    mid-rank treatment of ties.  Scores round to ``round_dp`` BEFORE
    cell-collapse so both engines build identical cells (and score
    granularity — hence the window's frame size — is explicit).

    Returns ONE row: ``n_pos``, ``n_neg``, ``u_stat``, ``auc`` (NULL
    when either class is empty)."""
    from pyspark.sql import Window

    s = F.round(F.col(score_col), round_dp)
    lab = F.col(label_col).cast("int")
    cells = df.select(s.alias("s"), lab.alias("y")).groupBy("s").agg(
        F.sum("y").alias("pos"),
        F.sum(1 - F.col("y")).alias("neg"),
    )
    below = (
        Window.partitionBy()
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = cells.withColumn(
        "__nb", F.coalesce(F.sum("neg").over(below), F.lit(0))
    )
    u = F.sum(F.col("pos") * (F.col("__nb") + 0.5 * F.col("neg")))
    out = staged.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        u.alias("__u"),
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return out.select(
        "n_pos",
        "n_neg",
        F.round(F.when(ok, F.col("__u")), round_dp).alias("u_stat"),
        F.round(
            F.when(ok, F.col("__u") / (F.col("n_pos") * F.col("n_neg"))),
            round_dp,
        ).alias("auc"),
    )


def spearman_rho(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation (§2b-D inference family):
    the monotone-association complement to Pearson ``corr`` — robust
    to outliers and nonlinearity ("does balance RANK track revenue
    RANK?").  Ties take AVERAGE ranks (the standard convention):
    ``r_avg(x) = n_less(x) + (n_eq(x) + 1) / 2`` — two UNORDERED
    window counts per column, so no tiebreak ordering can ever make
    the rank nondeterministic — then rho is Pearson ``corr`` of the
    two rank columns in ONE hash aggregate.

    All four count windows and the final aggregate share the ``keys``
    partitioning (one exchange).  Rows with a NULL on either side are
    excluded pairwise up front.  NULL rho for groups under 2 rows or
    with a constant side (zero rank variance) — both engines' ``corr``
    contract.

    Returns keys + ``n`` + ``rho``."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*keys, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    # avg rank = n_less + (n_eq + 1)/2 = n_le - (n_eq - 1)/2, where
    # n_le counts value <= x via a RANGE frame ENDING AT CURRENT ROW
    # (peers included — never a value-arithmetic offset, which would
    # be wrong for non-integer columns) and n_eq is an unordered count
    # over the (keys, value) partition
    def rank_col(col: str) -> F.Column:
        le = (
            Window.partitionBy(*keys)
            .orderBy(col)
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        eq = Window.partitionBy(*keys, col)
        n_le = F.count("*").over(le)
        n_eq = F.count("*").over(eq)
        return n_le - (n_eq - 1) / 2.0

    ranked = base.select(
        *keys,
        rank_col("__x").alias("__rx"),
        rank_col("__y").alias("__ry"),
    )
    # rho from guarded co-moments rather than corr(): under ANSI mode
    # Spark's corr DIVIDES BY ZERO on a constant side instead of
    # returning NULL; CASE-guarding the outer division restores the
    # SQL contract (DuckDB's corr returns NULL there)
    agg = ranked.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n"),
        F.covar_samp("__rx", "__ry").alias("__cv"),
        F.stddev_samp("__rx").alias("__sx"),
        F.stddev_samp("__ry").alias("__sy"),
    )
    rho = F.when(
        (F.col("__sx") > 0) & (F.col("__sy") > 0),
        F.col("__cv") / (F.col("__sx") * F.col("__sy")),
    )
    # + 0.0 normalizes IEEE negative zero: an exactly-zero rho reaches
    # round() as ±1e-17 depending on accumulation order, and -0.0
    # formats differently from 0.0 in the value gate's canonicalizer
    return agg.select(
        *[F.col(k) for k in keys],
        "n",
        (F.round(rho, round_dp) + 0.0).alias("rho"),
    )


def ks_two_sample(
    df: DataFrame,
    side_col,
    value_col: str,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (§2b-D inference /
    drift family — the nonparametric complement to
    ``population_stability``: PSI quantizes into deciles and can miss
    a shift INSIDE a bucket; KS is the exact sup-distance between the
    two empirical CDFs, sensitive everywhere).  ``side_col`` is a
    boolean Column/name splitting the rows into cohorts A (true) and
    B (false).

    Computed WITHOUT sorting the fact table (the ``rank_auc`` shape):
    rows collapse to DISTINCT-value cells in ONE hash aggregate, both
    CDFs are cumulative sums over the CELLS frame (bounded by value
    granularity, shared partitioning), and the sup is a one-row max.
    The D statistic is an exact rational (integer cumulative counts
    over integer totals — identical doubles in any engine); the output
    rounds with the portable ``floor(t + 0.5)`` rule.  ``d_at`` is the
    smallest value attaining the sup — the location of maximal drift,
    and the tiebreak that keeps an argmax hash-gateable.  Returns
    ``(keys..., n_a, n_b, d_stat, d_at)``; groups missing a whole
    cohort return NULL ``d_stat``.

    NULL policy (ADVICE r14): rows whose ``side_col`` evaluates NULL
    ABSTAIN — they join neither cohort.  The old ``~side`` encoding
    silently dropped them too (``F.when`` yields 0 for NULL on both
    arms) while the documented SQL twin's ``CASE ... ELSE 0`` counted
    them in cohort B; the filter makes the one policy explicit on both
    sides (the catalog oracle carries the matching ``IS NOT NULL``)."""
    from pyspark.sql import Window

    keys = list(keys or [])
    side = F.col(side_col) if isinstance(side_col, str) else side_col
    cells = (
        df.select(*keys, side.alias("__s"), F.col(value_col).alias("__v"))
        .filter(F.col("__s").isNotNull())
        .groupBy(*keys, "__v")
        .agg(
            F.sum(F.when(F.col("__s"), 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(~F.col("__s"), 1).otherwise(0)).alias("__cb"),
        )
    )
    w = Window.partitionBy(*keys).orderBy("__v") if keys else Window.partitionBy().orderBy("__v")
    wall = Window.partitionBy(*keys) if keys else Window.partitionBy()
    scored = cells.select(
        *keys,
        "__v",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
        F.sum("__ca").over(wall).alias("__na"),
        F.sum("__cb").over(wall).alias("__nb"),
    ).withColumn(
        "__d",
        F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0),
            F.abs(
                F.col("__cuma") / F.col("__na") - F.col("__cumb") / F.col("__nb")
            ),
        ),
    )
    scored = scored.withColumn("__dmax", F.max("__d").over(wall))
    return (
        scored.groupBy(*keys)
        .agg(
            F.max("__na").cast("bigint").alias("n_a"),
            F.max("__nb").cast("bigint").alias("n_b"),
            (F.floor(F.max("__d") * 1e6 + F.lit(0.5)) / 1e6).alias("d_stat"),
            F.min(F.when(F.col("__d") == F.col("__dmax"), F.col("__v"))).alias(
                "d_at"
            ),
        )
    )
