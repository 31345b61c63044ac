"""Pre-flight skew diagnostics for bucket-keyed joins (LSH banding,
inverted indexes, any equi-join key).

The dedup/similarity stack's quadratic hazard is always the same shape:
a bucket-keyed self-join where one hot bucket of size ``n`` emits
``n*(n-1)/2`` candidate pairs.  At 100 TB you do not discover that by
launching the join — you run these diagnostics on a deterministic hash
sample first (``operators/sampling.hash_sample``), read the pair mass,
and only then choose: proceed, cap (``max_shingle_df``), re-band
(smaller ``bucket_length`` / more bands), or salt.

Everything here is plain groupBy/agg — two shuffles on the bucket key,
no arrays, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucket_stats(
    df: DataFrame, bucket_cols: list[str], id_col: str = "id"
) -> DataFrame:
    """One-row summary of a bucket-key distribution.

    Returns ``(n_buckets, max_bucket, p99_bucket, total_rows,
    pair_mass)`` where ``pair_mass`` = sum over buckets of
    ``n*(n-1)/2`` — exactly the number of raw candidate pairs a
    self-join on ``bucket_cols`` will emit.  The go/no-go number for
    the candidate join: scaled up from a p-rate hash sample, a hot
    bucket's mass grows as ``1/p^2`` — divide by ``p^2`` to estimate
    the full-corpus mass.
    """
    sizes = df.groupBy(*bucket_cols).agg(F.count(id_col).alias("n"))
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        F.sum("n").alias("total_rows"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("pair_mass"),
    )


def bucket_histogram(
    df: DataFrame, bucket_cols: list[str], id_col: str = "id"
) -> DataFrame:
    """Bucket-SIZE histogram: ``(bucket_size, n_buckets, pair_mass)``
    ordered by size descending.  The long tail tells you whether skew
    is one viral key (cap/salt it) or a fat head (re-band)."""
    sizes = df.groupBy(*bucket_cols).agg(F.count(id_col).alias("bucket_size"))
    return (
        sizes.groupBy("bucket_size")
        .agg(
            F.count("*").alias("n_buckets"),
            (
                F.count("*")
                * F.col("bucket_size")
                * (F.col("bucket_size") - 1)
                / 2
            ).cast("long").alias("pair_mass"),
        )
        .orderBy(F.col("bucket_size").desc())
    )


def drop_hot_buckets(
    df: DataFrame, bucket_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Drop every row belonging to a bucket with more than
    ``max_bucket_size`` members — the shared guard behind the dedup
    stack's ``max_shingle_df`` / ``max_bucket_size`` knobs (a bucket of
    K members emits K^2/2 candidate pairs through a self-join).  Count
    over the same key the join shuffles on; size the cap from
    :func:`bucket_stats` first.  Recall trade documented at each call
    site."""
    from pyspark.sql import Window

    return (
        df.withColumn(
            "__bucket_n", F.count("*").over(Window.partitionBy(*bucket_cols))
        )
        .filter(F.col("__bucket_n") <= max_bucket_size)
        .drop("__bucket_n")
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """ONE-PASS column profile — the onboarding/data-quality describe
    every new table gets before it enters a pipeline: per column, row
    count, null count, distinct count, and min/max (numerics as rounded
    doubles, everything else via its canonical string form).

    Returns one row per profiled column:
    ``(column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)``.

    Scale shape: all K columns profile in a SINGLE aggregate over ONE
    scan — never K per-column queries (K scans of a 100-TB table).
    The trade lives in the distinct counts: ``exact_distinct=True``
    plans one Expand branch per column (K-way row multiplication before
    the partial aggregate — fine at test scale, wasteful at 100 TB);
    ``exact_distinct=False`` swaps in ``approx_count_distinct`` (HLL++,
    ``approx_rsd`` relative error), which computes in the same single
    pass with NO Expand — the production setting.  Min/max/null counts
    are plain partial aggregates either way (map-side combined, bytes
    per column per partition)."""
    from pyspark.sql.types import NumericType

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__nulls")
        )
        nd = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col, approx_rsd)
        )
        aggs.append(nd.cast("bigint").alias(f"{c}__nd"))
        if isinstance(df.schema[c].dataType, NumericType):
            aggs.append(F.round(F.min(col).cast("double"), 4).alias(f"{c}__minn"))
            aggs.append(F.round(F.max(col).cast("double"), 4).alias(f"{c}__maxn"))
        else:
            aggs.append(F.min(col.cast("string")).alias(f"{c}__mins"))
            aggs.append(F.max(col.cast("string")).alias(f"{c}__maxs"))
    one = df.agg(*aggs)

    def entry(c: str):
        numeric = isinstance(df.schema[c].dataType, NumericType)
        return F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__minn") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__maxn") if numeric else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__mins")).alias("min_str"),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__maxs")).alias("max_str"),
        )

    return one.select(
        F.col("__n").alias("n_rows"),
        F.explode(F.array(*[entry(c) for c in cols])).alias("p"),
    ).select(
        "p.column", "n_rows", "p.n_nulls", "p.n_distinct",
        "p.min_num", "p.max_num", "p.min_str", "p.max_str",
    )


def join_size_stats(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str] | None = None,
) -> DataFrame:
    """Pre-flight equi-join cardinality: the EXACT output row count and
    skew profile of ``left JOIN right`` on the given keys, computed from
    the two KEY HISTOGRAMS — never from the join itself.

    Returns one row: ``(join_rows, n_keys, max_key_rows, overflow,
    left_rows, right_rows)`` where ``join_rows = sum over matching keys
    of cntL(k) * cntR(k)`` and ``max_key_rows`` is the largest single
    key's contribution — the straggler-task predictor.  The products
    are computed in DECIMAL(38,0); totals beyond Long.MAX come back as
    NULL with ``overflow = true`` instead of silently wrapping.

    The go/no-go number before launching a 100-TB join: the histograms
    aggregate each side down to its distinct keys (map-side combined,
    two shuffles of |keys| rows), and their join touches distinct keys
    only — so a join that WOULD emit 10^13 rows (a fan-out key nobody
    spotted) costs a few seconds to detect instead of a cluster-day to
    discover.  Run it on a hash sample for even cheaper estimates: at
    sample rate p, multiply ``join_rows`` by ``1/p^2`` (both sides
    sampled) — same scaling law as ``bucket_stats.pair_mass``."""
    right_keys = right_keys or left_keys
    lk = [F.col(c).alias(f"__k{i}") for i, c in enumerate(left_keys)]
    rk = [F.col(c).alias(f"__k{i}") for i, c in enumerate(right_keys)]
    knames = [f"__k{i}" for i in range(len(left_keys))]
    lh = left.select(*lk).groupBy(*knames).agg(F.count("*").alias("__cl"))
    rh = right.select(*rk).groupBy(*knames).agg(F.count("*").alias("__cr"))
    # Per-key products and their sum run in DECIMAL(38,0): the fan-out
    # keys this tool exists to catch are exactly the ones whose cl*cr
    # overflows a 64-bit long, and non-ANSI long arithmetic would WRAP
    # and report the blowup as safe.  Counts above Long.MAX surface as
    # NULL totals + overflow=true — loud, never wrong.
    per_key = lh.join(rh, knames).select(
        (
            F.col("__cl").cast("decimal(19,0)")
            * F.col("__cr").cast("decimal(19,0)")
        ).alias("__m")
    )
    long_max = 9223372036854775807
    tot_dec = F.coalesce(F.sum("__m"), F.lit(0).cast("decimal(38,0)"))
    max_dec = F.coalesce(F.max("__m"), F.lit(0).cast("decimal(38,0)"))
    totals = per_key.agg(
        F.when(tot_dec <= long_max, tot_dec.cast("long")).alias("join_rows"),
        F.count("*").alias("n_keys"),
        F.when(max_dec <= long_max, max_dec.cast("long")).alias("max_key_rows"),
        (tot_dec > long_max).alias("overflow"),
    )
    counts = left.agg(F.count("*").alias("left_rows")).crossJoin(
        right.agg(F.count("*").alias("right_rows"))
    )
    return totals.crossJoin(counts)


def population_stability(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
    round_dp: int = 6,
) -> DataFrame:
    """Population stability index (§2b-D drift family): bucket a
    numeric column by the OLD snapshot's quantiles, compare the two
    snapshots' bucket shares, ``PSI = sum (p_new - p_old) *
    ln(p_new / p_old)`` — the model-monitoring staple ("did this
    feature's distribution move enough to retrain").  Rule of thumb:
    < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

    The bucket bounds come from ONE ungrouped percentile aggregate on
    the old side (a PROVEN one-row broadcast); bucket assignment is a
    row-local array fold (no join per bound).  Bounds round to
    ``round_dp`` BEFORE comparison: interpolated quantiles of 2-dp
    data live on a coarse decimal lattice, so rounding pins the
    bucket boundary decision against last-ulp cross-engine quantile
    divergence.  Empty buckets floor at ``eps`` (the standard PSI
    guard — ln(0) is the alternative).

    Returns one row per bucket: ``bucket``, ``n_old``, ``n_new``,
    ``share_old``, ``share_new``, ``contribution``, plus the
    constant-per-result ``psi_total`` (a window sum over the
    <= n_buckets result rows)."""
    from pyspark.sql import Window

    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = old.agg(
        F.transform(
            F.percentile(value_col, F.array(*[F.lit(p) for p in probs])),
            lambda b: F.round(b, round_dp),
        ).alias("__bounds")
    )
    x = F.col(value_col)
    bucket = F.aggregate(
        F.col("__bounds"),
        F.lit(0),
        lambda acc, b: acc + F.when(x > b, 1).otherwise(0),
    )

    def shares(df: DataFrame, side: str) -> DataFrame:
        counted = (
            df.join(F.broadcast(bounds))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(f"n_{side}"))
        )
        total = Window.partitionBy()
        return counted.withColumn(
            f"share_{side}",
            F.col(f"n_{side}") / F.sum(f"n_{side}").over(total),
        )

    both = shares(old, "old").join(shares(new, "new"), "bucket", "full_outer")
    p_old = F.greatest(F.coalesce("share_old", F.lit(0.0)), F.lit(float(eps)))
    p_new = F.greatest(F.coalesce("share_new", F.lit(0.0)), F.lit(float(eps)))
    contrib = (p_new - p_old) * F.log(p_new / p_old)
    w = Window.partitionBy()
    return both.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        F.round(F.coalesce("share_old", F.lit(0.0)), round_dp).alias("share_old"),
        F.round(F.coalesce("share_new", F.lit(0.0)), round_dp).alias("share_new"),
        F.round(contrib, round_dp).alias("contribution"),
        F.round(F.sum(contrib).over(w), round_dp).alias("psi_total"),
    )
