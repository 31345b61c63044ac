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
    from ..sources.writers import write_single_file, write_table

    keys = list(keys)
    state = sketch_distinct_state(df, keys, value_col, lg_k=lg_k)
    write_table(state.repartition(num_files, *[F.col(k) for k in keys]),
                f"{path}/state")
    meta = df.sparkSession.createDataFrame([(int(lg_k),)], "lg_k int")
    write_single_file(meta, f"{path}/meta")


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


# ---------------------------------------------------------------------
# Count-min sketch (engine-portable md5 hashing)
# ---------------------------------------------------------------------


def _cms_bucket(depth_col, value_col, hex_chars: int, salt: str):
    """Bucket = first ``hex_chars`` hex chars of ``md5(salt || depth ||
    ':' || value)`` — the repo-wide portable-hash convention
    (``operators/sampling.py``), kept as a STRING so every engine with
    md5 (DuckDB oracle included) derives the identical sketch."""
    return F.substring(
        F.md5(
            F.concat(
                F.lit(salt),
                depth_col.cast("string"),
                F.lit(":"),
                value_col.cast("string"),
            )
        ),
        1,
        hex_chars,
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    hex_chars: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch state over a value column: ``(j, bucket, c)``
    with ``depth`` rows of ``16**hex_chars`` counters.

    One keyed aggregate with map-side combine — the explode to
    ``depth`` rows happens below the partial aggregation, so at most
    ``depth * 16**hex_chars`` counter rows cross the exchange per
    partition regardless of input size.  States are MERGEABLE by
    counter-wise sum (``cms_merge``), exactly — the property that lets
    a 100-TB pipeline maintain per-day sketches and answer any-range
    frequency queries by adding tiny counter tables."""
    return (
        df.select(
            F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
            F.col(value_col).alias("__v"),
        )
        .select("j", _cms_bucket(F.col("j"), F.col("__v"), hex_chars, salt).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def cms_merge(*states: DataFrame) -> DataFrame:
    """Counter-wise sum of CMS states (exact mergeability)."""
    if not states:
        raise ValueError("cms_merge: need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("c").cast("bigint").alias("c"))


def cms_estimate(
    state: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    hex_chars: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates: ``(value, est)`` where ``est =
    min_j counter[j][h_j(value)]`` — the classic CMS upper bound
    (est >= true count, overestimate bounded by e*N/width w.h.p.).
    The query side explodes to ``depth`` rows and LEFT-joins the state
    so every queried value gets a row: a bucket with no counter row is
    an empty counter (0), hence an unseen value estimates 0 rather than
    being dropped, and a value with some empty buckets takes the min
    over 0 — the exact ``min_j counter[j][h_j(value)]`` contract.  With
    the default 4 x 4096 counters the state is ~KBs — broadcast it."""
    q = queries.select(F.col(value_col).alias("value")).distinct()
    probes = q.select(
        "value",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).select(
        "value",
        "j",
        _cms_bucket(F.col("j"), F.col("value"), hex_chars, salt).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(state), ["j", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est"))
    )


def cms_bucket_sql(depth_expr: str, value_expr: str, hex_chars: int = 3, salt: str = "cms") -> str:
    """DuckDB twin of :func:`_cms_bucket` — single source of truth for
    oracle SQL."""
    return (
        f"substr(md5('{salt}' || CAST({depth_expr} AS VARCHAR) || ':' || "
        f"CAST({value_expr} AS VARCHAR)), 1, {hex_chars})"
    )


# ---------------------------------------------------------------------
# Bloom filter as a mergeable bit-set table
# ---------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_hashes: int = 3,
    hex_chars: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom filter over a key set, represented as the DISTINCT set of
    occupied ``(seed, bucket)`` positions — at most ``num_hashes *
    16**hex_chars`` rows no matter how many keys went in (the bit-array
    sparsity made relational).  Mergeable by UNION DISTINCT.

    The production use is the runtime-filter pattern: build from the
    small/filtered side of a join, broadcast (~KBs), and prune the
    100-TB side BEFORE its shuffle — rows that can't match never cross
    the exchange.  False positives pass the filter (and are eliminated
    by the real join); false negatives are impossible."""
    return (
        df.select(
            F.explode(F.array(*[F.lit(s) for s in range(num_hashes)])).alias("seed"),
            F.col(key_col).alias("__k"),
        )
        .select("seed", _cms_bucket(F.col("seed"), F.col("__k"), hex_chars, salt).alias("bucket"))
        .distinct()
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_hashes: int = 3,
    hex_chars: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Append boolean ``__bloom_hit``: true iff ALL ``num_hashes``
    positions for the key are occupied.  The probe explodes each row to
    ``num_hashes`` probes against the broadcast position set and counts
    matches — no shuffle of the probed table beyond its id.  A NULL key
    yields NULL (unknown), matching the engine convention of Spark's
    native ``might_contain``; non-null keys never seen return false."""
    probes = df.select(F.col(key_col).alias("__k")).distinct()
    exploded = probes.select(
        "__k",
        F.explode(F.array(*[F.lit(s) for s in range(num_hashes)])).alias("seed"),
    ).select(
        "__k",
        "seed",
        _cms_bucket(F.col("seed"), F.col("__k"), hex_chars, salt).alias("bucket"),
    )
    hits = (
        exploded.join(F.broadcast(bloom), ["seed", "bucket"])
        .groupBy("__k")
        .agg((F.count("*") == F.lit(num_hashes)).alias("__bloom_hit"))
    )
    return df.join(
        F.broadcast(hits.withColumnRenamed("__k", key_col)), key_col, "left"
    ).withColumn(
        "__bloom_hit",
        F.when(F.col(key_col).isNull(), F.lit(None).cast("boolean")).otherwise(
            F.coalesce("__bloom_hit", F.lit(False))
        ),
    )


# ---------------------------------------------------------------------
# Mergeable fixed-grid quantile-histogram state
# ---------------------------------------------------------------------


def qhist_bins(
    df: DataFrame,
    keys: "Sequence[str]",
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-group fixed-grid histogram: ``(keys..., bin, c)`` with
    ``bin = clip(floor((v - lo) / width), 0, bins-1)``.  At most
    ``len(groups) * bins`` rows cross the exchange (map-side combine),
    independent of input size — the same shape as :func:`cms_build`.

    EXACTLY mergeable (bin-wise integer sum) and batching-invariant,
    which HLL/GK sketches only are approximately: this is the quantile
    companion to the persisted HLL state — maintain per-day histograms
    at 100 TB and answer any-range quantiles with error <= one bin
    width, provided the ``[lo, hi)`` domain covers the data (values
    outside clip into the edge bins, which silently widens the edge-
    quantile error — size the domain from known bounds).  NULL values
    are dropped."""
    if not (hi > lo and bins >= 1):
        raise ValueError(f"need hi > lo and bins >= 1, got [{lo}, {hi}) x {bins}")
    width = (float(hi) - float(lo)) / int(bins)
    v = F.col(value_col).cast("double")
    bin_col = F.least(
        F.greatest(F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"), F.lit(0)),
        F.lit(int(bins) - 1),
    )
    return (
        df.filter(v.isNotNull())
        .select(*keys, bin_col.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def qhist_build(
    df: DataFrame,
    keys: "Sequence[str]",
    value_col: str,
    path: str,
    lo: float,
    hi: float,
    bins: int = 500,
    num_files: int = 8,
) -> None:
    """Materialize the initial histogram state + its grid meta pin
    (lo/hi/bins travel with the state so appends can never drift the
    grid — same contract as the HLL state's lg_k pin)."""
    from ..sources.writers import write_single_file, write_table

    keys = list(keys)
    state = qhist_bins(df, keys, value_col, lo, hi, bins)
    write_table(
        state.repartition(num_files, *[F.col(k) for k in keys]), f"{path}/state"
    )
    meta = df.sparkSession.createDataFrame(
        [(float(lo), float(hi), int(bins))], "lo double, hi double, bins int"
    )
    write_single_file(meta, f"{path}/meta")


def qhist_update(
    new_batch: DataFrame,
    keys: "Sequence[str]",
    value_col: str,
    path: str,
    num_files: int = 4,
) -> None:
    """Append the batch's histogram under the STORED grid.  Append-only
    (duplicate (group, bin) rows are fine — the reader sums); compact
    with ``sources/writers.compact_table`` when row count grows."""
    from ..sources.writers import write_table

    spark = new_batch.sparkSession
    m = spark.read.parquet(f"{path}/meta").first()
    keys = list(keys)
    state = qhist_bins(new_batch, keys, value_col, m.lo, m.hi, m.bins)
    write_table(
        state.repartition(num_files, *[F.col(k) for k in keys]),
        f"{path}/state",
        mode="append",
    )


def qhist_quantiles(
    spark: SparkSession,
    path: str,
    keys: "Sequence[str]",
    qs: "Sequence[float]",
) -> DataFrame:
    """Per-group discrete-quantile estimates from the persisted state:
    ``(keys..., q, est, bin_width)`` where ``est`` is the UPPER edge of
    the bin holding the rank-``ceil(q * total)`` value — so
    ``0 < est - exact_disc_quantile <= bin_width (+5e-7)`` holds
    DETERMINISTICALLY for in-domain data (the exact value lies in that
    bin by construction; the 5e-7 is the engine-convention 6dp rounding
    of ``est``, visible only when bin_width itself has >6dp).  One scan of the tiny state: sum duplicate bin rows,
    running-total window per group ordered by bin, pick the first bin
    whose cumulative count reaches each target rank."""
    keys = list(keys)
    m = spark.read.parquet(f"{path}/meta").first()
    width = (m.hi - m.lo) / m.bins
    state = (
        spark.read.parquet(f"{path}/state")
        .groupBy(*keys, "bin")
        .agg(F.sum("c").alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bin")
    cum = state.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy(*keys))
    )
    qdf = cum.crossJoin(
        F.broadcast(
            spark.createDataFrame([(float(q),) for q in qs], "q double")
        )
    )
    hit = qdf.filter(
        F.col("cum") >= F.greatest(F.ceil(F.col("q") * F.col("total")), F.lit(1))
    )
    return (
        hit.groupBy(*keys, "q")
        .agg(F.min("bin").alias("bin"))
        .select(
            *keys,
            "q",
            F.round(F.lit(m.lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("est"),
            F.lit(round(width, 6)).alias("bin_width"),
        )
    )


def hll_set_overlap(
    df: DataFrame,
    set_col: str,
    key_col: str,
    lg_k: int = 12,
    tol_frac: float = 0.15,
    tol_abs: float = 5.0,
) -> DataFrame:
    """Pairwise audience overlap via HLL inclusion-exclusion (§2b-D
    sketch family): for every pair of sets (``set_col`` values),
    estimate ``|A ∩ B| = est(A) + est(B) - est(A ∪ B)`` from per-set
    sketches — the mergeable-state answer to "how many users do these
    two segments share" that at 100 TB replaces a distinct self-join
    with |sets| KB-sized sketches (union is register-wise max — exact
    w.r.t. the one-shot sketch of the union).

    The returned frame carries BOTH the exact pairwise counts (one
    distinct self-join — the GATE's reference, affordable at test SF)
    and ``within_bound`` = |est∩ - exact∩| <= max(``tol_abs``,
    ``tol_frac`` * exact_union).  Inclusion-exclusion compounds three
    sketch errors, so the tolerance is deliberately generous vs the
    single-sketch rse (~1.04/sqrt(2^lg_k)); production callers read
    the estimates and skip the exact path entirely.

    Returns ``(set_a, set_b, n_a, n_b, n_union, n_intersection,
    within_bound)`` — counts exact (SQL-matchable), the boolean is the
    sketch assertion."""
    base = df.select(
        F.col(set_col).alias("s"), F.col(key_col).alias("k")
    ).distinct()
    sk = base.groupBy("s").agg(
        F.hll_sketch_agg("k", F.lit(int(lg_k))).alias("sk"),
        F.count("*").alias("n"),
    )
    a = sk.select(
        F.col("s").alias("set_a"), F.col("sk").alias("__ska"),
        F.col("n").alias("n_a"),
    )
    b = sk.select(
        F.col("s").alias("set_b"), F.col("sk").alias("__skb"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(b, F.col("set_a") < F.col("set_b"))
    est_a = F.hll_sketch_estimate("__ska")
    est_b = F.hll_sketch_estimate("__skb")
    est_u = F.hll_sketch_estimate(F.hll_union("__ska", "__skb"))
    est_int = est_a + est_b - est_u
    inter = (
        base.select(F.col("s").alias("set_a"), "k")
        .join(base.select(F.col("s").alias("set_b"), "k"), "k")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("n_intersection"))
    )
    out = pairs.join(inter, ["set_a", "set_b"], "left").withColumn(
        "n_intersection", F.coalesce("n_intersection", F.lit(0))
    )
    exact_union = F.col("n_a") + F.col("n_b") - F.col("n_intersection")
    tol = F.greatest(F.lit(float(tol_abs)), F.lit(float(tol_frac)) * exact_union)
    return out.select(
        "set_a",
        "set_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        exact_union.cast("bigint").alias("n_union"),
        F.col("n_intersection").cast("bigint").alias("n_intersection"),
        (F.abs(est_int - F.col("n_intersection")) <= tol).alias("within_bound"),
    )


# ---------------------------------------------------------------------
# DDSketch: relative-error quantiles over log-width buckets
# ---------------------------------------------------------------------


def ddsketch_gamma(alpha: float) -> float:
    """``gamma = (1 + alpha) / (1 - alpha)`` — the bucket growth ratio
    that makes every bucket's midpoint estimate alpha-relatively
    accurate for every value inside it (Masson, Rim & Lee 2019)."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + float(alpha)) / (1.0 - float(alpha))


def ddsketch_buckets(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """Per-group DDSketch bucket counts: ``(keys..., bucket, cnt)``
    with ``bucket = ceil(round(ln(v) / ln(gamma), 6))`` — LOG-width
    buckets, so the guarantee is RELATIVE error <= alpha at every
    magnitude with NO domain bounds to size (the production choice for
    long-tailed positive metrics: latencies, prices, sizes — and the
    complement of :func:`qhist_bins`, whose fixed grid gives absolute
    error but needs known ``[lo, hi)``).  Like the histogram state:
    at most ``groups x occupied_buckets`` rows cross the exchange
    (map-side combine), and states are EXACTLY mergeable and
    batching-invariant by bucket-wise integer sum — no
    collapsing-bucket variant here, the full-fidelity sketch is
    already tiny (ln(1e9)/ln(gamma) ~ 1040 buckets at alpha=0.01).

    Engine-portability: ``ln(gamma)`` rides as a PYTHON-computed
    literal (both engines divide by the identical double) and the
    ratio rounds 6dp before ``ceil`` — the repo convention that
    absorbs last-ulp ``ln``/``pow`` differences between libms.

    Positive values only, by the sketch's nature (log of a
    non-positive value is undefined); NULL and v <= 0 ABSTAIN
    (filtered — the ``quantile_normalize`` NULL policy), so callers
    with signed data route the sign out first (two sketches + a zero
    count, the paper's own composition)."""
    log_gamma = __import__("math").log(ddsketch_gamma(alpha))
    v = F.col(value_col).cast("double")
    bucket = F.ceil(F.round(F.log(v) / F.lit(log_gamma), 6)).cast("int")
    return (
        df.filter(v.isNotNull() & (v > 0))
        .select(*keys, bucket.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def ddsketch_build(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    path: str,
    alpha: float = 0.01,
    num_files: int = 8,
) -> None:
    """Materialize the initial DDSketch state + its alpha meta pin
    (alpha travels with the state so appends can never drift the
    bucket base — the qhist grid-pin / HLL lg_k-pin contract)."""
    from ..sources.writers import write_single_file, write_table

    keys = list(keys)
    state = ddsketch_buckets(df, keys, value_col, alpha=alpha)
    write_table(
        state.repartition(num_files, *[F.col(k) for k in keys]), f"{path}/state"
    )
    meta = df.sparkSession.createDataFrame([(float(alpha),)], "alpha double")
    write_single_file(meta, f"{path}/meta")


def ddsketch_update(
    new_batch: DataFrame,
    keys: Sequence[str],
    value_col: str,
    path: str,
    num_files: int = 4,
) -> None:
    """Append the batch's buckets under the STORED alpha.  Append-only
    (duplicate (group, bucket) rows are fine — the reader sums);
    compact with ``sources/writers.compact_table`` when rows grow."""
    from ..sources.writers import write_table

    spark = new_batch.sparkSession
    alpha = float(spark.read.parquet(f"{path}/meta").first().alpha)
    keys = list(keys)
    state = ddsketch_buckets(new_batch, keys, value_col, alpha=alpha)
    write_table(
        state.repartition(num_files, *[F.col(k) for k in keys]),
        f"{path}/state",
        mode="append",
    )


def ddsketch_quantiles(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    qs: Sequence[float],
) -> DataFrame:
    """Per-group quantile estimates from the persisted state:
    ``(keys..., q, bucket, est, n)`` where ``est = round(2 * gamma^b /
    (gamma + 1), 6)`` — the bucket's midpoint in log space, within
    relative alpha of EVERY value the bucket holds, hence of the true
    rank-``ceil(q * n)`` statistic (the DDSketch guarantee, checkable
    deterministically against the exact rank value).  One scan of the
    tiny state: sum duplicate bucket rows, running-total window per
    group ordered by bucket, first bucket reaching each target rank."""
    from pyspark.sql import Window

    keys = list(keys)
    alpha = float(spark.read.parquet(f"{path}/meta").first().alpha)
    gamma = ddsketch_gamma(alpha)
    state = (
        spark.read.parquet(f"{path}/state")
        .groupBy(*keys, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = Window.partitionBy(*keys).orderBy("bucket")
    cum = state.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    qdf = cum.crossJoin(
        F.broadcast(
            spark.createDataFrame([(float(q),) for q in qs], "q double")
        )
    )
    hit = qdf.filter(
        F.col("cum") >= F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
    )
    return (
        hit.groupBy(*keys, "q", "n")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            *keys,
            "q",
            "bucket",
            F.round(
                F.lit(2.0) * F.pow(F.lit(gamma), F.col("bucket"))
                / F.lit(gamma + 1.0),
                6,
            ).alias("est"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
