"""Skew mitigation (SURVEY.md §2b-C scale notes; north-star mandate:
"salting for skew").

AQE's skew-join split (on by default in the engine session) handles
most cases at runtime by splitting oversized partitions.  Salting is
the explicit fallback for the cases AQE can't fix: skewed GROUP BY
keys, and joins where one hot key dominates so badly that even split
partitions all contain the same key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: the skewed side gets a random
    salt in ``[0, salt_buckets)``, the other side is EXPLODED to every
    salt value, and the join runs on ``keys + salt`` — a hot key's rows
    spread over ``salt_buckets`` partitions instead of one straggler.

    The replicated side multiplies by ``salt_buckets`` — use with a
    small/dimension side (for two huge skewed sides, prefer AQE's
    runtime split).

    Only ``inner``/``left`` are supported: an outer side that preserves
    the REPLICATED table (right/full) would emit every unmatched small-
    side row once per salt copy."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}); "
            "right/full would duplicate unmatched replicated rows per salt"
        )
    on = list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return (
        salted.join(replicated, on=on + ["__salt"], how=how).drop("__salt")
    )


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    ``keys + salt`` (hot key spreads over buckets), then final combine
    on ``keys``.

    ``aggs`` maps output name -> (combine_fn_name, partial Column);
    supported combine fns: sum, min, max, count (count combines via
    sum), and avg.  For ``avg`` pass the RAW value column (not an
    aggregate) — the partial phase computes sum+count and the final
    phase divides, so the mean is exact across salt buckets.  Example::

        salted_group_agg(df, ["k"], {"total": ("sum", F.sum("v")),
                                     "n": ("count", F.count("*")),
                                     "mean": ("avg", F.col("v"))})
    """
    keys = list(keys)
    partial_cols = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partial_cols.append(F.sum(col).alias(f"__p_{name}__sum"))
            partial_cols.append(F.count(col).alias(f"__p_{name}__cnt"))
        else:
            partial_cols.append(col.alias(f"__p_{name}"))
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*partial_cols)
    )
    combine = {
        "sum": F.sum,
        "count": F.sum,  # counts combine additively
        "min": F.min,
        "max": F.max,
    }
    final_cols = []
    for name, (fn, _col) in aggs.items():
        if fn == "avg":
            final_cols.append(
                (F.sum(f"__p_{name}__sum") / F.sum(f"__p_{name}__cnt")).alias(name)
            )
        else:
            final_cols.append(combine[fn](f"__p_{name}").alias(name))
    return partial.groupBy(*keys).agg(*final_cols)
