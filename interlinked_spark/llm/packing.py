"""Sequence packing: lay a token-counted corpus end-to-end into
fixed-capacity training sequences (the concat-then-split layout LLM
pretraining uses — documents are concatenated in a deterministic order
and split at sequence boundaries, so every sequence except the last is
exactly full).

The core primitive is a DISTRIBUTED prefix sum.  A naive
``Window.orderBy(key)`` with no partition key collapses the whole
corpus onto one task — the classic scale-killer — so
:func:`global_running_sum` implements the textbook two-phase scan
instead: an intra-bucket cumulative sum partitioned by a monotone
bucket key, plus a tiny per-bucket prefix table broadcast back.  One
narrow shuffle, no single-task stage, any corpus size.

Packing itself is then pure arithmetic on the exclusive offset: a
document occupying ``[offset, offset + tokens)`` of the concatenated
stream touches sequences ``offset div C`` .. ``(offset + tokens - 1)
div C`` — integer division only (exact on BIGINT, unlike float floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    bucket_width: int,
    out_col: str = "offset",
) -> DataFrame:
    """Exclusive global running sum of ``value_col`` in ``order_col``
    order, WITHOUT a global single-partition window.

    ``bucket_width`` quantizes the (numeric) order key into monotone
    buckets: intra-bucket cumulative sums run partitioned (parallel),
    bucket totals form a tiny table whose own prefix sum is cheap (one
    row per bucket), and a broadcast join adds each bucket's starting
    offset back.  The result equals ``SUM(value) OVER (ORDER BY
    order_col ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` as long as
    ``order_col`` is unique; ties within a key would make the global
    order ambiguous, so keys must be unique (ids).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    bucket = F.expr(f"CAST({order_col} AS BIGINT) DIV {bucket_width}").alias("_bucket")
    bucketed = df.withColumn("_bucket", bucket)
    intra = Window.partitionBy("_bucket").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_intra = bucketed.withColumn("_intra", F.coalesce(F.sum(value_col).over(intra), F.lit(0)))
    totals = bucketed.groupBy("_bucket").agg(F.sum(value_col).alias("_btotal"))
    # One row per bucket: the unpartitioned window is over a table whose
    # size is corpus_size / bucket_width — thousands of rows at worst.
    prefix_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        F.col("_bucket").alias("_pbucket"),
        F.coalesce(F.sum("_btotal").over(prefix_w), F.lit(0)).alias("_bprefix"),
    )
    joined = with_intra.join(
        F.broadcast(prefixes), F.col("_bucket") == F.col("_pbucket"), "inner"
    )
    return joined.withColumn(
        out_col, (F.col("_intra") + F.col("_bprefix")).cast("bigint")
    ).drop("_bucket", "_pbucket", "_intra", "_bprefix")


def packed_assignments(
    df: DataFrame,
    token_col: str,
    order_col: str,
    capacity: int,
    bucket_width: int,
) -> DataFrame:
    """Per-document packing coordinates: exclusive token ``offset`` in
    the concatenated stream, plus the first/last sequence ids the
    document lands in (``seq_first``/``seq_last``; a document longer
    than the residual capacity spans multiple sequences — concat-split
    semantics).  Zero-token documents are dropped (they occupy no
    stream space)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    nonempty = df.filter(F.col(token_col) > 0)
    placed = global_running_sum(
        nonempty, token_col, order_col, bucket_width, out_col="offset"
    )
    return placed.withColumn(
        "seq_first", F.expr(f"offset DIV {capacity}")
    ).withColumn(
        "seq_last", F.expr(f"(offset + {token_col} - 1) DIV {capacity}")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    capacity: int,
    bucket_width: int,
) -> DataFrame:
    """Per-sequence packing summary: for every training sequence, how
    many documents contribute to it and how many of its ``capacity``
    token slots are filled (== ``capacity`` for every sequence but the
    last — the invariant the property tests pin).

    The doc -> sequence expansion is an ``explode(sequence(...))`` —
    output rows bound by ``ceil(tokens / capacity) + 1`` per document,
    so the expansion is proportional to corpus token count / capacity,
    never quadratic."""
    placed = packed_assignments(df, token_col, order_col, capacity, bucket_width)
    exploded = placed.select(
        F.col("offset"),
        F.col(token_col).alias("_tok"),
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    )
    overlap = F.least(
        F.col("offset") + F.col("_tok"), (F.col("seq_id") + 1) * capacity
    ) - F.greatest(F.col("offset"), F.col("seq_id") * capacity)
    return exploded.groupBy("seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(overlap).cast("bigint").alias("tokens_filled"),
    )
