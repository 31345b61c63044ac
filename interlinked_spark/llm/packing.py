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
    group_col: str | None = None,
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

    With ``group_col`` the sum restarts per group (``PARTITION BY
    group ORDER BY order_col``): buckets nest inside groups and the
    prefix table holds one row per (group, bucket) — still tiny, still
    one narrow shuffle."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    grp = [group_col] if group_col else []
    bucket = F.expr(f"CAST({order_col} AS BIGINT) DIV {bucket_width}").alias("_bucket")
    bucketed = df.withColumn("_bucket", bucket)
    intra = Window.partitionBy(*grp, "_bucket").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_intra = bucketed.withColumn("_intra", F.coalesce(F.sum(value_col).over(intra), F.lit(0)))
    totals = bucketed.groupBy(*grp, "_bucket").agg(F.sum(value_col).alias("_btotal"))
    # One row per (group,) bucket: this window's partitions are tiny —
    # corpus_size / bucket_width rows at worst.
    prefix_w = (
        Window.partitionBy(*grp) if grp else Window.partitionBy()
    ).orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        *grp,
        F.col("_bucket").alias("_pbucket"),
        F.coalesce(F.sum("_btotal").over(prefix_w), F.lit(0)).alias("_bprefix"),
    )
    if grp:
        prefixes = prefixes.withColumnRenamed(group_col, "_pgroup")
        cond = (F.col("_bucket") == F.col("_pbucket")) & (
            F.col(group_col) == F.col("_pgroup")
        )
    else:
        cond = F.col("_bucket") == F.col("_pbucket")
    joined = with_intra.join(F.broadcast(prefixes), cond, "inner")
    return joined.withColumn(
        out_col, (F.col("_intra") + F.col("_bprefix")).cast("bigint")
    ).drop("_bucket", "_pbucket", "_pgroup", "_intra", "_bprefix")


def packed_assignments(
    df: DataFrame,
    token_col: str,
    order_col: str,
    capacity: int,
    bucket_width: int,
    group_col: str | None = None,
) -> DataFrame:
    """Per-document packing coordinates: exclusive token ``offset`` in
    the concatenated stream, plus the first/last sequence ids the
    document lands in (``seq_first``/``seq_last``; a document longer
    than the residual capacity spans multiple sequences — concat-split
    semantics).  Zero-token documents are dropped (they occupy no
    stream space).

    With ``group_col``, streams (and so sequence id spaces) are
    per-group: a sequence never mixes documents from two groups — the
    language/split-scoped layout trainers need."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    nonempty = df.filter(F.col(token_col) > 0)
    placed = global_running_sum(
        nonempty, token_col, order_col, bucket_width, out_col="offset",
        group_col=group_col,
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
    group_col: str | None = None,
) -> DataFrame:
    """Per-sequence packing summary: for every training sequence, how
    many documents contribute to it and how many of its ``capacity``
    token slots are filled (== ``capacity`` for every sequence but the
    last — per group when ``group_col`` is given; the invariant the
    property tests pin).

    The doc -> sequence expansion is an ``explode(sequence(...))`` —
    output rows bound by ``ceil(tokens / capacity) + 1`` per document,
    so the expansion is proportional to corpus token count / capacity,
    never quadratic."""
    grp = [group_col] if group_col else []
    placed = packed_assignments(
        df, token_col, order_col, capacity, bucket_width, group_col=group_col
    )
    exploded = placed.select(
        *grp,
        F.col("offset"),
        F.col(token_col).alias("_tok"),
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    )
    overlap = F.least(
        F.col("offset") + F.col("_tok"), (F.col("seq_id") + 1) * capacity
    ) - F.greatest(F.col("offset"), F.col("seq_id") * capacity)
    return exploded.groupBy(*grp, "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(overlap).cast("bigint").alias("tokens_filled"),
    )


# ---- materialized packing state (the production append loop) --------
#
# A training corpus is packed incrementally: each accepted batch is
# laid down AFTER everything already packed, so the only state needed
# is the running token offset (plus the batch counter).  The state dir
# layout:
#
#   <path>/meta/                one-row parquet: next_offset, n_batches, capacity
#   <path>/assignments/batch_seq=K/   per-doc coordinates of batch K
#
# Each batch writes its OWN partition directory (overwrite) before the
# meta swap commits it — a retried failed batch rewrites the same
# partition instead of appending duplicates, so the loop is idempotent
# per batch.  The meta swap reuses the staged-rename machinery of
# sources/writers.py (crash residue recovered on next read).


def init_packing_state(spark, path: str, capacity: int) -> None:
    """Create an empty packing state dir (idempotent layout)."""
    import os

    from ..sources.writers import write_single_file

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    os.makedirs(f"{path}/assignments", exist_ok=True)
    meta = spark.createDataFrame(
        [(0, 0, capacity)], "next_offset bigint, n_batches int, capacity int"
    )
    write_single_file(meta, f"{path}/meta")


def _read_meta(spark, path: str):
    from ..sources.writers import _recover_swap_residue

    _recover_swap_residue(f"{path}/meta")
    return spark.read.parquet(f"{path}/meta").collect()[0]


def pack_incremental(
    batch: DataFrame,
    state_path: str,
    token_col: str,
    order_col: str,
    bucket_width: int,
    batch_id: int | None = None,
) -> DataFrame:
    """Pack one accepted batch AFTER everything already in the state:
    batch-local two-phase prefix sum shifted by the stored
    ``next_offset``, coordinates written to the batch's own partition,
    then the meta row swaps forward (commit point).  The previously
    packed corpus is scanned ZERO times — per-batch cost depends only
    on the batch.  Returns the batch's absolute coordinates.

    ``batch_id`` is the producer's idempotency key: a replay of an
    ALREADY-COMMITTED batch id returns the stored partition untouched
    (exactly-once layout under at-least-once drivers); the next
    uncommitted id packs normally; skipping ahead raises."""
    from ..sources.writers import _swap_in

    spark = batch.sparkSession
    meta = _read_meta(spark, state_path)
    base, n_batches, capacity = meta["next_offset"], meta["n_batches"], meta["capacity"]
    if batch_id is not None:
        if batch_id < n_batches:
            return spark.read.parquet(
                f"{state_path}/assignments/batch_seq={batch_id}"
            )
        if batch_id > n_batches:
            raise ValueError(
                f"batch_id {batch_id} skips ahead of committed count {n_batches}"
            )
    placed = packed_assignments(
        batch, token_col, order_col, capacity, bucket_width
    ).select(
        F.col(order_col),
        (F.col("offset") + F.lit(base)).cast("bigint").alias("offset"),
        F.col(token_col),
    )
    placed = placed.withColumn(
        "seq_first", F.expr(f"offset DIV {capacity}")
    ).withColumn("seq_last", F.expr(f"(offset + {token_col} - 1) DIV {capacity}"))
    part_dir = f"{state_path}/assignments/batch_seq={n_batches}"
    placed.write.mode("overwrite").parquet(part_dir)
    # Sum the COMMITTED partition, not the logical plan: re-evaluating
    # `placed` would run the two-phase prefix windows a second time,
    # and the meta counter should advance by what actually landed.
    batch_tokens = (
        spark.read.parquet(part_dir).agg(F.sum(token_col)).collect()[0][0] or 0
    )
    new_meta = spark.createDataFrame(
        [(int(base + batch_tokens), int(n_batches) + 1, int(capacity))],
        "next_offset bigint, n_batches int, capacity int",
    )
    _swap_in(new_meta, f"{state_path}/meta")
    return placed


def read_packed(spark, state_path: str) -> DataFrame:
    """All committed per-doc packing coordinates (partition-pruned by
    ``batch_seq`` when filtered).  Uncommitted partitions (a batch
    whose meta swap never landed) are excluded by the counter."""
    meta = _read_meta(spark, state_path)
    df = spark.read.parquet(f"{state_path}/assignments")
    return df.filter(F.col("batch_seq") < meta["n_batches"])
