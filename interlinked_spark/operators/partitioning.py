"""Fan-out stage parallelism for compute-heavy narrow chains.

A row-local pipeline (explode fan-outs, per-row hashing, Arrow batch
kernels) inherits the SCAN's partitioning: a source that arrives as one
file / one row group runs the entire downstream narrow chain on one
task, no matter how many cores the session has — the multiplied work
(e.g. a 100x bootstrap-replicate explode, a q-gram shingle + md5 sort)
serializes on a single core until the first exchange.

:func:`spread` widens such a frame to the session's default parallelism
BEFORE the expensive narrow stage.  It is scale-adaptive, not a local
tuning constant: a production input that already arrives wide (many
files / AQE-coalesced shuffle) is returned unchanged — the shuffle is
only paid when the input is narrower than the session's cores, exactly
the case where the fan-out would otherwise straggle on one task.  The
round-robin exchange moves the SMALL pre-fan-out rows, never the
multiplied output.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, min_parts: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` round-robin to at least the session's default
    parallelism (or ``min_parts``) — a no-op when it is already that
    wide.  Row-local results are unaffected (every downstream operator
    here is partitioning-agnostic); only stage parallelism changes."""
    target = int(
        min_parts
        if min_parts is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
