"""Merge / upsert operators (SURVEY.md §2b-A/G extensions).

Spark's file sinks have no in-place MERGE (that is a table-format
feature — Delta/Iceberg); the engine expresses upsert as the standard
rewrite: union both sides, keep the winning row per key, write the
result.  One shuffle on the keys; at 100 TB pair it with a partitioned
sink and dynamic partition overwrite so only touched partitions
rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """CDC-style compaction: keep ONE row per key — the one ranked first
    by ``order_cols`` descending (e.g. ``["ts", "event_id"]`` = latest
    event, id-tiebroken).  One shuffle on the keys; window group-limit
    pushes the per-key top-1 below the exchange, so only survivors-per-
    partition shuffle at scale."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: Optional[str] = None,
) -> DataFrame:
    """Upsert ``updates`` into ``current`` by ``keys``: rows present in
    both resolve to the update (or, with ``version_col``, to the highest
    version, updates winning ties).  Schemas must match by name.
    Implemented as union + per-key row_number — ONE shuffle, no
    driver-side diffing.

    When ``updates`` carries several rows for one key with no (or equal)
    ``version_col``, the survivor is made deterministic by a final
    tie-break on a stable hash of the whole row, so reruns and
    repartitionings pick the same row."""
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    order = [F.desc("__src")]
    if version_col is not None:
        order.insert(0, F.desc(version_col))
    # Deterministic last resort: hash every hashable payload column
    # (xxhash64 rejects MapType).
    hashable = [
        f.name for f in current.schema.fields if not isinstance(f.dataType, MapType)
    ]
    order.append(F.xxhash64(*[F.col(c) for c in hashable]).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
