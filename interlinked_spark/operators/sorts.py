"""Sorts / limits / global top-k (SURVEY.md §2b-F).

``orderBy().limit(k)`` plans TakeOrderedAndProject: per-partition heap
top-k, then a single-reduce merge — no global sort materialization.
A bare global ``orderBy`` is a range-partitioned full sort; only use it
for final presentation.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame


def sort(df: DataFrame, order: Sequence[Union[str, Column]], within_partitions: bool = False) -> DataFrame:
    return df.sortWithinPartitions(*order) if within_partitions else df.orderBy(*order)


def top_k(df: DataFrame, order: Sequence[Union[str, Column]], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject).  Supply a unique
    tie-breaker in ``order`` for deterministic results."""
    return df.orderBy(*order).limit(k)
