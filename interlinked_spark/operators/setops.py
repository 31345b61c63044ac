"""Set operators (SURVEY.md §2b-G) — thin, name-based wrappers.

``unionByName`` everywhere (positional union is a silent-corruption
footgun when schemas drift).  intersect/except shuffle-distinct both
sides; at scale prefer semi/anti joins on a key when full-row equality
is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame, allow_missing: bool = False) -> DataFrame:
    return left.unionByName(right, allowMissingColumns=allow_missing)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right).distinct()


def intersect(left: DataFrame, right: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return left.intersectAll(right) if keep_duplicates else left.intersect(right)


def difference(left: DataFrame, right: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return left.exceptAll(right) if keep_duplicates else left.subtract(right)
