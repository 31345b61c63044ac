"""Reshape operators: pivot, unpivot/melt, grouping sets (SURVEY.md
§2b-D extensions).

Scale notes: ``pivot`` with an explicit value list is a single hash
aggregate (no extra pass to discover distinct pivot values — always pass
the list at 100 TB).  ``unpivot`` is a narrow generate (no shuffle).
``grouping_sets`` computes every set in ONE shuffle via Expand — far
cheaper than unioning per-set aggregates, which re-scans the input once
per set.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence,
    aggs: dict[str, Column],
) -> DataFrame:
    """Wide table: one column per (pivot value x agg).

    ``pivot_values`` is REQUIRED: without it Spark runs an extra
    distinct-values job over the full input before planning the
    aggregate.  Output columns are ``<value>_<aggname>`` (or just
    ``<value>`` for a single unnamed-friendly agg)."""
    grouped = df.groupBy(*group_cols).pivot(pivot_col, list(pivot_values))
    return grouped.agg(*[c.alias(n) for n, c in aggs.items()])


def unpivot_metrics(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Long table: (ids, metric-name, value) per wide column — the
    inverse of :func:`pivot_agg`.  Narrow (row-local) at any scale."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    aggs: dict[str, Column],
    grouping_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Aggregate over arbitrary grouping sets in one Expand + one
    shuffle (rollup/cube are special cases; see ``rollup_agg`` /
    ``cube_agg``).  ``grouping_cols`` defaults to the union of all sets
    in first-appearance order; columns absent from a set come back NULL
    for that set's rows."""
    if grouping_cols is None:
        grouping_cols = list(dict.fromkeys(c for s in sets for c in s))
    gs = df.groupingSets([list(s) for s in sets], *[F.col(c) for c in grouping_cols])
    return gs.agg(*[c.alias(n) for n, c in aggs.items()])
