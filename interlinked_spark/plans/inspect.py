"""Plan inspection & lineage utilities.

The engine's 100-TB posture is testable: these helpers extract what
``.explain`` shows (pushed filters, read schemas, join strategies,
codegen spans) so operator tests can PIN the plan they expect, and
regressions in pushdown/pruning fail loudly (see
``tests/test_spark_dag.py``).

``lineage`` exports the workflow dependency graph (reference analog:
``Workflow.deps``, ``workflow.py:107-130``, which the CLI renders as a
tree — here it doubles as machine-readable lineage metadata).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, final: bool = False) -> str:
    """The executed-plan string.  With AQE, ``final=True`` requires an
    action to have run (the plan is re-optimized per stage at runtime).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if final and "isFinalPlan=false" in plan:
        raise ValueError("final plan requested but no action has run yet")
    return plan


def plan_has(df: DataFrame, *nodes: str) -> bool:
    plan = physical_plan(df)
    return all(node in plan for node in nodes)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group / page skipping
    territory) — empty means the scan reads everything."""
    plan = physical_plan(df)
    out: list[str] = []
    # The plan string truncates long field lists ("..., ..." with no
    # closing bracket), so accept either terminator.
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan):
        if m.group(1):
            out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column sets actually read by each scan (column pruning check)."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)


def explain_resource(wkf, name: str, mode: str = "formatted", **kw) -> str:
    """Resolve a resource and return its explain string — the per-
    resource counterpart of ``df.explain`` for workflow users."""
    df = wkf.run(name, **kw)
    if not isinstance(df, DataFrame):
        return f"<non-DataFrame resource: {type(df).__name__}>"
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def lineage(wkf) -> dict:
    """Machine-readable lineage: nodes (patterns) and edges
    (parent -> dependent)."""
    graph = wkf.deps()
    return {
        "workflow": wkf.name,
        "nodes": sorted(graph),
        "edges": [
            {"parent": parent, "dependent": child}
            for parent, children in sorted(graph.items())
            for child in children
        ],
    }


def observed(df: DataFrame, name: str, metrics: dict):
    """Attach named metrics to a plan via ``Observation`` (computed as
    the action runs — zero extra passes, unlike ``df.count()``-style
    probes).  Returns ``(df, observation)``; read
    ``observation.get`` after the next action.  Pairs with the workflow
    metrics hook for per-resource row counts at 100 TB, where a
    separate counting job would double the scan."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs
