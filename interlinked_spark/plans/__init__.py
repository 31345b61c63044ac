from .inspect import (
    physical_plan,
    plan_has,
    pushed_filters,
    read_schema,
    explain_resource,
    lineage,
)

__all__ = [
    "physical_plan",
    "plan_has",
    "pushed_filters",
    "read_schema",
    "explain_resource",
    "lineage",
]
