from .advisor import advise
from .inspect import (
    physical_plan,
    plan_has,
    pushed_filters,
    read_schema,
    explain_resource,
    lineage,
)

__all__ = [
    "advise",
    "physical_plan",
    "plan_has",
    "pushed_filters",
    "read_schema",
    "explain_resource",
    "lineage",
]
