from .advisor import advise, advise_shuffle_conf
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
    "advise_shuffle_conf",
    "physical_plan",
    "plan_has",
    "pushed_filters",
    "read_schema",
    "explain_resource",
    "lineage",
]
