"""interlinked-spark: a PySpark-native dataflow/analytics engine.

Pattern-routed resources, dependency injection and per-run memoization
(the capabilities of b12consulting/interlinked v0.4.0), where resources
materialize lazy Spark DataFrames and a standard library of DataFrame
operators (scans, joins, aggregations, windows, set ops, scalar function
registry, streaming, LLM-data-pipeline ops) makes real analytics queries
expressible as workflows.
"""

from .routing import Router, Match, VALUE_PATTERNS
from .workflow import (
    Workflow,
    Run,
    default_workflow,
    run,
    provide,
    depend,
    mutate,
    set_config,
)
from .binding import bind
from .templating import NameTemplate, render
from .exceptions import (
    InterlinkedException,
    NoRootException,
    LoopException,
    UnknownDependency,
    InvalidValue,
)

__version__ = "0.1.0"

__all__ = [
    "Router",
    "Match",
    "VALUE_PATTERNS",
    "Workflow",
    "Run",
    "default_workflow",
    "run",
    "provide",
    "depend",
    "mutate",
    "set_config",
    "bind",
    "NameTemplate",
    "render",
    "InterlinkedException",
    "NoRootException",
    "LoopException",
    "UnknownDependency",
    "InvalidValue",
    "__version__",
]
