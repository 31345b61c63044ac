"""Engine exception hierarchy.

Parity: mirrors the five exception classes of the reference
(``interlinked/exceptions.py:1-17``) so workflow-level error handling is
drop-in compatible.
"""


class InterlinkedException(Exception):
    """Base class for every engine-raised error."""


class NoRootException(InterlinkedException):
    """A workflow graph has no root resource (every pattern is depended on)."""


class LoopException(InterlinkedException):
    """A dependency cycle was detected during :meth:`Workflow.validate`."""


class UnknownDependency(InterlinkedException):
    """A declared dependency matches no registered resource pattern."""


class InvalidValue(InterlinkedException):
    """A template parameter failed its ``{name:type}`` specifier check."""
