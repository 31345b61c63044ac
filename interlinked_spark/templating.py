"""Name/config templating.

Dependency names and config values may contain ``{param}`` holes that are
filled from the resolve-time keyword pool.  A ``{param:type}`` hole
re-validates the substituted value against the routing lexical classes and
raises :class:`InvalidValue` on mismatch (parity:
``/root/reference/interlinked/workflow.py:342-381`` and
``tests/test_config.py:73-89``).

:func:`render` recursively formats strings / lists / dict keys+values
in-place (parity: ``workflow.py:318-339``, ``tests/test_format_dict.py``).
"""

from __future__ import annotations

import re
from string import Formatter
from typing import Any

from .exceptions import InvalidValue
from .routing import VALUE_PATTERNS

_FORMATTER = Formatter()


class NameTemplate:
    """A parsed ``"literal{hole:spec}..."`` template.

    Stores ``(literal, hole, spec)`` segments; :meth:`fmt` joins them with
    values drawn from a kw dict, enforcing specifiers.
    """

    __slots__ = ("pattern", "segments")

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.segments: list[tuple[str, str | None, str | None]] = [
            (literal or "", hole, spec)
            for literal, hole, spec, _conv in _FORMATTER.parse(pattern)
        ]

    @classmethod
    def from_string(cls, pattern: str) -> "NameTemplate":
        return cls(pattern)

    def fmt(self, kw: dict) -> str:
        parts: list[str] = []
        for literal, hole, spec in self.segments:
            parts.append(literal)
            if hole is None:
                continue
            value = kw[hole]  # KeyError surfaces to caller with context
            if spec:
                if not re.match(VALUE_PATTERNS[spec], value):
                    raise InvalidValue(
                        f"Parameter '{hole}' does not match specifier '{spec}'"
                    )
            parts.append(value)
        return "".join(parts)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<NameTemplate {self.pattern}>"


def render(cfg: Any, **kw) -> Any:
    """Recursively ``{param}``-format ``cfg`` (dicts mutate in place;
    both keys and values are formatted; lists and plain strings are
    rebuilt)."""
    if isinstance(cfg, dict):
        for key in list(cfg):
            new_key = render(key, **kw)
            if new_key != key:
                cfg[new_key] = cfg.pop(key)
        for key, value in cfg.items():
            cfg[key] = render(value, **kw)
    if isinstance(cfg, list):
        cfg = [render(item, **kw) for item in cfg]
    if isinstance(cfg, str):
        cfg = NameTemplate(cfg).fmt(kw)
    return cfg
