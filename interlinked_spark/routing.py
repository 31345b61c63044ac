"""Typed pattern -> value router.

Resources are addressed by plain strings (``"revenue.f"``); producers are
registered under *route patterns* with typed placeholders
(``"revenue.{flag:identifier}"``).  Matching a concrete name against the
registered patterns extracts the placeholder values as a parameter dict.

Parity notes (behaviors pinned by the reference test-suite, re-expressed
here — see ``/root/reference/interlinked/router.py:16-114`` and
``tests/test_route.py``):

* six placeholder lexical types (``identifier str int path datetime uuid``);
  ``str`` is the default and is greedy;
* matched parameter values STAY STRINGS (no cast at the routing boundary —
  ``tests/test_route.py:71-73``); Spark-side casts happen inside operators
  via :data:`SPARK_CAST_TYPES`;
* an exact-key dict hit short-circuits the regex scan; otherwise patterns
  are tried in insertion order and the first match wins;
* matching is case-insensitive (``re.I``);
* anonymous ``{}`` placeholders are rejected at registration;
* any ``":" ...`` suffix in the literal tail of a pattern is ignored when
  the regex is built (quirk preserved from ``router.py:82``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

#: Lexical classes a ``{name:type}`` placeholder may declare.  The regexes
#: are the routing *spec* (same classes as the reference, incl. the
#: ISO-8601 datetime with optional fractional seconds / timezone and the
#: loose, dash-optional v4 uuid).
VALUE_PATTERNS: dict[str, str] = {
    "identifier": "[a-z][a-z0-9_]*",
    "str": "[a-z0-9:+._ -]+",
    "int": "[-+]?[0-9]+",
    "path": "[a-z0-9./_-]+",
    "datetime": (
        r"(-?(?:[1-9][0-9]*)?[0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9])"
        r"T(2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(.[0-9]+)?"
        r"(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?"
    ),
    "uuid": "[a-f0-9]{8}-?[a-f0-9]{4}-?4[a-f0-9]{3}-?[a-f0-9]{4}-?[a-f0-9]{12}",
}

#: Engine extension (SURVEY.md §1.4): Spark DDL type a typed placeholder
#: should be cast to *inside* operators (the routing boundary itself keeps
#: strings, for reference parity).
SPARK_CAST_TYPES: dict[str, str] = {
    "identifier": "string",
    "str": "string",
    "int": "bigint",
    "path": "string",
    "datetime": "timestamp",
    "uuid": "string",
}

_PLACEHOLDER = re.compile("{([a-z][a-z0-9:_]+)}", re.I)


def compile_route(pattern: str) -> re.Pattern:
    """Compile a route pattern into an anchored case-insensitive regex.

    ``{name}`` defaults to the greedy ``str`` class; ``{name:type}`` picks
    one of :data:`VALUE_PATTERNS`.  Literal spans are regex-escaped.
    """
    if "{}" in pattern:
        raise ValueError(
            f"Anonymous pattern '{{}}' is not supported (in {pattern})"
        )
    out = ["^"]
    cursor = 0
    for ph in _PLACEHOLDER.finditer(pattern):
        spec = ph.group(1)
        name, _, kind = spec.partition(":")
        lexeme = VALUE_PATTERNS[kind or "str"]
        out.append(re.escape(pattern[cursor : ph.start()]))
        out.append(f"(?P<{name}>{lexeme})")
        cursor = ph.end()
    # Quirk parity: a ":"-suffix in the trailing literal is dropped.
    out.append(re.escape(pattern[cursor:].split(":")[0]))
    out.append("$")
    return re.compile("".join(out), re.I)


@dataclass
class Match:
    """Outcome of a router lookup: the winning pattern, its registered
    value (a :class:`~interlinked_spark.workflow.Cell` in workflows) and
    the placeholder values extracted from the concrete name."""

    route: str
    value: Any
    kw: dict = field(default_factory=dict)


class Router:
    """Ordered pattern registry with exact-hit fast path.

    Insertion order is *semantic*: when several patterns match a name, the
    first registered one wins.
    """

    def __init__(self, **routes: Any):
        self.routes: dict[str, tuple[re.Pattern, Any]] = {}
        self.add_routes(routes)

    def add(self, path: str, value: Any) -> None:
        self.routes[path] = (compile_route(path), value)

    def add_routes(self, routes: dict[str, Any]) -> None:
        for path, value in routes.items():
            self.add(path, value)

    def match(self, key: str) -> Optional[Match]:
        """Exact-key hit first (O(1)), else first regex match in
        insertion order; ``None`` when nothing matches."""
        exact = self.routes.get(key)
        if exact is not None:
            return Match(key, exact[1], {})
        for route, (regex, value) in self.routes.items():
            hit = regex.match(key)
            if hit:
                return Match(route, value, hit.groupdict())
        return None

    def get(self, key: str, default: Any = None) -> Any:
        found = self.match(key)
        return default if found is None else found.value

    def __contains__(self, key: str) -> bool:
        # Membership is on registered *patterns*, not on matchable names.
        return key in self.routes

    def clone(self) -> "Router":
        twin = Router()
        twin.routes = dict(self.routes)
        return twin
